from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict, DictAction
