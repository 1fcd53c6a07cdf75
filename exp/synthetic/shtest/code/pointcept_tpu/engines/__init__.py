from .defaults import default_argument_parser, default_config_parser, default_setup
from .launch import launch
from .train import TRAINERS, Trainer, TrainerBase
from . import hooks  # noqa: F401
