from .builder import MODELS, MODULES, build_model
