from .builder import HOOKS, build_hooks
from .default import HookBase
from .misc import (
    IterationTimer,
    InformationWriter,
    CheckpointSaver,
    CheckpointLoader,
    GarbageHandler,
    PreciseEvaluator,
    RuntimeProfiler,
    RuntimeProfilerV2,
    SonataHook,
)
from .evaluator import (
    SemSegEvaluator,
    ClsEvaluator,
    InsSegEvaluator,
    ShapeNetPartSegEvaluator,
    PartNetEPartSegEvaluator,
)
