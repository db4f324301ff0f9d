from .steps import build_s2_step, build_s1_step, TrainState  # noqa: F401
from . import checkpoints  # noqa: F401
