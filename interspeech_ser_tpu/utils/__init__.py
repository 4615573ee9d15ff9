from .config import FusionConfig, load_fusion_config
from .seeding import set_deterministic
from .metrics import macro_f1, micro_f1, accuracy, ccc, concordance_ccc
from . import ptio
from . import labels

__all__ = [
    "FusionConfig",
    "load_fusion_config",
    "set_deterministic",
    "macro_f1",
    "micro_f1",
    "accuracy",
    "ccc",
    "concordance_ccc",
    "ptio",
    "labels",
]
