from .base import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    EvalConfig,
    load_config,
    CONFIGS,
    register_config,
)
from .dsl import parse_stage, parse_contrast_ops, parse_multi_ops, parse_arch_out

__all__ = [
    "Config",
    "DataConfig",
    "ModelConfig",
    "OptimConfig",
    "EvalConfig",
    "load_config",
    "CONFIGS",
    "register_config",
    "parse_stage",
    "parse_contrast_ops",
    "parse_multi_ops",
    "parse_arch_out",
]
