from .config import Config, load_config
from .stage import (
    decompose_stage,
    legacy_stage_at,
    parse_stage_interval,
    resolution_of_stage,
    stage_at,
)

__all__ = [
    "Config",
    "load_config",
    "stage_at",
    "legacy_stage_at",
    "decompose_stage",
    "resolution_of_stage",
    "parse_stage_interval",
]
