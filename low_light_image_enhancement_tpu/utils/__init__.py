"""Observability and persistence utilities: JSONL metrics, profiling hooks,
orbax checkpointing."""

from low_light_image_enhancement_tpu.utils.logging import JSONLLogger, get_logger
from low_light_image_enhancement_tpu.utils.profiling import profile_trace, stage
from low_light_image_enhancement_tpu.utils.checkpoint import CheckpointManager

__all__ = [
    "JSONLLogger",
    "get_logger",
    "profile_trace",
    "stage",
    "CheckpointManager",
]
