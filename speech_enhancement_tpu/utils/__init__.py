from speech_enhancement_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_variables,
    save_checkpoint,
)
from speech_enhancement_tpu.utils.logging import (
    AverageMeter,
    ProgressMeter,
    create_logger,
)

__all__ = [
    "AverageMeter",
    "ProgressMeter",
    "create_logger",
    "latest_checkpoint",
    "load_checkpoint",
    "load_variables",
    "save_checkpoint",
]
