from speech_enhancement_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_variables,
    save_checkpoint,
    sweep_checkpoints,
)
from speech_enhancement_tpu.utils.logging import (
    AverageMeter,
    ProgressMeter,
    create_logger,
)
from speech_enhancement_tpu.utils.preemption import PreemptionGuard
from speech_enhancement_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    trace,
)

__all__ = [
    "AverageMeter",
    "PreemptionGuard",
    "ProgressMeter",
    "StepTimer",
    "create_logger",
    "device_memory_stats",
    "trace",
    "latest_checkpoint",
    "load_checkpoint",
    "load_variables",
    "save_checkpoint",
    "sweep_checkpoints",
]
