from speech_enhancement_tpu.train.criterion import build_criterion, l1_loss, l2_loss
from speech_enhancement_tpu.train.diffusion import (
    ReverseSchedule,
    add_noise,
    diffuse_step,
    diffuse_train_loss,
    inference_schedule,
    tsc_diffusion_step,
    linear_noise_schedule,
    sample_tsc,
    sample_waveform,
)
from speech_enhancement_tpu.train.gan import (
    GanTrainState,
    GenAux,
    create_gan_state,
    gan_discriminator_step,
    gan_eval_step,
    gan_generator_step,
    make_fused_gan_train_step,
    self_correcting_weights,
)
from speech_enhancement_tpu.train.optim import (
    adam,
    build_optimizer,
    cyclic_cosine_schedule,
    no_decay_mask,
)
from speech_enhancement_tpu.train.state import ModuleState

__all__ = [
    "GanTrainState",
    "GenAux",
    "ModuleState",
    "ReverseSchedule",
    "adam",
    "add_noise",
    "build_criterion",
    "build_optimizer",
    "diffuse_step",
    "tsc_diffusion_step",
    "create_gan_state",
    "cyclic_cosine_schedule",
    "diffuse_train_loss",
    "gan_discriminator_step",
    "gan_eval_step",
    "gan_generator_step",
    "inference_schedule",
    "l1_loss",
    "l2_loss",
    "linear_noise_schedule",
    "make_fused_gan_train_step",
    "no_decay_mask",
    "sample_tsc",
    "sample_waveform",
    "self_correcting_weights",
]
