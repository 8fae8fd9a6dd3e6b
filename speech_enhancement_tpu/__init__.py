"""speech_enhancement_tpu — TPU-native speech enhancement framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference SCP-GAN / CMGAN / CDiffuSE speech-enhancement stack
(minyoungpark1/Speech-Enhancement): the same model families, training
objectives, metrics, data pipeline, and CLI surface — but built around a
single functional core of jitted (params, batch, rng) -> (loss, updates)
steps, data-parallel over a ``jax.sharding.Mesh``.

Layers (bottom-up):
  ops/       device-resident DSP: STFT/iSTFT matmul kernels, compression
  models/    flax models: TSCNet, metric discriminator, DiffuSE, diffusion TSCNet
  data/      host-side wav IO, VoiceBank dataset, crop/tile collator
  train/     fused train steps (GAN + self-correcting disc, diffusion), optax
  metrics/   PESQ (native C++), CSIG/CBAK/COVL/SSNR/STOI composite stack
  parallel/  mesh construction and sharding helpers
  config/    dataclass config tree with YAML overlays + dot overrides
  cli/       entry points mirroring main_gan / inference_gan / main_diffuse /
             inference_diffuse / cdiffuse
"""

__version__ = "0.1.0"
