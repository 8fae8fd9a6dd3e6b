import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from speech_enhancement_tpu.cli.main_gan import main
main([
    "-a", "scp", "--cfg", "/tmp/vb_tpu/cfg.yaml",
    "--output", "/tmp/vb_tpu/out", "--epochs", "2", "--seed", "7",
    "-j", "4", "-p", "1", "--optimizer", "adamw", "--lr", "1e-4",
    "--async-disc",
])
