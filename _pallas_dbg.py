import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
from speech_enhancement_tpu.ops import compressed_stft
from speech_enhancement_tpu.ops.pallas_stft import pallas_stft

x = jnp.asarray(0.3*np.random.default_rng(0).standard_normal((1, 16000)).astype(np.float32))
for comp in ("none", "pow"):
    a = jax.jit(lambda x: compressed_stft(x, 400, 100, comp_type=comp))(x)
    b = jax.jit(lambda x: pallas_stft(x, 400, 100, comp_type=comp))(x)
    err = np.asarray(jnp.abs(a - b))  # real array, transferable
    print(comp, 'max', err.max(), flush=True)
    per_frame = err.max(axis=(0,2))
    bad = np.where(per_frame > 0.01)[0]
    print('frames err>0.01:', bad[:16], 'total', len(bad), flush=True)
    per_freq = err.max(axis=(0,1))
    badf = np.where(per_freq > 0.01)[0]
    print('freqs err>0.01:', badf[:10], 'total', len(badf), flush=True)
