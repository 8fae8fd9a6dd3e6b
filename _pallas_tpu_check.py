import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
from speech_enhancement_tpu.ops import compressed_stft, uncompressed_istft
from speech_enhancement_tpu.ops.pallas_stft import pallas_stft, pallas_istft

x = jnp.asarray(0.3*np.random.default_rng(0).standard_normal((16, 32000)).astype(np.float32))
f_ref = jax.jit(lambda x: compressed_stft(x, 400, 100))
f_pal = jax.jit(lambda x: pallas_stft(x, 400, 100))
a = jax.block_until_ready(f_ref(x)); b = jax.block_until_ready(f_pal(x))
print('tpu pallas stft maxerr:', float(jnp.max(jnp.abs(a - b))), flush=True)
g_ref = jax.jit(lambda s: uncompressed_istft(s, 400, 100, length=32000))
g_pal = jax.jit(lambda s: pallas_istft(s, 400, 100, length=32000))
ya = jax.block_until_ready(g_ref(a)); yb = jax.block_until_ready(g_pal(a))
print('tpu pallas istft maxerr:', float(jnp.max(jnp.abs(ya - yb))), flush=True)
import timeit
for name, fn, arg in [('xla stft', f_ref, x), ('pallas stft', f_pal, x), ('xla istft', g_ref, a), ('pallas istft', g_pal, a)]:
    t = timeit.timeit(lambda: jax.block_until_ready(fn(arg)), number=20)/20
    print(f'{name}: {t*1000:.2f} ms', flush=True)
