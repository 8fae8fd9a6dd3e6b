import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
from speech_enhancement_tpu.models import TSCNet
from speech_enhancement_tpu.ops import compressed_stft

length = 32000
rng = np.random.default_rng(0)
x = jnp.asarray(0.1*rng.standard_normal((16, length)).astype(np.float32))

for fused in (False, True):
    model = TSCNet(num_channel=64, num_features=201, fused_attention=fused)
    spec1 = jax.jit(lambda x: compressed_stft(x, 400, 100))(x[:1])
    init = jax.jit(lambda r, s: model.init(r, s, deterministic=True))
    vs = init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, spec1)
    f = jax.jit(lambda v, s: model.apply(v, s, deterministic=True))
    spec_full = jax.jit(lambda x: compressed_stft(x, 400, 100))(x)
    specs = [spec_full * (1.0 + 0.001*i) for i in range(7)]
    t0=time.time(); float(jnp.sum(jnp.abs(f(vs, specs[0])[0]))); print(f"fused={fused} compile {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for i in range(1, 7):
        r, _ = f(vs, specs[i]); float(jnp.sum(jnp.abs(r)))
    print(f"fused={fused}: {(time.time()-t0)/6*1000:.1f} ms/batch", flush=True)
