import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
from speech_enhancement_tpu.enhance import Enhancer
from speech_enhancement_tpu.models import TSCNet
from speech_enhancement_tpu.ops import compressed_stft
length = 32000
model = TSCNet(num_channel=64, num_features=201)
spec = compressed_stft(jnp.zeros((1, length)), 400, 100)
vs = jax.jit(lambda r, s: model.init(r, s, deterministic=True))(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, spec)
rng = np.random.default_rng(0)
for B in (48,):
    base = 0.1*rng.standard_normal((B, length)).astype(np.float32)
    enh = Enhancer(model, vs, compute_dtype=jnp.bfloat16)
    fn = enh._get_compiled(length)
    try:
        xs = [jnp.asarray(base*(1.0+0.001*i)) for i in range(7)]
        fn(xs[0]).block_until_ready()
        t0=time.time()
        for xx in xs[1:]: fn(xx).block_until_ready()
        dt = (time.time()-t0)/6
        print(f"B={B}: {dt*1000:.1f} ms -> {B/dt:.1f} utt/s", flush=True)
    except Exception as e:
        print(f"B={B}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
