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
init = jax.jit(lambda r, s: model.init(r, s, deterministic=True))
vs = init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, spec)
jax.block_until_ready(vs)
rng = np.random.default_rng(0)
x = jnp.asarray(0.1*rng.standard_normal((16, length)).astype(np.float32))

results = {}
for name, kw in [
    ("fp32", dict(matmul_precision=None)),
    ("mm_bf16", dict(matmul_precision="bfloat16")),
    ("full_bf16", dict(matmul_precision="bfloat16", compute_dtype=jnp.bfloat16)),
]:
    enh = Enhancer(model, vs, 400, 100, **kw)
    fn = enh._get_compiled(length)
    t0=time.time(); out = fn(x); out.block_until_ready()
    compile_t = time.time()-t0
    t0=time.time()
    for _ in range(8): fn(x).block_until_ready()
    dt = (time.time()-t0)/8
    results[name] = (dt, np.asarray(out))
    print(f"{name}: compile {compile_t:.1f}s  {dt*1000:.1f} ms/batch  {16/dt:.1f} utt/s", flush=True)

ref = results["fp32"][1]
for name in ("mm_bf16", "full_bf16"):
    o = results[name][1]
    rel = np.sqrt(np.mean((ref-o)**2)/np.mean(ref**2))
    print(f"{name} rel RMS vs fp32: {rel:.5f}")
