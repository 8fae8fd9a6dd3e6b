import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
import flax.linen as nn
from speech_enhancement_tpu.models.generator import DenseEncoder, tscb_stack, MaskDecoder, ComplexDecoder, TSCNet
from speech_enhancement_tpu.ops import compressed_stft, uncompressed_istft, normalize_batch

length = 32000
B = 16
rng = np.random.default_rng(0)
x = jnp.asarray(0.1*rng.standard_normal((B, length)).astype(np.float32))

def timeit(name, fn, *args):
    t0=time.time(); out = jax.block_until_ready(fn(*args)); c=time.time()-t0
    t0=time.time()
    for _ in range(6): jax.block_until_ready(fn(*args))
    dt=(time.time()-t0)/6
    print(f"{name}: compile {c:.1f}s run {dt*1000:.1f} ms", flush=True)
    return out

# 1. featurization only
feat = jax.jit(lambda x: uncompressed_istft(compressed_stft(normalize_batch(x,x)[1], 400, 100), 400, 100, length=length))
timeit("stft+istft", feat, x)

spec = jax.jit(lambda x: compressed_stft(x, 400, 100))(x)
mag = jnp.abs(spec); re, im = jnp.real(spec), jnp.imag(spec)
x_in = jnp.stack([mag, re, im], axis=-1)

# 2. encoder
enc = DenseEncoder(64)
evs = enc.init(jax.random.PRNGKey(0), x_in)
e_out = timeit("encoder", jax.jit(lambda v, a: enc.apply(v, a)), evs, x_in)

# 3. conformer stack
class Stack(nn.Module):
    @nn.compact
    def __call__(self, h):
        out, _ = tscb_stack(64, 4)(h, True)
        return out
st = Stack()
svs = jax.jit(lambda r, h: st.init({'params': r, 'dropout': jax.random.PRNGKey(1)}, h))(jax.random.PRNGKey(0), e_out)
s_out = timeit("tscb_stack", jax.jit(lambda v, h: st.apply(v, h)), svs, e_out)

# 4. decoders
md = MaskDecoder(201, 64); mvs = jax.jit(lambda r,h: md.init(r,h))(jax.random.PRNGKey(2), s_out)
timeit("mask_decoder", jax.jit(lambda v,h: md.apply(v,h)), mvs, s_out)
cd = ComplexDecoder(64); cvs = jax.jit(lambda r,h: cd.init(r,h))(jax.random.PRNGKey(3), s_out)
timeit("complex_decoder", jax.jit(lambda v,h: cd.apply(v,h)), cvs, s_out)
