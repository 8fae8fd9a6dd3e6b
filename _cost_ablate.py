import time, functools, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
import flax.linen as nn
import speech_enhancement_tpu.models.conformer as conf
from speech_enhancement_tpu.models import TSCNet
from speech_enhancement_tpu.ops import compressed_stft

length = 32000
rng = np.random.default_rng(0)
x = jnp.asarray(0.1*rng.standard_normal((16, length)).astype(np.float32))

def bench_model(label):
    model = TSCNet(num_channel=64, num_features=201)
    spec = jax.jit(lambda x: compressed_stft(x, 400, 100))(x[:1])
    init = jax.jit(lambda r, s: model.init(r, s, deterministic=True))
    vs = init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, spec)
    f = jax.jit(lambda v, s: model.apply(v, s, deterministic=True))
    spec_full = jax.jit(lambda x: compressed_stft(x, 400, 100))(x)
    out = jax.block_until_ready(f(vs, spec_full))
    t0=time.time()
    for _ in range(6): jax.block_until_ready(f(vs, spec_full))
    print(f"{label}: {(time.time()-t0)/6*1000:.1f} ms", flush=True)

bench_model("full")

# ablate attention
orig_attn = conf.ShawAttention.__call__
def no_attn(self, x, deterministic=True):
    return x * 0.0
conf.ShawAttention.__call__ = nn.compact(no_attn)
bench_model("no-attention")
conf.ShawAttention.__call__ = orig_attn

# ablate conv module
orig_conv = conf.ConvModule.__call__
def no_conv(self, x, deterministic=True):
    return x * 0.0
conf.ConvModule.__call__ = nn.compact(no_conv)
bench_model("no-convmodule")
conf.ConvModule.__call__ = orig_conv

# ablate feedforward
orig_ff = conf.FeedForward.__call__
def no_ff(self, x, deterministic=True):
    return x * 0.0
conf.FeedForward.__call__ = nn.compact(no_ff)
bench_model("no-feedforward")
conf.FeedForward.__call__ = orig_ff
