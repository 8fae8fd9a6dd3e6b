import time, jax
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
    spec1 = jax.jit(lambda x: compressed_stft(x, 400, 100))(x[:1])
    init = jax.jit(lambda r, s: model.init(r, s, deterministic=True))
    vs = init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, spec1)
    f = jax.jit(lambda v, s: model.apply(v, s, deterministic=True))
    spec_full = jax.jit(lambda x: compressed_stft(x, 400, 100))(x)
    # vary input each iter to defeat any arg memoization; force host fetch
    specs = [spec_full * (1.0 + 0.001*i) for i in range(7)]
    float(jnp.sum(jnp.abs(f(vs, specs[0])[0])))  # warm
    t0=time.time()
    for i in range(1, 7):
        r, _ = f(vs, specs[i])
        float(jnp.sum(jnp.abs(r)))  # device->host sync of a scalar
    print(f"{label}: {(time.time()-t0)/6*1000:.1f} ms", flush=True)

bench_model("full")
orig_attn = conf.ShawAttention.__call__
def no_attn(self, x, deterministic=True):
    return x * 0.0
conf.ShawAttention.__call__ = nn.compact(no_attn)
bench_model("no-attention")
conf.ShawAttention.__call__ = orig_attn
orig_conv = conf.ConvModule.__call__
def no_conv(self, x, deterministic=True):
    return x * 0.0
conf.ConvModule.__call__ = nn.compact(no_conv)
bench_model("no-convmodule")
conf.ConvModule.__call__ = orig_conv
orig_ff = conf.FeedForward.__call__
def no_ff(self, x, deterministic=True):
    return x * 0.0
conf.FeedForward.__call__ = nn.compact(no_ff)
bench_model("no-feedforward")
conf.FeedForward.__call__ = orig_ff
