"""Fused-relayout serving probe (VERDICT r4 stretch #8).

Times the bf16 batch-32 serving step with ``TSCNet(fused_relayout=...)``
— the Pallas axis-swap kernel that replaces the XLA relayout copy
between the time- and freq-axis attention (models/generator.py) — under
a RAISED scoped-vmem limit: the swap kernel's whole-instance tile needs
more than the 16 MiB default, and client-side XLA_FLAGS cannot carry TPU
compiler flags over the axon tunnel, so the limit must be raised via
per-jit ``compiler_options``.  That is also why the kernel stays gated
behind an explicit flag rather than becoming a default: a library cannot
impose process-wide compiler options on its callers.

Usage (run each arm serialized, nothing else on the TPU or host):
  PROBE_FUSED=0 python scripts/probe_relayout_vmem.py   # control
  PROBE_FUSED=1 python scripts/probe_relayout_vmem.py   # fused swap
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.enhance import Enhancer
from speech_enhancement_tpu.models import TSCNet
from speech_enhancement_tpu.ops import compressed_stft

BATCH, LENGTH, WARMUP, ITERS = 32, 32000, 3, 10

FUSED = os.environ.get("PROBE_FUSED", "1") == "1"
model = TSCNet(num_channel=64, num_features=201, fused_attention=True,
               fused_relayout=FUSED)
spec = compressed_stft(jnp.zeros((1, LENGTH)), 400, 100)
init = jax.jit(lambda rngs, s: model.init(rngs, s, deterministic=True))
variables = init(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, spec)
enh = Enhancer(model, variables, 400, 100, compute_dtype=jnp.bfloat16)

x0 = jnp.zeros((BATCH, LENGTH), jnp.float32)
print("lowering/compiling ...", flush=True)
compiled = (
    jax.jit(enh._step)
    .lower(variables, x0)
    .compile(compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
)
print("compiled OK", flush=True)

rng = np.random.default_rng(0)
base = 0.1 * rng.standard_normal((BATCH, LENGTH)).astype(np.float32)
# vary inputs across iterations (the runtime memoizes identical buffers)
xs = [jnp.asarray(base * (1.0 + 0.001 * i)) for i in range(WARMUP + ITERS)]
for i in range(WARMUP):
    float(compiled(variables, xs[i])[0, 0])  # read fence (see CLAUDE.md)
t0 = time.perf_counter()
for i in range(WARMUP, WARMUP + ITERS):
    float(compiled(variables, xs[i])[0, 0])
dt = time.perf_counter() - t0
print(json.dumps({"fused_relayout": FUSED, "vmem_kib": 65536,
                  "ms_per_batch": round(1000 * dt / ITERS, 1),
                  "utt_per_sec": round(BATCH * ITERS / dt, 2)}))
