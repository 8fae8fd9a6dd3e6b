"""bf16 (AMP-parity) diffusion training steps."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.models import DiffusionTSCNet
from speech_enhancement_tpu.ops import compressed_stft
from speech_enhancement_tpu.train import (
    ModuleState,
    linear_noise_schedule,
    tsc_diffusion_step,
)

B, L = 2, 2000


def _make_state(tx):
    model = DiffusionTSCNet(num_channel=8, num_features=201, num_steps=50)
    spec = compressed_stft(jnp.zeros((1, L)), 400, 100)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, spec, jnp.array([0.0]),
    )
    return model, ModuleState(
        params=vs["params"],
        extra={k: v for k, v in vs.items() if k != "params"},
        opt_state=tx.init(vs["params"]),
    )


def test_tsc_step_bf16_close_to_fp32(rng):
    tx = optax.adamw(1e-4)
    model, state = _make_state(tx)
    clean = jnp.asarray(0.1 * rng.standard_normal((B, L)).astype(np.float32))
    noisy = clean + 0.02 * jnp.asarray(
        rng.standard_normal((B, L)).astype(np.float32)
    )
    sched = jnp.asarray(linear_noise_schedule(50), jnp.float32)
    s32, l32 = tsc_diffusion_step(
        state, clean, noisy, sched, jax.random.PRNGKey(1),
        model=model, tx=tx, train=True,
    )
    s16, l16 = tsc_diffusion_step(
        state, clean, noisy, sched, jax.random.PRNGKey(1),
        model=model, tx=tx, train=True, compute_dtype=jnp.bfloat16,
    )
    assert np.isfinite(float(l16))
    # same rng => same diffusion draw; losses must agree closely and the
    # bf16 update must keep fp32 master params
    np.testing.assert_allclose(float(l32), float(l16), rtol=0.05)
    leaf = jax.tree_util.tree_leaves(s16.params)[0]
    assert leaf.dtype == jnp.float32
    # params moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, s16.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0
