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


def test_gan_generator_step_bf16_close_to_fp32(rng):
    """bf16 GAN generator step (compute_dtype): fp32 master params, fp32
    losses, generator fwd/bwd in bf16 — loss and update near fp32."""
    from speech_enhancement_tpu.models import Discriminator, TSCNet
    from speech_enhancement_tpu.train import (
        create_gan_state,
        gan_generator_step,
        l2_loss,
    )

    gen = TSCNet(num_channel=8, num_features=201)
    disc = Discriminator(ndf=4)
    tx = optax.sgd(1e-3)
    state = create_gan_state(jax.random.PRNGKey(0), gen, disc, tx, tx,
                             length=L)
    clean = jnp.asarray(0.1 * rng.standard_normal((B, L)).astype(np.float32))
    noisy = clean + 0.02 * jnp.asarray(
        rng.standard_normal((B, L)).astype(np.float32))
    kwargs = dict(gen_model=gen, disc_model=disc, arch="scp",
                  criterion=l2_loss, gan_active=True, gen_tx=tx)
    s32, a32 = gan_generator_step(state, clean, noisy, jax.random.PRNGKey(1),
                                  **kwargs)
    s16, a16 = gan_generator_step(state, clean, noisy, jax.random.PRNGKey(1),
                                  compute_dtype=jnp.bfloat16, **kwargs)
    l32, l16 = float(a32.metrics["loss"]), float(a16.metrics["loss"])
    assert np.isfinite(l16)
    np.testing.assert_allclose(l32, l16, rtol=0.1)
    # master params stay fp32 and move
    leaves16 = jax.tree_util.tree_leaves(s16.gen.params)
    assert all(x.dtype == jnp.float32 for x in leaves16)
    deltas = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(state.gen.params), leaves16)
    ]
    assert max(deltas) > 0
    # bf16 batch_stats are folded back to fp32 masters
    stats = jax.tree_util.tree_leaves(s16.gen.extra["batch_stats"])
    assert all(x.dtype == jnp.float32 for x in stats)


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
