"""Fixed-seed single-step GAN training tests per arch (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models import Discriminator, TSCNet
from speech_enhancement_tpu.train import (
    build_optimizer,
    create_gan_state,
    cyclic_cosine_schedule,
    gan_discriminator_step,
    gan_eval_step,
    gan_generator_step,
    l2_loss,
    self_correcting_weights,
)

B, L = 2, 4000
N_FFT, HOP = 400, 100


@pytest.fixture(scope="module")
def setup():
    gen = TSCNet(num_channel=8, num_features=201)
    disc = Discriminator(ndf=4)
    rng = jax.random.PRNGKey(0)
    import optax

    # two-phase: state once with a dummy tx to get the param template for
    # the decay masks, then real optimizers (constant lr — the reference
    # warmup schedule is exactly 0 at step 0, tested separately)
    dummy_tx = optax.sgd(1e-3)
    state0 = create_gan_state(rng, gen, disc, dummy_tx, dummy_tx, length=L)
    gen_tx = build_optimizer("sgd", 1e-3, state0.gen.params)
    disc_tx = build_optimizer("sgd", 2e-3, state0.disc.params)
    state = create_gan_state(rng, gen, disc, gen_tx, disc_tx, length=L)
    return gen, disc, gen_tx, disc_tx, state


def _batch(rng):
    clean = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)) * 0.1
    noisy = clean + 0.02 * jnp.asarray(
        rng.standard_normal((B, L)).astype(np.float32)
    )
    return clean, noisy


@pytest.mark.parametrize("arch", ["scp", "cp", "sc", "cmgan"])
def test_gan_full_step(setup, rng, arch):
    gen, disc, gen_tx, disc_tx, state = setup
    clean, noisy = _batch(rng)

    state1, aux = gan_generator_step(
        state, clean, noisy, jax.random.PRNGKey(1),
        gen_model=gen, disc_model=disc, arch=arch, criterion=l2_loss,
        comp_type="pow", gan_active=True, gen_tx=gen_tx,
    )
    for k, v in aux.metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert aux.est_audio.shape == (B, L)
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.gen.params,
        state1.gen.params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # host PESQ labels stubbed with plausible normalized values
    q_est = jnp.asarray(rng.uniform(0.2, 0.9, B).astype(np.float32))
    q_clean = jnp.full((B,), (4.64 - 1) / 3.5, jnp.float32)
    q_noisy = jnp.asarray(rng.uniform(0.1, 0.5, B).astype(np.float32))

    state2, disc_loss = gan_discriminator_step(
        state1, aux, q_est, q_clean, q_noisy, jax.random.PRNGKey(2),
        disc_model=disc, arch=arch, criterion=l2_loss, disc_tx=disc_tx,
    )
    assert np.isfinite(float(disc_loss))
    ddiff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state1.disc.params,
        state2.disc.params,
    )
    assert max(jax.tree_util.tree_leaves(ddiff)) > 0


def test_gen_first_gating(setup, rng):
    """gan_active=False: no GAN term, gen still updates (function.py:260-272)."""
    gen, disc, gen_tx, disc_tx, state = setup
    clean, noisy = _batch(rng)
    state1, aux = gan_generator_step(
        state, clean, noisy, jax.random.PRNGKey(1),
        gen_model=gen, disc_model=disc, arch="scp", criterion=l2_loss,
        gan_active=False, gen_tx=gen_tx,
    )
    assert float(aux.metrics["gan_loss"]) == 0.0


def test_eval_step(setup, rng):
    gen, disc, gen_tx, disc_tx, state = setup
    clean, noisy = _batch(rng)
    losses, aux = gan_eval_step(
        state, clean, noisy,
        gen_model=gen, disc_model=disc, arch="scp", criterion=l2_loss,
    )
    assert np.isfinite(float(losses["loss"]))
    assert np.all((np.asarray(aux.metrics["d_fake"]) >= 0))


def test_eval_step_per_example_masks_pads_exactly(setup, rng):
    """per_example=True returns [B] loss vectors whose masked mean over
    real rows equals the unpadded scalar — validation tail batches padded
    with repeated rows lose nothing (VERDICT r3 weak #3)."""
    gen, disc, gen_tx, disc_tx, state = setup
    clean, noisy = _batch(rng)
    kw = dict(gen_model=gen, disc_model=disc, arch="scp", criterion=l2_loss)

    scalar, _ = gan_eval_step(state, clean, noisy, **kw)
    vec, _ = gan_eval_step(state, clean, noisy, per_example=True, **kw)
    assert np.asarray(vec["loss"]).shape == (B,)
    np.testing.assert_allclose(
        float(np.mean(np.asarray(vec["loss"]))), float(scalar["loss"]),
        rtol=1e-5,
    )

    # pad to 2x batch with cyclic repeats; mask to the first B rows
    idx = np.arange(2 * B) % B
    pv, _ = gan_eval_step(
        state, clean[jnp.asarray(idx)], noisy[jnp.asarray(idx)],
        per_example=True, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(pv["loss"])[:B], np.asarray(vec["loss"]), rtol=1e-5,
    )


def test_cyclic_cosine_schedule_shape():
    """Warmup ramp from 0, cosine decay, per-cycle halving (utils.py:78-90)."""
    sched = cyclic_cosine_schedule(1e-2, epochs=100, iters_per_epoch=10,
                                   cycle_limit=4, warmup_epochs=4)
    assert float(sched(0)) == 0.0
    # mid-warmup of cycle 0: epoch 2 -> lr = LR * 2/4
    np.testing.assert_allclose(float(sched(20)), 1e-2 * 0.5, rtol=1e-6)
    # just after warmup: lr = LR * 0.5 * (1 + cos(0)) = LR
    np.testing.assert_allclose(float(sched(40)), 1e-2, rtol=1e-6)
    # end of cycle 0 (epoch 25-): cos(pi) -> 0
    assert float(sched(249)) < 2e-4
    # cycle 1 warmup peak is halved
    np.testing.assert_allclose(float(sched(25 * 10 + 40)), 0.5e-2, rtol=1e-6)


def _reference_weights(gc, ge, gn):
    """Numpy port of the torch branch logic (function.py:736-748)."""
    EdotE = gc @ ge * 0 + ge @ ge + 1e-14
    NdotN = gn @ gn + 1e-14
    CdotE = gc @ ge
    CdotN = gc @ gn
    EdotN = ge @ gn
    if CdotE > 0:
        w_C, w_E = 1.0, 1.0
        if (w_C * gc + w_E * ge) @ gn > 0:
            w_N = 1.0
        else:
            w_N = -(CdotN) / NdotN - EdotN / NdotN
    else:
        w_C = 1.0
        w_E = -CdotE / EdotE
        if (w_C * gc + w_E * ge) @ gn > 0:
            w_N = 1.0
        else:
            w_N = -CdotN / NdotN + (CdotE * EdotN) / (EdotE * NdotN)
    return w_C, w_E, w_N


@pytest.mark.parametrize("seed", range(8))
def test_self_correcting_weights_match_reference_algebra(seed):
    r = np.random.default_rng(seed)
    gc = r.standard_normal(50)
    ge = r.standard_normal(50)
    gn = r.standard_normal(50)
    want = _reference_weights(gc, ge, gn)
    got = self_correcting_weights(
        [jnp.asarray(gc)], [jnp.asarray(ge)], [jnp.asarray(gn)]
    )
    np.testing.assert_allclose([float(x) for x in got], want, rtol=1e-5)


def test_vmapped_disc_step_matches_serial_three_grad(setup, rng):
    """gan_discriminator_step batches the scp/sc arch's three loss terms
    into one vmapped fwd/bwd; this pins equivalence with the serial
    3x value_and_grad formulation (the reference's strictly sequential
    backward passes, function.py:279-313): identical disc loss, params
    equal to float reassociation tolerance."""
    gen, disc, gen_tx, disc_tx, state = setup
    clean, noisy = _batch(rng)
    state1, aux = gan_generator_step(
        state, clean, noisy, jax.random.PRNGKey(1),
        gen_model=gen, disc_model=disc, arch="scp", criterion=l2_loss,
        gan_active=True, gen_tx=gen_tx,
    )
    q_est = jnp.asarray(rng.uniform(0.2, 0.9, B).astype(np.float32))
    q_clean = jnp.full((B,), (4.64 - 1) / 3.5, jnp.float32)
    q_noisy = jnp.asarray(rng.uniform(0.1, 0.5, B).astype(np.float32))
    key = jax.random.PRNGKey(2)

    state2, disc_loss = gan_discriminator_step(
        state1, aux, q_est, q_clean, q_noisy, key,
        disc_model=disc, arch="scp", criterion=l2_loss, disc_tx=disc_tx,
    )

    # serial formulation, same rng assignment (r1=est, r2=clean, r3=noisy)
    r1, r2, r3 = jax.random.split(key, 3)
    spectral = state1.disc.extra["spectral"]

    def d_apply(params, x, y, r):
        return disc.apply(
            {"params": params, "spectral": spectral}, x, y,
            deterministic=False, rngs={"dropout": r},
        ).reshape(-1)

    lc, gc = jax.value_and_grad(
        lambda p: l2_loss(d_apply(p, aux.clean_mag, aux.clean_mag, r2),
                          q_clean))(state1.disc.params)
    le, ge = jax.value_and_grad(
        lambda p: l2_loss(d_apply(p, aux.clean_mag, aux.est_mag, r1),
                          q_est))(state1.disc.params)
    ln, gn = jax.value_and_grad(
        lambda p: l2_loss(d_apply(p, aux.clean_mag, aux.noisy_mag, r3),
                          q_noisy))(state1.disc.params)
    w_c, w_e, w_n = self_correcting_weights(gc, ge, gn)
    ref_loss = w_c * lc + w_e * le + w_n * ln
    np.testing.assert_allclose(float(disc_loss), float(ref_loss), rtol=1e-5)

    import optax

    ref_grads = jax.tree_util.tree_map(
        lambda a, b, c: w_c * a + w_e * b + w_n * c, gc, ge, gn
    )
    upd, _ = disc_tx.update(ref_grads, state1.disc.opt_state,
                            state1.disc.params)
    ref_params = optax.apply_updates(state1.disc.params, upd)
    for got, want in zip(jax.tree_util.tree_leaves(state2.disc.params),
                         jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-7)


def test_fused_gan_train_step_single_dispatch(setup, rng):
    """make_fused_gan_train_step: one jitted call runs generator update,
    io_callback PESQ labels, and the self-correcting discriminator update."""
    from speech_enhancement_tpu.train import make_fused_gan_train_step

    gen, disc, gen_tx, disc_tx, state = setup
    # pseudo-speech-ish tone so PESQ succeeds
    t = np.arange(L) / 16000.0
    tone = (0.3 * np.sin(2 * np.pi * 220 * t) *
            (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    clean = jnp.asarray(np.stack([tone, tone]))
    noisy = clean + 0.02 * jnp.asarray(
        rng.standard_normal((B, L)).astype(np.float32)
    )
    step = make_fused_gan_train_step(
        gen_model=gen, disc_model=disc, gen_tx=gen_tx, disc_tx=disc_tx,
        arch="scp", criterion=l2_loss, gan_active=True,
    )
    # q_clean precomputed (the collator path, cli/main_gan); q_noisy left
    # to the io_callback fallback — one compile covers both label paths
    q_clean = jnp.full((B,), (4.64 - 1.0) / 3.5, jnp.float32)
    state2, metrics = step(
        state, clean, noisy, jax.random.PRNGKey(5), q_clean
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.disc.params, state2.disc.params,
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


@pytest.mark.parametrize("crit_name", ["mse", "mae"])
def test_host_validation_disc_loss_matches_device(setup, rng, crit_name):
    """The CLI's host-side numpy validation disc loss (L_C + L_E,
    function.py:425-429) equals the same computation through the device
    criterion on real gan_eval_step outputs — pinning the one seam where
    main_gan re-implements a loss outside jit (VERDICT r4 next #7)."""
    from speech_enhancement_tpu.cli.main_gan import host_validation_disc_loss
    from speech_enhancement_tpu.train import build_criterion

    gen, disc, gen_tx, disc_tx, state = setup
    clean, noisy = _batch(rng)
    _, aux = gan_eval_step(
        state, clean, noisy,
        gen_model=gen, disc_model=disc, arch="scp", criterion=l2_loss,
        per_example=True,
    )
    d_real = np.asarray(aux.metrics["d_real"])
    d_fake = np.asarray(aux.metrics["d_fake"])
    q_est = rng.uniform(0.2, 0.9, d_fake.shape).astype(np.float32)

    crit = build_criterion(crit_name)
    device = float(
        crit(jnp.asarray(d_real), jnp.ones_like(jnp.asarray(d_real)))
        + crit(jnp.asarray(d_fake), jnp.asarray(q_est))
    )
    host = host_validation_disc_loss(d_real, d_fake, q_est, crit_name)
    np.testing.assert_allclose(host, device, rtol=1e-6)
