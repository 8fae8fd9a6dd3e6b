"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speech_enhancement_tpu.models import Discriminator, TSCNet
from speech_enhancement_tpu.parallel import (
    data_parallel_mesh,
    replicate_state,
    shard_batch,
)
from speech_enhancement_tpu.train import (
    build_optimizer,
    create_gan_state,
    gan_generator_step,
    l2_loss,
)

L = 2000


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    return data_parallel_mesh(8)


@pytest.fixture(scope="module")
def tiny_gan():
    """Shared models/optimizers/state: the jitted train steps key on the
    (static) model and optimizer objects, so sharing them lets the
    discriminator test reuse the generator-step compile."""
    gen = TSCNet(num_channel=8, num_features=201)
    disc = Discriminator(ndf=4)
    state0 = create_gan_state(
        jax.random.PRNGKey(0), gen, disc, optax.sgd(1e-3), optax.sgd(1e-3),
        length=L,
    )
    gen_tx = build_optimizer("sgd", 1e-3, state0.gen.params)
    disc_tx = build_optimizer("sgd", 2e-3, state0.disc.params)
    state = create_gan_state(jax.random.PRNGKey(0), gen, disc, gen_tx,
                             disc_tx, length=L)
    return gen, disc, gen_tx, disc_tx, state


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_generator_step_matches_single_device(mesh, tiny_gan, rng):
    """The same jitted step, batch sharded over 8 devices: results must
    match the unsharded run (SPMD is an annotation, not a code path)."""
    gen, disc, gen_tx, disc_tx, state = tiny_gan

    clean = 0.1 * rng.standard_normal((8, L)).astype(np.float32)
    noisy = clean + 0.02 * rng.standard_normal((8, L)).astype(np.float32)

    kwargs = dict(
        gen_model=gen, disc_model=disc, arch="scp", criterion=l2_loss,
        gan_active=True, gen_tx=gen_tx,
    )
    # single device
    s1, aux1 = gan_generator_step(
        state, jnp.asarray(clean), jnp.asarray(noisy), jax.random.PRNGKey(1),
        **kwargs,
    )
    # sharded over the mesh
    state_r = replicate_state(mesh, state)
    c_sh, n_sh = shard_batch(mesh, clean, noisy)
    s2, aux2 = gan_generator_step(
        state_r, c_sh, n_sh, jax.random.PRNGKey(1), **kwargs
    )
    np.testing.assert_allclose(
        float(aux1.metrics["loss"]), float(aux2.metrics["loss"]), rtol=2e-4
    )
    # updated params agree (gradient all-reduce == full-batch gradient)
    a = jax.tree_util.tree_leaves(s1.gen.params)[0]
    b = jax.tree_util.tree_leaves(s2.gen.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_batchnorm_stats_are_global(mesh, rng):
    """Global-batch normalization == SyncBN (main_gan.py:154-155): batch
    stats after a sharded step must match the unsharded ones."""
    import flax.linen as nn

    model = nn.BatchNorm(use_running_average=False, momentum=0.9)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(v, x):
        _, updates = model.apply(v, x, mutable=["batch_stats"])
        return updates["batch_stats"]

    ref = step(variables, jnp.asarray(x))
    x_sh = shard_batch(mesh, x)
    v_r = replicate_state(mesh, variables)
    got = step(v_r, x_sh)
    np.testing.assert_allclose(
        np.asarray(ref["mean"]), np.asarray(got["mean"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref["var"]), np.asarray(got["var"]), rtol=1e-5
    )


def test_sharded_enhancer_matches_single_device(mesh, tiny_gan, rng):
    """Serving sharded over the mesh (Enhancer(mesh=...)): outputs must
    match the single-device path, including the ragged-chunk row padding
    (5 utterances on 8 devices)."""
    from speech_enhancement_tpu.enhance import Enhancer

    gen, _, _, _, state = tiny_gan
    variables = state.gen.variables()
    utts = [
        0.1 * rng.standard_normal(n).astype(np.float32)
        for n in (1500, 1700, 1900, 1400, 2000)
    ]
    single = Enhancer(gen, variables, 400, 100, quantum=2000)
    sharded = Enhancer(gen, variables, 400, 100, quantum=2000, mesh=mesh)
    out1 = single.enhance(utts, batch_size=8)
    out2 = sharded.enhance(utts, batch_size=8)
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_sharded_enhancer_fused_attention(mesh, rng):
    """Mesh + fused Pallas attention together: the mesh path runs the step
    under shard_map, so the Mosaic custom call (no GSPMD partitioning
    rule) executes on each device's local batch slice.  Must match the
    single-device fused output."""
    from speech_enhancement_tpu.enhance import Enhancer

    gen = TSCNet(num_channel=8, num_features=201, fused_attention=True)
    from speech_enhancement_tpu.ops import compressed_stft

    spec = compressed_stft(jnp.zeros((1, 2000)), 400, 100)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, deterministic=True,
    )
    x = 0.1 * rng.standard_normal((8, 2000)).astype(np.float32)
    single = Enhancer(gen, variables, 400, 100, quantum=2000)
    sharded = Enhancer(gen, variables, 400, 100, quantum=2000, mesh=mesh)
    np.testing.assert_allclose(
        single.enhance_batch(x), sharded.enhance_batch(x), atol=2e-5
    )


def test_sharded_discriminator_step_matches_single_device(mesh, tiny_gan, rng):
    """Full GAN step sharded: the self-correcting weights reduce flat-grad
    dot products over *sharded* per-example grads (train/gan.py:248-267);
    they must equal the unsharded full-batch result (function.py:705-760)."""
    from speech_enhancement_tpu.train import gan_discriminator_step

    gen, disc, gen_tx, disc_tx, state = tiny_gan

    clean = 0.1 * rng.standard_normal((8, L)).astype(np.float32)
    noisy = clean + 0.02 * rng.standard_normal((8, L)).astype(np.float32)
    q_est = np.linspace(0.4, 0.9, 8).astype(np.float32)
    q_clean = np.ones(8, np.float32)
    q_noisy = np.linspace(0.2, 0.5, 8).astype(np.float32)

    gen_kwargs = dict(gen_model=gen, disc_model=disc, arch="scp",
                      criterion=l2_loss, gan_active=True, gen_tx=gen_tx)
    disc_kwargs = dict(disc_model=disc, arch="scp", criterion=l2_loss,
                       disc_tx=disc_tx)

    # single device: generator step then discriminator step
    s1, aux1 = gan_generator_step(
        state, jnp.asarray(clean), jnp.asarray(noisy), jax.random.PRNGKey(1),
        **gen_kwargs,
    )
    s1, dloss1 = gan_discriminator_step(
        s1, aux1, jnp.asarray(q_est), jnp.asarray(q_clean),
        jnp.asarray(q_noisy), jax.random.PRNGKey(2), **disc_kwargs,
    )

    # sharded over the mesh: same jitted steps, batch + labels sharded
    state_r = replicate_state(mesh, state)
    c_sh, n_sh = shard_batch(mesh, clean, noisy)
    qe_sh, qc_sh, qn_sh = shard_batch(mesh, q_est, q_clean, q_noisy)
    s2, aux2 = gan_generator_step(
        state_r, c_sh, n_sh, jax.random.PRNGKey(1), **gen_kwargs
    )
    s2, dloss2 = gan_discriminator_step(
        s2, aux2, qe_sh, qc_sh, qn_sh, jax.random.PRNGKey(2), **disc_kwargs,
    )

    np.testing.assert_allclose(float(dloss1), float(dloss2), rtol=2e-4)
    a = jax.tree_util.tree_leaves(s1.disc.params)[0]
    b = jax.tree_util.tree_leaves(s2.disc.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # spectral-norm power-iteration state must also stay in lockstep
    u1 = jax.tree_util.tree_leaves(s1.disc.extra["spectral"])[0]
    u2 = jax.tree_util.tree_leaves(s2.disc.extra["spectral"])[0]
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=2e-5)
