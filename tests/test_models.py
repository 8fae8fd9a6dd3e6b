"""Shape/dtype/finite/grad tests for the model families (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models import Discriminator, TSCNet
from speech_enhancement_tpu.ops import compressed_stft

B, T, F = 2, 161, 201


@pytest.fixture(scope="module")
def tscnet_and_params():
    model = TSCNet(num_channel=16, num_features=F)
    spec = compressed_stft(jnp.ones((B, 16000)), 400, 100)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
        deterministic=True,
    )
    return model, variables, spec


def test_tscnet_shapes(tscnet_and_params):
    model, variables, spec = tscnet_and_params
    re, im = model.apply(variables, spec, deterministic=True)
    assert re.shape == (B, T, F)
    assert im.shape == (B, T, F)
    assert np.all(np.isfinite(np.asarray(re)))
    assert np.all(np.isfinite(np.asarray(im)))


def test_tscnet_batchnorm_state(tscnet_and_params):
    model, variables, spec = tscnet_and_params
    assert "batch_stats" in variables
    (re, im), updates = model.apply(
        variables,
        spec,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in updates


def test_tscnet_grad_flows(tscnet_and_params):
    model, variables, spec = tscnet_and_params

    def loss(params):
        re, im = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            spec,
            deterministic=True,
        )
        return jnp.mean(re**2) + jnp.mean(im**2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in leaves)


def test_discriminator_output_range(rng):
    model = Discriminator(ndf=8)
    x = jnp.asarray(rng.random((B, T, F)).astype(np.float32))
    y = jnp.asarray(rng.random((B, T, F)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, y
    )
    out = model.apply(variables, x, y, deterministic=True)
    assert out.shape == (B, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_discriminator_spectral_state_updates(rng):
    model = Discriminator(ndf=8)
    x = jnp.asarray(rng.random((B, T, F)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, x
    )
    assert "spectral" in variables
    out, updates = model.apply(
        variables,
        x,
        x,
        deterministic=False,
        update_stats=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["spectral"],
    )
    before = jax.tree_util.tree_leaves(variables["spectral"])
    after = jax.tree_util.tree_leaves(updates["spectral"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_param_count_tscnet_full():
    """Full-size TSCNet should be ~1.8M params like the reference CMGAN."""
    model = TSCNet(num_channel=64, num_features=F)
    spec = compressed_stft(jnp.ones((1, 16000)), 400, 100)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
        deterministic=True,
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 1_000_000 < n < 3_000_000, n


def test_fused_relayout_parity():
    """The Pallas axis-swap relayout probe (ops/pallas_relayout.py) is a
    bitwise-exact transpose, and TSCNet(fused_relayout=True) matches the
    XLA-transpose path to compile-noise tolerance with shared params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_enhancement_tpu.models import TSCNet
    from speech_enhancement_tpu.ops import compressed_stft
    from speech_enhancement_tpu.ops.pallas_relayout import swap_seq_axes

    rng = np.random.default_rng(0)
    for shape in [(2, 101, 321, 64), (1, 7, 13, 64)]:  # ragged edges too
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(swap_seq_axes(x)),
            np.asarray(x.transpose(0, 2, 1, 3)),
        )

    wav = jnp.asarray(
        0.1 * rng.standard_normal((2, 8000)).astype(np.float32)
    )
    spec = compressed_stft(wav, 400, 100, comp_type="pow")
    m0 = TSCNet(num_channel=8, num_features=201)
    m1 = TSCNet(num_channel=8, num_features=201, fused_relayout=True)
    vs = m0.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
    )
    r0, i0 = m0.apply(vs, spec, deterministic=True)
    r1, i1 = m1.apply(vs, spec, deterministic=True)
    # same params; only fusion boundaries differ around the custom call
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i0), atol=2e-5)


def test_fused_relayout_vjp():
    """swap_seq_axes's custom VJP (the inverse swap with tile roles
    flipped) matches the XLA-transpose gradient exactly, including on
    ragged shapes where the Pallas OOB masking is exercised."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_enhancement_tpu.ops.pallas_relayout import swap_seq_axes

    rng = np.random.default_rng(1)
    for shape in [(2, 101, 321, 64), (1, 7, 13, 64)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal(
                (shape[0], shape[2], shape[1], shape[3])
            ).astype(np.float32)
        )
        g_fused = jax.grad(lambda a: jnp.sum(swap_seq_axes(a) * w))(x)
        g_xla = jax.grad(
            lambda a: jnp.sum(a.transpose(0, 2, 1, 3) * w)
        )(x)
        np.testing.assert_array_equal(np.asarray(g_fused), np.asarray(g_xla))
