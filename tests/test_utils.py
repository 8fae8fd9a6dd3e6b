"""Utility subsystem tests: meters, checkpointing, preemption, profiling."""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.utils import (
    AverageMeter,
    PreemptionGuard,
    ProgressMeter,
    StepTimer,
    device_memory_stats,
    latest_checkpoint,
    load_checkpoint,
    load_variables,
    save_checkpoint,
)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0
    m.update(5.0, n=2)
    assert abs(m.avg - 3.5) < 1e-9  # (1 + 3 + 5*2) / 4


def test_progress_meter_prints(capsys):
    m = AverageMeter()
    m.update(0.5)
    p = ProgressMeter(10, [m], prefix="Epoch: [0]")
    p.display(3)
    out = capsys.readouterr().out
    assert "[ 3/10]" in out and "0.5" in out


def test_checkpoint_roundtrip_and_best(tmp_path):
    state = {
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    variables = {"w": jnp.ones((2,))}
    p = save_checkpoint(state, str(tmp_path), 3, is_best=True,
                        variables=variables)
    assert p.endswith("checkpoint_0003")
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_0003")
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = load_checkpoint(p, template)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    best = os.path.join(str(tmp_path), "model_best")
    v = load_variables(best, {"w": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(v["w"]), np.ones((2,)))


def test_latest_checkpoint_sorts_numerically(tmp_path):
    """Step-named checkpoints exceed 9999 in long runs (the learner
    saves by STEP with :04d padding); lexicographic order puts
    checkpoint_10500 before checkpoint_9500, making `--resume auto`
    silently resume thousands of steps back."""
    for name in ("checkpoint_9500", "checkpoint_10500", "checkpoint_0002",
                 "model_best", "checkpoint_tmp"):  # non-numeric: ignored
        os.makedirs(os.path.join(str(tmp_path), name))
    got = latest_checkpoint(str(tmp_path))
    assert got.endswith("checkpoint_10500"), got


def test_sweep_checkpoints(tmp_path):
    """The --validate-epochs helper: discovers restorable checkpoints,
    skips state-only preemption saves, honors [start, end), and keeps
    the actual glob path so a foreign unpadded name (checkpoint_5)
    restores from its real directory instead of a :04d round-trip."""
    from speech_enhancement_tpu.utils import sweep_checkpoints

    for name, sub in (("checkpoint_0000", "variables"),
                      ("checkpoint_0002", "variables"),
                      ("checkpoint_0001", "state"),      # preemption: skip
                      ("checkpoint_5", "variables"),     # unpadded foreign
                      ("checkpoint_0005", "variables"),  # padded twin: dedup
                      ("checkpoint_7", "variables"),     # unpadded, no twin
                      ("model_best", "variables")):      # non-numeric: ignored
        os.makedirs(os.path.join(str(tmp_path), name, sub))
    # one entry per epoch: the padded twin wins over checkpoint_5, which
    # must NOT appear a second time (a duplicate epoch would be evaluated
    # twice and the later score would silently win best-epoch); a foreign
    # unpadded name without a twin still restores from its real directory
    got = sweep_checkpoints(str(tmp_path))
    assert [(e, p.name) for e, p in got] == [
        (0, "checkpoint_0000"), (2, "checkpoint_0002"),
        (5, "checkpoint_0005"), (7, "checkpoint_7"),
    ]
    # range filter applies to discovered checkpoints too
    got = sweep_checkpoints(str(tmp_path), start=1, end=5)
    assert [e for e, _ in got] == [2]
    # explicit [start, end) probes padded names and skips missing ones
    got = sweep_checkpoints(str(tmp_path), start=0, end=3)
    assert [(e, p.name) for e, p in got] == [
        (0, "checkpoint_0000"), (2, "checkpoint_0002"),
    ]


def test_sweep_checkpoints_prefers_restorable_twin(tmp_path):
    """A padded preemption-only dir (state, no variables) must not shadow
    a restorable unpadded twin of the same epoch: dedup runs AFTER the
    restorable preference, so the epoch stays in the sweep."""
    from speech_enhancement_tpu.utils import sweep_checkpoints

    os.makedirs(os.path.join(str(tmp_path), "checkpoint_0003", "state"))
    os.makedirs(os.path.join(str(tmp_path), "checkpoint_3", "variables"))
    got = sweep_checkpoints(str(tmp_path))
    assert [(e, p.name) for e, p in got] == [(3, "checkpoint_3")]


def test_preemption_guard():
    guard = PreemptionGuard()
    assert not guard.should_stop
    os.kill(os.getpid(), signal.SIGTERM)
    assert guard.should_stop
    guard.restore()


def test_step_timer():
    t = StepTimer(window=3)
    x = jnp.ones((4,))
    for _ in range(5):
        t.tick(x * 2)
    assert len(t.times) == 3
    assert t.avg > 0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, list) and len(stats) >= 1
    assert "device" in stats[0]


def test_lamb_builtin_preclip():
    """Reference Lamb pre-clips the global grad norm inside the optimizer
    (core/optimizer.py:156-173, default max_grad_norm=1.0): updates from
    grads with norm 100 must equal updates from the same grads scaled to
    norm 1."""
    import jax.numpy as jnp
    import optax

    from speech_enhancement_tpu.train import build_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = build_optimizer("lamb", 1e-3, params)
    big = {"w": jnp.full((4, 4), 25.0), "b": jnp.full((4,), 5.0)}
    norm = float(optax.global_norm(big))
    small = jax.tree_util.tree_map(lambda g: g / norm, big)

    s1 = tx.init(params)
    u1, _ = tx.update(big, s1, params)
    s2 = tx.init(params)
    u2, _ = tx.update(small, s2, params)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
