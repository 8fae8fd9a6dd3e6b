"""Multi-host smoke: 2-process jax.distributed rendezvous on CPU.

Exercises ``parallel.init_distributed`` (the replacement for the
reference's ``dist.init_process_group``, main_gan.py:140) the only way it
can be exercised without real multi-host hardware: two local processes,
each owning one virtual CPU device, running a psum over the global mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")  # defeat the axon sitecustomize
jax.config.update("jax_num_cpu_devices", 1)
import sys

coordinator, pid = sys.argv[1], int(sys.argv[2])
from speech_enhancement_tpu.parallel import init_distributed, data_parallel_mesh
init_distributed(coordinator=coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = data_parallel_mesh()
sharding = NamedSharding(mesh, P("data"))

# each process contributes its addressable shard of a global [2] array
local = np.array([float(pid + 1)], np.float32)
global_x = jax.make_array_from_process_local_data(sharding, local, (2,))

@jax.jit
def total(x):
    return jnp.sum(x)

out = float(total(global_x))
assert out == 3.0, out  # 1 + 2 summed across processes over the mesh
print(f"proc {pid}: global sum {out} over {jax.device_count()} devices OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# Two processes x 4 local devices: the full SCP-GAN generator +
# self-correcting discriminator steps over a globally sharded batch of 8
# (the reference's primary mode is exactly this shape of multi-process DDP
# training, main_gan.py:133-188).  XLA inserts the cross-process gradient
# all-reduce; each process prints the losses and a param checksum, which
# the parent compares against its own single-process 8-device run.
_TRAIN_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")  # defeat the axon sitecustomize
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_compilation_cache_dir", "{cache_dir}")
import sys

coordinator, pid = sys.argv[1], int(sys.argv[2])
from speech_enhancement_tpu.parallel import init_distributed
init_distributed(coordinator=coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tests.distributed_trainstep_common import (
    build, make_batch, run_steps, L,
)

gen, disc, gen_tx, disc_tx, state = build()
# host (numpy) state: identical on both processes, so jit treats it as
# process-replicated input; committed single-device arrays would not be
# valid global inputs in multi-controller mode
state = jax.tree_util.tree_map(np.asarray, state)
clean, noisy, q_est, q_clean, q_noisy = make_batch()

from speech_enhancement_tpu.parallel import data_parallel_mesh
mesh = data_parallel_mesh()
sh = NamedSharding(mesh, P("data"))
lo, hi = pid * 4, (pid + 1) * 4
g = lambda x: jax.make_array_from_process_local_data(sh, x[lo:hi], x.shape)

# Align the two processes BEFORE the first collective executes: the
# jitted create_gan_state compiles in build() take minutes each on this
# host and their duration skews the processes, while Gloo context
# initialization has a hard 30 s rendezvous timeout (see
# parallel.barrier — the production CLIs do the same post-init).
from speech_enhancement_tpu.parallel import barrier
barrier("local_compiles_done")

gen_loss, disc_loss, checksum = run_steps(
    gen, disc, gen_tx, disc_tx, state,
    g(clean), g(noisy), g(q_est), g(q_clean), g(q_noisy),
)
print("RESULT", round(gen_loss, 6), round(disc_loss, 6), round(checksum, 6))
"""


@pytest.mark.slow
def test_two_process_gan_train_step(tmp_path):
    """2 processes x 4 devices each run the full SCP-GAN gen+disc steps on
    a globally sharded batch; losses and updated params must match the
    single-process 8-device run (closes SURVEY §2.8 DDP-parity: the
    reference trains exactly this way via mp.spawn+NCCL,
    main_gan.py:133-188)."""
    import numpy as np

    from tests.distributed_trainstep_common import build, make_batch, run_steps
    from speech_enhancement_tpu.parallel import (
        data_parallel_mesh,
        replicate_state,
        shard_batch,
    )

    # reference: single process, 8 virtual devices (conftest mesh)
    gen, disc, gen_tx, disc_tx, state = build()
    clean, noisy, q_est, q_clean, q_noisy = make_batch()
    mesh = data_parallel_mesh(8)
    state_r = replicate_state(mesh, state)
    c, n, qe, qc, qn = shard_batch(mesh, clean, noisy, q_est, q_clean, q_noisy)
    ref = run_steps(gen, disc, gen_tx, disc_tx, state_r, c, n, qe, qc, qn)

    # 2-process run of the same math
    cache = str(tmp_path / "xla_cache")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TRAIN_CHILD.format(cache_dir=cache),
             coordinator, str(pid)],
            env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        gen_loss, disc_loss, checksum = map(float, line.split()[1:])
        np.testing.assert_allclose(gen_loss, ref[0], rtol=2e-4)
        np.testing.assert_allclose(disc_loss, ref[1], rtol=2e-3)
        np.testing.assert_allclose(checksum, ref[2], rtol=2e-4)


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # each process owns exactly one device: drop any forced 8-device flag
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, coordinator, str(pid)],
            env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "OK" in out
