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
