"""2-process jax.distributed smoke test on CPU (VERDICT round-1 item 9).

Exercises the multi-host glue in parallel/distributed.py:24-37 —
jax.distributed.initialize with a local coordinator, a global mesh
spanning both processes, worlds_per_host allocation, and a sharded
cartpole step on each host's devices — all with CPU devices so no pod
is needed (SURVEY §4: multi-host tests via
xla_force_host_platform_device_count).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax

sys.path.insert(0, os.environ["MTPU_REPO"])

from madrona_tpu.parallel import distributed as dist

pid = int(os.environ["MTPU_PROC"])
dist.initialize(
    coordinator_address=os.environ["MTPU_COORD"],
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()       # 2 local x 2
assert jax.local_device_count() == 2

# per-host world allocation
assert dist.worlds_per_host(8) == 4
try:
    dist.worlds_per_host(7)
    raise SystemExit("expected ValueError")
except ValueError:
    pass

# global mesh over all processes' devices + a sharded computation whose
# collective crosses the process boundary
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = dist.global_mesh()
assert mesh.devices.size == 4

x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(mesh.axis_names[0])),
    jnp.arange(2, dtype=jnp.float32) + 2.0 * pid,   # global [0,1,2,3]
    (4,),
)
total = jax.jit(
    lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
)(x)
assert float(total) == 6.0, float(total)

# a real sharded env step over the global mesh
from madrona_tpu.models.base import make_sim
from madrona_tpu.models.cartpole import Cartpole
from madrona_tpu.parallel.mesh import shard_state

W = 8  # 2 worlds/device
sim = make_sim(Cartpole(), num_worlds=W, seed=0, donate=False)
state = shard_state(sim.state, mesh)
step = sim.step_fn()
inp = {
    "action": jnp.zeros((W,), jnp.int32),
    "reset": jnp.zeros((W,), jnp.int32),
}
inp = jax.device_put(inp, NamedSharding(mesh, P(mesh.axis_names[0])))
state, out = step(state, inp)
state, out = step(state, inp)
assert out["obs"].shape[0] == W
print(f"proc {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    # the container's axon sitecustomize (on PYTHONPATH) imports jax at
    # interpreter startup, which makes the backend sticky BEFORE
    # jax.distributed.initialize can run — strip it for CPU-only workers
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pp)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "MTPU_COORD": coord,
        "MTPU_REPO": repo,
    })
    procs = []
    for pid in range(2):
        e = dict(env)
        e["MTPU_PROC"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)],
            env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
