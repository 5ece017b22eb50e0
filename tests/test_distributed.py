"""Multi-device: sharded stepping on the 8-device virtual mesh +
weak-scaling harness mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.cartpole import Cartpole
from madrona_tpu.parallel import mesh as pmesh
from madrona_tpu.parallel import distributed as dist


def test_sharded_step_matches_single_device():
    W = 16
    sim = make_sim(Cartpole(), num_worlds=W, seed=0, donate=False)
    step = sim.step_fn()
    inp = {"action": jnp.zeros((W,), jnp.int32),
           "reset": jnp.zeros((W,), jnp.int32)}
    s_ref, o_ref = step(sim.state, inp)

    mesh = dist.global_mesh()
    assert mesh.devices.size == 8
    s_sh = pmesh.shard_state(sim.state, mesh)
    inp_sh = jax.device_put(inp, pmesh.input_shardings(inp, mesh))
    s2, o2 = step(s_sh, inp_sh)
    np.testing.assert_array_equal(np.asarray(o2["obs"]), np.asarray(o_ref["obs"]))
    # outputs actually sharded over worlds
    shard_devs = {d for d in o2["obs"].sharding.device_set}
    assert len(shard_devs) == 8


def test_weak_scaling_harness():
    def make_step(num_worlds):
        sim = make_sim(Cartpole(), num_worlds=num_worlds, seed=0,
                       donate=False)
        mesh = pmesh.make_mesh(jax.devices()[: max(1, num_worlds // 4)])
        state = pmesh.shard_state(sim.state, mesh)
        inp = {"action": jnp.zeros((num_worlds,), jnp.int32),
               "reset": jnp.zeros((num_worlds,), jnp.int32)}
        inp = jax.device_put(inp, pmesh.input_shardings(inp, mesh))
        raw = sim.step_fn()

        def fn(s, i):
            s2, _ = raw(s, i)
            return s2

        return state, inp, fn

    res = dist.weak_scaling(make_step, worlds_per_device=4,
                            device_counts=[1, 2, 4], steps=5)
    assert set(res["steps_per_sec"]) == {1, 2, 4}
    assert all(v > 0 for v in res["steps_per_sec"].values())
    assert res["efficiency"][1] == 1.0
