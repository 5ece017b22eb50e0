"""Checkpoint/restore: masked per-world save/restore + disk round-trip."""

import os

import jax.numpy as jnp
import numpy as np

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.cartpole import Cartpole
from madrona_tpu.utils import checkpoint as ckpt

W = 8


def run(sim, s, steps, acts=None):
    step = sim.step_fn()
    for t in range(steps):
        s, o = step(s, {
            "action": jnp.zeros((W,), jnp.int32) if acts is None else acts,
            "reset": jnp.zeros((W,), jnp.int32),
        })
    return s, o


def test_masked_save_restore():
    sim = make_sim(Cartpole(), num_worlds=W, seed=0, donate=False)
    s0, _ = run(sim, sim.state, 3)
    buf = ckpt.snapshot(s0)

    # advance; save only even worlds into the buffer at t=6
    s1, _ = run(sim, s0, 3)
    even = jnp.asarray([i % 2 == 0 for i in range(W)])
    buf = ckpt.save_worlds(buf, s1, even)

    # advance more, then restore even worlds
    s2, _ = run(sim, s1, 4)
    s3 = ckpt.restore_worlds(s2, buf, even)

    cart2 = np.asarray(s2.tables["Cart"].columns["CartState"])
    cart3 = np.asarray(s3.tables["Cart"].columns["CartState"])
    cart1 = np.asarray(s1.tables["Cart"].columns["CartState"])
    for i in range(W):
        if i % 2 == 0:
            np.testing.assert_array_equal(cart3[i], cart1[i])  # restored
        else:
            np.testing.assert_array_equal(cart3[i], cart2[i])  # untouched
    # global step stays live
    assert int(s3.step) == int(s2.step)
    # restored worlds resume stepping fine
    s4, o = run(sim, s3, 2)
    assert np.isfinite(np.asarray(o["obs"])).all()


def test_disk_roundtrip(tmp_path):
    sim = make_sim(Cartpole(), num_worlds=W, seed=1, donate=False)
    s, _ = run(sim, sim.state, 5)
    path = os.path.join(tmp_path, "ck.npz")
    ckpt.save_npz(path, s)
    s2 = ckpt.load_npz(path, s)
    a = np.asarray(s.tables["Cart"].columns["CartState"])
    b = np.asarray(s2.tables["Cart"].columns["CartState"])
    np.testing.assert_array_equal(a, b)
    # continue stepping from the loaded state deterministically
    sa, oa = run(sim, s, 3)
    sb, ob = run(sim, s2, 3)
    np.testing.assert_array_equal(np.asarray(oa["obs"]), np.asarray(ob["obs"]))
