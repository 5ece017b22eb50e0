"""Entity churn in a live stepped env: spawn/destroy/sort every step."""

import jax.numpy as jnp
import numpy as np

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.projectiles import CAPACITY, Projectiles

W = 6


def test_churn_conservation_and_sort():
    sim = make_sim(Projectiles(), num_worlds=W, seed=4, donate=False)
    step = sim.step_fn()
    s = sim.state
    inp = {"action": jnp.zeros((W,), jnp.int32),
           "reset": jnp.zeros((W,), jnp.int32)}
    saw_destroy = False
    for t in range(120):
        s, o = step(s, inp)
        live = np.asarray(o["live"])
        spawned = np.asarray(s.singletons["TotalSpawned"])
        destroyed = np.asarray(s.singletons["TotalDestroyed"])
        # conservation: live == spawned - destroyed (capacity drops only
        # if the table fills; ballistics keep it well below 32)
        np.testing.assert_array_equal(live, spawned - destroyed)
        assert (live <= CAPACITY).all()
        saw_destroy = saw_destroy or (destroyed > 0).any()
        # live rows sorted by height (descending)
        pos = np.asarray(s.tables["Projectile"].columns["PPos"])
        for w in range(W):
            z = pos[w, : live[w], 2]
            assert (np.diff(z) <= 1e-5).all(), (t, w, z)
    assert saw_destroy
    assert (np.asarray(s.singletons["TotalSpawned"]) > 50).all()
    # steady state: spawn rate ~ destroy rate -> bounded population
    assert (np.asarray(o["live"]) < CAPACITY).all()


def test_churn_deterministic():
    def run(seed):
        sim = make_sim(Projectiles(), num_worlds=W, seed=seed, donate=False)
        step = sim.step_fn()
        s = sim.state
        inp = {"action": jnp.zeros((W,), jnp.int32),
               "reset": jnp.zeros((W,), jnp.int32)}
        for _ in range(40):
            s, o = step(s, inp)
        return np.asarray(o["positions"]), np.asarray(o["live"])

    p1, l1 = run(7)
    p2, l2 = run(7)
    np.testing.assert_array_equal(l1, l2)
    for w in range(W):
        np.testing.assert_array_equal(p1[w, : l1[w]], p2[w, : l1[w]])
