"""CollisionEvents export: the reference declares CollisionEvent
(physics.hpp:95-100) but never populates it; madrona_tpu fills the
buffer from the step's narrowphase contacts."""

import dataclasses as dc

import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.core.registry import ECSRegistry
from madrona_tpu.core.state import StateManager
from madrona_tpu.graph.builder import TaskGraphBuilder
from madrona_tpu.graph.executor import Executor
from madrona_tpu.physics import api as phys
from madrona_tpu.physics.bodies import ObjectRegistry
from madrona_tpu.physics.geo import box_hull
from madrona_tpu.physics.xpbd import PhysicsConfig

W = 2


def _build(cfg=None, max_events=4):
    sm = StateManager()
    reg = ECSRegistry(sm)
    phys.register_types(reg, max_bodies=4)
    phys.register_collision_events(reg, max_events=max_events)
    reg.export_singleton(phys.COLLISION_EVENTS, "events")
    om_r = ObjectRegistry()
    obj = om_r.add_hull(box_hull((0.5, 0.5, 0.5)), mass=1.0)
    plane = om_r.add_plane()
    om = om_r.build()

    b = TaskGraphBuilder(sm, "step")
    phys.setup_physics_step_tasks(
        b, om, cfg or PhysicsConfig(narrowphase_once=True)
    )
    ex = Executor(sm, {"step": b.build()}, num_worlds=W, seed=0,
                  donate=False)

    # plane + one box falling from 1.2 (via the entity store, so event
    # handles are real Entities)
    state = ex.state
    pos = np.zeros((W, 2, 3), np.float32)
    pos[:, 1] = [0, 0, 1.2]
    rot = np.zeros((W, 2, 4), np.float32)
    rot[..., 0] = 1
    zeros3 = jnp.zeros((W, 2, 3), jnp.float32)
    values = {
        "Position": jnp.asarray(pos),
        "Rotation": jnp.asarray(rot),
        "Scale": jnp.ones((W, 2, 3), jnp.float32),
        "ObjectID": jnp.asarray(
            np.tile([plane, obj], (W, 1)).astype(np.int32)
        ),
        "ResponseType": jnp.asarray(
            np.tile([2, 0], (W, 1)).astype(np.int32)   # static, dynamic
        ),
        "Velocity": {"linear": zeros3, "angular": zeros3},
        "ExternalForce": zeros3,
        "ExternalTorque": zeros3,
        "SubstepPrev": {
            "x": zeros3, "q": jnp.asarray(rot),
        },
        "PreSolvePositional": {
            "x": zeros3, "q": jnp.asarray(rot),
        },
        "PreSolveVelocity": {"v": zeros3, "omega": zeros3},
    }
    state, ents = sm.make_entities(
        state, phys.RIGID_BODY, values, jnp.ones((W, 2), bool)
    )
    ex.state = state
    return ex, np.asarray(ents)


def test_events_fire_on_contact():
    ex, ents = _build()
    saw = np.zeros((W,), bool)
    for t in range(60):
        outs = ex.run(inputs={})
        ev = outs["events"]
        num = np.asarray(ev["num"])
        assert (np.asarray(ev["overflow"]) == 0).all()
        for w in range(W):
            if num[w] == 0:
                # no contact this step (falling or bouncing): buffer
                # must be fully cleared
                assert (np.asarray(ev["row_a"])[w] == -1).all()
                continue
            # the only possible pair is (box, plane)
            saw[w] = True
            assert num[w] == 1, (t, w, num)
            rows = sorted([int(np.asarray(ev["row_a"])[w, 0]),
                           int(np.asarray(ev["row_b"])[w, 0])])
            assert rows == [0, 1], (t, w, rows)
            # entity handles match the spawned entities (gen|id)
            got = {tuple(np.asarray(ev["a"])[w, 0]),
                   tuple(np.asarray(ev["b"])[w, 0])}
            expect = {tuple(ents[w, 0]), tuple(ents[w, 1])}
            assert got == expect, (got, expect)
            # inactive slots are Entity.none / -1
            assert (np.asarray(ev["row_a"])[w, 1:] == -1).all()
            assert (np.asarray(ev["a"])[w, 1:] == -1).all()
    assert saw.all(), "box never contacted the plane in 60 steps"


def test_events_empty_before_contact():
    ex, _ = _build()
    outs = ex.run(inputs={})
    ev = outs["events"]
    assert (np.asarray(ev["num"]) == 0).all()
    assert (np.asarray(ev["row_a"]) == -1).all()


def test_events_reject_fused_tier():
    ex, _ = _build(cfg=PhysicsConfig(
        solver="jacobi", narrowphase_once=True, megakernel_fused=True,
    ))
    with pytest.raises(ValueError, match="CollisionEvents"):
        ex.run(inputs={})         # check fires when the step traces


def test_events_reject_per_substep_narrowphase():
    ex, _ = _build(cfg=PhysicsConfig(narrowphase_once=False))
    with pytest.raises(ValueError, match="CollisionEvents"):
        ex.run(inputs={})


def test_events_with_megakernel_tier():
    """The non-fused megakernel tier still exports events (contacts are
    computed outside the kernel when narrowphase_once=True)."""
    ex, _ = _build(cfg=PhysicsConfig(
        solver="jacobi", narrowphase_once=True, megakernel=True,
    ))
    fired = False
    for _ in range(60):
        ev = ex.run(inputs={})["events"]
        if (np.asarray(ev["num"]) > 0).all():
            fired = True
            break
    assert fired
