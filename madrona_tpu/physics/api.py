"""PhysicsSystem: registration + taskgraph wiring facade.

Mirrors the reference's public surface (``PhysicsSystem::registerTypes`` /
``init`` / ``setupPhysicsStepTasks`` / ``setupCleanupTasks``,
``include/madrona/physics.hpp:158-226``, ``src/physics/physics.cpp:308-407``).

Execution-shape note: the reference splices ~10 taskgraph nodes per
substep (integrate -> narrowphase -> solvePositions -> setVelocities ->
solveVelocities -> clear); here the whole substep loop is one fused
custom node — the node granularity existed to let the megakernel
work-steal between phases, which XLA's fusion replaces. Broadphase
candidates are computed once per step before the substep loop, exactly
like setupPreIntegrationTasks (physics.cpp:344-353).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import ECSRegistry
from ..core.state import SimState, StateManager
from ..graph.builder import TaskGraphBuilder, TaskGraphID
from . import broadphase as bp
from . import geo
from . import narrowphase as np_
from .bodies import ObjectManager
from .xpbd import BodyState, Contacts, PhysicsConfig
from . import xpbd
from . import joints as _joints

RIGID_BODY = "RigidBody"
JOINT_BUFFER = "JointBuffer"


def register_types(reg: ECSRegistry, max_bodies: int):
    """Register the RigidBody archetype (the reference's RigidBody bundle,
    physics.hpp:37-46, + XPBD solver components, xpbd.cpp:26-47)."""
    reg.register_component("Position", (3,))
    reg.register_component("Rotation", (4,))
    reg.register_component("Scale", (3,))
    reg.register_component("Velocity", fields={
        "linear": ((3,), jnp.float32), "angular": ((3,), jnp.float32),
    })
    reg.register_component("ObjectID", (), jnp.int32)
    reg.register_component("ResponseType", (), jnp.int32)
    reg.register_component("ExternalForce", (3,))
    reg.register_component("ExternalTorque", (3,))
    reg.register_component("SubstepPrev", fields={
        "x": ((3,), jnp.float32), "q": ((4,), jnp.float32),
    })
    reg.register_component("PreSolvePositional", fields={
        "x": ((3,), jnp.float32), "q": ((4,), jnp.float32),
    })
    reg.register_component("PreSolveVelocity", fields={
        "v": ((3,), jnp.float32), "omega": ((3,), jnp.float32),
    })
    reg.register_archetype(
        RIGID_BODY,
        [
            "Position", "Rotation", "Scale", "ObjectID", "ResponseType",
            "Velocity", "ExternalForce", "ExternalTorque",
            "SubstepPrev", "PreSolvePositional", "PreSolveVelocity",
        ],
        capacity=max_bodies,
    )


COLLISION_EVENTS = "CollisionEvents"


def register_collision_events(reg: ECSRegistry, max_events: int = 16):
    """Register the per-world collision-event buffer.

    The reference declares ``CollisionEvent { Entity a, b; }`` and
    registers its temporary archetype (``include/madrona/physics.hpp:
    95-100``, ``src/physics/physics.cpp:319-320``) but never populates
    it; here the buffer is filled every step from the narrowphase
    contacts (active pairs, compacted deterministically in contact-
    buffer order). ``a``/``b`` are Entity handles ([K, 2] gen|id;
    Entity.none for rows not allocated through the entity store),
    ``row_a``/``row_b`` the body table rows, ``num`` the event count
    (clamped to ``max_events``; ``overflow`` flags clamping).

    Requires ``PhysicsConfig.narrowphase_once=True`` (contacts are
    computed once per step) and a non-fused kernel tier — with
    ``megakernel_fused`` the contacts never leave VMEM.
    """
    k = max_events
    reg.register_singleton(COLLISION_EVENTS, fields={
        "a": ((k, 2), jnp.int32), "b": ((k, 2), jnp.int32),
        "row_a": ((k,), jnp.int32), "row_b": ((k,), jnp.int32),
        "num": ((), jnp.int32), "overflow": ((), jnp.int32),
    })


def _write_collision_events(sm_: StateManager, state: SimState,
                            contacts: Contacts) -> SimState:
    """Compact active contact pairs into the CollisionEvents singleton."""
    from ..ops import scatter as _scatter

    buf = state.singletons[COLLISION_EVENTS]
    k = buf["row_a"].shape[1]
    w, c = contacts.num.shape
    t = state.tables[RIGID_BODY]
    n_rows = t.columns["Position"].shape[1]

    valid = contacts.num > 0
    vi = valid.astype(jnp.int32)
    rank = jnp.cumsum(vi, axis=1) - vi                    # [W, C]
    total = jnp.sum(vi, axis=1)                           # [W]
    ok = valid & (rank < k)
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, c))

    ref = jnp.clip(contacts.ref, 0, n_rows - 1)
    alt = jnp.clip(contacts.alt, 0, n_rows - 1)

    def handles(rows):
        if t.entity_id.shape[1] == 0:         # no_entities archetype
            return jnp.full((w, c, 2), -1, jnp.int32)
        rows_c = jnp.clip(rows, 0, t.entity_id.shape[1] - 1)
        gen = jnp.take_along_axis(t.entity_gen, rows_c, axis=1)
        eid = jnp.take_along_axis(t.entity_id, rows_c, axis=1)
        return jnp.stack([gen, eid], axis=-1)             # [W, C, 2]

    empty2 = jnp.full((w, k, 2), -1, jnp.int32)
    empty1 = jnp.full((w, k), -1, jnp.int32)
    new = {
        "a": _scatter.masked_set_2d(empty2, widx, rank, handles(ref), ok),
        "b": _scatter.masked_set_2d(empty2, widx, rank, handles(alt), ok),
        "row_a": _scatter.masked_set_2d(empty1, widx, rank, ref, ok),
        "row_b": _scatter.masked_set_2d(empty1, widx, rank, alt, ok),
        "num": jnp.minimum(total, k),
        "overflow": (total > k).astype(jnp.int32),
    }
    singles = dict(state.singletons)
    singles[COLLISION_EVENTS] = new
    return dataclasses.replace(state, singletons=singles)


def register_joint_types(reg: ECSRegistry, max_joints: int):
    """Register the per-world joint buffer (reference: the JointConstraint
    archetype created by PhysicsSystem::registerTypes,
    src/physics/physics.cpp:145-180). Fixed capacity ``max_joints`` slots
    per world; apps fill slots at world init via joints.make_*_joint."""
    j = max_joints
    reg.register_singleton(JOINT_BUFFER, fields={
        "e1": ((j,), jnp.int32), "e2": ((j,), jnp.int32),
        "jtype": ((j,), jnp.int32),
        "r1": ((j, 3), jnp.float32), "r2": ((j, 3), jnp.float32),
        "attach_q1": ((j, 4), jnp.float32),
        "attach_q2": ((j, 4), jnp.float32),
        "separation": ((j,), jnp.float32),
        "a1_local": ((j, 3), jnp.float32),
        "a2_local": ((j, 3), jnp.float32),
        "active": ((j,), jnp.bool_),
    })


def joints_view(state: SimState) -> _joints.Joints:
    """View the JointBuffer singleton as a solver Joints pytree."""
    s = state.singletons[JOINT_BUFFER]
    return _joints.Joints(**s)


def write_joints(state: SimState, joints: _joints.Joints) -> SimState:
    singles = dict(state.singletons)
    singles[JOINT_BUFFER] = {
        f.name: getattr(joints, f.name)
        for f in dataclasses.fields(joints)
    }
    return dataclasses.replace(state, singletons=singles)


def body_state(sm: StateManager, state: SimState) -> BodyState:
    """View the RigidBody table as a solver BodyState (zero-copy)."""
    from ..core import archetype as _arch

    t = state.tables[RIGID_BODY]
    cap = sm.archetypes[RIGID_BODY].capacity
    c = t.columns
    return BodyState(
        pos=c["Position"], rot=c["Rotation"], scale=c["Scale"],
        vel=c["Velocity"]["linear"], omega=c["Velocity"]["angular"],
        obj_id=c["ObjectID"], response=c["ResponseType"],
        ext_force=c["ExternalForce"], ext_torque=c["ExternalTorque"],
        prev_x=c["SubstepPrev"]["x"], prev_q=c["SubstepPrev"]["q"],
        presolve_x=c["PreSolvePositional"]["x"],
        presolve_q=c["PreSolvePositional"]["q"],
        presolve_v=c["PreSolveVelocity"]["v"],
        presolve_w=c["PreSolveVelocity"]["omega"],
        active=_arch.row_mask(t, cap),
    )


def write_back(sm: StateManager, state: SimState, body: BodyState) -> SimState:
    t = state.tables[RIGID_BODY]
    cols = dict(t.columns)
    cols["Position"] = body.pos
    cols["Rotation"] = body.rot
    cols["Velocity"] = {"linear": body.vel, "angular": body.omega}
    cols["SubstepPrev"] = {"x": body.prev_x, "q": body.prev_q}
    cols["PreSolvePositional"] = {"x": body.presolve_x, "q": body.presolve_q}
    cols["PreSolveVelocity"] = {"v": body.presolve_v, "omega": body.presolve_w}
    tables = dict(state.tables)
    tables[RIGID_BODY] = dataclasses.replace(t, columns=cols)
    return dataclasses.replace(state, tables=tables)


def _narrowphase_all(
    body: BodyState, om: ObjectManager, cands: bp.Candidates,
    skip_hh: bool = False, sat_dirs: bool = False,
) -> Contacts:
    """Run the typed narrowphase kernels over the candidate buffers and
    emit the fixed-layout contact buffer (segments: [HH | HP | S]).

    Per-lane body reads go through one packed [N, 10] block (pos|rot|
    scale) so each candidate lane costs a single gather (see
    xpbd.pack_bodies for the TPU layout rationale)."""
    w, n = body.pos.shape[:2]
    dims = om.hull_dims
    n_obj = om.hull_pack.shape[0]

    nb = jnp.concatenate(
        [body.pos, body.rot, body.scale], axis=-1
    )  # [W, N, 10]
    obj_oh_tbl = jax.nn.one_hot(body.obj_id, n_obj)     # [W, N, O]
    nd = om.n_edge_dirs if sat_dirs else 0

    def pair_blocks(rows):
        """Per-pair packed data via one-hot einsums (TPU gathers re-read
        operands pathologically; MXU matmuls against one-hots don't)."""
        oh = jax.nn.one_hot(jnp.clip(rows, 0, n - 1), n)   # [W, P, N]
        blk = jnp.einsum(
            "wpn,wnf->wpf", oh, nb, preferred_element_type=jnp.float32
        )
        obj_oh = jnp.einsum(
            "wpn,wno->wpo", oh, obj_oh_tbl,
            preferred_element_type=jnp.float32,
        )
        hrow = jnp.einsum(
            "wpo,ok->wpk", obj_oh, om.hull_pack,
            preferred_element_type=jnp.float32,
        )
        srad = jnp.einsum(
            "wpo,o->wp", obj_oh, om.sphere_radius,
            preferred_element_type=jnp.float32,
        )
        drow = None
        if nd:
            drow = jnp.einsum(
                "wpo,ok->wpk", obj_oh, om.hull_dirs_pack,
                preferred_element_type=jnp.float32,
            )
        return blk, hrow, srad, drow

    def split(blk):
        return blk[0:3], blk[3:7], blk[7:10]

    # --- hull-hull kernel
    def hh_lane(blk_a, hrow_a, drow_a, blk_b, hrow_b, drow_b, pair):
        pa, qa, sa = split(blk_a)
        pb, qb, sb = split(blk_b)
        ha = np_.hull_row_to_world(
            hrow_a, dims, pa, qa, sa, dirs_row=drow_a, n_dirs=nd
        )
        hb = np_.hull_row_to_world(
            hrow_b, dims, pb, qb, sb, dirs_row=drow_b, n_dirs=nd
        )
        c = np_.hull_hull_contact(ha, hb)
        ref = jnp.where(c["ref_is_a"], pair[0], pair[1])
        alt = jnp.where(c["ref_is_a"], pair[1], pair[0])
        ok = c["valid"] & (pair[0] < n)
        return (
            jnp.where(ok, ref, n), jnp.where(ok, alt, n),
            jnp.concatenate([c["points"], c["depths"][:, None]], axis=-1),
            jnp.where(ok, c["num"], 0), c["normal"],
        )

    def hp_lane(blk_a, hrow_a, blk_b, pair):
        ph, qh, sh = split(blk_a)
        pp, qp, _ = split(blk_b)
        h = np_.hull_row_to_world(hrow_a, dims, ph, qh, sh,
                                  need_edges=False)
        c = np_.hull_plane_contact(h, pp, qp)
        ok = c["valid"] & (pair[0] < n)
        # plane is ref
        return (
            jnp.where(ok, pair[1], n), jnp.where(ok, pair[0], n),
            jnp.concatenate([c["points"], c["depths"][:, None]], axis=-1),
            jnp.where(ok, c["num"], 0), c["normal"],
        )

    def sp_lane(blk_a, rad_a, blk_b, hrow_b, rad_b, pair, kind):
        ps, _, ss = split(blk_a)
        po, qo, so = split(blk_b)
        radius = rad_a * ss[0]
        c_ss = np_.sphere_sphere_contact(ps, radius, po, rad_b * so[0])
        c_sp = np_.sphere_plane_contact(ps, radius, po, qo)
        h = np_.hull_row_to_world(hrow_b, dims, po, qo, so)
        c_sh = np_.sphere_hull_contact(ps, radius, h)
        is_plane = kind == geo.TYPE_PLANE
        is_hull = kind == geo.TYPE_HULL
        pick = lambda f: jnp.where(
            is_plane, c_sp[f], jnp.where(is_hull, c_sh[f], c_ss[f])
        )
        ok = pick("valid") & (pair[0] < n)
        # ref is always the second body (hull/plane/other-sphere)
        return (
            jnp.where(ok, pair[1], n), jnp.where(ok, pair[0], n),
            jnp.concatenate(
                [pick("points"), pick("depths")[:, None]], axis=-1
            ),
            jnp.where(ok, pick("num"), 0), pick("normal"),
        )

    vv = lambda f: jax.vmap(jax.vmap(f))

    if skip_hh:
        # the caller fills the hh segment (Pallas lane); emit sentinels
        p_hh = cands.hh.shape[1]
        hh = (
            jnp.full((w, p_hh), n, jnp.int32),
            jnp.full((w, p_hh), n, jnp.int32),
            jnp.zeros((w, p_hh, 4, 4), jnp.float32),
            jnp.zeros((w, p_hh), jnp.int32),
            jnp.zeros((w, p_hh, 3), jnp.float32),
        )
    else:
        blk_a, hrow_a, rad_a, drow_a = pair_blocks(cands.hh[..., 0])
        blk_b, hrow_b, _, drow_b = pair_blocks(cands.hh[..., 1])
        if nd:
            hh = vv(hh_lane)(
                blk_a, hrow_a, drow_a, blk_b, hrow_b, drow_b, cands.hh
            )
        else:
            hh = vv(
                lambda ba, hra, bb, hrb, pr: hh_lane(
                    ba, hra, None, bb, hrb, None, pr
                )
            )(blk_a, hrow_a, blk_b, hrow_b, cands.hh)

    blk_a, hrow_a, _, _ = pair_blocks(cands.hp[..., 0])
    blk_b, _, _, _ = pair_blocks(cands.hp[..., 1])
    hp = vv(hp_lane)(blk_a, hrow_a, blk_b, cands.hp)

    if cands.sp.shape[1] == 0:
        # sphere tier disabled (CandidateCaps.sphere_any == 0 — envs
        # with no sphere prims skip the whole lane; keeps the contact
        # buffer C a clean multiple of the 8-sublane vreg height)
        sp = (
            jnp.zeros((w, 0), jnp.int32), jnp.zeros((w, 0), jnp.int32),
            jnp.zeros((w, 0, 4, 4), jnp.float32),
            jnp.zeros((w, 0), jnp.int32),
            jnp.zeros((w, 0, 3), jnp.float32),
        )
    else:
        blk_a, _, rad_a, _ = pair_blocks(cands.sp[..., 0])
        blk_b, hrow_b, rad_b, _ = pair_blocks(cands.sp[..., 1])
        sp = vv(sp_lane)(
            blk_a, rad_a, blk_b, hrow_b, rad_b, cands.sp, cands.sp_kind
        )

    cat = lambda i: jnp.concatenate([hh[i], hp[i], sp[i]], axis=1)
    return Contacts(
        ref=cat(0), alt=cat(1), points=cat(2),
        num=cat(3), normal=cat(4),
        lambda_n=jnp.zeros(cat(3).shape, jnp.float32),
    )


def _narrowphase_mixed_pallas(
    body: BodyState, om: ObjectManager, cands: bp.Candidates,
    sublane: bool = False, pair_tile: int = 8, vmem_limit_mb: int = 0,
    sat_dirs: bool = False, tile_w: int = 0,
) -> Contacts:
    """Contacts with the hull-hull lane on the Pallas kernel and the
    cheap hull-plane / sphere lanes on the XLA path."""
    full = _narrowphase_all(body, om, cands, skip_hh=True)
    ref, alt, points, num, normal = narrowphase_hh_pallas(
        body, om, cands, sublane=sublane, pair_tile=pair_tile,
        vmem_limit_mb=vmem_limit_mb, sat_dirs=sat_dirs, tile_w=tile_w,
    )
    p = cands.hh.shape[1]
    return Contacts(
        ref=full.ref.at[:, :p].set(ref),
        alt=full.alt.at[:, :p].set(alt),
        points=full.points.at[:, :p].set(points),
        num=full.num.at[:, :p].set(num),
        normal=full.normal.at[:, :p].set(normal),
        lambda_n=full.lambda_n,
    )


def megakernel_substeps(body: BodyState, contacts: Optional[Contacts],
                        om, cfg,
                        jbuf: Optional[_joints.Joints] = None,
                        tile_w: int = 128,
                        interpret: Optional[bool] = None,
                        planar_contacts=None) -> BodyState:
    """Run every substep (integrate -> position solve -> set_velocities
    -> velocity solve) in one VMEM-resident Pallas call
    (ops/solver_pallas). Contacts are frozen for the step
    (narrowphase_once semantics); outputs match the XLA jacobi path.

    ``planar_contacts`` (from ops/physics_megakernel.make_contacts_kernel)
    supplies the contact buffers already in the solver's planar layout —
    the narrowphase="pallas_mega" tier — skipping the W-major Contacts
    packing entirely."""
    from ..ops import solver_pallas as spk

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w, n = body.pos.shape[:2]
    if planar_contacts is not None:
        c = planar_contacts[0].shape[0]
    else:
        c = contacts.ref.shape[1]
    h = cfg.dt / cfg.substeps

    params = om.obj_params(body.obj_id)
    static = body.response == xpbd.RESPONSE_STATIC
    dynamic = body.response == xpbd.RESPONSE_DYNAMIC
    moving = (~static) & body.active
    f32 = lambda b: b.astype(jnp.float32)[..., None]
    inv_m_masked = jnp.where(static, 0.0, params["inv_m"])
    inv_i_masked = jnp.where(static[..., None], 0.0, params["inv_i"])
    param_t = jnp.concatenate(
        [
            inv_m_masked[..., None], inv_i_masked,
            params["mu_s"][..., None], params["mu_d"][..., None],
            f32(dynamic), f32(moving), f32(static),
            body.ext_force, body.ext_torque, f32(body.active),
            params["inv_m"][..., None], params["inv_i"],
        ],
        axis=-1,
    )  # [W, N, PARAM_F]
    state_t = jnp.concatenate(
        [body.pos, body.rot, body.vel, body.omega], axis=-1
    )  # [W, N, STATE_F]

    t3 = lambda a: jnp.transpose(a, (2, 1, 0))
    t2 = lambda a: jnp.transpose(a, (1, 0))
    if planar_contacts is None:
        avg, max_pen, zero = xpbd._avg_contacts_batch(
            contacts.points, contacts.num
        )
        ok = (contacts.num > 0) & (~zero)
        con_t = jnp.concatenate(
            [contacts.normal, avg, max_pen[..., None],
             ok.astype(jnp.float32)[..., None]],
            axis=-1,
        )  # [W, C, CON_F]
        pts_t = contacts.points.reshape(w, c, 16)
        cargs = (
            t2(contacts.ref), t2(contacts.alt),
            t3(con_t), t3(pts_t), t2(contacts.num),
        )
    else:
        ref_p, alt_p, con_p, pts_p, num_p = planar_contacts
        cargs = (
            ref_p.astype(jnp.int32), alt_p.astype(jnp.int32),
            con_p, pts_p, num_p,
        )
    jargs = ()
    n_joints = 0
    if jbuf is not None:
        n_joints = jbuf.capacity
        jok = (
            jbuf.active & (jbuf.e1 >= 0) & (jbuf.e1 < n)
            & (jbuf.e2 >= 0) & (jbuf.e2 < n)
        )
        jnt_t = jnp.concatenate(
            [
                jbuf.r1, jbuf.r2, jbuf.attach_q1, jbuf.attach_q2,
                jbuf.separation[..., None], jbuf.a1_local, jbuf.a2_local,
                jok.astype(jnp.float32)[..., None],
                (jbuf.jtype == _joints.JOINT_FIXED).astype(
                    jnp.float32
                )[..., None],
            ],
            axis=-1,
        )  # [W, J, JNT_F]
        jargs = (t2(jbuf.e1), t2(jbuf.e2), t3(jnt_t))
    fn = spk.make_substep_solver(
        n, c, cfg.substeps, cfg.jacobi_iters, h, cfg.gravity,
        cfg.restitution, cfg.restitution_threshold,
        n_joints=n_joints, tile_w=min(tile_w, w), interpret=interpret,
        loop=cfg.megakernel_loop, vmem_limit_mb=cfg.megakernel_vmem_mb,
        dyn_range=cfg.solver_dynamic_range,
        ref_dyn_lanes=cfg.solver_ref_dyn_lanes,
    )
    out = fn(t3(state_t), t3(param_t), *cargs, *jargs)
    out = jnp.transpose(out, (2, 1, 0))               # [W, N, OUT_F]
    return dataclasses.replace(
        body,
        pos=out[..., 0:3], rot=out[..., 3:7],
        vel=out[..., 7:10], omega=out[..., 10:13],
        prev_x=out[..., 13:16], prev_q=out[..., 16:20],
        presolve_x=out[..., 20:23], presolve_q=out[..., 23:27],
        presolve_v=out[..., 27:30], presolve_w=out[..., 30:33],
    )


def megakernel_fused_step(body: BodyState, cands: bp.Candidates, om, cfg,
                          jbuf: Optional[_joints.Joints] = None,
                          tile_w: int = 128,
                          interpret: Optional[bool] = None) -> BodyState:
    """Whole physics step (narrowphase at predicted poses + every
    substep) in ONE Pallas call (ops/physics_megakernel) — the full
    megakernel analogue (src/mw/device/megakernel.cpp runs narrowphase
    and solver nodes in one persistent kernel). Equals the split path:
    narrow(integrate(body), cands) -> megakernel_substeps."""
    from ..ops import physics_megakernel as fpk
    from ..ops import solver_pallas as spk

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w, n = body.pos.shape[:2]
    h = cfg.dt / cfg.substeps

    params = om.obj_params(body.obj_id)
    static = body.response == xpbd.RESPONSE_STATIC
    dynamic = body.response == xpbd.RESPONSE_DYNAMIC
    moving = (~static) & body.active
    f32 = lambda b: b.astype(jnp.float32)[..., None]
    inv_m_masked = jnp.where(static, 0.0, params["inv_m"])
    inv_i_masked = jnp.where(static[..., None], 0.0, params["inv_i"])
    param_t = jnp.concatenate(
        [
            inv_m_masked[..., None], inv_i_masked,
            params["mu_s"][..., None], params["mu_d"][..., None],
            f32(dynamic), f32(moving), f32(static),
            body.ext_force, body.ext_torque, f32(body.active),
            params["inv_m"][..., None], params["inv_i"],
        ],
        axis=-1,
    )  # [W, N, PARAM_F]
    state_t = jnp.concatenate(
        [body.pos, body.rot, body.vel, body.omega], axis=-1
    )  # [W, N, STATE_F]
    n_obj = om.hull_pack.shape[0]
    obj_oh = jax.nn.one_hot(body.obj_id, n_obj)          # [W, N, O]
    srad = jnp.einsum(
        "wno,o->wn", obj_oh, om.sphere_radius,
        preferred_element_type=jnp.float32,
    )
    aux_t = jnp.concatenate(
        [body.scale, srad[..., None]], axis=-1
    )  # [W, N, AUX_F]

    t3 = lambda a: jnp.transpose(a, (2, 1, 0))
    t2 = lambda a: jnp.transpose(a, (1, 0))
    jargs = ()
    n_joints = 0
    if jbuf is not None:
        n_joints = jbuf.capacity
        jok = (
            jbuf.active & (jbuf.e1 >= 0) & (jbuf.e1 < n)
            & (jbuf.e2 >= 0) & (jbuf.e2 < n)
        )
        jnt_t = jnp.concatenate(
            [
                jbuf.r1, jbuf.r2, jbuf.attach_q1, jbuf.attach_q2,
                jbuf.separation[..., None], jbuf.a1_local, jbuf.a2_local,
                jok.astype(jnp.float32)[..., None],
                (jbuf.jtype == _joints.JOINT_FIXED).astype(
                    jnp.float32
                )[..., None],
            ],
            axis=-1,
        )
        jargs = (t2(jbuf.e1), t2(jbuf.e2), t3(jnt_t))
    cands_sp = cands.sp
    cands_sp_kind = cands.sp_kind
    if cands_sp.shape[1] == 0:
        # sphere tier disabled (CandidateCaps.sphere_any == 0): Mosaic
        # rejects zero-height tiles, so feed ONE all-sentinel sp lane —
        # rows_s == n makes valid_pair false everywhere, yielding an
        # always-dead contact slot (exact)
        cands_sp = jnp.full((w, 1, 2), n, jnp.int32)
        cands_sp_kind = jnp.full((w, 1), geo.TYPE_NONE, jnp.int32)
    fn = fpk.make_fused_step(
        om.hull_dims, n, n_obj, cfg.substeps, cfg.jacobi_iters, h,
        cfg.gravity, cfg.restitution, cfg.restitution_threshold,
        geo.TYPE_PLANE, geo.TYPE_HULL,
        n_joints=n_joints, tile_w=min(tile_w, w), interpret=interpret,
        loop=cfg.megakernel_loop, pair_chunk=cfg.fused_pair_chunk,
        vmem_limit_mb=cfg.megakernel_vmem_mb,
        n_dirs=om.n_edge_dirs if cfg.sat_tier == "edge_dirs" else 0,
    )
    out = fn(
        t3(state_t), t3(aux_t), t3(param_t),
        t2(body.obj_id.astype(jnp.float32)),
        t2(cands.hh[..., 0]), t2(cands.hh[..., 1]),
        t2(cands.hp[..., 0]), t2(cands.hp[..., 1]),
        t2(cands_sp[..., 0]), t2(cands_sp[..., 1]), t2(cands_sp_kind),
        om.hull_pack_planar, *jargs,
    )
    out = jnp.transpose(out, (2, 1, 0))               # [W, N, OUT_F]
    return dataclasses.replace(
        body,
        pos=out[..., 0:3], rot=out[..., 3:7],
        vel=out[..., 7:10], omega=out[..., 10:13],
        prev_x=out[..., 13:16], prev_q=out[..., 16:20],
        presolve_x=out[..., 20:23], presolve_q=out[..., 23:27],
        presolve_v=out[..., 27:30], presolve_w=out[..., 30:33],
    )


def make_physics_node(
    sm: StateManager,
    om: ObjectManager,
    cfg: PhysicsConfig,
    caps: Optional[bp.CandidateCaps] = None,
):
    """Build the physics step fn for ``builder.custom`` — the equivalent
    of the whole setupPhysicsStepTasks node chain (physics.cpp:353-386)."""
    caps = caps or bp.CandidateCaps()
    h = cfg.dt / cfg.substeps
    gravity = jnp.asarray(cfg.gravity, jnp.float32)

    if cfg.solver_ref_dyn_lanes:
        # the knob encodes an env-layout contract (every contact lane
        # >= K has a structurally-static ref row); validate the parts
        # visible at setup so a reordered candidate layout or a movable
        # plane object fails loudly instead of silently dropping the
        # ref-side corrections (round-4 advisor).
        if cfg.solver_ref_dyn_lanes != caps.hull_hull:
            raise ValueError(
                f"solver_ref_dyn_lanes={cfg.solver_ref_dyn_lanes} must "
                f"equal CandidateCaps.hull_hull={caps.hull_hull}: the "
                "static-ref segment is exactly the hull-plane candidate "
                "lanes, which start at the hull_hull cap"
            )
        if caps.sphere_any != 0:
            raise ValueError(
                "solver_ref_dyn_lanes requires sphere_any=0: sphere "
                "lanes after the hull-plane segment have dynamic refs"
            )
        pt_host = np.asarray(om.prim_type)
        im_host = np.asarray(om.inv_mass)
        movable_planes = (pt_host == geo.TYPE_PLANE) & (im_host != 0.0)
        if movable_planes.any():
            raise ValueError(
                "solver_ref_dyn_lanes requires every plane-typed object "
                "to be immovable (inv_mass == 0); movable plane object "
                f"ids: {np.nonzero(movable_planes)[0].tolist()}"
            )

    use_pallas = cfg.narrowphase in ("pallas", "pallas_sublane")
    sublane = cfg.narrowphase == "pallas_sublane"

    use_dirs = cfg.sat_tier == "edge_dirs"
    nd_sat = om.n_edge_dirs if use_dirs else 0

    def narrow(body, cands):
        if not use_pallas:
            return _narrowphase_all(body, om, cands, sat_dirs=use_dirs)
        return _narrowphase_mixed_pallas(
            body, om, cands, sublane=sublane,
            pair_tile=cfg.narrowphase_pair_tile,
            vmem_limit_mb=cfg.narrowphase_vmem_mb, sat_dirs=use_dirs,
            tile_w=cfg.narrowphase_tile_w,
        )

    def physics_step(sm_, state: SimState, node_key) -> SimState:
        body = body_state(sm_, state)
        # note: obj_params is intentionally NOT hoisted out of the substep
        # loop — measured 5% slower when materialized once (XLA fuses the
        # inline one-hot lookups into their consumers)
        params = None
        if cfg.broadphase == "swept":
            cands = bp.find_candidates_swept(
                body, om, caps, cfg.dt, window=cfg.broadphase_window
            )
        elif cfg.broadphase == "pallas":
            cands = bp.find_candidates_pallas(body, om, caps, cfg.dt)
        else:
            cands = bp.find_candidates(body, om, caps, cfg.dt)
        # surface the swept tier's window-saturation flag (the analogue
        # of the archetype-capacity overflow export, Executor.maybe_grow)
        if "BroadphaseOverflow" in sm_.singletons:
            singles = dict(state.singletons)
            singles["BroadphaseOverflow"] = jnp.maximum(
                singles["BroadphaseOverflow"],
                cands.overflow.astype(jnp.int32),
            )
            state = dataclasses.replace(state, singletons=singles)
        has_joints = JOINT_BUFFER in sm_.singletons
        jbuf = joints_view(state) if has_joints else None

        want_events = COLLISION_EVENTS in sm_.singletons
        if want_events and (
            cfg.megakernel_fused or not cfg.narrowphase_once
            or cfg.solver == "tgs"
        ):
            raise ValueError(
                "CollisionEvents export requires narrowphase_once=True "
                "with a non-fused tier (solver='jacobi'/'gauss_seidel', "
                "megakernel_fused=False): contacts must be computed "
                "once per step outside the fused kernel"
            )

        if cfg.solver == "tgs":
            from . import tgs as _tgs

            tcfg = _tgs.TGSConfig()

            def tgs_substep(body, _):
                body = _tgs.substep(
                    body, lambda b: narrow(b, cands),
                    om, h, gravity, tcfg, jbuf=jbuf,
                )
                return body, None

            body, _ = jax.lax.scan(
                tgs_substep, body, None, length=cfg.substeps
            )
            body = dataclasses.replace(
                body,
                ext_force=jnp.zeros_like(body.ext_force),
                ext_torque=jnp.zeros_like(body.ext_torque),
            )
            return write_back(sm_, state, body)

        jacobi = cfg.solver == "jacobi"

        if cfg.megakernel_fused:
            if not (jacobi and cfg.narrowphase_once):
                raise ValueError(
                    "PhysicsConfig.megakernel_fused requires "
                    "solver='jacobi' and narrowphase_once=True"
                )
            body = megakernel_fused_step(
                body, cands, om, cfg, jbuf=jbuf,
                tile_w=cfg.megakernel_tile,
            )
            body = dataclasses.replace(
                body,
                ext_force=jnp.zeros_like(body.ext_force),
                ext_torque=jnp.zeros_like(body.ext_torque),
            )
            return write_back(sm_, state, body)

        if cfg.narrowphase == "pallas_mega":
            # contacts megakernel tier: narrowphase (hh SAT + hp lane)
            # + the avg/max-pen assembly in ONE kernel emitting the
            # solver's planar buffers — no W-major Contacts ever built
            from ..ops import physics_megakernel as fpk

            if not (jacobi and cfg.narrowphase_once and cfg.megakernel):
                raise ValueError(
                    "narrowphase='pallas_mega' requires solver='jacobi', "
                    "narrowphase_once=True and megakernel=True"
                )
            if caps.sphere_any != 0:
                raise ValueError(
                    "narrowphase='pallas_mega' covers hull-hull + "
                    "hull-plane lanes only; set CandidateCaps."
                    "sphere_any=0 (envs with sphere prims use the "
                    "split tiers)"
                )
            if want_events:
                raise ValueError(
                    "CollisionEvents export needs W-major Contacts; "
                    "use narrowphase='pallas_sublane' instead of "
                    "'pallas_mega'"
                )
            interp = jax.default_backend() == "cpu"
            pred = xpbd.integrate(body, om, h, gravity)
            nb_t = jnp.moveaxis(
                jnp.concatenate(
                    [pred.pos, pred.rot, pred.scale], axis=-1
                ), 0, -1,
            )                                        # [N, 10, W]
            obj_t = jnp.moveaxis(
                body.obj_id.astype(jnp.float32), 0, -1
            )
            t2_ = lambda a: jnp.transpose(a, (1, 0))
            w_ = body.pos.shape[0]
            fnc = fpk.make_contacts_kernel(
                om.hull_dims, body.pos.shape[1],
                om.hull_pack.shape[0],
                tile_w=min(cfg.megakernel_tile, w_),
                interpret=interp,
                vmem_limit_mb=cfg.narrowphase_vmem_mb,
                n_dirs=nd_sat,
            )
            planar = fnc(
                t2_(cands.hh[..., 0]), t2_(cands.hh[..., 1]),
                t2_(cands.hp[..., 0]), t2_(cands.hp[..., 1]),
                nb_t, obj_t, om.hull_pack_planar,
            )
            body = megakernel_substeps(
                body, None, om, cfg, jbuf=jbuf,
                tile_w=cfg.megakernel_tile,
                planar_contacts=planar,
            )
            body = dataclasses.replace(
                body,
                ext_force=jnp.zeros_like(body.ext_force),
                ext_torque=jnp.zeros_like(body.ext_torque),
            )
            return write_back(sm_, state, body)

        frozen_contacts = None
        if cfg.narrowphase_once:
            frozen_contacts = narrow(
                xpbd.integrate(body, om, h, gravity), cands
            )
            if want_events:
                state = _write_collision_events(
                    sm_, state, frozen_contacts
                )

        if cfg.megakernel:
            if not (jacobi and cfg.narrowphase_once):
                raise ValueError(
                    "PhysicsConfig.megakernel requires solver='jacobi' "
                    "and narrowphase_once=True"
                )
            body = megakernel_substeps(
                body, frozen_contacts, om, cfg, jbuf=jbuf,
                tile_w=cfg.megakernel_tile,
            )
            body = dataclasses.replace(
                body,
                ext_force=jnp.zeros_like(body.ext_force),
                ext_torque=jnp.zeros_like(body.ext_torque),
            )
            return write_back(sm_, state, body)

        def substep(body, _):
            body = xpbd.integrate(body, om, h, gravity, params=params)
            contacts = (
                frozen_contacts if frozen_contacts is not None
                else narrow(body, cands)
            )
            if jacobi:
                body, contacts = xpbd.solve_positions_jacobi(
                    body, contacts, om, cfg.jacobi_iters, params=params
                )
                if has_joints:
                    body = _joints.solve_joints_jacobi(
                        body, jbuf, om, params=params
                    )
                body = xpbd.set_velocities(body, h)
                body = xpbd.solve_velocities_jacobi(
                    body, contacts, om, h,
                    cfg.restitution, cfg.restitution_threshold,
                    params=params,
                )
            else:
                body, contacts = xpbd.solve_positions(body, contacts, om)
                if has_joints:
                    body = _joints.solve_joints(body, jbuf, om)
                body = xpbd.set_velocities(body, h)
                body = xpbd.solve_velocities(
                    body, contacts, om, h,
                    cfg.restitution, cfg.restitution_threshold,
                )
            return body, None

        body, _ = jax.lax.scan(
            substep, body, None, length=cfg.substeps
        )
        # external forces are consumed each step (reference apps zero them
        # in their own systems; we clear after use)
        body = dataclasses.replace(
            body,
            ext_force=jnp.zeros_like(body.ext_force),
            ext_torque=jnp.zeros_like(body.ext_torque),
        )
        return write_back(sm_, state, body)

    return physics_step


def setup_physics_step_tasks(
    builder: TaskGraphBuilder,
    om: ObjectManager,
    cfg: PhysicsConfig,
    caps: Optional[bp.CandidateCaps] = None,
    deps=(),
) -> TaskGraphID:
    return builder.custom(
        make_physics_node(builder.sm, om, cfg, caps),
        deps=deps,
        name="physics_step",
    )


def narrowphase_hh_pallas(body, om, cands, interpret=None, tile_w=0,
                          sublane=False, pair_tile=8, vmem_limit_mb=0,
                          sat_dirs=False):
    """Pallas-kernel hull-hull lane (ops/narrowphase_pallas): same
    outputs as the hh segment of _narrowphase_all. ``sublane=True``
    selects the pairs-in-sublanes variant (pair axis padded to the
    pair-tile; the pad lanes carry the invalid-row sentinel)."""
    from ..ops import narrowphase_pallas as npk

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w, n = body.pos.shape[:2]
    nb_t = jnp.moveaxis(
        jnp.concatenate([body.pos, body.rot, body.scale], axis=-1), 0, -1
    )  # [N, 10, W]
    obj_t = jnp.moveaxis(body.obj_id.astype(jnp.float32), 0, -1)  # [N, W]
    pairs_t = jnp.moveaxis(cands.hh, 0, -1)                       # [P, 2, W]
    p_real = pairs_t.shape[0]
    if sublane:
        pt = pair_tile
        p_pad = -(-p_real // pt) * pt
        if p_pad != p_real:
            pad = jnp.full((p_pad - p_real, 2, w), n, pairs_t.dtype)
            pairs_t = jnp.concatenate([pairs_t, pad], axis=0)
        fn = npk.make_hh_narrowphase_sublane(
            om.hull_dims, n, om.hull_pack.shape[0], pair_tile=pt,
            tile_w=min(tile_w or 128, w), interpret=interpret,
            vmem_limit_mb=vmem_limit_mb,
            n_dirs=om.n_edge_dirs if sat_dirs else 0,
        )
        rec = fn(nb_t, obj_t, pairs_t, om.hull_pack_planar)[:p_real]
    else:
        fn = npk.make_hh_narrowphase(
            om.hull_dims, n, om.hull_pack.shape[0],
            tile_w=min(tile_w or 256, w), interpret=interpret,
        )
        rec = fn(nb_t, obj_t, pairs_t, om.hull_pack)  # [P, 22, W]
    rec = jnp.moveaxis(rec, -1, 0)                   # [W, P, 22]
    ref = rec[..., 0].astype(jnp.int32)
    alt = rec[..., 1].astype(jnp.int32)
    num = rec[..., 2].astype(jnp.int32)
    normal = rec[..., 3:6]                           # [W, P, 3]
    points = jnp.stack(
        [rec[..., 6:10], rec[..., 10:14], rec[..., 14:18],
         rec[..., 18:22]], axis=-1,
    )                                                # [W, P, 4, 4]
    return ref, alt, points, num, normal
