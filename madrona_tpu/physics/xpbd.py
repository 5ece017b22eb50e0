"""XPBD rigid-body solver: substepped position-based dynamics.

TPU-native re-design of ``src/physics/xpbd.cpp`` (1,146 LoC). The math is
a faithful mirror (same update equations, same operation order within a
contact); the execution shape is the TPU translation:

  * The reference runs ``solvePositions`` as one serial Gauss-Seidel
    thread per world (ParallelFor over the SolverState singleton — one
    invocation per world even on GPU, xpbd.cpp:720-736). Here the same
    serial-per-world loop is a ``lax.fori_loop`` over contact slots with
    every world advancing in lockstep — iteration i updates contact i of
    all worlds at once. Identical ordering semantics, massively parallel
    across worlds.
  * Body state is gathered/scattered by row index per contact; masked
    slots route out of bounds (drop-mode scatter), the engine-wide rule.

Equation parity map (reference -> here):
  substepRigidBodies (xpbd.cpp:98-185)      -> integrate
  handleContactConstraint (:322-421)        -> _solve_contact
  applyPositionalUpdate (:225-307)          -> _apply_positional_update
  solvePositions (:720-736)                 -> solve_positions
  setVelocities (:738-779)                  -> set_velocities
  applyRestitutionVelocityUpdate (:860-920) -> inside _solve_velocity
  applyFrictionVelocityUpdate (:789-858)    -> inside _solve_velocity
  handleJointConstraint (:552-718)          -> solve_joints
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..utils import math3d as m3
from .bodies import RESPONSE_DYNAMIC, RESPONSE_STATIC


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    dt: float = 1.0 / 30.0
    substeps: int = 4
    gravity: tuple = (0.0, 0.0, -9.8)
    restitution: float = 0.3        # reference hardcodes e=0.3 (xpbd.cpp:884)
    restitution_threshold: float = 0.2
    # "jacobi": all contacts solved in parallel against a body snapshot,
    #   corrections scatter-added and averaged per body — the TPU-fast
    #   execution shape (one wide VPU op instead of a serial loop).
    #   Documented solver-order deviation from the reference.
    # "gauss_seidel": slot-order serial solve, matching the reference's
    #   per-world iteration semantics exactly (the oracle mode).
    solver: str = "jacobi"
    jacobi_iters: int = 2           # position iterations per substep
    # "pallas": hull-hull narrowphase runs as a VMEM-resident Pallas
    # kernel (ops/narrowphase_pallas) — the megakernel tier; "xla" keeps
    # the fused-ops path (CPU/debug, and the oracle for the kernel).
    # "pallas_mega": narrowphase (hh SAT + hull-plane lane) AND the
    # contact avg/max-pen assembly in ONE kernel emitting the solver's
    # planar buffers (ops/physics_megakernel.make_contacts_kernel) —
    # requires megakernel=True, narrowphase_once=True, sphere_any=0.
    narrowphase: str = "xla"
    # True: contacts generated once per step at the first substep's
    # predicted poses ("Small Steps in Physics Simulation" style) and
    # reused across substeps; False matches the reference exactly
    # (narrowphase per substep, xpbd.cpp:1098-1130).
    narrowphase_once: bool = False
    # True: run the whole substep loop as one VMEM-resident Pallas
    # megakernel (ops/solver_pallas) — requires solver="jacobi",
    # narrowphase_once=True, and no joint buffer. Same math as the XLA
    # path; on CPU backends the kernel runs in interpret mode.
    megakernel: bool = False
    # world-lane tile of the megakernel grid (tuning knob)
    megakernel_tile: int = 128
    # True: the kernel's substep loop is a lax.fori_loop instead of a
    # full unroll — same math/order, much smaller instruction stream and
    # scratch liveness, which can unlock larger megakernel_tile (tuning
    # knob; see ops/solver_pallas.py). Measured (v5e, escape room):
    # loop@128 = 347k vs unrolled@128 = 420k steps/s — the unroll wins
    # at 128; the loop exists to chase bigger tiles.
    megakernel_loop: bool = False
    # >0: raise the kernel's scoped-VMEM cap (MB). tile 256 needs ~22MB
    # which exceeds the physical ~16MB/core; knob kept for sweeps.
    megakernel_vmem_mb: int = 0
    # (d0, d1) or None: only body rows in [d0, d1) can ever move; every
    # row outside MUST be RESPONSE_STATIC in all worlds at all times
    # (the env's layout contract — e.g. escape room's walls/floor rows).
    # The megakernel then solves on the dynamic subset with one-time
    # static contributions: exact (one-hot gathers sum zeros except the
    # matching row) and ~(N/D)x cheaper on the dominant mask
    # contractions. Measured on one v5e (escape room, N=21 -> D=8):
    # solver kernel 1.90 -> 0.75 ms/step at 2048 worlds.
    solver_dynamic_range: tuple = None
    # >0 (requires solver_dynamic_range): contact lanes >= this index
    # carry a GUARANTEED-static ref row (env layout contract — e.g. the
    # hull-plane candidate segment, whose ref is always the static
    # floor plane), so the solver kernel's per-substep ref-side
    # gather/scatter contractions cover only the leading lanes. Exact:
    # a static row's dyn-range mask is structurally all-zero.
    solver_ref_dyn_lanes: int = 0
    # "edge_pairs": the reference's Gauss-map edge-pair sweep
    #   (E_a*E_b combos, isMinkowskiFace per pair — narrowphase.cpp
    #   doSAT). "edge_dirs": SAT over unique edge DIRECTION pairs
    #   (D_a*D_b axes, support-based separation + supporting-edge
    #   witnesses) — boxes collapse 144 combos to 9; measured ~0.8 ->
    #   ~0.15 ms of the contacts kernel at 4096 worlds. Equal results
    #   for separated/shallow pairs; deep edge-edge penetration may
    #   pick a different (equally valid) axis — documented deviation.
    # default flipped to "edge_dirs" round 5: measured on one v5e,
    # escape_room 1.220M -> 1.535M and hide_seek 1.237M -> 1.504M
    # env-steps/s (bench_matrix.json edge_dirs rows); behavior/parity
    # suites green under both tiers.
    sat_tier: str = "edge_dirs"
    # pair tile of the sublane narrowphase kernel (pairs pad up to it).
    # 8 is the VMEM-feasible point for box-class hulls at tile_w=128
    # under the default scoped-VMEM budget (16 exceeds it by ~8M; 4
    # fails to place). Raise narrowphase_vmem_mb to chase 16.
    narrowphase_pair_tile: int = 8
    # >0: raise the sublane narrowphase kernel's scoped-VMEM cap (MB),
    # e.g. to fit pair_tile=16 (physical ceiling ~16MB/core applies)
    narrowphase_vmem_mb: int = 0
    # world-lane tile of the sublane narrowphase kernel (0 = min(128,
    # W)). Many-body envs shrink it: at pile scale (N=261, P=512) the
    # default 64-lane tile overflows scoped VMEM by ~128K; 32 fits.
    narrowphase_tile_w: int = 0
    # True: run narrowphase + the whole substep loop in ONE Pallas call
    # (ops/physics_megakernel) — contacts never leave VMEM. Requires
    # solver="jacobi" and narrowphase_once=True; supersedes
    # megakernel/narrowphase when set.
    megakernel_fused: bool = False
    # hull-hull SAT pair-chunk inside the fused kernel (0 = all pairs in
    # one sweep; smaller chunks shrink the live SAT working set)
    fused_pair_chunk: int = 0
    # "all_pairs": O(n²) masked upper-triangle (exact, best for the
    #   example envs' tens of bodies — SURVEY §7 "masked pairs first").
    # "pallas": the same all-pairs tier computed in one VMEM-resident
    #   Pallas kernel (ops/broadphase_pallas) — bit-identical
    #   Candidates, no [W, P]-class HBM intermediates; only for
    #   all-pairs-scale body counts (the [N, N] grid must fit VMEM).
    # "swept": sort-by-x sweep-and-prune, O(N log N + N·window), the
    #   many-body tier (reference: the per-world AABB tree,
    #   broadphase.cpp:487-1027). Exact while no world saturates the
    #   window (Candidates.overflow reports saturation).
    broadphase: str = "all_pairs"
    broadphase_window: int = 32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BodyState:
    """All rigid bodies of all worlds: [W, N, ...] arrays."""

    pos: jax.Array          # [W, N, 3]
    rot: jax.Array          # [W, N, 4] (w,x,y,z)
    scale: jax.Array        # [W, N, 3]
    vel: jax.Array          # [W, N, 3]
    omega: jax.Array        # [W, N, 3]
    obj_id: jax.Array       # [W, N] i32
    response: jax.Array     # [W, N] i32
    ext_force: jax.Array    # [W, N, 3]
    ext_torque: jax.Array   # [W, N, 3]
    # solver scratch (SubstepPrevState / PreSolvePositional / PreSolveVelocity)
    prev_x: jax.Array
    prev_q: jax.Array
    presolve_x: jax.Array
    presolve_q: jax.Array
    presolve_v: jax.Array
    presolve_w: jax.Array
    active: jax.Array       # [W, N] bool — row liveness


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Contacts:
    """Fixed-capacity per-world contact buffer: [W, C, ...]."""

    ref: jax.Array        # [W, C] i32 body row (N = invalid sentinel)
    alt: jax.Array        # [W, C] i32
    points: jax.Array     # [W, C, 4, 4] (xyz = point on ref surface, w = depth)
    num: jax.Array        # [W, C] i32 (0 = inactive)
    normal: jax.Array     # [W, C, 3] ref -> other
    lambda_n: jax.Array   # [W, C] accumulated normal impulse (position solve)


def integrate(body: BodyState, om, h: float, gravity, params=None) -> BodyState:
    """substepRigidBodies: save prev state, apply gravity/external force,
    integrate velocity -> position, gyroscopic omega update, quaternion
    integration (xpbd.cpp:98-185)."""
    g = jnp.asarray(gravity, jnp.float32)
    params = params if params is not None else om.obj_params(body.obj_id)
    inv_m = params["inv_m"]                       # [W, N]
    inv_i = params["inv_i"]                       # [W, N, 3]
    dynamic = body.response == RESPONSE_DYNAMIC
    static = body.response == RESPONSE_STATIC
    moving = (~static) & body.active

    prev_x = body.pos
    prev_q = body.rot

    v = body.vel + jnp.where(
        dynamic[..., None], h * g[None, None, :], 0.0
    )
    v = v + h * inv_m[..., None] * body.ext_force
    x = body.pos + h * v

    inertia = jnp.where(inv_i == 0.0, 0.0, 1.0 / jnp.where(inv_i == 0, 1, inv_i))
    q_inv = m3.quat_inv(body.rot)
    tau_local = m3.quat_rotate(q_inv, body.ext_torque)
    w_local = m3.quat_rotate(q_inv, body.omega)
    i_w_local = inertia * w_local
    w_local = w_local + h * inv_i * (
        tau_local - jnp.cross(w_local, i_w_local)
    )
    omega = m3.quat_rotate(body.rot, w_local)

    # q += fromAngularVec(0.5*h*omega) * q; normalize
    half = 0.5 * h * omega
    apply_q = jnp.concatenate(
        [jnp.zeros_like(half[..., :1]), half], axis=-1
    )
    q = m3.quat_normalize(body.rot + m3.quat_mul(apply_q, body.rot))

    x = jnp.where(moving[..., None], x, body.pos)
    q = jnp.where(moving[..., None], q, body.rot)
    v_out = jnp.where(moving[..., None], v, 0.0)
    w_out = jnp.where(moving[..., None], omega, 0.0)

    return dataclasses.replace(
        body,
        pos=x,
        rot=q,
        vel=jnp.where(static[..., None], body.vel, v_out),
        omega=jnp.where(static[..., None], body.omega, w_out),
        prev_x=prev_x,
        prev_q=prev_q,
        presolve_x=x,
        presolve_q=q,
        presolve_v=v_out,
        presolve_w=w_out,
    )


def _get_avg_contact(points, num):
    """Penetration-weighted average point + max depth (getAvgContact,
    xpbd.cpp:420-448). Returns (avg [3], max_depth, zero_sep bool)."""
    idx = jnp.arange(4)
    live = idx < num
    w = jnp.where(live, points[:, 3], 0.0)
    total = jnp.sum(w)
    zero = total == 0.0
    avg = jnp.sum(
        (w / jnp.where(zero, 1.0, total))[:, None] * points[:, :3], axis=0
    )
    max_pen = jnp.max(jnp.where(live, points[:, 3], -3e38))
    return avg, max_pen, zero


def _generalized_inv_mass(torque_axis, rot_axis, inv_m):
    return inv_m + jnp.sum(torque_axis * rot_axis, axis=-1)


def _apply_positional_update(
    x1, x2, q1, q2, r1, r2, inv_m1, inv_m2, inv_i1, inv_i2, n_world, c,
    alpha_tilde,
):
    """applyPositionalUpdate (xpbd.cpp:254-307): returns updated
    (x1, x2, q1, q2, lambda)."""
    n_l1 = m3.quat_rotate(m3.quat_inv(q1), n_world)
    n_l2 = m3.quat_rotate(m3.quat_inv(q2), n_world)
    t_axis1 = jnp.cross(r1, n_l1)
    t_axis2 = jnp.cross(r2, n_l2)
    rot_axis1 = inv_i1 * t_axis1
    rot_axis2 = inv_i2 * t_axis2
    w1 = _generalized_inv_mass(t_axis1, rot_axis1, inv_m1)
    w2 = _generalized_inv_mass(t_axis2, rot_axis2, inv_m2)
    # guard: two immovable bodies (kinematic/static, inv masses all 0)
    # can reach here — broadphase filters only static|static pairs; a
    # 0/0 would scatter NaN into both poses
    denom = w1 + w2 + alpha_tilde
    lam = jnp.where(denom > 0, -c / jnp.where(denom > 0, denom, 1.0), 0.0)

    x1 = x1 + (lam * inv_m1)[..., None] * n_world
    x2 = x2 - (lam * inv_m2)[..., None] * n_world
    half = 0.5 * lam
    dq1 = m3.quat_rotate(q1, half[..., None] * rot_axis1)
    dq2 = m3.quat_rotate(q2, half[..., None] * rot_axis2)
    q1 = m3.quat_normalize(q1 + m3.quat_mul(_pure(dq1), q1))
    q2 = m3.quat_normalize(q2 - m3.quat_mul(_pure(dq2), q2))
    return x1, x2, q1, q2, lam


def _pure(v):
    return jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)


def _solve_contact(
    x1, x2, q1, q2, prev_x1, prev_q1, prev_x2, prev_q2,
    inv_m1, inv_m2, inv_i1, inv_i2, r1, r2, n_world, avg_mu_s,
):
    """handleContactConstraint (xpbd.cpp:322-421): normal positional
    correction + static-friction positional correction. Returns
    (x1, x2, q1, q2, lambda_n)."""
    p1 = m3.quat_rotate(q1, r1) + x1
    p2 = m3.quat_rotate(q2, r2) + x2
    d = jnp.sum((p1 - p2) * n_world, axis=-1)
    penetrating = d > 0.0

    nx1, nx2, nq1, nq2, lam_n = _apply_positional_update(
        x1, x2, q1, q2, r1, r2, inv_m1, inv_m2, inv_i1, inv_i2,
        n_world, d, 0.0,
    )
    x1 = jnp.where(penetrating[..., None], nx1, x1)
    x2 = jnp.where(penetrating[..., None], nx2, x2)
    q1 = jnp.where(penetrating[..., None], nq1, q1)
    q2 = jnp.where(penetrating[..., None], nq2, q2)
    lam_n = jnp.where(penetrating, lam_n, 0.0)

    # static friction (only if the normal correction fired)
    p1_hat = m3.quat_rotate(prev_q1, r1) + prev_x1
    p2_hat = m3.quat_rotate(prev_q2, r2) + prev_x2
    p1 = m3.quat_rotate(q1, r1) + x1
    p2 = m3.quat_rotate(q2, r2) + x2
    delta_p = (p1 - p1_hat) - (p2 - p2_hat)
    delta_p_t = delta_p - jnp.sum(delta_p * n_world, axis=-1, keepdims=True) * n_world
    t_mag = jnp.sqrt(jnp.maximum(jnp.sum(delta_p_t**2, axis=-1), 1e-30))
    t_world = delta_p_t / t_mag[..., None]

    t_l1 = m3.quat_rotate(m3.quat_inv(q1), t_world)
    t_l2 = m3.quat_rotate(m3.quat_inv(q2), t_world)
    ft_axis1 = jnp.cross(r1, t_l1)
    ft_axis2 = jnp.cross(r2, t_l2)
    fr_axis1 = inv_i1 * ft_axis1
    fr_axis2 = inv_i2 * ft_axis2
    w1 = _generalized_inv_mass(ft_axis1, fr_axis1, inv_m1)
    w2 = _generalized_inv_mass(ft_axis2, fr_axis2, inv_m2)
    den_t = w1 + w2
    lam_t = jnp.where(
        den_t > 0, -t_mag / jnp.where(den_t > 0, den_t, 1.0), 0.0
    )
    # reference: apply when lambda_t > lambda_n * mu_s (both negative)
    apply_friction = (
        penetrating & (t_mag > 0.0) & (lam_t > lam_n * avg_mu_s)
    )
    fx1 = x1 + lam_t[..., None] * inv_m1[..., None] * t_world
    fx2 = x2 - lam_t[..., None] * inv_m2[..., None] * t_world
    half = 0.5 * lam_t
    dq1 = m3.quat_rotate(q1, half[..., None] * fr_axis1)
    dq2 = m3.quat_rotate(q2, half[..., None] * fr_axis2)
    fq1 = m3.quat_normalize(q1 + m3.quat_mul(_pure(dq1), q1))
    fq2 = m3.quat_normalize(q2 - m3.quat_mul(_pure(dq2), q2))
    x1 = jnp.where(apply_friction[..., None], fx1, x1)
    x2 = jnp.where(apply_friction[..., None], fx2, x2)
    q1 = jnp.where(apply_friction[..., None], fq1, q1)
    q2 = jnp.where(apply_friction[..., None], fq2, q2)
    return x1, x2, q1, q2, lam_n


def _gather_body(body: BodyState, om, row):
    """Gather per-world body slices for one contact slot. row: [W]."""
    w = row.shape[0]
    widx = jnp.arange(w)
    n = body.pos.shape[1]
    r = jnp.clip(row, 0, n - 1)
    take = lambda a: a[widx, r]
    inv_m = om.inv_mass[take(body.obj_id)]
    inv_i = om.inv_inertia[take(body.obj_id)]
    static = take(body.response) == RESPONSE_STATIC
    inv_m = jnp.where(static, 0.0, inv_m)
    inv_i = jnp.where(static[..., None], 0.0, inv_i)
    return dict(
        x=take(body.pos), q=take(body.rot),
        prev_x=take(body.prev_x), prev_q=take(body.prev_q),
        presolve_x=take(body.presolve_x), presolve_q=take(body.presolve_q),
        presolve_v=take(body.presolve_v), presolve_w=take(body.presolve_w),
        v=take(body.vel), w=take(body.omega),
        inv_m=inv_m, inv_i=inv_i,
        mu_s=om.mu_s[take(body.obj_id)], mu_d=om.mu_d[take(body.obj_id)],
    )


def _scatter_pose(body: BodyState, row, x, q, ok):
    w, n = body.pos.shape[:2]
    widx = jnp.arange(w)
    safe = jnp.where(ok, row, n)
    pos = body.pos.at[widx, safe].set(x, mode="drop")
    rot = body.rot.at[widx, safe].set(q, mode="drop")
    return dataclasses.replace(body, pos=pos, rot=rot)


def _scatter_vel(body: BodyState, row, v, omg, ok):
    w, n = body.pos.shape[:2]
    widx = jnp.arange(w)
    safe = jnp.where(ok, row, n)
    vel = body.vel.at[widx, safe].set(v, mode="drop")
    om_ = body.omega.at[widx, safe].set(omg, mode="drop")
    return dataclasses.replace(body, vel=vel, omega=om_)


def _local_contacts(b1, b2, avg_pt, depth, normal):
    """getLocalSpaceContacts (xpbd.cpp:424-441): contact attachment points
    in each body's presolve local frame."""
    contact2 = avg_pt - normal * depth[..., None]
    r1 = m3.quat_rotate(
        m3.quat_inv(b1["presolve_q"]), avg_pt - b1["presolve_x"]
    )
    r2 = m3.quat_rotate(
        m3.quat_inv(b2["presolve_q"]), contact2 - b2["presolve_x"]
    )
    return r1, r2


def solve_positions(body: BodyState, contacts: Contacts, om) -> tuple:
    """Gauss-Seidel position solve over the contact buffer
    (solvePositions, xpbd.cpp:720-736). Per-world solve order = slot
    order, matching the reference's table-iteration order."""
    ccap = contacts.ref.shape[1]

    def step(i, carry):
        body, lam_buf = carry
        ref = contacts.ref[:, i]
        alt = contacts.alt[:, i]
        active = contacts.num[:, i] > 0
        pts = contacts.points[:, i]           # [W, 4, 4]
        nrm = contacts.normal[:, i]

        avg, max_pen, zero = jax.vmap(_get_avg_contact)(
            pts, contacts.num[:, i]
        )
        ok = active & (~zero)

        b1 = _gather_body(body, om, ref)
        b2 = _gather_body(body, om, alt)
        r1, r2 = _local_contacts(b1, b2, avg, max_pen, nrm)
        avg_mu_s = 0.5 * (b1["mu_s"] + b2["mu_s"])
        x1, x2, q1, q2, lam_n = _solve_contact(
            b1["x"], b2["x"], b1["q"], b2["q"],
            b1["prev_x"], b1["prev_q"], b2["prev_x"], b2["prev_q"],
            b1["inv_m"], b2["inv_m"], b1["inv_i"], b2["inv_i"],
            r1, r2, nrm, avg_mu_s,
        )
        body = _scatter_pose(body, ref, x1, q1, ok)
        body = _scatter_pose(body, alt, x2, q2, ok)
        lam_buf = lam_buf.at[:, i].set(jnp.where(ok, lam_n, 0.0))
        return body, lam_buf

    lam0 = jnp.zeros_like(contacts.lambda_n)
    body, lam = jax.lax.fori_loop(0, ccap, step, (body, lam0))
    return body, dataclasses.replace(contacts, lambda_n=lam)


def set_velocities(body: BodyState, h: float) -> BodyState:
    """setVelocities (xpbd.cpp:738-779): velocity from substep delta."""
    v = (body.pos - body.prev_x) / h
    delta_q = m3.quat_mul(body.rot, m3.quat_inv(body.prev_q))
    same = jnp.all(body.rot == body.prev_q, axis=-1)
    new_omega = (2.0 / h) * delta_q[..., 1:4]
    new_omega = jnp.where(
        delta_q[..., 0:1] > 0.0, new_omega, -new_omega
    )
    new_omega = jnp.where(same[..., None], 0.0, new_omega)
    static = body.response == RESPONSE_STATIC
    keep = static[..., None] | (~body.active)[..., None]
    return dataclasses.replace(
        body,
        vel=jnp.where(keep, body.vel, v),
        omega=jnp.where(keep, body.omega, new_omega),
    )


def solve_velocities(
    body: BodyState, contacts: Contacts, om, h: float,
    restitution: float, restitution_threshold: float,
) -> BodyState:
    """solveVelocities (xpbd.cpp:1041-1053): restitution on the averaged
    contact, then dynamic friction per manifold point with lambda_n
    distributed by penetration fraction."""
    ccap = contacts.ref.shape[1]

    def step(i, body):
        ref = contacts.ref[:, i]
        alt = contacts.alt[:, i]
        num = contacts.num[:, i]
        active = num > 0
        pts = contacts.points[:, i]
        nrm = contacts.normal[:, i]
        lam_n = contacts.lambda_n[:, i]

        b1 = _gather_body(body, om, ref)
        b2 = _gather_body(body, om, alt)
        mu_d = 0.5 * (b1["mu_d"] + b2["mu_d"])

        avg, max_pen, zero = jax.vmap(_get_avg_contact)(pts, num)
        ok = active & (~zero)

        r1, r2 = _local_contacts(b1, b2, avg, max_pen, nrm)
        r1_pre = m3.quat_rotate(b1["presolve_q"], r1)
        r2_pre = m3.quat_rotate(b2["presolve_q"], r2)
        v_bar = (
            b1["presolve_v"] + jnp.cross(b1["presolve_w"], r1_pre)
        ) - (b2["presolve_v"] + jnp.cross(b2["presolve_w"], r2_pre))
        vn_bar = jnp.sum(nrm * v_bar, axis=-1)

        v1, w1 = b1["v"], b1["w"]
        v2, w2 = b2["v"], b2["w"]
        q1, q2 = b1["q"], b2["q"]

        # ---- restitution (applyRestitutionVelocityUpdate)
        r1_world = m3.quat_rotate(q1, r1)
        r2_world = m3.quat_rotate(q2, r2)
        rt_axis1 = jnp.cross(r1, m3.quat_rotate(m3.quat_inv(q1), nrm))
        rt_axis2 = jnp.cross(r2, m3.quat_rotate(m3.quat_inv(q2), nrm))
        v_now = (v1 + jnp.cross(w1, r1_world)) - (
            v2 + jnp.cross(w2, r2_world)
        )
        vn = jnp.sum(nrm * v_now, axis=-1)
        e = jnp.where(
            jnp.abs(vn_bar) <= restitution_threshold, 0.0, restitution
        )
        rest_mag = jnp.minimum(-e * vn_bar, 0.0) - vn
        rr_axis1 = b1["inv_i"] * rt_axis1
        rr_axis2 = b2["inv_i"] * rt_axis2
        gw1 = _generalized_inv_mass(rt_axis1, rr_axis1, b1["inv_m"])
        gw2 = _generalized_inv_mass(rt_axis2, rr_axis2, b2["inv_m"])
        den_r = gw1 + gw2
        imp = jnp.where(
            den_r > 0, rest_mag / jnp.where(den_r > 0, den_r, 1.0), 0.0
        )
        imp = jnp.where(ok, imp, 0.0)
        v1 = v1 + nrm * (imp * b1["inv_m"])[..., None]
        v2 = v2 - nrm * (imp * b2["inv_m"])[..., None]
        w1 = w1 + m3.quat_rotate(q1, imp[..., None] * rr_axis1)
        w2 = w2 - m3.quat_rotate(q2, imp[..., None] * rr_axis2)

        # ---- dynamic friction per manifold point
        pen_sum = jnp.sum(
            jnp.where(jnp.arange(4)[None, :] < num[:, None], pts[..., 3], 0.0),
            axis=-1,
        )
        for pi in range(4):
            live = ok & (pi < num) & (pen_sum > 0.0)
            cp = pts[:, pi, :3]
            depth = pts[:, pi, 3]
            rr1, rr2 = _local_contacts(b1, b2, cp, depth, nrm)
            rw1 = m3.quat_rotate(q1, rr1)
            rw2 = m3.quat_rotate(q2, rr2)
            lam_pt = lam_n * (depth / jnp.where(pen_sum > 0, pen_sum, 1.0))

            v_rel = (v1 + jnp.cross(w1, rw1)) - (v2 + jnp.cross(w2, rw2))
            vn_f = jnp.sum(nrm * v_rel, axis=-1)
            vt = v_rel - nrm * vn_f[..., None]
            vt_len = jnp.sqrt(jnp.maximum(jnp.sum(vt * vt, axis=-1), 1e-30))
            has_t = vt_len > 1e-15
            t_dir = vt / vt_len[..., None]
            t_l1 = m3.quat_rotate(m3.quat_inv(q1), t_dir)
            t_l2 = m3.quat_rotate(m3.quat_inv(q2), t_dir)
            fta1 = jnp.cross(rr1, t_l1)
            fta2 = jnp.cross(rr2, t_l2)
            fra1 = b1["inv_i"] * fta1
            fra2 = b2["inv_i"] * fta2
            fw1 = _generalized_inv_mass(fta1, fra1, b1["inv_m"])
            fw2 = _generalized_inv_mass(fta2, fra2, b2["inv_m"])
            den_f = fw1 + fw2
            inv_scale = jnp.where(
                den_f > 0, 1.0 / jnp.where(den_f > 0, den_f, 1.0), 0.0
            )
            # NOTE: inv_scale deliberately appears TWICE (in dyn_mag and
            # in f_imp) — the reference deviates from the XPBD paper
            # here on purpose (xpbd.cpp:834-836 "Note the paper is
            # incorrect here (doesn't have w1 + w2 divisor)")
            dyn_mag = mu_d * jnp.abs(lam_pt) * inv_scale / h
            corrected = -jnp.minimum(dyn_mag, vt_len)
            f_imp = corrected * inv_scale
            f_imp = jnp.where(live & has_t, f_imp, 0.0)
            v1 = v1 + t_dir * (f_imp * b1["inv_m"])[..., None]
            v2 = v2 - t_dir * (f_imp * b2["inv_m"])[..., None]
            w1 = w1 + m3.quat_rotate(q1, f_imp[..., None] * fra1)
            w2 = w2 - m3.quat_rotate(q2, f_imp[..., None] * fra2)

        body = _scatter_vel(body, ref, v1, w1, ok)
        body = _scatter_vel(body, alt, v2, w2, ok)
        return body

    return jax.lax.fori_loop(0, ccap, step, body)


# ---------------------------------------------------------------------------
# Jacobi solver path — the TPU execution shape.
#
# The reference solves contacts serially per world (Gauss-Seidel over the
# contact table, xpbd.cpp:720-736). That shape is latency-bound on TPU: C
# sequential iterations of [W]-wide gathers/scatters. Here every contact is
# solved in parallel against a snapshot of body state ([W, C]-wide ops on
# the VPU); per-body corrections are scatter-added and divided by the
# body's constraint count (averaged Jacobi — the standard GPU-physics
# relaxation, e.g. FleX). SURVEY.md §7 calls this deviation out explicitly;
# PhysicsConfig.solver="gauss_seidel" keeps the exact reference ordering
# for oracle comparisons.
# ---------------------------------------------------------------------------


# Packed body block: every float field a contact gather needs, in one
# [W, N, PACK_F] array. One take_along_axis per side materializes ONE
# lane-efficient buffer instead of ~14 [W, C, 3]-shaped ones (each of
# which pads 3 -> 128 lanes under TPU tiling — a 42x bandwidth tax that
# dominated the solver before this packing).
_PACK_SLOTS = (
    ("x", 3), ("q", 4), ("prev_x", 3), ("prev_q", 4),
    ("presolve_x", 3), ("presolve_q", 4), ("presolve_v", 3),
    ("presolve_w", 3), ("v", 3), ("w", 3),
    ("inv_m", 1), ("inv_i", 3), ("mu_s", 1), ("mu_d", 1),
)
PACK_F = sum(d for _, d in _PACK_SLOTS)  # 39


def pack_bodies(body: BodyState, om, params=None):
    """[W, N, PACK_F] solver view of the body state. ``params`` lets the
    caller hoist the one-hot object-param lookup out of the substep loop
    (object ids never change mid-step)."""
    params = params if params is not None else om.obj_params(body.obj_id)
    static = body.response == RESPONSE_STATIC
    inv_m = jnp.where(static, 0.0, params["inv_m"])
    inv_i = jnp.where(static[..., None], 0.0, params["inv_i"])
    parts = dict(
        x=body.pos, q=body.rot, prev_x=body.prev_x, prev_q=body.prev_q,
        presolve_x=body.presolve_x, presolve_q=body.presolve_q,
        presolve_v=body.presolve_v, presolve_w=body.presolve_w,
        v=body.vel, w=body.omega,
        inv_m=inv_m[..., None], inv_i=inv_i,
        mu_s=params["mu_s"][..., None],
        mu_d=params["mu_d"][..., None],
    )
    return jnp.concatenate([parts[k] for k, _ in _PACK_SLOTS], axis=-1)


def _unpack(block):
    """Packed block [..., PACK_F] -> field dict (slices fuse for free)."""
    out = {}
    off = 0
    for name, d in _PACK_SLOTS:
        v = block[..., off:off + d]
        out[name] = v[..., 0] if d == 1 else v
        off += d
    return out


def _gather_packed(packed, rows):
    """One gather of the packed block at rows [W, C] -> field dict.

    Implemented as a one-hot batched matmul: XLA's TPU gather lowering
    re-reads the operand per output row (we measured 207 GB of operand
    traffic for a 25 MB table); with N ~ tens, einsum against a one-hot
    runs on the MXU at trivial cost."""
    n = packed.shape[1]
    oh = jax.nn.one_hot(jnp.clip(rows, 0, n - 1), n, dtype=packed.dtype)
    blk = jnp.einsum(
        "wcn,wnf->wcf", oh, packed, preferred_element_type=jnp.float32
    )
    return _unpack(blk)


def _scatter_avg_packed(rows, deltas, ok, n):
    """ONE packed scatter-add: deltas [W, C, D] at rows [W, C] -> per-body
    (mean delta [W, N, D]). One-hot matmul for the same reason as
    _gather_packed (a masked-out row one-hots to all-zero, so invalid
    slots contribute nothing)."""
    masked_rows = jnp.where(ok, rows, -1)
    oh = jax.nn.one_hot(masked_rows, n, dtype=deltas.dtype)  # [W, C, N]
    # count channel rides along as an extra packed column; deltas are
    # zeroed explicitly (NaN * one-hot-zero would still be NaN)
    payload = jnp.concatenate(
        [jnp.where(ok[..., None], deltas, 0.0),
         jnp.ones_like(deltas[..., :1])], axis=-1
    )
    acc = jnp.einsum(
        "wcn,wcd->wnd", oh, payload, preferred_element_type=jnp.float32
    )
    dd = deltas.shape[-1]
    cnt = jnp.maximum(acc[..., dd:], 1.0)
    return acc[..., :dd] / cnt


def _avg_contacts_batch(points, num):
    """Vectorized _get_avg_contact over [W, C, 4, 4]."""
    idx = jnp.arange(4)
    live = idx[None, None, :] < num[..., None]
    wgt = jnp.where(live, points[..., 3], 0.0)
    total = jnp.sum(wgt, axis=-1)
    zero = total == 0.0
    avg = jnp.sum(
        (wgt / jnp.where(zero, 1.0, total)[..., None])[..., None]
        * points[..., :3], axis=-2
    )
    max_pen = jnp.max(jnp.where(live, points[..., 3], -3e38), axis=-1)
    return avg, max_pen, zero


def solve_positions_jacobi(
    body: BodyState, contacts: Contacts, om, iters: int = 2, params=None
):
    """Vectorized position solve: all contacts at once, averaged scatter.

    Same per-contact math as solve_positions (normal + static friction,
    handleContactConstraint xpbd.cpp:322-421); only the application order
    differs (Jacobi averaging instead of serial Gauss-Seidel)."""
    ref, alt = contacts.ref, contacts.alt
    active = contacts.num > 0
    avg, max_pen, zero = _avg_contacts_batch(contacts.points, contacts.num)
    ok = active & (~zero)
    nrm = contacts.normal
    lam_total = jnp.zeros_like(contacts.lambda_n)
    n = body.pos.shape[1]
    static = (body.response == RESPONSE_STATIC)[..., None]

    for _ in range(iters):
        packed = pack_bodies(body, om, params)
        b1 = _gather_packed(packed, ref)
        b2 = _gather_packed(packed, alt)
        r1, r2 = _local_contacts(b1, b2, avg, max_pen, nrm)
        avg_mu_s = 0.5 * (b1["mu_s"] + b2["mu_s"])
        x1, x2, q1, q2, lam_n = _solve_contact(
            b1["x"], b2["x"], b1["q"], b2["q"],
            b1["prev_x"], b1["prev_q"], b2["prev_x"], b2["prev_q"],
            b1["inv_m"], b2["inv_m"], b1["inv_i"], b2["inv_i"],
            r1, r2, nrm, avg_mu_s,
        )
        lam_total = lam_total + jnp.where(ok, lam_n, 0.0)
        # one packed scatter over both sides: deltas (dx | dq) [W, 2C, 7]
        rows2 = jnp.concatenate([ref, alt], axis=1)
        ok2 = jnp.concatenate([ok, ok], axis=1)
        d1 = jnp.concatenate([x1 - b1["x"], q1 - b1["q"]], axis=-1)
        d2 = jnp.concatenate([x2 - b2["x"], q2 - b2["q"]], axis=-1)
        deltas = jnp.concatenate([d1, d2], axis=1)
        mean = _scatter_avg_packed(rows2, deltas, ok2, n)
        # static rows are exactly invariant: they receive zero delta, and
        # the guard also skips the quaternion renormalization so a static
        # body's rotation never drifts by rounding (the solver-pallas
        # kernel's dynamic-row split relies on this invariance; deliberate
        # deviation from the reference, which renormalizes every touched
        # body's quaternion, xpbd.cpp:254-307 — <=1ulp on static rows)
        pos = jnp.where(static, body.pos, body.pos + mean[..., :3])
        rot = jnp.where(
            static, body.rot,
            m3.quat_normalize(body.rot + mean[..., 3:7]),
        )
        body = dataclasses.replace(body, pos=pos, rot=rot)

    return body, dataclasses.replace(contacts, lambda_n=lam_total)


def solve_velocities_jacobi(
    body: BodyState, contacts: Contacts, om, h: float,
    restitution: float, restitution_threshold: float, params=None,
) -> BodyState:
    """Vectorized velocity solve: restitution + dynamic friction for all
    contacts at once (same math as solve_velocities), averaged scatter."""
    ref, alt = contacts.ref, contacts.alt
    num = contacts.num
    active = num > 0
    pts = contacts.points
    nrm = contacts.normal
    lam_n = contacts.lambda_n
    n = body.pos.shape[1]

    packed = pack_bodies(body, om, params)
    b1 = _gather_packed(packed, ref)
    b2 = _gather_packed(packed, alt)
    mu_d = 0.5 * (b1["mu_d"] + b2["mu_d"])

    avg, max_pen, zero = _avg_contacts_batch(pts, num)
    ok = active & (~zero)

    r1, r2 = _local_contacts(b1, b2, avg, max_pen, nrm)
    r1_pre = m3.quat_rotate(b1["presolve_q"], r1)
    r2_pre = m3.quat_rotate(b2["presolve_q"], r2)
    v_bar = (
        b1["presolve_v"] + jnp.cross(b1["presolve_w"], r1_pre)
    ) - (b2["presolve_v"] + jnp.cross(b2["presolve_w"], r2_pre))
    vn_bar = jnp.sum(nrm * v_bar, axis=-1)

    v1, w1 = b1["v"], b1["w"]
    v2, w2 = b2["v"], b2["w"]
    q1, q2 = b1["q"], b2["q"]

    # restitution on the averaged contact
    r1_world = m3.quat_rotate(q1, r1)
    r2_world = m3.quat_rotate(q2, r2)
    rt_axis1 = jnp.cross(r1, m3.quat_rotate(m3.quat_inv(q1), nrm))
    rt_axis2 = jnp.cross(r2, m3.quat_rotate(m3.quat_inv(q2), nrm))
    v_now = (v1 + jnp.cross(w1, r1_world)) - (v2 + jnp.cross(w2, r2_world))
    vn = jnp.sum(nrm * v_now, axis=-1)
    e = jnp.where(
        jnp.abs(vn_bar) <= restitution_threshold, 0.0, restitution
    )
    rest_mag = jnp.minimum(-e * vn_bar, 0.0) - vn
    rr_axis1 = b1["inv_i"] * rt_axis1
    rr_axis2 = b2["inv_i"] * rt_axis2
    gw1 = _generalized_inv_mass(rt_axis1, rr_axis1, b1["inv_m"])
    gw2 = _generalized_inv_mass(rt_axis2, rr_axis2, b2["inv_m"])
    den_r = gw1 + gw2
    imp = jnp.where(
        ok & (den_r > 0),
        rest_mag / jnp.where(den_r > 0, den_r, 1.0), 0.0,
    )
    dv1 = nrm * (imp * b1["inv_m"])[..., None]
    dv2 = -nrm * (imp * b2["inv_m"])[..., None]
    dw1 = m3.quat_rotate(q1, imp[..., None] * rr_axis1)
    dw2 = -m3.quat_rotate(q2, imp[..., None] * rr_axis2)

    # dynamic friction per manifold point (vectorized over the 4 points)
    pen = pts[..., 3]                                     # [W, C, 4]
    live_pt = jnp.arange(4)[None, None, :] < num[..., None]
    pen_sum = jnp.sum(jnp.where(live_pt, pen, 0.0), axis=-1)
    has_pen = pen_sum > 0.0

    cp = pts[..., :3]                                     # [W, C, 4, 3]
    n4 = nrm[..., None, :]
    # broadcast per-contact body data over the 4 manifold points:
    # [W,C,d] vectors -> [W,C,1,d]; [W,C] scalars -> [W,C,1]
    expand = lambda v: v[..., None, :] if v.ndim == 3 else v[..., None]
    keys = ("presolve_x", "presolve_q", "inv_m", "inv_i", "q")
    b1e = {k: expand(b1[k]) for k in keys}
    b2e = {k: expand(b2[k]) for k in keys}
    rr1, rr2 = _local_contacts(b1e, b2e, cp, pen, n4)
    rw1 = m3.quat_rotate(b1e["q"], rr1)
    rw2 = m3.quat_rotate(b2e["q"], rr2)
    lam_pt = lam_n[..., None] * (
        pen / jnp.where(has_pen, pen_sum, 1.0)[..., None]
    )

    v_rel = (
        v1[..., None, :] + jnp.cross(w1[..., None, :] + dw1[..., None, :], rw1)
    ) - (
        v2[..., None, :] + jnp.cross(w2[..., None, :] + dw2[..., None, :], rw2)
    )
    # include the restitution delta on linear velocity too
    v_rel = v_rel + (dv1 - dv2)[..., None, :]
    vn_f = jnp.sum(n4 * v_rel, axis=-1)
    vt = v_rel - n4 * vn_f[..., None]
    vt_len = jnp.sqrt(jnp.maximum(jnp.sum(vt * vt, axis=-1), 1e-30))
    has_t = vt_len > 1e-15
    t_dir = vt / vt_len[..., None]
    t_l1 = m3.quat_rotate(m3.quat_inv(b1e["q"]), t_dir)
    t_l2 = m3.quat_rotate(m3.quat_inv(b2e["q"]), t_dir)
    fta1 = jnp.cross(rr1, t_l1)
    fta2 = jnp.cross(rr2, t_l2)
    fra1 = b1e["inv_i"] * fta1
    fra2 = b2e["inv_i"] * fta2
    fw1 = _generalized_inv_mass(fta1, fra1, b1e["inv_m"])
    fw2 = _generalized_inv_mass(fta2, fra2, b2e["inv_m"])
    den_f = fw1 + fw2
    inv_scale = jnp.where(
        den_f > 0, 1.0 / jnp.where(den_f > 0, den_f, 1.0), 0.0
    )
    # deliberate double inv_scale — see the Gauss-Seidel copy's note
    dyn_mag = mu_d[..., None] * jnp.abs(lam_pt) * inv_scale / h
    corrected = -jnp.minimum(dyn_mag, vt_len)
    f_imp = corrected * inv_scale
    f_imp = jnp.where(
        ok[..., None] & live_pt & has_pen[..., None] & has_t, f_imp, 0.0
    )
    fdv1 = jnp.sum(t_dir * (f_imp * b1e["inv_m"])[..., None], axis=-2)
    fdv2 = -jnp.sum(t_dir * (f_imp * b2e["inv_m"])[..., None], axis=-2)
    fdw1 = jnp.sum(m3.quat_rotate(b1e["q"], f_imp[..., None] * fra1), axis=-2)
    fdw2 = -jnp.sum(m3.quat_rotate(b2e["q"], f_imp[..., None] * fra2), axis=-2)

    rows2 = jnp.concatenate([ref, alt], axis=1)
    ok2 = jnp.concatenate([ok, ok], axis=1)
    d1 = jnp.concatenate([dv1 + fdv1, dw1 + fdw1], axis=-1)
    d2 = jnp.concatenate([dv2 + fdv2, dw2 + fdw2], axis=-1)
    mean = _scatter_avg_packed(
        rows2, jnp.concatenate([d1, d2], axis=1), ok2, n
    )
    return dataclasses.replace(
        body, vel=body.vel + mean[..., :3], omega=body.omega + mean[..., 3:6]
    )
