"""Deterministic, backend-independent kernel inputs for the real-TPU
golden tests (VERDICT round-1 item 6).

All inputs are generated with numpy RandomState on the host so the SAME
bytes feed the kernels regardless of backend; goldens are captured once
per round on the real chip (scripts/capture_kernel_goldens.py,
compiled Mosaic kernels) and committed; CPU CI then checks
interpret-mode kernels against them, pinning Mosaic <-> interpret
equivalence from both sides so a Mosaic regression can't hide behind
interpret-only testing.
"""

import numpy as np
import jax.numpy as jnp

from madrona_tpu.physics import bodies as pb
from madrona_tpu.physics import geo
from madrona_tpu.physics.xpbd import BodyState, Contacts, PhysicsConfig

W, N, C, J = 8, 16, 24, 4
SEED = 1234


def make_om():
    reg = pb.ObjectRegistry()
    reg.add_plane()
    reg.add_hull(geo.box_hull((0.5, 0.5, 0.5)), mass=1.0)
    reg.add_hull(geo.box_hull((0.4, 0.8, 0.3)), mass=2.5)
    return reg.build()


def make_body(rs):
    def q_rand(shape):
        q = rs.randn(*shape, 4).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    pos = rs.uniform(-1.5, 1.5, (W, N, 3)).astype(np.float32)
    pos[..., 2] += 1.0
    obj = rs.randint(1, 3, (W, N)).astype(np.int32)
    obj[:, 0] = 0
    resp = np.full((W, N), pb.RESPONSE_DYNAMIC, np.int32)
    resp[:, 0] = pb.RESPONSE_STATIC
    active = np.ones((W, N), bool)
    active[:, -1] = False
    z3 = jnp.zeros((W, N, 3))
    z4 = jnp.zeros((W, N, 4))
    return BodyState(
        pos=jnp.asarray(pos), rot=jnp.asarray(q_rand((W, N))),
        scale=jnp.ones((W, N, 3)),
        vel=jnp.asarray(rs.randn(W, N, 3).astype(np.float32)),
        omega=jnp.asarray(0.5 * rs.randn(W, N, 3).astype(np.float32)),
        obj_id=jnp.asarray(obj), response=jnp.asarray(resp),
        ext_force=jnp.asarray(0.1 * rs.randn(W, N, 3).astype(np.float32)),
        ext_torque=jnp.asarray(
            0.1 * rs.randn(W, N, 3).astype(np.float32)
        ),
        prev_x=z3, prev_q=z4, presolve_x=z3, presolve_q=z4,
        presolve_v=z3, presolve_w=z3,
        active=jnp.asarray(active),
    )


def make_hh_candidates(rs, cap=32):
    """Fixed candidate pair list (row indices of hull bodies, 1..N-2;
    slot-padded with the sentinel N). Dense enough that many pairs
    actually touch (positions above span ~3 units, boxes ~1 unit)."""
    from madrona_tpu.physics.broadphase import Candidates

    pairs = np.full((W, cap, 2), N, np.int32)
    num = np.zeros((W,), np.int32)
    for w in range(W):
        k = rs.randint(cap // 2, cap)
        a = rs.randint(1, N - 1, size=k)
        b = rs.randint(1, N - 1, size=k)
        b = np.where(b == a, (b % (N - 2)) + 1, b)
        pairs[w, :k, 0] = np.minimum(a, b)
        pairs[w, :k, 1] = np.maximum(a, b)
        num[w] = k
    z = jnp.zeros((W, 1, 2), jnp.int32)
    zn = jnp.zeros((W, 1), jnp.int32)
    return Candidates(
        hh=jnp.asarray(pairs), hh_num=jnp.asarray(num),
        hp=jnp.full((W, 1, 2), N, jnp.int32), hp_num=zn[:, 0],
        sp=jnp.full((W, 1, 2), N, jnp.int32), sp_num=zn[:, 0],
        sp_kind=jnp.full((W, 1), 0, jnp.int32),
        overflow=jnp.zeros((W,), bool),
    )


def make_contacts(rs):
    nrm = rs.randn(W, C, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    pts = rs.uniform(-2, 2, (W, C, 4, 3)).astype(np.float32)
    dep = rs.uniform(-0.02, 0.08, (W, C, 4, 1)).astype(np.float32)
    ref = rs.randint(1, N - 1, (W, C)).astype(np.int32)
    alt = rs.randint(0, N - 1, (W, C)).astype(np.int32)
    alt = np.where(alt == ref, (alt + 1) % (N - 1), alt)
    num = rs.randint(0, 5, (W, C)).astype(np.int32)
    return Contacts(
        ref=jnp.asarray(ref), alt=jnp.asarray(alt),
        points=jnp.asarray(np.concatenate([pts, dep], axis=-1)),
        num=jnp.asarray(num), normal=jnp.asarray(nrm),
        lambda_n=jnp.zeros((W, C)),
    )


def golden_case():
    """(om, body, cands, contacts, cfg) — THE fixed golden inputs."""
    rs = np.random.RandomState(SEED)
    om = make_om()
    body = make_body(rs)
    cands = make_hh_candidates(rs)
    contacts = make_contacts(rs)
    cfg = PhysicsConfig(
        dt=1.0 / 30.0, substeps=4, solver="jacobi", jacobi_iters=2,
        narrowphase_once=True, megakernel=True,
    )
    return om, body, cands, contacts, cfg


def make_om_full():
    """Object set exercising every narrowphase lane of the fused kernel
    (plane + two boxes + sphere)."""
    reg = pb.ObjectRegistry()
    reg.add_plane()
    reg.add_hull(geo.box_hull((0.5, 0.5, 0.5)), mass=1.0)
    reg.add_hull(geo.box_hull((0.4, 0.8, 0.3)), mass=2.5)
    reg.add_sphere(0.45, mass=0.8)
    return reg.build()


def make_full_candidates(rs, body_obj):
    """Host-built typed candidate buffers covering hh/hp/sp lanes.

    Built in numpy (not via the jax broadphase) so the SAME candidate
    bytes feed the kernel on every backend."""
    from madrona_tpu.physics.broadphase import Candidates

    hull_rows = [
        [r for r in range(1, N) if body_obj[w, r] in (1, 2)]
        for w in range(W)
    ]
    sph_rows = [
        [r for r in range(1, N) if body_obj[w, r] == 3] for w in range(W)
    ]
    cap_hh, cap_hp, cap_s = 16, 8, 8
    hh = np.full((W, cap_hh, 2), N, np.int32)
    hp = np.full((W, cap_hp, 2), N, np.int32)
    sp = np.full((W, cap_s, 2), N, np.int32)
    spk = np.zeros((W, cap_s), np.int32)
    hh_n = np.zeros((W,), np.int32)
    hp_n = np.zeros((W,), np.int32)
    sp_n = np.zeros((W,), np.int32)
    for w in range(W):
        hs = hull_rows[w]
        k = min(cap_hh - 2, max(2, len(hs) - 1))
        for i in range(k):
            a, b = hs[i], hs[(i + 1 + rs.randint(0, len(hs) - 1))
                            % len(hs)]
            if a == b:
                b = hs[(i + 1) % len(hs)]
            hh[w, i] = (min(a, b), max(a, b))
        hh_n[w] = k
        kp = min(cap_hp, len(hs))
        for i in range(kp):
            hp[w, i] = (hs[i], 0)            # (hull, plane row 0)
        hp_n[w] = kp
        ss = sph_rows[w]
        i = 0
        for s in ss[:cap_s]:
            partner = hs[rs.randint(0, len(hs))] if i % 3 == 0 else (
                0 if i % 3 == 1 else (ss[(i + 1) % len(ss)]
                                      if len(ss) > 1 else 0)
            )
            if partner == s:
                partner = 0
            sp[w, i] = (s, partner)
            if partner == 0:
                spk[w, i] = geo.TYPE_PLANE
            elif body_obj[w, partner] == 3:
                spk[w, i] = geo.TYPE_SPHERE
            else:
                spk[w, i] = geo.TYPE_HULL
            i += 1
        sp_n[w] = i
    return Candidates(
        hh=jnp.asarray(hh), hh_num=jnp.asarray(hh_n),
        hp=jnp.asarray(hp), hp_num=jnp.asarray(hp_n),
        sp=jnp.asarray(sp), sp_num=jnp.asarray(sp_n),
        sp_kind=jnp.asarray(spk),
        overflow=jnp.zeros((W,), bool),
    )


def fused_case():
    """(om, body, cands, cfg) for the fused whole-step kernel
    (ops/physics_megakernel) — all three narrowphase lanes live."""
    rs = np.random.RandomState(SEED + 1)
    om = make_om_full()
    body = make_body(rs)
    obj = np.asarray(rs.randint(1, 4, (W, N)), np.int32)
    obj[:, 0] = 0
    import dataclasses

    body = dataclasses.replace(body, obj_id=jnp.asarray(obj))
    cands = make_full_candidates(rs, obj)
    cfg = PhysicsConfig(
        dt=1.0 / 30.0, substeps=4, solver="jacobi", jacobi_iters=2,
        narrowphase_once=True, megakernel_fused=True,
    )
    return om, body, cands, cfg


def run_kernels(interpret: bool):
    """Run both Pallas kernels on the golden inputs; returns a dict of
    numpy output arrays (the golden payload)."""
    from madrona_tpu.physics import api

    om, body, cands, contacts, cfg = golden_case()
    ref_p, alt_p, pts_p, num_p, nrm_p = api.narrowphase_hh_pallas(
        body, om, cands, interpret=interpret, sublane=True,
        pair_tile=8,
    )
    out = {
        "np_ref": ref_p, "np_alt": alt_p, "np_pts": pts_p,
        "np_num": num_p, "np_nrm": nrm_p,
    }
    body2 = api.megakernel_substeps(
        body, contacts, om, cfg, tile_w=8, interpret=interpret
    )
    out.update({
        "mk_pos": body2.pos, "mk_rot": body2.rot,
        "mk_vel": body2.vel, "mk_omega": body2.omega,
    })
    om_f, body_f, cands_f, cfg_f = fused_case()
    body3 = api.megakernel_fused_step(
        body_f, cands_f, om_f, cfg_f, tile_w=8, interpret=interpret
    )
    out.update({
        "fk_pos": body3.pos, "fk_rot": body3.rot,
        "fk_vel": body3.vel, "fk_omega": body3.omega,
    })
    return {k: np.asarray(v) for k, v in out.items()}
