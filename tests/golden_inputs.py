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
    """WELL-CONDITIONED golden scene: a jittered lattice of shallowly
    touching boxes with small tilts. Goldens compare COMPILED Mosaic
    against interpret mode, whose float contraction orders differ by
    ulps; a degenerate scene (deep random interpenetration) lets those
    ulps flip SAT face-selection ties into different-but-valid contact
    normals, which is amplification noise, not a kernel regression.
    Shallow well-separated face separations keep every discrete choice
    stable so the goldens pin real divergence tightly."""
    def q_tilt(shape, max_angle=0.5):
        # tilts big enough that no two faces are near-parallel (ALIGNED
        # boxes are the degenerate case: every face pair ties in the
        # SAT and the clip polygon has redundant points), small enough
        # that contacts stay shallow
        axis = rs.randn(*shape, 3).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        ang = rs.uniform(0.15, max_angle, shape).astype(np.float32)
        q = np.concatenate(
            [np.cos(ang / 2)[..., None],
             np.sin(ang / 2)[..., None] * axis], axis=-1,
        )
        return q.astype(np.float32)

    # 4x4 lattice at ~box spacing: neighbor overlaps in [-0.1, 0.1]
    idx = np.arange(N)
    gx = (idx % 4).astype(np.float32)
    gy = (idx // 4).astype(np.float32)
    pos = np.zeros((W, N, 3), np.float32)
    pos[..., 0] = gx[None] * 1.1 + rs.uniform(-0.06, 0.06, (W, N))
    pos[..., 1] = gy[None] * 1.1 + rs.uniform(-0.06, 0.06, (W, N))
    pos[..., 2] = rs.uniform(0.5, 0.62, (W, N)).astype(np.float32)
    obj = rs.randint(1, 3, (W, N)).astype(np.int32)
    obj[:, 0] = 0
    pos[:, 0] = 0.0                        # row 0: the floor plane
    resp = np.full((W, N), pb.RESPONSE_DYNAMIC, np.int32)
    resp[:, 0] = pb.RESPONSE_STATIC
    active = np.ones((W, N), bool)
    active[:, -1] = False
    rot = q_tilt((W, N))
    rot[:, 0] = [1, 0, 0, 0]
    z3 = jnp.zeros((W, N, 3))
    z4 = jnp.zeros((W, N, 4))
    return BodyState(
        pos=jnp.asarray(pos), rot=jnp.asarray(rot),
        scale=jnp.ones((W, N, 3)),
        vel=jnp.asarray(0.3 * rs.randn(W, N, 3).astype(np.float32)),
        omega=jnp.asarray(0.2 * rs.randn(W, N, 3).astype(np.float32)),
        obj_id=jnp.asarray(obj), response=jnp.asarray(resp),
        ext_force=jnp.asarray(
            0.05 * rs.randn(W, N, 3).astype(np.float32)
        ),
        ext_torque=jnp.asarray(
            0.05 * rs.randn(W, N, 3).astype(np.float32)
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
    # shallow depths: deep synthetic penetrations amplify ulp-scale
    # compiled-vs-interpret differences through the solver's branches
    dep = rs.uniform(-0.01, 0.03, (W, C, 4, 1)).astype(np.float32)
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
        # goldens were captured under the edge-pairs SAT; pin it so the
        # round-5 edge_dirs default flip cannot shift the payloads
        sat_tier="edge_pairs",
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
    # production-scale caps (escape room ships hh=8); ALSO the fused
    # kernel's compiled VMEM budget: hh=16/sp=8 overflowed the 16M
    # scoped-vmem stack even with loop+chunk
    cap_hh, cap_hp, cap_s = 8, 8, 4
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
    # rolled substeps + hh pair chunking: the unrolled fused kernel's
    # scoped-VMEM stack (~26M) exceeds the physical 16M when COMPILED;
    # this is the kernel's only Mosaic-feasible configuration and
    # therefore the one the goldens pin
    cfg = PhysicsConfig(
        dt=1.0 / 30.0, substeps=4, solver="jacobi", jacobi_iters=2,
        narrowphase_once=True, megakernel_fused=True,
        megakernel_loop=True, fused_pair_chunk=4,
        sat_tier="edge_pairs",   # tier pinned — see golden_case()
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


def lidar_case():
    """(inst_pos, inst_rot, inst_half, self_mask, origins, dirs, t_max)
    for the lidar OBB kernel (ops/lidar_pallas.lidar_obb shapes)."""
    rs = np.random.RandomState(SEED + 2)
    n_inst, n_agents, per = 12, 2, 30

    def q_rand(shape):
        q = rs.randn(*shape, 4).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    inst_pos = rs.uniform(-6, 6, (W, n_inst, 3)).astype(np.float32)
    inst_rot = q_rand((W, n_inst))
    inst_half = rs.uniform(0.2, 2.0, (W, n_inst, 3)).astype(np.float32)
    self_mask = np.zeros((n_agents, n_inst), bool)
    self_mask[0, 0] = True
    self_mask[1, 1] = True
    origins = rs.uniform(-2, 2, (W, n_agents, 3)).astype(np.float32)
    dirs = rs.randn(W, n_agents, per, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return (
        jnp.asarray(inst_pos), jnp.asarray(inst_rot),
        jnp.asarray(inst_half), self_mask,
        jnp.asarray(origins), jnp.asarray(dirs), 25.0,
    )


def run_kernels_v2(interpret: bool):
    """Round-4 additions: broadphase kernel, contacts megakernel,
    dyn_range solver, lidar kernel. Kept separate from run_kernels so
    the v1 golden payload stays byte-stable."""
    import dataclasses

    from madrona_tpu.physics import api
    from madrona_tpu.physics import broadphase as bp
    from madrona_tpu.physics import xpbd
    from madrona_tpu.ops import lidar_pallas
    from madrona_tpu.ops import physics_megakernel as fpk

    om, body, cands, contacts, cfg = golden_case()
    out = {}

    # --- broadphase + compaction kernel
    caps = bp.CandidateCaps(hull_hull=8, hull_plane=6, sphere_any=2)
    c_bp = bp.find_candidates_pallas(
        body, om, caps, cfg.dt, interpret=interpret
    )
    out.update({
        "bp_hh": c_bp.hh, "bp_hh_num": c_bp.hh_num,
        "bp_hp": c_bp.hp, "bp_hp_num": c_bp.hp_num,
        "bp_sp": c_bp.sp, "bp_sp_num": c_bp.sp_num,
        "bp_kind": c_bp.sp_kind,
        "bp_overflow": c_bp.overflow.astype(np.int32),
    })

    # --- contacts megakernel (hh + hp lanes at predicted poses)
    h = cfg.dt / cfg.substeps
    caps2 = bp.CandidateCaps(hull_hull=8, hull_plane=8, sphere_any=0)
    cands2 = bp.find_candidates(body, om, caps2, cfg.dt)
    pred = xpbd.integrate(
        body, om, h, jnp.asarray(cfg.gravity, jnp.float32)
    )
    t2 = lambda a: jnp.transpose(a, (1, 0))
    nb_t = jnp.moveaxis(
        jnp.concatenate([pred.pos, pred.rot, pred.scale], -1), 0, -1
    )
    obj_t = jnp.moveaxis(body.obj_id.astype(jnp.float32), 0, -1)
    fnc = fpk.make_contacts_kernel(
        om.hull_dims, N, om.hull_pack.shape[0], interpret=interpret
    )
    ref_p, alt_p, con_p, pts_p, num_p = fnc(
        t2(cands2.hh[..., 0]), t2(cands2.hh[..., 1]),
        t2(cands2.hp[..., 0]), t2(cands2.hp[..., 1]),
        nb_t, obj_t, om.hull_pack_planar,
    )
    out.update({
        "cm_ref": ref_p, "cm_alt": alt_p, "cm_con": con_p,
        "cm_pts": pts_p, "cm_num": num_p,
    })

    # --- solver megakernel with the static-row split (dyn_range)
    resp = np.asarray(body.response).copy()
    resp[:, :4] = pb.RESPONSE_STATIC       # rows 0-3 static everywhere
    body_d = dataclasses.replace(body, response=jnp.asarray(resp))
    cfg_d = dataclasses.replace(cfg, solver_dynamic_range=(4, N))
    body4 = api.megakernel_substeps(
        body_d, contacts, om, cfg_d, tile_w=8, interpret=interpret
    )
    out.update({
        "dr_pos": body4.pos, "dr_rot": body4.rot,
        "dr_vel": body4.vel, "dr_omega": body4.omega,
    })

    # --- lidar OBB kernel
    (inst_pos, inst_rot, inst_half, self_mask, origins, dirs,
     t_max) = lidar_case()
    depth = lidar_pallas.lidar_obb(
        inst_pos, inst_rot, inst_half, self_mask, origins, dirs,
        t_max, interpret=interpret,
    )
    out["li_depth"] = depth
    return {k: np.asarray(v) for k, v in out.items()}


def raycast_case():
    """Fixed scene for the raycast megakernel goldens: floor quad +
    boxes + a pyramid with materials, a shadow-casting sun, 2 worlds x
    2 views at 16x24."""
    from madrona_tpu.render import MeshRegistry, RenderConfig
    from madrona_tpu.render.lights import make_lights
    from madrona_tpu.render.materials import bake_materials
    from madrona_tpu.assets.importer import (
        ImportedMaterial, ImportedTexture,
    )

    rs = np.random.RandomState(SEED + 3)
    reg = MeshRegistry()
    floor = reg.add_quad(18.0, color=(0.4, 0.4, 0.4), uv_tiles=3.0,
                         material=1)
    box = reg.add_box([0.7, 0.5, 0.6], color=(0.7, 0.3, 0.2), material=2)
    verts = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0),
             (0, 0, 1.3)]
    tris = [(0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4), (0, 2, 1),
            (0, 3, 2)]
    pyr = reg.add_mesh(verts, tris, color=(0.2, 0.6, 0.3), material=0)
    blas = reg.build_blas()

    w_, i_n = 2, 5
    pos = np.zeros((w_, i_n, 3), np.float32)
    rot = np.zeros((w_, i_n, 4), np.float32)
    rot[..., 0] = 1.0
    scale = np.ones((w_, i_n, 3), np.float32)
    obj = np.zeros((w_, i_n), np.int32)
    obj[:, 0] = floor
    obj[:, 1] = pyr
    pos[:, 1, :2] = rs.uniform(-3, 3, (w_, 2))
    for b in range(3):
        obj[:, 2 + b] = box
        pos[:, 2 + b, :2] = rs.uniform(-4, 4, (w_, 2))
        pos[:, 2 + b, 2] = rs.uniform(0.5, 1.5, w_)
        ang = rs.uniform(0, np.pi, w_)
        rot[:, 2 + b, 0] = np.cos(ang / 2)
        rot[:, 2 + b, 3] = np.sin(ang / 2)
    mask = np.ones((w_, i_n), bool)
    cam_pos = np.zeros((w_, 2, 3), np.float32)
    cam_pos[:, :, 1] = -7.0
    cam_pos[:, :, 2] = 2.5
    cam_pos[:, 1, 0] = 2.5
    cam_rot = np.zeros((w_, 2, 4), np.float32)
    cam_rot[..., 0] = 1.0

    n = 16
    yy, xx = np.mgrid[0:n, 0:n]
    img = np.empty((n, n, 4), np.uint8)
    img[..., :3] = np.where(
        (((yy // 4) + (xx // 4)) % 2)[..., None] > 0, 210, 70
    )
    img[..., 3] = 255
    mats = bake_materials(
        [ImportedMaterial("floor", (1.0, 1.0, 1.0, 1.0), texture=0),
         ImportedMaterial("box", (0.8, 0.4, 0.2, 1.0))],
        [ImportedTexture("check", img)], tex_size=n,
    )
    lights = make_lights(w_, [
        {"direction": (0.4, -0.2, -1.0), "cast_shadow": True},
    ])
    cfg = RenderConfig(width=24, height=16, t_max=60.0, shadows=True)
    j = jnp.asarray
    return (cfg, blas, mats, lights,
            (j(pos), j(rot), j(scale), j(obj), j(mask),
             j(cam_pos), j(cam_rot)))


def run_kernels_v3(interpret: bool):
    """Round-5 addition: the raycast megakernel (ops/raycast_pallas)
    through render_views_kernel on the fixed scene."""
    from madrona_tpu.render.kernel import render_views_kernel

    cfg, blas, mats, lights, args = raycast_case()
    pos, rot, scale, obj, mask, cam_pos, cam_rot = args
    mask3 = jnp.broadcast_to(mask[:, None, :], (2, 2, mask.shape[1]))
    rgb, depth = render_views_kernel(
        cfg, blas, pos, rot, scale, obj, mask3, cam_pos, cam_rot,
        materials=mats, lights=lights, interpret=interpret,
    )
    return {"rc_rgb": np.asarray(rgb), "rc_depth": np.asarray(depth)}


# ------------------------------------------------------ golden compare

# Per-key comparison spec. Int fields are exact. Float fields compare
# only LIVE lanes (dead candidate slots carry unspecified values that
# legitimately differ between compiled Mosaic and interpret mode).
# Single-kernel value fields get ulp-scale bounds; whole-substep-loop
# outputs (4 substeps of branchy contact dynamics) get amplification
# bounds — anything past these is a real kernel regression.
TOL_NARROW = 1e-4
TOL_POS = 1e-3
TOL_ROT = 1e-3
# whole-substep-loop bounds: a handful of contact-branch boundary flips
# (friction clamp, penetrating test) per 4-substep run is inherent ulp
# amplification; a real Mosaic regression shows up as O(1)+ errors on
# most elements, far past these
TOL_VEL = 5e-2
TOL_OMEGA = 2e-1
TOL_LIDAR = 1e-5


def compare_goldens(out, golden):
    """Compare a run_kernels*/npz pair; returns a list of failure
    strings (empty = pass). Masks derive from the GOLDEN int fields,
    which must match exactly first."""
    fails = []

    def check_int(k):
        if not np.array_equal(out[k], golden[k]):
            fails.append(f"{k}: int mismatch "
                         f"({(out[k] != golden[k]).sum()} elems)")

    def check(k, tol, mask=None):
        a = out[k].astype(np.float64)
        b = golden[k].astype(np.float64)
        d = np.abs(a - b)
        if mask is not None:
            d = np.where(mask, d, 0.0)
        m = d.max() if d.size else 0.0
        if m > tol:
            fails.append(f"{k}: masked maxd {m:.3g} > {tol}")

    keys = set(out)
    if set(golden) != keys:
        return [f"key sets differ: {sorted(keys ^ set(golden))}"]

    for k in sorted(keys):
        if out[k].dtype.kind in "iub":
            check_int(k)
    if fails:
        return fails                     # masks below need exact ints

    def check_pts_sorted(k, pts_a, pts_b, num):
        """Order-invariant manifold comparison: the 4-point reduction
        may emit the same point SET in a different slot order between
        compiled and interpret mode (argmax ties on near-equal scores);
        sort live points lexicographically before comparing.
        pts_*: [..., 4, 4] (pt, xyz+depth); num: [...] live counts."""
        la = np.where(
            (np.arange(4)[None] < num.reshape(-1, 1))[..., None],
            pts_a.reshape(-1, 4, 4), 0.0,
        )
        lb = np.where(
            (np.arange(4)[None] < num.reshape(-1, 1))[..., None],
            pts_b.reshape(-1, 4, 4), 0.0,
        )

        def sort4(x):
            order = np.lexsort(
                (x[..., 3], x[..., 2], x[..., 1], x[..., 0]), axis=-1
            )
            return np.take_along_axis(x, order[..., None], axis=1)

        d = np.abs(sort4(la) - sort4(lb)).max() if la.size else 0.0
        if d > 1e-3:
            fails.append(f"{k}: sorted-manifold maxd {d:.3g} > 0.001")

    if "np_num" in keys:
        num = golden["np_num"]                        # [W, P]
        live = num > 0
        check("np_ref", 0.0)
        check("np_alt", 0.0)
        check("np_nrm", TOL_NARROW, live[..., None])
        check_pts_sorted("np_pts", out["np_pts"], golden["np_pts"], num)
    if "cm_num" in keys:
        num = golden["cm_num"]                        # [C, W]
        ok = golden["cm_con"][7] > 0.5                # [C, W]
        check("cm_ref", 0.0)
        check("cm_alt", 0.0)
        check("cm_con", TOL_NARROW, ok[None])
        # cm_pts rows: pt0(x,y,z,d) pt1(...) ... -> [C*W, 4, 4]
        def planar_pts(x):
            r = x.reshape(4, 4, x.shape[1], x.shape[2])  # [pt,comp,C,W]
            return np.transpose(r, (2, 3, 0, 1))         # [C,W,pt,comp]

        num_m = np.where(ok, num, 0)
        check_pts_sorted(
            "cm_pts", planar_pts(out["cm_pts"]),
            planar_pts(golden["cm_pts"]), num_m,
        )
    for prefix in ("mk", "dr", "fk"):
        if f"{prefix}_pos" in keys:
            check(f"{prefix}_pos", TOL_POS)
            check(f"{prefix}_rot", TOL_ROT)
            check(f"{prefix}_vel", TOL_VEL)
            check(f"{prefix}_omega", TOL_OMEGA)
    if "li_depth" in keys:
        check("li_depth", TOL_LIDAR)
    return fails
