"""Batched rigid-body world (replaces ODE world + spaces, physics.c).

Design: one fixed-capacity SoA body array per env. All bodies are
capsules (sphere = zero-length capsule), matching the only dynamic geom
classes the reference instantiates (physics.c:954-1046; trimeshes are
static and live in StaticWorld). Characters are kinematic capsules moved
by the controller (physics.c:1022-1032) — the solver treats them as
infinite-mass obstacles.

Replicates (semantics, not code):
- gravity (0, -9.8, 0), linear damping 1e-3 (phys_init, physics.c:1126-1130)
- fixed 120 Hz substepping, ≤5 substeps/frame, accumulator reset when the
  cap is hit (phys_step physics.c:773-787)
- contact parameter mixing: bounce=max, bounce_vel=avg, mu=√(mu1·mu2)
  (phys_contact_surface physics.c:291-330)
- penetration push-out before the velocity solve (entity_pen_push +
  __phys_step physics.c:363-379, 755-766)
- auto-disable at rest: |v| < 0.05 for 30 steps (physics.c:1033-1043)

The velocity-level contact solve is an impulse (PGS-style) iteration with
ERP/CFM-equivalent softness — a TPU-native replacement for QuickStep's
SOR-LCP, vectorized over envs × bodies with a fixed contact capacity.

Capsule geometry convention: ``pos`` is the GEOM CENTER (entity origin +
yoffset, phys_body_set_position); the capsule segment spans
pos ± (0, half_len, 0); total capsule height = 2·half_len + 2·r.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import mathx as mx
from .narrowphase import StaticWorld, capsule_world_contacts
from .shapes import closest_pt_segment_segment

FIXED_DT = 1.0 / 120.0
MAX_SUBSTEPS = 5
GRAVITY = jnp.array([0.0, -9.8, 0.0])
LINEAR_DAMPING = 1e-3
AUTO_DISABLE_VEL = 0.05
AUTO_DISABLE_ANGVEL = 0.25    # rad/s (ODE default-ish angular threshold)
AUTO_DISABLE_STEPS = 30
SOFT_ERP = 0.05
SOFT_CFM = 0.01
N_SOLVER_PASSES = 4       # sequential-impulse sweeps per substep (each =
                          # all static slots + one Jacobi pair pass).
                          # Measured (r5, test_ode_parity damped refs):
                          # the contact case matrix is FLAT from 2 to 12
                          # passes — the iteration converges by 4, and
                          # the residual vs textbook formulas is the
                          # per-substep damping both we and ODE apply
                          # (<1% vs damping-aware references). 4 is the
                          # measured speed point, not an accuracy trade.
CONTACT_MARGIN = 1e-3     # contacts stay active within this separation so
                          # resting bodies keep a persistent contact (ODE
                          # keeps depth slightly positive instead)


class BodyParams(NamedTuple):
    """Static per-body-slot parameters, (N,) arrays."""

    active: jnp.ndarray      # bool: slot used
    kinematic: jnp.ndarray   # bool: character (controller-driven)
    radius: jnp.ndarray      # f32
    half_len: jnp.ndarray    # f32 capsule segment half-length (0 → sphere)
    yoffset: jnp.ndarray     # f32 geom center above entity origin
    ray_off: jnp.ndarray     # f32 ground-ray origin offset (r + length/2)
    mass: jnp.ndarray        # f32
    bounce: jnp.ndarray      # f32
    bounce_vel: jnp.ndarray  # f32
    mu: jnp.ndarray          # f32
    inertia: jnp.ndarray = None  # (N, 3) body-frame principal inertia
                                 # (capsule axis = y); None → derived


class PhysState(NamedTuple):
    """Dynamic per-env physics state."""

    pos: jnp.ndarray        # (N, 3) geom centers
    vel: jnp.ndarray        # (N, 3)
    quat: jnp.ndarray       # (N, 4) body orientation (x, y, z, w)
    angvel: jnp.ndarray     # (N, 3) world-frame angular velocity
    time_acc: jnp.ndarray   # () accumulator
    disable_count: jnp.ndarray  # (N,) int32 steps below threshold
    disabled: jnp.ndarray   # (N,) bool at-rest


def capsule_inertia(mass, radius, half_len):
    """Principal inertia of a solid capsule about its center (y = long
    axis) — the dMassSetCapsuleTotal formula (ODE mass.cpp), with the
    sphere as the half_len → 0 limit. Returns (..., 3) [Ixx, Iyy, Izz].
    """
    r = jnp.maximum(radius, 1e-6)
    L = 2.0 * half_len
    v_cyl = jnp.pi * r * r * L
    v_sph = (4.0 / 3.0) * jnp.pi * r ** 3
    rho = mass / jnp.maximum(v_cyl + v_sph, 1e-12)
    m_c = rho * v_cyl
    m_s = rho * v_sph
    iyy = m_c * r * r / 2.0 + m_s * (2.0 / 5.0) * r * r
    ixx = m_c * (L * L / 12.0 + r * r / 4.0) \
        + m_s * ((2.0 / 5.0) * r * r + L * L / 4.0 + (3.0 / 8.0) * L * r)
    return jnp.stack([ixx, iyy, ixx], axis=-1)


def body_params_empty(n: int) -> BodyParams:
    z = jnp.zeros((n,), jnp.float32)
    return BodyParams(
        active=jnp.zeros((n,), bool), kinematic=jnp.zeros((n,), bool),
        radius=z, half_len=z, yoffset=z, ray_off=z,
        mass=jnp.ones((n,), jnp.float32), bounce=z, bounce_vel=z,
        mu=jnp.ones((n,), jnp.float32),
        inertia=jnp.ones((n, 3), jnp.float32),
    )


def finalize_inertia(params: BodyParams) -> BodyParams:
    """Derive per-body inertia from the capsule geometry (call after the
    slots' mass/radius/half_len are filled)."""
    return params._replace(
        inertia=capsule_inertia(params.mass, params.radius,
                                params.half_len))


def phys_state_init(n: int) -> PhysState:
    return PhysState(
        pos=jnp.zeros((n, 3), jnp.float32),
        vel=jnp.zeros((n, 3), jnp.float32),
        quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), (n, 1)),
        angvel=jnp.zeros((n, 3), jnp.float32),
        time_acc=jnp.zeros((), jnp.float32),
        disable_count=jnp.zeros((n,), jnp.int32),
        disabled=jnp.zeros((n,), bool),
    )


def capsule_auto_size(aabb_x: float, aabb_y: float, aabb_z: float,
                      geom_radius: float = 0.0, geom_offset: float = 0.0):
    """Upright auto-capsule from entity AABB (phys_geom_capsule_new,
    physics.c:814-880, direction-2 branch). Returns
    (radius, half_len, yoffset, ray_off)."""
    r = geom_radius if geom_radius else min(aabb_x, aabb_y, aabb_z) / 2
    length = max(aabb_y / 2 - r * 2, 0.0)
    yoffset = geom_offset if geom_offset else aabb_y / 2
    ray_off = r + length / 2
    return r, length / 2, yoffset, ray_off


def capsule_segment(pos, half_len, quat=None):
    """(p_bot, p_top) of the capsule segment for geom-center pos.

    quat rotates the body-frame +y axis — a tumbling capsule's collision
    segment follows its orientation (spheres: half_len 0, unaffected)."""
    up = jnp.zeros_like(pos).at[..., 1].set(half_len)
    if quat is not None:
        up = mx.qrot(quat, up)
    return pos - up, pos + up


# ---------------------------------------------------------------------------
# contact generation
# ---------------------------------------------------------------------------

def _body_patches(world: StaticWorld, params: BodyParams, pos):
    """Per-body heightfield corner patches, extracted ONCE PER FRAME.

    The patch one-hot matmuls are the single most expensive op group in
    the headless step (the (B·N, p, n) row-selection intermediates);
    extracting at frame-entry positions and reusing across substeps
    halves that cost. Validity: a p=4 patch holds ≥1 grid cell of slack
    around the sample footprint (±r), and bodies move ≤ v·dt ≈ cm per
    frame — far less than a 0.5 m cell; clamped samples degrade exactly
    like the documented patch-edge behavior in hf_patch."""
    from .heightfield import CONTACT_PATCH, hf_patch

    try:
        import numpy as _np

        two_ended = bool(_np.any(
            _np.asarray(params.half_len)
            * ~_np.asarray(params.kinematic) > 0))
    except Exception:
        two_ended = True
    p = 8 if two_ended else CONTACT_PATCH
    return jax.vmap(
        lambda c: hf_patch(world.hf, c[0], c[2], p))(pos)


def _static_contacts(world: StaticWorld, params: BodyParams, pos,
                     quat=None, patches=None):
    """All static-world contact slots per body (K = samples + tris).

    Returns (depth, normal, point) of shape (N, K[, 3]). No deepest-K
    selection: top_k + two [idx] gathers cost ~3.5 ms/step at 4096 envs
    (TPU gathers run ~10 ns/row) — solving a few extra masked slots is
    pure fused vector math and far cheaper. Duplicate planes (multiple
    samples on the same heightfield face, coplanar adjacent triangles —
    ODE's trimesh collider merges these) are masked to -inf keeping the
    DEEPEST contact of each normal direction."""
    # dynamic capsules tumble, so their contacts must cover both segment
    # ends; scenes whose dynamic bodies are all spheres (half_len 0) keep
    # the cheaper single-ended sample set. params are trace-time
    # constants in the jitted step, so this resolves statically; if they
    # are ever traced, fall back to the general (two-ended) path.
    try:
        import numpy as _np

        two_ended = bool(_np.any(
            _np.asarray(params.half_len)
            * ~_np.asarray(params.kinematic) > 0))
    except Exception:
        two_ended = True

    def per_body(p, r, hl, q, patch):
        p0, p1 = capsule_segment(p, hl, q)
        # cardinal heightfield samples only: dedupe keeps one contact per
        # plane anyway, and diagonal planes only matter for fast lateral
        # motion (covered by the sweep path). Near-contacts (depth ≤ 0
        # within CONTACT_MARGIN) stay so resting bodies keep a
        # persistent contact; c.depth is already -inf for masked slots.
        c = capsule_world_contacts(world, p0, p1, r, n_samples=5,
                                   patch=patch, two_ended=two_ended)
        d, n = c.depth, c.normal
        dots = jnp.einsum("ic,jc->ij", n, n)
        same = dots > 0.995
        deeper = (d[:, None] > d[None, :]) | (
            (d[:, None] == d[None, :])
            & (jnp.arange(d.shape[0])[:, None] < jnp.arange(d.shape[0])[None, :]))
        dup = (same & deeper).any(axis=0)   # j loses to a deeper/earlier i
        return jnp.where(dup, -jnp.inf, d), n, c.point

    if quat is None:
        quat = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                                (pos.shape[0], 4))
    if patches is None:
        patches = _body_patches(world, params, pos)
    return jax.vmap(per_body)(pos, params.radius, params.half_len, quat,
                              patches)


def _pair_indices(n: int):
    """Static i<j pair list: (I, J) int arrays of length P = n(n−1)/2.

    The (N, N) all-pairs matrix computes every contact twice and pays
    for the i==j diagonal; the unordered pair list is the TPU-native
    form — 2.25× fewer elements through the whole pair solve, with body
    selection/scatter as exact one-hot MXU matmuls (trace-time constant
    matrices)."""
    import numpy as _np

    iu = _np.triu_indices(n, k=1)
    return iu[0].astype(_np.int32), iu[1].astype(_np.int32)


def _pair_contacts(params: BodyParams, pos, quat=None):
    """Capsule-capsule contacts for the static i<j pair list.

    Returns (depth, normal, point) of shape (P[, 3]): normal points from
    body J toward body I; point is the world-space contact point
    (mid-surface of the overlap), which the solver needs for contact
    torques (ODE's dContactGeom.pos)."""
    n = pos.shape[0]
    I, J = _pair_indices(n)
    p0, p1 = capsule_segment(pos, params.half_len, quat)
    # traced per-body endpoints → per-pair rows via ONE one-hot matmul
    # (constant-index gathers of vmapped operands are batched gathers)
    feat = jnp.concatenate([p0, p1], axis=-1)                # (N, 6)
    oh_i = (I[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)
    oh_j = (J[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)
    fi = jax.lax.dot(oh_i, feat, precision=jax.lax.Precision.HIGHEST)
    fj = jax.lax.dot(oh_j, feat, precision=jax.lax.Precision.HIGHEST)
    # params are trace-time constants: plain indexing folds at compile
    rI = params.radius[I]
    rJ = params.radius[J]
    ok = params.active[I] & params.active[J]

    def pair(fi, fj, ri, rj, ok):
        ci, cj = closest_pt_segment_segment(fi[:3], fi[3:], fj[:3], fj[3:])
        diff = ci - cj
        dist = jnp.linalg.norm(diff)
        normal = diff / jnp.maximum(dist, 1e-9)
        # degenerate (same axis): push up
        normal = jnp.where(dist > 1e-9, normal, jnp.array([0.0, 1.0, 0.0]))
        depth = ri + rj - dist
        # surface point of i toward j / of j toward i — midpoint
        point = 0.5 * ((ci - normal * ri) + (cj + normal * rj))
        return jnp.where(ok, depth, -jnp.inf), normal, point

    return jax.vmap(pair)(fi, fj, rI, rJ, ok)


def _mix_pair(params: BodyParams, I, J):
    """Per-pair surface params (physics.c:291-330): bounce=max,
    bounce_vel=avg, mu=geometric mean. params are trace-time constants,
    so the indexing folds at compile."""
    bounce = jnp.maximum(params.bounce[I], params.bounce[J])
    bounce_vel = 0.5 * (params.bounce_vel[I] + params.bounce_vel[J])
    mu = jnp.sqrt(params.mu[I] * params.mu[J])
    return bounce, bounce_vel, mu


# ---------------------------------------------------------------------------
# substep
# ---------------------------------------------------------------------------

def _substep(world: StaticWorld, params: BodyParams, state: PhysState,
             dt, patches=None,
             solver_passes: int = N_SOLVER_PASSES) -> PhysState:
    """__phys_step (physics.c:746-771): collide → push-out → solve.

    Full 6-DOF rigid bodies: static contacts apply impulses at the
    contact point (linear + angular, λ-based with the standard
    effective-mass K = 1/m + n·((I⁻¹(r×n))×r)), so off-center hits
    tumble and friction makes spheres roll (phys_body_update syncs the
    resulting rotation back to entities, physics.c:789-811)."""
    pos, vel = state.pos, state.vel
    quat, angvel = state.quat, state.angvel
    solve_mask = params.active & ~params.kinematic & ~state.disabled

    # inverse inertia; zero for kinematic/inactive bodies (immovable in
    # the solve). Spheres have ISOTROPIC inertia (I⁻¹ = δ/i, rotation-
    # invariant) — when every dynamic body is a sphere (half_len 0, the
    # common case; params are trace-time constants) the solver skips all
    # 3×3 inertia matrix work, which costs ~2/3 of the angular solve.
    inv_mass = jnp.where(solve_mask, 1.0 / jnp.maximum(params.mass, 1e-6),
                         0.0)
    inv_d = jnp.where(solve_mask[:, None],
                      1.0 / jnp.maximum(params.inertia, 1e-9), 0.0)
    try:
        import numpy as _np

        iso = bool(_np.all(
            _np.asarray(params.half_len)
            * ~_np.asarray(params.kinematic) == 0))
    except Exception:
        iso = False
    if iso:
        inv_i = inv_d[:, 0]                                  # (N,)

        def invI_apply(x):
            return x * inv_i[:, None]

    else:
        R = mx.mat3_from_quat(quat)                          # (N, 3, 3)
        inv_I = jnp.einsum("nab,nb,ncb->nac", R, inv_d, R)   # R diag Rᵀ

        def invI_apply(x):
            return jnp.einsum("nab,nb->na", inv_I, x)


    # --- contacts
    sd, sn, sp = _static_contacts(world, params, pos, quat,
                                  patches)                   # (N,K),(N,K,3)
    pd, pn, ppt = _pair_contacts(params, pos, quat)          # (P,),(P,3)

    # pair-list selection/scatter machinery: body→pair rows and
    # pair→body sums are exact one-hot MXU matmuls over trace-time
    # constant matrices (constant-index gathers of per-env operands
    # would be batched gathers, ~10 ns/row)
    n_b = pos.shape[0]
    I, J = _pair_indices(n_b)
    hot = pd > 0
    ar_b = jnp.arange(n_b)
    oh_ij = jnp.concatenate([
        (I[:, None] == ar_b[None, :]), (J[:, None] == ar_b[None, :]),
    ], axis=0).astype(jnp.float32)                           # (2P, N)
    sc_i = oh_ij[:I.shape[0]].T                              # (N, P)
    sc_j = oh_ij[I.shape[0]:].T

    def sel_ij(x):
        """(N, F) per-body → ((P, F) rows at I, (P, F) rows at J)."""
        r = jax.lax.dot(oh_ij, x, precision=jax.lax.Precision.HIGHEST)
        return r[:I.shape[0]], r[I.shape[0]:]

    def scat(xi, xj):
        """Signed pair→body sums: Σ_{p: I=b} xi − Σ_{p: J=b} xj."""
        return (jax.lax.dot(sc_i, xi, precision=jax.lax.Precision.HIGHEST)
                - jax.lax.dot(sc_j, xj,
                              precision=jax.lax.Precision.HIGHEST))

    # --- penetration push-out (physics.c:755-766), dynamic bodies only
    push_static = jnp.sum(
        jnp.where(sd[..., None] > 0, sd[..., None] * sn, 0.0), axis=1
    )
    imp = jnp.where(hot[:, None], pd[:, None] * pn, 0.0)
    push_pairs = scat(imp, imp)
    pos = pos + jnp.where(solve_mask[:, None], push_static + push_pairs, 0.0)

    # wake bodies touched by an enabled body OR by a kinematic character
    # (ODE auto-re-enable: dBodyEnable fires on any contact-joint attach,
    # including character-space collisions — a character walking into a
    # sleeping box must wake it, physics.c:399-471)
    waker = solve_mask | (params.kinematic & params.active)
    wk_i, wk_j = sel_ij(waker.astype(jnp.float32)[:, None])
    t_i = (hot & (wk_j[:, 0] > 0)).astype(jnp.float32)[:, None]
    t_j = (hot & (wk_i[:, 0] > 0)).astype(jnp.float32)[:, None]
    touched = (jax.lax.dot(sc_i, t_i)[:, 0]
               + jax.lax.dot(sc_j, t_j)[:, 0]) > 0
    disabled = state.disabled & ~touched
    solve_mask = params.active & ~params.kinematic & ~disabled

    # --- gravity
    vel = vel + jnp.where(solve_mask[:, None], GRAVITY * dt, 0.0)

    # --- impulse solve over deepest-K static contacts + pair contacts.
    # Static contacts dominate (terrain rest/bounce); pair contacts get a
    # single Jacobi pass per iteration.
    bounce_s = params.bounce
    bv_s = params.bounce_vel
    mu_s = params.mu
    b_pair, bv_pair, mu_pair = _mix_pair(params, I, J)

    # contact offsets r (from the center of mass = geom center) and
    # restitution targets from pre-solve point velocities
    sr = sp - pos[:, None, :]                                # (N, K, 3)
    vpt_pre = vel[:, None, :] + jnp.cross(
        jnp.broadcast_to(angvel[:, None, :], sr.shape), sr)
    vn_pre_s = jnp.einsum("nkc,nkc->nk", sn, vpt_pre)
    target_s = jnp.where(
        (bounce_s[:, None] > 0) & (vn_pre_s < -bv_s[:, None]),
        -bounce_s[:, None] * vn_pre_s, 0.0,
    )
    contact_s = sd > -CONTACT_MARGIN

    # pair contact-point offsets + full effective mass K (both bodies'
    # linear AND angular terms — ODE's contact joint has the complete
    # Jacobian, physics.c:291-330 builds it for every near_callback
    # pair). λ is computed ONCE per unordered pair and applied to both
    # bodies with opposite signs — exactly what the old symmetric
    # (N, N) matrix computed twice.
    i_moves = (~params.kinematic & params.active)[I]     # (P,) consts
    j_moves = (~params.kinematic & params.active)[J]
    # traced per-body pull (post-push-out pos, inverse masses/inertias):
    # one fused one-hot matmul for both pair sides
    if iso:
        bfeat = jnp.concatenate(
            [pos, vel, angvel, inv_mass[:, None], inv_i[:, None]], -1)
        bI, bJ = sel_ij(bfeat)                               # (P, 11)
        imI, imJ = bI[:, 9], bJ[:, 9]

        def iiI_apply(x):
            return x * bI[:, 10:11]

        def iiJ_apply(x):
            return x * bJ[:, 10:11]
    else:
        bfeat = jnp.concatenate(
            [pos, vel, angvel, inv_mass[:, None],
             inv_I.reshape(n_b, 9)], -1)
        bI, bJ = sel_ij(bfeat)                               # (P, 19)
        imI, imJ = bI[:, 9], bJ[:, 9]
        iI = bI[:, 10:19].reshape(-1, 3, 3)
        iJ = bJ[:, 10:19].reshape(-1, 3, 3)

        def iiI_apply(x):
            return jnp.einsum("pab,pb->pa", iI, x)

        def iiJ_apply(x):
            return jnp.einsum("pab,pb->pa", iJ, x)

    pr_i = ppt - bI[:, :3]                                   # (P, 3)
    pr_j = ppt - bJ[:, :3]

    # pair restitution targets from RELATIVE pre-solve point velocities
    # (ODE's contact restitution acts on the relative normal speed;
    # angular terms make spinning hits rebound correctly). A kinematic
    # side contributes zero velocity (characters shove via
    # _apply_char_push, not the solver).
    vpt_i_pre = bI[:, 3:6] + jnp.cross(bI[:, 6:9], pr_i)
    vpt_j_pre = bJ[:, 3:6] + jnp.cross(bJ[:, 6:9], pr_j)
    vrel_pre = jnp.where(i_moves[:, None], vpt_i_pre, 0.0) \
        - jnp.where(j_moves[:, None], vpt_j_pre, 0.0)
    vn_pre_p = jnp.einsum("pc,pc->p", pn, vrel_pre)
    target_p = jnp.where(
        (b_pair > 0) & (vn_pre_p < -bv_pair), -b_pair * vn_pre_p, 0.0
    )

    rxn_i = jnp.cross(pr_i, pn)
    rxn_j = jnp.cross(pr_j, pn)
    ii_rxn_i = iiI_apply(rxn_i)     # inverse masses/inertias are zeroed
    ii_rxn_j = iiJ_apply(rxn_j)     # for kinematic/disabled bodies, so
    K_pair = (imI + imJ            # K self-gates per side
              + jnp.einsum("pc,pc->p", jnp.cross(ii_rxn_i, pr_i), pn)
              + jnp.einsum("pc,pc->p", jnp.cross(ii_rxn_j, pr_j), pn))

    # slot-major copies: the unrolled solver slices one slot per pass,
    # and [k]-major slices are contiguous (strided [:, k] slices off the
    # K-minor layout cost ~0.9 ms/step in layout shuffles)
    sn_km = jnp.moveaxis(sn, 1, 0)              # (K, N, 3)
    sr_km = jnp.moveaxis(sr, 1, 0)              # (K, N, 3)
    contact_km = jnp.moveaxis(contact_s, 1, 0)  # (K, N)
    target_km = jnp.moveaxis(target_s, 1, 0)    # (K, N)

    def static_slot(vw, k):
        """λ-based sequential impulse at the contact point for one
        static slot (the static side has infinite mass). Normal impulse
        λ = max(target − vn, 0)/K with K = 1/m + n·((I⁻¹(r×n))×r);
        Coulomb friction applies a point-tangential impulse ≤ μ·λ —
        which is what makes spheres roll instead of skid."""
        v, w = vw
        n_k = sn_km[k]
        r_k = sr_km[k]
        act = contact_km[k] & solve_mask
        vpt = v + jnp.cross(w, r_k)
        vn = jnp.sum(n_k * vpt, axis=-1)
        rxn = jnp.cross(r_k, n_k)
        iirxn = invI_apply(rxn)
        K = inv_mass + jnp.einsum("nc,nc->n", jnp.cross(iirxn, r_k), n_k)
        lam = jnp.where(act,
                        jnp.maximum(target_km[k] - vn, 0.0)
                        / jnp.maximum(K, 1e-9), 0.0)
        v = v + (lam * inv_mass)[:, None] * n_k
        w = w + lam[:, None] * iirxn
        # friction: tangential point-velocity after the normal impulse
        vpt = v + jnp.cross(w, r_k)
        vt = vpt - jnp.sum(n_k * vpt, axis=-1, keepdims=True) * n_k
        vt_len = jnp.linalg.norm(vt, axis=-1)
        t_dir = vt / jnp.maximum(vt_len, 1e-9)[:, None]
        rxt = jnp.cross(r_k, t_dir)
        iirxt = invI_apply(rxt)
        Kt = inv_mass + jnp.einsum("nc,nc->n", jnp.cross(iirxt, r_k), t_dir)
        lam_t = jnp.where(act & (vt_len > 1e-9),
                          jnp.minimum(vt_len / jnp.maximum(Kt, 1e-9),
                                      mu_s * lam), 0.0)
        v = v - (lam_t * inv_mass)[:, None] * t_dir
        w = w - lam_t[:, None] * iirxt
        return (v, w), None

    def pair_pass(v, w):
        """One Jacobi pass over the pair list with the full contact
        Jacobian: λ-impulses at the contact point (linear + angular,
        split by the complete effective mass K_pair) plus Coulomb
        friction ≤ μ·λ — stacked capsules get contact torques and rub
        (near_callback builds exactly these contact joints,
        physics.c:291-330). One λ per unordered pair, scattered to both
        bodies with opposite signs via the constant one-hot matrices."""
        X = jnp.concatenate([v, w], axis=-1)                 # (N, 6)
        XI, XJ = sel_ij(X)                                   # (P, 6)
        vpt_i = XI[:, :3] + jnp.cross(XI[:, 3:6], pr_i)
        vpt_j = XJ[:, :3] + jnp.cross(XJ[:, 3:6], pr_j)
        vrel = jnp.where(i_moves[:, None], vpt_i, 0.0) \
            - jnp.where(j_moves[:, None], vpt_j, 0.0)
        vn_p = jnp.einsum("pc,pc->p", pn, vrel)
        lam = jnp.where(hot, jnp.maximum(target_p - vn_p, 0.0)
                        / jnp.maximum(K_pair, 1e-9), 0.0)

        # friction: tangential relative point velocity, cone-bounded by
        # this pass's normal λ (mu mixed √(mu_i·mu_j), physics.c:291-330)
        vt = vrel - vn_p[:, None] * pn
        vt_len = jnp.linalg.norm(vt, axis=-1)
        t_dir = vt / jnp.maximum(vt_len, 1e-9)[:, None]
        rxt_i = jnp.cross(pr_i, t_dir)
        rxt_j = jnp.cross(pr_j, t_dir)
        ii_rxt_i = iiI_apply(rxt_i)
        ii_rxt_j = iiJ_apply(rxt_j)
        Kt = (imI + imJ
              + jnp.einsum("pc,pc->p", jnp.cross(ii_rxt_i, pr_i), t_dir)
              + jnp.einsum("pc,pc->p", jnp.cross(ii_rxt_j, pr_j), t_dir))
        lam_t = jnp.where(hot & (vt_len > 1e-9),
                          jnp.minimum(vt_len / jnp.maximum(Kt, 1e-9),
                                      mu_pair * lam), 0.0)

        plin = lam[:, None] * pn - lam_t[:, None] * t_dir    # on i; −on j
        dwi = lam[:, None] * ii_rxn_i - lam_t[:, None] * ii_rxt_i
        dwj = lam[:, None] * ii_rxn_j - lam_t[:, None] * ii_rxt_j
        dv = scat(plin, plin) * inv_mass[:, None]
        dw = scat(dwi, dwj)
        return (v + jnp.where(solve_mask[:, None], dv, 0.0),
                w + jnp.where(solve_mask[:, None], dw, 0.0))

    # fully unrolled: tiny static trip counts compile to one fused
    # dataflow — lax loops here materialize ~10 MB carry tuples per
    # iteration and made the substep HBM-bound (6 while loops ≈ 23 GB
    # of traffic per 4096-env step before this change)
    for _ in range(solver_passes):
        for k in range(sd.shape[1]):
            (vel, angvel), _ = static_slot((vel, angvel), k)
        vel, angvel = pair_pass(vel, angvel)

    # --- damping + integrate (linear damping only, like phys_init —
    # physics.c:1126-1130 sets no angular damping)
    vel = vel * jnp.where(solve_mask[:, None], 1.0 - LINEAR_DAMPING, 1.0)
    pos = pos + jnp.where(solve_mask[:, None], vel * dt, 0.0)
    # quaternion integration: q̇ = ½ ω ⊗ q (world-frame ω, ODE order)
    wq = jnp.concatenate([angvel, jnp.zeros_like(angvel[:, :1])], axis=-1)
    dq = 0.5 * mx.qmul(wq, quat)
    quat = mx.qnormalize(
        jnp.where(solve_mask[:, None], quat + dq * dt, quat))

    # --- auto-disable bookkeeping (physics.c:1033-1043); ODE's
    # auto-disable checks both linear and angular speed
    slow = (jnp.linalg.norm(vel, axis=-1) < AUTO_DISABLE_VEL) \
        & (jnp.linalg.norm(angvel, axis=-1) < AUTO_DISABLE_ANGVEL)
    cnt = jnp.where(slow, state.disable_count + 1, 0)
    disabled = disabled | (solve_mask & (cnt >= AUTO_DISABLE_STEPS))
    vel = jnp.where(disabled[:, None], 0.0, vel)
    angvel = jnp.where((disabled | ~solve_mask)[:, None], 0.0, angvel)

    return PhysState(pos=pos, vel=vel, quat=quat, angvel=angvel,
                     time_acc=state.time_acc,
                     disable_count=cnt, disabled=disabled)


def phys_step(world: StaticWorld, params: BodyParams, state: PhysState,
              dt, max_substeps: int = MAX_SUBSTEPS,
              solver_passes: int = N_SOLVER_PASSES) -> PhysState:
    """phys_step (physics.c:773-787): fixed-dt accumulator, ≤5 substeps.

    ``max_substeps`` trades worst-case dt coverage for traced-graph size:
    at a fixed 60 Hz frame dt exactly 2 substeps ever run, so callers
    with a known frame rate pass 2 and compile half the narrowphase.

    ``solver_passes``: sequential-impulse sweeps per substep. The
    default (4) is the speed point the headless benchmark guards — and,
    measured (r5), also the CONVERGED point: the ODE-parity case matrix
    (bounce/incline/backspin/stacks) moves by <0.1% from 2 to 12 passes,
    and lands within 1% of discrete references that carry ODE's own
    per-substep damping semantics (test_ode_parity "damped discrete
    references"). The 8-15% band vs idealized textbook formulas is that
    damping + frame-sampling granularity, not iteration error, so
    warm-starting impulses across substeps would buy nothing here
    (QuickStep's 20 SOR iterations battle an LCP matrix this
    contact-capacity solver never forms).
    """
    acc = state.time_acc + dt
    # heightfield patches once per FRAME (see _body_patches: substep
    # drift is cm against ≥1 cell of patch slack)
    patches = _body_patches(world, params, state.pos)

    def body(i, carry):
        st, acc = carry
        do = acc >= FIXED_DT
        st2 = _substep(world, params, st, FIXED_DT, patches,
                       solver_passes=solver_passes)
        st = jax.tree.map(lambda a, b: jnp.where(do, b, a), st, st2)
        return st, jnp.where(do, acc - FIXED_DT, acc)

    state, acc = jax.lax.fori_loop(0, max_substeps, body, (state, acc),
                                   unroll=True)
    # cap hit → drop the remainder (physics.c:785-786)
    acc = jnp.where(acc >= FIXED_DT, 0.0, acc)
    return state._replace(time_acc=acc)
