"""Skinned-character rendering: LBS-deformed vertices entering the
frame's record streams (reference: model.vert:34-48 — the vertex shader
deforms by 4-bone LBS every draw; model.c:1020-1025 uploads the joint
transforms; the skeleton/weights come from glTF skins, gltf.c:1234-1322).

TPU formulation. Skinned vertices are genuinely PER-ENV geometry (each
env's rig is at a different clip time), so the shared-table tricks the
rigid path lives on (one static cluster table + per-env validity) don't
apply — a dynamic vertex range must enter the record stream. Instead of
skinning a vertex table and gathering corners per env (a batched-operand
gather under vmap, ~10 ns/row), the char mesh is corner-expanded ONCE on
host into the exact row layouts the record builders consume:

  - main range: corner-MAJOR rows over cluster-padded LOD0 faces — the
    layout of SceneGeometry.comp (clip_near_records components mode);
  - shadow range: RECORD-order rows (v0, v2, v1) over the char's
    coarsest-LOD faces — the layout of the dynamic shadow corner stream.

Per frame, ONE (R, J) @ (J, 12·B·C) MXU matmul blends every corner row
for every (env, char) instance (the skin_verts_batch trick: instances on
the LANE axis, component-major columns), and the clip/world transforms
apply columnarly. The skinned clip components CONCATENATE onto the
rigid cluster-record stream (the char's rigid clusters are statically
masked off), and the skinned world shadow corners dynamic-update-slice
over the char's rows of the shadow corner stream. Zero gathers.

Normals: LBS rotates rest normals into CHAR-LOCAL space (sn); the
kernel-attrs shade stage rotates per-pixel "model-local" normals by
ent_rot[entity] — which IS the char entity's world rotation — so sn
passes through unchanged and the recovered world normal is exact.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .raster import CLUSTER


class CharSkin(NamedTuple):
    """Static (device-constant) skinning tables for ONE skinned model
    shared by all character rigs (built by build_char_skin)."""

    # combined corner rows: main corner-major (3·Tp) then shadow
    # record-order (C-shared, 3·Ts) — one LBS matmul covers both
    pos: jnp.ndarray        # (R, 3) rest positions
    nrm: jnp.ndarray        # (R, 3) rest normals
    blend: jnp.ndarray      # (R, J) dense LBS blend matrix
    n_main: int             # Tp: cluster-padded main faces
    n_shadow: int           # Ts: coarsest-LOD shadow faces
    pad_mask: jnp.ndarray   # (Tp,) bool — degenerate pad faces
    char_ents: jnp.ndarray  # (C,) int32 entity slot per char rig
    # host-side row bookkeeping for the rigid tables being replaced
    sh_face_row0: tuple     # (C,) first row of each char's faces in
                            # rt.shadow_faces (corner rows = 3× this)
    vert_row0: tuple        # (C,) first row of each char's verts in
                            # rt.verts (single-env vertex substitution)
    n_verts: int            # V: model verts per char instance
    # vertex-level tables (single-env / member-path substitution)
    vpos: jnp.ndarray       # (V, 3)
    vnrm: jnp.ndarray       # (V, 3)
    vblend: jnp.ndarray     # (V, J)


def linear_joint_weights(verts: np.ndarray, joint_y: np.ndarray,
                         k: int = 4):
    """Smooth 1-D weight painting for column-like rigs: hat functions
    centered at each joint's rest height, normalized — the asset-less
    stand-in for glTF's authored weights (gltf.c skins provide
    JOINTS_0/WEIGHTS_0; procedural rigs need a rule). Returns
    (weights (V, 4), jidx (V, 4) int32)."""
    y = np.asarray(verts, np.float32)[:, 1]
    jy = np.asarray(joint_y, np.float32)
    J = len(jy)
    span = np.diff(jy).mean() if J > 1 else 1.0
    d = np.abs(y[:, None] - jy[None, :]) / max(span, 1e-6)
    w = np.clip(1.0 - d, 0.0, None) ** 1.5
    # ends extend: below joint 0 / above the last joint bind rigidly
    w[:, 0] = np.where(y <= jy[0], 1.0, w[:, 0])
    w[:, -1] = np.where(y >= jy[-1], 1.0, w[:, -1])
    order = np.argsort(-w, axis=1)[:, :k]
    wk = np.take_along_axis(w, order, axis=1)
    wk = wk / np.maximum(wk.sum(1, keepdims=True), 1e-8)
    pad = k - order.shape[1]
    if pad > 0:
        order = np.pad(order, ((0, 0), (0, pad)))
        wk = np.pad(wk, ((0, 0), (0, pad)))
    return wk.astype(np.float32), order.astype(np.int32)


def build_char_skin(rt, model, weights, jidx, n_joints: int,
                    char_entities) -> CharSkin:
    """Host build. ``model`` is the SAME ModelData instance the char
    entities carry in ``build_render_tables(models,…)`` (vertex order
    must match for the substitution paths); ``weights``/``jidx`` are
    its per-vertex 4-bone LBS data; ``char_entities`` lists the entity
    slot of each character rig (GameWorld.char_entity order = the
    joint_mats C axis)."""
    from ..anim.skin import blend_matrix

    ce = np.asarray(char_entities, np.int64)
    v = np.asarray(model.verts, np.float32)
    n = np.asarray(model.normals, np.float32)
    V = v.shape[0]
    f = np.asarray(model.lod_faces[0], np.int64).reshape(-1, 3)
    # cluster-pad with degenerate (v0, v0, v0) faces — zero area, the
    # record builders reject them on their own; valid additionally
    # masks them (belt and braces: comp rows aren't cluster-compacted)
    padn = (-len(f)) % CLUSTER
    pad_rows = np.repeat(f[:1] * 0, padn, axis=0) if padn else \
        np.zeros((0, 3), np.int64)
    fp = np.concatenate([f, pad_rows])
    Tp = len(fp)
    pad_mask = np.arange(Tp) >= len(f)

    # main rows: corner-major [all v0 | all v1 | all v2]
    main_idx = fp.T.reshape(-1)
    # shadow rows: record order (v0, v2, v1) over the coarsest LOD —
    # must match the rows build_render_tables emitted for the char
    # entities in shadow_corner_rest
    fs = np.asarray(model.lod_faces[-1], np.int64).reshape(-1, 3)
    sh_idx = fs[:, [0, 2, 1]].reshape(-1)
    rows = np.concatenate([main_idx, sh_idx])

    W = np.asarray(blend_matrix(jnp.asarray(weights), jnp.asarray(jidx),
                                n_joints))

    # bookkeeping vs the rigid tables (contiguous per entity by
    # construction of build_render_tables' append order)
    ve = np.asarray(rt.vert_entity)
    sfe = np.asarray(rt.shadow_face_entity)
    vert_row0, sh_row0 = [], []
    for e in ce:
        vr = np.nonzero(ve == e)[0]
        assert len(vr) == V, (
            f"entity {e}: {len(vr)} instance verts != model V={V} — "
            "pass the same ModelData used in build_render_tables")
        vert_row0.append(int(vr[0]))
        sr = np.nonzero(sfe == e)[0]
        assert len(sr) == len(fs), (
            f"entity {e}: shadow stream rows {len(sr)} != coarsest LOD "
            f"{len(fs)}; is the char marked entity_shadow_static?")
        sh_row0.append(int(sr[0]))

    return CharSkin(
        pos=jnp.asarray(v[rows]), nrm=jnp.asarray(n[rows]),
        blend=jnp.asarray(W[rows]),
        n_main=Tp, n_shadow=len(fs),
        pad_mask=jnp.asarray(pad_mask),
        char_ents=jnp.asarray(ce.astype(np.int32)),
        sh_face_row0=tuple(sh_row0), vert_row0=tuple(vert_row0),
        n_verts=V,
        vpos=jnp.asarray(v), vnrm=jnp.asarray(n),
        vblend=jnp.asarray(W),
    )


def _lbs_columns(cs: CharSkin, joint_mats):
    """One MXU blend for every corner row × (env, char) instance.

    joint_mats: (B, C, J, 4, 4) char-LOCAL skinning matrices
    (GameSessionState.joint_mats). Returns (s, sn): lists of three
    (R, B, C) component arrays — LBS position / normal columns."""
    B, C, J = joint_mats.shape[0], joint_mats.shape[1], joint_mats.shape[2]
    BC = B * C
    # (B, C, J, 12) → (J, 12, B·C): component-major lanes (each of the
    # 12 slices below is a full (R, B·C) lane block — no padding)
    pT = jnp.transpose(joint_mats[:, :, :, :3, :].reshape(B, C, J, 12),
                       (2, 3, 0, 1)).reshape(J, 12 * BC)
    bl = jnp.einsum("rj,jm->rm", cs.blend, pT,
                    precision=jax.lax.Precision.HIGHEST)   # (R, 12·BC)
    R = bl.shape[0]

    def comp(k):
        return bl[:, k * BC:(k + 1) * BC].reshape(R, B, C)

    px, py, pz = (cs.pos[:, i:i + 1, None] for i in range(3))
    nx, ny, nz = (cs.nrm[:, i:i + 1, None] for i in range(3))
    s = [comp(4 * i) * px + comp(4 * i + 1) * py + comp(4 * i + 2) * pz
         + comp(4 * i + 3) for i in range(3)]
    sn = [comp(4 * i) * nx + comp(4 * i + 1) * ny + comp(4 * i + 2) * nz
          for i in range(3)]
    return s, sn


def skin_records(cs: CharSkin, joint_mats, entity_mx, views, proj,
                 entity_visible):
    """Per-frame skinned ranges for the cluster-record composed path.

    Returns (comp_skin (B, 21, C·Tp), valid (B, C·Tp),
    ent (B, C·Tp) int32, sh_world (B, C, 3·Ts, 3))."""
    hi = jax.lax.Precision.HIGHEST
    B, C = joint_mats.shape[0], joint_mats.shape[1]
    Tp, Ts = cs.n_main, cs.n_shadow
    s, sn = _lbs_columns(cs, joint_mats)

    emx = entity_mx[:, cs.char_ents]                        # (B, C, 4, 4)
    vp = jnp.einsum("ij,bjk->bik", proj, views, precision=hi)
    G = jnp.einsum("bij,bcjk->bcik", vp, emx, precision=hi)  # (B, C, 4, 4)

    sm = [c[:3 * Tp] for c in s]
    snm = [c[:3 * Tp] for c in sn]
    # clip rows j over main corner rows: (3Tp, B, C)
    clip = [G[None, :, :, j, 0] * sm[0] + G[None, :, :, j, 1] * sm[1]
            + G[None, :, :, j, 2] * sm[2] + G[None, :, :, j, 3]
            for j in range(4)]

    def col(a, corner):
        # (3Tp, B, C) corner-major → corner slice → (B, C·Tp)
        return jnp.transpose(a[corner * Tp:(corner + 1) * Tp],
                             (1, 2, 0)).reshape(B, C * Tp)

    comp = jnp.stack(
        [col(comp_src, c) for c in range(3)
         for comp_src in (clip[0], clip[1], clip[2], clip[3],
                          snm[0], snm[1], snm[2])], axis=1)  # (B, 21, C·Tp)

    vis = jnp.take(entity_visible, cs.char_ents, axis=1)     # (B, C)
    valid = (vis[:, :, None]
             & ~cs.pad_mask[None, None, :]).reshape(B, C * Tp)
    ent = jnp.broadcast_to(
        jnp.repeat(cs.char_ents, Tp)[None, :], (B, C * Tp)).astype(jnp.int32)

    # shadow rows: char-world transform only (3Ts, B, C) per component
    ss = [c[3 * Tp:] for c in s]
    M = emx[:, :, :3, :]                                     # (B, C, 3, 4)
    wsh = [M[None, :, :, i, 0] * ss[0] + M[None, :, :, i, 1] * ss[1]
           + M[None, :, :, i, 2] * ss[2] + M[None, :, :, i, 3]
           for i in range(3)]
    sh_world = jnp.stack(
        [jnp.transpose(w, (1, 2, 0)) for w in wsh], axis=-1)  # (B,C,3Ts,3)
    return comp, valid, ent, sh_world


def apply_shadow_skin(shadow_corner_verts, cs: CharSkin, sh_world):
    """Overwrite each char's rows of the per-env world shadow corner
    stream with its skinned corners (the rigid one-hot transform put
    rest-pose rows there)."""
    out = shadow_corner_verts
    for c, f0 in enumerate(cs.sh_face_row0):
        out = jax.lax.dynamic_update_slice(
            out, sh_world[:, c], (0, 3 * f0, 0))
    return out


def skin_vertex_rows(cs: CharSkin, joint_mats, entity_mx):
    """Vertex-level skinned WORLD rows for the member-granularity
    paths (the char's instance-vertex block gets replaced). joint_mats:
    (C, J, 4, 4) single env or (B, C, J, 4, 4). Returns world positions
    ((…,) C, V, 3) and char-local normals (…, C, V, 3)."""
    from ..anim.skin import skin_verts_batch

    single = joint_mats.ndim == 4
    jm = joint_mats[None] if single else joint_mats
    B, C = jm.shape[0], jm.shape[1]
    sv, snl = skin_verts_batch(jm.reshape(B * C, *jm.shape[2:]),
                               cs.vpos, cs.vnrm,
                               None, None, blend=cs.vblend)
    sv = sv.reshape(B, C, cs.n_verts, 3)
    snl = snl.reshape(B, C, cs.n_verts, 3)
    emx = (entity_mx[None] if single else entity_mx)[:, cs.char_ents]
    w = jnp.einsum("bcij,bcvj->bcvi", emx[:, :, :3, :3], sv) \
        + emx[:, :, None, :3, 3]
    if single:
        return w[0], snl[0]
    return w, snl
