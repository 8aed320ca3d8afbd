"""TPU tile rasterizer (replaces the GL/Metal/WebGPU draw path,
render-*.c + models_render model.c:742-1086).

Architecture (not a port — there is no hardware rasterizer to call):

1. **Vertex stage** (XLA/MXU): world → clip transforms are batched
   matmuls outside this module; the rasterizer takes screen-space
   triangles.
2. **Binning** (XLA sort): each triangle emits (tile, tri) pairs for the
   tiles its bbox overlaps (capped span); pairs are sorted by tile and
   regrouped into a dense (n_tiles, MAX_PER_TILE) list. Triangles whose
   bbox exceeds the span cap go to a small "big triangle" list that every
   tile also walks — few, but they'd otherwise need unbounded fan-out.
3. **Raster kernel** (Pallas): one program per 8×128 pixel tile (lane
   aligned); walks its triangle list, evaluates edge functions on the
   pixel lattice, z-tests, and writes a deferred G-buffer: depth, tri id,
   perspective-correct barycentrics. Shading happens in a separate fused
   elementwise pass over the G-buffer (render/shade.py) — keeping the
   raster inner loop lean is what makes the 16 Gpix/s budget reachable.

Depth convention: NDC z in [-1, 1], smaller = closer (GL style, matching
mat4_perspective). Background depth = +inf, tri id = -1.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.gatherx import gather_rows

TILE_H = 32           # default tile (large targets)
TILE_W = 256
MAX_PER_TILE = 1024
MAX_SPAN_X = 8       # bbox span cap in tiles (beyond → big-tri list)
MAX_SPAN_Y = 8
MAX_BIG_TRIS = 512

# per-tri record layout: 3 × [x, y, z, 1/w] (+ tid, + optional cb).
# Record streams travel TRANSPOSED — (C, T), component rows over a
# packed triangle lane axis — because a (T, 13) layout lane-pads
# 13 → 128 (10× HBM waste on every elementwise record pass; the
# composed 16-env trace spent ~25 ms/frame in record-stream
# reshapes/copies before this). The per-tile cluster records the
# kernel consumes are built tri-major by records_to_coeffs at the end.
_XC = (0, 4, 8)
_YC = (1, 5, 9)
_ZC = (2, 6, 10)
_WC = (3, 7, 11)


def tile_dims(width: int, height: int) -> tuple:
    """Tile dims: the r4 on-device sweep (composed testbed, 16 envs ×
    256², kernel-only) measured 1.49 (32×256) / 1.11 (16×256) / 1.46
    (8×256) / 1.82 (8×128) ms/env — 16-row tiles halve the pixel
    lattice each walked record pays for, and beyond that the per-grid-
    step fixed cost (tile record DMA ∝ n_tiles·cap) wins. Large targets
    (720p+) keep 32×256: their grids are already past the fixed-cost
    knee. Tiny targets (test images) drop to 8×128. (An in-kernel
    sub-slab skip — ref-accumulated planes + per-8-row y-extent tests —
    measured SLOWER than this policy: the read-modify-write of the
    output slabs per chunk beats the skipped lattice math.)"""
    if width >= 256 and height >= 128:
        return (16, 256) if height <= 512 else (32, 256)
    return 8, 128


def tile_subcols(tile_w: int) -> int:
    """Sub-columns walked independently inside ONE kernel grid step.

    The r5 sweep decomposed the main-raster chain at 16 envs into
    0.757 ms/env of list walk (each walked record pays the full
    (tile_h, tile_w) pixel lattice) + 0.465 ms/env fixed; finer tiles
    halve the walk but the per-grid-step fixed cost made 16×128 tiles
    measure WORSE end-to-end. Splitting the 256-wide tile into two
    128-px sub-columns — each with its own binned list, walked
    sequentially in the same grid step — halves the lattice per record
    while paying the invocation/output fixed cost once. 128 px is the
    floor: narrower accumulators under-fill the 128-lane VPU."""
    return tile_w // 128 if tile_w >= 256 else 1


def tile_capacity(width: int, height: int) -> int:
    """Per-tile triangle capacity: scaled up when the target has few
    tiles so dense scenes don't hit the cap (depth-ordered binning makes
    overflow graceful, but deeper lists avoid it entirely). 3× (not 4×)
    at few tiles: the per-tile record prefetch scales with cap, and the
    r4 sweep measured cap 4096 → 3072 at ~0.14 ms/env with the densest
    composed tile at 2640 records."""
    th, tw = tile_dims(width, height)
    n_tiles = pl.cdiv(width, tw) * pl.cdiv(height, th)
    return MAX_PER_TILE * 3 if n_tiles < 24 else MAX_PER_TILE


class GBuffer(NamedTuple):
    depth: jnp.ndarray    # (H, W) f32, +inf background
    tri_id: jnp.ndarray   # (H, W) i32, -1 background
    bary: jnp.ndarray     # (H, W, 2) perspective-correct b0, b1


def project_to_screen(clip: jnp.ndarray, width: int, height: int):
    """Clip-space (V, 4) → screen x/y (V,), ndc z (V,), 1/w (V,).

    y is flipped so pixel (0,0) is top-left (image convention)."""
    w = clip[..., 3]
    # sign-preserving clamp: a vertex ON the camera plane (w = ±0) must
    # stay on its side, or behind-camera vertices sneak past the
    # iw > 0 validity test with ~1e9-scale garbage screen coordinates
    w_safe = jnp.where(jnp.abs(w) < 1e-9,
                       jnp.where(w < 0, -1e-9, 1e-9), w)
    iw = 1.0 / w_safe
    ndc = clip[..., :3] * iw[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    return sx, sy, ndc[..., 2], iw


ENT_PACK = 128   # default tid-column entity packing stride (extras
                 # mode): packed = sub_tri_id · stride + entity. Float
                 # tri ids are exact below 2^24, so the mode requires
                 # n_records · stride < 2^24 (T ≤ 65536 for the 2T clip
                 # stream at stride 128). Callers with few entities pass
                 # a smaller power-of-two stride (ent_pack_stride) to
                 # raise the triangle cap proportionally; beyond the cap
                 # they fall back to the gather path.


def ent_pack_stride(n_ent: int) -> int:
    """Smallest power-of-two packing stride covering n_ent entity ids
    (≥ 2 so background -1 never collides with a packed id's low bits)."""
    return max(2, 1 << (int(n_ent) - 1).bit_length())


def corner_records(c0, c1, c2, valid_mask=None, two_sided: bool = False,
                   cb=None):
    """Records from PER-CORNER [x, y, z, 1/w] rows (T, 4) — the no-gather
    path for streams that are already per-triangle (clipped sub-tris,
    particle quads). Corner order is FACE order (v0, v1, v2).

    cb (T, 3, 2): optional per-corner barycentrics w.r.t. an ORIGINAL
    triangle (near-plane clipping) — appended to the record (cols 13-18,
    record-corner order) so records_to_coeffs folds them into the
    kernel's perspective weights and the G-buffer bary comes out already
    composed."""
    tri_f = jnp.arange(c0.shape[0], dtype=jnp.float32)
    # v1/v2 swap: the screen y-flip turns GL/world CCW into image-space
    # CW; swapping restores positive kernel area for front faces (GL
    # front-face = CCW parity)
    cols = [c0[:, i] for i in range(4)] + [c2[:, i] for i in range(4)] \
        + [c1[:, i] for i in range(4)] + [tri_f]
    if cb is not None:
        cols += [cb[:, 0, 0], cb[:, 0, 1], cb[:, 2, 0], cb[:, 2, 1],
                 cb[:, 1, 0], cb[:, 1, 1]]
    return _finish_records(cols, valid_mask, two_sided)


def expand_corners_record(table, faces):
    """Host/static corner expansion in RECORD order — rows
    [t·3+0, t·3+1, t·3+2] = (v0, v2, v1) of face t — the order
    assemble_tri_records gathers. Expanding the SOURCE table once
    (static geometry) turns the per-frame 3T-row corner gather
    (~7-10 ns/row, 8.7 ms on the dense 720p trace) into a reshape."""
    import numpy as np
    f = np.asarray(faces)
    return table[f[:, [0, 2, 1]].reshape(-1)]


def expand_corners_major(table, faces):
    """Corner-MAJOR expansion — [all v0 | all v1 | all v2] — the order
    clip_near_records gathers (its per-corner columns are contiguous
    slices of this layout)."""
    import numpy as np
    f = np.asarray(faces)
    return table[f.T.reshape(-1)]


def assemble_tri_records(sx, sy, z, iw, faces, valid_mask=None,
                         two_sided: bool = False, vextra=None,
                         tid_pack=None, pack_stride: int = ENT_PACK,
                         pre_expanded: bool = False):
    """Build the packed (T, 12) per-triangle record the kernel consumes:
    three [x, y, z, 1/w] vertex groups (_XC/_YC/_ZC/_WC columns). One
    packed (V, 4) vertex table keeps this to 3 wide gathers. Also
    returns per-tri validity (area > 0 i.e. front-facing CCW, w>0 at all
    corners, caller mask).

    two_sided: instead of culling back faces, swap their v1/v2 groups so
    the kernel's CCW test accepts them (shadow passes are two-sided
    without doubling the triangle count).

    vextra (V, 3), optional: per-vertex extra components (normals) — the
    kernel-side attribute-interpolation mode (records_to_coeffs_extras).
    Appended as record cols 13-21 in record-corner order; rides the same
    single corner gather. Incompatible with two_sided (the back-face
    swap permutation targets the cb layout).

    tid_pack (T,), optional int: packs into the tid column as
    tid·ENT_PACK + tid_pack (per-pixel entity id without a gather).

    pre_expanded: sx/sy/z/iw (and vextra) are ALREADY corner streams of
    length 3T in record order (expand_corners_record) — the per-frame
    corner gather is skipped entirely (static geometry expands its
    source tables once; the per-frame cost becomes transforming 3T rows
    instead of V, pure vector math)."""
    n_tris = faces.shape[0] if not pre_expanded else sx.shape[0] // 3
    tri_f = jnp.arange(n_tris, dtype=jnp.float32)
    if tid_pack is not None:
        tri_f = tri_f * pack_stride + tid_pack.astype(jnp.float32)
    # v1/v2 swap: the screen y-flip turns GL/world CCW into image-space
    # CW; swapping restores positive kernel area for front faces (GL
    # front-face = CCW parity). ONE gather_rows over the corner order
    # [v0, v2, v1]: stays a fast-path gather when vrec is per-env under
    # vmap (three batched-operand gathers here cost 4.1 ms @ 16 envs)
    if not pre_expanded:
        corner_idx = faces[:, jnp.array([0, 2, 1])].reshape(-1)   # (3T,)
    if vextra is None:
        vrec = jnp.stack([sx, sy, z, iw], axis=-1)        # (V|3T, 4)
        corners = vrec.reshape(n_tris, 12) if pre_expanded else \
            gather_rows(vrec, corner_idx).reshape(n_tris, 12)
        cols = [corners[:, i] for i in range(12)] + [tri_f]
        return _finish_records(cols, valid_mask, two_sided)
    assert not two_sided, "extras mode is front-face only"
    vrec = jnp.concatenate(
        [jnp.stack([sx, sy, z, iw], axis=-1), vextra], axis=-1)  # (V, 7)
    nc = vrec.shape[-1]
    corners = vrec.reshape(n_tris, 3 * nc) if pre_expanded else \
        gather_rows(vrec, corner_idx).reshape(n_tris, 3 * nc)
    cols = [corners[:, c * nc + i] for c in range(3) for i in range(4)] \
        + [tri_f] \
        + [corners[:, c * nc + 4 + i] for c in range(3) for i in range(3)]
    return _finish_records(cols, valid_mask, two_sided)


def _finish_records(cols, valid_mask, two_sided):
    # (float tri ids are exact below 2^24 — they ride the kernel's
    # winner-select chain so no per-pixel id gather is ever needed)
    # cols is a list of (T,) record columns in packed order. They pack
    # into the (C, T) record ONCE here, and every subsequent op is a
    # whole-(C, T) array op (static row permutation + masked where):
    # per-column (T,) selects materialize 1-D arrays, which TPU lays
    # out sublane-padded — measured 19 ms/frame on the 16-env composed
    # trace vs ~2 ms for this form.
    rec = jnp.stack(cols)                                 # (C, T)
    C = len(cols)
    x0, y0 = rec[_XC[0]], rec[_YC[0]]
    x1, y1 = rec[_XC[1]], rec[_YC[1]]
    x2, y2 = rec[_XC[2]], rec[_YC[2]]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    if two_sided:
        # swap corner groups 1↔2 (and their cb pairs) for back faces
        perm = np.arange(C)
        perm[4:8], perm[8:12] = np.arange(8, 12), np.arange(4, 8)
        if C > 13:
            perm[15:17], perm[17:19] = np.arange(17, 19), np.arange(15, 17)
        rec = jnp.where((area < 0)[None, :], rec[perm], rec)
        ok = jnp.abs(area) > 1e-8
    else:
        ok = area > 1e-8
    # w>0 for all corners (no near-plane clipping in v1: crossing tris
    # drop). The upper bound rejects the sign-preserving w≈0 clamp from
    # project_to_screen (iw ≈ ±1e9); a real vertex has iw ≤ 1/znear.
    w0, w1, w2 = rec[_WC[0]], rec[_WC[1]], rec[_WC[2]]
    ok = ok & (w0 > 0) & (w1 > 0) & (w2 > 0) \
        & (jnp.maximum(jnp.maximum(w0, w1), w2) < 1e8)
    z0, z1, z2 = rec[_ZC[0]], rec[_ZC[1]], rec[_ZC[2]]
    ok = ok & (jnp.minimum(jnp.minimum(z0, z1), z2) <= 1.0) \
        & (jnp.maximum(jnp.maximum(z0, z1), z2) >= -1.0)
    if valid_mask is not None:
        ok = ok & valid_mask
    # degenerate-out invalid records (zero coords → zero area → the
    # kernel rejects them): cluster binning walks whole clusters, so a
    # dead member's record must be inert on its own, not just unlisted
    rec = jnp.where(ok[None, :], rec, 0.0)
    return rec, ok


def clip_near_records(clip_verts, faces, width: int, height: int,
                      valid_mask=None, two_sided: bool = False,
                      w_eps: float = 1e-4, vextra=None, tid_pack=None,
                      pack_stride: int = ENT_PACK,
                      pre_expanded: bool = False, components=None):
    """Near-plane clipping (the GL hardware-clip analogue the v1 raster
    skipped — crossing triangles used to drop, raster.py r1): clip each
    triangle against w = w_eps in CLIP space into ≤2 sub-triangles,
    emitted into a static 2T record stream (slot B is degenerate unless
    the quad case hits). Returns (rec (2T, 13) with tri id = SUB index,
    ok (2T,), csrc (2T,) original face index, cbary (2T, 3, 2) each
    sub-corner's barycentrics w.r.t. its ORIGINAL triangle — corner
    attributes are barycentric combinations, so the per-pixel stage
    needs no changes and stays perspective-correct (attributes are
    linear over the triangle's plane).

    vextra (V, 3), optional: per-vertex extra components (normals) for
    the kernel-side interpolation mode. They lerp through the SAME clip
    parameter t as positions — a clip-space lerp at t lands on the 3D
    point at segment fraction t (projection is linear pre-divide), and
    vertex attributes are linear along the 3D edge, so the lerped value
    IS the attribute at the clip point. Emitted as record cols 13-21
    (record-corner order) instead of the cb pairs — extras mode never
    reads bary, so the cb fold is unnecessary. tid_pack (T,): packs
    entity ids into the tid column (see assemble_tri_records).

    pre_expanded: clip_verts (and vextra) are ALREADY corner-major
    streams of length 3T (expand_corners_major) — skips the per-frame
    corner gather (see assemble_tri_records).

    components: fully pre-built per-corner component columns
    ``[[x, y, z, w(, extras…)] for each face corner]`` — 3 lists of NC
    (T,) arrays in CLIP space. The caller already holds columnar
    per-corner data (scenerender.assemble_cluster_records_batch
    transforms rest-pose cluster rows straight to clip components), so
    no gather, no transpose, no slicing happens here at all. Overrides
    clip_verts/faces/vextra."""
    assert not (two_sided and vextra is not None), \
        "extras mode is front-face only"
    if components is not None:
        v = components
        T = v[0][0].shape[0]
        NC = len(v[0])
    else:
        T = faces.shape[0] if not pre_expanded else clip_verts.shape[0] // 3
        # COLUMNAR throughout: every intermediate is a (T,) lane-packed
        # array. The previous (T, 3, 4)/(T, 3, 2) formulation lane-padded
        # (3, 4) → (8, 128) — a 32× HBM blow-up on every materialized
        # intermediate (~7 ms/frame of the 16-env composed trace).
        # ONE corner gather in corner-major order so per-corner columns
        # are contiguous slices: [all v0 | all v1 | all v2].
        NC = 4 if vextra is None else 4 + vextra.shape[-1]
        src = clip_verts if vextra is None else \
            jnp.concatenate([clip_verts, vextra], axis=-1)
        g = src if pre_expanded else \
            gather_rows(src, faces.T.reshape(-1))         # (3T, NC)
        # ONE transpose to component-major, then every per-component
        # column is a contiguous row slice. Slicing columns directly out
        # of the (3T, NC) layout re-read the lane-padded rows 3·NC times
        # — 9.1 ms of the 16-env composed trace lived on that one line.
        gt = g.T                                          # (NC, 3T)
        v = [[gt[i, c * T:(c + 1) * T] for i in range(NC)]
             for c in range(3)]
    w = [v[c][3] for c in range(3)]
    inside = [wc > w_eps for wc in w]
    n_in = (inside[0].astype(jnp.int32) + inside[1].astype(jnp.int32)
            + inside[2].astype(jnp.int32))

    # rotate so the distinguished vertex is FIRST:
    #   n_in==1 → the single inside vertex; n_in==2 → the single outside
    one_in = n_in == 1
    k_in = jnp.where(inside[0], 0, jnp.where(inside[1], 1, 2))
    k_out = jnp.where(~inside[0], 0, jnp.where(~inside[1], 1, 2))
    k_rot = jnp.where(one_in, k_in, k_out)   # (T,)
    s0 = k_rot == 0
    s1 = k_rot == 1
    s2 = k_rot == 2

    def pick(c0, c1, c2):
        return jnp.where(s0, c0, jnp.where(s1, c1, c2))

    # rotated corners A=v[k], B=v[k+1], C=v[k+2] (mod 3), per component
    A = [pick(v[0][i], v[1][i], v[2][i]) for i in range(NC)]
    B = [pick(v[1][i], v[2][i], v[0][i]) for i in range(NC)]
    C = [pick(v[2][i], v[0][i], v[1][i]) for i in range(NC)]
    # canonical corner barys v0=(1,0) v1=(0,1) v2=(0,0), rotated
    bA = [jnp.where(s0, 1.0, 0.0), jnp.where(s1, 1.0, 0.0)]
    bB = [jnp.where(s2, 1.0, 0.0), jnp.where(s0, 1.0, 0.0)]
    bC = [jnp.where(s1, 1.0, 0.0), jnp.where(s2, 1.0, 0.0)]
    wA, wB, wC = A[3], B[3], C[3]

    def isect(p, q, wp, wq, bp, bq):
        t = (w_eps - wp) / jnp.where(wq - wp == 0, 1.0, wq - wp)
        t = jnp.clip(t, 0.0, 1.0)
        return ([p[i] + t * (q[i] - p[i]) for i in range(NC)],
                [bp[i] + t * (bq[i] - bp[i]) for i in range(2)])

    iAB, bAB = isect(A, B, wA, wB, bA, bB)
    iCA, bCA = isect(C, A, wC, wA, bC, bA)

    # slot A triangle:
    #   3 in → (A, B, C); 1 in (A inside) → (A, iAB, iCA);
    #   2 in (A outside) → (iAB, B, C)
    all_in = n_in == 3
    two = n_in == 2
    tA0 = [jnp.where(two, iAB[i], A[i]) for i in range(NC)]
    tA1 = [jnp.where(one_in, iAB[i], B[i]) for i in range(NC)]
    tA2 = [jnp.where(one_in, iCA[i], C[i]) for i in range(NC)]
    bA0 = [jnp.where(two, bAB[i], bA[i]) for i in range(2)]
    bA1 = [jnp.where(one_in, bAB[i], bB[i]) for i in range(2)]
    bA2 = [jnp.where(one_in, bCA[i], bC[i]) for i in range(2)]
    okA = n_in > 0
    # slot B: only the quad case → quad (iAB, B, C, iCA) second tri
    # (iAB, C, iCA)
    tB0, tB1, tB2 = iAB, C, iCA
    bB0, bB1, bB2 = bAB, bC, bCA
    okB = two

    csrc = jnp.concatenate([jnp.arange(T, dtype=jnp.int32)] * 2)
    ok = jnp.concatenate([okA, okB])
    if valid_mask is not None:
        ok = ok & jnp.concatenate([valid_mask] * 2)

    def proj_corner(slotA, slotB):
        """Columnar project of one record corner over the 2T stream."""
        x = jnp.concatenate([slotA[0], slotB[0]])
        y = jnp.concatenate([slotA[1], slotB[1]])
        z = jnp.concatenate([slotA[2], slotB[2]])
        wc = jnp.concatenate([slotA[3], slotB[3]])
        w_safe = jnp.where(jnp.abs(wc) < 1e-9,
                           jnp.where(wc < 0, -1e-9, 1e-9), wc)
        iw = 1.0 / w_safe
        return [(x * iw * 0.5 + 0.5) * width,
                (0.5 - y * iw * 0.5) * height, z * iw, iw]

    p0 = proj_corner(tA0, tB0)
    p1 = proj_corner(tA1, tB1)
    p2 = proj_corner(tA2, tB2)
    tid = jnp.arange(2 * T, dtype=jnp.float32)
    if tid_pack is not None:
        tid = tid * pack_stride \
            + jnp.concatenate([tid_pack] * 2).astype(jnp.float32)
    if NC > 4:
        # extras layout (22 cols): no cb pairs — extras mode never reads
        # bary. Record-corner order (v0, v2, v1), 3 components each.
        excols = [jnp.concatenate([sa[4 + i], sb[4 + i]])
                  for sa, sb in ((tA0, tB0), (tA2, tB2), (tA1, tB1))
                  for i in range(3)]
        rec, ok2 = _finish_records(p0 + p2 + p1 + [tid] + excols, ok,
                                   two_sided)
        return rec, ok2, csrc, None
    cbcols = [jnp.concatenate([a, b])
              for a, b in zip(bA0 + bA1 + bA2, bB0 + bB1 + bB2)]
    # record corner order (v0, v2, v1) + cb pairs in the same order
    cols = p0 + p2 + p1 + [tid] \
        + cbcols[0:2] + cbcols[4:6] + cbcols[2:4]
    rec, ok2 = _finish_records(cols, ok, two_sided)
    # packed cbary kept for API compat (tests; DCE'd in the jit path)
    cbary = jnp.stack(
        [jnp.stack([cbcols[0], cbcols[1]], -1),
         jnp.stack([cbcols[2], cbcols[3]], -1),
         jnp.stack([cbcols[4], cbcols[5]], -1)], axis=1)   # (2T, 3, 2)
    return rec, ok2, csrc, cbary


NCOEF = 24    # coefficient-record width (8 records × 24 = 3 vregs)


def records_to_coeffs(rec, cluster: int = None):
    """(T, 13[+6]) raw vertex records → (T, 24) screen-plane coefficient
    records: per edge k the affine form e_k(px,py) = a_k·px + b_k·py +
    c_k, the z-plane (za, zb, zc), and the perspective-weight coefficient
    triples so the kernel's inner loop is pure FMA work — no per-pixel
    divides, no vertex differences.

    Columns: a0,b0,c0, a1,b1,c1, a2,b2,c2, za,zb,zc, d0A,d0B,d0C,
    d1A,d1B,d1C, sA,sB,sC, tid, zmin, pad — where the d0/d1/s attribute
    planes are PIXEL-basis affine forms (d = A·px + B·py + C, composed
    from Σ e_k·q_k below) and face bary b = (d0/s, d1/s). q folds
    the optional per-corner ORIGINAL-triangle barycentrics (record cols
    13-18, from near-plane clipping) so clipped sub-triangles emit bary
    already composed w.r.t. their source triangle — no per-pixel cbary
    gather (a batched-operand gather cost ~29 ms/frame-batch at 64
    envs). Without cb the fold is the identity (record corners are
    face v0, v2, v1). Invalid records get c_k = -1 so every pixel fails
    the e_k ≥ 0 test.

    EXTRAS layout (22 record cols, from vextra= in the record builders):
    cols 13-21 are three per-corner extra components (normals) instead
    of cb pairs. The q/s coefficient slots become perspective-correct
    attribute-interpolation planes: q0_k = p_k·ex_k[0], q1_k =
    p_k·ex_k[1], s_k = p_k·ex_k[2], so the kernel's d0/d1/s outputs are
    Σ b_screen_k·iw_k·ex_k = iw_px · (perspective-correct interpolated
    extra) — a positive per-pixel scalar times the true attribute, so
    normalize() downstream recovers the EXACT perspective-correct unit
    normal with no per-pixel divide and NO per-pixel attr gather (the
    gather was ~30 ms/frame-batch at 64 envs — the ~2k env-fps floor of
    gather-based deferred shading, ROUND_NOTES r3).

    Input records are the TRANSPOSED (C, T) stream; output is tri-major
    (T, 24) — the one layout change, feeding the per-tile cluster
    gather + kernel blocks directly."""
    x0, y0, z0, iw0 = rec[0], rec[1], rec[2], rec[3]
    x1, y1, z1, iw1 = rec[4], rec[5], rec[6], rec[7]
    x2, y2, z2, iw2 = rec[8], rec[9], rec[10], rec[11]
    tid = rec[12]
    extras = rec.shape[0] == 22
    if extras:
        ex = [[rec[13 + 3 * k + i] for i in range(3)] for k in range(3)]
        cb = None
    elif rec.shape[0] > 13:
        cb = [(rec[13 + 2 * k], rec[14 + 2 * k]) for k in range(3)]
    else:
        one = jnp.ones_like(tid)
        zero2 = jnp.zeros_like(tid)
        # identity: record corners are face v0, v2, v1
        cb = [(one, zero2), (zero2, zero2), (zero2, one)]
    a0 = y1 - y2
    b0 = x2 - x1
    c0 = (y2 - y1) * x1 - (x2 - x1) * y1
    a1 = y2 - y0
    b1 = x0 - x2
    c1 = (y0 - y2) * x2 - (x0 - x2) * y2
    a2 = y0 - y1
    b2 = x1 - x0
    c2 = (y1 - y0) * x0 - (x1 - x0) * y0
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    valid = area > 1e-8
    inv_area = 1.0 / jnp.where(valid, area, 1.0)
    za = (a0 * z0 + a1 * z1 + a2 * z2) * inv_area
    zb = (b0 * z0 + b1 * z1 + b2 * z2) * inv_area
    zc = (c0 * z0 + c1 * z1 + c2 * z2) * inv_area
    p = [iw0 * inv_area, iw1 * inv_area, iw2 * inv_area]
    if extras:
        q0 = [p[k] * ex[k][0] for k in range(3)]
        q1 = [p[k] * ex[k][1] for k in range(3)]
        s_ = [p[k] * ex[k][2] for k in range(3)]
    else:
        q0 = [p[k] * cb[k][0] for k in range(3)]
        q1 = [p[k] * cb[k][1] for k in range(3)]
        s_ = p

    # compose the attribute planes into PIXEL basis (d = A·px + B·py +
    # C, like the z-plane): d = Σ e_k·q_k with e_k affine in (px, py)
    # is itself affine. Composed here in the cheap (T,) column domain,
    # this cuts the kernel's attr work from 3 edge-FMAs to 2 pixel-FMAs
    # per plane AND decouples d0/d1/s from e_k (deeper ILP). Precision:
    # the composed C term carries ~|c_k·q_k| cancellation, so per-pixel
    # values gain ~1e-4 relative error vs the edge-basis form — the
    # same structure the z-plane always had; normals/bary consumers
    # renormalize downstream (r5 device sweep: −3% chain time —
    # the kernel is list-walk/DMA-bound, not plane-FLOP-bound).
    def pix(q):
        return (a0 * q[0] + a1 * q[1] + a2 * q[2],
                b0 * q[0] + b1 * q[1] + b2 * q[2],
                c0 * q[0] + c1 * q[1] + c2 * q[2])

    q0 = pix(q0)
    q1 = pix(q1)
    s_ = pix(s_)
    zero = jnp.zeros_like(a0)
    mone = jnp.full_like(a0, -1.0)
    # column 22: zmin (+inf for dead records) — the kernel's early-out
    # key: a tile whose every pixel is covered nearer than the (depth-
    # sorted) remainder of its list stops walking. With ``cluster`` the
    # reduction to CLUSTER zmin happens here in the cheap (T,) column
    # domain (an .at[:, 22].set afterwards would re-materialize the
    # whole lane-padded (T, 24) array).
    zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
    inf = jnp.full_like(a0, jnp.inf)
    zmin = jnp.where(valid, zmin, inf)
    if cluster:
        czmin = zmin.reshape(-1, cluster).min(axis=1)
        zmin = jnp.repeat(czmin, cluster)
        inf = zmin
    cols = [jnp.where(valid, v, d) for v, d in (
        (a0, zero), (b0, zero), (c0, mone),
        (a1, zero), (b1, zero), (c1, mone),
        (a2, zero), (b2, zero), (c2, mone),
        (za, zero), (zb, zero), (zc, zero),
        (q0[0], zero), (q0[1], zero), (q0[2], zero),
        (q1[0], zero), (q1[1], zero), (q1[2], zero),
        (s_[0], zero), (s_[1], zero), (s_[2], zero),
        (tid, tid), (zmin, inf), (zero, zero))]
    return _pack_coeffs(cols, cluster)


def _pack_coeffs(cols, cluster):
    """Column list → coefficient records. Without ``cluster``: (T, NC)
    tri-major (tests/oracle). With: the (Tc, cluster·NC) cluster-row
    layout the per-tile gather + kernel consume, built by ONE fused
    transpose from the (NC, T) columnar stack — stacking tri-major
    first put NC on the lane axis (padded ×128/NC) and paid a second
    relayout in the reshape (the two ops were ~4.3 ms of the 16-env
    composed trace)."""
    nc = len(cols)
    if not cluster:
        return jnp.stack(cols, axis=-1)
    arr = jnp.stack(cols, axis=0)                   # (NC, T): T on lanes
    Tc = arr.shape[1] // cluster
    return arr.reshape(nc, Tc, cluster).transpose(1, 2, 0) \
              .reshape(Tc, cluster * nc)


NCOEF_DEPTH = 16


def records_to_coeffs_depth(rec, cluster: int = None):
    """Depth-only coefficient records (T, 16): the 3 edge planes + the
    z-plane + per-tri zmin (col 12, the early-out key) + pad — shadow
    passes never read bary/perspective weights or triangle ids, so
    their record rows shrink vs the 24-wide main records (less per-tile
    pre-gather and kernel VMEM, ~40% less inner-loop FMA), and 16 cols
    × 8-tri clusters = exactly 128 lanes per cluster row."""
    # (C, T) in, (T, 12) out (see records_to_coeffs)
    x0, y0, z0 = rec[0], rec[1], rec[2]
    x1, y1, z1 = rec[4], rec[5], rec[6]
    x2, y2, z2 = rec[8], rec[9], rec[10]
    a0 = y1 - y2
    b0 = x2 - x1
    c0 = (y2 - y1) * x1 - (x2 - x1) * y1
    a1 = y2 - y0
    b1 = x0 - x2
    c1 = (y0 - y2) * x2 - (x0 - x2) * y2
    a2 = y0 - y1
    b2 = x1 - x0
    c2 = (y1 - y0) * x0 - (x1 - x0) * y0
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    valid = area > 1e-8
    inv_area = 1.0 / jnp.where(valid, area, 1.0)
    za = (a0 * z0 + a1 * z1 + a2 * z2) * inv_area
    zb = (b0 * z0 + b1 * z1 + b2 * z2) * inv_area
    zc = (c0 * z0 + c1 * z1 + c2 * z2) * inv_area
    zero = jnp.zeros_like(a0)
    mone = jnp.full_like(a0, -1.0)
    zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
    inf = jnp.full_like(a0, jnp.inf)
    zmin = jnp.where(valid, zmin, inf)
    if cluster:   # col 12 = CLUSTER zmin (see records_to_coeffs)
        czmin = zmin.reshape(-1, cluster).min(axis=1)
        zmin = jnp.repeat(czmin, cluster)
        inf = zmin
    cols = [jnp.where(valid, v, d) for v, d in (
        (a0, zero), (b0, zero), (c0, mone),
        (a1, zero), (b1, zero), (c1, mone),
        (a2, zero), (b2, zero), (c2, mone),
        (za, zero), (zb, zero), (zc, zero),
        (zmin, inf), (zero, zero), (zero, zero), (zero, zero))]
    return _pack_coeffs(cols, cluster)


def _raster_depth_kernel(width: int, height: int, tile_h: int, tile_w: int,
                         sub: int, chunk: int, count_ref, trec_ref, brec_ref,
                         depth_ref):
    """Depth-only tile kernel (shadow passes): edge/z planes, min-depth
    reduce, no winner attributes. ``sub`` sub-columns walked per grid
    step (see _raster_tile_kernel)."""
    ti = pl.program_id(0)
    ntx = pl.cdiv(width, tile_w)
    tx0 = (ti % ntx) * tile_w
    ty0 = (ti // ntx) * tile_h
    tws = tile_w // sub
    cap = trec_ref.shape[1] // sub
    big_count = count_ref[ti, sub]

    for sc in range(sub):
        px = (tx0 + sc * tws
              + jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tws), 2)
              ).astype(jnp.float32) + 0.5
        py = (ty0 + jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tws), 1)
              ).astype(jnp.float32) + 0.5

        def shade_chunk(slab, n_valid, depth):
            def col(i):
                return slab[:, i][:, None, None]
            e0 = col(0) * px + col(1) * py + col(2)
            e1 = col(3) * px + col(4) * py + col(5)
            e2 = col(6) * px + col(7) * py + col(8)
            z = col(9) * px + col(10) * py + col(11)
            valid = (jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1, 1), 0) < n_valid)
            zok = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & valid \
                & (z >= -1.0) & (z <= 1.0)
            zm = jnp.where(zok, z, jnp.inf)
            rd = zm[0]
            for c in range(1, chunk):
                rd = jnp.minimum(rd, zm[c])
            return jnp.minimum(rd, depth)

        count = count_ref[ti, sc]
        n_small = pl.cdiv(count, chunk)

        def small_cond(c):
            return (c[0] < n_small) & ~c[1]

        def small_body(c):
            k = c[0]
            slab = trec_ref[0, pl.ds(sc * cap + k * chunk, chunk), :]
            depth = shade_chunk(slab, count - k * chunk, c[2])
            # front-to-back early-out (see _raster_tile_kernel): once
            # every pixel's min depth is nearer than this chunk's
            # cluster zmin (col 12), the depth-sorted remainder can't
            # lower anything
            done = jnp.max(depth) < jnp.min(slab[:, 12]) - 1e-3
            return (k + jnp.int32(1), done, depth)

        def big_body(k, depth):
            slab = brec_ref[0, pl.ds(k * chunk, chunk), :]
            return shade_chunk(slab, big_count - k * chunk, depth)

        depth = jnp.full((tile_h, tws), jnp.inf, jnp.float32)
        depth = jax.lax.while_loop(
            small_cond, small_body, (jnp.int32(0), jnp.bool_(False), depth))[2]
        depth = jax.lax.fori_loop(0, pl.cdiv(big_count, chunk), big_body,
                                  depth)
        if sub == 1:
            depth_ref[:] = depth
        else:
            depth_ref[:, sc * tws:(sc + 1) * tws] = depth


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def rasterize_depth(rec, binned, width: int, height: int,
                    tile_h: int = None, tile_w: int = None,
                    cluster: int = None, chunk: int = None) -> jnp.ndarray:
    """Depth-only raster (shadow maps): (H, W) min depth, inf = empty."""
    cluster = cluster or CLUSTER
    th, tw = (tile_h, tile_w) if tile_h else tile_dims(width, height)
    tile_list, counts, big_idx, big_count = binned
    sub = tile_subcols(tw)
    ntx = pl.cdiv(width, tw)
    nty = pl.cdiv(height, th)
    n_tiles = ntx * nty
    Hp, Wp = nty * th, ntx * tw

    rec, _, _ = _pad_cluster(rec, jnp.ones((rec.shape[1],), bool), None,
                             cluster)
    # (Tc, cluster·NCOEF_DEPTH) cluster rows; col 12 = cluster zmin
    crec = records_to_coeffs_depth(rec, cluster)
    Tc = crec.shape[0]
    cap_c = tile_list.shape[1]
    cap = cap_c * cluster
    # gather_rows: stays a shared-table gather under the per-env vmap
    # (a batched-operand gather here was 5.8 ms/frame at 16 envs)
    trec = gather_rows(crec, tile_list).reshape(n_tiles, sub * cap,
                                                NCOEF_DEPTH)
    n_big = big_idx.shape[0] * cluster
    brec = gather_rows(crec, big_idx).reshape(1, n_big, NCOEF_DEPTH)
    counts2 = jnp.concatenate(
        [counts.reshape(n_tiles, sub) * cluster,
         jnp.broadcast_to(big_count * cluster, (n_tiles, 1))], axis=-1
    ).astype(jnp.int32)

    kern = partial(_raster_depth_kernel, width, height, th, tw, sub,
                   chunk or KERNEL_CHUNK)
    depth = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sub * cap, NCOEF_DEPTH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_big, NCOEF_DEPTH), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((th, tw), lambda i: (i // ntx, i % ntx),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(counts2, trec, brec)[0]
    return depth[:height, :width]


CLUSTER = 8   # triangles per binning cluster (= TRI_CHUNK): binning,
              # sorting, and the per-tile record gather run at cluster
              # granularity — 8× fewer sort keys and gather rows, and the
              # kernel's record DMA packs 104 of 128 lanes instead of 13.
              # Requires spatially coherent face order (mesh generators
              # emit grid/strip order; cluster_faces() re-orders others).


def _pad_cluster(rec, ok, band_id=None, cluster: int = CLUSTER):
    """Pad the (C, T) record stream to a cluster multiple of T
    (degenerate records: zero coords → area 0 → the kernel never shades
    them)."""
    T = rec.shape[1]
    pad = (-T) % cluster
    if pad:
        rec = jnp.concatenate(
            [rec, jnp.zeros((rec.shape[0], pad), rec.dtype)], axis=1)
        ok = jnp.concatenate([ok, jnp.zeros((pad,), bool)])
        if band_id is not None:
            band_id = jnp.concatenate(
                [band_id, jnp.zeros((pad,), band_id.dtype)])
    return rec, ok, band_id


def bin_triangles(rec, ok, width: int, height: int,
                  band_id=None, band_tiles: int = 0,
                  tile_h: int = None, tile_w: int = None,
                  cluster: int = CLUSTER, cap: int = None,
                  refine: bool = None):
    """Sort-based CLUSTER binning → (tile_list (n_tiles, cap/cluster)
    i32 cluster ids, tile_count (n_tiles,) i32 clusters, big_list
    (B,) i32 cluster ids, big_count).

    band_id/band_tiles: optional per-triangle vertical band clamp — used
    by the cascade-atlas shadow pass so each cascade's triangles only
    bin into its own rows (the viewport-clip analogue; pixels of other
    bands are never touched). Clusters must not straddle bands: callers
    pad each band's triangle block to a cluster multiple.

    refine: edge-function tile rejection — drop (cluster, tile) pairs
    whose triangles provably miss the tile (a tile whose most-inside
    corner is still outside one edge can't be covered; conservative,
    never drops a covered pair). bbox binning at cluster granularity
    walks ~2× inflated lists on wide grids; the refinement only pays
    when the tile grid is 2-D (on full-width tile rows — 256² targets —
    a cluster's bbox rows ≈ its true coverage), so the default is
    ntx > 1."""
    th, tw = (tile_h, tile_w) if tile_h else tile_dims(width, height)
    # sub-column binning (tile_subcols): lists are built per 128-px
    # SUB-tile; the kernels walk `sub` consecutive lists per grid step.
    # Sub-tile ids are y-major with x at sub granularity, so one coarse
    # tile's lists are consecutive rows — the kernel-side regroup is a
    # plain reshape.
    sub = tile_subcols(tw)
    tw = tw // sub
    ntx = pl.cdiv(width, tw)
    nty = pl.cdiv(height, th)
    n_tiles = ntx * nty
    rec, ok, band_id = _pad_cluster(rec, ok, band_id, cluster)
    T = rec.shape[1]
    mok = ok   # member-level validity (T,); `ok` becomes cluster-level

    # per-tri bbox from (C, T) component rows, masked by validity →
    # cluster bbox (invalid members contribute nothing; an all-invalid
    # cluster is dropped)
    xs_min = jnp.minimum(jnp.minimum(rec[_XC[0]], rec[_XC[1]]), rec[_XC[2]])
    xs_max = jnp.maximum(jnp.maximum(rec[_XC[0]], rec[_XC[1]]), rec[_XC[2]])
    ys_min = jnp.minimum(jnp.minimum(rec[_YC[0]], rec[_YC[1]]), rec[_YC[2]])
    ys_max = jnp.maximum(jnp.maximum(rec[_YC[0]], rec[_YC[1]]), rec[_YC[2]])
    Tc = T // cluster
    txmin = jnp.where(mok, xs_min, jnp.inf).reshape(Tc, cluster).min(1)
    txmax = jnp.where(mok, xs_max, -jnp.inf).reshape(Tc, cluster).max(1)
    tymin = jnp.where(mok, ys_min, jnp.inf).reshape(Tc, cluster).min(1)
    tymax = jnp.where(mok, ys_max, -jnp.inf).reshape(Tc, cluster).max(1)
    cok = mok.reshape(Tc, cluster).any(1)
    txmin = jnp.where(cok, txmin, 0.0)
    txmax = jnp.where(cok, txmax, -1.0)
    tymin = jnp.where(cok, tymin, 0.0)
    tymax = jnp.where(cok, tymax, -1.0)

    ylo, yhi = 0, nty - 1
    if band_id is not None:
        band_c = band_id.reshape(Tc, cluster)[:, 0]
        ylo = band_c * band_tiles
        yhi = ylo + band_tiles - 1
    x0 = jnp.clip(jnp.floor(txmin / tw).astype(jnp.int32), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor(txmax / tw).astype(jnp.int32), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor(tymin / th).astype(jnp.int32), ylo, yhi)
    y1 = jnp.clip(jnp.floor(tymax / th).astype(jnp.int32), ylo, yhi)
    # offscreen?
    off = (txmax < 0) | (txmin >= width) | (tymax < 0) | (tymin >= height)
    if band_id is not None:
        # drop clusters fully OUTSIDE their cascade band: the y-clamp
        # above would otherwise drag them into the band's edge tiles,
        # where they cover nothing but inflate every list they land in
        # (measured ~2× shadow-list inflation on the testbed cascades)
        off = off | (tymax < ylo * th) | (tymin >= (yhi + 1) * th)
    ok = cok & ~off

    spanx = x1 - x0 + 1
    spany = y1 - y0 + 1
    if band_id is not None:
        # band mode: spans are clamped to the band, so nothing is "big"
        # (big tris are walked by EVERY tile — they would leak across
        # cascade bands)
        sx_span = min(MAX_SPAN_X, ntx)
        sy_span = band_tiles
        big = jnp.zeros_like(ok)
        small = ok
    else:
        # clamp the expansion to the real grid: a 256² target has a
        # 1×8 tile grid, so the 8×8 default sorted 64 keys/tri where 8
        # suffice — the binning sort was 60% of raster time at 32 envs
        sx_span = min(MAX_SPAN_X, ntx)
        sy_span = min(MAX_SPAN_Y, nty)
        if sx_span == ntx and sy_span == nty:
            # spans cover the whole grid: nothing can exceed them, so
            # skip the big-tri path entirely (its jnp.nonzero compaction
            # alone cost ~21 ms/frame-batch at 32 envs)
            big = None
            small = ok
        else:
            big = ok & ((spanx > sx_span) | (spany > sy_span))
            small = ok & ~big

    # pair expansion (Tc, sy_span, sx_span)
    dy = jnp.arange(sy_span)
    dx = jnp.arange(sx_span)
    ty = y0[:, None, None] + dy[None, :, None]
    tx = x0[:, None, None] + dx[None, None, :]
    pair_ok = small[:, None, None] & (ty <= y1[:, None, None]) & (tx <= x1[:, None, None])

    if refine is None:
        refine = ntx > 1
    if refine and sx_span * sy_span > 1:
        # edge-function tile rejection: for each candidate (cluster,
        # tile) pair, a member triangle covers the tile only if the
        # tile's most-inside corner is inside EVERY edge (tiles fully
        # outside one edge can't intersect — conservative, exact bbox
        # stays the outer filter). Pixel centers sit at +0.5 inside the
        # [tx0, tx0+tw] rect, so testing the full rect is safe.
        px0 = (tx * tw).astype(jnp.float32)
        px1 = px0 + tw
        py0 = (ty * th).astype(jnp.float32)
        py1 = py0 + th
        x0r = rec[_XC[0]].reshape(Tc, cluster)
        x1r = rec[_XC[1]].reshape(Tc, cluster)
        x2r = rec[_XC[2]].reshape(Tc, cluster)
        y0r = rec[_YC[0]].reshape(Tc, cluster)
        y1r = rec[_YC[1]].reshape(Tc, cluster)
        y2r = rec[_YC[2]].reshape(Tc, cluster)
        e_abc = (
            (y1r - y2r, x2r - x1r, (y2r - y1r) * x1r - (x2r - x1r) * y1r),
            (y2r - y0r, x0r - x2r, (y0r - y2r) * x2r - (x0r - x2r) * y2r),
            (y0r - y1r, x1r - x0r, (y1r - y0r) * x0r - (x1r - x0r) * y0r),
        )
        inside = mok.reshape(Tc, cluster)[:, :, None, None]
        for a, b, c in e_abc:
            aa = a[:, :, None, None]
            bb = b[:, :, None, None]
            best = aa * jnp.where(aa > 0, px1[:, None], px0[:, None]) \
                + bb * jnp.where(bb > 0, py1[:, None], py0[:, None]) \
                + c[:, :, None, None]
            inside = inside & (best >= 0.0)
        pair_ok = pair_ok & jnp.any(inside, axis=1)

    tile_id = ty * ntx + tx
    tile_id = jnp.where(pair_ok, tile_id, n_tiles)      # sentinel sorts last
    cl_id = jnp.broadcast_to(jnp.arange(Tc, dtype=jnp.int32)[:, None, None],
                             tile_id.shape)

    # depth-ordered keys: tile in the high bits, quantized near-z next,
    # cluster id as a carried payload (lax.sort two-operand). Front-to-
    # back order makes the per-tile capacity cap drop the FARTHEST
    # (likely occluded) clusters — graceful degradation on dense views.
    zbits = 12
    tzmin = jnp.minimum(jnp.minimum(rec[_ZC[0]], rec[_ZC[1]]),
                        rec[_ZC[2]])                    # (T,) per-tri
    tzmin = jnp.where(mok, tzmin, jnp.inf)              # mask dead members
    czmin = tzmin.reshape(Tc, cluster).min(1)           # cluster near-z
    zq = jnp.clip((czmin * 0.5 + 0.5) * ((1 << zbits) - 1), 0,
                  (1 << zbits) - 1).astype(jnp.uint32)
    key = (tile_id.astype(jnp.uint32) << zbits) \
        | jnp.broadcast_to(zq[:, None, None], tile_id.shape)
    skey, scl = jax.lax.sort(
        (key.reshape(-1), cl_id.reshape(-1)), is_stable=True, num_keys=1)
    st = (skey >> zbits).astype(jnp.int32)

    # capacity never needs to exceed the triangle count (every tri in one
    # tile is the worst case) — uncapped, a small grid's deep lists both
    # blow the kernel's scoped VMEM (16 MB) and quadruple the per-tile
    # record pre-gather
    # per-tile capacity: default policy, or caller override (dense
    # scenes — 100k+ tris at 720p — saturate the 1024 default and the
    # depth-ordered cap silently drops the farthest clusters)
    cap_c = min(cap if cap else tile_capacity(width, height), T) // cluster
    if sub > 1:
        # per-SUB-tile capacity: 1.25/sub of the coarse-tile budget —
        # lists split ~evenly across sub-columns (straddlers land in
        # both; the 25% headroom covers the skew); total per-grid-step
        # record DMA grows only 1.25× while the walked lattice halves
        cap_c = max(1, (cap_c * 5) // (4 * sub))
    # align the per-tile record capacity to the largest kernel chunk
    # (32 records = 4 clusters) so chunked slab reads never cross the
    # block end
    cap_c = -(-cap_c // 4) * 4
    starts = jnp.searchsorted(st, jnp.arange(n_tiles))
    ends = jnp.searchsorted(st, jnp.arange(n_tiles) + 1)
    counts = jnp.minimum(ends - starts, cap_c).astype(jnp.int32)
    gather_idx = starts[:, None] + jnp.arange(cap_c)[None, :]
    gather_idx = jnp.minimum(gather_idx, st.shape[0] - 1)
    tile_list = jnp.where(
        jnp.arange(cap_c)[None, :] < counts[:, None],
        scl[gather_idx], 0,
    ).astype(jnp.int32)

    # big-cluster list (statically absent when spans cover the grid)
    if big is None:
        # statically-empty big list: still sized to one KERNEL_CHUNK so
        # the kernels' chunked reads stay in bounds (never walked)
        big_idx = jnp.zeros((max(KERNEL_CHUNK // cluster, 1),), jnp.int32)
        big_count = jnp.zeros((), jnp.int32)
    else:
        big_idx = jnp.nonzero(big, size=MAX_BIG_TRIS,
                              fill_value=0)[0].astype(jnp.int32)
        big_count = jnp.minimum(jnp.sum(big), MAX_BIG_TRIS).astype(jnp.int32)
    return tile_list, counts, big_idx, big_count


def compact_faces(faces, face_valid, cap: int, extra=None,
                  cluster: int = CLUSTER):
    """Fixed-capacity valid-first compaction of a face stream, at
    binning-cluster granularity.

    Per-env LOD selection + frustum culling leave the static face table
    mostly invalid (the composed testbed: 62k faces, ~15k valid) — and
    masks can't shorten the stream the record pipeline walks. Sorting
    CLUSTER validity keys (T/8 of them, 2-operand sort — the flat
    per-face payload sort measured 8.9 ms at 16 envs; this is ~0.1 ms)
    and gathering the first cap/8 clusters' faces bounds every
    downstream record op at ``cap``. Valid clusters beyond the cap are
    dropped (callers size cap with headroom; the composed scene's worst
    case is ~4× under it).

    Returns (faces (cap, 3), valid (cap,), extra (cap,) | None) —
    per-env arrays under vmap (gather_rows keeps the gathers in the
    fast shared-table form)."""
    T = faces.shape[0]
    if cap >= T:
        return faces, face_valid, extra
    pad = (-T) % cluster
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)])
        face_valid = jnp.concatenate(
            [face_valid, jnp.zeros((pad,), bool)])
        if extra is not None:
            extra = jnp.concatenate([extra, jnp.zeros((pad,), extra.dtype)])
        T += pad
    Tc = T // cluster
    ckey = (~face_valid.reshape(Tc, cluster).any(1)).astype(jnp.uint32)
    cidx = jnp.arange(Tc, dtype=jnp.int32)
    _, sidx = jax.lax.sort((ckey, cidx), num_keys=1, is_stable=True)
    keep = sidx[: cap // cluster]
    midx = (keep[:, None] * cluster
            + jnp.arange(cluster, dtype=jnp.int32)[None, :]).reshape(-1)
    faces_c = gather_rows(faces, midx)
    valid_c = gather_rows(face_valid[:, None], midx)[:, 0]
    extra_c = None if extra is None else \
        gather_rows(extra[:, None], midx)[:, 0]
    return faces_c, valid_c, extra_c


TRI_CHUNK = 8  # triangles processed per vectorized kernel step

KERNEL_CHUNK = 32  # default kernel walk chunk: the r5 on-device sweep
                   # (composed 16-env lists) measured per-chunk loop
                   # overhead (slab column extracts + while bookkeeping
                   # + early-out reduce) at ~0.35 µs — far above the
                   # lattice FMA cost — so fatter chunks amortize it:
                   # walk 0.80 → 0.67 ms/env at 32 vs 8. Capacity is
                   # 32-record aligned in bin_triangles; the early-out
                   # coarsens to 32-record granularity (still cluster-
                   # zmin-keyed, parity unchanged: test_raster_chunk).


def _raster_tile_kernel(width: int, height: int, tile_h: int, tile_w: int,
                        sub: int, chunk: int, count_ref, trec_ref, brec_ref,
                        depth_ref, slot_ref, d0_ref, d1_ref, s_ref):
    """One pixel tile. Coefficient records arrive PRE-GATHERED per tile
    ((1, sub·cap, NCOEF) block) so the inner loop is pure FMA vector
    math: each step evaluates TRI_CHUNK triangles' edge/z planes against
    a sub-column's pixel lattice — no per-pixel divides (perspective
    weights are normalized outside the kernel from the winner's d0/d1/s),
    no vertex differences, no dynamic VMEM gathers, no vector-lane
    broadcasts (all Mosaic pain points). The winner's triangle id
    travels as a FLOAT record column through the same select chain
    (exact below 2^24). Dead records carry c_k = -1 so validity needs
    no extra masking beyond the tail count check.

    ``sub`` sub-columns (tile_subcols) are walked sequentially in this
    ONE grid step, each against its own (tile_h, tile_w/sub) lattice and
    its own binned list (rows [sc·cap, (sc+1)·cap) of the record block):
    half the lattice FLOPs per walked record at one invocation's fixed
    cost — the r5 sweep measured the walk at 62% of the chain with
    finer whole tiles losing their savings to per-grid-step overhead."""
    ti = pl.program_id(0)
    ntx = pl.cdiv(width, tile_w)
    tx0 = (ti % ntx) * tile_w
    ty0 = (ti // ntx) * tile_h
    tws = tile_w // sub
    cap = trec_ref.shape[1] // sub
    big_count = count_ref[ti, sub]

    for sc in range(sub):
        px = (tx0 + sc * tws
              + jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tws), 2)
              ).astype(jnp.float32) + 0.5
        py = (ty0 + jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tws), 1)
              ).astype(jnp.float32) + 0.5

        def shade_chunk(slab, n_valid, carry):
            """slab: (chunk, NCOEF); n_valid: how many rows are real."""
            depth, tidf, d0o, d1o, so = carry
            def col(i):
                return slab[:, i][:, None, None]            # (C, 1, 1)
            e0 = col(0) * px + col(1) * py + col(2)
            e1 = col(3) * px + col(4) * py + col(5)
            e2 = col(6) * px + col(7) * py + col(8)
            z = col(9) * px + col(10) * py + col(11)
            valid = (jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1, 1), 0) < n_valid)
            zok = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & valid \
                & (z >= -1.0) & (z <= 1.0)
            zm = jnp.where(zok, z, jnp.inf)                  # (C, TH, TWS)
            # attr planes arrive composed in PIXEL basis
            # (records_to_coeffs pix()): 2 FMAs per plane
            d0 = col(12) * px + col(13) * py + col(14)
            d1 = col(15) * px + col(16) * py + col(17)
            s = col(18) * px + col(19) * py + col(20)
            # float tri id, broadcast to full tile shape through
            # arithmetic (standalone (C,1,1)→(C,H,W) vector broadcasts
            # are a Mosaic unsupported path; riding an add is not)
            ptid = col(21) + z * 0.0
            # chunk reduce: min depth wins, FIRST of equal depths wins
            rd = zm[0]
            rtid = ptid[0]
            rd0 = d0[0]
            rd1 = d1[0]
            rs = s[0]
            for c in range(1, chunk):
                w = zm[c] < rd
                rd = jnp.where(w, zm[c], rd)
                rtid = jnp.where(w, ptid[c], rtid)
                rd0 = jnp.where(w, d0[c], rd0)
                rd1 = jnp.where(w, d1[c], rd1)
                rs = jnp.where(w, s[c], rs)
            win = rd < depth
            return (jnp.where(win, rd, depth),
                    jnp.where(win, rtid, tidf),
                    jnp.where(win, rd0, d0o),
                    jnp.where(win, rd1, d1o),
                    jnp.where(win, rs, so))

        count = count_ref[ti, sc]
        n_small = pl.cdiv(count, chunk)

        def small_cond(c):
            return (c[0] < n_small) & ~c[1]

        def small_body(c):
            k = c[0]
            slab = trec_ref[0, pl.ds(sc * cap + k * chunk, chunk), :]
            new = shade_chunk(slab, count - k * chunk, c[2:])
            # depth-sorted early-out: the list is front-to-back by
            # cluster zmin (record col 22, +inf on dead rows), so once
            # every pixel is covered NEARER than this chunk's zmin, no
            # later chunk can win a depth test either — stop walking
            # (dense scenes put 1000s of occluded far clusters in
            # horizon tiles). 1e-3 margin covers the 12-bit sort-key
            # quantization (~4.9e-4).
            done = jnp.max(new[0]) < jnp.min(slab[:, 22]) - 1e-3
            return (k + jnp.int32(1), done, *new)

        def big_body(k, carry):
            slab = brec_ref[0, pl.ds(k * chunk, chunk), :]
            return shade_chunk(slab, big_count - k * chunk, carry)

        init = (
            jnp.full((tile_h, tws), jnp.inf, jnp.float32),
            jnp.full((tile_h, tws), -1.0, jnp.float32),
            jnp.zeros((tile_h, tws), jnp.float32),
            jnp.zeros((tile_h, tws), jnp.float32),
            jnp.ones((tile_h, tws), jnp.float32),
        )
        # dynamic trip counts: tiles only walk their real triangle lists
        carry = jax.lax.while_loop(
            small_cond, small_body, (jnp.int32(0), jnp.bool_(False), *init))[2:]
        carry = jax.lax.fori_loop(0, pl.cdiv(big_count, chunk),
                                  big_body, carry)
        depth, tidf, d0o, d1o, so = carry
        if sub == 1:
            depth_ref[:] = depth
            slot_ref[:] = tidf
            d0_ref[:] = d0o
            d1_ref[:] = d1o
            s_ref[:] = so
        else:
            lo = sc * tws
            depth_ref[:, lo:lo + tws] = depth
            slot_ref[:, lo:lo + tws] = tidf
            d0_ref[:, lo:lo + tws] = d0o
            d1_ref[:, lo:lo + tws] = d1o
            s_ref[:, lo:lo + tws] = so


def _raster_main(rec, binned, width: int, height: int,
                 tile_h: int = None, tile_w: int = None,
                 cluster: int = CLUSTER, chunk: int = None):
    """Shared main-raster body: pad, coefficients, per-tile pre-gather,
    kernel launch. Returns CROPPED (depth, tidf, d0, d1, s) planes —
    the epilogues (`rasterize`: bary normalization; `rasterize_attrs`:
    interpolated-attribute packaging) differ per record layout."""
    th, tw = (tile_h, tile_w) if tile_h else tile_dims(width, height)
    tile_list, counts, big_idx, big_count = binned
    sub = tile_subcols(tw)
    ntx = pl.cdiv(width, tw)
    nty = pl.cdiv(height, th)
    n_tiles = ntx * nty
    Hp, Wp = nty * th, ntx * tw

    # pad RAW records first: all-zero raw records convert to inert
    # coefficients (c_k = -1), whereas zero-padded coefficient rows
    # would cover every pixel (e_k = 0 ≥ 0)
    rec, _, _ = _pad_cluster(rec, jnp.ones((rec.shape[1],), bool), None,
                             cluster)
    # (Tc, cluster·NCOEF) cluster rows; col 22 = cluster zmin (early-out)
    crec = records_to_coeffs(rec, cluster)
    Tc = crec.shape[0]
    cap_c = tile_list.shape[1]
    cap = cap_c * cluster
    # pre-gather cluster records per tile (XLA gather — keeps the kernel
    # free of dynamic indexing; cluster rows make it row-count-cheap;
    # gather_rows keeps it a shared-table gather under the per-env vmap
    # — the batched-operand form was 16.3 ms/frame at 16 envs).
    # tile_list rows are SUB-tile lists (y-major, x at sub granularity):
    # one coarse tile's `sub` lists are consecutive, so the kernel block
    # regroup is this reshape.
    trec = gather_rows(crec, tile_list).reshape(n_tiles, sub * cap, NCOEF)
    n_big = big_idx.shape[0] * cluster
    brec = gather_rows(crec, big_idx).reshape(1, n_big, NCOEF)
    counts2 = jnp.concatenate(
        [counts.reshape(n_tiles, sub) * cluster,
         jnp.broadcast_to(big_count * cluster, (n_tiles, 1))], axis=-1
    ).astype(jnp.int32)                         # (n_tiles, sub + 1)

    kern = partial(_raster_tile_kernel, width, height, th, tw, sub,
                   chunk or KERNEL_CHUNK)
    out_shape = [jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
                 for _ in range(5)]             # depth, tid, d0, d1, s

    def out_map(i):
        return (i // ntx, i % ntx)

    depth, tidf, d0, d1, s = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts (n_tiles, sub+1)
            pl.BlockSpec((1, sub * cap, NCOEF), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_big, NCOEF), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, tw), out_map, memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(counts2, trec, brec)
    crop = lambda a: a[:height, :width]     # noqa: E731
    return crop(depth), crop(tidf), crop(d0), crop(d1), crop(s)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def rasterize(rec, binned, width: int, height: int,
              tile_h: int = None, tile_w: int = None,
              cluster: int = CLUSTER, chunk: int = None) -> GBuffer:
    """Raster the binned clusters into a (H, W) G-buffer. H/W are
    padded up to tile multiples internally and cropped on return.
    tile_h/tile_w/cluster must match the bin_triangles call.

    The per-tile record gather runs at CLUSTER granularity: one gathered
    row carries cluster·13 floats, so both the gather row count and the
    kernel's record-block lane padding improve 8× over per-triangle
    lists."""
    depth, tidf, d0, d1, s = _raster_main(rec, binned, width, height,
                                          tile_h, tile_w, cluster, chunk)
    tri = tidf.astype(jnp.int32)                    # float ids are exact
    # perspective normalization deferred out of the kernel (one divide
    # per PIXEL instead of per pixel-triangle pair); the q/s coefficient
    # fold already yields FACE-order (b0, b1) — composed with the
    # original-triangle barycentrics when the stream was clipped
    inv_s = jnp.where(s == 0.0, 0.0,
                      1.0 / jnp.where(s == 0.0, 1.0, s))
    hit = tri >= 0
    b0 = jnp.where(hit, d0 * inv_s, 0.0)
    b1 = jnp.where(hit, d1 * inv_s, 0.0)
    return GBuffer(depth=depth, tri_id=tri,
                   bary=jnp.stack([b0, b1], axis=-1))


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def rasterize_attrs(rec, binned, width: int, height: int,
                    tile_h: int = None, tile_w: int = None,
                    cluster: int = CLUSTER, chunk: int = None):
    """Kernel-side attribute-interpolation raster: for EXTRAS-layout
    records (22 cols — vextra= in the record builders) the kernel's
    generic d0/d1/s plane slots carry iw_px·(perspective-correct
    interpolated extra) instead of barycentric producers (see
    records_to_coeffs). Returns (depth (H, W), pid (H, W) i32 — the
    PACKED tid column (tid·ENT_PACK + entity when tid_pack was given;
    -1 background), attr (H, W, 3) — the raw interpolation numerators:
    normalize() recovers the exact perspective-correct unit normal.

    This replaces deferred shading's per-pixel attr-table gather for
    scenes whose non-normal attributes are per-entity flat: the B·H·W
    lane-padded gather rows were the dominant HBM term of the composed
    frame (~2k env-fps ceiling at 256², ROUND_NOTES r3)."""
    depth, tidf, d0, d1, s = _raster_main(rec, binned, width, height,
                                          tile_h, tile_w, cluster, chunk)
    pid = tidf.astype(jnp.int32)                    # float ids are exact
    return depth, pid, jnp.stack([d0, d1, s], axis=-1)


def raster_scene(clip_verts, faces, width: int, height: int,
                 face_valid=None) -> GBuffer:
    """Convenience: clip-space verts (V,4) + faces (T,3) → G-buffer."""
    sx, sy, z, iw = project_to_screen(clip_verts, width, height)
    rec, ok = assemble_tri_records(sx, sy, z, iw, faces, face_valid)
    binned = bin_triangles(rec, ok, width, height)
    return rasterize(rec, binned, width, height)


# --- brute-force reference (test oracle; small scenes only) ---------------

def raster_brute(rec, ok, width: int, height: int) -> GBuffer:
    """O(T·H·W) reference rasterizer with identical semantics."""
    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5

    def per_tri(r):
        x0, x1, x2 = r[_XC[0]], r[_XC[1]], r[_XC[2]]
        y0, y1, y2 = r[_YC[0]], r[_YC[1]], r[_YC[2]]
        z0, z1, z2 = r[_ZC[0]], r[_ZC[1]], r[_ZC[2]]
        iw0, iw1, iw2 = r[_WC[0]], r[_WC[1]], r[_WC[2]]
        e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        e2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (area > 1e-8)
        inv_area = 1.0 / jnp.where(area == 0, 1.0, area)
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = 1.0 - b0 - b1
        z = b0 * z0 + b1 * z1 + b2 * z2
        d0, d1, d2 = b0 * iw0, b1 * iw1, b2 * iw2
        inv_s = 1.0 / jnp.maximum(d0 + d1 + d2, 1e-20)
        return inside & (z >= -1) & (z <= 1), z, d0 * inv_s, d1 * inv_s

    inside, z, b0, b1 = jax.vmap(per_tri, in_axes=1)(rec)   # (T, H, W)
    z = jnp.where(inside & ok[:, None, None], z, jnp.inf)
    best = jnp.argmin(z, axis=0)                      # (H, W)
    depth = jnp.take_along_axis(z, best[None], axis=0)[0]
    hit = jnp.isfinite(depth)
    tid = jnp.where(hit, best, -1).astype(jnp.int32)
    b0s = jnp.take_along_axis(b0, best[None], axis=0)[0]
    b1s = jnp.take_along_axis(b1, best[None], axis=0)[0]
    # record→face weight order (see rasterize)
    return GBuffer(depth=depth, tri_id=tid,
                   bary=jnp.stack([jnp.where(hit, b0s, 0.0),
                                   jnp.where(hit, 1.0 - b0s - b1s, 0.0)],
                                  axis=-1))

def bin_stats(binned, width: int, height: int) -> dict:
    """Overflow diagnostics (host): how close a frame is to the binning
    capacity caps. Dropped geometry shows up as at_cap tiles or a
    saturated big list — check this before trusting a sparse image."""
    import numpy as np

    tile_list, counts, big_idx, big_count = binned
    c = np.asarray(counts) * CLUSTER            # counts are in clusters
    cap = tile_list.shape[1] * CLUSTER
    return {
        "n_tiles": int(c.size),
        "cap": int(cap),
        "mean_per_tile": float(c.mean()),
        "max_per_tile": int(c.max()) if c.size else 0,
        "tiles_at_cap": int((c >= cap).sum()),
        "big_count": int(big_count),
        "big_cap": MAX_BIG_TRIS,
        "big_saturated": bool(int(big_count) >= MAX_BIG_TRIS),
    }


def cluster_faces(verts, faces):
    """Host-side face reorder for cluster binning: sort faces by the
    Morton code of their centroid so each CLUSTER-sized group is a
    compact spatial patch (grid-row face order makes clusters long thin
    strips whose bboxes hit ~2× the tiles). Returns the permuted faces
    (np.ndarray) and the permutation."""
    import numpy as np

    v = np.asarray(verts)
    f = np.asarray(faces)
    c = v[f].mean(axis=1)                       # (T, 3) centroids
    mn = c.min(0)
    ext = np.maximum(c.max(0) - mn, 1e-9)
    q = ((c - mn) / ext * 1023).astype(np.uint32)   # 10 bits per axis

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    order = np.argsort(code, kind="stable")
    return f[order], order
