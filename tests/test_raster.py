"""Rasterizer tests: analytic coverage + binned-vs-brute equivalence."""
import numpy as np
import jax
import jax.numpy as jnp

from clap_tpu.render.raster import (
    GBuffer, assemble_tri_records, bin_triangles, project_to_screen,
    raster_brute, raster_scene, rasterize,
)
from clap_tpu.render.view import frustum_planes, aabb_in_frustum, make_subview
from clap_tpu import mathx as mx


def screen_tri(pts, width=128, height=32, z=0.0):
    """Build clip-space verts for screen-space points (orthographic)."""
    pts = np.asarray(pts, np.float32)
    x = pts[:, 0] / width * 2 - 1
    y = -(pts[:, 1] / height * 2 - 1)
    clip = np.stack([x, y, np.full(len(pts), z, np.float32),
                     np.ones(len(pts), np.float32)], -1)
    return jnp.asarray(clip)


def test_single_triangle_coverage():
    # CCW triangle in screen space covering a known block
    clip = screen_tri([[10, 2], [10, 25], [50, 2]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    gb = raster_scene(clip, faces, 128, 32)
    img = np.asarray(gb.tri_id)
    assert img[3, 12] == 0          # inside
    assert img[2, 45] == 0          # near the top edge, inside
    assert img[30, 100] == -1       # outside
    assert img[20, 40] == -1        # outside the hypotenuse
    # barycentrics sum <= 1 and >= 0 where covered
    b = np.asarray(gb.bary)
    cov = img == 0
    assert (b[cov].sum(-1) <= 1 + 1e-4).all()
    assert (b[cov] >= -1e-4).all()


def test_depth_ordering():
    near = screen_tri([[0, 0], [0, 32], [128, 0]], z=-0.5)
    far = screen_tri([[0, 0], [0, 32], [128, 0]], z=0.5)
    clip = jnp.concatenate([far, near])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    gb = raster_scene(clip, faces, 128, 32)
    img = np.asarray(gb.tri_id)
    assert (img[img >= 0] == 1).all()  # near triangle wins everywhere covered
    d = np.asarray(gb.depth)
    assert abs(d[5, 5] - (-0.5)) < 1e-5


def test_backface_culled():
    clip = screen_tri([[10, 2], [50, 2], [10, 25]])  # back-facing winding
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    gb = raster_scene(clip, faces, 128, 32)
    assert (np.asarray(gb.tri_id) == -1).all()


def _random_scene(rng, T=40, width=256, height=64):
    # random CCW triangles in clip space with varying depth and w:
    # moderate-size tris around scattered centers (full-screen ones
    # legitimately land in every bin and saturate the tiny test caps)
    ctr = rng.uniform(-1.0, 1.0, (T, 1, 2))
    # spatially-coherent order (cluster binning groups consecutive
    # 8-tri clusters; production streams are Morton-ordered)
    ctr = ctr[np.lexsort((ctr[:, 0, 0], ctr[:, 0, 1]))]
    pts = (ctr + rng.uniform(-0.35, 0.35, (T, 3, 2))).astype(np.float32)
    # enforce CCW in screen space: flip if signed area (with y flip) negative
    z = rng.uniform(-0.9, 0.9, (T, 1)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, (T, 1)).astype(np.float32)
    clip = np.concatenate([
        pts * w[..., None], np.broadcast_to(z[..., None] * w[..., None], (T, 3, 1)),
        np.broadcast_to(w[..., None], (T, 3, 1)),
    ], axis=-1).reshape(T * 3, 4)
    faces = np.arange(T * 3, dtype=np.int32).reshape(T, 3)
    sx, sy, zz, iw = project_to_screen(jnp.asarray(clip), width, height)
    rec, ok = assemble_tri_records(sx, sy, zz, iw, jnp.asarray(faces))
    # fix winding: assemble's validity is exactly the front-face test
    # (CCW area > 0), so swap v1/v2 wherever the first pass culled
    faces_fixed = np.where((~np.asarray(ok))[:, None],
                           faces[:, [0, 2, 1]], faces)
    rec, ok = assemble_tri_records(sx, sy, zz, iw, jnp.asarray(faces_fixed))
    return rec, ok


def test_binned_matches_brute():
    rng = np.random.default_rng(3)
    width, height = 256, 64
    rec, ok = _random_scene(rng, T=40, width=width, height=height)
    binned = bin_triangles(rec, ok, width, height)
    gb_fast = rasterize(rec, binned, width, height)
    gb_ref = raster_brute(rec, ok, width, height)
    id_f = np.asarray(gb_fast.tri_id)
    id_r = np.asarray(gb_ref.tri_id)
    # identical coverage except where two tris have exactly equal depth
    same = id_f == id_r
    frac = same.mean()
    assert frac > 0.999, frac
    d_f = np.asarray(gb_fast.depth)[same]
    d_r = np.asarray(gb_ref.depth)[same]
    m = np.isfinite(d_r)
    np.testing.assert_allclose(d_f[m], d_r[m], atol=1e-5)
    b_f = np.asarray(gb_fast.bary)[same]
    b_r = np.asarray(gb_ref.bary)[same]
    np.testing.assert_allclose(b_f, b_r, atol=1e-4)


def test_big_triangle_path():
    # one triangle covering the whole screen exceeds the span cap
    width, height = 1280, 128  # 10 x 16 tiles
    clip = screen_tri([[0, 0], [0, 128], [1280, 0]], width, height, z=0.2)
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    gb = raster_scene(clip, faces, width, height)
    img = np.asarray(gb.tri_id)
    assert img[5, 5] == 0
    assert img[60, 600] == 0
    assert img[120, 1270] == -1


def test_perspective_correct_bary():
    # quad edge-on: vertex 0 at w=1, vertex 1 at w=4 — screen midpoint is
    # NOT attribute midpoint
    clip = jnp.array([
        [-0.5, -0.5, 0.0, 1.0],
        [4.0 * 0.5, -4.0 * 0.5, 0.0, 4.0],
        [-0.5, 0.5, 0.0, 1.0],
    ], jnp.float32)
    faces = jnp.array([[0, 1, 2]], jnp.int32)  # GL-CCW winding
    width = height = 64
    gb = raster_scene(clip, faces, width, height)
    img = np.asarray(gb.tri_id)
    ys, xs = np.nonzero(img == 0)
    assert len(ys) > 0
    # pick a pixel near the screen-space middle of edge v0→v1
    row = ys[np.argmin(np.abs(ys - 40))]
    cov = xs[ys == row]
    mid = cov[len(cov) // 2]
    b = np.asarray(gb.bary)[row, mid]
    # far vertex (w=4) is FACE slot 1 → gb.bary[...,1]; its
    # perspective-correct weight at the screen midpoint of the edge is
    # 1/(1+4) = 0.2, not 0.5
    assert b[1] < 0.4


def test_frustum_cull():
    view = mx.mat4_look_at(jnp.array([0.0, 0.0, 5.0]), jnp.zeros(3),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    sv = make_subview(view, proj)
    inside = aabb_in_frustum(sv.planes, jnp.array([-1.0, -1, -1]),
                             jnp.array([1.0, 1, 1]))
    assert bool(inside)
    behind = aabb_in_frustum(sv.planes, jnp.array([-1.0, -1, 8]),
                             jnp.array([1.0, 1, 10]))
    assert not bool(behind)
    far_left = aabb_in_frustum(sv.planes, jnp.array([-500.0, -1, -1]),
                               jnp.array([-400.0, 1, 1]))
    assert not bool(far_left)


def test_bin_stats():
    from clap_tpu.render.raster import bin_stats

    rng = np.random.default_rng(5)
    rec, ok = _random_scene(rng, T=40)
    binned = bin_triangles(rec, ok, 256, 64)
    st = bin_stats(binned, 256, 64)
    assert st["n_tiles"] >= 1
    assert st["tiles_at_cap"] == 0
    assert not st["big_saturated"]
    assert 0 < st["mean_per_tile"] <= st["max_per_tile"]


def test_camera_plane_vertex_culled():
    """A triangle with a vertex exactly ON the camera plane (clip w = 0)
    must be culled, not drawn with clamp-garbage ~1e9 screen coords."""
    from clap_tpu.render import raster as R

    clip = jnp.array([
        [0.0, 0.0, 0.0, 0.0],      # on the camera plane
        [1.0, 0.0, 0.5, 2.0],
        [0.0, 1.0, 0.5, 2.0],
    ], jnp.float32)
    sx, sy, z, iw = R.project_to_screen(clip, 64, 64)
    rec, ok = R.assemble_tri_records(sx, sy, z, iw,
                                     jnp.array([[0, 1, 2]], jnp.int32))
    assert not bool(ok[0])
    # and one just behind: w < 0 stays culled (sign-preserving clamp)
    clip2 = clip.at[0, 3].set(-1e-12)
    sx, sy, z, iw = R.project_to_screen(clip2, 64, 64)
    _, ok2 = R.assemble_tri_records(sx, sy, z, iw,
                                    jnp.array([[0, 1, 2]], jnp.int32))
    assert not bool(ok2[0])


def test_near_plane_clipping():
    """A triangle straddling the camera plane (w crossing 0) renders its
    in-front part instead of dropping (r1 gap: raster.py 'crossing tris
    drop'). Checked against an analytically pre-clipped triangle."""
    from clap_tpu.render.raster import clip_near_records

    W, H = 128, 64
    # camera-space triangle via a projection where w = -z_view:
    # v0 in front (w=2), v1 in front (w=2), v2 BEHIND the camera (w=-1)
    clip = jnp.array([
        [-1.0, -0.5, 0.0, 2.0],
        [1.0, -0.5, 0.0, 2.0],
        [0.0, 0.5, 0.0, -1.0],
    ], jnp.float32)
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    rec, ok, csrc, cbary = clip_near_records(clip, faces, W, H)
    assert rec.shape[1] == 2     # records are (C, T) column-major
    # the quad case: out-vertex is v2 → both sub-tris valid
    assert bool(ok[0]) and bool(ok[1])
    binned = bin_triangles(rec, ok, W, H)
    gb = rasterize(rec, binned, W, H)
    tid = np.asarray(gb.tri_id)
    assert (tid >= 0).any(), "clipped triangle rendered nothing"
    # every covered pixel maps back to original face 0
    src = np.asarray(csrc)
    assert set(src[t] for t in np.unique(tid[tid >= 0])) == {0}

    # reference: clip by hand at w_eps and brute-raster the two sub-tris
    eps = 1e-4
    a, b, c = np.asarray(clip)
    def isect(p, q):
        t = (eps - p[3]) / (q[3] - p[3])
        return p + t * (q - p)
    iBC = isect(b, c)
    iCA = isect(c, a)
    # rotated so out-vertex first: (C,A,B) → tris (iCA, A, B), (iCA, B, iBC)
    tri1 = np.stack([iCA, a, b])
    tri2 = np.stack([iCA, b, iBC])
    ref = jnp.asarray(np.concatenate([tri1.reshape(-1, 4),
                                      tri2.reshape(-1, 4)]), jnp.float32)
    rfaces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    from clap_tpu.render.raster import raster_brute
    sx, sy, z, iw = project_to_screen(ref, W, H)
    rrec, rok = assemble_tri_records(sx, sy, z, iw, rfaces)
    gb_ref = raster_brute(rrec, rok, W, H)
    cov = tid >= 0
    cov_ref = np.asarray(gb_ref.tri_id) >= 0
    # coverage matches the analytic clip (allow a 1px boundary sliver)
    assert (cov ^ cov_ref).mean() < 0.01


def test_barycentrics_through_clip():
    """Interpolated attributes stay continuous across the clip: a fully
    visible triangle interpolates the same values whether it goes
    through the clip path or the direct path."""
    from clap_tpu.render.raster import clip_near_records
    from clap_tpu.render.shade import interpolate_attrs

    W, H = 64, 64
    clip = jnp.array([
        [-0.8, -0.8, 0.0, 1.0],
        [0.8, -0.8, 0.0, 1.0],
        [0.0, 0.8, 0.0, 1.0],
    ], jnp.float32)
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    vattrs = jnp.array([[1.0, 0.0], [0.0, 1.0], [5.0, 2.0]], jnp.float32)

    sx, sy, z, iw = project_to_screen(clip, W, H)
    rec0, ok0 = assemble_tri_records(sx, sy, z, iw, faces)
    gb0 = rasterize(rec0, bin_triangles(rec0, ok0, W, H), W, H)
    a0 = np.asarray(interpolate_attrs(gb0, faces, vattrs))

    rec1, ok1, csrc, cbary = clip_near_records(clip, faces, W, H)
    gb1 = rasterize(rec1, bin_triangles(rec1, ok1, W, H), W, H)
    a1 = np.asarray(interpolate_attrs(gb1, faces, vattrs, csrc, cbary))
    np.testing.assert_allclose(a0, a1, atol=1e-4)


def test_refined_binning_matches_and_shrinks():
    """Edge-function tile rejection (bin_triangles refine=True): drops
    provably-missed (cluster, tile) pairs — the rendered G-buffer is
    IDENTICAL (the test is conservative) while per-tile lists shrink on
    a 2-D tile grid (bbox binning walks ~2× inflated lists there)."""
    rng = np.random.default_rng(11)
    width, height = 512, 256            # 32×256 tiles → ntx=2, nty=8
    rec, ok = _random_scene(rng, T=160, width=width, height=height)
    b_off = bin_triangles(rec, ok, width, height, refine=False)
    b_on = bin_triangles(rec, ok, width, height, refine=True)
    gb_off = rasterize(rec, b_off, width, height)
    gb_on = rasterize(rec, b_on, width, height)
    np.testing.assert_array_equal(np.asarray(gb_off.tri_id),
                                  np.asarray(gb_on.tri_id))
    d0 = np.asarray(gb_off.depth)
    d1 = np.asarray(gb_on.depth)
    m = np.isfinite(d0)
    np.testing.assert_allclose(d0[m], d1[m], atol=0)
    n_off = int(np.asarray(b_off[1]).sum())
    n_on = int(np.asarray(b_on[1]).sum())
    assert n_on <= n_off
    # random thin tris over a 2×8 grid: rejection must actually bite
    assert n_on < n_off, (n_on, n_off)


def test_kernel_attrs_extras_parity():
    """EXTRAS-mode records (kernel-side attribute interpolation): the
    kernel's d0/d1/s plane slots carry iw·normal — normalize() must
    recover the SAME perspective-correct normal the per-pixel attr
    gather produces, the packed tid column must decode to (sub-tri,
    entity), and coverage/depth must match the bary path exactly.
    Exercises both record builders (assemble_tri_records and
    clip_near_records with camera-crossing triangles)."""
    from clap_tpu.render.raster import (ENT_PACK, assemble_tri_records,
                                        clip_near_records, rasterize_attrs)
    from clap_tpu.render.shade import interpolate_attrs

    rng = np.random.default_rng(1)
    W = H = 64
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    V = 48
    verts = rng.uniform(-3, 3, (V, 3)).astype(np.float32)
    # straddle the near plane: crossing triangles exercise the clip lerp
    verts[:, 2] = rng.uniform(-8, 1.0, V).astype(np.float32)
    nrm = rng.normal(size=(V, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    faces = rng.integers(0, V, (30, 3)).astype(np.int32)
    ents = rng.integers(0, 7, (30,)).astype(np.int32)
    clip = jnp.concatenate([jnp.asarray(verts), jnp.ones((V, 1))], -1) \
        @ proj.T

    # reference: bary raster + per-pixel attr gather
    rec, ok, csrc, cb = clip_near_records(clip, jnp.asarray(faces), W, H)
    gb = rasterize(rec, bin_triangles(rec, ok, W, H), W, H)
    attrs = interpolate_attrs(gb, jnp.asarray(faces), jnp.asarray(nrm),
                              csrc, cb)
    n_ref = attrs / jnp.maximum(
        jnp.linalg.norm(attrs, axis=-1, keepdims=True), 1e-6)

    # extras mode through the clip builder
    rec2, ok2, _, cb2 = clip_near_records(
        clip, jnp.asarray(faces), W, H,
        vextra=jnp.asarray(nrm), tid_pack=jnp.asarray(ents))
    assert cb2 is None and rec2.shape[0] == 22
    depth2, pid, attr = rasterize_attrs(
        rec2, bin_triangles(rec2, ok2, W, H), W, H)
    hit = np.asarray(pid >= 0)
    hit_ref = np.asarray(gb.tri_id >= 0)
    np.testing.assert_array_equal(hit, hit_ref)
    assert hit.sum() > 500  # scene actually covers pixels
    np.testing.assert_allclose(np.where(hit, np.asarray(depth2), 0.0),
                               np.where(hit_ref, np.asarray(gb.depth), 0.0),
                               atol=1e-5)
    # packed tid decodes: entity = pid % ENT_PACK, sub-tri = pid // PACK
    ent_px = np.where(hit, np.asarray(jnp.mod(pid, ENT_PACK)), -1)
    sub_px = np.where(hit, np.asarray(pid // ENT_PACK), -1)
    tid_ref = np.asarray(gb.tri_id)
    ent_exp = np.where(hit_ref, ents[np.maximum(tid_ref, 0) % len(faces)],
                       -1)
    np.testing.assert_array_equal(ent_px, ent_exp)
    np.testing.assert_array_equal(sub_px, np.where(hit_ref, tid_ref, -1))
    # perspective-correct normal parity
    n2 = attr / jnp.maximum(jnp.linalg.norm(attr, axis=-1, keepdims=True),
                            1e-6)
    derr = np.abs(np.where(hit[..., None], np.asarray(n2 - n_ref), 0.0))
    assert derr.max() < 1e-4, derr.max()

    # extras mode through the non-clip builder (safely-in-front subset)
    sx, sy, z, iw = project_to_screen(clip, W, H)
    fok = jnp.asarray(verts[:, 2] < -0.2)[faces].all(axis=1)
    rec3, ok3 = assemble_tri_records(
        sx, sy, z, iw, jnp.asarray(faces), fok,
        vextra=jnp.asarray(nrm), tid_pack=jnp.asarray(ents))
    assert rec3.shape[0] == 22
    _, pid3, a3 = rasterize_attrs(
        rec3, bin_triangles(rec3, ok3, W, H), W, H)
    rec4, ok4 = assemble_tri_records(sx, sy, z, iw, jnp.asarray(faces), fok)
    gb4 = rasterize(rec4, bin_triangles(rec4, ok4, W, H), W, H)
    at4 = interpolate_attrs(gb4, jnp.asarray(faces), jnp.asarray(nrm))
    n4 = at4 / jnp.maximum(jnp.linalg.norm(at4, axis=-1, keepdims=True),
                           1e-6)
    h3 = np.asarray(pid3 >= 0)
    np.testing.assert_array_equal(h3, np.asarray(gb4.tri_id >= 0))
    n3 = a3 / jnp.maximum(jnp.linalg.norm(a3, axis=-1, keepdims=True), 1e-6)
    err = np.abs(np.where(h3[..., None], np.asarray(n3 - n4), 0.0))
    assert err.max() < 1e-4, err.max()
    np.testing.assert_array_equal(
        np.where(h3, np.asarray(jnp.mod(pid3, ENT_PACK)), -1),
        np.where(np.asarray(gb4.tri_id >= 0),
                 ents[np.maximum(np.asarray(gb4.tri_id), 0)], -1))


def test_pre_expanded_records_bit_identical():
    """ADVICE r3: the pre_expanded corner-stream branches must produce
    records bit-identical to the gather path — for both record builders
    and both layouts (plain + extras), including the baked v0/v2/v1
    corner swap."""
    import numpy as np
    from clap_tpu import mathx as mx
    from clap_tpu.render.pipeline import clip_transform
    from clap_tpu.render.raster import (assemble_tri_records,
                                        clip_near_records,
                                        expand_corners_major,
                                        expand_corners_record,
                                        project_to_screen)

    rng = np.random.default_rng(11)
    V, T = 64, 40
    verts = rng.standard_normal((V, 3)).astype(np.float32) * 3
    normals = rng.standard_normal((V, 3)).astype(np.float32)
    faces = rng.integers(0, V, (T, 3)).astype(np.int32)
    valid = rng.random(T) > 0.2
    eye = jnp.array([0.0, 1.0, 6.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)

    # --- assemble_tri_records (record-order expansion)
    vrec4 = np.concatenate([verts, np.ones((V, 1), np.float32)], -1)
    clipv = clip_transform(jnp.asarray(verts), view, proj)
    sx, sy, z, iw = project_to_screen(clipv, 128, 128)
    rec_a, ok_a = assemble_tri_records(sx, sy, z, iw, jnp.asarray(faces),
                                       jnp.asarray(valid))
    tbl = np.stack([np.asarray(sx), np.asarray(sy), np.asarray(z),
                    np.asarray(iw)], -1)
    ex = expand_corners_record(tbl, faces)            # (3T, 4)
    rec_b, ok_b = assemble_tri_records(
        jnp.asarray(ex[:, 0]), jnp.asarray(ex[:, 1]),
        jnp.asarray(ex[:, 2]), jnp.asarray(ex[:, 3]),
        jnp.asarray(faces), jnp.asarray(valid), pre_expanded=True)
    np.testing.assert_array_equal(np.asarray(rec_a), np.asarray(rec_b))
    np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_b))

    # --- clip_near_records (corner-major expansion), extras layout
    cv = expand_corners_major(verts, faces)
    cn = expand_corners_major(normals, faces)
    r1, o1, c1, _ = clip_near_records(clipv, jnp.asarray(faces), 128, 128,
                                      jnp.asarray(valid),
                                      vextra=jnp.asarray(normals))
    r2, o2, c2, _ = clip_near_records(
        clip_transform(jnp.asarray(cv), view, proj), jnp.asarray(faces),
        128, 128, jnp.asarray(valid), vextra=jnp.asarray(cn),
        pre_expanded=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    # --- clip_near_records plain layout (cb pairs)
    r3, o3, c3, cb3 = clip_near_records(clipv, jnp.asarray(faces),
                                        128, 128, jnp.asarray(valid))
    r4, o4, c4, cb4 = clip_near_records(
        clip_transform(jnp.asarray(cv), view, proj), jnp.asarray(faces),
        128, 128, jnp.asarray(valid), pre_expanded=True)
    np.testing.assert_array_equal(np.asarray(r3), np.asarray(r4))
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(o4))
    np.testing.assert_array_equal(np.asarray(cb3), np.asarray(cb4))
