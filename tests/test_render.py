"""Render stack tests: lights/grid, BRDF sanity, post ops, full frame."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clap_tpu import mathx as mx
from clap_tpu.render import post, shade
from clap_tpu.render.lights import Lights, lights_empty, light_grid, light_radius
from clap_tpu.render.pipeline import (RenderOptions, SceneGeometry,
                                      render_frame)


def test_light_radius():
    l = lights_empty(2)
    l = l._replace(
        attenuation=jnp.array([[1.0, 0.0, 0.1], [1.0, 0.0, 0.0]]),
        active=jnp.array([True, True]),
        is_dir=jnp.array([False, True]),
    )
    r = np.asarray(light_radius(l))
    # 1/(1 + 0.1 d²) = 0.02 → d ≈ 22.1
    assert abs(r[0] - np.sqrt(49 / 0.1)) < 1.0
    assert r[1] > 1e8  # directional = everywhere


def test_light_grid_point_light_local():
    l = lights_empty(1)
    l = l._replace(
        pos=jnp.array([[0.0, 0.0, 0.0]]),
        attenuation=jnp.array([[1.0, 0.0, 1.0]]),  # small radius ~7
        active=jnp.array([True]),
    )
    view = mx.mat4_look_at(jnp.array([0.0, 0.0, 20.0]), jnp.zeros(3),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    grid = np.asarray(light_grid(l, view, proj, 512, 512))
    # light projects to screen center: center tiles lit, corners not
    assert grid[4, 4, 0]
    assert not grid[0, 0, 0]


def test_brdf_energy_and_shape():
    n = jnp.array([[[0.0, 0.0, 1.0]]])
    v = jnp.array([[[0.0, 0.0, 1.0]]])
    l = jnp.array([[[0.0, 0.0, 1.0]]])
    base = jnp.array([[[0.8, 0.8, 0.8]]])
    d, s = shade.ggx_brdf(n, v, l, base, jnp.array([[0.5]]), jnp.array([[0.0]]))
    assert float(d[0, 0, 0]) > 0
    # grazing light → zero
    l2 = jnp.array([[[1.0, 0.0, -0.01]]])
    l2 = l2 / jnp.linalg.norm(l2)
    d2, s2 = shade.ggx_brdf(n, v, l2, base, jnp.array([[0.5]]), jnp.array([[0.0]]))
    assert float(d2[0, 0, 0]) == 0.0
    # metallic kills diffuse
    d3, s3 = shade.ggx_brdf(n, v, l, base, jnp.array([[0.5]]), jnp.array([[1.0]]))
    assert float(d3[0, 0, 0]) < 1e-6


def test_tonemap_oetf_ranges():
    x = jnp.linspace(0, 10, 64).reshape(8, 8)
    for f in (shade.tonemap_reinhard, shade.tonemap_aces):
        y = np.asarray(f(x))
        assert y.min() >= 0 and y.max() <= 1.0 + 1e-5
        assert np.all(np.diff(np.asarray(f(jnp.linspace(0, 4, 32)))) >= -1e-6)
    y = np.asarray(shade.oetf_srgb(jnp.linspace(0, 1, 32)))
    assert y[0] == 0 and abs(y[-1] - 1) < 1e-5


def test_blur_preserves_mean():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((32, 64)).astype(np.float32))
    out = post.gauss_blur_v(post.gauss_blur_h(img))
    assert abs(float(img.mean()) - float(out.mean())) < 2e-2


def test_downsample_upsample():
    img = jnp.ones((16, 32, 3))
    q = post.downsample2(img)
    assert q.shape == (8, 16, 3)
    up = post.upsample2(q, 16, 32)
    np.testing.assert_allclose(np.asarray(up), 1.0, atol=1e-6)


def test_ssao_modes_corner_vs_plane():
    """Both AO estimators (reference hemisphere kernel + gather-free
    shift taps) darken a concave corner and leave a flat plane
    nearly unoccluded."""
    H = W = 64
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * 0.05
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] * 0.05
    # flat floor facing the camera at z=-3 (view space)
    flat_pos = jnp.stack([jnp.broadcast_to(xs, (H, W)),
                          jnp.broadcast_to(ys, (H, W)),
                          jnp.full((H, W), -3.0)], -1)
    flat_nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (H, W, 3))
    # concave step: right half pops 0.4 toward the camera; the left
    # half near the seam sees the wall rise above its tangent plane
    step = jnp.where(xs >= xs[0, W // 2], 0.4, 0.0)
    corner_pos = flat_pos.at[..., 2].add(jnp.broadcast_to(step, (H, W)))
    ao_shift_flat = np.asarray(post.ssao_shift(flat_pos, flat_nrm))
    ao_shift_cor = np.asarray(post.ssao_shift(corner_pos, flat_nrm))
    kern = post.ssao_kernel(jax.random.PRNGKey(7))
    ao_kern_flat = np.asarray(post.ssao(flat_pos, flat_nrm, kern))
    ao_kern_cor = np.asarray(post.ssao(corner_pos, flat_nrm, kern))
    seam = (slice(8, -8), slice(W // 2 - 4, W // 2))   # left of the wall
    inner = (slice(8, -8), slice(8, 16))               # far from seam
    for flat, cor in ((ao_shift_flat, ao_shift_cor),
                      (ao_kern_flat, ao_kern_cor)):
        assert flat[inner].mean() > 0.9        # plane: unoccluded
        assert cor[seam].mean() < flat[seam].mean() - 0.1   # corner darker


def test_sobel_detects_edge():
    img = jnp.zeros((16, 128)).at[:, 64:].set(1.0)
    e = np.asarray(post.sobel_edges(img))
    assert e[8, 64] > 1.0
    assert e[8, 10] == 0.0


def test_vsm_shadow_basic():
    # one cascade, light looking down -z at a plane z=0; occluder at z=0.5
    s = 64
    view = mx.mat4_look_at(jnp.array([0.0, 0.0, 5.0]), jnp.zeros(3),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_ortho(-2.0, 2.0, -2.0, 2.0, 0.1, 10.0)
    mvp = proj @ view
    # moments: left half of the map sees depth 0.2 (occluder), right 0.9
    d = jnp.where(jnp.arange(s)[None, :] < s // 2, 0.2, 0.9)
    d = jnp.broadcast_to(d, (s, s))
    moments = jnp.stack([d, d * d], -1)[None]
    mvps = mvp[None]
    dists = jnp.array([100.0])
    # world points: center-left (occluded, stored 0.2 < its own depth),
    # center-right (lit)
    wpos = jnp.array([[[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    vd = jnp.array([[1.0, 1.0]])
    sf = np.asarray(shade.vsm_shadow(moments, mvps, dists, wpos, vd))
    assert sf[0, 0] < 0.3   # occluded
    assert sf[0, 1] > 0.9   # lit


def make_cube_geom():
    # unit cube at origin, 12 tris, CCW outward
    v = np.array([[x, y, z] for z in (-1, 1) for y in (-1, 1) for x in (-1, 1)],
                 np.float32) * 0.5
    quads = [
        (0, 2, 3, 1), (4, 5, 7, 6),   # z- (back), z+ (front)
        (0, 1, 5, 4), (2, 6, 7, 3),   # y-, y+
        (0, 4, 6, 2), (1, 3, 7, 5),   # x-, x+
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [(a, b, c), (a, c, d)]
    faces = np.array(faces, np.int32)
    verts = jnp.asarray(v)
    # face normals for lighting: use vertex positions as normals (sphere-ish)
    normals = verts / jnp.linalg.norm(verts, axis=-1, keepdims=True)
    return SceneGeometry(
        verts=verts,
        normals=normals,
        faces=jnp.asarray(faces),
        face_valid=jnp.ones((len(faces),), bool),
        base_color=jnp.full((8, 3), 0.7),
        rough_metal=jnp.tile(jnp.array([[0.6, 0.0]]), (8, 1)),
        emission=jnp.zeros((8, 3)),
    )


def test_full_frame_smoke():
    opts = RenderOptions(width=128, height=96, shadow_size=64,
                         film_grain=0.0)
    geom = make_cube_geom()
    eye = jnp.array([1.5, 1.2, 2.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 128 / 96, 0.1, 50.0)
    lights = lights_empty(2)
    lights = lights._replace(
        direction=lights.direction.at[0].set(
            jnp.array([-0.4, -0.8, -0.4]) / np.linalg.norm([-0.4, -0.8, -0.4])),
        color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True),
    )
    img = render_frame(opts, geom, view, proj, lights, eye)
    arr = np.asarray(img)
    assert arr.shape == (96, 128, 3)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0 and arr.max() <= 1.0
    # the cube is visible: center pixels differ from the background corner
    assert abs(arr[48, 64] - arr[2, 2]).sum() > 0.05


def test_menu_blur_checkpoint():
    """Pause-menu checkpoint: blurred backdrop keeps size/range, kills
    high-frequency detail (reference pipeline-builder.c:570-610,
    checkpoint mechanism pipeline.c:530-567)."""
    from clap_tpu.render.pipeline import menu_blur

    frame = jax.random.uniform(jax.random.PRNGKey(0), (64, 96, 3))
    out = np.asarray(menu_blur(frame, RenderOptions(width=96, height=64)))
    assert out.shape == (64, 96, 3)
    assert np.isfinite(out).all() and out.min() >= 0.0
    hf_in = np.abs(np.diff(np.asarray(frame), axis=1)).mean()
    hf_out = np.abs(np.diff(out, axis=1)).mean()
    assert hf_out < hf_in * 0.35


def test_particles_render_into_frame():
    """Billboard particles rasterize and alpha-blend into the frame
    (particle.c:122-125); occluded particles stay hidden."""
    import jax.numpy as jnp
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import (RenderOptions, SceneGeometry,
                                          render_frame)

    W = H = 128
    # ground quad at y=0
    verts = jnp.array([[-5.0, 0.0, -5.0], [5.0, 0.0, -5.0],
                       [-5.0, 0.0, 5.0], [5.0, 0.0, 5.0]], jnp.float32)
    normals = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (4, 1))
    faces = jnp.array([[0, 2, 1], [1, 2, 3]], jnp.int32)
    geom = SceneGeometry(
        verts=verts, normals=normals, faces=faces,
        face_valid=jnp.ones((2,), bool),
        base_color=jnp.full((4, 3), 0.2),
        rough_metal=jnp.tile(jnp.array([[0.9, 0.0]]), (4, 1)),
        emission=jnp.zeros((4, 3)))
    opts = RenderOptions(width=W, height=H, shadow_size=64,
                         ssao=False, film_grain=0.0, edge_aa=False)
    lights = lights_empty(1)
    d = jnp.array([-0.3, -0.9, -0.2])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    # camera looks DOWN at the ground so the particle overlaps ground
    # pixels (particles over the far background get washed out by the
    # distance fog, like any other geometry-free pixel)
    eye = jnp.array([0.0, 4.0, 4.0])
    view = mx.mat4_look_at(eye, jnp.array([0.0, 0.0, 0.0]),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)

    # one particle in view, one buried under the ground (occluded)
    ppos = jnp.array([[0.0, 0.8, 0.0], [0.0, -3.0, 0.0]], jnp.float32)
    pact = jnp.array([True, True])

    base = np.asarray(render_frame(opts, geom, view, proj, lights, eye))
    withp = np.asarray(render_frame(opts, geom, view, proj, lights, eye,
                                    particles=(ppos, 0.4, pact)))
    diff = np.abs(withp - base).sum(-1)
    assert (diff > 0.02).sum() > 20, "no particle pixels rendered"
    # the buried particle alone contributes nothing (depth-occluded)
    buried = np.asarray(render_frame(
        opts, geom, view, proj, lights, eye,
        particles=(ppos, 0.4, jnp.array([False, True]))))
    assert np.abs(buried - base).max() < 1e-5


def test_materials_textures_tbn_fbm():
    """Per-model texture sets + TBN normal mapping + material fBm
    (VERDICT r1 #6): a textured, normal-mapped, fBm-roughened quad
    shades visibly differently from the flat-material render."""
    import jax.numpy as jnp
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import (RenderOptions, SceneGeometry,
                                          TextureSets, render_frame)
    from clap_tpu.render.scenerender import compute_tangents

    W = H = 96
    verts = np.array([[-2.0, 0.0, -2.0], [2.0, 0.0, -2.0],
                      [-2.0, 0.0, 2.0], [2.0, 0.0, 2.0]], np.float32)
    normals = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [4, 0], [0, 4], [4, 4]], np.float32)
    faces = np.array([[0, 2, 1], [1, 2, 3]], np.int32)
    tangent = compute_tangents(verts, normals, uv, faces)
    # tangents of a y-up quad with u along +x: T ≈ +x, w = ±1
    np.testing.assert_allclose(tangent[:, 0], 1.0, atol=1e-5)

    mk = lambda *a: jnp.asarray(np.asarray(a, np.float32))  # noqa: E731
    geom = SceneGeometry(
        verts=jnp.asarray(verts), normals=jnp.asarray(normals),
        faces=jnp.asarray(faces), face_valid=jnp.ones((2,), bool),
        base_color=jnp.full((4, 3), 0.6),
        rough_metal=jnp.tile(jnp.array([[0.6, 0.0]]), (4, 1)),
        emission=jnp.zeros((4, 3)), uv=jnp.asarray(uv),
        tangent=jnp.asarray(tangent),
        tex_id=jnp.zeros((4,), jnp.float32),
        local_pos=jnp.asarray(verts),
        mat_fbm=jnp.tile(jnp.array([[0.8, 2.0, 0.1, 0.95, 0.0, 0.0]]),
                         (4, 1)),
    )
    # checkerboard diffuse + tilted-normal map + emission blob
    S = 32
    yy, xx = np.mgrid[0:S, 0:S]
    checker = ((xx // 4 + yy // 4) % 2).astype(np.float32)
    diffuse = np.stack([checker, 0.5 + 0.5 * checker,
                        1.0 - checker], -1)[None]
    nmap = np.zeros((S, S, 3), np.float32)
    nmap[..., 0] = 0.5 + 0.35 * np.sin(xx / 2.0)
    nmap[..., 1] = 0.5
    nmap[..., 2] = 0.8
    emis = np.zeros((S, S, 3), np.float32)
    emis[10:16, 10:16] = 3.0
    tex = TextureSets(diffuse=jnp.asarray(diffuse),
                      normal=jnp.asarray(nmap[None]),
                      emission=jnp.asarray(emis[None]))

    opts = RenderOptions(width=W, height=H, shadow_size=64, ssao=False,
                         film_grain=0.0, edge_aa=False)
    lights = lights_empty(1)
    d = jnp.array([-0.3, -0.9, -0.2])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    eye = jnp.array([0.0, 3.0, 3.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)

    flat_geom = geom._replace(tangent=None, tex_id=None, local_pos=None,
                              mat_fbm=None, uv=None)
    flat = np.asarray(render_frame(opts, flat_geom, view, proj, lights, eye))
    full = np.asarray(render_frame(opts, geom, view, proj, lights, eye,
                                   textures=tex))
    diff = np.abs(full - flat).sum(-1)
    assert (diff > 0.05).mean() > 0.1, "textured render barely differs"
    # checker pattern visible: neighboring texel-block variance
    assert full.std() > flat.std() * 1.2
    # fBm actually modulates roughness (material_fbm routed): disable
    # fBm only and compare
    nofbm = np.asarray(render_frame(
        opts, geom._replace(mat_fbm=None, local_pos=None), view, proj,
        lights, eye, textures=tex))
    assert np.abs(full - nofbm).max() > 0.01


def test_edge_mode_metadata():
    """RT2 edge-mode packing (model.frag:109-125): solid-id boundaries
    edge even at identical shading; outline-excluded entities don't."""
    import jax.numpy as jnp
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import (RenderOptions, SceneGeometry,
                                          render_frame)

    W = H = 96
    # two coplanar quads side by side, SAME normal/color — only the
    # solid id differs across the seam
    def quad(x0):
        return np.array([[x0, 0.0, -2.0], [x0 + 2.0, 0.0, -2.0],
                         [x0, 0.0, 2.0], [x0 + 2.0, 0.0, 2.0]], np.float32)
    verts = np.concatenate([quad(-2.0), quad(0.0)])
    normals = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (8, 1))
    faces = np.array([[0, 2, 1], [1, 2, 3], [4, 6, 5], [5, 6, 7]],
                     np.int32)

    def build(edge_ids):
        return SceneGeometry(
            verts=jnp.asarray(verts), normals=jnp.asarray(normals),
            faces=jnp.asarray(faces), face_valid=jnp.ones((4,), bool),
            base_color=jnp.full((8, 3), 0.5),
            rough_metal=jnp.tile(jnp.array([[0.7, 0.0]]), (8, 1)),
            emission=jnp.zeros((8, 3)),
            edge_id=jnp.asarray(edge_ids, jnp.float32))

    opts = RenderOptions(width=W, height=H, shadow_size=64, ssao=False,
                         bloom=False, film_grain=0.0, edge_aa=False)
    lights = lights_empty(1)
    d = jnp.array([0.0, -1.0, -0.01])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    eye = jnp.array([0.0, 3.5, 0.01])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)

    same = np.asarray(render_frame(opts, build([1.0] * 8), view, proj,
                                   lights, eye))
    split = np.asarray(render_frame(opts, build([1.0] * 4 + [2.0] * 4),
                                    view, proj, lights, eye))
    # id seam produces edge darkening down the middle column.
    # Interior rows only: the quads' outer silhouette outlines also
    # differ between variants.
    rows = slice(H // 3, 2 * H // 3)
    mid = np.abs(split - same).sum(-1)[rows, W // 2 - 2:W // 2 + 2]
    assert mid.max() > 0.05, "no id-boundary edge"
    # outline-exclude on both sides suppresses the seam edge
    excl = np.asarray(render_frame(
        opts, build([129.0] * 4 + [130.0] * 4), view, proj, lights, eye))
    mid2 = np.abs(excl - same).sum(-1)[rows, W // 2 - 2:W // 2 + 2]
    assert mid2.max() < 0.02, "excluded entities still edged"


def test_attr_bf16_close_and_ids_exact():
    # bf16 attr-table mode: interpolated attrs within bf16 tolerance,
    # integer-valued flat columns (entity ids < 256) EXACT
    import jax.numpy as jnp

    from clap_tpu.render import shade
    from clap_tpu.render.raster import raster_scene

    rng = np.random.default_rng(11)
    V, T = 12, 6
    verts = jnp.asarray(rng.uniform(-1, 1, (V, 3)), jnp.float32)
    clip = jnp.concatenate(
        [verts[:, :2], jnp.zeros((V, 1)), jnp.ones((V, 1))], axis=-1)
    faces = jnp.asarray(rng.integers(0, V, (T, 3)), jnp.int32)
    gb = raster_scene(clip, faces, 32, 32)
    vattrs = jnp.asarray(rng.uniform(0, 1, (V, 8)), jnp.float32)
    fattrs = jnp.asarray(
        rng.integers(0, 200, (T, 1)).astype(np.float32))

    a32, f32v = shade.interpolate_attrs(gb, faces, vattrs,
                                        face_attrs=fattrs)
    a16, f16v = shade.interpolate_attrs(gb, faces, vattrs,
                                        face_attrs=fattrs,
                                        table_dtype=jnp.bfloat16)
    assert a16.dtype == a32.dtype          # upcast back to f32
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32),
                               atol=1.5e-2)
    np.testing.assert_array_equal(np.asarray(f16v), np.asarray(f32v))


def test_terrain_slope_blend():
    """Slope-based grass/rock atlas blend (terrain.frag:39-46): a flat
    up-facing quad samples the grass quadrant (fac=(N·up)^4 → 1), a
    vertical wall samples rock (fac → 0)."""
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import (RenderOptions, SceneGeometry,
                                          TextureSets, render_frame)

    W = H = 64
    # quad 0: horizontal (y=0, normal +y); quad 1: vertical (normal +z)
    verts = np.array([
        [-2.0, 0.0, -2.0], [2.0, 0.0, -2.0], [-2.0, 0.0, 2.0],
        [2.0, 0.0, 2.0],
        [-2.0, 0.0, -2.5], [2.0, 0.0, -2.5], [-2.0, 3.0, -2.5],
        [2.0, 3.0, -2.5]], np.float32)
    normals = np.array([[0, 1, 0]] * 4 + [[0, 0, 1]] * 4, np.float32)
    uv = np.array([[0, 0], [2, 0], [0, 2], [2, 2]] * 2, np.float32)
    faces_flat = np.array([[0, 2, 1], [1, 2, 3]], np.int32)
    faces_wall = np.array([[4, 5, 6], [5, 7, 6]], np.int32)

    S = 16
    atlas = np.zeros((S, S, 3), np.float32)
    atlas[:S // 2, :S // 2] = (0.0, 1.0, 0.0)   # grass quadrant: green
    atlas[S // 2:, S // 2:] = (1.0, 0.0, 0.0)   # rock quadrant: red
    tex = TextureSets(diffuse=jnp.asarray(atlas[None]),
                      slope_blend=jnp.array([True]))

    def render(faces):
        geom = SceneGeometry(
            verts=jnp.asarray(verts), normals=jnp.asarray(normals),
            faces=jnp.asarray(faces), face_valid=jnp.ones((2,), bool),
            base_color=jnp.ones((8, 3)),
            rough_metal=jnp.tile(jnp.array([[0.8, 0.0]]), (8, 1)),
            emission=jnp.zeros((8, 3)), uv=jnp.asarray(uv),
            tex_id=jnp.zeros((8,), jnp.float32))
        opts = RenderOptions(width=W, height=H, shadow_size=64,
                             ssao=False, film_grain=0.0, edge_aa=False)
        lights = lights_empty(1)
        d = jnp.array([0.0, -0.7, -0.7])
        lights = lights._replace(
            direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
            color=lights.color.at[0].set(jnp.ones(3)),
            is_dir=lights.is_dir.at[0].set(True),
            active=lights.active.at[0].set(True))
        eye = jnp.array([0.0, 2.5, 4.0])
        view = mx.mat4_look_at(eye, jnp.array([0.0, 0.5, 0.0]),
                               jnp.array([0.0, 1.0, 0.0]))
        proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
        return np.asarray(render_frame(opts, geom, view, proj, lights,
                                       eye, textures=tex))

    f_flat = render(faces_flat)
    f_wall = render(faces_wall)
    # the up-facing quad is green-dominant (grass), the wall red (rock);
    # look only at covered pixels (where r and g diverge) — the clear
    # color is gray and dominates whole-image sums
    m_flat = np.abs(f_flat[..., 1] - f_flat[..., 0]) > 0.05
    m_wall = np.abs(f_wall[..., 1] - f_wall[..., 0]) > 0.05
    assert m_flat.sum() > 50 and m_wall.sum() > 50
    assert (f_flat[..., 1][m_flat] > f_flat[..., 0][m_flat]).mean() > 0.9
    assert (f_wall[..., 0][m_wall] > f_wall[..., 1][m_wall]).mean() > 0.9
