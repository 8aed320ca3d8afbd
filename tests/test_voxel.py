"""Voxel mesher + cave content tests."""
import numpy as np

from clap_tpu.scene.voxel import voxel_mesh, cave_scene


def test_single_voxel_cube():
    g = np.zeros((3, 3, 3), np.uint8)
    g[1, 1, 1] = 1
    v, n, f = voxel_mesh(g)
    assert f.shape == (12, 3)      # 6 faces × 2 tris
    assert v.shape == (24, 3)
    # normals unit, one per face direction
    assert np.abs(np.linalg.norm(n, axis=-1) - 1).max() < 1e-6
    dirs = {tuple(x) for x in n.astype(int)}
    assert len(dirs) == 6
    # winding: each tri's normal matches its stored normal
    for tri in f:
        a, b, c = v[tri]
        fn = np.cross(b - a, c - a)
        fn = fn / np.linalg.norm(fn)
        assert np.dot(fn, n[tri[0]]) > 0.99


def test_interior_faces_culled():
    g = np.ones((4, 4, 4), np.uint8)
    v, n, f = voxel_mesh(g)
    # only the outer shell: 6 sides × 16 cells × 2 tris
    assert f.shape[0] == 6 * 16 * 2


def test_cave_scene():
    grid, v, n, f = cave_scene(12, 12, 12, seed=3)
    assert grid.shape == (12, 12, 12)
    assert len(f) > 0
    assert f.max() < len(v)
    # deterministic
    grid2, v2, _, _ = cave_scene(12, 12, 12, seed=3)
    np.testing.assert_array_equal(grid, grid2)


def test_asymmetric_bar_face_planes():
    """Regression: the _FACES table maps grid offsets ([z,y,x] order) to
    world normals (xyz order). A 2-voxel bar along x must emit its ±x end
    caps on the x=0 / x=2 planes — the old table swapped x/z face
    placement, invisible on symmetric solids but wrong on real content."""
    g = np.zeros((1, 1, 2), np.uint8)
    g[0, 0, :] = 1
    v, n, f = voxel_mesh(g, cell=1.0)
    assert len(f) == 20  # 10 boundary quads
    stored = n[f[:, 0]]
    # every face is planar along its normal axis, at the correct plane
    for t in range(len(f)):
        tri = v[f[t]]
        ax = int(np.argmax(np.abs(stored[t])))
        assert np.ptp(tri[:, ax]) < 1e-6
    px = v[f][:, :, 0]
    assert np.unique(px[np.abs(stored[:, 0] - 1) < 1e-3]).tolist() == [2.0]
    assert np.unique(px[np.abs(stored[:, 0] + 1) < 1e-3]).tolist() == [0.0]
    pz = v[f][:, :, 2]
    assert np.unique(pz[np.abs(stored[:, 2] - 1) < 1e-3]).tolist() == [1.0]
    # winding agrees with stored normals on all six directions
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    geo = np.cross(b - a, c - a)
    geo = geo / np.linalg.norm(geo, axis=-1, keepdims=True)
    assert (np.sum(geo * stored, -1) > 0.99).all()


def test_cave_wall_coverage():
    """Every solid/empty transition in the grid has exactly one quad (two
    tris) on the correct plane — checked on the x=19 inner wall of a real
    cave (the surface the old bug left striped)."""
    grid, v, n, f = cave_scene(20, 14, 20, seed=8, ca_rule=0, ca_steps=1)
    occ = np.asarray(grid) != 0
    fx = v[f][:, :, 0]
    plane19 = (np.abs(fx - 19.0) < 1e-6).all(axis=1)
    fnx = n[f[:, 0], 0]
    have = int((plane19 & (fnx < -0.5)).sum())
    should = int((occ[:, :, 19] & ~occ[:, :, 18]).sum())
    assert have == 2 * should
