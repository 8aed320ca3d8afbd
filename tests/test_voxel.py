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
