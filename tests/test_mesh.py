"""Native mesh optimizer tests (dedup, cache order, LOD simplify)."""
import numpy as np
import pytest

from clap_tpu.scene import mesh as M


def grid_mesh(n=16, jitter=0.0):
    xs = np.linspace(0, 1, n).astype(np.float32)
    vx, vz = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([vx, np.zeros_like(vx), vz], -1).reshape(-1, 3)
    if jitter:
        verts[:, 1] += np.random.default_rng(0).normal(0, jitter, len(verts))
    idx = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            idx += [a, a + n, a + 1, a + 1, a + n, a + n + 1]
    return verts.astype(np.float32), np.array(idx, np.uint32)


def test_native_lib_builds():
    assert M._load_native() is not None, "native meshopt failed to build"


def test_dedup_merges_duplicates():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 0], [1, 0, 0], [2, 0, 0]],
                 np.float32)
    remap, n = M.dedup(v)
    assert n == 3
    assert remap[0] == remap[2] and remap[1] == remap[3]
    assert remap[4] == 2


def test_optimize_preserves_geometry():
    verts, idx = grid_mesh(8)
    dup = np.concatenate([verts, verts[:10]])  # duplicated verts
    idx2 = idx.copy()
    nv, (nn,), ni = M.optimize(dup, [np.ones((len(dup), 3), np.float32)], idx2)
    assert len(nv) == len(verts)
    assert len(ni) == len(idx)
    # triangles reference the same positions as before
    tri_old = np.sort(dup[idx.reshape(-1)].round(5).view(np.float32), axis=0)
    tri_new = np.sort(nv[ni.reshape(-1)].round(5), axis=0)
    np.testing.assert_allclose(tri_old, tri_new, atol=1e-5)


def test_cache_locality_improves():
    verts, idx = grid_mesh(16)
    rng = np.random.default_rng(1)
    shuffled = idx.reshape(-1, 3)[rng.permutation(len(idx) // 3)].reshape(-1)

    def acmr(indices, cache=32):  # avg cache miss ratio
        c, misses = [], 0
        for v in indices:
            if v not in c:
                misses += 1
            c.insert(0, v)
            c[:] = list(dict.fromkeys(c))[:cache]
        return misses / (len(indices) / 3)

    _, _, opt = M.optimize(verts, [], shuffled.astype(np.uint32))
    assert acmr(opt) <= acmr(shuffled)


def test_lod_chain():
    verts, idx = grid_mesh(16, jitter=0.01)
    lods = M.build_lods(verts, idx)
    assert len(lods) == M.LOD_MAX
    counts = [len(l) for l in lods]
    assert counts[0] == len(idx)
    # strictly decreasing and roughly hitting the fractions
    assert counts[1] < counts[0]
    assert counts[2] < counts[1]
    assert counts[3] < counts[2]
    assert counts[3] <= counts[0] * 0.4
    # all indices valid
    for l in lods:
        assert l.max() < len(verts)
        assert len(l) % 3 == 0


def test_aabb():
    v = np.array([[0, -1, 2], [3, 4, -5]], np.float32)
    box = M.aabb(v)
    np.testing.assert_array_equal(box[0], [0, -1, -5])
    np.testing.assert_array_equal(box[1], [3, 4, 2])
