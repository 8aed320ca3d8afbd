"""Terrain generation parity: vectorized host pipeline vs a direct scalar
transliteration of the C algorithm (terrain.c), and device queries vs host."""
import numpy as np
import jax.numpy as jnp

from clap_tpu.scene.terrain import (
    MAZE_FAC, OCTAVES, ROUGHNESS, Terrain,
    terrain_heights, terrain_init_square_landscape, terrain_height_np,
)
from clap_tpu.physics.heightfield import (
    heightfield_from_terrain, hf_height, hf_normal, hf_face_normal,
)
from clap_tpu.ops.ca2d import CA_TEST, ca2d_generate_np
from clap_tpu.utils.frand import Rand48, hash_height


# --- scalar transliteration (independent of the vectorized code) -----------

def _scalar_rand_height(seed, x, z):
    r = Rand48(0)
    r.srand48((seed ^ (x + z * 43210)) & 0xFFFFFFFFFFFFFFFF)
    return r.drand48() * 2 - 1


def _scalar_mapped(map0, n, x, z):
    if x < 0:
        x = n - 1
    elif x >= n:
        x = 0
    if z < 0:
        z = n - 1
    elif z >= n:
        z = 0
    return map0[x][z]


def _scalar_avg(map0, n, x, z):
    corners = sum(
        _scalar_mapped(map0, n, x + dx, z + dz)
        for dx, dz in ((-1, -1), (1, -1), (-1, 1), (1, 1))
    ) / 16.0
    sides = sum(
        _scalar_mapped(map0, n, x + dx, z + dz)
        for dx, dz in ((-1, 0), (1, 0), (0, -1), (0, 1))
    ) / 8.0
    return corners + sides + _scalar_mapped(map0, n, x, z) / 4.0


def _cosi(a, b, t):
    f = (1.0 - np.cos(t * np.pi)) / 2.0
    return a * (1 - f) + b * f


def _scalar_interp(map0, n, x, z):
    ix, iz = int(np.floor(x)), int(np.floor(z))
    fx, fz = x - ix, z - iz
    v1 = _scalar_avg(map0, n, ix, iz)
    v2 = _scalar_avg(map0, n, ix + 1, iz)
    v3 = _scalar_avg(map0, n, ix, iz + 1)
    v4 = _scalar_avg(map0, n, ix + 1, iz + 1)
    return _cosi(_cosi(v1, v2, fx), _cosi(v3, v4, fx), fz)


def _scalar_get_height(map0, n, y, x, z, amp, oct_):
    total = 0.0
    d = 2.0 ** (oct_ - 1)
    for i in range(oct_):
        freq = (2.0 ** i) / d
        a = (ROUGHNESS ** i) * amp
        total += _scalar_interp(map0, n, x * freq, z * freq) * a
    return y + total


def _mget(maze, x, y):
    side = maze.shape[0]
    if x < 0 or x >= side or y < 0 or y >= side:
        return 0
    return int(maze[y, x])


def _scalar_map(seed, y, n, maze):
    map0 = [[_scalar_rand_height(seed, i, j) for j in range(n)] for i in range(n)]
    H = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            xfrac = (i % MAZE_FAC) / MAZE_FAC
            yfrac = (j % MAZE_FAC) / MAZE_FAC
            xpos, ypos = i // MAZE_FAC, j // MAZE_FAC
            cn = _mget(maze, xpos, ypos)
            xn = _mget(maze, xpos + 1 if xfrac >= 0.5 else xpos - 1, ypos)
            yn = _mget(maze, xpos, ypos + 1 if yfrac >= 0.5 else ypos - 1)
            xavg = cn if cn > xn else _cosi(cn, xn, 2 * xfrac - 1)
            yavg = cn if cn > yn else _cosi(cn, yn, 2 * yfrac - 1)
            avg = _cosi(xavg, yavg, abs(xfrac - yfrac))
            H[i, j] = _scalar_get_height(map0, n, y, i, j, 1.5 ** avg, OCTAVES) + avg
    return H


def test_heights_match_scalar_transliteration():
    n = 24
    seed = 4242
    rng = Rand48(seed)
    maze = ca2d_generate_np(CA_TEST, n // MAZE_FAC, 4, rng)
    got = terrain_heights(seed, 1.5, n, maze)
    ref = _scalar_map(seed, 1.5, n, maze)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_terrain_build_and_mesh():
    t = terrain_init_square_landscape(7, -10.0, 0.0, -10.0, 20.0, 32)
    n = 32
    assert t.vx.shape == (n * n, 3)
    assert t.idx.shape == (6 * (n - 1) * (n - 1),)
    assert t.norm.shape == (n * n, 3)
    np.testing.assert_allclose(np.linalg.norm(t.norm, axis=-1), 1.0, atol=1e-5)
    # mesh vertex y equals y + map[x=j][z=i]
    # vertex at row i=3, col j=5 has x = -10 + 5/31*20, z = -10 + 3/31*20
    v = t.vx[3 * n + 5]
    assert abs(v[0] - (-10 + 5 / 31 * 20)) < 1e-5
    assert abs(v[2] - (-10 + 3 / 31 * 20)) < 1e-5
    assert abs(v[1] - (0.0 + t.heights[5, 3])) < 1e-5
    # instantiators land on the terrain
    for name, dx, dy, dz in t.instantiators:
        assert abs(dy - float(terrain_height_np(t, dx, dz))) < 1e-5


def test_device_height_matches_host():
    t = terrain_init_square_landscape(99, -8.0, 2.0, -8.0, 16.0, 32)
    hf = heightfield_from_terrain(t)
    rng = np.random.default_rng(0)
    xs = rng.uniform(-8, 8, 256)
    zs = rng.uniform(-8, 8, 256)
    host = terrain_height_np(t, xs, zs)
    dev = np.asarray(hf_height(hf, jnp.asarray(xs, dtype=jnp.float32),
                               jnp.asarray(zs, dtype=jnp.float32)))
    np.testing.assert_allclose(dev, host, atol=2e-4)
    # out of bounds -> 0
    assert float(hf_height(hf, jnp.float32(100.0), jnp.float32(0.0))) == 0.0


def test_device_normals():
    t = terrain_init_square_landscape(5, 0.0, 0.0, 0.0, 10.0, 16)
    hf = heightfield_from_terrain(t)
    n = np.asarray(hf_normal(hf, jnp.float32(5.0), jnp.float32(5.0)))
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-5)
    assert n[1] > 0
    fn = np.asarray(hf_face_normal(hf, jnp.full((4,), 5.0, jnp.float32),
                                   jnp.full((4,), 5.0, jnp.float32)))
    np.testing.assert_allclose(np.linalg.norm(fn, axis=-1), 1.0, atol=1e-5)
    assert (fn[:, 1] > 0).all()


def test_face_normal_is_exact_plane_normal():
    # build a tiny synthetic heightfield: plane y = 0.5x -> normal ∝ (-0.5,1,0)
    n = 8
    xs = np.linspace(0, 7, n)
    H = np.broadcast_to(0.5 * xs[:, None], (n, n)).astype(np.float32)
    t = Terrain(seed=0, x=0, y=0, z=0, side=7.0, nr_vert=n, heights=H,
                normals_grid=np.zeros((n, n, 3), np.float32), maze=None)
    hf = heightfield_from_terrain(t)
    fn = np.asarray(hf_face_normal(hf, jnp.float32(3.3), jnp.float32(3.7)))
    ref = np.array([-0.5, 1.0, 0.0])
    ref /= np.linalg.norm(ref)
    np.testing.assert_allclose(fn, ref, atol=1e-5)
    h = float(hf_height(hf, jnp.float32(3.3), jnp.float32(3.7)))
    assert abs(h - 0.5 * 3.3) < 1e-5
