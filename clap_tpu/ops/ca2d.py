"""2D cellular automata (reference: core/ca2d.c, core/xyarray.c).

The reference steps the grid **in place** in scan order (ca2d.c:61-77), so a
cell's neighbor count mixes already-updated and not-yet-updated cells. That
Gauss-Seidel-style sweep is inherently sequential — the worst possible shape
for a TPU. The TPU-native engine therefore uses **synchronous** (double
buffered) semantics: every cell reads the previous generation. Both are
implemented here:

- ``ca2d_step_seq_np``: bit-exact numpy port of the C in-place sweep, used
  as the golden reference for C-parity tests and host-side content gen that
  must match the reference world.
- ``ca2d_step``: synchronous jnp step, batched over leading axes.
- ``ca2d_run_pallas``: all ``steps`` generations fused into ONE Pallas
  kernel — the grid lives in VMEM for the whole run, zero HBM round-trips
  between generations (benchmark config #1).

Rule encoding matches struct cell_automaton (ca-common.h): ``born_mask`` /
``surv_mask`` are bitmasks over neighbor counts; a dead cell with count n is
born at value ``nr_states`` when born bit n is set; a live cell survives
unchanged when surv bit n is set, else decays by 1 if ``decay``.

Out-of-bounds neighbors read as 0 (xyarray_get → xyzarray_valid,
xyarray.c:22-45): zero boundary, not torus.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.frand import Rand48


@dataclass(frozen=True)
class CARule:
    """struct cell_automaton (ca-common.h)."""

    name: str
    born_mask: int
    surv_mask: int
    nr_states: int
    decay: bool = False
    neigh: str = "m1"  # m1 | vn1 | mv | vnv


def _ca_range(start: int, end: int) -> int:
    """CA_RANGE (ca3d.h:38): bits [start, end) — note end-exclusive."""
    return ((1 << (end - start)) - 1) << start


# Rules used by the reference content pipeline (terrain.c:393-415)
CA_TEST = CARule("test", born_mask=3 << 2, surv_mask=3 << 7, nr_states=4,
                 decay=True, neigh="m1")
CA_COOL_TREE = CARule("cool tree", born_mask=0x1E, surv_mask=0xFF,
                      nr_states=20, decay=False, neigh="mv")
CA_ASH_PINUS = CARule("ash pinus", born_mask=0xFFFFFF, surv_mask=0xFFFFFF,
                      nr_states=21, decay=False, neigh="mv")


# ---------------------------------------------------------------------------
# numpy sequential reference — bit-exact C port
# ---------------------------------------------------------------------------

def _np_get(arr: np.ndarray, x: int, y: int) -> int:
    side_y, side_x = arr.shape
    if x < 0 or x >= side_x or y < 0 or y >= side_y:
        return 0
    return int(arr[y, x])


def _np_neigh(arr: np.ndarray, x: int, y: int, neigh: str) -> int:
    v = _np_get(arr, x, y)
    vn = [(1, 0), (-1, 0), (0, 1), (0, -1)]
    diag = [(1, 1), (-1, 1), (1, -1), (-1, -1)]
    offs = vn if neigh in ("vn1", "vnv") else vn + diag
    if neigh in ("vn1", "m1"):
        return sum(1 for dx, dy in offs if _np_get(arr, x + dx, y + dy) != 0)
    return sum(1 for dx, dy in offs if _np_get(arr, x + dx, y + dy) > v)


def ca2d_step_seq_np(rule: CARule, arr: np.ndarray) -> np.ndarray:
    """Exact port of ca2d_step (ca2d.c:61-77): in-place, x-major scan."""
    arr = arr.copy()
    side = arr.shape[0]
    for x in range(side):
        for y in range(side):
            n = _np_neigh(arr, x, y, rule.neigh)
            v = int(arr[y, x])
            if v == 0 and (rule.born_mask >> n) & 1:
                arr[y, x] = rule.nr_states
            elif v != 0 and (rule.surv_mask >> n) & 1:
                pass
            elif v != 0 and rule.decay:
                arr[y, x] = v - 1
    return arr


def ca2d_seed_np(rule: CARule, side: int, rng: Rand48) -> np.ndarray:
    """Exact port of the ca2d_generate seeding loop (ca2d.c:85-92)."""
    arr = np.zeros((side, side), dtype=np.uint8)
    for x in range(side):
        for y in range(side):
            v = rng.lrand48() % 8
            arr[y, x] = rule.nr_states if v <= rule.nr_states else 0
    return arr


def ca2d_generate_np(rule: CARule, side: int, steps: int, rng: Rand48) -> np.ndarray:
    """Exact port of ca2d_generate (ca2d.c:79-98)."""
    arr = ca2d_seed_np(rule, side, rng)
    for _ in range(steps):
        arr = ca2d_step_seq_np(rule, arr)
    return arr


# ---------------------------------------------------------------------------
# synchronous jnp step (batched)
# ---------------------------------------------------------------------------

def _shift2d(x, dy, dx):
    """Shift with zero fill: result[y, x] = x[y+dy, x+dx] (OOB → 0)."""
    out = jnp.roll(x, shift=(-dy, -dx), axis=(-2, -1))
    h, w = x.shape[-2], x.shape[-1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = (ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w)
    return jnp.where(valid, out, 0)


_VN_OFFS = ((0, 1), (0, -1), (1, 0), (-1, 0))
_DIAG_OFFS = ((1, 1), (1, -1), (-1, 1), (-1, -1))


def _neigh_count(grid_i32, neigh: str):
    offs = _VN_OFFS if neigh in ("vn1", "vnv") else _VN_OFFS + _DIAG_OFFS
    n = jnp.zeros_like(grid_i32)
    for dy, dx in offs:
        nb = _shift2d(grid_i32, dy, dx)
        if neigh in ("vn1", "m1"):
            n = n + (nb != 0).astype(grid_i32.dtype)
        else:
            n = n + (nb > grid_i32).astype(grid_i32.dtype)
    return n


def _apply_rule(rule: CARule, v, n):
    """Synchronous rule application on int32 value/count grids."""
    born = (v == 0) & (((rule.born_mask >> n) & 1) == 1)
    surv = (v != 0) & (((rule.surv_mask >> n) & 1) == 1)
    out = jnp.where(born, rule.nr_states, v)
    if rule.decay:
        out = jnp.where((v != 0) & ~surv, v - 1, out)
    return out


@partial(jax.jit, static_argnums=0)
def ca2d_step(rule: CARule, grid):
    """One synchronous generation. grid: (..., H, W) uint8."""
    v = grid.astype(jnp.int32)
    n = _neigh_count(v, rule.neigh)
    return _apply_rule(rule, v, n).astype(jnp.uint8)


@partial(jax.jit, static_argnums=(0, 2))
def ca2d_run(rule: CARule, grid, steps: int):
    """``steps`` synchronous generations via lax.scan (XLA path)."""
    def body(g, _):
        return ca2d_step(rule, g), None

    out, _ = jax.lax.scan(body, grid, None, length=steps)
    return out


def ca2d_seed(rule: CARule, key, shape):
    """Batched TPU-native seeding. Matches the C distribution
    (lrand48() % 8 <= nr_states → nr_states, ca2d.c:88-91) but draws from
    jax.random — device content gen uses keys, not libc streams."""
    v = jax.random.randint(key, shape, 0, 8, dtype=jnp.int32)
    return jnp.where(v <= rule.nr_states, rule.nr_states, 0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# fused Pallas kernel — whole run in VMEM
# ---------------------------------------------------------------------------

def _ca2d_kernel(rule: CARule, steps: int, in_ref, out_ref):
    """Block shape (1, H, W): one env per grid program, resident in VMEM."""
    _, h, w = in_ref.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)

    offs = _VN_OFFS if rule.neigh in ("vn1", "vnv") else _VN_OFFS + _DIAG_OFFS
    cmp_gt = rule.neigh in ("vnv", "mv")

    def shift_y(a, dy):
        r = pltpu.roll(a, (-dy) % h, 1)
        return jnp.where((ys + dy >= 0) & (ys + dy < h), r, 0)

    def shift_x(a, dx):
        r = pltpu.roll(a, (-dx) % w, 2)
        return jnp.where((xs + dx >= 0) & (xs + dx < w), r, 0)

    if not cmp_gt:
        # count-of-nonzero neighborhoods are SEPARABLE: 3×3 sum = row
        # sums then column sums — 4 single-axis rolls/generation instead
        # of 16 two-axis rolls (the rolls dominate the VMEM-resident
        # loop; the whole-run kernel is benchmark config #1)
        def one_step(_, v):
            b = (v != 0).astype(jnp.int32)
            if rule.neigh == "m1":
                r = b + shift_x(b, 1) + shift_x(b, -1)
                n = r + shift_y(r, 1) + shift_y(r, -1) - b
            else:                                   # vn1: 4-neighborhood
                n = shift_x(b, 1) + shift_x(b, -1) \
                    + shift_y(b, 1) + shift_y(b, -1)
            return _apply_rule(rule, v, n)
    else:
        # value-comparing neighborhoods (nb > v) are not separable
        def one_step(_, v):
            n = jnp.zeros((1, h, w), jnp.int32)
            for dy, dx in offs:
                nb = v
                if dy:
                    nb = shift_y(nb, dy)
                if dx:
                    nb = shift_x(nb, dx)
                n = n + (nb > v).astype(jnp.int32)
            return _apply_rule(rule, v, n)

    v = in_ref[:].astype(jnp.int32)
    v = jax.lax.fori_loop(0, steps, one_step, v)
    out_ref[:] = v.astype(out_ref.dtype)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnums=(0, 2))
def ca2d_run_pallas(rule: CARule, grid, steps: int):
    """Run ``steps`` generations in one Pallas kernel, grid resident in VMEM.

    grid: (H, W) or (B, H, W) uint8. The batched form maps each env to one
    grid program (grid dim 0 = batch), so independent mazes step with zero
    HBM round-trips between generations. Falls back to interpreter mode off
    TPU (tests run on CPU).
    """
    squeeze = grid.ndim == 2
    g3 = grid[None] if squeeze else grid
    b, h, w = g3.shape

    out = pl.pallas_call(
        partial(_ca2d_kernel, rule, steps),
        out_shape=jax.ShapeDtypeStruct(g3.shape, g3.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=not on_tpu(),
    )(g3)
    return out[0] if squeeze else out
