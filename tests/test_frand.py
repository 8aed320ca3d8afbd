"""rand48 replica parity — against libc itself (compiled fixture)."""
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

from clap_tpu.utils.frand import Rand48, hash_height, srand48_state, rand48_next, drand48_from_state

C_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
int main(void) {
    srand48(12345);
    for (int i = 0; i < 8; i++) printf("%ld\n", lrand48());
    srand48(777);
    for (int i = 0; i < 8; i++) printf("%.17g\n", drand48());
    return 0;
}
"""


def _libc_stream():
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "r.c"
        src.write_text(C_SRC)
        exe = Path(td) / "r"
        subprocess.run(["gcc", str(src), "-o", str(exe)], check=True)
        out = subprocess.run([str(exe)], capture_output=True, text=True, check=True)
    lines = out.stdout.split()
    return [int(x) for x in lines[:8]], [float(x) for x in lines[8:]]


def test_matches_libc():
    lr, dr = _libc_stream()
    r = Rand48(12345)
    assert [r.lrand48() for _ in range(8)] == lr
    r.srand48(777)
    got = [r.drand48() for _ in range(8)]
    assert got == dr


def test_vectorized_matches_scalar():
    seeds = np.array([0, 1, 42, 2**31 - 1, 2**33], dtype=np.uint64)
    st = rand48_next(srand48_state(seeds))
    vals = drand48_from_state(st)
    for i, s in enumerate([0, 1, 42, 2**31 - 1, 2**33]):
        r = Rand48(s)
        assert vals[i] == r.drand48()


def test_hash_height_range_and_determinism():
    x, z = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    h1 = hash_height(987654321, x, z)
    h2 = hash_height(987654321, x, z)
    assert np.array_equal(h1, h2)
    assert h1.min() >= -1.0 and h1.max() < 1.0
    # matches the scalar path: srand48(seed ^ (x + z*43210)); drand48()*2-1
    r = Rand48(0)
    r.srand48(987654321 ^ (3 + 5 * 43210))
    assert h1[3, 5] == r.drand48() * 2 - 1
