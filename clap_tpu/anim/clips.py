"""Animation clip sampling (reference: model.c:1266-1342).

The reference walks channel keyframes with a cached start index
(channel_time_to_idx model.c:1266-1288), lerps translation/scale and
slerps rotation (channel_transform model.c:1290-1342). glTF sampler
interpolation modes are parsed but dropped — playback is always
lerp/slerp (SURVEY §2.11) — so that is exactly what we implement.

TPU shape: clips live in one padded AnimLibrary; sampling one pose is a
clip-row gather, a vectorized searchsorted over (C, T) keyframe tables,
and a one-hot matmul scatter into per-joint TRS arrays (deterministic,
MXU-friendly — no serial channel walk).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import mathx as mx

PATH_TRANSLATION = 0
PATH_ROTATION = 1
PATH_SCALE = 2


class AnimLibrary(NamedTuple):
    """All clips of a model, padded to (L clips, C channels, T keyframes)."""

    times: jnp.ndarray      # (L, C, T) f32, +inf padding past each channel end
    values: jnp.ndarray     # (L, C, T, 4) f32 (w unused for trans/scale)
    ch_joint: jnp.ndarray   # (L, C) int32
    ch_path: jnp.ndarray    # (L, C) int32 PATH_*
    ch_valid: jnp.ndarray   # (L, C) bool
    duration: jnp.ndarray   # (L,) f32


class Pose(NamedTuple):
    trans: jnp.ndarray      # (J, 3)
    rot: jnp.ndarray        # (J, 4)
    scale: jnp.ndarray      # (J, 3)


def build_library(clips, n_joints: int) -> AnimLibrary:
    """Host-side packing. ``clips`` is a list of channel lists; each
    channel is (joint:int, path:int, times:(T_i,), values:(T_i, D))."""
    L = len(clips)
    C = max((len(ch) for ch in clips), default=1) or 1
    T = max((len(c[2]) for ch in clips for c in ch), default=2)
    T = max(T, 2)
    times = np.full((L, C, T), np.inf, np.float32)
    values = np.zeros((L, C, T, 4), np.float32)
    ch_joint = np.zeros((L, C), np.int32)
    ch_path = np.zeros((L, C), np.int32)
    ch_valid = np.zeros((L, C), bool)
    duration = np.zeros((L,), np.float32)
    for li, ch_list in enumerate(clips):
        for ci, (joint, path, ts, vs) in enumerate(ch_list):
            t = np.asarray(ts, np.float32)
            v = np.asarray(vs, np.float32)
            n = len(t)
            times[li, ci, :n] = t
            # pad by repeating the last keyframe (clamped sampling)
            times[li, ci, n:] = np.inf
            values[li, ci, :n, : v.shape[1]] = v
            values[li, ci, n:, : v.shape[1]] = v[-1]
            ch_joint[li, ci] = joint
            ch_path[li, ci] = path
            ch_valid[li, ci] = True
            duration[li] = max(duration[li], float(t[-1]))
    return AnimLibrary(
        times=jnp.asarray(times), values=jnp.asarray(values),
        ch_joint=jnp.asarray(ch_joint), ch_path=jnp.asarray(ch_path),
        ch_valid=jnp.asarray(ch_valid), duration=jnp.asarray(duration),
    )


def sample_channels(times, values, t):
    """Vectorized keyframe sampling for (C, T) channel tables at scalar
    time t. Returns (C, 4) raw lerped values and (C,) slerp-ready pairs —
    rotation slerp is applied by the caller (needs quat semantics).

    Matches channel_time_to_idx (model.c:1266-1288): k = last index with
    times[k] <= t, clamped to [0, T-2]; interpolation factor clamped to
    [0, 1] (model.c:1303-1307)."""
    k = jnp.sum(times <= t, axis=-1) - 1
    k = jnp.clip(k, 0, times.shape[-1] - 2)
    # keyframe fetch as one-hot reductions instead of take_along_axis:
    # under an instance vmap the per-instance k makes the gather a
    # batched-index gather (~10 ns/row·C·B on TPU); the one-hot
    # multiply-reduce is pure vector math and fuses
    tidx = jnp.arange(times.shape[-1])
    oh0 = (tidx[None, :] == k[:, None]).astype(times.dtype)     # (C, T)
    oh1 = (tidx[None, :] == (k + 1)[:, None]).astype(times.dtype)
    fin = jnp.where(jnp.isfinite(times), times, 0.0)  # inf·0 = nan guard
    t0 = jnp.sum(fin * oh0, axis=-1)
    t1 = jnp.sum(fin * oh1, axis=-1)
    t1_inf = jnp.sum(jnp.isfinite(times) * oh1, -1) == 0
    t1 = jnp.where(t1_inf, t0 + 1.0, t1)
    u = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    v0 = jnp.einsum("ct,ctd->cd", oh0, values)
    v1 = jnp.einsum("ct,ctd->cd", oh1, values)
    return v0, v1, u


def sample_pose(lib: AnimLibrary, base: Pose, clip_id, t) -> Pose:
    """Sample clip ``clip_id`` at time ``t`` into a full joint pose.

    Channels override the base (rest) pose via one-hot matmul scatter."""
    times = lib.times[clip_id]       # (C, T)
    values = lib.values[clip_id]     # (C, T, 4)
    joint = lib.ch_joint[clip_id]    # (C,)
    path = lib.ch_path[clip_id]
    valid = lib.ch_valid[clip_id]

    v0, v1, u = sample_channels(times, values, t)
    lerped = v0 + (v1 - v0) * u[:, None]            # (C, 4)
    slerped = mx.qslerp(v0, v1, u[:, None])          # (C, 4)

    n_joints = base.trans.shape[0]
    onehot = (joint[:, None] == jnp.arange(n_joints)[None, :]).astype(jnp.float32)

    def scatter(base_arr, vals, path_id, d):
        m = (valid & (path == path_id)).astype(jnp.float32)[:, None]
        oh = onehot * m                               # (C, J)
        out = oh.T @ vals[:, :d]                      # (J, d)
        covered = jnp.clip(oh.sum(axis=0), 0.0, 1.0)[:, None]
        return base_arr * (1 - covered) + out

    trans = scatter(base.trans, lerped, PATH_TRANSLATION, 3)
    scale = scatter(base.scale, lerped, PATH_SCALE, 3)
    rot = scatter(base.rot, slerped, PATH_ROTATION, 4)
    # renormalize (sum of one slerped quat per joint is already unit, but
    # base/override mixing may leave eps drift)
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-9)
    return Pose(trans=trans, rot=rot, scale=scale)
