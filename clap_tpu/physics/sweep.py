"""Swept-capsule queries (phys_body_sweep_capsule, physics.c:559-670).

The reference marches a probe capsule along the movement delta in steps of
≤ radius/2, testing real capsule-vs-world overlap at each step and backing
off along the contact normal. Replicated as a fixed-trip masked lax.scan:

- nsteps = clip(ceil(|delta| / (r/2)), 2, MAX_SWEEP_STEPS)
- at step s (t = s/nsteps): for every contact with dir·n ≤ -0.1,
  frac = max(t·L - depth/(-dir·n), 0) / L; keep the minimum
- early-exit when best_frac < t (later steps masked out, preserving the
  C break semantics — physics.c:655-656)

Also sweeps against other bodies (the probe collides with the whole space
in the reference); ``self_idx`` masks out the swept body itself.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .narrowphase import StaticWorld, capsule_world_contacts
from .shapes import closest_pt_segment_segment
from .world import BodyParams, capsule_segment

MAX_SWEEP_STEPS = 8
SWEEP_NDOT_CUTOFF = -0.1


class SweepResult(NamedTuple):
    frac: jnp.ndarray       # () fraction of delta safely travelable
    normal: jnp.ndarray     # (3,) contact normal (obstacle → body)
    hit: jnp.ndarray        # () bool: anything hit
    hit_body: jnp.ndarray   # () int32: body index hit, -1 if static/none


def _probe_contacts_min_frac(world, params: BodyParams, body_pos, self_idx,
                             probe_pos, radius, half_len, direc, t, delta_len):
    """All contacts of the probe at one position → min frac + its normal."""
    p0, p1 = capsule_segment(probe_pos, half_len)
    c = capsule_world_contacts(world, p0, p1, radius)

    # body-vs-body contacts (other characters / dynamic bodies)
    n_bodies = body_pos.shape[0]

    def body_contact(j):
        q0, q1 = capsule_segment(body_pos[j], params.half_len[j])
        ci, cj = closest_pt_segment_segment(p0, p1, q0, q1)
        diff = ci - cj
        dist = jnp.linalg.norm(diff)
        normal = jnp.where(dist > 1e-9, diff / jnp.maximum(dist, 1e-9),
                           jnp.array([0.0, 1.0, 0.0]))
        depth = radius + params.radius[j] - dist
        ok = params.active[j] & (j != self_idx)
        return jnp.where(ok, depth, -jnp.inf), normal

    bd, bn = jax.vmap(body_contact)(jnp.arange(n_bodies))

    depth = jnp.concatenate([jnp.where(c.valid, c.depth, -jnp.inf), bd])
    normal = jnp.concatenate([c.normal, bn], axis=0)
    src = jnp.concatenate([
        jnp.full((c.depth.shape[0],), -1, jnp.int32), jnp.arange(n_bodies, dtype=jnp.int32)
    ])

    ndot = jnp.einsum("c,kc->k", direc, normal)
    blocking = (depth > 0) & (ndot <= SWEEP_NDOT_CUTOFF)
    backup = depth / jnp.maximum(-ndot, 1e-6)
    safe = jnp.maximum(t * delta_len - backup, 0.0)
    frac = jnp.where(blocking, safe / jnp.maximum(delta_len, 1e-9), jnp.inf)
    i = jnp.argmin(frac)
    return frac[i], normal[i], jnp.isfinite(frac[i]), src[i]


def sweep_capsule(world: StaticWorld, params: BodyParams, body_pos,
                  self_idx, delta) -> SweepResult:
    """Sweep body ``self_idx``'s capsule along ``delta``. body_pos is the
    (N, 3) current geom-center array (the probe starts at
    body_pos[self_idx])."""
    radius = params.radius[self_idx]
    half_len = params.half_len[self_idx]
    start = body_pos[self_idx]
    delta_len = jnp.linalg.norm(delta)
    direc = delta / jnp.maximum(delta_len, 1e-9)

    nsteps = jnp.clip(
        jnp.ceil(delta_len / jnp.maximum(radius * 0.5, 1e-6)).astype(jnp.int32),
        2, MAX_SWEEP_STEPS,
    )

    def step(carry, s):
        best_frac, best_n, best_hit, best_body, stopped = carry
        t = s.astype(jnp.float32) / nsteps.astype(jnp.float32)
        live = (s <= nsteps) & ~stopped
        frac, n, hit, src = _probe_contacts_min_frac(
            world, params, body_pos, self_idx,
            start + delta * t, radius, half_len, direc, t, delta_len,
        )
        better = live & hit & (frac < best_frac)
        best_frac = jnp.where(better, frac, best_frac)
        best_n = jnp.where(better, n, best_n)
        best_body = jnp.where(better, src, best_body)
        best_hit = best_hit | better
        stopped = stopped | (live & (best_frac < t))
        return (best_frac, best_n, best_hit, best_body, stopped), None

    init = (jnp.float32(1.0), jnp.array([0.0, 1.0, 0.0], jnp.float32),
            jnp.array(False), jnp.int32(-1), jnp.array(False))
    (frac, normal, hit, hit_body, _), _ = jax.lax.scan(
        step, init, jnp.arange(1, MAX_SWEEP_STEPS + 1)
    )
    # zero-length sweep → frac 1 (physics.c:573-574)
    frac = jnp.where(delta_len < 1e-6, 1.0, frac)
    return SweepResult(frac=frac, normal=normal, hit=hit & (delta_len >= 1e-6),
                       hit_body=hit_body)
