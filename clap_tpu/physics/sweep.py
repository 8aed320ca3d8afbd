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

MAX_SWEEP_STEPS = 4   # C computes ceil(|delta|/(r/2)) dynamically; per-frame
                      # deltas at 60 Hz stay ≤ 2 steps except extreme falls
SWEEP_NDOT_CUTOFF = -0.1
SWEEP_HF_SAMPLES = 5  # cardinal plane samples are enough for probe tests


class SweepResult(NamedTuple):
    frac: jnp.ndarray       # () fraction of delta safely travelable
    normal: jnp.ndarray     # (3,) contact normal (obstacle → body)
    hit: jnp.ndarray        # () bool: anything hit
    hit_body: jnp.ndarray   # () int32: body index hit, -1 if static/none


def sweep_capsule(world: StaticWorld, params: BodyParams, body_pos,
                  self_idx, delta,
                  max_steps: int = MAX_SWEEP_STEPS) -> SweepResult:
    """Sweep body ``self_idx``'s capsule along ``delta``. body_pos is the
    (N, 3) current geom-center array (the probe starts at
    body_pos[self_idx]).

    All MAX_SWEEP_STEPS probe positions are evaluated in one batched
    narrowphase call; the C early-break (physics.c:655-656 stops marching
    once best_frac < t) is replicated exactly with a prefix-min: later
    steps' contacts are ignored once the running best frac drops below
    the current step's t.
    """
    from .heightfield import SWEEP_PATCH, hf_patch

    radius = params.radius[self_idx]
    half_len = params.half_len[self_idx]
    start = body_pos[self_idx]
    delta_len = jnp.linalg.norm(delta)
    direc = delta / jnp.maximum(delta_len, 1e-9)

    nsteps = jnp.clip(
        jnp.ceil(delta_len / jnp.maximum(radius * 0.5, 1e-6)).astype(jnp.int32),
        2, max_steps,
    )
    s = jnp.arange(1, max_steps + 1)
    ts = s.astype(jnp.float32) / nsteps.astype(jnp.float32)      # (S,)
    live = s <= nsteps

    probe_pos = start[None, :] + delta[None, :] * ts[:, None]    # (S, 3)

    # ONE heightfield patch serves every probe and sample of this sweep
    # (per-frame deltas stay within the SWEEP_PATCH window; samples
    # beyond it clamp to the patch edge)
    mid = start + 0.5 * delta
    patch = hf_patch(world.hf, mid[0], mid[2], SWEEP_PATCH)

    def probe_contacts(pp):
        p0, p1 = capsule_segment(pp, half_len)
        c = capsule_world_contacts(world, p0, p1, radius, SWEEP_HF_SAMPLES,
                                   patch=patch)
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
        # no concatenate: static and body contact banks keep their own
        # layouts (the concat forced 1.3 ms/step of layout copies)
        return c.depth, c.normal, bd, bn

    sdep, snrm, bdep, bnrm = jax.vmap(probe_contacts)(probe_pos)  # (S,K[,3])

    def frac_of(depth, normal):
        ndot = jnp.einsum("c,skc->sk", direc, normal)
        blocking = (depth > 0) & (ndot <= SWEEP_NDOT_CUTOFF) & live[:, None]
        backup = depth / jnp.maximum(-ndot, 1e-6)
        safe = jnp.maximum(ts[:, None] * delta_len - backup, 0.0)
        return jnp.where(blocking, safe / jnp.maximum(delta_len, 1e-9),
                         jnp.inf)

    frac_s = frac_of(sdep, snrm)                                # (S, Ks)
    frac_b = frac_of(bdep, bnrm)                                # (S, Kb)

    # per-step min, then prefix-min emulating the sequential march
    step_min = jnp.minimum(jnp.min(frac_s, axis=1), jnp.min(frac_b, axis=1))
    run_min = jax.lax.associative_scan(jnp.minimum, step_min)   # (S,)
    # step s is examined iff no earlier step already stopped the march:
    # stopped after step s' iff run_min[s'] < t[s']
    stopped_before = jnp.concatenate([
        jnp.zeros((1,), bool), (run_min < ts)[:-1]
    ])
    examined = ~jnp.cumsum(stopped_before.astype(jnp.int32)).astype(bool)
    best_frac = jnp.min(jnp.where(examined, step_min, jnp.inf))
    hit = jnp.isfinite(best_frac)

    # winner attributes WITHOUT argmin+gather (TPU gathers ~10 ns/row):
    # first-match one-hot masks contracted against the normal banks
    def first_match(frac):
        m = (frac == best_frac) & examined[:, None]
        flat = m.reshape(-1)
        first = flat & (jnp.cumsum(flat.astype(jnp.int32)) == 1)
        return first.reshape(m.shape).astype(jnp.float32)
    m_s = first_match(frac_s)
    m_b = first_match(frac_b)
    s_won = m_s.sum() >= m_b.sum()   # tie → static bank (earlier in the
                                     # old concat order)
    m_s = m_s * jnp.where(s_won, 1.0, 0.0)
    m_b = m_b * jnp.where(s_won, 0.0, 1.0)
    best_n = jnp.einsum("sk,skc->c", m_s, snrm) \
        + jnp.einsum("sk,skc->c", m_b, bnrm)
    body_ids = jnp.arange(bdep.shape[1], dtype=jnp.float32)
    best_src = jnp.where(
        s_won, -1.0, jnp.einsum("sk,k->", m_b, body_ids)).astype(jnp.int32)

    frac_out = jnp.where(hit, best_frac, 1.0)
    frac_out = jnp.where(delta_len < 1e-6, 1.0, frac_out)
    return SweepResult(
        frac=frac_out,
        normal=jnp.where(hit, best_n, jnp.array([0.0, 1.0, 0.0], jnp.float32)),
        hit=hit & (delta_len >= 1e-6),
        hit_body=jnp.where(hit, best_src, -1),
    )
