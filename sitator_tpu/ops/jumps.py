"""On-device jump statistics (hot loop #3).

TPU-native redesign of the reference ``sitator/dynamics/JumpAnalysis.py``
frame loop (SURVEY.md §3.4, §4.3): the per-ion "last known site" carry runs
as a single ``lax.scan`` over frames with vectorized per-ion state, and every
per-event tally (hop counts ``n_ij``, residence sums, jump-lag sums) is a
masked scatter-add into dense ``(S+1, S+1)`` accumulators carried through the
scan — no Python loop, no host sync, shardable over the frame axis with a
final ``psum`` (SURVEY.md §3.10).

Unknown-site frames (``-1``) follow the reference's default policy: they
neither emit jumps nor advance residence; an ion's previous site persists
across unknown gaps.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["jump_stats", "JumpStats"]


class JumpStats(dict):
    """n_ij (S,S), lag_sum (S,S), res_sum (S,), res_cnt (S,), occ_counts (S,),
    last_sites (M,), last_res (M,)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None


def jump_stats(traj, n_sites, init_last=None, init_res=None):
    """Scan a ``(F, M)`` site trajectory into dense jump statistics.

    ``init_last``/``init_res`` allow chaining across trajectory blocks (the
    streaming pipeline feeds the carry of one block into the next).

    Returns a :class:`JumpStats` whose matrices use true site indices
    (row/col ``n_sites`` is the internal dummy slot, already stripped).
    """
    return JumpStats(_jump_stats(traj, n_sites, init_last, init_res))


@partial(jax.jit, static_argnames=("n_sites",))
def _jump_stats(traj, n_sites, init_last=None, init_res=None):
    F, M = traj.shape
    S = n_sites
    if init_last is None:
        init_last = jnp.full((M,), -1, dtype=jnp.int32)
    if init_res is None:
        init_res = jnp.zeros((M,), dtype=jnp.int32)

    n_ij0 = jnp.zeros((S + 1, S + 1), dtype=jnp.int32)
    lag0 = jnp.zeros((S + 1, S + 1), dtype=jnp.int32)
    res_sum0 = jnp.zeros((S + 1,), dtype=jnp.int32)
    res_cnt0 = jnp.zeros((S + 1,), dtype=jnp.int32)

    def body(carry, s_f):
        last, res, n_ij, lag, res_sum, res_cnt = carry
        known = s_f >= 0
        have_last = last >= 0
        jump = known & have_last & (s_f != last)
        stay = known & have_last & (s_f == last)
        first = known & ~have_last

        # dummy slot S for non-jumping ions keeps shapes static
        i_from = jnp.where(jump, last, S)
        i_to = jnp.where(jump, s_f, S)
        one = jump.astype(jnp.int32)
        n_ij = n_ij.at[i_from, i_to].add(one)
        lag = lag.at[i_from, i_to].add(jnp.where(jump, res, 0))
        res_sum = res_sum.at[i_from].add(jnp.where(jump, res, 0))
        res_cnt = res_cnt.at[i_from].add(one)

        res = jnp.where(jump | first, 1, jnp.where(stay, res + 1, res))
        last = jnp.where(known, s_f, last)
        return (last, res, n_ij, lag, res_sum, res_cnt), None

    (last, res, n_ij, lag, res_sum, res_cnt), _ = jax.lax.scan(
        body, (init_last, init_res, n_ij0, lag0, res_sum0, res_cnt0),
        traj.astype(jnp.int32))

    # occupancy tallies: frames spent at each site (independent of the scan)
    occ = jnp.zeros((S + 1,), dtype=jnp.int32)
    clipped = jnp.where(traj >= 0, traj, S)
    occ = occ.at[clipped.ravel()].add(1)

    return dict(
        n_ij=n_ij[:S, :S],
        lag_sum=lag[:S, :S],
        res_sum=res_sum[:S],
        res_cnt=res_cnt[:S],
        occ_counts=occ[:S],
        last_sites=last,
        last_res=res,
    )
