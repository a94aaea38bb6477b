"""Pallas TPU kernel: single-pass occupancy fusion (reference C4).

``ops.fusion.fuse_counts`` is a pure elementwise chain, but XLA executes
it as several full-grid passes: the log-odds/flip fusion, separate
reduction passes for the three stats sums, and the per-tick counter
re-zeroing — measured ~1.6 ms marginal at cow scale (PERF.md r3
ablation) against a ~0.3 ms bandwidth bound for the bytes actually
touched.

This kernel drains the counters in ONE pass over the grid:

  * reads logodds/seen/hit/miss blocks, applies the vote + clamped
    log-odds step (bit-identical arithmetic to ``fuse_counts``),
  * writes logodds/seen in place (input_output_aliases) plus a u8
    occupancy grid shaped for the EDT rebuild's consumption,
  * re-zeroes the hit/miss counter buffers in place (the tick's
    ``jnp.zeros_like`` passes disappear),
  * accumulates the three stats (observed / inserted / deleted) as
    per-block partial sums reduced host-side over ~50 rows.

Insert/delete MASKS are not materialized — the rebuild path only needs
their population counts (the incremental-queue path keeps the XLA
implementation, ``fusion.fuse_counts``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _chunk_rows(rows: int, target: int) -> int:
    b = min(rows, target) // 8 * 8
    while b >= 8:
        if rows % b == 0:
            return b
        b -= 8
    return 0


def fuse_supported(grid_shape) -> bool:
    n = int(np.prod(grid_shape))
    return n % 128 == 0 and _chunk_rows(n // 128, 2048) >= 8


def fuse_counts_pallas(
    logodds: jax.Array,
    seen: jax.Array,
    hit_cnt: jax.Array,
    miss_cnt: jax.Array,
    *,
    l_hit: float,
    l_miss: float,
    clamp_min: float,
    clamp_max: float,
    occ_thresh: float,
    occ_is_eq: bool,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array,
           jax.Array, jax.Array, jax.Array]:
    """One-pass fusion drain.  Returns
    (new_logodds, new_seen, occ_u8, hit_zeroed, miss_zeroed,
     n_observed, n_inserted, n_deleted).

    ``occ_is_eq``: deterministic mode's ``logodds == occ_thresh``
    predicate instead of the probabilistic ``>`` (grid.occupied_grid).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = logodds.shape
    n = int(np.prod(shape))
    rows = n // 128
    ch = _chunk_rows(rows, 2048)
    assert ch, shape
    nb = rows // ch
    lh = np.float32(l_hit)
    lm = np.float32(l_miss)
    cmin = np.float32(clamp_min)
    cmax = np.float32(clamp_max)
    thr = np.float32(occ_thresh)

    def occ_of(lo):
        return (lo == thr) if occ_is_eq else (lo > thr)

    def kernel(lo_ref, seen_ref, hit_ref, miss_ref,
               lo_o, seen_o, occ_o, hit_o, miss_o, cnt_o):
        lo = lo_ref[:]
        hit = hit_ref[:]
        miss = miss_ref[:]
        obs = miss > jnp.uint8(0)
        is_hit = (2 * hit.astype(jnp.int32)) >= miss.astype(jnp.int32)
        new = jnp.clip(lo + jnp.where(is_hit, lh, lm), cmin, cmax)
        new = jnp.where(obs, new, lo)
        occ_b = occ_of(lo)
        occ_a = occ_of(new)
        lo_o[:] = new
        seen_o[:] = seen_ref[:] | obs.astype(jnp.uint8)
        occ_o[:] = occ_a.astype(jnp.uint8)
        hit_o[:] = jnp.zeros_like(hit)
        miss_o[:] = jnp.zeros_like(miss)
        n_obs = jnp.sum(obs.astype(jnp.int32))
        n_ins = jnp.sum((occ_a & ~occ_b).astype(jnp.int32))
        n_del = jnp.sum((~occ_a & occ_b).astype(jnp.int32))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        cnt_o[:] = (jnp.where(lane == 0, n_obs, 0)
                    + jnp.where(lane == 1, n_ins, 0)
                    + jnp.where(lane == 2, n_del, 0))

    blk = lambda g: (g, 0)  # noqa: E731
    f32_spec = pl.BlockSpec((ch, 128), blk, memory_space=pltpu.VMEM)
    u8_spec = pl.BlockSpec((ch, 128), blk, memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((1, 128), blk, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[f32_spec, u8_spec, u8_spec, u8_spec],
        out_specs=(f32_spec, u8_spec, u8_spec, u8_spec, u8_spec, cnt_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 128), jnp.int32),
        ),
        input_output_aliases={0: 0, 1: 1, 2: 3, 3: 4},
        interpret=interpret,
    )(logodds.reshape(rows, 128), seen.reshape(rows, 128),
      hit_cnt.reshape(rows, 128), miss_cnt.reshape(rows, 128))
    new_lo, new_seen, occ, hit0, miss0, cnt = out
    sums = jnp.sum(cnt, axis=0)
    return (new_lo.reshape(shape), new_seen.reshape(shape),
            occ.reshape(shape), hit0.reshape(shape), miss0.reshape(shape),
            sums[0], sums[1], sums[2])
