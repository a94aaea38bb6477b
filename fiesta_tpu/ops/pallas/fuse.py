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

The kernel blocks the grid along x IN ITS NATIVE [X, Y, Z] layout — a
2-D flattening would force relayout copies on every operand (pallas
inputs must materialize in the requested layout), costing more than the
kernel saves.  ``seen`` rides uint8 (``MapState.seen``; the kernel is
dtype-generic via ``seen_dt``) — Mosaic widens i1 kernel IO to s32
(4x VMEM + convert passes, grid.py), so u8 is the layout that aliases
straight through without a convert pass.

Insert/delete MASKS are not materialized — the rebuild path only needs
their population counts (the incremental-queue path keeps the XLA
implementation, ``fusion.fuse_counts``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _chunk_x(gx: int, per_row: int, budget: int = 6 * 2**20) -> int:
    """Largest divisor of gx whose block (~15 B/elem) fits the budget."""
    target = max(budget // max(per_row * 15, 1), 1)
    b = min(gx, target)
    while b > 1 and gx % b:
        b -= 1
    return b


def fuse_supported(grid_shape) -> bool:
    # capability: blocks span the full (Y, Z) trailing dims, which Pallas
    # accepts for any extent ("...or be equal to the respective dimensions
    # of the overall array"); x always has the divisor 1.
    return len(grid_shape) == 3


def fuse_profitable(grid_shape) -> bool:
    """Whether the kernel WINS over the XLA chain on this grid shape.

    Kernel blocks tile (sublane, lane) on (Y, Z), so a short Z pads
    every 128-lane tile — at the demo grid's gz=36 (72% lanes dead) the
    kernel measured 0.7 ms/batch SLOWER than the XLA chain it replaces,
    while at cow's gz=80 it wins ~1.5 ms (PERF.md rounds 4-5).  XLA
    linearizes elementwise chains and does not pay the pad; the kernel
    cannot without relayout copies (the rejected 2-D flattening, round
    4).  Gate: gz >= 64 (half-tile utilization)."""
    return grid_shape[2] >= 64


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
    window=None,
    x_offset=None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array,
           jax.Array, jax.Array, jax.Array]:
    """One-pass fusion drain.  Returns
    (new_logodds, new_seen, occ_u8, hit_zeroed, miss_zeroed,
     n_observed, n_inserted, n_deleted).

    ``occ_is_eq``: deterministic mode's ``logodds == occ_thresh``
    predicate instead of the probabilistic ``>`` (grid.occupied_grid).

    ``window``: optional (wmin [3] i32, wmax [3] i32) inclusive voxel
    bounds (local-update mode, reference C17): observations outside the
    window are DROPPED — same semantics as ``fusion.fuse_counts`` with a
    window_mask, whose XLA chain costs ~2 ms of full-grid element-rate
    passes at demo scale (PERF.md round 5).  The gate folds into the
    same single pass as three iota compares per axis (SMEM scalars).
    ``x_offset``: optional i32 scalar added to the block's x coordinate
    — the shard_map caller passes its slab origin so window bounds stay
    GLOBAL coordinates.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gx, gy, gz = logodds.shape
    cx = _chunk_x(gx, gy * gz)
    nb = gx // cx
    seen_dt = seen.dtype
    lh = np.float32(l_hit)
    lm = np.float32(l_miss)
    cmin = np.float32(clamp_min)
    cmax = np.float32(clamp_max)
    thr = np.float32(occ_thresh)
    windowed = window is not None

    def occ_of(lo):
        return (lo == thr) if occ_is_eq else (lo > thr)

    def kernel(*refs):
        if windowed:
            (win_ref, lo_ref, seen_ref, hit_ref, miss_ref,
             lo_o, seen_o, occ_o, hit_o, miss_o, cnt_o) = refs
        else:
            (lo_ref, seen_ref, hit_ref, miss_ref,
             lo_o, seen_o, occ_o, hit_o, miss_o, cnt_o) = refs
        lo = lo_ref[:]
        hit = hit_ref[:]
        miss = miss_ref[:]
        # compares run on i32: Mosaic on this toolchain rejects u8 vector
        # comparisons ("Target does not support this comparison")
        hit32 = hit.astype(jnp.int32)
        miss32 = miss.astype(jnp.int32)
        obs = miss32 > 0
        if windowed:
            g = pl.program_id(0)
            shape = (cx, gy, gz)
            xs = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                  + g * cx + win_ref[6])
            ys = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            zs = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
            obs = (obs
                   & (xs >= win_ref[0]) & (xs <= win_ref[3])
                   & (ys >= win_ref[1]) & (ys <= win_ref[4])
                   & (zs >= win_ref[2]) & (zs <= win_ref[5]))
        is_hit = (2 * hit32) >= miss32
        new = jnp.clip(lo + jnp.where(is_hit, lh, lm), cmin, cmax)
        new = jnp.where(obs, new, lo)
        occ_b = occ_of(lo)
        occ_a = occ_of(new)
        lo_o[:] = new
        seen_o[:] = seen_ref[:] | obs.astype(seen_dt)
        occ_o[:] = occ_a.astype(jnp.uint8)
        hit_o[:] = jnp.zeros_like(hit)
        miss_o[:] = jnp.zeros_like(miss)
        n_obs = jnp.sum(obs.astype(jnp.int32))
        n_ins = jnp.sum((occ_a & ~occ_b).astype(jnp.int32))
        n_del = jnp.sum((~occ_a & occ_b).astype(jnp.int32))
        # partials ride an (8, 128) tile (the minimum legal block); the
        # three counts land on sublane 0, lanes 0..2
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        row = (jnp.where(lane == 0, n_obs, 0)
               + jnp.where(lane == 1, n_ins, 0)
               + jnp.where(lane == 2, n_del, 0))
        cnt_o[:] = jnp.where(sub == 0, row, 0)

    def spec(dt):  # noqa: ARG001 (dtype rides out_shape)
        return pl.BlockSpec((cx, gy, gz), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    cnt_spec = pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [spec(None)] * 4
    args = [logodds, seen, hit_cnt, miss_cnt]
    if windowed:
        wmin, wmax = window
        xoff = (jnp.int32(0) if x_offset is None
                else jnp.asarray(x_offset, jnp.int32))
        # [x0,y0,z0, x1,y1,z1, xoff, pad] as SMEM scalars; the block's
        # global x = local x + xoff (shard_map slab origin)
        win = jnp.concatenate([
            jnp.asarray(wmin, jnp.int32).reshape(3),
            jnp.asarray(wmax, jnp.int32).reshape(3),
            xoff.reshape(1), jnp.zeros(1, jnp.int32)])
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [win] + args
        aliases = {1: 0, 2: 1, 3: 3, 4: 4}
    else:
        aliases = {0: 0, 1: 1, 2: 3, 3: 4}
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(spec(None),) * 5 + (cnt_spec,),
        out_shape=(
            jax.ShapeDtypeStruct((gx, gy, gz), jnp.float32),
            jax.ShapeDtypeStruct((gx, gy, gz), seen_dt),
            jax.ShapeDtypeStruct((gx, gy, gz), jnp.uint8),
            jax.ShapeDtypeStruct((gx, gy, gz), jnp.uint8),
            jax.ShapeDtypeStruct((gx, gy, gz), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32),
        ),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    new_lo, new_seen, occ, hit0, miss0, cnt = out
    sums = jnp.sum(cnt, axis=(0, 1))
    return (new_lo, new_seen, occ, hit0, miss0,
            sums[0], sums[1], sums[2])
