"""Probabilistic occupancy fusion (reference component C4).

Reference semantics (src/ESDFMap.cpp:235-271, 401-450):

  * every ray observation increments ``num_miss``; endpoint hits also
    increment ``num_hit`` (SetOccupancy, ESDFMap.cpp:417-437);
  * at update time each queued voxel applies ONE clamped log-odds step, a
    "hit" iff ``num_hit >= num_miss - num_hit`` (i.e. 2*hit >= miss,
    ESDFMap.cpp:243), then counters reset;
  * occupancy flips emit insert/delete events (ESDFMap.cpp:263-267).

TPU-native form: the occupancy queue is the dense mask ``miss_cnt > 0`` (a
voxel is queued on first touch, ESDFMap.cpp:424-435); the whole drain loop
becomes one elementwise kernel producing flip masks, which XLA fuses.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import FiestaConfig
from ..grid import occupied_grid, vox_in_grid, vox_to_idx


class FusionResult(NamedTuple):
    logodds: jax.Array       # updated log-odds
    seen: jax.Array          # updated observed mask
    occupied: jax.Array      # occupancy AFTER the update
    insert_mask: jax.Array   # flipped free -> occupied (insert_queue_)
    delete_mask: jax.Array   # flipped occupied -> free (delete_queue_)
    num_observed: jax.Array  # queued-voxel count (occupancy_queue_.size())


def fuse_counts(
    cfg: FiestaConfig,
    logodds: jax.Array,
    seen: jax.Array,
    hit_cnt: jax.Array,
    miss_cnt: jax.Array,
    window_mask=None,
) -> FusionResult:
    """Drain the observation counters into log-odds (UpdateOccupancy).

    ``window_mask``: optional bool [X,Y,Z]; observations outside it are
    dropped (local-update mode; the reference instead resets such voxels in
    a way SURVEY.md flags as an accidental quirk, ESDFMap.cpp:256-262 — here
    the clean semantics is "out-of-window observations do not apply").
    """
    observed = miss_cnt > 0
    if window_mask is not None:
        observed = observed & window_mask

    # Vote rule (ESDFMap.cpp:243).  Counters are uint8; widen so the
    # doubled hit count cannot wrap.
    is_hit = (2 * hit_cnt.astype(jnp.int32)) >= miss_cnt.astype(jnp.int32)
    l_update = jnp.where(is_hit, cfg.prob_hit_log, cfg.prob_miss_log).astype(
        jnp.float32
    )

    occ_before = occupied_grid(cfg, logodds)
    new_lo = jnp.clip(
        logodds + l_update, cfg.clamp_min_log, cfg.clamp_max_log
    ).astype(jnp.float32)
    new_lo = jnp.where(observed, new_lo, logodds)

    occ_after = occupied_grid(cfg, new_lo)
    insert_mask = occ_after & ~occ_before
    delete_mask = ~occ_after & occ_before
    return FusionResult(
        logodds=new_lo,
        seen=seen | observed,
        occupied=occ_after,
        insert_mask=insert_mask,
        delete_mask=delete_mask,
        num_observed=jnp.sum(observed, dtype=jnp.int32),
    )


def set_occupancy_direct(
    cfg: FiestaConfig,
    logodds: jax.Array,
    vox: jax.Array,
    occ: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deterministic (non-probabilistic) direct occupancy write, C5.

    Reference: the ``#ifndef PROBABILISTIC`` branch of SetOccupancy
    (ESDFMap.cpp:438-450) — binary occupancy with flip detection.  (The
    reference's deterministic branch does not compile as shipped; SURVEY.md
    directs a clean re-specification, which this is.)

    Args:
      vox: [N,3] int voxels;  occ: [N] in {0,1}  (later writes win).

    Returns (new_logodds, insert_mask, delete_mask).
    """
    gx, gy, gz = cfg.grid_shape
    valid = vox_in_grid(cfg, vox)
    # high sentinel: mode="drop" drops out-of-bounds, but -1 would wrap
    lin = jnp.where(valid, vox_to_idx(cfg, vox), gx * gy * gz)
    # "later writes win" must be deterministic; scatter-set with duplicate
    # indices is not, so pack (write order, occ) and take the max — the
    # highest order index (= latest write) decides the voxel
    order = jnp.arange(occ.shape[0], dtype=jnp.int32)
    packed = jnp.full((gx * gy * gz,), -1, jnp.int32).at[lin].max(
        order * 2 + occ.astype(jnp.int32), mode="drop"
    )
    flat = logodds.reshape(-1)
    # write values the active occupancy predicate recognizes: the
    # deterministic mode tests logodds == 1.0, the probabilistic mode
    # thresholds at min_occupancy_log (= logit(p_occ) ~ 1.386 by default,
    # which a raw 1.0 would NOT cross — the flip masks would invert)
    if cfg.probabilistic:
        on, off = cfg.clamp_max_log, cfg.clamp_min_log
    else:
        on, off = 1.0, 0.0
    written = jnp.where((packed & 1) == 1, jnp.float32(on),
                        jnp.float32(off))
    new_flat = jnp.where(packed >= 0, written, flat)
    new_lo = new_flat.reshape(logodds.shape)
    occ_before = occupied_grid(cfg, logodds)
    occ_after = occupied_grid(cfg, new_lo)
    return new_lo, occ_after & ~occ_before, ~occ_after & occ_before
