"""Voxel grid state and addressing.

Reference parity (component C1/C2 in SURVEY.md):
  * pos<->vox<->idx conversions: ``src/ESDFMap.cpp:46-118``
  * dense array backend allocation: ``src/ESDFMap.cpp:171-213``

TPU-native design notes
-----------------------
The reference stores eight flat arrays plus doubly-linked-list bookkeeping
(``head_/prev_/next_``) so CPU deletions can enumerate exactly the voxels
bucketized under a deleted obstacle.  On TPU the state is a small pytree of
dense 3-D arrays; the "bucket" of obstacle ``o`` is recovered densely as the
mask ``closest == o`` so no linked lists are needed.

Distances are stored as *squared* distances in voxel units (``int32``): all
comparisons the reference does on ``double`` Euclidean distances
(``ESDFMap.cpp:122-126``) are monotone in the squared integer, so integer
min-relaxation reproduces them exactly (and deterministically, with no
floating-point ties).  Metric distance is materialized only at query time as
``sqrt(d2) * resolution``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import FiestaConfig

# Sentinels.
# NB: numpy scalars, NOT jnp — a module-level jnp constant initializes
# the default backend at import time (before run.py/conftest can pin
# the platform) and commits the scalar to that device; every jaxpr
# closing over it then embeds a device constant whose value fetch rides
# the TPU tunnel during lowering (observed: intermittent multi-minute
# compile stalls in --platform cpu subprocesses).
UNDEFINED_COORD = np.int16(-1)        # closest-obstacle "undefined" marker
INF_D2 = np.int32(1 << 29)            # squared-distance infinity (voxel units)
# reference "undefined_" return value for out-of-map queries (ESDFMap.cpp:182)
UNDEFINED_DIST = -10000.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapState:
    """Device-resident ESDF map state.

    Shapes: all arrays are [X, Y, Z] except ``closest`` which is [3, X, Y, Z].

    Fields (reference analog in parens):
      logodds  f32  occupancy log-odds        (occupancy_buffer_, ESDFMap.h:75)
      d2       i32  squared distance, voxels  (distance_buffer_,  ESDFMap.h:76)
      closest  i32  closest-obstacle coords   (closest_obstacle_, ESDFMap.h:79)
                    PACKED x<<20|y<<10|z, [X,Y,Z], -1 = undefined when
                    ``closest_packed_state(cfg)`` (the rebuild production
                    format: one N-element write per tick instead of 3N);
                    else i16 [3,X,Y,Z] coordinate planes (the incremental
                    queue engine's native form)
      seen     u8   voxel ever observed, {0,1} (distance_buffer_ >= 0 test;
                    u8 rather than bool because Mosaic widens i1 kernel IO
                    to i32 — 4x VMEM + convert passes — while u8 blocks
                    alias straight through ops/pallas/fuse.py)
      hit_cnt  u8   per-update hit counter    (num_hit_,  ESDFMap.h:77)
      miss_cnt u8   per-update miss counter   (num_miss_, ESDFMap.h:77)

    The counters are per-tick scratch (drained and zeroed by every fusion,
    ESDFMap.cpp:268-270): each scan adds at most 1 hit and 2 misses per
    voxel, so uint8 holds >= 127 scans per tick — far beyond the
    reference's ~3 frames per 10 Hz drain — at 1/4 the HBM traffic of the
    reference-matching int.  Accumulation is SATURATING at 255
    (raycast._sat_add_u8), so pathological cadences degrade gracefully
    instead of wrapping.
    """

    logodds: jax.Array
    d2: jax.Array
    closest: jax.Array
    seen: jax.Array
    hit_cnt: jax.Array
    miss_cnt: jax.Array


def closest_packed_state(cfg: FiestaConfig) -> bool:
    """Whether ``MapState.closest`` uses the PACKED format: one int32
    grid with ``x<<20 | y<<10 | z`` (-1 = undefined) instead of three
    int16 coordinate planes.

    Why: the rebuild tick re-materializes closest every update; the
    [3,X,Y,Z] i16 form is a 3N-element write that runs at the TPU's
    element rate (~1.5 ms/tick at cow scale — PERF.md round 4), while
    the packed form is one N-element write.  Readers decode on demand
    (``unpack_closest`` / per-point bit ops in ops.query).  Only grids
    with per-axis extent <= 1024 fit 10-bit fields; the incremental
    queue engine keeps the plane format it was built around."""
    return (cfg.esdf_mode == "rebuild" and cfg.track_closest
            and all(g <= 1024 for g in cfg.grid_shape))


def pack_closest(planes: jax.Array) -> jax.Array:
    """[3, X, Y, Z] coordinate planes -> packed int32 [X, Y, Z]."""
    c = planes.astype(jnp.int32)
    return jnp.where(c[0] >= 0,
                     (c[0] << 20) | (c[1] << 10) | c[2],
                     jnp.int32(-1))


def unpack_closest(packed: jax.Array) -> jax.Array:
    """Packed int32 [...] -> [3, ...] int16 planes (UNDEFINED_COORD
    where undefined)."""
    defined = packed >= 0
    u = jnp.int16(UNDEFINED_COORD)
    return jnp.stack([
        jnp.where(defined, (packed >> 20).astype(jnp.int16), u),
        jnp.where(defined, ((packed >> 10) & 1023).astype(jnp.int16), u),
        jnp.where(defined, (packed & 1023).astype(jnp.int16), u),
    ])


def make_state(cfg: FiestaConfig) -> MapState:
    """Allocate an empty map (reference ctor ESDFMap.cpp:171-213)."""
    shape = cfg.grid_shape
    if closest_packed_state(cfg):
        closest = jnp.full(shape, -1, jnp.int32)
    else:
        closest = jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16)
    return MapState(
        logodds=jnp.zeros(shape, jnp.float32),
        d2=jnp.full(shape, INF_D2, jnp.int32),
        closest=closest,
        seen=jnp.zeros(shape, jnp.uint8),
        hit_cnt=jnp.zeros(shape, jnp.uint8),
        miss_cnt=jnp.zeros(shape, jnp.uint8),
    )


# ---------------------------------------------------------------------------
# Coordinate conversions (vectorized; reference ESDFMap.cpp:46-118)
# ---------------------------------------------------------------------------


def pos_to_vox(cfg: FiestaConfig, pos: jax.Array) -> jax.Array:
    """World position [..., 3] -> integer voxel [..., 3] (ESDFMap.cpp:74-77)."""
    origin = jnp.asarray(cfg.origin, pos.dtype)
    return jnp.floor((pos - origin) / cfg.resolution).astype(jnp.int32)


def vox_to_pos(cfg: FiestaConfig, vox: jax.Array) -> jax.Array:
    """Voxel [..., 3] -> world position of voxel center (ESDFMap.cpp:79-82)."""
    origin = jnp.asarray(cfg.origin, jnp.float32)
    return (vox.astype(jnp.float32) + 0.5) * cfg.resolution + origin


def vox_to_idx(cfg: FiestaConfig, vox: jax.Array) -> jax.Array:
    """Voxel [..., 3] -> linear index x*YZ + y*Z + z (ESDFMap.cpp:84-93)."""
    _, gy, gz = cfg.grid_shape
    v = vox.astype(jnp.int32)
    return v[..., 0] * (gy * gz) + v[..., 1] * gz + v[..., 2]


def idx_to_vox(cfg: FiestaConfig, idx: jax.Array) -> jax.Array:
    """Linear index -> voxel [..., 3] (ESDFMap.cpp:109-118)."""
    _, gy, gz = cfg.grid_shape
    x = idx // (gy * gz)
    y = (idx % (gy * gz)) // gz
    z = idx % gz
    return jnp.stack([x, y, z], axis=-1)


def pos_in_map(cfg: FiestaConfig, pos: jax.Array) -> jax.Array:
    """Bounds check on world positions [..., 3] (ESDFMap.cpp:46-61)."""
    lo = jnp.asarray(cfg.origin, pos.dtype)
    hi = lo + jnp.asarray(cfg.map_size, pos.dtype)
    return jnp.all((pos >= lo) & (pos <= hi), axis=-1)


def vox_in_grid(cfg: FiestaConfig, vox: jax.Array) -> jax.Array:
    """Voxel bounds check against the allocated grid."""
    shape = jnp.asarray(cfg.grid_shape, jnp.int32)
    return jnp.all((vox >= 0) & (vox < shape), axis=-1)


def vox_in_window(vox: jax.Array, min_vec: jax.Array, max_vec: jax.Array) -> jax.Array:
    """Inclusive window check, reference VoxInRange (ESDFMap.cpp:63-72)."""
    return jnp.all((vox >= min_vec) & (vox <= max_vec), axis=-1)


# ---------------------------------------------------------------------------
# Update-range windows (reference ESDFMap.cpp:792-824, component C17)
# ---------------------------------------------------------------------------


def full_window(cfg: FiestaConfig) -> Tuple[jax.Array, jax.Array]:
    """SetOriginalRange (ESDFMap.cpp:812-824): the whole grid."""
    gx, gy, gz = cfg.grid_shape
    return (jnp.zeros(3, jnp.int32),
            jnp.asarray([gx - 1, gy - 1, gz - 1], jnp.int32))


def local_window(cfg: FiestaConfig, center_pos: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """SetUpdateRange(cur - radius, cur + radius) (ESDFMap.cpp:792-810).

    Positions are clamped to the map AABB, then min gets Pos2Vox(min) and max
    gets Pos2Vox(max - res/2), exactly as the reference.
    """
    radius = jnp.asarray(cfg.radius, jnp.float32)
    lo = jnp.asarray(cfg.origin, jnp.float32)
    hi = lo + jnp.asarray(cfg.map_size, jnp.float32)
    min_pos = jnp.clip(center_pos - radius, lo, hi)
    max_pos = jnp.clip(center_pos + radius, lo, hi)
    min_vec = pos_to_vox(cfg, min_pos)
    max_vec = pos_to_vox(cfg, max_pos - 0.5 * cfg.resolution)
    return min_vec, max_vec


def local_window_np(cfg: FiestaConfig, center_pos) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (NumPy) twin of ``local_window`` — avoids device dispatches
    for per-frame window computation.  Computed in float32 so the voxel
    bounds are BIT-IDENTICAL to the jitted float32 ``local_window`` (a
    float64 variant can floor one voxel differently near boundaries,
    desynchronizing the carve window from the fusion window within a
    tick)."""
    center = np.asarray(center_pos, np.float32)
    radius = np.asarray(cfg.radius, np.float32)
    lo = np.asarray(cfg.origin, np.float32)
    hi = lo + np.asarray(cfg.map_size, np.float32)
    min_pos = np.clip(center - radius, lo, hi)
    max_pos = np.clip(center + radius, lo, hi)
    res = np.float32(cfg.resolution)
    min_vec = np.floor((min_pos - lo) / res).astype(np.int32)
    max_vec = np.floor(
        (max_pos - np.float32(0.5) * res - lo) / res
    ).astype(np.int32)
    return min_vec, max_vec


def window_mask(cfg: FiestaConfig, min_vec: jax.Array, max_vec: jax.Array) -> jax.Array:
    """Dense [X, Y, Z] bool mask of voxels inside the inclusive window."""
    gx, gy, gz = cfg.grid_shape
    xs = jnp.arange(gx, dtype=jnp.int32)
    ys = jnp.arange(gy, dtype=jnp.int32)
    zs = jnp.arange(gz, dtype=jnp.int32)
    mx = (xs >= min_vec[0]) & (xs <= max_vec[0])
    my = (ys >= min_vec[1]) & (ys <= max_vec[1])
    mz = (zs >= min_vec[2]) & (zs <= max_vec[2])
    return mx[:, None, None] & my[None, :, None] & mz[None, None, :]


def coord_grids(shape: Tuple[int, int, int]) -> jax.Array:
    """[3, X, Y, Z] int16 self-coordinates (for closest-obstacle seeding)."""
    gx, gy, gz = shape
    cx = jax.lax.broadcasted_iota(jnp.int16, shape, 0)
    cy = jax.lax.broadcasted_iota(jnp.int16, shape, 1)
    cz = jax.lax.broadcasted_iota(jnp.int16, shape, 2)
    return jnp.stack([cx, cy, cz])


def occupied_grid(cfg: FiestaConfig, logodds: jax.Array) -> jax.Array:
    """Occupancy predicate `Exist` (ESDFMap.cpp:16-22)."""
    if cfg.probabilistic:
        return logodds > cfg.min_occupancy_log
    return logodds == 1.0


def state_bytes(state: MapState) -> int:
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize
               for a in jax.tree_util.tree_leaves(state))
