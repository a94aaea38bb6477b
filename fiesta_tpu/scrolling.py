"""Unbounded-world mapping via a scrolling grid (reference component C3).

The reference's answer to unbounded worlds is a spatial-hash block map
(``#ifdef HASH_TABLE``, src/ESDFMap.cpp:128-167, 704-783): an
``unordered_map`` from 8^3-voxel block ids to storage, growing by doubling.
Pointer-chasing hash tables are the opposite of what a TPU wants; the
TPU-native equivalent is a **scrolling dense grid**: a fixed HBM-resident
box that recenters around the robot, shifting surviving content and
resetting the evicted/entered region (the standard GPU rolling-buffer map
design).  Combined with the carve box and truncated-EDT rebuild, all
per-update work is already independent of world size; the scroll shift is a
single fused copy (~milliseconds) that fires only when the robot strays
from the grid center.

Coordinates: the grid covers the world AABB
``cfg.origin + origin_vox * resolution  ..  + map_size``.  All ops keep
working in the fixed virtual frame anchored at ``cfg.origin`` by shifting
their world-frame inputs/outputs by ``origin_vox * resolution``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import FiestaConfig
from .grid import INF_D2, MapState, UNDEFINED_COORD
from .pipeline import FiestaPipeline


def _shift_fill(arr: jax.Array, shift: jax.Array, fill) -> jax.Array:
    """Shift the last 3 dims of ``arr`` by -shift voxels, filling entered
    space: out[v] = arr[v + shift], with a traced shift bounded by the grid.

    One axis at a time (pad to 3x along that axis, dynamic-slice back) so
    the transient stays at 3x one field rather than 27x.
    """
    out = arr
    lead = arr.ndim - 3
    for i in range(3):
        ax = lead + i
        n = out.shape[ax]
        pads = [(0, 0)] * arr.ndim
        pads[ax] = (n, n)
        padded = jnp.pad(out, pads, constant_values=fill)
        out = jax.lax.dynamic_slice_in_dim(padded, n + shift[i], n, axis=ax)
    return out


@partial(jax.jit, donate_argnames=("state",))
def scroll_state(state: MapState, shift: jax.Array) -> MapState:
    """Recenter the map by ``shift`` voxels: content moves, the region
    entering the grid resets to unknown.  ``closest`` coordinates are
    grid-relative and are re-based by -shift."""
    logodds = _shift_fill(state.logodds, shift, 0.0)
    d2 = _shift_fill(state.d2, shift, INF_D2)
    seen = _shift_fill(state.seen, shift, False)
    hit_cnt = _shift_fill(state.hit_cnt, shift, 0)
    miss_cnt = _shift_fill(state.miss_cnt, shift, 0)
    closest = _shift_fill(state.closest, shift, UNDEFINED_COORD)
    defined = closest[0] >= 0
    rebased = closest - shift.astype(jnp.int16)[:, None, None, None]
    closest = jnp.where(defined[None], rebased, UNDEFINED_COORD)
    # rebasing can push a closest pointer outside the grid: those voxels
    # lose their obstacle (it was evicted) and reset to unknown distance
    gx, gy, gz = state.d2.shape
    lims = jnp.array([gx, gy, gz], jnp.int16)
    in_grid = jnp.all(
        (closest >= 0) & (closest < lims[:, None, None, None]), axis=0
    )
    d2 = jnp.where(defined & ~in_grid, INF_D2, d2)
    closest = jnp.where((defined & ~in_grid)[None], UNDEFINED_COORD, closest)
    return MapState(logodds=logodds, d2=d2, closest=closest, seen=seen,
                    hit_cnt=hit_cnt, miss_cnt=miss_cnt)


class ScrollingFiestaPipeline(FiestaPipeline):
    """FiestaPipeline over an unbounded world.

    The dense grid covers a moving box; ``origin_vox`` tracks its world
    anchor in voxels.  Sensor inputs are shifted into the virtual frame, so
    every op (carve, fusion, EDT, queries) runs unchanged.
    """

    def __init__(self, cfg: FiestaConfig, method: str = "scanline",
                 recenter_fraction: float = 0.25):
        super().__init__(cfg, method=method)
        self.origin_vox = np.zeros(3, np.int64)
        # recenter when the robot leaves the central box of this fraction
        self.recenter_fraction = recenter_fraction
        self.scroll_count = 0

    # -- frame bookkeeping -------------------------------------------------

    @property
    def world_origin(self) -> np.ndarray:
        """Current world position of grid cell (0,0,0)'s corner."""
        return (np.asarray(self.cfg.origin)
                + self.origin_vox * self.cfg.resolution)

    def _offset_m(self) -> np.ndarray:
        return self.origin_vox * self.cfg.resolution

    def maybe_recenter(self, robot_pos) -> bool:
        """Scroll the grid so the robot returns to the central region."""
        cfg = self.cfg
        center = self.world_origin + np.asarray(cfg.map_size) / 2
        half = np.asarray(cfg.map_size) / 2
        off = np.asarray(robot_pos, np.float64) - center
        if np.all(np.abs(off) <= self.recenter_fraction * half):
            return False
        shift_vox = np.round(off / cfg.resolution).astype(np.int64)
        # clamp so the dynamic-slice shift stays within +-grid
        lims = np.asarray(cfg.grid_shape, np.int64) - 1
        shift_vox = np.clip(shift_vox, -lims, lims)
        self.state = scroll_state(self.state, jnp.asarray(shift_vox, jnp.int32))
        self.origin_vox = self.origin_vox + shift_vox
        self.scroll_count += 1
        return True

    # -- overridden ingestion (shift world inputs into the virtual frame) --

    def _to_virtual(self, pos) -> np.ndarray:
        return np.asarray(pos, np.float64) - self._offset_m()

    def _build_transform(self, pos, quat) -> np.ndarray:
        t = super()._build_transform(pos, quat)
        t = t.copy()
        t[:3, 3] -= self._offset_m()
        return t

    def process(self) -> int:
        # recenter on the most recent pose before integrating
        if self.sync.poses:
            self.maybe_recenter(self.sync.poses[-1][1])
        return super().process()

    # -- queries (world-frame in, world-frame out) -------------------------

    def query_distance(self, positions):
        p = np.asarray(positions, np.float64) - self._offset_m()
        return super().query_distance(p)

    def query_dist_grad(self, positions):
        p = np.asarray(positions, np.float64) - self._offset_m()
        return super().query_dist_grad(p)

    def occupied_world_points(self) -> np.ndarray:
        """World positions of occupied voxel centers."""
        from .viz import occupied_pointcloud

        pts = occupied_pointcloud(self.cfg, self.state,
                                  vis_lower_bound=-1e9, vis_upper_bound=1e9)
        return pts + self._offset_m()
