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
    if state.closest.ndim == 3:
        # packed rebuild format (grid.closest_packed_state): rebase each
        # 10-bit coordinate field, evict pointers leaving the grid
        closest = _shift_fill(state.closest, shift, jnp.int32(-1))
        defined = closest >= 0
        x = (closest >> 20) - shift[0]
        y = ((closest >> 10) & 1023) - shift[1]
        z = (closest & 1023) - shift[2]
        gx, gy, gz = state.d2.shape
        in_grid = ((x >= 0) & (x < gx) & (y >= 0) & (y < gy)
                   & (z >= 0) & (z < gz))
        d2 = jnp.where(defined & ~in_grid, INF_D2, d2)
        closest = jnp.where(defined & in_grid,
                            (x << 20) | (y << 10) | z, jnp.int32(-1))
        return MapState(logodds=logodds, d2=d2, closest=closest,
                        seen=seen, hit_cnt=hit_cnt, miss_cnt=miss_cnt)
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


class ScrollingMixin:
    """The scrolling-grid / persistent-archive machinery, engine-agnostic.

    Mixed into an engine class (single-device ``FiestaPipeline`` or the
    multi-chip ``parallel.engine.ShardedFiestaPipeline``) ahead of it in
    the MRO.  The engine provides ``state``/``cfg``/``process``/queries;
    two hooks let engines specialize the device work:

      * ``_drain_counters()`` — flush pending hit/miss counters through
        one fusion+EDT tick (single-device: ``pipeline.esdf_update``;
        sharded: the sharded tick with an empty scan batch);
      * ``_reshard_state()`` — re-pin state array shardings after host
        restores mutate them (no-op on one device).
    """

    def _init_scrolling(self, recenter_fraction: float, archive) -> None:
        self.origin_vox = np.zeros(3, np.int64)
        # recenter when the robot leaves the central box of this fraction
        self.recenter_fraction = recenter_fraction
        self.scroll_count = 0
        if archive is True:
            from .archive import TileArchive

            archive = TileArchive()
        self.archive = archive
        self.restore_count = 0
        if archive is not None and archive.num_tiles:
            self._hydrate_from_archive()

    def _drain_counters(self) -> None:
        from .pipeline import esdf_update

        self.state, _ = esdf_update(
            self.cfg, self.state, jnp.asarray(self.cur_pos, jnp.float32),
            use_window=not self.cfg.global_update,
        )

    def _reshard_state(self) -> None:
        pass

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
        if self.archive is not None:
            return self._recenter_persistent(robot_pos)
        shift_vox = np.round(off / cfg.resolution).astype(np.int64)
        # clamp so the dynamic-slice shift stays within +-grid
        lims = np.asarray(cfg.grid_shape, np.int64) - 1
        shift_vox = np.clip(shift_vox, -lims, lims)
        self._apply_scroll(shift_vox)
        self._reshard_state()
        return True

    def _apply_scroll(self, shift_vox: np.ndarray) -> None:
        self.state = scroll_state(self.state, jnp.asarray(shift_vox, jnp.int32))
        self.origin_vox = self.origin_vox + shift_vox
        # rebase the cached robot position into the new virtual frame (the
        # next processed frame overwrites it; this keeps the local-update
        # window correct when a scroll fires without a matched scan)
        self.cur_pos = np.asarray(self.cur_pos) \
            - shift_vox * self.cfg.resolution
        # ... and the depth consistency filter's previous-frame transform
        # (Fiesta.h:356-377 reprojects into it): left un-rebased it would
        # be off by shift*resolution after a recenter and the filter would
        # reject nearly every point of the next depth frame
        if self.last_transform is not None:
            t = self.last_transform.copy()
            t[:3, 3] -= shift_vox * self.cfg.resolution
            self.last_transform = t
        self.scroll_count += 1
        # engines that cache a derived planning grid must drop it: the map
        # content just moved frames (harmless where no cache exists)
        self._dist_cache = None
        self._sdf_cache = None

    # -- persistent-world plumbing (reference C3: HASH_TABLE block map) ----

    def _hydrate_from_archive(self) -> None:
        """Fill the initial window from a preloaded directory (cross-run
        resume).  Without this, a loaded archive would not answer queries
        over already-explored start-region space — and the first store of
        the unhydrated window would ERASE that content from the directory
        (store() must let all-unseen writes land so forgetting sticks)."""
        import dataclasses

        lo_np, seen_np, any_data = self.archive.load(
            self.origin_vox, self.cfg.grid_shape
        )
        if not any_data:
            return
        self.state = dataclasses.replace(
            self.state,
            logodds=jnp.asarray(lo_np),
            seen=jnp.asarray(seen_np),
        )
        self._rederive_distances()
        self._reshard_state()

    def _recenter_persistent(self, robot_pos) -> bool:
        """Recenter in FIXED steps of grid/4 per axis.

        One step size means the evicted/entered strip transfers compile to
        one program per axis and direction — a variable-shape shift would
        recompile the host<->device strip programs on every recenter
        (20-40 s each through the TPU tunnel).  A far-away robot takes
        several steps of the same programs; distances re-derive once at
        the end.
        """
        cfg = self.cfg
        n = np.asarray(cfg.grid_shape, np.int64)
        step = np.maximum(n // 4, 1)
        half = np.asarray(cfg.map_size) / 2

        def _trig(center_off):
            off_vox = np.abs(center_off) / cfg.resolution
            # the step/2 gate guarantees each step strictly shrinks |off|
            # (no oscillation when recenter_fraction < 0.25); the robot
            # ends within max(threshold, step/2) of center
            return (np.abs(center_off) > self.recenter_fraction * half) \
                & (off_vox > step / 2)

        # cheap pre-check: when recenter_fraction < 0.25 there is a dead
        # band where |off| exceeds the fraction threshold (so maybe_recenter
        # routes here every frame) but no fixed step will actually fire —
        # bail before paying the full counter-drain tick below
        if not _trig(np.asarray(robot_pos, np.float64)
                     - (self.world_origin + half)).any():
            return False
        # drain pending hit/miss counters into log-odds BEFORE evicting:
        # the strip's accumulated observations would otherwise scroll off
        # the counter grids and be lost, while the reference's
        # never-evicting block map retains them (an early fusion tick is
        # semantically fine — the reference drains on every timer tick)
        self._drain_counters()
        restored = False
        scrolled = False
        for _ in range(64):
            center = self.world_origin + half
            off = np.asarray(robot_pos, np.float64) - center
            trig = _trig(off)
            if not trig.any():
                break
            shift_vox = np.where(trig, np.sign(off).astype(np.int64) * step,
                                 0)
            self._archive_evicted(shift_vox)
            self._apply_scroll(shift_vox)
            restored |= self._restore_entered(shift_vox)
            scrolled = True
        if restored:
            self._rederive_distances()
        if scrolled:
            self._reshard_state()
        return scrolled

    def _axis_strip(self, shift_vox, axis: int, entering: bool):
        """Slices of the strip along ``axis`` that leaves (entering=False,
        old frame) or enters (entering=True, new frame) the grid."""
        s = int(shift_vox[axis])
        n = self.cfg.grid_shape[axis]
        sl = [slice(None)] * 3
        if entering:
            sl[axis] = slice(n - s, n) if s > 0 else slice(0, -s)
        else:
            sl[axis] = slice(0, s) if s > 0 else slice(n + s, n)
        return tuple(sl)

    def _archive_evicted(self, shift_vox: np.ndarray) -> None:
        """Pull the strips about to leave the grid to the host directory.

        Up to three strips (one per shifted axis); corner overlaps store
        identical data twice, which is idempotent.  This is the only
        device->host readback in the pipeline and fires at recenter
        cadence (minutes apart), never per scan.
        """
        for ax in range(3):
            if int(shift_vox[ax]) == 0:
                continue
            sl = self._axis_strip(shift_vox, ax, entering=False)
            lo_np, seen_np = jax.device_get(
                (self.state.logodds[sl], self.state.seen[sl])
            )
            starts = np.array([s.indices(n)[0] for s, n in
                               zip(sl, self.cfg.grid_shape)], np.int64)
            self.archive.store(self.origin_vox + starts, lo_np, seen_np)

    def _restore_entered(self, shift_vox: np.ndarray) -> bool:
        """Fill the strips that entered the grid from the directory.

        Returns whether anything was restored; the caller re-derives
        distances once after its recenter loop settles."""
        import dataclasses

        cfg = self.cfg
        restored = False
        for ax in range(3):
            if int(shift_vox[ax]) == 0:
                continue
            sl = self._axis_strip(shift_vox, ax, entering=True)
            idx = [s.indices(n) for s, n in zip(sl, cfg.grid_shape)]
            shape = tuple(i[1] - i[0] for i in idx)
            starts = np.array([i[0] for i in idx], np.int64)
            lo_np, seen_np, any_data = self.archive.load(
                self.origin_vox + starts, shape
            )
            if not any_data:
                continue
            self.state = dataclasses.replace(
                self.state,
                logodds=self.state.logodds.at[sl].set(jnp.asarray(lo_np)),
                seen=self.state.seen.at[sl].set(jnp.asarray(seen_np)),
            )
            restored = True
        return restored

    def _rederive_distances(self) -> None:
        """Re-derive d2/closest from the post-restore occupancy."""
        import dataclasses

        from .grid import occupied_grid
        from .ops import esdf

        cfg = self.cfg
        self.restore_count += 1
        occ = occupied_grid(cfg, self.state.logodds)
        if cfg.esdf_mode == "rebuild":
            # module-level cached jit: a per-call jax.jit wrapper would
            # retrace+recompile the whole EDT program on EVERY restore.
            # The TICK variant respects lazy closest mode (the restore
            # leaves closest untouched there; queries re-derive via
            # closest_grid, whose d2-identity cache this invalidates)
            from .pipeline import tick_rebuild_esdf_jit

            d2, closest = tick_rebuild_esdf_jit(cfg, occ)
            self.state = dataclasses.replace(
                self.state, d2=d2,
                closest=self.state.closest if closest is None else closest,
            )
        else:
            # seed every occupied voxel whose distance is not already zero
            # (frame-independent: covers all restored obstacles) and relax
            # globally to fixpoint; apply_occupancy_changes resets any
            # voxel whose recorded closest obstacle was evicted, so the
            # kept region re-settles against the restored content too
            insert = occ & (self.state.d2 != 0)
            d2, closest, _ = esdf.update_esdf(
                self.state.d2, self.state.closest, occ, insert,
                jnp.zeros(cfg.grid_shape, bool), None, cfg.relax_dirs,
            )
            self.state = dataclasses.replace(
                self.state, d2=d2, closest=closest
            )

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

    def query_closest_obstacle(self, positions):
        """World-frame closest-obstacle query: positions shift into the
        virtual frame, returned obstacle coordinates shift back out."""
        import jax.numpy as jnp

        p = np.asarray(positions, np.float64) - self._offset_m()
        pts, dist = super().query_closest_obstacle(p)
        off = jnp.asarray(self._offset_m(), pts.dtype)
        return jnp.where(jnp.isnan(pts), pts, pts + off), dist

    def occupied_world_points(self) -> np.ndarray:
        """World positions of occupied voxel centers."""
        from .viz import occupied_pointcloud

        pts = occupied_pointcloud(self.cfg, self.state,
                                  vis_lower_bound=-1e9, vis_upper_bound=1e9)
        return pts + self._offset_m()


class ScrollingFiestaPipeline(ScrollingMixin, FiestaPipeline):
    """FiestaPipeline over an unbounded world.

    The dense grid covers a moving box; ``origin_vox`` tracks its world
    anchor in voxels.  Sensor inputs are shifted into the virtual frame, so
    every op (carve, fusion, EDT, queries) runs unchanged.

    With ``archive`` set (a ``TileArchive`` instance, or ``True`` for a
    default one) the explored world is PERSISTENT, like the reference's
    hash-block map (``#ifdef HASH_TABLE``, src/ESDFMap.cpp:128-167):
    recenters archive the evicted strips to the host tile directory and
    restore previously-explored content in the entered strips, then
    re-derive distances.  Recentering then moves in FIXED grid/4 steps so
    every strip transfer reuses one compiled program per axis/direction;
    host<->device traffic happens only at recenter events.

    The multi-chip twin is ``parallel.engine.ShardedScrollingFiestaPipeline``
    (same machinery over the sharded tick).
    """

    def __init__(self, cfg: FiestaConfig, method: str = "scanline",
                 recenter_fraction: float = 0.25, archive=None):
        super().__init__(cfg, method=method)
        self._init_scrolling(recenter_fraction, archive)
