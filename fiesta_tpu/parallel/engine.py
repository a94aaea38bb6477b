"""Multi-chip streaming engine: FiestaPipeline over an X-sharded mesh.

``parallel.sharding`` provides the sharded step functions (validated
bit-exact against single-device on a virtual mesh); this module packages
them behind the same observe/process/update API as ``FiestaPipeline``, so
a user with a multi-chip slice runs the SAME application code:

    mesh = sharding.make_mesh(8)          # or distributed_mesh() multi-host
    pipe = ShardedFiestaPipeline(cfg, mesh=mesh)
    pipe.observe_pose(...); pipe.observe_cloud(...)
    pipe.process(); pipe.update()
    d, g = pipe.query_dist_grad(positions)

Differences from the single-device engine (all forced by SPMD mechanics):

  * scans are buffered host-side and integrated at tick time in fixed-size
    groups of ``scans_per_tick`` (static shapes; short groups are padded
    with all-invalid scans, which contribute nothing);
  * depth images back-project + consistency-filter on device at observe
    time (replicated work, small frames), then buffer as cloud pairs for
    the sharded tick;
  * rebuild mode (the queue-semantics incremental engine is the
    single-device validation oracle).  Window mode, the hierarchical
    EDT, closest tracking, and the signed field all shard
    (sharding.sharded_fused_tick, _sharded_sdf).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FiestaConfig
from ..pipeline import FiestaPipeline, UpdateStats
from ..scrolling import ScrollingMixin
from ..timing import Timer
from . import sharding


class ShardedFiestaPipeline(FiestaPipeline):
    """Streaming ESDF engine over a jax device mesh (X-slab sharding)."""

    def __init__(self, cfg: FiestaConfig,
                 mesh: Optional[object] = None,
                 n_devices: Optional[int] = None,
                 scans_per_tick: int = 3):
        super().__init__(cfg, method="scanline")
        self.mesh = mesh if mesh is not None else sharding.make_mesh(
            n_devices or len(jax.devices()))
        self.state = sharding.shard_state(self.state, self.mesh)
        self._tick = sharding.sharded_fused_tick(cfg, self.mesh)
        self.scans_per_tick = int(scans_per_tick)
        self._pending: list = []   # (pts [P,3] np, valid [P] np, T [4,4] np)
        self._derive_closest_fn = None   # lazy-built sharded derive (below)

    def _derive_closest(self):
        """Lazy closest derivation ON THE MESH (closest_grid's backend):
        same answers as the single-device derive, computed shard-locally
        with the composable argmin passes."""
        if self._derive_closest_fn is None:
            self._derive_closest_fn = sharding.sharded_derive_closest(
                self.cfg, self.mesh)
        return self._derive_closest_fn(self.state.logodds)

    # -- ingestion: buffer host-side, integrate at tick time ---------------

    def process(self) -> int:
        n = 0
        for payload, _, pos, quat in self.sync.drain():
            kind, data = payload
            transform = self._build_transform(pos, quat)
            if kind == "depth":
                # back-project + consistency-filter on device (replicated
                # work, small images), then buffer the cloud pair for the
                # sharded tick like any other scan
                converted = self._convert_depth(data, transform)
                if converted is None:
                    continue
                pts, valid = converted
            elif isinstance(data, tuple):
                # preloaded device pair: keep on device (the preload
                # contract is zero host<->device traffic at stream time)
                pts, valid = data
            else:
                pts, valid = self._cloud_to_np(data)
            self._pending.append((pts, valid, transform))
            self.cur_pos = self._to_virtual(pos)
            self.new_msg = True
            n += 1
        return n

    # -- the sharded tick ---------------------------------------------------

    def update(self, max_iters: int = 0) -> Optional[UpdateStats]:
        if not self.new_msg:
            return None
        self.new_msg = False
        self.esdf_cnt += 1
        self._dist_cache = None   # the map changes: invalidate plan()'s grid
        k = self.scans_per_tick
        p = self.cfg.max_points_per_scan
        last_stats: Optional[UpdateStats] = None
        with Timer("UpdateESDF"):
            while self._pending:
                chunk = self._pending[:k]
                self._pending = self._pending[k:]
                pad = k - len(chunk)
                pts = jnp.stack(
                    [jnp.asarray(c[0], jnp.float32) for c in chunk]
                    + [jnp.zeros((p, 3), jnp.float32)] * pad)
                valids = jnp.stack(
                    [jnp.asarray(c[1]) for c in chunk]
                    + [jnp.zeros(p, bool)] * pad)
                tfs = jnp.asarray(
                    np.stack([c[2] for c in chunk]
                             + [np.eye(4)] * pad), jnp.float32)
                self.state, last_stats = self._tick(
                    self.state, pts, valids, tfs,
                    jnp.asarray(self.cur_pos, jnp.float32),
                )
        if self.cfg.signed_needed:
            # per-tick SDF maintenance, matching the single-device engine's
            # contract (pipeline.update / the --sdf CLI help); async
            # dispatch — sdf_grid caches on the new d2's identity
            self.sdf_grid()
        return last_stats

    def sdf_grid(self):
        """Signed distance field on the mesh (C18): interior EDT runs
        shard-locally with X halos; cached per tick like the base class."""
        if self._sdf_cache is not None and self._sdf_src is self.state.d2:
            return self._sdf_cache
        if getattr(self, "_sdf_fn", None) is None:
            self._sdf_fn = _sharded_sdf(self.cfg, self.mesh)
        self._sdf_cache = self._sdf_fn(self.state.logodds, self.state.d2,
                                       self.state.seen)
        self._sdf_src = self.state.d2
        return self._sdf_cache

    # -- rollout-sharded planning (the full multi-chip control loop) -------

    def plan(self, goal, mpc_cfg=None, p0=None, v0=None, nominal=None,
             key=None):
        """One MPC solve against the current sharded map.

        The distance grid all-gathers once over ICI (replicated for the
        lookup stage) and is CACHED until the next ``update()`` tick, so
        a receding-horizon loop re-planning against a static map pays the
        derivation once; the K rollouts split on the mesh axis and only
        the MPPI softmax normalization + weighted control update reduce
        across devices (SURVEY.md section 5: batch-sharded rollouts need
        no cross-device traffic except the final reduction).  Together
        with ``update()`` this is the complete perception-to-control
        period on a multi-chip slice.

        ``p0``: start position in the map frame (defaults to the last
        observed sensor position).
        """
        from ..planning import mpc as mpc_mod

        if mpc_cfg is None:
            mpc_cfg = mpc_mod.MPCConfig()
        if mpc_cfg.n_rollouts % self.mesh.devices.size:
            raise ValueError(
                f"n_rollouts={mpc_cfg.n_rollouts} must divide by the "
                f"{self.mesh.devices.size}-device mesh")
        if getattr(self, "_planner_cfg", None) != mpc_cfg:
            self._planner = mpc_mod.make_sharded_planner(
                self.cfg, mpc_cfg, self.mesh)
            self._planner_cfg = mpc_cfg
        if (getattr(self, "_dist_cache", None) is None
                or getattr(self, "_dist_cache_signed", None)
                != mpc_cfg.signed):
            from jax.sharding import NamedSharding, PartitionSpec as P

            # cache a REPLICATED copy: the planner's lookup stage needs
            # the full grid on every device, and caching the x-sharded
            # array would re-run the all-gather inside every solve.
            # Signed planners consume the SDF (C18) instead of the
            # unsigned distance grid.
            grid = (self.sdf_grid() if mpc_cfg.signed
                    else self.distance_grid())
            self._dist_cache = jax.device_put(
                grid, NamedSharding(self.mesh, P()))
            self._dist_cache_signed = mpc_cfg.signed
        h = mpc_cfg.horizon
        return self._planner(
            self._dist_cache,
            jnp.asarray(self.cur_pos if p0 is None else p0, jnp.float32),
            jnp.zeros(3, jnp.float32) if v0 is None
            else jnp.asarray(v0, jnp.float32),
            jnp.asarray(goal, jnp.float32),
            jnp.zeros((h, 3), jnp.float32) if nominal is None
            else jnp.asarray(nominal, jnp.float32),
            self._next_plan_key() if key is None else key,
        )

    def _next_plan_key(self):
        """Per-pipeline PRNG stream for ``plan()`` calls without a caller
        key: split a persistent key each solve so a receding-horizon loop
        gets fresh MPPI exploration noise every step instead of silently
        re-sampling PRNGKey(0)'s."""
        base = getattr(self, "_plan_key", None)
        if base is None:
            base = jax.random.PRNGKey(0)
        base, sub = jax.random.split(base)
        self._plan_key = base
        return sub


class ShardedScrollingFiestaPipeline(ScrollingMixin, ShardedFiestaPipeline):
    """Unbounded persistent world on a multi-chip mesh: the scrolling-grid
    + tile-archive machinery (scrolling.ScrollingMixin — recenter in fixed
    steps, evict strips to the host tile directory, restore on revisit)
    over the sharded production tick.

    Multi-chip specifics: the counter drain before an eviction is the
    sharded tick with an empty scan batch; distance re-derivation after a
    restore is the sharded rebuild (halo ppermutes, closest tracking when
    supported); recenters defer while scans are buffered for the next
    tick (their transforms were built in the current virtual frame); and
    state shardings are re-pinned after host-side strip writes.
    """

    def __init__(self, cfg: FiestaConfig,
                 mesh: Optional[object] = None,
                 n_devices: Optional[int] = None,
                 scans_per_tick: int = 3,
                 recenter_fraction: float = 0.25,
                 archive=None):
        super().__init__(cfg, mesh=mesh, n_devices=n_devices,
                         scans_per_tick=scans_per_tick)
        self._rebuild = sharding.sharded_rebuild_esdf(cfg, self.mesh)
        self._init_scrolling(recenter_fraction, archive)

    # -- sharded specializations of the scrolling hooks ---------------------

    def _drain_counters(self) -> None:
        p = self.cfg.max_points_per_scan
        k = self.scans_per_tick
        self.state, _ = self._tick(
            self.state,
            jnp.zeros((k, p, 3), jnp.float32),
            jnp.zeros((k, p), bool),
            jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (k, 4, 4)),
            jnp.asarray(self.cur_pos, jnp.float32),
        )

    def _rederive_distances(self) -> None:
        import dataclasses

        from ..grid import occupied_grid

        self.restore_count += 1
        occ = occupied_grid(self.cfg, self.state.logodds)
        d2, closest = self._rebuild(occ)
        self.state = dataclasses.replace(
            self.state, d2=d2,
            closest=self.state.closest if closest is None else closest,
        )

    def _reshard_state(self) -> None:
        self.state = sharding.shard_state(self.state, self.mesh)

    def maybe_recenter(self, robot_pos) -> bool:
        if self._pending:
            # scans buffered for the next tick carry transforms built in
            # the CURRENT virtual frame; recenter only between ticks
            return False
        return super().maybe_recenter(robot_pos)


def _sharded_sdf(cfg, mesh):
    """Jitted sharded signed-distance derivation (C18 on the mesh): the
    interior EDT runs shard-locally with the same X halos as the
    exterior rebuild."""
    from jax.sharding import PartitionSpec as P

    from ..grid import INF_D2, occupied_grid
    from ..ops.pallas.edt import trunc_vox_for
    from ..ops.query import distance_grid
    from . import sharding as sh

    n = mesh.devices.size
    t = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    inv_local = sh._local_truncated_edt(cfg, n, t)
    sm = jax.shard_map(
        lambda free: inv_local(free), mesh=mesh,
        in_specs=P("x", None, None), out_specs=P("x", None, None),
        check_vma=False,
    )

    @jax.jit
    def sdf(logodds, d2, seen):
        occ = occupied_grid(cfg, logodds)
        outside = distance_grid(cfg, d2, seen)
        d2_in = sm(~occ)
        inside = jnp.minimum(
            jnp.sqrt(jnp.where(d2_in >= INF_D2, INF_D2,
                               d2_in).astype(jnp.float32))
            * cfg.resolution, cfg.trunc_dist)
        return jnp.where(occ, -inside, outside)

    return sdf
