"""Sensor pipeline and update scheduling (reference L3, include/Fiesta.h).

What the reference's ROS node does:

  * PoseCallback / DepthCallback enqueue timestamped messages
    (Fiesta.h:441-479);
  * SynchronizationAndProcess matches each depth frame to the latest pose
    with stamp <= depth_time + 3 ms, dropping frames with no fresh pose
    (Fiesta.h:385-439, component C14);
  * matched frames are converted + raycast immediately (hot path #1);
  * a 10 Hz timer drains accumulated observations into occupancy fusion and
    an incremental ESDF update (UpdateEsdfEvent, Fiesta.h:481-539, hot
    path #2).

TPU-native redesign: the callbacks/timer become a host-side synchronizer
(pure Python, no ROS) feeding two jitted device functions:

  * ``integrate_scan``: transform cloud to world + carve + endpoint scatter
    (replaces multithreaded DDA, components C9-C11);
  * ``esdf_update``: fusion + incremental relaxation (components C4+C6).

The map state lives in HBM across frames; nothing round-trips through the
host except scan/pose ingestion and the scalars returned for logging.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import FiestaConfig
from .grid import (
    MapState,
    local_window,
    local_window_np,
    make_state,
    occupied_grid,
    window_mask,
)
from .ops import esdf, fusion, raycast
from .ops.depth import depth_to_cloud, pose_to_matrix
from .ops.pallas.fuse import (fuse_counts_pallas, fuse_profitable,
                              fuse_supported)
from .timing import Timer

#: fusion drain implementation for the rebuild tick:
#:   "pallas" — single-pass in-place kernel (ops/pallas/fuse.py); TPU
#:              rebuild-mode global updates only, falls back otherwise
#:   "xla"    — the elementwise fuse_counts chain
#: override with FIESTA_FUSE=xla for A/B runs.
import os as _os  # noqa: E402

_FUSE_IMPL = _os.environ.get("FIESTA_FUSE", "pallas")
if _FUSE_IMPL not in ("pallas", "xla"):
    raise ValueError(f"FIESTA_FUSE={_FUSE_IMPL!r}: expected pallas|xla")


#: integrator registry shared by the single-scan and batched paths
_INTEGRATORS = {
    "projective": raycast.integrate_scan_projective,
    "scanline": raycast.integrate_scan_scanline,
    "dda": raycast.integrate_scan_dda,
}


class UpdateStats(NamedTuple):
    num_observed: jax.Array   # occupancy-queue size (ESDFMap.cpp:237)
    num_inserted: jax.Array   # insert_queue_ size   (ESDFMap.cpp:277)
    num_deleted: jax.Array    # delete_queue_ size   (ESDFMap.cpp:277)
    num_sweeps: jax.Array     # relaxation sweeps ("Expanding N nodes" analog)


# ---------------------------------------------------------------------------
# Jitted step functions
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "method"), donate_argnames=("state",))
def integrate_scan(
    cfg: FiestaConfig,
    state: MapState,
    points_sensor: jax.Array,
    valid: jax.Array,
    transform: jax.Array,
    window: Optional[Tuple[jax.Array, jax.Array]] = None,
    method: str = "projective",
) -> Tuple[MapState, raycast.ScanResult]:
    """Transform one sensor-frame scan to world and accumulate its
    observations into the hit/miss counters (single device dispatch)."""
    r = transform[:3, :3]
    t = transform[:3, 3]
    points_world = points_sensor @ r.T + t          # Fiesta.h:204-205
    origin = t                                       # raycast_origin_
    fn = _INTEGRATORS[method]
    res = fn(cfg, state.hit_cnt, state.miss_cnt, points_world, valid, origin,
             window)
    new_state = dataclasses.replace(
        state, hit_cnt=res.hit_cnt, miss_cnt=res.miss_cnt
    )
    return new_state, res


def rebuild_d2(cfg: FiestaConfig, occupied: jax.Array) -> jax.Array:
    """The production distance derivation: truncated exact EDT of the
    current occupancy (hierarchical far field when ``edt_fine_dist``
    enables it).  Shared by the update tick and by archive restores;
    trace-time function — wrap in jit for eager callers."""
    from .ops.pallas.edt import (
        hierarchical_edt_d2,
        trunc_vox_for,
        truncated_edt_d2,
    )

    t_total = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    t_fine = trunc_vox_for(cfg.resolution, cfg.edt_fine_dist)
    gshape = cfg.grid_shape
    if t_fine < t_total and all(g % 2 == 0 for g in gshape):
        return hierarchical_edt_d2(occupied, t_fine, t_total)
    return truncated_edt_d2(occupied, t_total)


rebuild_d2_jit = partial(jax.jit, static_argnames=("cfg",))(rebuild_d2)


@partial(jax.jit, static_argnames=("cfg",))
def _sdf_from_state(cfg: FiestaConfig, state: MapState) -> jax.Array:
    """Signed distance field from the current map state (C18)."""
    from .ops.query import signed_distance_grid

    occ = occupied_grid(cfg, state.logodds)
    return signed_distance_grid(cfg, state.d2, state.seen, occ)


def _closest_ok(shape, t) -> bool:
    """Packed (production) or wide (fallback) closest engine available."""
    from .ops.pallas.edt import closest_plan, closest_plan_wide

    return (closest_plan(shape, t) is not None
            or closest_plan_wide(shape, t) is not None)


def rebuild_tracks_closest(cfg: FiestaConfig) -> bool:
    """Whether the rebuild tick maintains ``state.closest`` (reference
    closest_obstacle_, ESDFMap.h:92-96): requires ``cfg.track_closest``
    and either the packed-argmin int32 budget (edt.closest_plan, the
    Pallas production path) or the two-word wide fallback
    (edt.closest_plan_wide — exact, slower; large grids)."""
    from .ops.pallas.edt import trunc_vox_for

    if not cfg.track_closest:
        return False
    t_total = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    t_fine = trunc_vox_for(cfg.resolution, cfg.edt_fine_dist)
    gshape = cfg.grid_shape
    if t_fine < t_total and all(g % 2 == 0 for g in gshape):
        coarse = tuple(g // 2 for g in gshape)
        return (_closest_ok(gshape, t_fine)
                and _closest_ok(coarse, -(-t_total // 2)))
    return _closest_ok(gshape, t_total)




def rebuild_esdf(cfg: FiestaConfig, occupied: jax.Array):
    """EDT rebuild returning (d2, closest-or-None).  With closest tracking
    (the default, matching the reference's always-maintained
    closest_obstacle_) the argmin rides the same packed min-plus passes;
    see ops/pallas/edt.truncated_edt_d2_closest.  Grids past the int32
    packing budget fall back to the exact two-word engine
    (edt.truncated_edt_d2_closest_wide) instead of going stale."""
    from .ops.pallas.edt import (
        edt_closest_auto,
        hierarchical_edt_d2_closest,
        trunc_vox_for,
    )

    if not rebuild_tracks_closest(cfg):
        return rebuild_d2(cfg, occupied), None
    from .grid import closest_packed_state

    packed = closest_packed_state(cfg)
    t_total = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    t_fine = trunc_vox_for(cfg.resolution, cfg.edt_fine_dist)
    gshape = cfg.grid_shape
    if t_fine < t_total and all(g % 2 == 0 for g in gshape):
        return hierarchical_edt_d2_closest(occupied, t_fine, t_total,
                                           packed_out=packed)
    return edt_closest_auto(occupied, t_total, packed_out=packed)


rebuild_esdf_jit = partial(jax.jit, static_argnames=("cfg",))(rebuild_esdf)


def tick_rebuild_esdf(cfg: FiestaConfig, occupied: jax.Array):
    """What the TICK derives: (d2, closest-or-None).  In lazy closest
    mode (``cfg.closest_mode`` — the production default) the tick skips
    the packed-argmin payload passes (~1.1 ms/batch at cow scale,
    PERF.md round 5) and closest is derived at the query surface instead
    (``FiestaPipeline.closest_grid``); eager mode matches the
    reference's per-update write cadence (ESDFMap.h:92-96)."""
    if cfg.lazy_closest:
        return rebuild_d2(cfg, occupied), None
    return rebuild_esdf(cfg, occupied)


tick_rebuild_esdf_jit = partial(jax.jit,
                                static_argnames=("cfg",))(tick_rebuild_esdf)


@partial(jax.jit, static_argnames=("cfg",))
def derive_closest(cfg: FiestaConfig, logodds: jax.Array) -> jax.Array:
    """Fresh closest-obstacle grid for the CURRENT occupancy (the lazy
    query path).  In rebuild mode closest is a pure function of the
    occupancy, so this is bitwise the grid an eager tick would have
    written (the argmin rides the same packed min-plus passes,
    ops/pallas/edt.truncated_edt_d2_closest); tests pin lazy == eager.
    Callers gate on ``rebuild_tracks_closest``."""
    occ = occupied_grid(cfg, logodds)
    _, closest = rebuild_esdf(cfg, occ)
    assert closest is not None, (
        "derive_closest on a config without a closest engine; gate on "
        "pipeline.rebuild_tracks_closest")
    return closest


@partial(jax.jit, static_argnames=("cfg", "use_window", "max_iters"),
         donate_argnames=("state",))
def esdf_update(
    cfg: FiestaConfig,
    state: MapState,
    cur_pos: jax.Array,
    use_window: bool = False,
    max_iters: int = 0,
) -> Tuple[MapState, UpdateStats]:
    """Fusion + incremental ESDF (UpdateEsdfEvent body, Fiesta.h:507-521)."""
    if use_window:
        wmin, wmax = local_window(cfg, cur_pos)
        wmask = window_mask(cfg, wmin, wmax)
    else:
        wmask = None

    if (_FUSE_IMPL == "pallas" and cfg.esdf_mode == "rebuild"
            and wmask is None and jax.default_backend() == "tpu"
            and fuse_supported(cfg.grid_shape)
            and fuse_profitable(cfg.grid_shape)):
        # single-pass Pallas drain (ops/pallas/fuse.py): log-odds/seen in
        # place, EDT-ready u8 occupancy out, counters re-zeroed in place,
        # stats as in-kernel partial sums — the XLA chain costs ~1.6 ms
        # of full-grid passes at cow scale (PERF.md r3), ~5x its
        # bandwidth bound.  Bit-identical arithmetic; the rebuild path
        # never materializes insert/delete masks (counts suffice).
        # Gated to GLOBAL updates and gz >= 64 (fuse_profitable): the
        # window-capable kernel variant (round 5) measured SLOWER than
        # the XLA chain at both demo (gz=36) and cow (gz=80) window
        # shapes — the in-kernel iota gating costs more than XLA's fused
        # wmask — so window mode keeps the chain (PERF.md round 5).
        on, off_eq = ((cfg.min_occupancy_log, False) if cfg.probabilistic
                      else (1.0, True))
        new_lo, seen, occ, hit0, miss0, n_obs, n_ins, n_del = \
            fuse_counts_pallas(
                state.logodds, state.seen, state.hit_cnt, state.miss_cnt,
                l_hit=cfg.prob_hit_log, l_miss=cfg.prob_miss_log,
                clamp_min=cfg.clamp_min_log, clamp_max=cfg.clamp_max_log,
                occ_thresh=on, occ_is_eq=off_eq,
            )
        d2, closest = tick_rebuild_esdf(cfg, occ)
        if closest is None:
            closest = state.closest
        return (
            MapState(logodds=new_lo, d2=d2, closest=closest, seen=seen,
                     hit_cnt=hit0, miss_cnt=miss0),
            UpdateStats(num_observed=n_obs, num_inserted=n_ins,
                        num_deleted=n_del, num_sweeps=jnp.int32(0)),
        )

    fr = fusion.fuse_counts(
        cfg, state.logodds, state.seen, state.hit_cnt, state.miss_cnt,
        window_mask=wmask,
    )
    if cfg.esdf_mode == "rebuild":
        d2, closest = tick_rebuild_esdf(cfg, fr.occupied)
        if closest is None:
            closest = state.closest   # lazy mode / tracking unsupported
        sweeps = jnp.int32(0)
    else:
        d2, closest, sweeps = esdf.update_esdf(
            state.d2, state.closest, fr.occupied, fr.insert_mask,
            fr.delete_mask, wmask, cfg.relax_dirs, max_iters=max_iters,
        )
    new_state = MapState(
        logodds=fr.logodds,
        d2=d2,
        closest=closest,
        seen=fr.seen,
        hit_cnt=jnp.zeros_like(state.hit_cnt),
        miss_cnt=jnp.zeros_like(state.miss_cnt),
    )
    stats = UpdateStats(
        num_observed=fr.num_observed,
        num_inserted=jnp.sum(fr.insert_mask, dtype=jnp.int32),
        num_deleted=jnp.sum(fr.delete_mask, dtype=jnp.int32),
        num_sweeps=sweeps,
    )
    return new_state, stats


@partial(jax.jit, static_argnames=("cfg", "method", "use_window"),
         donate_argnames=("state",))
def integrate_scan_batch(
    cfg: FiestaConfig,
    state: MapState,
    points: jax.Array,       # [K, P, 3] sensor-frame scans
    valids: jax.Array,       # [K, P]
    transforms: jax.Array,   # [K, 4, 4] sensor-to-world
    cur_pos: jax.Array,      # [3] robot position (window center)
    use_window: bool = False,
    method: str = "scanline",
) -> MapState:
    """Integrate K accumulated scans in one dispatch (the reference's
    30 Hz callbacks between 10 Hz ticks)."""
    if use_window:
        win = local_window(cfg, cur_pos)
    else:
        win = None

    if method == "scanline":
        # fused carve: all K scans' wavefront sweeps share one schedule;
        # the world transform runs inside the component-form prep (an
        # einsum on [K,P,3] costs ~1.9 ms of pure lane waste, PERF.md r3)
        res = raycast.integrate_scan_scanline_batch(
            cfg, state.hit_cnt, state.miss_cnt, points, valids,
            transforms[:, :3, 3], win, transforms=transforms,
        )
        return dataclasses.replace(
            state, hit_cnt=res.hit_cnt, miss_cnt=res.miss_cnt
        )

    fn = _INTEGRATORS[method]

    def body(carry, inp):
        hit, miss = carry
        pts, val, tf = inp
        pw = pts @ tf[:3, :3].T + tf[:3, 3]
        res = fn(cfg, hit, miss, pw, val, tf[:3, 3], win)
        return (res.hit_cnt, res.miss_cnt), res.num_rays

    (hit, miss), _ = jax.lax.scan(
        body, (state.hit_cnt, state.miss_cnt), (points, valids, transforms)
    )
    return dataclasses.replace(state, hit_cnt=hit, miss_cnt=miss)


@partial(jax.jit, static_argnames=("cfg", "method", "use_window",
                                   "max_iters"),
         donate_argnames=("state",))
def fused_batch_step(
    cfg: FiestaConfig,
    state: MapState,
    points: jax.Array,
    valids: jax.Array,
    transforms: jax.Array,
    cur_pos: jax.Array,
    use_window: bool = False,
    method: str = "scanline",
    max_iters: int = 0,
) -> Tuple[MapState, UpdateStats]:
    """One ESDF tick — batched scan integration, occupancy fusion, and
    ESDF maintenance — as a SINGLE device program (each extra dispatch
    costs ~1.5 ms of non-overlapped tunnel latency)."""
    state = integrate_scan_batch.__wrapped__(
        cfg, state, points, valids, transforms, cur_pos,
        use_window=use_window, method=method,
    )
    return esdf_update.__wrapped__(cfg, state, cur_pos,
                                   use_window=use_window,
                                   max_iters=max_iters)


@partial(jax.jit, static_argnames=("cfg", "use_window", "use_filter",
                                   "max_iters"),
         donate_argnames=("state",))
def fused_depth_batch_step(
    cfg: FiestaConfig,
    state: MapState,
    depths: jax.Array,       # [K, H, W] f32 meters
    transforms: jax.Array,   # [K, 4, 4] camera-to-world
    prev_depth: jax.Array,   # [H, W] previous frame (filter chain)
    prev_transform: jax.Array,   # [4, 4]
    cur_pos: jax.Array,      # [3]
    use_window: bool = False,
    use_filter: bool = True,
    max_iters: int = 0,
) -> Tuple[MapState, UpdateStats]:
    """Depth-image-mode ESDF tick as ONE device program: K depth frames
    are back-projected + consistency-filtered (C12/C13) against their
    chained predecessors, then carved/fused/EDT'd exactly like the cloud
    tick.  ``prev_depth``/``prev_transform`` seed the filter chain (pass
    the previous tick's last frame; for the very first tick pass the
    first frame itself — self-agreement keeps it, a one-frame divergence
    from the reference's drop-first-frame behavior, Fiesta.h:353)."""
    from .ops.depth import depth_to_cloud_components

    k = depths.shape[0]
    xs, ys, zs, vals = [], [], [], []
    ld, lt = prev_depth, prev_transform
    for i in range(k):
        # component form: no [H*W, 3] staging (trailing-3 layout tax,
        # ~0.4 ms/frame at demo scale — PERF.md round 5); the seeds prep
        # consumes (px, py, pz) [K,P] directly
        x, y, z, v = depth_to_cloud_components(
            cfg, depths[i], transforms[i], lt, ld, use_filter=use_filter)
        xs.append(x.reshape(-1))
        ys.append(y.reshape(-1))
        zs.append(z.reshape(-1))
        vals.append(v.reshape(-1))
        ld, lt = depths[i], transforms[i]
    points = (jnp.stack(xs), jnp.stack(ys), jnp.stack(zs))
    valids = jnp.stack(vals)
    return fused_batch_step.__wrapped__(
        cfg, state, points, valids, transforms, cur_pos,
        use_window=use_window, method="scanline", max_iters=max_iters,
    )


@partial(jax.jit, static_argnames=("cfg", "use_window", "use_filter",
                                   "max_iters"),
         donate_argnames=("state",))
def fused_depth_stream(
    cfg: FiestaConfig,
    state: MapState,
    depths: jax.Array,       # [N, K, H, W]
    transforms: jax.Array,   # [N, K, 4, 4]
    cur_positions: jax.Array,  # [N, 3]
    use_window: bool = False,
    use_filter: bool = True,
    max_iters: int = 0,
) -> Tuple[MapState, UpdateStats]:
    """N depth-mode ticks as one device program (``lax.scan``), chaining
    the consistency filter across tick boundaries.  The depth-image twin
    of ``fused_stream``."""

    def body(carry, inp):
        st, pd, ptf = carry
        d, tf, pos = inp
        st, stats = fused_depth_batch_step.__wrapped__(
            cfg, st, d, tf, pd, ptf, pos,
            use_window=use_window, use_filter=use_filter,
            max_iters=max_iters,
        )
        return (st, d[-1], tf[-1]), stats

    (state, _, _), stats = jax.lax.scan(
        body, (state, depths[0, 0], transforms[0, 0]),
        (depths, transforms, cur_positions),
    )
    return state, stats


@partial(jax.jit, static_argnames=("cfg", "method", "use_window",
                                   "max_iters"),
         donate_argnames=("state",))
def fused_stream(
    cfg: FiestaConfig,
    state: MapState,
    points: jax.Array,       # [N, K, P, 3] sensor-frame scans, N ticks
    valids: jax.Array,       # [N, K, P]
    transforms: jax.Array,   # [N, K, 4, 4]
    cur_positions: jax.Array,  # [N, 3]
    use_window: bool = False,
    method: str = "scanline",
    max_iters: int = 0,
) -> Tuple[MapState, UpdateStats]:
    """N consecutive ESDF ticks as ONE device program (``lax.scan``).

    The streaming equivalent of N ``fused_batch_step`` calls — bit-identical
    state evolution — with the tick loop resident on device, so no host
    dispatch sits between ticks.  This is the idiomatic TPU executor for
    any pre-staged stream: recorded-log replay, backlog catch-up, and
    benchmarking (the reference's online setting leaves 100 ms between
    ticks, so per-tick dispatch latency is never on its critical path; what
    matters is tick *compute* throughput, which this measures cleanly).

    Returns the final state and per-tick stacked UpdateStats [N].
    """

    def body(st, inp):
        pts, val, tf, pos = inp
        st, stats = fused_batch_step.__wrapped__(
            cfg, st, pts, val, tf, pos,
            use_window=use_window, method=method, max_iters=max_iters,
        )
        return st, stats

    return jax.lax.scan(
        body, state, (points, valids, transforms, cur_positions)
    )


# ---------------------------------------------------------------------------
# Host-side pose/depth synchronization (component C14)
# ---------------------------------------------------------------------------


class ScanSynchronizer:
    """Pose/depth timestamp matching (SynchronizationAndProcess semantics).

    A depth frame is processed once a pose *newer* than
    ``depth_time + time_delay`` exists (so the matched pose is final); the
    match is the latest pose with stamp <= depth_time + time_delay; frames
    with no matching pose are dropped (Fiesta.h:388-405).
    """

    def __init__(self, time_delay: float = 3e-3,
                 max_queue: int = 10000, max_depth_queue: int = 64):
        """``max_queue`` bounds both queues so a stalled sensor stream
        cannot grow memory without bound (the reference's ROS subscribers
        use queue_size=10, Fiesta.h:115-116; poses are ~100 Hz so 10k is
        ~100 s of history)."""
        self.time_delay = time_delay
        self.poses: deque = deque(maxlen=max_queue)   # (t, pos, quat)
        # depth payloads are full clouds/images (vs ~100 B poses): a
        # stalled pose stream must not buffer gigabytes of them — the
        # reference subscribes with queue_size=10 (Fiesta.h:115-116)
        self.depths: deque = deque(maxlen=max_depth_queue)  # (t, payload)

    def push_pose(self, t: float, pos, quat_wxyz) -> None:
        self.poses.append((float(t), np.asarray(pos, np.float64),
                           np.asarray(quat_wxyz, np.float64)))

    def push_depth(self, t: float, payload) -> None:
        self.depths.append((float(t), payload))

    def drain(self):
        """Yield (depth_payload, pose_t, pos, quat) matches."""
        out = []
        while self.depths:
            dt, payload = self.depths[0]
            cutoff = dt + self.time_delay
            # wait until a newer pose guarantees the match is final
            if not self.poses or self.poses[-1][0] <= cutoff:
                break
            match = None
            while self.poses and self.poses[0][0] <= cutoff:
                match = self.poses.popleft()
            self.depths.popleft()
            if match is None:
                continue  # drop: no fresh pose (Fiesta.h:402-405)
            out.append((payload, match[0], match[1], match[2]))
        return out


# ---------------------------------------------------------------------------
# The engine (reference Fiesta<DepthMsgType, PoseMsgType> equivalent)
# ---------------------------------------------------------------------------


class FiestaPipeline:
    """End-to-end streaming ESDF engine.

    Usage::

        pipe = FiestaPipeline(cfg)
        pipe.observe_pose(t, pos, quat_wxyz)
        pipe.observe_cloud(t, points_cam)        # or observe_depth(t, img)
        pipe.process()                            # sync + integrate scans
        stats = pipe.update()                     # fusion + ESDF (10 Hz tick)
        d, g = pipe.query_dist_grad(positions)
    """

    def __init__(self, cfg: FiestaConfig, method: str = "projective"):
        cfg.validate()
        self.cfg = cfg
        self.method = method
        self.state: MapState = make_state(cfg)
        self.sync = ScanSynchronizer()
        self.T_D_B = np.eye(4)   # dataset extrinsics (parameters.cpp:67-75)
        self.T_B_C = np.eye(4)
        self.cur_pos = np.zeros(3)
        self.last_transform: Optional[np.ndarray] = None
        self.last_depth = None
        self.new_msg = False
        self.esdf_cnt = 0
        self.image_cnt = 0
        self._sdf_cache = None
        self._sdf_src = None
        self._closest_cache = None
        self._closest_src = None

    # -- ingestion ---------------------------------------------------------

    def observe_pose(self, t: float, pos, quat_wxyz) -> None:
        self.sync.push_pose(t, pos, quat_wxyz)

    def observe_cloud(self, t: float, points_cam) -> None:
        """Sensor-frame point cloud (PointCloud2 input mode).

        Accepts a numpy [N,3] array, or a pre-uploaded (points, valid)
        device pair from ``preload_cloud`` (streaming benchmarks preload to
        keep host->device DMA out of the timed path).
        """
        self.sync.push_depth(t, ("cloud", points_cam))

    def preload_cloud(self, points_cam: np.ndarray):
        """Pad + upload a scan once, ahead of streaming."""
        pts = np.ascontiguousarray(points_cam, np.float32)
        valid = np.isfinite(pts).all(axis=-1)
        return self._pad_cloud(pts, valid)

    def observe_depth(self, t: float, depth_m: np.ndarray) -> None:
        """Depth image [H,W] in meters (Image input mode)."""
        self.sync.push_depth(t, ("depth", depth_m))

    # -- processing --------------------------------------------------------

    def _to_virtual(self, pos) -> np.ndarray:
        """World -> map-frame hook (identity here; the scrolling pipeline
        shifts by its rolling origin)."""
        return np.asarray(pos, np.float64)

    def _build_transform(self, pos, quat) -> np.ndarray:
        t_wb = np.asarray(pose_to_matrix(pos, quat))
        return t_wb @ self.T_D_B @ self.T_B_C    # Fiesta.h:419

    def _cloud_to_np(self, data):
        """Raw cloud -> padded host (pts [P,3] f32, valid [P] bool) pair
        (the ingest normalization shared by every engine)."""
        pts = np.asarray(data, np.float32)
        valid = np.isfinite(pts).all(axis=-1)
        return self._pad_cloud_np(
            np.ascontiguousarray(pts, np.float32), valid)

    def _pad_cloud_np(self, pts: np.ndarray, valid: np.ndarray):
        """Host-side pad/subsample to the static scan size."""
        n = self.cfg.max_points_per_scan
        if pts.shape[0] > n:
            # keep a deterministic subsample (strided) to the static size
            stride = -(-pts.shape[0] // n)
            pts, valid = pts[::stride][:n], valid[::stride][:n]
        pad = n - pts.shape[0]
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        return pts, valid

    def _pad_cloud(self, pts: np.ndarray, valid: np.ndarray):
        pts, valid = self._pad_cloud_np(pts, valid)
        return jnp.asarray(pts, jnp.float32), jnp.asarray(valid)

    def _pad_cloud_dev(self, pts: jax.Array, valid: jax.Array):
        """Device-side twin of ``_pad_cloud`` for clouds that already live
        on device (the depth path) — no host round trip."""
        n = self.cfg.max_points_per_scan
        if pts.shape[0] > n:
            stride = -(-pts.shape[0] // n)
            pts, valid = pts[::stride][:n], valid[::stride][:n]
        pad = n - pts.shape[0]
        if pad:
            pts = jnp.concatenate(
                [pts, jnp.zeros((pad, 3), jnp.float32)])
            valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
        return pts, valid

    def _convert_depth(self, data, transform):
        """Depth image -> padded device (pts, valid) pair, threading the
        temporal consistency filter chain (C12/C13).  Returns None for the
        first filtered frame (it yields nothing, Fiesta.h:353)."""
        cfg = self.cfg
        self.image_cnt += 1
        if (np.prod(np.shape(data)) > cfg.max_points_per_scan):
            raise ValueError(
                f"depth image {np.shape(data)} exceeds "
                f"max_points_per_scan={cfg.max_points_per_scan}; "
                "raise it to H*W (run.py presets do) — silently "
                "subsampling depth pixels would drop observations")
        with Timer("depth"):
            use_filter = (
                cfg.use_depth_filter
                and self.image_cnt > 1
                and self.last_depth is not None
            )
            depth = jnp.asarray(data, jnp.float32)
            pts_cam, valid = depth_to_cloud(
                cfg,
                depth,
                jnp.asarray(transform, jnp.float32),
                jnp.asarray(
                    self.last_transform
                    if self.last_transform is not None
                    else transform,
                    jnp.float32,
                ),
                # device array cached from the previous frame: no
                # re-upload of the full image per frame
                self.last_depth
                if self.last_depth is not None else depth,
                use_filter=use_filter,
            )
            if cfg.use_depth_filter:
                self.last_transform = transform
            self.last_depth = depth
            if self.image_cnt == 1 and cfg.use_depth_filter:
                return None  # first frame yields nothing (Fiesta.h:353)
        # pts_cam/valid are device arrays with static shape: pad on
        # device (a host round trip here costs a full tunnel RTT)
        return self._pad_cloud_dev(pts_cam, valid)

    def process(self) -> int:
        """Drain synchronized frames through conversion + integration.

        Returns the number of frames integrated.
        """
        cfg = self.cfg
        n_frames = 0
        for payload, _, pos, quat in self.sync.drain():
            transform = self._build_transform(pos, quat)

            kind, data = payload
            if kind == "depth":
                converted = self._convert_depth(data, transform)
                if converted is None:
                    continue
                pts_j, valid_j = converted
            elif isinstance(data, tuple):      # pre-uploaded device pair
                pts_j, valid_j = data
            else:
                pts_np, valid_np = self._cloud_to_np(data)
                pts_j = jnp.asarray(pts_np, jnp.float32)
                valid_j = jnp.asarray(valid_np)
            with Timer("raycasting"):
                vpos = self._to_virtual(pos)
                win = None
                if not cfg.global_update:
                    wmin, wmax = local_window_np(cfg, vpos)
                    win = (jnp.asarray(wmin), jnp.asarray(wmax))
                # async dispatch: no per-frame device sync (the tunnel
                # round-trip is ~30 ms; XLA queues keep ordering correct)
                self.state, _ = integrate_scan(
                    cfg, self.state, pts_j, valid_j,
                    jnp.asarray(transform, jnp.float32), win,
                    method=self.method,
                )

            self.cur_pos = self._to_virtual(pos)
            self.new_msg = True
            n_frames += 1
        return n_frames

    def update(self, max_iters: int = 0) -> Optional[UpdateStats]:
        """The 10 Hz ESDF tick (UpdateEsdfEvent, Fiesta.h:481-539)."""
        if not self.new_msg:
            return None
        self.new_msg = False
        self.esdf_cnt += 1
        with Timer("UpdateESDF"):
            self.state, stats = esdf_update(
                self.cfg,
                self.state,
                jnp.asarray(self.cur_pos, jnp.float32),
                use_window=not self.cfg.global_update,
                max_iters=max_iters,
            )
        if self.cfg.signed_needed:
            # maintain the signed field every tick (the reference's inverse
            # map, Fiesta.h:216-218); async dispatch, no host sync
            self._sdf_cache = _sdf_from_state(self.cfg, self.state)
            self._sdf_src = self.state.d2
        return stats

    def sync_device(self) -> None:
        """Block until all queued device work for the map has finished."""
        jax.block_until_ready(self.state.d2)

    # -- queries -----------------------------------------------------------

    def distance_grid(self) -> jax.Array:
        from .ops.query import distance_grid

        return distance_grid(self.cfg, self.state.d2, self.state.seen)

    def query_distance(self, positions) -> jax.Array:
        from .ops.query import get_distance

        return get_distance(
            self.cfg, self.distance_grid(), jnp.asarray(positions, jnp.float32)
        )

    def query_dist_grad(self, positions):
        from .ops.query import get_dist_grad_trilinear

        return get_dist_grad_trilinear(
            self.cfg, self.distance_grid(), jnp.asarray(positions, jnp.float32)
        )

    def _derive_closest(self) -> jax.Array:
        """Fresh closest grid from the current occupancy (overridden by
        the sharded engine to run on its mesh)."""
        return derive_closest(self.cfg, self.state.logodds)

    def closest_grid(self) -> jax.Array:
        """Current closest-obstacle grid (packed int32 or i16 planes,
        grid.closest_packed_state).  In lazy mode (``cfg.closest_mode``,
        the production default) it is derived on first call after a tick
        and cached on the tick's d2 identity — any state change (tick,
        recenter, restore) replaces d2 and invalidates the cache; eager
        mode reads the per-tick-maintained ``state.closest``."""
        if not self.cfg.lazy_closest:
            return self.state.closest
        if (self._closest_cache is not None
                and self._closest_src is self.state.d2):
            return self._closest_cache
        self._closest_cache = self._derive_closest()
        self._closest_src = self.state.d2
        return self._closest_cache

    def query_closest_obstacle(self, positions):
        """Nearest-obstacle world coordinates + distance per query position
        (see ops.query.get_closest_obstacle).  In rebuild mode requires
        closest tracking (cfg.track_closest and a grid an argmin engine
        fits — pipeline.rebuild_tracks_closest); reads ``closest_grid()``
        so lazy mode serves the same always-current answers the eager
        reference cadence gives (closest_obstacle_, ESDFMap.h:92-96)."""
        from .ops.query import get_closest_obstacle

        return get_closest_obstacle(
            self.cfg, self.closest_grid(), self.state.d2, self.state.seen,
            jnp.asarray(positions, jnp.float32),
        )

    def occupied(self) -> jax.Array:
        return occupied_grid(self.cfg, self.state.logodds)

    def sdf_grid(self) -> jax.Array:
        """Signed distance field [X,Y,Z] f32 (component C18): positive
        clearance outside obstacles, negative penetration depth inside
        (clamped at -trunc_dist), infinity where unobserved.

        The reference's SIGNED_NEEDED variant feeds a second ESDF map with
        inverted occupancy (Fiesta.h:39-41,216-218; left TODO there).  Here
        the interior field is one extra truncated-EDT pass over the free
        mask, derived from the tick's state — with ``cfg.signed_needed``
        set, ``update()`` refreshes it every tick (the reference's
        always-maintained inverse map); otherwise it is derived on demand.
        Cached per ESDF tick either way.
        """
        if self._sdf_cache is not None and self._sdf_src is self.state.d2:
            return self._sdf_cache
        self._sdf_cache = _sdf_from_state(self.cfg, self.state)
        # cache keyed on the d2 array IDENTITY: any state change (tick,
        # recenter, restore) replaces the array and invalidates the cache
        self._sdf_src = self.state.d2
        return self._sdf_cache
