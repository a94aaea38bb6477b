"""Synthetic scan replay (dataset substitute for the cow_and_lady bag).

The reference is driven by ``rosbag play`` of the cow_and_lady dataset
(README.md:88-96) — a Kinect circling a static scene.  With no network or
ROS here, a procedural world generates equivalent streams: a room with box
obstacles, a sensor orbiting it, exact ray-box depth rendering, and
timestamped pose + depth/cloud messages at dataset-like rates.

The generator also exposes the exact occupied-voxel set, so replays have a
built-in ground truth for the accuracy oracle (the role the PCL kd-tree
check plays in the reference, ESDFMap.cpp:905-1054).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..config import FiestaConfig


@dataclasses.dataclass(frozen=True)
class BoxWorld:
    """Axis-aligned box obstacles inside a bounded room."""

    boxes: Tuple[Tuple[Tuple[float, float, float],
                       Tuple[float, float, float]], ...]

    @staticmethod
    def random(
        cfg: FiestaConfig, n_boxes: int = 12, seed: int = 0,
        keep_clear: float = 2.0, walls: bool = True,
        room_margin: float = 0.3,
        focus_radius: Optional[Tuple[float, float]] = None,
    ) -> "BoxWorld":
        """Random boxes inside the map, keeping the sensor orbit clear.

        ``walls``: enclose the scene with 4 walls + floor just inside the
        map AABB (like the cow_and_lady room), so most rays terminate on
        real surfaces instead of escaping to infinity.

        ``focus_radius=(r_min, r_max)``: place box centers in that annulus
        around the map center instead of uniformly over the AABB.  Maps
        much larger than the sensor range (the demo preset is 40x40 m with
        5 m rays) otherwise scatter every box outside sensing range and
        the replay maps an EMPTY world.
        """
        rng = np.random.default_rng(seed)
        lo = np.asarray(cfg.origin)
        size = np.asarray(cfg.map_size)
        hi = lo + size
        boxes = []
        if walls:
            m, th = room_margin, 0.15
            boxes += [
                ((lo[0] + m, lo[1] + m, lo[2] + m),
                 (hi[0] - m, hi[1] - m, lo[2] + m + th)),          # floor
                ((lo[0] + m, lo[1] + m, lo[2] + m),
                 (lo[0] + m + th, hi[1] - m, hi[2] - m)),          # -x wall
                ((hi[0] - m - th, lo[1] + m, lo[2] + m),
                 (hi[0] - m, hi[1] - m, hi[2] - m)),               # +x wall
                ((lo[0] + m, lo[1] + m, lo[2] + m),
                 (hi[0] - m, lo[1] + m + th, hi[2] - m)),          # -y wall
                ((lo[0] + m, hi[1] - m - th, lo[2] + m),
                 (hi[0] - m, hi[1] - m, hi[2] - m)),               # +y wall
            ]
            boxes = [(tuple(a), tuple(b)) for a, b in boxes]
        center = lo + size / 2
        # a keep_clear at or beyond the clipped sampling reach would reject
        # every candidate (small maps): shrink it so acceptance is possible
        reach = float(np.linalg.norm(np.maximum(size[:2] / 2 - 0.1, 0.0)))
        kc = min(keep_clear, 0.8 * reach)
        attempts = 0
        while len(boxes) < n_boxes + (5 if walls else 0):
            attempts += 1
            if attempts > 1000 * (n_boxes + 5):
                raise ValueError(
                    f"could not place {n_boxes} boxes in map {tuple(size)} "
                    f"with keep_clear={keep_clear} (focus={focus_radius})")
            if focus_radius is not None:
                r0 = max(focus_radius[0], kc)
                r1 = max(focus_radius[1], r0 + 0.5)
                r = np.sqrt(rng.uniform(r0 ** 2, r1 ** 2))
                th = rng.uniform(0, 2 * np.pi)
                c = np.array([center[0] + r * np.cos(th),
                              center[1] + r * np.sin(th),
                              lo[2] + rng.random() * size[2]])
                c = np.clip(c, lo + 0.1, hi - 0.1)
            else:
                c = lo + rng.random(3) * size
            ext = rng.uniform(0.2, 1.2, size=3)
            if np.linalg.norm(c[:2] - (lo[:2] + size[:2] / 2)) < kc:
                continue
            bmin = np.maximum(c - ext / 2, lo + 0.05)
            bmax = np.minimum(c + ext / 2, lo + size - 0.05)
            if np.all(bmax > bmin):
                boxes.append((tuple(bmin), tuple(bmax)))
        return BoxWorld(boxes=tuple(boxes))

    def occupied_voxels(self, cfg: FiestaConfig) -> np.ndarray:
        """Exact rasterization of the boxes into the voxel grid."""
        gx, gy, gz = cfg.grid_shape
        occ = np.zeros((gx, gy, gz), bool)
        lo = np.asarray(cfg.origin)
        res = cfg.resolution
        for bmin, bmax in self.boxes:
            v0 = np.floor((np.asarray(bmin) - lo) / res).astype(int)
            v1 = np.ceil((np.asarray(bmax) - lo) / res).astype(int)
            v0 = np.clip(v0, 0, [gx, gy, gz])
            v1 = np.clip(v1, 0, [gx, gy, gz])
            occ[v0[0]:v1[0], v0[1]:v1[1], v0[2]:v1[2]] = True
        return occ


def _ray_box_depths(origin, dirs, bmin, bmax):
    """Nearest-hit distances for rays vs a set of AABBs (slab test).

    origin [3], dirs [R,3] unit, bmin/bmax [B,3].  Returns [R] distances
    (inf = no hit).  The slab test matches RayIntersectsAABB
    (src/raycast.cpp:25-54) extended to return entry distance.

    Pure NumPy on purpose: replay data generation must not touch the device
    (host<->device transfers over the TPU tunnel are slow and would pollute
    pipeline benchmarks).
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)   # [R,3]
        t0 = (bmin[:, None, :] - origin[None, None, :]) * inv[None]  # [B,R,3]
        t1 = (bmax[:, None, :] - origin[None, None, :]) * inv[None]
    tmin = np.max(np.minimum(t0, t1), axis=-1)                    # [B,R]
    tmax = np.min(np.maximum(t0, t1), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0)
    tent = np.where(hit, np.maximum(tmin, 0.0), np.inf)
    return np.min(tent, axis=0)                                   # [R]


def scale_intrinsics(
    cfg: FiestaConfig, height: int, width: int,
    base_height: int = 480, base_width: int = 640,
) -> FiestaConfig:
    """Scale the config's pinhole intrinsics (defined for 640x480, the
    reference camera, src/parameters.cpp:21-24) to another image size."""
    sx, sy = width / base_width, height / base_height
    return dataclasses.replace(
        cfg,
        focal_x=cfg.focal_x * sx, focal_y=cfg.focal_y * sy,
        center_x=cfg.center_x * sx, center_y=cfg.center_y * sy,
    )


def render_depth(
    world: BoxWorld,
    cfg: FiestaConfig,
    transform: np.ndarray,
    height: int = 120,
    width: int = 160,
    max_depth: float = 20.0,
) -> np.ndarray:
    """Render a pinhole depth image [H,W] (meters) from camera pose T_wc,
    using cfg's intrinsics as-is (use ``scale_intrinsics`` to match the
    image size)."""
    fx, fy = cfg.focal_x, cfg.focal_y
    cx, cy = cfg.center_x, cfg.center_y
    u = (np.arange(width) - cx) / fx
    v = (np.arange(height) - cy) / fy
    uu, vv = np.meshgrid(u, v)
    dirs_cam = np.stack([uu, vv, np.ones_like(uu)], axis=-1)
    ray_norm = np.linalg.norm(dirs_cam, axis=-1)
    dirs_cam /= ray_norm[..., None]
    r = transform[:3, :3]
    dirs_world = dirs_cam @ r.T
    origin = transform[:3, 3]

    bmin = np.asarray([b[0] for b in world.boxes])
    bmax = np.asarray([b[1] for b in world.boxes])
    t = _ray_box_depths(
        np.asarray(origin), dirs_world.reshape(-1, 3), bmin, bmax
    ).reshape(height, width)
    # range along the unit world ray -> z depth (unit cam dir has z=1/|d|)
    depth = t / ray_norm
    depth[~np.isfinite(t) | (t > max_depth)] = np.nan
    return depth.astype(np.float32)


def render_cloud(
    world: BoxWorld,
    cfg: FiestaConfig,
    transform: np.ndarray,
    height: int = 120,
    width: int = 160,
    max_depth: float = 20.0,
) -> np.ndarray:
    """Render a camera-frame point cloud [N,3] (NaN for misses)."""
    depth = render_depth(world, cfg, transform, height, width, max_depth)
    fx, fy = cfg.focal_x, cfg.focal_y
    cx, cy = cfg.center_x, cfg.center_y
    u = np.arange(width)[None, :]
    v = np.arange(height)[:, None]
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    return np.stack([x, y, depth], axis=-1).reshape(-1, 3).astype(np.float32)


def orbit_poses(
    cfg: FiestaConfig,
    n_frames: int,
    rate_hz: float = 30.0,
    orbit_radius: float = 1.0,
    z: float = 1.0,
    period: float = 12.0,
) -> List[Tuple[float, np.ndarray, np.ndarray]]:
    """Sensor orbit around the map center, camera z-axis pointing outward.

    The orbit completes in ``period`` seconds (realistic inter-frame motion
    so the depth consistency filter sees coherent consecutive frames).
    Returns [(t, pos, quat_wxyz)], one per frame, camera convention
    z-forward / x-right / y-down as the reference's pinhole model.
    """
    lo = np.asarray(cfg.origin)
    center = lo + np.asarray(cfg.map_size) / 2
    out = []
    for k in range(n_frames):
        t = k / rate_hz
        ang = 2 * np.pi * t / period
        pos = np.array([
            center[0] + orbit_radius * np.cos(ang),
            center[1] + orbit_radius * np.sin(ang),
            z,
        ])
        fwd = np.array([np.cos(ang), np.sin(ang), 0.0])   # z axis: outward
        up_world = np.array([0.0, 0.0, 1.0])
        x_axis = np.cross(-up_world, fwd)                 # y-down convention
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(fwd, x_axis)
        rmat = np.stack([x_axis, y_axis, fwd], axis=1)
        quat = _mat_to_quat(rmat)
        out.append((t, pos, quat))
    return out


def _mat_to_quat(r: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w,x,y,z)."""
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (r[2, 1] - r[1, 2]) / s
        y = (r[0, 2] - r[2, 0]) / s
        z = (r[1, 0] - r[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(r)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(r[i, i] - r[j, j] - r[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[1 + i] = 0.25 * s
        q[0] = (r[k, j] - r[j, k]) / s
        q[1 + j] = (r[j, i] + r[i, j]) / s
        q[1 + k] = (r[k, i] + r[i, k]) / s
        w, x, y, z = q
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def make_sequence(
    cfg: FiestaConfig,
    n_frames: int = 30,
    n_boxes: int = 8,
    seed: int = 0,
    height: int = 120,
    width: int = 160,
    kind: str = "cloud",
    rate_hz: float = 30.0,
    period: float = 12.0,
    orbit_radius: float = 1.0,
    orbit_z: float = 1.0,
    walls: bool = True,
):
    """Build a full synthetic sequence.

    Returns (world, [(t, pose(pos,quat), scan)]) where scan is a camera-frame
    cloud [N,3] or depth image [H,W] depending on ``kind``.  The caller's
    cfg should already carry intrinsics matching (height, width) — see
    ``scale_intrinsics``.
    """
    # keep the scene inside sensing range of the orbit: maps much larger
    # than max_ray (demo: 40x40 m, 5 m rays) would otherwise scatter every
    # box where no ray can reach and the replay maps an empty world
    size_xy = min(cfg.map_size[0], cfg.map_size[1]) / 2
    focus = (2.0, min(size_xy, orbit_radius + 0.8 * cfg.max_ray_length))
    world = BoxWorld.random(cfg, n_boxes=n_boxes, seed=seed, walls=walls,
                            focus_radius=focus)
    poses = orbit_poses(
        cfg, n_frames, rate_hz=rate_hz, period=period,
        orbit_radius=orbit_radius, z=orbit_z,
    )
    frames = []
    for t, pos, quat in poses:
        from ..ops.depth import pose_to_matrix

        transform = np.asarray(pose_to_matrix(pos, quat))
        if kind == "cloud":
            scan = render_cloud(world, cfg, transform, height, width)
        else:
            scan = render_depth(world, cfg, transform, height, width)
        frames.append((t, (pos, quat), scan))
    return world, frames


def stage_update_batches(pipe, frames, group: int = 3):
    """Group a frame sequence into ESDF update batches and pre-stage the
    device arrays the batched step functions consume.

    The staging protocol (pad + upload each scan once, group ``group``
    frames per 10 Hz tick, use the last frame's position as the tick's
    robot position) is shared by bench.py, the stage profiler, and the
    stream-equivalence test — one definition keeps them in lockstep.

    Returns (points [N,K,P,3], valids [N,K,P], transforms [N,K,4,4],
    positions [N,3]) for N = len(frames) // group ticks.  All staging runs
    host-side (numpy) with ONE device upload per array — no per-frame
    device dispatches (each eager op is a full tunnel round trip on the
    bench platform, PERF.md).
    """
    import jax.numpy as jnp

    from ..ops.depth import pose_to_matrix

    pts_n, val_n, tf_n, pos_n = [], [], [], []
    n = (len(frames) // group) * group
    for i in range(0, n, group):
        batch = frames[i:i + group]
        pts, vals, tfs = [], [], []
        for _, (pos, quat), scan in batch:
            p = np.ascontiguousarray(scan, np.float32)
            p, v = pipe._pad_cloud_np(p, np.isfinite(p).all(axis=-1))
            pts.append(p)
            vals.append(v)
            tfs.append(np.asarray(pose_to_matrix(pos, quat)))
        pts_n.append(np.stack(pts))
        val_n.append(np.stack(vals))
        tf_n.append(np.stack(tfs))
        pos_n.append(np.asarray(batch[-1][1][0]))
    return (jnp.asarray(np.stack(pts_n), jnp.float32),
            jnp.asarray(np.stack(val_n)),
            jnp.asarray(np.stack(tf_n), jnp.float32),
            jnp.asarray(np.stack(pos_n), jnp.float32))
