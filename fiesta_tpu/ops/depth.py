"""Depth image -> point cloud with temporal consistency filtering.

Reference components C12/C13 (DepthConversion, include/Fiesta.h:318-382):

  * 32FC1 depth images are scaled by ``k_depth_scaling_factor`` (1000) into
    16UC1 millimeters (Fiesta.h:328-331); here depth arrives as a float32
    array in meters (the replay layer handles integer decoding).
  * Pinhole back-projection with intrinsics (Fiesta.h:346-348).
  * Optional consistency filter (Fiesta.h:352-379): each point is reprojected
    into the *previous* frame via last_T^-1 * T; it is kept only if the
    previous depth at that pixel agrees within ``depth_filter_tolerance``.
    Nearest-pixel lookup is used (the reference's bilinear helper is dead
    code with zeroed weights, Fiesta.h:308-316 — not replicated).
  * Margin crop and [min,max] depth gates (Fiesta.h:356-365).

TPU-native form: the per-pixel double loop becomes dense [H,W] array math;
output is a fixed-size [H*W, 3] camera-frame cloud plus validity mask
(static shapes under jit).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FiestaConfig


def depth_to_cloud_components(
    cfg: FiestaConfig,
    depth: jax.Array,
    transform: Optional[jax.Array] = None,
    last_transform: Optional[jax.Array] = None,
    last_depth: Optional[jax.Array] = None,
    use_filter: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Back-projection + consistency filter in COMPONENT form: returns
    (px, py, pz, valid), each [H,W] — no [*, 3] staging.

    Why: a [H*W, 3] output keeps the length-3 coordinate axis minormost,
    which XLA:TPU tiles onto the 128-lane dimension at 3/128 utilization
    — the same trailing-3 layout tax the scan prep paid (PERF.md round
    3); measured ~0.4 ms/frame of the demo tick (round 5).  All math
    here runs on full-lane [H,W] arrays; the homogeneous reprojection is
    expanded per component instead of an einsum over a length-4 axis.
    Trace-time function — callers jit.
    """
    h, w = depth.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]

    x = (u - cfg.center_x) * depth / cfg.focal_x
    y = (v - cfg.center_y) * depth / cfg.focal_y

    valid = jnp.isfinite(depth)
    if use_filter:
        # Margin crop (Fiesta.h:356-358).
        m = cfg.depth_filter_margin
        if m > 0:
            um = (u >= m) & (u < w - m)
            vm = (v >= m) & (v < h - m)
            valid = valid & (um & vm)
        # Depth gates (Fiesta.h:364-365).
        valid = valid & (depth >= cfg.depth_filter_min_dist)
        valid = valid & (depth <= cfg.depth_filter_max_dist)

        # Reproject into the previous frame (Fiesta.h:366-369),
        # component-expanded: coord_i = rel[i,:3] . (x,y,z) + rel[i,3]
        rel = jnp.linalg.solve(last_transform, transform)   # last_T^-1 @ T
        c0 = rel[0, 0] * x + rel[0, 1] * y + rel[0, 2] * depth + rel[0, 3]
        c1 = rel[1, 0] * x + rel[1, 1] * y + rel[1, 2] * depth + rel[1, 3]
        c2 = rel[2, 0] * x + rel[2, 1] * y + rel[2, 2] * depth + rel[2, 3]
        c3 = rel[3, 0] * x + rel[3, 1] * y + rel[3, 2] * depth + rel[3, 3]
        cz = c2 / c3
        uu = (c0 / c3) * cfg.focal_x / cz + cfg.center_x
        vv = (c1 / c3) * cfg.focal_y / cz + cfg.center_y

        in_img = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        ui = jnp.clip(uu.astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(vv.astype(jnp.int32), 0, h - 1)
        prev = last_depth[vi, ui]                        # nearest pixel
        agree = jnp.abs(prev - cz) < cfg.depth_filter_tolerance
        valid = valid & in_img & agree

    return x, y, depth, valid


@partial(jax.jit, static_argnames=("cfg", "use_filter"))
def depth_to_cloud(
    cfg: FiestaConfig,
    depth: jax.Array,
    transform: Optional[jax.Array] = None,
    last_transform: Optional[jax.Array] = None,
    last_depth: Optional[jax.Array] = None,
    use_filter: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Back-project a depth image to a camera-frame point cloud.

    Args:
      depth: [H,W] float32 meters.
      transform / last_transform: [4,4] camera-to-world for the current and
        previous frames (required when ``use_filter``).
      last_depth: [H,W] previous depth image (required when ``use_filter``).
      use_filter: apply the temporal consistency filter.

    Returns (points [H*W,3] camera frame, valid [H*W] bool).  The fused
    depth tick uses ``depth_to_cloud_components`` instead (no [*, 3]
    staging); this form remains the point-cloud API surface.
    """
    x, y, z, valid = depth_to_cloud_components(
        cfg, depth, transform, last_transform, last_depth, use_filter)
    points = jnp.stack([x, y, z], axis=-1)          # [H,W,3]
    return points.reshape(-1, 3), valid.reshape(-1)


@partial(jax.jit, static_argnames=("cfg",))
def transform_cloud(
    cfg: FiestaConfig, points: jax.Array, transform: jax.Array
) -> jax.Array:
    """Camera/sensor-frame points [N,3] -> world frame via [4,4] transform
    (the per-point transform_*p in RaycastProcess, Fiesta.h:204-205)."""
    del cfg
    r = transform[:3, :3]
    t = transform[:3, 3]
    return points @ r.T + t


def pose_to_matrix(pos, quat_wxyz) -> np.ndarray:
    """Pose (position, quaternion w,x,y,z) -> [4,4] homogeneous transform
    (SynchronizationAndProcess, Fiesta.h:415-418).

    Pure NumPy: this runs on the host per message; device dispatches over
    the TPU tunnel cost ~3 ms each, so host-side math must stay host-side.
    """
    pos = np.asarray(pos, np.float64)
    w, x, y, z = (float(q) for q in np.asarray(quat_wxyz, np.float64))
    n = math.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    r = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = pos
    return out
