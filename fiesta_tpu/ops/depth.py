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

    Returns (points [H*W,3] camera frame, valid [H*W] bool).
    """
    h, w = depth.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]

    x = (u - cfg.center_x) * depth / cfg.focal_x
    y = (v - cfg.center_y) * depth / cfg.focal_y
    points = jnp.stack([x, y, depth], axis=-1)          # [H,W,3]

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

        # Reproject into the previous frame (Fiesta.h:366-369).
        rel = jnp.linalg.solve(last_transform, transform)   # last_T^-1 @ T
        p_h = jnp.concatenate(
            [points, jnp.ones((h, w, 1), jnp.float32)], axis=-1
        )
        coord = jnp.einsum("ij,hwj->hwi", rel, p_h)
        cz = coord[..., 2] / coord[..., 3]
        cxy = coord[..., :2] / coord[..., 3:4]
        uu = cxy[..., 0] * cfg.focal_x / cz + cfg.center_x
        vv = cxy[..., 1] * cfg.focal_y / cz + cfg.center_y

        in_img = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        ui = jnp.clip(uu.astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(vv.astype(jnp.int32), 0, h - 1)
        prev = last_depth[vi, ui]                        # nearest pixel
        agree = jnp.abs(prev - cz) < cfg.depth_filter_tolerance
        valid = valid & in_img & agree

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
