"""Benchmark: demo (onboard) preset — depth-image input, local-window
updates — on one TPU chip.

The reference's second launch config (launch/demo.launch): 0.1 m
resolution over 40x40x3.6 m (400x400x36 = 5.76 M voxels), depth-image
input with the temporal consistency filter, ESDF updates restricted to a
6x6x3 m box around the robot, 10 Hz cadence.  The full tick here is the
depth-mode fused stream: back-projection + filter + carve + fusion +
exact truncated EDT in one device program per tick.

Prints one JSON line (same contract as bench.py; not the driver headline).
"""

import dataclasses
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from fiesta_tpu import configure_compile_cache
    configure_compile_cache()
    import jax.numpy as jnp

    from fiesta_tpu import DEMO_ONBOARD
    from fiesta_tpu.grid import make_state
    from fiesta_tpu.io import replay
    from fiesta_tpu.ops.depth import pose_to_matrix
    from fiesta_tpu.pipeline import fused_depth_stream

    h, w = 120, 160
    cfg = dataclasses.replace(
        replay.scale_intrinsics(DEMO_ONBOARD, h, w),
        max_points_per_scan=h * w,
    )
    log(f"grid: {cfg.grid_shape} = {cfg.num_voxels/1e6:.2f} M voxels, "
        f"res {cfg.resolution} m, depth {h}x{w}, window radius {cfg.radius}")

    world, frames = replay.make_sequence(
        cfg, n_frames=49, n_boxes=20, seed=0, kind="depth",
        height=h, width=w, period=12.0, orbit_radius=5.0,
    )
    n = len(frames) // 3
    depths = jnp.asarray(
        np.stack([f[2] for f in frames[:n * 3]]).reshape(n, 3, h, w),
        jnp.float32)
    tfs = jnp.asarray(
        np.stack([pose_to_matrix(*f[1]) for f in frames[:n * 3]]
                 ).reshape(n, 3, 4, 4), jnp.float32)
    poss = jnp.asarray(
        np.stack([frames[i * 3 + 2][1][0] for i in range(n)]), jnp.float32)

    def stream(state, d, t, p):
        return fused_depth_stream(
            cfg, state, d, t, p, use_window=not cfg.global_update)

    t0 = time.perf_counter()
    st, stats = stream(make_state(cfg), depths, tfs, poss)
    obs = int(np.asarray(stats.num_observed[-1]))
    log(f"compile+first: {time.perf_counter()-t0:.1f}s "
        f"(last tick observed={obs})")

    t0 = time.perf_counter()
    st, stats = stream(st, depths, tfs, poss)
    _ = int(np.asarray(stats.num_observed[-1]))
    batch_ms = 1e3 * (time.perf_counter() - t0) / n
    from fiesta_tpu.grid import occupied_grid

    n_occ = int(np.asarray(occupied_grid(cfg, st.logodds)).sum())
    log(f"map occupied voxels: {n_occ}")
    assert n_occ > 0, "benchmark scene mapped an empty world"
    log(f"steady: {n} depth-mode ticks -> {batch_ms:.2f} ms/batch, "
        f"{batch_ms/3:.2f} ms/frame")

    print(json.dumps({
        "metric": "esdf_update_batch_ms_demo_depth_window",
        "value": round(batch_ms, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / batch_ms, 2),
    }))


if __name__ == "__main__":
    main()
