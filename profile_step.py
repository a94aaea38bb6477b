"""Profile the fused batch step piecewise on the real chip (diagnostic)."""
import dataclasses
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

    from fiesta_tpu import COW_AND_LADY
    from fiesta_tpu.io import replay
    from fiesta_tpu.pipeline import (
        FiestaPipeline, esdf_update, integrate_scan_batch)
    from fiesta_tpu.ops.depth import pose_to_matrix

    h, w = 192, 256
    cfg = dataclasses.replace(
        replay.scale_intrinsics(COW_AND_LADY, h, w),
        max_points_per_scan=h * w,
    )
    world, frames = replay.make_sequence(
        cfg, n_frames=49, n_boxes=20, seed=0, kind="cloud",
        height=h, width=w, period=12.0, orbit_radius=5.0,
    )
    pipe = FiestaPipeline(cfg, method="scanline")
    batches = []
    for i in range(0, len(frames) - 2, 3):
        trio = frames[i:i + 3]
        pts, vals, tfs = [], [], []
        for t, (pos, quat), scan in trio:
            p, v = pipe.preload_cloud(scan)
            pts.append(p)
            vals.append(v)
            tfs.append(pose_to_matrix(pos, quat))
        batches.append((
            jnp.stack(pts), jnp.stack(vals),
            jnp.asarray(np.stack(tfs), jnp.float32),
            jnp.asarray(trio[-1][1][0], jnp.float32),
        ))
    pipe.sync_device()

    def carve(b):
        pts, vals, tfs, pos = b
        pipe.state = integrate_scan_batch(
            cfg, pipe.state, pts, vals, tfs, pos,
            use_window=not cfg.global_update, method="scanline")

    def fuse(b):
        pts, vals, tfs, pos = b
        pipe.state, stats = esdf_update(
            cfg, pipe.state, pos, use_window=not cfg.global_update)
        return stats

    # warmup 4 batches full
    for i in range(4):
        carve(batches[i]); fuse(batches[i])
    pipe.sync_device()

    # measure carve only
    n = len(batches) - 4
    t0 = time.perf_counter()
    for i in range(4, len(batches)):
        carve(batches[i])
    pipe.sync_device()
    carve_ms = 1e3 * (time.perf_counter() - t0) / n
    # measure fuse+esdf only (state already carved)
    t0 = time.perf_counter()
    for i in range(4, len(batches)):
        fuse(batches[i])
    pipe.sync_device()
    fuse_ms = 1e3 * (time.perf_counter() - t0) / n
    log(f"carve (3 scans): {carve_ms:.2f} ms/batch")
    log(f"fusion+ESDF:     {fuse_ms:.2f} ms/batch")

    # isolate dispatch overhead: trivial op chain of same length
    x = jnp.zeros((8,))
    f = jax.jit(lambda x: x + 1)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n * 2):
        x = f(x)
    x.block_until_ready()
    log(f"dispatch-only 2 progs/batch: "
        f"{1e3*(time.perf_counter()-t0)/n:.2f} ms/batch")


if __name__ == "__main__":
    main()
