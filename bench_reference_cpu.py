"""Self-measured reference baseline: the FIESTA queue algorithm on CPU.

BASELINE.md's protocol calls for self-measured reference timings since the
upstream repo publishes none.  ``native/fiesta_core.cpp`` is a clean-room
C++17 -O3 implementation of the reference's core data structure (dual
insert/delete queues + per-voxel doubly-linked closest-obstacle buckets +
24-neighbor BFS, semantics of src/ESDFMap.cpp:273-398).  This bench streams
the SAME update batches as bench.py (cow_and_lady scale: 12.8 M voxels,
3 x 49k-ray scans per 10 Hz tick) through:

  * the native CPU engine's UpdateESDF-equivalent (occupancy flips ->
    incremental BFS), timed per batch; and
  * reports the TPU tick for side-by-side context (the TPU number also
    includes carving + fusion, which the CPU number does NOT).

Prints one JSON line: native CPU ms/update batch, with vs_baseline =
cpu_ms / tpu_full_tick_ms (how many times faster the TPU full tick is
than the reference algorithm's ESDF stage alone on this host).
"""

import dataclasses
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


TPU_FULL_TICK_MS = 14.4   # bench.py headline on this chip (full tick, exact-EDT default)


def main():
    import jax
    from fiesta_tpu import configure_compile_cache
    configure_compile_cache()
    import jax.numpy as jnp

    from fiesta_tpu import COW_AND_LADY
    from fiesta_tpu.io import replay
    from fiesta_tpu.native import NativeEsdf, available
    from fiesta_tpu.ops import fusion
    from fiesta_tpu.ops.depth import pose_to_matrix
    from fiesta_tpu.pipeline import FiestaPipeline, integrate_scan_batch

    if not available():
        log("native core unavailable (build failed?)")
        sys.exit(1)

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

    # Reproduce bench.py's update batches and extract per-tick occupancy
    # flips (exactly what the reference's UpdateOccupancy hands UpdateESDF).
    fuse = jax.jit(lambda lo, seen, hit, miss: fusion.fuse_counts(
        cfg, lo, seen, hit, miss))
    native = NativeEsdf(cfg.grid_shape)

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

    cpu_times = []
    expanded_total = 0
    for bi, (pts, vals, tfs, pos) in enumerate(batches):
        pipe.state = integrate_scan_batch(
            cfg, pipe.state, pts, vals, tfs, pos, use_window=False,
            method="scanline",
        )
        fr = fuse(pipe.state.logodds, pipe.state.seen,
                  pipe.state.hit_cnt, pipe.state.miss_cnt)
        ins = np.argwhere(np.asarray(fr.insert_mask))
        dele = np.argwhere(np.asarray(fr.delete_mask))
        pipe.state = dataclasses.replace(
            pipe.state, logodds=fr.logodds, seen=fr.seen,
            hit_cnt=jnp.zeros_like(pipe.state.hit_cnt),
            miss_cnt=jnp.zeros_like(pipe.state.miss_cnt),
        )
        vox = np.concatenate([ins, dele], axis=0).astype(np.int32)
        occ = np.concatenate([
            np.ones(len(ins), np.uint8), np.zeros(len(dele), np.uint8)
        ])
        if len(vox) == 0:
            continue
        native.set_occupancy(vox, occ)
        t0 = time.perf_counter()
        expanded = native.update()
        dt = time.perf_counter() - t0
        cpu_times.append(dt)
        expanded_total += expanded
        log(f"batch {bi}: flips={len(vox)} expanded={expanded} "
            f"cpu={dt*1e3:.2f} ms")

    steady = cpu_times[4:] if len(cpu_times) > 8 else cpu_times
    cpu_ms = 1e3 * float(np.mean(steady))
    log(f"native CPU UpdateESDF: mean {cpu_ms:.1f} ms/batch "
        f"(max {1e3*max(steady):.1f}), total expanded {expanded_total}")
    log(f"TPU full tick (carve+fusion+EDT rebuild): {TPU_FULL_TICK_MS} ms")
    print(json.dumps({
        "metric": "reference_algorithm_cpu_update_ms",
        "value": round(cpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_ms / TPU_FULL_TICK_MS, 2),
    }))


if __name__ == "__main__":
    main()
