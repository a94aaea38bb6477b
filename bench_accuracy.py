"""Accuracy benchmark: reference algorithm vs TPU production EDT vs exact.

BASELINE.md's protocol includes the reference's own accuracy oracle
(CheckWithGroundTruth, src/ESDFMap.cpp:905-1054): signed per-voxel error
against exact nearest-obstacle distances, flagged above 1e-3, histogram in
0.1 m buckets.  This bench runs that oracle over the SAME streamed
occupancy on three engines:

  * reference algorithm (native/fiesta_core.cpp: clean-room queue+DLL
    incremental 24-neighbor BFS, semantics of src/ESDFMap.cpp:273-398),
    fed the exact per-tick occupancy flips;
  * fiesta_tpu production path (truncated EDT rebuild — EXACT within
    trunc_dist at the default config; hierarchical half-res far field
    when edt_fine_dist < trunc_dist);
  * exact EDT (scipy.ndimage.distance_transform_edt) — ground truth.

Errors are reported over the planner-relevant domain (true distance <=
trunc_dist).  Expectations this codifies: the reference's BFS never
underestimates (its documented bias direction); the TPU path is exact
within edt_fine_dist and within one coarse voxel beyond it.

Prints one JSON line: TPU rms error (m) with vs_baseline =
reference_rms / tpu_rms (>1 means the TPU path is more accurate).
"""

import dataclasses
import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def error_report(name, dist_m, exact_m, domain, res):
    """The reference oracle's stats (ESDFMap.cpp:955-1058): signed error
    over ``domain``, 0.1-bucket histogram of |error| above 1e-3."""
    err = dist_m[domain] - exact_m[domain]
    inf_mask = ~np.isfinite(dist_m[domain])
    n_inf = int(inf_mask.sum())
    err = err[~inf_mask]
    hist, _ = np.histogram(
        np.abs(err), bins=[1e-3] + [0.1 * k for k in range(1, 11)] + [1e9])
    rep = {
        "engine": name,
        "n": int(err.size),
        "n_unreachable": n_inf,
        "rms": float(np.sqrt(np.mean(err ** 2))),
        "mean": float(err.mean()),
        "max": float(err.max()),
        "min": float(err.min()),
        "frac_within_res": float(np.mean(np.abs(err) <= res + 1e-6)),
        "hist_0.1_buckets": hist.tolist(),
    }
    log(f"{name:<28s} rms={rep['rms']:.4f} m  mean={rep['mean']:.4f}  "
        f"max={rep['max']:.3f}  min={rep['min']:.3f}  "
        f"<=res: {100*rep['frac_within_res']:.2f}%  "
        f"unreachable={n_inf}")
    return rep


def main():
    import jax
    from fiesta_tpu import configure_compile_cache
    configure_compile_cache()
    import jax.numpy as jnp
    from scipy import ndimage

    from fiesta_tpu import COW_AND_LADY
    from fiesta_tpu.io import replay
    from fiesta_tpu.native import NativeEsdf, available
    from fiesta_tpu.ops import fusion
    from fiesta_tpu.ops.depth import pose_to_matrix
    from fiesta_tpu.ops.pallas import edt as edt_mod
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
        cfg, n_frames=26, n_boxes=20, seed=0, kind="cloud",
        height=h, width=w, period=12.0, orbit_radius=5.0,
    )
    pipe = FiestaPipeline(cfg, method="scanline")
    fuse = jax.jit(lambda lo, seen, hit, miss: fusion.fuse_counts(
        cfg, lo, seen, hit, miss))
    native = NativeEsdf(cfg.grid_shape)
    res = cfg.resolution

    nbatches = 0
    for i in range(0, len(frames) - 2, 3):
        trio = frames[i:i + 3]
        pts, vals, tfs = [], [], []
        for t, (pos, quat), scan in trio:
            p, v = pipe.preload_cloud(scan)
            pts.append(p)
            vals.append(v)
            tfs.append(pose_to_matrix(pos, quat))
        pipe.state = integrate_scan_batch(
            cfg, pipe.state, jnp.stack(pts), jnp.stack(vals),
            jnp.asarray(np.stack(tfs), jnp.float32),
            jnp.asarray(trio[-1][1][0], jnp.float32),
            use_window=False, method="scanline",
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
        occ_flags = np.concatenate([
            np.ones(len(ins), np.uint8), np.zeros(len(dele), np.uint8)])
        if len(vox):
            native.set_occupancy(vox, occ_flags)
            native.update()
        nbatches += 1
        log(f"batch {nbatches}: +{len(ins)} obstacles, -{len(dele)}")

    # final occupancy (identical input to all three engines)
    occ = np.asarray(pipe.occupied())
    n_occ = int(occ.sum())
    log(f"streamed {nbatches} update batches; {n_occ} occupied voxels")
    assert n_occ > 0

    # exact ground truth
    exact_m = ndimage.distance_transform_edt(~occ) * res

    # reference algorithm's final state
    ref_d2 = native.dist2().astype(np.float64)
    ref_m = np.where(ref_d2 < 0, np.inf, np.sqrt(np.maximum(ref_d2, 0)) * res)

    # TPU production EDT (the rebuild-mode tick's d2, bit-identical path)
    t_total = edt_mod.trunc_vox_for(res, cfg.trunc_dist)
    t_fine = edt_mod.trunc_vox_for(res, cfg.edt_fine_dist)
    # mirror pipeline.esdf_update's dispatch exactly (incl. the even-dims
    # condition, pipeline.py:121-124)
    hierarchical = (t_fine < t_total
                    and all(g % 2 == 0 for g in cfg.grid_shape))
    if hierarchical:
        fn = lambda o: edt_mod.hierarchical_edt_d2(o, t_fine, t_total)
    else:
        fn = lambda o: edt_mod.truncated_edt_d2(o, t_total)
    d2 = jax.jit(fn)(jnp.asarray(occ))
    d2 = np.asarray(d2).astype(np.float64)
    from fiesta_tpu import INF_D2
    tpu_m = np.where(d2 >= float(INF_D2), np.inf, np.sqrt(d2) * res)

    reports = {}
    for dom_name, lim in (("fine (<= edt_fine_dist)", cfg.edt_fine_dist),
                          ("full (<= trunc_dist)", cfg.trunc_dist)):
        domain = exact_m <= lim
        log(f"--- domain: {dom_name}  ({int(domain.sum())} voxels) ---")
        reports[dom_name] = {
            "reference": error_report(
                "reference queue-BFS (native)", ref_m, exact_m, domain, res),
            "tpu": error_report(
                "fiesta_tpu EDT rebuild", tpu_m, exact_m, domain, res),
        }

    full = reports["full (<= trunc_dist)"]
    fine = reports["fine (<= edt_fine_dist)"]
    # contract checks, stated loudly.  n_unreachable == 0 matters: a voxel
    # wrongly truncated to INF inside the exact radius would otherwise be
    # silently dropped from the error stats and the max/min checks.
    assert fine["tpu"]["n_unreachable"] == 0, \
        "TPU EDT truncated a voxel inside edt_fine_dist"
    assert fine["tpu"]["max"] <= 1e-6 and fine["tpu"]["min"] >= -1e-6, \
        "TPU EDT must be EXACT within edt_fine_dist"
    assert full["tpu"]["max"] <= 2 * res * np.sqrt(3) + 1e-6, \
        "TPU coarse-level error must stay within one coarse voxel"
    assert full["reference"]["min"] >= -1e-6, \
        "reference BFS never underestimates"

    tpu_rms = full["tpu"]["rms"]
    ref_rms = full["reference"]["rms"]
    # vs_baseline: reference rms / tpu rms, floored at one micron so a
    # zero-error result reads as a large-but-finite ratio
    print(json.dumps({
        "metric": "esdf_rms_error_m_vs_exact",
        "value": round(tpu_rms, 6),
        "unit": "m",
        "vs_baseline": round(max(ref_rms, 1e-6) / max(tpu_rms, 1e-6), 2),
    }))


if __name__ == "__main__":
    main()
