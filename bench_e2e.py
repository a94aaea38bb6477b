"""End-to-end benchmark: perception -> control as ONE device program.

The full robotics loop the reference system + an external planner would
run every control period: integrate the new scans (carve + endpoint
fusion), rebuild the exact truncated ESDF, derive the planner's distance
grid, and solve a receding-horizon MPC (MPPI 16 384 rollouts x horizon 30
+ gradient refinement), executing the first control.  Here the whole
period is a single jitted program streamed over N periods (``lax.scan``),
so the number is true back-to-back device throughput — no host in the
loop.

The reference's own cadence gives this loop a 100 ms budget
(update_esdf_every_n_sec = 0.1, launch/*.launch:6); the reference covers
only the mapping half (it ships no planner — BASELINE.json adds the MPC
north star of >= 1e4 rollouts/step).

Prints one JSON line: ms per perception->control period, vs_baseline =
100 ms / measured.
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

    from fiesta_tpu import COW_AND_LADY
    from fiesta_tpu.io import replay
    from fiesta_tpu.ops.query import distance_grid
    from fiesta_tpu.pipeline import FiestaPipeline, fused_batch_step
    from fiesta_tpu.planning import mpc as mpc_mod

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
    apts, avals, atfs, apos = replay.stage_update_batches(pipe, frames)
    n_total = apts.shape[0]
    log(f"staged {n_total} perception batches "
        f"({cfg.num_voxels/1e6:.1f} M voxels, {h*w} rays/scan x 3)")

    mpc_cfg = mpc_mod.MPCConfig()
    center = np.asarray(cfg.origin) + np.asarray(cfg.map_size) / 2
    goal = jnp.asarray(center + [1.5, 1.5, 0.0], jnp.float32)

    warm = 4
    for i in range(warm):
        pipe.state, _ = fused_batch_step(
            cfg, pipe.state, apts[i], avals[i], atfs[i], apos[i],
            method="scanline")
    pipe.sync_device()

    spts, svals = apts[warm:], avals[warm:]
    stfs, spos = atfs[warm:], apos[warm:]
    n = spts.shape[0]

    @jax.jit
    def run(state, p0, v0, key):
        """N perception->control periods, fully device-resident."""

        def period(carry, inp):
            st, p, v, nominal, k = carry
            pts, vals, tfs, pos = inp
            st, _stats = fused_batch_step.__wrapped__(
                cfg, st, pts, vals, tfs, pos, method="scanline")
            dist = distance_grid(cfg, st.d2, st.seen)
            k, k2 = jax.random.split(k)
            res = mpc_mod._plan_step_impl(
                cfg, mpc_cfg, dist, p, v, goal, nominal, k2)
            a = res.controls[0]
            v = jnp.clip(v + a * mpc_cfg.dt, -mpc_cfg.v_max, mpc_cfg.v_max)
            p = p + v * mpc_cfg.dt
            nominal = mpc_mod.shift_nominal(res.controls)
            return (st, p, v, nominal, k), res.cost

        nominal = jnp.zeros((mpc_cfg.horizon, 3))
        (st, p, v, _, _), costs = jax.lax.scan(
            period, (state, p0, v0, nominal, key),
            (spts, svals, stfs, spos))
        return p, v, costs

    p0 = jnp.asarray(center + [0.0, -1.5, 0.0], jnp.float32)
    v0 = jnp.zeros(3)
    key = jax.random.PRNGKey(0)

    def once():
        p, v, costs = run(pipe.state, p0, v0, key)
        return np.asarray(p), np.asarray(costs)

    t0 = time.perf_counter()
    p, costs = once()
    log(f"compile+first run: {time.perf_counter()-t0:.1f}s; "
        f"final pos {p.round(2)}, last cost {costs[-1]:.1f}")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        once()
        times.append((time.perf_counter() - t0) / n * 1e3)
    ms = float(np.median(times))
    log(f"{n} perception->control periods/stream x 3 streams: "
        f"{[round(t, 2) for t in times]} ms/period")
    print(json.dumps({
        "metric": "e2e_perception_to_control_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / ms, 2),
    }))


if __name__ == "__main__":
    main()
