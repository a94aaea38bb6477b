"""MPC throughput benchmark (north-star: >=1e4 rollouts per control step).

Measures plan_step latency (MPPI sampling over the ESDF + gradient
refinement) on the real chip at the production rollout count, plus rollout
throughput.  Run separately from bench.py (whose headline is the mapping
metric): ``python bench_mpc.py``.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fiesta_tpu import configure_compile_cache
    configure_compile_cache()

    from fiesta_tpu import COW_AND_LADY
    from fiesta_tpu.ops.pallas.edt import trunc_vox_for, truncated_edt_d2
    from fiesta_tpu.ops.query import distance_grid
    from fiesta_tpu.planning import mpc

    cfg = COW_AND_LADY
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.random(cfg.grid_shape) < 0.001)
    d2 = truncated_edt_d2(occ, trunc_vox_for(cfg.resolution, cfg.trunc_dist))
    dist = distance_grid(cfg, d2, jnp.ones(cfg.grid_shape, bool))

    mpc_cfg = mpc.MPCConfig()   # 16384 rollouts, horizon 30
    log(f"rollouts={mpc_cfg.n_rollouts} horizon={mpc_cfg.horizon} "
        f"refine_steps={mpc_cfg.refine_steps}")

    p0 = jnp.zeros(3)
    goal = jnp.asarray([3.0, 2.0, 0.5], jnp.float32)
    nominal = jnp.zeros((mpc_cfg.horizon, 3))
    key = jax.random.PRNGKey(0)

    # One control tick = ONE device program: receding-horizon warm-start
    # shift + MPPI + refinement.  (An eager shift_nominal between jitted
    # calls costs ~100 ms of tunnel round-trips and would swamp the solve.)
    @jax.jit
    def tick(prev_controls, k):
        return mpc.plan_step(cfg, mpc_cfg, dist, p0, jnp.zeros(3), goal,
                             mpc.shift_nominal(prev_controls), k)

    t0 = time.perf_counter()
    res = tick(nominal, key)
    jax.block_until_ready(res.controls)
    log(f"compile+first: {time.perf_counter()-t0:.1f}s")

    n = 20
    keys = list(jax.random.split(key, n))   # pre-slice: keys[i] in the
    jax.block_until_ready(keys)             # loop would be an eager op
    t0 = time.perf_counter()
    for k in keys:
        res = tick(res.controls, k)
    float(res.cost)   # host readback forces the stream to drain
    dt = (time.perf_counter() - t0) / n

    solve_ms = dt * 1e3
    rollouts_s = mpc_cfg.n_rollouts / dt
    log(f"plan_step: {solve_ms:.2f} ms -> {rollouts_s/1e6:.2f} M rollouts/s, "
        f"{1.0/dt:.1f} solves/s")

    # --- parity vs the independent CPU ESDF-gradient planner --------------
    # (BASELINE.md row "control sequence vs reference ESDF-gradient planner
    # within tolerance at same horizon"; planning/reference_planner.py is a
    # from-scratch numpy/float64/finite-difference realization of the same
    # problem, no JAX.)  Two statements: same-schedule control sequences
    # agree elementwise; the full solve's cost — scored by the INDEPENDENT
    # cost — is at least as good as the oracle's at equal horizon.
    from fiesta_tpu.planning import reference_planner as refp

    dist_np = np.asarray(dist)
    h, steps = 10, 6
    par_cfg = mpc.MPCConfig(horizon=h, n_rollouts=4, sigma=1e-6,
                            refine_steps=steps)
    p0n = np.asarray([0.5, 0.3, 0.2])
    goaln = np.asarray([2.5, 1.5, 0.4])
    nom = np.zeros((h, 3))
    res_p = mpc.plan_step(cfg, par_cfg, dist, jnp.asarray(p0n, jnp.float32),
                          jnp.zeros(3), jnp.asarray(goaln, jnp.float32),
                          jnp.asarray(nom, jnp.float32), jax.random.PRNGKey(7))
    ctrl_ref, _ = refp.plan(cfg, par_cfg, dist_np, p0n, np.zeros(3), goaln,
                            nom, steps=steps)
    max_du = float(np.abs(np.asarray(res_p.controls, np.float64)
                          - ctrl_ref).max())

    full_cfg = mpc.MPCConfig(horizon=16, n_rollouts=512, refine_steps=8)
    nom16 = np.zeros((16, 3))
    res_f = mpc.plan_step(cfg, full_cfg, dist,
                          jnp.asarray(p0n, jnp.float32), jnp.zeros(3),
                          jnp.asarray(goaln, jnp.float32),
                          jnp.asarray(nom16, jnp.float32),
                          jax.random.PRNGKey(8))
    ours_cost = refp.cost(cfg, full_cfg, dist_np, p0n, np.zeros(3),
                          np.asarray(res_f.controls, np.float64), goaln)
    _, their_cost = refp.plan(cfg, full_cfg, dist_np, p0n, np.zeros(3),
                              goaln, nom16, steps=40)
    log(f"parity: same-schedule max|du| = {max_du:.4f} (tolerance 0.05); "
        f"full solve cost {ours_cost:.3f} vs independent planner "
        f"{their_cost:.3f} (ratio {ours_cost/max(their_cost,1e-9):.3f})")

    # Budget comparison: one solve must fit a 10 Hz control tick (100 ms)
    print(json.dumps({
        "metric": "mpc_plan_step_ms_16384_rollouts",
        "value": round(solve_ms, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / solve_ms, 2),
        "parity_max_du_same_schedule": round(max_du, 4),
        "parity_cost_ratio_vs_independent_planner":
            round(ours_cost / max(their_cost, 1e-9), 4),
    }))


if __name__ == "__main__":
    main()
