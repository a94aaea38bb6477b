"""Full-loop test (BASELINE config 5): streaming mapping + MPC flight.

Builds the ESDF from a synthetic replay, then flies a receding-horizon MPC
across the mapped room, asserting the executed trajectory stays collision
free against the *true* world geometry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fiesta_tpu import FiestaConfig
from fiesta_tpu.io import replay
from fiesta_tpu.io.replay import scale_intrinsics
from fiesta_tpu.pipeline import FiestaPipeline
from fiesta_tpu.planning import mpc


def test_map_then_fly():
    cfg = scale_intrinsics(
        FiestaConfig(
            resolution=0.1,
            origin=(-3.0, -3.0, -0.5),
            map_size=(6.0, 6.0, 2.0),
            min_ray_length=0.3,
            max_ray_length=6.0,
            max_points_per_scan=120 * 160,
        ),
        height=120, width=160,
    )
    world, frames = replay.make_sequence(
        cfg, n_frames=18, n_boxes=5, seed=11, height=120, width=160,
        period=6.0, orbit_radius=1.2,
    )
    pipe = FiestaPipeline(cfg, method="scanline")
    for i, (t, (pos, quat), scan) in enumerate(frames):
        pipe.observe_pose(t, pos, quat)
        pipe.observe_cloud(t, scan)
        if i + 1 < len(frames):
            pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
        pipe.process()
        if i % 3 == 2:
            pipe.update()
    pipe.observe_pose(frames[-1][0] + 1.0, *frames[-1][1])
    pipe.process()
    pipe.update()

    dist = pipe.distance_grid()

    # fly across the room center at flight height
    mpc_cfg = mpc.MPCConfig(
        horizon=16, dt=0.1, n_rollouts=1024, refine_steps=15, margin=0.3,
    )
    p = jnp.asarray([-1.5, -1.5, 0.6], jnp.float32)
    v = jnp.zeros(3)
    goal = jnp.asarray([1.5, 1.5, 0.6], jnp.float32)
    nominal = jnp.zeros((mpc_cfg.horizon, 3))
    key = jax.random.PRNGKey(3)

    executed = [np.asarray(p)]
    for step in range(40):
        key, k = jax.random.split(key)
        res = mpc.plan_step(cfg, mpc_cfg, dist, p, v, goal, nominal, k)
        a = res.controls[0]
        v = jnp.clip(v + a * mpc_cfg.dt, -mpc_cfg.v_max, mpc_cfg.v_max)
        p = p + v * mpc_cfg.dt
        nominal = mpc.shift_nominal(res.controls)
        executed.append(np.asarray(p))
        if float(jnp.linalg.norm(p - goal)) < 0.3:
            break

    executed = np.asarray(executed)
    final_err = np.linalg.norm(executed[-1] - np.asarray(goal))
    assert final_err < 1.0, f"did not approach goal: {final_err:.2f} m"

    # executed path must stay clear of TRUE world obstacles
    from scipy import ndimage

    occ_true = world.occupied_voxels(cfg)
    true_dist = ndimage.distance_transform_edt(~occ_true) * cfg.resolution
    vox = np.floor(
        (executed - np.asarray(cfg.origin)) / cfg.resolution
    ).astype(int)
    vox = np.clip(vox, 0, np.asarray(cfg.grid_shape) - 1)
    clearances = true_dist[vox[:, 0], vox[:, 1], vox[:, 2]]
    assert clearances.min() > 0.1, (
        f"trajectory came within {clearances.min():.2f} m of an obstacle"
    )
