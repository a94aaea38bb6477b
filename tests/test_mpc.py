"""MPC planning layer tests (north-star component)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiesta_tpu import FiestaConfig
from fiesta_tpu.ops import esdf
from fiesta_tpu.ops.query import distance_grid
from fiesta_tpu.planning import mpc

CFG = FiestaConfig(
    resolution=0.1,
    origin=(-4.0, -4.0, -1.0),
    map_size=(8.0, 8.0, 2.0),
)

SMALL_MPC = mpc.MPCConfig(
    horizon=20, dt=0.1, n_rollouts=512, refine_steps=5,
)


def _make_world():
    """A wall with distances: obstacle slab at x in [0.0, 0.2]."""
    shape = CFG.grid_shape
    occ = np.zeros(shape, bool)
    occ[40:42, 10:70, :] = True      # wall at x≈0, y in [-3,3]
    d2, closest = esdf.build_esdf(jnp.asarray(occ))
    seen = jnp.ones(shape, bool)
    return distance_grid(CFG, d2, seen), occ


def test_rollout_dynamics():
    ctrl = jnp.ones((10, 3)) * 2.0
    pos = mpc.rollout_positions(SMALL_MPC, jnp.zeros(3), jnp.zeros(3), ctrl)
    assert pos.shape == (10, 3)
    p = np.asarray(pos)
    # monotone motion, speed capped at v_max
    assert np.all(np.diff(p[:, 0]) > 0)
    assert np.max(np.diff(p[:, 0])) <= SMALL_MPC.v_max * SMALL_MPC.dt + 1e-6


def test_plan_avoids_wall():
    dist, occ = _make_world()
    p0 = jnp.array([-2.0, 0.0, 0.0])
    goal = jnp.array([-0.7, 0.0, 0.0])   # 0.7 m in front of the wall
    nominal = jnp.zeros((SMALL_MPC.horizon, 3))
    res = mpc.plan_step(
        CFG, SMALL_MPC, dist, p0, jnp.zeros(3), goal, nominal,
        jax.random.PRNGKey(0),
    )
    pos = np.asarray(res.positions)
    assert np.isfinite(float(res.cost))
    # trajectory approaches the goal
    final_err = np.linalg.norm(pos[-1] - np.asarray(goal))
    assert final_err < 1.0, f"final error {final_err}"
    # trajectory never crosses into the wall (x < wall face with margin)
    assert pos[:, 0].max() < 0.05, f"penetrated wall: x={pos[:,0].max()}"


def test_plan_straight_line_when_free():
    dist, _ = _make_world()
    p0 = jnp.array([-3.0, -2.0, 0.0])
    goal = jnp.array([-3.0, 2.0, 0.0])   # parallel to the wall, far from it
    nominal = jnp.zeros((SMALL_MPC.horizon, 3))
    res = mpc.plan_step(
        CFG, SMALL_MPC, dist, p0, jnp.zeros(3), goal, nominal,
        jax.random.PRNGKey(1),
    )
    pos = np.asarray(res.positions)
    final_err = np.linalg.norm(pos[-1] - np.asarray(goal))
    assert final_err < 0.8
    # stays clear of the wall the whole way
    assert pos[:, 0].max() < -1.0


def test_receding_horizon_improves():
    """Re-planning with warm starts makes consistent progress to the goal."""
    dist, _ = _make_world()
    p = jnp.array([-2.5, -1.5, 0.0])
    v = jnp.zeros(3)
    goal = jnp.array([-1.0, 1.5, 0.5])
    nominal = jnp.zeros((SMALL_MPC.horizon, 3))
    key = jax.random.PRNGKey(2)
    for it in range(5):
        key, k = jax.random.split(key)
        res = mpc.plan_step(CFG, SMALL_MPC, dist, p, v, goal, nominal, k)
        # execute first control
        a = res.controls[0]
        v = jnp.clip(v + a * SMALL_MPC.dt, -SMALL_MPC.v_max, SMALL_MPC.v_max)
        p = p + v * SMALL_MPC.dt
        nominal = mpc.shift_nominal(res.controls)
    err = float(jnp.linalg.norm(p - goal))
    # smoke test of the warm-started replanning loop: from standstill, half
    # a second of accel-limited motion shrinks the 3.39 m initial error
    assert err < 3.2, f"no progress toward goal: {err}"


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_planner_runs():
    from fiesta_tpu.parallel.sharding import make_mesh

    dist, _ = _make_world()
    mesh = make_mesh(8)
    planner = mpc.make_sharded_planner(CFG, SMALL_MPC, mesh)
    res = planner(
        dist, jnp.array([-2.0, 0.0, 0.0]), jnp.zeros(3),
        jnp.array([-0.7, 0.0, 0.0]), jnp.zeros((SMALL_MPC.horizon, 3)),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(res.cost))
