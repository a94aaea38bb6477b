"""Signed-distance option (component C18, reference SIGNED_NEEDED).

The reference's #ifdef SIGNED_NEEDED variant feeds a second ESDF map with
inverted occupancy to get inside-obstacle distances
(include/Fiesta.h:39-41,216-218 — left incomplete there, TODO at
Fiesta.h:516-519).  Here the interior field is one extra truncated-EDT
pass; these tests pin the end-to-end wiring: config flag -> per-tick
maintenance -> planner consumption.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from fiesta_tpu import FiestaConfig
from fiesta_tpu.io import replay
from fiesta_tpu.io.replay import scale_intrinsics
from fiesta_tpu.pipeline import FiestaPipeline

CFG = dataclasses.replace(
    scale_intrinsics(
        FiestaConfig(
            resolution=0.1,
            origin=(-3.0, -3.0, -0.5),
            map_size=(6.0, 6.0, 2.0),
            min_ray_length=0.3,
            max_ray_length=6.0,
            max_points_per_scan=120 * 160,
            trunc_dist=2.0,
            edt_fine_dist=2.0,
        ),
        height=120, width=160),
    signed_needed=True,
)


def _mapped_pipe(n_frames=8):
    _, frames = replay.make_sequence(
        CFG, n_frames=n_frames, n_boxes=6, seed=3, kind="cloud")
    pipe = FiestaPipeline(CFG, method="scanline")
    for i, (t, (pos, quat), scan) in enumerate(frames):
        pipe.observe_pose(t, pos, quat)
        pipe.observe_cloud(t, scan)
        pipe.process()
        if i % 3 == 2:
            pipe.update()
    pipe.observe_pose(frames[-1][0] + 1.0, *frames[-1][1])
    pipe.process()
    pipe.update()
    return pipe


def test_sdf_maintained_and_correct():
    """With signed_needed set, update() maintains the SDF; values match the
    scipy EDT oracle on both sides of obstacle surfaces."""
    pipe = _mapped_pipe()
    # maintained by the tick itself (not lazily): the cache is already hot
    assert pipe._sdf_cache is not None
    assert pipe._sdf_src is pipe.state.d2
    sdf = np.asarray(pipe.sdf_grid())

    occ = np.asarray(pipe.occupied())
    seen = np.asarray(pipe.state.seen)
    assert occ.any()

    # interior: negative, magnitude = distance to nearest free voxel,
    # clamped at trunc_dist
    inside_truth = ndimage.distance_transform_edt(occ) * CFG.resolution
    want_in = -np.minimum(inside_truth, CFG.trunc_dist)
    np.testing.assert_allclose(sdf[occ], want_in[occ], atol=1e-5)

    # exterior (seen, within truncation): positive, equals the unsigned grid
    dist = np.asarray(pipe.distance_grid())
    out = ~occ & seen & (dist < CFG.infinity_distance)
    assert out.any()
    np.testing.assert_allclose(sdf[out], dist[out], atol=1e-5)
    assert (sdf[out] >= 0).all()

    # unseen free space reads infinity (unknown != free)
    unseen = ~seen & ~occ
    if unseen.any():
        assert (sdf[unseen] == CFG.infinity_distance).all()


def test_sdf_cache_invalidated_by_tick():
    pipe = _mapped_pipe(5)
    s1 = pipe.sdf_grid()
    assert pipe.sdf_grid() is s1          # cached
    # another observation + tick replaces state -> fresh SDF
    _, frames = replay.make_sequence(CFG, n_frames=2, n_boxes=6, seed=4,
                                     kind="cloud")
    t, (pos, quat), scan = frames[0]
    pipe.observe_pose(t + 100.0, pos, quat)
    pipe.observe_cloud(t + 100.0, scan)
    pipe.observe_pose(t + 101.0, pos, quat)
    pipe.process()
    pipe.update()
    assert pipe.sdf_grid() is not s1


def test_mpc_signed_grades_penetration():
    """With MPCConfig.signed, deeper interior trajectories cost more; an
    unsigned grid reads the same flat d=0 for both."""
    from fiesta_tpu.planning import mpc as mpc_mod

    cfg = dataclasses.replace(
        CFG, origin=(-3.0, -3.0, -3.0), map_size=(6.0, 6.0, 6.0))
    shape = cfg.grid_shape
    occ = np.zeros(shape, bool)
    occ[20:40, 20:40, 20:40] = True      # 2 m solid cube centered at origin

    from fiesta_tpu.ops.pallas.edt import trunc_vox_for, truncated_edt_d2
    from fiesta_tpu.ops.query import signed_distance_grid

    t = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    d2 = truncated_edt_d2(jnp.asarray(occ), t)
    seen = jnp.ones(shape, bool)
    sdf = signed_distance_grid(cfg, d2, seen, jnp.asarray(occ))

    mpc_cfg = mpc_mod.MPCConfig(horizon=4, signed=True)
    zero_ctrl = jnp.zeros((4, 3))

    def cost_at(p, signed):
        m = dataclasses.replace(mpc_cfg, signed=signed)
        pos = jnp.broadcast_to(jnp.asarray(p, jnp.float32), (4, 3))
        goal = pos[0]   # no goal/effort contribution
        return float(mpc_mod.trajectory_cost(cfg, m, sdf, pos, zero_ctrl,
                                             goal))

    surface = cost_at([0.95, 0.95, 0.95], True)  # just inside the corner
    deep = cost_at([0.05, 0.0, 0.0], True)       # at the cube center
    assert deep > surface > 0

    # unsigned handling on the same grid floors negatives at 0: flat
    flat_a = cost_at([0.95, 0.95, 0.95], False)
    flat_b = cost_at([0.05, 0.0, 0.0], False)
    assert abs(flat_a - flat_b) < 1e-4

    # out-of-map reads as deepest penetration in signed mode
    outside = cost_at([100.0, 0.0, 0.0], True)
    assert outside >= deep


def test_plan_step_signed_escapes_interior():
    """A signed solve started INSIDE an obstacle finds the gradient out of
    it (the unsigned field is flat there, giving MPPI no signal)."""
    import jax

    from fiesta_tpu.planning import mpc as mpc_mod
    from fiesta_tpu.ops.pallas.edt import trunc_vox_for, truncated_edt_d2
    from fiesta_tpu.ops.query import signed_distance_grid, distance_grid

    cfg = dataclasses.replace(
        CFG, origin=(-3.0, -3.0, -3.0), map_size=(6.0, 6.0, 6.0))
    shape = cfg.grid_shape
    occ = np.zeros(shape, bool)
    occ[24:36, 24:36, 24:36] = True      # 1.2 m cube around the origin

    t = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    d2 = truncated_edt_d2(jnp.asarray(occ), t)
    seen = jnp.ones(shape, bool)
    sdf = signed_distance_grid(cfg, d2, seen, jnp.asarray(occ))

    mpc_cfg = mpc_mod.MPCConfig(n_rollouts=256, horizon=12, refine_steps=4,
                                signed=True)
    p0 = jnp.zeros(3, jnp.float32)       # inside the cube
    goal = jnp.asarray([2.5, 0.0, 0.0], jnp.float32)
    res = mpc_mod.plan_step(cfg, mpc_cfg, sdf, p0, jnp.zeros(3), goal,
                            jnp.zeros((12, 3)), jax.random.PRNGKey(0))
    end = np.asarray(res.positions[-1])
    v = np.floor((end - np.asarray(cfg.origin)) / cfg.resolution).astype(int)
    v = np.clip(v, 0, np.asarray(shape) - 1)
    assert not occ[v[0], v[1], v[2]], (
        f"signed plan should exit the obstacle (ended at {end})")
