"""Sharded ESDF tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiesta_tpu import FiestaConfig, INF_D2, UNDEFINED_COORD
from fiesta_tpu.ops import esdf
from fiesta_tpu.parallel import sharding

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple devices"
)

CFG = FiestaConfig(
    resolution=0.1,
    origin=(-1.6, -1.0, -0.5),
    map_size=(3.2, 2.0, 1.0),   # grid 32x20x10, X divisible by 8
)


def _random_occ(shape, p, seed):
    rng = np.random.default_rng(seed)
    return rng.random(shape) < p


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_update_matches_single_device(n_dev):
    shape = CFG.grid_shape
    occ = _random_occ(shape, 0.02, 5)

    # single-device result
    d2_s, c_s, _ = esdf.update_esdf(
        jnp.full(shape, INF_D2, jnp.int32),
        jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16),
        jnp.asarray(occ), jnp.asarray(occ), jnp.zeros(shape, bool),
        None, CFG.stencil,
    )

    mesh = sharding.make_mesh(n_dev)
    step = sharding.sharded_esdf_update(CFG, mesh)
    sh3 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("x", None, None)
    )
    sh4 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "x", None, None)
    )
    d2_0 = jax.device_put(jnp.full(shape, INF_D2, jnp.int32), sh3)
    c_0 = jax.device_put(
        jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16), sh4
    )
    d2_m, c_m, iters = step(
        d2_0, c_0, jax.device_put(jnp.asarray(occ), sh3),
        jax.device_put(jnp.asarray(occ), sh3),
    )
    np.testing.assert_array_equal(np.asarray(d2_m), np.asarray(d2_s))
    assert int(iters) >= 1


def test_sharded_truncated_edt_matches_single():
    cfg = FiestaConfig(
        resolution=0.1,
        origin=(-6.4, -1.0, -0.5),
        map_size=(12.8, 2.0, 1.0),   # grid 128x20x10 -> 16 per shard
    )
    shape = cfg.grid_shape
    occ = _random_occ(shape, 0.02, 9)

    from fiesta_tpu.ops.pallas import edt

    t = 8
    want = np.asarray(edt.truncated_edt_d2(jnp.asarray(occ), t))

    mesh = sharding.make_mesh(8)
    fn = sharding.sharded_truncated_edt(cfg, mesh, t)
    sh3 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("x", None, None)
    )
    got = np.asarray(fn(jax.device_put(jnp.asarray(occ), sh3)))
    np.testing.assert_array_equal(got, want)


def test_sharded_incremental_delete():
    shape = CFG.grid_shape
    occ_a = np.zeros(shape, bool)
    occ_a[4, 6, 3] = True      # lives on shard 1 (of 8)
    occ_b = np.zeros(shape, bool)
    occ_b[28, 12, 7] = True    # lives on shard 7

    mesh = sharding.make_mesh(8)
    step = sharding.sharded_esdf_update(CFG, mesh)
    sh3 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("x", None, None)
    )
    sh4 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "x", None, None)
    )
    both = occ_a | occ_b
    d2 = jax.device_put(jnp.full(shape, INF_D2, jnp.int32), sh3)
    c = jax.device_put(jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16), sh4)
    d2, c, _ = step(d2, c, jax.device_put(jnp.asarray(both), sh3),
                    jax.device_put(jnp.asarray(both), sh3))

    # delete obstacle A: wavefront must re-propagate across shard borders
    d2, c, _ = step(d2, c, jax.device_put(jnp.asarray(occ_b), sh3),
                    jax.device_put(jnp.zeros(shape, bool), sh3))

    d2_ref, c_ref, _ = esdf.update_esdf(
        jnp.full(shape, INF_D2, jnp.int32),
        jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16),
        jnp.asarray(occ_b), jnp.asarray(occ_b), jnp.zeros(shape, bool),
        None, CFG.stencil,
    )
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d2_ref))


def test_sharded_fused_tick_matches_single_device():
    """Full production tick (carve + fusion + EDT rebuild) on an 8-device
    mesh must reproduce the single-device fused step bit-exactly.

    trunc_dist is chosen so the halo radius EXCEEDS the per-device slab
    extent (multi-hop ppermute relays)."""
    import dataclasses

    from fiesta_tpu.grid import make_state
    from fiesta_tpu.pipeline import fused_batch_step

    cfg = FiestaConfig(
        resolution=0.1,
        origin=(-3.2, -2.0, -1.2),
        map_size=(6.4, 4.0, 2.4),        # grid 64x40x24; lx = 8 on 8 dev
        min_ray_length=0.2,
        max_ray_length=1.5,
        trunc_dist=1.2,                  # t = 12 voxels > lx = 8
        edt_fine_dist=1.2,               # single-level EDT on both paths
        esdf_mode="rebuild",
        global_update=True,
    )
    rng = np.random.default_rng(7)
    k, p = 2, 300
    origins = rng.uniform(-1.0, 1.0, (k, 3)).astype(np.float32)
    origins[:, 2] *= 0.3
    pts = (origins[:, None, :]
           + rng.uniform(-2.0, 2.0, (k, p, 3))).astype(np.float32)
    tfs = np.tile(np.eye(4, dtype=np.float32), (k, 1, 1))
    tfs[:, :3, 3] = origins
    # scans are sensor-frame in the pipeline API
    pts_sensor = jnp.asarray(pts - origins[:, None, :])
    valids = jnp.asarray(rng.uniform(size=(k, p)) < 0.9)
    tfs_j = jnp.asarray(tfs)
    cur = jnp.asarray(origins[-1])

    # two ticks: the second crosses the occupancy threshold (one log-odds
    # update of l_hit=0.85 stays under the p_occ=0.8 logit of 1.39)
    ref_state = make_state(cfg)
    for _ in range(2):
        ref_state, ref_stats = fused_batch_step(
            cfg, ref_state, pts_sensor, valids, tfs_j, cur,
            use_window=False, method="scanline",
        )

    mesh = sharding.make_mesh(8)
    step = sharding.sharded_fused_tick(cfg, mesh)
    state = sharding.shard_state(make_state(cfg), mesh)
    for _ in range(2):
        state, got_stats = step(state, pts_sensor, valids, tfs_j, cur)
    got_state = state

    np.testing.assert_array_equal(np.asarray(got_state.d2),
                                  np.asarray(ref_state.d2))
    np.testing.assert_array_equal(np.asarray(got_state.logodds),
                                  np.asarray(ref_state.logodds))
    np.testing.assert_array_equal(np.asarray(got_state.seen),
                                  np.asarray(ref_state.seen))
    assert int(got_stats.num_observed) == int(ref_stats.num_observed)
    assert int(got_stats.num_inserted) == int(ref_stats.num_inserted)
    assert int(got_stats.num_inserted) > 0   # non-degenerate scene


def test_sharded_update_reach3_stencil_matches_single_device():
    """connectivity=62 reaches +-3 voxels: the halo exchange must widen to
    3 planes (derived from the stencil, not hardcoded)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, connectivity=62)
    shape = cfg.grid_shape
    occ = _random_occ(shape, 0.03, 9)

    d2_s, c_s, _ = esdf.update_esdf(
        jnp.full(shape, INF_D2, jnp.int32),
        jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16),
        jnp.asarray(occ), jnp.asarray(occ), jnp.zeros(shape, bool),
        None, cfg.stencil,
    )

    mesh = sharding.make_mesh(8)
    step = sharding.sharded_esdf_update(cfg, mesh)
    sh3 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("x", None, None)
    )
    sh4 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "x", None, None)
    )
    d2_m, c_m, iters = step(
        jax.device_put(jnp.full(shape, INF_D2, jnp.int32), sh3),
        jax.device_put(
            jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16), sh4),
        jax.device_put(jnp.asarray(occ), sh3),
        jax.device_put(jnp.asarray(occ), sh3),
    )
    np.testing.assert_array_equal(np.asarray(d2_m), np.asarray(d2_s))


def test_sharded_scroll_matches_single_device():
    """scroll_state under an 8-device X-sharded mesh: GSPMD must move
    content across shard boundaries identically to the single-device
    shift (the scrolling grid is how unbounded worlds meet the sharded
    map)."""
    import dataclasses

    from fiesta_tpu.grid import make_state
    from fiesta_tpu.scrolling import scroll_state

    shape = CFG.grid_shape
    rng = np.random.default_rng(3)
    state = make_state(CFG)
    state = dataclasses.replace(
        state,
        logodds=jnp.asarray(rng.normal(size=shape), jnp.float32),
        d2=jnp.asarray(rng.integers(0, 50, size=shape), jnp.int32),
        closest=jnp.asarray(rng.integers(0, 10, size=(3,) + shape),
                            jnp.int16),
        seen=jnp.asarray(rng.random(shape) < 0.5),
        hit_cnt=jnp.asarray(rng.integers(0, 3, size=shape), jnp.uint8),
        miss_cnt=jnp.asarray(rng.integers(0, 3, size=shape), jnp.uint8),
    )
    shift = jnp.asarray([5, -3, 2], jnp.int32)

    single = scroll_state(
        jax.tree_util.tree_map(jnp.copy, state), shift)

    mesh = sharding.make_mesh(8)
    sharded_in = sharding.shard_state(
        jax.tree_util.tree_map(jnp.copy, state), mesh)
    sharded_out = scroll_state(sharded_in, shift)

    for name in ("logodds", "d2", "closest", "seen", "hit_cnt", "miss_cnt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sharded_out, name)),
            np.asarray(getattr(single, name)), err_msg=name)


def test_distributed_mesh_single_process():
    """distributed_mesh boots the jax.distributed runtime (1-process
    coordination service) and returns the global-device mesh.  Runs in a
    subprocess: jax.distributed.initialize is process-global state."""
    import subprocess
    import sys

    import socket

    with socket.socket() as sk:     # free port: avoids collisions between
        sk.bind(("localhost", 0))   # concurrent test runs
        port = sk.getsockname()[1]
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=4'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from fiesta_tpu.parallel.sharding import distributed_mesh\n"
        f"mesh = distributed_mesh(coordinator_address='localhost:{port}',\n"
        "                        num_processes=1, process_id=0)\n"
        "assert mesh.devices.size == 4, mesh\n"
        "assert mesh.axis_names == ('x',)\n"
        "print('MESH_OK', mesh.devices.size)\n"
    )
    import os

    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "MESH_OK 4" in out.stdout, (out.stdout, out.stderr)


def test_sharded_pipeline_matches_single_device_engine():
    """ShardedFiestaPipeline (observe/process/update API on an 8-device
    mesh) reproduces the single-device fused ticks bit-exactly."""
    import dataclasses

    from fiesta_tpu.io import replay
    from fiesta_tpu.parallel.engine import ShardedFiestaPipeline
    from fiesta_tpu.pipeline import FiestaPipeline

    cfg = dataclasses.replace(
        replay.scale_intrinsics(
            FiestaConfig(
                resolution=0.1,
                origin=(-3.2, -2.0, -1.2),
                map_size=(6.4, 4.0, 2.4),      # lx = 8 on 8 devices
                min_ray_length=0.2,
                max_ray_length=1.5,
                trunc_dist=1.2,
                edt_fine_dist=1.2,
                esdf_mode="rebuild",
                global_update=True,
            ), 60, 80),
        max_points_per_scan=60 * 80,
    )
    _, frames = replay.make_sequence(
        cfg, n_frames=6, n_boxes=4, seed=3, height=60, width=80,
        orbit_radius=0.8, orbit_z=0.3, period=6.0)

    def drive(pipe):
        for i, (t, (pos, quat), scan) in enumerate(frames):
            pipe.observe_pose(t, pos, quat)
            pipe.observe_cloud(t, scan)
            if i + 1 < len(frames):
                pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
            else:
                # flush: the synchronizer releases a scan only once a
                # NEWER pose exists (run.py ends replays the same way)
                pipe.observe_pose(t + 1.0, pos, quat)
            pipe.process()
            if i % 3 == 2:
                pipe.update()
        return pipe

    mesh = sharding.make_mesh(8)
    sp = drive(ShardedFiestaPipeline(cfg, mesh=mesh, scans_per_tick=3))

    # single-device reference: the same 3-scan fused ticks
    from fiesta_tpu.pipeline import fused_batch_step
    from fiesta_tpu.ops.depth import pose_to_matrix

    ref = FiestaPipeline(cfg, method="scanline")
    for i in range(0, 6, 3):
        trio = frames[i:i + 3]
        pts, vals, tfs = [], [], []
        for t, (pos, quat), scan in trio:
            p, v = ref._pad_cloud_np(
                np.ascontiguousarray(scan, np.float32),
                np.isfinite(scan).all(axis=-1))
            pts.append(p)
            vals.append(v)
            tfs.append(np.asarray(pose_to_matrix(pos, quat)))
        ref.state, _ = fused_batch_step(
            cfg, ref.state, jnp.asarray(np.stack(pts)),
            jnp.asarray(np.stack(vals)),
            jnp.asarray(np.stack(tfs), jnp.float32),
            jnp.asarray(trio[-1][1][0], jnp.float32),
            use_window=False, method="scanline")

    np.testing.assert_array_equal(np.asarray(sp.state.d2),
                                  np.asarray(ref.state.d2))
    np.testing.assert_array_equal(np.asarray(sp.state.logodds),
                                  np.asarray(ref.state.logodds))
    # queries work transparently on the sharded state
    d = np.asarray(sp.query_distance(np.asarray([[0.0, 0.0, 0.0]])))
    assert d.shape == (1,)

    # the full multi-chip control loop: rollout-sharded MPC against the
    # sharded map matches the single-device solve on the same map (same
    # key => same noise; only psum reduction order may perturb floats)
    from fiesta_tpu.planning import mpc as mpc_mod

    mpc_cfg = mpc_mod.MPCConfig(n_rollouts=64, horizon=8, refine_steps=2)
    goal = np.asarray([0.5, 0.5, 0.0])
    sp.cur_pos = np.zeros(3)
    # key passed explicitly: plan() without a key draws from the
    # pipeline's own PRNG stream (fresh noise per solve), which would not
    # match the reference solve's PRNGKey(0)
    res_sh = sp.plan(goal, mpc_cfg, key=jax.random.PRNGKey(0))

    res_ref = mpc_mod.plan_step(
        cfg, mpc_cfg,
        ref.distance_grid(),
        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(goal, jnp.float32),
        jnp.zeros((mpc_cfg.horizon, 3), jnp.float32),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(res_sh.controls),
                               np.asarray(res_ref.controls),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(res_sh.cost), float(res_ref.cost),
                               rtol=1e-5)


def test_cli_devices_flag_runs_sharded_engine():
    """run.py --devices N drives ShardedFiestaPipeline on a virtual mesh.
    Subprocess: the device-count XLA flag must precede jax init."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "fiesta_tpu.run", "--preset", "small",
         "--platform", "cpu", "--devices", "4", "--frames", "6"],
        capture_output=True, text=True, env=env, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "sharded engine: 4-device" in out.stderr
    assert "processed 6 frames" in out.stderr


def _tick_cfg(**over):
    import dataclasses

    base = FiestaConfig(
        resolution=0.1,
        origin=(-3.2, -2.0, -1.2),
        map_size=(6.4, 4.0, 2.4),        # grid 64x40x24; lx = 8 on 8 dev
        min_ray_length=0.2,
        max_ray_length=1.5,
        trunc_dist=1.2,
        edt_fine_dist=1.2,
        esdf_mode="rebuild",
        global_update=True,
    )
    return dataclasses.replace(base, **over)


def _tick_scene(seed=7, k=2, p=300):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-1.0, 1.0, (k, 3)).astype(np.float32)
    origins[:, 2] *= 0.3
    pts = (origins[:, None, :]
           + rng.uniform(-2.0, 2.0, (k, p, 3))).astype(np.float32)
    tfs = np.tile(np.eye(4, dtype=np.float32), (k, 1, 1))
    tfs[:, :3, 3] = origins
    return (jnp.asarray(pts - origins[:, None, :]),
            jnp.asarray(rng.uniform(size=(k, p)) < 0.9),
            jnp.asarray(tfs), jnp.asarray(origins[-1]))


def _compare_tick(cfg, use_window, n_ticks=2, compare_closest=True):
    from fiesta_tpu.grid import make_state
    from fiesta_tpu.pipeline import fused_batch_step

    pts, valids, tfs, cur = _tick_scene()
    ref_state = make_state(cfg)
    for _ in range(n_ticks):
        ref_state, _ = fused_batch_step(
            cfg, ref_state, pts, valids, tfs, cur,
            use_window=use_window, method="scanline")

    mesh = sharding.make_mesh(8)
    step = sharding.sharded_fused_tick(cfg, mesh)
    state = sharding.shard_state(make_state(cfg), mesh)
    for _ in range(n_ticks):
        state, _ = step(state, pts, valids, tfs, cur)

    np.testing.assert_array_equal(np.asarray(state.logodds),
                                  np.asarray(ref_state.logodds))
    np.testing.assert_array_equal(np.asarray(state.d2),
                                  np.asarray(ref_state.d2))
    if compare_closest:
        if cfg.lazy_closest:
            # production default: ticks defer closest; the QUERY-path
            # derives must agree bit-exactly (sharded vs single device)
            from fiesta_tpu.pipeline import derive_closest

            sh = sharding.sharded_derive_closest(cfg, mesh)(state.logodds)
            ref_cl = derive_closest(cfg, ref_state.logodds)
            np.testing.assert_array_equal(np.asarray(sh),
                                          np.asarray(ref_cl))
            assert (np.asarray(sh) >= 0).any()
        else:
            np.testing.assert_array_equal(np.asarray(state.closest),
                                          np.asarray(ref_state.closest))
            assert (np.asarray(state.closest) >= 0).any()
    return state, ref_state


def test_sharded_closest_matches_single_device():
    """The sharded rebuild serves closest-obstacle coords bit-exactly vs
    the single-device packed-argmin transform (split-sign pass rides the
    X halos; payload passes are shard-local) — through the LAZY
    query-path derive (production default; _compare_tick routes the
    comparison through sharded_derive_closest)."""
    cfg = _tick_cfg()
    assert cfg.lazy_closest
    assert sharding.sharded_closest_supported(cfg)
    _compare_tick(cfg, use_window=False)


def test_sharded_eager_closest_matches_single_device():
    """The EAGER cadence (closest_mode="eager": per-tick maintenance in
    state.closest) stays bit-exact on the mesh too."""
    import dataclasses

    cfg = dataclasses.replace(_tick_cfg(), closest_mode="eager")
    assert sharding.sharded_closest_supported(cfg)
    _compare_tick(cfg, use_window=False)


def test_sharded_window_tick_matches_single_device():
    """Local-window mode (C17) on the mesh: the window gates counters and
    fusion exactly as the single-device tick."""
    cfg = _tick_cfg(global_update=False, radius=(1.0, 1.0, 0.6))
    sharded, ref = _compare_tick(cfg, use_window=True)
    # the window actually bit somewhere: some voxels stayed unseen
    assert not np.asarray(ref.seen).all()


def test_sharded_hierarchical_tick_matches_single_device():
    """Hierarchical EDT (fine exact + half-res far field) on the mesh,
    including coarse-level closest coords."""
    cfg = _tick_cfg(trunc_dist=1.6, edt_fine_dist=0.8)
    assert sharding.sharded_closest_supported(cfg)
    _compare_tick(cfg, use_window=False)


def test_sharded_scrolling_archive_matches_single_device():
    """The persistent unbounded world on the mesh
    (ShardedScrollingFiestaPipeline): recenter + archive eviction +
    revisit restore reproduce the single-device scrolling pipeline
    bit-exactly when updates align (same frames, same tick grouping)."""
    import dataclasses

    from fiesta_tpu.archive import TileArchive
    from fiesta_tpu.io import replay
    from fiesta_tpu.parallel.engine import ShardedScrollingFiestaPipeline
    from fiesta_tpu.scrolling import ScrollingFiestaPipeline

    cfg = dataclasses.replace(
        replay.scale_intrinsics(
            FiestaConfig(
                resolution=0.1,
                origin=(-3.2, -2.0, -1.2),
                map_size=(6.4, 4.0, 2.4),   # grid 64x40x24; lx=8 on 8 dev
                min_ray_length=0.2,
                max_ray_length=2.2,
                trunc_dist=1.2,
                edt_fine_dist=1.2,
                esdf_mode="rebuild",
                global_update=True,
            ), 60, 80),
        max_points_per_scan=60 * 80,
    )
    # two full orbits, wide enough that SEEN content scrolls out (archive
    # eviction) and is revisited (restore): grid half-extent 3.2 m,
    # recenter at 0.25 * half = 0.8 m off-center, sensor range 2.2 m keeps
    # the scene visible from the orbit
    # period 1.0 s at 30 Hz: 24 frames sweep ~0.8 orbits, so early-mapped
    # content scrolls out of the window (eviction) and comes back (restore)
    _, frames = replay.make_sequence(
        cfg, n_frames=24, n_boxes=8, seed=6, height=60, width=80,
        orbit_radius=1.8, orbit_z=0.2, period=1.0)

    def drive(pipe):
        # tick every frame: recenter checks then happen at identical
        # points on both engines (the sharded engine defers recenters
        # while scans are buffered, so per-frame ticks are the aligned
        # cadence)
        for i, (t, (pos, quat), scan) in enumerate(frames):
            pipe.observe_pose(t, pos, quat)
            pipe.observe_cloud(t, scan)
            if i + 1 < len(frames):
                pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
            else:
                pipe.observe_pose(t + 1.0, pos, quat)
            pipe.process()
            pipe.update()
        return pipe

    mesh = sharding.make_mesh(8)
    sp = drive(ShardedScrollingFiestaPipeline(
        cfg, mesh=mesh, scans_per_tick=1, archive=TileArchive()))
    ref = drive(ScrollingFiestaPipeline(
        cfg, method="scanline", archive=TileArchive()))

    # non-degenerate: the orbit actually forced recenters + archive traffic
    assert sp.scroll_count > 0
    assert sp.scroll_count == ref.scroll_count
    assert np.array_equal(sp.origin_vox, ref.origin_vox)
    assert sp.archive.num_tiles == ref.archive.num_tiles > 0

    np.testing.assert_array_equal(np.asarray(sp.state.logodds),
                                  np.asarray(ref.state.logodds))
    np.testing.assert_array_equal(np.asarray(sp.state.seen),
                                  np.asarray(ref.state.seen))
    np.testing.assert_array_equal(np.asarray(sp.state.d2),
                                  np.asarray(ref.state.d2))
    np.testing.assert_array_equal(np.asarray(sp.state.closest),
                                  np.asarray(ref.state.closest))

    # world-frame queries agree through the virtual-frame shift
    q = np.asarray([[0.5, 0.5, 0.2], [-0.5, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(sp.query_distance(q)),
                               np.asarray(ref.query_distance(q)),
                               atol=1e-6)


def test_cli_devices_scrolling_runs_sharded_unbounded_world():
    """run.py --devices N --scrolling --persist drives the sharded
    unbounded persistent world end to end (recenter + archive)."""
    import os
    import subprocess
    import sys
    import tempfile

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    with tempfile.TemporaryDirectory() as td:
        persist = os.path.join(td, "world.npz")
        out = subprocess.run(
            [sys.executable, "-m", "fiesta_tpu.run", "--preset", "small",
             "--platform", "cpu", "--devices", "4", "--frames", "12",
             "--scrolling", "--persist", persist],
            capture_output=True, text=True, env=env, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "sharded scrolling engine: 4-device" in out.stderr
        assert "world archive:" in out.stderr
        assert os.path.exists(persist)


def test_sharded_sdf_matches_single_device():
    """The sharded signed-distance derivation (interior EDT with X halos)
    matches query.signed_distance_grid bit-for-bit, and signed planning
    works through the sharded engine."""
    import dataclasses

    from fiesta_tpu.io import replay
    from fiesta_tpu.ops.query import signed_distance_grid
    from fiesta_tpu.grid import occupied_grid
    from fiesta_tpu.parallel.engine import ShardedFiestaPipeline

    cfg = dataclasses.replace(
        replay.scale_intrinsics(
            FiestaConfig(
                resolution=0.1,
                origin=(-3.2, -2.0, -1.2),
                map_size=(6.4, 4.0, 2.4),
                min_ray_length=0.2,
                max_ray_length=2.2,
                trunc_dist=1.2,
                edt_fine_dist=1.2,
                esdf_mode="rebuild",
                signed_needed=True,
            ), 60, 80),
        max_points_per_scan=60 * 80,
    )
    _, frames = replay.make_sequence(
        cfg, n_frames=6, n_boxes=6, seed=3, height=60, width=80,
        orbit_radius=0.8, period=6.0)
    mesh = sharding.make_mesh(8)
    pipe = ShardedFiestaPipeline(cfg, mesh=mesh, scans_per_tick=3)
    for i, (t, (pos, quat), scan) in enumerate(frames):
        pipe.observe_pose(t, pos, quat)
        pipe.observe_cloud(t, scan)
        if i + 1 < len(frames):
            pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
        else:
            pipe.observe_pose(t + 1.0, pos, quat)
        pipe.process()
        if i % 3 == 2:
            pipe.update()
    pipe.update()

    sdf = np.asarray(pipe.sdf_grid())
    want = np.asarray(signed_distance_grid(
        cfg, pipe.state.d2, pipe.state.seen,
        occupied_grid(cfg, pipe.state.logodds)))
    np.testing.assert_array_equal(sdf, want)
    occ = np.asarray(occupied_grid(cfg, pipe.state.logodds))
    assert occ.any() and (sdf[occ] <= 0).all()

    # signed solve through the sharded planner consumes the SDF cache
    from fiesta_tpu.planning import mpc as mpc_mod

    res = pipe.plan(np.asarray([0.5, 0.5, 0.0]),
                    mpc_mod.MPCConfig(n_rollouts=64, horizon=6,
                                      refine_steps=2, signed=True))
    assert np.asarray(res.controls).shape == (6, 3)
    assert pipe._dist_cache_signed is True


def test_sharded_window_hierarchical_combined():
    """Window mode AND hierarchical EDT together on the mesh (the full
    demo-preset feature combination) stays bit-exact vs single device."""
    cfg = _tick_cfg(global_update=False, radius=(1.0, 1.0, 0.6),
                    trunc_dist=1.6, edt_fine_dist=0.8)
    _compare_tick(cfg, use_window=True)


def test_sharded_pipeline_depth_input():
    """Depth-image input on the sharded engine: device back-projection +
    consistency filter at observe time, cloud pairs into the sharded
    tick.  Must map content and match the single-device depth pipeline's
    occupancy."""
    import dataclasses

    from fiesta_tpu.io import replay
    from fiesta_tpu.parallel.engine import ShardedFiestaPipeline
    from fiesta_tpu.pipeline import FiestaPipeline
    from fiesta_tpu.grid import occupied_grid

    h, w = 60, 80
    cfg = dataclasses.replace(
        replay.scale_intrinsics(
            FiestaConfig(
                resolution=0.1,
                origin=(-3.2, -2.0, -1.2),
                map_size=(6.4, 4.0, 2.4),
                min_ray_length=0.2,
                max_ray_length=2.2,
                trunc_dist=1.2,
                edt_fine_dist=1.2,
                esdf_mode="rebuild",
            ), h, w),
        max_points_per_scan=h * w,
    )
    _, frames = replay.make_sequence(
        cfg, n_frames=6, n_boxes=6, seed=3, kind="depth",
        height=h, width=w, orbit_radius=0.8, period=6.0)

    def drive(pipe):
        for i, (t, (pos, quat), scan) in enumerate(frames):
            pipe.observe_pose(t, pos, quat)
            pipe.observe_depth(t, scan)
            if i + 1 < len(frames):
                pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
            else:
                pipe.observe_pose(t + 1.0, pos, quat)
            pipe.process()
            if i % 3 == 2:
                pipe.update()
        pipe.update()
        return pipe

    mesh = sharding.make_mesh(8)
    sp = drive(ShardedFiestaPipeline(cfg, mesh=mesh, scans_per_tick=3))
    occ_sh = np.asarray(occupied_grid(cfg, sp.state.logodds))
    assert occ_sh.any(), "sharded depth pipeline mapped nothing"

    ref = drive(FiestaPipeline(cfg, method="scanline"))
    occ_ref = np.asarray(occupied_grid(cfg, ref.state.logodds))
    np.testing.assert_array_equal(occ_sh, occ_ref)
    np.testing.assert_array_equal(np.asarray(sp.state.d2),
                                  np.asarray(ref.state.d2))
