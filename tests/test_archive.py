"""Persistent-world tile archive tests (reference C3: HASH_TABLE block map
retains the entire explored world, src/ESDFMap.cpp:128-167, 704-783)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fiesta_tpu import FiestaConfig
from fiesta_tpu.archive import TileArchive
from fiesta_tpu.grid import occupied_grid
from fiesta_tpu.scrolling import ScrollingFiestaPipeline


# ---------------------------------------------------------------------------
# TileArchive unit tests
# ---------------------------------------------------------------------------


def test_archive_roundtrip_across_tiles_and_negative_coords():
    arch = TileArchive(tile_shape=(8, 8, 4))
    rng = np.random.default_rng(0)
    shape = (13, 9, 6)                      # straddles tile boundaries
    lo = rng.normal(size=shape).astype(np.float32)
    seen = rng.random(shape) < 0.7
    world_lo = (-5, -3, -2)                 # negative world voxels
    arch.store(world_lo, lo, seen)

    got_lo, got_seen, any_data = arch.load(world_lo, shape)
    assert any_data
    np.testing.assert_array_equal(got_seen, seen)
    # unseen voxels inside allocated tiles read back as unknown only if the
    # stored value was unknown; the store wrote them verbatim
    np.testing.assert_array_equal(got_lo, lo)

    # a disjoint never-touched region is all-unknown
    far_lo, far_seen, far_any = arch.load((1000, 1000, 1000), (4, 4, 4))
    assert not far_any
    assert not far_seen.any() and (far_lo == 0).all()


def test_archive_skips_unseen_chunks():
    arch = TileArchive(tile_shape=(8, 8, 8))
    lo = np.zeros((16, 8, 8), np.float32)
    seen = np.zeros((16, 8, 8), bool)
    seen[2, 3, 4] = True                    # only the first tile has content
    arch.store((0, 0, 0), lo, seen)
    assert arch.num_tiles == 1
    assert arch.seen_voxels() == 1

    # but an existing tile DOES take an all-unseen overwrite (forgetting
    # previously-archived content must stick)
    arch.store((0, 0, 0), lo, np.zeros_like(seen))
    assert arch.num_tiles == 1
    assert arch.seen_voxels() == 0


def test_archive_partial_tile_update_preserves_rest():
    arch = TileArchive(tile_shape=(8, 8, 8))
    full = np.full((8, 8, 8), 2.0, np.float32)
    arch.store((0, 0, 0), full, np.ones((8, 8, 8), bool))
    # overwrite one corner box only
    arch.store((0, 0, 0), np.full((2, 2, 2), -1.0, np.float32),
               np.ones((2, 2, 2), bool))
    got, _, _ = arch.load((0, 0, 0), (8, 8, 8))
    assert (got[:2, :2, :2] == -1.0).all()
    assert (got[4:, 4:, 4:] == 2.0).all()


def test_archive_file_roundtrip(tmp_path):
    arch = TileArchive(tile_shape=(4, 4, 4))
    rng = np.random.default_rng(1)
    lo = rng.normal(size=(9, 5, 4)).astype(np.float32)
    seen = np.ones((9, 5, 4), bool)
    arch.store((-7, 2, 0), lo, seen)
    path = str(tmp_path / "world.npz")
    arch.save(path)

    back = TileArchive.from_file(path)
    assert back.tile_shape == (4, 4, 4)
    got, got_seen, any_data = back.load((-7, 2, 0), (9, 5, 4))
    assert any_data
    np.testing.assert_array_equal(got, lo)
    np.testing.assert_array_equal(got_seen, seen)


# ---------------------------------------------------------------------------
# Persistent scrolling pipeline: leave, come back, world remembered
# ---------------------------------------------------------------------------

CFG = FiestaConfig(
    resolution=0.1,
    origin=(-2.0, -2.0, -1.0),
    map_size=(4.0, 4.0, 2.0),          # 40 x 40 x 20 grid
    trunc_dist=2.0,
    edt_fine_dist=2.0,
)


def _plant_obstacle(pipe):
    """Fully-observed map with one obstacle at world (0.05, 0.05, 0.05)
    == world voxel (20, 20, 10); distances derived as an update tick
    would derive them."""
    lo = np.zeros(pipe.cfg.grid_shape, np.float32)
    lo[20, 20, 10] = 5.0
    pipe.state = dataclasses.replace(
        pipe.state,
        logodds=jnp.asarray(lo),
        seen=jnp.ones(pipe.cfg.grid_shape, bool),
    )
    _derive(pipe)


def _derive(pipe):
    occ = occupied_grid(pipe.cfg, pipe.state.logodds)
    if pipe.cfg.esdf_mode == "rebuild":
        from fiesta_tpu.pipeline import rebuild_d2_jit

        pipe.state = dataclasses.replace(
            pipe.state, d2=rebuild_d2_jit(pipe.cfg, occ))
    else:
        from fiesta_tpu.ops import esdf

        d2, closest, _ = esdf.update_esdf(
            pipe.state.d2, pipe.state.closest, occ, occ,
            jnp.zeros_like(occ), None, pipe.cfg.relax_dirs)
        pipe.state = dataclasses.replace(pipe.state, d2=d2, closest=closest)


def _walk(pipe, x):
    """Recenter toward world x until the grid settles."""
    for _ in range(64):
        if not pipe.maybe_recenter(np.array([x, 0.05, 0.05])):
            return
    raise AssertionError("recentering did not settle")


@pytest.mark.parametrize("esdf_mode", ["rebuild", "incremental"])
def test_persistent_scroll_restores_explored_world(esdf_mode):
    cfg = dataclasses.replace(CFG, esdf_mode=esdf_mode)
    pipe = ScrollingFiestaPipeline(cfg, archive=True)
    _plant_obstacle(pipe)

    probe = np.array([[0.05, 0.55, 0.05]])      # 0.5 m from the obstacle
    d_before = float(pipe.query_distance(probe)[0])
    assert abs(d_before - 0.5) < 1e-5

    # fly +x far enough that the obstacle's column is evicted
    _walk(pipe, 8.0)
    assert pipe.scroll_count > 0
    assert pipe.origin_vox[0] > 21, "obstacle must have left the grid"
    assert pipe.archive.num_tiles > 0
    assert not bool(occupied_grid(cfg, pipe.state.logodds).any())

    # fly back: the archived world must be restored
    _walk(pipe, 0.05)
    assert pipe.restore_count > 0
    gv = np.array([20, 20, 10]) - pipe.origin_vox
    assert (gv >= 0).all() and (gv < np.array(cfg.grid_shape)).all()
    assert float(pipe.state.logodds[tuple(gv)]) == 5.0
    assert bool(pipe.state.seen[tuple(gv)])
    assert int(pipe.state.d2[tuple(gv)]) == 0

    d_after = float(pipe.query_distance(probe)[0])
    assert abs(d_after - d_before) < 1e-5


def test_plain_scrolling_forgets_but_archive_remembers():
    """Contrast test: without an archive the same trip loses the world."""
    pipe = ScrollingFiestaPipeline(CFG)
    _plant_obstacle(pipe)
    _walk(pipe, 8.0)
    _walk(pipe, 0.05)
    assert not bool(occupied_grid(CFG, pipe.state.logodds).any())


def test_cli_persist_flag(tmp_path):
    """run.py --scrolling --persist saves and reloads the archive."""
    from fiesta_tpu.run import main

    path = str(tmp_path / "arch.npz")
    args = ["--preset", "small", "--frames", "6", "--platform", "cpu",
            "--scrolling", "--persist", path, "--seed", "2"]
    assert main(args) == 0
    assert (tmp_path / "arch.npz").exists()
    assert main(args) == 0      # second run loads the saved directory

    arch = TileArchive.from_file(path)
    assert arch.seen_voxels() > 0


def test_archive_any_data_gates_on_seen_content():
    """A tile allocated for a neighboring chunk must not report data for a
    purely-unseen overlap (would trigger needless distance rebuilds)."""
    arch = TileArchive(tile_shape=(8, 8, 8))
    seen = np.zeros((8, 8, 8), bool)
    seen[0, 0, 0] = True
    arch.store((0, 0, 0), np.ones((8, 8, 8), np.float32), seen)
    _, _, any_data = arch.load((4, 4, 4), (4, 4, 4))   # unseen corner
    assert not any_data
    _, _, any_data = arch.load((0, 0, 0), (2, 2, 2))   # seen corner
    assert any_data


def test_preloaded_archive_hydrates_initial_window():
    """Cross-run persistence: a new pipeline over a loaded directory must
    answer queries over already-explored space, and re-storing its window
    must not erase the directory's content."""
    pipe1 = ScrollingFiestaPipeline(CFG, archive=True)
    _plant_obstacle(pipe1)
    # what run.py does at exit: archive the current window, then save
    pipe1.archive.store(pipe1.origin_vox,
                        np.asarray(pipe1.state.logodds),
                        np.asarray(pipe1.state.seen))
    n_seen = pipe1.archive.seen_voxels()
    assert n_seen > 0

    pipe2 = ScrollingFiestaPipeline(CFG, archive=pipe1.archive)
    assert float(pipe2.state.logodds[20, 20, 10]) == 5.0
    assert int(pipe2.state.d2[20, 20, 10]) == 0
    d = float(pipe2.query_distance(np.array([[0.05, 0.55, 0.05]]))[0])
    assert abs(d - 0.5) < 1e-5

    # the end-of-run store of the hydrated window is lossless
    pipe2.archive.store(pipe2.origin_vox,
                        np.asarray(pipe2.state.logodds),
                        np.asarray(pipe2.state.seen))
    assert pipe2.archive.seen_voxels() == n_seen


def test_pending_counters_fused_before_eviction():
    """Observations accumulated in the hit/miss counters but not yet
    drained by an update tick must survive eviction+restore (the
    reference's block map never drops pending scans)."""
    pipe = ScrollingFiestaPipeline(CFG, archive=True)
    hit = np.zeros(CFG.grid_shape, np.uint8)
    miss = np.zeros(CFG.grid_shape, np.uint8)
    hit[5, 20, 10] = 1
    miss[5, 20, 10] = 1          # vote: 2*hit >= miss -> occupied update
    pipe.state = dataclasses.replace(
        pipe.state,
        hit_cnt=jnp.asarray(hit),
        miss_cnt=jnp.asarray(miss),
    )
    _walk(pipe, 8.0)             # evicts the x<~20 strip mid-accumulation
    _walk(pipe, 0.05)            # come back
    gv = np.array([5, 20, 10]) - pipe.origin_vox
    assert (gv >= 0).all() and (gv < np.array(CFG.grid_shape)).all()
    assert float(pipe.state.logodds[tuple(gv)]) > 0.0
    assert bool(pipe.state.seen[tuple(gv)])


def test_cli_persist_appends_npz_suffix(tmp_path):
    """np.savez appends .npz on save; the reload check must look at the
    file actually written."""
    from fiesta_tpu.run import main

    path = str(tmp_path / "world")        # no suffix
    args = ["--preset", "small", "--frames", "6", "--platform", "cpu",
            "--scrolling", "--persist", path, "--seed", "2"]
    assert main(args) == 0
    assert (tmp_path / "world.npz").exists()
    assert main(args) == 0                # reloads world.npz, not "world"


def test_checkpoint_stores_scrolling_anchor(tmp_path):
    """Checkpoints of a scrolling grid carry the world anchor so a resumed
    window lands at the right world position (required for --persist)."""
    from fiesta_tpu import checkpoint

    pipe = ScrollingFiestaPipeline(CFG, archive=True)
    _plant_obstacle(pipe)
    _walk(pipe, 8.0)
    path = str(tmp_path / "map.npz")
    checkpoint.save(path, CFG, pipe.state, origin_vox=pipe.origin_vox)

    anchor = checkpoint.load_anchor(path)
    np.testing.assert_array_equal(anchor, pipe.origin_vox)
    # fixed-grid checkpoints have no anchor
    checkpoint.save(path, CFG, pipe.state)
    assert checkpoint.load_anchor(path) is None


def test_cli_resume_with_persist_restores_anchor(tmp_path):
    """run.py --resume + --persist: world-absolute tiles line up with the
    resumed window because the checkpoint stores origin_vox."""
    from fiesta_tpu.run import main

    arch = str(tmp_path / "arch.npz")
    ck = str(tmp_path / "map.npz")
    base = ["--preset", "small", "--frames", "6", "--platform", "cpu",
            "--scrolling", "--seed", "2"]
    assert main(base + ["--persist", arch, "--checkpoint", ck]) == 0
    assert main(base + ["--persist", arch, "--resume", ck]) == 0

    # an anchor-less (fixed-grid style) checkpoint is rejected with persist
    from fiesta_tpu import checkpoint

    cfg2, state = checkpoint.load(ck)
    checkpoint.save(ck, cfg2, state)       # strip the anchor
    with pytest.raises(SystemExit):
        main(base + ["--persist", arch, "--resume", ck])


def test_persistent_scrolling_matches_fixed_grid_bit_exact():
    """Equivalence oracle for the whole C3 stack: a persistent scrolling
    pipeline over a small moving window must produce BIT-IDENTICAL
    log-odds/seen (and equal truncated distances away from the window
    boundary) to a fixed pipeline whose grid covers the whole world,
    fed the same scans.

    Validity argument: rays reach max_ray + margin ~ 1.7 m and the
    recenter loop keeps the robot within 0.75 m of window center, so
    every observation lands >= 0.55 m inside the then-current 6 m window
    — observation sets per voxel are identical, evicted content round-
    trips through the archive, and fusion applies the same per-voxel
    updates in the same tick grouping (update after every frame)."""
    from fiesta_tpu.io import replay
    from fiesta_tpu.io.replay import scale_intrinsics
    from fiesta_tpu.pipeline import FiestaPipeline

    h, w = 120, 160
    world_cfg = scale_intrinsics(FiestaConfig(
        resolution=0.1,
        origin=(-8.0, -8.0, -1.0),
        map_size=(16.0, 16.0, 2.0),
        min_ray_length=0.3,
        max_ray_length=1.5,
        trunc_dist=1.5,
        edt_fine_dist=1.5,
        max_points_per_scan=h * w,
    ), height=h, width=w)
    small_cfg = dataclasses.replace(
        world_cfg, origin=(-3.0, -3.0, -1.0), map_size=(6.0, 6.0, 2.0))

    # full orbit (radius 4 m > window half 3 m) in 30 frames: leaves the
    # initial window, comes back — exercises evict, restore, hydave paths
    world, frames = replay.make_sequence(
        world_cfg, n_frames=33, n_boxes=12, seed=5,
        height=h, width=w, period=1.0, orbit_radius=4.0, orbit_z=0.0,
    )

    big = FiestaPipeline(world_cfg, method="scanline")
    small = ScrollingFiestaPipeline(small_cfg, archive=True)
    for i, (t, (pos, quat), scan) in enumerate(frames):
        for pipe in (big, small):
            pipe.observe_pose(t, pos, quat)
            pipe.observe_cloud(t, scan)
            if i + 1 < len(frames):
                pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
            pipe.process()
            pipe.update()

    assert small.scroll_count > 0 and small.restore_count > 0, \
        "trajectory must actually evict and restore"

    # map the final window into the big grid
    off = np.round((small.world_origin - np.asarray(world_cfg.origin))
                   / world_cfg.resolution).astype(int)
    sx, sy, sz = small_cfg.grid_shape
    sl = (slice(off[0], off[0] + sx), slice(off[1], off[1] + sy),
          slice(off[2], off[2] + sz))

    np.testing.assert_array_equal(np.asarray(small.state.seen),
                                  np.asarray(big.state.seen[sl]))
    np.testing.assert_array_equal(np.asarray(small.state.logodds),
                                  np.asarray(big.state.logodds[sl]))

    # distances: exact equality away from the window boundary (obstacles
    # outside the window can only influence voxels within trunc_dist of a
    # face; z faces coincide with the world bounds)
    shrink = int(world_cfg.trunc_dist / world_cfg.resolution) + 2
    inner = (slice(shrink, sx - shrink), slice(shrink, sy - shrink),
             slice(None))
    d2_small = np.asarray(small.state.d2)[inner]
    d2_big = np.asarray(big.state.d2[sl])[inner]
    np.testing.assert_array_equal(d2_small, d2_big)
    assert (np.asarray(small.state.seen)[inner]).sum() > 500, \
        "interior must contain real observations for the d2 check to bite"


def test_cli_persist_requires_scrolling():
    from fiesta_tpu.run import main

    with pytest.raises(SystemExit):
        main(["--preset", "small", "--frames", "2", "--platform", "cpu",
              "--persist"])
