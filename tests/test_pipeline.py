"""End-to-end pipeline tests: synthetic replay -> ESDF accuracy.

Replicates the reference's integration test protocol (SURVEY.md section 4):
replay a sensor sequence, then check the resulting ESDF against exact
nearest-neighbor distances over the *mapped* occupied voxels (the role of
CheckWithGroundTruth, ESDFMap.cpp:905-1054).
"""

import numpy as np
import pytest

from fiesta_tpu import FiestaConfig
from fiesta_tpu.io import replay
from fiesta_tpu.pipeline import FiestaPipeline

from fiesta_tpu.io.replay import scale_intrinsics

SMALL = scale_intrinsics(
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


def _run_replay(method, kind="cloud", n_frames=10, cfg=SMALL):
    """Stream frames at 30 Hz with the 10 Hz ESDF tick interleaved
    (UpdateEsdfEvent cadence, launch/*.launch:6)."""
    world, frames = replay.make_sequence(
        cfg, n_frames=n_frames, n_boxes=6, seed=3, kind=kind
    )
    pipe = FiestaPipeline(cfg, method=method)
    n = 0
    total_inserted = 0
    for i, (t, (pos, quat), scan) in enumerate(frames):
        pipe.observe_pose(t, pos, quat)
        if kind == "cloud":
            pipe.observe_cloud(t, scan)
        else:
            pipe.observe_depth(t, scan)
        n += pipe.process()
        if i % 3 == 2:
            stats = pipe.update()
            if stats is not None:
                total_inserted += int(stats.num_inserted)
    # final pose so the synchronizer can finalize the last frame
    pipe.observe_pose(frames[-1][0] + 1.0, *frames[-1][1])
    n += pipe.process()
    stats = pipe.update()
    if stats is not None:
        total_inserted += int(stats.num_inserted)
    assert n >= n_frames - 1
    assert total_inserted > 0
    return world, pipe


@pytest.mark.parametrize("method", ["projective", "scanline", "dda"])
def test_replay_builds_accurate_esdf(method):
    world, pipe = _run_replay(method)
    cfg = pipe.cfg

    occ_map = np.asarray(pipe.occupied())
    occ_true = world.occupied_voxels(cfg)

    # Mapped obstacles must be real surfaces (no hallucinated obstacles far
    # from true geometry): every occupied map voxel within 1 voxel of truth.
    from scipy import ndimage

    true_dist = ndimage.distance_transform_edt(~occ_true)
    assert occ_map.sum() > 50, "map should contain observed surfaces"
    frac_bad = (true_dist[occ_map] > 2.0).mean()
    assert frac_bad < 0.05, f"{frac_bad:.1%} of mapped voxels far from truth"

    # ESDF distances agree with exact NN over mapped obstacles
    # (CheckWithGroundTruth semantics: positive small overestimates).
    d_map = np.asarray(pipe.distance_grid())
    known = d_map < cfg.infinity_distance
    assert known.any()
    if occ_map.any():
        map_dist = ndimage.distance_transform_edt(~occ_map) * cfg.resolution
        err = d_map - map_dist
        # exact (fine) region: never underestimates, tiny error
        near = known & (map_dist <= cfg.edt_fine_dist - 2 * cfg.resolution)
        assert err[near].min() > -1e-4, "near-field ESDF must never underestimate"
        assert np.abs(err[near]).max() < 0.35
        assert (np.abs(err[near]) > 1e-3).mean() < 0.05
        # far (coarse) band: within one coarse voxel diagonal of truth
        far = known & ~near
        if far.any():
            bound = 2 * cfg.resolution * np.sqrt(3) + 1e-6
            assert np.abs(err[far]).max() <= bound, np.abs(err[far]).max()


def test_replay_depth_image_mode():
    world, pipe = _run_replay("projective", kind="depth", n_frames=6)
    assert int(np.asarray(pipe.occupied()).sum()) > 0


def test_query_api():
    _, pipe = _run_replay("projective", n_frames=6)
    pts = np.array([[0.0, 0.0, 0.5], [99.0, 0.0, 0.0]])
    d = np.asarray(pipe.query_distance(pts))
    assert d[1] == -10000.0  # out of map (reference undefined_)
    dg, grad = pipe.query_dist_grad(pts)
    dg, grad = np.asarray(dg), np.asarray(grad)
    assert dg[1] == -1.0 and np.all(grad[1] == 0)
    assert np.isfinite(dg[0])
    # gradient magnitude of a distance field is <= ~1 where known
    if dg[0] < pipe.cfg.infinity_distance / 2:
        assert np.linalg.norm(grad[0]) < 3.0


def test_synchronizer_semantics():
    from fiesta_tpu.pipeline import ScanSynchronizer

    s = ScanSynchronizer(time_delay=3e-3)
    s.push_depth(1.0, "d1")
    # no pose newer than cutoff yet -> wait
    s.push_pose(0.99, [0, 0, 0], [1, 0, 0, 0])
    assert s.drain() == []
    # newer pose arrives -> frame matched to latest pose <= 1.003
    s.push_pose(1.002, [1, 1, 1], [1, 0, 0, 0])
    s.push_pose(1.5, [2, 2, 2], [1, 0, 0, 0])
    out = s.drain()
    assert len(out) == 1
    payload, t, pos, _ = out[0]
    assert payload == "d1" and t == 1.002 and pos[0] == 1

    # frame with no pose <= cutoff is dropped
    s.push_depth(0.5, "d0")
    assert s.drain() == []  # poses at 1.5 remain but none <= 0.503
    s.push_depth(1.4, "d2")
    s.push_pose(2.0, [3, 3, 3], [1, 0, 0, 0])
    out = s.drain()
    # d0 dropped (no pose), d2 matched? no pose <= 1.403 remains (1.002 was
    # consumed) except... 1.5 > 1.403 -> d2 dropped too
    assert out == []


def test_local_window_update_mode():
    cfg = scale_intrinsics(
        FiestaConfig(
            resolution=0.1,
            origin=(-3.0, -3.0, -0.5),
            map_size=(6.0, 6.0, 2.0),
            min_ray_length=0.3,
            max_ray_length=6.0,
            max_points_per_scan=120 * 160,
            global_update=False,
            global_vis=False,
            radius=(2.0, 2.0, 1.0),
        ),
        height=120, width=160,
    )
    world, pipe = _run_replay("projective", n_frames=6, cfg=cfg)
    # updates happened and distances exist near the robot
    d = np.asarray(pipe.distance_grid())
    assert (d < cfg.infinity_distance).any()


def test_fused_stream_matches_sequential_ticks():
    """The on-device scan executor evolves state bit-identically to N
    separate fused_batch_step dispatches."""
    from fiesta_tpu.pipeline import fused_batch_step, fused_stream

    cfg = SMALL
    world, frames = replay.make_sequence(
        cfg, n_frames=9, n_boxes=6, seed=3, kind="cloud"
    )
    pipe = FiestaPipeline(cfg, method="scanline")
    apts, avals, atfs, apos = replay.stage_update_batches(pipe, frames)

    seq_state = pipe.state
    seq_stats = []
    for i in range(apts.shape[0]):
        seq_state, st = fused_batch_step(
            cfg, seq_state, apts[i], avals[i], atfs[i], apos[i],
            method="scanline"
        )
        seq_stats.append(st)

    from fiesta_tpu.grid import make_state
    stream_state, stream_stats = fused_stream(
        cfg, make_state(cfg), apts, avals, atfs, apos,
        method="scanline",
    )

    np.testing.assert_array_equal(np.asarray(seq_state.logodds),
                                  np.asarray(stream_state.logodds))
    np.testing.assert_array_equal(np.asarray(seq_state.d2),
                                  np.asarray(stream_state.d2))
    np.testing.assert_array_equal(np.asarray(seq_state.seen),
                                  np.asarray(stream_state.seen))
    for i, st in enumerate(seq_stats):
        assert int(st.num_inserted) == int(stream_stats.num_inserted[i])
        assert int(st.num_observed) == int(stream_stats.num_observed[i])


def test_fused_depth_tick_and_stream():
    """Depth-mode fused tick == manual depth_to_cloud + cloud tick; the
    depth stream chains the consistency filter across tick boundaries."""
    import jax.numpy as jnp

    from fiesta_tpu.grid import make_state
    from fiesta_tpu.ops.depth import depth_to_cloud, pose_to_matrix
    from fiesta_tpu.pipeline import (
        fused_batch_step, fused_depth_batch_step, fused_depth_stream)

    cfg = SMALL
    world, frames = replay.make_sequence(
        cfg, n_frames=6, n_boxes=6, seed=3, kind="depth"
    )
    depths = jnp.asarray(
        np.stack([f[2] for f in frames]), jnp.float32).reshape(2, 3, *frames[0][2].shape)
    tfs = jnp.asarray(
        np.stack([pose_to_matrix(*f[1]) for f in frames]),
        jnp.float32).reshape(2, 3, 4, 4)
    poss = jnp.asarray(
        np.stack([frames[2][1][0], frames[5][1][0]]), jnp.float32)

    # manual composition for tick 0 (filter chain seeded with frame 0)
    ld, lt = depths[0, 0], tfs[0, 0]
    pts, vals = [], []
    for i in range(3):
        p, v = depth_to_cloud(cfg, depths[0, i], tfs[0, i], lt, ld,
                              use_filter=True)
        pts.append(p)
        vals.append(v)
        ld, lt = depths[0, i], tfs[0, i]
    ref_state, ref_stats = fused_batch_step(
        cfg, make_state(cfg), jnp.stack(pts), jnp.stack(vals), tfs[0],
        poss[0], method="scanline")

    got_state, got_stats = fused_depth_batch_step(
        cfg, make_state(cfg), depths[0], tfs[0], depths[0, 0], tfs[0, 0],
        poss[0])
    np.testing.assert_array_equal(np.asarray(ref_state.logodds),
                                  np.asarray(got_state.logodds))
    np.testing.assert_array_equal(np.asarray(ref_state.d2),
                                  np.asarray(got_state.d2))
    assert int(ref_stats.num_observed) == int(got_stats.num_observed)

    # stream == sequential depth ticks with chained prev frame
    st_seq = got_state
    st_seq, stats1 = fused_depth_batch_step(
        cfg, st_seq, depths[1], tfs[1], depths[0, -1], tfs[0, -1], poss[1])

    st_stream, stream_stats = fused_depth_stream(
        cfg, make_state(cfg), depths, tfs, poss)
    np.testing.assert_array_equal(np.asarray(st_seq.logodds),
                                  np.asarray(st_stream.logodds))
    np.testing.assert_array_equal(np.asarray(st_seq.d2),
                                  np.asarray(st_stream.d2))
    assert int(stream_stats.num_observed[1]) == int(stats1.num_observed)
    assert int(np.asarray(st_stream.seen).sum()) > 0


@pytest.mark.parametrize("closest_mode", ["lazy", "eager"])
def test_rebuild_mode_maintains_closest(closest_mode):
    """The production rebuild engine serves closest-obstacle coords
    (reference closest_obstacle_, ESDFMap.h:92-96) and the C20 structural
    invariants hold — closest names an occupied voxel at exactly
    sqrt(d2).  Both cadences: eager (per-tick maintenance) and lazy (the
    production default — derived at the query surface, closest_grid)."""
    import dataclasses

    from fiesta_tpu import debug
    from fiesta_tpu.pipeline import rebuild_tracks_closest

    cfg = dataclasses.replace(SMALL, esdf_mode="rebuild", trunc_dist=2.0,
                              edt_fine_dist=2.0, closest_mode=closest_mode)
    assert rebuild_tracks_closest(cfg)
    _, pipe = _run_replay("scanline", cfg=cfg)
    from fiesta_tpu.grid import closest_packed_state, unpack_closest

    assert closest_packed_state(cfg)   # production state format is packed
    if closest_mode == "lazy":
        # the tick leaves state.closest untouched; the query surface derives
        assert not (np.asarray(pipe.state.closest) >= 0).any()
    grid = pipe.closest_grid()
    assert grid.ndim == 3
    closest = np.asarray(unpack_closest(grid))
    d2 = np.asarray(pipe.state.d2)
    assert (closest[0] >= 0).any(), "no closest recorded after replay"
    assert debug.check_consistency(cfg, pipe.state, closest=grid)

    # closest-point query API: query from voxel centers that are mapped
    # (seen, defined closest) so the answers must be defined
    from fiesta_tpu.grid import vox_to_pos

    seen = np.asarray(pipe.state.seen)
    cand = seen & (closest[0] >= 0)
    assert cand.any()
    vs = np.argwhere(cand)[[0, -1]]
    q = np.asarray(vox_to_pos(cfg, vs), np.float32)
    pts, dist = pipe.query_closest_obstacle(q)
    pts, dist = np.asarray(pts), np.asarray(dist)
    assert pts.shape == (2, 3) and dist.shape == (2,)
    # where defined, the returned point must be an occupied voxel center
    from fiesta_tpu.grid import pos_to_vox, occupied_grid

    occ = np.asarray(occupied_grid(cfg, pipe.state.logodds))
    any_defined = False
    for i in range(2):
        if dist[i] < cfg.infinity_distance:
            any_defined = True
            v = np.asarray(pos_to_vox(cfg, pts[i]))
            assert occ[v[0], v[1], v[2]]
            # returned distance equals |query voxel center - obstacle|
            # quantized to the grid: consistent with query_distance
            qd = float(np.asarray(pipe.query_distance(q[i:i + 1]))[0])
            assert abs(dist[i] - qd) < 1e-5
    assert any_defined, "no defined closest-obstacle query in a mapped scene"


def test_rebuild_closest_off_flag():
    """track_closest=False restores the round-1 behavior (closest stale)."""
    import dataclasses

    from fiesta_tpu.pipeline import rebuild_tracks_closest

    cfg = dataclasses.replace(SMALL, track_closest=False)
    assert not rebuild_tracks_closest(cfg)


def test_lazy_closest_bitwise_matches_eager():
    """The lazy derive (closest_grid after a tick) is BITWISE the grid
    the eager tick writes — same packed-argmin passes over the same
    occupancy (pipeline.derive_closest), so the query surface cannot
    tell the cadences apart."""
    import dataclasses

    base = dataclasses.replace(SMALL, trunc_dist=2.0, edt_fine_dist=2.0)
    _, lazy = _run_replay(
        "scanline", cfg=dataclasses.replace(base, closest_mode="lazy"))
    _, eager = _run_replay(
        "scanline", cfg=dataclasses.replace(base, closest_mode="eager"))
    np.testing.assert_array_equal(np.asarray(lazy.closest_grid()),
                                  np.asarray(eager.state.closest))
    # and the cache is a cache: same array object until the next tick
    assert lazy.closest_grid() is lazy.closest_grid()


def test_lazy_closest_invalidated_by_tick():
    """query -> tick -> query returns FRESH coords: the d2-identity cache
    must not serve a pre-tick closest grid after the map changes."""
    import dataclasses

    import jax.numpy as jnp

    from fiesta_tpu.grid import make_state
    from fiesta_tpu.pipeline import fused_batch_step

    cfg = dataclasses.replace(SMALL, trunc_dist=2.0, edt_fine_dist=2.0,
                              max_points_per_scan=256)
    assert cfg.lazy_closest   # lazy is the production default
    pipe = FiestaPipeline(cfg, method="scanline")

    def tick(center):
        pts = np.full((1, 256, 3), np.nan, np.float32)
        pts[0, :8] = center + np.linspace(0, 0.04, 24).reshape(8, 3)
        tfs = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
        pipe.state, _ = fused_batch_step(
            cfg, pipe.state, jnp.asarray(pts),
            jnp.asarray(np.isfinite(pts).all(-1)), jnp.asarray(tfs),
            jnp.zeros(3, jnp.float32), method="scanline")

    for _ in range(2):      # two hits cross the log-odds occ threshold
        tick(np.array([1.0, 1.0, 0.5], np.float32))
    g1 = np.asarray(pipe.closest_grid())
    assert (g1 >= 0).any()
    for _ in range(2):
        tick(np.array([-1.5, -1.5, 0.2], np.float32))  # new cluster
    g2 = np.asarray(pipe.closest_grid())
    assert not np.array_equal(g1, g2), "post-tick query served stale closest"
    # the fresh grid covers the new cluster: some voxel's closest now
    # decodes to coords inside the second cluster's region
    from fiesta_tpu.grid import pos_to_vox

    v2 = np.asarray(pos_to_vox(cfg, np.array([-1.5, -1.5, 0.2],
                                             np.float32)))
    packed = g2[g2 >= 0]
    coords = np.stack([packed >> 20, (packed >> 10) & 1023, packed & 1023],
                      axis=-1)
    assert (np.abs(coords - v2).max(axis=-1) <= 2).any()


def test_check_consistency_hierarchical_mode():
    """check_consistency accepts a healthy hierarchical-mode map (the far
    field's closest coords are coarse-quantized by design) and still
    enforces the exact invariants on the fine field."""
    import dataclasses

    from fiesta_tpu import debug

    cfg = dataclasses.replace(SMALL, esdf_mode="rebuild", trunc_dist=2.0,
                              edt_fine_dist=1.0)
    _, pipe = _run_replay("scanline", cfg=cfg)
    d2 = np.asarray(pipe.state.d2)
    from fiesta_tpu.ops.pallas.edt import trunc_vox_for
    tf = trunc_vox_for(cfg.resolution, cfg.edt_fine_dist)
    assert (d2[(d2 < 1 << 29)] > tf * tf).any(), "no far field exercised"
    assert debug.check_consistency(cfg, pipe.state)
