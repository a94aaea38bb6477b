"""Scrolling-grid (unbounded world) tests — reference C3 equivalent."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from fiesta_tpu import FiestaConfig, INF_D2, make_state
from fiesta_tpu.grid import UNDEFINED_COORD, coord_grids
from fiesta_tpu.io import replay
from fiesta_tpu.io.replay import scale_intrinsics
from fiesta_tpu.ops import esdf
from fiesta_tpu.scrolling import ScrollingFiestaPipeline, scroll_state

CFG = scale_intrinsics(
    FiestaConfig(
        resolution=0.1,
        origin=(-2.0, -2.0, -0.5),
        map_size=(4.0, 4.0, 2.0),
        min_ray_length=0.3,
        max_ray_length=4.0,
        max_points_per_scan=120 * 160,
    ),
    height=120, width=160,
)


def test_scroll_state_moves_content():
    state = make_state(CFG)
    occ = np.zeros(CFG.grid_shape, bool)
    occ[20, 20, 10] = True
    d2, closest, _ = esdf.update_esdf(
        state.d2, state.closest, jnp.asarray(occ), jnp.asarray(occ),
        jnp.zeros(CFG.grid_shape, bool), None, CFG.stencil,
    )
    state = dataclasses.replace(
        state, d2=d2, closest=closest,
        logodds=jnp.where(jnp.asarray(occ), 5.0, 0.0),
        seen=jnp.ones(CFG.grid_shape, bool),
    )

    shifted = scroll_state(state, jnp.array([5, -3, 0], jnp.int32))
    # obstacle moved from (20,20,10) to (15,23,10)
    assert float(shifted.logodds[15, 23, 10]) == 5.0
    assert int(shifted.d2[15, 23, 10]) == 0
    from fiesta_tpu.grid import unpack_closest

    cl = (unpack_closest(shifted.closest) if shifted.closest.ndim == 3
          else shifted.closest)
    np.testing.assert_array_equal(
        np.asarray(cl[:, 15, 23, 10]), [15, 23, 10]
    )
    # distances stay consistent around the moved obstacle
    assert int(shifted.d2[17, 23, 10]) == 4
    # entered region is unknown
    assert not bool(shifted.seen[-1, 0, 0])
    assert int(shifted.d2[-1, 0, 0]) == int(INF_D2)


def test_scroll_evicts_out_of_grid_closest():
    state = make_state(CFG)
    occ = np.zeros(CFG.grid_shape, bool)
    occ[2, 20, 10] = True    # near the -x face
    d2, closest, _ = esdf.update_esdf(
        state.d2, state.closest, jnp.asarray(occ), jnp.asarray(occ),
        jnp.zeros(CFG.grid_shape, bool), None, CFG.stencil,
    )
    state = dataclasses.replace(state, d2=d2, closest=closest)
    # shift so the obstacle leaves the grid
    shifted = scroll_state(state, jnp.array([10, 0, 0], jnp.int32))
    # voxels that referenced it reset to unknown distance
    assert int(shifted.d2[0, 20, 10]) == int(INF_D2)
    from fiesta_tpu.grid import unpack_closest

    cl = (unpack_closest(shifted.closest) if shifted.closest.ndim == 3
          else shifted.closest)
    assert int(cl[0, 0, 20, 10]) == int(UNDEFINED_COORD)


def test_scrolling_pipeline_follows_robot():
    """Robot orbits far beyond the (small) grid; the map follows and the
    local region around the robot stays accurate."""
    cfg = CFG
    # big virtual world: generate a sequence in a larger config, then feed
    # it to a scrolling pipeline whose grid is smaller than the world
    world_cfg = dataclasses.replace(
        cfg, origin=(-8.0, -8.0, -0.5), map_size=(16.0, 16.0, 2.0)
    )
    world, frames = replay.make_sequence(
        world_cfg, n_frames=12, n_boxes=10, seed=4,
        height=120, width=160, orbit_radius=5.0, period=4.0,
    )

    pipe = ScrollingFiestaPipeline(cfg, recenter_fraction=0.2)
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

    assert pipe.scroll_count > 0, "robot left the initial grid; must scroll"
    # the grid center tracked the robot
    final_pos = frames[-1][1][0]
    center = pipe.world_origin + np.asarray(cfg.map_size) / 2
    assert np.linalg.norm((final_pos - center)[:2]) < 2.5

    # mapped occupied voxels agree with the true world geometry
    pts = pipe.occupied_world_points()
    if len(pts):
        from scipy import ndimage

        occ_true = world.occupied_voxels(world_cfg)
        true_dist = ndimage.distance_transform_edt(~occ_true)
        vox = np.floor(
            (pts - np.asarray(world_cfg.origin)) / world_cfg.resolution
        ).astype(int)
        inside = np.all((vox >= 0) & (vox < occ_true.shape), axis=1)
        errs = true_dist[tuple(vox[inside].T)]
        assert (errs <= 2.0).mean() > 0.9


def test_scroll_rebases_depth_filter_transform():
    """The depth consistency filter's previous-frame transform must move
    into the new virtual frame on recenter, or the next frame's
    reprojection test (Fiesta.h:356-377) is off by shift*resolution and
    rejects nearly everything."""
    pipe = ScrollingFiestaPipeline(CFG)
    t = np.eye(4)
    t[:3, 3] = [1.0, 2.0, 0.5]
    pipe.last_transform = t
    pipe._apply_scroll(np.array([10, 0, -5], np.int64))
    np.testing.assert_allclose(pipe.last_transform[:3, 3],
                               [0.0, 2.0, 1.0])   # -shift * 0.1 m


def test_scrolling_depth_mode_survives_recenter():
    """Depth-image input keeps observing across a recenter (the filter
    chain crosses the frame change)."""
    world_cfg = dataclasses.replace(
        CFG, origin=(-8.0, -8.0, -0.5), map_size=(16.0, 16.0, 2.0))
    world, frames = replay.make_sequence(
        world_cfg, n_frames=12, n_boxes=10, seed=4, kind="depth",
        height=120, width=160, orbit_radius=5.0, period=4.0,
    )
    pipe = ScrollingFiestaPipeline(CFG, recenter_fraction=0.2)
    observed_after_scroll = None
    scrolls_seen = 0
    for i, (t, (pos, quat), depth) in enumerate(frames):
        pipe.observe_pose(t, pos, quat)
        pipe.observe_depth(t, depth)
        if i + 1 < len(frames):
            pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
        else:
            pipe.observe_pose(t + 1.0, pos, quat)
        before = pipe.scroll_count
        pipe.process()
        stats = pipe.update()
        if pipe.scroll_count > before and stats is not None:
            # the frame converted right after the recenter (same process
            # call): its consistency filter reprojects into the PREVIOUS
            # frame's transform, which must have been rebased
            scrolls_seen += 1
            observed_after_scroll = int(stats.num_observed)
            break
    assert scrolls_seen > 0, "trajectory must trigger a recenter"
    assert observed_after_scroll is not None
    assert observed_after_scroll > 1000, (
        f"depth frame after recenter observed only {observed_after_scroll} "
        "voxels — consistency filter misaligned across the scroll")


def test_cli_scrolling_flag(tmp_path):
    """run.py --scrolling drives the ScrollingFiestaPipeline end-to-end."""
    from fiesta_tpu.run import main

    assert main(["--preset", "small", "--frames", "6", "--platform", "cpu",
                 "--scrolling", "--seed", "2"]) == 0


def test_scrolling_closest_query_world_frame():
    """query_closest_obstacle on a scrolled pipeline takes and returns
    WORLD-frame coordinates (regression: it used to read the virtual
    frame, off by origin_vox * resolution after a recenter)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, trunc_dist=1.5, edt_fine_dist=1.5,
                              esdf_mode="rebuild")
    world, frames = replay.make_sequence(
        cfg, n_frames=6, n_boxes=6, seed=3, height=120, width=160,
        orbit_radius=0.8, period=4.0)
    pipe = ScrollingFiestaPipeline(cfg, method="scanline")
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
    # force a recenter so world != virtual frame
    pipe._apply_scroll(np.array([7, -4, 0], np.int64))
    pipe._rederive_distances()
    assert np.any(pipe.origin_vox != 0)

    # query from world positions of mapped voxels: answers must agree
    # with the world-frame distance query, and returned points must be
    # occupied in WORLD coordinates
    occ_pts = pipe.occupied_world_points()
    assert occ_pts.shape[0] > 0
    q = occ_pts[:5] + np.asarray([0.15, 0.0, 0.0])
    pts, dist = pipe.query_closest_obstacle(q)
    pts, dist = np.asarray(pts), np.asarray(dist)
    dd = np.asarray(pipe.query_distance(q))
    for i in range(len(q)):
        if dist[i] < cfg.infinity_distance:
            assert abs(dist[i] - dd[i]) < 1e-5
            # the returned point is a world position of an occupied voxel
            d_to_occ = np.linalg.norm(occ_pts - pts[i], axis=1).min()
            assert d_to_occ < cfg.resolution * 0.51, d_to_occ
