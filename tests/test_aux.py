"""Auxiliary subsystems: checkpoint, debug validators, signed distance,
visualization, timing registry, CLI runner."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from fiesta_tpu import FiestaConfig, make_state
from fiesta_tpu import checkpoint, debug, viz
from fiesta_tpu.ops import esdf
from fiesta_tpu.ops.query import distance_grid, signed_distance_grid
from fiesta_tpu.grid import INF_D2, UNDEFINED_COORD, occupied_grid
from fiesta_tpu.timing import Timer, Timing

CFG = FiestaConfig(
    resolution=0.1,
    origin=(-1.0, -1.0, -0.5),
    map_size=(2.0, 2.0, 1.0),
)


def _built_state():
    state = make_state(CFG)
    occ = np.zeros(CFG.grid_shape, bool)
    occ[8:12, 8:12, 4:6] = True
    d2, closest, _ = esdf.update_esdf(
        state.d2, state.closest, jnp.asarray(occ), jnp.asarray(occ),
        jnp.zeros(CFG.grid_shape, bool), None, CFG.stencil,
    )
    lo = jnp.where(jnp.asarray(occ), 5.0, -5.0)
    import dataclasses

    return dataclasses.replace(
        state, d2=d2, closest=closest, logodds=lo,
        seen=jnp.ones(CFG.grid_shape, bool),
    )


def test_checkpoint_roundtrip(tmp_path):
    state = _built_state()
    path = str(tmp_path / "map.npz")
    checkpoint.save(path, CFG, state)
    cfg2, state2 = checkpoint.load(path)
    assert cfg2 == CFG
    np.testing.assert_array_equal(np.asarray(state.d2), np.asarray(state2.d2))
    np.testing.assert_array_equal(
        np.asarray(state.logodds), np.asarray(state2.logodds)
    )


def test_check_consistency_passes_and_detects():
    # this state carries a CALLER-built closest: pass it explicitly so
    # the full invariants run (the lazy default treats an unpassed
    # closest as intentionally stale — pipelines pass closest_grid())
    state = _built_state()
    assert debug.check_consistency(CFG, state, closest=state.closest)

    import dataclasses

    bad = dataclasses.replace(
        state, d2=state.d2.at[0, 0, 0].set(17)
    )
    try:
        debug.check_consistency(CFG, bad, closest=bad.closest)
        raise RuntimeError("should have failed")
    except AssertionError:
        pass


def test_ground_truth_report():
    state = _built_state()
    rep = debug.check_with_ground_truth(CFG, state)
    assert rep["num_known"] > 0
    assert rep["count_under"] == 0          # never underestimates
    assert rep["max_under"] == 0.0
    assert rep["max_abs_error"] < 0.2       # near-optimal 24-stencil
    assert rep["max_over"] <= rep["max_abs_error"]
    assert sum(rep["histogram"]) == rep["count_over"]


def test_signed_distance():
    state = _built_state()
    occ = occupied_grid(CFG, state.logodds)
    sd = np.asarray(
        signed_distance_grid(CFG, state.d2, state.seen, occ)
    )
    assert sd[9, 9, 4] < 0          # inside the box
    assert sd[0, 0, 0] > 0          # far outside
    # sign flips across the surface
    assert sd[7, 9, 4] > 0 and sd[8, 9, 4] <= 0


def test_viz_outputs():
    state = _built_state()
    pc = viz.occupied_pointcloud(CFG, state)
    assert pc.shape[1] == 3 and len(pc) == 4 * 4 * 2

    pos, colors = viz.slice_marker(CFG, state, slice_z=0.95)
    assert len(pos) == len(colors) and len(pos) > 0
    assert colors.min() >= 0 and colors.max() <= 1

    img = viz.slice_image(CFG, state, slice_z=0.95)
    assert img.shape == (20, 20, 3)


def test_rainbow_matches_reference_formula():
    # spot values of the HSV blend (ESDFMap.cpp:584-637)
    # h=0: sextant 0, f flips to 1 => n=0 => pure red
    c = viz.rainbow_color_map(np.array([0.0]))[0]
    np.testing.assert_allclose(c, [1, 0, 0], atol=1e-9)
    # h=0.5: sextant 3 => blue channel = v = 1
    c = viz.rainbow_color_map(np.array([0.5]))[0]
    assert c[2] == 1.0
    # h=1/6: sextant 1 => green = v = 1, f flips to 0 => r = n = 1
    c = viz.rainbow_color_map(np.array([1.0 / 6.0]))[0]
    assert c[1] == 1.0


def test_timing_registry():
    Timing.reset()
    with Timer("unit_test_tag"):
        pass
    with Timer("unit_test_tag"):
        pass
    assert Timing.get_num_samples("unit_test_tag") == 2
    table = Timing.print_table()
    assert "unit_test_tag" in table
    Timing.reset()


def test_cli_runner(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "fiesta_tpu.run", "--preset", "small",
         "--platform", "cpu",
         "--frames", "6", "--checkpoint", str(tmp_path / "m.npz"),
         "--viz-dir", str(tmp_path / "viz")],
        # generous timeout: the TPU plugin's init can stall for minutes when
        # another process holds the device tunnel, even on --platform cpu
        capture_output=True, text=True, env=env, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "processed 6 frames" in out.stderr
    assert (tmp_path / "m.npz").exists()
    assert (tmp_path / "viz" / "slice.npz").exists()


def test_cli_profile_and_periodic_checkpoint(tmp_path):
    """--profile-dir writes a trace; --checkpoint-every writes mid-run."""
    from fiesta_tpu.run import main

    ck = str(tmp_path / "map.npz")
    prof = str(tmp_path / "trace")
    rc = main(["--preset", "small", "--frames", "9", "--platform", "cpu",
               "--checkpoint", ck, "--checkpoint-every", "1",
               "--profile-dir", prof])
    assert rc == 0
    import os

    assert os.path.exists(ck)
    # jax writes plugins/… trace files under the directory
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert found, "no profiler trace files written"


def test_cli_config_overrides(tmp_path):
    """--config / --set merge FiestaConfig fields over the preset (the
    launch-file tier of the reference's config system, parameters.cpp)."""
    import json

    from fiesta_tpu.run import main

    params = tmp_path / "params.json"
    params.write_text(json.dumps({"p_occ": 0.7, "max_ray_length": 2.0}))
    assert main(["--preset", "small", "--frames", "4", "--platform", "cpu",
                 "--config", str(params),
                 "--set", "p_hit=0.8", "--set", "origin=-2,-2,-0.5",
                 "--set", "map_size=4,4,1", "--seed", "1"]) == 0

    import pytest

    with pytest.raises(SystemExit, match="unknown config field"):
        main(["--preset", "small", "--frames", "2", "--platform", "cpu",
              "--set", "nope=1"])
    with pytest.raises(SystemExit, match="expects 3 values"):
        main(["--preset", "small", "--frames", "2", "--platform", "cpu",
              "--set", "origin=-2,-2"])


def test_signed_distance_deep_interior_clamps_at_truncation():
    """Obstacle interiors thicker than the truncation must read the clamp
    value, never the EDT infinity sentinel (~-1158 m)."""
    import dataclasses

    import jax.numpy as jnp

    from fiesta_tpu.ops.query import signed_distance_grid

    cfg = dataclasses.replace(CFG, trunc_dist=0.2)
    shape = cfg.grid_shape
    occ = np.zeros(shape, bool)
    occ[2:-2, 2:-2, 2:-2] = True        # solid block, interior >> 0.2 m
    d2 = jnp.where(jnp.asarray(occ), 0, 10 ** 6)
    import pytest

    sdf = np.asarray(signed_distance_grid(
        cfg, d2, jnp.ones(shape, bool), jnp.asarray(occ)))
    assert sdf.min() >= -cfg.trunc_dist - 1e-5
    # surface voxels stay near zero, interior saturates at the clamp
    assert sdf[shape[0] // 2, shape[1] // 2, shape[2] // 2] == \
        pytest.approx(-cfg.trunc_dist)
    assert sdf[2, shape[1] // 2, shape[2] // 2] > -2 * cfg.resolution - 1e-6


def test_set_occupancy_direct_respects_probabilistic_threshold():
    """Direct writes must cross the active occupancy predicate: under the
    probabilistic config the threshold is logit(p_occ) ~ 1.386, which a
    raw 1.0 write would NOT cross (inverting the flip masks)."""
    import jax.numpy as jnp

    from fiesta_tpu.grid import occupied_grid
    from fiesta_tpu.ops.fusion import set_occupancy_direct

    assert CFG.probabilistic
    shape = CFG.grid_shape
    lo = jnp.zeros(shape, jnp.float32)
    vox = jnp.asarray([[3, 4, 5], [6, 7, 8]], jnp.int32)

    new_lo, ins, dele = set_occupancy_direct(
        CFG, lo, vox, jnp.asarray([1, 1]))
    occ = np.asarray(occupied_grid(CFG, new_lo))
    assert occ[3, 4, 5] and occ[6, 7, 8]
    assert np.asarray(ins)[3, 4, 5] and np.asarray(ins)[6, 7, 8]
    assert not np.asarray(dele).any()

    # clearing one flips it into the delete mask, not the insert mask
    new_lo2, ins2, dele2 = set_occupancy_direct(
        CFG, new_lo, vox[:1], jnp.asarray([0]))
    occ2 = np.asarray(occupied_grid(CFG, new_lo2))
    assert not occ2[3, 4, 5] and occ2[6, 7, 8]
    assert np.asarray(dele2)[3, 4, 5] and not np.asarray(ins2).any()


def test_performance_text_marker():
    """The reference's floating perf marker text (Fiesta.h:524-529): same
    composition, fed from the timing registry."""
    from fiesta_tpu import viz
    from fiesta_tpu.timing import Timer, Timing

    Timing.reset()
    with Timer("UpdateESDF"):
        pass
    txt = viz.performance_text(last_update_ms=12.5)
    assert txt.startswith("Fiesta\nCurrent update Time\n12.500 ms")
    assert "Average update Time" in txt


def test_checkpoint_loads_pre_round4_state_formats(tmp_path):
    """Checkpoints written before the round-4 state-format changes (bool
    seen, [3,X,Y,Z] i16 closest planes) must load and drive the current
    pipeline: seen is cast to u8 on load; a plane-format closest flows
    through the ndim-dispatching consumers and is replaced by the packed
    format on the first rebuild tick."""
    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    from fiesta_tpu import FiestaConfig, checkpoint
    from fiesta_tpu.grid import closest_packed_state, make_state
    from fiesta_tpu.ops.query import get_closest_obstacle
    from fiesta_tpu.pipeline import esdf_update

    cfg = FiestaConfig(resolution=0.1, origin=(0.0, 0.0, 0.0),
                       map_size=(3.2, 3.2, 1.6))
    assert closest_packed_state(cfg)
    st = make_state(cfg)
    # forge the OLD formats
    old = dataclasses.replace(
        st,
        seen=jnp.zeros(cfg.grid_shape, bool).at[1, 2, 3].set(True),
        closest=jnp.full((3,) + cfg.grid_shape, -1, jnp.int16),
        logodds=st.logodds.at[1, 2, 3].set(5.0),
        miss_cnt=st.miss_cnt.at[1, 2, 3].set(2),
        hit_cnt=st.hit_cnt.at[1, 2, 3].set(2),
    )
    path = str(tmp_path / "old_format.npz")
    checkpoint.save(path, cfg, old)
    cfg2, st2 = checkpoint.load(path)
    assert st2.seen.dtype == jnp.uint8          # converter applied
    assert st2.closest.ndim == 4                # planes preserved on load

    # plane-format closest answers queries through the ndim dispatch
    pts, dist = get_closest_obstacle(
        cfg2, st2.closest, st2.d2, st2.seen,
        jnp.asarray([[0.15, 0.25, 0.35]], jnp.float32))
    assert dist.shape == (1,)

    # the first EAGER rebuild tick replaces it with the packed production
    # format (the lazy default leaves state.closest untouched by design —
    # its query surface derives the packed grid below)
    cfg_e = dataclasses.replace(cfg2, closest_mode="eager")
    st3, _ = esdf_update(cfg_e, st2, jnp.zeros(3, jnp.float32))
    assert st3.closest.ndim == 3 and st3.closest.dtype == jnp.int32
    assert bool((np.asarray(st3.closest) >= 0).any())

    # lazy default: the tick preserves the legacy planes; the query-path
    # derive serves the packed production grid, bitwise the eager tick's.
    # (fresh load: st2's buffers were DONATED to the eager tick above)
    _, st2b = checkpoint.load(path)
    st4, _ = esdf_update(cfg2, st2b, jnp.zeros(3, jnp.float32))
    assert st4.closest.ndim == 4                # untouched legacy planes
    from fiesta_tpu.pipeline import derive_closest

    cl = derive_closest(cfg2, st4.logodds)
    np.testing.assert_array_equal(np.asarray(cl), np.asarray(st3.closest))
