"""Tests for the truncated-EDT production kernel (XLA fallback on CPU; the
Pallas path is exercised on TPU by bench.py and shares the identical
windowed min-plus math)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from fiesta_tpu import INF_D2
from fiesta_tpu.ops.pallas import edt


@pytest.mark.parametrize("seed,p", [(0, 0.01), (1, 0.05), (2, 0.002)])
def test_truncated_edt_exact_within_radius(seed, p):
    shape = (40, 32, 24)
    rng = np.random.default_rng(seed)
    occ = rng.random(shape) < p
    t = 8
    d2 = np.asarray(edt.truncated_edt_d2(jnp.asarray(occ), t)).astype(np.int64)

    true_d = ndimage.distance_transform_edt(~occ)
    true_d2 = np.round(true_d**2).astype(np.int64)

    near = true_d2 <= t * t
    np.testing.assert_array_equal(d2[near], true_d2[near])
    assert np.all(d2[~near] == int(INF_D2))


def test_truncated_edt_empty():
    d2 = np.asarray(edt.truncated_edt_d2(jnp.zeros((16, 16, 8), bool), 6))
    assert np.all(d2 == int(INF_D2))


def test_truncated_edt_full():
    d2 = np.asarray(edt.truncated_edt_d2(jnp.ones((16, 16, 8), bool), 6))
    assert np.all(d2 == 0)


def test_hierarchical_edt_accuracy():
    shape = (48, 40, 24)
    rng = np.random.default_rng(5)
    occ = rng.random(shape) < 0.01
    t_fine, t_total = 6, 16
    d2 = np.asarray(
        edt.hierarchical_edt_d2(jnp.asarray(occ), t_fine, t_total)
    ).astype(np.int64)
    true_d = ndimage.distance_transform_edt(~occ)
    true_d2 = np.round(true_d**2).astype(np.int64)

    # exact within the fine radius
    near = true_d2 <= t_fine * t_fine
    np.testing.assert_array_equal(d2[near], true_d2[near])

    # far band: within 1 coarse voxel (2 fine voxels) of truth
    far = (true_d2 > t_fine * t_fine) & (true_d <= t_total - 2)
    if far.any():
        got = np.sqrt(d2[far].astype(np.float64))
        err = np.abs(got - true_d[far])
        assert err.max() <= 2.0 * np.sqrt(3) + 1e-6, err.max()


def test_truncation_boundary():
    shape = (64, 8, 8)
    occ = np.zeros(shape, bool)
    occ[0, 4, 4] = True
    t = 10
    d2 = np.asarray(edt.truncated_edt_d2(jnp.asarray(occ), t))
    # exact along the axis up to t, INF beyond
    for x in range(1, t + 1):
        assert d2[x, 4, 4] == x * x
    assert d2[t + 1, 4, 4] == int(INF_D2)


def test_truncated_edt_degenerate_zero_radius():
    """trunc_vox=0: only obstacle voxels are within radius 0 — must not
    crash (the Pallas binary pass previously indexed an empty shift list)
    and must match the semantics on every backend."""
    import jax.numpy as jnp

    from fiesta_tpu.grid import INF_D2
    from fiesta_tpu.ops.pallas.edt import truncated_edt_d2

    occ = jnp.zeros((8, 8, 8), bool).at[2, 3, 4].set(True)
    d2 = np.asarray(truncated_edt_d2(occ, 0))
    assert d2[2, 3, 4] == 0
    mask = np.ones((8, 8, 8), bool)
    mask[2, 3, 4] = False
    assert (d2[mask] == int(INF_D2)).all()


# ---------------------------------------------------------------------------
# Closest-obstacle tracking (packed argmin; reference ESDFMap.h:92-96)
# ---------------------------------------------------------------------------


def _check_closest(occ, t, d2, closest):
    """closest must name an occupied voxel at exactly sqrt(d2) wherever d2
    is finite, and be UNDEFINED (-1) elsewhere."""
    d2 = np.asarray(d2).astype(np.int64)
    closest = np.asarray(closest).astype(np.int64)
    defined = d2 < int(INF_D2)
    assert np.array_equal(closest[0] >= 0, defined)
    if defined.any():
        cx, cy, cz = (c[defined] for c in closest)
        assert occ[cx, cy, cz].all(), "closest names a non-occupied voxel"
        vx, vy, vz = np.nonzero(defined)
        want = (vx - cx) ** 2 + (vy - cy) ** 2 + (vz - cz) ** 2
        np.testing.assert_array_equal(d2[defined], want)


@pytest.mark.parametrize("seed,p,t", [(0, 0.01, 8), (1, 0.05, 6),
                                      (2, 0.002, 12), (3, 0.3, 5)])
def test_edt_closest_matches_oracle(seed, p, t):
    shape = (40, 32, 24)
    rng = np.random.default_rng(seed)
    occ = rng.random(shape) < p
    d2, closest = edt.truncated_edt_d2_closest(jnp.asarray(occ), t)

    # d2 identical to the d2-only transform
    np.testing.assert_array_equal(
        np.asarray(d2), np.asarray(edt.truncated_edt_d2(jnp.asarray(occ), t)))
    _check_closest(occ, t, d2, closest)


def test_edt_closest_empty_grid():
    occ = np.zeros((16, 16, 8), bool)
    d2, closest = edt.truncated_edt_d2_closest(jnp.asarray(occ), 5)
    assert np.all(np.asarray(d2) == int(INF_D2))
    assert np.all(np.asarray(closest) == -1)


def test_edt_closest_single_obstacle():
    occ = np.zeros((20, 16, 12), bool)
    occ[10, 8, 6] = True
    d2, closest = edt.truncated_edt_d2_closest(jnp.asarray(occ), 7)
    d2 = np.asarray(d2)
    closest = np.asarray(closest)
    assert d2[10, 8, 6] == 0
    assert tuple(closest[:, 10, 8, 6]) == (10, 8, 6)
    # every defined voxel points at the only obstacle
    defined = d2 < int(INF_D2)
    for ax, want in zip(range(3), (10, 8, 6)):
        assert np.all(closest[ax][defined] == want)


def test_closest_plan_bit_budget():
    # cow_and_lady scale fits exactly (15 + 9 + 7 = 31)
    assert edt.closest_plan((400, 400, 80), 100) is not None
    # two 512 axes + t=100 does not (15 + 9 + 9 = 33)
    assert edt.closest_plan((512, 512, 512), 100) is None
    assert edt.closest_plan((40, 32, 24), 0) is None


def test_hierarchical_edt_closest():
    shape = (40, 32, 24)
    rng = np.random.default_rng(7)
    occ = rng.random(shape) < 0.01
    t_fine, t_total = 5, 12
    d2, closest = edt.hierarchical_edt_d2_closest(
        jnp.asarray(occ), t_fine, t_total)
    d2 = np.asarray(d2)
    closest = np.asarray(closest)
    np.testing.assert_array_equal(
        d2, np.asarray(edt.hierarchical_edt_d2(jnp.asarray(occ), t_fine,
                                               t_total)))
    # fine field: exact closest contract
    fine_d2 = np.asarray(edt.truncated_edt_d2(jnp.asarray(occ), t_fine))
    fine = fine_d2 < int(INF_D2)
    if fine.any():
        cx, cy, cz = (c[fine] for c in closest)
        assert occ[cx, cy, cz].all()
        vx, vy, vz = np.nonzero(fine)
        want = (vx - cx) ** 2 + (vy - cy) ** 2 + (vz - cz) ** 2
        np.testing.assert_array_equal(d2[fine], want)
    # far field: closest lands within the winning 2x2x2 coarse block
    far = (d2 < int(INF_D2)) & ~fine
    if far.any():
        cx, cy, cz = (c[far] for c in closest)
        block_occ = (occ.reshape(20, 2, 16, 2, 12, 2).any(axis=(1, 3, 5)))
        assert block_occ[cx // 2, cy // 2, cz // 2].all()
    # definedness matches d2 everywhere
    assert np.array_equal(closest[0] >= 0, d2 < int(INF_D2))


# ---------------------------------------------------------------------------
# Wide (two-word) closest fallback — the big-grid engine (VERDICT r2 item 3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,p,t", [(0, 0.01, 8), (1, 0.05, 6),
                                      (3, 0.3, 5)])
def test_wide_closest_bit_identical_to_packed(seed, p, t):
    """Where both engines are defined they must agree BIT-EXACTLY (same
    lexicographic tie-break order by construction)."""
    shape = (40, 32, 24)
    rng = np.random.default_rng(seed)
    occ = rng.random(shape) < p
    d2p, clp = edt.truncated_edt_d2_closest(jnp.asarray(occ), t)
    d2w, clw = edt.truncated_edt_d2_closest_wide(jnp.asarray(occ), t)
    np.testing.assert_array_equal(np.asarray(d2p), np.asarray(d2w))
    np.testing.assert_array_equal(np.asarray(clp), np.asarray(clw))


def test_wide_closest_past_int32_budget():
    """A (shape, t) the packed plan REFUSES (value+payload bits > 31) still
    gets exact d2 + closest through the wide fallback."""
    # bits [6,6,3] -> c=axis0 (64), payload ba=6 bb=3; t=1500 -> vbits =
    # bits(2*1500^2+1) = 23 -> 23+9 = 32 > 31 refused; per-pass taps clamp
    # to axis-1 so the compute stays small (t past the grid diameter =
    # untruncated, the regime the budget actually breaks in)
    shape = (64, 48, 8)
    t = 1500
    assert edt.closest_plan(shape, t) is None
    assert edt.closest_plan_wide(shape, t) is not None
    rng = np.random.default_rng(11)
    occ = rng.random(shape) < 0.0005
    d2, closest = edt.truncated_edt_d2_closest_wide(jnp.asarray(occ), t)
    np.testing.assert_array_equal(
        np.asarray(d2), np.asarray(edt.truncated_edt_d2(jnp.asarray(occ), t)))
    _check_closest(occ, t, d2, closest)


def test_closest_capability_report():
    cap = edt.closest_capability((400, 400, 80), 100)
    assert cap["packed"] and cap["wide"] and cap["oracle"]
    cap = edt.closest_capability((512, 512, 512), 100)
    assert not cap["packed"] and cap["wide"] and cap["oracle"]
    assert "does not fit" in cap["detail"]
    cap = edt.closest_capability((1024, 512, 512), 100)
    assert not cap["oracle"]


def test_edt_closest_auto_dispatch():
    """edt_closest_auto picks packed when it fits, wide when it does not,
    and both contracts hold."""
    rng = np.random.default_rng(13)
    occ_small = rng.random((40, 32, 24)) < 0.02
    d2a, cla = edt.edt_closest_auto(jnp.asarray(occ_small), 8)
    d2p, clp = edt.truncated_edt_d2_closest(jnp.asarray(occ_small), 8)
    np.testing.assert_array_equal(np.asarray(d2a), np.asarray(d2p))
    np.testing.assert_array_equal(np.asarray(cla), np.asarray(clp))


def test_l1_pass_squares_to_binary_pass():
    """l1_pass + square_l1 == binary_pass on a full axis (the composable
    form the sharded x-pass exchanges edge planes of)."""
    rng = np.random.default_rng(19)
    for t, shape in [(8, (40, 16, 8)), (100, (64, 8, 8)), (5, (6, 8, 8))]:
        occ = rng.random(shape) < 0.05
        f = jnp.where(jnp.asarray(occ), 0, edt._INF_EDT).astype(jnp.int32)
        a = np.asarray(edt.square_l1(edt.l1_pass(f, t), t))
        b = np.asarray(edt.binary_pass(f, t))
        np.testing.assert_array_equal(a, b)
        # raw form: bounded by t+1, sentinel only where no seed within t
        raw = np.asarray(edt.l1_pass(f, t))
        assert raw.max() <= t + 1
