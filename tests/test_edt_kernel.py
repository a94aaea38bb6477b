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
