"""Unit tests for voxel addressing (reference ESDFMap.cpp:46-118)."""

import jax.numpy as jnp
import numpy as np

from fiesta_tpu import FiestaConfig
from fiesta_tpu import grid as G

CFG = FiestaConfig(
    resolution=0.1,
    origin=(-1.0, -2.0, -0.5),
    map_size=(2.0, 4.0, 1.0),
)


def test_grid_shape():
    assert CFG.grid_shape == (20, 40, 10)
    assert CFG.num_voxels == 8000


def test_pos_vox_roundtrip():
    rng = np.random.default_rng(0)
    vox = rng.integers(0, [20, 40, 10], size=(100, 3)).astype(np.int32)
    pos = G.vox_to_pos(CFG, jnp.asarray(vox))
    back = G.pos_to_vox(CFG, pos)
    np.testing.assert_array_equal(np.asarray(back), vox)


def test_pos_to_vox_floor_semantics():
    # floor((pos - origin)/res), reference ESDFMap.cpp:74-77
    pos = jnp.array([[-1.0, -2.0, -0.5], [-0.951, -1.999, -0.401]])
    vox = G.pos_to_vox(CFG, pos)
    np.testing.assert_array_equal(
        np.asarray(vox), [[0, 0, 0], [0, 0, 0]]
    )


def test_idx_vox_roundtrip():
    rng = np.random.default_rng(1)
    vox = rng.integers(0, [20, 40, 10], size=(200, 3)).astype(np.int32)
    idx = G.vox_to_idx(CFG, jnp.asarray(vox))
    back = G.idx_to_vox(CFG, idx)
    np.testing.assert_array_equal(np.asarray(back), vox)
    # linear layout matches x*YZ + y*Z + z (ESDFMap.cpp:91)
    assert int(G.vox_to_idx(CFG, jnp.array([1, 2, 3]))) == 1 * 400 + 2 * 10 + 3


def test_pos_in_map():
    pos = jnp.array(
        [[0.0, 0.0, 0.0], [-1.01, 0.0, 0.0], [1.0, 2.0, 0.5], [1.01, 0, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(G.pos_in_map(CFG, pos)), [True, False, True, False]
    )


def test_window_mask_and_local_window():
    min_vec = jnp.array([2, 3, 4])
    max_vec = jnp.array([5, 6, 7])
    m = G.window_mask(CFG, min_vec, max_vec)
    assert bool(m[2, 3, 4]) and bool(m[5, 6, 7])
    assert not bool(m[1, 3, 4]) and not bool(m[6, 6, 7])
    assert int(m.sum()) == 4 * 4 * 4

    mn, mx = G.local_window(CFG, jnp.array([0.0, 0.0, 0.0]))
    # radius (3,3,1.5) clamps to the map AABB
    np.testing.assert_array_equal(np.asarray(mn), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(mx), [19, 39, 9])


def test_coord_grids():
    c = G.coord_grids((4, 5, 6))
    assert c.shape == (3, 4, 5, 6)
    assert int(c[0, 3, 0, 0]) == 3
    assert int(c[1, 0, 4, 0]) == 4
    assert int(c[2, 0, 0, 5]) == 5
