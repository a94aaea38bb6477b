"""ESDF core tests: exact EDT, relaxation fixpoint, incremental updates.

Test strategy per SURVEY.md section 4: the reference's real oracles are
(a) exact nearest-neighbor distances (its kd-tree check, ESDFMap.cpp:905-1054)
and (b) the randomized cuboid insert/delete stress pattern
(test/test_ESDF_Map.cpp:56-104).  Both are reproduced here against scipy and
a clean-room queue-based implementation of the reference algorithm.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fiesta_tpu import INF_D2, stencil_offsets
from fiesta_tpu.ops import esdf

from fiesta_oracle import QueueESDF, exact_edt_d2

DIRS = stencil_offsets(24)


def random_occ(shape, p, seed):
    rng = np.random.default_rng(seed)
    return rng.random(shape) < p


def cuboids_occ(shape, n, seed):
    rng = np.random.default_rng(seed)
    occ = np.zeros(shape, bool)
    for _ in range(n):
        lo = rng.integers(0, np.array(shape) - 1)
        ext = rng.integers(1, 5, size=3)
        hi = np.minimum(lo + ext, shape)
        occ[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
    return occ


def check_invariants(d2, closest, occ):
    """Structural invariants replacing the reference's DLL CheckConsistency
    (SURVEY.md section 7): closest is occupied, and d2 == |v - closest|^2."""
    d2 = np.asarray(d2)
    closest = np.asarray(closest)
    occ = np.asarray(occ)
    defined = closest[0] >= 0
    assert np.all((d2 < int(INF_D2)) == defined)
    if defined.any():
        cx, cy, cz = closest[0][defined], closest[1][defined], closest[2][defined]
        assert occ[cx, cy, cz].all(), "closest obstacle must be occupied"
        vx, vy, vz = np.nonzero(defined)
        want = (vx - cx) ** 2 + (vy - cy) ** 2 + (vz - cz) ** 2
        np.testing.assert_array_equal(d2[defined], want)
    # occupied voxels are their own closest
    if occ.any():
        assert np.all(d2[occ] == 0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_build_esdf_exact_vs_scipy(seed):
    shape = (24, 20, 16)
    occ = random_occ(shape, 0.02, seed)
    d2, closest = esdf.build_esdf(jnp.asarray(occ))
    want = exact_edt_d2(occ)
    np.testing.assert_array_equal(np.asarray(d2), want)
    check_invariants(d2, closest, occ)


def test_build_esdf_empty_and_full():
    shape = (8, 8, 8)
    d2, closest = esdf.build_esdf(jnp.zeros(shape, bool))
    assert np.all(np.asarray(d2) == int(INF_D2))
    assert np.all(np.asarray(closest) == -1)

    d2, closest = esdf.build_esdf(jnp.ones(shape, bool))
    assert np.all(np.asarray(d2) == 0)


@pytest.mark.parametrize("seed", [0, 3])
def test_relax_fixpoint_near_exact(seed):
    """Relaxation from seeds reaches a near-optimal fixpoint (>= exact, with
    the small overestimate the reference documents for its 24-stencil)."""
    shape = (20, 18, 14)
    occ = cuboids_occ(shape, 6, seed)
    seeds_d2 = jnp.where(jnp.asarray(occ), 0, INF_D2)
    from fiesta_tpu.grid import UNDEFINED_COORD, coord_grids

    closest0 = jnp.where(
        jnp.asarray(occ)[None], coord_grids(shape), UNDEFINED_COORD
    )
    d2, closest, iters = esdf.relax_to_fixpoint(
        seeds_d2, closest0, None, None, DIRS
    )
    check_invariants(d2, closest, occ)
    exact = exact_edt_d2(occ)
    d2n = np.asarray(d2).astype(np.int64)
    assert np.all(d2n >= exact), "relaxation must never underestimate"
    err = np.sqrt(d2n[d2n < int(INF_D2)]) - np.sqrt(
        exact[d2n < int(INF_D2)]
    )
    # 24-stencil near-optimality: overestimates are small (reference's own
    # error histogram bins at 0.1 m with most mass in the first bins).
    assert err.max() <= 2.0, f"overestimate too large: {err.max()}"
    assert err.mean() <= 0.05

    # extra sweep is a no-op (fixpoint)
    d2b, _, changed = esdf.relax_once(d2, closest, None, None, DIRS)
    assert not bool(changed)


def test_jump_accelerated_relaxation():
    """Long-range jump offsets: same-or-better accuracy, far fewer sweeps."""
    from fiesta_tpu.config import jump_offsets

    shape = (96, 24, 16)
    occ = np.zeros(shape, bool)
    occ[2, 12, 8] = True   # single obstacle; wavefront must cross ~94 voxels
    from fiesta_tpu.grid import UNDEFINED_COORD, coord_grids

    seeds_d2 = jnp.where(jnp.asarray(occ), 0, INF_D2)
    closest0 = jnp.where(
        jnp.asarray(occ)[None], coord_grids(shape), UNDEFINED_COORD
    )

    d2_a, c_a, it_a = esdf.relax_to_fixpoint(
        seeds_d2, closest0, None, None, DIRS
    )
    jump_dirs = DIRS + tuple(
        d for d in jump_offsets(64) if all(abs(d[i]) < shape[i] for i in range(3))
    )
    d2_b, c_b, it_b = esdf.relax_to_fixpoint(
        seeds_d2, closest0, None, None, jump_dirs
    )
    check_invariants(d2_b, c_b, occ)
    assert int(it_b) < int(it_a) / 2, (int(it_a), int(it_b))
    # jumps only tighten the fixpoint toward the exact EDT
    assert np.all(np.asarray(d2_b) <= np.asarray(d2_a))
    assert np.all(np.asarray(d2_b).astype(np.int64) >= exact_edt_d2(occ))


def test_incremental_insert_matches_batch():
    """Inserting obstacles in two batches == inserting them all at once."""
    shape = (16, 16, 12)
    occ_a = cuboids_occ(shape, 3, 10)
    occ_b = cuboids_occ(shape, 3, 11)
    occ_all = occ_a | occ_b

    # batch
    from fiesta_tpu.grid import UNDEFINED_COORD

    d2_0 = jnp.full(shape, INF_D2, jnp.int32)
    c_0 = jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16)
    d2_b, c_b, _ = esdf.update_esdf(
        d2_0, c_0, jnp.asarray(occ_all), jnp.asarray(occ_all),
        jnp.zeros(shape, bool), None, DIRS,
    )

    # incremental
    d2_i, c_i, _ = esdf.update_esdf(
        d2_0, c_0, jnp.asarray(occ_a), jnp.asarray(occ_a),
        jnp.zeros(shape, bool), None, DIRS,
    )
    ins2 = jnp.asarray(occ_b & ~occ_a)
    d2_i, c_i, _ = esdf.update_esdf(
        d2_i, c_i, jnp.asarray(occ_all), ins2, jnp.zeros(shape, bool),
        None, DIRS,
    )

    check_invariants(d2_i, c_i, occ_all)
    # both are fixpoints of the same monotone system seeded by the same
    # obstacle set; distances must agree (closest may tie-break differently)
    np.testing.assert_array_equal(np.asarray(d2_b), np.asarray(d2_i))


def test_incremental_delete_repropagates():
    """Deleting an obstacle restores distances to the remaining set."""
    shape = (16, 14, 10)
    occ_a = np.zeros(shape, bool)
    occ_a[3, 3, 3] = True
    occ_b = np.zeros(shape, bool)
    occ_b[12, 10, 7] = True

    from fiesta_tpu.grid import UNDEFINED_COORD

    d2 = jnp.full(shape, INF_D2, jnp.int32)
    c = jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16)

    both = occ_a | occ_b
    d2, c, _ = esdf.update_esdf(
        d2, c, jnp.asarray(both), jnp.asarray(both), jnp.zeros(shape, bool),
        None, DIRS,
    )
    check_invariants(d2, c, both)

    # delete obstacle A
    d2, c, _ = esdf.update_esdf(
        d2, c, jnp.asarray(occ_b), jnp.zeros(shape, bool),
        jnp.asarray(occ_a), None, DIRS,
    )
    check_invariants(d2, c, occ_b)

    # must now equal the fixpoint with only B present
    d2_ref, c_ref, _ = esdf.update_esdf(
        jnp.full(shape, INF_D2, jnp.int32),
        jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16),
        jnp.asarray(occ_b), jnp.asarray(occ_b), jnp.zeros(shape, bool),
        None, DIRS,
    )
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d2_ref))


@pytest.mark.parametrize("seed", [0, 1])
def test_random_cuboid_insert_delete_stress(seed):
    """The reference's legacy stress pattern (test_ESDF_Map.cpp:56-104):
    shuffled cuboid groups inserted then deleted, checking consistency and
    agreement with the queue-based oracle at every step."""
    shape = (12, 12, 8)
    rng = np.random.default_rng(seed)
    from fiesta_tpu.grid import UNDEFINED_COORD

    d2 = jnp.full(shape, INF_D2, jnp.int32)
    c = jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16)
    occ = np.zeros(shape, bool)
    oracle = QueueESDF(shape, DIRS)

    groups = []
    for _ in range(4):
        lo = rng.integers(0, np.array(shape) - 2)
        hi = np.minimum(lo + rng.integers(1, 4, size=3), shape)
        vox = [
            (x, y, z)
            for x in range(lo[0], hi[0])
            for y in range(lo[1], hi[1])
            for z in range(lo[2], hi[2])
        ]
        groups.append(vox)

    def step(changes):
        nonlocal d2, c, occ
        ins = np.zeros(shape, bool)
        for v, o in changes:
            was = occ[v]
            occ[v] = bool(o)
            if o and not was:
                ins[v] = True
        d2, c, _ = esdf.update_esdf(
            d2, c, jnp.asarray(occ), jnp.asarray(ins),
            jnp.zeros(shape, bool), None, DIRS,
        )
        oracle.set_occupancy(changes)
        check_invariants(d2, c, occ)
        # distances agree with the queue-ordered reference algorithm
        ours = np.asarray(d2).astype(np.int64)
        theirs = np.where(oracle.d2 >= oracle.INF, int(INF_D2), oracle.d2)
        np.testing.assert_array_equal(ours, theirs)

    for g in groups:
        step([(v, 1) for v in g])
    order = rng.permutation(len(groups))
    for gi in order:
        step([(v, 0) for v in groups[gi]])

    assert not occ.any()
    assert np.all(np.asarray(d2) == int(INF_D2))


def test_stencil_62_matches_reference_listing():
    """The 62-dir "faces 3 steps" alternative (parameters.h:92-129):
    correct composition (faces+edges+corners+2-steps+knights+3-steps),
    unique offsets, symmetric under negation, reach 3."""
    dirs = np.asarray(stencil_offsets(62))
    assert dirs.shape == (62, 3)
    assert len({tuple(d) for d in dirs}) == 62
    assert {tuple(-d) for d in dirs} == {tuple(d) for d in dirs}
    norms = np.sort((dirs ** 2).sum(1))
    # 6 faces(1) + 12 edges(2) + 8 corners(3) + 6 faces2(4) + 24 knights(5)
    # + 6 faces3(9)
    want = [1] * 6 + [2] * 12 + [3] * 8 + [4] * 6 + [5] * 24 + [9] * 6
    np.testing.assert_array_equal(norms, want)
    assert np.abs(dirs).max() == 3


def test_relax_fixpoint_62_stencil_tighter_than_24():
    """The denser 62-stencil must stay sound (never underestimates) and be
    at least as tight as the 24-stencil default."""
    shape = (20, 18, 14)
    occ = cuboids_occ(shape, 6, 3)
    from fiesta_tpu.grid import UNDEFINED_COORD, coord_grids

    seeds_d2 = jnp.where(jnp.asarray(occ), 0, INF_D2)
    closest0 = jnp.where(
        jnp.asarray(occ)[None], coord_grids(shape), UNDEFINED_COORD
    )
    outs = {}
    for conn in (24, 62):
        d2, closest, _ = esdf.relax_to_fixpoint(
            seeds_d2, closest0, None, None, stencil_offsets(conn)
        )
        check_invariants(d2, closest, occ)
        outs[conn] = np.asarray(d2).astype(np.int64)
    exact = exact_edt_d2(occ)
    assert np.all(outs[62] >= exact)
    assert np.all(outs[62] <= outs[24])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_windowed_update_matches_queue_oracle(seed):
    """Local-window mode (C17) against the queue oracle with the
    reference's VoxInRange gates (substitute scan ESDFMap.cpp:311,
    patch A :351, patch B :378).  In-window distances must match the
    reference algorithm exactly — including the patch-B flow where
    queued out-of-window voxels push their obstacle back INTO the
    window; everywhere, ours must be valid (>= exact EDT of the true
    occupancy) and at least as tight as the reference (out-of-window
    reset voxels keep pulling here, where the reference freezes them)."""
    shape = (16, 16, 8)
    lo = np.array([4, 4, 2])
    hi = np.array([11, 11, 5])                 # inclusive, like VoxInRange
    rng = np.random.default_rng(seed)

    wmask_np = np.zeros(shape, bool)
    wmask_np[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1] = True
    wmask = jnp.asarray(wmask_np)

    from fiesta_tpu.grid import UNDEFINED_COORD

    d2 = jnp.full(shape, INF_D2, jnp.int32)
    c = jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16)
    occ = np.zeros(shape, bool)
    oracle = QueueESDF(shape, DIRS, window=(lo, hi))

    in_w = wmask_np

    def step(changes):
        nonlocal d2, c, occ
        ins = np.zeros(shape, bool)
        for v, o in changes:
            was = occ[v]
            occ[v] = bool(o)
            if o and not was:
                ins[v] = True
        d2, c, _ = esdf.update_esdf(
            d2, c, jnp.asarray(occ), jnp.asarray(ins),
            jnp.zeros(shape, bool), wmask, DIRS,
        )
        oracle.set_occupancy(changes)
        ours = np.asarray(d2).astype(np.int64)
        theirs = np.where(oracle.d2 >= oracle.INF, int(INF_D2), oracle.d2)
        np.testing.assert_array_equal(ours[in_w], theirs[in_w])
        assert (ours <= theirs).all(), "never looser than the reference"
        exact = exact_edt_d2(occ)
        finite = ours < int(INF_D2)
        assert (ours[finite] >= exact[finite]).all(), \
            "distances must never undercut the exact EDT"

    # obstacles straddling the window border on purpose
    for _ in range(5):
        base = rng.integers(0, np.array(shape) - 2)
        ext = rng.integers(1, 4, size=3)
        vox = [
            (x, y, z)
            for x in range(base[0], min(base[0] + ext[0], shape[0]))
            for y in range(base[1], min(base[1] + ext[1], shape[1]))
            for z in range(base[2], min(base[2] + ext[2], shape[2]))
        ]
        step([(v, 1) for v in vox])
        if rng.random() < 0.5 and occ.any():
            occ_list = np.argwhere(occ)
            kill = occ_list[rng.integers(0, len(occ_list),
                                         size=max(1, len(occ_list) // 3))]
            step([(tuple(v), 0) for v in kill])
