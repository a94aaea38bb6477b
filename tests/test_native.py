"""Native (C++) incremental ESDF: parity with the JAX relaxation."""

import jax.numpy as jnp
import numpy as np
import pytest

from fiesta_tpu import INF_D2, stencil_offsets
from fiesta_tpu import native
from fiesta_tpu.grid import UNDEFINED_COORD
from fiesta_tpu.ops import esdf

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

DIRS = stencil_offsets(24)


def _jax_fixpoint(occ):
    shape = occ.shape
    d2, closest, _ = esdf.update_esdf(
        jnp.full(shape, INF_D2, jnp.int32),
        jnp.full((3,) + shape, UNDEFINED_COORD, jnp.int16),
        jnp.asarray(occ), jnp.asarray(occ), jnp.zeros(shape, bool),
        None, DIRS,
    )
    return np.asarray(d2).astype(np.int64), closest


@pytest.mark.parametrize("seed", [0, 1])
def test_native_matches_jax_batch(seed):
    shape = (24, 20, 16)
    rng = np.random.default_rng(seed)
    occ = rng.random(shape) < 0.03

    n = native.NativeEsdf(shape)
    vox = np.argwhere(occ).astype(np.int32)
    n.set_occupancy(vox, np.ones(len(vox), np.uint8))
    expanded = n.update()
    assert expanded > 0
    nd2 = n.dist2()
    nd2 = np.where(nd2 < 0, int(INF_D2), nd2)

    jd2, _ = _jax_fixpoint(occ)
    np.testing.assert_array_equal(nd2, jd2)


def test_native_incremental_insert_delete():
    shape = (20, 20, 12)
    rng = np.random.default_rng(7)
    n = native.NativeEsdf(shape)

    occ = np.zeros(shape, bool)
    groups = []
    for _ in range(3):
        lo = rng.integers(0, np.array(shape) - 3)
        hi = lo + rng.integers(1, 4, size=3)
        g = [(x, y, z) for x in range(lo[0], hi[0])
             for y in range(lo[1], hi[1]) for z in range(lo[2], hi[2])]
        groups.append(g)

    import jax.numpy as jnp
    from fiesta_tpu.grid import UNDEFINED_COORD as UC

    d2 = jnp.full(shape, INF_D2, jnp.int32)
    c = jnp.full((3,) + shape, UC, jnp.int16)

    def step(changes):
        nonlocal d2, c, occ
        vox = np.array([v for v, _ in changes], np.int32)
        occv = np.array([o for _, o in changes], np.uint8)
        n.set_occupancy(vox, occv)
        n.update()
        ins = np.zeros(shape, bool)
        for v, o in changes:
            if o and not occ[v]:
                ins[v] = True
            occ[v] = bool(o)
        d2, c, _ = esdf.update_esdf(
            d2, c, jnp.asarray(occ), jnp.asarray(ins),
            jnp.zeros(shape, bool), None, DIRS,
        )
        nd2 = n.dist2()
        nd2 = np.where(nd2 < 0, int(INF_D2), nd2)
        np.testing.assert_array_equal(nd2, np.asarray(d2).astype(np.int64))

    for g in groups:
        step([(v, 1) for v in g])
    for gi in rng.permutation(len(groups)):
        step([(v, 0) for v in groups[gi]])
    assert not occ.any()
