"""Pallas kernel semantics, guarded on CPU via interpret mode.

The TPU production path runs custom kernels (ops/pallas/carve.py,
ops/pallas/edt.py) that CI cannot compile without a chip; interpret mode
executes the same kernel programs on the host, so their semantics stay
pinned against the pure-XLA fallbacks (which the rest of the test suite
validates against the reference oracles)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fiesta_tpu.config import FiestaConfig
from fiesta_tpu.grid import INF_D2
from fiesta_tpu.ops import raycast as rc
from fiesta_tpu.ops.pallas.edt import (
    _INF_EDT,
    _binary_pass_pallas,
    _minplus_pass_pallas,
    _minplus_pass_xla,
)


@pytest.fixture(scope="module")
def cfg():
    return FiestaConfig(
        resolution=0.2,
        map_size=(12.0, 12.0, 4.8),
        origin=(-6.0, -6.0, -2.4),
        min_ray_length=0.3,
        max_ray_length=3.0,
    )


@pytest.mark.parametrize("io_mode", ["canon", "canonx", "relayout"])
def test_carve_kernel_matches_xla_fallback(cfg, io_mode):
    """Both kernel IO layouts (canonical in-VMEM sub-slab transposes and
    the pre-round-5 HBM relayout form) pin against the XLA fallback."""
    rng = np.random.default_rng(3)
    k, p = 2, 400
    origins = rng.uniform(-2, 2, (k, 3)).astype(np.float32)
    origins[:, 2] *= 0.4
    pts = (origins[:, None, :]
           + rng.uniform(-4, 4, (k, p, 3))).astype(np.float32)
    val = rng.uniform(size=(k, p)) < 0.9
    seeds_fn = jax.vmap(lambda pp, v, o: rc._scanline_seeds(cfg, pp, v, o))
    _, po_box, seeds, _, _, _ = seeds_fn(
        jnp.asarray(pts), jnp.asarray(val), jnp.asarray(origins))

    free_kernel = np.asarray(
        rc._carve_free_tpu(cfg, seeds, po_box, interpret=True,
                           io_mode=io_mode))
    free_xla = np.asarray(rc.carve_free_mask_batch(cfg, seeds, po_box))
    assert np.array_equal(free_kernel, free_xla)
    assert free_xla.any()  # non-degenerate scene


def test_minplus_pass_kernel_matches_xla():
    rng = np.random.default_rng(0)
    f = jnp.asarray(
        np.where(rng.uniform(size=(48, 20, 12)) < 0.02, 0, _INF_EDT),
        jnp.int32,
    )
    for t in (5, 17):
        ref = _minplus_pass_xla(f, t)
        got = _minplus_pass_pallas(f, t, interpret=True)
        assert jnp.array_equal(ref, got)


def test_binary_pass_kernel_matches_xla():
    rng = np.random.default_rng(1)
    f = jnp.asarray(
        np.where(rng.uniform(size=(48, 20, 12)) < 0.02, 0, _INF_EDT),
        jnp.int32,
    )
    for t in (5, 17, 47):
        ref = jnp.minimum(_minplus_pass_xla(f, t), _INF_EDT)
        got = _binary_pass_pallas(f, t, interpret=True)
        # binary pass truncates at t (reads as _INF_EDT beyond); the
        # generic pass reports true values up to (a-1)^2
        mask = ref <= t * t
        assert jnp.array_equal(ref[mask], got[mask])
        assert bool(jnp.all(got[~mask] == _INF_EDT))


def test_closest_packed_kernels_match_xla():
    """The three packed argmin-tracking passes (binary doubling, paired
    window, split-sign final) produce identical packed words in interpret
    mode and via the XLA fallback."""
    from fiesta_tpu.ops.pallas import edt

    rng = np.random.default_rng(5)
    shape = (40, 32, 24)
    occ = rng.random(shape) < 0.03
    t = 9
    plan = edt.closest_plan(shape, t)
    assert plan is not None

    a_ax, b_ax, c_ax = plan["a"], plan["b"], plan["c"]
    occ_t = jnp.asarray(occ.transpose(a_ax, b_ax, c_ax).astype(np.uint8))

    p1_k = edt._binary_packed_pallas(occ_t, plan, interpret=True)
    p1_x = edt._binary_packed_xla(occ_t, plan)
    np.testing.assert_array_equal(np.asarray(p1_k), np.asarray(p1_x))

    p2_k = edt._window_packed_pallas(p1_x.transpose(1, 0, 2), plan,
                                     interpret=True)
    p2_x = edt._window_packed_xla(p1_x.transpose(1, 0, 2), plan)
    np.testing.assert_array_equal(np.asarray(p2_k), np.asarray(p2_x))

    vps_k = edt._split_packed_pallas(p2_x.transpose(2, 1, 0), plan,
                                     interpret=True)
    vps_x = edt._split_packed_xla(p2_x.transpose(2, 1, 0), plan)
    np.testing.assert_array_equal(np.asarray(vps_k), np.asarray(vps_x))


def test_closest_full_transform_interpret():
    """End-to-end d2+closest via the Pallas kernels (interpret) matches the
    XLA-fallback transform bit-exactly."""
    from fiesta_tpu.ops.pallas import edt

    rng = np.random.default_rng(11)
    occ = jnp.asarray(rng.random((32, 28, 16)) < 0.02)
    t = 7
    d2_k, cl_k = edt.truncated_edt_d2_closest(occ, t, interpret=True)
    d2_x, cl_x = edt.truncated_edt_d2_closest(occ, t)
    np.testing.assert_array_equal(np.asarray(d2_k), np.asarray(d2_x))
    np.testing.assert_array_equal(np.asarray(cl_k), np.asarray(cl_x))


def test_zeros_f32_fallback_and_factorization():
    """zeros_f32 == jnp.zeros for awkward and friendly sizes (CPU exercises
    the fallback; the TPU kernel path is covered by the bench A/B)."""
    import numpy as np

    from fiesta_tpu.ops.pallas.fill import _chunk_rows, zeros_f32

    for n in (128, 11197440, 127, 8 * 128 * 3 * 5):
        z = np.asarray(zeros_f32(n))
        assert z.shape == (n,) and z.dtype == np.float32
        assert not z.any()
    # chunk rows must divide the row count and be a multiple of 8
    for rows in (87480, 8, 16, 1000, 4096):
        ch = _chunk_rows(rows, 4096)
        if ch:
            assert rows % ch == 0 and ch % 8 == 0
    assert _chunk_rows(7, 4096) == 0


def test_fuse_kernel_window_matches_xla_chain():
    """The windowed single-pass fusion (iota-gated in kernel, round 5)
    == fuse_counts with a dense window_mask, bit-exactly — including the
    x_offset form the sharded slab caller uses."""
    import numpy as np

    from fiesta_tpu import FiestaConfig
    from fiesta_tpu.grid import window_mask
    from fiesta_tpu.ops import fusion
    from fiesta_tpu.ops.pallas.fuse import fuse_counts_pallas, fuse_supported

    cfg = FiestaConfig(resolution=0.1, origin=(0.0, 0.0, 0.0),
                       map_size=(1.6, 1.6, 0.8))
    assert fuse_supported(cfg.grid_shape)
    rng = np.random.default_rng(7)
    shape = cfg.grid_shape
    lo = rng.uniform(cfg.clamp_min_log, cfg.clamp_max_log,
                     shape).astype(np.float32)
    seen = (rng.random(shape) < 0.5).astype(np.uint8)
    hit = rng.integers(0, 4, shape).astype(np.uint8)
    miss = np.where(rng.random(shape) < 0.3, 0,
                    rng.integers(0, 4, shape)).astype(np.uint8)
    wmin = jnp.asarray([3, 2, 1], jnp.int32)
    wmax = jnp.asarray([11, 13, 6], jnp.int32)
    wmask = window_mask(cfg, wmin, wmax)

    ref = fusion.fuse_counts(cfg, jnp.asarray(lo), jnp.asarray(seen),
                             jnp.asarray(hit), jnp.asarray(miss),
                             window_mask=wmask)
    kw = dict(l_hit=cfg.prob_hit_log, l_miss=cfg.prob_miss_log,
              clamp_min=cfg.clamp_min_log, clamp_max=cfg.clamp_max_log,
              occ_thresh=cfg.min_occupancy_log, occ_is_eq=False,
              interpret=True)
    new_lo, new_seen, occ, hit0, miss0, n_obs, n_ins, n_del = \
        fuse_counts_pallas(jnp.asarray(lo), jnp.asarray(seen),
                           jnp.asarray(hit), jnp.asarray(miss),
                           window=(wmin, wmax), **kw)
    np.testing.assert_array_equal(np.asarray(new_lo),
                                  np.asarray(ref.logodds))
    np.testing.assert_array_equal(np.asarray(new_seen) > 0,
                                  np.asarray(ref.seen) > 0)
    np.testing.assert_array_equal(np.asarray(occ) > 0,
                                  np.asarray(ref.occupied))
    assert int(n_obs) == int(ref.num_observed)
    assert int(n_ins) == int(np.asarray(ref.insert_mask).sum())
    assert int(n_del) == int(np.asarray(ref.delete_mask).sum())
    # the window actually gated something
    assert int(ref.num_observed) < int(np.asarray(miss > 0).sum())

    # x_offset form: shift the slab so local x + offset = global x gives
    # identical results on the corresponding slab
    off = 4
    new_lo2, *_rest = fuse_counts_pallas(
        jnp.asarray(lo[off:]), jnp.asarray(seen[off:]),
        jnp.asarray(hit[off:]), jnp.asarray(miss[off:]),
        window=(wmin, wmax), x_offset=jnp.int32(off), **kw)
    np.testing.assert_array_equal(np.asarray(new_lo2),
                                  np.asarray(ref.logodds)[off:])


def test_fuse_kernel_matches_xla_chain():
    """Single-pass Pallas fusion == fusion.fuse_counts bit-exactly
    (log-odds, seen, occupancy, stats counts), incl. saturated counters
    and both occupancy predicates."""
    import numpy as np

    from fiesta_tpu import FiestaConfig
    from fiesta_tpu.ops import fusion
    from fiesta_tpu.ops.pallas.fuse import fuse_counts_pallas, fuse_supported

    cfg = FiestaConfig(resolution=0.1, origin=(0.0, 0.0, 0.0),
                       map_size=(1.6, 1.6, 0.8))   # 16*16*8 = 2048 = 16*128
    assert fuse_supported(cfg.grid_shape)
    rng = np.random.default_rng(3)
    shape = cfg.grid_shape
    lo = rng.uniform(cfg.clamp_min_log, cfg.clamp_max_log,
                     shape).astype(np.float32)
    lo.flat[::7] = np.float32(cfg.min_occupancy_log)  # boundary values
    seen = rng.random(shape) < 0.5   # bool, as MapState stores it
    hit = rng.integers(0, 256, shape).astype(np.uint8)
    miss = np.where(rng.random(shape) < 0.3, 0,
                    rng.integers(0, 256, shape)).astype(np.uint8)

    ref = fusion.fuse_counts(cfg, jnp.asarray(lo), jnp.asarray(seen),
                             jnp.asarray(hit), jnp.asarray(miss))
    got = fuse_counts_pallas(
        jnp.asarray(lo), jnp.asarray(seen), jnp.asarray(hit),
        jnp.asarray(miss),
        l_hit=cfg.prob_hit_log, l_miss=cfg.prob_miss_log,
        clamp_min=cfg.clamp_min_log, clamp_max=cfg.clamp_max_log,
        occ_thresh=cfg.min_occupancy_log, occ_is_eq=False,
        interpret=True)
    new_lo, new_seen, occ, hit0, miss0, n_obs, n_ins, n_del = got
    np.testing.assert_array_equal(np.asarray(new_lo), np.asarray(ref.logodds))
    np.testing.assert_array_equal(np.asarray(new_seen), np.asarray(ref.seen))
    np.testing.assert_array_equal(np.asarray(occ) > 0,
                                  np.asarray(ref.occupied))
    assert not np.asarray(hit0).any() and not np.asarray(miss0).any()
    assert int(n_obs) == int(ref.num_observed)
    assert int(n_ins) == int(np.asarray(ref.insert_mask).sum())
    assert int(n_del) == int(np.asarray(ref.delete_mask).sum())


def test_boxadd_kernel_interpret_both_arith_paths():
    """In-place region-add (interpret): i32-convert and u8-native wrap
    forms both equal the numpy saturating oracle, including at 255."""
    import numpy as np

    from fiesta_tpu.ops.pallas.boxadd import box_add_inplace

    rng = np.random.default_rng(0)
    g = (32, 16, 16)
    hit = rng.integers(0, 256, g).astype(np.uint8)
    hit[:8] = 254                       # saturation boundary region
    miss = rng.integers(0, 256, g).astype(np.uint8)
    k, box = 2, (8, 8, 16)
    starts = np.array([[0, 0, 0], [16, 8, 0]], np.int32)
    bh = rng.integers(0, 4, (k,) + box).astype(np.uint8)
    bm = rng.integers(0, 4, (k,) + box).astype(np.uint8)

    exp_h = hit.astype(np.int32).copy()
    exp_m = miss.astype(np.int32).copy()
    for i in range(k):
        sl = tuple(slice(starts[i][d], starts[i][d] + box[d])
                   for d in range(3))
        exp_h[sl] = np.minimum(exp_h[sl] + bh[i], 255)
        exp_m[sl] = np.minimum(exp_m[sl] + bm[i], 255)

    for force_u8 in (False, True):
        oh, om = box_add_inplace(
            jnp.asarray(hit), jnp.asarray(miss), jnp.asarray(starts),
            jnp.asarray(bh), jnp.asarray(bm),
            interpret=True, force_u8=force_u8)
        np.testing.assert_array_equal(np.asarray(oh),
                                      exp_h.astype(np.uint8))
        np.testing.assert_array_equal(np.asarray(om),
                                      exp_m.astype(np.uint8))


def test_decode_splat_matches_xla(monkeypatch):
    """Pallas splat decode == _seeds_from_packed bit-exactly (class
    boundaries at 1000/2000 and the epfree threshold included)."""
    import numpy as np

    from fiesta_tpu import FiestaConfig
    from fiesta_tpu.ops import raycast
    from fiesta_tpu.ops.pallas import fill

    cfg = FiestaConfig(resolution=0.1, origin=(0.0, 0.0, 0.0),
                       map_size=(1.6, 1.6, 0.8), max_ray_length=3.0)
    n = 16 * 16 * 8
    rng = np.random.default_rng(5)
    vals = rng.choice(
        [0.0, 999.9, 1000.0, 1000.0 + 3.1 - 1e-4, 1000.0 + 3.1,
         1999.9, 2000.0, 2002.5], size=n).astype(np.float32)
    packed = jnp.asarray(vals)

    ref = raycast._seeds_from_packed(cfg, packed.reshape(1, 16, 16, 8))

    # run the kernel via interpret on CPU (the TPU path is identical code)
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from jax.experimental import pallas as pl
    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True}))
    dec = fill.decode_packed_splat(packed, cfg.max_ray_length,
                                   cfg.resolution)
    assert dec is not None
    seeds, hit, ep = (a.reshape(1, 16, 16, 8) for a in dec)
    np.testing.assert_array_equal(np.asarray(seeds), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(ep), np.asarray(ref[2]))


def test_bitonic_sort_pairs_interpret():
    """ops/pallas/sort.sort_pairs: sorted keys, preserved pair multiset,
    duplicates and drop-sentinel handling (interpret mode)."""
    import collections

    from fiesta_tpu.ops.pallas.sort import sort_pairs

    rng = np.random.default_rng(3)
    for n in (256, 1000, 4096):
        keys = rng.integers(0, 1 << 25, n).astype(np.int32)
        keys[rng.integers(0, n, n // 5)] = 777     # heavy duplicates
        keys[: n // 9] = 1 << 25                   # drop sentinels
        vals = rng.random(n).astype(np.float32)
        ko, vo = sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                            interpret=True)
        ko, vo = np.asarray(ko), np.asarray(vo)
        assert np.all(np.diff(ko) >= 0)
        assert np.array_equal(np.sort(ko), np.sort(keys))
        a = collections.Counter(zip(keys.tolist(), vals.tolist()))
        assert a == collections.Counter(zip(ko.tolist(), vo.tolist()))
        # sentinels sort last: the scatter's mode="drop" still drops them
        assert (ko[-(n // 9):] == 1 << 25).all()
