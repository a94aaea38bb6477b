"""Pallas TPU kernel: in-place saturating region-add for scan counters.

The mapping tick accumulates each scan's carve-box counter contributions
into the full-grid uint8 hit/miss counters.  The XLA form (a chain of
dynamic-slice + dynamic-update-slice pairs) lowers to a FULL-GRID
elementwise select pass per update — measured ~1.4 ms fixed per chain on
the cow grid regardless of dtype, op count, region size, or alignment
(round-3 experiments: u8/u16/u32/i32 packings, scatter-with-window, and
static offsets all land at 2.4-2.9 ms/tick), i.e. element-rate-bound on
12.8 M selects, ~10x the bytes actually touched.

This kernel does what the operation actually is: DMA the affected grid
rows to VMEM, add the box, DMA them back — in place via
input_output_aliases, so HBM traffic is exactly the box regions
(read + write), ~80 MB/tick at cow scale instead of full-grid selects.

Mosaic's DMA window rules shape the layout: windows on tiled dims need
tile-aligned offsets and extents, so the (y, z) dims are FLATTENED into
one contiguous minor dim (a y-row window [sy, sy+by) x full z is the
contiguous flat range [sy*gz, (sy+by)*gz)).  With the carve box spanning
full z, box y extent a multiple of 8, y starts 8-aligned (both arranged
by ops.raycast's box placement) and gz % 16 == 0, the flat offset
(sy*gz, computed in-kernel as (sy/8)*(8*gz) so alignment is PROVABLE)
and extent (by*gz) are multiples of 128.  Callers fall back to the XLA
path when the constraints don't hold (ops.raycast.apply_box_counts).

Semantics: sequential per-scan saturating adds, bit-identical to
``_sat_add_u8`` chains (sequential grid walk; saturation per scan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_U8_PROBE = None


def _u8_vector_sat_add_supported() -> bool:
    """Feature-probe: can Mosaic legalize vector uint8 add + compare +
    select inside a Pallas kernel?  If so the region-add runs u8-native
    (3 ops: add, wrap-compare, select) instead of through int32
    conversions (5 ops incl. two converts) — the kernel is compute-bound,
    not DMA-bound, so op count is the cost.  Saturation via wrap
    detection (s = a + b; s < a iff the u8 add wrapped) is bit-identical
    to min(a + b, 255) in a wide type for non-negative increments.
    Probed eagerly (jax.ensure_compile_time_eval) so a first call while
    tracing cannot cache a spurious False."""
    global _U8_PROBE
    if _U8_PROBE is not None:
        return _U8_PROBE
    if jax.default_backend() != "tpu":
        _U8_PROBE = False
        return False
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(x_ref, o_ref):
            a = x_ref[:, :]
            s = a + jnp.uint8(10)
            o_ref[:, :] = jnp.where(s < a, jnp.uint8(255), s)

        with jax.ensure_compile_time_eval():
            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint8),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.full((8, 128), 250, jnp.uint8))
            _U8_PROBE = bool(jax.device_get(out)[0, 0] == 255)
    except Exception:
        _U8_PROBE = False
    return _U8_PROBE


def _pick_chunk(n: int, target: int) -> int:
    """Largest multiple of 8 dividing ``n``, at most ``target`` (block
    sublane dims must be divisible by 8)."""
    b = min(n, target) // 8 * 8
    while b > 8 and n % b:
        b -= 8
    return max(b, 8)


def box_add_supported(box_shape, grid_shape) -> bool:
    """Whether the in-place kernel's layout constraints hold (see module
    docstring); apply_box_counts falls back to the XLA path otherwise.

    The gx/gy % 8 conditions mirror ``ops.raycast._aligned_box``: box
    corners are 8-aligned only on 8-aligned grids, and the kernel's
    ``start // 8`` offset rebuild silently mis-places unaligned starts —
    so reject exactly the grids where placement doesn't align."""
    bx, by, bz = box_shape
    gx, gy, gz = grid_shape
    return (bz == gz and by % 8 == 0 and bx % 8 == 0
            and gx % 8 == 0 and gy % 8 == 0 and gz % 16 == 0)


def box_add_inplace(cnt_hit, cnt_miss, starts, boxes_hit, boxes_miss,
                    interpret: bool = False, force_u8: bool = False):
    """cnt[sx:sx+bx, sy:sy+by, :] (+)= box[k], saturating at 255, for each
    scan k in order; both counters in one kernel (shared grid walk).

    cnt_*: u8 [X,Y,Z] (donated; aliased in place).
    starts: i32 [K,3]; x/y entries 8-aligned, z entries 0 (full-z box).
    boxes_*: u8 [K,bx,by,bz] with bz == Z and bx, by % 8 == 0.
    Returns (new_hit, new_miss).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gx, gy, gz = cnt_hit.shape
    k, bx, by, bz = boxes_hit.shape
    assert box_add_supported((bx, by, bz), (gx, gy, gz))
    u8_native = force_u8 or (not interpret
                             and _u8_vector_sat_add_supported())
    ch = _pick_chunk(bx, 80)
    n_chunks = bx // ch
    w = by * gz                       # flat window extent (multiple of 128)

    # (sx/8, sy/8) per k: the kernel rebuilds offsets by multiplying the
    # tile counts back up, so Mosaic can PROVE tile alignment (x is the
    # SUBLANE dim of the flattened 2-D view, y*gz the lane dim)
    sflat = jnp.stack(
        [starts[:, 0] // 8, starts[:, 1] // 8], axis=1
    ).reshape(-1).astype(jnp.int32)

    cnt_h2 = cnt_hit.reshape(gx, gy * gz)
    cnt_m2 = cnt_miss.reshape(gx, gy * gz)
    bh2 = boxes_hit.reshape(k, bx, w)
    bm2 = boxes_miss.reshape(k, bx, w)

    def kernel(starts_ref, hit_hbm, miss_hbm, bh_ref, bm_ref,
               out_h, out_m, vh, vm, sem_h, sem_m):
        ki = pl.program_id(0)
        ci = pl.program_id(1)
        y0 = starts_ref[2 * ki + 1] * (8 * gz)   # provably 128-aligned
        x0 = (starts_ref[2 * ki] + ci * (ch // 8)) * 8   # provably 8-aligned

        win_h = out_h.at[pl.ds(x0, ch), pl.ds(y0, w)]
        win_m = out_m.at[pl.ds(x0, ch), pl.ds(y0, w)]
        cp_h = pltpu.make_async_copy(win_h, vh, sem_h)
        cp_m = pltpu.make_async_copy(win_m, vm, sem_m)
        cp_h.start()
        cp_m.start()
        cp_h.wait()
        cp_m.wait()

        if u8_native:
            a, b = vh[:], bh_ref[0]
            s = a + b
            vh[:] = jnp.where(s < a, jnp.uint8(255), s)
            a, b = vm[:], bm_ref[0]
            s = a + b
            vm[:] = jnp.where(s < a, jnp.uint8(255), s)
        else:
            vh[:] = jnp.minimum(
                vh[:].astype(jnp.int32) + bh_ref[0].astype(jnp.int32), 255
            ).astype(jnp.uint8)
            vm[:] = jnp.minimum(
                vm[:].astype(jnp.int32) + bm_ref[0].astype(jnp.int32), 255
            ).astype(jnp.uint8)

        cp_h = pltpu.make_async_copy(vh, win_h, sem_h)
        cp_m = pltpu.make_async_copy(vm, win_m, sem_m)
        cp_h.start()
        cp_m.start()
        cp_h.wait()
        cp_m.wait()

    box_spec = pl.BlockSpec((1, ch, w),
                            lambda ki, ci, s_ref: (ki, ci, 0),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k, n_chunks),
        in_specs=[any_spec, any_spec, box_spec, box_spec],
        out_specs=(any_spec, any_spec),
        scratch_shapes=[
            pltpu.VMEM((ch, w), jnp.uint8),
            pltpu.VMEM((ch, w), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_h, out_m = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((gx, gy * gz), jnp.uint8),
                   jax.ShapeDtypeStruct((gx, gy * gz), jnp.uint8)),
        input_output_aliases={1: 0, 2: 1},   # cnt_hit->out_h, cnt_miss->out_m
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sflat, cnt_h2, cnt_m2, bh2, bm2)
    return (out_h.reshape(gx, gy, gz), out_m.reshape(gx, gy, gz))
