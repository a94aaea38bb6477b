"""Pallas TPU kernel: batched octant wavefront sweep for free-space carving.

The carve propagates max observation range from endpoint seeds toward the
sensor, one slab at a time along the dominant axis (see
``ops.raycast.carve_free_mask_batch`` for the geometry and the reference
semantics it reproduces — RaycastProcess, include/Fiesta.h:194-278).

Why a kernel: the sweep is a first-order recurrence over slabs, so XLA
materializes every shifted/masked intermediate in HBM — ~19 HBM touches per
voxel per slab step, making the carve bandwidth-bound at ~20 ms per update
batch.  Here the recurrence carry lives in VMEM scratch; each grid step
streams one seed slab in and one result slab out (the algorithmic minimum
HBM traffic) and does the 9 fractional-tap max-selects entirely on the VPU.

The forward (toward -axis) and reverse (toward +axis) wavefronts of the
same scan share each grid step: block index maps walk the forward seeds
ascending and the reverse seeds descending, so both carries advance
far -> near in one serial grid pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _shift_edge0(c, d: int, axis: int, size: int):
    """Shifted copy out[i] = c[i + d] along ``axis`` with zero fill."""
    from jax.experimental.pallas import tpu as pltpu

    if d == 0:
        return c
    rolled = pltpu.roll(c, (-d) % size, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, c.shape, axis)
    ok = idx < (size - d) if d > 0 else idx >= (-d)
    return jnp.where(ok, rolled, 0.0)


def _taps(c, f2, f3, c2: int, c3: int):
    """Max over the 4 cells bracketing per-voxel LOS offsets.

    c [B, C2, C3] carry; f2 [B, C2], f3 [B, C3] fractional offsets in
    (-1, 1) within the octant.  Identical semantics to
    ``ops.raycast._taps_max_b``.
    """
    # minor-dim insertion happens on f32 (Mosaic cannot reshape i1 vectors)
    b2 = jnp.floor(f2)[:, :, None]
    b3 = jnp.floor(f3)[:, None, :]
    t = jnp.zeros_like(c)
    for d in (-1, 0, 1):
        m = (b2 == d) | (b2 == d - 1)
        t = jnp.maximum(t, jnp.where(m, _shift_edge0(c, d, 1, c2), 0.0))
    out = jnp.zeros_like(c)
    for d in (-1, 0, 1):
        m = (b3 == d) | (b3 == d - 1)
        out = jnp.maximum(out, jnp.where(m, _shift_edge0(t, d, 2, c3), 0.0))
    return out


@partial(jax.jit, static_argnames=())
def wavefront_sweep_pallas(seeds_f, seeds_r, po_a, o2, o3):
    """Fused forward+reverse wavefront sweep.

    seeds_f/seeds_r: [B, A, C2, C3] f32 octant-masked seeds in natural axis
      order; element b of both batches belongs to the same (scan,
      orientation) pair.  Forward propagates from low axis indices upward
      (negative octant: the far side is index 0); reverse the opposite.
    po_a: [1, B] f32 sensor coordinate along the scan axis per pair.
    o2: [B, C2] f32, o3: [B, C3] f32 — trailing-axis offsets from sensor.
    Returns (w_f, w_r): [B, A, C2, C3] propagated max observation range.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, a, c2, c3 = seeds_f.shape

    def kernel(sf_ref, sr_ref, po_ref, o2_ref, o3_ref,
               wf_ref, wr_ref, cf, cr):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            cf[:] = jnp.zeros_like(cf)
            cr[:] = jnp.zeros_like(cr)

        o2v = o2_ref[:]
        o3v = o3_ref[:]
        po = po_ref[0, :]                        # [B]
        gf = g.astype(jnp.float32)
        for sref, idx, wref, carry in (
            (sf_ref, gf, wf_ref, cf),
            (sr_ref, jnp.float32(a - 1) - gf, wr_ref, cr),
        ):
            d = jnp.maximum(jnp.abs(idx - po), 0.5)   # [B]
            f2 = o2v / d[:, None]
            f3 = o3v / d[:, None]
            new = jnp.maximum(
                sref[:].reshape(b, c2, c3), _taps(carry[:], f2, f3, c2, c3)
            )
            carry[:] = new
            wref[:] = new.reshape(b, 1, c2, c3)

    slab = pl.BlockSpec((b, 1, c2, c3), lambda g: (0, g, 0, 0),
                        memory_space=pltpu.VMEM)
    slab_rev = pl.BlockSpec((b, 1, c2, c3), lambda g: (0, a - 1 - g, 0, 0),
                            memory_space=pltpu.VMEM)
    full2 = lambda shape: pl.BlockSpec(shape, lambda g: (0, 0),
                                       memory_space=pltpu.VMEM)

    w_f, w_r = pl.pallas_call(
        kernel,
        grid=(a,),
        out_shape=(
            jax.ShapeDtypeStruct((b, a, c2, c3), jnp.float32),
            jax.ShapeDtypeStruct((b, a, c2, c3), jnp.float32),
        ),
        in_specs=[slab, slab_rev, full2((1, b)),
                  full2((b, c2)), full2((b, c3))],
        out_specs=(slab, slab_rev),
        scratch_shapes=[
            pltpu.VMEM((b, c2, c3), jnp.float32),
            pltpu.VMEM((b, c2, c3), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seeds_f, seeds_r, po_a, o2, o3)
    return w_f, w_r
