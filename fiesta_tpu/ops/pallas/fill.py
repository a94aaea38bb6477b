"""Pallas TPU kernel: bandwidth-rate zero-fill for large scatter targets.

The endpoint splat scatters ~150k packed observations into a fresh
K x BX*BY*BZ f32 target every tick (ops.raycast._scanline_seeds_batch).
XLA materializes the `jnp.zeros` operand as a full elementwise pass at
the TPU's element rate (~9 Gelem/s) — measured ~1.2 ms for the 11.2
M-element cow-scale target (PERF.md round-3 ablation), ~10x the cost of
actually writing the bytes.  The same element-rate wall the boxadd
kernel killed for the counter apply.

This kernel emits the zeros as plain vector stores + DMA: HBM sees one
stream of zero bytes at write bandwidth.  The scatter then updates the
buffer; XLA aliases the (single-use) kernel output into the scatter
in-place, so no extra copy pass appears (verified in the optimized HLO:
the fusion consuming this custom-call is the scatter itself).

Falls back to `jnp.zeros` off-TPU or when the element count doesn't
factor into legal tiles (callers never need to care).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _chunk_rows(rows: int, target: int) -> int:
    """Largest divisor of ``rows`` that is a multiple of 8 and <= target
    (f32 tiles are (8, 128): block sublane counts must divide out)."""
    b = min(rows, target) // 8 * 8
    while b >= 8:
        if rows % b == 0:
            return b
        b -= 8
    return 0


def zeros_f32(n: int) -> jax.Array:
    """A length-``n`` f32 zero vector, written at HBM bandwidth on TPU.

    Semantically identical to ``jnp.zeros((n,), jnp.float32)``.
    """
    if jax.default_backend() != "tpu" or n % 128:
        return jnp.zeros((n,), jnp.float32)
    rows = n // 128
    ch = _chunk_rows(rows, 4096)
    if not ch:
        return jnp.zeros((n,), jnp.float32)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)

    out = pl.pallas_call(
        kernel,
        grid=(rows // ch,),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        out_specs=pl.BlockSpec((ch, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )()
    return out.reshape(n)


def decode_packed_splat(packed_flat: jax.Array, max_ray: float,
                        res: float):
    """Decode the endpoint splat's packed class+range scatter result into
    (seeds f32, hit u8, epfree u8), all flat [N].

    Bit-identical to ``ops.raycast._seeds_from_packed`` (same comparisons
    and arithmetic), executed as one Pallas pass: the XLA form is a
    full-box elementwise pass over ~11 M elements at the TPU's element
    rate (~1.2 ms at cow scale); the kernel runs at HBM bandwidth.
    Falls back to None off-TPU / on shape constraints (caller keeps the
    XLA path).
    """
    n = packed_flat.shape[0]
    if jax.default_backend() != "tpu" or n % 128:
        return None
    rows = n // 128
    ch = _chunk_rows(rows, 2048)
    if not ch:
        return None
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    thr = np.float32(max_ray + res - 1e-4)

    def kernel(p_ref, seeds_o, hit_o, ep_o):
        p = p_ref[:]
        hit = p >= 2000.0
        freeish = jnp.logical_and(p >= 1000.0, p < 2000.0)
        seeds_o[:] = jnp.where(
            hit, p - 2000.0, jnp.where(freeish, p - 1000.0, 0.0))
        hit_o[:] = hit.astype(jnp.uint8)
        ep_o[:] = jnp.logical_and(
            freeish, p - 1000.0 >= thr).astype(jnp.uint8)

    spec = pl.BlockSpec((ch, 128), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(rows // ch,),
        in_specs=[spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
        ),
    )(packed_flat.reshape(rows, 128))
    return tuple(o.reshape(n) for o in out)

