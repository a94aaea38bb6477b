"""Pallas TPU kernel: VMEM-resident bitonic sort of (u32 key, f32 val).

Why: XLA:TPU's scatter has a sorted-indices fast path (~4 ms cheaper at
the splat's 147k updates — profile_splat.py rows b vs c-minus-d), but
``lax.sort`` costs about what the flag saves (r2 negative result).  The
whole pair array is ~2 MB — it fits VMEM outright, so a bitonic network
sorts it in one kernel with NO HBM traffic between stages: log2(N) *
(log2(N)+1) / 2 compare-exchange stages, each a pair of static cyclic
rolls + a select (XOR-partner trick below), all VPU work.

XOR-partner via cyclic rolls: stage distance d pairs i with i^d.  For
i & d == 0 the partner is i + d; else i - d.  A cyclic roll by -d reads
i + d and by +d reads i - d, and since XOR never crosses the array end
for power-of-two N, selecting between the two rolls by the (i & d) bit
yields exactly the partner value — lane rolls for d < 128, sublane/row
rolls for d >= 128 (the array lives as [N/128, 128]).

Sort is on KEYS only; equal keys keep an arbitrary value order, which is
correct here because the consumer is a scatter-MAX (commutative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

#: max supported element count (VMEM budget: N * 8 B plus partners;
#: 2^21 pairs = 16 MB working set)
_MAX_N = 1 << 21


def supported(n: int) -> bool:
    return jax.default_backend() == "tpu" and n <= _MAX_N


def _roll2(x, d: int):
    """Cyclic roll of the flattened [R, 128] array by +-d linear
    positions (d a power of two): lane roll below 128, row roll above.
    Returns (fwd, bwd) = values at i + d and i - d."""
    from jax.experimental.pallas import tpu as pltpu

    r = x.shape[0]
    if d < 128:
        fwd = pltpu.roll(x, (-d) % 128, axis=1)
        bwd = pltpu.roll(x, d, axis=1)
    else:
        e = d // 128
        fwd = pltpu.roll(x, (-e) % r, axis=0)
        bwd = pltpu.roll(x, e, axis=0)
    return fwd, bwd


def sort_pairs(keys: jax.Array, vals: jax.Array, interpret: bool = False):
    """Sort (keys u32/i32 [N], vals f32 [N]) ascending by key.

    N pads internally to the next power of two >= 256 with key
    0x7fffffff sentinels (callers' drop sentinels must stay below).
    Returns (sorted_keys [N], sorted_vals [N]) — the original N entries
    in key order (sentinel pad is sliced off; keys < sentinel keep their
    multiset).  Returns None if unsupported (caller keeps lax.sort or
    the unsorted scatter).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = keys.shape[0]
    if not interpret and not supported(n):
        return None
    n_pad = max(256, 1 << int(np.ceil(np.log2(n))))
    rows = n_pad // 128
    logn = int(np.log2(n_pad))
    sent = np.int32(0x7FFFFFFF)

    def kernel(k_ref, v_ref, ko_ref, vo_ref):
        k = k_ref[:]                               # [R, 128] i32
        v = v_ref[:]
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        i = ri * 128 + ci
        for s in range(1, logn + 1):               # block size 2^s
            # the final merge (s == logn) sorts the whole array
            # ascending: (i >> logn) & 1 == 0 everywhere, no special case
            for j in range(s - 1, -1, -1):
                d = 1 << j
                low = (i & d) == 0
                kf, kb = _roll2(k, d)
                vf, vb = _roll2(v, d)
                pk = jnp.where(low, kf, kb)
                pv = jnp.where(low, vf, vb)
                # keep the smaller key at the low partner of an
                # ascending block (and the converse elsewhere).  NB all
                # on int compares + mask algebra: Mosaic cannot compare
                # two i1 vectors ("unsupported bitwidth for truncation")
                want_min = ((i >> j) & 1) == ((i >> s) & 1)
                take_p = ((want_min & (pk < k))
                          | (jnp.logical_not(want_min) & (pk > k)))
                k = jnp.where(take_p, pk, k)
                v = jnp.where(take_p, pv, v)
        ko_ref[:] = k
        vo_ref[:] = v

    kp = jnp.full((n_pad,), sent, jnp.int32).at[:n].set(
        keys.astype(jnp.int32))
    vp = jnp.zeros((n_pad,), jnp.float32).at[:n].set(vals)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ko, vo = pl.pallas_call(
        kernel,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                   jax.ShapeDtypeStruct((rows, 128), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kp.reshape(rows, 128), vp.reshape(rows, 128))
    return ko.reshape(-1)[:n].astype(keys.dtype), vo.reshape(-1)[:n]
