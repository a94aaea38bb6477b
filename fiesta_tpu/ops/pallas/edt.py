"""Pallas TPU kernel: exact truncated Euclidean distance transform.

The production ESDF path.  Where the reference maintains distances
*incrementally* (queues + linked lists, src/ESDFMap.cpp:273-398) because CPU
recomputation is unaffordable, on TPU a full exact rebuild is a fixed-cost
streaming computation:

    d2[v] = min_{|j - v|_inf <= T} (0 if occupied[j]) + |v - j|^2

computed with the separable min-plus decomposition — one windowed 1-D pass
per axis:

    pass_axis(f)[i] = min_{|d| <= T}  f[i + d] + d^2

Each pass is a Pallas kernel: a column block lives in VMEM and the window
loop is two VPU ops (add + min) per offset — no gathers, no scatters, no
linked lists.  Cost is exactly (2T+1) * N adds+mins per axis, independent of
scene content; with T = max_ray_length the whole cow_and_lady grid rebuilds
in a few milliseconds, giving a *hard real-time* ESDF update (the reference's
incremental update time varies with the change set).

Truncation semantics: distances are exact up to T voxels (any true nearest
obstacle within L_inf radius T is found); beyond that the result reads as
infinity.  This is *more* accurate than the reference within T (its
24-neighbor BFS overestimates, ESDFMap.cpp:940-975 measures its own error)
and intentionally truncated beyond T (planners consume distances well under
the sensor range).  The unbounded queue-semantics path remains available via
ops.esdf.update_esdf.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...grid import INF_D2

# plain Python int: jnp scalars would be captured as constants inside
# pallas kernels, which pallas_call rejects
_INF_EDT = 1 << 20


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    b = min(n, target)
    while n % b:
        b -= 1
    return b


# int16 variant: when T^2 <= _I16_INF the whole transform fits in int16 —
# VPU processes 2x the lanes per cycle.  Values: inputs clamped to
# _I16_INF (20000); one pass adds at most T^2 (<= 10000) => max 30000
# < 32767, no overflow.
_I16_INF = 20000
_I16_T_MAX = 100  # T^2 <= 10000


def _i16_vector_min_supported() -> bool:
    """Feature-probe: can Mosaic on this toolchain legalize vector int16
    min/add inside a Pallas kernel?  Round-2 toolchains could not
    ("failed to legalize operation 'arith.minsi'" on vector<...xi16>);
    when a toolchain lands support, the windowed min-plus passes
    auto-switch to int16 for t <= _I16_T_MAX (2x VPU lanes).  Cached per
    process; False on non-TPU backends and on any compile/run failure.

    The probe runs under ``jax.ensure_compile_time_eval`` so it executes
    EAGERLY even when first reached while tracing a jitted caller —
    otherwise the pallas output is a tracer, ``device_get`` raises, and
    the blanket except would cache a spurious False (ADVICE r3)."""
    global _I16_PROBE
    if _I16_PROBE is not None:
        return _I16_PROBE
    if jax.default_backend() != "tpu":
        _I16_PROBE = False
        return False
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(x_ref, o_ref):
            a = x_ref[:, :]
            o_ref[:, :] = jnp.minimum(a + np.int16(3), a)

        with jax.ensure_compile_time_eval():
            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.ones((8, 128), jnp.int16))
            _I16_PROBE = bool(jax.device_get(out)[0, 0] == 1)
    except Exception:
        _I16_PROBE = False
    return _I16_PROBE


_I16_PROBE = None


def _minplus_pass_pallas(f: jax.Array, t: int,
                         interpret: bool = False) -> jax.Array:
    """One windowed min-plus pass along the LEADING axis of [A, M, L].

    The trailing dims are independent columns, so they are flattened to one
    lane axis and padded to a multiple of 128 — full VPU lane utilization
    regardless of the grid's Z extent (Z=80 would otherwise waste 38% of
    every vector op).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a, m, l = f.shape
    t = min(t, a - 1)
    dtype = f.dtype
    inf = _I16_INF if dtype == jnp.int16 else _INF_EDT

    r = m * l
    # 128 lanes: Mosaic rejects wider slab vector.loads (400x512 fails)
    bl = 128
    rpad = -r % bl
    f2 = f.reshape(a, r)
    if rpad:
        f2 = jnp.pad(f2, ((0, 0), (0, rpad)),
                     constant_values=np.asarray(inf, dtype))
    rp = r + rpad

    def kernel(f_ref, out_ref, buf):
        # window padding lives in VMEM scratch (an HBM-side jnp.pad would
        # round-trip the whole volume once more per pass); the constant
        # inf pads persist across grid steps, fill them once
        @pl.when(pl.program_id(0) == 0)
        def _():
            buf[pl.ds(0, t), :] = jnp.full((t, bl), inf, dtype)
            buf[pl.ds(t + a, t), :] = jnp.full((t, bl), inf, dtype)

        blk = f_ref[:, :]
        buf[pl.ds(t, a), :] = blk

        # content skip: a block whose every input is "far" (>= inf) stays
        # far — write inf and skip the whole window loop.  One block-min
        # costs ~1/3 of a single tap; truncated scenes leave most of the
        # volume far, so this trades a cheap test for the t-tap loop.
        all_far = jnp.min(blk) >= np.asarray(inf, dtype)

        @pl.when(all_far)
        def _():
            out_ref[:, :] = jnp.full((a, bl), inf, dtype)

        @pl.when(jnp.logical_not(all_far))
        def _():
            # symmetric pairing: offsets +-k share one k^2 add (min of the
            # two shifted slabs first) — 3 VPU ops per pair instead of 4.
            # The window loop is a STATIC python unroll, not a fori_loop: a
            # traced loop index makes every tap a dynamic sublane slice,
            # which Mosaic lowers with a per-iteration runtime shuffle —
            # measured 4.54 -> 3.56 ms per pass at t=100 (cow grid) from
            # this change alone.  (Going further — mod-8 residue-rolled
            # scratch copies so every tap is sublane-aligned — measured NO
            # further gain: static constant-offset shuffles are already
            # cheap, see PERF.md.)
            acc = buf[pl.ds(t, a), :]
            np_dtype = np.int16 if dtype == jnp.int16 else np.int32
            for k in range(1, t + 1):
                lo = buf[pl.ds(t - k, a), :]
                hi = buf[pl.ds(t + k, a), :]
                acc = jnp.minimum(acc,
                                  jnp.minimum(lo, hi) + np_dtype(k * k))
            out_ref[:, :] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((a, rp), dtype),
        grid=(rp // bl,),
        in_specs=[
            pl.BlockSpec((a, bl), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (a, bl), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((a + 2 * t, bl), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f2)
    return out[:, :r].reshape(a, m, l)


def _binary_pass_pallas(f: jax.Array, t: int,
                        interpret: bool = False,
                        square: bool = True) -> jax.Array:
    """First min-plus pass specialized to BINARY input (0 / INF).

    For binary seeds the parabola pass equals (L1 distance to the nearest
    seed)^2, and L1 distance is a min-plus with the |d| kernel — which,
    unlike the parabola, composes: applying shifts 1, 2, 4, ... 2^k covers
    every offset up to 2^(k+1)-1 (binary decomposition).  O(log t) doubling
    steps instead of t window steps.

    ``square=False`` emits the RAW L1 distance (clamped to t+1) instead of
    the squared/truncated form — the composable quantity the sharded
    engine exchanges across shard boundaries (see
    parallel/sharding._compose_l1_x) before squaring.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a, m, l = f.shape
    # sent: "no seed within t" sentinel for the raw form — the CALLER's t,
    # not the axis-clamped reach (a shard narrower than t must not report
    # its clamped reach as a genuine distance; sharding composition bug)
    sent = t + 1
    t = min(t, a - 1)
    shifts = []
    s, reach = 1, 0
    while reach < t:
        shifts.append(s)
        reach += s
        s *= 2
    pad = shifts[-1]

    r = m * l
    bl = 128
    rpad = -r % bl
    f2 = f.reshape(a, r)
    if rpad:
        f2 = jnp.pad(f2, ((0, 0), (0, rpad)),
                     constant_values=np.asarray(_INF_EDT, f.dtype))
    rp = r + rpad

    def kernel(f_ref, out_ref, buf):
        @pl.when(pl.program_id(0) == 0)
        def _():
            buf[pl.ds(0, pad), :] = jnp.full((pad, bl), _INF_EDT,
                                             jnp.int32)
            buf[pl.ds(pad + a, pad), :] = jnp.full((pad, bl), _INF_EDT,
                                                   jnp.int32)

        blk = f_ref[:, :]
        all_far = jnp.min(blk) >= np.int32(_INF_EDT)  # no seed: skip
        far_out = np.int32(_INF_EDT if square else sent)

        @pl.when(all_far)
        def _():
            out_ref[:, :] = jnp.full((a, bl), far_out, jnp.int32)

        @pl.when(jnp.logical_not(all_far))
        def _():
            # clamp the in-kernel working values to the LOCAL reach +1 so
            # additions stay small; positions past the local reach emit
            # the caller-level sentinel below
            buf[pl.ds(pad, a), :] = jnp.minimum(blk, np.int32(t + 1))
            for sh in shifts:
                g = buf[pl.ds(pad, a), :]
                lo = buf[pl.ds(pad - sh, a), :]
                hi = buf[pl.ds(pad + sh, a), :]
                buf[pl.ds(pad, a), :] = jnp.minimum(
                    g, jnp.minimum(lo, hi) + sh)
            d = buf[pl.ds(pad, a), :]
            if square:
                out_ref[:, :] = jnp.where(d > t, _INF_EDT, d * d)
            else:
                out_ref[:, :] = jnp.where(d > t, np.int32(sent), d)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((a, rp), jnp.int32),
        grid=(rp // bl,),
        in_specs=[
            pl.BlockSpec((a, bl), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((a, bl), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((a + 2 * pad, bl), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f2)
    return out[:, :r].reshape(a, m, l)


def _minplus_pass_xla(f: jax.Array, t: int) -> jax.Array:
    """Reference/fallback implementation (shift loop) for non-TPU backends."""
    a = f.shape[0]
    t = min(t, a - 1)
    fpad = jnp.pad(f, ((t, t), (0, 0), (0, 0)), constant_values=_INF_EDT)

    def body(d, acc):
        sl = jax.lax.dynamic_slice_in_dim(fpad, d, a, axis=0)
        return jnp.minimum(acc, sl + (d - t) ** 2)

    # full_like keeps the input's device-variance under shard_map
    return jax.lax.fori_loop(0, 2 * t + 1, body, jnp.full_like(f, _INF_EDT))


def _minplus_pass(f: jax.Array, t: int) -> jax.Array:
    if jax.default_backend() == "tpu":
        return _minplus_pass_pallas(f, t)
    return _minplus_pass_xla(f, t)


def binary_pass(f: jax.Array, t: int) -> jax.Array:
    """First pass specialized to binary (0 / INF) input: (L1 dist)^2,
    reading _INF_EDT beyond ``t``.  O(log t) on TPU; the XLA fallback's
    windowed pass gives identical values (beyond-t entries exceed t^2 and
    are clamped to the same infinity)."""
    if jax.default_backend() == "tpu":
        return _binary_pass_pallas(f, t)
    p = _minplus_pass_xla(f, t)
    return jnp.where(p > t * t, _INF_EDT, p)


def l1_pass(f: jax.Array, t: int) -> jax.Array:
    """Raw truncated L1 distance along the leading axis of a binary
    (0 / _INF_EDT) volume: values in [0, t+1], where t+1 means "no seed
    within t".  This is the COMPOSABLE form of the binary pass — shard
    boundaries exchange O(log) accumulated edge planes instead of T raw
    input planes (parallel/sharding._compose_l1_x), then square with
    ``square_l1``."""
    if jax.default_backend() == "tpu":
        return _binary_pass_pallas(f, t, square=False)
    sent = np.int32(t + 1)
    tl = min(t, f.shape[0] - 1)         # local reach; sentinel keeps t
    d = jnp.minimum(f, np.int32(tl + 1)).astype(jnp.int32)
    s, reach = 1, 0
    while reach < tl:
        lo = _shift_lead(d, -s, np.int32(tl + 1))
        hi = _shift_lead(d, s, np.int32(tl + 1))
        d = jnp.minimum(d, jnp.minimum(lo, hi) + np.int32(s))
        reach += s
        s *= 2
    return jnp.where(d > tl, sent, d)


def square_l1(d: jax.Array, t: int) -> jax.Array:
    """(raw L1, possibly composed across shards) -> squared/truncated form
    matching ``binary_pass`` output."""
    return jnp.where(d > t, np.int32(_INF_EDT), d * d)


@partial(jax.jit, static_argnames=("trunc_vox",))
def truncated_edt_d2(occupied: jax.Array, trunc_vox: int) -> jax.Array:
    """Exact squared EDT of ``occupied`` [X,Y,Z], truncated at ``trunc_vox``.

    Returns int32 [X,Y,Z]: exact |v - nearest obstacle|^2 (voxel units) for
    all voxels within trunc_vox of an obstacle, INF_D2 beyond.

    Runs in int32 throughout.  (int16 would double the VPU lanes for
    trunc_vox <= 100, but Mosaic on v5e cannot legalize vector
    arith.minsi on i16 — verified: "failed to legalize operation
    'arith.minsi'" for vector<...xi16> — see PERF.md negative results;
    an i16 variant would also need its own pad/infinity constants, the
    current _INF_EDT wraps in 16 bits.)
    """
    t = int(trunc_vox)
    if t <= 0:
        # degenerate truncation: only obstacle voxels are within radius 0
        return jnp.where(occupied, 0, INF_D2).astype(jnp.int32)
    dtype, inf = jnp.int32, _INF_EDT
    f = jnp.where(occupied, 0, inf).astype(dtype)

    p1 = binary_pass(f, t)                                    # [X,Y,Z]
    if t <= _I16_T_MAX and _i16_vector_min_supported():
        # 2x-lane window passes: values fit int16 (clamped at _I16_INF >
        # t^2, pass adds <= t^2 so max 30000 < 32767); exactness is
        # preserved because every beyond-truncation value stays > t^2
        p1 = jnp.minimum(p1, _I16_INF).astype(jnp.int16)
        dtype, inf = jnp.int16, _I16_INF

    def clamp(x):
        return jnp.minimum(x, np.asarray(inf, dtype))

    p2 = _minplus_pass(clamp(p1).transpose(1, 0, 2), t)       # [Y,X,Z]
    p3 = _minplus_pass(clamp(p2).transpose(2, 1, 0), t)       # [Z,X,Y]
    d2 = p3.transpose(1, 2, 0).astype(jnp.int32)
    # min() guard: for t > 1024, t^2 exceeds the internal _INF_EDT clamp
    # and "no obstacle in window" values would otherwise leak through as
    # finite 2^20 distances
    return jnp.where(d2 <= min(t * t, int(inf) - 1), d2, INF_D2)


def trunc_vox_for(resolution: float, trunc_dist: float) -> int:
    return int(math.ceil(trunc_dist / resolution))


# ---------------------------------------------------------------------------
# Closest-obstacle tracking (reference closest_obstacle_, ESDFMap.h:92-96)
# ---------------------------------------------------------------------------
#
# The reference maintains, for every voxel, the coordinates of its nearest
# obstacle (updated throughout UpdateESDF, src/ESDFMap.cpp:273-398).  The
# rebuild-mode equivalent tracks the argmin through the separable min-plus
# passes by packing it into the SAME int32 the distance rides in:
#
#     packed = val << S | payload
#
# Integer `min` on packed values is lexicographic (value first, payload as
# tie-break), so the window loops keep their exact op count: adding k^2<<S
# to a shifted slab leaves the payload bits untouched.  Per pass the payload
# grows by one coordinate:
#
#   pass 1 (binary, axis A):  payload = a*           (source row index)
#   pass 2 (window, axis B):  payload = b*<<bA | a*  (own b added in prologue)
#   pass 3 (axis C) runs as TWO half-window accumulators (negative /
#   positive offsets) so the payload never needs c* — the winning offset
#   magnitude is recovered arithmetically afterwards:
#
#       (c - c*)^2 = d2 - (a - a*)^2 - (b - b*)^2
#
#   and the accumulator that won fixes the sign.  The half windows cost
#   4 ops per offset vs the paired pass's 3 — the only extra work.
#
# Bit budget (int32): bits(2*t^2+1) + bits(A) + bits(B) <= 31, with C chosen
# as the WIDEST axis so A/B are the cheap ones.  cow_and_lady
# (400x400x80, t=100): 15 + 9 + 7 = 31.  `closest_plan` returns None when
# the budget doesn't fit and callers fall back to the d2-only transform.


def _axis_layouts(shape):
    """Candidate (a_axis, b_axis, c_axis) assignments, preferred first.

    The X-LEAD layout (a = axis 0) comes first: the sharded engine shards
    axis 0, and with the binary/L1 pass leading on it, cross-shard
    propagation composes through log-hop EDGE planes instead of T-plane
    value halos (parallel/sharding._compose_l1_x).  C is then the widest
    of the remaining axes (pays no payload bits).  The widest-C layout is
    the fallback when the x-lead budget does not fit int32."""
    bits = [max(int(n - 1).bit_length(), 1) for n in shape]
    c_of_rest = 1 if bits[1] >= bits[2] else 2
    xlead = (0, 3 - c_of_rest, c_of_rest)
    c_w = int(np.argmax(bits))
    rest = [i for i in range(3) if i != c_w]
    widest = (rest[0], rest[1], c_w)
    layouts = [xlead] if xlead == widest else [xlead, widest]
    return [(a, b, c, bits[a], bits[b]) for a, b, c in layouts]


def closest_plan(shape, trunc_vox: int):
    """Axis assignment + bit layout for argmin tracking, or None if the
    packed representation cannot fit int32 for this (shape, t)."""
    t = int(trunc_vox)
    if t <= 0:
        return None
    cap = t * t + 1                    # "beyond truncation" value sentinel
    # two budgets: mid-pass candidates (val up to 2t^2+1 over the payload)
    # and the final pass's single packed output (clamped val | sign | pay)
    vbits = max(int(2 * t * t + 1).bit_length(),
                int(cap).bit_length() + 1)
    for a_axis, b_axis, c_axis, ba, bb in _axis_layouts(shape):
        if vbits + ba + bb <= 31:
            return dict(a=a_axis, b=b_axis, c=c_axis, ba=ba, bb=bb,
                        s=ba + bb, cap=cap, t=t)
    return None


def closest_plan_wide(shape, trunc_vox: int):
    """Layout for the two-word (value, payload) closest transform — the
    fallback when ``closest_plan``'s single-int32 packing does not fit
    (large grids / truncations).  Value and payload ride separate int32
    words compared lexicographically, so the only budget left is the
    payload itself: b*<<ba | a* must fit 31 bits, and 2t^2+1 must fit a
    value word — both true for any physically plausible grid."""
    t = int(trunc_vox)
    if t <= 0 or 2 * t * t + 1 >= 2**31:
        return None
    for a_axis, b_axis, c_axis, ba, bb in _axis_layouts(shape):
        if ba + bb <= 31:
            return dict(a=a_axis, b=b_axis, c=c_axis, ba=ba, bb=bb,
                        s=ba + bb, cap=t * t + 1, t=t)
    return None


def closest_capability(shape, trunc_vox: int) -> dict:
    """THE shared answer to "can closest-obstacle tracking run on this
    (shape, truncation), and which engine" — used by config.validate(),
    pipeline.rebuild_tracks_closest, and the oracle's pack check so every
    path fails (or falls back) with the same story.

    Returns dict(packed=bool, wide=bool, oracle=bool, detail=str):
      packed — single-int32 packed argmin (Pallas production path);
      wide   — two-word XLA fallback (exact, slower);
      oracle — ops.esdf.build_esdf's value*512+index packing (axes <= 512).
    """
    t = int(trunc_vox)
    packed = closest_plan(shape, t) is not None
    wide = closest_plan_wide(shape, t) is not None
    oracle = max(shape) <= 512
    # tightest candidate layout for the report
    ba, bb = min(((la[3], la[4]) for la in _axis_layouts(shape)),
                 key=lambda p: p[0] + p[1])
    vbits = max(int(2 * t * t + 1).bit_length(),
                int(t * t + 1).bit_length() + 1) if t > 0 else 0
    detail = (
        f"shape={tuple(shape)} t={t}: packed argmin needs value {vbits} "
        f"+ payload {ba}+{bb} = {vbits + ba + bb} bits of int32 "
        f"(limit 31) -> {'fits' if packed else 'does not fit'}; "
        f"two-word fallback needs payload {ba + bb} <= 31 -> "
        f"{'fits' if wide else 'does not fit'}; "
        f"oracle packing needs max axis {max(shape)} <= 512 -> "
        f"{'fits' if oracle else 'does not fit'}"
    )
    return dict(packed=packed, wide=wide, oracle=oracle, detail=detail)


def _shift_lead(x: jax.Array, k: int, fill) -> jax.Array:
    """result[i] = x[i + k] along the leading axis, `fill` beyond the end."""
    if k == 0:
        return x
    blk = jnp.full((abs(k),) + x.shape[1:], fill, x.dtype)
    if k > 0:
        return jnp.concatenate([x[k:], blk], 0)
    return jnp.concatenate([blk, x[:k]], 0)


def _binary_packed_xla(occ: jax.Array, plan,
                       square: bool = True) -> jax.Array:
    """Packed binary first pass along the LEADING axis (XLA fallback).

    occ: [A, M, L] bool/int.  Returns packed int32 (val<<ba | a*) with
    val = (L1 distance)^2 clamped to cap beyond t — or, with
    ``square=False``, the RAW packed L1 (l1<<ba | a*, l1 clamped to t+1):
    the composable cross-shard form (payload rides the lexicographic min
    unchanged through the composition)."""
    a = occ.shape[0]
    sent = plan["t"] + 1                # caller-level "no seed" sentinel
    t = min(plan["t"], a - 1)           # local reach
    ba, cap = plan["ba"], plan["cap"]
    l1inf = np.int32(t + 1)
    iota = jnp.arange(a, dtype=jnp.int32).reshape(
        (a,) + (1,) * (occ.ndim - 1))
    packed = jnp.where(occ > 0, 0, jnp.int32(l1inf) << ba) | iota
    fill = np.int32(int(l1inf) << ba)
    s, reach = 1, 0
    while reach < t:
        lo = _shift_lead(packed, -s, fill)
        hi = _shift_lead(packed, s, fill)
        packed = jnp.minimum(packed, jnp.minimum(lo, hi) + (s << ba))
        reach += s
        s *= 2
    d = packed >> ba
    astar = packed & ((1 << ba) - 1)
    if not square:
        return jnp.where(d > t, (np.int32(sent) << ba) | astar, packed)
    val = jnp.where(d > t, np.int32(cap), d * d)
    return (val << ba) | astar


def square_packed_l1(packed: jax.Array, plan) -> jax.Array:
    """(raw packed L1, possibly composed across shards) -> the squared
    packed form every downstream pass consumes (val<<ba | a*)."""
    ba, cap, t = plan["ba"], plan["cap"], plan["t"]
    d = packed >> ba
    astar = packed & ((1 << ba) - 1)
    val = jnp.where(d > t, np.int32(cap), d * d)
    return (val << ba) | astar


def _window_packed_xla(p1: jax.Array, plan) -> jax.Array:
    """Packed paired window pass along the LEADING axis (XLA fallback).

    p1: [B, M, L] packed (val<<ba | a*).  Returns (val<<s | b*<<ba | a*)
    with val clamped to cap."""
    b = p1.shape[0]
    t = min(plan["t"], b - 1)
    ba, s, cap = plan["ba"], plan["s"], plan["cap"]
    iota = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (p1.ndim - 1))
    v = p1 >> ba
    astar = p1 & ((1 << ba) - 1)
    packed = (v << s) | (iota << ba) | astar
    fill = np.int32(int(cap) << s)
    acc = packed
    for k in range(1, t + 1):
        lo = _shift_lead(packed, -k, fill)
        hi = _shift_lead(packed, k, fill)
        acc = jnp.minimum(acc, jnp.minimum(lo, hi) + ((k * k) << s))
    v2 = jnp.minimum(acc >> s, np.int32(cap))
    return (v2 << s) | (acc & ((1 << s) - 1))


def _split_packed_xla(p2: jax.Array, plan) -> jax.Array:
    """Split-sign final pass along the LEADING axis (XLA fallback).

    Returns ONE packed i32 [C,M,L]: val<<(s+1) | sign<<s | b*<<ba | a*,
    with val clamped to ``cap`` (values past truncation are invalid
    anyway) so the word fits 31 bits — one output array instead of two
    halves the pass's HBM writes.  sign=1 means the winning obstacle sits
    at HIGHER c than the voxel."""
    c = p2.shape[0]
    t = min(plan["t"], c - 1)
    s, cap = plan["s"], plan["cap"]
    fill = np.int32(int(cap) << s)
    acc_n = p2
    acc_p = p2
    for k in range(1, t + 1):
        kk = (k * k) << s
        acc_n = jnp.minimum(acc_n, _shift_lead(p2, -k, fill) + kk)
        acc_p = jnp.minimum(acc_p, _shift_lead(p2, k, fill) + kk)
    vn, vp = acc_n >> s, acc_p >> s
    use_p = vp < vn
    val = jnp.minimum(jnp.minimum(vn, vp), np.int32(cap))
    mask_s = (1 << s) - 1
    pay = jnp.where(use_p, acc_p & mask_s, acc_n & mask_s)
    return (val << (s + 1)) | (use_p.astype(jnp.int32) << s) | pay


def _binary_packed_pallas(occ: jax.Array, plan,
                          interpret: bool = False,
                          square: bool = True) -> jax.Array:
    """Pallas twin of ``_binary_packed_xla`` (doubling steps in VMEM)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a, m, l = occ.shape
    sent = plan["t"] + 1                # caller-level "no seed" sentinel
    t = min(plan["t"], a - 1)           # local reach
    ba, cap = plan["ba"], plan["cap"]
    l1inf = t + 1
    fill = np.int32(l1inf << ba)
    shifts = []
    sft, reach = 1, 0
    while reach < t:
        shifts.append(sft)
        reach += sft
        sft *= 2
    pad = shifts[-1]

    r = m * l
    bl = 128
    rpad = -r % bl
    f2 = occ.reshape(a, r).astype(jnp.uint8)
    if rpad:
        f2 = jnp.pad(f2, ((0, 0), (0, rpad)))
    rp = r + rpad

    def kernel(f_ref, out_ref, buf):
        @pl.when(pl.program_id(0) == 0)
        def _():
            buf[pl.ds(0, pad), :] = jnp.full((pad, bl), fill, jnp.int32)
            buf[pl.ds(pad + a, pad), :] = jnp.full((pad, bl), fill,
                                                   jnp.int32)

        iota = jax.lax.broadcasted_iota(jnp.int32, (a, bl), 0)
        occ_blk = f_ref[:, :]
        # content skip: no seed in the block => every column stays far
        # (val=cap, payload=own row, exactly what the loop would produce).
        # i32 convert first: Mosaic has no unsigned reductions.
        none_occ = jnp.max(occ_blk.astype(jnp.int32)) == 0

        @pl.when(none_occ)
        def _():
            out_ref[:, :] = np.int32(
                (cap if square else sent) << ba) | iota

        @pl.when(jnp.logical_not(none_occ))
        def _():
            # arithmetic select (occ is {0,1}): Mosaic rejects a vselect
            # whose branches are both scalar splats ("invalid relayout ...
            # replicated in destination but not in source")
            free = np.int32(1) - occ_blk.astype(jnp.int32)
            buf[pl.ds(pad, a), :] = free * np.int32(l1inf << ba) + iota
            for sh in shifts:
                g = buf[pl.ds(pad, a), :]
                lo = buf[pl.ds(pad - sh, a), :]
                hi = buf[pl.ds(pad + sh, a), :]
                buf[pl.ds(pad, a), :] = jnp.minimum(
                    g, jnp.minimum(lo, hi) + np.int32(sh << ba))
            p = buf[pl.ds(pad, a), :]
            astar = p & np.int32((1 << ba) - 1)
            d = p >> ba
            if square:
                val = jnp.where(d > t, np.int32(cap), d * d)
                out_ref[:, :] = (val << ba) | astar
            else:
                out_ref[:, :] = jnp.where(
                    d > t, np.int32(sent << ba) | astar, p)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((a, rp), jnp.int32),
        grid=(rp // bl,),
        in_specs=[
            pl.BlockSpec((a, bl), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((a, bl), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((a + 2 * pad, bl), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f2)
    return out[:, :r].reshape(a, m, l)


def _window_packed_pallas(p1: jax.Array, plan,
                          interpret: bool = False) -> jax.Array:
    """Pallas twin of ``_window_packed_xla``: identical window op count to
    the d2-only pass (the payload rides in the low bits)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m, l = p1.shape
    t = min(plan["t"], b - 1)
    ba, s, cap = plan["ba"], plan["s"], plan["cap"]
    fill = np.int32(int(cap) << s)

    r = m * l
    bl = 128
    rpad = -r % bl
    f2 = p1.reshape(b, r)
    if rpad:
        f2 = jnp.pad(f2, ((0, 0), (0, rpad)), constant_values=fill)
    rp = r + rpad

    def kernel(f_ref, out_ref, buf):
        @pl.when(pl.program_id(0) == 0)
        def _():
            buf[pl.ds(0, t), :] = jnp.full((t, bl), fill, jnp.int32)
            buf[pl.ds(t + b, t), :] = jnp.full((t, bl), fill, jnp.int32)

        raw = f_ref[:, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (b, bl), 0)
        v = raw >> ba
        astar = raw & np.int32((1 << ba) - 1)
        packed = (v << s) | (iota << ba) | astar

        # content skip: all inputs capped-far => the center always wins
        # (candidates add k^2<<s on top of cap) — the repack IS the output
        all_far = jnp.min(raw) >= np.int32(int(cap) << ba)

        @pl.when(all_far)
        def _():
            out_ref[:, :] = packed

        @pl.when(jnp.logical_not(all_far))
        def _():
            buf[pl.ds(t, b), :] = packed
            acc = packed
            for k in range(1, t + 1):
                lo = buf[pl.ds(t - k, b), :]
                hi = buf[pl.ds(t + k, b), :]
                acc = jnp.minimum(acc, jnp.minimum(lo, hi)
                                  + np.int32((k * k) << s))
            v2 = jnp.minimum(acc >> s, np.int32(cap))
            out_ref[:, :] = (v2 << s) | (acc & np.int32((1 << s) - 1))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, rp), jnp.int32),
        grid=(rp // bl,),
        in_specs=[
            pl.BlockSpec((b, bl), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((b, bl), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b + 2 * t, bl), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f2)
    return out[:, :r].reshape(b, m, l)


def _split_packed_pallas(p2: jax.Array, plan,
                         interpret: bool = False) -> jax.Array:
    """Pallas twin of ``_split_packed_xla``: two half-window accumulators
    (4 VPU ops per offset vs the paired pass's 3), combined in-kernel to
    ONE packed output word (val<<(s+1) | sign<<s | pay)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, m, l = p2.shape
    t = min(plan["t"], c - 1)
    s, cap = plan["s"], plan["cap"]
    fill = np.int32(int(cap) << s)

    r = m * l
    bl = 128
    rpad = -r % bl
    f2 = p2.reshape(c, r)
    if rpad:
        f2 = jnp.pad(f2, ((0, 0), (0, rpad)), constant_values=fill)
    rp = r + rpad

    def kernel(f_ref, out_ref, buf):
        @pl.when(pl.program_id(0) == 0)
        def _():
            buf[pl.ds(0, t), :] = jnp.full((t, bl), fill, jnp.int32)
            buf[pl.ds(t + c, t), :] = jnp.full((t, bl), fill, jnp.int32)

        center = f_ref[:, :]
        mask_s = np.int32((1 << s) - 1)
        # content skip: all inputs capped-far => the center wins both
        # accumulators (sign 0, own payload)
        all_far = jnp.min(center) >= np.int32(int(cap) << s)

        @pl.when(all_far)
        def _():
            out_ref[:, :] = np.int32(int(cap) << (s + 1)) \
                | (center & mask_s)

        @pl.when(jnp.logical_not(all_far))
        def _():
            buf[pl.ds(t, c), :] = center
            acc_n = center
            acc_p = center
            for k in range(1, t + 1):
                kk = np.int32((k * k) << s)
                acc_n = jnp.minimum(acc_n, buf[pl.ds(t - k, c), :] + kk)
                acc_p = jnp.minimum(acc_p, buf[pl.ds(t + k, c), :] + kk)
            vn = acc_n >> s
            vp = acc_p >> s
            use_p = vp < vn
            val = jnp.minimum(jnp.minimum(vn, vp), np.int32(cap))
            pay = jnp.where(use_p, acc_p & mask_s, acc_n & mask_s)
            out_ref[:, :] = (val << (s + 1)) \
                | (use_p.astype(jnp.int32) << s) | pay

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, rp), jnp.int32),
        grid=(rp // bl,),
        in_specs=[
            pl.BlockSpec((c, bl), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((c, bl), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c + 2 * t, bl), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f2)
    return out[:, :r].reshape(c, m, l)


def _closest_passes(occ_t, plan, interpret: bool):
    """The three packed passes on the transposed [A,B,C] volume; returns
    the final packed word (val<<(s+1) | sign<<s | pay) in [C,A,B] layout."""
    on_tpu = jax.default_backend() == "tpu" or interpret
    if on_tpu:
        p1 = _binary_packed_pallas(occ_t, plan, interpret)      # [A,B,C]
        p2 = _window_packed_pallas(p1.transpose(1, 0, 2), plan,
                                   interpret)                   # [B,A,C]
        return _split_packed_pallas(p2.transpose(2, 1, 0), plan,
                                    interpret)                  # [C,A,B]
    p1 = _binary_packed_xla(occ_t, plan)
    p2 = _window_packed_xla(p1.transpose(1, 0, 2), plan)
    return _split_packed_xla(p2.transpose(2, 1, 0), plan)


def unpack_split(vps: jax.Array, plan):
    """Decode the final packed word -> (val, sign, b*, a*)."""
    s, ba, bb = plan["s"], plan["ba"], plan["bb"]
    val = vps >> (s + 1)
    sign = (vps >> s) & 1
    bstar = (vps >> ba) & ((1 << bb) - 1)
    astar = vps & ((1 << ba) - 1)
    return val, sign, bstar, astar


def _reconstruct_closest(shape, plan, val, sign, bstar, astar,
                         packed_out: bool = False):
    """Shared final decode: recover c* arithmetically from the winning
    (val, a*, b*) + sign, assemble (d2, closest) in natural [X,Y,Z] order.
    Inputs are int32 arrays already in natural [X,Y,Z] layout.

    ``packed_out``: emit closest as ONE packed int32 grid
    (grid.pack_closest layout, -1 = undefined) instead of three i16
    planes — the [3,X,Y,Z] stack is a 3N-element write that runs at the
    TPU's element rate (~1.5 ms/tick at cow scale); the packed epilogue
    fuses into the same single pass as d2."""
    from ...grid import UNDEFINED_COORD

    t = plan["t"]
    a_ax, b_ax, c_ax = plan["a"], plan["b"], plan["c"]
    ia = jax.lax.broadcasted_iota(jnp.int32, shape, a_ax)
    ib = jax.lax.broadcasted_iota(jnp.int32, shape, b_ax)
    ic = jax.lax.broadcasted_iota(jnp.int32, shape, c_ax)
    dc2 = val - (ia - astar) ** 2 - (ib - bstar) ** 2
    dc = jnp.round(jnp.sqrt(jnp.maximum(dc2, 0).astype(jnp.float32))
                   ).astype(jnp.int32)
    cstar = jnp.where(sign > 0, ic + dc, ic - dc)

    valid = val <= t * t
    d2 = jnp.where(valid, val, INF_D2)
    coords = [None, None, None]
    coords[a_ax] = astar
    coords[b_ax] = bstar
    coords[c_ax] = cstar
    if packed_out:
        assert all(g <= 1024 for g in shape), (
            f"packed closest needs every grid extent <= 1024 (10-bit "
            f"fields); got {shape}")
        packed = (coords[0] << 20) | (coords[1] << 10) | coords[2]
        return d2, jnp.where(valid, packed, jnp.int32(-1))
    undef = jnp.int16(UNDEFINED_COORD)
    closest = jnp.stack(
        [jnp.where(valid, c.astype(jnp.int16), undef) for c in coords])
    return d2, closest


@partial(jax.jit, static_argnames=("trunc_vox", "interpret", "packed_out"))
def truncated_edt_d2_closest(
    occupied: jax.Array, trunc_vox: int, interpret: bool = False,
    packed_out: bool = False,
):
    """Exact truncated squared EDT *with* per-voxel closest-obstacle coords.

    Returns (d2 int32 [X,Y,Z], closest int16 [3,X,Y,Z]); closest reads
    UNDEFINED_COORD (-1) wherever d2 == INF_D2.  Identical d2 to
    ``truncated_edt_d2``.  Requires ``closest_plan(shape, trunc_vox)`` to
    fit; callers gate on it.  ``packed_out``: closest as one packed int32
    grid instead (see _reconstruct_closest).
    """
    plan = closest_plan(occupied.shape, trunc_vox)
    assert plan is not None, (
        f"closest tracking unsupported for shape={occupied.shape} "
        f"t={trunc_vox}: packed argmin exceeds int32 "
        "(use truncated_edt_d2_closest_wide)")
    assert not packed_out or all(g <= 1024 for g in occupied.shape), (
        f"packed_out needs every grid extent <= 1024 (10-bit coordinate "
        f"fields, grid.pack_closest); got {occupied.shape}")
    a_ax, b_ax, c_ax = plan["a"], plan["b"], plan["c"]

    occ_t = occupied.transpose(a_ax, b_ax, c_ax).astype(jnp.uint8)
    vps = _closest_passes(occ_t, plan, interpret)           # [C,A,B]

    # back to natural [X,Y,Z]: current layout axes are (c_ax, a_ax, b_ax)
    inv = tuple(int(i) for i in np.argsort((c_ax, a_ax, b_ax)))
    vps = vps.transpose(inv)

    val, sign, bstar, astar = unpack_split(vps, plan)
    return _reconstruct_closest(occupied.shape, plan, val, sign, bstar,
                                astar, packed_out=packed_out)


# ---------------------------------------------------------------------------
# Wide (two-word) closest fallback — exact on grids where the single-int32
# packing cannot fit (the reference maintains closest_obstacle_
# UNCONDITIONALLY, ESDFMap.h:92-96; round 2 left it stale past the bit
# budget).  Value and payload ride separate int32 arrays, min'd
# lexicographically — identical tie-break order to the packed path, so the
# two engines are bit-identical wherever both are defined.  ~2x the VPU
# ops of the packed path and XLA-lowered (shift chains), so the packed
# Pallas path stays the production default.
# ---------------------------------------------------------------------------


def _pair_min(h1, l1, h2, l2):
    """Lexicographic (value, payload) pair min — the two-word analog of
    integer min on val<<s | payload."""
    take2 = (h2 < h1) | ((h2 == h1) & (l2 < l1))
    return jnp.where(take2, h2, h1), jnp.where(take2, l2, l1)


def _binary_pair_xla(occ, plan):
    """Binary first pass, pair form: returns (val, a*) along leading axis."""
    a = occ.shape[0]
    t = min(plan["t"], a - 1)
    cap = plan["cap"]
    l1inf = np.int32(t + 1)
    iota = jnp.arange(a, dtype=jnp.int32).reshape(
        (a,) + (1,) * (occ.ndim - 1))
    hi = jnp.where(occ > 0, np.int32(0), l1inf)
    lo = jnp.broadcast_to(iota, occ.shape).astype(jnp.int32)
    s, reach = 1, 0
    while reach < t:
        for sh in (-s, s):
            h2 = _shift_lead(hi, sh, l1inf) + np.int32(s)
            l2 = _shift_lead(lo, sh, np.int32(0))
            hi, lo = _pair_min(hi, lo, h2, l2)
        reach += s
        s *= 2
    hi = jnp.where(hi > t, np.int32(cap), hi * hi)
    return hi, lo


def _pad_lead(x, t: int, fill):
    """Pad the leading axis by ``t`` on both sides with ``fill``."""
    widths = ((t, t),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=np.int32(fill))


def _window_pair_xla(hi, lo, plan):
    """Paired window pass, pair form: payload grows to b*<<ba | a*.

    ``fori_loop`` over window offsets (not a Python unroll): t can reach
    the grid diameter here, and an unrolled concat chain of that length
    sends XLA's CPU compile superlinear (observed: minutes at t~1500)."""
    b = hi.shape[0]
    t = min(plan["t"], b - 1)
    ba, cap = plan["ba"], plan["cap"]
    iota = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (hi.ndim - 1))
    lo = (iota << ba) | lo
    hip = _pad_lead(hi, t, cap)
    lop = _pad_lead(lo, t, 0)

    def body(d, acc):
        acc_h, acc_l = acc
        k = d - t
        h2 = jax.lax.dynamic_slice_in_dim(hip, d, b, 0) + k * k
        l2 = jax.lax.dynamic_slice_in_dim(lop, d, b, 0)
        return _pair_min(acc_h, acc_l, h2, l2)

    acc_h, acc_l = jax.lax.fori_loop(0, 2 * t + 1, body, (hi, lo))
    return jnp.minimum(acc_h, np.int32(cap)), acc_l


def _split_pair_xla(hi, lo, plan):
    """Split-sign final pass, pair form: returns (val, sign, payload)."""
    c = hi.shape[0]
    t = min(plan["t"], c - 1)
    cap = plan["cap"]
    hip = _pad_lead(hi, t, cap)
    lop = _pad_lead(lo, t, 0)

    def body(k, acc):
        an_h, an_l, ap_h, ap_l = acc
        kk = k * k
        h2 = jax.lax.dynamic_slice_in_dim(hip, t - k, c, 0) + kk
        l2 = jax.lax.dynamic_slice_in_dim(lop, t - k, c, 0)
        an_h, an_l = _pair_min(an_h, an_l, h2, l2)
        h2 = jax.lax.dynamic_slice_in_dim(hip, t + k, c, 0) + kk
        l2 = jax.lax.dynamic_slice_in_dim(lop, t + k, c, 0)
        ap_h, ap_l = _pair_min(ap_h, ap_l, h2, l2)
        return an_h, an_l, ap_h, ap_l

    an_h, an_l, ap_h, ap_l = jax.lax.fori_loop(
        1, t + 1, body, (hi, lo, hi, lo))
    use_p = ap_h < an_h
    val = jnp.minimum(jnp.minimum(an_h, ap_h), np.int32(cap))
    pay = jnp.where(use_p, ap_l, an_l)
    return val, use_p.astype(jnp.int32), pay


@partial(jax.jit, static_argnames=("trunc_vox",))
def truncated_edt_d2_closest_wide(occupied: jax.Array, trunc_vox: int,
                                  packed_out: bool = False):
    """Exact truncated EDT + closest on grids past the int32 packing budget
    (e.g. 512^3 at t=100).  Same return contract and identical results to
    ``truncated_edt_d2_closest`` where both are defined."""
    plan = closest_plan_wide(occupied.shape, trunc_vox)
    assert plan is not None, (
        f"closest tracking unsupported even in wide form for "
        f"shape={occupied.shape} t={trunc_vox}: "
        + closest_capability(occupied.shape, trunc_vox)["detail"])
    ba, a_ax, b_ax, c_ax = plan["ba"], plan["a"], plan["b"], plan["c"]

    occ_t = occupied.transpose(a_ax, b_ax, c_ax).astype(jnp.uint8)
    hi, lo = _binary_pair_xla(occ_t, plan)                       # [A,B,C]
    hi, lo = _window_pair_xla(hi.transpose(1, 0, 2),
                              lo.transpose(1, 0, 2), plan)       # [B,A,C]
    val, sign, pay = _split_pair_xla(hi.transpose(2, 1, 0),
                                     lo.transpose(2, 1, 0), plan)  # [C,A,B]

    inv = tuple(int(i) for i in np.argsort((c_ax, a_ax, b_ax)))
    val = val.transpose(inv)
    sign = sign.transpose(inv)
    pay = pay.transpose(inv)
    bstar = pay >> ba
    astar = pay & ((1 << ba) - 1)
    return _reconstruct_closest(occupied.shape, plan, val, sign, bstar,
                                astar, packed_out=packed_out)


def edt_closest_auto(occupied, trunc_vox: int, interpret: bool = False,
                     packed_out: bool = False):
    """Dispatch one truncated EDT+closest level: the packed Pallas path
    when the int32 budget fits, else the exact two-word wide fallback
    (identical results; see closest_capability)."""
    if closest_plan(occupied.shape, trunc_vox) is not None:
        return truncated_edt_d2_closest(occupied, trunc_vox, interpret,
                                        packed_out=packed_out)
    return truncated_edt_d2_closest_wide(occupied, trunc_vox,
                                         packed_out=packed_out)


@partial(jax.jit, static_argnames=("t_fine", "t_total", "interpret",
                                   "packed_out"))
def hierarchical_edt_d2_closest(
    occupied: jax.Array, t_fine: int, t_total: int, interpret: bool = False,
    packed_out: bool = False,
):
    """Two-level EDT with closest tracking.  The fine field's closest is
    exact; the far field's comes from the coarse grid (coordinates snapped
    to the even corner of the winning 2x2x2 block — approximate by up to
    one fine voxel per axis, consistent with the far field's own +-1
    coarse-voxel distance quantization).  ``packed_out``: packed int32
    closest (coarse coord doubling works directly on the packed word —
    2*coord stays within each 10-bit field for grids <= 1024)."""
    from ...grid import UNDEFINED_COORD

    gx, gy, gz = occupied.shape
    assert gx % 2 == 0 and gy % 2 == 0 and gz % 2 == 0
    assert not packed_out or all(g <= 1024 for g in occupied.shape), (
        f"packed_out needs every fine-grid extent <= 1024: the coarse "
        f"upsample doubles coordinates INSIDE the packed word (clc * 2), "
        f"carry-safe only while every coarse coord fits 9 bits; got "
        f"{occupied.shape}")

    fine_d2, fine_cl = edt_closest_auto(occupied, t_fine, interpret,
                                        packed_out=packed_out)

    if jax.default_backend() == "tpu" and not interpret:
        occ_c = _downsample2_any(occupied)
    else:
        occ_c = occupied.reshape(gx // 2, 2, gy // 2, 2, gz // 2, 2).any(
            axis=(1, 3, 5))
    d2c, clc = edt_closest_auto(occ_c, -(-t_total // 2), interpret,
                                packed_out=packed_out)
    d2c = jnp.where(d2c >= INF_D2, INF_D2, d2c * 4)
    up = jnp.repeat(jnp.repeat(jnp.repeat(d2c, 2, 0), 2, 1), 2, 2)
    use_fine = fine_d2 < INF_D2
    d2 = jnp.where(use_fine, fine_d2, up)
    if packed_out:
        clc2 = jnp.where(clc < 0, jnp.int32(-1), clc * 2)
        cl_up = jnp.repeat(jnp.repeat(jnp.repeat(clc2, 2, 0), 2, 1), 2, 2)
        return d2, jnp.where(use_fine, fine_cl, cl_up)
    clc2 = jnp.where(clc < 0, jnp.int16(UNDEFINED_COORD),
                     (clc * jnp.int16(2)))
    cl_up = jnp.repeat(jnp.repeat(jnp.repeat(clc2, 2, 1), 2, 2), 2, 3)
    closest = jnp.where(use_fine[None], fine_cl, cl_up)
    return d2, closest


def _downsample2_any(occ: jax.Array) -> jax.Array:
    """2x2x2 "any" pooling of a bool grid.

    ``occ.reshape(...).any((1,3,5))`` lowers to strided bool reductions that
    cost ~6 ms on the full grid (lane-axis stride-2 is a shuffle on TPU).
    Summing each axis's pairs with a [n, n/2] pairing matrix instead rides
    the MXU: three tiny matmuls, ~0.2 ms.
    """
    gx, gy, gz = occ.shape

    def pair(n):
        return jnp.repeat(jnp.eye(n // 2, dtype=jnp.bfloat16), 2, axis=0)

    o = occ.astype(jnp.bfloat16)
    ox = jax.lax.dot_general(
        pair(gx), o.reshape(gx, gy * gz), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(gx // 2, gy, gz)
    oy = jnp.einsum("xyz,yj->xjz", ox.astype(jnp.bfloat16), pair(gy),
                    preferred_element_type=jnp.float32)
    oz = jnp.einsum("xjz,zk->xjk", oy.astype(jnp.bfloat16), pair(gz),
                    preferred_element_type=jnp.float32)
    return oz > 0.5


@partial(jax.jit, static_argnames=("t_fine", "t_total"))
def hierarchical_edt_d2(
    occupied: jax.Array, t_fine: int, t_total: int
) -> jax.Array:
    """Two-level truncated EDT: exact to ``t_fine`` voxels, half-resolution
    beyond (up to ``t_total``).

    The near field — what planners actually consume (collision margins,
    gradients) — is exact; the far field is computed on a 2x-downsampled
    grid (8x fewer voxels, half the window steps) and upsampled, with error
    bounded by one coarse voxel.  The reference's own accuracy oracle
    reports 0.1-0.2 m overestimates for its BFS (ESDFMap.cpp:940-975), so
    the far-field quantization sits inside the reference's error envelope.
    """
    gx, gy, gz = occupied.shape
    assert gx % 2 == 0 and gy % 2 == 0 and gz % 2 == 0, "grid dims must be even"

    fine = truncated_edt_d2(occupied, t_fine)

    if jax.default_backend() == "tpu":
        occ_c = _downsample2_any(occupied)
    else:
        occ_c = occupied.reshape(gx // 2, 2, gy // 2, 2, gz // 2, 2).any(
            axis=(1, 3, 5)
        )
    d2c = truncated_edt_d2(occ_c, -(-t_total // 2))
    # coarse squared distances -> fine voxel units (x4); keep INF marker
    d2c = jnp.where(d2c >= INF_D2, INF_D2, d2c * 4)
    up = jnp.repeat(jnp.repeat(jnp.repeat(d2c, 2, 0), 2, 1), 2, 2)

    return jnp.where(fine < INF_D2, fine, up)
