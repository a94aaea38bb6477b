"""Raycasting & free-space carving (reference components C9/C10/C11).

Reference behavior being reproduced:

  * Amanatides-Woo DDA voxel traversal (src/raycast.cpp:56-159), invoked per
    point with the grid AABB in world-voxel coordinates (Fiesta.h:233-237).
  * Ray orchestration (RaycastProcess, Fiesta.h:194-278): transform point to
    world; skip rays shorter than min_ray_length; clip rays longer than
    max_ray_length and mark the clipped endpoint FREE; otherwise mark the
    endpoint OCCUPIED; walk the ray voxels (all but the last emitted) marking
    FREE, gated to center distance within [min_ray_length, max_ray_length].
  * Epoch-stamped visited sets (set_occ_/set_free_, Fiesta.h:221-275) dedupe
    observations per scan so each voxel receives at most one endpoint mark
    and one free mark per scan.  Here dedup is a scatter-max into boolean
    grids — deterministic where the reference's multithreaded version is
    racy (SURVEY.md C11).

Counter semantics (SetOccupancy, src/ESDFMap.cpp:417-437): every observation
increments ``miss``; occupied endpoints also increment ``hit``.  With per-scan
dedup that is exactly:

    hit_cnt  += hit_mask
    miss_cnt += (hit_mask | endpoint_free_mask) + path_free_mask

Three integrators are provided:

``integrate_scan_scanline`` / ``integrate_scan_scanline_batch``  (production)
    Octant shadow-casting: one packed endpoint scatter into a
    sensor-centered box, then octant wavefront sweeps propagate max
    observation range inward — static shifts + elementwise only (XLA
    executes per-element gathers/scatters at ~9 us per thousand elements on
    TPU, so both are avoided).  Cost is independent of map size.  On TPU
    the sweeps are Pallas kernels (ops/pallas/carve.py) that keep the
    recurrence carry, octant masking, and the free test in VMEM; all K
    scans of an update batch share the sweeps.

``integrate_scan_dda``  (parity anchor)
    Exact batched DDA: every ray advances in lock-step inside one
    ``fori_loop`` (data-parallel over rays, sequential over steps),
    scattering free marks per step.  Bit-faithful to the reference's voxel
    sets (up to documented divergences for rays exiting the map).

``integrate_scan_projective``
    Depth-panorama variant (scatter into a spherical buffer + mip-footprint
    voxel gather); superseded by scanline on TPU because of gather cost,
    retained for comparison.

All carve a free set agreeing with the DDA within ~1 voxel at silhouettes;
hits always win the occupancy vote (2*hit >= miss), so obstacles are never
erased by over-carving.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FiestaConfig
from ..grid import pos_to_vox, vox_in_grid, vox_to_idx
from ..grid import window_mask as make_window_mask

#: carve sweep IO layout, all bit-equal (override for A/B runs):
#:   "relayout" (DEFAULT) — pre-transposed HBM seed copies per
#:     orientation + u8 combine transposes (the round-4 form).
#:   "canon" — x/y kernels read/write the canonical grid layout,
#:     sub-slabs transposed in VMEM ("canon1"/"canon2" kernel modes);
#:   "canonx" — x only canonical.
#: Round-5 on-chip A/B REJECTED canon as the default: in-VMEM sub-slab
#: transposes lower to the same ~8 Gelem/s element-rate wall as XLA's
#: HBM relayouts (measured 1.4-1.6 ms per 45 MB volume BOTH ways), so
#: moving them into the kernel serializes them against the sweep instead
#: of letting XLA schedule them — cow-scale stream 10.3-10.5 (canon) vs
#: 9.8-10.1 ms/batch (relayout).  The modes stay for future toolchains
#: with a faster transpose lowering; interpret tests pin bit-equality.
import os as _os_env  # noqa: E402

_CARVE_IO = _os_env.environ.get("FIESTA_CARVE_IO", "relayout")

#: endpoint splat ordering: "direct" scatters as produced; "sorted"
#: pre-sorts updates by target index to earn XLA's sorted-indices
#: scatter fast path (FIESTA_SPLAT_SORT_IMPL=pallas|lax picks the sort).
#: Bit-exact either way (scatter-max commutes); default from on-chip A/B.
_SPLAT_ORDER = _os_env.environ.get("FIESTA_SPLAT", "direct")
if _SPLAT_ORDER not in ("direct", "sorted"):
    raise ValueError(f"FIESTA_SPLAT={_SPLAT_ORDER!r}: expected direct|sorted")
_SPLAT_SORT_IMPL = _os_env.environ.get("FIESTA_SPLAT_SORT_IMPL", "lax")
if _CARVE_IO not in ("canon", "canonx", "relayout"):
    raise ValueError(
        f"FIESTA_CARVE_IO={_CARVE_IO!r}: expected canon|canonx|relayout")

_F32_INF = np.float32(np.inf)  # numpy on purpose: see grid.INF_D2 note


class ScanResult(NamedTuple):
    hit_cnt: jax.Array
    miss_cnt: jax.Array
    num_rays: jax.Array       # rays passing validity/length gates
    num_endpoints: jax.Array  # endpoint observations scattered


# ---------------------------------------------------------------------------
# Shared endpoint handling
# ---------------------------------------------------------------------------


def _prep_rays(cfg: FiestaConfig, points, valid, origin):
    """Length gating + clipping (RaycastProcess, Fiesta.h:208-215)."""
    valid = valid & jnp.all(jnp.isfinite(points), axis=-1)
    delta = points - origin
    length = jnp.linalg.norm(delta, axis=-1)
    valid = valid & (length >= cfg.min_ray_length)
    is_hit = length <= cfg.max_ray_length
    scale = jnp.where(
        is_hit, 1.0, cfg.max_ray_length / jnp.maximum(length, 1e-9)
    )
    clipped = origin + delta * scale[..., None]
    return clipped, valid, is_hit


def _endpoint_masks(cfg: FiestaConfig, clipped, valid, is_hit, win):
    """Scatter endpoint observations into dedup masks (hit wins ties)."""
    gx, gy, gz = cfg.grid_shape
    vox = pos_to_vox(cfg, clipped)
    in_grid = vox_in_grid(cfg, vox)
    if win is not None:
        min_vec, max_vec = win
        in_grid = in_grid & jnp.all((vox >= min_vec) & (vox <= max_vec), axis=-1)
    lin = vox_to_idx(cfg, vox)

    # NB: dropped entries use an out-of-bounds HIGH sentinel — negative
    # indices would wrap (NumPy semantics) instead of dropping.
    n = gx * gy * gz
    hit_lin = jnp.where(valid & is_hit & in_grid, lin, n)
    free_lin = jnp.where(valid & ~is_hit & in_grid, lin, n)
    hit_m = jnp.zeros((n,), jnp.uint8).at[hit_lin].max(
        jnp.uint8(1), mode="drop"
    )
    epfree_m = jnp.zeros((n,), jnp.uint8).at[free_lin].max(
        jnp.uint8(1), mode="drop"
    )
    epfree_m = jnp.where(hit_m > 0, jnp.uint8(0), epfree_m)  # hit wins
    return hit_m.reshape(cfg.grid_shape), epfree_m.reshape(cfg.grid_shape)


def _sat_add_u8(cnt, inc):
    """Saturating uint8 add: counters pin at 255 instead of wrapping when
    more than ~127 scans accumulate between fusion drains (each scan adds
    at most 1 hit / 2 misses per voxel).  Saturation degrades gracefully:
    ``observed = miss > 0`` stays true and the hit/miss vote keeps its
    sign for any mix of saturated counters."""
    inc = inc.astype(cnt.dtype)
    return jnp.where(cnt > jnp.uint8(255) - inc, jnp.uint8(255), cnt + inc)


def _apply_counts(hit_cnt, miss_cnt, hit_m, epfree_m, pathfree_m):
    dt = hit_cnt.dtype  # counters are uint8 (see grid.MapState)
    hit_d = hit_m.astype(dt)
    ep_d = epfree_m.astype(dt)
    path_d = pathfree_m.astype(dt)
    hit_cnt = _sat_add_u8(hit_cnt, hit_d)
    miss_cnt = _sat_add_u8(miss_cnt, jnp.maximum(hit_d, ep_d) + path_d)
    return hit_cnt, miss_cnt


# ---------------------------------------------------------------------------
# Exact batched DDA (Amanatides-Woo, src/raycast.cpp:56-159)
# ---------------------------------------------------------------------------


def _intbound(s, ds):
    """Smallest positive t with s + t*ds integral (raycast.cpp:14-23)."""
    s_ = jnp.where(ds < 0, -s, s)
    ds_ = jnp.abs(ds)
    frac = s_ % 1.0
    return jnp.where(ds_ == 0, _F32_INF, (1.0 - frac) / ds_)


def integrate_scan_dda(
    cfg: FiestaConfig,
    hit_cnt: jax.Array,
    miss_cnt: jax.Array,
    points: jax.Array,
    valid: jax.Array,
    origin: jax.Array,
    window: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> ScanResult:
    """Exact per-ray DDA integration.

    Args:
      points: [R,3] f32 world-frame scan points (padded; see ``valid``).
      valid:  [R] bool.
      origin: [3] f32 sensor origin in world frame.
      window: optional (min_vec, max_vec) int32[3] inclusive update window.
    """
    res = cfg.resolution
    gx, gy, gz = cfg.grid_shape
    n = gx * gy * gz
    map_origin = jnp.asarray(cfg.origin, jnp.float32)

    clipped, rvalid, is_hit = _prep_rays(cfg, points, valid, origin)
    del points  # clipped/rvalid carry everything downstream
    hit_m, epfree_m = _endpoint_masks(cfg, clipped, rvalid, is_hit, window)

    # DDA setup in world-voxel coordinates (Fiesta.h:233-237 divides by res).
    start = origin / res                     # [3]
    end = clipped / res                      # [R,3]
    v0 = jnp.floor(start).astype(jnp.int32)  # [3]
    ev = jnp.floor(end).astype(jnp.int32)    # [R,3]
    d = (ev - v0[None]).astype(jnp.float32)
    step = jnp.sign(d).astype(jnp.int32)
    t_max0 = _intbound(start[None].astype(jnp.float32), d)     # [R,3]
    t_delta = jnp.where(d == 0, _F32_INF, step.astype(jnp.float32) / d)
    max_dist2 = jnp.sum((end - start[None]) ** 2, axis=-1)

    # AABB gate in world-voxel coords: l_cornor/res <= v < r_cornor/res.
    aabb_min = map_origin / res
    aabb_max = (map_origin + jnp.asarray(cfg.map_size, jnp.float32)) / res

    alive0 = rvalid & ~jnp.all(step == 0, axis=-1)  # raycast.cpp:112-113

    if window is not None:
        wmin, wmax = window
    min2 = cfg.min_ray_length**2
    max2 = cfg.max_ray_length**2

    def body(_, carry):
        v, tm, alive, prev_lin, free_flat = carry
        vf = v.astype(jnp.float32)

        in_aabb = jnp.all(
            (vf >= aabb_min[None]) & (vf < aabb_max[None]), axis=-1
        )
        dist2 = jnp.sum((vf - start[None]) ** 2, axis=-1)
        over = in_aabb & (dist2 > max_dist2)          # raycast.cpp:123-125
        at_end = jnp.all(v == ev, axis=-1)            # raycast.cpp:133

        center = (vf + 0.5) * res                     # Fiesta.h:240
        clen2 = jnp.sum((center - origin[None]) ** 2, axis=-1)
        gate = (clen2 >= min2) & (clen2 <= max2)      # Fiesta.h:242-246

        mv = pos_to_vox(cfg, center)
        in_grid = vox_in_grid(cfg, mv)
        if window is not None:
            in_grid = in_grid & jnp.all((mv >= wmin) & (mv <= wmax), axis=-1)

        # The reference frees output[0..size-2], i.e. every emitted voxel
        # except the LAST emission (Fiesta.h:239).  Online equivalent: a
        # voxel is marked only once a *later* voxel is emitted on its ray.
        emitted = alive & in_aabb
        mark = jnp.where(emitted, prev_lin, n)   # high sentinel: dropped
        free_flat = free_flat.at[mark].max(jnp.uint8(1), mode="drop")
        lin = vox_to_idx(cfg, mv)
        markable = gate & in_grid
        prev_lin = jnp.where(emitted, jnp.where(markable, lin, n), prev_lin)

        alive = alive & ~at_end & ~over

        # Axis choice replicates the nested comparisons (raycast.cpp:139-157).
        tmx, tmy, tmz = tm[..., 0], tm[..., 1], tm[..., 2]
        take_x = (tmx < tmy) & (tmx < tmz)
        take_y = (tmx >= tmy) & (tmy < tmz)
        take_z = ~take_x & ~take_y
        axis = jnp.stack([take_x, take_y, take_z], axis=-1)
        adv = axis & alive[..., None]
        v = v + jnp.where(adv, step, 0)
        tm = tm + jnp.where(adv, t_delta, 0.0)
        return v, tm, alive, prev_lin, free_flat

    free0 = jnp.zeros((n,), jnp.uint8)
    v_init = jnp.broadcast_to(v0[None], ev.shape)
    prev0 = jnp.full(ev.shape[:-1], n, jnp.int32)
    _, _, _, _, free_flat = jax.lax.fori_loop(
        0, cfg.ray_steps, body, (v_init, t_max0, alive0, prev0, free0)
    )
    pathfree_m = free_flat.reshape(cfg.grid_shape)

    hit_cnt, miss_cnt = _apply_counts(hit_cnt, miss_cnt, hit_m, epfree_m, pathfree_m)
    return ScanResult(
        hit_cnt,
        miss_cnt,
        jnp.sum(rvalid, dtype=jnp.int32),
        jnp.sum(hit_m.astype(jnp.int32)) + jnp.sum(epfree_m.astype(jnp.int32)),
    )


# ---------------------------------------------------------------------------
# Projective carving (TPU-first fast path)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Scanline (shadow-casting) carve — gather-free fast path
# ---------------------------------------------------------------------------


def carve_free_mask(
    cfg: FiestaConfig,
    seeds: jax.Array,
    po: jax.Array,
) -> jax.Array:
    """Gather-free free-space carving from endpoint range seeds (one scan).

    ``seeds`` [BX,BY,BZ] f32: observation range splatted at endpoint voxels
    (hits: ray length; clipped rays: max_ray_length + resolution), 0
    elsewhere; ``po``: sensor position in box index units.  Returns the
    free mask: voxels with sensor distance in [min_ray, max_ray] and
    strictly closer (by one voxel) than the observed surface along their
    direction.  Thin wrapper over the batched carve (K = 1).
    """
    return carve_free_mask_batch(cfg, seeds[None], po[None])[0]


# --- batched wavefront scan: all scans x orientations x signs in one pass ---


def _shift2d_b(x, dy: int, dz: int):
    """Static shift of the trailing two axes of [..., Y, Z] with zero fill."""
    y, z = x.shape[-2], x.shape[-1]
    if dy:
        blk = jnp.zeros(x.shape[:-2] + (abs(dy), z), x.dtype)
        x = (jnp.concatenate([x[..., dy:, :], blk], -2) if dy > 0
             else jnp.concatenate([blk, x[..., :dy, :]], -2))
    if dz:
        blk = jnp.zeros(x.shape[:-1] + (abs(dz),), x.dtype)
        x = (jnp.concatenate([x[..., dz:], blk], -1) if dz > 0
             else jnp.concatenate([blk, x[..., :dz]], -1))
    return x


def _taps_max_b(carry, f2, f3):
    """Batched ``_taps_max``: carry [B, Y, Z], f2 [B, Y], f3 [B, Z]."""
    b2 = jnp.floor(f2)
    b3 = jnp.floor(f3)
    t = jnp.zeros_like(carry)
    for d in (-1, 0, 1):
        m = ((b2 == d) | (b2 == d - 1))[:, :, None]
        t = jnp.maximum(t, jnp.where(m, _shift2d_b(carry, d, 0), 0.0))
    out = jnp.zeros_like(carry)
    for d in (-1, 0, 1):
        m = ((b3 == d) | (b3 == d - 1))[:, None, :]
        out = jnp.maximum(out, jnp.where(m, _shift2d_b(t, 0, d), 0.0))
    return out


def _octant_scan_batched(seeds, flips, po_a, o2, o3, slabs_per_step=4):
    """One fused far->near sweep over a BATCH of octant wavefronts.

    The serial dimension (slabs along the dominant axis) is what costs wall
    clock on TPU — each slab is far too small to fill the VPU, so per-step
    scheduling dominates.  Batching every wavefront that shares a slab shape
    (all K scans of an update batch x both signs x compatible orientations)
    multiplies the work per step instead of the number of steps.

    seeds: [B, A, C2, C3] f32 in natural axis order.
    flips: static tuple of B bools; True = positive octant (information
      flows from high axis indices toward the sensor, so processing order
      is reversed).
    po_a:  [B] f32 sensor coordinate along the scan axis, per wavefront.
    o2:    [B, C2] f32 trailing-axis offsets (coords - sensor).
    o3:    [B, C3] f32.
    Returns W [B, A, C2, C3]: propagated max observation range.
    """
    b, a, c2, c3 = seeds.shape
    u = slabs_per_step
    pad = (-a) % u
    flips_np = np.asarray(flips, bool)
    fmask = jnp.asarray(flips_np)[:, None, None, None]
    sp = jnp.where(fmask, seeds[:, ::-1], seeds)
    if pad:
        zp = jnp.zeros((b, pad, c2, c3), seeds.dtype)
        sp = jnp.concatenate([zp, sp], axis=1)
    # axis index of the slab each processing step touches, per wavefront
    idx = np.where(
        flips_np[:, None],
        np.arange(a - 1 + pad, -1, -1, dtype=np.float32)[None, :],
        np.arange(-pad, a, dtype=np.float32)[None, :],
    )                                                   # [B, A+pad]
    dp = jnp.maximum(jnp.abs(jnp.asarray(idx) - po_a[:, None]), 0.5)

    n_steps = (a + pad) // u
    slabs = sp.transpose(1, 0, 2, 3).reshape(n_steps, u, b, c2, c3)
    dps = dp.transpose(1, 0).reshape(n_steps, u, b)

    def step(carry, inp):
        sl, d = inp                           # [u,B,C2,C3], [u,B]
        outs = []
        for k in range(u):
            f2 = o2 / d[k][:, None]
            f3 = o3 / d[k][:, None]
            carry = jnp.maximum(sl[k], _taps_max_b(carry, f2, f3))
            outs.append(carry)
        return carry, jnp.stack(outs)

    zero = jnp.zeros((b, c2, c3), seeds.dtype)
    _, w = jax.lax.scan(step, zero, (slabs, dps))
    w = w.reshape(a + pad, b, c2, c3)[pad:].transpose(1, 0, 2, 3)
    return jnp.where(fmask, w[:, ::-1], w)


def _sweep_pair_xla(seeds_f, seeds_r, po_a, o2, o3):
    """Paired forward (negative-octant) + reverse (positive-octant)
    wavefront sweeps as one fused XLA scan (non-TPU fallback)."""
    b = seeds_f.shape[0]
    w = _octant_scan_batched(
        jnp.concatenate([seeds_f, seeds_r], 0),
        (False,) * b + (True,) * b,
        jnp.concatenate([po_a, po_a]),
        jnp.concatenate([o2, o2], 0),
        jnp.concatenate([o3, o3], 0),
    )
    return w[:b], w[b:]


def _free_from_r2(cfg: FiestaConfig, r2, W):
    """Free test in squared voxel units (matches the Pallas kernel: no
    sqrt): sensor distance within the ray gates and strictly closer (by
    one voxel) than the propagated observation range."""
    res = cfg.resolution
    wv = (W - res) * (1.0 / res)
    return (
        (W > res)
        & (r2 >= (cfg.min_ray_length / res) ** 2)
        & (r2 <= (cfg.max_ray_length / res) ** 2)
        & (r2 < wv * wv)
    )


def _carve_free_tpu(cfg: FiestaConfig, seeds, po, interpret: bool = False,
                    io_mode: Optional[str] = None):
    """TPU path: octant masking, propagation, and the free test all run
    inside the sweep kernels (see ops/pallas/carve.py); HBM sees only raw
    seed volumes in and uint8 per-octant free masks out.

    ``io_mode``: "canon" | "relayout" (default ``FIESTA_CARVE_IO``); see
    the gate comment at the top of this module."""
    from .pallas.carve import octant_free_sweep_pallas

    k, bx, by, bz = seeds.shape
    xs = jnp.arange(bx, dtype=jnp.float32)
    ys = jnp.arange(by, dtype=jnp.float32)
    zs = jnp.arange(bz, dtype=jnp.float32)
    o_x = xs[None] - po[:, 0, None]    # [K, BX]
    o_y = ys[None] - po[:, 1, None]    # [K, BY]
    o_z = zs[None] - po[:, 2, None]    # [K, BZ]
    # x/y orientations carry (c2=z, c3=y|x): putting the SHORT z axis on
    # sublanes and the long axis on lanes lifts lane utilization from
    # bz/128 (80/128 = 62.5% at cow scale) to bx mod-256 packing
    # (216/256 = 84%) — the kernel is symmetric in (c2, c3) given swapped
    # tie rules / offset rows (PERF.md round 4 for the measured effect)
    po_x = jnp.stack([po[:, 0], po[:, 2], po[:, 1]])   # [3, K]
    po_y = jnp.stack([po[:, 1], po[:, 2], po[:, 0]])
    po_z = jnp.stack([po[:, 2], po[:, 0], po[:, 1]])
    kw = dict(res=cfg.resolution, min_ray=cfg.min_ray_length,
              max_ray=cfg.max_ray_length, interpret=interpret)
    sz = seeds.transpose(0, 3, 1, 2)   # [K, BZ, BX, BY]

    # orientation tie rules define the octant partition: the dominant axis
    # is the max-magnitude one, ties broken x > y > z.
    #
    # x/y IO: the kernels read the CANONICAL seed volume and write
    # canonical free masks, swapping each sub-slab to the (c2=z, c3=long)
    # working layout in VMEM ("canon1"/"canon2" modes, ops/pallas/carve)
    # — killing two f32 seed relayouts and two u8 combine relayouts in
    # HBM (PERF.md round 5).  z keeps the HBM transpose: its scan axis is
    # the canonical LANE dim, where u<=16-of-128 blocks would pad 16x in
    # VMEM.  FIESTA_CARVE_IO=relayout restores the all-transposed form
    # for A/B (bit-equal; tests pin it).
    mode = io_mode or _CARVE_IO
    if mode == "canon":
        if bx == by:
            fx_f, fx_r, fy_f, fy_r = octant_free_sweep_pallas(
                [seeds, seeds], [po_x, po_y], [o_z, o_z], [o_y, o_x],
                [(True, True), (True, False)],
                modes=["canon1", "canon2"], **kw)
        else:
            fx_f, fx_r = octant_free_sweep_pallas(
                [seeds], [po_x], [o_z], [o_y], [(True, True)],
                modes=["canon1"], **kw)
            fy_f, fy_r = octant_free_sweep_pallas(
                [seeds], [po_y], [o_z], [o_x], [(True, False)],
                modes=["canon2"], **kw)
        fz_f, fz_r = octant_free_sweep_pallas(
            [sz], [po_z], [o_x], [o_y], [(False, False)], **kw)
        free = (fx_f | fx_r) | (fy_f | fy_r) \
            | (fz_f | fz_r).transpose(0, 2, 3, 1)
        return free > 0
    if mode == "canonx":
        # hybrid probe: only x reads/writes canonical (no sublane-blocked
        # volume in the call, so U keeps the _pick_block granularity)
        sy = seeds.transpose(0, 2, 3, 1)
        fx_f, fx_r, fy_f, fy_r = octant_free_sweep_pallas(
            [seeds, sy], [po_x, po_y], [o_z, o_z], [o_y, o_x],
            [(True, True), (True, False)],
            modes=["canon1", "lead"], **kw)
        fz_f, fz_r = octant_free_sweep_pallas(
            [sz], [po_z], [o_x], [o_y], [(False, False)], **kw)
        free = (fx_f | fx_r) \
            | (fy_f | fy_r).transpose(0, 3, 1, 2) \
            | (fz_f | fz_r).transpose(0, 2, 3, 1)
        return free > 0

    sx = seeds.transpose(0, 1, 3, 2)   # [K, BX, BZ, BY]
    sy = seeds.transpose(0, 2, 3, 1)   # [K, BY, BZ, BX]
    if bx == by:
        fx_f, fx_r, fy_f, fy_r = octant_free_sweep_pallas(
            [sx, sy], [po_x, po_y], [o_z, o_z], [o_y, o_x],
            [(True, True), (True, False)], **kw)
    else:
        fx_f, fx_r = octant_free_sweep_pallas(
            [sx], [po_x], [o_z], [o_y], [(True, True)], **kw)
        fy_f, fy_r = octant_free_sweep_pallas(
            [sy], [po_y], [o_z], [o_x], [(True, False)], **kw)
    fz_f, fz_r = octant_free_sweep_pallas(
        [sz], [po_z], [o_x], [o_y], [(False, False)], **kw)

    free = (fx_f | fx_r).transpose(0, 1, 3, 2) \
        | (fy_f | fy_r).transpose(0, 3, 1, 2) \
        | (fz_f | fz_r).transpose(0, 2, 3, 1)
    return free > 0


def carve_free_mask_batch(
    cfg: FiestaConfig, seeds: jax.Array, po: jax.Array
) -> jax.Array:
    """Batched free-space carve: K scans in (at most) three fused sweeps.

    seeds [K, BX, BY, BZ] f32, po [K, 3] f32 (sensor in box index units).
    Returns free mask [K, BX, BY, BZ] bool.  The +-x and +-y octants of
    all K scans share one sweep (their slab shapes match whenever
    BX == BY, true for any cubic-footprint carve box), the +-z octants
    the other.  On TPU the sweeps are Pallas kernels that also evaluate
    the free test per octant — valid because octants partition the box
    and ``r2 < max_i(W_i) <=> OR_i (r2 < W_i)``.
    """
    if jax.default_backend() == "tpu":
        return _carve_free_tpu(cfg, seeds, po)

    k, bx, by, bz = seeds.shape
    xs = jnp.arange(bx, dtype=jnp.float32)
    ys = jnp.arange(by, dtype=jnp.float32)
    zs = jnp.arange(bz, dtype=jnp.float32)
    dx = xs[None, :, None, None] - po[:, 0, None, None, None]
    dy = ys[None, None, :, None] - po[:, 1, None, None, None]
    dz = zs[None, None, None, :] - po[:, 2, None, None, None]
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    octx = (adx >= ady) & (adx >= adz)
    octy = ~octx & (ady >= adz)
    octz = ~octx & ~octy

    sx_p = jnp.where(octx & (dx > 0), seeds, 0.0)
    sx_n = jnp.where(octx & (dx <= 0), seeds, 0.0)
    sy = seeds.transpose(0, 2, 1, 3)
    sy_p = jnp.where((octy & (dy > 0)).transpose(0, 2, 1, 3), sy, 0.0)
    sy_n = jnp.where((octy & (dy <= 0)).transpose(0, 2, 1, 3), sy, 0.0)

    o_yz = ys[None] - po[:, 1, None]   # [K, BY]
    o_xz = xs[None] - po[:, 0, None]   # [K, BX]
    o_z = zs[None] - po[:, 2, None]    # [K, BZ]

    # Each sweep's free contribution is masked to its own halfspace
    # (fwd: d <= 0, rev: d > 0) — a seed's cone only covers voxels on its
    # own side of the sensor — matching the Pallas kernel exactly.
    r2 = dx * dx + dy * dy + dz * dz

    def ftest(W):
        return _free_from_r2(cfg, r2, W)

    if bx == by:
        wf, wr = _sweep_pair_xla(
            jnp.concatenate([sx_n, sy_n], 0),
            jnp.concatenate([sx_p, sy_p], 0),
            jnp.concatenate([po[:, 0], po[:, 1]]),
            jnp.concatenate([o_yz, o_xz], 0),
            jnp.concatenate([o_z, o_z], 0),
        )
        wxf, wxr = wf[:k], wr[:k]
        wyf = wf[k:].transpose(0, 2, 1, 3)
        wyr = wr[k:].transpose(0, 2, 1, 3)
    else:
        wxf, wxr = _sweep_pair_xla(sx_n, sx_p, po[:, 0], o_yz, o_z)
        wyf, wyr = _sweep_pair_xla(sy_n, sy_p, po[:, 1], o_xz, o_z)
        wyf = wyf.transpose(0, 2, 1, 3)
        wyr = wyr.transpose(0, 2, 1, 3)

    free = (ftest(wxf) & (dx <= 0)) | (ftest(wxr) & (dx > 0))
    free |= (ftest(wyf) & (dy <= 0)) | (ftest(wyr) & (dy > 0))

    sz = seeds.transpose(0, 3, 1, 2)
    sz_p = jnp.where((octz & (dz > 0)).transpose(0, 3, 1, 2), sz, 0.0)
    sz_n = jnp.where((octz & (dz <= 0)).transpose(0, 3, 1, 2), sz, 0.0)
    wzf, wzr = _sweep_pair_xla(sz_n, sz_p, po[:, 2], o_xz, o_yz)
    free |= (ftest(wzf.transpose(0, 2, 3, 1)) & (dz <= 0)) \
        | (ftest(wzr.transpose(0, 2, 3, 1)) & (dz > 0))
    return free


def _carve_reach(cfg: FiestaConfig) -> int:
    """Half-extent r (voxels) of a scan's reach around the sensor voxel:
    everything a scan can touch lies within max_ray_length (+2 voxel
    margin for endpoint rounding) of the sensor."""
    return int(math.ceil((cfg.max_ray_length + 2 * cfg.resolution)
                         / cfg.resolution)) + 2


def _aligned_box(cfg: FiestaConfig) -> bool:
    """Whether carve-box placement uses 8-aligned x/y corners (required
    by the in-place Pallas counter kernel's DMA windows,
    ops/pallas/boxadd.py).  Only sound when the grid's x/y extents are
    themselves multiples of 8: the +face clamp target ``grid - box`` must
    stay aligned or the clamp would have to choose between alignment and
    coverage.  Unaligned grids place boxes unaligned and take the XLA
    counter-apply path, which has no placement constraints."""
    return cfg.grid_shape[0] % 8 == 0 and cfg.grid_shape[1] % 8 == 0


def _carve_box_shape(cfg: FiestaConfig) -> Tuple[int, int, int]:
    """Static shape of the carve box (integration cost is independent of
    map size).  In aligned mode the x/y extents are
    ``round_up(2r+1 + 7, 8)``: corners are floored DOWN to a multiple of
    8 (a shift of up to 7), so the extent carries >= 7 voxels of
    high-side slack and the aligned box always covers the unaligned
    centered reach box — see ``_box_starts`` for the proof obligations.
    (The round-3 form grew the extent only by ``(-b) % 8`` <= 7 with no
    relation to the floor shift, silently dropping edge observations when
    the +face clamp bound — the reference marks every ray voxel
    unconditionally, include/Fiesta.h:194-278.)"""
    e = 2 * _carve_reach(cfg) + 1
    gx, gy, gz = cfg.grid_shape
    if _aligned_box(cfg):
        ea = -(-(e + 7) // 8) * 8
        return min(gx, ea), min(gy, ea), min(gz, e)
    return min(gx, e), min(gy, e), min(gz, e)


def _box_starts(cfg: FiestaConfig, po_grid: jax.Array) -> jax.Array:
    """Carve-box corner placement for sensor grid position(s) ``po_grid``
    [..., 3] (float, voxel units).  Guarantees, per axis:

      * the box ``[start, start + box_extent)`` covers the unaligned
        centered reach box ``clip([round(po)-r, round(po)+r], grid)``;
      * the box lies inside the grid;
      * (aligned mode) x/y starts are multiples of 8.

    Order matters: floor-to-8 happens BEFORE the face clamp.  In aligned
    mode grid and box x/y extents are both multiples of 8, so the clamp
    target ``grid - box`` is aligned and clamping preserves alignment;
    coverage survives because flooring shifts the start down by s <= 7
    while the extent carries >= 7 voxels of slack (box top >= unaligned
    top), and a binding +face clamp only moves the start further down
    while pinning the box top at the grid face (>= any in-grid reach).
    """
    e = 2 * _carve_reach(cfg) + 1
    gx, gy, gz = cfg.grid_shape
    bx, by, bz = _carve_box_shape(cfg)
    grid = jnp.array([gx, gy, gz], jnp.int32)
    ex = jnp.minimum(grid, e)
    u = jnp.clip(jnp.round(po_grid).astype(jnp.int32) - ex // 2,
                 0, grid - ex)
    if _aligned_box(cfg):
        u = jnp.where(jnp.array([True, True, False]), (u // 8) * 8, u)
    return jnp.clip(u, 0, jnp.array([gx - bx, gy - by, gz - bz], jnp.int32))


def _scanline_seeds_prep(cfg: FiestaConfig, points, valid, origin):
    """Per-ray half of the endpoint splat: box placement, endpoint/exit
    voxels, and the packed class+range value per ray — everything except
    the scatter itself (one FLAT scatter over all scans of a batch is
    ~20% cheaper than vmapped per-scan scatters on TPU; see
    profile_splat.py).

    Semantics (shared with the scatter half below): observation CLASS
    (hit=2 wins over free-endpoint=1, SetOccupancy semantics) and
    observation RANGE W (carve seed; hits contribute their true range,
    max-ray-clipped endpoints max_ray + res) ride one packed value.
    Rays whose endpoint leaves the carve box / grid lose the endpoint
    observation (the reference drops out-of-grid SetOccupancy too) but
    still contribute a carve-only range seed at the box-exit voxel, so the
    in-map portion of the ray is freed exactly as the reference's DDA
    frees it (Fiesta.h:233-248 walks the AABB-clipped ray).

    Returns (starts i32[3], po_box f32[3], lin_w i32[R] box-linear seed
    index, packed_val f32[R], rvalid bool[R]).
    """
    gx, gy, gz = cfg.grid_shape
    bx, by, bz = _carve_box_shape(cfg)
    clipped, rvalid, is_hit = _prep_rays(cfg, points, valid, origin)

    map_origin = jnp.asarray(cfg.origin, jnp.float32)
    po_grid = (origin - map_origin) / cfg.resolution - 0.5
    starts = _box_starts(cfg, po_grid)
    po_box = po_grid - starts.astype(jnp.float32)

    # Endpoint voxels in box coordinates.
    vox = pos_to_vox(cfg, clipped)
    vb = vox - starts
    in_box = jnp.all((vb >= 0) & (vb < jnp.array([bx, by, bz])), axis=-1)
    inside = in_box & vox_in_grid(cfg, vox)

    # Box-exit clip for rays leaving the box: standard slab exit parameter
    # along the (max-ray-clipped) ray, shrunk half a voxel so the seed
    # voxel lies strictly inside.
    lo_w = map_origin + starts.astype(jnp.float32) * cfg.resolution
    hi_w = lo_w + jnp.array([bx, by, bz], jnp.float32) * cfg.resolution
    u = clipped - origin
    safe_u = jnp.where(jnp.abs(u) < 1e-9, 1e-9, u)
    t_ax = jnp.where(u > 0, (hi_w - origin) / safe_u,
                     (lo_w - origin) / safe_u)
    s_exit = jnp.clip(jnp.min(t_ax, axis=-1), 0.0, 1.0)
    ulen = jnp.linalg.norm(u, axis=-1)
    exit_dist = s_exit * ulen - 0.5 * cfg.resolution
    exit_pt = origin + u * (exit_dist / jnp.maximum(ulen, 1e-9))[..., None]
    evox = pos_to_vox(cfg, exit_pt)
    evb = jnp.clip(evox - starts, 0, jnp.array([bx - 1, by - 1, bz - 1]))

    # ONE packed scatter carries class AND carve range W:
    #   hit endpoint (in box)      -> 2000 + true range
    #   clipped endpoint (in box)  -> 1000 + (max_ray + res)
    #   box-exit carve-only seed   -> 1000 + (exit_dist + res)
    # Max picks the hit class over any free seed at the same voxel
    # (SetOccupancy semantics); when a hit and a larger exit-W collide the
    # hit's smaller W wins, which only under-carves (the safe direction).
    seed_vb = jnp.where(inside[..., None], vb, evb)
    r = jnp.linalg.norm(points - origin, axis=-1)
    packed_val = jnp.where(
        inside & is_hit, 2000.0 + r,
        1000.0 + jnp.where(inside, cfg.max_ray_length + cfg.resolution,
                           exit_dist + cfg.resolution),
    ).astype(jnp.float32)
    lin_w = (seed_vb[..., 0] * (by * bz) + seed_vb[..., 1] * bz
             + seed_vb[..., 2])
    return starts, po_box, lin_w, packed_val, rvalid


def _seeds_from_packed(cfg: FiestaConfig, packed):
    """Decode the packed class+range splat [..., BX,BY,BZ] into
    (seeds f32, hit_b u8, epfree_b u8)."""
    hit_b = (packed >= 2000.0).astype(jnp.uint8)
    freeish = (packed >= 1000.0) & (packed < 2000.0)
    seeds = jnp.where(
        hit_b > 0, packed - 2000.0,
        jnp.where(freeish, packed - 1000.0, 0.0),
    )
    # endpoint free-observations: only max-ray-clipped endpoints INSIDE
    # the box count (exit-only seeds are not observations); recoverable
    # from W — the epfree W is exactly max_ray + res, exit Ws are smaller
    epfree_b = (
        freeish
        & (packed - 1000.0 >= cfg.max_ray_length + cfg.resolution - 1e-4)
    ).astype(jnp.uint8)
    return seeds, hit_b, epfree_b


def _scanline_seeds_batch(cfg: FiestaConfig, points, valid, origins,
                          transforms=None):
    """Batched endpoint splat: component-form per-ray prep + ONE flat
    scatter.

    points [K,P,3] (world-frame; SENSOR-frame when ``transforms`` [K,4,4]
    is given — the world transform then runs in component space), valid
    [K,P], origins [K,3] (ignored when transforms given).  Returns
    (starts [K,3], po_box [K,3], seeds [K,BX,BY,BZ], hit_b, epfree_b,
    rvalid [K,P]).

    ALL per-ray math runs on component ([K,P]) arrays: a [K,P,3] layout
    keeps the length-3 coordinate axis minormost, which XLA:TPU tiles
    onto the 128-lane dimension at 3/128 utilization — measured ~1.9 ms
    of pure layout waste per tick at cow scale for the pose einsum alone
    (PERF.md round 3).  The input is read through three strided slices
    (one relayout) and everything downstream is full-lane.
    """
    gx, gy, gz = cfg.grid_shape
    bx, by, bz = _carve_box_shape(cfg)
    nb = bx * by * bz
    components = isinstance(points, (tuple, list))
    k = points[0].shape[0] if components else points.shape[0]
    if k * nb >= 2**31:
        # the flat scatter index k*nb + lin_w is int32; past 2^31 it wraps
        # negative and mode="drop" silently discards those observations
        raise ValueError(
            f"flat endpoint splat index overflows int32: {k} scans x "
            f"{nb} box voxels = {k * nb} >= 2^31; reduce scans_per_tick "
            "or the carve box (max_ray_length/resolution)")
    res = cfg.resolution
    mx, my, mz = (np.float32(o) for o in cfg.origin)

    if components:
        # the depth tick hands (px, py, pz) [K,P] directly — no [K,P,3]
        # staging, no strided-slice relayout (round 5)
        px, py, pz = points
    else:
        px, py, pz = (points[..., j] for j in range(3))    # [K,P]
    if transforms is not None:
        r = transforms[:, :3, :3]
        wx, wy, wz = [
            px * r[:, i, 0, None] + py * r[:, i, 1, None]
            + pz * r[:, i, 2, None] + transforms[:, i, 3, None]
            for i in (0, 1, 2)]
        px, py, pz = wx, wy, wz
        origins = transforms[:, :3, 3]
    ox, oy, oz = (origins[:, j, None] for j in range(3))   # [K,1]

    # --- _prep_rays in component form ---
    valid = valid & jnp.isfinite(px) & jnp.isfinite(py) & jnp.isfinite(pz)
    dx, dy, dz = px - ox, py - oy, pz - oz
    length = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    rvalid = valid & (length >= cfg.min_ray_length)
    is_hit = length <= cfg.max_ray_length
    scale = jnp.where(
        is_hit, 1.0, cfg.max_ray_length / jnp.maximum(length, 1e-9))
    cx, cy, cz = ox + dx * scale, oy + dy * scale, oz + dz * scale

    # --- box placement (per scan, [K,3]): floor-to-8 BEFORE face clamp,
    # extent slack >= 7 — see _box_starts for the coverage guarantee
    map_origin = jnp.asarray(cfg.origin, jnp.float32)
    po_grid = (origins - map_origin) / res - 0.5
    starts = _box_starts(cfg, po_grid)
    po_box = po_grid - starts.astype(jnp.float32)
    sx0, sy0, sz0 = (starts[:, j, None] for j in range(3))  # [K,1] i32

    # --- endpoint voxels in box coordinates ---
    vx = jnp.floor((cx - mx) / res).astype(jnp.int32)
    vy = jnp.floor((cy - my) / res).astype(jnp.int32)
    vz = jnp.floor((cz - mz) / res).astype(jnp.int32)
    vbx, vby, vbz = vx - sx0, vy - sy0, vz - sz0
    in_box = ((vbx >= 0) & (vbx < bx) & (vby >= 0) & (vby < by)
              & (vbz >= 0) & (vbz < bz))
    inside = in_box & ((vx >= 0) & (vx < gx) & (vy >= 0) & (vy < gy)
                       & (vz >= 0) & (vz < gz))

    # --- box-exit clip for rays leaving the box ---
    lwx = mx + sx0.astype(jnp.float32) * res
    lwy = my + sy0.astype(jnp.float32) * res
    lwz = mz + sz0.astype(jnp.float32) * res
    hwx, hwy, hwz = lwx + bx * res, lwy + by * res, lwz + bz * res
    ux, uy, uz = cx - ox, cy - oy, cz - oz

    def t_axis(u, lo, hi, o):
        safe = jnp.where(jnp.abs(u) < 1e-9, 1e-9, u)
        return jnp.where(u > 0, (hi - o) / safe, (lo - o) / safe)

    s_exit = jnp.clip(
        jnp.minimum(jnp.minimum(t_axis(ux, lwx, hwx, ox),
                                t_axis(uy, lwy, hwy, oy)),
                    t_axis(uz, lwz, hwz, oz)), 0.0, 1.0)
    ulen = jnp.sqrt(ux * ux + uy * uy + uz * uz)
    exit_dist = s_exit * ulen - 0.5 * res
    f = exit_dist / jnp.maximum(ulen, 1e-9)
    ebx = jnp.clip(jnp.floor((ox + ux * f - mx) / res).astype(jnp.int32)
                   - sx0, 0, bx - 1)
    eby = jnp.clip(jnp.floor((oy + uy * f - my) / res).astype(jnp.int32)
                   - sy0, 0, by - 1)
    ebz = jnp.clip(jnp.floor((oz + uz * f - mz) / res).astype(jnp.int32)
                   - sz0, 0, bz - 1)

    # --- packed class+range value and flat scatter ---
    sxx = jnp.where(inside, vbx, ebx)
    syy = jnp.where(inside, vby, eby)
    szz = jnp.where(inside, vbz, ebz)
    packed_val = jnp.where(
        inside & is_hit, 2000.0 + length,
        1000.0 + jnp.where(inside, cfg.max_ray_length + cfg.resolution,
                           exit_dist + cfg.resolution),
    ).astype(jnp.float32)
    lin_w = sxx * (by * bz) + syy * bz + szz

    biglin = lin_w + (jnp.arange(k, dtype=jnp.int32) * nb)[:, None]
    # scatter target init via the bandwidth-rate Pallas fill: XLA's zeros
    # materialization is element-rate-bound (~1.2 ms at cow scale for
    # 11.2 M elements, PERF.md r3 ablation); the kernel output aliases
    # into the scatter in place
    from .pallas.fill import decode_packed_splat, zeros_f32
    lin_flat = jnp.where(rvalid, biglin, k * nb).ravel()
    val_flat = packed_val.ravel()
    if _SPLAT_ORDER == "sorted":
        # pre-sort the updates to earn XLA's sorted-indices scatter fast
        # path (~3-4x cheaper scatter, profile_splat.py row c); the drop
        # sentinel k*nb is the max key so it sorts (and drops) last.
        # Scatter-MAX is commutative, so reordering is bit-exact.
        srt = None
        if _SPLAT_SORT_IMPL == "pallas":
            from .pallas.sort import sort_pairs

            srt = sort_pairs(lin_flat, val_flat)
        if srt is None:
            srt = jax.lax.sort([lin_flat, val_flat], num_keys=1)
        lin_flat, val_flat = srt
        packed_flat = (
            zeros_f32(k * nb)
            .at[lin_flat].max(val_flat, mode="drop",
                              indices_are_sorted=True)
        )
    else:
        packed_flat = (
            zeros_f32(k * nb).at[lin_flat].max(val_flat, mode="drop")
        )
    # decode as a Pallas pass (HBM-bandwidth) where supported; the XLA
    # form is an ~11 M-element pass at element rate (~1 ms at cow scale)
    dec = decode_packed_splat(packed_flat, cfg.max_ray_length,
                              cfg.resolution)
    if dec is not None:
        seeds, hit_b, epfree_b = (
            a.reshape(k, bx, by, bz) for a in dec)
    else:
        seeds, hit_b, epfree_b = _seeds_from_packed(
            cfg, packed_flat.reshape(k, bx, by, bz))
    return starts, po_box, seeds, hit_b, epfree_b, rvalid


def _scanline_seeds(cfg: FiestaConfig, points, valid, origin):
    """Single-scan endpoint splat (K=1 wrapper over the batched path).

    Returns (starts i32[3], po_box f32[3], seeds f32[BX,BY,BZ],
    hit_b u8, epfree_b u8, rvalid bool[R]).
    """
    starts, po_box, seeds, hit_b, epfree_b, rvalid = _scanline_seeds_batch(
        cfg, points[None], valid[None], origin[None])
    return (starts[0], po_box[0], seeds[0], hit_b[0], epfree_b[0],
            rvalid[0])


def _box_window_mask(cfg, starts, window, box_shape):
    """Window mask expressed in carve-box coordinates."""
    bx, by, bz = box_shape
    wmin, wmax = window

    def axis_ok(n_, lo, hi, off):
        c = jnp.arange(n_, dtype=jnp.int32) + off
        return (c >= lo) & (c <= hi)

    return (
        axis_ok(bx, wmin[0], wmax[0], starts[..., 0])[..., :, None, None]
        & axis_ok(by, wmin[1], wmax[1], starts[..., 1])[..., None, :, None]
        & axis_ok(bz, wmin[2], wmax[2], starts[..., 2])[..., None, None, :]
    )


#: counter-application strategy for the batched integrator:
#:   "pallas" — in-place DMA region-add (ops/pallas/boxadd.py): HBM
#:              traffic is exactly the box regions; the DEFAULT on TPU
#:              (falls back to "rmw" off-TPU or when the kernel's layout
#:              constraints don't hold, box_add_supported)
#:   "rmw"    — K sequential slice read-modify-writes (round-2 form)
#:   "padded" — pad each box onto a zero grid, ADD in uint16, saturate
#:              ONCE.  Bit-identical (saturating u8 addition of
#:              nonnegative increments == min(a + sum, 255) when the sum
#:              accumulates in a wide type), but expressed as elementwise
#:              adds XLA can fuse into the downstream fusion pass instead
#:              of 4K dynamic-slice ops.
#: tests assert all modes agree; the default follows on-chip measurement
#: (override with FIESTA_BOX_APPLY=pallas|rmw|padded for A/B runs).
import os as _os  # noqa: E402

BOX_APPLY = _os.environ.get("FIESTA_BOX_APPLY", "pallas")
_BOX_APPLY_MODES = ("pallas", "rmw", "padded")


def apply_box_counts(hit_cnt, miss_cnt, starts, hitc, missc,
                     mode: Optional[str] = None):
    """Apply K scans' box-local counter contributions to the full grids.

    starts [K,3] i32; hitc/missc [K,BX,BY,BZ] u8.  See ``BOX_APPLY``.
    """
    kk = starts.shape[0]
    mode = mode or BOX_APPLY
    if mode not in _BOX_APPLY_MODES:
        raise ValueError(
            f"unknown box-apply mode {mode!r} (FIESTA_BOX_APPLY?); "
            f"expected one of {_BOX_APPLY_MODES}")
    if mode == "pallas":
        # in-place DMA region-add (ops/pallas/boxadd.py) — the XLA dus
        # chain costs a fixed ~1.4 ms full-grid select pass per tick;
        # requires the carve box to span the grid's z extent
        from .pallas.boxadd import box_add_inplace, box_add_supported

        if (jax.default_backend() == "tpu"
                and box_add_supported(hitc.shape[1:], hit_cnt.shape)):
            return box_add_inplace(hit_cnt, miss_cnt, starts, hitc, missc)
        mode = "rmw"
    if mode == "rmw":
        box = hitc.shape[1:]
        for i in range(kk):
            s0, s1, s2 = starts[i, 0], starts[i, 1], starts[i, 2]
            reg = jax.lax.dynamic_slice(hit_cnt, (s0, s1, s2), box)
            hit_cnt = jax.lax.dynamic_update_slice(
                hit_cnt, _sat_add_u8(reg, hitc[i]), (s0, s1, s2))
            reg = jax.lax.dynamic_slice(miss_cnt, (s0, s1, s2), box)
            miss_cnt = jax.lax.dynamic_update_slice(
                miss_cnt, _sat_add_u8(reg, missc[i]), (s0, s1, s2))
        return hit_cnt, miss_cnt
    ht = hit_cnt.astype(jnp.uint16)
    mt = miss_cnt.astype(jnp.uint16)
    zero = jnp.zeros(hit_cnt.shape, jnp.uint16)
    for i in range(kk):
        at = (starts[i, 0], starts[i, 1], starts[i, 2])
        ht = ht + jax.lax.dynamic_update_slice(
            zero, hitc[i].astype(jnp.uint16), at)
        mt = mt + jax.lax.dynamic_update_slice(
            zero, missc[i].astype(jnp.uint16), at)
    # one saturation on the wide sums == the sequential saturating adds
    # (increments are nonnegative; max possible sum 255 + 2K << 2^16)
    return (jnp.minimum(ht, 255).astype(jnp.uint8),
            jnp.minimum(mt, 255).astype(jnp.uint8))


def integrate_scan_scanline_batch(
    cfg: FiestaConfig,
    hit_cnt: jax.Array,
    miss_cnt: jax.Array,
    points: jax.Array,    # [K, P, 3] world-frame (sensor w/ transforms)
    valid: jax.Array,     # [K, P]
    origins: jax.Array,   # [K, 3]
    window: Optional[Tuple[jax.Array, jax.Array]] = None,
    transforms: Optional[jax.Array] = None,
) -> ScanResult:
    """K scans integrated with ONE batched carve (TPU production path).

    Same observation semantics as K sequential ``integrate_scan_scanline``
    calls (counts accumulate per scan); the carve sweeps of all K scans are
    fused so the serial slab dimension is paid once per update batch, not
    once per scan x orientation (see ``_octant_scan_batched``).
    ``transforms``: see ``_scanline_seeds_batch`` (sensor-frame input,
    world transform fused into the component-form prep).
    """
    starts, hitc, missc, n_rays, n_endpoints = scanline_batch_boxes(
        cfg, points, valid, origins, window, transforms=transforms
    )
    hit_cnt, miss_cnt = apply_box_counts(hit_cnt, miss_cnt, starts,
                                         hitc, missc)
    return ScanResult(hit_cnt, miss_cnt, n_rays, n_endpoints)


def scanline_batch_boxes(
    cfg: FiestaConfig,
    points: jax.Array,    # [K, P, 3] world-frame (sensor w/ transforms)
    valid: jax.Array,     # [K, P]
    origins: jax.Array,   # [K, 3]
    window: Optional[Tuple[jax.Array, jax.Array]] = None,
    transforms: Optional[jax.Array] = None,
):
    """Box-local observation contributions of K scans (carve included).

    Returns (starts [K,3] i32, hitc [K,BX,BY,BZ] u8, missc same,
    n_rays, n_endpoints).  Factored out of the full-grid integrator so the
    sharded pipeline can apply the same contributions to grid slabs.
    """
    box = _carve_box_shape(cfg)

    starts, po_box, seeds, hit_b, epfree_b, rvalid = _scanline_seeds_batch(
        cfg, points, valid, origins, transforms=transforms)

    if window is not None:
        wmask_b = jax.vmap(
            lambda s: _box_window_mask(cfg, s, window, box)
        )(starts)
        hit_b = jnp.where(wmask_b, hit_b, 0)
        epfree_b = jnp.where(wmask_b, epfree_b, 0)

    free = carve_free_mask_batch(cfg, seeds, po_box)
    if window is not None:
        free = free & wmask_b

    hitc = hit_b  # already u8 in {0,1}
    missc = jnp.maximum(hit_b, epfree_b) + free.astype(jnp.uint8)
    return (
        starts, hitc, missc,
        jnp.sum(rvalid, dtype=jnp.int32),
        jnp.sum(hit_b, dtype=jnp.int32)
        + jnp.sum(epfree_b, dtype=jnp.int32),
    )


def integrate_scan_scanline(
    cfg: FiestaConfig,
    hit_cnt: jax.Array,
    miss_cnt: jax.Array,
    points: jax.Array,
    valid: jax.Array,
    origin: jax.Array,
    window: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> ScanResult:
    """Scan integration via octant shadow-casting (TPU fast path).

    Endpoint observation ranges are splatted into a sensor-centered box
    (one small scatter), then ``carve_free_mask`` propagates them inward —
    no per-element gathers, which XLA executes at ~9 us per thousand
    elements on TPU (the panorama variant's bottleneck).  All dense work is
    box-local; the full-grid counters are touched only through dynamic
    slices.
    """
    bx, by, bz = _carve_box_shape(cfg)
    starts, po_box, seeds, hit_b, epfree_b, rvalid = _scanline_seeds(
        cfg, points, valid, origin
    )
    if window is not None:
        # the window gates which counters change; carve geometry (seeds)
        # is physical and ignores it
        wmask_b = _box_window_mask(cfg, starts, window, (bx, by, bz))
        hit_b = jnp.where(wmask_b, hit_b, 0)
        epfree_b = jnp.where(wmask_b, epfree_b, 0)

    free = carve_free_mask(cfg, seeds, po_box)
    if window is not None:
        free = free & wmask_b
    pathfree_b = free.astype(jnp.uint8)

    # Apply counts inside the box region of the full-grid counters.
    hitc = hit_b.astype(hit_cnt.dtype)
    missc = (
        jnp.maximum(hitc, epfree_b.astype(hit_cnt.dtype))
        + pathfree_b.astype(hit_cnt.dtype)
    )
    s0, s1, s2 = starts[0], starts[1], starts[2]
    hit_reg = jax.lax.dynamic_slice(hit_cnt, (s0, s1, s2), (bx, by, bz))
    hit_cnt = jax.lax.dynamic_update_slice(
        hit_cnt, _sat_add_u8(hit_reg, hitc), (s0, s1, s2))
    miss_reg = jax.lax.dynamic_slice(miss_cnt, (s0, s1, s2), (bx, by, bz))
    miss_cnt = jax.lax.dynamic_update_slice(
        miss_cnt, _sat_add_u8(miss_reg, missc), (s0, s1, s2))
    return ScanResult(
        hit_cnt,
        miss_cnt,
        jnp.sum(rvalid, dtype=jnp.int32),
        jnp.sum(hit_b, dtype=jnp.int32)
        + jnp.sum(epfree_b, dtype=jnp.int32),
    )


def _spherical_coords(delta, az_bins: int, el_bins: int):
    """Direction vectors [...,3] -> (range, az index, el index)."""
    r = jnp.linalg.norm(delta, axis=-1)
    az = jnp.arctan2(delta[..., 1], delta[..., 0])           # [-pi, pi]
    el = jnp.arcsin(jnp.clip(delta[..., 2] / jnp.maximum(r, 1e-9), -1.0, 1.0))
    ai = jnp.clip(
        jnp.floor((az / (2 * math.pi) + 0.5) * az_bins).astype(jnp.int32),
        0, az_bins - 1,
    )
    ei = jnp.clip(
        jnp.floor((el / math.pi + 0.5) * el_bins).astype(jnp.int32),
        0, el_bins - 1,
    )
    return r, ai, ei


def integrate_scan_projective(
    cfg: FiestaConfig,
    hit_cnt: jax.Array,
    miss_cnt: jax.Array,
    points: jax.Array,
    valid: jax.Array,
    origin: jax.Array,
    window: Optional[Tuple[jax.Array, jax.Array]] = None,
    az_bins: int = 1024,
    el_bins: int = 512,
    levels: int = 7,
) -> ScanResult:
    """Depth-panorama free-space carving with a max-depth mip pyramid.

    A voxel at range r subtends an angle ~res/r; it is considered carved if
    *any* ray within that angular footprint sees past it — exactly the DDA
    criterion "some ray crosses this voxel", evaluated as a gather instead of
    millions of scatter updates.  The footprint query uses a max-depth 2x2
    mip pyramid over the panorama: each voxel reads the level whose bin size
    matches its footprint.  Nearby voxels read coarse levels (rays are dense
    there), distant voxels read fine levels.

    Divergence from the reference's per-ray DDA (documented): free space is
    the union of per-footprint cones rather than exact voxel traversals, so
    carving can differ within ~1 voxel at depth silhouettes.  Occupied
    endpoints always win the fusion vote (2*hit >= miss), so obstacles are
    never erased by over-carving.
    """
    clipped, rvalid, is_hit = _prep_rays(cfg, points, valid, origin)
    hit_m, epfree_m = _endpoint_masks(cfg, clipped, rvalid, is_hit, window)

    # 1) scatter-max the scan into the panorama (max: "farthest evidence per
    #    direction"; unclipped ranges so long rays carve to max_ray_length).
    delta = points - origin
    r, ai, ei = _spherical_coords(delta, az_bins, el_bins)
    pix = jnp.where(rvalid, ai * el_bins + ei, az_bins * el_bins)
    pano = jnp.full((az_bins * el_bins,), -_F32_INF, jnp.float32)
    pano = pano.at[pix].max(
        jnp.minimum(r, cfg.max_ray_length + cfg.resolution).astype(jnp.float32),
        mode="drop",
    ).reshape(az_bins, el_bins)

    # 2) build the max-mip pyramid, flattened with per-level offsets.
    levels = min(
        levels,
        int(math.log2(az_bins & -az_bins)),  # available halvings
        int(math.log2(el_bins & -el_bins)),
    )
    pyramid = [pano]
    for _ in range(levels - 1):
        p = pyramid[-1]
        a, e = p.shape
        pyramid.append(
            p.reshape(a // 2, 2, e // 2, 2).max(axis=(1, 3))
        )
    flat = jnp.concatenate([p.reshape(-1) for p in pyramid])
    offsets = np.concatenate(
        [[0], np.cumsum([p.size for p in pyramid])[:-1]]
    ).astype(np.int32)

    # 3) every voxel gathers its footprint's max depth from its mip level.
    shape = cfg.grid_shape
    gx, gy, gz = shape
    map_origin = jnp.asarray(cfg.origin, jnp.float32)
    cxs = (jnp.arange(gx, dtype=jnp.float32) + 0.5) * cfg.resolution + map_origin[0]
    cys = (jnp.arange(gy, dtype=jnp.float32) + 0.5) * cfg.resolution + map_origin[1]
    czs = (jnp.arange(gz, dtype=jnp.float32) + 0.5) * cfg.resolution + map_origin[2]
    dxv = (cxs - origin[0])[:, None, None]
    dyv = (cys - origin[1])[None, :, None]
    dzv = (czs - origin[2])[None, None, :]
    dvox = jnp.stack(jnp.broadcast_arrays(dxv, dyv, dzv), axis=-1)
    rv, vai, vei = _spherical_coords(dvox, az_bins, el_bins)

    base_ang = 2 * math.pi / az_bins
    foot = cfg.resolution / jnp.maximum(rv, cfg.resolution)
    lvl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(foot / base_ang, 1.0))).astype(jnp.int32),
        0, levels - 1,
    )
    el_l = jnp.asarray(
        [el_bins >> l for l in range(levels)], jnp.int32
    )[lvl]
    idx = (
        jnp.asarray(offsets)[lvl]
        + (vai >> lvl) * el_l
        + (vei >> lvl)
    )
    depth = flat[idx.reshape(-1)].reshape(shape)

    free = (
        (rv >= cfg.min_ray_length)
        & (rv <= cfg.max_ray_length)
        & (rv < depth - cfg.resolution)   # -inf depth => unobserved => False
    )
    if window is not None:
        wmin, wmax = window
        free = free & make_window_mask(cfg, wmin, wmax)
    pathfree_m = free.astype(jnp.uint8)

    hit_cnt, miss_cnt = _apply_counts(hit_cnt, miss_cnt, hit_m, epfree_m, pathfree_m)
    return ScanResult(
        hit_cnt,
        miss_cnt,
        jnp.sum(rvalid, dtype=jnp.int32),
        jnp.sum(hit_m.astype(jnp.int32)) + jnp.sum(epfree_m.astype(jnp.int32)),
    )
