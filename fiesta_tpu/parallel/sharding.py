"""Multi-device spatial sharding of the ESDF grid (new design scope).

The reference is a single-process CPU node; its only "scale axis" is the
local-map window (SURVEY.md section 5).  The TPU-native scale-out shards the
voxel grid by X-slabs across a device mesh:

  * all fusion / masking ops are elementwise -> free under GSPMD;
  * the relaxation sweep is a 2-reach stencil -> per-sweep halo exchange of
    2 boundary planes via ``ppermute`` over ICI inside ``shard_map``;
  * convergence is a ``psum`` of per-shard change flags, so the whole
    iterate-exchange-iterate loop stays on device (SURVEY.md section 7,
    "halo correctness for sharded wavefronts").

Rays/scans are replicated; each shard keeps only scatter targets that fall
in its slab (mode="drop" does this naturally with local indices).
"""

from __future__ import annotations




from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FiestaConfig
from ..grid import INF_D2, MapState, UNDEFINED_COORD, coord_grids

def _stencil_reach(dirs) -> int:
    """Halo width = the stencil's maximum per-axis reach (2 for the
    reference default 24-stencil, 3 for the 62-stencil alternative)."""
    return max(abs(int(c)) for off in dirs for c in off)


def make_mesh(n_devices: int) -> Mesh:
    avail = jax.devices()
    if len(avail) < n_devices:
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(avail)} "
            "devices are visible (set XLA_FLAGS="
            "--xla_force_host_platform_device_count=N for a virtual mesh)")
    return Mesh(np.array(avail[:n_devices]), ("x",))


def distributed_mesh(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> Mesh:
    """Multi-host mesh over ICI/DCN: initialize the ``jax.distributed``
    runtime (args default to the standard JAX_* / cloud-TPU environment
    variables) and return the 1-D X-slab mesh over ALL global devices.

    Every sharded entry point in this module (``sharded_esdf_update``,
    ``sharded_fused_tick``, the MPC planner's rollout sharding) is written
    against an abstract mesh, so the same program runs on one host's chips
    or a multi-host slice — XLA lays the ``ppermute`` halo exchanges and
    ``psum`` reductions onto ICI within a slice and DCN across slices.
    Single-process virtual meshes (tests, ``__graft_entry__``) use
    ``make_mesh`` instead; this helper is the production multi-host entry
    and is exercised per-release on real slices (it cannot run in a
    single-host CI).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return Mesh(np.array(jax.devices()), ("x",))


def state_shardings(mesh: Mesh, state: Optional[MapState] = None,
                    closest_packed: Optional[bool] = None) -> MapState:
    """NamedShardings for MapState: [X,Y,Z] arrays sharded on X.

    The closest field's format is INFERRED from ``state`` when given
    (the only unambiguous source): the rebuild production format stores
    closest as one packed [X,Y,Z] int32 (grid.closest_packed_state) —
    sharded like any grid field; the [3,X,Y,Z] plane format shards on
    its axis 1.  With neither ``state`` nor an explicit
    ``closest_packed``, the PACKED production format is assumed (a
    rank-4 spec on a rank-3 array — or vice versa — fails loudly at
    device_put; prefer passing the state)."""
    if closest_packed is None:
        closest_packed = True if state is None else state.closest.ndim == 3
    s3 = NamedSharding(mesh, P("x", None, None))
    s4 = NamedSharding(mesh, P(None, "x", None, None))
    return MapState(
        logodds=s3, d2=s3, closest=s3 if closest_packed else s4,
        seen=s3, hit_cnt=s3, miss_cnt=s3
    )


def shard_state(state: MapState, mesh: Mesh) -> MapState:
    sh = state_shardings(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


# ---------------------------------------------------------------------------
# Sharded relaxation with halo exchange
# ---------------------------------------------------------------------------


def _halo_exchange_x(closest_local: jax.Array, axis: str,
                     pad: int) -> jax.Array:
    """Concatenate ``pad``-plane halos from x-neighbors onto a local
    [3,Lx,Y,Z] block -> [3, Lx+2*pad, Y, Z].  Non-periphery shards
    exchange over ICI; boundary shards see UNDEFINED fill (out-of-grid).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    right_edge = closest_local[:, -pad:]        # planes sent rightward
    left_edge = closest_local[:, :pad]          # planes sent leftward

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(right_edge, axis, fwd)
    from_right = jax.lax.ppermute(left_edge, axis, bwd)

    undef = jnp.full_like(from_left, UNDEFINED_COORD)
    from_left = jnp.where(idx == 0, undef, from_left)
    from_right = jnp.where(idx == n - 1, undef, from_right)
    return jnp.concatenate([from_left, closest_local, from_right], axis=1)


def _relax_once_local(
    d2, closest, x_offset, dirs, update_mask, source_mask, axis, pad
):
    """One sweep on a local X-slab with fresh halos.

    ``x_offset``: global x index of the slab's first plane (so candidate
    distances use *global* coordinates stored in ``closest``).
    """
    shape = d2.shape
    self_c = coord_grids(shape).astype(jnp.int32)
    self_c = self_c.at[0].add(x_offset)

    src = closest
    if source_mask is not None:
        src = jnp.where(source_mask[None], closest, UNDEFINED_COORD)
    ext = _halo_exchange_x(src, axis, pad)           # [3, Lx+2p, Y, Z]
    padded = jnp.pad(
        ext,
        ((0, 0), (0, 0), (pad, pad), (pad, pad)),
        constant_values=np.int16(-1),
    )

    best_d2, best_c = d2, closest
    gx, gy, gz = shape
    for off in dirs:
        dx, dy, dz = (int(o) for o in off)
        nb = jax.lax.slice(
            padded,
            (0, pad + dx, pad + dy, pad + dz),
            (3, pad + dx + gx, pad + dy + gy, pad + dz + gz),
        )
        nb32 = nb.astype(jnp.int32)
        defined = nb[0] >= 0
        diff = self_c - nb32
        cand = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
        better = defined & (cand < best_d2)
        best_d2 = jnp.where(better, cand, best_d2)
        best_c = jnp.where(better[None], nb, best_c)

    if update_mask is not None:
        best_d2 = jnp.where(update_mask, best_d2, d2)
        best_c = jnp.where(update_mask[None], best_c, closest)
    changed = jnp.any(best_d2 < d2)
    return best_d2, best_c, changed


def sharded_relax_to_fixpoint(cfg: FiestaConfig, mesh: Mesh,
                              max_iters: int = 0, use_masks: bool = True):
    """Build the jitted sharded relaxation: iterate sweeps with per-sweep
    halo exchange until no shard reports a change (global psum).

    ``use_masks=False`` builds the global-update variant without mask
    inputs: every sweep then skips the full-grid mask where()s (the
    single-device global path passes None for the same reason)."""
    dirs = cfg.stencil
    pad = _stencil_reach(dirs)
    gx = cfg.grid_shape[0]
    n = mesh.devices.size
    assert gx % n == 0, f"grid X={gx} must divide by mesh size {n}"
    lx = gx // n
    assert lx >= pad, (
        f"X-slab of {lx} planes cannot serve a reach-{pad} stencil halo "
        f"(need >= {pad} planes per device)")

    def local_fn(d2, closest, update_mask=None, source_mask=None):
        x_offset = jax.lax.axis_index("x").astype(jnp.int32) * lx

        def cond(c):
            _, _, go, it = c
            ok = go
            if max_iters:
                ok = ok & (it < max_iters)
            return ok

        def body(c):
            d2_, c_, _, it = c
            d2n, cn, changed = _relax_once_local(
                d2_, c_, x_offset, dirs, update_mask, source_mask,
                "x", pad,
            )
            any_changed = jax.lax.psum(changed.astype(jnp.int32), "x") > 0
            return d2n, cn, any_changed, it + 1

        d2f, cf, _, iters = jax.lax.while_loop(
            cond, body, (d2, closest, jnp.bool_(True), jnp.int32(0))
        )
        return d2f, cf, iters

    slab3 = P("x", None, None)
    in_specs = (slab3, P(None, "x", None, None))
    if use_masks:
        in_specs = in_specs + (slab3, slab3)
    sm = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(slab3, P(None, "x", None, None), P()),
        check_vma=False,  # pallas_call inside shard_map has no vma info
    )
    return jax.jit(sm)


def _halo_planes_x(f: jax.Array, t: int, n: int, axis: str, fill):
    """Extend a local x-slab [Lx, Y, Z] with ``t`` planes from each side.

    Multi-hop: when t exceeds the slab extent Lx, whole intermediate slabs
    are relayed (hop k fetches from the neighbor k steps away), so the
    truncation radius is NOT limited by the per-device extent.  Boundary
    shards see ``fill``.  Total traffic: t planes per side regardless of
    hop count.
    """
    if n == 1:
        pad = jnp.full((t,) + f.shape[1:], fill, f.dtype)
        return jnp.concatenate([pad, f, pad], axis=0)
    lx = f.shape[0]
    idx = jax.lax.axis_index(axis)
    hops = -(-t // lx)
    left_parts, right_parts = [], []
    for k in range(1, hops + 1):
        take = min(lx, t - (k - 1) * lx)
        fwd = [(i, (i + k) % n) for i in range(n)]
        bwd = [(i, (i - k) % n) for i in range(n)]
        blk_l = jax.lax.ppermute(f[lx - take:], axis, fwd)
        blk_r = jax.lax.ppermute(f[:take], axis, bwd)
        filler = jnp.full_like(blk_l, fill)
        blk_l = jnp.where(idx < k, filler, blk_l)
        blk_r = jnp.where(idx >= n - k, filler, blk_r)
        left_parts.insert(0, blk_l)    # farthest hop first
        right_parts.append(blk_r)
    return jnp.concatenate(left_parts + [f] + right_parts, axis=0)


def sharded_truncated_edt(cfg: FiestaConfig, mesh: Mesh, trunc_vox: int):
    """Multi-chip exact truncated EDT over an X-sharded grid.

    The windowed min-plus pass along the sharded axis reads +-T neighbor
    planes: each shard receives T boundary planes over ICI (multi-hop
    ``ppermute`` relays when T exceeds the slab extent), then all three
    passes run shard-locally.  The y/z passes touch only local data.
    Communication volume per update is 2 * T * Y * Z * 4 bytes per shard
    boundary — independent of world size.

    Returns a jitted fn: occupied [X,Y,Z] bool (sharded) -> d2 int32
    (sharded).
    """
    n = mesh.devices.size
    local = _local_truncated_edt(cfg, n, trunc_vox)
    sm = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P("x", None, None),
        out_specs=P("x", None, None),
        check_vma=False,  # pallas_call inside shard_map has no vma info
    )
    return jax.jit(sm)


def _compose_l1_x(p: jax.Array, t: int, lx: int, n: int, axis: str,
                  ba: int = 0) -> jax.Array:
    """Cross-shard composition of a shard-local truncated-L1 x-pass.

    The L1 min-plus kernel COMPOSES (unlike the parabola): the global L1
    distance of local plane ``i`` is

        min( local(i),  E_left + (i+1),  F_right + (lx - i) )

    where E_left is the accumulated seed distance at the LEFT neighbor's
    right edge (over all shards to the left) and F_right symmetrically.
    The edge vectors are themselves a min-plus prefix scan over shards,
    computed with log-hop ``ppermute`` doubling — O(log ceil(t/lx)) EDGE
    planes of traffic per shard instead of the T raw input planes a
    halo-based x-pass ships (round-2 VERDICT item 2: 2*T*Y*Z*4 B per
    boundary at cow scale = 12.8 MB, now ~4 edge planes = 0.5 MB).

    Works unchanged on PACKED values (l1<<ba | payload, ``ba`` > 0):
    integer min is lexicographic, offsets add above the payload, and the
    telescoping |i-j| = delta + |edge-j| is exact — so the composed packed
    candidates are IDENTICAL (value and tie-break payload) to the ones a
    single-device pass over the full axis produces.

    ``p``: [lx, Y, Z] int32, local raw L1 (clamped to t+1) or raw packed.
    """
    if n == 1:
        return p
    idx = jax.lax.axis_index(axis)
    big = np.int32((t + 1) << ba)
    e = p[lx - 1]                       # right-edge accumulated distance
    f = p[0]                            # left-edge accumulated distance
    # prefix-scan doubling over shards: after offsets 1,2,...,2^(m-1) the
    # edge vectors cover every shard within 2^m - 1; shards further than
    # H = (t-1)//lx + 1 cannot influence any local plane within t
    h_need = min(n - 1, (t - 1) // lx + 1)
    j = 1
    while j <= h_need:
        off = np.int32((j * lx) << ba)
        fwd = [(i, (i + j) % n) for i in range(n)]
        bwd = [(i, (i - j) % n) for i in range(n)]
        e_from_left = jax.lax.ppermute(e, axis, fwd)
        f_from_right = jax.lax.ppermute(f, axis, bwd)
        e = jnp.minimum(e, jnp.where(idx < j, big, e_from_left + off))
        f = jnp.minimum(f, jnp.where(idx >= n - j, big,
                                     f_from_right + off))
        j *= 2
    # one more hop: each shard reads its LEFT neighbor's composed right
    # edge and its RIGHT neighbor's composed left edge
    e_prev = jax.lax.ppermute(e, axis, [(i, (i + 1) % n) for i in range(n)])
    f_next = jax.lax.ppermute(f, axis, [(i, (i - 1) % n) for i in range(n)])
    e_prev = jnp.where(idx == 0, big, e_prev)
    f_next = jnp.where(idx == n - 1, big, f_next)

    iota = jnp.arange(lx, dtype=jnp.int32)[:, None, None]
    cand_l = e_prev[None] + ((iota + 1) << ba)
    cand_r = f_next[None] + ((lx - iota) << ba)
    return jnp.minimum(p, jnp.minimum(cand_l, cand_r))


def _local_truncated_edt(cfg: FiestaConfig, n: int, trunc_vox: int):
    """Shard-local body of the sharded truncated EDT (see above)."""
    from ..ops.pallas.edt import _INF_EDT, _minplus_pass, l1_pass, square_l1

    gx = cfg.grid_shape[0]
    assert gx % n == 0
    t = int(trunc_vox)
    lx = gx // n

    def local_fn(occupied):
        f = jnp.where(occupied, 0, _INF_EDT).astype(jnp.int32)
        # pass 1 along x: LOCAL raw L1, composed across shards through
        # log-hop edge planes (no T-plane halos, no redundant halo
        # compute), then squared/truncated
        d = l1_pass(f, t)
        d = _compose_l1_x(d, t, lx, n, "x")
        p1 = square_l1(d, t)
        # passes 2 (y) and 3 (z) are local
        p2 = _minplus_pass(p1.transpose(1, 0, 2), t)
        p3 = _minplus_pass(p2.transpose(2, 1, 0), t)
        d2 = p3.transpose(1, 2, 0)
        return jnp.where(d2 <= t * t, d2, INF_D2)

    return local_fn


def sharded_closest_supported(cfg: FiestaConfig) -> bool:
    """Whether the sharded rebuild can track closest-obstacle coords: the
    packed-argmin bit budget must fit (edt.closest_plan on the GLOBAL
    shape) and the sharded X axis must carry either the leading binary
    pass (plan a == 0 — the composable production layout: cross-shard
    traffic is log-hop edge planes) or the split-sign pass (plan c == 0 —
    legacy halo layout: T packed planes per side)."""
    from ..ops.pallas.edt import closest_plan, trunc_vox_for

    if not cfg.track_closest:
        return False
    t_total = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    t_fine = trunc_vox_for(cfg.resolution, cfg.edt_fine_dist)
    gshape = cfg.grid_shape

    def ok(shape, t):
        plan = closest_plan(shape, t)
        return plan is not None and (plan["a"] == 0 or plan["c"] == 0)

    if t_fine < t_total and all(g % 2 == 0 for g in gshape):
        coarse = tuple(g // 2 for g in gshape)
        return ok(gshape, t_fine) and ok(coarse, -(-t_total // 2))
    return ok(gshape, t_total)


def _local_edt_closest(shape, n: int, trunc_vox: int, coord_scale: int = 1):
    """Shard-local truncated EDT WITH closest tracking over an X-sharded
    grid of GLOBAL ``shape``.

    Same packed-argmin pipeline as edt.truncated_edt_d2_closest (which
    see), in one of two layouts:

      * plan a == 0 (PRODUCTION): the leading binary/L1 pass runs on the
        sharded axis in its composable raw form — payloads carry GLOBAL x
        coordinates and the cross-shard propagation is the same log-hop
        edge-plane composition the d2-only path uses
        (``_compose_l1_x`` on packed values; round-2 VERDICT item 2).
        The window and split passes are then fully shard-local.
      * plan c == 0 (fallback for budgets where the x-lead layout does
        not fit): payload passes local, split pass over a T-plane
        halo-extended block (T packed planes of ICI per side).

    Both are bit-exact vs the single-device transform: closest_plan
    prefers the x-lead layout whenever it fits, so single-device and
    sharded use the same plan and identical lexicographic tie-breaks.

    ``coord_scale`` multiplies the produced closest coords (2 for the
    hierarchical coarse level).  Returns local_fn(occupied_local, x0) ->
    (d2_local, closest_local [3,lx,Y,Z] int16).
    """
    from ..grid import UNDEFINED_COORD
    from ..ops.pallas.edt import closest_plan

    plan = closest_plan(shape, trunc_vox)
    assert plan is not None and (plan["a"] == 0 or plan["c"] == 0)
    t, ba, bb, s = plan["t"], plan["ba"], plan["bb"], plan["s"]
    lx = shape[0] // n

    if plan["a"] == 0:
        b_ax, c_ax = plan["b"], plan["c"]

        def local_fn(occupied, x0):
            from ..ops.pallas.edt import (
                _binary_packed_pallas,
                _binary_packed_xla,
                _split_packed_pallas,
                _split_packed_xla,
                _window_packed_pallas,
                _window_packed_xla,
                square_packed_l1,
            )

            on_tpu = jax.default_backend() == "tpu"
            occ_l = occupied.astype(jnp.uint8)    # [lx, Y, Z], x leading
            if on_tpu:
                p1 = _binary_packed_pallas(occ_l, plan, square=False)
            else:
                p1 = _binary_packed_xla(occ_l, plan, square=False)
            # globalize the payload (payload bits are the low ba bits and
            # local iota + x0 < 2^ba, so plain addition cannot carry into
            # the value field), compose across shards, then square
            p1 = _compose_l1_x(p1 + x0, t, lx, n, "x", ba=ba)
            p1 = square_packed_l1(p1, plan)

            # pass 2 (window) along B, pass 3 (split) along C — both local
            perm2 = {1: (1, 0, 2), 2: (2, 0, 1)}[b_ax]
            p2in = p1.transpose(perm2)            # [B, lx, other]
            if on_tpu:
                p2 = _window_packed_pallas(p2in, plan)
            else:
                p2 = _window_packed_xla(p2in, plan)
            # current layout axes (local ids): (b_ax, 0, c_ax)
            if on_tpu:
                vps = _split_packed_pallas(p2.transpose(2, 1, 0), plan)
            else:
                vps = _split_packed_xla(p2.transpose(2, 1, 0), plan)
            # layout now (c_ax, 0, b_ax)

            from ..ops.pallas.edt import unpack_split

            val, sign, bstar, astar = unpack_split(vps, plan)
            lshape = val.shape
            ia = jax.lax.broadcasted_iota(jnp.int32, lshape, 1) + x0
            ib = jax.lax.broadcasted_iota(jnp.int32, lshape, 2)
            ic = jax.lax.broadcasted_iota(jnp.int32, lshape, 0)
            # astar is already GLOBAL (payload globalized before compose)
            dc2 = val - (ia - astar) ** 2 - (ib - bstar) ** 2
            dc = jnp.round(
                jnp.sqrt(jnp.maximum(dc2, 0).astype(jnp.float32))
            ).astype(jnp.int32)
            cstar = jnp.where(sign > 0, ic + dc, ic - dc)

            valid = val <= t * t
            d2 = jnp.where(valid, val, INF_D2)
            undef = jnp.int16(UNDEFINED_COORD)
            coords = [None, None, None]
            coords[0] = astar
            coords[b_ax] = bstar
            coords[c_ax] = cstar
            sc = jnp.int16(coord_scale)
            closest = jnp.stack(
                [jnp.where(valid, c.astype(jnp.int16) * sc, undef)
                 for c in coords])
            inv = tuple(int(i) for i in np.argsort((c_ax, 0, b_ax)))
            d2 = d2.transpose(inv)
            closest = closest.transpose((0,) + tuple(i + 1 for i in inv))
            return d2, closest

        return local_fn

    a_ax, b_ax = plan["a"], plan["b"]
    cap_fill = np.int32(plan["cap"] << s)

    def local_fn(occupied, x0):
        from ..ops.pallas.edt import (
            _binary_packed_pallas,
            _binary_packed_xla,
            _split_packed_pallas,
            _split_packed_xla,
            _window_packed_pallas,
            _window_packed_xla,
        )

        on_tpu = jax.default_backend() == "tpu"
        # local layout [lx, Y, Z]; A/B are the unsharded axes
        occ_t = occupied.transpose(a_ax, b_ax, 0).astype(jnp.uint8)
        if on_tpu:
            p1 = _binary_packed_pallas(occ_t, plan)
            p2 = _window_packed_pallas(p1.transpose(1, 0, 2), plan)
        else:
            p1 = _binary_packed_xla(occ_t, plan)
            p2 = _window_packed_xla(p1.transpose(1, 0, 2), plan)
        p3in = p2.transpose(2, 1, 0)              # [lx, A, B]
        ext = _halo_planes_x(p3in, t, n, "x", cap_fill)
        if on_tpu:
            vps = _split_packed_pallas(ext, plan)
        else:
            vps = _split_packed_xla(ext, plan)
        vps = vps[t:-t]                           # crop the halo rows

        # epilogue with GLOBAL x coordinates (layout [lx, A, B])
        from ..ops.pallas.edt import unpack_split

        val, sign, bstar, astar = unpack_split(vps, plan)
        lshape = val.shape
        ia = jax.lax.broadcasted_iota(jnp.int32, lshape, 1)
        ib = jax.lax.broadcasted_iota(jnp.int32, lshape, 2)
        ic = jax.lax.broadcasted_iota(jnp.int32, lshape, 0) + x0
        dc2 = val - (ia - astar) ** 2 - (ib - bstar) ** 2
        dc = jnp.round(jnp.sqrt(jnp.maximum(dc2, 0).astype(jnp.float32))
                       ).astype(jnp.int32)
        cstar = jnp.where(sign > 0, ic + dc, ic - dc)

        valid = val <= t * t
        d2 = jnp.where(valid, val, INF_D2)
        undef = jnp.int16(UNDEFINED_COORD)
        coords = [None, None, None]
        coords[a_ax] = astar
        coords[b_ax] = bstar
        coords[0] = cstar
        sc = jnp.int16(coord_scale)
        closest = jnp.stack(
            [jnp.where(valid, c.astype(jnp.int16) * sc, undef)
             for c in coords])
        # back to natural local [lx, Y, Z] ordering
        inv = tuple(int(i) for i in np.argsort((0, a_ax, b_ax)))
        d2 = d2.transpose(inv)
        closest = closest.transpose((0,) + tuple(i + 1 for i in inv))
        return d2, closest

    return local_fn


def _local_rebuild_esdf(cfg: FiestaConfig, n: int,
                        with_closest: Optional[bool] = None):
    """Shard-local production distance derivation, mirroring
    pipeline.rebuild_esdf feature for feature: single-level or
    hierarchical EDT, with closest tracking when supported.

    ``with_closest``: None = auto (track when supported — the eager
    cadence); False = d2 only (the lazy tick, pipeline.tick_rebuild_esdf
    analog); True = require tracking support (the lazy derive path).

    Returns local_fn(occupied_local, x0) -> (d2_local, closest_or_None).
    """
    from ..grid import UNDEFINED_COORD
    from ..ops.pallas.edt import trunc_vox_for

    t_total = trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    t_fine = trunc_vox_for(cfg.resolution, cfg.edt_fine_dist)
    gshape = cfg.grid_shape
    hier = t_fine < t_total and all(g % 2 == 0 for g in gshape)
    track = sharded_closest_supported(cfg) and with_closest is not False
    if with_closest and not track:
        raise ValueError(
            "closest derivation requested on a config the sharded argmin "
            "engine cannot serve (sharded_closest_supported)")
    lx = gshape[0] // n

    if not hier:
        plain = _local_truncated_edt(cfg, n, t_total)
        if not track:
            return lambda occ, x0: (plain(occ), None)
        withc = _local_edt_closest(gshape, n, t_total)
        return lambda occ, x0: withc(occ, x0)

    # hierarchical: exact fine field + half-resolution far field
    assert lx % 2 == 0, (
        f"hierarchical sharded EDT needs an even per-device slab "
        f"(lx={lx}); use a mesh size where (X/n) is even")
    coarse_shape = tuple(g // 2 for g in gshape)
    t_coarse = -(-t_total // 2)

    def downsample_local(occ):
        a, b, c = occ.shape
        if jax.default_backend() == "tpu":
            from ..ops.pallas.edt import _downsample2_any

            return _downsample2_any(occ)
        return occ.reshape(a // 2, 2, b // 2, 2, c // 2, 2).any(
            axis=(1, 3, 5))

    if track:
        fine_fn = _local_edt_closest(gshape, n, t_fine)
        coarse_fn = _local_edt_closest(coarse_shape, n, t_coarse,
                                       coord_scale=2)

        def local_fn(occ, x0):
            fine_d2, fine_cl = fine_fn(occ, x0)
            d2c, clc = coarse_fn(downsample_local(occ), x0 // 2)
            d2c = jnp.where(d2c >= INF_D2, INF_D2, d2c * 4)
            up = jnp.repeat(jnp.repeat(jnp.repeat(d2c, 2, 0), 2, 1), 2, 2)
            clc = jnp.where(clc < 0, jnp.int16(UNDEFINED_COORD), clc)
            cl_up = jnp.repeat(
                jnp.repeat(jnp.repeat(clc, 2, 1), 2, 2), 2, 3)
            use_fine = fine_d2 < INF_D2
            return (jnp.where(use_fine, fine_d2, up),
                    jnp.where(use_fine[None], fine_cl, cl_up))

        return local_fn

    from ..ops.pallas.edt import _INF_EDT, _minplus_pass, l1_pass, square_l1

    def edt_level(occ, t, n_):
        f = jnp.where(occ, 0, _INF_EDT).astype(jnp.int32)
        d = _compose_l1_x(l1_pass(f, t), t, f.shape[0], n_, "x")
        p1 = square_l1(d, t)
        p2 = _minplus_pass(p1.transpose(1, 0, 2), t)
        p3 = _minplus_pass(p2.transpose(2, 1, 0), t)
        d2 = p3.transpose(1, 2, 0)
        return jnp.where(d2 <= t * t, d2, INF_D2)

    def local_fn(occ, x0):
        fine = edt_level(occ, t_fine, n)
        d2c = edt_level(downsample_local(occ), t_coarse, n)
        d2c = jnp.where(d2c >= INF_D2, INF_D2, d2c * 4)
        up = jnp.repeat(jnp.repeat(jnp.repeat(d2c, 2, 0), 2, 1), 2, 2)
        return jnp.where(fine < INF_D2, fine, up), None

    return local_fn


def sharded_rebuild_esdf(cfg: FiestaConfig, mesh: Mesh):
    """Jitted sharded distance re-derivation: occupied [X,Y,Z] (sharded)
    -> (d2, closest-or-None), mirroring pipeline.rebuild_esdf.  Used by
    archive restores / scroll recenters on the mesh."""
    n = mesh.devices.size
    gx = cfg.grid_shape[0]
    assert gx % n == 0, f"grid X={gx} must divide by mesh size {n}"
    lx = gx // n
    # lazy closest mode: restores re-derive d2 only, like the lazy tick
    # (queries re-derive closest via the engine's closest_grid)
    local = _local_rebuild_esdf(
        cfg, n, with_closest=False if cfg.lazy_closest else None)
    track = sharded_closest_supported(cfg) and not cfg.lazy_closest
    from ..grid import closest_packed_state, pack_closest

    cl_packed = closest_packed_state(cfg)

    def local_fn(occupied):
        x0 = jax.lax.axis_index("x").astype(jnp.int32) * lx
        d2, closest = local(occupied, x0)
        if track and cl_packed:
            closest = pack_closest(closest)
        return (d2, closest) if track else (d2,)

    s3 = P("x", None, None)
    scl = s3 if cl_packed else P(None, "x", None, None)
    outs = (s3, scl) if track else (s3,)
    sm = jax.shard_map(
        local_fn, mesh=mesh, in_specs=s3, out_specs=outs,
        check_vma=False,
    )

    @jax.jit
    def rebuild(occupied):
        r = sm(occupied)
        return (r[0], r[1]) if track else (r[0], None)

    return rebuild


def sharded_derive_closest(cfg: FiestaConfig, mesh: Mesh):
    """Jitted sharded closest derivation for the LAZY query path
    (pipeline.derive_closest on the mesh): logodds [X,Y,Z] (sharded) ->
    closest grid (packed int32 sharded on x, or i16 planes sharded on
    axis 1).  Bitwise the grid an eager sharded tick writes — the argmin
    rides the same composable passes (_local_edt_closest), and the
    sharded tick is itself bit-exact vs single-device."""
    from ..grid import closest_packed_state, occupied_grid, pack_closest

    n = mesh.devices.size
    gx = cfg.grid_shape[0]
    assert gx % n == 0, f"grid X={gx} must divide by mesh size {n}"
    lx = gx // n
    local = _local_rebuild_esdf(cfg, n, with_closest=True)
    cl_packed = closest_packed_state(cfg)

    def local_fn(logodds):
        x0 = jax.lax.axis_index("x").astype(jnp.int32) * lx
        occ = occupied_grid(cfg, logodds)     # elementwise, shard-local
        _, closest = local(occ, x0)
        return pack_closest(closest) if cl_packed else closest

    s3 = P("x", None, None)
    scl = s3 if cl_packed else P(None, "x", None, None)
    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh, in_specs=s3, out_specs=scl,
        check_vma=False,
    ))


def sharded_fused_tick(cfg: FiestaConfig, mesh: Mesh):
    """Full production mapping tick over an X-sharded grid: batched scan
    carve + occupancy fusion + truncated-EDT rebuild in ONE device program.

    Layout (SURVEY.md section 5 "distributed communication backend"):
      * grid arrays are X-slab sharded;
      * the SCAN axis of the carve is physically sharded too: scans are
        padded to a multiple of the mesh size and each device splats +
        sweeps only its own scans (the multi-chip form of the reference's
        ray-thread parallelism, Fiesta.h:290-301), then the per-scan box
        counter contributions are all-gathered (sensor-local boxes — a
        few MB each — so traffic is world-size independent) and every
        device applies the slab-intersecting parts.  Round 1 replicated
        this stage on every device; measured on the virtual mesh that
        inflated total work ~4.6x at n=8 (bench_scaling.py), capping
        strong-scaling efficiency at ~0.22 — sharding the scan axis
        removes the replicated splat+sweep work;
      * fusion is elementwise-local;
      * the EDT rebuild along x uses multi-hop ``ppermute`` halos of T
        planes per side (ICI traffic independent of world size);
      * the only global reductions are the three scalar stats ``psum``s.

    Feature parity with the single-device tick: exact or hierarchical EDT
    (``edt_fine_dist``), local-window updates (``global_update=False``,
    reference C17), and closest-obstacle tracking (gated by
    ``sharded_closest_supported`` — the split-sign argmin pass must land
    on the sharded axis; its payload passes are then shard-local and only
    the packed planes ride the existing halos).
    Returns a jitted fn (state, points [K,P,3] sensor-frame, valids,
    transforms [K,4,4], cur_pos) -> (state, UpdateStats).
    """
    from ..ops import fusion, raycast
    from ..pipeline import UpdateStats

    n = mesh.devices.size
    gx = cfg.grid_shape[0]
    assert gx % n == 0, f"grid X={gx} must divide by mesh size {n}"
    assert cfg.esdf_mode == "rebuild", (
        "sharded_fused_tick implements the rebuild path; use "
        "sharded_esdf_update for queue-semantics incremental mode")
    lx = gx // n
    # lazy closest mode (cfg.closest_mode, production default): the tick
    # computes d2 only; sharded_derive_closest serves the query surface
    rebuild_local = _local_rebuild_esdf(
        cfg, n, with_closest=False if cfg.lazy_closest else None)
    bx, by, bz = raycast._carve_box_shape(cfg)
    from ..grid import closest_packed_state, pack_closest
    from ..ops.pallas.fuse import (fuse_counts_pallas,
                                   fuse_profitable, fuse_supported)
    from ..pipeline import _FUSE_IMPL

    cl_packed = closest_packed_state(cfg)

    use_pallas_fuse = (
        _FUSE_IMPL == "pallas" and cfg.global_update
        and jax.default_backend() == "tpu"
        and fuse_supported((lx,) + cfg.grid_shape[1:])
        and fuse_profitable(cfg.grid_shape))

    def apply_box_local(cnt_local, boxc, start, x0):
        """Add a carve-box contribution to the slab it intersects.

        The x start is clamped into [-BX, Lx] and the slab padded by BX on
        both sides, so non-overlapping boxes land entirely in the discarded
        pad (clamping cannot create a false overlap: any true overlap has
        start in the clamp range already)."""
        ls = jnp.clip(start[0] - x0, -bx, lx)
        padded = jnp.pad(cnt_local, ((bx, bx), (0, 0), (0, 0)))
        at = (ls + bx, start[1], start[2])
        reg = jax.lax.dynamic_slice(padded, at, (bx, by, bz))
        padded = jax.lax.dynamic_update_slice(
            padded, raycast._sat_add_u8(reg, boxc), at)
        return padded[bx:bx + lx]

    def _make_local_fn(n_real):
      """local_fn for a tick whose TRUE scan count is ``n_real`` (static
      per jit trace): the apply loop skips the trailing padding boxes.
      Scans pad to a multiple of n for the scan-axis sharding, and the
      padded boxes sit at statically-known trailing indices after the
      tiled all_gather — applying them is pure inflation (at n=8 with
      k=3 scans: 8 box-applies per device, 5 of them zero), the term
      behind the round-4 weak-scaling droop to 0.85 (PERF.md round 5).
      (2-space nesting keeps the long local_fn body at its original
      indentation.)"""

      def local_fn(logodds, seen, hit_cnt, miss_cnt, d2, closest,
                   points, valids, transforms, cur_pos):
        # points/valids/transforms arrive SCAN-SHARDED: [K_pad/n, P, 3]
        # locally (padding scans are all-invalid => zero contributions)
        x0 = jax.lax.axis_index("x").astype(jnp.int32) * lx

        if cfg.global_update:
            win = None
            wmask = None
        else:
            # local-window mode (C17): the window gates which counters
            # and fused voxels change, exactly as the single-device tick
            from ..grid import local_window

            win = local_window(cfg, cur_pos)
            wmin, wmax = win
            xs = x0 + jnp.arange(lx, dtype=jnp.int32)
            ys = jnp.arange(cfg.grid_shape[1], dtype=jnp.int32)
            zs = jnp.arange(cfg.grid_shape[2], dtype=jnp.int32)
            wmask = ((xs >= wmin[0]) & (xs <= wmax[0]))[:, None, None] \
                & ((ys >= wmin[1]) & (ys <= wmax[1]))[None, :, None] \
                & ((zs >= wmin[2]) & (zs <= wmax[2]))[None, None, :]

        starts, hitc, missc, n_rays, n_ep = raycast.scanline_batch_boxes(
            cfg, points, valids, transforms[:, :3, 3], win,
            transforms=transforms,
        )
        # every slab needs every scan's box: gather the per-scan
        # contributions (u8 boxes; world-size-independent traffic).  This
        # all-gather is the tick's dominant collective (PERF.md), so the
        # two counter boxes ride ONE packed u8: hitc in {0,1}, missc =
        # max(hit, epfree) + free in {0,1,2} — hit*4 | miss, halving the
        # gathered bytes vs separate hit/miss gathers.
        starts = jax.lax.all_gather(starts, "x", tiled=True)
        packed = jax.lax.all_gather(hitc * jnp.uint8(4) + missc, "x",
                                    tiled=True)
        # only the first n_real boxes are real observations (pads are
        # all-zero and trail the gather) — skipping them statically is
        # bit-exact and removes the k_pad/k apply inflation
        for i in range(min(n_real, starts.shape[0])):
            hit_cnt = apply_box_local(hit_cnt, packed[i] >> 2,
                                      starts[i], x0)
            miss_cnt = apply_box_local(miss_cnt, packed[i] & jnp.uint8(3),
                                       starts[i], x0)

        if use_pallas_fuse:
            # same single-pass kernel as the single-device tick
            # (ops/pallas/fuse.py; bit-identical arithmetic to
            # fuse_counts), on the local slab — stats partials psum'd
            on, off_eq = ((cfg.min_occupancy_log, False)
                          if cfg.probabilistic else (1.0, True))
            new_lo, new_seen, occ, hit0, miss0, n_obs, n_ins, n_del = \
                fuse_counts_pallas(
                    logodds, seen, hit_cnt, miss_cnt,
                    l_hit=cfg.prob_hit_log, l_miss=cfg.prob_miss_log,
                    clamp_min=cfg.clamp_min_log,
                    clamp_max=cfg.clamp_max_log,
                    occ_thresh=on, occ_is_eq=off_eq,
                )
        else:
            fr = fusion.fuse_counts(cfg, logodds, seen, hit_cnt, miss_cnt,
                                    window_mask=wmask)
            new_lo, new_seen, occ = fr.logodds, fr.seen, fr.occupied
            hit0 = jnp.zeros_like(hit_cnt)
            miss0 = jnp.zeros_like(miss_cnt)
            n_obs = fr.num_observed
            n_ins = jnp.sum(fr.insert_mask, dtype=jnp.int32)
            n_del = jnp.sum(fr.delete_mask, dtype=jnp.int32)
        d2, new_closest = rebuild_local(occ, x0)
        if new_closest is not None:
            closest = (pack_closest(new_closest) if cl_packed
                       else new_closest)

        stats = UpdateStats(
            num_observed=jax.lax.psum(n_obs, "x"),
            num_inserted=jax.lax.psum(n_ins, "x"),
            num_deleted=jax.lax.psum(n_del, "x"),
            num_sweeps=jnp.int32(0),
        )
        return (new_lo, new_seen, hit0, miss0, d2, closest, stats)

      return local_fn

    s3 = P("x", None, None)
    s4 = P(None, "x", None, None)
    scl = s3 if cl_packed else s4    # closest: packed i32 or i16 planes
    sk = P("x", None, None)   # scan-sharded [K_pad, P, 3]
    _sm_cache = {}

    def _get_sm(n_real):
        # one shard_map per true scan count (jit re-traces per static
        # shape anyway; the cache is touched at trace time only)
        if n_real not in _sm_cache:
            _sm_cache[n_real] = jax.shard_map(
                _make_local_fn(n_real),
                mesh=mesh,
                in_specs=(s3, s3, s3, s3, s3, scl, sk, P("x", None), sk,
                          P()),
                out_specs=(s3, s3, s3, s3, s3, scl,
                           UpdateStats(P(), P(), P(), P())),
                check_vma=False,  # pallas_call inside has no vma info
            )
        return _sm_cache[n_real]

    sk_sh = NamedSharding(mesh, P("x", None, None))
    skv_sh = NamedSharding(mesh, P("x", None))

    @partial(jax.jit, donate_argnames=("state",))
    def step(state: MapState, points, valids, transforms, cur_pos):
        k = points.shape[0]
        sm = _get_sm(k)
        k_pad = -k % n
        if k_pad:
            # padding scans are all-invalid: they run (fixed shapes) but
            # contribute nothing.  The concatenated result is pinned to
            # the scan-axis sharding the shard_map consumes — without the
            # pin GSPMD back-propagates the K-sharding onto the constant
            # pad operands (degenerate [n,1,1] tilings of tiny arrays) and
            # logs "Involuntary full rematerialization" for each
            rep = NamedSharding(mesh, P())

            def pad_k(x, fill, sh):
                z = jax.lax.with_sharding_constraint(
                    jnp.broadcast_to(fill, (k_pad,) + x.shape[1:]), rep)
                return jax.lax.with_sharding_constraint(
                    jnp.concatenate([x, z]), sh)

            points = pad_k(points, jnp.float32(0), sk_sh)
            valids = pad_k(valids, jnp.bool_(False), skv_sh)
            transforms = pad_k(transforms, jnp.eye(4, dtype=transforms.dtype),
                               sk_sh)
        lo, seen, hit, miss, d2, closest, stats = sm(
            state.logodds, state.seen, state.hit_cnt, state.miss_cnt,
            state.d2, state.closest, points, valids, transforms,
            jnp.asarray(cur_pos, jnp.float32),
        )
        return MapState(logodds=lo, d2=d2, closest=closest, seen=seen,
                        hit_cnt=hit, miss_cnt=miss), stats

    return step


def sharded_esdf_update(cfg: FiestaConfig, mesh: Mesh, max_iters: int = 0):
    """Full sharded incremental update: elementwise pre-passes run under
    GSPMD; the sweep loop runs under shard_map with explicit halos.

    Returns a jitted fn (d2, closest, occupied, insert_mask) -> (d2, closest,
    iters).  The closest-occupancy gather in the delete pass is executed
    with a replicated occupancy copy (one all-gather of a bitmask per
    update; optimizing to neighbor-local lookups is future work).
    """
    relax = sharded_relax_to_fixpoint(cfg, mesh, max_iters=max_iters,
                                      use_masks=False)
    from ..ops.esdf import apply_occupancy_changes

    @partial(jax.jit, donate_argnames=("d2", "closest"))
    def step(d2, closest, occupied, insert_mask):
        d2, closest, _ = apply_occupancy_changes(
            d2, closest, occupied, insert_mask
        )
        d2, closest, iters = relax(d2, closest)
        return d2, closest, iters

    return step
