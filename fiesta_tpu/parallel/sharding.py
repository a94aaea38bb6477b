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




import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FiestaConfig
from ..grid import INF_D2, MapState, UNDEFINED_COORD, coord_grids

_PAD = 2  # stencil reach


def make_mesh(n_devices: int) -> Mesh:
    devices = np.array(jax.devices()[:n_devices])
    return Mesh(devices, ("x",))


def state_shardings(mesh: Mesh) -> MapState:
    """NamedShardings for MapState: [X,Y,Z] arrays sharded on X."""
    s3 = NamedSharding(mesh, P("x", None, None))
    s4 = NamedSharding(mesh, P(None, "x", None, None))
    return MapState(
        logodds=s3, d2=s3, closest=s4, seen=s3, hit_cnt=s3, miss_cnt=s3
    )


def shard_state(state: MapState, mesh: Mesh) -> MapState:
    sh = state_shardings(mesh)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


# ---------------------------------------------------------------------------
# Sharded relaxation with halo exchange
# ---------------------------------------------------------------------------


def _halo_exchange_x(closest_local: jax.Array, axis: str) -> jax.Array:
    """Concatenate 2-plane halos from x-neighbors onto a local [3,Lx,Y,Z]
    block -> [3, Lx+4, Y, Z].  Non-periphery shards exchange over ICI;
    boundary shards see UNDEFINED fill (out-of-grid)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    right_edge = closest_local[:, -_PAD:]       # planes sent rightward
    left_edge = closest_local[:, :_PAD]         # planes sent leftward

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(right_edge, axis, fwd)
    from_right = jax.lax.ppermute(left_edge, axis, bwd)

    undef = jnp.full_like(from_left, UNDEFINED_COORD)
    from_left = jnp.where(idx == 0, undef, from_left)
    from_right = jnp.where(idx == n - 1, undef, from_right)
    return jnp.concatenate([from_left, closest_local, from_right], axis=1)


def _relax_once_local(
    d2, closest, x_offset, dirs, update_mask, source_mask, axis
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
    ext = _halo_exchange_x(src, axis)                    # [3, Lx+4, Y, Z]
    padded = jnp.pad(
        ext,
        ((0, 0), (0, 0), (_PAD, _PAD), (_PAD, _PAD)),
        constant_values=np.int16(-1),
    )

    best_d2, best_c = d2, closest
    gx, gy, gz = shape
    for off in dirs:
        dx, dy, dz = (int(o) for o in off)
        nb = jax.lax.slice(
            padded,
            (0, _PAD + dx, _PAD + dy, _PAD + dz),
            (3, _PAD + dx + gx, _PAD + dy + gy, _PAD + dz + gz),
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


def sharded_relax_to_fixpoint(cfg: FiestaConfig, mesh: Mesh, max_iters: int = 0):
    """Build the jitted sharded relaxation: iterate sweeps with per-sweep
    halo exchange until no shard reports a change (global psum)."""
    dirs = cfg.stencil
    gx = cfg.grid_shape[0]
    n = mesh.devices.size
    assert gx % n == 0, f"grid X={gx} must divide by mesh size {n}"
    lx = gx // n

    def local_fn(d2, closest, update_mask, source_mask):
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
                d2_, c_, x_offset, dirs, update_mask, source_mask, "x"
            )
            any_changed = jax.lax.psum(changed.astype(jnp.int32), "x") > 0
            return d2n, cn, any_changed, it + 1

        d2f, cf, _, iters = jax.lax.while_loop(
            cond, body, (d2, closest, jnp.bool_(True), jnp.int32(0))
        )
        return d2f, cf, iters

    sm = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("x", None, None), P(None, "x", None, None),
                  P("x", None, None), P("x", None, None)),
        out_specs=(P("x", None, None), P(None, "x", None, None), P()),
        check_vma=False,  # pallas_call inside shard_map has no vma info
    )
    return jax.jit(sm)


def sharded_truncated_edt(cfg: FiestaConfig, mesh: Mesh, trunc_vox: int):
    """Multi-chip exact truncated EDT over an X-sharded grid.

    The windowed min-plus pass along the sharded axis reads +-T neighbor
    planes: each shard receives T boundary planes from each x-neighbor over
    ICI (two ppermutes), then all three passes run shard-locally.  The y/z
    passes touch only local data.  Communication volume per update is
    2 * T * Y * Z * 4 bytes per shard boundary — independent of world size.

    Returns a jitted fn: occupied [X,Y,Z] bool (sharded) -> d2 int32
    (sharded).
    """
    from ..ops.pallas.edt import _INF_EDT, _minplus_pass
    from ..grid import INF_D2 as _INF_D2

    gx = cfg.grid_shape[0]
    n = mesh.devices.size
    assert gx % n == 0
    t = int(trunc_vox)
    lx = gx // n
    assert t < lx, (
        f"truncation radius {t} must be smaller than the local shard "
        f"extent {lx} (one-hop halos)"
    )

    def local_fn(occupied):
        f = jnp.where(occupied, 0, _INF_EDT).astype(jnp.int32)

        # halo exchange along x: receive T planes from each neighbor
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_left = jax.lax.ppermute(f[-t:], "x", fwd)
        from_right = jax.lax.ppermute(f[:t], "x", bwd)
        idx = jax.lax.axis_index("x")
        inf_blk = jnp.full_like(from_left, _INF_EDT)
        from_left = jnp.where(idx == 0, inf_blk, from_left)
        from_right = jnp.where(idx == n - 1, inf_blk, from_right)
        fx = jnp.concatenate([from_left, f, from_right], axis=0)

        # pass 1 along x on the extended block, then crop the halo
        p1 = _minplus_pass(fx, t)[t:-t]
        # passes 2 (y) and 3 (z) are local
        p2 = _minplus_pass(p1.transpose(1, 0, 2), t)
        p3 = _minplus_pass(p2.transpose(2, 1, 0), t)
        d2 = p3.transpose(1, 2, 0)
        return jnp.where(d2 <= t * t, d2, _INF_D2)

    sm = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P("x", None, None),
        out_specs=P("x", None, None),
        check_vma=False,  # pallas_call inside shard_map has no vma info
    )
    return jax.jit(sm)


def sharded_esdf_update(cfg: FiestaConfig, mesh: Mesh, max_iters: int = 0):
    """Full sharded incremental update: elementwise pre-passes run under
    GSPMD; the sweep loop runs under shard_map with explicit halos.

    Returns a jitted fn (d2, closest, occupied, insert_mask) -> (d2, closest,
    iters).  The closest-occupancy gather in the delete pass is executed
    with a replicated occupancy copy (one all-gather of a bitmask per
    update; optimizing to neighbor-local lookups is future work).
    """
    relax = sharded_relax_to_fixpoint(cfg, mesh, max_iters=max_iters)
    from ..ops.esdf import apply_occupancy_changes

    @jax.jit
    def step(d2, closest, occupied, insert_mask):
        d2, closest, reset = apply_occupancy_changes(
            d2, closest, occupied, insert_mask
        )
        full = jnp.ones_like(reset)
        d2, closest, iters = relax(d2, closest, full, full)
        return d2, closest, iters

    return step
