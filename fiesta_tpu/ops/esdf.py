"""Incremental ESDF via dense masked min-relaxation (TPU-native core).

Reference semantics being reproduced (SURVEY.md C6, src/ESDFMap.cpp:273-398):

  * insert queue drain  (ESDFMap.cpp:278-291): newly occupied voxels get
    dist=0 and become their own closest obstacle.
  * delete queue drain  (ESDFMap.cpp:292-337): every voxel bucketized under a
    deleted obstacle is reset to +inf, then seeded from neighbors that still
    hold a valid closest obstacle.
  * BFS drain           (ESDFMap.cpp:339-392): voxels repeatedly pull a better
    closest obstacle from 24-stencil neighbors (patch A) and push their own to
    neighbors (patch B) until no queue entries remain.

TPU-first redesign
------------------
The CPU algorithm's whole point is to touch as few voxels as possible; its
machinery (FIFO queues, per-obstacle doubly-linked lists, stale-entry skips)
is pointer-chasing that a TPU cannot do efficiently.  The key observation is
that the BFS computes the *fixpoint* of the monotone relaxation

    d2[v]      = min(d2[v], min_{d in stencil, defined(closest[v+d])}
                               |v - closest[v+d]|^2)
    closest[v] = argmin of the same

(the queues are only an efficient evaluation order, and the push/pull patches
are each other's mirror).  A dense data-parallel Jacobi iteration of the same
relaxation converges to the *identical* fixpoint, because the update is
monotone (d2 only decreases) on a finite integer lattice.  So:

  * "delete" becomes a dense mask: voxels whose ``closest`` is no longer
    occupied (exactly the reference's DLL bucket membership) are reset.
  * "insert" becomes a dense mask: d2=0, closest=self.
  * the BFS becomes ``lax.while_loop`` of full-window stencil sweeps with a
    device-resident "anything changed" predicate — no host round-trips.

Distances are squared int32 voxel counts, making every comparison the
reference performs on doubles (ESDFMap.cpp:122-126) exact and deterministic.

For batch (re)builds an exact separable min-plus Euclidean distance transform
is provided (``build_esdf``): three 1-D min-plus passes with argmin tracking.
It is *more* accurate than the reference's 24-neighbor BFS (which the
reference itself measures as an overestimator, ESDFMap.cpp:940-975).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import INF_D2, UNDEFINED_COORD, coord_grids

_PAD = 2  # stencil reach (the 24-stencil contains +-2 face offsets)


def _shift_stack(padded: jax.Array, off, shape) -> jax.Array:
    """Static-slice a [C, X+2P, Y+2P, Z+2P] padded stack by offset ``off``.

    Returns value at v + off for every voxel v, i.e. the neighbor's data
    aligned to this voxel.
    """
    dx, dy, dz = (int(o) for o in off)
    gx, gy, gz = shape
    return jax.lax.slice(
        padded,
        (0, _PAD + dx, _PAD + dy, _PAD + dz),
        (padded.shape[0], _PAD + dx + gx, _PAD + dy + gy, _PAD + dz + gz),
    )


def _shift_axis_stack(arr: jax.Array, axis: int, s: int, fill) -> jax.Array:
    """Shift a [C, X, Y, Z] stack by ``s`` along spatial ``axis`` (0..2):
    out[v] = arr[v + s*e_axis], boundary filled.  Used for the long-range
    jump offsets, where padding the whole array would be wasteful."""
    ax = axis + 1
    n = arr.shape[ax]
    blk_shape = list(arr.shape)
    blk_shape[ax] = abs(s)
    blk = jnp.full(blk_shape, fill, arr.dtype)
    if s > 0:
        body = jax.lax.slice_in_dim(arr, s, n, axis=ax)
        return jnp.concatenate([body, blk], axis=ax)
    body = jax.lax.slice_in_dim(arr, 0, n + s, axis=ax)
    return jnp.concatenate([blk, body], axis=ax)


def _relax_pass(d2, closest, src, dirs, shape, self_c):
    """Best (d2, closest) candidates pulling from ``src`` neighbors."""
    small = [d for d in dirs if max(abs(int(o)) for o in d) <= _PAD]
    jumps = [d for d in dirs if max(abs(int(o)) for o in d) > _PAD]
    for d in jumps:
        nz = [o for o in d if o]
        assert len(nz) == 1, f"long-range offsets must be axis-aligned: {d}"

    padded = None
    if small:
        padded = jnp.pad(
            src,
            ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (_PAD, _PAD)),
            constant_values=np.int16(-1),
        )

    best_d2 = d2
    best_c = closest

    def consider(nb):
        nonlocal best_d2, best_c
        nb32 = nb.astype(jnp.int32)
        defined = nb[0] >= 0
        diff = self_c - nb32
        cand = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
        better = defined & (cand < best_d2)
        best_d2 = jnp.where(better, cand, best_d2)
        best_c = jnp.where(better[None], nb, best_c)

    for off in small:
        consider(_shift_stack(padded, off, shape))     # [3,X,Y,Z] int16
    for off in jumps:
        axis = next(i for i, o in enumerate(off) if o)
        consider(_shift_axis_stack(src, axis, int(off[axis]), np.int16(-1)))
    return best_d2, best_c


def relax_once(
    d2: jax.Array,
    closest: jax.Array,
    update_mask,
    source_mask,
    dirs,
    push_src_mask=None,
    push_recv_mask=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One Jacobi sweep of the closest-obstacle relaxation.

    Implements one data-parallel application of BFS "patch A"
    (ESDFMap.cpp:349-373) to every voxel at once; "patch B"
    (ESDFMap.cpp:375-391) is its mirror image and is subsumed by the
    neighbor's own pull on the next sweep — EXCEPT in windowed mode,
    where the reference lets a queued out-of-window voxel (a reset bucket
    member or an out-of-window insert) push its obstacle INTO the window
    (the push target gate at ESDFMap.cpp:378 passes for in-window
    neighbors even when the pusher is outside).
    ``push_src_mask``/``push_recv_mask`` restore that flow: an extra pull
    pass where ``push_recv_mask`` voxels may additionally read
    ``push_src_mask`` sources.

    Args:
      d2:        [X,Y,Z] int32 squared distances.
      closest:   [3,X,Y,Z] int16 closest-obstacle coords (-1 = undefined).
      update_mask: bool [X,Y,Z] or None — voxels allowed to improve
                   (reference: BFS only queues voxels, all inside the window).
      source_mask: bool [X,Y,Z] or None — voxels readable as neighbors
                   (reference: VoxInRange gate, ESDFMap.cpp:351).
      dirs:      static tuple of (dx,dy,dz) stencil offsets.
      push_src_mask / push_recv_mask: optional bool [X,Y,Z] — extra
                   sources readable by ``push_recv_mask`` receivers only.

    Returns (new_d2, new_closest, changed_any).
    """
    shape = d2.shape
    self_c = coord_grids(shape).astype(jnp.int32)

    src = closest
    if source_mask is not None:
        src = jnp.where(source_mask[None], closest, UNDEFINED_COORD)

    best_d2, best_c = _relax_pass(d2, closest, src, dirs, shape, self_c)

    if push_src_mask is not None:
        src2 = jnp.where(push_src_mask[None], closest, UNDEFINED_COORD)
        p_d2, p_c = _relax_pass(d2, closest, src2, dirs, shape, self_c)
        take = push_recv_mask & (p_d2 < best_d2)
        best_d2 = jnp.where(take, p_d2, best_d2)
        best_c = jnp.where(take[None], p_c, best_c)

    if update_mask is not None:
        best_d2 = jnp.where(update_mask, best_d2, d2)
        best_c = jnp.where(update_mask[None], best_c, closest)
    changed = jnp.any(best_d2 < d2)
    return best_d2, best_c, changed


@partial(jax.jit, static_argnames=("dirs", "max_iters"))
def relax_to_fixpoint(
    d2: jax.Array,
    closest: jax.Array,
    update_mask,
    source_mask,
    dirs,
    max_iters: int = 0,
    push_src_mask=None,
    push_recv_mask=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Iterate ``relax_once`` until nothing changes (the BFS fixpoint).

    The loop runs entirely on device: the convergence predicate is a
    device-resident reduction, mirroring the reference's "queue empty" test
    without host synchronization.  Returns (d2, closest, num_sweeps).
    """

    def cond(carry):
        _, _, changed, it = carry
        ok = changed
        if max_iters:
            ok = ok & (it < max_iters)
        return ok

    def body(carry):
        d2_, c_, _, it = carry
        d2n, cn, changed = relax_once(d2_, c_, update_mask, source_mask,
                                      dirs, push_src_mask=push_src_mask,
                                      push_recv_mask=push_recv_mask)
        return d2n, cn, changed, it + 1

    d2f, cf, _, iters = jax.lax.while_loop(
        cond, body, (d2, closest, jnp.bool_(True), jnp.int32(0))
    )
    return d2f, cf, iters


def apply_occupancy_changes(
    d2: jax.Array,
    closest: jax.Array,
    occupied: jax.Array,
    insert_mask: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Apply insert/delete effects before relaxation.

    Inserts (ESDFMap.cpp:278-291): d2=0, closest=self.

    Deletes (ESDFMap.cpp:292-337): the reference walks the doubly-linked list
    of the deleted obstacle to find every voxel whose closest obstacle it was.
    That bucket is exactly ``closest[v] == deleted`` — recovered densely as
    "closest no longer occupied" (occupancy changed nowhere else).  Those
    voxels reset to +inf/undefined; the substitute-obstacle seeding
    (ESDFMap.cpp:308-321) is performed by the first relaxation sweep.

    Returns (d2, closest, reset_mask).
    """
    shape = d2.shape
    self_c = coord_grids(shape)

    d2 = jnp.where(insert_mask, 0, d2)
    closest = jnp.where(insert_mask[None], self_c, closest)

    # Voxels whose recorded closest obstacle is no longer occupied.
    defined = closest[0] >= 0
    gx, gy, gz = shape
    lin = (
        closest[0].astype(jnp.int32) * (gy * gz)
        + closest[1].astype(jnp.int32) * gz
        + closest[2].astype(jnp.int32)
    )
    lin = jnp.where(defined, lin, 0)
    occ_at_closest = occupied.reshape(-1)[lin.reshape(-1)].reshape(shape)
    reset = defined & ~occ_at_closest

    d2 = jnp.where(reset, INF_D2, d2)
    closest = jnp.where(reset[None], UNDEFINED_COORD, closest)
    return d2, closest, reset


@partial(jax.jit, static_argnames=("dirs", "max_iters"))
def update_esdf(
    d2: jax.Array,
    closest: jax.Array,
    occupied: jax.Array,
    insert_mask: jax.Array,
    delete_mask: jax.Array,
    window_mask,
    dirs,
    max_iters: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full incremental ESDF update (reference UpdateESDF, ESDFMap.cpp:273-398).

    ``window_mask`` of None means a global update (SetOriginalRange); a dense
    bool mask restricts relaxation to the local window (SetUpdateRange,
    component C17).  Reset voxels outside the window are still allowed to
    re-seed (the reference processes DLL bucket members regardless of the
    window, ESDFMap.cpp:301-335, while their neighbor *reads* stay
    window-gated).

    Returns (d2, closest, num_sweeps) — closest in the caller's format:
    the queue engine's native state is the [3,X,Y,Z] coordinate planes;
    a PACKED closest (grid.closest_packed_state rebuild format, ndim 3)
    is transparently unpacked on entry and repacked on return, so mixed
    use (e.g. a rebuild-formatted state driven through the incremental
    validation engine) keeps working.
    """
    del delete_mask  # subsumed by occupancy gather in apply_occupancy_changes
    packed_in = closest.ndim == occupied.ndim
    if packed_in:
        from ..grid import pack_closest, unpack_closest

        d2p, closestp, sweeps = update_esdf(
            d2, unpack_closest(closest), occupied, insert_mask, None,
            window_mask, dirs, max_iters=max_iters)
        return d2p, pack_closest(closestp), sweeps
    d2, closest, reset = apply_occupancy_changes(d2, closest, occupied, insert_mask)
    if window_mask is None:
        return relax_to_fixpoint(d2, closest, None, None, dirs,
                                 max_iters=max_iters)
    # windowed mode (C17): in-window voxels relax against in-window
    # sources; queued out-of-window voxels (reset bucket members and
    # out-of-window inserts — the insert drain has no window gate,
    # ESDFMap.cpp:278-291) re-seed from in-window sources (substitute
    # scan, ESDFMap.cpp:311) and push their obstacle back INTO the window
    # (patch B target gate, ESDFMap.cpp:378 admits in-window receivers
    # regardless of the pusher) — the extra push pass carries that flow
    queued = reset | insert_mask
    return relax_to_fixpoint(d2, closest, window_mask | queued, window_mask,
                             dirs, max_iters=max_iters,
                             push_src_mask=queued,
                             push_recv_mask=window_mask)


# ---------------------------------------------------------------------------
# Exact batch EDT (separable min-plus with argmin tracking)
# ---------------------------------------------------------------------------

# Packing: minimize (value * PACK + index) in one int32 reduction.  Values are
# squared voxel distances (< 2^20 for axes < 512) so value*PACK stays < 2^30.
_PACK = 512
_INF_EDT = np.int32(1 << 20)   # numpy on purpose: see grid.INF_D2 note


def _minplus_axis(vals: jax.Array, axis: int, chunk: int):
    """1-D min-plus transform out[i] = min_j vals[j] + (i-j)^2 along ``axis``.

    Returns (min_vals, argmin_j) with argmin tie-broken to the smallest j.
    Chunked over output positions so the broadcast [chunk, N, rest] transient
    stays bounded; XLA fuses the add into the reduction.
    """
    v = jnp.moveaxis(vals, axis, 0)
    n = v.shape[0]
    if n > _PACK:
        # same cliff family as the production closest-tracking bit budget;
        # report through the one shared capability helper so both paths
        # fail with the same actionable story
        from .pallas.edt import closest_capability

        raise ValueError(
            f"oracle EDT packing (value*{_PACK}+index) cannot represent "
            f"axis {axis} of length {n}; "
            + closest_capability(vals.shape, _PACK)["detail"]
            + " — use ops.pallas.edt.truncated_edt_d2_closest[_wide] "
            "for large grids")
    rest = v.shape[1:]
    j = jnp.arange(n, dtype=jnp.int32)
    vp = jnp.minimum(v, _INF_EDT) * _PACK + j.reshape((n,) + (1,) * len(rest))

    def one_chunk(i0):
        i = i0 + jnp.arange(chunk, dtype=jnp.int32)          # [chunk]
        d2m = (i[:, None] - j[None, :]) ** 2 * _PACK          # [chunk, n]
        packed = vp[None] + d2m.reshape((chunk, n) + (1,) * len(rest))
        return jnp.min(packed, axis=1)                        # [chunk, ...rest]

    nchunks = -(-n // chunk)
    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    out = jax.lax.map(one_chunk, starts)                      # [nchunks, chunk, ...]
    out = out.reshape((nchunks * chunk,) + rest)[:n]
    out_val = out // _PACK
    out_arg = (out % _PACK).astype(jnp.int16)
    return (jnp.moveaxis(out_val, 0, axis),
            jnp.moveaxis(out_arg, 0, axis))


@partial(jax.jit, static_argnames=("chunk",))
def build_esdf(occupied: jax.Array, chunk: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Exact 3-D EDT with closest-obstacle tracking.

    Args:
      occupied: bool [X,Y,Z].

    Returns:
      d2:      int32 [X,Y,Z] exact squared distance to nearest occupied voxel
               (INF_D2 where no obstacle exists anywhere).
      closest: int16 [3,X,Y,Z] coords of that voxel (-1 where none).

    Plays the role the reference's full insert-only rebuild would
    (test/test_ESDF_Map.cpp pattern), and doubles as the ground-truth oracle
    the reference computes with a PCL kd-tree (ESDFMap.cpp:905-1054).
    """
    shape = occupied.shape
    f = jnp.where(occupied, 0, _INF_EDT).astype(jnp.int32)

    # x-pass: nearest obstacle x for each (x,y,z) column.
    dx, jx = _minplus_axis(f, 0, chunk)                      # jx: best x source
    # y-pass over the x-transformed field.
    dxy, jy = _minplus_axis(dx, 1, chunk)
    cx_xy = jnp.take_along_axis(jx, jy.astype(jnp.int32), axis=1)
    # z-pass.
    dxyz, jz = _minplus_axis(dxy, 2, chunk)
    jz32 = jz.astype(jnp.int32)
    cx = jnp.take_along_axis(cx_xy, jz32, axis=2)
    cy = jnp.take_along_axis(jy, jz32, axis=2)
    cz = jz

    none = dxyz >= _INF_EDT
    d2 = jnp.where(none, INF_D2, dxyz)
    closest = jnp.where(
        none[None],
        UNDEFINED_COORD,
        jnp.stack([cx.astype(jnp.int16), cy.astype(jnp.int16), cz]),
    )
    return d2, closest
