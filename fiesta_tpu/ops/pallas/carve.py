"""Pallas TPU kernel: batched octant wavefront sweep for free-space carving.

The carve propagates max observation range from endpoint seeds toward the
sensor, one slab at a time along the dominant axis (see
``ops.raycast.carve_free_mask_batch`` for the geometry and the reference
semantics it reproduces — RaycastProcess, include/Fiesta.h:194-278).

Why a kernel: the sweep is a first-order recurrence over slabs, so XLA
materializes every shifted/masked intermediate in HBM — ~19 HBM touches per
voxel per slab step, making the carve bandwidth-bound at ~20 ms per update
batch.  Here everything lives in VMEM: the recurrence carry, the octant
masking of seeds (the XLA path materializes six masked f32 volumes), and
the free test (in squared voxel units — no sqrt, no full-grid radius
volume).  Per grid step the only HBM traffic is one raw seed slab per
orientation in and two uint8 free-mask slabs out — the algorithmic minimum.

The forward (toward -axis) and reverse (toward +axis) wavefronts of the
same scan share each grid step: block index maps walk the forward seeds
ascending and the reverse seeds descending, so both carries advance
far -> near in one serial grid pass; orientations with equal scan-axis
length (x and y whenever the carve box is square) fuse into the same call.
"""

from __future__ import annotations

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

    c [K, C2, C3] carry; f2 [K, C2], f3 [K, C3] fractional offsets in
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


def _swap_last2(v):
    """Per-k trailing-dims transpose of a [K, P, Q] VMEM value -> [K, Q, P].

    Mosaic legalizes 2-D ``x.T`` on f32 VMEM values (probed round 4,
    PERF.md); the K loop is static (K = scans/tick, typically 3) and the
    stack is a major-dim concat."""
    k = v.shape[0]
    if k == 1:
        return v[0].T[None]
    return jnp.stack([v[i].T for i in range(k)])


def octant_free_sweep_pallas(
    seed_vols, po_rows, o2_rows, o3_rows, tie_rules,
    res: float, min_ray: float, max_ray: float, interpret: bool = False,
    modes=None,
):
    """Fused octant sweeps producing per-octant FREE masks directly.

    seed_vols: list of [K, A, C2, C3] f32 UNMASKED seed volumes, each
      transposed so its scan axis leads; all must share A.

    modes: per-volume IO layout (default "lead" for all):
      "lead"   — seeds [K, A, C2, C3], scan axis leads (pre-transposed in
                 HBM); outputs in the same layout.
      "canon1" — seeds in CANONICAL grid layout [K, A, C3, C2] (scan axis
                 at dim 1; trailing dims swapped relative to the sweep's
                 (C2, C3) working layout).  Sub-slabs transpose to/from
                 the working layout IN VMEM (_swap_last2) and outputs are
                 written canonical — no HBM relayout on either side.
                 This is the x orientation reading [K, BX, BY, BZ]
                 directly (c2=z, c3=y).
      "canon2" — same, scan axis at dim 2: seeds [K, C3, A, C2] (the y
                 orientation reading [K, BX, BY, BZ]; c2=z, c3=x).  The
                 sub-slab slice is a static SUBLANE slice (cheap
                 constant-offset shuffles; only dynamic sublane slices
                 are expensive on this toolchain, PERF.md round 3).
      The z orientation keeps "lead": canonical blocks would put its scan
      axis on the LANE dim — 16x VMEM padding at u<=16 of 128 lanes.
    po_rows:   list of [3, K] f32 — sensor coord along (axis, c2, c3).
    o2_rows:   list of [K, C2] f32 (c2 coords - sensor); o3_rows same.
    tie_rules: list of (ge2, ge3) — whether this orientation's scan axis
      wins magnitude ties against the axes the CALLER placed on c2/c3
      (the kernel is symmetric in (c2, c3); rules follow whatever axis
      order the caller chose).  ``_carve_free_tpu`` carries (c2=z,
      c3=long axis) for the x/y orientations — x: (True, True),
      y: (True, False) — and (c2=x, c3=y) for z: (False, False),
      matching the octant partition of ``carve_free_mask_batch``
      (dominant axis = max magnitude, ties broken x > y > z).

    Free test, in squared voxel units (no sqrt):
      (min_ray/res)^2 <= r2 <= (max_ray/res)^2, W > res,
      r2 < ((W - res)/res)^2,
    masked to the sweep's own halfspace (fwd: dax <= 0, rev: dax > 0) —
    a seed's cone only covers voxels on its own side of the sensor, so
    anything a carry smuggles past the sensor plane is spurious.  The mask
    also makes every output slab past the sensor identically zero, so each
    sweep SKIPS compute for the half of its walk beyond the sensor plane
    (predicates from the per-orientation sensor-coordinate extrema, read
    from SMEM) and just zero-fills those output blocks.

    Returns a flat list of [K, A, C2, C3] uint8: (fwd, rev) per volume.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(seed_vols)
    if modes is None:
        modes = ["lead"] * n
    assert all(m in ("lead", "canon1", "canon2") for m in modes)
    ax_dim = [2 if m == "canon2" else 1 for m in modes]

    def ldims(shape, mode):
        """Logical (k, a, c2, c3) from the stored shape."""
        if mode == "lead":
            k, a_, c2, c3 = shape
        elif mode == "canon1":
            k, a_, c3, c2 = shape
        else:                       # canon2
            k, c3, a_, c2 = shape
        return k, a_, c2, c3

    dims = [ldims(tuple(v.shape), m) for v, m in zip(seed_vols, modes)]
    a = dims[0][1]
    assert all(d[1] == a for d in dims), "scan-axis lengths must match"
    inv_res = np.float32(1.0 / res)
    resf = np.float32(res)
    min2 = np.float32((min_ray / res) ** 2)
    max2 = np.float32((max_ray / res) ** 2)

    # amortize per-grid-step scheduling over U slabs per step: U = largest
    # divisor of the (possibly padded) axis length <= 16.  The high-end
    # zero pad is harmless in both directions (the reverse sweep meets it
    # first with a zero carry; the forward sweep reaches it after all real
    # slabs) and its outputs are sliced off.
    from .edt import _pick_block

    if any(m == "canon2" for m in modes):
        # canon2 blocks carry U on the SUBLANE dim: Mosaic requires the
        # second-minor block extent be a multiple of 8 (or the full dim),
        # so U must be 8/16 and the axis padded to match
        pad = -a % 8
        u = 16 if (a + pad) % 16 == 0 else 8
    else:
        u = _pick_block(a, 16)
        pad = 0
        if u < 4:
            pad = -a % 8
            u = _pick_block(a + pad, 16)
    ap = a + pad
    if pad:
        seed_vols = [
            jnp.pad(v, [(0, pad) if d == ax_dim[i] else (0, 0)
                        for d in range(4)])
            for i, v in enumerate(seed_vols)
        ]
        dims = [ldims(tuple(v.shape), m)
                for v, m in zip(seed_vols, modes)]
    n_steps = ap // u

    def kernel(*refs):
        # layout: per orientation i: seeds_fwd, seeds_rev (same array, two
        # index maps), po, o2, o3, po_lims (SMEM) — then outputs
        # (fwd, rev) per i — then carry scratch (fwd, rev) per i.
        ins = refs[:6 * n]
        outs = refs[6 * n:8 * n]
        carries = refs[8 * n:10 * n]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            for c in carries:
                c[:] = jnp.zeros_like(c)

        gf = g.astype(jnp.float32)
        for i in range(n):
            k, _, c2, c3 = dims[i]
            mode = modes[i]
            ge2, ge3 = tie_rules[i]
            (s_fwd, s_rev, po_ref, o2_ref, o3_ref,
             lims_ref) = ins[6 * i:6 * i + 6]
            o2v = o2_ref[:]                          # [K, C2]
            o3v = o3_ref[:]                          # [K, C3]
            ao2 = jnp.abs(o2v)
            ao3 = jnp.abs(o3v)
            r2_3 = (o3v * o3v)[:, None, :]
            po = po_ref[0:1, :]                      # [1, K] axis coord
            for rev in (0, 1):
                sref = s_rev if rev else s_fwd
                oref = outs[2 * i + rev]
                carry = carries[2 * i + rev]
                # rev blocks walk descending; within a block the far
                # slab is the highest sub-index
                base = (jnp.float32(n_steps - 1) - gf) * u if rev \
                    else gf * u
                # halfspace skip: fwd outputs need idx <= po for some k
                # (sgn = dax <= 0), rev outputs need idx > po; once the
                # walk passes every sensor plane the block is all-zero.
                if rev:
                    useful = base + jnp.float32(u - 1) > lims_ref[0]
                else:
                    useful = base <= lims_ref[1]

                @pl.when(useful)
                def _(sref=sref, oref=oref, carry=carry, base=base,
                      rev=rev, ge2=ge2, ge3=ge3, k=k, c2=c2, c3=c3,
                      o2v=o2v, o3v=o3v, ao2=ao2, ao3=ao3, r2_3=r2_3,
                      po=po, mode=mode):
                    w = carry[:]
                    block = sref[:]   # lead/canon1: [K,U,..]; canon2: [K,C3,U,C2]
                    sub_outs = [None] * u   # canon2: staged block store
                    for sub in (range(u - 1, -1, -1) if rev else range(u)):
                        idx = base + jnp.float32(sub)
                        # Mosaic note: minor dims are only inserted on 2-D
                        # f32 values (1-D -> 3-D reshapes and i1 inserts
                        # don't legalize), hence the [K, 1] staging.
                        dax = (idx - po).reshape(k, 1)   # [K, 1]
                        adax = jnp.abs(dax)
                        m2 = (adax >= ao2) if ge2 else (adax > ao2)
                        m3 = (adax >= ao3) if ge3 else (adax > ao3)
                        sgn = (dax > 0) if rev else (dax <= 0)   # [K,1]
                        m2f = (m2 & sgn).astype(jnp.float32)[:, :, None]
                        m3f = m3.astype(jnp.float32)[:, None, :]
                        mask = m2f * m3f     # seeds >= 0: * == where
                        # canonical IO: the sub-slab transposes to the
                        # (C2, C3) working layout in VMEM — no HBM
                        # relayout of the seed volume (PERF.md round 5)
                        if mode == "lead":
                            raw = block[:, sub]            # [K, C2, C3]
                        elif mode == "canon1":
                            raw = _swap_last2(block[:, sub])
                        else:                              # canon2
                            raw = _swap_last2(block[:, :, sub, :])
                        slab = raw * mask
                        d = jnp.maximum(adax, 0.5)       # [K, 1]
                        w = jnp.maximum(slab, _taps(w, o2v / d, o3v / d,
                                                    c2, c3))
                        # dax^2 folds into the [K, C2] term: a [K,1,1]
                        # operand would broadcast both sublanes and lanes
                        # at once, which Mosaic cannot lower for some
                        # block shapes.  The sweep's own halfspace (sgn)
                        # folds in as an r2 poison: outputs are confined
                        # to the side of the sensor the seeds live on.
                        r2_2 = dax * dax + o2v * o2v       # [K, C2]
                        r2_2 = jnp.where(sgn, r2_2, jnp.float32(1e9))
                        r2 = r2_2[:, :, None] + r2_3
                        wv = (w - resf) * inv_res
                        free = ((w > resf) & (r2 >= min2) & (r2 <= max2)
                                & (r2 < wv * wv))
                        if mode == "lead":
                            oref[:, sub] = free.astype(jnp.uint8)
                        elif mode == "canon1":
                            # swap back on f32 (the probed transpose
                            # dtype); Mosaic has no f32->u8 cast, so
                            # round-trip through i32 at the store
                            fr = _swap_last2(free.astype(jnp.float32))
                            oref[:, sub] = fr.astype(
                                jnp.int32).astype(jnp.uint8)
                        else:
                            # canon2: a partial u8 store into the SUBLANE
                            # dim does not legalize — stage the block and
                            # store once after the sub loop
                            sub_outs[sub] = _swap_last2(
                                free.astype(jnp.float32))
                    if mode == "canon2":
                        st = jnp.stack(sub_outs, axis=2)
                        oref[:] = st.astype(jnp.int32).astype(jnp.uint8)
                    carry[:] = w

                @pl.when(jnp.logical_not(useful))
                def _(oref=oref):
                    oref[:] = jnp.zeros_like(oref)

    def vol_block(i):
        """(block_shape, fwd index map, rev index map) for volume i."""
        k, _, c2, c3 = dims[i]
        if modes[i] == "lead":
            return ((k, u, c2, c3),
                    lambda g: (0, g, 0, 0),
                    lambda g, s_=n_steps: (0, s_ - 1 - g, 0, 0))
        if modes[i] == "canon1":
            return ((k, u, c3, c2),
                    lambda g: (0, g, 0, 0),
                    lambda g, s_=n_steps: (0, s_ - 1 - g, 0, 0))
        return ((k, c3, u, c2),            # canon2
                lambda g: (0, 0, g, 0),
                lambda g, s_=n_steps: (0, 0, s_ - 1 - g, 0))

    in_specs = []
    args = []
    for i, v in enumerate(seed_vols):
        k, _, c2, c3 = dims[i]
        bshape, fwd_map, rev_map = vol_block(i)
        in_specs.append(pl.BlockSpec(bshape, fwd_map,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(bshape, rev_map,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((3, k), lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((k, c2), lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((k, c3), lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        po_ax = po_rows[i][0]
        lims = jnp.stack([jnp.min(po_ax), jnp.max(po_ax)])
        args.extend([v, v, po_rows[i], o2_rows[i], o3_rows[i], lims])

    out_shape = []
    out_specs = []
    scratch = []
    for i in range(n):
        k, _, c2, c3 = dims[i]
        bshape, fwd_map, rev_map = vol_block(i)
        full = tuple(ap if d == (2 if modes[i] == "canon2" else 1)
                     else bshape[d] for d in range(4))
        out_shape.append(jax.ShapeDtypeStruct(full, jnp.uint8))
        out_shape.append(jax.ShapeDtypeStruct(full, jnp.uint8))
        out_specs.append(pl.BlockSpec(bshape, fwd_map,
                                      memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec(bshape, rev_map,
                                      memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((k, c2, c3), jnp.float32))
        scratch.append(pltpu.VMEM((k, c2, c3), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if pad:
        outs = [o[:, :, :a] if modes[i // 2] == "canon2" else o[:, :a]
                for i, o in enumerate(outs)]
    return list(outs)
