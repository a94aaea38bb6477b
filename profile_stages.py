"""Per-stage roofline profiling of the fused mapping tick (diagnostic).

Each stage runs R times inside ONE jitted ``fori_loop`` with a carried
data dependency (so XLA cannot hoist it), streamed with a single scalar
readback — the only timing protocol the axon tunnel respects (PERF.md).
"""
import dataclasses
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


R = 20


def timed(name, fn, *args):
    """fn must be a jitted callable returning a scalar-reducible array."""
    import jax

    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / R
    log(f"{name:<42s} {ms:7.3f} ms")
    return ms


def main():
    import jax

    from fiesta_tpu import configure_compile_cache
    configure_compile_cache()
    import jax.numpy as jnp
    from functools import partial

    from fiesta_tpu import COW_AND_LADY
    from fiesta_tpu.io import replay
    from fiesta_tpu.ops import fusion, raycast
    from fiesta_tpu.ops.pallas import edt as edt_mod
    from fiesta_tpu.pipeline import FiestaPipeline, fused_batch_step

    h, w = 192, 256
    cfg = dataclasses.replace(
        replay.scale_intrinsics(COW_AND_LADY, h, w),
        max_points_per_scan=h * w,
    )
    world, frames = replay.make_sequence(
        cfg, n_frames=7, n_boxes=20, seed=0, kind="cloud",
        height=h, width=w, period=12.0, orbit_radius=5.0,
    )
    pipe = FiestaPipeline(cfg, method="scanline")
    apts, avals, atfs, apos = replay.stage_update_batches(pipe, frames)
    pts, vals, tfs, pos = apts[0], avals[0], atfs[0], apos[0]

    # settle the map so occupancy is realistic
    for i in range(0, 6, 3):
        pipe.state, _ = fused_batch_step(
            cfg, pipe.state, pts, vals, tfs, pos, method="scanline")
    pipe.sync_device()
    state = pipe.state
    occupied = jnp.asarray(
        np.asarray(pipe.occupied()))  # materialized bool grid

    pw = jnp.einsum("kpj,kij->kpi", pts, tfs[:, :3, :3]) \
        + tfs[:, None, :3, 3]
    origins = tfs[:, :3, 3]

    # ---- stage: seeds splat (one flat packed scatter) ----
    @jax.jit
    def splat(p):
        def body(i, carry):
            p_, acc = carry
            starts, po_box, seeds, hit_b, epfree_b, rvalid = \
                raycast._scanline_seeds_batch(cfg, p_, vals, origins)
            s = seeds[0, 0, 0, 0]
            return (p_ + s * 1e-20, acc + s)
        _, acc = jax.lax.fori_loop(0, R, body, (p, jnp.float32(0)))
        return acc
    timed("seeds splat (3x49k packed scatter)", splat, pw)

    # precompute seeds once for downstream stages
    starts, po_box, seeds, hit_b, epfree_b, rvalid = jax.jit(
        lambda a, v, o: raycast._scanline_seeds_batch(cfg, a, v, o)
    )(pw, vals, origins)
    jax.block_until_ready(seeds)

    # ---- stage: carve sweeps + combine ----
    @jax.jit
    def carve(s):
        def body(i, carry):
            s_, acc = carry
            free = raycast.carve_free_mask_batch(cfg, s_, po_box)
            f = free[0, 0, 0, 0].astype(jnp.float32)
            return (s_ + f * 1e-20, acc + f)
        _, acc = jax.lax.fori_loop(0, R, body, (s, jnp.float32(0)))
        return acc
    timed("carve sweeps+combine (pallas)", carve, seeds)

    free = jax.jit(
        lambda s: raycast.carve_free_mask_batch(cfg, s, po_box))(seeds)
    jax.block_until_ready(free)
    hitc = hit_b
    missc = jnp.maximum(hit_b, epfree_b) + free.astype(jnp.uint8)

    # ---- stage: counter slice RMW (6 dynamic slices) ----
    box = raycast._carve_box_shape(cfg)

    @jax.jit
    def slices(hc, mc):
        def body(i, carry):
            hcnt, mcnt = carry
            for k in range(3):
                s0, s1, s2 = starts[k, 0], starts[k, 1], starts[k, 2]
                reg = jax.lax.dynamic_slice(hcnt, (s0, s1, s2), box)
                hcnt = jax.lax.dynamic_update_slice(
                    hcnt, reg + hitc[k], (s0, s1, s2))
                reg = jax.lax.dynamic_slice(mcnt, (s0, s1, s2), box)
                mcnt = jax.lax.dynamic_update_slice(
                    mcnt, reg + missc[k], (s0, s1, s2))
            return (hcnt, mcnt)
        hcnt, mcnt = jax.lax.fori_loop(0, R, body, (hc, mc))
        return hcnt[0, 0, 0] + mcnt[0, 0, 0]
    timed("counter slice RMW (6 u8 slices)", slices,
          state.hit_cnt, state.miss_cnt)

    # experiment: hit<<8|miss packed into ONE u16 grid -> 3 slice RMWs
    packed_c = (state.hit_cnt.astype(jnp.uint16) * 256
                + state.miss_cnt.astype(jnp.uint16))
    pbox = (hitc.astype(jnp.uint16) * 256 + missc.astype(jnp.uint16))

    @jax.jit
    def slices_packed(pc):
        def body(i, carry):
            pcnt = carry
            for k in range(3):
                s0, s1, s2 = starts[k, 0], starts[k, 1], starts[k, 2]
                reg = jax.lax.dynamic_slice(pcnt, (s0, s1, s2), box)
                pcnt = jax.lax.dynamic_update_slice(
                    pcnt, reg + pbox[k], (s0, s1, s2))
            return pcnt
        pcnt = jax.lax.fori_loop(0, R, body, pc)
        return pcnt[0, 0, 0]
    timed("counter slice RMW packed u16 (3 slices)", slices_packed,
          packed_c)

    # the above two use loop-CONSTANT offsets, which XLA can strengthen;
    # the production tick's offsets change every tick.  Re-measure with
    # per-iteration varying starts, plus a union-box variant (accumulate
    # the K boxes at relative offsets in one padded union, then a single
    # RMW pair into the full grid).
    @jax.jit
    def slices_dyn(hc, mc):
        def body(i, carry):
            hcnt, mcnt = carry
            for k in range(3):
                s0 = starts[k, 0] + (i % 5)
                s1, s2 = starts[k, 1], starts[k, 2]
                reg = jax.lax.dynamic_slice(hcnt, (s0, s1, s2), box)
                hcnt = jax.lax.dynamic_update_slice(
                    hcnt, reg + hitc[k], (s0, s1, s2))
                reg = jax.lax.dynamic_slice(mcnt, (s0, s1, s2), box)
                mcnt = jax.lax.dynamic_update_slice(
                    mcnt, reg + missc[k], (s0, s1, s2))
            return (hcnt, mcnt)
        hcnt, mcnt = jax.lax.fori_loop(0, R, body, (hc, mc))
        return hcnt[0, 0, 0] + mcnt[0, 0, 0]
    timed("counter RMW (6 slices, VARYING offsets)", slices_dyn,
          state.hit_cnt, state.miss_cnt)

    M = 32
    gsh = cfg.grid_shape
    ubox = tuple(min(box[i] + M, gsh[i]) for i in range(3))

    @jax.jit
    def slices_union(hc, mc):
        def body(i, carry):
            hcnt, mcnt = carry
            base = jnp.minimum(jnp.minimum(starts[0], starts[1]),
                               starts[2])
            base = base.at[0].add(i % 5)
            uh = jnp.zeros(ubox, jnp.uint8)
            um = jnp.zeros(ubox, jnp.uint8)
            for k in range(3):
                at = (starts[k, 0] + (i % 5) - base[0],
                      starts[k, 1] - base[1], starts[k, 2] - base[2])
                reg = jax.lax.dynamic_slice(uh, at, box)
                uh = jax.lax.dynamic_update_slice(uh, reg + hitc[k], at)
                reg = jax.lax.dynamic_slice(um, at, box)
                um = jax.lax.dynamic_update_slice(um, reg + missc[k], at)
            at = (base[0], base[1], base[2])
            reg = jax.lax.dynamic_slice(hcnt, at, ubox)
            hcnt = jax.lax.dynamic_update_slice(hcnt, reg + uh, at)
            reg = jax.lax.dynamic_slice(mcnt, at, ubox)
            mcnt = jax.lax.dynamic_update_slice(mcnt, reg + um, at)
            return (hcnt, mcnt)
        hcnt, mcnt = jax.lax.fori_loop(0, R, body, (hc, mc))
        return hcnt[0, 0, 0] + mcnt[0, 0, 0]
    timed("counter RMW (union box, varying offsets)", slices_union,
          state.hit_cnt, state.miss_cnt)

    # ---- variant: NO-RMW counter application (round-3 item 1) ----
    # pad each scan's box onto a zero grid and ADD (3 dus-of-zeros + adds
    # instead of 6 slice read-modify-writes); XLA can fuse the padded adds
    # into the downstream fusion elementwise pass.  Saturation applied
    # once on the widened sum (bit-equal to sequential saturating adds
    # whenever no intermediate add saturates — always true at K<=8 scans
    # per tick unless the incoming counter is already within K of 255).
    @jax.jit
    def counters_padded_add(hc, mc):
        def body(i, carry):
            hcnt, mcnt = carry
            ht = hcnt.astype(jnp.uint16)
            mt = mcnt.astype(jnp.uint16)
            for k in range(3):
                s0 = starts[k, 0] + (i % 5)
                at = (s0, starts[k, 1], starts[k, 2])
                zh = jax.lax.dynamic_update_slice(
                    jnp.zeros(hcnt.shape, jnp.uint16),
                    hitc[k].astype(jnp.uint16), at)
                zm = jax.lax.dynamic_update_slice(
                    jnp.zeros(mcnt.shape, jnp.uint16),
                    missc[k].astype(jnp.uint16), at)
                ht = ht + zh
                mt = mt + zm
            hcnt = jnp.minimum(ht, 255).astype(jnp.uint8)
            mcnt = jnp.minimum(mt, 255).astype(jnp.uint8)
            return (hcnt, mcnt)
        hcnt, mcnt = jax.lax.fori_loop(0, R, body, (hc, mc))
        return hcnt[0, 0, 0] + mcnt[0, 0, 0]
    timed("counters: padded-add (no RMW, varying)", counters_padded_add,
          state.hit_cnt, state.miss_cnt)

    # ---- floor breakdown: the 2-3 ms of 'scan mechanics' ----
    @jax.jit
    def floor_einsum(p):
        def body(i, carry):
            p_, acc = carry
            pw_ = jnp.einsum("kpj,kij->kpi", p_, tfs[:, :3, :3]) \
                + tfs[:, None, :3, 3]
            s = pw_[0, 0, 0]
            return (p_ + s * 1e-20, acc + s)
        _, acc = jax.lax.fori_loop(0, R, body, (p, jnp.float32(0)))
        return acc
    timed("floor: pose einsum (3x49k pts)", floor_einsum, pts)

    @jax.jit
    def floor_zeroing(hc):
        def body(i, carry):
            x, acc = carry
            z1 = jnp.zeros_like(hc) + x
            z2 = jnp.zeros_like(hc) + x
            return (x ^ jnp.uint8(1), acc + z1[0, 0, 0] + z2[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, R, body,
                                   (jnp.uint8(0), jnp.uint8(0)))
        return acc
    timed("floor: counter zeroing (2 full grids)", floor_zeroing,
          state.hit_cnt)

    @jax.jit
    def floor_stats(lo):
        def body(i, carry):
            lo_, acc = carry
            observed = state.miss_cnt > jnp.uint8(0)
            occ_b = lo_ > cfg.min_occupancy_log
            n_obs = jnp.sum(observed, dtype=jnp.int32)
            n_occ = jnp.sum(occ_b, dtype=jnp.int32)
            return (lo_ + jnp.float32(1e-20) * n_obs, acc + n_obs + n_occ)
        _, acc = jax.lax.fori_loop(0, R, body, (lo, jnp.int32(0)))
        return acc
    timed("floor: stats reductions (2 grid sums)", floor_stats,
          state.logodds)

    @jax.jit
    def floor_decode(s):
        def body(i, carry):
            s_, acc = carry
            seeds_, hb, eb = raycast._seeds_from_packed(cfg, s_)
            v = seeds_[0, 0, 0, 0] + hb.astype(jnp.float32)[0, 0, 0, 0]
            return (s_ + v * 1e-20, acc + v)
        _, acc = jax.lax.fori_loop(0, R, body, (s, jnp.float32(0)))
        return acc
    # feed the packed splat output (seeds here is already decoded; use a
    # packed-like array of the same shape/dtype)
    timed("floor: seeds decode (3 box volumes)", floor_decode, seeds)

    @jax.jit
    def floor_prep(p):
        def body(i, carry):
            p_, acc = carry
            starts_, po_, lin_, val_, rv_ = jax.vmap(
                lambda pp, v, o: raycast._scanline_seeds_prep(
                    cfg, pp, v, o))(p_, vals, origins)
            s = val_[0, 0]
            return (p_ + s * 1e-20, acc + s)
        _, acc = jax.lax.fori_loop(0, R, body, (p, jnp.float32(0)))
        return acc
    timed("floor: per-ray prep (no scatter)", floor_prep, pw)

    # ---- stage: fusion ----
    @jax.jit
    def fuse(lo):
        def body(i, carry):
            lo_, acc = carry
            fr = fusion.fuse_counts(cfg, lo_, state.seen,
                                    state.hit_cnt, state.miss_cnt)
            return (fr.logodds, acc + fr.logodds[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, R, body,
                                   (lo, jnp.float32(0)))
        return acc
    timed("occupancy fusion (log-odds+flips)", fuse, state.logodds)

    # ---- stage: EDT components ----
    t_total = edt_mod.trunc_vox_for(cfg.resolution, cfg.trunc_dist)
    t_fine = edt_mod.trunc_vox_for(cfg.resolution, cfg.edt_fine_dist)
    log(f"t_fine={t_fine} t_total={t_total}")

    def loop_occ(fn):
        @jax.jit
        def run(o):
            def body(i, carry):
                o_, acc = carry
                d2 = fn(o_)
                return (o_ ^ (d2[0, 0, 0] > 10**9), acc + d2[0, 0, 0])
            _, acc = jax.lax.fori_loop(0, R, body, (o, jnp.int32(0)))
            return acc
        return run

    timed("EDT fine (exact, t=%d)" % t_fine,
          loop_occ(lambda o: edt_mod.truncated_edt_d2(o, t_fine)), occupied)

    if edt_mod.closest_plan(occupied.shape, t_fine) is not None:
        def edt_closest(o):
            d2, cl = edt_mod.truncated_edt_d2_closest(o, t_fine)
            # fold BOTH outputs into the probe so neither is DCE'd
            return d2 + cl[0, 0, 0, 0].astype(jnp.int32)
        timed("EDT+closest (packed argmin, t=%d)" % t_fine,
              loop_occ(edt_closest), occupied)

    @jax.jit
    def down(o):
        def body(i, carry):
            o_, acc = carry
            oc = edt_mod._downsample2_any(o_)
            return (o_ ^ oc[0, 0, 0], acc + oc.astype(jnp.int32)[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, R, body, (o, jnp.int32(0)))
        return acc
    timed("downsample 2x2x2 (MXU)", down, occupied)

    occ_c = jax.jit(edt_mod._downsample2_any)(occupied)
    jax.block_until_ready(occ_c)
    tc = -(-t_total // 2)
    timed("EDT coarse (t=%d, 1/8 voxels)" % tc,
          loop_occ(lambda o: edt_mod.truncated_edt_d2(o, tc)), occ_c)

    timed("EDT hierarchical total",
          loop_occ(lambda o: edt_mod.hierarchical_edt_d2(
              o, t_fine, t_total)), occupied)

    # ---- single min-plus pass components on the fine grid ----
    f0 = jnp.where(occupied, 0, edt_mod._INF_EDT).astype(jnp.int32)

    def loop_i32(fn):
        @jax.jit
        def run(f):
            def body(i, carry):
                f_, acc = carry
                p = fn(f_)
                return (f_ + (p[0, 0, 0] & 1), acc + p[0, 0, 0])
            _, acc = jax.lax.fori_loop(0, R, body, (f, jnp.int32(0)))
            return acc
        return run

    timed("  binary pass x (log t)",
          loop_i32(lambda f: edt_mod.binary_pass(f, t_fine)), f0)
    timed("  minplus pass leading (t=%d)" % t_fine,
          loop_i32(lambda f: edt_mod._minplus_pass(f, t_fine)), f0)
    timed("  transpose(1,0,2)+minplus",
          loop_i32(lambda f: edt_mod._minplus_pass(
              f.transpose(1, 0, 2), t_fine).transpose(1, 0, 2)), f0)
    timed("  transpose(2,1,0)+minplus",
          loop_i32(lambda f: edt_mod._minplus_pass(
              f.transpose(2, 1, 0), t_fine).transpose(2, 1, 0)), f0)

    # ---- full tick for reference ----
    # Two DCE traps to defeat (both bit this script before):
    #  * d2 must feed both the carry AND the accumulator — in rebuild mode
    #    the next tick never reads d2, so an unused d2 output lets XLA
    #    dead-code-eliminate the ENTIRE EDT stage (~5.5 ms "missing");
    #  * pts must be loop-carried, or the seeds+carve path (~6.6 ms) is
    #    loop-invariant and computed once for all R iterations.
    @jax.jit
    def tick(p, lo, hc, mc):
        def body(i, carry):
            p_, lo_, hc_, mc_, acc = carry
            st = dataclasses.replace(
                state, logodds=lo_, hit_cnt=hc_, miss_cnt=mc_)
            st2, stats = fused_batch_step.__wrapped__(
                cfg, st, p_, vals, tfs, pos, method="scanline")
            eps = st2.d2[0, 0, 0].astype(jnp.float32) * 1e-20
            return (p_ + eps, st2.logodds, st2.hit_cnt, st2.miss_cnt,
                    acc + stats.num_observed + st2.d2[0, 0, 0])
        _, _, _, _, acc = jax.lax.fori_loop(
            0, R, body, (p, lo, hc, mc, jnp.int32(0)))
        return acc
    timed("FULL fused tick", tick, pts, state.logodds, state.hit_cnt,
          state.miss_cnt)


if __name__ == "__main__":
    main()
