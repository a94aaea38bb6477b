"""Stream-level stage ablation of the production tick (diagnostic).

PERF.md methodology: per-stage marginal cost = (full stream) minus
(stream with that stage stubbed), measured on the REAL fused_stream
executor over recorded batches — includes all fusion/overlap effects the
injected-dependency timing loops miss.  Stubs keep shapes and state flow
so the rest of the program is unchanged.
"""
import dataclasses
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from fiesta_tpu import configure_compile_cache
    configure_compile_cache()
    import jax.numpy as jnp
    from functools import partial

    from fiesta_tpu import COW_AND_LADY
    from fiesta_tpu.grid import local_window, occupied_grid
    from fiesta_tpu.io import replay
    from fiesta_tpu.ops import fusion, raycast
    from fiesta_tpu import pipeline as pipeline_mod
    from fiesta_tpu.ops.pallas.fuse import fuse_counts_pallas, fuse_supported
    from fiesta_tpu.pipeline import (
        FiestaPipeline, UpdateStats, fused_batch_step, tick_rebuild_esdf)

    h, w = 192, 256
    cfg = dataclasses.replace(
        replay.scale_intrinsics(COW_AND_LADY, h, w),
        max_points_per_scan=h * w,
    )
    world, frames = replay.make_sequence(
        cfg, n_frames=49, n_boxes=20, seed=0, kind="cloud",
        height=h, width=w, period=12.0, orbit_radius=5.0,
    )
    pipe = FiestaPipeline(cfg, method="scanline")
    apts, avals, atfs, apos = replay.stage_update_batches(pipe, frames)
    # warm the map with the first 4 batches (real occupancy content)
    for i in range(4):
        pipe.state, _ = fused_batch_step(
            cfg, pipe.state, apts[i], avals[i], atfs[i], apos[i],
            method="scanline")
    pipe.sync_device()
    state0 = pipe.state
    sl = slice(4, 16)
    stream_args = (apts[sl], avals[sl], atfs[sl], apos[sl])
    n_batches = stream_args[0].shape[0]

    def tick_body(skip, st, pts, vals, tfs, pos, apply_mode=None):
        if "splat" in skip:
            box = raycast._carve_box_shape(cfg)
            k = pts.shape[0]
            starts = jnp.zeros((k, 3), jnp.int32) + 10
            seeds = jnp.zeros((k,) + box, jnp.float32) \
                + pts[0, 0, 0] * 1e-20
            hit_b = jnp.zeros((k,) + box, jnp.uint8)
            epfree_b = hit_b
            po_box = jnp.zeros((k, 3), jnp.float32) + 50.0
            rvalid = vals
        else:
            starts, po_box, seeds, hit_b, epfree_b, rvalid = \
                raycast._scanline_seeds_batch(
                    cfg, pts, vals, tfs[:, :3, 3], transforms=tfs)
        if "carve" in skip:
            free = seeds > 1e30
        else:
            free = raycast.carve_free_mask_batch(cfg, seeds, po_box)
        hitc = hit_b
        missc = jnp.maximum(hit_b, epfree_b) + free.astype(jnp.uint8)
        if "rmw" in skip:
            hit_cnt, miss_cnt = st.hit_cnt, st.miss_cnt
            # keep a data dependency on the boxes so they aren't DCE'd
            hit_cnt = hit_cnt + hitc[0, 0, 0, 0]
            miss_cnt = miss_cnt + missc[0, 0, 0, 0]
        else:
            hit_cnt, miss_cnt = raycast.apply_box_counts(
                st.hit_cnt, st.miss_cnt, starts, hitc, missc,
                mode=apply_mode)
        if "fusion" in skip:
            lo, seen = st.logodds, st.seen
            occ = occupied_grid(cfg, lo)
            occ = occ ^ (miss_cnt[0, 0, 0] > 200)
            n_obs = jnp.int32(0)
        elif (pipeline_mod._FUSE_IMPL == "pallas"
                and jax.default_backend() == "tpu"
                and fuse_supported(cfg.grid_shape)):
            # mirror the REAL tick's fusion implementation (the XLA chain
            # here once made the fusion marginal read 1.6 ms while the
            # production stream paid 0.14)
            on, off_eq = ((cfg.min_occupancy_log, False)
                          if cfg.probabilistic else (1.0, True))
            lo, seen, occ, hit_cnt, miss_cnt, n_obs, _, _ = \
                fuse_counts_pallas(
                    st.logodds, st.seen, hit_cnt, miss_cnt,
                    l_hit=cfg.prob_hit_log, l_miss=cfg.prob_miss_log,
                    clamp_min=cfg.clamp_min_log,
                    clamp_max=cfg.clamp_max_log,
                    occ_thresh=on, occ_is_eq=off_eq,
                )
            if "stats" in skip:
                n_obs = jnp.int32(0)
        else:
            fr = fusion.fuse_counts(cfg, lo_ := st.logodds, st.seen,
                                    hit_cnt, miss_cnt)
            lo, seen, occ = fr.logodds, fr.seen, fr.occupied
            n_obs = fr.num_observed if "stats" not in skip else jnp.int32(0)
        if "edt" in skip:
            d2 = st.d2 + occ[0, 0, 0]
            closest = st.closest
        else:
            # the PRODUCTION derivation: lazy closest mode (the round-5
            # default) ticks d2-only; eager configs keep the argmin
            d2, closest = tick_rebuild_esdf(cfg, occ)
            if closest is None:
                closest = st.closest
        st2 = dataclasses.replace(
            st, logodds=lo, seen=seen, d2=d2, closest=closest,
            hit_cnt=jnp.zeros_like(hit_cnt),
            miss_cnt=jnp.zeros_like(miss_cnt))
        stats = UpdateStats(n_obs, jnp.int32(0), jnp.int32(0),
                            jnp.int32(0))
        return st2, stats

    def make_stream(skip):
        @jax.jit
        def run(st, pts, vals, tfs, poss):
            def body(s, inp):
                p, v, t, q = inp
                s2, stats = tick_body(skip, s, p, v, t, q)
                return s2, stats.num_observed
            s_fin, obs = jax.lax.scan(body, st, (pts, vals, tfs, poss))
            # consume EVERY state field: an output left dead lets XLA
            # DCE its whole producer chain out of the loop — round 3's
            # "closest tracking ~free" was exactly this artifact
            return (s_fin.d2[0, 0, 0] + jnp.sum(obs)
                    + s_fin.logodds[0, 0, 0].astype(jnp.int32)
                    + s_fin.closest.ravel()[0].astype(jnp.int32)
                    + s_fin.seen.ravel()[0].astype(jnp.int32))
        return run

    def measure(name, skip, reps=3):
        fn = make_stream(skip)
        float(fn(state0, *stream_args))   # compile + warm (host readback:
        ts = []                           # block_until_ready lies, PERF.md)
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(state0, *stream_args))
            ts.append((time.perf_counter() - t0) / n_batches * 1e3)
        ms = float(np.median(ts))
        log(f"{name:<28s} {ms:7.3f} ms/batch   reps={['%.2f' % t for t in ts]}")
        return ms

    probes = set(sys.argv[1:])
    if "--ab" in probes:
        # TPU A/B (VERDICT r3 #1 done-criterion): the pallas in-place
        # region-add vs the XLA slice-RMW chain must evolve the map
        # BIT-identically over the real stream at cow scale.
        def run_full_state(apply_mode):
            @jax.jit
            def run(st, pts, vals, tfs, poss):
                def body(s, inp):
                    p, v, t, q = inp
                    s2, _ = tick_body((), s, p, v, t, q,
                                      apply_mode=apply_mode)
                    return s2, ()
                s_fin, _ = jax.lax.scan(body, st,
                                        (pts, vals, tfs, poss))
                return s_fin
            out = run(state0, *stream_args)
            jax.block_until_ready(out.d2)
            return out

        a = run_full_state("pallas")
        b = run_full_state("rmw")
        ab_ok = True
        for f in ("logodds", "seen", "d2", "closest"):
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            neq = int((x != y).sum())
            ab_ok &= neq == 0
            log(f"A/B pallas-vs-rmw {f}: "
                f"{'BIT-EQUAL' if neq == 0 else f'{neq} MISMATCHES'}")
        log(f"A/B RESULT: {'PASS' if ab_ok else 'FAIL'}")

    if "--zeros" in probes:
        # splat target init: bandwidth-rate pallas fill vs XLA zeros
        from fiesta_tpu.ops.pallas import fill
        orig = fill.zeros_f32
        pz = measure("FULL (pallas zero-fill)", ())
        fill.zeros_f32 = lambda n: jnp.zeros((n,), jnp.float32)
        xz = measure("FULL (xla zeros)", ())
        fill.zeros_f32 = orig
        log(f"  -> pallas fill saves {xz - pz:+.3f} ms/batch")

    if not probes or "--stages" in probes:
        full = measure("FULL stream", ())
        for stage in ("splat", "carve", "rmw", "fusion", "edt", "stats"):
            ms = measure(f"minus {stage}", (stage,))
            log(f"  -> {stage} marginal: {full - ms:+.3f} ms")


if __name__ == "__main__":
    main()
