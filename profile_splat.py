"""Isolated endpoint-splat experiments (VERDICT round-2 item 1).

Measures the packed endpoint scatter (ops/raycast._scanline_seeds) in
isolation and variants, streamed inside one fori_loop program each (no
dispatch in the timed region; results folded into the carry so nothing
dead-code-eliminates).
"""

import time
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fiesta_tpu import configure_compile_cache
    configure_compile_cache()

    K, R = 3, 49152
    BX, BY, BZ = 201, 201, 80
    NB = BX * BY * BZ
    rng = np.random.default_rng(0)
    lin = jnp.asarray(rng.integers(0, NB, (K, R)), jnp.int32)
    val = jnp.asarray(rng.uniform(1000.0, 3000.0, (K, R)), jnp.float32)

    def timed(name, fn, *args, reps=10):
        def loop(a, b):
            def body(i, carry):
                acc, aa = carry
                # carry-dependent (always-zero at runtime) index nudge:
                # keeps the whole computation inside the loop — a loop-
                # invariant input gets HOISTED and times ~0 (PERF.md #5)
                nudge = (acc[:1] > 1e30).astype(jnp.int32)
                r = fn(aa + nudge, b)
                return (acc + r.ravel()[:8], aa)
            acc0 = jnp.zeros(8, jnp.float32)
            # scalar result: the caller reads it back with float() — on the
            # axon tunnel block_until_ready does NOT reliably wait
            # (PERF.md measurement protocol #1)
            return jax.lax.fori_loop(0, reps, body, (acc0, a))[0].sum()

        lf = jax.jit(loop)
        float(lf(*args))
        t0 = time.perf_counter()
        float(lf(*args))
        ms = (time.perf_counter() - t0) / reps * 1e3
        log(f"{name:45s} {ms:7.3f} ms/rep ({reps} reps)")
        return ms

    # (a) vmapped per-scan scatter (current production shape)
    def vmapped(lin_, val_):
        def one(li, va):
            return jnp.zeros((NB,), jnp.float32).at[li].max(va, mode="drop")
        return jax.vmap(one)(lin_, val_)

    # (b) one flat scatter over K*NB
    def flat(lin_, val_):
        biglin = (lin_ + (jnp.arange(K, dtype=jnp.int32) * NB)[:, None]
                  ).ravel()
        return (jnp.zeros((K * NB,), jnp.float32)
                .at[biglin].max(val_.ravel(), mode="drop")
                .reshape(K, NB))

    # (c) flat scatter, indices pre-sorted, sorted flag asserted
    def flat_sorted(lin_, val_):
        biglin = (lin_ + (jnp.arange(K, dtype=jnp.int32) * NB)[:, None]
                  ).ravel()
        sl, sv = jax.lax.sort([biglin, val_.ravel()], num_keys=1)
        return (jnp.zeros((K * NB,), jnp.float32)
                .at[sl].max(sv, mode="drop", indices_are_sorted=True)
                .reshape(K, NB))

    # (d) sort cost alone
    def sort_only(lin_, val_):
        biglin = (lin_ + (jnp.arange(K, dtype=jnp.int32) * NB)[:, None]
                  ).ravel()
        sl, sv = jax.lax.sort([biglin, val_.ravel()], num_keys=1)
        return sl.astype(jnp.float32) + sv

    # (e) sorted + dedup to unique indices (dups routed to drop) + unique flag
    def flat_sorted_unique(lin_, val_):
        biglin = (lin_ + (jnp.arange(K, dtype=jnp.int32) * NB)[:, None]
                  ).ravel()
        # sort by (lin asc, val desc): first of each run is the max
        sl, sv = jax.lax.sort([biglin, -val_.ravel()], num_keys=2)
        first = jnp.concatenate([jnp.ones(1, bool), sl[1:] != sl[:-1]])
        # neutralize duplicates by VALUE (scatter-max of 0 into a zeros
        # target is a no-op), NOT by routing to an OOB index: rewriting
        # indices breaks the indices_are_sorted promise (interleaved OOB
        # sentinels are not sorted) — observed wrong results on TPU
        sval = jnp.where(first, -sv, 0.0)
        return (jnp.zeros((K * NB,), jnp.float32)
                .at[sl].max(sval, mode="drop", indices_are_sorted=True)
                .reshape(K, NB))

    log(f"updates: {K}x{R} = {K*R} into box {BX}x{BY}x{BZ} ({NB} voxels)")
    timed("(a) vmapped per-scan scatter [current]", vmapped, lin, val)
    timed("(b) flat single scatter", flat, lin, val)
    timed("(c) flat sorted + indices_are_sorted", flat_sorted, lin, val)
    timed("(d) sort alone", sort_only, lin, val)
    timed("(e) sorted+dedup+unique_indices", flat_sorted_unique, lin, val)

    # sanity: variants agree
    a = vmapped(lin, val)
    for name, fn in [("b", flat), ("c", flat_sorted),
                     ("e", flat_sorted_unique)]:
        b = fn(lin, val).reshape(K, NB)
        assert np.allclose(np.asarray(a), np.asarray(b)), name
    log("variants agree")


if __name__ == "__main__":
    main()
