import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from fiesta_tpu import configure_compile_cache
configure_compile_cache()
from fiesta_tpu import DEMO_ONBOARD
from fiesta_tpu.io import replay

h, w = 120, 160
cfg = dataclasses.replace(replay.scale_intrinsics(DEMO_ONBOARD, h, w),
                          max_points_per_scan=h * w)
shape = cfg.grid_shape
print("grid", shape, "T=", int(round(cfg.trunc_dist / cfg.resolution)))

rng = np.random.default_rng(0)
occ = jnp.asarray(rng.random(shape) < 0.001)

from fiesta_tpu.pipeline import rebuild_d2

def timeit(name, prog, *args, n=20):
    f = jax.jit(prog)
    float(f(*args))
    t0 = time.perf_counter(); float(f(*args)); d = time.perf_counter() - t0
    print(f"{name}: {1e3*d/n:.2f} ms/iter  ({1e3*d:.1f} total)")

# EDT over full demo grid, loop-measured with consumed output
def edt_loop(occ):
    def body(i, c):
        d2 = rebuild_d2(cfg, occ != (i < 0))
        return c + d2.ravel()[::4096].sum()
    return jax.lax.fori_loop(0, 20, body, jnp.int32(0))
timeit("EDT full grid (T=50, 5.76M)", edt_loop, occ)

# EDT over the window+halo sub-box 160x160x36
sub = jnp.asarray(rng.random((160, 160, 36)) < 0.001)
def edt_sub(occ):
    def body(i, c):
        from fiesta_tpu.ops.pallas.edt import truncated_edt_d2
        d2 = truncated_edt_d2(occ != (i < 0), 50)
        return c + d2.ravel()[::4096].sum()
    return jax.lax.fori_loop(0, 20, body, jnp.int32(0))
timeit("EDT sub-box (160x160x36)", edt_sub, sub)

# fusion chain full grid
from fiesta_tpu.ops import fusion
lo = jnp.zeros(shape, jnp.float32)
seen = jnp.zeros(shape, jnp.uint8)
hit = jnp.asarray((rng.random(shape) < 0.01).astype(np.uint8))
miss = jnp.asarray((rng.random(shape) < 0.05).astype(np.uint8))
wm = jnp.asarray(rng.random(shape) < 0.1)
def fuse_loop(lo, seen, hit, miss, wm):
    def body(i, c):
        fr = fusion.fuse_counts(cfg, lo + c * 0.0, seen, hit, miss,
                                window_mask=wm)
        return c + fr.logodds.ravel()[::4096].sum() + fr.num_observed
    return jax.lax.fori_loop(0, 20, body, jnp.float32(0))
timeit("fusion XLA chain (windowed)", fuse_loop, lo, seen, hit, miss, wm)

# depth conversion x3
from fiesta_tpu.ops.depth import depth_to_cloud
d_img = jnp.asarray(rng.random((h, w)) * 5.0, jnp.float32)
tf = jnp.eye(4, dtype=jnp.float32)
def depth_loop(d_img, tf):
    def body(i, c):
        pts, val = depth_to_cloud.__wrapped__(cfg, d_img + c * 0.0, tf, tf,
                                              d_img, use_filter=True)
        return c + pts.ravel()[::97].sum()
    return jax.lax.fori_loop(0, 60, body, jnp.float32(0))
timeit("depth_to_cloud+filter x60", depth_loop, d_img, tf, n=60)

def depth_nofilter(d_img, tf):
    def body(i, c):
        pts, val = depth_to_cloud.__wrapped__(cfg, d_img + c * 0.0, tf, tf,
                                              d_img, use_filter=False)
        return c + pts.ravel()[::97].sum()
    return jax.lax.fori_loop(0, 60, body, jnp.float32(0))
timeit("depth_to_cloud NO filter x60", depth_nofilter, d_img, tf, n=60)
