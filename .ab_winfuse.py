"""Cow-scale WINDOW-mode stream: FIESTA_FUSE=pallas|xla bit-equality + timing."""
import os, sys, time
import numpy as np
mode = sys.argv[1]
os.environ["FIESTA_FUSE"] = mode
import jax, dataclasses
import jax.numpy as jnp
from fiesta_tpu import configure_compile_cache
configure_compile_cache()
from fiesta_tpu import COW_AND_LADY
from fiesta_tpu.io import replay
from fiesta_tpu.pipeline import FiestaPipeline, fused_batch_step, fused_stream

h, w = 192, 256
cfg = dataclasses.replace(replay.scale_intrinsics(COW_AND_LADY, h, w),
                          max_points_per_scan=h * w,
                          global_update=False, radius=(4.0, 4.0, 2.0))
world, frames = replay.make_sequence(cfg, n_frames=49, n_boxes=20, seed=0,
                                     kind="cloud", height=h, width=w,
                                     period=12.0, orbit_radius=5.0)
pipe = FiestaPipeline(cfg, method="scanline")
apts, avals, atfs, apos = replay.stage_update_batches(pipe, frames)
for i in range(4):
    pipe.state, _ = fused_batch_step(cfg, pipe.state, apts[i], avals[i],
                                     atfs[i], apos[i], use_window=True,
                                     method="scanline")
float(pipe.state.d2[0,0,0])
spts, svals, stfs, spos = (a[4:] for a in (apts, avals, atfs, apos))
st, stats = fused_stream(cfg, pipe.state, spts, svals, stfs, spos,
                         use_window=True, method="scanline")
float(st.d2[0,0,0])
reps = []
for _ in range(3):
    t0 = time.perf_counter()
    st, stats = fused_stream(cfg, st, spts, svals, stfs, spos,
                             use_window=True, method="scanline")
    float(st.d2[0,0,0])
    reps.append(time.perf_counter() - t0)
n = spts.shape[0]
print(f"mode={mode}: {[round(1e3*r/n,2) for r in reps]} ms/batch "
      f"obs={int(stats.num_observed[-1])}", flush=True)
np.savez(f"/tmp/ab_winfuse_{mode}.npz",
         logodds=np.asarray(st.logodds), d2=np.asarray(st.d2),
         seen=np.asarray(st.seen), obs=np.asarray(stats.num_observed))
