"""Demo-stream stage ablation (round 5 diagnostic)."""
import dataclasses, sys, time
import numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

import jax
from fiesta_tpu import configure_compile_cache
configure_compile_cache()
import jax.numpy as jnp
from functools import partial
from fiesta_tpu import DEMO_ONBOARD
from fiesta_tpu.grid import make_state, local_window, window_mask
from fiesta_tpu.io import replay
from fiesta_tpu.ops import fusion, raycast
from fiesta_tpu.ops.depth import depth_to_cloud_components, pose_to_matrix
from fiesta_tpu.ops.pallas.fuse import fuse_counts_pallas
from fiesta_tpu.pipeline import UpdateStats, rebuild_d2

h, w = 120, 160
cfg = dataclasses.replace(replay.scale_intrinsics(DEMO_ONBOARD, h, w),
                          max_points_per_scan=h * w)
world, frames = replay.make_sequence(cfg, n_frames=49, n_boxes=20, seed=0,
                                     kind="depth", height=h, width=w,
                                     period=12.0, orbit_radius=5.0)
n = len(frames) // 3
depths = jnp.asarray(np.stack([f[2] for f in frames[:n*3]]).reshape(n,3,h,w), jnp.float32)
tfs = jnp.asarray(np.stack([pose_to_matrix(*f[1]) for f in frames[:n*3]]).reshape(n,3,4,4), jnp.float32)
poss = jnp.asarray(np.stack([frames[i*3+2][1][0] for i in range(n)]), jnp.float32)

def tick(skip, st, d3, tf3, pd, ptf, pos):
    k = d3.shape[0]
    xs, ys, zs, vals = [], [], [], []
    ld, lt = pd, ptf
    for i in range(k):
        if "depth" in skip:
            x = y = z = d3[i].reshape(-1) * 0.001
            v = jnp.ones(h*w, bool)
        else:
            x, y, z, v = depth_to_cloud_components(cfg, d3[i], tf3[i], lt, ld,
                                                   use_filter=True)
            x, y, z, v = (a.reshape(-1) for a in (x, y, z, v))
        xs.append(x); ys.append(y); zs.append(z); vals.append(v)
        ld, lt = d3[i], tf3[i]
    pts = (jnp.stack(xs), jnp.stack(ys), jnp.stack(zs))
    valids = jnp.stack(vals)
    win = local_window(cfg, pos)
    if "integrate" in skip:
        hit, miss = st.hit_cnt, st.miss_cnt
    else:
        res = raycast.integrate_scan_scanline_batch(
            cfg, st.hit_cnt, st.miss_cnt, pts, valids, tf3[:, :3, 3],
            win, transforms=tf3)
        hit, miss = res.hit_cnt, res.miss_cnt
    wmin, wmax = win
    if "fuse" in skip:
        lo, seen, occ = st.logodds, st.seen, (st.logodds > cfg.min_occupancy_log).astype(jnp.uint8)
        hit0, miss0 = jnp.zeros_like(hit), jnp.zeros_like(miss)
        n_obs = jnp.int32(0)
    elif "fusexla" in skip:
        fr = fusion.fuse_counts(cfg, st.logodds, st.seen, hit, miss,
                                window_mask=window_mask(cfg, wmin, wmax))
        lo, seen, occ = fr.logodds, fr.seen, fr.occupied.astype(jnp.uint8)
        hit0, miss0 = jnp.zeros_like(hit), jnp.zeros_like(miss)
        n_obs = fr.num_observed
    else:
        lo, seen, occ, hit0, miss0, n_obs, _, _ = fuse_counts_pallas(
            st.logodds, st.seen, hit, miss,
            l_hit=cfg.prob_hit_log, l_miss=cfg.prob_miss_log,
            clamp_min=cfg.clamp_min_log, clamp_max=cfg.clamp_max_log,
            occ_thresh=cfg.min_occupancy_log, occ_is_eq=False,
            window=(wmin, wmax))
    if "edt" in skip:
        d2 = st.d2 + (occ.astype(jnp.int32) * 0)
    else:
        d2 = rebuild_d2(cfg, occ > 0)
    st = dataclasses.replace(st, logodds=lo, seen=seen, d2=d2,
                             hit_cnt=hit0, miss_cnt=miss0)
    return st, n_obs

def make_stream(skip):
    @jax.jit
    def run(st, depths, tfs, poss):
        def body(carry, inp):
            s, pd, ptf = carry
            d3, tf3, pos = inp
            s, n_obs = tick(skip, s, d3, tf3, pd, ptf, pos)
            return (s, d3[-1], tf3[-1]), n_obs
        (s, _, _), obs = jax.lax.scan(body, (st, depths[0,0], tfs[0,0]),
                                      (depths, tfs, poss))
        return s, obs
    return run

state0 = make_state(cfg)
# warm the map
warm = make_stream(frozenset())
st0, _ = warm(state0, depths[:4], tfs[:4], poss[:4])
float(st0.d2[0,0,0])

sl = slice(4, None)
def measure(name, skip, reps=3):
    f = make_stream(frozenset(skip))
    st, _ = f(st0, depths[sl], tfs[sl], poss[sl])
    float(st.d2[0,0,0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        st, obs = f(st0, depths[sl], tfs[sl], poss[sl])
        float(st.d2[0,0,0])
        best = min(best, time.perf_counter() - t0)
    nb = depths[sl].shape[0]
    log(f"{name:24s}: {1e3*best/nb:6.2f} ms/batch (obs={int(obs[-1])})")
    return 1e3*best/nb

full = measure("FULL", [])
measure("no depth conv", ["depth"])
measure("no integrate(carve)", ["integrate"])
measure("fuse=xla chain", ["fusexla"])
measure("no fuse", ["fuse"])
measure("no EDT", ["edt"])
