"""Long-soak robustness drill: scrolling+persist, C20 oracle, crash-resume.

VERDICT r2 item 8: a 1000+-frame scrolling+persistent-archive soak with
periodic C20 oracle checks and a REAL crash-resume drill — the soak is run
as a subprocess, SIGKILLed mid-flight, resumed from its last atomic
checkpoint+archive pair, and the resumed run's final map must equal an
uninterrupted reference run BIT-EXACTLY.  (The reference framework keeps
its map in memory only and loses it on exit — durability is this
framework's own bar, SURVEY.md section 5.)

Usage:
  python soak.py                     # full drill (ref + victim + resume)
  python soak.py --frames 1200      # bigger soak
  python soak.py --platform cpu     # CPU smoke (small preset forced)

Internal legs (spawned by the drill): --leg ref|victim|resume.
Prints ONE JSON line per leg and a final drill summary.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_cfg(scale: str):
    import dataclasses

    from fiesta_tpu import FiestaConfig
    from fiesta_tpu.io import replay

    if scale == "small":
        h, w = 48, 64
        base = FiestaConfig(
            resolution=0.1,
            origin=(-3.2, -2.4, -1.2),
            map_size=(6.4, 4.8, 2.4),       # 64 x 48 x 24
            min_ray_length=0.2,
            max_ray_length=2.2,
            trunc_dist=1.2,
            edt_fine_dist=1.2,
        )
        orbit = 1.8
    elif scale == "mid":  # a real-load scrolling window for the TPU soak
        h, w = 96, 128
        base = FiestaConfig(
            resolution=0.05,
            origin=(-5.0, -5.0, -1.0),
            map_size=(10.0, 10.0, 2.0),     # 200 x 200 x 40 = 1.6 M vox
            min_ray_length=0.3,
            max_ray_length=4.0,
            trunc_dist=2.5,
            edt_fine_dist=2.5,
        )
        orbit = 3.0
    else:  # "cow": the FULL cow_and_lady-scale scrolling window
        # (VERDICT r4 #6: the durability drill at the same 400x400x80 =
        # 12.8 M-voxel window the headline bench runs, launch/
        # cow_and_lady.launch grid + ray gates)
        h, w = 144, 192
        base = FiestaConfig(
            resolution=0.05,
            origin=(-10.0, -10.0, -1.0),
            map_size=(20.0, 20.0, 4.0),     # 400 x 400 x 80 = 12.8 M vox
            min_ray_length=0.5,
            max_ray_length=5.0,
        )
        orbit = 6.0
    cfg = dataclasses.replace(
        replay.scale_intrinsics(base, h, w), max_points_per_scan=h * w)
    return cfg, h, w, orbit


def make_frames(cfg, h, w, orbit, n_frames, seed=11):
    from fiesta_tpu.io import replay

    # a long multi-orbit sweep: wide enough that seen content scrolls out
    # (archive eviction) and is revisited (restore), deterministic so
    # every leg regenerates the identical stream
    _, frames = replay.make_sequence(
        cfg, n_frames=n_frames, n_boxes=14, seed=seed, height=h, width=w,
        orbit_radius=orbit, period=max(4.0, n_frames / 30.0 / 4.0))
    return frames


def run_leg(args):
    import numpy as np

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from fiesta_tpu import debug
    from fiesta_tpu.archive import TileArchive
    from fiesta_tpu.scrolling import ScrollingFiestaPipeline

    cfg, h, w, orbit = build_cfg(args.scale)
    frames = make_frames(cfg, h, w, orbit, args.frames)

    if args.resume:
        from fiesta_tpu import checkpoint

        archive = TileArchive.from_file(args.archive)
        pipe = ScrollingFiestaPipeline(cfg, method="scanline", archive=None)
        pipe.archive = archive
        ck_cfg, state = checkpoint.load(args.resume)
        assert ck_cfg.grid_shape == cfg.grid_shape
        pipe.state = state
        anchor = checkpoint.load_anchor(args.resume)
        assert anchor is not None
        pipe.origin_vox = anchor
        start = args.start
        log(f"[{args.leg}] resumed at frame {start}, anchor {anchor}")
    else:
        pipe = ScrollingFiestaPipeline(
            cfg, method="scanline", archive=TileArchive())
        start = 0

    meta_path = args.ck + ".meta.json" if args.ck else None
    n_updates = 0
    checks = []
    t0 = time.perf_counter()
    for i in range(start, len(frames)):
        t, (pos, quat), scan = frames[i]
        pipe.observe_pose(t, pos, quat)
        pipe.observe_cloud(t, scan)
        if i + 1 < len(frames):
            pipe.observe_pose(frames[i + 1][0], *frames[i + 1][1])
        else:
            pipe.observe_pose(t + 1.0, pos, quat)
        pipe.process()
        stats = pipe.update()
        if stats is None:
            continue
        n_updates += 1
        if args.check_every and n_updates % args.check_every == 0:
            pipe.sync_device()
            # C20 structural invariants: pass the derived closest so
            # lazy mode still faces the FULL closest-vs-d2 checks
            debug.check_consistency(cfg, pipe.state,
                                    closest=pipe.closest_grid())
            gt = debug.check_with_ground_truth(cfg, pipe.state)
            checks.append(dict(
                frame=i, num_known=gt["num_known"],
                rms=gt["rms_error"], max_under=gt["max_under"]))
            assert gt["max_under"] == 0.0, gt
            log(f"[{args.leg}] frame {i}: C20 ok "
                f"(known={gt['num_known']}, rms={gt['rms_error']:.4f}, "
                f"scrolls={pipe.scroll_count})")
        if args.ck and n_updates % args.ck_every == 0:
            from fiesta_tpu import checkpoint

            pipe.sync_device()
            checkpoint.save(args.ck, cfg, pipe.state,
                            origin_vox=pipe.origin_vox)
            pipe.archive.save(args.archive)
            with open(meta_path + ".tmp", "w") as fh:
                json.dump({"frames_done": i + 1}, fh)
            os.replace(meta_path + ".tmp", meta_path)
    pipe.sync_device()
    wall = time.perf_counter() - t0

    # final C20 oracle
    debug.check_consistency(cfg, pipe.state, closest=pipe.closest_grid())
    gt = debug.check_with_ground_truth(cfg, pipe.state)

    final = {f: np.asarray(getattr(pipe.state, f))
             for f in ("logodds", "d2", "closest", "seen")}
    final["origin_vox"] = np.asarray(pipe.origin_vox)
    np.savez_compressed(args.out, **final)
    report = dict(
        leg=args.leg, frames=len(frames) - start, updates=n_updates,
        wall_s=round(wall, 2),
        ms_per_frame=round(1e3 * wall / max(len(frames) - start, 1), 2),
        scrolls=pipe.scroll_count, restores=pipe.restore_count,
        archive_tiles=pipe.archive.num_tiles,
        final_known=gt["num_known"], final_rms=gt["rms_error"],
        final_max_under=gt["max_under"], c20_checks=len(checks) + 1,
    )
    print(json.dumps(report), flush=True)
    return 0


def drill(args):
    import numpy as np

    d = args.workdir
    os.makedirs(d, exist_ok=True)
    base = [sys.executable, os.path.abspath(__file__),
            "--frames", str(args.frames), "--scale", args.scale,
            "--check-every", str(args.check_every),
            "--ck-every", str(args.ck_every)]
    if args.platform:
        base += ["--platform", args.platform]

    def leg(name, extra, kill_after=None):
        cmd = base + ["--leg", name, "--out", f"{d}/final_{name}.npz"] + extra
        log(f"=== leg {name}: {' '.join(cmd)}")
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
        if kill_after is not None:
            time.sleep(kill_after)
            p.send_signal(signal.SIGKILL)
            p.wait()
            log(f"=== leg {name}: SIGKILLed after {kill_after:.1f}s")
            return None
        out, _ = p.communicate()
        assert p.returncode == 0, f"leg {name} failed rc={p.returncode}"
        line = out.strip().splitlines()[-1]
        log(f"=== leg {name}: {line}")
        return json.loads(line)

    # 1) uninterrupted reference
    ref = leg("ref", ["--ck", f"{d}/ck_ref.npz",
                      "--archive", f"{d}/arch_ref.npz"])

    # 2) victim: same run, SIGKILLed mid-flight (after enough time for at
    #    least one checkpoint; scale with the reference's wall clock)
    kill_after = max(3.0, 0.45 * ref["wall_s"])
    for attempt in range(4):
        for f in (f"{d}/ck.npz", f"{d}/arch.npz", f"{d}/ck.npz.meta.json"):
            if os.path.exists(f):
                os.remove(f)
        leg("victim", ["--ck", f"{d}/ck.npz",
                       "--archive", f"{d}/arch.npz"],
            kill_after=kill_after)
        if os.path.exists(f"{d}/ck.npz.meta.json"):
            break
        kill_after *= 1.8     # too early: no checkpoint yet — retry later
    else:
        raise SystemExit("victim never reached a checkpoint")

    with open(f"{d}/ck.npz.meta.json") as fh:
        frames_done = json.load(fh)["frames_done"]
    log(f"=== victim checkpointed through frame {frames_done}")

    # 3) resume from the victim's last atomic checkpoint+archive pair
    res = leg("resume", ["--ck", f"{d}/ck2.npz",
                         "--archive", f"{d}/arch.npz",
                         "--resume", f"{d}/ck.npz",
                         "--start", str(frames_done)])

    # 4) bit-exact equality vs the uninterrupted run
    a = np.load(f"{d}/final_ref.npz")
    b = np.load(f"{d}/final_resume.npz")
    mismatches = [k for k in a.files if not np.array_equal(a[k], b[k])]
    ok = not mismatches
    summary = dict(
        metric="soak_crash_resume_drill",
        frames=args.frames, scale=args.scale,
        ref=ref, resumed=res, killed_after_s=round(kill_after, 1),
        resumed_from_frame=frames_done,
        bitexact_after_resume=ok, mismatched_fields=mismatches,
    )
    print(json.dumps(summary), flush=True)
    if not ok:
        return 1
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=1200)
    p.add_argument("--scale", choices=["small", "mid", "cow"],
                   default="mid")
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    p.add_argument("--check-every", type=int, default=150,
                   help="C20 oracle interval (updates)")
    p.add_argument("--ck-every", type=int, default=100,
                   help="checkpoint+archive save interval (updates)")
    p.add_argument("--workdir", default="/tmp/fiesta_soak")
    # internal leg interface
    p.add_argument("--leg", choices=["ref", "victim", "resume"])
    p.add_argument("--out")
    p.add_argument("--ck")
    p.add_argument("--archive")
    p.add_argument("--resume")
    p.add_argument("--start", type=int, default=0)
    args = p.parse_args()
    if args.leg:
        return run_leg(args)
    return drill(args)


if __name__ == "__main__":
    sys.exit(main())
