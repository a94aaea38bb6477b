#!/bin/bash
# One-shot round-3 measurement batch for a healthy-tunnel window.
set -x
cd /root/repo
timeout 580 python profile_stages.py 2>&1 | grep -vE "WARNING|W08|E08" | tail -30
FIESTA_BOX_APPLY=rmw timeout 560 python bench.py 2>bench_rmw.err | tail -1
tail -3 bench_rmw.err
FIESTA_BOX_APPLY=padded timeout 560 python bench.py 2>bench_padded.err | tail -1
tail -3 bench_padded.err
