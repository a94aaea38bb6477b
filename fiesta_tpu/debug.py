"""Debug validators (reference component C20, behind #ifdef DEBUG).

The reference ships two oracles inside the library:

  * CheckConsistency (src/ESDFMap.cpp:856-902): structural invariants of the
    doubly-linked-list bookkeeping.  The dense design has no linked lists;
    the equivalent invariants are (SURVEY.md section 7):
      - every defined ``closest`` points at an occupied voxel;
      - ``d2`` equals |v - closest|^2 exactly;
      - occupied voxels are their own closest obstacle with d2 == 0.
  * CheckWithGroundTruth (src/ESDFMap.cpp:905-1054): exact nearest-neighbor
    distances (kd-tree there, exact EDT here) with a signed-error histogram
    in 0.1-wide buckets.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .config import FiestaConfig
from .grid import INF_D2, MapState, occupied_grid


def check_consistency(cfg: FiestaConfig, state: MapState) -> bool:
    """Structural invariant check; raises AssertionError with detail on
    failure, returns True otherwise.  Only meaningful in incremental mode
    (rebuild mode does not maintain ``closest``)."""
    d2 = np.asarray(state.d2)
    closest = np.asarray(state.closest)
    occ = np.asarray(occupied_grid(cfg, state.logodds))

    defined = closest[0] >= 0
    if not np.all((d2 < int(INF_D2)) == defined):
        raise AssertionError("d2 finiteness disagrees with closest definedness")
    if defined.any():
        cx, cy, cz = (c[defined] for c in closest)
        if not occ[cx, cy, cz].all():
            raise AssertionError("closest obstacle not occupied")
        vx, vy, vz = np.nonzero(defined)
        want = (vx - cx) ** 2 + (vy - cy) ** 2 + (vz - cz) ** 2
        if not np.array_equal(d2[defined], want):
            raise AssertionError("d2 != |v - closest|^2")
    if occ.any() and not np.all(d2[occ] == 0):
        raise AssertionError("occupied voxel with nonzero distance")
    return True


def check_with_ground_truth(
    cfg: FiestaConfig, state: MapState, n_buckets: int = 32
) -> Dict[str, object]:
    """Signed-error statistics vs exact nearest-neighbor distances.

    Mirrors the reference's report (ESDFMap.cpp:940-978): counts of
    over/under-estimates beyond 1e-3, mean/RMS signed error, max error, and
    a histogram of overestimates in 0.1 m buckets.
    """
    from scipy import ndimage

    occ = np.asarray(occupied_grid(cfg, state.logodds))
    d2 = np.asarray(state.d2)
    seen = np.asarray(state.seen)
    known = seen & (d2 < int(INF_D2))

    out: Dict[str, object] = {"num_known": int(known.sum())}
    if not occ.any() or not known.any():
        out.update(count_over=0, count_under=0, mean_error=0.0,
                   rms_error=0.0, max_abs_error=0.0, max_over=0.0,
                   max_under=0.0, histogram=[0] * n_buckets)
        return out

    truth = ndimage.distance_transform_edt(~occ) * cfg.resolution
    ours = np.sqrt(d2[known].astype(np.float64)) * cfg.resolution
    err = ours - truth[known]

    over = err > 1e-3
    under = err < -1e-3
    hist = np.bincount(
        np.minimum((err[over] / 0.1).astype(np.int64), n_buckets - 1),
        minlength=n_buckets,
    ).tolist()
    out.update(
        count_over=int(over.sum()),
        count_under=int(under.sum()),
        mean_error=float(err.mean()),
        rms_error=float(np.sqrt((err**2).mean())),
        # worst error per direction, unambiguously named: max_over = the
        # reference's overestimate statistic (ESDFMap.cpp:940-978, its
        # "max error"); max_under = the UNSAFE direction (a distance field
        # reporting less clearance than reality), which a signed max()
        # would hide; max_abs_error = the larger of the two
        max_abs_error=float(np.abs(err).max()),
        max_over=float(err[over].max()) if over.any() else 0.0,
        max_under=float(-err[under].min()) if under.any() else 0.0,
        histogram=hist,
    )
    return out
