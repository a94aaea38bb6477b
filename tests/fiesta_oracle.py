"""Clean-room NumPy oracle of the reference's incremental ESDF algorithm.

Written from the behavioral spec in SURVEY.md (component C6 —
src/ESDFMap.cpp:273-398): dual insert/delete FIFO queues feed one BFS
update queue; every voxel tracks its closest obstacle; deleting an obstacle
re-seeds exactly the voxels that referenced it.  Used to check that the
dense TPU relaxation reaches the same kind of fixpoint the reference's
queue order does.  Small grids only (pure Python loops).
"""

from __future__ import annotations

from collections import deque

import numpy as np


class QueueESDF:
    """Queue-based incremental ESDF on a dense grid (reference semantics)."""

    def __init__(self, shape, dirs, window=None):
        self.shape = tuple(shape)
        self.dirs = [tuple(d) for d in np.asarray(dirs)]
        self.occ = np.zeros(self.shape, bool)
        self.d2 = np.full(self.shape, np.iinfo(np.int64).max // 4, np.int64)
        self.closest = np.full(self.shape + (3,), -1, np.int32)
        self.INF = np.iinfo(np.int64).max // 4
        # optional local-update window (min_vec, max_vec) inclusive: the
        # reference's VoxInRange gate (SetUpdateRange, component C17)
        self.window = None
        if window is not None:
            self.window = (tuple(int(x) for x in window[0]),
                           tuple(int(x) for x in window[1]))

    def _in_grid(self, v):
        return all(0 <= v[i] < self.shape[i] for i in range(3))

    def _in_range(self, v):
        """VoxInRange (ESDFMap.cpp:63-72): grid bound, or the update
        window when one is set."""
        if self.window is None:
            return self._in_grid(v)
        lo, hi = self.window
        return (self._in_grid(v)
                and all(lo[i] <= v[i] <= hi[i] for i in range(3)))

    @staticmethod
    def _dist2(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2

    def set_occupancy(self, changes):
        """Apply a batch of (voxel, occ) changes and update the ESDF.

        Mirrors UpdateOccupancy flip detection + UpdateESDF drain.
        """
        insert_q = deque()
        delete_q = deque()
        for vox, occ in changes:
            vox = tuple(int(x) for x in vox)
            occ = bool(occ)
            if occ and not self.occ[vox]:
                self.occ[vox] = True
                insert_q.append(vox)
            elif not occ and self.occ[vox]:
                self.occ[vox] = False
                delete_q.append(vox)
        self._update_esdf(insert_q, delete_q)

    def _update_esdf(self, insert_q, delete_q):
        update_q = deque()

        # Insert drain (ESDFMap.cpp:278-291).
        while insert_q:
            v = insert_q.popleft()
            if self.occ[v]:
                self.closest[v] = v
                self.d2[v] = 0
                update_q.append((v, 0))

        # Delete drain (ESDFMap.cpp:292-337): enumerate the bucket of each
        # deleted obstacle (voxels whose closest == it), reset, substitute
        # from the first in-range neighbor with a live closest obstacle.
        if delete_q:
            deleted = set()
            while delete_q:
                v = delete_q.popleft()
                if not self.occ[v]:
                    deleted.add(v)
            it = np.nditer(self.occ, flags=["multi_index"])
            bucket = []
            for _ in it:
                v = it.multi_index
                c = tuple(self.closest[v])
                if c != (-1, -1, -1) and c in deleted:
                    bucket.append(v)
            for v in bucket:
                self.closest[v] = (-1, -1, -1)
                best = self.INF
                bestc = None
                for d in self.dirs:
                    w = (v[0] + d[0], v[1] + d[1], v[2] + d[2])
                    if not self._in_range(w):
                        continue
                    c = tuple(self.closest[w])
                    if c == (-1, -1, -1) or not self.occ[c]:
                        continue
                    t = self._dist2(v, c)
                    if t < best:
                        best = t
                        bestc = c
                    # reference takes the first valid neighbor then breaks
                    # (ESDFMap.cpp:308-321); taking the min is a superset
                    # seed with the same fixpoint.
                self.d2[v] = best
                if bestc is not None:
                    self.closest[v] = bestc
                    update_q.append((v, best))

        # BFS drain (ESDFMap.cpp:339-392): patch A pulls a better obstacle
        # from neighbors; patch B pushes own obstacle to neighbors.
        while update_q:
            v, dist = update_q.popleft()
            if self.d2[v] != dist:  # stale entry (ESDFMap.cpp:345)
                continue
            changed = False
            for d in self.dirs:
                w = (v[0] + d[0], v[1] + d[1], v[2] + d[2])
                if not self._in_range(w):
                    continue
                c = tuple(self.closest[w])
                if c == (-1, -1, -1):
                    continue
                t = self._dist2(v, c)
                if t < self.d2[v]:
                    self.d2[v] = t
                    self.closest[v] = c
                    changed = True
            if changed:
                update_q.append((v, int(self.d2[v])))
                continue
            c = tuple(self.closest[v])
            for d in self.dirs:
                w = (v[0] + d[0], v[1] + d[1], v[2] + d[2])
                if not self._in_range(w):
                    continue
                t = self._dist2(w, c)
                if t < self.d2[w]:
                    self.d2[w] = t
                    self.closest[w] = c
                    update_q.append((w, t))


def exact_edt_d2(occ: np.ndarray) -> np.ndarray:
    """Exact squared EDT via scipy (the reference's kd-tree oracle analog)."""
    from scipy import ndimage

    if not occ.any():
        return np.full(occ.shape, np.iinfo(np.int32).max // 4, np.int64)
    dist = ndimage.distance_transform_edt(~occ)
    return np.round(dist**2).astype(np.int64)
