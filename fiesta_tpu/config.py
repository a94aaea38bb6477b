"""Configuration for the TPU-native incremental ESDF engine.

The reference (FIESTA) splits configuration across compile-time ``#define``
variants (``include/parameters.h:9-14``) and runtime ROS params with defaults
(``src/parameters.cpp:6-96``).  Here everything is a single frozen dataclass:
compile-time variants become enum-ish fields that specialize jitted functions
(the dataclass is hashable, so it can be a static jit argument).

Connectivity stencils mirror the alternatives kept in the reference
(``include/parameters.h:20-129``); the active one there is the 24-neighbor
"faces 2 steps" set (``include/parameters.h:54-68``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np

# ---------------------------------------------------------------------------
# BFS / relaxation connectivity stencils (reference: include/parameters.h)
# ---------------------------------------------------------------------------

_FACES = [
    (-1, 0, 0), (1, 0, 0),
    (0, -1, 0), (0, 1, 0),
    (0, 0, -1), (0, 0, 1),
]

_EDGES = [
    (-1, -1, 0), (1, 1, 0),
    (0, -1, -1), (0, 1, 1),
    (-1, 0, -1), (1, 0, 1),
    (-1, 1, 0), (1, -1, 0),
    (0, -1, 1), (0, 1, -1),
    (1, 0, -1), (-1, 0, 1),
]

_CORNERS = [
    (-1, -1, -1), (1, 1, 1),
    (-1, -1, 1), (1, 1, -1),
    (-1, 1, -1), (1, -1, 1),
    (1, -1, -1), (-1, 1, 1),
]

_FACES2 = [
    (-2, 0, 0), (2, 0, 0),
    (0, -2, 0), (0, 2, 0),
    (0, 0, -2), (0, 0, 2),
]

# "faces 3 steps" knight-move shell (parameters.h:92-129): all (+-2, +-1)
# in-plane combinations plus the +-3 axis steps
_KNIGHTS = [
    (-2, -1, 0), (2, 1, 0),
    (0, -2, -1), (0, 2, 1),
    (-2, 0, -1), (2, 0, 1),
    (-2, 1, 0), (2, -1, 0),
    (0, -2, 1), (0, 2, -1),
    (2, 0, -1), (-2, 0, 1),
    (-1, -2, 0), (1, 2, 0),
    (0, -1, -2), (0, 1, 2),
    (-1, 0, -2), (1, 0, 2),
    (-1, 2, 0), (1, -2, 0),
    (0, -1, 2), (0, 1, -2),
    (1, 0, -2), (-1, 0, 2),
]

_FACES3 = [
    (-3, 0, 0), (3, 0, 0),
    (0, -3, 0), (0, 3, 0),
    (0, 0, -3), (0, 0, 3),
]

STENCILS = {
    6: _FACES,
    18: _FACES + _EDGES,
    26: _FACES + _EDGES + _CORNERS,
    24: _FACES + _EDGES + _FACES2,          # reference default
    32: _FACES + _EDGES + _FACES2 + _CORNERS,
    62: _FACES + _EDGES + _CORNERS + _FACES2 + _KNIGHTS + _FACES3,
}


def stencil_offsets(connectivity: int):
    """Return the stencil as a hashable tuple of (dx, dy, dz) offsets.

    Hashable so it can be a static jit argument; convert with np.asarray
    where an array is needed.
    """
    try:
        return tuple(STENCILS[connectivity])
    except KeyError:
        raise ValueError(
            f"connectivity must be one of {sorted(STENCILS)}, got {connectivity}"
        ) from None


def jump_offsets(max_jump: int):
    """Exponential long-range axis offsets: +-4, +-8, ... +-max_jump.

    TPU-native convergence accelerator (no reference analog): the BFS
    wavefront advances O(1) voxels per relaxation sweep, so an empty-to-full
    map rebuild needs O(grid diameter) sweeps.  Adding power-of-two axis
    jumps to the stencil preserves soundness (any candidate is a distance to
    a real occupied voxel, so the fixpoint can only move *toward* the exact
    EDT, never below it) while letting information travel the grid in
    O(log diameter) sweeps.
    """
    dirs = []
    j = 4
    while j <= max_jump:
        for axis in range(3):
            for s in (-j, j):
                d = [0, 0, 0]
                d[axis] = s
                dirs.append(tuple(d))
        j *= 2
    return tuple(dirs)


def logit(p: float) -> float:
    """log(p / (1-p)) — occupancy probability to log-odds (ESDFMap.cpp:12-14)."""
    return math.log(p / (1.0 - p))


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FiestaConfig:
    """All knobs of the engine.  Hashable => usable as a static jit argument.

    Defaults mirror the reference's runtime defaults
    (``src/parameters.cpp:6-96``) and the cow_and_lady launch overrides where
    noted (``launch/cow_and_lady.launch``).
    """

    # --- grid geometry (array backend; reference ESDFMap.cpp:171-213) ------
    resolution: float = 0.1
    origin: Tuple[float, float, float] = (-20.0, -20.0, -5.0)   # l_cornor_
    map_size: Tuple[float, float, float] = (40.0, 40.0, 10.0)

    # --- occupancy fusion (reference src/parameters.cpp:89-93) -------------
    p_hit: float = 0.70
    p_miss: float = 0.35
    p_min: float = 0.12
    p_max: float = 0.97
    p_occ: float = 0.80

    # --- raycasting (reference src/parameters.cpp:9-10) --------------------
    min_ray_length: float = 0.5
    max_ray_length: float = 5.0
    # hard cap from reference src/raycast.cpp:127-130 (1500); per-axis DDA
    # step bound is derived from max_ray_length at trace time instead.

    # --- depth camera (reference src/parameters.cpp:21-24) -----------------
    center_x: float = 322.477357419
    center_y: float = 237.076346481
    focal_x: float = 384.458089392
    focal_y: float = 383.982755697
    depth_scaling_factor: float = 1000.0     # Fiesta.h:328

    # --- depth consistency filter (reference src/parameters.cpp:38-42) -----
    use_depth_filter: bool = True
    depth_filter_tolerance: float = 0.1
    depth_filter_max_dist: float = 10.0
    depth_filter_min_dist: float = 0.1
    depth_filter_margin: int = 0

    # --- local vs global map (reference src/parameters.cpp:26-36) ----------
    global_update: bool = True
    global_vis: bool = True
    radius: Tuple[float, float, float] = (3.0, 3.0, 1.5)

    # --- update cadence (reference src/parameters.cpp:63) ------------------
    update_esdf_every_n_sec: float = 0.1
    visualize_every_n_updates: int = 1

    # --- visualization (reference src/parameters.cpp:13-19) ----------------
    slice_vis_max_dist: float = 2.0
    slice_vis_level: float = 5.0      # meters; voxel index derived from grid
    vis_lower_bound: float = -5.0
    vis_upper_bound: float = 10.0

    # --- algorithm variants (reference #defines, parameters.h:9-14) --------
    connectivity: int = 24            # BFS stencil (24 = reference default)
    probabilistic: bool = True        # PROBABILISTIC
    signed_needed: bool = False       # SIGNED_NEEDED: maintain inverse map

    # Maintain per-voxel closest-obstacle coordinates in rebuild mode
    # (reference closest_obstacle_, ESDFMap.h:92-96 — always on there).
    # The argmin rides the packed min-plus EDT passes at near-zero extra
    # cost (ops/pallas/edt.closest_plan documents the int32 bit budget);
    # grids/truncations past that budget fall back to the exact two-word
    # engine (edt.closest_plan_wide) — slower, never stale.  validate()
    # raises if even the wide form cannot fit (astronomical grids only);
    # pipeline.rebuild_tracks_closest reports the active engine.
    track_closest: bool = True

    # Closest maintenance CADENCE in rebuild mode (track_closest on):
    #   "lazy" (default): the tick computes d2 only; the closest grid is
    #          derived on first query after a tick and cached on the
    #          tick's d2 (pipeline.FiestaPipeline.closest_grid).  The
    #          query surface matches the reference's always-current
    #          closest_obstacle_ (ESDFMap.h:92-96) — for a rebuild-mode
    #          map closest is a pure function of the occupancy, so
    #          deriving at read time is semantics-identical to deriving
    #          at write time — while the tick drops the ~1.1 ms/batch
    #          packed-argmin payload cost (PERF.md round 5).
    #   "eager": every tick maintains state.closest (the reference's
    #          write cadence; pays the argmin passes per tick).  Queue
    #          ("incremental") mode is always eager — its delete pass
    #          consumes closest, so laziness cannot apply.
    closest_mode: str = "lazy"

    # --- TPU-native knobs (no reference analog) ----------------------------
    # Exponential long-range relaxation offsets (0 = off, parity mode).
    # See jump_offsets(): preserves correctness, converges in O(log) sweeps.
    accel_jumps: int = 64
    # ESDF maintenance strategy:
    #   "rebuild":     fixed-cost exact truncated EDT every update (Pallas
    #                  kernel; hard real-time, exact within trunc_dist).
    #   "incremental": queue-semantics masked relaxation (reference parity,
    #                  unbounded distances).  VALIDATION ORACLE, not a
    #                  production option: bit-exact vs the reference's
    #                  queue fixpoint for tests, but ~4 s/batch on fresh
    #                  streams at cow_and_lady scale (40x the 100 ms
    #                  budget) — deploy with "rebuild".
    esdf_mode: str = "rebuild"
    # Truncation radius (meters) for rebuild mode; distances beyond read as
    # infinity.  Planners consume distances well below sensor range.
    trunc_dist: float = 5.0
    # Exact-EDT radius (meters) in rebuild mode; between edt_fine_dist and
    # trunc_dist a half-resolution far field is used (error <= 1 coarse
    # voxel = 2*resolution).  >= trunc_dist (the default) disables the
    # hierarchy: distances are EXACT everywhere within trunc_dist — a
    # strictly stronger contract than the reference's near-optimal BFS —
    # and the single-device tick matches the sharded tick's single-level
    # EDT semantics exactly.  Measured trade at cow_and_lady scale
    # (bench_accuracy.py / PERF.md): the 2.0 m hierarchy saves ~1.7 ms of
    # a ~15 ms tick but leaves +-2-voxel far-field quantization and a thin
    # unreachable blur at the truncation boundary; set edt_fine_dist=2.0
    # to buy the speed back where that error band is acceptable.
    edt_fine_dist: float = 5.0
    # Rays are padded to this many points per scan (static shapes under jit).
    max_points_per_scan: int = 65536
    # Max DDA steps per ray; 0 => derive from max_ray_length / resolution.
    max_ray_steps: int = 0
    # "infinity" sentinel distance in meters (reference ESDFMap.cpp:181: 10000)
    infinity_distance: float = 10000.0

    # ------------------------------------------------------------------
    # Derived helpers (plain Python; all static given the frozen config)
    # ------------------------------------------------------------------

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        """Voxel counts per axis: ceil(map_size / resolution) (ESDFMap.cpp:176)."""
        return tuple(
            int(math.ceil(s / self.resolution)) for s in self.map_size
        )

    @property
    def num_voxels(self) -> int:
        x, y, z = self.grid_shape
        return x * y * z

    @property
    def lazy_closest(self) -> bool:
        """Whether the production tick defers closest maintenance to the
        query surface (closest_mode above).  Only the rebuild engine can
        defer: queue mode's delete pass consumes closest in-tick."""
        return (self.closest_mode == "lazy" and self.esdf_mode == "rebuild"
                and self.track_closest)

    @property
    def prob_hit_log(self) -> float:
        return logit(self.p_hit)

    @property
    def prob_miss_log(self) -> float:
        return logit(self.p_miss)

    @property
    def clamp_min_log(self) -> float:
        return logit(self.p_min)

    @property
    def clamp_max_log(self) -> float:
        return logit(self.p_max)

    @property
    def min_occupancy_log(self) -> float:
        return logit(self.p_occ)

    @property
    def ray_steps(self) -> int:
        """Static DDA step bound: enough to traverse max_ray_length diagonally."""
        if self.max_ray_steps:
            return self.max_ray_steps
        # a DDA crossing of a segment of length L makes at most
        # sum_axis ceil(L_axis/res) + 3 steps; bound by 3 * L/res + 4.
        return 3 * int(math.ceil(self.max_ray_length / self.resolution)) + 4

    @property
    def stencil(self):
        return stencil_offsets(self.connectivity)

    @property
    def relax_dirs(self):
        """Production relaxation stencil: connectivity stencil + accel jumps
        (trimmed to offsets that fit inside the grid)."""
        dirs = list(self.stencil)
        if self.accel_jumps:
            shape = self.grid_shape
            for d in jump_offsets(self.accel_jumps):
                if all(abs(d[i]) < shape[i] for i in range(3)):
                    dirs.append(d)
        return tuple(dirs)

    def validate(self) -> "FiestaConfig":
        gx, gy, gz = self.grid_shape
        if max(gx, gy, gz) >= 1 << 15:
            raise ValueError("grid axis too large for int16 closest-obstacle coords")
        if not (0 < self.p_min < self.p_miss < 0.5 < self.p_hit < self.p_max < 1):
            raise ValueError("occupancy probabilities must satisfy "
                             "0 < p_min < p_miss < 0.5 < p_hit < p_max < 1")
        if not (0 < self.p_occ < self.p_max):
            raise ValueError(
                f"p_occ={self.p_occ} must lie in (0, p_max={self.p_max}): "
                "fusion clamps log-odds at logit(p_max), so an occupancy "
                "threshold at or above it means NO voxel can ever read "
                "occupied — the engine would silently map nothing")
        if self.esdf_mode not in ("rebuild", "incremental"):
            raise ValueError(
                f"unknown esdf_mode {self.esdf_mode!r} "
                "(expected 'rebuild' or 'incremental')")
        if self.closest_mode not in ("lazy", "eager"):
            raise ValueError(
                f"unknown closest_mode {self.closest_mode!r} "
                "(expected 'lazy' or 'eager')")
        if self.track_closest and self.esdf_mode == "rebuild":
            # the reference maintains closest_obstacle_ unconditionally
            # (ESDFMap.h:92-96); refuse configs where no engine can, loudly,
            # instead of leaving state.closest silently stale
            from .ops.pallas.edt import closest_capability, trunc_vox_for

            t_total = trunc_vox_for(self.resolution, self.trunc_dist)
            t_fine = trunc_vox_for(self.resolution, self.edt_fine_dist)
            gshape = self.grid_shape
            levels = [(gshape, t_total)]
            if t_fine < t_total and all(g % 2 == 0 for g in gshape):
                levels = [(gshape, t_fine),
                          (tuple(g // 2 for g in gshape), -(-t_total // 2))]
            for shape, t in levels:
                cap = closest_capability(shape, t)
                if not (cap["packed"] or cap["wide"]):
                    raise ValueError(
                        "closest-obstacle tracking cannot run on this "
                        f"config ({cap['detail']}); set track_closest="
                        "False explicitly to opt out of the reference's "
                        "always-maintained closest_obstacle_")
        if self.max_ray_length + self.resolution >= 1000.0:
            raise ValueError(
                "max_ray_length must stay below ~1000 m: the carve seed "
                "packing encodes class*1000 + range "
                "(ops/raycast._scanline_seeds)")
        return self


# Preset matching launch/cow_and_lady.launch (grid 400x400x80 = 12.8M voxels).
COW_AND_LADY = FiestaConfig(
    resolution=0.05,
    origin=(-10.0, -10.0, -1.0),
    map_size=(20.0, 20.0, 4.0),
    visualize_every_n_updates=10,
    slice_vis_level=1.6,
    vis_lower_bound=0.0,
    vis_upper_bound=10.0,
)

# Dataset extrinsics the reference hardcodes for cow_and_lady
# (src/parameters.cpp:67-75): T_D_B maps the depth-camera frame into the
# vicon body frame; T_B_C is identity.  Applied to RECORDED pose streams
# (synthetic replay renders from the sensor pose directly).
COW_AND_LADY_T_D_B = (
    (0.971048, -0.120915, 0.206023, 0.00114049),
    (0.15701, 0.973037, -0.168959, 0.0450936),
    (-0.180038, 0.196415, 0.96385, 0.0430765),
    (0.0, 0.0, 0.0, 1.0),
)

# Preset matching launch/demo.launch (local-map mode, depth-image input).
DEMO_ONBOARD = FiestaConfig(
    resolution=0.1,
    origin=(-20.0, -20.0, -1.6),
    map_size=(40.0, 40.0, 3.6),
    global_update=False,
    global_vis=False,
    visualize_every_n_updates=10,
    slice_vis_level=1.6,
)
