"""fiesta_tpu — TPU-native incremental ESDF + trajectory optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HKUST-Aerial-Robotics/FIESTA (IROS 2019): streaming occupancy fusion,
free-space carving, incremental Euclidean signed distance fields, planner
distance/gradient queries, and an ESDF-gradient MPC layer — built for TPU
meshes rather than a single CPU ROS node.
"""

from .config import COW_AND_LADY, DEMO_ONBOARD, FiestaConfig, stencil_offsets
from .grid import (
    INF_D2,
    MapState,
    UNDEFINED_COORD,
    full_window,
    local_window,
    make_state,
    pos_to_vox,
    vox_to_idx,
    vox_to_pos,
)

__version__ = "0.1.0"

__all__ = [
    "FiestaConfig",
    "COW_AND_LADY",
    "DEMO_ONBOARD",
    "stencil_offsets",
    "MapState",
    "make_state",
    "full_window",
    "local_window",
    "pos_to_vox",
    "vox_to_pos",
    "vox_to_idx",
    "INF_D2",
    "UNDEFINED_COORD",
]
