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


def configure_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (first full-pipeline
    compile is 30-60 s on TPU; cached reruns start in seconds).  One
    definition shared by run.py and every bench/profile script so they all
    hit the same cache directory.  Override with $FIESTA_COMPILE_CACHE."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("FIESTA_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/jax_tpu")))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def __getattr__(name):
    # lazy engine-class exports: importing them eagerly would pull jax
    # device init into `import fiesta_tpu` (PERF.md measurement note 4)
    if name == "FiestaPipeline":
        from .pipeline import FiestaPipeline
        return FiestaPipeline
    if name == "ScrollingFiestaPipeline":
        from .scrolling import ScrollingFiestaPipeline
        return ScrollingFiestaPipeline
    if name == "ShardedFiestaPipeline":
        from .parallel.engine import ShardedFiestaPipeline
        return ShardedFiestaPipeline
    if name == "TileArchive":
        from .archive import TileArchive
        return TileArchive
    raise AttributeError(f"module 'fiesta_tpu' has no attribute {name!r}")


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
    "FiestaPipeline",
    "ScrollingFiestaPipeline",
    "ShardedFiestaPipeline",
    "TileArchive",
]
