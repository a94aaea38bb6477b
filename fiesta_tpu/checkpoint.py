"""Map state checkpoint/resume.

The reference has none (SURVEY.md section 5: map state is in-memory only and
lost on exit).  Here the whole HBM voxel state is a small pytree, so
snapshotting is cheap: a compressed npz plus a JSON config sidecar.  Layout
is stable across versions via explicit field names.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .config import FiestaConfig
from .grid import MapState

_FIELDS = ("logodds", "d2", "closest", "seen", "hit_cnt", "miss_cnt")


def save(path: str, cfg: FiestaConfig, state: MapState) -> None:
    """Write state + config; atomic via rename."""
    tmp = path + ".tmp"
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    with open(path + ".json", "w") as fh:
        json.dump(dataclasses.asdict(cfg), fh, indent=1)


def load(path: str) -> Tuple[FiestaConfig, MapState]:
    """Load a checkpoint written by ``save``."""
    with open(path + ".json") as fh:
        raw = json.load(fh)
    for k in ("origin", "map_size", "radius"):
        raw[k] = tuple(raw[k])
    cfg = FiestaConfig(**raw)
    data = np.load(path)
    state = MapState(**{f: jnp.asarray(data[f]) for f in _FIELDS})
    expect = cfg.grid_shape
    if tuple(state.logodds.shape) != expect:
        raise ValueError(
            f"checkpoint grid {state.logodds.shape} != config grid {expect}"
        )
    return cfg, state
