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


def save(path: str, cfg: FiestaConfig, state: MapState,
         origin_vox=None) -> None:
    """Write state + config as ONE file, atomic via rename (the config is
    embedded in the npz so a crash can never pair new arrays with a stale
    config).  A human-readable JSON sidecar is also written, best-effort.

    ``origin_vox``: world anchor of a scrolling grid (scrolling.py) in
    voxels; stored so a resumed window lands at the right world position
    (required to combine --resume with the persistent archive, whose
    tiles are world-absolute)."""
    tmp = path + ".tmp"
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    if origin_vox is not None:
        arrays["__origin_vox__"] = np.asarray(origin_vox, np.int64)
    cfg_json = json.dumps(dataclasses.asdict(cfg))
    np.savez_compressed(tmp, __config__=np.asarray(cfg_json), **arrays)
    os.replace(tmp + ".npz", path)  # savez appends ".npz" to tmp

    tmp_json = path + ".json.tmp"
    with open(tmp_json, "w") as fh:
        json.dump(dataclasses.asdict(cfg), fh, indent=1)
    os.replace(tmp_json, path + ".json")


def load(path: str) -> Tuple[FiestaConfig, MapState]:
    """Load a checkpoint written by ``save``."""
    with np.load(path) as data:
        if "__config__" in data:
            raw = json.loads(str(data["__config__"]))
        else:  # older checkpoints: sidecar only
            with open(path + ".json") as fh:
                raw = json.load(fh)
        state = MapState(**{f: jnp.asarray(data[f]) for f in _FIELDS})
        if state.seen.dtype != jnp.uint8:   # pre-u8-migration checkpoints
            state = dataclasses.replace(
                state, seen=state.seen.astype(jnp.uint8))
    for k in ("origin", "map_size", "radius"):
        raw[k] = tuple(raw[k])
    cfg = FiestaConfig(**raw)
    expect = cfg.grid_shape
    if tuple(state.logodds.shape) != expect:
        raise ValueError(
            f"checkpoint grid {state.logodds.shape} != config grid {expect}"
        )
    return cfg, state


def load_anchor(path: str):
    """World anchor (``origin_vox`` int64[3]) stored with a scrolling-grid
    checkpoint, or None for fixed-grid / older checkpoints."""
    with np.load(path) as data:
        if "__origin_vox__" in data:
            return np.asarray(data["__origin_vox__"], np.int64)
    return None
