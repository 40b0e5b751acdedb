"""GSPMD multi-chip execution: row-shard the frame over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.4) - spatial data parallelism over
image rows is the denoiser-native multi-chip axis this framework adds. Two tiers:

  1. **GSPMD (this module, the default)**: place every (H, W[, C]) plane with
     `NamedSharding(mesh, P("sp", None))` and jit the *unchanged* frame function. XLA's
     SPMD partitioner propagates the sharding through the whole pass graph and inserts
     the halo collectives (collective-permute for pad/shift stencils, all-gathers where
     a pass genuinely needs cross-shard reach, e.g. reprojection gathers). Nearest-
     neighbor exchanges ride ICI. This is the idiomatic JAX path: no manual halo code,
     one jit, works for every denoiser family.
  2. **shard_map + explicit ppermute** (`sharding.py`): manual halo exchange for code
     XLA cannot partition (Pallas kernels). Used by kernels that opt in explicitly.

Divisibility: shards are H/n rows; XLA pads uneven shards internally, so any H works,
but H % (8*n) == 0 keeps shard boundaries tile-aligned (no repack traffic).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import make_mesh  # re-export for callers  # noqa: F401


def row_sharding(mesh: Mesh, ndim: int, axis: str = "sp") -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_frame_tree(mesh: Mesh, tree: Any, height: int, width: Optional[int] = None,
                     axis: str = "sp") -> Any:
    """device_put a pytree with image planes row-sharded, everything else replicated.

    An "image plane" is any array whose leading two dims equal the frame (H, W) - full
    res or the 1/16-res tile hierarchy; scalars, camera matrices and other small
    constants are replicated. Planes whose H is not divisible by the mesh are
    replicated rather than rejected (XLA still partitions the ops feeding from the
    sharded planes).
    """
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    tile_h = -(-height // 16)
    heights = {height, tile_h}
    widths = None
    if width is not None:
        widths = {width, -(-width // 16)}

    def place(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "ndim") else leaf
        is_img = (getattr(arr, "ndim", 0) >= 2 and arr.shape[0] in heights
                  and (widths is None or arr.shape[1] in widths)
                  and arr.shape[1] >= 16)
        if is_img and arr.shape[0] % n == 0:
            return jax.device_put(leaf, row_sharding(mesh, arr.ndim, axis))
        return jax.device_put(leaf, replicated_sharding(mesh))

    return jax.tree.map(place, tree)
