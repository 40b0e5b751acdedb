"""Multi-chip spatial sharding: image rows over a device mesh with halo exchange.

The reference is strictly single-GPU (SURVEY.md §2.4); the one meaningful multi-chip axis for
a screen-space denoiser is SPATIAL data parallelism: shard the image over rows (the H axis),
run every pass locally, and exchange halo rows over ICI for stencil reach. Collectives are
`lax.ppermute` ring shifts - nearest-neighbor only, so they ride ICI links and never DCN.

The stencil reach per frame is bounded: blur radii are clamped (<= 60 px at 1440p), the
a-trous ladder reaches 128 px, reprojection is a gather within the *local* shard plus halo.
`HALO` below must cover the largest per-pass reach; passes are composed so each one re-halos.

Design notes (TPU-first):
  - `shard_map` over Mesh(("sp",)) with PartitionSpec("sp") on H;
  - halo exchange = two ppermute shifts (up/down) - no all-gather, O(halo*W) bytes per link;
  - everything stays inside ONE jit: XLA overlaps the collectives with local compute.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "sp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def halo_exchange_rows(x, halo: int, axis_name: str = "sp"):
    """Pad a local (h_local, w, ...) block with `halo` rows from ring neighbors.

    Inside shard_map. Edge shards clamp (edge-replicate) like texture clamp addressing,
    matching single-chip semantics of ops.stencil.shifted(mode='edge').
    Returns (h_local + 2*halo, w, ...).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if n == 1:
        top = jnp.repeat(x[:1], halo, axis=0)
        bot = jnp.repeat(x[-1:], halo, axis=0)
        return jnp.concatenate([top, x, bot], axis=0)

    # send my bottom rows down (they become the next shard's top halo)
    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]
    from_above = jax.lax.ppermute(x[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:halo], axis_name, up)

    # clamp at the global image edges (scalar predicate broadcasts)
    edge_top = jnp.repeat(x[:1], halo, axis=0)
    edge_bot = jnp.repeat(x[-1:], halo, axis=0)
    top = jnp.where(idx == 0, edge_top, from_above)
    bot = jnp.where(idx == n - 1, edge_bot, from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def shard_rows(mesh: Mesh, x, axis: str = "sp"):
    """Place an (H, W, ...) array row-sharded on the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def row_sharded_stencil(fn, mesh: Mesh, halo: int, axis: str = "sp"):
    """Wrap `fn(padded_block) -> block` into a row-sharded whole-image function.

    `fn` receives a (h_local + 2*halo, w, ...) block and must return the central
    (h_local, w, ...) result. Use for any fixed-reach stencil pass.
    """
    spec = P(axis, None)

    def local(x):
        padded = halo_exchange_rows(x, halo, axis)
        return fn(padded)

    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec))


def replicated(mesh: Mesh, tree):
    """Replicate small constants over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
