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


def shard_stencil(mesh: Mesh, fn, halo_rows: int, arrays, h: int, axis: str = "sp"):
    """Run a Pallas stencil stage row-sharded over the mesh: THE production multi-chip
    path for the halo-window kernels (kernels/harness2.stencil_call2).

    arrays: a pytree whose (h, w[, c]) leaves are the stage's image planes (anything
      else - scalars, (N,) constants - is replicated). Each image leaf is halo-padded
      with `halo_rows` real rows from ring neighbors (lax.ppermute over ICI;
      edge-replicated at the global image top/bottom, matching clamp addressing).
    fn(local_arrays, origin_offset) -> list/tuple of (h_local + 2*halo, w) outputs:
      the stage body, called per shard on the padded planes. It must pass
      `origin_offset` through to stencil_call2 so in-kernel pixel coordinates
      (uv reconstruction, in-screen tests) stay GLOBAL - taps beyond the true image
      edge then die on the same in-screen weights as the unsharded kernel, and taps
      crossing shard boundaries read exchanged rows.

    Returns the outputs re-assembled as (h, w) row-sharded arrays. Requires
    h % n_devices == 0 and h // n_devices >= halo_rows.
    """
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    h_local = h // n
    assert h % n == 0, (h, n)
    assert h_local >= halo_rows, (h_local, halo_rows)

    leaves, treedef = jax.tree_util.tree_flatten(arrays)
    is_img = [getattr(x, "ndim", 0) >= 2 and x.shape[0] == h for x in leaves]
    in_specs = tuple(P(axis, *([None] * (x.ndim - 1))) if img else P()
                     for x, img in zip(leaves, is_img))

    def local(*local_leaves):
        row0 = jax.lax.axis_index(axis) * h_local
        padded = [halo_exchange_rows(x, halo_rows, axis) if img else x
                  for x, img in zip(local_leaves, is_img)]
        tree = jax.tree_util.tree_unflatten(treedef, padded)
        outs = fn(tree, jnp.stack([row0 - halo_rows, jnp.int32(0)]))
        return tuple(o[halo_rows:halo_rows + h_local] for o in outs)

    shd = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                        out_specs=P(axis, None), check_vma=False)
    return shd(*leaves)
