"""OUT_VALIDATION debug overlay - rebuild of REBLUR_Validation.cs.hlsl / RELAX_Validation.

A 4x4 grid of diagnostic viewports (README.md:281-314): world-space normals, linear
roughness, viewZ, motion vectors, world grid with jitter trace, accumulated frame counts,
and virtual-history amount. Rendered into an RGBA image (.w = overlay opacity).

The reference draws these with per-pixel branching over the grid cell; here each cell is a
dense image expression selected by the cell mask.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import frontend as fe
from .. import math as nm
from ..ops import resample


def render_validation(sc, view_z_in, normal_roughness, mv_in, config,
                      diff_accum=None, spec_accum=None, virtual_history_amount=None,
                      max_accumulated_frame_num=63.0):
    """Returns (h, w, 4) validation overlay."""
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]
    h, w = view_z.shape
    uv = resample.pixel_uv_grid(h, w)
    n, roughness, material_id = fe.unpack_normal_roughness(
        normal_roughness, config.normal_encoding, config.roughness_encoding)

    cell_x = jnp.floor(uv[..., 0] * 4.0).astype(jnp.int32)
    cell_y = jnp.floor(uv[..., 1] * 4.0).astype(jnp.int32)
    cell = cell_y * 4 + cell_x
    in_range = (view_z < sc["denoising_range"]).astype(jnp.float32)

    # cell 0: world normals
    normals_vis = n * 0.5 + 0.5
    # cell 1: linear roughness
    rough_vis = jnp.repeat(roughness[..., None], 3, -1)
    # cell 2: viewZ heat (log scale)
    z_vis = nm.saturate(jnp.log2(1.0 + view_z) / 20.0)
    z_rgb = jnp.stack([z_vis, 1.0 - z_vis, jnp.zeros_like(z_vis)], -1)
    # cell 3: motion vectors
    mv = mv_in[..., :2] * sc["mv_scale"][None, None, :2]
    mv_vis = jnp.concatenate([nm.saturate(jnp.abs(mv) * 32.0),
                              jnp.zeros_like(mv[..., :1])], -1)
    # cell 4: world grid (camera-relative world positions mod 1)
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    x_world = xv @ jnp.asarray(sc["view_to_world"])[:3, :3].T
    grid = jnp.abs(jnp.mod(x_world, 1.0))
    grid_vis = (grid < 0.05).astype(jnp.float32)
    # cell 5/6: accumulated frames (diffuse / specular)
    def accum_vis(a):
        if a is None:
            return jnp.zeros((h, w, 3), jnp.float32)
        t = nm.saturate(a / max_accumulated_frame_num)
        return jnp.stack([1.0 - t, t, jnp.zeros_like(t)], -1)

    diff_vis = accum_vis(diff_accum)
    spec_vis = accum_vis(spec_accum)
    # cell 7: virtual history amount
    vha = virtual_history_amount if virtual_history_amount is not None \
        else jnp.zeros_like(view_z)
    vha_vis = jnp.repeat(vha[..., None], 3, -1)
    # cell 8: material ID
    mat_vis = jnp.stack([jnp.mod(material_id * 0.33, 1.0),
                         jnp.mod(material_id * 0.59, 1.0),
                         jnp.mod(material_id * 0.83, 1.0)], -1)

    cells = [normals_vis, rough_vis, z_rgb, mv_vis, grid_vis, diff_vis, spec_vis,
             vha_vis, mat_vis]
    out = jnp.zeros((h, w, 3), jnp.float32)
    for idx, img in enumerate(cells):
        out = jnp.where((cell == idx)[..., None], img, out)
    alpha = jnp.where(cell < len(cells), 0.75, 0.0) * in_range
    return jnp.concatenate([out, alpha[..., None]], -1)
