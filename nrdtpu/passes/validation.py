"""OUT_VALIDATION debug overlay - rebuild of REBLUR_Validation.cs.hlsl / RELAX_Validation.

The reference renders a 4x4 grid of viewports (README.md:281-314), each showing the WHOLE
frame scaled to quarter size (`viewportUv = frac(pixelUv / 0.25)` sampled nearest,
REBLUR_Validation.cs.hlsl:43-53):

  0  normals | 1 roughness | 2 viewZ (+green/-blue/inf red) | 3 MV-vs-expected difference
  4  world-units grid + camera-jitter trail + rotator trail | 7 virtual history amount
  8  diffuse accum frames (Zucconi colorized, checker = reset) | 11 specular accum frames
  12 diffuse normalized hitT (AO) | 15 specular normalized hitT (SO); others pass through.

TPU-native mapping: VIEWPORT_SIZE is exactly 1/4, so the nearest resample is a static
4x decimation (one strided slice - no gathers), each cell is computed at quarter res and
the grid is assembled with concatenates. The jitter/rotator trails persist across frames
in the reference because unused pixels keep the previous OUT_VALIDATION content
(`result = gOut_Validation[pixelPos]`, :76); here the previous overlay rides the state
pytree (`prev_validation`). Divergence (documented): the pixel-font text labels
(Text::Print_ch) are not rendered.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp
import numpy as np

from .. import frontend as fe
from .. import math as nm


def _zucconi6(x):
    """Spectral colorization (Alan Zucconi's 6-constant fit; MathLib ColorizeZucconi)."""
    x = jnp.clip(x, 0.0, 1.0)[..., None]
    c1 = jnp.asarray([3.54585104, 2.93225262, 2.41593945], jnp.float32)
    x1 = jnp.asarray([0.69549072, 0.49228336, 0.27699880], jnp.float32)
    y1 = jnp.asarray([0.02312639, 0.15225084, 0.52607955], jnp.float32)
    c2 = jnp.asarray([3.90307140, 3.21182957, 3.96587128], jnp.float32)
    x2 = jnp.asarray([0.11748627, 0.86755042, 0.66077860], jnp.float32)
    y2 = jnp.asarray([0.84897130, 0.88445281, 0.73949448], jnp.float32)

    def bump(center, width, yoff):
        t = (x - center) * width
        return jnp.clip(1.0 - t * t - yoff, 0.0, 1.0)

    return jnp.clip(bump(x1, c1, y1) + bump(x2, c2, y2), 0.0, 1.0)


def _decimate4(img, h4, w4):
    """Nearest sample of the frame at viewport uv == 4x decimation with offset 2."""
    pad_h = 4 * h4 - img.shape[0]
    pad_w = 4 * w4 - img.shape[1]
    if pad_h or pad_w:
        pw = [(0, pad_h), (0, pad_w)] + [(0, 0)] * (img.ndim - 2)
        img = jnp.pad(img, pw, mode="edge")
    return img[2::4, 2::4]


def render_validation(sc, view_z_in, normal_roughness, mv_in, config,
                      diff_accum=None, spec_accum=None, virtual_history_amount=None,
                      max_accumulated_frame_num=63.0, diff_hit_t=None, spec_hit_t=None,
                      prev_validation=None):
    """Returns (h, w, 4) overlay; alpha = layer opacity for app-side compositing."""
    h, w = view_z_in.shape
    h4, w4 = -(-h // 4), -(-w // 4)
    dec = lambda x: _decimate4(x, h4, w4)  # noqa: E731

    view_z_raw = dec(view_z_in) * sc["view_z_scale"]
    view_z = jnp.abs(view_z_raw)
    nr = dec(normal_roughness)
    mv = dec(mv_in)
    n, roughness, material_id = fe.unpack_normal_roughness(
        nr, config.normal_encoding, config.roughness_encoding)
    is_inf = view_z > sc["denoising_range"]
    live = 1.0 - is_inf.astype(jnp.float32)

    # quarter-res uv of the SAMPLED full-res pixels (centres of the decimated grid)
    us = (jnp.arange(w4, dtype=jnp.float32) * 4.0 + 2.5) / (4.0 * w4)
    vs = (jnp.arange(h4, dtype=jnp.float32) * 4.0 + 2.5) / (4.0 * h4)
    uv = jnp.stack(jnp.meshgrid(us, vs, indexing="xy"), -1)  # (h4, w4, 2) x,y

    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    x_world = xv @ jnp.asarray(sc["view_to_world"])[:3, :3].T

    prev = prev_validation if prev_validation is not None \
        else jnp.zeros((h, w, 4), jnp.float32)
    if prev.shape[0] != 4 * h4 or prev.shape[1] != 4 * w4:
        prev = jnp.pad(prev, ((0, 4 * h4 - prev.shape[0]), (0, 4 * w4 - prev.shape[1]),
                              (0, 0)), mode="edge")

    def cell_prev(cy, cx):
        return prev[cy * h4:(cy + 1) * h4, cx * w4:(cx + 1) * w4]

    def rgba(rgb, a=1.0):
        alpha = jnp.broadcast_to(jnp.asarray(a, jnp.float32), rgb.shape[:2])[..., None]
        return jnp.concatenate([rgb, alpha], -1)

    gray = lambda t: jnp.repeat(t[..., None], 3, -1)  # noqa: E731

    cells = {}
    # 0: world-space normals
    cells[0] = rgba(n * 0.5 + 0.5)
    # 1: linear roughness
    cells[1] = rgba(gray(roughness))
    # 2: viewZ - green +, blue -, red beyond denoising range (Validation.cs.hlsl:110-120)
    f = 0.1 * view_z / (1.0 + 0.1 * view_z)
    zcol = jnp.where((view_z_raw < 0.0)[..., None],
                     jnp.asarray([0.0, 0.0, 1.0]) * f[..., None],
                     jnp.asarray([0.0, 1.0, 0.0]) * f[..., None])
    cells[2] = rgba(jnp.where(is_inf[..., None], jnp.asarray([1.0, 0.0, 0.0]), zcol))
    # 3: MV difference vs expected static-scene reprojection (:122-136)
    mv_s = mv * sc["mv_scale"][None, None, :3]
    uv_prev_expected = nm.get_screen_uv(sc["world_to_clip_prev"], x_world)
    uv_prev_2d = uv + mv_s[..., :2]
    uv_prev_3d = nm.get_screen_uv(sc["world_to_clip_prev"], x_world + mv_s)
    uv_prev = jnp.where(sc["mv_scale"][3] != 0.0, uv_prev_3d, uv_prev_2d)
    uv_delta = (uv_prev - uv_prev_expected) * sc["rect_size"][None, None, :]
    on_screen = ((uv_prev[..., 0] >= 0.0) & (uv_prev[..., 0] <= 1.0)
                 & (uv_prev[..., 1] >= 0.0) & (uv_prev[..., 1] <= 1.0))
    mv_rgb = jnp.concatenate([jnp.abs(uv_delta), jnp.zeros_like(uv_delta[..., :1])], -1)
    cells[3] = rgba(jnp.where(on_screen[..., None], mv_rgb,
                              jnp.asarray([0.0, 0.0, 1.0])))
    # 4: world grid + jitter trail + rotator trail (:140-238)
    cells[4] = rgba(_units_jitter_rotators(sc, uv, x_world, view_z, live,
                                           cell_prev(1, 0)[..., :3], h4, w4))
    # 7: virtual history amount (REBLUR)
    if virtual_history_amount is not None:
        cells[7] = rgba(gray(dec(virtual_history_amount)) * live[..., None])
    # 8 / 11: accumulated frames, Zucconi colorized; checker marks history reset (:260-301)
    def frames_cell(accum, cy, cx):
        a = dec(accum)
        fago = 1.0 - jnp.clip(a / max(max_accumulated_frame_num, 1.0), 0.0, 1.0)
        # checkerboard on OUTPUT pixel coords >> 2 (cell origin + local position)
        py = jax.lax.broadcasted_iota(jnp.int32, (h4, w4), 0) + cy * h4
        px = jax.lax.broadcasted_iota(jnp.int32, (h4, w4), 1) + cx * w4
        checker = ((px >> 2) + (py >> 2)) & 1
        fago = jnp.where((checker == 0) & (a < 1.0), 0.75, fago)
        bar = uv[..., 1] > 0.95
        t = jnp.where(bar, 1.0 - uv[..., 0], fago * live)
        return rgba(_zucconi6(t))

    if diff_accum is not None:
        cells[8] = frames_cell(diff_accum, 2, 0)
    if spec_accum is not None:
        cells[11] = frames_cell(spec_accum, 2, 3)
    # 12 / 15: input normalized hitT (:303-330): red = 0, magenta = out of [0,1]
    def hit_cell(ht):
        t = dec(ht)
        base = jnp.where((t != jnp.clip(t, 0.0, 1.0))[..., None],
                         jnp.asarray([1.0, 0.0, 1.0]), gray(t))
        rgb = jnp.where((t == 0.0)[..., None], jnp.asarray([1.0, 0.0, 0.0]), base)
        return rgba(rgb * live[..., None])

    if diff_hit_t is not None:
        cells[12] = hit_cell(diff_hit_t)
    if spec_hit_t is not None:
        cells[15] = hit_cell(spec_hit_t)

    rows = []
    for cy in range(4):
        row = []
        for cx in range(4):
            idx = cy * 4 + cx
            c = cells.get(idx)
            if c is None:  # unused viewport: previous content, transparent
                c = cell_prev(cy, cx) * jnp.asarray([1.0, 1.0, 1.0, 0.0])
            row.append(c)
        rows.append(jnp.concatenate(row, axis=1))
    out = jnp.concatenate(rows, axis=0)[:h, :w]
    # gResetHistory clears the whole overlay (:36-40)
    return jnp.where(sc["reset_history"] > 0.0, 0.0, out)


def _units_jitter_rotators(sc, uv, x_world, view_z, live, prev_rgb, h4, w4):
    """Viewport 4: world-unit grid, camera-jitter trail (bottom-right square, red when
    jitter leaves the pixel), rotator tap trail (top-right square). The trails accumulate
    because untouched pixels keep the previous frame's content (:171-229)."""
    aspect = jnp.asarray(h4 / w4, jnp.float32)
    dim = jnp.stack([0.5 * aspect, jnp.asarray(0.5, jnp.float32)])
    dim_px = jnp.stack([dim[0] * w4, dim[1] * h4])

    # world-units base layer
    corr = view_z * 0.001
    units = jnp.mod(x_world + corr[..., None], 1.0) * live[..., None]

    rem = (uv - (1.0 - dim)) / dim                       # bottom-right square
    rem2 = (uv - jnp.stack([1.0 - dim[0], jnp.asarray(0.0, jnp.float32)])) / dim
    in_sq = (rem > 0.0).all(-1)
    in_sq2 = (rem2 > 0.0).all(-1) & ~in_sq

    # jitter dot
    juv = jnp.asarray(sc["jitter"], jnp.float32) + 0.5
    jvalid = (jnp.clip(juv, 0.0, 1.0) == juv).all()
    a = jnp.floor(jnp.clip(juv, 0.0, 1.0) * dim_px)
    b = jnp.floor(rem * dim_px)
    near = (jnp.abs(a - b) <= 1.0).all(-1)
    near3 = (jnp.abs(a - b) <= 3.0).all(-1)
    sq = prev_rgb  # keep old dots -> trail
    sq = jnp.where((near & jvalid)[..., None], 0.66, sq)
    sq = jnp.where((near3 & ~jvalid)[..., None], jnp.asarray([1.0, 0.0, 0.0]), sq)

    # rotator taps (additive trail, cleared every 256 frames)
    scale = 0.5 * nm._reverse_bits_4(
        jnp.asarray(sc["frame_index"], jnp.int32)).astype(jnp.float32) / 16.0
    b2 = jnp.floor(rem2 * dim_px)
    rot = prev_rgb
    add = jnp.zeros_like(prev_rgb)
    for name, ch in (("rotator_pre", 0), ("rotator", 1), ("rotator_post", 2)):
        r = jnp.asarray(sc[name], jnp.float32)
        for tap in np.asarray(nm.SPECIAL_8):
            off = nm.rotate_vector2(r, jnp.asarray(tap[:2]) * scale)
            tuv = jnp.clip(0.5 + off, 0.0, 1.0)
            ta = jnp.floor(tuv * dim_px)
            hit = (jnp.abs(ta - b2) <= 1.0).all(-1)
            add = add.at[..., ch].add(hit.astype(jnp.float32))
    rot = jnp.clip(rot + add, 0.0, 1.0)
    rot = jnp.where(jnp.mod(jnp.asarray(sc["frame_index"], jnp.int32), 256) == 0,
                    0.0, rot)

    out = jnp.where(in_sq[..., None], sq, units)
    out = jnp.where(in_sq2[..., None], rot, out)
    return out
