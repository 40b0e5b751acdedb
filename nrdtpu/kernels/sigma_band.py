"""SIGMA Blur + PostBlur + TemporalStabilization in ONE Pallas launch (band pipeline).

The 3-launch SIGMA graph (sigma_blur2 x2 + sigma_ts) pays, per launch, a fixed
dispatch/pipeline floor, a 4x halo-window DMA amplification (block (64, 256) with
halo (32, 128) DMAs 4x the block's bytes), and XLA glue between launches
(bench_sigma.json: 1.74 + 1.79 + 1.72 + 1.11 glue = 6.0 ms of which the pure tap
math is ~2.5). A GPU cannot fuse across dispatch boundaries; a TPU kernel with a
*sequential* grid can: scratch persists across grid steps, so a stage's output can
ride a sliding VMEM buffer into the next stage's stencil without touching HBM and
WITHOUT halo recompute.

Structure: the grid walks full-width row bands (B = 40 rows) per column half. At
step i:

    blur1(band i)      from input windows (rows +-40 around band i)
    blur2(band i-1)    from the blur1 sliding buffer (3 bands; +-34 rows available)
    TS   (band i-2)    from the blur2 sliding buffer (+-2 rows for the 5x5 moments)
                       + reprojected history windows (per-step DMA)

Each band is computed exactly once per stage - the sliding buffers make the
producer's halo available instead of recomputing it. Inputs are DMA'd once for all
three stages. Out-of-image bands at the pipeline head/tail read edge-padded rows
and are overwritten / weight-masked; the +-2 moment rows of the last image band
read the approximate (edge-clamped) band below - a documented divergence.

History reprojection keeps the block-base + tent-residual contract of
kernels/reproject.py at (B, 256) granularity: per-segment integer bases (SMEM)
become dynamic-start slice origins into the history windows.

Intermediate shadows stay LINEAR between stages (the reference sqrt-packs between
dispatches because it round-trips through UNORM textures, SIGMA_Blur.hlsli:24-35;
in VMEM the packing would only lose precision).

Reference: SIGMA_Blur.hlsli:92-244, SIGMA_TemporalStabilization.hlsli:73-194 -
same per-tap formulas as sigma_blur2.py / sigma_pallas.py (see their docstrings
for the HLSL line mapping); this module only changes the execution schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import math as nm
from ..frontend import NRD_EPS
from ..ops import tiles
from . import reproject as rp
from .sigma_blur2 import _static_offsets, _LEV, _LO, _HI
from .sigma_pallas import (
    _compute_weight, _decode_oct_normal2, _is_lit, _smoothstep,
)

B = 40          # band height; must be >= 34 (stage reach) and a multiple of 8
RC = 8          # compute row-chunk inside a band (static python loop; keeps vregs low)
PADY = 80       # row edge-pad on all stencilled inputs (2 bands, covers every start)
PADX = 128      # col edge-pad on blur-stencilled inputs (DMA col starts stay aligned)
PADXH = 256     # col edge-pad on history planes (motion base up to +-126, + align)
EXT = 40        # blur1 compute col margin (blur2 needs blur1 at +-(34 + EXT2))
EXT2 = 2        # blur2 compute col margin (TS moments need blur2 at +-2)
SEG = 256       # TS motion-base segment width

# SMEM scalar layout
_F = 0          # 4: frustum
_W2V = 4        # 9: world_to_view rotation
_MISC = 13      # plane_sens, unproject, min_rect_dim_mul_unproject, denoising_range,
#                 view_z_scale, rect_w, rect_h, stab_strength
_NSC = 21


def _slc(ref, r0, nr, c0, nc):
    # r0 may be traced (row-chunk base, provably 8-aligned + static offset);
    # cols are static
    v = ref[pl.ds(r0, nr), pl.ds(c0, nc)]
    return v.astype(jnp.float32) if v.dtype != jnp.float32 else v


def _blur_band(channels, has_sin, smem, pen_tap, z_tap, s_tap, nx, ny,
               tile_c, fyp, fxp, rmax, acc, shape):
    """One SIGMA blur pass over an arbitrary (nr, nc) region.

    pen_tap/z_tap(dy, dx) -> (nr, nc) f32; s_tap(dy, dx) -> list of `channels`
    LINEAR planes (no sqrt packing between fused stages); has_sin False derives
    the shadow from IsLit(penumbra) (first pass without translucency input).
    acc: scratch refs used as per-level TAP HOISTS (see below), sliced to `shape`.
    Formulas: SIGMA_Blur.hlsli:92-244, identical to sigma_blur2._sigma_blur2_kernel.

    The sparse lattice uses the reblur_fused "hoist" structure: the per-level
    pl.when bodies contain ONLY the tap loads (into the acc scratch); the weight
    chain runs once per tap index on the hoisted values with runtime-selected
    (off_y, off_x, k_t) scalars - 4x less instantiated code, and Mosaic compile
    time scales with instantiated code.
    """
    nr, nc = shape
    f32 = jnp.float32
    rect_w = smem[_MISC + 5]
    rect_h = smem[_MISC + 6]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    u = (fxp + 0.5) * inv_w
    v = (fyp + 0.5) * inv_h

    center_pen = pen_tap(0, 0)
    view_z = z_tap(0, 0)
    lit_c = _is_lit(center_pen)

    def staps(dy, dx, lit_t):
        if not has_sin:
            return [lit_t]
        return s_tap(dy, dx)

    center_s = staps(0, 0, lit_c)
    n_s = len(center_s)

    fx0, fy0, fdx, fdy = smem[_F], smem[_F + 1], smem[_F + 2], smem[_F + 3]
    dirx = u * fdx + fx0
    diry = v * fdy + fy0
    xvx, xvy, xvz = dirx * view_z, diry * view_z, view_z
    nwx, nwy, nwz = _decode_oct_normal2(nx, ny)
    m = [smem[_W2V + k] for k in range(9)]
    nvx = m[0] * nwx + m[1] * nwy + m[2] * nwz
    nvy = m[3] * nwx + m[4] * nwy + m[5] * nwz
    nvz = m[6] * nwx + m[7] * nwy + m[8] * nwz

    unproject = smem[_MISC + 1]
    pixel_size = unproject * view_z
    frustum_size = smem[_MISC + 2] * view_z
    ga = 1.0 / (smem[_MISC] * frustum_size)
    gb = -(nvx * xvx + nvy * xvy + nvz * xvz) * ga

    # per-tap algebra hoists (see reblur_fused): d(tap) = z_t * (A + dx*P + dy*Q)
    d_a = nvx * dirx + nvy * diry + nvz
    d_p = nvx * (inv_w * fdx)
    d_q = nvy * (inv_h * fdy)
    bl_m = 2.0 * lit_c - 1.0
    bl_b = 1.0 - lit_c

    # ---- dense 5x5 (SIGMA_Blur.hlsli:92-148) ----
    mx = {dx: ((fxp >= jnp.float32(-dx))
               & (fxp <= rect_w - jnp.float32(1 + dx))).astype(f32)
          for dx in range(-2, 3)}
    my = {dy: ((fyp >= jnp.float32(-dy))
               & (fyp <= rect_h - jnp.float32(1 + dy))).astype(f32)
          for dy in range(-2, 3)}
    sum_x = jnp.zeros(shape, f32)
    sum_y = jnp.zeros(shape, f32)
    result = [jnp.zeros(shape, f32) for _ in range(n_s)]
    pen_acc = jnp.zeros(shape, f32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            pen_t = pen_tap(dy, dx)
            lit_t = _is_lit(pen_t)
            if dy == 0 and dx == 0:
                w_ = jnp.ones(shape, f32)
                s_t = center_s
            else:
                z_t = z_tap(dy, dx)
                s_t = staps(dy, dx, lit_t)
                d = z_t * (d_a + jnp.float32(dx) * d_p + jnp.float32(dy) * d_q)
                w_ = (mx[dx] * my[dy]) * _compute_weight(d, ga, gb)
                w_ = w_ * (bl_m * lit_t + bl_b)
                r2 = (dx * dx + dy * dy) / 4.0
                w_ = w_ * float(np.exp(-0.66 * r2))
            result = [r + st * w_ for r, st in zip(result, s_t)]
            sum_x = sum_x + w_
            w2 = w_ * pixel_size / (pixel_size + pen_t)
            w2 = w2 * (1.0 - lit_t)
            pen_acc = pen_acc + pen_t * w2
            sum_y = sum_y + w2

    result = [r / sum_x for r in result]
    penumbra = pen_acc / jnp.maximum(sum_y, NRD_EPS)
    sum_y = (sum_y != 0.0).astype(f32)
    sum_x = jnp.ones(shape, f32)

    pen_px = penumbra / pixel_size
    f = _smoothstep(0.0, 2.0, pen_px)
    result = [cs + (r - cs) * f for cs, r in zip(center_s, result)]
    f4 = 4.0 + (1.0 - 4.0) * f
    result = [r * f4 for r in result]
    penumbra = penumbra * f4
    sum_x = sum_x * f4
    sum_y = sum_y * f4

    unclamped = penumbra / pixel_size * tile_c
    min_radius = jnp.minimum(unclamped, 2.0)
    blur_radius = jnp.clip(unclamped, min_radius, 32.0)
    inv_r2 = 1.0 / jnp.square(jnp.clip(blur_radius, 1.0, _LEV[-1]))
    inv_est_pen = 1.0 / jnp.maximum(penumbra, NRD_EPS)
    taps = _static_offsets()

    # ---- sparse static lattice: hoisted loads, one weight chain per tap ----
    rmax = jnp.minimum(rmax, jnp.float32(_LEV[-1]))
    lws = [(rmax > jnp.float32(_LO[li])) & (rmax <= jnp.float32(_HI[li]))
           for li in range(len(_LEV))]
    res_a = result
    sx_a, sy_a, pen_a = sum_x, sum_y, penumbra
    n_t = 2 + (n_s if has_sin else 0)
    for k in range(8):
        # runtime-uniform (off_y, off_x, k_t): buckets partition the radius line
        sel = [jnp.float32(0.0)] * 3
        for li in range(len(_LEV)):
            m = lws[li].astype(f32)
            for q in range(3):
                sel[q] = sel[q] + m * jnp.float32(taps[k][li][q])
        oyf, oxf, k_t = sel

        for li in range(len(_LEV)):
            @pl.when(lws[li])
            def _(li=li, k=k):
                off_y, off_x, _ = taps[k][li]
                acc[0][0:nr, 0:nc] = pen_tap(off_y, off_x)
                acc[1][0:nr, 0:nc] = z_tap(off_y, off_x)
                if has_sin:
                    for c, sv in enumerate(s_tap(off_y, off_x)):
                        acc[2 + c][0:nr, 0:nc] = sv

        pen_t = acc[0][0:nr, 0:nc]
        z_t = acc[1][0:nr, 0:nc]
        lit_t = _is_lit(pen_t)
        s_t = [acc[2 + c][0:nr, 0:nc] for c in range(n_s)] if has_sin else [lit_t]
        in_screen = ((fxp >= -oxf) & (fxp <= rect_w - 1.0 - oxf)
                     & (fyp >= -oyf) & (fyp <= rect_h - 1.0 - oyf)).astype(f32)
        d = z_t * (d_a + oxf * d_p + oyf * d_q)
        w_ = in_screen * _compute_weight(d, ga, gb)
        w_ = w_ * (bl_m * lit_t + bl_b)
        w_ = w_ * jnp.exp(k_t * inv_r2)
        w_ = w_ * jnp.clip(pen_t * inv_est_pen, 0.0, 1.0)
        res_a = [r + st * w_ for r, st in zip(res_a, s_t)]
        sx_a = sx_a + w_
        w2 = w_ * pixel_size / (pixel_size + pen_t)
        w2 = w2 * (1.0 - lit_t)
        pen_a = pen_a + pen_t * w2
        sy_a = sy_a + w2

    inv_sx = 1.0 / sx_a
    penumbra_out = jnp.where(sy_a == 0.0, center_pen,
                             pen_a / jnp.maximum(sy_a, NRD_EPS))
    no_denoise = (tile_c == 0.0) | (center_pen == 0.0) \
        | (view_z > smem[_MISC + 3])
    s_out = []
    for c in range(channels):
        cc = min(c, n_s - 1)
        s_out.append(jnp.where(no_denoise, center_s[cc],
                               jnp.clip(res_a[cc] * inv_sx, 0.0, 1.0)))
    pen_out = jnp.where(no_denoise, center_pen, penumbra_out)
    return pen_out, s_out


def _coords(nr, nc, row0, col0):
    """(fyp, fxp) absolute pixel coordinates for an (nr, nc) compute region."""
    f32 = jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 0).astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 1).astype(f32)
    return (row + jnp.asarray(row0).astype(f32),
            col + jnp.asarray(col0).astype(f32))


def _band_kernel(channels, translucent, nb, Wh, nseg_h, diag, smem, by_ref, bx_ref,
                 *refs):
    f32 = jnp.float32
    n_sin = channels if translucent else 0
    n_hp = channels + 2   # history planes gathered by TS: hist c.., prev_z, hl
    # ---- unpack refs (order mirrors the call in sigma_band_pallas) ----
    it = iter(refs)
    pen_h = next(it); z_h = next(it); tile_h = next(it)
    nx_h = next(it); ny_h = next(it)
    sin_h = [next(it) for _ in range(n_sin)]
    hist_h = [next(it) for _ in range(channels)]
    pz_h = next(it); hl_h = next(it)
    mvy_h = next(it); mvx_h = next(it); xvpz_h = next(it); thr_h = next(it)
    outs = [next(it) for _ in range(channels)]
    hl_out = next(it)
    pen_w = next(it); z_w = next(it); tile_w = next(it)
    nx_w = next(it); ny_w = next(it)
    sin_w = [next(it) for _ in range(n_sin)]
    # (B+16, 512) per-(segment, plane) history windows, all DMA'd in one batch
    hseg = [next(it) for _ in range(nseg_h * (channels + 2))]
    mvy_w = next(it); mvx_w = next(it); xvpz_w = next(it); thr_w = next(it)
    b1 = [next(it) for _ in range(1 + channels)]   # pen1, s1.. (B, Wh + 2*EXT)
    b2 = [next(it) for _ in range(1 + channels)]   # pen2, s2.. (B, Wh + 2*EXT2)
    acc = [next(it) for _ in range(2 + channels)]
    sem = next(it)

    h = pl.program_id(0)
    i = pl.program_id(1)
    Wc1 = Wh + 2 * EXT    # blur1 compute width
    Wc2 = Wh + 2 * EXT2   # blur2 compute width
    col0 = h * Wh         # absolute col of this half's first pixel
    Hp = nb * B

    # ---- DMA this step's windows (starts clamped into the padded arrays) ----
    # every row start is a multiple of 8 by construction (B, PADY, heights are);
    # Mosaic's divisibility prover doesn't see through clip, so assert it
    def m8(x):
        return pl.multiple_of(x, 8)

    r_pen = m8(jnp.clip(i * B + PADY - 40, 0, Hp + 2 * PADY - 120))
    r_z = m8(jnp.clip(i * B + PADY - 2 * B, 0, Hp + 2 * PADY - (3 * B + 40)))
    r_nxy = m8(jnp.clip((i - 1) * B + PADY, 0, Hp + 2 * PADY - 2 * B))
    j2 = jnp.clip(i - 2, 0, nb - 1)
    c_in = pl.multiple_of(h * Wh, 128)  # padded col start (pad PADX)

    cps = []

    def cp(src, dst, r0, c0):
        cps.append(pltpu.make_async_copy(
            src.at[pl.ds(r0, dst.shape[0]), pl.ds(c0, dst.shape[1])], dst,
            sem.at[len(cps)]))

    cp(pen_h, pen_w, r_pen, c_in)
    cp(z_h, z_w, r_z, c_in)
    cp(tile_h, tile_w, r_z, c_in)
    cp(nx_h, nx_w, r_nxy, c_in)
    cp(ny_h, ny_w, r_nxy, c_in)
    for s_, w_ in zip(sin_h, sin_w):
        cp(s_, w_, r_pen, c_in)
    r_c = m8(j2 * B)
    cp(mvy_h, mvy_w, r_c, c_in)
    cp(mvx_h, mvx_w, r_c, c_in)
    cp(xvpz_h, xvpz_w, r_c, c_in)
    cp(thr_h, thr_w, r_c, c_in)

    # per-(segment, plane) history windows for the TS gather (see below): the
    # bases are SMEM-prefetched, so every DMA rides the same batch/wait
    hist_planes = hist_h + [pz_h, hl_h]
    seg_rem = []
    for s in range(nseg_h if not diag else 0):
        g = h * nseg_h + s
        by = by_ref[j2, g]
        bx = bx_ref[j2, g]
        ry = j2 * B + PADY + by - 1
        cx = col0 + s * SEG + PADXH + bx - 1
        sy = pl.multiple_of((ry // 8) * 8, 8)
        sx = pl.multiple_of((cx // 128) * 128, 128)
        seg_rem.append((ry - sy, cx - sx))
        for k_, src in enumerate(hist_planes):
            cp(src, hseg[s * n_hp + k_], sy, sx)
    for c_ in cps:
        c_.start()
    for c_ in cps:
        c_.wait()

    @pl.when(i == 0)
    def _():
        for b_ in b1 + b2:
            b_[:, :] = jnp.zeros(b_.shape, b_.dtype)

    view_z_scale = smem[_MISC + 4]
    unproject = smem[_MISC + 1]

    # window col of compute col 0: blur1 region starts EXT left of the band
    cw1 = PADX - EXT
    cw2 = PADX - EXT2

    # Row-chunked stages: each 40-row band computes in RC=8-row slices so
    # full-band (40, ~Wh+2*EXT) f32 values (~50 vregs each, spilled) become
    # (8, w) slices (~10) - bench_band.py's blur1-only diag measured the
    # spilled version at 2.9x the block-kernel cost. The chunk loop is a
    # PYTHON loop: a fori_loop's traced chunk base + arbitrary static tap
    # offsets (r0 + 40 + dy) hit Mosaic's dynamic-slice divisibility prover,
    # which fails for dy not a multiple of 8 (round-4 on-chip failure mode in
    # the REBLUR twin of this kernel). Slides run in a separate chunk loop
    # BEFORE appends (the appended rows are read by later slide chunks
    # otherwise).
    nch = B // RC

    def slide(k, carry):
        r0 = pl.multiple_of(k * RC, RC)
        for b_ in b1 + b2:
            b_[pl.ds(r0, RC), :] = b_[pl.ds(B + r0, RC), :]
        return carry

    jax.lax.fori_loop(0, (2 * B) // RC, slide, 0, unroll=False)

    # ================= blur1 for band j0 = i =================
    # pen window rows: band row r -> 40 + r; z/tile window: band row r -> 2B + r
    def blur1_chunk(k):
        r0 = k * RC
        fyp1, fxp1 = _coords(RC, Wc1, i * B + r0, col0 - EXT)

        def pen_tap1(dy, dx):
            return _slc(pen_w, r0 + 40 + dy, RC, cw1 + dx, Wc1)

        def z_tap1(dy, dx):
            return jnp.abs(_slc(z_w, r0 + 2 * B + dy, RC, cw1 + dx, Wc1)) \
                * view_z_scale

        def s_tap1(dy, dx):
            return [_slc(w_, r0 + 40 + dy, RC, cw1 + dx, Wc1) for w_ in sin_w]

        nx1 = _slc(nx_w, r0 + B, RC, cw1, Wc1)
        ny1 = _slc(ny_w, r0 + B, RC, cw1, Wc1)
        tile1 = _slc(tile_w, r0 + 2 * B, RC, cw1, Wc1)

        # radius bound: refined penumbra is a convex 5x5 mix * f4(<=4) of raw pen
        zb = jnp.abs(_slc(z_w, r0 + 2 * B - 2, RC + 4, cw1 - 2, Wc1 + 4)) \
            * view_z_scale
        pb = _slc(pen_w, r0 + 40 - 2, RC + 4, cw1 - 2, Wc1 + 4)
        tb = _slc(tile_w, r0 + 2 * B - 2, RC + 4, cw1 - 2, Wc1 + 4)
        pb = jnp.where(pb >= jnp.float32(65504.0), 0.0, pb)
        rb = pb / jnp.maximum(unproject * zb, NRD_EPS) * tb * 4.0
        rmax1 = jnp.max(jnp.clip(rb, 0.0, 32.0))

        pen1, s1 = _blur_band(channels, n_sin > 0, smem, pen_tap1, z_tap1,
                              s_tap1, nx1, ny1, tile1, fyp1, fxp1, rmax1, acc,
                              (RC, Wc1))
        if diag == "b1":  # timing diagnostic: blur1 only (outputs are NOT SIGMA)
            for c in range(channels):
                outs[c][pl.ds(r0, RC), :] = \
                    s1[min(c, len(s1) - 1)][:, EXT:EXT + Wh]
            hl_out[pl.ds(r0, RC), :] = pen1[:, EXT:EXT + Wh]
            return
        for b_, v in zip(b1, [pen1] + s1):
            b_[pl.ds(2 * B + r0, RC), :] = v.astype(b_.dtype)

    for _kc in range(nch):
        blur1_chunk(_kc)
    if diag == "b1":
        return

    # ================= blur2 for band j1 = i - 1 =================
    # b1 buf rows: band j1 row r -> B + r, col c -> EXT + c;
    # z/tile window: band j1 row r -> B + r; nxy window: row r
    def blur2_chunk(k):
        r0 = k * RC
        fyp2, fxp2 = _coords(RC, Wc2, (i - 1) * B + r0, col0 - EXT2)

        def pen_tap2(dy, dx):
            return _slc(b1[0], r0 + B + dy, RC, EXT - EXT2 + dx, Wc2)

        def z_tap2(dy, dx):
            return jnp.abs(_slc(z_w, r0 + B + dy, RC, cw2 + dx, Wc2)) \
                * view_z_scale

        def s_tap2(dy, dx):
            return [_slc(b1[1 + c], r0 + B + dy, RC, EXT - EXT2 + dx, Wc2)
                    for c in range(channels)]

        nx2 = _slc(nx_w, r0, RC, cw2, Wc2)
        ny2 = _slc(ny_w, r0, RC, cw2, Wc2)
        tile2 = _slc(tile_w, r0 + B, RC, cw2, Wc2)

        zb2 = jnp.abs(_slc(z_w, r0 + B - 2, RC + 4, cw2 - 2, Wc2 + 4)) \
            * view_z_scale
        pb2 = _slc(b1[0], r0 + B - 2, RC + 4, EXT - EXT2 - 2, Wc2 + 4)
        tb2 = _slc(tile_w, r0 + B - 2, RC + 4, cw2 - 2, Wc2 + 4)
        pb2 = jnp.where(pb2 >= jnp.float32(65504.0), 0.0, pb2)
        rb2 = pb2 / jnp.maximum(unproject * zb2, NRD_EPS) * tb2 * 4.0
        rmax2 = jnp.max(jnp.clip(rb2, 0.0, 32.0))

        pen2, s2 = _blur_band(channels, True, smem, pen_tap2, z_tap2, s_tap2,
                              nx2, ny2, tile2, fyp2, fxp2, rmax2, acc,
                              (RC, Wc2))
        if diag == "b12":  # timing diagnostic: blur1+blur2 only (NOT SIGMA)
            for c in range(channels):
                outs[c][pl.ds(r0, RC), :] = \
                    s2[min(c, len(s2) - 1)][:, EXT2:EXT2 + Wh]
            hl_out[pl.ds(r0, RC), :] = pen2[:, EXT2:EXT2 + Wh]
            return
        for b_, v in zip(b2, [pen2] + s2):
            b_[pl.ds(2 * B + r0, RC), :] = v.astype(b_.dtype)

    for _kc in range(nch):
        blur2_chunk(_kc)
    if diag == "b12":
        return

    # ================= TS for band j2 = i - 2 =================
    # b2 buf rows: band j2 row r -> B + r, col c -> EXT2 + c. Processed per
    # (B, SEG) SEGMENT (static loop) so live values stay ~10 vregs; the 5x5
    # moments read b2's +-2-col margin, so segment edges need no halo exchange.
    # SIGMA_TemporalStabilization.hlsli:73-194.
    stab_strength = smem[_MISC + 7]
    denoising_range = smem[_MISC + 3]
    gv = [float(np.exp(-0.66 * (d * d) / 4.0)) for d in range(-2, 3)]
    gsum = float(sum(gv)) ** 2

    for s in range(nseg_h):
        c0s = s * SEG
        pen_c = _slc(b2[0], B, B, EXT2 + c0s, SEG)
        shadow = [_slc(b2[1 + c], B, B, EXT2 + c0s, SEG) for c in range(channels)]
        view_z_c = jnp.abs(_slc(z_w, 0, B, PADX + c0s, SEG)) * view_z_scale
        tile_c = _slc(tile_w, 0, B, PADX + c0s, SEG)

        g = h * nseg_h + s
        by = by_ref[j2, g]
        bx = bx_ref[j2, g]
        mvy_s = mvy_w[:, c0s:c0s + SEG]
        mvx_s = mvx_w[:, c0s:c0s + SEG]
        qy, qx, valid = rp.residual_and_validity(mvy_s, mvx_s, by, bx)
        qy = jnp.clip(qy, -1.0, 0.999)
        qx = jnp.clip(qx, -1.0, 0.999)
        thr_s = thr_w[:, c0s:c0s + SEG] * valid - (1.0 - valid)
        xvz_s = xvpz_w[:, c0s:c0s + SEG]
        rem_y, rem_x = seg_rem[s]

        # history gather: per-segment integer base + per-pixel tent residual.
        # Mosaic vector loads need (8, 128)-aligned provable starts, so each
        # segment's (B+16, 512) window was DMA'd at a floor-aligned start (in
        # the main batch above) and the (0..7, 0..127) remainder is absorbed by
        # ONE normalization roll pair; the 3x3 tent taps are static slices.
        def rolled(k_, s=s, rem_y=rem_y, rem_x=rem_x):
            v = hseg[s * n_hp + k_][:, :].astype(f32)
            v = pltpu.roll(v, jnp.mod(-rem_y, B + 16), 0)
            return pltpu.roll(v, jnp.mod(-rem_x, 512), 1)

        zv = rolled(channels)
        ws = jnp.zeros((B, SEG), f32)
        w_taps = []
        for ti, dy in enumerate(rp.TAPS):
            wy_ = rp.tent_weight(qy, dy)
            for dx in rp.TAPS:
                z_t = zv[ti: ti + B, 1 + dx: 1 + dx + SEG]
                occ = (jnp.abs(z_t - xvz_s) <= thr_s).astype(f32)
                w_ = wy_ * rp.tent_weight(qx, dx) * occ
                w_taps.append(w_)
                ws = ws + w_

        def gather(k_):
            v = rolled(k_)
            acc_ = None
            t_ = 0
            for ti, dy in enumerate(rp.TAPS):
                for dx in rp.TAPS:
                    t = v[ti: ti + B, 1 + dx: 1 + dx + SEG] * w_taps[t_]
                    acc_ = t if acc_ is None else acc_ + t
                    t_ += 1
            return acc_

        inv = jnp.where(ws < 1e-4, 0.0, 1.0 / jnp.maximum(ws, 1e-4))
        history = [jnp.clip(gather(c) * inv, 0.0, 1.0) for c in range(channels)]
        history = [t * t for t in history]   # state is sqrt-packed
        history_length = gather(channels + 1) * inv

        # ---- 5x5 moments, separable (see sigma_pallas._sigma_ts_kernel) ----
        def _sep_blur(v):
            a_ = None
            for k, g_ in enumerate(gv):
                sl = v[:, k:k + SEG] * jnp.float32(g_)
                a_ = sl if a_ is None else a_ + sl
            o_ = None
            for k, g_ in enumerate(gv):
                sl = a_[k:k + B, :] * jnp.float32(g_)
                o_ = sl if o_ is None else o_ + sl
            return o_

        pen_e = _slc(b2[0], B - 2, B + 4, EXT2 + c0s - 2, SEG + 4)
        lit_e = _is_lit(pen_e)
        lit_cc = lit_e[2:2 + B, 2:2 + SEG]
        bl_m = 2.0 * lit_cc - 1.0
        bl_b = 1.0 - lit_cc
        msum = bl_m * _sep_blur(lit_e) + bl_b * gsum
        m1, m2 = [], []
        for c in range(channels):
            t2 = _slc(b2[1 + c], B - 2, B + 4, EXT2 + c0s - 2, SEG + 4)
            t4 = jnp.square(t2)
            m1.append((bl_m * _sep_blur(lit_e * t2) + bl_b * _sep_blur(t2)) / msum)
            m2.append((bl_m * _sep_blur(lit_e * t4) + bl_b * _sep_blur(t4)) / msum)
        sigma = [jnp.sqrt(jnp.abs(b_ - a_ * a_)) for a_, b_ in zip(m1, m2)]

        sig_scale = 3.0 + (1.0 - 3.0) * (1.0 / (1.0 + history_length))
        hist_cl = [jnp.clip(hh, a_ - sg * sig_scale, a_ + sg * sig_scale)
                   for hh, a_, sg in zip(history, m1, sigma)]
        antilag = jnp.abs(hist_cl[0] - history[0])
        antilag = jnp.sqrt(jnp.clip(antilag, 0.0, 1.0))
        antilag = jnp.clip(1.0 - antilag, 0.0, 1.0)
        history_length = history_length * antilag
        history_weight = history_length / (1.0 + history_length)
        street_magic = 0.6 * history_weight * antilag
        hist_cl = [hc + (hh - hc) * street_magic
                   for hc, hh in zip(hist_cl, history)]
        blend = jnp.minimum(stab_strength, history_weight)
        result = [sh + (hc - sh) * blend for sh, hc in zip(shadow, hist_cl)]

        is_hard = (tile_c == 0.0) | (pen_c == 0.0)
        result = [jnp.where(is_hard, sh, r) for sh, r in zip(shadow, result)]
        history_length = jnp.where(is_hard, 7.0, history_length)
        new_hl = jnp.minimum(history_length + 1.0, 7.0)

        dead = view_z_c > denoising_range
        for c in range(channels):
            outs[c][:, c0s:c0s + SEG] = jnp.where(
                dead, jnp.sqrt(jnp.clip(shadow[c], 0.0, 1.0)),
                jnp.sqrt(jnp.clip(result[c], 0.0, 1.0)))
        hl_out[:, c0s:c0s + SEG] = jnp.where(dead, history_length,
                                             jnp.round(new_hl))


def sigma_band_pallas(sc, dc, penumbra_in, shadow_in, view_z_in, normal_roughness,
                      tiles_smoothed, mv_in, history_packed, prev_view_z,
                      prev_history_len, *, channels: int, translucent: bool,
                      col_split: int = None, interpret: bool = False):
    """Fused SIGMA Blur+PostBlur+TS band pipeline. Returns (out, new_pz, new_hl).

    XLA side mirrors sigma_ts_pallas: tile upsample, the two MV branches, the
    disocclusion threshold, and the per-(B, SEG)-segment motion bases.
    """
    h, w = penumbra_in.shape
    f32 = jnp.float32
    tile_value = tiles.upsample_tile_value(tiles_smoothed, h, w, 1.0)

    # narrower columns compile far faster in Mosaic (register pressure grows
    # superlinearly with vregs-per-value) and the EXT margin overhead stays small
    import os
    cs = col_split or int(os.environ.get("NRDTPU_BAND_CS", 0)) \
        or (4 if channels == 1 else 8)
    nseg_tot = -(-w // SEG)
    cs = min(cs, nseg_tot)
    while nseg_tot % cs:
        cs -= 1  # small images: fewer column splits
    nb = -(-h // B)
    Hp = nb * B
    Wp = nseg_tot * SEG
    Wh = Wp // cs
    nseg_h = Wh // SEG

    # ---- TS position math (elementwise; passes/sigma/kernels.py:294-366) ----
    from ..ops import resample
    uv = resample.pixel_uv_grid(h, w)
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    w2v = jnp.asarray(sc["world_to_view"])
    x = xv @ w2v[:3, :3]
    mv = mv_in[..., :3] * sc["mv_scale"][None, None, :3]
    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    is_world_mv = sc["mv_scale"][3] != 0.0
    smb_uv_screen = uv + mv[..., :2]
    mv_z_computed = (x @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2] - view_z
    mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_z_computed, mv[..., 2])
    view_z_prev = view_z + mv_z
    xv_prev_local = nm.reconstruct_view_position(
        smb_uv_screen, sc["frustum_prev"][None, None, :], view_z_prev,
        sc["ortho_mode"])
    x_prev_screen = xv_prev_local @ w2v_prev[:3, :3] + sc["camera_delta"][None, None, :]
    x_prev_world = x + mv
    smb_uv_world = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_prev_world)
    x_prev = jnp.where(is_world_mv, x_prev_world, x_prev_screen)
    smb_pixel_uv = jnp.where(is_world_mv, smb_uv_world, smb_uv_screen)
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"],
                                       sc["ortho_mode"], view_z)
    thr = nm.get_disocclusion_threshold(0.02, frustum_size, 1.0)
    thr = thr * resample.is_in_screen_nearest(smb_pixel_uv) - NRD_EPS
    xv_prev_z = (x_prev @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2]
    rect_prev = sc["rect_size_prev"]
    mv_pix = smb_pixel_uv * rect_prev[None, None, :] - uv * jnp.asarray(
        [w, h], f32)[None, None, :]
    mv_pix_x, mv_pix_y = mv_pix[..., 0], mv_pix[..., 1]

    def padded(img, padx, dtype=None):
        p = jnp.pad(img, ((PADY, PADY + Hp - h), (padx, padx + Wp - w)),
                    mode="edge")
        return p.astype(dtype) if dtype is not None else p

    def flat(img, dtype=None):
        p = jnp.pad(img, ((0, Hp - h), (0, Wp - w)), mode="edge")
        return p.astype(dtype) if dtype is not None else p

    # per-(B, SEG)-segment integer motion bases (the reproject.py contract at
    # band-segment granularity); computed over the padded grid so shapes agree
    mvy_p, mvx_p = flat(mv_pix_y), flat(mv_pix_x)

    def rmean(m):
        return m.reshape(nb, B, Wp // SEG, SEG).mean((1, 3))

    by = jnp.clip(jnp.round(rmean(mvy_p)), -30, 30).astype(jnp.int32)
    bx = jnp.clip(jnp.round(rmean(mvx_p)), -126, 126).astype(jnp.int32)

    bf = jnp.bfloat16
    args = [padded(penumbra_in, PADX), padded(view_z_in, PADX),
            padded(tile_value, PADX, bf),
            padded(normal_roughness[..., 0], PADX, bf),
            padded(normal_roughness[..., 1], PADX, bf)]
    n_sin = channels if translucent else 0
    if n_sin:
        s_ = shadow_in if shadow_in.ndim == 3 else shadow_in[..., None]
        args += [padded(s_[..., c], PADX, bf) for c in range(channels)]
    hist = history_packed if history_packed.ndim == 3 else history_packed[..., None]
    args += [padded(hist[..., c], PADXH, bf) for c in range(channels)]
    args += [padded(prev_view_z, PADXH), padded(prev_history_len, PADXH, bf)]
    args += [mvy_p, mvx_p, flat(xv_prev_z), flat(thr)]

    scalars = jnp.concatenate([
        jnp.asarray(sc["frustum"], f32),
        jnp.asarray(sc["world_to_view"])[:3, :3].reshape(-1).astype(f32),
        jnp.stack([jnp.asarray(dc["plane_dist_sensitivity"], f32),
                   jnp.asarray(sc["unproject"], f32),
                   jnp.asarray(sc["min_rect_dim_mul_unproject"], f32),
                   jnp.asarray(sc["denoising_range"], f32),
                   jnp.asarray(sc["view_z_scale"], f32),
                   jnp.asarray(w, f32), jnp.asarray(h, f32),
                   jnp.asarray(dc["stabilization_strength"], f32)])])

    diag = os.environ.get("NRDTPU_BAND_DIAG", "")
    WIN_W = Wh + 2 * PADX
    n_dma = 9 + n_sin + (0 if diag else nseg_h * (channels + 2))
    hseg_one = [pltpu.VMEM((B + 16, 512), bf) for _ in range(channels)] \
        + [pltpu.VMEM((B + 16, 512), f32),              # prev z segment
           pltpu.VMEM((B + 16, 512), bf)]
    scratch = [
        pltpu.VMEM((120, WIN_W), args[0].dtype),        # pen
        pltpu.VMEM((3 * B + 40, WIN_W), f32),           # z
        pltpu.VMEM((3 * B + 40, WIN_W), bf),            # tile
        pltpu.VMEM((2 * B, WIN_W), bf),                 # nx
        pltpu.VMEM((2 * B, WIN_W), bf),                 # ny
    ] + [pltpu.VMEM((120, WIN_W), bf) for _ in range(n_sin)] \
      + hseg_one * nseg_h \
      + [pltpu.VMEM((B, Wh), f32) for _ in range(4)] \
      + [pltpu.VMEM((3 * B, Wh + 2 * EXT), bf) for _ in range(1 + channels)] \
      + [pltpu.VMEM((3 * B, Wh + 2 * EXT2), bf) for _ in range(1 + channels)] \
      + [pltpu.VMEM((B, Wh + 2 * EXT), f32) for _ in range(2 + channels)] \
      + [pltpu.SemaphoreType.DMA((n_dma,))]

    grid = (cs, nb + 2)
    out_specs = tuple(
        pl.BlockSpec((B, Wh), lambda ci, i: (jnp.clip(i - 2, 0, nb - 1), ci),
                     memory_space=pltpu.VMEM)
        for _ in range(channels + 1))
    out_shape = tuple(jax.ShapeDtypeStruct((Hp, Wp), f32)
                      for _ in range(channels + 1))
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 \
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(args)

    outs = pl.pallas_call(
        functools.partial(_band_kernel, channels, translucent, nb, Wh, nseg_h,
                          diag),
        grid=grid, in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scalars, by, bx, *args)

    out = jnp.stack([o[:h, :w] for o in outs[:channels]], -1)
    hl_new = outs[channels][:h, :w]
    dead = view_z > sc["denoising_range"]
    new_prev_view_z = jnp.where(dead, prev_view_z, view_z)
    new_hl = jnp.where(dead, prev_history_len, hl_new)
    return out, new_prev_view_z, new_hl
