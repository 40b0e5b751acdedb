"""Pallas TPU resolvers for REBLUR temporal accumulation and stabilization.

Design: the REBLUR XLA kernels (passes/reblur/kernels.py) keep ALL elementwise math - the
position reconstruction, parallax, thresholds, curvature, lobe and confidence logic run
unchanged in XLA (elementwise ops are ~memory-speed on this backend). Only the *gathers*
move into Pallas, because an XLA gather costs ~40 ms each here (ARCHITECTURE.md "backend
findings") and TA has ~30 of them:

  * nearest_resolve     - N planes sampled at a per-pixel reprojected position (nearest),
                          used for the stochastic normal taps, prev-prev taps, and the
                          high-parallax curvature taps.
  * reblur_smb_resolve  - the surface-motion footprint: 4x4 viewZ/material occlusion
                          (REBLUR_TemporalAccumulation.hlsli lines 152-305), 2x2 prev-normal
                          average, accum-speed resolve, fbits, and the CatRom-13
                          (fallback bilinear-custom) history samples for diffuse+specular.
  * reblur_vmb_resolve  - the virtual-motion footprint: 2x2 occlusion with precomputed
                          per-tap thresholds, accum speed, fbits, CatRom history, fast
                          history, and the prev hit-dist bilinear sample.

All reprojection uses the block-base + tent-residual decomposition (kernels/reproject.py):
per-pixel motion deviating >1 px from the block mean resolves as disocclusion. CatRom taps
that land off screen are excluded and renormalized (the reference clamp-samples instead) -
documented divergence, quality-neutral at borders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .. import math as nm
from ..frontend import NRD_EPS, NRD_INF
from . import reproject as rp
from .harness import stencil_call
from .harness2 import stencil_call2

HALO = (32, 128)
BLOCK = (64, 256)
ALMOST_ZERO_ANGLE = float(np.cos(np.deg2rad(89.0)))


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


class FP:
    """Reprojected 4x4 footprint over a base-shifted window.

    tap(i, j) = plane[p + B + fl + (j - 1, i - 1)] with per-pixel integer
    residual fl. Two forms of the residual selectors:
      - my/mx boolean arrays: fl in {-1, 0} (the classic 1-px capture);
      - my/mx lists of (fl, mask_f32) one-hot pairs: arbitrary capture range
        (the smb resolver passes fl in {-2..1} - exact 2-px residuals, the
        round-5 zoom-retention fix: clipped sampling made the accum gather
        follow the wrong motion track and freeze, see test_history_retention).
    Raw static taps are memoized (neighbouring footprint taps share them)."""

    def __init__(self, win_b, my, mx):
        self.w = win_b
        if isinstance(my, list):
            self.my, self.mx = my, mx
        else:
            f32 = jnp.float32
            myf = my.astype(f32)
            mxf = mx.astype(f32)
            self.my = [(-1, myf), (0, 1.0 - myf)]
            self.mx = [(-1, mxf), (0, 1.0 - mxf)]
        self._raw = {}

    def _t(self, dy, dx):
        key = (dy, dx)
        if key not in self._raw:
            self._raw[key] = self.w.tap(dy, dx)
        return self._raw[key]

    def tap(self, i, j):
        acc = None
        for a, wa in self.my:
            for b, wb in self.mx:
                t = self._t(j - 1 + a, i - 1 + b) * (wa * wb)
                acc = t if acc is None else acc + t
        return acc


def _decode_oct(px_, py_):
    """_NRD_DecodeUnitVector (unsigned R10G10B10A2) on planes -> (nx, ny, nz) normalized."""
    qx = px_ * 2.0 - 1.0
    qy = py_ * 2.0 - 1.0
    z = 1.0 - jnp.abs(qx) - jnp.abs(qy)
    t = jnp.clip(-z, 0.0, 1.0)
    nx = qx - t * jnp.where(qx >= 0.0, 1.0, -1.0)
    ny = qy - t * jnp.where(qy >= 0.0, 1.0, -1.0)
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + z * z, 1e-15))
    return nx * inv, ny * inv, z * inv


def _catrom_w(f, c=0.5):
    """nm.catmull_rom_weights inlined on planes."""
    w0 = f * (f * (-c * f + 2.0 * c) - c)
    w1 = f * (f * ((2.0 - c) * f - (3.0 - c))) + 1.0
    w2 = f * (f * (-(2.0 - c) * f + (3.0 - 2.0 * c)) + c)
    w3 = f * (f * (c * f - c))
    return (w0, w1, w2, w3)


def _split(img):
    """(H, W, C) -> list of planes; (H, W) -> [img]."""
    if img.ndim == 2:
        return [img]
    return [img[..., c] for c in range(img.shape[-1])]


def _prep(sc, mv_pix_y, mv_pix_x):
    base_y, base_x = rp.block_motion_base(mv_pix_y, mv_pix_x, BLOCK,
                                          bound=(HALO[0] - 4, HALO[1] - 4))
    return base_y, base_x


# Row-halo for running the motion-base gather launches under shard_map
# (parallel/sharding.shard_stencil): the kernel's own window halo (HALO[0]) plus
# the vertical motion-base bound (HALO[0] - 4, see _prep) - every base-shifted
# DMA start then lands on rows that exist locally (exchanged from the ring
# neighbor); vertical motion beyond the bound degrades to disocclusion exactly
# like the single-chip path's base clip.
SHARD_HALO = 2 * HALO[0] - 4 + 4  # = 64 rows


def _launch_or_shard(launch, tree, h, mesh, halo_rows=None):
    """Run `launch(tree, origin_offset)` directly, or row-sharded over `mesh`.

    The single-chip path passes origin_offset=None (kernels use raw block
    origins); the sharded path halo-pads every (h, w[, c]) leaf of `tree` with
    `halo_rows` exchanged rows and offsets in-kernel coordinates so uv math and
    in-screen tests stay global (parallel/sharding.shard_stencil)."""
    if mesh is None:
        return launch(tree)
    from ..parallel.sharding import shard_stencil

    return shard_stencil(mesh, launch, halo_rows or SHARD_HALO, tree, h)


# ---------------------------------------------------------------------------
# nearest_resolve
# ---------------------------------------------------------------------------


def _nearest_kernel(n_planes, smem, bsm, wins, centers, outs, origin, scratch):
    mvy = centers[0][:, :]
    mvx = centers[1][:, :]
    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x)
    ry = jnp.clip(jnp.round(qy), -1.0, 1.0)
    rx = jnp.clip(jnp.round(qx), -1.0, 1.0)
    sels = [(dy, dx, ((ry == dy) & (rx == dx)).astype(jnp.float32))
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for p in range(n_planes):
        wb = wins[p]
        acc = jnp.zeros_like(mvy)
        for dy, dx, m in sels:
            acc = acc + wb.tap(dy, dx) * m
        outs[p][:, :] = acc
    outs[n_planes][:, :] = valid


def nearest_resolve(planes, mv_pix_y, mv_pix_x, mesh=None):
    """Sample each plane at round(pixel + motion); returns (resolved list, valid).

    Replaces resample.sample_nearest at a reprojected uv. valid=0 marks pixels whose
    motion deviates >1 px from the block base (callers treat them as off-screen)."""
    n = len(planes)

    def launch(tree, origin_offset=None):
        planes_l, mvy_l, mvx_l = tree
        base_y, base_x = _prep(None, mvy_l, mvx_l)
        return stencil_call2(
            functools.partial(_nearest_kernel, n), list(planes_l),
            n_out=n + 1, halo=HALO, block=BLOCK,
            block_scalars=[base_y, base_x], center_inputs=[mvy_l, mvx_l],
            base_offset=(base_y, base_x), offset_windows=[True] * n,
            origin_offset=origin_offset)

    tree = (list(planes), mv_pix_y, mv_pix_x)
    if mesh is None:
        outs = launch(tree)
    else:
        from ..parallel.sharding import shard_stencil

        outs = shard_stencil(mesh, launch, SHARD_HALO, tree, mv_pix_y.shape[0])
    return list(outs[:n]), outs[n]


def _nearest_multi_kernel(n_planes, n_sets, smem, bsm, wins, centers, outs, origin,
                          scratch):
    i, j = pl.program_id(0), pl.program_id(1)
    for s in range(n_sets):
        mvy = centers[2 * s][:, :]
        mvx = centers[2 * s + 1][:, :]
        base_y, base_x = bsm[2 * s][i, j], bsm[2 * s + 1][i, j]
        qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x)
        ry = jnp.clip(jnp.round(qy), -1.0, 1.0)
        rx = jnp.clip(jnp.round(qx), -1.0, 1.0)
        sels = [(dy, dx, ((ry == dy) & (rx == dx)).astype(jnp.float32))
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        for p in range(n_planes):
            wb = wins[s * n_planes + p]
            acc = jnp.zeros_like(mvy)
            for dy, dx, m in sels:
                acc = acc + wb.tap(dy, dx) * m
            outs[s * (n_planes + 1) + p][:, :] = acc
        outs[s * (n_planes + 1) + n_planes][:, :] = valid


def nearest_resolve_multi(planes, mv_sets, mesh=None):
    """nearest_resolve over SEVERAL motion fields in ONE launch.

    mv_sets: list of (mv_pix_y, mv_pix_x). Each set gets its own per-block DMA base
    (harness2 multi-base support), windows over the same HBM planes. One launch
    replaces len(mv_sets) nearest_resolve calls - the TA specular path uses this for
    the virtual-motion normal + the two prev-prev taps
    (REBLUR_TemporalAccumulation.hlsli:472-608).
    Returns a list of (resolved list, valid) per set."""
    n = len(planes)
    n_sets = len(mv_sets)

    def launch(tree, origin_offset=None):
        planes_l, sets_l = tree
        bases = [rp.block_motion_base(my, mx, BLOCK,
                                      bound=(HALO[0] - 4, HALO[1] - 4))
                 for (my, mx) in sets_l]
        images = [p for _ in range(n_sets) for p in planes_l]
        offset_windows = [s for s in range(n_sets) for _ in planes_l]
        centers = [c for (my, mx) in sets_l for c in (my, mx)]
        block_scalars = [b for pair in bases for b in pair]
        return stencil_call2(
            functools.partial(_nearest_multi_kernel, n, n_sets), images,
            n_out=n_sets * (n + 1), halo=HALO, block=BLOCK,
            block_scalars=block_scalars, center_inputs=centers,
            base_offset=[tuple(b) for b in bases], offset_windows=offset_windows,
            origin_offset=origin_offset)

    tree = (list(planes), [tuple(s) for s in mv_sets])
    if mesh is None:
        outs = launch(tree)
    else:
        from ..parallel.sharding import shard_stencil

        outs = shard_stencil(mesh, launch, SHARD_HALO, tree,
                             mv_sets[0][0].shape[0])
    return [(list(outs[s * (n + 1): s * (n + 1) + n]), outs[s * (n + 1) + n])
            for s in range(n_sets)]


# ---------------------------------------------------------------------------
# reblur_smb_resolve
# ---------------------------------------------------------------------------

_CENTER = ((1, 1), (2, 1), (1, 2), (2, 2))  # (i, j) == kernels.py CENTER_TAPS (tx, ty)
_CORNER = ((0, 0), (3, 0), (0, 3), (3, 3))


class RC:
    """Per-raw-cell resolve weights: CatRom-12 with bilinear-custom fallback.

    The old path selected VALUES per footprint tap per plane (FP.tap = 3
    jnp.where each; ~12 taps x N-planes of ~6 us select chains dominated the
    smb/vmb resolve kernels). Here the per-pixel origin select (my/mx in
    {-1, 0}) moves into per-CELL weight planes built ONCE and shared by every
    plane; a plane then resolves as sum(win.tap(cell) * w_cell) - a ~21-term
    load-fma chain with zero selects. Weight algebra is exact: the footprint
    tap (i, j) lands at raw cell (j-1+sy, i-1+sx), so each cell's weight is the
    mask-weighted sum of the footprint weights that can land there; CatRom row/
    col weights and the in-screen test are separable in raw space, and the
    no-corners rule is the product of the row/col extremity masks.
    """

    def __init__(self, my, mx, fx, fy, occ_w, occ_wsum, allow_catrom, abs_y,
                 abs_x, rect_w, rect_h, use_catrom, cat_extra=None):
        f32 = jnp.float32
        # residual selectors: booleans (fl in {-1, 0}) or one-hot (fl, mask)
        # lists for wider exact capture (see FP)
        if isinstance(my, list):
            masks_y, masks_x = my, mx
        else:
            myf = my.astype(f32)
            mxf = mx.astype(f32)
            masks_y = [(-1, myf), (0, 1.0 - myf)]
            masks_x = [(-1, mxf), (0, 1.0 - mxf)]
        self.masks_y, self.masks_x = masks_y, masks_x
        fl_lo_y = min(a for a, _ in masks_y)
        fl_hi_y = max(a for a, _ in masks_y)
        fl_lo_x = min(b for b, _ in masks_x)
        fl_hi_x = max(b for b, _ in masks_x)
        self.osy = {a: ((abs_y + a >= 0.0) & (abs_y + a < rect_h)).astype(f32)
                    for a in range(fl_lo_y - 1, fl_hi_y + 3)}
        self.osx = {b: ((abs_x + b >= 0.0) & (abs_x + b < rect_w)).astype(f32)
                    for b in range(fl_lo_x - 1, fl_hi_x + 3)}

        self.occ_cells = self.place4(occ_w)
        self.inv_occ = jnp.where(occ_wsum < 1e-4, 0.0,
                                 1.0 / jnp.where(occ_wsum < 1e-4, 1.0, occ_wsum))
        self.occ_cells_n = {ab: w_ * self.inv_occ
                            for ab, w_ in self.occ_cells.items()}
        if not use_catrom:  # performance mode: bilinear everywhere
            self.hist_cells = self.occ_cells_n
            return

        def raw_w(tab, masks):
            # CatRom tap t in 0..3 lands at raw cell fl + t - 1
            out = {}
            for fl, m in masks:
                for t in range(4):
                    a = fl + t - 1
                    out[a] = out.get(a, 0.0) + m * tab[t]
            return out

        def ext_w(masks):
            # footprint rows/cols {0, 3} (dropped-corner extremes) in raw space:
            # cell a is an extremity under fl iff a == fl - 1 or a == fl + 2
            out = {}
            for fl, m in masks:
                for a in (fl - 1, fl + 2):
                    out[a] = out.get(a, 0.0) + m
            return out

        wy = raw_w(_catrom_w(fy), masks_y)
        wx = raw_w(_catrom_w(fx), masks_x)
        ext_y = ext_w(masks_y)
        ext_x = ext_w(masks_x)
        wy_os = {a: wy[a] * self.osy[a] for a in wy}
        if cat_extra is not None:
            wy_os = {a: w_ * cat_extra for a, w_ in wy_os.items()}
        wx_os = {b: wx[b] * self.osx[b] for b in wx}
        cat_cells = {}
        cat_wsum = None
        # range-extreme cells are reachable by exactly one fl pair and are that
        # pair's dropped corner - identically zero, skip statically
        edge_y = (fl_lo_y - 1, fl_hi_y + 2)
        edge_x = (fl_lo_x - 1, fl_hi_x + 2)
        for a in wy_os:
            for b in wx_os:
                if a in edge_y and b in edge_x:
                    continue
                w_ = wy_os[a] * wx_os[b]
                ey = ext_y.get(a)
                ex = ext_x.get(b)
                if ey is not None and ex is not None:
                    w_ = w_ * (1.0 - ey * ex)
                cat_cells[(a, b)] = w_
                cat_wsum = w_ if cat_wsum is None else cat_wsum + w_
        allowf = allow_catrom.astype(f32)
        a_ = jnp.where(jnp.abs(cat_wsum) < 1e-4, 0.0,
                       allowf / jnp.where(jnp.abs(cat_wsum) < 1e-4, 1.0, cat_wsum))
        b_ = (1.0 - allowf) * self.inv_occ
        self.hist_cells = {ab: w_ * a_ for ab, w_ in cat_cells.items()}
        for ab, w_ in self.occ_cells.items():
            self.hist_cells[ab] = self.hist_cells.get(ab, 0.0) + w_ * b_

    def place4(self, w4):
        """Scatter 4 footprint-center weights into their raw residual cells."""
        cells = {}
        for k, (i_, j_) in enumerate(_CENTER):
            for a, wa in self.masks_y:
                for b, wb in self.masks_x:
                    cell = (j_ - 1 + a, i_ - 1 + b)
                    cells[cell] = cells.get(cell, 0.0) + w4[k] * (wa * wb)
        return cells

    @staticmethod
    def resolve(win, cells):
        acc = None
        for (a, b), w_ in cells.items():
            t = win.tap(a, b) * w_
            acc = t if acc is None else acc + t
        return acc

    def resolve_hist(self, win):
        return self.resolve(win, self.hist_cells)

    def resolve_custom(self, win):
        return self.resolve(win, self.occ_cells_n)


def _smb_kernel(n_hist, n_bil, mat_occlusion, use_catrom, smem, bsm, wins, centers,
                outs, origin, scratch):
    """See reblur_smb_resolve for the plane layout."""
    (zp_w, nr0, nr1, mat_w, dacc_w, sacc_w), rest = wins[:6], wins[6:]
    hist_wins = rest[:n_hist]
    bil_wins = rest[n_hist:n_hist + n_bil]
    cnr = rest[n_hist + n_bil:]  # 2 planes of current packed nr (oct x, y)
    (mvy_r, mvx_r, xvz_r, bthr_r, navg_thr_r, mat_c_r) = centers
    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]

    view_z_scale = smem[0]
    denoising_range = smem[1]
    min_material = smem[2]
    rect_w = smem[3]
    rect_h = smem[4]
    p2w = [smem[5 + k] for k in range(9)]  # world_prev_to_world rotation, row-major

    mvy = mvy_r[:, :]
    mvx = mvx_r[:, :]
    xv_prev_z = xvz_r[:, :]
    base_thr = bthr_r[:, :]
    navg_thr = navg_thr_r[:, :]
    mat_center = mat_c_r[:, :]

    bh, bw = mvy.shape
    # Wide capture (VERDICT r2 ask #6 + r4 ask #7), BLOCK-ADAPTIVE: residuals up
    # to 2 px from the block base are captured EXACTLY (fl in {-2..1} one-hot
    # masks through FP/RC - taps land on the true reprojected footprint, so the
    # accum gather follows the true motion track; clipping made the history
    # chain drift (dev-1) px/frame under zoom and freeze accumulation - round-5
    # probe: accum 2.9 vs 6.0 with footprint_quality 0.96). dev in [2, 5)
    # degrades to clipped sampling with confidence tapering 1 -> 0 over
    # dev 2 -> 5; dev >= 5 hard-resets. The exact wide path costs ~2.5x the
    # narrow one (16-way vs 4-way footprint selects; stage-measured 14.4 vs
    # 5.6 ms at 1440p), so the host flags blocks whose max residual exceeds
    # 1 px (bsm[2]) and only those run it: pans/static cameras stay narrow
    # everywhere, zoom/orbit pay exactly where the motion gradient demands.
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x, budget=5.0)
    qdev = jnp.maximum(jnp.abs(qy), jnp.abs(qx))
    wide = bsm[2][i, j] > 0.0

    # n_avg over current 2x2 (lines 70-97), unnormalized / 4
    na_x = jnp.zeros((bh, bw), jnp.float32)
    na_y = jnp.zeros((bh, bw), jnp.float32)
    na_z = jnp.zeros((bh, bw), jnp.float32)
    for dy, dx in ((-1, -1), (-1, 0), (0, -1), (0, 0)):
        ax, ay, az = _decode_oct(cnr[0].tap(dy, dx), cnr[1].tap(dy, dx))
        na_x, na_y, na_z = na_x + ax, na_y + ay, na_z + az
    na_x, na_y, na_z = na_x / 4.0, na_y / 4.0, na_z / 4.0

    def _resolve_body(my, mx, fy, fx, fl_y, fl_x, valid, conf_taper):
        def fp(w):
            return FP(w, my, mx)

        zfp = fp(zp_w)
        z_taps = [[jnp.abs(zfp.tap(i_, j_)) * view_z_scale for i_ in range(4)]
                  for j_ in range(4)]

        # per-tap integer position (for in-screen checks)
        row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
        px = origin[1].astype(jnp.float32) + col
        py = origin[0].astype(jnp.float32) + row
        ox = px + base_x.astype(jnp.float32) + fl_x
        oy = py + base_y.astype(jnp.float32) + fl_y

        def on_screen(i_, j_):
            tx = ox + (i_ - 1)
            ty = oy + (j_ - 1)
            return ((tx >= 0.0) & (tx < rect_w) & (ty >= 0.0) & (ty < rect_h)) \
                .astype(jnp.float32)

        # prev normal average over centre 2x2, z-in-range weighted (lines 178-204)
        nrfp = [fp(w) for w in (nr0, nr1)]
        sx = jnp.zeros((bh, bw), jnp.float32)
        sy_ = jnp.zeros((bh, bw), jnp.float32)
        sz = jnp.zeros((bh, bw), jnp.float32)
        wsum = jnp.zeros((bh, bw), jnp.float32)
        for (i_, j_) in _CENTER:
            w_ = (z_taps[j_][i_] < denoising_range).astype(jnp.float32)
            ax, ay, az = _decode_oct(nrfp[0].tap(i_, j_), nrfp[1].tap(i_, j_))
            sx, sy_, sz = sx + ax * w_, sy_ + ay * w_, sz + az * w_
            wsum = wsum + w_
        inv = 1.0 / jnp.where(wsum == 0.0, 1.0, wsum)
        sx, sy_, sz = sx * inv, sy_ * inv, sz * inv
        # rotate prev->world
        navg_x = p2w[0] * sx + p2w[1] * sy_ + p2w[2] * sz
        navg_y = p2w[3] * sx + p2w[4] * sy_ + p2w[5] * sz
        navg_z = p2w[6] * sx + p2w[7] * sy_ + p2w[8] * sz

        navg_ok = ((navg_x * na_x + navg_y * na_y + navg_z * na_z) > navg_thr) \
            .astype(jnp.float32)

        # quad thresholds with per-centre-tap in-screen (lines 213-245)
        in_s4 = [on_screen(i_, j_) for (i_, j_) in _CENTER]
        quad_thr = [base_thr * navg_ok * valid * in_s4[q] - NRD_EPS for q in range(4)]

        matfp = fp(mat_w) if mat_occlusion else None
        occ = [[None] * 4 for _ in range(4)]
        for j_ in range(4):
            for i_ in range(4):
                q = (1 if i_ >= 2 else 0) + (2 if j_ >= 2 else 0)
                plane_dist = jnp.abs(z_taps[j_][i_] - xv_prev_z)
                o = (plane_dist <= quad_thr[q]).astype(jnp.float32)
                if mat_occlusion:
                    same = (jnp.maximum(mat_center, min_material)
                            == jnp.maximum(matfp.tap(i_, j_), min_material)) \
                        .astype(jnp.float32)
                    o = o * same
                occ[j_][i_] = o

        occ_c = [occ[j_][i_] for (i_, j_) in _CENTER]
        # bilinear custom weights (frac order: (00, 10, 01, 11))
        bw00 = (1.0 - fx) * (1.0 - fy)
        bw10 = fx * (1.0 - fy)
        bw01 = (1.0 - fx) * fy
        bw11 = fx * fy
        bws = [bw00, bw10, bw01, bw11]
        occ_w = [bws[k] * occ_c[k] for k in range(4)]
        occ_wsum = occ_w[0] + occ_w[1] + occ_w[2] + occ_w[3]

        occ12 = sum(occ[j_][i_] for j_ in range(4) for i_ in range(4)
                    if (i_, j_) not in _CORNER)
        allow_catrom = occ12 > 11.5

        fbits = occ_c[0] * 1.0 + occ_c[1] * 2.0 + occ_c[2] * 4.0 + occ_c[3] * 8.0
        # conf_taper^2: the caller sqrt's footprint_raw into footprint_quality, so
        # quality scales linearly with the wide-capture deviation taper
        footprint_raw = (occ_c[0] * bw00 + occ_c[1] * bw10 + occ_c[2] * bw01
                         + occ_c[3] * bw11) * (conf_taper * conf_taper)

        # CatRom-13 with bilinear-custom fallback (Common.hlsli:602-646), per-cell
        # shared weights (see RC): selects built once, each plane = 21 load-fmas
        rc = RC(my, mx, fx, fy, occ_w, occ_wsum, allow_catrom,
                py + base_y.astype(jnp.float32), px + base_x.astype(jnp.float32),
                rect_w, rect_h, use_catrom)
        dacc = rc.resolve_custom(dacc_w)
        sacc = rc.resolve_custom(sacc_w)

        hist_out = [rc.resolve_hist(hw_) for hw_ in hist_wins]
        for bw_ in bil_wins:
            hist_out.append(rc.resolve_custom(bw_))

        k = 0
        for v in hist_out:
            outs[k][:, :] = v
            k += 1
        outs[k][:, :] = dacc; k += 1
        outs[k][:, :] = sacc; k += 1
        outs[k][:, :] = fbits; k += 1
        outs[k][:, :] = footprint_raw; k += 1
        outs[k][:, :] = allow_catrom.astype(jnp.float32); k += 1
        outs[k][:, :] = navg_x; k += 1
        outs[k][:, :] = navg_y; k += 1
        outs[k][:, :] = navg_z; k += 1
        outs[k][:, :] = na_x; k += 1
        outs[k][:, :] = na_y; k += 1
        outs[k][:, :] = na_z; k += 1

    @pl.when(wide)
    def _():
        qyw = jnp.clip(qy, -2.0, 1.999)
        qxw = jnp.clip(qx, -2.0, 1.999)
        fl_y = jnp.floor(qyw)    # {-2, -1, 0, 1}
        fl_x = jnp.floor(qxw)
        my = [(k, (fl_y == k).astype(jnp.float32)) for k in range(-2, 2)]
        mx = [(k, (fl_x == k).astype(jnp.float32)) for k in range(-2, 2)]
        taper = jnp.clip((5.0 - qdev) / 3.0, 0.0, 1.0)
        _resolve_body(my, mx, qyw - fl_y, qxw - fl_x, fl_y, fl_x, valid, taper)

    @pl.when(jnp.logical_not(wide))
    def _():
        # max residual <= 1 px in this block: fl in {-1, 0} captures exactly
        qyn = jnp.clip(qy, -1.0, 0.999)
        qxn = jnp.clip(qx, -1.0, 0.999)
        myb = qyn < 0.0
        mxb = qxn < 0.0
        myf = myb.astype(jnp.float32)
        mxf = mxb.astype(jnp.float32)
        my = [(-1, myf), (0, 1.0 - myf)]
        mx = [(-1, mxf), (0, 1.0 - mxf)]
        fl_y = -myf
        fl_x = -mxf
        taper = jnp.clip(2.0 - qdev, 0.0, 1.0)
        _resolve_body(my, mx, qyn - fl_y, qxn - fl_x, fl_y, fl_x, valid, taper)


def reblur_smb_resolve(sc, dc, config, *, mv_pix_y, mv_pix_x, xv_prev_z, base_threshold,
                       navg_thr, material_id_center, nr_cur_packed, prev_view_z,
                       prev_nr_packed, prev_mat, diff_accum, spec_accum, hist_planes,
                       bil_planes=(), use_catrom=True, mesh=None):
    """Surface-motion footprint resolve (TA lines 131-305 + sample_history).

    hist_planes: (H, W) planes sampled CatRom-13-with-bilinear-custom-fallback
    (sample_history); bil_planes: planes sampled bilinear-custom only (fast histories,
    sample_history_bilinear). Returns dict(hist=[...], bil=[...], diff/spec_accum_speed,
    fbits, footprint_raw, allow_catrom, smb_navg)."""
    if "spec_min_material" in dc and "diff_min_material" in dc:
        min_material = jnp.minimum(dc["spec_min_material"], dc["diff_min_material"])
    elif "diff_min_material" in dc:
        min_material = dc["diff_min_material"]
    elif "spec_min_material" in dc:
        min_material = dc["spec_min_material"]
    else:
        min_material = jnp.float32(0.0)
    scalars = jnp.concatenate([
        jnp.stack([jnp.asarray(sc["view_z_scale"], jnp.float32),
                   jnp.asarray(sc["denoising_range"], jnp.float32),
                   jnp.asarray(min_material, jnp.float32),
                   jnp.asarray(sc["rect_size_prev"][0], jnp.float32),
                   jnp.asarray(sc["rect_size_prev"][1], jnp.float32)]),
        jnp.asarray(sc["world_prev_to_world"])[:3, :3].reshape(-1).astype(jnp.float32),
    ])
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    n_hist = len(hist_planes)
    n_bil = len(bil_planes)
    # geometry windows ride bf16 (oct-encoded normals are 10-bit unorm at heart,
    # accum speeds are small ints - both exact enough at bf16); viewZ and the
    # radiance history planes (temporal feedback) stay f32
    bf = lambda x: x.astype(jnp.bfloat16)
    windows = ([prev_view_z] + [bf(p) for p in _split(prev_nr_packed)[:2]]
               + [bf(prev_mat), bf(diff_accum), bf(spec_accum)]
               + list(hist_planes) + list(bil_planes)
               + [bf(p) for p in _split(nr_cur_packed)[:2]])
    centers = [mv_pix_y, mv_pix_x, xv_prev_z, base_threshold, navg_thr,
               material_id_center]
    n_out = n_hist + n_bil + 11

    def launch(tree, origin_offset=None):
        windows_l, centers_l, scalars_l = tree
        base_y, base_x = _prep(sc, centers_l[0], centers_l[1])
        wide_b = rp.block_wide_flag(centers_l[0], centers_l[1], base_y, base_x,
                                    BLOCK, HALO)
        return stencil_call2(
            functools.partial(_smb_kernel, n_hist, n_bil, mat_occ, use_catrom),
            windows_l, n_out=n_out, halo=HALO, block=BLOCK,
            scalars=scalars_l, block_scalars=[base_y, base_x, wide_b],
            center_inputs=centers_l, base_offset=(base_y, base_x),
            offset_windows=[True] * (len(windows_l) - 2) + [False, False],
            origin_offset=origin_offset)

    tree = (windows, centers, scalars)
    if mesh is None:
        outs = launch(tree)
    else:
        from ..parallel.sharding import shard_stencil

        outs = shard_stencil(mesh, launch, SHARD_HALO, tree,
                             prev_view_z.shape[0])
    res = dict(hist=list(outs[:n_hist]), bil=list(outs[n_hist:n_hist + n_bil]))
    (res["diff_accum_speed"], res["spec_accum_speed"], res["fbits"],
     res["footprint_raw"], res["allow_catrom"], nx, ny, nz,
     cx, cy, cz) = outs[n_hist + n_bil:]
    res["smb_navg"] = jnp.stack([nx, ny, nz], -1)
    res["n_avg"] = jnp.stack([cx, cy, cz], -1)
    return res


# ---------------------------------------------------------------------------
# reblur_vmb_resolve
# ---------------------------------------------------------------------------


def _smooth01(x):
    t = jnp.clip(x, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _vmb_kernel(mat_occlusion, n_sh, use_catrom, smem, bsm, wins, centers, outs,
                origin, scratch):
    (zp_w, rough_w, mat_w, sacc_w, h0, h1, h2, h3, fast_w, hdtp_w) = wins[:10]
    sh_ws = wins[10:10 + n_sh]
    (mvy_r, mvx_r, noxc_r, thr_r, n0_r, n1_r, n2_r, v0_r, v1_r, v2_r,
     ra_r, rb_r, sig_r, psm_r, mat_c_r, smbcat_r) = centers
    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]

    view_z_scale = smem[0]
    ortho_mode = smem[1]
    min_material = smem[2]
    rect_w = smem[3]
    rect_h = smem[4]

    mvy = mvy_r[:, :]
    mvx = mvx_r[:, :]
    nox_curr = noxc_r[:, :]
    vmb_thr = thr_r[:, :]
    nx_, ny_, nz_ = n0_r[:, :], n1_r[:, :], n2_r[:, :]
    vx_, vy_, vz_ = v0_r[:, :], v1_r[:, :], v2_r[:, :]
    ra = ra_r[:, :]
    rb = rb_r[:, :]
    sigma = sig_r[:, :]
    parallax_sm = psm_r[:, :]
    mat_center = mat_c_r[:, :]
    smb_catrom = smbcat_r[:, :]

    bh, bw = mvy.shape
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x)
    qy = jnp.clip(qy, -1.0, 0.999)
    qx = jnp.clip(qx, -1.0, 0.999)
    my = qy < 0.0
    mx = qx < 0.0
    fy = qy - jnp.where(my, -1.0, 0.0)
    fx = qx - jnp.where(mx, -1.0, 0.0)

    def fp(w):
        return FP(w, my, mx)

    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    px = origin[1].astype(jnp.float32) + col
    py = origin[0].astype(jnp.float32) + row
    ox = px + base_x.astype(jnp.float32) + jnp.where(mx, -1.0, 0.0)
    oy = py + base_y.astype(jnp.float32) + jnp.where(my, -1.0, 0.0)

    def on_screen(i_, j_):
        tx = ox + (i_ - 1)
        ty = oy + (j_ - 1)
        return ((tx >= 0.0) & (tx < rect_w) & (ty >= 0.0) & (ty < rect_h)) \
            .astype(jnp.float32)

    zfp = fp(zp_w)
    rfp = fp(rough_w)
    matfp = fp(mat_w) if mat_occlusion else None

    occ_c = []
    for k, (i_, j_) in enumerate(_CENTER):
        z_t = jnp.abs(zfp.tap(i_, j_)) * view_z_scale
        zscale = jnp.where(ortho_mode == 0.0, z_t, ortho_mode)
        nox_prev = (nx_ * vx_ + ny_ * vy_) * zscale + nz_ * vz_ * z_t
        plane_dist = jnp.abs(nox_prev - nox_curr)
        thr = vmb_thr * on_screen(i_, j_) * valid - NRD_EPS
        o = (plane_dist <= thr).astype(jnp.float32)
        # roughness weight (TA :459-470): relaxed non-exponential weight with sigma
        r_t = rfp.tap(i_, j_)
        rw = _smooth01((1.0 - (jnp.abs(r_t * r_t * ra + rb) - sigma * ra)) / 1.0)
        rw = jnp.clip(rw, 0.0, 1.0)
        rw = parallax_sm + (1.0 - parallax_sm) * rw
        o = o * (rw >= 0.5).astype(jnp.float32)
        if mat_occlusion:
            same = (jnp.maximum(mat_center, min_material)
                    == jnp.maximum(matfp.tap(i_, j_), min_material)).astype(jnp.float32)
            o = o * same
        occ_c.append((o, rw))

    bw00 = (1.0 - fx) * (1.0 - fy)
    bw10 = fx * (1.0 - fy)
    bw01 = (1.0 - fx) * fy
    bw11 = fx * fy
    bws = [bw00, bw10, bw01, bw11]

    rough_conf = sum(occ_w_r[1] * bws[k] for k, occ_w_r in enumerate(occ_c))

    occ4 = [o for o, _ in occ_c]
    occ_w = [bws[k] * occ4[k] for k in range(4)]
    occ_wsum = occ_w[0] + occ_w[1] + occ_w[2] + occ_w[3]
    fbits_vmb = occ4[0] * 16.0 + occ4[1] * 32.0 + occ4[2] * 64.0 + occ4[3] * 128.0
    fp_raw = sum(occ4[k] * bws[k] for k in range(4))
    occ_sum = occ4[0] + occ4[1] + occ4[2] + occ4[3]
    allow_catrom = (occ_sum > 3.5) & (smb_catrom > 0.5)

    rc = RC(my, mx, fx, fy, occ_w, occ_wsum, allow_catrom,
            py + base_y.astype(jnp.float32), px + base_x.astype(jnp.float32),
            rect_w, rect_h, use_catrom)
    sacc = rc.resolve_custom(sacc_w)
    hist_out = [rc.resolve_hist(hw_) for hw_ in (h0, h1, h2, h3)]
    fast = rc.resolve_custom(fast_w)

    # plain bilinear (no occlusion) for prev hit-dist-for-tracking (TA :561)
    pb_cells = rc.place4(bws)
    pb_cells = {(a, b): w_ * rc.osy[a] * rc.osx[b] for (a, b), w_ in pb_cells.items()}
    pws = functools.reduce(lambda x, y: x + y, pb_cells.values())
    hdt_acc = RC.resolve(hdtp_w, pb_cells)
    hdtp = jnp.where(pws < 1e-4, 0.0, hdt_acc / jnp.where(pws < 1e-4, 1.0, pws))

    k = 0
    for v in hist_out:
        outs[k][:, :] = v; k += 1
    outs[k][:, :] = fast; k += 1
    outs[k][:, :] = sacc; k += 1
    outs[k][:, :] = fbits_vmb; k += 1
    outs[k][:, :] = fp_raw; k += 1
    outs[k][:, :] = allow_catrom.astype(jnp.float32); k += 1
    outs[k][:, :] = rough_conf; k += 1
    outs[k][:, :] = hdtp; k += 1
    for sw in sh_ws:  # SH history: occlusion-weighted bilinear (TA SH sample :708)
        outs[k][:, :] = rc.resolve_custom(sw); k += 1


def reblur_vmb_resolve(sc, dc, config, *, mv_pix_y, mv_pix_x, nox_curr, vmb_thr,
                       n, vmb_v, ra, rb, roughness_sigma, parallax_sm,
                       material_id_center, smb_allow_catrom, prev_view_z,
                       prev_nr_packed, prev_mat, spec_accum, spec_hist4, spec_fast,
                       prev_hdt, sh_hist4=None, use_catrom=True, mesh=None):
    """Virtual-motion footprint resolve (TA lines 459-530 + history samples :708, :561).

    vmb_thr: the per-pixel threshold with all elementwise factors already applied
    (disocclusion base, NoV lerp, vmb_n dot tests). Returns dict(spec_hist (h,w,4),
    spec_fast, spec_accum_speed_raw, fbits_vmb, footprint_raw, allow_catrom,
    rough_conf, hdt_prev)."""
    min_material = dc.get("spec_min_material", jnp.float32(0.0))
    scalars = jnp.stack([
        jnp.asarray(sc["view_z_scale"], jnp.float32),
        jnp.asarray(sc["ortho_mode"], jnp.float32),
        jnp.asarray(min_material, jnp.float32),
        jnp.asarray(sc["rect_size_prev"][0], jnp.float32),
        jnp.asarray(sc["rect_size_prev"][1], jnp.float32),
    ])
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"

    n_sh = 0 if sh_hist4 is None else 4
    bf = lambda x: x.astype(jnp.bfloat16)
    windows = ([prev_view_z, bf(_split(prev_nr_packed)[2]), bf(prev_mat),
                bf(spec_accum)]
               + _split(spec_hist4)[:4] + [spec_fast, prev_hdt]
               + (_split(sh_hist4)[:4] if n_sh else []))
    centers = [mv_pix_y, mv_pix_x, nox_curr, vmb_thr,
               n[..., 0], n[..., 1], n[..., 2],
               vmb_v[..., 0], vmb_v[..., 1], vmb_v[..., 2],
               ra, rb, roughness_sigma, parallax_sm, material_id_center,
               smb_allow_catrom]

    def launch(tree, origin_offset=None):
        windows_l, centers_l, scalars_l = tree
        base_y, base_x = _prep(sc, centers_l[0], centers_l[1])
        return stencil_call2(
            functools.partial(_vmb_kernel, mat_occ, n_sh, use_catrom),
            windows_l, n_out=11 + n_sh, halo=HALO, block=BLOCK,
            scalars=scalars_l, block_scalars=[base_y, base_x],
            center_inputs=centers_l, base_offset=(base_y, base_x),
            offset_windows=[True] * len(windows_l),
            origin_offset=origin_offset)

    outs = _launch_or_shard(launch, (windows, centers, scalars),
                            mv_pix_y.shape[0], mesh)
    res = dict(spec_hist=jnp.stack(outs[:4], -1), spec_fast=outs[4],
               spec_accum_speed_raw=outs[5], fbits_vmb=outs[6],
               footprint_raw=outs[7], allow_catrom=outs[8], rough_conf=outs[9],
               hdt_prev=outs[10])
    if n_sh:
        res["sh"] = jnp.stack(outs[11:15], -1)
    return res


# ---------------------------------------------------------------------------
# small stencil utilities (replace XLA pad+slice shifts, ~17 ms each at 1440p)
# ---------------------------------------------------------------------------


def _shift_kernel(offsets, n_planes, smem, bsm, wins, centers, outs, origin, scratch):
    k = 0
    for p in range(n_planes):
        for dy, dx in offsets:
            outs[k][:, :] = wins[p].tap(dy, dx)
            k += 1


def shift_planes(planes, offsets, mesh=None):
    """planes at static integer offsets: out[p][o][y, x] = planes[p][y+dy, x+dx].

    Border pixels read edge-clamped values on the padded fallback path and wrapped values
    on the no-pad path (masked by callers' in-screen tests where it matters)."""
    n = len(planes)

    def launch(planes_l, origin_offset=None):
        return stencil_call2(
            functools.partial(_shift_kernel, tuple(offsets), n), list(planes_l),
            n_out=n * len(offsets), halo=(8, 128), block=BLOCK,
            origin_offset=origin_offset)

    outs = _launch_or_shard(launch, list(planes), planes[0].shape[0], mesh,
                            halo_rows=8)
    return [list(outs[p * len(offsets):(p + 1) * len(offsets)]) for p in range(n)]


def _spec_prelude_kernel(smem, bsm, wins, centers, outs, origin, scratch):
    hdt_w, rough_w = wins
    hdt_min = hdt_w.tap()
    m1 = jnp.zeros_like(hdt_min)
    m2 = jnp.zeros_like(hdt_min)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            hdt_min = jnp.minimum(hdt_min, hdt_w.tap(dy, dx))
            rsq = rough_w.tap(dy, dx)
            rsq = rsq * rsq
            m1 = m1 + rsq
            m2 = m2 + rsq * rsq
    outs[0][:, :] = hdt_min
    outs[1][:, :] = m1 / 9.0
    outs[2][:, :] = m2 / 9.0


def spec_prelude(hdt_src, roughness, mesh=None):
    """3x3 min hit-dist-for-tracking + roughness^2 moments (spec TA lines 62-111).

    hdt_src: hit dist with zeros already replaced by +inf (XLA side); roughness decoded."""

    def launch(tree, origin_offset=None):
        return stencil_call2(_spec_prelude_kernel, list(tree),
                             n_out=3, halo=(8, 128), block=BLOCK,
                             origin_offset=origin_offset)

    outs = _launch_or_shard(launch, [hdt_src, roughness], hdt_src.shape[0],
                            mesh, halo_rows=8)
    return outs[0], outs[1], outs[2]


def _spec_ta_head_kernel(smem, bsm, wins, centers, outs, origin, scratch):
    """Fused TA-specular head: 3x3 prelude + nr edge shifts + high-parallax nearest.

    Replaces spec_prelude + shift_planes + nearest_resolve (3 launches, each with
    a ~1.2 ms dispatch/DMA floor at 1440p) with ONE launch sharing a DMA batch.
    Per-piece formulas are unchanged (see the three standalone kernels above)."""
    hdt_w, rough_w, nr0_w, nr1_w, vzo_w, nr0o_w, nr1o_w = wins
    # ---- prelude: 3x3 min hitDist + roughness^2 moments (TA lines 62-111) ----
    hdt_min = hdt_w.tap()
    m1 = jnp.zeros_like(hdt_min)
    m2 = jnp.zeros_like(hdt_min)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            hdt_min = jnp.minimum(hdt_min, hdt_w.tap(dy, dx))
            rsq = rough_w.tap(dy, dx)
            rsq = rsq * rsq
            m1 = m1 + rsq
            m2 = m2 + rsq * rsq
    outs[0][:, :] = hdt_min
    outs[1][:, :] = m1 / 9.0
    outs[2][:, :] = m2 / 9.0
    # ---- curvature edge shifts: nr planes at (0, 1) and (1, 0) ----
    k = 3
    for w_ in (nr0_w, nr1_w):
        for dy, dx in ((0, 1), (1, 0)):
            outs[k][:, :] = w_.tap(dy, dx)
            k += 1
    # ---- nearest at the high-parallax uv (motion base + residual select) ----
    mvy = centers[0][:, :]
    mvx = centers[1][:, :]
    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x)
    ry = jnp.clip(jnp.round(qy), -1.0, 1.0)
    rx = jnp.clip(jnp.round(qx), -1.0, 1.0)
    sels = [(dy, dx, ((ry == dy) & (rx == dx)).astype(jnp.float32))
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for p, wb in enumerate((vzo_w, nr0o_w, nr1o_w)):
        acc = jnp.zeros_like(mvy)
        for dy, dx, m in sels:
            acc = acc + wb.tap(dy, dx) * m
        outs[k + p][:, :] = acc
    outs[k + 3][:, :] = valid


def spec_ta_head(hdt_src, roughness, nr0, nr1, view_z_raw, mv_pix_y, mv_pix_x,
                 mesh=None):
    """Fused spec-TA head launch (see _spec_ta_head_kernel).

    Returns (hdt_min, rough_m1, rough_m2,
             [nr0@(0,1), nr0@(1,0), nr1@(0,1), nr1@(1,0)],
             (z_high, nh0, nh1), high_valid)."""

    def launch(tree, origin_offset=None):
        hdt_l, rough_l, nr0_l, nr1_l, vz_l, mvy_l, mvx_l = tree
        base_y, base_x = _prep(None, mvy_l, mvx_l)
        return stencil_call2(
            _spec_ta_head_kernel,
            [hdt_l, rough_l, nr0_l, nr1_l, vz_l, nr0_l, nr1_l],
            n_out=11, halo=HALO, block=BLOCK,
            block_scalars=[base_y, base_x], center_inputs=[mvy_l, mvx_l],
            base_offset=(base_y, base_x),
            offset_windows=[None, None, None, None, True, True, True],
            origin_offset=origin_offset)

    tree = (hdt_src, roughness, nr0, nr1, view_z_raw, mv_pix_y, mv_pix_x)
    outs = _launch_or_shard(launch, tree, hdt_src.shape[0], mesh)
    return (outs[0], outs[1], outs[2], list(outs[3:7]),
            (outs[7], outs[8], outs[9]), outs[10])


# ---------------------------------------------------------------------------
# sampler object consumed by passes/reblur/kernels.py (sampler=... parameters)
# ---------------------------------------------------------------------------


class PallasSampler:
    """Gather backend passed into the REBLUR XLA kernels on the Pallas path.

    mesh: optional jax.sharding.Mesh - every gather launch then runs row-sharded
    via shard_map + ring halo exchange (parallel/sharding.shard_stencil), making
    the full TA bundle the production multi-chip path (VERDICT r3 ask #4)."""

    def __init__(self, sc, mesh=None):
        self.sc = sc
        self.mesh = mesh

    def _mv_pix(self, uv_target, rect_cur=False):
        h, w = uv_target.shape[:2]
        rect_prev = jnp.asarray([w, h], jnp.float32) if rect_cur \
            else self.sc["rect_size_prev"]
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        mvx = uv_target[..., 0] * rect_prev[0] - jnp.broadcast_to(xs, (h, w))
        mvy = uv_target[..., 1] * rect_prev[1] - jnp.broadcast_to(ys, (h, w))
        return mvy, mvx

    def spec_prelude(self, hdt_src, roughness):
        return spec_prelude(hdt_src, roughness, mesh=self.mesh)

    def ta_head(self, hdt_src, roughness, normal_roughness, view_z_raw, uv_high):
        """Fused prelude + nr shifts + high-parallax nearest (one launch)."""
        mvy, mvx = self._mv_pix(uv_high, rect_cur=True)
        return spec_ta_head(hdt_src, roughness, normal_roughness[..., 0],
                            normal_roughness[..., 1], view_z_raw, mvy, mvx,
                            mesh=self.mesh)

    def shift(self, planes, offsets):
        return shift_planes(planes, offsets, mesh=self.mesh)

    def nearest(self, planes, uv_target, rect_cur=False):
        mvy, mvx = self._mv_pix(uv_target, rect_cur)
        return nearest_resolve(planes, mvy, mvx, mesh=self.mesh)

    def nearest_multi(self, planes, uv_targets, rect_cur=False):
        """One launch resolving `planes` at several reprojected uv fields."""
        sets = [self._mv_pix(uv, rect_cur) for uv in uv_targets]
        return nearest_resolve_multi(planes, sets, mesh=self.mesh)

    def vmb_bundle(self, sc, dc, config, **kw):
        return reblur_vmb_resolve(sc, dc, config, mesh=self.mesh, **kw)


# ---------------------------------------------------------------------------
# Poisson spatial filter (REBLUR_Common_{Diffuse,Specular}SpatialFilter.hlsli tap loop)
# ---------------------------------------------------------------------------

RADIUS_LEVELS = (1.0, 3.0, 8.0, 17.0, 32.0)

# SMEM layout for the blur kernel
_B_DIRS = 0      # 16: 8 rotated unit dirs (x, y)
_B_FRUSTUM = 16  # 4
_B_MISC = 20     # view_z_scale, rect_w, rect_h, ortho, min_material, use_prepass, eps pad
_B_HDP = 27      # 4: hit dist params
_B_TOTAL = 31


def _level_weights_blur(radius):
    levels = RADIUS_LEVELS
    ws = []
    r = jnp.clip(radius, levels[0], levels[-1])
    for i, lv in enumerate(levels):
        lo = levels[i - 1] if i > 0 else levels[0]
        hi = levels[i + 1] if i + 1 < len(levels) else levels[-1]
        up = jnp.clip((r - lo) / max(lv - lo, 1e-6), 0.0, 1.0) if i > 0 \
            else jnp.ones_like(r)
        dn = jnp.clip((hi - r) / max(hi - lv, 1e-6), 0.0, 1.0) \
            if i + 1 < len(levels) else jnp.ones_like(r)
        ws.append(up * dn)
    return ws


def _acos_approx(x):
    x = jnp.clip(x, -1.0, 1.0)
    res = jnp.sqrt(jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)) * (np.pi / 2.0)
    return jnp.where(x >= 0.0, res, np.pi - res)


def _sstep10(x):
    """smoothstep(1, 0, x)."""
    t = jnp.clip(1.0 - x, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _exp_w(x):
    """ComputeExponentialWeight: exp(-3|x|) via the hardware transcendental unit.

    Matches math.compute_exponential_weight (true exp instead of the reference's
    rational ExpApprox - see that docstring for the divergence rationale)."""
    return jnp.exp(-3.0 * jnp.abs(x))


def _blur_kernel(c, has_sh, spec, prepass, mat_occ, rough_sq, smem, bsm, wins, centers,
                 outs, origin):
    zw = wins[0]
    nr = wins[1:5]
    sig = wins[5:5 + c]
    shw = wins[5 + c:5 + c + (3 if has_sh else 0)]
    ci = iter(centers)
    radius_r = next(ci); ga_r = next(ci); gb_r = next(ci); nwp_r = next(ci)
    ha_r = next(ci); hb_r = next(ci); mhdw_r = next(ci); mat_r = next(ci)
    n_r = [next(ci) for _ in range(3)]
    nv_r = [next(ci) for _ in range(3)]
    if spec:
        wra_r = next(ci); wrb_r = next(ci)
    if prepass:
        hd_r = next(ci); rough_r = next(ci)
        rnd_r = [next(ci) for _ in range(8)]

    view_z_scale = smem[_B_MISC]
    rect_w = smem[_B_MISC + 1]
    rect_h = smem[_B_MISC + 2]
    ortho = smem[_B_MISC + 3]
    min_material = smem[_B_MISC + 4]
    use_prepass = smem[_B_MISC + 5]
    fx0, fy0, fdx, fdy = (smem[_B_FRUSTUM], smem[_B_FRUSTUM + 1],
                          smem[_B_FRUSTUM + 2], smem[_B_FRUSTUM + 3])
    hdp = [smem[_B_HDP + k] for k in range(4)]

    bh, bw = radius_r.shape[:2]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (origin[1].astype(jnp.float32) + col + 0.5) * inv_w
    v = (origin[0].astype(jnp.float32) + row + 0.5) * inv_h

    def view_pos(uu, vv, zz):
        s = zz + (1.0 - zz) * jnp.abs(ortho)
        return (uu * fdx + fx0) * s, (vv * fdy + fy0) * s, zz

    radius = radius_r[:, :]
    ga = ga_r[:, :]; gb = gb_r[:, :]
    nwp = nwp_r[:, :]; ha = ha_r[:, :]; hb = hb_r[:, :]
    mhdw = mhdw_r[:, :]
    mat_c = mat_r[:, :]
    ncx, ncy, ncz = n_r[0][:, :], n_r[1][:, :], n_r[2][:, :]
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    if spec:
        wra = wra_r[:, :]; wrb = wrb_r[:, :]
    if prepass:
        hit_dist_c = hd_r[:, :]
        rough_c = rough_r[:, :]
        rough_term = jnp.clip((rough_c - 0.5) / 0.5, 0.0, 1.0)  # linearstep(.5,1,r)

    view_z = jnp.abs(zw.tap()) * view_z_scale
    xvx, xvy, xvz = view_pos(u, v, view_z)

    lw_all = _level_weights_blur(radius)
    gauss = [float(np.exp(-0.66 * t[2] * t[2])) for t in nm.SPECIAL_8]

    sum_ = jnp.ones((bh, bw), jnp.float32)
    acc = [sg.tap() for sg in sig]
    acc_sh = [sw.tap() for sw in shw] if has_sh else None
    hdt = None
    if prepass:
        hdt = jnp.where(hit_dist_c == 0.0, jnp.float32(NRD_INF), hit_dist_c)

    for k in range(8):
        dir_x = smem[_B_DIRS + 2 * k]
        dir_y = smem[_B_DIRS + 2 * k + 1]
        for li, lv in enumerate(RADIUS_LEVELS):
            off_x = jnp.clip(jnp.round(dir_x * lv).astype(jnp.int32), -32, 32)
            off_y = jnp.clip(jnp.round(dir_y * lv).astype(jnp.int32), -32, 32)

            zs = jnp.abs(zw.tap_dyn(off_y, off_x)) * view_z_scale
            n0 = nr[0].tap_dyn(off_y, off_x)
            n1 = nr[1].tap_dyn(off_y, off_x)
            rs_raw = nr[2].tap_dyn(off_y, off_x)
            rs = rs_raw * rs_raw if rough_sq == 1 else (
                jnp.sqrt(jnp.clip(rs_raw, 0.0, 1.0)) if rough_sq == 2 else rs_raw)
            nsx, nsy, nsz = _decode_oct(n0, n1)

            us = u + off_x.astype(jnp.float32) * inv_w
            vs = v + off_y.astype(jnp.float32) * inv_h
            angle = _acos_approx(ncx * nsx + ncy * nsy + ncz * nsz)
            sx, sy, sz = view_pos(us, vs, zs)
            w_ = ((us > 0.0) & (us < 1.0) & (vs > 0.0) & (vs < 1.0)).astype(jnp.float32)
            w_ = w_ * _sstep10(jnp.abs((nvx * sx + nvy * sy + nvz * sz) * ga + gb))
            if mat_occ:
                ms = nr[3].tap_dyn(off_y, off_x)
                w_ = w_ * (jnp.maximum(mat_c, min_material)
                           == jnp.maximum(ms, min_material)).astype(jnp.float32)
            w_ = w_ * _sstep10(jnp.abs(angle * nwp))
            if spec:
                w_ = w_ * _sstep10(jnp.abs(rs * wra + wrb))

            s_taps = [sg.tap_dyn(off_y, off_x) for sg in sig]
            s_taps = [jnp.where(w_ == 0.0, 0.0, st) for st in s_taps]
            s_hd = s_taps[-1]

            if prepass:
                hdn_s = (hdp[0] + zs * hdp[1]) * (
                    1.0 + (hdp[2] - 1.0) * jnp.clip(jnp.exp2(hdp[3] * rs * rs), 0.0, 1.0))
                hs = s_hd * hdn_s
                dx_ = sx - xvx
                dy_ = sy - xvy
                dz_ = sz - xvz
                d = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_) + NRD_EPS
                gw = w_ * jnp.clip(hs / d, 0.0, 1.0)
                take = (rnd_r[k][:, :] < gw) & (hs > 0.0)
                hdt = jnp.where(take, jnp.minimum(hdt, hs), hdt)
                w_ = w_ * use_prepass
                t = hs / (d + hit_dist_c)
                w_ = w_ * (jnp.clip(t, 0.0, 1.0)
                           + (1.0 - jnp.clip(t, 0.0, 1.0)) * rough_term)

            w_ = w_ * (mhdw + (1.0 - mhdw) * _exp_w(s_hd * ha + hb))
            w_ = w_ * gauss[k] * lw_all[li]

            sum_ = sum_ + w_
            acc = [a + st * w_ for a, st in zip(acc, s_taps)]
            if has_sh:
                sh_taps = [sw.tap_dyn(off_y, off_x) for sw in shw]
                acc_sh = [a + jnp.where(w_ == 0.0, 0.0, st) * w_
                          for a, st in zip(acc_sh, sh_taps)]

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    k_ = 0
    for a in acc:
        outs[k_][:, :] = a * inv
        k_ += 1
    if has_sh:
        for a in acc_sh:
            outs[k_][:, :] = a * inv
            k_ += 1
    if prepass:
        outs[k_][:, :] = jnp.where(hdt >= jnp.float32(NRD_INF), 0.0, hdt)


def spatial_filter_taps_pallas(sc, dc, config, *, rotator, signal, sh, view_z_in,
                               normal_roughness, blur_radius, ga, gb,
                               normal_weight_param, ha, hb, min_hit_dist_weight,
                               material_id, n, nv, wr_a=None, wr_b=None,
                               hit_dist=None, roughness=None, rnd8=None,
                               spec=False, prepass=False, perf_mode=False):
    """The Poisson tap loop of the REBLUR spatial filters on Pallas.

    All per-pixel weight parameters arrive as planes (computed by the XLA caller with the
    exact reference formulas). Divergences (documented): per-pixel radius quantized to
    RADIUS_LEVELS with hat blending; the per-axis skew is folded into the scalar radius;
    taps snap to integer offsets of the rotated unit directions (the reference snaps to
    pixel centers of continuously-scaled offsets).
    Returns (signal_out (h,w,c), sh_out or None, hit_dist_for_tracking or None)."""
    c = signal.shape[-1]
    has_sh = sh is not None
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    rough_sq = {"SQRT_LINEAR": 1, "SQ_LINEAR": 2}.get(config.roughness_encoding.name, 0)

    dirs = []
    for tap in nm.SPECIAL_8:
        dirs.append(nm.rotate_vector2(jnp.asarray(rotator), jnp.asarray(tap[:2])))
    dirs = jnp.stack(dirs).reshape(-1)
    misc = jnp.stack([
        jnp.asarray(sc["view_z_scale"], jnp.float32),
        jnp.asarray(sc["rect_size"][0], jnp.float32),
        jnp.asarray(sc["rect_size"][1], jnp.float32),
        jnp.asarray(sc["ortho_mode"], jnp.float32),
        jnp.asarray(dc.get("spec_min_material" if spec else "diff_min_material", 0.0),
                    jnp.float32),
        jnp.asarray(dc.get("use_prepass_not_only_for_specular_motion_estimation", 1.0),
                    jnp.float32),
        jnp.float32(0.0),
    ])
    scalars = jnp.concatenate([dirs, jnp.asarray(sc["frustum"], jnp.float32), misc,
                               jnp.asarray(dc["hit_dist_params"], jnp.float32)])

    windows = ([view_z_in] + _split(normal_roughness)[:4] + _split(signal)[:c]
               + (_split(sh)[:3] if has_sh else []))
    centers = [blur_radius, ga, gb, normal_weight_param, ha, hb, min_hit_dist_weight,
               material_id, n[..., 0], n[..., 1], n[..., 2],
               nv[..., 0], nv[..., 1], nv[..., 2]]
    if spec:
        centers += [wr_a, wr_b]
    if prepass:
        centers += [hit_dist, roughness] + list(rnd8)

    n_out = c + (3 if has_sh else 0) + (1 if prepass else 0)
    wdt = None  # bf16 windows blocked: Mosaic dynamic_rotate is 32-bit only
    outs = stencil_call(
        functools.partial(_blur_kernel, c, has_sh, spec, prepass, mat_occ, rough_sq),
        windows, n_windows=len(windows), n_out=n_out, halo=HALO, block=BLOCK,
        scalars=scalars, center_inputs=centers, window_dtypes=wdt)
    sig_out = jnp.stack(outs[:c], -1)
    k = c
    sh_out = None
    if has_sh:
        sh_out = jnp.concatenate([jnp.stack(outs[k:k + 3], -1), sh[..., 3:]], -1)
        k += 3
    hdt = outs[k] if prepass else None
    return sig_out, sh_out, hdt


# ---------------------------------------------------------------------------
# HistoryFix taps + fast-history stencils (REBLUR_HistoryFix.hlsli)
# ---------------------------------------------------------------------------

# Reachable strides are floor(historyFixBasePixelStride / (2 + frame_num)), i.e. at
# most base/2 = 7 px at the default base of 14 (REBLUR_HistoryFix.hlsli stride math,
# passes/reblur/kernels.py:544) - the old (1, 2, 4, 8, 14) table spent two lattice
# instantiations on levels that never fire at defaults (14) or overshoot (8 for
# stride 7), and every instantiated level is issued PREDICATED on all blocks (Mosaic
# lowers pl.when over vector code to masked issue, ~half a live body's cost - see
# bench_tap.py "5x same body"). Three levels match the actual stride set better and
# cut the ladder's issued code by 40%. Bases > 14 quantize to the 7-px lattice
# (documented divergence; the XLA path keeps continuous strides).
STRIDE_LEVELS = (1.0, 3.0, 7.0)


def _stride_weights(stride):
    levels = STRIDE_LEVELS
    ws = []
    r = jnp.clip(stride, levels[0], levels[-1])
    for i, lv in enumerate(levels):
        lo = levels[i - 1] if i > 0 else levels[0]
        hi = levels[i + 1] if i + 1 < len(levels) else levels[-1]
        up = jnp.clip((r - lo) / max(lv - lo, 1e-6), 0.0, 1.0) if i > 0 \
            else jnp.ones_like(r)
        dn = jnp.clip((hi - r) / max(hi - lv, 1e-6), 0.0, 1.0) \
            if i + 1 < len(levels) else jnp.ones_like(r)
        ws.append(up * dn)
    return ws


def _hfix_kernel(c, has_sh, is_diffuse, mat_occ, rough_sq, anti_firefly, smem, bsm,
                 wins, centers, outs, origin):
    zw = wins[0]
    nr = wins[1:5]
    sig = wins[5:5 + c]
    d1w = wins[5 + c]
    fastw = wins[6 + c]
    shw = wins[7 + c:7 + c + (3 if has_sh else 0)]
    ci = iter(centers)
    stride_r = next(ci); ga_r = next(ci); gb_r = next(ci); nwp_r = next(ci)
    ha_r = next(ci); hb_r = next(ci)
    fsz_r = next(ci); frm_r = next(ci); mat_r = next(ci); hds_r = next(ci)
    n_r = [next(ci) for _ in range(3)]
    nv_r = [next(ci) for _ in range(3)]
    if not is_diffuse:
        ra_r = next(ci); rb_r = next(ci); hd_r = next(ci); bguide_r = next(ci)

    view_z_scale = smem[_B_MISC]
    rect_w = smem[_B_MISC + 1]
    rect_h = smem[_B_MISC + 2]
    ortho = smem[_B_MISC + 3]
    min_material = smem[_B_MISC + 4]
    fx0, fy0, fdx, fdy = (smem[_B_FRUSTUM], smem[_B_FRUSTUM + 1],
                          smem[_B_FRUSTUM + 2], smem[_B_FRUSTUM + 3])
    hdp = [smem[_B_HDP + k] for k in range(4)]

    bh, bw = stride_r.shape[:2]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (origin[1].astype(jnp.float32) + col + 0.5) * inv_w
    v = (origin[0].astype(jnp.float32) + row + 0.5) * inv_h

    def view_pos(uu, vv, zz):
        s = zz + (1.0 - zz) * jnp.abs(ortho)
        return (uu * fdx + fx0) * s, (vv * fdy + fy0) * s, zz

    stride = stride_r[:, :]
    ga = ga_r[:, :]; gb = gb_r[:, :]; nwp = nwp_r[:, :]
    ha = ha_r[:, :]; hb = hb_r[:, :]
    frustum_size = fsz_r[:, :]
    frame_num = frm_r[:, :]
    mat_c = mat_r[:, :]
    hd_scale = hds_r[:, :]
    ncx, ncy, ncz = n_r[0][:, :], n_r[1][:, :], n_r[2][:, :]
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    if not is_diffuse:
        ra = ra_r[:, :]; rb = rb_r[:, :]
        hit_dist_c = hd_r[:, :]
        bguide = bguide_r[:, :]

    lw_all = _stride_weights(stride)

    sum_ = 1.0 + frame_num
    acc = [sg.tap() * sum_ for sg in sig]
    acc_sh = [sw.tap() * sum_ for sw in shw] if has_sh else None

    taps = [(i_, j_) for j_ in range(-2, 3) for i_ in range(-2, 3)
            if not (i_ == 0 and j_ == 0) and abs(i_) + abs(j_) != 4]
    for li, lv in enumerate(STRIDE_LEVELS):
        for (i_, j_) in taps:
            off_x = int(round(i_ * lv))
            off_y = int(round(j_ * lv))
            if abs(off_x) > 28 or abs(off_y) > 28:
                off_x = max(-28, min(28, off_x))
                off_y = max(-28, min(28, off_y))
            zs = jnp.abs(zw.tap(off_y, off_x)) * view_z_scale
            n0 = nr[0].tap(off_y, off_x)
            n1 = nr[1].tap(off_y, off_x)
            rs_raw = nr[2].tap(off_y, off_x)
            rs = rs_raw * rs_raw if rough_sq == 1 else (
                jnp.sqrt(jnp.clip(rs_raw, 0.0, 1.0)) if rough_sq == 2 else rs_raw)
            nsx, nsy, nsz = _decode_oct(n0, n1)

            us = u + off_x * inv_w
            vs = v + off_y * inv_h
            angle = _acos_approx(nsx * ncx + nsy * ncy + nsz * ncz)
            sx, sy, sz = view_pos(us, vs, zs)
            w_ = ((us > 0.0) & (us < 1.0) & (vs > 0.0) & (vs < 1.0)).astype(jnp.float32)
            w_ = w_ * _sstep10(jnp.abs((nvx * sx + nvy * sy + nvz * sz) * ga + gb))
            if mat_occ:
                ms = nr[3].tap(off_y, off_x)
                w_ = w_ * (jnp.maximum(mat_c, min_material)
                           == jnp.maximum(ms, min_material)).astype(jnp.float32)
            w_ = w_ * _exp_w(angle * nwp)
            if not is_diffuse:
                w_ = w_ * _exp_w(rs * rs * ra + rb)
            d1 = d1w.tap(off_y, off_x)
            w_ = w_ * (1.0 + d1)

            s_taps = [sg.tap(off_y, off_x) for sg in sig]
            s_taps = [jnp.where(w_ == 0.0, 0.0, st) for st in s_taps]
            hs = s_taps[-1] * hd_scale
            hs_factor = jnp.clip(hs / frustum_size, 0.0, 1.0)
            w_ = w_ * _exp_w(hs_factor * ha + hb)

            if not is_diffuse:
                d = jnp.abs(hit_dist_c - hs) / (jnp.maximum(hit_dist_c, hs) + 0.001)
                t = jnp.clip((d - (0.2 + bguide)) / ((0.05 + bguide) - (0.2 + bguide)),
                             0.0, 1.0)
                w_ = w_ * (t * t * (3.0 - 2.0 * t))

            w_ = w_ * lw_all[li]
            sum_ = sum_ + w_
            acc = [a + st * w_ for a, st in zip(acc, s_taps)]
            if has_sh:
                sh_t = [sw.tap(off_y, off_x) for sw in shw]
                acc_sh = [a + jnp.where(w_ == 0.0, 0.0, st) * w_
                          for a, st in zip(acc_sh, sh_t)]

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    k_ = 0
    for a in acc:
        outs[k_][:, :] = a * inv; k_ += 1
    if has_sh:
        for a in acc_sh:
            outs[k_][:, :] = a * inv; k_ += 1

    # fast-history 3x3 moments + anti-firefly ring moments (REBLUR_HistoryFix :169-244)
    m1 = jnp.zeros((bh, bw), jnp.float32)
    m2 = jnp.zeros((bh, bw), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = fastw.tap(dy, dx)
            m1 = m1 + t
            m2 = m2 + t * t
    outs[k_][:, :] = m1 / 9.0; k_ += 1
    outs[k_][:, :] = m2 / 9.0; k_ += 1
    if anti_firefly:
        am1 = jnp.zeros((bh, bw), jnp.float32)
        am2 = jnp.zeros((bh, bw), jnp.float32)
        cnt = 0
        for dy in range(-4, 5):
            for dx in range(-4, 5):
                if abs(dy) <= 1 and abs(dx) <= 1:
                    continue
                t = fastw.tap(dy, dx)
                am1 = am1 + t
                am2 = am2 + t * t
                cnt += 1
        outs[k_][:, :] = am1 / cnt; k_ += 1
        outs[k_][:, :] = am2 / cnt; k_ += 1


def history_fix_taps_pallas(sc, dc, config, *, signal, sh, view_z_in, normal_roughness,
                            data1, fast_history, stride, ga, gb, normal_weight_param,
                            ha, hb, frustum_size, frame_num, material_id,
                            hit_dist_scale, n, nv, is_diffuse, anti_firefly,
                            roughness=None, ra=None, rb=None, hit_dist=None,
                            bguide=None, perf_mode=False):
    """HistoryFix sparse reconstruction + fast-history moments on Pallas.

    Divergence: the per-pixel integer stride is resolved over STRIDE_LEVELS with hat
    blending (the reference strides continuously). Returns (signal_out (h,w,c), sh_out,
    m1, m2[, am1, am2])."""
    c = signal.shape[-1]
    has_sh = sh is not None
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    rough_sq = {"SQRT_LINEAR": 1, "SQ_LINEAR": 2}.get(config.roughness_encoding.name, 0)

    misc = jnp.stack([
        jnp.asarray(sc["view_z_scale"], jnp.float32),
        jnp.asarray(sc["rect_size"][0], jnp.float32),
        jnp.asarray(sc["rect_size"][1], jnp.float32),
        jnp.asarray(sc["ortho_mode"], jnp.float32),
        jnp.asarray(dc["diff_min_material" if is_diffuse else "spec_min_material"],
                    jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0),
    ])
    scalars = jnp.concatenate([jnp.zeros((16,), jnp.float32),
                               jnp.asarray(sc["frustum"], jnp.float32), misc,
                               jnp.asarray(dc["hit_dist_params"], jnp.float32)])

    windows = ([view_z_in] + _split(normal_roughness)[:4] + _split(signal)[:c]
               + [data1, fast_history] + (_split(sh)[:3] if has_sh else []))
    centers = [stride, ga, gb, normal_weight_param, ha, hb, frustum_size, frame_num,
               material_id, hit_dist_scale, n[..., 0], n[..., 1], n[..., 2],
               nv[..., 0], nv[..., 1], nv[..., 2]]
    if not is_diffuse:
        centers += [ra, rb, hit_dist, bguide]

    n_out = c + (3 if has_sh else 0) + 2 + (2 if anti_firefly else 0)
    # windows: z(f32) nr*4 sig*c data1 fast(f32: moment precision) [sh*3]
    wdt = None  # see _blur_kernel note
    outs = stencil_call(
        functools.partial(_hfix_kernel, c, has_sh, is_diffuse, mat_occ, rough_sq,
                          anti_firefly),
        windows, n_windows=len(windows), n_out=n_out, halo=HALO, block=BLOCK,
        scalars=scalars, center_inputs=centers, window_dtypes=wdt)
    sig_out = jnp.stack(outs[:c], -1)
    k = c
    sh_out = None
    if has_sh:
        sh_out = jnp.concatenate([jnp.stack(outs[k:k + 3], -1), sh[..., 3:]], -1)
        k += 3
    m1, m2 = outs[k], outs[k + 1]
    k += 2
    af = (outs[k], outs[k + 1]) if anti_firefly else (None, None)
    return sig_out, sh_out, m1, m2, af[0], af[1]


# ---------------------------------------------------------------------------
# HitDistReconstruction (REBLUR_HitDistReconstruction.hlsli)
# ---------------------------------------------------------------------------


def _hdrecon_kernel(radius, has_d, has_s, mat_unused, rough_sq, smem, bsm, wins,
                    centers, outs, origin, scratch):
    zw = wins[0]
    nr = wins[1:5]
    wi = 5
    hdw_d = hdw_s = None
    if has_d:
        hdw_d = wins[wi]; wi += 1
    if has_s:
        hdw_s = wins[wi]; wi += 1
    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci); dnwp_r = next(ci); snwp_r = next(ci)
    ra_r = next(ci); rb_r = next(ci)
    n_r = [next(ci) for _ in range(3)]
    nv_r = [next(ci) for _ in range(3)]

    view_z_scale = smem[_B_MISC]
    rect_w = smem[_B_MISC + 1]
    rect_h = smem[_B_MISC + 2]
    ortho = smem[_B_MISC + 3]
    fx0, fy0, fdx, fdy = (smem[_B_FRUSTUM], smem[_B_FRUSTUM + 1],
                          smem[_B_FRUSTUM + 2], smem[_B_FRUSTUM + 3])

    ga = ga_r[:, :]; gb = gb_r[:, :]
    dnwp = dnwp_r[:, :]; snwp = snwp_r[:, :]
    ra = ra_r[:, :]; rb = rb_r[:, :]
    ncx, ncy, ncz = n_r[0][:, :], n_r[1][:, :], n_r[2][:, :]
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]

    bh, bw = ga.shape[:2]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (origin[1].astype(jnp.float32) + col + 0.5) * inv_w
    v = (origin[0].astype(jnp.float32) + row + 0.5) * inv_h

    def view_pos(uu, vv, zz):
        s = zz + (1.0 - zz) * jnp.abs(ortho)
        return (uu * fdx + fx0) * s, (vv * fdy + fy0) * s, zz

    hd_d = hdw_d.tap() if has_d else None
    hd_s = hdw_s.tap() if has_s else None
    sum_d = 1000.0 * (hd_d != 0.0).astype(jnp.float32) if has_d else None
    sum_s = 1000.0 * (hd_s != 0.0).astype(jnp.float32) if has_s else None
    acc_d = hd_d * sum_d if has_d else None
    acc_s = hd_s * sum_s if has_s else None

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            zs = jnp.abs(zw.tap(dy, dx)) * view_z_scale
            n0 = nr[0].tap(dy, dx)
            n1 = nr[1].tap(dy, dx)
            rs_raw = nr[2].tap(dy, dx)
            rs = rs_raw * rs_raw if rough_sq == 1 else (
                jnp.sqrt(jnp.clip(rs_raw, 0.0, 1.0)) if rough_sq == 2 else rs_raw)
            nsx, nsy, nsz = _decode_oct(n0, n1)
            o_len = float((dx * dx + dy * dy) ** 0.5)
            us = u + dx * inv_w
            vs = v + dy * inv_h
            sx, sy, sz = view_pos(us, vs, zs)
            w_ = ((us > 0.0) & (us < 1.0) & (vs > 0.0) & (vs < 1.0)).astype(jnp.float32)
            w_ = w_ * float(np.exp(-0.66 * (o_len * 0.5) ** 2))
            w_ = w_ * _sstep10(jnp.abs((nvx * sx + nvy * sy + nvz * sz) * ga + gb))
            angle = _acos_approx(nsx * ncx + nsy * ncy + nsz * ncz)
            if has_d:
                wd = w_ * _exp_w(angle * dnwp)
                d_tap = hdw_d.tap(dy, dx)
                wd = wd * (d_tap != 0.0).astype(jnp.float32)
                acc_d = acc_d + d_tap * wd
                sum_d = sum_d + wd
            if has_s:
                ws = w_ * _exp_w(angle * snwp)
                ws = ws * _exp_w(rs * rs * ra + rb)
                s_tap = hdw_s.tap(dy, dx)
                ws = ws * (s_tap != 0.0).astype(jnp.float32)
                acc_s = acc_s + s_tap * ws
                sum_s = sum_s + ws

    k_ = 0
    if has_d:
        outs[k_][:, :] = acc_d / jnp.maximum(sum_d, NRD_EPS); k_ += 1
    if has_s:
        outs[k_][:, :] = acc_s / jnp.maximum(sum_s, NRD_EPS); k_ += 1


def hitdist_recon_pallas(sc, dc, config, *, radius, view_z_in, normal_roughness,
                         hd_d, hd_s, ga, gb, diff_nwp, spec_nwp, ra, rb, n, nv,
                         mesh=None):
    """REBLUR hit-distance reconstruction taps on Pallas. Returns (new_hd_d, new_hd_s)."""
    rough_sq = {"SQRT_LINEAR": 1, "SQ_LINEAR": 2}.get(config.roughness_encoding.name, 0)
    misc = jnp.stack([
        jnp.asarray(sc["view_z_scale"], jnp.float32),
        jnp.asarray(sc["rect_size"][0], jnp.float32),
        jnp.asarray(sc["rect_size"][1], jnp.float32),
        jnp.asarray(sc["ortho_mode"], jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ])
    scalars = jnp.concatenate([jnp.zeros((16,), jnp.float32),
                               jnp.asarray(sc["frustum"], jnp.float32), misc,
                               jnp.zeros((4,), jnp.float32)])
    windows = [view_z_in] + _split(normal_roughness)[:4]
    if hd_d is not None:
        windows.append(hd_d)
    if hd_s is not None:
        windows.append(hd_s)
    centers = [ga, gb, diff_nwp, spec_nwp, ra, rb,
               n[..., 0], n[..., 1], n[..., 2], nv[..., 0], nv[..., 1], nv[..., 2]]
    n_out = (hd_d is not None) + (hd_s is not None)

    def launch(tree, origin_offset=None):
        windows_l, centers_l, scalars_l = tree
        return stencil_call2(
            functools.partial(_hdrecon_kernel, radius, hd_d is not None,
                              hd_s is not None, False, rough_sq),
            windows_l, n_out=n_out, halo=(8, 128), block=BLOCK,
            scalars=scalars_l, center_inputs=centers_l,
            origin_offset=origin_offset)

    outs = _launch_or_shard(launch, (windows, centers, scalars),
                            view_z_in.shape[0], mesh, halo_rows=8)
    k = 0
    new_d = new_s = None
    if hd_d is not None:
        new_d = outs[k]; k += 1
    if hd_s is not None:
        new_s = outs[k]
    return new_d, new_s


# ---------------------------------------------------------------------------
# generic history sampling with given occlusion weights (TS) + 3x3 moments/min-max
# ---------------------------------------------------------------------------


def _hist_sample_kernel(n_planes, use_catrom, smem, bsm, wins, centers, outs, origin,
                        scratch):
    ci = iter(centers)
    mvy = next(ci)[:, :]
    mvx = next(ci)[:, :]
    occ = [next(ci)[:, :] for _ in range(4)]
    allow = next(ci)[:, :] > 0.5
    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]
    rect_w = smem[0]
    rect_h = smem[1]

    bh, bw = mvy.shape
    # same BLOCK-ADAPTIVE wide capture as the smb resolver: exact residuals to
    # 2 px on wide-flagged blocks, classic 1-px path elsewhere (budget-1
    # validity here zeroed the TS's history sample at every dev > 1 pixel,
    # firing antilag and freezing accumulation - the round-5 zoom-retention
    # root cause, see test_history_retention)
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x, budget=5.0)
    wide = bsm[2][i, j] > 0.0
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)

    def _resolve_body(my, mx, fy, fx):
        bw00 = (1.0 - fx) * (1.0 - fy)
        bw10 = fx * (1.0 - fy)
        bw01 = (1.0 - fx) * fy
        bw11 = fx * fy
        bws = [bw00, bw10, bw01, bw11]
        occ_w = [bws[k] * occ[k] * valid for k in range(4)]
        occ_wsum = occ_w[0] + occ_w[1] + occ_w[2] + occ_w[3]

        px_nm = origin[1].astype(jnp.float32) + col + base_x.astype(jnp.float32)
        py_nm = origin[0].astype(jnp.float32) + row + base_y.astype(jnp.float32)
        rc = RC(my, mx, fx, fy, occ_w, occ_wsum, allow, py_nm, px_nm,
                rect_w, rect_h, use_catrom, cat_extra=valid)
        for p in range(n_planes):
            outs[p][:, :] = rc.resolve_hist(wins[p])

    @pl.when(wide)
    def _():
        qyw = jnp.clip(qy, -2.0, 1.999)
        qxw = jnp.clip(qx, -2.0, 1.999)
        fl_y = jnp.floor(qyw)
        fl_x = jnp.floor(qxw)
        my = [(k, (fl_y == k).astype(jnp.float32)) for k in range(-2, 2)]
        mx = [(k, (fl_x == k).astype(jnp.float32)) for k in range(-2, 2)]
        _resolve_body(my, mx, qyw - fl_y, qxw - fl_x)

    @pl.when(jnp.logical_not(wide))
    def _():
        qyn = jnp.clip(qy, -1.0, 0.999)
        qxn = jnp.clip(qx, -1.0, 0.999)
        myf = (qyn < 0.0).astype(jnp.float32)
        mxf = (qxn < 0.0).astype(jnp.float32)
        my = [(-1, myf), (0, 1.0 - myf)]
        mx = [(-1, mxf), (0, 1.0 - mxf)]
        _resolve_body(my, mx, qyn + myf, qxn + mxf)


def hist_sample_pallas(sc, planes, mv_pix_y, mv_pix_x, occ4, allow_catrom,
                       use_catrom=True, mesh=None):
    """sample_history (CatRom-13 + bilinear-custom fallback) with caller-provided
    per-tap occlusion (REBLUR TS: occlusion comes from the fbits of TA)."""
    scalars = jnp.stack([jnp.asarray(sc["rect_size_prev"][0], jnp.float32),
                         jnp.asarray(sc["rect_size_prev"][1], jnp.float32)])
    n = len(planes)

    def launch(tree, origin_offset=None):
        planes_l, centers_l, scalars_l = tree
        base_y, base_x = _prep(sc, centers_l[0], centers_l[1])
        wide_b = rp.block_wide_flag(centers_l[0], centers_l[1], base_y, base_x,
                                    BLOCK, HALO)
        return stencil_call2(
            functools.partial(_hist_sample_kernel, n, use_catrom),
            list(planes_l), n_out=n, halo=HALO, block=BLOCK,
            scalars=scalars_l, block_scalars=[base_y, base_x, wide_b],
            center_inputs=centers_l, base_offset=(base_y, base_x),
            offset_windows=[True] * n, origin_offset=origin_offset)

    centers = [mv_pix_y, mv_pix_x, occ4[..., 0], occ4[..., 1], occ4[..., 2],
               occ4[..., 3], allow_catrom]
    outs = _launch_or_shard(launch, (list(planes), centers, scalars),
                            mv_pix_y.shape[0], mesh)
    return list(outs)


def _moments_kernel(n_planes, smem, bsm, wins, centers, outs, origin, scratch):
    for p in range(n_planes):
        w_ = wins[p]
        c = w_.tap()
        m1 = jnp.zeros_like(c)
        m2 = jnp.zeros_like(c)
        lmin = None
        lmax = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                t = w_.tap(dy, dx)
                m1 = m1 + t
                m2 = m2 + t * t
                if not (dy == 0 and dx == 0):
                    lmin = t if lmin is None else jnp.minimum(lmin, t)
                    lmax = t if lmax is None else jnp.maximum(lmax, t)
        outs[4 * p][:, :] = m1 / 9.0
        outs[4 * p + 1][:, :] = m2 / 9.0
        outs[4 * p + 2][:, :] = lmin
        outs[4 * p + 3][:, :] = lmax


def moments_minmax_pallas(planes, mesh=None):
    """3x3 moments + cross min/max (RCRS) per plane: [(m1, m2, lmin, lmax), ...]."""
    n = len(planes)

    def launch(planes_l, origin_offset=None):
        return stencil_call2(
            functools.partial(_moments_kernel, n), list(planes_l),
            n_out=4 * n, halo=(8, 128), block=BLOCK,
            origin_offset=origin_offset)

    outs = _launch_or_shard(launch, list(planes), planes[0].shape[0], mesh,
                            halo_rows=8)
    return [tuple(outs[4 * p:4 * p + 4]) for p in range(n)]


def _bilinear_kernel(n_planes, smem, bsm, wins, centers, outs, origin, scratch):
    mvy = centers[0][:, :]
    mvx = centers[1][:, :]
    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]
    rect_w = smem[0]
    rect_h = smem[1]
    bh, bw = mvy.shape
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x)
    qy = jnp.clip(qy, -1.0, 0.999)
    qx = jnp.clip(qx, -1.0, 0.999)
    my = qy < 0.0
    mx = qx < 0.0
    fy = qy - jnp.where(my, -1.0, 0.0)
    fx = qx - jnp.where(mx, -1.0, 0.0)

    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    ox = origin[1].astype(jnp.float32) + col + base_x.astype(jnp.float32) \
        + jnp.where(mx, -1.0, 0.0)
    oy = origin[0].astype(jnp.float32) + row + base_y.astype(jnp.float32) \
        + jnp.where(my, -1.0, 0.0)

    bw00 = (1.0 - fx) * (1.0 - fy)
    bw10 = fx * (1.0 - fy)
    bw01 = (1.0 - fx) * fy
    bw11 = fx * fy
    bws = [bw00, bw10, bw01, bw11]
    pw = []
    for k, (i_, j_) in enumerate(_CENTER):
        tx = ox + (i_ - 1)
        ty = oy + (j_ - 1)
        scr = ((tx >= 0.0) & (tx < rect_w) & (ty >= 0.0) & (ty < rect_h)) \
            .astype(jnp.float32)
        pw.append(bws[k] * scr * valid)
    pws = pw[0] + pw[1] + pw[2] + pw[3]
    for p in range(n_planes):
        fp_ = FP(wins[p], my, mx)
        acc = sum(fp_.tap(i_, j_) * pw[k] for k, (i_, j_) in enumerate(_CENTER))
        outs[p][:, :] = jnp.where(pws < 1e-4, 0.0,
                                  acc / jnp.where(pws < 1e-4, 1.0, pws))
    outs[n_planes][:, :] = valid


def bilinear_resolve(sc, planes, mv_pix_y, mv_pix_x, mesh=None):
    """Plain bilinear sample of N planes at a reprojected per-pixel position
    (replaces resample.sample_bilinear; off-screen/ out-of-budget taps excluded and
    renormalized). Returns (resolved list, valid)."""
    scalars = jnp.stack([jnp.asarray(sc["rect_size_prev"][0], jnp.float32),
                         jnp.asarray(sc["rect_size_prev"][1], jnp.float32)])
    n = len(planes)

    def launch(tree, origin_offset=None):
        planes_l, centers_l, scalars_l = tree
        base_y, base_x = _prep(sc, centers_l[0], centers_l[1])
        return stencil_call2(
            functools.partial(_bilinear_kernel, n), list(planes_l),
            n_out=n + 1, halo=HALO, block=BLOCK,
            scalars=scalars_l, block_scalars=[base_y, base_x],
            center_inputs=centers_l,
            base_offset=(base_y, base_x), offset_windows=[True] * n,
            origin_offset=origin_offset)

    outs = _launch_or_shard(launch, (list(planes), [mv_pix_y, mv_pix_x],
                                     scalars), mv_pix_y.shape[0], mesh)
    return list(outs[:n]), outs[n]
