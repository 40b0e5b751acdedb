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

from ..frontend import NRD_EPS
from . import reproject as rp
from .harness import stencil_call

HALO = (32, 128)
BLOCK = (64, 256)
ALMOST_ZERO_ANGLE = float(np.cos(np.deg2rad(89.0)))


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


class FP:
    """Reprojected 4x4 footprint over a base-shifted window.

    tap(i, j) = plane[p + B + fl + (j - 1, i - 1)] with per-pixel fl in {-1, 0} masks.
    Raw static taps are memoized (neighbouring footprint taps share them)."""

    def __init__(self, win_b, my, mx):
        self.w = win_b
        self.my = my  # fl_y == -1
        self.mx = mx
        self._raw = {}

    def _t(self, dy, dx):
        key = (dy, dx)
        if key not in self._raw:
            self._raw[key] = self.w.tap(dy, dx)
        return self._raw[key]

    def tap(self, i, j):
        a = jnp.where(self.mx, self._t(j - 2, i - 2), self._t(j - 2, i - 1))
        b = jnp.where(self.mx, self._t(j - 1, i - 2), self._t(j - 1, i - 1))
        return jnp.where(self.my, a, b)


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


# ---------------------------------------------------------------------------
# nearest_resolve
# ---------------------------------------------------------------------------


def _nearest_kernel(n_planes, smem, bsm, wins, centers, outs, origin):
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
        wb = wins[p].shifted(base_y, base_x)
        acc = jnp.zeros_like(mvy)
        for dy, dx, m in sels:
            acc = acc + wb.tap(dy, dx) * m
        outs[p][:, :] = acc
    outs[n_planes][:, :] = valid


def nearest_resolve(planes, mv_pix_y, mv_pix_x):
    """Sample each plane at round(pixel + motion); returns (resolved list, valid).

    Replaces resample.sample_nearest at a reprojected uv. valid=0 marks pixels whose
    motion deviates >1 px from the block base (callers treat them as off-screen)."""
    base_y, base_x = _prep(None, mv_pix_y, mv_pix_x)
    n = len(planes)
    outs = stencil_call(
        functools.partial(_nearest_kernel, n), list(planes),
        n_windows=n, n_out=n + 1, halo=HALO, block=BLOCK,
        block_scalars=[base_y, base_x], center_inputs=[mv_pix_y, mv_pix_x])
    return list(outs[:n]), outs[n]


# ---------------------------------------------------------------------------
# reblur_smb_resolve
# ---------------------------------------------------------------------------

_CENTER = ((1, 1), (2, 1), (1, 2), (2, 2))  # (i, j) == kernels.py CENTER_TAPS (tx, ty)
_CORNER = ((0, 0), (3, 0), (0, 3), (3, 3))


def _smb_kernel(n_hist, n_bil, mat_occlusion, smem, bsm, wins, centers, outs, origin):
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
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x)
    qy = jnp.clip(qy, -1.0, 0.999)
    qx = jnp.clip(qx, -1.0, 0.999)
    my = qy < 0.0   # fl_y == -1
    mx = qx < 0.0
    fy = qy - jnp.where(my, -1.0, 0.0)
    fx = qx - jnp.where(mx, -1.0, 0.0)

    # n_avg over current 2x2 (lines 70-97), unnormalized / 4
    na_x = jnp.zeros((bh, bw), jnp.float32)
    na_y = jnp.zeros((bh, bw), jnp.float32)
    na_z = jnp.zeros((bh, bw), jnp.float32)
    for dy, dx in ((-1, -1), (-1, 0), (0, -1), (0, 0)):
        ax, ay, az = _decode_oct(cnr[0].tap(dy, dx), cnr[1].tap(dy, dx))
        na_x, na_y, na_z = na_x + ax, na_y + ay, na_z + az
    na_x, na_y, na_z = na_x / 4.0, na_y / 4.0, na_z / 4.0

    # footprints over base-shifted windows
    def fp(w):
        return FP(w.shifted(base_y, base_x), my, mx)

    zfp = fp(zp_w)
    z_taps = [[jnp.abs(zfp.tap(i_, j_)) * view_z_scale for i_ in range(4)]
              for j_ in range(4)]

    # per-tap integer position (for in-screen checks)
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
    footprint_raw = (occ_c[0] * bw00 + occ_c[1] * bw10 + occ_c[2] * bw01
                     + occ_c[3] * bw11)

    def resolve_custom(fp_):
        acc = sum(fp_.tap(i_, j_) * occ_w[k] for k, (i_, j_) in enumerate(_CENTER))
        return jnp.where(occ_wsum < 1e-4, 0.0,
                         acc / jnp.where(occ_wsum < 1e-4, 1.0, occ_wsum))

    dacc = resolve_custom(fp(dacc_w))
    sacc = resolve_custom(fp(sacc_w))

    # CatRom-13 with bilinear-custom fallback (Common.hlsli:602-646 direct form):
    # per-tap weight wx_i*wy_j, corners dropped, off-screen taps dropped, renormalized.
    wxs = _catrom_w(fx)
    wys = _catrom_w(fy)
    cat_w = {}
    cat_wsum = jnp.zeros((bh, bw), jnp.float32)
    for j_ in range(4):
        for i_ in range(4):
            if (i_, j_) in _CORNER:
                continue
            w_ = wxs[i_] * wys[j_] * on_screen(i_, j_)
            cat_w[(i_, j_)] = w_
            cat_wsum = cat_wsum + w_

    use_cat = allow_catrom
    hist_out = []
    for hw_ in hist_wins:
        fp_ = fp(hw_)
        cat_acc = sum(fp_.tap(i_, j_) * w_ for (i_, j_), w_ in cat_w.items())
        cat = jnp.where(jnp.abs(cat_wsum) < 1e-4, 0.0,
                        cat_acc / jnp.where(jnp.abs(cat_wsum) < 1e-4, 1.0, cat_wsum))
        bil = resolve_custom(fp_)
        hist_out.append(jnp.where(use_cat, cat, bil))
    for bw_ in bil_wins:
        hist_out.append(resolve_custom(fp(bw_)))

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


def reblur_smb_resolve(sc, dc, config, *, mv_pix_y, mv_pix_x, xv_prev_z, base_threshold,
                       navg_thr, material_id_center, nr_cur_packed, prev_view_z,
                       prev_nr_packed, prev_mat, diff_accum, spec_accum, hist_planes,
                       bil_planes=()):
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
    base_y, base_x = _prep(sc, mv_pix_y, mv_pix_x)

    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    n_hist = len(hist_planes)
    n_bil = len(bil_planes)
    windows = ([prev_view_z] + _split(prev_nr_packed)[:2] + [prev_mat, diff_accum,
               spec_accum] + list(hist_planes) + list(bil_planes)
               + _split(nr_cur_packed)[:2])
    centers = [mv_pix_y, mv_pix_x, xv_prev_z, base_threshold, navg_thr,
               material_id_center]
    n_out = n_hist + n_bil + 11
    outs = stencil_call(
        functools.partial(_smb_kernel, n_hist, n_bil, mat_occ), windows,
        n_windows=len(windows), n_out=n_out, halo=HALO, block=BLOCK,
        scalars=scalars, block_scalars=[base_y, base_x], center_inputs=centers)
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


def _vmb_kernel(mat_occlusion, smem, bsm, wins, centers, outs, origin):
    (zp_w, rough_w, mat_w, sacc_w, h0, h1, h2, h3, fast_w, hdtp_w) = wins
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
        return FP(w.shifted(base_y, base_x), my, mx)

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

    def resolve_custom(fp_):
        acc = sum(fp_.tap(i_, j_) * occ_w[k] for k, (i_, j_) in enumerate(_CENTER))
        return jnp.where(occ_wsum < 1e-4, 0.0,
                         acc / jnp.where(occ_wsum < 1e-4, 1.0, occ_wsum))

    sacc = resolve_custom(fp(sacc_w))

    wxs = _catrom_w(fx)
    wys = _catrom_w(fy)
    cat_w = {}
    cat_wsum = jnp.zeros((bh, bw), jnp.float32)
    for j_ in range(4):
        for i_ in range(4):
            if (i_, j_) in _CORNER:
                continue
            w_ = wxs[i_] * wys[j_] * on_screen(i_, j_)
            cat_w[(i_, j_)] = w_
            cat_wsum = cat_wsum + w_

    hist_out = []
    for hw_ in (h0, h1, h2, h3):
        fp_ = fp(hw_)
        cat_acc = sum(fp_.tap(i_, j_) * w_ for (i_, j_), w_ in cat_w.items())
        cat = jnp.where(jnp.abs(cat_wsum) < 1e-4, 0.0,
                        cat_acc / jnp.where(jnp.abs(cat_wsum) < 1e-4, 1.0, cat_wsum))
        bil = resolve_custom(fp_)
        hist_out.append(jnp.where(allow_catrom, cat, bil))

    fast = resolve_custom(fp(fast_w))

    # plain bilinear (no occlusion) for prev hit-dist-for-tracking (TA :561)
    hfp = fp(hdtp_w)
    pw = [bws[k] * on_screen(i_, j_) for k, (i_, j_) in enumerate(_CENTER)]
    pws = pw[0] + pw[1] + pw[2] + pw[3]
    hdt_acc = sum(hfp.tap(i_, j_) * pw[k] for k, (i_, j_) in enumerate(_CENTER))
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


def reblur_vmb_resolve(sc, dc, config, *, mv_pix_y, mv_pix_x, nox_curr, vmb_thr,
                       n, vmb_v, ra, rb, roughness_sigma, parallax_sm,
                       material_id_center, smb_allow_catrom, prev_view_z,
                       prev_nr_packed, prev_mat, spec_accum, spec_hist4, spec_fast,
                       prev_hdt):
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
    base_y, base_x = _prep(sc, mv_pix_y, mv_pix_x)
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"

    windows = ([prev_view_z, _split(prev_nr_packed)[2], prev_mat, spec_accum]
               + _split(spec_hist4)[:4] + [spec_fast, prev_hdt])
    centers = [mv_pix_y, mv_pix_x, nox_curr, vmb_thr,
               n[..., 0], n[..., 1], n[..., 2],
               vmb_v[..., 0], vmb_v[..., 1], vmb_v[..., 2],
               ra, rb, roughness_sigma, parallax_sm, material_id_center,
               smb_allow_catrom]
    outs = stencil_call(
        functools.partial(_vmb_kernel, mat_occ), windows,
        n_windows=len(windows), n_out=12, halo=HALO, block=BLOCK,
        scalars=scalars, block_scalars=[base_y, base_x], center_inputs=centers)
    res = dict(spec_hist=jnp.stack(outs[:4], -1), spec_fast=outs[4],
               spec_accum_speed_raw=outs[5], fbits_vmb=outs[6],
               footprint_raw=outs[7], allow_catrom=outs[8], rough_conf=outs[9],
               hdt_prev=outs[10])
    return res


# ---------------------------------------------------------------------------
# small stencil utilities (replace XLA pad+slice shifts, ~17 ms each at 1440p)
# ---------------------------------------------------------------------------


def _shift_kernel(offsets, n_planes, smem, bsm, wins, centers, outs, origin):
    k = 0
    for p in range(n_planes):
        for dy, dx in offsets:
            outs[k][:, :] = wins[p].tap(dy, dx)
            k += 1


def shift_planes(planes, offsets):
    """planes at static integer offsets: out[p][o][y, x] = planes[p][y+dy, x+dx].

    Border pixels read edge-clamped values on the padded fallback path and wrapped values
    on the no-pad path (masked by callers' in-screen tests where it matters)."""
    n = len(planes)
    outs = stencil_call(
        functools.partial(_shift_kernel, tuple(offsets), n), list(planes),
        n_windows=n, n_out=n * len(offsets), halo=(8, 128), block=BLOCK)
    return [list(outs[p * len(offsets):(p + 1) * len(offsets)]) for p in range(n)]


def _spec_prelude_kernel(smem, bsm, wins, centers, outs, origin):
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


def spec_prelude(hdt_src, roughness):
    """3x3 min hit-dist-for-tracking + roughness^2 moments (spec TA lines 62-111).

    hdt_src: hit dist with zeros already replaced by +inf (XLA side); roughness decoded."""
    outs = stencil_call(_spec_prelude_kernel, [hdt_src, roughness],
                        n_windows=2, n_out=3, halo=(8, 128), block=BLOCK)
    return outs[0], outs[1], outs[2]


# ---------------------------------------------------------------------------
# sampler object consumed by passes/reblur/kernels.py (sampler=... parameters)
# ---------------------------------------------------------------------------


class PallasSampler:
    """Gather backend passed into the REBLUR XLA kernels on the Pallas path."""

    def __init__(self, sc):
        self.sc = sc

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
        return spec_prelude(hdt_src, roughness)

    def shift(self, planes, offsets):
        return shift_planes(planes, offsets)

    def nearest(self, planes, uv_target, rect_cur=False):
        mvy, mvx = self._mv_pix(uv_target, rect_cur)
        return nearest_resolve(planes, mvy, mvx)

    def vmb_bundle(self, sc, dc, config, **kw):
        return reblur_vmb_resolve(sc, dc, config, **kw)
