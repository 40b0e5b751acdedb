"""REBLUR adaptive Poisson blur, v3: one block-level disk + per-pixel Gaussian rescale.

The v1 kernel (reblur_pallas.spatial_filter_taps_pallas) rotated the 8-tap Poisson disk
by the per-frame rotator, making every tap offset runtime-uniform -> 2 dynamic window
rolls per tap-plane (~21 us each at 1440p, ~500 of them per blur = ~11 ms/pass).
v2 used static offsets at 5 radius levels with per-pixel hat blending: each block ran
the 2-3 levels its radius range touched -> 16-24 tap sets per block.

v3 redesign (TPU-first, divergences documented in the caller's docstring):
  * tap offsets are COMPILE-TIME integers: the unrotated Poisson disk scaled by ONE
    RADIUS_LEVELS entry per block - the smallest level covering the block's max radius
    (exactly one `pl.when` fires). 8 tap sets per block, not 16-24.
  * per-PIXEL radius rides the Gaussian: the reference weights tap fraction f of the
    pixel radius r by exp(-0.66 f^2) (GetGaussianWeight, Common.hlsli:571-574). With the
    lattice at level L the tap sits at fraction (L*tapr)/r of the pixel's radius, so the
    per-tap Gaussian becomes exp(k_t / r^2), k_t = -0.66 (L*tapr)^2 - a compile-time
    constant times one per-pixel plane (1/r^2), i.e. one fma + one (hardware) exp per
    tap. Pixels with radius << L see their far taps Gaussian-suppressed, which is the
    correct limit: small radius = converged history = little spatial filtering wanted.
  * bf16 windows for signal / normals / roughness / material (the reference's pipeline
    is FP16, Reblur.cpp:37-64): an unaligned bf16 tap load costs ~5.6 us/plane vs
    ~10.3 us f32 (bench_micro); the f32 upcast at the slice is free. viewZ stays f32
    (reference keeps R32f, REBLUR_FORMAT_PREV_VIEWZ).
  * all taps are static slices of the normalized window ref (harness2) - no rolls, no
    live window-sized values.

Reference: REBLUR_Common_{Diffuse,Specular}SpatialFilter.hlsli tap loop;
Poisson.hlsli g_Special8; radius/weight formulas per REBLUR_Blur.hlsli:22-66.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .. import math as nm
from .harness2 import block_minmax, stencil_call2
from .reblur_pallas import (
    _B_FRUSTUM, _B_HDP, _B_MISC, NRD_EPS, NRD_INF, RADIUS_LEVELS,
    _acos_approx, _exp_w, _split, _sstep10,
)

BLOCK2 = (160, 512)
HALO2 = (32, 128)

# level buckets: level i runs for a block iff its max radius is in (lo_i, hi_i].
# This is a PARTITION (exactly one bucket fires, boundaries at the level radii):
# the v2-era table (_HI = _LEV[1:-1] + [1e9, 1e9]) overlapped buckets so most radii
# fired TWO bodies - double the live-lattice cost per launch for an undocumented
# extra blend, against this module's own "exactly one pl.when fires" contract.
_LEV = RADIUS_LEVELS
_LO = [-1e9] + list(_LEV[:-1])
_HI = list(_LEV[:-1]) + [1e9]


def _static_offsets(n_dirs=8):
    """n_dirs x len(RADIUS_LEVELS) compile-time integer offsets (+ gauss constants).

    Per tap: the integer lattice offset at each level and k_t = -0.66 (L*tapr)^2, the
    Gaussian constant such that exp(k_t / r^2) is GetGaussianWeight of the tap's
    fraction of the per-pixel radius r. Performance mode uses the 6-tap set
    (g_Special6), like the reference's REBLUR_POISSON_SAMPLE_NUM override
    (REBLUR_Config.hlsli:196-238)."""
    out = []
    taps = nm.SPECIAL_6 if n_dirs == 6 else nm.SPECIAL_8
    for tap in np.asarray(taps):
        per_level = []
        for lv in _LEV:
            ox = int(np.clip(round(float(tap[0]) * lv), -32, 32))
            oy = int(np.clip(round(float(tap[1]) * lv), -32, 32))
            k_t = -0.66 * (float(tap[2]) * lv) ** 2
            per_level.append((oy, ox, k_t))
        out.append(per_level)
    return out


def _blur2_kernel(c, has_sh, spec, prepass, mat_occ, n_dirs, has_cb, smem, bsm, wins,
                  centers, outs, origin, scratch):
    """Tap loop over pre-decoded geometry windows.

    Windows carry DECODED planes (|viewZ|*scale, unit normal xyz, linear roughness,
    material id) computed once XLA-side by the caller - the per-tap octahedral decode
    (~14 vector ops incl. rsqrt) and roughness/material decodes of the packed
    normal_roughness texture are hoisted out of the 8 x levels tap loop."""
    wi = iter(wins)
    zw = next(wi)
    wnx = next(wi); wny = next(wi); wnz = next(wi)
    wrs = next(wi) if (spec or prepass) else None
    wmat = next(wi) if mat_occ else None
    sig = [next(wi) for _ in range(c)]
    shw = [next(wi) for _ in range(3)] if has_sh else []
    ci = iter(centers)
    radius_r = next(ci); ga_r = next(ci); gb_r = next(ci); nwp_r = next(ci)
    ha_r = next(ci); hb_r = next(ci); mhdw_r = next(ci); mat_r = next(ci)
    nv_r = [next(ci) for _ in range(3)]
    if spec:
        wra_r = next(ci); wrb_r = next(ci)
    if prepass:
        hd_r = next(ci)
        rnd_r = [next(ci) for _ in range(n_dirs)]
    cbm_r = next(ci) if has_cb else None

    rmin_b, rmax_b = bsm[0], bsm[1]
    sum_ref = scratch[0]

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
    # integer pixel coords for the per-tap in-screen test: tap (px+ox, py+oy) is valid
    # iff px+ox in [0, W-1] etc. - comparisons against per-tap scalar constants
    fx = origin[1].astype(jnp.float32) + col
    fy = origin[0].astype(jnp.float32) + row
    u = (fx + 0.5) * inv_w
    v = (fy + 0.5) * inv_h
    # view_pos(us, vs, z) = ((us*fdx+fx0)*s, (vs*fdy+fy0)*s, z) with s affine in z;
    # us = u + off_x*inv_w is affine in the static offset, so per tap it reduces to
    # (dirx + cx_k) * s - two fmas instead of the full uv reconstruction.
    abs_ortho = jnp.abs(ortho)
    s_lin = 1.0 - abs_ortho
    dirx = u * fdx + fx0
    diry = v * fdy + fy0

    radius = jnp.clip(radius_r[:, :], _LEV[0], _LEV[-1])
    inv_r2 = 1.0 / (radius * radius)
    ga = ga_r[:, :]; gb = gb_r[:, :]
    nwp = nwp_r[:, :]; ha = ha_r[:, :]; hb = hb_r[:, :]
    mhdw = mhdw_r[:, :]
    mat_c = jnp.maximum(mat_r[:, :], min_material) if mat_occ else None
    ncx, ncy, ncz = wnx.tap(), wny.tap(), wnz.tap()
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    # plane-distance algebra: dot(Nv, X_tap) = s_f*(A + kx*nvx + ky*nvy) + nvz*zs with
    # A = nvx*dirx + nvy*diry per pixel and (kx, ky) per-tap scalars - 4 vector fmas
    # per tap instead of the full sx/sy/dot reconstruction
    plane_a = nvx * dirx + nvy * diry
    if spec:
        wra = wra_r[:, :]; wrb = wrb_r[:, :]
    if prepass:
        hit_dist_c = hd_r[:, :]
        rough_term = jnp.clip((wrs.tap() - 0.5) * 2.0, 0.0, 1.0)

    view_z = zw.tap()
    s_c = view_z * s_lin + abs_ortho
    xvx, xvy, xvz = dirx * s_c, diry * s_c, view_z

    i_b = pl.program_id(0)
    j_b = pl.program_id(1)
    rmin = jnp.maximum(rmin_b[i_b, j_b], jnp.float32(_LEV[0]))
    rmax = jnp.minimum(rmax_b[i_b, j_b], jnp.float32(_LEV[-1]))

    # init: center contribution (zeroed on checkerboard no-data pixels, like the
    # reference's `sum = 0; diff = 0` in REBLUR_PrePass.hlsli:64-78)
    cw = cbm_r[:, :] if has_cb else jnp.ones((bh, bw), jnp.float32)
    sum_ref[:, :] = cw
    n_sig_out = c + (3 if has_sh else 0)
    for k_, sg in enumerate(sig):
        outs[k_][:, :] = sg.tap() * cw
    if has_sh:
        for k_, sw in enumerate(shw):
            outs[c + k_][:, :] = sw.tap() * cw
    if prepass:
        outs[n_sig_out][:, :] = jnp.where(hit_dist_c == 0.0, jnp.float32(NRD_INF),
                                          hit_dist_c)

    taps = _static_offsets(n_dirs)
    for li in range(len(_LEV)):
        # exactly one bucket fires: the smallest level covering the block's max radius
        active = (rmax > jnp.float32(_LO[li])) & (rmax <= jnp.float32(_HI[li]))

        @pl.when(active)
        def _(li=li):
            sum_acc = sum_ref[:, :]
            acc = [outs[k_][:, :] for k_ in range(n_sig_out)]
            hdt = outs[n_sig_out][:, :] if prepass else None
            for k in range(n_dirs):
                off_y, off_x, k_t = taps[k][li]
                zs = zw.tap(off_y, off_x)
                nsx = wnx.tap(off_y, off_x)
                nsy = wny.tap(off_y, off_x)
                nsz = wnz.tap(off_y, off_x)

                angle = _acos_approx(ncx * nsx + ncy * nsy + ncz * nsz)
                s_f = zs * s_lin + abs_ortho
                kx = jnp.float32(off_x) * inv_w * fdx
                ky = jnp.float32(off_y) * inv_h * fdy
                w_ = ((fx >= jnp.float32(-off_x)) & (fx <= rect_w - jnp.float32(1 + off_x))
                      & (fy >= jnp.float32(-off_y))
                      & (fy <= rect_h - jnp.float32(1 + off_y))).astype(jnp.float32)
                plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
                w_ = w_ * _sstep10(jnp.abs(plane_d * ga + gb))
                if mat_occ:
                    ms = wmat.tap(off_y, off_x)
                    w_ = w_ * (mat_c == jnp.maximum(ms, min_material)).astype(
                        jnp.float32)
                w_ = w_ * _sstep10(jnp.abs(angle * nwp))
                if spec or prepass:
                    rs = wrs.tap(off_y, off_x)
                if spec:
                    w_ = w_ * _sstep10(jnp.abs(rs * wra + wrb))

                s_taps = [sg.tap(off_y, off_x) for sg in sig]
                s_hd = s_taps[-1]

                if prepass:
                    sx = (dirx + kx) * s_f
                    sy = (diry + ky) * s_f
                    sz = zs
                    hdn_s = (hdp[0] + zs * hdp[1]) * (
                        1.0 + (hdp[2] - 1.0)
                        * jnp.clip(jnp.exp2(hdp[3] * rs * rs), 0.0, 1.0))
                    hs = s_hd * hdn_s
                    dx_ = sx - xvx
                    dy_ = sy - xvy
                    dz_ = sz - xvz
                    d = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_) + NRD_EPS
                    gw_ = w_ * jnp.clip(hs / d, 0.0, 1.0)
                    take = (rnd_r[k][:, :] < gw_) & (hs > 0.0)
                    hdt = jnp.where(take, jnp.minimum(hdt, hs), hdt)
                    w_ = w_ * use_prepass
                    t = hs / (d + hit_dist_c)
                    w_ = w_ * (jnp.clip(t, 0.0, 1.0)
                               + (1.0 - jnp.clip(t, 0.0, 1.0)) * rough_term)

                w_ = w_ * (mhdw + (1.0 - mhdw) * _exp_w(s_hd * ha + hb))
                w_ = w_ * jnp.exp(jnp.float32(k_t) * inv_r2)

                sum_acc = sum_acc + w_
                acc = [a + st * w_ for a, st in zip(acc[:c], s_taps)] + acc[c:]
                if has_sh:
                    sh_taps = [sw.tap(off_y, off_x) for sw in shw]
                    for t_, st in enumerate(sh_taps):
                        acc[c + t_] = acc[c + t_] + st * w_

            sum_ref[:, :] = sum_acc
            for k_ in range(n_sig_out):
                outs[k_][:, :] = acc[k_]
            if prepass:
                outs[n_sig_out][:, :] = hdt

    inv = 1.0 / jnp.maximum(sum_ref[:, :], 1e-15)
    for k_ in range(n_sig_out):
        outs[k_][:, :] = outs[k_][:, :] * inv
    if prepass:
        hdt = outs[n_sig_out][:, :]
        outs[n_sig_out][:, :] = jnp.where(hdt >= jnp.float32(NRD_INF), 0.0, hdt)
    if has_cb:  # report the weight sum so the caller can run the sum==0 fallback
        outs[n_sig_out + (1 if prepass else 0)][:, :] = sum_ref[:, :]


def spatial_filter_taps_pallas2(sc, dc, config, *, rotator, signal, sh, view_z_in,
                                normal_roughness, blur_radius, ga, gb,
                                normal_weight_param, ha, hb, min_hit_dist_weight,
                                material_id, n, nv, wr_a=None, wr_b=None,
                                hit_dist=None, roughness=None, rnd8=None,
                                spec=False, prepass=False, perf_mode=False,
                                cb_mask=None):
    """Drop-in replacement for reblur_pallas.spatial_filter_taps_pallas (v2 kernel).

    Additional documented divergence vs v1: the per-frame rotator is ignored (static tap
    lattice, see module docstring) - `rotator` is accepted for interface parity.
    """
    c = signal.shape[-1]
    has_sh = sh is not None
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    n_dirs = 6 if perf_mode else 8

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
    dirs_pad = jnp.zeros((16,), jnp.float32)  # SMEM layout parity with v1
    scalars = jnp.concatenate([dirs_pad, jnp.asarray(sc["frustum"], jnp.float32), misc,
                               jnp.asarray(dc["hit_dist_params"], jnp.float32)])

    # decoded geometry planes, hoisting the per-tap decodes out of the kernel;
    # everything except viewZ rides bf16 windows (half the unaligned-load cost,
    # mirrors the reference's FP16 pipeline) - taps upcast to f32 in the kernel
    bf = lambda x: x.astype(jnp.bfloat16)
    view_z_dec = jnp.abs(view_z_in) * sc["view_z_scale"]
    windows = [view_z_dec, bf(n[..., 0]), bf(n[..., 1]), bf(n[..., 2])]
    if spec or prepass:
        windows.append(bf(roughness))
    if mat_occ:
        windows.append(bf(material_id))
    windows += [bf(p) for p in _split(signal)[:c]] \
        + ([bf(p) for p in _split(sh)[:3]] if has_sh else [])
    centers = [blur_radius, ga, gb, normal_weight_param, ha, hb, min_hit_dist_weight,
               material_id, nv[..., 0], nv[..., 1], nv[..., 2]]
    if spec:
        centers += [wr_a, wr_b]
    if prepass:
        centers += [hit_dist] + list(rnd8)[:n_dirs]
    if cb_mask is not None:
        centers += [cb_mask]

    rmin_b, rmax_b = block_minmax(blur_radius, BLOCK2, HALO2)

    has_cb = cb_mask is not None
    n_out = c + (3 if has_sh else 0) + (1 if prepass else 0) + (1 if has_cb else 0)
    outs = stencil_call2(
        functools.partial(_blur2_kernel, c, has_sh, spec, prepass, mat_occ, n_dirs,
                          has_cb),
        windows, n_out=n_out, halo=HALO2, block=BLOCK2,
        scalars=scalars, block_scalars=[rmin_b, rmax_b], center_inputs=centers,
        scratch_blocks=1)
    sig_out = jnp.stack(outs[:c], -1)
    k = c
    sh_out = None
    if has_sh:
        sh_out = jnp.concatenate([jnp.stack(outs[k:k + 3], -1), sh[..., 3:]], -1)
        k += 3
    hdt = outs[k] if prepass else None
    if has_cb:
        return sig_out, sh_out, hdt, outs[k + (1 if prepass else 0)]
    return sig_out, sh_out, hdt
