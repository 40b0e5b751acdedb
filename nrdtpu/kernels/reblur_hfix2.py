"""REBLUR HistoryFix, v2: per-block skip + static stride lattice + separable moments.

Structure mirrors reblur_blur2 (see its module docstring for the v1->v2 rationale).
HistoryFix-specific levers:
  * the reconstruction only applies where `stride != 0`, i.e. accumulated frames <
    historyFixFrameNum (REBLUR_HistoryFix.hlsli early-out; the XLA caller applies the
    per-pixel `use_fix` select). In steady state that's a few percent of pixels around
    disocclusion edges -> a per-block `max(stride) > 0` predicate skips the whole 20-tap
    loop for converged blocks.
  * per-pixel integer stride resolves over STRIDE_LEVELS with hat blending (as v1), with
    per-block (min,max)-stride level predication.
  * the fast-history 3x3 moments and the 9x9-minus-3x3 anti-firefly ring moments are
    computed as SEPARABLE box sums (row-sum bands then column sums): 9x9 box = 9+9 slices
    instead of 81 taps (REBLUR_HistoryFix.hlsli:169-244 semantics preserved exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .harness2 import block_minmax, stencil_call2
from .reblur_pallas import (
    _B_FRUSTUM, _B_HDP, _B_MISC, STRIDE_LEVELS,
    _acos_approx, _exp_w, _split,
)

BLOCK2 = (160, 512)
HALO2 = (32, 128)

_LEV = STRIDE_LEVELS
# nearest-level buckets: pixel uses level li iff its stride is in (MID[li-1], MID[li]]
_MID = [(_LEV[k] + _LEV[k + 1]) * 0.5 for k in range(len(_LEV) - 1)]
_M_LO = [-1e9] + _MID
_M_HI = _MID + [1e9]

_TAPS20 = [(i_, j_) for j_ in range(-2, 3) for i_ in range(-2, 3)
           if not (i_ == 0 and j_ == 0) and abs(i_) + abs(j_) != 4]


def _box_sums(win, r):
    """Separable (2r+1)^2 box sums of a window and its square, centred on the block."""
    band = sum(win.band(-r, r, dx) for dx in range(-r, r + 1))
    band_sq = sum(win.band(-r, r, dx) ** 2 for dx in range(-r, r + 1))
    bh = win.bh
    s1 = sum(band[k: k + bh] for k in range(2 * r + 1))
    s2 = sum(band_sq[k: k + bh] for k in range(2 * r + 1))
    return s1, s2


def _hfix2_kernel(c, has_sh, is_diffuse, mat_occ, anti_firefly, af_radius, smem, bsm,
                  wins, centers, outs, origin, scratch):
    """Tap loop over pre-decoded geometry windows (see reblur_blur2._blur2_kernel)."""
    wi = iter(wins)
    zw = next(wi)
    wnx = next(wi); wny = next(wi); wnz = next(wi)
    wrs = None if is_diffuse else next(wi)
    wmat = next(wi) if mat_occ else None
    sig = [next(wi) for _ in range(c)]
    d1w = next(wi)
    fastw = next(wi)
    shw = [next(wi) for _ in range(3)] if has_sh else []
    ci = iter(centers)
    stride_r = next(ci); ga_r = next(ci); gb_r = next(ci); nwp_r = next(ci)
    ha_r = next(ci); hb_r = next(ci)
    fsz_r = next(ci); frm_r = next(ci); mat_r = next(ci); hds_r = next(ci)
    nv_r = [next(ci) for _ in range(3)]
    if not is_diffuse:
        ra_r = next(ci); rb_r = next(ci); hd_r = next(ci); bguide_r = next(ci)

    smin_b, smax_b = bsm[0], bsm[1]
    sum_ref = scratch[0]

    rect_w = smem[_B_MISC + 1]
    rect_h = smem[_B_MISC + 2]
    ortho = smem[_B_MISC + 3]
    min_material = smem[_B_MISC + 4]
    fx0, fy0, fdx, fdy = (smem[_B_FRUSTUM], smem[_B_FRUSTUM + 1],
                          smem[_B_FRUSTUM + 2], smem[_B_FRUSTUM + 3])

    bh, bw = stride_r.shape[:2]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    fx = origin[1].astype(jnp.float32) + col
    fy = origin[0].astype(jnp.float32) + row
    u = (fx + 0.5) * inv_w
    v = (fy + 0.5) * inv_h
    abs_ortho = jnp.abs(ortho)
    s_lin = 1.0 - abs_ortho
    dirx = u * fdx + fx0
    diry = v * fdy + fy0

    i_b = pl.program_id(0)
    j_b = pl.program_id(1)
    smin = smin_b[i_b, j_b]
    smax = smax_b[i_b, j_b]

    n_sig_out = c + (3 if has_sh else 0)
    # init: pass-through (the caller's use_fix select keeps these where stride == 0,
    # which covers every pixel of a skipped block)
    for k_, sg in enumerate(sig):
        outs[k_][:, :] = sg.tap()
    if has_sh:
        for k_, sw in enumerate(shw):
            outs[c + k_][:, :] = sw.tap()

    @pl.when(smax > 0.0)
    def _():
        stride = jnp.clip(stride_r[:, :], _LEV[0], _LEV[-1])
        ga = ga_r[:, :]; gb = gb_r[:, :]; nwp = nwp_r[:, :]
        ha = ha_r[:, :]; hb = hb_r[:, :]
        frustum_size = fsz_r[:, :]
        frame_num = frm_r[:, :]
        mat_c = jnp.maximum(mat_r[:, :], min_material) if mat_occ else None
        hd_scale = hds_r[:, :]
        ncx, ncy, ncz = wnx.tap(), wny.tap(), wnz.tap()
        nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
        plane_a = nvx * dirx + nvy * diry
        if not is_diffuse:
            ra = ra_r[:, :]; rb = rb_r[:, :]
            hit_dist_c = hd_r[:, :]
            bguide = bguide_r[:, :]

        sum_ref[:, :] = 1.0 + frame_num
        for k_ in range(n_sig_out):
            outs[k_][:, :] = outs[k_][:, :] * (1.0 + frame_num)

        smin_c = jnp.maximum(smin, jnp.float32(_LEV[0]))
        smax_c = jnp.minimum(smax, jnp.float32(_LEV[-1]))
        for li in range(len(_LEV)):
            # nearest-level bucketing: a pixel taps the single lattice whose stride is
            # closest to its own (the reference's continuous stride lands between
            # lattice spacings either way; v2's hat blend paid 2x for the same shape)
            active = (smax_c > jnp.float32(_M_LO[li])) & (smin_c <= jnp.float32(_M_HI[li]))

            @pl.when(active)
            def _(li=li):
                lw = ((stride > jnp.float32(_M_LO[li]))
                      & (stride <= jnp.float32(_M_HI[li]))).astype(jnp.float32)
                sum_acc = sum_ref[:, :]
                acc = [outs[k_][:, :] for k_ in range(n_sig_out)]
                for (i_, j_) in _TAPS20:
                    off_x = max(-28, min(28, int(round(i_ * _LEV[li]))))
                    off_y = max(-28, min(28, int(round(j_ * _LEV[li]))))
                    zs = zw.tap(off_y, off_x)
                    nsx = wnx.tap(off_y, off_x)
                    nsy = wny.tap(off_y, off_x)
                    nsz = wnz.tap(off_y, off_x)

                    angle = _acos_approx(nsx * ncx + nsy * ncy + nsz * ncz)
                    s_f = zs * s_lin + abs_ortho
                    kx = jnp.float32(off_x) * inv_w * fdx
                    ky = jnp.float32(off_y) * inv_h * fdy
                    w_ = ((fx >= jnp.float32(-off_x))
                          & (fx <= rect_w - jnp.float32(1 + off_x))
                          & (fy >= jnp.float32(-off_y))
                          & (fy <= rect_h - jnp.float32(1 + off_y))
                          ).astype(jnp.float32)
                    plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
                    w_ = w_ * _sstep10_geom(plane_d, ga, gb)
                    if mat_occ:
                        ms = wmat.tap(off_y, off_x)
                        w_ = w_ * (mat_c == jnp.maximum(ms, min_material)
                                   ).astype(jnp.float32)
                    w_ = w_ * _exp_w(angle * nwp)
                    if not is_diffuse:
                        rs = wrs.tap(off_y, off_x)
                        w_ = w_ * _exp_w(rs * rs * ra + rb)
                    d1 = d1w.tap(off_y, off_x)
                    w_ = w_ * (1.0 + d1)

                    s_taps = [sg.tap(off_y, off_x) for sg in sig]
                    hs = s_taps[-1] * hd_scale
                    hs_factor = jnp.clip(hs / frustum_size, 0.0, 1.0)
                    w_ = w_ * _exp_w(hs_factor * ha + hb)

                    if not is_diffuse:
                        d = (jnp.abs(hit_dist_c - hs)
                             / (jnp.maximum(hit_dist_c, hs) + 0.001))
                        t = jnp.clip((d - (0.2 + bguide))
                                     / ((0.05 + bguide) - (0.2 + bguide)), 0.0, 1.0)
                        w_ = w_ * (t * t * (3.0 - 2.0 * t))

                    w_ = w_ * lw
                    sum_acc = sum_acc + w_
                    acc = [a + st * w_ for a, st in zip(acc[:c], s_taps)] + acc[c:]
                    if has_sh:
                        sh_t = [sw.tap(off_y, off_x) for sw in shw]
                        for t_, st in enumerate(sh_t):
                            acc[c + t_] = acc[c + t_] + st * w_
                sum_ref[:, :] = sum_acc
                for k_ in range(n_sig_out):
                    outs[k_][:, :] = acc[k_]

        inv = 1.0 / jnp.maximum(sum_ref[:, :], 1e-15)
        for k_ in range(n_sig_out):
            outs[k_][:, :] = outs[k_][:, :] * inv

    # fast-history moments: separable 3x3 box (+ 9x9-minus-3x3 anti-firefly ring)
    k_ = n_sig_out
    b3_1, b3_2 = _box_sums(fastw, 1)
    outs[k_][:, :] = b3_1 / 9.0; k_ += 1
    outs[k_][:, :] = b3_2 / 9.0; k_ += 1
    if anti_firefly:
        # performance mode shrinks the ring to radius 3 (REBLUR_Config.hlsli:237)
        ring_n = float((2 * af_radius + 1) ** 2 - 9)
        b9_1, b9_2 = _box_sums(fastw, af_radius)
        outs[k_][:, :] = (b9_1 - b3_1) / ring_n; k_ += 1
        outs[k_][:, :] = (b9_2 - b3_2) / ring_n; k_ += 1


def _sstep10_geom(ndx, ga, gb):
    t = jnp.clip(1.0 - jnp.abs(ndx * ga + gb), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def history_fix_taps_pallas2(sc, dc, config, *, signal, sh, view_z_in,
                             normal_roughness, data1, fast_history, stride, ga, gb,
                             normal_weight_param, ha, hb, frustum_size, frame_num,
                             material_id, hit_dist_scale, n, nv, is_diffuse,
                             anti_firefly, roughness=None, ra=None, rb=None,
                             hit_dist=None, bguide=None, perf_mode=False):
    """Drop-in replacement for reblur_pallas.history_fix_taps_pallas (v2 kernel)."""
    c = signal.shape[-1]
    has_sh = sh is not None
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"

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

    # bf16 windows for everything except viewZ (see reblur_blur2 module docstring)
    bf = lambda x: x.astype(jnp.bfloat16)
    view_z_dec = jnp.abs(view_z_in) * sc["view_z_scale"]
    windows = [view_z_dec, bf(n[..., 0]), bf(n[..., 1]), bf(n[..., 2])]
    if not is_diffuse:
        windows.append(bf(roughness))
    if mat_occ:
        windows.append(bf(material_id))
    windows += ([bf(p) for p in _split(signal)[:c]] + [bf(data1), bf(fast_history)]
                + ([bf(p) for p in _split(sh)[:3]] if has_sh else []))
    centers = [stride, ga, gb, normal_weight_param, ha, hb, frustum_size, frame_num,
               material_id, hit_dist_scale,
               nv[..., 0], nv[..., 1], nv[..., 2]]
    if not is_diffuse:
        centers += [ra, rb, hit_dist, bguide]

    smin_b, smax_b = block_minmax(stride, BLOCK2, HALO2)

    n_out = c + (3 if has_sh else 0) + 2 + (2 if anti_firefly else 0)
    outs = stencil_call2(
        functools.partial(_hfix2_kernel, c, has_sh, is_diffuse, mat_occ,
                          anti_firefly, 3 if perf_mode else 4),
        windows, n_out=n_out, halo=HALO2, block=BLOCK2,
        scalars=scalars, block_scalars=[smin_b, smax_b], center_inputs=centers,
        scratch_blocks=1)
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
