"""Fused diffuse+specular REBLUR spatial filters: one tap lattice, shared geometry.

The per-signal v3 kernels (reblur_blur2 / reblur_hfix2) each load viewZ + decoded
normal (+roughness/material) windows and compute the per-tap geometry chain (normal
angle, plane distance, in-screen mask) independently for the diffuse and the specular
signal -> at 1440p roughly 40% of each kernel's work is duplicated across the two
signals, plus a second Pallas launch (~0.45 ms fixed) and a second set of XLA glue per
stage.

This module runs BOTH signals through ONE kernel per stage:
  * geometry windows (viewZ f32; normal xyz, roughness, material bf16) are loaded and
    tapped once; the per-tap geometry math (angle, plane distance, in-screen mask,
    tap view-position terms) is computed once;
  * each signal keeps its own weight-parameter planes (radius, normal / hit-dist /
    roughness params) and accumulators - per-signal work per tap is just the weight
    products and the weighted accumulate;
  * the block radius level is selected from max over all signals' radii; each signal's
    per-pixel Gaussian exp(k_t / r^2) (see reblur_blur2 module docstring) rescales its
    own taps, so the signal with the smaller radius sees far taps suppressed - the v3
    semantics, applied per signal.

Stages covered: PRE_BLUR (diffuse prepass + specular prepass incl. hitDistForTracking
and checkerboard resolve reporting), BLUR, POST_BLUR - one launch each - and
HistoryFix (fused variant of reblur_hfix2 with the same per-block stride skip).

Reference: Shaders/Include/REBLUR_Common_{Diffuse,Specular}SpatialFilter.hlsli,
REBLUR_PrePass.hlsli, REBLUR_HistoryFix.hlsli (the reference runs these as separate
diffuse/specular-combined shaders; the TPU fusion is a launch/bandwidth optimization
with identical per-signal formulas).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .. import math as nm
from ..passes.reblur import common as C
from .harness2 import block_dead_mask, block_minmax, stencil_call2
from .reblur_blur2 import HALO2, _LEV, _LO, _HI, _static_offsets
from .reblur_hfix2 import _M_LO, _M_HI, _TAPS20, _box_sums
from .reblur_pallas import (
    NRD_EPS, NRD_INF, STRIDE_LEVELS, _acos_approx, _exp_w, _split, _sstep10,
)

# candidate blocks, largest first - all divide 1440p (2560x1440) exactly, so the
# nopad fast path stays available at the headline resolution
_BLOCK_CANDIDATES = ((160, 512), (120, 512), (96, 512), (96, 256), (80, 256),
                     (48, 256))
_VMEM_BUDGET = 9.0e6  # bytes; the v3 single-signal kernels run at ~9.6 MB resident


# extra SMEM scalars appended after reblur_fused's layout (ends at _S_HDP + 4 = 14)
_S_W2V = 14      # 9: world_to_view rotation, row-major
_S_X = 23        # see _band_scalars
(_X_DEN, _X_MRD, _X_PDS, _X_LAF, _X_HFS, _X_HFN, _X_RFR, _X_MAXR, _X_MINR,
 _X_MHDW, _X_FASTEN, _X_MAXFR) = range(12)
_NSC = _S_X + 12




def _hdn(smem, z, rough2_term):
    """_REBLUR_GetHitDistanceNormalization on planes (NRD.hlsli:362-365).

    rough2_term = clip(exp2(hdp3 * rough^2), 0, 1), or its rough=1 constant for
    the diffuse scale."""
    hdp = [smem[_S_HDP + k] for k in range(4)]
    return (hdp[0] + z * hdp[1]) * (1.0 + (hdp[2] - 1.0) * rough2_term)


def _hfix_post(smem, desc, occlusion, directional, anti_firefly, smc, frame_num,
               stride, sig_in, sh_in, fast_in, fixed, m1, m2, am1, am2):
    """In-kernel _hfix_post (passes/reblur/kernels.py:2035-2060): stride select,
    fast-history update, sigma/anti-firefly luma clamps, SH luma rescale."""
    occ_like = occlusion or directional
    use_fix = stride != 0.0
    sig = [jnp.where(use_fix, f_, s_) for f_, s_ in zip(fixed[:desc.c], sig_in)]
    sh = None
    if desc.has_sh:
        sh = [jnp.where(use_fix, f_, s_)
              for f_, s_ in zip(fixed[desc.c:desc.c + 3], sh_in)]
    f = nm.saturate(frame_num / (smem[_S_X + _X_HFN] + NRD_EPS))
    if desc.spec:
        f = nm.lerp(1.0, f, smc)
    luma0 = sig[-1] if occ_like else sig[0]
    fast_out = nm.lerp(luma0, fast_in, f)
    sigma = nm.get_std_dev(m1, m2) * C.color_clamping_sigma_scale(occ_like)
    luma = luma0
    if anti_firefly:
        asig = nm.get_std_dev(am1, am2) * C.REBLUR_ANTI_FIREFLY_SIGMA_SCALE
        luma = jnp.clip(luma, am1 - asig, am1 + asig)
    luma_clamped = jnp.clip(luma, m1 - sigma, m1 + sigma)
    luma = nm.lerp(luma_clamped, luma,
                   1.0 / (1.0 + smem[_S_X + _X_FASTEN] * frame_num * 2.0))
    # change_luma on planes (common.py:139-146)
    if occlusion and not directional:
        sig = [luma]
    elif directional:
        scale = (luma + nm.EPS) / (sig[3] + nm.EPS)
        sig = [s_ * scale for s_ in sig[:3]] + [luma]
    else:
        scale = (luma + nm.EPS) / (luma0 + nm.EPS)
        sig = [s_ * scale for s_ in sig[:3]] + sig[3:]
    if sh is not None:
        ln = jnp.sqrt(sh[0] ** 2 + sh[1] ** 2 + sh[2] ** 2)
        scale = (luma + nm.EPS) / (ln + nm.EPS)
        sh = [s_ * scale for s_ in sh]
    return sig, sh, fast_out


def _choose_block(n_f32_wins, n_bf16_wins, n_centers, n_out, n_scratch,
                  halo=HALO2):
    """Largest candidate block whose windows+centers+outputs fit the VMEM budget.

    The fused kernels carry ~2x the planes of the per-signal v3 kernels; a fixed
    (160, 512) block would oversubscribe VMEM for the SH variants, so the block
    shrinks with the plane count (paying proportionally more halo DMA, which is the
    cheaper resource)."""
    hy, hx = halo
    for bh, bw in _BLOCK_CANDIDATES:
        wb = (bh + 2 * hy) * (bw + 2 * hx)
        blk = bh * bw
        total = (wb * (4 * n_f32_wins + 2 * n_bf16_wins)
                 + blk * 4 * (n_centers + n_out + n_scratch))
        if total <= _VMEM_BUDGET:
            return (bh, bw)
    return _BLOCK_CANDIDATES[-1]


# SMEM scalar layout (this module's own; independent of reblur_pallas's)
_S_FRUSTUM = 0   # 4: fx0, fy0, fdx, fdy
_S_RW = 4        # rect_w
_S_RH = 5        # rect_h
_S_ORTHO = 6     # ortho_mode
_S_UPP = 7       # use_prepass_not_only_for_specular_motion_estimation
_S_MM0 = 8       # min material, signal 0
_S_MM1 = 9       # min material, signal 1
_S_HDP = 10      # 4: hit dist params


@dataclasses.dataclass(frozen=True)
class FSig:
    """Static (jit-specializing) per-signal kernel configuration."""
    c: int
    has_sh: bool = False
    spec: bool = False
    prepass: bool = False
    has_cb: bool = False

    @property
    def n_out(self):
        return (self.c + (3 if self.has_sh else 0) + (1 if self.prepass else 0)
                + (1 if self.has_cb else 0))


def _fused_blur_kernel(descs, n_dirs, mat_occ, any_spec, has_skip, smem, bsm, wins,
                       centers, outs, origin, scratch):
    """Block-grid wrapper: per-block (rmax, skip) lookup + the shared core."""
    i_b = pl.program_id(0)
    j_b = pl.program_id(1)
    rmax = bsm[1][i_b, j_b]
    if has_skip:  # culled block: no tap level fires (windows are zero-filled)
        rmax = jnp.where(bsm[2][i_b, j_b] != 0.0, jnp.float32(-1.0), rmax)
        for t_ in scratch[:len(wins)]:
            # the shared math below runs on zeros (finite weights x zero taps ->
            # outputs keep the zeroed-window init)
            t_[:, :] = jnp.zeros(t_.shape, jnp.float32)
    _fused_blur_core(descs, n_dirs, mat_occ, any_spec, smem, rmax, wins,
                     centers, outs, origin, scratch)


def _fused_blur_core(descs, n_dirs, mat_occ, any_spec, smem, rmax_in, wins,
                     centers, outs, origin, scratch):
    """Shared-geometry tap loop over all signals (see module docstring).

    Round-4 "hoist" structure (bench_tap2: 4.53 -> 3.39 ms on the 13-window
    replica, compile 64 -> 15 s): the per-radius-level `pl.when` bodies contain
    ONLY the tap loads (into per-plane scratch); the ~55-op weight chain runs
    once per dir on the hoisted values with runtime-selected (off_y, off_x, k_t)
    scalars. Dead predicated issue drops from half-a-full-body per dead level
    (bench_tap.py's predicated-issue finding) to half-the-loads.

    Callable from any grid shape: `rmax_in` is an explicit traced scalar (< 0
    skips every level - the caller zero-fills the tap scratch in that case), and
    `centers` only needs items supporting `[:, :]` reads (refs or value
    wrappers), so the band pipeline (reblur_band.py) can drive the same core
    over sliding buffers."""
    wi = iter(wins)
    zw = next(wi)
    wnx = next(wi); wny = next(wi); wnz = next(wi)
    wrs = next(wi) if any_spec else None
    wmat = next(wi) if mat_occ else None
    sig_wins = []
    for d in descs:
        sw = [next(wi) for _ in range(d.c)]
        shw = [next(wi) for _ in range(3)] if d.has_sh else []
        sig_wins.append((sw, shw))
    tap_wins = [zw, wnx, wny, wnz] + ([wrs] if any_spec else []) \
        + ([wmat] if mat_occ else [])
    for sw, shw in sig_wins:
        tap_wins += list(sw) + list(shw)

    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci)
    mat_r = next(ci) if mat_occ else None
    nv_r = [next(ci) for _ in range(3)]
    per = []
    for d in descs:
        p = {k: next(ci) for k in ("radius", "nwp", "ha", "hb", "mhdw")}
        if d.spec:
            p["wra"] = next(ci); p["wrb"] = next(ci)
        if d.prepass:
            p["hd"] = next(ci)
            p["rnd"] = [next(ci) for _ in range(n_dirs)]
        if d.has_cb:
            p["cbm"] = next(ci)
        per.append(p)

    rect_w = smem[_S_RW]
    rect_h = smem[_S_RH]
    ortho = smem[_S_ORTHO]
    use_prepass = smem[_S_UPP]
    fx0, fy0, fdx, fdy = (smem[_S_FRUSTUM], smem[_S_FRUSTUM + 1],
                          smem[_S_FRUSTUM + 2], smem[_S_FRUSTUM + 3])
    hdp = [smem[_S_HDP + k] for k in range(4)]
    min_mat = [smem[_S_MM0], smem[_S_MM1]]

    bh, bw = ga_r.shape[:2]
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

    ga = ga_r[:, :]; gb = gb_r[:, :]
    ncx, ncy, ncz = wnx.tap(), wny.tap(), wnz.tap()
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    plane_a = nvx * dirx + nvy * diry
    view_z = zw.tap()
    s_c = view_z * s_lin + abs_ortho
    xvx, xvy, xvz = dirx * s_c, diry * s_c, view_z

    any_prepass = any(d.prepass for d in descs)
    if any_prepass:
        rough_c = wrs.tap()
        rough_term = jnp.clip((rough_c - 0.5) * 2.0, 0.0, 1.0)

    # per-signal precomputed center values + output-slot bookkeeping
    out_base = []
    k0 = 0
    for si, (d, p) in enumerate(zip(descs, per)):
        out_base.append(k0)
        k0 += d.n_out
        radius = jnp.clip(p["radius"][:, :], _LEV[0], _LEV[-1])
        p["inv_r2"] = 1.0 / (radius * radius)
        p["nwp_c"] = p["nwp"][:, :]
        p["ha_c"] = p["ha"][:, :]; p["hb_c"] = p["hb"][:, :]
        p["mhdw_c"] = p["mhdw"][:, :]
        if mat_occ:
            p["mat_c"] = jnp.maximum(mat_r[:, :], min_mat[si])
        if d.spec:
            p["wra_c"] = p["wra"][:, :]; p["wrb_c"] = p["wrb"][:, :]
        if d.prepass:
            p["hd_c"] = p["hd"][:, :]
        cw = p["cbm"][:, :] if d.has_cb else jnp.ones((bh, bw), jnp.float32)
        p["cw"] = cw

    # init: center contributions (held as VALUES across the dir loop)
    sums = []
    accs = []
    hdts = []
    for si, (d, p) in enumerate(zip(descs, per)):
        sw, shw = sig_wins[si]
        sums.append(p["cw"])
        accs.append([sg.tap() * p["cw"] for sg in list(sw) + list(shw)])
        if d.prepass:
            hd_c = p["hd_c"]
            hdts.append(jnp.where(hd_c == 0.0, jnp.float32(NRD_INF), hd_c))
        else:
            hdts.append(None)

    rmax = jnp.minimum(rmax_in, jnp.float32(_LEV[-1]))

    taps = _static_offsets(n_dirs)
    lws = [(rmax > jnp.float32(_LO[li])) & (rmax <= jnp.float32(_HI[li]))
           for li in range(len(_LEV))]
    tap_scr = scratch[:len(tap_wins)]

    for k in range(n_dirs):
        # runtime-uniform (off_y, off_x, k_t) of the block's live level: the
        # buckets partition the radius line, so exactly one mask is 1
        sel = [jnp.float32(0.0)] * 3
        for li in range(len(_LEV)):
            m = lws[li].astype(jnp.float32)
            for q in range(3):
                sel[q] = sel[q] + m * jnp.float32(taps[k][li][q])
        oyf, oxf, k_t = sel

        for li in range(len(_LEV)):
            @pl.when(lws[li])
            def _(li=li, k=k):
                off_y, off_x, _ = taps[k][li]
                for t_, wv in zip(tap_scr, tap_wins):
                    t_[:, :] = wv.tap(off_y, off_x)

        ts = iter(tap_scr)
        zs = next(ts)[:, :]
        nsx = next(ts)[:, :]; nsy = next(ts)[:, :]; nsz = next(ts)[:, :]
        rs = next(ts)[:, :] if any_spec else None
        ms = next(ts)[:, :] if mat_occ else None
        sig_taps = [[next(ts)[:, :] for _ in range(d.c + (3 if d.has_sh else 0))]
                    for d in descs]

        # ---- shared geometry chain (once per dir) ----
        angle = _acos_approx(ncx * nsx + ncy * nsy + ncz * nsz)
        s_f = zs * s_lin + abs_ortho
        kx = oxf * inv_w * fdx
        ky = oyf * inv_h * fdy
        w_geo = ((fx >= -oxf) & (fx <= rect_w - 1.0 - oxf)
                 & (fy >= -oyf) & (fy <= rect_h - 1.0 - oyf)
                 ).astype(jnp.float32)
        plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
        w_geo = w_geo * _sstep10(jnp.abs(plane_d * ga + gb))
        if any_prepass:
            sx = (dirx + kx) * s_f
            sy = (diry + ky) * s_f
            dx_ = sx - xvx
            dy_ = sy - xvy
            dz_ = zs - xvz
            tap_d = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_) + NRD_EPS

        # ---- per-signal weights + accumulate ----
        for si, (d, p) in enumerate(zip(descs, per)):
            st = sig_taps[si]
            w_ = w_geo
            if mat_occ:
                w_ = w_ * (p["mat_c"] == jnp.maximum(ms, min_mat[si])
                           ).astype(jnp.float32)
            w_ = w_ * _sstep10(jnp.abs(angle * p["nwp_c"]))
            if d.spec:
                w_ = w_ * _sstep10(jnp.abs(rs * p["wra_c"] + p["wrb_c"]))
            s_hd = st[d.c - 1]
            if d.prepass:
                hdn_s = (hdp[0] + zs * hdp[1]) * (
                    1.0 + (hdp[2] - 1.0)
                    * jnp.clip(jnp.exp2(hdp[3] * rs * rs), 0.0, 1.0))
                hs = s_hd * hdn_s
                gw_ = w_ * jnp.clip(hs / tap_d, 0.0, 1.0)
                take = (p["rnd"][k][:, :] < gw_) & (hs > 0.0)
                hdts[si] = jnp.where(take, jnp.minimum(hdts[si], hs),
                                     hdts[si])
                w_ = w_ * use_prepass
                t = hs / (tap_d + p["hd_c"])
                t = jnp.clip(t, 0.0, 1.0)
                w_ = w_ * (t + (1.0 - t) * rough_term)
            w_ = w_ * (p["mhdw_c"] + (1.0 - p["mhdw_c"])
                       * _exp_w(s_hd * p["ha_c"] + p["hb_c"]))
            w_ = w_ * jnp.exp(k_t * p["inv_r2"])

            sums[si] = sums[si] + w_
            accs[si] = [a + t2 * w_ for a, t2 in zip(accs[si], st)]

    for si, (d, p) in enumerate(zip(descs, per)):
        b = out_base[si]
        inv = 1.0 / jnp.maximum(sums[si], 1e-15)
        for k_, a in enumerate(accs[si]):
            outs[b + k_][:, :] = a * inv
        k_ = d.c + (3 if d.has_sh else 0)
        if d.prepass:
            hdt = hdts[si]
            outs[b + k_][:, :] = jnp.where(hdt >= jnp.float32(NRD_INF), 0.0, hdt)
            k_ += 1
        if d.has_cb:  # weight sum for the caller's sum==0 fallback
            outs[b + k_][:, :] = sums[si]


def _fused_hfix_kernel(descs, mat_occ, any_spec, af_flags, af_radius, has_skip,
                       occlusion, directional, smem, bsm, wins, centers, outs,
                       origin, scratch):
    """Block-grid wrapper: per-block (smin, smax, skip) lookup, the shared core
    into VMEM scratch, then the IN-KERNEL post (fast-history clamp chain).

    Round 5: _hfix_post used to run as XLA glue after the launch - ~15 full-res
    plane round trips through HBM per frame (the "history fix fused" stage
    measured 9.8 ms with the kernel itself accounting for only a fraction).
    Running it here consumes the core's outputs straight from VMEM and shrinks
    the launch outputs to the final signal/sh/fast planes."""
    n_sig = len(descs)
    i_b = pl.program_id(0)
    j_b = pl.program_id(1)
    smin = functools.reduce(jnp.minimum, [r[i_b, j_b] for r in bsm[:n_sig]])
    smax = functools.reduce(jnp.maximum, [r[i_b, j_b] for r in bsm[n_sig:2 * n_sig]])
    if has_skip:  # culled block: the 20-tap loop never fires (windows zero-filled)
        smax = jnp.where(bsm[2 * n_sig][i_b, j_b] != 0.0, jnp.float32(0.0), smax)
    n_ho = [d.c + (3 if d.has_sh else 0) + 2 + (2 if af else 0)
            for d, af in zip(descs, af_flags)]
    sums = list(scratch[:n_sig])
    tmp = list(scratch[n_sig:n_sig + sum(n_ho)])
    _fused_hfix_core(descs, mat_occ, any_spec, af_flags, af_radius, smem,
                     smin, smax, wins, centers, tmp, origin, sums)

    # ---- in-kernel _hfix_post (band-validated; reblur_band drives the same fn) ----
    wi = iter(wins)
    next(wi)                                   # z
    next(wi); next(wi); next(wi)               # n xyz
    wrs = next(wi) if any_spec else None
    if mat_occ:
        next(wi)
    sig_wins = []
    for d in descs:
        sw = [next(wi) for _ in range(d.c)]
        d1w = next(wi)
        fastw = next(wi)
        shw = [next(wi) for _ in range(3)] if d.has_sh else []
        sig_wins.append((sw, d1w, fastw, shw))
    ci = iter(centers)
    next(ci); next(ci)                         # ga, gb
    if mat_occ:
        next(ci)
    next(ci); next(ci); next(ci); next(ci)     # nv xyz, fsz
    per = []
    for d in descs:
        p = {k: next(ci) for k in ("stride", "nwp", "ha", "hb", "frm", "hds")}
        if d.spec:
            p["ra"] = next(ci); p["rb"] = next(ci)
            p["hd"] = next(ci); p["bguide"] = next(ci)
        per.append(p)

    smc_spec = nm.get_spec_magic_curve(wrs.tap()) if any_spec else None
    ko = 0
    out_k = 0
    for si, d in enumerate(descs):
        sw, _, fastw, shw = sig_wins[si]
        npl = d.c + (3 if d.has_sh else 0)
        fixed = [tmp[ko + k_][:, :] for k_ in range(npl)]
        m1 = tmp[ko + npl][:, :]
        m2 = tmp[ko + npl + 1][:, :]
        am1 = tmp[ko + npl + 2][:, :] if af_flags[si] else None
        am2 = tmp[ko + npl + 3][:, :] if af_flags[si] else None
        sig_in = [sg.tap() for sg in sw]
        sh_in = [s_.tap() for s_ in shw] if d.has_sh else None
        fast_in = fastw.tap()
        stride = per[si]["stride"][:, :]
        frame_num = per[si]["frm"][:, :]
        smc = smc_spec if d.spec else None
        sig2, sh2, fast2 = _hfix_post(
            smem, d, occlusion, directional, af_flags[si], smc, frame_num,
            stride, sig_in, sh_in, fast_in, fixed, m1, m2, am1, am2)
        for v in sig2 + (sh2 or []):
            outs[out_k][:, :] = v
            out_k += 1
        outs[out_k][:, :] = fast2
        out_k += 1
        ko += n_ho[si]


def _fused_hfix_core(descs, mat_occ, any_spec, af_flags, af_radius, smem,
                     smin, smax, wins, centers, outs, origin, scratch):
    """Fused history fix: shared geometry taps + per-signal stride masks/weights.

    Level selection runs over the hull of both signals' stride ranges; each signal
    gates taps with its own nearest-level mask (lw), so per-signal semantics match
    reblur_hfix2 exactly. The whole 20-tap loop is skipped when neither signal has a
    nonzero stride in the block (steady state for converged history).

    smin/smax are explicit traced scalars and `centers` only needs `[:, :]` reads,
    so the band pipeline (reblur_band.py) can drive this core over sliding buffers
    from its own grid shape."""
    wi = iter(wins)
    zw = next(wi)
    wnx = next(wi); wny = next(wi); wnz = next(wi)
    wrs = next(wi) if any_spec else None
    wmat = next(wi) if mat_occ else None
    sig_wins = []
    for d in descs:
        sw = [next(wi) for _ in range(d.c)]
        d1w = next(wi)
        fastw = next(wi)
        shw = [next(wi) for _ in range(3)] if d.has_sh else []
        sig_wins.append((sw, d1w, fastw, shw))

    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci)
    mat_r = next(ci) if mat_occ else None
    nv_r = [next(ci) for _ in range(3)]
    fsz_r = next(ci)
    per = []
    for d in descs:
        p = {k: next(ci) for k in ("stride", "nwp", "ha", "hb", "frm", "hds")}
        if d.spec:
            p["ra"] = next(ci); p["rb"] = next(ci)
            p["hd"] = next(ci); p["bguide"] = next(ci)
        per.append(p)

    rect_w = smem[_S_RW]
    rect_h = smem[_S_RH]
    ortho = smem[_S_ORTHO]
    fx0, fy0, fdx, fdy = (smem[_S_FRUSTUM], smem[_S_FRUSTUM + 1],
                          smem[_S_FRUSTUM + 2], smem[_S_FRUSTUM + 3])
    min_mat = [smem[_S_MM0], smem[_S_MM1]]

    bh, bw = ga_r.shape[:2]
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

    out_base = []
    k0 = 0
    for si, d in enumerate(descs):
        out_base.append(k0)
        k0 += (d.c + (3 if d.has_sh else 0) + 2
               + (2 if af_flags[si] else 0))

    # init: pass-through (caller's use_fix select keeps these where stride == 0)
    for si, d in enumerate(descs):
        sw, _, _, shw = sig_wins[si]
        b = out_base[si]
        for k_, sg in enumerate(sw):
            outs[b + k_][:, :] = sg.tap()
        if d.has_sh:
            for k_, s_ in enumerate(shw):
                outs[b + d.c + k_][:, :] = s_.tap()

    _SLEV = STRIDE_LEVELS

    @pl.when(smax > 0.0)
    def _():
        ga = ga_r[:, :]; gb = gb_r[:, :]
        ncx, ncy, ncz = wnx.tap(), wny.tap(), wnz.tap()
        nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
        plane_a = nvx * dirx + nvy * diry
        fsz = fsz_r[:, :]
        for si, (d, p) in enumerate(zip(descs, per)):
            p["stride_c"] = jnp.clip(p["stride"][:, :], _SLEV[0], _SLEV[-1])
            p["nwp_c"] = p["nwp"][:, :]
            p["ha_c"] = p["ha"][:, :]; p["hb_c"] = p["hb"][:, :]
            p["frm_c"] = p["frm"][:, :]
            p["hds_c"] = p["hds"][:, :]
            if mat_occ:
                p["mat_c"] = jnp.maximum(mat_r[:, :], min_mat[si])
            if d.spec:
                p["ra_c"] = p["ra"][:, :]; p["rb_c"] = p["rb"][:, :]
                p["hd_c"] = p["hd"][:, :]; p["bguide_c"] = p["bguide"][:, :]
            scratch[si][:, :] = 1.0 + p["frm_c"]
            b = out_base[si]
            for k_ in range(d.c + (3 if d.has_sh else 0)):
                outs[b + k_][:, :] = outs[b + k_][:, :] * (1.0 + p["frm_c"])

        smin_c = jnp.maximum(smin, jnp.float32(_SLEV[0]))
        smax_c = jnp.minimum(smax, jnp.float32(_SLEV[-1]))
        for li in range(len(_SLEV)):
            active = ((smax_c > jnp.float32(_M_LO[li]))
                      & (smin_c <= jnp.float32(_M_HI[li])))

            @pl.when(active)
            def _(li=li):
                lws = [((p["stride_c"] > jnp.float32(_M_LO[li]))
                        & (p["stride_c"] <= jnp.float32(_M_HI[li]))
                        ).astype(jnp.float32) for p in per]
                sums = [scratch[si][:, :] for si in range(len(descs))]
                accs = []
                for si, d in enumerate(descs):
                    b = out_base[si]
                    accs.append([outs[b + k_][:, :]
                                 for k_ in range(d.c + (3 if d.has_sh else 0))])
                for (i_, j_) in _TAPS20:
                    off_x = max(-28, min(28, int(round(i_ * _SLEV[li]))))
                    off_y = max(-28, min(28, int(round(j_ * _SLEV[li]))))
                    # ---- shared geometry chain ----
                    zs = zw.tap(off_y, off_x)
                    nsx = wnx.tap(off_y, off_x)
                    nsy = wny.tap(off_y, off_x)
                    nsz = wnz.tap(off_y, off_x)
                    angle = _acos_approx(nsx * ncx + nsy * ncy + nsz * ncz)
                    s_f = zs * s_lin + abs_ortho
                    kx = jnp.float32(off_x) * inv_w * fdx
                    ky = jnp.float32(off_y) * inv_h * fdy
                    w_scr = ((fx >= jnp.float32(-off_x))
                             & (fx <= rect_w - jnp.float32(1 + off_x))
                             & (fy >= jnp.float32(-off_y))
                             & (fy <= rect_h - jnp.float32(1 + off_y))
                             ).astype(jnp.float32)
                    plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
                    t_ = jnp.clip(1.0 - jnp.abs(plane_d * ga + gb), 0.0, 1.0)
                    w_geo = w_scr * (t_ * t_ * (3.0 - 2.0 * t_))
                    rs = wrs.tap(off_y, off_x) if any_spec else None
                    ms = wmat.tap(off_y, off_x) if mat_occ else None

                    # ---- per-signal weights + accumulate ----
                    for si, (d, p) in enumerate(zip(descs, per)):
                        sw, d1w, _, shw = sig_wins[si]
                        w_ = w_geo
                        if mat_occ:
                            w_ = w_ * (p["mat_c"] == jnp.maximum(ms, min_mat[si])
                                       ).astype(jnp.float32)
                        w_ = w_ * _exp_w(angle * p["nwp_c"])
                        if d.spec:
                            w_ = w_ * _exp_w(rs * rs * p["ra_c"] + p["rb_c"])
                        d1 = d1w.tap(off_y, off_x)
                        w_ = w_ * (1.0 + d1)
                        s_taps = [sg.tap(off_y, off_x) for sg in sw]
                        hs = s_taps[-1] * p["hds_c"]
                        hs_factor = jnp.clip(hs / fsz, 0.0, 1.0)
                        w_ = w_ * _exp_w(hs_factor * p["ha_c"] + p["hb_c"])
                        if d.spec:
                            dd = (jnp.abs(p["hd_c"] - hs)
                                  / (jnp.maximum(p["hd_c"], hs) + 0.001))
                            bg = p["bguide_c"]
                            tt = jnp.clip((dd - (0.2 + bg))
                                          / ((0.05 + bg) - (0.2 + bg)), 0.0, 1.0)
                            w_ = w_ * (tt * tt * (3.0 - 2.0 * tt))
                        w_ = w_ * lws[si]
                        sums[si] = sums[si] + w_
                        accs[si] = ([a + st * w_
                                     for a, st in zip(accs[si][:d.c], s_taps)]
                                    + accs[si][d.c:])
                        if d.has_sh:
                            sh_t = [s_.tap(off_y, off_x) for s_ in shw]
                            for t2, st in enumerate(sh_t):
                                accs[si][d.c + t2] = accs[si][d.c + t2] + st * w_
                for si, d in enumerate(descs):
                    b = out_base[si]
                    scratch[si][:, :] = sums[si]
                    for k_ in range(d.c + (3 if d.has_sh else 0)):
                        outs[b + k_][:, :] = accs[si][k_]

        for si, d in enumerate(descs):
            b = out_base[si]
            inv = 1.0 / jnp.maximum(scratch[si][:, :], 1e-15)
            for k_ in range(d.c + (3 if d.has_sh else 0)):
                outs[b + k_][:, :] = outs[b + k_][:, :] * inv

    # fast-history moments: separable 3x3 box (+ anti-firefly ring), per signal
    for si, d in enumerate(descs):
        _, _, fastw, _ = sig_wins[si]
        k_ = out_base[si] + d.c + (3 if d.has_sh else 0)
        b3_1, b3_2 = _box_sums(fastw, 1)
        outs[k_][:, :] = b3_1 / 9.0
        outs[k_ + 1][:, :] = b3_2 / 9.0
        if af_flags[si]:
            ring_n = float((2 * af_radius + 1) ** 2 - 9)
            b9_1, b9_2 = _box_sums(fastw, af_radius)
            outs[k_ + 2][:, :] = (b9_1 - b3_1) / ring_n
            outs[k_ + 3][:, :] = (b9_2 - b3_2) / ring_n


def history_fix_fused_pallas(sc, dc, config, *, signals, view_z_in, n, nv,
                             roughness, material_id, ga, gb, frustum_size,
                             perf_mode=False, dead=None, mesh=None,
                             occlusion=False, directional=False):
    """Run N signals through one fused history-fix launch, INCLUDING the
    fast-history clamp chain (the former XLA _hfix_post, now in-kernel).

    signals: list of dicts with keys
      signal, sh, stride, normal_weight_param, ha, hb, frame_num, data1,
      fast_history, hit_dist_scale, min_material, spec (bool), anti_firefly (bool),
      ra, rb, hit_dist, bguide (spec only).
    Returns per-signal dicts: signal, sh, fast (all final).
    """
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    descs = tuple(
        FSig(c=s["signal"].shape[-1], has_sh=s.get("sh") is not None,
             spec=bool(s.get("spec")))
        for s in signals)
    any_spec = any(d.spec for d in descs)
    af_flags = tuple(bool(s.get("anti_firefly")) for s in signals)
    assert len(descs) <= 2

    mm = [s.get("min_material", 0.0) for s in signals] + [0.0]
    # _NSC-layout scalars (shared with reblur_band): base 14 + 9 W2V (unused
    # here) + 12 _X slots; the in-kernel _hfix_post reads _X_HFN and _X_FASTEN
    fast_en = jnp.where(jnp.asarray(dc["max_fast_accumulated_frame_num"])
                        < jnp.asarray(dc["max_accumulated_frame_num"]), 1.0, 0.0)
    xs = [jnp.float32(0.0)] * 12
    xs[_X_HFN] = jnp.asarray(dc["history_fix_frame_num"], jnp.float32)
    xs[_X_FASTEN] = jnp.asarray(fast_en, jnp.float32)
    scalars = jnp.concatenate([
        jnp.asarray(sc["frustum"], jnp.float32).reshape(4),
        jnp.stack([jnp.asarray(sc["rect_size"][0], jnp.float32),
                   jnp.asarray(sc["rect_size"][1], jnp.float32),
                   jnp.asarray(sc["ortho_mode"], jnp.float32),
                   jnp.float32(0.0),
                   jnp.asarray(mm[0], jnp.float32),
                   jnp.asarray(mm[1], jnp.float32)]),
        jnp.asarray(dc["hit_dist_params"], jnp.float32).reshape(4),
        jnp.zeros((9,), jnp.float32),
        jnp.stack(xs),
    ])

    bf = lambda x: x.astype(jnp.bfloat16)
    view_z_dec = jnp.abs(view_z_in) * sc["view_z_scale"]
    windows = [view_z_dec, bf(n[..., 0]), bf(n[..., 1]), bf(n[..., 2])]
    if any_spec:
        windows.append(bf(roughness))
    if mat_occ:
        windows.append(bf(material_id))
    for s, d in zip(signals, descs):
        windows += [bf(p) for p in _split(s["signal"])[:d.c]]
        windows += [bf(s["data1"]), bf(s["fast_history"])]
        if d.has_sh:
            windows += [bf(p) for p in _split(s["sh"])[:3]]

    centers = [ga, gb]
    if mat_occ:
        centers.append(material_id)
    centers += [nv[..., 0], nv[..., 1], nv[..., 2], frustum_size]
    strides = []
    for s, d in zip(signals, descs):
        centers += [s["stride"], s["normal_weight_param"], s["ha"], s["hb"],
                    s["frame_num"], s["hit_dist_scale"]]
        if d.spec:
            centers += [s["ra"], s["rb"], s["hit_dist"], s["bguide"]]
        strides.append(s["stride"])

    n_ho_sum = sum(d.c + (3 if d.has_sh else 0) + 2 + (2 if af else 0)
                   for d, af in zip(descs, af_flags))
    # outputs are the FINAL post planes (signal + sh + fast per signal); the
    # core's raw outputs live in VMEM scratch and never touch HBM
    n_out = sum(d.c + (3 if d.has_sh else 0) + 1 for d in descs)
    n_scr = len(descs) + n_ho_sum
    block = _choose_block(1, len(windows) - 1, len(centers), n_out, n_scr)

    def launch(tree, origin_offset=None):
        windows_l, centers_l, strides_l, dead_l, scalars_l = tree
        smins, smaxs = [], []
        for st in strides_l:
            mn, mx = block_minmax(st, block, HALO2)
            smins.append(mn)
            smaxs.append(mx)
        skip = block_dead_mask(dead_l, block, HALO2)[0] if dead_l is not None else None
        return stencil_call2(
            functools.partial(_fused_hfix_kernel, descs, mat_occ, any_spec, af_flags,
                              3 if perf_mode else 4, skip is not None,
                              occlusion, directional),
            windows_l, n_out=n_out, halo=HALO2, block=block,
            scalars=scalars_l,
            block_scalars=smins + smaxs + ([skip] if skip is not None else []),
            center_inputs=centers_l, scratch_blocks=n_scr, block_skip=skip,
            origin_offset=origin_offset)

    tree = (windows, centers, strides, dead, scalars)
    if mesh is None:
        outs = launch(tree)
    else:
        from ..parallel.sharding import shard_stencil

        outs = shard_stencil(mesh, launch, HALO2[0], tree, view_z_in.shape[0])

    results = []
    k = 0
    for s, d, af in zip(signals, descs, af_flags):
        r = {"signal": jnp.stack(outs[k:k + d.c], -1)}
        k += d.c
        if d.has_sh:
            r["sh"] = jnp.concatenate([jnp.stack(outs[k:k + 3], -1),
                                       s["sh"][..., 3:]], -1)
            k += 3
        else:
            r["sh"] = None
        r["fast"] = outs[k]
        k += 1
        results.append(r)
    return results


def spatial_filter_fused_pallas(sc, dc, config, *, signals, view_z_in, n, nv,
                                roughness, material_id, ga, gb, perf_mode=False,
                                dead=None, mesh=None):
    """Run N signals through one fused spatial-filter launch.

    signals: list of dicts with keys
      signal (h,w,c), sh (or None), blur_radius, normal_weight_param, ha, hb,
      min_hit_dist_weight (plane), min_material (python float), spec (bool),
      wr_a, wr_b (spec), prepass (bool), hit_dist, rnd (list of n_dirs planes,
      prepass), cb_mask (or None).
    Shared geometry: view_z_in (raw), n (h,w,3 decoded), nv, roughness,
    material_id, ga, gb.
    Returns a list of per-signal dicts: signal, sh, hdt, wsum.
    """
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    n_dirs = 6 if perf_mode else 8
    descs = tuple(
        FSig(c=s["signal"].shape[-1], has_sh=s.get("sh") is not None,
             spec=bool(s.get("spec")), prepass=bool(s.get("prepass")),
             has_cb=s.get("cb_mask") is not None)
        for s in signals)
    any_spec = any(d.spec or d.prepass for d in descs)
    assert len(descs) <= 2

    mm = [s.get("min_material", 0.0) for s in signals] + [0.0]
    scalars = jnp.concatenate([
        jnp.asarray(sc["frustum"], jnp.float32).reshape(4),
        jnp.stack([jnp.asarray(sc["rect_size"][0], jnp.float32),
                   jnp.asarray(sc["rect_size"][1], jnp.float32),
                   jnp.asarray(sc["ortho_mode"], jnp.float32),
                   jnp.asarray(dc.get(
                       "use_prepass_not_only_for_specular_motion_estimation", 1.0),
                       jnp.float32),
                   jnp.asarray(mm[0], jnp.float32),
                   jnp.asarray(mm[1], jnp.float32)]),
        jnp.asarray(dc["hit_dist_params"], jnp.float32).reshape(4),
    ])

    bf = lambda x: x.astype(jnp.bfloat16)
    view_z_dec = jnp.abs(view_z_in) * sc["view_z_scale"]
    windows = [view_z_dec, bf(n[..., 0]), bf(n[..., 1]), bf(n[..., 2])]
    if any_spec:
        windows.append(bf(roughness))
    if mat_occ:
        windows.append(bf(material_id))
    for s, d in zip(signals, descs):
        windows += [bf(p) for p in _split(s["signal"])[:d.c]]
        if d.has_sh:
            windows += [bf(p) for p in _split(s["sh"])[:3]]

    centers = [ga, gb]
    if mat_occ:
        centers.append(material_id)
    centers += [nv[..., 0], nv[..., 1], nv[..., 2]]
    radius_all = None
    for s, d in zip(signals, descs):
        centers += [s["blur_radius"], s["normal_weight_param"], s["ha"], s["hb"],
                    s["min_hit_dist_weight"]]
        if d.spec:
            centers += [s["wr_a"], s["wr_b"]]
        if d.prepass:
            centers += [s["hit_dist"]] + list(s["rnd"])[:n_dirs]
        if d.has_cb:
            centers.append(s["cb_mask"])
        radius_all = (s["blur_radius"] if radius_all is None
                      else jnp.maximum(radius_all, s["blur_radius"]))

    n_out = sum(d.n_out for d in descs)
    # scratch = one hoisted tap plane per window; live accumulator values ~ n_out
    block = _choose_block(1, len(windows) - 1, len(centers), n_out,
                          len(windows) + n_out)

    def launch(tree, origin_offset=None):
        windows_l, centers_l, radius_l, dead_l, scalars_l = tree
        rmin_b, rmax_b = block_minmax(radius_l, block, HALO2)
        # tile-map block culling (Common.hlsli:118-135): all-sky blocks skip DMAs +
        # compute and zero their outputs; taps from live pixels into sky carry exactly
        # zero weight (the plane-distance smoothstep saturates), so live results and
        # the final dead-pixel passthrough are unaffected.
        skip = block_dead_mask(dead_l, block, HALO2)[0] if dead_l is not None else None
        return stencil_call2(
            functools.partial(_fused_blur_kernel, descs, n_dirs, mat_occ, any_spec,
                              skip is not None),
            windows_l, n_out=n_out, halo=HALO2, block=block,
            scalars=scalars_l,
            block_scalars=[rmin_b, rmax_b] + ([skip] if skip is not None else []),
            center_inputs=centers_l, scratch_blocks=len(windows_l), block_skip=skip,
            origin_offset=origin_offset)

    tree = (windows, centers, radius_all, dead, scalars)
    if mesh is None:
        outs = launch(tree)
    else:
        from ..parallel.sharding import shard_stencil

        outs = shard_stencil(mesh, launch, HALO2[0], tree, view_z_in.shape[0])

    results = []
    k = 0
    for s, d in zip(signals, descs):
        r = {"signal": jnp.stack(outs[k:k + d.c], -1)}
        k += d.c
        if d.has_sh:
            r["sh"] = jnp.concatenate([jnp.stack(outs[k:k + 3], -1),
                                       s["sh"][..., 3:]], -1)
            k += 3
        else:
            r["sh"] = None
        r["hdt"] = None
        if d.prepass:
            r["hdt"] = outs[k]
            k += 1
        r["wsum"] = None
        if d.has_cb:
            r["wsum"] = outs[k]
            k += 1
        results.append(r)
    return results
