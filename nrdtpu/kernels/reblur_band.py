"""REBLUR HistoryFix + Blur + PostBlur in ONE Pallas launch (band pipeline).

Band pipeline for the REBLUR spatial chain (the SIGMA twin was deleted in
round 5 after losing its on-chip A/B 19.5 vs 5.96 ms; this one stays opt-in
with its own A/B on record - see ARCHITECTURE.md section 8). The 3-launch chain costs
10.4 + 4.9 + 4.9 ms plus XLA glue at 1440p (bench_stages.json), with each launch
re-DMAing 4x-amplified halo windows of the SAME geometry planes. Here the grid
walks full-width row bands; at step i:

    history-fix(band i)   from TA-output windows + geometry windows
    blur       (band i-1) from the history-fix sliding buffer
    post-blur  (band i-2) from the blur sliding buffer -> HBM

Each band is computed exactly once per stage; geometry is DMA'd once for all
three stages. The tap loops are the UNCHANGED cores of reblur_fused.py
(_fused_hfix_core / _fused_blur_core) driven through Win2 adapters over the
sliding buffers; per-stage weight parameters (the _fused_*_params / _hfix_post
XLA glue of passes/reblur/kernels.py) move in-kernel because stages B/C consume
signals that only exist in VMEM.

Reference: REBLUR_HistoryFix.hlsli, REBLUR_Common_{Diffuse,Specular}SpatialFilter
.hlsli - identical per-tap formulas as the block path; only the execution
schedule changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import math as nm
from ..passes.reblur import common as C
from .harness2 import Win2
from .reblur_fused import (
    FSig, _fused_blur_core, _fused_hfix_core, _hdn, _hfix_post,
    _S_FRUSTUM, _S_RW, _S_RH, _S_ORTHO, _S_UPP, _S_MM0, _S_MM1, _S_HDP,
    _S_W2V, _S_X, _NSC,
    _X_DEN, _X_MRD, _X_PDS, _X_LAF, _X_HFS, _X_HFN, _X_RFR, _X_MAXR, _X_MINR,
    _X_MHDW, _X_FASTEN, _X_MAXFR,
)
from .reblur_pallas import NRD_EPS, _split

B = 40           # band height; >= 34 (max stage reach: blur +-32, hfix +-28)
RC = 8           # compute row-chunk inside a band (static python loop; keeps vregs low)
PADY = 80        # row edge-pad on stencilled inputs
PADX = 128       # col edge-pad (keeps DMA col starts tile-aligned)
E1 = 64          # history-fix compute col margin (blur taps +-32 into blur's margin)
E2 = 32          # blur compute col margin (post-blur taps +-32)
GH = 3 * B + 64  # geometry window rows: [j2*B - 32, j0*B + B + 32)
SH_ = B + 64     # TA-signal/fast window rows: [j0*B - 32, j0*B + B + 32)
DH = 3 * B + 32  # data1/dead window rows: [j2*B, j0*B + B + 28)

class _V:
    """Value wrapper: lets in-kernel values ride the cores' `ref[:, :]` reads."""

    def __init__(self, v):
        self.v = v
        self.shape = v.shape

    def __getitem__(self, idx):
        return self.v


class _CastOut:
    """Write adapter: `out[:, :] = v` lands in a dtype-cast slice of a buffer.

    r0 is a STATIC python int (the row-chunk base from the static chunk loop;
    traced bases fail Mosaic's tiling prover when tap offsets are added -
    ARCHITECTURE.md section 8)."""

    def __init__(self, ref, r0, nr, c0, nc):
        self.ref, self.r0, self.nr, self.c0, self.nc = ref, r0, nr, c0, nc

    def __setitem__(self, idx, v):
        self.ref[pl.ds(self.r0, self.nr), self.c0:self.c0 + self.nc] = \
            v.astype(self.ref.dtype)

    def __getitem__(self, idx):
        v = self.ref[pl.ds(self.r0, self.nr), self.c0:self.c0 + self.nc]
        return v.astype(jnp.float32)


def _geom_mid(smem, z, nx, ny, nz, fxp, fyp):
    """Shared per-stage geometry planes: nv, ga, gb, fsz, nov, view dir terms.

    Mirrors make_filter_geometry (passes/reblur/kernels.py:1783-1816) on a band
    region; z is pre-scaled |viewZ|."""
    f32 = jnp.float32
    rect_w = smem[_S_RW]
    rect_h = smem[_S_RH]
    ortho = smem[_S_ORTHO]
    fx0, fy0, fdx, fdy = (smem[_S_FRUSTUM], smem[_S_FRUSTUM + 1],
                          smem[_S_FRUSTUM + 2], smem[_S_FRUSTUM + 3])
    u = (fxp + 0.5) / rect_w
    v = (fyp + 0.5) / rect_h
    abs_ortho = jnp.abs(ortho)
    s_c = z * (1.0 - abs_ortho) + abs_ortho
    dirx = u * fdx + fx0
    diry = v * fdy + fy0
    xvx, xvy, xvz = dirx * s_c, diry * s_c, z
    m = [smem[_S_W2V + k] for k in range(9)]
    nvx = m[0] * nx + m[1] * ny + m[2] * nz
    nvy = m[3] * nx + m[4] * ny + m[5] * nz
    nvz = m[6] * nx + m[7] * ny + m[8] * nz
    fsz = smem[_S_X + _X_MRD] * nm.lerp(z, 1.0, jnp.abs(ortho))
    ga = 1.0 / (smem[_S_X + _X_PDS] * fsz)
    gb = -(nvx * xvx + nvy * xvy + nvz * xvz) * ga
    # view vector (view space): normalize(-Xv) for perspective
    inv_len = jax.lax.rsqrt(jnp.maximum(xvx * xvx + xvy * xvy + xvz * xvz, 1e-15))
    nov_persp = jnp.abs(nvx * xvx + nvy * xvy + nvz * xvz) * inv_len
    nov = jnp.where(ortho == 0.0, nov_persp, jnp.abs(nvz))
    return dict(nv=(nvx, nvy, nvz), ga=ga, gb=gb, fsz=fsz, nov=nov)


def _hfix_params(smem, enc_err, spec, g, z, rough, data1, sig_hd, dead):
    """In-kernel _fused_hfix_params (passes/reblur/kernels.py:2003-2032)."""
    frame_num = data1
    stride = smem[_S_X + _X_HFS] / (2.0 + frame_num)
    stride = stride * (frame_num < smem[_S_X + _X_HFN]).astype(jnp.float32)
    smc = nm.get_spec_magic_curve(rough)
    if spec:
        stride = stride * nm.lerp(0.5, 1.0, smc)
    stride = jnp.floor(stride) * (1.0 - dead)
    nlas = 1.0 / (1.0 + frame_num)
    nwp = nm.get_normal_weight_param(
        nlas, smem[_S_X + _X_LAF],
        rough if spec else jnp.ones_like(rough), enc_err)
    r2t = jnp.clip(jnp.exp2(smem[_S_HDP + 3] * rough * rough), 0.0, 1.0) if spec \
        else jnp.clip(jnp.exp2(smem[_S_HDP + 3]), 0.0, 1.0)
    hd_scale = _hdn(smem, z, r2t)
    hit_dist = sig_hd * hd_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, g["fsz"])
    ha, hb = nm.get_hit_distance_weight_params(
        hit_dist_factor, nlas, rough if spec else jnp.ones_like(rough))
    p = dict(stride=_V(stride), normal_weight_param=_V(nwp), ha=_V(ha), hb=_V(hb),
             frame_num=_V(frame_num), hit_dist_scale=_V(hd_scale),
             stride_v=stride, frame_num_v=frame_num, smc=smc)
    if spec:
        ra, rb = nm.get_relaxed_roughness_weight_params(
            rough * rough, jnp.sqrt(smem[_S_X + _X_RFR]))
        p.update(ra=_V(ra), rb=_V(rb), hit_dist=_V(hit_dist),
                 bguide=_V(nm.linearstep(0.03, 0.05, rough)))
    return p


def _blur_params(smem, enc_err, mode_post, spec, occlusion, g, z, rough, data1,
                 sig_hd, dead):
    """In-kernel _fused_diff_params/_fused_spec_params, BLUR/POST_BLUR modes only
    (passes/reblur/kernels.py:1819-1914)."""
    fraction_scale = (C.REBLUR_POST_BLUR_FRACTION_SCALE if mode_post
                      else C.REBLUR_BLUR_FRACTION_SCALE)
    radius_scale = C.REBLUR_POST_BLUR_RADIUS_SCALE if mode_post else 1.0
    smc = nm.get_spec_magic_curve(rough)
    r2t = jnp.clip(jnp.exp2(smem[_S_HDP + 3] * rough * rough), 0.0, 1.0) if spec \
        else jnp.clip(jnp.exp2(smem[_S_HDP + 3]), 0.0, 1.0)
    hit_dist = sig_hd * _hdn(smem, z, r2t)
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, g["fsz"])

    # get_fade_based_on_accumulated_frames (common.py:92)
    a_ = smem[_S_X + _X_HFN] * (2.0 / 3.0) + 1e-6
    b_ = smem[_S_X + _X_HFN] * (4.0 / 3.0) + 2e-6
    boost = 1.0 - nm.linearstep(a_, b_, data1)
    boost = boost * (1.0 - nm.pow01(1.0 - g["nov"], 5.0))
    if spec:
        boost = boost * smc
    nlas = 1.0 / (1.0 + C.REBLUR_SAMPLES_PER_FRAME * (1.0 - boost) * data1)

    if spec:
        area_factor = rough * hit_dist_factor * nlas
        blur_radius = smem[_S_X + _X_MAXR] * jnp.sqrt(nm.saturate(area_factor))
        blur_radius = blur_radius * radius_scale
        blur_radius = jnp.maximum(blur_radius, smem[_S_X + _X_MINR] * smc)
    else:
        blur_radius = smem[_S_X + _X_MAXR] * jnp.sqrt(
            nm.saturate(hit_dist_factor * nlas)) * radius_scale
        blur_radius = jnp.maximum(blur_radius, smem[_S_X + _X_MINR])
    blur_radius = blur_radius * (1.0 - dead)   # sky: keep block rmax live-only

    nwp = nm.get_normal_weight_param(
        nlas, smem[_S_X + _X_LAF], rough if spec else jnp.ones_like(rough),
        enc_err) / fraction_scale
    ha, hb = nm.get_hit_distance_weight_params(
        sig_hd, nlas, rough if spec else jnp.ones_like(rough))
    mhdw = smem[_S_X + _X_MHDW] * fraction_scale
    if spec:
        mhdw = mhdw * smc
    if not occlusion:
        mhdw = mhdw * jnp.sqrt(nlas)
    p = dict(radius=_V(blur_radius), nwp=_V(nwp), ha=_V(ha), hb=_V(hb),
             mhdw=_V(jnp.broadcast_to(mhdw, z.shape)), radius_v=blur_radius)
    if spec:
        rfs = nm.saturate(smem[_S_X + _X_RFR] * fraction_scale)
        wra, wrb = nm.get_roughness_weight_params(rough, rfs)
        p.update(wra=_V(wra), wrb=_V(wrb))
    return p


def _band_kernel(descs, n_dirs, mat_occ, any_spec, af_flags, af_radius, enc_err,
                 occlusion, directional, nb, Wh, smem, *refs):
    f32 = jnp.float32
    n_sig = len(descs)
    nw_geom = 4 + (1 if any_spec else 0) + (1 if mat_occ else 0)
    n_pl = [d.c + (3 if d.has_sh else 0) for d in descs]  # buffered planes/signal

    it = iter(refs)
    geom_h = [next(it) for _ in range(nw_geom)]
    sig_h = [[next(it) for _ in range(d.c)] for d in descs]
    sh_h = [[next(it) for _ in range(3 if d.has_sh else 0)] for d in descs]
    d1_h = [next(it) for _ in range(n_sig)]
    fast_h = [next(it) for _ in range(n_sig)]
    dead_h = next(it)
    outs = [next(it) for _ in range(sum(n_pl) + n_sig)]
    geom_w = [next(it) for _ in range(nw_geom)]
    sig_w = [[next(it) for _ in range(d.c)] for d in descs]
    sh_w = [[next(it) for _ in range(3 if d.has_sh else 0)] for d in descs]
    d1_w = [next(it) for _ in range(n_sig)]
    fast_w = [next(it) for _ in range(n_sig)]
    dead_w = next(it)
    n_ho = [d.c + (3 if d.has_sh else 0) + 2 + (2 if af_flags[si] else 0)
            for si, d in enumerate(descs)]
    b1 = [next(it) for _ in range(sum(n_pl))]       # (3B, Wh + 2*E1) bf16
    b2 = [next(it) for _ in range(sum(n_pl))]       # (3B, Wh + 2*E2) bf16
    fd = [next(it) for _ in range(n_sig)]           # fast2 delay (3B, Wh) f32
    ha_ = [next(it) for _ in range(sum(n_ho) + n_sig)]       # hfix outs+sums f32
    tap_scr = [next(it) for _ in range(nw_geom + sum(n_pl))]  # blur hoists
    sem = next(it)

    h = pl.program_id(0)
    i = pl.program_id(1)
    Wc1 = Wh + 2 * E1
    Wc2 = Wh + 2 * E2
    col0 = h * Wh
    Hp = nb * B

    # ---- DMA ----
    # row starts are multiples of 8 by construction; assert for Mosaic's prover
    def m8(x):
        return pl.multiple_of(x, 8)

    r_g = m8(jnp.clip(i * B + PADY - (2 * B + 32), 0, Hp + 2 * PADY - GH))
    r_s = m8(jnp.clip(i * B + PADY - 32, 0, Hp + 2 * PADY - SH_))
    r_d = m8(jnp.clip(i * B + PADY - 2 * B, 0, Hp + 2 * PADY - DH))
    c_w = pl.multiple_of(h * Wh, 128)
    cps = []

    def cp(src, dst, r0):
        cps.append(pltpu.make_async_copy(
            src.at[pl.ds(r0, dst.shape[0]), pl.ds(c_w, dst.shape[1])], dst,
            sem.at[len(cps)]))

    for s_, w_ in zip(geom_h, geom_w):
        cp(s_, w_, r_g)
    for sl, wl in zip(sig_h + sh_h, sig_w + sh_w):
        for s_, w_ in zip(sl, wl):
            cp(s_, w_, r_s)
    for s_, w_ in zip(d1_h, d1_w):
        cp(s_, w_, r_d)
    for s_, w_ in zip(fast_h, fast_w):
        cp(s_, w_, r_s)
    cp(dead_h, dead_w, r_d)
    for c_ in cps:
        c_.start()
    for c_ in cps:
        c_.wait()

    @pl.when(i == 0)
    def _():
        for b_ in b1 + b2 + fd:
            b_[:, :] = jnp.zeros(b_.shape, b_.dtype)

    def geom_wins(hy, hx, bw, r0):
        return [Win2(r, RC, bw, hy, hx,
                     upcast=r.dtype == jnp.bfloat16, row0=r0)
                for r in geom_w]

    def coords(nc, row0, ext):
        r_ = jax.lax.broadcasted_iota(jnp.int32, (RC, nc), 0).astype(f32)
        c_ = jax.lax.broadcasted_iota(jnp.int32, (RC, nc), 1).astype(f32)
        return (r_ + jnp.asarray(row0).astype(f32),
                c_ + jnp.asarray(col0 - ext).astype(f32))

    def _stage_geom(nc, row_off, col_off, row0, ext):
        """Center geometry planes for a stage chunk (RC, nc); row_off may be
        traced (8-aligned static base + fori_loop chunk base)."""
        gi = iter(geom_w)

        def g_(cast=True):
            v = next(gi)[pl.ds(row_off, RC), col_off:col_off + nc]
            return v.astype(f32) if cast and v.dtype != f32 else v

        z = g_()
        nx = g_(); ny = g_(); nz = g_()
        rough = g_() if any_spec else jnp.ones((RC, nc), f32)
        mat = g_() if mat_occ else None
        fyp, fxp = coords(nc, row0, ext)
        g = _geom_mid(smem, z, nx, ny, nz, fxp, fyp)
        return z, rough, mat, g

    # Row-chunked stages: each 40-row band computes
    # in RC=8-row slices so the cores' live accumulators are (8, w) values
    # (~6 vregs vs ~30 for the full band - no spills). The chunk loop is a
    # PYTHON loop on purpose: a fori_loop makes the chunk base traced, and the
    # cores' tap row offsets (base + hy + dy, dy an arbitrary Poisson int) then
    # hit Mosaic's dynamic-slice prover, which requires dim-0 starts divisible
    # by the (8,128) tile - unprovable for dy not a multiple of 8 (the round-4
    # on-chip failure). Static bases need no proof; instruction count matches
    # the pre-chunk full-band body (5x the statements at 1/5 the vreg width).
    # Slides run in a separate chunk loop BEFORE the stage appends (the
    # appended rows are read by later slide chunks otherwise).
    nch = B // RC

    def slide(k, carry):
        r0 = pl.multiple_of(k * RC, RC)
        for b_ in b1 + b2 + fd:
            b_[pl.ds(r0, RC), :] = b_[pl.ds(B + r0, RC), :]
        return carry

    jax.lax.fori_loop(0, (2 * B) // RC, slide, 0, unroll=False)

    # ================= stage A: history fix, band j0 = i =================
    # geometry rows: band j0 row r -> (2B+32) + r; signal/fast: 32 + r; d1: 2B + r
    def stage_a(kc):
        r0 = kc * RC
        z_a, rough_a, mat_a, g_a = _stage_geom(Wc1, 2 * B + 32 + r0, PADX - E1,
                                               i * B + r0, E1)
        dead_a = dead_w[pl.ds(2 * B + r0, RC),
                        PADX - E1:PADX - E1 + Wc1].astype(f32)
        wins_a = geom_wins(2 * B + 32, PADX - E1, Wc1, r0)
        per_a = [None] * n_sig
        centers_a = [_V(g_a["ga"]), _V(g_a["gb"])]
        if mat_occ:
            centers_a.append(_V(mat_a))
        centers_a += [_V(g_a["nv"][0]), _V(g_a["nv"][1]), _V(g_a["nv"][2]),
                      _V(g_a["fsz"])]
        for si, d in enumerate(descs):
            wins_a += [Win2(r, RC, Wc1, 32, PADX - E1, upcast=True, row0=r0)
                       for r in sig_w[si]]
            wins_a.append(Win2(d1_w[si], RC, Wc1, 2 * B, PADX - E1, upcast=True,
                               row0=r0))
            wins_a.append(Win2(fast_w[si], RC, Wc1, 32, PADX - E1, upcast=True,
                               row0=r0))
            wins_a += [Win2(r, RC, Wc1, 32, PADX - E1, upcast=True, row0=r0)
                       for r in sh_w[si]]
        # per-signal params need the TA hit-dist plane (last channel, center tap)
        k0 = nw_geom
        for si, d in enumerate(descs):
            hd_c = sig_w[si][d.c - 1][pl.ds(32 + r0, RC),
                                      PADX - E1:PADX - E1 + Wc1].astype(f32)
            d1_c = d1_w[si][pl.ds(2 * B + r0, RC),
                            PADX - E1:PADX - E1 + Wc1].astype(f32)
            per_a[si] = p = _hfix_params(smem, enc_err, d.spec, g_a, z_a,
                                         rough_a, d1_c, hd_c, dead_a)
            centers_a += [p["stride"], p["normal_weight_param"], p["ha"],
                          p["hb"], p["frame_num"], p["hit_dist_scale"]]
            if d.spec:
                centers_a += [p["ra"], p["rb"], p["hit_dist"], p["bguide"]]
        smax = functools.reduce(jnp.maximum,
                                [jnp.max(p["stride_v"]) for p in per_a])
        smin = functools.reduce(jnp.minimum,
                                [jnp.min(p["stride_v"]) for p in per_a])

        houts = [_CastOut(r, 0, RC, 0, Wc1) for r in ha_[:sum(n_ho)]]
        hsums = [_CastOut(r, 0, RC, 0, Wc1)
                 for r in ha_[sum(n_ho):sum(n_ho) + n_sig]]
        _fused_hfix_core(descs, mat_occ, any_spec, af_flags, af_radius, smem,
                         smin, smax, wins_a, centers_a, houts,
                         (i * B + r0, col0 - E1), hsums)

        # _hfix_post + write into b1 / fast-delay
        kb = 0
        ko = 0
        k0 = nw_geom
        for si, d in enumerate(descs):
            npl = d.c + (3 if d.has_sh else 0)
            fixed = [houts[ko + k_][:, :] for k_ in range(npl)]
            m1 = houts[ko + npl][:, :]
            m2 = houts[ko + npl + 1][:, :]
            am1 = houts[ko + npl + 2][:, :] if af_flags[si] else None
            am2 = houts[ko + npl + 3][:, :] if af_flags[si] else None
            sig_in = [w.tap() for w in wins_a[k0:k0 + d.c]]
            fast_in = wins_a[k0 + d.c + 1].tap()
            sh_in = [w.tap() for w in wins_a[k0 + d.c + 2:k0 + d.c + 2 + 3]] \
                if d.has_sh else None
            sig2, sh2, fast2 = _hfix_post(
                smem, d, occlusion, directional, af_flags[si], per_a[si]["smc"],
                per_a[si]["frame_num_v"], per_a[si]["stride_v"], sig_in, sh_in,
                fast_in, fixed, m1, m2, am1, am2)
            planes = sig2 + (sh2 or [])
            for k_, v in enumerate(planes):
                b_ = b1[kb + k_]
                b_[pl.ds(2 * B + r0, RC), :] = v.astype(b_.dtype)
            fd[si][pl.ds(2 * B + r0, RC), :] = fast2[:, E1:E1 + Wh]
            kb += npl
            ko += n_ho[si]
            k0 += d.c + 2 + (3 if d.has_sh else 0)

    for _kc in range(nch):
        stage_a(_kc)

    # ================= stage B: blur, band j1 = i - 1 =================
    def stage_b(kc):
        r0 = kc * RC
        z_b, rough_b, mat_b, g_b = _stage_geom(Wc2, B + 32 + r0, PADX - E2,
                                               (i - 1) * B + r0, E2)
        dead_b = dead_w[pl.ds(B + r0, RC),
                        PADX - E2:PADX - E2 + Wc2].astype(f32)
        wins_b = geom_wins(B + 32, PADX - E2, Wc2, r0)
        kb = 0
        for si, d in enumerate(descs):
            npl = d.c + (3 if d.has_sh else 0)
            wins_b += [Win2(b1[kb + k_], RC, Wc2, B, E1 - E2, upcast=True,
                            row0=r0)
                       for k_ in range(npl)]
            kb += npl
        centers_b = [_V(g_b["ga"]), _V(g_b["gb"])]
        if mat_occ:
            centers_b.append(_V(mat_b))
        centers_b += [_V(g_b["nv"][0]), _V(g_b["nv"][1]), _V(g_b["nv"][2])]
        rmax_b = None
        kb = 0
        for si, d in enumerate(descs):
            d1_c = d1_w[si][pl.ds(B + r0, RC),
                            PADX - E2:PADX - E2 + Wc2].astype(f32)
            hd_c = b1[kb + d.c - 1][pl.ds(B + r0, RC),
                                    E1 - E2:E1 - E2 + Wc2].astype(f32)
            p = _blur_params(smem, enc_err, False, d.spec, occlusion, g_b, z_b,
                             rough_b, d1_c, hd_c, dead_b)
            centers_b += [p["radius"], p["nwp"], p["ha"], p["hb"], p["mhdw"]]
            if d.spec:
                centers_b += [p["wra"], p["wrb"]]
            r_ = jnp.max(p["radius_v"])
            rmax_b = r_ if rmax_b is None else jnp.maximum(rmax_b, r_)
            kb += d.c + (3 if d.has_sh else 0)
        bouts = []
        kb = 0
        for si, d in enumerate(descs):
            npl = d.c + (3 if d.has_sh else 0)
            for k_ in range(npl):
                bouts.append(_CastOut(b2[kb + k_], 2 * B + r0, RC, 0, Wc2))
            kb += npl
        tap_a = [_CastOut(t_, 0, RC, 0, Wc2) for t_ in tap_scr]
        _fused_blur_core(descs, n_dirs, mat_occ, any_spec, smem, rmax_b, wins_b,
                         centers_b, bouts, ((i - 1) * B + r0, col0 - E2), tap_a)

    for _kc in range(nch):
        stage_b(_kc)

    # ================= stage C: post-blur, band j2 = i - 2 =================
    def stage_c(kc):
        r0 = kc * RC
        z_c, rough_c, mat_c, g_c = _stage_geom(Wh, 32 + r0, PADX,
                                               (i - 2) * B + r0, 0)
        dead_c = dead_w[pl.ds(r0, RC), PADX:PADX + Wh].astype(f32)
        wins_c = geom_wins(32, PADX, Wh, r0)
        kb = 0
        for si, d in enumerate(descs):
            npl = d.c + (3 if d.has_sh else 0)
            wins_c += [Win2(b2[kb + k_], RC, Wh, B, E2, upcast=True, row0=r0)
                       for k_ in range(npl)]
            kb += npl
        centers_c = [_V(g_c["ga"]), _V(g_c["gb"])]
        if mat_occ:
            centers_c.append(_V(mat_c))
        centers_c += [_V(g_c["nv"][0]), _V(g_c["nv"][1]), _V(g_c["nv"][2])]
        rmax_c = None
        kb = 0
        for si, d in enumerate(descs):
            d1_c = d1_w[si][pl.ds(r0, RC), PADX:PADX + Wh].astype(f32)
            hd_c = b2[kb + d.c - 1][pl.ds(B + r0, RC), E2:E2 + Wh].astype(f32)
            p = _blur_params(smem, enc_err, True, d.spec, occlusion, g_c, z_c,
                             rough_c, d1_c, hd_c, dead_c)
            centers_c += [p["radius"], p["nwp"], p["ha"], p["hb"], p["mhdw"]]
            if d.spec:
                centers_c += [p["wra"], p["wrb"]]
            r_ = jnp.max(p["radius_v"])
            rmax_c = r_ if rmax_c is None else jnp.maximum(rmax_c, r_)
            kb += d.c + (3 if d.has_sh else 0)
        outs_c = [_CastOut(o, r0, RC, 0, Wh) for o in outs[:sum(n_pl)]]
        tap_c = [_CastOut(t_, 0, RC, 0, Wh) for t_ in tap_scr]
        _fused_blur_core(descs, n_dirs, mat_occ, any_spec, smem, rmax_c, wins_c,
                         centers_c, outs_c, ((i - 2) * B + r0, col0), tap_c)

    for _kc in range(nch):
        stage_c(_kc)

    # fast2 exits with the same 2-step delay as the post-blur band
    for si in range(n_sig):
        outs[sum(n_pl) + si][:, :] = fd[si][0:B, :]


def reblur_spatial_band(sc, dc, config, geom, view_z_in, *, diff=None, spec=None,
                        occlusion=False, directional=False, perf_mode=False,
                        col_split=None, interpret: bool = False):
    """Fused HistoryFix+Blur+PostBlur. diff/spec: {signal, sh, data1,
    fast_history, anti_firefly}. Returns {diff, diff_sh, diff_fast, spec, ...}."""
    h, w = view_z_in.shape
    f32 = jnp.float32
    bf = jnp.bfloat16
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    n_dirs = 6 if perf_mode else 8

    sigs, order = [], []
    for name, s in (("diff", diff), ("spec", spec)):
        if s is not None:
            sigs.append(s)
            order.append(name)
    descs = tuple(FSig(c=s["signal"].shape[-1], has_sh=s.get("sh") is not None,
                       spec=(nm_ == "spec"))
                  for nm_, s in zip(order, sigs))
    any_spec = any(d.spec for d in descs)
    af_flags = tuple(bool(s.get("anti_firefly")) for s in sigs)
    af_radius = 3 if perf_mode else 4
    enc_err = nm.normal_encoding_error(int(config.normal_encoding))

    cs = col_split or 4
    nseg = -(-w // 128)
    cs = min(cs, nseg)
    while nseg % cs:
        cs -= 1
    nb = -(-h // B)
    Hp = nb * B
    Wp = nseg * 128
    Wh = Wp // cs

    def padded(img, dtype=None):
        p = jnp.pad(img, ((PADY, PADY + Hp - h), (PADX, PADX + Wp - w)),
                    mode="edge")
        return p.astype(dtype) if dtype is not None else p

    view_z_dec = jnp.abs(view_z_in) * sc["view_z_scale"]
    n = geom["n"]
    args = [padded(view_z_dec), padded(n[..., 0], bf), padded(n[..., 1], bf),
            padded(n[..., 2], bf)]
    if any_spec:
        args.append(padded(geom["roughness"], bf))
    if mat_occ:
        args.append(padded(geom["material_id"], bf))
    for s, d in zip(sigs, descs):
        args += [padded(p_, bf) for p_ in _split(s["signal"])[:d.c]]
    for s, d in zip(sigs, descs):
        args += [padded(p_, bf) for p_ in (_split(s["sh"])[:3] if d.has_sh else [])]
    for s in sigs:
        args.append(padded(s["data1"], bf))
    for s in sigs:
        args.append(padded(s["fast_history"], bf))
    dead = geom.get("dead")
    dead = jnp.zeros((h, w), f32) if dead is None else dead.astype(f32)
    args.append(padded(dead, bf))

    mm = [s.get("min_material", 0.0) for s in sigs] + [0.0, 0.0]
    fast_en = jnp.where(jnp.asarray(dc["max_fast_accumulated_frame_num"])
                        < jnp.asarray(dc["max_accumulated_frame_num"]), 1.0, 0.0)
    scalars = jnp.concatenate([
        jnp.asarray(sc["frustum"], f32).reshape(4),
        jnp.stack([jnp.asarray(sc["rect_size"][0], f32),
                   jnp.asarray(sc["rect_size"][1], f32),
                   jnp.asarray(sc["ortho_mode"], f32),
                   jnp.float32(0.0),
                   jnp.asarray(mm[0], f32), jnp.asarray(mm[1], f32)]),
        jnp.asarray(dc["hit_dist_params"], f32).reshape(4),
        jnp.asarray(sc["world_to_view"])[:3, :3].reshape(-1).astype(f32),
        jnp.stack([jnp.asarray(sc["denoising_range"], f32),
                   jnp.asarray(sc["min_rect_dim_mul_unproject"], f32),
                   jnp.asarray(dc["plane_dist_sensitivity"], f32),
                   jnp.asarray(dc["lobe_angle_fraction"], f32),
                   jnp.asarray(dc["history_fix_base_pixel_stride"], f32),
                   jnp.asarray(dc["history_fix_frame_num"], f32),
                   jnp.asarray(dc["roughness_fraction"], f32),
                   jnp.asarray(dc["max_blur_radius"], f32),
                   jnp.asarray(dc["min_blur_radius"], f32),
                   jnp.asarray(dc["min_hit_distance_weight"], f32),
                   jnp.asarray(fast_en, f32),
                   jnp.asarray(dc["max_accumulated_frame_num"], f32)])])

    WIN_W = Wh + 2 * PADX
    nw_geom = 4 + (1 if any_spec else 0) + (1 if mat_occ else 0)
    n_pl = [d.c + (3 if d.has_sh else 0) for d in descs]
    n_ho = [d.c + (3 if d.has_sh else 0) + 2 + (2 if af else 0)
            for d, af in zip(descs, af_flags)]
    n_dma = nw_geom + sum(n_pl) + 2 * len(descs) + 1

    scratch = (
        [pltpu.VMEM((GH, WIN_W), a.dtype) for a in args[:nw_geom]]
        + [pltpu.VMEM((SH_, WIN_W), bf) for _ in range(sum(d.c for d in descs))]
        + [pltpu.VMEM((SH_, WIN_W), bf)
           for d in descs for _ in range(3 if d.has_sh else 0)]
        + [pltpu.VMEM((DH, WIN_W), bf) for _ in descs]          # data1
        + [pltpu.VMEM((SH_, WIN_W), bf) for _ in descs]         # fast
        + [pltpu.VMEM((DH, WIN_W), bf)]                         # dead
        + [pltpu.VMEM((3 * B, Wh + 2 * E1), bf) for _ in range(sum(n_pl))]
        + [pltpu.VMEM((3 * B, Wh + 2 * E2), bf) for _ in range(sum(n_pl))]
        + [pltpu.VMEM((3 * B, Wh), f32) for _ in descs]         # fast delay
        + [pltpu.VMEM((B, Wh + 2 * E1), f32)
           for _ in range(sum(n_ho) + len(descs))]              # hfix outs+sums
        + [pltpu.VMEM((B, Wh + 2 * E2), f32)
           for _ in range(nw_geom + sum(n_pl))]                 # blur tap hoists
        + [pltpu.SemaphoreType.DMA((n_dma,))])

    n_out = sum(n_pl) + len(descs)
    grid = (cs, nb + 2)
    out_specs = tuple(
        pl.BlockSpec((B, Wh), lambda ci, i: (jnp.clip(i - 2, 0, nb - 1), ci),
                     memory_space=pltpu.VMEM)
        for _ in range(n_out))
    out_shape = tuple(jax.ShapeDtypeStruct((Hp, Wp), f32) for _ in range(n_out))
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] \
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(args)

    outs = pl.pallas_call(
        functools.partial(_band_kernel, descs, n_dirs, mat_occ, any_spec,
                          af_flags, af_radius, enc_err, occlusion, directional,
                          nb, Wh),
        grid=grid, in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(scalars, *args)

    res = {}
    k = 0
    for nm_, s, d in zip(order, sigs, descs):
        res[nm_] = jnp.stack([o[:h, :w] for o in outs[k:k + d.c]], -1)
        k += d.c
        if d.has_sh:
            res[nm_ + "_sh"] = jnp.concatenate(
                [jnp.stack([o[:h, :w] for o in outs[k:k + 3]], -1),
                 s["sh"][..., 3:]], -1)
            k += 3
        else:
            res[nm_ + "_sh"] = None
    for nm_ in order:
        res[nm_ + "_fast"] = outs[k][:h, :w]
        k += 1
    return res
