"""bf16 tap-pipeline experiment for the fused spatial-filter kernel family (round 4).

bench_vpu measured fma_bf16 at 1.9 us vs fma_f32 3.1 (vregs hold 2x bf16 elements),
unaligned bf16 loads at 5.6 vs 13.6 f32, and compare/select chains at 6 us/op.
bench_bf_probe measured Mosaic bf16 legality on this target (v5e): mul/fma/exp/div/
clip/converts ok; sqrt, rsqrt and ALL comparisons illegal in bf16.

This bench replicates the fused BLUR tap loop (2 signals, 13 windows, level buckets,
same block/halo machinery as reblur_fused._fused_blur_kernel) in the candidate round-4
mixed-precision shape:
  f32 : viewZ taps + plane-distance chain (catastrophic cancellation) + acos sqrt hop
  bf16: normal/roughness/signal taps, angle + hit-dist + Gaussian weights, in-screen
        border-distance mask (arith, no cmp), accumulation

Variants:
  f32 when      : round-3 production shape (all-f32, cmp mask, pl.when levels)
  f32 arith     : all-f32 with the border-distance arithmetic mask
  bf16          : mixed-precision pipeline, bf16 accumulation
  bf16 f32acc   : mixed-precision, signal accumulation in f32
  bf16 switch   : mixed with lax.switch level dispatch instead of the pl.when chain
  bf16 3lev     : mixed with a 3-entry radius lattice (dead-issue scaling probe)
  f32 switch    : all-f32 arith mask via lax.switch (isolate switch vs bf16)

Usage: python bench_tap2.py [variant ...]  (TPU only; ~1-4 min compile per variant)
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bench import setup_jax_cache
from nrdtpu.kernels.harness2 import block_minmax, stencil_call2
from nrdtpu.kernels.reblur_blur2 import HALO2, _LEV, _LO, _HI, _static_offsets
from nrdtpu.kernels.reblur_pallas import _acos_approx, _exp_w, _sstep10
from nrdtpu.kernels import bfk

setup_jax_cache()

_SMOKE = bool(int(os.environ.get("NRDTPU_TAP2_SMOKE", "0")))
W, H = (512, 192) if _SMOKE else (2560, 1440)
N = 2 if _SMOKE else 64  # frames per timed call

_LEV3 = (2.0, 8.0, 32.0)
_LO3 = (-1e9, 2.0, 8.0)
_HI3 = (2.0, 8.0, 1e9)

BF = jnp.bfloat16


def _offsets3(n_dirs=8):
    from nrdtpu import math as nm
    out = []
    for tap in np.asarray(nm.SPECIAL_8)[:n_dirs]:
        per_level = []
        for lv in _LEV3:
            ox = int(np.clip(round(float(tap[0]) * lv), -32, 32))
            oy = int(np.clip(round(float(tap[1]) * lv), -32, 32))
            k_t = -0.66 * (float(tap[2]) * lv) ** 2
            per_level.append((oy, ox, k_t))
        out.append(per_level)
    return out


def _replica_f32(mask, dispatch, lev3, smem, bsm, wins, centers, outs, origin,
                 scratch):
    """Round-3 production shape: all-f32 tap chain."""
    n_dirs = 8
    zw = wins[0]
    wnx, wny, wnz, wrs = wins[1:5]
    sig_wins = [wins[5:9], wins[9:13]]
    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci)
    nv_r = [next(ci) for _ in range(3)]
    per = []
    for _ in range(2):
        p = {k: next(ci)[:, :] for k in ("radius", "nwp", "ha", "hb", "mhdw",
                                         "wra", "wrb")}
        per.append(p)
    rmax_b = bsm[1]
    rect_w, rect_h, ortho = smem[0], smem[1], smem[2]

    bh, bw = ga_r.shape[:2]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    fx = origin[1].astype(jnp.float32) + col
    fy = origin[0].astype(jnp.float32) + row
    if mask == "arith":
        bdists = bfk.border_dists(fx, fy, rect_w, rect_h, jnp.float32)
    u = (fx + 0.5) * inv_w
    v = (fy + 0.5) * inv_h
    abs_ortho = jnp.abs(ortho)
    s_lin = 1.0 - abs_ortho
    dirx = u * 0.9 - 0.45
    diry = v * 0.5 - 0.25

    ga = ga_r[:, :]; gb = gb_r[:, :]
    ncx, ncy, ncz = wnx.tap(), wny.tap(), wnz.tap()
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    plane_a = nvx * dirx + nvy * diry

    lev = _LEV3 if lev3 else _LEV
    lo = _LO3 if lev3 else _LO
    hi = _HI3 if lev3 else _HI
    for p in per:
        radius = jnp.clip(p["radius"], lev[0], lev[-1])
        p["inv_r2"] = 1.0 / (radius * radius)

    for si in range(2):
        scratch[si][:, :] = jnp.ones((bh, bw), jnp.float32)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = sig_wins[si][k_].tap()

    i_b, j_b = pl.program_id(0), pl.program_id(1)
    rmax = jnp.minimum(rmax_b[i_b, j_b], jnp.float32(lev[-1]))
    taps = _offsets3(n_dirs) if lev3 else _static_offsets(n_dirs)

    def level_body(li):
        sums = [scratch[si][:, :] for si in range(2)]
        accs = [[outs[si * 4 + k_][:, :] for k_ in range(4)] for si in range(2)]
        for k in range(n_dirs):
            off_y, off_x, k_t = taps[k][li]
            zs = zw.tap(off_y, off_x)
            nsx = wnx.tap(off_y, off_x)
            nsy = wny.tap(off_y, off_x)
            nsz = wnz.tap(off_y, off_x)
            rs = wrs.tap(off_y, off_x)
            angle = _acos_approx(ncx * nsx + ncy * nsy + ncz * nsz)
            s_f = zs * s_lin + abs_ortho
            kx = jnp.float32(off_x) * inv_w * 0.9
            ky = jnp.float32(off_y) * inv_h * 0.5
            if mask == "arith":
                w_geo = bfk.w_inscreen(bdists, off_y, off_x)
            else:
                w_geo = ((fx >= jnp.float32(-off_x))
                         & (fx <= rect_w - jnp.float32(1 + off_x))
                         & (fy >= jnp.float32(-off_y))
                         & (fy <= rect_h - jnp.float32(1 + off_y))
                         ).astype(jnp.float32)
            plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
            w_geo = w_geo * _sstep10(jnp.abs(plane_d * ga + gb))
            for si, p in enumerate(per):
                w_ = w_geo * _sstep10(jnp.abs(angle * p["nwp"]))
                if si == 1:
                    w_ = w_ * _sstep10(jnp.abs(rs * p["wra"] + p["wrb"]))
                s_taps = [sg.tap(off_y, off_x) for sg in sig_wins[si]]
                s_hd = s_taps[-1]
                w_ = w_ * (p["mhdw"] + (1.0 - p["mhdw"])
                           * _exp_w(s_hd * p["ha"] + p["hb"]))
                w_ = w_ * jnp.exp(jnp.float32(k_t) * p["inv_r2"])
                sums[si] = sums[si] + w_
                accs[si] = [a + st * w_ for a, st in zip(accs[si], s_taps)]
        for si in range(2):
            scratch[si][:, :] = sums[si]
            for k_ in range(4):
                outs[si * 4 + k_][:, :] = accs[si][k_]

    _dispatch(dispatch, lev, lo, hi, rmax, level_body)
    for si in range(2):
        inv = 1.0 / jnp.maximum(scratch[si][:, :], 1e-15)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = outs[si * 4 + k_][:, :] * inv


def _replica_bf(f32acc, dispatch, lev3, smem, bsm, wins, centers, outs, origin,
                scratch):
    """Round-4 candidate: mixed-precision tap chain (see module docstring)."""
    n_dirs = 8
    zw = wins[0]
    wnx, wny, wnz, wrs = wins[1:5]
    sig_wins = [wins[5:9], wins[9:13]]
    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci)
    nv_r = [next(ci) for _ in range(3)]
    per = []
    for _ in range(2):
        p = {k: next(ci)[:, :].astype(BF) for k in ("nwp", "ha", "hb", "mhdw",
                                                    "wra", "wrb")}
        p["radius"] = next(ci)[:, :]
        per.append(p)
    rmax_b = bsm[1]
    rect_w, rect_h, ortho = smem[0], smem[1], smem[2]

    bh, bw = ga_r.shape[:2]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    fx = origin[1].astype(jnp.float32) + col
    fy = origin[0].astype(jnp.float32) + row
    bdists = bfk.border_dists(fx, fy, rect_w, rect_h, BF)
    u = (fx + 0.5) * inv_w
    v = (fy + 0.5) * inv_h
    abs_ortho = jnp.abs(ortho)
    s_lin = 1.0 - abs_ortho
    dirx = u * 0.9 - 0.45
    diry = v * 0.5 - 0.25

    # f32 geometry planes (plane-distance chain)
    ga = ga_r[:, :]; gb = gb_r[:, :]
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    plane_a = nvx * dirx + nvy * diry
    # bf16 center normals (angle chain)
    ncx, ncy, ncz = wnx.tapb(), wny.tapb(), wnz.tapb()

    lev = _LEV3 if lev3 else _LEV
    lo = _LO3 if lev3 else _LO
    hi = _HI3 if lev3 else _HI
    for p in per:
        radius = jnp.clip(p["radius"], lev[0], lev[-1])
        p["inv_r2"] = (1.0 / (radius * radius)).astype(BF)  # per-block f32 div

    acc_dt = jnp.float32 if f32acc else BF
    for si in range(2):
        scratch[si][:, :] = jnp.ones((bh, bw), jnp.float32)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = sig_wins[si][k_].tap()

    i_b, j_b = pl.program_id(0), pl.program_id(1)
    rmax = jnp.minimum(rmax_b[i_b, j_b], jnp.float32(lev[-1]))
    taps = _offsets3(n_dirs) if lev3 else _static_offsets(n_dirs)

    def level_body(li):
        sums = [scratch[si][:, :].astype(acc_dt) for si in range(2)]
        accs = [[outs[si * 4 + k_][:, :].astype(acc_dt) for k_ in range(4)]
                for si in range(2)]
        for k in range(n_dirs):
            off_y, off_x, k_t = taps[k][li]
            # ---- f32 geometry: viewZ plane distance ----
            zs = zw.tap(off_y, off_x)
            s_f = zs * s_lin + abs_ortho
            kx = jnp.float32(off_x) * inv_w * 0.9
            ky = jnp.float32(off_y) * inv_h * 0.5
            plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
            # ---- bf16 from here ----
            w_geo = _sstep10(jnp.abs(plane_d * ga + gb)).astype(BF)
            w_geo = w_geo * bfk.w_inscreen(bdists, off_y, off_x)
            nsx = wnx.tapb(off_y, off_x)
            nsy = wny.tapb(off_y, off_x)
            nsz = wnz.tapb(off_y, off_x)
            rs = wrs.tapb(off_y, off_x)
            dot = (ncx * nsx + ncy * nsy + ncz * nsz).astype(jnp.float32)
            angle = _acos_approx(dot).astype(BF)  # f32 sqrt hop (bf16 sqrt illegal)
            for si, p in enumerate(per):
                w_ = w_geo * _sstep10(jnp.abs(angle * p["nwp"]))
                if si == 1:
                    w_ = w_ * _sstep10(jnp.abs(rs * p["wra"] + p["wrb"]))
                s_taps = [sg.tapb(off_y, off_x) for sg in sig_wins[si]]
                s_hd = s_taps[-1]
                w_ = w_ * (p["mhdw"] + (BF(1.0) - p["mhdw"])
                           * _exp_w(s_hd * p["ha"] + p["hb"]))
                w_ = w_ * jnp.exp(BF(k_t) * p["inv_r2"])
                wa = w_.astype(acc_dt)
                sums[si] = sums[si] + wa
                accs[si] = [a + st.astype(acc_dt) * wa
                            for a, st in zip(accs[si], s_taps)]
        for si in range(2):
            scratch[si][:, :] = sums[si].astype(jnp.float32)
            for k_ in range(4):
                outs[si * 4 + k_][:, :] = accs[si][k_].astype(jnp.float32)

    _dispatch(dispatch, lev, lo, hi, rmax, level_body)
    for si in range(2):
        inv = 1.0 / jnp.maximum(scratch[si][:, :], 1e-15)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = outs[si * 4 + k_][:, :] * inv


def _replica_dyn(n_dirs, smem, bsm, wins, centers, outs, origin, scratch):
    """Round-4 candidate: NO level ladder - per-block dynamic tap offsets.

    Each dir's offset is round(tap * R_block) (exact per-block radius, computed
    XLA-side into block_scalars); the window is double-rolled once per (dir, plane)
    (pltpu.roll, 23.8 us/tap-plane measured in bench_micro 'dyn') and the weight
    math runs ONCE - no dead predicated bodies at all. Windows must be f32
    (Mosaic rolls are 32-bit); the bf16-carrier packing variant halves that DMA."""
    from jax.experimental.pallas import tpu as pltpu

    zw = wins[0]
    wnx, wny, wnz, wrs = wins[1:5]
    sig_wins = [wins[5:9], wins[9:13]]
    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci)
    nv_r = [next(ci) for _ in range(3)]
    per = []
    for _ in range(2):
        p = {k: next(ci)[:, :] for k in ("radius", "nwp", "ha", "hb", "mhdw",
                                         "wra", "wrb")}
        per.append(p)
    rect_w, rect_h, ortho = smem[0], smem[1], smem[2]
    i_b, j_b = pl.program_id(0), pl.program_id(1)
    # bsm: [rmin, rmax, oy_0..oy_{n-1}, ox_0..ox_{n-1}]
    rb = jnp.clip(bsm[1][i_b, j_b], _LEV[0], _LEV[-1])
    oys = [bsm[2 + k][i_b, j_b].astype(jnp.int32) for k in range(n_dirs)]
    oxs = [bsm[2 + n_dirs + k][i_b, j_b].astype(jnp.int32) for k in range(n_dirs)]

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
    dirx = u * 0.9 - 0.45
    diry = v * 0.5 - 0.25

    ga = ga_r[:, :]; gb = gb_r[:, :]
    ncx, ncy, ncz = wnx.tap(), wny.tap(), wnz.tap()
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    plane_a = nvx * dirx + nvy * diry

    for p in per:
        radius = jnp.clip(p["radius"], _LEV[0], _LEV[-1])
        p["inv_r2"] = 1.0 / (radius * radius)

    sums = [jnp.ones((bh, bw), jnp.float32) for _ in range(2)]
    accs = [[sig_wins[si][k_].tap() for k_ in range(4)] for si in range(2)]

    from nrdtpu import math as nm
    taps8 = np.asarray(nm.SPECIAL_8)

    def dtap(win, oy, ox):
        val = win.full()
        wh, wwn = val.shape
        val = pltpu.roll(val, jnp.mod(-oy, wh), 0)
        val = pltpu.roll(val, jnp.mod(-ox, wwn), 1)
        return val[win.hy:win.hy + bh, win.hx:win.hx + bw]

    rb2 = rb * rb
    for k in range(n_dirs):
        oy, ox = oys[k], oxs[k]
        oyf, oxf = oy.astype(jnp.float32), ox.astype(jnp.float32)
        k_t = jnp.float32(-0.66 * float(taps8[k][2]) ** 2) * rb2  # scalar
        zs = dtap(zw, oy, ox)
        nsx = dtap(wnx, oy, ox)
        nsy = dtap(wny, oy, ox)
        nsz = dtap(wnz, oy, ox)
        rs = dtap(wrs, oy, ox)
        angle = _acos_approx(ncx * nsx + ncy * nsy + ncz * nsz)
        s_f = zs * s_lin + abs_ortho
        kx = oxf * (inv_w * 0.9)
        ky = oyf * (inv_h * 0.5)
        w_geo = ((fx >= -oxf) & (fx <= rect_w - 1.0 - oxf)
                 & (fy >= -oyf) & (fy <= rect_h - 1.0 - oyf)).astype(jnp.float32)
        plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
        w_geo = w_geo * _sstep10(jnp.abs(plane_d * ga + gb))
        for si, p in enumerate(per):
            w_ = w_geo * _sstep10(jnp.abs(angle * p["nwp"]))
            if si == 1:
                w_ = w_ * _sstep10(jnp.abs(rs * p["wra"] + p["wrb"]))
            s_taps = [dtap(sg, oy, ox) for sg in sig_wins[si]]
            s_hd = s_taps[-1]
            w_ = w_ * (p["mhdw"] + (1.0 - p["mhdw"])
                       * _exp_w(s_hd * p["ha"] + p["hb"]))
            w_ = w_ * jnp.exp(k_t * p["inv_r2"])
            sums[si] = sums[si] + w_
            accs[si] = [a + st * w_ for a, st in zip(accs[si], s_taps)]

    for si in range(2):
        inv = 1.0 / jnp.maximum(sums[si], 1e-15)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = accs[si][k_] * inv


def _replica_hoist(smem, bsm, wins, centers, outs, origin, scratch,
                   probe="full", n_lev=None):
    """Round-4 candidate: ladder keeps only the 13 tap LOADS per level (predicated
    into scratch planes); the ~55-op weight chain runs ONCE per dir, shared.

    Dead-issue cost shrinks from half-a-full-body per dead level to half-the-loads.
    scratch: 2 accumulop planes + 13 tap planes."""
    n_dirs = 8
    zw = wins[0]
    wnx, wny, wnz, wrs = wins[1:5]
    sig_wins = [wins[5:9], wins[9:13]]
    all_wins = [zw, wnx, wny, wnz, wrs] + list(sig_wins[0]) + list(sig_wins[1])
    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci)
    nv_r = [next(ci) for _ in range(3)]
    per = []
    for _ in range(2):
        p = {k: next(ci)[:, :] for k in ("radius", "nwp", "ha", "hb", "mhdw",
                                         "wra", "wrb")}
        per.append(p)
    rmax_b = bsm[1]
    rect_w, rect_h, ortho = smem[0], smem[1], smem[2]

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
    dirx = u * 0.9 - 0.45
    diry = v * 0.5 - 0.25

    ga = ga_r[:, :]; gb = gb_r[:, :]
    ncx, ncy, ncz = wnx.tap(), wny.tap(), wnz.tap()
    nvx, nvy, nvz = nv_r[0][:, :], nv_r[1][:, :], nv_r[2][:, :]
    plane_a = nvx * dirx + nvy * diry

    for p in per:
        radius = jnp.clip(p["radius"], _LEV[0], _LEV[-1])
        p["inv_r2"] = 1.0 / (radius * radius)

    sums = [jnp.ones((bh, bw), jnp.float32) for _ in range(2)]
    accs = [[sig_wins[si][k_].tap() for k_ in range(4)] for si in range(2)]

    i_b, j_b = pl.program_id(0), pl.program_id(1)
    rmax = jnp.minimum(rmax_b[i_b, j_b], jnp.float32(_LEV[-1]))
    taps = _static_offsets(n_dirs)
    tap_scr = scratch[2:15]
    nl = n_lev if n_lev is not None else len(_LEV)
    lws = [(rmax > jnp.float32(_LO[li])) & (rmax <= jnp.float32(_HI[li]))
           if li < nl - 1 else (rmax > jnp.float32(_LO[li]))
           for li in range(nl)]
    # runtime-selected scalars: the level's (off_y, off_x, k_t) per dir
    for k in range(n_dirs):
        offf = [jnp.float32(0.0)] * 3
        for li in range(nl):
            m = lws[li].astype(jnp.float32)
            for q in range(3):
                offf[q] = offf[q] + m * jnp.float32(taps[k][li][q])
        oyf, oxf, k_t = offf

        for li in range(nl):
            @pl.when(lws[li])
            def _(li=li, k=k):
                off_y, off_x, _ = taps[k][li]
                for t_, wv in enumerate(all_wins):
                    tap_scr[t_][:, :] = wv.tap(off_y, off_x)

        zs = tap_scr[0][:, :]
        nsx = tap_scr[1][:, :]; nsy = tap_scr[2][:, :]; nsz = tap_scr[3][:, :]
        rs = tap_scr[4][:, :]
        angle = _acos_approx(ncx * nsx + ncy * nsy + ncz * nsz)
        s_f = zs * s_lin + abs_ortho
        kx = oxf * (inv_w * 0.9)
        ky = oyf * (inv_h * 0.5)
        w_geo = ((fx >= -oxf) & (fx <= rect_w - 1.0 - oxf)
                 & (fy >= -oyf) & (fy <= rect_h - 1.0 - oyf)).astype(jnp.float32)
        plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
        w_geo = w_geo * _sstep10(jnp.abs(plane_d * ga + gb))
        for si, p in enumerate(per):
            w_ = w_geo * _sstep10(jnp.abs(angle * p["nwp"]))
            if si == 1:
                w_ = w_ * _sstep10(jnp.abs(rs * p["wra"] + p["wrb"]))
            s_taps = [tap_scr[5 + si * 4 + t_][:, :] for t_ in range(4)]
            s_hd = s_taps[-1]
            if probe == "noexp":  # exps -> muls: isolates transcendental cost
                w_ = w_ * (p["mhdw"] + (1.0 - p["mhdw"]) * (s_hd * p["ha"] + p["hb"]))
                w_ = w_ * (k_t * p["inv_r2"])
            elif probe == "fusedexp":  # one exp per signal: lerp expanded
                g = jnp.exp(-3.0 * jnp.abs(s_hd * p["ha"] + p["hb"])
                            + k_t * p["inv_r2"])
                w_ = w_ * (p["mhdw"] * 1.0 + (1.0 - p["mhdw"]) * g)
            else:
                w_ = w_ * (p["mhdw"] + (1.0 - p["mhdw"])
                           * _exp_w(s_hd * p["ha"] + p["hb"]))
                w_ = w_ * jnp.exp(k_t * p["inv_r2"])
            sums[si] = sums[si] + w_
            accs[si] = [a + st * w_ for a, st in zip(accs[si], s_taps)]

    for si in range(2):
        inv = 1.0 / jnp.maximum(sums[si], 1e-15)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = accs[si][k_] * inv


def _dispatch(dispatch, lev, lo, hi, rmax, level_body):
    if dispatch == "switch":
        idx = jnp.int32(-1)
        for li in range(len(lev)):
            idx = idx + (rmax > jnp.float32(lo[li])).astype(jnp.int32)
        jax.lax.switch(idx, [functools.partial(level_body, li)
                             for li in range(len(lev))])
    else:
        for li in range(len(lev)):
            active = (rmax > jnp.float32(lo[li])) & (rmax <= jnp.float32(hi[li]))
            pl.when(active)(functools.partial(level_body, li))


def run_variant(name, kind, arg, dispatch, lev3, env, lat):
    block = (96, 512)

    def call(inputs):
        z, nr4, sigs, radius = inputs
        bf16_wins = kind not in ("dyn",)  # rolls are 32-bit: dyn keeps f32 windows
        cast = (lambda x: x.astype(jnp.bfloat16)) if bf16_wins else (lambda x: x)
        windows = [z] + [cast(x) for x in nr4] + [cast(s) for s in sigs]
        rmin_b, rmax_b = block_minmax(radius, block, HALO2)
        centers = ([radius * 0.0 + 0.02, radius * 0.0 + 0.1]
                   + [radius * 0.0 + 0.3] * 3
                   + [radius, radius * 0.0 + 4.0, radius * 0.0 + 1.0,
                      radius * 0.0 - 0.5, radius * 0.0 + 0.2,
                      radius * 0.0 + 1.0, radius * 0.0 - 0.3] * 2)
        scalars = jnp.asarray([W, H, 0.0], jnp.float32)
        bsm = [rmin_b, rmax_b]
        n_scr = 2
        if kind == "dyn":
            from nrdtpu import math as nm
            n_dirs = arg
            taps8 = np.asarray(nm.SPECIAL_8)
            rb = jnp.clip(rmax_b, _LEV[0], _LEV[-1])
            oys = [jnp.round(jnp.float32(taps8[k][1]) * rb).astype(jnp.float32)
                   for k in range(n_dirs)]
            oxs = [jnp.round(jnp.float32(taps8[k][0]) * rb).astype(jnp.float32)
                   for k in range(n_dirs)]
            bsm = [rmin_b, rmax_b] + oys + oxs
            body = functools.partial(_replica_dyn, n_dirs)
        elif kind == "hoist":
            probe, n_lev = arg
            body = functools.partial(_replica_hoist, probe=probe, n_lev=n_lev)
            n_scr = 15
        elif kind == "f32":
            body = functools.partial(_replica_f32, arg, dispatch, lev3)
        else:
            body = functools.partial(_replica_bf, arg, dispatch, lev3)
        outs = stencil_call2(
            body, windows, n_out=8, halo=HALO2, block=block, scalars=scalars,
            block_scalars=bsm, center_inputs=centers,
            scratch_blocks=n_scr, interpret=_SMOKE)
        return outs

    @jax.jit
    def loop(inputs):
        def step(c, _):
            o = call((c,) + inputs[1:])
            return c * 0.999 + o[0] * 1e-9, None
        c, _ = jax.lax.scan(step, inputs[0], None, length=N)
        return jnp.ravel(c)[0]

    t0 = time.perf_counter()
    r = loop(env)
    np.asarray(r)
    compile_s = time.perf_counter() - t0

    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(loop(env))
        ts.append(time.perf_counter() - t0)
    ms = (np.median(ts) - lat) * 1e3 / N
    print(f"{name:28s}: {ms:8.3f} ms  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.uniform(1.0, 30.0, (H, W)).astype(np.float32))
    nr4 = tuple(jnp.asarray(rng.uniform(-1.0, 1.0, (H, W)).astype(np.float32))
                for _ in range(4))
    sigs = tuple(jnp.asarray(rng.uniform(0.0, 1.0, (H, W)).astype(np.float32))
                 for _ in range(8))
    radius = jnp.asarray(rng.uniform(10.0, 14.0, (H, W)).astype(np.float32))
    env = (z, nr4, sigs, radius)

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    np.asarray(probe(z))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(z))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    variants = {
        "f32 when": ("f32", "cmp", "when", False),
        "f32 arith": ("f32", "arith", "when", False),
        "bf16": ("bf", False, "when", False),
        "bf16 f32acc": ("bf", True, "when", False),
        "bf16 switch": ("bf", False, "switch", False),
        "bf16 3lev": ("bf", False, "when", True),
        "f32 switch": ("f32", "arith", "switch", False),
        "f32 arith when": ("f32", "arith", "when", False),
        "dyn8": ("dyn", 8, None, False),
        "dyn6": ("dyn", 6, None, False),
        "hoist": ("hoist", ("full", None), None, False),
        "hoist 1lev": ("hoist", ("full", 1), None, False),
        "hoist noexp": ("hoist", ("noexp", None), None, False),
        "hoist fusedexp": ("hoist", ("fusedexp", None), None, False),
    }
    pick = sys.argv[1:] or list(variants)
    for name in pick:
        kind, arg, dispatch, lev3 = variants[name]
        run_variant(name, kind, arg, dispatch, lev3, env, lat)


if __name__ == "__main__":
    main()
