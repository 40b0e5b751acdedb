"""Pallas TPU kernels for the RELAX pipeline (a-trous wavelet filter first).

Same pass semantics as passes/relax/kernels.py (the XLA reference path). The a-trous
iteration is the pipeline's bulk cost (5+ invocations x 2 signals): a 3x3 tap cross at
stride 2^i with plane-distance / normal / roughness / luminance edge-stopping weights
(RELAX_Atrous.hlsli, RELAX_AtrousSmem.hlsli). Taps at a given iteration are uniform
offsets -> Win.tap_dyn; the reference's per-pixel random jitter for strides > 4 becomes a
per-BLOCK random jitter (documented divergence: decorrelates banding across blocks, not
within a block).

Iteration 0 (AtrousSmem) additionally runs the 3x3 gaussian variance prefilter and the
5x5 spatial-variance-estimation fallback for short histories, all in the same kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .. import math as nm
from ..frontend import NRD_EPS
from .harness import stencil_call
from .harness2 import stencil_call2

HALO = (32, 128)
BLOCK = (64, 256)
_G3 = (0.44198, 0.27901)


def atrous_halo(step_size: int):
    """Halo covering the static +-step tap reach (jitter rides the DMA offset)."""
    return (max(HALO[0], -(-step_size // 8) * 8),
            max(HALO[1], -(-step_size // 128) * 128))


def atrous_block(h: int, w: int, step_size: int):
    """Block for one a-trous iteration; shared by the kernel launch and the
    per-block jitter grid so both always agree.

    Large strides inflate the halo (window rows ~ block + 2*stride): shrink the
    block so windows stay inside VMEM - the extra halo DMA is the cheaper
    resource, and strides >= 32 run once per frame each."""
    from .harness import pick_block

    want = (64, 256) if step_size <= 32 else (32, 256)
    return pick_block(h, w, want, atrous_halo(step_size))

# scalar layout
_A_FRUSTUM = 0   # 9: frustum_right, frustum_up, frustum_forward (world space)
_A_MISC = 9      # view_z_scale, ortho, denoising_range, rough_edge_relax,
#                  rough_edge_enabled, diff_phi, spec_phi, max_rel_d, max_rel_s,
#                  min_mat_d, min_mat_s, rect_w, rect_h, history_threshold
_A_TOTAL = 23


def _decode_oct(px_, py_):
    qx = px_ * 2.0 - 1.0
    qy = py_ * 2.0 - 1.0
    z = 1.0 - jnp.abs(qx) - jnp.abs(qy)
    t = jnp.clip(-z, 0.0, 1.0)
    nx = qx - t * jnp.where(qx >= 0.0, 1.0, -1.0)
    ny = qy - t * jnp.where(qy >= 0.0, 1.0, -1.0)
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + z * z, 1e-15))
    return nx * inv, ny * inv, z * inv


def _acos_approx(x):
    x = jnp.clip(x, -1.0, 1.0)
    res = jnp.sqrt(jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)) * (np.pi / 2.0)
    return jnp.where(x >= 0.0, res, np.pi - res)


def _sstep10(x):
    t = jnp.clip(1.0 - x, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _smoothstep(a, b, x):
    t = jnp.clip((x - a) / jnp.maximum(b - a, 1e-15), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _luma(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def _atrous_kernel(step_size, is_first, has_diff, has_spec, d_sh, s_sh, mat_occ,
                   rough_sq, smem, bsm, wins, centers, outs, origin, scratch):
    """Jitter rides the window DMA offset (harness2 base_offset): all 8 neighbour taps
    are static slices at +-step; center signal values arrive as center inputs so they
    stay un-jittered. bsm carries the jitter only for the sample-coordinate math."""
    wi = iter(wins)
    zw = next(wi)
    nr = [next(wi) for _ in range(4)]
    dw = [next(wi) for _ in range(4)] if has_diff else None
    sw = [next(wi) for _ in range(4)] if has_spec else None
    dshw = [next(wi) for _ in range(4)] if d_sh else None
    sshw = [next(wi) for _ in range(4)] if s_sh else None

    ci = iter(centers)
    thr_r = next(ci)
    n_c = [next(ci)[:, :] for _ in range(3)]
    x_c = [next(ci)[:, :] for _ in range(3)]
    cv_c = [next(ci)[:, :] for _ in range(3)]
    mat_c = next(ci)[:, :]
    hl_c = next(ci)[:, :]
    dnwp = next(ci)[:, :]
    dlr = next(ci)[:, :]     # diff luminance relaxation
    nwp_sve = next(ci)[:, :]
    if has_spec:
        snwp_simpl = next(ci)[:, :]
        ra = next(ci)[:, :]
        rb = next(ci)[:, :]
        angle0 = next(ci)[:, :]
        f0 = next(ci)[:, :]
        slr = next(ci)[:, :]  # spec luminance relaxation
    d_center = [next(ci)[:, :] for _ in range(4)] if has_diff else None
    s_center = [next(ci)[:, :] for _ in range(4)] if has_spec else None
    dsh_center = [next(ci)[:, :] for _ in range(4)] if d_sh else None
    ssh_center = [next(ci)[:, :] for _ in range(4)] if s_sh else None

    i, j = pl.program_id(0), pl.program_id(1)
    jit_y = bsm[0][i, j] if bsm else 0
    jit_x = bsm[1][i, j] if bsm else 0

    fr = [smem[_A_FRUSTUM + k] for k in range(9)]  # right(3), up(3), forward(3)
    view_z_scale = smem[_A_MISC]
    ortho = smem[_A_MISC + 1]
    denoising_range = smem[_A_MISC + 2]
    rough_relax = smem[_A_MISC + 3]
    rough_enabled = smem[_A_MISC + 4]
    diff_phi = smem[_A_MISC + 5]
    spec_phi = smem[_A_MISC + 6]
    max_rel_d = smem[_A_MISC + 7]
    max_rel_s = smem[_A_MISC + 8]
    min_mat_d = smem[_A_MISC + 9]
    min_mat_s = smem[_A_MISC + 10]
    rect_w = smem[_A_MISC + 11]
    rect_h = smem[_A_MISC + 12]
    history_threshold = smem[_A_MISC + 13]

    bh, bw = mat_c.shape
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (origin[1].astype(jnp.float32) + col + 0.5) * inv_w
    v = (origin[0].astype(jnp.float32) + row + 0.5) * inv_h

    def world_pos(uu, vv, zz):
        cx = uu * 2.0 - 1.0
        cy = vv * 2.0 - 1.0
        out = []
        for a in range(3):
            persp = zz * (fr[6 + a] + fr[a] * cx - fr[3 + a] * cy)
            orth = zz * fr[6 + a] + fr[a] * cx - fr[3 + a] * cy
            out.append(jnp.where(ortho == 0.0, persp, orth))
        return out

    nx_, ny_, nz_ = n_c
    xx_, xy_, xz_ = x_c
    cvx, cvy, cvz = cv_c
    thr = thr_r[:, :]

    def T(w_, oy, ox):
        return w_.tap(oy, ox)  # always static: jitter is in the DMA offset

    def sig_center(ws_):
        return list(d_center if ws_ is dw else s_center)

    def tap_planes(ws_, oy, ox):
        return [T(ws_[c], oy, ox) for c in range(4)]

    # iteration-0 variance prefilter (3x3 gaussian) or carried variance
    def center_var(ws_, center):
        if not is_first:
            return jnp.maximum(center[3], 0.0)
        kern = ((0.25, 0.125), (0.125, 0.0625))
        acc = [jnp.zeros((bh, bw), jnp.float32) for _ in range(4)]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                k = kern[abs(dx)][abs(dy)]
                for c in range(4):
                    acc[c] = acc[c] + ws_[c].tap(dy, dx) * k
        m1 = _luma(acc[0], acc[1], acc[2])
        return jnp.maximum(0.0, acc[3] - m1 * m1)

    results = []
    for which, ws_, shw_, shc_ in (("diff", dw, dshw, dsh_center),
                                   ("spec", sw, sshw, ssh_center)):
        if ws_ is None:
            continue
        is_spec = which == "spec"
        center = sig_center(ws_)
        cvar = center_var(ws_, center)
        phi = spec_phi if is_spec else diff_phi
        phi_inv = 1.0 / jnp.maximum(1e-4, phi * jnp.sqrt(cvar))
        center_l = _luma(center[0], center[1], center[2])
        max_rel = max_rel_s if is_spec else max_rel_d
        min_mat = min_mat_s if is_spec else min_mat_d
        lum_relax = slr if is_spec else dlr

        w0 = _G3[0] * _G3[0]
        wsum = jnp.full((bh, bw), w0, jnp.float32)
        if is_first:
            acc = [c_ * w0 for c_ in center]
        else:
            acc = [center[0] * w0, center[1] * w0, center[2] * w0,
                   center[3] * w0 * w0]
        acc_sh = [c_[:, :] * w0 for c_ in shc_] if shw_ is not None else None

        for yy in range(-1, 2):
            for xx in range(-1, 2):
                if xx == 0 and yy == 0:
                    continue
                kern = _G3[abs(xx)] * _G3[abs(yy)]
                oy = yy * step_size  # static tap; jitter is in the DMA offset
                ox = xx * step_size
                ofy = oy + jit_y     # true sample position for coordinate math
                ofx = ox + jit_x
                us = u + ofx * inv_w if isinstance(ofx, int) else \
                    u + ofx.astype(jnp.float32) * inv_w
                vs = v + ofy * inv_h if isinstance(ofy, int) else \
                    v + ofy.astype(jnp.float32) * inv_h
                inside = ((us > 0.0) & (us < 1.0) & (vs > 0.0) & (vs < 1.0)) \
                    .astype(jnp.float32)
                zs = jnp.abs(T(zw, oy, ox)) * view_z_scale
                n0 = T(nr[0], oy, ox)
                n1 = T(nr[1], oy, ox)
                rs_raw = T(nr[2], oy, ox)
                rs = rs_raw * rs_raw if rough_sq == 1 else (
                    jnp.sqrt(jnp.clip(rs_raw, 0.0, 1.0)) if rough_sq == 2 else rs_raw)
                nsx, nsy, nsz = _decode_oct(n0, n1)
                xsx, xsy, xsz = world_pos(us, vs, zs)

                pd = jnp.abs((xsx - xx_) * nx_ + (xsy - xy_) * ny_
                             + (xsz - xz_) * nz_)
                gw = (pd < thr).astype(jnp.float32) * kern
                gw = gw * inside * (zs < denoising_range).astype(jnp.float32)
                angle = _acos_approx(nx_ * nsx + ny_ * nsy + nz_ * nsz)
                if is_spec and not is_first:
                    # sv = -normalize(xs + relax * x)
                    tx = xsx + rough_relax * xx_
                    ty = xsy + rough_relax * xy_
                    tz = xsz + rough_relax * xz_
                    inv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-15))
                    svx, svy, svz = -tx * inv, -ty * inv, -tz * inv
                    cosa = jnp.minimum(nx_ * nsx + ny_ * nsy + nz_ * nsz,
                                       cvx * svx + cvy * svy + cvz * svz)
                    a_ = _smoothstep(0.0, angle0, _acos_approx(cosa))
                    nw = jnp.clip(1.0 - a_ * f0, 0.0, 1.0)
                    nw_simpl = _sstep10(jnp.abs(angle * snwp_simpl))
                    rw = _sstep10(jnp.abs(rs * ra + rb))
                    w_ = gw * jnp.where(rough_enabled != 0.0, nw * rw, nw_simpl)
                else:
                    w_ = gw * _sstep10(jnp.abs(angle * dnwp))
                if mat_occ:
                    ms = T(nr[3], oy, ox)
                    w_ = w_ * (jnp.maximum(ms, min_mat)
                               == jnp.maximum(mat_c, min_mat)).astype(jnp.float32)
                s_t = tap_planes(ws_, oy, ox)
                sl = _luma(s_t[0], s_t[1], s_t[2])
                lw = jnp.minimum(max_rel, jnp.abs(center_l - sl) * phi_inv) * lum_relax
                w_ = w_ * jnp.exp(-lw)
                wsum = wsum + w_
                if is_first:
                    acc = [a + st * w_ for a, st in zip(acc, s_t)]
                else:
                    acc = [acc[0] + s_t[0] * w_, acc[1] + s_t[1] * w_,
                           acc[2] + s_t[2] * w_, acc[3] + s_t[3] * w_ * w_]
                if acc_sh is not None:
                    acc_sh = [a + T(shw_[c], oy, ox) * w_
                              for c, a in enumerate(acc_sh)]

        if is_first:
            out4 = [a / wsum for a in acc]
            m1 = _luma(out4[0], out4[1], out4[2])
            out4[3] = jnp.maximum(0.0, out4[3] - m1 * m1)
        else:
            out4 = [acc[0] / wsum, acc[1] / wsum, acc[2] / wsum,
                    acc[3] / (wsum * wsum)]
        out_sh = [a / wsum for a in acc_sh] if acc_sh is not None else None

        if is_first:
            # spatial variance estimation fallback (AtrousSmem lines 362-470)
            swsum = jnp.zeros((bh, bw), jnp.float32)
            s_acc = [jnp.zeros((bh, bw), jnp.float32) for _ in range(3)]
            s_m1 = jnp.zeros((bh, bw), jnp.float32)
            s_m2 = jnp.zeros((bh, bw), jnp.float32)
            ssh_acc = [jnp.zeros((bh, bw), jnp.float32) for _ in range(4)] \
                if shw_ is not None else None
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    n0 = nr[0].tap(dy, dx)
                    n1 = nr[1].tap(dy, dx)
                    nsx, nsy, nsz = _decode_oct(n0, n1)
                    angle = _acos_approx(nx_ * nsx + ny_ * nsy + nz_ * nsz)
                    w_ = _sstep10(jnp.abs(angle * nwp_sve))
                    if mat_occ:
                        ms = nr[3].tap(dy, dx)
                        w_ = w_ * (jnp.maximum(ms, min_mat)
                                   == jnp.maximum(mat_c, min_mat)).astype(jnp.float32)
                    st = [ws_[c].tap(dy, dx) for c in range(4)]
                    sl = _luma(st[0], st[1], st[2])
                    swsum = swsum + w_
                    for c in range(3):
                        s_acc[c] = s_acc[c] + st[c] * w_
                    s_m1 = s_m1 + sl * w_
                    s_m2 = s_m2 + st[3] * w_
                    if ssh_acc is not None:
                        ssh_acc = [a + shw_[c].tap(dy, dx) * w_
                                   for c, a in enumerate(ssh_acc)]
            swsum = jnp.maximum(swsum, 1e-6)
            s_rgb = [a / swsum for a in s_acc]
            s_m1 = s_m1 / swsum
            s_m2 = s_m2 / swsum
            boost = jnp.maximum(1.0, 4.0 / (hl_c + 1.0))
            s_var = jnp.maximum(0.0, s_m2 - s_m1 * s_m1) * boost
            use_atrous = hl_c >= history_threshold
            out4 = [jnp.where(use_atrous, o, sv)
                    for o, sv in zip(out4, s_rgb + [s_var])]
            if out_sh is not None:
                sve_sh = [a / swsum for a in ssh_acc]
                out_sh = [jnp.where(use_atrous, o, sv)
                          for o, sv in zip(out_sh, sve_sh)]
        results.extend(out4)
        if out_sh is not None:
            results.extend(out_sh)

    for k, vout in enumerate(results):
        outs[k][:, :] = vout


def relax_atrous_pallas(sc, dc, config, *, step_size, is_first, view_z_in,
                        normal_roughness, history_length, diff, spec,
                        depth_threshold, n, x, cv, material_id, diff_nwp,
                        diff_lum_relax, nwp_sve, spec_nwp_simpl=None, ra=None, rb=None,
                        angle0=None, f0=None, spec_lum_relax=None, jitter=None,
                        diff_sh=None, spec_sh=None):
    """RELAX a-trous tap loop on Pallas.
    Returns (diff_out, spec_out, diff_sh_out, spec_sh_out) (None where absent).

    jitter: optional (gh, gw) int32 pair for strides > 4 (per-block random offset)."""
    has_diff = diff is not None
    has_spec = spec is not None
    d_sh = diff_sh is not None
    s_sh = spec_sh is not None
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    rough_sq = {"SQRT_LINEAR": 1, "SQ_LINEAR": 2}.get(config.roughness_encoding.name, 0)

    misc = jnp.stack([
        jnp.asarray(sc["view_z_scale"], jnp.float32),
        jnp.asarray(sc["ortho_mode"], jnp.float32),
        jnp.asarray(sc["denoising_range"], jnp.float32),
        jnp.asarray(dc["roughness_edge_stopping_relaxation"], jnp.float32),
        jnp.asarray(dc["roughness_edge_stopping_enabled"], jnp.float32),
        jnp.asarray(dc["diff_phi_luminance"], jnp.float32),
        jnp.asarray(dc["spec_phi_luminance"], jnp.float32),
        jnp.asarray(dc["diff_max_luminance_relative_difference"], jnp.float32),
        jnp.asarray(dc["spec_max_luminance_relative_difference"], jnp.float32),
        jnp.asarray(dc["diff_min_material"], jnp.float32),
        jnp.asarray(dc["spec_min_material"], jnp.float32),
        jnp.asarray(sc["rect_size"][0], jnp.float32),
        jnp.asarray(sc["rect_size"][1], jnp.float32),
        jnp.asarray(dc["history_threshold"], jnp.float32),
    ])
    scalars = jnp.concatenate([
        jnp.asarray(sc["frustum_right"], jnp.float32),
        jnp.asarray(sc["frustum_up"], jnp.float32),
        jnp.asarray(sc["frustum_forward"], jnp.float32),
        misc,
    ])

    windows = [view_z_in] + [normal_roughness[..., c] for c in range(4)]
    if has_diff:
        windows += [diff[..., c] for c in range(4)]
    if has_spec:
        windows += [spec[..., c] for c in range(4)]
    if d_sh:
        windows += [diff_sh[..., c] for c in range(4)]
    if s_sh:
        windows += [spec_sh[..., c] for c in range(4)]

    centers = [depth_threshold, n[..., 0], n[..., 1], n[..., 2],
               x[..., 0], x[..., 1], x[..., 2],
               cv[..., 0], cv[..., 1], cv[..., 2],
               material_id, history_length, diff_nwp, diff_lum_relax, nwp_sve]
    if has_spec:
        centers += [spec_nwp_simpl, ra, rb, angle0, f0, spec_lum_relax]
    # un-jittered center signal values (the windows may be DMA-offset by the jitter)
    if has_diff:
        centers += [diff[..., c] for c in range(4)]
    if has_spec:
        centers += [spec[..., c] for c in range(4)]
    if d_sh:
        centers += [diff_sh[..., c] for c in range(4)]
    if s_sh:
        centers += [spec_sh[..., c] for c in range(4)]

    bsm = list(jitter) if jitter is not None else []
    halo = atrous_halo(step_size)
    h2, w2 = view_z_in.shape
    block = atrous_block(h2, w2, step_size)
    if step_size >= 64:
        # large-stride iterations (7-8 of the RELAX_Atrous.hlsli ladder, Relax.cpp:274)
        # blow the VMEM window budget at f32 (halo rows scale with the stride); signal
        # and G-buffer windows ride bf16 (Win2 upcasts taps), viewZ stays f32 for the
        # plane-distance test.
        windows = [windows[0]] + [w_.astype(jnp.bfloat16) for w_ in windows[1:]]
    n_out = 4 * (int(has_diff) + int(has_spec) + int(d_sh) + int(s_sh))
    outs = stencil_call2(
        functools.partial(_atrous_kernel, step_size, is_first, has_diff, has_spec,
                          d_sh, s_sh, mat_occ, rough_sq),
        windows, n_out=n_out, halo=halo, block=block,
        scalars=scalars, block_scalars=bsm, center_inputs=centers,
        base_offset=jitter if jitter is not None else None,
        offset_windows=[True] * len(windows) if jitter is not None else None)
    k = 0
    diff_out = spec_out = dsh_out = ssh_out = None
    if has_diff:
        diff_out = jnp.stack(outs[k:k + 4], -1)
        k += 4
        if d_sh:
            dsh_out = jnp.stack(outs[k:k + 4], -1)
            k += 4
    if has_spec:
        spec_out = jnp.stack(outs[k:k + 4], -1)
        k += 4
        if s_sh:
            ssh_out = jnp.stack(outs[k:k + 4], -1)
    return diff_out, spec_out, dsh_out, ssh_out


# ---------------------------------------------------------------------------
# HistoryClamping 5x5 moments + AntiFirefly RCRS (static stencils)
# ---------------------------------------------------------------------------


def _clamp_moments_kernel(n_sig, smem, bsm, wins, centers, outs, origin, scratch):
    valid_w = wins[0]
    k_out = 0
    for s_ in range(n_sig):
        ry, rco, rcg, nr_, ng_, nb_ = wins[1 + 6 * s_: 7 + 6 * s_]
        m1 = [None] * 3
        m2 = [None] * 3
        nm1 = [None] * 3
        nm2 = None
        wsum = None
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                w_ = valid_w.tap(dy, dx)
                r3 = [ry.tap(dy, dx), rco.tap(dy, dx), rcg.tap(dy, dx)]
                n3 = [nr_.tap(dy, dx), ng_.tap(dy, dx), nb_.tap(dy, dx)]
                nl = _luma(n3[0], n3[1], n3[2])
                for c in range(3):
                    t1 = r3[c] * w_
                    t2 = r3[c] * r3[c] * w_
                    t3 = n3[c] * w_
                    m1[c] = t1 if m1[c] is None else m1[c] + t1
                    m2[c] = t2 if m2[c] is None else m2[c] + t2
                    nm1[c] = t3 if nm1[c] is None else nm1[c] + t3
                t4 = nl * nl * w_
                nm2 = t4 if nm2 is None else nm2 + t4
                wsum = w_ if wsum is None else wsum + w_
        wsum = jnp.maximum(wsum, 1.0)
        for c in range(3):
            outs[k_out][:, :] = m1[c] / wsum; k_out += 1
        for c in range(3):
            outs[k_out][:, :] = m2[c] / wsum; k_out += 1
        for c in range(3):
            outs[k_out][:, :] = nm1[c] / wsum; k_out += 1
        outs[k_out][:, :] = nm2 / wsum; k_out += 1


def relax_clamp_moments_pallas(is_valid, sig_planes):
    """5x5 validity-weighted moments for HistoryClamping (RELAX_HistoryClamping.hlsli
    lines 95-140). sig_planes: list per signal of (resp_ycocg (h,w,3), noisy_rgb (h,w,3)).
    Returns per signal (m1 (h,w,3), m2 (h,w,3), nm1 (h,w,3), nm2 (h,w))."""
    windows = [is_valid]
    for resp_y, noisy in sig_planes:
        windows += [resp_y[..., c] for c in range(3)]
        windows += [noisy[..., c] for c in range(3)]
    n_sig = len(sig_planes)
    outs = stencil_call2(
        functools.partial(_clamp_moments_kernel, n_sig), windows,
        n_out=10 * n_sig, halo=(8, 128), block=BLOCK)
    res = []
    for s_ in range(n_sig):
        o = outs[10 * s_: 10 * s_ + 10]
        res.append((jnp.stack(o[0:3], -1), jnp.stack(o[3:6], -1),
                    jnp.stack(o[6:9], -1), o[9]))
    return res


def _firefly_kernel(n_sig, mat_occ, smem, bsm, wins, centers, outs, origin, scratch):
    mat_w = wins[0]
    min_mats = [smem[0], smem[1]]
    mat_c = mat_w.tap()
    for s_ in range(n_sig):
        r_, g_, b_ = wins[1 + 3 * s_: 4 + 3 * s_]
        cr, cg, cb = r_.tap(), g_.tap(), b_.tap()
        luma = _luma(cr, cg, cb)
        best_max_l = jnp.full_like(luma, -1.0)
        best_min_l = jnp.full_like(luma, 1e6)
        bmax = [cr, cg, cb]
        bmin = [cr, cg, cb]
        min_mat = min_mats[s_]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                s3 = [r_.tap(dy, dx), g_.tap(dy, dx), b_.tap(dy, dx)]
                sl = _luma(s3[0], s3[1], s3[2])
                if mat_occ:
                    ok = (jnp.maximum(mat_w.tap(dy, dx), min_mat)
                          == jnp.maximum(mat_c, min_mat))
                else:
                    ok = jnp.ones_like(sl, bool)
                gt = ok & (sl > best_max_l)
                best_max_l = jnp.where(gt, sl, best_max_l)
                bmax = [jnp.where(gt, t, b) for t, b in zip(s3, bmax)]
                lt = ok & (sl < best_min_l)
                best_min_l = jnp.where(lt, sl, best_min_l)
                bmin = [jnp.where(lt, t, b) for t, b in zip(s3, bmin)]
        hi = luma > best_max_l
        lo = luma < best_min_l
        for c, (cc, mx, mn) in enumerate(zip((cr, cg, cb), bmax, bmin)):
            v = jnp.where(hi, mx, cc)
            v = jnp.where(lo, mn, v)
            outs[3 * s_ + c][:, :] = v


def relax_antifirefly_pallas(sc, dc, config, material_id, sig_rgbs):
    """Cross-bilateral RCRS (RELAX_AntiFirefly.hlsli). sig_rgbs: [(rgb, min_mat_key)...].
    Returns list of filtered (h, w, 3)."""
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    scalars = jnp.stack([jnp.asarray(dc[k], jnp.float32)
                         for _, k in sig_rgbs] + [jnp.float32(0.0)])
    windows = [material_id]
    for rgb, _ in sig_rgbs:
        windows += [rgb[..., c] for c in range(3)]
    n_sig = len(sig_rgbs)
    outs = stencil_call2(
        functools.partial(_firefly_kernel, n_sig, mat_occ), windows,
        n_out=3 * n_sig, halo=(8, 128), block=BLOCK,
        scalars=scalars)
    return [jnp.stack(outs[3 * s_: 3 * s_ + 3], -1) for s_ in range(n_sig)]


# ---------------------------------------------------------------------------
# PrePass (RELAX_PrePass.hlsli) - Poisson spatial reuse
# ---------------------------------------------------------------------------

PRE_RADIUS_LEVELS = (1.0, 3.0, 8.0, 17.0, 32.0)


def _pre_level_weights(radius):
    levels = PRE_RADIUS_LEVELS
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


def _prepass_kernel(is_spec, mat_occ, rough_sq, n_sh, smem, bsm, wins, centers, outs,
                    origin, scratch):
    wi = iter(wins)
    zw = next(wi)
    nr = [next(wi) for _ in range(4)]
    sig = [next(wi) for _ in range(4)]
    shw = [next(wi) for _ in range(n_sh)]

    ci = iter(centers)
    radius_r = next(ci)
    thr_r = next(ci)          # depth_threshold * depth_threshold_scale
    nwp_r = next(ci)
    ha_r = next(ci)
    hb_r = next(ci)
    mhdw_r = next(ci)
    hit_r = next(ci)
    mat_r = next(ci)
    n_c = [next(ci)[:, :] for _ in range(3)]
    x_c = [next(ci)[:, :] for _ in range(3)]
    if is_spec:
        ra_r = next(ci)
        rb_r = next(ci)
        rough_r = next(ci)

    # SMEM: dirs(16) frustum_rt/up/fwd(9) misc
    dirs = [smem[k] for k in range(16)]
    fr = [smem[16 + k] for k in range(9)]
    view_z_scale = smem[25]
    ortho = smem[26]
    denoising_range = smem[27]
    min_material = smem[28]
    rect_w = smem[29]
    rect_h = smem[30]

    radius = radius_r[:, :]
    thr = thr_r[:, :]
    nwp = nwp_r[:, :]
    ha = ha_r[:, :]
    hb = hb_r[:, :]
    mhdw = mhdw_r[:, :]
    hit_c = hit_r[:, :]
    mat_c = mat_r[:, :]
    nx_, ny_, nz_ = n_c
    xx_, xy_, xz_ = x_c
    if is_spec:
        ra = ra_r[:, :]
        rb = rb_r[:, :]
        rough_term = jnp.clip((rough_r[:, :] - 0.5) / 0.5, 0.0, 1.0)

    bh, bw = radius.shape
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (origin[1].astype(jnp.float32) + col + 0.5) * inv_w
    v = (origin[0].astype(jnp.float32) + row + 0.5) * inv_h

    def world_pos(uu, vv, zz):
        cx = uu * 2.0 - 1.0
        cy = vv * 2.0 - 1.0
        out = []
        for a in range(3):
            persp = zz * (fr[6 + a] + fr[a] * cx - fr[3 + a] * cy)
            orth = zz * fr[6 + a] + fr[a] * cx - fr[3 + a] * cy
            out.append(jnp.where(ortho == 0.0, persp, orth))
        return out

    # RELAX_PrePass.hlsli:12 taps the true Poisson disk (g_Poisson8), not g_Special8
    gauss = [float(np.exp(-0.66 * t[2] * t[2])) for t in nm.POISSON_8]
    # static tap lattice (unrotated POISSON_8 x PRE_RADIUS_LEVELS, like reblur_blur2)
    static_offs = []
    for tap in np.asarray(nm.POISSON_8):
        static_offs.append([
            (int(np.clip(round(float(tap[1]) * lv), -32, 32)),
             int(np.clip(round(float(tap[0]) * lv), -32, 32)))
            for lv in PRE_RADIUS_LEVELS])

    for c in range(3):
        outs[c][:, :] = sig[c].tap()
    if is_spec:
        outs[3][:, :] = jnp.where(hit_c == 0.0, jnp.float32(65504.0 * 65504.0), hit_c)
    else:
        outs[3][:, :] = sig[3].tap()
    for c in range(n_sh):
        outs[4 + c][:, :] = shw[c].tap()
    scratch[0][:, :] = jnp.ones((bh, bw), jnp.float32)

    i_b, j_b = pl.program_id(0), pl.program_id(1)
    rmin = jnp.maximum(bsm[0][i_b, j_b], jnp.float32(PRE_RADIUS_LEVELS[0]))
    rmax = jnp.minimum(bsm[1][i_b, j_b], jnp.float32(PRE_RADIUS_LEVELS[-1]))
    lo_s = [-1e9] + list(PRE_RADIUS_LEVELS[:-1])
    hi_s = list(PRE_RADIUS_LEVELS[1:]) + [1e9]

    radius_c = jnp.clip(radius, PRE_RADIUS_LEVELS[0], PRE_RADIUS_LEVELS[-1])
    for li in range(len(PRE_RADIUS_LEVELS)):
        active = (rmax > jnp.float32(lo_s[li])) & (rmin < jnp.float32(hi_s[li]))

        @pl.when(active)
        def _(li=li):
            lw = _pre_level_weights(radius_c)[li]
            acc = [outs[c][:, :] for c in range(3)]
            acc3 = outs[3][:, :]
            acc_sh = [outs[4 + c][:, :] for c in range(n_sh)]
            wsum = scratch[0][:, :]
            for k in range(8):
                oy, ox = static_offs[k][li]
                us = u + ox * inv_w
                vs = v + oy * inv_h
                zs = jnp.abs(zw.tap(oy, ox)) * view_z_scale
                n0 = nr[0].tap(oy, ox)
                n1 = nr[1].tap(oy, ox)
                rs_raw = nr[2].tap(oy, ox)
                rs = rs_raw * rs_raw if rough_sq == 1 else (
                    jnp.sqrt(jnp.clip(rs_raw, 0.0, 1.0)) if rough_sq == 2 else rs_raw)
                nsx, nsy, nsz = _decode_oct(n0, n1)
                xsx, xsy, xsz = world_pos(us, vs, zs)

                w_ = ((us > 0.0) & (us < 1.0) & (vs > 0.0)
                      & (vs < 1.0)).astype(jnp.float32)
                w_ = w_ * (zs < denoising_range).astype(jnp.float32)
                if mat_occ:
                    ms = nr[3].tap(oy, ox)
                    w_ = w_ * (jnp.maximum(mat_c, min_material)
                               == jnp.maximum(ms, min_material)).astype(jnp.float32)
                if is_spec:
                    w_ = w_ * _sstep10(jnp.abs(rs * ra + rb))
                angle = _acos_approx(nx_ * nsx + ny_ * nsy + nz_ * nsz)
                w_ = w_ * _sstep10(jnp.abs(angle * nwp))
                pd = jnp.abs((xsx - xx_) * nx_ + (xsy - xy_) * ny_ + (xsz - xz_) * nz_)
                w_ = w_ * (pd <= thr).astype(jnp.float32)

                s_t = [sig[c].tap(oy, ox) for c in range(4)]
                s_t = [jnp.where(w_ == 0.0, 0.0, st) for st in s_t]
                y = -3.0 * jnp.abs(s_t[3] * ha + hb)
                w_ = w_ * (mhdw + (1.0 - mhdw) * (1.0 / (y * y - y + 1.0)))
                w_ = w_ * gauss[k] * lw

                if is_spec:
                    dx_ = xsx - xx_
                    dy_ = xsy - xy_
                    dz_ = xsz - xz_
                    d = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
                    t = s_t[3] / (hit_c + d + NRD_EPS)
                    w_ = w_ * (jnp.clip(t, 0.0, 1.0)
                               + (1.0 - jnp.clip(t, 0.0, 1.0)) * rough_term)
                    take = (w_ != 0.0) & (s_t[3] != 0.0)
                    acc3 = jnp.where(take, jnp.minimum(acc3, s_t[3]), acc3)
                else:
                    acc3 = acc3 + s_t[3] * w_

                wsum = wsum + w_
                for c in range(3):
                    acc[c] = acc[c] + s_t[c] * w_
                for c in range(n_sh):
                    acc_sh[c] = acc_sh[c] + shw[c].tap(oy, ox) * w_

            for c in range(3):
                outs[c][:, :] = acc[c]
            outs[3][:, :] = acc3
            for c in range(n_sh):
                outs[4 + c][:, :] = acc_sh[c]
            scratch[0][:, :] = wsum

    inv = 1.0 / scratch[0][:, :]
    for c in range(3):
        outs[c][:, :] = outs[c][:, :] * inv
    if is_spec:
        mh = outs[3][:, :]
        outs[3][:, :] = jnp.where(mh >= 65504.0 * 65504.0, 0.0, mh)
    else:
        outs[3][:, :] = outs[3][:, :] * inv
    for c in range(n_sh):
        outs[4 + c][:, :] = outs[4 + c][:, :] * inv


def relax_prepass_taps_pallas(sc, dc, config, *, is_spec, signal, view_z_in,
                              normal_roughness, blur_radius, thr_eff, nwp, ha, hb,
                              min_hd_weight, hit, material_id, n, x,
                              ra=None, rb=None, roughness=None, sh=None):
    """RELAX PrePass Poisson taps on Pallas (radius-level quantized; radius capped at
    32 px - the reference allows 50, documented divergence).

    Returns (h, w, 4) signal, or (signal, sh_out) when sh is given."""
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    rough_sq = {"SQRT_LINEAR": 1, "SQ_LINEAR": 2}.get(config.roughness_encoding.name, 0)

    dirs = []
    for tap in nm.POISSON_8:
        dirs.append(nm.rotate_vector2(jnp.asarray(sc["rotator_pre"]),
                                      jnp.asarray(tap[:2])))
    dirs = jnp.stack(dirs).reshape(-1)
    scalars = jnp.concatenate([
        dirs,
        jnp.asarray(sc["frustum_right"], jnp.float32),
        jnp.asarray(sc["frustum_up"], jnp.float32),
        jnp.asarray(sc["frustum_forward"], jnp.float32),
        jnp.stack([
            jnp.asarray(sc["view_z_scale"], jnp.float32),
            jnp.asarray(sc["ortho_mode"], jnp.float32),
            jnp.asarray(sc["denoising_range"], jnp.float32),
            jnp.asarray(dc["spec_min_material" if is_spec else "diff_min_material"],
                        jnp.float32),
            jnp.asarray(sc["rect_size"][0], jnp.float32),
            jnp.asarray(sc["rect_size"][1], jnp.float32),
        ]),
    ])
    n_sh = 0 if sh is None else 4
    windows = ([view_z_in] + [normal_roughness[..., c] for c in range(4)]
               + [signal[..., c] for c in range(4)]
               + ([sh[..., c] for c in range(4)] if n_sh else []))
    centers = [blur_radius, thr_eff, nwp, ha, hb,
               jnp.broadcast_to(jnp.asarray(min_hd_weight, jnp.float32),
                                view_z_in.shape),
               hit, material_id, n[..., 0], n[..., 1], n[..., 2],
               x[..., 0], x[..., 1], x[..., 2]]
    if is_spec:
        centers += [ra, rb, roughness]
    from .harness2 import block_minmax
    rmin_b, rmax_b = block_minmax(blur_radius, BLOCK, HALO)
    outs = stencil_call2(
        functools.partial(_prepass_kernel, is_spec, mat_occ, rough_sq, n_sh),
        windows, n_out=4 + n_sh, halo=HALO, block=BLOCK,
        scalars=scalars, center_inputs=centers,
        block_scalars=[rmin_b, rmax_b], scratch_blocks=1)
    if n_sh:
        return jnp.stack(outs[:4], -1), jnp.stack(outs[4:8], -1)
    return jnp.stack(outs, -1)


# ---------------------------------------------------------------------------
# TemporalAccumulation: surface-motion loader (RELAX_TemporalAccumulation.hlsli:30-218)
# ---------------------------------------------------------------------------

from . import reproject as _rp
from .reblur_pallas import FP as _FP
from .reblur_pallas import _catrom_w as _crw

_CENTER4 = ((1, 1), (2, 1), (1, 2), (2, 2))
_CORNER4 = ((0, 0), (3, 0), (0, 3), (3, 3))


def _relax_smb_kernel(has_spec, n_hist, n_bil, mat_occ, smem, bsm, wins, centers, outs,
                      origin, scratch):
    wi = iter(wins)
    zp_w = next(wi)
    mat_w = next(wi)
    hl_w = next(wi)
    ht_w = next(wi) if has_spec else None
    nrp = [next(wi) for _ in range(4)]
    hist_wins = [next(wi) for _ in range(n_hist)]
    bil_wins = [next(wi) for _ in range(n_bil)]
    cnr = [next(wi), next(wi)]
    chit_w = next(wi) if has_spec else None

    ci = iter(centers)
    mvy = next(ci)[:, :]
    mvx = next(ci)[:, :]
    xv_prev_z = next(ci)[:, :]
    base_thr = next(ci)[:, :]
    mat_c = next(ci)[:, :]

    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]

    p2w = [smem[k] for k in range(9)]
    min_material = smem[9]
    rect_w = smem[10]
    rect_h = smem[11]
    view_z_scale = smem[12]

    bh, bw = mvy.shape
    # BLOCK-ADAPTIVE exact residual capture (see reblur_pallas _smb_kernel -
    # budget-1 clipping froze accumulation under zoom; the exact path costs
    # ~2.5x, so only blocks with max residual > 1 px run it)
    qy, qx, valid = _rp.residual_and_validity(mvy, mvx, base_y, base_x, budget=5.0)
    wide = bsm[2][i, j] > 0.0

    # current 3x3: averaged normal (+ min spec hitT)
    na = [jnp.zeros((bh, bw), jnp.float32) for _ in range(3)]
    min_hit = None
    if has_spec:
        chit = chit_w.tap()
        min_hit = jnp.where(chit == 0.0, jnp.float32(65504.0 * 65504.0), chit)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ax, ay, az = _decode_oct(cnr[0].tap(dy, dx), cnr[1].tap(dy, dx))
            na[0] = na[0] + ax
            na[1] = na[1] + ay
            na[2] = na[2] + az
            if has_spec and not (dy == 0 and dx == 0):
                t = chit_w.tap(dy, dx)
                min_hit = jnp.minimum(min_hit,
                                      jnp.where(t == 0.0,
                                                jnp.float32(65504.0 * 65504.0), t))
    na = [a / 9.0 for a in na]
    inv_na = jax.lax.rsqrt(jnp.maximum(na[0] ** 2 + na[1] ** 2 + na[2] ** 2, 1e-15))
    nau = [a * inv_na for a in na]

    def _resolve_body(my, mx, fy, fx, fl_y, fl_x):
        def fp(w_):
            return _FP(w_, my, mx)  # prev-frame windows arrive pre-shifted by the DMA base

        row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
        ox = origin[1].astype(jnp.float32) + col + base_x.astype(jnp.float32) + fl_x
        oy = origin[0].astype(jnp.float32) + row + base_y.astype(jnp.float32) + fl_y

        def on_screen(i_, j_):
            tx = ox + (i_ - 1)
            ty = oy + (j_ - 1)
            return ((tx >= 0.0) & (tx < rect_w) & (ty >= 0.0) & (ty < rect_h)) \
                .astype(jnp.float32)

        zfp = fp(zp_w)
        matfp = fp(mat_w)
        occ = [[None] * 4 for _ in range(4)]
        for j_ in range(4):
            for i_ in range(4):
                q = (1 if i_ >= 2 else 0) + (2 if j_ >= 2 else 0)
                z_t = jnp.abs(zfp.tap(i_, j_)) * view_z_scale
                thr = base_thr * on_screen(*(_CENTER4[q])) * valid - NRD_EPS
                ok = (jnp.abs(z_t - xv_prev_z) <= thr).astype(jnp.float32)
                if mat_occ:
                    ok = ok * (jnp.maximum(mat_c, min_material)
                               == jnp.maximum(matfp.tap(i_, j_), min_material)) \
                        .astype(jnp.float32)
                occ[j_][i_] = ok
        occ12 = sum(occ[j_][i_] for j_ in range(4) for i_ in range(4)
                    if (i_, j_) not in _CORNER4)
        bicubic_valid = occ12 > 11.5
        bval = [occ[j_][i_] for (i_, j_) in _CENTER4]

        # prev flat normal: mean of the centre 2x2 packed taps (bilinear at frac 0.5)
        nrfp = [fp(w_) for w_ in nrp]
        flat = []
        for c in range(4):
            flat.append(0.25 * sum(nrfp[c].tap(i_, j_) for (i_, j_) in _CENTER4))
        pn = [flat[0] * 2.0 - 1.0, flat[1] * 2.0 - 1.0, flat[2] * 2.0 - 1.0]
        inv = jax.lax.rsqrt(jnp.maximum(pn[0] ** 2 + pn[1] ** 2 + pn[2] ** 2, 1e-15))
        pn = [a * inv for a in pn]
        pwx = p2w[0] * pn[0] + p2w[1] * pn[1] + p2w[2] * pn[2]
        pwy = p2w[3] * pn[0] + p2w[4] * pn[1] + p2w[5] * pn[2]
        pwz = p2w[6] * pn[0] + p2w[7] * pn[1] + p2w[8] * pn[2]
        backface = (nau[0] * pwx + nau[1] * pwy + nau[2] * pwz) < 0.0
        bval = [jnp.where(backface, 0.0, b) for b in bval]
        bicubic_valid = jnp.logical_and(bicubic_valid, jnp.logical_not(backface))

        bw00 = (1.0 - fx) * (1.0 - fy)
        bw10 = fx * (1.0 - fy)
        bw01 = (1.0 - fx) * fy
        bw11 = fx * fy
        bws = [bw00, bw10, bw01, bw11]
        cw = [bws[k] * bval[k] for k in range(4)]
        cwsum = cw[0] + cw[1] + cw[2] + cw[3]

        def resolve_custom(fp_):
            acc = sum(fp_.tap(i_, j_) * cw[k] for k, (i_, j_) in enumerate(_CENTER4))
            return jnp.where(cwsum < 1e-4, 0.0, acc / jnp.where(cwsum < 1e-4, 1.0, cwsum))

        hl_res = resolve_custom(fp(hl_w))
        ht_res = resolve_custom(fp(ht_w)) if has_spec else None

        wxs = _crw(fx)
        wys = _crw(fy)
        cat_w = {}
        cat_wsum = jnp.zeros((bh, bw), jnp.float32)
        for j_ in range(4):
            for i_ in range(4):
                if (i_, j_) in _CORNER4:
                    continue
                w_ = wxs[i_] * wys[j_] * on_screen(i_, j_) * valid
                cat_w[(i_, j_)] = w_
                cat_wsum = cat_wsum + w_

        hist_out = []
        for hw_ in hist_wins:
            fp_ = fp(hw_)
            cat_acc = sum(fp_.tap(i_, j_) * w_ for (i_, j_), w_ in cat_w.items())
            cat = jnp.where(jnp.abs(cat_wsum) < 1e-4, 0.0,
                            cat_acc / jnp.where(jnp.abs(cat_wsum) < 1e-4, 1.0, cat_wsum))
            bil = resolve_custom(fp_)
            hist_out.append(jnp.where(bicubic_valid, cat, bil))

        k = 0
        for v_ in hist_out:
            outs[k][:, :] = v_
            k += 1
        for bw_ in bil_wins:  # occlusion-weighted bilinear (SH histories)
            outs[k][:, :] = resolve_custom(fp(bw_))
            k += 1
        outs[k][:, :] = hl_res; k += 1
        outs[k][:, :] = bicubic_valid.astype(jnp.float32); k += 1
        outs[k][:, :] = (bval[0] + bval[1] + bval[2] + bval[3] > 0.0) \
            .astype(jnp.float32); k += 1
        outs[k][:, :] = cwsum; k += 1
        for a in nau:
            outs[k][:, :] = a; k += 1
        for a in na:
            outs[k][:, :] = a; k += 1
        if has_spec:
            outs[k][:, :] = ht_res; k += 1
            outs[k][:, :] = min_hit; k += 1

    @pl.when(wide)
    def _():
        qyw = jnp.clip(qy, -2.0, 1.999)
        qxw = jnp.clip(qx, -2.0, 1.999)
        fl_y = jnp.floor(qyw)
        fl_x = jnp.floor(qxw)
        my = [(k, (fl_y == k).astype(jnp.float32)) for k in range(-2, 2)]
        mx = [(k, (fl_x == k).astype(jnp.float32)) for k in range(-2, 2)]
        _resolve_body(my, mx, qyw - fl_y, qxw - fl_x, fl_y, fl_x)

    @pl.when(jnp.logical_not(wide))
    def _():
        qyn = jnp.clip(qy, -1.0, 0.999)
        qxn = jnp.clip(qx, -1.0, 0.999)
        myf = (qyn < 0.0).astype(jnp.float32)
        mxf = (qxn < 0.0).astype(jnp.float32)
        my = [(-1, myf), (0, 1.0 - myf)]
        mx = [(-1, mxf), (0, 1.0 - mxf)]
        _resolve_body(my, mx, qyn + myf, qxn + mxf, -myf, -mxf)


def relax_smb_resolve(sc, dc, config, *, mv_pix_y, mv_pix_x, xv_prev_z, base_thr,
                      material_id, cur_nr_packed, cur_spec_hit, prev_view_z, prev_mat,
                      prev_hl, prev_ht, prev_nr_packed, hist_planes, has_spec,
                      bil_planes=()):
    """RELAX surface-motion loader: 4x4 occlusion, backface test, history length,
    CatRom-with-fallback histories, current 3x3 n_avg (+ min spec hitT).

    bil_planes: extra planes resolved with the occlusion-weighted bilinear only
    (the SH histories' resolve class).
    Returns dict(hist=[...], bil=[...], history_length, bicubic_valid, any_valid,
    custom_wsum, n_avg_unit (h,w,3), n_avg (h,w,3)[, reflection_hit_t, min_hit])."""
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    min_material = jnp.minimum(dc["spec_min_material"], dc["diff_min_material"])
    scalars = jnp.concatenate([
        jnp.asarray(sc["world_prev_to_world"])[:3, :3].reshape(-1).astype(jnp.float32),
        jnp.stack([jnp.asarray(min_material, jnp.float32),
                   jnp.asarray(sc["rect_size_prev"][0], jnp.float32),
                   jnp.asarray(sc["rect_size_prev"][1], jnp.float32),
                   jnp.asarray(sc["view_z_scale"], jnp.float32)]),
    ])
    base_y, base_x = _rp.block_motion_base(mv_pix_y, mv_pix_x, BLOCK,
                                           bound=(HALO[0] - 4, HALO[1] - 4))
    wide_b = _rp.block_wide_flag(mv_pix_y, mv_pix_x, base_y, base_x, BLOCK, HALO)

    windows = [prev_view_z, prev_mat, prev_hl]
    if has_spec:
        windows.append(prev_ht)
    windows += [prev_nr_packed[..., c] for c in range(4)]
    windows += list(hist_planes) + list(bil_planes)
    windows += [cur_nr_packed[..., 0], cur_nr_packed[..., 1]]
    if has_spec:
        windows.append(cur_spec_hit)
    centers = [mv_pix_y, mv_pix_x, xv_prev_z, base_thr, material_id]

    n_hist = len(hist_planes)
    n_bil = len(bil_planes)
    n_out = n_hist + n_bil + 10 + (2 if has_spec else 0)
    n_cur = 3 if has_spec else 2  # trailing current-frame windows (cnr, cur_spec_hit)
    outs = stencil_call2(
        functools.partial(_relax_smb_kernel, has_spec, n_hist, n_bil, mat_occ),
        windows, n_out=n_out, halo=HALO, block=BLOCK,
        scalars=scalars, block_scalars=[base_y, base_x, wide_b], center_inputs=centers,
        base_offset=(base_y, base_x),
        offset_windows=[True] * (len(windows) - n_cur) + [False] * n_cur)
    res = dict(hist=list(outs[:n_hist]), bil=list(outs[n_hist:n_hist + n_bil]))
    k = n_hist + n_bil
    res["history_length"] = outs[k]; k += 1
    res["bicubic_valid"] = outs[k] > 0.5; k += 1
    res["any_valid"] = outs[k] > 0.5; k += 1
    res["custom_wsum"] = outs[k]; k += 1
    res["n_avg_unit"] = jnp.stack(outs[k:k + 3], -1); k += 3
    res["n_avg"] = jnp.stack(outs[k:k + 3], -1); k += 3
    if has_spec:
        res["reflection_hit_t"] = outs[k]; k += 1
        res["min_hit"] = outs[k]
    return res


def _relax_vmb_kernel(mat_occ, n_sh, smem, bsm, wins, centers, outs, origin, scratch):
    wi = iter(wins)
    zp_w = next(wi)
    mat_w = next(wi)
    ht_w = next(wi)
    nrp = [next(wi) for _ in range(4)]
    hists = [next(wi) for _ in range(8)]  # spec_illum(4) + spec_resp(4)
    sh_wins = [next(wi) for _ in range(n_sh)]  # sh_prev(4) + sh_resp(4) when SH

    ci = iter(centers)
    mvy = next(ci)[:, :]
    mvx = next(ci)[:, :]
    n_c = [next(ci)[:, :] for _ in range(3)]
    xmd = [next(ci)[:, :] for _ in range(3)]   # x - camera_delta
    thr_base = next(ci)[:, :]
    mat_c = next(ci)[:, :]
    smb_bicubic = next(ci)[:, :] > 0.5

    i, j = pl.program_id(0), pl.program_id(1)
    base_y, base_x = bsm[0][i, j], bsm[1][i, j]

    fr = [smem[k] for k in range(9)]  # PREV frustum right/up/forward (world)
    min_material = smem[9]
    rect_w = smem[10]
    rect_h = smem[11]
    view_z_scale = smem[12]
    ortho = smem[13]

    bh, bw = mvy.shape
    # BLOCK-ADAPTIVE exact residual capture (see reblur_pallas _smb_kernel)
    qy, qx, valid = _rp.residual_and_validity(mvy, mvx, base_y, base_x, budget=5.0)
    wide = bsm[2][i, j] > 0.0

    def _resolve_body(my, mx, fy, fx, fl_y, fl_x):
        def fp(w_):
            return _FP(w_, my, mx)  # prev-frame windows arrive pre-shifted by the DMA base

        row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
        ox = origin[1].astype(jnp.float32) + col + base_x.astype(jnp.float32) + fl_x
        oy = origin[0].astype(jnp.float32) + row + base_y.astype(jnp.float32) + fl_y
        inv_w = 1.0 / rect_w
        inv_h = 1.0 / rect_h

        def prev_world_pos(uu, vv, zz):
            cx = uu * 2.0 - 1.0
            cy = vv * 2.0 - 1.0
            out = []
            for a in range(3):
                persp = zz * (fr[6 + a] + fr[a] * cx - fr[3 + a] * cy)
                orth = zz * fr[6 + a] + fr[a] * cx - fr[3 + a] * cy
                out.append(jnp.where(ortho == 0.0, persp, orth))
            return out

        zfp = fp(zp_w)
        matfp = fp(mat_w)
        vval = []
        for k, (i_, j_) in enumerate(_CENTER4):
            tx = ox + (i_ - 1)
            ty = oy + (j_ - 1)
            scr = ((tx >= 0.0) & (tx < rect_w) & (ty >= 0.0) & (ty < rect_h)) \
                .astype(jnp.float32)
            zp_ = jnp.abs(zfp.tap(i_, j_)) * view_z_scale
            tap_u = (tx + 0.5) * inv_w
            tap_v = (ty + 0.5) * inv_h
            xpx, xpy, xpz = prev_world_pos(tap_u, tap_v, zp_)
            pd = jnp.abs((xmd[0] - xpx) * n_c[0] + (xmd[1] - xpy) * n_c[1]
                         + (xmd[2] - xpz) * n_c[2])
            thr = thr_base * scr * valid - NRD_EPS
            ok = (pd <= thr).astype(jnp.float32)
            if mat_occ:
                ok = ok * (jnp.maximum(mat_c, min_material)
                           == jnp.maximum(matfp.tap(i_, j_), min_material)) \
                    .astype(jnp.float32)
            vval.append(ok)

        vany = (vval[0] + vval[1] + vval[2] + vval[3]) > 0.0
        vall = (vval[0] * vval[1] * vval[2] * vval[3]) > 0.0
        use_bicubic = smb_bicubic & vall

        bw00 = (1.0 - fx) * (1.0 - fy)
        bw10 = fx * (1.0 - fy)
        bw01 = (1.0 - fx) * fy
        bw11 = fx * fy
        bws = [bw00, bw10, bw01, bw11]
        cw = [bws[k] * vval[k] for k in range(4)]
        cwsum = cw[0] + cw[1] + cw[2] + cw[3]

        def resolve_custom(fp_):
            acc = sum(fp_.tap(i_, j_) * cw[k] for k, (i_, j_) in enumerate(_CENTER4))
            return jnp.where(cwsum < 1e-4, 0.0, acc / jnp.where(cwsum < 1e-4, 1.0, cwsum))

        wxs = _crw(fx)
        wys = _crw(fy)
        cat_w = {}
        cat_wsum = jnp.zeros((bh, bw), jnp.float32)
        for j_ in range(4):
            for i_ in range(4):
                if (i_, j_) in _CORNER4:
                    continue
                tx = ox + (i_ - 1)
                ty = oy + (j_ - 1)
                scr = ((tx >= 0.0) & (tx < rect_w) & (ty >= 0.0) & (ty < rect_h)) \
                    .astype(jnp.float32)
                w_ = wxs[i_] * wys[j_] * scr * valid
                cat_w[(i_, j_)] = w_
                cat_wsum = cat_wsum + w_

        k_out = 0
        for hw_ in hists:
            fp_ = fp(hw_)
            cat_acc = sum(fp_.tap(i_, j_) * w_ for (i_, j_), w_ in cat_w.items())
            cat = jnp.where(jnp.abs(cat_wsum) < 1e-4, 0.0,
                            cat_acc / jnp.where(jnp.abs(cat_wsum) < 1e-4, 1.0, cat_wsum))
            bil = resolve_custom(fp_)
            outs[k_out][:, :] = jnp.where(use_bicubic, cat, bil)
            k_out += 1

        # plain bilinear for reflection_hit_t + packed prev normal/roughness
        pw = []
        for k, (i_, j_) in enumerate(_CENTER4):
            tx = ox + (i_ - 1)
            ty = oy + (j_ - 1)
            scr = ((tx >= 0.0) & (tx < rect_w) & (ty >= 0.0) & (ty < rect_h)) \
                .astype(jnp.float32)
            pw.append(bws[k] * scr * valid)
        pws = pw[0] + pw[1] + pw[2] + pw[3]

        def resolve_plain(fp_):
            acc = sum(fp_.tap(i_, j_) * pw[k] for k, (i_, j_) in enumerate(_CENTER4))
            return jnp.where(pws < 1e-4, 0.0, acc / jnp.where(pws < 1e-4, 1.0, pws))

        outs[k_out][:, :] = resolve_plain(fp(ht_w)); k_out += 1
        for c in range(4):
            outs[k_out][:, :] = resolve_plain(fp(nrp[c])); k_out += 1
        outs[k_out][:, :] = vany.astype(jnp.float32); k_out += 1
        outs[k_out][:, :] = vall.astype(jnp.float32); k_out += 1
        for sw in sh_wins:  # SH histories: occlusion-weighted bilinear
            outs[k_out][:, :] = resolve_custom(fp(sw)); k_out += 1

    @pl.when(wide)
    def _():
        qyw = jnp.clip(qy, -2.0, 1.999)
        qxw = jnp.clip(qx, -2.0, 1.999)
        fl_y = jnp.floor(qyw)
        fl_x = jnp.floor(qxw)
        my = [(k, (fl_y == k).astype(jnp.float32)) for k in range(-2, 2)]
        mx = [(k, (fl_x == k).astype(jnp.float32)) for k in range(-2, 2)]
        _resolve_body(my, mx, qyw - fl_y, qxw - fl_x, fl_y, fl_x)

    @pl.when(jnp.logical_not(wide))
    def _():
        qyn = jnp.clip(qy, -1.0, 0.999)
        qxn = jnp.clip(qx, -1.0, 0.999)
        myf = (qyn < 0.0).astype(jnp.float32)
        mxf = (qxn < 0.0).astype(jnp.float32)
        my = [(-1, myf), (0, 1.0 - myf)]
        mx = [(-1, mxf), (0, 1.0 - mxf)]
        _resolve_body(my, mx, qyn + myf, qxn + mxf, -myf, -mxf)


def relax_vmb_resolve(sc, dc, config, *, mv_pix_y, mv_pix_x, n, x_minus_delta,
                      thr_base, material_id, smb_bicubic, prev_view_z, prev_mat,
                      prev_ht, prev_nr_packed, spec_illum_prev, spec_resp_prev,
                      sh_prev=None, sh_resp_prev=None):
    """RELAX virtual-motion loader (TA lines 222-348): 2x2 plane-distance occlusion in
    PREVIOUS camera space, CatRom spec histories, plain-bilinear hitT + packed normals.

    Returns dict(spec_vmb (h,w,4), spec_vmb_resp (h,w,4), hit_t, nr_packed (h,w,4),
    any, all[, sh_vmb, sh_vmb_resp])."""
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    scalars = jnp.concatenate([
        jnp.asarray(sc["prev_frustum_right"], jnp.float32),
        jnp.asarray(sc["prev_frustum_up"], jnp.float32),
        jnp.asarray(sc["prev_frustum_forward"], jnp.float32),
        jnp.stack([jnp.asarray(dc["spec_min_material"], jnp.float32),
                   jnp.asarray(sc["rect_size_prev"][0], jnp.float32),
                   jnp.asarray(sc["rect_size_prev"][1], jnp.float32),
                   jnp.asarray(sc["view_z_scale"], jnp.float32),
                   jnp.asarray(sc["ortho_mode"], jnp.float32)]),
    ])
    base_y, base_x = _rp.block_motion_base(mv_pix_y, mv_pix_x, BLOCK,
                                           bound=(HALO[0] - 4, HALO[1] - 4))
    wide_b = _rp.block_wide_flag(mv_pix_y, mv_pix_x, base_y, base_x, BLOCK, HALO)
    windows = ([prev_view_z, prev_mat, prev_ht]
               + [prev_nr_packed[..., c] for c in range(4)]
               + [spec_illum_prev[..., c] for c in range(4)]
               + [spec_resp_prev[..., c] for c in range(4)])
    n_sh = 0 if sh_prev is None else 8
    if n_sh:
        windows += ([sh_prev[..., c] for c in range(4)]
                    + [sh_resp_prev[..., c] for c in range(4)])
    centers = [mv_pix_y, mv_pix_x, n[..., 0], n[..., 1], n[..., 2],
               x_minus_delta[..., 0], x_minus_delta[..., 1], x_minus_delta[..., 2],
               thr_base, material_id, smb_bicubic.astype(jnp.float32)]
    outs = stencil_call2(
        functools.partial(_relax_vmb_kernel, mat_occ, n_sh),
        windows, n_out=15 + n_sh, halo=HALO, block=BLOCK,
        scalars=scalars, block_scalars=[base_y, base_x, wide_b], center_inputs=centers,
        base_offset=(base_y, base_x), offset_windows=[True] * len(windows))
    res = dict(spec_vmb=jnp.stack(outs[0:4], -1),
               spec_vmb_resp=jnp.stack(outs[4:8], -1),
               hit_t=outs[8], nr_packed=jnp.stack(outs[9:13], -1),
               any=outs[13] > 0.5, all=outs[14] > 0.5)
    if n_sh:
        res["sh_vmb"] = jnp.stack(outs[15:19], -1)
        res["sh_vmb_resp"] = jnp.stack(outs[19:23], -1)
    return res


# ---------------------------------------------------------------------------
# HistoryFix (RELAX_HistoryFix.hlsli) - sparse 5x5 cross-bilateral at per-pixel stride
# ---------------------------------------------------------------------------

HF_STRIDE_LEVELS = (1.0, 2.0, 4.0, 8.0, 14.0)


def _hf_stride_weights(stride):
    levels = HF_STRIDE_LEVELS
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


def _relax_hfix_kernel(has_diff, has_spec, d_sh, s_sh, mat_occ, smem, bsm, wins,
                       centers, outs, origin, scratch):
    wi = iter(wins)
    zw = next(wi)
    nr = [next(wi) for _ in range(4)]
    dsig = [next(wi) for _ in range(4)] if has_diff else None
    ssig = [next(wi) for _ in range(4)] if has_spec else None
    dsh = [next(wi) for _ in range(4)] if d_sh else None
    ssh = [next(wi) for _ in range(4)] if s_sh else None

    ci = iter(centers)
    stride_r = next(ci)
    thr_r = next(ci)
    n_c = [next(ci)[:, :] for _ in range(3)]
    x_c = [next(ci)[:, :] for _ in range(3)]
    cv_c = [next(ci)[:, :] for _ in range(3)]
    mat_c = next(ci)[:, :]
    if has_spec:
        angle0 = next(ci)[:, :]
        f0 = next(ci)[:, :]

    fr = [smem[k] for k in range(9)]
    view_z_scale = smem[9]
    ortho = smem[10]
    norm_power = smem[11]
    rough_relax = smem[12]
    min_mat_d = smem[13]
    min_mat_s = smem[14]
    rect_w = smem[15]
    rect_h = smem[16]

    stride = stride_r[:, :]
    thr = thr_r[:, :]
    nx_, ny_, nz_ = n_c
    xx_, xy_, xz_ = x_c
    cvx, cvy, cvz = cv_c

    bh, bw = stride.shape
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (origin[1].astype(jnp.float32) + col + 0.5) * inv_w
    v = (origin[0].astype(jnp.float32) + row + 0.5) * inv_h

    def world_pos(uu, vv, zz):
        cx = uu * 2.0 - 1.0
        cy = vv * 2.0 - 1.0
        out = []
        for a in range(3):
            persp = zz * (fr[6 + a] + fr[a] * cx - fr[3 + a] * cy)
            orth = zz * fr[6 + a] + fr[a] * cx - fr[3 + a] * cy
            out.append(jnp.where(ortho == 0.0, persp, orth))
        return out

    # init: pass-through (the caller's apply_fix select keeps these elsewhere)
    n_d = 4 if has_diff else 0
    n_s = 4 if has_spec else 0
    if has_diff:
        for c in range(4):
            outs[c][:, :] = dsig[c].tap()
    if has_spec:
        for c in range(4):
            outs[n_d + c][:, :] = ssig[c].tap()
    if d_sh:
        for c in range(4):
            outs[n_d + n_s + c][:, :] = dsh[c].tap()
    if s_sh:
        for c in range(4):
            outs[n_d + n_s + (4 if d_sh else 0) + c][:, :] = ssh[c].tap()
    i_b, j_b = pl.program_id(0), pl.program_id(1)
    smin = jnp.maximum(bsm[0][i_b, j_b], jnp.float32(HF_STRIDE_LEVELS[0]))
    smax = jnp.minimum(bsm[1][i_b, j_b], jnp.float32(HF_STRIDE_LEVELS[-1]))
    fix_any = bsm[2][i_b, j_b]

    @pl.when(fix_any > 0.0)
    def _():
        _relax_hfix_taps(has_diff, has_spec, d_sh, s_sh, mat_occ, smin, smax, stride,
                         thr, nx_, ny_, nz_, xx_, xy_, xz_, cvx, cvy, cvz, mat_c,
                         angle0 if has_spec else None, f0 if has_spec else None,
                         zw, nr, dsig, ssig, dsh, ssh, u, v, inv_w, inv_h, world_pos,
                         view_z_scale, norm_power, rough_relax, min_mat_d, min_mat_s,
                         outs, scratch, bh, bw)


_HF_LO = [-1e9] + list(HF_STRIDE_LEVELS[:-1])
_HF_HI = list(HF_STRIDE_LEVELS[1:]) + [1e9]


def _relax_hfix_taps(has_diff, has_spec, d_sh, s_sh, mat_occ, smin, smax, stride,
                     thr, nx_, ny_, nz_, xx_, xy_, xz_, cvx, cvy, cvz, mat_c,
                     angle0, f0, zw, nr, dsig, ssig, dsh, ssh, u, v, inv_w, inv_h,
                     world_pos, view_z_scale, norm_power, rough_relax, min_mat_d,
                     min_mat_s, outs, scratch, bh, bw):
    from jax.experimental import pallas as pl  # local alias for the nested whens

    lw_all = _hf_stride_weights(stride)
    n_d = 4 if has_diff else 0
    n_s = 4 if has_spec else 0
    sh0 = n_d + n_s
    scratch[0][:, :] = jnp.ones((bh, bw), jnp.float32)
    scratch[1][:, :] = jnp.ones((bh, bw), jnp.float32)

    for li, lv in enumerate(HF_STRIDE_LEVELS):
        active = (smax > jnp.float32(_HF_LO[li])) & (smin < jnp.float32(_HF_HI[li]))

        @pl.when(active)
        def _(li=li, lv=lv):
            d_acc = [outs[c][:, :] for c in range(4)] if has_diff else None
            s_acc = [outs[n_d + c][:, :] for c in range(4)] if has_spec else None
            dsh_acc = [outs[sh0 + c][:, :] for c in range(4)] if d_sh else None
            ssh_acc = [outs[sh0 + (4 if d_sh else 0) + c][:, :]
                       for c in range(4)] if s_sh else None
            d_wsum = scratch[0][:, :]
            s_wsum = scratch[1][:, :]
            for j_ in range(-2, 3):
                for i_ in range(-2, 3):
                    if i_ == 0 and j_ == 0:
                        continue
                    ox = max(-28, min(28, int(round(i_ * lv))))
                    oy = max(-28, min(28, int(round(j_ * lv))))
                    us = u + ox * inv_w
                    vs = v + oy * inv_h
                    inside = ((us > 0.0) & (us < 1.0) & (vs > 0.0) & (vs < 1.0)) \
                        .astype(jnp.float32)
                    zs = jnp.abs(zw.tap(oy, ox)) * view_z_scale
                    n0 = nr[0].tap(oy, ox)
                    n1 = nr[1].tap(oy, ox)
                    nsx, nsy, nsz = _decode_oct(n0, n1)
                    xsx, xsy, xsz = world_pos(us, vs, zs)
                    pd = jnp.abs((xsx - xx_) * nx_ + (xsy - xy_) * ny_
                                 + (xsz - xz_) * nz_)
                    gw = (pd < thr).astype(jnp.float32) * lw_all[li]
                    ndn = nx_ * nsx + ny_ * nsy + nz_ * nsz
                    if has_diff:
                        dw = gw * jnp.exp(jnp.log(jnp.maximum(0.01, ndn))
                                          * jnp.maximum(norm_power, 0.01))
                        dw = dw * inside
                        if mat_occ:
                            ms = nr[3].tap(oy, ox)
                            dw = dw * (jnp.maximum(ms, min_mat_d)
                                       == jnp.maximum(mat_c, min_mat_d)) \
                                .astype(jnp.float32)
                        keep = dw > 1e-4
                        for c in range(4):
                            s_t = dsig[c].tap(oy, ox)
                            d_acc[c] = d_acc[c] + jnp.where(keep, s_t * dw, 0.0)
                        if d_sh:
                            for c in range(4):
                                t_ = dsh[c].tap(oy, ox)
                                dsh_acc[c] = dsh_acc[c] + jnp.where(keep, t_ * dw, 0.0)
                        d_wsum = d_wsum + jnp.where(keep, dw, 0.0)
                    if has_spec:
                        tx = xsx + rough_relax * xx_
                        ty = xsy + rough_relax * xy_
                        tz = xsz + rough_relax * xz_
                        inv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz,
                                                        1e-15))
                        svx, svy, svz = -tx * inv, -ty * inv, -tz * inv
                        cosa = jnp.minimum(ndn, cvx * svx + cvy * svy + cvz * svz)
                        a_ = _smoothstep(0.0, angle0, _acos_approx(cosa))
                        sw_ = gw * jnp.clip(1.0 - a_ * f0, 0.0, 1.0)
                        sw_ = sw_ * inside
                        if mat_occ:
                            ms = nr[3].tap(oy, ox)
                            sw_ = sw_ * (jnp.maximum(ms, min_mat_s)
                                         == jnp.maximum(mat_c, min_mat_s)) \
                                .astype(jnp.float32)
                        keep = sw_ > 1e-4
                        for c in range(4):
                            s_t = ssig[c].tap(oy, ox)
                            s_acc[c] = s_acc[c] + jnp.where(keep, s_t * sw_, 0.0)
                        if s_sh:
                            for c in range(4):
                                t_ = ssh[c].tap(oy, ox)
                                ssh_acc[c] = ssh_acc[c] + jnp.where(keep, t_ * sw_, 0.0)
                        s_wsum = s_wsum + jnp.where(keep, sw_, 0.0)
            if has_diff:
                for c in range(4):
                    outs[c][:, :] = d_acc[c]
                scratch[0][:, :] = d_wsum
            if has_spec:
                for c in range(4):
                    outs[n_d + c][:, :] = s_acc[c]
                scratch[1][:, :] = s_wsum
            if d_sh:
                for c in range(4):
                    outs[sh0 + c][:, :] = dsh_acc[c]
            if s_sh:
                for c in range(4):
                    outs[sh0 + (4 if d_sh else 0) + c][:, :] = ssh_acc[c]

    if has_diff:
        inv_d = 1.0 / scratch[0][:, :]
        for c in range(4):
            outs[c][:, :] = outs[c][:, :] * inv_d
        if d_sh:
            for c in range(4):
                outs[sh0 + c][:, :] = outs[sh0 + c][:, :] * inv_d
    if has_spec:
        inv_s = 1.0 / scratch[1][:, :]
        for c in range(4):
            outs[n_d + c][:, :] = outs[n_d + c][:, :] * inv_s
        if s_sh:
            for c in range(4):
                outs[sh0 + (4 if d_sh else 0) + c][:, :] = \
                    outs[sh0 + (4 if d_sh else 0) + c][:, :] * inv_s


def relax_history_fix_pallas(sc, dc, config, *, stride, thr_eff, n, x, cv, material_id,
                             view_z_in, normal_roughness, diff, spec, apply_fix=None,
                             angle0=None, f0=None, diff_sh=None, spec_sh=None):
    """RELAX HistoryFix sparse 5x5 taps on Pallas; per-pixel stride via HF_STRIDE_LEVELS
    hat blending (documented divergence vs continuous stride)."""
    has_diff = diff is not None
    has_spec = spec is not None
    mat_occ = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"
    scalars = jnp.concatenate([
        jnp.asarray(sc["frustum_right"], jnp.float32),
        jnp.asarray(sc["frustum_up"], jnp.float32),
        jnp.asarray(sc["frustum_forward"], jnp.float32),
        jnp.stack([
            jnp.asarray(sc["view_z_scale"], jnp.float32),
            jnp.asarray(sc["ortho_mode"], jnp.float32),
            jnp.asarray(dc["history_fix_edge_stopping_normal_power"], jnp.float32),
            jnp.asarray(dc["roughness_edge_stopping_relaxation"], jnp.float32),
            jnp.asarray(dc["diff_min_material"], jnp.float32),
            jnp.asarray(dc["spec_min_material"], jnp.float32),
            jnp.asarray(sc["rect_size"][0], jnp.float32),
            jnp.asarray(sc["rect_size"][1], jnp.float32),
        ]),
    ])
    d_sh = diff_sh is not None
    s_sh = spec_sh is not None
    windows = [view_z_in] + [normal_roughness[..., c] for c in range(4)]
    if has_diff:
        windows += [diff[..., c] for c in range(4)]
    if has_spec:
        windows += [spec[..., c] for c in range(4)]
    if d_sh:
        windows += [diff_sh[..., c] for c in range(4)]
    if s_sh:
        windows += [spec_sh[..., c] for c in range(4)]
    centers = [stride, thr_eff, n[..., 0], n[..., 1], n[..., 2],
               x[..., 0], x[..., 1], x[..., 2],
               cv[..., 0], cv[..., 1], cv[..., 2], material_id]
    if has_spec:
        centers += [angle0, f0]
    n_out = 4 * (int(has_diff) + int(has_spec) + int(d_sh) + int(s_sh))
    from .harness2 import block_minmax
    smin_b, smax_b = block_minmax(stride, BLOCK, HALO)
    fix = apply_fix if apply_fix is not None else jnp.ones_like(stride, bool)
    fix_b = block_minmax(fix.astype(jnp.float32), BLOCK, HALO)[1]
    outs = stencil_call2(
        functools.partial(_relax_hfix_kernel, has_diff, has_spec, d_sh, s_sh, mat_occ),
        windows, n_out=n_out, halo=HALO, block=BLOCK,
        scalars=scalars, center_inputs=centers,
        block_scalars=[smin_b, smax_b, fix_b], scratch_blocks=2)
    k = 0
    d_out = s_out = dsh_out = ssh_out = None
    if has_diff:
        d_out = jnp.stack(outs[k:k + 4], -1)
        k += 4
    if has_spec:
        s_out = jnp.stack(outs[k:k + 4], -1)
        k += 4
    if d_sh:
        dsh_out = jnp.stack(outs[k:k + 4], -1)
        k += 4
    if s_sh:
        ssh_out = jnp.stack(outs[k:k + 4], -1)
    return d_out, s_out, dsh_out, ssh_out
