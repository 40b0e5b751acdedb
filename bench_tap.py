"""Per-tap cost decomposition for the fused spatial-filter kernel family.

The round-2 stage table shows every 8-tap spatial stage (prepass / blur / postblur,
reblur_fused.py) costing ~1.5 ms per tap direction at 1440p, ~5x the sum of its
load + VPU op costs under the bench_micro/bench_vpu single-op rooflines. This bench
replicates the fused BLUR tap loop (2 signals, 13 windows, same block/halo/level
machinery) and toggles its pieces to find where the 1.5 ms actually goes:

  fixed      n_dirs=0: DMAs + init + final divide (launch floor)
  loads      taps loaded and summed, no weight math
  geom       + shared geometry chain (acos, plane dist, bounds, sstep)
  full       + per-signal weights (replica of _fused_blur_kernel)
  fuse1exp   full, but the two per-signal exps merged into one exp
  arithmask  full, but the in-screen bounds test as arithmetic min/max product
  refsacc    full, accumulating into out refs instead of carried values
  onelevel   full, but only the single level the bench blocks select is compiled
             (the real kernel instantiates the loop for all 8 levels under pl.when)

Usage: python bench_tap.py [variant ...] (default: all). TPU-only.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nrdtpu.kernels.harness2 import stencil_call2
from nrdtpu.kernels.reblur_blur2 import HALO2, _LEV, _LO, _HI, _static_offsets
from nrdtpu.kernels.reblur_pallas import _acos_approx, _exp_w, _sstep10

W, H = 2560, 1440
N = 64  # frames per timed call


def _replica_kernel(n_dirs, mode, levels, smem, bsm, wins, centers, outs, origin,
                    scratch):
    zw = wins[0]
    wnx, wny, wnz, wrs = wins[1:5]
    sig_wins = [wins[5:9], wins[9:13]]

    ci = iter(centers)
    ga_r = next(ci); gb_r = next(ci)
    nv_r = [next(ci) for _ in range(3)]
    per = []
    for _ in range(2):
        p = {k: next(ci) for k in ("radius", "nwp", "ha", "hb", "mhdw",
                                   "wra", "wrb")}
        per.append(p)

    rmin_b, rmax_b = bsm[0], bsm[1]
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
    view_z = zw.tap()

    for si, p in enumerate(per):
        radius = jnp.clip(p["radius"][:, :], _LEV[0], _LEV[-1])
        p["inv_r2"] = 1.0 / (radius * radius)
        p["nwp_c"] = p["nwp"][:, :]
        p["ha_c"] = p["ha"][:, :]; p["hb_c"] = p["hb"][:, :]
        p["mhdw_c"] = p["mhdw"][:, :]
        p["wra_c"] = p["wra"][:, :]; p["wrb_c"] = p["wrb"][:, :]

    for si in range(2):
        scratch[si][:, :] = jnp.ones((bh, bw), jnp.float32)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = sig_wins[si][k_].tap()

    i_b = pl.program_id(0)
    j_b = pl.program_id(1)
    rmax = jnp.minimum(rmax_b[i_b, j_b], jnp.float32(_LEV[-1]))

    taps = _static_offsets(8)[:n_dirs] if n_dirs else []

    if mode == "switch":
        # n-way real branch on the block's level index instead of n pl.when buckets
        import functools as _ft
        idx = jnp.int32(-1)
        for li in levels:
            idx = idx + (rmax > jnp.float32(_LO[li])).astype(jnp.int32)

        def level_body(li):
            sums = [scratch[0][:, :], scratch[1][:, :]]
            accs = [[outs[si * 4 + k_][:, :] for k_ in range(4)]
                    for si in range(2)]
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
                w_geo = ((fx >= jnp.float32(-off_x))
                         & (fx <= rect_w - jnp.float32(1 + off_x))
                         & (fy >= jnp.float32(-off_y))
                         & (fy <= rect_h - jnp.float32(1 + off_y))
                         ).astype(jnp.float32)
                plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
                w_geo = w_geo * _sstep10(jnp.abs(plane_d * ga + gb))
                for si, p in enumerate(per):
                    w_ = w_geo * _sstep10(jnp.abs(angle * p["nwp_c"]))
                    if si == 1:
                        w_ = w_ * _sstep10(jnp.abs(rs * p["wra_c"] + p["wrb_c"]))
                    s_taps = [sg.tap(off_y, off_x) for sg in sig_wins[si]]
                    s_hd = s_taps[-1]
                    w_ = w_ * (p["mhdw_c"] + (1.0 - p["mhdw_c"])
                               * _exp_w(s_hd * p["ha_c"] + p["hb_c"]))
                    w_ = w_ * jnp.exp(jnp.float32(k_t) * p["inv_r2"])
                    sums[si] = sums[si] + w_
                    accs[si] = [a + st * w_ for a, st in zip(accs[si], s_taps)]
            for si in range(2):
                scratch[si][:, :] = sums[si]
                for k_ in range(4):
                    outs[si * 4 + k_][:, :] = accs[si][k_]

        jax.lax.switch(idx, [_ft.partial(level_body, li) for li in levels])
        for si in range(2):
            inv = 1.0 / jnp.maximum(scratch[si][:, :], 1e-15)
            for k_ in range(4):
                outs[si * 4 + k_][:, :] = outs[si * 4 + k_][:, :] * inv
        return

    same = mode == "when5same"
    for li in levels:
        active = (rmax > jnp.float32(_LO[li])) & (rmax <= jnp.float32(_HI[li]))
        if same:
            mode = "full"
            li = levels[len(levels) // 2 + 1] if len(levels) > 1 else li

        @pl.when(active)
        def _(li=li):
            sums = [scratch[0][:, :], scratch[1][:, :]]
            accs = [[outs[si * 4 + k_][:, :] for k_ in range(4)]
                    for si in range(2)]
            for k in range(n_dirs):
                off_y, off_x, k_t = taps[k][li]
                zs = zw.tap(off_y, off_x)
                nsx = wnx.tap(off_y, off_x)
                nsy = wny.tap(off_y, off_x)
                nsz = wnz.tap(off_y, off_x)
                rs = wrs.tap(off_y, off_x)
                if mode == "loads":
                    w_sh = zs + nsx + nsy + nsz + rs
                    for si in range(2):
                        s_taps = [sg.tap(off_y, off_x) for sg in sig_wins[si]]
                        if mode == "refsacc":
                            for k_, st in enumerate(s_taps):
                                outs[si * 4 + k_][:, :] += st
                        else:
                            accs[si] = [a + st for a, st in zip(accs[si], s_taps)]
                        sums[si] = sums[si] + w_sh
                    continue
                # shared geometry chain
                angle = _acos_approx(ncx * nsx + ncy * nsy + ncz * nsz)
                s_f = zs * s_lin + abs_ortho
                kx = jnp.float32(off_x) * inv_w * 0.9
                ky = jnp.float32(off_y) * inv_h * 0.5
                if mode == "arithmask":
                    # in-screen via arithmetic: products of clipped distances
                    m1 = jnp.minimum(fx + jnp.float32(off_x), 0.0) \
                        + jnp.minimum(rect_w - 1.0 - fx - jnp.float32(off_x), 0.0) \
                        + jnp.minimum(fy + jnp.float32(off_y), 0.0) \
                        + jnp.minimum(rect_h - 1.0 - fy - jnp.float32(off_y), 0.0)
                    w_geo = jnp.clip(m1 + 1.0, 0.0, 1.0)
                else:
                    w_geo = ((fx >= jnp.float32(-off_x))
                             & (fx <= rect_w - jnp.float32(1 + off_x))
                             & (fy >= jnp.float32(-off_y))
                             & (fy <= rect_h - jnp.float32(1 + off_y))
                             ).astype(jnp.float32)
                plane_d = (plane_a + kx * nvx + ky * nvy) * s_f + nvz * zs
                w_geo = w_geo * _sstep10(jnp.abs(plane_d * ga + gb))
                if mode == "geom":
                    for si in range(2):
                        s_taps = [sg.tap(off_y, off_x) for sg in sig_wins[si]]
                        accs[si] = [a + st * w_geo
                                    for a, st in zip(accs[si], s_taps)]
                        sums[si] = sums[si] + w_geo
                    continue
                for si, p in enumerate(per):
                    w_ = w_geo * _sstep10(jnp.abs(angle * p["nwp_c"]))
                    if si == 1:
                        w_ = w_ * _sstep10(jnp.abs(rs * p["wra_c"] + p["wrb_c"]))
                    s_taps = [sg.tap(off_y, off_x) for sg in sig_wins[si]]
                    s_hd = s_taps[-1]
                    if mode == "fuse1exp":
                        w_ = w_ * (p["mhdw_c"] + (1.0 - p["mhdw_c"]) * jnp.exp(
                            -3.0 * jnp.abs(s_hd * p["ha_c"] + p["hb_c"])
                            + jnp.float32(k_t) * p["inv_r2"]))
                        # NOTE: not the same math (gauss inside the mhdw lerp) -
                        # cost probe only
                    else:
                        w_ = w_ * (p["mhdw_c"] + (1.0 - p["mhdw_c"])
                                   * _exp_w(s_hd * p["ha_c"] + p["hb_c"]))
                        w_ = w_ * jnp.exp(jnp.float32(k_t) * p["inv_r2"])
                    sums[si] = sums[si] + w_
                    if mode == "refsacc":
                        for k_, st in enumerate(s_taps):
                            outs[si * 4 + k_][:, :] += st * w_
                    else:
                        accs[si] = [a + st * w_ for a, st in zip(accs[si], s_taps)]

            for si in range(2):
                scratch[si][:, :] = sums[si]
                if mode != "refsacc":
                    for k_ in range(4):
                        outs[si * 4 + k_][:, :] = accs[si][k_]

    for si in range(2):
        inv = 1.0 / jnp.maximum(scratch[si][:, :], 1e-15)
        for k_ in range(4):
            outs[si * 4 + k_][:, :] = outs[si * 4 + k_][:, :] * inv


def run_variant(name, n_dirs, mode, levels, env, lat):
    from nrdtpu.kernels.harness2 import block_minmax
    block = (96, 512)

    def call(inputs):
        z, nr4, sigs, radius = inputs
        windows = [z] + [x.astype(jnp.bfloat16) for x in nr4] \
            + [s.astype(jnp.bfloat16) for s in sigs]
        rmin_b, rmax_b = block_minmax(radius, block, HALO2)
        centers = ([radius * 0.0 + 0.02, radius * 0.0 + 0.1]
                   + [radius * 0.0 + 0.3] * 3
                   + [radius, radius * 0.0 + 4.0, radius * 0.0 + 1.0,
                      radius * 0.0 - 0.5, radius * 0.0 + 0.2,
                      radius * 0.0 + 1.0, radius * 0.0 - 0.3] * 2)
        scalars = jnp.asarray([W, H, 0.0], jnp.float32)
        outs = stencil_call2(
            functools.partial(_replica_kernel, n_dirs, mode, levels),
            windows, n_out=8, halo=HALO2, block=block, scalars=scalars,
            block_scalars=[rmin_b, rmax_b], center_inputs=centers,
            scratch_blocks=2)
        return outs

    @jax.jit
    def loop(inputs):
        def step(c, _):
            o = call((c,) + inputs[1:])
            return c * 0.999 + o[0] * 1e-9, None
        c, _ = jax.lax.scan(step, inputs[0], None, length=N)
        # scalar result: fetching a full plane through the axon tunnel costs
        # hundreds of ms and would swamp the kernel time
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

    all_levels = list(range(len(_LEV)))
    # radius in [10,14] picks exactly one level; find it for `onelevel`
    import bisect
    li_sel = next(i for i in all_levels
                  if _LO[i] < 14.0 <= _HI[i])
    variants = {
        "fixed (0 dirs)": (0, "full", all_levels),
        "loads only": (8, "loads", all_levels),
        "loads+geom": (8, "geom", all_levels),
        "full replica": (8, "full", all_levels),
        "full, 1 exp/signal": (8, "fuse1exp", all_levels),
        "full, arith mask": (8, "arithmask", all_levels),
        "full, refs accumulate": (8, "refsacc", all_levels),
        "full, single level": (8, "full", [li_sel]),
        "loads only, single level": (8, "loads", [li_sel]),
        "full, 5x same body": (8, "when5same", all_levels),
        "full, lax.switch": (8, "switch", all_levels),
    }
    pick = sys.argv[1:] or list(variants)
    for name in pick:
        n_dirs, mode, levels = variants[name]
        run_variant(name, n_dirs, mode, levels, env, lat)


if __name__ == "__main__":
    main()
