"""Microbenchmark of Pallas tap primitives on the real chip.

Validates the kernel-substrate cost model before the redesign:
  copy        : 1 window DMA + center copy            (HBM floor)
  tap_static  : N static-offset slices of the window  (should be ~copy)
  tap_dyn     : N runtime-uniform rolls of the window (current approach)
  tap_dctr    : N runtime-uniform rolls applied to the CENTER slice only
Each over a 1440p f32 plane, production block/halo geometry.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1440, 2560
BH, BW = 96, 256
HY, HX = 32, 128
WIN_H, WIN_W = BH + 2 * HY, BW + 2 * HX
N_TAPS = 40

OFFS = [((k * 7) % 61 - 30, (k * 13) % 61 - 30) for k in range(N_TAPS)]


def make_kernel(mode, n_win=1):
    def kernel(smem, *refs):
        hbm = refs[:n_win]
        out = refs[n_win]
        wins = refs[n_win + 1:n_win + 1 + n_win]
        sem = refs[-1]
        i, j = pl.program_id(0), pl.program_id(1)
        sy = jnp.clip(i * BH - HY, 0, H - WIN_H)
        sx = jnp.clip(j * BW - HX, 0, W - WIN_W)
        sy = pl.multiple_of(sy, 8)
        sx = pl.multiple_of(sx, 128)
        cps = [pltpu.make_async_copy(h.at[pl.ds(sy, WIN_H), pl.ds(sx, WIN_W)],
                                     wv, sem.at[k]) for k, (h, wv) in
               enumerate(zip(hbm, wins))]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        acc = jnp.zeros((BH, BW), jnp.float32)
        for k in range(N_TAPS):
            dy, dx = OFFS[k]
            w = 1.0 / (1.0 + k)
            for win in wins:
                if mode == "copy":
                    if k:
                        continue
                    acc = acc + win[HY:HY + BH, HX:HX + BW]
                elif mode == "static":
                    acc = acc + w * win[HY + dy:HY + dy + BH, HX + dx:HX + dx + BW]
                elif mode == "dyn":
                    oy = jnp.asarray(smem[2 * k], jnp.int32)
                    ox = jnp.asarray(smem[2 * k + 1], jnp.int32)
                    v = pltpu.roll(win[:, :], jnp.mod(-oy, WIN_H), 0)
                    v = pltpu.roll(v, jnp.mod(-ox, WIN_W), 1)
                    acc = acc + w * v[HY:HY + BH, HX:HX + BW]
                elif mode == "dyn_sub":
                    # dynamic sublane(y) roll only, static x
                    oy = jnp.asarray(smem[2 * k], jnp.int32)
                    v = pltpu.roll(win[:, :], jnp.mod(-oy, WIN_H), 0)
                    acc = acc + w * v[HY:HY + BH, HX + dx:HX + dx + BW]
                elif mode == "dyn_lane":
                    ox = jnp.asarray(smem[2 * k + 1], jnp.int32)
                    v = pltpu.roll(win[:, :], jnp.mod(-ox, WIN_W), 1)
                    acc = acc + w * v[HY + dy:HY + dy + BH, HX:HX + BW]
                elif mode == "dynload":
                    oy = jnp.asarray(smem[2 * k], jnp.int32) + HY
                    ox = jnp.asarray(smem[2 * k + 1], jnp.int32) + HX
                    v = win[pl.ds(oy, BH), pl.ds(ox, BW)]
                    acc = acc + w * v
        out[:, :] = acc
    return kernel


def run(mode, n_win=1):
    img = jnp.asarray(np.random.rand(H, W), jnp.float32)
    smem = jnp.asarray(np.array([o for p in OFFS for o in p], np.int32))
    grid = (H // BH, W // BW)
    f = pl.pallas_call(
        make_kernel(mode, n_win), grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_win,
        out_specs=pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WIN_H, WIN_W), jnp.float32)] * n_win
        + [pltpu.SemaphoreType.DMA((n_win,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def make_loop(reps):
        @jax.jit
        def loop(img, smem):
            def step(c, _):
                r = f(smem, *([c] * n_win))
                return r, None
            return jax.lax.scan(step, img, None, length=reps)[0][0, 0]
        return loop

    # the axon tunnel dispatches asynchronously; only a host fetch waits. Fixed
    # tunnel latency is cancelled by timing two rep counts and taking the slope.
    def timed(loop, reps, n=5):
        _ = np.asarray(loop(img, smem))
        ts = []
        for k in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(loop(img + np.float32(k + 1), smem))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    r1, r2 = 10, 60
    t1 = timed(make_loop(r1), r1)
    t2 = timed(make_loop(r2), r2)
    dt = (t2 - t1) / (r2 - r1) * 1e3
    print(f"{mode:10s} n_win={n_win}: {dt:7.3f} ms/call (fixed {1e3*(t1 - dt*r1/1e3):.1f} ms)",
          flush=True)
    return dt


if __name__ == "__main__":
    for mode in ["copy", "static", "dyn_sub", "dyn_lane", "dyn"]:
        run(mode)
    run("static", n_win=4)
    run("dyn", n_win=4)
