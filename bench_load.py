"""Tap LOAD cost decomposition (follows bench_tap: loads are ~90% of spatial-kernel
cost; this isolates what a misaligned static-slice load actually costs by dtype,
window count, accumulator count, and packing).

Variants (all 8 taps over the production lattice offsets, (96, 512) block,
(32, 128) halo, 1440p):
  f32x1        1 f32 window, 1 accumulator        (bench_micro's `static` shape)
  bf16x1       1 bf16 window (upcast at slice), 1 acc
  bf16x1_raw   1 bf16 window, bf16 accumulate (no upcast)
  f32x13       13 f32 windows, 1 acc
  bf16x13      1 f32 + 12 bf16 windows, 1 acc     (the fused-blur load config)
  bf16x13_acc8 1 f32 + 12 bf16 windows, 8 accumulators (the fused-blur acc config)
  pack2x6      1 f32 + 6 f32-packed windows (12 bf16 planes packed 2-per-f32,
               bitcast unpack at the tap), 8 accs
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1440, 2560
BH, BW = 96, 512
HY, HX = 32, 128
WIN_H, WIN_W = BH + 2 * HY, BW + 2 * HX
N = 64

# the real blur lattice at level 5 (radius ~12): mixed-sign 2D offsets
OFFS = [(-4, 11), (10, 5), (7, -9), (-11, -2), (2, -12), (-8, 8), (12, 1), (-1, -6)]


def make_kernel(n_win, dtypes, n_acc, pack2, raw=False):
    def kernel(*refs):
        hbm = refs[:n_win]
        outs = refs[n_win:n_win + n_acc]
        wins = refs[n_win + n_acc:n_win + n_acc + n_win]
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
        accs = [jnp.zeros((BH, BW),
                          jnp.bfloat16 if raw else jnp.float32)
                for _ in range(max(n_acc, 1))]
        for k, (dy, dx) in enumerate(OFFS):
            w = np.float32(1.0 / (1.0 + k))
            for wi, win in enumerate(wins):
                v = win[HY + dy:HY + dy + BH, HX + dx:HX + dx + BW]
                if pack2:
                    bits = pltpu.bitcast(v, jnp.uint32)
                    lo = pltpu.bitcast((bits << 16).astype(jnp.uint32),
                                       jnp.float32)  # low bf16 -> f32 via shift
                    hi = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
                    a0 = (wi * 2) % len(accs)
                    a1 = (wi * 2 + 1) % len(accs)
                    accs[a0] = accs[a0] + w * lo
                    accs[a1] = accs[a1] + w * hi
                else:
                    if v.dtype == jnp.bfloat16 and not raw:
                        v = v.astype(jnp.float32)
                    a = (k * len(wins) + wi) % len(accs)
                    accs[a] = accs[a] + (v * w.astype(v.dtype) if raw else v * w)
        for a_i in range(max(n_acc, 1)):
            outs[a_i % len(outs)][:, :] = accs[a_i].astype(jnp.float32)
    return kernel


def run(name, n_win, dtypes, n_acc, env, lat, pack2=False, raw=False):
    imgs = [e.astype(dt) for e, dt in zip(env[:n_win], dtypes)]
    grid = (H // BH, W // BW)
    n_out = max(n_acc, 1)
    f = pl.pallas_call(
        make_kernel(n_win, dtypes, n_acc, pack2, raw), grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_win,
        out_specs=tuple(pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM)
                        for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((H, W), jnp.float32)
                        for _ in range(n_out)),
        scratch_shapes=[pltpu.VMEM((WIN_H, WIN_W), dt) for dt in dtypes]
        + [pltpu.SemaphoreType.DMA((n_win,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def loop(x0, rest):
        def step(c, _):
            o = f(c, *rest)
            o0 = o[0] if isinstance(o, (tuple, list)) else o
            nc = c.astype(jnp.float32) * np.float32(0.999) + o0 * np.float32(1e-9)
            return nc.astype(x0.dtype), None
        c, _ = jax.lax.scan(step, x0, None, length=N)
        # scalar result: fetching a full plane through the axon tunnel costs
        # hundreds of ms and would swamp the kernel time
        return jnp.ravel(c)[0].astype(jnp.float32)

    t0 = time.perf_counter()
    np.asarray(loop(imgs[0], tuple(imgs[1:])))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(loop(imgs[0], tuple(imgs[1:])))
        ts.append(time.perf_counter() - t0)
    ms = (np.median(ts) - lat) * 1e3 / N
    n_loads = len(OFFS) * n_win
    print(f"{name:14s}: {ms:8.3f} ms  ({ms * 1e3 / n_loads:6.1f} us/plane-load, "
          f"compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    rng = np.random.default_rng(5)
    env = [jnp.asarray(rng.uniform(0.0, 1.0, (H, W)).astype(np.float32))
           for _ in range(13)]

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    np.asarray(probe(env[0]))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(env[0]))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    variants = {
        "f32x1": (1, [f32], 1, False),
        "bf16x1": (1, [bf16], 1, False),
        "bf16x1_raw": (1, [bf16], 1, False, True),
        "f32x13": (13, [f32] * 13, 1, False),
        "bf16x13": (13, [f32] + [bf16] * 12, 1, False),
        "bf16x13_acc8": (13, [f32] + [bf16] * 12, 8, False),
        "pack2x6": (7, [f32] * 7, 8, True),
    }
    pick = sys.argv[1:] or list(variants)
    for name in pick:
        n_win, dtypes, n_acc, *fl = variants[name]
        pack2 = fl[0] if fl else False
        raw = fl[1] if len(fl) > 1 else False
        run(name, n_win, dtypes, n_acc, env, lat, pack2, raw)


if __name__ == "__main__":
    main()
