"""bf16 native-tap cost microbench: even vs odd sublane offsets, load vs load+math.

Hypothesis (from bench_tap2's mixed-precision regression): bf16 windows tile as
(16, 128) with row PAIRS packed into 32-bit registers, so a tap at odd dy that stays
bf16 forces an unpack/repack, while even-dy taps and upcast-to-f32 taps are cheap.

Cases (per full-res 1440p plane, 40 taps, production window geometry):
  f32  tap+fma          : baseline static slice + f32 fma
  bf16 tap even dy +fma : native bf16 slice at even dy + bf16 fma
  bf16 tap odd dy +fma  : native bf16 slice at odd dy + bf16 fma
  bf16 tap odd dy upcast: odd-dy slice upcast to f32 + f32 fma (round-3 shape)
  bf16 even fma chain   : even-dy taps + 4 bf16 fmas each (math-heavy)
  f32 fma chain         : f32 taps + 4 f32 fmas each
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import setup_jax_cache

setup_jax_cache()

H, W = 1440, 2560
BH, BW = 96, 512
HY, HX = 32, 128
WIN_H, WIN_W = BH + 2 * HY, BW + 2 * HX
N_TAPS = 40

OFFS_ODD = [((k * 7) % 30 - 15, (k * 13) % 61 - 30) for k in range(N_TAPS)]
OFFS_EVEN = [((dy // 2) * 2, dx) for dy, dx in OFFS_ODD]


def make_kernel(mode):
    bf = mode.startswith("bf16")
    offs = OFFS_EVEN if "even" in mode else OFFS_ODD
    chain = 4 if "chain" in mode else 1

    def kernel(hbm, out, win, sem):
        cp = pltpu.make_async_copy(hbm.at[pl.ds(0, WIN_H), pl.ds(0, WIN_W)], win, sem)
        cp.start()
        cp.wait()
        if bf and "upcast" not in mode:
            acc = jnp.zeros((BH, BW), jnp.bfloat16)
            for k in range(N_TAPS):
                dy, dx = offs[k]
                t = win[HY + dy:HY + dy + BH, HX + dx:HX + dx + BW]
                for c in range(chain):
                    acc = acc * jnp.bfloat16(0.99) + t
            out[:, :] = acc.astype(jnp.float32)
        else:
            acc = jnp.zeros((BH, BW), jnp.float32)
            for k in range(N_TAPS):
                dy, dx = offs[k]
                t = win[HY + dy:HY + dy + BH, HX + dx:HX + dx + BW] \
                    .astype(jnp.float32)
                for c in range(chain):
                    acc = acc * 0.99 + t
            out[:, :] = acc

    return kernel


def run(mode, img, lat):
    bf = mode.startswith("bf16")
    dt = jnp.bfloat16 if bf else jnp.float32

    def call(x):
        return pl.pallas_call(
            make_kernel(mode),
            grid=(H // BH, W // BW),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((WIN_H, WIN_W), dt),
                            pltpu.SemaphoreType.DMA],
        )(x)

    @jax.jit
    def loop(x):
        def step(c, _):
            return c * 0.999 + call(c.astype(dt) if bf else c) * 1e-9, None
        c, _ = jax.lax.scan(step, x, None, length=32)
        return jnp.ravel(c)[0]

    np.asarray(loop(img))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(img))
        ts.append(time.perf_counter() - t0)
    ms = (np.median(ts) - lat) * 1e3 / 32
    per_tap = ms / N_TAPS * 1e3
    print(f"{mode:26s}: {ms:7.3f} ms/call  {per_tap:6.2f} us/tap", flush=True)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.0, 1.0, (H, W)).astype(np.float32))

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    np.asarray(probe(img))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(img))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    for mode in ["f32 tap", "bf16 tap even dy", "bf16 tap odd dy",
                 "bf16 tap odd dy upcast", "bf16 even chain", "f32 chain"]:
        run(mode, img, lat)


if __name__ == "__main__":
    main()
