"""In-kernel VPU op-cost microbench on the real chip (production block geometry).

Slope-based: each case times R=8 vs R=32 repetitions of one representative op on a
VMEM-resident (160, 512) block over a full 1440p grid, so the per-op cost excludes
launch/DMA fixed costs. Drives the round-3 kernel redesign decisions:
  fma_f32 / fma_bf16 : is bf16 arithmetic 2x on the VPU? (if yes: cast weight chains)
  exp_f32            : what does the hardware transcendental really cost?
  recip_f32          : divide/reciprocal cost (weight normalizations)
  sel_f32            : compare+select chains (in-screen masks, material tests)
  upcast             : bf16->f32 convert cost (every bf16 tap pays one)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import setup_jax_cache

setup_jax_cache()

H, W = 1440, 2560
BH, BW = 160, 512


def make_fn(mode, reps):
    def kernel(x_ref, o_ref):
        v = x_ref[:, :]
        if mode == "fma_bf16":
            acc = v.astype(jnp.bfloat16)
            c = jnp.bfloat16(1.0009765625)
            vb = v.astype(jnp.bfloat16)
            for _ in range(reps):
                acc = acc * c + vb
            o_ref[:, :] = acc.astype(jnp.float32)
        elif mode == "mul_bf16":
            acc = v.astype(jnp.bfloat16)
            c = jnp.bfloat16(1.0009765625)
            for _ in range(reps):
                acc = acc * c
            o_ref[:, :] = acc.astype(jnp.float32)
        else:
            acc = v
            for _ in range(reps):
                if mode == "fma_f32":
                    acc = acc * 1.0001 + v
                elif mode == "mul_f32":
                    acc = acc * 1.0001
                elif mode == "exp_f32":
                    acc = jnp.exp(acc * 1e-8)
                elif mode == "recip_f32":
                    acc = 1.0 / (acc + 1.5)
                elif mode == "rsqrt_f32":
                    acc = jax.lax.rsqrt(acc + 2.0)
                elif mode == "sel_f32":
                    acc = jnp.where(acc > 0.5, acc * 0.999, acc + 0.001)
                elif mode == "cmp_f32":
                    acc = acc + (acc > 0.5).astype(jnp.float32)
                elif mode == "upcast":
                    acc = (acc.astype(jnp.bfloat16)).astype(jnp.float32) + 1e-7
                elif mode == "abs_f32":
                    acc = jnp.abs(acc - 0.3)
                elif mode == "min_f32":
                    acc = jnp.minimum(acc, 0.7) + 1e-7
                elif mode == "clip_f32":
                    acc = jnp.clip(acc, 1e-7, 0.9)
                elif mode == "sstep10":
                    t = jnp.clip(1.0 - acc * 1e-3, 0.0, 1.0)
                    acc = t * t * (3.0 - 2.0 * t)
                elif mode == "expw":
                    acc = jnp.exp(-3.0 * jnp.abs(acc)) + 0.5
                elif mode == "acos":
                    x_ = jnp.clip(acc - 0.5, -1.0, 1.0)
                    r_ = jnp.sqrt(jnp.clip(1.0 - jnp.abs(x_), 0.0, 1.0)) * 1.5707964
                    acc = jnp.where(x_ >= 0.0, r_, 3.1415927 - r_) * 0.3
                elif mode == "recip_ap":
                    acc = pl.reciprocal(acc + 1.5, approx=True)
                elif mode == "mix8":
                    # 8 independent fma on the same value: ILP/throughput check
                    a = acc * 1.0001 + 0.1
                    b = acc * 0.9999 + 0.2
                    c2 = acc * 1.0002 + 0.3
                    d = acc * 0.9998 + 0.4
                    e = acc * 1.0003 + 0.5
                    f = acc * 0.9997 + 0.6
                    g = acc * 1.0004 + 0.7
                    h2 = acc * 0.9996 + 0.8
                    acc = (a + b + c2 + d) * 1e-4 + (e + f + g + h2) * 1e-4
            o_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        grid=(H // BH, W // BW),
        in_specs=[pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )

    # serialize SCANS pallas launches inside one jit: tunnel latency (~35 ms) and
    # its variance amortize over the chain, so the R2-R1 op slope is resolvable
    @jax.jit
    def run(x):
        def step(c, _):
            return call(c), None
        c, _ = jax.lax.scan(step, x, None, length=SCANS)
        return c.ravel()[0]

    return run


SCANS = 24


def timed(fn, x, n=5):
    _ = np.asarray(fn(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1.0, (H, W)),
                    jnp.float32)
    r1, r2 = 16, 112
    import sys
    modes = ("fma_f32", "mul_f32", "fma_bf16", "mul_bf16", "exp_f32",
             "recip_f32", "rsqrt_f32", "sel_f32", "cmp_f32", "upcast",
             "abs_f32", "min_f32", "clip_f32", "sstep10", "expw", "acos",
             "recip_ap", "mix8")
    if len(sys.argv) > 1:
        modes = sys.argv[1:]
    for mode in modes:
        f1 = make_fn(mode, r1)
        f2 = make_fn(mode, r2)
        t1, t2 = timed(f1, x), timed(f2, x)
        per_op_us = (t2 - t1) / ((r2 - r1) * SCANS) * 1e6
        fixed_ms = (t1 - per_op_us * 1e-6 * r1 * SCANS) / SCANS * 1e3
        print(f"{mode:12s}: {per_op_us:8.3f} us/full-res-op "
              f"(launch+io {fixed_ms:6.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
