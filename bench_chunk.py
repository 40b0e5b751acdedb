"""Micro-validation of the column-band + row-chunk kernel substrate.

The row-band pipelines (kernels/sigma_band.py, reblur_band.py) compute on
(40, ~1300) values = ~52 vregs/value -> register spills make each fused stage
~2.9x its block-kernel cost (bench_band.py diag: blur1-only 5.74 ms vs 2.0).
The fix candidate: full-height column strips (grid ~22 steps at 1440p) with a
lax.fori_loop over 64-row chunks (8 vregs/value, body instantiated ONCE).

This bench validates, on real TPU:
  A. fori_loop + sublane-dynamic VMEM slicing + static lane-offset taps
     (the chunk tap pattern) lowers and runs fast;
  B. pl.when with traced per-chunk scalars inside fori_loop works;
  C. VMEM->VMEM slide copies (sliding stage buffers) cost;
  D. per-step overhead with full-height windows (DMA issue count).

Each case times a 16-rep serialized scan like bench_band.py.
"""
import sys
import time

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import RESOLUTION, setup_jax_cache

setup_jax_cache()

W, H = RESOLUTION          # 2560 x 1440
CB = 128                   # column band width
MARG = 128                 # col margin (static taps +-34 stay inside)
CH = 64                    # row chunk
N = 16


def timeit(name, fn, *args):
    @jax.jit
    def loop(e):
        def step(c, _):
            o = fn(c, *args)
            return c + jnp.ravel(o)[0] * 1e-20, None
        c, _ = jax.lax.scan(step, e, None, length=N)
        return c

    t0 = time.perf_counter()
    c = loop(jnp.float32(0.0))
    _ = np.asarray(c)
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(loop(jnp.float32(0.0)))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1e3
    print(f"{name:28s}: {ms:8.3f} ms  (compile {comp:.0f}s)", flush=True)
    return ms


def make_kernel(n_taps, n_planes, use_when, do_slide):
    """Column-strip kernel: DMA n_planes windows, chunk-loop a tap-weight chain."""
    WIN_W = CB + 2 * MARG
    Hp = -(-H // CH) * CH
    n_chunks = Hp // CH

    def kernel(smem, *refs):
        ins = refs[:n_planes]
        out = refs[n_planes]
        wins = refs[n_planes + 1:2 * n_planes + 1]
        slide = refs[2 * n_planes + 1]
        sem = refs[2 * n_planes + 2]
        j = pl.program_id(0)
        c0 = pl.multiple_of(j * CB, 128)
        cps = [pltpu.make_async_copy(
            src.at[:, pl.ds(c0, WIN_W)], dst, sem.at[k])
            for k, (src, dst) in enumerate(zip(ins, wins))]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

        def chunk(k, carry):
            r0 = pl.multiple_of(k * CH, 8)
            acc = jnp.zeros((CH, CB), jnp.float32)
            # traced per-chunk scalar (mean of first plane's chunk)
            m = jnp.mean(wins[0][pl.ds(r0, CH), MARG:MARG + CB])
            for p in range(n_planes):
                wv = wins[p]
                for t in range(n_taps):
                    dy = (t % 5) - 2
                    dx = ((t * 7) % 69) - 34
                    v = wv[pl.ds(r0 + 8 + dy, CH), MARG + dx:MARG + dx + CB]
                    w_ = jnp.clip(v * 0.25 + m, 0.0, 1.0)
                    acc = acc + v * (w_ * w_ * (3.0 - 2.0 * w_))
            if use_when:
                @pl.when(m > 0.5)
                def _():
                    out[pl.ds(r0, CH), :] = acc * 2.0

                @pl.when(m <= 0.5)
                def _():
                    out[pl.ds(r0, CH), :] = acc
            else:
                out[pl.ds(r0, CH), :] = acc
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk, 0)
        if do_slide:
            # sliding-buffer shuffle: (Hp, CB) VMEM->VMEM x2
            slide[0:Hp, 0:CB] = slide[0:Hp, CB:2 * CB]
            slide[0:Hp, CB:2 * CB] = out[0:Hp, 0:CB] * 0.5

    def run(e, imgs):
        Hp2 = Hp + 16
        grid = (W // CB,)
        scratch = ([pltpu.VMEM((Hp2, WIN_W), jnp.float32)
                    for _ in range(n_planes)]
                   + [pltpu.VMEM((Hp2, 2 * CB), jnp.float32),
                      pltpu.SemaphoreType.DMA((n_planes,))])
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
            out_specs=pl.BlockSpec((Hp, CB), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jnp.zeros((4,), jnp.float32), *[im + e for im in imgs])
        return out

    return run


def main():
    rng = np.random.default_rng(0)
    Hp2 = -(-H // CH) * CH + 16
    imgs5 = [jnp.asarray(rng.uniform(size=(Hp2, W)).astype(np.float32))
             for _ in range(5)]

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    _ = np.asarray(probe(imgs5[0]))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(imgs5[0]))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    which = sys.argv[1:] or ["base", "when", "slide", "taps0"]
    if "base" in which:   # A: 5 planes x 8 taps chunked chain
        run = make_kernel(8, 5, False, False)
        timeit("chunk 5p x 8taps", run, imgs5)
    if "when" in which:   # B: + pl.when on traced chunk scalar
        run = make_kernel(8, 5, True, False)
        timeit("chunk + pl.when", run, imgs5)
    if "slide" in which:  # C: + slide copies
        run = make_kernel(8, 5, False, True)
        timeit("chunk + slide", run, imgs5)
    if "taps0" in which:  # D: overhead floor (1 tap)
        run = make_kernel(1, 5, False, False)
        timeit("chunk 5p x 1tap (floor)", run, imgs5)


if __name__ == "__main__":
    main()
