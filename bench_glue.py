"""XLA glue-cost microbench at 1440p: answers "where do the unattributed ms go".

Slope-based timing (two scan lengths cancel tunnel latency), like bench_xla_micro.
Each case reports ms per *application* of the op at (1440, 2560) f32.

Questions this answers (drives the round-3 TA/glue redesign):
  1. does a long elementwise chain fuse to ~1 op/plane cost, or pay HBM per op?
  2. what do transcendentals (exp/arctan/pow/rsqrt) cost vs an fma?
  3. what does channel-last (H, W, 4) cost vs 4 planes (layout question)?
  4. what do stack/split/astype(bf16) conversions cost?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import setup_jax_cache

H, W = 1440, 2560


def timeit(name, step, arg):
    def make(reps):
        @jax.jit
        def loop(x):
            def body(c, _):
                return step(c), None
            out = jax.lax.scan(body, x, None, length=reps)[0]
            return jax.tree.leaves(out)[0].ravel()[0]
        return loop

    r1, r2 = 4, 16
    l1, l2 = make(r1), make(r2)

    def t(loop, n=4):
        _ = np.asarray(loop(arg))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(loop(arg))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt = (t(l2) - t(l1)) / (r2 - r1) * 1e3
    print(f"{name:36s}: {dt:8.4f} ms", flush=True)
    return dt


def main():
    setup_jax_cache()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    img4 = jnp.asarray(rng.random((H, W, 4)), jnp.float32)
    planes4 = tuple(jnp.asarray(rng.random((H, W)), jnp.float32) for _ in range(4))

    def chain_fma(n):
        def f(c):
            x = c
            for k in range(n):
                x = x * jnp.float32(1.0 + 1e-7 * k) + jnp.float32(1e-9 * k)
            return x
        return f

    t8 = timeit("fma chain x8", chain_fma(8), img)
    t64 = timeit("fma chain x64", chain_fma(64), img)
    print(f"  -> per-fma (fused slope): {(t64 - t8) / 56 * 1e3:.2f} us", flush=True)

    def trans(fn, n=16):
        def f(c):
            x = c
            for _ in range(n):
                x = fn(x) * jnp.float32(0.999) + jnp.float32(1e-6)
            return x
        return f

    te = timeit("exp chain x16", trans(lambda x: jnp.exp(-jnp.abs(x))), img)
    ta = timeit("arctan chain x16", trans(jnp.arctan), img)
    tp = timeit("pow chain x16", trans(lambda x: jnp.power(jnp.abs(x) + 0.1, 1.7)), img)
    tr = timeit("rsqrt chain x16", trans(lambda x: jax.lax.rsqrt(jnp.abs(x) + 0.1)), img)
    tw = timeit("where chain x16",
                trans(lambda x: jnp.where(x > 0.5, x * 0.9, x * 1.1 + 0.01)), img)

    # channel-last vs planes: same 8-fma chain on (H, W, 4) - if layout pads C to
    # lanes this is >> 4x the plane cost
    timeit("fma chain x8 on (H,W,4)", chain_fma(8), img4)

    def f_planes(c):
        return tuple(p * jnp.float32(1.0001) + jnp.float32(1e-9) for p in c)

    timeit("1 fma on 4 planes (tuple)", f_planes, planes4)

    timeit("stack 4 planes -> (H,W,4)",
           lambda c: (jnp.stack([c, c * 1.0001, c * 0.9999, c + 1e-9], -1).sum(-1)),
           img)
    timeit("split (H,W,4) -> 4 planes",
           lambda c: sum(c[..., k] * jnp.float32(1 + 1e-7 * k)
                         for k in range(4))[..., None] * jnp.ones((1, 1, 4), jnp.float32),
           img4)
    timeit("astype bf16 + back",
           lambda c: c.astype(jnp.bfloat16).astype(jnp.float32) * 1.0001, img)

    # the reference-style weight chain: one full blur-tap weight computation
    def tap_weight(c):
        angle = jnp.arccos(jnp.clip(c, -1.0, 1.0))
        w = jnp.clip(1.0 - jnp.abs(angle * 0.7 + 0.1), 0.0, 1.0)
        w = w * w * (3.0 - 2.0 * w)
        w = w * jnp.exp(-3.0 * jnp.abs(c * 0.5 + 0.01))
        return w * 0.5 + c * 0.5

    timeit("blur tap weight chain x1", tap_weight, img)


if __name__ == "__main__":
    main()
