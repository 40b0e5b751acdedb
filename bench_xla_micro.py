"""Re-measure XLA primitive costs at 1440p with slope-based timing (fetch forces
completion; two chain lengths cancel the ~30 ms tunnel latency)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1440, 2560


def timeit(name, step, img):
    def make(reps):
        @jax.jit
        def loop(x):
            def body(c, _):
                return step(c), None
            return jax.lax.scan(body, x, None, length=reps)[0][0, 0]
        return loop

    r1, r2 = 6, 30
    l1, l2 = make(r1), make(r2)

    def t(loop, n=4):
        _ = np.asarray(loop(img))
        ts = []
        for k in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(loop(img + np.float32(k + 1)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt = (t(l2) - t(l1)) / (r2 - r1) * 1e3
    print(f"{name:28s}: {dt:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    iy = jnp.asarray(rng.integers(0, H, (H, W)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, W, (H, W)), jnp.int32)
    # coherent indices (reprojection-like: identity + small smooth offset)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    cy = jnp.asarray(np.clip(yy + (5 * np.sin(xx * 0.01)).astype(int), 0, H - 1), jnp.int32)
    cx = jnp.asarray(np.clip(xx + (7 * np.cos(yy * 0.01)).astype(int), 0, W - 1), jnp.int32)

    timeit("elementwise x4", lambda c: jnp.tanh(c) * 1.0001 + 0.3 * c * c, img)
    timeit("pad+slice (edge 32/128)",
           lambda c: jnp.pad(c, ((32, 32), (128, 128)), mode="edge")[32:32 + H, 128:128 + W] * 1.0001,
           img)
    timeit("static roll x8 sum",
           lambda c: sum(jnp.roll(c, (k % 3 - 1, k * 5 - 17), (0, 1)) for k in range(8)) * 0.125,
           img)
    timeit("gather random (1 tap)", lambda c: c[iy, ix] * 1.0001, img)
    timeit("gather coherent (1 tap)", lambda c: c[cy, cx] * 1.0001, img)
    timeit("gather coherent x4",
           lambda c: (c[cy, cx] + c[cy, cx + 1] + c[cy + 1, cx] + c[cy + 1, cx + 1]) * 0.25,
           img)
    timeit("dyn-slice whole (scalar)",
           lambda c: jax.lax.dynamic_slice(c, (jnp.int32(c[0, 0] * 0) + 3, jnp.int32(5)), (H - 8, W - 128)).sum() * 0 + c * 1.0001,
           img)
    timeit("conv 5x5 separable",
           lambda c: jax.scipy.signal.convolve2d(c, np.ones((5, 5), np.float32) / 25, mode="same") * 1.0001
           if False else _sep5(c), img)


def _sep5(c):
    k = jnp.asarray([0.0625, 0.25, 0.375, 0.25, 0.0625], jnp.float32)
    x = sum(jnp.roll(c, i - 2, 1) * k[i] for i in range(5))
    return sum(jnp.roll(x, i - 2, 0) * k[i] for i in range(5))


if __name__ == "__main__":
    main()
