"""Direct timing of the SIGMA band kernel (kernels/sigma_band.py) at 1440p.

Sweeps the column split (NRDTPU_BAND_CS / col_split) to locate the register
pressure vs per-step-overhead optimum, using the same 16-frame serialized scan +
latency-baseline methodology as bench_sigma.py.

Usage: python bench_band.py [cs ...]   (default: 2 5 10)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import RESOLUTION, setup_jax_cache

setup_jax_cache()
from bench_sigma import setup
from nrdtpu.settings import ResourceType as RT
from nrdtpu.kernels.sigma_band import sigma_band_pallas

W, H = RESOLUTION
N = 16


def main():
    css = [int(a) for a in sys.argv[1:]] or [2, 5, 10]
    eng, inst, sc, dc, state, pool = setup(False)
    pen = pool[RT.IN_PENUMBRA]
    vz = pool[RT.IN_VIEWZ]
    nr = pool[RT.IN_NORMAL_ROUGHNESS]
    mv = pool[RT.IN_MV]
    if mv.ndim == 3 and mv.shape[-1] == 2:
        mv = jnp.concatenate([mv, jnp.zeros_like(mv[..., :1])], -1)
    from nrdtpu.passes.sigma import kernels as K
    tiles_s = K.smooth_tiles(K.classify_tiles(sc, pen, vz, None))

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    _ = np.asarray(probe(vz))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(vz))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    for cs in css:
        def fn(e, cs=cs):
            out, npz, nhl = sigma_band_pallas(
                sc, dc, pen + e, None, vz, nr, tiles_s, mv,
                state["shadow_history"], state["prev_view_z"],
                state["history_len"], channels=1, translucent=False,
                col_split=cs)
            return out

        @jax.jit
        def loop(e, fn=fn):
            def step(c, _):
                o = fn(c)
                return c + jnp.ravel(o)[0] * 1e-20, None
            c, _ = jax.lax.scan(step, e, None, length=N)
            return c

        t0 = time.perf_counter()
        c = loop(jnp.float32(0.0))
        _ = np.asarray(c)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c = loop(jnp.float32(0.0))
            _ = np.asarray(c)
            ts.append(time.perf_counter() - t0)
        ms = (float(np.median(ts)) - lat) / N * 1e3
        print(f"cs={cs:3d}: {ms:8.3f} ms/frame   (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
