"""FULL REBLUR_DIFFUSE_SPECULAR frame time, band pipeline on vs off.

Usage: python bench_full.py [on|off|both]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import setup_jax_cache

setup_jax_cache()

import bench_stages as BS

N = BS.N


def measure(tag):
    eng, inst, sc, dc, state, pool = BS.setup()

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    vz = pool[list(pool)[0]]
    _ = np.asarray(probe(vz))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(vz))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))

    from nrdtpu.settings import ResourceType as RT

    @jax.jit
    def loop(e, state):
        def step(c, _):
            p2 = dict(pool)
            p2[RT.IN_VIEWZ] = pool[RT.IN_VIEWZ] + c * 1e-20
            _, ns = inst.frame(sc, dc, state, p2)
            leaf = jnp.ravel(jax.tree.leaves(ns)[0])[0].astype(jnp.float32)
            return c + leaf * 1e-20, None
        c, _ = jax.lax.scan(step, e, None, length=N)
        return c

    t0 = time.perf_counter()
    c = loop(jnp.float32(0.0), state)
    _ = np.asarray(c)
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(loop(jnp.float32(0.0), state))
        ts.append(time.perf_counter() - t0)
    ms = (float(np.median(ts)) - lat) / N * 1e3
    print(f"FULL ({tag:8s}): {ms:8.3f} ms  (compile {comp:.0f}s)", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("on", "both"):
        os.environ["NRDTPU_REBLUR_BAND"] = "1"
        measure("band on")
    if which in ("off", "both"):
        os.environ["NRDTPU_REBLUR_BAND"] = "0"
        measure("band off")


if __name__ == "__main__":
    main()
