"""Ablation probe for the fused REBLUR stages: where do the milliseconds go.

Each case isolates one suspected cost inside the converged-state stage numbers of
bench_stages.json:
  hfix stride=0 vs 8   : does the pl.when(smax>0) skip actually make converged
                         history-fix cheap, or is the cost in DMA/glue?
  blur 6 vs 8 dirs     : per-tap slope + fixed remainder of the fused blur
  blur pallas vs stage : the _fused_*_params XLA glue share of the stage time
Run AFTER bench_stages.py (single TPU process rule).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import RESOLUTION, make_inputs, setup_jax_cache

setup_jax_cache()
from bench_stages import setup
from nrdtpu.passes.reblur import kernels as K

W, H = RESOLUTION
N = 8


def timeit(name, fn, env, lat):
    @jax.jit
    def loop(e, env):
        def step(c, _):
            o = fn(c, env)
            leaf = jnp.ravel(jax.tree.leaves(o)[0])[0].astype(jnp.float32)
            return c + leaf * 1e-20, None
        c, _ = jax.lax.scan(step, e, None, length=N)
        return c

    e0 = jnp.float32(0.0)
    _ = np.asarray(loop(e0, env))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(loop(e0, env))
        ts.append(time.perf_counter() - t0)
    ms = (float(np.median(ts)) - lat) / N * 1e3
    print(f"{name:36s}: {ms:8.3f} ms", flush=True)
    return ms


def main():
    eng, inst, sc, dc, state, pool = setup()
    from nrdtpu.settings import ResourceType as RT

    cfg = inst.config
    rng = np.random.default_rng(3)
    sig = jnp.asarray(rng.uniform(0.1, 0.7, (H, W, 4)).astype(np.float32))
    d1 = jnp.full((H, W), 63.0, jnp.float32)
    fast = jnp.asarray(rng.uniform(0.1, 0.7, (H, W)).astype(np.float32))

    env = {
        "view_z": pool[RT.IN_VIEWZ],
        "nr": pool[RT.IN_NORMAL_ROUGHNESS],
        "sig": sig, "d1": d1, "fast": fast,
    }
    env["geom"] = jax.jit(lambda vz, nr: K.make_filter_geometry(sc, dc, vz, nr, cfg))(
        env["view_z"], env["nr"])

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    _ = np.asarray(probe(env["view_z"]))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(env["view_z"]))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    # ---- history fix: stride 0 (converged) vs stride 8 (fresh) --------------
    def hf(stride_val):
        def f(e, env):
            frames = jnp.full((H, W), stride_val, jnp.float32)
            return K.fused_history_fix(
                sc, dc, env["geom"], env["view_z"], cfg,
                diff=dict(signal=env["sig"] + e, sh=None, data1=frames,
                          fast_history=env["fast"], anti_firefly=False),
                spec=dict(signal=env["sig"] + e, sh=None, data1=frames,
                          fast_history=env["fast"], anti_firefly=False),
                occlusion=False, directional=False)
        return f

    # data1 = 63 -> stride 0 everywhere; data1 = 0 -> stride = base/2 = 7
    timeit("hfix converged (stride=0)", hf(63.0), env, lat)
    timeit("hfix fresh (stride=7)", hf(0.0), env, lat)

    # ---- blur: pallas-only vs full stage; 6 vs 8 dirs ----------------------
    def blur_stage(perf):
        def f(e, env):
            return K.fused_spatial_filter(
                sc, dc, K.BLUR, env["geom"], env["view_z"], cfg,
                diff=dict(signal=env["sig"] + e, sh=None, data1=env["d1"]),
                spec=dict(signal=env["sig"] + e, sh=None, data1=env["d1"]),
                occlusion=False, perf_mode=perf)
        return f

    t8 = timeit("blur stage 8 dirs", blur_stage(False), env, lat)
    t6 = timeit("blur stage 6 dirs (perf)", blur_stage(True), env, lat)
    per_tap = (t8 - t6) / 2.0
    print(f"{'per-tap slope':36s}: {per_tap:8.3f} ms "
          f"(fixed {t8 - 8 * per_tap:.3f} ms)", flush=True)

    # pallas-only: precompute the signals dicts once (outside the timed fn)
    from nrdtpu.kernels.reblur_fused import spatial_filter_fused_pallas
    geom = env["geom"]
    d_p = K._fused_diff_params(sc, dc, K.BLUR, geom, sig, d1, None, False)
    d_p.update(signal=sig, sh=None, cb_mask=None)
    s_p = K._fused_spec_params(sc, dc, K.BLUR, geom, sig, d1, None, False)
    s_p.update(signal=sig, sh=None, cb_mask=None)
    sigs = jax.tree.map(lambda x: x, [d_p, s_p])
    env2 = dict(env, sigs=sigs)

    def blur_pallas(e, env):
        ss = env["sigs"]
        ss = [dict(s, signal=s["signal"] + e) for s in ss]
        return spatial_filter_fused_pallas(
            sc, dc, cfg, signals=ss, view_z_in=env["view_z"], n=env["geom"]["n"],
            nv=env["geom"]["nv"], roughness=env["geom"]["roughness"],
            material_id=env["geom"]["material_id"], ga=env["geom"]["ga"],
            gb=env["geom"]["gb"], perf_mode=False, dead=None)

    timeit("blur pallas-only (no param glue)", blur_pallas, env2, lat)


if __name__ == "__main__":
    main()
