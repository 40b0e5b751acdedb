"""Per-stage 1440p timing of the SIGMA_SHADOW pipeline on one TPU chip.

Same methodology as bench_stages.py (16-frame serialized chains per stage,
latency-baseline subtraction), applied to the 4-launch SIGMA graph
(passes/sigma/denoiser.py:65-136): tiles (XLA), blur x2 (Pallas), TS (Pallas),
split screen (XLA glue).

Usage: python bench_sigma.py [shadow|translucency]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import RESOLUTION, make_inputs, setup_jax_cache

setup_jax_cache()
from nrdtpu.engine import Engine
from nrdtpu.settings import CommonSettings, Denoiser, ResourceType as RT

W, H = RESOLUTION
N = 16


def setup(translucent):
    raw = make_inputs(W, H)
    den = (Denoiser.SIGMA_SHADOW_TRANSLUCENCY if translucent
           else Denoiser.SIGMA_SHADOW)
    eng = Engine({0: den}, resource_size=(W, H))
    cs = CommonSettings()
    ident = np.eye(4, dtype=np.float32).flatten()
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.0
    proj[2, 2] = 1.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    cs.viewToClipMatrix = cs.viewToClipMatrixPrev = proj.flatten(order="F")
    cs.worldToViewMatrix = cs.worldToViewMatrixPrev = ident
    cs.resourceSize = cs.resourceSizePrev = cs.rectSize = cs.rectSizePrev = (W, H)
    cs.motionVectorScale = (1.0, 1.0, 1.0)
    eng.set_common_settings(cs)
    eng.set_common_settings(cs)
    inst = eng._instances[0]
    inst.specialize(eng._settings[0])
    dc = inst.frame_constants(eng._consts, eng._settings[0])
    sc = eng._shared_consts()
    rng = np.random.default_rng(7)
    # NRDTPU_SIGMA_PEN=random reproduces the old 30%-random field; the default now
    # matches bench.py's penumbra exactly so stage numbers explain the config number
    if os.environ.get("NRDTPU_SIGMA_PEN") == "random":
        pen = jnp.asarray(np.where(rng.uniform(size=(H, W)) < 0.3,
                                   rng.uniform(0.01, 4.0, (H, W)), 0.0)
                          .astype(np.float32))
    else:
        pen = jnp.asarray(raw["penumbra"])
    pool = {RT.IN_MV: raw["mv"], RT.IN_NORMAL_ROUGHNESS: raw["normal_roughness"],
            RT.IN_VIEWZ: raw["view_z"], RT.IN_PENUMBRA: pen}
    if translucent:
        pool[RT.IN_TRANSLUCENCY] = jnp.asarray(
            rng.uniform(0.0, 1.0, (H, W, 4)).astype(np.float32))
    pool = {k: jax.device_put(v) for k, v in pool.items()}
    state = jax.tree.map(jax.device_put, inst.init_state())
    return eng, inst, sc, dc, state, pool


def main():
    translucent = len(sys.argv) > 1 and sys.argv[1].startswith("trans")
    eng, inst, sc, dc, state, pool = setup(translucent)
    from nrdtpu.passes.sigma import kernels as K
    from nrdtpu.kernels import get_sigma_blur

    env = {
        "view_z": pool[RT.IN_VIEWZ],
        "nr": pool[RT.IN_NORMAL_ROUGHNESS],
        "mv": pool[RT.IN_MV],
        "pen": pool[RT.IN_PENUMBRA],
        "state": state,
    }
    channels = inst.channels
    trans_in = pool.get(RT.IN_TRANSLUCENCY)
    shadow_in0 = trans_in if translucent else None

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

    results = {}

    def timeit(name, fn, reps=3):
        @jax.jit
        def loop(e, env):
            def step(c, _):
                o = fn(c, env)
                leaf = jnp.ravel(jax.tree.leaves(o)[0])[0].astype(jnp.float32)
                return c + leaf * 1e-20, None
            c, _ = jax.lax.scan(step, e, None, length=N)
            return c, fn(e, env)

        e0 = jnp.float32(0.0)
        c, out = loop(e0, env)
        out = jax.tree.map(lambda x: x, out)
        _ = np.asarray(c)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            c, _o = loop(e0, env)
            _ = np.asarray(c)
            ts.append(time.perf_counter() - t0)
        ms = (float(np.median(ts)) - lat) / (N + 1) * 1e3
        results[name] = round(ms, 3)
        print(f"{name:28s}: {ms:8.3f} ms", flush=True)
        return out

    def st_tiles(e, env):
        tm = K.classify_tiles(sc, env["pen"] + e, env["view_z"],
                              trans_in if translucent else None)
        return K.smooth_tiles(tm)

    env["tiles"] = timeit("tiles (classify+smooth)", st_tiles)

    sigma_blur, blur_channels = get_sigma_blur()
    rs_static = inst.config.rect_size == inst.config.resource_size
    pallas_ok = channels <= blur_channels

    def st_blur1(e, env):
        if pallas_ok:
            return sigma_blur(sc, dc, env["pen"] + e, shadow_in0, env["view_z"],
                              env["nr"], env["tiles"], first_pass=True,
                              channels=channels, rs_static=rs_static)
        return K.blur(sc, dc, env["pen"] + e, shadow_in0, env["view_z"], env["nr"],
                      env["tiles"], first_pass=True, translucent=translucent,
                      channels=channels,
                      normal_encoding=inst.config.normal_encoding,
                      roughness_encoding=inst.config.roughness_encoding)

    env["pen1"], env["shadow1"] = timeit(
        f"blur1 ({'pallas' if pallas_ok else 'XLA'})", st_blur1)

    def st_blur2(e, env):
        if pallas_ok:
            return sigma_blur(sc, dc, env["pen1"] + e, env["shadow1"], env["view_z"],
                              env["nr"], env["tiles"], first_pass=False,
                              channels=channels, rs_static=rs_static)
        return K.blur(sc, dc, env["pen1"] + e, env["shadow1"], env["view_z"],
                      env["nr"], env["tiles"], first_pass=False,
                      translucent=translucent, channels=channels,
                      normal_encoding=inst.config.normal_encoding,
                      roughness_encoding=inst.config.roughness_encoding)

    env["pen2"], env["shadow2"] = timeit(
        f"blur2 ({'pallas' if pallas_ok else 'XLA'})", st_blur2)

    def st_ts(e, env):
        st = env["state"]
        if pallas_ok:
            from nrdtpu.kernels.sigma_pallas import sigma_ts_pallas
            return sigma_ts_pallas(
                sc, dc, env["view_z"], env["mv"], env["pen2"] + e, env["shadow2"],
                st["shadow_history"], st["prev_view_z"], st["history_len"],
                env["tiles"], channels=channels, rs_static=rs_static)
        return K.temporal_stabilization(
            sc, dc, env["view_z"], env["mv"], env["pen2"] + e, env["shadow2"],
            st["shadow_history"], st["prev_view_z"], st["history_len"],
            env["tiles"], channels=channels)

    out3 = timeit(f"temporal stab ({'pallas' if pallas_ok else 'XLA'})", st_ts)
    env["out"] = out3[0]

    def st_split(e, env):
        return K.split_screen(sc, env["pen"] + e, env["view_z"], env["out"],
                              trans_in if translucent else None, channels=channels)

    timeit("split screen", st_split)

    def st_full(e, env):
        pool2 = dict(pool)
        pool2[RT.IN_PENUMBRA] = env["pen"] + e
        outs, st2 = inst.frame(sc, dc, env["state"], pool2)
        return st2

    timeit("FULL frame", st_full)
    stage_sum = sum(v for k, v in results.items() if k != "FULL frame")
    results["glue remainder"] = round(results["FULL frame"] - stage_sum, 3)
    print(f"{'stage sum':28s}: {stage_sum:8.3f} ms", flush=True)
    print(f"{'glue remainder':28s}: {results['glue remainder']:8.3f} ms", flush=True)
    name = "bench_sigma_trans.json" if translucent else "bench_sigma.json"
    with open(name, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
