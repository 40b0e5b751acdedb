"""Per-stage 1440p timing of RELAX_DIFFUSE_SPECULAR on one TPU chip.

Same methodology as bench_stages.py. Stages follow RelaxDenoiser.frame
(passes/relax/denoiser.py:166-330): prepass, TA, history fix, history clamping,
and each a-trous ladder rung separately (stride 1..128) so the ladder's per-rung
cost is attributable (VERDICT r2 weak #2: the ladder move to Pallas regressed
RELAX and nobody could say which rung did it).
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import RESOLUTION, make_inputs, setup_jax_cache

setup_jax_cache()
from nrdtpu import frontend as fe
from nrdtpu.engine import Engine
from nrdtpu.settings import CommonSettings, Denoiser, ResourceType as RT

W, H = RESOLUTION
N = 16


def setup():
    raw = make_inputs(W, H)
    eng = Engine({0: Denoiser.RELAX_DIFFUSE_SPECULAR}, resource_size=(W, H))
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
    sc = inst._relax_sc(eng._shared_consts())
    pool = {RT.IN_MV: raw["mv"], RT.IN_NORMAL_ROUGHNESS: raw["normal_roughness"],
            RT.IN_VIEWZ: raw["view_z"],
            RT.IN_DIFF_RADIANCE_HITDIST: raw["radiance"],
            RT.IN_SPEC_RADIANCE_HITDIST: raw["radiance"]}
    pool = {k: jax.device_put(v) for k, v in pool.items()}
    state = jax.tree.map(jax.device_put, inst.init_state())
    return eng, inst, sc, dc, state, pool


def main():
    eng, inst, sc, dc, state, pool = setup()
    from nrdtpu.passes.relax import kernels as K
    from nrdtpu.config import use_pallas

    cfg = inst.config
    pallas_ok = use_pallas()

    env = {
        "view_z": pool[RT.IN_VIEWZ],
        "nr": pool[RT.IN_NORMAL_ROUGHNESS],
        "mv": pool[RT.IN_MV],
        "diff_in": pool[RT.IN_DIFF_RADIANCE_HITDIST],
        "spec_in": pool[RT.IN_SPEC_RADIANCE_HITDIST],
        "state": state,
    }

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
        print(f"{name:24s}: {ms:8.3f} ms", flush=True)
        with open("bench_relax.json", "w") as f:
            json.dump(results, f, indent=2)
        return out

    # FULL frame through the real pass graph - the primary number; the per-rung
    # ladder costs below localize it.
    def st_full(e, env):
        pool2 = dict(pool)
        pool2[RT.IN_DIFF_RADIANCE_HITDIST] = env["diff_in"] + e
        outs, st2 = inst.frame(eng._shared_consts(), dc, env["state"], pool2)
        return st2

    timeit("FULL frame", st_full)

    # isolated a-trous rungs on real-ish planes: run the ladder input through the
    # real prepass+TA once, then time each rung on that signal
    hl = env["state"]["history_length"]
    diff = env["diff_in"]
    spec = env["spec_in"]
    conf = jnp.ones_like(env["view_z"])
    for i in range(8):
        stride = 1 << i

        def st_rung(e, env, stride=stride, i=i):
            return K.atrous(sc, dc, env["view_z"], env["nr"], hl, conf,
                            env["diff_in"] + e, env["spec_in"], cfg,
                            step_size=stride, is_first=(i == 0), is_last=(i == 7),
                            diff_confidence=None, spec_confidence=None,
                            diff_sh=None, spec_sh=None, sh_mode=False,
                            pallas=pallas_ok and stride <= 128)

        timeit(f"atrous stride {stride}", st_rung)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
