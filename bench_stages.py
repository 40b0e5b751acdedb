"""Per-stage 1440p timing of the REBLUR_DIFFUSE_SPECULAR pipeline on one TPU chip.

Mirrors ReblurDenoiser.frame's stage wiring (passes/reblur/denoiser.py:161-419) but
times each stage in its own jitted 16-frame chain, so compiles stay small and the
stage table localizes regressions. Each stage consumes the *real* outputs of its
upstream stages (materialized once); timing perturbs one input through the scan carry
to serialize iterations.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import RESOLUTION, make_inputs
from nrdtpu.engine import Engine
from nrdtpu.settings import CommonSettings, Denoiser, ResourceType as RT

W, H = RESOLUTION
N = 16


def setup():
    raw = make_inputs(W, H)
    eng = Engine({0: Denoiser.REBLUR_DIFFUSE_SPECULAR}, resource_size=(W, H))
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
    inst = eng._instances[0]
    dc = inst.frame_constants(eng._consts, eng._settings[0])
    sc = eng._shared_consts()
    state = jax.tree.map(jax.device_put, inst.init_state())
    pool = {RT.IN_MV: raw["mv"], RT.IN_NORMAL_ROUGHNESS: raw["normal_roughness"],
            RT.IN_VIEWZ: raw["view_z"],
            RT.IN_DIFF_RADIANCE_HITDIST: raw["radiance"],
            RT.IN_SPEC_RADIANCE_HITDIST: raw["radiance"]}
    pool = {k: jax.device_put(v) for k, v in pool.items()}
    return eng, inst, sc, dc, state, pool


def main():
    eng, inst, sc, dc, state, pool = setup()
    from nrdtpu.passes.reblur import common as C
    from nrdtpu.passes.reblur import kernels as K

    cfg = inst.config
    view_z = pool[RT.IN_VIEWZ]
    nr = pool[RT.IN_NORMAL_ROUGHNESS]
    mv = pool[RT.IN_MV]
    diff_in0 = pool[RT.IN_DIFF_RADIANCE_HITDIST]
    spec_in0 = pool[RT.IN_SPEC_RADIANCE_HITDIST]

    # fixed tunnel latency baseline
    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    _ = np.asarray(probe(view_z))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(view_z))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    results = {}

    def timeit(name, fn, reps=3):
        """fn: scalar eps -> pytree; runs as a 16-iteration serialized chain."""
        @jax.jit
        def loop(e):
            def step(c, _):
                o = fn(c)
                leaf = jnp.ravel(jax.tree.leaves(o)[0])[0].astype(jnp.float32)
                return c + leaf * 1e-20, None
            c, _ = jax.lax.scan(step, e, None, length=N)
            return c

        e0 = jnp.float32(0.0)
        _ = np.asarray(loop(e0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(loop(e0))
            ts.append(time.perf_counter() - t0)
        ms = (float(np.median(ts)) - lat) / N * 1e3
        results[name] = round(ms, 3)
        print(f"{name:32s}: {ms:8.3f} ms", flush=True)

    def run(fn):
        return jax.tree.map(lambda x: x, jax.jit(lambda: fn(jnp.float32(0.0)))())

    # ---- stage closures (DS config: prepass on, hdrecon off, TS on) ----
    s = inst._s

    def st_tiles(e):
        tm = K.classify_tiles(sc, view_z + e)
        return tm, K.sky_pixel_mask(sc, tm, view_z + e)

    timeit("classify_tiles+sky", st_tiles)

    def st_dpre(e):
        return K.diffuse_pre_pass(sc, dc, diff_in0 + e, view_z, nr, cfg,
                                  sh=None, pallas=True)

    timeit("prepass diff", st_dpre)
    diff_in, _ = run(st_dpre)

    def st_spre(e):
        return K.specular_spatial_filter(sc, dc, K.PRE_BLUR, spec_in0 + e, view_z, nr,
                                         None, cfg, sh=None, occlusion=False,
                                         pallas=True)

    timeit("prepass spec", st_spre)
    spec_in, _, spec_hdt_prepass = run(st_spre)

    prev_internal = {k: state[k] for k in ("diff_accum", "spec_accum", "material_id")}
    hist_planes = [state["diff_history"][..., c] for c in range(4)] \
        + [state["spec_history"][..., c] for c in range(4)]
    bil_planes = [state["diff_fast_history"], state["spec_fast_history"]]

    def st_smb(e):
        return K.surface_motion_reprojection_pallas(
            sc, dc, view_z + e, nr, mv, state["prev_view_z"],
            state["prev_normal_roughness"], prev_internal, cfg,
            hist_planes, bil_planes, disocclusion_threshold_mix=None)

    timeit("smb resolve (TA bundle)", st_smb)
    sm = run(st_smb)

    diff_samples = dict(history=jnp.stack(sm["hist"][0:4], -1), fast=sm["bil"][0])
    spec_samples = dict(history=jnp.stack(sm["hist"][4:8], -1), fast=sm["bil"][1])

    def st_tad(e):
        return K.temporal_accumulation_diffuse(
            sc, dc, sm, diff_in + e, state["diff_history"], state["diff_fast_history"],
            cfg, None, occlusion=False, directional=False, diff_sh_input=None,
            diff_sh_history=None, samples=diff_samples)

    timeit("TA diffuse", st_tad)
    diff1, diff_fast1, data1_diff, _ = run(st_tad)

    from nrdtpu.kernels.reblur_pallas import PallasSampler
    sampler = PallasSampler(sc)

    def st_tas(e):
        return K.temporal_accumulation_specular(
            sc, dc, sm, spec_in + e, state["spec_history"], state["spec_fast_history"],
            view_z, nr, state["prev_view_z"], state["prev_normal_roughness"],
            prev_internal, spec_hdt_prepass, state["prev_spec_hitdist_for_tracking"],
            cfg, None, occlusion=False, has_prepass_hitdist=True, spec_sh_input=None,
            spec_sh_history=None, samples=spec_samples, sampler=sampler)

    timeit("TA specular (vmb)", st_tas)
    ta_spec = run(st_tas)
    spec1, spec_fast1 = ta_spec["spec"], ta_spec["fast"]
    data1_spec = ta_spec["accum_speed"]

    def st_hfd(e):
        return K.history_fix(sc, dc, view_z, nr, data1_diff, data1_spec, diff1 + e,
                             diff_fast1, cfg, is_diffuse=True, occlusion=False,
                             anti_firefly=False, sh=None, directional=False,
                             pallas=True)

    timeit("history fix diff", st_hfd)
    diff2, diff_fast2, _ = run(st_hfd)

    def st_hfs(e):
        return K.history_fix(sc, dc, view_z, nr, data1_diff, data1_spec, spec1 + e,
                             spec_fast1, cfg, is_diffuse=False, occlusion=False,
                             anti_firefly=False, sh=None, pallas=True)

    timeit("history fix spec", st_hfs)
    spec2, spec_fast2, _ = run(st_hfs)

    def st_bd(e):
        return K.diffuse_spatial_filter(sc, dc, K.BLUR, diff2 + e, view_z, nr,
                                        data1_diff, cfg, sh=None, occlusion=False,
                                        directional=False, pallas=True)

    timeit("blur diff", st_bd)
    diff3, _ = run(st_bd)

    def st_pbd(e):
        return K.diffuse_spatial_filter(sc, dc, K.POST_BLUR, diff3 + e, view_z, nr,
                                        data1_diff, cfg, sh=None, occlusion=False,
                                        directional=False, pallas=True)

    timeit("postblur diff", st_pbd)
    diff4, _ = run(st_pbd)

    def st_bs(e):
        return K.specular_spatial_filter(sc, dc, K.BLUR, spec2 + e, view_z, nr,
                                         data1_spec, cfg, sh=None, occlusion=False,
                                         pallas=True)

    timeit("blur spec", st_bs)
    spec3, _, _ = run(st_bs)

    def st_pbs(e):
        return K.specular_spatial_filter(sc, dc, K.POST_BLUR, spec3 + e, view_z, nr,
                                         data1_spec, cfg, sh=None, occlusion=False,
                                         pallas=True)

    timeit("postblur spec", st_pbs)
    spec4, _, _ = run(st_pbs)

    def st_ts(e):
        return K.temporal_stabilization(
            sc, dc, view_z, nr, mv, data1_diff, data1_spec,
            sm["fbits"] + ta_spec["fbits_vmb"], ta_spec["curvature"],
            ta_spec["virtual_history_amount"], diff4 + e, spec4,
            state["diff_luma_stab"], state["spec_luma_stab"],
            ta_spec["hit_dist_for_tracking"], None, cfg,
            has_diffuse=True, has_specular=True, has_prepass=True, directional=False,
            diff_sh=None, spec_sh=None, pallas=True)

    timeit("temporal stabilization", st_ts)

    total = sum(results.values())
    print(f"{'SUM':32s}: {total:8.3f} ms", flush=True)
    import json
    with open("bench_stages.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
