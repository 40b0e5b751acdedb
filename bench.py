"""Benchmark harness: ms/frame at 1440p on one TPU chip vs the reference's RTX 4080 numbers.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": "ms/frame", "vs_baseline": ...}
for the flagship config currently implemented, and writes the full per-config table to
bench_details.json.

Baselines are the reference's published frame costs (README.md:18-22, see BASELINE.md).
Timing methodology: device-only time of the jit-compiled frame function (the published NRD
numbers are GPU pass cost, not host bookkeeping), median over repeats, donated history state.

Robustness design (round-1 postmortem: the driver run timed out before the flagship's remote
compile finished and no number was ever printed):
  - every config runs in its OWN subprocess with a hard timeout, so one slow/wedged compile
    can't eat the entire budget or poison the device for later configs;
  - a persistent JAX compilation cache (.jax_cache/, survives across processes AND across
    the builder's pre-warm runs) makes repeat compiles seconds instead of minutes;
  - the headline JSON line is printed the moment the best-priority config completes, not at
    the end - a partial run still yields an official number.
"""

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

RESOLUTION = (2560, 1440)  # 1440p, the reference's headline resolution

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

# Reference README.md:18-22 (RTX 4080, 1440p) - ms/frame
BASELINES = {
    "REBLUR_DIFFUSE_SPECULAR": 2.30,
    "REBLUR_DIFFUSE_SPECULAR_PERF": 2.00,  # README.md:19 "performance mode"
    "REBLUR_DIFFUSE_SPECULAR_SH": 3.15,
    "RELAX_DIFFUSE_SPECULAR": 3.00,
    "RELAX_DIFFUSE_SPECULAR_SH": 4.85,
    "SIGMA_SHADOW": 0.40,
    "SIGMA_SHADOW_TRANSLUCENCY": 0.50,
    "REBLUR_DIFFUSE_OCCLUSION": 0.60,   # estimated: ~1/4 of DIFFUSE_SPECULAR (half planes, no stabilization)
    "REFERENCE": 0.10,                  # estimated: 2 trivial passes over RGBA32f
}

# priority order: headline (flagship) first; the rest ordered cheap-to-compile first so a
# truncated run still fills most of the table. REBLUR_DIFFUSE_SPECULAR_PERF is the
# flagship with ReblurSettings.enablePerformanceMode=True (reference README.md:19
# publishes 2.00 ms for it - a managed baseline axis since round 4).
HEADLINE_ORDER = [
    "REBLUR_DIFFUSE_SPECULAR",
    "SIGMA_SHADOW",
    "REBLUR_DIFFUSE_OCCLUSION",
    "REFERENCE",
    "SIGMA_SHADOW_TRANSLUCENCY",
    "REBLUR_DIFFUSE_SPECULAR_PERF",
    "RELAX_DIFFUSE_SPECULAR",
    "REBLUR_DIFFUSE_SPECULAR_SH",
    "RELAX_DIFFUSE_SPECULAR_SH",
]

# per-config subprocess timeout (seconds). Generous for the flagship: with a cold cache its
# Mosaic kernels take minutes each to compile remotely; warm cache finishes in well under a
# minute.
def _config_timeout(name):
    base = float(os.environ.get("NRDTPU_BENCH_CONFIG_TIMEOUT_S", "900"))
    if name == "REBLUR_DIFFUSE_SPECULAR":
        return base * 2
    return base


def setup_jax_cache():
    """Persistent compilation cache - must run before heavy jax use."""
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def make_inputs(w, h, seed=0):
    """Synthetic but *structured* 1440p frame inputs (uploaded once; timing excludes
    host->device copies).

    TPU kernel cost is data-independent (no divergence), but the fields must still put the
    pipelines in their typical operating regime: smooth viewZ/normals so geometry weights
    pass, and a penumbra map mixing lit sky (NRD_FP16_MAX), soft penumbrae, and hard-shadow
    cores so SIGMA's tile classifier marks most tiles as "needs denoising" (an all-uniform
    field degenerates to the early-out path and the blur would be benched against no work).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, h, dtype=np.float32),
                         np.linspace(-1, 1, w, dtype=np.float32), indexing="ij")
    # smooth receiver plane: viewZ ramp + gentle waves (keeps plane-distance weights alive)
    view_z = (5.0 + 20.0 * (yy + 1.0) + 0.8 * np.sin(3.0 * xx) * np.cos(2.0 * yy)
              ).astype(np.float32)
    # ~22% sky band (beyond the denoising range), as in the reference's game scenes -
    # exercises the tile-map block culling instead of benching an all-geometry frame
    view_z[: int(0.22 * h)] = 1.0e6
    # smooth normals around +z (view-facing), oct-packed like the frontend does
    nx = 0.35 * np.sin(2.5 * xx + 0.7)
    ny = 0.35 * np.cos(1.9 * yy)
    nz = np.sqrt(np.maximum(1.0 - nx * nx - ny * ny, 1e-4))
    s = np.abs(nx) + np.abs(ny) + np.abs(nz)
    ox, oy = nx / s, ny / s  # nz>0, no fold needed
    normal_roughness = np.stack([ox * 0.5 + 0.5, oy * 0.5 + 0.5,
                                 0.25 + 0.2 * (xx * 0.5 + 0.5),
                                 np.zeros_like(nx)], -1).astype(np.float32)
    # shadow layout: lit background, soft penumbra bands, hard cores (~15% lit, ~70% soft)
    fp16_max = np.float32(65504.0)
    blob = np.sin(6.0 * xx) * np.sin(5.0 * yy + 1.3) + 0.3 * np.sin(13.0 * xx * yy)
    penumbra = np.where(blob > 0.8, fp16_max,                     # lit
                        np.where(blob < -0.9, 0.0,                # hard shadow core
                                 (0.2 + 2.5 * (blob + 0.9) / 1.7))).astype(np.float32)
    # steady camera pan of ~4.5 x 2.5 px/frame plus a small swirl (VERDICT r1: a
    # static camera benches reprojection at its cheapest - multi-pixel motion gives
    # the block-motion DMA bases, bilinear weights and partial disocclusion masks
    # their typical operating values)
    mv = np.zeros((h, w, 3), np.float32)
    mv[..., 0] = 4.5 / w + 0.0004 * np.sin(2.0 * yy)
    mv[..., 1] = 2.5 / h + 0.0003 * np.cos(2.0 * xx)
    return {
        "signal": rng.uniform(0, 1, (h, w, 4)).astype(np.float32),
        "view_z": view_z,
        "mv": mv,
        "normal_roughness": normal_roughness,
        "penumbra": penumbra,
        "translucency": rng.uniform(0, 1, (h, w, 4)).astype(np.float32),
        "hitdist": rng.uniform(0, 1, (h, w)).astype(np.float32),
        "radiance": rng.uniform(0, 1, (h, w, 4)).astype(np.float32),
    }


# TPU v5e HBM bandwidth (~819 GB/s): no frame can finish faster than its HBM
# traffic. Used as a physical sanity floor on published numbers (VERDICT r4 #4c:
# sub-floor measurements are timing artifacts, not results).
HBM_GBPS = 819.0


def time_frame_fn(fn, sc, dc, state, inputs, warmup=1, iters=6, frames_per_call=32,
                  budget_s=120.0, details=None):
    """Median device ms/frame of `fn(sc, dc, state, inputs) -> (outs, state)`.

    The axon tunnel dispatches ASYNCHRONOUSLY: `block_until_ready` returns before remote
    execution finishes; only a host data fetch waits for completion. So each timed sample
    fetches a scalar reduced from the final state. The fixed tunnel dispatch+fetch
    latency (~1-30 ms) is measured with a trivial probe jit (compiles in seconds, unlike
    a second scan chain of the full pipeline - remote compiles of the big graphs are
    minutes each) and subtracted. Iteration count adapts to the measured sample cost so
    slow XLA-path configs stay within `budget_s`.

    Cheap configs (REFERENCE: ~0.1 ms/frame) need the timed window to dominate the
    tunnel latency or the subtraction is pure noise (r03: 0.0999, r04: 0.0143, judge:
    0.046 for the same code). If the first sample's net window is under
    50x the latency, the scan length is re-chosen so one sample covers >= 0.5 s of
    device work and the function re-jits once (cheap for exactly the configs that
    need it).
    """
    import jax
    import jax.numpy as jnp

    # sc/dc/inputs ride as jit ARGUMENTS: closed-over device arrays would be embedded
    # into the program as literal constants (hundreds of MB of MLIR at 1440p), which
    # blows up remote compile time and can exceed the compile-service request limit.
    def make_run(n):
        # donate the history state: XLA aliases the carry buffers instead of
        # holding both generations live (persistent-pool parity with the
        # reference's aliasable heap)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, sc, dc, inputs):
            def step(state, _):
                outs, new_state = fn(sc, dc, state, inputs)
                return new_state, None

            out, _ = jax.lax.scan(step, state, None, length=n)
            leaves = [jnp.ravel(x)[0].astype(jnp.float32)
                      for x in jax.tree.leaves(out)]
            return out, jnp.sum(jnp.stack(leaves))

        return run

    n = frames_per_call
    run = make_run(n)

    @jax.jit
    def probe(state):
        leaves = [jnp.ravel(x)[0].astype(jnp.float32) for x in jax.tree.leaves(state)]
        return jnp.sum(jnp.stack(leaves))

    def sample():
        nonlocal state
        t0 = time.perf_counter()
        state, s = run(state, sc, dc, inputs)
        _ = np.asarray(s)  # forces remote completion
        return time.perf_counter() - t0

    def measure_latency():
        lats = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(probe(state))
            lats.append(time.perf_counter() - t0)
        return float(np.median(lats))

    _ = np.asarray(probe(state))  # compile probe
    latency = measure_latency()

    t_first = sample()  # compile + first run
    if details is not None:
        # first-call wall seconds = compile + one scan; warm cache makes this small.
        # Recorded per config in bench_details.json (VERDICT r2 #3).
        details["first_call_s"] = round(t_first, 1)
    for _ in range(warmup - 1):
        t_first = sample()
    t_probe = sample()  # post-compile estimate for the window check
    net = t_probe - latency
    if net < 50.0 * latency:
        # window too small to subtract latency credibly: rescale the scan so one
        # sample is ~0.5 s of device time, re-jit (these configs compile in seconds)
        per_frame = max(net / n, 20e-6)
        n = int(min(max(0.5 / per_frame, n), 4096))
        run = make_run(n)
        t_first = sample()  # compile + run at the new length
        latency = measure_latency()
    iters = max(2, min(iters, int(budget_s / max(t_first, 1e-3))))
    ts = [sample() for _ in range(iters)]
    t = float(np.median(ts))
    if details is not None:
        details["iters"] = iters
        details["frames_per_call"] = n
        details["tunnel_latency_ms"] = round(latency * 1e3, 3)
        # memory column (VERDICT r3 #4): persistent = the history-state pytree (the
        # reference's permanent pool, README.md:320-380); aliasable = XLA's temp
        # allocation for the compiled scan step (transient-pool analogue, reused
        # across scan iterations so it is per-frame already).
        try:
            import jax
            persistent = sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(state))
            mem = run.lower(state, sc, dc, inputs).compile().memory_analysis()
            temp = int(getattr(mem, "temp_size_in_bytes", 0) or 0)
            mb = 1.0 / (1024 * 1024)
            details["memory_mb"] = {
                "persistent": round(persistent * mb, 2),
                "aliasable": round(temp * mb, 2),
                "total": round((persistent + temp) * mb, 2)}
            # physical floor: the frame step must at least read its inputs and
            # read+write its persistent state once
            in_bytes = sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(inputs))
            details["hbm_floor_ms"] = round(
                (in_bytes + 2 * persistent) / (HBM_GBPS * 1e9) * 1e3, 4)
        except Exception:
            pass
    return max(t - latency, 1e-9) * 1e3 / n


def bench_config(name, raw, w, h):
    import jax

    from nrdtpu.engine import Engine
    from nrdtpu.settings import CommonSettings, Denoiser, ResourceType

    perf_mode = name.endswith("_PERF")
    if perf_mode:
        name = name[: -len("_PERF")]
    denoiser = Denoiser[name]
    eng = Engine({0: denoiser}, resource_size=(w, h))
    if perf_mode:
        s = eng._settings[0]
        s.enablePerformanceMode = True
        eng.set_denoiser_settings(0, s)
    cs = CommonSettings()
    ident = np.eye(4, dtype=np.float32).flatten()
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.0
    proj[2, 2] = 1.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    cs.viewToClipMatrix = cs.viewToClipMatrixPrev = proj.flatten(order="F")
    cs.worldToViewMatrix = cs.worldToViewMatrixPrev = ident
    cs.resourceSize = cs.resourceSizePrev = cs.rectSize = cs.rectSizePrev = (w, h)
    cs.motionVectorScale = (1.0, 1.0, 1.0)
    # frame 0 is first-use (forced CLEAR_AND_RESTART -> max accum 0); call again so
    # the timed frames run the steady-state constants the reference's numbers use
    eng.set_common_settings(cs)
    eng.set_common_settings(cs)

    pool = {}
    if name == "REFERENCE":
        pool[ResourceType.IN_SIGNAL] = raw["signal"]
    else:
        pool[ResourceType.IN_MV] = raw["mv"]
        pool[ResourceType.IN_NORMAL_ROUGHNESS] = raw["normal_roughness"]
        pool[ResourceType.IN_VIEWZ] = raw["view_z"]
        if name.startswith("SIGMA"):
            pool[ResourceType.IN_PENUMBRA] = raw["penumbra"]
            if "TRANSLUCENCY" in name:
                pool[ResourceType.IN_TRANSLUCENCY] = raw["translucency"]
        elif "OCCLUSION" in name and "DIRECTIONAL" not in name:
            if "DIFFUSE" in name:
                pool[ResourceType.IN_DIFF_HITDIST] = raw["hitdist"]
            if "SPECULAR" in name:
                pool[ResourceType.IN_SPEC_HITDIST] = raw["hitdist"]
        else:
            if "DIFFUSE" in name:
                if name.endswith("_SH"):
                    pool[ResourceType.IN_DIFF_SH0] = raw["radiance"]
                    pool[ResourceType.IN_DIFF_SH1] = raw["radiance"]
                else:
                    pool[ResourceType.IN_DIFF_RADIANCE_HITDIST] = raw["radiance"]
            if "SPECULAR" in name:
                if name.endswith("_SH"):
                    pool[ResourceType.IN_SPEC_SH0] = raw["radiance"]
                    pool[ResourceType.IN_SPEC_SH1] = raw["radiance"]
                else:
                    pool[ResourceType.IN_SPEC_RADIANCE_HITDIST] = raw["radiance"]

    pool = {k: jax.device_put(v) for k, v in pool.items()}

    inst = eng._instances[0]
    settings = eng._settings[0]
    if hasattr(inst, "specialize"):  # REFERENCE has no permutations
        inst.specialize(settings)
    fn = inst.frame  # raw pure fn; time_frame_fn jits the scanned loop itself
    dc = inst.frame_constants(eng._consts, settings)
    sc = eng._shared_consts()
    state = jax.tree.map(jax.device_put, inst.init_state())
    details = {}
    ms = time_frame_fn(fn, sc, dc, state, pool, details=details)
    return ms, details


def run_one(name):
    """Child mode: bench one config, print one JSON result line."""
    setup_jax_cache()
    w, h = RESOLUTION
    raw = make_inputs(w, h)
    try:
        ms, details = bench_config(name, raw, w, h)
        print(json.dumps({"config": name, "ms": ms, **details}), flush=True)
        return 0
    except Exception as e:  # pragma: no cover
        print(json.dumps({"config": name,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}), flush=True)
        return 1


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--config":
        return run_one(sys.argv[2])

    w, h = RESOLUTION
    from nrdtpu.settings import Denoiser

    available = {d.name for d in Denoiser} | {"REBLUR_DIFFUSE_SPECULAR_PERF"}
    flagship = HEADLINE_ORDER[0]
    round_tag = os.environ.get("NRDTPU_ROUND", "r05")
    today = time.strftime("%Y-%m-%d")
    results = {}
    timings = {}
    memory = {}
    floors = {}
    headline_printed = False
    t_start = time.time()
    # The budget must sit BELOW the driver's kill window (observed: the driver run
    # exited rc=124 in rounds 1-3 with the old 3000 s default): bench must EXIT 0
    # with whatever it has rather than be killed mid-write (VERDICT r3 #5).
    budget_s = float(os.environ.get("NRDTPU_BENCH_BUDGET_S", "420"))

    def flush_details():
        # Merge-on-write + full provenance (VERDICT r4 #4): every entry carries the
        # round + date it was MEASURED, and a failed rerun is recorded alongside the
        # last-good number instead of silently keeping it ("last_run" field) - a
        # laundered stale number is no longer representable in the artifact.
        prior = {}
        try:
            with open("bench_details.json") as f:
                prior = json.load(f)
        except Exception:
            prior = {}
        entries = dict(prior.get("measurements", {}))
        # migrate a pre-r05 flat table once (unstamped history marked as such)
        for k, v in prior.get("results_ms", {}).items():
            if k not in entries:
                entries[k] = ({"ms": v, "round": "<=r04", "date": None}
                              if isinstance(v, float) else
                              {"ms": None, "round": "<=r04", "date": None,
                               "last_run": str(v)})
        for k, v in results.items():
            e = dict(entries.get(k, {}))
            if isinstance(v, float):
                e.update(ms=v, round=round_tag, date=today, last_run="ok")
                if k in floors:
                    e["hbm_floor_ms"] = floors[k]
                    if v < floors[k]:
                        # physical sanity: faster than the HBM traffic floor is a
                        # timing artifact, never a result (VERDICT r4 #4c)
                        e.update(ms=None, last_run=(
                            f"ARTIFACT: {v:.4f} ms below HBM floor "
                            f"{floors[k]:.4f} ms - not published"))
            elif not v.startswith("SKIPPED"):
                # ERROR/TIMEOUT: keep last-good ms (with its old stamp), record failure
                e["last_run"] = f"{v} ({round_tag} {today})"
            entries[k] = e
        m_results = {k: (e.get("ms") if e.get("ms") is not None
                         else e.get("last_run", "never measured"))
                     for k, e in entries.items()}
        m_timings = {**prior.get("compile_first_call_s", {}), **timings}
        m_memory = {**prior.get("memory_mb", {}), **memory}
        with open("bench_details.json", "w") as f:
            json.dump({"resolution": f"{w}x{h}",
                       "results_ms": m_results,
                       "measurements": entries,
                       "compile_first_call_s": m_timings,
                       "memory_mb": m_memory,
                       "baselines_ms": BASELINES,
                       "baseline_notes": {
                           "REBLUR_DIFFUSE_OCCLUSION": "self-estimated (not published)",
                           "REFERENCE": "self-estimated (not published)"},
                       "camera": "panning ~4.5x2.5 px/frame (reprojection active)"},
                      f, indent=2)

    def print_headline():
        # The headline names the FLAGSHIP, always (VERDICT r4 #4b): a flagship
        # failure prints value 0 with the error - it can never be masked by a
        # cheaper config's number.
        v = results.get(flagship)
        if isinstance(v, float) and v >= floors.get(flagship, 0.0):
            print(json.dumps({
                "metric": f"{flagship} frame time @1440p (1 TPU chip)",
                "value": round(v, 4),
                "unit": "ms/frame",
                "vs_baseline": round(BASELINES[flagship] / v, 4),
            }), flush=True)
        else:
            print(json.dumps({
                "metric": f"{flagship} frame time @1440p (1 TPU chip)",
                "value": 0, "unit": "ms/frame", "vs_baseline": 0,
                "error": str(v)}), flush=True)
        return True

    for name in HEADLINE_ORDER:
        if name not in available:
            continue
        remaining = budget_s - (time.time() - t_start)
        if headline_printed and remaining < 60.0:
            results[name] = "SKIPPED: bench budget"
            flush_details()
            continue
        # a config may never overshoot the global budget by more than a grace margin;
        # pre-headline the flagship gets whatever remains (it IS the official number)
        timeout = min(_config_timeout(name), max(remaining, 120.0))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--config", name],
                capture_output=True, text=True, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            parsed = None
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        parsed = json.loads(line)
                    except json.JSONDecodeError:
                        pass
            if parsed and "ms" in parsed:
                results[name] = parsed["ms"]
                if "first_call_s" in parsed:
                    timings[name] = parsed["first_call_s"]
                if "memory_mb" in parsed:
                    memory[name] = parsed["memory_mb"]
                if "hbm_floor_ms" in parsed:
                    floors[name] = parsed["hbm_floor_ms"]
            elif parsed and "error" in parsed:
                results[name] = f"ERROR: {parsed['error']}"
            else:
                tail = (proc.stderr or "")[-300:]
                results[name] = f"ERROR: rc={proc.returncode} {tail}"
        except subprocess.TimeoutExpired:
            results[name] = f"TIMEOUT: {timeout:.0f}s"
        flush_details()
        if not headline_printed and name == flagship:
            headline_printed = print_headline()

    flush_details()
    if not headline_printed:
        print_headline()
    return 0 if isinstance(results.get(flagship), float) else 1


if __name__ == "__main__":
    sys.exit(main())
