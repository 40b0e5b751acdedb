"""Mosaic bf16 op-legality probe on the target TPU (v5e behind axon).

Compiles one tiny kernel per op class and prints ok/FAIL. Drives the round-4
mixed-precision kernel design (which ops may run native-bf16 in tap loops)."""

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import setup_jax_cache

setup_jax_cache()

B = jnp.bfloat16


def probe(name, body):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:, :] = body(x_ref[:, :], y_ref[:, :]).astype(jnp.float32)

    x = jnp.asarray(np.random.rand(64, 256), B)
    y = jnp.asarray(np.random.rand(64, 256) + 0.5, B)

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, y)

    try:
        np.asarray(run(x, y))
        print(f"{name:24s}: ok", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:24s}: FAIL {msg}", flush=True)


def scalar_probe(name, use_astype):
    """Traced f32 scalar entering a bf16 vector chain."""
    def kernel(s_ref, x_ref, o_ref):
        s = s_ref[0]
        if use_astype:
            sb = s.astype(B)
            o_ref[:, :] = (x_ref[:, :] * sb).astype(jnp.float32)
        else:
            sb = (s * 2.0).astype(B)  # scalar f32 math then truncf
            o_ref[:, :] = (x_ref[:, :] * sb).astype(jnp.float32)

    x = jnp.asarray(np.random.rand(64, 256), B)
    s = jnp.asarray([1.5], jnp.float32)

    @jax.jit
    def run(s, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, x)

    try:
        np.asarray(run(s, x))
        print(f"{name:24s}: ok", flush=True)
    except Exception:
        msg = traceback.format_exc().split("\n")
        line = next((l for l in msg if "legalize" in l or "support" in l), msg[-2])
        print(f"{name:24s}: FAIL {line.strip()[:110]}", flush=True)


def unaligned_probe():
    """bf16 mul on an odd-sublane-offset slice (tap pattern)."""
    def kernel(x_ref, o_ref):
        a = x_ref[3:67, 0:256]
        b = x_ref[5:69, 0:256]
        o_ref[:, :] = (a * b).astype(jnp.float32)

    x = jnp.asarray(np.random.rand(96, 256), B)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    try:
        np.asarray(run(x))
        print(f"{'mul unaligned slices':24s}: ok", flush=True)
    except Exception as e:
        print(f"{'mul unaligned slices':24s}: FAIL {str(e).split(chr(10))[0][:110]}",
              flush=True)


def main():
    probe("mul", lambda x, y: x * y)
    probe("fma", lambda x, y: x * y + x)
    probe("mul python const", lambda x, y: x * 0.37)
    probe("min/max/clip", lambda x, y: jnp.clip(jnp.minimum(x, y), 0.0, 1.0))
    probe("abs", lambda x, y: jnp.abs(x))
    probe("exp", lambda x, y: jnp.exp(-x))
    probe("exp2", lambda x, y: jnp.exp2(-x))
    probe("sqrt", lambda x, y: jnp.sqrt(x + 1.0))
    probe("rsqrt", lambda x, y: jax.lax.rsqrt(x + 1.0))
    probe("div", lambda x, y: x / y)
    probe("recip", lambda x, y: 1.0 / y)
    probe("cmp", lambda x, y: (x > y).astype(B))
    probe("where f32mask", lambda x, y: jnp.where(
        x.astype(jnp.float32) > 0.5, x, y))
    probe("step arith", lambda x, y: jnp.clip((x - y) * 1e30, 0.0, 1.0))
    probe("big const 1e30", lambda x, y: jnp.clip(x * 1e30 + 0.5, 0.0, 1.0))
    probe("truncf vec", lambda x, y: (x.astype(jnp.float32) * 1.5).astype(B))
    scalar_probe("scalar bf16 mul", True)
    scalar_probe("scalar f32->bf16", False)
    unaligned_probe()


if __name__ == "__main__":
    main()
