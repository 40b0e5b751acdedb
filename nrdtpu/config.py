"""Implementation selection: XLA reference path vs Pallas fast path.

Both paths implement the same pass semantics; the XLA path (`passes/*/kernels.py`) is the
readable reference used for correctness tests on CPU, the Pallas path (`kernels/*.py`) is the
TPU production path (fast local Mosaic compiles, VMEM halo blocks; see ARCHITECTURE.md §3).
Select with NRDTPU_IMPL=xla|pallas; default: pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

import os


def requantize_state(old_state: dict, new_state: dict) -> dict:
    """Cast each carried plane back to its declared storage dtype.

    History planes may be reduced-precision (bf16, the RGBA16f-history analogue of
    Reblur.cpp:37-64); compute runs f32 and the carry is re-quantized on store so
    `frame` is scan-invariant for EVERY caller (Engine, bench, shard_map, lax.scan)
    - input and output carry types must match. Key-aware: new_state may grow keys
    (e.g. the validation overlay)."""
    return {k: (v.astype(old_state[k].dtype)
                if k in old_state and hasattr(v, "astype")
                and hasattr(old_state[k], "dtype") else v)
            for k, v in new_state.items()}


def use_pallas() -> bool:
    mode = os.environ.get("NRDTPU_IMPL", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    # "axon" is a TPU chip behind a tunnelled PJRT plugin; same Mosaic path.
    return platform in ("tpu", "axon")
