"""Test configuration: force an 8-device virtual CPU mesh so sharding tests run anywhere.

Must set XLA flags before jax initializes; keep this file import-light.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the config update
# works. Tests must run on (virtual 8-device) CPU - the tunnel makes per-op dispatch ~10ms.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# The suite is compile-dominated (every Engine.specialize jits a full pass graph); the
# persistent cache turns repeat runs from ~25 min into a few minutes. Cache keys include
# platform + flags, so CPU test entries coexist with the TPU bench entries.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: exhaustive permutation sweeps (deselect with '-m \"not slow\"')")


import pytest  # noqa: E402


@pytest.fixture()
def pallas_interpret(monkeypatch):
    """Force pallas_call(interpret=True) + NRDTPU_IMPL=pallas (shared across files)."""
    import jax.experimental.pallas as pl_mod

    orig = pl_mod.pallas_call

    def interp(*a, **k):
        k = dict(k)
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl_mod, "pallas_call", interp)
    monkeypatch.setenv("NRDTPU_IMPL", "pallas")
    yield
