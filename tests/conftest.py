"""Test config: run everything on CPU with 8 virtual devices.

This is the multi-chip fake backend the reference lacks (SURVEY.md §4):
sharding/pjit tests exercise a real 8-device mesh without TPU hardware.

NOTE: this environment boots an `axon` PJRT plugin (remote TPU tunnel) from
sitecustomize.py at interpreter start, which imports jax and pins
JAX_PLATFORMS=axon before pytest/conftest ever runs. Env vars are therefore
too late — we must override via jax.config AFTER import but BEFORE any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: first full run pays XLA compile cost once;
# subsequent pytest invocations reuse cached executables. MACHINE-KEYED:
# XLA:CPU AOT entries from a different host CPU can mis-execute (observed:
# collective rendezvous deadlock) — see radardistill_tpu/utils/cachedir.py.
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from radardistill_tpu.utils.cachedir import cpu_cache_dir  # noqa: E402

_CACHE_DIR = cpu_cache_dir(os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
