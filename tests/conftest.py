"""Test configuration: force CPU with 8 virtual devices so sharding/pjit
logic is exercised without TPU hardware (SURVEY.md §4 implication: multi-host
logic tested on a CPU mesh).

NOTE: this environment's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel),
so the env var alone is not enough — we must override via jax.config after
import. XLA_FLAGS must still be set before the CPU backend initializes.
"""

import os

# silence XLA:CPU AOT cache-loader machine-feature warnings (cosmetic; the
# cached artifacts load and run fine)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is dominated by XLA compiles of
# the large jitted stages; cache them across runs
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
