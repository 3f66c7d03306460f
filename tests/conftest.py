"""Test configuration: force CPU with 8 virtual devices so sharding/pjit
logic is exercised without TPU hardware (SURVEY.md §4 implication: multi-host
logic tested on a CPU mesh).

NOTE: this environment's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel),
so the env var alone is not enough — we must override via jax.config after
import. XLA_FLAGS must still be set before the CPU backend initializes.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA:CPU mmaps every compiled executable (and cache write) separately; a
# full-suite run exhausts the kernel default vm.max_map_count=65530 and
# dies with a segfault inside the compile-cache write (observed twice, on
# two different hosts). Raise it when we can (root); otherwise warn so the
# failure mode is recognizable.
try:
    with open("/proc/sys/vm/max_map_count") as _fh:
        _mmc = int(_fh.read().strip())
    if _mmc < 1048576:
        try:
            with open("/proc/sys/vm/max_map_count", "w") as _fh:
                _fh.write("1048576")
        except OSError:
            import warnings

            warnings.warn(
                f"vm.max_map_count={_mmc}: a full-suite XLA:CPU run can "
                "exhaust it and segfault; run "
                "`sysctl -w vm.max_map_count=1048576` first."
            )
except OSError:
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is dominated by XLA compiles of
# the large jitted stages; cache them across runs. Keyed by a machine
# fingerprint — the repo (and its gitignored cache) survives across rounds
# on DIFFERENT host machines, and XLA:CPU AOT artifacts built for another
# CPU's feature set can SIGILL here (observed: hard crash in
# test_lm_dense under a cache populated on an avx512/amx host).
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as fh:
        _cpu = next((ln for ln in fh if ln.startswith("flags")), "")
except OSError:
    _cpu = platform.processor()
_fp = hashlib.sha256(_cpu.encode()).hexdigest()[:12]
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache", _fp)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
