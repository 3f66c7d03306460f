"""Weak-scaling sweep of the distributed paths on a virtual CPU mesh
(VERDICT round-1 next-steps #9: record timing per device count, not just
ok). Sweeps 1/2/4/8 devices over the landmark-sharded distributed BA
(fixed TOTAL problem: strong scaling of the Schur stage) and the SPMD
session fleet (one session per device: weak scaling).

CPU-mesh numbers validate the scaling SHAPE (collectives wired correctly,
no serialization bottleneck); absolute speedups ride ICI on real hardware.

Usage: python examples/bench_multichip.py  ->  one JSON line per N.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def main():
    results = []
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        r = ge.dryrun_multichip(n, report=False)
        print(json.dumps(r), flush=True)
        results.append(r)
    if len(results) >= 2:
        base = results[0]["dist_ba_2iter_s"]
        last = results[-1]
        print(json.dumps({
            "summary": "dist_ba_strong_scaling",
            "speedup_vs_1dev": round(base / last["dist_ba_2iter_s"], 3),
            "n_devices": last["n_devices"],
        }))


if __name__ == "__main__":
    main()
