"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json "north_star"): lockstep ADMM iterations/s on a
1024-scenario batch of horizon-50 rendezvous QPs, shared-matrix path,
solved to 1e-6 primal/dual residual. Target >= 1e4 iters/s per chip.
"""
import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def main():
    from admm_library_tpu.bench.cli import bench_monte_carlo

    r = bench_monte_carlo(seed=0, batch=1024)
    out = {
        "metric": "admm_iters_per_s_per_chip_mc1024_h50",
        "value": r["iters_per_s"],
        "unit": "iters/s",
        "vs_baseline": r["iters_per_s"] / 1.0e4,
        "detail": r,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
