"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json "north_star"): >= 1e4 lockstep ADMM iters/s on a
batch of 1024 horizon-50 rendezvous QPs on a v5e-8 — i.e. 128 lanes per
chip. This driver has ONE chip, so the headline value is the MEASURED
single-chip rate at the v5e-8 per-chip share (batch=128); the full
1024-lane single-chip rate and the spec'd config-5 consensus-MC run
(1024 scenarios x horizon-block partition) are reported alongside in
`detail` — no extrapolation anywhere (VERDICT r1 items 1-2).
"""
import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def main():
    from admm_library_tpu.bench.cli import (bench_consensus_mc,
                                            bench_horizon_spike,
                                            bench_monte_carlo)
    from admm_library_tpu.parallel.runtime import describe

    r128 = bench_monte_carlo(seed=0, batch=128)
    r1024 = bench_monte_carlo(seed=0, batch=1024)
    rcons = bench_consensus_mc(seed=0, batch=1024)
    rspike = bench_horizon_spike(seed=0, batch=1024)
    out = {
        "metric": "admm_iters_per_s_chip_mc_h50_batch128",
        "value": r128["iters_per_s"],
        "unit": "iters/s",
        "vs_baseline": r128["iters_per_s"] / 1.0e4,
        "detail": {
            "monte_carlo_128": r128,
            "monte_carlo_1024": r1024,
            "consensus_mc_1024": rcons,
            # Horizon-partitioned WITHOUT the consensus penalty: exact
            # SPIKE x-update across 10 horizon partitions -> same 325
            # iterations as the un-partitioned batch (VERDICT r3 item 5).
            "horizon_spike_1024": rspike,
            "topology": describe(),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
