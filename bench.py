"""Driver benchmark: prints the headline metric as ONE JSON line —
streamed as soon as it is measured, then re-printed (same headline
fields, richer `detail`) after each additional config completes.

Headline (BASELINE.json "north_star"): >= 1e4 lockstep ADMM iters/s on a
batch of 1024 horizon-50 rendezvous QPs on a v5e-8 — i.e. 128 lanes per
chip. This driver has ONE chip, so the headline value is the MEASURED
single-chip rate at the v5e-8 per-chip share (batch=128); the full
1024-lane single-chip rate, the spec'd config-5 consensus run, the exact
SPIKE horizon partition, and the remaining BASELINE configs are reported
alongside in `detail` — no extrapolation anywhere (VERDICT r1 items 1-2).

Robustness (VERDICT r4 item 1 — round 4's driver run timed out before
the single end-of-run print executed, erasing the round's evidence):
  * The headline config runs FIRST and its JSON line is printed+flushed
    immediately; every later config re-prints the full line, so stdout
    always ends with a parseable record of everything measured so far.
  * A wall-clock budget (ADMM_BENCH_BUDGET_S, default 1200 s) skips
    remaining configs with {"skipped": true} entries once exceeded.
  * Each extra config is wrapped in try/except — a crash in config N
    cannot erase configs 1..N-1.
  * SIGTERM (what `timeout` sends first) re-emits the current line
    before exiting.
"""
import json
import os
import signal
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

BUDGET_S = float(os.environ.get("ADMM_BENCH_BUDGET_S", "1200"))

_out = {}


def _emit():
    if _out:
        print(json.dumps(_out), flush=True)


def _on_term(signum, frame):
    _emit()
    sys.exit(128 + signum)


signal.signal(signal.SIGTERM, _on_term)


def main():
    t_start = time.time()
    from admm_library_tpu.bench.cli import (bench_consensus_mc, bench_cw,
                                            bench_horizon_spike,
                                            bench_low_thrust, bench_mpc,
                                            bench_monte_carlo,
                                            bench_random_qp, bench_rowshard)
    from admm_library_tpu.parallel.runtime import describe

    # Headline FIRST: from this print on, the round has driver evidence.
    r128 = bench_monte_carlo(seed=0, batch=128)
    _out.update({
        "metric": "admm_iters_per_s_chip_mc_h50_batch128",
        "value": r128["iters_per_s"],
        "unit": "iters/s",
        "vs_baseline": r128["iters_per_s"] / 1.0e4,
        "detail": {
            "monte_carlo_128": r128,
            "topology": describe(),
        },
    })
    _emit()

    # Remaining configs, cheapest first; each one re-prints the full
    # line on completion (or on error) so a kill between configs still
    # leaves the latest complete record on stdout.
    extras = [
        ("monte_carlo_1024", lambda: bench_monte_carlo(seed=0, batch=1024)),
        # Exact horizon partition: same 325 iterations as the
        # un-partitioned batch by construction (SPIKE x-update), vs the
        # boundary-averaging consensus run below (VERDICT r3 item 5).
        ("horizon_spike_1024", lambda: bench_horizon_spike(seed=0,
                                                           batch=1024)),
        ("consensus_mc_1024", lambda: bench_consensus_mc(seed=0,
                                                         batch=1024)),
        ("random_qp", bench_random_qp),
        ("mpc_rendezvous", bench_mpc),
        ("cw_minfuel", bench_cw),
        ("rowshard_qp4096", bench_rowshard),
        ("low_thrust_socp", bench_low_thrust),
    ]
    for name, fn in extras:
        elapsed = time.time() - t_start
        if elapsed > BUDGET_S:
            _out["detail"][name] = {"skipped": True,
                                    "reason": f"budget {BUDGET_S:.0f}s "
                                              f"exceeded at {elapsed:.0f}s"}
            _emit()
            continue
        try:
            _out["detail"][name] = fn()
        except Exception as e:  # noqa: BLE001 — partial results > crash
            _out["detail"][name] = {"error": repr(e)[:300]}
        _emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
