"""x-update backend shoot-out on the chip (VERDICT r2 item 8).

One table: inv | chol | banded | cg | pallas_cg at
  (a) the flagship shape — 128-lane shared-matrix horizon-50 MC batch,
  (b) config 2's banded shape — single horizon-50 MPC rendezvous QP,
f32 phase at eps 1e-4 (the loop-rate regime; the hybrid re-center
rounds reuse the same backend, so phase-rate ordering decides the
default). Prints a markdown table for PERF.md §3b.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_backends.py
"""
import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
# Force in-process jit (no AOT export worker) so each backend's compile
# cost is paid here once and the timed reps are pure execution.
os.environ.setdefault("ADMM_TPU_NO_AOT", "1")

import jax
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.models.double_integrator import build_mpc_qp
from admm_library_tpu.parallel.batch import solve_batch_shared
from admm_library_tpu.api import _phase_jit


def timed(fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts))


BACKENDS = ("inv", "chol", "banded", "cg", "pallas_cg")


def main():
    rows = []
    # (a) flagship: 128-lane shared-matrix batch, f32 phase to 1e-4.
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=128, N=50, dim=3)
    qp32 = qp.astype(jnp.float32)
    for be in BACKENDS:
        s = Settings(precision="single", eps_abs=1e-4, eps_rel=1e-4,
                     backend=be, band_block=spec.block,
                     fused=("auto" if be == "inv" else "off"))
        try:
            sol, dt = timed(lambda s=s: solve_batch_shared(qp32, s))
        except Exception as e:                         # noqa: BLE001
            rows.append(("batch128_mc_h50", be, None, None, None,
                         f"{type(e).__name__}"))
            continue
        it = int(np.max(np.asarray(sol.iters)))
        ok = bool(np.all(np.asarray(sol.status) == 1))
        rows.append(("batch128_mc_h50", be, it, dt, it / dt,
                     "SOLVED" if ok else "NOT_SOLVED"))
        print(rows[-1], flush=True)

    # (b) config 2: single horizon-50 MPC QP (banded structure declared).
    rng = np.random.default_rng(0)
    s0 = np.concatenate([rng.uniform(-2, 2, 3), rng.uniform(-0.2, 0.2, 3)])
    qp2, spec2 = build_mpc_qp(s0, np.zeros(6), N=50, dim=3)
    qp2_32 = qp2.astype(jnp.float32)
    z0 = jnp.zeros((qp2.m,), jnp.float32)
    x0 = jnp.zeros((qp2.n,), jnp.float32)
    for be in BACKENDS:
        s = Settings(precision="single", eps_abs=1e-4, eps_rel=1e-4,
                     backend=be, band_block=spec2.block)
        try:
            sol, dt = timed(lambda s=s, be=be: _phase_jit(
                qp2_32, x0, z0, z0, s, be))
        except Exception as e:                         # noqa: BLE001
            rows.append(("mpc_h50_single", be, None, None, None,
                         f"{type(e).__name__}"))
            continue
        it = int(np.asarray(sol.iters))
        ok = int(np.asarray(sol.status)) == 1
        rows.append(("mpc_h50_single", be, it, dt, it / dt,
                     "SOLVED" if ok else "NOT_SOLVED"))
        print(rows[-1], flush=True)

    print("\n| shape | backend | iters | wall-clock | iters/s | status |")
    print("|---|---|---|---|---|---|")
    for shape, be, it, dt, rate, st in rows:
        if it is None:
            print(f"| {shape} | {be} | — | — | — | {st} |")
        else:
            print(f"| {shape} | {be} | {it} | {dt*1e3:.1f} ms "
                  f"| {rate:,.0f} | {st} |")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BACKENDS_TABLE.json"), "w") as f:
        json.dump([{"shape": r[0], "backend": r[1], "iters": r[2],
                    "wall_clock_s": r[3], "iters_per_s": r[4],
                    "status": r[5]} for r in rows], f, indent=1)


if __name__ == "__main__":
    main()
