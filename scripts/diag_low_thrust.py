"""Config-4 (N=200 low-thrust SOCP) diagnostics — the measurement tool
behind the round-5 findings cited in api._f64_continuation,
parallel/batch._solve_shared_recentered and bench_low_thrust:

  solve   end-to-end api.solve() with the bench config (cold + warm).
  f64     direct boosted f64 phase, uncapped single program, with the
          residual ring-buffer trace. On TPU this doubles as the
          device-fault probe: a 12000-iteration emulated-f64 program at
          n=2000 FAULTS the chip (measured 2026-08-20, clean
          single-process run) while ~2000-iteration programs run clean
          — the reason the in-program f64 fallback is capped and the
          continuation is host-chunked.
  chunks  host-chunked f64 phases (the continuation's shape) with a
          polish attempt after each chunk.
  polish  one 6000-iteration boosted-f64 warm point, then SOC
          classification counts and force-accepted polish candidates at
          several act_tol values. Round-5 result: 191 tip / 9 boundary
          / 0 interior, candidate r_p 6e-13, r_d 4.1e-7 — i.e. the
          tangent-linearized polish LANDS from a good point; the
          round-4 "structurally unbounded" veto was an artifact of
          polishing from the broken f32 phase's 5.7e-2 point.

Usage: [JAX_PLATFORMS=cpu] python scripts/diag_low_thrust.py <mode>
(CPU needs the env var AND the in-script config update — the axon TPU
plugin ignores the env var alone; never run two TPU processes at once.)
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

import jax
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
from admm_library_tpu import Settings, solve
from admm_library_tpu.api import _phase_jit
from admm_library_tpu.core.polish import polish
from admm_library_tpu.models.low_thrust import build_low_thrust_socp
from admm_library_tpu.problem import QPData


def build():
    s0 = np.array([500.0, -2000.0, 100.0, 0.0, 1.0, -0.1])
    qp, spec = build_low_thrust_socp(s0, N=200)
    print({"n": qp.n, "m": qp.m, "m_box": qp.cone.m_box,
           "m_soc": qp.cone.m_soc}, flush=True)
    return qp, spec


def bench_settings(spec, **kw):
    base = dict(eps_abs=1e-6, eps_rel=5e-8, band_block=spec.block,
                max_iter=50000, rho_soc_scale=100.0, stall_checks=16,
                backend="inv")
    base.update(kw)
    return Settings(**base)


def mode_solve():
    qp, spec = build()
    s = bench_settings(spec)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        sol = solve(qp, s)
        jax.block_until_ready(sol.x)
        print({tag + "_s": round(time.perf_counter() - t0, 1),
               "status": int(np.asarray(sol.status)),
               "iters": int(np.asarray(sol.iters)),
               "r_prim": float(np.max(np.asarray(sol.r_prim))),
               "r_dual": float(np.max(np.asarray(sol.r_dual)))},
              flush=True)


def mode_f64():
    from admm_library_tpu.parallel.batch import solve_batch_shared
    qp, spec = build()
    max_iter = int(os.environ.get("LT_MAX_ITER", "12000"))
    qpb = QPData(P=qp.P, q=qp.q, A=qp.A, l=qp.l[None], u=qp.u[None],
                 lam=qp.lam, cone=qp.cone)
    s = bench_settings(spec, max_iter=max_iter, precision="double",
                       stall_checks=0, history=128)
    t0 = time.perf_counter()
    sol = solve_batch_shared(qpb, s)
    jax.block_until_ready(sol.x)
    print({"t": round(time.perf_counter() - t0, 1),
           "status": int(np.asarray(sol.status)[0]),
           "iters": int(np.asarray(sol.iters)[0]),
           "r_prim": float(np.max(np.asarray(sol.r_prim))),
           "r_dual": float(np.max(np.asarray(sol.r_dual)))}, flush=True)
    h = np.asarray(sol.history)
    h = h[h[:, 0] > 0]
    h = h[np.argsort(h[:, 0])]
    for row in h[:: max(1, len(h) // 24)]:
        print(f"  it={int(row[0]):6d} r_p={row[1]:.3e} r_d={row[2]:.3e}",
              flush=True)


def _chunk_phase(qp64, spec, x, z, y, max_iter):
    s = bench_settings(spec, max_iter=max_iter, precision="single",
                       warm_start=True, stall_checks=0, polish=False,
                       recenter_rounds=0)
    return _phase_jit(qp64, x, z, y, s, "inv")


def mode_chunks():
    qp, spec = build()
    qp64 = qp.astype(jnp.float64)
    x = jnp.zeros((qp.n,), jnp.float64)
    z = jnp.zeros((qp.m,), jnp.float64)
    y = jnp.zeros_like(z)
    t_start = time.perf_counter()
    for c in range(int(os.environ.get("LT_CHUNKS", "5"))):
        ph = _chunk_phase(qp64, spec, x, z, y,
                          int(os.environ.get("LT_CHUNK", "2000")))
        jax.block_until_ready(ph.x)
        x, z, y = ph.x, ph.z, ph.y
        print({"chunk": c, "status": int(ph.status),
               "r_p": float(ph.r_prim), "r_d": float(ph.r_dual),
               "t": round(time.perf_counter() - t_start, 1)}, flush=True)
        pol = polish(qp64, ph, 1e-6, 5e-8, act_tol=1e-4)
        jax.block_until_ready(pol.x)
        print({"polish_status": int(pol.status),
               "r_p": float(pol.r_prim), "r_d": float(pol.r_dual)},
              flush=True)
        if int(pol.status) == 1 or int(ph.status) == 1:
            break


def mode_polish():
    qp, spec = build()
    qp64 = qp.astype(jnp.float64)
    x = jnp.zeros((qp.n,), jnp.float64)
    z = jnp.zeros((qp.m,), jnp.float64)
    y = jnp.zeros_like(z)
    ph = _chunk_phase(qp64, spec, x, z, y, 6000)
    jax.block_until_ready(ph.x)
    print({"iters": int(ph.iters), "r_p": float(ph.r_prim),
           "r_d": float(ph.r_dual)}, flush=True)
    cone = qp.cone
    soc0 = cone.m_box + cone.m_l1
    d = cone.soc_dims[0]
    zb = np.asarray(ph.z)[soc0:].reshape(cone.n_soc, d)
    t0_, u0_ = zb[:, 0], zb[:, 1:]
    nu0 = np.linalg.norm(u0_, axis=-1)
    for act_tol in (1e-3, 1e-4):
        tol_b = act_tol * (1.0 + np.abs(t0_) + nu0)
        interior = nu0 <= t0_ - tol_b
        tip = (t0_ <= tol_b) & (nu0 <= tol_b)
        print({"act_tol": act_tol, "tip": int(tip.sum()),
               "bnd": int((~(interior | tip)).sum()),
               "interior": int(interior.sum())}, flush=True)
    for act_tol in (1e-3, 3e-4, 1e-4):
        pol = polish(qp64, ph, 1e-6, 5e-8, act_tol=act_tol,
                     force_accept=True)
        jax.block_until_ready(pol.x)
        print({"act_tol": act_tol, "forced_r_p": float(pol.r_prim),
               "forced_r_d": float(pol.r_dual),
               "x_max": float(np.max(np.abs(np.asarray(pol.x))))},
              flush=True)


if __name__ == "__main__":
    {"solve": mode_solve, "f64": mode_f64, "chunks": mode_chunks,
     "polish": mode_polish}[sys.argv[1] if len(sys.argv) > 1
                            else "solve"]()
