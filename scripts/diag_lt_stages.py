"""Config-4 chip diagnosis with per-stage timing prints (unbuffered)."""
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
from admm_library_tpu import Settings
from admm_library_tpu.api import _f64_continuation, resolve_backend
from admm_library_tpu.models.low_thrust import build_low_thrust_socp
from admm_library_tpu.parallel.batch import solve_batch_shared
from admm_library_tpu.problem import QPData
from admm_library_tpu.solution import Solution

T0 = time.perf_counter()


def log(**kw):
    print({"t": round(time.perf_counter() - T0, 1), **kw}, flush=True)


def main():
    s0 = np.array([500.0, -2000.0, 100.0, 0.0, 1.0, -0.1])
    qp, spec = build_low_thrust_socp(s0, N=200)
    s = Settings(eps_abs=1e-6, eps_rel=5e-8, band_block=spec.block,
                 max_iter=50000, rho_soc_scale=100.0, stall_checks=16,
                 backend="inv")
    log(stage="built", n=qp.n, m=qp.m)
    qpb = QPData(P=qp.P, q=qp.q, A=qp.A, l=qp.l[None], u=qp.u[None],
                 lam=qp.lam, cone=qp.cone)
    s_del = s.replace(recenter_rounds=4)
    solb = solve_batch_shared(qpb, s_del)
    jax.block_until_ready(solb.x)
    log(stage="batch_shared", status=int(np.asarray(solb.status)[0]),
        iters=int(np.asarray(solb.iters)[0]),
        r_p=float(np.max(np.asarray(solb.r_prim))),
        r_d=float(np.max(np.asarray(solb.r_dual))))
    sol = Solution(
        x=solb.x[0], z=solb.z[0], y=solb.y[0], status=solb.status[0],
        iters=solb.iters[0], r_prim=solb.r_prim[0], r_dual=solb.r_dual[0],
        obj=solb.obj[0], rho=solb.rho, history=solb.history)
    backend = resolve_backend(s, qp_n=qp.n)
    out = _f64_continuation(qp, sol, s, backend)
    jax.block_until_ready(out.x)
    log(stage="continuation", status=int(np.asarray(out.status)),
        iters=int(np.asarray(out.iters)),
        r_p=float(np.max(np.asarray(out.r_prim))),
        r_d=float(np.max(np.asarray(out.r_dual))))


if __name__ == "__main__":
    main()
