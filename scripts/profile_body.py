"""Dispatch-floor-free per-piece timing + NUMERR repro.

The remote tunnel adds ~5 ms of host dispatch per jit call, hiding true
device times. Wrap each piece in a 20x lax.fori_loop with a data
dependency so one dispatch amortises over 20 device executions.
"""
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import fused as fused_ops
from admm_library_tpu.ops import kkt
from admm_library_tpu.parallel.batch import run_admm_batch_shared

REPS = 20


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0 - 0.005) / REPS  # subtract dispatch


def rep(piece):
    """Run `piece` REPS times with a data dependency, one dispatch."""
    def run(x, z, y):
        def body(_, c):
            x, z, y = c
            return piece(x, z, y)
        return jax.lax.fori_loop(0, REPS, body, (x, z, y))
    return jax.jit(run)


def main():
    settings = Settings(precision="single")
    k = settings.check_every
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=1024, N=50, dim=3, dtype=jnp.float32)
    qps, scaling = ruiz_equilibrate(qp, settings.scaling_iters)
    eq = admm.is_equality_row_shared(qps)
    rho_vec = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq, settings)
    fac = kkt.factor_condensed(qps.P, qps.A, settings.sigma, rho_vec, "inv")
    B, n, m = 1024, qps.n, qps.m
    x = jnp.zeros((B, n), jnp.float32)
    z = jnp.zeros((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)

    # 1. fused block
    def p_fused(x, z, y):
        return fused_ops.fused_iterate_shared(
            qps.A, fac["Minv"], fac["M"], qps.q, rho_vec, qps.lam,
            qps.l, qps.u, x, z, y, cone=qps.cone, sigma=settings.sigma,
            alpha=settings.alpha, k=k, refine_steps=settings.refine_steps,
            interpret=False, lane_tile=256)
    dt = timed(rep(p_fused), x, z, y)
    print(f"fused block (k=25)  : {dt*1e3:8.3f} ms = {dt/k*1e6:7.1f} us/iter")

    # 2. residual check
    def p_res(x, z, y):
        res = admm.residuals(qps, scaling, x, z, y)
        return x + res[0][:, None] * 0, z, y
    dt = timed(rep(p_res), x, z, y)
    print(f"residuals           : {dt*1e3:8.3f} ms")

    # 3. infeasibility
    def p_inf(x, z, y):
        pinf, dinf = admm.infeasibility(qps, scaling, x, y, settings)
        return x + pinf[:, None].astype(x.dtype), z, y
    dt = timed(rep(p_inf), x, z, y)
    print(f"infeasibility       : {dt*1e3:8.3f} ms")

    # 4. factor refresh
    def p_fac(x, z, y):
        f2 = kkt.factor_condensed(
            qps.P, qps.A, settings.sigma,
            rho_vec * (1 + x[0, 0] * 0), "inv")
        return x + f2["Minv"][0, 0], z, y
    dt = timed(rep(p_fac), x, z, y)
    print(f"factor refresh (inv): {dt*1e3:8.3f} ms")

    # 5. NUMERR repro: one body from zeros, print residuals
    xb, zb, yb = p_fused(x, z, y)
    res = admm.residuals(qps, scaling, xb, zb, yb)
    print("after 25 fused iters: r_p", float(res[0].max()),
          "r_d", float(res[1].max()),
          "finite x", bool(jnp.all(jnp.isfinite(xb))))

    # same through the XLA (non-fused) body
    xg, zg, yg = admm.iterate_block(
        qps, fac, x, z, y, rho_vec, settings, "inv", k)
    res2 = admm.residuals(qps, scaling, xg, zg, yg)
    print("after 25 xla iters  : r_p", float(res2[0].max()),
          "r_d", float(res2[1].max()),
          "finite x", bool(jnp.all(jnp.isfinite(xg))))

    print("max |fused - xla| x :", float(jnp.max(jnp.abs(xb - xg))))


if __name__ == "__main__":
    main()
