"""Decompose the per-iteration cost of the Monte-Carlo headline workload.

Times, on the real chip:
  - fused Pallas k-iteration block (per lane_tile variant)
  - plain XLA iterate_block
  - residual + eps + infeasibility check
so we can see what dominates the 2.4 ms/lockstep-iter and where the
3x to the 1e4-iters/s north star comes from.
"""
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import fused as fused_ops
from admm_library_tpu.ops import kkt


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


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
    print(f"shapes: B={B} n={n} m={m} k={k}")
    x = jnp.zeros((B, n), jnp.float32)
    z = jnp.zeros((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)

    # fused kernel, lane tile variants
    for lt in (256,):
        f = jax.jit(lambda x, z, y, lt=lt: fused_ops.fused_iterate_shared(
            qps.A, fac["Minv"], fac["M"], qps.q, rho_vec, qps.lam,
            qps.l, qps.u, x, z, y, cone=qps.cone, sigma=settings.sigma,
            alpha=settings.alpha, k=k, refine_steps=settings.refine_steps,
            interpret=False, lane_tile=lt))
        dt = timed(f, x, z, y)
        print(f"fused lane_tile={lt:5d}: {dt*1e3:8.2f} ms/block "
              f"= {dt/k*1e6:8.1f} us/iter -> {k/dt:8.0f} iters/s")

    # fused kernel, no refinement
    f0 = jax.jit(lambda x, z, y: fused_ops.fused_iterate_shared(
        qps.A, fac["Minv"], fac["M"], qps.q, rho_vec, qps.lam,
        qps.l, qps.u, x, z, y, cone=qps.cone, sigma=settings.sigma,
        alpha=settings.alpha, k=k, refine_steps=0,
        interpret=False, lane_tile=256))
    dt = timed(f0, x, z, y)
    print(f"fused refine=0 tile=256: {dt*1e3:8.2f} ms/block "
          f"= {dt/k*1e6:8.1f} us/iter")

    # plain XLA block
    g = jax.jit(lambda x, z, y: admm.iterate_block(
        qps, fac, x, z, y, rho_vec, settings, "inv", k))
    dt = timed(g, x, z, y)
    print(f"xla iterate_block       : {dt*1e3:8.2f} ms/block "
          f"= {dt/k*1e6:8.1f} us/iter")

    # residual check alone
    def check_res(x, z, y):
        res = admm.residuals(qps, scaling, x, z, y)
        eps_p, eps_d = admm.eps_thresholds(res, settings)
        return res[0], res[1], eps_p, eps_d

    h = jax.jit(check_res)
    dt = timed(h, x, z, y)
    print(f"residual check          : {dt*1e3:8.2f} ms/check")

    # infeasibility certificates alone
    h2 = jax.jit(lambda x, z, y: admm.infeasibility(
        qps, scaling, x, y, settings))
    dt = timed(h2, x, z, y)
    print(f"infeasibility check     : {dt*1e3:8.2f} ms/check")

    # factor refresh (the lax.cond branch on rho update)
    def refac(rho_bar):
        rv = admm.rho_vec_of(rho_bar, eq, settings)
        return kkt.factor_condensed(qps.P, qps.A, settings.sigma, rv, "inv")

    h3 = jax.jit(refac)
    dt = timed(h3, jnp.asarray(0.1, jnp.float32))
    print(f"factor refresh (inv)    : {dt*1e3:8.2f} ms")

    # full while-loop body cost: run the real solver for a fixed number
    # of blocks by setting max_iter and comparing two depths
    from admm_library_tpu.parallel.batch import run_admm_batch_shared
    for mi in (100, 200):
        st = settings.replace(max_iter=mi, eps_abs=0.0, eps_rel=0.0)
        f = jax.jit(lambda x, z, y, st=st: run_admm_batch_shared(
            qps, scaling, st, x, z, y, "inv"))
        dt = timed(f, x, z, y, reps=3)
        print(f"full solve max_iter={mi:4d}: {dt*1e3:8.2f} ms")

    # bf16 matmul roofline probe: the 3 hot matmuls at tile=256
    Ab = qps.A.astype(jnp.bfloat16)
    Minvb = fac["Minv"].astype(jnp.bfloat16)

    def hot_bf16(xt, zt, yt):
        rhs = (settings.sigma * xt - qps.q
               + jax.lax.dot_general(
                   (rho_vec * zt - yt).astype(jnp.bfloat16), Ab,
                   (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32))
        xt2 = jax.lax.dot_general(
            rhs.astype(jnp.bfloat16), Minvb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        zt2 = jax.lax.dot_general(
            xt2.astype(jnp.bfloat16), Ab.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return xt2, zt2

    def loop_bf16(x, z, y):
        def body(_, c):
            xt, zt = hot_bf16(c[0], c[1], y)
            return (xt, zt)
        return jax.lax.fori_loop(0, k, body, (x, z))

    hb = jax.jit(loop_bf16)
    dt = timed(hb, x, z, y)
    print(f"bf16 3-matmul loop (XLA): {dt*1e3:8.2f} ms/block "
          f"= {dt/k*1e6:8.1f} us/iter")

    # f32 3-matmul loop for comparison
    def hot_f32(xt, zt, yt):
        rhs = (settings.sigma * xt - qps.q
               + (rho_vec * zt - yt) @ qps.A)
        xt2 = rhs @ fac["Minv"]
        zt2 = xt2 @ qps.A.T
        return xt2, zt2

    def loop_f32(x, z, y):
        def body(_, c):
            xt, zt = hot_f32(c[0], c[1], y)
            return (xt, zt)
        return jax.lax.fori_loop(0, k, body, (x, z))

    hf = jax.jit(loop_f32)
    dt = timed(hf, x, z, y)
    print(f"f32 3-matmul loop (XLA) : {dt*1e3:8.2f} ms/block "
          f"= {dt/k*1e6:8.1f} us/iter")


if __name__ == "__main__":
    main()
