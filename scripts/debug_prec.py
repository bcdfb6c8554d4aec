"""Does trace-time default_matmul_precision('highest') fix the TPU
in-graph Cholesky/trisolve factor? And what does it cost?"""
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import kkt

REPS = 10


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0 - 0.005) / REPS


def main():
    s = Settings(precision="single")
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=128, N=50, dim=3, dtype=jnp.float32)
    qps, scaling = ruiz_equilibrate(qp, s.scaling_iters)
    eq = admm.is_equality_row_shared(qps)
    rho_vec = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq, s)
    n = qps.n

    M64 = np.asarray(
        kkt.condensed_matrix(qps.P, qps.A, s.sigma, rho_vec),
        np.float64)

    def fac_fn(rho):
        def body(i, c):
            f = kkt.factor_condensed(
                qps.P, qps.A, s.sigma, rho * (1.0 + 0.0 * c[0, 0]), "inv")
            return f["Minv"]
        return jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((n, n), jnp.float32))

    # default precision
    f = jax.jit(fac_fn)
    Minv, dt = timed(f, rho_vec)
    E = np.abs(np.eye(n) - np.asarray(Minv, np.float64) @ M64).max()
    print(f"factor default : ||I-MinvM||={E:.3e}  {dt*1e3:.2f} ms")

    # highest precision at trace time
    with jax.default_matmul_precision("highest"):
        f = jax.jit(fac_fn)
        Minv, dt = timed(f, rho_vec)
    E = np.abs(np.eye(n) - np.asarray(Minv, np.float64) @ M64).max()
    print(f"factor highest : ||I-MinvM||={E:.3e}  {dt*1e3:.2f} ms")

    # highest + one Newton-Schulz step
    def fac_ns(rho):
        def body(i, c):
            f = kkt.factor_condensed(
                qps.P, qps.A, s.sigma, rho * (1.0 + 0.0 * c[0, 0]), "inv")
            X, M = f["Minv"], f["M"]
            X = X @ (2.0 * jnp.eye(n, dtype=jnp.float32) - M @ X)
            return X
        return jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((n, n), jnp.float32))

    with jax.default_matmul_precision("highest"):
        f = jax.jit(fac_ns)
        Minv, dt = timed(f, rho_vec)
    E = np.abs(np.eye(n) - np.asarray(Minv, np.float64) @ M64).max()
    print(f"factor hi + NS : ||I-MinvM||={E:.3e}  {dt*1e3:.2f} ms")

    # residual check cost at highest precision, B=1024
    qp2, _, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=1024, N=50, dim=3, dtype=jnp.float32)
    qps2, scaling2 = ruiz_equilibrate(qp2, s.scaling_iters)
    B, m = 1024, qps2.m
    x = jnp.ones((B, n), jnp.float32)
    z = jnp.ones((B, m), jnp.float32)
    y = jnp.ones((B, m), jnp.float32)

    def res_loop(x, z, y):
        def body(i, c):
            x, z, y = c
            r = admm.residuals(qps2, scaling2, x, z, y)
            return x + 0.0 * r[0][:, None], z, y
        return jax.lax.fori_loop(0, REPS, body, (x, z, y))

    for name, ctx in (("default", None), ("highest", "highest")):
        if ctx:
            with jax.default_matmul_precision(ctx):
                f = jax.jit(res_loop)
                _, dt = timed(f, x, z, y)
        else:
            f = jax.jit(res_loop)
            _, dt = timed(f, x, z, y)
        print(f"residuals B=1024 {name}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
