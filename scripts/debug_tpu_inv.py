"""Isolate the TPU-only inv-path divergence.

Matrix: {TPU-computed Minv, host-f64 Minv} x {default, highest matmul
precision} x {inv, chol}, 25 iterations from zeros.
"""
import os

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


def main():
    s = Settings(precision="single")
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=128, N=50, dim=3, dtype=jnp.float32)
    qps, scaling = ruiz_equilibrate(qp, s.scaling_iters)
    eq = admm.is_equality_row_shared(qps)
    rho_vec = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq, s)
    B, n, m = 128, qps.n, qps.m

    # Factor on TPU (default precision) and on host in f64.
    fac_tpu = kkt.factor_condensed(qps.P, qps.A, s.sigma, rho_vec, "inv")
    M64 = np.asarray(
        kkt.condensed_matrix(qps.P, qps.A, s.sigma, rho_vec),
        dtype=np.float64)
    Minv64 = np.linalg.inv(M64)
    fac_host = {"M": jnp.asarray(M64, jnp.float32),
                "Minv": jnp.asarray(Minv64, jnp.float32)}
    fac_chol = kkt.factor_condensed(qps.P, qps.A, s.sigma, rho_vec, "chol")

    # factor quality, evaluated on host in f64
    for name, fac in (("tpu", fac_tpu), ("host", fac_host)):
        E = np.eye(n) - np.asarray(fac["Minv"], np.float64) @ M64
        print(f"Minv[{name}]: ||I-MinvM||_max = {np.abs(E).max():.3e}")
    Ltpu = np.asarray(fac_chol["L"], np.float64)
    E = np.abs(Ltpu @ Ltpu.T - M64).max()
    print(f"chol[tpu]:  ||LL^T - M||_max = {E:.3e}")

    x0 = jnp.zeros((B, n), jnp.float32)
    z0 = jnp.zeros((B, m), jnp.float32)
    y0 = jnp.zeros((B, m), jnp.float32)

    cases = [
        ("inv/tpu-fac/default", fac_tpu, "inv", None),
        ("inv/tpu-fac/highest", fac_tpu, "inv", "highest"),
        ("inv/host-fac/default", fac_host, "inv", None),
        ("chol/default", fac_chol, "chol", None),
    ]
    for name, fac, backend, prec in cases:
        def blk(x, z, y, fac=fac, backend=backend):
            return admm.iterate_block(
                qps, fac, x, z, y, rho_vec, s, backend, 25)
        if prec:
            with jax.default_matmul_precision(prec):
                f = jax.jit(blk)
                x, z, y = f(x0, z0, y0)
        else:
            f = jax.jit(blk)
            x, z, y = f(x0, z0, y0)
        print(f"{name:24s}: max|x|={float(jnp.max(jnp.abs(x))):.3e} "
              f"finite={bool(jnp.all(jnp.isfinite(x)))}")


if __name__ == "__main__":
    main()
