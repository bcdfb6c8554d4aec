"""CPU study: why the f32 explicit inverse diverges and what fixes it.

Candidates: Jacobi-equilibrated inverse computation, higher sigma,
lower rho_eq_scale, more refinement steps.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PYTHONPATH"] = "/root/repo"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import kkt


def inv_jacobi(M32):
    d = jnp.sqrt(jnp.diag(M32))
    dinv = 1.0 / d
    Mh = M32 * dinv[:, None] * dinv[None, :]
    L = jnp.linalg.cholesky(Mh)
    eye = jnp.eye(M32.shape[0], dtype=M32.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    Mhinv = Linv.T @ Linv
    return Mhinv * dinv[:, None] * dinv[None, :]


def main():
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=8, N=50, dim=3, dtype=jnp.float64)
    s = Settings()
    qps, scaling = ruiz_equilibrate(qp, s.scaling_iters)
    eq = admm.is_equality_row_shared(qps)

    for rho_eq, sigma in ((1e3, 1e-6), (1e3, 1e-5), (1e2, 1e-6),
                          (1e2, 1e-5), (1e3, 1e-4)):
        st = s.replace(rho_eq_scale=rho_eq, sigma=sigma)
        rho_vec = admm.rho_vec_of(jnp.asarray(0.1), eq, st)
        M64 = kkt.condensed_matrix(qps.P, qps.A, sigma, rho_vec)
        cond = np.linalg.cond(np.asarray(M64))
        M32 = M64.astype(jnp.float32)

        # plain f32 inverse
        L = jnp.linalg.cholesky(M32)
        eye = jnp.eye(M32.shape[0], dtype=jnp.float32)
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        Minv = Linv.T @ Linv
        E_plain = float(jnp.max(jnp.abs(eye - Minv @ M32)))

        # Jacobi-equilibrated f32 inverse
        Minv_j = inv_jacobi(M32)
        E_jac = float(jnp.max(jnp.abs(eye - Minv_j @ M32)))
        print(f"rho_eq={rho_eq:7.0e} sigma={sigma:7.0e} cond={cond:9.2e}  "
              f"||I-MinvM||: plain={E_plain:9.2e} jacobi={E_jac:9.2e}")

    # simulate the f32 inv ADMM on the flagship settings with jacobi+refine
    st = s.replace(precision="single")
    qp32 = qp.astype(jnp.float32)
    qps32, sc32 = ruiz_equilibrate(qp32, st.scaling_iters)
    eq32 = admm.is_equality_row_shared(qps32)
    rho_vec = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq32, st)
    M = kkt.condensed_matrix(qps32.P, qps32.A, st.sigma, rho_vec)
    B, n, m = 8, qps32.n, qps32.m
    for name, Minv_use, refine in (
            ("plain r1", None, 1), ("jacobi r0", inv_jacobi(M), 0),
            ("jacobi r1", inv_jacobi(M), 1), ("jacobi r2", inv_jacobi(M), 2)):
        if Minv_use is None:
            L = jnp.linalg.cholesky(M)
            eye = jnp.eye(n, dtype=jnp.float32)
            Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            Minv_use = Linv.T @ Linv
        fac = {"M": M, "Minv": Minv_use}
        x = jnp.zeros((B, n), jnp.float32)
        z = jnp.zeros((B, m), jnp.float32)
        y = jnp.zeros((B, m), jnp.float32)
        stf = st.replace(refine_steps=refine)
        ok = True
        for blk in range(8):
            x, z, y = admm.iterate_block(
                qps32, fac, x, z, y, rho_vec, stf, "inv", 25)
            if not bool(jnp.all(jnp.isfinite(x))):
                ok = False
                print(f"{name}: NaN at iter {(blk+1)*25}")
                break
        if ok:
            res = admm.residuals(qps32, sc32, x, z, y)
            print(f"{name}: 200 iters r_p={float(res[0].max()):.3e} "
                  f"r_d={float(res[1].max()):.3e}")


if __name__ == "__main__":
    main()
