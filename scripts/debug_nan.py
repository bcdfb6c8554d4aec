"""Bisect the NUMERR: direct run_admm_batch_shared vs solve_batch_shared."""
import os

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
from admm_library_tpu.parallel.batch import (
    run_admm_batch_shared, solve_batch_shared)


def main():
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=1024, N=50, dim=3, dtype=jnp.float32)
    s = Settings(eps_abs=1e-6, eps_rel=1e-6, max_iter=25)

    # b) the bench path, 25 iters
    sol = solve_batch_shared(qp, s)
    st = np.bincount(np.asarray(sol.status), minlength=8)
    print("solve_batch_shared  max25:", st.tolist(),
          "r_p", float(np.nanmax(np.asarray(sol.r_prim))))

    # a) direct call on my own scaled problem
    qps, scaling = ruiz_equilibrate(qp, s.scaling_iters)
    B, n, m = 1024, qps.n, qps.m
    x = jnp.zeros((B, n), jnp.float32)
    z = jnp.zeros((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)
    out = jax.jit(lambda x, z, y: run_admm_batch_shared(
        qps, scaling, s, x, z, y, "inv"))(x, z, y)
    st = np.bincount(np.asarray(out.status), minlength=8)
    print("run_admm direct     max25:", st.tolist(),
          "r_p", float(np.nanmax(np.asarray(out.r_prim))))

    # c) factor finiteness
    eq = admm.is_equality_row_shared(qps)
    rho_vec = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq, s)
    fac = kkt.factor_condensed(qps.P, qps.A, s.sigma, rho_vec, "inv")
    print("Minv finite:", bool(jnp.all(jnp.isfinite(fac["Minv"]))),
          "M finite:", bool(jnp.all(jnp.isfinite(fac["M"]))),
          "|Minv|max", float(jnp.max(jnp.abs(fac["Minv"]))))
    print("eq rows:", int(eq.sum()), "/", m,
          "rho_vec min/max", float(rho_vec.min()), float(rho_vec.max()))

    # d) iterate-by-iterate max|x| through the XLA body
    xx, zz, yy = x, z, y
    for i in range(6):
        xx, zz, yy = admm.iterate_block(
            qps, fac, xx, zz, yy, rho_vec, s, "inv", 5)
        print(f"after {5*(i+1):3d} iters: max|x| "
              f"{float(jnp.max(jnp.abs(xx))):.3e} "
              f"finite {bool(jnp.all(jnp.isfinite(xx)))}")


if __name__ == "__main__":
    main()
