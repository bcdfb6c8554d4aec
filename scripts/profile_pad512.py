"""VERDICT r4 item 8: does padding the flagship shapes (n=450, m=456)
up to the MXU tile multiple (512, 512) speed up the fused kernel?

The padded problem is numerically equivalent: pad variables get
P = I, q = 0, zero A columns (so M's pad block is (1+sigma) I and the
pad x stays 0); pad rows get zero A rows with strictly-inactive box
bounds (projection = identity, dual stays 0). Real-coordinate iterates
are identical, so any rate delta is pure tiling/padding effect.
"""
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("ADMM_TPU_NO_AOT", "1")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import fused as fused_ops
from admm_library_tpu.ops import kkt
from admm_library_tpu.problem import ConeSpec, QPData


def pad_qp(qp, n_to, m_to):
    n, m = qp.n, qp.m
    dn, dm = n_to - n, m_to - m
    P = jnp.zeros((n_to, n_to), qp.dtype)
    P = P.at[:n, :n].set(qp.P)
    P = P.at[jnp.arange(n, n_to), jnp.arange(n, n_to)].set(1.0)
    A = jnp.zeros((m_to, n_to), qp.dtype)
    A = A.at[:m, :n].set(qp.A)
    q = jnp.concatenate([qp.q, jnp.zeros((dn,), qp.dtype)])
    pad_l = jnp.full((qp.l.shape[0], dm), -1.0, qp.dtype)
    pad_u = jnp.full((qp.u.shape[0], dm), 1.0, qp.dtype)
    l = jnp.concatenate([qp.l, pad_l], axis=-1)
    u = jnp.concatenate([qp.u, pad_u], axis=-1)
    cone = ConeSpec(m_box=qp.cone.m_box + dm, m_l1=0, soc_dims=())
    return QPData(P=P, q=q, A=A, l=l, u=u, lam=qp.lam, cone=cone)


def timed(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def block_rate(qp, settings, B, k=25, refine=1, tag=""):
    qps, scaling = ruiz_equilibrate(qp, settings.scaling_iters)
    eq = admm.is_equality_row_shared(qps)
    rho_vec = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq, settings)
    fac = kkt.factor_condensed(qps.P, qps.A, settings.sigma, rho_vec, "inv")
    n, m = qps.n, qps.m
    x = jnp.zeros((B, n), jnp.float32)
    z = jnp.zeros((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)
    f = jax.jit(lambda x, z, y: fused_ops.fused_iterate_shared(
        qps.A, fac["Minv"], fac["M"], qps.q, rho_vec,
        qps.lam, qps.l, qps.u, x, z, y, cone=qps.cone,
        sigma=settings.sigma, alpha=settings.alpha,
        k=k, refine_steps=refine, interpret=False))
    dt = timed(f, x, z, y)
    print({"tag": tag, "n": n, "m": m, "B": B, "k": k,
           "block_ms": round(dt * 1e3, 3),
           "iters_per_s": round(k / dt)}, flush=True)
    return dt


def main():
    B = 128
    settings = Settings(precision="single")
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=B, N=50, dim=3, dtype=jnp.float32)
    dt0 = block_rate(qp, settings, B, tag="baseline-450")
    qp512 = pad_qp(qp, 512, 512)
    dt1 = block_rate(qp512, settings, B, tag="padded-512")
    print({"speedup_450_over_512": round(dt1 / dt0, 3)}, flush=True)


if __name__ == "__main__":
    main()
