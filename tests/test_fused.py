"""Fused Pallas iteration kernel vs reference XLA body (SURVEY.md K3/A1).

Interpret mode on CPU: identical math path as the TPU kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import fused, kkt
from admm_library_tpu.problem import ConeSpec, QPData


def _setup(qp, settings):
    qps, scaling = ruiz_equilibrate(qp, settings.scaling_iters)
    eq = admm.is_equality_row_shared(qps)
    rho_vec = admm.rho_vec_of(
        jnp.asarray(settings.rho, qps.dtype), eq, settings)
    fac = kkt.factor_condensed(qps.P, qps.A, settings.sigma, rho_vec, "inv")
    return qps, rho_vec, fac


def test_fused_matches_xla_box():
    settings = Settings(precision="single", refine_steps=1)
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.key(0), batch=4, N=6, dim=2, dtype=jnp.float32)
    qps, rho_vec, fac = _setup(qp, settings)
    B = 4
    x = jnp.zeros((B, qps.n), jnp.float32)
    z = jnp.zeros((B, qps.m), jnp.float32)
    y = jnp.zeros((B, qps.m), jnp.float32)
    k = 10
    xr, zr, yr = admm.iterate_block(
        qps, fac, x, z, y, rho_vec, settings, "inv", k)
    xf, zf, yf = fused.fused_iterate_shared(
        qps.A, fac["Minv"], fac["M"], qps.q, rho_vec, qps.lam,
        qps.l, qps.u, x, z, y, cone=qps.cone, sigma=settings.sigma,
        alpha=settings.alpha, k=k, refine_steps=settings.refine_steps,
        interpret=True)
    np.testing.assert_allclose(xf, xr, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(zf, zr, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(yf, yr, rtol=1e-5, atol=1e-6)


def test_fused_matches_xla_l1_soc():
    """Mixed cone: box + bounded L1 + uniform SOC blocks."""
    rng = np.random.default_rng(3)
    n, mb, ml, nsoc, d = 20, 8, 6, 3, 4
    m = mb + ml + nsoc * d
    cone = ConeSpec(m_box=mb, m_l1=ml, soc_dims=(d,) * nsoc)
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    R = rng.standard_normal((n, n)) / np.sqrt(n)
    P = jnp.asarray(R @ R.T + 0.5 * np.eye(n), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    l = np.full(m, -np.inf)
    u = np.full(m, np.inf)
    l[:mb] = -1.0
    u[:mb] = 1.0
    l[mb:mb + ml] = -0.7
    u[mb:mb + ml] = 0.7
    qp = QPData(P=P, q=q, A=A, l=jnp.asarray(l, jnp.float32),
                u=jnp.asarray(u, jnp.float32),
                lam=jnp.full((ml,), 0.3, jnp.float32), cone=cone)
    settings = Settings(precision="single", refine_steps=1)
    qps, rho_vec, fac = _setup(qp, settings)
    B = 3
    key = jax.random.key(1)
    x = jax.random.normal(key, (B, n), jnp.float32)
    z = jnp.zeros((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)
    k = 7
    xr, zr, yr = admm.iterate_block(
        qps, fac, x, z, y, rho_vec, settings, "inv", k)
    xf, zf, yf = fused.fused_iterate_shared(
        qps.A, fac["Minv"], fac["M"], qps.q, rho_vec, qps.lam,
        qps.l, qps.u, x, z, y, cone=qps.cone, sigma=settings.sigma,
        alpha=settings.alpha, k=k, refine_steps=settings.refine_steps,
        interpret=True)
    np.testing.assert_allclose(xf, xr, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(zf, zr, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yf, yr, rtol=1e-4, atol=1e-5)
