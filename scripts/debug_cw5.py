"""Test dual-based active-set detection on chattering CW iterates."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.models.clohessy_wiltshire import build_cw_rendezvous
from admm_library_tpu import api

rng = np.random.default_rng(0)
s0 = np.array([100.0, -1000.0, 20.0, 0.1, 0.5, -0.05])
s0[:3] += rng.uniform(-20, 20, 3)
qp, spec = build_cw_rendezvous(s0, N=20)
lam = 1.0

base = Settings(eps_abs=1e-6, eps_rel=1e-6)
qp32 = qp.astype(jnp.float32)
x0 = jnp.zeros(qp.n, jnp.float32)
z0 = jnp.zeros(qp.m, jnp.float32)
y0 = jnp.zeros(qp.m, jnp.float32)

# ground truth
sol_true = api.solve(qp, base.replace(max_iter=50000))
x_true = np.asarray(sol_true.x, np.float64)
kink_true = np.abs(x_true) <= 1e-8

A = np.asarray(qp.A, np.float64)
P = np.asarray(qp.P, np.float64)
q = np.asarray(qp.q, np.float64)
l = np.asarray(qp.l, np.float64)
T = A[:6]
rhs = l[:6]

for it_cap in (500, 1000, 2000):
    s32 = api._s32_of(base).replace(max_iter=it_cap)
    sol32 = api._phase_jit(qp32, x0, z0, y0, s32, "inv")
    y = np.asarray(sol32.y, np.float64)
    y_l1 = y[6:]
    # dual classification: kink if |y| < lam*(1-tol)
    for tol in (0.3, 0.1, 0.03, 0.01):
        kink = np.abs(y_l1) < lam * (1.0 - tol)
        agree = int(np.sum(kink == kink_true))
        print(f"it={it_cap:5d} tol={tol:5.2f}: kink agree {agree}/60 "
              f"(true kinks {int(kink_true.sum())})")
    # solve reduced LP given the dual-detected set at tol=0.1
    kink = np.abs(y_l1) < lam * (1.0 - 0.1)
    sgn = np.sign(y_l1)
    free = ~kink
    nf = int(free.sum())
    # vars: x_free; constraints: T_free x_free = rhs; objective:
    # 0.5 x'Px + (q + lam*sgn)'x on free vars
    Tf = T[:, free]
    Pf = P[np.ix_(free, free)]
    gf = (q + lam * np.concatenate([np.zeros(0), sgn]) @ A[6:])[free] \
        if False else (q[free] + lam * sgn[free])
    # KKT: [Pf Tf'; Tf 0] [xf; nu] = [-gf; rhs]
    K = np.block([[Pf, Tf.T], [Tf, np.zeros((6, 6))]])
    b = np.concatenate([-gf, rhs])
    try:
        sol = np.linalg.solve(K, b)
        xf = sol[:nf]
        x_hat = np.zeros(qp.n)
        x_hat[free] = xf
        err = np.max(np.abs(x_hat - x_true))
        r_p = np.max(np.abs(T @ x_hat - rhs))
        print(f"  reduced-KKT: nf={nf} |x-x*|={err:.2e} r_p={r_p:.2e}")
    except np.linalg.LinAlgError as e:
        print("  reduced-KKT singular:", e)

# inspect the dual on L1 rows
s32 = api._s32_of(base).replace(max_iter=2000)
sol32 = api._phase_jit(qp32, x0, z0, y0, s32, "inv")
y_l1 = np.asarray(sol32.y, np.float64)[6:]
idx_true = np.where(~kink_true)[0]
print("|y| on true-smooth rows:", np.abs(y_l1)[idx_true])
print("max |y| on true-kink rows:",
      np.max(np.abs(y_l1)[kink_true]))
print("sorted |y| top 12:", np.sort(np.abs(y_l1))[::-1][:12])
y_t = np.asarray(sol_true.y, np.float64)[6:]
print("TRUE dual |y| on smooth rows:", np.abs(y_t)[idx_true])
print("TRUE max |y| on kink rows:", np.max(np.abs(y_t)[kink_true]))
