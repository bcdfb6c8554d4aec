"""Prototype: does restarted-averaging fix the CW LP chatter? numpy f64/f32."""
import os
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from admm_library_tpu.models.clohessy_wiltshire import build_cw_rendezvous

rng = np.random.default_rng(0)
s0 = np.array([100.0, -1000.0, 20.0, 0.1, 0.5, -0.05])
s0[:3] += rng.uniform(-20, 20, 3)
qp, spec = build_cw_rendezvous(s0, N=20)

A = np.asarray(qp.A, np.float64)
P = np.asarray(qp.P, np.float64)
q = np.asarray(qp.q, np.float64)
l = np.asarray(qp.l, np.float64)
u = np.asarray(qp.u, np.float64)
lam = 1.0
m, n = A.shape
mb = 6

def prox(v, rho_vec):
    z = v.copy()
    z[:mb] = np.clip(v[:mb], l[:mb], u[:mb])
    t = lam / rho_vec[mb:]
    s = v[mb:]
    z[mb:] = np.clip(np.sign(s) * np.maximum(np.abs(s) - t, 0),
                     l[mb:], u[mb:])
    return z

def run(rho=3.34, eq=100.0, sigma=1e-5, alpha=1.6, iters=20000,
        restart_every=0, dtype=np.float64, eps=1e-6):
    rho_vec = np.full(m, rho)
    rho_vec[:mb] *= eq
    M = P + sigma * np.eye(n) + A.T * rho_vec @ A
    Minv = np.linalg.inv(M).astype(dtype)
    Ad = A.astype(dtype)
    x = np.zeros(n, dtype); z = np.zeros(m, dtype); y = np.zeros(m, dtype)
    sx = np.zeros(n); sz = np.zeros(m); sy = np.zeros(m); cnt = 0
    best = np.inf
    for it in range(1, iters + 1):
        rhs = (sigma * x - q + Ad.T @ (rho_vec * z - y)).astype(dtype)
        xt = Minv @ rhs
        zt = Ad @ xt
        xn = alpha * xt + (1 - alpha) * x
        w = alpha * zt + (1 - alpha) * z
        v = w + y / rho_vec
        zn = prox(v.astype(np.float64), rho_vec).astype(dtype)
        yn = (y + rho_vec * (w - zn)).astype(dtype)
        x, z, y = xn.astype(dtype), zn, yn
        sx += x; sz += z; sy += y; cnt += 1
        if it % 25 == 0:
            rp = np.max(np.abs(Ad @ x - z))
            rd = np.max(np.abs(P @ x + q + Ad.T @ y))
            if rp < eps and rd < eps:
                return it, rp, rd
            best = min(best, rp)
        if restart_every and it % restart_every == 0:
            x = (sx / cnt).astype(dtype)
            z = (sz / cnt).astype(dtype)
            y = (sy / cnt).astype(dtype)
            sx[:] = 0; sz[:] = 0; sy[:] = 0; cnt = 0
    rp = np.max(np.abs(Ad @ x - z))
    rd = np.max(np.abs(P @ x + q + Ad.T @ y))
    return -iters, rp, rd

for tag, kw in [
    ("f64 plain", dict()),
    ("f64 restart200", dict(restart_every=200)),
    ("f64 restart500", dict(restart_every=500)),
    ("f32 plain", dict(dtype=np.float32, eps=1e-4)),
    ("f32 restart100", dict(dtype=np.float32, eps=1e-4, restart_every=100)),
    ("f32 restart200", dict(dtype=np.float32, eps=1e-4, restart_every=200)),
    ("f32 restart500", dict(dtype=np.float32, eps=1e-4, restart_every=500)),
    ("f32 r200 rho1", dict(dtype=np.float32, eps=1e-4, restart_every=200,
                           rho=1.0)),
    ("f32 r200 rho10", dict(dtype=np.float32, eps=1e-4, restart_every=200,
                            rho=10.0)),
]:
    it, rp, rd = run(**kw)
    print(f"{tag:18s} iters={it:7d} r_p={rp:.3e} r_d={rd:.3e}", flush=True)

# subsampled averaging: accumulate only block-end iterates (every `stride`)
def run_sub(rho=3.34, eq=100.0, sigma=1e-5, alpha=1.6, iters=20000,
            restart_every=200, stride=25, dtype=np.float64, eps=1e-6,
            if_better=False):
    rho_vec = np.full(m, rho)
    rho_vec[:mb] *= eq
    M = P + sigma * np.eye(n) + A.T * rho_vec @ A
    Minv = np.linalg.inv(M).astype(dtype)
    Ad = A.astype(dtype)
    x = np.zeros(n, dtype); z = np.zeros(m, dtype); y = np.zeros(m, dtype)
    sx = np.zeros(n); sz = np.zeros(m); sy = np.zeros(m); cnt = 0
    for it in range(1, iters + 1):
        rhs = (sigma * x - q + Ad.T @ (rho_vec * z - y)).astype(dtype)
        xt = Minv @ rhs
        zt = Ad @ xt
        xn = alpha * xt + (1 - alpha) * x
        w = alpha * zt + (1 - alpha) * z
        v = w + y / rho_vec
        zn = prox(v.astype(np.float64), rho_vec).astype(dtype)
        yn = (y + rho_vec * (w - zn)).astype(dtype)
        x, z, y = xn.astype(dtype), zn, yn
        if it % stride == 0:
            sx += x; sz += z; sy += y; cnt += 1
            rp = np.max(np.abs(Ad @ x - z))
            rd = np.max(np.abs(P @ x + q + Ad.T @ y))
            if rp < eps and rd < eps:
                return it, rp, rd
        if it % restart_every == 0 and cnt:
            xa, za, ya = sx / cnt, sz / cnt, sy / cnt
            take = True
            if if_better:
                rpa = np.max(np.abs(Ad @ xa - za))
                rda = np.max(np.abs(P @ xa + q + Ad.T @ ya))
                take = max(rpa, rda) < max(rp, rd)
            if take:
                x = xa.astype(dtype); z = za.astype(dtype)
                y = ya.astype(dtype)
            sx[:] = 0; sz[:] = 0; sy[:] = 0; cnt = 0
    return -iters, rp, rd

for tag, kw in [
    ("f64 sub25 r200", dict()),
    ("f64 sub25 r200 if_better", dict(if_better=True)),
    ("f64 sub25 r500", dict(restart_every=500)),
    ("f32 sub25 r200", dict(dtype=np.float32, eps=1e-4)),
    ("f32 sub25 r200 if_better", dict(dtype=np.float32, eps=1e-4,
                                      if_better=True)),
    ("f32 sub25 r100", dict(dtype=np.float32, eps=1e-4, restart_every=100)),
]:
    it, rp, rd = run_sub(**kw)
    print(f"{tag:26s} iters={it:7d} r_p={rp:.3e} r_d={rd:.3e}", flush=True)
