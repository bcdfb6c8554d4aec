"""Consensus-MC iteration-count sweep (VERDICT r2 item 3).

Iteration counts are algorithm properties, not hardware properties, so
the sweep runs on CPU with a small scenario batch; the winning settings
get validated on the chip by the bench. Sweeps the edge-row penalty
scale (rho_edge_scale), over-relaxation alpha, and restart cadence.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.models.partitioned import partition_mpc_mc
from admm_library_tpu.parallel.consensus_mc import consensus_solve_mc
from admm_library_tpu.parallel.runtime import make_mesh


def main():
    batch, N, n_blocks = 32, 50, 10
    mesh = make_mesh(data=1, horizon=1)
    rng = np.random.default_rng(0)
    s0 = np.concatenate([rng.uniform(-2, 2, 3), rng.uniform(-0.2, 0.2, 3)])
    qp, spec, mpc, _ = partition_mpc_mc(
        jax.random.PRNGKey(0), batch, s0, np.zeros(6), N=N,
        n_blocks=n_blocks, dim=3)
    base = Settings(eps_abs=1e-6, eps_rel=1e-6)

    variants = {}
    for es in (20.0, 30.0, 50.0):
        variants[f"edge={es:g}"] = base.replace(rho_edge_scale=es)
        variants[f"edge={es:g},a=1.8"] = base.replace(rho_edge_scale=es,
                                                      alpha=1.8)
    variants["edge=30,rho=0.3"] = base.replace(rho_edge_scale=30.0,
                                               rho=0.3)
    variants["edge=30,restart=400"] = base.replace(rho_edge_scale=30.0,
                                                   restart_every=400)
    variants["edge=30,chk=50"] = base.replace(rho_edge_scale=30.0,
                                              check_every=50)

    for name, s in variants.items():
        sol = consensus_solve_mc(qp, spec, mesh, s)
        it = int(np.max(np.asarray(sol.iters)))
        ok = bool(np.all(np.asarray(sol.status) == 1))
        print(f"{name:22s} lockstep_iters={it:6d} solved={ok} "
              f"rp={float(np.max(np.asarray(sol.r_prim))):.2e} "
              f"rd={float(np.max(np.asarray(sol.r_dual))):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
