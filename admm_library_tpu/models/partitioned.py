"""Horizon-partitioned problem builders for consensus ADMM (P2 input).

Splits a horizon-N optimal-control problem into B contiguous blocks in
the layout `parallel.consensus` expects: every block carries a duplicated
copy of its LEFT boundary state, local dynamics/bound rows, and edge rows
reading the boundary copies. See parallel/consensus.py for the math.

Variable layout per block (S = N // B steps):
    x_b = [ sL (ns) | u_0 (nu), s_1 (ns) | ... | u_{S-1}, s_S ]
Row layout per block ([local | left-edge | right-edge]):
    dynamics equalities   S*ns rows   s_{j+1} - F s_j - G u_j = 0
    control bounds        S*nu rows   |u_j| <= u_max
    left-edge rows        ns          read sL      (block 0: == s0)
    right-edge rows       ns          read s_S     (block B-1: == s_target)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..parallel.consensus import ConsensusSpec
from ..problem import ConeSpec, QPData
from .double_integrator import MPCSpec, dynamics_matrices


def partition_mpc(s0, s_target, N: int, n_blocks: int, dim: int = 3,
                  dt: float = 1.0, u_max: float = 1.0,
                  state_reg: float = 1e-8, dtype=jnp.float32):
    """Block-partitioned double-integrator rendezvous MPC.

    Returns (block-stacked QPData with leading (B,) axis, ConsensusSpec,
    MPCSpec). Equivalent to models.double_integrator.build_mpc_qp on the
    same horizon (tests assert agreement through the consensus solver).
    """
    if N % n_blocks != 0:
        raise ValueError(f"N={N} not divisible by n_blocks={n_blocks}")
    S = N // n_blocks
    spec_mpc = MPCSpec(N=N, dim=dim, dt=dt)
    ns, nu = spec_mpc.ns, spec_mpc.nu
    F, G = dynamics_matrices(spec_mpc)
    s0 = np.asarray(s0, np.float64)
    s_t = np.asarray(s_target, np.float64)

    nb = ns + S * (nu + ns)
    m_dyn = S * ns
    m_u = S * nu
    m_local = m_dyn + m_u
    mb = m_local + 2 * ns

    def s_idx(j):
        """Variable offset of state s_j inside a block (j=0 -> sL)."""
        return 0 if j == 0 else ns + (j - 1) * (nu + ns) + nu

    def u_idx(j):
        return ns + j * (nu + ns)

    # --- shared per-block structure (identical across blocks) ---
    A = np.zeros((mb, nb))
    for j in range(S):
        r = j * ns
        A[r:r + ns, s_idx(j + 1):s_idx(j + 1) + ns] = np.eye(ns)
        A[r:r + ns, s_idx(j):s_idx(j) + ns] = -F
        A[r:r + ns, u_idx(j):u_idx(j) + nu] = -G
    for j in range(S):
        r = m_dyn + j * nu
        A[r:r + nu, u_idx(j):u_idx(j) + nu] = np.eye(nu)
    A[m_local:m_local + ns, :ns] = np.eye(ns)               # left edge
    A[m_local + ns:, s_idx(S):s_idx(S) + ns] = np.eye(ns)   # right edge

    Pd = np.full(nb, state_reg)
    for j in range(S):
        Pd[u_idx(j):u_idx(j) + nu] = 1.0
    P = np.diag(Pd)
    q = np.zeros(nb)

    l = np.zeros(mb)
    u = np.zeros(mb)
    l[:m_dyn] = 0.0
    u[:m_dyn] = 0.0
    l[m_dyn:m_local] = -u_max
    u[m_dyn:m_local] = u_max
    l[m_local:] = -np.inf
    u[m_local:] = np.inf

    B = n_blocks
    Ab = np.broadcast_to(A, (B, mb, nb)).copy()
    Pb = np.broadcast_to(P, (B, nb, nb)).copy()
    qb = np.broadcast_to(q, (B, nb)).copy()
    lb = np.broadcast_to(l, (B, mb)).copy()
    ub = np.broadcast_to(u, (B, mb)).copy()
    # Global end conditions live in the edge-row bounds of the end blocks.
    lb[0, m_local:m_local + ns] = s0
    ub[0, m_local:m_local + ns] = s0
    lb[B - 1, m_local + ns:] = s_t
    ub[B - 1, m_local + ns:] = s_t

    cone = ConeSpec(m_box=m_local)
    qp = QPData(
        P=jnp.asarray(Pb, dtype), q=jnp.asarray(qb, dtype),
        A=jnp.asarray(Ab, dtype), l=jnp.asarray(lb, dtype),
        u=jnp.asarray(ub, dtype),
        lam=jnp.zeros((B, 0), dtype), cone=cone)
    spec = ConsensusSpec(
        n_blocks=B, nb=nb, m_local=m_local, ns=ns, cone=cone)
    return qp, spec, spec_mpc


def partition_mpc_mc(key, batch: int, s0_nominal, s_target, N: int,
                     n_blocks: int, dim: int = 3, sigma_pos: float = 0.1,
                     sigma_vel: float = 0.01, dtype=jnp.float32, **kw):
    """Scenario-batched partitioned MPC for consensus_solve_mc (M6 x P2).

    Returns (QPData with l/u of shape (batch, n_blocks, mb) and shared
    per-block P/A/q, ConsensusSpec, MPCSpec, s0 batch). Only block 0's
    left-edge rows depend on the dispersed initial state.
    """
    from .monte_carlo import disperse_s0

    qp, spec, mpc = partition_mpc(
        s0_nominal, s_target, N=N, n_blocks=n_blocks, dim=dim,
        dtype=dtype, **kw)
    s0s = disperse_s0(key, jnp.asarray(s0_nominal, dtype),
                      sigma_pos, sigma_vel, batch, dtype)
    B = batch
    l = jnp.broadcast_to(qp.l, (B,) + qp.l.shape)
    u = jnp.broadcast_to(qp.u, (B,) + qp.u.shape)
    ml = spec.m_local
    l = l.at[:, 0, ml:ml + spec.ns].set(s0s)
    u = u.at[:, 0, ml:ml + spec.ns].set(s0s)
    qp_mc = QPData(P=qp.P, q=qp.q, A=qp.A, l=l, u=u, lam=qp.lam,
                   cone=qp.cone)
    return qp_mc, spec, mpc, s0s


def assemble_trajectory(spec: ConsensusSpec, mpc: MPCSpec, x_blocks):
    """Stitch per-block solutions into global (controls (N, nu),
    states (N+1, ns)) using each block's owned variables."""
    B = spec.n_blocks
    S = mpc.N // B
    ns, nu = mpc.ns, mpc.nu
    us, ss = [], []
    xb = np.asarray(x_blocks)
    ss.append(xb[0, :ns])                   # global s0 (block 0's left copy)
    for b in range(B):
        off = ns
        for j in range(S):
            us.append(xb[b, off:off + nu])
            ss.append(xb[b, off + nu:off + nu + ns])
            off += nu + ns
    return np.stack(us), np.stack(ss)
