"""Block-tridiagonal Cholesky for MPC-banded KKT systems (K2, SURVEY.md §2.2).

MPC problems over a horizon of N steps (states+controls interleaved per
step) give a condensed matrix M = P + sigma I + Aᵀ rho A that is block
tridiagonal with a fixed block size b: factoring it costs O(N b³) instead
of O((N b)³), and the factor/solve recursions are `lax.scan`s over the
horizon — fully static shapes, the idiomatic XLA form (SURVEY.md §7 "hard
parts": scan-based block elimination). The scan-over-blocks interface is
also the on-chip analog of the P2 time-partitioned consensus layout.

Factorisation: M = L Lᵀ with L block lower-bidiagonal,
    L_0 L_0ᵀ = D_0
    C_i   = B_i L_iᵂ⁻ᵀ                (off-diag factor block)
    L_{i+1} L_{i+1}ᵀ = D_{i+1} - C_i C_iᵀ
where D_i are the diagonal blocks and B_i the sub-diagonal blocks of M.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .. import xprec


def dense_to_block_tridiag(M, b: int):
    """Extract (diag, lower) blocks from a dense block-tridiagonal matrix.

    M: (n, n) with n = N*b. Returns diag (N, b, b), lower (N-1, b, b) where
    lower[i] = M[(i+1)b:(i+2)b, ib:(i+1)b]. Entries of M outside the band
    are ignored (asserted small in tests).
    """
    n = M.shape[-1]
    if n % b != 0:
        raise ValueError(f"matrix dim {n} not divisible by block size {b}")
    N = n // b
    blocks = M.reshape(N, b, N, b).transpose(0, 2, 1, 3)   # (N, N, b, b)
    idx = jnp.arange(N)
    diag = blocks[idx, idx]
    low = blocks[idx[1:], idx[:-1]]
    return diag, low


def block_tridiag_cholesky(diag, low):
    """Factor a block-tridiagonal SPD matrix via a forward `lax.scan`.

    diag: (N, b, b), low: (N-1, b, b). Returns (Ld, Ll):
      Ld (N, b, b) lower-triangular diagonal blocks of L,
      Ll (N-1, b, b) dense sub-diagonal blocks C_i of L.
    """
    L0 = jnp.linalg.cholesky(diag[0])

    def step(L_prev, blocks):
        B, D = blocks
        # C = B L_prevᵀ⁻¹  ->  Cᵀ = L_prev⁻¹ Bᵀ
        C = solve_triangular(L_prev, B.T, lower=True).T
        S = D - xprec.matmul(C, C.T)
        L = jnp.linalg.cholesky(S)
        return L, (C, L)

    _, (Ll, Ld_rest) = jax.lax.scan(step, L0, (low, diag[1:]))
    Ld = jnp.concatenate([L0[None], Ld_rest], axis=0)
    return Ld, Ll


def block_tridiag_solve(Ld, Ll, rhs):
    """Solve (L Lᵀ) x = rhs given block factors; rhs (..., N*b) batched.

    Forward substitution scan then backward substitution scan; the batch
    rides along as the trailing dimension of each (b, K) triangular solve.
    """
    N, b, _ = Ld.shape
    batch_shape = rhs.shape[:-1]
    K = 1
    for s in batch_shape:
        K *= s
    r = rhs.reshape(K, N, b)
    r = jnp.moveaxis(r, 1, 0)            # (N, K, b)

    # Forward: y_0 = L_0⁻¹ r_0 ; y_i = L_i⁻¹ (r_i - C_{i-1} y_{i-1})
    y0 = solve_triangular(Ld[0], r[0].T, lower=True).T

    def fwd(y_prev, inp):
        L, C, ri = inp
        t = ri - xprec.matmul(y_prev, C.T)
        y = solve_triangular(L, t.T, lower=True).T
        return y, y

    _, y_rest = jax.lax.scan(fwd, y0, (Ld[1:], Ll, r[1:]))
    y = jnp.concatenate([y0[None], y_rest], axis=0)    # (N, K, b)

    # Backward: x_{N-1} = L_{N-1}⁻ᵀ y_{N-1} ; x_i = L_i⁻ᵀ (y_i - C_iᵀ x_{i+1})
    xN = solve_triangular(Ld[-1], y[-1].T, lower=True, trans=1).T

    def bwd(x_next, inp):
        L, C, yi = inp
        t = yi - xprec.matmul(x_next, C)
        x = solve_triangular(L, t.T, lower=True, trans=1).T
        return x, x

    _, x_rest = jax.lax.scan(
        bwd, xN, (Ld[:-1], Ll, y[:-1]), reverse=True)
    x = jnp.concatenate([x_rest, xN[None]], axis=0)    # (N, K, b)

    x = jnp.moveaxis(x, 0, 1).reshape(batch_shape + (N * b,))
    return x
