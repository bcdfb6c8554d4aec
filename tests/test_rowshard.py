"""Row-sharded single-problem solver — P3 (SURVEY.md §2.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_library_tpu import Settings, Status, solve
from admm_library_tpu.models.random_qp import random_box_qp
from admm_library_tpu.parallel.batch import make_data_mesh
from admm_library_tpu.parallel.rowshard import solve_rowsharded


def test_rowsharded_matches_single():
    qp = random_box_qp(jax.random.key(21), n=32, m=64, dtype=jnp.float64)
    mesh = make_data_mesh(8)
    s = Settings(eps_abs=1e-8, eps_rel=1e-8, precision="single",
                 adaptive_rho=False)
    sol = solve_rowsharded(qp, mesh, s)
    assert int(sol.status) == int(Status.SOLVED)
    ref = solve(qp, Settings(eps_abs=1e-9, eps_rel=1e-9))
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-5)
    # Assembled z matches A x.
    np.testing.assert_allclose(
        np.asarray(qp.A) @ np.asarray(sol.x), sol.z, atol=1e-6)


def test_rowsharded_rejects_straddling_soc():
    from admm_library_tpu.problem import ConeSpec, QPData
    n, m = 16, 16
    cone = ConeSpec(m_box=6, soc_dims=(5, 5))
    qp = QPData(
        P=jnp.eye(n, dtype=jnp.float64),
        q=jnp.zeros(n, dtype=jnp.float64),
        A=jnp.eye(m, n, dtype=jnp.float64),
        l=jnp.full(m, -jnp.inf, dtype=jnp.float64),
        u=jnp.full(m, jnp.inf, dtype=jnp.float64),
        lam=jnp.zeros(0, dtype=jnp.float64), cone=cone)
    mesh = make_data_mesh(8)
    with pytest.raises(ValueError):
        solve_rowsharded(qp, mesh, Settings())
