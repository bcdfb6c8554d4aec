"""Aux subsystems: checkpoint/resume, profiling, runtime (SURVEY.md §5)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings, Status, solve
from admm_library_tpu.models.random_qp import random_box_qp
from admm_library_tpu.parallel import runtime
from admm_library_tpu.utils import checkpoint, profiling


def test_checkpoint_resume_warm_start(tmp_path):
    """Resume from checkpoint = warm start; converges almost immediately
    and elastic recovery reaches the same solution (SURVEY.md §5.3)."""
    qp = random_box_qp(jax.random.key(11), n=30, m=60, dtype=jnp.float64)
    s = Settings(eps_abs=1e-9, eps_rel=0.0)
    sol = solve(qp, s)
    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save_state(path, sol)

    x0, z0, y0 = checkpoint.resume_warm_start(path)
    resumed = solve(qp, s, x0=x0, z0=z0, y0=y0)
    assert int(resumed.status) == int(Status.SOLVED)
    assert int(resumed.iters) <= 3 * s.check_every
    np.testing.assert_allclose(resumed.x, sol.x, atol=1e-6)


def test_checkpoint_atomic_overwrite(tmp_path):
    qp = random_box_qp(jax.random.key(12), n=10, m=20, dtype=jnp.float64)
    sol = solve(qp, Settings())
    path = os.path.join(tmp_path, "s.npz")
    checkpoint.save_state(path, sol)
    checkpoint.save_state(path, sol)      # overwrite in place
    st = checkpoint.load_state(path)
    assert set(st) >= {"x", "z", "y", "rho"}
    assert not os.path.exists(path + ".tmp")


def test_profiling_timed_excludes_compile():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    out, t = profiling.timed(f, x)
    assert float(out) == 64.0 * 64 * 64
    assert t < 1.0          # steady-state call, not the compile


def test_runtime_mesh_axes():
    mesh = runtime.make_mesh()
    assert mesh.axis_names == (runtime.DATA_AXIS, runtime.HORIZON_AXIS)
    assert mesh.devices.size == jax.device_count()
    mesh2 = runtime.make_mesh(horizon=2)
    assert mesh2.shape[runtime.HORIZON_AXIS] == 2
    info = runtime.describe()
    assert info["process_count"] == 1
    # initialize() without coordinator env is a safe no-op.
    runtime.initialize()
