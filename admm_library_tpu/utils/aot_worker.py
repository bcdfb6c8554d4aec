"""AOT export worker: runs CPU-forced, exports a solver program for the
TPU platform, writes the serialized artifact (see aot.py).

Invoked as: python -m admm_library_tpu.utils.aot_worker <out_path>
with a pickled {"name", "params", "avals"} spec on stdin.

BUILDERS maps a program name + JSON params to a jittable callable; both
the worker (export) and the fallback inline path (aot.call) use it, so
the math is defined exactly once.
"""
from __future__ import annotations

import os
import pickle
import sys


def build(name: str, params: dict):
    """Reconstruct the jittable program for (name, params)."""
    import jax
    from ..settings import Settings

    if name == "solve_phase":
        from ..api import _solve_one_phase
        settings = Settings(**params["settings"])
        backend = params["backend"]

        def fn(qp, x0, z0, y0):
            return _solve_one_phase(qp, x0, z0, y0, settings, backend)

        return jax.jit(fn)

    if name == "solve_phase_off":
        from ..api import _solve_one_phase
        settings = Settings(**params["settings"])
        backend = params["backend"]

        def fn(qp, x0, z0, y0, z_off):
            return _solve_one_phase(qp, x0, z0, y0, settings, backend,
                                    z_off=z_off)

        return jax.jit(fn)

    if name == "polish":
        from ..core.polish import polish

        def fn(qp64, sol):
            return polish(qp64, sol, params["eps_abs"], params["eps_rel"],
                          act_tol=params["act_tol"])

        return jax.jit(fn)

    if name == "batch_shared":
        from ..parallel.batch import _solve_shared_core
        settings = Settings(**params["settings"])
        backend = params["backend"]

        def fn(qp, x0, z0, y0):
            return _solve_shared_core(qp, x0, z0, y0, settings, backend)

        return jax.jit(fn)

    raise KeyError(f"unknown AOT builder {name!r}")


def main() -> None:
    out_path = sys.argv[1]
    spec = pickle.loads(sys.stdin.buffer.read())

    import jax
    jax.config.update("jax_platforms", "cpu")
    # x64 must be on before the package import finalises dtypes.
    import admm_library_tpu  # noqa: F401  (enables x64, registers pytrees)

    fn = build(spec["name"], spec["params"])
    exported = jax.export.export(fn, platforms=["tpu"])(*spec["avals"])
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)


if __name__ == "__main__":
    main()
