"""AOT program cache — trace once, run everywhere (SURVEY.md §5 infra).

On this TPU runtime (remote PJRT tunnel), TRACING a solver program costs
minutes — every trace-time backend interaction is a round trip — while
the same trace on a CPU-backed process takes ~1 s. jax.export supports
cross-platform lowering, so we:

  1. key each program by (builder name, params, arg avals, versions);
  2. build missing artifacts in a short-lived CPU-forced SUBPROCESS that
     exports the program with platforms=["tpu", "cpu"] and writes the
     serialized StableHLO under .jax_cache/aot/;
  3. deserialize in the live process and call it — the only trace left
     is the tiny call_exported wrapper, and the XLA executable itself is
     covered by JAX's persistent compilation cache.

Set ADMM_TPU_NO_AOT=1 to disable (falls back to in-process tracing).
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import pickle
import subprocess
import sys

import jax

_MEM: dict = {}


def cache_dir() -> str:
    base = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    d = os.path.join(base, "aot")
    os.makedirs(d, exist_ok=True)
    return d


def enabled() -> bool:
    if os.environ.get("ADMM_TPU_NO_AOT"):
        return False
    if not hasattr(jax, "export"):
        return False
    # Only worth it when the live backend is the slow remote TPU; on CPU
    # the in-process trace is already fast.
    return jax.default_backend() == "tpu"


def target_platform() -> str:
    """Platform the program will EXECUTE on (respected by trace-time
    branches like the fused-kernel interpret switch, which must follow
    the target, not the tracing host)."""
    return os.environ.get("ADMM_TARGET_PLATFORM", jax.default_backend())


def _avals_of(args):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jax.numpy.shape(a),
                                       jax.numpy.result_type(a)), args)


_SRC_HASH: str | None = None


def _source_hash() -> str:
    """Content hash of every .py in the package, so an artifact can
    never outlive the solver code that produced it (a version string
    only invalidates when someone remembers to bump it)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import admm_library_tpu
        root = os.path.dirname(os.path.abspath(admm_library_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _key(name: str, params: dict, avals) -> str:
    leaves, treedef = jax.tree.flatten(avals)
    sig = json.dumps([
        name, params,
        [[list(l.shape), str(l.dtype)] for l in leaves], str(treedef),
        jax.__version__, _source_hash(),
    ], sort_keys=True)
    return hashlib.sha256(sig.encode()).hexdigest()[:24]


def _build_artifact(name: str, params: dict, avals, path: str) -> None:
    """Export in a CPU-forced subprocess; atomic write to `path`."""
    spec = pickle.dumps({"name": name, "params": params, "avals": avals})
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ADMM_TARGET_PLATFORM"] = "tpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # The remote-TPU PJRT plugin registers itself from sitecustomize when
    # these are set, and its tunnel is single-tenant: a worker dialing it
    # while the parent holds the device BLOCKS FOREVER. Strip the
    # triggers so the worker is a pure-CPU tracing process.
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            env.pop(k)
    proc = subprocess.run(
        [sys.executable, "-m", "admm_library_tpu.utils.aot_worker",
         path + ".tmp"],
        input=spec, env=env, capture_output=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(
            f"AOT export worker failed for {name}: "
            f"{proc.stderr.decode()[-2000:]}")
    os.replace(path + ".tmp", path)


def call(name: str, params: dict, args):
    """Run builder `name` (see BUILDERS in aot_worker) on `args` through
    the AOT cache. Falls back to direct in-process execution on any
    export failure."""
    from . import aot_worker

    if not enabled():
        return aot_worker.build(name, params)(*args)

    avals = _avals_of(args)
    key = _key(name, params, avals)
    hit = _MEM.get(key)
    if hit is None:
        path = os.path.join(cache_dir(), key + ".jaxexp")
        if not os.path.exists(path):
            try:
                _build_artifact(name, params, avals, path)
            except Exception as e:
                import warnings
                warnings.warn(f"AOT export failed ({e}); tracing inline")
                fn = aot_worker.build(name, params)
                _MEM[key] = ("inline", fn)
                return fn(*args)
        with open(path, "rb") as f:
            exported = jax.export.deserialize(f.read())
        _MEM[key] = ("exported", jax.jit(exported.call))
    kind, fn = _MEM[key]
    return fn(*args)
