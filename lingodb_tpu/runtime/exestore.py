"""Persistent store for SERIALIZED compiled executables — the trace-skip
layer.

The XLA persistent compilation cache (``.cache/xla``) removes recompiles,
but a fresh process still pays the Python TRACE of every fused program
(~30-90 s per program at 60M-row shapes, the dominant warm-cache warmup
term measured in round 4). This store persists the PJRT executable itself
(``jax.experimental.serialize_executable``) plus the engine's finish
metadata, keyed on the stage cache key, argument signature, and every knob
that shapes the traced program. A hit deserializes and runs in ~0.2 s:
no parse of the compute graph, no trace, no XLA invocation.

This is the true analogue of the reference's ORC JIT object cache
(src/execution/LLVMBackends.cpp:81-460): LingoDB caches the compiled
object for an IR module; here the "IR identity" is the plan key + data
versions + learned capacities, and the object is the PJRT executable.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

FORMAT_VERSION = 2

_lock = threading.Lock()


def _dir() -> str | None:
    try:
        import jax

        if jax.devices()[0].platform == "cpu":
            # the CPU PJRT backend's deserialized executables fail at
            # dispatch ("Function wrapped_iota not found": host callbacks
            # are not captured), and the failure is ASYNC — it surfaces at
            # the next sync, past any guard. TPU executables round-trip.
            return None
        d = jax.config.jax_compilation_cache_dir
        if not d:
            return None
        return os.path.join(os.path.dirname(d), "exe")
    except Exception:
        return None


def make_key(material) -> str:
    """Stable key over every input that shapes the traced program: the
    stage key (plan + versions), argument shapes/dtypes, learned
    capacities, kernel policy knobs, platform, and library versions."""
    import jax

    base = repr((FORMAT_VERSION, material, jax.__version__,
                 jax.devices()[0].platform,
                 getattr(jax.devices()[0], "device_kind", "")))
    return hashlib.sha256(base.encode()).hexdigest()


def get(key: str):
    """(compiled, meta) on a hit, else None. Any failure (foreign runtime,
    corrupted entry, incompatible PJRT) is a miss — the caller compiles
    fresh and overwrites."""
    d = _dir()
    if d is None:
        return None
    path = os.path.join(d, key + ".pkl")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload = pickle.load(f)
        compiled = se.deserialize_and_load(*payload["exe"])
        return compiled, payload["meta"]
    except Exception:
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def put(key: str, compiled, meta) -> None:
    d = _dir()
    if d is None:
        return
    try:
        from jax.experimental import serialize_executable as se

        blob = se.serialize(compiled)
        payload = {"exe": blob, "meta": meta}
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, key + ".pkl")
        with _lock:
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f)
            os.replace(tmp, path)
    except Exception as e:  # best-effort: the in-process path still works
        import sys

        print(f"# exestore put failed: {type(e).__name__}: {str(e)[:120]}",
              file=sys.stderr)
