"""Persistent store for learned group-count capacities.

The adaptive grouping capacity (executor: fused general groups) is learned
by a count-only calibration run and normally lives in the in-process stage
cache. Persisting it beside the XLA compile cache lets a FRESH process skip
the calibration program AND the capacity rebuild entirely — the first trace
already uses the tight capacity whose executable the persistent compile
cache holds, cutting multi-minute warmups to one cached trace (reference
analogue: the object cache keyed on IR, LLVMBackends.cpp:81-460; here the
learned runtime statistic is part of the program's identity)."""

from __future__ import annotations

import json
import os
import threading

_lock = threading.Lock()
_loaded: dict | None = None
_path: str | None = None


def _store_path() -> str | None:
    global _path
    if _path is not None:
        return _path
    try:
        import jax

        d = jax.config.jax_compilation_cache_dir
        if not d:
            return None
        _path = os.path.join(os.path.dirname(d), "capacities.json")
        return _path
    except Exception:
        return None


def _load() -> dict:
    global _loaded
    if _loaded is None:
        p = _store_path()
        try:
            _loaded = json.load(open(p)) if p and os.path.exists(p) else {}
        except Exception:
            _loaded = {}
    return _loaded


def get(key: str):
    with _lock:
        return _load().get(key)


def put(key: str, kg) -> None:
    """kg: an int capacity or any JSON-serializable learned statistic
    (e.g. the per-join-step survivor counts dict)."""
    with _lock:
        d = _load()
        if d.get(key) == kg:
            return
        d[key] = int(kg) if isinstance(kg, (int, float)) else kg
        p = _store_path()
        if not p:
            return
        try:
            # re-read + merge: concurrent sessions sharing one cache dir
            # write different keys; a stale in-memory snapshot must not
            # discard their calibrations (ours wins only on key conflicts)
            if os.path.exists(p):
                try:
                    disk = json.load(open(p))
                    disk.update(d)
                    d.clear()
                    d.update(disk)
                except (OSError, ValueError):
                    pass
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(d, f)
            os.replace(tmp, p)
        except OSError:
            pass
