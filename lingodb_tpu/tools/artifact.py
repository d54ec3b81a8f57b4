"""Standalone query artifacts: compile once, run anywhere (cold) without
reparse / reoptimize / recompile.

TPU-native analogue of the reference's standalone-query tool, which AOT
compiles one SQL query into a self-contained executable
(reference: tools/standalone-query/ — embeds the generated code and links the
runtime). On this substrate the expensive artifacts of "compiling a query"
are (a) the optimized logical plan and (b) the XLA executables of every
jitted stage the plan dispatches. An .lqa file packages both:

    manifest.json   query text, optimized plan JSON, builder platform,
                    catalog fingerprint (table -> version) it was built for
    xla/<hash>      serialized XLA executables, exactly the entries JAX's
                    persistent compilation cache wrote while the builder
                    executed the query once

`run_artifact` merges the packaged executables into the process's compile
cache and executes the embedded plan: the frontend and optimizer never run,
and every stage dispatch hits the cache instead of invoking the XLA
compiler. Loading requires a database with the same table versions (data may
differ only if shapes quantize identically; the manifest records versions so
staleness is detected, mirroring standalone-query's bind to a fixed schema).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import zipfile

FORMAT_VERSION = 1


def _cache_dir() -> str | None:
    import jax

    d = jax.config.jax_compilation_cache_dir
    return d if d else None


def _catalog_fingerprint(session) -> dict:
    return {name: getattr(e.storage, "version", 0)
            for name, e in sorted(session.catalog.tables.items())}


def build_artifact(session, query: str, out_path: str) -> dict:
    """Optimize `query`, execute it once to populate a fresh compile cache,
    and package plan + executables into `out_path`. Returns the manifest."""
    import jax

    from ..opt.optimizer import optimize
    from ..plan.serial import plan_to_json
    from ..sql.binder import Binder
    from ..sql.parser import parse_sql

    stmts = parse_sql(query)
    plan = optimize(Binder(session.catalog).bind_query(stmts[-1]),
                    session.catalog)
    # round-trip through JSON *text*: run_artifact executes the decoded form
    # (tuples->lists, int keys->str), which must hash identically at capture
    plan_json = json.loads(json.dumps(plan_to_json(plan)))

    # run once with the persistent cache redirected to a scratch dir: the
    # entries written there are exactly this query's executables
    old_dir = _cache_dir()
    scratch = tempfile.mkdtemp(prefix="lqa_build_")
    try:
        jax.config.update("jax_compilation_cache_dir", scratch)
        # drop in-process executables (anything compiled earlier in this
        # process — e.g. upload packers — would silently not be captured)
        jax.clear_caches()
        session.stage_cache.clear()
        # re-upload scan columns during capture: the upload packers must be
        # part of the artifact (a cold process compiles them otherwise)
        session._device_cache.clear()
        # execute the JSON round-tripped plan — the exact object run_artifact
        # will execute; the pre-serialization plan can hash differently
        session.run_plan(plan_json)
        entries = sorted(os.listdir(scratch))
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)

    manifest = {
        "format": FORMAT_VERSION,
        "query": query,
        "plan": plan_json,
        "platform": jax.devices()[0].platform,
        "catalog": _catalog_fingerprint(session),
        "built_unix": time.time(),
        "n_executables": len(entries),
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("manifest.json", json.dumps(manifest))
        for name in entries:
            z.write(os.path.join(scratch, name), f"xla/{name}")
    shutil.rmtree(scratch, ignore_errors=True)
    return manifest


def load_manifest(path: str) -> dict:
    with zipfile.ZipFile(path) as z:
        return json.loads(z.read("manifest.json"))


def run_artifact(session, path: str, strict: bool = True):
    """Execute a packaged query against `session`'s database. Seeds the
    process compile cache from the artifact, then runs the embedded plan —
    no parse, no optimizer, and (same platform) no XLA compilation."""
    import jax

    with zipfile.ZipFile(path) as z:
        manifest = json.loads(z.read("manifest.json"))
        if manifest.get("format") != FORMAT_VERSION:
            raise ValueError(f"unsupported artifact format "
                             f"{manifest.get('format')}")
        if strict:
            fp = _catalog_fingerprint(session)
            stale = {t: (v, fp.get(t)) for t, v in manifest["catalog"].items()
                     if fp.get(t) != v}
            if stale:
                raise ValueError(
                    f"artifact built for different table versions: {stale} "
                    f"(rebuild with sql-to-artifact, or strict=False)")
        cache = _cache_dir()
        if not cache:
            # without a persistent compile cache dir the packaged
            # executables cannot be merged — the artifact's no-recompile
            # guarantee is lost silently otherwise (mirror the
            # foreign-platform notice below)
            import sys

            print("# artifact: no persistent compilation cache dir "
                  "configured (jax_compilation_cache_dir); stages will "
                  "compile fresh", file=sys.stderr)
        if cache:
            os.makedirs(cache, exist_ok=True)
            for name in z.namelist():
                if not name.startswith("xla/"):
                    continue
                dst = os.path.join(cache, os.path.basename(name))
                if not os.path.exists(dst):
                    with z.open(name) as src, open(dst + ".tmp", "wb") as f:
                        shutil.copyfileobj(src, f)
                    os.replace(dst + ".tmp", dst)
        if manifest.get("platform") != jax.devices()[0].platform:
            # executables are per-backend; foreign-platform artifacts still
            # skip the frontend/optimizer but recompile stages
            import sys

            print(f"# artifact built on {manifest.get('platform')!r}, "
                  f"running on {jax.devices()[0].platform!r}: stages will "
                  f"compile fresh", file=sys.stderr)
    return session.run_plan(manifest["plan"])
