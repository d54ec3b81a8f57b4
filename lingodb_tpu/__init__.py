"""lingodb_tpu: a TPU-native SQL query-processing framework.

A from-scratch reimplementation of the capabilities of LingoDB
(reference: /root/reference) designed TPU-first: SQL -> typed logical plan ->
optimizer -> compiled JAX/XLA execution with static-shape vectorized kernels,
SPMD over jax.sharding meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"


def _configure_jax():
    import os

    # make the local XLA CPU backend available next to the accelerator: the
    # executor runs small intermediate tables there to avoid high-latency
    # accelerator round trips (see runtime/device.py)
    plats = os.environ.get("JAX_PLATFORMS")
    if plats and "cpu" not in plats.split(","):
        os.environ["JAX_PLATFORMS"] = plats + ",cpu"

    import jax

    # LINGODB_PLATFORM=cpu forces the host platform (reference analogue:
    # LINGODB_* env settings, Setting.h:38-78). Needed because JAX_PLATFORMS
    # may be pinned by the environment; jax.config wins if set before first
    # backend init.
    forced = os.environ.get("LINGODB_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)

    jax.config.update("jax_enable_x64", True)

    # persistent compilation cache: compiles through the TPU tunnel cost
    # minutes; cache serialized executables across processes (the analogue of
    # the reference's ORC object cache, LLVMBackends.cpp:192-203)
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "xla"
    )
    cache_dir = os.environ.get("LINGODB_COMPILATION_CACHE", default_dir)
    if cache_dir and cache_dir.upper() != "OFF":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache EVERYTHING: the eager op-at-a-time path emits hundreds of
            # ~40ms micro-programs per complex query (DS q4: 645 compiles =
            # 28s); below-threshold entries otherwise recompile every process
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            # GPU-only autotune sidecar cache; its path (derived from
            # cache_dir) leaks into every compile-options hash, making cache
            # keys differ across cache locations — which breaks standalone
            # query artifacts (tools/artifact.py) and cross-machine cache reuse
            jax.config.update("jax_persistent_cache_enable_xla_caches", "")
        except Exception:
            pass


_configure_jax()

try:
    from .session import Session, connect_to_db, create_in_memory  # noqa: E402,F401
except ImportError:  # session not built yet during bootstrap
    pass
