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

    jax.config.update("jax_enable_x64", True)


_configure_jax()

try:
    from .session import Session, connect_to_db, create_in_memory  # noqa: E402,F401
except ImportError:  # session not built yet during bootstrap
    pass
