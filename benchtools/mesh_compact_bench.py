"""Measure eager mesh-scan compaction strategies on the virtual CPU mesh.

The r4 note: global select_mask (nonzero + take over a GSPMD-sharded table)
costs ~91s at 1.2M rows on 8 virtual devices. Candidate replacement:
shard-local compaction under shard_map (each shard does a LOCAL nonzero +
take to a uniform static capacity), followed by one global compact of the
much smaller padded intermediate.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchtools/mesh_compact_bench.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
SEL = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
NCOLS = 4

devs = jax.devices()
mesh = Mesh(np.array(devs), ("dp",))
nsh = len(devs)
pad = (-N) % nsh
rows = N + pad

rng = np.random.default_rng(0)
cols = [jax.device_put(np.arange(rows, dtype=np.int64) * (i + 1),
                       NamedSharding(mesh, P("dp"))) for i in range(NCOLS)]
mask_np = np.zeros(rows, dtype=bool)
mask_np[:N] = rng.random(N) < SEL
mask = jax.device_put(mask_np, NamedSharding(mesh, P("dp")))
n_true = int(mask_np.sum())
print(f"rows={rows} nsh={nsh} survivors={n_true}")


def timeit(name, f, reps=3):
    f()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    print(f"{name}: best {min(ts)*1e3:.1f}ms  all {[round(t*1e3) for t in ts]}")


# --- current path: global nonzero + take ---------------------------------
def global_compact():
    n = int(jnp.sum(mask))
    (idx,) = jnp.nonzero(mask, size=n)
    out = [jnp.take(c, idx, axis=0) for c in cols]
    jax.block_until_ready(out)
    return out


# --- shard-local compact -------------------------------------------------
def local_counts(m):
    return shard_map(lambda ms: jnp.sum(ms, keepdims=True).astype(jnp.int32),
                     mesh=mesh, in_specs=P("dp"), out_specs=P("dp"))(m)


def shard_local_compact():
    cnts = np.asarray(jax.device_get(local_counts(mask)))
    cap = 1 << max(int(np.ceil(np.log2(max(1, cnts.max())))), 0)

    def body(ms, *cs):
        (idx,) = jnp.nonzero(ms, size=cap, fill_value=ms.shape[0] - 1)
        cnt = jnp.sum(ms)
        valid = jnp.arange(cap) < cnt
        return (valid,) + tuple(jnp.take(c, idx, axis=0) for c in cs)

    outs = shard_map(body, mesh=mesh, in_specs=(P("dp"),) * (1 + NCOLS),
                     out_specs=P("dp"))(mask, *cols)
    jax.block_until_ready(outs)
    return outs, cnts


timeit("shard-local compact (padded out)", shard_local_compact, reps=3)


def two_step():
    (valid, *outs), cnts = shard_local_compact()
    n = int(cnts.sum())
    (idx,) = jnp.nonzero(valid, size=n)
    final = [jnp.take(c, idx, axis=0) for c in outs]
    jax.block_until_ready(final)
    return final


timeit("two-step (local + global trim)", two_step, reps=2)

if os.environ.get("SKIP_GLOBAL"):
    sys.exit(0)
timeit("global nonzero+take", global_compact, reps=1)

# sanity: two_step equals global
a = global_compact()
b = two_step()
for x, y in zip(a, b):
    assert np.array_equal(np.asarray(x), np.asarray(y)), "mismatch"
print("results equal: OK")
