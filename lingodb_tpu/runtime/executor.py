"""Plan executor: walks the logical plan and runs vectorized kernels.

TPU-native equivalent of the reference's generated query code + runtime
(reference: SubOpToControlFlow.cpp emits imperative code per pipeline that the
LLVM JIT runs tuple-at-a-time; here each operator is a set of whole-column JAX
ops). Dynamic result sizes surface as exactly one host sync per
size-changing operator (filter compaction, join expansion, group count) — the
TPU-native answer to the reference's pointer-growing buffers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..ops import backend as be
from ..ops.backend import xnp as jnp

from ..ops import groupby as gb
from ..ops import join as joinops
from ..ops import keys as keymod
from ..ops import pgather
from ..ops import scalar as sc
from ..ops import strings as strmod
from ..plan import exprs as E
from ..plan import logical as L
from ..plan.exprs import Call, ColRef
from ..sql.types import K, Type
from ..utils import tracer
from .result import ResultTable
from .vtable import SCol, VTable, dec_is_float, dec_is_wide, is_obj, jnp_dtype


class ExecError(Exception):
    pass


def _hbm_gbps() -> float:
    """HBM bandwidth the PERF-mode SOL accounting assumes (v5e default)."""
    import os

    return float(os.environ.get("BENCH_HBM_GBPS", "819"))


def _vtable_bytes(vt: VTable) -> int:
    """Physical bytes of a vtable: rows x itemsize per column (+1B/row per
    validity mask; wide-decimal object columns count as 16B limbs)."""
    total = 0
    for c in vt.cols.values():
        d = c.data
        itemsize = 16 if is_obj(d) else np.dtype(d.dtype).itemsize
        total += vt.num_rows * itemsize
        if c.valid is not None:
            total += vt.num_rows
    return total


class _NotDense(Exception):
    """Raised during tracing when group keys have no small dense domain."""


class Executor:
    """Executes logical plans against a session's storage."""

    track_tuples: dict | None = None

    def __init__(self, session):
        self.session = session
        # shared-subtree results, valid for one plan execution
        # (reference: the materialized relalg.tmp buffer, RelAlgOps.td:499)
        self._tmp_results: dict[int, VTable] = {}
        # Iterate working tables, keyed by IterateHolder.seq while a loop
        # body is being dispatched (reference: subop.loop region argument)
        self._iter_tables: dict[int, VTable] = {}
        self._mode = "DEFAULT"
        self.last_op_profile: list | None = None
        self._prof_children: list = [0.0]
        self._prof_child_bytes: list = [0]
        # one-shot results stashed by _try_fused_agg when it materializes a
        # spine base and then declines to fuse: the eager fallback consumes
        # them instead of re-executing the subtree (id(node) -> VTable)
        self._materialized_bases: dict[int, VTable] = {}

    # ------------------------------------------------------------- dispatch
    def execute(self, plan: L.Materialize) -> ResultTable:
        from . import device as dv
        from ..utils.settings import EXECUTION_MODE

        self._tmp_results.clear()
        self._materialized_bases.clear()
        # execution modes (reference: ExecutionMode + CPULLVMDebugBackend /
        # perf backend, src/execution/LLVMBackends.cpp:939-1010):
        #   DEFAULT  fast path
        #   DEBUG    verify every operator's output invariants
        #   PERF     per-operator wall-time/row profile in last_op_profile
        self._mode = str(EXECUTION_MODE.get()).upper()
        self.last_op_profile = [] if self._mode == "PERF" else None
        self._prof_children = [0.0]
        self._prof_child_bytes = [0]
        self._prof_seen_ids = set()
        if self.last_op_profile is not None:
            from ..utils import compilestats

            cs0 = compilestats.snapshot()
        with tracer.Trace("execution", "run_plan"):
            vt = self.run(plan.child).dense()
        if self.last_op_profile is not None:
            import sys

            for name, ms, rows, incl, nbytes, sol in self.last_op_profile:
                print(f"# perf {name}: self={ms:.3f}ms incl={incl:.3f}ms "
                      f"rows={rows} bytes={nbytes} sol={sol}", file=sys.stderr)
            cs = compilestats.delta(cs0)
            print(f"# perf compiles={cs['compiles']} "
                  f"compile_secs={cs['compile_secs']:.1f} "
                  f"cache_hits={cs['cache_hits']}", file=sys.stderr)
        # ONE packed device->host transfer for the whole result
        needed = VTable({cid: vt.col(cid) for cid in set(plan.cids)}, vt.num_rows)
        host = dv.fetch_vtable_np(needed) if vt.num_rows else {}
        names, types, cols, valids, dicts = [], [], [], [], []
        for cid, name in zip(plan.cids, plan.names):
            c = vt.col(cid)
            names.append(name)
            types.append(c.type)
            if vt.num_rows:
                cols.append(host[("d", cid)])
                valids.append(host.get(("v", cid)))
            else:
                cols.append(np.zeros(0, dtype=np.dtype(c.data.dtype)))
                valids.append(None)
            dicts.append(c.dictionary)
        return ResultTable(names, types, cols, valids, dicts, vt.num_rows)

    def run(self, op: L.LogicalOp) -> VTable:
        stashed = self._materialized_bases.pop(id(op), None)
        if stashed is not None:
            return stashed
        method = getattr(self, "_run_" + type(op).__name__.lower(), None)
        if method is None:
            raise ExecError(f"no executor for {type(op).__name__}")
        if self.last_op_profile is not None:
            import time as _time

            t0 = _time.perf_counter()
            self._prof_children.append(0.0)
            self._prof_child_bytes.append(0)
            vt = method(op)
            # wall time of dispatch; device completion lands on whichever
            # operator forces the next host sync (the executor's documented
            # one-sync-per-size-changing-op contract)
            dt = _time.perf_counter() - t0
            child = self._prof_children.pop()
            in_bytes = self._prof_child_bytes.pop()
            out_bytes = _vtable_bytes(vt)
            if self._prof_children:
                self._prof_children[-1] += dt
                self._prof_child_bytes[-1] += out_bytes
            # bytes this operator must move: children's outputs read + own
            # output written + base-table bytes its FUSED program scanned
            # internally (subtree Scans that never went through run() — a
            # fused aggregate has no profiled children, so without this the
            # profile showed bytes=9 / sol=3.8e9 for q6; VERDICT r3 weak #5).
            # sol = self_ms / (bytes / HBM GB/s), 1.0 = speed of light
            fused_scan = self._unprofiled_scan_bytes(op)
            self._prof_seen_ids.add(id(op))
            nbytes = in_bytes + out_bytes + fused_scan
            self_ms = (dt - child) * 1e3
            sol_ms = nbytes / (_hbm_gbps() * 1e9) * 1e3
            sol = round(self_ms / sol_ms, 1) if sol_ms > 0 else None
            # (name, self_ms, rows, inclusive_ms, bytes, sol_ratio)
            self.last_op_profile.append(
                (type(op).__name__, self_ms, vt.num_rows, dt * 1e3,
                 nbytes, sol))
        else:
            vt = method(op)
        if getattr(self, "_mode", "DEFAULT") == "DEBUG":
            self._debug_verify(op, vt)
        if self.track_tuples is not None:
            # per-operator output cardinalities (reference: relalg.track_tuples
            # / subop.set_tracked_count, RelAlgOps.td:530, ExecutionContext.h:63)
            self.track_tuples[id(op)] = (
                vt.num_rows if vt.row_valid is None
                else int(jnp.sum(vt.row_valid)))
        # small results migrate to the local CPU backend (runtime/device.py)
        if type(op).__name__ in ("Aggregate", "Select", "Join", "TopK", "Limit",
                                 "Distinct", "SetOp"):
            from . import device as dv

            vt = dv.demote_small(vt)
        return vt

    def _unprofiled_scan_bytes(self, op) -> int:
        """Base-table bytes of subtree Scans that never executed through
        run() (they were folded into a fused program or a cached join prep).
        Each scan is charged once: counted nodes are marked seen so
        ancestors don't re-charge them."""
        if self.last_op_profile is None:
            return 0
        total = 0
        for node in L.walk_plan(op):
            if isinstance(node, L.Scan) and id(node) not in self._prof_seen_ids:
                self._prof_seen_ids.add(id(node))
                e = self.session.catalog.get_table(node.table)
                rows = e.storage.num_rows if e is not None else 0
                for c in node.cols:
                    total += rows * np.dtype(jnp_dtype(c.type)).itemsize
        return total

    def _debug_verify(self, op: L.LogicalOp, vt: VTable) -> None:
        """DEBUG execution mode: operator-output invariant checks (the
        analogue of the reference's CPULLVMDebugBackend, which runs the
        generated program with verification enabled). Fused pipelines verify
        at their stage boundary."""
        n = vt.num_rows
        if not isinstance(n, int) or n < 0:
            raise ExecError(f"DEBUG {type(op).__name__}: bad num_rows {n!r}")
        for cid, c in vt.cols.items():
            shape = getattr(c.data, "shape", None)
            if shape is not None and shape != () and shape[0] != n:
                raise ExecError(
                    f"DEBUG {type(op).__name__}: column {cid} has "
                    f"{shape[0]} rows, table has {n}")
            if c.valid is not None and getattr(c.valid, "shape", (n,))[0] != n:
                raise ExecError(
                    f"DEBUG {type(op).__name__}: column {cid} validity "
                    f"length mismatch")
            d = c.dictionary
            if d is not None and len(d) > 1:
                if not all(d[i] <= d[i + 1] for i in range(len(d) - 1)):
                    raise ExecError(
                        f"DEBUG {type(op).__name__}: column {cid} dictionary "
                        f"not sorted (order-preserving code invariant broken)")
        produced = {c.cid for c in op.output_cols()}
        missing = produced - set(vt.cols)
        if missing:
            raise ExecError(
                f"DEBUG {type(op).__name__}: output columns {missing} "
                f"missing from result")

    # ------------------------------------------------------------- leaves
    def _run_scan(self, op: L.Scan) -> VTable:
        dev = self.session.device_table(op.table)
        cols = {}
        n = dev["__num_rows__"]
        for c in op.cols:
            cols[c.cid] = dev[c.name]
        vt = VTable(cols, n)
        # ONE combined compaction for pad + every pushed restriction: each
        # select_mask costs a count sync + a gather over all columns (on a
        # mesh, a GSPMD global gather) — evaluating restrictions on the
        # full columns first is safe (pad rows hold zeros; excluded rows'
        # predicate garbage is masked by the conjunction)
        mask = dev["__pad_mask__"]
        for r in op.restrictions:
            m = jnp.broadcast_to(
                sc.truth_mask(sc.eval_expr(r, vt.cols)), (n,))
            mask = m if mask is None else mask & m
        if mask is not None:
            # on a mesh, compacting here is a global gather (survivor-count
            # scaled); defer via a selection vector — the next keyed
            # exchange drops dead rows for free (VTable.row_valid docstring)
            if self._lazy_ok(n):
                return VTable(cols, n, row_valid=mask)
            vt = vt.select_mask(mask)
        return vt

    def _lazy_ok(self, n: int) -> bool:
        """Whether a selection-vector (deferred-compaction) result is
        worthwhile: only on an active mesh at exchange-scale row counts."""
        from . import device as dv
        from ..utils.settings import get_setting

        if getattr(self, "_mode", "DEFAULT") == "DEBUG":
            return False
        return (dv.get_mesh() is not None
                and n >= int(get_setting("system.shuffle_min_rows")))

    def _run_constrel(self, op: L.ConstRel) -> VTable:
        n = len(op.rows)
        cols = {}
        for i, info in enumerate(op.cols):
            vals = [r[i] for r in op.rows]
            cols[info.cid] = _scol_from_values(vals, info.type)
        return VTable(cols, n)

    # ------------------------------------------------------------- unary ops
    def _run_select(self, op: L.Select) -> VTable:
        fused = self._try_fused_chain(op)
        if fused is not None:
            return fused
        vt = self.run(op.child)
        if vt.num_rows == 0:
            return vt
        mask = sc.truth_mask(sc.eval_expr(op.predicate, vt.cols))
        mask = jnp.broadcast_to(mask, (vt.num_rows,))
        if vt.row_valid is not None:
            # dead rows' predicate garbage is masked by the conjunction
            return VTable(vt.cols, vt.num_rows, row_valid=vt.row_valid & mask)
        return vt.select_mask(mask)

    def _run_map(self, op: L.Map) -> VTable:
        vt = self.run(op.child)
        cols = dict(vt.cols)
        for info, expr in op.computed:
            c = sc._bcast(sc.eval_expr(expr, cols), vt.num_rows)
            cols[info.cid] = c
        return VTable(cols, vt.num_rows, row_valid=vt.row_valid)

    def _run_limit(self, op: L.Limit) -> VTable:
        vt = self.run(op.child).dense()
        lo = min(op.offset, vt.num_rows)
        hi = min(op.offset + op.n, vt.num_rows)
        idx = jnp.arange(lo, hi, dtype=jnp.int64)
        return vt.take(idx, hi - lo)

    def _run_sort(self, op: L.Sort) -> VTable:
        vt = self.run(op.child).dense()
        if vt.num_rows == 0:
            return vt
        dist = self._try_distributed_sort(op, vt)
        if dist is not None:
            return dist
        perm = keymod.sort_permutation(
            [(vt.col(k.cid), k.ascending, k.nulls_first) for k in op.keys],
            vt.num_rows,
        )
        return vt.take(perm, vt.num_rows)

    def _try_distributed_sort(self, op: L.Sort, vt: VTable) -> Optional[VTable]:
        """Distributed sample-sort over the mesh: range-partition by sampled
        lexicographic splitters, sort locally per shard (parallel/shuffle.py
        sample_sort; reference analogue: the parallel merge sort in
        src/runtime/Sorting.cpp). Replaces the replicated whole-table sort
        for large sharded inputs."""
        from . import device as dv
        from ..parallel import shuffle as sh
        from ..utils.settings import get_setting

        mesh = dv.get_mesh()
        n = vt.num_rows
        if mesh is None or n < int(get_setting("system.shuffle_min_rows")):
            return None
        if any(getattr(vt.col(k.cid).data, "dtype", None) == np.object_
               for k in op.keys):
            return None  # wide-decimal SORT KEYS have no device order image
                         # (object payload columns ship as int64 limbs)

        import jax.numpy as jnx

        key_cols = [(vt.col(k.cid), k.ascending, k.nulls_first)
                    for k in op.keys]
        operands = [jnx.broadcast_to(jnx.asarray(o), (n,))
                    for o in keymod.sort_operands(key_cols)]
        # original row index: stability tiebreak AND makes splitter tuples
        # unique, which keeps duplicate-heavy key ranges balanced
        operands.append(jnx.arange(n, dtype=jnx.int64))
        try:
            layout, arrays = _flatten_vt(vt)
        except _WideShip:
            return None
        arrays = [jnx.broadcast_to(jnx.asarray(a), (n,)) for a in arrays]
        valid, out, _cap = sh.sample_sort(mesh, operands, arrays)
        v_np = np.asarray(jax.device_get(valid))
        total = int(v_np.sum())
        if total != n:
            raise ExecError(
                f"distributed sort row mismatch: {total} of {n} rows routed")
        idx = jnp.asarray(np.flatnonzero(v_np))
        cols_sorted = [jnp.take(a, idx) for a in out[len(operands):]]
        return _rebuild_vt(vt, layout, cols_sorted, n)

    def _run_topk(self, op: L.TopK) -> VTable:
        fused = self._try_fused_topk(op)
        if fused is not None:
            return fused
        vt = self.run(op.child).dense()
        if vt.num_rows == 0:
            return vt
        perm = keymod.sort_permutation(
            [(vt.col(k.cid), k.ascending, k.nulls_first) for k in op.keys],
            vt.num_rows,
        )
        lo = min(op.offset, vt.num_rows)
        hi = min(op.offset + op.n, vt.num_rows)
        return vt.take(perm[lo:hi], hi - lo)

    def _try_fused_topk(self, op: L.TopK) -> Optional[VTable]:
        """Fold a TopK(Map*(Aggregate)) epilogue into the fused aggregate
        program: the program emits only the top candidates by the primary
        sort key (slack + exact tie check, see _apply_topk_epi); the host
        re-sorts the small candidate set under the FULL key order and
        slices. Replaces ~15-30 eager epilogue dispatches per query with
        zero extra programs (r4: the SF1 latency wall was exactly this)."""
        node = op.child
        maps = []
        while isinstance(node, L.Map):
            maps.append(node)
            node = node.children()[0]
        is_agg = isinstance(node, L.Aggregate) and node.group_by
        is_chain = isinstance(node, (L.Select, L.Join))
        if not (is_agg or is_chain):
            return None
        k = op.offset + op.n
        if k <= 0 or k > (1 << 13):
            return None
        # pow2 slack: secondary keys resolve among candidates on the host;
        # ties at the cutoff beyond the slack fall back via _EpiOverflow
        kk = 1 << (max(2 * k, k + 32) - 1).bit_length()
        epi = {
            "node": op,
            "maps": list(reversed(maps)),  # bottom-up evaluation order
            "k": k,
            "kk": kk,
            "out_cids": [c.cid for c in op.child.output_cols()],
        }
        if is_agg:
            res = self._try_fused_agg(node, epi=epi)
        else:
            res = self._try_fused_chain(node, epi=epi)
        if res is None:
            return None
        vt, applied = res
        if vt is None:
            return None
        if not applied:
            # dense mode or declined epilogue: the aggregate result came
            # back whole; evaluate the Map steps eagerly (dense results are
            # already host-resident numpy — this costs no device dispatch)
            for m in reversed(maps):
                cols = dict(vt.cols)
                for info, expr in m.computed:
                    cols[info.cid] = sc._bcast(
                        sc.eval_expr(expr, cols), vt.num_rows)
                vt = VTable(cols, vt.num_rows)
        from . import device as dv

        vt = dv.demote_small(vt)
        if vt.num_rows == 0:
            return vt
        perm = keymod.sort_permutation(
            [(vt.col(kx.cid), kx.ascending, kx.nulls_first)
             for kx in op.keys],
            vt.num_rows)
        lo = min(op.offset, vt.num_rows)
        hi = min(op.offset + op.n, vt.num_rows)
        return vt.take(perm[lo:hi], hi - lo)

    def _run_distinct(self, op: L.Distinct) -> VTable:
        vt = self.run(op.child).dense()
        if vt.num_rows == 0:
            return vt
        grp = gb.group_rows([vt.col(c) for c in op.cids], vt.num_rows)
        rep = grp["rep_rows"]
        return vt.take(rep, grp["num_groups"])

    def _run_materialize(self, op: L.Materialize) -> VTable:
        return self.run(op.child).dense()

    def _run_iterref(self, op: L.IterRef) -> VTable:
        vt = self._iter_tables.get(op.holder.seq)
        if vt is None:
            raise ExecError("IterRef outside an executing Iterate")
        # positional rename: working cols -> this reference's cids
        work = list(vt.cols.values())
        return VTable({c.cid: s for c, s in zip(op.cols, work)}, vt.num_rows)

    def _run_iterate(self, op: L.Iterate) -> VTable:
        """Iterate-until-fixpoint (reference: subop.loop lowering in
        SubOpToControlFlow.cpp; SQL WITH RECURSIVE lowers here).

        Each round dispatches the step plan's (cached/jitted) stages with the
        working table rebound; the only extra host sync per round is the
        row-count check that decides termination — the same one-sync-per-
        size-changing-op contract as the rest of the executor. Semi-naive
        for UNION: the working table holds only never-seen-before rows."""
        from . import device as dv

        base = self.run(op.base).dense()
        cur = VTable({c.cid: base.col(s) for c, s in zip(op.cols, op.lmap)},
                     base.num_rows)
        if op.distinct and cur.num_rows:
            grp = gb.group_rows([cur.col(c.cid) for c in op.cols], cur.num_rows)
            cur = cur.take(grp["rep_rows"], grp["num_groups"])
        acc = cur
        it = 0
        while cur.num_rows:
            it += 1
            if it > op.max_iters:
                raise ExecError(
                    f"Iterate exceeded max_iters={op.max_iters} (possible "
                    f"non-terminating recursion)")
            prev = self._iter_tables.get(op.holder.seq)
            self._iter_tables[op.holder.seq] = cur
            try:
                out = self.run(op.step).dense()
            finally:
                if prev is None:
                    self._iter_tables.pop(op.holder.seq, None)
                else:
                    self._iter_tables[op.holder.seq] = prev
            nxt = VTable({c.cid: out.col(s) for c, s in zip(op.cols, op.smap)},
                         out.num_rows)
            if op.distinct:
                nxt = self._iter_new_rows(nxt, acc, op.cols)
            if nxt.num_rows == 0:
                break
            a, b = dv.align_devices(acc, nxt)
            acc = _vconcat(a, b, op.cols)
            cur = b
        return acc if op.emit == "all" else cur

    def _iter_new_rows(self, nxt: VTable, acc: VTable, cols) -> VTable:
        """Semi-naive delta: distinct rows of `nxt` not present in `acc`."""
        from . import device as dv

        if nxt.num_rows == 0:
            return nxt
        acc_a, nxt_a = dv.align_devices(acc, nxt)
        both = _vconcat(acc_a, nxt_a, cols)
        grp = gb.group_rows([both.col(c.cid) for c in cols], both.num_rows)
        seg, g, order = grp["seg"], grp["num_groups"], grp["order"]
        tag = jnp.concatenate([
            jnp.zeros((acc_a.num_rows,), jnp.int64),
            jnp.ones((nxt_a.num_rows,), jnp.int64),
        ])
        t = tag if order is None else jnp.take(tag, order)
        seen = be.segment_sum(1 - t, seg, num_segments=g,
                              indices_are_sorted=grp["sorted"])
        keep = (seen == 0)
        rep = grp["rep_rows"]
        keep_np = np.asarray(jax.device_get(keep))
        rep_np = np.asarray(jax.device_get(rep))
        idx = rep_np[keep_np]
        return both.take(jnp.asarray(idx), len(idx))

    def _run_tmp(self, op: L.Tmp) -> VTable:
        """Materialize the shared subtree ONCE per execution; every Tmp
        reference renames the holder's columns to its own cids (reference:
        relalg.tmp / GetLocal lowering, RelAlgToSubOp.cpp)."""
        vt = self._tmp_results.get(id(op.holder))
        if vt is None:
            vt = self.run(op.holder.plan).dense()
            self._tmp_results[id(op.holder)] = vt
        cols = {c.cid: vt.col(s) for s, c in op.mapping}
        return VTable(cols, vt.num_rows)

    # ---------------------------------------------------- fused agg pipeline
    # Scan -> Select/Map chain -> Aggregate compiles into ONE jitted device
    # program using masked aggregation (no intermediate compaction). This is
    # the TPU-native replacement for the reference's fused per-morsel pipeline
    # (SubOpToControlFlow emits one loop doing scan+filter+aggregate per
    # morsel; XLA fuses the same chain across whole columns here).
    def _subtree_versions(self, node) -> list:
        out = []

        def walk(x):
            if isinstance(x, L.Scan):
                e = self.session.catalog.get_table(x.table)
                if e is not None:
                    out.append((x.table, e.storage.version))
            if isinstance(x, L.Tmp):
                walk(x.holder.plan)
            for c in x.children():
                walk(c)

        walk(node)
        return out

    _FUSABLE_KEY_KINDS = (K.INT, K.BIGINT, K.DATE, K.TIMESTAMP, K.BOOL)

    def _has_hash_index(self, build_plan, key_pair, key_pair2):
        """True when the build side is a base-table scan carrying a declared
        hash index whose key set equals the join key columns."""
        from ..plan import logical as L

        node = build_plan
        while isinstance(node, (L.Select, L.Map)):
            node = node.children()[0]
        if not isinstance(node, L.Scan):
            return False
        entry = self.session.catalog.get_table(node.table)
        if entry is None or not entry.indexes:
            return False
        cid_to_name = {c.cid: c.name for c in node.cols}
        names = []
        for kp in (key_pair, key_pair2):
            if kp is None:
                continue
            bexpr = kp[1]
            if not isinstance(bexpr, ColRef) or bexpr.cid not in cid_to_name:
                return False
            names.append(cid_to_name[bexpr.cid])
        return bool(names) and entry.index_on(names) is not None

    def _prep_fused_join(self, jop, build_plan, build_is_right, needed_cids,
                         sorted_cids=frozenset()):
        """Validate + materialize one dimension join for the fused pipeline.
        Returns None when the join can't be a static-shape unique-key lookup.
        sorted_cids: spine columns known to be physically nondecreasing
        (clustered base-table order) — probes on them use the monotone
        windowed-gather kernel."""
        from ..plan import exprs as E

        lcids = {c.cid for c in jop.left.output_cols()}
        rcids = {c.cid for c in jop.right.output_cols()}
        probe_cids = lcids if build_is_right else rcids
        build_cids = rcids if build_is_right else lcids
        if jop.predicate is None:
            if jop.kind != "single":
                return None
            # scalar-subquery broadcast: the build side is a 1-row relation
            # (global aggregate); its values broadcast to every probe row
            # (reference: GetScalarOp lowering via a single join,
            # SimplifyAggregations.cpp WrapAggrFuncPattern)
            bvt = self.run(build_plan).dense()
            if bvt.num_rows > 1:
                return None
            import jax as _jax

            needed = needed_cids & build_cids
            payloads, arrays = [], []
            present = bvt.num_rows == 1
            for cid in sorted(needed):
                c = bvt.col(cid)
                if is_obj(c.data):
                    # wide-decimal scalar (q22's avg(c_acctbal)): host object
                    # values cannot enter the jitted program — eager path
                    return None
                data = np.asarray(_jax.device_get(c.data))[:1]
                if not present:
                    data = np.zeros((1,), data.dtype)
                valid = None
                if c.valid is not None:
                    valid = (np.asarray(_jax.device_get(c.valid))[:1]
                             if present else np.zeros((1,), bool))
                arrays.append(data)
                if valid is not None:
                    arrays.append(valid)
                payloads.append((cid, c.type, valid is not None, c.dictionary))
            return {
                "kind": "single_broadcast",
                "present": present,
                "payloads": payloads,
                "arrays": arrays,
            }
        conjs = E.conjuncts(jop.predicate)
        pairs = []
        residual = []
        for c in conjs:
            if isinstance(c, Call) and c.op == "eq" and len(pairs) < 2:
                a, b = c.args
                ua, ub = E.used_cols(a), E.used_cols(b)
                if ua and ub:
                    if ua <= probe_cids and ub <= build_cids:
                        pairs.append((a, b))
                        continue
                    if ua <= build_cids and ub <= probe_cids:
                        pairs.append((b, a))
                        continue
            residual.append(c)
        key_pair = pairs[0] if pairs else None
        key_pair2 = None
        if len(pairs) == 2:
            # composite key: pack two 32-bit images into one int64
            w32 = (K.INT, K.DATE, K.BOOL)
            if all(p.type.kind in w32 and b.type.kind in w32 for p, b in pairs):
                key_pair2 = pairs[1]
            else:
                residual.append(Call("eq", list(pairs[1]), Type.bool_(True)))
        if key_pair is None:
            # Q19 pattern: equality common to all OR branches — use it as the
            # lookup key, re-check the entire predicate as residual
            lk, rk, ns = extract_equi_keys(jop.predicate, lcids, rcids)
            if lk and not any(ns):
                lexpr, rexpr = lk[0], rk[0]
                key_pair = (lexpr, rexpr) if build_is_right else (rexpr, lexpr)
                residual = [jop.predicate]
            else:
                return None
        probe_expr, build_expr = key_pair
        pt, bt = probe_expr.type, build_expr.type
        ik = self._FUSABLE_KEY_KINDS
        ok_int = pt.kind in ik and bt.kind in ik
        ok_dec = (pt.kind == K.DECIMAL and bt.kind == K.DECIMAL
                  and pt.s == bt.s and not dec_is_float(pt) and not dec_is_float(bt))
        if not (ok_int or ok_dec):
            return None
        probe_expr2 = build_expr2 = None
        if key_pair2 is not None:
            probe_expr2, build_expr2 = key_pair2
        if jop.kind in ("semi", "anti") and residual:
            pass  # fine: residual narrows `found` on the unique candidate
        # residual under left join also only narrows `found` (NULL-extend)

        bvt = self.run(build_plan).dense()
        import jax as _jax

        def to_np(a):
            return np.asarray(_jax.device_get(a))

        bk = sc.eval_expr(build_expr, bvt.cols)
        bk = sc._bcast(bk, bvt.num_rows)
        kdata = to_np(bk.data).astype(np.int64)
        kvalid = None if bk.valid is None else to_np(bk.valid)
        if build_expr2 is not None:
            bk2 = sc._bcast(sc.eval_expr(build_expr2, bvt.cols), bvt.num_rows)
            kdata = (kdata << 32) | (to_np(bk2.data).astype(np.int64) & 0xFFFFFFFF)
            if bk2.valid is not None:
                v2 = to_np(bk2.valid)
                kvalid = v2 if kvalid is None else (kvalid & v2)
        if build_expr2 is not None:
            kd1 = to_np(bk.data).astype(np.int64)  # UNpacked first key
            kv1 = None if bk.valid is None else to_np(bk.valid)
            k1 = kd1 if kv1 is None else kd1[kv1]
            if len(k1) == len(np.unique(k1)):
                # the FIRST key alone is unique on the build side (q5/q7/q8:
                # supplier joins add a nationkey equality to a unique
                # suppkey): probe single-key — direct-LUT eligible — and
                # verify the second equality as a residual on the gathered
                # payload. The packed sparse composite otherwise forces the
                # searchsorted probe: log2(nb) serialized rounds of
                # spine-wide gathers (measured 1.26s of q5's 1.55s@SF1,
                # a 16-round while loop in the device trace).
                residual = residual + [
                    Call("eq", [probe_expr2, build_expr2], Type.bool_(True))]
                kdata, kvalid = kd1, kv1
                probe_expr2 = build_expr2 = None
        keep = np.ones(len(kdata), bool) if kvalid is None else kvalid.copy()
        kept = kdata[keep]
        order = np.argsort(kept, kind="stable")
        skeys = kept[order]
        row_ids = np.flatnonzero(keep)[order]
        maxdup = 1
        if len(skeys) > 1 and not np.all(np.diff(skeys) > 0):
            if jop.kind in ("semi", "anti") and not residual:
                # existence joins only need the key SET
                skeys, first = np.unique(skeys, return_index=True)
                row_ids = row_ids[first]
            elif jop.kind in ("semi", "anti"):
                # duplicate keys + residual: bounded candidate expansion —
                # the jit probes up to maxdup candidates per key (statically
                # unrolled); bail when runs are long (reference analogue:
                # hash_multimap chains probed per tuple)
                _u, counts = np.unique(skeys, return_counts=True)
                maxdup = int(counts.max())
                if maxdup > 16:
                    return None
            else:
                return None  # duplicate build keys: not a unique-key lookup

        # direct-mapped position table when the key span is dense (FK joins
        # on contiguous surrogate keys): ONE gather per probe instead of a
        # log(n)-round binary search — binary search costs ~21 serialized
        # random-gather rounds on TPU. A declared hash index on the build key
        # (CREATE INDEX; reference: LingoDBHashIndex + indexNestedLoop impl
        # selection, OptimizeImplementations.cpp:580-660) lifts the density
        # requirement: the index IS this table, so spend the memory.
        direct = None
        if len(skeys) and maxdup == 1:
            kmin = int(skeys[0])
            span = int(skeys[-1]) - kmin + 1
            cap = max(4 * len(skeys), 1024)
            if self._has_hash_index(build_plan, key_pair, key_pair2):
                cap = 1 << 26
            # sparse-but-worthwhile: a filtered fact-side build (Q3's
            # customer x orders at SF10: 1.5M keys spanning 60M) still wins
            # with a direct table — ONE probe gather instead of ~21
            # binary-search rounds of 60M-row gathers (measured 18.3s -> the
            # probe gather alone). Spend the <=256MB int32 table (cached per
            # plan+version) whenever fill >= 1/64.
            if span <= (1 << 26) and len(skeys) >= (span >> 7):
                cap = 1 << 26
            if span <= cap and span <= (1 << 26):
                lut = np.full(span, -1, np.int32)
                # reversed assignment: first occurrence wins (duplicate keys
                # in the semi/anti maxdup path probe consecutive candidates)
                lut[(skeys - kmin).astype(np.int64)[::-1]] = np.arange(
                    len(skeys), dtype=np.int32)[::-1]
                direct = (kmin, span)
                skeys_or_lut = lut
            else:
                skeys_or_lut = skeys
        else:
            skeys_or_lut = skeys

        # payload columns referenced downstream of this join. Existence
        # joins (semi/anti) without residual predicates emit no build
        # columns — the join predicate's own key columns otherwise leak in
        # via needed_cids and force pointless payload gathers (and block
        # the ranges-based sorted-semi compaction)
        needed = needed_cids & build_cids
        if jop.kind in ("semi", "anti") and not residual:
            needed = set()
        payloads = []
        arrays = [skeys_or_lut]
        for cid in sorted(needed):
            c = bvt.col(cid)
            if is_obj(c.data):
                # wide-decimal payloads are host object arrays (Python
                # ints): they cannot ride a device gather inside the fused
                # program — eager join path handles them (q17's avg(qty)
                # build side at SF1 crossed the wide threshold)
                return None
            data = to_np(c.data)[row_ids]
            valid = None if c.valid is None else to_np(c.valid)[row_ids]
            arrays.append(data)
            if valid is not None:
                arrays.append(valid)
            payloads.append((cid, c.type, valid is not None, c.dictionary))
        from . import device as dv

        if dv.get_mesh() is None:
            # pin prep arrays on the device ONCE (they're cached with the
            # prep): passing host numpy into the fused jit re-uploads the
            # LUT + payloads on EVERY execution — ~25MB/run for Q3@SF1
            # through a ~170MB/s tunnel. Mesh runs keep numpy (uncommitted
            # arrays let GSPMD replicate them freely).
            import jax as _jax

            arrays = [_jax.device_put(a) for a in arrays]
        return {
            "kind": jop.kind,
            "probe_expr": probe_expr,
            "probe_expr2": probe_expr2,
            "probe_sorted": (isinstance(probe_expr, ColRef)
                             and probe_expr.cid in sorted_cids
                             and probe_expr2 is None),
            "probe_cid": (probe_expr.cid
                          if isinstance(probe_expr, ColRef) else None),
            "build_cid": (build_expr.cid
                          if isinstance(build_expr, ColRef) else None),
            "maxdup": maxdup,
            "direct": direct,
            "residual": residual,
            "payloads": payloads,
            "nb": len(skeys),
            "arrays": arrays,
        }

    def _agg_subtree_used_cids(self, op) -> set:
        from ..plan import exprs as E

        used = set(op.group_by)
        used.update(a.arg for a in op.aggs if a.arg is not None)

        def walk(x):
            if isinstance(x, L.Select):
                used.update(E.used_cols(x.predicate))
            elif isinstance(x, L.Map):
                for _c, e in x.computed:
                    used.update(E.used_cols(e))
            elif isinstance(x, L.Join) and x.predicate is not None:
                used.update(E.used_cols(x.predicate))
            for c in x.children():
                walk(c)

        walk(op.child)
        return used

    def _try_fused_chain(self, op, epi=None):
        """Compile a Scan -> [Select/Map/dimension-Join]* chain with NO
        aggregate on top into ONE jitted program emitting the surviving
        rows of every output column, compacted to a LEARNED capacity.

        This is the materialize-terminated counterpart of _try_fused_agg:
        eager multi-join chains (Q2's body; the build sides of Q5/Q7/Q9's
        aggregate spines) paid one-to-several host syncs per join — ~15-30
        tunnel round trips per query at SF1 (r4). The reference compiles
        the same chains into the single per-morsel program
        (SubOpToControlFlow.cpp:1158-1685).

        Mechanics shared with the fused aggregate: spine walk, unique-key
        dimension join preps, sample-estimated lead compaction, learned
        post-join mid compaction, per-join-step survivor counts, overflow
        flags, executable store. The tail differs: a final Pallas
        compaction gathers the output columns at the survivor positions
        (capacity = 4x pow2 of the learned survivor count, adaptively
        rebuilt on overflow); when survivors exceed half the spine the
        program emits full-width masked lanes instead and the finish does
        one eager select_mask."""
        from ..plan.serial import plan_key
        from . import device as dv

        want_pair = epi is not None

        def _ret(vt, applied=False):
            return (vt, applied) if want_pair else vt

        if dv.get_mesh() is not None:
            return None  # mesh execution routes through the sharded paths
        if getattr(self, "_in_fused_chain", False):
            return None
        steps, cur = self._walk_spine(op)
        if not any(st[0] == "join" for st in steps):
            return None
        if not isinstance(cur, L.Scan):
            return None  # materialized bases recurse here on their own top
        entry = self.session.catalog.get_table(cur.table)
        if entry is None or entry.storage.num_rows == 0:
            return None
        versions = tuple(sorted(self._subtree_versions(op)))
        basekey = ("fused_chain", plan_key(op), versions)
        cache = self.session.stage_cache
        if cache.get(basekey) == "eager":
            return None
        if epi is not None and cache.get(("fused_epi_decline", basekey)):
            epi = None
        dev = self.session.device_table(cur.table)
        n = dev["__num_rows__"]
        if n < dv.SMALL_ROWS:
            return None
        pad_mask = dev["__pad_mask__"]
        base_cols = [(c.cid, dev[c.name]) for c in cur.cols]
        base_restrictions = cur.restrictions

        out_infos = op.output_cols()
        out_cids = [c.cid for c in out_infos]
        # columns any step consumes (for prep payload selection)
        needed = set(out_cids)
        for st in steps:
            if st[0] == "sm":
                if isinstance(st[1], L.Select):
                    needed |= E.used_cols(st[1].predicate)
                else:
                    for _i2, e2 in st[1].computed:
                        needed |= E.used_cols(e2)
            elif st[1].predicate is not None:
                needed |= E.used_cols(st[1].predicate)

        snames = set(entry.storage.sorted_cols)
        sorted_cids = frozenset(c.cid for c in cur.cols if c.name in snames)
        prep_key = ("fused_prep", basekey)
        join_preps = cache.get(prep_key)
        if join_preps is None:
            join_preps = {}
            self._in_fused_chain = True
            try:
                for si, st in enumerate(steps):
                    if st[0] != "join":
                        continue
                    prep = self._prep_fused_join(st[1], st[2], st[3],
                                                 needed, sorted_cids)
                    if prep is None:
                        cache[basekey] = "eager"
                        return None
                    join_preps[si] = prep
            finally:
                self._in_fused_chain = False
            self._propagate_sorted_probe(join_preps, sorted_cids)
            cache[prep_key] = join_preps

        from ..utils import capstore

        outcap_obs = cache.get(("fused_outcap", basekey))
        if outcap_obs is None:
            st_ = capstore.get("outcap::" + repr((basekey, n)))
            if st_ is not None:
                outcap_obs = int(st_)
                cache[("fused_outcap", basekey)] = outcap_obs
        stepcaps = cache.get(("fused_stepcaps", basekey))
        if stepcaps is None:
            stored_sc = capstore.get("stepcaps::" + repr((basekey, n)))
            if stored_sc:
                stepcaps = {int(k2): int(v2)
                            for k2, v2 in stored_sc.items()}
                cache[("fused_stepcaps", basekey)] = stepcaps

        # lead compaction from sample-estimated scan selectivity (same
        # policy as the fused aggregate)
        first_join = next(
            (si for si, st in enumerate(steps) if st[0] == "join"), None)
        lead = first_join if first_join is not None else 0
        compact_k = None
        if (first_join is not None and n >= dv.SMALL_ROWS * 8
                and not cache.get(("fused_nocompact", basekey))):
            from ..opt.cardinality import scan_selectivity

            sel = scan_selectivity(entry, cur, list(base_restrictions))
            for st in steps[:lead]:
                if st[0] == "sm" and isinstance(st[1], L.Select):
                    sel *= scan_selectivity(
                        entry, cur, E.conjuncts(st[1].predicate))
            est = int(n * sel * 2) + 8192
            k = -(-est // 65536) * 65536
            if k <= n // 2:
                compact_k = k

        join_sis = [si for si, st in enumerate(steps)
                    if st[0] == "join"
                    and st[1].kind in ("inner", "semi", "anti")]
        mid_caps = {}
        if stepcaps:
            size = compact_k or n
            for si in join_sis:
                obs = stepcaps.get(si)
                if obs is None:
                    continue
                capv = 1 << (max(2 * obs, dv.SMALL_ROWS) - 1).bit_length()
                if capv <= size // 4:
                    mid_caps[si] = capv
                    size = capv

        # used_from suffix sets for compaction points
        used_from = [set() for _ in range(len(steps) + 1)]
        used_from[len(steps)] = set(out_cids)
        for si in range(len(steps) - 1, -1, -1):
            u = set(used_from[si + 1])
            st = steps[si]
            if st[0] == "sm":
                if isinstance(st[1], L.Select):
                    u |= E.used_cols(st[1].predicate)
                else:
                    for _i2, e2 in st[1].computed:
                        u |= E.used_cols(e2)
            else:
                p = join_preps[si]
                if p.get("probe_expr") is not None:
                    u |= E.used_cols(p["probe_expr"])
                if p.get("probe_expr2") is not None:
                    u |= E.used_cols(p["probe_expr2"])
                for r in p.get("residual", ()):
                    u |= E.used_cols(r)
            used_from[si] = u
        used_after = used_from[lead]

        calibrating = outcap_obs is None
        outcap = None
        do_compact = False
        if not calibrating:
            final_n = compact_k or n
            for si in join_sis:
                if si in mid_caps:
                    final_n = mid_caps[si]
            outcap = 1 << (max(4 * outcap_obs, dv.SMALL_ROWS)
                           - 1).bit_length()
            do_compact = outcap <= final_n // 2
        if calibrating:
            key = basekey + ("cal",)
        elif epi is not None:
            key = basekey + ("epi", plan_key(epi["node"]))
        else:
            key = basekey

        templates = base_cols
        arrays = []
        for _cid, t in templates:
            arrays.append(t.data)
            if t.valid is not None:
                arrays.append(t.valid)
        if pad_mask is not None:
            arrays.append(pad_mask)
        for si, st in enumerate(steps):
            if st[0] == "join":
                arrays.extend(join_preps[si]["arrays"])

        if key not in cache:
            meta = {"compact_k": compact_k, "outcap": outcap,
                    "do_compact": do_compact, "calibrating": calibrating}

            def fn(*arrs):
                _ovf_ctx = pgather.collect_ovf()
                _ovf_sink = _ovf_ctx.__enter__()
                try:
                    env = {}
                    i = 0
                    for cid, t in templates:
                        data = arrs[i]
                        i += 1
                        valid = None
                        if t.valid is not None:
                            valid = arrs[i]
                            i += 1
                        env[cid] = SCol(t.type, data, valid, t.dictionary)
                    mask = arrs[i] if pad_mask is not None else None
                    if mask is not None:
                        i += 1
                    for r in base_restrictions:
                        m = sc.truth_mask(sc.eval_expr(r, env))
                        mask = m if mask is None else mask & m
                    cur_n = n
                    extra = ()
                    extras_desc = []
                    step_counts = []

                    def _compact(env, mask, capv, used_cols):
                        sel_count, idx = pgather.nonzero_positions(mask, capv)
                        fetch = []
                        for cid, c in env.items():
                            if cid not in used_cols or c.data.ndim == 0:
                                continue
                            fetch.append(c.data)
                            if c.valid is not None:
                                fetch.append(c.valid)
                        fetched = pgather.take_fast_multi(
                            fetch, idx, monotone=True, conservative=True)
                        fi = 0
                        newenv = {}
                        for cid, c in env.items():
                            if cid not in used_cols or c.data.ndim == 0:
                                newenv[cid] = c
                                continue
                            data = fetched[fi]
                            fi += 1
                            valid = None
                            if c.valid is not None:
                                valid = fetched[fi]
                                fi += 1
                            newenv[cid] = SCol(c.type, data, valid,
                                               c.dictionary)
                        newmask = jnp.arange(capv, dtype=jnp.int64) < sel_count
                        return newenv, newmask, sel_count

                    for si, step in enumerate(steps):
                        if (compact_k is not None and si == lead
                                and mask is not None and mask.ndim != 0):
                            env, mask, sel_count = _compact(
                                env, mask, compact_k, used_after)
                            cur_n = compact_k
                            extra = extra + (sel_count,)
                            extras_desc.append(("lead", compact_k))
                        if step[0] == "sm" and isinstance(step[1], L.Select):
                            m = sc.truth_mask(
                                sc.eval_expr(step[1].predicate, env))
                            mask = m if mask is None else mask & m
                        elif step[0] == "sm":
                            for info, e in step[1].computed:
                                env[info.cid] = sc.eval_expr(e, env)
                        else:
                            prep = join_preps[si]
                            nargs = len(prep["arrays"])
                            rsc = None
                            if si in mid_caps:
                                rsc = _sorted_semi_compact(
                                    prep, arrs[i:i + nargs], env, mask,
                                    cur_n, mid_caps[si], used_from[si + 1])
                            if rsc is not None:
                                env, mask, rsc_count = rsc
                            else:
                                mask = _fused_join_step(
                                    prep, arrs[i:i + nargs], env, mask, cur_n)
                            i += nargs
                            if rsc is not None:
                                if si in join_sis:
                                    step_counts.append(rsc_count)
                                cur_n = mid_caps[si]
                                extra = extra + (rsc_count,)
                                extras_desc.append(("mid", si, mid_caps[si]))
                            elif si in join_sis:
                                if mask is None:
                                    step_counts.append(
                                        jnp.asarray(cur_n, jnp.int64))
                                elif mask.ndim == 0:
                                    step_counts.append(jnp.where(
                                        mask, jnp.int64(cur_n), jnp.int64(0)))
                                else:
                                    step_counts.append(
                                        jnp.sum(mask.astype(jnp.int64)))
                            if (rsc is None and si in mid_caps
                                    and mask is not None
                                    and mask.ndim != 0):
                                capv = mid_caps[si]
                                env, mask, sel_count = _compact(
                                    env, mask, capv, used_from[si + 1])
                                cur_n = capv
                                extra = extra + (sel_count,)
                                extras_desc.append(("mid", si, capv))
                    meta["extras"] = tuple(extras_desc)
                    meta["join_sis"] = tuple(join_sis)
                    if not any(d[0] == "lead" for d in extras_desc):
                        meta["compact_k"] = None
                    if mask is None:
                        mask = jnp.ones((cur_n,), jnp.bool_)
                    elif mask.ndim == 0:
                        mask = jnp.broadcast_to(mask, (cur_n,))
                    survivors = jnp.sum(mask.astype(jnp.int64))
                    if calibrating:
                        _ovf_ctx.__exit__(None, None, None)
                        flag = _ovf_bitmask(_ovf_sink)
                        return (extra + (survivors,)
                                + tuple(step_counts) + (flag,))
                    out_templates = []
                    if epi is not None:
                        # in-program TopK over the chain (row space): rank
                        # surviving rows by the primary sort key, emit only
                        # the top-kk candidates; exactness via the tie
                        # count, as in the aggregate epilogue
                        for m_ in epi["maps"]:
                            for info, e in m_.computed:
                                env[info.cid] = sc._bcast(
                                    sc.eval_expr(e, env), cur_n)
                        k0 = epi["node"].keys[0]
                        prio = keymod.topk_priority(
                            env[k0.cid], k0.ascending, k0.nulls_first, mask)
                        if prio is None:
                            raise _NotDense("chain topk: no order image")
                        kk = min(epi["kk"], cur_n)
                        vals, cand = jax.lax.top_k(prio, kk)
                        cutoff = vals[kk - 1]
                        tie_cnt = jnp.sum(((prio >= cutoff) & mask)
                                          .astype(jnp.int64))
                        lanes = []
                        for cid in epi["out_cids"]:
                            c = sc._bcast(env[cid], cur_n)
                            lanes.append(jnp.take(c.data, cand, mode="clip"))
                            if c.valid is not None:
                                lanes.append(jnp.take(c.valid, cand,
                                                      mode="clip"))
                            out_templates.append(
                                (cid, c.type, c.dictionary,
                                 c.valid is not None))
                        meta["templates"] = out_templates
                        meta["epi"] = {"kk": kk, "k": epi["k"]}
                        _ovf_ctx.__exit__(None, None, None)
                        flag = _ovf_bitmask(_ovf_sink)
                        return (extra + (survivors, tie_cnt) + tuple(lanes)
                                + tuple(step_counts) + (flag,))
                    if do_compact:
                        sel_count, idx = pgather.nonzero_positions(
                            mask, outcap)
                        fetch = []
                        for cid in out_cids:
                            c = sc._bcast(env[cid], cur_n)
                            fetch.append(c.data)
                            if c.valid is not None:
                                fetch.append(c.valid)
                            out_templates.append(
                                (cid, c.type, c.dictionary,
                                 c.valid is not None))
                        lanes = pgather.take_fast_multi(
                            fetch, idx, monotone=True, conservative=True)
                        _ovf_ctx.__exit__(None, None, None)
                        flag = _ovf_bitmask(_ovf_sink)
                        meta["templates"] = out_templates
                        return (extra + (survivors,) + tuple(lanes)
                                + tuple(step_counts) + (flag,))
                    lanes = []
                    for cid in out_cids:
                        c = sc._bcast(env[cid], cur_n)
                        lanes.append(c.data)
                        if c.valid is not None:
                            lanes.append(c.valid)
                        out_templates.append(
                            (cid, c.type, c.dictionary, c.valid is not None))
                    meta["templates"] = out_templates
                    _ovf_ctx.__exit__(None, None, None)
                    flag = _ovf_bitmask(_ovf_sink)
                    return (extra + (survivors,) + tuple(lanes) + (mask,)
                            + tuple(step_counts) + (flag,))
                finally:
                    _ovf_ctx.__exit__(None, None, None)

            nopallas = bool(cache.get(("fused_nopallas", basekey)))
            from . import exestore

            # ranges-based sorted-semi compaction changes the traced program
            # for eligible steps: vary the exe-store material ONLY then, so
            # every other program keeps its cached executable
            _ssc = tuple(
                si for si in sorted(mid_caps)
                if (join_preps[si]["kind"] == "semi"
                    and join_preps[si].get("probe_sorted")
                    and join_preps[si].get("direct") is None
                    and not join_preps[si]["residual"]
                    and not join_preps[si]["payloads"]
                    and join_preps[si].get("probe_expr2") is None
                    and join_preps[si].get("maxdup", 1) <= 1
                    and join_preps[si]["nb"] > 0))
            exe_mat = (key,
                       tuple((tuple(a.shape), str(a.dtype)) for a in arrays),
                       compact_k, tuple(sorted(mid_caps.items())),
                       outcap, do_compact, nopallas,
                       pgather.FORCE_PALLAS, dv.SMALL_ROWS) + (
                           ("ssc", _ssc) if _ssc else ())
            exe_k = exestore.make_key(exe_mat)
            hit = exestore.get(exe_k)
            if hit is not None:
                compiled, meta = hit
                try:
                    t_c0 = self._perf_sync()
                    result = compiled(*arrays)
                    jax.block_until_ready(result)
                    cache[key] = (compiled, meta, None)
                    self._perf_note(
                        f"fused_chain exe-store hit (no trace) "
                        f"{(self._perf_sync() - t_c0):.1f}s n={n}")
                except Exception:
                    hit = None
            if hit is None:
                try:
                    t_c0 = self._perf_sync()

                    def _lower_compile():
                        if nopallas:
                            old_force = pgather.FORCE_PALLAS
                            pgather.FORCE_PALLAS = False
                            try:
                                return jax.jit(fn).lower(*arrays).compile()
                            finally:
                                pgather.FORCE_PALLAS = old_force
                        return jax.jit(fn).lower(*arrays).compile()

                    try:
                        compiled = _lower_compile()
                        result = compiled(*arrays)
                    except Exception as ce:
                        if "remote_compile" not in repr(ce):
                            raise
                        self._perf_note("fused_chain remote compile died; "
                                        "retrying once")
                        compiled = _lower_compile()
                        result = compiled(*arrays)
                    cache[key] = (compiled, meta, None)
                    if not calibrating:
                        exestore.put(exe_k, compiled, meta)
                    self._perf_note(
                        f"fused_chain compile+first-run "
                        f"{(self._perf_sync() - t_c0):.1f}s n={n} "
                        f"compact_k={compact_k} outcap={outcap} "
                        f"do_compact={do_compact}")
                except Exception as fe:
                    self._perf_note(f"fused_chain DECLINED (trace/compile): "
                                    f"{type(fe).__name__}: {str(fe)[:160]}")
                    cache[basekey] = "eager"
                    return None
        else:
            compiled, meta, _t = cache[key]
            result = compiled(*arrays)

        compiled, meta, _t = cache[key]
        try:
            out = self._finish_fused_chain(op, result, meta, basekey,
                                           key, cache, n, epi)
            if isinstance(out, VTable):
                return _ret(out, meta.get("epi") is not None)
            return out  # recursion result: already has the right shape
        except _CompactOverflow:
            cache[("fused_nocompact", basekey)] = True
            cache.pop(key, None)
            return self._try_fused_chain(op, epi)
        except _MidCompactOverflow as mo:
            si_o, v_o = mo.args
            stepcaps2 = dict(cache.get(("fused_stepcaps", basekey)) or {})
            stepcaps2[si_o] = int(v_o)
            cache[("fused_stepcaps", basekey)] = stepcaps2
            capstore.put("stepcaps::" + repr((basekey, n)),
                         {str(k2): int(v2)
                          for k2, v2 in stepcaps2.items()})
            cache.pop(key, None)
            self._perf_note(f"fused_chain mid-compaction cap exceeded at "
                            f"step {si_o} (count={v_o}); rebuilding")
            return self._try_fused_chain(op, epi)
        except _CapacityOverflow as ce:
            g_real = ce.args[0]
            cache[("fused_outcap", basekey)] = g_real
            capstore.put("outcap::" + repr((basekey, n)), int(g_real))
            cache.pop(key, None)
            self._perf_note(f"fused_chain output capacity exceeded "
                            f"(count={g_real}); rebuilding")
            return self._try_fused_chain(op, epi)
        except _GatherOverflow as ge:
            self._perf_note(f"fused_chain gather overflow mask="
                            f"{bin(ge.args[0] if ge.args else 0)}: retrying "
                            f"without Pallas kernels")
            cache[("fused_nopallas", basekey)] = True
            cache.pop(key, None)
            return self._try_fused_chain(op, epi)
        except _EpiOverflow as eo:
            self._perf_note(f"fused_chain topk epilogue declined: "
                            f"{eo.args[0] if eo.args else ''}")
            cache[("fused_epi_decline", basekey)] = True
            cache.pop(key, None)
            return self._try_fused_chain(op, epi)

    def _finish_fused_chain(self, op, result, meta, basekey, key, cache,
                            n, epi=None):
        from . import device as dv
        from ..utils import capstore

        n_sc = len(meta.get("join_sis", ()))
        off = len(meta.get("extras", ()))
        lane_end = -1 - n_sc
        n_head = off + (2 if meta.get("epi") is not None else 1)
        fetch = {str(i_): result[i_] for i_ in range(n_head)}
        fetch["govf"] = result[-1]
        for j in range(n_sc):
            fetch[f"sc{j}"] = result[lane_end + j]
        scalars = dv.fetch_arrays_np(fetch)
        govf = int(np.asarray(scalars["govf"]).reshape(-1)[0])
        if govf > 0:
            raise _GatherOverflow(govf)
        self._check_fused_extras(meta, [
            int(np.asarray(scalars[str(j)]).reshape(-1)[0])
            for j in range(off)])
        if n_sc:
            meta["last_stepcounts"] = {
                si: int(np.asarray(scalars[f"sc{j}"]).reshape(-1)[0])
                for j, si in enumerate(meta["join_sis"])}
        survivors = int(np.asarray(scalars[str(off)]).reshape(-1)[0])
        if meta.get("calibrating"):
            cache[("fused_outcap", basekey)] = survivors
            capstore.put("outcap::" + repr((basekey, n)), survivors)
            if n_sc:
                counts = meta.get("last_stepcounts") or {}
                cache[("fused_stepcaps", basekey)] = counts
                capstore.put("stepcaps::" + repr((basekey, n)),
                             {str(k2): v2 for k2, v2 in counts.items()})
            cache.pop(key, None)
            self._perf_note(f"fused_chain calibrated: survivors={survivors}"
                            f" stepcounts={meta.get('last_stepcounts')}")
            return self._try_fused_chain(op, epi)
        if meta.get("epi") is not None:
            kk = meta["epi"]["kk"]
            tie_cnt = int(np.asarray(scalars[str(off + 1)]).reshape(-1)[0])
            if survivors > kk and tie_cnt > kk:
                raise _EpiOverflow(
                    f"tie overflow at cutoff ({tie_cnt} > {kk})")
            self._learn_stepcaps(basekey, key, cache, meta, n)
            if self.track_tuples is not None:
                self.track_tuples[id(op)] = survivors
            tmpl = meta["templates"]
            if survivors == 0:
                return VTable({cid: _empty_scol(t)
                               for cid, t, _d, _v in tmpl}, 0)
            ncand = min(survivors, kk)
            sliced = _slice_exact(tuple(result[off + 2:lane_end]), ncand)
            cols = {}
            i = 0
            for cid, t, d, has_valid in tmpl:
                data = sliced[i]
                i += 1
                valid = None
                if has_valid:
                    valid = sliced[i]
                    i += 1
                cols[cid] = SCol(t, data, valid, d)
            return VTable(cols, ncand)
        if meta.get("do_compact") and survivors > meta.get("outcap", 0):
            raise _CapacityOverflow(survivors)
        self._learn_stepcaps(basekey, key, cache, meta, n)
        if self.track_tuples is not None:
            self.track_tuples[id(op)] = survivors
        tmpl = meta["templates"]
        if meta.get("do_compact"):
            lanes = tuple(result[off + 1:lane_end])
            if survivors == 0:
                return VTable({cid: _empty_scol(t)
                               for cid, t, _d, _v in tmpl}, 0)
            sliced = _slice_exact(lanes, survivors)
            cols = {}
            i = 0
            for cid, t, d, has_valid in tmpl:
                data = sliced[i]
                i += 1
                valid = None
                if has_valid:
                    valid = sliced[i]
                    i += 1
                cols[cid] = SCol(t, data, valid, d)
            return VTable(cols, survivors)
        # full-width variant: one eager select_mask over the masked lanes
        lanes = tuple(result[off + 1:lane_end - 1])
        mask_lane = result[lane_end - 1]
        cur_n = int(mask_lane.shape[0])
        cols = {}
        i = 0
        for cid, t, d, has_valid in tmpl:
            data = lanes[i]
            i += 1
            valid = None
            if has_valid:
                valid = lanes[i]
                i += 1
            cols[cid] = SCol(t, data, valid, d)
        vt = VTable(cols, cur_n)
        return vt.select_mask(mask_lane)

    def _try_chunked_agg(self, op, steps, scan) -> Optional[VTable]:
        """Out-of-core streaming scan+aggregate: when the scan columns
        exceed the device byte budget, stream the base table in fixed-size
        chunks through HBM (async H2D prefetch of chunk i+1 overlapping
        chunk i's compute) and combine per-chunk dense aggregates on the
        host. One compiled program serves every chunk (static shapes).

        Scope: Scan -> Select/Map* -> dense/global Aggregate (the q1/q6
        shape) — exactly where beyond-HBM tables first bite. Reference
        analogue: morsel-driven scans are size-oblivious by construction
        (src/runtime/storage/LingoDBTable.cpp:360-470); here the morsel is
        an HBM-sized chunk and the merge is the host-side combine (the
        ThreadLocal::merge role)."""
        from . import device as dv
        from ..utils.settings import get_setting

        if dv.get_mesh() is not None:
            return None
        entry = self.session.catalog.get_table(scan.table)
        if entry is None or entry.storage.num_rows == 0:
            return None
        rows = entry.storage.num_rows
        cols = [entry.storage.column(c.name) for c in scan.cols]
        width = 0
        for c in cols:
            if c.data.dtype == np.object_:
                return None  # wide host decimals: no device image
            width += c.data.dtype.itemsize + (1 if c.valid is not None else 0)
        budget = int(get_setting("system.device_byte_budget"))
        if rows * width <= budget:
            return None
        if any(a.distinct for a in op.aggs):
            return None
        if any(a.fn not in ("sum", "count", "count_star", "min", "max",
                            "any_value") for a in op.aggs):
            return None
        radices = []
        domain = 1
        key_templates = []
        col_of = {c.cid: i for i, c in enumerate(scan.cols)}
        for cid in op.group_by:
            i = col_of.get(cid)
            if i is None:
                return None  # map-computed group key: not streamed (v1)
            col = cols[i]
            d = gb.small_domain(SCol(col.type, col.data, col.valid,
                                     col.dictionary))
            if d is None:
                return None
            radices.append(d)
            domain *= d
            key_templates.append((col.type, col.dictionary,
                                  col.valid is not None))
        if domain > gb.DENSE_DOMAIN_LIMIT:
            return None

        m = max(1 << 18, (budget // 3) // max(width, 1))
        m = 1 << (m.bit_length() - 1)  # pow2 floor
        n_chunks = -(-rows // m)
        self._perf_note(f"chunked_agg engaging: rows={rows} width={width}B "
                        f"chunk={m} chunks={n_chunks}")

        templates = [(info.cid, col.type, col.dictionary,
                      col.valid is not None)
                     for info, col in zip(scan.cols, cols)]
        meta = {"mode": "dense", "domain": domain, "radices": radices,
                "key_templates": key_templates, "extras": (),
                "join_sis": (), "agg_dicts": {}, "agg_limbs": set(),
                "key_offsets": None}
        kinds = ["sum"]  # the `present` lane
        for spec in op.aggs:
            if spec.fn in ("count_star", "count"):
                kinds += ["sum", "sum"]
            elif spec.fn == "sum":
                if (spec.out.type.kind == K.DECIMAL
                        and dec_is_wide(spec.out.type)):
                    kinds += ["limb", "lo", "sum"]
                else:
                    kinds += ["sum", "sum"]
            elif spec.fn == "min":
                kinds += ["min", "sum"]
            else:  # max / any_value
                kinds += ["max", "sum"]

        def fn(nvalid, *arrs):
            env = {}
            i = 0
            for cid, t, d, hv in templates:
                data = arrs[i]
                i += 1
                valid = None
                if hv:
                    valid = arrs[i]
                    i += 1
                env[cid] = SCol(t, data, valid, d)
            mask = jnp.arange(m, dtype=jnp.int64) < nvalid
            for r in scan.restrictions:
                mask = mask & sc.truth_mask(sc.eval_expr(r, env))
            for st in steps:
                node = st[1]
                if isinstance(node, L.Select):
                    mask = mask & sc.truth_mask(
                        sc.eval_expr(node.predicate, env))
                else:
                    for info, e in node.computed:
                        env[info.cid] = sc.eval_expr(e, env)
            if op.group_by:
                key_cols = [sc._bcast(env[c], m) for c in op.group_by]
                gid, dom2 = gb.dense_gid(key_cols)
            else:
                gid = jnp.zeros((m,), jnp.int32)

            def msum(w):
                wm = jnp.where(mask, w, jnp.zeros_like(w))
                return be.segment_sum(wm, gid, num_segments=domain)

            ones = jnp.ones((m,), jnp.int64)
            outs = [msum(ones)]
            for spec in op.aggs:
                arg = None if spec.arg is None else sc._bcast(env[spec.arg], m)
                if spec.fn == "count_star":
                    outs.append(outs[0])
                    outs.append(outs[0])
                    continue
                avalid = arg.valid
                vm = ones if avalid is None else avalid.astype(jnp.int64)
                cnt = msum(vm)
                if spec.fn == "count":
                    outs.append(cnt)
                    outs.append(cnt)
                    continue
                if spec.fn == "sum":
                    data = arg.data.astype(jnp_dtype(spec.out.type))
                    if avalid is not None:
                        data = jnp.where(avalid, data, jnp.zeros_like(data))
                    if (spec.out.type.kind == K.DECIMAL
                            and dec_is_wide(spec.out.type)
                            and data.dtype == jnp.int64):
                        meta["agg_limbs"].add(spec.out.cid)
                        outs.append(msum(data >> jnp.int64(32)))
                        outs.append(msum(data & jnp.int64(0xFFFFFFFF)))
                        outs.append(cnt)
                        continue
                    outs.append(msum(data))
                    outs.append(cnt)
                    continue
                sentinel = gb._extreme(arg.data.dtype,
                                       maximum=(spec.fn == "min"))
                keep = mask if avalid is None else (mask & avalid)
                data = jnp.where(keep, arg.data, sentinel)
                red = (be.segment_min if spec.fn == "min"
                       else be.segment_max)(data, gid, num_segments=domain)
                meta["agg_dicts"][spec.out.cid] = arg.dictionary
                outs.append(red)
                outs.append(cnt)
            return tuple(outs)

        import jax as _jax

        jitted = jax.jit(fn)

        def chunk_args(ci):
            lo = ci * m
            hi = min(rows, lo + m)
            args = []
            for (cid, t, d, hv), col in zip(templates, cols):
                a = np.asarray(col.data[lo:hi])
                if hi - lo < m:
                    a = np.concatenate([a, np.zeros(m - (hi - lo), a.dtype)])
                args.append(_jax.device_put(a))
                if hv:
                    v = np.asarray(col.valid[lo:hi])
                    if hi - lo < m:
                        v = np.concatenate(
                            [v, np.zeros(m - (hi - lo), np.bool_)])
                    args.append(_jax.device_put(v))
            return (hi - lo), args

        def _norm(host):
            """Chunk lanes -> accumulable form (limb pairs become ONE exact
            object lane; the placeholder keeps indices aligned)."""
            out = list(host)
            for i, k in enumerate(kinds):
                if k == "limb":
                    out[i] = (out[i].astype(object) * (1 << 32)
                              + out[i + 1].astype(object))
                    out[i + 1] = np.zeros_like(host[i + 1])
            return out

        acc = None
        nxt = chunk_args(0)
        for ci in range(n_chunks):
            nv, args = nxt
            out = jitted(jnp.int64(nv), *args)
            if ci + 1 < n_chunks:
                nxt = chunk_args(ci + 1)  # async H2D rides the compute
            host = _norm([np.asarray(x) for x in _jax.device_get(out)])
            del args, out
            if acc is None:
                acc = host
                continue
            for i, k in enumerate(kinds):
                if k in ("sum", "limb"):
                    acc[i] = acc[i] + host[i]
                elif k == "min":
                    acc[i] = np.minimum(acc[i], host[i])
                elif k == "max":
                    acc[i] = np.maximum(acc[i], host[i])
                # "lo": placeholder, stays zero
        # re-split exact limb totals into (hi, lo) int64 lanes for the
        # shared dense finish (combine_limbs(hi, lo) == hi*2^32 + lo)
        for i, k in enumerate(kinds):
            if k == "limb":
                tot = acc[i]
                hi_l = np.array([int(x) >> 32 for x in tot], np.int64)
                lo_l = np.array([int(x) & 0xFFFFFFFF for x in tot], np.int64)
                acc[i] = hi_l
                acc[i + 1] = lo_l
        host_map = {i: a for i, a in enumerate(acc)}
        return self._finish_fused_dense(op, host_map, meta, 0)

    def _propagate_sorted_probe(self, join_preps, sorted_cids) -> None:
        """A probe key that is a payload of an EARLIER unique-key INNER
        join whose own probe rides a sorted base column is value-equal to
        that base column on every unmasked row (the join predicate; rows
        without a match are masked out of the pipeline). Substitute the
        base column as the probe so the sorted-probe fast paths engage
        (monotone windowed LUT gathers; the range-scatter semi/anti
        membership check). Q18's semi probes o_orderkey — a payload of the
        orders join — which IS l_orderkey on surviving rows."""
        inner_by_build = {}
        for si in sorted(join_preps):
            p = join_preps[si]
            if (p.get("kind") == "inner" and p.get("build_cid") is not None
                    and p.get("probe_cid") in sorted_cids
                    and p.get("probe_expr2") is None):
                inner_by_build[p["build_cid"]] = (si, p["probe_expr"])
        for si in sorted(join_preps):
            p = join_preps[si]
            pe = p.get("probe_expr")
            if (isinstance(pe, ColRef) and not p.get("probe_sorted")
                    and p.get("probe_expr2") is None
                    and pe.cid in inner_by_build):
                src_si, src_expr = inner_by_build[pe.cid]
                if src_si < si:
                    p["probe_expr"] = src_expr
                    p["probe_cid"] = src_expr.cid
                    p["probe_sorted"] = True

    def _subtree_max_rows(self, node):
        if isinstance(node, L.Scan):
            e = self.session.catalog.get_table(node.table)
            return e.storage.num_rows if e is not None else 0
        if isinstance(node, L.Tmp):
            return self._subtree_max_rows(node.holder.plan)
        return max((self._subtree_max_rows(c) for c in node.children()),
                   default=0)

    def _walk_spine(self, root):
        """Spine walk shared by the fused aggregate and fused chain
        compilers: Select/Map chain, passing through dimension joins whose
        build side is the smaller subtree (the probe side continues the
        spine). Each such join becomes a static-shape lookup inside the
        fused program when the build keys are unique (FK joins) — the
        TPU-native equivalent of the reference probing a hash-indexed view
        inside the per-morsel loop (SubOpToControlFlow.cpp lookup
        lowering). Returns (steps bottom-up, base node)."""
        steps = []
        cur = root
        while True:
            if isinstance(cur, (L.Select, L.Map)):
                steps.append(("sm", cur))
                cur = cur.children()[0]
                continue
            if (isinstance(cur, L.Join)
                    and cur.kind in ("inner", "semi", "anti", "left", "single")
                    and getattr(cur, "null_aware", None) is None):
                lrows = self._subtree_max_rows(cur.left)
                rrows = self._subtree_max_rows(cur.right)
                if cur.kind in ("semi", "anti", "left", "single"):
                    spine, build = cur.left, cur.right  # semantics fix sides
                elif lrows >= rrows:
                    spine, build = cur.left, cur.right
                else:
                    spine, build = cur.right, cur.left
                steps.append(("join", cur, build, build is cur.right))
                cur = spine
                continue
            break
        steps.reverse()
        return steps, cur

    def _try_fused_agg(self, op: L.Aggregate, epi=None):
        """epi (optional): a TopK epilogue to fold INTO the fused program
        (general mode only): {"node": L.TopK, "maps": [L.Map...bottom-up],
        "k": int, "kk": int, "out_cids": [cid...]}. When epi is given the
        return value is a PAIR (vtable, epi_applied): epi_applied=True means
        the vtable holds the (<= kk) TopK CANDIDATE rows (superset of the
        true top k under the full sort order — the caller re-sorts exactly
        and slices); False means the plain aggregate result came back and
        the caller must run the epilogue eagerly (dense mode / declined).

        Reference analogue: one generated program per query runs
        scan->join->agg->sort->emit (SubOpToControlFlow.cpp:1158-1685);
        eagerly dispatching the TopK epilogue cost ~15-30 tunnel round
        trips per query at SF1 (r4 measurements)."""
        from ..plan.serial import plan_key

        want_pair = epi is not None

        def _ret(vt, applied=False):
            return (vt, applied) if want_pair else vt

        if any(a.distinct for a in op.aggs):
            return None
        # any_value evaluates as a max-reduction: within a group the value is
        # either genuinely arbitrary (SQL any_value) or constant (FD-reduced
        # group keys recovered by reduce_group_keys), so any reduction works
        if any(a.fn not in ("sum", "count", "count_star", "min", "max",
                            "any_value") for a in op.aggs):
            return None

        # mesh scale-out: a large-domain group-by must repartition by key over
        # the mesh (sharded path) instead of the fused program's global sorted
        # grouping, which GSPMD would gather (reference analogue: partitioned
        # PreAggregationHashtable instead of one shared table). Dense-domain
        # keys (dictionary strings / bools) keep the fused psum path.
        from . import device as dv

        if dv.get_mesh() is not None and op.group_by:
            from ..utils.settings import get_setting

            types = {c.cid: c.type for c in op.child.output_cols()}
            dense = all(
                types[cid].is_string or types[cid].kind == K.BOOL
                for cid in op.group_by if cid in types
            )
            if (not dense and self._subtree_max_rows(op.child)
                    >= int(get_setting("system.shuffle_min_rows"))):
                return None

        steps, cur = self._walk_spine(op.child)

        if isinstance(cur, L.Scan) and all(st[0] == "sm" for st in steps):
            # beyond-HBM tables: stream the scan in chunks (out-of-core)
            ck = self._try_chunked_agg(op, steps, cur)
            if ck is not None:
                return _ret(ck)

        if isinstance(cur, L.Scan):
            scan = cur
            entry = self.session.catalog.get_table(scan.table)
            if entry.storage.num_rows == 0:
                return None
            dev = self.session.device_table(scan.table)
            n = dev["__num_rows__"]  # includes mesh padding rows
            if n < dv.SMALL_ROWS:
                return None  # jit compile cost exceeds eager cost on tiny tables
            pad_mask = dev["__pad_mask__"]
            base_cols = [(c.cid, dev[c.name]) for c in scan.cols]
            base_restrictions = scan.restrictions
        else:
            # materialized spine base: the subtree under the Select/Map/join
            # chain (a shared Tmp, a finished aggregate, ...) executes eagerly
            # ONCE and its columns feed the fused program like a scan — the
            # analogue of the reference scanning a pipeline breaker's result
            # buffer in the next pipeline (SubOpToControlFlow state scans)
            base_vt = self.run(cur).dense()
            # stash immediately: if ANY later check declines to fuse, the
            # eager fallback consumes this instead of re-executing the
            # subtree (pagerank-style loops under an aggregate ran twice)
            self._materialized_bases[id(cur)] = base_vt
            n = base_vt.num_rows
            if n < dv.SMALL_ROWS:
                return None
            pad_mask = None
            base_cols = sorted(base_vt.cols.items())
            base_restrictions = []
        versions = tuple(sorted(self._subtree_versions(op)))
        basekey = ("fused_agg", plan_key(op), versions)
        cache = self.session.stage_cache
        # group capacity / join preps / compaction+pallas decline markers are
        # properties of the AGGREGATE alone and shared between the plain and
        # epilogue-fused program variants; only the compiled program entry
        # itself is keyed on the epilogue signature
        if epi is not None and cache.get(("fused_epi_decline", basekey)):
            epi = None
        key = (basekey + ("epi", plan_key(epi["node"]))
               if epi is not None else basekey)
        if cache.get(key) == "eager":
            return None
        if ("fused_kg", basekey) not in cache:
            # learned group capacities persist beside the XLA compile
            # cache: a fresh process skips the calibration program AND the
            # capacity rebuild (utils/capstore.py)
            from ..utils import capstore

            stored = capstore.get(repr((basekey, n)))
            if stored:
                cache[("fused_kg", basekey)] = stored

        # prepare dimension builds (eager, small) + validate join shapes.
        # Preps are cached with the compiled entry: the cache key covers every
        # involved table version, so build contents are fixed per key (avoids
        # re-fetching dimension arrays from the device on every execution)
        sorted_cids = frozenset()
        if isinstance(cur, L.Scan):
            snames = set(entry.storage.sorted_cols)
            sorted_cids = frozenset(
                c.cid for c in cur.cols if c.name in snames)
        prep_key = ("fused_prep", basekey)
        join_preps = cache.get(prep_key)
        if join_preps is None:
            join_preps = {}
            for si, st in enumerate(steps):
                if st[0] != "join":
                    continue
                prep = self._prep_fused_join(
                    st[1], st[2], st[3],
                    self._agg_subtree_used_cids(op), sorted_cids)
                if prep is None:
                    cache[key] = "eager"
                    return None
                join_preps[si] = prep
            self._propagate_sorted_probe(join_preps, sorted_cids)
            cache[prep_key] = join_preps
        # single group key that rides the spine's clustered order (TPC-H
        # lineitem by l_orderkey after ReduceGroupByKeys) — directly, or
        # through an INNER unique-key join whose build key equals the group
        # key while the probe key is the sorted column (Q18 groups by
        # o_orderkey == sorted l_orderkey; unmatched rows are masked and
        # masked rows never open boundaries). The general grouping then
        # skips its multi-operand lax.sort entirely — each lax.sort costs
        # ~20s + ~8s/operand of REMOTE compile on this rig (the single
        # largest fused-warmup term measured in r4).
        def _base_col_nonnull(cid):
            t = next((t for c, t in base_cols if c == cid), None)
            return t is not None and t.valid is None

        presorted_group = len(op.group_by) == 1 and (
            # direct: NULLs would form an out-of-order group, so the direct
            # case demands a non-nullable stored column; the equi case is
            # safe because an invalid key row is by construction masked out
            # (inner-join found folds into the pipeline mask)
            (op.group_by[0] in sorted_cids
             and _base_col_nonnull(op.group_by[0]))
            or any(p.get("kind") == "inner"
                   and p.get("build_cid") == op.group_by[0]
                   and p.get("probe_cid") in sorted_cids
                   and p.get("probe_expr2") is None
                   for p in join_preps.values()))

        # probe-side compaction: when the leading filters keep only a small
        # fraction of the base rows, gather the survivors once (static-size
        # nonzero) so every later join lookup and the final reduction run at
        # the compacted size — random gathers through this TPU cost ~15ms per
        # million rows, so a 1% spine (Q14's shipdate month over 60M rows)
        # gets ~50x cheaper. The size is a sample estimate with 4x headroom;
        # the program returns the true survivor count and the host falls back
        # to the uncompacted program on overflow (at most once per version —
        # the fallback is cached).
        first_join = next(
            (si for si, st in enumerate(steps) if st[0] == "join"), None)
        lead = first_join if first_join is not None else 0
        compact_k = None
        if (first_join is not None and isinstance(cur, L.Scan)
                and n >= dv.SMALL_ROWS * 8
                and not cache.get(("fused_nocompact", basekey))):
            from ..opt.cardinality import scan_selectivity

            sel = scan_selectivity(entry, scan, list(base_restrictions))
            for st in steps[:lead]:
                if st[0] == "sm" and isinstance(st[1], L.Select):
                    sel *= scan_selectivity(
                        entry, scan, E.conjuncts(st[1].predicate))
            # x2 headroom over the estimate, quantized to 64K (shape
            # stability for the jit cache); every downstream gather/probe
            # runs at this size, so slack is pure waste — the overflow
            # fallback below covers underestimates
            est = int(n * sel * 2) + 8192
            k = -(-est // 65536) * 65536
            if k <= n // 2:
                compact_k = k
        # columns each step suffix still reads (everything else is dropped
        # instead of gathered at a compaction point): used_from[si] = cols
        # consumed by steps si.. plus the final grouping/aggregation
        used_from = [set() for _ in range(len(steps) + 1)]
        used_from[len(steps)] = set(op.group_by) | {
            a.arg for a in op.aggs if a.arg is not None}
        for si in range(len(steps) - 1, -1, -1):
            u = set(used_from[si + 1])
            st = steps[si]
            if st[0] == "sm":
                if isinstance(st[1], L.Select):
                    u |= E.used_cols(st[1].predicate)
                else:
                    for _info, e in st[1].computed:
                        u |= E.used_cols(e)
            else:
                p = join_preps[si]
                if p.get("probe_expr") is not None:
                    u |= E.used_cols(p["probe_expr"])
                if p.get("probe_expr2") is not None:
                    u |= E.used_cols(p["probe_expr2"])
                for r in p.get("residual", ()):
                    u |= E.used_cols(r)
            used_from[si] = u
        used_after = used_from[lead]

        # post-join spine compaction: when a (semi/anti/inner) join step is
        # observed to keep only a small fraction of the spine, compact the
        # survivors right after it so every later step AND the reduction run
        # at survivor scale (r4's q18: a semi join narrowed 60M rows to a
        # few hundred yet grouping still ran at row scale — 8.6 s). The
        # survivor counts are LEARNED: the calibration count-only program
        # (or the first full run) returns per-join-step mask sums; caps get
        # 4x pow2 headroom and persist beside the compile cache. Reference
        # analogue: the hash-table build is naturally survivor-sized
        # (src/runtime/Hashtable.cpp) — here survivor-sizing is an adaptive
        # recompilation.
        join_sis = [si for si, st in enumerate(steps)
                    if st[0] == "join"
                    and st[1].kind in ("inner", "semi", "anti")]
        stepcaps = cache.get(("fused_stepcaps", basekey))
        if stepcaps is None:
            from ..utils import capstore

            stored_sc = capstore.get("stepcaps::" + repr((basekey, n)))
            if stored_sc:
                stepcaps = {int(k2): int(v2) for k2, v2 in stored_sc.items()}
                cache[("fused_stepcaps", basekey)] = stepcaps
        mid_caps = {}
        if stepcaps:
            size = compact_k or n
            for si in join_sis:
                obs = stepcaps.get(si)
                if obs is None:
                    continue
                capv = 1 << (max(2 * obs, dv.SMALL_ROWS) - 1).bit_length()
                if capv <= size // 4:
                    mid_caps[si] = capv
                    size = capv

        # learned per-key value bounds: tiny-RANGE integer/date group keys
        # (Q7/Q9's year x nation) ride the sort-free dense psum path once
        # their ranges are calibrated (gb.bounded_gid); the bounds come out
        # of the same count-only calibration program
        kbounds = None
        force_cal = False
        if not cache.get(("fused_kbounds_dead", basekey)):
            kbounds = cache.get(("fused_kbounds", basekey))
            if kbounds is None:
                from ..utils import capstore as _cs

                stored_kb = _cs.get("kbounds::" + repr((basekey, n)))
                if stored_kb is not None:
                    kbounds = [tuple(b) if b else None for b in stored_kb]
                    cache[("fused_kbounds", basekey)] = kbounds
            if kbounds is None and op.group_by and not presorted_group:
                # bounds are a calibration product; plans whose group
                # capacity was already learned (or carried over from the
                # capstore) never calibrated with bounds support — force
                # ONE count-only run when an integer/date key could have a
                # small learned range (Q7/Q9's year x nation, Q8's o_year).
                # Presorted groupings are already sort-free; high-card keys
                # just learn useless bounds once and set the dead flag.
                ktypes = {c.cid: c.type for c in op.child.output_cols()}
                force_cal = any(
                    ktypes[cid].kind in (K.INT, K.BIGINT, K.DATE)
                    and not ktypes[cid].is_string
                    for cid in op.group_by if cid in ktypes)

        templates = base_cols
        arrays = []
        for _cid, t in templates:
            arrays.append(t.data)
            if t.valid is not None:
                arrays.append(t.valid)
        if pad_mask is not None:
            arrays.append(pad_mask)
        join_arg_start = len(arrays)
        for si, st in enumerate(steps):
            if st[0] == "join":
                arrays.extend(join_preps[si]["arrays"])

        if key not in cache:
            meta = {"compact_k": compact_k}

            def fn(*arrs):
                # windowed-gather overflow flags ride the outputs as ONE
                # trailing lane instead of per-gather lax.cond fallbacks
                # (conds copy their operands: 1.36s of q3's 1.59s program
                # was conditional copies, r4 device traces). On overflow
                # the finish raises and a non-Pallas variant re-runs once.
                _ovf_ctx = pgather.collect_ovf()
                _ovf_sink = _ovf_ctx.__enter__()
                try:
                    env = {}
                    i = 0
                    for cid, t in templates:
                        data = arrs[i]
                        i += 1
                        valid = None
                        if t.valid is not None:
                            valid = arrs[i]
                            i += 1
                        env[cid] = SCol(t.type, data, valid, t.dictionary)
                    mask = arrs[i] if pad_mask is not None else None
                    if mask is not None:
                        i += 1
                    for r in base_restrictions:
                        m = sc.truth_mask(sc.eval_expr(r, env))
                        mask = m if mask is None else mask & m
                    cur_n = n
                    extra = ()
                    extras_desc = []
                    step_counts = []

                    def _compact(env, mask, capv, used_cols):
                        # survivor positions via the Pallas streaming
                        # compaction kernel on the chip (ops/pgather.py);
                        # positions are monotone, so the per-column fetch
                        # uses the windowed sorted-gather kernel. ONE batched
                        # kernel call fetches every surviving column
                        # (amortizes the Mosaic compile + index walk)
                        sel_count, idx = pgather.nonzero_positions(mask, capv)
                        fetch = []
                        for cid, c in env.items():
                            if cid not in used_cols or c.data.ndim == 0:
                                continue
                            fetch.append(c.data)
                            if c.valid is not None:
                                fetch.append(c.valid)
                        # compaction positions are sentinel-padded to the
                        # capacity: true survivor density is unknown
                        # statically -> conservative walk
                        fetched = pgather.take_fast_multi(fetch, idx,
                                                          monotone=True,
                                                          conservative=True)
                        fi = 0
                        newenv = {}
                        for cid, c in env.items():
                            if cid not in used_cols or c.data.ndim == 0:
                                newenv[cid] = c
                                continue
                            data = fetched[fi]
                            fi += 1
                            valid = None
                            if c.valid is not None:
                                valid = fetched[fi]
                                fi += 1
                            newenv[cid] = SCol(c.type, data, valid,
                                               c.dictionary)
                        newmask = jnp.arange(capv, dtype=jnp.int64) < sel_count
                        return newenv, newmask, sel_count

                    for si, step in enumerate(steps):
                        if (compact_k is not None and si == lead
                                and mask is not None and mask.ndim != 0):
                            env, mask, sel_count = _compact(
                                env, mask, compact_k, used_after)
                            cur_n = compact_k
                            extra = extra + (sel_count,)
                            extras_desc.append(("lead", compact_k))
                        if step[0] == "sm" and isinstance(step[1], L.Select):
                            m = sc.truth_mask(sc.eval_expr(step[1].predicate, env))
                            mask = m if mask is None else mask & m
                        elif step[0] == "sm":
                            for info, e in step[1].computed:
                                env[info.cid] = sc.eval_expr(e, env)
                        else:
                            prep = join_preps[si]
                            nargs = len(prep["arrays"])
                            rsc = None
                            if si in mid_caps:
                                rsc = _sorted_semi_compact(
                                    prep, arrs[i:i + nargs], env, mask,
                                    cur_n, mid_caps[si], used_from[si + 1])
                            if rsc is not None:
                                env, mask, rsc_count = rsc
                            else:
                                mask = _fused_join_step(
                                    prep, arrs[i:i + nargs], env, mask, cur_n)
                            i += nargs
                            if rsc is not None:
                                if si in join_sis:
                                    step_counts.append(rsc_count)
                                cur_n = mid_caps[si]
                                extra = extra + (rsc_count,)
                                extras_desc.append(("mid", si, mid_caps[si]))
                            elif si in join_sis:
                                # survivor count after every narrowing join:
                                # rides the outputs so the engine LEARNS
                                # where to compact (see mid_caps above)
                                if mask is None:
                                    step_counts.append(
                                        jnp.asarray(cur_n, jnp.int64))
                                elif mask.ndim == 0:
                                    step_counts.append(jnp.where(
                                        mask, jnp.int64(cur_n), jnp.int64(0)))
                                else:
                                    step_counts.append(
                                        jnp.sum(mask.astype(jnp.int64)))
                            if (rsc is None and si in mid_caps
                                    and mask is not None
                                    and mask.ndim != 0):
                                capv = mid_caps[si]
                                env, mask, sel_count = _compact(
                                    env, mask, capv, used_from[si + 1])
                                cur_n = capv
                                extra = extra + (sel_count,)
                                extras_desc.append(("mid", si, capv))
                    meta["extras"] = tuple(extras_desc)
                    meta["join_sis"] = tuple(
                        si for si in join_sis)
                    if not any(d[0] == "lead" for d in extras_desc):
                        meta["compact_k"] = None
                    if mask is not None and mask.ndim == 0:
                        mask = jnp.broadcast_to(mask, (cur_n,))
                    oob_cnt = None
                    offsets = None
                    if op.group_by:
                        key_cols = [env[c] for c in op.group_by]
                        key_cols = [sc._bcast(c, cur_n) for c in key_cols]
                        gid, domain = gb.dense_gid(key_cols)
                        radices = None
                        if gid is None and kbounds is not None:
                            # learned-bounds dense path (sort-free): codes
                            # are value - kmin; rows outside the calibrated
                            # bounds are counted and force a safe rebuild
                            gid, domain, radices, offsets, oob = \
                                gb.bounded_gid(key_cols, kbounds)
                            if gid is not None:
                                ob = oob if mask is None else (oob & mask)
                                oob_cnt = jnp.sum(ob.astype(jnp.int64))
                            elif kbounds is not None:
                                # learned bounds exist but the domain is
                                # too large: never try again for this plan
                                meta["kbounds_useless"] = True
                        if gid is None:
                            meta["mode"] = "general"
                            meta["key_templates"] = [
                                (c.type, c.dictionary, c.valid is not None)
                                for c in key_cols
                            ]
                            res = extra + _fused_general_group(
                                op, key_cols, env, mask, cur_n, meta,
                                presorted=presorted_group,
                                kg=(None if force_cal else
                                    cache.get(("fused_kg", basekey))))
                            if epi is not None and not meta.get("calibrating"):
                                res = _apply_topk_epi(op, epi, res, meta,
                                                      len(extra))
                            if meta.get("calibrating"):
                                # piggyback per-key value bounds on the
                                # count-only program: a later rebuild can
                                # pick the dense bounded-gid path
                                kb_outs = []
                                kb_kinds = []
                                for c in key_cols:
                                    if (gb.small_domain(c) is None
                                            and c.type.kind in (
                                                K.INT, K.BIGINT, K.DATE)
                                            and c.data.dtype in (
                                                jnp.int32, jnp.int64)):
                                        k64 = c.data.astype(jnp.int64)
                                        keep = (jnp.ones(k64.shape, jnp.bool_)
                                                if mask is None else mask)
                                        if c.valid is not None:
                                            keep = keep & c.valid
                                        big = jnp.int64(1) << jnp.int64(62)
                                        kb_outs.append(jnp.min(
                                            jnp.where(keep, k64, big)))
                                        kb_outs.append(jnp.max(
                                            jnp.where(keep, k64, -big)))
                                        kb_kinds.append(True)
                                    else:
                                        kb_kinds.append(False)
                                meta["kb_kinds"] = kb_kinds
                                res = res + tuple(kb_outs)
                            _ovf_ctx.__exit__(None, None, None)
                            flag = _ovf_bitmask(_ovf_sink)
                            return res + tuple(step_counts) + (flag,)
                        if radices is None:
                            radices = [gb.small_domain(c) for c in key_cols]
                    else:
                        gid = jnp.zeros((cur_n,), jnp.int32)
                        domain, radices = 1, []
                    meta["mode"] = "dense"
                    meta["domain"], meta["radices"] = domain, radices
                    meta["key_offsets"] = offsets
                    meta["has_oob"] = oob_cnt is not None
                    meta["key_templates"] = [
                        (env[c].type, env[c].dictionary, env[c].valid is not None)
                        for c in op.group_by
                    ]

                    def msum(w):
                        wm = w if mask is None else jnp.where(mask, w, jnp.zeros_like(w))
                        return be.segment_sum(wm, gid, num_segments=domain)

                    ones = jnp.ones((cur_n,), jnp.int64)
                    present = msum(ones)
                    outs = [present]
                    meta["agg_dicts"] = {}
                    meta["agg_limbs"] = set()
                    for spec in op.aggs:
                        arg = None if spec.arg is None else env[spec.arg]
                        if spec.fn == "count_star":
                            outs.append(present)
                            outs.append(present)
                            continue
                        avalid = arg.valid
                        vm = ones if avalid is None else avalid.astype(jnp.int64)
                        cnt = msum(vm)
                        if spec.fn == "count":
                            outs.append(cnt)
                            outs.append(cnt)
                            continue
                        if spec.fn == "sum":
                            data = arg.data.astype(jnp_dtype(spec.out.type))
                            if avalid is not None:
                                data = jnp.where(avalid, data, jnp.zeros_like(data))
                            if (spec.out.type.kind == K.DECIMAL
                                    and dec_is_wide(spec.out.type)
                                    and data.dtype == jnp.int64):
                                # exact i128-style sum: 32-bit-split accumulators
                                # (lo in [0,2^32), hi signed), recombined with
                                # Python ints on the host (ops/decwide.py)
                                meta["agg_limbs"].add(spec.out.cid)
                                lo = data & jnp.int64(0xFFFFFFFF)
                                hi = data >> jnp.int64(32)
                                outs.append(msum(hi))
                                outs.append(msum(lo))
                                outs.append(cnt)
                                continue
                            outs.append(msum(data))
                            outs.append(cnt)
                            continue
                        # min / max with full masking
                        sentinel = gb._extreme(arg.data.dtype, maximum=(spec.fn == "min"))
                        keep = mask if avalid is None else (
                            avalid if mask is None else (mask & avalid))
                        data = arg.data if keep is None else jnp.where(keep, arg.data, sentinel)
                        red = (be.segment_min if spec.fn == "min" else be.segment_max)(
                            data, gid, num_segments=domain)
                        meta["agg_dicts"][spec.out.cid] = arg.dictionary
                        outs.append(red)
                        outs.append(cnt)
                    # the packed fetch stacks equal-shape lanes: emit the survivor
                    # count as a (domain,)-sized lane like every other output
                    extra = tuple(jnp.broadcast_to(e, (domain,)) for e in extra)
                    _ovf_ctx.__exit__(None, None, None)
                    flag = _ovf_bitmask(_ovf_sink)
                    oob_lane = (() if oob_cnt is None else
                                (jnp.broadcast_to(oob_cnt, (domain,)),))
                    # (domain,)-shaped like every other lane: the packed fetch
                    # stacks equal shapes
                    return extra + tuple(outs) + oob_lane + tuple(
                        jnp.broadcast_to(c_, (domain,))
                        for c_ in step_counts) + (
                        jnp.broadcast_to(flag, (domain,)),)
                finally:
                    # idempotent (already exited on the return paths);
                    # guarantees the sink never outlives a failed trace
                    _ovf_ctx.__exit__(None, None, None)

            nopallas = bool(cache.get(("fused_nopallas", basekey)))
            # executable-store probe: a persisted PJRT executable skips the
            # Python TRACE entirely (~30-90 s per program at 60M shapes —
            # the dominant warm-cache warmup cost, r4). Keyed on everything
            # that shapes the traced program.
            from . import exestore

            # ranges-based sorted-semi compaction changes the traced program
            # for eligible steps: vary the exe-store material ONLY then, so
            # every other program keeps its cached executable
            _ssc = tuple(
                si for si in sorted(mid_caps)
                if (join_preps[si]["kind"] == "semi"
                    and join_preps[si].get("probe_sorted")
                    and join_preps[si].get("direct") is None
                    and not join_preps[si]["residual"]
                    and not join_preps[si]["payloads"]
                    and join_preps[si].get("probe_expr2") is None
                    and join_preps[si].get("maxdup", 1) <= 1
                    and join_preps[si]["nb"] > 0))
            exe_mat = (key,
                       tuple((tuple(a.shape), str(a.dtype)) for a in arrays),
                       compact_k, tuple(sorted(mid_caps.items())),
                       cache.get(("fused_kg", basekey)), nopallas,
                       pgather.FORCE_PALLAS, dv.SMALL_ROWS,
                       repr(kbounds), force_cal) + (
                           ("ssc", _ssc) if _ssc else ())
            exe_k = exestore.make_key(exe_mat)
            hit = exestore.get(exe_k)
            if hit is not None:
                compiled, meta = hit
                try:
                    t_c0 = self._perf_sync()
                    result = compiled(*arrays)
                    # sync HERE: a broken deserialized executable fails
                    # asynchronously, past any later guard — surface it now
                    # so the fallback below compiles fresh
                    jax.block_until_ready(result)
                    cache[key] = (compiled, meta, [t for t in templates])
                    self._perf_note(
                        f"fused_agg exe-store hit (no trace) "
                        f"{(self._perf_sync() - t_c0):.1f}s n={n}")
                except Exception:
                    hit = None
            if hit is None:
                try:
                    t_c0 = self._perf_sync()

                    def _lower_compile():
                        if nopallas:
                            # a previous run's windowed gathers overflowed
                            # (skewed density): retrace without Pallas
                            old_force = pgather.FORCE_PALLAS
                            pgather.FORCE_PALLAS = False
                            try:
                                return jax.jit(fn).lower(*arrays).compile()
                            finally:
                                pgather.FORCE_PALLAS = old_force
                        return jax.jit(fn).lower(*arrays).compile()

                    try:
                        compiled = _lower_compile()
                        result = compiled(*arrays)
                    except Exception as ce:
                        # the remote compile helper occasionally dies
                        # (SIGSEGV / HTTP 500) under memory pressure from
                        # big-shape compiles; one clean retry usually works
                        if "remote_compile" not in repr(ce):
                            raise
                        self._perf_note("fused_agg remote compile died; "
                                        "retrying once")
                        compiled = _lower_compile()
                        result = compiled(*arrays)
                    cache[key] = (compiled, meta, [t for t in templates])
                    if not meta.get("calibrating"):
                        exestore.put(exe_k, compiled, meta)
                    self._perf_note(
                        f"fused_agg compile+first-run "
                        f"{(self._perf_sync() - t_c0):.1f}s n={n} "
                        f"compact_k={compact_k} presorted={presorted_group}")
                    for d in pgather._OVF_DESC:
                        self._perf_note(f"fused gather {d}")
                except Exception as fe:  # non-traceable (UDFs, strings...)
                    self._perf_note(f"fused_agg DECLINED (trace/compile): "
                                    f"{type(fe).__name__}: {str(fe)[:160]}")
                    cache[key] = "eager"
                    return None
        else:
            compiled, meta, _t = cache[key]
            result = compiled(*arrays)

        compiled, meta, _t = cache[key]
        from . import device as dv

        try:
            n_sc = len(meta.get("join_sis", ()))
            if meta.get("mode") == "general" and meta.get("calibrating"):
                # count-only calibration program: learn the group capacity,
                # the per-join-step survivor counts, AND the per-key value
                # bounds, then rebuild the full program around them (runs
                # ONCE per plan+versions; all persist beside the compile
                # cache)
                import jax as _jax

                n_kb = 2 * sum(1 for x in meta.get("kb_kinds", ()) if x)
                tail = [np.asarray(a).reshape(-1)[0] for a in _jax.device_get(
                    list(result[-2 - n_sc - n_kb:-1]))]
                g = int(tail[0])
                tight = 1 << (max(4 * g, dv.SMALL_ROWS) - 1).bit_length()
                cache[("fused_kg", basekey)] = min(tight, meta.get("n", tight))
                del cache[key]
                from ..utils import capstore

                capstore.put(repr((basekey, n)), cache[("fused_kg", basekey)])
                if n_kb:
                    it = iter(int(x) for x in tail[1:1 + n_kb])
                    bounds = [(next(it), next(it)) if flagk else None
                              for flagk in meta["kb_kinds"]]
                    cache[("fused_kbounds", basekey)] = bounds
                    capstore.put("kbounds::" + repr((basekey, n)),
                                 [list(b) if b else None for b in bounds])
                elif meta.get("kb_kinds") is not None:
                    # calibration ran with bounds support but no key
                    # qualified: don't force another calibration for this
                    cache[("fused_kbounds_dead", basekey)] = True
                if n_sc:
                    counts = {si: int(c) for si, c in
                              zip(meta["join_sis"], tail[1 + n_kb:])}
                    cache[("fused_stepcaps", basekey)] = counts
                    capstore.put("stepcaps::" + repr((basekey, n)),
                                 {str(k2): v2 for k2, v2 in counts.items()})
                self._perf_note(f"fused_agg calibrated group capacity "
                                f"{cache[('fused_kg', basekey)]} (g={g}) "
                                f"stepcounts={meta.get('join_sis', ())}/"
                                f"{tail[1 + n_kb:]} "
                                f"kbounds={cache.get(('fused_kbounds', basekey))}")
                return self._try_fused_agg(op, epi)
            if meta.get("mode") == "general":
                if meta.get("epi") is not None:
                    vt_out = self._finish_fused_epi(op, result, meta)
                    applied = True
                else:
                    vt_out = self._finish_fused_general(op, result, meta)
                    applied = False
            else:
                # ONE packed transfer of all (domain,)-sized outputs;
                # group-slot extraction and key decoding happen in host
                # numpy, results live on the CPU backend
                host = dv.fetch_arrays_np(
                    {i: a for i, a in enumerate(result)})
                _g = int(np.asarray(host[len(result) - 1]).reshape(-1)[0])
                if _g > 0:
                    raise _GatherOverflow(_g)
                off = len(meta.get("extras", ()))
                self._check_fused_extras(meta, [
                    int(np.asarray(host[j]).reshape(-1)[0])
                    for j in range(off)])
                if meta.get("has_oob"):
                    oob_v = int(np.asarray(
                        host[len(result) - 2 - n_sc]).reshape(-1)[0])
                    if oob_v > 0:
                        raise _KBoundsOverflow(oob_v)
                if n_sc:
                    meta["last_stepcounts"] = {
                        si: int(np.asarray(
                            host[len(result) - 1 - n_sc + j]).reshape(-1)[0])
                        for j, si in enumerate(meta["join_sis"])}
                vt_out = self._finish_fused_dense(op, host, meta, off)
                applied = False
            # learn survivor counts from the first full run when no
            # calibration ran (capstore carried the group capacity): if a
            # compaction opportunity exists, the NEXT execution rebuilds
            # compacted (steady state converges on run 2)
            self._learn_stepcaps(basekey, key, cache, meta, n)
            if meta.get("kbounds_useless"):
                cache[("fused_kbounds_dead", basekey)] = True
            return _ret(vt_out, applied)
        except _CompactOverflow:
            # the sample-estimated survivor bound was too small: permanently
            # disable compaction for this (plan, versions) key and rebuild
            cache[("fused_nocompact", basekey)] = True
            del cache[key]
            return self._try_fused_agg(op, epi)
        except _MidCompactOverflow as mo:
            # a learned post-join survivor cap was outgrown (data changed):
            # record the observed count; the rebuild re-derives the cap with
            # fresh headroom or drops the compaction entirely
            si_o, v_o = mo.args
            stepcaps2 = dict(cache.get(("fused_stepcaps", basekey)) or {})
            stepcaps2[si_o] = int(v_o)
            cache[("fused_stepcaps", basekey)] = stepcaps2
            from ..utils import capstore

            capstore.put("stepcaps::" + repr((basekey, n)),
                         {str(k2): int(v2) for k2, v2 in stepcaps2.items()})
            del cache[key]
            self._perf_note(f"fused_agg mid-compaction cap exceeded at "
                            f"step {si_o} (count={v_o}); rebuilding")
            return self._try_fused_agg(op, epi)
        except _CapacityOverflow as ce:
            # the learned capacity was outgrown (data changed): double it
            g_real = ce.args[0]
            cache[("fused_kg", basekey)] = 1 << (2 * g_real - 1).bit_length()
            from ..utils import capstore

            capstore.put(repr((basekey, n)), cache[("fused_kg", basekey)])
            del cache[key]
            self._perf_note(f"fused_agg group capacity exceeded (g={g_real});"
                            f" rebuilding")
            return self._try_fused_agg(op, epi)
        except _GatherOverflow as ge:
            # skewed density overran a windowed gather: permanently switch
            # this (plan, versions) key to the non-Pallas variant and rerun
            self._perf_note(f"fused_agg gather overflow mask="
                            f"{bin(ge.args[0] if ge.args else 0)}: retrying "
                            f"without Pallas kernels")
            cache[("fused_nopallas", basekey)] = True
            del cache[key]
            return self._try_fused_agg(op, epi)
        except _EpiOverflow as eo:
            # the TopK candidate set could not be proven exact (ties at the
            # priority cutoff / wide-sum limb overflow): permanently fall
            # back to the plain program + eager epilogue for this plan
            self._perf_note(f"fused_topk epilogue declined: "
                            f"{eo.args[0] if eo.args else ''}")
            cache[("fused_epi_decline", basekey)] = True
            del cache[key]
            return self._try_fused_agg(op, epi)
        except _KBoundsOverflow as ko:
            # group-key values fell outside the calibrated bounds (cannot
            # happen within one table version; defensive): permanently drop
            # the bounded dense path for this plan and rebuild general
            self._perf_note(f"fused_agg key bounds exceeded "
                            f"({ko.args[0] if ko.args else '?'} rows); "
                            f"rebuilding without bounded dense")
            cache[("fused_kbounds_dead", basekey)] = True
            cache.pop(("fused_kbounds", basekey), None)
            del cache[key]
            return self._try_fused_agg(op, epi)

    def _check_fused_extras(self, meta, vals) -> None:
        """Validate each compaction's true survivor count against its static
        capacity (vals: fetched ints, one per extras slot, in order)."""
        for desc, v in zip(meta.get("extras", ()), vals):
            if desc[0] == "lead" and v > desc[1]:
                raise _CompactOverflow()
            if desc[0] == "mid" and v > desc[2]:
                raise _MidCompactOverflow(desc[1], v)

    def _learn_stepcaps(self, basekey, key, cache, meta, n) -> None:
        """After a successful full run that recorded per-join-step survivor
        counts: if the counts reveal an unexploited compaction opportunity,
        persist them and drop the compiled entry so the next execution
        rebuilds survivor-sized."""
        counts = meta.get("last_stepcounts")
        if not counts or cache.get(("fused_stepcaps", basekey)):
            return
        from . import device as dv

        size = meta.get("compact_k") or n
        worth = False
        for si in meta.get("join_sis", ()):
            obs = counts.get(si)
            if obs is None:
                continue
            capv = 1 << (max(2 * obs, dv.SMALL_ROWS) - 1).bit_length()
            if capv <= size // 4:
                worth = True
                size = capv
        cache[("fused_stepcaps", basekey)] = counts
        from ..utils import capstore

        capstore.put("stepcaps::" + repr((basekey, n)),
                     {str(k2): int(v2) for k2, v2 in counts.items()})
        if worth and key in cache:
            del cache[key]
            self._perf_note(f"fused_agg learned step survivor counts "
                            f"{counts}; next run rebuilds compacted")

    def _finish_fused_dense(self, op, host, meta, off) -> VTable:
        from . import device as dv

        present = host[off]
        domain, radices = meta["domain"], meta["radices"]
        cpu, _accel = dv.devices()

        def cpu_col(t, data_np, valid_np, dictionary=None):
            return SCol(t, np.asarray(data_np),
                        None if valid_np is None else np.asarray(valid_np),
                        dictionary)

        if op.group_by:
            slots_np = np.flatnonzero(present > 0)
            g = len(slots_np)
            if g == 0:
                return VTable({c.cid: _empty_scol(c.type) for c in op.output_cols()}, 0)
            rem = slots_np
            codes = []
            for r in reversed(radices):
                codes.append(rem % r)
                rem = rem // r
            codes.reverse()
            agg_cols: dict[int, SCol] = {}
            offsets = meta.get("key_offsets") or [None] * len(op.group_by)
            for pos, cid in enumerate(op.group_by):
                ktype, kdict, knullable = meta["key_templates"][pos]
                code = codes[pos]
                r = radices[pos]
                valid = (code != (r - 1)) if knullable else None
                if offsets[pos] is not None:
                    # bounded dense codes are value - kmin (gb.bounded_gid)
                    code = code + offsets[pos]
                agg_cols[cid] = cpu_col(
                    ktype, code.astype(np.dtype(jnp_dtype(ktype))), valid, kdict)
            idx = off + 1
            for spec in op.aggs:
                if spec.out.cid in meta.get("agg_limbs", ()):
                    from ..ops import decwide

                    val = decwide.demote_if_possible(decwide.combine_limbs(
                        host[idx][slots_np], host[idx + 1][slots_np]))
                    cnt = host[idx + 2][slots_np]
                    idx += 3
                else:
                    val, cnt = host[idx][slots_np], host[idx + 1][slots_np]
                    idx += 2
                agg_cols[spec.out.cid] = self._finish_fused_agg(
                    spec, val, cnt, cpu_col, meta["agg_dicts"].get(spec.out.cid))
            out = {c.cid: agg_cols[c.cid] for c in op.group_cols}
            for spec in op.aggs:
                out[spec.out.cid] = agg_cols[spec.out.cid]
            return VTable(out, g)
        # global aggregate: exactly one row
        idx = off + 1
        out = {}
        for spec in op.aggs:
            if spec.out.cid in meta.get("agg_limbs", ()):
                from ..ops import decwide

                val = decwide.demote_if_possible(
                    decwide.combine_limbs(host[idx], host[idx + 1]))
                cnt = host[idx + 2]
                idx += 3
            else:
                val, cnt = host[idx], host[idx + 1]
                idx += 2
            out[spec.out.cid] = self._finish_fused_agg(
                spec, val, cnt, cpu_col, meta["agg_dicts"].get(spec.out.cid))
        return VTable(out, 1)

    def _finish_fused_general(self, op, result, meta) -> VTable:
        """Mode 'general' epilogue: ONE small fetch (group count, compaction
        survivor count, wide-sum overflow flag), then slice the padded
        outputs to the exact group count ON DEVICE and build device-resident
        columns. Group results never round-trip through the host: at TPC-H
        scale the old fetch-everything finish moved 100+ MB per query
        through a ~25 MB/s tunnel and the downstream operator re-uploaded it
        (r4 profiling: q3's 2.3s runs were this, not compute)."""
        from . import device as dv

        off = len(meta.get("extras", ()))
        n_sc = len(meta.get("join_sis", ()))
        lane_end = -1 - n_sc  # trailing per-join-step survivor counts + flag
        limb_slots = []  # (hi, lo) positions in result for wide sums
        i = off + 1
        for pos, cid in enumerate(op.group_by):
            i += 1 + (1 if meta["key_templates"][pos][2] else 0)
        for spec in op.aggs:
            if spec.out.cid in meta.get("agg_limbs", ()):
                limb_slots.append((i, i + 1))
                i += 3
            else:
                i += 2
        fetch = {str(i_): result[i_] for i_ in range(off + 1)}
        fetch["govf"] = result[-1]  # windowed-gather overflow flag
        for j in range(n_sc):
            fetch[f"sc{j}"] = result[lane_end + j]
        if limb_slots:
            # wide sums combine exactly into one int64 unless a group's
            # high limb leaves the safe band; check on device, fetch the
            # single flag WITH the scalars (no extra round trip). Padding
            # tail rows carry gather garbage, so the check masks rows
            # beyond the (device-side) group count.
            nrows = result[off + 1].shape[0]
            rows_ok = jnp.arange(nrows, dtype=jnp.int64) < result[off]
            flag = jnp.zeros((), jnp.bool_)
            for hi_s, _lo_s in limb_slots:
                hi = result[hi_s]
                bad = (jnp.abs(hi) >> jnp.int64(30)) > 0
                flag = flag | jnp.any(bad & rows_ok)
            fetch["limbflag"] = flag
        scalars = dv.fetch_arrays_np(fetch)
        govf = int(np.asarray(scalars["govf"]).reshape(-1)[0])
        if govf > 0:
            raise _GatherOverflow(govf)
        self._check_fused_extras(meta, [
            int(np.asarray(scalars[str(j)]).reshape(-1)[0])
            for j in range(off)])
        if n_sc:
            meta["last_stepcounts"] = {
                si: int(np.asarray(scalars[f"sc{j}"]).reshape(-1)[0])
                for j, si in enumerate(meta["join_sis"])}
        g = int(scalars[str(off)])
        meta["last_g"] = g
        if g > meta.get("kg", g):
            raise _CapacityOverflow(g)
        if g == 0:
            return VTable({c.cid: _empty_scol(c.type) for c in op.output_cols()}, 0)
        limb_overflow = bool(np.asarray(scalars.get("limbflag", False)))
        sliced = _slice_exact(tuple(result[off + 1:lane_end]), g)

        def dev_col(t, data, valid, dictionary=None):
            return SCol(t, data, valid, dictionary)

        agg_cols: dict[int, SCol] = {}
        i = 0
        for pos, cid in enumerate(op.group_by):
            ktype, kdict, knull = meta["key_templates"][pos]
            data = sliced[i]
            i += 1
            valid = None
            if knull:
                valid = sliced[i]
                i += 1
            agg_cols[cid] = dev_col(ktype, data, valid, kdict)
        for spec in op.aggs:
            if spec.out.cid in meta.get("agg_limbs", ()):
                hi, lo2, cnt = sliced[i], sliced[i + 1], sliced[i + 2]
                i += 3
                if limb_overflow:
                    # pathological magnitude: exact host path (object ints)
                    from ..ops import decwide

                    h = dv.fetch_arrays_np({0: hi, 1: lo2, 2: cnt})
                    val = decwide.demote_if_possible(
                        decwide.combine_limbs(h[0], h[1]))
                    agg_cols[spec.out.cid] = SCol(
                        spec.out.type, val, np.asarray(h[2]) > 0,
                        meta["agg_dicts"].get(spec.out.cid))
                    continue
                val = (hi << jnp.int64(32)) + lo2
                agg_cols[spec.out.cid] = dev_col(
                    spec.out.type, val, cnt > 0,
                    meta["agg_dicts"].get(spec.out.cid))
                continue
            val, cnt = sliced[i], sliced[i + 1]
            i += 2
            agg_cols[spec.out.cid] = self._finish_fused_agg(
                spec, val, cnt, dev_col, meta["agg_dicts"].get(spec.out.cid))
        out = {c.cid: agg_cols[c.cid] for c in op.group_cols}
        for spec in op.aggs:
            out[spec.out.cid] = agg_cols[spec.out.cid]
        return VTable(out, g)

    def _finish_fused_epi(self, op, result, meta) -> VTable:
        """TopK-epilogue finish: ONE scalar fetch (compaction survivor
        count, group count, tie count at the candidate cutoff, wide-limb
        flag, gather-overflow flag), then slice the (kk,)-sized candidate
        lanes to the true candidate count. Returns a device-resident VTable
        of TopK CANDIDATES — a proven superset of the true top k under the
        full sort order — which the caller re-sorts exactly and slices.

        Exactness argument: candidates are the kk best rows by the primary
        key's priority image (ops/keys.py topk_priority). If the number of
        rows tying or beating the cutoff priority equals kk (tie_cnt <= kk
        checked below), every row with priority >= cutoff is a candidate;
        the true top-k rows all have priority >= the k-th best >= cutoff,
        so they are contained. Otherwise _EpiOverflow falls back safely."""
        from . import device as dv

        e = meta["epi"]
        off = len(meta.get("extras", ()))
        n_sc = len(meta.get("join_sis", ()))
        lane_end = -1 - n_sc
        fetch = {str(i): result[i] for i in range(off + 3)}
        fetch["govf"] = result[-1]
        for j in range(n_sc):
            fetch[f"sc{j}"] = result[lane_end + j]
        scalars = dv.fetch_arrays_np(fetch)
        govf = int(np.asarray(scalars["govf"]).reshape(-1)[0])
        if govf > 0:
            raise _GatherOverflow(govf)
        self._check_fused_extras(meta, [
            int(np.asarray(scalars[str(j)]).reshape(-1)[0])
            for j in range(off)])
        if n_sc:
            meta["last_stepcounts"] = {
                si: int(np.asarray(scalars[f"sc{j}"]).reshape(-1)[0])
                for j, si in enumerate(meta["join_sis"])}
        g = int(scalars[str(off)])
        meta["last_g"] = g
        if g > meta.get("kg", g):
            raise _CapacityOverflow(g)
        if self.track_tuples is not None:
            # the Aggregate op never passes through run() on this path;
            # record its true group count for EXPLAIN ANALYZE
            self.track_tuples[id(op)] = g
        tie_cnt = int(np.asarray(scalars[str(off + 1)]).reshape(-1)[0])
        limb = bool(np.asarray(scalars[str(off + 2)]).reshape(-1)[0])
        kk = e["kk"]
        if limb:
            raise _EpiOverflow("wide-sum limb overflow")
        if g > kk and tie_cnt > kk:
            raise _EpiOverflow(f"tie overflow at cutoff ({tie_cnt} > {kk})")
        if g == 0:
            cols = {cid: _empty_scol(t) for cid, t, _d, _v in e["templates"]}
            return VTable(cols, 0)
        ncand = min(g, kk)
        sliced = _slice_exact(tuple(result[off + 3:lane_end]), ncand)
        cols = {}
        i = 0
        for cid, t, d, has_valid in e["templates"]:
            data = sliced[i]
            i += 1
            valid = None
            if has_valid:
                valid = sliced[i]
                i += 1
            cols[cid] = SCol(t, data, valid, d)
        return VTable(cols, ncand)

    def _finish_fused_agg(self, spec, val, cnt, cpu_col, dictionary) -> SCol:
        t = spec.out.type
        if spec.fn in ("count", "count_star"):
            return cpu_col(t, val.astype(np.int64), None)
        return cpu_col(t, val, cnt > 0, dictionary)

    # ------------------------------------------------------------- aggregate
    def _run_aggregate(self, op: L.Aggregate) -> VTable:
        fused = self._try_fused_agg(op)
        if fused is not None:
            return fused
        vt = self.run(op.child)
        sharded = self._try_sharded_agg(op, vt)
        if sharded is not None:
            return sharded
        vt = vt.dense()
        n = vt.num_rows
        key_cols = [vt.col(c) for c in op.group_by]
        if op.group_by:
            if n == 0:
                return VTable({c.cid: _empty_scol(c.type) for c in op.output_cols()}, 0)
            grp = gb.group_rows(key_cols, n)
        else:
            grp = {
                "seg": jnp.zeros((n,), jnp.int32),
                "order": None,
                "num_groups": 1,
                "rep_rows": jnp.zeros((1,), jnp.int64),
                "sorted": True,
            }
        cols: dict[int, SCol] = {}
        for info in op.group_cols:
            cols[info.cid] = vt.col(info.cid).take(grp["rep_rows"])
        for spec in op.aggs:
            arg = None if spec.arg is None else vt.col(spec.arg)
            if spec.distinct and spec.fn in ("count", "sum"):
                cols[spec.out.cid] = gb.distinct_reduce(spec.fn, key_cols, arg, grp, spec.out.type, n)
                continue
            # distinct is a no-op for min/max; avg distinct was decomposed by
            # the binder into sum distinct / count distinct
            cols[spec.out.cid] = gb.aggregate(spec.fn, arg, spec.out.type, grp)
        return VTable(cols, grp["num_groups"])

    # ------------------------------------------------------------- joins
    def _perf_note(self, msg: str) -> None:
        """PERF-mode detail line (strategy taken, per-phase split) — the
        observability VERDICT r3 weak #9 asked for: 'Join: 7543ms' must say
        WHICH strategy ran and where inside it the time went."""
        if self.last_op_profile is not None:
            import sys

            print(f"# perf {msg}", file=sys.stderr)

    def _perf_sync(self, *arrays) -> float:
        """In PERF mode: block on device work and return a timestamp so join
        phases attribute honestly (device completion otherwise lands on the
        next host sync). No-op outside PERF."""
        import time as _time

        if self.last_op_profile is not None:
            try:
                jax.block_until_ready([a for a in arrays if a is not None])
            except Exception:
                pass
        return _time.perf_counter()

    def _run_join(self, op: L.Join) -> VTable:
        fused = self._try_fused_chain(op)
        if fused is not None:
            return fused
        from . import device as dv

        lvt = self.run(op.left)
        rvt = self.run(op.right)
        lvt, rvt = dv.align_devices(lvt, rvt)
        kind = op.kind
        nl, nr = lvt.num_rows, rvt.num_rows

        if kind == "cross" and op.predicate is None:
            return self._cross(lvt.dense(), rvt.dense())

        # empty-side early outs (also avoid gathers from empty arrays)
        if nl == 0 or nr == 0:
            if kind in ("inner", "cross", "semi"):
                if nl == 0:
                    cols = {**{cid: _empty_like(c) for cid, c in lvt.cols.items()}}
                else:
                    cols = {cid: _empty_like(c) for cid, c in lvt.cols.items()}
                if kind in ("inner", "cross"):
                    for c in op.right.output_cols():
                        cols[c.cid] = _empty_like(rvt.col(c.cid)) if nr else _empty_scol(c.type)
                return VTable(cols, 0)
            if kind == "anti":
                return lvt
            if kind == "mark":
                cols = dict(lvt.cols)
                cols[op.mark_col.cid] = SCol(
                    op.mark_col.type, jnp.zeros((nl,), jnp.bool_), None)
                return VTable(cols, nl)
            if kind in ("left", "single"):
                if nl == 0:
                    cols = {cid: _empty_like(c) for cid, c in lvt.cols.items()}
                    for c in op.right.output_cols():
                        cols[c.cid] = _empty_scol(c.type)
                    return VTable(cols, 0)
                cols = dict(lvt.cols)
                for c in op.right.output_cols():
                    cols[c.cid] = _null_scol_typed(c.type, nl)
                return VTable(cols, nl)
            if kind == "full":
                if nl == 0 and nr == 0:
                    cols = {c.cid: _empty_scol(c.type) for c in op.output_cols()}
                    return VTable(cols, 0)
                if nr == 0:
                    cols = dict(lvt.cols)
                    for c in op.right.output_cols():
                        cols[c.cid] = _null_scol_typed(c.type, nl)
                    return VTable(cols, nl)
                cols = {cid: _null_scol_typed(lvt.col(cid).type, nr) for cid in lvt.cols}
                for c in op.right.output_cols():
                    cols[c.cid] = rvt.col(c.cid)
                return VTable(cols, nr)

        lcids = {c.cid for c in op.left.output_cols()}
        rcids = {c.cid for c in op.right.output_cols()}
        lkeys, rkeys, null_safe = extract_equi_keys(op.predicate, lcids, rcids)

        if not lkeys:
            lvt, rvt = lvt.dense(), rvt.dense()
            nl, nr = lvt.num_rows, rvt.num_rows
            # no equi keys: nested loop via cross-product pairs; large inputs
            # go through the blockwise driver so pair buffers never exceed
            # 2^26 (reference: morsel-wise nested-loop join — any size)
            if nl * nr > (1 << 26):
                return self._chunked_nonequi_join(op, kind, lvt, rvt)
            pidx, bidx, total = _all_pairs(nl, nr)
        else:
            def _eval_keys():
                lk, rk = [], []
                for le, re_ in zip(lkeys, rkeys):
                    a = sc.eval_expr(le, lvt.cols)
                    b = sc.eval_expr(re_, rvt.cols)
                    a, b = _unify_string_keys(a, b)
                    lk.append(sc._bcast(a, nl))
                    rk.append(sc._bcast(b, nr))
                return lk, rk

            lk, rk = _eval_keys()
            if (kind in ("inner", "semi", "anti", "left", "mark", "single",
                         "full")
                    and op.null_aware is None):
                sharded = self._try_sharded_join(op, kind, lvt, rvt, lk, rk,
                                                 null_safe)
                if sharded is not None:
                    self._perf_note(f"join strategy=sharded kind={kind} "
                                    f"nl={nl} nr={nr}")
                    return sharded
            if lvt.row_valid is not None or rvt.row_valid is not None:
                # non-sharded strategies index dense layouts
                lvt, rvt = lvt.dense(), rvt.dense()
                nl, nr = lvt.num_rows, rvt.num_rows
                lk, rk = _eval_keys()
            fast = self._try_unique_key_join(op, kind, lvt, rvt, lk, rk,
                                             null_safe)
            if fast is None and kind == "inner":
                # inner joins are symmetric: when the right build side has
                # duplicate keys (the FK side) but the LEFT side is unique
                # (the PK side — Q3's customer x orders on custkey), probe
                # with the right side over a LEFT-side LUT instead of
                # falling to the hash-sort pairs path (reference analogue:
                # hash-join side selection, OptimizeImplementations.cpp
                # chooses build side by cardinality/uniqueness)
                fast = self._try_unique_key_join(op, kind, rvt, lvt, rk, lk,
                                                 null_safe, flipped=True)
            if fast is not None:
                return fast
            # probe with the left side, build on the right
            t0 = self._perf_sync()
            pidx, bidx, total = joinops.candidate_pairs(rk, lk, nr, nl, tuple(null_safe))
            t1 = self._perf_sync(pidx, bidx)
            self._perf_note(f"join strategy=candidate_pairs kind={kind} "
                            f"nl={nl} nr={nr} pairs={total} "
                            f"gen={(t1 - t0) * 1e3:.1f}ms")

        return self._finish_pairs_join(op, kind, lvt, rvt, pidx, bidx, total)

    def _try_unique_key_join(self, op, kind, lvt, rvt, lk, rk,
                             null_safe, flipped: bool = False) -> Optional[VTable]:
        """Direct-LUT eager join for single-int-key joins whose build side
        (right) has unique, densely-spanned keys — the common FK shape.
        Probes are ONE gather (through the Pallas kernels, ops/pgather.py)
        instead of candidate_pairs' hash-sort + ~21 searchsorted gather
        rounds, and sorted probe columns (TPC-H lineitem.l_orderkey) hit the
        monotone windowed-gather kernel. Returns None when the shape doesn't
        apply (duplicates, sparse span, composite keys, residual predicate).
        Reference analogue: indexNestedLoop selection on key-FD joins,
        OptimizeImplementations.cpp:580-660."""
        if (len(lk) != 1 or any(null_safe)
                or getattr(op, "null_aware", None) is not None
                or kind not in ("inner", "semi", "anti", "left", "mark",
                                "single")
                or len(E.conjuncts(op.predicate)) != 1):
            return None
        pk, bk = lk[0], rk[0]
        if (is_obj(pk.data) or is_obj(bk.data)
                or not jnp.issubdtype(pk.data.dtype, jnp.integer)
                or not jnp.issubdtype(bk.data.dtype, jnp.integer)):
            return None
        nl, nr = lvt.num_rows, rvt.num_rows
        # persisted hash-index payload: when the build side is an unfiltered
        # base-table scan with a declared index on this key, the direct LUT
        # comes from the catalog (loaded from `<index>.idx` on reopen, never
        # rebuilt — reference: LingoDBHashIndex.cpp file-backed index)
        payload = self._persisted_dense_lut(op, flipped)
        if payload is not None and payload["rows"] == nr:
            from ..storage import hashindex as hx

            bmin = payload["kmin"]
            span = payload["span"]
            n_valid = payload["n_valid"]
            if n_valid == 0:
                return None
            lut = (hx.device_lut(payload) if be.is_jax(pk.data)
                   else payload["lut"])
            self._perf_note(f"join strategy=persisted_lut kind={kind} "
                            f"span={span} nb={n_valid} flipped={flipped}")
            return self._finish_unique_key_join(
                op, kind, lvt, rvt, pk, lut, bmin, span, nl, flipped)
        if nr > (1 << 25):
            return None  # LUT build cost outgrows the probe win
        t_lut0 = self._perf_sync()
        bkd = bk.data.astype(jnp.int64)
        if bk.valid is not None:
            big = jnp.int64(1 << 62)
            bmin = int(jnp.min(jnp.where(bk.valid, bkd, big)))
            bmax = int(jnp.max(jnp.where(bk.valid, bkd, -big)))
            n_valid = int(jnp.sum(bk.valid))
        else:
            bmin, bmax = int(jnp.min(bkd)), int(jnp.max(bkd))
            n_valid = nr
        if n_valid == 0:
            return None
        span = bmax - bmin + 1
        if span > (1 << 26) or (span > 8 * nr and n_valid < (span >> 7)):
            return None
        tgt = (bkd - bmin).astype(jnp.int64)
        if bk.valid is not None:
            tgt = jnp.where(bk.valid, tgt, span)
        if be.is_jax(tgt) and span <= (1 << 22):
            import jax.numpy as jx

            lut = jx.full((span + 1,), -1, jx.int32)
            lut = lut.at[tgt].set(jx.arange(nr, dtype=jx.int32))[:span]
        elif be.is_jax(tgt):
            # big spans build on the HOST and upload once: the XLA device
            # scatter serializes (~15s for a 60M-span LUT at SF10) while
            # fetch(12MB) + numpy fill + upload(240MB) costs ~2s
            import jax as _jax

            t_np = np.asarray(_jax.device_get(tgt))
            lut_np = np.full(span + 1, -1, np.int32)
            lut_np[t_np] = np.arange(nr, dtype=np.int32)
            lut = _jax.device_put(lut_np[:span])
        else:
            lut = np.full(span + 1, -1, np.int32)
            lut[np.asarray(tgt)] = np.arange(nr, dtype=np.int32)
            lut = lut[:span]
        if int(jnp.sum(lut >= 0)) != n_valid:
            return None  # duplicate build keys: not a unique-key join
        t_lut1 = self._perf_sync(lut)
        self._perf_note(f"join strategy=session_lut kind={kind} span={span} "
                        f"nb={n_valid} flipped={flipped} "
                        f"lut_build={(t_lut1 - t_lut0) * 1e3:.1f}ms")
        return self._finish_unique_key_join(
            op, kind, lvt, rvt, pk, lut, bmin, span, nl, flipped)

    def _persisted_dense_lut(self, op, flipped: bool = False) -> Optional[dict]:
        """The dense LUT payload of a declared hash index covering this
        join's single equi key, when the build side is a base-table scan.
        Scan restrictions are allowed: filtering preserves order, so the
        caller's `payload rows == build rows` check proves no row was dropped
        and payload row ids equal build-side positions (inferred
        `IS NOT NULL` restrictions on indexed keys are the common case)."""
        r = op.left if flipped else op.right
        if not isinstance(r, L.Scan):
            return None
        cat = self.session.catalog
        entry = cat.get_table(r.table)
        if entry is None or not entry.indexes:
            return None
        cj = E.conjuncts(op.predicate)
        if len(cj) != 1:
            return None
        c = cj[0]
        from ..plan.exprs import Call, ColRef as CR

        if not (isinstance(c, Call) and c.op == "eq"):
            return None
        cid_to_name = {cc.cid: cc.name for cc in r.cols}
        name = next((cid_to_name[a.cid] for a in c.args
                     if isinstance(a, CR) and a.cid in cid_to_name), None)
        if name is None:
            return None
        iname = entry.index_on([name])
        if iname is None:
            return None
        p = entry.index_payload(iname, cat.db_dir, cat.persist)
        return p if p.get("kind") == "dense" else None

    def _finish_unique_key_join(self, op, kind, lvt, rvt, pk, lut, bmin,
                                span, nl, flipped: bool = False) -> VTable:
        """Probe a unique-key direct LUT (built in-session or loaded from a
        persisted index payload) and assemble the join result. With
        flipped=True (inner only) lvt is the original RIGHT side probing a
        LEFT-side LUT; output columns are identical either way (VTables are
        cid-keyed)."""
        build_cols = (op.left if flipped else op.right).output_cols()
        nr = rvt.num_rows
        t_p0 = self._perf_sync()
        pkd = pk.data.astype(jnp.int64)
        p_sorted = nl >= pgather.MIN_N and bool(jnp.all(pkd[1:] >= pkd[:-1]))
        off = pkd - bmin
        offc = jnp.clip(off, 0, span - 1).astype(jnp.int32)
        pos = pgather.take_fast(lut, offc, monotone=p_sorted)
        found = (off >= 0) & (off < span) & (pos >= 0)
        if pk.valid is not None:
            found = found & pk.valid
        pos = jnp.maximum(pos, 0)
        if p_sorted:
            # misses carry the previous hit's position so payload gathers
            # stay monotone (masked by `found`)
            masked = jnp.where(found, pos, 0)
            pos = (jax.lax.cummax(masked) if be.is_jax(masked)
                   else np.maximum.accumulate(masked))
        t_p1 = self._perf_sync(pos, found)
        self._perf_note(f"join phase=probe sorted={p_sorted} nl={nl} "
                        f"{(t_p1 - t_p0) * 1e3:.1f}ms")
        if kind == "semi":
            return lvt.select_mask(found)
        if kind == "anti":
            return lvt.select_mask(~found)
        if kind == "mark":
            cols = dict(lvt.cols)
            cols[op.mark_col.cid] = SCol(op.mark_col.type, found, None)
            return VTable(cols, nl)
        if kind in ("left", "single"):
            cols = dict(lvt.cols)
            for c in build_cols:
                cols[c.cid] = rvt.col(c.cid).take_with_invalid(
                    pos, ~found, monotone=p_sorted)
            return VTable(cols, nl)
        # inner: compact matching probe rows once, gather both sides
        keep = int(jnp.sum(found))
        if keep == 0:
            cols = {cid: _empty_like(c) for cid, c in lvt.cols.items()}
            for c in build_cols:
                cols[c.cid] = _empty_like(rvt.col(c.cid))
            return VTable(cols, 0)
        t_c0 = self._perf_sync()
        _, li = pgather.nonzero_positions(found, keep)
        ri = pgather.take_fast(pos, li, monotone=True)
        t_c1 = self._perf_sync(li, ri)
        out = lvt.take(li, keep, monotone=True)
        rcols = VTable({c.cid: rvt.col(c.cid)
                        for c in build_cols
                        if c.cid in rvt.cols}, nr).take(ri, keep,
                                                        monotone=p_sorted)
        t_c2 = self._perf_sync(*[c.data for c in out.cols.values()],
                               *[c.data for c in rcols.cols.values()])
        self._perf_note(f"join phase=compact+gather keep={keep} "
                        f"compact={(t_c1 - t_c0) * 1e3:.1f}ms "
                        f"payload={(t_c2 - t_c1) * 1e3:.1f}ms")
        return out.merge(rcols)

    def _finish_pairs_join(self, op, kind, lvt, rvt, pidx, bidx, total) -> VTable:
        """Evaluate the full predicate on candidate pairs and assemble the
        join result for every join kind."""
        nl, nr = lvt.num_rows, rvt.num_rows
        if total > 0 and op.predicate is not None:
            env = _pair_env(lvt, rvt, pidx, bidx, op.predicate)
            mask = sc.truth_mask(sc.eval_expr(op.predicate, env))
            mask = jnp.broadcast_to(mask, (total,))
        else:
            mask = jnp.ones((total,), jnp.bool_)

        null_aware = getattr(op, "null_aware", None)

        if kind in ("inner", "cross"):
            keep = int(jnp.sum(mask)) if total else 0
            (sel,) = jnp.nonzero(mask, size=keep) if keep else (jnp.zeros((0,), jnp.int64),)
            li, ri = pidx[sel], bidx[sel]
            return _combine(lvt, rvt, li, ri, keep)
        if kind in ("semi", "anti", "mark"):
            matched = joinops.matched_flags(pidx, mask, nl) if total else jnp.zeros((nl,), jnp.bool_)
            if kind == "semi":
                return lvt.select_mask(matched)
            if kind == "anti":
                keep_mask = ~matched
                if null_aware is not None:
                    keep_mask = self._null_aware_fix(null_aware, lvt, rvt, keep_mask)
                return lvt.select_mask(keep_mask)
            cols = dict(lvt.cols)
            cols[op.mark_col.cid] = SCol(op.mark_col.type, matched, None)
            return VTable(cols, nl)
        if kind == "single":
            first, found = joinops.first_match(pidx, mask, nl) if total else (
                jnp.zeros((nl,), jnp.int64), jnp.zeros((nl,), jnp.bool_))
            ri = jnp.where(found, jnp.take(bidx, first) if total else 0, 0)
            cols = dict(lvt.cols)
            for c in op.right.output_cols():
                cols[c.cid] = rvt.col(c.cid).take_with_invalid(ri, ~found)
            return VTable(cols, nl)
        if kind == "left":
            matched = joinops.matched_flags(pidx, mask, nl) if total else jnp.zeros((nl,), jnp.bool_)
            keep = int(jnp.sum(mask)) if total else 0
            (sel,) = jnp.nonzero(mask, size=keep) if keep else (jnp.zeros((0,), jnp.int64),)
            li, ri = (pidx[sel], bidx[sel]) if total else (jnp.zeros((0,), jnp.int64),) * 2
            inner = _combine(lvt, rvt, li, ri, keep)
            n_unmatched = int(jnp.sum(~matched))
            if n_unmatched == 0:
                return inner
            (ui,) = jnp.nonzero(~matched, size=n_unmatched)
            outer_cols = {}
            for cid, c in lvt.cols.items():
                outer_cols[cid] = c.take(ui)
            for c in op.right.output_cols():
                outer_cols[c.cid] = _null_scol(rvt.col(c.cid), n_unmatched)
            return _vconcat(inner, VTable(outer_cols, n_unmatched), op.output_cols())
        if kind == "full":
            matched_l = joinops.matched_flags(pidx, mask, nl) if total else jnp.zeros((nl,), jnp.bool_)
            matched_r = joinops.matched_flags(bidx, mask, nr) if total else jnp.zeros((nr,), jnp.bool_)
            keep = int(jnp.sum(mask)) if total else 0
            (sel,) = jnp.nonzero(mask, size=keep) if keep else (jnp.zeros((0,), jnp.int64),)
            li, ri = (pidx[sel], bidx[sel]) if total else (jnp.zeros((0,), jnp.int64),) * 2
            parts = [_combine(lvt, rvt, li, ri, keep)]
            n_ul = int(jnp.sum(~matched_l))
            if n_ul:
                (ui,) = jnp.nonzero(~matched_l, size=n_ul)
                cols = {cid: c.take(ui) for cid, c in lvt.cols.items()}
                for c in op.right.output_cols():
                    cols[c.cid] = _null_scol(rvt.col(c.cid), n_ul)
                parts.append(VTable(cols, n_ul))
            n_ur = int(jnp.sum(~matched_r))
            if n_ur:
                (ui,) = jnp.nonzero(~matched_r, size=n_ur)
                cols = {cid: _null_scol(lvt.col(cid), n_ur) for cid in lvt.cols}
                for c in op.right.output_cols():
                    cols[c.cid] = rvt.col(c.cid).take(ui)
                parts.append(VTable(cols, n_ur))
            out = parts[0]
            for p in parts[1:]:
                out = _vconcat(out, p, op.output_cols())
            return out
        raise ExecError(f"unsupported join kind {kind}")

    def _chunked_nonequi_join(self, op, kind, lvt: VTable, rvt: VTable) -> VTable:
        """Blockwise nested loop for non-equi joins whose full pair matrix
        exceeds the 2^26 buffer bound: the left side processes in chunks of
        C = 2^26 / nr rows against the whole right side, so every kind's
        per-left-row decisions stay exact (reference: the morsel-driven
        nested-loop join handles any size; we match that without ever
        materializing more than one chunk of pairs)."""
        nl, nr = lvt.num_rows, rvt.num_rows
        C = max(1, (1 << 26) // max(nr, 1))
        parts: list[VTable] = []
        matched_r = jnp.zeros((nr,), jnp.bool_)  # for full: right side matched
        chunk_kind = "left" if kind == "full" else kind
        for lo in range(0, nl, C):
            hi = min(lo + C, nl)
            idx = jnp.arange(lo, hi, dtype=jnp.int64)
            lch = lvt.take(idx, hi - lo)
            pidx, bidx, total = _all_pairs(hi - lo, nr)
            if kind == "full":
                env = _pair_env(lch, rvt, pidx, bidx, op.predicate)
                mask = jnp.broadcast_to(
                    sc.truth_mask(sc.eval_expr(op.predicate, env)), (total,))
                matched_r = matched_r | joinops.matched_flags(bidx, mask, nr)
            parts.append(self._finish_pairs_join(
                op, chunk_kind, lch, rvt, pidx, bidx, total))
        out = parts[0]
        ocols = op.output_cols()
        for p in parts[1:]:
            out = _vconcat(out, p, ocols)
        if kind == "full":
            n_ur = int(jnp.sum(~matched_r))
            if n_ur:
                (ui,) = jnp.nonzero(~matched_r, size=n_ur)
                cols = {cid: _null_scol(lvt.col(cid), n_ur) for cid in lvt.cols}
                for c in op.right.output_cols():
                    cols[c.cid] = rvt.col(c.cid).take(ui)
                out = _vconcat(out, VTable(cols, n_ur), ocols)
        return out
        raise ExecError(f"join kind {kind}")

    def _null_aware_fix(self, null_aware, lvt, rvt, keep_mask):
        """NOT IN semantics: with a non-empty inner set, outer NULL -> drop row
        and any inner NULL -> drop all rows; NOT IN (empty set) is TRUE for
        every outer row, NULL included (reference handles this through nullable
        comparison semantics in the generated join predicate)."""
        if not rvt.num_rows:
            return keep_mask
        outer_e, inner_ref = null_aware
        outer_c = sc.eval_expr(outer_e, lvt.cols)
        if outer_c.valid is not None:
            keep_mask = keep_mask & outer_c.valid
        inner_c = rvt.cols.get(inner_ref.cid)
        if inner_c is not None and inner_c.valid is not None:
            any_null = jnp.any(~inner_c.valid)
            keep_mask = keep_mask & ~any_null
        return keep_mask

    # ------------------------------------------------- distributed shuffle
    def _try_sharded_join(self, op, kind, lvt, rvt, lk, rk, null_safe):
        """Shuffle join over the device mesh: hash-partition BOTH sides by the
        join key (ragged all-to-all with exact capacities), then join locally
        per shard — no side is replicated or gathered (reference: the parallel
        hash-join state partitioning ParallelizePass.cpp:34-97 decides;
        PreAggregationHashtable.cpp's 64-way partitions). Returns None when no
        mesh is active or either side is below system.shuffle_min_rows (the
        single-program GSPMD broadcast path wins for small build sides)."""
        from . import device as dv
        from ..ops import hashing
        from ..parallel import shuffle as sh
        from ..utils.settings import get_setting

        mesh = dv.get_mesh()
        if mesh is None:
            return None
        nl, nr = lvt.num_rows, rvt.num_rows
        if min(nl, nr) < int(get_setting("system.shuffle_min_rows")):
            return None
        import jax.numpy as jnx

        if not null_safe:
            null_safe = (False,) * len(lk)
        # probe = left, build = right; NULL-key handling matches
        # joinops.candidate_pairs (strict keys never match; null-safe keys
        # share the NULL sentinel hash)
        hp = jnx.asarray(hashing.hash_columns(lk))
        hb = jnx.asarray(hashing.hash_columns(rk))
        strict_p = [c for c, ns in zip(lk, null_safe) if not ns]
        strict_b = [c for c, ns in zip(rk, null_safe) if not ns]
        pko = joinops._all_valid(strict_p, nl)
        bko = joinops._all_valid(strict_b, nr)
        if bko is not None:
            hb = jnx.where(jnx.asarray(bko), hb, jnx.uint64(0xFFFFFFFFFFFFFFFF))
        pko = jnx.ones((nl,), jnx.bool_) if pko is None else jnx.asarray(pko)

        try:
            playout, parrs = _flatten_vt(lvt)
            blayout, barrs = _flatten_vt(rvt)
        except _WideShip:
            return None
        n_ax = mesh.shape[mesh.axis_names[0]]
        dest_p = sh.hash_dest(mesh, hp)
        dest_b = sh.hash_dest(mesh, hb)
        # selection vectors ride straight into the exchange: dead rows are
        # dropped during packing, so deferred scan/join compaction costs
        # nothing here (VTable.row_valid docstring)
        valid_b = rvt.row_valid
        # sampled heavy-hitter split: when one shard would receive far more
        # probe rows than the mean, keys sampled as hot keep their probe rows
        # local and have their build rows replicated to every shard
        # (reference analogue: morsel work-stealing rebalances skew,
        # LingoDBTable.cpp:409-455). Skipped for FULL joins: replicated
        # build rows would emit their unmatched NULL-extended row per shard.
        skewf = float(get_setting("system.shuffle_skew_factor"))
        valid_p = lvt.row_valid
        probe_split = False
        recv = sh.dest_counts(mesh, dest_p, valid_p).sum(axis=0)
        if kind != "full" and recv.max() > skewf * max(float(recv.mean()), 1.0):
            step = max(1, nl // (1 << 16))
            samp = np.asarray(jax.device_get(hp[::step]))
            vals_u, cnts_u = np.unique(samp, return_counts=True)
            heavy = vals_u[cnts_u / samp.size > 1.0 / (2 * n_ax)]
            if heavy.size:
                sh.STATS["skew_splits"] += 1
                probe_split = True
                hj = jnx.asarray(heavy)
                heavy_p = (hp[:, None] == hj[None, :]).any(axis=1)
                l1 = (nl + ((-nl) % n_ax)) // n_ax
                stay = (jnx.arange(nl) // l1).astype(jnx.int32)
                dest_p = jnx.where(heavy_p, stay, dest_p)
                heavy_b = (hb[:, None] == hj[None, :]).any(axis=1)
                nh = int(jnx.sum(heavy_b))
                if nh:
                    (hidx,) = jnx.nonzero(heavy_b, size=nh)
                    rep = jnx.tile(hidx, n_ax)
                    hb = jnx.concatenate([hb, jnx.take(hb, rep)])
                    barrs = [jnx.concatenate(
                        [jnx.asarray(a), jnx.take(jnx.asarray(a), rep, axis=0)])
                        for a in barrs]
                    dest_b = jnx.concatenate([
                        dest_b, jnx.repeat(jnx.arange(n_ax, dtype=jnx.int32), nh)])
                    vb0 = (jnx.ones((nr,), jnx.bool_) if valid_b is None
                           else valid_b)
                    valid_b = jnx.concatenate([
                        vb0 & ~heavy_b, jnx.take(vb0, rep)])
        # build-side heavy hitters (inner only): one hot build key would land
        # all its rows on a single shard. Mirror of the probe split with roles
        # swapped — hot build rows stay spread by position, the probe rows of
        # those keys replicate to every shard, so each (probe, build) pair
        # still forms on exactly one shard. Kinds that emit one output per
        # probe row (semi/anti/mark/left/single) can't replicate probe rows
        # without duplicating outputs, and the probe split above already
        # covers keys hot on both sides.
        if kind == "inner" and not probe_split:
            recv_b = sh.dest_counts(mesh, dest_b, valid_b).sum(axis=0)
            if recv_b.max() > skewf * max(float(recv_b.mean()), 1.0):
                step = max(1, nr // (1 << 16))
                samp = np.asarray(jax.device_get(hb[::step]))
                vals_u, cnts_u = np.unique(samp, return_counts=True)
                heavy = vals_u[cnts_u / samp.size > 1.0 / (2 * n_ax)]
                heavy = heavy[heavy != np.uint64(0xFFFFFFFFFFFFFFFF)]
                if heavy.size:
                    sh.STATS["skew_splits"] += 1
                    hj = jnx.asarray(heavy)
                    heavy_b = (hb[:, None] == hj[None, :]).any(axis=1)
                    l1 = (nr + ((-nr) % n_ax)) // n_ax
                    stay_b = (jnx.arange(nr) // l1).astype(jnx.int32)
                    dest_b = jnx.where(heavy_b, stay_b, dest_b)
                    heavy_p = (hp[:, None] == hj[None, :]).any(axis=1)
                    nph = int(jnx.sum(heavy_p))
                    if nph:
                        (pidx,) = jnx.nonzero(heavy_p, size=nph)
                        rep = jnx.tile(pidx, n_ax)
                        hp = jnx.concatenate([hp, jnx.take(hp, rep)])
                        pko = jnx.concatenate([pko, jnx.take(pko, rep)])
                        parrs = [jnx.concatenate(
                            [jnx.asarray(a), jnx.take(jnx.asarray(a), rep, axis=0)])
                            for a in parrs]
                        dest_p = jnx.concatenate([
                            dest_p,
                            jnx.repeat(jnx.arange(n_ax, dtype=jnx.int32), nph)])
                        vp0 = (jnx.ones((nl,), jnx.bool_) if valid_p is None
                               else valid_p)
                        valid_p = jnx.concatenate([
                            vp0 & ~heavy_p, jnx.take(vp0, rep)])
        pv_ex, pouts, lp = sh.exchange(mesh, dest_p, [hp, pko] + parrs, valid_p)
        bv_ex, bouts, lb = sh.exchange(mesh, dest_b, [hb] + barrs, valid_b)
        hp_ex, pko_ex = pouts[0], pouts[1]
        probe_ex = _rebuild_vt(lvt, playout, pouts[2:], n_ax * lp)
        pair_valid, probe_idx, build_idx, bpair, ppair, cap_out, total = \
            sh.join_pairs(mesh, bouts[0], bv_ex, hp_ex, pv_ex & pko_ex,
                          bouts[1:], pouts[2:])
        glen = n_ax * cap_out
        build_pair = _rebuild_vt(rvt, blayout, bpair, glen)
        probe_pair = _rebuild_vt(lvt, playout, ppair, glen)
        # full-predicate verification on the (padded) pairs is elementwise,
        # so it stays shard-local under GSPMD
        if op.predicate is not None and total > 0:
            env = {**build_pair.cols, **probe_pair.cols}
            m = sc.truth_mask(sc.eval_expr(op.predicate, env))
            pair_ok = pair_valid & jnx.broadcast_to(m, (glen,))
        else:
            pair_ok = pair_valid
        if kind == "inner":
            out = VTable({**probe_pair.cols, **build_pair.cols}, glen,
                         row_valid=pair_ok)
            return out if self._lazy_ok(glen) else out.dense()
        flags = sh.probe_flags(mesh, pair_ok, probe_idx, lp)
        if kind == "semi":
            out = VTable(probe_ex.cols, n_ax * lp, row_valid=flags & pv_ex)
            return out if self._lazy_ok(n_ax * lp) else out.dense()
        if kind == "anti":
            out = VTable(probe_ex.cols, n_ax * lp, row_valid=~flags & pv_ex)
            return out if self._lazy_ok(n_ax * lp) else out.dense()
        if kind == "mark":
            cols = dict(probe_ex.cols)
            cols[op.mark_col.cid] = SCol(op.mark_col.type, flags, None)
            out = VTable(cols, n_ax * lp, row_valid=pv_ex)
            return out if self._lazy_ok(n_ax * lp) else out.dense()
        if kind == "single":
            # at most one build match per probe row (scalar-subquery shape):
            # pick the first passing pair's build payload per exchanged probe
            # row, NULL where none (reference: SingleJoin lowering,
            # RelAlgToSubOp.cpp — produces exactly one output row per left row)
            found, picked = sh.single_pick(mesh, pair_ok, probe_idx, lp, bpair)
            right_vt = _rebuild_vt(rvt, blayout, picked, n_ax * lp)
            cols = dict(probe_ex.cols)
            for c in op.right.output_cols():
                scol = right_vt.col(c.cid)
                f = found
                if is_obj(scol.data):
                    f = np.asarray(jax.device_get(found))
                v = f if scol.valid is None else (scol.valid & f)
                cols[c.cid] = SCol(scol.type.as_nullable(), scol.data, v,
                                   scol.dictionary)
            return VTable(cols, n_ax * lp).select_mask(pv_ex)
        # left/full join: matched pairs + unmatched probe rows with NULL right
        # cols (+ for full: unmatched build rows with NULL left cols)
        inner = VTable({**probe_pair.cols, **build_pair.cols}, glen).select_mask(pair_ok)
        unmatched = probe_ex.select_mask(~flags & pv_ex)
        parts = [inner]
        if unmatched.num_rows:
            cols = dict(unmatched.cols)
            for c in op.right.output_cols():
                cols[c.cid] = _null_scol(rvt.col(c.cid), unmatched.num_rows)
            parts.append(VTable(cols, unmatched.num_rows))
        if kind == "full":
            bflags = sh.probe_flags(mesh, pair_ok, build_idx, lb)
            build_ex = _rebuild_vt(rvt, blayout, bouts[1:], n_ax * lb)
            un_b = build_ex.select_mask(~bflags & bv_ex)
            if un_b.num_rows:
                cols = {cid: _null_scol(lvt.col(cid), un_b.num_rows)
                        for cid in lvt.cols}
                for c in op.right.output_cols():
                    cols[c.cid] = un_b.col(c.cid)
                parts.append(VTable(cols, un_b.num_rows))
        if len(parts) == 1:
            return parts[0]
        out = parts[0]
        for p in parts[1:]:
            out = _vconcat(out, p, op.output_cols())
        return out

    _SHARDED_AGG_FNS = {"sum", "count", "count_star", "min", "max"}

    def _try_sharded_agg(self, op: L.Aggregate, vt: VTable) -> Optional[VTable]:
        """Large-domain distributed aggregation: repartition rows by group-key
        hash, group locally per shard — every group lands on exactly one shard
        so the local result is final, with no psum over the whole domain
        (reference: partitioned PreAggregationHashtable merge,
        PreAggregationHashtable.cpp). Dense small domains keep the cheaper
        partial-aggregate + psum path."""
        from . import device as dv
        from ..parallel import shuffle as sh
        from ..ops import hashing
        from ..utils.settings import get_setting

        mesh = dv.get_mesh()
        if mesh is None or not op.group_by:
            return None
        n = vt.num_rows
        if n < int(get_setting("system.shuffle_min_rows")):
            return None
        has_distinct = False
        for spec in op.aggs:
            if spec.fn not in self._SHARDED_AGG_FNS:
                return None
            arg = None if spec.arg is None else vt.col(spec.arg)
            if arg is not None and is_obj(arg.data):
                return None  # wide-decimal agg args stay on the local path
            if spec.distinct:
                if spec.fn == "count_star":
                    return None
                has_distinct = True
        key_cols = [vt.col(c) for c in op.group_by]
        if gb.dense_gid(key_cols)[0] is not None:
            return None  # small dense domain: psum partial-agg path is cheaper
        import jax.numpy as jnx

        imgs = [jnx.broadcast_to(jnx.asarray(x), (n,))
                for x in keymod.grouping_images(key_cols)]
        h = jnx.asarray(hashing.hash_columns(key_cols))
        rep_layout, rep_arrays = _flatten_vt(
            VTable({c.cid: vt.col(c.cid) for c in op.group_cols}, n))
        aggs_in = []  # (kind, [arrays], valid)
        for spec in op.aggs:
            arg = None if spec.arg is None else vt.col(spec.arg)
            av = (jnx.ones((n,), jnx.bool_) if arg is None or arg.valid is None
                  else jnx.asarray(arg.valid))
            if spec.distinct and spec.fn in ("count", "sum"):
                aimgs = [jnx.broadcast_to(jnx.asarray(x), (n,))
                         for x in keymod.grouping_images([arg])]
                if spec.fn == "count":
                    aggs_in.append(("cdist", aimgs, av))
                else:
                    vals = jnx.asarray(arg.data).astype(jnp_dtype(spec.out.type))
                    aggs_in.append(("sdist", aimgs + [vals], av))
            elif spec.fn in ("count", "count_star"):
                aggs_in.append(("count", [jnx.ones((n,), jnx.int64)], av))
            elif spec.fn == "sum":
                vals = jnx.asarray(arg.data).astype(jnp_dtype(spec.out.type))
                aggs_in.append(("sum", [vals], av))
            else:  # min / max (DISTINCT is a no-op for them)
                aggs_in.append((spec.fn, [jnx.asarray(arg.data)], av))

        ni, nr_ = len(imgs), len(rep_arrays)
        if has_distinct:
            # distinct aggregates cannot pre-combine, so ship the raw rows
            # keyed by group hash: after the exchange every group lives wholly
            # on one shard and the local distinct grouping is exact
            # (reference: nested dedup aggregation, RelAlgToSubOp.cpp)
            flat_in = []
            for _k, arrs, m in aggs_in:
                flat_in.extend(arrs)
                flat_in.append(m)
            dest = sh.hash_dest(mesh, h)
            ex_valid, outs, _lp = sh.exchange(
                mesh, dest, list(imgs) + rep_arrays + flat_in, vt.row_valid)
            pos = ni + nr_
            flat_ex = []
            for k, arrs, _m in aggs_in:
                na = len(arrs)
                flat_ex.append((k, list(outs[pos:pos + na]), outs[pos + na]))
                pos += na + 1
            gvalid, reps_out, agg_out = sh.grouped_reduce(
                mesh, ex_valid, outs[:ni], outs[ni:ni + nr_], flat_ex)
            final = [(agg_out[i][0],
                      None if aggs_in[i][0] in ("count", "cdist")
                      else agg_out[i][1])
                     for i in range(len(op.aggs))]
        else:
            # round 1: local pre-aggregation on the existing row sharding —
            # the ThreadLocal combiner (reference: per-thread
            # PreAggregationHashtable fragments). Makes the exchange volume
            # proportional to local group counts, which also makes it
            # skew-proof (a hot key contributes one partial row per shard,
            # not its full row count).
            v1 = sh.shard_put(
                mesh, jnx.ones((n,), jnx.bool_)
                if vt.row_valid is None else vt.row_valid)[0]
            imgs1 = [sh.shard_put(mesh, x)[0] for x in imgs]
            reps1 = [sh.shard_put(mesh, x)[0] for x in [h] + imgs + rep_arrays]
            aggs1 = [(k, [sh.shard_put(mesh, a)[0] for a in arrs],
                      sh.shard_put(mesh, m)[0])
                     for k, arrs, m in aggs_in]
            gv1, reps_o1, agg_o1 = sh.grouped_reduce(mesh, v1, imgs1, reps1,
                                                     aggs1)
            h1 = reps_o1[0]
            imgs_p = reps_o1[1:1 + len(imgs)]
            reps_p = reps_o1[1 + len(imgs):]

            # round 2: exchange partial groups by key hash, final local group
            aggs2 = []  # parallel to op.aggs: (main_idx, cnt_idx or None)
            flat2 = []
            for (k, _arrs, _m), res in zip(aggs_in, agg_o1):
                if k == "count":
                    aggs2.append((len(flat2), None))
                    flat2.append(("sum", [res[0]], gv1))
                else:
                    val, cnt = res
                    aggs2.append((len(flat2), len(flat2) + 1))
                    flat2.append((k, [val], gv1 & (cnt > 0)))
                    flat2.append(("sum", [cnt], gv1))
            arrays2 = list(imgs_p) + list(reps_p) + [
                a for _k, arrs, m in flat2 for a in (arrs[0], m)]
            dest2 = sh.hash_dest(mesh, h1)
            ex_valid, outs, _lp = sh.exchange(mesh, dest2, arrays2, gv1)
            flat2_ex = [(k, [outs[ni + nr_ + 2 * i]], outs[ni + nr_ + 2 * i + 1])
                        for i, (k, _arrs, _m) in enumerate(flat2)]
            gvalid, reps_out, agg_out = sh.grouped_reduce(
                mesh, ex_valid, outs[:ni], outs[ni:ni + nr_], flat2_ex)
            final = []
            for mi, ci in aggs2:
                final.append((agg_out[mi][0],
                              None if ci is None else agg_out[ci][0]))
        glen = gvalid.shape[0]
        cols = dict(_rebuild_vt(vt, rep_layout, reps_out, glen).cols)
        for spec, (val, cnt) in zip(op.aggs, final):
            arg = None if spec.arg is None else vt.col(spec.arg)
            if cnt is None:  # count / count distinct: 0 on empty, never NULL
                cols[spec.out.cid] = SCol(spec.out.type, val, None)
                continue
            if jnp_dtype(spec.out.type) == jnp.bool_:
                val = val > 0
            dic = arg.dictionary if spec.fn in ("min", "max") else None
            cols[spec.out.cid] = SCol(spec.out.type, val, cnt > 0, dic)
        out = VTable(cols, glen, row_valid=gvalid)
        return out if self._lazy_ok(glen) else out.dense()

    def _cross(self, lvt: VTable, rvt: VTable) -> VTable:
        nl, nr = lvt.num_rows, rvt.num_rows
        if nl == 0 or nr == 0:
            cols = {cid: _empty_like(c) for cid, c in {**lvt.cols, **rvt.cols}.items()}
            return VTable(cols, 0)
        li = jnp.repeat(jnp.arange(nl, dtype=jnp.int64), nr)
        ri = jnp.tile(jnp.arange(nr, dtype=jnp.int64), nl)
        return _combine(lvt, rvt, li, ri, nl * nr)

    # ------------------------------------------------------------- set ops
    def _run_setop(self, op: L.SetOp) -> VTable:
        from . import device as dv

        lvt = self.run(op.left).dense()
        rvt = self.run(op.right).dense()
        lvt, rvt = dv.align_devices(lvt, rvt)
        lcols = {c.cid: lvt.col(lc) for c, lc in zip(op.cols, op.lmap)}
        rcols = {c.cid: rvt.col(rc) for c, rc in zip(op.cols, op.rmap)}
        lt = VTable(lcols, lvt.num_rows)
        rt = VTable(rcols, rvt.num_rows)
        if op.kind == "union" and op.all:
            return _vconcat(lt, rt, op.cols)
        both = _vconcat(lt, rt, op.cols)
        n = both.num_rows
        if n == 0:
            return both
        tag = jnp.concatenate([
            jnp.zeros((lt.num_rows,), jnp.int64),
            jnp.ones((rt.num_rows,), jnp.int64),
        ])
        grp = gb.group_rows([both.col(c.cid) for c in op.cols], n)
        seg, g, order = grp["seg"], grp["num_groups"], grp["order"]
        t = tag if order is None else jnp.take(tag, order)
        r_count = be.segment_sum(t, seg, num_segments=g, indices_are_sorted=grp["sorted"])
        tot = be.segment_sum(jnp.ones_like(t), seg, num_segments=g, indices_are_sorted=grp["sorted"])
        l_count = tot - r_count
        if op.kind == "union":
            reps = jnp.ones((g,), jnp.int64)
        elif op.kind == "intersect":
            reps = jnp.minimum(l_count, r_count) if op.all else ((l_count > 0) & (r_count > 0)).astype(jnp.int64)
        else:  # except
            reps = jnp.maximum(l_count - r_count, 0) if op.all else ((l_count > 0) & (r_count == 0)).astype(jnp.int64)
        reps_np = np.asarray(jax.device_get(reps))
        rep_rows_np = np.asarray(jax.device_get(grp["rep_rows"]))
        idx = np.repeat(rep_rows_np, reps_np)
        return both.take(jnp.asarray(idx), len(idx))

    # ------------------------------------------------------------- window
    def _run_window(self, op: L.Window) -> VTable:
        from ..ops import window as winmod

        vt = self.run(op.child).dense()
        return winmod.run_window(op, vt)


# ---------------------------------------------------------------- helpers
def extract_equi_keys(pred, lcids: set[int], rcids: set[int]):
    """Find hashable equi-key expression pairs in a join predicate.
    Handles top-level conjuncts (eq and null-safe nseq) and, for OR
    predicates like TPC-H Q19, equality conjuncts common to every disjunct
    (reference: HashJoinUtils.cpp:21-278 equi-key extraction)."""
    lkeys, rkeys, null_safe = [], [], []
    if pred is None:
        return lkeys, rkeys, null_safe

    def try_add(c):
        if isinstance(c, Call) and c.op in ("eq", "nseq"):
            a, b = c.args
            ua, ub = E.used_cols(a), E.used_cols(b)
            if ua and ub:
                if ua <= lcids and ub <= rcids:
                    lkeys.append(a)
                    rkeys.append(b)
                    null_safe.append(c.op == "nseq")
                    return True
                if ua <= rcids and ub <= lcids:
                    lkeys.append(b)
                    rkeys.append(a)
                    null_safe.append(c.op == "nseq")
                    return True
        return False

    for c in E.conjuncts(pred):
        if try_add(c):
            continue
        if isinstance(c, Call) and c.op == "or":
            # common equality across all branches (Q19 pattern)
            branch_sets = []
            for b in E.disjuncts(c):
                branch_sets.append({repr(x): x for x in E.conjuncts(b)})
            common = set(branch_sets[0])
            for bs in branch_sets[1:]:
                common &= set(bs)
            for key in common:
                try_add(branch_sets[0][key])
    return lkeys, rkeys, null_safe


def _unify_string_keys(a: SCol, b: SCol):
    if a.type.is_string and b.type.is_string and a.dictionary is not None and b.dictionary is not None:
        if a.dictionary is b.dictionary:
            return a, b
        merged, ra, rb = strmod.remap_to_merged(a.dictionary, b.dictionary)
        a = SCol(a.type, jnp.asarray(ra)[a.data], a.valid, merged)
        b = SCol(b.type, jnp.asarray(rb)[b.data], b.valid, merged)
    return a, b


def _pair_env(lvt: VTable, rvt: VTable, li, ri, pred):
    env = {}
    used = E.used_cols(pred)
    for cid in used:
        if cid in lvt.cols:
            env[cid] = lvt.col(cid).take(li)
        elif cid in rvt.cols:
            env[cid] = rvt.col(cid).take(ri)
        else:
            raise ExecError(f"join predicate references unknown column {cid}")
    return env


def _combine(lvt: VTable, rvt: VTable, li, ri, n: int) -> VTable:
    cols = {}
    for cid, c in lvt.cols.items():
        cols[cid] = c.take(li)
    for cid, c in rvt.cols.items():
        cols[cid] = c.take(ri)
    return VTable(cols, n)


def _all_pairs(nl: int, nr: int):
    if nl == 0 or nr == 0:
        z = jnp.zeros((0,), jnp.int64)
        return z, z, 0
    li = jnp.repeat(jnp.arange(nl, dtype=jnp.int64), nr)
    ri = jnp.tile(jnp.arange(nr, dtype=jnp.int64), nl)
    return li, ri, nl * nr


import functools


@functools.partial(jax.jit, static_argnums=1)
def _slice_prefix(arrays, g_pad: int):
    return tuple(a[:g_pad] for a in arrays)


@functools.partial(jax.jit, static_argnames=("g",))
def _slice_exact(arrays, g: int):
    """ONE compiled program slicing every output lane to the exact group
    count (per-(shapes, g) compile, cached persistently; per-column eager
    slices would dispatch separately)."""
    return tuple(a[:g] for a in arrays)


def _apply_topk_epi(op, epi, res, meta, n_extra):
    """Fold the TopK epilogue into the fused program (general mode): build
    the group-space environment from the padded reduction lanes, evaluate
    any Map steps between the Aggregate and the TopK, rank groups by the
    PRIMARY sort key's int64 priority image, and emit only the top-kk
    candidate rows of every output column plus (group count, tie count at
    the cutoff, wide-limb flag). kk carries slack over the requested k so
    secondary sort keys resolve on the host among candidates; the tie count
    lets the finish PROVE the candidate set contains the exact top-k
    (reference: the generated program's heap-based topk,
    SubOpToControlFlow.cpp:1685 heap_compare)."""
    import jax.numpy as jx

    kg = meta["kg"]
    g = res[n_extra]
    lanes = res[n_extra + 1:]
    env = {}
    i = 0
    for pos, cid in enumerate(op.group_by):
        ktype, kdict, knull = meta["key_templates"][pos]
        data = lanes[i]
        i += 1
        valid = None
        if knull:
            valid = lanes[i]
            i += 1
        env[cid] = SCol(ktype, data, valid, kdict)
    rows_ok = jx.arange(kg, dtype=jx.int64) < g
    limbflag = jx.zeros((), jx.bool_)
    for spec in op.aggs:
        cid = spec.out.cid
        if cid in meta.get("agg_limbs", ()):
            hi, lo, cnt = lanes[i], lanes[i + 1], lanes[i + 2]
            i += 3
            limbflag = limbflag | jx.any(
                ((jx.abs(hi) >> jx.int64(30)) > 0) & rows_ok)
            val = (hi << jx.int64(32)) + lo
            env[cid] = SCol(spec.out.type, val, cnt > 0,
                            meta["agg_dicts"].get(cid))
        elif spec.fn in ("count", "count_star"):
            val, _cnt = lanes[i], lanes[i + 1]
            i += 2
            env[cid] = SCol(spec.out.type, val, None)
        else:
            val, cnt = lanes[i], lanes[i + 1]
            i += 2
            env[cid] = SCol(spec.out.type, val, cnt > 0,
                            meta["agg_dicts"].get(cid))
    for m in epi["maps"]:
        for info, e in m.computed:
            env[info.cid] = sc._bcast(sc.eval_expr(e, env), kg)
    k0 = epi["node"].keys[0]
    prio = keymod.topk_priority(env[k0.cid], k0.ascending, k0.nulls_first,
                                rows_ok)
    if prio is None:  # defensive: no single-int order image
        raise _NotDense("topk epilogue: primary key has no order image")
    kk = min(epi["kk"], kg)
    vals, cand = jax.lax.top_k(prio, kk)
    cutoff = vals[kk - 1]
    tie_cnt = jx.sum(((prio >= cutoff) & rows_ok).astype(jx.int64))
    templates = []
    out_lanes = []
    for cid in epi["out_cids"]:
        c = sc._bcast(env[cid], kg)
        out_lanes.append(jx.take(c.data, cand, mode="clip"))
        has_valid = c.valid is not None
        if has_valid:
            out_lanes.append(jx.take(c.valid, cand, mode="clip"))
        templates.append((cid, c.type, c.dictionary, has_valid))
    meta["epi"] = {"kk": kk, "k": epi["k"], "templates": templates}
    return res[:n_extra] + (g, tie_cnt, limbflag) + tuple(out_lanes)


def _fused_general_group(op, key_cols, env, mask, n, meta, presorted=False,
                         kg=None):
    """General (large-domain) grouping INSIDE the fused program: ONE
    multi-operand sort carries the key images AND every payload column
    (filtered-out rows pushed to the end), then each aggregate reduces with
    cumsum / segmented scan + monotone boundary gathers. No random gathers
    anywhere: the permutation is never materialized, group boundaries come
    from the Pallas compaction kernel, and boundary gathers ride the
    windowed sorted-gather kernel (XLA's random 1-D gather runs ~770x off
    memory speed-of-light on this chip — bench_results/op_sol.log). Emits
    n-sized padded outputs plus the group count; the host slices the first
    `num_groups` entries with one tiny follow-up program.

    presorted=True (caller-proven: single integer-image group key riding a
    clustered base column through an order-preserving spine) skips the sort
    entirely — masked rows stay in place (their contributions are zeroed
    and group extents simply span them), and boundaries compare each
    unmasked row's key against the running max of previous unmasked keys.
    This removes the ~20s+8s/operand remote sort compile AND the sort's
    runtime from the reduction: grouping becomes pure streaming."""
    import jax.numpy as jx

    # kg: static GROUP-COUNT CAPACITY. First execution runs uncalibrated
    # (kg=None -> kg=n) with overflow-proof XLA takes for the boundary
    # gathers; the observed count then rebuilds the program with a tight
    # pow2 capacity (adaptive execution — the runtime-feedback analogue of
    # the reference's morsel-driven adaptivity). With a tight kg, sparse
    # groupings (Q3@SF10: one group per ~530 rows; Q18's semi-narrowed 60
    # groups) gather at the GROUP scale instead of the row scale, and the
    # take-vs-windowed policy below can never overflow:
    #   kg < SORT_ROUTE_MIN_N  -> plain takes (19ns/elem at group count)
    #   kg >= SORT_ROUTE_MIN_N -> real groups >= kg/4 (capacity ladder),
    #     so the position gap <= 4n/kg <= 256 for n <= 256M — within the
    #     conservative windowed guarantee.
    meta["calibrating"] = kg is None
    kg = n if kg is None else min(kg, n)
    meta["kg"] = kg
    meta["n"] = n
    take_mode = kg < pgather.SORT_ROUTE_MIN_N

    def bgather(arrs, idx):
        if not arrs:
            return []
        if take_mode:
            ic = jx.clip(idx, 0, n - 1)
            return [jx.take(a, ic, mode="clip") for a in arrs]
        return pgather.take_fast_multi(arrs, idx, monotone=True,
                                       conservative=True)

    in_mask = mask if mask is not None else jx.ones((n,), jx.bool_)
    imgs = [jx.broadcast_to(x, (n,)) for x in gb.keymod.grouping_images(key_cols)]
    if presorted and len(imgs) > 2:
        presorted = False  # joint sortedness only proven for one key
    # nullable single key contributes (null-flag, value) images; in the
    # presorted cases the flag is constant over unmasked rows (direct: no
    # NULLs stored; equi: invalid rows are masked), so boundaries come from
    # the VALUE image alone

    # every array the reductions need rides the sort as a payload operand:
    # one multi-operand lax.sort (~5-6x SOL) replaces a materialized
    # permutation plus per-column random takes
    payload: list = []
    slot_of: dict[int, int] = {}

    def ride(a):
        name = id(a)
        s_ = slot_of.get(name)
        if s_ is None:
            s_ = len(payload)
            payload.append(a)
            slot_of[name] = s_
        return s_

    key_slots = []
    for c in key_cols:
        key_slots.append((ride(c.data),
                          None if c.valid is None else ride(c.valid)))
    agg_args = []
    for spec in op.aggs:
        if spec.fn == "count_star":
            agg_args.append(None)
            continue
        arg = sc._bcast(env[spec.arg], n)
        dslot = ride(arg.data) if spec.fn != "count" else None
        vslot = None if arg.valid is None else ride(arg.valid)
        agg_args.append((arg, dslot, vslot))

    if presorted:
        inm_s = in_mask
        simgs = imgs
        pay_s = payload
        img = imgs[-1]
        lo = jnp.iinfo(img.dtype).min
        # previous unmasked key via running max (img is nondecreasing on
        # unmasked rows); a masked row never opens a boundary
        pm = _cummax1d(jx.where(in_mask, img, lo))
        prev = jx.concatenate([jx.full((1,), lo, img.dtype), pm[:-1]])
        # first unmasked row always opens a group (img > INT_MIN fails only
        # in the img == INT_MIN corner, so guard it explicitly)
        first_un = in_mask & (_cumsum1d(in_mask.astype(jx.int32)) == 1)
        boundary = in_mask & ((img > prev) | first_un)
    else:
        nk = 1 + len(imgs)
        if n < pgather.SORT_ROUTE_MIN_N:
            # mid-size groupings sort ONLY (mask, key images, iota) — each
            # lax.sort operand costs ~8s of one-time remote compile, so the
            # payloads do NOT ride the sort; they're fetched afterwards by
            # the permutation with plain XLA takes (~19ns/elem: cheaper
            # than the compile amortization at this size)
            iota = jx.arange(n, dtype=jx.int32)
            res = jax.lax.sort(
                [(~in_mask).astype(jx.int32)] + imgs + [iota], num_keys=nk)
            perm = res[-1]
            pay_s = pgather.take_fast_multi(payload, perm)
        else:
            # at full fact-table scale every array rides the sort as a
            # payload operand: one multi-operand lax.sort (~5-6x SOL)
            # replaces a materialized permutation plus per-column random
            # takes, which cost far more than the extra operands' compile
            res = jax.lax.sort(
                [(~in_mask).astype(jx.int32)] + imgs + payload, num_keys=nk)
            pay_s = list(res[nk:])
        inm_s = res[0] == 0
        simgs = res[1:nk]

        boundary = jx.concatenate([jx.ones((1,), jx.bool_),
                                   jx.zeros((n - 1,), jx.bool_)])
        for s_ in simgs:
            boundary = boundary | jx.concatenate(
                [jx.ones((1,), jx.bool_), s_[1:] != s_[:-1]])
        boundary = boundary & inm_s
    num_groups = jx.sum(boundary.astype(jx.int64))
    if meta["calibrating"]:
        # count-only program: the executor reads g, learns the capacity,
        # and rebuilds the full program around it
        return (num_groups,)
    cnt32 = num_groups.astype(jx.int32)
    # group-start positions, compacted (monotone; padding tail clipped by
    # the takes below). Masked-out rows sit at the end with no boundary, so
    # they extend the LAST group — every reduction masks them to zero or a
    # sentinel, so the extents stay correct.
    _, bpos = pgather.nonzero_positions(boundary, kg)
    ar = jx.arange(kg, dtype=jx.int32)
    nxt = jx.concatenate([bpos[1:], jx.full((1,), n, jx.int32)])
    lpos = jx.where(ar < cnt32 - 1, nxt - 1, jx.int32(n - 1))

    # ---- two-phase reduction assembly: every boundary gather is DEFERRED
    # into three batched take_fast_multi calls (at bpos / lpos / bpos-1) so
    # the whole reduction costs three kernel instantiations total instead of
    # one per aggregate (each distinct Mosaic kernel costs ~10 s of remote
    # compile through the axon tunnel).
    g_bpos: list = []    # arrays gathered at group starts
    g_lpos: list = []    # arrays gathered at group last rows
    g_bm1: list = []     # cumsums gathered at bpos-1 (exclusive prefix)

    def defer(lst, arr):
        lst.append(arr)
        return len(lst) - 1

    def gsum(v):
        """Per-group sum of a sorted, already-masked column via prefix sums
        + boundary-difference (groups are contiguous and non-empty)."""
        cs = _cumsum1d(v)
        return ("sum", defer(g_lpos, cs), defer(g_bm1, cs))

    # segmented extrema WITHOUT lax.associative_scan (a custom combine at
    # engine sizes costs MINUTES of remote compile — measured r4): pack
    # (group_id << 32) | transform(value) into one int64 and take a plain
    # cummax. Group ids are nondecreasing, so at a group's last row the
    # running max's low 32 bits are exactly that group's best transform —
    # earlier groups pack strictly lower (their gid dominates the high
    # bits) and can never win. jnp.cumsum/cummax compile in seconds.
    gid64 = _cumsum1d(boundary.astype(jx.int64)) - 1
    gid64 = jx.maximum(gid64, 0)
    pos64 = jx.arange(n, dtype=jx.int64)

    def _packed_cummax_low32(tr):
        """low 32 bits of the running packed max, at group-last rows."""
        cm = _cummax1d((gid64 << 32) | tr)
        return cm & jx.int64(0xFFFFFFFF)

    def gminmax(v, fn, keep):
        """Per-group min/max at any physical width. 32-bit values take one
        packed cummax; 64-bit values (int64 / f64 / scaled decimals) take
        TWO — the high limb first, then the low limb among rows achieving
        the group's high-limb optimum (the per-row group optimum broadcasts
        back through a monotone gather at the nondecreasing gid). Floats map
        through the sign-flip bit image so unsigned integer order equals
        float order (IEEE-754 total order on non-NaN values)."""
        dt = v.dtype
        if dt in (jx.int32, jx.bool_, jx.int16, jx.int8, jx.float32):
            if dt == jx.float32:
                b = jax.lax.bitcast_convert_type(v, jx.int32)
                u = b ^ jx.where(b >= 0, jx.int32(-(1 << 31)), jx.int32(-1))
                # the XORed bits are an UNSIGNED order image: mask to the low
                # 32 bits (sign-extending + shifting put every negative float
                # above every positive one — r4 advisor finding)
                img = u.astype(jx.int64) & jx.int64(0xFFFFFFFF)
            else:
                img = v.astype(jx.int64) + jx.int64(1 << 31)
            if fn == "min":
                img = jx.int64((1 << 32) - 1) - img
            img = jx.where(keep, img, jx.int64(0))
            return ("minmax32", defer(g_lpos, _packed_cummax_low32(img)),
                    fn, dt)
        if dt not in (jx.int64, jx.float64):
            raise _NotDense(f"general fused {fn}: unsupported dtype {dt}")
        if dt == jx.float64:
            b = jax.lax.bitcast_convert_type(v, jx.int64)
            u = b ^ jx.where(b >= 0, jx.int64(-(1 << 63)), jx.int64(-1))
        else:
            u = v ^ jx.int64(-(1 << 63))  # unsigned-order image
        if fn == "min":
            u = ~u  # reverse unsigned order
        mask32 = jx.int64(0xFFFFFFFF)
        uhi = (u >> 32) & mask32
        ulo = u & mask32
        keep64 = keep
        hi_best = _packed_cummax_low32(jx.where(keep64, uhi, jx.int64(0)))
        # hi_best[g] holds group g's best high limb (after the lpos gather);
        # rows read their group's value back via a monotone gid gather
        slot_hi = defer(g_lpos, hi_best)
        return ("minmax64", slot_hi, fn, dt,
                uhi, ulo, keep64)

    def gfirst_valid(dslot, vslot):
        """any_value: the FIRST row of the group whose argument is valid
        (matches the dense path's ignore-NULLs choice); works at any value
        width because only the row POSITION is packed. Returns positions —
        the caller gathers the original payload at them (monotone: first
        positions ascend with groups)."""
        keep = inm_s if vslot is None else (inm_s & pay_s[vslot])
        maxp = jx.int64(0xFFFFFFFF)
        tr = jx.where(keep, maxp - pos64, jx.int64(0))
        low = _packed_cummax_low32(tr)
        return ("firstpos", defer(g_lpos, low), dslot)

    outs = [num_groups]
    for dslot, vslot in key_slots:
        outs.append(("at_b", defer(g_bpos, pay_s[dslot])))
        if vslot is not None:
            outs.append(("at_b", defer(g_bpos, pay_s[vslot])))

    ones = jx.where(inm_s, jx.ones((n,), jx.int64), jx.zeros((n,), jx.int64))
    meta["agg_dicts"] = {}
    meta["agg_limbs"] = set()

    for spec, slots in zip(op.aggs, agg_args):
        if spec.fn == "count_star":
            cnt = gsum(ones)
            outs.append(cnt)
            outs.append(cnt)
            continue
        arg, dslot, vslot = slots
        avalid_s = None if vslot is None else pay_s[vslot]
        vm = ones if avalid_s is None else jx.where(avalid_s, ones, jx.zeros_like(ones))
        cnt = gsum(vm)
        if spec.fn == "count":
            outs.append(cnt)
            outs.append(cnt)
            continue
        data_s = pay_s[dslot].astype(jnp_dtype(spec.out.type))
        if spec.fn == "sum":
            keep = vm > 0
            data_s = jx.where(keep, data_s, jx.zeros_like(data_s))
            if (spec.out.type.kind == K.DECIMAL and dec_is_wide(spec.out.type)
                    and data_s.dtype == jx.int64):
                # exact wide sum: 32-bit-split accumulators (see dense path)
                meta["agg_limbs"].add(spec.out.cid)
                outs.append(gsum(data_s >> jx.int64(32)))
                outs.append(gsum(data_s & jx.int64(0xFFFFFFFF)))
                outs.append(cnt)
                continue
            outs.append(gsum(data_s))
            outs.append(cnt)
            continue
        if spec.fn == "any_value":
            outs.append(gfirst_valid(dslot, vslot))
            outs.append(cnt)
            meta["agg_dicts"][spec.out.cid] = arg.dictionary
            continue
        keep = inm_s if avalid_s is None else (inm_s & avalid_s)
        outs.append(gminmax(data_s, spec.fn, keep))
        outs.append(cnt)
        meta["agg_dicts"][spec.out.cid] = arg.dictionary

    # boundary positions are sentinel-padded to n (true group count is
    # dynamic), so the static density hint would overshoot and the fast
    # kernel parameterization overflowed at runtime — silently degrading to
    # XLA takes at 770x SOL (measured r4: 480ms of a 566ms program).
    # conservative=True sizes the walk for unknown density.
    got_b = bgather(g_bpos, bpos)
    got_l = bgather(g_lpos, lpos)
    got_m1 = bgather(g_bm1, jx.maximum(bpos - 1, 0))

    # second wave: 64-bit extrema tie-break — among rows achieving their
    # group's best HIGH limb (broadcast back through a monotone gid gather),
    # take the best LOW limb with one more packed cummax + lpos gather
    g_lpos2c: list = []
    g_lpos2 = g_lpos2c
    mm64_slot: dict[int, int] = {}
    gid32 = gid64.astype(jx.int32)
    for o in outs:
        if isinstance(o, tuple) and o[0] == "minmax64" and id(o) not in mm64_slot:
            _tag, slot_hi, _fn, _dt, uhi, ulo, keep64 = o
            # per-row broadcast of the (kg,)-sized group results: genuinely
            # monotone gid with gap <= 1 — the fast windowed/chunked path
            hi_row = pgather.take_fast(got_l[slot_hi], gid32, monotone=True)
            trB = jx.where(keep64 & (uhi == hi_row), ulo, jx.int64(0))
            mm64_slot[id(o)] = len(g_lpos2)
            g_lpos2.append(_packed_cummax_low32(trB))
    got_l2 = bgather(g_lpos2, lpos)

    def resolve(o):
        if not isinstance(o, tuple):
            return o
        if o[0] == "at_b":
            return got_b[o[1]]
        if o[0] == "minmax32":
            low = got_l[o[1]]
            if o[2] == "min":
                low = jx.int64((1 << 32) - 1) - low
            if o[3] == jx.float32:
                # unsigned image: the wrapping int64->int32 cast recovers the
                # XORed bit pattern directly (no +/- 2^31 bias on floats)
                u32 = low.astype(jx.int32)
                b = u32 ^ jx.where(u32 < 0, jx.int32(-(1 << 31)),
                                   jx.int32(-1))
                return jax.lax.bitcast_convert_type(b, jx.float32)
            return (low - jx.int64(1 << 31)).astype(o[3])
        if o[0] == "minmax64":
            u = (got_l[o[1]] << 32) | got_l2[mm64_slot[id(o)]]
            if o[2] == "min":
                u = ~u
            if o[3] == jx.float64:
                b = u ^ jx.where(u < 0, jx.int64(-(1 << 63)), jx.int64(-1))
                return jax.lax.bitcast_convert_type(b, jx.float64)
            return u ^ jx.int64(-(1 << 63))
        if o[0] == "firstpos":
            low = got_l[o[1]]
            fpos = (jx.int64(0xFFFFFFFF) - low).astype(jx.int32)
            # first-valid positions ascend with groups: monotone gather of
            # the ORIGINAL payload (any width) at them. No-valid groups
            # (low==0) read their group START row instead of a far-away
            # clipped sentinel — keeps the windowed kernel's locality
            # bound intact (bpos_g <= first-valid_g < bpos_{g+1}, so the
            # substitution preserves monotonicity); cnt==0 NULLs them.
            fpos = jx.where(low == jx.int64(0), bpos, fpos)
            return bgather([pay_s[o[2]]], fpos)[0]
        hi, lo = got_l[o[1]], got_m1[o[2]]
        return hi - jx.where(bpos == 0, jx.zeros_like(lo), lo)

    return tuple(resolve(o) for o in outs)


def _cumsum1d(v):
    """Hierarchical prefix sum: cumsum within 1024-wide rows + recursive
    cumsum of row totals. XLA's FLAT 1-D cumsum lowering at 60M int64 takes
    ~70s of remote compile and five of them in one program crash the
    compile helper (SIGSEGV); the hierarchical form compiles in seconds and
    runs ~2 passes over the data. Exact for integer dtypes."""
    import jax.numpy as jx

    n = v.shape[0]
    if n <= 4096:
        return jx.cumsum(v)
    B = 1024
    pad = (-n) % B
    vp = jx.concatenate([v, jx.zeros((pad,), v.dtype)]) if pad else v
    v2 = vp.reshape(-1, B)
    within = jx.cumsum(v2, axis=1)
    tot = _cumsum1d(within[:, -1])
    offs = jx.concatenate([jx.zeros((1,), v.dtype), tot[:-1]])
    return (within + offs[:, None]).reshape(-1)[:n]


def _cummax1d(v):
    """Hierarchical running max (same compile-cost story as _cumsum1d)."""
    import jax.numpy as jx

    n = v.shape[0]
    if n <= 4096:
        return jax.lax.cummax(v)
    B = 1024
    pad = (-n) % B
    if pad:
        fill = jx.full((pad,), v[-1], v.dtype)
        vp = jx.concatenate([v, fill])
    else:
        vp = v
    v2 = vp.reshape(-1, B)
    within = jax.lax.cummax(v2, axis=1)
    tot = _cummax1d(within[:, -1])
    lo = jx.full((1,), jx.iinfo(v.dtype).min, v.dtype)
    offs = jx.concatenate([lo, tot[:-1]])
    return jx.maximum(within, offs[:, None]).reshape(-1)[:n]


class _CompactOverflow(Exception):
    """Raised when the compacted fused program's survivor count exceeded the
    sample-estimated static size; the caller rebuilds without compaction."""


class _MidCompactOverflow(Exception):
    """Raised when a learned post-join survivor cap was exceeded (args:
    step index, observed count); the caller re-learns and rebuilds."""


class _KBoundsOverflow(Exception):
    """Raised when group-key values fell outside their calibrated bounds
    (bounded dense gid); the caller drops the bounded path and rebuilds."""


def _ovf_bitmask(sink):
    """One bit per collected gather (call order): the finish prints the
    mask so an overflow names the gather that caused it."""
    if not sink:
        return jnp.int32(0)
    out = jnp.int32(0)
    for k, o in enumerate(sink):
        out = out | jnp.where(o > 0, jnp.int32(1 << min(k, 30)), jnp.int32(0))
    return out


class _EpiOverflow(Exception):
    """Raised when the fused TopK epilogue cannot prove its candidate set
    exact (priority-cutoff ties exceeding the slack, or a wide-sum limb
    overflow corrupting the combined sort image); the caller rebuilds the
    plain program and runs the epilogue eagerly."""


class _GatherOverflow(Exception):
    """Raised when a windowed gather's overflow flag fired (skewed density);
    the caller rebuilds the fused program without Pallas kernels."""


class _CapacityOverflow(Exception):
    """Raised when the true group count exceeded the learned static group
    capacity; the caller doubles the capacity and rebuilds."""


def _sorted_semi_compact(prep, args, env, mask, n, capv, used_cols):
    """Sorted-probe semi join immediately followed by a learned compaction:
    emit the survivor positions DIRECTLY from the nb probe ranges instead of
    marking membership over the n-row spine. The range-scatter + prefix-sum
    formulation still paid three 60M-row passes on q18@SF10 (the 1024-lane
    hierarchical cumsum lowers to a 10-step shift-add while loop, ~8.2 s
    measured in the device trace); survivors of a semi with a SORTED probe
    are a concatenation of <=nb contiguous, disjoint, ascending ranges, so
    capv slots can be filled with nb*log2(n) + capv*log2(nb) work and one
    capv-sized monotone gather — zero full-spine passes.

    Returns (newenv, newmask, true_survivor_count) or None when the step
    does not qualify (non-semi, unsorted probe, residual/payloads, NULLable
    probe key). true_survivor_count may exceed capv — the extras check
    raises _MidCompactOverflow and the program rebuilds, same contract as
    _compact. (reference analogue: survivor-sized hash table build,
    src/runtime/Hashtable.cpp:1-185)"""
    import jax.numpy as jx

    if (prep["kind"] != "semi" or prep.get("direct") is not None
            or not prep.get("probe_sorted") or prep["residual"]
            or prep["payloads"] or prep.get("probe_expr2") is not None
            or prep.get("maxdup", 1) > 1):
        return None
    nb = prep["nb"]
    if nb == 0 or nb > (1 << 22):
        return None
    c = sc.eval_expr(prep["probe_expr"], env)
    c = sc._bcast(c, n)
    if c.valid is not None:
        return None
    pimg = c.data.astype(jx.int64)
    skeys = args[0]
    lo_ = jx.searchsorted(pimg, skeys, side="left").astype(jx.int64)
    hi_ = jx.searchsorted(pimg, skeys, side="right").astype(jx.int64)
    lens = hi_ - lo_
    starts = jx.cumsum(lens) - lens  # exclusive prefix (nb-sized: cheap)
    total = starts[-1] + lens[-1]
    t = jx.arange(capv, dtype=jx.int64)
    # slot t belongs to the last range whose start <= t (empty ranges
    # share their successor's start; 'right'-1 lands on the owning one)
    r = jx.clip(jx.searchsorted(starts, t, side="right") - 1, 0, nb - 1)
    pos = jx.take(lo_, r) + (t - jx.take(starts, r))
    valid = t < jx.minimum(total, jx.int64(capv))
    posc = jx.where(valid, pos, n - 1)  # sentinel-pad: conservative gather
    newmask = valid
    if mask is not None:
        newmask = valid & (mask if mask.ndim == 0 else jx.take(mask, posc))
    fetch = []
    for cid, cc in env.items():
        if cid not in used_cols or cc.data.ndim == 0:
            continue
        fetch.append(cc.data)
        if cc.valid is not None:
            fetch.append(cc.valid)
    fetched = (pgather.take_fast_multi(fetch, posc, monotone=True,
                                       conservative=True) if fetch else [])
    fi = 0
    newenv = {}
    for cid, cc in env.items():
        if cid not in used_cols or cc.data.ndim == 0:
            newenv[cid] = cc
            continue
        data = fetched[fi]
        fi += 1
        valid2 = None
        if cc.valid is not None:
            valid2 = fetched[fi]
            fi += 1
        newenv[cid] = SCol(cc.type, data, valid2, cc.dictionary)
    count = jx.maximum(total, jx.sum(newmask.astype(jx.int64)))
    return newenv, newmask, count


def _fused_join_step(prep, args, env, mask, n):
    """One dimension-join lookup inside the fused jitted program: binary
    search over the sorted unique build keys, gather payloads, apply
    residual predicates, and fold the result into the pipeline mask."""
    import jax.numpy as jx

    kind = prep["kind"]
    if kind == "single_broadcast":
        # 1-row build relation: broadcast its values to every probe row
        i = 0
        for cid, t, has_valid, d in prep["payloads"]:
            data = jx.broadcast_to(args[i][0], (n,))
            i += 1
            if not prep["present"]:
                valid = jx.zeros((n,), jx.bool_)
            elif has_valid:
                valid = jx.broadcast_to(args[i][0], (n,))
            else:
                valid = None
            if has_valid:
                i += 1
            env[cid] = SCol(t.as_nullable() if valid is not None else t,
                            data, valid, d)
        return mask
    c = sc.eval_expr(prep["probe_expr"], env)
    c = sc._bcast(c, n)
    pimg = c.data.astype(jx.int64)
    pvalid = c.valid
    if prep.get("probe_expr2") is not None:
        c2 = sc._bcast(sc.eval_expr(prep["probe_expr2"], env), n)
        pimg = (pimg << 32) | (c2.data.astype(jx.int64) & 0xFFFFFFFF)
        if c2.valid is not None:
            pvalid = c2.valid if pvalid is None else (pvalid & c2.valid)
    nb = prep["nb"]
    i = 0
    skeys = args[i]
    i += 1
    direct = prep.get("direct")

    sorted_probe = bool(prep.get("probe_sorted"))

    def lookup_first(valid_default=True):
        """Position of the first build row matching pimg, and a found mask."""
        if direct is not None:
            kmin, span = direct
            off = pimg - kmin
            offc = jx.clip(off, 0, span - 1)
            # LUT probe through the Pallas gather kernels; a sorted probe
            # column (TPC-H lineitem is clustered by l_orderkey) makes this
            # a monotone windowed gather at near memory speed
            p = pgather.take_fast(skeys, offc,
                                  monotone=sorted_probe).astype(jx.int64)
            ok = (off >= 0) & (off < span) & (p >= 0)
            p = jx.clip(p, 0, max(nb - 1, 0))
            if sorted_probe and nb > 0:
                # repair monotonicity for the payload gathers: misses carry
                # the previous hit's position (masked out by `ok` anyway)
                p = jax.lax.cummax(jx.where(ok, p, 0))
            return p, ok
        p = jx.searchsorted(args[0], pimg, side="left")
        pc = jx.clip(p, 0, nb - 1)
        ok = jx.take(args[0], pc) == pimg
        return pc, ok

    if (kind in ("semi", "anti") and nb > 0 and direct is None
            and sorted_probe and pvalid is None
            and not prep["residual"] and not prep["payloads"]):
        # SORTED-probe existence check without per-probe binary search:
        # searchsorted over n probes costs log2(nb) serialized rounds of
        # random 1-D gathers (~19 ns/elem each — r4 measured; q18@SF10's
        # 60M-probe semi spent ~8 s here). Flip the search: find each of
        # the nb build keys' contiguous probe range (nb*log2(n) work),
        # range-scatter +1/-1, and one hierarchical prefix sum marks every
        # matching probe row. Three passes over the probe, total.
        lo_ = jx.searchsorted(pimg, skeys, side="left")
        hi_ = jx.searchsorted(pimg, skeys, side="right")
        delta = jx.zeros((n + 1,), jx.int32)
        delta = delta.at[lo_].add(1)
        delta = delta.at[hi_].add(-1)
        found = _cumsum1d(delta[:n]) > 0
        if kind == "semi":
            return found if mask is None else mask & found
        nf = ~found
        return nf if mask is None else mask & nf
    if prep.get("maxdup", 1) > 1 and nb > 0:
        # semi/anti over duplicate keys with residual: statically-unrolled
        # probe of up to maxdup candidates per key (searchsorted: direct maps
        # are only built for unique-key joins)
        pos0 = jx.searchsorted(skeys, pimg, side="left")
        payload_args = []
        ii = i
        for cid, t, has_valid, d in prep["payloads"]:
            pa = (args[ii], args[ii + 1] if has_valid else None)
            payload_args.append(pa)
            ii += 1 + (1 if has_valid else 0)
        found = jx.zeros((n,), jx.bool_)
        for j in range(prep["maxdup"]):
            idx = pos0 + j
            idxc = jx.clip(idx, 0, nb - 1)
            cand = (jx.take(skeys, idxc) == pimg) & (idx < nb)
            for (cid, t, has_valid, d), (pdata, pvalidarr) in zip(
                    prep["payloads"], payload_args):
                v = cand
                if pvalidarr is not None:
                    v = v & jx.take(pvalidarr, idxc)
                env[cid] = SCol(t.as_nullable(), jx.take(pdata, idxc, axis=0), v, d)
            ok = cand
            for r in prep["residual"]:
                ok = ok & sc.truth_mask(sc.eval_expr(r, env))
            found = found | ok
        if pvalid is not None:
            found = found & pvalid
        if kind == "semi":
            return found if mask is None else mask & found
        nf = ~found
        return nf if mask is None else mask & nf
    if nb == 0:
        found = jx.zeros((n,), jx.bool_)
        posc = jx.zeros((n,), jx.int64)
    else:
        posc, found = lookup_first()
    if pvalid is not None:
        found = found & pvalid
    # bind payload columns (left-join semantics: NULL when not found) —
    # gathered in ONE batched kernel call per join (take_fast_multi)
    gather_args = []
    for cid, t, has_valid, d in prep["payloads"]:
        if nb > 0:
            gather_args.append(args[i])
            if has_valid:
                gather_args.append(args[i + 1])
        i += 1 + (1 if has_valid else 0)
    gathered = pgather.take_fast_multi(
        gather_args, posc,
        monotone=sorted_probe and direct is not None) if gather_args else []
    gi = 0
    bound = []
    for cid, t, has_valid, d in prep["payloads"]:
        if nb == 0:
            data = jx.zeros((n,), jnp_dtype(t))
            valid = jx.zeros((n,), jx.bool_)
        else:
            data = gathered[gi]
            gi += 1
            valid = found
            if has_valid:
                valid = valid & gathered[gi]
                gi += 1
        col = SCol(t.as_nullable(), data, valid, d)
        env[cid] = col
        bound.append(col)
    for r in prep["residual"]:
        found = found & sc.truth_mask(sc.eval_expr(r, env))
    if prep["residual"]:
        for cid, t, has_valid, d in prep["payloads"]:
            old = env[cid]
            env[cid] = SCol(old.type, old.data,
                            (old.valid & found) if old.valid is not None else found, d)
    if kind in ("inner", "semi"):
        return found if mask is None else mask & found
    if kind == "anti":
        nf = ~found
        return nf if mask is None else mask & nf
    return mask  # left join: mask unchanged, payload validity carries `found`


def _null_scol(template: SCol, n: int) -> SCol:
    data = jnp.zeros((n,), template.data.dtype)
    return SCol(template.type.as_nullable(), data, jnp.zeros((n,), jnp.bool_), template.dictionary)


def _null_scol_typed(t: Type, n: int) -> SCol:
    return SCol(
        t.as_nullable(), jnp.zeros((n,), jnp_dtype(t)), jnp.zeros((n,), jnp.bool_),
        np.array([""], dtype=object) if t.is_string else None,
    )


def _empty_like(c: SCol) -> SCol:
    return SCol(c.type, jnp.zeros((0,), c.data.dtype),
                None if c.valid is None else jnp.zeros((0,), jnp.bool_), c.dictionary)


def _empty_scol(t: Type) -> SCol:
    return SCol(t, jnp.zeros((0,), jnp_dtype(t)), None,
                np.zeros(0, dtype=object) if t.is_string else None)


class _WideShip(Exception):
    """A wide-decimal value beyond 127 bits cannot limb-split for the mesh
    exchange; callers fall back to the local (replicated) path."""


def _obj_to_limbs(a: np.ndarray):
    """Host object array of Python ints -> (hi, lo) int64 limb arrays that
    CAN ship over the mesh (covers the reference's full i128 range,
    LowerToStd.cpp:128-330; SQL decimal(38) needs 127 bits)."""
    try:
        hi = np.array([int(x) >> 64 for x in a], dtype=np.int64)
    except OverflowError as e:
        raise _WideShip() from e
    lo = np.array([int(x) & 0xFFFFFFFFFFFFFFFF for x in a],
                  dtype=np.uint64).view(np.int64)
    return hi, lo


def _limbs_to_obj(hi, lo) -> np.ndarray:
    hi = np.asarray(jax.device_get(hi)).astype(np.int64)
    lo = np.asarray(jax.device_get(lo)).astype(np.int64).view(np.uint64)
    return np.array([(int(h) << 64) | int(lw) for h, lw in zip(hi, lo)],
                    dtype=np.object_)


def _flatten_vt(vt: VTable):
    """VTable -> (layout, flat array list) for the shuffle exchange; rebuild
    with _rebuild_vt using the same layout. Wide-decimal object columns
    (host Python ints) limb-split into two int64 arrays so they can ship;
    raises _WideShip when a value exceeds 127 bits."""
    layout, arrays = [], []
    for cid, c in vt.cols.items():
        wide = getattr(c.data, "dtype", None) == np.object_
        layout.append((cid, c.valid is not None, wide))
        if wide:
            hi, lo = _obj_to_limbs(c.data)
            arrays.append(hi)
            arrays.append(lo)
        else:
            arrays.append(c.data)
        if c.valid is not None:
            arrays.append(np.asarray(c.valid) if wide and not isinstance(
                c.valid, jnp.ndarray) else c.valid)
    return layout, arrays


def _rebuild_vt(src: VTable, layout, arrays, n: int) -> VTable:
    cols = {}
    i = 0
    for cid, hasv, *rest in layout:
        t = src.cols[cid]
        wide = rest[0] if rest else False
        if wide:
            data = _limbs_to_obj(arrays[i], arrays[i + 1])
            i += 2
        else:
            data = arrays[i]
            i += 1
        valid = None
        if hasv:
            valid = arrays[i]
            if wide:
                valid = np.asarray(jax.device_get(valid))
            i += 1
        cols[cid] = SCol(t.type, data, valid, t.dictionary)
    return VTable(cols, n)


def _vconcat(a: VTable, b: VTable, out_cols) -> VTable:
    cols = {}
    for info in out_cols:
        ca, cb = a.col(info.cid), b.col(info.cid)
        if ca.dictionary is not None or cb.dictionary is not None:
            ca2, cb2 = _unify_string_keys(ca, cb)
            data = jnp.concatenate([ca2.data, cb2.data])
            dictionary = ca2.dictionary
        else:
            dt = jnp.promote_types(ca.data.dtype, cb.data.dtype)
            data = jnp.concatenate([ca.data.astype(dt), cb.data.astype(dt)])
            dictionary = None
        if ca.valid is None and cb.valid is None:
            valid = None
        else:
            valid = jnp.concatenate([ca.valid_mask(), cb.valid_mask()])
        cols[info.cid] = SCol(info.type, data, valid, dictionary)
    return VTable(cols, a.num_rows + b.num_rows)


def _scol_from_values(vals: list, t: Type) -> SCol:
    n = len(vals)
    valid_np = np.array([v is not None for v in vals], dtype=np.bool_)
    all_valid = bool(valid_np.all())
    if t.is_string:
        strs = ["" if v is None else str(v) for v in vals]
        dictionary, codes = strmod.encode_strings(strs)
        return SCol(t, jnp.asarray(codes), None if all_valid else jnp.asarray(valid_np), dictionary)
    dtype = np.dtype(jnp_dtype(t))
    arr = np.zeros(n, dtype=dtype)
    try:
        for i, v in enumerate(vals):
            if v is not None:
                arr[i] = v
    except OverflowError:
        # wide-decimal values beyond int64: exact host object column
        arr = np.array([0 if v is None else int(v) for v in vals],
                       dtype=np.object_)
        return SCol(t, arr, None if all_valid else valid_np)
    return SCol(t, jnp.asarray(arr), None if all_valid else jnp.asarray(valid_np))
