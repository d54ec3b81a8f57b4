"""Session: the embedding API (parse -> bind -> optimize -> execute).

TPU-native equivalent of the reference's Session + QueryExecuter
(reference: src/runtime/Session.cpp, src/execution/Execution.cpp:250-401 —
frontend -> optimizer -> lowering -> backend -> result processing with phase
timing). The Python package mirrors the reference pip API
(reference: tools/python/lingodb/__init__.py:44-67 — Connection.sql,
connect_to_db, create_in_memory)."""

from __future__ import annotations

import csv as csvmod
import os

import jax.numpy as jnp
import numpy as np

from .catalog.catalog import Catalog, FunctionEntry
from .opt.optimizer import optimize
from .plan import logical as L
from .runtime.executor import Executor
from .runtime.result import ResultTable
from .runtime.vtable import SCol
from .sql import ast as A
from .sql.binder import Binder, BindError
from .sql.parser import parse_sql
from .storage.column import Column
from .utils import tracer
from .utils.settings import get_setting


class Prepared:
    """A parsed + optimized query awaiting execution (prefetches started)."""

    def __init__(self, query: str, stmts, plan):
        self.query = query
        self.stmts = stmts
        self.plan = plan


class Session:
    def __init__(self, db_dir: str | None = None):
        self.catalog = Catalog(db_dir)
        self.executor = Executor(self)
        self._device_cache: dict[str, tuple[int, dict]] = {}
        # plan_key -> compiled stage (reference analogue: the JIT object
        # cache in LLVMBackends.cpp:81-460)
        self.stage_cache: dict = {}

    # ----------------------------------------------------------- public API
    def sql(self, query: str):
        """Execute SQL; returns ResultTable for queries, None for statements.
        Multiple statements: executes all, returns the last query's result."""
        stmts = parse_sql(query)
        result = None
        for stmt in stmts:
            result = self._execute_statement(stmt)
        return result

    def sql_stmt(self, query: str) -> None:
        self.sql(query)

    # ------------------------------------------------- pipelined execution
    def prepare(self, query: str) -> "Prepared":
        """Parse, bind, and optimize without executing, and kick off the
        async device upload of every scan column the plan touches. This is
        the unit `sql_many` overlaps with the previous query's execution
        (reference: compilation runs inside scheduler tasks so one query
        compiles while another executes over warm contexts,
        src/execution/Execution.cpp:294-325)."""
        stmts = parse_sql(query)
        plan = None
        if stmts and isinstance(stmts[-1], A.SelectStmt):
            plan = optimize(Binder(self.catalog).bind_query(stmts[-1]),
                            self.catalog)
            self._prefetch_plan(plan)
        return Prepared(query, stmts, plan)

    def execute_prepared(self, prepared: "Prepared"):
        result = None
        for i, stmt in enumerate(prepared.stmts):
            if i == len(prepared.stmts) - 1 and prepared.plan is not None:
                result = self.executor.execute(prepared.plan)
            else:
                result = self._execute_statement(stmt)
        return result

    def _prefetch_plan(self, plan) -> None:
        """Start H2D transfers for the plan's scan columns (device_put is
        asynchronous: transfers proceed while other work runs)."""
        from .plan import logical as L

        for op in L.walk_plan(plan):
            if isinstance(op, L.Scan):
                try:
                    dev = self.device_table(op.table)
                    dev["__num_rows__"]
                    for c in op.cols:
                        dev[c.name]
                except Exception:
                    pass  # prefetch is best-effort; execution re-raises

    def sql_many(self, queries, overlap: bool | None = None) -> list:
        """Execute a sequence of SQL strings, overlapping each query's
        frontend/optimizer/H2D prefetch with the previous one's device
        execution. overlap=None follows the system.overlap setting."""
        import concurrent.futures as cf

        if overlap is None:
            overlap = bool(get_setting("system.overlap"))
        queries = list(queries)
        if not overlap or len(queries) <= 1:
            return [self.sql(q) for q in queries]
        out = []
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(self.prepare, queries[0])
            for i in range(len(queries)):
                pq = nxt.result()
                nxt = None
                # only pure SELECTs overlap the next prepare: a DDL/DML
                # statement mutates the catalog the concurrent bind would read
                pure = all(isinstance(st, A.SelectStmt) for st in pq.stmts)
                if pure and i + 1 < len(queries):
                    nxt = pool.submit(self.prepare, queries[i + 1])
                out.append(self.execute_prepared(pq))
                if nxt is None and i + 1 < len(queries):
                    nxt = pool.submit(self.prepare, queries[i + 1])
        return out

    def explain(self, query: str) -> str:
        stmts = parse_sql(query)
        binder = Binder(self.catalog)
        plan = binder.bind_query(stmts[-1])
        plan = optimize(plan, self.catalog)
        return plan.pretty()

    def append_table(self, name: str, table) -> None:
        """Append a pyarrow.Table to an existing table (reference pip API:
        Connection.append_table, tools/python/lingodb/__init__.py:59)."""
        from .storage.table import _from_arrow

        entry = self.catalog.get_table(name)
        if entry is None:
            raise BindError(f"unknown table {name}")
        cols = [_from_arrow(t, table.column(n))
                for n, t in zip(entry.column_names, entry.column_types)]
        entry.storage.append_columns(cols)
        self._device_cache.pop(name, None)

    def add_table(self, name: str, table) -> None:
        """Create + populate a table from a pyarrow.Table (reference pip API:
        Connection.add_table, tools/python/lingodb/__init__.py:62)."""
        from .catalog.catalog import arrow_schema_types

        names, types = arrow_schema_types(table.schema)
        self.catalog.create_table(name, names, types, [])
        self.append_table(name, table)

    def plan_json(self, query: str) -> str:
        """Optimized plan as JSON (reference: relalg-to-json exporters used
        by the ct web tooling, tools/ct/mlir-relalg-to-json.cpp)."""
        from .plan.serial import plan_to_json

        stmts = parse_sql(query)
        plan = optimize(Binder(self.catalog).bind_query(stmts[-1]), self.catalog)
        return plan_to_json(plan)

    def run_plan(self, serialized: str):
        """Execute a serialized plan (the compiler-level entry point — the
        analogue of run-mlir executing pre-built IR, src/tools/run-mlir.cpp)."""
        from .plan.serial import plan_from_json

        return self.executor.execute(plan_from_json(serialized))

    def close(self):
        self.catalog.save()

    def export_reference(self, db_dir: str) -> None:
        """Write the catalog + data as a reference (LingoDB) database
        directory: binary db.lingodb catalog + plain-encoded Arrow IPC files
        (reference: Catalog::persist, src/catalog/Catalog.cpp:63-75)."""
        self.catalog.save_reference(db_dir)

    # ------------------------------------------------------------ statements
    def _execute_statement(self, stmt):
        t = tracer.Timing()
        if isinstance(stmt, A.SelectStmt):
            from .utils import compilestats

            cs0 = compilestats.snapshot()
            with t.time("frontend"):
                binder = Binder(self.catalog)
                plan = binder.bind_query(stmt)
            with t.time("QOpt"):
                plan = optimize(plan, self.catalog)
            with t.time("execution"):
                try:
                    res = self.executor.execute(plan)
                except Exception as e:
                    # HBM exhaustion mid-benchmark (SF10 working sets +
                    # cached uploads + join preps exceed one chip's 16GB):
                    # drop every cached device buffer and retry once.
                    # Reference analogue: buffer-manager eviction under
                    # memory pressure; our unit is whole cached columns.
                    if "RESOURCE_EXHAUSTED" not in repr(e):
                        raise
                    import sys

                    print("# device OOM: evicting cached buffers and "
                          "retrying", file=sys.stderr)
                    self._evict_device_memory()
                    res = self.executor.execute(plan)
            self._relieve_memory_pressure()
            if get_setting("sql.report_times"):
                cs = compilestats.delta(cs0)
                print(t.report()
                      + f"  [xla compiles={cs['compiles']} "
                      f"({cs['compile_secs']:.1f}s) "
                      f"cache_hits={cs['cache_hits']}]")
            return res
        if isinstance(stmt, A.ExplainStmt):
            from .sql.types import Type

            binder = Binder(self.catalog)
            plan = binder.bind_query(stmt.query)
            if stmt.verbose:
                lines = ["-- logical plan (pre-optimization)"]
                lines += plan.pretty().splitlines()
                lines.append("-- optimized plan")
            else:
                lines = []
            plan = optimize(plan, self.catalog)
            if stmt.analyze:
                import time as _time

                counts: dict = {}
                self.executor.track_tuples = counts
                t0 = _time.time()
                try:
                    self.executor.execute(plan)
                finally:
                    self.executor.track_tuples = None
                dt = _time.time() - t0

                def annotate(op, indent=0):
                    rows = counts.get(id(op))
                    suffix = f"  [rows={rows}]" if rows is not None else ""
                    ls = ["  " * indent + op._describe() + suffix]
                    for c in op.children():
                        ls.extend(annotate(c, indent + 1))
                    return ls

                lines += annotate(plan)
                lines.append(f"-- execution: {dt * 1e3:.1f} ms")
                from .storage.column import encode_strings

                dct, codes = encode_strings(lines)
                return ResultTable(["plan"], [Type.string()], [codes], [None],
                                   [dct], len(lines))
            lines += plan.pretty().splitlines()
            from .storage.column import encode_strings

            dct, codes = encode_strings(lines)
            return ResultTable(["plan"], [Type.string()], [codes], [None],
                               [dct], len(lines))
        if isinstance(stmt, A.CreateTableStmt):
            names = [c.name for c in stmt.columns]
            types = [
                c.type.as_nullable(not (c.not_null or c.primary_key))
                for c in stmt.columns
            ]
            pk = stmt.primary_key or [c.name for c in stmt.columns if c.primary_key]
            self.catalog.create_table(stmt.name, names, types, pk)
            return None
        if isinstance(stmt, A.DropTableStmt):
            self.catalog.drop_table(stmt.name)
            return None
        if isinstance(stmt, A.CreateIndexStmt):
            self.catalog.create_index(stmt.name, stmt.table, stmt.columns)
            return None
        if isinstance(stmt, A.CreateViewStmt):
            if not hasattr(self.catalog, "views"):
                self.catalog.views = {}
            self.catalog.views[stmt.name] = stmt.query
            return None
        if isinstance(stmt, A.InsertStmt):
            return self._execute_insert(stmt)
        if isinstance(stmt, A.CopyStmt):
            return self._execute_copy(stmt)
        if isinstance(stmt, A.SetStmt):
            from .utils.settings import set_setting

            set_setting(stmt.key, stmt.value)
            return None
        if isinstance(stmt, A.CreateFunctionStmt):
            from .catalog.catalog import compile_function

            entry = FunctionEntry(stmt.name, stmt.arg_types, stmt.return_type,
                                  stmt.language, stmt.body,
                                  arg_names=list(stmt.arg_names))
            compile_function(entry)
            self.catalog.create_function(entry)
            return None
        raise NotImplementedError(type(stmt).__name__)

    def _execute_insert(self, stmt: A.InsertStmt):
        entry = self.catalog.get_table(stmt.table)
        if entry is None:
            raise BindError(f"unknown table {stmt.table}")
        target_cols = stmt.columns or entry.column_names
        binder = Binder(self.catalog)
        plan = binder.bind_query(stmt.query)
        plan = optimize(plan, self.catalog)
        res = self.executor.execute(plan)
        # column-order mapping + type coercion to the table schema
        rows = res.to_pylist()
        from .ops.consteval import coerce_py

        out_rows = []
        cmap = {c: i for i, c in enumerate(target_cols)}
        for r in rows:
            full = []
            for name, t in zip(entry.column_names, entry.column_types):
                if name in cmap:
                    v = r[cmap[name]]
                    src_t = res.types[cmap[name]]
                    full.append(None if v is None else coerce_py(v, src_t, t))
                else:
                    full.append(None)
            out_rows.append(full)
        # values arrive in physical representation already for decimals/dates
        cols = []
        for i, t in enumerate(entry.column_types):
            vals = [r[i] for r in out_rows]
            cols.append(_column_from_physical(t, vals))
        entry.storage.append_columns(cols)
        self._device_cache.pop(entry.name, None)
        return None

    def _execute_copy(self, stmt: A.CopyStmt):
        """COPY table FROM 'file.csv': bulk load through the Arrow C++ CSV
        reader (native, multithreaded — the same engine the reference's
        copyFromIntoTable uses, RelationHelper.cpp); Python csv fallback for
        options Arrow can't express."""
        entry = self.catalog.get_table(stmt.table)
        if entry is None:
            raise BindError(f"unknown table {stmt.table}")
        delim = stmt.options.get("delimiter", ",")
        nullstr = stmt.options.get("null", "")
        escape = stmt.options.get("escape", None) or None
        try:
            self._copy_arrow(entry, stmt.path, delim, nullstr, escape)
        except Exception:
            self._copy_python(entry, stmt.path, delim, nullstr, escape)
        self._device_cache.pop(entry.name, None)
        return None

    def _copy_arrow(self, entry, path, delim, nullstr, escape):
        import pyarrow as pa
        import pyarrow.csv as pacsv

        from .storage.table import _from_arrow, arrow_type_for

        read = pacsv.ReadOptions(column_names=entry.column_names)
        parse = pacsv.ParseOptions(
            delimiter=delim,
            escape_char=escape if escape else False,
        )
        conv = pacsv.ConvertOptions(
            null_values=[nullstr],
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,
            column_types={n: arrow_type_for(t) for n, t in
                          zip(entry.column_names, entry.column_types)},
        )
        table = pacsv.read_csv(path, read_options=read, parse_options=parse,
                               convert_options=conv)
        cols = [_from_arrow(t, table.column(n))
                for n, t in zip(entry.column_names, entry.column_types)]
        entry.storage.append_columns(cols)

    def _copy_python(self, entry, path, delim, nullstr, escape):
        rows = []
        with open(path, newline="") as f:
            reader = csvmod.reader(f, delimiter=delim, escapechar=escape)
            for rec in reader:
                row = []
                for v, t in zip(rec, entry.column_types):
                    if v == nullstr and t.nullable:
                        row.append(None)
                    else:
                        row.append(v)
                rows.append(row)
        entry.storage.append_rows(rows)

    # ----------------------------------------------------------- device data
    def _evict_device_memory(self) -> None:
        """Drop every cached device buffer this session pins: uploaded table
        columns, join-prep arrays (LUTs + payloads), and one-shot
        materializations. Everything is rebuildable; the next query
        re-uploads what it actually touches."""
        for t in _LazyDeviceTable._ALL:
            t._cols.clear()
        for k in [k for k in self.stage_cache
                  if isinstance(k, tuple) and k and k[0] == "fused_prep"]:
            del self.stage_cache[k]
        self.executor._tmp_results.clear()
        self.executor._materialized_bases.clear()
        import gc

        gc.collect()

    def _relieve_memory_pressure(self) -> None:
        """Proactive eviction when the accelerator sits near capacity after
        a statement (cached SF10 uploads + preps approach the chip's HBM):
        prevents the NEXT query's working set from hitting the allocator
        wall mid-program."""
        try:
            from .runtime import device as dv

            _cpu, accel = dv.devices()
            stats = accel.memory_stats() if accel is not None else None
            if not stats:
                return
            used = stats.get("bytes_in_use", 0)
            limit = stats.get("bytes_limit", 0)
            if limit and used > 0.8 * limit:
                import sys

                print(f"# device memory {used / 1e9:.1f}/{limit / 1e9:.1f}GB:"
                      f" evicting cached buffers", file=sys.stderr)
                self._evict_device_memory()
        except Exception:
            pass

    def device_table(self, name: str) -> dict:
        """Lazily upload (and cache) a table's columns as device tensors —
        columns transfer on first access, mirroring the reference's
        column-projected scans (reference: DataSourceIteration.cpp +
        ScanConfig.columns, TableStorage.h:81-95)."""
        entry = self.catalog.get_table(name)
        storage = entry.storage
        cached = self._device_cache.get(name)
        if cached is not None and cached[0] == storage.version:
            return cached[1]
        dev = _LazyDeviceTable(storage)
        self._device_cache[name] = (storage.version, dev)
        return dev


class _LazyDeviceTable:
    """dict-like device view of a table; columns upload on first access."""

    _ALL: list = []  # registry for cross-table eviction under memory pressure

    def __init__(self, storage):
        self._storage = storage
        self._cols: dict[str, SCol] = {}
        _LazyDeviceTable._ALL.append(self)

    def _evict_others(self) -> bool:
        freed = False
        for t in _LazyDeviceTable._ALL:
            if t is not self and t._cols:
                t._cols.clear()
                freed = True
        import gc

        gc.collect()
        return freed

    def __getitem__(self, key):
        import jax

        from .runtime import device as dv

        mesh = dv.get_mesh() if self._storage.num_rows >= dv.SMALL_ROWS else None
        if key == "__num_rows__":
            if mesh is not None:
                n = mesh.shape["dp"]
                return self._storage.num_rows + (-self._storage.num_rows) % n
            return self._storage.num_rows
        if key == "__pad_mask__":
            # rows beyond the true count are padding when sharded over a mesh
            if mesh is None or self._storage.num_rows % mesh.shape["dp"] == 0:
                return None
            m = self._cols.get("__pad_mask__")
            if m is None:
                import numpy as _np

                rows = self._storage.num_rows
                total = rows + (-rows) % mesh.shape["dp"]
                mask = _np.zeros(total, _np.bool_)
                mask[:rows] = True
                m, _ = dv.shard_column(mask, mesh)
                self._cols["__pad_mask__"] = m
            return m
        c = self._cols.get(key)
        if c is None:
            col = self._storage.column(key)
            with tracer.Trace("runtime", f"upload:{self._storage.name}.{key}"):
                if mesh is not None:
                    dnp = np.asarray(col.data)
                    if dnp.dtype == np.object_:
                        # wide decimals (host Python ints) cannot live on
                        # device; keep them host-side, padded to the sharded
                        # row count (the shuffle layer limb-splits them into
                        # int64 pairs when they must cross the mesh)
                        total = self["__num_rows__"]
                        valid = col.valid
                        if dnp.shape[0] < total:
                            pad = total - dnp.shape[0]
                            dnp = np.concatenate(
                                [dnp, np.full(pad, 0, dtype=object)])
                            if valid is not None:
                                valid = np.concatenate([
                                    np.asarray(valid),
                                    np.zeros(pad, np.bool_)])
                        c = SCol(col.type, dnp, valid, col.dictionary)
                    else:
                        data, _ = dv.shard_column(dnp, mesh)
                        valid = None
                        if col.valid is not None:
                            valid, _ = dv.shard_column(
                                np.asarray(col.valid), mesh)
                        c = SCol(col.type, data, valid, col.dictionary)
                elif self._storage.num_rows < dv.SMALL_ROWS:
                    # small tables stay host numpy: operators run through the
                    # numpy twin backend with zero XLA compilation
                    c = SCol(col.type, np.ascontiguousarray(col.data),
                             col.valid, col.dictionary)
                else:
                    _cpu, accel = dv.devices()
                    try:
                        c = SCol(
                            col.type, jax.device_put(col.data, accel),
                            None if col.valid is None else jax.device_put(col.valid, accel),
                            col.dictionary,
                        )
                    except Exception:
                        # device memory pressure: evict cached columns of
                        # other tables (reference analogue: buffer-manager
                        # style eviction; our unit is whole columns) and retry
                        evicted = self._evict_others()
                        if not evicted:
                            raise
                        c = SCol(
                            col.type, jax.device_put(col.data, accel),
                            None if col.valid is None else jax.device_put(col.valid, accel),
                            col.dictionary,
                        )
            self._cols[key] = c
        return c


def _column_from_physical(t, vals):
    """Build a storage Column from already-physical values (post coerce_py)."""
    n = len(vals)
    valid = np.array([v is not None for v in vals], dtype=np.bool_)
    all_valid = bool(valid.all())
    if t.is_string:
        from .storage.column import encode_strings

        dictionary, codes = encode_strings(["" if v is None else str(v) for v in vals])
        return Column(t, codes, None if all_valid else valid, dictionary)
    from .storage.column import physical_dtype

    arr = np.zeros(n, dtype=physical_dtype(t))
    try:
        for i, v in enumerate(vals):
            if v is not None:
                arr[i] = v
    except OverflowError:
        # wide decimal beyond int64: exact Python-int object column
        arr = np.array([0 if v is None else int(v) for v in vals],
                       dtype=np.object_)
    return Column(t, arr, None if all_valid else valid)


def create_in_memory() -> Session:
    return Session(None)


def connect_to_db(path: str) -> Session:
    return Session(path)
