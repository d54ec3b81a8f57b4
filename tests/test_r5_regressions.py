"""Round-5 regression tests for shipping-path bugs found in the round-4
review (VERDICT.md weak #1, ADVICE.md high #1/#2, low #3/#4):

1. Device byte-plane LIKE evaluated INSIDE a fused program trace must not
   cache tracer-backed planes (q13 crashed the all-22 run with
   UnexpectedTracerError on its second execution).
2. float32 MIN/MAX in the fused general grouping must order mixed-sign
   values correctly (the sign-flip image was interpreted as signed int32).
3. Trailing-NUL strings must mark the byte planes inexact (S-dtype trims
   trailing \x00, so 'a\x00' would silently device-match as 'a').
4. A trace-time exception inside the fused program must not leave
   pgather._OVF_SINK installed (it would disable the eager gathers'
   overflow fallback for the rest of the process).
"""

import os

import numpy as np
import pytest

QDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "queries", "tpch")


@pytest.fixture(scope="module")
def tiny_tpch():
    import lingodb_tpu as ldb
    from lingodb_tpu.ops import bytestr
    from lingodb_tpu.runtime import device as dv
    from lingodb_tpu.tools import tpchgen

    old_small, old_min = dv.SMALL_ROWS, bytestr.DEVICE_DICT_MIN
    dv.SMALL_ROWS = 64
    bytestr.DEVICE_DICT_MIN = 64
    s = ldb.create_in_memory()
    tpchgen.load_into(s, sf=0.005)
    yield s
    dv.SMALL_ROWS = old_small
    bytestr.DEVICE_DICT_MIN = old_min


@pytest.mark.parametrize("q", [13, 9])
def test_device_like_inside_fused_trace_runs_twice(q, tiny_tpch):
    """The r4 all-22 crash: the SECOND run of a LIKE query whose dictionary
    crossed DEVICE_DICT_MIN hit cached tracer-backed byte planes."""
    s = tiny_tpch
    sql = open(os.path.join(QDIR, f"{q}.sql")).read()
    r1 = s.sql(sql).format_rows()
    r2 = s.sql(sql).format_rows()
    assert r1 == r2


def test_fused_general_group_float32_mixed_sign_minmax(session):
    from lingodb_tpu.runtime import device as dv
    import lingodb_tpu.runtime.executor as ex

    old = dv.SMALL_ROWS
    dv.SMALL_ROWS = 16
    try:
        s = session
        s.sql_stmt("CREATE TABLE fx (k BIGINT NOT NULL, v FLOAT)")
        rng = np.random.default_rng(7)
        keys = (rng.integers(0, 40, 400) * 1_000_000_007 + 13).tolist()
        vals = np.round(rng.normal(0.0, 5.0, 400), 3)  # mixed sign
        rows = ", ".join(f"({k}, {v})" for k, v in zip(keys, vals))
        s.sql_stmt(f"INSERT INTO fx VALUES {rows}")

        called = []
        orig = ex._fused_general_group

        def spy(*a, **kw):
            called.append(True)
            return orig(*a, **kw)

        ex._fused_general_group = spy
        try:
            got = s.sql("SELECT k, MIN(v), MAX(v) FROM fx GROUP BY k "
                        "ORDER BY k").to_pandas()
        finally:
            ex._fused_general_group = orig

        import collections
        mn = collections.defaultdict(lambda: np.inf)
        mx = collections.defaultdict(lambda: -np.inf)
        for k, v in zip(keys, np.float32(vals)):
            mn[k] = min(mn[k], v)
            mx[k] = max(mx[k], v)
        want = sorted(mn)
        assert list(got.iloc[:, 0]) == want
        np.testing.assert_allclose(got.iloc[:, 1], [mn[k] for k in want],
                                   rtol=1e-6)
        np.testing.assert_allclose(got.iloc[:, 2], [mx[k] for k in want],
                                   rtol=1e-6)
        assert called, "fused general grouping did not engage"
    finally:
        dv.SMALL_ROWS = old


def test_planes_trailing_nul_marked_inexact():
    from lingodb_tpu.ops import bytestr

    d = np.array(["a\x00", "ab", "a"], dtype=object)
    _b2d, _lens, _ascii, exact = bytestr._planes(d)
    assert exact is False
    assert bytestr.device_like_mask(d, "a") is None  # host fallback


def test_planes_cache_holds_concrete_arrays_under_trace():
    import jax

    from lingodb_tpu.ops import bytestr

    d = np.array([f"w{i:05d}" for i in range(200)], dtype=object)

    @jax.jit
    def prog(x):
        m = bytestr.device_like_mask(d, "w0000_")
        return x + m.sum()

    prog(0)
    # cached planes and mask must be reusable outside the trace
    mask = bytestr.device_like_mask(d, "w0000_")
    assert int(np.asarray(mask).sum()) == 10
    b2d, lens, _a, _e = bytestr._planes(d)
    assert int(np.asarray(lens)[0]) == 6  # concrete, not a leaked tracer


def test_ovf_sink_restored_after_trace_failure():
    import jax

    from lingodb_tpu.ops import pgather

    assert pgather._OVF_SINK is None
    ctx = pgather.collect_ovf()
    sink = ctx.__enter__()
    try:
        try:
            raise RuntimeError("trace failed")
        finally:
            ctx.__exit__(None, None, None)
    except RuntimeError:
        pass
    assert pgather._OVF_SINK is None
    # idempotent: a second (finally-block) exit must not clobber an outer ctx
    outer = pgather.collect_ovf()
    outer.__enter__()
    inner = pgather.collect_ovf()
    inner.__enter__()
    inner.__exit__(None, None, None)
    inner.__exit__(None, None, None)  # double exit
    assert pgather._OVF_SINK is not None  # outer sink still installed
    outer.__exit__(None, None, None)
    assert pgather._OVF_SINK is None


def test_wide_decimal_build_payload_declines_fusion(tiny_tpch):
    """The r5 all-22 crash at q17: a fused join prep whose build side carries
    a wide-decimal (host object array) payload tried jax.device_put on it.
    The prep must decline so the eager path (which handles object columns)
    runs. Differential vs sqlite3 pins the value."""
    import sqlite3

    from lingodb_tpu.tools import sqlite_oracle as so
    from lingodb_tpu.tools import tpchgen

    s = tiny_tpch
    sql = open(os.path.join(QDIR, "17.sql")).read()
    r1 = s.sql(sql)
    r2 = s.sql(sql)
    assert r1.format_rows() == r2.format_rows()
    con = sqlite3.connect(":memory:")
    tpchgen.to_sqlite(con, tpchgen.generate_cached(0.005, 19920601))
    exp = con.execute(sql).fetchall()
    ok, msg = so.rows_equal(so.our_rows(r1), exp, ordered=False)
    assert ok, msg


def test_wide_decimal_scalar_broadcast_declines_fusion(tiny_tpch, monkeypatch):
    """The r5 all-22 crash at q22: a 1-row (scalar-subquery) build side whose
    payload is a wide-decimal host object array (avg(c_acctbal)) was shipped
    into the fused program via single_broadcast. The prep must decline.
    Oracle: the same engine with fusion disabled."""
    from lingodb_tpu.runtime.executor import Executor

    s = tiny_tpch
    sql = open(os.path.join(QDIR, "22.sql")).read()
    fused1 = s.sql(sql).format_rows()
    fused2 = s.sql(sql).format_rows()
    assert fused1 == fused2
    monkeypatch.setattr(
        Executor, "_try_fused_agg",
        lambda self, op, epi=None: (None, False) if epi is not None else None)
    monkeypatch.setattr(Executor, "_try_fused_chain",
                        lambda self, op, epi=None: None)
    monkeypatch.setattr(Executor, "_try_fused_topk", lambda self, op: None)
    eager = s.sql(sql).format_rows()
    assert fused1 == eager


def test_promote_keeps_wide_decimal_columns_on_host():
    """The r5 all-22 crash at q22 (third attempt, chip-only): align_devices
    promoted a demoted 1-row scalar-subquery result back to the accelerator
    and jax.device_put choked on the wide-decimal object column. promote()
    must pass host object columns through untouched."""
    import numpy as np

    from lingodb_tpu.runtime import device as dv
    from lingodb_tpu.runtime.vtable import SCol, VTable
    from lingodb_tpu.sql.types import Type, K

    wide = Type(K.DECIMAL, p=22, s=6)
    obj = np.array([int(10**20)], dtype=object)
    vt = VTable({1: SCol(wide, obj, None, None)}, 1)
    out = dv.promote(vt)
    assert out.col(1).data is obj


def test_lineitem_supplier_pairs_exist_in_partsupp():
    """Generator self-check (the q9-empty bug): every lineitem
    (l_partkey, l_suppkey) pair must exist in partsupp, as dbgen guarantees
    (TPC-H spec 4.2.3) — otherwise every partsupp x lineitem join (q9, q20)
    is vacuously empty and the sqlite differential cannot notice."""
    import numpy as np

    from lingodb_tpu.tools import tpchgen

    t = tpchgen.generate_cached(0.01, 19920601)
    ps_p = np.asarray(t["partsupp"].columns[0].data)
    ps_s = np.asarray(t["partsupp"].columns[1].data)
    li_p = np.asarray(t["lineitem"].columns[1].data)
    li_s = np.asarray(t["lineitem"].columns[2].data)
    bridge = set(zip(ps_p.tolist(), ps_s.tolist()))
    pairs = set(zip(li_p.tolist(), li_s.tolist()))
    missing = pairs - bridge
    assert not missing, f"{len(missing)} lineitem pairs missing from partsupp"


def test_q9_nonempty():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    s = ldb.create_in_memory()
    tpchgen.load_into(s, sf=0.01)
    r = s.sql(open(os.path.join(QDIR, "9.sql")).read())
    assert len(r.format_rows()) > 0
