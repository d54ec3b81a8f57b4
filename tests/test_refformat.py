"""Reference (LingoDB) database-directory interop.

The binary db.lingodb catalog format is implemented byte-for-byte from the
reference serializer (reference: src/catalog/Catalog.cpp:21-75,
utility/Serialization.h wire format, src/runtime/storage/LingoDBTable.cpp:
306-313). These tests round-trip write->open through that format, verify the
marker/property structure directly, and exercise the persisted HyperLogLog
sketches (include/lingodb/utility/HyperLogLog.h)."""

import os
import struct

import numpy as np
import pytest


def _mkdb(tmp_path, name="refdb"):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    return d


def test_reference_roundtrip_types(tmp_path, session):
    """Every exportable column type survives session -> reference dir ->
    fresh session opened directly on the reference dir."""
    import lingodb_tpu as ldb

    session.sql(
        "create table t (i int not null, b bigint, f float, d double,"
        " dec decimal(8,2), wide decimal(30,4), dt date, ts timestamp,"
        " s varchar(20), c char(1), bo boolean)")
    session.sql(
        "insert into t values"
        " (1, 100, 1.5, 2.5, 12.34, 12345678901234567890.1234,"
        "  '2020-01-02', '2020-01-02 03:04:05', 'hello', 'x', true),"
        " (2, null, null, null, null, null, null, null, null, null, null),"
        " (3, -7, 0.5, -0.25, -99.99, -1.0001,"
        "  '1999-12-31', '1999-12-31 23:59:59', 'wörld', 'y', false)")
    ref = _mkdb(tmp_path)
    session.export_reference(ref)
    assert os.path.exists(os.path.join(ref, "db.lingodb"))
    assert os.path.exists(os.path.join(ref, "t.arrow"))

    s2 = ldb.connect_to_db(ref)
    assert s2.catalog.ref_format
    r = s2.sql("select * from t order by i").format_rows()
    assert r[0] == ["1", "100", "1.5", "2.5", "12.34", "12345678901234567890.1234",
                    "2020-01-02", "2020-01-02 03:04:05", "hello", "x", "t"]
    assert r[1][1:] == ["NULL"] * 10
    assert r[2][8:] == ["wörld", "y", "f"]


def test_reference_arrow_files_are_plain(tmp_path, session):
    """Exported .arrow files use the reference's physical encodings (plain
    utf8, decimal128, fsb(4) chars - LingoDBTable.cpp:141-191), so reference
    scan kernels (no dictionary-array path) can read them."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    session.sql("create table t (s varchar(10), dec decimal(6,2), c char(1))")
    session.sql("insert into t values ('aa', 1.25, 'z'), ('bb', -3.5, 'q')")
    ref = _mkdb(tmp_path)
    session.export_reference(ref)
    with ipc.open_file(os.path.join(ref, "t.arrow")) as rd:
        tbl = rd.read_all()
    assert pa.types.is_string(tbl.schema.field("s").type)
    assert pa.types.is_decimal(tbl.schema.field("dec").type)
    assert pa.types.is_fixed_size_binary(tbl.schema.field("c").type)
    assert tbl.schema.field("c").type.byte_width == 4
    assert tbl.column("s").to_pylist() == ["aa", "bb"]
    assert [str(v) for v in tbl.column("dec").to_pylist()] == ["1.25", "-3.50"]


def test_reference_catalog_wire_structure(tmp_path, session):
    """The db.lingodb byte stream has the exact outer structure the reference
    deserializer expects (Catalog.cpp:63-75: writeProperty(0, catalog) ->
    marker 0, object start, version prop, entry map)."""
    session.sql("create table x (a int)")
    session.sql("insert into x values (1)")
    ref = _mkdb(tmp_path)
    session.export_reference(ref)
    raw = open(os.path.join(ref, "db.lingodb"), "rb").read()
    # marker 0 | OBJ_START | prop-0 marker | version u64 | prop-0 marker ...
    assert struct.unpack_from("<H", raw, 0)[0] == 0
    assert struct.unpack_from("<H", raw, 2)[0] == 0xFFFE
    assert struct.unpack_from("<H", raw, 4)[0] == 0
    assert struct.unpack_from("<Q", raw, 6)[0] == 3  # binaryVersion
    assert struct.unpack_from("<H", raw, 14)[0] == 0
    # stream ends with OBJ_END + closing marker 0
    assert struct.unpack_from("<H", raw, len(raw) - 4)[0] == 0xFFFF
    assert struct.unpack_from("<H", raw, len(raw) - 2)[0] == 0


def test_reference_pk_index_and_stats(tmp_path, session):
    import lingodb_tpu as ldb

    session.sql("create table d (id int not null primary key, v varchar(5))")
    session.sql("insert into d values (1,'a'),(2,'b'),(3,'c')")
    session.sql("create index d_id on d(id)")
    ref = _mkdb(tmp_path)
    session.export_reference(ref)

    s2 = ldb.connect_to_db(ref)
    e = s2.catalog.get_table("d")
    assert e.primary_key == ["id"]
    assert e.index_on(["id"]) == "d_id"
    assert e.distinct_count("id") >= 1


def test_reference_udf_roundtrip(tmp_path, session):
    """C and python UDFs persist through the reference catalog's code-string
    convention (full C definition / verbatim python def,
    sql_mlir_translator.cpp:231-263) and recompile on open."""
    import lingodb_tpu as ldb

    session.sql("create table ints (i int not null)")
    session.sql("insert into ints values (1),(2),(3)")
    session.sql(
        "create function add_one(x int) returns int language c as"
        " $$ return x+1; $$")
    session.sql(
        "create function py_dbl(x int) returns int as $$\n"
        "def py_dbl(x):\n    return x * 2\n$$ language python")
    ref = _mkdb(tmp_path)
    session.export_reference(ref)

    s2 = ldb.connect_to_db(ref)
    r = s2.sql("select add_one(i), py_dbl(i) from ints order by i").format_rows()
    assert r == [["2", "2"], ["3", "4"], ["4", "6"]]


def test_reference_format_resaves_on_close(tmp_path, session):
    """A session opened on a reference dir keeps writing the reference format
    on close (appended rows + catalog survive a second open)."""
    import lingodb_tpu as ldb

    session.sql("create table t (a int)")
    session.sql("insert into t values (1),(2)")
    ref = _mkdb(tmp_path)
    session.export_reference(ref)

    s2 = ldb.connect_to_db(ref)
    s2.sql("insert into t values (3)")
    s2.close()
    assert not os.path.exists(os.path.join(ref, "catalog.json"))

    s3 = ldb.connect_to_db(ref)
    assert s3.sql("select count(*), sum(a) from t").format_rows() == [["3", "6"]]


def test_hll_estimate_accuracy():
    """m=64 HLL standard error is ~1.04/sqrt(64) = 13%; check the Ertl
    estimator lands within 3 sigma across scales (HyperLogLog.cpp:41-56)."""
    from lingodb_tpu.ops.hashing import splitmix64
    from lingodb_tpu.utils import hll

    for n in (10, 1000, 100_000):
        h = np.asarray(splitmix64(np.arange(n, dtype=np.uint64)))
        est = hll.estimate(hll.registers_from_hashes(h))
        assert abs(est - n) <= max(3, 0.40 * n), (n, est)


def test_hll_merge_matches_union():
    from lingodb_tpu.ops.hashing import splitmix64
    from lingodb_tpu.utils import hll

    a = np.asarray(splitmix64(np.arange(0, 5000, dtype=np.uint64)))
    b = np.asarray(splitmix64(np.arange(2500, 7500, dtype=np.uint64)))
    ra, rb = hll.registers_from_hashes(a), hll.registers_from_hashes(b)
    merged = hll.merge(ra, rb)
    both = hll.registers_from_hashes(np.concatenate([a, b]))
    assert np.array_equal(merged, both)


def test_hll_incremental_append_and_json_persist(tmp_path):
    """Sketches merge per append (reference: ColumnStatistics::merge) and
    persist through catalog.json, so re-opened tables do not rescan."""
    import lingodb_tpu as ldb

    db = _mkdb(tmp_path, "jsondb")
    s = ldb.connect_to_db(db)
    s.sql("create table t (a int not null, s varchar(8))")
    n, k = 3000, 257
    rows = ",".join(f"({i % k}, 's{i % 101}')" for i in range(n))
    s.sql(f"insert into t values {rows}")
    st = s.catalog.get_table("t").storage
    st.ensure_hll()
    # append AFTER sketches exist: must merge, not recompute
    s.sql("insert into t values (999999, 'brand-new')")
    stats = s.catalog.get_table("t").storage.column_stats()
    assert abs(stats[0]["distinct"] - (k + 1)) <= 0.4 * (k + 1)
    assert abs(stats[1]["distinct"] - 102) <= 45
    s.close()

    s2 = ldb.connect_to_db(db)
    regs = s2.catalog.get_table("t").storage.hll_regs
    assert regs is not None and len(regs) == 2
    assert np.array_equal(regs[0], st.hll_regs[0])


def test_string_hll_stable_across_dictionaries():
    """String sketches hash content, not per-batch dictionary codes, so
    appends with different dictionaries merge correctly."""
    from lingodb_tpu.sql.types import Type
    from lingodb_tpu.storage.column import Column
    from lingodb_tpu.storage.table import column_hashes
    from lingodb_tpu.utils import hll

    t = Type.string(False)
    c1 = Column.from_values(t, ["b", "a", "c"])
    c2 = Column.from_values(t, ["c", "d"])  # different dictionary
    whole = Column.from_values(t, ["b", "a", "c", "c", "d"])
    merged = hll.merge(
        hll.registers_from_hashes(column_hashes(t, c1)),
        hll.registers_from_hashes(column_hashes(t, c2)))
    assert np.array_equal(
        merged, hll.registers_from_hashes(column_hashes(t, whole)))


def test_refformat_c_code_wrapping():
    from lingodb_tpu.sql.types import Type
    from lingodb_tpu.storage.refformat import join_function_code, split_function_code

    code = join_function_code(
        "c", "addOne", ["x"], [Type.int_(False)], Type.int_(False),
        " return x+1; ")
    assert code == "int64_t addOne(int64_t x) {  return x+1; }"
    names, body = split_function_code("c", code)
    assert names == ["x"]
    assert "return x+1;" in body


def test_reference_catalog_handwritten_bytes(tmp_path):
    """Parse a db.lingodb built BYTE-BY-BYTE here from the reference
    serializer spec (Serialization.h wire format; Catalog.cpp:21-75;
    TableCatalogEntry.cpp:37-48; Column.cpp; Types.cpp:49-97;
    LingoDBTable.cpp:306-313) — independent of our own writer, so a
    self-consistent-but-wrong implementation cannot pass."""
    import io

    import pyarrow as pa
    import pyarrow.ipc as ipc

    import lingodb_tpu as ldb

    def u16(v):
        return struct.pack("<H", v)

    def u64(v):
        return struct.pack("<Q", v)

    def s(b):
        b = b.encode() if isinstance(b, str) else b
        return u64(len(b)) + b

    def prop(pid, body):
        return u16(pid) + body + u16(pid)

    OBJ, END, PRESENT, NOTP = u16(0xFFFE), u16(0xFFFF), u16(0xFFFC), u16(0xFFFD)

    def int_type(width):  # Type{ INT, IntTypeInfo{signed,width} }
        info = OBJ + prop(42, b"\x00") + prop(0, b"\x01") + prop(1, u64(width)) + END
        return OBJ + prop(0, b"\x03") + prop(1, PRESENT + info) + END

    def string_type():
        info = OBJ + prop(42, b"\x02") + prop(0, s("")) + prop(1, NOTP) + END
        return OBJ + prop(0, b"\x0b") + prop(1, PRESENT + info) + END

    def column(name, type_bytes, nullable):
        return prop(4, OBJ + prop(1, s(name)) + prop(2, type_bytes)
                    + prop(3, b"\x01" if nullable else b"\x00") + END)

    # the arrow data file + sample + schema the impl section points at
    tbl = pa.table({"id": pa.array([7, 8, 9], pa.int64()),
                    "nm": pa.array(["x", "y", None], pa.string())})
    d = str(tmp_path / "refdb")
    os.makedirs(d)
    with ipc.RecordBatchFileWriter(os.path.join(d, "tt.arrow"), tbl.schema) as w:
        w.write_table(tbl)
    buf = io.BytesIO()
    with ipc.RecordBatchStreamWriter(buf, tbl.schema) as w:
        w.write_table(tbl)
    sample_ipc = buf.getvalue()
    schema_ipc = tbl.schema.serialize().to_pybytes()

    hll_regs = b"".join(prop(i, bytes([1])) for i in range(64))
    stats_present = OBJ + prop(1, PRESENT + OBJ + hll_regs + END) + END
    stats_absent = OBJ + prop(1, NOTP) + END
    impl = PRESENT + OBJ + prop(1, s("tt.arrow")) \
        + prop(2, OBJ + prop(1, s(sample_ipc)) + END) \
        + prop(3, s(schema_ipc)) \
        + prop(4, u64(2) + s("id") + stats_present + s("nm") + stats_absent) \
        + prop(5, u64(3)) + END
    entry = PRESENT + OBJ + prop(1, b"\x01") \
        + prop(2, s("tt")) + prop(3, u64(2)) \
        + column("id", int_type(64), False) + column("nm", string_type(), True) \
        + prop(8, u64(1) + s("id")) + prop(9, u64(0)) + prop(10, impl) + END
    catalog = prop(0, OBJ + prop(0, u64(3))
                   + prop(1, u64(1) + s("tt") + entry) + END)
    with open(os.path.join(d, "db.lingodb"), "wb") as f:
        f.write(catalog)

    s2 = ldb.connect_to_db(d)
    assert s2.catalog.ref_format
    e = s2.catalog.get_table("tt")
    assert e.primary_key == ["id"]
    r = s2.sql("select id, nm from tt order by id").format_rows()
    assert r == [["7", "x"], ["8", "y"], ["9", "NULL"]]
