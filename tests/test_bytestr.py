"""Device byte-tensor LIKE (ops/bytestr.py) vs the host regex oracle:
every pattern class over adversarial dictionaries, plus the end-to-end
high-cardinality routing in a query (reference: StringRuntime.cpp LIKE)."""

import numpy as np
import pytest

PATTERNS = [
    "abc", "%", "", "a%", "%a", "%bc%", "a%c", "a%b%c", "ab_", "_b_",
    "%b_d%", "a__%", "%%x%%", "ab\\%cd", "ab\\_cd", "%\\%%",
    "abc%def%", "%abc%def", "a%a%a", "aa%", "%aa", "_",
]

WORDS = [
    "", "a", "b", "ab", "abc", "abcd", "aabc", "abab", "aaa", "aa",
    "ab%cd", "ab_cd", "abcdef", "abcxdef", "xabc", "abcx", "a c",
    "abc def", "aXbXc", "zzz", "ab", "ba", "abca", "aabbcc", "a_c",
    "abcdefghij" * 13,  # > 128 bytes: exercises padding width
]


def _oracle(dictionary, pat, ci):
    from lingodb_tpu.ops.strings import like_to_regex

    rx = like_to_regex(pat.lower() if ci else pat)
    return np.array([rx.fullmatch(s.lower() if ci else s) is not None
                     for s in dictionary], dtype=bool)


@pytest.mark.parametrize("ci", [False, True])
@pytest.mark.parametrize("pat", PATTERNS)
def test_device_like_matches_oracle(pat, ci):
    from lingodb_tpu.ops.bytestr import device_like_mask

    dictionary = np.asarray(WORDS + [w.upper() for w in WORDS], dtype=object)
    got = device_like_mask(dictionary, pat, ci)
    assert got is not None
    got = np.asarray(got)
    want = _oracle(dictionary, pat, ci)
    bad = np.nonzero(got != want)[0]
    assert not bad.size, (
        f"pattern {pat!r} ci={ci}: " +
        "; ".join(f"{dictionary[i]!r}: got {bool(got[i])} want {bool(want[i])}"
                  for i in bad[:5]))


def test_device_like_random_fuzz():
    from lingodb_tpu.ops.bytestr import device_like_mask

    rng = np.random.default_rng(3)
    alphabet = list("ab%_")
    dictionary = np.asarray(
        ["".join(rng.choice(list("ab"), rng.integers(0, 9))) for _ in range(400)],
        dtype=object)
    for _ in range(40):
        pat = "".join(rng.choice(alphabet, rng.integers(1, 7)))
        got = device_like_mask(dictionary, pat, False)
        assert got is not None
        want = _oracle(dictionary, pat, False)
        assert np.array_equal(np.asarray(got), want), pat


def test_non_ascii_routes_to_host():
    from lingodb_tpu.ops.bytestr import device_like_mask

    d = np.asarray(["héllo", "hello", "ünïcode"], dtype=object)
    # plain segment patterns work byte-wise even over utf-8
    got = device_like_mask(d, "h%o", False)
    assert got is not None and list(np.asarray(got)) == [True, True, False]
    # `_` counts characters, so non-ascii data must decline
    assert device_like_mask(d, "h_llo", False) is None
    assert device_like_mask(d, "h%o", True) is None  # ci folding is ascii-only


def test_high_cardinality_query_uses_device_path(session):
    """End to end: a >=DEVICE_DICT_MIN dictionary routes LIKE through the
    byte planes and matches the small-table answer."""
    import pyarrow as pa

    from lingodb_tpu.ops import bytestr
    from lingodb_tpu.runtime import device as dv

    n = bytestr.DEVICE_DICT_MIN + 1000
    urls = np.asarray([f"http://site{i}.example/path{i % 7}" for i in range(n)],
                      dtype=object)
    urls[::13] = [f"https://google.com/q{i}" for i in range(0, n, 13)]
    old_small = dv.SMALL_ROWS
    dv.SMALL_ROWS = 64  # force device execution for this table size
    try:
        session.add_table("urls", pa.table({"u": pa.array(list(urls))}))
        bytestr._PLANE_CACHE.clear()
        r = session.sql(
            "select count(*) from urls where u like '%google%'")
        assert bytestr._PLANE_CACHE, "device byte planes were not built"
        assert r.format_rows() == [[str(sum('google' in u for u in urls))]]
    finally:
        dv.SMALL_ROWS = old_small
