"""ClickBench string-heavy queries (Q21-Q24) at >=1M rows, device byte-plane
LIKE vs the host loop (A/B via ops.bytestr.DEVICE_DICT_MIN).

Generates a hits-shaped table with ClickBench-realistic URL cardinality
(~60% distinct URLs), runs each query warm + best-of-N, and appends records
to bench_results/clickbench_strings.jsonl. Run on the real chip for the
recorded numbers; runs anywhere for a functional check.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("CB_ROWS", "1000000"))
REPS = int(os.environ.get("CB_REPS", "3"))
OUT = os.path.join("bench_results", "clickbench_strings.jsonl")

QUERIES = {
    "q21": "SELECT COUNT(*) FROM hits WHERE URL LIKE '%google%'",
    "q22": ("SELECT SearchPhrase, MIN(URL), COUNT(*) AS c FROM hits "
            "WHERE URL LIKE '%google%' AND SearchPhrase <> '' "
            "GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10"),
    "q23": ("SELECT SearchPhrase, MIN(URL), COUNT(*) AS c FROM hits "
            "WHERE Title LIKE '%Google%' AND URL NOT LIKE '%.google.%' "
            "AND SearchPhrase <> '' "
            "GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10"),
    "q24": ("SELECT URL, EventTime FROM hits WHERE URL LIKE '%google%' "
            "ORDER BY EventTime LIMIT 10"),
}


def build_session():
    import numpy as np
    import pyarrow as pa

    import lingodb_tpu as ldb

    rng = np.random.default_rng(77)
    t0 = time.time()
    hosts = np.array(["google.com", "www.google.fr", "images.google.de",
                      "example.org", "news.site.ru", "shop.example.com",
                      "mail.provider.net", "video.portal.io"])
    host = hosts[rng.integers(0, len(hosts), N)]
    path_id = rng.integers(0, N, N)  # ~63% distinct full URLs
    urls = np.asarray([f"http://{h}/p/{i:07d}?ref={i % 97}"
                       for h, i in zip(host, path_id)], dtype=object)
    titles = np.asarray([("Google result %d" % i) if i % 5 == 0
                         else f"Page {i} - {h}"
                         for i, h in zip(path_id, host)], dtype=object)
    phrases = np.array(["", "", "", "buy shoes", "weather", "google maps",
                        "news today", "translate"])
    sp = phrases[rng.integers(0, len(phrases), N)]
    s = ldb.create_in_memory()
    s.add_table("hits", pa.table({
        "url": pa.array(list(urls)),
        "title": pa.array(list(titles)),
        "searchphrase": pa.array(list(sp)),
        "userid": pa.array(rng.integers(0, N // 3, N)),
        "eventtime": pa.array(rng.integers(1_500_000_000, 1_600_000_000, N)),
    }))
    print(f"# built hits n={N} distinct_urls={len(set(urls))} "
          f"in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    return s


def run(s, mode: str):
    from lingodb_tpu.ops import bytestr

    rec = {"mode": mode, "rows": N, "queries": {}}
    for name, sql in QUERIES.items():
        bytestr._PLANE_CACHE.clear()
        t0 = time.time()
        s.sql(sql)
        warm = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            s.sql(sql)
            times.append((time.time() - t0) * 1e3)
        rec["queries"][name] = {"warm_s": round(warm, 2),
                                "best_ms": round(min(times), 1),
                                "runs_ms": [round(t, 1) for t in times]}
        print(f"# {mode} {name}: warm={warm:.1f}s best={min(times):.0f}ms",
              file=sys.stderr, flush=True)
    return rec


def main():
    from lingodb_tpu.ops import bytestr

    s = build_session()
    out = []
    for mode in ("host_loop", "device_bytes"):
        old = bytestr.DEVICE_DICT_MIN
        bytestr.DEVICE_DICT_MIN = (1 << 62) if mode == "host_loop" else old
        try:
            out.append(run(s, mode))
        finally:
            bytestr.DEVICE_DICT_MIN = old
    with open(OUT, "a") as f:
        for r in out:
            f.write(json.dumps(r) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
