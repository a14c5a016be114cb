#!/usr/bin/env python3
"""Time the DuckDB oracles over the sf parquet tables — the baseline half
of the matched Spark-vs-DuckDB bench pair (BASELINE.json: the operative
baseline is the DuckDB total on the same oracles at the same SF).

Usage:
    python3 tools/oraclebench.py <verify_dump_dir> <sf_dir> [bench.json] [out.json]

With a 4th argument, the per-query map is ALSO written there as JSON
({"metric": "duckdb_total", "value": ..., "queries": {...}}) — the
round-close archive (ORACLE_r<N>_queries.json) a judge needs to compute
the weak list from artifacts alone: two oracle runs on this host have
differed ±16% in total, so only a same-session per-query map is
comparable to a same-session BENCH_r<N>_queries.json.

Reads <verify_dump_dir>/oracle_sql.json; if a bench.json (the graft.Bench
artifact) is given, only the queries in its per-query map are timed — the
exact set the Spark total covers. Each query runs TWICE and the best time
counts (DuckDB's equivalent of the warm pass; mirrors the judge's
best-of-two protocol). Prints per-query seconds and the total.
"""
import json, sys, time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    dump, sf = Path(sys.argv[1]), Path(sys.argv[2])
    oracles = json.loads((dump / "oracle_sql.json").read_text())
    names = list(oracles)
    if len(sys.argv) > 3:
        bench = json.loads(Path(sys.argv[3]).read_text())
        names = [n for n in bench.get("queries", {}) if n in oracles]
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        p = sf / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    total = 0.0
    per = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        per[name] = best
        total += best
        print(f"{name:40s} {best:8.3f}")
    summary = {"metric": "duckdb_total", "value": round(total, 3),
               "n_queries": len(per), "sf": str(sf)}
    print(json.dumps(summary))
    if len(sys.argv) > 4:
        summary["queries"] = {k: round(v, 3) for k, v in per.items()}
        Path(sys.argv[4]).write_text(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
