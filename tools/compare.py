#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its DuckDB oracle over the same sf parquet tables and
compare rows / schema-width / values (columns sorted by name, values rounded
like the driver's hash input). Usage:

    python3 tools/compare.py /tmp/verify_r5 /root/testdata/sf0.01 [name ...]
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "%.9g" % v
            elif isinstance(v, bytes):
                v = v.hex()
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


def main():
    # accept (outDir, sfDir) or (sfDir, outDir): the fixtures dir is the one
    # holding lineitem.parquet
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    if (a / "lineitem.parquet").exists():
        out_dir, sf_dir = b, str(a)
    else:
        out_dir, sf_dir = a, str(b)
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = out_dir / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark dump")
            n_fail += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(s_rows) != len(o_rows):
            ok, _ = False, msgs.append(f"rows {len(s_rows)} vs {len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            ok, _ = False, msgs.append(f"cols {sorted(s_cols)} vs {sorted(o_cols)}")
        if ok and canon(s_rows, s_cols) != canon(o_rows, o_cols):
            ok = False
            sc, oc = canon(s_rows, s_cols), canon(o_rows, o_cols)
            diff = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b][:3]
            for i in diff:
                msgs.append(f"row{i}: spark={sc[i][:160]} oracle={oc[i][:160]}")
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
    print(f"{n_pass} pass, {n_fail} fail")
    # nonzero exit on any failure so CI / the verify workflow can gate on it
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
