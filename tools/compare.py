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


INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_class(t):
    """Coarse result-type class for the driver's hash canonicalization.

    The driver hashes typed values, so a DuckDB oracle whose output column is
    HUGEINT (what SUM(BIGINT) returns) canonicalizes differently from the
    Spark dump's BIGINT even though str() makes them look identical — the
    exact blind spot that kept q_html_boilerplate red for three rounds while
    this script passed it. HUGEINT gets its own class so it can never alias
    an int; DECIMAL and FLOAT/DOUBLE share a class (value canon already
    distinguishes them when it matters)."""
    t = str(t).upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in INT_TYPES:
        return "int"
    if t.startswith("DECIMAL") or t in ("FLOAT", "DOUBLE", "REAL"):
        return "numeric"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "text"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith(("LIST", "STRUCT", "MAP", "ARRAY")):
        return "nested"
    return t.lower()  # BOOLEAN, DATE, BLOB, ...


def type_check(name, s_cols, s_types, o_cols, o_types):
    """Red on result-type drift the value canon cannot see. Returns msgs."""
    msgs = []
    o_by = {c: type_class(t) for c, t in zip(o_cols, o_types)}
    s_by = {c: type_class(t) for c, t in zip(s_cols, s_types)}
    for c, tc in sorted(o_by.items()):
        if tc == "hugeint":
            msgs.append(f"oracle col {c} is HUGEINT — CAST(... AS BIGINT) "
                        "the final SUM (driver hash canonicalizes "
                        "HUGEINT != BIGINT)")
        elif c in s_by and s_by[c] != tc:
            msgs.append(f"col {c} type class spark={s_by[c]} oracle={tc}")
    return msgs


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
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
            s_cols = list(spark_rel.columns)
            s_types = [str(t) for t in spark_rel.types]
            s_rows = spark_rel.fetchall()
            o_rel = con.sql(sql)
            o_cols = list(o_rel.columns)
            o_types = [str(t) for t in o_rel.types]
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
        tmsgs = type_check(name, s_cols, s_types, o_cols, o_types)
        if tmsgs:
            ok = False
            msgs += tmsgs
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
