#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf dir, read the Spark parquet dumps, sort columns by
name + rows by all columns, and compare values exactly.

Usage: python3 tools/local_verify.py <sfdir> <verify_out_dir>
(Dev tool only — the shipped library is pure Scala/Spark.)
"""
import json, math, sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"schema {list(got.columns)} != {list(exp.columns)}"))
            continue
        if len(exp) != len(got):
            fails.append((name, f"rows {len(got)} != {len(exp)}"))
            continue
        # The DRIVER harness sorts all result columns with pandas and
        # crashes on array cells (unhashable numpy.ndarray) — so a
        # non-scalar output column is a FAILURE here too, not something
        # to paper over. Queries must explode/stringify vectors at the
        # boundary (r13 lesson: q_embed_rp/q_embed_center shipped red
        # because an earlier version of this script canonicalized).
        nonscalar = sorted({c for df in (exp, got) for c in df.columns
                            if df[c].map(lambda v: hasattr(v, "__len__")
                                         and not isinstance(v, (str, bytes))).any()})
        if nonscalar:
            fails.append((name, f"non-scalar output columns {nonscalar} "
                          "(driver harness would crash; explode or stringify)"))
            continue
        exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (e, g) in enumerate(zip(ev, gv)):
                if e is None and g is None:
                    continue
                if isinstance(e, float) and isinstance(g, float):
                    if math.isnan(e) and math.isnan(g):
                        continue
                    if e != g:
                        bad = f"col {c} row {i}: {g!r} != {e!r}"
                        break
                elif str(e) != str(g):
                    bad = f"col {c} row {i}: {g!r} != {e!r}"
                    break
            if bad:
                break
        if bad:
            fails.append((name, bad))
        else:
            print(f"PASS {name} ({len(got)} rows)")
    except Exception as ex:
        fails.append((name, f"{type(ex).__name__}: {str(ex)[:200]}"))

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
