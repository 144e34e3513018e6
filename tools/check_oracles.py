"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
column names/dtypes, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [--json OUT] [sf_dir] [query ...]

``--json OUT`` additionally writes a machine-readable per-query record —
the round ritual uses it to record the parked-cohort evidence at
bench_runs/round{N}/check_oracles_parked.json (VERDICT r4 wrong #1).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df.sort_index(axis=1)
    # normalize dtypes: everything to string with stable float formatting
    cols = []
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            cols.append(s.map(lambda x: "" if pd.isna(x) else f"{x:.6f}"))
        else:
            cols.append(s.map(lambda x: "" if x is None or (isinstance(x, float) and pd.isna(x)) else str(x)))
    rows = sorted("\x1f".join(t) for t in zip(*[c.tolist() for c in cols])) if cols else []
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    rest = argv[1:] if argv and os.path.isdir(argv[0]) else argv
    only = set(rest) if rest else None

    import __spark_entry__ as e
    from cinescrapers_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            results[name] = {"status": "fail", "err": f"spark: {ex}"}
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{el:.1f}s]")
            results[name] = {"status": "rows_only", "rows": len(sdf), "sec": round(el, 2)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            results[name] = {"status": "fail", "err": f"duckdb: {ex}"}
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        else:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{el:.1f}s]")
            failures.append(name)
            results[name] = {"status": "fail", "problems": problems, "sec": round(el, 2)}
            # show a diff sample
            try:
                m = sdf.sort_index(axis=1).sort_values(list(sorted(sdf.columns))).head(3)
                o = odf.sort_index(axis=1).sort_values(list(sorted(odf.columns))).head(3)
                print("  spark:", m.to_dict("records"))
                print("  duck :", o.to_dict("records"))
            except Exception:
                pass
        else:
            print(f"OK    {name}: {len(sdf)} rows [{el:.1f}s]")
            results[name] = {
                "status": "ok", "rows": len(sdf),
                "rows_match": True, "schema_match": True, "hash_match": True,
                "sec": round(el, 2),
            }
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf": sf, "n_checked": len(results),
                 "n_failures": len(failures), "results": results},
                f, indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
