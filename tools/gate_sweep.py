"""Pathology sweep: time every paired gate query at sf0.01.

Runs each __spark_entry__.queries() entry once (count() to force
execution, mirroring the driver's collect) after a shared warm-up
index build, printing per-gate wall time sorted descending so
outliers stand out. Optionally cross-checks row counts against the
DuckDB oracle with --oracle.

Usage: python tools/gate_sweep.py [--sf /root/testdata/sf0.01] [--oracle]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--oracle", action="store_true",
                    help="also run the DuckDB oracle and compare row counts")
    ap.add_argument("--only", default=None, help="substring filter on gate names")
    args = ap.parse_args()

    from blacklab_spark.session import get_spark
    from __spark_entry__ import queries, oracle_sql

    spark = get_spark()
    qs = queries()
    oracles = oracle_sql() if args.oracle else {}

    con = None
    if args.oracle:
        import duckdb
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            p = os.path.join(args.sf, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    rows = []
    for name, fn in qs.items():
        if args.only and args.only not in name:
            continue
        t0 = time.time()
        err = None
        n = None
        try:
            n = fn(spark, args.sf).count()
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            err = f"{type(e).__name__}: {e}"
        dt = time.time() - t0
        on = None
        if con is not None and err is None and name in oracles:
            try:
                on = con.execute(
                    f"SELECT COUNT(*) FROM ({oracles[name]})").fetchone()[0]
            except Exception as e:  # noqa: BLE001
                err = f"oracle {type(e).__name__}: {e}"
        rows.append({"gate": name, "sec": round(dt, 3), "rows": n,
                     "oracle_rows": on, "err": err})
        status = "ERR " if err else ("MISM" if on is not None and on != n else "ok  ")
        print(f"{status} {dt:7.2f}s {name:45s} rows={n} oracle={on}"
              + (f"  {err}" if err else ""), flush=True)

    rows.sort(key=lambda r: -r["sec"])
    print("\n== slowest 15 ==")
    for r in rows[:15]:
        print(f"{r['sec']:7.2f}s {r['gate']}")
    bad = [r for r in rows if r["err"] or (
        r["oracle_rows"] is not None and r["oracle_rows"] != r["rows"])]
    print(f"\n== {len(bad)} problem gates ==")
    for r in bad:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
