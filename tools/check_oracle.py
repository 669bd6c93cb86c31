"""Local mirror of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle over the
same parquet tables, then compares row count, column names/types, and
an order-insensitive value representation. Exact string compare on
every cell (floats via repr) — stricter than the driver is likely to
be, so passing here is a good predictor.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --vanilla [sf_dir] [query ...]

``--vanilla`` runs the Spark side on a DEFAULT SparkSession (no
engine confs) — the closest simulation of the correctness driver's
environment; query callables must self-apply whatever runtime confs
they need.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Order-insensitive canonical form: sort columns by name, then
    rows by string repr."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return repr(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from datawarehouseproject_spark.plans.registry import queries, oracle_sql

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
    else:
        from datawarehouseproject_spark.session import get_spark

        spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = queries()
    oracles = oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(srows):8d} spark={t_spark:6.1f}s "
                  "(no oracle: rows-only)")
            if len(srows) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        t0 = time.time()
        try:
            ddf = con.sql(oracles[name])
            dcols = ddf.columns
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s} ORACLE ERROR: {str(e).splitlines()[0][:150]}")
            failures.append((name, f"oracle error: {e}"))
            continue
        t_duck = time.time() - t0

        status = []
        if len(srows) != len(drows):
            status.append(f"ROWCOUNT {len(srows)} vs {len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            status.append(f"COLS {sorted(scols)} vs {sorted(dcols)}")
        if not status:
            cs = canon(srows, [c.lower() for c in scols])
            cd = canon(drows, [c.lower() for c in dcols])
            if cs != cd:
                n_bad = sum(1 for a, b in zip(cs, cd) if a != b)
                ex = next(((a, b) for a, b in zip(cs, cd) if a != b), None)
                status.append(f"VALUES {n_bad}/{len(cs)} differ; first: {ex}")
        ok = "OK " if not status else "FAIL"
        print(f"  {name:28s} {ok} rows={len(srows):8d} spark={t_spark:6.1f}s "
              f"duck={t_duck:6.1f}s {'; '.join(status)[:300]}")
        if status:
            failures.append((name, "; ".join(status)))

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for name, why in failures:
            print(f"  {name}: {why[:500]}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
