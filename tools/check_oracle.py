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

Two comparisons run per query:

1. exact — ``collect()`` vs ``fetchall()``, repr of every cell.
   Decimal stays Decimal on both sides, so this checks VALUES.
2. pandas — ``toPandas()`` vs duckdb ``.df()``, str() of every cell.
   This mimics the driver's hash path, where REPRESENTATION also
   matters: Spark DECIMAL becomes object(Decimal('-1.00')) while
   DuckDB DECIMAL becomes float64(-1.0) — equal values, different
   hash (the round-1 clean_products/snapshot_literals mismatches).
   Out-of-range timestamps (9999-12-31) crash here exactly like the
   driver's harness. Queries must pass BOTH.
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


def canon_pandas(pdf) -> list[tuple]:
    """Driver-style canonical form: lowercase + sort columns, str()
    every cell (so Decimal('-1.00') != -1.0 — the representation skew
    a value-hash sees), sort rows. Midnight timestamps are folded to
    their date ('2020-01-01 00:00:00' -> '2020-01-01'): Spark DATE
    comes back as datetime.date while DuckDB .df() widens DATE to
    datetime64, and round-1 driver results (date_dim, rollup_cascade
    green) show its hash treats those as equal."""
    pdf = pdf.rename(columns={c: c.lower() for c in pdf.columns})
    pdf = pdf[sorted(pdf.columns)]

    def cell(v) -> str:
        s = str(v)
        return s[:-9] if s.endswith(" 00:00:00") else s

    out = [tuple(cell(v) for v in row) for row in pdf.itertuples(index=False)]
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
        try:
            spdf = sdf.toPandas()
            spdf_err = None
        except Exception as e:  # noqa: BLE001  (driver-path crash == driver err)
            spdf, spdf_err = None, str(e).splitlines()[-1][:150]
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
            dpdf = con.sql(oracles[name]).df()
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
        if not status:
            # driver-path representation check (pandas on both sides)
            if spdf_err is not None:
                status.append(f"PANDAS-PATH spark toPandas err: {spdf_err}")
            else:
                ps = canon_pandas(spdf)
                pd_ = canon_pandas(dpdf)
                if ps != pd_:
                    n_bad = sum(1 for a, b in zip(ps, pd_) if a != b)
                    ex = next(((a, b) for a, b in zip(ps, pd_) if a != b), None)
                    status.append(
                        f"PANDAS-REPR {n_bad}/{len(ps)} differ; first: {ex}"
                    )
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
