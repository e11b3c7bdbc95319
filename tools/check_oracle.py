"""Local replica of the driver's correctness gate.

Runs every registered Spark query and its DuckDB oracle at a given sf_dir and
compares row-count, schema (column names, sorted), and order-insensitive
values. Exits nonzero on any mismatch. Use while iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from sarpro_spark.frames import TABLES
from sarpro_spark.queries import REGISTRY, spark_queries
from sarpro_spark.session import build_session


def normalize(rows, colnames):
    """Sort columns by name, stringify values the way a hash would see them."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == 0.0:
                return "0"  # -0.0 == 0.0
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm_val(x) for x in v) + "]"
        return str(v)

    out = []
    for r in rows:
        out.append(tuple(norm_val(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--show-diff", type=int, default=5)
    args = ap.parse_args()

    qs = spark_queries()
    names = args.names or sorted(qs)
    spark = build_session("check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = []
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(REGISTRY)}")
        return 2

    # r9: the full sweep crept past 10 minutes run serially. The two legs
    # of each query are independent, so the DuckDB oracle + compare of
    # query N runs on ONE background worker while the main thread collects
    # query N+1 from Spark (collect blocks on the JVM socket with the GIL
    # released, so the python-side compare genuinely overlaps). A single
    # FIFO worker keeps the duckdb connection single-threaded and the
    # output in submission order.
    from concurrent.futures import ThreadPoolExecutor

    def check_one(name: str, spec, srows, scols, t_spark: float) -> None:
        oracle_sql = spec.resolve_sql()
        if oracle_sql is None:
            print(f"  {name}: rows-only ({len(srows)} rows, {t_spark:.1f}s spark) — no oracle")
            if len(srows) == 0:
                failures.append((name, "zero rows (rows-only check)"))
            return
        t0 = time.time()
        try:
            res = con.execute(oracle_sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # The driver hashes TYPED values: DuckDB HUGEINT (int128, what SUM
            # over any integer type returns) hash-mismatches Spark's BIGINT
            # even when the values are equal. Flag it here so the local gate
            # fails exactly where the driver's would.
            dt = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
            huge = [r[0] for r in dt if "HUGEINT" in str(r[1]).upper()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle SQL error: {e}"))
            print(f"✗ {name}: oracle SQL error: {e}")
            return
        t_duck = time.time() - t0

        problems = []
        if huge:
            problems.append(
                f"oracle emits HUGEINT cols {huge} (driver hash-fails vs BIGINT; CAST them)"
            )
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sn = normalize([tuple(r) for r in srows], scols)
            on = normalize(orows, ocols)
            if sn != on:
                ndiff = sum(1 for a, b in zip(sn, on) if a != b) + abs(len(sn) - len(on))
                problems.append(f"values: {ndiff} differing rows")
                shown = 0
                for a, b in zip(sn, on):
                    if a != b and shown < args.show_diff:
                        print(f"    spark : {a}\n    oracle: {b}")
                        shown += 1
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"✗ {name}: {'; '.join(problems)}")
        else:
            print(f"✓ {name}: {len(srows)} rows match ({t_spark:.1f}s spark, {t_duck:.1f}s duckdb)")

    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = []
        for name in names:
            spec = REGISTRY[name]
            t0 = time.time()
            sdf = spec.fn(spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
            t_spark = time.time() - t0
            pending.append(pool.submit(check_one, name, spec, srows, scols, t_spark))
        for f in pending:
            f.result()  # surface worker exceptions; FIFO order == names order

    print()
    if failures:
        print(f"FAILED {len(failures)}/{len(names)}:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print(f"ALL {len(names)} queries match the oracle at {args.sf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
