"""Full-registry DuckDB side-by-side sweep at driver scale.

The driver compares Spark vs DuckDB at sf0.01 while local tests run at
sf0.001 — a discrepancy that only reproduces at sf0.01 would otherwise
surface in CORRECTNESS_r{N}.json one round too late. This script is the
per-round insurance run (the full-registry driver-scale sweep every
release round runs before freezing): every oracle-bearing registry query executes on
Spark AND on DuckDB over the same parquet and is compared with the
exact normalization `tests/test_oracle_parity.py` uses (column-name
sort, 9dp float guard, NaN sentinel, order-insensitive rows).

Usage:  python scripts/oracle_sweep.py [sf_dir] [name_substring...]
(default sf0.01, all oracle-bearing queries; name substrings restrict
the sweep to matching registry entries for a targeted drive). Prints one
line per query (OK/FAIL + timing) and a final tally; exits nonzero on
any mismatch.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _rows(seq, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(row[i]) for i in order) for row in seq)


def main() -> int:
    import duckdb

    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="oracle-sweep",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = []
    names = sorted(n for n, (_, sql) in REGISTRY.items() if sql is not None)
    if len(sys.argv) > 2:
        subs = sys.argv[2:]
        names = [n for n in names if any(s in n for s in subs)]
    for i, name in enumerate(names, 1):
        fn, sql = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and _rows(srows, scols) == _rows(drows, dcols)
            )
            detail = f"rows={len(srows)}/{len(drows)}"
        except Exception as exc:  # noqa: BLE001 — a sweep reports, it doesn't die
            ok, detail = False, f"ERR {type(exc).__name__}: {exc}"[:140]
        dt = time.time() - t0
        print(
            f"[{i:3d}/{len(names)}] {'OK  ' if ok else 'FAIL'} "
            f"{name:42s} {dt:6.1f}s {detail}",
            flush=True,
        )
        if not ok:
            failed.append(name)
    print(
        f"\nsweep: {len(names) - len(failed)}/{len(names)} clean at {sf_dir}"
        + (f"; FAILED: {failed}" if failed else ""),
        flush=True,
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
