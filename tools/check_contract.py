"""Local replica of the driver's correctness gate.

Runs ``__spark_entry__.entry`` as a smoke check, then every
``queries()[name]`` against ``oracle_sql()[name]`` via DuckDB at the
given sf dir: row-count + schema-arity + order-insensitive value
comparison (rows and columns sorted by name, values canonicalized to
strings). Exits nonzero on any mismatch.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from dedupe_trees_spark.session import get_spark

    spark = get_spark("contract_check")

    t0 = time.time()
    res = entrymod.entry(spark)
    n = res.count()
    print(f"entry(): {n} rows, schema={[f.name for f in res.schema]}, {time.time()-t0:.1f}s")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows={len(sdf)} (no oracle — rows-only) [{t_spark:.1f}s]")
            continue
        odf = con.execute(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_vals = ok_rows and ok_cols and canonicalize(sdf) == canonicalize(odf)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"  {name}: {status} rows spark={len(sdf)} duck={len(odf)} "
            f"cols={'OK' if ok_cols else f'{sorted(sdf.columns)} vs {sorted(odf.columns)}'} "
            f"vals={'OK' if ok_vals else 'MISMATCH'} [{t_spark:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                a, b = canonicalize(sdf), canonicalize(odf)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"    spark={x}\n    duck ={y}")
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
