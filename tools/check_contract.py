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
        # STRICT: no float->int coercion. The driver's hash compare
        # distinguishes DuckDB HUGEINT-via-.df() float64 `7.0` from
        # Spark bigint `7` (round-4 verdict: domain_doc_stats et al.
        # were driver-red while this checker printed OK because it
        # canonicalized 7.0 -> "7"). The local replica must never be
        # more permissive than the driver; dtype drift fails here first.
        return repr(v)
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


# ---------------------------------------------------------------------------
# Containment oracles for the rows-only queries (no SQL-equality oracle
# exists — Hamming/SRP/winnowing aren't SQL-expressible, driver records
# "no_oracle"), mirrored from tests/test_diff_harness.py so the per-round
# contract artifact trail is self-contained: the driver's rows-only rows
# get an inline CONTAIN verdict here instead of only a pytest elsewhere.


def _contain_simhash(sdf: pd.DataFrame, con) -> tuple[bool, str]:
    """Every simhash pair (Hamming ≤ max AND J ≥ 0.8) must appear in the
    brute-force J ≥ 0.8 set with the identical Jaccard value."""
    import dedupe_trees_spark.queries as Q

    oracle = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            "WITH " + Q._JACCARD_SQL_CTES + " SELECT doc_a, doc_b, jaccard FROM jpairs"
        ).fetchall()
    }
    if not len(sdf):
        return False, "no engine rows — containment vacuous"
    for r in sdf.itertuples(index=False):
        key = (r.doc_a, r.doc_b)
        if key not in oracle:
            return False, f"pair {key} not in brute-force J>=0.8 set"
        if abs(r.jaccard - oracle[key]) >= 1e-9:
            return False, f"pair {key} jaccard {r.jaccard} != {oracle[key]}"
    return True, f"{len(sdf)} pairs ⊆ brute-force set, jaccards equal"


def _contain_winnow(sdf: pd.DataFrame, con) -> tuple[bool, str]:
    """Every winnowed pair of ≥48-char docs must share an exact 48-char
    substring (stride-1 48-gram join oracle); shorter docs are
    fingerprinted whole, invisible to a 48-gram join, hence excluded."""
    oracle = {
        tuple(r)
        for r in con.execute(
            """
            WITH grams AS (
              SELECT DISTINCT doc_id, substr(text, i, 48) AS g
              FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 47)) AS i
                    FROM documents WHERE length(text) >= 48)
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
            """
        ).fetchall()
    }
    long_ids = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE length(text) >= 48"
        ).fetchall()
    }
    if not len(sdf):
        return False, "no engine rows — containment vacuous"
    pairs = {(r.doc_a, r.doc_b) for r in sdf.itertuples(index=False)}
    long_pairs = {p for p in pairs if p[0] in long_ids and p[1] in long_ids}
    stray = long_pairs - oracle
    if stray:
        return False, f"winnow-only pairs not sharing a 48-gram: {sorted(stray)[:5]}"
    return True, f"{len(long_pairs)} long-doc pairs ⊆ exact 48-gram set"


def _contain_lsh_topk(sdf: pd.DataFrame, con) -> tuple[bool, str]:
    """embedding_lsh_topk is approximate in WHICH neighbors it returns;
    every returned cos_sim must equal the exact cosine for that pair."""
    oracle = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 8)
            SELECT q.query_id, e.vec_id,
                   round(CASE WHEN list_sum(list_transform(q.qemb, x -> x * x)) > 0
                               AND list_sum(list_transform(e.emb, x -> x * x)) > 0
                              THEN list_dot_product(q.qemb, e.emb)
                                   / (sqrt(list_sum(list_transform(q.qemb, x -> x * x)))
                                      * sqrt(list_sum(list_transform(e.emb, x -> x * x))))
                              ELSE 0.0 END, 6) AS cos_sim
            FROM q, e WHERE e.vec_id != q.query_id
            """
        ).fetchall()
    }
    if not len(sdf):
        return False, "no engine rows — containment vacuous"
    for r in sdf.itertuples(index=False):
        key = (r.query_id, r.vec_id)
        if key not in oracle:
            return False, f"unknown neighbor {key}"
        if abs(r.cos_sim - oracle[key]) > 2e-6:
            return False, f"{key} cos_sim {r.cos_sim} != exact {oracle[key]}"
    return True, f"{len(sdf)} rows, every cos_sim equals the exact cosine"


CONTAINMENT = {
    "simhash_dup_pairs": _contain_simhash,
    "winnow_substring_pairs": _contain_winnow,
    "embedding_lsh_topk": _contain_lsh_topk,
    # same output shape + same invariant (returned cos_sim must equal
    # the exact cosine) — IVF differs from SRP-LSH only in WHICH
    # neighbors it can miss, never in the values it emits
    "embedding_ivf_topk": _contain_lsh_topk,
}


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
            check = CONTAINMENT.get(name)
            if check is None:
                print(f"  {name}: rows={len(sdf)} (no oracle — rows-only) [{t_spark:.1f}s]")
                continue
            ok, msg = check(sdf, con)
            print(
                f"  {name}: {'CONTAIN-OK' if ok else 'CONTAIN-FAIL'} "
                f"rows={len(sdf)} — {msg} [{t_spark:.1f}s]"
            )
            if not ok:
                failures.append(name)
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
