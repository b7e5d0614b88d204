"""Incremental embedding index: parity vs from-scratch + idempotency."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_trees_spark.io import marked
from dedupe_trees_spark.plans.embedding_index import (
    init_embedding_index,
    update_embedding_index,
)

DIM = 16
CFG = dict(tau=0.9, dim=DIM, n_bits=4, n_tables=32, seed=7)


def _vectors(ids, rng_seed=5):
    """Planted clusters spanning batch boundaries: ids sharing
    (id % 10) < 3 belong to cluster (id % 10) when id < 200; noise
    otherwise. Deterministic per id."""
    rows = []
    for i in ids:
        base_rng = np.random.default_rng(1000 + (i % 10))
        noise_rng = np.random.default_rng(rng_seed + i)
        if i < 200 and i % 10 < 3:
            v = base_rng.standard_normal(DIM) + 0.02 * noise_rng.standard_normal(DIM)
        else:
            v = noise_rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    return rows


def _labels(spark, index_dir):
    from dedupe_trees_spark.io import read_stage

    return {
        r["vec_id"]: r["component_id"]
        for r in read_stage(spark, index_dir, "vectors").collect()
    }


def test_update_matches_from_scratch_and_is_idempotent(spark, tmp_path):
    b1 = _vectors(range(0, 120))
    b2 = _vectors(range(120, 260))
    df1 = spark.createDataFrame(b1, ["vec_id", "embedding"])
    df2 = spark.createDataFrame(b2, ["vec_id", "embedding"])
    both = spark.createDataFrame(b1 + b2, ["vec_id", "embedding"])

    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")
    init_embedding_index(spark, df1, inc_dir, **CFG)
    rep = update_embedding_index(spark, df2, inc_dir, "02", **CFG)
    assert rep["indexed"] == 260
    init_embedding_index(spark, both, full_dir, **CFG)

    assert _labels(spark, inc_dir) == _labels(spark, full_dir)
    # the planted cross-batch clusters actually merged (not all trivial)
    lab = _labels(spark, inc_dir)
    for c in range(3):
        members = [i for i in range(260) if i < 200 and i % 10 == c]
        assert len({lab[m] for m in members}) == 1
        assert any(m >= 120 for m in members)  # spans the batch boundary

    # idempotency: same batch id no-ops; re-ingest of same rows no-ops
    rep2 = update_embedding_index(spark, df2, inc_dir, "02", **CFG)
    assert rep2.get("skipped")
    rep3 = update_embedding_index(spark, df2, inc_dir, "02b", **CFG)
    assert rep3["indexed"] == 260
    assert _labels(spark, inc_dir) == _labels(spark, full_dir)
    assert marked(inc_dir, "emb_buckets", "_BATCH_02")
    assert marked(inc_dir, "emb_buckets", "_BATCH_02b")


def test_three_batch_chain_parity(spark, tmp_path):
    batches = [_vectors(range(a, a + 90)) for a in (0, 90, 180)]
    inc_dir = str(tmp_path / "inc3")
    init_embedding_index(
        spark, spark.createDataFrame(batches[0], ["vec_id", "embedding"]),
        inc_dir, **CFG,
    )
    for i, b in enumerate(batches[1:], start=2):
        update_embedding_index(
            spark, spark.createDataFrame(b, ["vec_id", "embedding"]),
            inc_dir, f"{i:02d}", **CFG,
        )
    full_dir = str(tmp_path / "full3")
    init_embedding_index(
        spark,
        spark.createDataFrame(sum(batches, []), ["vec_id", "embedding"]),
        full_dir, **CFG,
    )
    assert _labels(spark, inc_dir) == _labels(spark, full_dir)


def test_cli_init_and_update(spark, tmp_path, capsys):
    import json

    import run_embedding_index as cli

    b1 = _vectors(range(0, 80))
    b2 = _vectors(range(80, 140))
    inp1, inp2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame(b1, ["vec_id", "embedding"]).write.parquet(inp1)
    spark.createDataFrame(b2, ["vec_id", "embedding"]).write.parquet(inp2)
    idx = str(tmp_path / "idx")
    args = ["--tau", "0.9", "--dim", str(DIM), "--n-bits", "4",
            "--n-tables", "32", "--seed", "7"]
    assert cli.main(["--init", "--input", inp1, "--index", idx] + args) == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["indexed"] == 80
    assert cli.main(["--input", inp2, "--index", idx, "--batch", "02"] + args) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["indexed"] == 140
    assert cli.main(["--index", idx, "--input", inp2]) == 2  # missing --batch


def test_gen_vectors_partition_independent(spark):
    """The BENCH evidence relies on the harness generator being a pure
    function of vec_id: any partitioning must produce identical rows."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    spark.sparkContext.addPyFile("/root/repo/tools/embedding_scale.py")
    from embedding_scale import gen_vectors

    a = {
        r["vec_id"]: tuple(r["embedding"])
        for r in gen_vectors(spark, 500, parts=3).collect()
    }
    b = {
        r["vec_id"]: tuple(r["embedding"])
        for r in gen_vectors(spark, 500, parts=11).collect()
    }
    assert a == b and len(a) == 500
