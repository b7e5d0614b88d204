"""Scale + recall evidence for the embedding dedup family
(neardup_pairs → connected components == the semantic_dedup path).

Synthesizes N 64-dim vectors DETERMINISTICALLY and partition-
independently (every coordinate is a splitmix64-hashed Box-Muller
normal keyed on (vec_id, coord) — no RNG state, so any partitioning
of spark.range produces the same table), with planted structure:

* the first ``frac·N`` ids belong to ``n_clusters`` semantic clusters
  (cid = vec_id % n_clusters): member = unit(base_cid + eps·noise_id),
  pairwise cosine ≈ 0.99;
* the rest are pure noise (pairwise cosine ~ N(0, 1/8), never ≥ tau).

Then times the two stages of semantic dedup separately:

1. pairs — ``neardup_pairs`` (SRP-blocked, exact-cosine verified);
2. cc    — ``assign_components`` over the emitted pairs.

and checks CLUSTER RECOVERY: every planted cluster must land in one
component (the SemDeDup keep-one-per-cluster semantics), measured as
(a) sampled same-cluster truth-pair component-recall and (b) the
number of distinct components covering each cluster's members.

Usage: python tools/embedding_scale.py [n] [cores] [OUT.json] [n_bits] [all|star]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_CLUSTERS = 1000
CLUSTERED_FRAC = 0.1
EPS = 0.1
TAU = 0.9
N_BITS = 18  # overridable via argv[4]: size buckets for the corpus
N_TABLES = 8


def _splitmix_normals(keys, dim):
    """(len(keys), dim) standard normals from pure uint64 hashing."""
    import numpy as np

    k = keys.astype(np.uint64)[:, None] * np.uint64(dim * 2)
    idx = np.arange(dim * 2, dtype=np.uint64)[None, :]
    x = k + idx
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(29))) * np.uint64(0xC4CEB9FE1A85EC53)
        x = x ^ (x >> np.uint64(32))
    u = (x.astype(np.float64) + 1.0) / 2.0**64  # (0, 1]
    u1, u2 = u[:, :dim], u[:, dim:]
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def gen_vectors(spark, n: int, parts: int):
    """Deterministic planted-cluster embedding table (vec_id, embedding)."""
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401

    n_clustered = int(n * CLUSTERED_FRAC)

    def gen(batches):
        import numpy as np

        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            noise = _splitmix_normals(ids + n, DIM)
            clustered = ids < n_clustered
            cid = ids % N_CLUSTERS
            base = _splitmix_normals(cid + 3 * n, DIM)
            vec = np.where(clustered[:, None], base + EPS * noise, noise)
            vec = vec / np.linalg.norm(vec, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vec.astype(np.float64))}
            )

    ids = spark.range(n).select(F.col("id").alias("vec_id")).repartition(parts)
    return ids.mapInPandas(gen, "vec_id long, embedding array<double>")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    n_bits = int(sys.argv[4]) if len(sys.argv) > 4 else N_BITS
    mode = sys.argv[5] if len(sys.argv) > 5 else "all"

    import numpy as np

    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.components import assign_components
    from dedupe_trees_spark.operators.similarity import neardup_pairs
    from dedupe_trees_spark.session import get_spark

    spark = get_spark(
        app_name="embedding_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/embsc_tmp",
        },
    )
    e = gen_vectors(spark, n, parts=4 * cores)
    e.write.mode("overwrite").parquet("/dev/shm/embsc_vecs")
    e = spark.read.parquet("/dev/shm/embsc_vecs")
    res: dict = {"n": n, "cores": cores, "dim": DIM, "tau": TAU,
                 "n_bits": n_bits, "n_tables": N_TABLES, "mode": mode,
                 "n_clusters": N_CLUSTERS,
                 "n_clustered": int(n * CLUSTERED_FRAC)}

    t0 = time.time()
    pairs = neardup_pairs(
        e, tau=TAU, dim=DIM, n_bits=n_bits, n_tables=N_TABLES, seed=42, mode=mode
    )
    pairs.write.mode("overwrite").parquet("/dev/shm/embsc_pairs")
    pairs = spark.read.parquet("/dev/shm/embsc_pairs")
    n_pairs = pairs.count()
    wall = time.time() - t0
    res["pairs"] = {"wall_sec": round(wall, 1),
                    "vecs_per_sec": round(n / wall), "n_pairs": n_pairs}
    print(json.dumps({"phase": "pairs", **res["pairs"]}), flush=True)

    t0 = time.time()
    comps = assign_components(
        e.select("vec_id"), pairs, id_col="vec_id", a="id_a", b="id_b"
    )
    comps.write.mode("overwrite").parquet("/dev/shm/embsc_comps")
    wall = time.time() - t0
    comps = spark.read.parquet("/dev/shm/embsc_comps")
    res["cc"] = {"wall_sec": round(wall, 1), "vecs_per_sec": round(n / wall)}
    print(json.dumps({"phase": "cc", **res["cc"]}), flush=True)

    # cluster recovery: members of each planted cluster in ONE component
    n_clustered = res["n_clustered"]
    m = (
        comps.filter(F.col("vec_id") < n_clustered)
        .withColumn("cid", F.col("vec_id") % N_CLUSTERS)
        .groupBy("cid")
        .agg(
            F.countDistinct("component_id").alias("n_comp"),
            F.count(F.lit(1)).alias("members"),
        )
    )
    agg = m.agg(
        F.sum((F.col("n_comp") == 1).cast("long")).alias("intact"),
        F.max("n_comp").alias("worst"),
        F.count(F.lit(1)).alias("clusters"),
    ).collect()[0]
    # sampled truth-pair recall: adjacent-id same-cluster pairs, which
    # are uniform over members; exact cosine re-checked driver-side
    sample_ids = np.arange(0, min(n_clustered, 200 * N_CLUSTERS))
    a = sample_ids[:-N_CLUSTERS]
    b = a + N_CLUSTERS  # same cid, next member
    va = _splitmix_normals(a + n, DIM) * EPS + _splitmix_normals(
        a % N_CLUSTERS + 3 * n, DIM
    )
    vb = _splitmix_normals(b + n, DIM) * EPS + _splitmix_normals(
        b % N_CLUSTERS + 3 * n, DIM
    )
    cos = (va * vb).sum(1) / (
        np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
    )
    qual = cos >= TAU
    import pandas as pd

    truth = spark.createDataFrame(
        pd.DataFrame({"ta": a[qual], "tb": b[qual]})
    )
    lab = comps.select("vec_id", "component_id")
    joined = (
        truth.join(lab.withColumnRenamed("vec_id", "ta")
                   .withColumnRenamed("component_id", "ca"), "ta")
        .join(lab.withColumnRenamed("vec_id", "tb")
              .withColumnRenamed("component_id", "cb"), "tb")
    )
    n_truth = int(qual.sum())
    n_found = joined.filter(F.col("ca") == F.col("cb")).count()
    res["recovery"] = {
        "clusters_intact": int(agg["intact"]),
        "clusters_total": int(agg["clusters"]),
        "worst_components_per_cluster": int(agg["worst"]),
        "truth_pairs_sampled": n_truth,
        "truth_pairs_same_component": n_found,
        "recall": round(n_found / max(n_truth, 1), 6),
    }
    print(json.dumps({"phase": "recovery", **res["recovery"]}), flush=True)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
