"""The end-to-end dedup pipeline (SURVEY.md §3.2 lifecycle):

    S1 signatures:  pages → (url, nid, meta, content_hash, shingles,
                             minhash, simhash, substr_fp)  [checkpoint]
    S2 bands:       signatures → (nid, band_id, band_hash)
                    [checkpoint only with cfg.checkpoint_bands — bands
                    are one narrow map over S1, so by default they are
                    derived inline by S3 instead of paying a full
                    write+read of 32 rows/doc]
    S3 pairs:       exact ∪ minhash ∪ simhash ∪ substr edges, verified
                                                           [checkpoint]
    S4 components:  connected components over pairs        [checkpoint]
    S5 canonical:   resolver window → canonical + removals [checkpoint]

Node identity: every stage after S1 keys documents by ``nid =
xxhash64(url)`` (8 bytes) instead of the url string (~60–80 bytes for
web urls) — bands, candidate pairs, verification, and every
connected-components iteration shuffle longs, cutting shuffle bytes on
the id columns by ~8–10×. S1 audits the mapping (distinct urls ==
distinct nids) and aborts on a collision; at 10^12 docs the 64-bit
birthday bound makes collisions likely, so that scale should switch the
id to struct(xxhash64(url), xxhash64(url, seed2)) — the audit is the
guard rail either way. Urls are joined back only at S5 for resolution
and sinks.

Every stage reads its dependencies from the previous stage's parquet
checkpoint, never from an in-memory plan — that is what makes resume
(``_SUCCESS``-gated) trivially correct, bounds Catalyst lineage, and
gives each stage an independent shuffle budget. The html binary column
is dropped at S1 so every later scan benefits from column pruning.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dedupe_trees_spark.config import PipelineConfig
from dedupe_trees_spark.functions.minhash import signature_struct_udf
from dedupe_trees_spark.functions.text import content_hash, normalize_text, token_hashes
from dedupe_trees_spark.io import read_pages, read_stage, stage_done, write_stage
from dedupe_trees_spark.operators import resolve as R
from dedupe_trees_spark.operators.components import assign_components
from dedupe_trees_spark.operators.exact import exact_edges
from dedupe_trees_spark.operators.lsh import candidate_pairs, explode_bands, verify_pairs
from dedupe_trees_spark.plans.lineage import record_stage

STAGES = ["signatures", "bands", "pairs", "components", "canonical"]


class DedupePipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg

    # ---------------------------------------------------------------- stages

    def _build_signatures(self) -> DataFrame:
        cfg = self.cfg
        pages = read_pages(self.spark, cfg.input_path)
        cols = ["url", "warc_ts", "text", "lang", "source", "source_order"]
        have = set(pages.columns)
        sel = [c for c in cols if c in have]
        df = pages.select(*sel)
        if "source_order" not in have and "source" in have:
            df = df.withColumn(
                "source_order",
                F.regexp_extract("source", r"(\d+)$", 1).cast("int"),
            )
        df = df.withColumn("nid", F.xxhash64("url"))
        df = df.withColumn("norm", normalize_text("text")).drop("text")
        df = df.withColumn("content_hash", content_hash("norm")).withColumn(
            "n_chars", F.length("norm")
        )
        # ONE Python round trip computes shingle sets + MinHash + SimHash
        # (from the JVM-hashed token array — see token_hashes docstring for
        # why shingles are mixed in NumPy, not built as strings) + winnowed
        # substring fingerprints (from the text bytes)
        sig = signature_struct_udf(
            shingle_k=cfg.shingle_k,
            num_perm=cfg.num_perm,
            seed=cfg.minhash_seed,
            with_simhash=cfg.enable_simhash,
            substr_k=cfg.substring_k if cfg.enable_substring else None,
            substr_w=cfg.substring_w if cfg.enable_substring else None,
            with_shingles=cfg.store_shingles,
        )
        df = df.withColumn("_sig", sig(token_hashes("norm"), F.col("norm")))
        df = df.withColumn("minhash", F.col("_sig.minhash")).withColumn(
            "simhash", F.col("_sig.simhash")
        )
        if cfg.store_shingles:
            df = df.withColumn("shingles", F.col("_sig.shingles"))
        if cfg.enable_substring:
            df = df.withColumn("substr_fp", F.col("_sig.substr_fp"))
        df = df.drop("_sig")
        if not cfg.enable_simhash:
            df = df.drop("simhash")
        # store_shingles=False keeps `norm` (3× smaller than the shingle
        # column) so verify can re-derive sets for candidate docs only
        return df if not cfg.store_shingles else df.drop("norm")

    def _build_bands(self) -> DataFrame:
        cfg = self.cfg
        sigs = read_stage(self.spark, cfg.ckpt_dir, "signatures")
        return explode_bands(
            sigs, sig_col="minhash", id_col="nid", bands=cfg.bands, rows=cfg.rows_per_band
        )

    def _build_pairs(self) -> DataFrame:
        cfg = self.cfg
        sigs = read_stage(self.spark, cfg.ckpt_dir, "signatures")

        # candidate pairs from MinHash bands and SimHash chunks (the
        # latter Hamming-prefiltered — 16-bit chunk buckets over-generate
        # ~30 random collisions per doc) share ONE exact-Jaccard
        # verification join: the shingle-set join is this stage's dominant
        # cost, so it runs once over the deduped candidate union.
        # (A fully-merged single bucket table for all three generators was
        # tried and measured SLOWER: per-pair provenance forces a
        # collect_set aggregate over the largest shuffle of the job.)
        scratch = f"{cfg.ckpt_dir}/_scratch"
        cand_frames = []
        if cfg.enable_minhash:
            if cfg.checkpoint_bands:
                bands = read_stage(self.spark, cfg.ckpt_dir, "bands")
            else:
                bands = self._build_bands()
            cand_frames.append(
                candidate_pairs(
                    bands, id_col="nid", cap=cfg.bucket_cap,
                    scratch_path=f"{scratch}/minhash_tagged",
                )
                .withColumn("kind", F.lit("minhash"))
            )
        if cfg.enable_simhash:
            from dedupe_trees_spark.operators.simhash_join import simhash_pairs

            cand_frames.append(
                simhash_pairs(
                    sigs.select("nid", "simhash"),
                    id_col="nid",
                    max_hamming=cfg.simhash_max_hamming,
                    cap=cfg.bucket_cap,
                    scratch_path=f"{scratch}/simhash_tagged",
                )
                .select("url_a", "url_b")
                .withColumn("kind", F.lit("simhash"))
            )

        # url_a/url_b column names are the pair-plumbing convention; from
        # here on they carry int64 nids, not url strings
        edge_frames = [exact_edges(sigs, id_col="nid", hash_col="content_hash")]
        if cand_frames:
            cands = cand_frames[0]
            for c in cand_frames[1:]:
                cands = cands.unionByName(c)
            cands = cands.groupBy("url_a", "url_b").agg(F.min("kind").alias("kind"))
            if "shingles" in sigs.columns:
                sets = sigs
            else:
                # shingle sets were not stored (store_shingles=False):
                # re-derive them for candidate-involved docs only — a
                # left-semi join keeps this proportional to candidate
                # volume, not corpus size. Both intermediates spill to
                # parquet scratch (multiple consumers; nothing cached).
                from dedupe_trees_spark.functions.minhash import shingle_set_udf
                from dedupe_trees_spark.functions.text import token_hashes

                cands.write.mode("overwrite").parquet(f"{scratch}/cands")
                cands = self.spark.read.parquet(f"{scratch}/cands")
                cand_nids = (
                    cands.select(F.col("url_a").alias("nid"))
                    .unionByName(cands.select(F.col("url_b").alias("nid")))
                    .dropDuplicates(["nid"])
                )
                sets = sigs.join(cand_nids, "nid", "left_semi").select(
                    "nid",
                    shingle_set_udf(cfg.shingle_k)(token_hashes("norm")).alias(
                        "shingles"
                    ),
                )
                sets.write.mode("overwrite").parquet(f"{scratch}/sets")
                sets = self.spark.read.parquet(f"{scratch}/sets")
            edge_frames.append(
                verify_pairs(
                    cands, sets, cfg.jaccard_threshold, id_col="nid",
                    shingle_col="shingles", kind=None,
                )
            )
        if cfg.enable_substring:
            from dedupe_trees_spark.operators.substring import _pairs_from_gram_sets

            sub = _pairs_from_gram_sets(
                sigs.select("nid", "substr_fp"), F.col("substr_fp"), "nid",
                cfg.bucket_cap, scratch_path=f"{scratch}/substr_tagged",
            ).select(
                "url_a", "url_b", F.lit("substr").alias("kind"), F.lit(1.0).alias("score")
            )
            edge_frames.append(sub)
        pairs = edge_frames[0]
        for e in edge_frames[1:]:
            pairs = pairs.unionByName(e)
        # one row per undirected pair; keep the strongest-evidence kind
        # (partial aggregation beats a row_number window here: no sort)
        pri = (
            F.when(F.col("kind") == "exact", 0)
            .when(F.col("kind") == "minhash", 1)
            .when(F.col("kind") == "simhash", 2)
            .otherwise(3)
        )
        return (
            pairs.groupBy("url_a", "url_b")
            .agg(F.min_by(F.struct("kind", "score"), pri).alias("_best"))
            .select("url_a", "url_b", F.col("_best.kind").alias("kind"), F.col("_best.score").alias("score"))
        )

    def _build_components(self) -> DataFrame:
        cfg = self.cfg
        sigs = read_stage(self.spark, cfg.ckpt_dir, "signatures")
        pairs = read_stage(self.spark, cfg.ckpt_dir, "pairs")
        return assign_components(
            sigs.select("nid"), pairs, id_col="nid",
            ckpt_dir=f"{cfg.ckpt_dir}/_cc_work",
        )

    def _build_canonical(self) -> DataFrame:
        cfg = self.cfg
        sigs = read_stage(self.spark, cfg.ckpt_dir, "signatures")
        comps = read_stage(self.spark, cfg.ckpt_dir, "components")
        meta_cols = [c for c in ["url", "warc_ts", "lang", "source", "source_order", "n_chars"] if c in sigs.columns]
        resolved = R.resolve(
            sigs.select("nid", *meta_cols).join(comps, "nid"),
            list(cfg.resolvers),
        )
        return resolved.select(
            "component_id", "url", *[c for c in meta_cols if c != "url"],
            "rank", "is_canonical",
        )

    def _audit_ids(self) -> None:
        """Abort if xxhash64(url) collided (see module docstring)."""
        sigs = read_stage(self.spark, self.cfg.ckpt_dir, "signatures")
        row = sigs.agg(
            F.countDistinct("url").alias("u"), F.countDistinct("nid").alias("n")
        ).collect()[0]
        if row["u"] != row["n"]:
            raise RuntimeError(
                f"nid collision: {row['u']} distinct urls -> {row['n']} distinct "
                "nids; switch the node id to a 128-bit struct of two xxhash64 "
                "seeds for this corpus size"
            )

    # ------------------------------------------------------------------- run

    def run(self) -> dict:
        """Execute all stages, skipping checkpointed ones when resuming.

        Returns the per-stage metrics dicts (empty for skipped stages).
        """
        builders = {
            "signatures": self._build_signatures,
            "bands": self._build_bands,
            "pairs": self._build_pairs,
            "components": self._build_components,
            "canonical": self._build_canonical,
        }
        enabled = [
            s for s in STAGES
            if s != "bands" or (self.cfg.enable_minhash and self.cfg.checkpoint_bands)
        ]
        report = {}
        for stage in enabled:
            if self.cfg.resume and stage_done(self.cfg.ckpt_dir, stage):
                report[stage] = {"stage": stage, "skipped": True}
                continue
            t0 = time.time()
            df = builders[stage]()
            write_stage(df, self.cfg.ckpt_dir, stage)
            if stage == "signatures" and self.cfg.audit_ids:
                self._audit_ids()
            wall_ms = (time.time() - t0) * 1000
            report[stage] = record_stage(self.spark, self.cfg.ckpt_dir, stage, wall_ms)
            report[stage]["record_ms"] = round((time.time() - t0) * 1000 - wall_ms, 1)
        return report

    # ------------------------------------------------------------- accessors

    def canonical(self) -> DataFrame:
        return read_stage(self.spark, self.cfg.ckpt_dir, "canonical")

    def removals(self) -> DataFrame:
        return self.canonical().filter(~F.col("is_canonical"))

    def deduped_pages(self) -> DataFrame:
        """Delete-sink analogue (R11): input pages minus removals."""
        pages = read_pages(self.spark, self.cfg.input_path)
        return R.apply_delete_sink(pages, self.removals())
