"""End-to-end training-data document pipeline: the composite flow a
large-scale corpus build runs, assembled from this engine's
operators (north-star extension — no reference counterpart; the
operator semantics are individually oracle-checked via the
registry).

Stages:
  scan → text statistics (JVM expressions) → quality gate →
  language filter → exact dedup (md5 fingerprint, keep min id) →
  near-dup removal (MinHash+LSH pairs → drop the higher id of each
  verified pair) → stratified-by-language sample cap → sharded
  parquet write.

Scale notes
-----------
- Every filter is a narrow map over the scan; the only shuffles are
  the two dedup stages (16-byte fingerprints / band hashes — never
  document bodies) and the final write.
- Near-dup removal drops the HIGHER doc_id of each pair — a
  deterministic, order-free rule that needs no connected-components
  pass; for transitive near-dup clusters switch to a graph step
  (GraphFrames or iterative joins).
- The per-language sample keeps class balance under a size budget
  (seeded, reproducible).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_processing_spark.functions.dedup import (
    dedup_by_fingerprint,
    minhash_near_duplicates,
)
from big_data_processing_spark.functions.text import (
    lang_id,
    quality_score,
    token_count,
)
from big_data_processing_spark.sources.catalog import load_table
from big_data_processing_spark.sources.files import write_parquet


@dataclass
class DocPipelineResult:
    raw_docs: int
    after_quality: int
    after_lang: int
    after_exact_dedup: int
    after_near_dedup: int
    sampled: int
    out_path: str


def run_document_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    near_dup_threshold: float = 0.6,
    sample_fraction: float = 0.5,
    seed: int = 42,
) -> DocPipelineResult:
    """Run the corpus-preparation flow over ``{sf_dir}/documents``
    and write the cleaned, deduped, sampled corpus to
    ``{out_dir}/corpus``. Returns per-stage row counts."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.count()

    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_pred"),
    )
    quality_ok = scored.filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    n_quality = quality_ok.count()

    lang_ok = quality_ok.filter(F.col("lang_pred").isin(*keep_langs))
    n_lang = lang_ok.count()

    # exact dedup: keep the min doc_id per normalized-text fingerprint
    keepers = dedup_by_fingerprint(lang_ok, "text", "doc_id").select(
        "doc_id"
    )
    exact_deduped = lang_ok.join(keepers, on="doc_id")
    n_exact = exact_deduped.count()

    # near-dup removal: drop the higher id of each verified pair
    pairs = minhash_near_duplicates(
        exact_deduped, "text", "doc_id", threshold=near_dup_threshold
    )
    drop_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    near_deduped = exact_deduped.join(drop_ids, on="doc_id", how="left_anti")
    n_near = near_deduped.count()

    sampled = near_deduped.sampleBy(
        "lang_pred",
        {lang: sample_fraction for lang in keep_langs},
        seed=seed,
    )
    out_path = f"{out_dir}/corpus"
    write_parquet(sampled, out_path, partition_by=["lang_pred"])
    n_sampled = spark.read.parquet(out_path).count()

    return DocPipelineResult(
        raw_docs=raw,
        after_quality=n_quality,
        after_lang=n_lang,
        after_exact_dedup=n_exact,
        after_near_dedup=n_near,
        sampled=n_sampled,
        out_path=out_path,
    )
