from __future__ import annotations

from big_data_processing_spark.pipeline_documents import (
    run_document_pipeline,
)
from tests.conftest import SF0001


def test_document_pipeline_end_to_end(spark, tmp_path):
    res = run_document_pipeline(spark, SF0001, str(tmp_path))

    # monotone funnel
    assert (
        res.raw_docs
        >= res.after_quality
        >= res.after_lang
        >= res.after_exact_dedup
        >= res.after_near_dedup
        >= res.sampled
    )
    assert res.raw_docs > 0 and res.sampled > 0

    out = spark.read.parquet(res.out_path)
    # partitioned by predicted language; only kept languages present
    assert set(r.lang_pred for r in out.select("lang_pred").distinct().collect()) <= {
        "en", "de", "fr", "es"
    }
    # quality gate actually applied
    assert out.filter("quality < 0.3").count() == 0
    # exact dedup: no two rows share a normalized-text fingerprint
    from big_data_processing_spark.functions.text import md5_fingerprint
    from pyspark.sql import functions as F

    fps = out.select(md5_fingerprint(F.col("text")).alias("fp"))
    assert fps.count() == fps.distinct().count()
