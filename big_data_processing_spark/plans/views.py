"""SQL view layer (reference §2.9: the two reporting views in
`/root/reference/scripts/create_tables.sql:60-78` plus the temp-view
surface `main.py:323-340` queries through).

In the reference these lived in PostgreSQL; here they are Spark temp
views over the processed table — `spark.sql` queries them with full
Catalyst optimization (view text inlines into the calling query, so
filters still push down to the parquet scan underneath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROCESSED_VIEW = "lineitem_processed"

# per-category aggregate view (create_tables.sql:60-68 shape)
CATEGORY_SUMMARY_SQL = f"""
    SELECT qty_category,
           count(*) AS total_trips,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_discount,
           round(avg(l_quantity), 2) AS avg_quantity
    FROM {PROCESSED_VIEW}
    GROUP BY qty_category
"""

# per-vendor-like-key aggregate view (create_tables.sql:70-78 shape)
VENDOR_SUMMARY_SQL = f"""
    SELECT l_returnflag,
           count(*) AS total_trips,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_discount,
           round(avg(l_quantity), 2) AS avg_quantity
    FROM {PROCESSED_VIEW}
    GROUP BY l_returnflag
"""


def create_reporting_views(spark: SparkSession, processed: DataFrame) -> None:
    """Register the processed table + the two reporting views.
    After this, ``spark.sql("SELECT ... FROM category_summary")``
    serves the reference's report queries (`main.py:323-340`)."""
    processed.createOrReplaceTempView(PROCESSED_VIEW)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW category_summary AS "
        + CATEGORY_SUMMARY_SQL
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW vendor_summary AS " + VENDOR_SUMMARY_SQL
    )
