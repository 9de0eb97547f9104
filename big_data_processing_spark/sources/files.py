"""File sources and sinks (parquet / CSV), path-scheme agnostic.

Collapses the reference's LocalFileManager + dead HDFS sink +
aspirational S3 manager (`/root/reference/src/storage/
local_file_manager.py:37-54`, `/root/reference/src/main.py:140-145`)
into thin ``DataFrameReader``/``DataFrameWriter`` wrappers: in
Spark, sink *location* is just the path scheme (``file://``,
``hdfs://``, ``s3a://``), so one code path serves all tiers.

Scale notes: writers take ``partition_by`` for hive-style layout
(enables partition pruning on re-read) and ``target_partitions`` to
coalesce small outputs; both are no-ops when unset so large jobs
keep their natural parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan. Schema optional — parquet footers carry types,
    but passing one skips footer reads and enforces a contract."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan. Always pass a schema in production — ``inferSchema``
    costs an extra full pass over the data."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """Parquet sink (reference S3: `local_file_manager.py:43-44`)."""
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    target_partitions: int | None = None,
) -> None:
    """CSV sink with header (reference S4: `local_file_manager.py:45-46`)."""
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    df.write.mode(mode).option("header", header).csv(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan (built-in vectorized reader — same pushdown/pruning
    behavior class as parquet; schema optional, footers carry
    types)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """ORC sink — for interop with Hive-era warehouses that read
    ORC, same writer contract as :func:`write_parquet`."""
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan. Always pass a schema in production — without
    one Spark runs a full inference pass, and corpus-scale JSONL is
    precisely where that second scan hurts."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    target_partitions: int | None = None,
    compression: str | None = None,
) -> None:
    """JSON-lines sink — the interchange format most text-corpus
    tooling consumes. Lossy for binary columns (base64 via explicit
    cast is the caller's choice); keep media in parquet/ORC.

    ``compression``: any Spark text codec ("gzip", "bzip2", "lz4",
    "snappy", "deflate", "zstd"). Real corpora ship as ``.jsonl.gz``
    / ``.jsonl.zst``; the matching read path needs NO option —
    Spark's text sources dispatch on the file extension. Codec
    choice is a split-ability decision at 100 TB: gzip files are
    NOT splittable (one task per file — size files toward one
    task's appetite at write time), bzip2 and zstd-with-seekable
    frames are.

    zstd availability is a DEPLOYMENT property, not an engine one:
    Hadoop's ZStandardCodec needs the native-hadoop library, which
    this runtime does not bundle (probed r9:
    ``NativeCodeLoader.isNativeCodeLoaded() == False``; Spark lists
    available codecs as bzip2/deflate/uncompressed/snappy/lz4/gzip
    and rejects ``zstd`` with CODEC_NOT_AVAILABLE). On a cluster
    with libhadoop + libzstd the same one-word option works
    unchanged. Here, ``bzip2`` is the SPLITTABLE compressed-text
    choice (pure-Java codec, always present, block-structured so a
    10 GiB .jsonl.bz2 still fans out across tasks) — round-trip
    value-checked by the ``bzip2_roundtrip_stats`` registry query
    beside gzip's."""
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines scan with per-row corruption quarantine: rows that
    fail to parse against ``schema`` arrive with their raw line in
    ``_corrupt`` and NULL data columns instead of killing the scan —
    a malformed record must never fail a 100 TB ingest (the text
    sibling of the media kernels' ``decode_ok = False`` contract).
    Filter ``_corrupt IS NULL`` for the clean frame and
    ``IS NOT NULL`` for the quarantine sink.

    Spark caveat encoded here: the corrupt-record column must be
    ADDED to the user schema, and (per the JSON datasource contract)
    a query may not select ONLY the corrupt column — callers keep at
    least one data column in scope, which both returned shapes do."""
    # copy, don't .add(): StructType.add mutates the caller's schema
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with the same per-row corruption quarantine contract
    as :func:`read_jsonl_quarantine`: rows that fail to parse against
    ``schema`` (wrong arity, uncastable values) arrive with the raw
    line in ``_corrupt`` and NULL data columns. Same Spark caveat:
    never select ONLY the corrupt column from the raw source."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def create_table(
    spark: SparkSession,
    name: str,
    schema: T.StructType | str,
    path: str | None = None,
    partition_by: list[str] | None = None,
    if_not_exists: bool = True,
) -> None:
    """Managed/external table DDL: ``CREATE TABLE ... USING parquet``
    (reference S8: `scripts/create_tables.sql:10-57` creates typed
    tables; its CREATE INDEX statements have no Spark equivalent —
    bucketing via ``write_bucketed`` is the Spark-native analogue of
    a join/lookup index, and hive partitioning of a range index).

    ``schema`` is a StructType or a DDL string ("id BIGINT, v
    DOUBLE"); ``path`` makes it an external table over existing
    files, otherwise data lives in the warehouse dir."""
    ddl = (
        schema
        if isinstance(schema, str)
        else ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
    )
    exists = "IF NOT EXISTS " if if_not_exists else ""
    stmt = f"CREATE TABLE {exists}{name} ({ddl}) USING parquet"
    if partition_by:
        stmt += f" PARTITIONED BY ({', '.join(partition_by)})"
    if path is not None:
        stmt += f" LOCATION '{path}'"
    spark.sql(stmt)


def drop_table(spark: SparkSession, name: str) -> None:
    """DROP TABLE IF EXISTS — the teardown half of S8."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def copy_file(spark: SparkSession, src: str, dest: str) -> bool:
    """Driver-side single-file copy via the Hadoop FileSystem API
    (reference S11: `local_file_manager.py:24-35,56-66` shutil.copy2)
    — scheme-agnostic, so the same call moves a file between local
    disk, HDFS, and object storage. Not a dataflow op: use it for
    manifests/configs, never for table data (that's a distributed
    read→write)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(src)
    dest_path = jvm.org.apache.hadoop.fs.Path(dest)
    src_fs = src_path.getFileSystem(conf)
    dest_fs = dest_path.getFileSystem(conf)
    return jvm.org.apache.hadoop.fs.FileUtil.copy(
        src_fs, src_path, dest_fs, dest_path, False, True, conf
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table sink.

    Both sides of a repeated equi-join written with the SAME
    ``bucket_cols`` and ``num_buckets`` co-locate matching keys in
    matching files — the join then runs with NO shuffle exchange on
    either side (see tests/test_sources.py plan assertion). This is
    the 100 TB answer to "we join these two facts every day":
    pay the shuffle once at write time, never again at read time.

    Bucketing metadata lives in the session catalog (``saveAsTable``
    is required — plain ``.parquet(path)`` cannot record it); pass
    ``path`` to keep the data files at an external location.
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
