"""Sources / sinks.

The reference's only "connectors" are warehouse clients (snowflake / bigquery
/ sqlalchemy — rasgoql/rasgoql/imports.py:42-73); file formats are a free
Spark capability gain (SURVEY §2.2 sources table). This module adds the
scale-relevant knobs on top of ``spark.read``/``write``: partitioned layouts
(partition pruning / DPP), bucketing (shuffle-free co-located joins), and a
JDBC passthrough (the analog of the reference's warehouse connectors).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str, columns=None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession, path: str, header: bool = True, infer_schema: bool = True,
    schema=None, **options,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.options(**options).csv(path)


def read_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str,
    partition_column: str | None = None, lower_bound=None, upper_bound=None,
    num_partitions: int | None = None, **properties,
) -> DataFrame:
    """JDBC source with parallel partitioned reads — a single-connection JDBC
    read funnels the whole table through one task; always pass
    partition_column/bounds for real tables."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def write_table(
    df: DataFrame,
    path_or_table: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by=None,
    bucket_by: Optional[tuple] = None,
    sort_by=None,
    compression: str | None = None,
) -> None:
    """Scale-aware writer.

    - ``partition_by``: hive-style directory partitioning → partition pruning
      and dynamic partition pruning on the read side.
    - ``bucket_by=(n, cols)``: pre-shuffled bucketed layout (saveAsTable
    only) → bucketed equi-joins/aggregations skip the shuffle entirely.
    """
    writer = df.write.format(fmt).mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(
            *(partition_by if isinstance(partition_by, (list, tuple)) else [partition_by])
        )
    if bucket_by:
        n, cols = bucket_by
        cols = cols if isinstance(cols, (list, tuple)) else [cols]
        writer = writer.bucketBy(n, *cols)
        if sort_by:
            writer = writer.sortBy(
                *(sort_by if isinstance(sort_by, (list, tuple)) else [sort_by])
            )
        writer.saveAsTable(path_or_table)
        return
    if "/" in path_or_table or path_or_table.endswith(".parquet"):
        writer.save(path_or_table)
    else:
        writer.saveAsTable(path_or_table)


def compact_shards(
    spark: SparkSession,
    path: str,
    target_mb: int = 512,
    file_format: str = "parquet",
    out_path: str | None = None,
    shuffle: bool = False,
) -> str:
    """Compact a small-files directory into ~``target_mb`` files — the
    standard remedy for the streaming/incremental-ingest failure mode where
    thousands of KB-sized files make every downstream scan
    metadata-bound. File count = ceil(input_bytes / target_mb).

    ``shuffle=False`` (default) uses ``coalesce`` — no shuffle, each output
    file concatenates input splits; ``shuffle=True`` repartitions for even
    output sizes when the inputs are skewed. With ``out_path=None`` the
    directory is replaced IN PLACE via write-to-temp + FileSystem rename
    (the two renames are metadata-only on HDFS/local; on object stores pass
    an explicit ``out_path`` instead — S3 "rename" is a copy).

    Returns the output path. Row content is preserved exactly (tested);
    only the file layout changes.
    """
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    total = fs.getContentSummary(src).getLength()
    n = max(1, -(-int(total) // (target_mb * 1024 * 1024)))
    df = spark.read.format(file_format).load(path)
    df = df.repartition(n) if shuffle else df.coalesce(n)
    if out_path is not None:
        df.write.format(file_format).mode("overwrite").save(out_path)
        return out_path
    tmp = path.rstrip("/") + "__compact_tmp"
    df.write.format(file_format).mode("overwrite").save(tmp)
    bak = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_bak")
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    if not fs.rename(src, bak):
        raise IOError(f"compact_shards: could not move {path} aside")
    if not fs.rename(tmp_p, src):
        fs.rename(bak, src)  # roll back
        raise IOError(f"compact_shards: could not move compacted data into {path}")
    fs.delete(bak, True)
    return path


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False, line_col: str = "value"
) -> DataFrame:
    """Plain-text source: one row per line (default) or per file
    (``whole_file`` — raw-document ingestion before chunking/cleaning).
    Avro is NOT wired here deliberately: spark-avro is an external module
    absent from a stock PySpark install; gate it behind your deployment."""
    df = spark.read.text(path, wholetext=whole_file)
    return df.withColumnRenamed("value", line_col) if line_col != "value" else df


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source for multimodal corpora: one row per file with
    ``(path, modificationTime, length, content: binary)`` — the ingestion
    front-end for the ``image_meta``/``audio_meta``/``image_pixels``
    decoders (functions/multimodal.py), which consume exactly this
    ``content`` column shape. Spark parallelizes by file; pair with
    ``compact_shards``/``save_shards`` downstream because millions of tiny
    originals should be re-laid-out once, not rescanned per stage."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
