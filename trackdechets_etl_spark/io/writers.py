"""Sinks (SURVEY §2.1, S8-S10).

The reference writes CSVs (``dags/publish-open-data.py:58,99``) and does
replace-mode JDBC inserts with a pathological ``chunksize=3``
(``dags/icpe-siretisation.py:380`` — deliberately NOT replicated; Spark's
JDBC writer batches at 1000+ rows). The REST sink (S10,
``dags/publish-open-data.py:97-102``) stays driver-side: collect the
(small, publishable) result and POST it.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink. ``partition_by`` (e.g. event date) enables
    partition pruning downstream — the 100 TB layout the reference
    never had (SURVEY §4, partition-pruning row)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows are hash-bucketed on the join key at
    write time, so equi-joins (and groupBys) between tables bucketed on
    the same key and count run WITHOUT a shuffle — the pre-paid-shuffle
    layout for fact-fact joins at 100 TB (the broadcast escape hatch
    only works while one side stays dim-sized). Requires saveAsTable
    (bucket metadata lives in the catalog)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.format("parquet").saveAsTable(table)


def compact_parquet(
    spark,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files. The operational fix for the
    many-small-files problem (streaming sinks, per-task outputs) that
    murders scan throughput at 100 TB — file-open overhead and
    footer reads dominate once files drop below ~tens of MB.
    Returns the number of output partitions written.

    Sizing walks the local filesystem; on object storage swap the walk
    for the Hadoop FileSystem API (same coalesce logic)."""
    df = spark.read.parquet(src_path)
    total_bytes = sum(
        f.stat().st_size for f in Path(src_path).rglob("*.parquet")
    )
    n_parts = max(1, -(-total_bytes // target_file_bytes))  # ceil div
    df.coalesce(n_parts).write.mode("overwrite").parquet(dest_path)
    return n_parts


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """S8: CSV sink (reference ``dags/publish-open-data.py:58``)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """S9: replace-mode JDBC sink (reference
    ``dags/icpe-siretisation.py:380,385``), with a sane batch size."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
