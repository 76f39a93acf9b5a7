"""Storage-layout tests: the two write-time layouts that buy plan-time
wins at scale — bucketing (shuffle-free co-located joins) and partition
pruning (scan only the partitions a filter selects). Asserted on the
physical plans, not just the results."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.io.writers import write_bucketed, write_parquet
from tests.conftest import SF_DIR


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_shuffle(spark):
    """orders ⨝ lineitem on the order key, both bucketed on it: the
    sort-merge join must read bucket-aligned and skip both exchanges."""
    orders = read_table(spark, SF_DIR, "orders")
    lineitem = read_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", n_buckets=4)
    try:
        # disable broadcast so the join strategy is the bucket-aware SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_lineitem_b").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketing did not avoid the shuffle"
        # results still correct
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partition_pruning_on_event_date(spark, tmp_path):
    """events written partitioned by event date: a one-day filter must
    prune at planning time (PartitionFilters), not scan-and-discard."""
    events = read_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_partitioned")
    write_parquet(events, out, partition_by=["event_date"])

    df = spark.read.parquet(out).filter(F.col("event_date") == "2024-01-05")
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # correctness: same rows as filtering the unpartitioned source
    want = events.filter(F.to_date("ts") == "2024-01-05").count()
    assert df.count() == want and want > 0


def test_ivf_layout_prunes_label_partitions(spark, tmp_path):
    """The IVF scale path: corpus written partitioned by list id, a
    probe reads only its list's partition (partition pruning, not a
    full scan)."""
    from trackdechets_etl_spark.io.readers import read_table

    e = read_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "emb_by_label")
    e.write.partitionBy("label").mode("overwrite").parquet(path)
    probe = spark.read.parquet(path).filter(F.col("label") == 3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(label" in plan or "label#" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0], "label filter not applied as a partition filter"
    n_label = e.filter(F.col("label") == 3).count()
    assert probe.count() == n_label


def test_register_views_sql_front_door(spark):
    from trackdechets_etl_spark.io.readers import register_views

    register_views(spark, SF_DIR)
    out = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()
    assert out[0]["n"] > 0


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from trackdechets_etl_spark.io.writers import compact_parquet

    src = str(tmp_path / "fragmented")
    e = read_table(spark, SF_DIR, "events")
    e.repartition(64).write.parquet(src)  # 64 tiny files
    n_small = len(list((tmp_path / "fragmented").rglob("*.parquet")))
    assert n_small >= 32

    dest = str(tmp_path / "compacted")
    n_parts = compact_parquet(spark, src, dest, target_file_bytes=64 * 1024 * 1024)
    n_big = len(list((tmp_path / "compacted").rglob("*.parquet")))
    assert n_big == n_parts <= 4
    assert spark.read.parquet(dest).count() == e.count()


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """Z-ordered files cover compact ranges of BOTH cluster columns:
    the mean per-file (max-min) span of each column must be far below
    the global span (single-column sorting can only achieve this for
    one column; round-robin for none)."""
    from trackdechets_etl_spark.io.writers import write_zordered

    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=32)
    rpath = str(tmp_path / "roundrobin")
    li.repartition(32).write.parquet(rpath)

    def mean_spans(path):
        df = spark.read.parquet(path).withColumn(
            "f", F.input_file_name()
        )
        spans = df.groupBy("f").agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("so"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("sp"),
        )
        r = spans.agg(F.avg("so").alias("o"), F.avg("sp").alias("p")).collect()[0]
        return r.o, r.p

    g = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("o"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("p"),
    ).collect()[0]
    zo, zp = mean_spans(zpath)
    ro, rp = mean_spans(rpath)
    # round-robin files span ~the whole domain on both columns
    assert ro > 0.9 * g.o and rp > 0.9 * g.p
    # z-ordered files are clustered on both (≤ ~40% of the domain each)
    assert zo < 0.4 * g.o, f"orderkey not clustered: {zo} vs {g.o}"
    assert zp < 0.4 * g.p, f"partkey not clustered: {zp} vs {g.p}"
    # and nothing was lost
    assert spark.read.parquet(zpath).count() == li.count()


def test_runtime_bloom_filter_injected_on_selective_join(spark):
    """Runtime semi-join reduction: a selective dim-side filter injects
    a bloom filter into the fact side of a shuffled join (Spark's
    might_contain aggregate pushdown). Off at test SFs only because the
    application-side scan threshold is 10 GB — at the 100 TB target the
    default config fires this on every selective fact-dim join; the
    test lowers the thresholds to pin the mechanism."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = read_table(spark, SF_DIR, "lineitem")
        o = read_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "bloomfilter" in plan.lower() or "might_contain" in plan.lower(), (
            "selective join did not inject a runtime bloom filter"
        )
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
