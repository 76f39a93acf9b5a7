"""Round-5 additions, third batch: lakehouse-maintenance and
training-pipeline operators.

- ``parts_skyline_2d``: Pareto frontier (min price, max size) via the
  sorted-window running-max trick — O(n log n), vs the oracle's
  obviously-correct quadratic NOT EXISTS. Round60's
  ``part_skyline_2d`` is the sort-free scale twin (bounded-domain
  prefix-min, no single-partition window); tests pin the two
  frontiers identical.
- ``orders_prorate_cents``: largest-remainder cent allocation of an
  order total across its line items — exact integer arithmetic, sums
  reconcile to the cent by construction.
- ``events_trend_slope``: per-key OLS trend (slope/intercept) in
  closed form from integer sums — the grouped-regression shape that
  needs no ML library and no iteration.
- ``layout_compaction_bins``: small-file compaction planning —
  start-offset binning of cumulative bytes into target-sized bins,
  the planning step of an Iceberg/Delta-style OPTIMIZE.
- ``events_late_arrivals``: watermark audit — lateness of each event
  vs the running max event-time in arrival order, the measurement
  that calibrates streaming watermark widths.
- ``training_negative_pairs``: deterministic contrastive negative
  sampling — per anchor, k cross-source negatives ranked by an
  md5 key (hex prefixes compare identically in both engines).
- ``diff_merkle_buckets``: bucket-digest table diff — per-bucket
  md5-of-sorted-row-digests for two snapshots, surfacing only the
  buckets that diverge. The 100 TB prelude to ``diff_snapshots``:
  ship 256 digests, recurse into mismatches, never full-outer-join
  whole tables that mostly agree.

All pure DataFrame algebra with exact DuckDB twins; invariant tests in
tests/test_round8.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ----------------------------------------------------------- 2D skyline


def _parts_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over (minimize retail price, maximize size):
    part a dominates b iff price_a <= price_b, size_a >= size_b and at
    least one is strict. Single sorted window pass: with prices snapped
    to exact cents, the running max size over STRICTLY cheaper rows
    (RANGE frame ending at -1 cent) and the max size within the same
    price level decide dominance — no self-join. The oracle is the
    quadratic NOT EXISTS, so the window algebra is proven against the
    definition at every scale factor. At 100 TB the one total order is
    a range-partitioned sort over the narrow (key, int, int)
    projection — the standard 2D-skyline sweep."""
    p = read_table(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("size"),
        F.round(F.col("p_retailprice") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    w_lt = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_eq = Window.partitionBy("price_cents")
    return (
        base.withColumn("__mlt", F.max("size").over(w_lt))
        .withColumn("__meq", F.max("size").over(w_eq))
        .filter(
            (F.col("__mlt").isNull() | (F.col("__mlt") < F.col("size")))
            & (F.col("__meq") == F.col("size"))
        )
        .select(
            "p_partkey",
            F.round(F.col("price_cents") / 100.0, 2).alias("price"),
            "size",
        )
        .orderBy("p_partkey")
    )


PARTS_SKYLINE_SQL = """
WITH b AS (
    SELECT p_partkey,
           CAST(p_size AS BIGINT) AS size,
           CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents
    FROM part)
SELECT p_partkey, round(price_cents / 100.0, 2) AS price, size
FROM b a
WHERE NOT EXISTS (
    SELECT 1 FROM b o
    WHERE o.price_cents <= a.price_cents AND o.size >= a.size
      AND (o.price_cents < a.price_cents OR o.size > a.size))
ORDER BY p_partkey
"""


# ------------------------------------------- largest-remainder proration


def _orders_prorate_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate each order's total across its line items proportionally
    to extended price with largest-remainder rounding, so the per-item
    cents sum EXACTLY to the order total: base_i = floor(T·w_i / W),
    and the remainder r = T − Σbase goes one cent each to the r items
    with the largest (T·w_i mod W), ties by (line number, weight) —
    (orderkey, linenumber) is NOT unique in this data, so the weight
    joins both the tie-break and the output to make rows
    distinguishable (rows identical in every field are interchangeable,
    so the output multiset stays deterministic). All int64 (T, w ≤ 5e7
    cents; T·w ≤ 2.5e15 < 2^63), so both engines agree bit-for-bit and
    Σalloc = T is algebraic, not approximate. One fact shuffle keyed by
    order; the three windows share that partitioning (single
    exchange)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    w = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    )
    t = o.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("t"),
    )
    wk = Window.partitionBy("l_orderkey")
    wr = Window.partitionBy("l_orderkey").orderBy(
        ((F.col("t") * F.col("w")) % F.col("__W")).desc(),
        F.col("l_linenumber").asc(),
        F.col("w").asc(),
    )
    j = (
        w.join(t, "l_orderkey")
        .withColumn("__W", F.sum("w").over(wk))
        .withColumn(
            "__base", F.floor(F.col("t") * F.col("w") / F.col("__W"))
        )
        .withColumn("__r", F.col("t") - F.sum("__base").over(wk))
        .withColumn("__rk", F.row_number().over(wr).cast("long"))
    )
    alloc = F.col("__base") + (F.col("__rk") <= F.col("__r")).cast("long")
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.col("w").alias("weight_cents"),
        alloc.alias("alloc_cents"),
    ).orderBy("l_orderkey", "l_linenumber", "weight_cents")


ORDERS_PRORATE_SQL = """
WITH w AS (
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS w
    FROM lineitem),
t AS (
    SELECT o_orderkey AS l_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS t
    FROM orders),
j AS (
    SELECT w.l_orderkey, l_linenumber, w.w, t.t,
           sum(w.w) OVER (PARTITION BY w.l_orderkey) AS tw
    FROM w JOIN t USING (l_orderkey)),
b AS (
    SELECT *,
           CAST(floor(t * w / tw) AS BIGINT) AS base,
           (t * w) % tw AS frac
    FROM j),
r AS (
    SELECT *,
           t - sum(base) OVER (PARTITION BY l_orderkey) AS rem,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY frac DESC, l_linenumber, w) AS rk
    FROM b)
SELECT l_orderkey, l_linenumber, w AS weight_cents,
       CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
           AS alloc_cents
FROM r ORDER BY l_orderkey, l_linenumber, weight_cents
"""


# -------------------------------------------------- grouped OLS trend


def _events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of daily event counts over the day index:
    slope = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²), intercept from the
    means — closed form over exact integer sums (t is the day offset
    from the type's first day, y the daily count), no iteration and no
    ML library. Two aggregations total: fact → daily counts, daily →
    five sums per type. The 100 TB shape: the regression runs on
    |types|×|days| rows regardless of event count."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    t0 = Window.partitionBy("event_type")
    daily = daily.withColumn(
        "t", F.datediff("day", F.min("day").over(t0)).cast("long")
    )
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
    )
    den = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
        "double"
    )
    slope = (
        F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    ).cast("double") / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("st").cast("double")
    ) / F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
    ).orderBy("event_type")


EVENTS_TREND_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
    FROM events GROUP BY 1, 2),
idx AS (
    SELECT event_type, y,
           CAST(day - min(day) OVER (PARTITION BY event_type) AS BIGINT)
               AS t
    FROM daily),
agg AS (
    SELECT event_type, count(*) AS n, sum(t) AS st, sum(y) AS sy,
           sum(t * t) AS stt, sum(t * y) AS sty
    FROM idx GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(CAST(n * sty - st * sy AS DOUBLE)
             / CAST(n * stt - st * st AS DOUBLE), 6) AS slope_per_day,
       round((CAST(sy AS DOUBLE)
              - CAST(n * sty - st * sy AS DOUBLE)
                / CAST(n * stt - st * st AS DOUBLE)
                * CAST(st AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
FROM agg ORDER BY event_type
"""


# --------------------------------------------- compaction bin planning

_COMPACT_TARGET = 4000  # target bin size in chars (stand-in for bytes)


def _layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (the OPTIMIZE planning step):
    documents stand in for data files (n_chars = file bytes), ordered
    by id; each file's bin is floor(start_offset / target) where
    start_offset is the exclusive running sum of sizes — start-offset
    binning packs every bin to >= target bytes except the last, with
    no iteration. Output is the per-bin manifest (file count, bytes,
    id range). The running sum is one window over the (id, int) pair;
    at 100 TB the file manifest is metadata-sized, not data-sized."""
    d = read_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    files = d.select("doc_id", F.col("n_chars").cast("long").alias("sz"))
    binned = files.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("sz").over(w), F.lit(0)) / _COMPACT_TARGET
        ).cast("long"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("sz").alias("total_bytes"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
        .orderBy("bin")
    )


LAYOUT_COMPACTION_SQL = f"""
WITH files AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS sz FROM documents),
binned AS (
    SELECT doc_id, sz,
           CAST(floor(coalesce(sum(sz) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_COMPACT_TARGET}) AS BIGINT) AS bin
    FROM files)
SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(sz) AS BIGINT) AS total_bytes,
       min(doc_id) AS first_id, max(doc_id) AS last_id
FROM binned GROUP BY bin ORDER BY bin
"""


# ----------------------------------------------- watermark lateness audit

_LATE_THRESHOLD_US = 600_000_000  # 10 minutes in microseconds


def _events_late_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-width audit: replay events in an ARRIVAL order and
    measure each event's lateness vs the running max event-time seen so
    far — exactly what a streaming watermark compares against. The
    synthetic feed is perfectly time-ordered by event_id (zero lateness
    everywhere), so arrival is simulated as the md5(event_id)
    permutation — the deterministic stand-in for unordered
    multi-partition ingestion; md5 hex strings order identically in
    both engines. Per type: late-event count, late fraction, max
    lateness in seconds. Integer microseconds throughout (the ADVICE r4
    lesson: never compare engine-specific epoch floats). In production
    the arrival column is the real ingestion sequence and the window
    keys by ingestion partition — the plan is unchanged."""
    from trackdechets_etl_spark.operators.ranking import (
        global_prefix_max_exclusive,
    )

    e = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    arrival = F.md5(F.col("event_id").cast("string"))
    e = e.withColumn("__arr", arrival).withColumn("__us", us)
    # running max over strictly-preceding arrivals via the distributed
    # prefix-max (range repartition on arrival order; max is
    # associative, so the decomposition is exact for any type) — the
    # watermark simulation never collapses to one window task.
    wm = global_prefix_max_exclusive(e, [F.col("__arr").asc()], "__us", "__wm")
    lateness = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(F.col("__wm") - F.col("__us"), F.lit(0)),
    )
    flagged = wm.select(
        "event_type",
        lateness.alias("late_us"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("late_us") > _LATE_THRESHOLD_US).cast("long")
            ).alias("n_late"),
            F.round(
                F.sum((F.col("late_us") > _LATE_THRESHOLD_US).cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("late_frac"),
            F.round(F.max("late_us") / 1000000.0, 6).alias("max_late_sec"),
        )
        .orderBy("event_type")
    )


EVENTS_LATE_SQL = f"""
WITH arr AS (
    SELECT event_type,
           greatest(0, coalesce(
               max(epoch_us(ts)) OVER (
                   ORDER BY md5(CAST(event_id AS VARCHAR))
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - epoch_us(ts), 0)) AS late_us
    FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (late_us > {_LATE_THRESHOLD_US}) AS BIGINT)
           AS n_late,
       round(CAST(count(*) FILTER (late_us > {_LATE_THRESHOLD_US})
                  AS DOUBLE) / count(*), 6) AS late_frac,
       round(max(late_us) / 1000000.0, 6) AS max_late_sec
FROM arr GROUP BY event_type ORDER BY event_type
"""


# -------------------------------------------- contrastive negative pairs

_NEG_ANCHORS = 20
_NEG_K = 5


def _training_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling: for each anchor doc
    (id < 20), pick the 5 cross-source candidates with the smallest
    md5(anchor:candidate) — a uniform-but-reproducible draw with a
    hard negative constraint (different source), the pair-building
    step of embedding/contrastive training. md5 hex strings order
    identically in both engines, so no numeric conversion is needed.
    The anchor side broadcasts; at 100 TB the candidate scan is one
    pass and the per-anchor top-k is a heap, not a sort."""
    d = read_table(spark, sf_dir, "documents")
    anchors = d.filter(F.col("doc_id") < _NEG_ANCHORS).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("anchor_source"),
    )
    cands = d.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    h = F.md5(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit(":"),
            F.col("neg_id").cast("string"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("h")
    return (
        F.broadcast(anchors)
        .crossJoin(cands)
        .filter(F.col("anchor_source") != F.col("neg_source"))
        .withColumn("h", h)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _NEG_K)
        .select("anchor_id", "neg_id", "rank")
        .orderBy("anchor_id", "rank")
    )


TRAINING_NEG_SQL = f"""
WITH a AS (
    SELECT doc_id AS anchor_id, source AS anchor_source FROM documents
    WHERE doc_id < {_NEG_ANCHORS}),
pairs AS (
    SELECT anchor_id, d.doc_id AS neg_id,
           md5(CAST(anchor_id AS VARCHAR) || ':'
               || CAST(d.doc_id AS VARCHAR)) AS h
    FROM a JOIN documents d ON d.source != a.anchor_source),
r AS (
    SELECT anchor_id, neg_id,
           row_number() OVER (PARTITION BY anchor_id ORDER BY h) AS rank
    FROM pairs)
SELECT anchor_id, neg_id, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {_NEG_K} ORDER BY anchor_id, rank
"""


# ----------------------------------------------- Merkle-bucket table diff

_MERKLE_CUT = "1995-06-01"


def _diff_merkle_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-digest diff of two table versions ('new' shifts the
    totals of keys % 97 == 0 — scattered in-place updates, the
    discriminating case; inserts are trivially visible in row counts):
    every row hashes to md5(key:value-cents); rows group into 256
    buckets by the first two hex chars of md5(key); each side's bucket
    digest is the md5 of the ','-joined row hashes sorted by key.
    Output: only buckets whose digests differ, with both row counts.
    This is how 100 TB tables are compared — exchange 256 digests,
    recurse into the handful of unequal buckets (``diff_snapshots`` is
    that recursion's leaf), instead of full-outer-joining two full
    tables that mostly agree."""
    o = read_table(spark, sf_dir, "orders")
    cut = F.lit(_MERKLE_CUT)

    def digest(df: DataFrame, val_col: str) -> DataFrame:
        rh = F.md5(
            F.concat(
                F.col("key").cast("string"),
                F.lit(":"),
                F.col(val_col).cast("string"),
            )
        )
        bucket = F.substring(F.md5(F.col("key").cast("string")), 1, 2)
        rows = df.select(
            bucket.alias("bucket"), F.col("key"), rh.alias("rh")
        )
        return rows.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("key"), F.col("rh")))
                        ),
                        lambda x: x["rh"],
                    ),
                    ",",
                )
            ).alias("digest"),
        )

    old = o.filter(F.col("o_orderdate") < cut).select(
        F.col("o_orderkey").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    new = o.filter(F.col("o_orderdate") < cut).select(
        F.col("o_orderkey").alias("key"),
        F.round(
            F.when(
                F.col("o_orderkey") % 97 == 0,
                F.col("o_totalprice") + 10.0,
            ).otherwise(F.col("o_totalprice"))
            * 100
        )
        .cast("long")
        .alias("cents"),
    )
    do = digest(old, "cents").select(
        "bucket",
        F.col("n_rows").alias("n_old"),
        F.col("digest").alias("old_digest"),
    )
    dn = digest(new, "cents").select(
        "bucket",
        F.col("n_rows").alias("n_new"),
        F.col("digest").alias("new_digest"),
    )
    return (
        do.join(dn, "bucket", "full_outer")
        .filter(
            F.col("old_digest").isNull()
            | F.col("new_digest").isNull()
            | (F.col("old_digest") != F.col("new_digest"))
        )
        .select(
            "bucket",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .orderBy("bucket")
    )


DIFF_MERKLE_SQL = f"""
WITH old AS (
    SELECT o_orderkey AS key,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '{_MERKLE_CUT}'),
new AS (
    SELECT o_orderkey AS key,
           CAST(round(CASE WHEN o_orderkey % 97 = 0
                           THEN o_totalprice + 10.0
                           ELSE o_totalprice END * 100, 0) AS BIGINT)
               AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '{_MERKLE_CUT}'),
do_ AS (
    SELECT substr(md5(CAST(key AS VARCHAR)), 1, 2) AS bucket,
           count(*) AS n_old,
           md5(string_agg(md5(CAST(key AS VARCHAR) || ':'
                              || CAST(cents AS VARCHAR)), ','
                          ORDER BY key)) AS old_digest
    FROM old GROUP BY 1),
dn AS (
    SELECT substr(md5(CAST(key AS VARCHAR)), 1, 2) AS bucket,
           count(*) AS n_new,
           md5(string_agg(md5(CAST(key AS VARCHAR) || ':'
                              || CAST(cents AS VARCHAR)), ','
                          ORDER BY key)) AS new_digest
    FROM new GROUP BY 1)
SELECT coalesce(do_.bucket, dn.bucket) AS bucket,
       CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new
FROM do_ FULL OUTER JOIN dn ON do_.bucket = dn.bucket
WHERE old_digest IS NULL OR new_digest IS NULL
   OR old_digest != new_digest
ORDER BY bucket
"""


QUERIES: dict[str, QuerySpec] = {
    "parts_skyline_2d": QuerySpec(_parts_skyline_2d, PARTS_SKYLINE_SQL),
    "orders_prorate_cents": QuerySpec(
        _orders_prorate_cents, ORDERS_PRORATE_SQL
    ),
    "events_trend_slope": QuerySpec(_events_trend_slope, EVENTS_TREND_SQL),
    "layout_compaction_bins": QuerySpec(
        _layout_compaction_bins, LAYOUT_COMPACTION_SQL
    ),
    "events_late_arrivals": QuerySpec(_events_late_arrivals, EVENTS_LATE_SQL),
    "training_negative_pairs": QuerySpec(
        _training_negative_pairs, TRAINING_NEG_SQL
    ),
    "diff_merkle_buckets": QuerySpec(_diff_merkle_buckets, DIFF_MERKLE_SQL),
}
