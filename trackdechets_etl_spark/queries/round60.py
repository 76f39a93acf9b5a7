"""Round-9 additions, fifth batch: distribution monitoring, categorical
association, trend testing, a Pareto frontier, and the canonical
at-scale confidence-interval technique.

- ``orders_psi_price_drift``: Population Stability Index between the
  early (< 1998-05-01) and late order eras over ten fixed-width price
  bins — the standard production-ML drift monitor (PSI > 0.2 = shift).
  Laplace-smoothed per-bin shares so empty bins never divide by zero;
  one scan, one tiny groupBy.
- ``events_mutual_information``: mutual information (nats) between
  ``event_type`` and the 6-hour time-of-day bucket, decomposed per
  event type — the feature-relevance companion to the chi² independence
  test (round50): MI measures *how much* knowing the hour tells you
  about the event mix, not just whether they are dependent.
- ``lineitem_cramers_v``: Cramér's V effect size for the
  returnflag × linestatus contingency table. The chi² statistic alone
  grows linearly with n (at 100 TB everything is "significant"); V
  normalizes to [0, 1] so the effect size is scale-invariant.
- ``events_mann_kendall_trend``: Mann–Kendall trend test on the daily
  purchase-count series — the non-parametric "is this metric drifting"
  test (no linearity or normality assumption), with the exact
  tie-corrected variance kept as the integer ``var_s_x18`` (×18
  numerator) and the continuity-corrected z. Companion to
  ``lineitem_theil_sen`` (round56): MK decides *whether* there is a
  monotone trend, Theil–Sen estimates its slope.
- ``part_skyline_2d``: the SCALE-path twin of round8's
  ``parts_skyline_2d`` (same Pareto frontier — maximize ``p_size``,
  minimize price — over the same table): round8 sweeps one globally
  sorted single-partition window (allowlisted; the textbook O(n log n)
  sweep), this rewrite is sort-free by exploiting the bounded
  attribute domain: per-size minimum price (≤50 groups, map-side
  combined) then a strictly-larger-size prefix minimum on that tiny
  frame via broadcast self-join. A part is on the frontier iff it hits
  its size's minimum and beats every larger size's minimum — no
  global sort, no single-partition window, no allowlist entry.
- ``orders_poisson_bootstrap_ci``: the Poisson bootstrap — THE way to
  put a confidence interval on a statistic of a 100 TB table without
  resampling it: each row contributes a Poisson(1) weight per
  replicate, drawn deterministically via exact integer thresholds
  (floor(CDF·2³²)) on a hash uniform, so every engine and every retry
  produces the identical replicate means. Each md5 digest is milked
  for FOUR independent 8-hex uniforms (replicate b reads offset
  (b%4)·8 of md5(key:b//4)) — 6 hashes per row, not 24 — and the
  thresholds are compared as fixed-width lowercase HEX STRINGS
  (lexicographic ≡ numeric), so neither engine ever converts hex to
  int. The ×24 expansion is two generators over a 2-column frame
  feeding a map-side-combined 24-group aggregate. The spread of the
  replicate means IS the sampling distribution of the mean order
  price.

Reference provenance: none of these exist in the reference's 539-line
pandas surface (dags/icpe-siretisation.py, dags/publish-open-data.py);
they extend the driver-mandated LLM/analytics surface. Scale notes in
docs/SCALE.md §round-9 fifth batch; invariant tests in
tests/test_round60.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# --------------------------------------------------- PSI price drift

_PSI_SPLIT = "1998-05-01"
_PSI_BIN_CENTS = 5_000_000  # 50 000 currency units per bin
_PSI_NBINS = 10


def _orders_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        F.least(
            (
                (
                    F.round(F.col("o_totalprice") * 100).cast("long")
                    - F.round(F.col("o_totalprice") * 100).cast("long")
                    % _PSI_BIN_CENTS
                )
                / _PSI_BIN_CENTS
            ).cast("long"),
            F.lit(_PSI_NBINS - 1),
        ).alias("bin"),
        F.when(
            F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_a"),
    )
    bins = o.groupBy("bin").agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n_b"),
    )
    tot = bins.agg(
        F.sum("n_a").cast("long").alias("t_a"),
        F.sum("n_b").cast("long").alias("t_b"),
    )
    j = bins.crossJoin(F.broadcast(tot))
    pa = (F.col("n_a") + 1) / (F.col("t_a") + _PSI_NBINS)
    pb = (F.col("n_b") + 1) / (F.col("t_b") + _PSI_NBINS)
    return j.select(
        "bin",
        "n_a",
        "n_b",
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    ).orderBy("bin")


PSI_SQL = f"""
WITH o AS (
    SELECT least(CAST((CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       - CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         % {_PSI_BIN_CENTS}) / {_PSI_BIN_CENTS} AS BIGINT),
                 {_PSI_NBINS - 1}) AS bin,
           CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END
               AS is_a
    FROM orders),
bins AS (
    SELECT bin, CAST(sum(is_a) AS BIGINT) AS n_a,
           CAST(sum(1 - is_a) AS BIGINT) AS n_b
    FROM o GROUP BY bin),
tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
               CAST(sum(n_b) AS BIGINT) AS t_b FROM bins)
SELECT bin, n_a, n_b,
       round(((n_a + 1.0) / (t_a + {_PSI_NBINS})
              - (n_b + 1.0) / (t_b + {_PSI_NBINS}))
             * ln(((n_a + 1.0) / (t_a + {_PSI_NBINS}))
                  / ((n_b + 1.0) / (t_b + {_PSI_NBINS}))), 6) AS psi_term
FROM bins, tot
ORDER BY bin
"""


# --------------------------------------------- mutual information

def _events_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("x"),
        (
            (F.hour("ts") - F.hour("ts") % 6) / 6
        ).cast("long").alias("y"),
    )
    cells = ev.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nxy"))
    mx = cells.groupBy("x").agg(F.sum("nxy").cast("long").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").cast("long").alias("ny"))
    tot = cells.agg(F.sum("nxy").cast("long").alias("n"))
    j = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    term = (F.col("nxy") / F.col("n")) * F.log(
        (F.col("nxy") * F.col("n")) / (F.col("nx") * F.col("ny"))
    )
    return (
        j.groupBy("x")
        .agg(
            F.first("nx").cast("long").alias("n_x"),
            F.round(F.sum(term), 6).alias("mi_part"),
        )
        .select(F.col("x").alias("event_type"), "n_x", "mi_part")
        .orderBy("event_type")
    )


MI_SQL = """
WITH ev AS (
    SELECT event_type AS x,
           CAST((hour(ts) - hour(ts) % 6) / 6 AS BIGINT) AS y
    FROM events),
cells AS (SELECT x, y, count(*) AS nxy FROM ev GROUP BY x, y),
mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY x),
my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY y),
tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells)
SELECT cells.x AS event_type, min(nx) AS n_x,
       round(sum((nxy * 1.0 / n)
                 * ln((nxy * 1.0 * n) / (nx * 1.0 * ny))), 6) AS mi_part
FROM cells
JOIN mx ON cells.x = mx.x
JOIN my ON cells.y = my.y
CROSS JOIN tot
GROUP BY cells.x
ORDER BY event_type
"""


# ------------------------------------------------------ Cramér's V

def _lineitem_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    )
    cells = li.groupBy("rf", "ls").agg(F.count(F.lit(1)).alias("nxy"))
    rt = cells.groupBy("rf").agg(F.sum("nxy").cast("long").alias("nr"))
    ct = cells.groupBy("ls").agg(F.sum("nxy").cast("long").alias("nc"))
    tot = cells.agg(
        F.sum("nxy").cast("long").alias("n"),
        F.countDistinct("rf").cast("long").alias("r"),
        F.countDistinct("ls").cast("long").alias("c"),
    )
    j = (
        cells.join(F.broadcast(rt), "rf")
        .join(F.broadcast(ct), "ls")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("nr") * F.col("nc") / F.col("n")
    chi2 = F.sum((F.col("nxy") - e) * (F.col("nxy") - e) / e)
    return j.groupBy().agg(
        F.first("n").alias("n"),
        F.first("r").alias("r"),
        F.first("c").alias("c"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.first("n")
                    * (F.least(F.first("r"), F.first("c")) - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


CRAMERS_SQL = """
WITH li AS (SELECT l_returnflag AS rf, l_linestatus AS ls FROM lineitem),
cells AS (SELECT rf, ls, count(*) AS nxy FROM li GROUP BY rf, ls),
rt AS (SELECT rf, CAST(sum(nxy) AS BIGINT) AS nr FROM cells GROUP BY rf),
ct AS (SELECT ls, CAST(sum(nxy) AS BIGINT) AS nc FROM cells GROUP BY ls),
tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n,
               CAST(count(DISTINCT rf) AS BIGINT) AS r,
               CAST(count(DISTINCT ls) AS BIGINT) AS c FROM cells)
SELECT min(n) AS n, min(r) AS r, min(c) AS c,
       round(sum((nxy - nr * nc * 1.0 / n) * (nxy - nr * nc * 1.0 / n)
                 / (nr * nc * 1.0 / n)), 4) AS chi2,
       round(sqrt(sum((nxy - nr * nc * 1.0 / n) * (nxy - nr * nc * 1.0 / n)
                      / (nr * nc * 1.0 / n))
                  / (min(n) * (least(min(r), min(c)) - 1))), 6) AS cramers_v
FROM cells
JOIN rt ON cells.rf = rt.rf
JOIN ct ON cells.ls = ct.ls
CROSS JOIN tot
"""


# -------------------------------------------- Mann–Kendall trend

def _events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    d1 = daily.select(F.col("day").alias("d1"), F.col("cnt").alias("c1"))
    d2 = daily.select(F.col("day").alias("d2"), F.col("cnt").alias("c2"))
    # pairwise sign sum: the day grid is calendar-bounded (it grows
    # with elapsed time, not with data volume), so the broadcast
    # self-join is O(days²) pairs regardless of SF.
    s = (
        d1.join(F.broadcast(d2), F.col("d1") < F.col("d2"))
        .agg(
            F.sum(F.signum(F.col("c2") - F.col("c1")))
            .cast("long")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    j = s.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(n))
    var18 = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    s_adj = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    return j.select(
        "n_days",
        "s",
        var18.cast("long").alias("var_s_x18"),
        F.round(s_adj / F.sqrt(var18 / 18.0), 6).alias("z"),
    )


MK_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
s AS (
    SELECT CAST(sum(sign(d2.cnt - d1.cnt)) AS BIGINT) AS s
    FROM daily d1 JOIN daily d2 ON d1.day < d2.day),
ties AS (
    SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
    FROM (SELECT cnt, count(*) AS t FROM daily GROUP BY cnt)),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT n_days, s,
       CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)
           AS var_s_x18,
       round((CASE WHEN s > 0 THEN s - 1
                   WHEN s < 0 THEN s + 1 ELSE 0 END)
             / sqrt((n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)
                    / 18.0), 6) AS z
FROM s, ties, n
"""


# ------------------------------------------------- 2-D skyline

def _part_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    per_size = p.groupBy("p_size").agg(
        F.min("price_cents").alias("mn")
    )
    # prefix min over STRICTLY larger sizes, on the ≤|size domain|-row
    # frame (TPC-H sizes are 1..50): broadcast self-join, no sort.
    a = per_size.select(F.col("p_size").alias("sz"), F.col("mn").alias("mn_s"))
    b = per_size.select(
        F.col("p_size").alias("sz_hi"), F.col("mn").alias("mn_hi")
    )
    pref = (
        a.join(F.broadcast(b), F.col("sz_hi") > F.col("sz"), "left")
        .groupBy("sz", "mn_s")
        .agg(F.min("mn_hi").alias("runmin"))
    )
    return (
        p.join(
            F.broadcast(pref),
            (p.p_size == F.col("sz")) & (p.price_cents == F.col("mn_s")),
        )
        .filter(F.col("runmin").isNull() | (F.col("price_cents") < F.col("runmin")))
        .select("p_partkey", "p_size", "price_cents")
        .orderBy(F.desc("p_size"), "p_partkey")
    )


SKYLINE_SQL = """
WITH p AS (
    SELECT p_partkey, p_size,
           CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents
    FROM part),
per_size AS (SELECT p_size AS sz, min(price_cents) AS mn_s
             FROM p GROUP BY p_size),
pref AS (
    SELECT a.sz, a.mn_s, min(b.mn_s) AS runmin
    FROM per_size a LEFT JOIN per_size b ON b.sz > a.sz
    GROUP BY a.sz, a.mn_s)
SELECT p_partkey, p_size, price_cents
FROM p JOIN pref ON p.p_size = pref.sz AND p.price_cents = pref.mn_s
WHERE runmin IS NULL OR price_cents < runmin
ORDER BY p_size DESC, p_partkey
"""


# ------------------------------------------- Poisson bootstrap CI

_BOOT_B = 24
# floor(CDF_Poisson(1)(k) * 2^32) for k = 0..6; weight 7 beyond.
_BOOT_T = [
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
]
assert _BOOT_T == [
    math.floor(s * 2**32)
    for s in [
        sum(math.exp(-1.0) / math.factorial(i) for i in range(k + 1))
        for k in range(7)
    ]
]

# Same thresholds as 8-char lowercase hex strings: a fixed-width
# lowercase hex comparison is EXACTLY the numeric comparison, so both
# engines test the raw md5 slice against string literals — no hex→int
# conversion at all.
_BOOT_T_HEX = [format(t, "08x") for t in _BOOT_T]
assert all(int(h, 16) == t for h, t in zip(_BOOT_T_HEX, _BOOT_T))


def _orders_poisson_bootstrap_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # One md5 per 4 replicates: the ×6 block explode carries the hash,
    # then each digest is sliced into four 8-hex uniforms (codegen CSE
    # evaluates the shared md5 subtree once per block row).
    blocks = o.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B // 4 - 1))).alias("blk"),
        F.col("o_orderkey").cast("string").alias("key"),
    ).select(
        "cents",
        "blk",
        F.md5(F.concat_ws(":", "key", F.col("blk").cast("string"))).alias("d"),
    )
    pairs = blocks.select(
        "cents",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("blk") * 4 + i).alias("b"),
                        F.substring("d", i * 8 + 1, 8).alias("hx"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("r"),
    ).select("cents", F.col("r.b").alias("b"), F.col("r.hx").alias("hx"))
    w = sum((F.col("hx") >= F.lit(t)).cast("int") for t in _BOOT_T_HEX)
    return (
        pairs.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.round(
                F.sum(F.col("w") * F.col("cents")) / (100.0 * F.sum("w")), 4
            ).alias("mean_price"),
        )
        .select(F.col("b").cast("long").alias("b"), "n_eff", "mean_price")
        .orderBy("b")
    )


_BOOT_W_SQL = " + ".join(
    f"(CASE WHEN hx >= '{t}' THEN 1 ELSE 0 END)" for t in _BOOT_T_HEX
)

BOOTSTRAP_SQL = f"""
WITH o AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders),
blocks AS (
    SELECT cents, blk,
           md5(concat(CAST(o_orderkey AS VARCHAR), ':',
                      CAST(blk AS VARCHAR))) AS d
    FROM o CROSS JOIN (SELECT unnest(range({_BOOT_B // 4})) AS blk)),
pairs AS (
    SELECT cents, blk * 4 + i AS b, substr(d, i * 8 + 1, 8) AS hx
    FROM blocks CROSS JOIN (SELECT unnest(range(4)) AS i))
SELECT CAST(b AS BIGINT) AS b,
       CAST(sum({_BOOT_W_SQL}) AS BIGINT) AS n_eff,
       round(sum(({_BOOT_W_SQL}) * cents)
             / (100.0 * sum({_BOOT_W_SQL})), 4) AS mean_price
FROM pairs GROUP BY b ORDER BY b
"""


QUERIES: dict[str, QuerySpec] = {
    "orders_psi_price_drift": QuerySpec(_orders_psi_price_drift, PSI_SQL),
    "events_mutual_information": QuerySpec(
        _events_mutual_information, MI_SQL
    ),
    "lineitem_cramers_v": QuerySpec(_lineitem_cramers_v, CRAMERS_SQL),
    "events_mann_kendall_trend": QuerySpec(
        _events_mann_kendall_trend, MK_SQL
    ),
    "part_skyline_2d": QuerySpec(_part_skyline_2d, SKYLINE_SQL),
    "orders_poisson_bootstrap_ci": QuerySpec(
        _orders_poisson_bootstrap_ci, BOOTSTRAP_SQL
    ),
}
