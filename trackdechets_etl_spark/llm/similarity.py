"""Similarity search over embedding columns (array<float>).

- ``cosine``: JVM-side dot/norms via ``zip_with`` + ``aggregate`` on
  double-cast arrays — no UDF, stays in codegen.
- ``topk_bruteforce``: exact top-k for a (small) query set via
  broadcast-join + window rank. This is the baseline: O(queries × corpus).
- ``lsh_bucket_topk``: random-hyperplane LSH — deterministic ±1
  hyperplanes derived from md5 in *Python at plan-build time* (so the
  exact same literals appear in the Spark plan and the DuckDB oracle),
  sign-pattern bucket per vector, then top-k within the query's bucket
  only. The scale path: the corpus is scanned once to bucket, and each
  query probes ~corpus/2^planes vectors.

At 100 TB the corpus side is partitioned by bucket (write-time layout),
so a probe touches one partition — the IVF idea expressed as parquet
partitioning + partition pruning rather than a custom index.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 4


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    da, db = as_double(a), as_double(b)
    return dot(da, db) / (F.sqrt(dot(da, da)) * F.sqrt(dot(db, db)))


def hyperplane(plane: int, dims: int) -> list[float]:
    """Deterministic ±1 hyperplane: component d is +1 iff the first hex
    nibble of md5('{plane}:{d}') > 7. Computed driver-side with hashlib
    so the identical literal vector can be embedded in oracle SQL."""
    return [
        1.0 if int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[0], 16) > 7 else -1.0
        for d in range(dims)
    ]


def bucket_expr(emb: Column, dims: int, n_planes: int = N_PLANES) -> Column:
    """LSH bucket id: sum of 2^p over planes whose dot product is > 0."""
    emb_d = as_double(emb)
    bucket = None
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in hyperplane(p, dims)])
        term = F.when(dot(emb_d, w) > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("int")


def topk_bruteforce(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_max: int,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every vector with id <
    ``query_ids_max``. The query side is tiny → broadcast; the corpus is
    scanned once. Rank key is (cos rounded to 9dp desc, id asc) for
    engine-stable ordering."""
    # Norms are projected once per SIDE (r14, the near_dup_pairs_bucketed
    # rule): cosine() would recompute sqrt(dot(v,v)) for both vectors on
    # every (query, candidate) pair — queries×corpus pairs — when the
    # corpus norm is a per-row quantity computable in the single corpus
    # scan. Same expression shape and fold order as cosine() →
    # bit-identical output (pinned by the sf0.01/0.1 oracle compare and
    # the partition/strategy invariance gates).
    q = emb.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(dot(as_double(F.col(vec_col)), as_double(F.col(vec_col)))).alias(
            "__qn"
        ),
    )
    c = emb.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(dot(as_double(F.col(vec_col)), as_double(F.col(vec_col)))).alias(
            "__cn"
        ),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (
                dot(as_double(F.col("q_vec")), as_double(F.col("c_vec")))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.round(F.col("cos"), 9).desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def lsh_bucket_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    query_ids_max: int,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Same rank key as the exact variant."""
    # Per-side norm projection (r14) — see topk_bruteforce.
    bucketed = emb.select(
        F.col(id_col),
        F.col(vec_col),
        bucket_expr(F.col(vec_col), dims).alias("bucket"),
        F.sqrt(dot(as_double(F.col(vec_col)), as_double(F.col(vec_col)))).alias(
            "__n"
        ),
    )
    q = bucketed.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        "bucket",
        F.col("__n").alias("__qn"),
    )
    c = bucketed.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        "bucket",
        F.col("__n").alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (
                dot(as_double(F.col("q_vec")), as_double(F.col("c_vec")))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.round(F.col("cos"), 9).desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def label_centroids(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-label centroid via ``applyInPandas`` (grouped-map) — the IVF
    coarse-quantizer build step, and the engine's demonstration of the
    sanctioned Python path for custom numeric group operators: Arrow
    batches, one pandas frame per group, numpy inside.

    Rows are summed in ``id_col`` order (sorted inside the group) so the
    float result is deterministic regardless of shuffle arrival order —
    required for the value-hash oracle, and good hygiene anyway.
    """
    import functools

    import numpy as np
    import pandas as pd

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        arrays = [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        total = functools.reduce(np.add, arrays)  # sequential, ordered
        c = np.round(total / len(arrays), round_to)
        return pd.DataFrame(
            {
                label_col: [pdf[label_col].iloc[0]],
                "n_vectors": [len(arrays)],
                "centroid": [c.tolist()],
            }
        )

    return emb.groupBy(label_col).applyInPandas(
        centroid,
        schema=f"{label_col} int, n_vectors long, centroid array<double>",
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    query_ids_max: int,
    k: int = 5,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k with ``nprobe=1``:

    1. coarse quantizer: one centroid per ``label_col`` partition
       (``label_centroids`` — the IVF list assignment is given by the
       label here; a production build would k-means its own lists);
    2. route each query to its nearest centroid by cosine (centroid set
       is tiny → broadcast, rank key rounded to 9dp with label-asc
       tie-break for engine-stable argmax);
    3. scan ONLY that list for candidates and rank top-k with the same
       key as the exact variant.

    At 100 TB the corpus is written partitioned by list id, so step 3 is
    partition pruning — each query reads corpus/n_lists, not the corpus.
    """
    cents = label_centroids(emb, id_col, vec_col, label_col).select(
        F.col(label_col).alias("__list"), F.col("centroid")
    )
    # Per-side norm projection (r14) — see topk_bruteforce. The query
    # norm rides through the routing window; the candidate norm is
    # computed once per corpus row in the list scan.
    q = emb.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(dot(as_double(F.col(vec_col)), as_double(F.col(vec_col)))).alias(
            "__qn"
        ),
    )
    routed = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "q_vec",
            "__qn",
            "__list",
            cosine(F.col("q_vec"), F.col("centroid")).alias("__rcos"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.round(F.col("__rcos"), 9).desc(), F.col("__list").asc()
    )
    assigned = (
        routed.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
        .select("q_id", "q_vec", "__qn", "__list")
    )
    c = emb.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("__list"),
        F.sqrt(dot(as_double(F.col(vec_col)), as_double(F.col(vec_col)))).alias(
            "__cn"
        ),
    )
    scored = (
        F.broadcast(assigned)
        .join(c, "__list")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (
                dot(as_double(F.col("q_vec")), as_double(F.col("c_vec")))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.round(F.col("cos"), 9).desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def near_dup_pairs_bucketed(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    threshold: float,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Production embedding near-dup: LSH-bucket first (one hash table
    of ``n_planes`` random hyperplanes), exact-cosine verify within
    buckets only. Candidate volume is O(Σ_b |bucket_b|²) ≈ N²/2^planes
    for balanced buckets instead of N² — and the bucket self-join is a
    plain shuffle equi-join, so Spark parallelizes per bucket. At real
    scale ``n_planes`` grows with the corpus (buckets ≈ N/constant) and
    the corpus is written partitioned by bucket so the join prunes to
    one partition per bucket; recall vs the exact form is measured by
    the sampled all-pairs eval twin (``near_dup_pairs``) and the
    ``sim_recall_curve_nplanes`` query."""
    # The norm is projected once per SIDE, not evaluated per pair:
    # cosine() would recompute sqrt(dot(v,v)) for both vectors on every
    # candidate pair, and pair volume here scales as N²/2^planes — at
    # corpus scale the redundant norms are 2/3 of the verify
    # arithmetic. Same fold order and expression shape as cosine() →
    # bit-identical (pinned at sf0.01 + sf0.1; A/B best-of-4 at sf0.1:
    # 0.94 → 0.81 s even at this SF).
    bk = emb.select(
        F.col(id_col),
        F.col(vec_col),
        bucket_expr(F.col(vec_col), dims, n_planes).alias("bucket"),
    ).withColumn(
        "__n",
        F.sqrt(dot(as_double(F.col(vec_col)), as_double(F.col(vec_col)))),
    )
    a = bk.select(
        "bucket",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col("__n").alias("na"),
    )
    b = bk.select(
        "bucket",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col("__n").alias("nb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(as_double(F.col("vec_a")), as_double(F.col("vec_b")))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def near_dup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    sample_mod: int | None = None,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs above a threshold —
    the recall-eval twin of ``near_dup_pairs_bucketed`` (which is the
    production registry shape). ``sample_mod`` restricts the left side
    to ids ≡ 0 (mod m) to bound the cross join; this form exists to
    measure the bucketed form's recall, not to run on a full corpus."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    if sample_mod:
        a = a.filter(F.col("id_a") % sample_mod == 0)
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
