"""Core parity queries — one per operator row of SURVEY §2, expressed on
the driver's synthetic tables via the deterministic fixture views
(plans/fixtures.py). Each Spark query has a DuckDB oracle with identical
semantics; null-propagation parity notes are inline (DuckDB ``concat``
skips nulls, so oracles use ``||`` which null-propagates like Spark's
``concat`` — SURVEY C1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.functions.decode import (
    FAMILLE_IC_LABELS,
    REGIME_LABELS,
    SEVESO_LABELS,
    decode_case_sql,
    decode_dict,
)
from trackdechets_etl_spark.functions.predicates import (
    in_either_list,
    length_is,
    null_or_short,
    prefix_match,
)
from trackdechets_etl_spark.functions.scalar import (
    backfill_if_invalid,
    concat_null_to_empty,
    conditional_overwrite,
    lpad_code,
    prefix_zero,
    regexp_extract_null,
)
from trackdechets_etl_spark.operators.dedup import dedup_by_key, keep_last_by
from trackdechets_etl_spark.operators.joins import enrich_left, existence_flag
from trackdechets_etl_spark.operators.stats import coverage_stats
from trackdechets_etl_spark.plans import fixtures as FX
from trackdechets_etl_spark.plans.flagship import (
    REVENUE_BY_NATION_SQL,
    revenue_by_nation,
)
from trackdechets_etl_spark.plans.icpe_siretisation import (
    SIRETISATION_ENRICHED_SQL,
    SIRETISATION_STATS_PRE_SQL,
    SIRETISATION_STATS_SQL,
    RUBRIQUES_CHAIN_SQL,
    rubriques_chain,
    siretisation_enriched,
    siretisation_stats,
    siretisation_stats_pre,
)
from trackdechets_etl_spark.plans.publish_open_data import (
    OPEN_DATA_SQL,
    open_data_pipeline,
)
from trackdechets_etl_spark.queries import QuerySpec

# All fixture views as a WITH-clause preamble for oracle statements.
FIX = (
    f"WITH etab AS ({FX.ETAB_SQL}), inst AS ({FX.INSTALLATIONS_SQL}), "
    f"rubr AS ({FX.RUBRIQUES_SQL}), comp AS ({FX.COMPANY_SQL}), "
    f"gerep AS ({FX.GEREP_SQL}), odc AS ({FX.OPEN_DATA_COMPANY_SQL})"
)

IN_LIST_RUBRIQUES = ["2710", "2712"]
IN_LIST_ALINEAS = ["2718_1", "2730_1"]


# ------------------------------------------------------------------ P: filters


def _filter_valid_siret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: exact-length equality filter (valid 14-char SIRET,
    reference dags/icpe-siretisation.py:241)."""
    etab = FX.etablissements(spark, sf_dir)
    return etab.filter(length_is(F.col("siret"), 14)).select("code_s3ic", "siret")


def _filter_null_or_short(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: null-or-short predicate (reference dags/icpe-siretisation.py:340)."""
    etab = FX.etablissements(spark, sf_dir)
    return etab.filter(null_or_short(F.col("siret"), 14)).select(
        "code_s3ic", "siret", "famille_ic"
    )


def _filter_prefix_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P7: prefix predicate OR dual IN-list membership (reference
    dags/icpe-siretisation.py:310,332-334; corrected-list semantics per
    SURVEY §2.9.4)."""
    rubr = FX.rubriques(spark, sf_dir)
    ra = concat_null_to_empty(F.col("rubrique_ic"), F.col("alinea"))
    rubr = rubr.withColumn("rubrique_alinea", ra)
    keep = prefix_match(F.col("rubrique_ic"), "271") | in_either_list(
        F.col("rubrique_ic"),
        IN_LIST_RUBRIQUES,
        F.col("rubrique_alinea"),
        IN_LIST_ALINEAS,
    )
    return rubr.filter(keep).select("id", "rubrique_ic", "alinea", "rubrique_alinea")


# ------------------------------------------------------------ C: scalar exprs


def _scalar_concat_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: null-propagating concat then null→'' (reference
    dags/icpe-siretisation.py:153-154)."""
    rubr = FX.rubriques(spark, sf_dir)
    return rubr.select(
        "id",
        concat_null_to_empty(F.col("rubrique_ic"), F.col("alinea")).alias(
            "rubrique_alinea"
        ),
    )


def _scalar_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: regexp extract with pandas no-match→null semantics
    (reference dags/icpe-siretisation.py:236)."""
    odc = FX.open_data_company(spark, sf_dir)
    return odc.select(
        "siret",
        regexp_extract_null(F.col("address"), r"(\d{5}) ").alias("code_postal"),
        regexp_extract_null(F.col("nom"), r"(\d{5}) ").alias("no_match_null"),
    )


def _scalar_prefix_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: restore lost leading zero + general lpad normalization
    (reference dags/icpe-siretisation.py:280)."""
    g = FX.gerep(spark, sf_dir)
    return g.select(
        prefix_zero(F.col("code_etablissement")).alias("code_prefixed"),
        lpad_code(F.col("code_etablissement"), 10).alias("code_s3ic"),
        "numero_siret",
        "annee",
    )


def _scalar_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: coalesce-if-invalid backfill (reference
    dags/icpe-siretisation.py:248-250,287-289; §2.9.1 null semantics)."""
    g = FX.gerep(spark, sf_dir)
    cand = lpad_code(F.col("code_etablissement"), 14)
    return g.select(
        "code_etablissement",
        "numero_siret",
        backfill_if_invalid(F.col("numero_siret"), cand).alias("siret_filled"),
    )


def _scalar_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: conditional overwrite (reference dags/publish-open-data.py:45-47)."""
    odc = FX.open_data_company(spark, sf_dir)
    new_status = conditional_overwrite(
        F.col("verification_status"),
        F.col("company_types") == "AUTOMOBILE",
        F.lit("VERIFIED"),
    )
    return odc.select("siret", "company_types", new_status.alias("status"))


def _scalar_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 dictionary-decode ×3 with unknown→'' / null→null semantics
    (reference dags/icpe-siretisation.py:177-216)."""
    etab = FX.etablissements(spark, sf_dir)
    return etab.select(
        "code_s3ic",
        "famille_ic",
        decode_dict(F.col("famille_ic"), FAMILLE_IC_LABELS).alias("famille_label"),
        decode_dict(F.col("regime"), REGIME_LABELS).alias("regime_label"),
        decode_dict(F.col("seveso"), SEVESO_LABELS).alias("seveso_label"),
    )


def _revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship variant one level up the dimension hierarchy:
    nation → region rollup (region is 5 rows — broadcast, trivially)."""
    from trackdechets_etl_spark.plans.flagship import revenue_by_nation

    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    per_nation = revenue_by_nation(spark, sf_dir)
    return (
        per_nation.join(F.broadcast(nation.select("n_name", "n_regionkey")), "n_name")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum("revenue"), 2).alias("revenue"),
            F.sum("n_items").alias("n_items"),
        )
    )


def _supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension stats over supplier ⨝ nation: per-nation supplier
    count and average balance."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_balance"),
        )
    )


def _top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with deterministic ranking (revenue desc, key asc) — the
    ORDER BY + LIMIT shape the reference never needed, expressed as a
    rank window so the selected set is engine-stable."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("o_custkey", "revenue", F.col("rank").cast("long").alias("rank"))
    )


def _revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping over the region→nation hierarchy (subtotal and
    grand-total rows carry nulls) — multi-level aggregation in one pass."""
    from trackdechets_etl_spark.plans.flagship import revenue_by_nation

    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    per_nation = (
        revenue_by_nation(spark, sf_dir)
        .join(F.broadcast(nation.select("n_name", "n_regionkey")), "n_name")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return per_nation.rollup("r_name", "n_name").agg(
        F.round(F.sum("revenue"), 2).alias("revenue"),
        F.sum("n_items").alias("n_items"),
    )


def _projection_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: explicit projection then column drop (reference
    dags/icpe-siretisation.py:93-94,133,141 and :258,276,295 — manual
    usecols/drop; Catalyst prunes the parquet scan to the two surviving
    columns, visible as ReadSchema in explain)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_mktsegment").drop("c_mktsegment")


def _scalar_cast_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7/C8: timestamp→date cast in-query (reference
    dags/publish-open-data.py:27 does it in source SQL) plus date-part
    extraction used by the keep-last-by-year chain."""
    o = FX.installations(spark, sf_dir)
    return o.select(
        "inst_id",
        F.col("date_debut_exploitation").cast("date").alias("date_debut"),
        F.year("date_debut_exploitation").cast("long").alias("annee"),
    )


# ---------------------------------------------------------------- J: joins


def _join_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact ⟕ broadcast dim on code_s3ic (reference
    dags/icpe-siretisation.py:175)."""
    inst = FX.installations(spark, sf_dir)
    etab = FX.etablissements(spark, sf_dir).select("code_s3ic", "nom_ets", "siret")
    return enrich_left(inst, etab, "code_s3ic").select(
        "inst_id", "code_s3ic", "nom_ets", "siret"
    )


def _join_name_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: many-to-many name-equality join, faithful fanout (reference
    dags/icpe-siretisation.py:243-246; SURVEY §2.9.3)."""
    etab = FX.etablissements(spark, sf_dir).select("code_s3ic", "nom_ets", "siret")
    comp = FX.company(spark, sf_dir)
    j = etab.join(comp, etab.nom_ets == comp.nom, "left")
    return j.select("code_s3ic", "nom_ets", "siret", "siret_candidate", "o_orderkey")


def _join_inner_rubriques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: inner join to the nomenclature dim (reference
    dags/icpe-siretisation.py:311)."""
    inst = FX.installations(spark, sf_dir)
    rubr = FX.rubriques(spark, sf_dir)
    j = enrich_left(inst, rubr, inst.id_ref_nomencla == rubr.id, how="inner")
    return j.select("inst_id", "id_ref_nomencla", "rubrique_ic", "alinea")


def _join_existence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left-semi existence flag (reference
    dags/publish-open-data.py:75-79)."""
    odc = FX.open_data_company(spark, sf_dir)
    anon = odc.filter(
        F.col("siret").cast("bigint") % 10 == 0
    ).select("siret")
    return existence_flag(odc, anon, "siret", "non_diffusible").select(
        "siret", "nom", "non_diffusible"
    )


# ------------------------------------------------------------- A: agg / dedup


def _agg_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: keep-last-by-year dedup as an explicit window (reference
    dags/icpe-siretisation.py:275-277; SURVEY §2.9.5)."""
    g = FX.gerep(spark, sf_dir)
    return keep_last_by(
        g, ["code_etablissement"], ["annee", "numero_siret"], descending=True
    )


def _agg_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: deterministic dropDuplicates(subset) — first under explicit
    ascending order (reference dags/icpe-siretisation.py:336,345-346)."""
    g = FX.gerep(spark, sf_dir)
    return dedup_by_key(g, ["code_etablissement"], ["annee", "numero_siret"])


def _agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct counts of valid SIRETs and codes (reference
    dags/icpe-siretisation.py:241,256,283,297)."""
    etab = FX.etablissements(spark, sf_dir)
    valid = F.when(length_is(F.col("siret"), 14), F.col("siret"))
    return etab.agg(
        F.countDistinct(valid).alias("n_unique_valid_sirets"),
        F.countDistinct("code_s3ic").alias("n_codes"),
    )


def _agg_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: row counts across the three main frames (reference .index.size
    call sites, dags/icpe-siretisation.py:337,341,346)."""
    inst = FX.installations(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_inst"))
    etab = FX.etablissements(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_etab"))
    rubr = FX.rubriques(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_rubr"))
    return inst.crossJoin(etab).crossJoin(rubr)


def _agg_coverage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the make_stats coverage block (reference
    dags/icpe-siretisation.py:335-357)."""
    etab = FX.etablissements(spark, sf_dir)
    return coverage_stats(etab, "code_s3ic", "siret")


def _agg_coverage_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A5 at 100 TB: the HLL variant (approx_count_distinct) — one
    pass, mergeable sketch, no distinct shuffle. No SQL oracle (HLL
    estimates are engine-specific); driver records rows-only."""
    etab = FX.etablissements(spark, sf_dir)
    return coverage_stats(etab, "code_s3ic", "siret", approx=True)


# ---------------------------------------------------------------- registry

_STATS_SQL_BODY = """
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN coalesce(length(siret),0) < 14 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
       round(sum(CASE WHEN coalesce(length(siret),0) < 14 THEN 1 ELSE 0 END) / count(*) * 100.0, 6) AS pct_invalid,
       CAST(count(DISTINCT CASE WHEN length(siret) = 14 THEN siret END) AS BIGINT) AS n_unique_valid
FROM (SELECT code_s3ic, max(siret) AS siret FROM etab GROUP BY code_s3ic)
"""

QUERIES: dict[str, QuerySpec] = {
    "flagship_revenue_by_nation": QuerySpec(revenue_by_nation, REVENUE_BY_NATION_SQL),
    "agg_top_customers": QuerySpec(
        _top_customers,
        """SELECT o_custkey, revenue, CAST(rank AS BIGINT) AS rank FROM (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue,
                   row_number() OVER (
                       ORDER BY round(sum(o_totalprice), 2) DESC, o_custkey ASC) AS rank
            FROM orders GROUP BY o_custkey)
        WHERE rank <= 10""",
    ),
    "agg_revenue_rollup": QuerySpec(
        _revenue_rollup,
        f"""WITH per_nation AS ({REVENUE_BY_NATION_SQL}),
        joined AS (
            SELECT r_name, per_nation.n_name AS n_name, revenue, n_items
            FROM per_nation
            JOIN nation USING (n_name)
            JOIN region ON n_regionkey = r_regionkey)
        SELECT r_name, n_name,
               round(sum(revenue), 2) AS revenue,
               CAST(sum(n_items) AS BIGINT) AS n_items
        FROM joined GROUP BY ROLLUP (r_name, n_name)""",
    ),
    "flagship_revenue_by_region": QuerySpec(
        _revenue_by_region,
        f"""WITH per_nation AS ({REVENUE_BY_NATION_SQL})
        SELECT r_name,
               round(sum(revenue), 2) AS revenue,
               CAST(sum(n_items) AS BIGINT) AS n_items
        FROM per_nation
        JOIN nation USING (n_name)
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""",
    ),
    "agg_supplier_balance": QuerySpec(
        _supplier_balance,
        """SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               round(avg(s_acctbal), 4) AS avg_balance
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name""",
    ),
    "projection_drop": QuerySpec(
        _projection_drop, "SELECT c_custkey, c_name FROM customer"
    ),
    "filter_valid_siret": QuerySpec(
        _filter_valid_siret,
        f"{FIX} SELECT code_s3ic, siret FROM etab WHERE length(siret) = 14",
    ),
    "filter_null_or_short": QuerySpec(
        _filter_null_or_short,
        f"{FIX} SELECT code_s3ic, siret, famille_ic FROM etab "
        "WHERE coalesce(length(siret), 0) < 14",
    ),
    "filter_prefix_inlist": QuerySpec(
        _filter_prefix_inlist,
        f"""{FIX}, ra AS (
            SELECT id, rubrique_ic, alinea,
                   coalesce(rubrique_ic || '_' || alinea, '') AS rubrique_alinea
            FROM rubr)
        SELECT id, rubrique_ic, alinea, rubrique_alinea FROM ra
        WHERE rubrique_ic LIKE '271%'
           OR rubrique_ic IN ('2710', '2712')
           OR rubrique_alinea IN ('2718_1', '2730_1')""",
    ),
    "scalar_concat_null_default": QuerySpec(
        _scalar_concat_null,
        f"{FIX} SELECT id, coalesce(rubrique_ic || '_' || alinea, '') AS rubrique_alinea FROM rubr",
    ),
    "scalar_regex_extract": QuerySpec(
        _scalar_regex_extract,
        rf"""{FIX} SELECT siret,
            nullif(regexp_extract(address, '(\d{{5}}) ', 1), '') AS code_postal,
            nullif(regexp_extract(nom, '(\d{{5}}) ', 1), '') AS no_match_null
        FROM odc""",
    ),
    "scalar_prefix_zero": QuerySpec(
        _scalar_prefix_zero,
        f"""{FIX} SELECT '0' || code_etablissement AS code_prefixed,
            lpad(code_etablissement, 10, '0') AS code_s3ic,
            numero_siret, annee FROM gerep""",
    ),
    "scalar_backfill_invalid": QuerySpec(
        _scalar_backfill,
        f"""{FIX} SELECT code_etablissement, numero_siret,
            CASE WHEN coalesce(length(numero_siret),0) <> 14
                      AND coalesce(length(lpad(code_etablissement, 14, '0')),0) = 14
                 THEN lpad(code_etablissement, 14, '0')
                 ELSE numero_siret END AS siret_filled
        FROM gerep""",
    ),
    "scalar_conditional_overwrite": QuerySpec(
        _scalar_overwrite,
        f"""{FIX} SELECT siret, company_types,
            CASE WHEN company_types = 'AUTOMOBILE' THEN 'VERIFIED'
                 ELSE verification_status END AS status
        FROM odc""",
    ),
    "scalar_dict_decode": QuerySpec(
        _scalar_decode,
        f"""{FIX} SELECT code_s3ic, famille_ic,
            {decode_case_sql('famille_ic', FAMILLE_IC_LABELS)} AS famille_label,
            {decode_case_sql('regime', REGIME_LABELS)} AS regime_label,
            {decode_case_sql('seveso', SEVESO_LABELS)} AS seveso_label
        FROM etab""",
    ),
    "scalar_cast_date": QuerySpec(
        _scalar_cast_date,
        f"""{FIX} SELECT inst_id,
            CAST(date_debut_exploitation AS DATE) AS date_debut,
            CAST(year(date_debut_exploitation) AS BIGINT) AS annee
        FROM inst""",
    ),
    "join_left_enrich": QuerySpec(
        _join_left_enrich,
        f"""{FIX} SELECT inst_id, code_s3ic, nom_ets, siret
        FROM inst LEFT JOIN etab USING (code_s3ic)""",
    ),
    "join_name_fanout": QuerySpec(
        _join_name_fanout,
        f"""{FIX} SELECT code_s3ic, nom_ets, siret, siret_candidate, o_orderkey
        FROM etab LEFT JOIN comp ON etab.nom_ets = comp.nom""",
    ),
    "join_inner_rubriques": QuerySpec(
        _join_inner_rubriques,
        f"""{FIX} SELECT inst_id, id_ref_nomencla, rubrique_ic, alinea
        FROM inst JOIN rubr ON inst.id_ref_nomencla = rubr.id""",
    ),
    "join_existence_flag": QuerySpec(
        _join_existence_flag,
        f"""{FIX}, anon AS (
            SELECT DISTINCT siret FROM odc WHERE CAST(siret AS BIGINT) % 10 = 0)
        SELECT odc.siret, nom,
               CASE WHEN anon.siret IS NOT NULL THEN 'oui' END AS non_diffusible
        FROM odc LEFT JOIN anon ON odc.siret = anon.siret""",
    ),
    "agg_keep_last_by_year": QuerySpec(
        _agg_keep_last,
        f"""{FIX} SELECT code_etablissement, numero_siret, annee FROM (
            SELECT *, row_number() OVER (
                PARTITION BY code_etablissement
                ORDER BY annee DESC, numero_siret DESC) AS rn
            FROM gerep) WHERE rn = 1""",
    ),
    "agg_dedup_first_by_key": QuerySpec(
        _agg_dedup_first,
        f"""{FIX} SELECT code_etablissement, numero_siret, annee FROM (
            SELECT *, row_number() OVER (
                PARTITION BY code_etablissement
                ORDER BY annee ASC, numero_siret ASC) AS rn
            FROM gerep) WHERE rn = 1""",
    ),
    "agg_distinct_counts": QuerySpec(
        _agg_distinct_counts,
        f"""{FIX} SELECT
            CAST(count(DISTINCT CASE WHEN length(siret) = 14 THEN siret END) AS BIGINT)
                AS n_unique_valid_sirets,
            CAST(count(DISTINCT code_s3ic) AS BIGINT) AS n_codes
        FROM etab""",
    ),
    "agg_row_counts": QuerySpec(
        _agg_row_counts,
        f"""{FIX} SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM inst) AS n_inst,
            (SELECT CAST(count(*) AS BIGINT) FROM etab) AS n_etab,
            (SELECT CAST(count(*) AS BIGINT) FROM rubr) AS n_rubr""",
    ),
    "agg_coverage_stats": QuerySpec(_agg_coverage_stats, f"{FIX} {_STATS_SQL_BODY}"),
    "agg_coverage_stats_approx": QuerySpec(_agg_coverage_stats_approx, None),
    "pipeline_siretisation_stats_pre": QuerySpec(
        siretisation_stats_pre, SIRETISATION_STATS_PRE_SQL
    ),
    "pipeline_siretisation_enriched": QuerySpec(
        siretisation_enriched, SIRETISATION_ENRICHED_SQL
    ),
    "pipeline_siretisation_stats": QuerySpec(
        siretisation_stats, SIRETISATION_STATS_SQL
    ),
    "pipeline_rubriques_chain": QuerySpec(rubriques_chain, RUBRIQUES_CHAIN_SQL),
    "pipeline_open_data": QuerySpec(open_data_pipeline, OPEN_DATA_SQL),
}
