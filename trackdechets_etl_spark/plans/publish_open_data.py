"""The daily open-data pipeline rebuilt as one Spark lineage.

Reference: ``dags/publish-open-data.py`` — extract registered companies
(S6), conditional-overwrite verification status (C5, :45-47), keep
VERIFIED rows (P3, :50), drop working columns (P2, :51), left-join the
non-diffusible existence flag (J5+C6, :70-79), publish CSV (S8/S10,
:97-102). The publish step stays driver-side (the result is small by
construction); everything before it is the lazy lineage below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.functions.scalar import conditional_overwrite
from trackdechets_etl_spark.operators.joins import existence_flag
from trackdechets_etl_spark.plans import fixtures as FX

OPEN_DATA_SQL = f"""WITH odc AS ({FX.OPEN_DATA_COMPANY_SQL}),
flagged AS (
    SELECT siret, nom, address,
           CASE WHEN company_types = 'AUTOMOBILE' THEN 'VERIFIED'
                ELSE verification_status END AS status
    FROM odc
), kept AS (
    SELECT siret, nom, address FROM flagged WHERE status = 'VERIFIED'
), anon AS (
    SELECT DISTINCT siret FROM odc WHERE CAST(siret AS BIGINT) % 10 = 0
)
SELECT kept.siret, nom, address,
       CASE WHEN anon.siret IS NOT NULL THEN 'oui' END AS non_diffusible
FROM kept LEFT JOIN anon ON kept.siret = anon.siret
"""


def open_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    odc = FX.open_data_company(spark, sf_dir)
    flagged = odc.withColumn(
        "status",
        conditional_overwrite(
            F.col("verification_status"),
            F.col("company_types") == "AUTOMOBILE",
            F.lit("VERIFIED"),
        ),
    )
    kept = flagged.filter(F.col("status") == "VERIFIED").select(
        "siret", "nom", "address"
    )
    anon = odc.filter(F.col("siret").cast("bigint") % 10 == 0).select("siret")
    return existence_flag(kept, anon, "siret", "non_diffusible")
