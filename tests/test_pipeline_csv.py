"""End-to-end siretisation from the reference's real input shape:
headerless ';'-separated CSVs with explicit schemas and day-first dates
(reference dags/icpe-siretisation.py:65-139), through the frame-level
pipeline core, to the coverage stats — no parquet fixtures involved."""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

from trackdechets_etl_spark.io.readers import read_csv_with_schema
from trackdechets_etl_spark.operators.stats import coverage_stats
from trackdechets_etl_spark.plans.icpe_siretisation import (
    enrich_installations_frames,
)


def _schema(*names: str) -> StructType:
    return StructType([StructField(n, StringType()) for n in names])


def test_siretisation_from_csv_sources(spark, tmp_path):
    # etablissements: code;nom;siret  (one valid, one short, one null)
    (tmp_path / "etab.csv").write_text(
        "0000000001;ACME;11111111111111\n"
        "0000000002;BETA;22\n"
        "0000000003;GAMA;\n"
    )
    # installations: code;inst_id
    (tmp_path / "inst.csv").write_text(
        "0000000001;i1\n0000000002;i2\n0000000003;i3\n0000000009;i4\n"
    )
    # gerep: code-without-leading-zero;siret;annee — two years for code 2,
    # later year wins; its SIRET is valid -> backfills BETA's short one
    (tmp_path / "gerep.csv").write_text(
        "000000002;33333333333333;2020\n"
        "000000002;99;2019\n"
    )
    # company: nom;siret_candidate;orderkey — GAMA matches twice (fanout);
    # candidate valid -> backfills the null
    (tmp_path / "comp.csv").write_text(
        "GAMA;44444444444444;1\nGAMA;55;2\n"
    )

    etab = read_csv_with_schema(
        spark, str(tmp_path / "etab.csv"), _schema("code_s3ic", "nom_ets", "siret")
    )
    inst = read_csv_with_schema(
        spark, str(tmp_path / "inst.csv"), _schema("code_s3ic", "inst_id")
    )
    gerep = read_csv_with_schema(
        spark,
        str(tmp_path / "gerep.csv"),
        _schema("code_etablissement", "numero_siret", "annee"),
    )
    comp = read_csv_with_schema(
        spark,
        str(tmp_path / "comp.csv"),
        _schema("nom", "siret_candidate", "o_orderkey"),
    )

    out = enrich_installations_frames(inst, etab, gerep, comp)
    rows = sorted(
        [(r.inst_id, r.o_orderkey, r.siret_final) for r in out.collect()]
    )
    # i1: valid SIRET kept; i2: gerep keep-last (2020) backfills the short
    # one; i3 fans out to both GAMA companies — valid candidate fills one
    # row, invalid leaves null; i4: no etab match at all.
    assert rows == [
        ("i1", None, "11111111111111"),
        ("i2", None, "33333333333333"),
        ("i3", "1", "44444444444444"),
        ("i3", "2", None),
        ("i4", None, None),
    ]

    stats = coverage_stats(out, "code_s3ic", "siret_final").collect()[0]
    # per-code max: i1 valid, i2 valid, i3 valid (max of the fanout), i4 null
    assert stats.n_total == 4
    assert stats.n_invalid == 1
    assert stats.n_unique_valid == 3
