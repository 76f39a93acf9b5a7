"""Dictionary-decode expression (SURVEY §2.7).

The reference's one "custom function" is ``setValue(value, ref_dict)``
(``dags/icpe-siretisation.py:177-184``): map coded values to labels,
returning ``''`` for unknown codes and ``None`` for null input. Applied
three times via list comprehension (Seveso / famille IC / régime labels,
``dags/icpe-siretisation.py:187-216``).

Spark form: a ``create_map`` literal + ``element_at``, wrapped so that
null input → null and unknown code → ``''`` (SURVEY §2.9.2 — the two
cases are distinguishable and the oracle hash check sees the
difference). No UDF, no join: for dictionaries of a few entries the map
literal is constant-folded into the generated code. For big dictionaries
use a broadcast-join lookup table instead (``decode_via_join``).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEVESO_LABELS = {
    "S": "Seveso seuil haut",
    "NS": "Non Seveso",
    "SB": "Seveso seuil bas",
    "SH": "Seveso seuil haut",
    "H": "Seveso seuil haut",
    "B": "Seveso seuil bas",
}
FAMILLE_IC_LABELS = {
    "IN": "Industries",
    "BO": "Bovins",
    "PO": "Porcs",
    "VO": "Volailles",
    "CA": "Carrières",
}
REGIME_LABELS = {
    "A": "Autorisation",
    "E": "Enregistrement",
    "D": "Déclaration",
    "DC": "Déclaration avec contrôle",
    "NC": "Non classé",
}


def decode_dict(col: Column, mapping: Mapping[str, str]) -> Column:
    """Map-literal decode with the reference's null semantics:
    null → null, unknown code → ``''``, known code → label."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    lookup = F.element_at(F.create_map(*pairs), col)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(lookup, F.lit(""))
    )


def decode_case_sql(col_name: str, mapping: Mapping[str, str]) -> str:
    """ANSI-SQL CASE equivalent of :func:`decode_dict` — used to build
    DuckDB oracle statements with identical semantics."""
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items()
    )
    return (
        f"CASE WHEN {col_name} IS NULL THEN NULL "
        f"ELSE (CASE {col_name} {whens} ELSE '' END) END"
    )


def decode_via_join(
    df: DataFrame,
    col_name: str,
    mapping_df: DataFrame,
    out_name: str,
    key: str = "code",
    label: str = "label",
) -> DataFrame:
    """Broadcast-join decode for large dictionaries (the scale path the
    map literal can't take). Unknown → '' and null → null, same as
    :func:`decode_dict`."""
    joined = df.join(
        F.broadcast(mapping_df.select(key, label)),
        df[col_name] == mapping_df[key],
        "left",
    )
    out = F.when(df[col_name].isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(F.col(label), F.lit(""))
    )
    return joined.withColumn(out_name, out).drop(key, label)
