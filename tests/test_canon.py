"""Collision-freedom of the shared canonicalization (canon.py).

The invariance gates compare two execution regimes through norm_val;
any two DISTINCT python values that normalize to the same string are
a hole those gates cannot see through. These tests pin the holes the
round-12 advisor found (separator forgery inside containers) plus the
original type-tag cases.
"""

from trackdechets_etl_spark.canon import canon, norm_val


def test_type_tags_disjoint():
    vals = [None, True, 1, 1.0, "1", b"1", "None", "NaN", float("nan")]
    normed = [norm_val(v) for v in vals]
    assert len(set(normed)) == len(normed)


def test_array_separator_not_forgeable():
    # The advisor's exact counterexample: without length prefixes both
    # sides serialize to "a:[s:a,s:b]".
    assert norm_val(["a,s:b"]) != norm_val(["a", "b"])
    assert norm_val(["a:[", "]"]) != norm_val(["a:[,]"])


def test_map_separator_not_forgeable():
    assert norm_val({"a=s:b": 1}) != norm_val({"a": "s:b=i:1"})


def test_nested_roundtrip_distinct():
    # Element-boundary shifts in nested arrays must stay visible.
    assert norm_val([["a", "b"], ["c"]]) != norm_val([["a"], ["b", "c"]])
    assert norm_val([""]) != norm_val([])
    assert norm_val(["", ""]) != norm_val([","])


def test_canon_sorts_columns_and_rows():
    rows = [(2, "b"), (1, "a")]
    out = canon(rows, ["x", "y"])
    assert out == sorted(out)
    # column order follows sorted names: x before y
    assert out[0][0].startswith("i:")
