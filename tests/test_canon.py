"""Collision-freedom of the shared canonicalization (canon.py).

The invariance gates compare two execution regimes through norm_val;
any two DISTINCT python values that normalize to the same string are
a hole those gates cannot see through. These tests pin the holes the
round-12 advisor found (separator forgery inside containers) plus the
original type-tag cases.
"""

import math

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


# ------------------------- property: norm_val is injective on values

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    scalar = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-10**6, max_value=10**6),
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        st.text(alphabet="ab,:=[]{}sinfoym0123456789", max_size=8),
        st.binary(max_size=4),
    )
    value = st.recursive(
        scalar,
        lambda ch: st.one_of(
            st.lists(ch, max_size=4),
            st.dictionaries(
                st.text(alphabet="ab,:=", max_size=4), ch, max_size=3
            ),
        ),
        max_leaves=8,
    )

    def _eq(a, b) -> bool:
        """Structural equality where NaN == NaN and 1 != True."""
        if type(a) is not type(b):
            return False
        if isinstance(a, float):
            if a != a or b != b:
                return a != a and b != b
            # bit-identity: -0.0 and 0.0 are DIFFERENT regime outputs
            return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)
        if isinstance(a, list):
            return len(a) == len(b) and all(
                _eq(x, y) for x, y in zip(a, b)
            )
        if isinstance(a, dict):
            return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
        return a == b

    @given(value, value)
    @settings(max_examples=300, deadline=None)
    def test_norm_val_injective(a, b):
        """Two structurally different values may NEVER normalize to the
        same string — the exact property the invariance gates rely on
        (the r12 advisor found a separator-forgery violation; this
        fuzzes the repaired encoding with separator-heavy alphabets)."""
        from trackdechets_etl_spark.canon import norm_val

        if _eq(a, b):
            assert norm_val(a) == norm_val(b)
        else:
            assert norm_val(a) != norm_val(b)
