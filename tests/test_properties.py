"""Property/randomized tests (SURVEY §5 plan item 4): the reference's
semantics live in edge cases — empty string vs NULL, regex boundaries, tie
handling. Each Spark operator is checked against an independent pure-Python
reference over hypothesis-generated null-heavy / duplicate-heavy data.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.operators.cleaning import (
    clean_email,
    clean_phone,
    is_valid_email,
)
from automotive_data_pipeline_demo_spark.operators.dedup import dedup_latest

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# printable-ish text with spaces, punctuation, digits, and @ / . characters
_text = st.one_of(
    st.none(),
    st.text(alphabet="abcXYZ019 @._-+()", max_size=20),
    st.sampled_from(
        ["no@example.com", " A@b.cd ", "nothanks@x.yz", "a@example.com", "  ", ""]
    ),
)


def _py_clean_email(s):
    """Reference: LOWER(TRIM(email)), '' -> NULL. Spark trim strips 0x20."""
    if s is None:
        return None
    t = s.strip(" ")
    return t.lower() if t else None


def _py_clean_phone(s):
    if s is None:
        return None
    d = re.sub(r"[^0-9]", "", s)
    return d or None


@given(st.lists(_text, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_clean_email_matches_python_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "email string")
    got = [r["e"] for r in df.select(clean_email("email").alias("e")).collect()]
    assert got == [_py_clean_email(v) for v in values]


@given(st.lists(_text, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_clean_phone_matches_python_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "phone string")
    got = [r["p"] for r in df.select(clean_phone("phone").alias("p")).collect()]
    assert got == [_py_clean_phone(v) for v in values]


@given(st.lists(_text, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_valid_email_implies_shape(spark, values):
    """is_valid_email is sound: every accepted value has a non-dummy
    user@domain.tld shape after cleaning (P5/P6 semantics)."""
    df = spark.createDataFrame([(v,) for v in values], "email string")
    rows = df.select(
        "email",
        clean_email("email").alias("e"),
        is_valid_email("email").alias("ok"),
    ).collect()
    for r in rows:
        if r["ok"]:
            assert r["e"] is not None
            assert re.search(r"@.+\..+", r["e"]), r
            assert not r["e"].startswith(("no@", "nothanks@")), r
            assert "@example.com" not in r["e"], r
        else:
            assert r["ok"] is False or r["ok"] is None


_dup_rows = st.lists(
    st.tuples(
        st.integers(0, 4),                      # key: tiny range -> heavy dups
        st.one_of(st.none(), st.integers(0, 3)),  # order col: ties + nulls
        st.integers(0, 9),                      # payload/tiebreaker
    ),
    min_size=1,
    max_size=60,
)


def _py_dedup_latest(rows):
    """Reference: per key, max order value wins (NULL order sorts last in
    Spark's desc), ties broken by ASC payload."""
    best = {}
    for k, o, p in rows:
        key_rank = (0 if o is not None else 1, -(o or 0), p)
        if k not in best or key_rank < best[k][0]:
            best[k] = (key_rank, (k, o, p))
    return sorted(v[1] for v in best.values())


@given(_dup_rows)
@settings(**_SETTINGS)
def test_dedup_latest_matches_python_reference(spark, rows):
    df = spark.createDataFrame(rows, "k int, o int, p int")
    got = sorted(
        (r["k"], r["o"], r["p"])
        for r in dedup_latest(df, ["k"], ["o"], tiebreakers=["p"]).collect()
    )
    assert got == _py_dedup_latest(rows)
