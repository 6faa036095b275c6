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


@given(_dup_rows)
@settings(**_SETTINGS)
def test_dedup_latest_agg_matches_window_form(spark, rows):
    """The hash-agg strategy (min_by over a comparator struct) must pick
    exactly the rows the sort-window strategy picks, including NULL-order
    and tied-order inputs — the comparator mirrors desc-NULLS-LAST order
    with an explicit null marker + coalesce so min_by never sees a NULL
    rank (min_by skips NULL-ranked rows entirely)."""
    from pyspark.sql import functions as F

    from automotive_data_pipeline_demo_spark.operators.dedup import (
        dedup_latest_agg,
    )

    df = spark.createDataFrame(rows, "k int, o int, p int")
    rank = F.struct(
        F.col("o").isNull().cast("int").alias("null_last"),
        (-F.coalesce(F.col("o"), F.lit(0))).alias("neg_o"),
        F.col("p").alias("tie"),
    )
    got = sorted(
        (r["k"], r["o"], r["p"])
        for r in dedup_latest_agg(df, ["k"], rank).collect()
    )
    assert got == _py_dedup_latest(rows)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_morton_code_matches_python_interleave(spark, pairs):
    """Spark's Morton expression must equal a pure-Python bit interleave,
    and the code must be injective over the masked 16-bit domain (the
    property file-level min/max skipping depends on)."""
    from automotive_data_pipeline_demo_spark.operators.layout import morton_code

    def py_morton(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", morton_code(F.col("a"), F.col("b"), bits=16).alias("z")
    )
    rows = df.collect()
    for r in rows:
        assert r["z"] == py_morton(r["a"], r["b"]), (r["a"], r["b"])
    assert len({r["z"] for r in rows}) == len(pairs)  # injective


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100.0, max_value=100.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=2,
            max_size=8,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_quantize_int8_bounds_and_scale_invariance(spark, vecs):
    """Codes stay in [-127, 127]; the max-|x| element always maps to
    +/-127 (symmetric quantization); all-zero vectors yield NULL codes."""
    from automotive_data_pipeline_demo_spark.extensions.quantization import (
        quantize_int8,
    )
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(i=i, v=[float(x) for x in v]) for i, v in enumerate(vecs)],
        schema="i long, v array<double>",
    )
    out = {r["i"]: r["q"] for r in df.select("i", quantize_int8(F.col("v")).alias("q")).collect()}
    for i, v in enumerate(vecs):
        q = out[i]
        if all(x == 0.0 for x in v):
            assert all(c is None for c in q)
            continue
        assert all(c is not None and -127 <= c <= 127 for c in q), (v, q)
        m = max(range(len(v)), key=lambda j: (abs(v[j]), -j))
        assert abs(q[m]) == 127, (v, q)
