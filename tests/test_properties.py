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


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_source_drift_bounds_and_python_reference(spark, rows):
    """tvd in [0, 1) quantized, chi2 >= 0, and both match a pure-Python
    recomputation of the quantized definition on arbitrary groupings."""
    import math

    from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
        source_drift_report,
    )

    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {
        r["source"]: r
        for r in source_drift_report(df, "source", "n_chars").collect()
    }

    # pure-Python reference of the documented quantized semantics
    from collections import Counter

    binned = [(s, (v // 100) * 100) for s, v in rows]
    sb = Counter(binned)
    s_tot = Counter(s for s, _ in binned)
    c_bin = Counter(b for _, b in binned)
    n_c = sum(c_bin.values())
    for s in s_tot:
        tvd_q = chi_q = 0
        for b, n_b in c_bin.items():
            p_s = sb.get((s, b), 0) / s_tot[s]
            p_c = n_b / n_c
            tvd_q += math.floor(abs(p_s - p_c) * 1e9)
            chi_q += math.floor((p_s - p_c) * (p_s - p_c) / p_c * 1e9)
        assert got[s]["n_docs"] == s_tot[s]
        assert got[s]["tvd"] == tvd_q / 2e9
        assert got[s]["chi2"] == chi_q / 1e9
        assert 0.0 <= got[s]["tvd"] <= 1.0
        assert got[s]["chi2"] >= 0.0


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4.0, max_value=4.0, allow_nan=False, width=32
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_embedding_dim_stats_matches_python_reference(spark, vecs):
    """Quantized per-dimension mean/mean_sq and exact min/max match a pure
    Python fold for arbitrary float32 vectors."""
    import math
    import struct

    from automotive_data_pipeline_demo_spark.extensions.similarity import (
        embedding_dim_stats,
    )

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
    vecs = [[f32(x) for x in v] for v in vecs]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r["dim"]: r for r in embedding_dim_stats(df).collect()}
    q = float(1 << 20)
    for d in range(3):
        col = [v[d] for v in vecs]
        sq = sum(math.floor(x * q) for x in col)
        sq2 = sum(math.floor(x * x * q) for x in col)
        assert got[d]["n"] == len(col)
        assert got[d]["mean"] == sq / (q * len(col))
        assert got[d]["mean_sq"] == sq2 / (q * len(col))
        assert got[d]["min_v"] == min(col)
        assert got[d]["max_v"] == max(col)


@given(
    st.lists(
        st.lists(
            st.sampled_from(["zebra", "yak", "cow", "hut", "elk"]),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_bm25_matches_python_reference(spark, docs):
    """BM25 scores match a pure-Python implementation of the documented
    formula (Lucene idf, fixed-order term fold, 4-dp rounding) on
    arbitrary corpora, including all-query-term and no-query-term docs."""
    import math

    from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
        bm25_topk,
    )

    terms = ["zebra", "yak"]
    k1, b = 1.2, 0.75
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in bm25_topk(df, "doc_id", "text", terms, k=100).collect()
    }

    n = len(docs)
    total = sum(len(t) for t in docs)
    dfreq = {t: sum(1 for d in docs if t in d) for t in terms}
    for i, toks in enumerate(docs):
        score = 0.0
        for t in terms:
            tf = float(toks.count(t))
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            rel = float(len(toks) * n) / float(total)
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * rel))
        expected = round(score, 4)
        if expected > 0:
            assert got[i]["score"] == expected and got[i]["dl"] == len(toks)
        else:
            assert i not in got


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["png", "gif87", "gif89", "bmp", "bmp_topdown"]),
            st.integers(min_value=1, max_value=65535),
            st.integers(min_value=1, max_value=65535),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_image_dimensions_roundtrip_random_headers(spark, specs):
    """Any struct-packed valid header round-trips through the JVM binary
    parser: format detected, width/height exact, BMP top-down (negative
    signed biHeight) folded to the positive magnitude."""
    import struct

    from automotive_data_pipeline_demo_spark.extensions.multimodal import (
        image_dimensions,
    )

    rows = []
    for i, (fmt, w, h) in enumerate(specs):
        if fmt == "png":
            payload = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                       + struct.pack(">II", w, h))
            want = ("png", w, h)
        elif fmt in ("gif87", "gif89"):
            magic = b"GIF87a" if fmt == "gif87" else b"GIF89a"
            payload = magic + struct.pack("<HH", w, h)
            want = ("gif", w, h)
        else:
            signed_h = -h if fmt == "bmp_topdown" else h
            payload = (b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
                       + struct.pack("<Iii", 40, w, signed_h))
            want = ("bmp", w, h)
        rows.append((i, payload, want[0], want[1], want[2]))
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in rows], "id int, payload binary"
    )
    got = {
        r["id"]: r
        for r in df.select("id", image_dimensions(F.col("payload")).alias("m"))
        .select("id", "m.*")
        .collect()
    }
    for i, _, fmt, w, h in rows:
        assert (got[i]["format"], got[i]["width"], got[i]["height"]) == (
            fmt, w, h,
        ), (i, fmt, w, h)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.integers(min_value=0, max_value=999),
            st.integers(min_value=0, max_value=999),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_ipv4_scan_matches_octet_rule(spark, quads):
    """The redaction regex fires on a bare dotted quad iff every octet is
    <= 255 — exactly the shape rule the octet-bounded pattern encodes."""
    from automotive_data_pipeline_demo_spark.operators.cleaning import redact_pii

    df = spark.createDataFrame(
        [(i, "ip %d.%d.%d.%d end" % q) for i, q in enumerate(quads)],
        "id long, t string",
    )
    got = {
        r["id"]: r["r"]
        for r in df.select(
            "id", redact_pii("t", ip_token="[IP]").alias("r")
        ).collect()
    }
    for i, q in enumerate(quads):
        redacted = got[i] == "ip [IP] end"
        assert redacted == all(o <= 255 for o in q), (q, got[i])


@given(
    st.lists(
        st.lists(
            st.sampled_from(["COOKIE", "nav bar", "alpha", "beta", "gamma x",
                             "delta", "", "epsilon y z"]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_line_dedup_matches_python_reference(spark, doc_lines, k):
    """line_dedup agrees with an independent pure-Python reference on
    random line-structured corpora: NON-EMPTY lines in >= k DISTINCT docs
    vanish everywhere (empty lines are paragraph separators and never go
    hot — ADVICE r6), survivors keep document order, counts reconcile."""
    from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
        line_dedup,
    )

    docs = [(i, "\n".join(ls)) for i, ls in enumerate(doc_lines)]
    # python reference
    from collections import defaultdict

    df_count: dict[str, set] = defaultdict(set)
    for i, ls in enumerate(doc_lines):
        for line in ls:
            if line != "":
                df_count[line].add(i)
    hot = {line for line, ids in df_count.items() if len(ids) >= k}
    want = {}
    for i, ls in enumerate(doc_lines):
        kept = [x for x in ls if x not in hot]
        want[i] = ("\n".join(kept), len(ls), len(ls) - len(kept))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_lines"], r["n_removed"])
        for r in line_dedup(sdf, "doc_id", "text", min_doc_freq=k).collect()
    }
    assert got == want

    # hot_digests path (the streaming twin's entry point): feeding the
    # reference hot set as EXTERNALLY built digests must reproduce the
    # self-computed result exactly; carry_cols ride through unchanged.
    # External producers build keys with the shared line_digest() helper
    # (the documented hot_digests contract) — here from the reference
    # hot LINES, not from line_dedup's own internals.
    from pyspark.sql import functions as SF

    from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
        line_digest,
    )

    hot_df = spark.createDataFrame(
        [(line,) for line in hot] or [("\x00never-a-line",)],
        "line string",
    ).select(line_digest("line").alias("line_h"))
    with_attr = spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in docs],
        "doc_id long, text string, source string",
    )
    got2 = {
        r["doc_id"]: (
            r["cleaned_text"], r["n_lines"], r["n_removed"], r["source"]
        )
        for r in line_dedup(
            with_attr, "doc_id", "text",
            hot_digests=hot_df.select(SF.col("line_h")),
            carry_cols=("source",),
        ).collect()
    }
    assert got2 == {
        i: (*want[i], f"src{i % 2}") for i, _ in docs
    }


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet="abz THE#. \n-*", max_size=60),
            st.sampled_from(
                [
                    "the be to of and that have with",
                    "### ... ###",
                    "- item one\n- item two\nplain",
                    "ends in dots...\nnormal line",
                ]
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_gopher_rules_match_python_reference(spark, texts):
    """Gopher measures agree with an independent pure-Python reference
    (same integer-space half-up 4dp rounding) on random null-heavy text."""
    import re as _re

    from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
        GOPHER_STOPWORDS,
        gopher_quality_rules,
    )

    def r4(a, b):
        return ((a * 20000 + b) // (b * 2)) / 10000.0

    want = {}
    for i, t in enumerate(texts):
        s = t or ""
        words = [w for w in _re.split(r"\s+", s) if w != ""]
        lines = s.split("\n")
        nw = len(words)
        chars = sum(len(w) for w in words)
        alpha = sum(1 for w in words if _re.search("[A-Za-z]", w))
        stops = len(
            {w.lower() for w in words} & set(GOPHER_STOPWORDS)
        )
        bullets = sum(
            1 for x in lines
            if x.startswith("- ") or x.startswith("* ") or x.startswith("•")
        )
        ellipses = sum(1 for x in lines if x.endswith("..."))
        symbols = s.count("#") + len(_re.findall(r"\.\.\.", s))
        want[i] = (
            nw,
            r4(chars, nw) if nw else None,
            r4(symbols, nw) if nw else None,
            r4(alpha, nw) if nw else None,
            stops,
            r4(bullets, len(lines)),
            r4(ellipses, len(lines)),
        )

    sdf = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["id"]: (
            r["n_words"], r["mean_word_len"], r["symbol_ratio"],
            r["alpha_frac"], r["stop_hits"], r["bullet_frac"],
            r["ellipsis_frac"],
        )
        for r in gopher_quality_rules(sdf, "doc_id", "text").collect()
    }
    assert got == want


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_scrub_shared_spans_matches_python_reference(spark, docs, n):
    """The vectorized Arrow scrubber (difference-array coverage, per-batch
    flattened reassembly) must agree with a direct per-doc Python reference
    on tiny-vocab corpora where spans collide and overlap constantly."""
    from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
        scrub_shared_spans,
    )

    texts = [" ".join(toks) for toks in docs]
    # Python reference: count every n-gram across the corpus, then mark
    # covered positions per doc and rebuild in order.
    from collections import Counter

    grams = Counter()
    for toks in docs:
        for j in range(len(toks) - n + 1):
            grams[tuple(toks[j:j + n])] += 1
    want = {}
    for i, toks in enumerate(docs):
        covered = set()
        for j in range(len(toks) - n + 1):
            if grams[tuple(toks[j:j + n])] >= 2:
                covered.update(range(j, j + n))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        want[i] = (len(toks), len(toks) - len(kept), " ".join(kept))

    sdf = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in scrub_shared_spans(sdf, "doc_id", "text", n=n).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.lists(
                st.sampled_from([0.1, -0.25, 1.5, 0.0, 3.0e5, -7.25e-3]),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=2,
        max_size=24,
    )
)
@settings(**_SETTINGS)
def test_near_dup_blocked_parity_randomized(spark, rows):
    """Randomized bit-parity of the blocked Arrow pair scorer vs the
    equi-self-join fold: inexact-binary values (0.1), zeros (NaN scores),
    and repeated vectors across random block shapes must produce the
    identical (pair, rounded-score) multiset under both strategies."""
    import math

    from automotive_data_pipeline_demo_spark.extensions.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(i, vec, lab) for i, (lab, vec) in enumerate(rows)],
        "vec_id long, embedding array<float>, label string",
    )

    def rendered(strategy):
        out = embedding_near_dup_pairs(
            df, threshold=-1.0, block_col="label", strategy=strategy,
            chunk_pairs=5,
        ).collect()
        return sorted(
            (r.a_id, r.b_id, "nan" if math.isnan(r.score) else r.score)
            for r in out
        )

    assert rendered("join") == rendered("blocked")


@given(
    st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "fox", "run"]),
            min_size=0,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(**_SETTINGS)
def test_collapsed_graph_components_match_per_id_chain(spark, docs, thr):
    """Randomized: the collapsed-cohort graph's components equal the
    per-id uncapped banded chain's components on tiny-vocab corpora where
    identical and near-identical docs occur constantly."""
    from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
        collapsed_pair_graph,
        connected_components,
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
        shingle_arrays,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    arrs = shingle_arrays(sdf, "doc_id", "text", 3).persist()
    per_id = ngram_jaccard_pairs(
        sdf, "doc_id", "text", threshold=thr, shingle_n=3,
        candidates=minhash_candidate_pairs(
            sdf, "doc_id", "text", 8, 2, 3,
            max_bucket_size=None, shingles=arrs,
        ),
        max_doc_freq=None, shingle_arrays_df=arrs,
    )
    want = {
        (r.id, r.component)
        for r in connected_components(per_id, "id_a", "id_b").collect()
    }
    edges = collapsed_pair_graph(sdf, "doc_id", "text", threshold=thr)
    got = {
        (r.id, r.component)
        for r in connected_components(edges, "id_a", "id_b").collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.booleans(),
            st.lists(
                st.sampled_from([0.1, -0.25, 1.5, 0.0, 3.0e5, -7.25e-3]),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=2,
        max_size=24,
    )
)
@settings(**_SETTINGS)
def test_near_dup_incremental_mode_randomized(spark, rows):
    """Randomized: incremental pair mode (new_col) equals the full run's
    pairs filtered to those touching a new row — identical (pair, score)
    sets on BOTH strategies, across random block shapes, flag mixes,
    inexact-binary values, zero vectors (NaN scores), and repeated
    vectors."""
    import math

    from automotive_data_pipeline_demo_spark.extensions.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(i, lab, is_new, vec) for i, (lab, is_new, vec) in enumerate(rows)],
        "vec_id long, label string, is_new boolean, embedding array<float>",
    )
    new_ids = {i for i, (_, is_new, _) in enumerate(rows) if is_new}

    def rendered(strategy, new_col):
        out = embedding_near_dup_pairs(
            df, threshold=-1.0, block_col="label", strategy=strategy,
            chunk_pairs=5, new_col=new_col,
        ).collect()
        return sorted(
            (r.a_id, r.b_id, "nan" if math.isnan(r.score) else r.score)
            for r in out
        )

    want = [
        t for t in rendered("join", None)
        if t[0] in new_ids or t[1] in new_ids
    ]
    assert rendered("join", "is_new") == want
    assert rendered("blocked", "is_new") == want


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_fuzzy_contamination_degenerates_to_exact(spark, docs):
    """Randomized: the thresholded recipe strictly generalizes the GPT-3
    verbatim one — fuzzy mode at the exact mode's gram width with a zero
    Jaccard threshold flags exactly the exact mode's (pair, n_shared)
    set, across random small vocabularies, repeats, short docs (one-
    shingle fallback), and empty docs."""
    from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
        fuzzy_ngram_contamination,
        ngram_contamination,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id < 1")
    corpus = df.filter("doc_id >= 1")
    exact = {
        (r["id"], r["benchmark_id"]): r["n_shared"]
        for r in ngram_contamination(
            corpus, bench, "doc_id", "text", n=3
        ).collect()
    }
    fuzzy = {
        (r["id"], r["benchmark_id"]): r["n_shared"]
        for r in fuzzy_ngram_contamination(
            corpus, bench, "doc_id", "text", n=3,
            min_jaccard=0.0, min_shared=1,
        ).collect()
    }
    assert fuzzy == exact
    spark.catalog.clearCache()
