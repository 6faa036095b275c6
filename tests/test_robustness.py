"""Poison-corpus robustness: every documents-based catalog entry must
survive dirty data — NULL text, empty/whitespace-only docs, unicode,
punctuation-only docs, a 10k-token doc, NULL lang/source — without
raising, and the per-doc stats entries must never emit the ``F.size(NULL)``
-1 sentinel as a count. The driver's synthetic corpora are clean, so this
class of defect is invisible to the oracle sweep.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG

_POISON_TAGS = {
    "text", "dedup", "sampling", "stats", "similarity", "tfidf", "quality",
    "index", "containment", "simhash", "jaccard", "retrieval", "bm25",
    "versioning", "monitoring", "curation", "pipeline", "interleave",
    "multimodal", "json", "heavy-hitters",
}

_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog and it is a day", "en", "web"),
    (2, "", "en", "web"),
    (3, "x", "en", "mail"),
    (4, " ".join("tok%d" % (i % 97) for i in range(10000)), "en", "crawl"),
    (5, "café résumé naïve café café café", "fr", "web"),
    (6, "   \t  ", "en", "web"),
    (7, "!!! ??? ... ;;; :::", "en", "mail"),
    (8, "中文文本 没有 空格分词 测试", "zh", "crawl"),
    (9, None, "en", "web"),
    (10, "dup dup dup dup dup dup dup dup", None, None),
]


@pytest.fixture(scope="module")
def poison_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("poison_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?, ?, NULL)", _ROWS
    )
    con.execute("UPDATE docs SET n_chars = coalesce(length(text), 0)")
    con.execute(f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return d


def _poison_specs():
    return [s for s in CATALOG if set(s.tags) & _POISON_TAGS]


@pytest.mark.parametrize("spec", _poison_specs(), ids=lambda s: s.name)
def test_entry_survives_poison_corpus(spark, poison_dir, spec):
    # must not raise; row count is unconstrained (filters may drop all)
    spec.build(spark, poison_dir).count()


def test_stats_never_emit_negative_counts(spark, poison_dir):
    """NULL text is the EMPTY document: counts are 0, never the -1
    F.size(NULL) sentinel, and corpus totals are not silently reduced."""
    stats = next(s for s in CATALOG if s.name == "x_text_stats")
    rows = {r["doc_id"]: r for r in stats.build(spark, poison_dir).collect()}
    assert rows[9]["n_tokens_ws"] == 0
    assert rows[9]["n_tokens_bpe"] == 0
    assert rows[9]["n_distinct_tokens"] == 0
    assert rows[9]["quality"] == rows[2]["quality"]  # NULL scores like ""
    assert all(
        r["n_tokens_ws"] >= 0 and r["n_distinct_tokens"] >= 0
        for r in rows.values()
    )
    corpus = next(s for s in CATALOG if s.name == "x_corpus_stats")
    en = {r["lang"]: r for r in corpus.build(spark, poison_dir).collect()}["en"]
    # en docs: 14 + 0 + 1 + 10000 + 0 + 5 + 0 (NULL doc) ws tokens
    assert en["total_tokens"] == 10020


_EMB_ENTRIES = [
    "x_sim_bruteforce", "x_sim_lsh", "x_sim_ivf", "x_sim_quantized",
    "x_sim_rerank", "x_sim_kmeans", "x_dedup_embed", "x_dedup_semdedup",
    "x_dedup_semdedup_inc", "x_dedup_semdedup_drift",
    "x_dedup_threshold_sweep", "x_embed_stats",
]


@pytest.fixture(scope="module")
def poison_emb_dir(tmp_path_factory):
    """sf0.001 tables with a poisoned embeddings column: an all-zero
    vector, a NULL embedding, a ragged (2-dim) vector, and a 1e30
    magnitude vector appended to the clean 64-dim corpus."""
    d = str(tmp_path_factory.mktemp("poison_emb"))
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE emb AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    dim = con.execute("SELECT len(embedding) FROM emb LIMIT 1").fetchone()[0]
    con.execute(
        f"INSERT INTO emb VALUES (900001, list_transform(range(1, {dim}+1),"
        " x -> CAST(0.0 AS FLOAT)), 0)"
    )
    con.execute("INSERT INTO emb VALUES (900002, NULL, 1)")
    con.execute(
        "INSERT INTO emb VALUES (900003,"
        " [CAST(1.5 AS FLOAT), CAST(-2.5 AS FLOAT)], 2)"
    )
    con.execute(
        f"INSERT INTO emb VALUES (900004, list_transform(range(1, {dim}+1),"
        " x -> CAST(1e30 AS FLOAT)), 3)"
    )
    con.execute(f"COPY emb TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    return d


@pytest.mark.parametrize("name", _EMB_ENTRIES)
def test_entry_survives_poison_embeddings(spark, poison_emb_dir, name):
    """Zero / NULL / ragged / huge-magnitude vectors must not crash any
    similarity entry (kmeans excludes NULL and wrong-dimension vectors —
    cosine against a d-dim centroid is undefined for them)."""
    spec = next(s for s in CATALOG if s.name == name)
    spec.build(spark, poison_emb_dir).count()


@pytest.fixture(scope="module")
def poison_ev_dir(tmp_path_factory):
    """sf0.001 tables with poisoned events: NULL ts, NULL user_id/props,
    NULL event_type/value, malformed and truncated JSON props, an epoch
    timestamp, and a -1e308 value."""
    d = str(tmp_path_factory.mktemp("poison_ev"))
    for t in (
        "region nation customer supplier part orders lineitem documents"
        " embeddings"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    con.execute(
        "INSERT INTO ev VALUES (900001, NULL, 42, 'click', 1.0, '{}')"
    )
    con.execute(
        "INSERT INTO ev VALUES (900002, TIMESTAMP '2024-01-05 00:00:00',"
        " NULL, 'click', 1.0, NULL)"
    )
    con.execute(
        "INSERT INTO ev VALUES (900003, TIMESTAMP '2024-01-05 00:00:00',"
        " 43, NULL, NULL, 'not json at all')"
    )
    con.execute(
        "INSERT INTO ev VALUES (900004, TIMESTAMP '1970-01-01 00:00:00',"
        " 44, 'click', -1e308, '{\"k\":')"
    )
    con.execute(f"COPY ev TO '{d}/events.parquet' (FORMAT PARQUET)")
    return d


def _events_specs():
    import inspect

    return [
        s
        for s in CATALOG
        if '"events"' in inspect.getsource(s.build)
        or "'events'" in inspect.getsource(s.build)
    ]


@pytest.mark.parametrize("spec", _events_specs(), ids=lambda s: s.name)
def test_entry_survives_poison_events(spark, poison_ev_dir, spec):
    spec.build(spark, poison_ev_dir).count()


@pytest.fixture(scope="module")
def poison_rel_dir(tmp_path_factory):
    """sf0.001 tables with poisoned RELATIONAL facts/dims — the families
    the documents/embeddings/events passes never touch: NULL join keys,
    duplicate primary and composite keys, NULL measures, and
    timezone/epoch-edge timestamps through customer, orders, lineitem."""
    d = str(tmp_path_factory.mktemp("poison_rel"))
    for t in (
        "region nation supplier documents embeddings events"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE customer AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/customer.parquet')"
    )
    # NULL key, duplicate key (PK violation), NULL FK, NULL measure/name
    con.execute(
        "INSERT INTO customer VALUES (NULL, 'null-key', 0, 1.0, 'BUILDING')"
    )
    con.execute(
        "INSERT INTO customer SELECT c_custkey, 'dup-' || c_name,"
        " c_nationkey, c_acctbal + 1, c_mktsegment FROM customer"
        " WHERE c_custkey = (SELECT MIN(c_custkey) FROM customer)"
    )
    con.execute(
        "INSERT INTO customer VALUES (900001, NULL, NULL, NULL, NULL)"
    )
    con.execute(f"COPY customer TO '{d}/customer.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    # NULL cust FK, duplicate orderkey, NULL date, epoch + far-future dates
    con.execute(
        "INSERT INTO orders VALUES (900001, NULL, 'O', 10.0,"
        " TIMESTAMP '2024-01-05 00:00:00', '1-URGENT')"
    )
    con.execute(
        "INSERT INTO orders SELECT o_orderkey, o_custkey, 'F',"
        " o_totalprice, o_orderdate, o_orderpriority FROM orders"
        " WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)"
    )
    con.execute(
        "INSERT INTO orders VALUES (900002, 1, 'O', NULL, NULL, NULL)"
    )
    con.execute(
        "INSERT INTO orders VALUES (900003, 1, 'O', 0.0,"
        " TIMESTAMP '1970-01-01 00:00:00', '5-LOW')"
    )
    con.execute(
        "INSERT INTO orders VALUES (900004, 1, 'O', 1e12,"
        " TIMESTAMP '9999-12-31 23:59:59', '5-LOW')"
    )
    con.execute(f"COPY orders TO '{d}/orders.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE lineitem AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    # duplicate composite (orderkey, linenumber), NULL measures/date/flags
    con.execute(
        "INSERT INTO lineitem SELECT * FROM lineitem"
        " WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem)"
        " AND l_linenumber = 1"
    )
    con.execute(
        "INSERT INTO lineitem VALUES (900001, 1, 1, 1, NULL, NULL, NULL,"
        " NULL, NULL, NULL, NULL)"
    )
    con.execute(
        "INSERT INTO lineitem VALUES (NULL, NULL, NULL, NULL, 1.0, 1.0,"
        " 0.0, 0.0, 'N', 'O', TIMESTAMP '1970-01-01 00:00:00')"
    )
    con.execute(f"COPY lineitem TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE part AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/part.parquet')"
    )
    # NULL blocking keys (brand/size), duplicate partkey, NULL name/price
    con.execute(
        "INSERT INTO part VALUES (900001, NULL, NULL, NULL, NULL, NULL)"
    )
    con.execute(
        "INSERT INTO part SELECT p_partkey, 'dup ' || p_name, p_brand,"
        " p_type, p_size, p_retailprice FROM part"
        " WHERE p_partkey = (SELECT MIN(p_partkey) FROM part)"
    )
    con.execute(f"COPY part TO '{d}/part.parquet' (FORMAT PARQUET)")
    return d


def _rel_specs():
    """Catalog entries whose builders read the relational tables (and no
    fixture-file side inputs — the reader entries build their own files)."""
    import inspect

    out = []
    for s in CATALOG:
        src = inspect.getsource(s.build)
        if any(
            f'"{t}"' in src or f"'{t}'" in src
            for t in ("customer", "orders", "lineitem", "part")
        ):
            out.append(s)
    return out


@pytest.mark.parametrize("spec", _rel_specs(), ids=lambda s: s.name)
def test_entry_survives_poison_relational(spark, poison_rel_dir, spec):
    """NULL/duplicate keys and epoch/far-future timestamps must not raise
    through any join/window/merge/aggregate entry."""
    spec.build(spark, poison_rel_dir).count()


def test_snapshot_diff_classifies_null_text(spark):
    """NULL-text docs present in both snapshots are unchanged (presence is
    a marker, not digest NULL-ness); NULL <-> text transitions are
    changed."""
    from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
        corpus_snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "a", "x")],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [(1, "a", None), (2, "a", "now text"), (3, "a", None)],
        "doc_id long, source string, text string",
    )
    row = corpus_snapshot_diff(old, new, "doc_id", "text").collect()[0]
    assert row["n_unchanged"] == 1  # NULL <-> NULL
    assert row["n_changed"] == 2    # NULL -> text and text -> NULL
    assert row["n_added"] == 0 and row["n_removed"] == 0


def test_drift_report_handles_null_keys(spark):
    """A NULL source is a real cohort with a correct p_s (null-safe grid
    join), and NULL values land in a NULL bin credited to their source."""
    from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
        source_drift_report,
    )

    rows = [("a", 50)] * 10 + [(None, 50)] * 10
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r for r in
           source_drift_report(df, "source", "n_chars").collect()}
    # both cohorts have the identical (single-bin) distribution == corpus
    assert out["a"]["tvd"] == 0.0 and out[None]["tvd"] == 0.0
    assert out[None]["n_docs"] == 10

    rows2 = [("a", 50)] * 10 + [("b", None)] * 10
    df2 = spark.createDataFrame(rows2, "source string, n_chars long")
    out2 = {r["source"]: r for r in
            source_drift_report(df2, "source", "n_chars").collect()}
    # each source fully owns its bin: tvd = |1-0.5|/2 + |0-0.5|/2 = 0.5
    assert out2["a"]["tvd"] == 0.5 and out2["b"]["tvd"] == 0.5


def test_embed_stats_saturate_instead_of_wrapping(spark, poison_emb_dir):
    """The 1e30-magnitude poison vector saturates the quantized sums; the
    impossible negative mean_sq of a wrapped long sum must never appear,
    and max_v still exposes the outlier."""
    spec = next(s for s in CATALOG if s.name == "x_embed_stats")
    rows = spec.build(spark, poison_emb_dir).collect()
    assert all(r["mean_sq"] >= 0.0 for r in rows)
    assert max(r["max_v"] for r in rows) == pytest.approx(1e30, rel=1e-6)


def test_semdedup_inc_tiny_corpus_oracle_parity(spark, tmp_path):
    """Builder/oracle seed agreement when the stored corpus has fewer rows
    than the k floor (n < 10 -> cutoff < 8): both sides must seed from the
    STORED corpus only — an oracle c0 that selected vec_id < 8 from ALL
    embeddings would pull batch vectors into the seed set and diverge."""
    from tests.oracle_harness import compare, duckdb_conn

    d = str(tmp_path)
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    # 9 rows -> cutoff = 7: vec_ids 7, 8 are the batch; seed floor 8 > 7.
    # Vector 7 points far from every stored vector, so a seed set that
    # wrongly included it would move centroids and change assignments.
    con.execute(
        "CREATE TABLE emb AS SELECT CAST(i AS BIGINT) AS vec_id,"
        " CASE WHEN i < 7 THEN [CAST(1.0 + 0.01*i AS FLOAT),"
        "                       CAST(0.01*i AS FLOAT),"
        "                       CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT)]"
        "      ELSE [CAST(-0.01*i AS FLOAT), CAST(1.0 AS FLOAT),"
        "            CAST(-0.3 AS FLOAT), CAST(0.05 AS FLOAT)] END"
        " AS embedding, CAST(i % 3 AS INT) AS label"
        " FROM range(9) t(i)"
    )
    con.execute(f"COPY emb TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()

    spec = next(s for s in CATALOG if s.name == "x_dedup_semdedup_inc")
    spark_pdf = spec.build(spark, d).toPandas()
    ocon = duckdb_conn(d)
    oracle_pdf = ocon.execute(spec.oracle).fetchdf()
    ocon.close()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, "; ".join(problems)


@pytest.mark.parametrize("name", ["x_dedup_semdedup", "x_dedup_semdedup_inc"])
def test_semdedup_flood_corpus_oracle_parity(spark, tmp_path, name):
    """The boilerplate-flood poster case END TO END (r11): 400 of 500
    vectors are byte-identical. The entries route through the
    collapse='star' pair stage — the flood costs 399 star edges instead
    of ~80k in-cell cosines — and the keep set must still hash-match the
    DuckDB oracle, which replays the FULL quadratic pair graph. For the
    incremental entry the cutoff (400) lands inside the flood, so the
    identity group mixes stored and batch members — exactly the shape
    where a wrong rep choice would let a batch duplicate survive."""
    from tests.oracle_harness import compare, duckdb_conn

    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE emb AS SELECT CAST(i AS BIGINT) AS vec_id,"
        " CASE WHEN i < 100 THEN"
        "   [CAST(1.0 + 0.03*(i % 10) AS FLOAT),"
        "    CAST(0.05*(i // 10) AS FLOAT),"
        "    CAST(0.1 + 0.02*(i % 7) AS FLOAT), CAST(0.2 AS FLOAT)]"
        " ELSE [CAST(0.0 AS FLOAT), CAST(0.9 AS FLOAT),"
        "       CAST(-0.2 AS FLOAT), CAST(-0.7 AS FLOAT)] END"
        " AS embedding, CAST(i % 3 AS INT) AS label"
        " FROM range(500) t(i)"
    )
    con.execute(f"COPY emb TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()

    spec = next(s for s in CATALOG if s.name == name)
    spark_pdf = spec.build(spark, d).toPandas()
    ocon = duckdb_conn(d)
    oracle_pdf = ocon.execute(spec.oracle).fetchdf()
    ocon.close()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, "; ".join(problems)
    # the flood vector is built to stay under the 0.30 threshold against
    # every distinct-family vector (max cos ~0.21), so the flood is its
    # own component: full run keeps exactly its min id; the incremental
    # batch (ids 400+, all flood copies with stored twins) all dies
    kept = set(spark_pdf["vec_id"])
    if name == "x_dedup_semdedup":
        assert 100 in kept and not (set(range(101, 500)) & kept)
    else:
        assert not (set(range(400, 500)) & kept)
