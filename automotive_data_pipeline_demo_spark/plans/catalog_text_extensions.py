"""Training-data extensions: text stack (BASELINE.json north star).

Split out of ``plans/catalog.py`` purely mechanically (same specs, same
registration order — the hub imports the family modules in the original
section sequence, and each module registers its specs in original order).
Shared helpers and the spec registry live on the hub.
"""

from automotive_data_pipeline_demo_spark.plans.catalog import *  # noqa: F401,F403
from automotive_data_pipeline_demo_spark.plans.catalog import (  # noqa: F401
    _cents,
    _dec_sum,
    _register,
    _t,
)
from automotive_data_pipeline_demo_spark.functions.caching import (  # noqa: F401
    register_caches,
)


# --------------------------------------------------------------------------
# Training-data extensions (BASELINE.json north star)
# --------------------------------------------------------------------------

_COS_SQL = """
    list_aggregate(list_transform(list_zip(
        list_transform({a}, x -> CAST(x AS DOUBLE)),
        list_transform({b}, x -> CAST(x AS DOUBLE))),
      p -> p[1] * p[2]), 'sum')
    / (sqrt(list_aggregate(list_transform({a},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform({b},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
"""


def q_x_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: content-digest groupBy; shuffle carries 32-byte hashes,
    not documents.
    """
    docs = _t(spark, sf, "documents")
    return exact_dedup(docs, "doc_id", "text").select(
        "content_hash", "keep_id", "n_dups"
    )


_register(QuerySpec(
    name="x_dedup_exact",
    survey="north-star: exact dedup",
    build=q_x_dedup_exact,
    oracle="""
        SELECT md5(text) AS content_hash,
               MIN(CAST(doc_id AS BIGINT)) AS keep_id,
               COUNT(*) AS n_dups
        FROM documents GROUP BY 1
    """,
    tags=("dedup",),
))


def q_x_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: salted-md5 min over word shingles,
    banded bucket equi-join (no O(n^2) pair space).
    """
    docs = _t(spark, sf, "documents")
    # max_bucket_size=None: exact mode, pinned to the declarative oracle
    return minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=8, band_size=2, shingle_n=3,
        max_bucket_size=None,
    )


_register(QuerySpec(
    name="x_dedup_minhash",
    survey="north-star: minhash LSH dedup",
    build=q_x_dedup_minhash,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id,
                   array_to_string(toks[i : i + 2], ' ') AS sh
            FROM toks,
                 UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx,
                 md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash
          FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        )
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
    """,
    tags=("dedup", "minhash"),
))


def q_x_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup dedup: docs >= 400 arrive as a new batch and are
    checked against the stored LSH band index of the existing corpus
    (doc_id < 400) — the daily-ingestion posture where the corpus is never
    re-shingled and its text is read only for band-hit candidates (a
    semi-join-pruned scan). Output: (new_id, dup_of, jaccard) — the batch
    rows to drop.
    """
    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    index = build_band_index(corpus, "doc_id", "text")
    # max_doc_freq=None pins exact-mode semantics to the declarative oracle
    # (the API default is the capped 100 TB-safe mode)
    return near_dup_against_index(
        batch, index, corpus, "doc_id", "text", threshold=0.3,
        max_doc_freq=None,
    )


_register(QuerySpec(
    name="x_dedup_incremental",
    survey="north-star: incremental dedup of a new batch vs a stored corpus index",
    build=q_x_dedup_incremental,
    oracle="""
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM tk, UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx, md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.id < 400 AND b.id >= 400
        ), sizes AS (
          SELECT id, COUNT(*) AS n FROM shingles GROUP BY 1
        ), inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_common
          FROM cand c
          JOIN shingles sa ON sa.id = c.id_a
          JOIN shingles sb ON sb.id = c.id_b AND sb.sh = sa.sh
          GROUP BY 1, 2
        )
        SELECT i.id_b AS new_id, i.id_a AS dup_of,
               ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) AS jaccard
        FROM inter i
        JOIN sizes za ON za.id = i.id_a
        JOIN sizes zb ON zb.id = i.id_b
        WHERE ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) >= 0.3
    """,
    tags=("dedup", "incremental"),
))


def q_x_text_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination, BOTH published modes in one tagged frame
    (the x_dedup_jaccard_capped fold pattern):

    - ``exact`` — corpus docs sharing any exact 8-gram with the held-out
      eval set (the GPT-3 verbatim-collision recipe;
      ``ngram_contamination``). Catches quoted answers.
    - ``fuzzy`` — short-gram (n=4) Jaccard >= 0.05 per (doc, eval-item)
      pair (``fuzzy_ngram_contamination``, the GPT-3/PaLM appendix
      thresholded recipe). Catches paraphrase-level leakage where no
      8-token run survives verbatim; on this synthetic corpus (copy-level
      contamination only) the two modes flag the same pairs — the planted
      paraphrase divergence is pinned in pytest.

    The eval set is a FIXED-SIZE slice (doc_id < 100) — real benchmarks
    don't grow with the corpus, and the broadcast gram set must stay
    constant-size at 100 TB (a fractional split like doc_id % 5 would
    broadcast 20% of the corpus). Per mode the corpus is scanned, never
    shuffled — only sparse hits pay the pair aggregation.
    """
    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") >= 100)
    bench = docs.filter(F.col("doc_id") < 100)
    exact = ngram_contamination(corpus, bench, "doc_id", "text", n=8).select(
        F.lit("exact").alias("mode"),
        F.col("id").alias("doc_id"),
        "benchmark_id",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    fz = fuzzy_ngram_contamination(
        corpus, bench, "doc_id", "text", n=4, min_jaccard=0.05
    )
    fuzzy = fz.select(
        F.lit("fuzzy").alias("mode"),
        F.col("id").alias("doc_id"),
        "benchmark_id",
        "n_shared",
        "jaccard",
    )
    # .select()/unionByName mint new DataFrame objects, so the operator's
    # cache tags must be re-adopted onto the frame this entry returns —
    # otherwise release_caches on the result frees nothing and the
    # corpus-scale gram frame stays pinned.
    return register_caches(exact.unionByName(fuzzy), fz)


_register(QuerySpec(
    name="x_text_contamination",
    survey="north-star: benchmark decontamination (exact + fuzzy/paraphrase n-gram modes)",
    build=q_x_text_contamination,
    oracle="""
        WITH tk AS MATERIALIZED (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), g8 AS (
          SELECT DISTINCT id, array_to_string(toks[i : i + 7], ' ') AS g
          FROM tk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), g4 AS MATERIALIZED (
          SELECT DISTINCT id, array_to_string(toks[i : i + 3], ' ') AS g
          FROM tk, UNNEST(range(1, greatest(len(toks) - 3, 1) + 1)) AS u(i)
        ), ex AS (
          SELECT 'exact' AS mode, c.id AS doc_id, b.id AS benchmark_id,
                 CAST(COUNT(*) AS BIGINT) AS n_shared,
                 CAST(NULL AS DOUBLE) AS jaccard
          FROM (SELECT * FROM g8 WHERE id >= 100) c
          JOIN (SELECT * FROM g8 WHERE id < 100) b USING (g)
          GROUP BY 2, 3
        ), sz AS (
          SELECT id, COUNT(*) AS n FROM g4 GROUP BY 1
        ), fh AS (
          SELECT c.id AS doc_id, b.id AS benchmark_id, COUNT(*) AS shared
          FROM (SELECT * FROM g4 WHERE id >= 100) c
          JOIN (SELECT * FROM g4 WHERE id < 100) b USING (g)
          GROUP BY 1, 2
        ), fz AS (
          SELECT 'fuzzy' AS mode, f.doc_id, f.benchmark_id,
                 CAST(f.shared AS BIGINT) AS n_shared,
                 ROUND(f.shared * 1.0 / (sa.n + sb.n - f.shared), 4) AS jaccard
          FROM fh f
          JOIN sz sa ON sa.id = f.doc_id
          JOIN sz sb ON sb.id = f.benchmark_id
          WHERE ROUND(f.shared * 1.0 / (sa.n + sb.n - f.shared), 4) >= 0.05
        )
        SELECT * FROM ex UNION ALL SELECT * FROM fz
    """,
    tags=("text", "decontamination"),
))


def q_x_text_overlap_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source leakage matrix: for every source pair, how many
    distinct 8-grams they share — the audit a curator runs before mixing
    corpora (one source quoting another inflates dedup losses and
    benchmark-contamination risk; decontamination's pairwise sibling).

    Scale shape: grams materialize once inside the scan as DISTINCT
    (source, gram) rows; a doc-frequency band [2, 10] drops both
    single-source grams (no pair can share them) and boilerplate grams
    BEFORE the self-join, exactly the hot-shingle capping discipline of
    minhash_candidate_pairs — the join fan-out is bounded by band_width^2
    per gram, never corpus^2. Output is one row per source pair (<=
    sources^2 / 2 rows, calendar-grain tiny).

    Measured growth (r13 band-occupancy probe, SWEEP_SF10.md footnote):
    banded grams and sum(df^2) both scale at exactly 10.0x for a 10x
    corpus step with max df 4 << the band ceiling — df is additionally
    bounded by the SOURCE dimension (constant as the corpus grows), so
    the 9.5x wall-clock ratio is the raw linear data step with no fixed
    overhead to amortize, not a super-linear trend.
    """
    docs = _t(spark, sf, "documents")
    # grams travel as 16-byte hash128 keys from the scan stage on: the key
    # is internal-only (output is per-source-pair COUNTS; the oracle groups
    # by gram text), and every downstream exchange — the (source, gram)
    # distinct, the df groupBy, and the banded self-join — carries two
    # longs instead of a ~60-char 8-gram string.
    g = docs.select(
        "source", F.explode(word_shingles(F.col("text"), 8)).alias("g")
    ).select("source", hash128("g").alias("g")).distinct()
    kept = (
        g.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= 10))
    )
    banded = g.join(kept.select("g"), "g")
    a = banded.select(F.col("source").alias("source_a"), "g")
    b = banded.select(F.col("source").alias("source_b"), "g")
    return (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


_register(QuerySpec(
    name="x_text_overlap_matrix",
    survey="north-star: cross-source n-gram overlap matrix (mixing audit)",
    build=q_x_text_overlap_matrix,
    oracle="""
        WITH tk AS (
          SELECT source,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), grams AS (
          SELECT DISTINCT source, array_to_string(toks[i : i + 7], ' ') AS g
          FROM tk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), kept AS (
          SELECT g FROM grams GROUP BY g
          HAVING COUNT(*) BETWEEN 2 AND 10
        ), banded AS (
          SELECT grams.source, grams.g FROM grams JOIN kept USING (g)
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM banded a JOIN banded b
          ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
    """,
    tags=("text", "decontamination", "audit"),
))


def q_x_dedup_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-dedup threshold sweep: pair counts at every candidate
    cosine cutoff in ONE pass over the blocked pair set — the
    knob-choosing report a curator reads before committing to a dedup
    threshold (SemDeDup's epsilon sweep). Pairs enumerate once at the
    loosest cutoff; each tighter cutoff is a conditional sum in the same
    single aggregate, not a re-join.
    """
    emb = _t(spark, sf, "embeddings")
    cuts = [0.20, 0.25, 0.30, 0.35, 0.40, 0.50]
    pairs = embedding_near_dup_pairs(emb, threshold=min(cuts), block_col="label")
    wide = pairs.agg(
        *[
            F.sum((F.col("score") >= F.lit(t)).cast("long")).alias(f"__n{i}")
            for i, t in enumerate(cuts)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.coalesce(F.col(f"__n{i}"), F.lit(0)).alias("n_pairs"),
            )
            for i, t in enumerate(cuts)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        F.col("r.threshold").alias("threshold"),
        F.col("r.n_pairs").alias("n_pairs"),
    )


_register(QuerySpec(
    name="x_dedup_threshold_sweep",
    survey="north-star: dedup threshold sweep (epsilon-selection report)",
    build=q_x_dedup_threshold_sweep,
    oracle=f"""
        WITH pairs AS (
          SELECT ROUND({_COS_SQL.format(a="a.embedding", b="b.embedding")}, 4)
                   AS score
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
        )
        SELECT threshold, CAST(COALESCE(SUM(CASE WHEN score >= threshold
                               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
        FROM pairs, (SELECT UNNEST(CAST([0.20, 0.25, 0.30, 0.35, 0.40, 0.50]
                                        AS DOUBLE[])) AS threshold) t
        WHERE score >= 0.20
        GROUP BY threshold
    """,
    tags=("dedup", "embedding", "report"),
))


def q_x_dedup_jaccard_capped(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram Jaccard near-dup scoring, BOTH modes in one tagged frame
    (the former x_dedup_jaccard entry folded in r8 — one driver-window
    slot, both oracles intact):

    - ``mode='exact'``: uncapped Jaccard over the full shingle universe —
      the exact verifier that runs on LSH candidates at scale
      (max_doc_freq=None pins the declarative oracle).
    - ``mode='capped'``: the mandatory 100 TB knob. A shingle in d docs
      yields d(d-1)/2 pairs, so one boilerplate shingle in a million docs
      is 5e11 pairs; ``max_doc_freq`` drops shingles above the cap and
      Jaccard is computed over the CAPPED universe (intersections and set
      sizes both exclude dropped shingles). The oracle recomputes that
      capped universe exactly; each mode keeps the 4-exchange budget (the
      doc-frequency window reuses the shingle exchange), and the union
      adds none.
    """
    docs = _t(spark, sf, "documents")
    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, shingle_n=3, max_doc_freq=None
    ).select(F.lit("exact").alias("mode"), "id_a", "id_b", "jaccard")
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, shingle_n=3, max_doc_freq=5
    ).select(F.lit("capped").alias("mode"), "id_a", "id_b", "jaccard")
    return exact.unionByName(capped)


_register(QuerySpec(
    name="x_dedup_jaccard_capped",
    survey="north-star: ngram jaccard dedup, exact + doc-frequency-capped modes",
    build=q_x_dedup_jaccard_capped,
    oracle="""
        -- shingles feeds BOTH union branches: MATERIALIZED, or DuckDB
        -- inlines the CTE chain once per branch (see verify SKILL.md)
        WITH toks AS MATERIALIZED (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS MATERIALIZED (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM toks,
                 UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), sizes AS (
          SELECT id, COUNT(*) AS n_shingles FROM shingles GROUP BY 1
        ), pairs AS (
          SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_common
          FROM shingles x JOIN shingles y ON x.sh = y.sh AND x.id < y.id
          GROUP BY 1, 2
        ), capped AS MATERIALIZED (
          SELECT id, sh FROM (
            SELECT id, sh, COUNT(*) OVER (PARTITION BY sh) AS dfreq
            FROM shingles
          ) WHERE dfreq <= 5
        ), csizes AS (
          SELECT id, COUNT(*) AS n_shingles FROM capped GROUP BY 1
        ), cpairs AS (
          SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_common
          FROM capped x JOIN capped y ON x.sh = y.sh AND x.id < y.id
          GROUP BY 1, 2
        )
        SELECT 'exact' AS mode, p.id_a, p.id_b,
               ROUND(p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common), 4)
                 AS jaccard
        FROM pairs p
        JOIN sizes sa ON p.id_a = sa.id
        JOIN sizes sb ON p.id_b = sb.id
        WHERE p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common) >= 0.3
        UNION ALL
        SELECT 'capped' AS mode, p.id_a, p.id_b,
               ROUND(p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common), 4)
                 AS jaccard
        FROM cpairs p
        JOIN csizes sa ON p.id_a = sa.id
        JOIN csizes sb ON p.id_b = sb.id
        WHERE p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common) >= 0.3
    """,
    tags=("dedup", "jaccard", "scale"),
))


def q_x_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash fingerprints (32-bit majority-vote over token hashes).
    Also verified against a pure-Python reference in tests; the SQL oracle
    re-derives every bit vote (md5 is the shared deterministic hash, hex ->
    int via DuckDB's '0x' cast, shifts/masks are portable).
    """
    docs = _t(spark, sf, "documents")
    return simhash(docs, "doc_id", "text", bits=32)


_register(QuerySpec(
    name="x_dedup_simhash",
    survey="north-star: simhash dedup",
    build=q_x_dedup_simhash,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM toks
        ), votes AS (
          SELECT id, j, SUM(((h >> j) & 1) * 2 - 1) AS v
          FROM hashed, UNNEST(range(0, 32)) AS u(j)
          GROUP BY 1, 2
        )
        SELECT id,
               CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j)
                        ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY id
    """,
    tags=("dedup", "simhash"),
))


def q_x_dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 via pigeonhole
    banding (4 disjoint 15-bit bands over a 60-bit fingerprint; pairs
    within radius 3 must agree on >= 1 band exactly). One exchange on
    (band, band_bits); Hamming verify is bit_count(xor) computed during
    JVM-side bucket expansion. 60-bit/15-bit-band geometry matters at
    scale: 8-bit bands give only 256 buckets/band, which exhausts once
    the corpus passes a few thousand docs and sends expansion quadratic
    (measured 233 s at sf1 vs ~6 s with 32k buckets/band).
    ``max_bucket_size=None`` keeps the entry declarative for the oracle
    (the default caps hot buckets).
    """
    docs = _t(spark, sf, "documents")
    return simhash_near_pairs(
        docs, "doc_id", "text", bits=60, max_hamming=3, max_bucket_size=None
    )


_register(QuerySpec(
    name="x_dedup_simhash_pairs",
    survey="north-star: simhash near-dup pairs (pigeonhole Hamming bands)",
    build=q_x_dedup_simhash_pairs,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
        ), votes AS (
          SELECT id, j, SUM(((h >> j) & 1) * 2 - 1) AS v
          FROM hashed, UNNEST(range(0, 60)) AS u(j)
          GROUP BY 1, 2
        ), fp AS (
          SELECT id,
                 CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j)
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY id
        ), bands AS (
          SELECT id, simhash, j AS band,
                 (simhash >> (j * 15)) & 32767 AS band_bits
          FROM fp, UNNEST(range(0, 4)) AS u(j)
        )
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_bits = b.band_bits AND a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("dedup", "simhash"),
))


def q_x_dedup_simhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash dedup survivors at the corpus-scale shape: 60-bit
    fingerprints, star edges within identical-fingerprint cohorts (linear,
    not clique), banding over DISTINCT fingerprints (15-bit bands = 32k
    buckets/band), components, anti-join losers. The scale companion to
    x_dedup_simhash_pairs' declarative clique.
    """
    docs = _t(spark, sf, "documents")
    return simhash_dedup(
        docs, "doc_id", "text", bits=60, max_hamming=3, max_bucket_size=None
    ).select("doc_id", "lang", "source", "n_chars")


_register(QuerySpec(
    name="x_dedup_simhash_dedup",
    survey="north-star: simhash dedup survivors (fingerprint-level banding)",
    bench=True,
    build=q_x_dedup_simhash_dedup,
    oracle="""
        WITH RECURSIVE toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
        ), votes AS (
          SELECT id, j, SUM(((h >> j) & 1) * 2 - 1) AS v
          FROM hashed, UNNEST(range(0, 60)) AS u(j)
          GROUP BY 1, 2
        ), fp AS (
          SELECT id,
                 CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j)
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY id
        ), reps AS (
          SELECT simhash, MIN(id) AS rep FROM fp GROUP BY 1
        ), intra AS (
          SELECT r.rep AS id_a, f.id AS id_b
          FROM fp f JOIN reps r USING (simhash) WHERE f.id <> r.rep
        ), bands AS (
          SELECT rep AS id, simhash, j AS band,
                 (simhash >> (j * 15)) & 32767 AS band_bits
          FROM reps, UNNEST(range(0, 4)) AS u(j)
        ), inter AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_bits = b.band_bits AND a.id < b.id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ), alledges AS (
          SELECT id_a, id_b FROM intra UNION SELECT id_a, id_b FROM inter
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM alledges
          UNION
          SELECT id_b, id_a FROM alledges
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        ), losers AS (
          SELECT id FROM (SELECT id, MIN(lab) AS component FROM reach GROUP BY id)
          WHERE id <> component
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN losers l ON CAST(d.doc_id AS BIGINT) = l.id
        WHERE l.id IS NULL
    """,
    tags=("dedup", "simhash", "scale"),
))


def q_x_sim_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors — the exact ANN
    baseline. Query side broadcast; score is a JVM-side fold (zip_with +
    aggregate), no Python in the hot path.
    """
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=10)


_register(QuerySpec(
    name="x_sim_bruteforce",
    survey="north-star: ANN brute-force cosine",
    build=q_x_sim_bruteforce,
    oracle="""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5
        ), scored AS (
          SELECT q.query_id, e.vec_id,
                 ROUND(
                   list_aggregate(list_transform(list_zip(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(q.q_vec,   x -> CAST(x AS DOUBLE))),
                     p -> p[1] * p[2]), 'sum')
                   / (sqrt(list_aggregate(list_transform(e.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * sqrt(list_aggregate(list_transform(q.q_vec,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
                 AS score
          FROM embeddings e CROSS JOIN q
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id ASC) AS rn
          FROM scored
        )
        SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
    """,
    bench=True,
    tags=("similarity",),
))


def q_x_sim_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-LSH bucketed ANN (the 100 TB scale path; recall < 1 by design —
    tests assert recall against brute force). The hyperplanes are md5-derived
    pseudo-random components, so the bucketing itself is deterministic and
    the oracle re-derives the exact same buckets + per-bucket top-k in SQL.
    """
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_bucketed_topk(emb, queries, k=10, n_planes=8)


_register(QuerySpec(
    name="x_sim_lsh",
    survey="north-star: ANN sign-LSH",
    build=q_x_sim_lsh,
    oracle=f"""
        WITH proj AS (
          SELECT vec_id, p,
                 list_aggregate(list_transform(range(0, len(embedding)),
                   d -> CAST(embedding[d + 1] AS DOUBLE) *
                        (CAST('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
                                                 CAST(d AS VARCHAR)), 1, 8)
                              AS BIGINT) / 4294967296.0 - 0.5)),
                   'sum') AS proj
          FROM embeddings, UNNEST(range(0, 8)) AS u(p)
        ), buckets AS (
          SELECT vec_id,
                 string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, ''
                            ORDER BY p) AS bucket
          FROM proj GROUP BY vec_id
        ), c AS (
          SELECT e.vec_id, e.embedding AS c_vec, b.bucket
          FROM embeddings e JOIN buckets b USING (vec_id)
        ), q AS (
          SELECT e.vec_id AS query_id, e.embedding AS q_vec, b.bucket
          FROM embeddings e JOIN buckets b USING (vec_id)
          WHERE e.vec_id < 5
        ), scored AS (
          SELECT q.query_id, c.vec_id,
                 ROUND({_COS_SQL.format(a="c.c_vec", b="q.q_vec")}, 4) AS score
          FROM c JOIN q USING (bucket)
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id ASC) AS rn
          FROM scored
        )
        SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
    """,
    tags=("similarity", "lsh"),
))


def q_x_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Text quality metrics per document: token counts (whitespace + BPE-ish
    regex), distinct ratio, quality score — all codegen'd expressions.
    """
    docs = _t(spark, sf, "documents")

    def tok_stats(toks: F.Column) -> F.Column:
        nd = F.size(F.array_distinct(toks))
        return F.struct(
            nd.cast("int").alias("nd"),
            F.round(
                nd.cast("double")
                / F.greatest(F.size(toks), F.lit(1)).cast("double"),
                4,
            ).alias("ratio"),
        )

    # the distinct/ratio pair folds over ONE let-bound token array;
    # inlined, each reference re-tokenizes the document
    ts = bind_once(tokenize(F.col("text")), tok_stats)
    return docs.select(
        "doc_id",
        token_count_ws("text").cast("int").alias("n_tokens_ws"),
        token_count_bpe("text").cast("int").alias("n_tokens_bpe"),
        ts["nd"].alias("n_distinct_tokens"),
        ts["ratio"].alias("distinct_ratio"),
        F.round(quality_score("text").cast("double"), 2).alias("quality"),
    )


_register(QuerySpec(
    name="x_text_stats",
    survey="north-star: text quality scoring / token counting",
    build=q_x_text_stats,
    oracle="""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws_toks,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ), scored AS (
          SELECT doc_id, text, ws_toks, toks,
                 len(list_distinct(toks)) AS n_distinct,
                 len(toks) AS n_toks,
                 length(regexp_replace(text, '[\\sA-Za-z0-9]', '', 'g'))
                   / greatest(length(text), 1) AS punct_ratio,
                 len(list_filter(toks, x -> list_contains(
                     ['the','and','of','to','a','in','is','it','that','for'], x)))
                   / greatest(len(toks), 1) AS sw_ratio
          FROM t
        )
        SELECT doc_id,
               CAST(len(ws_toks) AS INT) AS n_tokens_ws,
               CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}'))
                  + len(regexp_extract_all(text, '[0-9]{1,3}'))
                  + len(regexp_extract_all(text, '[^\\sA-Za-z0-9]')) AS INT)
                 AS n_tokens_bpe,
               CAST(n_distinct AS INT) AS n_distinct_tokens,
               ROUND(CAST(n_distinct AS DOUBLE) / greatest(n_toks, 1), 4) AS distinct_ratio,
               ROUND(CAST(
                 (CASE WHEN n_toks >= 20 THEN 0.25 ELSE 0.0 END) +
                 (CASE WHEN punct_ratio < 0.2 THEN 0.25 ELSE 0.0 END) +
                 (CASE WHEN sw_ratio >= 0.05 THEN 0.25 ELSE 0.0 END) +
                 (CASE WHEN CAST(n_distinct AS DOUBLE) / greatest(n_toks, 1) >= 0.3
                       THEN 0.25 ELSE 0.0 END) AS DOUBLE), 2) AS quality
        FROM scored
    """,
    tags=("text",),
))


def q_x_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit argmax) + content fingerprint
    (md5 over the sorted distinct token set).
    """
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        language_id("text").alias("lang_guess"),
        doc_fingerprint("text").alias("fingerprint"),
    )


_register(QuerySpec(
    name="x_text_langid",
    survey="north-star: language id / fingerprinting",
    build=q_x_text_langid,
    oracle="""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ), hits AS (
          SELECT doc_id, toks,
                 len(list_filter(toks, x -> list_contains(
                   ['the','and','of','to','a','in','is','it','that','for'], x))) AS en,
                 len(list_filter(toks, x -> list_contains(
                   ['el','la','de','que','y','en','un','es','se','no'], x))) AS es,
                 len(list_filter(toks, x -> list_contains(
                   ['le','la','de','et','les','des','en','un','du','une'], x))) AS fr,
                 len(list_filter(toks, x -> list_contains(
                   ['der','die','und','das','von','zu','mit','den','ein','ist'], x))) AS de
          FROM t
        )
        SELECT doc_id,
               CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                    WHEN de >= en AND de >= es AND de >= fr
                         AND NOT (en >= de OR es >= de OR fr >= de) THEN 'de'
                    WHEN en >= es AND en >= fr AND en >= de THEN 'en'
                    WHEN es > en AND es >= fr AND es >= de THEN 'es'
                    WHEN fr > en AND fr > es AND fr >= de THEN 'fr'
                    ELSE 'de' END AS lang_guess,
               md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
        FROM hits
    """,
    tags=("text", "langid"),
))


def q_x_multimodal_bytes(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal binary plumbing: text payloads as opaque binary columns —
    byte length + sha256 digest (the no-decode media dedup fast path).
    The mapInPandas decode stub is exercised in tests (no SQL equivalent).
    """
    docs = _t(spark, sf, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("int").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )


_register(QuerySpec(
    name="x_multimodal_bytes",
    survey="north-star: multimodal binary columns",
    build=q_x_multimodal_bytes,
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               sha256(text) AS sha
        FROM documents
    """,
    tags=("multimodal",),
))


def q_x_text_nfc(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode NFC canonicalization ahead of exact dedup (x_dedup_exact):
    composed vs decomposed forms of the same text must hash identically.

    The fixture corpus is ASCII, so the builder appends a DECOMPOSED
    suffix (e + U+0301) to every document — the driver row then proves
    the UDF actually recomposes (changed is true everywhere and the
    normalized hash differs from the raw one); the oracle replays with
    DuckDB's native nfc_normalize. The normalization itself is the
    engine's second sanctioned pandas UDF (Catalyst has no Unicode
    normalization expression); the md5 stays JVM-side.
    """
    docs = _t(spark, sf, "documents")
    decomposed = F.concat(F.col("text"), F.lit(" café"))
    norm = nfc_normalize_text(decomposed)
    return docs.select(
        "doc_id",
        (norm != decomposed).alias("changed"),
        F.md5(norm).alias("norm_hash"),
    )


_register(QuerySpec(
    name="x_text_nfc",
    survey="north-star: text normalization (Unicode NFC, genuine-UDF class)",
    build=q_x_text_nfc,
    oracle="""
        SELECT doc_id,
               nfc_normalize(text || ' cafe' || chr(769))
                 <> (text || ' cafe' || chr(769)) AS changed,
               md5(nfc_normalize(text || ' cafe' || chr(769))) AS norm_hash
        FROM documents
    """,
    tags=("text", "normalize", "udf"),
))


def q_x_text_bpe_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """The BPE-training merge statistic: corpus-wide adjacent-symbol pair
    frequencies (character bigrams within tokens, weighted by token
    occurrence) — each merge round of byte-pair-encoding tokenizer
    training picks argmax of exactly this table.

    Scale shape mirrors x_text_tfidf: pair extraction is a row-local
    higher-order fold inside the scan stage (split to chars, zip_with
    the shifted slice); the only exchange is the pair-vocabulary-grain
    groupBy whose map-side combine moves one row per distinct pair per
    partition, and top-20 rides TakeOrderedAndProject — at 100 TB one
    merge round is one narrow pass plus a sketch-sized shuffle.
    """
    docs = _t(spark, sf, "documents")

    def pairs_of(w):
        chars = F.split(w, "")
        n = F.size(chars)
        return F.when(
            n >= 2,
            F.zip_with(
                F.slice(chars, 1, n - 1),
                F.slice(chars, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))

    pairs = docs.select(
        F.explode(
            F.flatten(F.transform(tokenize(F.col("text")), pairs_of))
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


_register(QuerySpec(
    name="x_text_bpe_pairs",
    survey="north-star: tokenizer training (BPE merge-pair statistics)",
    build=q_x_text_bpe_pairs,
    oracle="""
        WITH toks AS (
          SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-zA-Z0-9]+'),
                   x -> x <> '')) AS w
          FROM documents
        ), pairs AS (
          SELECT unnest(CASE WHEN length(w) >= 2
                   THEN list_transform(range(1, length(w)),
                          i -> substr(w, CAST(i AS INT), 1) || ' '
                               || substr(w, CAST(i AS INT) + 1, 1))
                   ELSE [] END) AS pair
          FROM toks
        )
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair
        ORDER BY cnt DESC, pair ASC LIMIT 20
    """,
    tags=("text", "tokenizer", "bpe"),
))


def q_x_multimodal_image_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-offset image-header parse over binary payloads, pure JVM.

    The testdata carries no image column, so the entry frames each
    document's bytes as a synthetic PNG / GIF89a / opaque payload (by
    doc_id mod 3, dimensions derived from doc_id) and then runs the REAL
    operator — ``image_dimensions`` reads format magic plus
    width/height straight out of the binary with substring/hex/conv
    expressions, no UDF, no decode library (the same parser is pytest-ed
    against byte-exact real PNG/GIF/BMP/JPEG headers). The oracle knows
    the ground-truth dimensions arithmetically, so a green row proves
    parse(frame(id)) round-trips: endianness, offsets, and magic
    detection are all load-bearing.

    Scale: header parsing is a narrow whole-stage-codegen projection —
    a resolution histogram over billions of stored images never leaves
    the JVM and shuffles only the final aggregate.
    """
    docs = _t(spark, sf, "documents")
    w = (F.lit(16) + F.col("doc_id") % 1905).cast("long")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 1065).cast("long")

    def be32(c):
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    def le16(c):
        return F.unhex(
            F.concat(
                F.lpad(F.hex(c % 256), 2, "0"),
                F.lpad(F.hex(F.shiftright(c, 8)), 2, "0"),
            )
        )

    filler = F.encode(F.substring("text", 1, 32), "utf-8")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG signature
        F.unhex(F.lit("0000000D")),          # IHDR length
        F.encode(F.lit("IHDR"), "utf-8"),
        be32(w),
        be32(h),
        filler,
    )
    gif = F.concat(F.encode(F.lit("GIF89a"), "utf-8"), le16(w), le16(h), filler)
    raw = F.concat(F.unhex(F.lit("00")), filler)  # opaque: not an image
    payload = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, gif)
        .otherwise(raw)
    )
    return docs.select(
        "doc_id", image_dimensions(payload).alias("__m")
    ).select("doc_id", "__m.format", "__m.width", "__m.height")


_register(QuerySpec(
    name="x_multimodal_image_meta",
    survey="north-star: multimodal binary columns (typed metadata extract)",
    build=q_x_multimodal_image_meta,
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'png'
                    WHEN doc_id % 3 = 1 THEN 'gif' END AS format,
               CASE WHEN doc_id % 3 < 2
                    THEN CAST(16 + doc_id % 1905 AS INT) END AS width,
               CASE WHEN doc_id % 3 < 2
                    THEN CAST(16 + (doc_id * 7) % 1065 AS INT) END AS height
        FROM documents
    """,
    tags=("multimodal",),
))


