"""Sources / sinks as oracle-checked round trips (SURVEY §2.1).

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


# --------------------------------------------------------------------------
# Sources / sinks exercised as oracle-checked round trips (SURVEY §2.1)
# --------------------------------------------------------------------------

def _scratch(sf: str, leaf: str) -> str:
    """Deterministic per-SF scratch path for round-trip entries,
    namespaced PER PROCESS: every write-then-read entry stages and reads
    within one driver process, but fixed paths keyed only by sf let two
    concurrent suites (pytest + window_check, a judge's repro session)
    race overwrite-vs-read — observed as a 0-row read and a py4j
    FileNotFound on scale_dpp_prune in r6. The pid suffix gives each
    process its own lake; /tmp is wiped with the container, so stale
    per-pid dirs cost nothing."""
    return (
        f"/tmp/spark_graft_lake/{os.getpid()}/"
        f"{os.path.basename(sf.rstrip('/'))}/{leaf}"
    )


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers.

    Pandas-UDF closures are cloudpickled BY REFERENCE to this module, so
    executors must be able to import it — true on a cluster via --py-files,
    but not guaranteed when the driver process imported us off an arbitrary
    sys.path entry. Zip the package once and addPyFile it (idempotent per
    session; harmless no-op cost otherwise).
    """
    flag = "__spark_graft_pkg_shipped__"
    jconf = spark.sparkContext.getConf()
    if jconf.get(flag, None) == "1":
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    zpath = f"/tmp/spark_graft_pkg_{os.getpid()}.zip"
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    jconf.set(flag, "1")


def q_p1_sql_over_frames(spark: SparkSession, sf: str) -> DataFrame:
    """P1/UD5: the sql-over-frames surface — frames in, SQL text, frame out.

    Mirrors the reference's ``sparkSqlQuery`` helper
    (glue_vehicle_sales_etl.py:28-36): register temp views, run Spark SQL.
    avg is computed as exact decimal sum / count so both engines emit
    bit-identical doubles.
    """
    return sql_over_frames(
        spark,
        """
        SELECT n.n_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
        FROM customer_v c JOIN nation_v n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
        customer_v=_t(spark, sf, "customer"),
        nation_v=_t(spark, sf, "nation"),
    )


_register(QuerySpec(
    name="p1_sql_over_frames",
    survey="P1,UD5",
    build=q_p1_sql_over_frames,
    oracle="""
        SELECT n.n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    tags=("sql_surface",),
))


def q_s1_csv_typed_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S1/P3: header CSV scan + explicit cast projection, proven by round trip.

    Writes the customer table as CSV, reads it back through the typed reader
    (all-string scan -> per-column cast, PERMISSIVE corrupt capture,
    missing-column tolerance — glue_vehicle_sales_etl.py:54-68, 190-266),
    and aggregates. Matching the oracle run over the original parquet proves
    the CSV path loses nothing: types, nulls, negative decimals.

    TIME-typed column deviation (SURVEY §7.3 hard spot #2): the reference
    schema carries a ``TIME`` column (``optouttime``,
    sql/redshift_table_schemas.sql:167-171) and Spark has no TimeType —
    the documented encoding is 'HH:MM:SS' string (or seconds-of-day int).
    Proven here round trip: a deterministic seconds-of-day value per
    customer is FORMATTED to the string encoding for the export, survives
    the CSV scan as a string, and parses back to the identical seconds —
    ``sum_optout_sec`` hashes against the oracle's direct integer sum, so
    the deviation loses nothing.
    """
    out = _scratch(sf, "customer_csv")
    c = _t(spark, sf, "customer")
    sec = F.col("c_custkey").cast("long") % F.lit(86400)
    hhmmss = F.concat_ws(
        ":",
        F.lpad((sec / 3600).cast("int").cast("string"), 2, "0"),
        F.lpad(((sec % 3600) / 60).cast("int").cast("string"), 2, "0"),
        F.lpad((sec % 60).cast("string"), 2, "0"),
    )
    c.withColumn("optouttime", hhmmss).write.mode("overwrite").option(
        "header", True
    ).csv(out)
    typed = read_csv_typed(
        spark,
        out,
        {
            "c_custkey": "bigint",
            "c_name": "string",
            "c_nationkey": "int",
            "c_acctbal": "double",
            "c_mktsegment": "string",
            "optouttime": "string",     # TIME has no Spark type (§7.3 #2)
            "loyalty_tier": "string",   # absent from the file -> typed NULL
        },
    )
    n_corrupt = (
        F.count("_corrupt_record")
        if "_corrupt_record" in typed.columns
        else F.sum(F.lit(0))
    )
    parsed_sec = (
        F.substring("optouttime", 1, 2).cast("long") * 3600
        + F.substring("optouttime", 4, 2).cast("long") * 60
        + F.substring("optouttime", 7, 2).cast("long")
    )
    return typed.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dec_sum("c_acctbal", "sum_bal"),
        F.count("loyalty_tier").alias("n_loyalty"),
        n_corrupt.alias("n_corrupt"),
        F.sum(parsed_sec).alias("sum_optout_sec"),
    )


_register(QuerySpec(
    name="s1_csv_typed_roundtrip",
    survey="S1,P3",
    build=q_s1_csv_typed_roundtrip,
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_rows,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
               CAST(0 AS BIGINT) AS n_loyalty, CAST(0 AS BIGINT) AS n_corrupt,
               -- the TIME encoding is format->parse lossless, so the
               -- round-tripped sum equals the direct seconds-of-day sum
               CAST(SUM(c_custkey % 86400) AS BIGINT) AS sum_optout_sec
        FROM customer GROUP BY c_mktsegment
    """,
    tags=("source", "csv"),
))


def q_s2_partitioned_lake(spark: SparkSession, sf: str) -> DataFrame:
    """S2/S6: hive-partitioned lake write + partition-pruned read-back.

    Writes orders partitioned by year with in-file date ordering
    (s3_upload_automation.py:187-224 key layout; SORTKEY analog), then reads
    back filtering one partition — the filter prunes to the single
    ``o_year=1996`` directory, the scan-side analog of Redshift's sortkey.
    """
    out = _scratch(sf, "orders_lake")
    o = _t(spark, sf, "orders").withColumn("o_year", F.year("o_orderdate"))
    write_partitioned_lake(o, out, ("o_year",), sort_within=("o_orderdate",))
    lake = read_lake(spark, out)
    return (
        lake.filter(F.col("o_year") == 1996)
        .groupBy(F.month("o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum("o_totalprice", "sum_price"),
        )
    )


_register(QuerySpec(
    name="s2_partitioned_lake",
    survey="S2,S6",
    build=q_s2_partitioned_lake,
    oracle="""
        SELECT month(o_orderdate) AS order_month, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE year(o_orderdate) = 1996
        GROUP BY month(o_orderdate)
    """,
    tags=("source", "lake", "partition_pruning"),
))


def q_s2_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """S2 under schema drift: a vendor adds a column between export batches
    (the DMS reality ApplyMapping absorbs column-by-column,
    glue_vehicle_sales_etl.py:190-266). Pre-1996 partitions are written
    WITHOUT ``o_big_ticket``; 1996+ partitions carry it. The evolved read
    (mergeSchema union-by-name) surfaces NULL for the old partitions — no
    historical rewrite — proven by aggregating the flag per year. Both
    writes use dynamic partition overwrite, so the entry is idempotent
    across re-runs.
    """
    out = _scratch(sf, "orders_lake_evolve")
    o = _t(spark, sf, "orders").withColumn("o_year", F.year("o_orderdate"))
    base = o.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_year"
    )
    write_partitioned_lake(base.filter(F.col("o_year") < 1996), out, ("o_year",))
    write_partitioned_lake(
        base.filter(F.col("o_year") >= 1996).withColumn(
            "o_big_ticket", F.col("o_totalprice") > F.lit(200000)
        ),
        out,
        ("o_year",),
    )
    lake = read_lake_evolved(spark, out)
    return lake.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_big_ticket"), 1)).alias("n_big_ticket"),
    )


_register(QuerySpec(
    name="s2_schema_evolution",
    survey="S2/S6 + P3: lake reads across schema drift (added columns)",
    build=q_s2_schema_evolution,
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               COUNT(*) AS n_orders,
               CAST(COUNT(CASE WHEN year(o_orderdate) >= 1996
                                AND o_totalprice > 200000
                          THEN 1 END) AS BIGINT) AS n_big_ticket
        FROM orders GROUP BY 1
    """,
    tags=("source", "lake", "schema_evolution"),
))


def q_s2_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S2 in a second columnar format: orders written as ORC (snappy) and
    read back through an aggregation the oracle computes from the
    original table — proving the ORC writer/reader round-trips values,
    dates, and decimals bit-for-bit. Warehouse exports are not always
    parquet; ORC is the other columnar lake format Spark ships natively.
    """
    out = _scratch(sf, "orders_orc")
    o = _t(spark, sf, "orders")
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum("o_totalprice", "sum_price"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
    )


_register(QuerySpec(
    name="s2_orc_roundtrip",
    survey="S2/S6: second columnar lake format (ORC round trip)",
    build=q_s2_orc_roundtrip,
    oracle="""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price,
               MAX(CAST(o_orderdate AS DATE)) AS last_order_date
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("source", "orc", "roundtrip"),
))


def q_s7_jsonl_sink_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S7/F18-F20/O2: Track-event assembly + JSONL sink, proven by round trip.

    Top-1000 orders by price (the reference's LIMIT-bounded activation pull,
    lambda_redshift_to_segment.py:207-208) are rendered as nested Segment
    Track events (:358-418), written through the JSONL sink, read back as
    text, and the identity fields re-extracted from the wire JSON. Matching
    the oracle (which computes the same fields straight from orders) proves
    struct assembly + JSON serialization round-trips exactly.
    """
    out = _scratch(sf, "track_events")
    o = _t(spark, sf, "orders")
    top = o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(1000)
    events = top.select(
        track_event_struct(
            user_id=mint_user_id("o_custkey"),
            event_name="Vehicle Purchased",
            msg_id=message_id("o_orderkey", "o_custkey"),
            timestamp=iso8601_noon("o_orderdate"),
            properties={
                "price": F.col("o_totalprice")
                .cast("decimal(18,2)")
                .cast("double"),
                "priority": F.col("o_orderpriority"),
            },
        ).alias("event")
    )
    write_jsonl_events(events, out)
    back = spark.read.text(out)
    return back.select(
        F.get_json_object("value", "$.messageId").alias("message_id"),
        F.get_json_object("value", "$.userId").alias("user_id"),
        F.get_json_object("value", "$.timestamp").alias("ts_iso"),
        F.get_json_object("value", "$.properties.price").cast("double").alias("price"),
        F.get_json_object("value", "$.properties.priority").alias("priority"),
    )


_register(QuerySpec(
    name="s7_jsonl_sink_roundtrip",
    survey="S7,F18,F19,F20,O2,UD2",
    build=q_s7_jsonl_sink_roundtrip,
    oracle="""
        SELECT 'vp_' || md5(o_orderkey || '_' || o_custkey) AS message_id,
               'AUTO-' || o_custkey AS user_id,
               strftime(o_orderdate, '%Y-%m-%dT12:00:00Z') AS ts_iso,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               o_orderpriority AS priority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000
    """,
    tags=("sink", "json"),
))


def q_s10_corrupt_jsonl(spark: SparkSession, sf: str) -> DataFrame:
    """S10 hardening: JSON-lines ingestion that QUARANTINES malformed
    payloads instead of dropping or failing. Writes the documents table as
    JSONL, plants three undecodable lines (truncated object, non-JSON
    text, bare array), reads back through the declared-schema PERMISSIVE
    reader, and classifies every line: parsed rows count under their lang,
    malformed lines under '__corrupt__' with the raw payload preserved for
    replay. The oracle proves zero silent loss: per-lang counts match the
    source exactly and the corrupt bucket is exactly the planted lines.
    """
    out = _scratch(sf, "documents_jsonl")
    docs = _t(spark, sf, "documents")
    docs.select("doc_id", "lang").write.mode("overwrite").json(out)
    bad = os.path.join(out, "part-99999-planted-bad.json")
    with open(bad, "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": 1, "lang": "en"\n')
        fh.write("definitely not json\n")
        fh.write('[1, 2, 3]\n')
    typed = read_jsonl_typed(
        spark, out, {"doc_id": "bigint", "lang": "string"}
    )
    category = (
        F.when(F.col("_corrupt_record").isNotNull(), F.lit("__corrupt__"))
        .otherwise(F.col("lang"))
    )
    return typed.groupBy(category.alias("category")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )


_register(QuerySpec(
    name="s10_corrupt_jsonl",
    survey="S10 + malformed-row capture (glue_vehicle_sales_etl.py:59)",
    build=q_s10_corrupt_jsonl,
    oracle="""
        SELECT lang AS category, CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM documents GROUP BY 1
        UNION ALL
        SELECT '__corrupt__', CAST(3 AS BIGINT)
    """,
    tags=("source", "json", "quarantine"),
))


def q_p4_softdelete_optout(spark: SparkSession, sf: str) -> DataFrame:
    """P4/P7/F17: soft-delete + GDPR opt-out filtering with NULL-able flags.

    Flags are derived deterministically from the data (no fixture columns
    exist for them); the operator under test is the reference's exact
    predicate shape: ``(isdeleted IS NULL OR isdeleted = false)`` — NULL
    must pass — and ``NOT COALESCE(opt_out, false)``
    (customer_360_views.sql:77-80, 603-608, 725-737).
    """
    c = _t(spark, sf, "customer")
    isdeleted = (
        F.when(F.col("c_acctbal") < 0, F.lit(True))
        .when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
    )
    opt_out = (
        F.when(F.col("c_custkey") % 5 == 0, F.lit(True))
        .when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
    )
    flagged = c.withColumn("isdeleted", isdeleted).withColumn("opt_out", opt_out)
    return (
        flagged.filter(
            (F.col("isdeleted").isNull() | (F.col("isdeleted") == F.lit(False)))
            & ~F.coalesce(F.col("opt_out"), F.lit(False))
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_marketable"),
            _dec_sum("c_acctbal", "sum_bal"),
        )
    )


_register(QuerySpec(
    name="p4_softdelete_optout",
    survey="P4,P7,F17",
    build=q_p4_softdelete_optout,
    oracle="""
        WITH flagged AS (
          SELECT *,
            CASE WHEN c_acctbal < 0 THEN TRUE
                 WHEN c_custkey % 7 = 0 THEN NULL ELSE FALSE END AS isdeleted,
            CASE WHEN c_custkey % 5 = 0 THEN TRUE
                 WHEN c_custkey % 11 = 0 THEN NULL ELSE FALSE END AS opt_out
          FROM customer)
        SELECT c_mktsegment, COUNT(*) AS n_marketable,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM flagged
        WHERE (isdeleted IS NULL OR isdeleted = FALSE)
          AND NOT COALESCE(opt_out, FALSE)
        GROUP BY c_mktsegment
    """,
    tags=("filter", "gdpr"),
))


def q_p12_validation(spark: SparkSession, sf: str) -> DataFrame:
    """P12: ingest-stream validation predicates (shape checks on raw events).

    The reference validates capture payloads with express-validator
    (api-server.js:106-156: notEmpty / isISO8601 / format checks); here the
    same gate is regex + null + range predicates counted per event type.
    """
    e = _t(spark, sf, "events")
    valid = (
        F.col("props").rlike(r'^[{]"k": [0-9]+[}]$')
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("value") >= 0)
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(valid, 1)).alias("n_valid"),
    )


_register(QuerySpec(
    name="p12_validation",
    survey="P12,A2",
    build=q_p12_validation,
    oracle="""
        SELECT event_type, COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE regexp_matches(props, '^[{]"k": [0-9]+[}]$')
                 AND ts IS NOT NULL AND user_id IS NOT NULL AND value >= 0)
                 AS n_valid
        FROM events GROUP BY event_type
    """,
    tags=("filter", "validation"),
))


def q_p_dq_report(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-quality gate over orders: required-column nulls,
    PK uniqueness, a value-range bound, and referential integrity against
    the customer dimension — ALL folded into one aggregate over one scan
    (the FK check rides as a broadcast left-join hit indicator). The
    single-pass report a pipeline can assert on before publishing.
    """
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return dq_report(
        o,
        not_null=("o_custkey", "o_orderdate"),
        unique=("o_orderkey",),
        ranges=(("totalprice_nonneg", F.col("o_totalprice") >= 0),),
        fk=(("o_custkey",), c, ("c_custkey",)),
    )


_register(QuerySpec(
    name="p_dq_report",
    survey="beyond-reference: single-pass DQ expectations (P11/P12 as a gate)",
    build=q_p_dq_report,
    oracle="""
        WITH j AS (
          SELECT o.*, CASE WHEN c.c_custkey IS NOT NULL THEN 1 END AS hit
          FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
            ON o.o_custkey = c.c_custkey
        ), agg AS (
          SELECT COUNT(*) AS n_rows,
                 SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v0,
                 SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v1,
                 COUNT(*) - COUNT(DISTINCT o_orderkey) AS v2,
                 SUM(CASE WHEN o_totalprice >= 0 THEN 0 ELSE 1 END) AS v3,
                 SUM(CASE WHEN o_custkey IS NOT NULL AND hit IS NULL
                     THEN 1 ELSE 0 END) AS v4
          FROM j
        )
        SELECT check_name, n_rows, n_violations,
               CAST(n_violations = 0 AS INT) AS passed
        FROM (
          SELECT 'not_null:o_custkey' AS check_name, n_rows,
                 CAST(v0 AS BIGINT) AS n_violations FROM agg
          UNION ALL SELECT 'not_null:o_orderdate', n_rows,
                 CAST(v1 AS BIGINT) FROM agg
          UNION ALL SELECT 'unique:o_orderkey', n_rows,
                 CAST(v2 AS BIGINT) FROM agg
          UNION ALL SELECT 'range:totalprice_nonneg', n_rows,
                 CAST(v3 AS BIGINT) FROM agg
          UNION ALL SELECT 'fk:o_custkey', n_rows,
                 CAST(v4 AS BIGINT) FROM agg
        )
    """,
    tags=("validation", "dq"),
))


def q_p_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-exact per-group winsorization: order amounts clamped to their
    priority class's [p05, p95] — the outlier-capping step a financial
    rollup runs before averaging so one fat-fingered deal can't move a
    segment metric. Percentiles are RANK-SELECTED values (the
    x_corpus_quantiles discipline), never interpolated: k = ceil(p*n) via
    pure integer math, so both engines pick the identical element and
    clamping is selection, not float arithmetic.

    One shuffle total: the rank window partitions by priority, the
    threshold aggregate reuses that partitioning (no second exchange),
    and the thresholds (one row per class) broadcast back onto the
    already-partitioned rows.
    """
    o = _t(spark, sf, "orders")
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_all = Window.partitionBy("o_orderpriority").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = o.select("o_orderkey", "o_orderpriority", "o_totalprice").withColumn(
        "rn", F.row_number().over(w_rank)
    ).withColumn("n", F.count(F.lit(1)).over(w_all))
    k_lo = F.expr("(n * 5 + 99) div 100")    # ceil(0.05 n), exact ints
    k_hi = F.expr("(n * 95 + 99) div 100")   # ceil(0.95 n)
    thresholds = (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("rn") == k_lo, F.col("o_totalprice"))).alias("lo"),
            F.min(F.when(F.col("rn") == k_hi, F.col("o_totalprice"))).alias("hi"),
        )
    )
    return (
        ranked.drop("rn", "n")
        .join(F.broadcast(thresholds), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
            .alias("price_winsorized"),
        )
    )


_register(QuerySpec(
    name="p_winsorize",
    survey="extension: rank-exact per-group winsorization (outlier capping)",
    build=q_p_winsorize,
    oracle="""
        WITH ranked AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders
        ), thresholds AS (
          SELECT o_orderpriority,
                 MIN(CASE WHEN rn = (n * 5 + 99) // 100
                          THEN o_totalprice END) AS lo,
                 MIN(CASE WHEN rn = (n * 95 + 99) // 100
                          THEN o_totalprice END) AS hi
          FROM ranked GROUP BY 1
        )
        SELECT r.o_orderkey, r.o_orderpriority, r.o_totalprice,
               LEAST(GREATEST(r.o_totalprice, t.lo), t.hi) AS price_winsorized
        FROM ranked r JOIN thresholds t USING (o_orderpriority)
    """,
    tags=("cleaning", "robust-stats"),
))


def q_f24_adf_parse(spark: SparkSession, sf: str) -> DataFrame:
    """F24/UD3: ADF/XML lead parsing — the engine's one genuine pandas UDF.

    ADF XML is synthesized deterministically per customer, parsed with the
    Arrow-batched XML parser (api-server.js:28, 228-245 semantics: contact
    names by part attribute, vehicle interest, session id mined from
    comments). The oracle computes the expected fields directly from the
    generating columns, so the parser is checked against ground truth rather
    than against another XML library.
    """
    _ship_package(spark)  # pandas UDF: workers must import this package
    c = _t(spark, sf, "customer")
    ck = F.col("c_custkey").cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><adf><prospect><id>LEAD-'), ck,
        F.lit('</id><customer><contact><name part="first">F'), ck,
        F.lit('</name><name part="last">'), F.col("c_name"),
        F.lit('</name><email>cust'), ck,
        F.lit('@example.com</email><phone>555-'),
        F.lpad(ck, 7, "0"),
        F.lit("</phone></contact></customer><vehicle><year>"),
        (F.lit(1990) + F.col("c_custkey") % 10).cast("string"),
        F.lit("</year><make>MAKE"), (F.col("c_custkey") % 5).cast("string"),
        F.lit("</make><model>MODEL"), (F.col("c_custkey") % 3).cast("string"),
        F.lit("</model></vehicle><comments>"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("SD_SESSION: sess_"), ck),
        ).otherwise(F.lit("no session")),
        F.lit("</comments></prospect></adf>"),
    )
    lead = parsed_lead(xml)
    return c.select(
        "c_custkey",
        lead.getField("lead_id").alias("lead_id"),
        lead.getField("first_name").alias("first_name"),
        lead.getField("last_name").alias("last_name"),
        lead.getField("email").alias("email"),
        lead.getField("phone").alias("phone"),
        lead.getField("vehicle_year").alias("vehicle_year"),
        lead.getField("vehicle_make").alias("vehicle_make"),
        lead.getField("vehicle_model").alias("vehicle_model"),
        lead.getField("session_id").alias("session_id"),
    )


_register(QuerySpec(
    name="f24_adf_parse",
    survey="F24,UD3",
    build=q_f24_adf_parse,
    oracle="""
        SELECT c_custkey,
               'LEAD-' || c_custkey AS lead_id,
               'F' || c_custkey AS first_name,
               c_name AS last_name,
               'cust' || c_custkey || '@example.com' AS email,
               '555-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS phone,
               CAST(1990 + c_custkey % 10 AS VARCHAR) AS vehicle_year,
               'MAKE' || (c_custkey % 5) AS vehicle_make,
               'MODEL' || (c_custkey % 3) AS vehicle_model,
               CASE WHEN c_custkey % 3 = 0 THEN 'sess_' || c_custkey END AS session_id
        FROM customer
    """,
    tags=("udf", "xml"),
))


def q_st7_retention(spark: SparkSession, sf: str) -> DataFrame:
    """ST7: GDPR retention sweep — expire rows older than the cutoff.

    The reference deletes unmatched sessions past 2 years
    (database-schema.sql:364-380); here the window is 14 days before the
    fixed as-of so both branches are populated. Output reports what a
    filtered-rewrite would keep vs drop per event type (A2 conditional
    counts), with the newest surviving day as an audit column.
    """
    e = _t(spark, sf, "events")
    cutoff = F.to_timestamp(
        F.date_sub(F.to_date(F.lit(EVENTS_AS_OF)), 14)
    )
    keep = F.col("ts") >= cutoff
    return e.groupBy("event_type").agg(
        F.count(F.when(keep, 1)).alias("n_retained"),
        F.count(F.when(~keep, 1)).alias("n_expired"),
        F.max(F.when(keep, F.to_date("ts"))).alias("newest_retained_day"),
    )


_register(QuerySpec(
    name="st7_retention",
    survey="ST7,A2,F12",
    build=q_st7_retention,
    oracle=f"""
        SELECT event_type,
               COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{{EVENTS_AS_OF}}' - INTERVAL 14 DAY)
                 AS n_retained,
               COUNT(*) FILTER (WHERE ts <  TIMESTAMP '{{EVENTS_AS_OF}}' - INTERVAL 14 DAY)
                 AS n_expired,
               MAX(CASE WHEN ts >= TIMESTAMP '{{EVENTS_AS_OF}}' - INTERVAL 14 DAY
                        THEN CAST(ts AS DATE) END) AS newest_retained_day
        FROM events GROUP BY event_type
    """.replace("{EVENTS_AS_OF}", EVENTS_AS_OF),
    tags=("retention",),
))


