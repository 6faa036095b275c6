"""EP1 batch ETL tests: raw stringly CSV (quoted commas, header) -> typed
lake with MERGE idempotence; plus F24 ADF parsing and S2 lake layout."""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.functions.adf import parsed_lead
from automotive_data_pipeline_demo_spark.plans.etl import (
    run_vehicle_sales_etl,
    sql_over_frames,
)
from automotive_data_pipeline_demo_spark.sources.readers import read_csv_typed


HEADER = [
    "dealno", "custno", "vin", "branch", "saletype", "cashprice",
    "outthedoorprice", "term", "contractdate", "salesdate", "rowlastupdatedutc",
]
ROWS = [
    # leading-zero ids must survive; quoted comma in saletype
    ["001", "00042", "VIN1", "FORD-MAIN", "Cash, retail", "19999.50",
     "21000.00", "60", "2025-01-05 10:00:00", "2025-01-06 10:00:00",
     "2025-01-07 00:00:00"],
    ["002", "00043", "VIN2", "TOYOTA-NORTH", "FINANCE", "not-a-number",
     "31000.25", "72", "2025-02-01 09:00:00", "2025-02-02 09:00:00",
     "2025-02-03 00:00:00"],
    # fails quality filter: no vin
    ["003", "00044", "", "CHEV-SOUTH", "LEASE", "100", "200", "36",
     "2025-02-10 09:00:00", "2025-02-11 09:00:00", "2025-02-12 00:00:00"],
]


def _write_csv(path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(HEADER)
        w.writerows(ROWS)


def test_typed_csv_reader(spark, tmp_path):
    p = str(tmp_path / "sales.csv")
    _write_csv(p)
    df = read_csv_typed(
        spark, p,
        {"dealno": "string", "custno": "string", "cashprice": "decimal(18,2)",
         "term": "decimal(18,0)", "contractdate": "timestamp",
         "missing_col": "string"},
    )
    rows = {r["dealno"]: r for r in df.collect()}
    assert rows["001"]["custno"] == "00042"          # leading zeros preserved
    assert float(rows["001"]["cashprice"]) == 19999.5
    assert rows["002"]["cashprice"] is None           # permissive cast -> NULL
    assert rows["001"]["missing_col"] is None         # schema evolution
    assert rows["001"]["contractdate"].year == 2025


def test_vehicle_sales_etl_end_to_end(spark, tmp_path):
    csv_path = str(tmp_path / "raw.csv")
    lake = str(tmp_path / "lake")
    _write_csv(csv_path)

    typed = run_vehicle_sales_etl(spark, csv_path, lake)
    assert typed.count() == 2  # row 003 dropped by quality filter (P2)

    out = spark.read.parquet(lake)
    assert out.count() == 2
    assert "sale_year=2025" in "".join(
        str(p) for p in (tmp_path / "lake").rglob("*") if p.is_dir()
    )  # hive-partitioned layout (S2)

    # re-run the same batch: idempotent (ST1)
    run_vehicle_sales_etl(spark, csv_path, lake)
    assert spark.read.parquet(lake).count() == 2

    # the empty-string vin arrives as NULL?  No: CSV empty -> empty string;
    # quality filter uses IS NOT NULL, so verify the actual semantics:
    # Spark CSV reads empty unquoted fields as NULL, matching the filter.
    assert spark.read.parquet(lake).filter(F.col("vin") == "").count() == 0


def test_sql_over_frames_surface(spark):
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    out = sql_over_frames(
        spark, "SELECT sum(v) AS s FROM frame WHERE id >= 1", frame=df
    )
    assert out.collect()[0]["s"] == 20


ADF_XML = """<?xml version="1.0"?>
<adf><prospect>
  <id>LEAD-77</id>
  <requestdate>2025-05-01T10:00:00</requestdate>
  <vehicle><year>2024</year><make>Ford</make><model>F-150</model></vehicle>
  <customer>
    <contact>
      <name part="first">Jane</name>
      <name part="last">Doe</name>
      <email>jane@ex.org</email>
      <phone>555-111-2222</phone>
    </contact>
    <comments>interested. SD_SESSION: sd_abc123</comments>
  </customer>
  <provider><service>web</service></provider>
</prospect></adf>"""


def test_adf_parsing(spark):
    df = spark.createDataFrame(
        [(ADF_XML,), ("<notxml",), (None,)], schema="raw_adf_xml string"
    )
    out = df.select(parsed_lead("raw_adf_xml").alias("lead")).select("lead.*").collect()
    ok = out[0]
    assert ok["lead_id"] == "LEAD-77"
    assert ok["first_name"] == "Jane" and ok["last_name"] == "Doe"
    assert ok["email"] == "jane@ex.org"
    assert ok["vehicle_make"] == "Ford"
    assert ok["session_id"] == "sd_abc123"
    assert ok["parse_error"] is None
    assert out[1]["parse_error"] and out[1]["parse_error"].startswith("xml")
    assert out[2]["parse_error"] == "empty"


def test_adf_childless_prospect_not_falsy(spark):
    """A childless <prospect/> Element is falsy; the parser must still scope
    extraction to it rather than silently falling back to the root (which
    here carries a decoy <id> that must NOT be picked up)."""
    xml = "<adf><id>DECOY</id><prospect/></adf>"
    df = spark.createDataFrame([(xml,)], schema="raw_adf_xml string")
    [row] = df.select(parsed_lead("raw_adf_xml").alias("l")).select("l.*").collect()
    assert row["lead_id"] is None
    assert row["parse_error"] is None


def test_pii_redaction_idempotent_and_counts(spark):
    """Redaction masks every email/phone shape, counts agree, and a second
    pass is a no-op (tokens carry no digits or '@')."""
    from pyspark.sql import functions as F

    from automotive_data_pipeline_demo_spark.operators.cleaning import (
        count_emails,
        count_phones,
        redact_pii,
    )

    rows = [
        ("a", "mail Jane.Doe+x@Corp.Example.ORG and (555) 010-1234 today"),
        ("b", "two mails x@y.io z@w.co, phone 555.010.9999"),
        ("c", "no pii here at all"),
        ("d", "digits 12345 but not a phone; at sign @ alone"),
    ]
    df = spark.createDataFrame(rows, "id string, t string")
    out = {r["id"]: r for r in df.select(
        "id",
        count_emails("t").alias("ne"),
        count_phones("t").alias("np"),
        redact_pii("t").alias("red"),
    ).collect()}
    assert (out["a"]["ne"], out["a"]["np"]) == (1, 1)
    assert "[EMAIL]" in out["a"]["red"] and "[PHONE]" in out["a"]["red"]
    assert "@" not in out["a"]["red"].replace("[EMAIL]", "")
    assert (out["b"]["ne"], out["b"]["np"]) == (2, 1)
    assert (out["c"]["ne"], out["c"]["np"]) == (0, 0)
    assert out["c"]["red"] == rows[2][1]
    assert (out["d"]["ne"], out["d"]["np"]) == (0, 0)

    red = df.select("id", redact_pii("t").alias("r1"))
    twice = red.select("id", "r1", redact_pii("r1").alias("r2"))
    assert twice.filter(F.col("r1") != F.col("r2")).count() == 0


def test_csv_typed_corrupt_capture(spark, tmp_path):
    """S1 PERMISSIVE mode: malformed rows land in _corrupt_record instead of
    being dropped (the reference's optimizePerformance=False 'quality over
    speed' contract, glue_vehicle_sales_etl.py:59)."""
    p = tmp_path / "in.csv"
    p.write_text('dealno,price\nD1,100.5\n"D2,not-a-number-and-unclosed\nD3,7\n')
    df = read_csv_typed(
        spark, str(p), {"dealno": "string", "price": "double"}, recursive=False
    )
    rows = {r["dealno"]: r for r in df.collect()}
    assert rows["D1"]["price"] == 100.5
    corrupt = [r for r in df.collect() if r["_corrupt_record"] is not None]
    assert corrupt, "malformed row was silently dropped"


def test_events_loader_normalizes_ts_schema_variants(spark, tmp_path, sf_smoke):
    """The driver has shipped events.parquet both as TIMESTAMP(NANOS)
    (surfaced as bigint under nanosAsLong) and as plain micros
    (TIMESTAMP_NTZ). catalog._t must normalize BOTH to TimestampType with
    identical instants so every downstream query and oracle is
    schema-variant-agnostic."""
    from automotive_data_pipeline_demo_spark.plans.catalog import _t

    real = _t(spark, sf_smoke, "events")
    assert real.schema["ts"].dataType.simpleString() == "timestamp"

    # synthesize the nanos-as-long variant from the same instants and check
    # the loader lands on the exact same timestamps
    nanos_dir = str(tmp_path / "nanos_variant")
    (
        real.withColumn(
            "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
        ).write.mode("overwrite").parquet(f"{nanos_dir}/events.parquet")
    )
    variant = _t(spark, nanos_dir, "events")
    assert variant.schema["ts"].dataType.simpleString() == "timestamp"
    a = real.select("event_id", "ts")
    b = variant.select("event_id", "ts")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_parquet_small_files(spark, tmp_path):
    """Many small part files collapse to the planned target count with
    identical content; an already-compact table is left untouched."""
    from automotive_data_pipeline_demo_spark.sources.compact import (
        compact_parquet,
        plan_compaction,
    )

    p = str(tmp_path / "lake")
    src = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    src.repartition(20).write.mode("overwrite").parquet(p)

    before = plan_compaction(spark, p, target_bytes=10 * 1024 * 1024)
    assert before["n_files"] == 20

    res = compact_parquet(spark, p, target_bytes=10 * 1024 * 1024)
    assert res["rewritten"] is True
    after = plan_compaction(spark, p, target_bytes=10 * 1024 * 1024)
    assert after["n_files"] == res["target_files"] < 20

    got = spark.read.parquet(p)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).collect()[0][0] == src.agg(F.sum("v")).collect()[0][0]

    # idempotent: second run is a no-op
    res2 = compact_parquet(spark, p, target_bytes=10 * 1024 * 1024)
    assert res2["rewritten"] is False


def test_encrypted_inbox_latest_selection_and_contract(spark, tmp_path):
    """S3/S4 analog: latest export per table wins (mtime, path tiebreak);
    the decrypt contract surfaces NotImplementedError without a cipher;
    an empty inbox yields an empty typed frame."""
    import os

    import pytest

    from automotive_data_pipeline_demo_spark.sources.inbox import (
        latest_file_per_table,
        list_inbox,
        read_latest_encrypted_inbox,
        xor_decryptor,
    )

    root = str(tmp_path / "inbox")
    enc = xor_decryptor(0x21)  # XOR is symmetric: encrypt with the same key
    for table, exports in {
        "sales": [("a.csv.gpg", 100, "k,v\n1,x"), ("b.csv.gpg", 200, "k,v\n2,y")],
        # identical mtimes: lexicographically-last path must win
        "leads": [("a.csv.gpg", 300, "k,v\n3,z"), ("c.csv.gpg", 300, "k,v\n4,w")],
    }.items():
        d = f"{root}/{table}"
        os.makedirs(d)
        for name, mtime, text in exports:
            p = f"{d}/{name}"
            with open(p, "wb") as fh:
                fh.write(enc(text.encode("utf-8")))
            os.utime(p, (mtime, mtime))

    latest = {
        r["table"]: r["path"]
        for r in latest_file_per_table(list_inbox(spark, root)).collect()
    }
    assert latest["sales"].endswith("b.csv.gpg")
    assert latest["leads"].endswith("c.csv.gpg")

    rows = read_latest_encrypted_inbox(
        spark, root, {"k": "bigint", "v": "string"}, decryptor=xor_decryptor(0x21)
    ).collect()
    assert {(r["k"], r["v"]) for r in rows} == {(2, "y"), (4, "w")}

    # default decryptor: the documented not-in-container contract
    with pytest.raises(Exception) as exc:
        read_latest_encrypted_inbox(spark, root, {"k": "bigint"}).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )

    empty = read_latest_encrypted_inbox(
        spark, str(tmp_path / "nothing_here"), {"k": "bigint"}
    )
    assert empty.count() == 0 and empty.columns == ["k"]


def test_encrypted_inbox_fixture_null_fields_roundtrip(spark, tmp_path):
    """The distributed export writer is NULL-safe: a NULL key/name/balance
    exports as an EMPTY CSV field and reads back as NULL through from_csv's
    permissive cast — poison rows round-trip instead of crashing the
    (table, gen) export task (r7 regression fix: int(NaN) raised)."""
    from automotive_data_pipeline_demo_spark.plans.catalog_recent_extensions import (
        q_s3_encrypted_inbox,
    )

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "alice", 10.5), (None, None, None), (2, "bob", None)],
        "c_custkey long, c_name string, c_acctbal double",
    ).write.parquet(f"{sf}/customer.parquet")

    rows = {
        (r["c_custkey"], r["c_name"], r["c_acctbal"], r["load_gen"])
        for r in q_s3_encrypted_inbox(spark, sf).collect()
    }
    assert rows == {
        (1, "alice", 10.5, 2),
        (None, None, None, 2),
        (2, "bob", None, 2),
    }


def test_encrypted_inbox_nonshared_fs_fails_loudly(spark, tmp_path, monkeypatch):
    """The entry asserts the driver-side listing discovers every file the
    executor-side write manifest reported: on a cluster whose inbox root is
    NOT a shared filesystem the executor-local writes are invisible to the
    driver, and the entry must raise instead of returning silently wrong
    (empty/partial) data."""
    import pytest

    import automotive_data_pipeline_demo_spark.plans.catalog_recent_extensions as m

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "alice", 10.5)], "c_custkey long, c_name string, c_acctbal double"
    ).write.parquet(f"{sf}/customer.parquet")

    def empty_listing(spark_, root, suffix=".csv.gpg"):
        return spark_.createDataFrame(
            [], schema="table string, path string, mtime_ms long, size long"
        )

    monkeypatch.setattr(m, "list_inbox", empty_listing)
    with pytest.raises(RuntimeError, match="shared"):
        m.q_s3_encrypted_inbox(spark, sf)


def test_read_lake_evolved_nulls_for_predrift_rows(spark, tmp_path):
    """Files written before a column existed surface NULL for it under the
    evolved read, and the plain reader still works on the base schema."""
    from automotive_data_pipeline_demo_spark.sources.readers import (
        read_lake_evolved,
        write_partitioned_lake,
    )

    out = str(tmp_path / "lake")
    old = spark.createDataFrame(
        [(1, 10.0, 1995), (2, 20.0, 1995)], "id long, amt double, yr int"
    )
    new = spark.createDataFrame(
        [(3, 30.0, 1996, True)], "id long, amt double, yr int, flag boolean"
    )
    write_partitioned_lake(old, out, ("yr",))
    write_partitioned_lake(new, out, ("yr",))
    lake = read_lake_evolved(spark, out)
    assert "flag" in lake.columns
    rows = {r["id"]: r["flag"] for r in lake.collect()}
    assert rows == {1: None, 2: None, 3: True}
    # re-running the writes is idempotent (dynamic partition overwrite)
    write_partitioned_lake(new, out, ("yr",))
    assert read_lake_evolved(spark, out).count() == 3


def test_redact_pii_ip_pass_order_and_idempotence(spark):
    """With ip_token set, dotted quads redact before the phone pass can
    half-consume them; emails keep priority; a second pass is a no-op."""
    from automotive_data_pipeline_demo_spark.operators.cleaning import redact_pii

    df = spark.createDataFrame(
        [
            (1, "from 192.168.001.100 call 555-123-4567"),
            (2, "mail a.b@c1.co at 10.0.0.1"),
            (3, "no pii here"),
        ],
        "id long, t string",
    )
    out = df.select(
        "id", redact_pii("t", ip_token="[IP]").alias("r")
    )
    rows = {r["id"]: r["r"] for r in out.collect()}
    assert rows[1] == "from [IP] call [PHONE]"
    assert rows[2] == "mail [EMAIL] at [IP]"
    assert rows[3] == "no pii here"
    twice = out.select(
        "id", (redact_pii("r", ip_token="[IP]") == F.col("r")).alias("same")
    )
    assert twice.filter(~F.col("same")).count() == 0


def test_ipv4_scan_octet_bounded(spark):
    """ADVICE r4: the IP pass must reject dotted quads with octets > 255
    while keeping zero-padded log-format quads; value-valid version-like
    strings (1.2.3.4) still redact by design (documented over-match)."""
    from automotive_data_pipeline_demo_spark.operators.cleaning import redact_pii

    df = spark.createDataFrame(
        [
            (1, "bogus 999.999.999.999 quad"),
            (2, "octet 256.1.1.1 too big"),
            (3, "padded 192.168.001.100 ok"),
            (4, "edge 255.255.255.255 ok"),
            (5, "version 1.2.3.4 ambiguous"),
        ],
        "id long, t string",
    )
    rows = {
        r["id"]: r["r"]
        for r in df.select(
            "id", redact_pii("t", ip_token="[IP]").alias("r")
        ).collect()
    }
    assert rows[1] == "bogus 999.999.999.999 quad"
    assert rows[2] == "octet 256.1.1.1 too big"
    assert rows[3] == "padded [IP] ok"
    assert rows[4] == "edge [IP] ok"
    assert rows[5] == "version [IP] ambiguous"
