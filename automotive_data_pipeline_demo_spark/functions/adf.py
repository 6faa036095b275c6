"""ADF/XML lead parsing (F24) — the engine's one genuine UDF.

Reference parity: the identity API parses ADF (Auto-lead Data Format) XML
from CRM emails into {lead id, customer contact, vehicle interest, session
id} (identity-resolution/api-server.js:28, 228-245; shape README.md:70-79).

Implemented as an Arrow-batched pandas UDF returning a struct — XML needs
an imperative parser, but the per-batch vectorization keeps serde costs at
Arrow-batch granularity, not per-row.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ADF_SCHEMA = T.StructType(
    [
        T.StructField("lead_id", T.StringType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("vehicle_year", T.StringType(), True),
        T.StructField("vehicle_make", T.StringType(), True),
        T.StructField("vehicle_model", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)

# digital-retailing session ids ride in comments/provider fields
# (website-tracker.js:171, 206)
_SESSION_RE = re.compile(r"(?:SD_SESSION|session[_-]?id)[:=]\s*([A-Za-z0-9_-]+)", re.I)


def _text(root: ET.Element, path: str) -> str | None:
    el = root.find(path)
    return el.text.strip() if el is not None and el.text else None


def _parse_one(xml: str | None) -> dict:
    out = dict.fromkeys(
        ["lead_id", "first_name", "last_name", "email", "phone",
         "vehicle_year", "vehicle_make", "vehicle_model", "session_id",
         "parse_error"]
    )
    if not xml:
        out["parse_error"] = "empty"
        return out
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        out["parse_error"] = f"xml: {exc}"
        return out
    try:
        found = root.find(".//prospect")
        # explicit None test: a childless <prospect/> Element is FALSY, so
        # `found or root` would silently fall back to parsing the root
        prospect = root if found is None else found
        out["lead_id"] = _text(prospect, ".//id")
        names = prospect.findall(".//customer//name")
        for n in names:
            part = (n.get("part") or "").lower()
            if part == "first":
                out["first_name"] = (n.text or "").strip() or None
            elif part == "last":
                out["last_name"] = (n.text or "").strip() or None
        out["email"] = _text(prospect, ".//customer//email")
        out["phone"] = _text(prospect, ".//customer//phone")
        out["vehicle_year"] = _text(prospect, ".//vehicle/year")
        out["vehicle_make"] = _text(prospect, ".//vehicle/make")
        out["vehicle_model"] = _text(prospect, ".//vehicle/model")
        comments = " ".join(
            (c.text or "") for c in prospect.findall(".//comments")
        ) + " " + (_text(prospect, ".//provider/service") or "")
        m = _SESSION_RE.search(comments)
        if m:
            out["session_id"] = m.group(1)
    except Exception as exc:  # pragma: no cover - defensive
        # one malformed-but-parseable record must not kill the whole Arrow
        # batch (and with it the stage) on a 100 TB feed
        out["parse_error"] = f"extract: {type(exc).__name__}: {exc}"
    return out


@F.pandas_udf(ADF_SCHEMA)
def parse_adf(xml_col: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_parse_one(x) for x in xml_col])


def parsed_lead(xml_col: Column | str) -> Column:
    """Column expression: raw ADF XML -> typed lead struct."""
    c = F.col(xml_col) if isinstance(xml_col, str) else xml_col
    return parse_adf(c)
