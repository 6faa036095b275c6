"""Domain-table fixtures (FIXTURES.md §A): dirty customer_master and
vehicle_sales with deliberate duplicates, NULL/empty-string contacts, mixed
formats — the edge cases the reference's semantics live in.

Money columns are multiples of 0.25 (dyadic rationals): sums and averages
are then exact in float64 in any order, so Spark and DuckDB agree
bit-for-bit without decimal plumbing.
"""

from __future__ import annotations

import random
from datetime import date, datetime, timedelta

import pandas as pd

AS_OF = "2025-08-08"
_AS_OF_D = date(2025, 8, 8)

BRANCHES = ["FORD-MAIN", "TOYOTA-NORTH", "CHEV-SOUTH", "BMW-WEST"]
MAKES = ["Ford", "Toyota", "Chevrolet", "BMW", None]
MODELTYPES = ["NEW CAR", "New", "used suv", "USED", "Certified Pre-owned", "DEMO", None]
SALETYPES = ["CASH DEAL", "cash", "FINANCE", "Retail Finance", "LEASE-36", "Wholesale", None]
EMAILS = [
    "Good.Customer@Example.ORG ",   # valid (trailing space; example.org != example.com)
    "jane@dealer.net",
    "no@dealer.net",                # dummy prefix
    "nothanks@real.com",            # dummy prefix
    "bob@example.com",              # dummy domain
    "user@test.com",                # dummy domain
    "broken-at-nothing",            # fails shape
    "ok@sub.domain.co",
    "",                             # empty
    None,
]
PHONES = [
    "(555) 123-4567",   # 10 digits
    "555.987.6543",
    "123-45",           # too short
    "+1 (415) 555-0000",  # 11 digits
    "",
    None,
]
GENDERS = ["M", "Male", "MALE", "m", "F", "Female", "FEMALE", "f", "X", "", None]
NAMES = ["Alice", "Bob", "Carol", "Dave", "Eve", "", None]


def _money(rng: random.Random, lo: float, hi: float) -> float:
    return rng.randrange(int(lo * 4), int(hi * 4)) / 4.0


def _maybe(rng: random.Random, value, p_null: float = 0.1):
    return None if rng.random() < p_null else value


def _dt(rng: random.Random, max_days_back: int = 1600) -> datetime:
    return datetime(2025, 8, 8) - timedelta(
        days=rng.randrange(0, max_days_back), hours=rng.randrange(0, 24)
    )


def customer_master(n_customers: int = 220, n_rows: int = 400, seed: int = 7) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        custno = f"C{rng.randrange(1, n_customers + 1):05d}"
        birth = _maybe(
            rng, date(rng.randrange(1935, 2008), rng.randrange(1, 13), rng.randrange(1, 28)), 0.15
        )
        rows.append(
            {
                "custno": custno,
                "firstname": rng.choice(NAMES),
                "lastname": rng.choice(NAMES),
                "email": rng.choice(EMAILS),
                "telephone": rng.choice(PHONES),
                "address": _maybe(rng, f" {rng.randrange(1,999)} Main St "),
                "addresssecondline": _maybe(rng, "Apt 4", 0.6),
                "city": _maybe(rng, rng.choice(["Springfield", "  Rivertown"])),
                "state": _maybe(rng, rng.choice(["ca", "TX", "Ny", " wa "])),
                "ziporpostalcode": _maybe(rng, rng.choice(["94110", "9411O-123", "abc12345"])),
                "gender": rng.choice(GENDERS),
                "birthdate": birth,
                "preferredlanguage": _maybe(rng, rng.choice(["English", "Spanish"]), 0.5),
                "blockdatashare": _maybe(rng, rng.random() < 0.1, 0.3),
                "blockemail": _maybe(rng, rng.random() < 0.2, 0.3),
                "blockemailnational": _maybe(rng, rng.random() < 0.1, 0.3),
                "blockmail": _maybe(rng, rng.random() < 0.2, 0.3),
                "blockmailnational": _maybe(rng, rng.random() < 0.1, 0.3),
                "blockphone": _maybe(rng, rng.random() < 0.2, 0.3),
                "optoutflag": _maybe(rng, rng.random() < 0.15, 0.3),
                "optoutdate": _maybe(rng, _dt(rng), 0.7),
                "deletedataflag": _maybe(rng, rng.random() < 0.05, 0.5),
                "deletedatadate": _maybe(rng, _dt(rng), 0.9),
                "isdeleted": _maybe(rng, rng.random() < 0.05, 0.5),
                "lastservicedate": _maybe(rng, _dt(rng, 500), 0.25),
                "ytdpurchases": _maybe(rng, _money(rng, 0, 5000), 0.2),
                "totallabor": _maybe(rng, _money(rng, 0, 4000), 0.15),
                "totalparts": _maybe(rng, _money(rng, 0, 3000), 0.15),
                "lastupdated": _dt(rng, 800),
                "dateadded": _maybe(rng, _dt(rng, 4000), 0.05),
            }
        )
    df = pd.DataFrame(rows)
    # unique per row: dedup order is fully determined (no tie ambiguity)
    df["lastupdated"] = pd.to_datetime(df["lastupdated"]) + pd.to_timedelta(
        range(len(df)), unit="s"
    )
    for b in [
        "blockdatashare", "blockemail", "blockemailnational", "blockmail",
        "blockmailnational", "blockphone", "optoutflag", "deletedataflag", "isdeleted",
    ]:
        df[b] = df[b].astype("boolean")
    return df


def vehicle_sales(n_deals: int = 900, n_rows: int = 1200, n_customers: int = 220, seed: int = 11) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        dealno = f"D{rng.randrange(1, n_deals + 1):06d}"
        has_trade = rng.random() < 0.4
        contract = _maybe(rng, _dt(rng, 1600), 0.05)
        rows.append(
            {
                "dealno": dealno,
                "custno": _maybe(rng, f"C{rng.randrange(1, int(n_customers * 1.1)):05d}", 0.05),
                "vin": _maybe(rng, f"VIN{rng.randrange(1, 10**9):09d}", 0.05),
                "stockno": f"S{rng.randrange(1, 99999):05d}",
                "branch": _maybe(rng, rng.choice(BRANCHES), 0.05),
                "year": _maybe(rng, str(rng.randrange(2005, 2026))),
                "makename": rng.choice(MAKES),
                "modelname": _maybe(rng, rng.choice(["F-150", "Camry", "Silverado", "X3"])),
                "bodystyle": _maybe(rng, rng.choice(["Sedan", "SUV", "Truck"])),
                "color": _maybe(rng, rng.choice(["Red", "Blue", "Black", "White"])),
                "modeltype": rng.choice(MODELTYPES),
                "vehiclemileage": _maybe(rng, float(rng.randrange(0, 120000))),
                "saletype": rng.choice(SALETYPES),
                "dealtype": _maybe(rng, rng.choice(["Retail", "Wholesale"])),
                "cashprice": _money(rng, 5000, 80000),
                "costprice": _money(rng, 4000, 70000),
                "outthedoorprice": _maybe(rng, _money(rng, 5000, 90000), 0.05),
                "totalgross": _money(rng, -2000, 12000),
                "frontgross": _money(rng, -2000, 8000),
                "backgross": _money(rng, 0, 5000),
                "customercashdown": _maybe(rng, _money(rng, 0, 20000), 0.2),
                "totaldown": _maybe(rng, _money(rng, 0, 25000), 0.2),
                "financesource": _maybe(rng, rng.choice(["Ally", "Chase", "CapOne"]), 0.3),
                "financeamt": _maybe(rng, _money(rng, 0, 70000), 0.3),
                "apr": _maybe(rng, rng.randrange(0, 800) / 4.0 / 25.0, 0.3),
                "term": _maybe(rng, float(rng.choice([36, 48, 60, 72])), 0.3),
                "paymentamt": _maybe(rng, _money(rng, 100, 1500), 0.3),
                "trade1vin": f"TVIN{rng.randrange(1, 10**8):08d}" if has_trade else None,
                "trade1acv": _money(rng, 500, 30000) if has_trade else None,
                "trade1payoff": _maybe(rng, _money(rng, 0, 20000), 0.5) if has_trade else None,
                "nettrade1": _money(rng, -5000, 15000) if has_trade else None,
                "trade1year": str(rng.randrange(1998, 2024)) if has_trade else None,
                "trade1makename": rng.choice(["Honda", "Ford", None]) if has_trade else None,
                "trade1modelname": rng.choice(["Civic", "Focus", None]) if has_trade else None,
                "leasetype": _maybe(rng, "Closed", 0.8),
                "leasepayment": _maybe(rng, _money(rng, 200, 900), 0.8),
                "leasemileageallowance": _maybe(rng, float(rng.choice([10000, 12000, 15000])), 0.8),
                "leaseendvalue": _maybe(rng, _money(rng, 8000, 30000), 0.8),
                "warrantyfee": _maybe(rng, _money(rng, 0, 3000), 0.5),
                "weowesaletotal": _maybe(rng, _money(rng, 0, 2000), 0.7),
                "crmsalesmgrname": _maybe(rng, rng.choice(["Mgr A", "Mgr B"]), 0.2),
                "crmsp1name": _maybe(rng, rng.choice(["Sales X", "Sales Y"]), 0.2),
                "contractdate": contract,
                "salesdate": _maybe(rng, _dt(rng, 1600), 0.1),
                "rowlastupdatedutc": _dt(rng, 700),
            }
        )
    df = pd.DataFrame(rows)
    df["rowlastupdatedutc"] = pd.to_datetime(df["rowlastupdatedutc"]) + pd.to_timedelta(
        range(len(df)), unit="s"
    )
    return df


def write_fixtures(tmpdir: str) -> dict[str, str]:
    paths = {}
    for name, df in [("customer_master", customer_master()), ("vehicle_sales", vehicle_sales())]:
        path = f"{tmpdir}/{name}.parquet"
        # us precision: Spark's reader rejects TIMESTAMP(NANOS)
        df.to_parquet(
            path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        paths[name] = path
    return paths
