"""The customer-360 view DAG (reference: sql/customer_360_views.sql).

Six views as DataFrame builders. Catalyst inlines the DAG into one logical
plan per query — filters push through view boundaries, columns prune at the
scan (EP2, SURVEY §3).

Determinism deltas vs the reference (documented, SURVEY §7.4):
- ``as_of`` parameter replaces CURRENT_DATE (hard spot #4);
- every ROW_NUMBER window carries a unique tiebreaker (the reference's are
  nondeterministic on ties);
- ARRAY_AGG(DISTINCT x ORDER BY d DESC) is reproduced as
  ordered-distinct-array (hard spot #1): values ordered by their latest d.

Scale notes: profile dedup (W1) and deal dedup (W2) each shuffle once on
their key. customer_segments reuses the user_id partitioning of both inputs;
at 100 TB pre-bucketing customer_master and vehicle_sales by custno makes
the whole DAG shuffle-light. The segments aggregation is partial-agg
friendly (no distinct aggregates in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.operators.arrays import ordered_distinct_array
from automotive_data_pipeline_demo_spark.operators.dedup import (
    dedup_latest,
    sequence_number,
)

# Exact reference regexes (sql/customer_360_views.sql:93-101). The unescaped
# dots are faithful: the reference treats '.' as regex-any.
DUMMY_EMAIL_PREFIX = r"(?i)^(no|nothanks|none|noemail|no.email|na)@"
DUMMY_EMAIL_DOMAIN = r"(?i)(@example.com|@test.com|@invalid.com)"
EMAIL_SHAPE = r"(?i)@.+\..+"


def _clean_email(email: Column) -> Column:
    """sql/customer_360_views.sql:88-101 — checks run on the raw value."""
    return F.when(
        email.isNotNull()
        & (email != "")
        & ~email.rlike(DUMMY_EMAIL_PREFIX)
        & ~email.rlike(DUMMY_EMAIL_DOMAIN)
        & email.rlike(EMAIL_SHAPE),
        F.lower(F.trim(email)),
    ).otherwise(F.lit(None).cast("string"))


def _clean_phone(tel: Column) -> Column:
    """sql/customer_360_views.sql:103-109."""
    digits = F.regexp_replace(tel, r"[^0-9]", "")
    return F.when(
        tel.isNotNull() & (tel != "") & (F.length(digits) >= 10), digits
    ).otherwise(F.lit(None).cast("string"))


def _pg_concat(*cols: Column | str) -> Column:
    """Postgres/Redshift CONCAT treats NULL as '' (Spark concat -> NULL)."""
    out = []
    for c in cols:
        if isinstance(c, str):
            out.append(F.lit(c))
        else:
            out.append(F.coalesce(c.cast("string"), F.lit("")))
    return F.concat(*out)


def customer_profiles(customer_master: DataFrame, as_of: str) -> DataFrame:
    """marketing.customer_profiles (sql/customer_360_views.sql:23-186).

    W1 dedup -> clean/validate contacts -> demographics -> compliance flags.
    """
    as_of_d = F.to_date(F.lit(as_of))
    base = customer_master.filter(
        (F.col("isdeleted").isNull() | (F.col("isdeleted") == False))  # noqa: E712
        & (F.col("deletedataflag").isNull() | (F.col("deletedataflag") == False))  # noqa: E712
    )
    latest = dedup_latest(base, ["custno"], ["lastupdated"], tiebreakers=["dateadded"])

    email = F.col("email")
    tel = F.col("telephone")
    year_diff = F.year(as_of_d) - F.year(F.col("birthdate"))

    marketable = (
        F.col("firstname").isNotNull() & (F.col("firstname") != "")
        & F.col("lastname").isNotNull() & (F.col("lastname") != "")
        & (
            (email.isNotNull() & (email != "") & email.rlike(EMAIL_SHAPE))
            | (tel.isNotNull() & (tel != "")
               & (F.length(F.regexp_replace(tel, r"[^0-9]", "")) >= 10))
        )
    )

    return latest.filter(marketable).select(
        F.concat(F.lit("AUTO-"), F.col("custno")).alias("user_id"),
        "custno",
        "firstname",
        "lastname",
        _clean_email(email).alias("email"),
        _clean_phone(tel).alias("phone"),
        F.trim("address").alias("address"),
        F.trim("addresssecondline").alias("address2"),
        F.trim("city").alias("city"),
        F.upper(F.trim("state")).alias("state"),
        F.regexp_replace("ziporpostalcode", r"[^0-9-]", "").alias("zip"),
        F.when(F.col("gender").isin("M", "Male", "MALE", "m"), "Male")
        .when(F.col("gender").isin("F", "Female", "FEMALE", "f"), "Female")
        .otherwise("Unknown")
        .alias("gender"),
        "birthdate",
        F.when(F.col("birthdate").isNotNull(), year_diff).alias("age"),
        F.when(
            F.col("birthdate").isNotNull(),
            F.when(year_diff < 25, "Gen Z (Under 25)")
            .when(year_diff < 40, "Millennial (25-39)")
            .when(year_diff < 55, "Gen X (40-54)")
            .when(year_diff < 75, "Boomer (55-74)")
            .otherwise("Silent (75+)"),
        ).otherwise("Unknown").alias("generation"),
        F.coalesce("preferredlanguage", F.lit("English")).alias("preferred_language"),
        F.coalesce("blockemail", F.lit(False)).alias("email_opt_out"),
        F.coalesce("blockphone", F.lit(False)).alias("phone_opt_out"),
        F.coalesce("blockmail", F.lit(False)).alias("mail_opt_out"),
        F.coalesce("optoutflag", F.lit(False)).alias("marketing_opt_out"),
        F.col("optoutdate").alias("opt_out_date"),
        F.coalesce("ytdpurchases", F.lit(0).cast("decimal(18,2)")).alias("ytd_purchases"),
        F.coalesce(
            F.col("totallabor") + F.col("totalparts"), F.lit(0).cast("decimal(18,2)")
        ).alias("lifetime_service_value"),
        F.col("lastservicedate").alias("last_service_date"),
        F.when(F.col("lastservicedate").isNull(), "Never Serviced")
        .when(F.col("lastservicedate") >= F.date_sub(as_of_d, 90), "Recent (0-90 days)")
        .when(F.col("lastservicedate") >= F.date_sub(as_of_d, 180), "Moderate (91-180 days)")
        .when(F.col("lastservicedate") >= F.date_sub(as_of_d, 365), "Distant (181-365 days)")
        .otherwise("Inactive (365+ days)")
        .alias("service_recency"),
        F.col("dateadded").alias("customer_since"),
        (F.year(as_of_d) - F.year("dateadded")).alias("customer_tenure_years"),
        F.col("lastupdated").alias("last_updated"),
    )


def customer_vehicle_history(vehicle_sales: DataFrame, as_of: str) -> DataFrame:
    """marketing.customer_vehicle_history (sql/customer_360_views.sql:192-370).

    W2 deal dedup -> condition/transaction classify -> W3 purchase sequence
    -> recency buckets.
    """
    as_of_d = F.to_date(F.lit(as_of))
    base = vehicle_sales.filter(
        F.col("custno").isNotNull()
        & F.col("vin").isNotNull()
        & F.col("contractdate").isNotNull()
    )
    latest = dedup_latest(base, ["dealno"], ["rowlastupdatedutc"], tiebreakers=["vin"])

    projected = latest.select(
        F.concat(F.lit("AUTO-"), F.col("custno")).alias("user_id"),
        "custno",
        F.col("dealno").alias("deal_number"),
        "vin",
        F.col("stockno").alias("stock_number"),
        F.col("makename").alias("make"),
        F.col("modelname").alias("model"),
        "year",
        F.col("bodystyle").alias("body_style"),
        "color",
        F.when(F.lower("modeltype").contains("new"), "New")
        .when(F.lower("modeltype").contains("used"), "Used")
        .when(F.lower("modeltype").contains("certified"), "Certified Pre-Owned")
        .otherwise(F.col("modeltype"))
        .alias("vehicle_condition"),
        F.col("vehiclemileage").alias("odometer_reading"),
        F.when(F.lower("saletype").contains("cash"), "Cash")
        .when(F.lower("saletype").contains("finance"), "Financed")
        .when(F.lower("saletype").contains("lease"), "Lease")
        .otherwise(F.col("saletype"))
        .alias("transaction_type"),
        F.col("dealtype").alias("deal_category"),
        F.col("branch").alias("dealership_location"),
        F.col("cashprice").alias("vehicle_price"),
        F.col("outthedoorprice").alias("total_price"),
        F.col("costprice").alias("dealer_cost"),
        F.col("totalgross").alias("total_gross_profit"),
        F.col("frontgross").alias("vehicle_gross_profit"),
        F.col("backgross").alias("finance_insurance_profit"),
        F.col("customercashdown").alias("cash_down"),
        F.col("totaldown").alias("total_down_payment"),
        F.col("financesource").alias("lender"),
        F.col("financeamt").alias("amount_financed"),
        F.col("apr").alias("interest_rate"),
        F.col("term").alias("finance_term_months"),
        F.col("paymentamt").alias("monthly_payment"),
        F.col("trade1vin").alias("trade_vin"),
        F.col("trade1acv").alias("trade_actual_value"),
        F.col("trade1payoff").alias("trade_payoff"),
        F.col("nettrade1").alias("trade_equity"),
        _pg_concat(F.col("trade1year"), " ", F.col("trade1makename"), " ",
                   F.col("trade1modelname")).alias("trade_vehicle_description"),
        F.col("leasetype").alias("lease_type"),
        F.col("leasepayment").alias("lease_payment"),
        F.col("leasemileageallowance").alias("lease_mile_allowance"),
        F.col("leaseendvalue").alias("lease_residual_value"),
        F.col("crmsalesmgrname").alias("sales_manager"),
        F.col("crmsp1name").alias("salesperson"),
        F.col("contractdate").alias("purchase_date"),
        F.col("salesdate").alias("delivery_date"),
        F.datediff(as_of_d, F.to_date("contractdate")).alias("days_since_purchase"),
        F.when(F.col("contractdate") >= F.date_sub(as_of_d, 30).cast("timestamp"),
               "Recent (0-30 days)")
        .when(F.col("contractdate") >= F.date_sub(as_of_d, 90).cast("timestamp"),
              "Moderate (31-90 days)")
        .when(F.col("contractdate") >= F.date_sub(as_of_d, 365).cast("timestamp"),
              "Past Year (91-365 days)")
        .when(F.col("contractdate") >= F.date_sub(as_of_d, 1095).cast("timestamp"),
              "Historical (1-3 years)")
        .otherwise("Legacy (3+ years)")
        .alias("purchase_recency"),
        F.col("rowlastupdatedutc").alias("last_updated"),
    )
    return sequence_number(
        projected, ["custno"], ["purchase_date"],
        out_col="purchase_sequence", tiebreakers=["deal_number"],
    )


def customer_segments(
    profiles: DataFrame, history: DataFrame, as_of: str
) -> DataFrame:
    """marketing.customer_segments (sql/customer_360_views.sql:376-515).

    J1 left join -> A1/A2 per-customer aggregates -> A3 ordered-distinct
    arrays -> segment ladder + campaign flags.
    """
    as_of_d = F.to_date(F.lit(as_of))
    vh = history.select(
        F.col("user_id").alias("vh_user_id"),
        "deal_number", "total_price", "purchase_date", "make",
        "vehicle_condition", "transaction_type", "cash_down", "trade_vin",
        "trade_equity",
    )
    joined = profiles.join(vh, profiles.user_id == vh.vh_user_id, "left")

    grouped = joined.groupBy(
        "user_id", "custno", "firstname", "lastname", "email", "phone",
        "state", "zip", "age", "generation", "customer_tenure_years",
        "last_service_date", "lifetime_service_value",
    ).agg(
        F.count("deal_number").alias("total_purchases"),
        F.sum("total_price").alias("lifetime_purchase_value"),
        F.avg("total_price").alias("avg_purchase_value"),
        F.max("purchase_date").alias("last_purchase_date"),
        F.min("purchase_date").alias("first_purchase_date"),
        F.nullif(F.array_join(
            ordered_distinct_array(F.col("make"), F.col("purchase_date")), ","
        ), F.lit("")).alias("preferred_makes"),
        F.nullif(F.array_join(
            ordered_distinct_array(F.col("vehicle_condition"), F.col("purchase_date")),
            ",",
        ), F.lit("")).alias("purchase_patterns"),
        F.avg("cash_down").alias("avg_down_payment"),
        F.count(F.when(F.col("transaction_type") == "Cash", 1)).alias("cash_purchases"),
        F.count(F.when(F.col("transaction_type") == "Financed", 1)).alias("financed_purchases"),
        F.count(F.when(F.col("transaction_type") == "Lease", 1)).alias("lease_purchases"),
        F.count(F.when(F.col("trade_vin").isNotNull(), 1)).alias("trades_made"),
        F.avg("trade_equity").alias("avg_trade_equity"),
    )

    tlv = F.col("lifetime_purchase_value") + F.col("lifetime_service_value")
    days_since_purchase = F.datediff(as_of_d, F.to_date("last_purchase_date"))
    days_since_service = F.datediff(as_of_d, F.to_date("last_service_date"))

    return grouped.filter(
        F.col("email").isNotNull() | F.col("phone").isNotNull()
    ).select(
        "user_id", "custno", "firstname", "lastname", "email", "phone",
        "state", "zip", "age", "generation",
        "total_purchases",
        "lifetime_purchase_value",
        "lifetime_service_value",
        tlv.alias("total_lifetime_value"),
        "avg_purchase_value",
        "preferred_makes",
        "purchase_patterns",
        "avg_down_payment",
        "cash_purchases", "financed_purchases", "lease_purchases",
        "trades_made", "avg_trade_equity",
        "last_purchase_date", "first_purchase_date", "last_service_date",
        F.when(F.col("last_purchase_date").isNull(), 999999)
        .otherwise(days_since_purchase).alias("days_since_last_purchase"),
        F.when(F.col("last_service_date").isNull(), 999999)
        .otherwise(days_since_service).alias("days_since_last_service"),
        F.when(tlv >= 100000, "VIP")
        .when((tlv >= 50000) & (F.col("total_purchases") >= 2), "High Value Repeat")
        .when(tlv >= 25000, "High Value")
        .when(F.col("total_purchases") >= 2, "Repeat Customer")
        .when((F.col("total_purchases") == 1) & (days_since_purchase <= 365),
              "Recent First-Time")
        .when(F.col("total_purchases") == 1, "Historical First-Time")
        .when(F.col("lifetime_service_value") > 0, "Service Only")
        .otherwise("Prospect")
        .alias("customer_segment"),
        F.when(
            F.col("last_purchase_date") >= F.date_sub(as_of_d, 30).cast("timestamp"),
            True,
        ).otherwise(False).alias("recent_buyer"),
        F.when(
            (F.col("total_purchases") >= 2)
            & days_since_purchase.between(1095, 1460),
            True,
        ).otherwise(False).alias("trade_up_candidate"),
        F.when(
            F.col("last_service_date").isNotNull()
            & days_since_service.between(90, 180),
            True,
        ).otherwise(False).alias("service_due_candidate"),
        F.when(
            (F.col("lifetime_service_value") == 0)
            & F.col("last_purchase_date").isNotNull()
            & (days_since_purchase >= 90),
            True,
        ).otherwise(False).alias("service_acquisition_target"),
        "customer_tenure_years",
    )


def dealership_customer_profiles(
    vehicle_sales: DataFrame, profiles: DataFrame
) -> DataFrame:
    """marketing.dealership_customer_profiles (sql/customer_360_views.sql:521-608).

    A4 per-(customer, branch) aggregate -> W4 rank over aggregates -> J2
    inner join -> P7 opt-in filters. The rank runs over the tiny aggregated
    frame; only the groupBy shuffles the fact table.
    """
    lc = vehicle_sales.filter(
        F.col("custno").isNotNull() & F.col("branch").isNotNull()
    ).groupBy("custno", "branch").agg(
        F.count(F.lit(1)).alias("transaction_count"),
        F.max("contractdate").alias("last_transaction_date"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("custno").orderBy(
        F.col("transaction_count").desc(),
        F.col("last_transaction_date").desc(),
        F.col("branch").asc(),  # deterministic tiebreak (reference lacks one)
    )
    primary = (
        lc.withColumn("dealership_rank", F.row_number().over(w))
        .filter(F.col("dealership_rank") == 1)
        .withColumnRenamed("branch", "primary_dealership")
        .withColumnRenamed("custno", "lc_custno")
    )
    cp = profiles.filter(
        F.col("email").isNotNull()
        & (F.col("email_opt_out") == False)  # noqa: E712
        & (F.col("marketing_opt_out") == False)  # noqa: E712
    )
    j = cp.join(primary, cp.custno == primary.lc_custno, "inner")
    pd_col = F.col("primary_dealership")
    return j.select(
        F.when(pd_col == "FORD-MAIN", F.concat(F.lit("FORD-MAIN-"), F.col("custno")))
        .when(pd_col == "TOYOTA-NORTH", F.concat(F.lit("TOY-NORTH-"), F.col("custno")))
        .when(pd_col == "CHEV-SOUTH", F.concat(F.lit("CHEV-SOUTH-"), F.col("custno")))
        .otherwise(F.concat(F.lit("AUTO-"), pd_col, F.lit("-"), F.col("custno")))
        .alias("user_id"),
        "custno",
        F.col("firstname").alias("first_name"),
        F.col("lastname").alias("last_name"),
        "email", "phone", "address", "address2", "city", "state", "zip",
        F.when(pd_col == "FORD-MAIN", "Downtown Ford")
        .when(pd_col == "TOYOTA-NORTH", "North Toyota")
        .when(pd_col == "CHEV-SOUTH", "South Chevrolet")
        .otherwise(pd_col)
        .alias("dealership"),
        pd_col.alias("dealership_code"),
        "transaction_count", "last_transaction_date",
        "gender", "age", "generation", "preferred_language",
        "email_opt_out", "phone_opt_out", "mail_opt_out", "marketing_opt_out",
        "opt_out_date", "ytd_purchases", "lifetime_service_value",
        "last_service_date", "service_recency", "customer_since",
        "customer_tenure_years", "last_updated",
    )


def validated_vehicle_sales(
    vehicle_sales: DataFrame, profiles: DataFrame
) -> DataFrame:
    """marketing.validated_vehicle_sales (sql/customer_360_views.sql:614-697).

    J3 validation join (only facts whose customer is marketable) -> W2 deal
    dedup -> W3 purchase sequence. The join is semi-join-shaped: only cp's
    filter columns are read, so Spark prunes the profile scan to 3 columns.
    """
    cp = profiles.filter(
        F.col("email").isNotNull() & (F.col("email_opt_out") == False)  # noqa: E712
    ).select(F.col("custno").alias("cp_custno"))
    base = vehicle_sales.filter(
        F.col("custno").isNotNull()
        & F.col("vin").isNotNull()
        & F.col("contractdate").isNotNull()
    ).join(cp, F.col("custno") == F.col("cp_custno"), "inner").drop("cp_custno")
    latest = dedup_latest(base, ["dealno"], ["rowlastupdatedutc"], tiebreakers=["vin"])
    projected = latest.select(
        F.col("dealno").alias("deal_number"),
        F.concat(F.lit("AUTO-"), F.col("custno")).alias("user_id"),
        "custno",
        "vin",
        F.col("stockno").alias("stock_number"),
        F.col("makename").alias("make"),
        F.col("modelname").alias("model"),
        "year",
        F.col("bodystyle").alias("body_style"),
        "color",
        F.col("modeltype").alias("vehicle_type"),
        F.col("vehiclemileage").alias("mileage"),
        F.col("saletype").alias("sale_type"),
        F.col("dealtype").alias("deal_type"),
        F.col("branch").alias("dealership_code"),
        F.col("contractdate").alias("sale_date"),
        F.col("salesdate").alias("delivery_date"),
        F.col("cashprice").alias("vehicle_price"),
        F.col("outthedoorprice").alias("total_price"),
        F.col("totalgross").alias("gross_profit"),
        F.col("customercashdown").alias("customer_down"),
        F.col("financesource").alias("lender"),
        F.col("financeamt").alias("amount_financed"),
        F.col("apr").alias("interest_rate"),
        F.col("term").alias("finance_term"),
        F.col("paymentamt").alias("monthly_payment"),
        F.col("trade1vin").alias("trade_vin"),
        F.col("trade1acv").alias("trade_value"),
        F.col("nettrade1").alias("trade_equity"),
        _pg_concat(F.col("trade1year"), " ", F.col("trade1makename"), " ",
                   F.col("trade1modelname")).alias("trade_description"),
        F.col("crmsalesmgrname").alias("sales_manager"),
        F.col("crmsp1name").alias("salesperson"),
        F.col("rowlastupdatedutc").alias("last_updated"),
        F.lit("Vehicle Sale").alias("data_source"),
    )
    return sequence_number(
        projected, ["custno"], ["sale_date"],
        out_col="customer_purchase_sequence", tiebreakers=["deal_number"],
    )


def data_privacy_status(profiles: DataFrame) -> DataFrame:
    """marketing.data_privacy_status (sql/customer_360_views.sql:703-742)."""
    return profiles.filter(
        F.col("email").isNotNull() | F.col("phone").isNotNull()
    ).select(
        "user_id", "custno", "firstname", "lastname", "email",
        "email_opt_out", "phone_opt_out", "mail_opt_out",
        F.col("marketing_opt_out").alias("general_opt_out"),
        "opt_out_date",
        F.when(F.col("marketing_opt_out") == True, "Opted Out - No Marketing")  # noqa: E712
        .when((F.col("email_opt_out") == True) & (F.col("phone_opt_out") == True),  # noqa: E712
              "Limited Contact Only")
        .when(F.col("email_opt_out") == True, "Phone/Mail Only")  # noqa: E712
        .when(F.col("phone_opt_out") == True, "Email/Mail Only")  # noqa: E712
        .otherwise("Full Marketing Consent")
        .alias("marketing_status"),
        (~F.coalesce("marketing_opt_out", F.lit(False))).alias("can_market"),
        (~F.coalesce("email_opt_out", F.lit(False))).alias("can_email"),
        (~F.coalesce("phone_opt_out", F.lit(False))).alias("can_call"),
        (~F.coalesce("mail_opt_out", F.lit(False))).alias("can_mail"),
        F.col("last_updated").alias("preferences_last_updated"),
    )


def build_view_dag(
    customer_master: DataFrame, vehicle_sales: DataFrame, as_of: str
) -> dict[str, DataFrame]:
    """All six views; register with createOrReplaceTempView as needed."""
    cp = customer_profiles(customer_master, as_of)
    vh = customer_vehicle_history(vehicle_sales, as_of)
    return {
        "customer_profiles": cp,
        "customer_vehicle_history": vh,
        "customer_segments": customer_segments(cp, vh, as_of),
        "dealership_customer_profiles": dealership_customer_profiles(vehicle_sales, cp),
        "validated_vehicle_sales": validated_vehicle_sales(vehicle_sales, cp),
        "data_privacy_status": data_privacy_status(cp),
    }
