"""DuckDB ports of the reference view SQL (sql/customer_360_views.sql),
with the engine's documented determinism deltas: pinned as_of, window
tiebreakers, ordered-distinct arrays rendered as strings.

The test registers these as views in dependency order; each Spark view is
compared against its oracle twin.
"""

from __future__ import annotations


def profiles_sql(as_of: str) -> str:
    return f"""
    CREATE OR REPLACE VIEW customer_profiles_o AS
    WITH base AS (
      SELECT * FROM customer_master
      WHERE (isdeleted IS NULL OR isdeleted = false)
        AND (deletedataflag IS NULL OR deletedataflag = false)
    ), dedup AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY custno ORDER BY lastupdated DESC, dateadded ASC) AS rn
      FROM base
    )
    SELECT
      'AUTO-' || custno AS user_id,
      custno, firstname, lastname,
      CASE WHEN email IS NOT NULL AND email <> ''
            AND NOT regexp_matches(email, '^(no|nothanks|none|noemail|no.email|na)@', 'i')
            AND NOT regexp_matches(email, '(@example.com|@test.com|@invalid.com)', 'i')
            AND regexp_matches(email, '@.+\\..+', 'i')
        THEN lower(trim(email)) END AS email,
      CASE WHEN telephone IS NOT NULL AND telephone <> ''
            AND length(regexp_replace(telephone, '[^0-9]', '', 'g')) >= 10
        THEN regexp_replace(telephone, '[^0-9]', '', 'g') END AS phone,
      trim(address) AS address,
      trim(addresssecondline) AS address2,
      trim(city) AS city,
      upper(trim(state)) AS state,
      regexp_replace(ziporpostalcode, '[^0-9-]', '', 'g') AS zip,
      CASE WHEN gender IN ('M','Male','MALE','m') THEN 'Male'
           WHEN gender IN ('F','Female','FEMALE','f') THEN 'Female'
           ELSE 'Unknown' END AS gender,
      birthdate,
      CASE WHEN birthdate IS NOT NULL
           THEN year(DATE '{as_of}') - year(birthdate) END AS age,
      CASE WHEN birthdate IS NOT NULL THEN
        CASE WHEN year(DATE '{as_of}') - year(birthdate) < 25 THEN 'Gen Z (Under 25)'
             WHEN year(DATE '{as_of}') - year(birthdate) < 40 THEN 'Millennial (25-39)'
             WHEN year(DATE '{as_of}') - year(birthdate) < 55 THEN 'Gen X (40-54)'
             WHEN year(DATE '{as_of}') - year(birthdate) < 75 THEN 'Boomer (55-74)'
             ELSE 'Silent (75+)' END
      ELSE 'Unknown' END AS generation,
      COALESCE(preferredlanguage, 'English') AS preferred_language,
      COALESCE(blockemail, false) AS email_opt_out,
      COALESCE(blockphone, false) AS phone_opt_out,
      COALESCE(blockmail, false) AS mail_opt_out,
      COALESCE(optoutflag, false) AS marketing_opt_out,
      optoutdate AS opt_out_date,
      COALESCE(ytdpurchases, 0) AS ytd_purchases,
      COALESCE(totallabor + totalparts, 0) AS lifetime_service_value,
      lastservicedate AS last_service_date,
      CASE WHEN lastservicedate IS NULL THEN 'Never Serviced'
           WHEN lastservicedate >= DATE '{as_of}' - INTERVAL 90 DAY THEN 'Recent (0-90 days)'
           WHEN lastservicedate >= DATE '{as_of}' - INTERVAL 180 DAY THEN 'Moderate (91-180 days)'
           WHEN lastservicedate >= DATE '{as_of}' - INTERVAL 365 DAY THEN 'Distant (181-365 days)'
           ELSE 'Inactive (365+ days)' END AS service_recency,
      dateadded AS customer_since,
      year(DATE '{as_of}') - year(dateadded) AS customer_tenure_years,
      lastupdated AS last_updated
    FROM dedup
    WHERE rn = 1
      AND firstname IS NOT NULL AND firstname <> ''
      AND lastname IS NOT NULL AND lastname <> ''
      AND ((email IS NOT NULL AND email <> '' AND regexp_matches(email, '@.+\\..+', 'i'))
           OR (telephone IS NOT NULL AND telephone <> ''
               AND length(regexp_replace(telephone, '[^0-9]', '', 'g')) >= 10))
    """


def history_sql(as_of: str) -> str:
    return f"""
    CREATE OR REPLACE VIEW customer_vehicle_history_o AS
    WITH ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY dealno ORDER BY rowlastupdatedutc DESC, vin ASC) AS rn
      FROM vehicle_sales
      WHERE custno IS NOT NULL AND vin IS NOT NULL AND contractdate IS NOT NULL
    )
    SELECT
      'AUTO-' || custno AS user_id,
      custno,
      dealno AS deal_number,
      vin,
      stockno AS stock_number,
      makename AS make,
      modelname AS model,
      year,
      bodystyle AS body_style,
      color,
      CASE WHEN lower(modeltype) LIKE '%new%' THEN 'New'
           WHEN lower(modeltype) LIKE '%used%' THEN 'Used'
           WHEN lower(modeltype) LIKE '%certified%' THEN 'Certified Pre-Owned'
           ELSE modeltype END AS vehicle_condition,
      vehiclemileage AS odometer_reading,
      CASE WHEN lower(saletype) LIKE '%cash%' THEN 'Cash'
           WHEN lower(saletype) LIKE '%finance%' THEN 'Financed'
           WHEN lower(saletype) LIKE '%lease%' THEN 'Lease'
           ELSE saletype END AS transaction_type,
      dealtype AS deal_category,
      branch AS dealership_location,
      cashprice AS vehicle_price,
      outthedoorprice AS total_price,
      costprice AS dealer_cost,
      totalgross AS total_gross_profit,
      frontgross AS vehicle_gross_profit,
      backgross AS finance_insurance_profit,
      customercashdown AS cash_down,
      totaldown AS total_down_payment,
      financesource AS lender,
      financeamt AS amount_financed,
      apr AS interest_rate,
      term AS finance_term_months,
      paymentamt AS monthly_payment,
      trade1vin AS trade_vin,
      trade1acv AS trade_actual_value,
      trade1payoff AS trade_payoff,
      nettrade1 AS trade_equity,
      CONCAT(trade1year, ' ', trade1makename, ' ', trade1modelname)
        AS trade_vehicle_description,
      leasetype AS lease_type,
      leasepayment AS lease_payment,
      leasemileageallowance AS lease_mile_allowance,
      leaseendvalue AS lease_residual_value,
      crmsalesmgrname AS sales_manager,
      crmsp1name AS salesperson,
      contractdate AS purchase_date,
      salesdate AS delivery_date,
      ROW_NUMBER() OVER (PARTITION BY custno
                         ORDER BY contractdate ASC, dealno ASC) AS purchase_sequence,
      date_diff('day', CAST(contractdate AS DATE), DATE '{as_of}') AS days_since_purchase,
      CASE WHEN contractdate >= DATE '{as_of}' - INTERVAL 30 DAY THEN 'Recent (0-30 days)'
           WHEN contractdate >= DATE '{as_of}' - INTERVAL 90 DAY THEN 'Moderate (31-90 days)'
           WHEN contractdate >= DATE '{as_of}' - INTERVAL 365 DAY THEN 'Past Year (91-365 days)'
           WHEN contractdate >= DATE '{as_of}' - INTERVAL 1095 DAY THEN 'Historical (1-3 years)'
           ELSE 'Legacy (3+ years)' END AS purchase_recency,
      rowlastupdatedutc AS last_updated
    FROM ranked WHERE rn = 1
    """


def segments_sql(as_of: str) -> str:
    return f"""
    CREATE OR REPLACE VIEW customer_segments_o AS
    WITH joined AS (
      SELECT cp.user_id, cp.custno, cp.firstname, cp.lastname, cp.email,
             cp.phone, cp.state, cp.zip, cp.age, cp.generation,
             cp.customer_tenure_years, cp.last_service_date,
             cp.lifetime_service_value,
             vh.deal_number, vh.total_price, vh.purchase_date, vh.make,
             vh.vehicle_condition, vh.transaction_type, vh.cash_down,
             vh.trade_vin, vh.trade_equity
      FROM customer_profiles_o cp
      LEFT JOIN customer_vehicle_history_o vh ON cp.user_id = vh.user_id
    ), makes AS (
      SELECT user_id, make AS v, MAX(purchase_date) AS latest
      FROM joined WHERE make IS NOT NULL GROUP BY 1, 2
    ), prefs_makes AS (
      SELECT user_id, string_agg(v, ',' ORDER BY latest DESC, v ASC) AS preferred_makes
      FROM makes GROUP BY 1
    ), conds AS (
      SELECT user_id, vehicle_condition AS v, MAX(purchase_date) AS latest
      FROM joined WHERE vehicle_condition IS NOT NULL GROUP BY 1, 2
    ), prefs_conds AS (
      SELECT user_id, string_agg(v, ',' ORDER BY latest DESC, v ASC) AS purchase_patterns
      FROM conds GROUP BY 1
    ), metrics AS (
      SELECT user_id, custno, firstname, lastname, email, phone, state, zip,
             age, generation, customer_tenure_years, last_service_date,
             lifetime_service_value,
             COUNT(deal_number) AS total_purchases,
             SUM(total_price) AS lifetime_purchase_value,
             AVG(total_price) AS avg_purchase_value,
             MAX(purchase_date) AS last_purchase_date,
             MIN(purchase_date) AS first_purchase_date,
             AVG(cash_down) AS avg_down_payment,
             COUNT(CASE WHEN transaction_type = 'Cash' THEN 1 END) AS cash_purchases,
             COUNT(CASE WHEN transaction_type = 'Financed' THEN 1 END) AS financed_purchases,
             COUNT(CASE WHEN transaction_type = 'Lease' THEN 1 END) AS lease_purchases,
             COUNT(CASE WHEN trade_vin IS NOT NULL THEN 1 END) AS trades_made,
             AVG(trade_equity) AS avg_trade_equity
      FROM joined
      GROUP BY 1,2,3,4,5,6,7,8,9,10,11,12,13
    )
    SELECT m.user_id, m.custno, m.firstname, m.lastname, m.email, m.phone,
           m.state, m.zip, m.age, m.generation,
           m.total_purchases, m.lifetime_purchase_value, m.lifetime_service_value,
           m.lifetime_purchase_value + m.lifetime_service_value AS total_lifetime_value,
           m.avg_purchase_value,
           pm.preferred_makes,
           pc.purchase_patterns,
           m.avg_down_payment, m.cash_purchases, m.financed_purchases,
           m.lease_purchases, m.trades_made, m.avg_trade_equity,
           m.last_purchase_date, m.first_purchase_date, m.last_service_date,
           CASE WHEN m.last_purchase_date IS NULL THEN 999999
                ELSE date_diff('day', CAST(m.last_purchase_date AS DATE), DATE '{as_of}')
           END AS days_since_last_purchase,
           CASE WHEN m.last_service_date IS NULL THEN 999999
                ELSE date_diff('day', CAST(m.last_service_date AS DATE), DATE '{as_of}')
           END AS days_since_last_service,
           CASE
             WHEN m.lifetime_purchase_value + m.lifetime_service_value >= 100000 THEN 'VIP'
             WHEN m.lifetime_purchase_value + m.lifetime_service_value >= 50000
                  AND m.total_purchases >= 2 THEN 'High Value Repeat'
             WHEN m.lifetime_purchase_value + m.lifetime_service_value >= 25000 THEN 'High Value'
             WHEN m.total_purchases >= 2 THEN 'Repeat Customer'
             WHEN m.total_purchases = 1
                  AND date_diff('day', CAST(m.last_purchase_date AS DATE), DATE '{as_of}') <= 365
                  THEN 'Recent First-Time'
             WHEN m.total_purchases = 1 THEN 'Historical First-Time'
             WHEN m.lifetime_service_value > 0 THEN 'Service Only'
             ELSE 'Prospect' END AS customer_segment,
           CASE WHEN m.last_purchase_date >= DATE '{as_of}' - INTERVAL 30 DAY
                THEN true ELSE false END AS recent_buyer,
           CASE WHEN m.total_purchases >= 2
                 AND date_diff('day', CAST(m.last_purchase_date AS DATE), DATE '{as_of}')
                     BETWEEN 1095 AND 1460
                THEN true ELSE false END AS trade_up_candidate,
           CASE WHEN m.last_service_date IS NOT NULL
                 AND date_diff('day', CAST(m.last_service_date AS DATE), DATE '{as_of}')
                     BETWEEN 90 AND 180
                THEN true ELSE false END AS service_due_candidate,
           CASE WHEN m.lifetime_service_value = 0
                 AND m.last_purchase_date IS NOT NULL
                 AND date_diff('day', CAST(m.last_purchase_date AS DATE), DATE '{as_of}') >= 90
                THEN true ELSE false END AS service_acquisition_target,
           m.customer_tenure_years
    FROM metrics m
    LEFT JOIN prefs_makes pm ON m.user_id = pm.user_id
    LEFT JOIN prefs_conds pc ON m.user_id = pc.user_id
    WHERE m.email IS NOT NULL OR m.phone IS NOT NULL
    """


def dealership_sql(as_of: str) -> str:
    return """
    CREATE OR REPLACE VIEW dealership_customer_profiles_o AS
    WITH location_customers AS (
      SELECT custno, branch AS primary_dealership,
             COUNT(*) AS transaction_count,
             MAX(contractdate) AS last_transaction_date
      FROM vehicle_sales
      WHERE custno IS NOT NULL AND branch IS NOT NULL
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY custno
               ORDER BY transaction_count DESC, last_transaction_date DESC,
                        primary_dealership ASC) AS dealership_rank
      FROM location_customers
    )
    SELECT
      CASE WHEN lc.primary_dealership = 'FORD-MAIN' THEN 'FORD-MAIN-' || cp.custno
           WHEN lc.primary_dealership = 'TOYOTA-NORTH' THEN 'TOY-NORTH-' || cp.custno
           WHEN lc.primary_dealership = 'CHEV-SOUTH' THEN 'CHEV-SOUTH-' || cp.custno
           ELSE 'AUTO-' || lc.primary_dealership || '-' || cp.custno END AS user_id,
      cp.custno,
      cp.firstname AS first_name,
      cp.lastname AS last_name,
      cp.email, cp.phone, cp.address, cp.address2, cp.city, cp.state, cp.zip,
      CASE WHEN lc.primary_dealership = 'FORD-MAIN' THEN 'Downtown Ford'
           WHEN lc.primary_dealership = 'TOYOTA-NORTH' THEN 'North Toyota'
           WHEN lc.primary_dealership = 'CHEV-SOUTH' THEN 'South Chevrolet'
           ELSE lc.primary_dealership END AS dealership,
      lc.primary_dealership AS dealership_code,
      lc.transaction_count,
      lc.last_transaction_date,
      cp.gender, cp.age, cp.generation, cp.preferred_language,
      cp.email_opt_out, cp.phone_opt_out, cp.mail_opt_out, cp.marketing_opt_out,
      cp.opt_out_date, cp.ytd_purchases, cp.lifetime_service_value,
      cp.last_service_date, cp.service_recency, cp.customer_since,
      cp.customer_tenure_years, cp.last_updated
    FROM customer_profiles_o cp
    JOIN ranked lc ON cp.custno = lc.custno
    WHERE lc.dealership_rank = 1
      AND cp.email IS NOT NULL
      AND cp.email_opt_out = false
      AND cp.marketing_opt_out = false
      AND lc.primary_dealership IS NOT NULL
    """


def validated_sql(as_of: str) -> str:
    return """
    CREATE OR REPLACE VIEW validated_vehicle_sales_o AS
    WITH ranked AS (
      SELECT vs.*, ROW_NUMBER() OVER (
               PARTITION BY vs.dealno
               ORDER BY vs.rowlastupdatedutc DESC, vs.vin ASC) AS rn
      FROM vehicle_sales vs
      JOIN customer_profiles_o cp ON vs.custno = cp.custno
      WHERE vs.custno IS NOT NULL AND vs.vin IS NOT NULL
        AND vs.contractdate IS NOT NULL
        AND cp.email IS NOT NULL AND cp.email_opt_out = false
    )
    SELECT
      dealno AS deal_number,
      'AUTO-' || custno AS user_id,
      custno, vin,
      stockno AS stock_number,
      makename AS make,
      modelname AS model,
      year,
      bodystyle AS body_style,
      color,
      modeltype AS vehicle_type,
      vehiclemileage AS mileage,
      saletype AS sale_type,
      dealtype AS deal_type,
      branch AS dealership_code,
      contractdate AS sale_date,
      salesdate AS delivery_date,
      cashprice AS vehicle_price,
      outthedoorprice AS total_price,
      totalgross AS gross_profit,
      customercashdown AS customer_down,
      financesource AS lender,
      financeamt AS amount_financed,
      apr AS interest_rate,
      term AS finance_term,
      paymentamt AS monthly_payment,
      trade1vin AS trade_vin,
      trade1acv AS trade_value,
      nettrade1 AS trade_equity,
      CONCAT(trade1year, ' ', trade1makename, ' ', trade1modelname) AS trade_description,
      crmsalesmgrname AS sales_manager,
      crmsp1name AS salesperson,
      rowlastupdatedutc AS last_updated,
      'Vehicle Sale' AS data_source,
      ROW_NUMBER() OVER (PARTITION BY custno
                         ORDER BY contractdate ASC, dealno ASC)
        AS customer_purchase_sequence
    FROM ranked WHERE rn = 1
    """


def privacy_sql(as_of: str) -> str:
    return """
    CREATE OR REPLACE VIEW data_privacy_status_o AS
    SELECT
      user_id, custno, firstname, lastname, email,
      email_opt_out, phone_opt_out, mail_opt_out,
      marketing_opt_out AS general_opt_out,
      opt_out_date,
      CASE WHEN marketing_opt_out = true THEN 'Opted Out - No Marketing'
           WHEN email_opt_out = true AND phone_opt_out = true THEN 'Limited Contact Only'
           WHEN email_opt_out = true THEN 'Phone/Mail Only'
           WHEN phone_opt_out = true THEN 'Email/Mail Only'
           ELSE 'Full Marketing Consent' END AS marketing_status,
      NOT COALESCE(marketing_opt_out, false) AS can_market,
      NOT COALESCE(email_opt_out, false) AS can_email,
      NOT COALESCE(phone_opt_out, false) AS can_call,
      NOT COALESCE(mail_opt_out, false) AS can_mail,
      last_updated AS preferences_last_updated
    FROM customer_profiles_o
    WHERE email IS NOT NULL OR phone IS NOT NULL
    """


ALL_VIEW_SQL = [profiles_sql, history_sql, segments_sql, dealership_sql, validated_sql, privacy_sql]
