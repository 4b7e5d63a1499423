"""Deterministic SCD fixture over the driver's ``customer`` table.

FIXTURES.md §2: ``customer`` plays the production role; a staging batch
is a deterministic perturbation so DuckDB can replay the identical merge
as the correctness oracle. Every rule below is pure modular arithmetic on
``c_custkey`` — portable between Spark and DuckDB SQL, no engine hash
functions. The Spark builders and the SQL CTE text live side by side in
this module so they cannot drift.

Branch coverage of the reference algorithm
(/root/reference/SCD_script.txt steps 2-7):
  * %20==6  -> key absent from staging (step-2 carry)
  * %7==0   -> key has an inactive history row (step-3 Type-1 rewrite on
               inactive rows; also proves the "all-inactive key stays
               inactive" edge case when combined with %20==6)
  * %10==3  -> c_acctbal shifted (Type-2 change, steps 5+6)
  * %10==4  -> c_mktsegment rotated (Type-2 change)
  * %50==9  -> c_mktsegment NULLed (Type-2 via null-safe compare)
  * %10==5  -> c_name suffixed (Type-1 only, step-4 rewrite)
  * %20==7  -> cloned as a brand-new key at custkey+1_000_000 (step 7)
  * everything else -> unchanged active match (step-4 carry w/ rewrite)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.scd import SCDConfig
from implementing_scds_in_hive_spark.sources.registry import load_table

AS_OF = "2024-06-01 00:00:00"

# Driver-facing sentinel: the engine default '9999-12-31 23:59:59'
# (operators/scd.py END_OF_TIME, reference parity) overflows pandas
# datetime64[ns] (max 2262-04-11) in the driver's collection path, so
# every fixture/oracle pair uses a pandas-representable open-end instant
# instead. SCDConfig.end_of_time parameterizes this per dimension; the
# engine default stays 9999 for deployments that never round-trip
# through nanosecond pandas.
FIXTURE_EOT = "2260-12-31 23:59:59"

CUSTOMER_CFG = SCDConfig(
    key="c_custkey",
    type2_cols=("c_acctbal", "c_mktsegment"),
    type1_cols=("c_name", "c_nationkey"),
    surrogate_col="dim_customer_id",
    end_of_time=FIXTURE_EOT,
)

# r12 anti-overfitting re-parameterization (VERDICT r11 next-round #3):
# the FLAGSHIP driver slot (and the publish roundtrip derived from it)
# runs a DIFFERENT Type-2 column set — c_name moves from Type-1 to
# Type-2, so the %10==5 name perturbations now spawn new versions
# instead of history rewrites, and only c_nationkey remains Type-1.
# Proves scd2_merge the OPERATOR, not the (acctbal, mktsegment)
# constants. CUSTOMER_CFG stays the config for everything else (golden
# tests, branch steps, CoW/MoR, script parity), so the two configs are
# driver-evidenced side by side.
CUSTOMER_CFG_WIDE = SCDConfig(
    key="c_custkey",
    type2_cols=("c_acctbal", "c_mktsegment", "c_name"),
    type1_cols=("c_nationkey",),
    surrogate_col="dim_customer_id",
    end_of_time=FIXTURE_EOT,
)


def customer_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers as an SCD2 dimension: all active at version 1 (version 2
    for keys with history), plus an inactive version-1 row for %7==0 keys.
    """
    c = load_table(spark, sf_dir, "customer")
    active = c.select(
        F.lit(None).cast("long").alias("dim_customer_id"),
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(2)).otherwise(F.lit(1)).alias("scd_version"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("scd_start_date"),
        F.lit(FIXTURE_EOT).cast("timestamp").alias("scd_end_date"),
        F.lit(True).alias("scd_active"),
    )
    history = c.where(F.col("c_custkey") % 7 == 0).select(
        F.lit(None).cast("long").alias("dim_customer_id"),
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") - 50.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(1).alias("scd_version"),
        F.lit("2023-01-01 00:00:00").cast("timestamp").alias("scd_start_date"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("scd_end_date"),
        F.lit(False).alias("scd_active"),
    )
    return active.unionByName(history)


def customer_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perturbed snapshot of ``customer`` (business columns only)."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    existing = c.where(~(k % 20 == 6)).select(
        "c_custkey",
        F.when(k % 10 == 5, F.concat(F.col("c_name"), F.lit("_t1")))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        "c_nationkey",
        F.when(k % 10 == 3, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(k % 50 == 9, F.lit(None).cast("string"))
        .when(k % 10 == 4, F.concat(F.col("c_mktsegment"), F.lit("_X")))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    new = c.where(k % 20 == 7).select(
        (k + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("NewCustomer#"), k.cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("STARTUP").alias("c_mktsegment"),
    )
    return existing.unionByName(new)


# ---------------------------------------------------------------------------
# DuckDB twins of the builders above (ANSI SQL over the pre-registered
# `customer` view). Column-for-column identical output.
# ---------------------------------------------------------------------------

PRODUCTION_SQL = f"""
    SELECT CAST(NULL AS BIGINT) AS dim_customer_id,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           CASE WHEN c_custkey % 7 = 0 THEN 2 ELSE 1 END AS scd_version,
           TIMESTAMP '2024-01-01 00:00:00' AS scd_start_date,
           TIMESTAMP '{FIXTURE_EOT}' AS scd_end_date,
           TRUE AS scd_active
    FROM customer
    UNION ALL
    SELECT CAST(NULL AS BIGINT), c_custkey, c_name, c_nationkey,
           c_acctbal - 50.0, c_mktsegment, 1,
           TIMESTAMP '2023-01-01 00:00:00',
           TIMESTAMP '2024-01-01 00:00:00', FALSE
    FROM customer WHERE c_custkey % 7 = 0
"""


# ---------------------------------------------------------------------------
# CDC fixture (operators/cdc.py): an *operation feed* rather than a
# snapshot, over a production variant where %13==0 keys are entirely
# inactive (previously deleted) so resurrection is exercised.
#
# Feed rules (all modular arithmetic on c_custkey, seq unique per key):
#   * %10==1            -> U: c_acctbal+200 (Type-2 change; for %13==0
#                          keys this is an upsert onto an all-inactive
#                          key -> resurrection with version max+1)
#   * %10==2            -> U seq1 then D seq2 (net delete; the U's
#                          values must NOT land — batch collapse)
#   * %10==3            -> D seq1 then I seq2 with segment 'REBORN'
#                          (net upsert; delete never applies)
#   * %10==4            -> I of brand-new key k+2,000,000
#   * %10==6            -> U: c_name suffixed (Type-1-only change)
#   * %20==15           -> D (plain delete; closes the active version)
#   * %50==21           -> D of unknown key k+3,000,000 (no-op)
#   * everything else   -> absent from the feed (carried verbatim)
# Delete rows carry NULL payloads — the apply path must ignore them.
# ---------------------------------------------------------------------------

CDC_AS_OF = "2024-07-01 00:00:00"


def customer_production_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``customer_production`` with every %13==0 key fully inactive
    (its active version closed at 2024-02-01) — the prior-delete state
    a CDC resurrection lands on."""
    p = customer_production(spark, sf_dir)
    gone = (F.col("c_custkey") % 13 == 0) & F.col("scd_active")
    return p.withColumn(
        "scd_end_date",
        F.when(gone, F.lit("2024-02-01 00:00:00").cast("timestamp")).otherwise(
            F.col("scd_end_date")
        ),
    ).withColumn("scd_active", F.col("scd_active") & ~(F.col("c_custkey") % 13 == 0))


def customer_cdc_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (op, op_seq, payload) operation feed over customer."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")
    null_d = F.lit(None).cast("double")

    def ev(df, key, name, nat, bal, seg, op, seq):
        return df.select(
            key.alias("c_custkey"),
            name.alias("c_name"),
            nat.alias("c_nationkey"),
            bal.alias("c_acctbal"),
            seg.alias("c_mktsegment"),
            F.lit(op).alias("op"),
            F.lit(seq).cast("int").alias("op_seq"),
        )

    name, nat, bal, seg = (F.col(c_) for c_ in ("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    parts = [
        ev(c.where(k % 10 == 1), k, name, nat, bal + 200.0, seg, "U", 1),
        ev(c.where(k % 10 == 2), k, name, nat, bal + 1.0, seg, "U", 1),
        ev(c.where(k % 10 == 2), k, null_s, null_i, null_d, null_s, "D", 2),
        ev(c.where(k % 10 == 3), k, null_s, null_i, null_d, null_s, "D", 1),
        ev(c.where(k % 10 == 3), k, name, nat, bal, F.lit("REBORN"), "I", 2),
        ev(
            c.where(k % 10 == 4),
            k + 2_000_000,
            F.concat(F.lit("CdcNew#"), k.cast("string")),
            nat,
            F.lit(0.0),
            F.lit("STARTUP"),
            "I",
            1,
        ),
        ev(c.where(k % 10 == 6), k, F.concat(name, F.lit("_cdc")), nat, bal, seg, "U", 1),
        ev(c.where(k % 20 == 15), k, null_s, null_i, null_d, null_s, "D", 1),
        ev(c.where(k % 50 == 21), k + 3_000_000, null_s, null_i, null_d, null_s, "D", 1),
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Type-3 fixture (operators/scd_variants.py): one row per key with
# prev_<col> shadows for the tracked columns. %7==0 keys start with a
# non-NULL prev_c_acctbal (they "changed once before"), everyone else
# NULL — so the merge must both SHIFT and PRESERVE shadows correctly.
# ---------------------------------------------------------------------------


def customer_production_scd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") - 50.0).alias(
            "prev_c_acctbal"
        ),
        F.lit(None).cast("string").alias("prev_c_mktsegment"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("last_modified"),
    )


SCD3_PRODUCTION_SQL = """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           CASE WHEN c_custkey % 7 = 0 THEN c_acctbal - 50.0 END AS prev_c_acctbal,
           CAST(NULL AS VARCHAR) AS prev_c_mktsegment,
           TIMESTAMP '2024-01-01 00:00:00' AS last_modified
    FROM customer
"""


# ---------------------------------------------------------------------------
# Retroactive-correction fixture (operators/retro.py): late-arriving
# Type-2 facts with an effective timestamp in the past.
#   * %9==2 -> eff 2023-06-01, c_acctbal+500: splits the v1 interval for
#              %7==0 keys ([2023-01-01, 2024-01-01) contains it);
#              PREPENDS before history for everyone else (their only
#              version starts 2024-01-01)
#   * %9==4 -> eff 2024-03-15, c_mktsegment='RETRO': splits the ACTIVE
#              interval — the spliced piece becomes the active row
#   * %9==7 -> eff 2024-03-15, values unchanged: no-op correction
# ---------------------------------------------------------------------------


def customer_retro_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    early = c.where(k % 9 == 2).select(
        "c_custkey",
        (F.col("c_acctbal") + 500.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit("2023-06-01 00:00:00").cast("timestamp").alias("eff_ts"),
    )
    mid = c.where(k % 9 == 4).select(
        "c_custkey",
        "c_acctbal",
        F.lit("RETRO").alias("c_mktsegment"),
        F.lit("2024-03-15 00:00:00").cast("timestamp").alias("eff_ts"),
    )
    noop = c.where(k % 9 == 7).select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("2024-03-15 00:00:00").cast("timestamp").alias("eff_ts"),
    )
    return early.unionByName(mid).unionByName(noop)


RETRO_LATE_SQL = """
    SELECT c_custkey, c_acctbal + 500.0 AS c_acctbal, c_mktsegment,
           TIMESTAMP '2023-06-01 00:00:00' AS eff_ts
    FROM customer WHERE c_custkey % 9 = 2
    UNION ALL
    SELECT c_custkey, c_acctbal, 'RETRO', TIMESTAMP '2024-03-15 00:00:00'
    FROM customer WHERE c_custkey % 9 = 4
    UNION ALL
    SELECT c_custkey, c_acctbal, c_mktsegment, TIMESTAMP '2024-03-15 00:00:00'
    FROM customer WHERE c_custkey % 9 = 7
"""


CDC_PRODUCTION_SQL = f"""
    SELECT dim_customer_id, c_custkey, c_name, c_nationkey, c_acctbal,
           c_mktsegment, scd_version, scd_start_date,
           CASE WHEN c_custkey % 13 = 0 AND scd_active
                THEN TIMESTAMP '2024-02-01 00:00:00' ELSE scd_end_date
           END AS scd_end_date,
           scd_active AND NOT (c_custkey % 13 = 0) AS scd_active
    FROM ({PRODUCTION_SQL})
"""

CDC_FEED_SQL = """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal + 200.0 AS c_acctbal,
           c_mktsegment, 'U' AS op, 1 AS op_seq
    FROM customer WHERE c_custkey % 10 = 1
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1.0, c_mktsegment, 'U', 1
    FROM customer WHERE c_custkey % 10 = 2
    UNION ALL
    SELECT c_custkey, NULL, NULL, NULL, NULL, 'D', 2
    FROM customer WHERE c_custkey % 10 = 2
    UNION ALL
    SELECT c_custkey, NULL, NULL, NULL, NULL, 'D', 1
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'REBORN', 'I', 2
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey + 2000000, 'CdcNew#' || CAST(c_custkey AS VARCHAR),
           c_nationkey, 0.0, 'STARTUP', 'I', 1
    FROM customer WHERE c_custkey % 10 = 4
    UNION ALL
    SELECT c_custkey, c_name || '_cdc', c_nationkey, c_acctbal, c_mktsegment, 'U', 1
    FROM customer WHERE c_custkey % 10 = 6
    UNION ALL
    SELECT c_custkey, NULL, NULL, NULL, NULL, 'D', 1
    FROM customer WHERE c_custkey % 20 = 15
    UNION ALL
    SELECT c_custkey + 3000000, NULL, NULL, NULL, NULL, 'D', 1
    FROM customer WHERE c_custkey % 50 = 21
"""

STAGING_SQL = """
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 5 THEN c_name || '_t1' ELSE c_name END AS c_name,
           c_nationkey,
           CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey % 50 = 9 THEN NULL
                WHEN c_custkey % 10 = 4 THEN c_mktsegment || '_X'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer WHERE NOT (c_custkey % 20 = 6)
    UNION ALL
    SELECT c_custkey + 1000000, 'NewCustomer#' || CAST(c_custkey AS VARCHAR),
           c_nationkey, 0.0, 'STARTUP'
    FROM customer WHERE c_custkey % 20 = 7
"""
