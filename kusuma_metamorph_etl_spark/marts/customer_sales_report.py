"""Mart 3 — customer sales report (per-sale grain).

Re-expression of ``/root/reference/ETL-Airflow/dags/tasks/
customer_sales_report_task.py:12-153``: keep Delivered/Shipped sales, enrich
with product + customer dims, derive ``SALE_AMOUNT = round(QUANTITY * PRICE
* (1 - DISCOUNT/100), 2)``, tier every sale by global percent-rank of sale
amount (Gold ≤ 0.2 < Silver ≤ 0.5 < Bronze — boundary semantics from
``customer_sales_report_task.py:107-115``), and flag each customer's single
largest sale as ``TOP_PERFORMER``.

Scale notes:
* The reference's unpartitioned ``Window.orderBy`` percent-rank (anti-pattern
  A4) is replaced by :func:`global_percent_rank` — exact same values, no
  single-partition sort.
* Reference quirk B3 (overwriting the real sale date with *yesterday*) is
  off by default, available as ``yesterday_quirk=True`` for parity runs.
* ``LOAD_TSTMP`` is injectable (``run_ts``) for reproducible runs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.functions.numeric import decimal_round
from kusuma_metamorph_etl_spark.operators.windows import global_percent_rank
from kusuma_metamorph_etl_spark.sources.sinks import stamp_snapshot

FINAL_COLUMNS = [
    "DAY_DT",
    "CUSTOMER_ID",
    "CUSTOMER_NAME",
    "SALE_ID",
    "CITY",
    "PRODUCT_NAME",
    "CATEGORY",
    "SALE_DATE",
    "SALE_MONTH",
    "SALE_YEAR",
    "QUANTITY",
    "PRICE",
    "SALE_AMOUNT",
    "TOP_PERFORMER",
    "LOYALTY_TIER",
    "LOAD_TSTMP",
]


def customer_sales_report(
    sales: DataFrame,
    products: DataFrame,
    customers: DataFrame,
    run_date: dt.date | str | None = None,
    run_ts: dt.datetime | str | None = None,
    yesterday_quirk: bool = False,
    broadcast_dims: bool = True,
    persist_intermediate: bool = True,
) -> DataFrame:
    """Build the customer-sales-report mart (one row per qualifying sale).

    ``persist_intermediate`` caches the enriched fact before the tiering
    step; the cache lives until Spark's LRU evicts it (callers looping
    over many marts in one session can pass ``False``)."""
    maybe_broadcast = F.broadcast if broadcast_dims else (lambda df: df)

    # FIL: status IN ('Delivered', 'Shipped')  (`fil_isin`).
    fil_sales = sales.filter(F.col("ORDER_STATUS").isin("Delivered", "Shipped"))

    # JNR_1: ⟕ products for name/category/price.
    jnr_products = (
        fil_sales.alias("s")
        .join(
            maybe_broadcast(products.alias("p")),
            on=F.col("s.PRODUCT_ID") == F.col("p.PRODUCT_ID"),
            how="left",
        )
        .select(
            F.col("s.SALE_ID").alias("SALE_ID"),
            F.col("s.CUSTOMER_ID").alias("CUSTOMER_ID"),
            F.col("s.SALE_DATE").alias("SALE_DATE"),
            F.col("s.QUANTITY").alias("QUANTITY"),
            F.col("s.DISCOUNT").alias("DISCOUNT"),
            F.col("p.PRODUCT_NAME").alias("PRODUCT_NAME"),
            F.col("p.CATEGORY").alias("CATEGORY"),
            F.col("p.SELLING_PRICE").alias("PRICE"),
        )
    )

    # EXP: dates + amounts.  B3 quirk (sale date := yesterday) opt-in only.
    sale_date = (
        F.date_sub(F.current_date(), 1) if yesterday_quirk else F.col("SALE_DATE")
    )
    load_ts = (
        F.current_timestamp()
        if run_ts is None
        else F.lit(str(run_ts)).cast("timestamp")
    )
    exp = (
        jnr_products.withColumn("SALE_DATE", sale_date)
        .withColumn("SALE_MONTH", F.month("SALE_DATE"))
        .withColumn("SALE_YEAR", F.year("SALE_DATE"))
        .withColumn("PRICE", F.round("PRICE", 2))
        .withColumn(
            "SALE_AMOUNT",
            # Exact-decimal rounding: the product of a 2-dp price, an integer
            # quantity and a 2-dp discount factor has a true 4-dp value that
            # often sits exactly on a half-penny — see functions/numeric.py.
            decimal_round(
                F.col("QUANTITY") * F.col("PRICE") * (1 - F.col("DISCOUNT") / 100), 2
            ),
        )
        .withColumn("LOAD_TSTMP", load_ts)
    )

    # The enriched fact feeds the percent_rank quantile probe, the rank
    # window, the bucket-offsets branch AND the final row stream.  With 2
    # consumers (r1 shape) recompute beat persist (4.0s vs 6.5s — the rank
    # branch pruned to 3 columns); with the probe making it 3+ passes the
    # trade-off flips: persist wins 1.1s vs 2.3s warm / 3.2s vs 7.0s cold
    # at sf0.1 (3-rep A/B, this VM).  Re-measure if the consumer count
    # changes again.  Shared via LAZY localCheckpoint, not persist():
    # nothing here can unpersist after the caller's action, so persist
    # pinned one cache-manager entry per build for the session lifetime
    # AND let later identical builds silently reuse it (bench reps then
    # measure cache reads — the dedup_substring measurement-correction
    # class, bench.py notes).  The checkpoint RDD is ContextCleaner-
    # released when the result frame is dropped.
    if persist_intermediate:
        exp = exp.localCheckpoint(eager=False)

    # WIN 1: global percentile tiers — scalable exact percent_rank.
    # SALE_AMOUNT is near-continuous money (distinct ≈ rows at scale), so
    # force the range-partitioned path: the broadcast rank map would be
    # O(n) and its "tiny" window a single-task sort of ~n values.
    tiered = global_percent_rank(
        exp, "SALE_AMOUNT", out_col="__pr", descending=True, low_cardinality=False
    )
    tiered = tiered.withColumn(
        "LOYALTY_TIER",
        F.when(F.col("__pr") <= 0.2, F.lit("Gold"))
        .when((F.col("__pr") > 0.2) & (F.col("__pr") <= 0.5), F.lit("Silver"))
        .otherwise(F.lit("Bronze")),
    )

    # WIN 2: per-customer top sale flag (deterministic tiebreak on SALE_ID).
    top_window = Window.partitionBy("CUSTOMER_ID").orderBy(
        F.desc("SALE_AMOUNT"), F.asc("SALE_ID")
    )
    flagged = (
        tiered.withColumn("__rn", F.row_number().over(top_window))
        .withColumn("TOP_PERFORMER", F.col("__rn") == 1)
        .drop("__rn", "__pr", "DISCOUNT")  # `proj_family` drop mechanic
    )

    # JNR_2 LAST: ⟕ customers for name/city.  The dim is PK-gated
    # (duplicate_gate on CUSTOMER_ID is the warehouse contract), so the
    # join preserves cardinality and commutes past the windows — and the
    # percent-rank branch, which re-derives the SALE_AMOUNT distribution,
    # no longer pays a customer join it would only throw away.
    jnr_customers = (
        flagged.alias("l")
        .join(
            maybe_broadcast(customers.alias("c")),
            on=F.col("l.CUSTOMER_ID") == F.col("c.CUSTOMER_ID"),
            how="left",
        )
        .select(
            "l.*",
            F.col("c.NAME").alias("CUSTOMER_NAME"),
            F.col("c.CITY").alias("CITY"),
        )
    )

    return stamp_snapshot(jnr_customers, run_date).select(*FINAL_COLUMNS)
