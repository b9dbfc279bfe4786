"""Window functions: ranking, offsets (lag/lead), frames (running/moving
aggregates), ntile. Absent in the reference (SURVEY §2B — total surface is
``mrf.h:9-11``); built on ``pyspark.sql.Window``.

Determinism: every window ORDER BY carries a unique tiebreak column so ordered
frames (running sums, lag/lead) are bit-reproducible and oracle-comparable.

Scale: a window partitioned by a key is one shuffle on that key; frames are
evaluated streaming within each partition. The thing to avoid at 100 TB is a
global (un-partitioned) ordered window — everything lands in one task. None of
these use one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.parity import cents, mround, mround_col
from tmapreduce_spark.sources.catalog import load_table


def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — row_number over a per-key window.
    The grouped-top-n pattern: no global sort, one shuffle on o_custkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            mround_col(F.col("o_totalprice"), 2).alias("total_price"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS total_price, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 3
"""


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank over part price within brand."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.rank().over(w).cast("bigint").alias("price_rank"),
            F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
        )
        .filter(F.col("price_rank") <= 5)
    )


WINDOW_DENSE_SQL = """
SELECT p_brand, p_partkey,
       CAST(price_rank AS BIGINT) AS price_rank,
       CAST(price_dense_rank AS BIGINT) AS price_dense_rank
FROM (
  SELECT p_brand, p_partkey,
         rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS price_rank,
         dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS price_dense_rank
  FROM part) t
WHERE price_rank <= 5
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running revenue in order-date order (rows-between
    unbounded-preceding frame). Fully specified ordering ⇒ bit-reproducible."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        mround_col(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       floor(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100
         AS running_total
FROM orders
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap in days between a customer's consecutive orders (lag offset)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev = F.lag(F.col("o_orderdate").cast("date")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(
            F.datediff(F.col("o_orderdate").cast("date"), prev), F.lit(-1)
        ).cast("bigint").alias("days_since_prev"),
    )


WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(COALESCE(date_diff('day',
                     lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC),
                     CAST(o_orderdate AS DATE)), -1) AS BIGINT) AS days_since_prev
FROM orders
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row centered moving average of event value per user (bounded frame)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-1, 1)
    )
    return e.select(
        "user_id",
        "event_id",
        mround_col(F.avg("value").over(w), 6).alias("moving_avg"),
    )


WINDOW_MOVING_SQL = """
SELECT user_id, event_id,
       floor(avg(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) * 1000000 + 0.5) / 1000000 AS moving_avg
FROM events
"""


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing of customers by account balance within segment."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
    )


WINDOW_NTILE_SQL = """
SELECT c_mktsegment, c_custkey,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal ASC, c_custkey ASC) AS BIGINT) AS bal_quartile
FROM customer
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per-customer trailing 30-day
    revenue. The frame is defined on the order-date day number, so all orders
    on tied days enter the frame together — and the sum is exact integer
    cents, making it reduction-order-independent."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("int")
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        day.alias("day_num"),
        F.sum(F.expr(cents("o_totalprice"))).over(w).alias("trailing_cents"),
    )


WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS day_num,
       CAST(sum(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT))
              OVER (PARTITION BY o_custkey
                    ORDER BY datediff('day', DATE '1995-01-01', o_orderdate)
                    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_cents
FROM orders
"""


def window_frame_following(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBOUNDED FOLLOWING frames: per-customer revenue still to come
    (CURRENT ROW → UNBOUNDED FOLLOWING) plus first/last order key over the
    full partition frame. Sums are exact integer cents (order-independent);
    last_value needs the explicit full frame — the default frame would stop
    at CURRENT ROW."""
    o = load_table(spark, sf_dir, "orders")
    order = [F.asc("o_orderdate"), F.asc("o_orderkey")]
    w_rest = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.expr(cents("o_totalprice"))).over(w_rest).alias("remaining_cents"),
        F.first("o_orderkey").over(w_full).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


WINDOW_FOLLOWING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS remaining_cents,
       first_value(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
       last_value(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
"""


def window_range_centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered RANGE frame (±15 days around each order's day number): the
    moving-range variant of window_range_frame — preceding AND following on a
    value axis, with tied days entering together. nth_value(2) over the running
    row frame exercises the offset-into-frame accessor."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("int")
    w_range = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-15, 15)
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        day.alias("day_num"),
        F.sum(F.expr(cents("o_totalprice"))).over(w_range).alias("centered_cents"),
        F.count(F.lit(1)).over(w_range).cast("bigint").alias("centered_n"),
        F.nth_value("o_orderkey", 2).over(w_rows).alias("second_order_so_far"),
    )


WINDOW_RANGE_CENTERED_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS day_num,
       CAST(sum(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT))
              OVER (PARTITION BY o_custkey
                    ORDER BY datediff('day', DATE '1995-01-01', o_orderdate)
                    RANGE BETWEEN 15 PRECEDING AND 15 FOLLOWING) AS BIGINT) AS centered_cents,
       CAST(count(*) OVER (PARTITION BY o_custkey
                           ORDER BY datediff('day', DATE '1995-01-01', o_orderdate)
                           RANGE BETWEEN 15 PRECEDING AND 15 FOLLOWING) AS BIGINT) AS centered_n,
       nth_value(o_orderkey, 2)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_order_so_far
FROM orders
"""


def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over a fully-specified order (totalprice,
    orderkey tiebreak) — both are pure rank arithmetic, so cross-engine
    doubles are identical."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        mround_col(F.percent_rank().over(w), 6).alias("pct_rank"),
        mround_col(F.cume_dist().over(w), 6).alias("cume"),
    )


WINDOW_PERCENTILES_SQL = """
SELECT o_orderkey, o_orderstatus,
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) via ``last(..., ignorenulls)``
    over a per-user ordered frame — the sparse-sensor forward-fill done as a
    WINDOW (one shuffle on user_id), no dense grid needed. Values < 5 are
    NULLed deterministically to manufacture gaps; the carried value itself is
    untouched (no float arithmetic, so raw doubles compare exactly)."""
    e = load_table(spark, sf_dir, "events")
    masked = e.withColumn(
        "masked", F.when(F.col("value") >= 5, F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "event_id",
        "user_id",
        F.last("masked", ignorenulls=True).over(w).alias("value_filled"),
    )


WINDOW_IGNORE_NULLS_SQL = """
SELECT event_id, user_id,
       last_value(CASE WHEN value >= 5 THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM events
"""


def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count over an ordered frame — Spark has no
    count(DISTINCT) OVER, so the idiom is size(collect_set() OVER): per user,
    how many distinct event types seen so far. The frame must be ROWS (ties
    in a RANGE frame would make 'so far' ambiguous); (ts, event_id) is a
    total order. Set state is bounded by the type cardinality (5), not the
    stream — the distinct-over-window trick is only safe for low-cardinality
    payloads; high cardinality wants the HLL sketch instead."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("types_so_far"),
    )


WINDOW_RUNNING_DISTINCT_SQL = """
SELECT event_id, user_id,
       CAST(count(DISTINCT event_type)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS types_so_far
FROM events
"""


def window_mean_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean inter-event gap per user (µs): lag() over the (ts, event_id)
    total order, then an exact integer sum/count — the cadence feature
    behind bot detection and engagement scoring. Deterministic: gaps are
    exact int64 µs differences, so the mean is a single fixed division.

    Scale: one window and one groupBy sharing the user_id partitioning;
    O(1) state per row."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .withColumn("gap_us", F.col("us") - F.col("prev_us"))
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.expr(mround("CAST(sum(gap_us) AS DOUBLE) / count(*)", 2)).alias(
            "mean_gap_us"
        ),
    )


WINDOW_MEAN_GAP_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, count(*) AS n_gaps,
       {mround('CAST(sum(gap_us) AS DOUBLE) / count(*)', 2)} AS mean_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


EWMA_LAGS = 16  # truncated-EWMA frame width (alpha = 0.5)


def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user
    (alpha = 0.5), truncated at the last EWMA_LAGS events — the smoothing
    primitive behind rate limiting, anomaly baselines, and engagement
    decay scoring. Computed as the exact EWMA recursion
    ``s = s_prev * 0.5 + x * 0.5`` folded over a bounded ROWS frame
    (contributions beyond 16 lags are < 2^-16 and are cut, which is what
    makes the operator a *window* rather than an unbounded running state).

    Determinism: the fold multiplies by 0.5 (exact in IEEE) and adds in
    frame order, which both engines fix identically (ts, event_id), so the
    raw double is bit-identical before the final mround. Spark's
    ``aggregate`` with a NULL init replicates DuckDB's ``list_reduce``
    first-element seeding exactly.

    Scale: one shuffle on user_id; the frame is O(EWMA_LAGS) values per
    row — constant state, no skew sensitivity beyond the per-user row
    count. At 100 TB the same plan holds; collect_list over a 16-row
    frame never materializes a partition."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(EWMA_LAGS - 1), 0)
    )
    # value is nullable in the schema: Spark's collect_list drops NULLs but
    # DuckDB's windowed list() keeps them — filter identically on BOTH
    # engines so the fold sees the same frame under any fixture
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    return (
        base.withColumn("lv", F.collect_list("value").over(w))
        .selectExpr(
            "user_id",
            "event_id",
            "us",
            f"{mround('value', 6)} AS value",
            "aggregate(lv, CAST(NULL AS DOUBLE), (acc, x) -> "
            "CASE WHEN acc IS NULL THEN x ELSE acc * 0.5 + x * 0.5 END) AS ewma_raw",
        )
        .selectExpr(
            "user_id", "event_id", "us", "value", f"{mround('ewma_raw', 6)} AS ewma"
        )
    )


WINDOW_EWMA_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN {EWMA_LAGS - 1} PRECEDING AND CURRENT ROW) AS lv
  FROM events WHERE value IS NOT NULL)
SELECT user_id, event_id, us,
       {mround('value', 6)} AS value,
       {mround('list_reduce(lv, (acc, x) -> acc * 0.5 + x * 0.5)', 6)} AS ewma
FROM base
"""


def window_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per user (alpha = beta = 0.5):
    level + trend folded over the same truncated 16-row frame as
    `window_ewma`, plus the one-step-ahead forecast level + trend — the
    simplest trend-aware forecaster (EWMA flattens trends; Holt follows
    them). Recursion: l' = (l + b)/2 + x/2 ; b' = b/2 + (l' - l)/2, seeded
    l0 = first frame value, b0 = 0.

    Determinism: every coefficient is a power of two (exact in IEEE) and
    the two-field state folds in frame order via an array accumulator
    seeded array(lv[0], 0) and folded over slice(lv, 2, ...) — the exact
    shape of DuckDB's list_reduce over a prepended seed, so the raw
    doubles are bit-identical before mround. (The r05 form seeded with
    NULL and branched per fold step; the CASE-free lambda here is the
    same IEEE op sequence but ~0.8 s cheaper to ANALYZE at sf0.1 —
    Catalyst's lambda type-coercion pass dominated the query's cold
    time, not execution.)

    Scale: identical profile to `window_ewma` — one user_id shuffle,
    O(16) state per row."""
    return _holt_folded(spark, sf_dir).selectExpr(
        "user_id",
        "event_id",
        "us",
        mround("st[0]", 6) + " AS level",
        mround("st[1]", 6) + " AS trend",
        mround("st[0] + st[1]", 6) + " AS forecast_next",
    )


def _holt_folded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_id, us, value, st) with st = [level, trend] after the
    Holt fold over the truncated frame — the single fold definition, shared
    by the forecast report and the rolling-origin backtest."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(EWMA_LAGS - 1), 0)
    )
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    # 2-element ARRAY accumulator [level, trend] on BOTH engines: DuckDB
    # 1.0's list_reduce mis-evaluates multi-field STRUCT lambda bodies
    # (sibling fields collapse to one expression), so arrays are the
    # portable exact-state encoding; Spark arrays are 0-based here.
    step_l = "(acc[0] + acc[1]) * 0.5 + x * 0.5"
    fold = (
        "aggregate(slice(lv, 2, size(lv) - 1), "
        "array(CAST(lv[0] AS DOUBLE), CAST(0 AS DOUBLE)), "
        f"(acc, x) -> array({step_l}, "
        f"acc[1] * 0.5 + (({step_l}) - acc[0]) * 0.5))"
    )
    return base.withColumn("lv", F.collect_list("value").over(w)).withColumn(
        "st", F.expr(fold)
    )


def _holt_sql() -> str:
    step_l = "(acc[1] + acc[2]) * 0.5 + v[1] * 0.5"
    fold = (
        "list_reduce(list_prepend([CAST(lv[1] AS DOUBLE), CAST(0 AS DOUBLE)], "
        "list_transform(lv[2:], x -> [CAST(x AS DOUBLE), CAST(0 AS DOUBLE)])), "
        f"(acc, v) -> [{step_l}, "
        f"acc[2] * 0.5 + (({step_l}) - acc[1]) * 0.5])"
    )
    return f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN {EWMA_LAGS - 1} PRECEDING AND CURRENT ROW) AS lv
  FROM events WHERE value IS NOT NULL),
folded AS (SELECT user_id, event_id, us, {fold} AS st FROM base)
SELECT user_id, event_id, us,
       {mround('st[1]', 6)} AS level,
       {mround('st[2]', 6)} AS trend,
       {mround('st[1] + st[2]', 6)} AS forecast_next
FROM folded
"""


WINDOW_HOLT_SQL = _holt_sql()


def window_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the Holt forecaster: at each event t the
    model's one-step-ahead forecast (made at t-1, same fold as
    `window_holt_forecast` via the shared `_holt_folded`) is compared to
    the realized value, and the corpus-wide error profile — MAE, signed
    bias, MAPE — is reported. This is the eval loop of the forecasting
    family: the number that tells you whether Holt's trend term earns its
    keep over plain EWMA on this corpus before anyone ships it.

    Determinism: the forecast is the mround(6) value the forecast report
    itself emits (so the backtest scores the OUTPUT contract, not a
    private variant); per-event |err|, err, and |err|/value terms are
    pre-rounded to a 1e-6 integer grid BEFORE the corpus mean, so the
    reduction is an integer sum (value > 0 throughout the fixture grid;
    NULLIF guards division anyway).

    Scale: the fold's one user shuffle is reused by the lag window (same
    partitioning + ordering — no second exchange); the final aggregate is
    partial-combined to a single row."""
    h = _holt_folded(spark, sf_dir).selectExpr(
        "user_id", "us", "event_id", "value",
        mround("st[0] + st[1]", 6) + " AS fc",
    )
    wlag = Window.partitionBy("user_id").orderBy("us", "event_id")
    scored = (
        h.withColumn("fc_prev", F.lag("fc").over(wlag))
        .filter(F.col("fc_prev").isNotNull())
        .selectExpr(
            "CAST(floor(abs(value - fc_prev) * 1000000 + 0.5) AS BIGINT) AS ae6",
            "CAST(floor((value - fc_prev) * 1000000 + 0.5) AS BIGINT) AS e6",
            "CAST(floor(abs(value - fc_prev) / nullif(value, 0) * 1000000 + 0.5) AS BIGINT) AS ape6",
        )
    )
    return scored.agg(
        F.count("*").alias("n_forecasts"),
        F.sum("ae6").alias("sae"),
        F.sum("e6").alias("se"),
        F.sum("ape6").alias("sape"),
    ).selectExpr(
        "n_forecasts",
        mround("CAST(sae AS DOUBLE) / 1000000 / n_forecasts", 6) + " AS mae",
        mround("CAST(se AS DOUBLE) / 1000000 / n_forecasts", 6) + " AS bias",
        mround("CAST(sape AS DOUBLE) / 1000000 / n_forecasts", 6) + " AS mape",
    )


def _backtest_sql() -> str:
    step_l = "(acc[1] + acc[2]) * 0.5 + v[1] * 0.5"
    fold = (
        "list_reduce(list_prepend([CAST(lv[1] AS DOUBLE), CAST(0 AS DOUBLE)], "
        "list_transform(lv[2:], x -> [CAST(x AS DOUBLE), CAST(0 AS DOUBLE)])), "
        f"(acc, v) -> [{step_l}, "
        f"acc[2] * 0.5 + (({step_l}) - acc[1]) * 0.5])"
    )
    return f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN {EWMA_LAGS - 1} PRECEDING AND CURRENT ROW) AS lv
  FROM events WHERE value IS NOT NULL),
folded AS (SELECT user_id, us, event_id, value, {fold} AS st FROM base),
fc AS (SELECT user_id, us, event_id, value,
              {mround('st[1] + st[2]', 6)} AS fc
       FROM folded),
scored AS (
  SELECT CAST(floor(abs(value - fc_prev) * 1000000 + 0.5) AS BIGINT) AS ae6,
         CAST(floor((value - fc_prev) * 1000000 + 0.5) AS BIGINT) AS e6,
         CAST(floor(abs(value - fc_prev) / nullif(value, 0) * 1000000 + 0.5) AS BIGINT) AS ape6
  FROM (SELECT value, lag(fc) OVER (PARTITION BY user_id ORDER BY us, event_id) AS fc_prev
        FROM fc) t
  WHERE fc_prev IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_forecasts,
       {mround('CAST(sum(ae6) AS DOUBLE) / 1000000 / count(*)', 6)} AS mae,
       {mround('CAST(sum(e6) AS DOUBLE) / 1000000 / count(*)', 6)} AS bias,
       {mround('CAST(sum(ape6) AS DOUBLE) / 1000000 / count(*)', 6)} AS mape
FROM scored
"""


WINDOW_BACKTEST_SQL = _backtest_sql()


def window_cusum_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point statistic per user: running sum of the deviation
    of each event's value from the user's mean, reported at its peak
    |cusum| — where the cumulative drift is largest, i.e. the most likely
    behavior-change point (Page's CUSUM, the batch form).

    Exactness: the mean enters as integers — ``dev_i = value_cents * n_u -
    sum_cents_u`` is the deviation scaled by n_u, so the running sum and
    the arg-max are integer arithmetic end to end; one deterministic
    division surfaces the peak mean-deviation. Overflow bound: |dev| ≤
    cents_max * n_u (~5.6e8 * n_u) and |cusum| ≤ n_u * |dev| — safe in
    int64 to ~4e4 events/user at this value range; beyond that switch the
    two columns to DECIMAL(38,0) (same plan).

    Scale: three windows and zero joins, all sharing the user_id
    partitioning (one shuffle total); per-row O(1) state."""
    e = load_table(spark, sf_dir, "events")
    wtot = Window.partitionBy("user_id")
    word = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = e.selectExpr(
        "user_id", "event_id", "unix_micros(ts) AS us", f"{cents('value')} AS vc"
    )
    cs = (
        base.withColumn("n_u", F.count("*").over(wtot))
        .withColumn("sum_c", F.sum("vc").over(wtot))
        .withColumn("dev", F.col("vc") * F.col("n_u") - F.col("sum_c"))
        .withColumn("cusum", F.sum("dev").over(word))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ),
        )
    )
    wpk = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("cusum")).desc(), F.asc("rn")
    )
    return (
        cs.withColumn("pk", F.row_number().over(wpk))
        .filter("pk = 1")
        .selectExpr(
            "user_id",
            "CAST(n_u AS BIGINT) AS n_events",
            "CAST(rn AS BIGINT) AS peak_pos",
            f"{mround('CAST(cusum AS DOUBLE) / n_u / 1000000', 6)} AS peak_dev",
        )
    )


WINDOW_CUSUM_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {cents('value')} AS vc
  FROM events),
cs AS (
  SELECT user_id, event_id, us, vc,
         count(*) OVER (PARTITION BY user_id) AS n_u,
         sum(vc) OVER (PARTITION BY user_id) AS sum_c,
         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
  FROM base),
run AS (
  SELECT user_id, n_u, rn,
         sum(vc * n_u - sum_c) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM cs),
pk AS (
  SELECT user_id, n_u, rn, cusum,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY abs(cusum) DESC, rn ASC) AS pk
  FROM run)
SELECT user_id, CAST(n_u AS BIGINT) AS n_events, CAST(rn AS BIGINT) AS peak_pos,
       {mround('CAST(cusum AS DOUBLE) / n_u / 1000000', 6)} AS peak_dev
FROM pk WHERE pk = 1
"""


ZS_LAGS = 20  # rolling z-score baseline width (includes current row)


def window_zscore_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly signal per user: each event's value scored
    against the trailing-20-event mean/std — the windowed complement of
    the global `events_anomaly_mad` detector (a user whose spend drifts
    needs a LOCAL baseline).

    Exactness: values quantized to centi-units (int64), and the z-score
    algebra is rearranged to keep everything integer until one sqrt:
    z = (n·x − S) / sqrt(n·(n·SS − S²)) … specifically (n·x − S) /
    sqrt(n·SS − S²), whose radicand is an exact int64 (bounded: centi-vals
    ≤ 5.7e4, squares ≤ 3.3e9, n·SS ≤ 1.3e12 at n = 20 — headroom to value
    ≈ 2e7 before DECIMAL is needed). sqrt is IEEE-correctly-rounded, the
    final division is one deterministic double op.

    Scale: two windowed integer sums sharing the user_id shuffle; O(frame)
    state; degenerate (constant) baselines yield NULL via nullif, both
    engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(ZS_LAGS - 1), 0)
    )
    base = e.selectExpr(
        "user_id",
        "event_id",
        "unix_micros(ts) AS us",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq",
    )
    stat = (
        base.withColumn("n_w", F.count("*").over(w))
        .withColumn("s_w", F.sum("vq").over(w))
        .withColumn("ss_w", F.sum(F.col("vq") * F.col("vq")).over(w))
    )
    return stat.selectExpr(
        "user_id",
        "event_id",
        "us",
        "CAST(vq AS DOUBLE) / 100 AS value",
        "CAST(n_w AS INT) AS n_baseline",
        f"{mround('CAST(n_w * vq - s_w AS DOUBLE) / nullif(sqrt(CAST(n_w * ss_w - s_w * s_w AS DOUBLE)), 0)', 6)} AS zscore",
    )


WINDOW_ZSCORE_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
  FROM events),
stat AS (
  SELECT user_id, event_id, us, vq,
         count(*) OVER w AS n_w, sum(vq) OVER w AS s_w,
         sum(vq * vq) OVER w AS ss_w
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN {ZS_LAGS - 1} PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, us, CAST(vq AS DOUBLE) / 100 AS value,
       CAST(n_w AS INT) AS n_baseline,
       {mround('CAST(n_w * vq - s_w AS DOUBLE) / nullif(sqrt(CAST(n_w * ss_w - s_w * s_w AS DOUBLE)), 0)', 6)} AS zscore
FROM stat
"""


QUERIES: dict[str, QuerySpec] = {
    "window_zscore_rolling": QuerySpec(
        window_zscore_rolling, WINDOW_ZSCORE_SQL, "window"
    ),
    "window_ewma": QuerySpec(window_ewma, WINDOW_EWMA_SQL, "window"),
    "window_holt_forecast": QuerySpec(window_holt_forecast, WINDOW_HOLT_SQL, "window"),
    "window_cusum_detect": QuerySpec(window_cusum_detect, WINDOW_CUSUM_SQL, "window"),
    "window_mean_gap": QuerySpec(window_mean_gap, WINDOW_MEAN_GAP_SQL, "window"),
    "window_running_distinct": QuerySpec(window_running_distinct, WINDOW_RUNNING_DISTINCT_SQL, "window"),
    "window_ignore_nulls": QuerySpec(window_ignore_nulls, WINDOW_IGNORE_NULLS_SQL, "window"),
    "window_rank_topn": QuerySpec(window_rank_topn, WINDOW_RANK_SQL, "window"),
    "window_range_frame": QuerySpec(window_range_frame, WINDOW_RANGE_SQL, "window"),
    "window_frame_following": QuerySpec(window_frame_following, WINDOW_FOLLOWING_SQL, "window"),
    "window_range_centered": QuerySpec(window_range_centered, WINDOW_RANGE_CENTERED_SQL, "window"),
    "window_percentiles": QuerySpec(window_percentiles, WINDOW_PERCENTILES_SQL, "window"),
    "window_rank_dense": QuerySpec(window_rank_dense, WINDOW_DENSE_SQL, "window"),
    "window_running_sum": QuerySpec(window_running_sum, WINDOW_RUNNING_SQL, "window"),
    "window_lag_lead": QuerySpec(window_lag_lead, WINDOW_LAG_SQL, "window"),
    "window_moving_avg": QuerySpec(window_moving_avg, WINDOW_MOVING_SQL, "window"),
    "window_ntile": QuerySpec(window_ntile, WINDOW_NTILE_SQL, "window"),
    "window_forecast_backtest": QuerySpec(
        window_forecast_backtest, WINDOW_BACKTEST_SQL, "window"
    ),
}


US_H = 3_600_000_000  # microseconds per hour


def events_lag_features_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training-matrix build: for every `purchase` event, the
    feature vector a model would have seen STRICTLY BEFORE that instant —
    trailing 24h/7d activity counts, 7-day spend, previous event type, and
    seconds since the previous event. The defining constraint is leakage
    freedom: every RANGE frame ends at -1 microsecond, so the label row's
    own value can never enter its features (the feature-store correctness
    rule as-of joins exist for, expressed as windows because label and
    features ride the SAME stream here).

    Determinism: counts and cents sums are integers inside exactly-bounded
    integer RANGE frames; gap seconds are integer division; the previous
    type is lag() under a total order.

    Scale: ONE user_id shuffle serves every frame and the lag (identical
    partitioning + ordering); purchases filter AFTER the windows (a
    pre-filter would corrupt the trailing counts). RANGE frame state is
    bounded by a user's 7-day activity, not history."""
    e = load_table(spark, sf_dir, "events")
    base = e.selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "unix_micros(ts) AS us",
        f"{cents('value', 100)} AS vc",
    )
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    # RANGE frames need a single numeric sort key: order on us alone there
    # (the -1µs bound excludes same-instant rows regardless of event_id
    # ties); lag keeps the (us, event_id) total order
    wr = Window.partitionBy("user_id").orderBy("us")
    feats = (
        base.withColumn("n_24h", F.count("*").over(wr.rangeBetween(-24 * US_H, -1)))
        .withColumn(
            "n_clicks_7d",
            F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END")).over(
                wr.rangeBetween(-7 * 24 * US_H, -1)
            ),
        )
        .withColumn(
            "spend_7d_c",
            F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN vc ELSE 0 END")).over(
                wr.rangeBetween(-7 * 24 * US_H, -1)
            ),
        )
        .withColumn("prev_type", F.lag("event_type").over(order))
        .withColumn("prev_us", F.lag("us").over(order))
    )
    return feats.filter("event_type = 'purchase'").selectExpr(
        "user_id",
        "event_id",
        "us AS label_us",
        "coalesce(n_24h, 0) AS n_events_24h",
        "coalesce(n_clicks_7d, 0) AS n_clicks_7d",
        "CAST(coalesce(spend_7d_c, 0) AS DOUBLE) / 100 AS spend_7d",
        "coalesce(prev_type, 'none') AS prev_type",
        "CASE WHEN prev_us IS NULL THEN CAST(-1 AS BIGINT) "
        "ELSE (us - prev_us) div 1000000 END AS secs_since_prev",
    )


EVENTS_LAG_FEATURES_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         {cents('value', 100)} AS vc
  FROM events),
feats AS (
  SELECT user_id, event_id, event_type, us,
         count(*) OVER w24 AS n_24h,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w7d AS n_clicks_7d,
         sum(CASE WHEN event_type = 'purchase' THEN vc ELSE 0 END) OVER w7d AS spend_7d_c,
         lag(event_type) OVER wo AS prev_type,
         lag(us) OVER wo AS prev_us
  FROM base
  WINDOW
    w24 AS (PARTITION BY user_id ORDER BY us
            RANGE BETWEEN {24 * US_H} PRECEDING AND 1 PRECEDING),
    w7d AS (PARTITION BY user_id ORDER BY us
            RANGE BETWEEN {7 * 24 * US_H} PRECEDING AND 1 PRECEDING),
    wo AS (PARTITION BY user_id ORDER BY us, event_id))
SELECT user_id, event_id, us AS label_us,
       CAST(coalesce(n_24h, 0) AS BIGINT) AS n_events_24h,
       CAST(coalesce(n_clicks_7d, 0) AS BIGINT) AS n_clicks_7d,
       CAST(coalesce(spend_7d_c, 0) AS DOUBLE) / 100 AS spend_7d,
       coalesce(prev_type, 'none') AS prev_type,
       CASE WHEN prev_us IS NULL THEN CAST(-1 AS BIGINT)
            ELSE (us - prev_us) // 1000000 END AS secs_since_prev
FROM feats
WHERE event_type = 'purchase'
"""

QUERIES["events_lag_features_asof"] = QuerySpec(
    events_lag_features_asof, EVENTS_LAG_FEATURES_SQL, "time-window"
)


# --- Bollinger bands over the daily-revenue series -------------------------

BB_WIN = 20  # trading-convention 20-day window, 2-sigma bands


def window_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on the daily order-revenue series: 20-day rolling
    mean +/- 2 population sigmas, with a breakout flag when the day's
    revenue pierces a band — the volatility-envelope read on the series
    the anomaly/CUSUM family watches. Only days with a FULL 20-day history
    report (rn >= BB_WIN), the standard warm-up rule.

    Exactness: daily revenue is an exact int64 cents sum; the window sum
    of squares runs in DECIMAL(38,0) on the Spark side (a single cents
    square ~8.6e17 fits int64 but the 20-day sum does not) and DuckDB's
    native HUGEINT sum on the oracle side — both exact integers, so the
    variance numerator (ss*w - s*s), the IEEE-correctly-rounded sqrt, and
    the band comparisons are bit-identical. The breakout compare runs on
    the same doubles both engines derive from the same integers.

    Scale: one groupBy collapses orders to the day grid (bounded by
    calendar size), one window pass over that reduced series with O(1)
    state per row. At 100 TB the day table is still ~3k rows — the window
    runs on a table that fits in one partition by construction (a single
    unpartitioned sort of a calendar-bounded table, not of data)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            f"{cents('o_totalprice', 100)} AS c",
        )
        .groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(-(BB_WIN - 1), 0)
    )
    wn = Window.orderBy("day")
    ss_expr = F.sum(
        (F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)"))
    ).over(w)
    roll = (
        daily.withColumn("s", F.sum("c").over(w).cast("decimal(38,0)"))
        .withColumn("ss", ss_expr)
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") >= BB_WIN)
    )
    mean_c = f"CAST(s AS DOUBLE) / {BB_WIN}"
    var_c = (
        f"(CAST(ss AS DOUBLE) * {BB_WIN} - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        f" / {BB_WIN * BB_WIN}"
    )
    std_c = f"sqrt(greatest({var_c}, 0.0))"
    return roll.selectExpr(
        "date_format(day, 'yyyy-MM-dd') AS day",
        mround("CAST(c AS DOUBLE) / 100", 2) + " AS revenue",
        mround(f"({mean_c}) / 100", 2) + " AS sma",
        mround(f"(({mean_c}) + 2 * ({std_c})) / 100", 2) + " AS upper_band",
        mround(f"(({mean_c}) - 2 * ({std_c})) / 100", 2) + " AS lower_band",
        "CAST(CASE WHEN CAST(c AS DOUBLE) > "
        f"({mean_c}) + 2 * ({std_c}) THEN 1 "
        f"WHEN CAST(c AS DOUBLE) < ({mean_c}) - 2 * ({std_c}) THEN -1 "
        "ELSE 0 END AS BIGINT) AS breakout",
    )


def _bollinger_sql() -> str:
    mean_c = f"CAST(s AS DOUBLE) / {BB_WIN}"
    var_c = (
        f"(CAST(ss AS DOUBLE) * {BB_WIN} - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        f" / {BB_WIN * BB_WIN}"
    )
    std_c = f"sqrt(greatest({var_c}, 0.0))"
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum({cents('o_totalprice', 100)}) AS BIGINT) AS c
  FROM orders GROUP BY 1),
roll AS (
  SELECT day, c,
         sum(c) OVER w AS s,
         sum(c * c) OVER w AS ss,
         row_number() OVER (ORDER BY day) AS rn
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {BB_WIN - 1} PRECEDING AND CURRENT ROW))
SELECT strftime(day, '%Y-%m-%d') AS day,
       {mround("CAST(c AS DOUBLE) / 100", 2)} AS revenue,
       {mround(f"({mean_c}) / 100", 2)} AS sma,
       {mround(f"(({mean_c}) + 2 * ({std_c})) / 100", 2)} AS upper_band,
       {mround(f"(({mean_c}) - 2 * ({std_c})) / 100", 2)} AS lower_band,
       CAST(CASE WHEN CAST(c AS DOUBLE) > ({mean_c}) + 2 * ({std_c}) THEN 1
            WHEN CAST(c AS DOUBLE) < ({mean_c}) - 2 * ({std_c}) THEN -1
            ELSE 0 END AS BIGINT) AS breakout
FROM roll WHERE rn >= {BB_WIN}
"""


WINDOW_BOLLINGER_SQL = _bollinger_sql()

QUERIES["window_bollinger_bands"] = QuerySpec(
    window_bollinger_bands, WINDOW_BOLLINGER_SQL, "window"
)


# ---------------------------------------------------------------------------
# Rolling discrete percentile — round 7
# ---------------------------------------------------------------------------

ROLL_P90_W = 16  # trailing gaps per window


def window_rolling_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling lower p90 of the inter-event gap over the trailing
    ROLL_P90_W gaps per user — the windowed tail-latency monitor (a rising
    rolling p90 flags a user/device going quiet long before the mean
    moves; the same shape monitors service latency SLOs). No engine has a
    windowed exact percentile builtin, so BOTH engines run the identical
    explicit recipe: collect the frame into a row-local array, sort it,
    and index k = ceil(0.9·n) (1-based lower percentile_disc, computed as
    the pure-integer (9n+9) div 10) — gap values are exact int64 µs, so
    every output is an input value, never interpolated.

    Gaps use the catalog's standard (ts, event_id) total order
    (`window_mean_gap`). Scale: one user_id-partitioned window; the frame
    array is BOUNDED (ROLL_P90_W values — O(W log W) per row, ~100 B of
    state), unlike an unbounded collect_list; rows flow through one
    exchange shared with the lag()."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .withColumn("gap_us", F.col("us") - F.col("prev_us"))
        .withColumn("seq", F.row_number().over(w))
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(ROLL_P90_W - 1), Window.currentRow)
    )
    return (
        gaps.withColumn("frame", F.collect_list("gap_us").over(wr))
        .selectExpr(
            "user_id",
            "CAST(seq AS BIGINT) AS seq",
            "gap_us",
            "CAST(size(frame) AS BIGINT) AS n_window",
            "element_at(array_sort(frame), CAST((9 * size(frame) + 9) div 10 AS INT))"
            " AS p90_gap_us",
        )
    )


WINDOW_ROLLING_P90_SQL = f"""
WITH gaps AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM events),
g2 AS (
  SELECT user_id, us, event_id, gap_us,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS seq
  FROM gaps WHERE gap_us IS NOT NULL),
framed AS (
  SELECT user_id, seq, gap_us,
         list(gap_us) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN {ROLL_P90_W - 1} PRECEDING AND CURRENT ROW) AS frame
  FROM g2)
SELECT user_id, seq, gap_us,
       CAST(len(frame) AS BIGINT) AS n_window,
       list_sort(frame)[(9 * len(frame) + 9) // 10] AS p90_gap_us
FROM framed
"""


QUERIES["window_rolling_p90"] = QuerySpec(
    window_rolling_p90, WINDOW_ROLLING_P90_SQL, "window"
)


# ---------------------------------------------------------------------------
# cume_dist / percent_rank — round 10 (the two rank-family window functions
# the catalog didn't yet exercise)
# ---------------------------------------------------------------------------


def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist and percent_rank of each priority's 8 most expensive
    orders within their priority group — the relative-standing readout
    (rank() gives position; these give POSITION AS A FRACTION, which is
    what a percentile-based alerting rule consumes).

    Determinism: the metric windows order by VALUE ONLY, so tied prices
    share identical cume_dist/percent_rank in both engines (both are pure
    functions of the peer-group value multiset); the row-selection window
    adds the o_orderkey tie-break so 'top 8' is unambiguous.

    Scale: one hash exchange on o_orderpriority serves all three window
    functions (same partition spec); no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w_sel = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_val = Window.partitionBy("o_orderpriority").orderBy(F.asc("o_totalprice"))
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_sel).alias("rn"),
            F.cume_dist().over(w_val).alias("cd"),
            F.percent_rank().over(w_val).alias("pr"),
        )
        .filter(F.col("rn") <= 8)
        .selectExpr(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            "CAST(rn AS BIGINT) AS rn",
            "floor(cd * 1000000 + 0.5) / 1000000 AS cume_dist",
            "floor(pr * 1000000 + 0.5) / 1000000 AS percent_rank",
        )
    )


WINDOW_CUME_DIST_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(rn AS BIGINT) AS rn,
       floor(cd * 1000000 + 0.5) / 1000000 AS cume_dist,
       floor(pr * 1000000 + 0.5) / 1000000 AS percent_rank
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
         cume_dist() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice ASC) AS cd,
         percent_rank() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice ASC) AS pr
  FROM orders) t
WHERE rn <= 8
"""


QUERIES["window_cume_dist"] = QuerySpec(
    window_cume_dist, WINDOW_CUME_DIST_SQL, "window"
)
