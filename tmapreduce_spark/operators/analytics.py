"""Analytics wave 2: data-quality audits, activity analytics, and
frontier/survival operators the reference's fixed map/shuffle/reduce pipeline
could only express as bespoke UDF pairs (ref behavioral scope:
`src/tmapreduce/master/job.cc:10-77` — partition/merge/finish is the whole
engine; every operator below is "what a user would have to hand-write as a
Map/Reduce .so", re-expressed as declarative Spark plans).

Parity rules follow `tmapreduce_spark.parity`: exact integer arithmetic end
to end, one deterministic IEEE division chain at the surface, identical
aliases both dialects.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.parity import cents, mround
from tmapreduce_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------

_FK_EDGES: list[tuple[str, str, str, str]] = [
    # (child table, fk column, parent table, pk column)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


def diag_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every FK edge in the schema, the
    child row count, distinct FK values, and the number of ORPHAN child rows
    whose FK has no matching parent — the first data-quality gate before any
    join-based pipeline (an orphan rate > 0 silently drops rows from inner
    joins downstream).

    Scale: each edge is one left-anti join of the child's FK COLUMN (pruned
    scan, no payload) against the parent key — AQE broadcasts the parent
    side for dimension-sized parents, and the output is one row per edge.
    Counts never shuffle child payloads; at 100 TB this is a handful of
    column scans."""
    rows = []
    for child, fk, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("pk"))
        stats = c.agg(
            F.count("*").alias("n_child"),
            F.countDistinct("fk").alias("n_distinct_fk"),
        )
        orphans = c.join(p, c.fk == p.pk, "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        rows.append(
            stats.crossJoin(orphans).selectExpr(
                f"'{child}.{fk}->{parent}.{pk}' AS fk_edge",
                "n_child",
                "n_distinct_fk",
                "n_orphans",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


DIAG_REF_ORPHANS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{child}.{fk}->{parent}.{pk}' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count(DISTINCT {fk}) AS BIGINT) AS n_distinct_fk,
       CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
    for child, fk, parent, pk in _FK_EDGES
)


# ---------------------------------------------------------------------------
# Activity analytics over events
# ---------------------------------------------------------------------------


def events_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type diversity: Simpson/Gini-Simpson index
    1 - sum(p_t^2) over the user's event-type distribution — the
    transcendental-free twin of Shannon entropy (bots hammer one type →
    diversity ~0; organic users spread across types). Exact-rational:
    (n^2 - sum(c_t^2)) / n^2 with integer numerator/denominator, one IEEE
    division + mround — bit-identical across engines, unlike ln()-based
    entropy whose libm differs per platform.

    Scale: two partial-agg groupBys that share the user_id-first key
    ((user, type) then user) — per-type counts collapse map-side, the
    second aggregation touches ~n_users x n_types rows. No window, no
    explode."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count("*").alias("n_types"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        .selectExpr(
            "user_id",
            "n_events",
            "n_types",
            mround(
                "CAST(n_events * n_events - s2 AS DOUBLE)"
                " / (n_events * n_events)",
                6,
            )
            + " AS simpson_diversity",
        )
    )


EVENTS_TYPE_DIVERSITY_SQL = f"""
WITH per_type AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type),
u AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM per_type GROUP BY user_id)
SELECT user_id, n_events, n_types,
       {mround('CAST(n_events * n_events - s2 AS DOUBLE) / (n_events * n_events)', 6)}
         AS simpson_diversity
FROM u
"""


def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + rolling 7-day active users (WAU) per observed day — THE
    engagement dashboard query. A sliding COUNT(DISTINCT) can't partial-agg,
    so the scalable formulation uses the interval-contribution trick: per
    (user, day) activity row, the user "covers" days [day, min(next_day - 1,
    day + 6)] — consecutive covers are disjoint per user by construction, so
    a plain count per covered day IS the distinct-user count. Fan-out is
    bounded by the window length (<= 7 rows per user-day), then one tiny
    groupBy on day.

    Scale: the user-day reduction and the lead() share one user_id shuffle;
    the explode emits <= 7x the REDUCED user-day table (not the raw events);
    the day groupBy has ~calendar-size key space. The naive per-day distinct
    scan is O(days x corpus); this is one linear pass."""
    e = load_table(spark, sf_dir, "events")
    userday = e.selectExpr("user_id", "CAST(ts AS DATE) AS day").distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    covered = (
        userday.withColumn("nxt", F.lead("day").over(w))
        .selectExpr(
            "user_id",
            "day",
            "CASE WHEN nxt IS NULL THEN date_add(day, 6) "
            "ELSE least(date_add(day, 6), date_add(nxt, -1)) END AS cov_end",
        )
        .selectExpr("explode(sequence(day, cov_end)) AS day")
        .groupBy("day")
        .agg(F.count("*").alias("wau7"))
    )
    dau = userday.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        dau.join(covered, "day")
        .selectExpr("date_format(day, 'yyyy-MM-dd') AS day", "dau", "wau7")
    )


EVENTS_ACTIVE_USERS_SQL = """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST((SELECT count(DISTINCT user_id) FROM events e
             WHERE CAST(e.ts AS DATE) = days.d) AS BIGINT) AS dau,
       CAST((SELECT count(DISTINCT user_id) FROM events e
             WHERE CAST(e.ts AS DATE) BETWEEN days.d - 6 AND days.d)
            AS BIGINT) AS wau7
FROM days
"""


def events_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of cumulative event value — the largest
    peak-to-trough drop of the running total (the classic risk statistic,
    equally the churn-warning signal when "value" is engagement). Running
    sum, running max, and the final argmax all in exact integer micro-units
    over ONE fully-specified order (us, event_id), so the result is
    reduction-order-independent.

    Scale: three window functions + the final groupBy all share one
    user_id hash partitioning — a single shuffle; frames are
    unbounded-preceding running aggregates (O(1) state per row)."""
    e = load_table(spark, sf_dir, "events")
    base = e.selectExpr(
        "user_id",
        "event_id",
        "unix_micros(ts) AS us",
        f"{cents('value')} AS vc",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = base.withColumn("cum", F.sum("vc").over(w)).withColumn(
        "peak", F.max(F.col("cum")).over(w)
    )
    return (
        run.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("cum")).alias("dd"),
            F.max("cum").alias("peak_vc"),
            F.sum("vc").alias("final_vc"),
        )
        .selectExpr(
            "user_id",
            "CAST(dd AS DOUBLE) / 1000000 AS max_drawdown",
            "CAST(peak_vc AS DOUBLE) / 1000000 AS peak_value",
            "CAST(final_vc AS DOUBLE) / 1000000 AS final_value",
        )
    )


EVENTS_DRAWDOWN_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, {cents('value')} AS vc
  FROM events),
cums AS (
  SELECT user_id, event_id, us, vc,
         sum(vc) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM base),
run AS (
  SELECT user_id, vc, cum,
         max(cum) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak
  FROM cums)
SELECT user_id,
       CAST(max(peak - cum) AS DOUBLE) / 1000000 AS max_drawdown,
       CAST(max(cum) AS DOUBLE) / 1000000 AS peak_value,
       CAST(sum(vc) AS DOUBLE) / 1000000 AS final_value
FROM run GROUP BY user_id
"""


_TTC_HORIZON_US = 24 * 3600 * 1_000_000  # view -> purchase credit horizon


def events_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every purchase preceded by a view
    within 24 h, the view->purchase delay bucketed on a log-ish grid
    (<1 m, <1 h, <6 h, <24 h) — the latency histogram behind funnel
    optimization. The preceding view comes from last_value(IGNORE NULLS)
    over a strictly-preceding frame (the `events_attribution_last_touch`
    carry pattern — zero joins); delays are exact int64 micros, the mean is
    one deterministic division.

    Scale: one user_id window shuffle + a 4-key groupBy. The frame is a
    running carry (O(1) state), never a per-purchase scan-back."""
    e = load_table(spark, sf_dir, "events")
    base = e.selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "unix_micros(ts) AS us",
        "CASE WHEN event_type = 'view' THEN unix_micros(ts) END AS v_us",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = (
        base.withColumn("lv_us", F.last("v_us", ignorenulls=True).over(w))
        .filter(
            f"event_type = 'purchase' AND lv_us IS NOT NULL"
            f" AND us - lv_us <= {_TTC_HORIZON_US}"
        )
        .selectExpr("us - lv_us AS delay_us")
        .selectExpr(
            "delay_us",
            "CASE WHEN delay_us < 60000000 THEN '0_lt_1m' "
            "WHEN delay_us < 3600000000 THEN '1_lt_1h' "
            "WHEN delay_us < 21600000000 THEN '2_lt_6h' "
            "ELSE '3_lt_24h' END AS bucket",
        )
    )
    return (
        conv.groupBy("bucket")
        .agg(F.count("*").alias("n_conversions"), F.sum("delay_us").alias("sd"))
        .selectExpr(
            "bucket",
            "n_conversions",
            mround("CAST(sd AS DOUBLE) / n_conversions / 1000000", 3)
            + " AS mean_delay_s",
        )
    )


EVENTS_FUNNEL_TTC_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS v_us
  FROM events),
carry AS (
  SELECT user_id, event_type, us,
         last_value(v_us IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv_us
  FROM base),
conv AS (
  SELECT us - lv_us AS delay_us,
         CASE WHEN us - lv_us < 60000000 THEN '0_lt_1m'
              WHEN us - lv_us < 3600000000 THEN '1_lt_1h'
              WHEN us - lv_us < 21600000000 THEN '2_lt_6h'
              ELSE '3_lt_24h' END AS bucket
  FROM carry
  WHERE event_type = 'purchase' AND lv_us IS NOT NULL
        AND us - lv_us <= {_TTC_HORIZON_US})
SELECT bucket, CAST(count(*) AS BIGINT) AS n_conversions,
       {mround('CAST(sum(delay_us) AS DOUBLE) / count(*) / 1000000', 3)}
         AS mean_delay_s
FROM conv GROUP BY bucket
"""


def events_gap_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence per user: mean gap and the squared coefficient of
    variation CV^2 = Var(g)/mean(g)^2 — the burstiness statistic (Poisson
    arrivals give CV^2 ~ 1, metronomic bots << 1, bursty humans > 1) that
    complements `window_mean_gap`. Gaps are exact integer SECONDS (int64
    squares stay in range at any horizon — the micro-unit square would
    overflow at day-scale gaps); CV^2 = (n*sum(g^2) - sum(g)^2) / sum(g)^2
    is exact-integer until one guarded division.

    Scale: lag() and the groupBy share one user_id shuffle; per-user state
    is three int64 sums (partial-aggregatable)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
        .withColumn("prev", F.lag("us").over(w))
        .filter("prev IS NOT NULL")
        .selectExpr("user_id", "CAST((us - prev) div 1000000 AS BIGINT) AS g")
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("g").alias("s"),
            F.sum(F.col("g") * F.col("g")).alias("s2"),
        )
        .selectExpr(
            "user_id",
            "n_gaps",
            mround("CAST(s AS DOUBLE) / n_gaps", 3) + " AS mean_gap_s",
            mround("CAST(n_gaps * s2 - s * s AS DOUBLE) / nullif(s * s, 0)", 6)
            + " AS cv2",
        )
    )


EVENTS_BURSTINESS_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         CAST((us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id))
              // 1000000 AS BIGINT) AS g
  FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) t),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(g) AS BIGINT) AS s, CAST(sum(g * g) AS BIGINT) AS s2
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps,
       {mround('CAST(s AS DOUBLE) / n_gaps', 3)} AS mean_gap_s,
       {mround('CAST(n_gaps * s2 - s * s AS DOUBLE) / nullif(s * s, 0)', 6)}
         AS cv2
FROM agg
"""


# ---------------------------------------------------------------------------
# Pareto frontier (skyline)
# ---------------------------------------------------------------------------


def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / pareto frontier of orders: every order not STRICTLY
    dominated — no other order is both strictly earlier AND strictly
    higher-priced. The multi-objective "best trade-offs" operator (earliest
    high-value orders here; quality-vs-length docs, cost-vs-latency configs
    in general).

    The naive skyline is the O(n^2) NOT EXISTS self-join. The
    one-dimensional-sweep formulation is a running max of price over
    strictly-earlier days — but a bare global window is a single-partition
    sort. The scalable twin used here two-levels it: (1) a window
    PARTITIONED by month computes each row's strictly-earlier-same-month
    running max; (2) the per-month max table (12 rows/year, broadcast) gives
    the all-prior-months max; dominated = price below either. Exactness:
    prices in integer cents, day ordinal ints; RANGE frame on the day int
    makes same-day ties non-dominating in both engines.

    Scale: one month-partitioned window (thousands of parallel partitions)
    + one broadcast join against a calendar-sized aggregate — no global
    sort anywhere."""
    o = load_table(spark, sf_dir, "orders")
    base = o.selectExpr(
        "o_orderkey",
        "o_orderdate",
        "datediff(o_orderdate, DATE '1992-01-01') AS d",
        "(year(o_orderdate) * 12 + month(o_orderdate)) AS ym",
        f"{cents('o_totalprice', 100)} AS pc",
    )
    wloc = (
        Window.partitionBy("ym")
        .orderBy("d")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn("loc_max", F.max("pc").over(wloc))
    month_max = base.groupBy("ym").agg(F.max("pc").alias("mmax"))
    wprev = (
        Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = month_max.withColumn("prev_max", F.max("mmax").over(wprev)).select(
        "ym", "prev_max"
    )
    return (
        local.join(F.broadcast(prior), "ym")
        .filter(
            "(loc_max IS NULL OR loc_max <= pc)"
            " AND (prev_max IS NULL OR prev_max <= pc)"
        )
        .selectExpr(
            "o_orderkey",
            "date_format(o_orderdate, 'yyyy-MM-dd') AS order_day",
            "CAST(pc AS DOUBLE) / 100 AS price",
        )
    )


SKYLINE_PARETO_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderdate,
         date_diff('day', DATE '1992-01-01', o_orderdate) AS d,
         {cents('o_totalprice', 100)} AS pc
  FROM orders),
sweep AS (
  SELECT o_orderkey, o_orderdate, pc,
         max(pc) OVER (ORDER BY d RANGE BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_max
  FROM base)
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       CAST(pc AS DOUBLE) / 100 AS price
FROM sweep WHERE prev_max IS NULL OR prev_max <= pc
"""


# ---------------------------------------------------------------------------
# ABC / Pareto classification
# ---------------------------------------------------------------------------


def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue, class
    A = the head covering the first 80% of cumulative revenue, B = the next
    15%, C = the tail — the classic 80/20 analysis over a fact-to-dimension
    rollup. Class boundaries are exact integer comparisons on cent sums
    (10*cum_prev < 8*total etc.), so boundary parts classify identically in
    both engines; ranking uses the total order (revenue DESC, partkey).

    Scale — TWO-LEVEL sweep (r06 verdict #6): the windowed cumsum runs over
    the per-PART aggregate (one partial-agg shuffle collapses the facts),
    but a single UNPARTITIONED window over a huge dimension would serialize
    on one task at 100x. So the cumsum is bucketed: parts are range-keyed
    by -floor(log2(rev_c)) — monotone non-increasing in revenue, so bucket
    order IS the (rev_c DESC, partkey) global order and equal revenues
    never straddle buckets — the per-bucket windows run in parallel, and
    exclusive bucket prefix offsets (a <=64-row aggregate, one per power of
    two) are broadcast back. cum_prev = offset + within-bucket cumsum,
    bit-identical to the one-window form (the oracle keeps the textbook
    single window)."""
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.expr(f"sum({cents('l_extendedprice', 100)})").alias("rev_c")
    )
    # log2 range bucket: rev_c >= 1 cent always (prices are positive), and
    # higher revenue => smaller rb, so (rb ASC, rev_c DESC, l_partkey ASC)
    # is exactly the global (rev_c DESC, l_partkey ASC) order
    bucketed = per_part.withColumn("rb", -F.floor(F.log2("rev_c")))
    wb = (
        Window.partitionBy("rb")
        .orderBy(F.desc("rev_c"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wo = Window.orderBy("rb").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # per-bucket totals: <=64 rows (one per rev_c power of two) — the
    # offsets window runs over THAT, never the dimension
    offsets = (
        bucketed.groupBy("rb")
        .agg(F.sum("rev_c").alias("bucket_rev"))
        .select(
            "rb",
            F.coalesce(F.sum("bucket_rev").over(wo), F.lit(0)).alias("off_rev"),
            F.sum("bucket_rev").over(wt).alias("total"),
        )
    )
    classed = (
        bucketed.withColumn(
            "in_prev", F.coalesce(F.sum("rev_c").over(wb), F.lit(0))
        )
        .join(F.broadcast(offsets), "rb")
        .selectExpr(
            "rev_c",
            "CASE WHEN 10 * (off_rev + in_prev) < 8 * total THEN 'A' "
            "WHEN 20 * (off_rev + in_prev) < 19 * total THEN 'B' "
            "ELSE 'C' END AS abc_class",
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(F.count("*").alias("n_parts"), F.sum("rev_c").alias("class_rev"))
        .selectExpr(
            "abc_class",
            "n_parts",
            "CAST(class_rev AS DOUBLE) / 100 AS revenue",
        )
    )


AGG_ABC_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, sum({cents('l_extendedprice', 100)}) AS rev_c
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT rev_c,
         coalesce(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev,
         sum(rev_c) OVER () AS total
  FROM per_part),
classed AS (
  SELECT rev_c,
         CASE WHEN 10 * cum_prev < 8 * total THEN 'A'
              WHEN 20 * cum_prev < 19 * total THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(CAST(sum(rev_c) AS BIGINT) AS DOUBLE) / 100 AS revenue
FROM classed GROUP BY abc_class
"""


# ---------------------------------------------------------------------------
# Seasonality profile
# ---------------------------------------------------------------------------


def events_hourweek_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap with each cell's share of
    total traffic — the seasonality profile behind capacity planning and
    anomaly baselining. Day-of-week is PURE ARITHMETIC on the epoch-day
    ordinal ((days_since_epoch + 4) % 7, 0 = Sunday) — engine dow()
    conventions (0- vs 1-based, Sunday- vs Monday-first) never enter; the
    share is exact-integer until one division.

    Scale: one partial-agg groupBy onto a <= 168-key space; the share
    window runs over that 168-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    cell = e.selectExpr(
        "(datediff(CAST(ts AS DATE), DATE '1970-01-01') + 4) % 7 AS dow",
        "hour(ts) AS hod",
    ).groupBy("dow", "hod").agg(F.count("*").alias("n_events"))
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        cell.withColumn("total", F.sum("n_events").over(wt))
        .selectExpr(
            "CAST(dow AS BIGINT) AS dow",
            "CAST(hod AS BIGINT) AS hod",
            "n_events",
            mround("CAST(n_events AS DOUBLE) / total", 6) + " AS traffic_share",
        )
    )


EVENTS_HOURWEEK_SQL = f"""
WITH cell AS (
  SELECT (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
         hour(ts) AS hod, count(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
       CAST(n_events AS BIGINT) AS n_events,
       {mround('CAST(n_events AS DOUBLE) / sum(n_events) OVER ()', 6)}
         AS traffic_share
FROM cell
"""


# ---------------------------------------------------------------------------
# As-of snapshot over the event changelog
# ---------------------------------------------------------------------------

_SNAPSHOT_TS = "2024-01-15 00:00:00"


def events_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel snapshot: each user's latest event state AS OF a fixed
    instant — the changelog-to-state query behind point-in-time feature
    reconstruction (train-time features must use the state as of the label's
    timestamp, or they leak the future). Latest-per-key under the total
    order (us, event_id) via one ROW_NUMBER window; the cutoff filter is
    pushed into the scan.

    Scale: the predicate prunes everything after T at the parquet row-group
    level (min/max stats on ts), then one user_id shuffle; WindowGroupLimit
    keeps one row per user before the full sort materializes."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    return (
        e.filter(f"ts <= TIMESTAMP '{_SNAPSHOT_TS}'")
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "value",
            "unix_micros(ts) AS us",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .selectExpr(
            "user_id",
            "event_type AS last_type",
            f"{cents('value')} AS last_value_micros",
            "us AS last_us",
        )
    )


EVENTS_SNAPSHOT_ASOF_SQL = f"""
WITH pre AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
  FROM events WHERE ts <= TIMESTAMP '{_SNAPSHOT_TS}'),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY us DESC, event_id DESC) AS rn
  FROM pre)
SELECT user_id, event_type AS last_type,
       {cents('value')} AS last_value_micros, us AS last_us
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Equi-depth histogram
# ---------------------------------------------------------------------------


# A candidate bucket is fetched whole only when its row count is at most
# this; bigger buckets recurse the grid narrowing inside the bucket instead
# (one extra round per factor-of-`buckets` of data — depth 2 already covers
# ~4e11 rows, depth 3 ~3e15).
_QCUT_FETCH_LIMIT = 65536
_QCUT_MAX_DEPTH = 4


def _exact_quantile_disc_cuts(
    df: DataFrame, col: str, fracs, buckets: int = 8192, _ranks=None, _depth: int = 0
):
    """EXACT distributed percentile_disc (rank = ceil(q*n), 1-based inverse
    CDF — the definition quantile_disc implements) WITHOUT ever buffering
    the column in one task: (1) one linear pass for count/min/max, (2) one
    linear pass of fixed-grid bucket counts (<= `buckets` rows collected)
    that narrows every target rank to its bucket, (3) for each needed
    bucket, either one PRUNED fetch duplicate-collapsed to (value, count)
    pairs (bucket rows <= _QCUT_FETCH_LIMIT) or a RECURSIVE narrowing
    inside that bucket — so driver memory stays O(buckets +
    _QCUT_FETCH_LIMIT) at ANY scale (r08: the former "recurse at petabyte
    scale" note is now implemented, which is what lets the default grid be
    8192 instead of 65536 — the narrowing collect is 8x cheaper and big
    buckets recurse instead of over-fetching). `fracs` are EXACT
    (num, den) pairs and the rank is the exact integer ceil(num*n/den) —
    SQL `0.1` literals are DECIMAL, so both engines compute the rank in
    exact arithmetic, and a float 0.1 here would be off-by-one at n
    divisible by 10."""
    # percentile_disc ignores NULLs; drop them up front so the bucket
    # expression can't route NULL rows into bucket 0 (greatest(0, NULL)
    # ignores the NULL) and shift every rank walk
    df = df.filter(F.col(col).isNotNull())
    row = df.agg(
        F.count(col).alias("n"), F.min(col).alias("lo"), F.max(col).alias("hi")
    ).collect()[0]
    n = row["n"]
    n_out = len(fracs) if _ranks is None else len(_ranks)
    if n == 0:
        return [None] * n_out
    lo, hi = float(row["lo"]), float(row["hi"])
    if hi == lo:
        return [lo] * n_out
    ranks = (
        [max(1, -((-num * n) // den)) for num, den in fracs]
        if _ranks is None
        else list(_ranks)
    )
    bexpr = (
        f"least({buckets - 1}, greatest(0, CAST(floor((CAST({col} AS DOUBLE)"
        f" - {lo!r}) / ({hi!r} - {lo!r}) * {buckets}) AS INT)))"
    )
    counts = {
        r["b"]: r["c"]
        for r in df.selectExpr(f"{bexpr} AS b")
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    cum, cum_before = 0, {}
    for b in sorted(counts):
        cum_before[b] = cum
        cum += counts[b]
    rank_bucket = {}
    for r in ranks:
        for b in sorted(counts):
            if cum_before[b] + counts[b] >= r:
                rank_bucket[r] = b
                break
    needed = sorted(set(rank_bucket.values()))
    fetchable = [
        b
        for b in needed
        if counts[b] <= _QCUT_FETCH_LIMIT or _depth >= _QCUT_MAX_DEPTH
    ]
    by_rank: dict[int, float] = {}
    if fetchable:
        pairs = (
            df.selectExpr(f"{bexpr} AS b", f"{col} AS v")
            .filter(F.col("b").isin(fetchable))
            .groupBy("b", "v")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        by_bucket: dict[int, list] = {}
        for r in pairs:
            by_bucket.setdefault(r["b"], []).append((r["v"], r["c"]))
        for r in ranks:
            b = rank_bucket[r]
            if b not in by_bucket:
                continue
            local = r - cum_before[b]
            acc = 0
            for v, c in sorted(by_bucket[b]):
                acc += c
                if acc >= local:
                    by_rank[r] = v
                    break
    for b in needed:
        if b in fetchable:
            continue
        # oversized bucket: narrow again inside it — same grid walk on the
        # bucket's rows only, entered by LOCAL rank (not fraction)
        sub_ranks = sorted({r - cum_before[b] for r in ranks if rank_bucket[r] == b})
        sub_cuts = _exact_quantile_disc_cuts(
            df.filter(f"({bexpr}) = {b}"),
            col,
            None,
            buckets,
            _ranks=sub_ranks,
            _depth=_depth + 1,
        )
        sub_map = dict(zip(sub_ranks, sub_cuts))
        for r in ranks:
            if rank_bucket[r] == b:
                by_rank[r] = sub_map[r - cum_before[b]]
    return [by_rank[r] for r in ranks]


def _dlit(v) -> str:
    """Exact DOUBLE literal for a driver-side float (repr round-trips;
    NULL-safe for the empty-input degenerate case)."""
    return "CAST(NULL AS DOUBLE)" if v is None else f"CAST({v!r} AS DOUBLE)"


def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of order prices — the
    constant-rows-per-bin companion of `agg_histogram`'s fixed-width bins,
    and exactly what an optimizer's column statistics store. The 9 interior
    cuts are percentile_disc values (ACTUAL data values — cross-engine
    exact); bin membership is `count of cuts STRICTLY below the value`, so
    duplicate-heavy columns legitimately yield skewed/empty bins (the
    documented tie semantic, identical in both engines).

    Scale: the cuts come from :func:`_exact_quantile_disc_cuts` — two
    linear passes plus one pruned duplicate-collapsed fetch, never a
    single-task buffer of the column (round 5 shipped a
    sort_array(collect_list(...)) that funnels every value into ONE
    aggregation buffer — an executor OOM at 100x; this distributed
    narrowing is the fix, same exact ceil(q*n) semantics). Then one
    broadcast of the 9-cut row and one partial-agg groupBy for the per-bin
    stats. No ntile, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    vals = _exact_quantile_disc_cuts(
        o, "o_totalprice", [(k, 10) for k in range(1, 10)]
    )
    # the 9 cuts are driver-side model state (the kmeans-centroid
    # precedent) — bake them into the plan as double literals (repr
    # round-trips exactly) instead of a crossJoin(broadcast(1-row df)):
    # one fewer exchange and no createDataFrame round-trip
    bin_expr = "1 + " + " + ".join(
        f"(CASE WHEN o_totalprice > {_dlit(v)} THEN 1 ELSE 0 END)" for v in vals
    )
    return (
        o.selectExpr(f"{bin_expr} AS bin", "o_totalprice")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
        .selectExpr("CAST(bin AS BIGINT) AS bin", "n_rows", "bin_min", "bin_max")
    )


AGG_EQUIDEPTH_SQL = (
    "WITH cuts AS (SELECT "
    + ", ".join(
        f"quantile_disc(o_totalprice, 0.{k}) AS c{k}" for k in range(1, 10)
    )
    + """ FROM orders),
binned AS (
  SELECT 1 + """
    + " + ".join(
        f"(CASE WHEN o_totalprice > c{k} THEN 1 ELSE 0 END)" for k in range(1, 10)
    )
    + """ AS bin, o_totalprice
  FROM orders CROSS JOIN cuts)
SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_rows,
       min(o_totalprice) AS bin_min, max(o_totalprice) AS bin_max
FROM binned GROUP BY bin
"""
)


# ---------------------------------------------------------------------------
# Interval-concurrency sweep
# ---------------------------------------------------------------------------


def lineitem_open_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting: how many lineitems are in transit
    (shipped, not yet received: shipdate <= d < receiptdate) on every day —
    the inventory/backlog-over-time query. The naive form is a per-day
    correlated COUNT over all intervals (O(days x n)); the sweep-line form
    emits +1 at each start and -1 at each end, collapses them to per-day
    deltas, and one running sum over the CALENDAR yields every day's
    concurrency — a single linear pass.

    Scale: the delta union partial-aggregates to <= 2 rows per distinct
    day before any shuffle (calendar-bounded key space, ~2.5k days for
    TPC-H); the running-sum window runs over that tiny delta table. Facts
    are scanned once, two pruned date columns only.

    The fixture lineitem carries no l_receiptdate, so transit time is the
    deterministic derived column 1 + (orderkey + linenumber) % 30 days —
    the `operators/tpch_extra.py` derived-partsupp precedent: both engines
    compute the identical interval end from the same columns."""
    l = load_table(spark, sf_dir, "lineitem")
    receipt = (
        "date_add(CAST(l_shipdate AS DATE), "
        "CAST(1 + (l_orderkey + l_linenumber) % 30 AS INT))"
    )
    deltas = (
        l.selectExpr("CAST(l_shipdate AS DATE) AS day", "1 AS delta")
        .unionAll(l.selectExpr(f"{receipt} AS day", "-1 AS delta"))
        .groupBy("day")
        .agg(
            F.sum("delta").alias("net"),
            F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("opened"),
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).alias("closed"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deltas.withColumn("open_end", F.sum("net").over(w))
        .selectExpr(
            "date_format(day, 'yyyy-MM-dd') AS day",
            "opened",
            "closed",
            "open_end",
        )
    )


LINEITEM_OPEN_DAILY_SQL = """
WITH deltas AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net,
         CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS opened,
         CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS closed
  FROM (SELECT CAST(l_shipdate AS DATE) AS day, 1 AS delta FROM lineitem
        UNION ALL
        SELECT CAST(l_shipdate AS DATE)
               + CAST(1 + (l_orderkey + l_linenumber) % 30 AS INT)
               AS day, -1 AS delta
        FROM lineitem) t
  GROUP BY day)
SELECT strftime(day, '%Y-%m-%d') AS day, opened, closed,
       CAST(sum(net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_end
FROM deltas
"""


# ---------------------------------------------------------------------------
# Two-feature exact OLS
# ---------------------------------------------------------------------------


def _ols2_exprs() -> dict[str, str]:
    """Shared dialect text for 2-feature OLS (y = extendedprice cents on
    x1 = quantity, x2 = discount points) via normal equations on EXACT
    integer sufficient statistics; the 2x2 solve is explicit-determinant
    scalar algebra in ONE fixed-order double chain, identical per engine.
    Int64 holds the centered moments to ~1e5 rows/group x this money grid;
    beyond that swap the inner casts to DECIMAL(38,0) (`parity.msum2`
    note)."""
    x1 = "CAST(l_quantity AS BIGINT)"
    x2 = f"{cents('l_discount', 100)}"  # discount points: 0.04 -> 4
    yc = cents("l_extendedprice", 100)
    n = "CAST(count(*) AS BIGINT)"
    s = {k: f"CAST(sum({v}) AS BIGINT)" for k, v in {
        "x1": x1, "x2": x2, "y": yc,
        "x11": f"{x1} * {x1}", "x12": f"{x1} * {x2}", "x22": f"{x2} * {x2}",
        "x1y": f"{x1} * {yc}", "x2y": f"{x2} * {yc}",
    }.items()}
    # centered second moments (still exact integers)
    m11 = f"CAST({n} * {s['x11']} - {s['x1']} * {s['x1']} AS DOUBLE)"
    m12 = f"CAST({n} * {s['x12']} - {s['x1']} * {s['x2']} AS DOUBLE)"
    m22 = f"CAST({n} * {s['x22']} - {s['x2']} * {s['x2']} AS DOUBLE)"
    m1y = f"CAST({n} * {s['x1y']} - {s['x1']} * {s['y']} AS DOUBLE)"
    m2y = f"CAST({n} * {s['x2y']} - {s['x2']} * {s['y']} AS DOUBLE)"
    det = f"nullif(({m11}) * ({m22}) - ({m12}) * ({m12}), 0)"
    b1 = f"((({m22}) * ({m1y}) - ({m12}) * ({m2y})) / {det})"
    b2 = f"((({m11}) * ({m2y}) - ({m12}) * ({m1y})) / {det})"
    return {
        "n_rows": "count(*)",
        # cents -> money units at the surface
        "beta_qty": mround(f"{b1} / 100", 6),
        "beta_disc_pt": mround(f"{b2} / 100", 6),
        "intercept": mround(
            f"(CAST({s['y']} AS DOUBLE) - {b1} * {s['x1']} - {b2} * {s['x2']})"
            f" / {n} / 100",
            4,
        ),
    }


def agg_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple regression in one aggregation pass: OLS of price on
    (quantity, discount) per return flag — the 2-feature extension of
    `agg_covar_regr`, proving the normal-equations pattern generalizes:
    p features need p(p+3)/2 integer sums, ONE partial-agg groupBy, and a
    closed-form solve; no iterative solver, no collect.

    Scale: 9 int64 sums of state per group fold map-side; the matrix solve
    is per-group scalar algebra on the one-row-per-group aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    ex = _ols2_exprs()
    return l.groupBy("l_returnflag").agg(
        *[F.expr(sql).alias(name) for name, sql in ex.items()]
    )


AGG_OLS2_SQL = (
    "SELECT l_returnflag, "
    + ", ".join(f"{sql} AS {name}" for name, sql in _ols2_exprs().items())
    + " FROM lineitem GROUP BY l_returnflag"
)


# ---------------------------------------------------------------------------
# Rolling median
# ---------------------------------------------------------------------------

_RMED_FRAME = 19  # trailing 20-row frame


def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-20 rolling MEDIAN of event value per user — the robust
    rolling baseline that pairs with `window_zscore_rolling` (mean/std) and
    `events_anomaly_mad` (global MAD): a single outlier shifts a rolling
    mean by x/20 but leaves the rolling median untouched. Spark's median()
    rejects window frames, so the Spark side sorts the <=20-element
    collect_list frame and selects/averages the middle — numerically
    identical to DuckDB's windowed median() (selection + one IEEE midpoint
    is order-independent, unlike variance); mround guards the even-frame
    (a+b)/2 midpoint.

    Scale: one user_id shuffle; the frame buffer is 20 rows (O(k log k)
    per row worst case) — at petabyte scale swap in the two-heap streaming
    median inside `applyInPandasWithState` (streaming module pattern)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-_RMED_FRAME, 0)
    )
    base = e.selectExpr(
        "user_id", "event_id", "unix_micros(ts) AS us", "value"
    )
    med = (
        "CASE WHEN size(vs) % 2 = 1 THEN vs[CAST(size(vs) div 2 AS INT)] "
        "ELSE (vs[CAST(size(vs) div 2 - 1 AS INT)]"
        " + vs[CAST(size(vs) div 2 AS INT)]) / 2 END"
    )
    return (
        base.withColumn("vs", F.array_sort(F.collect_list("value").over(w)))
        .selectExpr(
            "user_id",
            "event_id",
            mround(med, 6) + " AS roll_med",
        )
    )


WINDOW_ROLLING_MEDIAN_SQL = f"""
SELECT user_id, event_id,
       floor(median(value) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN {_RMED_FRAME} PRECEDING AND CURRENT ROW)
             * 1000000 + 0.5) / 1000000 AS roll_med
FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events) t
"""


_PK_TABLES: list[tuple[str, str]] = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


def diag_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across every keyed table: row count,
    distinct keys, null keys, and the duplicate surplus — the companion of
    `diag_referential_orphans` (orphans break inner joins by DROPPING rows;
    duplicate keys break them by FANNING OUT — `diag_join_explosion`'s
    root cause caught at ingest).

    Scale: one pruned single-column scan per table with a count-distinct
    aggregate (partial_agg + distinct-aggregate rewrite); one output row
    per table."""
    rows = []
    for table, pk in _PK_TABLES:
        t = load_table(spark, sf_dir, table).select(F.col(pk).alias("pk"))
        rows.append(
            t.agg(
                F.count("*").alias("n_rows"),
                F.countDistinct("pk").alias("n_distinct"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)).alias(
                    "n_null_keys"
                ),
            ).selectExpr(
                f"'{table}.{pk}' AS table_pk",
                "n_rows",
                "n_distinct",
                "n_null_keys",
                "n_rows - n_distinct - n_null_keys AS n_dup_surplus",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


DIAG_PK_UNIQUENESS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{table}.{pk}' AS table_pk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {pk}) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_keys,
       CAST(count(*) - count(DISTINCT {pk})
            - sum(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_surplus
FROM {table}"""
    for table, pk in _PK_TABLES
)


_SPIKE_LOOKBACK = 24  # trailing buckets in the baseline
_SPIKE_WARMUP = 6  # minimum baseline buckets before flagging


def events_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-spike detection per event type: each hour's count against the
    mean of the trailing 24 wall-clock hours — the ops-alerting query
    (error-rate surge, crawler burst). The baseline frame is a RANGE over
    the integer hour index, so calendar GAPS shrink the baseline instead of
    silently stretching it over stale buckets; warmup (< 6 baseline
    buckets) rows emit no ratio. The ratio n * cnt_prev / sum_prev is
    exact-integer until one guarded division.

    Scale: the hourly rollup collapses the stream in one partial-agg
    groupBy (type x hour key space); both windows run over that reduced
    table partitioned by type."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.selectExpr(
            "event_type",
            "CAST(unix_micros(date_trunc('hour', ts)) div 3600000000 AS BIGINT)"
            " AS hidx",
        )
        .groupBy("event_type", "hidx")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rangeBetween(-_SPIKE_LOOKBACK, -1)
    )
    return (
        hourly.withColumn("sum_prev", F.sum("n").over(w))
        .withColumn("cnt_prev", F.count("n").over(w))
        .filter(f"cnt_prev >= {_SPIKE_WARMUP}")
        .selectExpr(
            "event_type",
            "hidx",
            "n",
            mround("CAST(n * cnt_prev AS DOUBLE) / sum_prev", 6)
            + " AS spike_ratio",
            "CAST(3 * sum_prev <= n * cnt_prev AS BOOLEAN) AS is_spike",
        )
    )


EVENTS_RATE_SPIKE_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
           AS hidx,
         count(*) AS n
  FROM events GROUP BY 1, 2),
based AS (
  SELECT event_type, hidx, CAST(n AS BIGINT) AS n,
         CAST(sum(n) OVER w AS BIGINT) AS sum_prev,
         CAST(count(n) OVER w AS BIGINT) AS cnt_prev
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hidx
               RANGE BETWEEN {_SPIKE_LOOKBACK} PRECEDING AND 1 PRECEDING))
SELECT event_type, hidx, n,
       {mround('CAST(n * cnt_prev AS DOUBLE) / sum_prev', 6)} AS spike_ratio,
       CAST(3 * sum_prev <= n * cnt_prev AS BOOLEAN) AS is_spike
FROM based WHERE cnt_prev >= {_SPIKE_WARMUP}
"""




# ---------------------------------------------------------------------------
# Rolling-MAD outlier flag
# ---------------------------------------------------------------------------

_RMAD_FRAME = 21  # strictly-preceding baseline frame
_RMAD_WARMUP = 8  # minimum baseline rows before flagging


def window_rolling_mad_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling robust outlier flag per user: |value - median(baseline)| >
    3 * MAD(baseline) over the STRICTLY PRECEDING 21-row frame — the
    point-anomaly detector whose baseline a single outlier cannot poison
    (unlike rolling z-scores) and which never scores a point against itself
    (unlike `events_anomaly_mad`'s global stats). Rows with < 8 baseline
    events are warmup and not emitted.

    Spark's median()/mode-free MAD can't window, so both statistics come
    from ONE sorted collect_list of the <= 21-element frame (select middle,
    then re-sort the absolute deviations) — numerically identical to
    DuckDB's windowed median()/mad() (selection + single IEEE ops).

    Scale: one user_id shuffle, O(frame log frame) per row on a 21-element
    array; the two-heap state swap applies at stream scale as with
    `window_rolling_median`."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-_RMAD_FRAME, -1)
    )
    base = e.selectExpr(
        "user_id", "event_id", "unix_micros(ts) AS us", "value"
    )
    med = (
        "CASE WHEN size(vs) % 2 = 1 THEN vs[CAST(size(vs) div 2 AS INT)] "
        "ELSE (vs[CAST(size(vs) div 2 - 1 AS INT)]"
        " + vs[CAST(size(vs) div 2 AS INT)]) / 2 END"
    )
    return (
        base.withColumn("vs", F.array_sort(F.collect_list("value").over(w)))
        .filter(f"size(vs) >= {_RMAD_WARMUP}")
        .withColumn("med", F.expr(med))
        .withColumn(
            "ds", F.expr("array_sort(transform(vs, x -> abs(x - med)))")
        )
        .withColumn(
            "mad",
            F.expr(
                "CASE WHEN size(ds) % 2 = 1 THEN ds[CAST(size(ds) div 2 AS INT)] "
                "ELSE (ds[CAST(size(ds) div 2 - 1 AS INT)]"
                " + ds[CAST(size(ds) div 2 AS INT)]) / 2 END"
            ),
        )
        .selectExpr(
            "user_id",
            "event_id",
            mround("med", 6) + " AS baseline_med",
            mround("mad", 6) + " AS baseline_mad",
            "CAST(abs(value - med) > 3 * mad AS BOOLEAN) AS is_outlier",
        )
    )


WINDOW_ROLLING_MAD_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
framed AS (
  SELECT user_id, event_id, value,
         CAST(count(*) OVER w AS BIGINT) AS n_base,
         CAST(median(value) OVER w AS DOUBLE) AS med,
         CAST(mad(value) OVER w AS DOUBLE) AS mad
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN {_RMAD_FRAME} PRECEDING AND 1 PRECEDING))
SELECT user_id, event_id,
       {mround('med', 6)} AS baseline_med,
       {mround('mad', 6)} AS baseline_mad,
       CAST(abs(value - med) > 3 * mad AS BOOLEAN) AS is_outlier
FROM framed WHERE n_base >= {_RMAD_WARMUP}
"""


# ---------------------------------------------------------------------------
# Cohort repeat-purchase rate
# ---------------------------------------------------------------------------


def orders_cohort_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase behavior by acquisition cohort: customers grouped by
    their FIRST order's month; per cohort the customer count, the share who
    ever ordered again, and mean orders per customer — the
    retention-economics table next to `events_cohort_ltv` (which tracks
    revenue; this tracks the repeat decision). Exact-rational shares.

    Scale: one partial-agg groupBy per customer (count + min date fold
    map-side), then a second tiny aggregation over the calendar-bounded
    cohort key."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.expr("date_format(min(o_orderdate), 'yyyy-MM') AS cohort_month"),
    )
    return (
        per_cust.groupBy("cohort_month")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).alias("rep"),
            F.sum("n_orders").alias("total_orders"),
        )
        .selectExpr(
            "cohort_month",
            "n_customers",
            "total_orders",
            mround("CAST(rep AS DOUBLE) / n_customers", 6) + " AS repeat_rate",
            mround("CAST(total_orders AS DOUBLE) / n_customers", 6)
            + " AS orders_per_customer",
        )
    )


ORDERS_COHORT_REPEAT_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         strftime(min(CAST(o_orderdate AS DATE)), '%Y-%m') AS cohort_month
  FROM orders GROUP BY o_custkey)
SELECT cohort_month,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(n_orders) AS BIGINT) AS total_orders,
       {mround('CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)', 6)}
         AS repeat_rate,
       {mround('CAST(sum(n_orders) AS DOUBLE) / count(*)', 6)}
         AS orders_per_customer
FROM per_cust GROUP BY cohort_month
"""


def events_sessionized_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel WITHIN sessions: per user, how many 15-min-gap sessions
    contain an ordered view → click → purchase chain — the conversion
    definition product analytics actually uses (`events_funnel`'s global
    per-stage horizons credit cross-session journeys; this one requires
    the whole chain inside one visit). Chain semantics: first view in the
    session, first click AT/after it, first purchase at/after that click —
    each stage resolved by one min() aggregate, so the chain is exact and
    order-respecting without any sequence scan.

    Scale: sessionization is the gaps-and-islands window
    (`events_sessionize_islands`' split rule); the stage chain is THREE
    stacked whole-partition window aggregates over (user_id, sid) — each
    stage time is a per-session constant, so t_click reads t_view as a
    window value instead of joining a per-stage aggregate back onto the
    event stream (before r12 the sess subtree fed four consumers through
    three joins: 7 events scans in the declared plan, now 1). min() over
    a CASE with no ELSE skips NULLs, so a session with no view yields
    t_view NULL, which nulls the t_click condition — exactly the inner
    joins' drop semantics. ONE exchange on user_id carries the whole
    query: the (user_id, sid) windows and both groupBys are
    subset-satisfied by it. Per-user output rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 900_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = marked.withColumn("sid", F.sum("new_session").over(w)).selectExpr(
        "user_id", "sid", "event_type", "unix_micros(ts) AS us"
    )
    ws = Window.partitionBy("user_id", "sid")
    staged = (
        sess.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(ws),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") >= F.col("t_view")),
                    F.col("us"),
                )
            ).over(ws),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("t_click")),
                    F.col("us"),
                )
            ).over(ws),
        )
    )
    per_sess = staged.groupBy("user_id", "sid").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.count("t_view").alias("n_view_sessions"),
            F.count("t_click").alias("n_click_sessions"),
            F.count("t_purchase").alias("n_converted"),
        )
        .selectExpr(
            "user_id",
            "n_sessions",
            "n_view_sessions",
            "n_click_sessions",
            "n_converted",
            mround("CAST(n_converted AS DOUBLE) / n_sessions", 6)
            + " AS session_cvr",
        )
    )


EVENTS_SESSIONIZED_FUNNEL_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 900000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS sid
  FROM marked),
tv AS (
  SELECT user_id, sid, min(us) AS t_view
  FROM sess WHERE event_type = 'view' GROUP BY user_id, sid),
tc AS (
  SELECT s.user_id, s.sid, min(s.us) AS t_click
  FROM sess s JOIN tv ON s.user_id = tv.user_id AND s.sid = tv.sid
  WHERE s.event_type = 'click' AND s.us >= tv.t_view
  GROUP BY s.user_id, s.sid),
tp AS (
  SELECT s.user_id, s.sid, min(s.us) AS t_purchase
  FROM sess s JOIN tc ON s.user_id = tc.user_id AND s.sid = tc.sid
  WHERE s.event_type = 'purchase' AND s.us >= tc.t_click
  GROUP BY s.user_id, s.sid),
ns AS (SELECT user_id, count(DISTINCT sid) AS n_sessions FROM sess GROUP BY user_id)
SELECT ns.user_id, CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(coalesce(v.n, 0) AS BIGINT) AS n_view_sessions,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_click_sessions,
       CAST(coalesce(p.n, 0) AS BIGINT) AS n_converted,
       floor((CAST(coalesce(p.n, 0) AS DOUBLE) / n_sessions) * 1000000 + 0.5)
         / 1000000 AS session_cvr
FROM ns
LEFT JOIN (SELECT user_id, count(*) AS n FROM tv GROUP BY user_id) v
  ON v.user_id = ns.user_id
LEFT JOIN (SELECT user_id, count(*) AS n FROM tc GROUP BY user_id) c
  ON c.user_id = ns.user_id
LEFT JOIN (SELECT user_id, count(*) AS n FROM tp GROUP BY user_id) p
  ON p.user_id = ns.user_id
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift (exact, distributed prefix sums)
# ---------------------------------------------------------------------------

_KS_BUCKET_MICROS = 500_000  # prefix-sum bucket width on the value-micros axis


def _two_sample_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared two-sample rank machinery for `diag_ks_drift` and
    `agg_mann_whitney`: per distinct value-micros, the per-sample counts
    (c1 = click, c2 = purchase) and INCLUSIVE cumulative counts (ca, cb)
    over the global value order, plus the sample totals (n1, n2) — all
    exact integers. The global cumulative uses TWO-LEVEL prefix sums:
    per-bucket totals (bucket table bounded by the VALUE RANGE / width,
    independent of row count) feed exclusive offsets; in-bucket running
    sums are a window PARTITIONED by bucket — no single task ever sees
    the whole axis.

    The per-value table is lazily localCheckpointed: it is value-grid
    bounded (one row per distinct value-micros, never per event) and feeds
    the bucket totals, the offsets, the totals row, AND each consumer's
    own re-reads (KS reads its scored table twice for the argmax) — before
    r12 every one of those arms re-scanned events (6 scans in
    diag_ks_drift's declared plan, now 1), and the totals row was a SECOND
    full corpus aggregation; n1/n2 are now the same integer sums folded
    from the bucket table."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(
        "event_type IN ('click', 'purchase') AND value IS NOT NULL"
    ).selectExpr(
        f"{cents('value')} AS vq",
        "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a",
    )
    pv = (
        s.groupBy("vq")
        .agg(F.sum("is_a").alias("c1"), F.sum(F.expr("1 - is_a")).alias("c2"))
        .withColumn("bk", F.expr(f"vq div {_KS_BUCKET_MICROS}"))
        .localCheckpoint(eager=False)
    )
    bt = pv.groupBy("bk").agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
    wb = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    off = bt.select(
        "bk",
        F.coalesce(F.sum("t1").over(wb), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("t2").over(wb), F.lit(0)).alias("o2"),
    )
    wv = (
        Window.partitionBy("bk")
        .orderBy("vq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = bt.groupBy().agg(F.sum("t1").alias("n1"), F.sum("t2").alias("n2"))
    return (
        pv.join(F.broadcast(off), "bk")
        .select(
            "vq",
            "c1",
            "c2",
            (F.col("o1") + F.sum("c1").over(wv)).alias("ca"),
            (F.col("o2") + F.sum("c2").over(wv)).alias("cb"),
        )
        .crossJoin(F.broadcast(tot))
    )


def diag_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between the `click`
    and `purchase` value distributions — the standard continuous-drift test
    (chi-square `diag_distribution_drift` needs binning; KS compares the
    full CDFs). D = max over x of |F_a(x) - F_b(x)|, reported with the
    value where the gap peaks (earliest on ties) and the exact integer
    numerator max|C_a*N_b - C_b*N_a| so no float compare ever picks the
    argmax.

    Scale: per-value counts partial-aggregate (one shuffle on the money
    grid); the global running CDF uses TWO-LEVEL prefix sums — per-bucket
    totals (bucket table bounded by the VALUE RANGE / 0.5-unit width,
    independent of row count) feed exclusive offsets, and the in-bucket
    running sums are a window PARTITIONED by bucket, so no single task
    ever sees the whole axis. The only unpartitioned window runs over the
    tiny bucket table. Int64 holds C*N to ~3e9 rows per side; past that
    swap the products to DECIMAL — the argmax logic is unchanged."""
    scored = _two_sample_cum(spark, sf_dir).selectExpr(
        "vq", "n1", "n2", "abs(ca * n2 - cb * n1) AS d_num"
    )
    mx = scored.groupBy("n1", "n2").agg(F.max("d_num").alias("ks_num"))
    return (
        scored.join(F.broadcast(mx), ["n1", "n2"])
        .filter("d_num = ks_num")
        .groupBy("n1", "n2", "ks_num")
        .agg(F.min("vq").alias("vq_at"))
        .selectExpr(
            "n1 AS n_click",
            "n2 AS n_purchase",
            "ks_num",
            "CAST(vq_at AS DOUBLE) / 1000000 AS ks_at_value",
            mround("CAST(ks_num AS DOUBLE) / (n1 * n2)", 6) + " AS ks_stat",
        )
    )


DIAG_KS_DRIFT_SQL = f"""
WITH s AS (
  SELECT {cents('value')} AS vq,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
tot AS (SELECT sum(is_a) AS n1, sum(1 - is_a) AS n2 FROM s),
pv AS (SELECT vq, sum(is_a) AS c1, sum(1 - is_a) AS c2 FROM s GROUP BY vq),
cum AS (
  SELECT vq, sum(c1) OVER (ORDER BY vq) AS ca, sum(c2) OVER (ORDER BY vq) AS cb
  FROM pv),
scored AS (
  SELECT vq, n1, n2, abs(ca * n2 - cb * n1) AS d_num FROM cum CROSS JOIN tot),
mx AS (SELECT n1, n2, max(d_num) AS ks_num FROM scored GROUP BY n1, n2)
SELECT CAST(mx.n1 AS BIGINT) AS n_click, CAST(mx.n2 AS BIGINT) AS n_purchase,
       CAST(mx.ks_num AS BIGINT) AS ks_num,
       CAST(min(scored.vq) AS DOUBLE) / 1000000 AS ks_at_value,
       {mround('CAST(mx.ks_num AS DOUBLE) / (mx.n1 * mx.n2)', 6)} AS ks_stat
FROM scored
JOIN mx ON scored.n1 = mx.n1 AND scored.n2 = mx.n2 AND scored.d_num = mx.ks_num
GROUP BY mx.n1, mx.n2, mx.ks_num
"""


def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Mann-Whitney U between the `click` and `purchase` value
    samples — the rank-based location test that completes the drift family
    (chi-square: categorical; KS: CDF shape; PSI: binned shares; MW:
    stochastic dominance), and, via U/(n1*n2), the exact AUC of
    "does a random click value exceed a random purchase value". Ties get
    average ranks; everything stays INTEGER by carrying 2x the rank sum
    (avg tied rank = C_before + (cnt+1)/2, so 2*R1 = sum over values of
    c1 * (2*C_before + cnt + 1) — exact, reduction-order-free).

    Scale: rides :func:`_two_sample_cum`'s two-level prefix sums — one
    value-grid aggregate, bucket-partitioned windows, a broadcast totals
    row. Int64 holds 2R1 to ~2e9 rows per side; DECIMAL swap beyond."""
    cum = _two_sample_cum(spark, sf_dir)
    return (
        cum.selectExpr(
            "n1",
            "n2",
            # C_before over the COMBINED sample = inclusive cum minus own counts
            "c1 * (2 * ((ca + cb) - (c1 + c2)) + (c1 + c2) + 1) AS r1_x2_part",
        )
        .groupBy("n1", "n2")
        .agg(F.sum("r1_x2_part").alias("r1_x2"))
        .selectExpr(
            "n1 AS n_click",
            "n2 AS n_purchase",
            "r1_x2",
            "r1_x2 - n1 * (n1 + 1) AS u1_x2",
            mround("CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2 / (n1 * n2)", 6)
            + " AS auc_click_gt",
        )
    )


AGG_MANN_WHITNEY_SQL = f"""
WITH s AS (
  SELECT {cents('value')} AS vq,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
tot AS (SELECT sum(is_a) AS n1, sum(1 - is_a) AS n2 FROM s),
pv AS (SELECT vq, sum(is_a) AS c1, sum(1 - is_a) AS c2 FROM s GROUP BY vq),
cum AS (
  SELECT vq, c1, c2,
         sum(c1) OVER (ORDER BY vq) AS ca, sum(c2) OVER (ORDER BY vq) AS cb
  FROM pv),
r AS (
  SELECT n1, n2,
         sum(c1 * (2 * ((ca + cb) - (c1 + c2)) + (c1 + c2) + 1)) AS r1_x2
  FROM cum CROSS JOIN tot GROUP BY n1, n2)
SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
       CAST(r1_x2 AS BIGINT) AS r1_x2,
       CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       {mround('CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2 / (n1 * n2)', 6)}
         AS auc_click_gt
FROM r
"""


def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the Social-Capital "accounting for growth"
    framework): every active user-week is classified NEW (first-ever week),
    RETAINED (also active the previous week), or RESURRECTED (active
    before, but not last week); per week the three counts plus CHURNED
    (active last week, silent this week) — the decomposition that tells you
    whether growth is acquisition or retention. Week = epoch-day div 7
    (pure integer arithmetic, no engine week() conventions).

    Scale: one (user, week) distinct aggregate, then lag()/min() windows
    PARTITIONED per user (bounded by the calendar, not events), and a
    week-keyed final rollup. Churn emits from the same per-user window as
    a +1 on week+1 and meets the active rollup in a FULL-outer join, so a
    week where everyone went silent at once still reports its churn — two
    linear passes, no self-join."""
    e = load_table(spark, sf_dir, "events")
    uw = (
        e.selectExpr("user_id", "CAST(unix_micros(ts) div 86400000000 AS BIGINT) AS d")
        .selectExpr("user_id", "d div 7 AS wk")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    lab = (
        uw.withColumn("first_wk", F.min("wk").over(Window.partitionBy("user_id")))
        .withColumn("prev_wk", F.lag("wk").over(w))
        .selectExpr(
            "user_id",
            "wk",
            "CASE WHEN wk = first_wk THEN 'new' "
            "WHEN prev_wk = wk - 1 THEN 'retained' "
            "ELSE 'resurrected' END AS status",
            "lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk",
        )
    )
    active = lab.groupBy("wk").agg(
        F.sum(F.expr("CASE WHEN status = 'new' THEN 1 ELSE 0 END")).alias("n_new"),
        F.sum(F.expr("CASE WHEN status = 'retained' THEN 1 ELSE 0 END")).alias(
            "n_retained"
        ),
        F.sum(F.expr("CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END")).alias(
            "n_resurrected"
        ),
    )
    max_wk = uw.agg(F.max("wk").alias("mw"))
    churn = (
        lab.crossJoin(F.broadcast(max_wk))
        .filter("(next_wk IS NULL OR next_wk > wk + 1) AND wk + 1 <= mw")
        .selectExpr("wk + 1 AS wk")
        .groupBy("wk")
        .agg(F.count("*").alias("n_churned"))
    )
    # FULL outer: a week with zero actives but nonzero churn (everyone went
    # silent at once) must still emit its row — a left join from `active`
    # would silently drop those churned users from the decomposition
    return (
        active.join(churn, "wk", "full")
        .selectExpr(
            "wk",
            "coalesce(n_new, CAST(0 AS BIGINT)) AS n_new",
            "coalesce(n_retained, CAST(0 AS BIGINT)) AS n_retained",
            "coalesce(n_resurrected, CAST(0 AS BIGINT)) AS n_resurrected",
            "coalesce(n_churned, CAST(0 AS BIGINT)) AS n_churned",
        )
    )


EVENTS_GROWTH_ACCOUNTING_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // 86400000000) // 7 AS wk
  FROM events),
lab AS (
  SELECT user_id, wk,
         CASE WHEN wk = min(wk) OVER (PARTITION BY user_id) THEN 'new'
              WHEN lag(wk) OVER w = wk - 1 THEN 'retained'
              ELSE 'resurrected' END AS status,
         lead(wk) OVER w AS next_wk
  FROM uw
  WINDOW w AS (PARTITION BY user_id ORDER BY wk)),
active AS (
  SELECT wk,
         sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS n_new,
         sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS n_retained,
         sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
           AS n_resurrected
  FROM lab GROUP BY wk),
mx AS (SELECT max(wk) AS mw FROM uw),
churn AS (
  SELECT wk + 1 AS wk, count(*) AS n_churned
  FROM lab CROSS JOIN mx
  WHERE (next_wk IS NULL OR next_wk > wk + 1) AND wk + 1 <= mw
  GROUP BY wk + 1)
SELECT CAST(coalesce(active.wk, churn.wk) AS BIGINT) AS wk,
       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
       CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
FROM active FULL OUTER JOIN churn ON active.wk = churn.wk
"""


# ---------------------------------------------------------------------------
# Binary-segmentation change point
# ---------------------------------------------------------------------------


def events_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation change point per user: the split position t
    maximizing |S_t*(n-t) - (S_n-S_t)*t| = t*(n-t)*|mean_left - mean_right|
    — the t(n-t)-weighted mean-shift objective, cross-multiplied to INTEGER
    micros so the argmax never compares floats and ties break to the
    earliest t on both engines. Algebraically this equals |n*S_t - t*S_n|,
    i.e. the CUSUM-peak position `window_cusum_detect` reports — the two
    operators share the estimator (a good cross-check, pinned in tests);
    what THIS one adds is the segmentation readout: the split row
    (t, timestamp), both segment means, and the exact integer score, the
    output a change-point consumer acts on rather than the drift statistic.

    Scale: one user_id shuffle; running + full-partition window sums, two
    tiny self-joins keyed on user_id to pull the winning row. Int64 holds
    S*n to ~1e5-row users at money-grid values; DECIMAL swap beyond.
    Single-event users have no interior split and drop out (documented)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    wfull = Window.partitionBy("user_id")
    pre = (
        e.filter(F.col("value").isNotNull())
        .selectExpr(
            "user_id", "event_id", "unix_micros(ts) AS us", f"{cents('value')} AS vq"
        )
        .withColumn("t", F.row_number().over(w))
        .withColumn("s_run", F.sum("vq").over(wrun))
        .withColumn("n", F.count("*").over(wfull))
        .withColumn("s_all", F.sum("vq").over(wfull))
        .filter("t < n")
        .withColumn("score", F.expr("abs(s_run * (n - t) - (s_all - s_run) * t)"))
    )
    mx = pre.groupBy("user_id").agg(F.max("score").alias("best"))
    best = (
        pre.join(F.broadcast(mx), "user_id")
        .filter("score = best")
        .groupBy("user_id", "best")
        .agg(F.min("t").alias("split_t"))
    )
    return (
        pre.join(
            F.broadcast(best.selectExpr("user_id", "best", "split_t AS t")),
            ["user_id", "t"],
        )
        .filter("score = best")
        .selectExpr(
            "user_id",
            "n AS n_events",
            "CAST(t AS BIGINT) AS split_t",
            "us AS split_us",
            "best AS score_num",
            mround("CAST(s_run AS DOUBLE) / t / 1000000", 6) + " AS mean_left",
            mround("CAST(s_all - s_run AS DOUBLE) / (n - t) / 1000000", 6)
            + " AS mean_right",
        )
    )


EVENTS_CHANGE_POINT_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, {cents('value')} AS vq
  FROM events WHERE value IS NOT NULL),
pre AS (
  SELECT user_id, us,
         row_number() OVER w AS t,
         sum(vq) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s_run,
         count(*) OVER (PARTITION BY user_id) AS n,
         sum(vq) OVER (PARTITION BY user_id) AS s_all
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
scored AS (
  SELECT *, abs(s_run * (n - t) - (s_all - s_run) * t) AS score
  FROM pre WHERE t < n),
mx AS (SELECT user_id, max(score) AS best FROM scored GROUP BY user_id),
best AS (
  SELECT scored.user_id, best, min(t) AS split_t
  FROM scored JOIN mx ON scored.user_id = mx.user_id AND scored.score = mx.best
  GROUP BY scored.user_id, best)
SELECT scored.user_id, CAST(n AS BIGINT) AS n_events,
       CAST(split_t AS BIGINT) AS split_t, us AS split_us,
       CAST(best AS BIGINT) AS score_num,
       {mround('CAST(s_run AS DOUBLE) / t / 1000000', 6)} AS mean_left,
       {mround('CAST(s_all - s_run AS DOUBLE) / (n - t) / 1000000', 6)}
         AS mean_right
FROM scored
JOIN best ON scored.user_id = best.user_id AND scored.t = best.split_t
WHERE scored.score = best.best
"""


def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite bot/automation score per user — the three behavioral
    signatures fused into one pass: machine-regular cadence (gap CV² low,
    cf. `events_gap_burstiness`), low action diversity (Simpson, cf.
    `events_type_diversity`), and abnormal rate (events per active day).
    Every FLAG comparison is cross-multiplied to exact integers (CV² < 1/2
    ⟺ 2(n·S2 − S²) < S², Simpson < 3/10 ⟺ 10(n² − Σc²) < 3n², rate > 20
    ⟺ n > 20·days), so no float threshold ever flips between engines; the
    displayed metrics are the usual one-division mrounds.

    Scale: gap moments ride the lag() window and its groupBy on ONE
    user_id shuffle; type counts are a (user, type) partial agg rolled up
    and broadcast back (per-user output is cluster-small). The flags are
    pure arithmetic on the joined feature row — the feature-store + rule
    pattern, no extra scan."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    base = e.selectExpr(
        "user_id", "event_id", "event_type", "unix_micros(ts) AS us"
    )
    gaps = base.withColumn("prev", F.lag("us").over(w)).selectExpr(
        "user_id",
        "us",
        "CASE WHEN prev IS NULL THEN NULL ELSE (us - prev) div 1000000 END AS g",
    )
    feat = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count("g").alias("n_g"),
        F.sum("g").alias("s1"),
        F.sum(F.expr("g * g")).alias("s2"),
        F.countDistinct(F.expr("us div 86400000000")).alias("n_days"),
    )
    tc = (
        base.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .groupBy("user_id")
        .agg(F.sum(F.expr("c * c")).alias("sum_c2"))
    )
    return (
        feat.join(F.broadcast(tc), "user_id")
        .selectExpr(
            "user_id",
            "n_events",
            "n_days",
            mround(
                "CASE WHEN n_g >= 2 AND s1 > 0 THEN "
                "CAST(n_g * s2 - s1 * s1 AS DOUBLE) / (s1 * s1) "
                "ELSE CAST(NULL AS DOUBLE) END",
                6,
            )
            + " AS gap_cv2",
            mround(
                "CAST(n_events * n_events - sum_c2 AS DOUBLE)"
                " / (n_events * n_events)",
                6,
            )
            + " AS simpson",
            mround("CAST(n_events AS DOUBLE) / n_days", 6) + " AS per_day",
            "CASE WHEN n_g >= 5 AND s1 > 0 AND 2 * (n_g * s2 - s1 * s1)"
            " < s1 * s1 THEN 1 ELSE 0 END AS flag_regular",
            "CASE WHEN 10 * (n_events * n_events - sum_c2)"
            " < 3 * n_events * n_events THEN 1 ELSE 0 END AS flag_monotone",
            "CASE WHEN n_events > 20 * n_days THEN 1 ELSE 0 END AS flag_rate",
        )
        .selectExpr(
            "*",
            "CAST(flag_regular + flag_monotone + flag_rate AS BIGINT)"
            " AS bot_score",
        )
    )


EVENTS_BOT_SCORE_SQL = """
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
gaps AS (
  SELECT user_id, us,
         (us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id))
           // 1000000 AS g
  FROM base),
feat AS (
  SELECT user_id, count(*) AS n_events, count(g) AS n_g,
         sum(g) AS s1, sum(g * g) AS s2,
         count(DISTINCT us // 86400000000) AS n_days
  FROM gaps GROUP BY user_id),
tc AS (
  SELECT user_id, sum(c * c) AS sum_c2 FROM (
    SELECT user_id, event_type, count(*) AS c
    FROM base GROUP BY user_id, event_type) t
  GROUP BY user_id)
SELECT feat.user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_days AS BIGINT) AS n_days,
       floor((CASE WHEN n_g >= 2 AND s1 > 0
              THEN CAST(n_g * s2 - s1 * s1 AS DOUBLE) / (s1 * s1)
              ELSE CAST(NULL AS DOUBLE) END) * 1000000 + 0.5) / 1000000
         AS gap_cv2,
       floor((CAST(n_events * n_events - sum_c2 AS DOUBLE)
              / (n_events * n_events)) * 1000000 + 0.5) / 1000000 AS simpson,
       floor((CAST(n_events AS DOUBLE) / n_days) * 1000000 + 0.5) / 1000000
         AS per_day,
       CASE WHEN n_g >= 5 AND s1 > 0 AND 2 * (n_g * s2 - s1 * s1) < s1 * s1
            THEN 1 ELSE 0 END AS flag_regular,
       CASE WHEN 10 * (n_events * n_events - sum_c2)
            < 3 * n_events * n_events THEN 1 ELSE 0 END AS flag_monotone,
       CASE WHEN n_events > 20 * n_days THEN 1 ELSE 0 END AS flag_rate,
       CAST((CASE WHEN n_g >= 5 AND s1 > 0 AND 2 * (n_g * s2 - s1 * s1)
                  < s1 * s1 THEN 1 ELSE 0 END)
            + (CASE WHEN 10 * (n_events * n_events - sum_c2)
                    < 3 * n_events * n_events THEN 1 ELSE 0 END)
            + (CASE WHEN n_events > 20 * n_days THEN 1 ELSE 0 END) AS BIGINT)
         AS bot_score
FROM feat JOIN tc ON feat.user_id = tc.user_id
"""


_NULL_PROFILE_COLS: dict[str, list[str]] = {
    "events": ["event_id", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    ],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "lineitem": ["l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate"],
}


def diag_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table completeness census: per (table, column), row count,
    NULL count, and null fraction over a fixed schema manifest — the
    third leg of the data-quality family (`diag_pk_uniqueness` audits
    keys, `diag_referential_orphans` audits edges, this audits VALUES).
    The first gate before imputation/COALESCE decisions: a column that
    silently went 40% NULL after an upstream change shows here before any
    aggregate silently absorbs it.

    Scale: one pruned-column scan per table, each a single conditional-sum
    aggregate (no shuffle beyond the 1-row agg); output rows = manifest
    size."""
    parts = []
    for tbl, cols in _NULL_PROFILE_COLS.items():
        t = load_table(spark, sf_dir, tbl)
        agg = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(F.expr(f"CASE WHEN {c} IS NULL THEN 1 ELSE 0 END")).alias(
                    f"null_{c}"
                )
                for c in cols
            ],
        )
        stack = ", ".join(f"'{c}', null_{c}" for c in cols)
        parts.append(
            agg.selectExpr(
                f"'{tbl}' AS table_name",
                "n_rows",
                f"stack({len(cols)}, {stack}) AS (column_name, n_null)",
            ).selectExpr(
                "table_name",
                "column_name",
                "n_rows",
                "n_null",
                mround("CAST(n_null AS DOUBLE) / n_rows", 6) + " AS null_frac",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _null_profile_sql() -> str:
    selects = []
    for tbl, cols in _NULL_PROFILE_COLS.items():
        for c in cols:
            selects.append(
                f"SELECT '{tbl}' AS table_name, '{c}' AS column_name, "
                f"CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS n_null, "
                + mround(
                    f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
                    " AS DOUBLE) / count(*)",
                    6,
                )
                + f" AS null_frac FROM {tbl}"
            )
    return "\nUNION ALL\n".join(selects)


DIAG_NULL_PROFILE_SQL = _null_profile_sql()


# ---------------------------------------------------------------------------
# Population Stability Index drift
# ---------------------------------------------------------------------------


def diag_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order prices between the reference
    period (< 1998) and the current one — THE industry drift gate for
    deployed-model inputs (PSI < 0.1 stable / > 0.25 shifted), completing
    the drift family: chi-square (`diag_distribution_drift`) for
    categorical, KS (`diag_ks_drift`) for continuous CDFs, PSI for binned
    share shift. Bins are the reference period's own deciles via
    :func:`_exact_quantile_disc_cuts` (the distributed exact
    percentile_disc — never a single-task sort), so the reference lands
    ~10% per bin by construction and the PSI terms read directly as
    share migration. Shares are floored at 1e-4 inside the log term (the
    standard empty-bin guard) and each term is (p-q)*ln(p/q) — one of the
    three documented engine-side-transcendental exceptions (see
    `tmapreduce_spark/parity.py`: 1-ulp ln divergence vs an mround(6)
    boundary, ~1e-10 per value).

    Scale: the cut computation is two linear passes + a pruned fetch; the
    binning pass is one broadcast of 9 cuts and one 10-group aggregate."""
    o = load_table(spark, sf_dir, "orders")
    vals = _exact_quantile_disc_cuts(
        o.filter("o_orderdate < DATE '1998-01-01'"),
        "o_totalprice",
        [(k, 10) for k in range(1, 10)],
    )
    # cuts as exact double literals (see agg_equidepth_histogram)
    bin_expr = "1 + " + " + ".join(
        f"(CASE WHEN o_totalprice > {_dlit(v)} THEN 1 ELSE 0 END)" for v in vals
    )
    binned = o.selectExpr(
        "CASE WHEN o_orderdate < DATE '1998-01-01' THEN 1 ELSE 0 END AS is_ref",
        f"{bin_expr} AS bin",
    )
    per = binned.groupBy("bin").agg(
        F.sum("is_ref").alias("n_ref"), F.sum(F.expr("1 - is_ref")).alias("n_cur")
    )
    tot = binned.agg(
        F.sum("is_ref").alias("nr"), F.sum(F.expr("1 - is_ref")).alias("nc")
    )
    p = "greatest(CAST(n_ref AS DOUBLE) / nr, 0.0001)"
    q = "greatest(CAST(n_cur AS DOUBLE) / nc, 0.0001)"
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(bin AS BIGINT) AS bin",
            "n_ref",
            "n_cur",
            mround("CAST(n_ref AS DOUBLE) / nr", 6) + " AS p_ref",
            mround("CAST(n_cur AS DOUBLE) / nc", 6) + " AS p_cur",
            mround(f"(({p}) - ({q})) * ln(({p}) / ({q}))", 6) + " AS psi_term",
        )
    )


def _psi_sql() -> str:
    p = "greatest(CAST(n_ref AS DOUBLE) / nr, 0.0001)"
    q = "greatest(CAST(n_cur AS DOUBLE) / nc, 0.0001)"
    return (
        "WITH ref AS (SELECT o_totalprice FROM orders "
        "WHERE o_orderdate < DATE '1998-01-01'),\n"
        "cuts AS (SELECT "
        + ", ".join(
            f"quantile_disc(o_totalprice, 0.{k}) AS c{k}" for k in range(1, 10)
        )
        + " FROM ref),\nbinned AS (\n  SELECT CASE WHEN o_orderdate < DATE"
        " '1998-01-01' THEN 1 ELSE 0 END AS is_ref, 1 + "
        + " + ".join(
            f"(CASE WHEN o_totalprice > c{k} THEN 1 ELSE 0 END)"
            for k in range(1, 10)
        )
        + """ AS bin
  FROM orders CROSS JOIN cuts),
per AS (
  SELECT bin, sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
  FROM binned GROUP BY bin),
tot AS (SELECT sum(is_ref) AS nr, sum(1 - is_ref) AS nc FROM binned)
SELECT CAST(bin AS BIGINT) AS bin, CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       """
        + mround("CAST(n_ref AS DOUBLE) / nr", 6)
        + " AS p_ref,\n       "
        + mround("CAST(n_cur AS DOUBLE) / nc", 6)
        + " AS p_cur,\n       "
        + mround(f"(({p}) - ({q})) * ln(({p}) / ({q}))", 6)
        + """ AS psi_term
FROM per CROSS JOIN tot
"""
    )


DIAG_PSI_DRIFT_SQL = _psi_sql()


def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the `click` and `view` value
    samples — the parametric companion of `agg_mann_whitney` (MW asks about
    stochastic dominance; Welch asks about mean difference without assuming
    equal variances), i.e. the standard A/B-test read-out. Reports both
    sample means/variances, the t statistic, and the Welch–Satterthwaite
    degrees of freedom.

    Determinism: the only aggregates are integer — n, sum(cents),
    sum(cents^2) — so reduction order is irrelevant; every downstream
    double (mean, variance, t, df) is ONE fixed arithmetic expression over
    those exact integers, and sqrt is correctly rounded in IEEE, so both
    engines produce bit-identical values before mround. Int64 holds
    sum(cents^2) to ~9e14 per group at this value range (~1e6 rows);
    beyond, swap the two moment sums to DECIMAL(38,0) — same expressions.

    Scale: one partial-aggregated groupBy over a 2-value key; the final
    algebra runs on a 2-row frame. No shuffle beyond the 2-group exchange."""
    e = load_table(spark, sf_dir, "events")
    m = (
        e.filter(F.expr("event_type IN ('click', 'view') AND value IS NOT NULL"))
        .selectExpr("event_type", f"{cents('value', 100)} AS vq")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("vq").alias("sx"),
            F.sum(F.expr("vq * vq")).alias("sx2"),
        )
    )
    a = m.filter("event_type = 'click'").selectExpr(
        "n AS n_a", "sx AS sx_a", "sx2 AS sx2_a"
    )
    b = m.filter("event_type = 'view'").selectExpr(
        "n AS n_b", "sx AS sx_b", "sx2 AS sx2_b"
    )
    # sample variance in money units: (n*Σx² − (Σx)²) / (n(n−1)) / 100²,
    # combined in DOUBLE from the exact integer sums (deterministic: one
    # fixed IEEE expression over identical operands on both engines)
    va = "((CAST(n_a AS DOUBLE) * sx2_a - CAST(sx_a AS DOUBLE) * sx_a) / (CAST(n_a AS DOUBLE) * (n_a - 1)) / 10000)"
    vb = "((CAST(n_b AS DOUBLE) * sx2_b - CAST(sx_b AS DOUBLE) * sx_b) / (CAST(n_b AS DOUBLE) * (n_b - 1)) / 10000)"
    se2 = f"({va} / n_a + {vb} / n_b)"
    return a.crossJoin(F.broadcast(b)).selectExpr(
        "n_a",
        "n_b",
        mround("CAST(sx_a AS DOUBLE) / 100 / n_a", 6) + " AS mean_a",
        mround("CAST(sx_b AS DOUBLE) / 100 / n_b", 6) + " AS mean_b",
        mround(va, 6) + " AS var_a",
        mround(vb, 6) + " AS var_b",
        mround(
            f"(CAST(sx_a AS DOUBLE) / 100 / n_a - CAST(sx_b AS DOUBLE) / 100 / n_b)"
            f" / sqrt({se2})",
            6,
        )
        + " AS t_stat",
        mround(
            f"{se2} * {se2} / ({va} * {va} / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))"
            f" + {vb} * {vb} / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1)))",
            6,
        )
        + " AS welch_df",
    )


def _welch_sql() -> str:
    va = "((CAST(n_a AS DOUBLE) * sx2_a - CAST(sx_a AS DOUBLE) * sx_a) / (CAST(n_a AS DOUBLE) * (n_a - 1)) / 10000)"
    vb = "((CAST(n_b AS DOUBLE) * sx2_b - CAST(sx_b AS DOUBLE) * sx_b) / (CAST(n_b AS DOUBLE) * (n_b - 1)) / 10000)"
    se2 = f"({va} / n_a + {vb} / n_b)"
    return f"""
WITH m AS (
  SELECT event_type, count(*) AS n, sum(vq) AS sx, sum(vq * vq) AS sx2
  FROM (SELECT event_type, {cents('value', 100)} AS vq FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL) t
  GROUP BY event_type),
a AS (SELECT CAST(n AS BIGINT) AS n_a, CAST(sx AS BIGINT) AS sx_a,
             CAST(sx2 AS BIGINT) AS sx2_a FROM m WHERE event_type = 'click'),
b AS (SELECT CAST(n AS BIGINT) AS n_b, CAST(sx AS BIGINT) AS sx_b,
             CAST(sx2 AS BIGINT) AS sx2_b FROM m WHERE event_type = 'view')
SELECT n_a, n_b,
       {mround('CAST(sx_a AS DOUBLE) / 100 / n_a', 6)} AS mean_a,
       {mround('CAST(sx_b AS DOUBLE) / 100 / n_b', 6)} AS mean_b,
       {mround(va, 6)} AS var_a,
       {mround(vb, 6)} AS var_b,
       {mround(f'(CAST(sx_a AS DOUBLE) / 100 / n_a - CAST(sx_b AS DOUBLE) / 100 / n_b) / sqrt({se2})', 6)} AS t_stat,
       {mround(f'{se2} * {se2} / ({va} * {va} / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1)) + {vb} * {vb} / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1)))', 6)} AS welch_df
FROM a CROSS JOIN b
"""


AGG_WELCH_TTEST_SQL = _welch_sql()


CUPED_SPLIT_TS = "2024-01-16 00:00:00"


def events_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment read-out (Deng et al., WSDM'13): assign
    users to arms by user_id parity, treat the first half of the event
    window as the PRE-experiment covariate period and the second half as
    the experiment, and report per-arm raw and variance-reduced adjusted
    spend means: adj = post − θ·(pre − mean(pre)), θ = cov(pre, post) /
    var(pre) pooled over all users. This is the standard trick that
    removes pre-existing user-level variance from an A/B metric.

    Determinism: per-user pre/post sums are exact integer cents; θ and the
    global pre-mean derive from integer aggregates (n, Σpre, Σpost,
    Σpre², Σpre·post) combined in one fixed double expression, and each
    arm's adjusted mean is computed ALGEBRAICALLY from its integer group
    sums — mean_adj = mean_post − θ·(mean_pre − mean_pre_global) — never
    by averaging per-user doubles, so no float reduction order exists
    anywhere. Int64 holds Σpre·post to ~9e18 (per-user month sums ≲1e5
    cents → products ≲1e10, ~1e8 users); DECIMAL(38,0) swap beyond.

    Scale: one groupBy(user_id) with partial aggregation, one 2-row arm
    aggregate, one broadcast of the 1-row pooled-moment table."""
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.filter(F.col("value").isNotNull())
        .selectExpr(
            "user_id",
            f"CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT_TS}' THEN {cents('value', 100)} ELSE 0 END AS pre_c",
            f"CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT_TS}' THEN {cents('value', 100)} ELSE 0 END AS post_c",
        )
        .groupBy("user_id")
        .agg(F.sum("pre_c").alias("pre"), F.sum("post_c").alias("post"))
        .selectExpr("user_id", "user_id % 2 AS arm", "pre", "post")
    )
    pooled = per_user.agg(
        F.count("*").alias("nu"),
        F.sum("pre").alias("sp"),
        F.sum("post").alias("so"),
        F.sum(F.expr("pre * pre")).alias("spp"),
        F.sum(F.expr("pre * post")).alias("spo"),
    )
    # θ = cov/var = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — cents scale cancels
    theta = (
        "((CAST(nu AS DOUBLE) * spo - CAST(sp AS DOUBLE) * so)"
        " / (CAST(nu AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp))"
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("pre").alias("g_pre"),
        F.sum("post").alias("g_post"),
    )
    return (
        arms.crossJoin(F.broadcast(pooled))
        .selectExpr(
            "arm",
            "n_users",
            mround("CAST(g_pre AS DOUBLE) / 100 / n_users", 6) + " AS mean_pre",
            mround("CAST(g_post AS DOUBLE) / 100 / n_users", 6) + " AS mean_post",
            mround(
                f"CAST(g_post AS DOUBLE) / 100 / n_users - {theta}"
                f" * (CAST(g_pre AS DOUBLE) / 100 / n_users"
                f" - CAST(sp AS DOUBLE) / 100 / nu)",
                6,
            )
            + " AS mean_post_adjusted",
            mround(theta, 6) + " AS theta",
        )
    )


def _cuped_sql() -> str:
    theta = (
        "((CAST(nu AS DOUBLE) * spo - CAST(sp AS DOUBLE) * so)"
        " / (CAST(nu AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp))"
    )
    return f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT_TS}' THEN {cents('value', 100)} ELSE 0 END) AS BIGINT) AS pre,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT_TS}' THEN {cents('value', 100)} ELSE 0 END) AS BIGINT) AS post
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id),
pooled AS (
  SELECT CAST(count(*) AS BIGINT) AS nu, CAST(sum(pre) AS BIGINT) AS sp,
         CAST(sum(post) AS BIGINT) AS so, CAST(sum(pre * pre) AS BIGINT) AS spp,
         CAST(sum(pre * post) AS BIGINT) AS spo
  FROM per_user),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(pre) AS BIGINT) AS g_pre, CAST(sum(post) AS BIGINT) AS g_post
  FROM per_user GROUP BY arm)
SELECT arm, n_users,
       {mround('CAST(g_pre AS DOUBLE) / 100 / n_users', 6)} AS mean_pre,
       {mround('CAST(g_post AS DOUBLE) / 100 / n_users', 6)} AS mean_post,
       {mround(f'CAST(g_post AS DOUBLE) / 100 / n_users - {theta} * (CAST(g_pre AS DOUBLE) / 100 / n_users - CAST(sp AS DOUBLE) / 100 / nu)', 6)} AS mean_post_adjusted,
       {mround(theta, 6)} AS theta
FROM arms CROSS JOIN pooled
"""


EVENTS_CUPED_SQL = _cuped_sql()


PASS_AT_KS = (1, 5, 10)


def _pass_at_k_expr(k: int) -> str:
    """1 − Π_{i<k} (n−c−i)/(n−i), the unbiased pass@k estimator (Chen et
    al., 2021, eq. 1), as ONE fixed-order IEEE product chain — identical
    text in both dialects, so identical binary doubles. Rows with fewer
    than k failures pass with certainty (some success is always drawn)."""
    p = "CAST(1 AS DOUBLE)"
    for i in range(k):
        p = f"({p} * (n - c - {i}) / (n - {i}))"
    return (
        f"CASE WHEN n - c < {k} THEN CAST(1000000000 AS BIGINT) "
        f"ELSE CAST(floor((1 - {p}) * 1000000000 + 0.5) AS BIGINT) END"
    )


def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k over the events fixture read as an eval harness: each user is
    a TASK, their events are the n SAMPLES drawn for it, and a `purchase`
    is a correct sample — compute the unbiased pass@k estimator
    1 − C(n−c, k)/C(n, k) per task and its mean over tasks for k ∈
    {1, 5, 10}, the number every code/reasoning eval reports (HumanEval's
    metric). Tasks with n < k are excluded for that k (the estimator is
    undefined), and reported via n_tasks.

    Determinism: per-task estimators are a fixed-order product chain over
    exact integers (identical binary doubles on both engines), pre-rounded
    to an integer 1e-9 grid BEFORE the cross-task mean so the reduction is
    an integer sum — no float summation order anywhere. The mean is one
    deterministic division, mround(6).

    Scale: one partial-aggregated groupBy(user_id) to (n, c), then three
    1-row aggregates over the reduced task table (union-shared scan). The
    task table is users-sized; nothing downstream touches raw events."""
    e = load_table(spark, sf_dir, "events")
    per_task = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")).alias("c"),
    )
    outs = []
    for k in PASS_AT_KS:
        outs.append(
            per_task.filter(f"n >= {k}")
            .selectExpr(f"{_pass_at_k_expr(k)} AS p9")
            .agg(
                F.count("*").alias("n_tasks"),
                F.sum("p9").alias("s9"),
            )
            .selectExpr(
                f"CAST({k} AS BIGINT) AS k",
                "n_tasks",
                mround("CAST(s9 AS DOUBLE) / 1000000000 / n_tasks", 6)
                + " AS mean_pass_at_k",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _pass_at_k_sql() -> str:
    selects = "\nUNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_tasks,
       {mround(f'CAST(sum(p9_{k}) AS DOUBLE) / 1000000000 / count(*)', 6)} AS mean_pass_at_k
FROM (SELECT {_pass_at_k_expr(k)} AS p9_{k} FROM per_task WHERE n >= {k}) t{k}"""
        for k in PASS_AT_KS
    )
    return f"""
WITH per_task AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM events GROUP BY user_id)
{selects}
"""


EVAL_PASS_AT_K_SQL = _pass_at_k_sql()


SEASONAL_HALF = 12  # centered trend window: ±12 hours


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of each event type's hourly mean
    value: observed = per-hour mean, trend = centered ±SEASONAL_HALF-hour
    rolling mean, seasonal = hour-of-day mean of the detrended series,
    residual = observed − trend − seasonal — the additive decomposition
    behind every traffic/revenue anomaly dashboard (classical
    moving-average STL, Cleveland et al.'s first stage).

    Determinism, term by term: the hourly reduction is integer (cents,
    counts); the TREND is a ratio of two integer RANGE-window sums (both
    order-independent), NOT a float average of hourly means — this is what
    makes a windowed mean safe cross-engine (DuckDB computes windowed
    float sums via segment trees, Spark sliding — different orders);
    observed is one fixed division; residuals pre-round to a 1e-6 integer
    grid before the hour-of-day seasonal mean so that groupBy is an
    integer sum; the final residual is per-row arithmetic. RANGE frames on
    the integer hour index make calendar gaps shrink the window instead of
    stretching it (the `events_rate_spike` precedent).

    Scale: one partial-aggregated groupBy to the (type, hour) grid (~720
    rows/type/month — KB at any corpus size), then windows and one
    24-key aggregate over that grid. Raw events are touched once."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("value").isNotNull())
        .selectExpr(
            "event_type",
            "unix_micros(ts) div 3600000000 AS hr",
            f"{cents('value', 100)} AS vc",
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("cnt"), F.sum("vc").alias("sc"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rangeBetween(-SEASONAL_HALF, SEASONAL_HALF)
    )
    base = (
        hourly.withColumn("wc", F.sum("cnt").over(w))
        .withColumn("ws", F.sum("sc").over(w))
        .selectExpr(
            "event_type",
            "hr",
            "hr % 24 AS hod",
            "CAST(sc AS DOUBLE) / 100 / cnt AS observed",
            "CAST(ws AS DOUBLE) / 100 / wc AS trend",
        )
        .withColumn(
            "r6",
            F.expr("CAST(floor((observed - trend) * 1000000 + 0.5) AS BIGINT)"),
        )
    )
    seas = base.groupBy("event_type", "hod").agg(
        F.sum("r6").alias("sr6"), F.count("*").alias("nh")
    )
    return (
        base.join(F.broadcast(seas), ["event_type", "hod"])
        .selectExpr(
            "event_type",
            "hr",
            "CAST(hod AS BIGINT) AS hour_of_day",
            mround("observed", 6) + " AS observed",
            mround("trend", 6) + " AS trend",
            mround("CAST(sr6 AS DOUBLE) / 1000000 / nh", 6) + " AS seasonal",
            mround(
                "observed - trend - CAST(sr6 AS DOUBLE) / 1000000 / nh", 6
            )
            + " AS residual",
        )
    )


EVENTS_SEASONAL_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS cnt, CAST(sum({cents('value', 100)}) AS BIGINT) AS sc
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2),
base AS (
  SELECT event_type, hr, hr % 24 AS hod,
         CAST(sc AS DOUBLE) / 100 / cnt AS observed,
         CAST(sum(sc) OVER wtr AS DOUBLE) / 100
           / sum(cnt) OVER wtr AS trend
  FROM hourly
  WINDOW wtr AS (PARTITION BY event_type ORDER BY hr
                 RANGE BETWEEN {SEASONAL_HALF} PRECEDING AND {SEASONAL_HALF} FOLLOWING)),
based AS (
  SELECT *, CAST(floor((observed - trend) * 1000000 + 0.5) AS BIGINT) AS r6
  FROM base),
seas AS (
  SELECT event_type, hod, CAST(sum(r6) AS BIGINT) AS sr6,
         CAST(count(*) AS BIGINT) AS nh
  FROM based GROUP BY 1, 2)
SELECT b.event_type, b.hr, CAST(b.hod AS BIGINT) AS hour_of_day,
       {mround('b.observed', 6)} AS observed,
       {mround('b.trend', 6)} AS trend,
       {mround('CAST(s.sr6 AS DOUBLE) / 1000000 / s.nh', 6)} AS seasonal,
       {mround('b.observed - b.trend - CAST(s.sr6 AS DOUBLE) / 1000000 / s.nh', 6)} AS residual
FROM based b JOIN seas s ON b.event_type = s.event_type AND b.hod = s.hod
"""


HDR_SUBS = 8  # sub-buckets per power-of-two bucket => <= 12.5% relative error


def agg_hdr_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram-style tail-latency percentiles over per-user
    inter-event gaps (ms): each gap lands in a (power-of-two exponent,
    HDR_SUBS linear sub-bucket) bin — the HdrHistogram/Gil Tene layout
    every latency SLO dashboard uses — and p50/p90/p99/p99.9 are read off
    the cumulative bin counts as exact bin lower bounds (relative error
    bounded by 1/HDR_SUBS, count exact). Unlike `agg_equidepth_histogram`
    (exact values, data-dependent cuts) this is the fixed-layout mergeable
    form: bins are value-determined, so partial histograms from any number
    of partitions/days merge by addition.

    Determinism: everything is integer — the exponent comes from
    length(bin(gap)) (no transcendental log2), bin lower bounds are shifts,
    the rank thresholds are ceil via integer arithmetic.

    Scale: one lag window per user (shared user shuffle), one groupBy onto
    the <= ~500-bin grid (partial-aggregated — kilobytes from any corpus),
    one tiny cumulative window over the bins, one 1-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    gaps = (
        e.selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
        .withColumn("gap_ms", F.expr("(us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)) div 1000"))
        .filter(F.col("gap_ms").isNotNull())
    )
    # bin lower bound: exact value below HDR_SUBS; (HDR_SUBS + sub) << (e-3)
    # above (e = length(bin(x)) - 1, transcendental-free exponent)
    lo = (
        f"CASE WHEN gap_ms < {HDR_SUBS} THEN gap_ms "
        f"ELSE shiftleft({HDR_SUBS} + (shiftright(gap_ms, length(bin(gap_ms)) - 4) & {HDR_SUBS - 1}), "
        f"length(bin(gap_ms)) - 4) END"
    )
    bins = (
        gaps.selectExpr(f"{lo} AS bin_lo", "gap_ms")
        .groupBy("bin_lo")
        .agg(F.count("*").alias("c"), F.max("gap_ms").alias("mx"))
    )
    wcum = Window.orderBy("bin_lo").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum", F.sum("c").over(wcum))
    labels = {500: "p50_lo_ms", 900: "p90_lo_ms", 990: "p99_lo_ms", 999: "p999_lo_ms"}
    return (
        cum.crossJoin(
            F.broadcast(bins.agg(F.sum("c").alias("n"), F.max("mx").alias("max_ms")))
        )
        .groupBy("n", "max_ms")
        .agg(
            *[
                F.expr(
                    f"min(CASE WHEN cum * 1000 >= {q} * n THEN bin_lo END)"
                ).alias(name)
                for q, name in labels.items()
            ]
        )
        .selectExpr(
            "n AS n_gaps", "max_ms", *labels.values()
        )
    )


AGG_HDR_SQL = f"""
WITH gaps AS (
  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) // 1000 AS gap_ms
  FROM events),
g AS (SELECT gap_ms FROM gaps WHERE gap_ms IS NOT NULL),
bins AS (
  SELECT CASE WHEN gap_ms < {HDR_SUBS} THEN gap_ms
              ELSE (({HDR_SUBS} + ((gap_ms >> (length(bin(gap_ms)) - 4)) & {HDR_SUBS - 1}))
                    << (length(bin(gap_ms)) - 4)) END AS bin_lo,
         CAST(count(*) AS BIGINT) AS c, CAST(max(gap_ms) AS BIGINT) AS mx
  FROM g GROUP BY 1),
cum AS (
  SELECT bin_lo, c, mx,
         sum(c) OVER (ORDER BY bin_lo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM bins),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(max(mx) AS BIGINT) AS max_ms FROM bins)
SELECT n AS n_gaps, max_ms,
       CAST(min(CASE WHEN cum * 1000 >= 500 * n THEN bin_lo END) AS BIGINT) AS p50_lo_ms,
       CAST(min(CASE WHEN cum * 1000 >= 900 * n THEN bin_lo END) AS BIGINT) AS p90_lo_ms,
       CAST(min(CASE WHEN cum * 1000 >= 990 * n THEN bin_lo END) AS BIGINT) AS p99_lo_ms,
       CAST(min(CASE WHEN cum * 1000 >= 999 * n THEN bin_lo END) AS BIGINT) AS p999_lo_ms
FROM cum CROSS JOIN tot
GROUP BY n, max_ms
"""


QUERIES: dict[str, QuerySpec] = {
    "window_rolling_mad_flag": QuerySpec(
        window_rolling_mad_flag, WINDOW_ROLLING_MAD_SQL, "window"
    ),
    "orders_cohort_repeat_rate": QuerySpec(
        orders_cohort_repeat_rate, ORDERS_COHORT_REPEAT_SQL, "aggregation"
    ),
    "diag_pk_uniqueness": QuerySpec(
        diag_pk_uniqueness, DIAG_PK_UNIQUENESS_SQL, "aggregation"
    ),
    "events_rate_spike": QuerySpec(
        events_rate_spike, EVENTS_RATE_SPIKE_SQL, "time-window"
    ),
    "lineitem_open_daily": QuerySpec(
        lineitem_open_daily, LINEITEM_OPEN_DAILY_SQL, "time-window"
    ),
    "agg_ols_two_feature": QuerySpec(
        agg_ols_two_feature, AGG_OLS2_SQL, "aggregation"
    ),
    "window_rolling_median": QuerySpec(
        window_rolling_median, WINDOW_ROLLING_MEDIAN_SQL, "window"
    ),
    "agg_abc_classification": QuerySpec(
        agg_abc_classification, AGG_ABC_SQL, "aggregation"
    ),
    "events_hourweek_profile": QuerySpec(
        events_hourweek_profile, EVENTS_HOURWEEK_SQL, "time-window"
    ),
    "events_snapshot_asof": QuerySpec(
        events_snapshot_asof, EVENTS_SNAPSHOT_ASOF_SQL, "time-window"
    ),
    "agg_equidepth_histogram": QuerySpec(
        agg_equidepth_histogram, AGG_EQUIDEPTH_SQL, "aggregation"
    ),
    "diag_referential_orphans": QuerySpec(
        diag_referential_orphans, DIAG_REF_ORPHANS_SQL, "aggregation"
    ),
    "events_type_diversity": QuerySpec(
        events_type_diversity, EVENTS_TYPE_DIVERSITY_SQL, "time-window"
    ),
    "events_active_users_rolling": QuerySpec(
        events_active_users_rolling, EVENTS_ACTIVE_USERS_SQL, "time-window"
    ),
    "events_drawdown_max": QuerySpec(
        events_drawdown_max, EVENTS_DRAWDOWN_SQL, "window"
    ),
    "events_funnel_ttc": QuerySpec(
        events_funnel_ttc, EVENTS_FUNNEL_TTC_SQL, "time-window"
    ),
    "events_gap_burstiness": QuerySpec(
        events_gap_burstiness, EVENTS_BURSTINESS_SQL, "window"
    ),
    "skyline_pareto_orders": QuerySpec(
        skyline_pareto_orders, SKYLINE_PARETO_SQL, "window"
    ),
    "diag_ks_drift": QuerySpec(diag_ks_drift, DIAG_KS_DRIFT_SQL, "aggregation"),
    "events_change_point": QuerySpec(
        events_change_point, EVENTS_CHANGE_POINT_SQL, "window"
    ),
    "diag_psi_drift": QuerySpec(diag_psi_drift, DIAG_PSI_DRIFT_SQL, "aggregation"),
    "agg_mann_whitney": QuerySpec(
        agg_mann_whitney, AGG_MANN_WHITNEY_SQL, "aggregation"
    ),
    "events_growth_accounting": QuerySpec(
        events_growth_accounting, EVENTS_GROWTH_ACCOUNTING_SQL, "time-window"
    ),
    "events_bot_score": QuerySpec(
        events_bot_score, EVENTS_BOT_SCORE_SQL, "time-window"
    ),
    "diag_null_profile": QuerySpec(
        diag_null_profile, DIAG_NULL_PROFILE_SQL, "aggregation"
    ),
    "events_sessionized_funnel": QuerySpec(
        events_sessionized_funnel, EVENTS_SESSIONIZED_FUNNEL_SQL, "time-window"
    ),
    "agg_welch_ttest": QuerySpec(agg_welch_ttest, AGG_WELCH_TTEST_SQL, "aggregation"),
    "eval_pass_at_k": QuerySpec(eval_pass_at_k, EVAL_PASS_AT_K_SQL, "aggregation"),
    "events_seasonal_decompose": QuerySpec(
        events_seasonal_decompose, EVENTS_SEASONAL_SQL, "time-window"
    ),
    "events_cuped_adjusted_lift": QuerySpec(
        events_cuped_adjusted_lift, EVENTS_CUPED_SQL, "time-window"
    ),
    "agg_hdr_latency_percentiles": QuerySpec(
        agg_hdr_latency_percentiles, AGG_HDR_SQL, "aggregation"
    ),
}


BOOT_B = 32  # bootstrap resamples
BOOT_M = 2147483647  # Mersenne prime 2^31 - 1 (Lehmer modulus)
# inverse-CDF cutoffs for Poisson(1) on the 2^16 grid
# (P(0), P(<=1), ... P(<=4)); weights cap at 5 — the tail beyond
# contributes < 1e-4 of resamples
BOOT_CUTS = (24109, 48218, 60272, 64290, 65294)


def _boot_weight(expr_hash: str) -> str:
    """Poisson(1) weight from a uniform 2^16-grid hash value (BOOT_CUTS are
    the Poisson(1) CDF scaled by 65536) — same CASE text in both dialects."""
    return (
        "CASE "
        + " ".join(
            f"WHEN {expr_hash} < {c} THEN {w}" for w, c in enumerate(BOOT_CUTS)
        )
        + " ELSE 5 END"
    )


def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean order price —
    BOOT_B resamples whose per-row weights reweight the rows in ONE pass,
    i.e. the only bootstrap that works on a data-parallel engine (never
    materialize resamples; Chamandy et al., Google 2012). Reports the
    full-sample mean and the order-statistics band of the replicate means.

    Determinism: the "randomness" is one md5 per ROW (two 31-bit uniform
    seeds from the digest) stretched across replicates by Lehmer-style
    integer mixing — u_b = (s1·(2b+1) + s2·(b²+1)) mod (2³¹−1) mod 2¹⁶ —
    so both engines derive identical weights from identical arithmetic
    (all intermediates < 2^42, no overflow in either), every replicate
    mean is a ratio of integer sums, and the band picks order statistics
    from the sorted 32-element array. One md5 per row (not per replicate)
    is what makes the query cheap — the digest supplies the entropy, the
    mixing only decorrelates replicates.

    Scale: map side is 1 hash + BOOT_B CASE expressions per row; the 32
    weighted sums accumulate as WIDE aggregate columns in a single 1-row
    aggregate (partial-combined — the wire carries 64 longs per task at
    any corpus size); the order-statistics step runs on a 32-row table."""
    o = load_table(spark, sf_dir, "orders")
    seeded = o.selectExpr(
        f"{cents('o_totalprice')} AS vc",
        "md5(CAST(o_orderkey AS STRING)) AS d",
    ).selectExpr(
        "vc",
        f"CAST(conv(substring(d, 1, 8), 16, 10) AS BIGINT) % {BOOT_M} AS s1",
        f"CAST(conv(substring(d, 9, 8), 16, 10) AS BIGINT) % {BOOT_M} AS s2",
    )

    def u(b: int) -> str:
        return f"(((s1 * {2 * b + 1} + s2 * {b * b + 1}) % {BOOT_M}) % 65536)"

    wide = seeded.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("vc").alias("sv"),
        *[
            a
            for b in range(BOOT_B)
            for a in (
                F.sum(
                    F.expr(f"CAST({_boot_weight(u(b))} AS BIGINT) * vc")
                ).alias(f"swv{b}"),
                F.sum(F.expr(_boot_weight(u(b)))).alias(f"sw{b}"),
            )
        ]
    )
    lo_i = -(-25 * BOOT_B // 1000)  # ceil(0.025 * B), 1-indexed
    hi_i = -(-975 * BOOT_B // 1000)
    means = (
        "sort_array(array("
        + ", ".join(
            f"CAST(swv{b} AS DOUBLE) / 1000000 / sw{b}" for b in range(BOOT_B)
        )
        + "))"
    )
    return wide.selectExpr(
        "n AS n_rows",
        mround("CAST(sv AS DOUBLE) / 1000000 / n", 6) + " AS mean_price",
        f"CAST({BOOT_B} AS BIGINT) AS n_replicates",
        mround(f"{means}[{lo_i - 1}]", 6) + " AS ci_lo",
        mround(f"{means}[{hi_i - 1}]", 6) + " AS ci_hi",
    )


def _bootstrap_sql() -> str:
    def u(b: int) -> str:
        return f"(((s1 * {2 * b + 1} + s2 * {b * b + 1}) % {BOOT_M}) % 65536)"

    lo_i = -(-25 * BOOT_B // 1000)
    hi_i = -(-975 * BOOT_B // 1000)
    wides = ", ".join(
        f"CAST(sum(CAST({_boot_weight(u(b))} AS BIGINT) * vc) AS BIGINT) AS swv{b}, "
        f"CAST(sum({_boot_weight(u(b))}) AS BIGINT) AS sw{b}"
        for b in range(BOOT_B)
    )
    means = (
        "list_sort(["
        + ", ".join(
            f"CAST(swv{b} AS DOUBLE) / 1000000 / sw{b}" for b in range(BOOT_B)
        )
        + "])"
    )
    return f"""
WITH seeded AS (
  SELECT {cents('o_totalprice')} AS vc,
         CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % {BOOT_M} AS s1,
         CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 9, 8)) AS BIGINT) % {BOOT_M} AS s2
  FROM orders),
wide AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vc) AS BIGINT) AS sv, {wides}
  FROM seeded)
SELECT n AS n_rows,
       {mround('CAST(sv AS DOUBLE) / 1000000 / n', 6)} AS mean_price,
       CAST({BOOT_B} AS BIGINT) AS n_replicates,
       {mround(f'{means}[{lo_i}]', 6)} AS ci_lo,
       {mround(f'{means}[{hi_i}]', 6)} AS ci_hi
FROM wide
"""


AGG_BOOTSTRAP_SQL = _bootstrap_sql()


QUERIES["agg_bootstrap_ci"] = QuerySpec(
    agg_bootstrap_ci, AGG_BOOTSTRAP_SQL, "aggregation"
)


def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group location estimates for a heavy-tailed money column:
    exact p05/p95 cuts (percentile_disc — ACTUAL data values, so the cuts
    are cross-engine exact with no interpolation), the winsorized mean
    (values clamped into [p05, p95]), and the trimmed mean (values outside
    the cuts dropped). The means go through the integer micro-unit sum
    (``cents``) so reduction order cannot move a bit.

    Scale: one sort-based aggregation per group for the two cuts, then a
    broadcast join of the 5-row cuts table back onto the scan for one
    partial-aggregated pass — the same two-pass shape as
    events_anomaly_mad. At a group cardinality where the per-group exact
    percentile is itself the bottleneck, approx_percentile is the sketch
    swap-in; the clamp/trim logic is unchanged."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_wz_orders")
    return spark.sql(
        f"""
        WITH cuts AS (
          SELECT o_orderpriority,
                 percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice) AS p05,
                 percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95
          FROM _wz_orders GROUP BY o_orderpriority)
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               min(c.p05) AS p05,
               min(c.p95) AS p95,
               {mround('CAST(sum(' + cents('least(greatest(o.o_totalprice, c.p05), c.p95)') + ') AS DOUBLE) / 1000000 / count(*)', 6)} AS winsor_mean,
               CAST(sum(CASE WHEN o.o_totalprice >= c.p05 AND o.o_totalprice <= c.p95 THEN 1 ELSE 0 END) AS BIGINT) AS trim_n,
               {mround('CAST(sum(CASE WHEN o.o_totalprice >= c.p05 AND o.o_totalprice <= c.p95 THEN ' + cents('o.o_totalprice') + ' ELSE 0 END) AS DOUBLE) / 1000000 / sum(CASE WHEN o.o_totalprice >= c.p05 AND o.o_totalprice <= c.p95 THEN 1 ELSE 0 END)', 6)} AS trim_mean
        FROM _wz_orders o JOIN cuts c ON o.o_orderpriority = c.o_orderpriority
        GROUP BY o.o_orderpriority
        """
    )


AGG_WINSORIZED_SQL = f"""
WITH cuts AS (
  SELECT o_orderpriority,
         quantile_disc(o_totalprice, 0.05) AS p05,
         quantile_disc(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       min(c.p05) AS p05,
       min(c.p95) AS p95,
       {mround('CAST(sum(' + cents('least(greatest(o.o_totalprice, c.p05), c.p95)') + ') AS DOUBLE) / 1000000 / count(*)', 6)} AS winsor_mean,
       CAST(sum(CASE WHEN o.o_totalprice >= c.p05 AND o.o_totalprice <= c.p95 THEN 1 ELSE 0 END) AS BIGINT) AS trim_n,
       {mround('CAST(sum(CASE WHEN o.o_totalprice >= c.p05 AND o.o_totalprice <= c.p95 THEN ' + cents('o.o_totalprice') + ' ELSE 0 END) AS DOUBLE) / 1000000 / sum(CASE WHEN o.o_totalprice >= c.p05 AND o.o_totalprice <= c.p95 THEN 1 ELSE 0 END)', 6)} AS trim_mean
FROM orders o JOIN cuts c ON o.o_orderpriority = c.o_orderpriority
GROUP BY o.o_orderpriority
"""


QUERIES["agg_winsorized_stats"] = QuerySpec(
    agg_winsorized_stats, AGG_WINSORIZED_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Rank correlation / time-series correlation wave (r06)
# ---------------------------------------------------------------------------


def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware Spearman rank correlation between quantity and extended
    price per return flag — the robust monotone-association measure a
    feature-selection or drift pass wants when the columns are nothing like
    Gaussian (quantity is a 50-value integer grid with massive ties; price
    is heavy-tailed money). Ranks are the textbook AVERAGE ranks, carried
    as DOUBLED integers (2·rank() + ties − 1, an exact integer even for
    half ranks); rho is then Pearson over the doubled ranks via
    :func:`tmapreduce_spark.parity.pearson_txt` — scale/shift invariance
    of Pearson makes the doubling free, and every moment sum is an exact
    int64, so reduction order cannot move a bit.

    Scale: two window ranks over the group partition plus one partial-agg
    groupBy — the same shuffle the ranks already need. Doubled-rank moment
    sums stay in int64 to ~5e5 rows per group (sf0.1 is ~2e5); past that
    swap the sum accumulators to DECIMAL(38,0), the combination is
    unchanged (parity.py scale note). There is no per-pair work anywhere —
    Spearman via ranks is O(n log n), never the O(n^2) of Kendall.

    (r12 A/B, rejected: computing the doubled ranks on the distinct-value
    histograms — groupBy(group, value) + cumulative-count window + two
    broadcast joins back onto the rows — measured 1.55 → 2.07 s at sf0.1:
    l_extendedprice is near-unique, so its histogram barely collapses and
    the ~450k-row broadcast build costs more than the 3-partition window
    sorts it removes. The window form stays until groups shrink relative
    to distinct values.)"""
    from tmapreduce_spark.parity import pearson_txt

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    wx = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wxc = Window.partitionBy("l_returnflag", "l_quantity")
    wy = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wyc = Window.partitionBy("l_returnflag", "l_extendedprice")
    ranked = (
        li.withColumn("ax", 2 * F.rank().over(wx) + F.count("*").over(wxc) - 1)
        .withColumn("ay", 2 * F.rank().over(wy) + F.count("*").over(wyc) - 1)
        .select(
            "l_returnflag",
            F.col("ax").cast("bigint").alias("ax"),
            F.col("ay").cast("bigint").alias("ay"),
        )
    )
    agg = ranked.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("ax").alias("sx"),
        F.sum("ay").alias("sy"),
        F.sum(F.expr("ax * ax")).alias("sxx"),
        F.sum(F.expr("ay * ay")).alias("syy"),
        F.sum(F.expr("ax * ay")).alias("sxy"),
    )
    return agg.selectExpr(
        "l_returnflag",
        "n",
        pearson_txt("n", "sx", "sy", "sxx", "syy", "sxy") + " AS rho_spearman",
    )


def _spearman_sql() -> str:
    from tmapreduce_spark.parity import pearson_txt

    return f"""
WITH ranked AS (
  SELECT l_returnflag,
         CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
              + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
              AS BIGINT) AS ax,
         CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
              + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
              AS BIGINT) AS ay
  FROM lineitem),
agg AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ax) AS BIGINT) AS sx, CAST(sum(ay) AS BIGINT) AS sy,
         CAST(sum(ax * ax) AS BIGINT) AS sxx,
         CAST(sum(ay * ay) AS BIGINT) AS syy,
         CAST(sum(ax * ay) AS BIGINT) AS sxy
  FROM ranked GROUP BY l_returnflag)
SELECT l_returnflag, n,
       {pearson_txt("n", "sx", "sy", "sxx", "syy", "sxy")} AS rho_spearman
FROM agg
"""


AGG_SPEARMAN_SQL = _spearman_sql()

QUERIES["agg_spearman_corr"] = QuerySpec(
    agg_spearman_corr, AGG_SPEARMAN_SQL, "aggregation"
)


# --- zero-filled dense hourly series (shared by ACF / xcorr / spectral) ----

_ACF_MAX_LAG = 12
_XCORR_MAX_LAG = 6


def _dense_hourly(spark: SparkSession, sf_dir: str, event_type: str | None = None) -> DataFrame:
    """Zero-filled dense hourly count series over the FULL event time range
    (all types define the range so every series shares one clock): one
    partial-agg groupBy collapses the stream to (hour, n); the calendar
    spine is sequence(min, max) off a 1-row range aggregate — series length
    is bounded by wall-clock hours, not event volume, so everything
    downstream runs on a reduced table.

    ONE events pass builds everything (r12): the per-type count is a
    conditional sum of an UNFILTERED groupBy(hidx) — so every event's hour
    has a row and min/max over the table IS the all-types clock, replacing
    the second full-corpus range aggregate — and the hour table (calendar-
    bounded) is lazily localCheckpointed so consumers that use the series
    twice (ACF's lag self-join) re-read it instead of re-scanning events."""
    e = load_table(spark, sf_dir, "events")
    hidx = F.expr("CAST(unix_micros(date_trunc('hour', ts)) div 3600000000 AS BIGINT)")
    # r12 advice: build the per-type indicator as a column expression, not an
    # f-string CASE — a caller-supplied event_type containing a quote must
    # never reach SQL text. (Callers are currently module-internal literals;
    # this hardens the helper, the plan is identical.)
    one = (
        F.when(F.col("event_type") == F.lit(event_type), F.lit(1)).otherwise(F.lit(0))
        if event_type
        else F.lit(1)
    )
    counted = (
        e.select(hidx.alias("hidx"), one.alias("one"))
        .groupBy("hidx")
        .agg(F.sum("one").alias("n"))
        .localCheckpoint(eager=False)
    )
    rng = counted.groupBy().agg(
        F.min("hidx").alias("lo"), F.max("hidx").alias("hi")
    )
    spine = rng.selectExpr("explode(sequence(lo, hi)) AS hidx")
    return spine.join(counted, "hidx", "left").selectExpr(
        "hidx", "CAST(coalesce(n, 0) AS BIGINT) AS n"
    )


def _dense_hourly_sql(event_type: str | None = None, prefix: str = "") -> str:
    """Zero-filled dense hourly series CTE set (``counted``/``rng``/``dense``).

    ``prefix`` suffixes every CTE name (r06 advice: callers that need two
    filtered copies — e.g. the lead/lag cross-correlation — pass distinct
    prefixes instead of post-hoc string .replace over this function's
    output, which would silently corrupt the SQL if an edit here ever
    introduced those substrings in another context)."""
    where = f"WHERE event_type = '{event_type}'" if event_type else ""
    return f"""
counted{prefix} AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hidx,
         count(*) AS n
  FROM events {where} GROUP BY 1),
rng{prefix} AS (
  SELECT min(hidx) AS lo, max(hidx) AS hi
  FROM (SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
          AS hidx FROM events) t),
dense{prefix} AS (
  SELECT s.hidx, CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM (SELECT unnest(generate_series(lo, hi)) AS hidx FROM rng{prefix}) s
  LEFT JOIN counted{prefix} c USING (hidx))
"""


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event-rate series at lags
    1..12 — the seasonality fingerprint (a daily cycle shows up as a ridge
    toward lag 24; short-memory burstiness decays within a few lags) that
    feeds forecasting-model choice before anyone fits one. The series is
    the zero-filled dense hourly count (gaps are real zero-activity hours,
    not missing rows); each lag's coefficient is the Pearson correlation of
    the (x_t, x_{t+L}) overlap pairs, combined from exact int64 moment
    sums via :func:`tmapreduce_spark.parity.pearson_txt`.

    Scale: the only corpus-sized work is the one groupBy building the
    hourly rollup; the lag self-join runs on the reduced series (calendar
    hours x 12 lags) keyed on hidx+L = hidx — an equi hash join, no range
    scan, no window over the raw stream."""
    from tmapreduce_spark.parity import pearson_txt

    dense = _dense_hourly(spark, sf_dir)
    lags = spark.range(1, _ACF_MAX_LAG + 1).selectExpr("CAST(id AS BIGINT) AS lag")
    a = dense.selectExpr("hidx", "n AS x")
    b = dense.selectExpr("hidx AS hidx_b", "n AS y")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("hidx + lag = hidx_b"))
        .select("lag", "x", "y")
    )
    agg = pairs.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return agg.selectExpr(
        "lag",
        "n_pairs",
        pearson_txt("n_pairs", "sx", "sy", "sxx", "syy", "sxy") + " AS acf",
    )


def _acf_sql() -> str:
    from tmapreduce_spark.parity import pearson_txt

    return f"""
WITH {_dense_hourly_sql()},
lags AS (SELECT CAST(unnest(generate_series(1, {_ACF_MAX_LAG})) AS BIGINT) AS lag),
pairs AS (
  SELECT l.lag, a.n AS x, b.n AS y
  FROM dense a CROSS JOIN lags l JOIN dense b ON a.hidx + l.lag = b.hidx),
agg AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY lag)
SELECT lag, n_pairs,
       {pearson_txt("n_pairs", "sx", "sy", "sxx", "syy", "sxy")} AS acf
FROM agg
"""


EVENTS_ACF_SQL = _acf_sql()

QUERIES["events_autocorrelation"] = QuerySpec(
    events_autocorrelation, EVENTS_ACF_SQL, "events"
)


def events_xcorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the view and purchase hourly
    series at lags -6..+6 — the does-browsing-predict-buying (and with how
    many hours of lead) question behind attribution windows and campaign
    timing. corr(view_t, purchase_{t+L}): a peak at positive L means views
    LEAD purchases by L hours. Both series ride the shared zero-filled
    hourly spine so they are aligned on one clock; each lag's coefficient
    is Pearson over the overlap pairs from exact int64 moment sums.

    Scale: identical shape to events_autocorrelation, but BOTH series come
    from one conditional-sum groupBy(hidx) over a single events pass (the
    lazily checkpointed two-column hour table; before r12 each series ran
    its own count pass plus its own full-corpus range aggregate — 4 scans,
    now 1), then a 13-lag equi-join on the reduced calendar-bounded
    series."""
    from tmapreduce_spark.parity import pearson_txt

    e = load_table(spark, sf_dir, "events")
    hidx = "CAST(unix_micros(date_trunc('hour', ts)) div 3600000000 AS BIGINT)"
    wide = (
        e.selectExpr(f"{hidx} AS hidx", "event_type")
        .groupBy("hidx")
        .agg(
            F.sum(
                F.expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END")
            ).alias("nv"),
            F.sum(
                F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            ).alias("np"),
        )
        .localCheckpoint(eager=False)
    )
    rng = wide.groupBy().agg(F.min("hidx").alias("lo"), F.max("hidx").alias("hi"))
    spine = rng.selectExpr("explode(sequence(lo, hi)) AS hidx")
    va = spine.join(wide, "hidx", "left").selectExpr(
        "hidx", "CAST(coalesce(nv, 0) AS BIGINT) AS x"
    )
    pb = spine.join(wide, "hidx", "left").selectExpr(
        "hidx AS hidx_b", "CAST(coalesce(np, 0) AS BIGINT) AS y"
    )
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).selectExpr(
        "CAST(id AS BIGINT) AS lag"
    )
    pairs = (
        va.crossJoin(F.broadcast(lags))
        .join(pb, F.expr("hidx + lag = hidx_b"))
        .select("lag", "x", "y")
    )
    agg = pairs.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return agg.selectExpr(
        "lag",
        "n_pairs",
        pearson_txt("n_pairs", "sx", "sy", "sxx", "syy", "sxy") + " AS xcorr",
    )


def _xcorr_sql() -> str:
    from tmapreduce_spark.parity import pearson_txt

    va = _dense_hourly_sql("view", prefix="_v")
    pb = _dense_hourly_sql("purchase", prefix="_p")
    return f"""
WITH {va},
{pb.lstrip()},
lags AS (SELECT CAST(unnest(generate_series(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG})) AS BIGINT) AS lag),
pairs AS (
  SELECT l.lag, a.n AS x, b.n AS y
  FROM dense_v a CROSS JOIN lags l JOIN dense_p b ON a.hidx + l.lag = b.hidx),
agg AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY lag)
SELECT lag, n_pairs,
       {pearson_txt("n_pairs", "sx", "sy", "sxx", "syy", "sxy")} AS xcorr
FROM agg
"""


EVENTS_XCORR_SQL = _xcorr_sql()

QUERIES["events_xcorr_leadlag"] = QuerySpec(
    events_xcorr_leadlag, EVENTS_XCORR_SQL, "events"
)


# --- fixed-period spectral energy (DFT components via literal twiddles) ----

_SPECTRAL_PERIODS = (24, 168)  # daily and weekly cycles, in hours


def _twiddle_rows() -> list[tuple[int, int, int, int]]:
    """(period, phase, cos_micro, sin_micro) for every phase of every probe
    period — computed ONCE in Python at module import and injected into
    BOTH engines as literals, so no engine-side trig ever runs (libm cos
    is not correctly rounded; identical literals are). Micro-unit grid
    keeps the per-row products exact integers."""
    import math

    rows = []
    for p in _SPECTRAL_PERIODS:
        for ph in range(p):
            ang = 2.0 * math.pi * ph / p
            rows.append(
                (
                    p,
                    ph,
                    int(math.floor(math.cos(ang) * 1_000_000 + 0.5)),
                    int(math.floor(math.sin(ang) * 1_000_000 + 0.5)),
                )
            )
    return rows


def events_spectral_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT component of the hourly event-rate series at the daily (24 h)
    and weekly (168 h) probe periods — the direct strength-of-seasonality
    readout (amplitude in events/hour) that confirms what the ACF ridge
    hints at, without fitting anything. Per period P:
    cs = Σ n_t·cos(2πt/P), ss = Σ n_t·sin(2πt/P) over the zero-filled
    dense series, amplitude = 2·sqrt(cs²+ss²)/T. The twiddle factors are
    integer-micro literals from ONE Python computation (`_twiddle_rows`)
    shipped to both engines, so cs/ss are exact int64 sums — engine trig
    never runs and reduction order cannot move a bit; the only float work
    is the final per-period amplitude chain.

    Scale: one corpus groupBy to the hourly rollup; the probe is a
    broadcast join of the 192-row twiddle dim onto the calendar-bounded
    series and one partial-agg groupBy to 2 rows. Adding probe periods is
    rows in the literal dim, not passes over the data."""
    dense = _dense_hourly(spark, sf_dir)
    tw = spark.createDataFrame(
        _twiddle_rows(), "period long, phase long, c_micro long, s_micro long"
    )
    periods = spark.createDataFrame(
        [(p,) for p in _SPECTRAL_PERIODS], "period long"
    )
    probed = (
        dense.crossJoin(F.broadcast(periods))
        .withColumn("phase", F.expr("hidx % period"))
        .join(F.broadcast(tw), ["period", "phase"])
    )
    agg = probed.groupBy("period").agg(
        F.count("*").cast("bigint").alias("t_hours"),
        F.sum("n").alias("n_events"),
        F.sum(F.expr("n * c_micro")).alias("cs_units"),
        F.sum(F.expr("n * s_micro")).alias("ss_units"),
    )
    amp = (
        "2 * sqrt(CAST(cs_units AS DOUBLE) * CAST(cs_units AS DOUBLE)"
        " + CAST(ss_units AS DOUBLE) * CAST(ss_units AS DOUBLE))"
        " / 1000000 / t_hours"
    )
    return agg.selectExpr(
        "period",
        "t_hours",
        "n_events",
        "cs_units",
        "ss_units",
        mround(amp, 6) + " AS amplitude",
        mround("CAST(n_events AS DOUBLE) / t_hours", 6) + " AS mean_rate",
    )


def _spectral_sql() -> str:
    vals = ", ".join(f"({p}, {ph}, {c}, {s})" for p, ph, c, s in _twiddle_rows())
    amp = (
        "2 * sqrt(CAST(cs_units AS DOUBLE) * CAST(cs_units AS DOUBLE)"
        " + CAST(ss_units AS DOUBLE) * CAST(ss_units AS DOUBLE))"
        " / 1000000 / t_hours"
    )
    return f"""
WITH {_dense_hourly_sql()},
tw AS (SELECT * FROM (VALUES {vals}) AS v(period, phase, c_micro, s_micro)),
probed AS (
  SELECT t.period, d.n, t.c_micro, t.s_micro
  FROM dense d JOIN tw t ON d.hidx % t.period = t.phase),
agg AS (
  SELECT period, CAST(count(*) AS BIGINT) AS t_hours,
         CAST(sum(n) AS BIGINT) AS n_events,
         CAST(sum(n * c_micro) AS BIGINT) AS cs_units,
         CAST(sum(n * s_micro) AS BIGINT) AS ss_units
  FROM probed GROUP BY period)
SELECT CAST(period AS BIGINT) AS period, t_hours, n_events, cs_units, ss_units,
       {mround(amp, 6)} AS amplitude,
       {mround("CAST(n_events AS DOUBLE) / t_hours", 6)} AS mean_rate
FROM agg
"""


EVENTS_SPECTRAL_SQL = _spectral_sql()

QUERIES["events_spectral_energy"] = QuerySpec(
    events_spectral_energy, EVENTS_SPECTRAL_SQL, "events"
)


# --- Cramér's V association between two categorical columns ----------------


def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between the documents corpus's two
    categorical axes (lang × source) — the 0..1 effect-size companion to
    the chi-square drift tests: "are languages distributed independently
    of sources, and if not how far from independent?" — the first
    stratification sanity check before building per-(lang, source)
    training mixes. The groupBy contingency table only contains OBSERVED
    (lang, source) cells, so the per-cell statistic uses the zero-cell-
    complete closed form chi² = n + Σ_observed [(o·n − r·c)²/(n·r·c) −
    r·c/n] (a missing cell contributes exactly its expectation e = r·c/n,
    and Σ_all e = n — so absent cells are folded into the constant);
    V = sqrt(chi²/(n·(min(R,C)−1))).

    Determinism: every per-cell term is one fixed IEEE expression of exact
    int64 counts, pre-rounded to a 1e-9 integer grid BEFORE the cross-cell
    sum (the NDCG pattern) — so the only reduction is an integer sum and
    both engines agree bit-for-bit.

    Scale: one partial-agg groupBy collapses the corpus to the contingency
    table (bounded by |langs|×|sources|); marginals are windows over that
    reduced table and the final answer is a 1-row aggregate. Nothing after
    the first groupBy ever sees a corpus row."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    en = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(wl).alias("r"),
        F.sum("o").over(ws).alias("c"),
        F.sum("o").over(wall).alias("n"),
    )
    dev = (
        "(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)"
        " - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))"
    )
    term = (
        f"{dev} * {dev} / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)"
        " * CAST(c AS DOUBLE))"
        " - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)"
    )
    agg = en.selectExpr(
        "lang",
        "source",
        "n",
        f"CAST(floor(({term}) * 1000000000 + 0.5) AS BIGINT) AS t9",
    ).groupBy().agg(
        F.max("n").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("t9").alias("chi9"),
    )
    chi2 = "(CAST(n AS DOUBLE) + CAST(chi9 AS DOUBLE) / 1000000000)"
    v = (
        f"sqrt(({chi2}) / (CAST(n AS DOUBLE)"
        " * (least(n_langs, n_sources) - 1)))"
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "n_langs",
        "n_sources",
        mround(chi2, 6) + " AS chi2",
        "CASE WHEN least(n_langs, n_sources) <= 1 THEN NULL ELSE "
        + mround(v, 6)
        + " END AS cramers_v",
    )


def _cramers_sql() -> str:
    dev = (
        "(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)"
        " - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))"
    )
    term = (
        f"{dev} * {dev} / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)"
        " * CAST(c AS DOUBLE))"
        " - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)"
    )
    chi2 = "(CAST(n AS DOUBLE) + CAST(chi9 AS DOUBLE) / 1000000000)"
    v = (
        f"sqrt(({chi2}) / (CAST(n AS DOUBLE)"
        " * (least(n_langs, n_sources) - 1)))"
    )
    return f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source),
en AS (
  SELECT lang, source, o,
         CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
         CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS c,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM cells),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(sum(CAST(floor(({term}) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS chi9
  FROM en)
SELECT n, n_langs, n_sources,
       {mround(chi2, 6)} AS chi2,
       CASE WHEN least(n_langs, n_sources) <= 1 THEN NULL ELSE {mround(v, 6)} END
         AS cramers_v
FROM agg
"""


AGG_CRAMERS_SQL = _cramers_sql()

QUERIES["agg_cramers_v"] = QuerySpec(agg_cramers_v, AGG_CRAMERS_SQL, "aggregation")


# --- Sample-ratio-mismatch (SRM) guardrail for deterministic A/B splits ----


def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check over a deterministic 50/50 A/B
    assignment of event users: the experimentation guardrail that runs
    BEFORE any lift metric (Welch/CUPED) is trusted — a biased randomizer
    shows up as an assignment-count chi-square far above its d.f. Users
    are bucketed by md5(user_id) parity (replayable, engine-agnostic — the
    same hash split `pipeline_cv_folds` uses), so the check audits the
    exact assignment the experiment queries consume.

    chi-square for a 50/50 design simplifies to (n_a - n_b)^2 / n — exact
    integer arithmetic until one final division; the flag threshold 3.841
    (chi-square_{1, 0.05}) compares against the exact rational via integer
    cross-multiplication, so no float boundary decides admission.

    Scale: one distinct-user reduce (partial-agg groupBy on user_id), then
    a 1-row conditional aggregate. Nothing beyond the distinct touches the
    event table."""
    e = load_table(spark, sf_dir, "events")
    arm = (
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) % 2"
    )
    users = e.select("user_id").distinct().selectExpr(f"{arm} AS arm")
    agg = users.groupBy().agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END")).cast("bigint").alias("n_a"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")).cast("bigint").alias("n_b"),
    )
    d2 = "(n_a - n_b) * (n_a - n_b)"
    chi = f"CAST({d2} AS DOUBLE) / (n_a + n_b)"
    return agg.selectExpr(
        "n_a",
        "n_b",
        mround(chi, 6) + " AS chi2",
        # 3.841 = 3841/1000: integer cross-multiply, no float compare
        f"CAST(CASE WHEN 1000 * ({d2}) > 3841 * (n_a + n_b) THEN 1 ELSE 0 END"
        " AS BIGINT) AS srm_flag",
    )


EVENTS_SRM_SQL = f"""
WITH users AS (
  SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 2 AS arm
  FROM (SELECT DISTINCT user_id FROM events) u),
agg AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM users)
SELECT n_a, n_b,
       {mround('CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)', 6)} AS chi2,
       CAST(CASE WHEN 1000 * ((n_a - n_b) * (n_a - n_b)) > 3841 * (n_a + n_b)
            THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM agg
"""


QUERIES["events_srm_check"] = QuerySpec(events_srm_check, EVENTS_SRM_SQL, "events")


# --- Mutual information / entropies of the lang x source contingency -------


def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropies H(lang), H(source) and their mutual information
    I(lang; source) over the documents corpus — the information-theoretic
    companion to `agg_cramers_v` on the same contingency substrate:
    Cramér's V says HOW FAR from independent, MI says how many nats of
    lang are predictable from source (and the normalized NMI =
    I/sqrt(H_l*H_s) is the 0..1 clustering-agreement form).

    Determinism: each per-cell term is one fixed IEEE expression of exact
    int64 counts ending in ln() — one of the documented engine-side-
    transcendental exceptions (the PSI pattern, analytics.py ln() note):
    both engines' ln agree to <= 1 ulp and every term is pre-rounded to a
    1e-9 integer grid BEFORE the cross-cell sum, so the only reduction is
    an integer sum. I = sum_ij (o/n)*ln(o*n/(r*c)) needs no zero-cell
    correction (absent cells contribute 0), and H terms use observed
    marginals only.

    Scale: identical shape to `agg_cramers_v` — one partial-agg groupBy
    to the bounded (lang x source) grid, windows over that grid, and a
    1-row final aggregate."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    en = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(wl).alias("r"),
        F.sum("o").over(ws).alias("c"),
        F.sum("o").over(wall).alias("n"),
    )
    mi_t = (
        "(CAST(o AS DOUBLE) / n) * ln(CAST(o AS DOUBLE) * n"
        " / (CAST(r AS DOUBLE) * c))"
    )
    # H(lang) = -sum_l (r/n) ln(r/n): attribute each cell 1/c_count of its
    # row marginal term so the grid sum telescopes without a second groupBy:
    # instead sum over DISTINCT marginals via min-tagging (first cell of
    # each lang/source carries the whole term).
    hl_t = (
        "CASE WHEN rn_l = 1 THEN -(CAST(r AS DOUBLE) / n)"
        " * ln(CAST(r AS DOUBLE) / n) ELSE 0.0 END"
    )
    hs_t = (
        "CASE WHEN rn_s = 1 THEN -(CAST(c AS DOUBLE) / n)"
        " * ln(CAST(c AS DOUBLE) / n) ELSE 0.0 END"
    )
    tagged = en.withColumn(
        "rn_l", F.row_number().over(Window.partitionBy("lang").orderBy("source"))
    ).withColumn(
        "rn_s", F.row_number().over(Window.partitionBy("source").orderBy("lang"))
    )
    g9 = "1000000000"
    agg = tagged.selectExpr(
        f"CAST(floor(({mi_t}) * {g9} + 0.5) AS BIGINT) AS mi9",
        f"CAST(floor(({hl_t}) * {g9} + 0.5) AS BIGINT) AS hl9",
        f"CAST(floor(({hs_t}) * {g9} + 0.5) AS BIGINT) AS hs9",
    ).groupBy().agg(
        F.sum("mi9").alias("mi9"),
        F.sum("hl9").alias("hl9"),
        F.sum("hs9").alias("hs9"),
    )
    mi = f"CAST(mi9 AS DOUBLE) / {g9}"
    hl = f"CAST(hl9 AS DOUBLE) / {g9}"
    hs = f"CAST(hs9 AS DOUBLE) / {g9}"
    nmi = f"({mi}) / NULLIF(sqrt(({hl}) * ({hs})), 0)"
    return agg.selectExpr(
        mround(hl, 6) + " AS h_lang",
        mround(hs, 6) + " AS h_source",
        mround(mi, 6) + " AS mi_nats",
        mround(nmi, 6) + " AS nmi",
    )


def _mi_sql() -> str:
    g9 = "1000000000"
    mi_t = (
        "(CAST(o AS DOUBLE) / n) * ln(CAST(o AS DOUBLE) * n"
        " / (CAST(r AS DOUBLE) * c))"
    )
    hl_t = (
        "CASE WHEN rn_l = 1 THEN -(CAST(r AS DOUBLE) / n)"
        " * ln(CAST(r AS DOUBLE) / n) ELSE 0.0 END"
    )
    hs_t = (
        "CASE WHEN rn_s = 1 THEN -(CAST(c AS DOUBLE) / n)"
        " * ln(CAST(c AS DOUBLE) / n) ELSE 0.0 END"
    )
    mi = f"CAST(mi9 AS DOUBLE) / {g9}"
    hl = f"CAST(hl9 AS DOUBLE) / {g9}"
    hs = f"CAST(hs9 AS DOUBLE) / {g9}"
    nmi = f"({mi}) / NULLIF(sqrt(({hl}) * ({hs})), 0)"
    return f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source),
en AS (
  SELECT lang, source, o,
         CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
         CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS c,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM cells),
tagged AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang ORDER BY source) AS rn_l,
         row_number() OVER (PARTITION BY source ORDER BY lang) AS rn_s
  FROM en),
agg AS (
  SELECT CAST(sum(CAST(floor(({mi_t}) * {g9} + 0.5) AS BIGINT)) AS BIGINT) AS mi9,
         CAST(sum(CAST(floor(({hl_t}) * {g9} + 0.5) AS BIGINT)) AS BIGINT) AS hl9,
         CAST(sum(CAST(floor(({hs_t}) * {g9} + 0.5) AS BIGINT)) AS BIGINT) AS hs9
  FROM tagged)
SELECT {mround(hl, 6)} AS h_lang,
       {mround(hs, 6)} AS h_source,
       {mround(mi, 6)} AS mi_nats,
       {mround(nmi, 6)} AS nmi
FROM agg
"""


AGG_MI_SQL = _mi_sql()

QUERIES["agg_mutual_information"] = QuerySpec(
    agg_mutual_information, AGG_MI_SQL, "aggregation"
)


# --- Theil-Sen robust trend of the monthly-revenue series ------------------


def agg_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate of monthly revenue: the (lower)
    median of all pairwise slopes between month points — the
    outlier-immune alternative to the OLS slope `agg_covar_regr` fits
    (one wild month moves OLS, but not the slope median; 29% breakdown
    point). Reported in dollars/month with the pair census.

    Exactness: months collapse to exact int64 cents totals on an integer
    month index; each pairwise slope is ONE division of exact integers
    (deterministic IEEE), and the median element is picked by row_number
    over the total order (slope, i, j) — a deterministic selection, never
    a float interpolation.

    Scale: orders reduce to the calendar-bounded month grid in one
    partial-agg groupBy; the pair self-join is quadratic only in CALENDAR
    months (~80 here, ~3k pairs; still only ~500k pairs after a century),
    so the all-pairs stage is bounded by time itself, not data. The
    selection runs on the pair table via one window."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.selectExpr(
            "year(o_orderdate) * 12 + month(o_orderdate) AS mi",
            f"{cents('o_totalprice', 100)} AS c",
        )
        .groupBy("mi")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = (
        a.join(b, F.col("a.mi") < F.col("b.mi"))
        .selectExpr(
            "a.mi AS mi",
            "b.mi AS mj",
            "CAST(b.c - a.c AS DOUBLE) / (b.mi - a.mi) AS slope",
        )
    )
    w = Window.orderBy("slope", "mi", "mj")
    ranked = (
        slopes.withColumn("rn", F.row_number().over(w))
        .withColumn("np", F.count("*").over(Window.partitionBy()))
    )
    med = ranked.filter(F.expr("rn = (np + 1) div 2"))
    n_months = monthly.agg(F.count("*").cast("bigint").alias("n_months"))
    return med.crossJoin(F.broadcast(n_months)).selectExpr(
        "n_months",
        "CAST(np AS BIGINT) AS n_pairs",
        mround("slope / 100", 4) + " AS sen_slope",
    )


AGG_THEIL_SEN_SQL = f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
         CAST(sum({cents('o_totalprice', 100)}) AS BIGINT) AS c
  FROM orders GROUP BY 1),
slopes AS (
  SELECT a.mi AS mi, b.mi AS mj,
         CAST(b.c - a.c AS DOUBLE) / (b.mi - a.mi) AS slope
  FROM monthly a JOIN monthly b ON a.mi < b.mi),
ranked AS (
  SELECT slope,
         row_number() OVER (ORDER BY slope, mi, mj) AS rn,
         count(*) OVER () AS np
  FROM slopes),
nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM monthly)
SELECT n_months, CAST(np AS BIGINT) AS n_pairs,
       {mround('slope / 100', 4)} AS sen_slope
FROM ranked, nm
WHERE rn = (np + 1) // 2
"""


QUERIES["agg_theil_sen_trend"] = QuerySpec(
    agg_theil_sen_trend, AGG_THEIL_SEN_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Exact higher moments: per-group skewness / excess kurtosis
# ---------------------------------------------------------------------------

def _moments_exprs() -> list[str]:
    """Shared dialect text deriving population skewness and excess kurtosis
    from EXACT int64 power sums (n, s1..s4). Every double below is produced
    from an int64 by one correctly-rounded cast, and the derivation text is
    character-identical on both engines, so the IEEE op sequence — and hence
    the pre-mround double — is bit-identical."""
    nD = "CAST(n AS DOUBLE)"
    m1 = f"(CAST(s1 AS DOUBLE) / {nD})"
    r2 = f"(CAST(s2 AS DOUBLE) / {nD})"
    r3 = f"(CAST(s3 AS DOUBLE) / {nD})"
    r4 = f"(CAST(s4 AS DOUBLE) / {nD})"
    m2 = f"({r2} - {m1} * {m1})"
    m3 = f"({r3} - 3 * {m1} * {r2} + 2 * {m1} * {m1} * {m1})"
    m4 = (
        f"({r4} - 4 * {m1} * {r3} + 6 * {m1} * {m1} * {r2}"
        f" - 3 * {m1} * {m1} * {m1} * {m1})"
    )
    return [
        "n",
        mround(m1, 6) + " AS mean_weeks",
        mround(m2, 6) + " AS var_pop",
        # g1 = m3 / m2^(3/2): sqrt is correctly rounded IEEE (unlike pow)
        mround(f"{m3} / ({m2} * sqrt({m2}))", 6) + " AS skewness",
        mround(f"{m4} / ({m2} * {m2}) - 3", 6) + " AS kurtosis_excess",
    ]


def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority skewness and excess kurtosis of order->ship latency
    (whole weeks): the distribution-shape diagnostics (third and fourth
    standardized moments) that mean/stddev profiling misses — the standard
    drift check for latency-shaped columns.

    Exactness: the subject is an integer (floor(gap_days / 7.0): float
    division by 7 then floor is exact at these magnitudes and floors toward
    -inf identically on both engines — Spark's `div` truncates toward zero
    on negatives, DuckDB's `//` floors, so integer division is NOT shared
    text here). Power sums s1..s4 accumulate as int64 — |weeks| <= 357 so
    s4 <= 357^4 * n ~= 2e18 per group even at sf100 — and the double
    derivation happens once per GROUP from exact integers (see
    :func:`_moments_exprs`). DuckDB's HUGEINT sums are cast back to BIGINT.

    Scale: one partial-aggregated groupBy on a 5-value key after an
    equi-join to orders (shuffle-hash at scale, broadcast below it); the
    moment algebra runs on the 5-row group table. Beyond sf100 the s4 sum
    outgrows int64: switch the accumulators to DECIMAL(38,0) (same grid,
    still exact) — documented, not silently wrong, and the weeks fold keeps
    headroom 20x beyond the fixture range."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    g = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .selectExpr(
            "o_orderpriority",
            "CAST(floor(datediff(l_shipdate, o_orderdate) / 7.0) AS BIGINT) AS w",
        )
    )
    sums = g.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("w").cast("bigint").alias("s1"),
        F.sum(F.expr("w * w")).cast("bigint").alias("s2"),
        F.sum(F.expr("w * w * w")).cast("bigint").alias("s3"),
        F.sum(F.expr("w * w * w * w")).cast("bigint").alias("s4"),
    )
    return sums.selectExpr("o_orderpriority", *_moments_exprs())


AGG_SKEW_KURT_SQL = f"""
WITH g AS (
  SELECT o_orderpriority,
         CAST(floor(datediff('day', o_orderdate, l_shipdate) / 7.0) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
sums AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(w) AS BIGINT) AS s1,
         CAST(sum(w * w) AS BIGINT) AS s2,
         CAST(sum(w * w * w) AS BIGINT) AS s3,
         CAST(sum(w * w * w * w) AS BIGINT) AS s4
  FROM g GROUP BY o_orderpriority)
SELECT o_orderpriority, {', '.join(_moments_exprs())}
FROM sums
"""


QUERIES["agg_skew_kurtosis"] = QuerySpec(
    agg_skew_kurtosis, AGG_SKEW_KURT_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (the significance sibling of Theil-Sen)
# ---------------------------------------------------------------------------

def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on monthly revenue: S = sum of
    sign(c_j - c_i) over all month pairs i<j, tie-corrected variance, and
    the normal-approximation Z — the nonparametric "is there a trend at
    all" gate that pairs with `agg_theil_sen_trend`'s "how steep" (same
    monthly substrate, same calendar-bounded pair join).

    Exactness: S, the pair census, the tie correction, and the variance
    NUMERATOR n(n-1)(2n+5) - sum t(t-1)(2t+5) are all exact int64 (month
    totals are exact cents, so sign() never sees a float); tau-b and Z are
    single fixed-text double expressions of those integers (Z divides by
    sqrt(num/18), continuity-corrected toward zero).

    Scale: orders partial-aggregate to the calendar month grid before
    anything quadratic; the pair stage is quadratic in CALENDAR months
    (~80 here, ~500k pairs after a century) — bounded by time, not data;
    the tie census is a groupBy over the same tiny table."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.selectExpr(
            "year(o_orderdate) * 12 + month(o_orderdate) AS mi",
            f"{cents('o_totalprice', 100)} AS c",
        )
        .groupBy("mi")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    s_stat = (
        a.join(b, F.col("a.mi") < F.col("b.mi"))
        .selectExpr(
            "CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sg"
        )
        .agg(
            F.sum("sg").cast("bigint").alias("s_stat"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
    )
    ties = (
        monthly.groupBy("c")
        .agg(F.count("*").alias("t"))
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("bigint").alias("tie_term"),
            F.sum("t").cast("bigint").alias("n_months"),
        )
    )
    z = (
        "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var_num / 18.0) "
        "WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var_num / 18.0) "
        "ELSE 0.0 END"
    )
    return (
        s_stat.crossJoin(F.broadcast(ties))
        .selectExpr(
            "n_months", "n_pairs", "s_stat",
            "n_months * (n_months - 1) * (2 * n_months + 5) - tie_term AS var_num",
        )
        .selectExpr(
            "n_months", "n_pairs", "s_stat", "var_num",
            mround("CAST(s_stat AS DOUBLE) / n_pairs", 6) + " AS tau",
            mround(z, 6) + " AS z_stat",
            f"CAST(CASE WHEN abs({z}) > 1.959964 THEN 1 ELSE 0 END AS BOOLEAN)"
            " AS significant_95",
        )
    )


def _mann_kendall_sql() -> str:
    z = (
        "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var_num / 18.0) "
        "WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var_num / 18.0) "
        "ELSE 0.0 END"
    )
    return f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
         CAST(sum({cents('o_totalprice', 100)}) AS BIGINT) AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM monthly a JOIN monthly b ON a.mi < b.mi),
ties AS (
  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
         CAST(sum(t) AS BIGINT) AS n_months
  FROM (SELECT count(*) AS t FROM monthly GROUP BY c) g),
m AS (
  SELECT n_months, n_pairs, s_stat,
         n_months * (n_months - 1) * (2 * n_months + 5) - tie_term AS var_num
  FROM s CROSS JOIN ties)
SELECT n_months, n_pairs, s_stat, var_num,
       {mround('CAST(s_stat AS DOUBLE) / n_pairs', 6)} AS tau,
       {mround(z, 6)} AS z_stat,
       CAST(CASE WHEN abs({z}) > 1.959964 THEN 1 ELSE 0 END AS BOOLEAN) AS significant_95
FROM m
"""


QUERIES["agg_mann_kendall"] = QuerySpec(
    agg_mann_kendall, _mann_kendall_sql(), "aggregation"
)


# ---------------------------------------------------------------------------
# Censored Kaplan-Meier (the statistically honest survival curve)
# ---------------------------------------------------------------------------

KM_CENSOR_WINDOW_HOURS = 12  # last seen within 12h of the horizon => censored


def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-CENSORED Kaplan-Meier user-lifetime survival (hour grid):
    users still active within 12 hours of the observation horizon have not
    churned — their lifetime is only known to be AT LEAST the observed
    span, so they leave the risk set without counting as deaths.
    `events_survival_curve` treats every user as fully observed (fine for
    a closed cohort, biased low for a live product); this is the estimator
    a retention analysis actually needs: S(t) = prod over event times
    u <= t of (1 - d_u/n_u).

    Exactness: spans and horizon gaps are integer ELAPSED hours from
    floored epoch seconds ((s2 - s1) div 3600 — engine date_diff('hour')
    counts boundary crossings and Spark has no hour datediff, so epoch
    arithmetic is the only shared-text form); death/censor counts and risk
    sets are integers (risk set = one suffix window sum over the span
    histogram); each factor is one fixed-text double division, and the
    cumulative product folds an ORDERED array identically in both engines
    (Spark aggregate() seeded with CAST(1 AS DOUBLE) — 1.0*x is exact —
    vs DuckDB list_reduce seeding with the first element: same op
    sequence).

    Scale: one groupBy(user) reduces the stream; everything after runs on
    the span histogram (observation-window-bounded, ~hundreds of rows at
    ANY corpus size) — the O(T^2) per-row array fold is quadratic only in
    distinct EVENT TIMES, bounded by the window, never by users."""
    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.expr(
            "CAST((unix_timestamp(max(ts)) - unix_timestamp(min(ts))) div 3600"
            " AS BIGINT)"
        ).alias("span_h"),
        F.expr("unix_timestamp(max(ts))").alias("last_s"),
    )
    horizon = e.agg(F.expr("unix_timestamp(max(ts))").alias("h_s"))
    tagged = spans.crossJoin(F.broadcast(horizon)).selectExpr(
        "span_h",
        f"CAST((h_s - last_s) div 3600 < {KM_CENSOR_WINDOW_HOURS} AS INT)"
        " AS censored",
    )
    hist = tagged.groupBy("span_h").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum(F.expr("1 - censored")).cast("bigint").alias("d"),
        F.sum("censored").cast("bigint").alias("c"),
    )
    w_risk = Window.orderBy(F.col("span_h").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = hist.withColumn("n_at_risk", F.sum("n_total").over(w_risk))
    steps = at_risk.filter(F.col("d") > 0).selectExpr(
        "span_h AS t", "d", "c", "n_at_risk",
        "CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / n_at_risk AS factor",
    )
    w_km = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (
        steps.withColumn("factors", F.collect_list("factor").over(w_km))
        .selectExpr(
            "t", "d", "c", "CAST(n_at_risk AS BIGINT) AS n_at_risk",
            mround("factor", 6) + " AS step_factor",
            mround(
                "aggregate(factors, CAST(1 AS DOUBLE), (acc, x) -> acc * x)", 6
            ) + " AS km_survival",
        )
    )


EVENTS_SURVIVAL_KM_SQL = f"""
WITH spans AS (
  SELECT user_id,
         (epoch_us(max(ts)) // 1000000 - epoch_us(min(ts)) // 1000000) // 3600
           AS span_h,
         epoch_us(max(ts)) // 1000000 AS last_s
  FROM events GROUP BY user_id),
horizon AS (SELECT epoch_us(max(ts)) // 1000000 AS h_s FROM events),
tagged AS (
  SELECT span_h,
         CAST((h_s - last_s) // 3600 < {KM_CENSOR_WINDOW_HOURS} AS INT)
           AS censored
  FROM spans CROSS JOIN horizon),
hist AS (
  SELECT span_h, CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(1 - censored) AS BIGINT) AS d,
         CAST(sum(censored) AS BIGINT) AS c
  FROM tagged GROUP BY span_h),
at_risk AS (
  SELECT *, sum(n_total) OVER (ORDER BY span_h DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
  FROM hist),
steps AS (
  SELECT span_h AS t, d, c, n_at_risk,
         CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / n_at_risk AS factor
  FROM at_risk WHERE d > 0),
folded AS (
  SELECT t, d, c, n_at_risk, factor,
         list(factor) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS factors
  FROM steps)
SELECT t, d, c, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       {mround('factor', 6)} AS step_factor,
       {mround('list_reduce(factors, (acc, x) -> acc * x)', 6)} AS km_survival
FROM folded
"""


QUERIES["events_survival_km"] = QuerySpec(
    events_survival_km, EVENTS_SURVIVAL_KM_SQL, "events"
)


# ---------------------------------------------------------------------------
# Permutation test (deterministic random-relabeling) — round 7
# ---------------------------------------------------------------------------

PERM_B = 60  # permutation replicates — one per bit of the 60-bit row hash


def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the mean l_extendedprice difference between the
    'R' and 'A' return-flag populations: the observed statistic is compared
    against PERM_B random-relabeling replicates, and the p-value is the
    add-one estimator (1 + #{b : |stat_b| ≥ |obs|}) / (B + 1) — the
    distribution-free significance test teams reach for when normality is
    dubious (this is the random-relabeling variant: group sizes are
    binomial per replicate rather than fixed, the standard large-sample
    simplification).

    Each row is hashed ONCE — md5(orderkey, linenumber) → a 60-bit
    integer — and replicate b's group assignment is simply BIT b of that
    hash (deterministic, no rand(); md5 bits are independent fair coins
    for this purpose, which is exactly why B is pinned to the 60 bits one
    15-hex-digit chunk yields). This is 60× fewer hashes than hashing
    (row, b): the original per-replicate-md5 form measured 29 s at sf0.1;
    the bit-sliced form is a few seconds, same statistics.

    Exactness: prices are exact cent integers; each group mean becomes
    integer MILLI-CENTS via (1000·sum) div count (truncating division,
    identical both engines; sum·1000 ≤ ~1e15 at sf0.1 — int64-safe with
    headroom to sf10, documented like `agg_spearman_corr`'s bound), so the
    |stat_b| ≥ |obs| comparison is pure integer arithmetic — no float
    boundary can flip a replicate between engines. The two final columns
    are presentation-only divisions.

    Scale: the whole test is ONE global aggregate over ONE scan — replicate
    b's group sums are the bit-sliced running sums s_b = Σ price·bit_b(h)
    and n_b = Σ bit_b(h) (the side-0 sums fall out of the totals: s0 = S −
    s_b, n0 = N − n_b), so each row contributes 2·B+4 map-side additions
    and the shuffle carries one 124-long buffer per partition — no row
    explosion, no per-replicate aggregation key, and the observed stat
    rides the same buffer. B is the knob; work is B× map arithmetic,
    constant reduce. (The prior explode(1..B) + groupBy(b) shape ran a
    second scan for the observed stat and materialized B× the input
    through the partial aggregate; at sf0.1 the single-pass form is
    modestly faster — 1.74 → 1.69 s — but needs codegen.maxFields ≥ 124
    (session.py) to stay in whole-stage codegen, and at scale it removes
    a full input pass plus the B× generated row flow.)"""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    hashed = l.selectExpr(
        "l_returnflag AS flag",
        f"{cents('l_extendedprice', 100)} AS price_c",
        "CAST(conv(substring(md5(concat(l_orderkey, '-', l_linenumber)),"
        " 1, 15), 16, 10) AS BIGINT) AS h",
    )
    bit_aggs = []
    for b in range(1, PERM_B + 1):
        bit = f"(shiftright(h, {b - 1}) & 1)"
        bit_aggs.append(F.sum(F.expr(f"price_c * {bit}")).alias(f"s{b}"))
        bit_aggs.append(F.sum(F.expr(bit)).alias(f"n{b}"))
    one = hashed.groupBy().agg(
        F.sum(F.expr("CASE WHEN flag = 'R' THEN price_c ELSE 0 END")).alias("sr"),
        F.sum(F.expr("CASE WHEN flag = 'R' THEN 1 ELSE 0 END")).alias("nr"),
        F.sum(F.expr("CASE WHEN flag = 'A' THEN price_c ELSE 0 END")).alias("sa"),
        F.sum(F.expr("CASE WHEN flag = 'A' THEN 1 ELSE 0 END")).alias("na"),
        *bit_aggs,
    )

    def stat_milli(b: int) -> str:
        # side-1 sums are the bit-sliced aggregates; side-0 sums derive
        # from the totals (every base row is R or A, so S = sr + sa)
        return (
            f"((1000 * s{b}) div n{b}"
            f" - (1000 * (sr + sa - s{b})) div (nr + na - n{b}))"
        )

    extreme = " + ".join(
        f"(CASE WHEN abs({stat_milli(b)}) >= abs(obs_milli) THEN 1 ELSE 0 END)"
        for b in range(1, PERM_B + 1)
    )
    return (
        one.selectExpr(
            "*", "(1000 * sr) div nr - (1000 * sa) div na AS obs_milli"
        )
        .selectExpr("nr", "na", "obs_milli", f"{extreme} AS n_extreme")
        .selectExpr(
            "CAST(nr AS BIGINT) AS n_r",
            "CAST(na AS BIGINT) AS n_a",
            "CAST(obs_milli AS DOUBLE) / 100000 AS obs_mean_diff",
            f"CAST({PERM_B} AS BIGINT) AS n_permutations",
            "CAST(n_extreme AS BIGINT) AS n_extreme",
            mround(f"CAST(1 + n_extreme AS DOUBLE) / {PERM_B + 1}", 6)
            + " AS p_value",
        )
    )


AGG_PERMUTATION_SQL = f"""
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
         {cents('l_extendedprice', 100)} AS price_c
  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
obs AS (
  SELECT CAST(sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS obs_n_r,
         CAST(sum(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS obs_n_a,
         CAST((1000 * sum(CASE WHEN flag = 'R' THEN price_c ELSE 0 END))
              // sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END)
            - (1000 * sum(CASE WHEN flag = 'A' THEN price_c ELSE 0 END))
              // sum(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS obs_milli
  FROM base),
hashed AS (
  SELECT price_c,
         CAST(('0x' || substring(md5(l_orderkey || '-' || l_linenumber),
               1, 15)) AS BIGINT) AS h
  FROM base),
perms AS (
  SELECT u.b, price_c, (h >> (u.b - 1)) & 1 AS side
  FROM hashed, unnest(generate_series(1, {PERM_B})) AS u(b)),
stats AS (
  SELECT b,
         CAST((1000 * sum(CASE WHEN side = 1 THEN price_c ELSE 0 END))
              // sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
            - (1000 * sum(CASE WHEN side = 0 THEN price_c ELSE 0 END))
              // sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS stat_milli
  FROM perms GROUP BY b)
SELECT o.obs_n_r AS n_r, o.obs_n_a AS n_a,
       CAST(o.obs_milli AS DOUBLE) / 100000 AS obs_mean_diff,
       CAST({PERM_B} AS BIGINT) AS n_permutations,
       CAST(sum(CASE WHEN abs(s.stat_milli) >= abs(o.obs_milli)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       {mround(f'CAST(1 + sum(CASE WHEN abs(s.stat_milli) >= abs(o.obs_milli) '
               f'THEN 1 ELSE 0 END) AS DOUBLE) / {PERM_B + 1}', 6)} AS p_value
FROM stats s CROSS JOIN obs o
GROUP BY o.obs_n_r, o.obs_n_a, o.obs_milli
"""


QUERIES["agg_permutation_test"] = QuerySpec(
    agg_permutation_test, AGG_PERMUTATION_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Peak detection over the hourly series — round 7
# ---------------------------------------------------------------------------

PEAK_NEIGHBORS = 2  # strictly greater than this many hours on EACH side
PEAK_MIN_HEIGHT = 3  # absolute floor: peaks below this are noise


def window_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection over the zero-filled hourly event-rate
    series: an hour is a peak iff its count is strictly greater than each
    of the PEAK_NEIGHBORS hours on BOTH sides (strict > makes plateaus
    peakless — deterministic, no tie arbitration) and meets the
    PEAK_MIN_HEIGHT floor. Each peak reports its prominence proxy (height
    minus the larger of the two adjacent valleys, here the min over the
    neighbor window on each side) — the load-spike / campaign-launch
    detector that CUSUM's mean-shift framing misses (a symmetric spike
    leaves the mean fast, a level shift does not leave peaks).

    Exactness: counts are integers, all comparisons are integer lag/lead
    comparisons — nothing to round.

    Scale: the corpus collapses to the calendar-bounded hourly table in
    one partial-agg groupBy; the neighbor windows run over THAT series
    (bounded by wall-clock hours), each an O(1)-state lag/lead frame."""
    dense = _dense_hourly(spark, sf_dir)
    w = Window.orderBy("hidx")
    wl = Window.orderBy("hidx").rowsBetween(-PEAK_NEIGHBORS, -1)
    wr = Window.orderBy("hidx").rowsBetween(1, PEAK_NEIGHBORS)
    flagged = dense.select(
        "hidx",
        "n",
        F.max("n").over(wl).alias("max_l"),
        F.max("n").over(wr).alias("max_r"),
        F.min("n").over(wl).alias("min_l"),
        F.min("n").over(wr).alias("min_r"),
        F.count("*").over(wl).alias("n_l"),
        F.count("*").over(wr).alias("n_r"),
    )
    return flagged.filter(
        (F.col("n_l") == PEAK_NEIGHBORS)
        & (F.col("n_r") == PEAK_NEIGHBORS)
        & (F.col("n") > F.col("max_l"))
        & (F.col("n") > F.col("max_r"))
        & (F.col("n") >= PEAK_MIN_HEIGHT)
    ).selectExpr(
        "hidx",
        "n AS peak_height",
        "n - greatest(min_l, min_r) AS prominence",
    )


WINDOW_PEAK_DETECT_SQL = f"""
WITH {_dense_hourly_sql()},
flagged AS (
  SELECT hidx, n,
         max(n) OVER (ORDER BY hidx ROWS BETWEEN {PEAK_NEIGHBORS} PRECEDING AND 1 PRECEDING) AS max_l,
         max(n) OVER (ORDER BY hidx ROWS BETWEEN 1 FOLLOWING AND {PEAK_NEIGHBORS} FOLLOWING) AS max_r,
         min(n) OVER (ORDER BY hidx ROWS BETWEEN {PEAK_NEIGHBORS} PRECEDING AND 1 PRECEDING) AS min_l,
         min(n) OVER (ORDER BY hidx ROWS BETWEEN 1 FOLLOWING AND {PEAK_NEIGHBORS} FOLLOWING) AS min_r,
         count(*) OVER (ORDER BY hidx ROWS BETWEEN {PEAK_NEIGHBORS} PRECEDING AND 1 PRECEDING) AS n_l,
         count(*) OVER (ORDER BY hidx ROWS BETWEEN 1 FOLLOWING AND {PEAK_NEIGHBORS} FOLLOWING) AS n_r
  FROM dense)
SELECT hidx, n AS peak_height,
       CAST(n - greatest(min_l, min_r) AS BIGINT) AS prominence
FROM flagged
WHERE n_l = {PEAK_NEIGHBORS} AND n_r = {PEAK_NEIGHBORS}
  AND n > max_l AND n > max_r AND n >= {PEAK_MIN_HEIGHT}
"""


QUERIES["window_peak_detect"] = QuerySpec(
    window_peak_detect, WINDOW_PEAK_DETECT_SQL, "window"
)


# ---------------------------------------------------------------------------
# Markov removal-effect attribution — round 7
# ---------------------------------------------------------------------------

MARKOV_ATTR_K = 16  # bounded propagation horizon (steps)


def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016): each user's
    event stream, truncated at the FIRST purchase, is a journey
    start → e₁ → … → conv (purchase) or null (no purchase); a first-order
    transition matrix is fitted, and each channel's credit is its REMOVAL
    EFFECT — how much the start→conv absorption probability drops when the
    channel's node is removed (its inbound edges redirect to null, its
    outbound rows drop). This is the model-based attribution that fixes
    what the positional entries (`events_attribution_last_touch`/
    `_multi_touch`) cannot: a channel that only ever appears mid-journey
    still earns credit proportional to how much conversion actually
    depends on it.

    Both engines propagate the SAME MARKOV_ATTR_K bounded rounds, so the
    reported probability is exactly "P(convert within K steps)" — a
    documented bounded-horizon contract, not a convergence assumption
    (the `graph_label_propagation` fixed-round pattern). Probabilities
    are INTEGER 1e-9 units end-to-end: each round computes
    p'₉(s) = (Σ_t n(s,t)·p₉(t)) div n(s) — pure int64 products, sums and
    one truncating division per state, so no float reduction order exists
    anywhere; the two presentation divisions happen after round K.

    Scale: the corpus-sized work is one user-partitioned window pass
    (journey truncation + lag) and one partial-agg groupBy onto the
    ≤(|types|+2)² transition table; that matrix is MODEL state (the
    kmeans-centroid precedent), so the K rounds × ~6 scenarios run on
    ≤~40 integers driver-side. The oracle unrolls the same rounds as
    MATERIALIZED CTEs over the same tiny table."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = e.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    ).withColumn("rn", F.row_number().over(w))
    first_p = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("cut"))
    )
    j = (
        seq.join(first_p, "user_id", "left")
        .filter(F.col("cut").isNull() | (F.col("rn") <= F.col("cut")))
        .selectExpr(
            "user_id",
            "rn",
            "cut",
            "CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS state",
        )
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    steps = j.select(
        "user_id",
        "rn",
        "cut",
        "state",
        F.lag("state").over(wj).alias("prev"),
        F.lead("state").over(wj).alias("nxt"),
    )
    trans = (
        steps.selectExpr(
            "CASE WHEN prev IS NULL THEN 'start' ELSE prev END AS src_if_first",
            "prev",
            "state",
            "nxt",
            "cut",
        )
        .selectExpr(
            # start -> first state, plus every interior edge, plus the
            # null-termination of unconverted journeys — emitted as an array
            # of (src, dst) structs per row and exploded
            "CASE WHEN prev IS NULL THEN named_struct('src', 'start', 'dst', state)"
            " ELSE named_struct('src', prev, 'dst', state) END AS edge",
            "CASE WHEN nxt IS NULL AND state <> 'conv'"
            " THEN named_struct('src', state, 'dst', 'null') END AS term",
        )
        .selectExpr("explode(array(edge, term)) AS e")
        .filter("e IS NOT NULL")
        .groupBy(F.expr("e.src").alias("src"), F.expr("e.dst").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    rows = trans.collect()  # model-side: <= (|types|+2)^2 integers
    full = {(r["src"], r["dst"]): int(r["n"]) for r in rows}
    channels = sorted(
        {s for s, _ in full} | {d for _, d in full} - {"start", "conv", "null"}
    )
    channels = [c for c in channels if c not in ("start", "conv", "null")]

    def propagate(tr: dict) -> int:
        srcs = {s for s, _ in tr}
        n_s = {}
        for (s, _), n in tr.items():
            n_s[s] = n_s.get(s, 0) + n
        states = srcs | {d for _, d in tr} | {"conv", "null"}
        p9 = {s: (1_000_000_000 if s == "conv" else 0) for s in states}
        for _ in range(MARKOV_ATTR_K):
            new = {}
            for s in states:
                if s == "conv":
                    new[s] = 1_000_000_000
                elif s == "null" or s not in srcs:
                    new[s] = 0
                else:
                    new[s] = sum(n * p9[d] for (x, d), n in tr.items() if x == s) // n_s[s]
            p9 = new
        return p9.get("start", 0)

    p_full = propagate(full)
    out = []
    for c in channels:
        tr = {}
        for (s, d), n in full.items():
            if s == c:
                continue
            key = (s, "null" if d == c else d)
            tr[key] = tr.get(key, 0) + n
        p_rem = propagate(tr)
        # exactly mround(…, 6): floor(x*1e6 + 0.5)/1e6 on the same double
        eff = (
            None
            if p_full == 0
            else math.floor((p_full - p_rem) / p_full * 1e6 + 0.5) / 1e6
        )
        out.append((c, p_full / 1e9, p_rem / 1e9, eff))
    return spark.createDataFrame(
        out,
        "channel string, p_conv_full double, p_conv_removed double,"
        " removal_effect double",
    )


def _markov_attr_sql() -> str:
    rounds = []
    prev = "p0"
    for k in range(1, MARKOV_ATTR_K + 1):
        rounds.append(
            f"""p{k} AS MATERIALIZED (
  SELECT b.scen, b.state,
         CASE WHEN b.state = 'conv' THEN 1000000000
              WHEN b.state = 'null' OR b.n_s IS NULL THEN 0
              ELSE coalesce(a.num, 0) // b.n_s END AS p9
  FROM base b LEFT JOIN (
    SELECT t.scen, t.src AS state, CAST(sum(t.n * r.p9) AS BIGINT) AS num
    FROM strans t JOIN {prev} r ON r.scen = t.scen AND r.state = t.dst
    GROUP BY t.scen, t.src) a ON a.scen = b.scen AND a.state = b.state)"""
        )
        prev = f"p{k}"
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events),
firstp AS (
  SELECT user_id, min(rn) AS cut FROM seq
  WHERE event_type = 'purchase' GROUP BY user_id),
j AS (
  SELECT s.user_id, s.rn,
         CASE WHEN s.event_type = 'purchase' THEN 'conv' ELSE s.event_type END AS state
  FROM seq s LEFT JOIN firstp f USING (user_id)
  WHERE f.cut IS NULL OR s.rn <= f.cut),
steps AS (
  SELECT user_id, rn, state,
         lag(state) OVER (PARTITION BY user_id ORDER BY rn) AS prev,
         lead(state) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
  FROM j),
edges AS (
  SELECT CASE WHEN prev IS NULL THEN 'start' ELSE prev END AS src,
         state AS dst
  FROM steps
  UNION ALL
  SELECT state AS src, 'null' AS dst
  FROM steps WHERE nxt IS NULL AND state <> 'conv'),
trans AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM edges GROUP BY src, dst),
channels AS (
  SELECT DISTINCT s AS channel FROM (
    SELECT src AS s FROM trans UNION SELECT dst FROM trans) t
  WHERE s NOT IN ('start', 'conv', 'null')),
scens AS (
  -- scen is a UNIQUE label per scenario; chan carries the removed channel
  -- (NULL for the full scenario). The 'c:' prefix keeps an event_type
  -- literally named 'full' from colliding with the full-scenario label.
  SELECT 'full' AS scen, CAST(NULL AS VARCHAR) AS chan
  UNION ALL SELECT 'c:' || channel, channel FROM channels),
strans AS (
  SELECT sc.scen, t.src,
         CASE WHEN t.dst = sc.chan THEN 'null' ELSE t.dst END AS dst,
         CAST(sum(t.n) AS BIGINT) AS n
  FROM scens sc JOIN trans t ON sc.chan IS NULL OR t.src <> sc.chan
  GROUP BY 1, 2, 3),
base AS (
  SELECT s.scen, s.state, o.n_s
  FROM (SELECT scen, src AS state FROM strans
        UNION SELECT scen, dst FROM strans
        UNION SELECT scen, 'conv' FROM scens
        UNION SELECT scen, 'null' FROM scens) s
  LEFT JOIN (SELECT scen, src, CAST(sum(n) AS BIGINT) AS n_s
             FROM strans GROUP BY scen, src) o
    ON o.scen = s.scen AND o.src = s.state),
p0 AS MATERIALIZED (
  SELECT scen, state,
         CAST(CASE WHEN state = 'conv' THEN 1000000000 ELSE 0 END AS BIGINT) AS p9
  FROM base),
{",".join(rounds)}
SELECT c.channel,
       CAST(f.p9 AS DOUBLE) / 1000000000 AS p_conv_full,
       CAST(r.p9 AS DOUBLE) / 1000000000 AS p_conv_removed,
       CASE WHEN f.p9 = 0 THEN NULL
            ELSE {mround('CAST(f.p9 - r.p9 AS DOUBLE) / f.p9', 6)} END AS removal_effect
FROM channels c
JOIN p{MARKOV_ATTR_K} f ON f.scen = 'full' AND f.state = 'start'
JOIN p{MARKOV_ATTR_K} r ON r.scen = 'c:' || c.channel AND r.state = 'start'
"""


EVENTS_ATTRIBUTION_MARKOV_SQL = _markov_attr_sql()

QUERIES["events_attribution_markov"] = QuerySpec(
    events_attribution_markov, EVENTS_ATTRIBUTION_MARKOV_SQL, "events"
)


# ---------------------------------------------------------------------------
# One-way ANOVA over order priorities — round 9
# ---------------------------------------------------------------------------
#
# The reference could only express this as a bespoke reduce .so computing
# group moments (ref scope: src/tmapreduce/master/job.cc:45-77 — merge gives
# it per-key grouping, nothing more); here it is one conditional aggregate.

_ANOVA_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
# vq = exact cents <= ~5.6e7, so vq^2 <= ~3.2e15 fits int64 PER ROW but the
# SUM overflows past ~2.9e3 rows of max value — lane-split the sum instead:
# sum(vq^2 div 2^20) + sum(vq^2 % 2^20) stays exact to ~3e9 rows (the
# eval_pr_auc bit-slicing pattern); recombine in DOUBLE (one fixed IEEE
# expression over exact integer operands — deterministic on both engines).
_ANOVA_LANE = 1_048_576  # 2^20


def _anova_exprs(dialect: str) -> tuple[list[str], list[str]]:
    """Per-priority FILTER aggregates + the one-row derived expressions,
    shared text except integer division."""
    d = "div" if dialect == "spark" else "//"
    aggs = []
    for i, p in enumerate(_ANOVA_PRIORITIES):
        f = f"FILTER (WHERE o_orderpriority = '{p}')"
        aggs.append(f"CAST(count(*) {f} AS BIGINT) AS n{i}")
        aggs.append(f"CAST(coalesce(sum(vq) {f}, 0) AS BIGINT) AS s{i}")
        aggs.append(
            f"CAST(coalesce(sum((vq * vq) {d} {_ANOVA_LANE}) {f}, 0) AS BIGINT)"
            f" AS hi{i}"
        )
        aggs.append(
            f"CAST(coalesce(sum((vq * vq) % {_ANOVA_LANE}) {f}, 0) AS BIGINT)"
            f" AS lo{i}"
        )
    idx = range(len(_ANOVA_PRIORITIES))
    n_tot = " + ".join(f"n{i}" for i in idx)
    s_tot = " + ".join(f"s{i}" for i in idx)
    # fixed written order => deterministic IEEE sums on both engines
    sumsq = " + ".join(
        f"(CAST(hi{i} AS DOUBLE) * {_ANOVA_LANE} + CAST(lo{i} AS DOUBLE))"
        for i in idx
    )
    ssb_terms = " + ".join(
        f"(CASE WHEN n{i} > 0 THEN CAST(s{i} AS DOUBLE) * s{i} / n{i}"
        f" ELSE CAST(0 AS DOUBLE) END)"
        for i in idx
    )
    k = " + ".join(f"(CASE WHEN n{i} > 0 THEN 1 ELSE 0 END)" for i in idx)
    derived = [
        f"CAST({n_tot} AS BIGINT) AS n_total",
        f"CAST({k} AS BIGINT) AS k_groups",
        f"({sumsq}) AS sumsq",
        f"({ssb_terms}) AS ssb_grp",
        f"CAST({s_tot} AS BIGINT) AS s_tot",
    ]
    return aggs, derived


# one-row algebra over the derived columns (cents^2 -> dollars^2 via / 1e4)
_ANOVA_SSB = "(ssb_grp - CAST(s_tot AS DOUBLE) * s_tot / n_total) / 10000"
_ANOVA_SST = "(sumsq - CAST(s_tot AS DOUBLE) * s_tot / n_total) / 10000"
_ANOVA_SSW = f"(({_ANOVA_SST}) - ({_ANOVA_SSB}))"
_ANOVA_F = (
    f"(({_ANOVA_SSB}) / (k_groups - 1)) / (({_ANOVA_SSW}) / (n_total - k_groups))"
)


def _anova_out_exprs() -> list[str]:
    return [
        "n_total",
        "k_groups",
        mround(_ANOVA_SSB, 2) + " AS ss_between",
        mround(_ANOVA_SSW, 2) + " AS ss_within",
        mround(f"({_ANOVA_SSB}) / ({_ANOVA_SST})", 6) + " AS eta_squared",
        mround(_ANOVA_F, 6) + " AS f_stat",
    ]


def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of o_totalprice across the five order
    priorities — "does priority shift mean order value?", the k-group
    generalization of `agg_welch_ttest`'s two-sample read-out. Reports
    between/within sums of squares (dollars^2), eta^2 effect size, and F.

    Determinism: the only aggregates are integer — per-group n, sum(cents),
    and the LANE-SPLIT sum of squared cents (hi/lo int64 lanes, exact to
    ~3e9 rows; beyond that widen the lanes to DECIMAL(38,0)) — so reduction
    order is irrelevant; SSB/SSW/F are ONE fixed IEEE expression over those
    exact integers with the group terms summed in declared priority order.

    Scale: one partial-aggregated pass (FILTER conditional aggregation — no
    5-way shuffle, no per-group scan) onto a single row; the F algebra runs
    on that row."""
    aggs, derived = _anova_exprs("spark")
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority", f"{cents('o_totalprice', 100)} AS vq"
    )
    row = o.agg(*[F.expr(a) for a in aggs]).selectExpr(*derived)
    return row.selectExpr(*_anova_out_exprs())


def _anova_sql() -> str:
    aggs, derived = _anova_exprs("duck")
    return f"""
WITH cells AS (
  SELECT {", ".join(aggs)}
  FROM (SELECT o_orderpriority, {cents('o_totalprice', 100)} AS vq FROM orders) t),
row1 AS (SELECT {", ".join(derived)} FROM cells)
SELECT {", ".join(_anova_out_exprs())} FROM row1
"""


AGG_ANOVA_ONEWAY_SQL = _anova_sql()

QUERIES["agg_anova_oneway"] = QuerySpec(
    agg_anova_oneway, AGG_ANOVA_ONEWAY_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Difference-in-differences lift with placebo falsification — round 9
# ---------------------------------------------------------------------------
#
# Reference scope: the engine's reduce hook (src/tmapreduce/master/job.cc:45-77)
# gives per-key grouping only; a DiD is a bespoke two-pass .so there. Here the
# whole design — 2 groups x 3 periods of exact cell moments — is ONE
# conditional-aggregate pass and a fixed one-row IEEE readout.

# Period cuts in epoch micros (UTC): the synthetic events span 2024-01-01 ..
# 2024-01-30 at every SF, so the intervention lands mid-window and the
# placebo cut splits the pre-period. Integer literals on BOTH engines — no
# timezone or timestamp-literal semantics in the comparison path.
_DID_MID_US = 1_704_672_000_000_000  # 2024-01-08 00:00:00 UTC (placebo cut)
_DID_POST_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC (intervention)

_DID_TAGS = (("t", 1), ("c", 0))  # treatment = even user_id, control = odd


def _did_cell_aggs() -> list[str]:
    """The 12 FILTER cell aggregates — identical text in both dialects.
    per: 0 = early pre, 1 = late pre (placebo 'post'), 2 = post."""
    aggs = []
    for tag, g in _DID_TAGS:
        for p in (0, 1, 2):
            f = f"FILTER (WHERE treat = {g} AND per = {p})"
            aggs.append(f"CAST(count(*) {f} AS BIGINT) AS n_{tag}{p}")
            aggs.append(
                f"CAST(coalesce(sum(vq) {f}, 0) AS BIGINT) AS s_{tag}{p}"
            )
    return aggs


def _did_mean(tag: str, which: str) -> str:
    """Exact-integer cell mean in dollars: one fixed IEEE expression.
    which: 'pre' (both pre halves), 'pre1'/'pre2' (placebo halves), 'post'."""
    if which == "pre":
        return (
            f"(CAST(s_{tag}0 + s_{tag}1 AS DOUBLE) / 1000000"
            f" / (n_{tag}0 + n_{tag}1))"
        )
    p = {"pre1": 0, "pre2": 1, "post": 2}[which]
    return f"(CAST(s_{tag}{p} AS DOUBLE) / 1000000 / n_{tag}{p})"


_DID_ESTIMATE = (
    f"(({_did_mean('t', 'post')} - {_did_mean('t', 'pre')})"
    f" - ({_did_mean('c', 'post')} - {_did_mean('c', 'pre')}))"
)
_DID_PLACEBO = (
    f"(({_did_mean('t', 'pre2')} - {_did_mean('t', 'pre1')})"
    f" - ({_did_mean('c', 'pre2')} - {_did_mean('c', 'pre1')}))"
)


def _did_out_exprs() -> list[str]:
    return [
        "CAST(n_t0 + n_t1 AS BIGINT) AS n_treat_pre",
        "n_t2 AS n_treat_post",
        "CAST(n_c0 + n_c1 AS BIGINT) AS n_ctrl_pre",
        "n_c2 AS n_ctrl_post",
        mround(_did_mean("t", "pre"), 6) + " AS mean_treat_pre",
        mround(_did_mean("t", "post"), 6) + " AS mean_treat_post",
        mround(_did_mean("c", "pre"), 6) + " AS mean_ctrl_pre",
        mround(_did_mean("c", "post"), 6) + " AS mean_ctrl_post",
        mround(_DID_ESTIMATE, 6) + " AS did_estimate",
        mround(_DID_PLACEBO, 6) + " AS placebo_did",
    ]


def events_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences lift of mean purchase value — treatment =
    even ``user_id``, intervention at 2024-01-16 — with the standard placebo
    falsification (a fake intervention at 2024-01-08 inside the pre-period;
    a healthy design reads placebo ~ 0, and on this synthetic data both
    estimates read as null effects, which is the correct answer).

    Determinism: every cell is (count, sum of value-micros) — exact int64 —
    taken by 12 FILTER conditional aggregates in ONE pass; the cell means,
    the DiD contrast, and the placebo contrast are each a single fixed-text
    IEEE expression over those integers, so both engines run identical
    floating-point ops. Every shipped SF populates all six cells (purchase
    events from >= 15 users across the full January window); the means
    therefore never divide by zero.

    Scale: one partial-aggregated scan of the purchase slice onto a single
    12-column row — no shuffle wider than the 1-row aggregate, no per-group
    pass, no window. The design matrix (2 x 3) is fixed by the analysis, not
    the data, so the shape is identical at 100 TB."""
    e = load_table(spark, sf_dir, "events").where("event_type = 'purchase'")
    proj = e.selectExpr(
        "CASE WHEN (user_id % 2) = 0 THEN 1 ELSE 0 END AS treat",
        f"CASE WHEN unix_micros(ts) >= {_DID_POST_US} THEN 2"
        f" WHEN unix_micros(ts) >= {_DID_MID_US} THEN 1 ELSE 0 END AS per",
        f"{cents('value')} AS vq",
    )
    row = proj.agg(*[F.expr(a) for a in _did_cell_aggs()])
    return row.selectExpr(*_did_out_exprs())


def _did_sql() -> str:
    return f"""
WITH proj AS (
  SELECT CASE WHEN (user_id % 2) = 0 THEN 1 ELSE 0 END AS treat,
         CASE WHEN epoch_us(ts) >= {_DID_POST_US} THEN 2
              WHEN epoch_us(ts) >= {_DID_MID_US} THEN 1 ELSE 0 END AS per,
         {cents('value')} AS vq
  FROM events WHERE event_type = 'purchase'),
cells AS (SELECT {", ".join(_did_cell_aggs())} FROM proj)
SELECT {", ".join(_did_out_exprs())} FROM cells
"""


EVENTS_DID_LIFT_SQL = _did_sql()

QUERIES["events_did_lift"] = QuerySpec(events_did_lift, EVENTS_DID_LIFT_SQL, "events")


# ---------------------------------------------------------------------------
# Tukey HSD post-hoc contrasts — round 9 (rides the ANOVA cell moments)
# ---------------------------------------------------------------------------

_TUKEY_PAIRS = [
    (i, j)
    for i in range(len(_ANOVA_PRIORITIES))
    for j in range(len(_ANOVA_PRIORITIES))
    if i < j
]


def _tukey_cols(i: int, j: int) -> list[str]:
    """One pair's fixed-text readout columns over the ANOVA derived row
    (all-dialect shared). MSW is in dollars^2; mean diff in dollars; q is
    the studentized range statistic abs(diff) / sqrt(MSW/2 * (1/ni+1/nj))."""
    msw = f"(({_ANOVA_SSW}) / (n_total - k_groups))"

    def mean(k: int) -> str:
        return f"(CAST(s{k} AS DOUBLE) / n{k} / 100)"

    diff = f"({mean(i)} - {mean(j)})"
    se = (
        f"sqrt(({msw}) / 2 * (CAST(1 AS DOUBLE) / n{i}"
        f" + CAST(1 AS DOUBLE) / n{j}))"
    )
    return [
        f"'{_ANOVA_PRIORITIES[i]}' AS prio_a",
        f"'{_ANOVA_PRIORITIES[j]}' AS prio_b",
        f"CAST(n{i} AS BIGINT) AS n_a",
        f"CAST(n{j} AS BIGINT) AS n_b",
        mround(diff, 4) + " AS mean_diff",
        mround(f"abs({diff}) / ({se})", 6) + " AS q_stat",
    ]


def agg_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc pairwise contrasts after :func:`agg_anova_oneway`:
    for each of the 10 priority pairs, the mean order-value difference and
    the studentized-range statistic q = abs(diff) / sqrt(MSW/2*(1/ni+1/nj))
    — the "WHICH groups differ" readout the omnibus F cannot give.

    Rides the IDENTICAL exact-integer cell moments as the ANOVA (same
    `_anova_exprs`, same lane-split sum of squares), so one conditional
    partial-agg pass over orders feeds a 10-row pure-expression fan-out of
    the single derived row — the pair 'join' is literal text, not a plan
    operator, because the design (5 groups) is fixed by the analysis."""
    from functools import reduce

    aggs, derived = _anova_exprs("spark")
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority", f"{cents('o_totalprice', 100)} AS vq"
    )
    # keep the raw cells alongside the derived SS columns: the pair
    # readouts need n{i}/s{i} AND ssw/k_groups. The 1-row fold is
    # materialized so the 10-branch union reads it, not 10 re-scans of
    # orders (caught at 10 Exchanges / 20 HashAggregates pre-commit).
    row1 = (
        o.agg(*[F.expr(a) for a in aggs]).selectExpr("*", *derived).localCheckpoint()
    )
    return reduce(
        DataFrame.unionAll,
        [row1.selectExpr(*_tukey_cols(i, j)) for i, j in _TUKEY_PAIRS],
    )


def _tukey_sql() -> str:
    aggs, derived = _anova_exprs("duck")
    body = " UNION ALL ".join(
        "SELECT " + ", ".join(_tukey_cols(i, j)) + " FROM row1"
        for i, j in _TUKEY_PAIRS
    )
    return f"""
WITH cells AS (
  SELECT {", ".join(aggs)}
  FROM (SELECT o_orderpriority, {cents('o_totalprice', 100)} AS vq FROM orders) t),
row1 AS (SELECT *, {", ".join(derived)} FROM cells)
{body}
"""


AGG_TUKEY_HSD_SQL = _tukey_sql()

QUERIES["agg_tukey_hsd"] = QuerySpec(agg_tukey_hsd, AGG_TUKEY_HSD_SQL, "aggregation")


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment lift — round 9
# ---------------------------------------------------------------------------
#
# Pre-period purchase value as the covariate (Deng, Xu, Kohavi & Walker 2013):
# theta = cov(X, Y) / var(X) pooled, lift_adj = lift_raw - theta*(Xbar_t -
# Xbar_c), achieved variance ratio var(Y_adj)/var(Y) = 1 - rho^2.

# milli-dollar quantization: per-user period sums stay ~1e6 milli at the
# shipped SFs, so sum(x*x) <= ~1e15 over 1e3 users — int64-safe to ~8e6
# users at this magnitude; lane-split the squares (the agg_anova_oneway
# hi/lo pattern) or widen to DECIMAL(38,0) beyond.
_CUPED_UNIT = 1000


def events_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment lift of post-period purchase value
    (treatment = even user_id, the same assignment and 2024-01-16 cut as
    :func:`events_did_lift`): the industry-standard variance-reduction
    trick — regress out each user's PRE-period value (unaffected by
    treatment by construction) before comparing arms. Reports pooled theta,
    the covariate correlation rho, raw and adjusted lift, and the achieved
    variance ratio 1 - rho^2.

    Determinism: the unit table is per-user exact int64 (pre, post)
    milli-dollar sums over ONE corpus pass; every statistic is a fixed-text
    IEEE expression over the 1-row exact-integer moment fold (n, sums,
    squares, cross products via FILTER-less plain aggregates), so both
    engines run identical floating-point ops.

    Scale: groupBy(user_id) is the only corpus shuffle; the moment fold is
    a 1-row partial aggregate; the lift algebra runs on that row. Note
    lift_adj needs NO per-user adjusted values: mean(Y_adj | arm) folds to
    mean(Y|arm) - theta*(mean(X|arm) - anything-common), so arm means of
    exact integer sums suffice."""
    e = load_table(spark, sf_dir, "events").where("event_type = 'purchase'")
    per_user = (
        e.selectExpr(
            "user_id",
            f"CASE WHEN unix_micros(ts) >= {_DID_POST_US} THEN 0"
            f" ELSE {cents('value', _CUPED_UNIT)} END AS xq",
            f"CASE WHEN unix_micros(ts) >= {_DID_POST_US}"
            f" THEN {cents('value', _CUPED_UNIT)} ELSE 0 END AS yq",
        )
        .groupBy("user_id")
        .agg(F.sum("xq").alias("x"), F.sum("yq").alias("y"))
        .selectExpr(
            "CASE WHEN (user_id % 2) = 0 THEN 1 ELSE 0 END AS treat", "x", "y"
        )
    )
    mom = per_user.agg(*[F.expr(a) for a in _cuped_aggs()])
    return mom.selectExpr(*_cuped_out_exprs())


def _cuped_aggs() -> list[str]:
    aggs = [
        "CAST(count(*) AS BIGINT) AS n",
        "CAST(sum(x) AS BIGINT) AS sx",
        "CAST(sum(y) AS BIGINT) AS sy",
        "CAST(sum(x * x) AS BIGINT) AS sxx",
        "CAST(sum(y * y) AS BIGINT) AS syy",
        "CAST(sum(x * y) AS BIGINT) AS sxy",
    ]
    for tag, g in (("t", 1), ("c", 0)):
        f = f"FILTER (WHERE treat = {g})"
        aggs.append(f"CAST(count(*) {f} AS BIGINT) AS n_{tag}")
        aggs.append(f"CAST(coalesce(sum(x) {f}, 0) AS BIGINT) AS sx_{tag}")
        aggs.append(f"CAST(coalesce(sum(y) {f}, 0) AS BIGINT) AS sy_{tag}")
    return aggs


# centered second moments (milli^2) and the derived statistics, fixed text
_CUPED_CXX = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)"
_CUPED_CYY = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)"
_CUPED_CXY = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)"
_CUPED_THETA = f"({_CUPED_CXY} / {_CUPED_CXX})"
_CUPED_RHO = f"({_CUPED_CXY} / sqrt({_CUPED_CXX} * {_CUPED_CYY}))"
_CUPED_LIFT_RAW = (
    "((CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c) / 1000)"
)
_CUPED_LIFT_ADJ = (
    f"({_CUPED_LIFT_RAW} - {_CUPED_THETA}"
    " * ((CAST(sx_t AS DOUBLE) / n_t - CAST(sx_c AS DOUBLE) / n_c) / 1000))"
)


def _cuped_out_exprs() -> list[str]:
    return [
        "n AS n_users",
        "n_t AS n_treat",
        "n_c AS n_ctrl",
        mround(_CUPED_THETA, 6) + " AS theta",
        mround(_CUPED_RHO, 6) + " AS rho_pre_post",
        mround(_CUPED_LIFT_RAW, 6) + " AS lift_raw",
        mround(_CUPED_LIFT_ADJ, 6) + " AS lift_adjusted",
        mround(f"1 - ({_CUPED_RHO}) * ({_CUPED_RHO})", 6) + " AS var_ratio",
    ]


def _cuped_sql() -> str:
    return f"""
WITH per_user AS (
  SELECT CASE WHEN (user_id % 2) = 0 THEN 1 ELSE 0 END AS treat,
         CAST(sum(CASE WHEN epoch_us(ts) >= {_DID_POST_US} THEN 0
                       ELSE {cents('value', _CUPED_UNIT)} END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN epoch_us(ts) >= {_DID_POST_US}
                       THEN {cents('value', _CUPED_UNIT)} ELSE 0 END) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id),
mom AS (SELECT {", ".join(_cuped_aggs())} FROM per_user)
SELECT {", ".join(_cuped_out_exprs())} FROM mom
"""


EVENTS_CUPED_SQL = _cuped_sql()

QUERIES["events_cuped_lift"] = QuerySpec(events_cuped_lift, EVENTS_CUPED_SQL, "events")


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-Levene) variance-homogeneity test — round 9
# ---------------------------------------------------------------------------
#
# Completes the one-way family: Brown-Forsythe gates the ANOVA's
# equal-variance assumption, and its W statistic IS the one-way ANOVA F
# applied to z = abs(x - group median) — so the exact-integer cell machinery
# (_anova_exprs, lane-split squares) is reused verbatim on the z column.


def agg_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (median-based Levene) of order-value variance
    homogeneity across the five priorities — the assumption gate run BEFORE
    trusting `agg_anova_oneway`'s F: W = ANOVA-F of z = abs(x - median_g).
    Reports W with its degrees of freedom and the between/within sums of
    squares of z (dollars^2).

    Determinism: group medians are percentile_disc over exact integer cents
    (actual data values, no interpolation); z is exact int64; every cell
    moment rides the IDENTICAL lane-split machinery as the ANOVA, so the
    only cross-row reductions are integer sums and W is one fixed-text IEEE
    expression.

    Scale: one sort-based per-group exact median (5 groups) broadcast back
    over the scan, then one FILTER-conditional partial-agg pass onto a
    single row — the events_anomaly_mad two-pass clamp shape; swap
    approx_percentile for the median at cardinalities where the exact
    per-group sort dominates (rule logic unchanged)."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority", f"{cents('o_totalprice', 100)} AS raw_vq"
    )
    o.createOrReplaceTempView("_bf_orders")
    med = spark.sql(
        """SELECT o_orderpriority,
                  percentile_disc(0.5) WITHIN GROUP (ORDER BY raw_vq) AS med
           FROM _bf_orders GROUP BY o_orderpriority"""
    )
    # percentile_disc returns DOUBLE in Spark even over BIGINT input; the
    # disc median IS an actual data value, so the cast back is exact
    z = o.join(F.broadcast(med), "o_orderpriority").selectExpr(
        "o_orderpriority", "abs(raw_vq - CAST(med AS BIGINT)) AS vq"
    )
    aggs, derived = _anova_exprs("spark")
    row = z.agg(*[F.expr(a) for a in aggs]).selectExpr(*derived)
    return row.selectExpr(*_bf_out_exprs())


def _bf_out_exprs() -> list[str]:
    return [
        "n_total",
        "k_groups",
        "CAST(k_groups - 1 AS BIGINT) AS df1",
        "CAST(n_total - k_groups AS BIGINT) AS df2",
        mround(_ANOVA_SSB, 2) + " AS ss_between_z",
        mround(_ANOVA_SSW, 2) + " AS ss_within_z",
        mround(_ANOVA_F, 6) + " AS w_stat",
    ]


def _bf_sql() -> str:
    aggs, derived = _anova_exprs("duck")
    return f"""
WITH raw AS (
  SELECT o_orderpriority, {cents('o_totalprice', 100)} AS raw_vq FROM orders),
med AS (
  SELECT o_orderpriority, quantile_disc(raw_vq, 0.5) AS med
  FROM raw GROUP BY o_orderpriority),
z AS (
  SELECT r.o_orderpriority, abs(r.raw_vq - CAST(m.med AS BIGINT)) AS vq
  FROM raw r JOIN med m USING (o_orderpriority)),
cells AS (SELECT {", ".join(aggs)} FROM z),
row1 AS (SELECT {", ".join(derived)} FROM cells)
SELECT {", ".join(_bf_out_exprs())} FROM row1
"""


AGG_LEVENE_BF_SQL = _bf_sql()

QUERIES["agg_levene_brown_forsythe"] = QuerySpec(
    agg_levene_brown_forsythe, AGG_LEVENE_BF_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Kruskal-Wallis rank test — round 9
# ---------------------------------------------------------------------------
#
# The distribution-free sibling of agg_anova_oneway: when Brown-Forsythe
# rejects variance homogeneity (or the values are heavy-tailed), the rank
# test is the statistic a reviewer asks for next. Reference scope: ranks
# need a global order, which the reference's merge hook
# (src/tmapreduce/master/job.cc:45-66) only provides per-key — a global
# rank there is a bespoke two-job pipeline; here it is the weighted-median
# two-level sweep over the DISTINCT-VALUE table.

# Average ranks are kept in HALF-UNITS so they stay integers: for a distinct
# value v with cum_v values strictly below it and c_v ties, every tied row
# gets avg rank (cum_v + (c_v+1)/2), i.e. r2_v = 2*cum_v + c_v + 1 half-units.
_KW_GROUPS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_KW_BUCKET = 2048  # dollars DIV 2^11 — monotone in vq, ~270 buckets


def _kw_fold_exprs() -> list[str]:
    """One-row fold over the ranked distinct-value table: per-group counts
    and half-unit rank sums, the global count, and the tie-correction sum.
    Shared text both dialects (FILTER aggregates, integer arithmetic only).

    int64 bounds (documented, not silent): r2 <= 2n+1 and sum(c*r2) <=
    n*(2n+1), exact to n ~ 2.1e9 rows; the tie sum c_v^3 stays exact while
    the largest tie group is <= ~2e6 rows. Beyond either, widen the two
    accumulators to DECIMAL(38,0) — same grid, still exact."""
    aggs = []
    for i in range(len(_KW_GROUPS)):
        aggs.append(f"CAST(coalesce(sum(c{i}), 0) AS BIGINT) AS n{i}")
        aggs.append(f"CAST(coalesce(sum(c{i} * r2), 0) AS BIGINT) AS rs{i}")
    aggs.append("CAST(sum(c_v) AS BIGINT) AS n_total")
    aggs.append("CAST(sum(c_v * c_v * c_v - c_v) AS BIGINT) AS ties")
    return aggs


# H = 12/(n(n+1)) * SUM_g R_g^2/n_g - 3(n+1), with R_g = rs_g/2 half-units
# => R_g^2/n_g = rs_g^2 / (4*n_g). rs^2 overflows int64, so each group term
# is ONE double product over exact ints, summed in declared group order.
_KW_HTERMS = " + ".join(
    f"(CASE WHEN n{i} > 0 THEN CAST(rs{i} AS DOUBLE) * rs{i} / (4.0 * n{i})"
    f" ELSE CAST(0 AS DOUBLE) END)"
    for i in range(len(_KW_GROUPS))
)
_KW_K = " + ".join(
    f"(CASE WHEN n{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(_KW_GROUPS))
)
_KW_H = (
    f"(12.0 / (CAST(n_total AS DOUBLE) * (n_total + 1)) * ({_KW_HTERMS})"
    f" - 3 * CAST(n_total + 1 AS DOUBLE))"
)
_KW_C = (
    "(1 - CAST(ties AS DOUBLE)"
    " / (CAST(n_total AS DOUBLE) * n_total * n_total - n_total))"
)


def _kw_out_exprs() -> list[str]:
    k = f"CAST({_KW_K} AS BIGINT)"
    return [
        "n_total",
        f"{k} AS k_groups",
        "ties AS tie_sum",
        mround(_KW_H, 6) + " AS h_stat",
        mround(f"({_KW_H}) / {_KW_C}", 6) + " AS h_corrected",
        mround(f"(({_KW_H}) - ({k} - 1)) / (n_total - {k})", 6)
        + " AS epsilon_sq",
    ]


def _kw_value_aggs() -> list[str]:
    """Per-distinct-value cell aggregates (shared text)."""
    aggs = ["CAST(count(*) AS BIGINT) AS c_v"]
    for i, g in enumerate(_KW_GROUPS):
        aggs.append(
            f"CAST(coalesce(count(*) FILTER (WHERE o_orderpriority = '{g}'), 0)"
            f" AS BIGINT) AS c{i}"
        )
    return aggs


def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of order value (half-up whole dollars, so the
    data carries REAL tie groups at every SF) across the five order
    priorities — the rank-based (distribution-free) one-way location test,
    with exact mid-rank tie handling and the tie-corrected statistic.
    Reports H, the exact integer tie sum SUM(c^3 - c), the tie-corrected
    H/C, and the epsilon-squared effect size.

    Determinism: ranks never materialize per row. The fact collapses to the
    DISTINCT-VALUE table (exact integer dollars), each value's average rank
    is the INTEGER r2 = 2*cum + c + 1 in half-units, and every reduction is
    an int64 sum; H is one fixed-text IEEE expression with group terms in
    declared priority order (the agg_anova_oneway convention).

    Scale: one partial-aggregated groupBy collapses the scan to NDV(vq)
    rows (bounded by the dollar domain, ~5.5e5 values, NOT by row count).
    The exclusive cumulative count runs as the agg_weighted_median
    TWO-LEVEL sweep: in-bucket windows partitioned by a monotone value
    bucket (~270 balanced partitions), per-bucket totals prefix-summed on
    the ~270-row aggregate and broadcast back — no global single-task
    window ever sees the value table."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority", f"{cents('o_totalprice', 1)} AS vq"
    )
    # One scan: the NDV-bounded distinct-value table is materialized so the
    # offset branch and the ranked branch read the same blocks instead of
    # each re-aggregating the fact (2 scans / 7 Exchanges, measured).
    vals = (
        o.groupBy("vq")
        .agg(*[F.expr(a) for a in _kw_value_aggs()])
        .withColumn("pb", F.expr(f"vq div {_KW_BUCKET}"))
        .localCheckpoint()
    )
    wb = (
        Window.partitionBy("pb")
        .orderBy("vq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_cum = F.coalesce(F.sum("c_v").over(wb), F.lit(0))
    # per-bucket totals -> exclusive offsets over the ~230-row aggregate
    wo = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        vals.groupBy("pb")
        .agg(F.sum("c_v").alias("bw"))
        .select("pb", F.coalesce(F.sum("bw").over(wo), F.lit(0)).alias("off"))
    )
    ranked = (
        vals.withColumn("ic", in_cum)
        .join(F.broadcast(offsets), "pb")
        .withColumn("r2", F.expr("2 * (off + ic) + c_v + 1"))
    )
    row = ranked.agg(*[F.expr(a) for a in _kw_fold_exprs()])
    return row.selectExpr(*_kw_out_exprs())


def _kw_sql() -> str:
    return f"""
WITH r AS (
  SELECT o_orderpriority, {cents('o_totalprice', 1)} AS vq FROM orders),
vals AS (
  SELECT vq, {", ".join(_kw_value_aggs())} FROM r GROUP BY vq),
ranked AS (
  SELECT *, 2 * coalesce(sum(c_v) OVER (
               ORDER BY vq ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) + c_v + 1 AS r2
  FROM vals),
folded AS (SELECT {", ".join(_kw_fold_exprs())} FROM ranked)
SELECT {", ".join(_kw_out_exprs())} FROM folded
"""


AGG_KRUSKAL_WALLIS_SQL = _kw_sql()

QUERIES["agg_kruskal_wallis"] = QuerySpec(
    agg_kruskal_wallis, AGG_KRUSKAL_WALLIS_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Jarque-Bera normality test — round 9
# ---------------------------------------------------------------------------
#
# Completes the shape family: agg_skew_kurtosis reads the third/fourth
# moments, JB turns them into the normality gate JB = n/6*(g1^2 + g2^2/4)
# that decides between agg_anova_oneway (normal) and agg_kruskal_wallis
# (not). Same exact int64 power-sum machinery, different subject so the two
# entries don't share a plan: per-event-type integer-dollar values.


def _jb_out_exprs() -> list[str]:
    """Skewness/excess-kurtosis/JB from exact int64 power sums — the
    _moments_exprs derivation (one correctly-rounded cast per double,
    character-identical text both dialects) extended with the JB fold."""
    nD = "CAST(n AS DOUBLE)"
    m1 = f"(CAST(s1 AS DOUBLE) / {nD})"
    r2 = f"(CAST(s2 AS DOUBLE) / {nD})"
    r3 = f"(CAST(s3 AS DOUBLE) / {nD})"
    r4 = f"(CAST(s4 AS DOUBLE) / {nD})"
    m2 = f"({r2} - {m1} * {m1})"
    m3 = f"({r3} - 3 * {m1} * {r2} + 2 * {m1} * {m1} * {m1})"
    m4 = (
        f"({r4} - 4 * {m1} * {r3} + 6 * {m1} * {m1} * {r2}"
        f" - 3 * {m1} * {m1} * {m1} * {m1})"
    )
    g1 = f"({m3} / ({m2} * sqrt({m2})))"
    g2 = f"({m4} / ({m2} * {m2}) - 3)"
    jb = f"({nD} / 6 * ({g1} * {g1} + {g2} * {g2} / 4))"
    return [
        "event_type",
        "n",
        mround(g1, 6) + " AS skewness",
        mround(g2, 6) + " AS kurtosis_excess",
        mround(jb, 6) + " AS jb_stat",
    ]


def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of event value (whole dollars) per event
    type: JB = n/6 * (skew^2 + excess_kurtosis^2 / 4) — the cheap
    moment-based gate run before choosing parametric vs rank tests on a
    metric column. Large JB = reject normality.

    Exactness: the subject is floor(value) — exact IEEE on the cents-grid
    data — so the power sums s1..s4 accumulate as int64 (|w| <= ~500 here:
    s4 <= 500^4 * n ~ 6e10*n, exact to ~1.4e8 rows PER GROUP; beyond that
    lane-split s4 exactly as agg_anova_oneway splits its squares). The
    g1/g2/JB derivation is one fixed-text IEEE chain per group row.

    Scale: one FILTER-free partial-aggregated groupBy on the 5-value
    event_type key; the moment algebra runs on the 5-row group table."""
    e = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(floor(value) AS BIGINT) AS w"
    )
    sums = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("w").cast("bigint").alias("s1"),
        F.sum(F.expr("w * w")).cast("bigint").alias("s2"),
        F.sum(F.expr("w * w * w")).cast("bigint").alias("s3"),
        F.sum(F.expr("w * w * w * w")).cast("bigint").alias("s4"),
    )
    return sums.selectExpr(*_jb_out_exprs()).orderBy("event_type")


AGG_JARQUE_BERA_SQL = f"""
WITH g AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS w FROM events),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(w) AS BIGINT) AS s1,
         CAST(sum(w * w) AS BIGINT) AS s2,
         CAST(sum(w * w * w) AS BIGINT) AS s3,
         CAST(sum(w * w * w * w) AS BIGINT) AS s4
  FROM g GROUP BY event_type)
SELECT {', '.join(_jb_out_exprs())}
FROM sums ORDER BY event_type
"""


QUERIES["agg_jarque_bera"] = QuerySpec(
    agg_jarque_bera, AGG_JARQUE_BERA_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test — round 9
# ---------------------------------------------------------------------------
#
# Completes the time-series family: events_autocorrelation reports the ACF,
# Ljung-Box turns it into the whiteness gate Q = n(n+2) * SUM r_k^2/(n-k) a
# forecaster checks on residuals (and seasonality hunters on the raw rate).
# The textbook r_k uses the FULL-series mean and c_0 denominator, so this is
# not a re-read of the ACF entry's per-lag Pearson — different statistic,
# same reduced-series discipline.

_LB_MAX_LAG = 12


def _lb_nck(k_expr: str) -> str:
    """n^2 * c_k from exact integer sums (shared text): c_k =
    sum_t (x_t - m)(x_{t+k} - m) over the n-k overlap pairs with the
    full-series mean m = S/n; multiplied through by n^2 every term is
    int64 (bound documented in the docstring)."""
    return (
        f"(n_obs * n_obs * sxy - n_obs * s_all * (sxh + sxt)"
        f" + (n_obs - {k_expr}) * s_all * s_all)"
    )


_LB_NC0 = "(n_obs * n_obs * sxx_all - n_obs * s_all * s_all)"
# per-lag term r_k^2 / (n-k) pre-rounded onto the 1e-12 grid (each term is
# <= 1 so int64 has 6 decades of headroom) so the 12-term sum is an integer
# reduction; the fine grid matters because Q multiplies the sum by n(n+2)
# (~5e5 at 720 hours), which would amplify a 1e-9 grid into the 4th decimal
_LB_T12 = (
    "CAST(floor((CAST({nck} AS DOUBLE) / {nc0})"
    " * (CAST({nck} AS DOUBLE) / {nc0}) / (n_obs - lag)"
    " * 1000000000000 + 0.5) AS BIGINT)"
).format(nck=_lb_nck("lag"), nc0=_LB_NC0)


def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test on the dense hourly event-rate
    series at lags 1..12: Q = n(n+2) * SUM_k r_k^2/(n-k) with the textbook
    fixed-mean autocorrelations r_k = c_k/c_0 — the "is there ANY serial
    structure" gate read before trusting `events_autocorrelation`'s
    individual coefficients or fitting `window_holt_forecast`.

    Exactness: counts are integers, so n^2*c_k expands to pure int64
    arithmetic (exact while n^2 * sum(x_t*x_{t+k}) < 9e18 — hourly totals
    to ~3.7e6 events/hour on a 30-day window; beyond, DECIMAL(38,0));
    each lag's r_k^2/(n-k) is a fixed IEEE chain pre-rounded onto the 1e-12
    integer grid, so the 12-term reduction is an integer sum.

    Scale: identical to the ACF entry — one corpus-sized groupBy builds the
    hourly rollup (materialized, so the spine/global/lag consumers share
    it); the lag self-join and all algebra run on calendar-bounded rows."""
    dense = _dense_hourly(spark, sf_dir).localCheckpoint()
    glob = dense.agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum("n").cast("bigint").alias("s_all"),
        F.sum(F.expr("n * n")).cast("bigint").alias("sxx_all"),
    )
    lags = spark.range(1, _LB_MAX_LAG + 1).selectExpr("CAST(id AS BIGINT) AS lag")
    a = dense.selectExpr("hidx", "n AS x")
    b = dense.selectExpr("hidx AS hidx_b", "n AS y")
    per_lag = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("hidx + lag = hidx_b"))
        .groupBy("lag")
        .agg(
            F.sum("x").cast("bigint").alias("sxh"),
            F.sum("y").cast("bigint").alias("sxt"),
            F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
        )
    )
    folded = (
        per_lag.crossJoin(F.broadcast(glob))
        .selectExpr("n_obs", f"{_LB_T12} AS t9")
        .groupBy()
        .agg(
            F.max("n_obs").cast("bigint").alias("n_obs"),
            F.sum("t9").cast("bigint").alias("s9"),
        )
    )
    return folded.selectExpr(
        "n_obs",
        f"CAST({_LB_MAX_LAG} AS BIGINT) AS h_lags",
        mround(
            "CAST(n_obs AS DOUBLE) * (n_obs + 2) * s9 / 1000000000000", 6
        )
        + " AS q_stat",
    )


def _lb_sql() -> str:
    return f"""
WITH {_dense_hourly_sql()},
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(n) AS BIGINT) AS s_all,
         CAST(sum(n * n) AS BIGINT) AS sxx_all
  FROM dense),
lags AS (SELECT CAST(unnest(generate_series(1, {_LB_MAX_LAG})) AS BIGINT) AS lag),
per_lag AS (
  SELECT lag, CAST(sum(a.n) AS BIGINT) AS sxh,
         CAST(sum(b.n) AS BIGINT) AS sxt,
         CAST(sum(a.n * b.n) AS BIGINT) AS sxy
  FROM dense a CROSS JOIN lags JOIN dense b ON a.hidx + lag = b.hidx
  GROUP BY lag),
folded AS (
  SELECT CAST(max(n_obs) AS BIGINT) AS n_obs, CAST(sum({_LB_T12}) AS BIGINT) AS s9
  FROM per_lag CROSS JOIN gstats)
SELECT n_obs, CAST({_LB_MAX_LAG} AS BIGINT) AS h_lags,
       {mround("CAST(n_obs AS DOUBLE) * (n_obs + 2) * s9 / 1000000000000", 6)} AS q_stat
FROM folded
"""


EVENTS_LJUNG_BOX_SQL = _lb_sql()

QUERIES["events_ljung_box"] = QuerySpec(
    events_ljung_box, EVENTS_LJUNG_BOX_SQL, "events"
)


# ---------------------------------------------------------------------------
# Friedman blocked rank test — round 9
# ---------------------------------------------------------------------------
#
# The blocked sibling of agg_kruskal_wallis: months are blocks, priorities
# are treatments, and the ranking happens WITHIN each block, so month-level
# level shifts (seasonality, growth) cancel by construction — the
# repeated-measures shape KW cannot express.


def agg_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman chi-square test of mean order value across the five
    priorities, blocked by order month: within each COMPLETE month block
    (all five priorities present) the priorities are ranked by their cell
    mean, and chi2 = 12/(b*k*(k+1)) * SUM_j R_j^2 - 3*b*(k+1); also reports
    Kendall's W = chi2 / (b*(k-1)) agreement. Ranks are row_number over a
    deterministic total order (one fixed IEEE division of exact integer
    cell sums, priority label as tiebreak), so every reduction below the
    cell table is pure int64.

    Scale: ONE partial-aggregated groupBy collapses the fact to the
    (month x priority) cell table (bounded by the calendar, not rows);
    ranking windows, completeness filter, and the chi-square fold all run
    on that reduced table."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "date_format(o_orderdate, 'yyyy-MM') AS m",
        "o_orderpriority AS p",
        f"{cents('o_totalprice', 100)} AS vq",
    )
    cells = o.groupBy("m", "p").agg(
        F.count("*").cast("bigint").alias("c"),
        F.sum("vq").cast("bigint").alias("s"),
    )
    k = len(_KW_GROUPS)
    wm = Window.partitionBy("m")
    complete = cells.withColumn("kb", F.count("*").over(wm)).filter(f"kb = {k}")
    wr = Window.partitionBy("m").orderBy(
        F.expr("CAST(s AS DOUBLE) / c"), F.col("p")
    )
    ranked = complete.withColumn("r", F.row_number().over(wr).cast("bigint"))
    # each priority appears exactly once per complete block, so the
    # per-priority row count IS b
    rj = ranked.groupBy("p").agg(
        F.sum("r").cast("bigint").alias("rj"),
        F.count("*").cast("bigint").alias("b"),
    )
    fold = rj.groupBy().agg(
        F.max("b").cast("bigint").alias("b_blocks"),
        F.count("*").cast("bigint").alias("k_treatments"),
        F.sum(F.expr("rj * rj")).cast("bigint").alias("rj2"),
    )
    return fold.selectExpr("b_blocks", "k_treatments", *_friedman_exprs())


def _friedman_exprs() -> list[str]:
    """chi2 and Kendall's W from (b_blocks, k_treatments, rj2) — shared
    fixed-IEEE text both dialects over exact int64 operands."""
    chi2 = (
        "(12.0 / (CAST(b_blocks AS DOUBLE) * k_treatments"
        " * (k_treatments + 1)) * rj2"
        " - 3 * CAST(b_blocks AS DOUBLE) * (k_treatments + 1))"
    )
    return [
        mround(chi2, 6) + " AS chi2_stat",
        mround(f"{chi2} / (CAST(b_blocks AS DOUBLE) * (k_treatments - 1))", 6)
        + " AS kendall_w",
    ]


def _friedman_sql() -> str:
    k = len(_KW_GROUPS)
    return f"""
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS m, o_orderpriority AS p,
         {cents('o_totalprice', 100)} AS vq
  FROM orders),
cells AS (
  SELECT m, p, CAST(count(*) AS BIGINT) AS c, CAST(sum(vq) AS BIGINT) AS s
  FROM o GROUP BY m, p),
complete AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY m) AS kb FROM cells) t
  WHERE kb = {k}),
ranked AS (
  SELECT p, CAST(row_number() OVER (PARTITION BY m
           ORDER BY CAST(s AS DOUBLE) / c, p) AS BIGINT) AS r
  FROM complete),
rj AS (
  SELECT p, CAST(sum(r) AS BIGINT) AS rj, CAST(count(*) AS BIGINT) AS b
  FROM ranked GROUP BY p),
folded AS (
  SELECT CAST(max(b) AS BIGINT) AS b_blocks,
         CAST(count(*) AS BIGINT) AS k_treatments,
         CAST(sum(rj * rj) AS BIGINT) AS rj2
  FROM rj)
SELECT b_blocks, k_treatments, {", ".join(_friedman_exprs())}
FROM folded
"""


AGG_FRIEDMAN_SQL = _friedman_sql()

QUERIES["agg_friedman"] = QuerySpec(agg_friedman, AGG_FRIEDMAN_SQL, "aggregation")


# ---------------------------------------------------------------------------
# Grubbs outlier statistic — round 9
# ---------------------------------------------------------------------------


def _grubbs_exprs() -> list[str]:
    """G = max|x - mean| / sd from the one-pass exact sums (n, s1, s2,
    mn, mx): max|x - mean| = max(mx - mean, mean - mn), so no second pass
    ever happens. Shared fixed-IEEE text both dialects; sd is the sample
    (n-1) form Grubbs specifies."""
    m = "(CAST(s1 AS DOUBLE) / n)"
    var = f"((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))"
    dev = f"(CASE WHEN (mx - {m}) >= ({m} - mn) THEN mx - {m} ELSE {m} - mn END)"
    return [
        "n",
        mround(f"{m} / 100", 2) + " AS mean_price",
        mround(f"sqrt({var}) / 100", 6) + " AS sd_price",
        mround(f"{dev} / sqrt({var})", 6) + " AS g_stat",
        f"CASE WHEN (mx - {m}) >= ({m} - mn) THEN 'upper' ELSE 'lower' END"
        " AS tail",
    ]


def agg_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs outlier statistic per order priority: G = max|x - mean|/sd
    over exact integer cents — the single-outlier screen run on a metric
    column before trusting its mean, completing the outlier family beside
    the rolling MAD flag (`window_rolling_mad_flag`) and the z-score
    embedding screen (`embedding_outlier_zscore`). Reports G and which
    tail carries it.

    Exactness and scale: ONE partial-aggregated pass collects n, sum,
    min, max, and the sum of squared cents in the hi/lo int64 LANES of
    agg_anova_oneway (a flat sum of vq^2 <= 3.2e15 per row would overflow
    past ~3e3 rows; the lanes stay exact to ~3e9); max|x - mean| needs
    only the group min/max, so there is no second pass and no per-row
    deviation ever materializes."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority", f"{cents('o_totalprice', 100)} AS vq"
    )
    lane = _ANOVA_LANE
    sums = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("vq").cast("bigint").alias("s1"),
        F.sum(F.expr(f"(vq * vq) div {lane}")).cast("bigint").alias("hi"),
        F.sum(F.expr(f"(vq * vq) % {lane}")).cast("bigint").alias("lo"),
        F.min("vq").cast("bigint").alias("mn"),
        F.max("vq").cast("bigint").alias("mx"),
    )
    recomb = sums.selectExpr(
        "o_orderpriority", "n", "s1", "mn", "mx",
        f"CAST(hi AS DOUBLE) * {lane} + CAST(lo AS DOUBLE) AS s2",
    )
    return recomb.selectExpr("o_orderpriority", *_grubbs_exprs()).orderBy(
        "o_orderpriority"
    )


AGG_GRUBBS_SQL = f"""
WITH o AS (
  SELECT o_orderpriority, {cents('o_totalprice', 100)} AS vq FROM orders),
sums AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(vq) AS BIGINT) AS s1,
         CAST(sum((vq * vq) // {_ANOVA_LANE}) AS BIGINT) AS hi,
         CAST(sum((vq * vq) % {_ANOVA_LANE}) AS BIGINT) AS lo,
         CAST(min(vq) AS BIGINT) AS mn,
         CAST(max(vq) AS BIGINT) AS mx
  FROM o GROUP BY o_orderpriority),
recomb AS (
  SELECT o_orderpriority, n, s1, mn, mx,
         CAST(hi AS DOUBLE) * {_ANOVA_LANE} + CAST(lo AS DOUBLE) AS s2
  FROM sums)
SELECT o_orderpriority, {", ".join(_grubbs_exprs())}
FROM recomb ORDER BY o_orderpriority
"""


QUERIES["agg_grubbs_test"] = QuerySpec(agg_grubbs_test, AGG_GRUBBS_SQL, "aggregation")


# ---------------------------------------------------------------------------
# Peak-over-threshold tail profile — round 9
# ---------------------------------------------------------------------------


def events_peak_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-over-threshold (POT) tail profile per event type: the exact p90
    of the value distribution as the threshold u, then the exceedance count,
    mean excess E[X - u | X > u], and max — the extreme-value-theory readout
    (a roughly constant mean-excess curve signals exponential tails; a
    growing one, heavy/Pareto tails) behind alert-threshold and capacity
    decisions.

    Determinism: values quantize to exact integer micro; u is
    percentile_disc (an actual data value, no interpolation); the excess
    sums are int64; the mean excess is one fixed IEEE division.

    Scale: pass 1 computes the per-group exact disc p90 (5 groups, sort-
    based); the 5-row threshold table broadcasts back over the scan for one
    FILTER-conditional partial-agg pass — the events_anomaly_mad /
    Brown-Forsythe two-pass clamp shape."""
    e = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", f"{cents('value')} AS vq"
    )
    e.createOrReplaceTempView("_pot_events")
    thr = spark.sql(
        """SELECT event_type,
                  percentile_disc(0.9) WITHIN GROUP (ORDER BY vq) AS u
           FROM _pot_events GROUP BY event_type"""
    )
    # percentile_disc returns DOUBLE over BIGINT input; disc = an actual
    # data value, so the cast back is exact (the Brown-Forsythe precedent)
    j = e.join(F.broadcast(thr), "event_type").selectExpr(
        "event_type", "vq", "CAST(u AS BIGINT) AS uq"
    )
    agg = j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("uq").cast("bigint").alias("uq"),
        F.expr("count(*) FILTER (WHERE vq > uq)").cast("bigint").alias("n_exceed"),
        F.expr("coalesce(sum(vq - uq) FILTER (WHERE vq > uq), 0)")
        .cast("bigint")
        .alias("excess_sum"),
        F.max("vq").cast("bigint").alias("mxq"),
    )
    return agg.selectExpr(
        "event_type",
        "n",
        "n_exceed",
        "CAST(uq AS DOUBLE) / 1000000 AS threshold_p90",
        mround("CAST(excess_sum AS DOUBLE) / 1000000 / n_exceed", 6)
        + " AS mean_excess",
        "CAST(mxq AS DOUBLE) / 1000000 AS max_value",
    ).orderBy("event_type")


EVENTS_POT_SQL = f"""
WITH e AS (
  SELECT event_type, {cents('value')} AS vq FROM events),
thr AS (
  SELECT event_type, quantile_disc(vq, 0.9) AS u
  FROM e GROUP BY event_type),
j AS (
  SELECT e.event_type, vq, CAST(u AS BIGINT) AS uq
  FROM e JOIN thr USING (event_type)),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(max(uq) AS BIGINT) AS uq,
         CAST(count(*) FILTER (WHERE vq > uq) AS BIGINT) AS n_exceed,
         CAST(coalesce(sum(vq - uq) FILTER (WHERE vq > uq), 0) AS BIGINT)
           AS excess_sum,
         CAST(max(vq) AS BIGINT) AS mxq
  FROM j GROUP BY event_type)
SELECT event_type, n, n_exceed,
       CAST(uq AS DOUBLE) / 1000000 AS threshold_p90,
       {mround("CAST(excess_sum AS DOUBLE) / 1000000 / n_exceed", 6)} AS mean_excess,
       CAST(mxq AS DOUBLE) / 1000000 AS max_value
FROM agg ORDER BY event_type
"""


QUERIES["events_peak_over_threshold"] = QuerySpec(
    events_peak_over_threshold, EVENTS_POT_SQL, "events"
)


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test — round 9
# ---------------------------------------------------------------------------
#
# Completes the rank-test family: Mann-Whitney (two independent samples),
# Kruskal-Wallis (k groups), Friedman (blocked k), and now the PAIRED
# two-sample member — months pair the observations, the subject is the
# URGENT-vs-LOW monthly median order value.

_WSR_A = "1-URGENT"
_WSR_B = "5-LOW"


def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of paired monthly medians: for each order
    month, d = median(URGENT order cents) - median(LOW order cents) —
    medians are percentile_disc actual data values, so every d is an EXACT
    int64 — zero differences drop (the textbook treatment), |d| gets
    mid-rank average ranks in integer half-units (the agg_kruskal_wallis
    trick), and the readout is W+, W-, the exact tie sum, and the
    tie-corrected normal approximation
    z = (W+ - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 - T/48).

    Scale: one partial-agg groupBy to (month, priority) cells, exact
    per-cell disc medians via one sort-based aggregate, then ALL rank work
    happens on the calendar-bounded month table (~80 rows) — the window is
    over months, never data rows."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_WSR_A, _WSR_B)
    ).selectExpr(
        "date_format(o_orderdate, 'yyyy-MM') AS m",
        "o_orderpriority AS p",
        f"{cents('o_totalprice', 100)} AS vq",
    )
    o.createOrReplaceTempView("_wsr_orders")
    med = spark.sql(
        """SELECT m, p,
                  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY vq)
                       AS BIGINT) AS med
           FROM _wsr_orders GROUP BY m, p"""
    )
    d = (
        med.groupBy("m")
        .agg(
            F.expr(f"max(CASE WHEN p = '{_WSR_A}' THEN med END)").alias("ma"),
            F.expr(f"max(CASE WHEN p = '{_WSR_B}' THEN med END)").alias("mb"),
        )
        .filter("ma IS NOT NULL AND mb IS NOT NULL AND ma <> mb")
        .selectExpr("ma - mb AS d", "abs(ma - mb) AS ad")
    )
    # mid-rank average ranks of |d| in half-units over the month table
    vals = d.groupBy("ad").agg(
        F.count("*").cast("bigint").alias("c_v"),
        F.expr("count(*) FILTER (WHERE d > 0)").cast("bigint").alias("c_pos"),
    )
    wv = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "r2",
        F.lit(2) * F.coalesce(F.sum("c_v").over(wv), F.lit(0))
        + F.col("c_v")
        + F.lit(1),
    )
    fold = ranked.agg(
        F.sum("c_v").cast("bigint").alias("n_pairs"),
        F.sum(F.expr("c_pos * r2")).cast("bigint").alias("w2_plus"),
        F.sum(F.expr("c_v * c_v * c_v - c_v")).cast("bigint").alias("tie_sum"),
    )
    return fold.selectExpr(*_wsr_out_exprs())


def _wsr_out_exprs() -> list[str]:
    mu = "(CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4)"
    var = (
        "(CAST(n_pairs AS DOUBLE) * (n_pairs + 1) * (2 * n_pairs + 1) / 24"
        " - CAST(tie_sum AS DOUBLE) / 48)"
    )
    wp = "(CAST(w2_plus AS DOUBLE) / 2)"
    return [
        "n_pairs",
        f"{wp} AS w_plus",
        f"(CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 2 - {wp}) AS w_minus",
        "tie_sum",
        mround(f"({wp} - {mu}) / sqrt({var})", 6) + " AS z_stat",
    ]


def _wsr_sql() -> str:
    return f"""
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS m, o_orderpriority AS p,
         {cents('o_totalprice', 100)} AS vq
  FROM orders WHERE o_orderpriority IN ('{_WSR_A}', '{_WSR_B}')),
med AS (
  SELECT m, p, CAST(quantile_disc(vq, 0.5) AS BIGINT) AS med
  FROM o GROUP BY m, p),
d AS (
  SELECT ma - mb AS d, abs(ma - mb) AS ad FROM (
    SELECT m,
           max(CASE WHEN p = '{_WSR_A}' THEN med END) AS ma,
           max(CASE WHEN p = '{_WSR_B}' THEN med END) AS mb
    FROM med GROUP BY m) t
  WHERE ma IS NOT NULL AND mb IS NOT NULL AND ma <> mb),
vals AS (
  SELECT ad, CAST(count(*) AS BIGINT) AS c_v,
         CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS c_pos
  FROM d GROUP BY ad),
ranked AS (
  SELECT *, 2 * coalesce(sum(c_v) OVER (
               ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) + c_v + 1 AS r2
  FROM vals),
folded AS (
  SELECT CAST(sum(c_v) AS BIGINT) AS n_pairs,
         CAST(sum(c_pos * r2) AS BIGINT) AS w2_plus,
         CAST(sum(c_v * c_v * c_v - c_v) AS BIGINT) AS tie_sum
  FROM ranked)
SELECT {", ".join(_wsr_out_exprs())} FROM folded
"""


AGG_WILCOXON_SQL = _wsr_sql()

QUERIES["agg_wilcoxon_signed_rank"] = QuerySpec(
    agg_wilcoxon_signed_rank, AGG_WILCOXON_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Two-proportion conversion z-test — round 9
# ---------------------------------------------------------------------------


def events_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of USER-LEVEL purchase conversion between the
    deterministic A/B arms (even vs odd user_id): the experiment readout
    `events_srm_check` guards (SRM tests the assignment counts; this tests
    the OUTCOME — whether treatment moved the conversion rate), with the
    pooled-variance z = (p1 - p0) / sqrt(p(1-p)(1/n1 + 1/n0)).

    Determinism: everything up to z is integer counting (a user converts
    iff they have a big-ticket purchase, value > 200 — EVERY user has some
    purchase in the synthetic stream, so the raw any-purchase definition is
    degenerate: both rates pin at 1 and the pooled variance is 0, division
    by zero; same lesson as the r9 kappa rater switch); z is one fixed
    IEEE chain over the four exact counts.

    Scale: one partial-agg groupBy on user_id (bool_or collapses map-side),
    then a 2-row arm aggregate — the per-user table never leaves the
    executors un-reduced."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr(
            "max(CASE WHEN event_type = 'purchase' AND value > 200"
            " THEN 1 ELSE 0 END)"
        )
        .cast("bigint")
        .alias("converted")
    )
    arms = per_user.agg(
        F.expr("count(*) FILTER (WHERE user_id % 2 = 0)")
        .cast("bigint")
        .alias("n_treat"),
        F.expr("coalesce(sum(converted) FILTER (WHERE user_id % 2 = 0), 0)")
        .cast("bigint")
        .alias("x_treat"),
        F.expr("count(*) FILTER (WHERE user_id % 2 <> 0)")
        .cast("bigint")
        .alias("n_ctrl"),
        F.expr("coalesce(sum(converted) FILTER (WHERE user_id % 2 <> 0), 0)")
        .cast("bigint")
        .alias("x_ctrl"),
    )
    return arms.selectExpr(*_ztest_out_exprs())


def _ztest_out_exprs() -> list[str]:
    p1 = "(CAST(x_treat AS DOUBLE) / n_treat)"
    p0 = "(CAST(x_ctrl AS DOUBLE) / n_ctrl)"
    pp = "(CAST(x_treat + x_ctrl AS DOUBLE) / (n_treat + n_ctrl))"
    se = f"sqrt({pp} * (1 - {pp}) * (CAST(1 AS DOUBLE) / n_treat + CAST(1 AS DOUBLE) / n_ctrl))"
    return [
        "n_treat",
        "x_treat",
        "n_ctrl",
        "x_ctrl",
        mround(p1, 6) + " AS rate_treat",
        mround(p0, 6) + " AS rate_ctrl",
        mround(f"({p1} - {p0}) / {se}", 6) + " AS z_stat",
    ]


EVENTS_CONVERSION_ZTEST_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS BIGINT) AS converted
  FROM events GROUP BY user_id),
arms AS (
  SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_treat,
         CAST(coalesce(sum(converted) FILTER (WHERE user_id % 2 = 0), 0)
              AS BIGINT) AS x_treat,
         CAST(count(*) FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS n_ctrl,
         CAST(coalesce(sum(converted) FILTER (WHERE user_id % 2 <> 0), 0)
              AS BIGINT) AS x_ctrl
  FROM per_user)
SELECT {", ".join(_ztest_out_exprs())} FROM arms
"""


QUERIES["events_conversion_ztest"] = QuerySpec(
    events_conversion_ztest, EVENTS_CONVERSION_ZTEST_SQL, "events"
)


# ---------------------------------------------------------------------------
# Bartlett variance-homogeneity test — round 9
# ---------------------------------------------------------------------------
#
# Completes the variance-homogeneity PAIR: Brown-Forsythe (above) is the
# robust member; Bartlett is the classical parametric one — more powerful
# under normality (which agg_jarque_bera gates), badly non-robust without
# it. Same exact-integer cell machinery as the ANOVA (_anova_exprs).


def _bartlett_exprs() -> list[str]:
    """T = [(N-k) ln(sp2) - sum (n_i-1) ln(s_i2)] / C from the ANOVA cell
    columns (n_i, s_i, hi_i, lo_i). Per-group variances derive from exact
    integers; the ln() terms are the documented transcendental exception,
    summed in declared priority order (fixed text both dialects).
    Variances are in cents^2 — the statistic is scale-invariant (the ln of
    the units cancels between the pooled and per-group terms), so no /1e4
    rescale is needed or wanted inside the logs."""
    idx = range(len(_ANOVA_PRIORITIES))
    s2 = {
        i: (
            f"((CAST(hi{i} AS DOUBLE) * {_ANOVA_LANE} + CAST(lo{i} AS DOUBLE)"
            f" - CAST(s{i} AS DOUBLE) * s{i} / n{i}) / (n{i} - 1))"
        )
        for i in idx
    }
    nk = "(n_total - k_groups)"
    sp2 = (
        "(("
        + " + ".join(f"(n{i} - 1) * {s2[i]}" for i in idx)
        + f") / {nk})"
    )
    lnsum = " + ".join(f"(n{i} - 1) * ln({s2[i]})" for i in idx)
    t_num = f"({nk} * ln({sp2}) - ({lnsum}))"
    inv = " + ".join(f"CAST(1 AS DOUBLE) / (n{i} - 1)" for i in idx)
    c = (
        f"(1 + (({inv}) - CAST(1 AS DOUBLE) / {nk})"
        " / (3 * (k_groups - 1)))"
    )
    return [
        "n_total",
        "k_groups",
        mround(c, 6) + " AS correction_c",
        mround(f"{t_num} / {c}", 6) + " AS bartlett_t",
    ]


def agg_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of order-value variance homogeneity across the five
    priorities — the parametric sibling of `agg_levene_brown_forsythe`
    (run Bartlett when `agg_jarque_bera` accepts normality, Brown-Forsythe
    when it doesn't). T ~ chi2(k-1) under H0.

    Exactness: the cells are the IDENTICAL lane-split integer moments as
    `agg_anova_oneway` (one FILTER-conditional partial-agg pass onto a
    single row); the per-group variances are fixed IEEE chains over exact
    integers and the ln() terms are the documented transcendental
    exception, summed in declared priority order.

    Scale: one partial-aggregated pass; all algebra on the 1-row fold."""
    aggs, derived = _anova_exprs("spark")
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority", f"{cents('o_totalprice', 100)} AS vq"
    )
    # keep the raw cell columns alongside the derived totals
    row = o.agg(*[F.expr(a) for a in aggs]).selectExpr("*", *derived)
    return row.selectExpr(*_bartlett_exprs())


def _bartlett_sql() -> str:
    aggs, derived = _anova_exprs("duck")
    return f"""
WITH cells AS (
  SELECT {", ".join(aggs)}
  FROM (SELECT o_orderpriority, {cents('o_totalprice', 100)} AS vq FROM orders) t),
row1 AS (SELECT *, {", ".join(derived)} FROM cells)
SELECT {", ".join(_bartlett_exprs())} FROM row1
"""


AGG_BARTLETT_SQL = _bartlett_sql()

QUERIES["agg_bartlett_test"] = QuerySpec(
    agg_bartlett_test, AGG_BARTLETT_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test — round 9
# ---------------------------------------------------------------------------


def agg_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR TREND in the big-order proportion
    (o_totalprice > 300k) across the ORDERED priorities (scores 1..5) —
    the categorical family's ordered member: chi-square/Cramer's V ask "is
    there any association", CA asks "does the rate climb with priority",
    which is the monotone question a pricing or SLA analysis actually
    poses. z > 0 = rate increases toward LOW priority.

    Exactness: the 2x5 table is pure integer counting (one conditional
    partial-agg pass); z = sum(w_i (x_i - n_i*pbar)) /
    sqrt(pbar(1-pbar) (sum w_i^2 n_i - (sum w_i n_i)^2/N)) is one fixed
    IEEE chain with group terms in declared score order.

    Scale: one FILTER-conditional pass onto a single row."""
    aggs = []
    for i, p in enumerate(_ANOVA_PRIORITIES):
        f = f"FILTER (WHERE o_orderpriority = '{p}')"
        aggs.append(f"CAST(count(*) {f} AS BIGINT) AS n{i}")
        aggs.append(
            f"CAST(coalesce(count(*) {f.replace(')', ' AND big = 1)')}, 0)"
            f" AS BIGINT) AS x{i}"
        )
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority",
        "CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END AS big",
    )
    row = o.agg(*[F.expr(a) for a in aggs])
    return row.selectExpr(*_ca_out_exprs())


def _ca_out_exprs() -> list[str]:
    idx = range(len(_ANOVA_PRIORITIES))
    n_tot = " + ".join(f"n{i}" for i in idx)
    x_tot = " + ".join(f"x{i}" for i in idx)
    pbar = f"(CAST({x_tot} AS DOUBLE) / ({n_tot}))"
    num = " + ".join(f"({i + 1}) * (x{i} - n{i} * {pbar})" for i in idx)
    sw2n = " + ".join(f"({i + 1}) * ({i + 1}) * n{i}" for i in idx)
    swn = " + ".join(f"({i + 1}) * n{i}" for i in idx)
    var = (
        f"({pbar} * (1 - {pbar})"
        f" * (({sw2n}) - CAST({swn} AS DOUBLE) * ({swn}) / ({n_tot})))"
    )
    return [
        f"CAST({n_tot} AS BIGINT) AS n_total",
        f"CAST({x_tot} AS BIGINT) AS n_big",
        mround(pbar, 6) + " AS rate_overall",
        mround(f"({num}) / sqrt({var})", 6) + " AS z_trend",
    ]


def _ca_sql() -> str:
    aggs = []
    for i, p in enumerate(_ANOVA_PRIORITIES):
        f = f"FILTER (WHERE o_orderpriority = '{p}')"
        aggs.append(f"CAST(count(*) {f} AS BIGINT) AS n{i}")
        aggs.append(
            f"CAST(coalesce(count(*) {f.replace(')', ' AND big = 1)')}, 0)"
            f" AS BIGINT) AS x{i}"
        )
    return f"""
WITH o AS (
  SELECT o_orderpriority,
         CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END AS big
  FROM orders),
cells AS (SELECT {", ".join(aggs)} FROM o)
SELECT {", ".join(_ca_out_exprs())} FROM cells
"""


AGG_COCHRAN_ARMITAGE_SQL = _ca_sql()

QUERIES["agg_cochran_armitage"] = QuerySpec(
    agg_cochran_armitage, AGG_COCHRAN_ARMITAGE_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index — round 9
# ---------------------------------------------------------------------------


def agg_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of brand revenue concentration: HHI =
    sum over brands of (market share in percent)^2, on the 0..10000 scale
    regulators use (<1500 unconcentrated, >2500 highly concentrated) —
    the standard concentration index beside `agg_gini_concentration`'s
    inequality view (Gini ranks the whole curve; HHI is the antitrust
    summary a category manager quotes). Also reports the top brand's share
    and the effective number of brands 10000/HHI.

    Exactness: per-brand revenue accumulates as exact integer micro; the
    share-squared fold is one fixed IEEE chain per brand row, pre-rounded
    onto the 1e-6 grid before the (bounded, 25-row) integer sum — so even
    the cross-brand reduction is order-free.

    Scale: lineitem joins the broadcast part dim and partial-aggregates
    onto the 25-brand key; everything downstream is 25 rows."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .selectExpr(
            "p_brand",
            f"{cents('l_extendedprice * (1 - l_discount)')} AS rq",
        )
        .groupBy("p_brand")
        .agg(F.sum("rq").cast("bigint").alias("rev"))
        # two consumers (total + shares) — materialize the 25-row brand
        # table so the fact join runs once (7 -> 4 Exchanges, measured)
        .localCheckpoint()
    )
    tot = rev.agg(F.sum("rev").cast("bigint").alias("tot"))
    shares = rev.crossJoin(F.broadcast(tot)).selectExpr(
        "p_brand",
        "rev",
        # share in percent on the 1e-6 grid: one IEEE chain of exact ints
        "CAST(floor(CAST(rev AS DOUBLE) / tot * 100 * 1000000 + 0.5)"
        " AS BIGINT) AS share_pct_q",
    )
    fold = shares.agg(
        F.count("*").cast("bigint").alias("n_brands"),
        F.max("share_pct_q").cast("bigint").alias("top_q"),
        # sum of squared percent shares, each term floored onto the 1e-6
        # grid first so the 25-term reduction is an integer sum
        F.sum(
            F.expr(
                "CAST(floor(CAST(share_pct_q AS DOUBLE) * share_pct_q"
                " / 1000000 + 0.5) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("hhi_q"),
    )
    return fold.selectExpr(
        "n_brands",
        mround("CAST(top_q AS DOUBLE) / 1000000", 6) + " AS top_share_pct",
        mround("CAST(hhi_q AS DOUBLE) / 1000000", 6) + " AS hhi",
        mround("10000 / (CAST(hhi_q AS DOUBLE) / 1000000)", 6)
        + " AS effective_brands",
    )


AGG_HERFINDAHL_SQL = f"""
WITH rev AS (
  SELECT p_brand,
         CAST(sum({cents('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand),
tot AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM rev),
shares AS (
  SELECT p_brand, rev,
         CAST(floor(CAST(rev AS DOUBLE) / tot * 100 * 1000000 + 0.5)
              AS BIGINT) AS share_pct_q
  FROM rev CROSS JOIN tot),
folded AS (
  SELECT CAST(count(*) AS BIGINT) AS n_brands,
         CAST(max(share_pct_q) AS BIGINT) AS top_q,
         CAST(sum(CAST(floor(CAST(share_pct_q AS DOUBLE) * share_pct_q
                  / 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS hhi_q
  FROM shares)
SELECT n_brands,
       {mround('CAST(top_q AS DOUBLE) / 1000000', 6)} AS top_share_pct,
       {mround('CAST(hhi_q AS DOUBLE) / 1000000', 6)} AS hhi,
       {mround('10000 / (CAST(hhi_q AS DOUBLE) / 1000000)', 6)} AS effective_brands
FROM folded
"""


QUERIES["agg_herfindahl"] = QuerySpec(
    agg_herfindahl, AGG_HERFINDAHL_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Experiment power / minimum detectable effect — round 9
# ---------------------------------------------------------------------------


def events_experiment_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the running conversion experiment at
    the standard alpha = 0.05 two-sided / 80% power design point: MDE =
    (z_{0.975} + z_{0.80}) * sqrt(p(1-p) * (1/n1 + 1/n0)) with the normal
    quantiles as LITERAL constants (1.959964, 0.841621 — design constants,
    not data; no inverse-CDF ever executes engine-side). The question a
    growth team asks BEFORE reading `events_conversion_ztest`: "could this
    experiment even see the lift we care about?" — reported in absolute
    percentage points and relative to baseline.

    Scale: rides the identical per-user conversion cells (one partial-agg
    groupBy, then a 1-row fold)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr(
            "max(CASE WHEN event_type = 'purchase' AND value > 200"
            " THEN 1 ELSE 0 END)"
        )
        .cast("bigint")
        .alias("converted")
    )
    arms = per_user.agg(
        F.expr("count(*) FILTER (WHERE user_id % 2 = 0)")
        .cast("bigint")
        .alias("n_treat"),
        F.expr("count(*) FILTER (WHERE user_id % 2 <> 0)")
        .cast("bigint")
        .alias("n_ctrl"),
        F.sum("converted").cast("bigint").alias("x_all"),
    )
    return arms.selectExpr(*_mde_out_exprs())


# z_{1-alpha/2} + z_{power} for alpha=.05 two-sided, power=.80 — literal
# DESIGN constants shared by both dialects (pre-rounded, no erfinv runs)
_MDE_ZSUM = "(1.959964 + 0.841621)"


def _mde_out_exprs() -> list[str]:
    p = "(CAST(x_all AS DOUBLE) / (n_treat + n_ctrl))"
    se = (
        f"sqrt({p} * (1 - {p})"
        " * (CAST(1 AS DOUBLE) / n_treat + CAST(1 AS DOUBLE) / n_ctrl))"
    )
    mde = f"({_MDE_ZSUM} * {se})"
    return [
        "n_treat",
        "n_ctrl",
        mround(p, 6) + " AS baseline_rate",
        mround(mde, 6) + " AS mde_abs",
        mround(f"{mde} / {p}", 6) + " AS mde_rel",
    ]


EVENTS_POWER_MDE_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS BIGINT) AS converted
  FROM events GROUP BY user_id),
arms AS (
  SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_treat,
         CAST(count(*) FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS n_ctrl,
         CAST(sum(converted) AS BIGINT) AS x_all
  FROM per_user)
SELECT {", ".join(_mde_out_exprs())} FROM arms
"""


QUERIES["events_experiment_power_mde"] = QuerySpec(
    events_experiment_power_mde, EVENTS_POWER_MDE_SQL, "events"
)


# ---------------------------------------------------------------------------
# Event-study (dynamic DiD) coefficients — round 9
# ---------------------------------------------------------------------------
#
# The companion every reviewer asks for after `events_did_lift`: the SAME
# design, but the treatment contrast traced period by period — flat
# pre-period coefficients ARE the parallel-trends check, and the post
# coefficients show how the effect ramps instead of one pooled number.

_ES_DAY0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_ES_PERIOD_US = 3 * 86_400_000_000  # 3-day periods; intervention at per 5
_ES_POST_PER = 5  # periods 0..4 pre, 5..9 post (cut = _DID_POST_US)


def events_did_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study coefficients around the standing intervention: per
    3-day period, the treatment-control mean-spend difference and the
    coefficient net of the pooled PRE-period baseline difference. Pre
    coefficients hugging zero = parallel trends hold (the identification
    assumption `events_did_lift` rests on); post coefficients = the
    dynamic effect path.

    Exactness: cells are (n, integer-micro sum) per (treat, period) from
    ONE conditional pass; the baseline is a fixed-text fold of the five
    pre-period cells; every reported double is one IEEE chain over exact
    integers.

    Scale: one partial-agg groupBy onto the 20-cell design table
    (materialized — two consumers), then 10 output rows."""
    e = load_table(spark, sf_dir, "events").filter("event_type = 'purchase'")
    cells = (
        e.selectExpr(
            "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat",
            f"CAST((unix_micros(ts) - {_ES_DAY0_US}) div {_ES_PERIOD_US}"
            " AS BIGINT) AS per",
            f"{cents('value')} AS vq",
        )
        .groupBy("treat", "per")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("vq").cast("bigint").alias("s"),
        )
        .localCheckpoint()
    )
    base = cells.filter(f"per < {_ES_POST_PER}").agg(
        F.expr(
            "CAST(coalesce(sum(n) FILTER (WHERE treat = 1), 0) AS BIGINT)"
        ).alias("nt"),
        F.expr(
            "CAST(coalesce(sum(s) FILTER (WHERE treat = 1), 0) AS BIGINT)"
        ).alias("st"),
        F.expr(
            "CAST(coalesce(sum(n) FILTER (WHERE treat = 0), 0) AS BIGINT)"
        ).alias("nc"),
        F.expr(
            "CAST(coalesce(sum(s) FILTER (WHERE treat = 0), 0) AS BIGINT)"
        ).alias("sc"),
    )
    per = cells.groupBy("per").agg(
        F.expr(
            "CAST(coalesce(max(n) FILTER (WHERE treat = 1), 0) AS BIGINT)"
        ).alias("n_treat"),
        F.expr(
            "CAST(coalesce(max(s) FILTER (WHERE treat = 1), 0) AS BIGINT)"
        ).alias("s_treat"),
        F.expr(
            "CAST(coalesce(max(n) FILTER (WHERE treat = 0), 0) AS BIGINT)"
        ).alias("n_ctrl"),
        F.expr(
            "CAST(coalesce(max(s) FILTER (WHERE treat = 0), 0) AS BIGINT)"
        ).alias("s_ctrl"),
    )
    return (
        per.crossJoin(F.broadcast(base))
        .selectExpr(*_es_out_exprs())
        .orderBy("period")
    )


def _es_out_exprs() -> list[str]:
    mt = "(CAST(s_treat AS DOUBLE) / 1000000 / n_treat)"
    mc = "(CAST(s_ctrl AS DOUBLE) / 1000000 / n_ctrl)"
    bl = (
        "(CAST(st AS DOUBLE) / 1000000 / nt"
        " - CAST(sc AS DOUBLE) / 1000000 / nc)"
    )
    diff = f"({mt} - {mc})"
    return [
        "CAST(per AS BIGINT) AS period",
        f"CAST(per >= {_ES_POST_PER} AS INT) AS is_post",
        "n_treat",
        "n_ctrl",
        mround(diff, 6) + " AS diff",
        mround(f"{diff} - {bl}", 6) + " AS coef",
    ]


EVENTS_EVENT_STUDY_SQL = f"""
WITH cells AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
         CAST((epoch_us(ts) - {_ES_DAY0_US}) // {_ES_PERIOD_US} AS BIGINT) AS per,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({cents('value')}) AS BIGINT) AS s
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2),
base AS (
  SELECT CAST(coalesce(sum(n) FILTER (WHERE treat = 1), 0) AS BIGINT) AS nt,
         CAST(coalesce(sum(s) FILTER (WHERE treat = 1), 0) AS BIGINT) AS st,
         CAST(coalesce(sum(n) FILTER (WHERE treat = 0), 0) AS BIGINT) AS nc,
         CAST(coalesce(sum(s) FILTER (WHERE treat = 0), 0) AS BIGINT) AS sc
  FROM cells WHERE per < {_ES_POST_PER}),
per_t AS (
  SELECT per,
         CAST(coalesce(max(n) FILTER (WHERE treat = 1), 0) AS BIGINT) AS n_treat,
         CAST(coalesce(max(s) FILTER (WHERE treat = 1), 0) AS BIGINT) AS s_treat,
         CAST(coalesce(max(n) FILTER (WHERE treat = 0), 0) AS BIGINT) AS n_ctrl,
         CAST(coalesce(max(s) FILTER (WHERE treat = 0), 0) AS BIGINT) AS s_ctrl
  FROM cells GROUP BY per)
SELECT {", ".join(_es_out_exprs())}
FROM per_t CROSS JOIN base
ORDER BY period
"""


QUERIES["events_did_event_study"] = QuerySpec(
    events_did_event_study, EVENTS_EVENT_STUDY_SQL, "events"
)


# ---------------------------------------------------------------------------
# Grouped robust dispersion: median absolute deviation — round 10
# ---------------------------------------------------------------------------


def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust location/scale: exact discrete median, the
    median absolute deviation around it, and the count of robust-z
    outliers (|x - med| > 3 * 1.4826 * MAD) — the screen that survives the
    heavy tails that wreck mean/stddev rules (`agg_stats`' z-score would
    flag nothing on lognormal-ish prices; MAD flags the true tail).

    Determinism: prices enter as exact integer cents; percentile_disc
    returns an ACTUAL data value (no interpolation) so med/MAD are
    integer-exact in both engines; the outlier gate is the pure-integer
    comparison adev * 10000 > 44478 * mad_cents (3 * 1.4826 scaled 1e4 —
    no float ever compared).

    Scale: two grouped percentile_disc passes (base, then deviations) +
    one broadcast join of the 5-row median table — the same two-level
    shape as `agg_weighted_median`; nothing collects."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_mad_orders")
    return spark.sql(
        """
        WITH base AS (
          SELECT o_orderpriority AS prio,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
          FROM _mad_orders),
        med AS (
          SELECT prio,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS med_c
          FROM base GROUP BY prio),
        dev AS (
          SELECT b.prio, b.c, m.med_c, abs(b.c - m.med_c) AS adev
          FROM base b JOIN med m ON b.prio = m.prio),
        mad AS (
          SELECT prio,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad_c
          FROM dev GROUP BY prio)
        SELECT d.prio AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(d.med_c) AS DOUBLE) / 100 AS median_price,
               CAST(min(a.mad_c) AS DOUBLE) / 100 AS mad_price,
               CAST(count(*) FILTER (WHERE d.adev * 10000 > 44478 * a.mad_c)
                    AS BIGINT) AS n_robust_outliers
        FROM dev d JOIN mad a ON d.prio = a.prio
        GROUP BY d.prio
        """
    )


AGG_MAD_ROBUST_SQL = """
WITH base AS (
  SELECT o_orderpriority AS prio,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders),
med AS (
  SELECT prio, quantile_disc(c, 0.5) AS med_c FROM base GROUP BY prio),
dev AS (
  SELECT b.prio, b.c, m.med_c, abs(b.c - m.med_c) AS adev
  FROM base b JOIN med m ON b.prio = m.prio),
mad AS (
  SELECT prio, quantile_disc(adev, 0.5) AS mad_c FROM dev GROUP BY prio)
SELECT d.prio AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(d.med_c) AS DOUBLE) / 100 AS median_price,
       CAST(min(a.mad_c) AS DOUBLE) / 100 AS mad_price,
       CAST(count(*) FILTER (WHERE d.adev * 10000 > 44478 * a.mad_c)
            AS BIGINT) AS n_robust_outliers
FROM dev d JOIN mad a ON d.prio = a.prio
GROUP BY d.prio
"""


QUERIES["agg_mad_robust"] = QuerySpec(agg_mad_robust, AGG_MAD_ROBUST_SQL, "aggregation")


# ---------------------------------------------------------------------------
# G-test of independence (priority x status) — round 10
# ---------------------------------------------------------------------------
#
# The likelihood-ratio counterpart of the chi-square family already in the
# catalog (agg_cramers_v measures association strength; diag_distribution_
# drift tests goodness-of-fit): G = 2 * sum O*ln(O*N / (R*C)) tests row/
# column INDEPENDENCE on the contingency table, and is additive across
# partitions of the table (the property that makes it the standard choice
# for hierarchical log-linear models).

_GTEST_T9 = (
    "CAST(floor(CAST(o AS DOUBLE)"
    " * ln(CAST(o AS DOUBLE) * n_tot / (CAST(r AS DOUBLE) * c))"
    " * 1000000000 + 0.5) AS BIGINT)"
)


def agg_gtest_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-square) of independence between
    o_orderpriority and o_orderstatus. Reports N, the table shape, dof,
    and G. Absent cells contribute 0 by the 0*ln(0) = 0 convention —
    exactly what the GROUP BY produces (no row, no term).

    Determinism: every count is int64; each cell's O*ln(O*N/(R*C)) is
    grid-rounded at 1e-9 BEFORE the 15-cell sum (per-cell magnitude <=
    O*ln(N) keeps the grid product inside int64 to ~1e8-row cells), and
    the final x2 / 1e9 is one fixed IEEE step.

    Scale: one groupBy over the fact table produces the <= |priorities x
    statuses| cell table; everything after is broadcast joins of <= 5-row
    margins — the contingency table never grows with the data."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").cast("bigint").alias("o")
    )
    rowm = cells.groupBy("o_orderpriority").agg(F.sum("o").cast("bigint").alias("r"))
    colm = cells.groupBy("o_orderstatus").agg(F.sum("o").cast("bigint").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n_tot"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("n_rows_tbl"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("n_cols_tbl"),
    )
    terms = (
        cells.join(F.broadcast(rowm), "o_orderpriority")
        .join(F.broadcast(colm), "o_orderstatus")
        .crossJoin(F.broadcast(tot))
        .selectExpr("n_tot", "n_rows_tbl", "n_cols_tbl", f"{_GTEST_T9} AS t9")
    )
    return terms.groupBy("n_tot", "n_rows_tbl", "n_cols_tbl").agg(
        F.sum("t9").cast("bigint").alias("g9")
    ).selectExpr(
        "n_tot AS n",
        "n_rows_tbl AS n_priorities",
        "n_cols_tbl AS n_statuses",
        "CAST((n_rows_tbl - 1) * (n_cols_tbl - 1) AS BIGINT) AS dof",
        mround("2 * CAST(g9 AS DOUBLE) / 1000000000", 6) + " AS g_stat",
    )


AGG_GTEST_SQL = f"""
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY o_orderpriority, o_orderstatus),
rowm AS (
  SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS r
  FROM cells GROUP BY o_orderpriority),
colm AS (
  SELECT o_orderstatus, CAST(sum(o) AS BIGINT) AS c
  FROM cells GROUP BY o_orderstatus),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n_tot,
         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_rows_tbl,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_cols_tbl
  FROM cells),
terms AS (
  SELECT n_tot, n_rows_tbl, n_cols_tbl, {_GTEST_T9} AS t9
  FROM cells
  JOIN rowm USING (o_orderpriority)
  JOIN colm USING (o_orderstatus)
  CROSS JOIN tot)
SELECT n_tot AS n,
       n_rows_tbl AS n_priorities,
       n_cols_tbl AS n_statuses,
       CAST((n_rows_tbl - 1) * (n_cols_tbl - 1) AS BIGINT) AS dof,
       {mround('2 * CAST(sum(t9) AS DOUBLE) / 1000000000', 6)} AS g_stat
FROM terms
GROUP BY n_tot, n_rows_tbl, n_cols_tbl
"""


QUERIES["agg_gtest_independence"] = QuerySpec(
    agg_gtest_independence, AGG_GTEST_SQL, "aggregation"
)


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily revenue series — round 10
# ---------------------------------------------------------------------------
#
# Completes the rank/nonparametric family (Mann-Whitney, Kruskal-Wallis,
# Wilcoxon, Friedman are all LEVEL tests; Ljung-Box needs a lag grid): the
# runs test asks whether above/below-median days CLUSTER in time — the
# model-free randomness gate a forecaster runs before trusting residuals.

_RUNS_DAYS_CTE = """
days AS (
  SELECT o_orderdate AS dt,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM orders GROUP BY o_orderdate)
"""


def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test: daily revenue days are labeled above /
    below the exact discrete median (ties with the median are dropped, the
    standard treatment); R = number of sign runs in date order; z uses the
    exact integer moments mu = 1 + 2*n1*n2/n and
    var = 2*n1*n2*(2*n1*n2 - n) / (n^2 * (n - 1)).

    Determinism: day revenues are exact cent sums; the median is
    percentile_disc (an actual value); run boundaries are integer lag
    comparisons; only the final mu/var/z division-and-sqrt runs in IEEE,
    from exact int64 operands (n1*n2 <= (n/2)^2 ~ 1.4e6 at 2.4e3 days;
    the var numerator stays under 1e13 — int64-safe to ~1e5 days, i.e.
    270 years of calendar).

    Scale: the series is calendar-bounded (one row per DAY), so the
    ordered lag window over it is bounded work regardless of fact-table
    size — the same daily-grid argument as events_ljung_box."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_runs_orders")
    return spark.sql(
        f"""
        WITH {_RUNS_DAYS_CTE.replace("FROM orders", "FROM _runs_orders")},
        med AS (
          SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS med_c
          FROM days),
        signs AS (
          SELECT dt, CASE WHEN c > med_c THEN 1 ELSE 0 END AS s
          FROM days CROSS JOIN med WHERE c <> med_c),
        runs AS (
          SELECT s,
                 CASE WHEN lag(s) OVER (ORDER BY dt) IS NULL
                        OR lag(s) OVER (ORDER BY dt) <> s
                      THEN 1 ELSE 0 END AS run_start
          FROM signs)
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(s) AS BIGINT) AS n_above,
               CAST(count(*) - sum(s) AS BIGINT) AS n_below,
               CAST(sum(run_start) AS BIGINT) AS n_runs,
               floor((1 + CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s)) / count(*))
                     * 1000000 + 0.5) / 1000000 AS expected_runs,
               CASE WHEN sum(s) = 0 OR sum(s) = count(*) OR count(*) < 2
                      -- var=0 also when 2*n1*n2 = n (e.g. exactly one
                      -- above- and one below-median day): NULL, not NaN
                      OR 2 * sum(s) * (count(*) - sum(s)) <= count(*)
                    THEN NULL
               ELSE floor((sum(run_start)
                      - (1 + CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s)) / count(*)))
                     / sqrt(CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s))
                            * (CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s)) - count(*))
                            / (CAST(count(*) AS DOUBLE) * count(*)
                               * (count(*) - 1)))
                     * 1000000 + 0.5) / 1000000 END AS z_stat
        FROM runs
        """
    )


AGG_RUNS_TEST_SQL = f"""
WITH {_RUNS_DAYS_CTE},
med AS (SELECT quantile_disc(c, 0.5) AS med_c FROM days),
signs AS (
  SELECT dt, CASE WHEN c > med_c THEN 1 ELSE 0 END AS s
  FROM days CROSS JOIN med WHERE c <> med_c),
runs AS (
  SELECT s,
         CASE WHEN lag(s) OVER (ORDER BY dt) IS NULL
                OR lag(s) OVER (ORDER BY dt) <> s
              THEN 1 ELSE 0 END AS run_start
  FROM signs)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(s) AS BIGINT) AS n_above,
       CAST(count(*) - sum(s) AS BIGINT) AS n_below,
       CAST(sum(run_start) AS BIGINT) AS n_runs,
       floor((1 + CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s)) / count(*))
             * 1000000 + 0.5) / 1000000 AS expected_runs,
       CASE WHEN sum(s) = 0 OR sum(s) = count(*) OR count(*) < 2
              -- var=0 also when 2*n1*n2 = n: NULL, not NaN (r10 advice)
              OR 2 * sum(s) * (count(*) - sum(s)) <= count(*) THEN NULL
       ELSE floor((sum(run_start)
              - (1 + CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s)) / count(*)))
             / sqrt(CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s))
                    * (CAST(2 AS DOUBLE) * sum(s) * (count(*) - sum(s)) - count(*))
                    / (CAST(count(*) AS DOUBLE) * count(*) * (count(*) - 1)))
             * 1000000 + 0.5) / 1000000 END AS z_stat
FROM runs
"""


QUERIES["agg_runs_test"] = QuerySpec(agg_runs_test, AGG_RUNS_TEST_SQL, "aggregation")


# ---------------------------------------------------------------------------
# Durbin-Watson first-order autocorrelation gate — round 10
# ---------------------------------------------------------------------------
#
# The regression-residual companion to events_ljung_box's portmanteau: DW =
# sum (e_t - e_{t-1})^2 / sum e_t^2 over mean-centered daily revenue, the
# single-lag statistic every OLS diagnostic table leads with (DW ~ 2 means
# no lag-1 autocorrelation; DW -> 0 positive, -> 4 negative).

_DW_LANE = 1_048_576  # 2^20, the agg_anova_oneway lane width


def _dw_sql(dialect: str) -> str:
    d = "div" if dialect == "spark" else "//"
    src = "_dw_orders" if dialect == "spark" else "orders"
    # numerator sum (delta^2) and raw sum (c^2) both lane-split: c <= ~1e8
    # cents/day at sf0.1 so c^2 <= 1e16 fits int64 per row but not summed;
    # hi/lo lanes stay exact to ~1e5 days (270 calendar years)
    return f"""
WITH days AS (
  SELECT o_orderdate AS dt,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM {src} GROUP BY o_orderdate),
lagged AS (
  SELECT c, c - lag(c) OVER (ORDER BY dt) AS dc FROM days),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum((c * c) {d} {_DW_LANE}) AS BIGINT) AS sq_hi,
         CAST(sum((c * c) % {_DW_LANE}) AS BIGINT) AS sq_lo,
         CAST(sum((dc * dc) {d} {_DW_LANE}) AS BIGINT) AS dq_hi,
         CAST(sum((dc * dc) % {_DW_LANE}) AS BIGINT) AS dq_lo
  FROM lagged)
SELECT n AS n_days,
       floor((CAST(dq_hi AS DOUBLE) * {_DW_LANE} + CAST(dq_lo AS DOUBLE))
             / nullif((CAST(sq_hi AS DOUBLE) * {_DW_LANE} + CAST(sq_lo AS DOUBLE))
                - CAST(s AS DOUBLE) * s / n, 0)
             * 1000000 + 0.5) / 1000000 AS dw_stat,
       floor(CAST(s AS DOUBLE) / n / 100 * 100 + 0.5) / 100
         AS mean_daily_revenue
FROM sums
"""


def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson lag-1 autocorrelation statistic of the mean-centered
    daily revenue series. The centering cancels algebraically in the
    numerator (e_t - e_{t-1} = c_t - c_{t-1}) and reduces the denominator
    to sum c^2 - S^2/n, so BOTH sums fold from exact lane-split int64
    moments — no per-row residual is ever materialized in floating point.

    Scale: calendar-bounded daily grid (same argument as agg_runs_test);
    the only window is a lag over <= days-of-history rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_dw_orders")
    return spark.sql(_dw_sql("spark"))


QUERIES["agg_durbin_watson"] = QuerySpec(
    agg_durbin_watson, _dw_sql("duck"), "aggregation"
)


# ---------------------------------------------------------------------------
# Circular statistics of the daily activity cycle — round 10
# ---------------------------------------------------------------------------
#
# Hour-of-day is a CIRCULAR variable (23:00 and 01:00 are 2h apart, not
# 22h); the arithmetic mean/hour histograms already in the catalog
# (events_hourweek_profile) cannot say "this event type concentrates around
# 3am with strength R". Circular mean resultant length is the standard
# readout (Fisher, Statistical Analysis of Circular Data). The 24 unit
# vectors are import-time Python literals fed through string->double
# parsing (correctly rounded in BOTH engines) — no engine trig on the
# compare path, the events_spectral_energy literal-twiddle discipline.

import math as _math

_CIRC_VALUES = ", ".join(
    f"({h}, CAST('{_math.cos(2 * _math.pi * h / 24)!r}' AS DOUBLE),"
    f" CAST('{_math.sin(2 * _math.pi * h / 24)!r}' AS DOUBLE))"
    for h in range(24)
)


def events_circadian_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: circular mean vector (x, y), resultant length R and
    circular variance 1-R of the hour-of-day distribution — R ~ 0 means
    activity is spread around the clock, R ~ 1 means a sharp daily peak.

    Determinism: hourly counts are int64; each count x literal-cosine
    product is grid-rounded at 1e-9 BEFORE summing (order-free int64
    folds); R's sqrt is IEEE-correctly-rounded over one fixed expression.

    Scale: one groupBy onto a <= types x 24 cell table; the trig table is
    a 24-row broadcast literal."""
    e = load_table(spark, sf_dir, "events")
    cells = e.selectExpr("event_type", "hour(ts) AS hod").groupBy(
        "event_type", "hod"
    ).agg(F.count("*").cast("bigint").alias("n_h"))
    trig = spark.sql(f"SELECT * FROM VALUES {_CIRC_VALUES} AS t(hod, cx, sy)")
    terms = cells.join(F.broadcast(trig), "hod").selectExpr(
        "event_type",
        "n_h",
        "CAST(floor(n_h * cx * 1000000000 + 0.5) AS BIGINT) AS c9",
        "CAST(floor(n_h * sy * 1000000000 + 0.5) AS BIGINT) AS s9",
    )
    xbar = "(CAST(c9 AS DOUBLE) / 1000000000 / n)"
    ybar = "(CAST(s9 AS DOUBLE) / 1000000000 / n)"
    r = f"sqrt(({xbar}) * ({xbar}) + ({ybar}) * ({ybar}))"
    return (
        terms.groupBy("event_type")
        .agg(
            F.sum("n_h").cast("bigint").alias("n"),
            F.sum("c9").cast("bigint").alias("c9"),
            F.sum("s9").cast("bigint").alias("s9"),
        )
        .selectExpr(
            "event_type",
            "n",
            mround(xbar, 6) + " AS mean_x",
            mround(ybar, 6) + " AS mean_y",
            mround(r, 6) + " AS resultant_r",
            mround(f"1 - ({r})", 6) + " AS circ_variance",
        )
    )


def _circadian_sql() -> str:
    xbar = "(CAST(c9 AS DOUBLE) / 1000000000 / n)"
    ybar = "(CAST(s9 AS DOUBLE) / 1000000000 / n)"
    r = f"sqrt(({xbar}) * ({xbar}) + ({ybar}) * ({ybar}))"
    return f"""
WITH cells AS (
  SELECT event_type, hour(ts) AS hod, CAST(count(*) AS BIGINT) AS n_h
  FROM events GROUP BY event_type, hour(ts)),
trig AS (SELECT * FROM (VALUES {_CIRC_VALUES}) AS t(hod, cx, sy)),
terms AS (
  SELECT event_type, n_h,
         CAST(floor(n_h * cx * 1000000000 + 0.5) AS BIGINT) AS c9,
         CAST(floor(n_h * sy * 1000000000 + 0.5) AS BIGINT) AS s9
  FROM cells JOIN trig USING (hod)),
agg AS (
  SELECT event_type, CAST(sum(n_h) AS BIGINT) AS n,
         CAST(sum(c9) AS BIGINT) AS c9, CAST(sum(s9) AS BIGINT) AS s9
  FROM terms GROUP BY event_type)
SELECT event_type, n,
       {mround(xbar, 6)} AS mean_x,
       {mround(ybar, 6)} AS mean_y,
       {mround(r, 6)} AS resultant_r,
       {mround(f"1 - ({r})", 6)} AS circ_variance
FROM agg
"""


QUERIES["events_circadian_profile"] = QuerySpec(
    events_circadian_profile, _circadian_sql(), "events"
)


# ---------------------------------------------------------------------------
# Haar wavelet energy decomposition of the hourly rate — round 10
# ---------------------------------------------------------------------------
#
# The time-LOCALIZED complement of events_spectral_energy's DFT: Haar
# detail energy at level j measures variability at the 2^j-hour scale
# (level 1 = hour-to-hour jitter, level 5 ~ intra-day structure, level 9 ~
# three-week drift), and the unnormalized Haar transform is PURE INTEGER
# arithmetic over counts — block-sum differences squared — so the whole
# decomposition is exact.

_HAAR_LEVELS = 9  # 2^9 = 512-hour analysis window from the first hour


def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per level j in 1..9: the number of Haar blocks, the detail energy
    sum((left-half sum - right-half sum)^2), and its share of total detail
    energy. The window is the FIRST 512 hours from the stream's first
    hour, zero-filled (absent hours are true zero-activity hours).

    Determinism: integer end-to-end; only the share divides (one fixed
    IEEE division of exact int64 operands, grid-rounded 1e-6). Block sums
    stay int64-exact to ~4e9 events/hour.

    Scale: the groupBy collapses the stream to hourly counts; all nine
    levels explode off the 512-row dense grid (512 x 9 rows), regrouped on
    (level, block) — bounded by the calendar window, not data volume."""
    e = load_table(spark, sf_dir, "events")
    hidx = "CAST(unix_micros(date_trunc('hour', ts)) div 3600000000 AS BIGINT)"
    counted = (
        e.selectExpr(f"{hidx} AS hidx")
        .groupBy("hidx")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rng = e.selectExpr(f"{hidx} AS h").agg(F.min("h").alias("lo"))
    spine = rng.selectExpr("explode(sequence(lo, lo + 511)) AS hidx", "lo")
    dense = spine.join(counted, "hidx", "left").selectExpr(
        "hidx - lo AS idx", "CAST(coalesce(n, 0) AS BIGINT) AS n"
    )
    levels = spark.range(1, _HAAR_LEVELS + 1).selectExpr(
        "CAST(id AS BIGINT) AS level"
    )
    signed = dense.crossJoin(F.broadcast(levels)).selectExpr(
        "level",
        "idx div shiftleft(CAST(1 AS BIGINT), CAST(level AS INT)) AS block",
        "n * (1 - 2 * ((idx div shiftleft(CAST(1 AS BIGINT),"
        " CAST(level AS INT) - 1)) % 2)) AS sgn",
    )
    detail = signed.groupBy("level", "block").agg(
        F.sum("sgn").cast("bigint").alias("d")
    )
    per_level = detail.groupBy("level").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum(F.expr("d * d")).cast("bigint").alias("energy"),
    )
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        per_level.withColumn("tot", F.sum("energy").over(wt))
        .selectExpr(
            "level",
            "shiftleft(CAST(1 AS BIGINT), CAST(level AS INT)) AS block_hours",
            "n_blocks",
            "energy",
            # nullif: an all-flat 512-hour window (zero detail energy at
            # every level) yields NULL, not 0/0 NaN (r10 advice)
            mround("CAST(energy AS DOUBLE) / nullif(tot, 0)", 6)
            + " AS energy_share",
        )
        .orderBy("level")
    )


EVENTS_HAAR_SQL = f"""
WITH counted AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hidx,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
rng AS (
  SELECT min(hidx) AS lo FROM counted),
dense AS (
  SELECT u.hidx - r.lo AS idx, CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM rng r, unnest(generate_series(r.lo, r.lo + 511)) AS u(hidx)
  LEFT JOIN counted c ON c.hidx = u.hidx),
levels AS (SELECT CAST(unnest(generate_series(1, {_HAAR_LEVELS})) AS BIGINT) AS level),
signed AS (
  SELECT level,
         idx // (CAST(1 AS BIGINT) << CAST(level AS INT)) AS block,
         n * (1 - 2 * ((idx // (CAST(1 AS BIGINT) << (CAST(level AS INT) - 1)))
              % 2)) AS sgn
  FROM dense CROSS JOIN levels),
detail AS (
  SELECT level, block, CAST(sum(sgn) AS BIGINT) AS d
  FROM signed GROUP BY level, block),
per_level AS (
  SELECT level, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(d * d) AS BIGINT) AS energy
  FROM detail GROUP BY level)
SELECT level,
       (CAST(1 AS BIGINT) << CAST(level AS INT)) AS block_hours,
       n_blocks, energy,
       {mround('CAST(energy AS DOUBLE) / nullif(sum(energy) OVER (), 0)', 6)} AS energy_share
FROM per_level
ORDER BY level
"""


QUERIES["events_haar_energy"] = QuerySpec(
    events_haar_energy, EVENTS_HAAR_SQL, "events"
)


# ---------------------------------------------------------------------------
# SLO error-budget burn rate — round 10
# ---------------------------------------------------------------------------
#
# The SRE consumption of the event stream: with availability SLO such that
# the error budget is 25% of events (sized to this stream's ~20% baseline
# error share so the readout is non-degenerate BOTH ways — breaching and
# healthy windows exist at every SF, the r9 degenerate-subject lesson),
# burn rate = (error share) / (budget share) per 6-hour window; fast-burn
# alerts fire past 1.2x.

_SLO_BUDGET_NUM, _SLO_BUDGET_DEN = 1, 4  # error budget = 1/4 of events
_SLO_WIN_US = 6 * 3600 * 1_000_000


def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 6-hour window: event count, error count, burn rate against the
    25% error budget, and the fast-burn flag (burn > 1.2). The flag is the
    pure-integer comparison 10 * 4 * n_err > 12 * n (no float threshold);
    burn itself is one fixed IEEE division grid-rounded 1e-6. Window
    identity is pure epoch arithmetic; the start column renders through
    date arithmetic (epoch day + hour), never a timezone conversion.

    Scale: one partial-agg groupBy onto the 6-hourly key space — the
    window table is calendar-bounded."""
    e = load_table(spark, sf_dir, "events")
    win = e.selectExpr(
        f"unix_micros(ts) div {_SLO_WIN_US} AS widx",
        "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err",
    ).groupBy("widx").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("is_err").cast("bigint").alias("n_errors"),
    )
    return win.selectExpr(
        "date_format(date_add(DATE '1970-01-01',"
        " CAST((widx * 6) div 24 AS INT)), 'yyyy-MM-dd') AS window_day",
        "CAST((widx * 6) % 24 AS BIGINT) AS window_hour",
        "n_events",
        "n_errors",
        mround(
            f"CAST({_SLO_BUDGET_DEN} AS DOUBLE) * n_errors"
            f" / {_SLO_BUDGET_NUM} / n_events",
            6,
        )
        + " AS burn_rate",
        f"CAST(CASE WHEN 10 * {_SLO_BUDGET_DEN} * n_errors"
        f" > 12 * {_SLO_BUDGET_NUM} * n_events THEN 1 ELSE 0 END AS BIGINT)"
        " AS fast_burn",
    )


EVENTS_SLO_BURN_SQL = f"""
WITH win AS (
  SELECT epoch_us(ts) // {_SLO_WIN_US} AS widx,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
           AS n_errors
  FROM events GROUP BY 1)
SELECT strftime(DATE '1970-01-01' + CAST((widx * 6) // 24 AS INT),
                '%Y-%m-%d') AS window_day,
       CAST((widx * 6) % 24 AS BIGINT) AS window_hour,
       n_events, n_errors,
       {mround(f'CAST({_SLO_BUDGET_DEN} AS DOUBLE) * n_errors'
               f' / {_SLO_BUDGET_NUM} / n_events', 6)} AS burn_rate,
       CAST(CASE WHEN 10 * {_SLO_BUDGET_DEN} * n_errors
                 > 12 * {_SLO_BUDGET_NUM} * n_events THEN 1 ELSE 0 END
            AS BIGINT) AS fast_burn
FROM win
"""


QUERIES["events_slo_burn_rate"] = QuerySpec(
    events_slo_burn_rate, EVENTS_SLO_BURN_SQL, "events"
)
