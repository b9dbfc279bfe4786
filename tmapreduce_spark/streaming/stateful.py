"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` — the arbitrary-state API the reference has no
analog for (its jobs are one-shot batch, ``job.h:26-39``).

State per user is a (count, value_sum) pair, updated per micro-batch and
emitted in update mode. State size is O(distinct users), independent of
stream length — the property that matters at 100 TB/day ingest.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) with explicit state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming funnel: per-user conversion state machine --------------------
#
# The streaming twin of the batch `events_funnel` catalog entry: stage 0→1 on
# the user's FIRST view, 1→2 on the first click within 1 hour after that
# view, 2→3 on the first purchase within 1 hour after that click. State per
# user is (stage, t_view_us, t_click_us) — three int64s, O(distinct users)
# total, the conversion-tracking shape every growth pipeline runs on a live
# stream. Rows are sorted by event time inside each micro-batch group, so
# with in-order delivery (or any replay from an ordered log) the final state
# reproduces the batch funnel exactly — asserted in tests/test_streaming.py.

FUNNEL_OUTPUT_SCHEMA = "user_id bigint, stage bigint"
FUNNEL_STATE_SCHEMA = "stage bigint, t_view bigint, t_click bigint"
_HOUR_US = 3_600_000_000


def _update_funnel_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    stage, t_view, t_click = state.get if state.exists else (0, -1, -1)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("ts_us", kind="stable")
    for typ, ts in zip(rows["event_type"], rows["ts_us"]):
        if stage == 0 and typ == "view":
            stage, t_view = 1, int(ts)
        elif stage == 1 and typ == "click" and t_view < ts <= t_view + _HOUR_US:
            stage, t_click = 2, int(ts)
        elif stage == 2 and typ == "purchase" and t_click < ts <= t_click + _HOUR_US:
            stage = 3
    state.update((stage, t_view, t_click))
    yield pd.DataFrame({"user_id": [user_id], "stage": [stage]})


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming view→click→purchase funnel with explicit per-user state.

    Late-arrival policy (ORDERED class, arrival-order fold): the stage
    machine only advances — a click arriving after the purchase already
    moved the user past stage 1 is ignored (stage never regresses), so a
    late row can only delay progression, never corrupt it. Batch equality
    requires in-order delivery; pinned in tests/test_streaming.py's
    replay-class table."""
    from pyspark.sql import functions as F

    return (
        events.select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel_state,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming EWMA: one double of state per user ---------------------------
#
# The unbounded form of the batch `window_ewma` catalog entry (which truncates
# at 16 lags to stay frame-local): on a live stream the recursion
# s = s*0.5 + x*0.5 needs exactly ONE double per user of state — the shape
# that holds at 100 TB/day, where any frame-based formulation would buffer.
# Rows are sorted by event time inside each micro-batch group; with in-order
# delivery the final state equals the full-history fold (asserted in
# tests/test_streaming.py against a Python reference fold).

EWMA_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, ewma double"
EWMA_STATE_SCHEMA = "n bigint, s double"


def _update_ewma_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="stable")
    for x in rows["value"]:
        s = float(x) if n == 0 else s * 0.5 + float(x) * 0.5
        n += 1
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "ewma": [s]})


def streaming_ewma(events: DataFrame) -> DataFrame:
    """Streaming per-user EWMA (alpha = 0.5) with one double of state.

    Late-arrival policy (ORDERED class, arrival-order fold): rows sort by
    event time WITHIN a micro-batch, but a row arriving in a later batch
    than its timestamp folds at its ARRIVAL position — the recursion is
    order-sensitive, so batch equality requires in-order delivery (an
    ordered-log replay); the fold-at-arrival behavior is pinned in
    tests/test_streaming.py's replay-class table."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma_state,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming last-touch attribution ---------------------------------------
#
# Streaming twin of the batch `events_attribution_last_touch` catalog entry:
# state per user is the latest click/view (id, ts, type) — three scalars.
# Each purchase emits its attribution row the moment it arrives, credited to
# the remembered touch iff it falls within the 24 h horizon. With in-order
# delivery the emitted rows are EXACTLY the batch operator's output
# (asserted in tests/test_streaming.py) — the live-conversion-credit shape.

ATTRIB_OUTPUT_SCHEMA = (
    "user_id bigint, purchase_id bigint, purchase_us bigint, "
    "touch_id bigint, touch_type string, gap_us bigint, organic boolean"
)
ATTRIB_STATE_SCHEMA = "t_ev bigint, t_us bigint, t_ty string"
_ATTRIB_HORIZON_US = 24 * 3_600_000_000


def _update_attrib_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    t_ev, t_us, t_ty = state.get if state.exists else (-1, -1, "")
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="stable")
    out: list[tuple] = []
    for ev, ty, ts in zip(rows["event_id"], rows["event_type"], rows["ts_us"]):
        if ty == "purchase":
            if t_us >= 0 and int(ts) - t_us <= _ATTRIB_HORIZON_US:
                out.append(
                    (user_id, int(ev), int(ts), t_ev, t_ty, int(ts) - t_us, False)
                )
            else:
                out.append((user_id, int(ev), int(ts), None, None, None, True))
        elif ty in ("click", "view"):
            t_ev, t_us, t_ty = int(ev), int(ts), ty
    state.update((t_ev, t_us, t_ty))
    cols = [
        "user_id", "purchase_id", "purchase_us",
        "touch_id", "touch_type", "gap_us", "organic",
    ]
    yield pd.DataFrame(out, columns=cols)


def streaming_attribution(events: DataFrame) -> DataFrame:
    """Streaming last-touch attribution with three scalars of state per
    user; purchase rows emit their credit immediately.

    Late-arrival policy (ORDERED class, arrival-order fold): a purchase is
    credited against the touch state AT ARRIVAL and its row is already
    emitted — a touch arriving later than the purchase it preceded in
    event time does NOT retro-credit it (no emitted row is ever revised);
    the late touch only affects purchases that arrive after it. Pinned in
    tests/test_streaming.py's replay-class table."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_attrib_state,
            outputStructType=ATTRIB_OUTPUT_SCHEMA,
            stateStructType=ATTRIB_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming Misra-Gries heavy hitters: fixed-size counter state ----------
#
# Streaming twin of the batch `text_heavy_hitters_mg` (same decrement rule):
# at most MG_K counters of state TOTAL, regardless of stream length or key
# cardinality — the top-talker/hot-key alarm shape. Single logical group
# (constant key) = the mergeable-summary form; the sharded deployment runs
# one instance per hash shard and merges summaries, exactly like the batch
# operator's per-partition pass. MG guarantee (asserted in tests): any key
# with true frequency > N/(MG_K+1) is in the final candidate set.

MG_K = 8
MG_OUTPUT_SCHEMA = "slot bigint, key bigint, cnt bigint"
MG_STATE_SCHEMA = "ids array<bigint>, counts array<bigint>"


def _update_mg_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    ids, counts = state.get if state.exists else ([], [])
    summary = dict(zip(ids, counts))
    for pdf in pdfs:
        for k in pdf["user_id"]:
            k = int(k)
            if k in summary:
                summary[k] += 1
            elif len(summary) < MG_K:
                summary[k] = 1
            else:  # decrement-all: evict zeros (the MG step)
                summary = {kk: c - 1 for kk, c in summary.items() if c > 1}
    state.update((list(summary.keys()), list(summary.values())))
    items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {
            "slot": list(range(len(items))),
            "key": [k for k, _ in items],
            "cnt": [c for _, c in items],
        }
    )


def streaming_heavy_hitters(events: DataFrame) -> DataFrame:
    """Streaming Misra-Gries top-talker summary with MG_K counters of
    total state."""
    from pyspark.sql import functions as F

    return (
        events.select("user_id", F.lit(0).alias("g"))
        .groupBy("g")
        .applyInPandasWithState(
            _update_mg_state,
            outputStructType=MG_OUTPUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming max drawdown --------------------------------------------------
#
# Streaming twin of the batch `events_drawdown_max` catalog entry: state per
# user is (cum, peak, max_dd) — three int64s in exact value micro-units, so
# the stream NEVER accumulates float error no matter how long it runs. With
# in-order delivery the emitted rows equal the batch operator's output
# (asserted in tests/test_streaming.py) — the live risk-monitor shape.

DRAWDOWN_OUTPUT_SCHEMA = (
    "user_id bigint, max_drawdown double, peak_value double, final_value double"
)
# `started` distinguishes the empty state from a state whose first cum was 0:
# the batch twin's running max STARTS at the first cumulative sum (not 0), so
# a first NEGATIVE value must yield peak = that value, drawdown = 0.
DRAWDOWN_STATE_SCHEMA = "cum bigint, peak bigint, dd bigint, started boolean"


def drawdown_fold(
    state: tuple[int, int, int, bool], values
) -> tuple[int, int, int, bool]:
    """Pure exact-integer drawdown fold shared by the streaming updater and
    its tests: quantize with floor(x*1e6 + 0.5) (identical to the batch
    `cents()` grid — int() would truncate negatives one micro off), seed
    peak at the FIRST cumulative sum, then running-max."""
    import math

    cum, peak, dd, started = state
    for x in values:
        cum += math.floor(float(x) * 1_000_000 + 0.5)
        if not started:
            peak = cum
            started = True
        else:
            peak = max(peak, cum)
        dd = max(dd, peak - cum)
    return cum, peak, dd, started


def _update_drawdown_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    st = state.get if state.exists else (0, 0, 0, False)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="stable")
    cum, peak, dd, started = drawdown_fold(tuple(st), rows["value"])
    state.update((cum, peak, dd, started))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "max_drawdown": [dd / 1_000_000],
            "peak_value": [peak / 1_000_000],
            "final_value": [cum / 1_000_000],
        }
    )


def streaming_drawdown(events: DataFrame) -> DataFrame:
    """Streaming per-user maximum drawdown with three int64s of state.

    Late-arrival policy (ORDERED class, arrival-order fold): `cum` is a
    commutative int64 sum (exact under ANY order), but peak/max_drawdown
    are PREFIX maxima — a late row folds at arrival position, so those two
    equal the batch twin only under in-order delivery. Pinned in
    tests/test_streaming.py's replay-class table (cum invariance asserted
    under shuffle, peak/dd under in-order replay)."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_drawdown_state,
            outputStructType=DRAWDOWN_OUTPUT_SCHEMA,
            stateStructType=DRAWDOWN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming rate-spike alerting -------------------------------------------
#
# Streaming twin of the batch `events_rate_spike` catalog entry: state per
# event type is the trailing window of hourly counts — at most LOOKBACK+1
# (hidx, count) pairs, pruned against the newest hour seen, so state is
# bounded by the CALENDAR window regardless of stream length. Under in-order
# replay the LAST emission per (type, hour) equals the batch operator's row
# exactly (asserted in tests/test_streaming.py): early emissions carry
# partial counts and are superseded, the alerting-dashboard shape.

SPIKE_OUTPUT_SCHEMA = (
    "event_type string, hidx bigint, n bigint, spike_ratio double,"
    " is_spike boolean"
)
SPIKE_STATE_SCHEMA = "hidxs array<bigint>, counts array<bigint>"


def _update_spike_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    from tmapreduce_spark.operators.analytics import (
        _SPIKE_LOOKBACK,
        _SPIKE_WARMUP,
    )

    (etype,) = key
    hs, cs = state.get if state.exists else ([], [])
    buckets = dict(zip(hs, cs))
    touched = set()
    for pdf in pdfs:
        for h in pdf["hidx"]:
            h = int(h)
            buckets[h] = buckets.get(h, 0) + 1
            touched.add(h)
    rows = []
    # emit from the UN-pruned dict: an older hour touched in this batch
    # still needs its full [h-24, h-1] baseline even when the batch also
    # advanced the newest hour past it (pruning first would drop the
    # oldest baseline bucket and inflate the ratio)
    for h in sorted(touched):
        base = [c for hh, c in buckets.items() if h - _SPIKE_LOOKBACK <= hh <= h - 1]
        cnt_prev, sum_prev = len(base), sum(base)
        if cnt_prev >= _SPIKE_WARMUP:
            n = buckets[h]
            ratio = math.floor(float(n * cnt_prev) / sum_prev * 1_000_000 + 0.5) / 1_000_000
            rows.append((etype, h, n, ratio, bool(3 * sum_prev <= n * cnt_prev)))
    if buckets:
        mx = max(buckets)
        buckets = {h: c for h, c in buckets.items() if h >= mx - _SPIKE_LOOKBACK}
    state.update((list(buckets.keys()), list(buckets.values())))
    yield pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "hidx": [r[1] for r in rows],
            "n": [r[2] for r in rows],
            "spike_ratio": [r[3] for r in rows],
            "is_spike": [r[4] for r in rows],
        }
    )


def streaming_rate_spike(events: DataFrame) -> DataFrame:
    """Streaming hourly rate-spike alerts per event type with a bounded
    trailing-24h count window of state.

    Late-arrival policy (BOUNDED-LATENESS class): hourly counts are
    additive-commutative, so any arrival order WITHIN the retained
    [max-24h, max] window converges to the same state (pinned in
    tests/test_streaming.py's replay-class table); an event later than
    that window re-opens a partial bucket — it can emit a superseded row
    but cannot grow state past the calendar bound. That lateness horizon
    is exactly the 24 h the baseline itself needs, i.e. the watermark an
    operator would configure."""
    return (
        events.selectExpr(
            "event_type",
            "CAST(unix_micros(date_trunc('hour', ts)) div 3600000000 AS BIGINT)"
            " AS hidx",
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_spike_state,
            outputStructType=SPIKE_OUTPUT_SCHEMA,
            stateStructType=SPIKE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming sessionized funnel --------------------------------------------
#
# Streaming twin of the batch `events_sessionized_funnel` catalog entry: state
# per user is (last event time, session count, funnel stage, first-view /
# first-qualifying-click times, per-user session counters) — eight int64s,
# O(distinct users) total. The 15-min gap rule and the ordered
# view -> click(>= view) -> purchase(>= click) chain replicate the batch
# operator's cascading-min semantics event-for-event under in-order replay;
# the LAST emission per user equals the batch row exactly (asserted in
# tests/test_streaming.py) — the live conversion dashboard shape.

SFUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, n_sessions bigint, n_view_sessions bigint,"
    " n_click_sessions bigint, n_converted bigint, session_cvr double"
)
SFUNNEL_STATE_SCHEMA = (
    "last_us bigint, n_sess bigint, stage bigint, t_view bigint,"
    " t_click bigint, n_view bigint, n_click bigint, n_conv bigint"
)
_SESSION_GAP_US = 900_000_000


def _update_sfunnel_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    (user_id,) = key
    last_us, n_sess, stage, t_view, t_click, n_view, n_click, n_conv = (
        state.get if state.exists else (-1, 0, 0, -1, -1, 0, 0, 0)
    )
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="stable")
    for ty, ts in zip(rows["event_type"], rows["ts_us"]):
        ts = int(ts)
        if last_us < 0 or ts - last_us > _SESSION_GAP_US:
            n_sess += 1
            stage, t_view, t_click = 0, -1, -1
        last_us = ts
        if stage == 0 and ty == "view":
            stage, t_view = 1, ts
            n_view += 1
        elif stage == 1 and ty == "click" and ts >= t_view:
            stage, t_click = 2, ts
            n_click += 1
        elif stage == 2 and ty == "purchase" and ts >= t_click:
            stage = 3
            n_conv += 1
    state.update(
        (last_us, n_sess, stage, t_view, t_click, n_view, n_click, n_conv)
    )
    cvr = (
        math.floor(float(n_conv) / n_sess * 1_000_000 + 0.5) / 1_000_000
        if n_sess
        else 0.0
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_sessions": [n_sess],
            "n_view_sessions": [n_view],
            "n_click_sessions": [n_click],
            "n_converted": [n_conv],
            "session_cvr": [cvr],
        }
    )


def streaming_sessionized_funnel(events: DataFrame) -> DataFrame:
    """Streaming per-user in-session funnel with eight int64s of state.

    Late-arrival policy (ORDERED class, arrival-order fold): the 15-min
    gap rule compares each row to the last APPLIED timestamp, so a late
    row folds at arrival — it may open a spurious session boundary
    relative to the batch answer; equality holds under in-order delivery.
    Pinned in tests/test_streaming.py's replay-class table."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sfunnel_state,
            outputStructType=SFUNNEL_OUTPUT_SCHEMA,
            stateStructType=SFUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming HDR gap histogram ---------------------------------------------
#
# Streaming twin of the batch `agg_hdr_latency_percentiles` catalog entry,
# and the executable proof of its mergeability claim: each user's state is
# (last event timestamp, partial HDR bin counts) — bins are VALUE-determined
# (power-of-two exponent x HDR_SUBS linear sub-buckets), so the per-user
# partial histograms emitted here merge by plain addition into the exact
# global histogram, and the merged percentiles equal the batch operator's
# row bit-for-bit (asserted in tests/test_streaming.py). Per-user grouping
# keeps the stream scale-true (no single-key funnel); state is bounded by
# the bin layout (<= ~500 bins) + one timestamp per user.

HDR_OUTPUT_SCHEMA = (
    "user_id bigint, bin_los array<bigint>, counts array<bigint>,"
    " max_gap bigint, n_gaps bigint"
)
HDR_STATE_SCHEMA = (
    "last_us bigint, started boolean, bin_los array<bigint>,"
    " counts array<bigint>, max_gap bigint"
)


def hdr_bin_lo(gap_ms: int, subs: int = 8) -> int:
    """Bin lower bound of the batch operator's HDR layout — the single
    python definition, shared by the streaming updater and the merge test
    (mirrors the SQL: exact below `subs`; (subs + sub) << (e - sb) above,
    e = bit length - 1, sb = log2(subs) — derived, so a future HDR_SUBS
    change cannot silently break the shift the way a hardcoded -3 would)."""
    if gap_ms < subs:
        return gap_ms
    sb = subs.bit_length() - 1
    e = gap_ms.bit_length() - 1
    sub = (gap_ms >> (e - sb)) & (subs - 1)
    return (subs + sub) << (e - sb)


def _update_hdr_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_us, started, bin_los, counts, max_gap = (
        state.get if state.exists else (0, False, [], [], 0)
    )
    bins = dict(zip(bin_los, counts))
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="stable")
    for us in rows["ts_us"]:
        us = int(us)
        if started:
            if us < last_us:
                # late arrival relative to state already emitted across an
                # earlier micro-batch: a negative gap is not a latency —
                # drop the row (the watermark-discard policy; the batch
                # twin sees globally sorted input so this path never
                # fires under in-order replay)
                continue
            gap_ms = (us - last_us) // 1000
            b = hdr_bin_lo(gap_ms)
            bins[b] = bins.get(b, 0) + 1
            max_gap = max(max_gap, gap_ms)
        last_us, started = us, True
    items = sorted(bins.items())
    state.update(
        (last_us, started, [b for b, _ in items], [c for _, c in items], max_gap)
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "bin_los": [[b for b, _ in items]],
            "counts": [[c for _, c in items]],
            "max_gap": [max_gap],
            "n_gaps": [sum(c for _, c in items)],
        }
    )


def streaming_hdr_gaps(events: DataFrame) -> DataFrame:
    """Streaming per-user HDR gap histogram — mergeable partials whose sum
    reproduces the batch percentile row exactly."""
    from pyspark.sql import functions as F

    return (
        events.select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_hdr_state,
            outputStructType=HDR_OUTPUT_SCHEMA,
            stateStructType=HDR_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming rolling-p90 gap monitor ---------------------------------------
#
# Streaming twin of the batch `window_rolling_p90` catalog entry: per-user
# state is the previous event time plus the trailing ROLL_P90_W gap values
# (a bounded int64 ring — ~130 B/user, O(distinct users) total). Each
# micro-batch emits the user's LATEST rolling-p90 row; with in-order delivery
# the final emission per user equals the batch operator's max-seq row exactly
# (asserted in tests/test_streaming.py) — the live tail-latency SLO shape.

ROLLP90_OUTPUT_SCHEMA = (
    "user_id bigint, seq bigint, gap_us bigint, n_window bigint, p90_gap_us bigint"
)
ROLLP90_STATE_SCHEMA = "prev_us bigint, started boolean, seq bigint, gaps array<bigint>"


def _update_rollp90_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from tmapreduce_spark.operators.windows import ROLL_P90_W

    (user_id,) = key
    prev_us, started, seq, gaps = (
        state.get if state.exists else (0, False, 0, [])
    )
    gaps = list(gaps)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="stable")
    last_gap = None
    for us in rows["ts_us"]:
        us = int(us)
        if started:
            if us < prev_us:
                continue  # late arrival past emitted state: watermark-discard
            last_gap = us - prev_us
            seq += 1
            gaps.append(last_gap)
            if len(gaps) > ROLL_P90_W:
                gaps = gaps[-ROLL_P90_W:]
        prev_us, started = us, True
    state.update((prev_us, started, seq, gaps))
    if seq == 0:
        return  # no gap yet — nothing to monitor (matches the batch filter)
    frame = sorted(gaps)
    # identical 1-based lower-percentile index to the batch recipe
    p90 = frame[(9 * len(frame) + 9) // 10 - 1]
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "seq": [seq],
            "gap_us": [gaps[-1] if last_gap is None else last_gap],
            "n_window": [len(gaps)],
            "p90_gap_us": [p90],
        }
    )


def streaming_rolling_p90(events: DataFrame) -> DataFrame:
    """Streaming per-user rolling p90 of the inter-event gap (bounded
    trailing-window state)."""
    from pyspark.sql import functions as F

    return (
        events.select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_rollp90_state,
            outputStructType=ROLLP90_OUTPUT_SCHEMA,
            stateStructType=ROLLP90_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming hourly peak detection -----------------------------------------
#
# Streaming twin of the batch `window_peak_detect` catalog entry. State is
# the zero-filled hourly count array from the first seen hour — bounded by
# WALL-CLOCK hours, the same argument the batch operator makes for its dense
# series, so it stays tiny no matter the event volume. Counts are pure
# commutative increments, so unlike the gap-based twins this one converges
# to the batch answer under ANY arrival order, not just in-order replay.
# Each micro-batch re-evaluates the strict local-maximum rule over the
# current series and emits the full confirmed-peak list as one array row;
# the final emission equals the batch rows exactly. At production scale the
# stream would be pre-aggregated to (hour, n) upstream, so the single-group
# reduce sees calendar-sized input, not the raw firehose.

PEAKS_OUTPUT_SCHEMA = (
    "n_hours bigint, peak_hidx array<bigint>, peak_height array<bigint>, "
    "prominence array<bigint>"
)
PEAKS_STATE_SCHEMA = "lo_hidx bigint, started boolean, counts array<bigint>"


def _update_peaks_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from tmapreduce_spark.operators.analytics import PEAK_MIN_HEIGHT, PEAK_NEIGHBORS

    lo, started, counts = state.get if state.exists else (0, False, [])
    counts = list(counts)
    for pdf in pdfs:
        for h in pdf["hidx"]:
            h = int(h)
            if not started:
                lo, started, counts = h, True, [0]
            if h < lo:  # extend the series downward (out-of-order is fine)
                counts = [0] * (lo - h) + counts
                lo = h
            elif h - lo >= len(counts):
                counts.extend([0] * (h - lo - len(counts) + 1))
            counts[h - lo] += 1
    state.update((lo, started, counts))
    k = PEAK_NEIGHBORS
    hidxs, heights, proms = [], [], []
    for i in range(k, len(counts) - k):
        n = counts[i]
        left, right = counts[i - k : i], counts[i + 1 : i + 1 + k]
        if n >= PEAK_MIN_HEIGHT and n > max(left) and n > max(right):
            hidxs.append(lo + i)
            heights.append(n)
            proms.append(n - max(min(left), min(right)))
    yield pd.DataFrame(
        {
            "n_hours": [len(counts)],
            "peak_hidx": [hidxs],
            "peak_height": [heights],
            "prominence": [proms],
        }
    )


def streaming_peak_detect(events: DataFrame) -> DataFrame:
    """Streaming hourly peak detector over the zero-filled event-rate
    series (order-insensitive commutative counts; calendar-bounded state)."""
    from pyspark.sql import functions as F

    return (
        events.selectExpr(
            "CAST(unix_micros(date_trunc('hour', ts)) div 3600000000 AS BIGINT)"
            " AS hidx",
            "CAST(0 AS INT) AS g",
        )
        .groupBy("g")
        .applyInPandasWithState(
            _update_peaks_state,
            outputStructType=PEAKS_OUTPUT_SCHEMA,
            stateStructType=PEAKS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming SCD2 dimension maintenance ------------------------------------
#
# Streaming twin of the batch `pipeline_scd2_orders_status` catalog entry —
# live type-2 dimension maintenance: per customer the state is the run-length
# encoded status history (one (status, valid_from) pair per CHANGE, bounded
# by the number of changes, i.e. exactly the SCD2 table the batch operator
# emits — the history IS the product here, so state size equals output size
# by construction) plus the last-seen (date, orderkey) cursor for the
# in-order contract. Each micro-batch emits the full current history as one
# array row; with in-order delivery the final emission per key equals the
# batch operator's rows exactly (asserted in tests/test_streaming.py).

SCD2_OUTPUT_SCHEMA = (
    "o_custkey bigint, n_seen bigint, statuses array<string>,"
    " valid_froms array<string>"
)
SCD2_STATE_SCHEMA = (
    "last_od string, last_okey bigint, n_seen bigint,"
    " statuses array<string>, vfroms array<string>, started boolean"
)


def _update_scd2_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (custkey,) = key
    last_od, last_okey, n_seen, statuses, vfroms, started = (
        state.get if state.exists else ("", 0, 0, [], [], False)
    )
    statuses, vfroms = list(statuses), list(vfroms)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["od", "o_orderkey"], kind="stable")
    for od, okey, status in zip(rows["od"], rows["o_orderkey"], rows["o_orderstatus"]):
        okey = int(okey)
        if started and (od, okey) <= (last_od, last_okey):
            # Late past emitted state: watermark-discard policy. <= not <:
            # o_orderkey is unique, so an EQUAL cursor is always an
            # at-least-once redelivery of the last processed row — without
            # the equality n_seen drifts from rows-seen under duplicate
            # delivery (status run-length is unaffected either way).
            continue
        if not statuses or status != statuses[-1]:
            statuses.append(status)
            vfroms.append(od)
        last_od, last_okey, started = od, okey, True
        n_seen += 1
    state.update((last_od, last_okey, n_seen, statuses, vfroms, started))
    yield pd.DataFrame(
        {
            "o_custkey": [custkey],
            "n_seen": [n_seen],
            "statuses": [statuses],
            "valid_froms": [vfroms],
        }
    )


def streaming_scd2(orders: DataFrame) -> DataFrame:
    """Streaming SCD2 maintenance over an orders change stream (state =
    the run-length status history per key, i.e. the SCD2 table itself)."""
    from pyspark.sql import functions as F

    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
        )
        .groupBy("o_custkey")
        .applyInPandasWithState(
            _update_scd2_state,
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming CUPED moment partials -----------------------------------------
#
# Streaming twin of the batch `events_cuped_lift` catalog entry: per-user
# state is the pair of exact int64 milli-dollar sums (pre-period covariate x,
# post-period outcome y) plus a row counter. Addition COMMUTES, so the final
# state per user is identical under ANY arrival order — no late-arrival
# policy needed, the strongest batch-stream equality class (same as the HDR
# histogram). Merging the final per-user partials through the identical
# CUPED algebra reproduces the batch row exactly (asserted in
# tests/test_streaming.py) — the live always-on experiment readout.

CUPED_OUTPUT_SCHEMA = (
    "user_id bigint, n_purchases bigint, treat int, x_milli bigint, y_milli bigint"
)
CUPED_STATE_SCHEMA = "n bigint, x bigint, y bigint"


def _update_cuped_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    from tmapreduce_spark.operators.analytics import _CUPED_UNIT, _DID_POST_US

    (user_id,) = key
    n, x, y = state.get if state.exists else (0, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # identical per-row quantization to the batch twin's cents('value', 1000)
    q = np.floor(rows["value"].to_numpy() * _CUPED_UNIT + 0.5).astype("int64")
    post = rows["ts_us"].to_numpy() >= _DID_POST_US
    n += len(rows)
    x += int(q[~post].sum())
    y += int(q[post].sum())
    state.update((n, x, y))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_purchases": [n],
            "treat": [1 if user_id % 2 == 0 else 0],
            "x_milli": [x],
            "y_milli": [y],
        }
    )


def streaming_cuped_moments(events: DataFrame) -> DataFrame:
    """Streaming per-user CUPED moment partials — commutative int64 sums
    whose final values merged through the batch algebra reproduce
    `events_cuped_lift` exactly."""
    from pyspark.sql import functions as F

    return (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_cuped_state,
            outputStructType=CUPED_OUTPUT_SCHEMA,
            stateStructType=CUPED_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming DiD cell partials ----------------------------------------------
#
# Streaming twin of the batch `events_did_lift` catalog entry: state is keyed
# by the (treat, period) DESIGN CELL — six keys total, each holding the exact
# int64 (n, sum of value-micros) pair. Addition commutes, so the final cell
# states are identical under ANY arrival order; recombining them through the
# batch contrast algebra reproduces the DiD row exactly (asserted in
# tests/test_streaming.py) — the always-on experiment dashboard shape, with
# state bounded by the design (6 rows), not the data.

DID_OUTPUT_SCHEMA = "treat int, per int, n bigint, s_micro bigint"
DID_STATE_SCHEMA = "n bigint, s bigint"


def _update_did_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    treat, per = int(key[0]), int(key[1])
    n, s = state.get if state.exists else (0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # identical per-row quantization to the batch twin's cents('value')
    q = np.floor(rows["value"].to_numpy() * 1_000_000 + 0.5).astype("int64")
    n += len(rows)
    s += int(q.sum())
    state.update((n, s))
    yield pd.DataFrame({"treat": [treat], "per": [per], "n": [n], "s_micro": [s]})


def streaming_did_cells(events: DataFrame) -> DataFrame:
    """Streaming DiD design-cell partials — six commutative int64 states
    whose final values recombined through the batch contrast algebra equal
    `events_did_lift` exactly."""
    from pyspark.sql import functions as F

    from tmapreduce_spark.operators.analytics import _DID_MID_US, _DID_POST_US

    proj = events.filter(F.col("event_type") == "purchase").selectExpr(
        "CASE WHEN (user_id % 2) = 0 THEN 1 ELSE 0 END AS treat",
        f"CASE WHEN unix_micros(ts) >= {_DID_POST_US} THEN 2"
        f" WHEN unix_micros(ts) >= {_DID_MID_US} THEN 1 ELSE 0 END AS per",
        "value",
    )
    return proj.groupBy("treat", "per").applyInPandasWithState(
        _update_did_state,
        outputStructType=DID_OUTPUT_SCHEMA,
        stateStructType=DID_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming Jarque-Bera moment partials ------------------------------------
#
# Streaming twin of the batch `agg_jarque_bera` catalog entry: state per
# event type is the exact int64 power sums (n, s1..s4) of the whole-dollar
# value — addition COMMUTES, so the final state is identical under ANY
# arrival order (the HDR/CUPED equality class; no late-arrival policy
# needed) and state is bounded by the type key space (5 rows), not the data.
# Merging the final partials through the identical moment algebra reproduces
# the batch skewness/kurtosis/JB row exactly (asserted in
# tests/test_streaming.py) — a live normality dashboard over the stream.

JB_OUTPUT_SCHEMA = (
    "event_type string, n bigint, s1 bigint, s2 bigint, s3 bigint, s4 bigint"
)
JB_STATE_SCHEMA = "n bigint, s1 bigint, s2 bigint, s3 bigint, s4 bigint"


def _update_jb_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    (etype,) = key
    n, s1, s2, s3, s4 = state.get if state.exists else (0, 0, 0, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # identical per-row quantization to the batch twin's floor(value)
    w = np.floor(rows["value"].to_numpy()).astype("int64")
    n += len(w)
    s1 += int(w.sum())
    s2 += int((w * w).sum())
    s3 += int((w * w * w).sum())
    s4 += int((w * w * w * w).sum())
    state.update((n, s1, s2, s3, s4))
    yield pd.DataFrame(
        {
            "event_type": [etype],
            "n": [n],
            "s1": [s1],
            "s2": [s2],
            "s3": [s3],
            "s4": [s4],
        }
    )


def streaming_jb_moments(events: DataFrame) -> DataFrame:
    """Streaming per-event-type power-sum partials — commutative int64
    state whose final values pushed through the batch moment algebra
    reproduce `agg_jarque_bera` exactly."""
    return events.select("event_type", "value").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _update_jb_state,
        outputStructType=JB_OUTPUT_SCHEMA,
        stateStructType=JB_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming conversion-cell partials ---------------------------------------
#
# Streaming twin of the batch `events_conversion_ztest` catalog entry: state
# per user is the big-ticket-converted flag (max of 0/1 — idempotent AND
# commutative, so duplicates and reordering are both harmless: the strongest
# equality class, stricter than the additive CUPED/JB states). Merging the
# final per-user flags through the identical pooled-z algebra reproduces the
# batch readout exactly — the always-on experiment conversion dashboard.

CONV_OUTPUT_SCHEMA = "user_id bigint, treat int, converted int"
CONV_STATE_SCHEMA = "c int"


def _update_conv_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    (c,) = state.get if state.exists else (0,)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # identical per-row predicate to the batch twin: purchase AND value > 200
    hit = (
        (rows["event_type"] == "purchase") & (rows["value"] > 200)
    ).any()
    c = max(c, int(hit))
    state.update((c,))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "treat": [1 if user_id % 2 == 0 else 0],
            "converted": [c],
        }
    )


def streaming_conversion_flags(events: DataFrame) -> DataFrame:
    """Streaming per-user conversion flags — idempotent-commutative state
    whose final values pushed through the batch pooled-z algebra reproduce
    `events_conversion_ztest` exactly."""
    return events.select("user_id", "event_type", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _update_conv_state,
        outputStructType=CONV_OUTPUT_SCHEMA,
        stateStructType=CONV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# 14th twin: streaming circadian hourly-count partials — round 10
# ---------------------------------------------------------------------------
#
# State = the per-event-type 24-slot hour-of-day count vector — ADDITIVE
# COMMUTATIVE int64 increments (the CUPED/JB equality class: any arrival
# order converges; exactly-once delivery assumed as for every additive
# state). Pushing the final counts through the IDENTICAL literal
# unit-vector algebra reproduces events_circadian_profile's batch row —
# the always-on daily-rhythm monitor.

CIRC_OUTPUT_SCHEMA = "event_type string, hour_counts array<bigint>"
CIRC_STATE_SCHEMA = "h array<bigint>"


def _update_circ_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    (h,) = state.get if state.exists else ([0] * 24,)
    h = list(h)
    rows = pd.concat(list(pdfs), ignore_index=True)
    for hod, cnt in rows["ts"].dt.hour.value_counts().items():
        h[int(hod)] += int(cnt)
    state.update((h,))
    yield pd.DataFrame({"event_type": [event_type], "hour_counts": [h]})


def streaming_circadian_partials(events: DataFrame) -> DataFrame:
    """Streaming hour-of-day count partials per event type; the final
    per-type vectors merged through the batch literal-trig algebra equal
    `events_circadian_profile` exactly."""
    return events.select("event_type", "ts").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _update_circ_state,
        outputStructType=CIRC_OUTPUT_SCHEMA,
        stateStructType=CIRC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# 15th twin: streaming SLO burn-rate window counts — round 10
# ---------------------------------------------------------------------------
#
# State = (n_events, n_errors) per 6-hour window — additive commutative
# int64, so late or reordered events land in their window regardless of
# arrival order. The final cells pushed through the identical burn/flag
# algebra equal events_slo_burn_rate — the streaming form IS how an SRE
# burn alert actually runs.

SLO_OUTPUT_SCHEMA = "widx bigint, n_events bigint, n_errors bigint"
SLO_STATE_SCHEMA = "n bigint, e bigint"


def _update_slo_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (widx,) = key
    n, e = state.get if state.exists else (0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    n += len(rows)
    e += int((rows["event_type"] == "error").sum())
    state.update((n, e))
    yield pd.DataFrame({"widx": [widx], "n_events": [n], "n_errors": [e]})


def streaming_slo_window_counts(events: DataFrame) -> DataFrame:
    """Streaming (n, n_err) cells per 6-hour epoch window; final cells
    merged through the batch burn algebra equal `events_slo_burn_rate`."""
    keyed = events.selectExpr(
        "unix_micros(ts) div 21600000000 AS widx", "event_type"
    )
    return keyed.groupBy("widx").applyInPandasWithState(
        _update_slo_state,
        outputStructType=SLO_OUTPUT_SCHEMA,
        stateStructType=SLO_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# 16th twin: streaming contingency cells for the G-test — round 10
# ---------------------------------------------------------------------------
#
# State = one int64 count per (priority, status) cell — additive
# commutative, so the contingency table converges under any arrival order.
# The final 15 cells pushed through the identical grid-rounded G algebra
# reproduce agg_gtest_independence — the independence monitor running
# continuously over the order feed instead of as a batch audit.

GTEST_OUTPUT_SCHEMA = "o_orderpriority string, o_orderstatus string, n bigint"
GTEST_STATE_SCHEMA = "n bigint"


def _update_gtest_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    prio, status = key
    (n,) = state.get if state.exists else (0,)
    rows = pd.concat(list(pdfs), ignore_index=True)
    n += len(rows)
    state.update((n,))
    yield pd.DataFrame(
        {"o_orderpriority": [prio], "o_orderstatus": [status], "n": [n]}
    )


def streaming_gtest_cells(orders: DataFrame) -> DataFrame:
    """Streaming contingency cells; final cells merged through the batch
    G-test algebra equal `agg_gtest_independence` exactly."""
    return orders.select("o_orderpriority", "o_orderstatus").groupBy(
        "o_orderpriority", "o_orderstatus"
    ).applyInPandasWithState(
        _update_gtest_state,
        outputStructType=GTEST_OUTPUT_SCHEMA,
        stateStructType=GTEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
