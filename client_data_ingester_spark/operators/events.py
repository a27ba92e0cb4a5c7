"""Event-stream operators over the events table ([EXT], SURVEY §2.9).

Batch expressions of the streaming semantics (the same groupBys run under
``readStream`` + ``withWatermark`` — see streaming/; watermarking only changes
*when* results emit, not *what* they are, so the batch form is the oracle-able
one).

Numeric policy: value sums go through ``cast(decimal(18,2))`` before SUM so
the result is exact and engine-portable (double summation is
partition-order-dependent); averages divide the exact sum in double and round
at a fixed scale; all derived numeric outputs are emitted as DOUBLE (the
final cast) so the cross-engine value-hash sees one canonical rendering. Epoch arithmetic uses floor-to-second on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

D182 = "decimal(18,2)"


def tumbling_window_agg(events: DataFrame, window: str = "hour") -> DataFrame:
    """Tumbling event-time windows (date_trunc form — portable; the streaming
    twin uses F.window which emits struct bounds)."""
    return events.groupBy(
        F.date_trunc(window, F.col("ts")).alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(D182)).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def hopping_window_agg(
    events: DataFrame, size_minutes: int = 60, slide_minutes: int = 30
) -> DataFrame:
    """Hopping (sliding) event-time windows via native ``F.window`` — each
    event lands in size/slide overlapping windows (here 2), epoch-aligned to
    the slide. The streaming twin runs the same expression under a watermark;
    the struct bounds are flattened to plain timestamp columns for the
    cross-engine hash."""
    if size_minutes % slide_minutes != 0:
        raise ValueError(
            f"slide ({slide_minutes}m) must divide size ({size_minutes}m)"
        )
    w = F.window(
        F.col("ts"), f"{size_minutes} minutes", f"{slide_minutes} minutes"
    )
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D182)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user is idle
    longer than ``gap_minutes``. Classic lag + cumulative-sum-of-breaks; one
    shuffle on user_id. Returns one row per session.

    Gaps are measured in whole seconds (epoch floor) so the cut points are
    identical across engines regardless of sub-second timestamp precision."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")  # floor-to-second epoch
    gap = sec - F.lag(sec).over(w)
    with_break = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = with_break.withColumn(
        "session_seq",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sid.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(D182)).cast("double").alias("sum_value"),
    )


def json_props_agg(events: DataFrame) -> DataFrame:
    """Extract a JSON field from the props payload and aggregate on it
    (F.get_json_object ≡ DuckDB json_extract_string)."""
    # try_cast, not cast: one non-integer props value (k="abc", k=3.7)
    # would abort the whole aggregation under Spark 4's default ANSI mode;
    # dirty payloads become NULL and fall in the NULL k_bucket instead
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return (
        events.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.floor(
                    F.sum("k").cast("double") / F.count(F.lit(1)) * 10000
                    + F.lit(0.5)
                )
                / 10000
            )
            .cast("double")
            .alias("avg_k"),
        )
    )


def asof_join_orders_events(orders: DataFrame, events: DataFrame) -> DataFrame:
    """As-of join: for each order of a known user, the latest event of that
    user at or before the END of the order date (orders.o_custkey ↔
    events.user_id). The bound is exclusive of the NEXT day's midnight —
    ``ev_ts < o_orderdate + 1 day`` — because comparing a timestamp to the
    bare DATE promotes the date to ITS midnight and silently excludes all
    same-day events, the common case.

    Spark lacks a native as-of join; this is the equi-key left join with the
    temporal bound *inside the join condition* + arg-max composition — one
    shuffle on the key, no window over the full fact table. The arg-max key is
    (ts, event_id) so ties are deterministic. At scale, bucketing both sides
    on the key removes the shuffle; per-group ``pd.merge_asof`` via
    applyInPandas is the fallback when per-key event counts are huge."""
    e = events.select(
        F.col("user_id"),
        F.col("ts").alias("ev_ts"),
        F.col("event_id"),
    )
    j = orders.join(
        e,
        (orders.o_custkey == e.user_id)
        & (e.ev_ts < F.date_add(orders.o_orderdate.cast("date"), 1)),
        "left",
    )
    # Deterministic argmax on (ts, event_id) via a sortable string pack —
    # portable to engines whose arg_max can't take a composite key.
    # 20-digit pads: lpad TRUNCATES over-length input, which would corrupt
    # the key silently for ids ≥ 10^12; 20 digits covers the shifted
    # domain. The +10^18 offset keeps the packed number POSITIVE for
    # pre-epoch timestamps / negative ids: lpad of '-9000000' keeps the
    # sign INSIDE the padded string, where lexicographic MAX inverts the
    # numeric order of negatives ('1' < '9' would pick -9s over -1s).
    # Domain: values ≥ -10^18 µs (year -29698) — loudly beyond any event
    # log — and ≤ ~8.2×10^18 (int64 headroom).
    off = F.lit(10**18).cast("long")
    pack = F.concat(
        F.lpad((F.unix_micros(F.col("ev_ts")) + off).cast("string"), 20, "0"),
        F.lpad((F.col("event_id") + off).cast("string"), 20, "0"),
    )
    agg = j.groupBy("o_orderkey", "o_custkey", "o_orderdate").agg(
        F.max(pack).alias("_pack")
    )
    return agg.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.substring("_pack", 21, 20).try_cast("long") - off).alias(
            "last_event_id"
        ),
        F.timestamp_micros(
            F.substring("_pack", 1, 20).try_cast("long") - off
        ).alias("last_event_ts"),
    )


def range_join_event_pairs(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Range join: count later events of the same user within N minutes after
    each 'click' event. Banded into coarse time buckets so the physical join
    is equi-key (user, bucket) — the standard decomposition that keeps a
    range join off the nested-loop/cartesian path; the exact timestamp
    predicate then filters candidates."""
    width = minutes * 60
    bucket = lambda c: F.floor(c.cast("long") / width)  # noqa: E731
    left = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        bucket(F.col("ts")).alias("b"),
    )
    left_b = left.withColumn("b", F.explode(F.array(F.col("b"), F.col("b") + 1)))
    right = events.select(
        F.col("user_id"),
        F.col("event_id").alias("later_id"),
        F.col("ts").alias("later_ts"),
        bucket(F.col("ts")).alias("b"),
    )
    j = left_b.join(right, ["user_id", "b"]).filter(
        (F.col("later_ts") > F.col("click_ts"))
        & (
            F.col("later_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {minutes} MINUTES")
        )
    )
    return (
        j.select("user_id", "click_id", "later_id")
        .distinct()
        .groupBy("user_id", "click_id")
        .agg(F.count(F.lit(1)).alias("n_following"))
    )


def funnel_steps(
    events: DataFrame, steps: list[str] | None = None
) -> DataFrame:
    """Ordered conversion funnel per user: first time of step 1, first
    occurrence of step 2 STRICTLY AFTER that, first step 3 after step 2, …
    (the classic product-analytics funnel; sessionize answers "how long",
    this answers "how far").

    Shape: one filtered min-aggregate per step, chained by a user-keyed join
    carrying the previous step's timestamp into the next step's filter —
    step k is one shuffle on user_id over only the step-k events (the
    event_type filter is pushed to the scan). No windows over the full
    stream, no per-user sort; at scale each stage's input is the step's own
    event volume, not the whole table. Users who never reach step 1 are
    absent (funnel entry defines the cohort).

    Returns user_id, ts_1..ts_N (null once the funnel is abandoned), and
    steps_completed.
    """
    if steps is None:  # `steps or [...]` would silently swallow an
        steps = ["view", "click", "purchase"]  # explicit-but-empty list
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_1"))
    )
    out = reached
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col("event_type") == step)
            .select("user_id", F.col("ts").alias("_ts"))
            .join(out.select("user_id", F.col(f"ts_{i-1}").alias("_prev")), "user_id")
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy("user_id")
            .agg(F.min("_ts").alias(f"ts_{i}"))
        )
        out = out.join(nxt, "user_id", "left")
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.col(f"ts_{i}").isNotNull().cast("int")
    return out.select(
        "user_id",
        *[F.col(f"ts_{i}") for i in range(1, len(steps) + 1)],
        completed.cast("long").alias("steps_completed"),
    )


def retention_cohorts(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    in every week they return — the activation/retention triangle every
    product analytics stack computes.

    Two aggregations and one join, all keyed on the user column:
    first-seen week is a per-user MIN (map-side partial), activity is the
    distinct (user, week) set, and the cohort join is user-keyed — at
    100 TB every shuffle in the query is on the uniform user key, and the
    output is |cohorts| × |weeks| rows (hundreds), so the final aggregate
    collapses to almost nothing. week_offset counts whole weeks between
    cohort and activity week; retained_pct is computed against the
    cohort's week-0 size with the portable floor-rounding.
    """
    week = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    first_seen = (
        events.groupBy(user_col)
        .agg(F.min("ts").alias("_first_ts"))
        .select(user_col, week(F.col("_first_ts")).alias("cohort_week"))
    )
    activity = (
        events.select(user_col, week(F.col("ts")).alias("activity_week"))
        .distinct()
    )
    per_cell = (
        activity.join(first_seen, user_col)
        .groupBy("cohort_week", "activity_week")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )
    cohort_size = Window.partitionBy("cohort_week")
    base = F.max(
        F.when(F.col("activity_week") == F.col("cohort_week"), F.col("n_users"))
    ).over(cohort_size)
    return per_cell.select(
        "cohort_week",
        "activity_week",
        F.floor(
            F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
        ).cast("int").alias("week_offset"),
        "n_users",
        (
            F.floor(
                F.col("n_users").cast("double") / base * 10000 + F.lit(0.5)
            )
            / 10000
        ).cast("double").alias("retained_pct"),
    )


def daily_anomaly_scores(
    events: DataFrame, window_days: int = 7
) -> DataFrame:
    """Per (event_type, day) volume z-scores against the trailing
    ``window_days`` of history — the drift/anomaly monitor a pipeline runs
    on every ingest drop before the data is trusted.

    The heavy part (daily counts) is one map-side-combined aggregate of
    the raw stream; the windowed statistics then run over the tiny
    (types × days) relation, so the sliding window costs nothing at any
    corpus size. The trailing window is a RANGE frame over the epoch-day
    number — CALENDAR days, not observed rows — so an event type with
    gaps in its daily series still compares each day against exactly the
    previous ``window_days`` calendar days (a ROWS frame would silently
    stretch across the gaps). Variance uses exact integer sums (counts
    are BIGINTs; Σx and Σx² are exact in double far beyond any daily
    volume), computed in one fixed expression order so both engines
    produce bit-identical scores: var = (Σx² − (Σx)²/n) / (n−1),
    z = (x − mean)/√var, floor-rounded at 4. Windows with fewer than 2
    observed days or zero variance emit NULL z (no evidence of anomaly
    either way).
    """
    daily = (
        events.groupBy(
            "event_type", F.to_date("ts").alias("event_date")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "_day_num", F.datediff("event_date", F.lit("1970-01-01"))
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("_day_num")
        .rangeBetween(-window_days, -1)
    )
    n = F.count(F.col("n_events")).over(w)
    s = F.sum(F.col("n_events")).over(w)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    mean = s.cast("double") / n
    var = (s2.cast("double") - s.cast("double") * s.cast("double") / n) / (
        n - 1
    )
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    dec4 = lambda c: (F.floor(c * 10000 + F.lit(0.5)) / 10000).cast(  # noqa: E731
        "double"
    )
    return daily.select(
        "event_type",
        "event_date",
        "n_events",
        F.when((n >= 2) & (var > 0), dec4(mean)).alias("trailing_mean"),
        F.when((n >= 2) & (var > 0), dec4(z)).alias("z_score"),
    )


def gap_fill(
    events: DataFrame,
    unit: str = "hour",
    value_col: str = "value",
    max_gap: int | None = None,
) -> DataFrame:
    """Calendar gap-filling with last-observation-carried-forward: each
    event type's per-``unit`` value series is densified onto its own
    [min, max] calendar, missing buckets are flagged and filled with the
    most recent observed total (the hypertable ``locf`` shape).

    Plan: one fact fold to (type, bucket) totals, then a LAG window over
    that folded relation generates the missing buckets between adjacent
    observations directly — each gap row already knows its carry-forward
    value (the lag row's total), so there is no calendar join-back and
    no second locf window. ONE fact scan even statically (the join-back
    formulation computed the fold twice: column pruning makes the span
    subtree differ from the join subtree, which defeats ReuseExchange),
    one fold shuffle, one window over the tiny (type, bucket) relation.

    MEMORY BOUND: each inter-observation gap materializes as ONE
    ``sequence()`` array on one row before the explode, so an event type
    dormant for years at hour granularity would build a multi-million-
    element array in a single task (memory spike; Spark also caps
    sequence length). ``max_gap`` bounds that: when set, at most the
    ``max_gap`` most recent missing buckets before each observation are
    filled (older ones are skipped entirely), capping every per-row
    array at ``max_gap + 1`` elements. Default ``None`` preserves the
    dense-calendar contract for well-behaved series.
    """
    step = F.expr(f"interval 1 {unit}")
    bucket = F.date_trunc(unit, F.col("ts")).alias("bucket")
    per_bucket = events.groupBy(F.col("event_type"), bucket).agg(
        F.sum(F.col(value_col).cast(D182)).alias("_v")
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    # _carry = last NON-NULL total strictly before this bucket: an
    # observed bucket whose values were all NULL still carries the
    # previous real total forward (true locf), matching the oracle's
    # LAST_VALUE ... IGNORE NULLS — a plain lag would propagate the NULL
    with_prev = per_bucket.select(
        "event_type",
        "bucket",
        "_v",
        F.lag("bucket").over(w).alias("_prev_b"),
        F.last("_v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("_carry"),
    )
    # each observed row emits [prev+step .. itself] in ONE explode — its
    # gap predecessors (carrying the last non-null total) plus itself —
    # so there is no observed/gaps union whose asymmetric branches would
    # re-fold the fact table
    start = F.coalesce(F.col("_prev_b") + step, F.col("bucket"))
    if max_gap is not None:
        floor_b = F.col("bucket") - F.expr(f"interval {int(max_gap)} {unit}")
        start = F.greatest(start, floor_b)
    filled = F.explode(
        F.sequence(start, F.col("bucket"), step)
    ).alias("_fill_b")
    return (
        with_prev.select("event_type", "bucket", "_v", "_carry", filled)
        .select(
            "event_type",
            F.col("_fill_b").alias("bucket"),
            F.when(
                F.col("_fill_b") == F.col("bucket"),
                F.coalesce(F.col("_v"), F.col("_carry")),
            )
            .otherwise(F.col("_carry"))
            .cast("double")
            .alias("filled_value"),
            ((F.col("_fill_b") != F.col("bucket")) | F.col("_v").isNull())
            .alias("was_gap"),
        )
        .orderBy("event_type", "bucket")
    )


def cumulative_unique_users(
    events: DataFrame, unit: str = "hour"
) -> DataFrame:
    """Cumulative distinct-user curve per calendar ``unit`` WITHOUT a
    per-bucket distinct blowup: fold each user to their first-seen
    bucket (one user-keyed shuffle), count arrivals per bucket, and run
    one cumulative sum over the bucket domain.

    The naive form — COUNT(DISTINCT user) OVER (ORDER BY bucket) —
    holds per-bucket user sets; this form's state after the first fold
    is one row per USER, then one row per BUCKET. The curve is DENSE:
    arrival buckets join onto the full [min, max] calendar, so buckets
    with activity but no new users still emit a (bucket, 0, running
    total) row instead of a silent hole. The final window is a global
    ordered sum over the calendar domain (bounded: |buckets| rows —
    tens of thousands even for a decade of hourly data), the documented
    bounded-global-window pattern.
    """
    first_seen = events.groupBy("user_id").agg(
        F.min(F.date_trunc(unit, F.col("ts"))).alias("_first")
    )
    return cumulative_from_first_seen(first_seen, unit)


def cumulative_from_first_seen(
    first_seen: DataFrame, unit: str = "hour"
) -> DataFrame:
    """The curve tail shared by the batch operator and the streaming
    merge-on-read path (streaming/users_stream.py): (user_id, _first)
    → dense (bucket, new_users, cum_users)."""
    arrivals = first_seen.groupBy(F.col("_first").alias("bucket")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    cal = arrivals.agg(
        F.min("bucket").alias("_t0"), F.max("bucket").alias("_t1")
    ).select(
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"interval 1 {unit}"))
        ).alias("bucket")
    )
    dense = cal.join(arrivals, "bucket", "left").select(
        "bucket", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    # bounded global window: runs over the dense CALENDAR relation
    # (buckets between corpus min/max ts, never events) — the expected
    # "No Partition Defined" warning is this bounded fold
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return dense.select(
        "bucket",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("bucket")


def ts_shape_topk(
    events: DataFrame,
    pattern: list[int],
    k: int = 20,
    user_col: str = "user_id",
) -> DataFrame:
    """Distributed time-series SHAPE search ([EXT]; the streaming-data
    similarity-search shape of EDBT'19): the k per-user daily-activity
    windows whose shape best matches ``pattern``, mean-centered.

    Distance is EXACT INTEGER arithmetic — for window length L, daily
    counts x and window sum S, score = Σ_j (L·x_j − S − p'_j)² with
    p'_j = L·q_j − Σq: multiplying the mean through by L keeps the
    mean-centering rational-exact in int64, so the score is
    bit-identical in any engine (no float summation order to disagree
    on). Mean-centering makes the match baseline-invariant (a heavy
    user and a light user with the same SPIKE SHAPE score alike);
    full z-normalization would also be scale-invariant but costs a
    sqrt — the wrong trade against cross-engine exactness here.

    Window semantics: candidate windows are the L-day frames that lie
    fully inside the corpus day span AND within reach of the user's own
    activity (start in [user_min_day − (L−1), user_max_day]) — an
    all-quiet window outside a user's active period scores a constant
    Σp'² that says nothing about the user, and materializing it for
    every dormant user makes the dense relation users × corpus_span. The
    per-user bounded calendar keeps it Σ_u (span_u + 2(L−1)) instead: a
    multi-year corpus with mostly-dormant users costs Σ activity spans,
    not users × years (r15 ADVICE).

    int64-exactness domain: terms are |L·x_j − S − p'_j| ≤ L·(L+1)·m + c
    for max daily count m, so dist ≤ L·(L(L+1)m + c)²; with L ≤ 16 the
    score stays inside int64 for m up to ~10⁸ events/user/day — beyond
    that (pathological bot traffic) the squares wrap engine-dependently.
    Pre-aggregate or clip daily counts before calling if the domain can
    exceed that (r15 ADVICE: the contract's domain, stated).

    Plan shape at 100 TB: one (user, day) count groupBy (map-side
    combined; this also yields the per-user day bounds in the same
    pass), a per-user dense calendar (explode of the user's clipped
    span — corpus bounds ride a broadcast 1-row scalar attach, the q15
    pattern), one narrow per-user ordered window building the L-length
    frames as explicit ``lead(x, j)`` columns — order-guaranteed by
    definition, unlike collect_list's undocumented frame-order behavior
    (r15 ADVICE) — unrolled integer expressions for the score, and a
    global TakeOrdered for the top-k. Emits (user, start_day, dist) in
    a unique total order (dist, user, start_day)."""
    L = len(pattern)
    sq = sum(pattern)
    pp = [L * q - sq for q in pattern]

    daily = (
        events.groupBy(user_col, F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    span = events.agg(
        F.min(F.to_date("ts")).alias("_d0"),
        F.max(F.to_date("ts")).alias("_d1"),
    )
    user_span = daily.groupBy(user_col).agg(
        F.min("day").alias("_u0"), F.max("day").alias("_u1")
    )
    grid = (
        user_span.crossJoin(F.broadcast(span))
        .select(
            user_col,
            F.explode(
                F.sequence(
                    F.greatest(F.col("_d0"), F.date_sub("_u0", L - 1)),
                    F.least(F.col("_d1"), F.date_add("_u1", L - 1)),
                    F.expr("interval 1 day"),
                )
            ).alias("day"),
        )
    )
    dense = grid.join(daily, [user_col, "day"], "left").select(
        user_col, "day", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    w = Window.partitionBy(user_col).orderBy("day")
    xs = [F.col("x")] + [F.lead("x", j).over(w) for j in range(1, L)]
    framed = dense.select(
        user_col,
        F.col("day").alias("start_day"),
        *[c.alias(f"_x{j}") for j, c in enumerate(xs)],
    ).where(F.col(f"_x{L - 1}").isNotNull())
    s = F.col("_x0")
    for j in range(1, L):
        s = s + F.col(f"_x{j}")
    framed = framed.withColumn("_s", s)
    term = [
        F.lit(L) * F.col(f"_x{j}") - F.col("_s") - F.lit(pp[j])
        for j in range(L)
    ]
    dist = term[0] * term[0]
    for t in term[1:]:
        dist = dist + t * t
    return (
        framed.select(
            user_col,
            "start_day",
            dist.cast("long").alias("dist"),
        )
        .orderBy("dist", user_col, "start_day")
        .limit(k)
    )
