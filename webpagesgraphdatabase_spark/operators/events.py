"""Event-stream analytics over the ``events`` table
(event_id, ts, user_id, event_type, value, props-JSON).

Beyond-reference extension (the reference has no window functions or
event-time logic — SURVEY.md §2.9); these are the standard micro-batch
analytics shapes, each with a DuckDB oracle. The same transformations
run under Structured Streaming in :mod:`..streaming` — one definition,
batch-checked here, incremental there.

Scale notes: everything partial-aggregates (map-side combine) and
shuffles at most once on its natural key (user_id / window start).
Per-user windows assume no pathological single user; a skewed user is
an AQE-skew or salt case, same playbook as the graph joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30
WINDOW_MINUTES = 5


def user_rollup(events: DataFrame) -> DataFrame:
    """Per-user activity aggregate: (user_id, n_events, n_types,
    total_value, first_ts, last_ts)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def top_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Ranking window: top-k events per user by value:
    (user_id, rank, event_id, value). Total order via (value desc,
    event_id asc); Spark plans a partial top-k below the shuffle."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_id", "rank", "event_id", "value")
    )


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    > ``gap_min`` minutes. Classic lag + running-sum-of-boundaries:
    (user_id, session_id, n_events, session_start, session_end).
    session_id numbers a user's sessions from 1 in time order."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_bound = events.withColumn(
        "prev_ts", F.lag("ts").over(order)
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.expr(f"prev_ts + INTERVAL {int(gap_min)} MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        with_bound.withColumn("session_id", F.sum("new_session").over(running))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def windowed_counts(events: DataFrame, minutes: int = WINDOW_MINUTES) -> DataFrame:
    """Tumbling event-time window aggregate: (window_start, event_type,
    n_events, total_value). The batch twin of the streaming query in
    :mod:`..streaming.jobs` (same ``F.window`` expression there, plus a
    watermark)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def props_extract(events: DataFrame) -> DataFrame:
    """JSON prop extraction (F3 analog on the events surface): parse the
    ``props`` JSON string and pull ``k``: (event_id, k). Stays JVM-side
    via ``get_json_object``."""
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    ref_cols: tuple[str, ...] = ("ref_id", "ref_value"),
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join: every probe row annotated with the columns of the
    *latest strictly-prior* reference row for its ``by`` key —
    (all probe columns) + ``ref_cols`` (null when no prior ref exists).

    Spark has no ASOF JOIN operator; the naive encodings are a range
    join (quadratic blowup per key) or a per-key ``collect`` loop.
    This is the scale-correct union trick instead: tag both streams,
    union on (by, ts), and carry the reference columns forward with
    ``last(ignorenulls)`` over an ordered per-key window — one shuffle
    on ``by``, linear in |probe| + |ref|, no pair materialization.
    At equal timestamps the probe sorts *before* the reference row
    (strict semantics: a same-instant reference does not count, and a
    probe row that is itself in the reference stream never matches
    itself). Callers wanting ≤ semantics sort the reference first.

    ``ref`` must be unique per (by, ts) — dedupe upstream (e.g.
    ``max_by`` on an id) or the carried row is engine-dependent.

    ``tolerance_s`` (pandas ``merge_asof(tolerance=…)`` parity): when
    set, a prior reference row counts only if it is at most that many
    seconds older than the probe row — staler matches come back null.
    Implemented by carrying the matched reference timestamp in the
    same window pass (no extra shuffle) and nulling in the projection.

    Scale shape: the window partitions on the join key (same key any
    equi-join would shuffle on; skew = one hot user's events, bounded
    by that user's row count) and never compares pairs — the plan a
    1000-executor run wants, and the same shape DuckDB's native
    ``ASOF JOIN`` optimizes to, which the registry row uses as the
    cross-engine oracle."""
    probe_side = probe.withColumn("_side", F.lit(0))
    for c in ref_cols:
        probe_side = probe_side.withColumn(c, F.lit(None).cast(ref.schema[c].dataType))
    ref_side = ref.select(
        by, ts, F.lit(1).alias("_side"), *ref_cols
    )
    missing = [c for c in probe.columns if c not in (by, ts)]
    for c in missing:
        ref_side = ref_side.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    unioned = probe_side.select(
        by, ts, "_side", *ref_cols, *missing
    ).unionByName(ref_side.select(by, ts, "_side", *ref_cols, *missing))

    # probe (0) before ref (1) at equal ts → the frame up to the current
    # probe row contains only strictly-earlier reference rows
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        by,
        ts,
        "_side",
        *missing,
        *[
            F.last(F.when(F.col("_side") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in ref_cols
        ],
        F.last(F.when(F.col("_side") == 1, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("_ref_ts"),
    )
    out = carried.filter(F.col("_side") == 0)
    if tolerance_s is not None:
        # interval arithmetic works for TIMESTAMP and TIMESTAMP_NTZ alike
        fresh = (F.col(ts) - F.col("_ref_ts")) <= F.expr(
            f"INTERVAL {int(tolerance_s)} SECOND"
        )
        out = out.select(
            by,
            ts,
            "_side",
            *missing,
            *[F.when(fresh, F.col(c)).alias(c) for c in ref_cols],
        )
    return out.select(by, ts, *missing, *ref_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval range join without the quadratic blowup:
    every (point row, interval row) pair with
    ``start_col ≤ point_col ≤ end_col``, all columns of both sides.

    Spark plans a raw inequality join as broadcast-nested-loop (or a
    cartesian product) — |points|·|intervals| comparisons. This is the
    classic interval-bucketing rewrite instead: each interval explodes
    to the epoch buckets it overlaps, each point hashes to its single
    bucket, the join becomes an *equi-join on bucket* and the exact
    containment predicate runs as a post-join filter. A point lives in
    exactly one bucket, so no pair ever duplicates. Cost is one
    hash-partitioned equi-join of |points| + Σ(interval spans /
    bucket) rows — pick ``bucket_seconds`` near the typical interval
    length so most intervals explode to 1-2 buckets and each bucket's
    population stays small; at 100 TB this is the difference between
    a shuffle join and a cluster-killing nested loop. The DuckDB
    oracle runs the plain inequality join (its IEJoin handles ranges
    natively), so the rewrite is hash-checked equivalent."""
    b = int(bucket_seconds)
    ivals = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(point_col)) / b).cast("long")
    )
    return (
        pts.join(ivals, "_bkt")
        .filter(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bkt")
    )


def multi_resolution_rollup(
    events: DataFrame,
    minutes: tuple[int, ...] = (5, 60, 1440),
    materialize: bool = True,
) -> DataFrame:
    """Hypertable-style continuous aggregate: tumbling rollups at every
    resolution in ``minutes``, as one union-tagged table
    (resolution_min, window_start, event_type, n_events, total_value).

    The raw stream is scanned **once**, at the finest resolution; every
    coarser level re-aggregates the level below it (counts sum, sums
    sum — the re-aggregation property TimescaleDB/Druid rollups rely
    on). At 100 TB that is the difference between one corpus scan and
    |resolutions| of them: the 5-minute table is ~10⁻³ the raw rows,
    so the hourly and daily levels cost almost nothing.

    ``materialize=True`` persists the finest-level table — without it
    Spark's union recomputes each branch's lineage and the raw source
    is scanned once *per resolution* (measured: 3 parquet scans, no
    exchange reuse), which silently defeats the whole point; real
    hypertables materialize the fine level for the same reason. The
    plan test pins exactly one raw scan. Callers unpersist via
    ``df.unpersist()`` on the returned frame's base when done (or let
    the cache age out). Coarser resolutions must be integer multiples
    of the finest so bucket boundaries nest exactly; the unit tests
    pin derived ≡ computed-directly-from-raw per resolution."""
    finest = minutes[0]
    for m in minutes[1:]:
        if m % finest != 0:
            raise ValueError(
                f"resolution {m} is not a multiple of the finest {finest}"
            )
    base = (
        events.groupBy(
            F.window("ts", f"{finest} minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    if materialize:
        base = base.persist()
    return coarsen_levels(base, minutes)


def coarsen_levels(base: DataFrame, minutes: tuple[int, ...]) -> DataFrame:
    """Re-aggregate a finest-level rollup table (window_start,
    event_type, n_events, sum_value) into the union-tagged
    multi-resolution shape — the read half of a continuous aggregate
    (the streaming maintainer materializes ``base``; see
    :func:`..streaming.jobs.rollup_from_store`). Counts and sums
    re-aggregate exactly; each coarser level costs an aggregation over
    the *fine table's* rows, never the raw events."""
    finest = minutes[0]
    for m in minutes[1:]:
        if m % finest != 0:
            raise ValueError(
                f"resolution {m} is not a multiple of the finest {finest}"
            )
    levels = [base.withColumn("resolution_min", F.lit(finest))]
    for m in minutes[1:]:
        levels.append(
            base.groupBy(
                F.window("window_start", f"{m} minutes").alias("w"),
                "event_type",
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .withColumn("resolution_min", F.lit(m))
        )
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out.select(
        "resolution_min",
        "window_start",
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 6).alias("total_value"),
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered-funnel analysis (reference has no event analytics; this
    is the classic product-analytics sequence query): per user, the
    earliest occurrence of ``steps[0]``, then the earliest ``steps[1]``
    *strictly after* it, and so on — a user "converts" through step k
    only if the steps happened in order, not merely all happened.

    Returns one row per user who reached step 1: (user_id,
    ts_<step>… one column per step, NULL once the chain breaks,
    funnel_depth = number of steps reached). Timestamps make the chain
    auditable; ``funnel_depth`` alone feeds conversion rates.

    Scale shape: one filtered aggregation per step, each a partial-agg
    ``groupBy(user_id)`` min — k shuffles on the same key for a
    k-step funnel (co-partitioned after the first; AQE coalesces), no
    window over raw events and nothing quadratic. The strictly-after
    comparison happens *after* the per-user min of the previous stage
    is known — a join against an aggregate ≪ raw events."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    prev = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias(f"ts_{steps[0]}"))
    )
    out = prev
    for i, step in enumerate(steps[1:], start=1):
        prev_col = f"ts_{steps[i - 1]}"
        nxt = (
            events.filter(F.col("event_type") == step)
            .join(out.select("user_id", prev_col), "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"ts_{step}"))
        )
        out = out.join(nxt, "user_id", "left")
    depth = F.lit(0)
    for step in steps:
        depth = depth + F.col(f"ts_{step}").isNotNull().cast("int")
    return out.select(
        "user_id", *[f"ts_{s}" for s in steps], depth.alias("funnel_depth")
    )


def window_anomalies(
    events: DataFrame,
    minutes: int = WINDOW_MINUTES,
    trailing: int = 6,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Windowed volume-anomaly detection: per (event_type, tumbling
    window), flag windows whose event count deviates from the trailing
    mean by more than ``z_threshold`` sample standard deviations —
    the ops-dashboard "sudden spike/drop" query.

    Returns (window_start, event_type, n_events, trailing_mean,
    trailing_std, anomaly). The trailing frame is the ``trailing``
    *preceding* windows only (the current window never smooths its own
    spike); the first ``trailing`` windows of each type are unflagged
    (insufficient history, std is null).

    Scale shape: the windowed count is a partial-agg groupBy; the
    trailing stats are ONE window pass partitioned by event_type
    ordered by window_start — state is `trailing` rows per type, and
    the partition key has tiny cardinality but also tiny data (one row
    per closed window, not per event), so no skew concern. Float
    mean/std are inherent to z-scores — this is a monitoring operator,
    unit-pinned, not an oracle row."""
    counts = (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    frame = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-trailing, -1)
    )
    stats = counts.select(
        "window_start",
        "event_type",
        "n_events",
        F.avg("n_events").over(frame).alias("trailing_mean"),
        F.stddev_samp("n_events").over(frame).alias("trailing_std"),
        F.count("n_events").over(frame).alias("_n_hist"),
    )
    z_ok = (F.col("_n_hist") >= trailing) & F.col("trailing_std").isNotNull()
    deviation = F.abs(F.col("n_events") - F.col("trailing_mean"))
    return stats.select(
        "window_start",
        "event_type",
        "n_events",
        F.round("trailing_mean", 6).alias("trailing_mean"),
        F.round("trailing_std", 6).alias("trailing_std"),
        F.when(
            z_ok & (deviation > z_threshold * F.col("trailing_std")), 1
        )
        .otherwise(0)
        .alias("anomaly"),
    )


#: days per truncation period, for exact offset arithmetic between
#: date_trunc'd boundaries (differences are exact multiples)
_PERIOD_DAYS = {"week": 7, "day": 1}


def user_cohort(events: DataFrame, period: str = "week") -> DataFrame:
    """Per-user cohort basis — (user_id, cohort_week, n_active_weeks,
    last_week_offset): the first-activity period (date_trunc Monday
    boundary for weeks), how many distinct periods the user was active,
    and the offset of their latest one. This is the per-entity frame
    every cohort/retention report aggregates; it stays user-keyed so
    the gate hash-checks it row-by-row.

    Shape: one distinct over (user, period) then one partial-agg
    groupBy — offsets are exact integer arithmetic between truncated
    boundaries (difference is always a whole number of periods)."""
    days = _PERIOD_DAYS[period]
    p = F.date_trunc(period, F.col("ts"))
    per = events.select("user_id", p.alias("p")).distinct()
    return per.groupBy("user_id").agg(
        F.min("p").alias("cohort_week"),
        F.count("*").cast("long").alias("n_active_weeks"),
        F.floor(F.datediff(F.max("p"), F.min("p")) / days)
        .cast("long")
        .alias("last_week_offset"),
    )


def retention_matrix(events: DataFrame, period: str = "week") -> DataFrame:
    """The classic retention triangle — (cohort_week, week_offset,
    n_users): of the users whose first activity fell in cohort_week,
    how many were active again ``week_offset`` periods later
    (offset 0 = the cohort size itself).

    Derived entirely from :func:`user_cohort`'s inputs: distinct
    (user, period) joined to each user's min period, offset by exact
    integer arithmetic, one partial-agg count — no window, no skew
    (the join key is user_id, never the hot cohort key)."""
    days = _PERIOD_DAYS[period]
    p = F.date_trunc(period, F.col("ts"))
    per = events.select("user_id", p.alias("p")).distinct()
    first = per.groupBy("user_id").agg(F.min("p").alias("cohort_week"))
    return (
        per.join(first, "user_id")
        .select(
            "cohort_week",
            F.floor(F.datediff(F.col("p"), F.col("cohort_week")) / days)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
