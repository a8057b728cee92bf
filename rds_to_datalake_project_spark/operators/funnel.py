"""Behavioral analytics over event streams: ordered funnels and
cohort retention.

The product-analytics surface (Amplitude/Mixpanel class) a lakehouse
serves straight off the events table. Both operators are pure
relational compositions — no UDFs, no per-user arrays — chosen for
the 100-TB shape of the problem:

- :func:`funnel_steps` — "users who did A, then B after A, then C
  after B (optionally all within T of A)". Implemented as k chained
  conditional-min rounds: each round filters the events scan to ONE
  step's rows (predicate pushdown makes that scan step-sized, not
  corpus-sized) and equi-joins the surviving frontier on the user
  key. k is the funnel length (3-5), so the plan is k small
  hash-joins — never a per-user event array (unbounded memory on
  power users) and never a window over the full event stream.
- :func:`cohort_retention` — the (cohort week × activity week)
  triangle. One min-aggregate for first-touch, one distinct on
  (user, period), one equi-join, one count — all keyed on the user
  id, so every shuffle is the same co-partitionable key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.timeseries import time_bucket_s


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    within_s: int | None = None,
) -> DataFrame:
    """Per-user funnel completion: for each user who entered the
    funnel (did ``steps[0]``), the deepest step reached under strict
    ordering (each step's FIRST occurrence after the previous step's
    timestamp; ``within_s`` additionally bounds every step to
    ``first_step_ts + within_s``).

    Returns ``(user_col, steps_completed int, entered_at_us long,
    last_step_at_us long)`` — one row per entered user.

    First-occurrence semantics ("min ts after prev") make the chain
    deterministic and match the SQL-twin formulation; taking any
    matching occurrence would be order-dependent.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    us = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("__u"),
        us.alias("__ts"),
        F.col(event_col).alias("__e"),
    )
    reached = (
        base.filter(F.col("__e") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("t0"))
        .select("__u", "t0", F.col("t0").alias("t_prev"), F.lit(1).alias("__depth"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = base.filter(F.col("__e") == step).select(
            F.col("__u").alias("__nu"), F.col("__ts").alias("__cand")
        )
        # qualification lives IN the join condition: a user whose
        # candidates all fail must still survive (unmatched left row),
        # not vanish with their filtered rows
        cond = (F.col("__u") == F.col("__nu")) & (
            F.col("__cand") > F.col("t_prev")
        )
        if within_s is not None:
            cond = cond & (
                F.col("__cand") <= F.col("t0") + F.lit(int(within_s) * 1_000_000)
            )
        stepped = (
            reached.join(nxt, cond, "left")
            .groupBy("__u", "t0", "t_prev", "__depth")
            .agg(F.min("__cand").alias("t_next"))
        )
        # only users standing exactly at depth i-1 may advance — a
        # user stalled earlier (missed step j < i) must not skip ahead
        # on a later step's match; stalled users keep their row
        advance = F.col("t_next").isNotNull() & (F.col("__depth") == i - 1)
        reached = stepped.select(
            "__u",
            "t0",
            F.when(advance, F.col("t_next")).otherwise(F.col("t_prev")).alias(
                "t_prev"
            ),
            F.when(advance, F.lit(i)).otherwise(F.col("__depth")).alias("__depth"),
        )
    return reached.select(
        F.col("__u").alias(user_col),
        F.col("__depth").alias("steps_completed"),
        F.col("t0").alias("entered_at_us"),
        F.col("t_prev").alias("last_step_at_us"),
    )


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    within_s: int | None = None,
) -> DataFrame:
    """Step-level funnel summary: ``(step int, step_name string,
    n_users long)`` where ``n_users`` counts users whose deepest
    reach is ≥ that step — the classic decreasing funnel chart."""
    per_user = funnel_steps(events, user_col, ts_col, event_col, steps, within_s)
    rows = per_user.select(
        F.explode(
            F.sequence(F.lit(1), F.col("steps_completed"))
        ).alias("step")
    )
    counts = rows.groupBy("step").agg(F.count("*").alias("n_users"))
    names = F.array(*[F.lit(s) for s in steps])
    return counts.select(
        "step",
        F.element_at(names, F.col("step")).alias("step_name"),
        "n_users",
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_s: int = 7 * 86400,
) -> DataFrame:
    """Cohort × period retention triangle: users grouped by their
    first-activity period; for each later period, how many were
    active. Returns ``(cohort_s long, period int, n_users long)``
    with ``period`` counted from 0 (the cohort's own period).
    """
    base = events.select(
        F.col(user_col).alias("__u"),
        time_bucket_s(F.col(ts_col), period_s).alias("__p"),
    )
    first = base.groupBy("__u").agg(F.min("__p").alias("cohort_s"))
    active = base.distinct()
    j = active.join(first, "__u")
    period = ((F.col("__p") - F.col("cohort_s")) / F.lit(period_s)).cast("int")
    return (
        j.select("cohort_s", period.alias("period"), "__u")
        .groupBy("cohort_s", "period")
        .agg(F.count("*").alias("n_users"))
    )
