"""Declarative data-quality expectations — validate, report, gate.

The reference validates by eyeballing per-stage frames
(``show_df_details``, glue_jobs/initial_load.py:77-85) and trusts DMS
to ship well-formed rows; at 100 TB that becomes a declared contract
checked by the engine. An expectation is a named boolean predicate a
ROW must satisfy; a rule set compiles into ONE map-side plan that
annotates every row with the names of the rules it violates. From the
same annotated plan the engine derives

- a per-rule violation report (``expectations_report``),
- an ingest gate (``gated_ingest``): violating rows are quarantined
  with their violation list, clean rows proceed through the normal
  :class:`~rds_to_datalake_project_spark.operators.upsert.KeyedTable`
  merge — the same quarantine posture as streaming dedup-at-ingest
  (streaming/pipeline.py).

Scale notes: row-local rules (not_null / in_range / accepted_values /
matches / expr) are pure whole-stage-codegen expressions — zero
shuffles. The one non-local rule, :func:`unique`, costs a single
window shuffle over its key columns (count-per-key, no sort). The
report is a single aggregation over the annotated frame; the gate
splits one cached frame by ``size(_violations) == 0``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

VIOLATIONS_COL = "_violations"


@dataclass(frozen=True)
class Expectation:
    """A named predicate rows must satisfy.

    ``predicate`` is a SQL boolean expression over the frame's columns
    (TRUE / non-false = passing). ``unique_cols`` marks the one
    non-row-local rule kind: when set, the rule passes for a row iff
    no OTHER row shares its key tuple (NULL keys are exempt — SQL
    UNIQUE semantics).
    """

    name: str
    predicate: str | None = None
    unique_cols: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if bool(self.predicate) == bool(self.unique_cols):
            raise ValueError(
                f"expectation {self.name!r}: exactly one of predicate / "
                "unique_cols required"
            )


def not_null(col: str, name: str | None = None) -> Expectation:
    return Expectation(name or f"not_null_{col}", f"{col} IS NOT NULL")


def in_range(col: str, lo, hi, name: str | None = None) -> Expectation:
    """NULL passes (pair with not_null to also reject NULLs) — each
    rule reports its own failure mode, not its neighbours'."""
    return Expectation(
        name or f"in_range_{col}",
        f"{col} IS NULL OR ({col} >= {lo!r} AND {col} <= {hi!r})",
    )


def accepted_values(
    col: str, values: Sequence[str], name: str | None = None
) -> Expectation:
    quoted = ", ".join(repr(v) for v in values)
    return Expectation(
        name or f"accepted_values_{col}", f"{col} IS NULL OR {col} IN ({quoted})"
    )


def matches(col: str, regex: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"matches_{col}", f"{col} IS NULL OR {col} RLIKE {regex!r}"
    )


def expect(name: str, predicate: str) -> Expectation:
    """Escape hatch: any boolean SQL expression."""
    return Expectation(name, predicate)


def unique(cols: Sequence[str], name: str | None = None) -> Expectation:
    return Expectation(
        name or "unique_" + "_".join(cols), unique_cols=tuple(cols)
    )


def annotate_violations(
    df: DataFrame, rules: Sequence[Expectation]
) -> DataFrame:
    """``df`` + ``_violations array<string>`` (sorted rule names the
    row fails; empty array = clean row). Row-local rules stay inside
    whole-stage codegen; each :func:`unique` rule adds one count
    window over its key columns."""
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")
    out = df
    flags: list[Column] = []
    for i, rule in enumerate(rules):
        if rule.unique_cols:
            keys = [F.col(c) for c in rule.unique_cols]
            w = Window.partitionBy(*keys)
            dup_flag = f"__dup_{i}"
            # NULL in any key column exempts the row (SQL UNIQUE).
            null_key = F.lit(False)
            for k in keys:
                null_key = null_key | k.isNull()
            out = out.withColumn(
                dup_flag, ~null_key & (F.count(F.lit(1)).over(w) > 1)
            )
            failed = F.col(dup_flag)
        else:
            # non-true (false OR null) predicate = violation
            failed = ~F.coalesce(F.expr(rule.predicate), F.lit(False))
        flags.append(F.when(failed, F.lit(rule.name)))
    arr = F.array_sort(
        F.filter(F.array(*flags), lambda x: x.isNotNull())
    ) if flags else F.array().cast("array<string>")
    out = out.withColumn(VIOLATIONS_COL, arr)
    return out.drop(*[c for c in out.columns if c.startswith("__dup_")])


def expectations_report(
    df: DataFrame, rules: Sequence[Expectation]
) -> DataFrame:
    """One row per rule: (rule, violations, n_rows) from a single
    aggregation over the annotated frame."""
    ann = annotate_violations(df, rules)
    per_rule = ann.select(
        F.explode(
            F.array(*[F.lit(r.name) for r in rules])
        ).alias("rule"),
        F.col(VIOLATIONS_COL),
    ).select(
        "rule",
        F.array_contains(F.col(VIOLATIONS_COL), F.col("rule"))
        .cast("long")
        .alias("violated"),
    )
    return per_rule.groupBy("rule").agg(
        F.sum("violated").alias("violations"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def split_clean(
    df: DataFrame, rules: Sequence[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the annotation column, violating rows WITH
    it). Annotate once; callers that consume both sides should cache
    the annotated parent (gated_ingest does)."""
    ann = annotate_violations(df, rules)
    clean = ann.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    dirty = ann.filter(F.size(VIOLATIONS_COL) > 0)
    return clean, dirty


def gated_ingest(
    table,
    batch: DataFrame,
    rules: Sequence[Expectation],
    quarantine_dir: str,
    batch_label: str,
) -> tuple[int, int]:
    """Quality gate in front of the CDC merge: annotate ``batch``
    once, append violators (with their violation lists, stringified
    for a stable quarantine schema) under
    ``quarantine_dir/batch=<label>/``, upsert the clean rows.
    Returns ``(n_clean, n_quarantined)``.

    Idempotent under replay like the rest of the ingest path: the
    upsert merge converges by precombine, and the quarantine slice is
    overwritten per batch label (same dynamic-slice idempotence as
    streaming dedup quarantine, streaming/pipeline.py).
    """
    ann = annotate_violations(batch, rules).localCheckpoint(eager=True)
    dirty = ann.filter(F.size(VIOLATIONS_COL) > 0).withColumn(
        VIOLATIONS_COL, F.concat_ws(",", F.col(VIOLATIONS_COL))
    )
    n_dirty = dirty.count()
    if n_dirty:
        (
            dirty.withColumn("_quarantine_batch", F.lit(batch_label))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{quarantine_dir}/batch={batch_label}")
        )
    clean = ann.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    n_clean = clean.count()
    if n_clean:
        table.upsert(clean)
    return n_clean, n_dirty


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: dict[str, str],
) -> DataFrame:
    """Child rows whose foreign key references no parent row — the
    lake-side FOREIGN KEY check an RDBMS-fed datalake loses when rows
    replicate table-by-table (the reference replicates each table
    independently with no cross-table guarantee,
    /root/reference/glue_jobs/incremental.py).

    ``fk`` maps child column -> parent column (composite keys
    supported). SQL FK semantics: rows with any NULL key column are
    NOT violations (skipped). Plan: one left-anti equi-join on the key
    — both sides shuffle-partitioned on it, no broadcast assumption
    (the parent is a full table, not a dim)."""
    cond = None
    for c, p in fk.items():
        this = child[c] == parent[p]
        cond = this if cond is None else (cond & this)
    nn = None
    for c in fk:
        this = F.col(c).isNotNull()
        nn = this if nn is None else (nn & this)
    return child.filter(nn).join(
        parent.select(*[F.col(p) for p in fk.values()]).distinct(),
        cond,
        "left_anti",
    )
