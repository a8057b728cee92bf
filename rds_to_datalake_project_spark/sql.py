"""S7 — SQL facade over lake tables.

Replaces the reference's Athena layer (rds_to_datalake/athena.py:16-87
start/poll/fetch; vendor/aws_athena.py:27-116 UNLOAD-to-parquet +
result-reuse cache) with ``spark.sql`` on catalog-registered tables.
The poll/waiter machinery disappears — Spark executes synchronously —
and "UNLOAD to parquet" is just ``df.write.parquet``.
"""

from __future__ import annotations

import hashlib
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from rds_to_datalake_project_spark.functions.localrel import (
    literal_frame as _literal_frame,
)

# Table identifiers as users coming from the reference's Athena layer
# type them: bare (`orders`), qualified (`lake.orders`, any depth), and
# backtick-quoted per segment (`` `lake`.`orders` ``). The registry is
# keyed on the UNQUOTED dotted name (see _unquote_ident).
_IDENT = r"(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
_QNAME = rf"{_IDENT}(?:\.{_IDENT})*"

# `<table> FOR VERSION AS OF <k>` — the public time-travel SQL syntax
# (Delta/Iceberg's spelling), rewritten by run_query into a snapshot
# temp view so the one SQL facade reaches everything the Python API
# can (reference parity: ALL queries flow through one SQL layer,
# athena.py:16-64).
_AS_OF_RE = re.compile(
    rf"({_QNAME})\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)\b",
    re.IGNORECASE,
)
# `<table> FOR TIMESTAMP AS OF '<iso>'` — resolved to a version via
# commit-record mtimes (KeyedTable.version_at_timestamp), then served
# through the same snapshot temp-view path. The literal's CONTENT is
# blanked in the masked text the regex runs over, so the value is
# sliced from the original SQL by span.
_TS_AS_OF_RE = re.compile(
    rf"({_QNAME})\s+FOR\s+TIMESTAMP\s+AS\s+OF\s+'([^']*)'",
    re.IGNORECASE,
)

_IDENT_RE = re.compile(_IDENT)


def _unquote_ident(name: str) -> str:
    """``` `lake`.`orders` ``` → ``lake.orders`` — the registry key."""
    return ".".join(
        seg[1:-1] if seg.startswith("`") else seg
        for seg in _IDENT_RE.findall(name)
    )


def _mask_string_literals(sql: str) -> str:
    """A copy of ``sql`` with the CONTENTS of single-quoted string
    literals blanked (length-preserving, '' and backslash escapes
    respected), so regex matching never fires inside a literal —
    ``SELECT 'x FOR VERSION AS OF 1'`` must pass through untouched.
    Spans align 1:1 with the original, so match positions transfer
    directly (the minimal tokenizer the facade needs; full parsing
    stays in Spark). Backslash handling matches Spark's default
    ``escapedStringLiterals=false`` mode, where ``'it\\'s'`` is one
    literal — a ``\\'`` must not terminate the scan, or the mask
    desynchronizes and an AS-OF inside the literal gets rewritten.
    """
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "\\":  # backslash escape: skip escaped char
                    j += 2
                    continue
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        else:
            i += 1
    return "".join(out)

# Session-level registry of retained KeyedTables, so SQL users get
# time travel without threading table objects through every call —
# KeyedTable.register() enrolls retained tables here automatically.
TIME_TRAVEL_TABLES: dict[str, object] = {}

# Session-level registry of facade-created materialized views
# (CREATE MATERIALIZED VIEW ... populates it; REFRESH/DROP resolve
# against it). Values are operators.matview.MaterializedView.
MATVIEWS: dict[str, object] = {}


def register_time_travel(name: str, table) -> None:
    """Make ``<name> FOR VERSION AS OF k`` resolvable in any
    subsequent ``run_query`` (table must expose ``read_as_of``)."""
    TIME_TRAVEL_TABLES[name] = table


def run_query(
    spark: SparkSession,
    sql: str,
    cache: bool = False,
    tables: dict | None = None,
) -> DataFrame:
    """Arbitrary SQL over registered tables (athena.py:16-64 equivalent).

    ``cache=True`` is the engine's analog of Athena result-reuse
    (vendor/aws_athena.py:75-82); for the reference's max-age
    semantics use ``ResultCache``.

    ``tables`` maps names to retained ``KeyedTable``s: any
    ``<name> FOR VERSION AS OF <k>`` reference in the SQL resolves to
    that table's exact snapshot at commit k (registered as a temp
    view over the metadata-only ``read_as_of`` plan — no data copy).
    Names fall back to the session-level ``TIME_TRAVEL_TABLES``
    registry (populated by ``KeyedTable.register``). Unknown names or
    unreadable versions raise rather than silently querying live
    state.
    """
    known = {**TIME_TRAVEL_TABLES, **(tables or {})}
    maint = _maintenance_statement(spark, sql, known)
    if maint is not None:
        return maint
    # Aggregate navigation: a GROUP BY SELECT whose FROM matches a
    # FRESH materialized view's definition is served from the view
    # store (cost ∝ |view|, not ∝ |base|). Safe-listed shapes only;
    # anything the rewriter does not fully understand falls through.
    from rds_to_datalake_project_spark import rewrite as _rw

    rewritten = _rw.try_rewrite(spark, sql)
    if rewritten is not None:
        return rewritten.cache() if cache else rewritten
    if not known:
        # nothing registered: leave the SQL untouched (a native
        # catalog may own the time-travel syntax). With ANY tables
        # registered, an unknown name raises — a typo must not fall
        # through to live state.
        return spark.sql(sql).cache() if cache else spark.sql(sql)

    def _snapshot_view(name: str, version: int, t) -> str:
        # Sanitizing alone would collide distinct registry keys
        # ('lake.orders' vs 'lake_orders') onto one view name, and
        # the second createOrReplaceTempView would silently win for
        # both references — disambiguate with a hash of the raw key.
        tag = hashlib.md5(name.encode("utf-8")).hexdigest()[:8]
        view = (
            f"__asof_{re.sub(r'[^A-Za-z0-9_]', '_', name)}_{tag}_v{version}"
        )
        t.read_as_of(version).createOrReplaceTempView(view)
        return view

    def _resolve_asof(name: str) -> object:
        t = known.get(name)
        if t is None:
            raise ValueError(
                f"time-travel reference to unknown table {name!r}; "
                f"known: {sorted(known)}"
            )
        return t

    def _rewrite(m: re.Match) -> str:
        name = _unquote_ident(m.group(1))
        return _snapshot_view(name, int(m.group(2)), _resolve_asof(name))

    def _rewrite_ts(m: re.Match) -> str:
        name = _unquote_ident(m.group(1))
        t = _resolve_asof(name)
        # the mask blanked the literal's content — slice the original
        raw_ts = sql[m.start(2) : m.end(2)]
        return _snapshot_view(name, t.version_at_timestamp(raw_ts), t)

    # Match on the literal-masked text (an AS-OF inside a string
    # literal is data, not syntax) but splice replacements into the
    # ORIGINAL — the mask is length-preserving so spans line up.
    for pattern, repl in ((_AS_OF_RE, _rewrite), (_TS_AS_OF_RE, _rewrite_ts)):
        masked = _mask_string_literals(sql)
        pieces, last = [], 0
        for m in pattern.finditer(masked):
            pieces.append(sql[last : m.start()])
            pieces.append(repl(m))
            last = m.end()
        pieces.append(sql[last:])
        sql = "".join(pieces)
    df = spark.sql(sql)
    return df.cache() if cache else df


_OPTIMIZE_RE = re.compile(rf"^\s*OPTIMIZE\s+({_QNAME})\s*;?\s*$", re.IGNORECASE)
_OPTIMIZE_ZORDER_RE = re.compile(
    rf"^\s*OPTIMIZE\s+({_QNAME})\s+ZORDER\s+BY\s*"
    r"\(\s*(\w+(?:\s*,\s*\w+)+)\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_HISTORY_RE = re.compile(
    rf"^\s*DESCRIBE\s+HISTORY\s+({_QNAME})\s*;?\s*$", re.IGNORECASE
)
_VACUUM_RE = re.compile(
    rf"^\s*VACUUM\s+({_QNAME})\s+RETAIN\s+(\d+)\s+VERSIONS\s*;?\s*$", re.IGNORECASE
)
_RESTORE_RE = re.compile(
    rf"^\s*RESTORE\s+TABLE\s+({_QNAME})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_RESTORE_TS_RE = re.compile(
    rf"^\s*RESTORE\s+TABLE\s+({_QNAME})\s+TO\s+TIMESTAMP\s+AS\s+OF\s+"
    rf"'([^']+)'\s*;?\s*$",
    re.IGNORECASE,
)
# Time-based retention (Delta VACUUM RETAIN n HOURS): expire history
# older than the horizon instead of counting versions.
_VACUUM_HOURS_RE = re.compile(
    rf"^\s*VACUUM\s+({_QNAME})\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS\s*;?\s*$",
    re.IGNORECASE,
)
_ANALYZE_RE = re.compile(rf"^\s*ANALYZE\s+({_QNAME})\s*;?\s*$", re.IGNORECASE)
# Zero-copy branching (operators/clone): create a shallow clone of a
# registered table at a path; end a clone's source dependency.
_CLONE_TABLE_RE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?P<dest>\w+)\s+SHALLOW\s+CLONE\s+"
    rf"(?P<src>{_QNAME})(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?\s+"
    rf"LOCATION\s+'(?P<loc>[^']+)'\s*;?\s*$",
    re.IGNORECASE,
)
_DETACH_RE = re.compile(
    rf"^\s*DETACH\s+TABLE\s+({_QNAME})\s*;?\s*$", re.IGNORECASE
)
_PROMOTE_RE = re.compile(
    rf"^\s*PROMOTE\s+TABLE\s+({_QNAME})(\s+FORCE)?\s*;?\s*$", re.IGNORECASE
)
# Table CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT parity)
_ADD_CONSTRAINT_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_QNAME})\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
    rf"CHECK\s*\((.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CONSTRAINT_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_QNAME})\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_DETAIL_RE = re.compile(
    rf"^\s*DESCRIBE\s+DETAIL\s+({_QNAME})\s*;?\s*$", re.IGNORECASE
)
# Deletion-vector maintenance (operators/deletevectors): fold
# outstanding vectors into the data files / inspect the mask state.
_MATERIALIZE_DV_RE = re.compile(
    rf"^\s*MATERIALIZE\s+DELETES\s+FOR\s+({_QNAME})\s*;?\s*$", re.IGNORECASE
)
_SHOW_DV_RE = re.compile(
    rf"^\s*SHOW\s+DELETION\s+VECTORS\s+FOR\s+({_QNAME})\s*;?\s*$",
    re.IGNORECASE,
)
# Restricted MERGE grammar — the star forms Hudi/Delta users run for
# CDC apply. Clause order: optional matched-DELETE, then the two star
# clauses (both optional, at least one required).
_MERGE_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+(?P<t>{_QNAME})\s+USING\s+"
    rf"(?:\((?P<subq>.+?)\)|(?P<src>{_QNAME}))"
    rf"(?:\s+AS\s+\w+|\s+(?!ON\b)\w+)?"
    rf"\s+ON\s+(?P<on>.+?)"
    rf"(?P<clauses>(?:\s+WHEN\s+(?:NOT\s+)?MATCHED\b.*?)+)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<act>UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE)",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+INTO\s+({_QNAME})\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+({_QNAME})\s+WHERE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+({_QNAME})\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Engine extension (no ANSI/native spelling): GDPR hard delete.
# `PURGE FROM t WHERE cond` floors history (cheap); the KEEP HISTORY
# suffix selects the snapshot-rewriting variant.
_PURGE_RE = re.compile(
    rf"^\s*PURGE\s+FROM\s+({_QNAME})\s+WHERE\s+(.+?)"
    r"(\s+KEEP\s+HISTORY)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Engine extension: incremental materialized views over registered
# KeyedTables (operators/matview.py) through the SQL layer. The AS
# body is the maintainable shape — SELECT <group cols + aliased
# aggregates> FROM <registered table> [JOIN <registered table> ON
# <l> = <r>] GROUP BY <group cols>; with a JOIN the view becomes a
# JoinMaterializedView maintained from BOTH tables' change feeds.
_CREATE_MV_RE = re.compile(
    rf"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+({_QNAME})"
    r"(?:\s+WITH\s+(?P<auto>AUTO\s+)?(?P<delta>DELTA\s+)?REFRESH"
    r"(?:\s+BUCKETS\s+(?P<buckets>\d+))?)?"
    rf"\s+AS\s+SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<base>{_QNAME})"
    rf"(?:\s+(?:(?P<jhow>INNER|LEFT(?:\s+OUTER)?)\s+)?JOIN\s+(?P<right>{_QNAME})"
    r"\s+ON\s+(?P<lon>[\w.\"`]+)\s*=\s*(?P<ron>[\w.\"`]+))?"
    r"\s+GROUP\s+BY\s+(?P<grp>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# ≥2 JOINs (inner or LEFT [OUTER]) → an N-table chain/star view
# (ChainMaterializedView); a single JOIN keeps the 2-table class.
_CREATE_MV_CHAIN_RE = re.compile(
    rf"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+({_QNAME})"
    r"(?:\s+WITH\s+(?P<auto>AUTO\s+)?(?P<delta>DELTA\s+)?REFRESH"
    r"(?:\s+BUCKETS\s+(?P<buckets>\d+))?)?"
    rf"\s+AS\s+SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<base>{_QNAME})"
    rf"(?P<joins>(?:\s+(?:(?:INNER|LEFT(?:\s+OUTER)?)\s+)?JOIN\s+{_QNAME}"
    r"\s+ON\s+[\w.\"`]+\s*=\s*[\w.\"`]+){2,})"
    r"\s+GROUP\s+BY\s+(?P<grp>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_JOIN_CLAUSE_RE = re.compile(
    rf"(?:(?P<how>INNER|LEFT(?:\s+OUTER)?)\s+)?"
    rf"JOIN\s+(?P<tbl>{_QNAME})\s+ON\s+(?P<lc>[\w.\"`]+)\s*=\s*(?P<rc>[\w.\"`]+)",
    re.IGNORECASE,
)
# Loose pre-match for any multi-join CREATE MATERIALIZED VIEW — used
# only to turn a shape neither strict regex accepted (e.g. LEFT JOIN
# in a 3-table chain) into a targeted error instead of a confusing
# fall-through to plain spark.sql.
_CREATE_MV_LOOSE_RE = re.compile(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+.+?\sFROM\s.+?"
    r"\sJOIN\s.+?\sJOIN\s",
    re.IGNORECASE | re.DOTALL,
)

_REFRESH_MV_RE = re.compile(
    rf"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+({_QNAME})"
    r"(?P<full>\s+FULL)?\s*;?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_MV_RE = re.compile(
    rf"^\s*DESCRIBE\s+MATERIALIZED\s+VIEW\s+({_QNAME})\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_MV_RE = re.compile(
    rf"^\s*DROP\s+MATERIALIZED\s+VIEW\s+({_QNAME})\s*;?\s*$", re.IGNORECASE
)
_SHOW_MV_RE = re.compile(
    r"^\s*SHOW\s+MATERIALIZED\s+VIEWS\s*;?\s*$", re.IGNORECASE
)
# EXPLAIN REWRITE <select>: report (without executing) whether the
# aggregate-navigation pass would serve the SELECT from a view store,
# and with what rewritten SQL. Plain EXPLAIN stays Spark's.
_EXPLAIN_RW_RE = re.compile(
    r"^\s*EXPLAIN\s+REWRITE\s+(?P<q>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Workload-driven view advisor (advisor.py): RECOMMEND ranks CREATE
# MATERIALIZED VIEW DDL for the session's unserved aggregate SELECTs;
# SHOW/RESET expose and clear the captured shape table.
_RECOMMEND_MV_RE = re.compile(
    r"^\s*RECOMMEND\s+MATERIALIZED\s+VIEWS(?:\s+LIMIT\s+(?P<lim>\d+))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_APPLY_RECS_RE = re.compile(
    r"^\s*APPLY\s+RECOMMENDATIONS(?:\s+LIMIT\s+(?P<lim>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_WORKLOAD_RE = re.compile(
    r"^\s*SHOW\s+QUERY\s+WORKLOAD\s*;?\s*$", re.IGNORECASE
)
_RESET_WORKLOAD_RE = re.compile(
    r"^\s*RESET\s+QUERY\s+WORKLOAD\s*;?\s*$", re.IGNORECASE
)
# Athena's UNLOAD shape (reference vendor/aws_athena.py:50-55 wraps
# every query in exactly this): UNLOAD (<query>) TO '<path>' WITH
# (format='parquet'|'csv'|'json'|'orc')
_UNLOAD_RE = re.compile(
    r"^\s*UNLOAD\s*\((?P<q>.*)\)\s*TO\s*'(?P<path>[^']+)'\s*"
    r"WITH\s*\(\s*format\s*=\s*'(?P<fmt>\w+)'\s*\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _merge_statement(spark: SparkSession, m: re.Match, known: dict):
    """Restricted ``MERGE INTO`` — the Hudi/Delta CDC-apply shape,
    mapped onto the engine's precombine merge:

    - ``WHEN MATCHED [AND <cond>] THEN DELETE`` → source rows whose
      key exists in the table AND meet <cond> become tombstones (Op =
      D); matched rows failing <cond> fall through to UPDATE SET *
      when present, else are left untouched
    - ``WHEN MATCHED THEN UPDATE SET *`` → matched source rows upsert
      whole-row (Op = U)
    - ``WHEN NOT MATCHED THEN INSERT *`` → unmatched source rows are
      always inserted (the delete condition never applies to them)
    - ``WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE`` →
      TARGET rows whose key is absent from the source (and meeting
      <cond>, evaluated against the target row) become tombstones —
      the Delta sync-job clause that makes one MERGE mirror a full
      source extract. Inherently a full target anti-join; bound it
      with a partition predicate in <cond> at scale.

    Any subset of the three clauses composes with standard MERGE
    semantics — the source is partitioned by matched/not-matched
    against the target's record keys and each half sees only its own
    clauses.

    Only the star forms are supported (CDC streams carry full row
    images); column-level SET belongs to ``UPDATE``. The ON clause
    must equate exactly the table's record key (``t.id = s.id`` per
    key column) — the engine merges BY KEY, so any other predicate
    would silently change semantics; a mismatch raises."""
    from pyspark.sql import functions as F

    name = _unquote_ident(m.group("t"))
    t = known[name]
    src = (
        run_query(spark, m.group("subq"), tables=known)
        if m.group("subq")
        else spark.table(_unquote_ident(m.group("src")))
    )
    # ON must be the record-key equality (any alias spelling):
    # split on AND, each side's last identifier segment must name a
    # key column; all key columns must be covered.
    key_cols = set(t.spec.record_key)
    seen = set()
    for conj in re.split(r"\s+AND\s+", m.group("on").strip(), flags=re.IGNORECASE):
        sides = [x.strip() for x in conj.split("=")]
        if len(sides) != 2:
            raise ValueError(f"MERGE ON must be key equality, got {conj!r}")
        names = {
            _unquote_ident(side).split(".")[-1] for side in sides
        }
        if len(names) != 1 or not (names & key_cols):
            raise ValueError(
                f"MERGE ON clause {conj!r} does not equate a record-key "
                f"column of {sorted(key_cols)}"
            )
        seen |= names
    if seen != key_cols:
        raise ValueError(
            f"MERGE ON must cover the full record key {sorted(key_cols)}; "
            f"covered {sorted(seen)}"
        )
    clauses = list(_WHEN_RE.finditer(m.group("clauses")))
    if not clauses:
        raise ValueError("MERGE needs at least one WHEN clause")
    # Every WHEN the statement spells must have parsed — an unparsed
    # clause silently dropped from the action set would execute a
    # DIFFERENT merge than the user wrote.
    n_spelled = len(
        re.findall(
            r"\bWHEN\s+(?:NOT\s+)?MATCHED\b",
            m.group("clauses"),
            flags=re.IGNORECASE,
        )
    )
    if len(clauses) != n_spelled:
        raise ValueError(
            "unsupported WHEN clause shape in MERGE — supported: "
            "WHEN MATCHED [AND c] THEN DELETE, WHEN MATCHED THEN "
            "UPDATE SET *, WHEN NOT MATCHED THEN INSERT *, "
            "WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE"
        )
    delete_cond = by_source_delete_cond = None
    star_update = star_insert = False
    for c in clauses:
        act = re.sub(r"\s+", " ", c.group("act").upper())
        if c.group("bysrc"):
            if not c.group("not"):
                raise ValueError("MATCHED BY SOURCE is not valid SQL")
            if act != "DELETE":
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports THEN DELETE "
                    "only (there is no source row to UPDATE/INSERT from)"
                )
            by_source_delete_cond = c.group("cond") or "true"
        elif act == "DELETE":
            if c.group("not"):
                raise ValueError("WHEN NOT MATCHED THEN DELETE is not valid")
            delete_cond = c.group("cond") or "true"
        elif act == "UPDATE SET *":
            if c.group("cond"):
                raise ValueError(
                    "conditional UPDATE SET * is not supported — "
                    "put the condition in the source query"
                )
            star_update = True
        elif act == "INSERT *":
            star_insert = True
    if not (star_update or star_insert or delete_cond or by_source_delete_cond):
        raise ValueError("MERGE needs UPDATE SET * / INSERT * / DELETE")
    keys = list(t.spec.record_key)
    # Standard MERGE semantics partition the SOURCE by matched /
    # not-matched against the target: matched rows see the WHEN
    # MATCHED clauses (DELETE where its condition holds, else UPDATE
    # SET * if present, else untouched); unmatched rows see only WHEN
    # NOT MATCHED THEN INSERT * — never the delete condition. Fast
    # path: UPDATE * + INSERT * with no DELETE is exactly the engine's
    # whole-row upsert, no join needed.
    if star_update and star_insert and delete_cond is None:
        batch = src
    elif not (star_update or star_insert or delete_cond):
        # by-source-only merge: no source-driven action at all
        batch = src.limit(0).withColumn("Op", F.lit("D"))
    else:
        # One key-join flags matched-ness (target keys are unique by
        # the table contract, so no fan-out); both halves reuse it.
        marker = t.read().select(*keys).withColumn("__matched", F.lit(True))
        flagged = src.join(marker, keys, "left")
        matched = flagged.filter(F.col("__matched")).drop("__matched")
        unmatched = flagged.filter(F.col("__matched").isNull()).drop("__matched")
        parts = []
        if delete_cond is not None:
            # SQL three-valued logic: the DELETE clause fires only
            # where the condition is TRUE; FALSE/NULL rows fall
            # through to the (unconditional) UPDATE SET * if present.
            hit = F.coalesce(F.expr(delete_cond).cast("boolean"), F.lit(False))
            parts.append(matched.filter(hit).withColumn("Op", F.lit("D")))
            if star_update:
                parts.append(matched.filter(~hit).withColumn("Op", F.lit("U")))
        elif star_update:
            parts.append(matched.withColumn("Op", F.lit("U")))
        if star_insert:
            parts.append(unmatched.withColumn("Op", F.lit("U")))
        batch = parts[0]
        for p in parts[1:]:
            batch = batch.unionByName(p)
    if by_source_delete_cond is not None:
        # Target rows with no source counterpart (key anti-join),
        # meeting the clause condition, tombstone at their CURRENT
        # precombine value (batch-wins-on-tie lands the delete). The
        # anti-join reads the target once — the price of the clause's
        # semantics; the condition can carry a partition predicate to
        # bound it.
        gone = (
            t.read()
            .join(src.select(*keys), keys, "left_anti")
            .filter(
                F.coalesce(
                    F.expr(by_source_delete_cond).cast("boolean"),
                    F.lit(False),
                )
            )
            .withColumn("Op", F.lit("D"))
        )
        batch = batch.unionByName(gone, allowMissingColumns=True)
    delete_mode = (
        "apply"
        if (delete_cond is not None or by_source_delete_cond is not None)
        else "ignore"
    )
    # One materialization serves the count AND the merge's actions
    # (the matched/unmatched key join, the by-source anti-join) —
    # except the plain fast path, where batch IS the source query and
    # caching would only duplicate its scan.
    cached = batch is not src
    if cached:
        batch = batch.cache()
    try:
        n = batch.count()
        if n:
            t.upsert(batch, delete_mode=delete_mode)
    finally:
        if cached:
            batch.unpersist()
    return _literal_frame(spark, 
        [(name, n)], "table_name string, rows_merged bigint"
    )


def _split_top_level(text: str) -> list[str]:
    """Split a SET clause on commas OUTSIDE quotes/parens — so
    ``a = f(x, y), b = 'v,w'`` yields two assignments. Honors the same
    '' / backslash escapes as the literal mask."""
    parts, depth, i, start, n = [], 0, 0, 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth = max(0, depth - 1)
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _build_join_matview(m, known, base, safe, group_cols, aggs, group_exprs):
    """The JOIN form of CREATE MATERIALIZED VIEW: resolve the right
    table, pick the ON sides (qualified names bind explicitly, with
    membership validated; unqualified names bind by unambiguous
    membership), and return ``(view, tables_to_hook)`` — the caller
    wires auto-refresh only after the initial refresh succeeds."""
    from rds_to_datalake_project_spark.operators.matview import (
        JoinMaterializedView,
    )

    base_name = _unquote_ident(m.group("base"))
    right_name = _unquote_ident(m.group("right"))
    right = known.get(right_name)
    if right is None:
        raise ValueError(
            f"JOIN table {right_name!r} is not a registered lake table; "
            f"known: {sorted(known)}"
        )

    def _side(tok: str) -> tuple[str | None, str]:
        # split FIRST, strip quoting per part — stripping outer quotes
        # of "a"."x" before the split would leave a stray quote in the
        # column name
        parts = [p.strip().strip('"').strip("`") for p in tok.strip().split(".")]
        if len(parts) == 2:
            return parts[0], parts[1]
        if len(parts) == 1:
            return None, parts[0]
        raise ValueError(f"ON identifier {tok!r} is not [table.]column")

    sides = [_side(m.group("lon")), _side(m.group("ron"))]
    l_cols, r_cols = set(base.read().columns), set(right.read().columns)

    def _belongs_left(q: str | None, c: str) -> bool:
        if q is not None:
            if q not in (base_name, right_name):
                raise ValueError(
                    f"ON qualifier {q!r} names neither joined table"
                )
            cols = l_cols if q == base_name else r_cols
            if c not in cols:
                raise ValueError(f"ON column {c!r} is not in table {q!r}")
            return q == base_name
        in_l, in_r = c in l_cols, c in r_cols
        if in_l == in_r:
            raise ValueError(
                f"ON column {c!r} is ambiguous or unknown — qualify it "
                f"({base_name}.{c} / {right_name}.{c})"
            )
        return in_l
    lefts = [_belongs_left(q, c) for q, c in sides]
    if lefts == [True, False]:
        on = (sides[0][1], sides[1][1])
    elif lefts == [False, True]:
        on = (sides[1][1], sides[0][1])
    else:
        raise ValueError("ON must equate one column from each joined table")
    jhow = (m.group("jhow") or "INNER").upper()
    how = "left" if jhow.startswith("LEFT") else "inner"
    # WITH DELTA REFRESH on the JOIN form → signed-delta join
    # maintenance (Δ(A⋈B) = ΔA⋈B + A⋈ΔB − ΔA⋈ΔB): refresh I/O ∝ the
    # change set's join neighborhoods. LEFT joins maintain the extra
    # dangling (NULL-extension) part via match-count transitions;
    # invertible aggregates only — violations raise here, failing the
    # CREATE cleanly.
    if m.group("delta"):
        from rds_to_datalake_project_spark.operators.matview import (
            DeltaJoinMaterializedView,
        )

        cls = DeltaJoinMaterializedView
    else:
        cls = JoinMaterializedView
    mv = cls(
        base,
        right,
        f"{base.path}/.matviews/{safe}",
        on=on,
        group_cols=group_cols,
        aggs=aggs,
        name=safe,
        how=how,
        group_exprs=group_exprs,
        store_hash_buckets=int(m.group("buckets") or 0),
    )
    return mv, [base, right]


def _publish_matview(spark: SparkSession, name: str, mv) -> None:
    """Expose the view's current contents to plain SELECTs. Re-run
    after every refresh: the temp view pins the snapshot plan that
    existed at registration time, so it must track the store's head.
    Names are validated to ``\\w+`` at CREATE — a quoted "my-view"
    used to create successfully yet silently skip this publish and
    never be SELECTable (r10 VERDICT "What's wrong" #4)."""
    mv.read().createOrReplaceTempView(name)


def _parse_mv_shape(m: re.Match):
    """Shared CREATE MATERIALIZED VIEW select/GROUP BY parsing: split
    aliased select items into aggregates vs DERIVED group keys
    (disambiguated by the GROUP BY list — both `GROUP BY <alias>` and
    `GROUP BY <expr>` spellings), validate coverage, and return
    ``(group_cols, group_exprs, aggs)``."""
    aliased: dict[str, str] = {}
    plain_sel: list[str] = []
    for item in _split_top_level(m.group("sel")):
        alias = re.match(r"(?is)^(.+?)\s+AS\s+(\w+)\s*$", item)
        if alias:
            if alias.group(2) in aliased:
                raise ValueError(f"duplicate select alias {alias.group(2)!r}")
            aliased[alias.group(2)] = alias.group(1).strip()
        elif re.fullmatch(r"\w+", item):
            plain_sel.append(item)
        else:
            raise ValueError(
                f"select item {item!r} must be a GROUP BY column or an "
                "aliased aggregate/expression (<expr> AS <name>)"
            )

    def _norm(e: str) -> str:
        # whitespace-insensitive expression matching: collapse runs,
        # then strip spaces around delimiters so `date_trunc('hour',ts)`
        # in GROUP BY matches `date_trunc('hour', ts) AS h` in SELECT
        # (r11 ADVICE: equality on raw spelling rejected valid SQL)
        e = re.sub(r"\s+", " ", e.strip().lower())
        return re.sub(r"\s*([(),+\-*/])\s*", r"\1", e)

    group_cols: list[str] = []
    group_exprs: dict[str, str] = {}
    for item in _split_top_level(m.group("grp")):
        if re.fullmatch(r"\w+", item):
            group_cols.append(item)
            if item in aliased:  # GROUP BY <alias of a select expr>
                group_exprs[item] = aliased.pop(item)
        else:
            hits = [a for a, e in aliased.items() if _norm(e) == _norm(item)]
            if len(hits) != 1:
                raise ValueError(
                    f"GROUP BY expression {item!r} must match exactly one "
                    "aliased select item (<expr> AS <name>); the "
                    "`GROUP BY <alias>` spelling avoids expression-"
                    "matching entirely"
                )
            group_cols.append(hits[0])
            group_exprs[hits[0]] = aliased.pop(hits[0])
    aggs = aliased  # every remaining aliased item is an aggregate
    stray = [c for c in plain_sel if c not in group_cols]
    if stray:
        raise ValueError(
            f"select item(s) {stray} are neither GROUP BY columns nor "
            "aliased expressions"
        )
    missing = [
        c for c in group_cols if c not in plain_sel and c not in group_exprs
    ]
    if missing:
        raise ValueError(
            f"select list must include every GROUP BY column; missing {missing}"
        )
    return group_cols, group_exprs, aggs


def _validate_mv_name(name: str) -> None:
    if not re.fullmatch(r"\w+", name):
        raise ValueError(
            f"materialized view name {name!r} must be a plain identifier "
            "([A-Za-z0-9_]+) — the view is published as a Spark temp view "
            "for SELECTs, which cannot carry quoted punctuation"
        )


def _finish_matview_create(spark, m: re.Match, name: str, mv, hooked_tables):
    """Shared CREATE tail: initial refresh BEFORE wiring auto-refresh
    hooks (a broken AS body must fail the CREATE cleanly — hooks
    attached first would outlive the failed statement), then hook
    wiring, registration, temp-view publish, and the summary frame."""
    info = mv.refresh()
    if m.group("auto"):
        # The SQL layer's own hook, not the operators' attach helper:
        # the published temp view pins the store's file listing at
        # registration, so an auto refresh that rewrites store files
        # must RE-PUBLISH or the next SELECT hits FILE_NOT_EXIST.
        def _auto_hook(_t, _mv=mv, _name=name):
            _mv.refresh()
            _publish_matview(spark, _name, _mv)

        for t in hooked_tables:
            t.add_maintenance_hook(_auto_hook)
    MATVIEWS[name] = mv
    _publish_matview(spark, name, mv)
    # record the definition shape for SELECT rewriting (rewrite.py):
    # plain GROUP BY queries over the same FROM are served from the
    # store while the view is fresh
    from rds_to_datalake_project_spark import rewrite as _rw

    _rw.attach_meta(mv, m)
    return _literal_frame(spark, 
        [
            (
                name,
                info["mode"],
                info["base_version"],
                info["groups_refreshed"],
                bool(m.group("auto")),
            )
        ],
        "view_name string, mode string, base_version int, "
        "groups_refreshed bigint, auto_refresh boolean",
    )


def _create_matview_statement(spark: SparkSession, m: re.Match, known: dict):
    """``CREATE MATERIALIZED VIEW v [WITH AUTO REFRESH] AS SELECT
    <group cols + aliased aggregates> FROM <registered table>
    [JOIN <registered table> ON <l> = <r>] GROUP BY <group cols>`` →
    an incrementally-maintained operators/matview.MaterializedView
    (JoinMaterializedView for the JOIN form, maintained from BOTH
    tables' change feeds) stored under the base table's ``.matviews/``
    directory, initially refreshed, registered for REFRESH/DROP and
    (for simple names) as a temp view for SELECTs.

    WITH AUTO REFRESH additionally attaches the refresh as a
    post-commit maintenance hook on the base — the view then follows
    every upsert with no further statements (advisory slot: a failed
    refresh leaves the view stale, never wrong).
    """
    from rds_to_datalake_project_spark.operators.matview import (
        MaterializedView,
    )

    name = _unquote_ident(m.group(1))
    _validate_mv_name(name)
    base = known[_unquote_ident(m.group("base"))]
    group_cols, group_exprs, aggs = _parse_mv_shape(m)
    safe = re.sub(r"[^A-Za-z0-9_]", "_", name)
    if m.group("right"):
        mv, hooked_tables = _build_join_matview(
            m, known, base, safe, group_cols, aggs, group_exprs
        )
    else:
        from rds_to_datalake_project_spark.operators.matview import (
            DeltaMaterializedView,
        )

        # WITH DELTA REFRESH → signed-delta maintenance: refresh I/O ∝
        # the change window (SUM/COUNT aggregates only — the class
        # validates and raises here, failing the CREATE cleanly)
        cls = DeltaMaterializedView if m.group("delta") else MaterializedView
        mv = cls(
            base,
            f"{base.path}/.matviews/{safe}",
            group_cols,
            aggs,
            name=safe,
            group_exprs=group_exprs,
            store_hash_buckets=int(m.group("buckets") or 0),
        )
        hooked_tables = [base]
    return _finish_matview_create(spark, m, name, mv, hooked_tables)


def _create_chain_matview_statement(spark, m: re.Match, known: dict):
    """CREATE MATERIALIZED VIEW over ≥3 tables (≥2 inner JOINs) → an
    incrementally-maintained ChainMaterializedView. Each ON pair is
    ordered (earlier-table column, new-table column) by qualified
    binding or unambiguous membership; the view class itself validates
    the attachment structure (chain / star / snowflake)."""
    from rds_to_datalake_project_spark.operators.matview import (
        ChainMaterializedView,
    )

    name = _unquote_ident(m.group(1))
    _validate_mv_name(name)
    base_name = _unquote_ident(m.group("base"))
    tables = [known[base_name]]
    names = [base_name]
    cols_sofar = set(tables[0].read().columns)
    on: list[tuple[str, str]] = []
    hows: list[str] = []
    for jm in _JOIN_CLAUSE_RE.finditer(m.group("joins")):
        hows.append(
            "left" if (jm.group("how") or "").upper().startswith("LEFT")
            else "inner"
        )
        rname = _unquote_ident(jm.group("tbl"))
        right = known.get(rname)
        if right is None:
            raise ValueError(
                f"JOIN table {rname!r} is not a registered lake table; "
                f"known: {sorted(known)}"
            )
        r_cols = set(right.read().columns)

        def _side(tok: str):
            parts = [
                p.strip().strip('"').strip("`")
                for p in tok.strip().split(".")
            ]
            if len(parts) == 2:
                return parts[0], parts[1]
            if len(parts) == 1:
                return None, parts[0]
            raise ValueError(f"ON identifier {tok!r} is not [table.]column")

        sides = [_side(jm.group("lc")), _side(jm.group("rc"))]

        def _is_right(q, c):
            if q is not None:
                if q == rname:
                    if c not in r_cols:
                        raise ValueError(
                            f"ON column {c!r} is not in table {rname!r}"
                        )
                    return True
                if q not in names:
                    raise ValueError(
                        f"ON qualifier {q!r} names no table joined so far"
                    )
                return False
            in_r, in_l = c in r_cols, c in cols_sofar
            if in_r == in_l:
                raise ValueError(
                    f"ON column {c!r} is ambiguous or unknown — qualify it"
                )
            return in_r

        rights = [_is_right(q, c) for q, c in sides]
        if rights == [False, True]:
            on.append((sides[0][1], sides[1][1]))
        elif rights == [True, False]:
            on.append((sides[1][1], sides[0][1]))
        else:
            raise ValueError(
                "each ON must equate one earlier-table column with one "
                "column of the newly joined table"
            )
        tables.append(right)
        names.append(rname)
        cols_sofar |= r_cols
    group_cols, group_exprs, aggs = _parse_mv_shape(m)
    safe = re.sub(r"[^A-Za-z0-9_]", "_", name)
    # WITH DELTA REFRESH → inclusion–exclusion signed-delta chain
    # maintenance (invertible aggregates only — validated in __init__,
    # failing the CREATE cleanly). The delta chain is inner-only: its
    # inclusion–exclusion terms have no dangling corrections.
    extra = {}
    if m.group("delta"):
        from rds_to_datalake_project_spark.operators.matview import (
            DeltaChainMaterializedView,
        )

        if any(h == "left" for h in hows):
            raise ValueError(
                "LEFT joins are not supported with DELTA REFRESH in "
                "N-table chains — use the recompute chain (drop DELTA) "
                "or the 2-table delta form (single LEFT JOIN)"
            )
        cls = DeltaChainMaterializedView
    else:
        cls = ChainMaterializedView
        extra = {"hows": hows}
    mv = cls(
        tables,
        on=on,
        path=f"{tables[0].path}/.matviews/{safe}",
        group_cols=group_cols,
        aggs=aggs,
        **extra,
        name=safe,
        group_exprs=group_exprs,
        store_hash_buckets=int(m.group("buckets") or 0),
    )
    return _finish_matview_create(spark, m, name, mv, tables)


def _maintenance_statement(spark: SparkSession, sql: str, known: dict):
    """Lake-maintenance statements through the one SQL layer (the
    public Delta SQL surface, resolved against registered KeyedTables):

    - ``OPTIMIZE <t>``                  → incremental small-file
      compaction (operators/compact.compact_partitions)
    - ``OPTIMIZE <t> ZORDER BY (a, b)`` → curve-clustered full rewrite
      (operators/compact.compact_table cluster_by)
    - ``DESCRIBE HISTORY <t>``          → commit-log introspection
      (KeyedTable.describe_history)
    - ``UNLOAD (<query>) TO '<path>' WITH (format='<f>')`` → result
      export (unload_query; the reference's Athena UNLOAD shape,
      vendor/aws_athena.py:50-55 — the inner query flows through
      run_query, so session-registered ``FOR VERSION AS OF`` works)
    - ``VACUUM <t> RETAIN <k> VERSIONS`` → snapshot-history expiry
      (KeyedTable.vacuum_versions); ``VACUUM <t> RETAIN <n> HOURS``
      expires by commit AGE instead (KeyedTable.vacuum_older_than)
    - ``RESTORE TABLE <t> TO TIMESTAMP AS OF '<iso>'`` → rollback
      addressed by wall clock (version_at_timestamp + restore)
    - ``ANALYZE <t>``                   → per-column table profile
      (operators/profile.profile_table)
    - ``INSERT INTO <t> <query>``       → upsert of the query result
      (merge semantics; the inner query flows through run_query, so
      AS-OF and registered names work — unregistered target names
      pass through to a native catalog)
    - ``DELETE FROM <t> WHERE <expr>``  → row-level delete
      (KeyedTable.delete_where — tombstones through the merge, or a
      merge-on-read deletion-vector commit on tables opened with
      ``deletion_vectors=True``)
    - ``CREATE TABLE <b> SHALLOW CLONE <t> [VERSION AS OF k]
      LOCATION '<path>'`` → zero-copy branch (operators/clone) —
      registers <b> for subsequent statements in this session
    - ``DETACH TABLE <b>``              → end a clone's source
      dependency (ClonedTable.detach — copies the remainder locally)
    - ``PROMOTE TABLE <b> [FORCE]``     → write-audit-publish: commit
      the branch's diverged partitions back to the source
      (ClonedTable.promote — partition-level conflict detection)
    - ``ALTER TABLE <t> ADD CONSTRAINT <n> CHECK (<expr>)`` /
      ``DROP CONSTRAINT <n>`` → persisted table CHECK constraints,
      validated against existing rows at ADD and enforced on every
      write (KeyedTable.add_constraint — Delta constraint parity)
    - ``DESCRIBE DETAIL <t>``           → location, partitioning,
      file count/bytes, version, constraints, clone source
    - ``MATERIALIZE DELETES FOR <t>``   → fold outstanding deletion
      vectors into the data files (KeyedTable.materialize_deletes)
    - ``SHOW DELETION VECTORS FOR <t>`` → mask state: outstanding
      dirs, masked rows, bytes, fold floor (deletevectors.dv_stats)
    - ``UPDATE <t> SET a = e, ... WHERE <expr>`` → row-level update
      (KeyedTable.update_where — read-modify-merge; key/partition
      columns are immutable and raise)
    - ``PURGE FROM <t> WHERE <expr> [KEEP HISTORY]`` → GDPR hard
      delete (KeyedTable.purge_rows — plain form floors history;
      KEEP HISTORY rewrites retained snapshots minus the purged keys)
    - ``CREATE MATERIALIZED VIEW <v> [WITH [AUTO] [DELTA] REFRESH]
      AS SELECT ... FROM <t> GROUP BY ...`` → incrementally-maintained
      view (operators/matview.MaterializedView; AUTO attaches a
      post-commit hook on the base; DELTA selects signed-delta
      maintenance — sum/count/avg/min/max/count(DISTINCT), refresh
      I/O ∝ the change set; works on single tables, 2-table joins,
      and N-table chains)
    - ``REFRESH MATERIALIZED VIEW <v> [FULL]`` / ``DROP MATERIALIZED
      VIEW <v>`` → bring the view to the base's head (FULL forces a
      rebuild from the snapshot — the distrust verb) / unbind it
    - ``DESCRIBE MATERIALIZED VIEW <v>`` → class, strategy, base
      tables, cursor, distinct-aux columns, pending-intent flag

    Returns a one-row summary DataFrame, or None when ``sql`` is an
    ordinary query. Unknown table names raise — maintenance must never
    silently no-op."""

    def _resolve(name: str):
        name = _unquote_ident(name)
        t = known.get(name)
        if t is None:
            raise ValueError(
                f"maintenance statement on unknown table {name!r}; "
                f"known: {sorted(known)}"
            )
        return t

    # Table-bound verbs engage only when KeyedTables are registered —
    # with an empty registry the statement passes through untouched
    # (same contract as the AS OF rewrite: a native Delta/Iceberg
    # catalog may own this syntax). UNLOAD is not table-bound and is
    # handled below regardless.
    table_bound = bool(known)

    m = _OPTIMIZE_ZORDER_RE.match(sql)
    if m and table_bound:
        from rds_to_datalake_project_spark.operators.compact import compact_table

        cols = tuple(c.strip() for c in m.group(2).split(","))
        n = compact_table(
            _resolve(m.group(1)),
            cluster_by=cols,  # any arity — N-dim Morton interleave
            curve="zorder",  # the verb names Z-order, not the default Hilbert
        )
        return _literal_frame(spark, 
            [(m.group(1), n)], "table_name string, target_files int"
        )
    m = _OPTIMIZE_RE.match(sql)
    if m and table_bound:
        from rds_to_datalake_project_spark.operators.compact import (
            compact_partitions,
        )

        rewritten = compact_partitions(_resolve(m.group(1)))
        return _literal_frame(spark, 
            [(m.group(1), len(rewritten))],
            "table_name string, partitions_rewritten int",
        )
    m = _HISTORY_RE.match(sql)
    if m and table_bound:
        hist = _resolve(m.group(1)).describe_history()
        return _literal_frame(spark, 
            [
                (
                    h["version"],
                    h["readable"],
                    h["commit_time_ms"],
                    h["created_partitions"],
                    h["retired_partitions"],
                    h["maintenance_errors"],
                )
                for h in hist
            ],
            "version int, readable boolean, commit_time_ms long, "
            "created_partitions array<string>, retired_partitions array<string>, "
            "maintenance_errors array<string>",
        )
    m = _VACUUM_RE.match(sql)
    if m and table_bound:
        expired = _resolve(m.group(1)).vacuum_versions(keep_last=int(m.group(2)))
        return _literal_frame(spark, 
            [(m.group(1), expired)], "table_name string, versions_expired int"
        )
    m = _RESTORE_RE.match(sql)
    if m and table_bound:
        new_v = _resolve(m.group(1)).restore_to_version(int(m.group(2)))
        return _literal_frame(spark, 
            [(m.group(1), int(m.group(2)), new_v)],
            "table_name string, restored_version int, new_version int",
        )
    m = _RESTORE_TS_RE.match(sql)
    if m and table_bound:
        t = _resolve(m.group(1))
        target = t.version_at_timestamp(m.group(2))
        new_v = t.restore_to_version(target)
        return _literal_frame(spark, 
            [(m.group(1), target, new_v)],
            "table_name string, restored_version int, new_version int",
        )
    m = _VACUUM_HOURS_RE.match(sql)
    if m and table_bound:
        expired = _resolve(m.group(1)).vacuum_older_than(float(m.group(2)))
        return _literal_frame(spark, 
            [(m.group(1), expired)], "table_name string, versions_expired int"
        )
    m = _ANALYZE_RE.match(sql)
    if m and table_bound:
        from rds_to_datalake_project_spark.operators.profile import profile_table

        return profile_table(_resolve(m.group(1)).read())
    m = _CLONE_TABLE_RE.match(sql)
    if m and table_bound:
        from rds_to_datalake_project_spark.operators.clone import clone_table

        src = _resolve(m.group("src"))
        v = int(m.group("v")) if m.group("v") else None
        dest = clone_table(src, m.group("loc"), version=v)
        register_time_travel(m.group("dest"), dest)
        known[m.group("dest")] = dest
        # Plain SELECT FROM <dest> resolves through a temp view; like
        # any registered view it reflects the plan AT REGISTRATION —
        # re-register (or use the handle) after branch commits.
        dest.register(m.group("dest"))
        return _literal_frame(spark, 
            [
                (
                    m.group("dest"),
                    m.group("src"),
                    v if v is not None else (src.versions() or [0])[-1],
                    m.group("loc"),
                )
            ],
            "table_name string, source string, pinned_version int, "
            "location string",
        )
    m = _DETACH_RE.match(sql)
    if m and table_bound:
        t = _resolve(m.group(1))
        if not hasattr(t, "detach"):
            raise ValueError(f"{m.group(1)} is not a shallow clone")
        res = t.detach()
        return _literal_frame(spark, 
            [(m.group(1), res["partitions_copied"])],
            "table_name string, partitions_copied int",
        )
    m = _PROMOTE_RE.match(sql)
    if m and table_bound:
        t = _resolve(m.group(1))
        if not hasattr(t, "promote"):
            raise ValueError(f"{m.group(1)} is not a shallow clone")
        res = t.promote(force=bool(m.group(2)))
        return _literal_frame(spark, 
            [
                (
                    m.group(1),
                    res["partitions_published"],
                    res["source_version"],
                )
            ],
            "table_name string, partitions_published int, "
            "source_version int",
        )
    m = _ADD_CONSTRAINT_RE.match(sql)
    if m and table_bound:
        _resolve(m.group(1)).add_constraint(m.group(2), m.group(3).strip())
        return _literal_frame(spark, 
            [(m.group(1), m.group(2), m.group(3).strip())],
            "table_name string, constraint_name string, check_expr string",
        )
    m = _DROP_CONSTRAINT_RE.match(sql)
    if m and table_bound:
        _resolve(m.group(1)).drop_constraint(m.group(2))
        return _literal_frame(spark, 
            [(m.group(1), m.group(2))],
            "table_name string, constraint_name string",
        )
    m = _DESCRIBE_DETAIL_RE.match(sql)
    if m and table_bound:
        t = _resolve(m.group(1))
        import json as _json

        # Hadoop FS walk (portable to HDFS/object stores), hidden
        # trees (.meta/.retired/.dv/indexes) skipped — live data only.
        fs, root_p = t._fs(t.path)
        n_files = size = 0
        stack = [root_p]
        while stack:
            p = stack.pop()
            for st in fs.listStatus(p):
                name = st.getPath().getName()
                if name.startswith((".", "_")):
                    continue
                if st.isDirectory():
                    stack.append(st.getPath())
                elif name.endswith(".parquet"):
                    n_files += 1
                    size += st.getLen()
        versions = t.versions() if t.retain_versions else []
        meta = getattr(t, "_clone_meta", lambda: None)()
        return _literal_frame(spark, 
            [
                (
                    m.group(1),
                    t.path,
                    list(t.partition_cols),
                    n_files,
                    size,
                    (versions or [0])[-1] if t.retain_versions else None,
                    t.retain_versions,
                    _json.dumps(t.constraints(), sort_keys=True),
                    meta["src_path"] if meta else None,
                )
            ],
            "table_name string, location string, "
            "partition_columns array<string>, num_files long, "
            "size_bytes long, version int, retain_versions int, "
            "constraints string, clone_source string",
        )
    m = _MATERIALIZE_DV_RE.match(sql)
    if m and table_bound:
        res = _resolve(m.group(1)).materialize_deletes()
        return _literal_frame(spark, 
            [
                (
                    m.group(1),
                    res["folded_dirs"],
                    res["rows"],
                    res["partitions_rewritten"],
                    res["version"],
                )
            ],
            "table_name string, folded_dirs int, rows long, "
            "partitions_rewritten int, version int",
        )
    m = _SHOW_DV_RE.match(sql)
    if m and table_bound:
        from rds_to_datalake_project_spark.operators.deletevectors import (
            dv_stats,
        )

        t = _resolve(m.group(1))
        st = dv_stats(t.spark, t.path)
        return _literal_frame(spark, 
            [
                (
                    m.group(1),
                    st["dirs"],
                    st["rows"],
                    st["bytes"],
                    st["fold_floor"],
                    st["total_dirs"],
                )
            ],
            "table_name string, outstanding_dirs int, masked_rows long, "
            "bytes long, fold_floor int, total_dirs int",
        )
    m = _CREATE_MV_CHAIN_RE.match(sql)
    if m and table_bound and _unquote_ident(m.group("base")) in known:
        return _create_chain_matview_statement(spark, m, known)
    m = _CREATE_MV_RE.match(sql)
    if m and table_bound and _unquote_ident(m.group("base")) in known:
        return _create_matview_statement(spark, m, known)
    # A multi-join CREATE MATERIALIZED VIEW that matched NEITHER shape
    # (e.g. a LEFT JOIN inside a ≥2-join chain) must fail loudly here:
    # falling through to plain spark.sql would surface a confusing
    # unresolved-table/parse error instead of naming the limitation
    # (r11 ADVICE / VERDICT task #7).
    if _CREATE_MV_LOOSE_RE.match(sql) and table_bound:
        raise ValueError(
            "unsupported CREATE MATERIALIZED VIEW shape: N-table (>= 2 "
            "JOIN) chains support INNER and LEFT [OUTER] joins only — "
            "RIGHT/FULL chains are not maintainable by "
            "ChainMaterializedView (spell a RIGHT join as LEFT from "
            "the other side)."
        )
    # REFRESH/DROP MATERIALIZED VIEW is engine-only syntax (no native
    # Spark spelling — its REFRESH takes resource paths), so these
    # intercept unconditionally and an unknown name raises.
    m = _SHOW_MV_RE.match(sql)
    if m:
        # fleet view of DESCRIBE: one row per registered view with its
        # maintenance strategy and freshness lag (commits the cursor
        # trails its bases by, summed; NULL = never refreshed / reset
        # base / pending delta intent — the states the SELECT rewriter
        # also refuses to serve). Metadata reads only.
        from rds_to_datalake_project_spark import rewrite as _rw
        from rds_to_datalake_project_spark.operators.matview import (
            _SignedDeltaMergeMixin,
        )

        rows = []
        for name, mv in MATVIEWS.items():
            if hasattr(mv, "tables"):
                tables = ",".join(t.spec.name for t in mv.tables)
            elif hasattr(mv, "left"):
                tables = f"{mv.left.spec.name},{mv.right.spec.name}"
            else:
                tables = mv.base.spec.name
            is_delta = isinstance(mv, _SignedDeltaMergeMixin)
            try:
                lag = _rw._lag(mv)
            except Exception:
                lag = None  # base gone/unreadable: same NULL as stale
            rows.append(
                (
                    name,
                    type(mv).__name__,
                    "delta" if is_delta else "recompute",
                    tables,
                    ",".join(mv.group_cols),
                    lag,
                )
            )
        return _literal_frame(spark, 
            rows,
            "view_name string, view_class string, strategy string, "
            "base_tables string, group_cols string, lag_commits bigint",
        )
    m = _DESCRIBE_MV_RE.match(sql)
    if m:
        # ops introspection: view class, maintenance strategy, base
        # tables, refresh cursor, distinct-aux columns, and whether a
        # crashed delta apply left a pending intent (the next refresh
        # will full-rebuild) — the matview twin of DESCRIBE HISTORY.
        from rds_to_datalake_project_spark.operators.matview import (
            _SignedDeltaMergeMixin,
        )

        name = _unquote_ident(m.group(1))
        mv = MATVIEWS.get(name)
        if mv is None:
            raise ValueError(
                f"DESCRIBE MATERIALIZED VIEW on unknown view {name!r}; "
                f"known: {sorted(MATVIEWS)}"
            )
        if hasattr(mv, "tables"):
            tables = ",".join(t.spec.name for t in mv.tables)
            cursor = mv.refreshed_versions()
        elif hasattr(mv, "left"):
            tables = f"{mv.left.spec.name},{mv.right.spec.name}"
            cursor = mv.refreshed_versions()
        else:
            tables = mv.base.spec.name
            cursor = mv.refreshed_version()
        is_delta = isinstance(mv, _SignedDeltaMergeMixin)
        aux = ",".join(sorted(getattr(mv, "_aux", {}) or {})) or None
        return _literal_frame(spark, 
            [
                (
                    name,
                    type(mv).__name__,
                    "delta" if is_delta else "recompute",
                    tables,
                    str(cursor),
                    ",".join(mv.group_cols),
                    aux,
                    bool(mv._pending()) if is_delta else False,
                )
            ],
            "view_name string, view_class string, strategy string, "
            "base_tables string, cursor string, group_cols string, "
            "distinct_aux_columns string, pending_intent boolean",
        )
    m = _REFRESH_MV_RE.match(sql)
    if m:
        name = _unquote_ident(m.group(1))
        mv = MATVIEWS.get(name)
        if mv is None:
            raise ValueError(
                f"REFRESH MATERIALIZED VIEW on unknown view {name!r}; "
                f"known: {sorted(MATVIEWS)}"
            )
        if m.group("full"):
            # REFRESH ... FULL: operator-forced rebuild from the
            # current snapshot(s) — the ops verb for "I don't trust
            # the view" (e.g. after an out-of-band store repair).
            heads = getattr(mv, "tables", None)
            if heads is not None:  # chain view: tuple-of-heads _full
                info = mv._full(
                    tuple((t.versions() or [0])[-1] for t in mv.tables)
                )
            elif hasattr(mv, "left"):  # join view
                info = mv._full(
                    (mv.left.versions() or [0])[-1],
                    (mv.right.versions() or [0])[-1],
                )
            else:
                info = mv._full((mv.base.versions() or [0])[-1])
        else:
            info = mv.refresh()
        _publish_matview(spark, name, mv)
        return _literal_frame(spark, 
            [(name, info["mode"], info["base_version"], info["groups_refreshed"])],
            "view_name string, mode string, base_version int, groups_refreshed bigint",
        )
    m = _DROP_MV_RE.match(sql)
    if m:
        name = _unquote_ident(m.group(1))
        if name not in MATVIEWS:
            raise ValueError(
                f"DROP MATERIALIZED VIEW on unknown view {name!r}; "
                f"known: {sorted(MATVIEWS)}"
            )
        del MATVIEWS[name]
        # The store directory is left on disk (re-CREATE reuses or
        # full-refreshes over it); only the name binding goes away.
        if re.fullmatch(r"\w+", name):
            spark.catalog.dropTempView(name)
        return _literal_frame(spark, [(name, True)], "view_name string, dropped boolean")
    m = _EXPLAIN_RW_RE.match(sql)
    if m:
        # report the aggregate-navigation decision without running the
        # query: which fresh view would serve it, in which mode, with
        # what store-side SQL (NULLs = base plan)
        from rds_to_datalake_project_spark import rewrite as _rw

        df = _rw.try_rewrite(spark, m.group("q"), observe=False)
        hit = _rw.LAST_SELECT_REWRITE if df is not None else None
        return _literal_frame(spark, 
            [
                (
                    hit["view"] if hit else None,
                    hit["mode"] if hit else None,
                    hit["sql"] if hit else None,
                    hit is not None,
                )
            ],
            "served_by string, mode string, rewritten_sql string, "
            "rewritten boolean",
        )
    m = _RECOMMEND_MV_RE.match(sql)
    if m:
        from rds_to_datalake_project_spark import advisor

        recs = advisor.recommend(
            top=int(m.group("lim")) if m.group("lim") else None,
            tables=known,
        )
        return _literal_frame(spark, 
            [
                (
                    r["name"],
                    r["strategy"],
                    r["queries_served"],
                    r["shapes_served"],
                    ", ".join(r["group_cols"]),
                    r["est_base_files"],
                    r["est_base_bytes"],
                    r["ddl"],
                )
                for r in recs
            ],
            "view_name string, strategy string, queries_served bigint, "
            "shapes_served bigint, group_cols string, "
            "est_base_files bigint, est_base_bytes bigint, ddl string",
        )
    m = _APPLY_RECS_RE.match(sql)
    if m:
        # the advisor's loop-closing verb: execute the ranked DDL.
        # Name collisions with existing views are SKIPPED, never
        # replaced — an operator who hand-tuned a view keeps it.
        from rds_to_datalake_project_spark import advisor

        recs = advisor.recommend(
            top=int(m.group("lim")) if m.group("lim") else None,
            tables=known,
        )
        applied = []
        for r in recs:
            if r["name"] in MATVIEWS:
                applied.append((r["name"], r["strategy"], False, "exists"))
                continue
            run_query(spark, r["ddl"], tables=known)
            applied.append((r["name"], r["strategy"], True, None))
        return _literal_frame(spark, 
            applied,
            "view_name string, strategy string, created boolean, "
            "skipped_reason string",
        )
    m = _SHOW_WORKLOAD_RE.match(sql)
    if m:
        from rds_to_datalake_project_spark import advisor

        return _literal_frame(spark, 
            [
                (
                    r["from_text"],
                    ", ".join(c for c, _e, _n in r["group_terms"]),
                    ", ".join(sorted(r["aggs"])),
                    r["served_by"],
                    r["hits"],
                    r["served_hits"],
                )
                for r in advisor.workload()
            ],
            "from_clause string, group_by string, aggregates string, "
            "served_by string, hits bigint, served_hits bigint",
        )
    m = _RESET_WORKLOAD_RE.match(sql)
    if m:
        from rds_to_datalake_project_spark import advisor

        n = len(advisor.workload())
        advisor.reset()
        return _literal_frame(spark, 
            [(n, True)], "shapes_cleared bigint, reset boolean"
        )
    m = _MERGE_RE.match(sql)
    if m and table_bound and _unquote_ident(m.group("t")) in known:
        return _merge_statement(spark, m, known)
    m = _INSERT_RE.match(sql)
    if m and table_bound and _unquote_ident(m.group(1)) in known:
        t = _resolve(m.group(1))
        rows = run_query(spark, m.group(2), tables=known)
        n = rows.count()
        if n:
            t.upsert(rows)  # merge semantics: same-key rows take the
            # incoming version per the precombine rule (idempotent)
        return _literal_frame(spark, 
            [(m.group(1), n)], "table_name string, rows_inserted bigint"
        )
    m = _DELETE_RE.match(sql)
    if m and table_bound and _unquote_ident(m.group(1)) in known:
        n = _resolve(m.group(1)).delete_where(m.group(2))
        return _literal_frame(spark, 
            [(m.group(1), n)], "table_name string, rows_deleted bigint"
        )
    m = _PURGE_RE.match(sql)
    if m and table_bound and _unquote_ident(m.group(1)) in known:
        n = _resolve(m.group(1)).purge_rows(
            m.group(2), keep_history=bool(m.group(3))
        )
        return _literal_frame(spark, 
            [(m.group(1), n, bool(m.group(3)))],
            "table_name string, rows_purged bigint, kept_history boolean",
        )
    m = _UPDATE_RE.match(sql)
    if m and table_bound and _unquote_ident(m.group(1)) in known:
        assignments = {}
        for part in _split_top_level(m.group(2)):
            col, _eq, expr = part.partition("=")
            if not _eq or not col.strip() or not expr.strip():
                raise ValueError(f"malformed SET assignment: {part!r}")
            assignments[_unquote_ident(col.strip())] = expr.strip()
        n = _resolve(m.group(1)).update_where(m.group(3), assignments)
        return _literal_frame(spark, 
            [(m.group(1), n)], "table_name string, rows_updated bigint"
        )
    m = _UNLOAD_RE.match(sql)
    if m:
        unload_query(
            spark, m.group("q"), m.group("path"), fmt=m.group("fmt").lower()
        )
        return _literal_frame(spark, 
            [(m.group("path"), m.group("fmt").lower())],
            "path string, format string",
        )
    return None


@dataclass
class ResultCache:
    """Athena result-reuse with TTL (vendor/aws_athena.py:75-82):
    an identical query string within ``max_age_s`` returns the cached
    (memory/disk-persisted) result instead of re-executing; stale
    entries are unpersisted and re-run.

    Scale note: entries hold Spark storage, not driver memory — the
    DataFrame is persisted on executors, so a cached 1 TB result costs
    the driver only the plan object.
    """

    max_age_s: float = 300.0
    _entries: dict[str, tuple[float, DataFrame]] = field(default_factory=dict)

    def get_or_run(
        self, spark: SparkSession, sql: str, now: float | None = None
    ) -> tuple[DataFrame, bool]:
        """Returns (result, reused)."""
        now = time.monotonic() if now is None else now
        hit = self._entries.get(sql)
        if hit is not None:
            born, df = hit
            if now - born <= self.max_age_s:
                return df, True
            df.unpersist()
        df = spark.sql(sql).cache()
        self._entries[sql] = (now, df)
        return df, False

    def clear(self) -> None:
        for _, df in self._entries.values():
            df.unpersist()
        self._entries.clear()


def preview_table(spark: SparkSession, table: str, n: int = 10) -> tuple[DataFrame, int]:
    """``SELECT * LIMIT n`` + ``COUNT(*)`` (athena.py:67-87, O3/A1).
    Routed through ``run_query`` so ``table`` may be a registered
    snapshot reference (``t FOR VERSION AS OF k``) — one facade, one
    behavior."""
    head = run_query(spark, f"SELECT * FROM {table} LIMIT {n}")  # noqa: S608 - table name from caller
    count = run_query(spark, f"SELECT COUNT(*) AS n FROM {table}").collect()[0]["n"]  # noqa: S608
    return head, int(count)


def unload_query(spark: SparkSession, sql: str, path: str, fmt: str = "parquet") -> None:
    """UNLOAD (...) TO path WITH (format=...) — vendor/aws_athena.py:50-55.
    Routed through ``run_query``: snapshot references unload the same
    way they query."""
    df = run_query(spark, sql)
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)  # S11 CSV sink (athena.py:78)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported unload format {fmt!r}")
