from __future__ import annotations

from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.fuzzyjoin import (
    deletion_variants,
    fuzzy_join,
    fuzzy_self_join,
)

NAMES = [
    (1, "chocolate lace"),
    (2, "chocolate lacy"),  # 1 sub of #1
    (3, "chocolate laces"),  # 1 ins of #1, 2 of #2
    (4, "vanilla bean"),
    (5, "vanila bean"),  # 1 del of #4
    (6, "completely different"),
    (7, "chocolate lace"),  # exact dup of #1
]


def _brute(k: int) -> set[tuple[int, int]]:
    import difflib  # noqa: F401  (documentation only; exact DP below)

    def ed(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    out = set()
    for i, (ia, sa) in enumerate(NAMES):
        for ib, sb in NAMES[i + 1 :]:
            if ed(sa, sb) <= k:
                out.add((ia, ib))
    return out


def test_deletion_variants_counts(spark):
    df = spark.createDataFrame([("abcd",)], ["s"])
    v1 = df.select(F.size(deletion_variants("s", 1)).alias("n")).first()["n"]
    # "abcd" + 4 single deletions, all distinct
    assert v1 == 5
    v2 = df.select(F.size(deletion_variants("s", 2)).alias("n")).first()["n"]
    # + C(4,2)=6 double deletions, all distinct
    assert v2 == 11


def test_fuzzy_self_join_matches_bruteforce(spark):
    df = spark.createDataFrame(NAMES, ["id", "name"])
    for k in (1, 2):
        got = {
            (r["a_id"], r["b_id"])
            for r in fuzzy_self_join(df, "id", "name", max_dist=k).collect()
        }
        assert got == _brute(k), f"k={k}"


def test_fuzzy_self_join_md5_mode_same_answer(spark):
    df = spark.createDataFrame(NAMES, ["id", "name"])
    a = {
        (r["a_id"], r["b_id"])
        for r in fuzzy_self_join(df, "id", "name", 1, "md5").collect()
    }
    assert a == _brute(1)


def test_fuzzy_two_table_join(spark):
    left = spark.createDataFrame(
        [(10, "spring green"), (11, "azure mist")], ["lid", "lname"]
    )
    right = spark.createDataFrame(
        [(20, "spring greon"), (21, "nothing alike"), (22, "azure mist")],
        ["rid", "rname"],
    )
    got = {
        (r["lid"], r["rid"], r["dist"])
        for r in fuzzy_join(
            left, right, "lid", "lname", "rid", "rname", max_dist=1
        ).collect()
    }
    assert got == {(10, 20, 1), (11, 22, 0)}


def test_fuzzy_join_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(NAMES, ["id", "name"])
    plan = fuzzy_self_join(df, "id", "name", 2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_short_strings_excluded_not_crashing(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "ab"), (4, "ba")], ["id", "s"]
    )
    rows = fuzzy_self_join(df, "id", "s", max_dist=1).collect()
    got = {(r["a_id"], r["b_id"]) for r in rows}
    # length-1 strings are documented as excluded; "ab"/"ba" is ed=2
    assert got == set()


def test_resolve_entities_transitive_chain(spark):
    from rds_to_datalake_project_spark.operators.fuzzyjoin import resolve_entities

    # chain: aaaa ~ aaab ~ aabb (ed(aaaa, aabb) = 2 > max_dist) + singleton
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab"), (3, "aabb"), (9, "zzzz")], ["id", "s"]
    )
    out = {r["id"]: r["entity_id"] for r in resolve_entities(df, "id", "s", 1).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 9: 9}
