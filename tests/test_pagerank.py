"""Fixed-point PageRank (operators/pagerank.py)."""

from __future__ import annotations

import pytest
from rds_to_datalake_project_spark.operators.pagerank import pagerank

SCALE = 10**12


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["r"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_stationary(spark):
    # N=2: r0 = scale/2; each iteration r = 15e12//200 + (85*r0)//100 = r0
    r = _ranks(spark, [(1, 2), (2, 1)], iters=3)
    assert r == {1: SCALE // 2, 2: SCALE // 2}


def test_star_graph_symmetry_and_hub_dominance(spark):
    # hub 0 <-> leaves 1..4, symmetrized
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    r = _ranks(spark, edges, iters=4)
    leaves = {r[i] for i in range(1, 5)}
    assert len(leaves) == 1  # exact symmetry, bit-identical leaves
    # hub stationary mass ≈ 0.327 vs leaf ≈ 0.168 (ratio ~1.95)
    assert r[0] > (r[1] * 18) // 10  # hub dominates


def test_dangling_node_leaks_mass(spark):
    # 1 -> 2, 2 has no out-edges: total mass decays but stays positive
    r = _ranks(spark, [(1, 2)], iters=2)
    assert set(r) == {1, 2}
    assert 0 < sum(r.values()) < SCALE
    assert r[2] > r[1]  # 2 receives, 1 only teleports


def test_mass_conserved_up_to_truncation(spark):
    # strongly connected triangle: mass loss only from integer floors
    edges = [(1, 2), (2, 3), (3, 1)]
    r = _ranks(spark, edges, iters=5)
    total = sum(r.values())
    assert SCALE - 100 <= total <= SCALE
    # cycle symmetry: all three equal
    assert len(set(r.values())) == 1


@pytest.mark.slow
def test_checkpoint_every_same_answer(spark):
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    a = _ranks(spark, edges, iters=4)
    b = _ranks(spark, edges, iters=4, checkpoint_every=2)
    assert a == b
