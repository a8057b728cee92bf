"""Scale-operator tests: compaction (small-files), salted skew-join,
and the manifest-driven export source (S5)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from rds_to_datalake_project_spark.operators.compact import (
    compact_table,
    data_file_count,
    plan_target_files,
)
from rds_to_datalake_project_spark.operators.skew import salted_join
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec
from rds_to_datalake_project_spark.sources.dynamodb_json import (
    decode_dynamodb_items,
    read_manifest_export,
)


def test_plan_target_files():
    assert plan_target_files(0, 128) == 1
    assert plan_target_files(128, 128) == 1
    assert plan_target_files(129, 128) == 2


@pytest.mark.slow
def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    spec = TableSpec("t", record_key=("id",), precombine_key="v",
                     partition_source="create_at", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "t"), spec)
    # initial load + many tiny upserts → small-files buildup
    def mk(ids, day, v):
        return spark.createDataFrame(
            [(f"k{i}", f"2024-01-{day:02d}T00:00:00", f"2024-01-{day:02d}T00:00:0{v}", v)
             for i in ids],
            ["id", "create_at", "update_at", "v"],
        )
    t.initial_load(mk(range(20), 1, 0))
    for v in range(1, 4):
        t.upsert(mk(range(20), 1, v))
    before_rows = sorted(map(tuple, t.read().collect()))
    before_files = data_file_count(t.path)

    n = compact_table(t, target_file_bytes=64 * 1024 * 1024)
    after_rows = sorted(map(tuple, t.read().collect()))
    after_files = data_file_count(t.path)

    assert after_rows == before_rows          # lossless rewrite
    assert after_files <= before_files
    assert after_files <= n * 1 + 1           # bounded by plan (1 partition here)
    # idempotent: second compaction keeps rows identical
    compact_table(t, target_file_bytes=64 * 1024 * 1024)
    assert sorted(map(tuple, t.read().collect())) == before_rows


@pytest.mark.parametrize("curve", ["hilbert", "zorder"])
def test_compact_with_curve_clustering(spark, tmp_path, curve):
    """Curve-clustered compaction must be a lossless rewrite that
    actually narrows per-file min/max ranges on BOTH clustered
    columns versus unclustered row order (the skipping benefit the
    pass exists for)."""
    import duckdb

    spec = TableSpec("t", record_key=("id",), precombine_key="v",
                     partition_granularity=None)
    t = KeyedTable(spark, str(tmp_path / "t"), spec)
    rows = [(f"k{i}", "2024-01-01T00:00:00", (i * 37) % 1000, (i * 91) % 1000)
            for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "v", "a", "b"]).repartition(8)
    t.initial_load(df)

    compact_table(t, target_file_bytes=4 * 1024, cluster_by=("a", "b"), curve=curve)
    assert t.read().count() == 1000  # lossless
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(t.path)
        for f in fs if f.endswith(".parquet")
    ]
    assert len(files) > 1, "need multiple files to measure clustering"
    con = duckdb.connect()
    spans = []
    for f in files:
        lo_a, hi_a, lo_b, hi_b = con.execute(
            f"SELECT min(a), max(a), min(b), max(b) FROM read_parquet('{f}')"
        ).fetchone()
        spans.append((hi_a - lo_a) + (hi_b - lo_b))
    # clustered files must cover far less than the full 2×1000 span
    assert sum(spans) / len(spans) < 1400, spans


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    # skewed big side: one hot key with 500 rows
    big = spark.createDataFrame(
        [(1, f"r{i}") for i in range(500)] + [(2, "x"), (3, "y"), (99, "no-match")],
        ["k", "payload"],
    )
    small = spark.createDataFrame([(1, "dim1"), (2, "dim2"), (3, "dim3")], ["sk", "dim"])
    expected = big.join(small, big["k"] == small["sk"], how)
    got = salted_join(big, small, on=[("k", "sk")], salt_factor=4, how=how)
    assert sorted(map(tuple, got.select("k", "payload", "sk", "dim").collect())) == \
           sorted(map(tuple, expected.select("k", "payload", "sk", "dim").collect()))


def _skewed_frames(spark):
    # one melting key (1: 4000 rows), a warm key (2: 40), cold tail
    big = spark.createDataFrame(
        [(1, f"r{i}") for i in range(4000)]
        + [(2, f"w{i}") for i in range(40)]
        + [(k, "cold") for k in range(3, 30)]
        + [(99, "no-match")],
        ["k", "payload"],
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 30)], ["sk", "dim"]
    )
    return big, small


def test_derive_salt_factor_measures_skew(spark):
    from rds_to_datalake_project_spark.operators.skew import derive_salt_factor

    big, _ = _skewed_frames(spark)
    # whole-frame measurement (fraction=1): key 1 mass 4000 over a
    # 500-row budget → factor ceil(4000/500)=8; only key 1 is hot
    factor, hot = derive_salt_factor(
        big, ["k"], sample_fraction=1.0, rows_per_salt=500, max_factor=64
    )
    assert factor == 8 and hot == [(1,)]
    # budget above the hottest mass → no salting at all
    assert derive_salt_factor(
        big, ["k"], sample_fraction=1.0, rows_per_salt=10_000
    ) == (1, [])
    # degenerate distribution still clamps to max_factor
    factor, _hot = derive_salt_factor(
        big, ["k"], sample_fraction=1.0, rows_per_salt=10, max_factor=16
    )
    assert factor == 16


@pytest.mark.parametrize("how", ["inner", "left"])
def test_auto_salted_join_matches_plain_join(spark, how):
    big, small = _skewed_frames(spark)
    expected = big.join(small, big["k"] == small["sk"], how)
    got = salted_join(
        big, small, on=[("k", "sk")], how=how,
        auto_salt=True, sample_fraction=1.0, rows_per_salt=500,
    )
    assert sorted(map(tuple, got.select("k", "payload", "sk", "dim").collect())) == \
           sorted(map(tuple, expected.select("k", "payload", "sk", "dim").collect()))


def test_auto_salt_replicates_hot_keys_only(spark):
    """Cold-key replication stays 1: the replicated small side grows
    by (factor-1) rows PER HOT KEY, not per key."""
    from rds_to_datalake_project_spark.operators.skew import (
        _salted_sides,
        derive_salt_factor,
    )

    big, small = _skewed_frames(spark)
    factor, hot = derive_salt_factor(
        big, ["k"], sample_fraction=1.0, rows_per_salt=500
    )
    assert factor == 8 and hot == [(1,)]
    big_salted, small_rep = _salted_sides(
        big, small, [("k", "sk")], factor, hot
    )
    n_small = small.count()
    assert small_rep.count() == n_small + (factor - 1) * len(hot)
    # hot big rows spread over several salts; cold big rows keep salt 0
    from pyspark.sql import functions as F
    salts_hot = {r["__salt"] for r in big_salted.filter(F.col("k") == 1).collect()}
    salts_cold = {r["__salt"] for r in big_salted.filter(F.col("k") != 1).collect()}
    assert len(salts_hot) > 1 and salts_cold == {0}


def test_auto_salt_no_skew_runs_plain_join(spark):
    big = spark.createDataFrame([(k, "p") for k in range(100)], ["k", "payload"])
    small = spark.createDataFrame([(k, f"d{k}") for k in range(100)], ["sk", "dim"])
    got = salted_join(
        big, small, on=[("k", "sk")],
        auto_salt=True, sample_fraction=1.0, rows_per_salt=1000,
    )
    assert got.count() == 100
    # no salt machinery in the plan at all
    assert "__salt" not in got.columns
    assert "explode" not in got._jdf.queryExecution().executedPlan().toString().lower()


def test_read_manifest_export_and_decode(spark, tmp_path):
    # synthesize a DynamoDB export: 2 gzipped JSON-lines data files + manifest
    import gzip

    data_dir = tmp_path / "export"
    os.makedirs(data_dir)
    items = [
        {"Item": {"account": {"S": f"a{i}"}, "amount": {"N": str(100 + i)}}}
        for i in range(10)
    ]
    keys = []
    for part in range(2):
        key = f"data-{part}.json.gz"
        with gzip.open(data_dir / key, "wt") as f:
            for it in items[part * 5 : (part + 1) * 5]:
                f.write(json.dumps(it) + "\n")
        keys.append(key)
    manifest = tmp_path / "manifest-files.json"
    with open(manifest, "w") as f:
        for k in keys:
            f.write(json.dumps({"dataFileS3Key": k, "itemCount": 5}) + "\n")

    raw = read_manifest_export(spark, str(manifest), base_dir=str(data_dir) + "/")
    decoded = decode_dynamodb_items(
        raw, fields={"account": ("S", None), "amount": ("N", "int")}
    )
    rows = {r.account: r.amount for r in decoded.collect()}
    assert rows == {f"a{i}": 100 + i for i in range(10)}


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S6 JDBC source/sink against Spark's bundled embedded Derby:
    write a table, read it back whole and as a partitioned range scan."""
    from rds_to_datalake_project_spark.sources.jdbc import (
        read_jdbc_table,
        write_jdbc_table,
    )

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.createDataFrame(
        [(i, f"email{i}@x.io", f"2024-01-{(i % 28) + 1:02d}") for i in range(100)],
        ["id", "email", "create_at"],
    )
    write_jdbc_table(df, url, "accounts", mode="overwrite", driver=driver)

    back = read_jdbc_table(spark, url=url, table="accounts", driver=driver)
    assert back.count() == 100
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    ranged = read_jdbc_table(
        spark, url=url, table="accounts", driver=driver,
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert ranged.rdd.getNumPartitions() == 4
    assert ranged.count() == 100


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables bucketed on the join key join without an Exchange."""
    from rds_to_datalake_project_spark.catalog import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        left = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        write_bucketed(left, "bkt_left", "k", n_buckets=8, sort_col="k")
        write_bucketed(right, "bkt_right", "k", n_buckets=8, sort_col="k")

        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert j.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_asof_join_semantics(spark):
    """Inclusive bound, latest-version pick, null for no prior
    version, inner mode drops unmatched."""
    from datetime import datetime as d

    from rds_to_datalake_project_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k1", d(2024, 1, 10)),   # between v1 and v2 → v1
         (2, "k1", d(2024, 1, 15)),   # exactly at v2 → v2 (inclusive)
         (3, "k1", d(2024, 1, 20)),   # after v2 → v2
         (4, "k1", d(2024, 1, 1)),    # before any version → null
         (5, "k2", d(2024, 1, 10))],  # key with no versions → null
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("k1", d(2024, 1, 5), "v1"), ("k1", d(2024, 1, 15), "v2")],
        ["k", "vts", "payload"],
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="vts",
                    payload_cols=["payload"])
    got = {r.event_id: r.payload for r in out.collect()}
    assert got == {1: "v1", 2: "v2", 3: "v2", 4: None, 5: None}

    inner = asof_join(left, right, on="k", left_ts="ts", right_ts="vts",
                      payload_cols=["payload"], how="inner")
    assert sorted(r.event_id for r in inner.collect()) == [1, 2, 3]


def test_asof_join_single_shuffle(spark):
    """The as-of join must compile to ONE hash shuffle (union-window
    form), never a range/cross join."""
    import re

    from datetime import datetime as d

    from rds_to_datalake_project_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", d(2024, 1, 1))], ["e", "k", "ts"])
    right = spark.createDataFrame([("k", d(2024, 1, 1), "v")], ["k", "vts", "p"])
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="vts",
                    payload_cols=["p"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_binned_no_nested_loop(spark):
    """Binned range join: correct point-in-interval matches (end
    exclusive, bin-boundary crossing) via a hash equi-join — never a
    nested-loop plan."""
    from datetime import datetime as d

    from rds_to_datalake_project_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(1, d(2024, 1, 1, 12)),   # inside w1
         (2, d(2024, 1, 4, 0)),    # == w1 end → excluded
         (3, d(2024, 1, 5, 23)),   # inside w2 (w2 crosses a day bin)
         (4, d(2024, 2, 1, 0))],   # no window
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [(10, d(2024, 1, 1), d(2024, 1, 4)),
         (20, d(2024, 1, 5, 12), d(2024, 1, 6, 12))],
        ["w_id", "w_start", "w_end"],
    )
    out = range_join(points, intervals, "ts", "w_start", "w_end")
    got = {(r.pid, r.w_id) for r in out.collect()}
    assert got == {(1, 10), (3, 20)}

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_rollup_incremental_touches_only_new_buckets(spark, tmp_path):
    """Incremental refresh recomputes touched buckets from the full
    raw slice (late rows included) and leaves other buckets alone."""
    from datetime import datetime as d

    from rds_to_datalake_project_spark.operators.rollup import RollupTable

    cols = ["ts", "event_type", "value"]
    old = spark.createDataFrame(
        [(d(2024, 1, 1, 10, 5), "a", 1.0),
         (d(2024, 1, 1, 10, 40), "a", 2.0),
         (d(2024, 1, 1, 11, 5), "b", 3.0)], cols)
    # new batch: one event in a NEW bucket, one LATE event in 10:00
    new = spark.createDataFrame(
        [(d(2024, 1, 1, 12, 0), "a", 10.0),
         (d(2024, 1, 1, 10, 59), "a", 4.0)], cols)

    roll = RollupTable(spark, str(tmp_path / "r"), ts_col="ts", window="1 hour",
                       dims=("event_type",),
                       aggs={"n": F.count("*"), "s": F.sum("value")})
    roll.full_refresh(old)
    roll.incremental_refresh(old.unionByName(new), new)

    rows = {(r.bucket_start.strftime("%H"), r.event_type): (r.n, r.s)
            for r in roll.read().collect()}
    assert rows == {("10", "a"): (3, 7.0),   # late row folded in
                    ("11", "b"): (1, 3.0),   # untouched
                    ("12", "a"): (1, 10.0)}  # new bucket
    # untouched bucket kept its original refresh sequence
    seqs = {r.bucket_start.strftime("%H"): r["__refresh_seq"]
            for r in roll.table.read().collect()}
    assert seqs["11"] == 0 and seqs["10"] == 1 and seqs["12"] == 1


def _frag_table(spark, tmp_path, name="cp"):
    """Two partitions: day 01 fragmented (8 files), day 02 compact."""
    spec = TableSpec(name, record_key=("id",), precombine_key="v",
                     partition_source="create_at", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / name), spec)

    def mk(ids, day):
        return spark.createDataFrame(
            [(f"k{i}", f"2024-01-{day:02d}T00:00:00",
              f"2024-01-{day:02d}T00:00:00", 0) for i in ids],
            ["id", "create_at", "update_at", "v"],
        )

    t.initial_load(mk(range(40), 1).unionByName(mk(range(40, 50), 2)))
    # KeyedTable merges REWRITE partitions, so fragmentation comes
    # from outside the merge path: high-frequency partitioned sinks
    # appending straight into the layout (S10-style micro-batches).
    # Reproduce that with six 5-row appends into day 01.
    from rds_to_datalake_project_spark.operators.enrich import add_time_partitions

    for i in range(6):
        extra = add_time_partitions(
            mk(range(100 + i * 5, 105 + i * 5), 1), "create_at", "day"
        )
        extra.coalesce(1).write.partitionBy(*t.partition_cols).mode(
            "append"
        ).parquet(t.path)
    return t


@pytest.mark.slow
def test_compact_partitions_rewrites_only_fragmented(spark, tmp_path):
    from rds_to_datalake_project_spark.operators.compact import (
        _leaf_partition_stats,
        compact_partitions,
    )

    t = _frag_table(spark, tmp_path)
    before_rows = sorted(map(tuple, t.read().collect()))
    stats = {rel: n for rel, n, _ in _leaf_partition_stats(t)}
    frag = [rel for rel, n in stats.items() if n > 2]
    assert frag, "fixture must fragment at least one partition"

    done = compact_partitions(t, target_file_bytes=64 * 1024 * 1024, min_files=2)
    assert done == sorted(frag)
    after = {rel: n for rel, n, _ in _leaf_partition_stats(t)}
    for rel in frag:
        assert after[rel] == 1  # right-sized for tiny bytes
    for rel in set(stats) - set(frag):
        assert after[rel] == stats[rel]  # untouched
    assert sorted(map(tuple, t.read().collect())) == before_rows
    # converged: nothing left to compact
    assert compact_partitions(t, target_file_bytes=64 * 1024 * 1024) == []


def test_partition_map_key_preserves_null_positions(spark):
    """The per-partition file-count map key must distinguish a=1/b=NULL
    from a=NULL/b=1 (r5 advice: a null-skipping concat_ws collapsed
    them — duplicate create_map keys abort under
    mapKeyDedupPolicy=EXCEPTION) and must stay bit-identical between
    the path-derived and the column-derived encodings."""
    from rds_to_datalake_project_spark.operators.compact import (
        _partition_map_key,
        _runtime_partition_key,
    )

    unescape = (
        spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName
    )
    HN = "__HIVE_DEFAULT_PARTITION__"
    k_a1 = _partition_map_key(["1", HN], unescape)
    k_b1 = _partition_map_key([HN, "1"], unescape)
    assert k_a1 != k_b1  # null position survives the encoding
    # escaped special chars round-trip ('/' inside a VALUE can no
    # longer alias two tuples either — the separator is a control char)
    assert _partition_map_key(["x%2Fy", HN], unescape) != _partition_map_key(
        ["x", "y"], unescape
    )

    df = spark.createDataFrame(
        [("1", None), (None, "1"), ("x/y", None)], "a string, b string"
    )
    got = [
        r.k for r in df.select(_runtime_partition_key(["a", "b"]).alias("k")).collect()
    ]
    assert got == [
        k_a1,
        k_b1,
        _partition_map_key(["x%2Fy", HN], unescape),
    ]


@pytest.mark.slow
def test_compact_partitions_crash_mid_publish_recovers(spark, tmp_path, monkeypatch):
    from tests.test_crash_recovery import Boom, _inject

    from rds_to_datalake_project_spark.operators.compact import compact_partitions

    t = _frag_table(spark, tmp_path, name="cpc")
    before_rows = sorted(map(tuple, t.read().collect()))
    _inject(monkeypatch, "partition_published", 1)
    with pytest.raises(Boom):
        compact_partitions(t, target_file_bytes=64 * 1024 * 1024)
    # interrupted mid-swap: the flagged staging survives; recover()
    # (or the next upsert) completes the compaction commit
    assert t.recover() is True
    assert sorted(map(tuple, t.read().collect())) == before_rows
    assert compact_partitions(t, target_file_bytes=64 * 1024 * 1024) == []


@pytest.mark.slow
def test_compact_partitions_unpartitioned_whole_set(spark, tmp_path):
    from rds_to_datalake_project_spark.operators.compact import compact_partitions

    spec = TableSpec("u", record_key=("id",), precombine_key="v",
                     partition_granularity=None)
    t = KeyedTable(spark, str(tmp_path / "u"), spec)
    df = spark.createDataFrame(
        [(f"k{i}", "2024-01-01T00:00:00", "2024-01-01T00:00:00", 0)
         for i in range(50)],
        ["id", "create_at", "update_at", "v"],
    )
    t.initial_load(df)
    for i in range(8):
        df.filter(F.col("id") == f"k{i}").withColumn(
            "id", F.concat(F.lit("x"), F.col("id"))
        ).coalesce(1).write.mode("append").parquet(t.path)
    before_rows = sorted(map(tuple, t.read().collect()))
    assert data_file_count(t.path) >= 9
    assert compact_partitions(t, target_file_bytes=64 * 1024 * 1024) == [""]
    assert data_file_count(t.path) == 1
    assert sorted(map(tuple, t.read().collect())) == before_rows


@pytest.mark.slow
def test_compact_partitions_is_an_empty_commit_under_retention(spark, tmp_path):
    """With retention on, a compaction is a numbered commit whose
    row-level diff is empty, and pre-compaction snapshots still
    reconstruct from the retired fragmented files."""
    from rds_to_datalake_project_spark.operators.compact import compact_partitions
    from rds_to_datalake_project_spark.operators.enrich import add_time_partitions

    spec = TableSpec("rc", record_key=("id",), precombine_key="v",
                     partition_source="create_at", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "rc"), spec, retain_versions=5)

    def mk(ids, day):
        return spark.createDataFrame(
            [(f"k{i}", f"2024-01-{day:02d}T00:00:00",
              f"2024-01-{day:02d}T00:00:00", 0) for i in ids],
            ["id", "create_at", "update_at", "v"],
        )

    t.initial_load(mk(range(20), 1))
    t.upsert(mk(range(20, 30), 2))  # commit 1
    for i in range(4):
        extra = add_time_partitions(mk([200 + i], 1), "create_at", "day")
        extra.coalesce(1).write.partitionBy(*t.partition_cols).mode(
            "append"
        ).parquet(t.path)
    pre_rows = sorted(map(tuple, t.read().collect()))

    assert compact_partitions(t, target_file_bytes=64 * 1024 * 1024) != []
    assert t.versions()[-1] == 2  # the compaction committed as v2
    assert sorted(map(tuple, t.read().collect())) == pre_rows
    assert t.table_changes(1, 2).count() == 0  # content-identical commit
    # Out-of-band appends bypass the commit protocol, so they belong
    # to the snapshot PRECEDING the commit that first retired their
    # partition: read_as_of(1) equals the full pre-compaction state.
    assert sorted(map(tuple, t.read_as_of(1).collect())) == pre_rows


_COMPACT_POINTS = [
    ("parked_aside", 1), ("renamed_in", 1), ("partition_published", 1),
    ("all_swapped", 1), ("staging_deleted", 1),
]


@pytest.mark.parametrize("point,nth", _COMPACT_POINTS)
@pytest.mark.slow
def test_compact_partitions_crash_at_every_publish_point(
    spark, tmp_path, monkeypatch, point, nth
):
    """Compaction rides the same publish protocol as upserts: a crash
    at ANY fault point leaves a recoverable state, recover() finishes
    the commit, and the row set is byte-identical."""
    from tests.test_crash_recovery import Boom, _inject

    from rds_to_datalake_project_spark.operators.compact import compact_partitions

    t = _frag_table(spark, tmp_path, name=f"cc_{point}_{nth}")
    before_rows = sorted(map(tuple, t.read().collect()))
    state = _inject(monkeypatch, point, nth)
    with pytest.raises(Boom):
        compact_partitions(t, target_file_bytes=64 * 1024 * 1024)
    assert state["fired"]
    t.recover()
    assert sorted(map(tuple, t.read().collect())) == before_rows
    assert compact_partitions(t, target_file_bytes=64 * 1024 * 1024) == []


def test_migrate_partition_granularity(spark, tmp_path):
    """minute-layout table → day layout: same rows, coarser dirs."""
    from rds_to_datalake_project_spark.operators.compact import (
        migrate_partition_granularity,
    )

    spec = TableSpec("mg", record_key=("id",), precombine_key="v",
                     partition_source="create_at", partition_granularity="minute")
    t = KeyedTable(spark, str(tmp_path / "mg"), spec)
    rows = [(f"k{i}", f"2024-01-01T00:{i % 30:02d}:00", "2024-01-01T01:00:00", 0)
            for i in range(60)]
    t.initial_load(spark.createDataFrame(rows, ["id", "create_at", "update_at", "v"]))
    minute_dirs = sum(1 for _r, d, _f in os.walk(t.path) for x in d if x.startswith("create_minute="))
    assert minute_dirs == 30

    out = migrate_partition_granularity(t, "day", str(tmp_path / "mg_day"))
    assert out.partition_cols == ["create_year", "create_month", "create_day"]
    assert sorted(r.id for r in out.read().collect()) == sorted(r.id for r in t.read().collect())
    day_dirs = sum(1 for _r, d, _f in os.walk(out.path) for x in d if x.startswith("create_day="))
    assert day_dirs == 1
    # upserts keep working against the migrated layout
    out.upsert(spark.createDataFrame(
        [("k0", "2024-01-01T00:00:00", "2024-02-01T00:00:00", 9)],
        ["id", "create_at", "update_at", "v"],
    ))
    assert {r.v for r in out.read().filter("id = 'k0'").collect()} == {9}


def test_jsonlines_quarantine_dead_letters(spark, tmp_path):
    """Torn CDC lines land in the quarantine sink with their source
    file; clean rows flow through untouched."""
    import pyspark.sql.types as T

    from rds_to_datalake_project_spark.sources.jsonlines import read_jsonlines

    src = tmp_path / "cdc"
    os.makedirs(src)
    with open(src / "batch1.json", "w") as f:
        f.write('{"id": "a", "amount": 1}\n')
        f.write('{"id": "b", "amount": 2}\n')
        f.write('{"id": "c", "amount": ???TORN\n')
    with open(src / "batch2.json", "w") as f:
        f.write('{"id": "d", "amount": 4}\n')
        f.write("not json at all\n")

    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("amount", T.LongType())]
    )
    q = str(tmp_path / "quarantine")
    clean = read_jsonlines(spark, str(src), schema=schema, quarantine_dir=q)
    assert {(r.id, r.amount) for r in clean.collect()} == {
        ("a", 1), ("b", 2), ("d", 4)
    }
    dead = spark.read.option("recursiveFileLookup", "true").parquet(q).collect()
    assert len(dead) == 2
    assert {r.raw_line for r in dead} == {
        '{"id": "c", "amount": ???TORN', "not json at all"
    }
    assert all(r.source_file.endswith((".json",)) for r in dead)

    # releasing the cached batch via the attached handle works
    clean.quarantine_release()

    # a tracker RETRY of the same batch must not duplicate dead letters
    read_jsonlines(spark, str(src), schema=schema, quarantine_dir=q).count()
    dead2 = spark.read.option("recursiveFileLookup", "true").parquet(q).collect()
    assert len(dead2) == 2

    with pytest.raises(ValueError, match="explicit schema"):
        read_jsonlines(spark, str(src), quarantine_dir=q)


def test_compact_table_preserves_history_on_retained_tables(spark, tmp_path):
    """compact_table now commits through the staged publish: the
    commit log and every snapshot survive a full-table rewrite (the
    in-place overwrite used to wipe .meta/.retired)."""
    spec = TableSpec("rt", record_key=("id",), precombine_key="v",
                     partition_source="create_at", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "rt"), spec, retain_versions=5)

    def mk(ids, v):
        return spark.createDataFrame(
            [(f"k{i}", "2024-01-01T00:00:00", f"2024-01-01T00:00:{v:02d}", v)
             for i in ids],
            ["id", "create_at", "update_at", "v"],
        )

    t.initial_load(mk(range(20), 0))
    t.upsert(mk(range(10), 1))  # commit 1
    s1 = sorted(map(tuple, t.read().collect()))

    compact_table(t, target_file_bytes=64 * 1024 * 1024, range_by_key=True)
    assert t.versions() == [1, 2]  # the rewrite is commit 2
    assert sorted(map(tuple, t.read().collect())) == s1
    assert t.table_changes(1, 2).count() == 0
    # snapshot BEFORE the compaction (and before commit 1) still exact
    assert {r.v for r in t.read_as_of(0).collect()} == {0}
    assert sorted(map(tuple, t.read_as_of(1).collect())) == s1


def test_range_join_left_keeps_unmatched_points(spark):
    """how='left' must keep points with NO containing interval (the
    range predicate rides the join condition, not a post-filter)."""
    from datetime import datetime as d

    from rds_to_datalake_project_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(1, d(2024, 1, 1, 10)), (2, d(2024, 1, 5, 10))], ["pid", "ts"]
    )
    intervals = spark.createDataFrame(
        [(100, d(2024, 1, 1), d(2024, 1, 2))], ["iid", "w_start", "w_end"]
    )
    out = range_join(points, intervals, "ts", "w_start", "w_end", how="left")
    rows = {r.pid: r.iid for r in out.collect()}
    assert rows == {1: 100, 2: None}  # point 2 kept with nulls
    with pytest.raises(ValueError, match="inner/left"):
        range_join(points, intervals, "ts", "w_start", "w_end", how="full")


def test_compact_with_3d_zorder_clustering(spark, tmp_path):
    """N-dim ZORDER: a 3-column clustered rewrite shrinks per-file
    min/max spans on ALL THREE columns, through the facade verb."""
    import duckdb

    from rds_to_datalake_project_spark.operators.upsert import KeyedTable
    from rds_to_datalake_project_spark.schema import TableSpec
    from rds_to_datalake_project_spark.sql import run_query

    spec = TableSpec("z3", record_key=("id",), precombine_key="u",
                     partition_granularity=None)
    t = KeyedTable(spark, str(tmp_path / "z3"), spec)
    rows = [
        (i, "2024-01-01", "2024-01-01", i % 1000, (i * 37) % 1000, (i * 911) % 1000)
        for i in range(20000)
    ]
    t.initial_load(spark.createDataFrame(
        rows, ["id", "create_at", "u", "a", "b", "c"]
    ))
    # facade verb parses any arity and routes through the rewrite
    out = run_query(
        spark, "OPTIMIZE z3 ZORDER BY (a, b, c)", tables={"z3": t}
    ).collect()[0]
    assert out.target_files >= 1
    # re-run directly with a tiny file target to force multiple files
    compact_table(
        t, target_file_bytes=8 * 1024, cluster_by=("a", "b", "c"),
        curve="zorder",
    )
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(t.path)
        for f in fs
        if f.endswith(".parquet") and "/." not in r
    ]
    assert len(files) > 1, "need multiple files to measure clustering"
    con = duckdb.connect()
    spans = []
    for f in files:
        vals = con.execute(
            f"SELECT min(a), max(a), min(b), max(b), min(c), max(c) "
            f"FROM read_parquet('{f}')"
        ).fetchone()
        spans.append((vals[1] - vals[0]) + (vals[3] - vals[2]) + (vals[5] - vals[4]))
    # clustered files must cover far less than the full 3×1000 span
    assert sum(spans) / len(spans) < 2200, spans
