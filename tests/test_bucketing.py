"""Plan-asserted bucketing (sources/silver.py): joining two tables
bucketed the same way on the join key must run WITHOUT any shuffle —
the 100 TB claim in SCALE.md's data-layout note, checked against the
executed plan rather than asserted in prose."""

from __future__ import annotations


import pytest


from pyspark.sql import functions as F

from multi_crm_cross_sell_spark.sources.silver import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(cust, "silver_customer", "c_custkey", n_buckets=4)
    write_bucketed(orders, "silver_orders", "o_custkey", n_buckets=4)
    yield "silver_customer", "silver_orders"
    for t in ("silver_customer", "silver_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _executed_plan(df) -> str:
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ct, ot = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            read_table(spark, ct)
            .join(
                read_table(spark, ot),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .groupBy("c_custkey")
            .agg(F.count("*").alias("n_orders"))
        )
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # co-bucketed join AND the follow-on groupBy on the same key:
    # zero exchanges anywhere in the executed plan
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join through plain path reads must shuffle —
    proving the elision above comes from the bucket metadata."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        joined = cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in plan


def test_bucketed_join_results_match_plain_join(spark, bucketed_tables):
    ct, ot = bucketed_tables
    bucketed = (
        read_table(spark, ct)
        .join(read_table(spark, ot), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


class TestPartitionPruning:
    """write_partitioned: partition-column predicates must prune at
    the directory level — PartitionFilters in the scan, and the
    pruned read touches a strict subset of the partitions."""

    def test_date_filter_prunes_partitions(self, spark, tmp_path_factory):
        from multi_crm_cross_sell_spark.sources.bronze import load_table
        from multi_crm_cross_sell_spark.sources.silver import (
            write_partitioned,
        )

        out = str(tmp_path_factory.mktemp("silver_events"))
        ev = load_table(spark, SF, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        write_partitioned(ev, out, "event_date")
        n_partitions = len(
            [r.event_date for r in spark.read.parquet(out).select("event_date").distinct().collect()]
        )
        assert n_partitions > 1

        one_day = (
            spark.read.parquet(out)
            .where(F.col("event_date") == "2024-01-02")
        )
        plan = _executed_plan(one_day.select(F.count("*")))
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "event_date" in pf[0], plan
        # the partition predicate must NOT appear as a data filter —
        # pruning happens before I/O, not per row
        rows_one_day = one_day.count()
        total = spark.read.parquet(out).count()
        assert 0 < rows_one_day < total


class TestCompaction:
    def test_compact_merges_small_files_and_preserves_rows(
        self, spark, tmp_path
    ):
        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "frag")
        base = spark.range(10_000).selectExpr(
            "id", "id % 7 AS k", "CAST(id AS DOUBLE) / 3 AS v"
        )
        # fragment: 40 tiny appends, like a micro-batch sink would
        for i in range(40):
            base.where((F.col("id") % 40) == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        import glob

        n_before = len(glob.glob(f"{src}/part-*"))
        assert n_before >= 40
        before = sorted(
            (r.id, r.k, r.v) for r in spark.read.parquet(src).collect()
        )

        n_files = compact(spark, src, target_file_rows=5_000)
        assert n_files == 2
        n_after = len(glob.glob(f"{src}/part-*"))
        assert n_after == 2
        after = sorted(
            (r.id, r.k, r.v) for r in spark.read.parquet(src).collect()
        )
        assert after == before

    def test_compact_with_range_clustering(self, spark, tmp_path):
        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "frag2")
        spark.range(9_000).selectExpr("id", "id % 5 AS k").coalesce(
            9
        ).write.parquet(src)
        compact(spark, src, target_file_rows=3_000, order_cols="id")
        import glob

        files = sorted(glob.glob(f"{src}/part-*"))
        assert len(files) == 3
        # range clustering: per-file id ranges must not overlap
        ranges = []
        for f in files:
            ids = [r.id for r in spark.read.parquet(f).collect()]
            ranges.append((min(ids), max(ids)))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2

    def test_compact_recovers_from_half_swapped_crash(self, spark, tmp_path):
        """The two-rename swap is not atomic; a leftover ._compact_old
        with the live path missing (crash between renames) must be
        rolled back, and a stale ._compact_tmp must be cleared — the
        next compact then succeeds instead of failing on the rename."""
        import os

        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "crash")
        spark.range(4_000).selectExpr("id", "id % 3 AS k").coalesce(
            4
        ).write.parquet(src)
        before = sorted(r.id for r in spark.read.parquet(src).collect())

        # Simulate: crash AFTER rename(path -> old), BEFORE
        # rename(tmp -> path); tmp holds a garbage partial write.
        os.rename(src, src + "._compact_old")
        os.makedirs(src + "._compact_tmp")
        with open(src + "._compact_tmp/junk", "w") as f:
            f.write("partial")

        n = compact(spark, src, target_file_rows=2_000)
        assert n == 2
        assert not os.path.exists(src + "._compact_old")
        assert not os.path.exists(src + "._compact_tmp")
        after = sorted(r.id for r in spark.read.parquet(src).collect())
        assert after == before

    def test_compact_drops_superseded_old_dir(self, spark, tmp_path):
        """Crash after the second rename but before cleanup: the live
        path is current, ._compact_old is superseded garbage — it must
        be removed, not restored over the live table."""
        import os
        import shutil

        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "crash2")
        spark.range(1_000).selectExpr("id").coalesce(2).write.parquet(src)
        shutil.copytree(src, src + "._compact_old")
        compact(spark, src, target_file_rows=500)
        assert not os.path.exists(src + "._compact_old")
        assert spark.read.parquet(src).count() == 1_000

    def test_compact_refuses_hive_layout_without_partition_cols(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "hive")
        spark.range(2_000).selectExpr(
            "id", "id % 4 AS k"
        ).write.partitionBy("k").parquet(src)
        with _pytest.raises(ValueError, match="hive-partitioned"):
            compact(spark, src)

    def test_compact_preserves_hive_layout_with_partition_cols(
        self, spark, tmp_path
    ):
        import glob

        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "hive2")
        base = spark.range(8_000).selectExpr("id", "id % 4 AS k")
        # fragment each partition with several appends
        for i in range(5):
            base.where((F.col("id") % 5) == i).repartition(3).write.mode(
                "append"
            ).partitionBy("k").parquet(src)
        before = sorted(
            (r.id, r.k) for r in spark.read.parquet(src).collect()
        )
        n_before = len(glob.glob(f"{src}/k=*/part-*"))
        n = compact(spark, src, partition_cols="k")
        # layout preserved, one file per partition value
        dirs = sorted(glob.glob(f"{src}/k=*"))
        assert len(dirs) == 4
        n_after = len(glob.glob(f"{src}/k=*/part-*"))
        assert n_after == 4 == n
        assert n_after < n_before
        after = sorted((r.id, r.k) for r in spark.read.parquet(src).collect())
        assert after == before

    def test_compact_reports_actual_files_when_coalesce_cannot_grow(
        self, spark, tmp_path
    ):
        """Recompacting an already-compacted table with a SMALLER
        target must still produce (and report) the requested spread —
        the repartition upgrade path."""
        import glob

        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "regrow")
        spark.range(6_000).selectExpr("id").coalesce(1).write.parquet(src)
        n = compact(spark, src, target_file_rows=2_000)
        assert n == 3
        assert len(glob.glob(f"{src}/part-*")) == 3


class TestCompactPartitionedSizing:
    """ADVICE round-7: the partitioned compact path must honor
    target_file_rows (a huge hive partition must split into multiple
    target-size files, not stay one giant file), and the
    order_cols+partition_cols combination must be rejected (each
    range task would write one file per partition value it touches —
    re-fragmentation)."""

    def test_partitioned_compact_splits_large_partitions(
        self, spark, tmp_path
    ):
        import glob

        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "bigpart")
        # skewed: k=0 has 9000 rows, k=1 has 1000
        spark.range(10_000).selectExpr(
            "id", "CASE WHEN id < 9000 THEN 0 ELSE 1 END AS k"
        ).repartition(8).write.partitionBy("k").parquet(src)
        before = sorted(r.id for r in spark.read.parquet(src).collect())

        compact(spark, src, target_file_rows=2_000, partition_cols="k")

        files_k0 = glob.glob(f"{src}/k=0/*.parquet")
        files_k1 = glob.glob(f"{src}/k=1/*.parquet")
        # k=0 needs ceil(9000/2000)=5 buckets (hash collisions can
        # merge a pair, never fragment); k=1 fits in one file.
        assert 2 <= len(files_k0) <= 5, files_k0
        assert len(files_k1) == 1, files_k1
        after = sorted(r.id for r in spark.read.parquet(src).collect())
        assert after == before

    def test_order_plus_partition_cols_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from multi_crm_cross_sell_spark.sources.silver import compact

        src = str(tmp_path / "combo")
        spark.range(2_000).selectExpr("id", "id % 2 AS k").write.partitionBy(
            "k"
        ).parquet(src)
        with _pytest.raises(ValueError, match="order_cols cannot be combined"):
            compact(spark, src, order_cols="id", partition_cols="k")
