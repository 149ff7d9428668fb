"""Silver-layer bucketed tables: pre-shuffled storage for repeated
join keys.

SCALE.md's data-layout note made a claim this module makes real: at
100 TB the repeated equi-join keys (custkey, org_id) should be
BUCKETED on disk so the per-key joins and aggregations read
co-located data and skip their shuffle entirely — Spark's
``bucketBy`` writes each table pre-hash-partitioned by the key, and
the planner drops the Exchange on both sides of a join between
tables bucketed the same way (asserted in
``tests/test_bucketing.py``). The reference re-extracts and re-joins
its CRM entities per run (``src/orchestrator.py:183-201``,
``src/ml/pipeline.py``); a bucketed silver layer is the Spark-native
answer: pay the shuffle once at ingest, never at query time.

Bucketed tables must be saved through the session catalog
(``saveAsTable`` — plain ``parquet(path)`` cannot record bucket
metadata); ``spark.sql.warehouse.dir`` controls the storage root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 8,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and optionally
    sorted) by the join key.

    ``n_buckets`` must MATCH across tables that will join — the
    planner only elides the shuffle when both sides hash into the
    same bucket count. Sorting within buckets additionally lets a
    sort-merge join skip its per-partition sort."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(s[0], *s[1:])
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata (and thus the shuffle elision)
    only applies through the catalog, not path-based reads."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet (hive layout): one directory per
    partition value, so equality/range predicates on the partition
    columns prune whole directories BEFORE any file I/O — the
    data-layout lever behind the incremental-sync and date-window
    queries at 100 TB (`incremental_watermark_sync`,
    `daily_order_stats`). Plan-asserted in ``tests/test_bucketing.py``
    (PartitionFilters reach the scan; non-matching partitions are
    never read). Partition columns should be LOW-cardinality (date,
    org) — per-key directories for high-cardinality keys create the
    small-files problem bucketing exists to avoid."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_file_rows: int = 1_000_000,
    order_cols: list[str] | str | None = None,
    partition_cols: list[str] | str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files
    of ~``target_file_rows`` rows each, returning the number of data
    files actually written. The routine maintenance task every
    streaming / incremental sink needs at scale — micro-batch appends
    and per-key partition writes accumulate thousands of KB-sized
    files whose open/footer cost eventually dominates scans.

    Shape: one COUNT to size the job (metadata-only on parquet), then
    either a ``coalesce`` (narrow — no shuffle, the cheap path when
    only merging; upgraded to ``repartition`` when the source reads
    as FEWER partitions than the target, since coalesce can only
    reduce) or, when ``order_cols`` is given, a ``repartitionByRange``
    so the rewrite also range-clusters the data (pay one shuffle, buy
    min/max footer pruning on those columns forever after).

    Hive-partitioned directories MUST pass ``partition_cols`` — the
    rewrite then preserves the directory layout via ``partitionBy``
    (compacting within each partition). Without it a partitioned
    input is detected and refused, because a flat rewrite would
    silently destroy directory partition pruning.

    Durability: writes to a sibling temp dir, then swaps via two
    os.rename calls. POSIX offers no atomic two-directory exchange
    (short of renameat2/RENAME_EXCHANGE), so a crash can land BETWEEN
    the renames; the entry-point recovery below makes that window
    safe — on the next call a half-swapped state is detected from the
    leftover ``._compact_old`` / ``._compact_tmp`` dirs and rolled
    forward or back before compacting. Readers of ``path`` during the
    swap can still observe a missing directory for an instant; run
    compaction when the table is not being queried (the same contract
    as the merge sink in streaming/sinks.py)."""
    import os
    import shutil

    base = path.rstrip("/")
    tmp = base + "._compact_tmp"
    old = base + "._compact_old"

    # Crash recovery from a previous interrupted run, BEFORE reading:
    # - old exists, live path missing → crashed between the two
    #   renames: roll back (the old dir is the complete table).
    # - old exists, live path present → crashed after the second
    #   rename, before cleanup: the old dir is superseded; drop it.
    # - a leftover tmp is always an incomplete write; drop it.
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    # Refuse to silently flatten a hive layout: key=value subdirs are
    # partition directories, and reading them without partitionBy on
    # the rewrite would fold the layout into plain files.
    p_cols = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols or [])
    )
    hive_dirs = [
        d
        for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    if hive_dirs and not p_cols:
        raise ValueError(
            f"compact: {path} is hive-partitioned ({hive_dirs[0]}, ...); "
            "pass partition_cols to preserve the layout — a flat rewrite "
            "would destroy directory partition pruning"
        )

    if p_cols and order_cols:
        # Rejected, not combined (ADVICE round 7): a range repartition
        # on order_cols makes every range task write its own file for
        # every partition value it touches — one file per (task,
        # value) pair, re-creating exactly the small-files problem
        # compaction exists to fix. Range-cluster WITHIN partitions by
        # compacting each partition directory separately instead.
        raise ValueError(
            "compact: order_cols cannot be combined with partition_cols "
            "(each range task would write one file per partition value "
            "it touches, re-fragmenting the table); compact partition "
            "directories individually to range-cluster within them"
        )

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, (n + target_file_rows - 1) // target_file_rows)
    if order_cols:
        o = [order_cols] if isinstance(order_cols, str) else list(order_cols)
        out = df.repartitionByRange(n_files, *o)
    elif p_cols:
        # Honor target_file_rows INSIDE each partition value (ADVICE
        # round 7 — a bare repartition(*p_cols) always produced one
        # file per value, leaving a huge hive partition as one giant
        # file): derive a per-value bucket count from the per-value
        # row counts (one small agg job over low-cardinality partition
        # keys), spread each value's rows across its buckets, and
        # hash-partition on (partition key, bucket) with one shuffle
        # partition per bucket. Hash collisions can co-locate two
        # (value, bucket) pairs in one task — that merges two target-
        # size files into one, never re-fragments.
        per_val = (
            df.groupBy(*p_cols).count().withColumnRenamed("count", "_pv_n")
        )
        per_val = per_val.withColumn(
            "_pv_buckets",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("_pv_n") / F.lit(target_file_rows)),
            ).cast("int"),
        ).drop("_pv_n")
        total_buckets = int(
            per_val.agg(F.sum("_pv_buckets")).collect()[0][0] or 1
        )
        out = (
            df.join(F.broadcast(per_val), p_cols)
            .withColumn(
                "_pv_b",
                F.pmod(
                    F.monotonically_increasing_id(), F.col("_pv_buckets")
                ),
            )
            .repartition(total_buckets, *p_cols, F.col("_pv_b"))
            .drop("_pv_buckets", "_pv_b")
        )
    elif df.rdd.getNumPartitions() < n_files:
        # coalesce cannot INCREASE partition count (e.g. recompacting
        # an already-compacted table with a smaller target): pay the
        # shuffle for an even spread.
        out = df.repartition(n_files)
    else:
        out = df.coalesce(n_files)
    writer = out.write.mode("overwrite")
    if p_cols:
        writer = writer.partitionBy(*p_cols)
    writer.parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # Report what was actually written, not the request: coalesce
    # keeps at most the source partition count, partitioned writes
    # produce one file per (task, partition-value) pair.
    written = 0
    for _root, _dirs, files in os.walk(path):
        written += sum(1 for f in files if f.endswith(".parquet"))
    return written
