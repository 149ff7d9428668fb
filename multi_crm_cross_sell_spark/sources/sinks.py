"""Sinks (SURVEY §2.1 S10-S13, S15).

The reference writes row-at-a-time through the ORM
(/root/reference/src/orchestrator.py:254-331 accounts/opps;
431-457 recommendations) and streams CSV/Excel/JSON exports through
pandas (src/api/main.py:794-858). Here every sink is a set-based
DataFrame write:

- derived-key upsert-shaped append (org_id + sfid composite key,
  orchestrator.py:308: ``id = f"{org_id}_{sfid}"``)
- partitioned parquet tables registered in the Spark catalog
- CSV/JSON exports (full-table distributed; Excel-style bounded
  exports are a serving concern done on a LIMITed toPandas)
- model/metadata registry table (S15/ML17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def derived_key(df: DataFrame, org_col: str = "_org_id", id_col: str = "Id") -> DataFrame:
    """S10: composite business key `<org>_<sfid>` as a column expression
    (the reference builds it per-row in Python)."""
    return df.withColumn("record_id", F.concat_ws("_", F.col(org_col), F.col(id_col)))


def save_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S10/S11: partitioned parquet sink. Partition columns are the
    pruning axis at 100 TB (org/date are the natural choices — queries
    filtered by org or date never touch other partitions)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def merge_upsert(
    spark: SparkSession, target_path: str, updates: DataFrame, key_cols: list[str]
) -> None:
    """MERGE-shaped upsert on plain parquet: keep target rows whose key
    is absent from updates, union the updates. On Delta this is a real
    MERGE INTO with txn guarantees; parquet rewrite is the portable
    fallback."""
    import os

    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        keep = target.join(updates.select(*key_cols), on=key_cols, how="left_anti")
        out = keep.unionByName(updates)
    else:
        out = updates
    # write through a temp dir: the source parquet is an input of the plan
    tmp = target_path + "._staging"
    out.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(target_path)


def export_csv(df: DataFrame, path: str) -> None:
    """S12 CSV export — distributed writer, header on."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def export_json(df: DataFrame, path: str) -> None:
    """S12 JSON-lines export."""
    df.write.mode("overwrite").json(path)


def read_csv_export(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S2: schema-enforced CSV scan (the Bulk-API CSV landing shape)."""
    r = spark.read.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def model_registry_append(
    spark: SparkSession,
    registry_path: str,
    model_name: str,
    version: str,
    stage: str,
    metrics: dict[str, float],
    artifact_path: str,
) -> None:
    """S15/ML17/ML15: model registry rows (name, version, stage,
    metrics JSON, artifact path) — the catalog-table replacement for
    the reference's ModelRegistry ORM (database.py:278-317)."""
    row = spark.createDataFrame(
        [(model_name, version, stage, str(metrics), artifact_path)],
        "model_name string, version string, stage string, metrics string, artifact_path string",
    ).withColumn("registered_at", F.current_timestamp())
    row.write.mode("append").parquet(registry_path)


def save_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table (SCALE.md data-layout): co-locates rows
    by join key at WRITE time so repeated joins/aggregations on that
    key plan with zero exchanges. This is the 100 TB answer to the
    reference's per-key dict lookups: pay one shuffle when landing the
    silver table, then every downstream join on the bucket key is
    shuffle-free (verified in tests/test_sinks_multimodal.py)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def export_excel(df: DataFrame, path: str, max_rows: int = 100_000) -> None:
    """S12 Excel export (api/main.py:794-858's xlsx branch): a serving
    concern over a BOUNDED result — collect via Arrow then write with
    openpyxl if available. Guarded: this container ships no Excel
    writer, so the capped collect is exercised and the final encode
    raises NotImplementedError rather than silently writing nothing."""
    bounded = df.limit(max_rows).toPandas()
    try:  # pragma: no cover - openpyxl not installed here
        bounded.to_excel(path, index=False)
    except ImportError as exc:
        raise NotImplementedError(
            "Excel export requires an xlsx writer (openpyxl); "
            f"collected {len(bounded)} rows successfully"
        ) from exc
