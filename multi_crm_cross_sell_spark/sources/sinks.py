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


def _fs_and_path(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for ``path`` — existence/rename checks
    that work on any supported filesystem (local, HDFS, S3A), not just
    the driver's local disk."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def merge_upsert(
    spark: SparkSession, target_path: str, updates: DataFrame, key_cols: list[str]
) -> None:
    """MERGE-shaped upsert on plain parquet: keep target rows whose key
    is absent from updates, union the updates. On Delta this is a real
    MERGE INTO with txn guarantees; parquet rename-swap is the portable
    fallback.

    The merged output is written to a staging dir (the target parquet
    is an input of the plan, so it cannot be overwritten in place),
    then swapped in via two renames — the target is never CLEARED
    while the new data is still being computed, and a crash mid-swap
    leaves either the old table or a recoverable ``.__old__`` copy,
    not an empty directory. Staging is always cleaned up."""
    fs, target, jvm = _fs_and_path(spark, target_path)
    staging = jvm.org.apache.hadoop.fs.Path(target_path + ".__staging__")
    backup = jvm.org.apache.hadoop.fs.Path(target_path + ".__old__")
    if fs.exists(target):
        existing = spark.read.parquet(target_path)
        keep = existing.join(updates.select(*key_cols), on=key_cols, how="left_anti")
        out = keep.unionByName(updates)
    else:
        out = updates
    try:
        out.write.mode("overwrite").parquet(str(staging.toString()))
        if fs.exists(backup):
            fs.delete(backup, True)
        had_target = fs.exists(target)
        if had_target and not fs.rename(target, backup):
            raise IOError(f"merge_upsert: could not move {target} aside")
        if not fs.rename(staging, target):
            # roll the old table back so the target never stays missing
            if had_target:
                fs.rename(backup, target)
            raise IOError(f"merge_upsert: could not publish {staging}")
        if had_target:
            fs.delete(backup, True)
    finally:
        if fs.exists(staging):
            fs.delete(staging, True)


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


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _write_minimal_xlsx(pdf, path: str) -> None:
    """Minimal OOXML workbook via stdlib zipfile: one sheet, inline
    strings for text, native numeric cells for numbers. Matches the
    reference's pandas.to_excel output surface (api/main.py:794-858)
    without an openpyxl dependency."""
    import zipfile

    rows_xml: list[str] = []
    header = list(map(str, pdf.columns))
    all_rows = [header] + pdf.astype(object).values.tolist()
    for r, row in enumerate(all_rows, start=1):
        cells = []
        for c, val in enumerate(row):
            ref = f"{_col_ref(c)}{r}"
            if val is None or (isinstance(val, float) and val != val):
                continue
            if r > 1 and isinstance(val, (int, float)) and not isinstance(val, bool):
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{_xml_escape(str(val))}</t></is></c>'
                )
        rows_xml.append(f'<row r="{r}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="export" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def export_excel(df: DataFrame, path: str, max_rows: int = 100_000) -> None:
    """S12 Excel export (api/main.py:794-858's xlsx branch): a serving
    concern over a BOUNDED result — collect via Arrow, then encode with
    pandas/openpyxl when installed, else the stdlib minimal-OOXML
    writer (zip + sheet XML). Either way a real, openable .xlsx lands
    at ``path``."""
    bounded = df.limit(max_rows).toPandas()
    try:  # pragma: no cover - openpyxl not installed here
        bounded.to_excel(path, index=False)
    except ImportError:
        _write_minimal_xlsx(bounded, path)
