"""Bronze-layer parquet readers for the testdata star schema.

Replaces the reference's connector/extraction edge (SOQL REST paging +
Bulk CSV jobs, ``src/connectors/salesforce.py:308-379``) with
partitioned parquet scans: pagination, size-based REST/Bulk routing and
source-side LIMIT/ORDER pushdown all disappear — Catalyst pushes
filters, projections and limits into the scan, and partition
parallelism replaces asyncio fan-out (``src/orchestrator.py:183-201``).

Scale notes: reads are schema-on-file (no inference pass beyond the
footer), filters/column pruning reach the parquet reader
(PushedFilters / ReadSchema in `.explain`), and nothing here ever
collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Pinned-schema cache: `spark.read.parquet(path)` infers the schema
# EAGERLY at DataFrame creation (footer read + merge planning JVM-side,
# ~100ms per call on this box) — measurable pure plan-time tax on every
# registered query. The first read of a path infers and pins; repeat
# reads pass the pinned StructType so creation is O(py4j round-trip).
# Keyed by (path, mtime, size, nanosAsLong) so a rewritten file or a
# session with different nanos decoding re-infers instead of reading
# with a stale schema.
_SCHEMA_CACHE: dict = {}


def _fingerprint(path: str) -> tuple:
    """Identity fingerprint of a parquet file or directory dataset.
    For directories the PARQUET FILES are stat'ed (one stat each): a
    part file rewritten in place does not change the directory's own
    mtime (round-10 review finding), so the directory stat alone is
    not a valid cache key."""
    if os.path.isdir(path):
        sig = []
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(root, f))
                    sig.append((f, st.st_mtime_ns, st.st_size))
        return tuple(sorted(sig))
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


def _read_pinned(spark: SparkSession, path: str) -> DataFrame:
    try:
        key = (
            os.path.abspath(path),
            _fingerprint(path),
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"),
        )
    except OSError:
        return spark.read.parquet(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS,
    isAdjustedToUTC=false) — which Spark's parquet reader rejects
    natively — and plain TIMESTAMP(MICROS). Handle both: with
    ``spark.sql.legacy.parquet.nanosAsLong`` a NANOS column reads as
    raw long nanos, which we floor-divide to micros — the exact
    conversion DuckDB applies, so oracle comparisons stay
    bit-identical (integer ``div`` is mandatory: epoch-nanos ~1.7e18
    exceed double's 2^53 exact-integer range). A MICROS column reads
    as timestamp_ntz directly and passes through untouched.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = _read_pinned(spark, path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            df = df.withColumn(
                "ts",
                F.to_timestamp_ntz(F.timestamp_micros(F.expr("ts div 1000"))),
            )
        elif ts_type == "timestamp":
            df = df.withColumn("ts", F.to_timestamp_ntz(F.col("ts")))
        elif ts_type != "timestamp_ntz":
            # Fail at the read site: an unanticipated shipped type
            # (string, int32, double, ...) would otherwise surface as a
            # far-away date-derivation or oracle mismatch.
            raise TypeError(
                f"events.ts shipped as unsupported type {ts_type!r}; "
                "expected TIMESTAMP(NANOS) [long via nanosAsLong], "
                "TIMESTAMP(MICROS) [timestamp] or timestamp_ntz"
            )
        return df
    return _read_pinned(spark, path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def table_num_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet FOOTER metadata, driver-side — zero
    Spark jobs (a count() job costs ~0.4s of pure scheduling floor on
    this box). Handles the single-file testdata layout, flat directory
    datasets (e.g. the tools/scale_bench.py corpora), AND partitionBy
    layouts: the walk is RECURSIVE because this count feeds
    adaptive_codebook / adaptive_n_planes — a silent undercount on a
    nested layout would change n_centroids and thus actual results,
    not just wall-clock (round-9 advisor finding)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            for root, _dirs, files in os.walk(path)
            for f in sorted(files)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def with_lineage(df: DataFrame, org_id: str, org_name: str) -> DataFrame:
    """Lineage metadata columns, mirroring the reference connector
    contract (``src/connectors/base.py:151-156``): `_org_id`,
    `_org_name`, `_extracted_at`. One long table per entity with org
    columns replaces the reference's per-org DataFrame dicts.
    """
    return (
        df.withColumn("_org_id", F.lit(org_id))
        .withColumn("_org_name", F.lit(org_name))
        .withColumn("_extracted_at", F.current_timestamp())
    )
