"""Local replica of the driver's correctness harness.

Runs every registered query on Spark AND its DuckDB oracle at a given
sf dir, then compares: row count, column-name set, dtype families, and
exact cell values (columns sorted by name, rows sorted by all columns,
NaN==NaN).

SOUNDNESS CAVEAT (learned in round 7): exact value equality here is
necessary but NOT sufficient for a driver green — the driver's
value-hash is *representation*-sensitive. DuckDB silently promotes
SUM(BIGINT) to HUGEINT (int128), which round-trips to a different
pandas dtype than Spark's int64 and hash-mismatches even when every
cell is equal. Two guards close that hole:

  1. ORACLE TYPE LINT (hard FAIL): any oracle output column whose
     DuckDB type is HUGEINT/UHUGEINT/DECIMAL is rejected — cast it
     in the oracle SQL (`CAST(SUM(x) AS BIGINT)`).
  2. RAW DTYPE CHECK (WARN): spark/oracle pandas dtype *family*
     mismatches before normalization are printed, since they are the
     signal the driver's hash actually sees.

Usage:
    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
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


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates / arrays / strings: stringify for stable compare
            df[c] = df[c].apply(
                lambda v: str(sorted(v)) if isinstance(v, (set,)) else str(v)
            )
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64").astype("Int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def lint_oracle_types(rel: "duckdb.DuckDBPyRelation") -> list[str]:
    """Reject oracle output columns whose DuckDB type the driver's
    representation-sensitive hash cannot match against Spark (the
    round-7 HUGEINT bug class)."""
    problems = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(b in t for b in _BANNED_ORACLE_TYPES):
            problems.append(
                f"oracle col {col} has banned DuckDB type {t} — "
                f"add an explicit CAST in the oracle SQL"
            )
    return problems


def _dtype_family(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def raw_dtype_warnings(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    warns = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        sf, of = _dtype_family(sdf[c].dtype), _dtype_family(odf[c].dtype)
        if sf != of:
            warns.append(
                f"col {c}: raw dtype family differs pre-normalization: "
                f"spark={sdf[c].dtype} ({sf}) oracle={odf[c].dtype} ({of})"
            )
    return warns


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) and pd.api.types.is_float_dtype(oc):
            eq = (sc.values == oc.values) | (np.isnan(sc.values) & np.isnan(oc.values))
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {bad} float cells differ exactly; first at row {idx}: "
                    f"spark={sc.iloc[idx]!r} oracle={oc.iloc[idx]!r} "
                    f"delta={abs(sc.iloc[idx]-oc.iloc[idx])!r}"
                )
        else:
            eq = (sc.isna() & oc.isna()) | (sc == oc)
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax((~eq).values))
                problems.append(
                    f"col {c}: {bad} cells differ; first at row {idx}: "
                    f"spark={sc.iloc[idx]!r} ({sc.dtype}) oracle={oc.iloc[idx]!r} ({oc.dtype})"
                )
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    wanted = [a for a in args if "/" not in a]

    from multi_crm_cross_sell_spark.plans import all_queries
    from multi_crm_cross_sell_spark.session import get_spark

    qs = all_queries()
    if wanted:
        qs = {k: v for k, v in qs.items() if k in wanted}

    spark = get_spark("check", master="local[8]", shuffle_partitions="8")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    n_pass = n_fail = n_nosql = 0
    for name, q in qs.items():
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if q.oracle is None:
            n_nosql += 1
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(q.oracle)
            lint = lint_oracle_types(rel)
            odf = rel.df()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = lint + compare(name, sdf, odf)
        for w in raw_dtype_warnings(sdf, odf):
            print(f"WARN {name}: {w}")
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"  - {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
