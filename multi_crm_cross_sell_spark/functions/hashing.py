"""Deterministic IDs and consistent-hash routing (SURVEY §2.7 F20/F21).

Reference: sha256-based prediction IDs
(/root/reference/src/ml/feedback_logging.py:386-400) and md5
consistent-hash A/B bucketing (feedback_logging.py:546-571). Both are
pure column expressions — at 100 TB these run fully distributed inside
codegen, and the same md5-bucket expression doubles as a deterministic
sampling/partition-routing primitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_pair_id(
    a: Column, b: Column, version: str = "v1", prefix: str = "pred_", nhex: int = 12
) -> Column:
    """``pred_<12hex>`` = prefix + sha256(sorted pair + version)[:12].

    The pair is order-normalized with least/greatest, mirroring the
    reference's ``sorted([account1_id, account2_id])``
    (feedback_logging.py:390-394).
    """
    key = F.concat_ws(
        ":", F.least(a, b).cast("string"), F.greatest(a, b).cast("string"), F.lit(version)
    )
    return F.concat(F.lit(prefix), F.substring(F.sha2(key, 256), 1, nhex))


def ab_bucket(key: Column, n_buckets: int = 1000) -> Column:
    """Consistent-hash bucket in [0, n_buckets): md5 → first 15 hex
    chars → int → mod (feedback_logging.py:546-571). 15 hex chars =
    60 bits, fits a long exactly."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("bigint") % n_buckets
    )


def ab_variant(key: Column, treatment_share: float = 0.5, n_buckets: int = 1000) -> Column:
    """Cumulative-allocation variant assignment over the bucket space
    (feedback_logging.py:560-571)."""
    cutoff = int(treatment_share * n_buckets)
    return F.when(ab_bucket(key, n_buckets) < cutoff, "treatment").otherwise("control")
