"""Broadcast bloom filter over gram/key hashes — the 100 TB
candidate-pruning path for membership-style joins.

The exact benchmark-decontamination join broadcasts the literal
benchmark gram STRINGS; its docstring names this module's shape as
the real-scale variant: broadcast a fixed-size bit array instead, let
every train-side gram test membership locally (bounded false-positive
rate, zero false negatives), and run the exact join only on the
survivors. Reference-discipline analogue: the executable-contract
style of /root/reference/src/utils/data_contracts.py:103-192 — the
bloom is a CONTRACT ("definitely-absent or maybe-present") whose FP
bound is enforced by a property test, not an assumption.

Construction is fully distributed and engine-native:

1. per-row positions: k = BLOOM_K probes, pos_i =
   pmod(xxhash64(g, i), m) — k independent seeded hashes rather than
   Kirsch–Mitzenmacher double hashing because the KM combine
   (h1 + i·h2) multiplies full-range longs, which THROWS under ANSI
   mode (Spark 4's default) on overflow; seeded xxhash64 stays in
   range by construction. JVM-side codegen expressions, so build and
   probe can never disagree on the hash;
2. bitmap words: groupBy(pos div 64) + bit_or(1 << pos%64) — a
   shuffle bounded by m/64 ROWS regardless of input size (the
   map-side partial bit_or collapses each partition's positions
   first);
3. the ≤ m/64 words are collected and densified into one
   array<bigint> literal, embedded in the probe expression.

Probing (bloom_prune) is element_at(words, pos div 64 + 1) &
(1 << pos%64) per probe — pure integer codegen, no UDF, no Python
boundary; the words literal is bound once per plan.

SCALE BOUND: the words array is collected to the driver and re-shipped
as a broadcast one-row frame (see bloom_prune — NOT a plan literal any
more), so the remaining bound is the driver collect + createDataFrame
round-trip payload, held to m ≈ 2^24 bits (2 MB, ~1M-gram benchmark at
16 bits/element) as a comfort margin rather than a hard ceiling — the
cap CAN simply be raised within driver memory. Well beyond it, skip
the Python round-trip: ship the words via sc.broadcast and test bits
in an Arrow-batched pandas UDF (numpy bitmap index — the positions
stay JVM-computed, so hash parity holds), or register the JVM
BloomFilterAggregate. The m sizing below keeps 16 bits/element: with
k=3 probes the theoretical FP rate is (1 - e^{-kn/m})^k ≈ 0.4%,
measured in tests/test_curation_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_K = 3  # probes per element
BLOOM_BITS_PER_ELEMENT = 16  # m = next_pow2(16·n): ~0.4% FP at k=3
# Driver collect + createDataFrame payload bound (2 MB of bigints) —
# a comfort margin, not a hard ceiling: the words travel as broadcast
# data, so this can be raised within driver memory (module docstring).
_MAX_BITMAP_BITS = 1 << 24


def bloom_m_bits(n_elements: int) -> int:
    """Power-of-two bit count for ~BLOOM_BITS_PER_ELEMENT bits per
    element, floored at 4096 so tiny sets don't degenerate."""
    target = max(4096, BLOOM_BITS_PER_ELEMENT * max(1, n_elements))
    m = 1 << (target - 1).bit_length()
    if m > _MAX_BITMAP_BITS:
        raise ValueError(
            f"bloom of {n_elements} elements needs m={m} bits — beyond the "
            f"{_MAX_BITMAP_BITS}-bit driver-payload bound (collect + "
            "createDataFrame round trip); raise the bound within driver "
            "memory, or ship the words via sc.broadcast + pandas-UDF probe "
            "(see module docstring)"
        )
    return m


def _position_sql(col_sql: str, i: int, m_bits: int | str) -> str:
    # Expressions are assembled as SQL STRINGS, not Column trees: one
    # py4j round trip per expression instead of one per operator (the
    # round-7 lesson from banded_simhash_bands, where Column-tree
    # construction cost 2.7s of a 3.9s query). m_bits: a literal int
    # (plan-literal form) or a COLUMN NAME (declarative bloom_row
    # form, where m comes from the 1-row sizing frame).
    m = f"{m_bits}L" if isinstance(m_bits, int) else m_bits
    return f"pmod(xxhash64({col_sql}, {i}), {m})"


def build_bloom_words(
    df: DataFrame, col: str, m_bits: int, k: int = BLOOM_K
) -> list[int]:
    """Distributed bloom build: k positions per row, bit_or per
    64-bit word, collect ≤ m/64 word rows, densify. The collect is
    bounded by the BLOOM size, never the input size."""
    probes = ", ".join(_position_sql(col, i, m_bits) for i in range(k))
    words = (
        df.selectExpr(f"explode(array({probes})) AS pos")
        .selectExpr(
            "CAST(pos DIV 64 AS BIGINT) AS w",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS b",
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r.w] = r.bits
    return dense


_M_SIZING_SQL = (
    # next_pow2(max(4096, BITS_PER_ELEMENT·n)), capped: the same rule
    # as bloom_m_bits, in-plan. ceil(log2(·)) can only round UP at a
    # float boundary (a benign 2x oversize that lowers FP); it can
    # never undersize. The cap degrades FP rate gracefully instead of
    # raising — correctness never depends on m because the exact
    # verify join kills every false positive.
    f"least(CAST({1 << 26} AS BIGINT), greatest(CAST(4096 AS BIGINT), "
    f"shiftleft(CAST(1 AS BIGINT), CAST(ceil(log2(CAST(greatest("
    f"{BLOOM_BITS_PER_ELEMENT} * _n, 1) AS DOUBLE))) AS INT)))) AS _m"
)


def bloom_row(df: DataFrame, col_sql: str, k: int = BLOOM_K) -> DataFrame:
    """FULLY DECLARATIVE bloom build — one-row frame
    ``(_bloom_words array<bigint>, _m bigint)`` with ZERO driver
    actions (round 11; the build_bloom_words/bloom_prune pair below
    needs a sizing collect + a words collect + a createDataFrame
    round trip, three driver sync barriers that serialized the whole
    query into separate scans).

    - sizing: a 1-row count aggregate of the input, next-pow2'd
      in-plan (_M_SIZING_SQL) and cross-joined onto the position
      stream — n here is the input ROW count, an upper bound on the
      distinct-element count, same as the callers always passed;
    - bitmap: k seeded-xxhash64 positions per row → (word, bit) →
      union an all-zero spine exploded from sequence(0, _m/64 − 1)
      (so the array is dense without any per-element map lookups) →
      bit_or per word → one global sort_array(collect_list(struct))
      whose .bits projection is the dense word array.

    The global collect+sort runs ONCE over m/64 ≤ 2^20 structs inside
    one task — bounded by the BLOOM size, never the input — and the
    row travels executor-to-executor via the broadcast exchange, so
    no driver-memory bound applies at all (the 2^26 cap bounds the
    broadcast payload at 8 MB; beyond it the filter stays correct and
    only its FP rate decays)."""
    mrow = df.agg(F.count("*").alias("_n")).selectExpr(_M_SIZING_SQL)
    probes = ", ".join(_position_sql(col_sql, i, "_m") for i in range(k))
    entries = (
        df.crossJoin(F.broadcast(mrow))
        .selectExpr(f"explode(array({probes})) AS pos", "_m")
        .selectExpr(
            "CAST(pos DIV 64 AS BIGINT) AS w",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS b",
            "_m",
        )
    )
    spine = mrow.selectExpr(
        "explode(sequence(CAST(0 AS BIGINT), _m DIV 64 - 1)) AS w",
        "CAST(0 AS BIGINT) AS b",
        "_m",
    )
    return (
        entries.unionByName(spine)
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"), F.first("_m").alias("_m"))
        .groupBy()
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(w, bits))),"
                " x -> x.bits) AS _bloom_words"
            ),
            F.first("_m").alias("_m"),
        )
    )


def bloom_prune_row(
    df: DataFrame, col_sql: str, bloom: DataFrame, k: int = BLOOM_K
) -> DataFrame:
    """Probe against a :func:`bloom_row` frame: cross-join the
    broadcast one-row bitmap and keep rows with ALL k probe bits set —
    element_at on the dense array is O(1) per probe, pure integer
    codegen, no UDF, no Python boundary, and (unlike the list-based
    bloom_prune) no driver round trip anywhere in the pipeline.

    Each probe position is WRITTEN once as a projected _p{i} column
    before the bit tests, but the evaluate-once shape does NOT survive
    optimization (round-12 ADVICE, verified round 13): Catalyst's
    collapse/pushdown rules substitute the deterministic aliases back
    into the filter, so the OPTIMIZED plan carries the full
    pmod(xxhash64(...)) twice per probe (word index + bit shift) —
    2k inlines, pinned by tests/test_plan_quality.py. Dedup of the 2k
    hash evaluations per row therefore rests on whole-stage codegen's
    subexpression elimination (spark.sql.subexpressionElimination.
    enabled, default true), exactly as the pre-projection form did;
    the projection documents intent and keeps the SQL text small, it
    is not a structural guarantee."""
    pos_cols = [
        f"{_position_sql(col_sql, i, '_m')} AS _p{i}" for i in range(k)
    ]
    tests = " AND ".join(
        f"(element_at(_bloom_words, CAST(_p{i} DIV 64 AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))) != 0"
        for i in range(k)
    )
    probed = df.crossJoin(F.broadcast(bloom)).selectExpr("*", *pos_cols)
    return (
        probed.where(F.expr(f"({tests})"))
        .drop("_bloom_words", "_m", *[f"_p{i}" for i in range(k)])
    )


def bloom_prune(
    df: DataFrame,
    col_sql: str,
    words: list[int],
    m_bits: int,
    k: int = BLOOM_K,
) -> DataFrame:
    """Keep only maybe-present rows: ALL k probe bits set ⇒ keep
    (bounded FP); any clear bit ⇒ definitely absent, dropped. Pure
    codegen integer ops.

    The words array ships as a BROADCAST ONE-ROW FRAME cross-joined
    onto the probe stream — the literal-embed form (a 131k-element
    array(...) in the SQL text at m=2^23) measured fine at execution
    (the parser's CreateArray constant-folds to one Literal) but cost
    seconds PER CONSTRUCTION: a ~1 MB SQL parse plus optimizer rules
    walking 131k×k child nodes until folding. The broadcast frame
    moves the same 1 MB through the torrent broadcast path instead —
    zero plan-text growth, and it IS the 100 TB design (bitmap to
    every executor once, probes read a primitive long array)."""
    spark = df.sparkSession
    wdf = spark.createDataFrame([(words,)], "_bloom_words array<bigint>")
    tests = []
    for i in range(k):
        pos = _position_sql(col_sql, i, m_bits)
        tests.append(
            f"(element_at(_bloom_words, CAST({pos} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))) != 0"
        )
    return (
        df.crossJoin(F.broadcast(wdf))
        .where(F.expr("(" + " AND ".join(tests) + ")"))
        .drop("_bloom_words")
    )
