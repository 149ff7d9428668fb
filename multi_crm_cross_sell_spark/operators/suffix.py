"""Distributed suffix-array construction by prefix doubling.

This is the exact-substring upgrade path documented in SCALE.md
§"Exactness limits of the anchor-gram span family": Lee et al. 2022
(arXiv:2107.06499) compute EXACT maximal repeats with a suffix array
over the concatenated corpus; the anchor-gram family ships because it
is one exchange and SQL-oracle-checkable, with a k−1-word slack. This
module provides the suffix-ORDER half of the exact form as a
first-class operator: global lexicographic ranks of every token-level
suffix of the corpus, built with log(N) rounds of narrow integer
sorts — the textbook Spark-friendly prefix-doubling shape (each round
is a sort/dense-rank over (rank, next-rank) int tuples, never strings
after round 0).

Not yet a registered query: the LCP (longest-common-prefix between
rank-adjacent suffixes) stage that turns suffix order into maximal
repeated SPANS remains, and exact maximal repeats have no tractable
DuckDB oracle at meaningful size (the correctness gate here is a
Python reference equivalence test instead —
tests/test_suffix_ranks.py). Registering the exact-span query is
round-11 work; this operator is its hard half, landed and tested.

Scale shape per round: one shuffle of (gpos, rank, next_rank) int
triples (the self-join on gpos+h is an equi-join on a bigint), one
range-partitioned sort of the DISTINCT key pairs, and one bounded
driver collect of #partitions longs (the per-partition offsets that
turn within-partition row_numbers into a global dense rank without a
single-partition window). Rounds are bounded by log2(N) — per-doc
sentinel tokens make every suffix distinct, so the fixpoint is
guaranteed — and each round ends in an EAGER localCheckpoint so plan
size and lineage stay constant (the iterative-algorithm rule from
dedup_clusters)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_dense_rank(
    df: DataFrame, keys: list[str], n_parts: int = 32, out: str = "rank"
) -> DataFrame:
    """(keys..., out) with ``out`` = dense rank of the key tuple over
    the WHOLE frame, 0-based — without a single-partition window.

    Shape: distinct keys → repartitionByRange(keys) →
    sortWithinPartitions(keys) → within-partition row_number (no
    exchange: partitionBy(spark_partition_id) is satisfied by the
    existing partitioning) → add per-partition offsets (ONE bounded
    collect of ≤ n_parts longs). Ranks are globally consistent
    because range partitioning orders partitions by the same keys the
    local sort uses; dense-ness comes from ranking the DISTINCT key
    set with row_number."""
    keys_distinct = (
        df.select(*keys)
        .distinct()
        .repartitionByRange(n_parts, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(*keys)
    local = keys_distinct.withColumn(
        "_lrk", F.row_number().over(w).cast("bigint")
    ).localCheckpoint(eager=False)
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = local.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off bigint"
    )
    return local.join(F.broadcast(off_df), "_pid").select(
        *keys, (F.col("_off") + F.col("_lrk") - 1).alias(out)
    )


def suffix_ranks(
    tokens: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    word_col: str = "w",
    max_rounds: int = 40,
    n_parts: int = 32,
) -> DataFrame:
    """See _suffix_ranks_full; public form returns only the real-token
    suffix order (doc_id, pos, srank)."""
    final, _hist, _pos, _n = _suffix_ranks_full(
        tokens, id_col, pos_col, word_col, max_rounds, n_parts
    )
    return final


def _suffix_ranks_full(
    tokens: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    word_col: str = "w",
    max_rounds: int = 40,
    n_parts: int = 32,
):
    """Global lexicographic suffix order of the token corpus.

    Documents are concatenated in ``id_col`` order with one UNIQUE
    per-doc sentinel token appended ("\\x00<doc_id>", below every real
    word bytewise), so (a) no suffix compares across a document
    boundary as a prefix of another and (b) all suffixes are distinct
    — the doubling loop provably reaches the all-ranks-distinct
    fixpoint in ≤ ceil(log2(N)) + 1 rounds (verified each round;
    raises if ``max_rounds`` is hit first, never returns a wrong
    order).

    Returns (doc_id, pos, srank): srank is the 0-based position of
    suffix (doc_id, pos) in the sorted order of ALL real-token
    suffixes (sentinel positions are dropped from the output and the
    ranks re-densified over the survivors)."""
    toks = tokens.select(
        F.col(id_col).alias("doc_id"),
        F.col(pos_col).cast("bigint").alias("pos"),
        F.col(word_col).alias("w"),
    )
    # per-doc sentinel: one extra position after the last token
    lens = toks.groupBy("doc_id").agg((F.max("pos") + 1).alias("n_tok"))
    sentinels = lens.select(
        "doc_id",
        F.col("n_tok").alias("pos"),
        F.concat(F.lit("\x00"), F.col("doc_id").cast("string")).alias("w"),
    )
    allt = toks.unionByName(sentinels)
    # Global position: doc offset = exclusive prefix sum of (n_tok + 1)
    # in doc_id order. The cumsum window runs over ONE ROW PER DOC —
    # fine at any measured scale; at extreme doc counts this becomes
    # the same range-partitioned prefix sum global_dense_rank uses.
    wlen = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    offs = lens.select(
        "doc_id",
        F.coalesce(F.sum(F.col("n_tok") + 1).over(wlen), F.lit(0)).alias(
            "doc_off"
        ),
    )
    pos_map = (
        allt.join(F.broadcast(offs), "doc_id")
        .select(
            "doc_id",
            "pos",
            (F.col("doc_off") + F.col("pos")).alias("gpos"),
            "w",
        )
        .localCheckpoint(eager=False)
    )
    n_total = pos_map.count()
    # round 0: rank by the token STRING (the only string-keyed round)
    r = pos_map.join(
        global_dense_rank(pos_map.select("w"), ["w"], n_parts), "w"
    ).select("gpos", "rank")
    # History of (h, rank-table) per doubling level — rank_h(a) ==
    # rank_h(b) iff the first h TOKENS of the two suffixes are equal
    # (sentinel uniqueness makes equal-window-containing-a-sentinel
    # impossible across distinct positions). adjacent_lcp walks this
    # history to exact LCPs. Each table is eager-checkpointed by the
    # loop, so keeping references costs storage (N rows × log N
    # levels), not recompute.
    histories: list[tuple[int, DataFrame]] = []
    h = 1
    for _ in range(max_rounds):
        r = r.localCheckpoint(eager=True)
        histories.append((h, r))
        if r.select("rank").distinct().count() == n_total:
            break
        nxt = r.select(
            (F.col("gpos") - h).alias("gpos"), F.col("rank").alias("rank2")
        )
        paired = r.join(nxt, "gpos", "left").select(
            "gpos", "rank", F.coalesce("rank2", F.lit(-1)).alias("rank2")
        )
        r = paired.join(
            global_dense_rank(
                paired.select("rank", "rank2"),
                ["rank", "rank2"],
                n_parts,
                out="nrank",
            ),
            ["rank", "rank2"],
        ).select("gpos", F.col("nrank").alias("rank"))
        h *= 2
    else:
        raise RuntimeError(
            f"suffix_ranks: no fixpoint after {max_rounds} doubling rounds"
        )
    # drop sentinel positions, re-densify ranks over the survivors
    real = pos_map.where(~F.col("w").startswith("\x00")).select(
        "doc_id", "pos", "gpos"
    )
    kept = real.join(r, "gpos").select("doc_id", "pos", "gpos", "rank")
    final = kept.join(
        global_dense_rank(
            kept.select("rank"), ["rank"], n_parts, out="srank"
        ),
        "rank",
    ).select("doc_id", "pos", "gpos", "srank")
    return final, histories, pos_map, n_total


def adjacent_lcp(
    tokens: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    word_col: str = "w",
    max_rounds: int = 40,
    n_parts: int = 32,
) -> DataFrame:
    """Exact LCP between rank-adjacent suffixes — the second half of
    the Lee et al. exact-repeat pipeline. For every real-token suffix
    (in the global suffix order of :func:`suffix_ranks`) this returns
    its exact token-level longest common prefix with the NEXT suffix
    in that order:

        (doc_id, pos, srank, nxt_doc_id, nxt_pos, lcp)

    A position's longest repeated prefix is max(lcp with prev, lcp
    with next) — the classic suffix-array fact that SA-neighbors
    maximize LCP — so "every position inside an exact repeat ≥ L
    tokens" falls out of this frame plus the existing islands tail.

    Algorithm: walk the doubling history DOWNWARD (h = H/2, …, 1):
    whenever rank_h(a') == rank_h(b') the first h tokens match, so
    advance both cursors by h and add h to the lcp — the standard
    O(log N) LCP walk, distributed as two broadcast-free equi-joins
    per level over narrow (pair, cursor) rows, each level ending in an
    eager checkpoint (constant plan size). Total accumulable lcp is
    H−1, and max LCP < H by the fixpoint's distinctness, so the walk
    is exact. Sentinels bound every lcp at the document edge by
    construction (their ranks are unique)."""
    final, histories, _pos_map, _n = _suffix_ranks_full(
        tokens, id_col, pos_col, word_col, max_rounds, n_parts
    )
    # rank-adjacent REAL pairs (sentinel suffixes carry lcp 0 with
    # everything — their first token is unique — so restricting to
    # real suffixes loses nothing)
    left = final.select(
        "doc_id", "pos", "srank", F.col("gpos").alias("ga")
    )
    right = final.select(
        (F.col("srank") - 1).alias("srank"),
        F.col("doc_id").alias("nxt_doc_id"),
        F.col("pos").alias("nxt_pos"),
        F.col("gpos").alias("gb"),
    )
    state = left.join(right, "srank").select(
        "doc_id",
        "pos",
        "srank",
        "nxt_doc_id",
        "nxt_pos",
        F.col("ga").alias("ca"),
        F.col("gb").alias("cb"),
        F.lit(0).cast("bigint").alias("lcp"),
    )
    # walk levels high → low; the final (all-distinct) level can never
    # match and is skipped
    for h, rh in reversed(histories[:-1] or histories):
        ra = rh.select(F.col("gpos").alias("ca"), F.col("rank").alias("_ra"))
        rb = rh.select(F.col("gpos").alias("cb"), F.col("rank").alias("_rb"))
        st = (
            state.join(ra, "ca", "left")
            .join(rb, "cb", "left")
        )
        eq = (
            F.col("_ra").isNotNull()
            & F.col("_rb").isNotNull()
            & (F.col("_ra") == F.col("_rb"))
        )
        state = st.select(
            "doc_id",
            "pos",
            "srank",
            "nxt_doc_id",
            "nxt_pos",
            F.when(eq, F.col("ca") + h).otherwise(F.col("ca")).alias("ca"),
            F.when(eq, F.col("cb") + h).otherwise(F.col("cb")).alias("cb"),
            F.when(eq, F.col("lcp") + h).otherwise(F.col("lcp")).alias("lcp"),
        ).localCheckpoint(eager=True)
    return state.select(
        "doc_id", "pos", "srank", "nxt_doc_id", "nxt_pos", "lcp"
    )
