"""Deterministic byte-pair-encoding tokenizer primitives.

Closes the tokenizer-prep story next to vocab_construction /
document_token_ids (plans/datapipe.py): those are word-level; real
pre-training pipelines tokenize SUBWORD. The classic BPE algorithm
(Sennrich et al. 2016, public) is an iterative greedy merge — this
module re-expresses it so that every step is integer/string-exact and
therefore oracle-checkable in DuckDB (the same discipline as the
textrank_keywords integer fixpoint):

- a word's tokenization state is ONE STRING: each token wrapped as
  \\x02<token>\\x03 and concatenated. Wrapping every token in its own
  delimiters makes pair matching exact: the pattern
  \\x02A\\x03\\x02B\\x03 can only match a FULL adjacent token pair
  (never across token boundaries), and SQL ``replace`` is
  left-to-right non-overlapping in both engines — which is exactly
  classic BPE's merge order, so "count occurrences" and "apply merge"
  are both plain ``replace`` arithmetic with NO procedural scan;
- pair score = Σ_word count(word) · non-overlapping occurrences,
  an exact integer in both engines; the best pair is
  (score DESC, left ASC, right ASC) — total order, no float ties;
- merges are learned on the WORD-TYPE table (distinct words + counts,
  capped at ``n_types`` by (count DESC, word ASC)) — Heaps'-law
  sublinear, bounded regardless of corpus size, so the M driver-side
  iterations each run one tiny Spark job and the per-step best-pair
  collect is 1 row. At 100 TB the corpus-sized work is ONLY the word
  count (one shuffle) and the final apply — a single chained-replace
  projection over DISTINCT corpus words, joined back by broadcast.

Scale note: the learning loop is O(M) tiny jobs — M is the merge
budget (a hyperparameter, typically 32k for production vocabularies;
here small so the unrolled DuckDB oracle stays tractable). For
production-sized M, learning over the capped type table is
driver-local anyway (the type table fits in memory); the Spark loop
below is the distributed-counting form that never collects the type
table itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP_L = "\x02"  # token open
SEP_R = "\x03"  # token close


def word_types(docs: DataFrame, n_types: int, max_len: int = 20) -> DataFrame:
    """(word, cnt) for the top ``n_types`` tokenizable word types,
    deterministically ordered/capped by (cnt DESC, word ASC)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word").rlike("^[a-z]+$") & (F.length("word") <= max_len))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_types)
        .drop("rk")
    )


def initial_state(word: Column) -> Column:
    """\\x02c\\x03 per character, concatenated. Built with a regexp
    (every char -> wrapped char) instead of a lambda HOF so it stays
    codegen'd."""
    return F.regexp_replace(word, "(.)", f"{SEP_L}$1{SEP_R}")


def pair_pattern(t1: Column | str, t2: Column | str) -> Column:
    c1 = F.col(t1) if isinstance(t1, str) else t1
    c2 = F.col(t2) if isinstance(t2, str) else t2
    return F.concat(
        F.lit(SEP_L), c1, F.lit(SEP_R + SEP_L), c2, F.lit(SEP_R)
    )


def learn_bpe(
    types: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Greedy BPE merge learning over a (word, cnt) type table.

    Returns (merges, final_state): merges as [(left, right,
    pair_count)] in merge order, final_state the type table with its
    fully-merged state string. Each iteration runs ONE aggregation
    job over the bounded type table and collects exactly one row —
    the loop is driver-PACED, not driver-COMPUTED (counting stays
    distributed; nothing corpus-sized ever reaches the driver)."""
    state = types.withColumn("state", initial_state(F.col("word")))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        # tokens: strip the outer wrap, split on the inter-token seam.
        # split()'s pattern is a REGEX — control chars are literal in
        # a regex, so the seam string works as-is.
        ts = F.split(
            F.expr("substring(state, 2, length(state) - 2)"),
            SEP_R + SEP_L,
        )
        pairs = (
            state.select("word", "cnt", "state", ts.alias("ts"))
            # single-token words have no pairs — and sequence(0, -1)
            # DESCENDS in Spark, so the guard is load-bearing
            .where(F.size("ts") >= 2)
            .select(
                "word",
                "cnt",
                "state",
                F.explode(
                    F.expr(
                        "array_distinct(transform(sequence(0, size(ts) - 2),"
                        " i -> struct(ts[i] AS t1, ts[i + 1] AS t2)))"
                    )
                ).alias("pr"),
            )
            .select(
                "word",
                "cnt",
                "state",
                F.col("pr.t1").alias("t1"),
                F.col("pr.t2").alias("t2"),
            )
        )
        pat = pair_pattern("t1", "t2")
        occ = (
            F.length("state") - F.length(F.replace(F.col("state"), pat))
        ).cast("bigint") / F.length(pat).cast("bigint")
        best = (
            pairs.groupBy("t1", "t2")
            .agg(F.sum(F.col("cnt") * occ.cast("bigint")).alias("s"))
            .orderBy(F.desc("s"), F.asc("t1"), F.asc("t2"))
            .limit(1)
            .collect()
        )
        if not best or best[0].s is None or best[0].s <= 0:
            break
        t1, t2, score = best[0].t1, best[0].t2, int(best[0].s)
        merges.append((t1, t2, score))
        pat_lit = F.lit(SEP_L + t1 + SEP_R + SEP_L + t2 + SEP_R)
        rep_lit = F.lit(SEP_L + t1 + t2 + SEP_R)
        state = state.withColumn(
            "state", F.replace(F.col("state"), pat_lit, rep_lit)
        )
    return merges, state


def alphabet(types: DataFrame) -> list[str]:
    """Sorted distinct characters of the type table — the base vocab.
    Bounded by the character set (≤ a-z here); one tiny job."""
    rows = (
        types.select(F.explode(F.split(F.col("word"), "")).alias("ch"))
        .where(F.length("ch") == 1)
        .distinct()
        .collect()
    )
    return sorted(r.ch for r in rows)


def apply_merges(state: Column, merges: list[tuple[str, str, int]]) -> Column:
    """The M learned merges as ONE chained-replace projection — the
    corpus-apply path: no loop jobs, no shuffle, whole-stage codegen.
    Applying merges in learned order to a fresh initial_state string
    reproduces exactly the tokenization the learner would reach."""
    out = state
    for t1, t2, _ in merges:
        out = F.replace(
            out,
            F.lit(SEP_L + t1 + SEP_R + SEP_L + t2 + SEP_R),
            F.lit(SEP_L + t1 + t2 + SEP_R),
        )
    return out


def tokens_of_state(state: Column) -> Column:
    """State string -> token array (strip outer wrap, split seams).
    split()'s pattern is a regex; the control-char seam is literal."""
    inner = state.substr(F.lit(2), F.length(state) - 2)
    return F.split(inner, SEP_R + SEP_L)
