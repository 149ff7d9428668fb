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
  sublinear, bounded regardless of corpus size. At 100 TB the
  corpus-sized work is ONLY the word count (one shuffle) and the
  final apply — a single chained-replace codegen projection over
  DISTINCT corpus words, joined back by broadcast; the merge loop
  itself runs driver-local over the bounded collected type table
  (see learn_bpe's docstring for why the in-Spark loop variant lost
  on pure job-scheduling overhead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP_L = "\x02"  # token open
SEP_R = "\x03"  # token close


def tokenizable(word: Column, max_len: int = 20) -> Column:
    """``^[a-z]+$`` with length ≤ max_len, expressed as a translate
    scan instead of a regex: strip every a-z char and require nothing
    left (and ≥1 char to start). Identical acceptance set to the
    regex; no regex-engine per-token cost (measured 2x on the corpus
    explode at sf0.1)."""
    return (
        (F.length(word) <= max_len)
        & (F.length(word) > 0)
        & (F.length(F.translate(word, "abcdefghijklmnopqrstuvwxyz", "")) == 0)
    )


def word_counts(docs: DataFrame, max_len: int = 20) -> DataFrame:
    """(word, cnt) over ALL tokenizable corpus word types — the one
    corpus-sized shuffle in the BPE story. Vocabulary-sized output
    (Heaps' law), safe to cache/reuse for both the learning cap and
    the distinct-word apply table."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(tokenizable(F.col("word"), max_len))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def word_types(docs: DataFrame, n_types: int, max_len: int = 20) -> DataFrame:
    """(word, cnt) for the top ``n_types`` tokenizable word types,
    deterministically ordered/capped by (cnt DESC, word ASC).

    orderBy+limit (NOT a row_number window): Spark plans this as
    TakeOrderedAndProject — per-partition partial top-k merged on the
    driver — where the window variant shuffles EVERY distinct word to
    one partition for a global sort. Same rows (the order is total),
    vocabulary-bounded memory at any corpus size."""
    return top_types(word_counts(docs, max_len), n_types)


def top_types(counts: DataFrame, n_types: int) -> DataFrame:
    """Deterministic (cnt DESC, word ASC) cap of a (word, cnt) table."""
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(n_types)


def initial_state(word: Column) -> Column:
    """\\x02c\\x03 per character, concatenated. Built with a regexp
    (every char -> wrapped char) instead of a lambda HOF so it stays
    codegen'd."""
    return F.regexp_replace(word, "(.)", f"{SEP_L}$1{SEP_R}")


def learn_bpe(
    types: DataFrame, n_merges: int
) -> list[tuple[str, str, int]]:
    """Greedy BPE merge learning over a (word, cnt) type table:
    [(left, right, pair_count)] in merge order.

    The type table is COLLECTED and the merge loop runs driver-local.
    Deliberate, and the scale-honest split: the corpus-sized work
    (word counting) stays distributed; the table this loop touches is
    capped at word_types' n_types rows BY CONSTRUCTION, so collecting
    it is bounded regardless of corpus size — exactly how production
    BPE trainers operate (learn on the type/count table, not the
    corpus). A first cut kept the loop in Spark (one aggregation job
    + one localCheckpoint per merge, pacing collect limited to one
    row); it recomputed nothing, yet cost ~0.5s of job scheduling PER
    MERGE — 5.5s of pure orchestration for 10 merges over a 31-row
    table. Driver-local learning on the same collected counts is
    microseconds and BIT-IDENTICAL: integer scores, same
    non-overlapping replace counting, same (score DESC, left, right)
    tie-break — pinned against the unrolled DuckDB oracle and the
    independent Python reference in tests/test_curation_ops.py."""
    return learn_bpe_from_counts(
        [(r.word, r.cnt) for r in types.collect()], n_merges
    )


def learn_bpe_from_counts(
    type_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """learn_bpe on an already-collected (word, cnt) list — lets a
    caller that also needs the alphabet collect the type table ONCE
    instead of paying the corpus word-count job per consumer."""
    sstr = {
        w: "".join(SEP_L + c + SEP_R for c in w) for w, _ in type_counts
    }
    cnts = dict(type_counts)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        score: dict[tuple[str, str], int] = {}
        for w, s in sstr.items():
            toks = s[1:-1].split(SEP_R + SEP_L)
            for a, b in set(zip(toks, toks[1:])):
                pat = SEP_L + a + SEP_R + SEP_L + b + SEP_R
                occ = (len(s) - len(s.replace(pat, ""))) // len(pat)
                score[(a, b)] = score.get((a, b), 0) + cnts[w] * occ
        if not score:
            break
        (t1, t2), sc = sorted(
            score.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if sc <= 0:
            break
        merges.append((t1, t2, sc))
        pat = SEP_L + t1 + SEP_R + SEP_L + t2 + SEP_R
        rep = SEP_L + t1 + t2 + SEP_R
        sstr = {w: s.replace(pat, rep) for w, s in sstr.items()}
    return merges


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


def alphabet_from_counts(type_counts: list[tuple[str, int]]) -> list[str]:
    """alphabet() on an already-collected type table — identical
    result, zero Spark jobs."""
    return sorted({c for w, _ in type_counts for c in w})


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
