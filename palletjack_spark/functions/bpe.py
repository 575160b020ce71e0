"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016
— "Neural Machine Translation of Rare Words with Subword Units").

The q124 driver query is iteration 1 of this loop; this module runs the
full training: repeatedly find the most frequent adjacent symbol pair and
merge it, yielding the ordered merge list that IS a BPE tokenizer.

Scale shape (100 TB corpus):

- the corpus is scanned ONCE, into a (word, count) frequency table — the
  only corpus-sized shuffle in the whole training run.  Zipf keeps the
  distinct-word table sublinear in corpus size, and every later iteration
  touches only that table;
- each iteration is (a) a zero-shuffle adjacent-pair explode over the
  word-symbol table + one tiny aggregate (pair vocabulary ≤ |symbols|²,
  partial-combined map-side) + a driver collect of exactly ONE row, and
  (b) a zero-shuffle ``aggregate()`` fold that rewrites each word's
  symbol array in place (greedy left-to-right, the published semantics);
- lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
  merges — the q101 discipline for iterative algorithms: without it the
  plan for merge k replays all k-1 prior folds.

The symbol fold is pure built-in expressions (no UDF): the accumulator is
the rewritten prefix, and each incoming symbol either fuses with the
accumulator's tail (when tail == a and x == b) or appends.  On "aaa" with
merge (a,a) this yields [aa, a] — the same greedy scan order as the
reference implementation in the paper's Algorithm 1.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class BpeModel:
    """Ordered merge list + the word-symbol table it produced."""

    merges: list[tuple[str, str, int]]  # (left, right, pair_count)
    words: DataFrame  # columns: w, cnt, syms (array<string>)
    #: driver round-trips (one pair-count collect per round) the training
    #: run took — the scale-relevant cost: sequential training is one
    #: round PER merge; batched training amortizes many merges per round.
    rounds: int = 0

    @property
    def vocab(self) -> DataFrame:
        """symbol -> total occurrences across the (weighted) corpus."""
        return (
            self.words.select(
                F.explode("syms").alias("symbol"), F.col("cnt")
            )
            .groupBy("symbol")
            .agg(F.sum("cnt").alias("n_occurrences"))
        )


def word_frequencies(
    corpus: DataFrame, text_col: str = "text", min_word_len: int = 2
) -> DataFrame:
    """The single corpus-sized pass: whitespace words -> (w, cnt).

    ``min_word_len`` drops empty strings from repeated separators (and,
    at the default, 1-char words that can never produce a pair)."""
    return (
        corpus.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.length("w") >= min_word_len)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _to_symbols(words: DataFrame) -> DataFrame:
    return words.withColumn(
        "syms",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the symbol table — zero-shuffle explode,
    tiny partial-combined aggregate (the q124 plan shape, generalized to
    multi-char symbols)."""
    return (
        words.where(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS a,"
                    "             element_at(syms, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _merge_pair(words: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right fuse of adjacent (a, b) into a||b — a
    zero-shuffle ``aggregate()`` fold per word (symbols are bound as
    literal Columns, so arbitrary symbol text is safe)."""
    merged = a + b

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return words.withColumn(
        "syms",
        F.aggregate("syms", F.array().cast("array<string>"), step),
    )


def train_bpe(
    corpus: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 8,
    batch: int = 1,
    exact: bool = True,
) -> BpeModel:
    """Learn ``n_merges`` BPE merges from a text corpus.

    Ties on pair count break by (a, b) lexicographic order so the merge
    list is deterministic across partitionings and engines.  Training
    stops early when no pair reaches ``min_count``.

    ``batch`` bounds how many merges one driver round-trip may commit
    (round-8 verdict item 4 — ``batch=1`` was one Spark action PER merge,
    32k actions at a realistic 32k-merge vocabulary).  Batched training
    is EXACTLY equivalent to sequential training, by this argument: a
    merge of (a, b) only changes the counts of pairs sharing a symbol
    with it (decreases (x,a)/(b,y)-style neighbours, creates (x,a||b)
    pairs bounded by the feeder pair's count).  Each round collects the
    top ``batch * _OVERSAMPLE`` candidates in (count desc, a, b) rank
    order and accepts the prefix that is (1) pairwise symbol-disjoint —
    stop at the FIRST overlapping candidate — and (2) strictly above the
    cutoff count (the first overlapping candidate's count, or the last
    collected row's count when no overlap was seen but the list may
    continue).  Every pair a mid-round merge can create or change ranks
    at-or-below the cutoff (its feeder shares a symbol with an accepted
    pair, so it cannot precede the break position), hence strictly below
    every accepted candidate — even count TIES cannot flip the order the
    sequential argmax would have produced.  The rank-1 candidate is the
    exact sequential argmax and is always accepted, so each round
    commits >= 1 merge and the loop terminates.  Equality with
    ``batch=1`` is property-tested.

    On natural-language corpora the top pairs overlap heavily (t·h,
    h·e, ...), so the exact cutoff often admits only 1-2 merges per
    round.  ``exact=False`` switches to the standard greedy variant —
    apply ALL pairwise symbol-disjoint candidates from the window,
    SKIPPING conflicts instead of stopping — which commits ~``batch``
    merges per action.  Its merge list may interleave differently from
    the sequential order within a window (tokenization fidelity, not
    sequential fidelity); the fixture test pins how far it drifts."""
    words = _to_symbols(word_frequencies(corpus, text_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    since_checkpoint = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        limit = want * _OVERSAMPLE
        top = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(limit)
            .collect()
        )
        rounds += 1
        exhausted = len(top) < limit
        top = [r for r in top if r["pair_count"] >= min_count]
        if not top:
            break
        accepted: list[tuple[str, str, int]] = []
        if exact:
            # break position = first candidate sharing a symbol with an
            # earlier one; everything from there down is rank-suspect
            used: set[str] = set()
            p = len(top)
            for i, r in enumerate(top):
                if r["a"] in used or r["b"] in used:
                    p = i
                    break
                used.update((r["a"], r["b"]))
            if p < len(top):
                cutoff = top[p]["pair_count"]
            elif not exhausted:
                # disjoint through the whole collected window, but deeper
                # (uncollected) pairs may tie with the tail
                cutoff = top[-1]["pair_count"]
            else:
                cutoff = None  # nothing below min_count left to tie with
            for r in top[:p]:
                n = int(r["pair_count"])
                if len(accepted) >= want:
                    break
                if cutoff is not None and n <= cutoff and accepted:
                    break  # rank-1 stays exact even at the cutoff
                accepted.append((r["a"], r["b"], n))
        else:
            # greedy: skip conflicting candidates, keep scanning
            used = set()
            for r in top:
                if len(accepted) >= want:
                    break
                if r["a"] in used or r["b"] in used:
                    continue
                accepted.append((r["a"], r["b"], int(r["pair_count"])))
                used.update((r["a"], r["b"]))
        for a, b, n in accepted:
            merges.append((a, b, n))
            words = _merge_pair(words, a, b)
            since_checkpoint += 1
        if since_checkpoint >= checkpoint_every:
            words = words.localCheckpoint()
            since_checkpoint = 0
    return BpeModel(merges=merges, words=words, rounds=rounds)


#: candidates collected per batched round, as a multiple of the batch
#: size — headroom for the disjoint-prefix + count-cutoff truncation
_OVERSAMPLE = 4


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    min_word_len: int = 1,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per row, split to
    words, then replay the merges in order within each word — the same
    fold as training, chained as nested expressions (zero shuffle, no
    UDF).  Word boundaries are preserved; the output is the concatenated
    per-word symbol arrays."""
    tokens = F.filter(
        F.split(F.col(text_col), " "),
        lambda w: F.length(w) >= min_word_len,
    )
    syms = F.transform(tokens, _chars_of)
    for m in merges:
        a, b = m[0], m[1]
        syms = F.transform(syms, lambda s, a=a, b=b: _fold_merge(s, a, b))
    return df.withColumn(out_col, F.flatten(syms))


def _chars_of(w):
    return F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: w.substr(i, F.lit(1)),
    )


def _fold_merge(s, a: str, b: str):
    merged = a + b

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(s, F.array().cast("array<string>"), step)
