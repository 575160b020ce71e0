"""Deduplication operators for web-scale corpora.

Design for 100 TB:
- exact dedup groups on a 256-bit content hash (sha2), never on the raw
  text — the shuffle moves 32-byte keys, not documents;
- MinHash-LSH is the standard near-dup pipeline (shingle → k minhashes →
  b bands → bucket-join): candidate generation is a self-join on band
  hashes, so cost is O(sum of bucket sizes squared), not O(n²);
- all hashes are engine-portable (md5-derived 60-bit ints) so results are
  reproducible across Spark and the DuckDB oracle — swap in xxhash64 for
  raw throughput when cross-engine determinism isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: number of minhash permutations and LSH banding (k = bands * rows).
#: b=8, r=2 puts the LSH S-curve threshold at (1/b)^(1/r) ≈ 0.35, giving
#: ~90% single-shot recall at Jaccard 0.5 (the default query threshold);
#: the exact-Jaccard verification step keeps precision at 1.0 regardless.
MINHASH_K = 16
LSH_BANDS = 8
LSH_ROWS = 2

SHINGLE_LEN = 8  # character shingles

#: universal-hash parameters for the k minhash "permutations": each shingle
#: is md5-hashed ONCE, then permuted as (a_i * h30 + b_i) mod P over its low
#: 30 bits.  All operands stay < 2^30 so products fit BIGINT in every engine
#: (DuckDB errors on 64-bit overflow; Spark would silently wrap) — this is
#: what keeps the pipeline bit-portable AND 16× cheaper than hashing each
#: shingle k times.
MINHASH_P = 1_073_741_789  # largest prime < 2^30
_H30_MASK = (1 << 30) - 1


#: the LAST invocation's persisted intermediates — returned DataFrames
#: are lazy, so there is no in-band unpersist point; the NEXT invocation
#: evicts the previous set instead (the text._LM_CACHES discipline,
#: round-13 review: minhash_lsh_pairs/simhash_pairs leaked one cached
#: table per call for the life of the session).  Unpersist is a pure
#: storage hint: a still-held old DataFrame just recomputes.
_PAIR_CACHES: list[DataFrame] = []


def _cache_scoped(df: DataFrame) -> DataFrame:
    # keep a few live entries: one composed pipeline may hold several
    # pair-ops' plans before executing any of them
    while len(_PAIR_CACHES) >= 4:
        old = _PAIR_CACHES.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
    _PAIR_CACHES.append(df.persist())
    return df


def minhash_coeffs(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) universal-hash coefficients, a_i odd < 2^30."""
    return [
        (
            (((2 * i + 1) * 2654435761) % (1 << 30)) | 1,
            (i * 1013904223 + 12345) % (1 << 30),
        )
        for i in range(k)
    ]


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives
    in fewer partitions (one small parquet file → one task otherwise: the
    explode+hash stage would run on a single core).  At real scale inputs
    already have enough splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def hash60(col: Column | str, seed: int | None = None) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5.  Matches DuckDB's
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` exactly."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(c, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest id per identical content.

    Returns (content_hash, keeper_id, dup_cnt).  Hash-groupBy — one shuffle
    on a 64-char key (Q90)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("dup_cnt"),
        )
    )


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = SHINGLE_LEN) -> DataFrame:
    """Distinct character n-gram shingles per document: (id, shingle).

    Per-doc array expression + explode — dedup happens inside the row
    (``array_distinct``), so there is no shuffle and the Generate node
    never retains the text column (exploding positions and substringing
    afterwards would carry the full document on every exploded row)."""
    df = _spread(df)
    sexpr = (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
        f" i -> substring({text_col}, i, {n})))"
    )
    return df.select(F.col(id_col), F.explode(F.expr(sexpr)).alias("shingle"))


def hashed_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = SHINGLE_LEN
) -> DataFrame:
    """Distinct 60-bit-hashed shingles per document: (id, h).

    One md5 per shingle occurrence; downstream shuffles move (long, long)
    pairs instead of strings.  60-bit hashing makes shingle collisions
    negligible (~n²/2^60), so Jaccard over h equals Jaccard over the raw
    shingle sets for any real corpus.  Zero-shuffle: the distinct hashed
    set is a per-doc array expression (same shape as
    ``_signatures_one_shuffle``), exploded with only the 8-byte id as
    sibling output."""
    df = _spread(df)
    hexpr = (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
        f" i -> cast(conv(substring(md5(substring({text_col}, i, {n})), 1, 15),"
        f" 16, 10) as long)))"
    )
    return df.select(F.col(id_col), F.explode(F.expr(hexpr)).alias("h"))


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = MINHASH_K
) -> DataFrame:
    """MinHash signature per document: (id, s0..s{k-1}).

    One md5 per shingle + k integer universal-hash "permutations", one
    min-aggregate shuffle — no per-seed rehashing."""
    sh = hashed_shingles(df, text_col, id_col)
    return _signatures_from_hashed(sh, id_col, k)


def _signatures_from_hashed(
    sh: DataFrame, id_col: str, k: int = MINHASH_K, with_set: bool = False
) -> DataFrame:
    """(id, n_sh, s0..s{k-1}[, sh_set]) — the set size (and, with
    ``with_set``, the sorted hashed-shingle set itself) rides along in the
    same aggregate, so Jaccard verification needs no second shuffle over
    the shingle table."""
    h30 = F.col("h").bitwiseAND(F.lit(_H30_MASK))
    aggs = [F.count("*").alias("n_sh")] + [
        F.min(F.pmod(F.lit(a) * h30 + F.lit(b), F.lit(MINHASH_P))).alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    if with_set:
        # h is already distinct per id (hashed_shingles), so collect_list
        # IS the set; sort_array for a deterministic layout
        aggs.append(F.sort_array(F.collect_list("h")).alias("sh_set"))
    return sh.groupBy(id_col).agg(*aggs)


def _signatures_one_shuffle(
    df: DataFrame, text_col: str, id_col: str, k: int = MINHASH_K,
    n: int = SHINGLE_LEN,
) -> DataFrame:
    """(id, n_sh, s0..s{k-1}, sh_set) computed as a pure per-document
    projection — ZERO shuffles: the shingle set, its size, and all k
    min-permutations are array expressions over the document row
    (``transform``/``array_distinct``/``array_min``), so signature
    computation is embarrassingly parallel and never exchanges the
    exploded shingle table (measured 2-5× faster than explode +
    collect_set aggregation, and bit-identical)."""
    df = _spread(df)
    hexpr = (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
        f" i -> cast(conv(substring(md5(substring({text_col}, i, {n})), 1, 15),"
        f" 16, 10) as long)))"
    )
    out = df.select(F.col(id_col), F.expr(hexpr).alias("hset"))
    cols = [F.col(id_col), F.size("hset").cast("long").alias("n_sh")]
    for i, (a, b) in enumerate(minhash_coeffs(k)):
        cols.append(
            F.expr(
                f"array_min(transform(hset, h ->"
                f" pmod({a}L * (h & {_H30_MASK}L) + {b}L, {MINHASH_P}L)))"
            ).alias(f"s{i}")
        )
    cols.append(F.sort_array("hset").alias("sh_set"))
    return out.select(*cols)


def band_hashes(
    sig: DataFrame, id_col: str, bands: int = LSH_BANDS, rows: int = LSH_ROWS,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """LSH banding: (id, band, band_hash) — md5 over the band's signature
    slice, the bucket key for the candidate self-join.  One projection +
    explode (not a bands-way union), so the signature table is scanned
    once.  ``carry`` names extra signature columns to keep on each row."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[F.col(f"s{b * rows + r}").cast("string") for r in range(rows)],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        F.col(id_col), *carry, F.explode(pairs).alias("bh")
    ).select(id_col, *carry, "bh.band", "bh.band_hash")


#: broadcast the shingle-sets table only below this estimated byte size —
#: row COUNT is the wrong gauge because every row carries an O(doc-length)
#: long array (VERDICT r1: 65k rows × ~2 KB ≈ 150 MB "small" table)
BROADCAST_SETS_MAX_BYTES = 48 * 1024 * 1024

#: band buckets larger than this switch from all-pairs to consecutive-chain
#: candidate generation (see ``minhash_lsh_pairs``)
LSH_BUCKET_CAP = 2048


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    bucket_cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH with exact Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    LSH only *generates candidates*; every emitted pair carries its exact
    shingle-set Jaccard, so precision is 1.0 and only recall depends on the
    banding (Q91).

    The hashed shingle table is shuffled exactly once: the signature
    aggregate also carries the per-doc sorted shingle set, so verification
    is an ``array_intersect`` over the (small) candidate list instead of
    two more joins against the full shingle table — at 100 TB the shingle
    explode/shuffle dominates, so one pass over it is the design point.

    **Degenerate-bucket guard**: a band bucket with more than ``bucket_cap``
    members (e.g. thousands of boilerplate-identical docs sharing a band
    hash) would emit O(bucket²) candidate rows in one task.  Such buckets
    switch to consecutive-CHAIN candidates (members sorted by id, each
    linked to its successor): O(bucket) rows, and since oversized buckets
    are near-identical documents, the verified chain keeps every member of
    a dup group transitively connected — the property dedup clustering
    consumes.  Pair-level recall inside oversized buckets is intentionally
    reduced; buckets at or under the cap are exhaustive as before."""
    sig = _cache_scoped(_signatures_one_shuffle(df, text_col, id_col, k=k))
    bh = band_hashes(sig, id_col, bands=bands, rows=rows)
    # hot-bucket probe + broadcast-decision stats in ONE tiny driver-side
    # aggregate (grouping sets: per-bucket counts AND the global totals from
    # a single pass; it also fills sig's persist).  The common case — no
    # degenerate bucket — keeps the exact round-1 plan with zero extra
    # joins; the guard plan only materializes when a bucket actually
    # exceeds the cap.  Only hot buckets + the one global row are
    # collected, never the full bucket histogram.
    probe = (
        band_hashes(sig, id_col, bands=bands, rows=rows, carry=("n_sh",))
        .groupingSets([["band", "band_hash"], []], "band", "band_hash")
        .agg(F.count("*").alias("bsz"), F.sum("n_sh").alias("sum_nsh"))
        # band is a non-null literal on every real row, so a null band
        # tags the grand-total grouping-set row
        .where(F.col("band").isNull() | (F.col("bsz") > bucket_cap))
        .collect()
    )
    hot_rows = [
        (r["band"], r["band_hash"]) for r in probe if r["band"] is not None
    ]
    total = next((r for r in probe if r["band"] is None), None)
    # every doc contributes `bands` rows to the explode, so divide back out
    n_docs = (total["bsz"] // bands) if total else 0
    total_sh = ((total["sum_nsh"] or 0) // bands) if total else 0
    pair_cols_ab = lambda: [  # noqa: E731
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    ]
    if not hot_rows:
        a, b2 = bh.alias("a"), bh.alias("b")
        all_pairs = a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(*pair_cols_ab())
    else:
        hot = F.broadcast(
            df.sparkSession.createDataFrame(
                hot_rows, "band int, band_hash string"
            )
        )
        small = bh.join(hot, ["band", "band_hash"], "left_anti")
        a, b2 = small.alias("a"), small.alias("b")
        small_pairs = a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(*pair_cols_ab())
        wo = Window.partitionBy("band", "band_hash").orderBy(id_col)
        chain_pairs = (
            bh.join(hot, ["band", "band_hash"], "inner")
            .select(
                F.col(id_col).alias("id_a"),
                F.lead(id_col).over(wo).alias("id_b"),
            )
            .where(F.col("id_b").isNotNull())
        )
        all_pairs = small_pairs.unionByName(chain_pairs)
    cand = (
        all_pairs
        .distinct()
        # the candidate list is tiny in BYTES but each row costs an
        # array_intersect over two shingle sets in the verify stage — AQE
        # would coalesce the distinct's output to one partition by size and
        # serialize all that CPU; an explicit repartition pins the fan-out
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    # Candidate pairs can be ~100× the true-pair count, and each verify row
    # carries two shingle-set arrays (~KBs).  Broadcasting the sets table
    # keeps those wide rows inside one stage — nothing wide is ever
    # shuffled.  Falls back to shuffle_hash (not SMJ: no point sorting
    # array-carrying rows) when the corpus is too large to broadcast.  The
    # decision is BYTE-based: n_docs × avg shingle count × 8 B, read from
    # the probe's grand-total grouping-set row (no extra pass).
    est_bytes = total_sh * 8 + n_docs * 64
    sets_df = sig.select(F.col(id_col), "n_sh", "sh_set")
    if est_bytes <= BROADCAST_SETS_MAX_BYTES:
        za = F.broadcast(sets_df.alias("za"))
        zb = F.broadcast(sets_df.alias("zb"))
    else:
        za = sets_df.alias("za").hint("shuffle_hash")
        zb = sets_df.alias("zb").hint("shuffle_hash")
    return (
        cand.join(za, F.col("id_a") == F.col(f"za.{id_col}"))
        .join(zb, F.col("id_b") == F.col(f"zb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("za.sh_set", "zb.sh_set")).alias("common"),
            F.col("za.n_sh").alias("na"),
            F.col("zb.n_sh").alias("nb"),
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.2,
    n: int = 3,
) -> DataFrame:
    """Exact word n-gram Jaccard similarity, blocked to bound the pair
    count (pairs only within the same ``block_col`` value) — the fully
    SQL-expressible dedup variant (Q91b).  Returns (id_a, id_b, jaccard)."""
    df = _spread(df)
    # the distinct n-gram set per document is a pure array expression —
    # no exploded-token self-joins, no shuffle until the gram match; the
    # set size rides along with every exploded gram row, so no sizes
    # joins either.  Docs with fewer than n tokens have no n-grams.
    parts = ", ".join(f"element_at(toks, i + {j})" for j in range(n))
    gexpr = (
        f"array_distinct(CASE WHEN size(toks) < {n} THEN array()"
        f" ELSE transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})) END)"
    )
    # STRUCT-PACKED explode: everything the downstream join needs (id,
    # block, set size, gram) is packed INTO the generated elements, so the
    # Generate node has NO sibling/retained columns.  The naive
    # `select(id, block, size(gset), explode(gset))` plans as
    # Project[size(gset)] ABOVE Generate — which then retains the whole
    # gset array on every exploded row (~row_count × set_size copies,
    # measured 10× the entire query's cost); CollapseProject re-merges any
    # attempt to stage it in separate selects.
    # bind the gram array ONCE per row (round-13 review: size({gexpr})
    # inside the lambda re-evaluated the whole distinct-gram build per
    # element — O(grams²) work per document; Spark does not hoist
    # loop-invariant subtrees out of higher-order-function lambdas)
    packed = (
        f"element_at(transform(array({gexpr}), arr -> "
        f"transform(arr, g -> struct("
        f"{id_col}, block, size(arr) AS n_g, g AS gram))), 1)"
    )
    g = (
        df.select(
            F.col(id_col),
            F.col(block_col).alias("block"),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        .select(F.explode(F.expr(packed)).alias("x"))
        .select(f"x.{id_col}", "x.block", "x.n_g", "x.gram")
        # pin the self-join fan-out (AQE sizes by bytes, join output is
        # O(sum of gram-bucket sizes squared))
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "block", "gram"
        )
    )
    return (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.count("*").alias("common"),
            F.min("a.n_g").alias("na"),
            F.min("b.n_g").alias("nb"),
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash document fingerprint over word tokens: (id, simhash).

    Each token contributes its md5-derived bit pattern; the fingerprint
    sets bit j when more tokens have bit j set than not.  Portable across
    engines (Q99)."""
    df = _spread(df)
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = hash60("tok")
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bit_sums.select(F.col(id_col), out.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    blocks: int = 4,
    bucket_cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """SimHash near-dup pairs (Q99b): (id_a, id_b, hamming<=max_hamming).

    Pigeonhole blocking: with ``blocks`` > ``max_hamming``, any pair within
    the hamming radius agrees on at least one block — so the block-bucket
    self-join is a LOSSLESS candidate generator (recall exactly 1, unlike
    minhash banding), and the oracle can be brute-force all-pairs.  At
    100 TB the join shuffles (block, value) pairs — 4 rows per doc — and
    the verify side broadcasts the 2-column fingerprint table.

    Block buckets larger than ``bucket_cap`` (near-identical boilerplate)
    switch to consecutive-chain candidates, same rationale as
    ``minhash_lsh_pairs``: O(bucket) rows instead of O(bucket²), with dup
    groups kept transitively connected."""
    if blocks <= max_hamming:
        # the pigeonhole guarantee NEEDS blocks > max_hamming: a pair at
        # distance max_hamming could otherwise differ in every block and
        # silently never bucket together — the documented recall-1
        # contract would be void (round-13 review: make misuse loud)
        raise ValueError(
            f"simhash_pairs needs blocks > max_hamming for lossless "
            f"pigeonhole recall; got blocks={blocks}, "
            f"max_hamming={max_hamming}"
        )
    sim = _cache_scoped(simhash(df, text_col, id_col, bits=bits))
    block_bits = bits // blocks
    mask = (1 << block_bits) - 1
    barr = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftright("simhash", b * block_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for b in range(blocks)
        ]
    )
    bh = sim.select(F.col(id_col), F.explode(barr).alias("x"), "simhash").select(
        id_col, "x.blk", "x.bv", "simhash"
    )
    # pin the self-join's fan-out: its input is tiny in bytes (4 rows per
    # doc) so AQE coalesces the exchange to one partition — but the join
    # OUTPUT is O(sum of bucket sizes squared); explicit co-partitioning
    # on the bucket key keeps the pair generation parallel
    bh = bh.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "blk", "bv"
    )
    # hot-block probe: one tiny driver-side aggregate over the persisted
    # fingerprints; the common no-hot-bucket case keeps the round-1 plan
    hot_rows = (
        bh.groupBy("blk", "bv")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") > bucket_cap)
        .select("blk", "bv")
        .collect()
    )
    if not hot_rows:
        small = bh
    else:
        hot = F.broadcast(
            df.sparkSession.createDataFrame(hot_rows, "blk int, bv long")
        )
        small = bh.join(hot, ["blk", "bv"], "left_anti")
    a, b2 = small.alias("a"), small.alias("b")
    # carrying the 64-bit fingerprint into the block rows lets the join
    # verify hamming INLINE — raw bucket collisions (O(sum bucket²), e.g.
    # 2.7M at sf0.1) are filtered to the true-pair set before any exchange;
    # the distinct then dedups only survivors (each at most `blocks` times)
    small_pairs = (
        a.join(
            b2,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            )
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    if not hot_rows:
        return small_pairs.distinct()
    wo = Window.partitionBy("blk", "bv").orderBy(id_col)
    chain_pairs = (
        bh.join(hot, ["blk", "bv"], "inner")
        .select(
            F.col(id_col).alias("id_a"),
            F.lead(id_col).over(wo).alias("id_b"),
            F.bit_count(
                F.col("simhash").bitwiseXOR(F.lead("simhash").over(wo))
            )
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("id_b").isNotNull() & (F.col("hamming") <= max_hamming))
    )
    return small_pairs.unionByName(chain_pairs).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every node connects its strictly-larger neighbors to the
    minimum of its closed neighborhood."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: every node connects its smaller-or-equal neighbors (and
    itself) to its minimum neighbor."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    return (
        d.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


#: Edge-count cap for the connected-components local fast path: an edge
#: set at or under this size is pulled to the driver with one bounded
#: ``take`` and contracted by union-find, exactly the broadcast-join
#: size-gate pattern (decide smallness by a constant, compute small data
#: where it is cheapest).  64k edges ≈ a few MB collected — far under the
#: driver's broadcast budget; a 100 TB near-dup graph (billions of edges)
#: takes the distributed star-contraction path unchanged.
CC_LOCAL_MAX_EDGES = 1 << 16


def _local_components(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union-find with union-by-min over a driver-local edge list.

    The root of every set is its minimum member at all times (union
    attaches the larger root under the smaller), so the final find(x) is
    exactly the distributed contraction's label: the smallest node id
    reachable from x."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru < rv:
            parent[rv] = ru
        elif rv < ru:
            parent[ru] = rv
    return sorted((n, find(n)) for n in parent)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    local_max_edges: int = CC_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Connected components over a near-dup pair list: (node, component)
    with component = the smallest node id reachable from ``node``.

    The step that turns pairwise dedup output (minhash/simhash/jaccard
    pairs) into keep-one-per-group decisions.  Alternating
    LARGE-STAR/SMALL-STAR (the published MapReduce CC algorithm): each
    round is one min-neighbor aggregate + one join per star op, and the
    edge set provably converges to per-component stars in O(log² n) rounds
    — a 64-node chain (our bucket-cap chain shape) resolves in a handful
    of iterations, never O(n) like naive min-propagation.  The driver only
    sees per-round counts; nodes and edges stay distributed.

    Spark-specific: per-round ``localCheckpoint`` cuts the iterative
    lineage — otherwise every action replays all prior rounds and the plan
    grows without bound (the classic iterative-algorithm trap).  ONE job per
    round: the checkpoint is lazy and the single action is an order-independent
    (count, hash-xor) signature aggregate that both materializes the
    checkpoint and decides convergence — the star operators are idempotent
    at their fixed point, so signature equality across rounds (64-bit
    collision odds aside) means the edge set stopped changing.  XOR, not
    SUM: overflow-free under ANSI mode, and the edge set is always
    ``distinct()`` so duplicate-cancellation can't occur.

    Small-graph fast path (r17 optimization, guide §1.2): near-dup pair
    lists are usually a tiny fraction of the corpus, and each distributed
    round costs a fixed stack of exchanges + AQE stage jobs + driver
    planning gaps regardless of how few edges remain — contracting a
    handful of edges through 3 star rounds was measured as ~24 Spark jobs
    of almost pure scheduling overhead.  So when one bounded ``take``
    (capped at ``local_max_edges + 1`` rows, the broadcast-join size-gate
    pattern — NOT an unbounded collect) shows the whole deduplicated edge
    set fits the cap, components are computed by driver-side union-find
    and parallelized back; above the cap the distributed loop runs
    exactly as before.  Both paths produce the identical labelling
    (component = min reachable id; pinned by a property test).
    """

    def _signature(df: DataFrame) -> tuple[int, int]:
        row = df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64("u", "v")), F.lit(0)
            ).alias("sig"),
        ).collect()[0]
        return row["n"], row["sig"]

    e = (
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if local_max_edges > 0:
        head = e.take(local_max_edges + 1)
        if len(head) <= local_max_edges:
            if not head:
                return e.select(
                    F.col("u").alias("node"), F.col("v").alias("component")
                )
            rows = _local_components([(r["u"], r["v"]) for r in head])
            return pairs.sparkSession.createDataFrame(
                rows, "node long, component long"
            )
    prev = _signature(e)
    if prev[0] == 0:
        return e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )
    converged = False
    for _ in range(max_iterations):
        e_next = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _signature(e_next)
        e = e_next
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # an unconverged edge set is NOT star-shaped: a node with
        # residual edges would emit multiple (node, component) rows and
        # downstream dedup would silently keep/drop the wrong copies
        # (round-13 review) — fail loudly instead
        raise ValueError(
            f"connected_components did not converge within "
            f"{max_iterations} iterations; raise max_iterations "
            "(alternating large-star/small-star needs O(log^2 n) rounds)"
        )
    # converged edge set is a star per component: (member, root).  Roots
    # appear only on the right; map them to themselves.
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(
            e.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .distinct()
    )


def apply_components(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    node: str = "node",
    component: str = "component",
    n_losers: int | None = None,
) -> DataFrame:
    """Materialize a dedup decision from a connected-components labelling:
    keep every document that is either untouched by any near-dup pair or
    the canonical (minimum-id) member of its component.

    The LOSERS list (node != component) is usually a small fraction of the
    corpus, so the fast path broadcasts it and the corpus passes through
    one map-side anti-join — the full dataset is never shuffled to be
    deduplicated.  But real web crawls run 30-50%% near-dup: at 100 TB the
    loser list is billions of ids, far past broadcast limits, so the
    decision is BYTE-based like the minhash verify stage (dedup.py:330):
    losers × 8 B (long id) + per-row overhead vs the broadcast cap; above
    it, a shuffle_hash left_anti keeps the wide corpus rows on one side of
    a hash exchange instead of OOMing every executor with the build side.

    ``n_losers`` lets a caller that already knows the count (e.g. from the
    CC convergence loop's per-round counts) skip the sizing job; otherwise
    one count() over the (already tiny relative to the corpus) components
    labelling decides the mode.
    """
    losers = components.where(F.col(node) != F.col(component)).select(
        F.col(node).alias(id_col)
    )
    if n_losers is None:
        n_losers = losers.count()
    if n_losers * 72 <= BROADCAST_SETS_MAX_BYTES:  # 8 B id + row overhead
        return df.join(F.broadcast(losers), id_col, "left_anti")
    return df.join(losers.hint("shuffle_hash"), id_col, "left_anti")


#: cross-document duplicate-gram settings (Q110): word-gram length and the
#: keep threshold on the duplicated-position fraction.  Module-level so the
#: DuckDB oracle embeds the same values.
DUPGRAM_N = 4
DUPGRAM_MAX_FRAC = 0.5


def cross_doc_dupgrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = DUPGRAM_N,
    max_frac: float = DUPGRAM_MAX_FRAC,
) -> DataFrame:
    """Cross-corpus duplicated-substring filtering — the scalable
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for every
    document, the fraction of its word ``n``-gram POSITIONS whose gram
    also appears in at least one other document.  Documents past
    ``max_frac`` are mostly boilerplate/copy and are marked drop.

    Returns (id, n_grams, n_dup_grams, dup_frac, keep) — one row per
    document with at least ``n`` tokens.

    Scale shape — the text column never shuffles:

    1. grams are a per-row projection hashed to 60-bit longs
       (``hash60`` in the same codegen stage as the explode — measured 4×
       faster than hashing inside a ``transform`` lambda, which falls out
       of whole-stage codegen), exploded as (id, gh) pairs — 16 B rows;
    2. "gram seen in >= 2 distinct docs" is ``min(id) != max(id)`` — ONE
       hash aggregate on ``gh`` with map-side partial combine, replacing
       the former distinct-on-(id, gh) + count pair of exchanges (r17;
       the boolean is all the roll-up reads, and min/max are
       duplicate-insensitive, so the labelling is identical);
    3. the per-doc roll-up joins (id, gh) back to the tiny-keyed
       frequency table on ``gh`` and aggregates by id — after the
       explode a document's grams are co-located, so the partial
       aggregate collapses to ~one row per doc before the exchange.

    All exchanges move two-long projections; a 100 TB corpus shuffles
    ~corpus-token-count × 16 B, the same order as the minhash shingle
    pass (Q91), not corpus bytes.
    """
    from palletjack_spark.functions.curation import _check_reserved

    _check_reserved(
        {"toks", "gram", "gh", "ndocs", "n_grams", "n_dup_grams",
         "dup_frac", "keep"},
        id_col=id_col, text_col=text_col,
    )
    df = _spread(df)
    gram = " || ' ' || ".join(f"element_at(toks, i + {j})" for j in range(n))
    # CASE-guarded so the expression is total: Catalyst infers a
    # size(...) > 0 predicate from the explode and may evaluate it BEFORE
    # the size(toks) >= n filter — an unguarded element_at would throw on
    # short docs.  The guard is codegen'd and measured free.
    grams_expr = (
        f"CASE WHEN size(toks) < {n} THEN array() ELSE "
        f"transform(sequence(1, size(toks) - {n - 1}), i -> {gram}) END"
    )
    g = (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
        .where(F.size("toks") >= n)
        .select(F.col(id_col), F.explode(F.expr(grams_expr)).alias("gram"))
        .select(F.col(id_col), hash60(F.col("gram")).alias("gh"))
    )
    # the downstream sum only needs the BOOLEAN "gram seen in >= 2
    # distinct docs", which is min(id) != max(id): one hash aggregate on
    # gh with map-side partial combine, instead of a distinct-on-(id, gh)
    # exchange FOLLOWED BY a count exchange (r17 optimization, guide §2.3
    # "aggregate before you shuffle" — the gram table crosses the wire
    # once, pre-combined)
    dfreq = g.groupBy("gh").agg(
        (F.min(id_col) != F.max(id_col)).alias("dup")
    )
    dup_frac = F.col("n_dup_grams").cast("double") / F.col("n_grams")
    return (
        g.join(dfreq, "gh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_dup_grams"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_dup_grams",
            dup_frac.alias("dup_frac"),
            (dup_frac <= F.lit(max_frac)).alias("keep"),
        )
    )


def dup_span_excise(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = DUPGRAM_N,
) -> DataFrame:
    """Exact substring dedup at SPAN granularity — Lee et al. 2022's
    actual dedup-and-remove operator ("Deduplicating Training Data Makes
    Language Models Better", §3 ExactSubstr): find every maximal run of
    word positions covered by some ``n``-gram that also appears in
    another document, and rewrite the text with those spans excised.
    This upgrades :func:`cross_doc_dupgrams`'s per-doc duplicated
    FRACTION into the span-level removal a corpus pipeline actually
    applies.

    Returns one row per document with ≥1 duplicated span: ``(id,
    n_spans, covered_tokens, spans_str, clean_text)`` where ``spans_str``
    is the comma-joined ``start-end`` list (1-based token positions,
    inclusive) and ``clean_text`` the document with covered tokens
    removed.

    Scale shape (q110's discipline — the text column moves ONCE):

    1. grams hash row-side to 60-bit longs; the gram-frequency exchange
       carries (id, start, gh) long triples, never text or gram strings;
    2. duplicated-gram hits explode to covered (id, position) pairs —
       two-long rows, bounded by n x hits;
    3. span merging is the gaps-and-islands window partitioned by doc
       (positions of one doc are co-located after the distinct);
    4. the original text joins ONCE at the end, on id, against the
       per-doc span summary (inner join: only duplicated docs move), and
       the rewrite is a row-local filter/transform over the token array.

    A 100 TB corpus therefore shuffles O(token-count) 24 B rows plus one
    text-sized exchange RESTRICTED to the duplicated docs — the same
    order as the minhash pass, not corpus bytes x passes.
    """
    from palletjack_spark.functions.curation import _check_reserved

    _check_reserved(
        {"toks", "gram", "gh", "s", "s0", "p", "isl", "ndocs",
         "span_start", "span_end", "spans", "n_spans", "covered_tokens",
         "spans_str", "clean_text"},
        id_col=id_col, text_col=text_col,
    )
    df = _spread(df)
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    )
    gram = " || ' ' || ".join(f"element_at(toks, i + {j})" for j in range(n))
    grams_expr = (
        f"CASE WHEN size(toks) < {n} THEN array() ELSE "
        f"transform(sequence(1, size(toks) - {n - 1}), i -> {gram}) END"
    )
    # (id, start, gh) — posexplode keeps the gram's 1-based start so a
    # duplicated hash maps straight back to its covered positions
    g = (
        toks.where(F.size("toks") >= n)
        .select(
            F.col(id_col),
            F.posexplode(F.expr(grams_expr)).alias("s0", "gram"),
        )
        .select(
            F.col(id_col),
            (F.col("s0") + 1).alias("s"),
            hash60(F.col("gram")).alias("gh"),
        )
    )
    # "gram appears in >= 2 distinct docs" == min(id) != max(id): one
    # hash aggregate on gh with map-side partial combine, instead of the
    # former distinct-on-(id, gh) exchange FOLLOWED BY a count exchange —
    # the (id, gh) triple table now crosses the wire once, pre-combined
    # (r17 optimization, guide §2.3 "aggregate before you shuffle")
    dup = (
        g.groupBy("gh")
        .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
        .where(F.col("_mn") != F.col("_mx"))
        .select("gh")
    )
    hits = g.join(dup, "gh").select(id_col, "s")
    # NOTE (r17): pre-partitioning by id here (to share one exchange
    # between this distinct and the island window) was A/B-measured
    # SLOWER: the exploded positions are ~n x duplicated, and the
    # distinct's map-side partial dedup collapses them BEFORE its
    # exchange — one exchange of n x rows loses to two exchanges of
    # deduplicated rows.  Kept as distinct + window exchange.
    covered = hits.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("s"), F.col("s") + (n - 1))).alias("p"),
    ).distinct()
    # gaps-and-islands: consecutive covered positions share p - row_number
    w = Window.partitionBy(id_col).orderBy("p")
    islands = (
        covered.withColumn("isl", F.col("p") - F.row_number().over(w))
        .groupBy(id_col, "isl")
        .agg(
            F.min("p").alias("span_start"),
            F.max("p").alias("span_end"),
        )
    )
    per_doc = (
        islands.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("covered_tokens"),
            F.array_sort(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("spans"),
        )
        .withColumn(
            "spans_str",
            F.expr(
                "array_join(transform(spans,"
                " x -> concat(x.span_start, '-', x.span_end)), ',')"
            ),
        )
    )
    # the final join must keep per_doc (duplicated docs only, one
    # summary row each) on the BROADCAST side — a shuffle_hash hint here
    # was A/B'd in r17 and REGRESSED: it forces the token-array side
    # through a hash exchange the broadcast plan never pays (the plan
    # test pins "no hash exchange carries toks"); the excision itself is
    # a row-local indexed transform + filter
    return toks.join(per_doc, id_col).select(
        F.col(id_col),
        "n_spans",
        "covered_tokens",
        "spans_str",
        F.expr(
            "array_join(filter(transform(toks, (t, i) -> CASE WHEN "
            "exists(spans, sp -> i + 1 >= sp.span_start"
            " AND i + 1 <= sp.span_end) "
            "THEN NULL ELSE t END), t -> t IS NOT NULL), ' ')"
        ).alias("clean_text"),
    )


#: packs (quality, id) into ONE bigint so the per-cluster argmax stays a
#: codegen'd HashAggregate (``max(struct(...))`` falls back to
#: SortAggregate); quality <= 3000 and id < 2^50 keep the pack in int64
_REPR_PACK = 1 << 50


def cluster_representatives(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.2,
) -> DataFrame:
    """Keep-best-per-cluster near-dup dedup (Q153): connected components
    over the exact n-gram Jaccard pairs (:func:`ngram_jaccard_pairs` →
    :func:`connected_components`), then keep the HIGHEST-QUALITY member
    of each cluster — ties to the lowest id — instead of the arbitrary
    min-id.  This is the representative-selection policy production
    curation pipelines apply after near-dup clustering (drop the
    boilerplate copy, keep the cleanest one).

    Returns (id, component, quality, keep) for every clustered document;
    unclustered documents are implicitly kept (no row).  Quality is an
    exact integer composite — length band (100–2000 chars) + token band
    (20–500) + milli type-token ratio — so the argmax is engine-exact.

    Scale shape: quality is a zero-shuffle row-local projection; the
    argmax packs (quality, id) into one BIGINT and runs as ONE hash
    aggregate on component plus a same-key join back (the exchange on
    ``component`` is reused by both — no extra shuffle).
    """
    pairs = ngram_jaccard_pairs(df, text_col, id_col, block_col, threshold)
    comp = connected_components(pairs)

    toks = F.split(F.col(text_col), " ")
    quality = (
        F.when(F.length(text_col).between(100, 2000), F.lit(1000)).otherwise(0)
        + F.when(F.size(toks).between(20, 500), F.lit(1000)).otherwise(0)
        + F.expr(
            f"(1000 * size(array_distinct(split({text_col}, ' '))))"
            f" div size(split({text_col}, ' '))"
        )
    ).cast("long")
    q = df.select(F.col(id_col), quality.alias("quality"))

    # the pack is only injective for 0 <= id < 2^50 — an id outside that
    # range would silently corrupt the argmax (wrong keeper/keep flags),
    # so violations raise EXECUTOR-side on the data path (zero extra
    # jobs; the guard is a row-local projection, the argmax stays a
    # codegen'd HashAggregate)
    packed = F.when(
        F.col(id_col).between(0, _REPR_PACK - 1),
        F.col("quality") * F.lit(_REPR_PACK)
        + (F.lit(_REPR_PACK - 1) - F.col(id_col)),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "cluster_representatives requires 0 <= id < 2^50 "
                    "(argmax pack range); got id="
                ),
                F.col(id_col).cast("string"),
            )
        )
    )
    member = comp.join(q, comp["node"] == q[id_col]).select(
        F.col(id_col),
        "component",
        "quality",
        packed.alias("pack"),
    )
    winners = member.groupBy("component").agg(
        (F.lit(_REPR_PACK - 1) - F.max("pack") % F.lit(_REPR_PACK)).alias(
            "keeper_id"
        )
    )
    # shuffle_hash, not the planner's sort-merge fallback (sizes are
    # unknown behind the components seam): winners is one row per
    # component vs member's one per clustered doc, so the per-partition
    # hash build is the smaller side by the mean cluster size, and both
    # sorts disappear — the q140 survivor-join pattern (guide §3.1)
    return member.join(winners.hint("shuffle_hash"), "component").select(
        F.col(id_col),
        "component",
        "quality",
        (F.col(id_col) == F.col("keeper_id")).alias("keep"),
    )


def fuzzy_decontaminate(
    train: DataFrame,
    ev: DataFrame,
    text_col: str,
    id_col: str,
    threshold_milli: int = 500,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Fuzzy benchmark decontamination (Q154): flag training documents
    MinHash-near-duplicate to any eval/benchmark document — the
    similarity upgrade of exact n-gram decontamination (Q102), the
    GPT-3/PaLM-style "remove train docs overlapping the test set even
    after light edits" pass.

    Returns (id, eval_id, jaccard_milli) for every cross-corpus pair
    whose banded-LSH candidate survives EXACT shingle-Jaccard
    verification at ``threshold_milli`` (integer milli-Jaccard via
    truncating div — engine-exact, the q143/q151 fixed-point rule).
    Banding only generates candidates; precision is 1.0 and recall
    follows the q91 banding curve.

    Scale shape (the eval side is a benchmark — tiny vs a 100 TB
    corpus): signatures are zero-shuffle per-document projections on
    BOTH sides; the eval band table and eval shingle sets BROADCAST, so
    the train corpus is never shuffled at all — candidates and verify
    are map-side joins, one distinct on the (train, eval) candidate
    pairs bounded by banding collisions."""
    sig_t = _signatures_one_shuffle(train, text_col, id_col, k=k)
    sig_e = _signatures_one_shuffle(ev, text_col, id_col, k=k)
    bh_t = band_hashes(sig_t, id_col, bands=bands, rows=rows)
    bh_e = band_hashes(
        sig_e.withColumnRenamed(id_col, "eval_id"), "eval_id",
        bands=bands, rows=rows,
    )
    cand = (
        bh_t.join(F.broadcast(bh_e), ["band", "band_hash"])
        .select(id_col, "eval_id")
        .distinct()
    )
    sets_t = sig_t.select(F.col(id_col), "n_sh", "sh_set")
    sets_e = sig_e.select(
        F.col(id_col).alias("eval_id"),
        F.col("n_sh").alias("ne"),
        F.col("sh_set").alias("eset"),
    )
    jm = "(1000 * common) div (n_sh + ne - common)"
    # broadcast the CANDIDATE list into the train sets (bounded by eval
    # size x banding collisions), never the reverse: the train shingle
    # sets are corpus-sized WIDE rows and must not shuffle — the verify
    # stays map-side over the train scan
    return (
        sets_t.join(F.broadcast(cand), id_col)
        .join(F.broadcast(sets_e), "eval_id")
        .select(
            F.col(id_col),
            F.col("eval_id"),
            F.size(F.array_intersect("sh_set", "eset")).cast("long").alias("common"),
            "n_sh",
            "ne",
        )
        .select(
            F.col(id_col),
            "eval_id",
            F.expr(jm).cast("long").alias("jaccard_milli"),
        )
        .where(F.col("jaccard_milli") >= threshold_milli)
    )


# --------------------------------------------------------------------------
# incremental near-dup dedup against a persisted signature store (Q156)
# --------------------------------------------------------------------------

#: signature-store manifest (the q92g/_ann_meta discipline: versioned,
#: parameter-stamped, fingerprintable)
_SIG_META_NAME = "_sig_meta.json"


def _sig_meta(
    id_col: str, k: int, bands: int, rows: int, layout: str = "objects"
) -> dict:
    return {
        "format": "pjspark-sigstore",
        "version": 1,
        # "batched" = rename-based batch=N slots; "objects" = the
        # round-16 rename-free manifest-listed layout (STORES.md); the
        # pre-round-12 flat layout has no tag and is rejected on load
        "layout": layout,
        "n_batches": 1,
        "id_col": id_col,
        "k": k,
        "bands": bands,
        "rows": rows,
        "shingle_len": SHINGLE_LEN,
        "minhash_p": MINHASH_P,
    }


def save_signature_store(
    df: DataFrame,
    text_col: str,
    id_col: str,
    store_dir: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    layout: str = "objects",
) -> DataFrame:
    """Build and persist the MinHash signature store for an ingested
    corpus: one row per document — (id, n_sh, s0..s{k-1}, sh_set), the
    complete record near-dup matching needs, ~200 B + the hashed-shingle
    set per doc, so the corpus TEXT never has to be rescanned by later
    batches.  Signatures are zero-shuffle per-document projections
    (``_signatures_one_shuffle``); the write is the only job.

    The store is a parquet dataset plus a versioned ``_sig_meta.json``
    manifest stamping the minhash parameters — a store built under
    different k/banding/shingle settings must never silently mix
    (:func:`load_signature_store` validates).  Batch layout, manifest
    commit, and compaction ride the shared crash-publication contract
    (:mod:`palletjack_spark.functions.store`).

    ``layout``: ``"objects"`` (the default since round 17 — rename-free
    immutable object dirs listed by the manifest, see STORES.md) or
    ``"batched"`` (rename-based ``batch=N`` slots, still fully
    supported for existing manifests; appends, loads, and compaction
    follow the manifest's layout automatically)."""
    import os as _os
    import uuid as _uuid

    from palletjack_spark.functions import store as S

    if layout not in ("batched", "objects"):
        raise ValueError(f"unknown signature store layout {layout!r}")
    sig = _signatures_one_shuffle(df, text_col, id_col, k=k)
    meta = _sig_meta(id_col, k, bands, rows, layout=layout)
    if layout == "objects":
        rel = f"obj-{_uuid.uuid4().hex}"
        sig.write.mode("overwrite").parquet(
            _os.path.join(store_dir, "signatures", rel)
        )
        meta["objects"] = {"signatures": [rel]}
    else:
        S.write_batch(sig, store_dir, "signatures", 0)
    S.commit_manifest(store_dir, _SIG_META_NAME, meta)
    return sig


def load_signature_store(
    spark,
    store_dir: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Open a persisted signature store, validating that its manifest
    was written under the SAME minhash parameters (mixed-parameter
    signatures compare garbage — hard error, not a wrong answer)."""
    from palletjack_spark.errors import IndexFormatError
    from palletjack_spark.functions import store as S

    try:
        meta = S.load_manifest(store_dir, _SIG_META_NAME)
    except (OSError, ValueError) as e:
        raise IndexFormatError(f"not a signature store: {store_dir}") from e
    want = _sig_meta(meta.get("id_col", ""), k, bands, rows)
    for key in ("format", "k", "bands", "rows", "shingle_len", "minhash_p"):
        if meta.get(key) != want[key]:
            raise IndexFormatError(
                f"signature store {store_dir} was built with {key}="
                f"{meta.get(key)!r}, this session expects {want[key]!r}"
            )
    if meta.get("layout") not in ("batched", "objects") or (
        "n_batches" not in meta
    ):
        # pre-round-12 flat layout (mode-append writes, no publication
        # gate) — readers could see a crashed append's partial files.
        # Hard error; every caller rebuilds from source on load failure.
        raise IndexFormatError(
            f"signature store {store_dir} uses the legacy flat layout; "
            "rebuild it with save_signature_store (batched, manifest-"
            "gated — the q92k crash-publication contract)"
        )
    if meta["layout"] == "objects":
        return S.live_object_batches(spark, store_dir, "signatures", meta)
    return S.live_batches(spark, store_dir, "signatures", meta["n_batches"])


def append_signatures(
    sig_df: DataFrame, store_dir: str, epoch: str | None = None
) -> int:
    """Append a batch's ACCEPTED signatures to the store under
    ``signatures/batch=N`` and publish it with an atomic manifest
    commit — the ingest commit of the incremental-dedup loop, under the
    same crash-publication contract as the vector (q92k) and LM
    (q157b) stores: a crash after the batch write but before the
    manifest rename leaves an orphan directory every reader ignores
    (``batch < n_batches`` partition pruning), and the next append
    overwrites it.  (Round-12 fix: this previously wrote
    ``mode("append")`` into a flat dir — a crashed append's partial
    files were visible to every reader.)  Returns the new version.

    ``epoch`` (round-14 ADVICE, the streaming-ingest contract): a
    caller-unique marker recorded in the manifest at commit; an append
    whose epoch the manifest ALREADY records is a no-op returning the
    current version — Spark's foreachBatch is at-least-once, and a
    retried micro-batch must not publish its signatures twice.  The
    marker ring keeps the last ``store.EPOCH_RING`` epochs (replays
    only ever target recent epochs), so the manifest stays O(1); all
    three incremental stores share the contract
    (:func:`palletjack_spark.functions.store.epoch_seen`).  Full store
    invariants: STORES.md."""
    from palletjack_spark.errors import IndexFormatError
    from palletjack_spark.functions import store as S

    try:
        meta = S.load_manifest(store_dir, _SIG_META_NAME)
    except (OSError, ValueError) as e:
        raise IndexFormatError(f"not a signature store: {store_dir}") from e
    if meta.get("layout") not in ("batched", "objects") or (
        "n_batches" not in meta
    ):
        raise IndexFormatError(
            f"signature store {store_dir} uses the legacy flat layout; "
            "rebuild it with save_signature_store"
        )
    if S.epoch_seen(meta, epoch):
        return int(meta.get("version", 1))  # replayed epoch: already in
    if meta["layout"] == "objects":
        def bump(m: dict, _slot: int) -> None:
            m["version"] = int(m.get("version", 1)) + 1

        S.cas_append_objects(
            {"signatures": sig_df}, store_dir, _SIG_META_NAME, bump,
            epoch=epoch,
        )
        return int(
            S.load_manifest(store_dir, _SIG_META_NAME).get("version", 1)
        )
    batch = int(meta["n_batches"])
    S.write_batch(sig_df, store_dir, "signatures", batch)
    meta["n_batches"] = batch + 1
    meta["version"] = int(meta.get("version", 1)) + 1
    S.record_epoch(meta, epoch)
    S.commit_manifest(store_dir, _SIG_META_NAME, meta)
    return meta["version"]


def compact_signature_store(spark, store_dir: str) -> dict:
    """Collapse all published signature batches into one ``batch=0``
    (crash-atomic aside-then-promote swap, manifest reset) — symmetric
    with
    :func:`palletjack_spark.functions.similarity.compact_vector_store`
    and :func:`palletjack_spark.functions.text.compact_lm_store`; run
    it when the batch list has grown past read comfort.  (Round-12
    ADVICE: the old rmtree-then-replace sequence had a crash window
    with NO signatures directory and the only copy of the data in a
    temp dir the next compaction deleted — the shared
    :func:`palletjack_spark.functions.store.compact_swap` sets the old
    directory aside until the new one is live and committed.)"""
    from palletjack_spark.functions import store as S

    # compaction is parameter-agnostic: load with the store's OWN
    # minhash params from its manifest (round-13 review: the default
    # k/bands/rows made any non-default store impossible to compact —
    # load_signature_store rejected the store's own parameters)
    meta = S.load_manifest(store_dir, _SIG_META_NAME)
    live = load_signature_store(
        spark,
        store_dir,
        k=meta.get("k", MINHASH_K),
        bands=meta.get("bands", LSH_BANDS),
        rows=meta.get("rows", LSH_ROWS),
    )
    meta["n_batches"] = 1
    meta["version"] = int(meta.get("version", 1)) + 1
    if meta.get("layout") == "objects":
        return S.compact_objects(
            store_dir, _SIG_META_NAME, meta, {"signatures": live}
        )
    S.compact_swap(store_dir, _SIG_META_NAME, meta, {"signatures": live})
    return meta


def incremental_dedup(
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    store_sig: DataFrame,
    threshold_milli: int = 500,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    return_matches: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against a persisted signature store — without
    rescanning the ingested corpus (Q156, the production incremental
    shape: every current batch operator, q91/q101/q106/q153/q154, is
    single-corpus).

    ``return_matches=True`` short-circuits after verification and
    returns ``(matches, new_sig)`` instead — the FULL verified edge
    list (id, pj_oid, jaccard_milli), which is what incremental
    component maintenance consumes (Q101b: ``dup_of`` alone keeps only
    each doc's minimum edge, and components folded from minimum edges
    miss old-component merges that a new doc bridges).

    A new document is REJECTED when it has an exact-Jaccard-verified
    near-dup (``jaccard_milli >= threshold_milli``) in the STORE, or a
    verified near-dup with a SMALLER id within its own batch (the q90
    keep-first discipline — deterministic, order-free, and independent
    of the smaller doc's own verdict, so the rule is a pure function of
    the union corpus).  Returns ``(decisions, accepted_sigs)``:

    - ``decisions``: one row per new doc — (id, accepted,
      dup_of = MIN matching id or -1, jaccard_milli = MAX verified
      milli-Jaccard or -1); plain min/max aggregates keep both columns
      engine-exact.
    - ``accepted_sigs``: the accepted docs' signature rows, ready for
      :func:`append_signatures` — ingest commits signatures, never text.

    Scale shape (batch ≪ store, the whole point): the new batch's
    signatures are zero-shuffle row-local projections, cached once; its
    band table, candidate list, and shingle sets all BROADCAST, so the
    STORE side never exchanges at all — candidate generation and verify
    are map-side joins over one scan each of the store's (narrow) band
    projection and (wide) signature rows, and old×old pairs are never
    generated (the store never self-joins).  The only exchanges in the
    whole plan carry the new batch's own narrow rows."""
    sid = "pj_store_id"
    new_sig = _signatures_one_shuffle(new_df, text_col, id_col, k=k)
    # referenced three times (bands, verify, accepted) — cache the small
    # batch table, never the store
    new_sig = new_sig.localCheckpoint(eager=False)
    bh_new = band_hashes(new_sig, id_col, bands=bands, rows=rows)
    bh_store = band_hashes(
        store_sig.withColumnRenamed(id_col, sid), sid,
        bands=bands, rows=rows,
    )
    cand_store = (
        bh_store.join(F.broadcast(bh_new), ["band", "band_hash"])
        .select(F.col(id_col), F.col(sid).alias("pj_oid"))
    )
    # within-batch keep-first: match strictly-smaller ids only
    a, b = bh_new.alias("a"), bh_new.alias("b")
    cand_new = a.join(
        F.broadcast(b),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
    ).select(F.col(f"a.{id_col}").alias(id_col), F.col(f"b.{id_col}").alias("pj_oid"))
    cand = cand_store.unionByName(cand_new).distinct()

    # verify: the matched side's sets come from store ∪ batch; the
    # candidate list and the batch's sets broadcast into that scan, so
    # the wide store rows stay map-side (the q154 verify discipline)
    sets_other = store_sig.select(
        F.col(id_col).alias("pj_oid"),
        F.col("n_sh").alias("no"),
        F.col("sh_set").alias("oset"),
    ).unionByName(
        new_sig.select(
            F.col(id_col).alias("pj_oid"),
            F.col("n_sh").alias("no"),
            F.col("sh_set").alias("oset"),
        )
    )
    sets_new = new_sig.select(F.col(id_col), "n_sh", "sh_set")
    jm = "(1000 * common) div (n_sh + no - common)"
    matches = (
        sets_other.join(F.broadcast(cand), "pj_oid")
        .join(F.broadcast(sets_new), id_col)
        .select(
            F.col(id_col),
            "pj_oid",
            F.size(F.array_intersect("sh_set", "oset")).cast("long").alias("common"),
            "n_sh",
            "no",
        )
        .select(
            F.col(id_col),
            "pj_oid",
            F.expr(jm).cast("long").alias("jaccard_milli"),
        )
        .where(F.col("jaccard_milli") >= threshold_milli)
    )
    if return_matches:
        return matches, new_sig
    best = matches.groupBy(id_col).agg(
        F.min("pj_oid").alias("dup_of"),
        F.max("jaccard_milli").alias("jaccard_milli"),
    )
    decisions = (
        new_sig.select(id_col)
        .join(F.broadcast(best), id_col, "left")
        .select(
            F.col(id_col),
            F.col("dup_of").isNull().alias("accepted"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long").alias("dup_of"),
            F.coalesce(F.col("jaccard_milli"), F.lit(-1))
            .cast("long")
            .alias("jaccard_milli"),
        )
    )
    accepted_sigs = new_sig.join(
        F.broadcast(best.select(id_col)), id_col, "left_anti"
    )
    return decisions, accepted_sigs


# ---------------------------------------------------------------------------
# Content-defined chunking (Q159)

#: CDC boundary divisor: a token starts a new chunk when its md5 bucket
#: is 0 mod this — expected chunk length ≈ divisor tokens (the FastCDC
#: normalization knobs — min/max chunk bounds — are deliberately absent:
#: they make chunking stateful across the boundary test and cost exactly
#: the SQL-expressibility the oracle needs; the divisor is the plug point).
CDC_DIVISOR = 8


def _cdc_chunks_expr(divisor: int) -> str:
    """Row-local CDC fold: split a token array into chunks at boundary
    tokens (md5 bucket == 0), entirely inside one higher-order
    ``aggregate`` — no window, no shuffle, no Python.  The initial empty
    chunk (when token 1 is itself a boundary) is filtered after."""
    bnd = (
        f"pmod(cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint),"
        f" {divisor}) = 0"
    )
    return f"""
    filter(
      aggregate(
        ts,
        array(cast(array() as array<string>)),
        (acc, x) -> IF({bnd},
          concat(acc, array(array(x))),
          concat(slice(acc, 1, size(acc) - 1),
                 array(concat(element_at(acc, -1), array(x)))))),
      c -> size(c) > 0)
    """


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Content-defined chunking at token granularity (the storage-dedup
    CDC idea — Muthitacharoen et al. 2001 LBFS, FastCDC — applied to
    text): chunk boundaries are a deterministic hash test on the CONTENT,
    so an insertion early in a document shifts only the chunk it lands
    in, where fixed-size windows would shift every downstream chunk.
    Returns (id, chunk_id, chunk_hash, n_toks).

    Scale shape: chunking is a single row-local higher-order fold
    (:func:`_cdc_chunks_expr`) — ZERO exchanges up to here; downstream
    consumers pay one hash exchange on chunk_hash.  No UDF, no window.
    """
    return (
        df.select(
            F.col(id_col),
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias(
                "ts"
            ),
        )
        .select(id_col, F.posexplode(F.expr(_cdc_chunks_expr(divisor))))
        .select(
            id_col,
            F.col("pos").alias("chunk_id"),
            F.md5(F.array_join(F.col("col"), " ")).alias("chunk_hash"),
            F.size(F.col("col")).alias("n_toks"),
        )
    )


def _cdc_bounded_expr(divisor: int, min_len: int, max_len: int) -> str:
    """Row-local FastCDC-normalized fold (the min/max chunk bounds the
    plain divisor test lacks — FastCDC's normalization knobs): a
    boundary token only CLOSES the current chunk once it holds at least
    ``min_len`` tokens, and a chunk is force-cut at ``max_len``
    regardless of content.  Still one higher-order ``aggregate`` — the
    state (current chunk = last element of the accumulator) rides the
    same array, no window, no shuffle, no Python."""
    bnd = (
        f"pmod(cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint),"
        f" {divisor}) = 0"
    )
    cut = (
        f"size(element_at(acc, -1)) >= {max_len}"
        f" OR ({bnd} AND size(element_at(acc, -1)) >= {min_len})"
    )
    return f"""
    filter(
      aggregate(
        ts,
        array(cast(array() as array<string>)),
        (acc, x) -> IF({cut},
          concat(acc, array(array(x))),
          concat(slice(acc, 1, size(acc) - 1),
                 array(concat(element_at(acc, -1), array(x)))))),
      c -> size(c) > 0)
    """


def cdc_chunks_bounded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    divisor: int = CDC_DIVISOR,
    min_len: int = 4,
    max_len: int = 32,
) -> DataFrame:
    """:func:`cdc_chunks` with FastCDC's min/max chunk-length
    normalization (round-12 verdict item: the stateful boundary test
    q159 deliberately omitted for oracle-expressibility — this variant
    rides a rows-only driver row instead, with a hypothesis property
    pin against a pure-Python reference in tests/test_llm.py).

    Exact semantics (the reference implementation mirrors them): walk
    tokens left to right; cut BEFORE token x (x starts a new chunk)
    iff the current chunk already holds ``max_len`` tokens, or x is a
    content boundary (md5 bucket == 0 mod divisor) AND the current
    chunk holds at least ``min_len``.  ``min_len=1, max_len=∞``
    degenerates to :func:`cdc_chunks` exactly (pinned in tests).

    Bounded chunks fix CDC's two tails: pathological boundary-dense
    text can't shred into tiny chunks (min), boundary-free text can't
    produce unbounded chunks (max) — at 100 TB the max bound is what
    keeps a chunk row's size, and therefore executor memory per row,
    bounded.  Returns (id, chunk_id, chunk_hash, n_toks); same
    zero-exchange scale shape as :func:`cdc_chunks`."""
    if min_len < 1 or max_len < min_len:
        raise ValueError(
            f"cdc_chunks_bounded needs 1 <= min_len <= max_len; got "
            f"({min_len}, {max_len})"
        )
    return (
        df.select(
            F.col(id_col),
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias(
                "ts"
            ),
        )
        .select(
            id_col,
            F.posexplode(F.expr(_cdc_bounded_expr(divisor, min_len, max_len))),
        )
        .select(
            id_col,
            F.col("pos").alias("chunk_id"),
            F.md5(F.array_join(F.col("col"), " ")).alias("chunk_hash"),
            F.size(F.col("col")).alias("n_toks"),
        )
    )


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Per-document CDC duplication profile: how much of each document is
    made of chunks that occur ≥2 times in the corpus (within-doc repeats
    count — a doc that repeats its own paragraph is duplicated content).
    Returns (id, n_chunks, n_dup_chunks, dup_ratio_milli) — the milli
    ratio is integer (q91's exact-milli discipline), the per-doc
    aggregation exact under any fold order.

    Scale shape: one exchange on chunk_hash for the global frequency
    table (map-side combined), one co-partitioned join back on the same
    key, one final per-doc hash aggregate."""
    chunks = cdc_chunks(df, text_col, id_col, divisor)
    freq = chunks.groupBy("chunk_hash").agg(F.count("*").alias("cnt"))
    return (
        chunks.join(freq, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("cnt") >= 2).cast("long")).alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_ratio_milli",
            F.expr("1000 * n_dup_chunks div n_chunks"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental connected components (Q101b)


def batch_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_milli: int = 500,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Exhaustive banded + exact-milli-verified near-dup pairs WITHIN one
    corpus — the store-build sibling of :func:`incremental_dedup`'s
    matches, using byte-identical signatures, banding, and the integer
    milli-Jaccard verify, so edges built here and edges found
    incrementally later describe the same graph.  Returns
    (id_a, id_b, jaccard_milli) with id_a > id_b.  (Unlike
    :func:`minhash_lsh_pairs` there is no hot-bucket chain guard — this
    feeds component STORES, where the q156 fixture discipline bounds
    corpus shape; use minhash_lsh_pairs for open-web corpora.)"""
    sig = _signatures_one_shuffle(df, text_col, id_col, k=k).localCheckpoint(
        eager=False
    )
    bh = band_hashes(sig, id_col, bands=bands, rows=rows)
    a, b = bh.alias("a"), bh.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        F.col("n_sh").alias("na"),
        F.col("sh_set").alias("aset"),
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        F.col("n_sh").alias("nb"),
        F.col("sh_set").alias("bset"),
    )
    jm = "(1000 * common) div (na + nb - common)"
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("aset", "bset"))
            .cast("long")
            .alias("common"),
            "na",
            "nb",
        )
        .select(
            "id_a",
            "id_b",
            F.expr(jm).cast("long").alias("jaccard_milli"),
        )
        .where(F.col("jaccard_milli") >= threshold_milli)
    )


def incremental_components(
    matches: DataFrame,
    old_labels: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fold a new batch's verified match edges into PERSISTED component
    labels without rescanning the ingested corpus (Q101b) — the
    clustering step that keeps q156's incremental dedup consistent with
    q101's batch clustering.  ``matches`` is
    :func:`incremental_dedup`'s ``return_matches`` output
    (id, pj_oid, ...); ``old_labels`` is (node, component) with
    component = the component's minimum node id (q101's canonical
    form).  Returns the updated (node, component) table over every node
    that appears in any edge, old or new.

    The graph-contraction trick: endpoints map through their OLD labels
    (unlabeled endpoints map to themselves), so the CC loop runs on the
    CONTRACTED graph — super-nodes are old component ids plus new doc
    ids, i.e. O(new edges), NOT O(corpus).  Because old labels are
    component minima, the contracted CC's min-reachable labels compose
    to the union graph's global minima — incremental ≡ batch recompute,
    which the q101b oracle pins.  Scale shape: two id-only hash joins
    map endpoints, the contracted CC is q101's bounded loop on a tiny
    edge set, and the final label updates are one join per side; the
    corpus text is never touched."""
    edges = matches.select(
        F.col(id_col).alias("a"), F.col("pj_oid").alias("b")
    )
    la = old_labels.select(
        F.col("node").alias("a"), F.col("component").alias("ca")
    )
    lb = old_labels.select(
        F.col("node").alias("b"), F.col("component").alias("cb")
    )
    contracted = (
        edges.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("ca", "a").alias("id_a"),
            F.coalesce("cb", "b").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    mapping = connected_components(contracted).select(
        F.col("node").alias("super"), F.col("component").alias("newc")
    )
    updated_old = (
        old_labels.join(
            mapping.withColumnRenamed("super", "component"), "component", "left"
        )
        .select(
            "node", F.coalesce("newc", "component").alias("component")
        )
    )
    new_nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
        .join(old_labels.select("node"), "node", "left_anti")
    )
    labeled_new = (
        new_nodes.join(
            mapping.withColumnRenamed("super", "node"), "node", "left"
        )
        .select("node", F.coalesce("newc", "node").alias("component"))
    )
    return updated_old.unionByName(labeled_new)


def append_signatures_concurrent(
    sig_df: DataFrame, store_dir: str, claims=None, epoch: str | None = None
) -> int:
    """Multi-writer :func:`append_signatures` (round-13): concurrent
    crawl-ingest jobs appending to ONE signature store compose safely —
    each append stages to a unique dir, claims the next batch slot
    through the store's :class:`~palletjack_spark.functions.store.
    ClaimBackend` (O_EXCL files by default, conditional PUT on an
    object store via ``claims=``), and commits the manifest under the
    claim (:func:`palletjack_spark.functions.store.cas_append`).  The
    single-writer :func:`append_signatures` stays the default (one
    fewer filesystem round-trip per append); use this from parallel
    ingest drivers.  Returns the slot the batch published as, or
    ``-1`` when ``epoch`` was already recorded (a replayed
    micro-batch — nothing published)."""
    from palletjack_spark.errors import IndexFormatError
    from palletjack_spark.functions import store as S

    try:
        meta = S.load_manifest(store_dir, _SIG_META_NAME)
    except (OSError, ValueError) as e:
        raise IndexFormatError(f"not a signature store: {store_dir}") from e
    if meta.get("layout") not in ("batched", "objects") or (
        "n_batches" not in meta
    ):
        raise IndexFormatError(
            f"signature store {store_dir} uses the legacy flat layout; "
            "rebuild it with save_signature_store"
        )

    def bump(m: dict, _slot: int) -> None:
        m["version"] = int(m.get("version", 1)) + 1

    if meta["layout"] == "objects":
        return S.cas_append_objects(
            {"signatures": sig_df},
            store_dir,
            _SIG_META_NAME,
            bump,
            claims=claims,
            epoch=epoch,
        )
    return S.cas_append(
        sig_df,
        store_dir,
        _SIG_META_NAME,
        "signatures",
        bump,
        claims=claims,
        epoch=epoch,
    )
