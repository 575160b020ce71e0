"""Iterative graph primitives that run to a data-dependent fixpoint.

The declared bench queries pin finite unrollings for oracle
determinism (q140 = 3 k-core rounds, q130 = 2 PageRank rounds); this
module holds the loop-to-convergence forms — the q101
connected-components discipline (localCheckpoint per round to cut
lineage, one bounded driver scalar per round to test the stop
condition) applied to the peeling family."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kcore_peel(
    edges: DataFrame, k: int, max_rounds: int | None = None
) -> tuple[DataFrame, int]:
    """Peel the undirected edge list (columns ``u``, ``v``) to its
    k-core: repeatedly drop nodes of degree < k and their incident
    edges until no node changes (``max_rounds=None``) or the round
    budget runs out.  Returns ``(core_edges, rounds_run)``.

    Each round is one union+hash-aggregate exchange for degrees plus
    two LEFT SEMI ``shuffle_hash`` joins for the survivor filter (never
    a broadcast — the survivor set is O(nodes)), then a localCheckpoint
    so round r+1 plans from materialized data.  The stop test is a
    single count() per round — peeling strictly shrinks the edge set
    until the fixpoint, so equal counts imply convergence (the filter
    can only remove rows), and the loop terminates in at most
    |nodes| rounds.
    """
    # late import: analytics imports this module's caller-side helpers
    from palletjack_spark.queries.analytics import _kcore_round

    cur = edges.localCheckpoint()
    n_edges = cur.count()
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        nxt = _kcore_round(cur, k).localCheckpoint()
        n_next = nxt.count()
        rounds += 1
        if n_next == n_edges:
            return nxt, rounds  # nothing removed: fixpoint reached
        cur, n_edges = nxt, n_next
        if n_edges == 0:
            return cur, rounds
    return cur, rounds


def kcore_nodes(core_edges: DataFrame) -> DataFrame:
    """(node, deg) over a peeled edge set — q140's output shape."""
    return (
        core_edges.select(F.col("u").alias("node"))
        .unionAll(core_edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def pagerank_converge(
    edges: DataFrame,
    nodes: DataFrame,
    tol: int = 1_000_000,
    max_rounds: int | None = None,
) -> tuple[DataFrame, int]:
    """Run Q130's damped integer power iteration to a data-dependent
    fixpoint: iterate until the largest per-node rank change is
    ``<= tol`` trillionths (or the round budget runs out).  Returns
    ``(ranks, rounds_run)``.

    ``edges`` must carry (src, dst, deg) and ``nodes`` (node) — the
    shapes :func:`palletjack_spark.queries.analytics._pagerank_graph`
    produces.  Each round is the same single edges⋈ranks hash join +
    per-node aggregate as the declared 2-round q130, localCheckpointed
    to cut lineage; the stop test is one bounded MAX(|Δrank|) scalar
    per round.  Damping contracts real-valued PageRank by 0.85/round,
    so Δ falls below any tol > the integer-truncation noise floor
    (±in-degree quantums per node) in O(log(Δ0/tol)) rounds — tol=0
    is NOT guaranteed to terminate (truncation can oscillate inside
    the noise band), which is why the default is a relative 1e-6 of
    the 1e12 total rank mass."""
    from palletjack_spark.queries.analytics import _pagerank_round

    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph: empty ranks, not a driver ZeroDivisionError
        # (round-13 review; kcore_peel already handles empty input)
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    base = 1_000_000_000_000 // n_nodes
    teleport = 150_000_000_000 // n_nodes
    ranks = nodes.withColumn("rank", F.lit(base)).localCheckpoint()
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        nxt = _pagerank_round(edges, nodes, ranks, teleport).localCheckpoint()
        rounds += 1
        delta = (
            nxt.withColumnRenamed("rank", "r_new")
            .join(ranks, "node")
            .agg(F.max(F.abs(F.col("r_new") - F.col("rank"))).alias("d"))
            .first()["d"]
        )
        ranks = nxt
        if delta is None or delta <= tol:
            return ranks, rounds
    return ranks, rounds


def symmetric_closure(edges: DataFrame) -> DataFrame:
    """Undirected view of a directed (src, dst) edge table: both
    directions, deduplicated.  One exchange (the distinct)."""
    return (
        edges.select("src", "dst")
        .union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )


def _lpa_round(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous label-propagation round: every node takes the most
    frequent label among its neighbors, ties broken by SMALLEST label
    (deterministic under any partitioning).

    Scale shape: one und⋈labels hash join on src ships each neighbor's
    label to dst; the (node, label) count is a hash aggregate with
    map-side partial combine, and the per-node argmax is
    ``min(struct(-cnt, label))`` — not a row_number window, so no
    WindowExec memory at billion-node scale.  Note (r17 plan audit):
    struct-min plans as a SortAggregate, i.e. a PARTITION-LOCAL sort of
    the already-aggregated (node, label) table — no extra exchange, and
    the input is one row per distinct neighbor label, not per edge.  A
    bigint pack (the q153 trick) would restore the hash aggregate but
    needs cnt×label to fit one int64, which a billion-node graph with
    high-degree hubs cannot guarantee; the local sort is the safer
    trade."""
    cnt = (
        und.join(labels, und["src"] == labels["node"])
        .groupBy(und["dst"].alias("n"), F.col("label"))
        .agg(F.count("*").alias("cnt"))
    )
    return cnt.groupBy("n").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("label"))).getField(
            "label"
        ).alias("label")
    ).withColumnRenamed("n", "node")


def label_propagation(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) for a FIXED
    number of rounds over the symmetric closure of ``edges``: labels
    start as node ids; each round every node adopts its neighbors'
    majority label (min-label tie-break).  Returns (node, label).

    The fixed-round form exists so an oracle can unroll it as finite
    SQL (the q130 discipline); synchronous LPA on bipartite structure
    can 2-cycle rather than converge, which is also why production runs
    bound rounds.  The closure is localCheckpointed once (reused every
    round); each round's labels are checkpointed to cut lineage."""
    und = symmetric_closure(edges).localCheckpoint()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(rounds):
        labels = _lpa_round(und, labels).localCheckpoint()
    return labels


def label_propagation_converge(
    edges: DataFrame, max_rounds: int = 20
) -> tuple[DataFrame, int]:
    """Run LPA until no label changes (or the round budget runs out).
    Returns ``(labels, rounds_run)``.  The stop test is one bounded
    COUNT of changed labels per round — same discipline as
    :func:`pagerank_converge`.  ``max_rounds`` is load-bearing:
    synchronous LPA is not guaranteed to converge (bipartite regions
    oscillate with period 2), so the budget is the termination proof."""
    und = symmetric_closure(edges).localCheckpoint()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    rounds = 0
    while rounds < max_rounds:
        nxt = _lpa_round(und, labels).localCheckpoint()
        rounds += 1
        changed = (
            nxt.withColumnRenamed("label", "l_new")
            .join(labels, "node")
            .where(F.col("l_new") != F.col("label"))
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    return labels, rounds
