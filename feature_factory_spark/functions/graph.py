"""Distributed connected components over a pair (edge) frame.

Used by the dedup operators to turn verified near-dup PAIRS into
duplicate CLUSTERS: with pairs (1,5),(3,5) the greedy smaller-id policy
keeps both 1 and 3, but they belong to one transitive cluster whose
canonical representative is 1. Min-label propagation fixes that.

Algorithm: iterative min-label propagation (the simple variant of
large-star/small-star map-reduce connected components). Each iteration
is one join + one aggregate (two shuffles); convergence is checked with
a driver-side count action. Near-dup graphs have tiny diameters (usually
<= 3), so this converges in a handful of rounds; ``max_iterations``
bounds the worst case.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import FeatureFactoryError

# Edge-count gate below which connected components runs as union-find
# on the driver instead of iterative label propagation. Dedup pair
# graphs are VERIFIED near-duplicate pairs — usually orders of
# magnitude smaller than the corpus — and each propagation round costs
# two shuffles plus a convergence action, so a tiny graph pays ~1 s of
# pure scheduling per round for work a driver loop finishes in
# microseconds. The gate bounds driver memory by construction
# (100k edges is a few MB), independent of data scale: bigger graphs
# keep the distributed path. Env-tunable for other deployments.
_DRIVER_EDGE_CAP = int(os.environ.get("FF_CC_DRIVER_EDGES", "100000"))

# Same idea for fixed-iteration PageRank: below this many (distinct,
# null-free) edges the power iteration runs as a driver loop instead of
# two shuffles per round. Env-tunable; bounds driver memory by
# construction.
_PR_DRIVER_EDGE_CAP = int(os.environ.get("FF_PR_DRIVER_EDGES", "100000"))


def _pagerank_driver(spark, edge_rows, node_type, damping, iterations):
    """Driver twin of the fixed-iteration, dangling-free power loop:
    same init (1/n), same per-round rank = base + damping * contrib
    with contrib accumulated in deterministic (src, dst) order. Returns
    the (node, rank) frame in one slice (model-sized by the gate)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from ..validation import ensure

    edges = sorted({(r["src"], r["dst"]) for r in edge_rows})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    ensure(len(nodes) > 0, "edge frame contains no nodes")
    n = len(nodes)
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = dict.fromkeys(nodes, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib: dict = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0.0) + rank[s] / outdeg[s]
        rank = {
            v: base + damping * contrib.get(v, 0.0) for v in nodes
        }
    from .frames import one_slice_frame

    schema = StructType([
        StructField("node", node_type),
        StructField("rank", DoubleType()),
    ])
    return one_slice_frame(
        spark, [(v, rank[v]) for v in nodes], schema
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 15,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component
    is the minimum node id reachable through the pair graph.

    Raises FeatureFactoryError if labels have not converged after
    ``max_iterations`` rounds (graph diameter exceeds the cap): an
    unconverged result would silently keep several "representatives"
    per true cluster, i.e. let duplicates survive dedup. Raise the cap
    for pathological chain-shaped graphs."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # every iteration's join + convergence count re-reads the edge
        # frame; persist once, release before returning
        .persist()
    )
    # the count both materializes the persisted edges (the first
    # iteration paid that job anyway) and gates the small-graph path
    n_edges = edges.count()
    if n_edges <= _DRIVER_EDGE_CAP:
        return _driver_components(edges)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for it in range(max_iterations):
        # label(n) <- min(label(n), min over neighbors of label(neighbor))
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nb_min"), F.col("component"))
                ).alias("component"),
                # carry whether this round lowered the label, so the
                # convergence check below is a filter-count on THIS
                # frame — not a second labels join (one fewer shuffle
                # per iteration)
                (
                    F.coalesce(F.col("nb_min"), F.col("component"))
                    < F.col("component")
                ).alias("__ff_changed"),
            )
        )
        if (it + 1) % 3 == 0:
            # truncate the lineage every few rounds: each iteration nests
            # the previous plan inside a join, and on high-diameter graphs
            # the growing tree dominates planning time long before the
            # iteration cap does
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = new_labels.where(F.col("__ff_changed")).count()
        labels.unpersist()
        labels = new_labels.drop("__ff_changed")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise FeatureFactoryError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the cap); raise "
            "max_iterations"
        )
    edges.unpersist()
    return labels


def _driver_components(edges: DataFrame) -> DataFrame:
    """(node, component) via union-find on collected edges — the
    small-graph path behind the ``_DRIVER_EDGE_CAP`` gate. Semantics
    identical to the propagation loop: component is the minimum node
    reachable. Python and Spark order integers identically, and UTF-8
    byte order equals code-point order, so string-id minima agree
    too."""
    from pyspark.sql.types import StructField, StructType

    from .frames import local_frame

    node_type = edges.schema["src"].dataType
    rows = edges.collect()
    edges.unpersist()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        s, d = r["src"], r["dst"]
        for v in (s, d):
            if v not in parent:
                parent[v] = v
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rd] = rs
    comp_min: dict = {}
    for v in parent:
        root = find(v)
        if root not in comp_min or v < comp_min[root]:
            comp_min[root] = v
    out = sorted((v, comp_min[find(v)]) for v in parent)
    schema = StructType([
        StructField("node", node_type),
        StructField("component", node_type),
    ])
    return local_frame(edges.sparkSession, out, schema)


def duplicate_ids(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """ids to DROP so that each transitive duplicate cluster keeps exactly
    its minimum-id representative. One column: ``dup_id``."""
    comp = connected_components(pairs, a_col, b_col)
    return comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("dup_id")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    handle_dangling: bool = True,
    checkpoint_dir: str | None = None,
    tol: float | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge frame — the
    domain-authority signal crawl-curation pipelines rank hosts by
    (e.g. harmonic-centrality / rank filters in public web-corpus
    builds). Returns (node, rank); ranks sum to 1.0 up to float
    rounding.

    Standard power iteration (Page et al. 1999): every node starts at
    1/n; each round a node keeps (1-d)/n plus d times the rank mass its
    in-neighbors spread over their out-degrees, plus its share of the
    dangling-node mass (nodes with no out-edges redistribute
    uniformly). ``iterations`` is FIXED by default so results are
    deterministic and recomputable in plain SQL (an unrolled-CTE
    oracle twin). Pass ``tol`` to ALSO stop early once the L1 rank
    delta (sum |rank_t - rank_{t-1}|, one extra join+aggregate per
    round, only when requested) drops below it — on a fast-mixing
    100 TB web graph that saves the tail rounds a fixed budget wastes;
    ``iterations`` then acts as the hard cap.

    Scale shape: per iteration ONE join of the rank frame onto the
    out-degree-annotated edge list + one groupBy(dst) aggregate — the
    same two-shuffle round as connected_components; the rank frame is
    (node, rank), never materialized on the driver (only the scalar
    dangling mass is collected each round). Iterations are a fixed
    small constant, so the total work is O(iterations x |E|) with
    AQE-planned shuffles.

    Lineage control: by default each round truncates lineage with a
    LOCAL checkpoint — fast, but local checkpoints are not
    fault-tolerant on a real cluster (losing an executor loses the
    truncated blocks and the job must restart from the top of the
    iteration loop). For long runs on preemptible nodes pass
    ``checkpoint_dir`` (an HDFS/object-store path): the rank frame is
    then reliably checkpointed there each round and iteration state
    survives executor loss. Use ``rank_mass(ranks)`` after a
    ``handle_dangling=False`` run to verify no mass leaked.
    """
    from ..validation import ensure

    ensure(0.0 < damping < 1.0, "damping must be in (0,1)")
    ensure(iterations >= 1, "iterations must be >= 1")
    ensure(tol is None or tol > 0.0, "tol must be > 0 when given")
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull()).distinct()
    # Small-graph gate (the connected_components driver union-find
    # precedent): a fixed-iteration, dangling-free run over a bounded
    # edge list costs 2 shuffles per round of pure scheduling for
    # arithmetic a driver loop finishes in microseconds. The driver
    # twin applies the IDENTICAL IEEE ops in the identical association
    # — rank = (base) + (damping * contrib), contrib accumulated as
    # running double adds — so for in-degree <= 2 graphs (every
    # per-node sum has at most two commutable terms) the ranks are
    # bit-identical to the distributed aggregate; larger in-degrees
    # can differ from a distributed partial-aggregation order by last
    # ulps, exactly as two cluster layouts can differ from each other.
    # Gated to the fixed-budget, no-dangling, no-checkpoint shape so
    # the early-stop and reliable-checkpoint contracts keep their
    # distributed semantics; the cap bounds driver memory by
    # construction (100k edges is a few MB) independent of data scale.
    if (
        tol is None
        and not handle_dangling
        and checkpoint_dir is None
    ):
        capped = e.limit(_PR_DRIVER_EDGE_CAP + 1).collect()
        if len(capped) <= _PR_DRIVER_EDGE_CAP:
            return _pagerank_driver(
                edges.sparkSession, capped, e.schema["src"].dataType,
                damping, iterations,
            )
        # over the gate: fall through to the distributed loop (the
        # collected prefix is discarded; the distinct frame recomputes)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    ensure(n > 0, "edge frame contains no nodes")
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    links = e.join(outdeg, "src").persist()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    prev = ranks
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            links.join(ranks, links["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass: rank held by nodes with no out-edges, spread
        # uniformly — ONE scalar to the driver per round.
        # handle_dangling=False skips the per-round collect for graphs
        # KNOWN to give every node an out-edge (rank mass silently
        # leaks if that assumption is wrong — ranks then sum below 1)
        if handle_dangling:
            dangling = (
                ranks.join(
                    outdeg, ranks["node"] == outdeg["src"], "left_anti"
                )
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
            share = damping * dangling / n
        else:
            share = 0.0
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base + share)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # keep the lineage shallow: each round's frame feeds the next.
        # Reliable checkpoint when a dir was given (survives executor
        # loss); otherwise a local checkpoint (fast, not fault-tolerant).
        if checkpoint_dir is not None:
            ranks = ranks.checkpoint(eager=True)
        else:
            ranks = ranks.localCheckpoint(eager=tol is not None)
        if tol is not None:
            delta = float(
                ranks.alias("new")
                .join(prev.alias("old"), "node")
                .agg(
                    F.sum(F.abs(F.col("new.rank") - F.col("old.rank")))
                ).collect()[0][0]
                or 0.0
            )
            if delta < tol:
                break
        prev = ranks
    # Materialize the final frame BEFORE dropping the cached inputs it
    # was built from — otherwise the caller's first action recomputes
    # the edge distinct + out-degree join once per iteration uncached.
    # (When checkpoint_dir was given the last round already eagerly
    # materialized to reliable storage.)
    if checkpoint_dir is None:
        ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    links.unpersist()
    return ranks


def rank_mass(ranks: DataFrame, rank_col: str = "rank") -> float:
    """Total rank mass of a ``pagerank`` result — ONE scalar aggregate.

    A correct run sums to 1.0 up to float rounding; a
    ``handle_dangling=False`` run over a graph that DOES have dangling
    nodes sums below 1 (the mass those nodes held each round was
    dropped). Cheap self-check for callers who skipped the per-round
    dangling collect."""
    return float(ranks.agg(F.sum(rank_col)).collect()[0][0] or 0.0)
