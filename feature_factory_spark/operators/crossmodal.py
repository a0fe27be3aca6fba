"""Cross-modal duplicate survivorship at the page grain.

The reference has no multimodal operators (SURVEY.md §2.3); this is the
beyond-reference policy layer a mixed-media corpus needs. Production
curation computes near-dup PAIRS independently per modality — text
MinHash/SimHash (operators/dedup.py), image pHash (operators/
imagehash.py), audio fingerprints (operators/audiohash.py), video
signatures (operators/videohash.py) — but the drop decision is made per
PAGE: a page whose text matches page A and whose image matches page B
belongs to ONE transitive duplicate cluster spanning both signals, and
exactly one member of that cluster should survive.

Design: union the per-modality pair frames (each already bucketed /
LSH-blocked by its producer — this layer never generates pairs itself,
so it inherits the producers' never-cartesian guarantees), run the
existing distributed connected components (functions/graph.py — one
join + one groupBy per iteration, diameter-bounded), and keep one
survivor per component. The union is edge-count-sized (near-dup graphs
are sparse: pairs ≪ pages), so the added cost over single-modality
dedup is one CC run over the merged edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.graph import connected_components
from ..pipeline import Transformer
from ..validation import ensure, validate_columns


class CrossModalDeduplicator(Transformer):
    """One-survivor-per-cluster dedup across per-modality pair frames.

    ``signals`` maps a signal name (``'text'``, ``'image'``, ...) to a
    duplicate-pair frame at the page grain — any frame with ``a_col``/
    ``b_col`` id columns, e.g. the ``candidate_pairs()`` output of
    MinHashDeduplicator / ImageDeduplicator / AudioDeduplicator /
    VideoDeduplicator (extra columns such as scores are ignored).

    Survivor policy:

    - ``'min_id'`` (default): keep each cluster's minimum id — the
      component representative, deterministic with no extra data, and
      exactly the single-modality ``policy='components'`` semantics
      generalized to the merged graph.
    - ``'priority'``: keep the cluster row with the LARGEST
      ``priority_col`` value in the transformed frame (ties broken by
      smallest id) — e.g. keep the longest or highest-quality page.
      Cluster members absent from the transformed frame simply don't
      compete.

    Stateless: the pair frames are inputs, not fitted state, so the
    operator composes in a Pipeline like the other stateless gates.
    ``transform(df)`` drops every non-survivor; pages in no cluster
    always survive.
    """

    def __init__(
        self,
        id_col: str,
        signals: dict[str, DataFrame],
        policy: str = "min_id",
        priority_col: str | None = None,
        a_col: str = "a_id",
        b_col: str = "b_id",
        max_iterations: int = 15,
    ):
        ensure(bool(signals), "signals must map at least one name to a pair frame")
        ensure(
            policy in ("min_id", "priority"),
            "policy: 'min_id' or 'priority'",
        )
        ensure(
            policy != "priority" or priority_col is not None,
            "policy='priority' requires priority_col",
        )
        for name, pairs in signals.items():
            validate_columns(pairs, [a_col, b_col])
        self.id_col = id_col
        self.signals = dict(signals)
        self.policy = policy
        self.priority_col = priority_col
        self.a_col = a_col
        self.b_col = b_col
        self.max_iterations = max_iterations

    def is_stateful(self) -> bool:
        return False

    def _check_input(self, df: DataFrame) -> None:
        cols = [self.id_col]
        if self.policy == "priority":
            cols.append(self.priority_col)
        validate_columns(df, cols)

    def _edges(self) -> DataFrame:
        """(a_id, b_id, signal) — the merged cross-modal edge set."""
        parts = [
            pairs.select(
                F.col(self.a_col).alias("a_id"),
                F.col(self.b_col).alias("b_id"),
                F.lit(name).alias("signal"),
            )
            for name, pairs in sorted(self.signals.items())
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def clusters(self) -> DataFrame:
        """(node, component, signals) for every page in any pair frame:
        the transitive cluster label plus the sorted set of signal
        names whose pair frames touch the node — the provenance a
        curation audit reads ("dropped because text AND image dup")."""
        edges = self._edges()
        comp = connected_components(
            edges, "a_id", "b_id", max_iterations=self.max_iterations
        )
        touched = (
            edges.select(F.col("a_id").alias("node"), "signal")
            .unionByName(edges.select(F.col("b_id").alias("node"), "signal"))
            .groupBy("node")
            .agg(F.array_sort(F.collect_set("signal")).alias("signals"))
        )
        return comp.join(touched, "node")

    def _transform(self, df: DataFrame) -> DataFrame:
        comp = connected_components(
            self._edges(), "a_id", "b_id", max_iterations=self.max_iterations
        )
        if self.policy == "min_id":
            dups = comp.where(F.col("node") != F.col("component")).select(
                F.col("node").alias("__cm_dup")
            )
            return df.join(
                dups, on=df[self.id_col] == dups["__cm_dup"], how="left_anti"
            )
        # priority: rank cluster members PRESENT IN df by priority desc,
        # id asc; rank 1 survives. Pages outside any cluster (left join
        # misses) survive unconditionally — their window key falls back
        # to their OWN id, so each is a singleton partition rather than
        # one shared NULL partition (which would funnel nearly the whole
        # corpus through a single window task at scale).
        labeled = df.join(
            comp.select(
                F.col("node").alias("__cm_node"),
                F.col("component").alias("__cm_comp"),
            ),
            on=df[self.id_col] == F.col("__cm_node"),
            how="left",
        )
        key = F.coalesce(
            F.concat(F.lit("c:"), F.col("__cm_comp").cast("string")),
            F.concat(F.lit("s:"), df[self.id_col].cast("string")),
        )
        w = Window.partitionBy(key).orderBy(
            F.desc(self.priority_col), F.asc(self.id_col)
        )
        return (
            labeled.withColumn("__cm_rank", F.row_number().over(w))
            .where(F.col("__cm_rank") == 1)
            .drop("__cm_node", "__cm_comp", "__cm_rank")
        )
