"""PropGraph: directed property graph with typed vertex/edge attributes.

Reference: /root/reference/arachne/client/arachne/propgraphclass.py —
``load_edge_attributes`` (385-498: dedup on (src,dst), drop self-loops,
build DiGraph, attach typed columns), ``load_node_attributes`` (190-288),
``add_node_labels`` (99-188), getters (500-558), ``filter_edges`` (560-597)
and ``subgraph_view`` (599-649). Server-side sparse attribute storage
(BuildPropertyGraph.chpl:114-235) maps to plain nullable columns.

Spark-first: attributes are just columns on two DataFrames keyed by the
original labels; "Categorical" encoding is unnecessary (Parquet dictionary
encoding does it at the storage layer). Filters are Spark Column
predicates or callables DataFrame→Column — the vectorized replacement for
the reference's boolean-mask callables (input_hint: no per-row Python).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph import DiGraph


def _dedup_first_of_group(
    df: DataFrame, keys: list[str], attr_cols: list[str]
) -> DataFrame:
    """One deterministic representative row per key group: min over the
    struct of all attribute columns (partition-invariant, unlike
    ``F.first``). Mirrors the reference's first-of-sorted-GroupBy
    determinism (propgraphclass.py:425-428)."""
    if not attr_cols:
        return df.select(*keys).distinct()
    agg = df.groupBy(*keys).agg(F.min(F.struct(*attr_cols)).alias("_rep"))
    return agg.select(
        *keys, *[F.col("_rep").getField(c).alias(c) for c in attr_cols]
    )


class PropGraph(DiGraph):
    """Directed property graph (reference: PropGraph inherits DiGraph)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.edge_attributes: DataFrame | None = None
        self.node_attributes: DataFrame | None = None
        self._relationship_columns: list[str] = []
        self._label_columns: list[str] = []

    # -- loading -------------------------------------------------------------
    @classmethod
    def from_edge_attributes(
        cls,
        df: DataFrame,
        source_column: str,
        destination_column: str,
        relationship_columns: Sequence[str] | None = None,
        num_partitions: int | None = None,
    ) -> "PropGraph":
        """propgraphclass.py:385-498: dedup on (src,dst) keeping the first
        row's attributes, drop self-loops, build the DiGraph."""
        spark = df.sparkSession
        named = df.withColumnRenamed(source_column, "src").withColumnRenamed(
            destination_column, "dst"
        )
        named = named.filter(F.col("src") != F.col("dst"))
        # keep one attribute row per (src,dst) — the reference keeps the first
        # row of a *sorted* GroupBy (propgraphclass.py:425-428), i.e. a
        # deterministic representative. F.first() in Spark is task-order
        # dependent, so take min over the struct of all attribute columns:
        # partition-invariant and run-to-run stable.
        attr_cols = [c for c in named.columns if c not in ("src", "dst")]
        dedup = _dedup_first_of_group(named, ["src", "dst"], attr_cols)
        base = DiGraph.from_edges(
            spark,
            dedup.select(
                F.col("src").cast("long"), F.col("dst").cast("long"), F.lit(1.0).alias("weight")
            ),
            num_partitions=num_partitions,
        )
        g = cls(
            base.edges,
            base.vertices,
            weighted=False,
            num_partitions=base.num_partitions,
        )
        g.edge_attributes = dedup.persist()
        g._relationship_columns = list(relationship_columns or [])
        return g

    def load_node_attributes(
        self,
        df: DataFrame,
        node_column: str,
        label_columns: Sequence[str] | None = None,
    ) -> None:
        """propgraphclass.py:190-288 (dedup per node, first row wins)."""
        named = df.withColumnRenamed(node_column, "nodes")
        attr_cols = [c for c in named.columns if c != "nodes"]
        self.node_attributes = _dedup_first_of_group(
            named, ["nodes"], attr_cols
        ).persist()
        self._label_columns = list(label_columns or [])

    def add_node_labels(self, df: DataFrame, node_column: str) -> None:
        """propgraphclass.py:99-188 — every non-key column is a label.
        Incoming rows are deduplicated per node (reference GroupBy,
        propgraphclass.py:175-179) so the one-row-per-node invariant
        holds; a label column colliding with an existing attribute column
        raises upfront instead of creating an ambiguous duplicate."""
        labels = [c for c in df.columns if c != node_column]
        if self.node_attributes is None:
            self.load_node_attributes(df, node_column, label_columns=labels)
        else:
            clash = set(labels) & {
                c for c in self.node_attributes.columns if c != "nodes"
            }
            if clash:
                raise ValueError(f"label columns already present: {sorted(clash)}")
            named = _dedup_first_of_group(
                df.withColumnRenamed(node_column, "nodes"), ["nodes"], labels
            )
            self.node_attributes = self.node_attributes.join(named, "nodes", "left")
            self._label_columns += labels

    def add_edge_relationships(self, df: DataFrame, source_column: str, destination_column: str) -> None:
        """propgraphclass.py:290-383 — join relationship columns onto the
        existing edge attribute table by (src, dst). Incoming rows are
        deduplicated per edge and self-loops dropped (the reference's
        GroupBy at propgraphclass.py:366-371), preserving the
        one-row-per-edge invariant from_edge_attributes establishes."""
        named = (
            df.withColumnRenamed(source_column, "src")
            .withColumnRenamed(destination_column, "dst")
            .filter(F.col("src") != F.col("dst"))
        )
        rels = [c for c in named.columns if c not in ("src", "dst")]
        named = _dedup_first_of_group(named, ["src", "dst"], rels)
        if self.edge_attributes is None:
            self.edge_attributes = named
        else:
            self.edge_attributes = self.edge_attributes.join(named, ["src", "dst"], "left")
        self._relationship_columns += rels

    def unpersist(self) -> None:
        """Release the base tables AND the persisted attribute tables
        (Graph.unpersist only knows edges/vertices/degrees)."""
        super().unpersist()
        for df in (self.edge_attributes, self.node_attributes):
            if df is not None:
                df.unpersist()

    # -- getters (propgraphclass.py:500-558) ----------------------------------
    def get_edge_attributes(self) -> DataFrame:
        return self.edge_attributes

    def get_node_attributes(self) -> DataFrame:
        return self.node_attributes

    def get_edge_relationships(self) -> DataFrame:
        return self.edge_attributes.select("src", "dst", *self._relationship_columns)

    def get_node_labels(self) -> DataFrame:
        return self.node_attributes.select("nodes", *self._label_columns)

    # -- queries ---------------------------------------------------------------
    def filter_edges(
        self, node_types: Mapping[str, list], edge_types: Mapping[str, list]
    ) -> DataFrame:
        """propgraphclass.py:560-597: edges whose attributes match
        ``edge_types`` AND whose both endpoints match ``node_types``.
        Values may be a single value or a list (isin)."""

        def pred(mapping):
            c = F.lit(True)
            for col, vals in mapping.items():
                vals = vals if isinstance(vals, (list, tuple, set)) else [vals]
                c = c & F.col(col).isin(list(vals))
            return c

        nodes = self.node_attributes.filter(pred(node_types)).select("nodes")
        edges = self.edge_attributes.filter(pred(edge_types)).select("src", "dst")
        return (
            edges.join(nodes.withColumnRenamed("nodes", "src"), "src", "left_semi")
            .join(nodes.withColumnRenamed("nodes", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )

    def subgraph_view(
        self,
        filter_node: Column | Callable[[DataFrame], Column] | None = None,
        filter_edge: Column | Callable[[DataFrame], Column] | None = None,
    ) -> DiGraph:
        """propgraphclass.py:599-649. Note the reference's committed quirk:
        with an edge filter the kept edges need BOTH endpoints in the
        filtered node set; with only a node filter, EITHER endpoint
        suffices (in1d OR, line 643-644). Replicated as-is."""

        def apply(df, flt):
            if flt is None:
                return df
            col = flt(df) if callable(flt) else flt
            return df.filter(col)

        # node universe: the GRAPH's vertex set when no node filter is
        # given (reference builds its mask over self.nodes(),
        # propgraphclass.py:628-640) — node_attributes may be absent or
        # cover only a subset of vertices
        if filter_node is None:
            node_base = self.nodes().select(F.col("label").alias("nodes"))
        else:
            if self.node_attributes is None:
                raise ValueError("filter_node given but no node attributes loaded")
            node_base = self.node_attributes
        nodes = apply(node_base, filter_node).select("nodes")
        if self.edge_attributes is not None:
            edge_base = self.edge_attributes
        else:
            if filter_edge is not None:
                raise ValueError("filter_edge given but no edge attributes loaded")
            edge_base = self.edge_list().select(
                F.col("src_label").alias("src"), F.col("dst_label").alias("dst")
            )
        edges = apply(edge_base, filter_edge).select("src", "dst")
        ns = nodes.withColumnRenamed("nodes", "src")
        nd = nodes.withColumnRenamed("nodes", "dst")
        if filter_edge is not None:
            kept = edges.join(ns, "src", "left_semi").join(nd, "dst", "left_semi")
        else:
            # (select after each semi-join: joining on "dst" reorders the
            # columns, and unionAll is positional)
            in_src = edges.join(ns, "src", "left_semi").select("src", "dst")
            in_dst = edges.join(nd, "dst", "left_semi").select("src", "dst")
            kept = in_src.unionAll(in_dst).distinct()
        return DiGraph.from_edges(
            self.spark,
            kept.select(
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
                F.lit(1.0).alias("weight"),
            ),
            num_partitions=self.num_partitions,
        )
