"""Graph catalog: the reference's server symbol table, Spark-style.

Reference: graphs live in the Arkouda symbol table under generated names
(``insertComponents`` → ``GraphSymEntry``, BuildGraphMsg.chpl:61-187;
client keeps the name, graphclass.py:252-253). Here a catalog maps names to
Graph objects and mirrors the edge/vertex tables as temp views
(``<name>_edges``, ``<name>_vertices``) so ``spark.sql`` can query them.
Durable registration = writing the bucketed tables (`Graph.write`)."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from .graph import DiGraph, Graph


class GraphCatalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._graphs: dict[str, Graph] = {}

    def register(self, name: str, graph: Graph) -> None:
        self._graphs[name] = graph
        graph.edges.createOrReplaceTempView(f"{name}_edges")
        graph.vertices.createOrReplaceTempView(f"{name}_vertices")

    def get(self, name: str) -> Graph:
        return self._graphs[name]

    def __contains__(self, name: str) -> bool:
        return name in self._graphs

    def list(self) -> list[str]:
        return sorted(self._graphs)

    def drop(self, name: str) -> None:
        g = self._graphs.pop(name)
        self.spark.catalog.dropTempView(f"{name}_edges")
        self.spark.catalog.dropTempView(f"{name}_vertices")
        g.unpersist()

    def save(self, name: str, path: str) -> None:
        g = self._graphs[name]
        g.write(path)
        # record directedness so load round-trips the right class (a
        # DiGraph read back as Graph halves n_edges and breaks degree())
        with open(os.path.join(path, "_graph_meta.json"), "w") as f:
            json.dump({"directed": bool(g.directed)}, f)

    def load(self, name: str, path: str) -> Graph:
        meta_path = os.path.join(path, "_graph_meta.json")
        directed = False
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                directed = json.load(f).get("directed", False)
        cls = DiGraph if directed else Graph
        g = cls.read(self.spark, path)
        self.register(name, g)
        return g
