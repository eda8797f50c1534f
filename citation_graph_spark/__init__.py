"""citation_graph_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of BlueBrain/citation-graph (reference studied read-only at
/root/reference) on idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized pandas UDFs where column algebra cannot
express the semantics (edge extraction from raw content), and iterative
graph kernels (PageRank, connected components, label-propagation
communities, per-vertex triangle counting) written as join/groupBy
message-passing rounds with explicit partitioning, salted skew handling
and checkpoint-based lineage truncation.

The durable data model mirrors the reference's edge-table form
(reference: src/citations/dataframe.py:3-33 keeps the graph as flat
two-column CSV edge tables): a ``(src: long, dst: long, weight: double)``
DataFrame plus dense-long vertex ids, never an in-memory adjacency
object on the driver.
"""

__version__ = "0.1.0"
