"""Graph read operators — the openCypher query surface the reference's
integration tests exercise against Neo4j (SURVEY §2-R), as native
DataFrame plans.

The canonical readback shape (reference ``layer_test.go:117``)::

    MATCH (n:Person) WHERE n.source = 'people'
    OPTIONAL MATCH (n)-[r]->(m)
    RETURN n, COLLECT({rel: r, targetGid: m.gid}) AS relationships

maps to: partition-pruned label scan + filter (R1), two left outer joins
(R2), and group-by-node + ``collect_list(struct(...))`` (R3 — Cypher's
implicit grouping over non-aggregated RETURN terms).

Scale notes: the label/source filter prunes partitions (nodes are stored
partitioned by label); the n->edges join keys on the store's natural
keys; hub nodes (high-fanout gids) are handled by AQE skew-join splitting
rather than manual salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opencypher_datalayer_spark.store import GraphStore, where_label


def match_nodes(
    store: GraphStore,
    label: str | None = None,
    source: str | None = None,
    **prop_filters: str,
) -> DataFrame:
    """R1: label scan + property predicate filter."""
    nodes = store.nodes
    if label is not None:
        nodes = where_label(nodes, label)  # multi-label set membership
    if source is not None:
        nodes = nodes.where(F.col("source") == source)
    for key, value in prop_filters.items():
        nodes = nodes.where(F.col("props").getItem(key) == value)
    return nodes


def expand(
    store: GraphStore,
    nodes: DataFrame,
    rel_type: str | None = None,
    optional: bool = True,
) -> DataFrame:
    """R2: ``(n)-[r]->(m)`` expansion as joins.

    Returns columns: every ``n`` column, plus ``rel_type``, ``rel_source``
    (the edge), and ``m_gid``, ``m_label``, ``m_props`` (the target).
    ``optional=True`` is OPTIONAL MATCH (left outer); False is MATCH
    (inner).
    """
    how = "left" if optional else "inner"
    edges = store.edges
    if rel_type is not None:
        edges = edges.where(F.col("rel_type") == rel_type)
    edges = edges.select(
        F.col("src"),
        F.col("rel_type"),
        F.col("source").alias("rel_source"),
        F.col("dst"),
    )
    m = store.nodes.select(
        F.col("gid").alias("m_gid"),
        F.col("label").alias("m_label"),
        F.col("props").alias("m_props"),
    )
    out = nodes.join(edges, nodes["gid"] == edges["src"], how).drop("src")
    return out.join(m, out["dst"] == m["m_gid"], how).drop("dst")


def expand_collect(
    store: GraphStore,
    label: str | None = None,
    source: str | None = None,
) -> DataFrame:
    """R1+R2+R3: the full readback query.

    Grouping key is the node's gid (unique by construction); the
    collected list is sorted for deterministic comparison — Cypher's
    COLLECT is unordered, so a canonical order is strictly more testable.
    A node with no outgoing edge still yields one element whose fields
    are null (matching the reference's asserted readback,
    ``layer_test.go:222-231``).
    """
    n = match_nodes(store, label=label, source=source)
    expanded = expand(store, n, optional=True)
    # group key is gid alone (unique; also MapType props can't be a group
    # key) — the other n columns ride along via first().
    return expanded.groupBy("gid").agg(
        F.first("label").alias("label"),
        F.first("source").alias("source"),
        F.first("props").alias("props"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("rel_type").alias("rel"),
                    F.col("m_gid").alias("target_gid"),
                )
            )
        ).alias("relationships"),
    )


def out_degree(store: GraphStore, rel_type: str | None = None) -> DataFrame:
    """Per-node out-degree (map-side-combined aggregation on the edge table)."""
    edges = store.edges
    if rel_type is not None:
        edges = edges.where(F.col("rel_type") == rel_type)
    return edges.groupBy(F.col("src").alias("gid")).agg(F.count("*").alias("out_degree"))
