"""Tabular → property-graph ingest: build nodes/edges DataFrames from
foreign-key tables with pure column expressions.

This is the scale path for bulk graph construction (the row-oriented
entity writers in ``ingest.py`` are the protocol path for UDA sync
batches): no Python-side rows, no shuffle beyond the final writes —
every node table is a projection, every edge table a projection of the
FK side. URIs follow the reference's entity-id convention
(``http://data.sample.org/things/<n>`` — ``layer_test.go:437-443``),
here ``<entity>/<key>``.

Graph shape from the star schema (FIXTURES.md §5):

- nodes: customers, nations, regions, suppliers, orders
- edges: ``(order)-[placed_by]->(customer)``,
  ``(customer)-[in_nation]->(nation)``,
  ``(supplier)-[in_nation]->(nation)``,
  ``(nation)-[in_region]->(region)``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.sources.tables import load_table
from opencypher_datalayer_spark.store import GraphStore

NS = "urn:graft"


def _gid(kind: str, key) -> F.Column:  # type: ignore[name-defined]
    return F.concat(F.lit(f"{NS}/{kind}/"), F.col(key).cast("string"))


def graph_from_tables(spark: SparkSession, sf_dir: str) -> GraphStore:
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)

    nodes = (
        cust.select(
            _gid("customer", "c_custkey").alias("gid"),
            F.lit("Customer").alias("label"),
            F.lit("crm").alias("source"),
            F.map_from_arrays(
                F.array(F.lit("name"), F.lit("mktsegment"), F.lit("acctbal")),
                F.array(
                    F.col("c_name"),
                    F.col("c_mktsegment"),
                    F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
                ),
            ).alias("props"),
        )
        .unionByName(
            nation.select(
                _gid("nation", "n_nationkey").alias("gid"),
                F.lit("Nation").alias("label"),
                F.lit("geo").alias("source"),
                F.create_map(F.lit("name"), F.col("n_name")).alias("props"),
            )
        )
        .unionByName(
            region.select(
                _gid("region", "r_regionkey").alias("gid"),
                F.lit("Region").alias("label"),
                F.lit("geo").alias("source"),
                F.create_map(F.lit("name"), F.col("r_name")).alias("props"),
            )
        )
        .unionByName(
            supp.select(
                _gid("supplier", "s_suppkey").alias("gid"),
                F.lit("Supplier").alias("label"),
                F.lit("vendors").alias("source"),
                F.create_map(F.lit("name"), F.col("s_name")).alias("props"),
            )
        )
        .unionByName(
            orders.select(
                _gid("order", "o_orderkey").alias("gid"),
                F.lit("Order").alias("label"),
                F.lit("sales").alias("source"),
                F.map_from_arrays(
                    F.array(F.lit("status"), F.lit("priority")),
                    F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
                ).alias("props"),
            )
        )
    )

    edges = (
        orders.select(
            _gid("order", "o_orderkey").alias("src"),
            F.lit("placed_by").alias("rel_type"),
            _gid("customer", "o_custkey").alias("dst"),
            F.lit("sales").alias("source"),
        )
        .unionByName(
            cust.select(
                _gid("customer", "c_custkey").alias("src"),
                F.lit("in_nation").alias("rel_type"),
                _gid("nation", "c_nationkey").alias("dst"),
                F.lit("crm").alias("source"),
            )
        )
        .unionByName(
            supp.select(
                _gid("supplier", "s_suppkey").alias("src"),
                F.lit("in_nation").alias("rel_type"),
                _gid("nation", "s_nationkey").alias("dst"),
                F.lit("vendors").alias("source"),
            )
        )
        .unionByName(
            nation.select(
                _gid("nation", "n_nationkey").alias("src"),
                F.lit("in_region").alias("rel_type"),
                _gid("region", "n_regionkey").alias("dst"),
                F.lit("geo").alias("source"),
            )
        )
    )
    return GraphStore(nodes, edges)
