"""Physical-plan audits: the scale behaviors the docstrings claim must
be visible in the executed plan — filter pushdown to the parquet scan,
column pruning, broadcast joins for small dimensions, and broadcast
anti-joins on the write path. These assertions are what '.explain and
iterate' hardens into."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.graph import g_two_hop
from opencypher_datalayer_spark.benchqueries.relational import q6_forecast_revenue
from opencypher_datalayer_spark.model import ENTITY_SCHEMA
from opencypher_datalayer_spark.store import GraphStore


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q6_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = explain_str(q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters:" in plan
    # the shipdate/discount/quantity predicates reach the scan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]
    # projection pruned to the 4 referenced columns — no full-row read
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    for unused in ("l_orderkey", "l_returnflag", "l_tax"):
        assert unused not in read_schema


def test_small_dims_broadcast(spark, sf_dir):
    plan = explain_str(g_two_hop(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_label_scan_prunes_union_branches(spark, sf_dir):
    """The projected graph's nodes table is a union of per-entity scans
    with literal labels; a label filter must fold away every
    non-matching branch so MATCH (:Customer) reads ONE parquet table,
    not five (the partition-pruning analog for union-backed stores)."""
    from opencypher_datalayer_spark.operators.graph_ops import match_nodes
    from opencypher_datalayer_spark.sources.tabular import graph_from_tables

    store = graph_from_tables(spark, sf_dir)
    plan = explain_str(match_nodes(store, label="Customer"))
    assert "customer.parquet" in plan
    for other in ("orders.parquet", "nation.parquet", "supplier.parquet", "region.parquet"):
        assert other not in plan


def test_facade_explain_surface(spark):
    """DataLayer.explain (VERDICT r8 next #7): a user can verify plan
    shapes through the public facade the way these tests do — read
    statements show the query's physical plan, write statements show
    the post-write plan WITHOUT committing."""
    from opencypher_datalayer_spark.ingest import DataLayer

    layer = DataLayer(
        spark,
        {"dataset_definitions": [
            {"name": "people", "source_config": {"label": "Person"}}
        ]},
    )
    layer.query(
        "UNWIND $items AS item MERGE (n {gid: item.gid}) "
        "WITH n, item OPTIONAL MATCH (n)-[r]->() DELETE r SET n:Person SET n = item",
        {"items": [{"gid": "urn:p1", "source": "people", "name": "ada"}]},
    )
    plan = layer.explain("MATCH (n:Person) RETURN n.gid AS gid, n.name AS name")
    assert "Physical Plan" in plan
    before = layer.query("MATCH (n) RETURN n.gid AS gid").count()
    wplan = layer.explain(
        "UNWIND $items AS item MERGE (n {gid: item.gid}) SET n:Person SET n = item",
        {"items": [{"gid": "urn:p2", "source": "people"}]},
    )
    assert "Physical Plan" in wplan and "BroadcastHashJoin" in wplan
    # explain of a write commits NOTHING
    assert layer.query("MATCH (n) RETURN n.gid AS gid").count() == before
    """apply_batch merges must be broadcast joins of the (small) batch
    against the store — never a store-wide shuffle join."""
    store = GraphStore.empty(spark)
    rows = [
        {"id": "a", "props": {"k": "v"}, "refs": {"r": ["b"]}, "deleted": False, "_seq": 0},
        {"id": "c", "props": {}, "refs": {}, "deleted": True, "_seq": 1},
    ]
    batch = spark.createDataFrame(rows, ENTITY_SCHEMA)
    # seed the store so the anti-joins are against a real snapshot
    store = store.apply_batch(batch, label="P", source="s").checkpointed()
    plan = explain_str(store.apply_batch(batch, label="P", source="s").nodes)
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_chunking_prunes_and_avoids_shuffle(spark, sf_dir):
    """Token-window chunking reads only (doc_id, text) and its ONLY
    exchange is the presentation orderBy — chunk generation itself is
    map-side (sequence/posexplode/slice)."""
    from opencypher_datalayer_spark.benchqueries.text import text_chunk_windows

    plan = explain_str(text_chunk_windows(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "doc_id" in read_schema and "text" in read_schema
    for unused in ("lang", "source", "n_chars"):
        assert unused not in read_schema
    assert plan.count("- Exchange") == 1  # orderBy only (tree section)


def test_packing_single_shard_exchange(spark, sf_dir):
    """Sequence packing shuffles ONCE on the shard key into the
    Arrow-batched group map; the second exchange is the presentation
    orderBy."""
    from opencypher_datalayer_spark.benchqueries.text import text_pack_sequences

    plan = explain_str(text_pack_sequences(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("- Exchange") == 2  # groupBy(shard) + orderBy (tree section)


def test_sq8_broadcasts_queries_and_scales(spark, sf_dir):
    """The quantized ANN scan must broadcast both tiny sides (the scale
    vector and the query set) — the corpus side is never shuffled before
    the integer-dot scan."""
    from opencypher_datalayer_spark.benchqueries.similarity import sim_sq8_topk

    plan = explain_str(sim_sq8_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # no sort-merge join anywhere in the candidate generation
    assert "SortMergeJoin" not in plan.split("Window")[0]


def test_sq8_partial_topk_before_exchange(spark, sf_dir):
    """The quantized scan's ranking exchange must carry the slim
    (q_id, c_id, approx_dot) triple AFTER the Arrow-batched per-partition
    top-k combiner — candidates x queries, never corpus x queries with
    vectors riding along (VERDICT r3 'what's wrong' #3)."""
    import re

    from opencypher_datalayer_spark.benchqueries.similarity import sim_sq8_topk

    plan = explain_str(sim_sq8_topk(spark, sf_dir))
    assert "MapInPandas" in plan  # the partial top-k combiner
    # an exchange whose input is exactly the slim 3-column triple
    assert re.search(
        r"Exchange\nInput \[3\]: \[q_id#\d+L?, c_id#\d+L?, approx_dot#\d+L?\]", plan
    )
    # the shortlist re-joins the corpus for the rerank via broadcast
    assert "BroadcastHashJoin" in plan


def test_tfidf_scan_prunes_columns(spark, sf_dir):
    """TF-IDF reads only (doc_id, text) — no full-row documents scan."""
    from opencypher_datalayer_spark.benchqueries.text import text_tfidf_topk

    plan = explain_str(text_tfidf_topk(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "text" in read_schema
    for unused in ("lang", "n_chars"):
        assert unused not in read_schema


def test_exists_marker_is_broadcast_semi_shape(spark, sf_dir):
    """The EXISTS marker frame (deduplicated, label-filtered) joins the
    matched frame via broadcast — pattern-existence never shuffles the
    probe side."""
    from opencypher_datalayer_spark.plans import run_cypher
    from opencypher_datalayer_spark.sources.tabular import graph_from_tables

    store = graph_from_tables(spark, sf_dir)
    df = run_cypher(
        store,
        "MATCH (c:Customer) "
        "WHERE EXISTS { (c)-[:in_nation]->(n:Nation {name: 'FRANCE'}) } "
        "RETURN count(*) AS n",
    )
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan


def test_bruteforce_partial_topk_before_exchange(spark, sf_dir):
    """The exact baseline's SCORING is all-pairs by design, but its
    ranking exchange must still be slim: the map-side partial top-k
    keeps batches x queries x TOPK rows, and the float vectors never
    ride through the window shuffle."""
    import re

    from opencypher_datalayer_spark.benchqueries.similarity import sim_topk_bruteforce

    plan = explain_str(sim_topk_bruteforce(spark, sf_dir))
    assert "MapInPandas" in plan  # the partial top-k combiner
    assert re.search(
        r"Exchange\nInput \[3\]: \[q_id#\d+L?, c_id#\d+L?, cosine#\d+\]", plan
    )


def test_parallel_dedup_holds_full_parallelism(spark):
    """scale.parallel_dedup must leave the deduped candidate stream at
    the session's full parallelism — AQE's bytes-based coalescing sized
    the sf0.1 199k-pair exchange at ONE partition and serialized the
    staged verify's per-row array_intersect on a single core (SCALE.md
    §aqe-serialized-verify). Executed-plan pin: the output partition
    count equals defaultParallelism, where the plain dropDuplicates
    collapses to a handful."""
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.operators.scale import parallel_dedup

    pairs = (
        spark.range(200_000)
        .select(
            (F.col("id") % 5000).alias("doc_a"),
            (F.col("id") % 7919).alias("doc_b"),
        )
    )
    p = spark.sparkContext.defaultParallelism
    deduped = parallel_dedup(pairs, "doc_a", "doc_b")
    got = deduped.rdd.getNumPartitions()
    assert got == p, f"parallel_dedup output {got} partitions, want {p}"
    plain = pairs.dropDuplicates().rdd.getNumPartitions()
    assert plain < p, (
        f"expected AQE to coalesce the plain dropDuplicates below {p} "
        f"(got {plain}) — if this stops holding, parallel_dedup may be droppable"
    )
    # same result set either way — the repartition is plan-only
    assert deduped.count() == pairs.dropDuplicates().count()
