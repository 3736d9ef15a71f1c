"""Multi-label fidelity: Neo4j's ``SET n:%s`` ADDS a label
(``neo4j.go:107``), so a gid synced under two datasets carries both
labels. The scalar ``label`` column stays the latest write's label (the
physical partition key); label MATCHing consults the ``labels`` set.
"""

from opencypher_datalayer_spark.ingest import DataLayer
from opencypher_datalayer_spark.operators.graph_ops import match_nodes

NS = "urn:ml"

CONFIG = {
    "dataset_definitions": [
        {"name": "people", "source_config": {"label": "Person", "batch_size": 100}},
        {"name": "employees", "source_config": {"label": "Employee", "batch_size": 100}},
    ]
}


def _write(layer, dataset, entities):
    w = layer.dataset(dataset).incremental()
    for e in entities:
        w.write(e)
    w.close()


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


def test_resync_under_two_datasets_accumulates_labels(spark, tmp_path):
    layer = DataLayer(spark, CONFIG, storage_root=str(tmp_path / "s"))
    _write(layer, "people", [{"id": f"{NS}/p1", "props": {"k": "a"}, "refs": {}}])
    _write(layer, "employees", [{"id": f"{NS}/p1", "props": {"k": "b"}, "refs": {}}])

    row = _one(layer.store.nodes)
    assert sorted(row["labels"]) == ["Employee", "Person"]
    assert row["label"] == "Employee"  # latest write's label (partition key)
    assert row["source"] == "employees"  # SET n = item replaced source
    assert dict(row["props"]) == {"k": "b"}  # wholesale property replace

    # label scans see the node under BOTH labels
    assert _one(match_nodes(layer.store, label="Person"))["gid"] == f"{NS}/p1"
    assert _one(match_nodes(layer.store, label="Employee"))["gid"] == f"{NS}/p1"
    # and so does the Cypher MATCH surface
    for lbl in ("Person", "Employee"):
        out = layer.query(f"MATCH (n:{lbl}) RETURN n.gid AS gid")
        assert [r["gid"] for r in out.collect()] == [f"{NS}/p1"]


def test_tombstone_clears_accumulated_labels(spark, tmp_path):
    layer = DataLayer(spark, CONFIG, storage_root=str(tmp_path / "s"))
    _write(layer, "people", [{"id": f"{NS}/p1", "props": {}, "refs": {}}])
    _write(layer, "employees", [{"id": f"{NS}/p1", "props": {}, "refs": {}}])
    _write(layer, "people", [{"id": f"{NS}/p1", "deleted": True}])
    assert layer.store.nodes.count() == 0
    # re-creation starts a fresh label set — DETACH DELETE removed the node
    _write(layer, "people", [{"id": f"{NS}/p1", "props": {}, "refs": {}}])
    assert _one(layer.store.nodes)["labels"] == ["Person"]


def test_stub_upgrade_gets_single_label(spark, tmp_path):
    layer = DataLayer(spark, CONFIG, storage_root=str(tmp_path / "s"))
    _write(
        layer,
        "people",
        [{"id": f"{NS}/p1", "props": {}, "refs": {f"{NS}/knows": [f"{NS}/p2"]}}],
    )
    nodes = {r["gid"]: r for r in layer.store.nodes.collect()}
    assert nodes[f"{NS}/p2"]["labels"] == []  # MERGE stub adds no label
    _write(layer, "employees", [{"id": f"{NS}/p2", "props": {}, "refs": {}}])
    nodes = {r["gid"]: r for r in layer.store.nodes.collect()}
    assert nodes[f"{NS}/p2"]["labels"] == ["Employee"]


def test_delete_all_matches_via_label_set(spark, tmp_path):
    """C5 wipes by (label IN labels) AND source — a node whose latest
    write came from another dataset keeps that dataset's source, so the
    wipe of the OLD dataset must not remove it (same in Neo4j: SET n =
    item replaced ``source``)."""
    layer = DataLayer(spark, CONFIG, storage_root=str(tmp_path / "s"))
    _write(layer, "people", [{"id": f"{NS}/p1", "props": {}, "refs": {}}])
    _write(layer, "employees", [{"id": f"{NS}/p1", "props": {}, "refs": {}}])

    layer._wipe(layer.datasets["people"])  # label=Person, source=people
    assert layer.store.nodes.count() == 1  # source is now 'employees'

    layer._wipe(layer.datasets["employees"])
    assert layer.store.nodes.count() == 0  # Employee IN labels, source match
