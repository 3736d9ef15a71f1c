"""File-based entity sources: JSONL and CSV dumps ingested through the
envelope schema into the graph store."""

import json

from pyspark.sql import functions as F

from opencypher_datalayer_spark.sources.entity_files import (
    entities_from_csv,
    entities_from_jsonl,
)
from opencypher_datalayer_spark.store import GraphStore

NS = "http://data.sample.org"


def test_jsonl_roundtrip(spark, tmp_path):
    p = tmp_path / "ents.jsonl"
    rows = [
        {"id": f"{NS}/p/1", "props": {f"{NS}/name": "brian", f"{NS}/age": "23"},
         "refs": {f"{NS}/worksfor": [f"{NS}/c/mimiro"]}},
        {"id": f"{NS}/p/1", "props": {f"{NS}/name": "doe"}, "refs": {}},  # last wins
        {"id": f"{NS}/p/2", "deleted": True},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))

    batch = entities_from_jsonl(spark, str(p))
    store = GraphStore.empty(spark).apply_batch(batch, label="Person", source="people")
    nodes = {r["gid"]: r.asDict() for r in store.nodes.collect()}
    assert set(nodes) == {f"{NS}/p/1"}
    assert nodes[f"{NS}/p/1"]["props"] == {"name": "doe"}  # last occurrence won
    assert store.edges.count() == 0  # last version had no refs


def test_csv_reference_fixture_shape(spark, tmp_path):
    """The reference's CSV sample: id,name,age,worksfor
    (layer_test.go:35-50) with worksfor as a reference column."""
    p = tmp_path / "ents.csv"
    p.write_text(
        "id,name,age,worksfor\n"
        f"{NS}/p/1,brian,23,{NS}/c/mimiro\n"
        f"{NS}/p/2,jane,31,\n"
    )
    batch = entities_from_csv(spark, str(p), namespace=NS)
    store = GraphStore.empty(spark).apply_batch(batch, label="Person", source="people")
    nodes = {r["gid"]: r.asDict() for r in store.nodes.collect()}
    assert nodes[f"{NS}/p/1"]["props"] == {"name": "brian", "age": "23"}
    assert nodes[f"{NS}/p/2"]["props"] == {"name": "jane", "age": "31"}
    assert f"{NS}/c/mimiro" in nodes  # stub created
    edges = {(r["src"], r["rel_type"], r["dst"]) for r in store.edges.collect()}
    assert edges == {(f"{NS}/p/1", "worksfor", f"{NS}/c/mimiro")}


def test_single_input_scan(spark, tmp_path):
    """The sequenced batch must be pinned (localCheckpoint) so the input
    files are scanned exactly once: the counting job materializes the
    cached tagged frame and every downstream consumer reads memory, never
    the source. A re-planned second scan could also see different split
    boundaries, silently breaking the (_file, _block) join keys."""
    p = tmp_path / "ents.jsonl"
    p.write_text(
        "\n".join(
            json.dumps({"id": f"{NS}/p/{i}", "props": {}, "refs": {}})
            for i in range(10)
        )
    )
    batch = entities_from_jsonl(spark, str(p))
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan, plan  # reads the checkpoint, not the files
    assert batch.count() == 10
    assert [r["id"] for r in batch.orderBy("_seq").collect()] == [
        f"{NS}/p/{i}" for i in range(10)
    ]
