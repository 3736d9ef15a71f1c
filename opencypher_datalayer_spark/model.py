"""Data model: EGDM entity envelope and the materialized property graph.

Reference semantics (mimiro-io/opencypher-datalayer):

- Entities are row-oriented and schemaless: URI id, URI-keyed property map
  (JSON scalars), URI-keyed reference map whose values are one target URI
  or a list of them, and a tombstone flag (reference ``neo4j.go:186-228``).
- The graph side is nodes keyed by unique ``gid`` with a single label and
  a ``source`` provenance column (``neo4j.go:95-127``), and directed typed
  edges ``(src)-[rel_type]->(dst)`` carrying ``source``.

Spark mapping: two columnar DataFrames. Property values are carried as
strings (JSON fidelity — the reference's value domain is JSON scalars,
SURVEY §1.3) and cast on read; per-label pivoted views give typed columnar
access for analytics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Ingest envelope: one row per entity in a sync batch.
# ``_seq`` is the position of the entity within the batch — the reference
# processes items in arrival order, so a gid repeated within one batch
# resolves to the LAST occurrence (UNWIND ... MERGE ... SET n = item).
ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("refs", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("_seq", T.LongType(), False),
    ]
)

# Node store. ``label``/``source``/``props`` are null/empty for dangling
# reference-target stubs (reference ``neo4j.go:111-114``).
#
# ``labels`` is the full accumulated label SET: Neo4j's ``SET n:%s``
# (``neo4j.go:107``) ADDS a label, so a gid synced under two datasets
# carries both. ``label`` stays the latest-write label — it is the
# physical partition key (write-side clustering) and the cheap scalar
# for single-label workloads; label MATCHing consults ``labels``.
NODES_SCHEMA = T.StructType(
    [
        T.StructField("gid", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Edge store: at most one edge per (src, rel_type, dst) — MERGE semantics
# (reference ``neo4j.go:116-123``).
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("rel_type", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
    ]
)


def normalize_entity(entity: dict) -> dict:
    """Normalize a UDA JSON entity into the envelope row shape.

    - property scalars -> strings (JSON fidelity, cast on read);
    - reference values: single URI string -> one-element list; list kept;
      anything else is an error (reference ``neo4j.go:199-208``).
    """
    props = {}
    for k, v in (entity.get("props") or {}).items():
        if v is None:
            props[k] = None
        elif isinstance(v, bool):
            props[k] = "true" if v else "false"
        else:
            props[k] = str(v)
    refs = {}
    for k, v in (entity.get("refs") or {}).items():
        if isinstance(v, str):
            refs[k] = [v]
        elif isinstance(v, (list, tuple)) and all(isinstance(x, str) for x in v):
            refs[k] = list(v)
        else:
            raise ValueError(f"invalid reference value for {k!r}: {v!r}")
    return {
        "id": entity["id"],
        "props": props,
        "refs": refs,
        "deleted": bool(entity.get("deleted", False)),
    }
