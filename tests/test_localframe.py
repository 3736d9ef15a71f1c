"""Unit tests for functions/localframe.py — the Arrow-backed local
DataFrame helper that replaces pickled-RDD ``createDataFrame(list)``
in every hot path (IVF centroids/probes, ingest batches, cypher-write
item frames, entity-file block bases, UNWIND literals)."""

import pandas as pd
import pytest
from pyspark.sql import types as T

from opencypher_datalayer_spark.functions.localframe import local_df, local_df_cols
from opencypher_datalayer_spark.model import ENTITY_SCHEMA


def test_tuples_with_arrays(spark):
    rows = [(i, list(range(4))) for i in range(10)]
    df = local_df(spark, rows, "cell long, cq array<long>")
    assert df.schema.simpleString() == "struct<cell:bigint,cq:array<bigint>>"
    got = df.orderBy("cell").collect()
    assert [r.cell for r in got] == list(range(10))
    assert got[0].cq == [0, 1, 2, 3]


def test_dicts_entity_schema_with_nulls(spark):
    ents = [
        {"id": "a", "props": {"k": "1"}, "refs": {"r": ["x"]}, "deleted": False, "_seq": 0},
        {"id": "b", "props": None, "refs": None, "deleted": True, "_seq": 1},
    ]
    df = local_df(spark, ents, ENTITY_SCHEMA)
    assert df.schema == ENTITY_SCHEMA
    rows = {r.id: r for r in df.collect()}
    assert rows["a"].props == {"k": "1"}
    assert rows["a"].refs == {"r": ["x"]}
    assert rows["b"].props is None and rows["b"].deleted is True


def test_scalar_nulls(spark):
    df = local_df(spark, [(1,), (None,)], "x bigint")
    assert sorted([r.x for r in df.collect()], key=lambda v: (v is None, v)) == [1, None]


def test_empty(spark):
    df = local_df(spark, [], "x bigint, y string")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<x:bigint,y:string>"


def test_slice_bounding(spark):
    # small frames must not fan out to one near-empty task per core
    df = local_df(spark, [(i,) for i in range(300)], "x bigint")
    assert df.rdd.getNumPartitions() <= 8
    # explicit override
    df1 = local_df(spark, [(i,) for i in range(300)], "x bigint", n_slices=1)
    assert df1.rdd.getNumPartitions() == 1


def test_struct_type_schema(spark):
    schema = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.StringType()), True)])
    df = local_df(spark, [({"a": "b"},), (None,)], schema)
    vals = [r.m for r in df.collect()]
    assert {"a": "b"} in vals and None in vals


def test_columnar_variant(spark):
    import numpy as np

    df = local_df_cols(
        spark,
        {"id": np.arange(5, dtype="int64"), "v": np.arange(5, dtype="int64") * 2},
        "id long, v long",
    )
    got = {r.id: r.v for r in df.collect()}
    assert got == {i: 2 * i for i in range(5)}


def test_row_order_preserved(spark):
    # ingest batches rely on _seq ordering surviving the transfer
    rows = [(i, f"d{i}") for i in range(50)]
    df = local_df(spark, rows, "_seq long, id string")
    got = [r.id for r in df.orderBy("_seq").collect()]
    assert got == [f"d{i}" for i in range(50)]
