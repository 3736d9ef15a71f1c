"""openCypher write-statement execution against the GraphStore.

The reference never executes its write Cypher itself — it ships five
parameterized templates to Neo4j (``neo4j.go:95-127``, executed at
``neo4j.go:238-284``).  This module runs that statement language
natively as set-oriented DataFrame transforms, covering the full clause
surface those templates use: ``UNWIND $items AS item``, ``MATCH`` /
``OPTIONAL MATCH`` (by-gid point lookup and label/property filtered
scans), ``MERGE`` (node and relationship), ``WITH`` pass-through,
``SET n:Label`` / ``SET n = item`` / ``SET n.prop = v`` /
``SET r.prop = v``, and ``DELETE`` / ``DETACH DELETE``.

Execution model: one driving ``rows`` DataFrame (the UNWIND items, one
row per item in order), against which every clause is interpreted
set-orientedly — a ``MATCH (n {gid: item.gid})`` is a semi-join of the
item rows against the node store, a ``SET`` is a keyed update join, a
``DELETE`` an anti-join.  Nothing iterates per item on the driver, so a
10M-item statement plans exactly like a 10-item one.

Label semantics match Neo4j's ``SET n:%s`` ADDS behavior: each write
unions into the node's accumulated ``labels`` set (the scalar ``label``
column keeps the latest write as the physical clustering key); label
MATCH consults the set. One documented divergence remains (SURVEY
§2-C):

- ``SET r.type = item.type`` parses and is accepted but stores nothing:
  the edge schema has no ``type`` column because the reference's item
  maps never populate ``item.type`` (``neo4j.go:215-220``) — the
  property is always null in the reference's own graph too.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opencypher_datalayer_spark.functions.localframe import local_df
from opencypher_datalayer_spark.plans.cypher import (
    CypherError,
    Expr,
    Lit,
    MatchClause,
    NodePat,
    Parser,
    PathPat,
    Prop,
    Var,
    _pat_literal,
    _prop_cmp,
    tokenize,
)
from opencypher_datalayer_spark.store import GraphStore, _detach_edges, labels_expr

# Store row-count bound (GraphStore.size_hint) up to which the write
# planner broadcasts the STORE side of item-vs-store joins instead of
# running the store-never-shuffles inversion — ~200k gid rows is
# ~12 MB framed, far under the broadcast cap, and the small-store plan
# halves the per-site broadcast count (measurements in _Exec.__init__).
SMALL_STORE_ROWS_MAX = 200_000

# ----------------------------------------------------------------------
# Write-statement AST
# ----------------------------------------------------------------------


@dataclass
class Unwind:
    param: str
    var: str


@dataclass
class WithClause:
    names: list[str]


@dataclass
class MergeClause:
    path: PathPat
    # ON CREATE SET / ON MATCH SET items, applied only to the rows the
    # MERGE created / matched respectively
    on_create: list = field(default_factory=list)
    on_match: list = field(default_factory=list)


@dataclass
class CreateClause:
    """CREATE (n:L {gid: g, ...}) / CREATE (a)-[:T]->(b). In a
    gid-keyed store node identity IS the gid, so CREATE desugars to
    MERGE-on-gid + SET of the remaining properties/label (creating an
    existing gid is an upsert, not a duplicate — documented
    divergence from Neo4j's anonymous-identity CREATE)."""

    path: PathPat


@dataclass
class RemoveProp:
    var: str
    key: str


@dataclass
class RemoveLabel:
    var: str
    label: str


@dataclass
class RemoveClause:
    items: list


@dataclass
class SetLabel:
    var: str
    label: str


@dataclass
class SetAll:
    var: str
    value: Expr


@dataclass
class SetProp:
    var: str
    key: str
    value: Expr


@dataclass
class SetClause:
    items: list


@dataclass
class DeleteClause:
    names: list[str]
    detach: bool


WriteClause = (
    Unwind | WithClause | MergeClause | CreateClause | SetClause
    | RemoveClause | DeleteClause | MatchClause
)


class WriteParser(Parser):
    def parse_statement(self) -> list[WriteClause]:
        clauses: list[WriteClause] = []
        while self.peek() is not None:
            if self.at_sym(";"):  # statement terminator
                self.take()
                if self.peek() is not None:
                    raise CypherError("multiple statements are not supported")
                break
            if self.at_kw("unwind"):
                self.take()
                t = self.take()
                if t.kind != "param":
                    raise CypherError("UNWIND expects a $parameter")
                self.expect_kw("as")
                clauses.append(Unwind(t.value, self.take().text))
            elif self.at_kw("optional", "match"):
                optional = False
                if self.at_kw("optional"):
                    self.take()
                    optional = True
                self.expect_kw("match")
                paths = [self.parse_path()]
                while self.at_sym(","):
                    self.take()
                    paths.append(self.parse_path())
                where = None
                if self.at_kw("where"):
                    self.take()
                    where = self.parse_expr()
                clauses.append(MatchClause(paths, optional, where))
            elif self.at_kw("merge"):
                self.take()
                mc = MergeClause(self.parse_path())
                while self._at_name("on"):
                    self.take()
                    branch = self.take()
                    self.expect_kw("set")
                    items = [self._parse_set_item()]
                    while self.at_sym(","):
                        self.take()
                        items.append(self._parse_set_item())
                    if branch.value == "create":
                        mc.on_create.extend(items)
                    elif branch.value == "match":
                        mc.on_match.extend(items)
                    else:
                        raise CypherError("expected ON CREATE SET or ON MATCH SET")
                clauses.append(mc)
            elif self._at_name("create"):
                self.take()
                clauses.append(CreateClause(self.parse_path()))
            elif self._at_name("remove"):
                self.take()
                items = [self._parse_remove_item()]
                while self.at_sym(","):
                    self.take()
                    items.append(self._parse_remove_item())
                clauses.append(RemoveClause(items))
            elif self.at_kw("with"):
                self.take()
                names = [self.take().text]
                while self.at_sym(","):
                    self.take()
                    names.append(self.take().text)
                clauses.append(WithClause(names))
            elif self.at_kw("set"):
                self.take()
                items = [self._parse_set_item()]
                while self.at_sym(","):
                    self.take()
                    items.append(self._parse_set_item())
                clauses.append(SetClause(items))
            elif self.at_kw("detach", "delete"):
                detach = False
                if self.at_kw("detach"):
                    self.take()
                    detach = True
                self.expect_kw("delete")
                names = [self.take().text]
                while self.at_sym(","):
                    self.take()
                    names.append(self.take().text)
                clauses.append(DeleteClause(names, detach))
            else:
                raise CypherError(f"unexpected clause at {self._ctx()}")
        if not clauses:
            raise CypherError("empty statement")
        return clauses

    def _at_name(self, word: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "name" and t.value == word

    def _parse_set_item(self):
        var = self.take().text
        if self.at_sym(":"):
            self.take()
            return SetLabel(var, self.take().text)
        if self.at_sym("."):
            self.take()
            key = self.take().text
            self.expect_sym("=")
            return SetProp(var, key, self.parse_primary())
        self.expect_sym("=")
        return SetAll(var, self.parse_primary())

    def _parse_remove_item(self):
        var = self.take().text
        if self.at_sym(":"):
            self.take()
            return RemoveLabel(var, self.take().text)
        self.expect_sym(".")
        return RemoveProp(var, self.take().text)


# ----------------------------------------------------------------------
# Interpreter
# ----------------------------------------------------------------------

_ITEMS_SCHEMA_FIELDS = [T.StructField("_seq", T.LongType(), False)]


def _stringify(v: object) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _items_df(spark: SparkSession, var: str, items: list[dict]) -> DataFrame:
    """One row per item, in statement order (``_seq``); the open item map
    is carried as ``map<string,string>`` (the reference's JSON value
    domain, SURVEY §1.3)."""
    rows = [(i, {k: _stringify(v) for k, v in it.items()}) for i, it in enumerate(items)]
    schema = T.StructType(
        _ITEMS_SCHEMA_FIELDS
        + [T.StructField(f"{var}__map", T.MapType(T.StringType(), T.StringType()), False)]
    )
    # local_df ships the batch as one Arrow transfer (no pickled-RDD
    # Python workers) and bounds the slice count so small batches don't
    # schedule 32 near-empty tasks through every downstream stage
    return local_df(spark, rows, schema)


@dataclass
class _EdgeBinding:
    """A relationship variable: either the outgoing-edge set of bound
    source nodes (OPTIONAL MATCH (n)-[r]->()), or the keyed edge set a
    MERGE created/matched (then ``src_var``/``dst_var`` name the row
    columns holding the endpoint gids)."""

    src_gids: DataFrame  # one column: gid
    rel_type: str | None
    src_var: str | None = None
    dst_var: str | None = None
    # which stored endpoint the bound node anchors: 'src' for
    # (n)-[r]->(), 'dst' for (n)<-[r]-(), 'both' for (n)-[r]-()
    anchor: str = "src"


class _Exec:
    def __init__(self, store: GraphStore, spark: SparkSession, params: dict):
        self.spark = spark
        self.params = params
        self.nodes = store.nodes
        self.edges = store.edges
        self.rows: DataFrame | None = None
        self.item_vars: set[str] = set()
        self.node_vars: set[str] = set()  # bound as {var}__gid in rows
        self.filters: dict[str, Column] = {}  # store-filter MATCH bindings
        self.edge_vars: dict[str, _EdgeBinding] = {}
        # gids the last MERGE inserted, per variable (ON CREATE/ON MATCH)
        self.created: dict[str, DataFrame] = {}
        # plan-shape gate (measured at sf0.1 and in the 4-core test
        # suite): when the store is KNOWN small (GraphStore.size_hint is
        # a driver-maintained upper bound), every item-vs-store site
        # broadcasts THE STORE side — one broadcast join, no shuffle,
        # none of the inversion's two-broadcast fixed cost per site
        # (old SMJ shape 3.6 s / inversion 5.1 s min at sf0.1; the
        # 5-statement template-sequence test 34 s -> 115 s under the
        # blanket inversion). A big or unknown store keeps the
        # scale-correct inversion: the store never shuffles and is
        # never a broadcast build side.
        self.small_store = (
            store.size_hint is not None
            and store.size_hint <= SMALL_STORE_ROWS_MAX
        )
        # upper bound on rows this statement can add (for the caller's
        # size_hint propagation): counted at the MERGE/CREATE sites
        self.added_bound = 0
        self._n_items = 1  # no UNWIND: literal clauses add O(1) rows

    # -- expression evaluation over the driving rows --

    def val(self, e: Expr) -> Column:
        if isinstance(e, Lit):
            return F.lit(_stringify(e.value))
        if isinstance(e, Prop):
            if e.var in self.item_vars:
                return F.col(f"{e.var}__map").getItem(e.key)
            if e.var in self.node_vars and e.key == "gid":
                return F.col(f"{e.var}__gid")
            raise CypherError(f"cannot evaluate {e.var}.{e.key} in write context")
        if isinstance(e, Var) and e.name in self.item_vars:
            return F.col(f"{e.name}__map")
        raise CypherError(f"cannot evaluate {e!r} in write context")

    def _gids_of(self, var: str) -> DataFrame:
        if var in self.node_vars:
            return self.rows.select(F.col(f"{var}__gid").alias("gid")).dropDuplicates()
        if var in self.filters:
            return self.nodes.where(self.filters[var]).select("gid")
        raise CypherError(f"undefined node variable {var!r}")

    # -- clause dispatch --

    def apply(self, c: WriteClause) -> None:
        if isinstance(c, Unwind):
            items = self.params.get(c.param)
            if not isinstance(items, list):
                raise CypherError(f"parameter ${c.param} must be a list of maps")
            self.rows = _items_df(self.spark, c.var, items)
            self.item_vars.add(c.var)
            self._n_items = max(1, len(items))  # per-pattern add bound
        elif isinstance(c, MatchClause):
            self._match(c)
        elif isinstance(c, MergeClause):
            self._merge(c.path, track_created=bool(c.on_create or c.on_match))
            for item in c.on_create:
                self._set(item, restrict=self._created_of(item))
            for item in c.on_match:
                self._set(item, restrict=self._matched_of(item))
        elif isinstance(c, CreateClause):
            self._create(c.path)
        elif isinstance(c, RemoveClause):
            for item in c.items:
                self._remove(item)
        elif isinstance(c, WithClause):
            for n in c.names:
                if n not in self.item_vars | self.node_vars and n not in self.edge_vars:
                    raise CypherError(f"WITH references unbound variable {n!r}")
        elif isinstance(c, SetClause):
            for item in c.items:
                self._set(item)
        elif isinstance(c, DeleteClause):
            for n in c.names:
                self._delete(n, c.detach)
        else:  # pragma: no cover
            raise CypherError(f"unsupported clause {c!r}")

    # -- MATCH --

    def _match(self, c: MatchClause) -> None:
        for path in c.paths:
            if len(path.nodes) == 1:
                self._match_node(path.nodes[0], c)
            elif len(path.nodes) == 2 and c.optional:
                self._match_edge(path, c)
            else:
                raise CypherError("unsupported MATCH pattern in write statement")

    def _match_node(self, pat: NodePat, c: MatchClause) -> None:
        exprs = {k: v for k, v in pat.props.items() if not isinstance(v, Lit)}
        if exprs:
            # point lookup per item: MATCH (n {gid: item.gid}) — semi-join
            # of items against the store keeps only existing gids
            # (MATCH = inner join; missing rows silently drop, C1/C4).
            if self.rows is None:
                raise CypherError("expression pattern requires UNWIND items")
            if set(exprs) != {"gid"} or pat.props.keys() != {"gid"}:
                raise CypherError("expression MATCH supports only {gid: <expr>}")
            var = pat.var or "_n"
            self.rows = self.rows.withColumn(f"{var}__gid", self.val(exprs["gid"]))
            if self.small_store:
                # known-small store: broadcast the STORE side once —
                # single shuffle-free join (see _Exec.__init__ gate)
                matched = F.broadcast(
                    self.nodes.select(F.col("gid").alias("__match_gid"))
                )
                self.rows = self.rows.join(
                    matched,
                    F.col(f"{var}__gid") == F.col("__match_gid"),
                    "left_semi",
                )
                self.node_vars.add(var)
                return
            # Join-order inversion (store.py C3 idiom): a direct
            # rows-semi-store join plans the STORE as the probe side of
            # a shuffle (SortMergeJoin — a lineage-only store frame has
            # no size stats and never auto-broadcasts). ``rows`` is the
            # driver-provided $items batch — bounded by the UDA
            # protocol's batch_size — so broadcast IT against the store
            # scan (shuffle-free, small output), then semi-join the
            # bounded hit set back. The store never shuffles.
            wanted = self.rows.select(
                F.col(f"{var}__gid").alias("__match_gid")
            ).dropDuplicates()
            hits = self.nodes.select(F.col("gid").alias("__match_gid")).join(
                F.broadcast(wanted), "__match_gid", "left_semi"
            )
            self.rows = self.rows.join(
                F.broadcast(hits),
                F.col(f"{var}__gid") == F.col("__match_gid"),
                "left_semi",
            )
            self.node_vars.add(var)
        else:
            # store-filter scan: MATCH (n:Label {source: 'x'}) [WHERE ...]
            pred = F.lit(True)
            if pat.label is not None:
                # multi-label set membership (SET n:%s accumulates)
                pred = pred & F.array_contains(labels_expr(self.nodes), pat.label)
            for k, v in pat.props.items():
                col = F.col(k) if k in ("gid", "label", "source") else F.col("props").getItem(k)
                pred = pred & _prop_cmp(col, "=", _pat_literal(k, v))
            if c.where is not None:
                pred = pred & self._node_condition(pat.var, c.where)
            var = pat.var or "_n"
            self.filters[var] = pred

    def _node_condition(self, var: str | None, e: Expr) -> Column:
        """WHERE over a single store-filter node variable, evaluated
        directly against the nodes table columns."""
        from opencypher_datalayer_spark.plans.cypher import Bool, Cmp, IsNull, Not

        if isinstance(e, Bool):
            l, r = self._node_condition(var, e.left), self._node_condition(var, e.right)
            return (l & r) if e.op == "AND" else (l | r)
        if isinstance(e, Not):
            return ~self._node_condition(var, e.inner)
        if isinstance(e, IsNull):
            c = self._node_col(var, e.inner)
            return c.isNotNull() if e.negated else c.isNull()
        if isinstance(e, Cmp) and isinstance(e.right, Lit):
            return _prop_cmp(self._node_col(var, e.left), e.op, e.right.value)
        raise CypherError("unsupported WHERE in write statement")

    def _node_col(self, var: str | None, e: Expr) -> Column:
        if not isinstance(e, Prop) or e.var != var:
            raise CypherError("WHERE must reference the matched variable")
        return F.col(e.key) if e.key in ("gid", "label", "source") else F.col("props").getItem(e.key)

    def _match_edge(self, path: PathPat, c: MatchClause) -> None:
        # OPTIONAL MATCH (n)-[r]->() / (n)<-[r]-() / (n)-[r]-() — bind r
        # to the outgoing / incoming / incident edges of n
        src, dst = path.nodes
        epat = path.edges[0]
        if src.var is None or src.label or src.props or dst.label or dst.props:
            raise CypherError("edge MATCH supports (boundVar)-[r]->() only")
        anchor = {"out": "src", "in": "dst", "both": "both"}[epat.direction]
        binding = _EdgeBinding(
            self._gids_of(src.var), epat.rel_type, anchor=anchor
        )
        self.edge_vars[epat.var or "_r"] = binding

    def _created_of(self, item) -> DataFrame:
        var = getattr(item, "var", None)
        if var not in self.created:
            raise CypherError(
                "ON CREATE/ON MATCH SET must target the merged node variable"
            )
        return self.created[var]

    def _matched_of(self, item) -> DataFrame:
        # both sides are item-bounded; broadcast the created set so the
        # branch selector never plans a shuffle
        return self._gids_of(item.var).join(
            F.broadcast(self._created_of(item)), "gid", "left_anti"
        )

    # -- CREATE --

    def _create(self, path: PathPat) -> None:
        """CREATE desugars to MERGE + SET (class docstring): gid is the
        identity, the remaining inline properties and the label apply to
        the (created-or-existing) rows."""
        if len(path.nodes) == 1:
            pat = path.nodes[0]
            if "gid" not in pat.props:
                raise CypherError("CREATE requires a {gid: <expr>} property")
            var = pat.var or "_n"
            self._merge_node(NodePat(var, pat.label, {"gid": pat.props["gid"]}))
            if pat.label is not None:
                self._set(SetLabel(var, pat.label))
            for k, v in pat.props.items():
                if k != "gid":
                    self._set(SetProp(var, k, v))
        elif len(path.nodes) == 2:
            self._merge_edge(path)
        else:
            raise CypherError("CREATE supports a node or a single relationship")

    # -- REMOVE --

    def _remove(self, item) -> None:
        if isinstance(item, RemoveProp):
            hits = F.broadcast(
                self._gids_of(item.var).withColumn("__hit", F.lit(True))
            )
            key = item.key
            self.nodes = (
                self.nodes.join(hits, "gid", "left")
                .withColumn(
                    "props",
                    F.when(
                        F.col("__hit"),
                        F.map_filter(F.col("props"), lambda k, v: k != key),
                    ).otherwise(F.col("props")),
                )
                .drop("__hit")
            )
            return
        # RemoveLabel: drop from the accumulated set; the scalar label
        # column falls back to another held label (or NULL when none)
        hits = F.broadcast(self._gids_of(item.var).withColumn("__hit", F.lit(True)))
        joined = self.nodes.join(hits, "gid", "left")
        if "labels" not in joined.columns:
            joined = joined.withColumn("labels", F.lit(None).cast("array<string>"))
        remaining = F.array_remove(labels_expr(joined), item.label)
        self.nodes = (
            joined.withColumn(
                "labels",
                F.when(F.col("__hit"), remaining).otherwise(labels_expr(joined)),
            )
            .withColumn(
                "label",
                F.when(
                    F.col("__hit") & (F.col("label") == F.lit(item.label)),
                    F.get(remaining, 0),
                ).otherwise(F.col("label")),
            )
            .drop("__hit")
        )

    # -- MERGE --

    def _merge(self, path: PathPat, track_created: bool = False) -> None:
        if len(path.nodes) == 1:
            self._merge_node(path.nodes[0], track_created)
        elif len(path.nodes) == 2:
            self._merge_edge(path)
        else:
            raise CypherError("MERGE supports a node or a single relationship")

    def _merge_node(self, pat: NodePat, track_created: bool = False) -> None:
        """MERGE (n {gid: <expr>}): ensure a node exists per distinct gid;
        existing nodes are untouched (C3 stub semantics — later SETs do
        the updating for C2)."""
        if pat.props.keys() != {"gid"}:
            raise CypherError("node MERGE key must be {gid: <expr>}")
        if self.rows is None:
            # literal MERGE without UNWIND: one unit row drives it
            self.rows = self.spark.range(1).select(F.col("id").alias("_seq"))
        var = pat.var or "_n"
        self.rows = self.rows.withColumn(f"{var}__gid", self.val(pat.props["gid"]))
        self.node_vars.add(var)
        gids = self.rows.select(F.col(f"{var}__gid").alias("gid")).dropDuplicates()
        self.added_bound += self._n_items
        if self.small_store:
            # known-small store: one anti against the broadcast store
            missing = gids.join(
                F.broadcast(self.nodes.select("gid")), "gid", "left_anti"
            )
        else:
            # inverted anti-join (store.py C3 idiom): semi-join the store
            # against the broadcast item gids (shuffle-free store scan,
            # item-bounded output), then a broadcast anti of tiny vs tiny —
            # instead of shuffling the whole store for a SortMergeJoin
            # whose left side is a driver-bounded $items batch
            existing = self.nodes.select("gid").join(
                F.broadcast(gids), "gid", "left_semi"
            )
            missing = gids.join(F.broadcast(existing), "gid", "left_anti")
        if track_created:
            # remember what this MERGE inserted for ON CREATE/ON MATCH
            # branch selection. Materialized via localCheckpoint: the
            # created-set must be pinned against the PRE-union store
            # (both branches re-read it), and the reference-template
            # path never pays this — tracking is requested only when an
            # ON branch exists.
            self.created[var] = missing.localCheckpoint()
        stubs = missing.select(
            "gid",
            F.lit(pat.label).cast("string").alias("label"),
            (
                F.array(F.lit(pat.label))
                if pat.label is not None
                else F.array().cast("array<string>")
            ).alias("labels"),
            F.lit(None).cast("string").alias("source"),
            F.create_map().cast("map<string,string>").alias("props"),
        )
        self.nodes = self.nodes.unionByName(stubs, allowMissingColumns=True)

    def _merge_edge(self, path: PathPat) -> None:
        """MERGE (a)-[r:TYPE]->(b): at most one edge per (src, type, dst)
        (C4); endpoints were bound by prior MATCH/MERGE clauses.
        ``(a)<-[r:TYPE]-(b)`` stores the edge b->a; an undirected
        relationship pattern is ambiguous in a write and rejected."""
        src, dst = path.nodes
        epat = path.edges[0]
        if epat.direction == "both":
            raise CypherError(
                "MERGE/CREATE requires a directed relationship pattern"
            )
        if epat.direction == "in":
            # (a)<-[r]-(b): the stored edge runs b -> a
            src, dst = dst, src
        if epat.rel_type is None:
            raise CypherError("relationship MERGE requires a type")
        if src.var not in self.node_vars or dst.var not in self.node_vars:
            raise CypherError("relationship MERGE endpoints must be bound")
        keys = (
            self.rows.select(
                F.col(f"{src.var}__gid").alias("src"),
                F.lit(epat.rel_type).alias("rel_type"),
                F.col(f"{dst.var}__gid").alias("dst"),
            )
            .dropDuplicates()
        )
        self.added_bound += self._n_items
        if self.small_store:
            # known-small store: one anti against the broadcast edge keys
            new = keys.join(
                F.broadcast(self.edges.select("src", "rel_type", "dst")),
                ["src", "rel_type", "dst"],
                "left_anti",
            ).select(
                "src", "rel_type", "dst", F.lit(None).cast("string").alias("source")
            )
        else:
            # inverted anti-join (same idiom as _merge_node): the edge
            # store never shuffles — it is semi-probed by the broadcast
            # item keys, and the anti runs tiny vs tiny
            existing = self.edges.select("src", "rel_type", "dst").join(
                F.broadcast(keys), ["src", "rel_type", "dst"], "left_semi"
            )
            new = keys.join(
                F.broadcast(existing), ["src", "rel_type", "dst"], "left_anti"
            ).select(
                "src", "rel_type", "dst", F.lit(None).cast("string").alias("source")
            )
        self.edges = self.edges.unionByName(new)
        self.edge_vars[epat.var or "_r"] = _EdgeBinding(
            keys.select(F.col("src").alias("gid")).dropDuplicates(),
            epat.rel_type,
            src_var=src.var,
            dst_var=dst.var,
        )

    # -- SET --

    def _set(self, item, restrict: DataFrame | None = None) -> None:
        """Apply one SET item; ``restrict`` (a one-column gid frame)
        narrows the touched rows — the ON CREATE/ON MATCH SET branch
        selector after a MERGE."""
        if isinstance(item, SetLabel):
            gids = self._gids_of(item.var)
            if restrict is not None:
                gids = gids.join(restrict, "gid", "left_semi")
            hits = F.broadcast(gids.withColumn("__hit", F.lit(True)))
            new_labels = F.array_sort(
                F.array_union(labels_expr(self.nodes), F.array(F.lit(item.label)))
            )
            joined = self.nodes.join(hits, "gid", "left")
            if "labels" not in joined.columns:
                joined = joined.withColumn("labels", F.lit(None).cast("array<string>"))
            self.nodes = (
                joined.withColumn(
                    "labels",  # SET n:%s ADDS to the label set (neo4j.go:107)
                    F.when(F.col("__hit"), new_labels).otherwise(F.col("labels")),
                )
                .withColumn(
                    "label",
                    F.when(F.col("__hit"), F.lit(item.label)).otherwise(F.col("label")),
                )
                .drop("__hit")
            )
        elif isinstance(item, SetAll):
            self._set_all(item, restrict)
        elif isinstance(item, SetProp):
            if item.var in self.edge_vars:
                if restrict is not None:
                    raise CypherError(
                        "ON CREATE/ON MATCH SET supports node properties only"
                    )
                self._set_edge_prop(item)
            else:
                self._set_node_prop(item, restrict)
        else:  # pragma: no cover
            raise CypherError(f"unsupported SET item {item!r}")

    def _set_all(self, item: SetAll, restrict: DataFrame | None = None) -> None:
        """SET n = item: wholesale property replace (``neo4j.go:108``) —
        props become the item map minus the envelope keys, ``source``
        comes from the map; a gid repeated in the batch resolves to its
        last item (UNWIND order)."""
        if item.var not in self.node_vars:
            raise CypherError("SET var = map requires a bound node variable")
        mapcol = self.val(item.value)
        w = Window.partitionBy(f"{item.var}__gid").orderBy(F.col("_seq").desc())
        updates = (
            self.rows.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                F.col(f"{item.var}__gid").alias("gid"),
                mapcol.alias("__newmap"),
            )
        )
        if restrict is not None:
            updates = updates.join(restrict, "gid", "left_semi")
        self.nodes = (
            self.nodes.join(F.broadcast(updates), "gid", "left")
            .withColumn(
                "source",
                F.when(F.col("__newmap").isNotNull(), F.col("__newmap").getItem("source"))
                .otherwise(F.col("source")),
            )
            .withColumn(
                "props",
                F.when(
                    F.col("__newmap").isNotNull(),
                    F.map_filter(
                        F.col("__newmap"), lambda k, v: (k != "gid") & (k != "source")
                    ),
                ).otherwise(F.col("props")),
            )
            .drop("__newmap")
        )

    def _set_node_prop(self, item: SetProp, restrict: DataFrame | None = None) -> None:
        """SET n.key = value: single-property patch (beyond the
        reference's templates, but part of the SET clause surface)."""
        if item.var not in self.node_vars:
            raise CypherError(f"undefined node variable {item.var!r}")
        w = Window.partitionBy(f"{item.var}__gid").orderBy(F.col("_seq").desc())
        updates = (
            self.rows.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                F.col(f"{item.var}__gid").alias("gid"),
                self.val(item.value).alias("__newval"),
                F.lit(True).alias("__hit"),
            )
        )
        if restrict is not None:
            updates = updates.join(restrict, "gid", "left_semi")
        key = item.key
        self.nodes = (
            self.nodes.join(F.broadcast(updates), "gid", "left")
            .withColumn(
                "props",
                F.when(
                    F.col("__hit"),
                    F.map_concat(
                        F.map_filter(F.col("props"), lambda k, v: k != key),
                        F.map_from_arrays(
                            F.array(F.lit(key)), F.array(F.col("__newval"))
                        ),
                    ),
                ).otherwise(F.col("props")),
            )
            .drop("__newval", "__hit")
        )

    def _set_edge_prop(self, item: SetProp) -> None:
        """SET r.source = <expr>; ``r.type`` is accepted but stores
        nothing (module docstring — the reference's r.type is always
        null, ``neo4j.go:215-220``)."""
        if item.key == "type":
            return
        if item.key != "source":
            raise CypherError(f"unsupported edge property {item.key!r}")
        b = self.edge_vars[item.var]
        if b.src_var is None or b.dst_var is None:
            raise CypherError("SET on a matched (not merged) relationship is unsupported")
        # last item wins per edge key (UNWIND order)
        w = Window.partitionBy(f"{b.src_var}__gid", f"{b.dst_var}__gid").orderBy(
            F.col("_seq").desc()
        )
        upd = (
            self.rows.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                F.col(f"{b.src_var}__gid").alias("src"),
                F.lit(b.rel_type).alias("rel_type"),
                F.col(f"{b.dst_var}__gid").alias("dst"),
                self.val(item.value).alias("__newval"),
                F.lit(True).alias("__hit"),
            )
        )
        self.edges = (
            self.edges.join(F.broadcast(upd), ["src", "rel_type", "dst"], "left")
            .withColumn(
                "source",
                F.when(F.col("__hit"), F.col("__newval")).otherwise(F.col("source")),
            )
            .drop("__newval", "__hit")
        )

    # -- DELETE --

    def _delete(self, name: str, detach: bool) -> None:
        if name in self.edge_vars:
            if detach:
                raise CypherError("DETACH DELETE applies to nodes")
            b = self.edge_vars[name]

            def _drop_matching(edges: DataFrame) -> DataFrame:
                out = edges
                cols = ("src", "dst") if b.anchor == "both" else (b.anchor,)
                for col in cols:
                    doomed = F.broadcast(b.src_gids.withColumnRenamed("gid", col))
                    out = out.join(doomed, col, "left_anti")
                return out

            if b.rel_type is None:
                self.edges = _drop_matching(self.edges)
            else:
                keep_other = self.edges.where(F.col("rel_type") != b.rel_type)
                matching = self.edges.where(F.col("rel_type") == b.rel_type)
                self.edges = keep_other.unionByName(_drop_matching(matching))
            return
        gids = self._gids_of(name)
        if not detach:
            # openCypher: plain DELETE errors if the node still has
            # relationships. One bounded existence probe per side.
            touches = (
                self.edges.join(
                    F.broadcast(gids.withColumnRenamed("gid", "src")), "src", "left_semi"
                ).limit(1).count()
                or self.edges.join(
                    F.broadcast(gids.withColumnRenamed("gid", "dst")), "dst", "left_semi"
                ).limit(1).count()
            )
            if touches:
                raise CypherError(
                    "cannot DELETE a node that still has relationships; "
                    "use DETACH DELETE"
                )
        if name in self.filters:
            # NULL predicate (e.g. stub nodes with NULL label) means
            # no-match: keep the row — coalesce before negating.
            self.nodes = self.nodes.where(
                ~F.coalesce(self.filters[name], F.lit(False))
            )
        else:
            self.nodes = self.nodes.join(F.broadcast(gids), "gid", "left_anti")
        self.edges = _detach_edges(self.edges, gids)


def run_cypher_write(
    store: GraphStore, statement: str, params: dict | None = None
) -> GraphStore:
    """Parse and execute one write statement; returns the new snapshot.

    Covers the reference's five templates (``neo4j.go:95-127``) and the
    general clause surface they draw from.
    """
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    clauses = WriteParser(tokenize(statement)).parse_statement()
    ex = _Exec(store, spark, params or {})
    for c in clauses:
        ex.apply(c)
    # size_hint stays an UPPER BOUND: each MERGE/CREATE site counted the
    # most rows it can add; unknown stays unknown (inversion plan shape)
    hint = None if store.size_hint is None else store.size_hint + ex.added_bound
    return GraphStore(ex.nodes, ex.edges, size_hint=hint)
