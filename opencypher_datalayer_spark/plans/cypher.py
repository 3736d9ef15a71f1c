"""A small openCypher read-query engine on DataFrames.

Pipeline: tokenize -> recursive-descent parse -> plan.

Planning model: one growing DataFrame whose columns are namespaced per
pattern variable (``v__gid``, ``v__label``, ``v__source``, ``v__props``
for nodes; ``v__rel_type``, ``v__rel_source`` for relationships). Each
MATCH pattern becomes joins against the store's nodes/edges tables —
inner for MATCH, left-outer (built as a pre-joined pattern unit) for
OPTIONAL MATCH, exactly the translation table of SURVEY §2-R. RETURN
with aggregates applies Cypher's implicit group-by over the
non-aggregated return terms.

Scale behavior falls out of the translation: label/property predicates
sit directly on the node scan (partition pruning + parquet pushdown),
joins are equi-joins on gid keys that AQE can re-plan, and no driver-side
row iteration exists anywhere.

Property comparisons: property values are stored as strings (the
reference's JSON value domain); when a Cypher literal is numeric the
comparison casts the property to double, otherwise it compares as
string.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opencypher_datalayer_spark.functions.localframe import local_df
from opencypher_datalayer_spark.store import GraphStore, labels_expr, where_label


# Variable-length expansion: deepest vl_max served by the scalar-chain
# fast path (per-hop scalar columns + pairwise uniqueness predicates —
# see _vl_scalar_hops); deeper ranges use the edge-key-array path whose
# per-hop cost stays O(h).
_VL_SCALAR_MAX = 8


class CypherError(ValueError):
    pass


# ----------------------------------------------------------------------
# AST
# ----------------------------------------------------------------------


@dataclass
class NodePat:
    var: str | None
    label: str | None
    props: dict[str, object]


@dataclass
class EdgePat:
    var: str | None
    rel_type: str | None
    # variable-length bounds (MATCH (a)-[:T*1..3]->(b)); None = single hop
    vl_min: int | None = None
    vl_max: int | None = None
    # shortestPath(...) wrapper: reduce the expansion to min-hops per
    # endpoint pair before attaching. True = one row per pair
    # (shortestPath); "all" = every min-hop path row (allShortestPaths)
    shortest: bool | str = False
    # alternation: [:A|B|C] — rel_type holds A, alt_types the rest
    alt_types: list[str] = field(default_factory=list)
    # 'out' (a)-[]->(b), 'in' (a)<-[]-(b), 'both' (a)-[]-(b)
    direction: str = "out"

    @property
    def types(self) -> list[str] | None:
        """All admissible relationship types, or None for untyped."""
        return None if self.rel_type is None else [self.rel_type, *self.alt_types]


@dataclass
class PathPat:
    nodes: list[NodePat]
    edges: list[EdgePat]  # len(edges) == len(nodes) - 1
    # named path: p = (a)-[...]->(b); binds p to (length, nodes, rels)
    var: str | None = None


@dataclass
class MatchClause:
    paths: list[PathPat]
    optional: bool
    where: "Expr | None"


@dataclass
class ReturnItem:
    expr: "Expr"
    alias: str | None

    @property
    def name(self) -> str:
        return self.alias or _expr_name(self.expr)


@dataclass
class WithStage:
    """MATCH* WITH items [ORDER BY ...] [SKIP n] [LIMIT n] [WHERE expr]
    — a projection/aggregation stage feeding the next part of the query
    (Cypher's pipeline operator). ORDER BY/SKIP/LIMIT select rows on
    the projected stage (mid-pipeline top-k); WHERE then filters the
    selected rows."""

    matches: list[MatchClause]
    items: list["ReturnItem"]
    where: "Expr | None"
    order_by: list[tuple["Expr", bool]] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None
    distinct: bool = False  # WITH DISTINCT: dedup the projected rows
    star: bool = False  # WITH *: pass every bound variable through


@dataclass
class Query:
    matches: list[MatchClause]
    where: "Expr | None"
    returns: list[ReturnItem]
    order_by: list[tuple["Expr", bool]] = field(default_factory=list)  # (expr, asc)
    skip: int | None = None
    limit: int | None = None
    distinct: bool = False
    stages: list[WithStage] = field(default_factory=list)  # WITH pipeline before matches
    unwinds: list[tuple["Expr", str]] = field(default_factory=list)  # (source, var)
    star: bool = False  # RETURN *: project every bound variable


# Expressions
@dataclass
class Lit:
    value: object


@dataclass
class Prop:
    var: str
    key: str


@dataclass
class Var:
    name: str


@dataclass
class Cmp:
    op: str
    left: "Expr"
    right: "Expr"


@dataclass
class Bool:
    op: str  # AND / OR
    left: "Expr"
    right: "Expr"


@dataclass
class Not:
    inner: "Expr"


@dataclass
class IsNull:
    inner: "Expr"
    negated: bool


@dataclass
class StrPred:
    """STARTS WITH / ENDS WITH / CONTAINS / =~ / IN predicates (engine
    extension beyond the reference's dozen clauses, SURVEY §2-R note).
    All translate to pushdown-friendly builtins (startswith / endswith /
    contains / rlike / isin)."""

    op: str  # starts_with | ends_with | contains | regex | in
    left: "Expr"
    right: "Expr"


@dataclass
class Agg:
    fn: str  # collect/count/sum/min/max/avg/stdev/stdevp/percentilecont/percentiledisc
    inner: "Expr | None"  # None => count(*)
    distinct: bool = False
    # the percentile for percentileCont/percentileDisc
    param: float | None = None


# aggregation functions spelled as plain calls (not keywords):
# stDev(x), stDevP(x), percentileCont(x, p), percentileDisc(x, p)
_EXTRA_AGGS = frozenset({"stdev", "stdevp", "percentilecont", "percentiledisc"})


@dataclass
class Param:
    """A ``$name`` statement parameter (write statements; neo4j.go:245)."""

    name: str


@dataclass
class PatternExists:
    """EXISTS((n)-[:T]->(m)) / EXISTS { (n)-[:T]->(m) } pattern
    predicate (engine extension): true iff the bound variable has at
    least one matching edge. Planned as a left join against a
    deduplicated marker frame + IS NOT NULL — a semi-join the optimizer
    can reorder, composing correctly under NOT/AND/OR."""

    path: "PathPat"


@dataclass
class PatternCompr:
    """[(n)-[:T]->(m) WHERE pred | expr] pattern comprehension: the
    list of ``expr`` over every match of the pattern, per source row.

    Planned as one aggregation + left join: the single-hop pattern
    becomes an edge/target-node frame, ``expr`` compiles over it, a
    groupBy(src) collects the values, and the list attaches to the
    outer frame keyed on the bound variable's gid (no per-row subquery
    execution — the whole comprehension is ONE shuffle regardless of
    outer cardinality, the plan shape that survives 100x data).

    Engine semantics (documented deviations from Neo4j, both for
    deterministic oracle hashing): the list is sorted ascending
    (openCypher leaves comprehension order unspecified), and NULL
    projections are dropped (collect_list semantics)."""

    path: "PathPat"
    where: "Expr | None"
    expr: "Expr"


@dataclass
class Arith:
    """Arithmetic expression (engine extension): + - * / %. Evaluates in
    double (props are stored as strings; the cast makes 'age' + 1 work
    the way a dynamic-schema graph user expects)."""

    op: str
    left: "Expr"
    right: "Expr"


@dataclass
class Case:
    """CASE expression (engine extension), both openCypher forms:
    generic ``CASE WHEN pred THEN v ... [ELSE v] END`` and simple
    ``CASE operand WHEN val THEN v ... [ELSE v] END``. Maps 1:1 onto
    ``F.when().when().otherwise()`` — stays inside codegen."""

    operand: "Expr | None"
    whens: list[tuple["Expr", "Expr"]]
    default: "Expr | None"


@dataclass
class Func:
    """Scalar function call (engine extension — the reference's only
    scalar function is its Go-side prefix strip, W9)."""

    name: str
    args: list["Expr"]


@dataclass
class MapLit:
    """Map literal in an expression position (RETURN {a: 1, b: n.x}).
    Compiles to a named struct — the closest columnar shape to a
    Cypher map value (heterogeneous field types allowed)."""

    entries: list[tuple[str, "Expr"]]


@dataclass
class MapProjAll:
    """Map projection with ``.*``: ``n {.*}`` / ``n {.*, k: expr}``.

    Compiles onto the node's dynamic ``props`` MAP column (keys are not
    statically known in a schemaless property graph, so this cannot be
    a struct like :class:`MapLit`). Engine deviation, documented in the
    README crosswalk: the result is a ``map<string,string>`` — override
    entries are cast to string to fit the props value type; overridden
    keys are removed from the base map first (Spark's ``map_concat``
    rejects duplicate keys under the default dedup policy)."""

    var: str
    entries: list[tuple[str, "Expr"]]


@dataclass
class ListPred:
    """any/all/none/single(x IN list WHERE pred) — compiles onto
    Spark's array higher-order functions (exists/forall), with the
    lambda variable resolved through the planner's lambda scope."""

    op: str  # any | all | none | single
    var: str
    src: "Expr"
    pred: "Expr"


@dataclass
class ListCompr:
    """[x IN list WHERE pred | expr] — F.filter + F.transform."""

    var: str
    src: "Expr"
    pred: "Expr | None"
    map: "Expr | None"


@dataclass
class Reduce:
    """reduce(acc = init, x IN list | expr) — F.aggregate."""

    acc: str
    init: "Expr"
    var: str
    src: "Expr"
    expr: "Expr"


Expr = (
    Lit | Prop | Var | Cmp | Bool | Not | IsNull | Agg | Param | Func | Case
    | PatternExists | Arith | MapLit | MapProjAll | ListPred | ListCompr | Reduce
)


_STRING_FUNCS = frozenset(
    {"tostring", "toupper", "tolower", "trim", "ltrim", "rtrim",
     "reverse", "substring", "replace"}
)


def _is_stringy(e: "Expr") -> bool:
    """Statically string-typed: a string literal, a string-returning
    function, or a '+' chain containing one. Property accesses are
    dynamically typed (string-stored) and deliberately excluded."""
    if isinstance(e, Lit):
        return isinstance(e.value, str)
    if isinstance(e, Func):
        return e.name in _STRING_FUNCS
    if isinstance(e, Arith) and e.op == "+":
        return _is_stringy(e.left) or _is_stringy(e.right)
    if isinstance(e, Case):
        return any(_is_stringy(t) for _, t in e.whens) or (
            e.default is not None and _is_stringy(e.default)
        )
    return False


def _is_temporal(e: "Expr") -> bool:
    """Statically temporal-typed: a date()/datetime()/duration() call or
    a +/- chain containing one (duration arithmetic must skip the
    numeric double-cast path)."""
    if isinstance(e, Func):
        return e.name in ("date", "datetime", "localdatetime", "duration")
    if isinstance(e, Arith) and e.op in ("+", "-"):
        return _is_temporal(e.left) or _is_temporal(e.right)
    return False


def _is_dateonly(e: "Expr") -> bool:
    """The expression produces a DATE (not a timestamp): a date() call,
    or date arithmetic (Spark widens date +- day-time interval to
    timestamp; openCypher keeps it a date, so the result is cast back)."""
    if isinstance(e, Func):
        return e.name == "date"
    if isinstance(e, Arith) and e.op in ("+", "-"):
        return _is_dateonly(e.left)
    return False


_ISO_DURATION = re.compile(
    r"^P(?:(?P<y>\d+)Y)?(?:(?P<mo>\d+)M)?(?:(?P<w>\d+)W)?(?:(?P<d>\d+)D)?"
    r"(?:T(?:(?P<h>\d+)H)?(?:(?P<mi>\d+)M)?(?:(?P<s>\d+(?:\.\d+)?)S)?)?$"
)


def _duration_parts(e: "Expr") -> dict[str, float]:
    """Extract duration components from duration('P1DT2H') (ISO-8601
    literal) or duration({days: 1, hours: 2}) (map form)."""
    fields = ("years", "months", "weeks", "days", "hours", "minutes", "seconds")
    if isinstance(e, Lit) and isinstance(e.value, str):
        m = _ISO_DURATION.match(e.value)
        if not m or e.value == "P":
            raise CypherError(f"invalid ISO-8601 duration {e.value!r}")
        g = m.groupdict()
        return {
            k: float(g[s] or 0)
            for k, s in zip(fields, ("y", "mo", "w", "d", "h", "mi", "s"))
        }
    if isinstance(e, MapLit):
        parts = dict.fromkeys(fields, 0.0)
        for k, v in e.entries:
            if k not in parts:
                raise CypherError(f"unknown duration component {k!r}")
            if not isinstance(v, Lit) or isinstance(v.value, (str, bool)):
                raise CypherError("duration components must be numeric literals")
            parts[k] = float(v.value)
        return parts
    raise CypherError(
        "duration() takes an ISO-8601 string literal or a component map"
    )


def _expr_name(e: Expr) -> str:
    if isinstance(e, Prop):
        return f"{e.var}.{e.key}"
    if isinstance(e, Var):
        return e.name
    if isinstance(e, Agg):
        inner = "*" if e.inner is None else _expr_name(e.inner)
        return f"{e.fn}({inner})"
    if isinstance(e, Func):
        return f"{e.name}({', '.join(_expr_name(a) for a in e.args)})"
    if isinstance(e, Lit):
        return str(e.value)
    return "expr"


# ----------------------------------------------------------------------
# Tokenizer
# ----------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*[\s\S]*?\*/)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<bquote>`[^`]+`)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<arrow>-\[|\]->|\]-|<-\[|-->|<--|--)
  | (?P<sym><>|<=|>=|=~|[(){}\[\],.:=<>*+/%|^;-])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "match", "optional", "where", "return", "order", "by", "skip", "limit",
    "as", "and", "or", "xor", "not", "is", "null", "true", "false", "distinct",
    "asc", "ascending", "desc", "descending", "collect", "count", "sum",
    "min", "max", "avg", "starts", "ends", "contains", "in",
    "case", "when", "then", "else", "end", "union", "all",
    # write-statement clauses (plans.cypher_write)
    "unwind", "with", "merge", "set", "delete", "detach",
}


@dataclass
class Tok:
    kind: str  # string/number/name/kw/sym/arrow
    text: str
    value: object = None


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise CypherError(f"cannot tokenize at: {src[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "string":
            toks.append(Tok("string", text, value=text[1:-1].replace("\\'", "'").replace('\\"', '"')))
        elif kind == "param":
            toks.append(Tok("param", text, value=text[1:]))
        elif kind == "bquote":
            # backtick-quoted identifier: always a name, never a keyword
            inner = text[1:-1]
            toks.append(Tok("name", inner, value=inner.lower()))
        elif kind == "number":
            is_float = "." in text or "e" in text or "E" in text
            toks.append(Tok("number", text, value=float(text) if is_float else int(text)))
        elif kind == "name":
            low = text.lower()
            toks.append(Tok("kw" if low in _KEYWORDS else "name", text, value=low))
        else:
            toks.append(Tok(kind, text))
    return toks


# ----------------------------------------------------------------------
# Parser
# ----------------------------------------------------------------------


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- helpers --
    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "kw" and t.value in kws

    def at_sym(self, s: str) -> bool:
        t = self.peek()
        return t is not None and t.kind in ("sym", "arrow") and t.text == s

    def take(self) -> Tok:
        t = self.peek()
        if t is None:
            raise CypherError("unexpected end of query")
        self.i += 1
        return t

    def expect_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise CypherError(f"expected {kw.upper()} at {self._ctx()}")
        self.take()

    def expect_sym(self, s: str) -> None:
        if not self.at_sym(s):
            raise CypherError(f"expected {s!r} at {self._ctx()}")
        self.take()

    def _ctx(self) -> str:
        return " ".join(t.text for t in self.toks[self.i : self.i + 5]) or "<end>"

    def _paren_starts_pattern(self) -> bool:
        """At a '(' inside '[': is this a pattern comprehension's node
        (the balanced group is followed by a relationship arrow), or
        just a parenthesized list element like ``[(1), 2]``? Pure token
        lookahead — nothing is consumed."""
        depth = 0
        for j in range(self.i, len(self.toks)):
            txt = self.toks[j].text
            if txt == "(":
                depth += 1
            elif txt == ")":
                depth -= 1
                if depth == 0:
                    nxt = self.toks[j + 1] if j + 1 < len(self.toks) else None
                    return nxt is not None and nxt.text in (
                        "-[", "<-[", "-->", "<--", "--",
                    )
        return False

    # -- grammar --
    def parse_matches(self) -> list[MatchClause]:
        matches: list[MatchClause] = []
        while self.at_kw("match", "optional"):
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
            matches.append(MatchClause(paths, optional, where))
        return matches

    def parse(self) -> Query:
        unwinds: list[tuple[Expr, str]] = []
        while self.at_kw("unwind"):
            self.take()
            src = self.parse_primary()
            if not isinstance(src, (Param, Lit)):
                raise CypherError("UNWIND expects a $parameter or a list literal")
            self.expect_kw("as")
            unwinds.append((src, self.take().text))
        stages: list[WithStage] = []
        matches = self.parse_matches()
        if not matches and not unwinds and not self.at_kw("return", "with"):
            # standalone RETURN/WITH queries (RETURN 1+1) plan over a
            # single unit row, like openCypher's implicit empty match
            raise CypherError("query must start with MATCH, UNWIND, WITH or RETURN")
        while self.at_kw("with"):
            self.take()
            distinct_stage = False
            if self.at_kw("distinct"):
                self.take()
                distinct_stage = True
            star = False
            items: list[ReturnItem] = []
            if self.at_sym("*"):
                self.take()
                star = True
                while self.at_sym(","):  # WITH *, expr AS alias
                    self.take()
                    items.append(self.parse_return_item())
            else:
                items = [self.parse_return_item()]
                while self.at_sym(","):
                    self.take()
                    items.append(self.parse_return_item())
            order_by, skip, limit = self._parse_order_skip_limit()
            where = None
            if self.at_kw("where"):
                self.take()
                where = self.parse_expr()
            stages.append(
                WithStage(
                    matches, items, where, order_by, skip, limit, distinct_stage, star
                )
            )
            matches = self.parse_matches()

        self.expect_kw("return")
        distinct = False
        if self.at_kw("distinct"):
            self.take()
            distinct = True
        star = False
        returns: list[ReturnItem] = []
        if self.at_sym("*"):
            self.take()
            star = True
        else:
            returns = [self.parse_return_item()]
            while self.at_sym(","):
                self.take()
                returns.append(self.parse_return_item())

        order_by, skip, limit = self._parse_order_skip_limit()
        return Query(
            matches, None, returns, order_by, skip, limit, distinct, stages,
            unwinds, star,
        )

    def parse_union(self) -> list[tuple[bool, "Query"]]:
        """Top level: query (UNION [ALL] query)*. Returns [(all?, q), ...]
        with the first branch's flag unused. Mixing UNION and UNION ALL
        in one statement is rejected (as in openCypher)."""
        branches = [(False, self.parse())]
        flags: set[bool] = set()
        while self.at_kw("union"):
            self.take()
            keep_dups = False
            if self.at_kw("all"):
                self.take()
                keep_dups = True
            flags.add(keep_dups)
            branches.append((keep_dups, self.parse()))
        if len(flags) > 1:
            raise CypherError("cannot mix UNION and UNION ALL")
        if self.at_sym(";"):  # statement terminator
            self.take()
        if self.peek() is not None:
            raise CypherError(f"unexpected trailing input: {self._ctx()}")
        return branches

    def _parse_order_skip_limit(
        self,
    ) -> tuple[list[tuple[Expr, bool]], int | None, int | None]:
        order_by: list[tuple[Expr, bool]] = []
        if self.at_kw("order"):
            self.take()
            self.expect_kw("by")
            while True:
                e = self.parse_expr()
                asc = True
                if self.at_kw("asc", "ascending", "desc", "descending"):
                    asc = self.take().value in ("asc", "ascending")
                order_by.append((e, asc))
                if self.at_sym(","):
                    self.take()
                    continue
                break
        skip = limit = None
        if self.at_kw("skip"):
            self.take()
            skip = int(self.take().value)
        if self.at_kw("limit"):
            self.take()
            limit = int(self.take().value)
        return order_by, skip, limit

    def parse_path(self) -> PathPat:
        t = self.peek()
        if (
            t is not None and t.kind == "name"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1].text == "="
            and self.i + 2 < len(self.toks)
            and self.toks[self.i + 2].text.lower() in ("(", "shortestpath", "allshortestpaths")
        ):
            # named path: p = (a)-[...]->(b) — consumed here, bound by
            # the planner to (length, nodes, relationships)
            pvar = self.take().text
            self.take()  # '='
            inner = self.parse_path()
            inner.var = pvar
            return inner
        if t and t.kind == "name" and t.text.lower() in ("shortestpath", "allshortestpaths"):
            # shortestPath((a)-[:T*1..k]->(b)) — openCypher wrapper; the
            # inner pattern must be a single var-length relationship.
            # allShortestPaths keeps EVERY minimum-hop path row instead
            # of one row per endpoint pair.
            all_mode = self.take().text.lower() == "allshortestpaths"
            self.expect_sym("(")
            inner = self.parse_path()
            self.expect_sym(")")
            if len(inner.edges) != 1 or inner.edges[0].vl_min is None:
                raise CypherError(
                    "shortestPath requires a single var-length relationship"
                )
            inner.edges[0].shortest = "all" if all_mode else True
            return inner
        nodes = [self.parse_node()]
        edges: list[EdgePat] = []
        while self.at_sym("-[") or self.at_sym("<-[") or self.at_sym("-->") \
                or self.at_sym("<--") or self.at_sym("--"):
            if self.at_sym("-->"):
                self.take()
                edges.append(EdgePat(None, None))
            elif self.at_sym("<--"):
                self.take()
                edges.append(EdgePat(None, None, direction="in"))
            elif self.at_sym("--"):
                self.take()
                edges.append(EdgePat(None, None, direction="both"))
            else:
                left_arrow = self.at_sym("<-[")
                self.take()
                var = rel = None
                alts: list[str] = []
                vl_min = vl_max = None
                t = self.peek()
                if t and t.kind == "name":
                    var = self.take().text
                if self.at_sym(":"):
                    self.take()
                    rel = self.take().text
                    while self.at_sym("|"):  # [:A|B] / [:A|:B] alternation
                        self.take()
                        if self.at_sym(":"):
                            self.take()
                        alts.append(self.take().text)
                if self.at_sym("*"):
                    self.take()
                    vl_min, vl_max = 1, 10  # bare * default cap
                    t = self.peek()
                    if t and t.kind == "number":
                        vl_min = vl_max = int(self.take().value)
                    if self.at_sym("."):
                        self.take()
                        self.expect_sym(".")
                        vl_max = int(self.take().value)
                if left_arrow:
                    if self.at_sym("]->"):
                        raise CypherError("a relationship cannot point both ways")
                    self.expect_sym("]-")
                    direction = "in"
                elif self.at_sym("]->"):
                    self.take()
                    direction = "out"
                else:
                    self.expect_sym("]-")
                    direction = "both"
                edges.append(
                    EdgePat(var, rel, vl_min, vl_max, alt_types=alts, direction=direction)
                )
            nodes.append(self.parse_node())
        return PathPat(nodes, edges)

    def parse_node(self) -> NodePat:
        self.expect_sym("(")
        var = label = None
        props: dict[str, object] = {}
        t = self.peek()
        if t and t.kind == "name":
            var = self.take().text
        if self.at_sym(":"):
            self.take()
            label = self.take().text
        if self.at_sym("{"):
            self.take()
            while not self.at_sym("}"):
                key = self.take().text
                self.expect_sym(":")
                # value is a full expression: a literal in plain read
                # patterns, an item access (``item.gid``) in write
                # statements, any scalar expression over bound variables
                # in correlated read patterns ({name: nm}, {gid: p + x})
                props[key] = self.parse_expr()
                if self.at_sym(","):
                    self.take()
            self.expect_sym("}")
        self.expect_sym(")")
        return NodePat(var, label, props)

    def parse_return_item(self) -> ReturnItem:
        e = self.parse_expr()
        alias = None
        if self.at_kw("as"):
            self.take()
            alias = self.take().text
        return ReturnItem(e, alias)

    # expressions: or > xor > and > not > cmp > add > mul > unary > pow
    def parse_expr(self) -> Expr:
        e = self.parse_xor()
        while self.at_kw("or"):
            self.take()
            e = Bool("OR", e, self.parse_xor())
        return e

    def parse_xor(self) -> Expr:
        e = self.parse_and()
        while self.at_kw("xor"):
            self.take()
            e = Bool("XOR", e, self.parse_and())
        return e

    def parse_and(self) -> Expr:
        e = self.parse_not()
        while self.at_kw("and"):
            self.take()
            e = Bool("AND", e, self.parse_not())
        return e

    def parse_not(self) -> Expr:
        if self.at_kw("not"):
            self.take()
            return Not(self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self) -> Expr:
        left = self.parse_add()
        t = self.peek()
        if t and t.kind == "sym" and t.text in ("=", "<>", "<", "<=", ">", ">="):
            op = self.take().text
            return Cmp(op, left, self.parse_add())
        if t and t.kind == "sym" and t.text == "=~":
            self.take()
            return StrPred("regex", left, self.parse_primary())
        if self.at_kw("starts") or self.at_kw("ends"):
            kw = self.take().value
            self.expect_kw("with")
            return StrPred(f"{kw}_with", left, self.parse_primary())
        if self.at_kw("contains"):
            self.take()
            return StrPred("contains", left, self.parse_primary())
        if self.at_kw("in"):
            self.take()
            return StrPred("in", left, self.parse_primary())
        if self.at_kw("is"):
            self.take()
            negated = False
            if self.at_kw("not"):
                self.take()
                negated = True
            self.expect_kw("null")
            return IsNull(left, negated)
        return left

    def parse_add(self) -> Expr:
        e = self.parse_mul()
        while True:
            t = self.peek()
            if t and t.kind == "sym" and t.text in ("+", "-"):
                op = self.take().text
                e = Arith(op, e, self.parse_mul())
            elif (
                t
                and t.kind == "number"
                and t.text.startswith("-")
            ):
                # the tokenizer greedily reads "a -1" as [a, -1]; fold the
                # signed literal back into a subtraction
                self.take()
                e = Arith("+", e, Lit(t.value))
            else:
                return e

    def parse_mul(self) -> Expr:
        e = self.parse_pow()
        while True:
            t = self.peek()
            if t and t.kind == "sym" and t.text in ("*", "/", "%"):
                op = self.take().text
                e = Arith(op, e, self.parse_pow())
            else:
                return e

    def parse_pow(self) -> Expr:
        # openCypher's PowerOfExpression contains UnaryAddOrSubtract,
        # i.e. unary minus binds tighter than ^: -x ^ 2 == (-x)^2
        e = self.parse_unary()
        while self.at_sym("^"):
            self.take()
            e = Arith("^", e, self.parse_unary())
        return e

    def parse_unary(self) -> Expr:
        # unary +/- (binds tighter than ^ per the openCypher grammar)
        if self.at_sym("-"):
            self.take()
            return Arith("-", Lit(0), self.parse_unary())
        if self.at_sym("+"):
            self.take()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> Expr:
        e = self.parse_primary()
        # list subscript: xs[i] (0-based, openCypher)
        while self.at_sym("[") and isinstance(e, (Func, Var, Lit, Prop)):
            self.take()
            idx = self.parse_expr()
            self.expect_sym("]")
            e = Func("_index", [e, idx])
        return e

    def parse_primary(self) -> Expr:
        t = self.peek()
        if t is None:
            raise CypherError("unexpected end of expression")
        if t.kind == "string" or t.kind == "number":
            return Lit(self.take().value)
        if t.kind == "kw" and t.value in ("true", "false", "null"):
            self.take()
            return Lit({"true": True, "false": False, "null": None}[t.value])
        if t.kind == "kw" and t.value in ("collect", "count", "sum", "min", "max", "avg"):
            fn = self.take().value
            self.expect_sym("(")
            distinct = False
            if self.at_kw("distinct"):
                self.take()
                distinct = True
            inner: Expr | None
            if self.at_sym("*"):
                self.take()
                inner = None
            else:
                inner = self.parse_expr()
            self.expect_sym(")")
            return Agg(fn, inner, distinct)
        if t.kind == "param":
            return Param(self.take().value)
        if self.at_kw("case"):
            self.take()
            operand = None if self.at_kw("when") else self.parse_expr()
            whens: list[tuple[Expr, Expr]] = []
            while self.at_kw("when"):
                self.take()
                w = self.parse_expr()
                self.expect_kw("then")
                whens.append((w, self.parse_expr()))
            if not whens:
                raise CypherError("CASE requires at least one WHEN")
            default = None
            if self.at_kw("else"):
                self.take()
                default = self.parse_expr()
            self.expect_kw("end")
            return Case(operand, whens, default)
        if self.at_sym("["):
            self.take()
            if self.at_sym("(") and self._paren_starts_pattern():
                # pattern comprehension: [(n)-[:T]->(m) (WHERE pred)? | expr]
                path = self.parse_path()
                if not path.edges:
                    raise CypherError(
                        "pattern comprehension requires a relationship pattern"
                    )
                where = None
                if self.at_kw("where"):
                    self.take()
                    where = self.parse_expr()
                self.expect_sym("|")
                mape = self.parse_expr()
                self.expect_sym("]")
                return PatternCompr(path, where, mape)
            # list comprehension: [x IN src (WHERE pred)? (| expr)? ]
            t1 = self.peek()
            t2 = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            if (
                t1 is not None and t1.kind == "name"
                and t2 is not None and t2.kind == "kw" and t2.value == "in"
            ):
                var = self.take().text
                self.take()  # IN
                src = self.parse_expr()
                pred = None
                if self.at_kw("where"):
                    self.take()
                    pred = self.parse_expr()
                mape = None
                if self.at_sym("|"):
                    self.take()
                    mape = self.parse_expr()
                self.expect_sym("]")
                return ListCompr(var, src, pred, mape)
            vals: list[object] = []
            while not self.at_sym("]"):
                item = self.parse_primary()
                if not isinstance(item, Lit):
                    raise CypherError("list literals must contain literals")
                vals.append(item.value)
                if self.at_sym(","):
                    self.take()
            self.expect_sym("]")
            return Lit(vals)
        if self.at_sym("{"):
            self.take()
            entries: list[tuple[str, Expr]] = []
            while not self.at_sym("}"):
                key = self.take().text
                self.expect_sym(":")
                entries.append((key, self.parse_expr()))
                if self.at_sym(","):
                    self.take()
            self.expect_sym("}")
            return MapLit(entries)
        if (
            t.kind == "kw" and t.value == "all"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1].text == "("
        ):
            # all(x IN src WHERE pred) — ALL is also the UNION ALL keyword
            self.take()
            self.take()
            var = self.take().text
            self.expect_kw("in")
            src = self.parse_expr()
            self.expect_kw("where")
            pred = self.parse_expr()
            self.expect_sym(")")
            return ListPred("all", var, src, pred)
        if t.kind == "name":
            name = self.take().text
            low = name.lower()
            if low in ("any", "all", "none", "single") and self.at_sym("("):
                # list predicate: any(x IN src WHERE pred)
                self.take()
                var = self.take().text
                self.expect_kw("in")
                src = self.parse_expr()
                self.expect_kw("where")
                pred = self.parse_expr()
                self.expect_sym(")")
                return ListPred(low, var, src, pred)
            if low == "reduce" and self.at_sym("("):
                # reduce(acc = init, x IN src | expr)
                self.take()
                acc = self.take().text
                self.expect_sym("=")
                init = self.parse_expr()
                self.expect_sym(",")
                var = self.take().text
                self.expect_kw("in")
                src = self.parse_expr()
                self.expect_sym("|")
                body = self.parse_expr()
                self.expect_sym(")")
                return Reduce(acc, init, var, src, body)
            if name.lower() == "exists" and self.at_sym("{"):
                self.take()
                path = self.parse_path()
                self.expect_sym("}")
                return PatternExists(path)
            if (
                name.lower() == "exists"
                and self.at_sym("(")
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1].kind == "sym"
                and self.toks[self.i + 1].text == "("
            ):
                self.take()
                path = self.parse_path()
                self.expect_sym(")")
                return PatternExists(path)
            if self.at_sym("("):
                self.take()
                args: list[Expr] = []
                while not self.at_sym(")"):
                    args.append(self.parse_expr())
                    if self.at_sym(","):
                        self.take()
                self.expect_sym(")")
                if low in _EXTRA_AGGS:
                    if low.startswith("percentile"):
                        if len(args) != 2 or not isinstance(args[1], Lit):
                            raise CypherError(
                                f"{name}() takes (expression, percentile-literal)"
                            )
                        return Agg(low, args[0], param=float(args[1].value))
                    if len(args) != 1:
                        raise CypherError(f"{name}() takes one argument")
                    return Agg(low, args[0])
                return Func(low, args)
            if self.at_sym("{"):
                # map projection: n {.name, alias: expr, other_var} —
                # sugar over MapLit (struct column), same compile path
                self.take()
                entries: list[tuple[str, Expr]] = []
                star = False
                while not self.at_sym("}"):
                    if self.at_sym("."):
                        self.take()
                        if self.at_sym("*"):
                            # n {.*, ...}: all properties, see MapProjAll
                            self.take()
                            star = True
                        else:
                            key = self.take().text
                            entries.append((key, Prop(name, key)))
                    else:
                        key = self.take().text
                        if self.at_sym(":"):
                            self.take()
                            entries.append((key, self.parse_expr()))
                        else:
                            entries.append((key, Var(key)))
                    if self.at_sym(","):
                        self.take()
                self.expect_sym("}")
                if star:
                    return MapProjAll(name, entries)
                return MapLit(entries)
            if self.at_sym("."):
                self.take()
                key = self.take().text
                return Prop(name, key)
            return Var(name)
        if self.at_sym("("):
            self.take()
            e = self.parse_expr()
            self.expect_sym(")")
            return e
        raise CypherError(f"cannot parse expression at {self._ctx()}")


# ----------------------------------------------------------------------
# Planner
# ----------------------------------------------------------------------

_NODE_FIELDS = ("gid", "label", "source", "props")


def _pat_literal(k: str, v: object) -> object:
    """Unwrap a pattern-property expression that must be a literal (read
    patterns); write statements handle non-literal values themselves."""
    if not isinstance(v, Lit):
        raise CypherError(f"pattern property {k!r} must be a literal in a read query")
    return v.value


def _node_df(store: GraphStore, pat: NodePat, var: str) -> DataFrame:
    df = store.nodes
    if pat.label is not None:
        df = where_label(df, pat.label)  # multi-label set membership
    for k, v in pat.props.items():
        val = _pat_literal(k, v)
        if k in ("gid", "label", "source"):
            df = df.where(_prop_cmp(F.col(k), "=", val))
        else:
            df = df.where(_prop_cmp(F.col("props").getItem(k), "=", val))
    return df.select(
        *[F.col(f).alias(f"{var}__{f}") for f in _NODE_FIELDS],
        # full label SET, for the labels() accessor (not part of the
        # RETURN-n struct: that shape predates multi-label and is the
        # stable output contract)
        labels_expr(df).alias(f"{var}__labels"),
    )


def _typed_edges(store: GraphStore, ep: EdgePat) -> DataFrame:
    """The store's edge frame filtered to the pattern's admissible
    relationship types ([:A] equality, [:A|B] membership — both sit on
    the scan for parquet pushdown)."""
    ed = store.edges
    types = ep.types
    if types is None:
        return ed
    if len(types) == 1:
        return ed.where(F.col("rel_type") == types[0])
    return ed.where(F.col("rel_type").isin(types))


def _prop_cmp(col: Column, op: str, value: object) -> Column:
    """Property comparison honoring the string-storage model: numeric
    literal => numeric comparison (cast), else string comparison."""
    if value is None:
        return col.isNull() if op == "=" else col.isNotNull()
    if isinstance(value, bool):
        col, value = col == "true", value
        return col if value else ~col
    if isinstance(value, (int, float)):
        col = col.cast("double")
        value = float(value)
    ops = {
        "=": lambda c: c == value,
        "<>": lambda c: c != value,
        "<": lambda c: c < value,
        "<=": lambda c: c <= value,
        ">": lambda c: c > value,
        ">=": lambda c: c >= value,
    }
    return ops[op](col)


class PlanState:
    def __init__(self, store: GraphStore):
        self.store = store
        self.df: DataFrame | None = None
        self.vars: dict[str, str] = {}  # var -> kind ('node'|'edge')
        self._anon = 0
        # set transiently by post_agg_column: repr(Agg) -> column name
        self._agg_map: dict[str, str] | None = None
        # lambda variables in scope (list predicates/comprehensions/
        # reduce): name -> the Column Spark passes to the HOF lambda
        self._lambda: dict[str, Column] = {}
        # pattern-comprehension binds, keyed on repr: the same
        # comprehension in RETURN and ORDER BY joins once, not twice
        self._compr_cache: dict[str, Var] = {}

    def fresh(self, prefix: str) -> str:
        self._anon += 1
        return f"_{prefix}{self._anon}"

    def bind_pattern_exists(self, e: Expr) -> Expr:
        """Rewrite every PatternExists in a predicate tree into a marker
        column: left-join a deduplicated (src has a matching edge) frame
        keyed on the bound variable's gid, then test IS NOT NULL. Doing
        the join before evaluating the predicate keeps the rewrite
        composable under NOT/AND/OR (the marker is just a column), and
        the deduplicated build side makes it a proper semi-join — no
        fan-out, broadcastable when the filtered edge set is small."""
        if isinstance(e, PatternExists):
            p = e.path
            if len(p.nodes) != 2 or len(p.edges) != 1:
                raise CypherError("EXISTS supports a single-hop pattern")
            srcp, dstp = p.nodes
            ep = p.edges[0]
            if ep.vl_min is not None:
                raise CypherError("EXISTS pattern does not take a var-length edge")
            if srcp.var is None or self.vars.get(srcp.var) != "node":
                raise CypherError("EXISTS pattern must start at a bound node variable")
            if srcp.label or srcp.props:
                raise CypherError("EXISTS source must be a bare bound variable")
            if dstp.var is not None and dstp.var in self.vars:
                raise CypherError("EXISTS target must be unbound (use a plain MATCH)")
            flag = self.fresh("exists")
            ed = _typed_edges(self.store, ep)
            if ep.direction == "in":
                ed = ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            elif ep.direction == "both":
                # self-loops enter once (the later dropDuplicates also
                # hides double entries, but keep the shape consistent
                # with the undirected MATCH leg)
                ed = ed.select("src", "dst").unionByName(
                    ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                    .where(F.col("src") != F.col("dst"))
                )
            if dstp.label is not None or dstp.props:
                tvar = self.fresh("t")
                tgt = _node_df(self.store, dstp, tvar)
                ed = ed.join(
                    tgt.select(F.col(f"{tvar}__gid").alias("dst")), "dst"
                )
            marker = (
                ed.select(F.col("src").alias(f"{flag}__gid"))
                .dropDuplicates()
                .withColumn(flag, F.lit(True))
            )
            self.df = self.df.join(
                marker,
                F.col(f"{srcp.var}__gid") == F.col(f"{flag}__gid"),
                "left",
            ).drop(f"{flag}__gid")
            self.vars[flag] = "scalar"
            return IsNull(Var(flag), negated=True)
        if isinstance(e, Bool):
            return Bool(e.op, self.bind_pattern_exists(e.left), self.bind_pattern_exists(e.right))
        if isinstance(e, Not):
            return Not(self.bind_pattern_exists(e.inner))
        return e

    def bind_subqueries(self, e: Expr) -> Expr:
        """Rewrite every pattern subexpression — EXISTS predicates (in
        predicate positions) and pattern comprehensions (anywhere) —
        into columns joined onto the plan frame, so the rest of the
        compiler sees plain variables."""
        return self._rewrite_compr(self.bind_pattern_exists(e))

    def _rewrite_compr(self, e: Expr) -> Expr:
        s = self._rewrite_compr
        if isinstance(e, PatternCompr):
            return self._bind_one_compr(e)
        if isinstance(e, (Cmp, Bool, StrPred, Arith)):
            return type(e)(e.op, s(e.left), s(e.right))
        if isinstance(e, Not):
            return Not(s(e.inner))
        if isinstance(e, IsNull):
            return IsNull(s(e.inner), e.negated)
        if isinstance(e, Agg):
            return Agg(e.fn, None if e.inner is None else s(e.inner), e.distinct, e.param)
        if isinstance(e, Func):
            return Func(e.name, [s(a) for a in e.args])
        if isinstance(e, MapLit):
            return MapLit([(k, s(v)) for k, v in e.entries])
        if isinstance(e, MapProjAll):
            return MapProjAll(e.var, [(k, s(v)) for k, v in e.entries])
        if isinstance(e, ListPred):
            return ListPred(e.op, e.var, s(e.src), s(e.pred))
        if isinstance(e, ListCompr):
            return ListCompr(
                e.var, s(e.src),
                None if e.pred is None else s(e.pred),
                None if e.map is None else s(e.map),
            )
        if isinstance(e, Reduce):
            return Reduce(e.acc, s(e.init), e.var, s(e.src), s(e.expr))
        if isinstance(e, Case):
            return Case(
                None if e.operand is None else s(e.operand),
                [(s(w), s(t)) for w, t in e.whens],
                None if e.default is None else s(e.default),
            )
        return e

    def _bind_one_compr(self, e: PatternCompr) -> Expr:
        """One pattern comprehension -> one aggregation + one left join
        (see :class:`PatternCompr`). The subframe compiles with the
        comprehension's own variables transiently in scope; outer
        variables other than the source node are out of scope by
        design (precise error), since the aggregated subquery cannot
        see per-row outer bindings without a correlated re-execution —
        the exact thing this plan shape avoids."""
        cached = self._compr_cache.get(repr(e))
        if cached is not None:
            return cached
        p = e.path
        if len(p.nodes) != 2 or len(p.edges) != 1:
            raise CypherError("pattern comprehension supports a single-hop pattern")
        if p.var is not None:
            raise CypherError("pattern comprehension cannot bind a path variable")
        srcp, dstp = p.nodes
        ep = p.edges[0]
        if ep.vl_min is not None:
            raise CypherError("pattern comprehension does not take a var-length edge")
        if srcp.var is None or self.vars.get(srcp.var) != "node":
            raise CypherError(
                "pattern comprehension must start at a bound node variable"
            )
        if srcp.label or srcp.props:
            raise CypherError("pattern comprehension source must be a bare bound variable")
        if dstp.var is not None and dstp.var in self.vars:
            raise CypherError("pattern comprehension target must be unbound")
        if ep.var is not None and ep.var in self.vars:
            raise CypherError("pattern comprehension relationship must be unbound")
        evar = ep.var or self.fresh("pce")
        tvar = dstp.var or self.fresh("pct")

        ed = _typed_edges(self.store, ep)

        def _orient(src_col: str, dst_col: str) -> DataFrame:
            return ed.select(
                F.col(src_col).alias("__pc_src"),
                F.col("rel_type").alias(f"{evar}__rel_type"),
                F.col("source").alias(f"{evar}__rel_source"),
                F.col(dst_col).alias("__pc_dst"),
            )

        if ep.direction == "in":
            sub = _orient("dst", "src")
        elif ep.direction == "both":
            # undirected: both orientations, self-loops enter once
            sub = _orient("src", "dst").unionByName(
                _orient("dst", "src").where(F.col("__pc_src") != F.col("__pc_dst"))
            )
        else:
            sub = _orient("src", "dst")
        tgt = _node_df(self.store, dstp, tvar)
        sub = sub.join(tgt, F.col("__pc_dst") == F.col(f"{tvar}__gid"))

        added = {evar: "edge", tvar: "node"}
        clash = [v for v in added if v in self.vars]
        if clash:  # fresh() names cannot clash; user names were checked
            raise CypherError(f"pattern comprehension re-binds {clash[0]!r}")
        # the body compiles against the SUBFRAME, whose columns are only
        # the comprehension's own edge/target vars — swap the scope out
        # entirely so a reference to an outer variable raises a precise
        # CypherError instead of an unresolved-column AnalysisException
        outer_scope = self.vars
        self.vars = dict(added)
        try:
            if e.where is not None:
                where = self._rewrite_nested_compr_guard(e.where)
                sub = sub.where(self.to_condition(where))
            expr = self._rewrite_nested_compr_guard(e.expr)
            sub = sub.select(F.col("__pc_src"), self.to_column(expr).alias("__pc_val"))
        except CypherError as err:
            if "undefined variable" in str(err):
                raise CypherError(
                    f"{err} — a pattern comprehension body can only "
                    f"reference its own pattern variables "
                    f"({', '.join(repr(v) for v in added)})"
                ) from None
            raise
        finally:
            self.vars = outer_scope

        flag = self.fresh("pcl")
        vtype = sub.schema["__pc_val"].dataType
        agg = sub.groupBy(F.col("__pc_src").alias(f"{flag}__gid")).agg(
            F.sort_array(F.collect_list("__pc_val")).alias(flag)
        )
        self.df = self.df.join(
            agg,
            F.col(f"{srcp.var}__gid") == F.col(f"{flag}__gid"),
            "left",
        ).drop(f"{flag}__gid")
        self.df = self.df.withColumn(
            flag, F.coalesce(F.col(flag), F.array().cast(T.ArrayType(vtype)))
        )
        self.vars[flag] = "scalar"
        out = Var(flag)
        self._compr_cache[repr(e)] = out
        return out

    def _rewrite_nested_compr_guard(self, e: Expr) -> Expr:
        """Inside a comprehension body, a nested pattern comprehension
        would need to plan against the subframe — reject precisely."""

        def scan(x: Expr) -> None:
            if isinstance(x, PatternCompr):
                raise CypherError("nested pattern comprehensions are unsupported")
            for name in (
                "left", "right", "inner", "src", "pred", "init",
                "expr", "operand", "default", "map",
            ):
                v = getattr(x, name, None)
                if v is not None and hasattr(v, "__dataclass_fields__"):
                    scan(v)
            for a in getattr(x, "args", []) or []:
                scan(a)
            for _k, v in getattr(x, "entries", []) or []:
                scan(v)
            for w, t in getattr(x, "whens", []) or []:
                scan(w)
                scan(t)

        scan(e)
        return e

    # -- pattern planning --

    def add_match(self, clause: MatchClause) -> None:
        self._lift_dynamic_props(clause)
        if (
            clause.optional
            and self.df is not None
            and (clause.where is not None or len(clause.paths) > 1)
        ):
            # Cypher: an OPTIONAL MATCH — its comma-paths AND its WHERE —
            # is one all-or-nothing pattern: a left row whose pattern
            # matches but fails the predicate (or matches only some of the
            # sibling paths) is null-extended, never dropped and never
            # half-matched. Build the sibling paths into ONE unit
            # (variables shared between siblings become intra-unit joins)
            # and express the WHERE as an extra condition on the single
            # left-outer attach (the predicate may reference both
            # plan-bound and unit-bound variables; column resolution is by
            # name, unique on both sides). A multi-path OPTIONAL MATCH
            # whose paths are NOT anchored to the plan would cartesian —
            # anchored patterns (the common form) stay join-selective.
            cont: tuple[DataFrame | None, set[str], list[tuple[str, str]]] | None = None
            for p in clause.paths:
                cont = self._build_unit(p, cont=cont)
            unit, unit_vars, pending = cont
            extra = self.to_condition(clause.where) if clause.where is not None else None
            self._attach_unit(unit, unit_vars, pending, optional=True, extra_cond=extra)
            return
        for path in clause.paths:
            self._add_path(path, optional=clause.optional)
        if clause.where is not None:
            # inner MATCH — post-filter; also the documented approximation
            # for a leading OPTIONAL MATCH (no rows to null-extend yet)
            cond = self.bind_subqueries(clause.where)
            self.df = self.df.where(self.to_condition(cond))

    def _add_path(self, path: PathPat, optional: bool) -> None:
        unit, unit_vars, pending = self._build_unit(path)
        self._attach_unit(unit, unit_vars, pending, optional)

    def _build_unit(
        self,
        path: PathPat,
        cont: tuple[DataFrame | None, set[str], list[tuple[str, str]]] | None = None,
    ) -> tuple[DataFrame, set[str], list[tuple[str, str]]]:
        """Build the path as a self-contained unit (node-edge-node joins)
        to be attached to the running plan — inner join for MATCH,
        left-outer for OPTIONAL MATCH.

        A path may reference variables already bound in the plan; those
        become *pending pointer columns* (``{var}__ptrN``) inside the
        unit, resolved as equi-join conditions against ``{var}__gid`` at
        attach time. This keeps OPTIONAL MATCH correct: the whole pattern
        either matches or yields one all-null row, never a half-matched
        edge.

        ``cont`` continues a unit under construction (the sibling comma-
        paths of one OPTIONAL MATCH build into a single unit, so variables
        shared between siblings resolve as intra-unit joins and the
        null-extension stays all-or-nothing across the whole clause).
        """
        unit: DataFrame | None
        unit_vars: set[str]
        pending: list[tuple[str, str]]  # (ptr column, plan var)
        if cont is None:
            unit, unit_vars, pending = None, set(), []
        else:
            unit, unit_vars, pending = cont
            unit_vars, pending = set(unit_vars), list(pending)

        def new_ptr(var: str) -> str:
            # plan-unique suffix: units built for sibling paths of one
            # clause may both point at the same plan var and later join
            self._anon += 1
            col = f"{var}__ptr{self._anon}"
            pending.append((col, var))
            return col

        prev_var: str | None = None
        # (evar, src col, dst col, is var-length) per edge — the named-
        # path binding below reads the single edge's endpoint columns
        edge_binds: list[tuple[str, str, str, bool]] = []
        for idx, npat in enumerate(path.nodes):
            var = npat.var or self.fresh("n")
            in_plan = var in self.vars and self.df is not None and f"{var}__gid" in self.df.columns
            in_unit = var in unit_vars
            if (in_plan or in_unit) and (npat.label or npat.props):
                raise CypherError(f"re-binding {var} with new label/props unsupported")

            if idx == 0:
                if not in_plan and not in_unit:
                    ndf = _node_df(self.store, npat, var)
                    # a sibling path starting at a fresh var extends the
                    # unit under construction (constrained by later joins)
                    unit = ndf if unit is None else unit.crossJoin(ndf)
                    unit_vars.add(var)
                # else: path starts at a plan- or unit-bound var; the
                # first edge joins on (or carries a pointer to) it
            else:
                epat = path.edges[idx - 1]
                evar = epat.var or self.fresh("e")
                src_col = (
                    f"{prev_var}__gid" if prev_var in unit_vars else new_ptr(prev_var)
                )
                dst_is_new = not in_plan and not in_unit
                dst_col = f"{var}__gid" if dst_is_new else new_ptr(var)
                edge_binds.append((evar, src_col, dst_col, epat.vl_min is not None))
                if epat.vl_min is not None:
                    edf = self._vl_expand(
                        epat, evar, carry_path=path.var is not None
                    )
                    self.vars[evar] = "vlpath"
                else:
                    edges = _typed_edges(self.store, epat)

                    def _orient(src_col: str, dst_col: str) -> DataFrame:
                        return edges.select(
                            F.col(src_col).alias(f"__src_{evar}"),
                            F.col("rel_type").alias(f"{evar}__rel_type"),
                            F.col("source").alias(f"{evar}__rel_source"),
                            F.col(dst_col).alias(f"__dst_{evar}"),
                        )

                    if epat.direction == "out":
                        edf = _orient("src", "dst")
                    elif epat.direction == "in":
                        # (a)<-[r]-(b): the stored edge runs b -> a, so
                        # the pattern's left node binds the edge dst
                        edf = _orient("dst", "src")
                    else:  # undirected: each edge admits both bindings,
                        # except a self-loop, which openCypher matches
                        # once per undirected pattern — drop the
                        # reversed leg for src == dst rows
                        edf = _orient("src", "dst").unionByName(
                            _orient("dst", "src").where(
                                F.col(f"__src_{evar}") != F.col(f"__dst_{evar}")
                            )
                        )
                    self.vars[evar] = "edge"
                # a var-length edf is path-count-sized (every path row
                # of every hop) — its endpoint attaches join node
                # frames against tens of millions of rows at scale.
                # Hinting the NODE side shuffle_hash skips the
                # sort-merge sort of both huge sides (sf10 order-chain
                # measurement: label attaches 12.7 -> 10.9 s); the hint
                # goes on the node frame so IT is the hash build side.
                vl = epat.vl_min is not None
                if unit is None:
                    unit = edf
                elif prev_var in unit_vars:
                    left = unit.hint("shuffle_hash") if vl else unit
                    unit = left.join(edf, F.col(f"{prev_var}__gid") == F.col(f"__src_{evar}"))
                else:
                    unit = unit.crossJoin(edf)
                # src side: either consumed by the join above or pending
                if prev_var in unit_vars:
                    unit = unit.drop(f"__src_{evar}")
                else:
                    unit = unit.withColumnRenamed(f"__src_{evar}", src_col)
                # dst side
                if dst_is_new:
                    ndf = _node_df(self.store, npat, var)
                    if vl:
                        ndf = ndf.hint("shuffle_hash")
                    unit = unit.join(
                        ndf, F.col(f"__dst_{evar}") == ndf[f"{var}__gid"]
                    ).drop(f"__dst_{evar}")
                    unit_vars.add(var)
                elif in_unit:
                    unit = unit.where(F.col(f"__dst_{evar}") == F.col(f"{var}__gid")).drop(
                        f"__dst_{evar}"
                    )
                else:
                    unit = unit.withColumnRenamed(f"__dst_{evar}", dst_col)
            prev_var = var

        for v in unit_vars:
            self.vars.setdefault(v, "node")

        if unit is None:
            raise CypherError("pattern binds no new variables")

        if path.var is not None:
            # bind p to (length, nodes, relationships) columns. Scope:
            # one relationship pattern per named path (single-hop or
            # var-length) — the idioms length(p)/nodes(p)/
            # relationships(p) all run over this binding.
            if len(path.edges) != 1:
                raise CypherError(
                    "a named path supports exactly one relationship "
                    "pattern (single-hop or var-length)"
                )
            pvar = path.var
            if pvar in self.vars or pvar in unit_vars:
                raise CypherError(f"path variable {pvar!r} is already bound")
            evar, src_col, dst_col, is_vl = edge_binds[0]
            if is_vl:
                unit = (
                    unit.withColumn(f"{pvar}__len", F.col(f"{evar}__hops"))
                    .withColumnRenamed(f"{evar}__pnodes", f"{pvar}__nodes")
                    .withColumnRenamed(f"{evar}__prels", f"{pvar}__rels")
                )
            else:
                unit = (
                    unit.withColumn(f"{pvar}__len", F.lit(1))
                    .withColumn(
                        f"{pvar}__nodes", F.array(F.col(src_col), F.col(dst_col))
                    )
                    .withColumn(f"{pvar}__rels", F.array(F.col(f"{evar}__rel_type")))
                )
            self.vars[pvar] = "path"

        return unit, unit_vars, pending

    def _attach_unit(
        self,
        unit: DataFrame,
        unit_vars: set[str],
        pending: list[tuple[str, str]],
        optional: bool,
        extra_cond: Column | None = None,
    ) -> None:
        if self.df is None:
            if pending:
                raise CypherError("pattern references unbound variables")
            self.df = unit
            return

        join_cond = extra_cond
        for col, var in pending:
            c = F.col(f"{var}__gid") == F.col(col)
            join_cond = c if join_cond is None else (join_cond & c)
        how = "left" if optional else "inner"
        joined = (
            self.df.join(unit, join_cond, how)
            if join_cond is not None
            else self.df.crossJoin(unit)
        )
        for col, _ in pending:
            joined = joined.drop(col)
        self.df = joined

    def _vl_array_hops(
        self, epat: EdgePat, oriented: DataFrame, carry_path: bool
    ) -> list[DataFrame]:
        """Edge-key-array expansion — the general-depth path: each hop
        carries the traversed stored-edge keys as an array and filters
        the next edge via ``array_contains``. Used above
        ``_VL_SCALAR_MAX`` where the scalar-chain's O(h^2) pairwise
        predicate and per-hop column fan-out stop paying."""
        carry = ["_ns", "_rts"] if carry_path else []
        step = oriented.select(
            F.col("_f").alias("_jsrc"),
            F.col("_t").alias("_jdst"),
            F.col("_rt").alias("_jrt"),
            "_k",
        )
        frontier = oriented.select(
            F.col("_f").alias("_s"),
            F.col("_t").alias("_d"),
            F.array("_k").alias("_es"),
            *(
                [F.array("_f", "_t").alias("_ns"), F.array("_rt").alias("_rts")]
                if carry_path
                else []
            ),
        )
        hops: list[DataFrame] = []
        if epat.vl_min <= 1 <= epat.vl_max:
            hops.append(frontier.select("_s", "_d", F.lit(1).alias("_h"), *carry))
        for h in range(2, epat.vl_max + 1):
            frontier = (
                frontier.join(step, frontier._d == step._jsrc)
                .where(~F.array_contains(F.col("_es"), F.col("_k")))
                .select(
                    "_s",
                    F.col("_jdst").alias("_d"),
                    F.array_append("_es", F.col("_k")).alias("_es"),
                    *(
                        [
                            F.array_append("_ns", F.col("_jdst")).alias("_ns"),
                            F.array_append("_rts", F.col("_jrt")).alias("_rts"),
                        ]
                        if carry_path
                        else []
                    ),
                )
            )
            if h >= epat.vl_min:
                hops.append(frontier.select("_s", "_d", F.lit(h).alias("_h"), *carry))
        return hops

    def _vl_scalar_hops(
        self, epat: EdgePat, oriented: DataFrame, carry_path: bool
    ) -> list[DataFrame]:
        """Scalar-chain expansion — the bounded-depth fast path
        (``vl_max <= _VL_SCALAR_MAX``): the traversal carries the node
        chain as SCALAR columns ``_n0.._nh`` (plus per-hop rel types /
        stored-orientation keys only when the pattern needs them), and
        relationship uniqueness is a conjunction of pairwise scalar
        predicates instead of a carried edge-key array. Measured at
        sf10 on the 13.5M-edge order chain: no per-row string concat,
        no array allocation per hop, narrower shuffle rows — 10.4 ->
        7.2 s warm against the array path for *1..3. The join hints
        ``shuffle_hash``: the step side is the edge frame, whose hash
        table build beats the sort-merge sort of both 10M+-row sides.

        Edge identity matches the array path's stored-orientation key
        (src, rel_type, dst): for 'out'/'in' every traversal shares one
        orientation, so the traversal node pair IS the stored pair and
        no extra columns are carried; 'both' walks carry the stored
        (src, dst) per hop (fwd/rev legs of the same stored edge must
        compare equal); the rel-type conjunct is carried only when the
        pattern admits more than one type."""
        types = epat.types
        single_type = types is not None and len(types) == 1
        undirected = epat.direction == "both"
        need_rt = carry_path or not single_type
        step_cols = [F.col("_f").alias("_jf"), F.col("_t").alias("_jt")]
        if need_rt:
            step_cols.append(F.col("_rt").alias("_jrt"))
        if undirected:
            # stored orientation for identity: _k is "src|type|dst" but
            # comparing the split-out columns beats re-deriving; recover
            # stored (src, dst) from the leg: fwd leg has (_f,_t) stored
            # order... the leg info is gone after the union, so carry
            # the stored key string itself (one column, already built)
            step_cols.append(F.col("_k").alias("_jk"))
        step = oriented.select(*step_cols).hint("shuffle_hash")

        def first_cols():
            cols = [F.col("_f").alias("_n0"), F.col("_t").alias("_n1")]
            if need_rt:
                cols.append(F.col("_rt").alias("_r1"))
            if undirected:
                cols.append(F.col("_k").alias("_e1"))
            return cols

        frontier = oriented.select(*first_cols())
        ncols, rcols, kcols = ["_n0", "_n1"], (["_r1"] if need_rt else []), (
            ["_e1"] if undirected else []
        )

        def emit(df: DataFrame, h: int) -> DataFrame:
            sel = [
                F.col(ncols[0]).alias("_s"),
                F.col(ncols[-1]).alias("_d"),
                F.lit(h).alias("_h"),
            ]
            if carry_path:
                sel.append(F.array(*ncols).alias("_ns"))
                sel.append(F.array(*rcols).alias("_rts"))
            return df.select(*sel)

        hops: list[DataFrame] = []
        if epat.vl_min <= 1 <= epat.vl_max:
            hops.append(emit(frontier, 1))
        for h in range(2, epat.vl_max + 1):
            head = ncols[-1]
            pred = None
            for i in range(1, h):
                if undirected:
                    dup = F.col(kcols[i - 1]) == F.col("_jk")
                else:
                    dup = (F.col(ncols[i - 1]) == F.col(head)) & (
                        F.col(ncols[i]) == F.col("_jt")
                    )
                    if not single_type:
                        dup = dup & (F.col(rcols[i - 1]) == F.col("_jrt"))
                keep = ~dup
                pred = keep if pred is None else (pred & keep)
            sel = [*ncols, *rcols, *kcols, F.col("_jt").alias(f"_n{h}")]
            if need_rt:
                sel.append(F.col("_jrt").alias(f"_r{h}"))
            if undirected:
                sel.append(F.col("_jk").alias(f"_e{h}"))
            frontier = (
                frontier.join(step, F.col(head) == F.col("_jf"))
                .where(pred)
                .select(*sel)
            )
            ncols.append(f"_n{h}")
            if need_rt:
                rcols.append(f"_r{h}")
            if undirected:
                kcols.append(f"_e{h}")
            if h >= epat.vl_min:
                hops.append(emit(frontier, h))
        return hops

    def _vl_expand(
        self, epat: EdgePat, evar: str, carry_path: bool = False
    ) -> DataFrame:
        """Variable-length pattern ``-[:T*min..max]-``: one output row
        per distinct PATH (Cypher path semantics) with relationship
        uniqueness inside a path (no edge reused — cycles terminate).
        All three directions: 'out' walks stored edges forward, 'in'
        backward, 'both' either way per hop (the stored edge key is
        orientation-independent, so an undirected walk still cannot
        reuse a relationship in the opposite direction).

        Execution is bounded iterative self-join expansion — the
        Catalyst-has-no-recursion answer (SURVEY §4): hop h joins the
        hop h-1 frontier to the edge table, filtering edges already on
        the path via the carried edge-key array. Each hop is one
        equi-join shuffle on the frontier head; max hops bounds the
        plan depth.

        ``carry_path`` (named paths: p = (a)-[:T*]->(b)) additionally
        threads the traversal-ordered node-gid and rel-type arrays
        through the expansion for nodes(p)/relationships(p)."""
        rel = _typed_edges(self.store, epat)
        # edge identity key from the STORED orientation — shared by both
        # traversal directions of an undirected walk
        base = rel.select(
            "src", "dst",
            F.col("rel_type").alias("_rt"),
            F.concat_ws("|", "src", "rel_type", "dst").alias("_k"),
        )
        fwd = base.select(
            F.col("src").alias("_f"), F.col("dst").alias("_t"), "_rt", "_k"
        )
        rev = base.select(
            F.col("dst").alias("_f"), F.col("src").alias("_t"), "_rt", "_k"
        )
        if epat.direction == "out":
            oriented = fwd
        elif epat.direction == "in":
            oriented = rev
        else:  # undirected: either way per hop; self-loops enter once
            oriented = fwd.unionByName(rev.where(F.col("_f") != F.col("_t")))

        carry = ["_ns", "_rts"] if carry_path else []
        if epat.vl_max <= _VL_SCALAR_MAX:
            hops = self._vl_scalar_hops(epat, oriented, carry_path)
        else:
            hops = self._vl_array_hops(epat, oriented, carry_path)
        if epat.vl_min == 0:
            # zero-hop path: every node reaches itself (Cypher *0..k);
            # label/prop filters on the endpoints still apply at attach
            zero = self.store.nodes.select(
                F.col("gid").alias("_s"), F.col("gid").alias("_d"), F.lit(0).alias("_h"),
                *(
                    [
                        F.array("gid").alias("_ns"),
                        F.array().cast("array<string>").alias("_rts"),
                    ]
                    if carry_path
                    else []
                ),
            )
            hops.insert(0, zero)
        if not hops:
            raise CypherError(f"empty variable-length range *{epat.vl_min}..{epat.vl_max}")
        out = hops[0]
        for more in hops[1:]:
            out = out.unionByName(more)
        if epat.shortest == "all":
            # allShortestPaths: every path row at the per-pair minimum
            # hop count — a window-min filter (one shuffle, no second
            # scan of the iterative union) instead of the groupBy pick
            from pyspark.sql import Window as _W

            wmin = _W.partitionBy("_s", "_d")
            out = (
                out.withColumn("_mh", F.min("_h").over(wmin))
                .where(F.col("_h") == F.col("_mh"))
                .drop("_mh")
            )
        elif epat.shortest:
            # shortestPath: one row per endpoint pair at the minimum hop
            # count — a groupBy-min instead of per-path rows, so the
            # all-paths blowup between well-connected endpoints never
            # reaches the attach join. With carried paths the pick is
            # the lexicographic min of (hops, nodes, rels) — openCypher
            # allows any shortest path; taking the smallest keeps the
            # result deterministic (and oracle-checkable).
            if carry_path:
                out = (
                    out.groupBy("_s", "_d")
                    .agg(F.min(F.struct("_h", "_ns", "_rts")).alias("_m"))
                    .select(
                        "_s", "_d",
                        F.col("_m._h").alias("_h"),
                        F.col("_m._ns").alias("_ns"),
                        F.col("_m._rts").alias("_rts"),
                    )
                )
            else:
                out = out.groupBy("_s", "_d").agg(F.min("_h").alias("_h"))
        return out.select(
            F.col("_s").alias(f"__src_{evar}"),
            F.col("_h").alias(f"{evar}__hops"),
            F.col("_d").alias(f"__dst_{evar}"),
            *(
                [F.col("_ns").alias(f"{evar}__pnodes"), F.col("_rts").alias(f"{evar}__prels")]
                if carry_path
                else []
            ),
        )

    # -- UNWIND --

    def add_unwind(self, var: str, values: list) -> None:
        """Bind ``var`` to one row per list element, cross-joined into
        the plan (Catalyst rewrites a later WHERE equality on it into an
        equi-join). Dict elements become map<string,string> rows (the
        write path's item convention); scalars keep their type."""
        if not isinstance(values, list):
            raise CypherError(f"UNWIND source for {var!r} must be a list")
        spark = self.store.nodes.sparkSession
        if values and all(isinstance(v, dict) for v in values):
            def _s(x):
                if x is None:
                    return None
                if isinstance(x, bool):
                    return "true" if x else "false"
                return str(x)

            rows = [({k: _s(v) for k, v in d.items()},) for d in values]
            df_u = local_df(spark, rows, f"`{var}` map<string,string>")
        else:
            typ = "string"
            for v in values:
                if isinstance(v, bool):
                    typ = "boolean"
                elif isinstance(v, int):
                    typ = "bigint"
                elif isinstance(v, float):
                    typ = "double"
                break
            df_u = local_df(spark, [(v,) for v in values], f"`{var}` {typ}")
        self.vars[var] = "scalar"
        self.df = df_u if self.df is None else self.df.crossJoin(df_u)

    # -- WITH stages --

    def _var_cols(self, v: str) -> list[str]:
        kind = self.vars[v]
        if kind == "node":
            return [f"{v}__{f}" for f in _NODE_FIELDS]
        if kind == "edge":
            return [f"{v}__rel_type", f"{v}__rel_source"]
        if kind == "vlpath":
            return [f"{v}__hops"]
        if kind == "path":
            return [f"{v}__len", f"{v}__nodes", f"{v}__rels"]
        return [v]  # scalar: one plain column

    def apply_with(
        self,
        items: list[ReturnItem],
        where: Expr | None,
        order_by: list[tuple[Expr, bool]] | None = None,
        skip: int | None = None,
        limit: int | None = None,
        distinct: bool = False,
        star: bool = False,
    ) -> None:
        """WITH projection/aggregation: pattern variables pass through
        with their full column namespace (so later MATCH/RETURN can keep
        using them); everything else becomes a named scalar column.
        Aggregates trigger Cypher's implicit group-by over the
        non-aggregated items. ORDER BY/SKIP/LIMIT select rows on the
        projected stage (mid-pipeline top-k); WHERE filters after the
        selection."""
        if self.df is None:
            # standalone WITH (WITH 1 AS x ...): plan over one unit row
            self.df = self.store.nodes.sparkSession.range(1).select(
                F.lit(1).alias("__unit")
            )
        if star:
            # WITH *: every user-named variable passes through, then any
            # extra ``, expr AS alias`` items project alongside
            items = [
                ReturnItem(Var(v), None)
                for v in sorted(self.vars)
                if not v.startswith("_")
            ] + list(items)
        # pattern comprehensions join their list columns onto the
        # pre-projection frame; names are fixed first so the rewrite
        # cannot change an unaliased item's output column
        items = [ReturnItem(self.bind_subqueries(r.expr), r.name) for r in items]
        agg_items = [r for r in items if _contains_agg(r.expr)]
        passthrough: list[str] = []
        scalar_items: list[ReturnItem] = []
        for r in items:
            if _contains_agg(r.expr):
                continue
            if (
                isinstance(r.expr, Var)
                and r.expr.name in self.vars
                and self.vars[r.expr.name] != "scalar"
            ):
                if r.alias is not None and r.alias != r.expr.name:
                    raise CypherError("aliasing a pattern variable in WITH is unsupported")
                passthrough.append(r.expr.name)
            else:
                scalar_items.append(r)

        group_cols = [F.col(c) for v in passthrough for c in self._var_cols(v)]
        scalar_cols = [self.to_column(r.expr).alias(r.name) for r in scalar_items]
        if agg_items:
            # unique aggregates compute once under positional names, then
            # any wrapping arithmetic evaluates over the aggregated frame
            # (same scheme as the RETURN path)
            agg_map: dict[str, str] = {}
            aggs = []
            for r in agg_items:
                for a in _collect_aggs(r.expr):
                    key = repr(a)
                    if key not in agg_map:
                        agg_map[key] = f"__agg{len(agg_map)}"
                        aggs.append(_agg_column(self, a, agg_map[key]))
            keys = group_cols + scalar_cols
            out = (self.df.groupBy(*keys) if keys else self.df.groupBy()).agg(*aggs)
            out = out.select(
                "*",
                *[
                    self.post_agg_column(r.expr, agg_map).alias(r.name)
                    for r in agg_items
                ],
            ).drop(*agg_map.values())
        else:
            out = self.df.select(*group_cols, *scalar_cols)

        new_vars: dict[str, str] = {v: self.vars[v] for v in passthrough}
        for r in scalar_items:
            new_vars[r.name] = "scalar"
        for r in agg_items:
            new_vars[r.name] = "scalar"
        self.df, self.vars = out, new_vars
        # bound comprehension columns do not survive the projection
        self._compr_cache.clear()
        if distinct:
            # WITH DISTINCT dedups the projected rows BEFORE ordering /
            # pagination (openCypher clause order). Node props maps are
            # excluded from the key (Spark cannot compare map columns);
            # a node's gid determines its props, so row identity is
            # unchanged.
            key = [c for c in self.df.columns if not c.endswith("__props")]
            self.df = self.df.dropDuplicates(key)
        if order_by:
            sort_cols = []
            for e, asc in order_by:
                # bind pattern comprehensions/EXISTS first — a WITH-stage
                # ORDER BY may reference them just like a WHERE can
                col = self.to_column(self.bind_subqueries(e))
                sort_cols.append(col.asc() if asc else col.desc())
            self.df = self.df.orderBy(*sort_cols)
        if skip:
            self.df = self.df.offset(skip)
        if limit is not None:
            self.df = self.df.limit(limit)
        if where is not None:
            self.df = self.df.where(self.to_condition(self.bind_subqueries(where)))

    # -- expressions --

    def to_column(self, e: Expr) -> Column:
        if isinstance(e, Lit):
            return F.lit(e.value)
        if isinstance(e, Prop):
            self._check_var(e.var)
            if self.vars.get(e.var) == "scalar":
                # map item access (UNWIND of dict items)
                return _ncol(e.var).getItem(e.key)
            if e.key in ("gid", "label", "source"):
                return F.col(f"{e.var}__{e.key}")
            if self.vars.get(e.var) == "edge":
                if e.key == "rel_type":
                    return F.col(f"{e.var}__rel_type")
                if e.key == "type":
                    # Reference quirk parity: the edge template sets
                    # ``r.type = item.type`` but the item map never has a
                    # ``type`` key (neo4j.go:116-123,215-220), and a null
                    # SET removes the property — so ``r.type`` is always
                    # NULL. The relationship TYPE is ``type(r)``.
                    return F.lit(None).cast("string")
                if e.key == "source":
                    return F.col(f"{e.var}__rel_source")
                raise CypherError(f"unknown edge property {e.key}")
            if self.vars.get(e.var) == "vlpath":
                if e.key == "hops":
                    return F.col(f"{e.var}__hops")
                raise CypherError(f"unknown path property {e.key} (only 'hops')")
            return F.col(f"{e.var}__props").getItem(e.key)
        if isinstance(e, Var):
            if e.name in self._lambda:  # innermost lambda scope wins
                return self._lambda[e.name]
            self._check_var(e.name)
            if self.vars[e.name] == "scalar":
                return _ncol(e.name)
            # a variable that failed to OPTIONAL-match must evaluate to
            # NULL (not a struct of nulls) so count()/COLLECT skip it
            if self.vars[e.name] == "edge":
                return F.when(
                    F.col(f"{e.name}__rel_type").isNotNull(),
                    F.struct(
                        F.col(f"{e.name}__rel_type").alias("rel_type"),
                        F.col(f"{e.name}__rel_source").alias("source"),
                    ),
                )
            if self.vars[e.name] == "vlpath":
                return F.when(
                    F.col(f"{e.name}__hops").isNotNull(),
                    F.struct(F.col(f"{e.name}__hops").alias("hops")),
                )
            if self.vars[e.name] == "path":
                return F.when(
                    F.col(f"{e.name}__len").isNotNull(),
                    F.struct(
                        F.col(f"{e.name}__len").alias("length"),
                        F.col(f"{e.name}__nodes").alias("nodes"),
                        F.col(f"{e.name}__rels").alias("relationships"),
                    ),
                )
            return F.when(
                F.col(f"{e.name}__gid").isNotNull(),
                F.struct(*[F.col(f"{e.name}__{f}").alias(f) for f in _NODE_FIELDS]),
            )
        if isinstance(e, (Cmp, Bool, Not, IsNull, StrPred)):
            # predicates are first-class boolean values in openCypher
            # (RETURN n.age > 21 AS adult)
            return self.to_condition(e)
        if isinstance(e, Func):
            return self._func_column(e)
        if isinstance(e, MapLit):
            return F.struct(
                *[self.to_column(v).alias(k) for k, v in e.entries]
            )
        if isinstance(e, MapProjAll):
            self._check_var(e.var)
            if self.vars.get(e.var) != "node":
                raise CypherError(
                    f"map projection .* requires a node variable, "
                    f"{e.var!r} is {self.vars.get(e.var)}"
                )
            props = F.col(f"{e.var}__props")
            if not e.entries:
                return props
            keys = [k for k, _ in e.entries]
            base = F.map_filter(props, lambda k, _v: ~k.isin(*keys))
            over = F.map_from_arrays(
                F.array(*[F.lit(k) for k in keys]),
                F.array(
                    *[self.to_column(v).cast("string") for _, v in e.entries]
                ),
            )
            return F.map_concat(base, over)
        if isinstance(e, ListPred):
            # NOTE: pyspark infers the HOF lambda's arity from its
            # signature — these must be strict one/two-parameter
            # closures (a captured default would read as the index arg)
            src = self.to_column(e.src)
            lam = self._hof1(e.var, e.pred, cond=True)
            if e.op == "any":
                return F.exists(src, lam)
            if e.op == "all":
                return F.forall(src, lam)
            if e.op == "none":
                return ~F.exists(src, lam)
            return F.size(F.filter(src, lam)) == 1  # single
        if isinstance(e, ListCompr):
            col = self.to_column(e.src)
            if e.pred is not None:
                col = F.filter(col, self._hof1(e.var, e.pred, cond=True))
            if e.map is not None:
                col = F.transform(col, self._hof1(e.var, e.map, cond=False))
            return col
        if isinstance(e, Reduce):
            acc_name, var_name, body = e.acc, e.var, e.expr

            def merge(acc: Column, x: Column) -> Column:
                return self._in_lambda(
                    {acc_name: acc, var_name: x}, lambda: self.to_column(body)
                )

            # the accumulator's type must match the merge output, and
            # this engine's dynamic arithmetic evaluates in double —
            # so the seed is pre-cast to double, and a string seed
            # (which would need the merge body compiled as concat) is
            # rejected up front with a clear error
            if _is_stringy(e.init):
                raise CypherError(
                    "reduce() supports numeric accumulation only "
                    "(dynamic '+' evaluates numerically; string "
                    "accumulators are not supported)"
                )
            init = self.to_column(e.init).cast("double")
            return F.aggregate(self.to_column(e.src), init, merge)
        if isinstance(e, Arith):
            # openCypher '+' is concatenation when either operand is a
            # string; detectable statically for literals and the string
            # function library (props are string-stored, so a dynamic
            # prop+prop stays in the numeric path below)
            if e.op == "+" and (_is_stringy(e.left) or _is_stringy(e.right)):
                return F.concat(
                    self.to_column(e.left).cast("string"),
                    self.to_column(e.right).cast("string"),
                )
            # temporal arithmetic: datetime/date +- duration stays on
            # Spark's native timestamp/interval types (the double casts
            # below would corrupt it)
            if e.op in ("+", "-") and (_is_temporal(e.left) or _is_temporal(e.right)):
                lc, rc = self.to_column(e.left), self.to_column(e.right)
                out = lc + rc if e.op == "+" else lc - rc
                return out.cast("date") if _is_dateonly(e.left) else out
            # numeric context: operands evaluate as doubles (props are
            # string-stored; numeric literals pass through the cast
            # losslessly up to 2^53)
            lc = self.to_column(e.left).cast("double")
            rc = self.to_column(e.right).cast("double")
            ops = {
                "+": lc + rc,
                "-": lc - rc,
                "*": lc * rc,
                "/": lc / rc,
                "%": lc % rc,
                "^": F.pow(lc, rc),
            }
            return ops[e.op]
        if isinstance(e, Case):
            col: Column | None = None
            for w, then in e.whens:
                # simple form compares the operand with Cypher's typed
                # comparison semantics (same path as WHERE equality)
                cond = (
                    self.to_condition(w)
                    if e.operand is None
                    else self.to_condition(Cmp("=", e.operand, w))
                )
                tc = self.to_column(then)
                col = F.when(cond, tc) if col is None else col.when(cond, tc)
            if e.default is not None:
                col = col.otherwise(self.to_column(e.default))
            return col
        if isinstance(e, Agg):
            # inside a post-aggregation residue (see post_agg_column)
            # the aggregate resolves to its already-computed column
            if self._agg_map is not None and repr(e) in self._agg_map:
                return _ncol(self._agg_map[repr(e)])
            raise CypherError("aggregate in non-return position")
        raise CypherError(f"cannot evaluate {e} as value")

    def _lift_dynamic_props(self, clause: MatchClause) -> None:
        """Non-literal pattern property values (UNWIND/WITH variables:
        ``MATCH (n:Person {name: nm})``) cannot filter the node scan —
        they are row-bound. Lift each into the clause's WHERE as an
        equality, where it evaluates after the join the same way an
        explicit ``WHERE n.name = nm`` would (openCypher defines the
        inline map as sugar for exactly that)."""
        for p in clause.paths:
            for node in p.nodes:
                dyn = {k: v for k, v in node.props.items() if not isinstance(v, Lit)}
                if not dyn:
                    continue
                if node.var is None:
                    raise CypherError(
                        "a non-literal pattern property requires a named node"
                    )
                for k, v in dyn.items():
                    del node.props[k]
                    cond: Expr = Cmp("=", Prop(node.var, k), v)
                    clause.where = (
                        cond if clause.where is None else Bool("AND", clause.where, cond)
                    )

    def _hof1(self, var: str, body: Expr, cond: bool):
        """One-parameter HOF lambda compiling ``body`` with ``var`` in
        lambda scope (as a predicate when ``cond``)."""

        def lam(x: Column) -> Column:
            compile_fn = (
                (lambda: self.to_condition(body)) if cond else (lambda: self.to_column(body))
            )
            return self._in_lambda({var: x}, compile_fn)

        return lam

    def _in_lambda(self, binds: dict[str, Column], compile_fn):
        """Evaluate ``compile_fn`` with lambda variables in scope (Spark
        invokes HOF lambdas synchronously at expression-build time, so a
        save/restore around the call is sound, including nesting)."""
        saved = {k: self._lambda.get(k) for k in binds}
        self._lambda.update(binds)
        try:
            return compile_fn()
        finally:
            for k, v in saved.items():
                if v is None:
                    self._lambda.pop(k, None)
                else:
                    self._lambda[k] = v

    def post_agg_column(self, e: Expr, agg_map: dict[str, str]) -> Column:
        """Compile the residue of a return expression AFTER its
        aggregates were computed (count(*) * 10, size(collect(x))):
        aggregates resolve to their aggregated columns; literals,
        arithmetic, scalar functions and CASE apply on top. Row-bound
        leaves (properties, variables) are rejected — they no longer
        exist after the groupBy."""
        if not _post_agg_ok(e):
            raise CypherError(f"unsupported expression over aggregates: {e!r}")
        self._agg_map = agg_map
        try:
            return self.to_column(e)
        finally:
            self._agg_map = None

    def _duration_column(self, e: Func) -> Column:
        """duration('P1DT2H') / duration({days:1, hours:2}) -> a Spark
        interval literal. Spark has two interval families (year-month
        and day-time) that cannot mix in one value, so a duration is
        either calendar-only (years/months) or time-only
        (weeks/days/hours/minutes/seconds); mixed specs get a precise
        error rather than a silently wrong value."""
        if len(e.args) != 1:
            raise CypherError("duration() takes one argument")
        p = _duration_parts(e.args[0])
        cal = p["years"] or p["months"]
        tim = p["weeks"] or p["days"] or p["hours"] or p["minutes"] or p["seconds"]
        if cal and tim:
            raise CypherError(
                "duration() spec mixes calendar (years/months) and time "
                "(days..seconds) components; Spark intervals cannot mix "
                "the two — split the arithmetic into two steps"
            )
        if cal:
            return F.make_ym_interval(
                F.lit(int(p["years"])), F.lit(int(p["months"]))
            )
        return F.make_dt_interval(
            F.lit(int(p["weeks"] * 7 + p["days"])),
            F.lit(int(p["hours"])),
            F.lit(int(p["minutes"])),
            F.lit(p["seconds"]),
        )

    def _func_column(self, e: Func) -> Column:
        """Scalar function library (engine extension; Cypher-style names,
        0-based substring). Args evaluate recursively; position/length
        arguments must be integer literals."""
        def arg(i: int) -> Column:
            return self.to_column(e.args[i])

        def lit_int(i: int) -> int:
            a = e.args[i]
            if not isinstance(a, Lit) or not isinstance(a.value, int):
                raise CypherError(f"{e.name}() argument {i + 1} must be an integer literal")
            return a.value

        n = e.name
        # path accessors first: length(p) must hit the path binding, not
        # the string length() below
        if (
            n in ("length", "nodes", "relationships")
            and len(e.args) == 1
            and isinstance(e.args[0], Var)
            and self.vars.get(e.args[0].name) == "path"
        ):
            v = e.args[0].name
            if n == "length":
                return F.col(f"{v}__len")
            if n == "nodes":
                return F.col(f"{v}__nodes")
            return F.col(f"{v}__rels")
        if n in ("nodes", "relationships"):
            raise CypherError(f"{n}() takes a bound path variable (p = ...)")
        simple = {
            "toupper": F.upper, "tolower": F.lower, "trim": F.trim,
            "length": F.length, "size": F.size, "abs": F.abs,
            "ltrim": F.ltrim, "rtrim": F.rtrim, "reverse": F.reverse,
        }
        if n in simple:
            if len(e.args) != 1:
                raise CypherError(f"{n}() takes one argument")
            return simple[n](arg(0))
        math1 = {
            "ceil": F.ceil, "floor": F.floor, "sqrt": F.sqrt,
            "sign": F.signum, "exp": F.exp, "log": F.log, "log10": F.log10,
            "sin": F.sin, "cos": F.cos, "tan": F.tan, "atan": F.atan,
        }
        if n in math1:
            if len(e.args) != 1:
                raise CypherError(f"{n}() takes one argument")
            return math1[n](arg(0).cast("double"))
        if n == "pi":
            return F.lit(3.141592653589793)
        if n in ("date", "datetime", "localdatetime"):
            # temporal VALUE constructors: deterministic with an explicit
            # argument (maps to Spark date/timestamp); the zero-argument
            # now()-forms stay rejected below
            if len(e.args) == 1:
                if n == "date":
                    return F.to_date(arg(0))
                return F.to_timestamp(
                    # accept both 'yyyy-mm-ddThh:mm:ss' (Cypher) and the
                    # space-separated form Spark parses natively
                    F.replace(arg(0).cast("string"), F.lit("T"), F.lit(" "))
                )
            raise CypherError(
                f"{n}() without arguments is not supported "
                "(non-deterministic: results must be reproducible "
                "across re-executions and engines)"
            )
        if n == "duration":
            return self._duration_column(e)
        if n in ("rand", "timestamp", "time"):
            raise CypherError(
                f"{n}() is not supported (non-deterministic: results must "
                "be reproducible across re-executions and engines)"
            )
        if n == "coalesce":
            return F.coalesce(*[arg(i) for i in range(len(e.args))])
        if n == "substring":
            # Cypher substring(s, start[, len]) is 0-based; Spark is 1-based
            if len(e.args) == 2:
                return F.substring(arg(0), lit_int(1) + 1, 2**31 - 1)
            if len(e.args) == 3:
                return F.substring(arg(0), lit_int(1) + 1, lit_int(2))
            raise CypherError("substring() takes 2 or 3 arguments")
        if n == "replace":
            if len(e.args) != 3:
                raise CypherError("replace() takes 3 arguments")
            return F.replace(arg(0), arg(1), arg(2))
        if n == "split":
            if len(e.args) != 2:
                raise CypherError("split() takes 2 arguments")
            return F.split(arg(0), arg(1))
        if n == "round":
            if len(e.args) == 1:
                return F.round(arg(0).cast("double"), 0)
            if len(e.args) == 2:
                return F.round(arg(0).cast("double"), lit_int(1))
            raise CypherError("round() takes 1 or 2 arguments")
        if n in ("keys", "properties"):
            # property-map accessors; keys() sorted for determinism
            # (openCypher leaves the order unspecified)
            if len(e.args) != 1 or not isinstance(e.args[0], Var):
                raise CypherError(f"{n}() takes one variable argument")
            v = e.args[0].name
            self._check_var(v)
            if self.vars.get(v) != "node":
                raise CypherError(f"{n}() requires a node variable")
            props = F.col(f"{v}__props")
            return F.array_sort(F.map_keys(props)) if n == "keys" else props
        if n == "exists":
            # exists(n.prop): property-presence predicate
            if len(e.args) != 1 or not isinstance(e.args[0], Prop):
                raise CypherError("exists() takes a property expression")
            return self.to_column(e.args[0]).isNotNull()
        if n in ("type", "labels"):
            # graph accessors: type(r) -> relationship type string;
            # labels(n) -> the node's accumulated label set (multi-label,
            # SET n:%s semantics)
            if len(e.args) != 1 or not isinstance(e.args[0], Var):
                raise CypherError(f"{n}() takes one variable argument")
            v = e.args[0].name
            self._check_var(v)
            kind = self.vars.get(v)
            if n == "type":
                if kind != "edge":
                    raise CypherError("type() requires a relationship variable")
                return F.col(f"{v}__rel_type")
            if kind != "node":
                raise CypherError("labels() requires a node variable")
            return F.col(f"{v}__labels")
        if n == "tostring":
            return arg(0).cast("string")
        if n == "tointeger":
            return arg(0).cast("bigint")
        if n == "tofloat":
            return arg(0).cast("double")
        if n == "id":
            # engine mapping: id(n) is the node's stable gid (this
            # engine has no Neo4j-style internal integer ids; gid IS
            # the identity, storage.py clusters on it)
            if len(e.args) != 1 or not isinstance(e.args[0], Var):
                raise CypherError("id() takes one variable argument")
            v = e.args[0].name
            self._check_var(v)
            if self.vars.get(v) != "node":
                raise CypherError("id() requires a node variable")
            return F.col(f"{v}__gid")
        if n == "range":
            # range(start, end[, step]) — inclusive end, like openCypher
            if len(e.args) not in (2, 3):
                raise CypherError("range() takes 2 or 3 arguments")
            step = arg(2) if len(e.args) == 3 else F.lit(1)
            return F.sequence(
                arg(0).cast("bigint"), arg(1).cast("bigint"), step.cast("bigint")
            )
        if n == "head":
            if len(e.args) != 1:
                raise CypherError("head() takes one argument")
            return F.element_at(arg(0), 1)
        if n == "last":
            if len(e.args) != 1:
                raise CypherError("last() takes one argument")
            return F.element_at(arg(0), -1)
        if n == "_index":
            # xs[i] subscript (0-based, openCypher); element_at is 1-based
            # for i >= 0 and already counts negatives from the end, so
            # xs[-1] → element_at(xs, -1) (last), xs[-2] → second-to-last.
            idx = arg(1).cast("int")
            return F.when(
                idx >= 0, F.element_at(arg(0), idx + F.lit(1))
            ).otherwise(F.element_at(arg(0), idx))
        raise CypherError(f"unknown function {n}()")

    def to_condition(self, e: Expr) -> Column:
        if isinstance(e, Bool):
            l, r = self.to_condition(e.left), self.to_condition(e.right)
            if e.op == "AND":
                return l & r
            if e.op == "XOR":
                # boolean inequality; NULL-propagating like openCypher
                return l != r
            return l | r
        if isinstance(e, Not):
            return ~self.to_condition(e.inner)
        if isinstance(e, IsNull):
            c = self.to_column(e.inner)
            return c.isNotNull() if e.negated else c.isNull()
        if isinstance(e, StrPred):
            lc = self.to_column(e.left)
            if e.op == "in":
                if not (isinstance(e.right, Lit) and isinstance(e.right.value, list)):
                    raise CypherError("IN requires a list literal")
                vals = e.right.value
                # honor the string-storage model like _prop_cmp: numeric
                # list => numeric comparison via cast
                if vals and all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
                    return lc.cast("double").isin([float(v) for v in vals])
                return lc.isin(vals)
            if e.op == "regex":
                if not (isinstance(e.right, Lit) and isinstance(e.right.value, str)):
                    raise CypherError("=~ requires a string literal pattern")
                # Cypher =~ matches the WHOLE string; rlike finds anywhere
                return lc.rlike(f"^(?:{e.right.value})$")
            rc = self.to_column(e.right)
            return {
                "starts_with": lc.startswith(rc),
                "ends_with": lc.endswith(rc),
                "contains": lc.contains(rc),
            }[e.op]
        if isinstance(e, Cmp):
            if isinstance(e.right, Lit):
                return _prop_cmp(self.to_column(e.left), e.op, e.right.value)
            if isinstance(e.left, Lit):
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "<>": "<>"}
                return _prop_cmp(self.to_column(e.right), flip[e.op], e.left.value)
            lc, rc = self.to_column(e.left), self.to_column(e.right)
            ops = {
                "=": lc == rc, "<>": lc != rc, "<": lc < rc,
                "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc,
            }
            return ops[e.op]
        if isinstance(e, Lit):
            return F.lit(bool(e.value))
        if isinstance(e, Func) and e.name == "exists":
            return self.to_column(e)
        if isinstance(e, ListPred):
            return self.to_column(e)
        if isinstance(e, Var) and (
            e.name in self._lambda or self.vars.get(e.name) == "scalar"
        ):
            # a boolean-valued scalar / lambda variable used as predicate
            return self.to_column(e).cast("boolean")
        if isinstance(e, Case):
            return self.to_column(e).cast("boolean")
        raise CypherError(f"cannot use {e} as predicate")

    def _check_var(self, v: str) -> None:
        if v not in self.vars:
            raise CypherError(f"undefined variable {v!r}")


def _ncol(name: str) -> Column:
    # return-item names may contain dots ("n.name"); backtick-quote so
    # they resolve as column names, not struct paths
    return F.col(f"`{name}`")


def _agg_column(state: PlanState, a: Agg, name: str) -> Column:
    if a.fn == "count":
        if a.inner is None:
            return F.count(F.lit(1)).alias(name)
        c = state.to_column(a.inner)
        return (F.countDistinct(c) if a.distinct else F.count(c)).alias(name)
    c = state.to_column(a.inner)
    if a.fn == "collect":
        # canonical sorted order (Cypher COLLECT is unordered)
        inner = F.collect_set(c) if a.distinct else F.collect_list(c)
        return F.array_sort(inner).alias(name)
    if a.fn == "stdev":
        return F.stddev_samp(c.cast("double")).alias(name)
    if a.fn == "stdevp":
        return F.stddev_pop(c.cast("double")).alias(name)
    if a.fn == "percentilecont":
        # exact interpolated percentile (Spark's percentile == DuckDB's
        # quantile_cont)
        return F.percentile(c.cast("double"), F.lit(a.param)).alias(name)
    if a.fn == "percentiledisc":
        # exact discrete percentile: the value at rank ceil(p*n) of the
        # sorted non-null values (openCypher/SQL percentile_disc)
        vals = F.array_sort(F.collect_list(c.cast("double")))
        idx = F.greatest(
            F.ceil(F.lit(a.param) * F.size(vals)).cast("int") - F.lit(1), F.lit(0)
        )
        return F.get(vals, idx).alias(name)
    if a.fn in ("sum", "avg"):
        c = c.cast("double")
    return getattr(F, a.fn)(c).alias(name)


def _subst_params(e: Expr, params: dict | None) -> Expr:
    """Resolve ``$name`` parameters in a read expression tree to literal
    values at plan time — the read-side analog of the reference's
    parameterized write statements (``$items``, neo4j.go:245)."""
    s = lambda x: _subst_params(x, params)  # noqa: E731
    if isinstance(e, Param):
        if params is None or e.name not in params:
            raise CypherError(f"missing parameter ${e.name}")
        return Lit(params[e.name])
    if isinstance(e, Cmp):
        return Cmp(e.op, s(e.left), s(e.right))
    if isinstance(e, Arith):
        return Arith(e.op, s(e.left), s(e.right))
    if isinstance(e, Bool):
        return Bool(e.op, s(e.left), s(e.right))
    if isinstance(e, Not):
        return Not(s(e.inner))
    if isinstance(e, IsNull):
        return IsNull(s(e.inner), e.negated)
    if isinstance(e, StrPred):
        return StrPred(e.op, s(e.left), s(e.right))
    if isinstance(e, Agg):
        return Agg(e.fn, None if e.inner is None else s(e.inner), e.distinct, e.param)
    if isinstance(e, Func):
        return Func(e.name, [s(a) for a in e.args])
    if isinstance(e, MapLit):
        return MapLit([(k, s(v)) for k, v in e.entries])
    if isinstance(e, MapProjAll):
        return MapProjAll(e.var, [(k, s(v)) for k, v in e.entries])
    if isinstance(e, ListPred):
        return ListPred(e.op, e.var, s(e.src), s(e.pred))
    if isinstance(e, ListCompr):
        return ListCompr(
            e.var, s(e.src),
            None if e.pred is None else s(e.pred),
            None if e.map is None else s(e.map),
        )
    if isinstance(e, Reduce):
        return Reduce(e.acc, s(e.init), e.var, s(e.src), s(e.expr))
    if isinstance(e, Case):
        return Case(
            None if e.operand is None else s(e.operand),
            [(s(w), s(t)) for w, t in e.whens],
            None if e.default is None else s(e.default),
        )
    if isinstance(e, PatternExists):
        # $params inside an EXISTS pattern's node property maps resolve
        # like any other pattern property (mutated in place, matching
        # _subst_query_params.fix_match)
        for node in e.path.nodes:
            for k, v in list(node.props.items()):
                node.props[k] = _subst_params(v, params)
        return e
    if isinstance(e, PatternCompr):
        # same treatment for a comprehension's pattern props, plus its
        # WHERE and projection expressions — without this, $params in
        # e.g. [(n)-[:T]->(c) WHERE c.name = $x | c.gid] survive to
        # compile time and die with an unrelated Param error
        for node in e.path.nodes:
            for k, v in list(node.props.items()):
                node.props[k] = _subst_params(v, params)
        return PatternCompr(
            e.path, None if e.where is None else s(e.where), s(e.expr)
        )
    return e


def _subst_query_params(q: Query, params: dict | None) -> None:
    """In-place parameter resolution over every expression position of a
    parsed read query (pattern property maps, WHEREs, WITH items,
    RETURN items, ORDER BY)."""
    def fix_match(m: MatchClause) -> None:
        for p in m.paths:
            for node in p.nodes:
                for k, v in list(node.props.items()):
                    node.props[k] = _subst_params(v, params)
        if m.where is not None:
            m.where = _subst_params(m.where, params)

    for stage in q.stages:
        for m in stage.matches:
            fix_match(m)
        for r in stage.items:
            r.expr = _subst_params(r.expr, params)
        if stage.where is not None:
            stage.where = _subst_params(stage.where, params)
        stage.order_by = [(_subst_params(e, params), a) for e, a in stage.order_by]
    for m in q.matches:
        fix_match(m)
    for r in q.returns:
        r.expr = _subst_params(r.expr, params)
    q.order_by = [(_subst_params(e, params), a) for e, a in q.order_by]


def _expr_children(e: Expr) -> list[Expr]:
    """Sub-expressions of the expression node kinds that may wrap an
    aggregate (arithmetic, scalar functions, CASE, predicates —
    openCypher allows e.g. ``CASE WHEN count(*) > 2 ...`` in RETURN)."""
    if isinstance(e, (Arith, Cmp, Bool)):
        return [e.left, e.right]
    if isinstance(e, Func):
        return list(e.args)
    if isinstance(e, Not):
        return [e.inner]
    if isinstance(e, IsNull):
        return [e.inner]
    if isinstance(e, StrPred):
        return [e.left, e.right]
    if isinstance(e, MapLit):
        return [v for _, v in e.entries]
    if isinstance(e, MapProjAll):
        return [v for _, v in e.entries]
    if isinstance(e, ListPred):
        return [e.src, e.pred]
    if isinstance(e, ListCompr):
        return [e.src] + [x for x in (e.pred, e.map) if x is not None]
    if isinstance(e, Reduce):
        return [e.init, e.src, e.expr]
    if isinstance(e, Case):
        out = [] if e.operand is None else [e.operand]
        for w, t in e.whens:
            out += [w, t]
        if e.default is not None:
            out.append(e.default)
        return out
    return []


def _contains_agg(e: Expr) -> bool:
    if isinstance(e, Agg):
        return True
    return any(_contains_agg(c) for c in _expr_children(e))


def _collect_aggs(e: Expr) -> list[Agg]:
    if isinstance(e, Agg):
        return [e]
    return [a for c in _expr_children(e) for a in _collect_aggs(c)]


def _post_agg_ok(e: Expr, lam: frozenset = frozenset()) -> bool:
    """A post-aggregation residue may contain only aggregates (resolved
    to their computed columns), literals, lambda-bound variables, and
    the pure wrappers — row-bound leaves no longer exist after the
    groupBy (but [x IN collect(n.x) | f(x)] is fine)."""
    if isinstance(e, (Agg, Lit, Param)):
        return True
    if isinstance(e, Var):
        return e.name in lam
    if isinstance(e, ListPred):
        inner = lam | {e.var}
        return _post_agg_ok(e.src, lam) and _post_agg_ok(e.pred, inner)
    if isinstance(e, ListCompr):
        inner = lam | {e.var}
        return _post_agg_ok(e.src, lam) and all(
            _post_agg_ok(x, inner) for x in (e.pred, e.map) if x is not None
        )
    if isinstance(e, Reduce):
        inner = lam | {e.acc, e.var}
        return (
            _post_agg_ok(e.init, lam)
            and _post_agg_ok(e.src, lam)
            and _post_agg_ok(e.expr, inner)
        )
    if isinstance(e, MapProjAll):
        # n {.*, ...} reads the row-bound {var}__props column for its
        # base regardless of the override entries — after the groupBy
        # that column is gone, so the projection is as row-bound as a
        # bare property reference and must get the same precise error
        # (ADVICE r6 #4), not a raw AnalysisException downstream.
        return False
    if isinstance(e, (Arith, Func, Case, Cmp, Bool, Not, IsNull, StrPred, MapLit)):
        return all(_post_agg_ok(c, lam) for c in _expr_children(e))
    return False


def run_cypher(store: GraphStore, query: str, params: dict | None = None) -> DataFrame:
    """Parse and execute a read-only Cypher query against the store.
    UNION branches plan independently and combine by column name; plain
    UNION deduplicates the combined result (openCypher set semantics),
    UNION ALL keeps every row."""
    branches = Parser(tokenize(query)).parse_union()
    u_order: list = []
    u_skip = u_limit = None
    if len(branches) > 1:
        # openCypher: a trailing ORDER BY/SKIP/LIMIT orders the WHOLE
        # union (the parser attaches it to the final branch — hoist it),
        # and is rejected inside non-final branches
        for _, qb in branches[:-1]:
            if qb.order_by or qb.skip or qb.limit is not None:
                raise CypherError(
                    "ORDER BY/SKIP/LIMIT is not allowed inside a UNION "
                    "branch; place it after the final branch to order "
                    "the combined result"
                )
        qlast = branches[-1][1]
        u_order, u_skip, u_limit = qlast.order_by, qlast.skip, qlast.limit
        qlast.order_by, qlast.skip, qlast.limit = [], None, None
    out = _run_single(store, branches[0][1], params)
    if len(branches) > 1:
        for _, q2 in branches[1:]:
            df2 = _run_single(store, q2, params)
            if sorted(df2.columns) != sorted(out.columns):
                raise CypherError(
                    f"UNION branches must return the same columns: "
                    f"{out.columns} vs {df2.columns}"
                )
            out = out.unionByName(df2)
        if not branches[1][0]:  # plain UNION => set semantics
            out = out.dropDuplicates()
        if u_order:
            # the union output only has the returned columns, so the
            # hoisted ORDER BY must resolve to one of them by name
            by_name = {r.name for r in branches[-1][1].returns}
            sort_cols = []
            for e, asc in u_order:
                nm = _expr_name(_subst_params(e, params))
                if nm not in by_name:
                    raise CypherError(
                        f"ORDER BY after UNION must reference a returned "
                        f"column (got {nm!r})"
                    )
                sort_cols.append(_ncol(nm).asc() if asc else _ncol(nm).desc())
            out = out.orderBy(*sort_cols)
        if u_skip:
            out = out.offset(u_skip)
        if u_limit is not None:
            out = out.limit(u_limit)
    return out


def _run_single(store: GraphStore, q: Query, params: dict | None) -> DataFrame:
    _subst_query_params(q, params)  # UNWIND params resolve separately below
    state = PlanState(store)
    for src, var in q.unwinds:
        values = (params or {}).get(src.name) if isinstance(src, Param) else src.value
        if values is None:
            raise CypherError(f"missing parameter for UNWIND {var}")
        state.add_unwind(var, values)
    for stage in q.stages:
        for m in stage.matches:
            state.add_match(m)
        state.apply_with(
            stage.items, stage.where, stage.order_by, stage.skip, stage.limit,
            stage.distinct, stage.star,
        )
    for m in q.matches:
        state.add_match(m)
    if state.df is None:
        # standalone RETURN (no MATCH/UNWIND): plan over one unit row
        state.df = store.nodes.sparkSession.range(1).select(
            F.lit(1).alias("__unit")
        )
    if q.star:
        # RETURN *: one column per user-named bound variable
        q.returns = [
            ReturnItem(Var(v), None)
            for v in sorted(state.vars)
            if not v.startswith("_")
        ]
        if not q.returns:
            raise CypherError("RETURN * requires at least one bound variable")

    # bind pattern comprehensions (joins on the pre-projection frame);
    # output names are fixed first so the rewrite cannot change them
    q.returns = [ReturnItem(state.bind_subqueries(r.expr), r.name) for r in q.returns]
    q.order_by = [(state.bind_subqueries(e0), asc) for e0, asc in q.order_by]

    agg_items = [r for r in q.returns if _contains_agg(r.expr)]
    if agg_items:
        group_items = [r for r in q.returns if not _contains_agg(r.expr)]
        gcols = [state.to_column(r.expr).alias(r.name) for r in group_items]
        # unique aggregates (an expression may wrap or repeat them) each
        # compute once under a positional name, then the outer
        # expressions evaluate over the aggregated frame
        agg_map: dict[str, str] = {}
        aggs = []
        for r in agg_items:
            for a in _collect_aggs(r.expr):
                key = repr(a)
                if key not in agg_map:
                    agg_map[key] = f"__agg{len(agg_map)}"
                    aggs.append(_agg_column(state, a, agg_map[key]))
        grouped = state.df.groupBy(*gcols) if gcols else state.df.groupBy()
        out = grouped.agg(*aggs)
        out = out.select(
            *[
                _ncol(r.name)
                if not _contains_agg(r.expr)
                else state.post_agg_column(r.expr, agg_map).alias(r.name)
                for r in q.returns
            ]
        )
    else:
        out = state.df.select(*[state.to_column(r.expr).alias(r.name) for r in q.returns])

    if q.distinct:
        out = out.dropDuplicates()
    if q.order_by:
        by_name = {r.name for r in q.returns}
        by_expr = {repr(r.expr): r.name for r in q.returns}
        sort_cols = []
        for e, asc in q.order_by:
            nm = _expr_name(e)
            if nm in by_name:
                col = _ncol(nm)
            elif repr(e) in by_expr:
                # ORDER BY repeats a return expression (e.g. an aliased
                # aggregate: RETURN count(c) AS n ... ORDER BY count(c))
                col = _ncol(by_expr[repr(e)])
            else:
                try:
                    col = state.to_column(e)
                except CypherError:
                    # the expression may reference RETURN aliases
                    # (ORDER BY age * -1 after RETURN n.age AS age) —
                    # retry with the output columns in scope (Spark's
                    # sort resolves them against the projection)
                    added = [n for n in by_name if n not in state.vars]
                    for n in added:
                        state.vars[n] = "scalar"
                    try:
                        col = state.to_column(e)
                    finally:
                        for n in added:
                            del state.vars[n]
            sort_cols.append(col.asc() if asc else col.desc())
        out = out.orderBy(*sort_cols)
    if q.skip:
        out = out.offset(q.skip)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out
