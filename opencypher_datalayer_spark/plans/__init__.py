"""openCypher front-end: parser -> logical pattern AST -> DataFrame plan.

The reference declares an ad-hoc query method but stubs it
(``neo4j.go:289-291`` returns nil); this package implements it natively.
Read scope is the clause set the reference's readback Cypher actually
uses (SURVEY §2-R): MATCH / OPTIONAL MATCH (single-hop and
variable-length ``*min..max`` patterns, label + property-map
predicates), WHERE, WITH pipeline stages (projection, implicit-group
aggregation, post-aggregate WHERE), RETURN with COLLECT/count — plus
ORDER BY / SKIP / LIMIT / DISTINCT as engine extensions.

Write scope (``cypher_write``) is the clause surface of the reference's
five emitted templates (``neo4j.go:95-127``): UNWIND / MATCH / MERGE /
WITH / SET / DELETE / DETACH DELETE, executed natively as set-oriented
DataFrame transforms.
"""

from opencypher_datalayer_spark.plans.cypher import CypherError, run_cypher
from opencypher_datalayer_spark.plans.cypher_write import run_cypher_write

__all__ = ["run_cypher", "run_cypher_write", "CypherError"]
