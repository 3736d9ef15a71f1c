"""openCypher front-end: parser -> logical pattern AST -> DataFrame plan.

The reference declares an ad-hoc query method but stubs it
(``neo4j.go:289-291`` returns nil); this package implements it natively.
Scope is the clause set the reference's emitted/readback Cypher actually
uses (SURVEY §2-R): MATCH / OPTIONAL MATCH (single-hop patterns, label +
property-map predicates), WHERE, RETURN with COLLECT/count and Cypher's
implicit grouping — plus ORDER BY / SKIP / LIMIT as engine extensions.
"""

from opencypher_datalayer_spark.plans.cypher import CypherError, run_cypher

__all__ = ["run_cypher", "CypherError"]
