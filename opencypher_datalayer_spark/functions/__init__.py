"""Column-expression building blocks (all JVM-side, no Python UDFs)."""

from opencypher_datalayer_spark.functions.uri import uri_localname, strip_prop_keys

__all__ = ["uri_localname", "strip_prop_keys"]
