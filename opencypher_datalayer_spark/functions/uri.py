"""URI flattening, as pure column expressions.

The reference lossily flattens property/reference URIs to their last
``#``- or ``/``-segment before storage (``stripPrefix``,
reference ``neo4j.go:130-138``): ``http://a/b#name`` -> ``name``,
``http://a/b/name`` -> ``name``, plain ``name`` -> ``name``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uri_localname(col: Column | str) -> Column:
    """Last segment after the final ``#`` or ``/`` (whole-stage codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(F.substring_index(c, "#", -1), "/", -1)


def strip_prop_keys(col: Column | str) -> Column:
    """Flatten every key of a map<string,*> column to its URI local name."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform_keys(c, lambda k, _v: uri_localname(k))
