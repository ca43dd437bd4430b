"""JSON / map-column extraction.

Extension surface: SURVEY §2.3 lists Map/JSON as **absent** from the
reference ("`events.props` in driver testdata is a JSON string —
extension territory"). These helpers stay pure-Catalyst
(``get_json_object`` / ``from_json`` — no UDFs), so pushdown and
codegen see through them; at scale, prefer extracting the handful of
needed paths over parsing the whole document into a map.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["json_get", "json_map"]


def json_get(
    col: ColumnOrName, path: str, cast: Optional[str] = None
) -> Column:
    """Extract one JSONPath value from a JSON-string column (string out,
    NULL on missing path / invalid JSON); ``cast`` converts in the same
    expression. One ``get_json_object`` per path keeps the parse cost
    proportional to paths actually used."""
    c = F.get_json_object(to_col(col), path)
    return c.cast(cast) if cast else c


def json_map(col: ColumnOrName) -> Column:
    """Parse a flat JSON object into ``map<string,string>`` — for when
    the key set is dynamic. Heavier than :func:`json_get` (full parse +
    map materialization per row); use for exploratory / schema-free
    access."""
    return F.from_json(to_col(col), "map<string,string>")
