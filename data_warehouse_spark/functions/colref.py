"""Quoted column references for arbitrary column names.

Spark parses dots as struct access in every string-based resolution
path — F.col("a.b"), df.select("a.b"), and (since Spark 4) even
DataFrame indexing df["a.b"] — so operators that accept caller-supplied
column names (merge keys, sample weights) must quote. Backticks are
Spark's identifier quote; embedded backticks double. One shared rule:
a second private copy of the escape invites the two drifting apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quote_ident(name: str) -> str:
    """`name` escaped and backtick-wrapped for use inside SQL text
    (F.expr) or a column-reference string."""
    return f"`{name.replace('`', '``')}`"


def qcol(name: str, qualifier: str | None = None) -> Column:
    """Column reference that resolves `name` as a PLAIN column whatever
    characters it contains, optionally qualified by a frame alias."""
    q = quote_ident(name)
    return F.col(f"{qualifier}.{q}" if qualifier else q)
