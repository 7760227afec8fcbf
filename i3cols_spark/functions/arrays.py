"""Array helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pair_structs(ids: Column, a_name: str = "doc_a", b_name: str = "doc_b") -> Column:
    """All ordered pairs (a<b by position) of a sorted id array, as an
    array of (a_name, b_name) structs — in-row pair expansion for small
    groups/buckets, avoiding a self-join.  Pass a plain column
    reference (an expression argument would be re-evaluated per
    element by Catalyst)."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, 1_000_000),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )
