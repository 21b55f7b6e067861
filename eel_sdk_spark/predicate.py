"""Predicate IR: the reference's only true intermediate representation.

eel defines a format-independent predicate ADT — Equals/NotEquals/Lt/Lte/
Gt/Gte/And/Or/Not (eel-core/src/main/scala/io/eels/Predicate.scala:6-104)
— with two compilers (parquet FilterPredicate,
ParquetPredicateBuilder.scala:8-119; ORC SearchArgument,
OrcPredicateBuilder.scala:7-62).

Here the ADT compiles to:
- ``to_column()``  -> a Spark Column (Catalyst then pushes it into any
  scan — the two format compilers collapse into one);
- ``to_block_ranges()`` -> per-column [lower, upper] bounds used by
  ``encode.prune_block_groups`` for stats-based block skipping on OUR
  encoded table (the analogue of UserDefinedPredicate.canDrop over
  GroupStats(min,max), Predicate.scala:14-24). Conservative: OR/NOT
  contribute no bounds (never skip incorrectly).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNBOUNDED = (None, None)


class Predicate:
    def to_column(self) -> Column:
        raise NotImplementedError

    def to_block_ranges(self) -> dict[str, tuple]:
        """col -> (lower, upper); None = unbounded on that side."""
        return {}

    def __and__(self, other: "Predicate") -> "Predicate":
        return And(self, other)

    def __or__(self, other: "Predicate") -> "Predicate":
        return Or(self, other)

    def __invert__(self) -> "Predicate":
        return Not(self)


@dataclass
class Equals(Predicate):
    field: str
    value: object

    def to_column(self) -> Column:
        return F.col(self.field) == F.lit(self.value)

    def to_block_ranges(self):
        return {self.field: (self.value, self.value)}


@dataclass
class NotEquals(Predicate):
    field: str
    value: object

    def to_column(self) -> Column:
        return F.col(self.field) != F.lit(self.value)


@dataclass
class Lt(Predicate):
    field: str
    value: object

    def to_column(self) -> Column:
        return F.col(self.field) < F.lit(self.value)

    def to_block_ranges(self):
        return {self.field: (None, self.value)}


@dataclass
class Lte(Predicate):
    field: str
    value: object

    def to_column(self) -> Column:
        return F.col(self.field) <= F.lit(self.value)

    def to_block_ranges(self):
        return {self.field: (None, self.value)}


@dataclass
class Gt(Predicate):
    field: str
    value: object

    def to_column(self) -> Column:
        return F.col(self.field) > F.lit(self.value)

    def to_block_ranges(self):
        return {self.field: (self.value, None)}


@dataclass
class Gte(Predicate):
    field: str
    value: object

    def to_column(self) -> Column:
        return F.col(self.field) >= F.lit(self.value)

    def to_block_ranges(self):
        return {self.field: (self.value, None)}


@dataclass
class And(Predicate):
    left: Predicate
    right: Predicate

    def to_column(self) -> Column:
        return self.left.to_column() & self.right.to_column()

    def to_block_ranges(self):
        out = dict(self.left.to_block_ranges())
        for col, (lo, hi) in self.right.to_block_ranges().items():
            plo, phi = out.get(col, _UNBOUNDED)
            out[col] = (max(x for x in (plo, lo) if x is not None)
                        if (plo is not None or lo is not None) else None,
                        min(x for x in (phi, hi) if x is not None)
                        if (phi is not None or hi is not None) else None)
        return out


@dataclass
class Or(Predicate):
    left: Predicate
    right: Predicate

    def to_column(self) -> Column:
        return self.left.to_column() | self.right.to_column()
    # no block ranges: an OR can only widen, stay conservative


@dataclass
class Not(Predicate):
    inner: Predicate

    def to_column(self) -> Column:
        return ~self.inner.to_column()


def _probe_type_matches(schema_ddl: str, col: str, value) -> bool:
    """True when an equality literal's Python type matches the column's
    declared decode type (string vs numeric) — the precondition for
    probing that column's bloom. Unknown columns conservatively fail
    (no pruning)."""
    from pyspark.sql.types import StringType, StructType

    try:
        f = next(f for f in StructType.fromDDL(schema_ddl).fields
                 if f.name == col)
    except StopIteration:
        return False
    return isinstance(f.dataType, StringType) == isinstance(value, str)


def decode_with_predicate(blocks, schema_ddl: str, pred: Predicate,
                          int_cols: set[str] | None = None):
    """Decode an encoded table under a predicate: block-skip on stats for
    every range-bounded int column, then apply the residual row filter —
    the reference's stripe-skip + row re-check shape
    (OrcBatchIterator.scala:38-47)."""
    from .encode import decode_blocks_df, prune_block_groups

    pruned = blocks
    for col, (lo, hi) in pred.to_block_ranges().items():
        if int_cols is None or col in int_cols:
            if isinstance(lo, (int, type(None))) and isinstance(hi, (int, type(None))):
                if lo is not None or hi is not None:
                    pruned = prune_block_groups(pruned, col, lower=lo, upper=hi)
        # EQUALITY predicates additionally consult per-block blooms when
        # the table recorded them for this column (encode_df
        # bloom_cols=/key_bloom) — the membership skip that works even
        # where min/max stats are vacuous (hash-scattered layouts).
        # Blooms hash strings (md5) and ints (splitmix64) differently, so
        # a probe whose Python type disagrees with the column's declared
        # type would test the WRONG hash family and silently drop every
        # group; unlike the lookup APIs (which fail fast) a predicate
        # decode has a residual filter whose cast gives the user-intended
        # semantics — so the mismatch just SKIPS the bloom tier (ADVICE
        # r6 fix, same class as checkpoint._check_key_type).
        if (lo is not None and lo == hi and "key_bloom" in pruned.columns
                and isinstance(lo, (int, str))
                and _probe_type_matches(schema_ddl, col, lo)):
            from .encode import prune_block_groups_bloom

            pruned = prune_block_groups_bloom(pruned, col, lo)
    return decode_blocks_df(pruned, schema_ddl).filter(pred.to_column())
