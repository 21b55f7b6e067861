"""PartitionConstraint ADT: manifest-side partition pruning.

Reference: eel-schema/src/main/scala/io/eels/schema/PartitionConstraint.scala:8-42
— equals/lt/lte/gt/gte (string-ordered, as in the reference's
PartitionEntry values) composable with and/or, evaluated against the
partition key=value map of each data file BEFORE any file is listed or
read (HiveSource.scala:104-133). Consumed by ``ManifestTable.read`` and
``ManifestTable.partition_values``.
"""

from __future__ import annotations

from dataclasses import dataclass


class PartitionConstraint:
    def eval(self, pv: dict) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def __and__(self, other: "PartitionConstraint") -> "PartitionConstraint":
        return AndConstraint(self, other)

    def __or__(self, other: "PartitionConstraint") -> "PartitionConstraint":
        return OrConstraint(self, other)


@dataclass
class PartitionEquals(PartitionConstraint):
    key: str
    value: str

    def eval(self, pv: dict) -> bool:
        return pv.get(self.key) == str(self.value)


@dataclass
class PartitionLt(PartitionConstraint):
    key: str
    value: str

    def eval(self, pv: dict) -> bool:
        v = pv.get(self.key)
        return v is not None and v < str(self.value)


@dataclass
class PartitionLte(PartitionConstraint):
    key: str
    value: str

    def eval(self, pv: dict) -> bool:
        v = pv.get(self.key)
        return v is not None and v <= str(self.value)


@dataclass
class PartitionGt(PartitionConstraint):
    key: str
    value: str

    def eval(self, pv: dict) -> bool:
        v = pv.get(self.key)
        return v is not None and v > str(self.value)


@dataclass
class PartitionGte(PartitionConstraint):
    key: str
    value: str

    def eval(self, pv: dict) -> bool:
        v = pv.get(self.key)
        return v is not None and v >= str(self.value)


@dataclass
class PartitionIn(PartitionConstraint):
    key: str
    values: tuple

    def eval(self, pv: dict) -> bool:
        return pv.get(self.key) in {str(v) for v in self.values}


@dataclass
class AndConstraint(PartitionConstraint):
    left: PartitionConstraint
    right: PartitionConstraint

    def eval(self, pv: dict) -> bool:
        return self.left.eval(pv) and self.right.eval(pv)


@dataclass
class OrConstraint(PartitionConstraint):
    left: PartitionConstraint
    right: PartitionConstraint

    def eval(self, pv: dict) -> bool:
        return self.left.eval(pv) or self.right.eval(pv)
