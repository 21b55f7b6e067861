"""SchemaInferrer: ordered regex rules mapping header names to Spark types.

Reference: eel-core/src/main/scala/io/eels/SchemaInferrer.scala:10-34 —
``SchemaInferrer(default, DataTypeRule(regex, type, nullable), ...)``
applied to CSV headers (CsvSource.scala:63-88). Same semantics here: first
matching rule wins, else the default type.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass
class DataTypeRule:
    pattern: str
    data_type: T.DataType
    nullable: bool = True

    def matches(self, name: str) -> bool:
        return re.fullmatch(self.pattern, name) is not None


class SchemaInferrer:
    def __init__(self, default: T.DataType = T.StringType(),
                 *rules: DataTypeRule):
        self.default = default
        self.rules = list(rules)

    def infer(self, headers: list[str]) -> T.StructType:
        fields = []
        for h in headers:
            rule = next((r for r in self.rules if r.matches(h)), None)
            if rule is not None:
                fields.append(T.StructField(h, rule.data_type, rule.nullable))
            else:
                fields.append(T.StructField(h, self.default, True))
        return T.StructType(fields)


STRING_INFERRER = SchemaInferrer()
