"""Source/sink connector surface (SURVEY.md §2.1-2.2), Spark-first.

Each class mirrors one of the reference's Source/Sink components but
compiles to ``spark.read``/``df.write`` so pushdown, schema merging,
vectorized IO and split planning come from Spark (the reference hand-rolls
all four: ParquetSource.scala:27-91, OrcSource.scala:22-71,
CsvSource.scala:13-105, JsonSource.scala:18-115, JdbcSource.scala:17-55).
"""

from .filepattern import FilePattern  # noqa: F401
from .inferrer import DataTypeRule, SchemaInferrer  # noqa: F401
from .readers import (  # noqa: F401
    AvroSource,
    CsvSource,
    JdbcSource,
    JsonSource,
    OrcSource,
    ParquetSource,
)
from .writers import (  # noqa: F401
    AvroSink,
    CsvSink,
    DevNullSink,
    JdbcSink,
    JsonSink,
    OrcSink,
    ParquetSink,
    write_bucketed,
)
