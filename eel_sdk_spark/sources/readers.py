"""Source components -> ``spark.read`` plans with explicit pushdown knobs.

Construction mirrors the reference's fluent ``withX`` style; ``.load(spark)``
returns a DataFrame whose scan carries the projection/predicate (visible as
``PushedFilters`` / ``ReadSchema`` in ``.explain``) — what the reference
implements by hand per format (PARQUET_READ_SCHEMA RowParquetReaderFn.scala:43-48,
ORC include array OrcBatchIterator.scala:28-36, SARG OrcSource.scala:22-71).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

from .filepattern import FilePattern
from .inferrer import SchemaInferrer


@dataclass
class _FileSource:
    """Shared projection/predicate plumbing for file-based sources."""

    pattern: str
    projection: list[str] | None = None
    predicate: Column | None = None
    schema: T.StructType | None = None
    options: dict = field(default_factory=dict)

    FORMAT = ""

    def with_projection(self, *cols: str):
        """Reference: ParquetSource.withProjection (ParquetSource.scala:44-48)."""
        return replace(self, projection=list(cols))

    def with_predicate(self, predicate: Column):
        """Reference: ParquetSource.withPredicate (ParquetSource.scala:39-42) —
        Catalyst pushes the filter into the scan; no per-format compiler
        needed (SURVEY.md §2.8)."""
        return replace(self, predicate=predicate)

    def with_schema(self, schema: T.StructType):
        return replace(self, schema=schema)

    def with_option(self, key: str, value):
        return replace(self, options={**self.options, key: value})

    def with_merge_schema(self):
        """Cross-file schema merge on read — the reference's
        AvroSchemaMerge (AvroSchemaMerge.scala:10-32) /
        ``eel.parquet.mergeSchemas`` (reference.conf:52), here delegated
        to the source's own footer-merging scan."""
        return self.with_option("mergeSchema", "true")

    def paths(self) -> list[str]:
        return FilePattern(self.pattern).to_paths()

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.FORMAT).options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.load(self.pattern)
        if self.predicate is not None:
            df = df.filter(self.predicate)
        if self.projection:
            df = df.select(*self.projection)
        return df


class ParquetSource(_FileSource):
    """ParquetSource.scala:27-91. Footer-level stats without a data read:
    ``statistics`` mirrors Statistics(count, compressed, uncompressed)
    (ParquetSource.scala:58-75) from parquet metadata via pyarrow."""

    FORMAT = "parquet"

    def statistics(self, max_workers: int = 16) -> dict:
        """Footer-only scan, parallelized across files: footer reads are
        IO-latency-bound, so a thread pool covers manifests of thousands
        of files without a serial driver loop (the reference reads footers
        serially per part, ParquetSource.scala:58-75)."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def one(p: str) -> tuple[int, int, int]:
            meta = pq.ParquetFile(p).metadata
            comp = unc = 0
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                comp += sum(g.column(c).total_compressed_size
                            for c in range(g.num_columns))
                unc += g.total_byte_size
            return meta.num_rows, comp, unc

        paths = self.paths()
        with ThreadPoolExecutor(max_workers=min(max_workers,
                                                max(1, len(paths)))) as ex:
            parts = list(ex.map(one, paths))
        return {"count": sum(p[0] for p in parts),
                "compressed": sum(p[1] for p in parts),
                "uncompressed": sum(p[2] for p in parts)}


class OrcSource(_FileSource):
    """OrcSource.scala:22-71 (SARG + include-array pushdown are automatic)."""

    FORMAT = "orc"


class AvroSource(_FileSource):
    """AvroSource.scala:14-52 (needs spark-avro, bundled in pyspark 4)."""

    FORMAT = "avro"


@dataclass
class CsvSource(_FileSource):
    """CsvSource.scala:13-105: header modes (FirstRow / FirstComment /
    None, Header.java), null/empty cell values, skipRows, schema inference
    via SchemaInferrer regex rules on the header names.

    Plan shapes:
    - ``skip_rows == 0``: the native vectorized CSV scan (header/comment
      handled by options; FirstComment peeks the comment line driver-side
      for names only — the data scan stays native and parallel-per-split).
    - ``skip_rows > 0``: per-file stream mode — whole file as one value,
      split/slice/from_csv, all JVM expressions. Files are the unit of
      parallelism, which is PARITY with the reference: its CsvPublisher is
      a single sequential stream per source (CsvSource.scala:90-93).
    """

    FORMAT = "csv"
    header: bool | str = True  # True/'first_row' | False/'none' | 'first_comment'
    null_value: str = ""
    inferrer: SchemaInferrer | None = None
    skip_rows: int = 0
    comment: str = "#"
    empty_cell_value: str | None = None

    def with_header(self, mode) -> "CsvSource":
        """CsvSource.scala:31 withHeader(Header)."""
        return replace(self, header=mode)

    def with_skip_rows(self, n: int) -> "CsvSource":
        """CsvSource.scala:48 withSkipRows."""
        return replace(self, skip_rows=n)

    def _mode(self) -> str:
        if self.header is True:
            return "first_row"
        if self.header is False:
            return "none"
        return str(self.header).lower()

    def _delimiter(self) -> str:
        return self.options.get("sep", self.options.get("delimiter", ","))

    def _peek_names(self) -> list[str]:
        """Driver-side peek at the first file's prefix (bounded read) for
        header discovery — the only part of a CSV read that is inherently
        sequential. Raises on first_comment with no comment line, like the
        reference's schema call would yield nothing useful."""
        path = self.paths()[0]
        with open(path, encoding="utf-8", errors="replace") as f:
            head = f.read(1 << 20)
        lines = head.splitlines()[self.skip_rows:]
        mode = self._mode()
        delim = self._delimiter()
        if mode == "first_comment":
            for ln in lines:
                if ln.startswith(self.comment):
                    return ln[len(self.comment):].split(delim)
            return [""]  # reference: empty header when no comment found
        first = next((ln for ln in lines
                      if ln and not ln.startswith(self.comment)), "")
        if mode == "none":
            return [str(i) for i in range(len(first.split(delim)))]
        return first.split(delim)

    def _resolve_schema(self) -> T.StructType:
        if self.schema is not None:
            return self.schema
        names = self._peek_names()
        inferrer = self.inferrer or SchemaInferrer()
        return inferrer.infer(names)

    def load(self, spark: SparkSession) -> DataFrame:
        mode = self._mode()
        opts = {"nullValue": self.null_value, "comment": self.comment,
                **self.options}
        if self.empty_cell_value is not None:
            opts["emptyValue"] = self.empty_cell_value
        if self.skip_rows > 0:
            df = self._load_stream(spark, mode, opts)
        else:
            schema = self._resolve_schema()
            reader = (spark.read.format("csv")
                      .options(**opts)
                      .option("header", str(mode == "first_row").lower())
                      .schema(schema))
            df = reader.load(self.pattern)
        if self.predicate is not None:
            df = df.filter(self.predicate)
        if self.projection:
            df = df.select(*self.projection)
        return df

    def _load_stream(self, spark: SparkSession, mode: str,
                     opts: dict) -> DataFrame:
        """skip_rows path: whole file -> split lines -> slice -> from_csv.
        Everything after the text scan is JVM expressions."""
        from pyspark.sql import functions as F

        schema = self._resolve_schema()
        txt = (spark.read.format("text").option("wholetext", "true")
               .load(self.pattern))
        start = self.skip_rows + (1 if mode == "first_row" else 0)
        lines = F.split(F.col("value"), "\r?\n")
        body = F.slice(lines, start + 1,
                       F.greatest(F.size(lines) - start, F.lit(0)))
        rows = (txt.select(F.explode(body).alias("line"))
                .filter(F.length("line") > 0)
                .filter(~F.col("line").startswith(self.comment)))
        csv_opts = {k: v for k, v in opts.items() if k != "comment"}
        ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                        for f in schema.fields)
        return (rows.select(F.from_csv(F.col("line"), ddl, csv_opts)
                            .alias("r"))
                .select("r.*"))


class JsonSource(_FileSource):
    """JsonSource.scala:18-115 (json-lines, nested obj/array come free)."""

    FORMAT = "json"


@dataclass
class JdbcSource:
    """JdbcSource.scala:17-55 + partition strategies (SURVEY §2.1):
    RangePartitionStrategy -> partitionColumn/lowerBound/upperBound/
    numPartitions; Bucket/Hash strategies -> explicit ``predicates`` list
    (each predicate becomes one parallel publisher, exactly the reference's
    one-Publisher-per-bucket model, BucketPartitionStrategy.scala:9-26)."""

    url: str
    table: str
    properties: dict = field(default_factory=dict)
    fetch_size: int = 1000
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    predicates: list[str] | None = None

    def with_range_partitioning(self, column: str, lower: int, upper: int,
                                n: int) -> "JdbcSource":
        return replace(self, partition_column=column, lower_bound=lower,
                       upper_bound=upper, num_partitions=n)

    def with_bucket_partitioning(self, column: str,
                                 values: list) -> "JdbcSource":
        # ANSI-quoted identifier: Spark's JDBC writer creates case-exact
        # quoted columns, so an unquoted name would be case-folded away
        preds = [f'"{column}" = {v!r}' for v in values]
        return replace(self, predicates=preds)

    def with_hash_partitioning(self, hash_expr: str, n: int) -> "JdbcSource":
        preds = [f"({hash_expr}) % {n} = {k}" for k in range(n)]
        return replace(self, predicates=preds)

    def load(self, spark: SparkSession) -> DataFrame:
        props = {"fetchsize": str(self.fetch_size), **self.properties}
        if self.predicates:
            return spark.read.jdbc(self.url, self.table,
                                   predicates=self.predicates,
                                   properties=props)
        if self.partition_column:
            return spark.read.jdbc(
                self.url, self.table, column=self.partition_column,
                lowerBound=self.lower_bound, upperBound=self.upper_bound,
                numPartitions=self.num_partitions, properties=props)
        return spark.read.jdbc(self.url, self.table, properties=props)


@dataclass
class JdbcStoredProcSource:
    """JdbcStoredProcSource.scala:15-79: the result set of a parameterized
    stored procedure. Spark's JDBC source has no CallableStatement channel,
    so the proc invocation is expressed as its defining query and pushed
    down as a derived table — one round trip, executed database-side like
    the reference's `{call proc(?)}`. Positional ``params`` are inlined as
    SQL literals in ``?`` order (the reference binds them via setObject,
    JdbcStoredProcSource.scala:35-43).

    Binding is a real tokenizer, not ``str.replace``: ``?`` inside quoted
    string/identifier literals and ``--``/``/* */`` comments is left
    alone. Literal quoting is ANSI quote-doubling by default — on
    ANSI-compliant backends (Derby, Postgres with
    standard_conforming_strings) backslash is a literal character, so
    doubling it would corrupt the value. For dialects where backslash IS
    an escape character (MySQL with default sql_mode) backslashes must be
    doubled too. ``backslash_escapes`` defaults to AUTO (None): the
    dialect is detected from the JDBC URL prefix (jdbc:mysql /
    jdbc:mariadb -> True, else ANSI False); pass an explicit bool to
    override. A backslash-bearing param on an UNRECOGNIZED dialect under
    auto raises rather than emitting SQL whose meaning depends on a
    server setting this layer cannot see. Params are
    INLINED — treat ``params`` as trusted values, never raw user input
    (the reference avoids this by server-side binding,
    JdbcStoredProcSource.scala:35-43; Spark's JDBC reader offers no bind
    channel)."""

    url: str
    query: str
    params: tuple = ()
    properties: dict = field(default_factory=dict)
    fetch_size: int = 1000
    # None = auto-detect from the URL; True for MySQL-style dialects
    backslash_escapes: bool | None = None

    # URL prefixes whose default string syntax treats backslash as an
    # escape character (everything else on this list-of-knowns is ANSI)
    _BACKSLASH_DIALECTS = ("jdbc:mysql:", "jdbc:mariadb:")
    _ANSI_DIALECTS = ("jdbc:derby:", "jdbc:postgresql:", "jdbc:h2:",
                      "jdbc:sqlite:", "jdbc:oracle:", "jdbc:sqlserver:")

    def _backslash_mode(self) -> bool:
        if self.backslash_escapes is not None:
            return self.backslash_escapes
        url = self.url.lower()
        if url.startswith(self._BACKSLASH_DIALECTS):
            return True
        if url.startswith(self._ANSI_DIALECTS):
            return False
        raise ValueError(
            f"JdbcStoredProcSource: a param contains a backslash and the "
            f"dialect of {self.url.split(':', 2)[:2]} is not recognized — "
            f"whether '\\' is an escape char is dialect-dependent, so the "
            f"generated SQL would silently change meaning; pass "
            f"backslash_escapes=True (MySQL-style) or False (ANSI) "
            f"explicitly")

    def _literal(self, p) -> str:
        if p is None:
            return "NULL"
        if isinstance(p, bool):  # before int: bool is an int subclass
            return "TRUE" if p else "FALSE"
        if isinstance(p, (int, float)):
            return str(p)
        s = str(p)
        # only resolve the dialect when it matters: backslash-free values
        # render identically under both conventions
        if "\\" in s and self._backslash_mode():
            s = s.replace("\\", "\\\\")
        s = s.replace("'", "''")
        return f"'{s}'"

    def _bound_query(self) -> str:
        q, out, i, params = self.query, [], 0, list(self.params)
        n = len(q)
        while i < n:
            ch = q[i]
            if ch in ("'", '"'):  # string / quoted-identifier literal
                j = i + 1
                while j < n:
                    if q[j] == ch:
                        if j + 1 < n and q[j + 1] == ch:  # doubled quote
                            j += 2
                            continue
                        break
                    j += 1
                out.append(q[i:j + 1])
                i = j + 1
            elif ch == "-" and q[i:i + 2] == "--":  # line comment
                j = q.find("\n", i)
                j = n if j == -1 else j
                out.append(q[i:j])
                i = j
            elif ch == "/" and q[i:i + 2] == "/*":  # block comment
                j = q.find("*/", i)
                j = n if j == -1 else j + 2
                out.append(q[i:j])
                i = j
            elif ch == "?":
                if not params:
                    raise ValueError(
                        f"query has more '?' placeholders than params "
                        f"({len(self.params)} given): {self.query!r}")
                out.append(self._literal(params.pop(0)))
                i += 1
            else:
                out.append(ch)
                i += 1
        if params:
            raise ValueError(
                f"{len(params)} unbound param(s) left over — query has "
                f"fewer '?' placeholders than params: {self.query!r}")
        return "".join(out)

    def load(self, spark: SparkSession) -> DataFrame:
        props = {"fetchsize": str(self.fetch_size), **self.properties}
        return spark.read.jdbc(self.url, f"({self._bound_query()}) sp",
                               properties=props)
