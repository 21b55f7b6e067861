"""FilePattern: glob/dir/file expansion with a path filter.

Reference: eel-core/src/main/scala/io/eels/FilePattern.scala:17-52 — a
pattern is one of (a) a single file, (b) a directory (expands to its
files), (c) a glob; plus a ``withFilter`` predicate on paths. Spark's
readers glob natively, so this class mostly *resolves* patterns for APIs
that want explicit lists (manifest commits, lineage) and applies filters.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Callable


class FilePattern:
    def __init__(self, pattern: str,
                 path_filter: Callable[[str], bool] | None = None):
        self.pattern = pattern
        self.path_filter = path_filter or (lambda p: True)

    def with_filter(self, fn: Callable[[str], bool]) -> "FilePattern":
        return FilePattern(self.pattern, fn)

    def to_paths(self) -> list[str]:
        p = self.pattern
        if os.path.isdir(p):
            found = sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if os.path.isfile(os.path.join(p, f)))
        elif any(ch in p for ch in "*?["):
            found = sorted(_glob.glob(p, recursive=True))
        elif os.path.isfile(p):
            found = [p]
        else:
            found = []
        return [f for f in found if self.path_filter(f)]


def file_metadata_df(spark, pattern: str):
    """Filesystem metadata as a DataFrame (path, size bytes, mtime epoch) —
    the HdfsSource analogue (eel-core/.../hdfs/HdfsSource.scala:9-36 lists
    permissions/blocks rather than rows)."""
    rows = []
    for p in FilePattern(pattern).to_paths():
        st = os.stat(p)
        rows.append((p, int(st.st_size), int(st.st_mtime)))
    return spark.createDataFrame(rows, "path string, size bigint, mtime bigint")
