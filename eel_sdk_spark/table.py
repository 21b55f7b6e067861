"""Manifest-based atomic table commits (Iceberg-style, jar-free).

The sandbox image carries no Iceberg runtime jars, so the engine ships a
minimal snapshot/manifest layer with the same commit semantics the north
rule needs: a table is a directory of immutable parquet data files plus a
chain of JSON manifests; readers resolve the single ``_current`` pointer
(updated via atomic ``os.replace``) so a half-written job is invisible
until its one commit lands. This upgrades the reference's staging-dir +
rename protocol (eel-hive/src/main/scala/io/eels/component/hive/
HiveSinkWriter.scala:78-101) to real snapshot isolation; swap-in of a real
Iceberg catalog is a one-module change since all access goes through here.

Layout:
    <root>/<name>/data/<job-uuid>/part-*.parquet   (written by Spark)
    <root>/<name>/manifests/m-<n>.json             (immutable)
    <root>/<name>/_current                          (atomic pointer)
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    files: list[str]
    schema_ddl: str
    properties: dict


class ManifestTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.manifest_dir = os.path.join(self.dir, "manifests")
        self.pointer = os.path.join(self.dir, "_current")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- write side -------------------------------------------------------
    def new_data_path(self) -> str:
        """A fresh staging directory for one Spark write job."""
        return os.path.join(self.data_dir, uuid.uuid4().hex)

    def commit(self, new_files: list[str], schema_ddl: str,
               properties: dict | None = None, mode: str = "append") -> Snapshot:
        """Publish ``new_files`` atomically. mode: append | overwrite."""
        cur = self.current()
        parent = cur.snapshot_id if cur else None
        base_files = cur.files if (cur and mode == "append") else []
        snap = Snapshot(
            snapshot_id=(parent or 0) + 1,
            parent_id=parent,
            files=base_files + sorted(new_files),
            schema_ddl=schema_ddl or (cur.schema_ddl if cur else ""),
            properties={**(cur.properties if cur and mode == "append" else {}),
                        **(properties or {}),
                        "committed_at": time.time()},
        )
        mpath = os.path.join(self.manifest_dir, f"m-{snap.snapshot_id}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(snap.__dict__, f)
        os.replace(mpath + ".tmp", mpath)
        with open(self.pointer + ".tmp", "w") as f:
            f.write(os.path.basename(mpath))
        os.replace(self.pointer + ".tmp", self.pointer)  # the atomic commit
        return snap

    # -- read side --------------------------------------------------------
    def current(self) -> Snapshot | None:
        if not os.path.exists(self.pointer):
            return None
        with open(self.pointer) as f:
            mname = f.read().strip()
        with open(os.path.join(self.manifest_dir, mname)) as f:
            return Snapshot(**json.load(f))

    def snapshot(self, snapshot_id: int) -> Snapshot:
        with open(os.path.join(self.manifest_dir, f"m-{snapshot_id}.json")) as f:
            return Snapshot(**json.load(f))

    def read(self, spark, snapshot_id: int | None = None):
        snap = self.snapshot(snapshot_id) if snapshot_id else self.current()
        if snap is None or not snap.files:
            raise FileNotFoundError(f"table {self.dir} has no committed snapshot")
        return spark.read.parquet(*snap.files)

    @staticmethod
    def list_written_files(job_dir: str) -> list[str]:
        out = []
        for dirpath, _, names in os.walk(job_dir):
            out.extend(os.path.join(dirpath, n) for n in names
                       if n.endswith(".parquet"))
        return sorted(out)

    def write_df(self, df, schema_ddl: str = "", properties: dict | None = None,
                 mode: str = "append") -> Snapshot:
        """Write a DataFrame as a new snapshot (stage -> commit)."""
        job_dir = self.new_data_path()
        df.write.mode("overwrite").parquet(job_dir)
        return self.commit(self.list_written_files(job_dir), schema_ddl,
                           properties, mode)

    def compact(self, spark, n_files: int) -> Snapshot:
        """Small-file compaction: rewrite the current snapshot to exactly
        ``n_files`` files in one new snapshot (reference: Compactor.compactTo,
        eel-hive/src/main/scala/io/eels/component/hive/Compactor.scala:16-21;
        Iceberg's rewrite_data_files). Old files stay on disk for time
        travel; the new snapshot references only the rewritten set."""
        df = self.read(spark).repartition(n_files)
        snap = self.current()
        job_dir = self.new_data_path()
        df.write.mode("overwrite").parquet(job_dir)
        return self.commit(self.list_written_files(job_dir),
                           snap.schema_ddl, snap.properties, mode="overwrite")
