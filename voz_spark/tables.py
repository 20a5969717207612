"""Snapshot catalog: Iceberg-semantics table state over plain Parquet.

No Iceberg runtime jar ships in this container, so the engine carries
its own minimal snapshot layer providing exactly the Iceberg
properties the north rule needs (SURVEY §2.A A11):

- **atomic multi-table commit**: one crawl round appends/replaces
  several tables; a single manifest JSON, renamed into place, flips
  all of them at once (rename(2) is atomic on POSIX).
- **snapshot isolation / time travel**: every version's manifest lists
  the full file set per table; readers pin a version.
- **exact resume**: a killed run restarts from the last committed
  manifest; orphaned data files from an uncommitted round are never
  referenced (Iceberg's crash model).

On a production cluster this class is replaced 1:1 by Iceberg
catalog commits (``df.writeTo(...).append()`` + a multi-table
transaction); the engine code above it is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def _latest_path(self) -> str:
        return os.path.join(self.root, "LATEST")

    def latest_version(self) -> int:
        try:
            with open(self._latest_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v == 0:
            return {"version": 0, "tables": {}, "meta": {}}
        with open(os.path.join(self.root, "manifests", f"v{v:012d}.json")) as f:
            return json.load(f)

    # -- data files ----------------------------------------------------------

    def write_files(self, df: DataFrame, table: str) -> list[str]:
        """Write df's rows as parquet data files owned by `table`;
        returns their paths. NOT visible to readers until commit()."""
        tmp = tempfile.mkdtemp(prefix=f"{table}-", dir=os.path.join(self.root, "data"))
        df.write.mode("overwrite").parquet(tmp)
        out = []
        dest_dir = os.path.join(self.root, "data", table)
        os.makedirs(dest_dir, exist_ok=True)
        for fn in sorted(os.listdir(tmp)):
            if fn.endswith(".parquet"):
                dest = os.path.join(dest_dir, f"{uuid.uuid4().hex}.parquet")
                shutil.move(os.path.join(tmp, fn), dest)
                out.append(dest)
        shutil.rmtree(tmp, ignore_errors=True)
        return out

    # -- commit ----------------------------------------------------------------

    def commit(
        self,
        appends: dict[str, list[str]] | None = None,
        replaces: dict[str, list[str]] | None = None,
        meta: dict | None = None,
    ) -> int:
        """Atomically publish a new version: `appends` extend a table's
        file set, `replaces` swap it wholesale (frontier, bloom)."""
        cur = self.manifest()
        tables = {k: list(v) for k, v in cur["tables"].items()}
        for t, files in (appends or {}).items():
            tables.setdefault(t, []).extend(files)
        for t, files in (replaces or {}).items():
            tables[t] = list(files)
        version = cur["version"] + 1
        man = {"version": version, "tables": tables, "meta": meta or {}}
        man_path = os.path.join(self.root, "manifests", f"v{version:012d}.json")
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "manifests"))
        with os.fdopen(fd, "w") as f:
            json.dump(man, f)
        os.rename(tmp, man_path)
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.rename(tmp, self._latest_path())  # the atomic flip
        return version

    # -- read -------------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        table: str,
        schema: StructType,
        version: int | None = None,
    ) -> DataFrame:
        files = self.manifest(version)["tables"].get(table, [])
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*files)
