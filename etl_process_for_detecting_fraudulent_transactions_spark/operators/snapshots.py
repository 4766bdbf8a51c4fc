"""Manifest-based snapshot versioning for parquet tables (time travel).

The lakehouse-lite commit protocol (the filesystem half of what
Delta/Iceberg do, without the format dependency — the seam where either
would slot in):

* every commit writes its data files into a FRESH directory
  (``data/c{N}/``) — existing files are never mutated or deleted by
  writers;
* the table state is a numbered JSON manifest (``_manifests/v{N}.json``)
  listing exactly the data directories visible at that version; an
  ``append`` manifest carries the previous version's list plus the new
  directory, an ``overwrite`` manifest only the new one;
* a commit becomes visible via EXCLUSIVE CREATE of its manifest file
  (``open(..., "x")`` — atomic on POSIX and object stores with
  if-none-match): two concurrent writers race on the same version number
  and exactly one wins; the loser re-reads the head and retries against
  the next number (optimistic concurrency, Iceberg's commit model);
* readers resolve a version (default: head) to its directory list and
  read those directories only — old versions stay readable until
  ``vacuum`` drops manifests older than the retention window and deletes
  the data directories no retained manifest references.

At 100 TB this layout is what makes restatement safe: writers never
rewrite live files, readers pin a manifest (no listing races mid-scan),
and time travel / rollback are O(1) pointer reads. The deliberate
difference from the real formats: manifests list DIRECTORIES, not files
with column stats — file-level pruning stays with parquet footers
(`zorder.py` handles clustering; `read_evolved` handles schema drift).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Versioned parquet table rooted at ``root`` (one table per store)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest plumbing ----------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_manifests", f"v{version:06d}.json")

    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(os.path.join(self.root, "_manifests")):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def _read_manifest(self, version: int) -> dict:
        path = self._manifest_path(version)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"version {version} does not exist (or was vacuumed): {path}"
            )
        with open(path) as fh:
            return json.load(fh)

    # -- commit ---------------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "overwrite") -> int:
        """Write ``df`` as a new snapshot; returns the committed version.

        ``mode='append'`` makes the new version the union of the head's
        directories and the new one; ``'overwrite'`` replaces the list.
        The data write happens ONCE; only the (cheap) manifest create is
        retried on a concurrent-commit collision.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        known = self.versions()
        head = known[-1] if known else 0
        data_dir = os.path.join("data", f"c{head + 1:06d}-{os.getpid()}")
        df.write.mode("error").parquet(os.path.join(self.root, data_dir))
        while True:
            known = self.versions()
            head = known[-1] if known else 0
            dirs = [data_dir]
            if mode == "append" and head:
                dirs = self._read_manifest(head)["dirs"] + dirs
            manifest = {"version": head + 1, "op": mode, "dirs": dirs}
            try:
                # exclusive create IS the commit point: exactly one writer
                # can own a version number
                with open(self._manifest_path(head + 1), "x") as fh:
                    json.dump(manifest, fh)
                return head + 1
            except FileExistsError:
                continue  # lost the race: recompute against the new head

    # -- read / time travel ---------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        known = self.versions()
        if not known:
            raise FileNotFoundError(f"no committed versions under {self.root}")
        v = known[-1] if version is None else version
        dirs = self._read_manifest(v)["dirs"]
        return self.spark.read.parquet(
            *[os.path.join(self.root, d) for d in dirs]
        )

    def rollback(self, version: int) -> int:
        """Restore an old version's contents as a NEW head version (the
        safe rollback: history stays linear and the bad head stays
        auditable until vacuumed)."""
        old = self._read_manifest(version)
        while True:
            head = self.versions()[-1]
            manifest = {
                "version": head + 1,
                "op": f"rollback:{version}",
                "dirs": old["dirs"],
            }
            try:
                with open(self._manifest_path(head + 1), "x") as fh:
                    json.dump(manifest, fh)
                return head + 1
            except FileExistsError:
                continue

    # -- retention ------------------------------------------------------------

    def vacuum(self, retain_last: int = 2) -> dict:
        """Drop all but the last ``retain_last`` versions and delete data
        directories no retained manifest references. Returns counts for
        observability. Readers of a vacuumed version get a clear
        FileNotFoundError rather than a partial scan."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        known = self.versions()
        keep = set(known[-retain_last:])
        live: set[str] = set()
        for v in keep:
            live.update(self._read_manifest(v)["dirs"])
        dropped_versions = 0
        for v in known:
            if v not in keep:
                os.remove(self._manifest_path(v))
                dropped_versions += 1
        dropped_dirs = 0
        data_root = os.path.join(self.root, "data")
        for d in os.listdir(data_root):
            rel = os.path.join("data", d)
            if rel not in live:
                shutil.rmtree(os.path.join(data_root, d))
                dropped_dirs += 1
        return {
            "dropped_versions": dropped_versions,
            "dropped_dirs": dropped_dirs,
            "retained": sorted(keep),
        }
