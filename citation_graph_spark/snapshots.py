"""Snapshot catalog — an executable Iceberg-analog over plain parquet.

The north-star deployment reads "Iceberg tables of source-code
repositories" (BASELINE.json); ``tables.py`` isolates that as a
catalog seam but this sandbox ships no Iceberg runtime jar. This
module makes the table-format semantics the engine actually depends
on REAL and testable with no external runtime, the same way Iceberg
implements them — an immutable data-file layer plus a tiny metadata
layer committed atomically:

    <root>/data/v00001/part-*.parquet     immutable data files
    <root>/manifests/v00001.json          snapshot manifest

Each manifest records the snapshot's parent, operation, and the FULL
list of live data files with per-file row counts and min/max column
stats. That single design gives, exactly as in Iceberg:

- **Atomic commits** — a manifest is staged to a temp path and
  ``os.replace``-d into place; readers either see the old snapshot or
  the new one, never a torn file list (crash between data write and
  manifest publish leaves orphan data files, never a corrupt table).
- **Time travel** — ``read(spark, version=k)`` plans from manifest k.
- **Incremental (CDC-style) reads** — ``incremental(spark, v_from,
  v_to)`` plans only the data files added after ``v_from``: the diff
  is a set difference of manifest file lists, no data comparison.
  This is what feeds the engine's warm-started kernel refreshes
  (streaming/incremental.py): new snapshot → new-files-only edge
  extraction → ``pagerank(init_ranks=prev)`` in O(drift) rounds.
- **Manifest-level pruning** — ``scan(..., predicates={col: (lo,
  hi)})`` drops files whose [min, max] range cannot overlap the
  predicate BEFORE Spark plans the read; at 10^12-file scale this is
  the difference between planning over file stats and listing a
  filesystem. (Parquet row-group pushdown still applies inside each
  surviving file; this layer prunes whole files.)

The reference's own ingestion contract is batch-with-checkpoints
(fetch, left-anti against processed state, append —
data_sources/utils.py:23-121); a snapshot append + incremental read is
that same contract made atomic and replayable.

Scale posture: file stats are computed with one distributed
aggregation over the just-written files (groupBy input_file_name —
map-side combine, one tiny shuffle); manifests carry relative paths so
a table relocates with a rename; nothing here collects data rows to
the driver.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotCatalog:
    """A versioned parquet table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "manifests", f"v{version:05d}.json")

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(os.path.join(self.root, "manifests")):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"no snapshots at {self.root}")
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict[str, Any]]:
        return [
            {k: m[k] for k in ("version", "parent", "operation", "total_rows")}
            for m in (self.manifest(v) for v in self.versions())
        ]

    # -- write path --------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        stats_cols: list[str] | None = None,
    ) -> int:
        """Write ``df`` as a new snapshot; returns the new version.

        ``mode='append'`` keeps the parent's live files; ``'overwrite'``
        replaces them (the old files stay on disk for time travel —
        expiring old snapshots is a separate GC decision, as in
        Iceberg). ``stats_cols`` selects the columns whose per-file
        min/max land in the manifest for scan pruning."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        parent = self.current_version()
        version = (parent or 0) + 1
        data_dir = os.path.join(self.root, "data", f"v{version:05d}")
        df.write.mode("errorifexists").parquet(data_dir)

        spark = df.sparkSession
        new_files = self._collect_file_entries(spark, data_dir, stats_cols)

        live: list[dict[str, Any]] = []
        if mode == "append" and parent is not None:
            live = list(self.manifest(parent)["files"])
        live += new_files

        manifest = {
            "version": version,
            "parent": parent,
            "operation": mode,
            "schema": df.schema.json(),
            "stats_cols": stats_cols or [],
            "added_files": [e["path"] for e in new_files],
            "files": live,
            "total_rows": sum(e["rows"] for e in live),
        }
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(version))  # the atomic commit
        return version

    def _collect_file_entries(
        self, spark: SparkSession, data_dir: str, stats_cols: list[str] | None
    ) -> list[dict[str, Any]]:
        scan = spark.read.parquet(data_dir).withColumn(
            "_file", F.input_file_name()
        )
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in stats_cols or []:
            aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
        rows = scan.groupBy("_file").agg(*aggs).collect()
        entries = []
        for r in rows:
            path = r["_file"]
            if path.startswith("file:"):
                path = path[5:]
                while path.startswith("//"):
                    path = path[1:]
            # stored relative to root: the table relocates with a rename
            rel = os.path.relpath(path, self.root)
            stats = {
                c: [r[f"_min_{c}"], r[f"_max_{c}"]] for c in stats_cols or []
            }
            entries.append({"path": rel, "rows": r["_rows"], "stats": stats})
        return sorted(entries, key=lambda e: e["path"])

    # -- read paths --------------------------------------------------------
    def _abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def _plan(
        self, spark: SparkSession, files: list[str], manifest: dict[str, Any]
    ) -> DataFrame:
        if not files:
            # empty snapshot diff: preserve the table schema
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(manifest["schema"]))
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*files)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Time-travel read: the table exactly as of ``version``."""
        m = self.manifest(version)
        return self._plan(spark, [self._abs(e["path"]) for e in m["files"]], m)

    def incremental(
        self, spark: SparkSession, v_from: int, v_to: int | None = None
    ) -> DataFrame:
        """Rows in data files added after ``v_from`` up to ``v_to`` —
        a metadata-only diff (set difference of manifest file lists)."""
        old = {e["path"] for e in self.manifest(v_from)["files"]}
        m_to = self.manifest(v_to)
        added = [
            self._abs(e["path"]) for e in m_to["files"] if e["path"] not in old
        ]
        return self._plan(spark, added, m_to)

    def prune_files(
        self,
        predicates: dict[str, tuple[Any, Any]],
        version: int | None = None,
    ) -> tuple[list[str], int]:
        """Manifest-level pruning: relative paths of live files whose
        stats ranges can overlap every [lo, hi] predicate, plus the
        total live-file count (for prune-ratio reporting)."""
        m = self.manifest(version)
        keep = []
        for e in m["files"]:
            ok = True
            for col, (lo, hi) in predicates.items():
                st = e["stats"].get(col)
                if st is None:
                    continue  # no stats for this column: cannot prune
                fmin, fmax = st
                if fmin is None or fmax is None:
                    continue  # all-NULL or statless file: keep
                if (hi is not None and fmin > hi) or (
                    lo is not None and fmax < lo
                ):
                    ok = False
                    break
            if ok:
                keep.append(e["path"])
        return keep, len(m["files"])

    def scan(
        self,
        spark: SparkSession,
        predicates: dict[str, tuple[Any, Any]],
        version: int | None = None,
    ) -> DataFrame:
        """Pruned read: plan only stat-overlapping files, then apply
        the predicates exactly (file stats are a superset filter)."""
        keep, _ = self.prune_files(predicates, version)
        df = self._plan(
            spark, [self._abs(p) for p in keep], self.manifest(version)
        )
        for col, (lo, hi) in predicates.items():
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        return df
