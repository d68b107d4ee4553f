"""Checkpoint-resumable stage runner with per-partition lineage + metrics
(SURVEY.md §4.3-3, north-rule 'resumable from checkpoint with
per-partition lineage + metrics').

Spark's own ``df.checkpoint()`` is not durable across spark-submit runs,
so checkpointing happens at the table level: every stage writes

    <root>/stage=<name>/part-*.parquet      (the stage output)
    <root>/stage=<name>/_manifest.json      (lineage + metrics)

The manifest records the input stage names/paths, per-partition row counts
and bytes, wall time, and a content fingerprint. ``run`` skips a stage
whose manifest is present and whose inputs' fingerprints are unchanged —
resuming a killed pipeline re-executes only incomplete stages.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

_MANIFEST = "_manifest.json"


class StageRunner:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, f"stage={name}")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), _MANIFEST)

    def manifest(self, name: str) -> dict | None:
        path = self._manifest_path(name)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None

    def is_complete(self, name: str, inputs: Sequence[str]) -> bool:
        m = self.manifest(name)
        if m is None:
            return False
        expected = {i: self._fingerprint(i) for i in inputs}
        return m.get("input_fingerprints") == expected

    def _fingerprint(self, name: str) -> str:
        m = self.manifest(name)
        return m["fingerprint"] if m else "external"

    def run(
        self,
        name: str,
        build: Callable[[], DataFrame],
        *,
        inputs: Sequence[str] = (),
        partition_by: Sequence[str] = (),
    ) -> DataFrame:
        """Build-or-load stage ``name``. ``build()`` returns the stage's
        DataFrame; it is only invoked when the stage is incomplete."""
        out_dir = self._stage_dir(name)
        if self.is_complete(name, inputs):
            return self.spark.read.parquet(out_dir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_dir)
        wall = time.time() - t0

        out = self.spark.read.parquet(out_dir)
        # per-partition lineage: rows per output file (file = unit of
        # re-execution on resume), via the input_file_name of each row
        per_file = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        def rel(uri: str) -> str:
            # path RELATIVE to the stage dir, not the basename: with
            # partition_by, files in different partition dirs from one
            # write job share basenames (part-00000-<job>.c000...), and
            # basenames would collide in the lineage
            p = uri.split("://", 1)[-1] if "://" in uri else uri
            p = p.split(":", 1)[-1] if p.startswith("file:") else p
            marker = f"/stage={name}/"
            return p.split(marker, 1)[1] if marker in p else os.path.basename(p)

        partitions = [
            {"file": rel(r["file"]), "rows": r["rows"]} for r in per_file
        ]
        total_rows = sum(p["rows"] for p in partitions)
        total_bytes = sum(
            os.path.getsize(os.path.join(dp, fn))
            for dp, _, fns in os.walk(out_dir)
            for fn in fns
        )
        completed_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        # fingerprint includes bytes AND the build time: a stage REBUILD
        # invalidates its downstream even when shape happens to match
        # (make-style mtime chaining — shape-only fingerprints let stale
        # stages skip after an upstream rebuild with equal row/file
        # counts, the worst checkpoint failure mode). Nanosecond
        # resolution: the second-granularity timestamp used before let a
        # rebuild that finished within the same wall-clock second as the
        # original produce an IDENTICAL fingerprint, silently skipping
        # the downstream rebuild (surfaced as a rare full-suite flake).
        fingerprint = (
            f"{name}:{total_rows}:{len(partitions)}:{total_bytes}:{time.time_ns()}"
        )
        manifest = {
            "stage": name,
            "inputs": list(inputs),
            "input_fingerprints": {i: self._fingerprint(i) for i in inputs},
            "rows": total_rows,
            "n_files": len(partitions),
            "bytes": total_bytes,
            "partitions": sorted(partitions, key=lambda p: p["file"]),
            "wall_seconds": round(wall, 3),
            "fingerprint": fingerprint,
            "completed_at": completed_at,
        }
        # atomic publish: a kill mid-dump must not leave truncated JSON
        # that wedges every future resume
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(name))
        return out

    def invalidate(self, name: str) -> None:
        path = self._manifest_path(name)
        if os.path.exists(path):
            os.remove(path)
