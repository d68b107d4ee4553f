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
import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .. import fsio

_MANIFEST = "_manifest.json"


class StageRunner:
    """Manifest IO goes through ``js_hll_spark.fsio`` (pyarrow.fs), so a
    cloud root ('s3://bucket/stages') keeps manifests BESIDE the stage
    data — with plain os/open calls the parquet landed remotely while
    the manifest landed on the driver's local disk, breaking resume
    from any other host (and letting a stale local manifest mark
    missing remote data complete)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        fsio.makedirs(root)

    def _stage_dir(self, name: str) -> str:
        return f"{self.root.rstrip('/')}/stage={name}"

    def _manifest_path(self, name: str) -> str:
        return f"{self._stage_dir(name)}/{_MANIFEST}"

    def manifest(self, name: str) -> dict | None:
        text = fsio.read_text(self._manifest_path(name))
        if text is None:
            return None
        try:
            return json.loads(text)
        except ValueError:
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
        # re-execution on resume) from the parquet FOOTERS — O(#files)
        # metadata reads. The previous implementation re-scanned the
        # whole just-written stage (groupBy over input_file_name),
        # doubling every stage's I/O for numbers the footers already
        # hold. Paths stay RELATIVE to the stage dir, not basenames:
        # with partition_by, files in different partition dirs share
        # basenames (part-00000-<job>.c000...) and would collide.
        listed = fsio.list_files(out_dir)
        partitions = [
            {
                "file": rel_path,
                "rows": fsio.parquet_num_rows(f"{out_dir}/{rel_path}"),
            }
            for rel_path, _sz in listed
            if rel_path.endswith(".parquet")
        ]
        total_rows = sum(p["rows"] for p in partitions)
        total_bytes = sum(sz for _rp, sz in listed)
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
        # that wedges every future resume (tmp-write + move via fsio)
        fsio.write_text_atomic(
            self._manifest_path(name),
            json.dumps(manifest, indent=1, sort_keys=True),
        )
        return out

    def invalidate(self, name: str) -> None:
        fsio.delete(self._manifest_path(name))
