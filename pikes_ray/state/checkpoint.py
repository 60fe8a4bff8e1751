"""Resumable partitioned output with per-partition lineage manifests.

≙ the reference's output-file-existence checkpointing
(TintopOrchestrator.java:191-194 skips files whose ``.naf.gz`` exists;
RDFGenerator.java:384-389 skips existing ``.tql.gz`` intermediates) —
re-expressed for partitioned Parquet: the unit of work is an *input
shard* (a group of input fragments); each shard writes

    <out>/shard-<k>/part-*.parquet       (the triples)
    <out>/_lineage/shard-<k>.json        (manifest: inputs, counts,
                                          wall time, metrics)

The manifest is written LAST and atomically (tmp + rename), so a shard
directory without a manifest is treated as incomplete garbage and
re-done.  A restarted run skips every shard with a valid manifest —
identical final output, no duplicate partitions (SURVEY §5 test 3).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Sequence


def shard_inputs(files: Sequence[str], n_shards: int) -> list[list[str]]:
    """Deterministic contiguous sharding of sorted input fragments."""
    files = sorted(files)
    n_shards = max(1, min(n_shards, len(files)))
    per = (len(files) + n_shards - 1) // n_shards
    return [list(files[i : i + per]) for i in range(0, len(files), per)]


def _manifest_path(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, "_lineage", f"shard-{k:05d}.json")


def completed_shards(out_dir: str) -> set[int]:
    lineage = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(lineage):
        return set()
    out = set()
    for name in os.listdir(lineage):
        if name.startswith("shard-") and name.endswith(".json"):
            out.add(int(name[6:-5]))
    return out


def run_checkpointed(
    input_files: Sequence[str],
    out_dir: str,
    pipeline_fn: Callable,          # list[str] paths → ray.data.Dataset (triples)
    n_shards: int = 8,
    partition_cols: list[str] | None = None,
) -> dict:
    """Run ``pipeline_fn`` per input shard, skipping completed shards.

    ``partition_cols`` hive-partitions each shard's parquet output
    (e.g. by triple scope so the finalize pass can prune at the file
    level).  Returns the run summary (shards done / skipped, row
    totals).
    """
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    shards = shard_inputs(input_files, n_shards)
    done = completed_shards(out_dir)
    summary = {"shards": len(shards), "skipped": 0, "ran": 0, "rows_out": 0}
    for k, files in enumerate(shards):
        shard_dir = os.path.join(out_dir, f"shard-{k:05d}")
        if k in done:
            # sharding is positional (index over the sorted file list), so a
            # manifest is only a valid skip token if it was produced from the
            # SAME inputs and shard layout — otherwise shard k now maps to
            # different files and skipping would silently emit stale output.
            with open(_manifest_path(out_dir, k)) as f:
                manifest = json.load(f)
            if manifest.get("inputs") == list(files):
                summary["skipped"] += 1
                summary["rows_out"] += manifest["rows_out"]
                continue
            import warnings

            warnings.warn(
                f"checkpoint shard {k}: recorded inputs differ from the "
                "current run (input files or n_shards changed) — re-running "
                "the shard instead of skipping", stacklevel=2)
            os.remove(_manifest_path(out_dir, k))
        if os.path.isdir(shard_dir):          # incomplete garbage from a crash
            shutil.rmtree(shard_dir)
        t0 = time.perf_counter()
        ds = pipeline_fn(files)
        ds.write_parquet(shard_dir, partition_cols=partition_cols)
        import pyarrow.dataset as pads

        rows = pads.dataset(shard_dir).count_rows()
        rows_in = pads.dataset(list(files)).count_rows()
        in_bytes = sum(os.path.getsize(f) for f in files)
        wall = round(time.perf_counter() - t0, 3)
        manifest = {
            "shard": k,
            "n_shards": len(shards),
            "inputs": list(files),
            "input_rows": rows_in,
            "input_bytes": in_bytes,
            "rows_out": rows,
            "wall_sec": wall,
            "rows_in_per_sec": round(rows_in / wall, 1) if wall else None,
        }
        tmp = _manifest_path(out_dir, k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(out_dir, k))   # atomic publish
        summary["ran"] += 1
        summary["rows_out"] += rows
    return summary
