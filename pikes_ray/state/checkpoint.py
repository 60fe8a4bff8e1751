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


def shard_inputs_by_hash(files: Sequence[str], n_shards: int) -> list[list[str]]:
    """Group input fragments by a stable hash of their BASENAME.

    Unlike positional sharding, a file's group does not move when
    other files are added or removed — the keying for INCREMENTAL
    corpus growth: appending fragments invalidates only the groups
    that actually received new files (their content digest changes),
    every untouched group's manifest stays a valid skip token.
    """
    import zlib

    n_shards = max(1, n_shards)
    groups: dict[int, list[str]] = {}
    for f in sorted(files):
        b = zlib.crc32(os.path.basename(f).encode("utf-8")) % n_shards
        groups.setdefault(b, []).append(f)
    return [groups[b] for b in sorted(groups)]


def shard_key(files: Sequence[str]) -> str:
    """Content-stable shard id: digest of the sorted basename list."""
    import hashlib

    names = "\x00".join(sorted(os.path.basename(f) for f in files))
    return "h" + hashlib.sha256(names.encode("utf-8")).hexdigest()[:12]


def _manifest_path(out_dir: str, k: int | str) -> str:
    tag = k if isinstance(k, str) else f"{k:05d}"
    return os.path.join(out_dir, "_lineage", f"shard-{tag}.json")


def completed_shards(out_dir: str) -> set[int | str]:
    lineage = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(lineage):
        return set()
    out: set[int | str] = set()
    for name in os.listdir(lineage):
        if name.startswith("shard-") and name.endswith(".json"):
            tag = name[6:-5]
            out.add(tag if tag.startswith("h") else int(tag))
    return out


def run_checkpointed(
    input_files: Sequence[str],
    out_dir: str,
    pipeline_fn: Callable,          # list[str] paths → ray.data.Dataset (triples)
    n_shards: int = 8,
    partition_cols: list[str] | None = None,
    keying: str = "positional",
) -> dict:
    """Run ``pipeline_fn`` per input shard, skipping completed shards.

    ``partition_cols`` hive-partitions each shard's parquet output
    (e.g. by triple scope so the finalize pass can prune at the file
    level).  Returns the run summary (shards done / skipped, row
    totals).

    ``keying``:
      - ``"positional"`` (default) — shard k = the k-th contiguous
        slice of the sorted file list; a resume over the SAME input
        skips completed shards, a changed input re-runs everything
        (manifest inputs are compared before every skip).
      - ``"hash"`` — shards are basename-hash groups named by a
        content digest of their file list (``shard-h<digest>``):
        appending fragments to a growing corpus invalidates ONLY the
        groups that received new files; untouched groups skip.  Stale
        group outputs (digests no longer produced by the current
        input) are removed so the final union never double-counts.
    """
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    if keying == "hash":
        shards = shard_inputs_by_hash(input_files, n_shards)
        keys: list[int | str] = [shard_key(fs) for fs in shards]
    else:
        shards = shard_inputs(input_files, n_shards)
        keys = list(range(len(shards)))
    done = completed_shards(out_dir)
    # shards no longer produced by the current (input, n_shards, keying)
    # are stale output: the finalize pass globs shard-*/, so leftovers
    # (hash groups whose membership changed, positional indices beyond a
    # smaller n_shards, or a keying-mode switch) would double-count.
    current_tags = {k if isinstance(k, str) else f"{k:05d}" for k in keys}
    for name in os.listdir(out_dir):
        if name.startswith("shard-") and name[6:] not in current_tags:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    for stale in done - set(keys):
        try:
            os.remove(_manifest_path(out_dir, stale))
        except OSError:
            pass
    done &= set(keys)
    summary = {"shards": len(shards), "skipped": 0, "ran": 0, "rows_out": 0}
    for k, files in zip(keys, shards):
        tag = k if isinstance(k, str) else f"{k:05d}"
        shard_dir = os.path.join(out_dir, f"shard-{tag}")
        if k in done:
            # a manifest is only a valid skip token if it was produced
            # from the SAME file list (positional sharding maps index k
            # to different files when the input or n_shards changes;
            # hash digests collide only for identical basename lists —
            # the inputs check still guards directory moves).
            with open(_manifest_path(out_dir, k)) as f:
                manifest = json.load(f)
            if manifest.get("inputs") == list(files):
                summary["skipped"] += 1
                summary["rows_out"] += manifest["rows_out"]
                continue
            import warnings

            warnings.warn(
                f"checkpoint shard {tag}: recorded inputs differ from the "
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
            "shard": tag,
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
