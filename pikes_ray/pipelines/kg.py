"""The flagship pipeline: transcripts → knowledge graph (SURVEY §3.4).

Fused fast path (default):

    ds = read_parquet(transcripts)                  # S1
    tr = map_batches(kg_stage_task)                 # M1+A1-A5+F1-F17+T0-T8
                                                    #  + E2 doc-local closure
                                                    #  + E2 static broadcast canon
    tr = _pin(tr, spill_dir)                        # pin: dedup reads twice
                                                    #  (object store, or parquet
                                                    #  auto-chosen at scale)
    tr = dedup_exact(tr)                            # E1: doc-scoped bypass +
                                                    #  corpus-fact shuffle
Staged path (``fused=False`` — same output, asserted by tests):

    annotate (actor pool) → filter → extract → smush_local
    → smush_global (dynamic sameAs vocabulary, broadcast rewrite)
    → dedup_exact

Checkpointed builds write per-shard parquet intermediates instead of
materializing (build_graph_checkpointed).
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

from pikes_ray.stages.annotate import AnnotatorStage
from pikes_ray.stages.extract import extract_batch
from pikes_ray.stages.filter import FilterConfig, FilterStage
from pikes_ray.pipelines.canonicalize import (
    dedup_exact,
    smush_global,
    smush_local_batch,
)
from pikes_ray.state.checkpoint import run_checkpointed


def annotate_transcripts(
    ds,
    cfg: FilterConfig | None = None,
    concurrency: int | tuple[int, int] = (2, 8),
    batch_size: int = 256,
):
    """read → normalize+annotate (actor pool) → filter.  ``batch_size``
    stays small so one long turn never dominates a batch (SURVEY §4
    skew row)."""
    ds = ds.map_batches(
        AnnotatorStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return ds.map_batches(FilterStage(cfg), batch_format="pyarrow", batch_size=batch_size)


def extract_graph(ds, canonicalize: bool = True, dedup: bool = True):
    """Annotated turns → canonical deduplicated triples Dataset."""
    tr = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    # batch_size=None → whole blocks: extract emits complete documents
    # per block, so the doc-local closure never sees a split document
    tr = tr.map_batches(smush_local_batch, batch_format="pyarrow", batch_size=None)
    if canonicalize:
        # the sameAs-vocabulary pass and the rewrite both consume `tr`;
        # pin it so the annotator stages don't recompute.  (The
        # checkpointed build avoids this by writing shard parquet
        # intermediates instead — build_graph_checkpointed.)
        tr = tr.materialize()
        tr = smush_global(tr)
    if dedup:
        tr = dedup_exact(tr)   # merge phase already drops the _h key column
    return tr


def _auto_concurrency() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus - 2)   # leave headroom for read/shuffle stages


# parquet transcripts explode ~600x into in-memory Arrow triples
# (measured: 37 MB parquet at sf1.0 → ~23 GB materialized triple set).
# Pinning more than ~40% of the object store deadlocks the dedup stage
# (its two consuming branches leave no budget for new task outputs and
# the executor stalls with idle workers), so past that point the pin
# goes to parquet automatically.
_TRIPLE_EXPANSION = 600
# in-memory Arrow transcripts are ~4x their snappy-parquet bytes, so the
# same triple set is ~150x a Dataset's size_bytes() estimate
_TRIPLE_EXPANSION_MEM = _TRIPLE_EXPANSION // 4


def _estimate_parquet_bytes(source) -> float | None:
    """On-disk parquet bytes feeding ``source`` (a dir path or Dataset).

    For Dataset sources (e.g. kg_docs_triples passes one in) the input
    files are sized when the plan exposes them; otherwise the Dataset's
    in-memory estimate is scaled back to parquet-equivalent bytes so the
    40%-of-store pin guard still engages (round-2 verdict 'wrong' #6).
    """
    if isinstance(source, str):
        try:
            return sum(os.path.getsize(p) for p in
                       glob.glob(os.path.join(source, "*.parquet")))
        except OSError:
            return None
    try:
        files = source.input_files()
    except Exception:
        files = []
    if files:
        try:
            return sum(os.path.getsize(p) for p in files if os.path.exists(p))
        except OSError:
            pass
    try:
        sz = source.size_bytes()
    except Exception:
        return None
    if not sz:
        return None
    return sz / (_TRIPLE_EXPANSION / _TRIPLE_EXPANSION_MEM)


def _auto_spill_dir(source) -> str | None:
    nbytes = _estimate_parquet_bytes(source)
    if nbytes is None:
        return None
    try:
        import ray

        store = ray.cluster_resources().get("object_store_memory", 0)
    except Exception:
        store = 0
    if not store or nbytes * _TRIPLE_EXPANSION <= 0.4 * store:
        return None
    import logging
    import tempfile

    d = tempfile.mkdtemp(prefix="pikes_ray_spill_")
    logging.getLogger(__name__).warning(
        "transcripts_to_graph: estimated triple set (~%.0f GB) exceeds 40%% "
        "of the object store (%.0f GB) — pinning to parquet at %s (pass "
        "spill_dir=/path to control placement, or use "
        "build_graph_checkpointed for resumability)",
        nbytes * _TRIPLE_EXPANSION / 2**30, store / 2**30, d)
    return d


def transcripts_to_graph(
    source,
    cfg: FilterConfig | None = None,
    canonicalize: bool = True,
    dedup: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    fused: bool = True,
    batch_size: int = 256,
    spill_dir: str | None = None,
    task_num_cpus: int | None = None,
):
    """Full pipeline. ``source`` = Dataset or parquet dir.

    ``task_num_cpus`` is the logical-CPU claim per annotation task —
    raise it to 2 on nodes whose delivered memory bandwidth saturates
    below the vCPU count (measure first: bench.py's probe does), so the
    scheduler stops oversubscribing the memory controllers.  Default:
    the driver-wide ``pikes_ray.runtime.task_num_cpus()`` knob.

    ``fused=True`` (default) runs the single-pass KGStage actor pool;
    ``fused=False`` runs the composable per-layer stages (same output).
    A fixed-size pool (int concurrency) is used by default — autoscaling
    pools ramp too slowly for short batch jobs.

    The dedup stage consumes the extracted triples twice, so they must
    be pinned: in the object store (``materialize``) while the
    estimated triple set fits comfortably, and to partitioned parquet
    otherwise — chosen automatically from the input size (override
    with ``spill_dir=``); the fully resumable variant is
    ``build_graph_checkpointed``.
    """
    ds = rd.read_parquet(source) if isinstance(source, str) else source
    if spill_dir is None and dedup:
        spill_dir = _auto_spill_dir(source)
    if concurrency is None:
        concurrency = _auto_concurrency()
    if task_num_cpus is None:
        from pikes_ray.runtime import task_num_cpus as _rt_cpus

        task_num_cpus = _rt_cpus()
    if fused:
        if cfg is None:
            # default config → stateless tasks + per-process model cache
            # (no actor-pool ramp; see stages/fused.kg_stage_task)
            from pikes_ray.stages.fused import kg_stage_task

            tr = ds.map_batches(
                kg_stage_task,
                batch_format="pyarrow",
                batch_size=batch_size,
                num_cpus=task_num_cpus,
            )
        else:
            from pikes_ray.stages.fused import KGStage

            tr = ds.map_batches(
                KGStage,
                fn_constructor_kwargs={"cfg": cfg},
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
                num_cpus=task_num_cpus,
            )
        # corpus canonicalization already ran inline in KGStage (static
        # gazetteer map; the dynamic smush path below serves un-pinned
        # linkers and the staged pipeline)
        if dedup:
            # dedup_exact consumes its input twice (bypass + combiner
            # branches) — pin the extracted triples so annotation runs
            # exactly once: object store by default, parquet when
            # spilling.  (The checkpointed build passes parquet-backed
            # shards instead.)
            if spill_dir is None:
                tr = dedup_exact(_pin(tr, None))
            else:
                # spill partitioned by scope at WRITE time: each dedup
                # branch then reads only its own files instead of
                # re-reading and re-filtering the full triple set twice
                # (sf1.0: the single-dir spill cost two full 14 GB
                # scans of 123M rows)
                from pikes_ray.pipelines.canonicalize import dedup_exact_streams

                meta, facts = _spill_split(tr, spill_dir)
                tr = dedup_exact_streams(meta, facts)
        return tr
    ds = annotate_transcripts(ds, cfg, concurrency=concurrency)
    return extract_graph(ds, canonicalize=canonicalize, dedup=dedup)


def _pin(tr, spill_dir: str | None):
    """Pin a Dataset for multi-consumption: ``materialize`` (default) or
    partitioned-parquet spill + re-read (bounded object-store use)."""
    if spill_dir is None:
        return tr.materialize()
    import shutil

    if os.path.isdir(spill_dir):
        shutil.rmtree(spill_dir)
    tr.write_parquet(spill_dir)
    return rd.read_parquet(spill_dir)


def _add_scope_batch(t):
    """Append ``scope`` ∈ {doc, fact}: doc-scoped rows carry a
    ``conv:`` IRI on either side (globally unique by construction),
    fact rows are corpus-level and can collide across documents."""
    import pyarrow as pa
    import pyarrow.compute as pc

    doc = pc.or_(pc.starts_with(t["subj"], "conv:"),
                 pc.starts_with(t["obj"], "conv:"))
    return t.append_column("scope",
                           pc.if_else(doc, pa.scalar("doc"), pa.scalar("fact")))


def _spill_split(tr, spill_dir: str):
    """Spill to parquet hive-partitioned on triple scope → (meta, facts).

    ``scope=doc`` holds doc-scoped triples (a ``conv:`` IRI on either
    side — globally unique by construction, the dedup bypass stream);
    ``scope=fact`` holds corpus-level facts (the only rows that can
    collide across documents).  Each branch of the downstream dedup
    reads ONLY its own files — file-level pruning instead of two full
    scans with per-row filters."""
    import shutil

    import pyarrow.compute as pc

    if os.path.isdir(spill_dir):
        # only clear a directory this pipeline plausibly wrote (empty, or
        # scope=* hive layout) — never silently destroy unrelated data
        entries = [e for e in os.listdir(spill_dir) if not e.startswith(".")]
        if entries and not all(e.startswith("scope=") for e in entries):
            raise ValueError(
                f"spill_dir {spill_dir!r} is non-empty and does not look "
                "like a previous spill (expected only scope=* subdirs); "
                "refusing to delete it — point spill_dir at an empty or "
                "pipeline-owned directory")
        shutil.rmtree(spill_dir)

    tr.map_batches(_add_scope_batch, batch_format="pyarrow", batch_size=None) \
        .write_parquet(spill_dir, partition_cols=["scope"])

    def _part(name: str):
        d = os.path.join(spill_dir, f"scope={name}")
        if os.path.isdir(d):
            # partitioning=None: stop Ray re-inferring scope from the
            # directory name — the union downstream needs the clean
            # TRIPLES_SCHEMA on both sides
            return rd.read_parquet(d, partitioning=None)
        import pyarrow as pa

        from pikes_ray.schema import TRIPLES_SCHEMA

        return rd.from_arrow(TRIPLES_SCHEMA.empty_table())

    return _part("doc"), _part("fact")


def build_graph_checkpointed(
    input_dir: str,
    out_dir: str,
    n_shards: int = 8,
    cfg: FilterConfig | None = None,
    sort_output: bool = False,
    keying: str = "positional",
) -> dict:
    """Resumable build: per-shard annotate+extract+local-smush+local-dedup
    written to ``<out>/shard-k`` with lineage manifests (the expensive,
    restartable part — ≙ per-file .tql.gz intermediates,
    RDFGenerator.java:384-416), then one global finalize pass (corpus
    smush + exact dedup) into ``<out>/graph``.

    ``keying="hash"`` makes the build INCREMENTAL over a growing
    corpus: shards are stable basename-hash groups, so re-running
    after new fragments were appended to ``input_dir`` re-annotates
    only the groups that received new files (everything else skips)
    and then re-finalizes; the result is identical to a from-scratch
    build over the full corpus.
    """
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))

    def per_shard(shard_files):
        tr = transcripts_to_graph(rd.read_parquet(shard_files), cfg,
                                  canonicalize=False, dedup=False)
        return tr.map_batches(_add_scope_batch, batch_format="pyarrow",
                              batch_size=None)

    # shards are hive-partitioned by triple scope so the finalize pass
    # prunes at the file level (same layout as _spill_split)
    summary = run_checkpointed(files, out_dir, per_shard, n_shards=n_shards,
                               partition_cols=["scope"], keying=keying)

    def _scope_ds(name: str):
        import pyarrow.compute as _pc

        # glob the files, not the dirs: a LIST of paths goes to
        # pq.ParquetDataset verbatim (no directory expansion)
        fs = sorted(glob.glob(os.path.join(out_dir, "shard-*",
                                           f"scope={name}", "*.parquet")))
        # a shard written flat (an older run, or a caller's own
        # run_checkpointed without partition_cols) still contributes —
        # filter it by scope at read instead of dropping it
        flat = sorted(glob.glob(os.path.join(out_dir, "shard-*", "*.parquet")))
        ds = rd.read_parquet(fs, partitioning=None) if fs else None
        if flat:
            want_doc = (name == "doc")

            def scope_filter(t):
                doc = _pc.or_(_pc.starts_with(t["subj"], "conv:"),
                              _pc.starts_with(t["obj"], "conv:"))
                return t.filter(doc if want_doc else _pc.invert(doc))

            f = rd.read_parquet(flat).map_batches(
                scope_filter, batch_format="pyarrow", batch_size=None)
            ds = f if ds is None else ds.union(f)
        if ds is not None:
            return ds
        from pikes_ray.schema import TRIPLES_SCHEMA

        return rd.from_arrow(TRIPLES_SCHEMA.empty_table())

    from pikes_ray.pipelines.canonicalize import smush_dedup_streams

    tr = smush_dedup_streams(_scope_ds("doc"), _scope_ds("fact"))
    if sort_output:
        # O2 stable output ordering (conv_id, turn_idx) — an explicit
        # all-to-all range sort; off by default (provenance columns
        # already allow ordered reads per conversation)
        tr = tr.sort(["conv_id", "turn_idx"])
    graph_dir = os.path.join(out_dir, "graph")
    import shutil

    if os.path.isdir(graph_dir):
        shutil.rmtree(graph_dir)
    tr.write_parquet(graph_dir)
    summary["graph_dir"] = graph_dir
    return summary
