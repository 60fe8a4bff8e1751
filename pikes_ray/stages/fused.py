"""Fused flagship stage: transcripts → triples in ONE actor-pool pass.

The composable stages (normalize → AnnotatorStage → FilterStage →
extract_batch) materialize the nested annotation columns between
operators — clean for testing/inspection, but the Arrow nested-array
build + ``to_pylist`` round-trips cost ~2× the useful compute.  The
flagship pipeline therefore uses this fused stage: per row,
annotate → filter → extract entirely in Python objects, emitting the
exploded triples table directly.  Semantics are identical by
construction (it calls the same functions); tests assert the fused and
staged paths produce equal triple sets.
"""

from __future__ import annotations

import html

import pyarrow as pa

from pikes_ray.schema import TRIPLES_SCHEMA
from pikes_ray.stages.annotate import RuleAnnotator
from pikes_ray.stages.extract import _DocExtractor
from pikes_ray.stages.filter import FilterConfig, filter_document
from pikes_ray.stages.normalize import DEFAULT_MAX_TEXT_LEN


class KGStage:
    """``transcripts.map_batches(KGStage, concurrency=N)`` → triples."""

    def __init__(self, cfg: FilterConfig | None = None,
                 max_text_len: int = DEFAULT_MAX_TEXT_LEN,
                 local_smush: bool = True, static_canon: bool = True):
        self.model = RuleAnnotator()
        self.cfg = cfg or FilterConfig()
        self.max_text_len = max_text_len
        # inline corpus canonicalization from the pinned gazetteer
        # (lexicon.static_canon_map); alias sameAs links preserved
        from pikes_ray.functions.lexicon import static_canon_map

        self.canon_map = static_canon_map() if static_canon else None
        # doc-local sameAs closure runs here, where each document's
        # triples are guaranteed complete within the batch (a later
        # re-batched stage could split a document across batches and
        # make output depend on block boundaries)
        self.local_smush = local_smush

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        role = batch["role"].to_pylist()
        text = batch["text"].to_pylist()
        tool = batch["tool"].to_pylist()
        ts = batch["ts"].to_pylist()
        out = {k: [] for k in
               ("conv_id", "turn_idx", "subj", "pred", "obj", "graph", "conf")}
        for i in range(len(conv)):
            t = text[i] or ""
            if "&" in t:
                t = html.unescape(t)            # M1 normalize
            quarantined = len(t) > self.max_text_len
            if quarantined or not t.strip():
                ann = {"tokens": [], "deps": [], "entities": [],
                       "predicates": [], "corefs": []}
            else:
                ann = self.model.annotate(t)
                ann = filter_document(ann, self.cfg)
            row = {"conv_id": conv[i], "turn_idx": turn[i], "role": role[i],
                   "text": t, "tool": tool[i], "ts": ts[i],
                   "quarantined": quarantined, **ann}
            ex = _DocExtractor(conv[i], turn[i], row,
                               sense_completion=self.cfg.term_sense_completion)
            for (s, p, o, g, c) in ex.run():
                out["conv_id"].append(conv[i])
                out["turn_idx"].append(turn[i])
                out["subj"].append(s)
                out["pred"].append(p)
                out["obj"].append(o)
                out["graph"].append(g)
                out["conf"].append(c)
        table = pa.Table.from_pydict(out, schema=TRIPLES_SCHEMA)
        if self.local_smush:
            from pikes_ray.pipelines.canonicalize import smush_local_batch

            table = smush_local_batch(table)
        if self.canon_map:
            from pikes_ray.pipelines.canonicalize import _rewrite_table

            table = _rewrite_table(table, self.canon_map,
                                   rewrite_sameas_subj=False)
        return table


_PROCESS_STAGE: KGStage | None = None


def kg_stage_task(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of KGStage with a per-worker-process model
    cache.

    The rule model is ~1 MB and builds in ~50 ms, so task mode with a
    module-level singleton beats an actor pool here: tasks schedule on
    every CPU immediately (no pool ramp-up), and each Ray worker
    process builds the model once.  For heavy models (GBs, slow load)
    use the ``KGStage`` actor pool instead — same semantics.
    """
    global _PROCESS_STAGE
    if _PROCESS_STAGE is None:
        from pikes_ray.functions.worker import ensure_worker_tuned

        ensure_worker_tuned()
        _PROCESS_STAGE = KGStage()
    return _PROCESS_STAGE(batch)
