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
                 local_smush: bool = True, static_canon: bool = True,
                 per_mention: bool = False):
        self.per_mention = per_mention
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
        cols_conv: list = []
        cols_turn: list = []
        cols_s: list = []
        cols_p: list = []
        cols_o: list = []
        cols_g: list = []
        cols_c: list = []
        for i in range(len(conv)):
            t = text[i] or ""
            if "&" in t:
                t = html.unescape(t)            # M1 normalize
            quarantined = len(t) > self.max_text_len
            empty_ann = {"tokens": [], "deps": [], "entities": [],
                         "predicates": [], "corefs": [], "opinions": []}
            if quarantined or not t.strip():
                ann = empty_ann
            else:
                try:
                    ann = self.model.annotate(t)
                    ann = filter_document(ann, self.cfg)
                except Exception:
                    # poison-row channel (SURVEY §4): an annotator crash
                    # on adversarial text quarantines THIS document —
                    # never the whole batch/shard
                    quarantined = True
                    ann = empty_ann
            row = {"conv_id": conv[i], "turn_idx": turn[i], "role": role[i],
                   "text": t, "tool": tool[i], "ts": ts[i],
                   "quarantined": quarantined, **ann}
            ex = _DocExtractor(conv[i], turn[i], row,
                               sense_completion=self.cfg.term_sense_completion,
                               per_mention=self.per_mention,
                               opinion_linking=self.cfg.opinion_linking)
            try:
                triples = ex.run()
            except Exception:
                row["quarantined"] = True
                ex = _DocExtractor(conv[i], turn[i],
                                   {**row, **empty_ann},
                                   sense_completion=False)
                triples = ex.run()
            if triples:
                s, p, o, g, c = zip(*triples)
                cols_conv.extend([conv[i]] * len(triples))
                cols_turn.extend([turn[i]] * len(triples))
                cols_s.extend(s)
                cols_p.extend(p)
                cols_o.extend(o)
                cols_g.extend(g)
                cols_c.extend(c)
        from pikes_ray.stages.extract import fill_fact_graphs

        cols_g = fill_fact_graphs(cols_s, cols_p, cols_o, cols_g)
        table = pa.Table.from_pydict(
            {"conv_id": cols_conv, "turn_idx": cols_turn, "subj": cols_s,
             "pred": cols_p, "obj": cols_o, "graph": cols_g, "conf": cols_c},
            schema=TRIPLES_SCHEMA)
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
