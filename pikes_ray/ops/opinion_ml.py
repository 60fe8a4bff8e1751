"""Learned opinion-expression mining (pikes-raid analogue — VERDICT r2
'missing' #4).

The reference's pikes-raid module learns opinion EXPRESSION spans as a
token-level BIO tagging task: CreateTrainingForExpression.java:101-460
extracts per-token features (lemma, POS, SRL predicate/role membership
with rolesets, entity types, sentiment lexicons, a +-slot context
window) and writes CRFsuite training files; Trainer.java trains the
CRF; Evaluation.java scores span P/R.  No CRF/ML library exists in
this container, so the learned model here is an **averaged structured
perceptron** sequence tagger (Collins, EMNLP 2002) trained with
**iterative parameter mixing** (McDonald, Hall & Mann, NAACL 2010) —
both public algorithms:

1. feature extraction is a ``map_batches`` pass over annotated rows
   (one output row per sentence: token feature lists + BIO labels);
2. each training round hash-partitions the sentences, runs one local
   perceptron epoch per partition inside the bounded-partition group
   map (weights broadcast via ``ray.put``, updates stay partition-
   local), and averages the returned weight vectors on the driver —
   O(#features x #parts) driver work, never O(corpus);
3. tagging broadcasts the final averaged weights and decodes greedily
   (prev-label feature) inside ``map_batches``;
4. evaluation reduces per-batch (tp, fp, fn) span counts.

Training labels come from any opinion-span column; the default teacher
is the rule-based lexicon layer (stages/extract.t8_opinions semantics),
so the pipeline is self-contained — swap in gold spans (MPQA-style)
via the ``gold_spans`` argument to reproduce the reference's
supervised setup.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

_LABELS = ("O", "B", "I")


# ---------------------------------------------------------------------------
# feature extraction (≙ CreateTrainingForExpression.extractFeats)
# ---------------------------------------------------------------------------

def _token_features(row: dict) -> list[list[str]]:
    """Per-token static feature lists for one annotated row."""
    from pikes_ray.ops.text import _SENTIMENT, stem

    toks = row["tokens"]
    n = len(toks)
    is_pred: dict[int, str] = {}
    in_role: dict[int, str] = {}
    for p in row["predicates"]:
        is_pred[p["head"]] = p["sense"] or "?"
        for r in p["roles"]:
            for t in range(r["start"], r["end"]):
                in_role.setdefault(t, r["sem_role"] or "?")
    ent_type: dict[int, str] = {}
    for e in row["entities"]:
        for t in range(e["start"], e["end"]):
            ent_type[t] = e["etype"] or "MISC"

    feats: list[list[str]] = []
    for i, t in enumerate(toks):
        lemma = t["lemma"]
        f = [
            f"lemma={lemma}",
            f"stem={stem(lemma)}",
            f"pos={t['morphofeat']}",
            f"cpos={t['pos']}",
        ]
        score = _SENTIMENT.get(stem(lemma))
        if score is not None:
            f.append("lex=pos" if score > 0 else "lex=neg")
        if i in is_pred:
            f.append("isPredicate")
            f.append(f"isPredicate.{is_pred[i]}")
        if i in in_role:
            f.append("isRole")
            f.append(f"isRole.{in_role[i]}")
        if i in ent_type:
            f.append(f"ent={ent_type[i]}")
        # +-1 context window (reference default slot size)
        f.append(f"prevpos={toks[i - 1]['morphofeat'] if i else '<s>'}")
        f.append(f"prevlemma={toks[i - 1]['lemma'] if i else '<s>'}")
        f.append(f"nextpos={toks[i + 1]['morphofeat'] if i + 1 < n else '</s>'}")
        f.append(f"nextlemma={toks[i + 1]['lemma'] if i + 1 < n else '</s>'}")
        feats.append(f)
    return feats


def _teacher_spans(row: dict) -> list[tuple[int, int]]:
    """Default training labels: the rule-based lexicon layer's opinion
    expressions (single sentiment-bearing tokens — the same spans
    extract.t8_opinions emits)."""
    from pikes_ray.ops.text import _SENTIMENT, stem

    return [(i, i + 1) for i, t in enumerate(row["tokens"])
            if stem(t["lemma"]) in _SENTIMENT]


def _bio(n: int, spans: list[tuple[int, int]]) -> list[str]:
    labels = ["O"] * n
    for (b, e) in spans:
        for i in range(b, min(e, n)):
            labels[i] = "B" if i == b else "I"
    return labels


def opinion_training_frames(ann_ds, gold_spans=None):
    """Annotated Dataset → Dataset[doc_id, sent_id, feats, labels]
    (one row per sentence; ``feats`` list<list<string>>, ``labels``
    list<string>).  ``gold_spans``: optional fn(row) → [(b, e)] span
    supplier replacing the lexicon teacher."""
    span_fn = gold_spans or _teacher_spans

    def stage(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "sent_id": [], "feats": [], "labels": []}
        for row in df.to_dict("records"):
            if row.get("quarantined") or len(row["tokens"]) == 0:
                continue
            feats = _token_features(row)
            labels = _bio(len(row["tokens"]), span_fn(row))
            # split by sentence (the tagging unit, as in the reference)
            by_sent: dict[int, list[int]] = {}
            for i, t in enumerate(row["tokens"]):
                by_sent.setdefault(t["sent"], []).append(i)
            doc = f"{row['conv_id']}#turn={row['turn_idx']}"
            for s, idxs in sorted(by_sent.items()):
                out["doc_id"].append(doc)
                out["sent_id"].append(s)
                out["feats"].append([feats[i] for i in idxs])
                out["labels"].append([labels[i] for i in idxs])
        return pd.DataFrame(out)

    return ann_ds.map_batches(stage, batch_format="pandas")


# ---------------------------------------------------------------------------
# averaged perceptron (Collins 2002) + parameter mixing (McDonald 2010)
# ---------------------------------------------------------------------------

def _decode(feats: list[list[str]], w: dict) -> list[str]:
    """Greedy left-to-right decoding with a prev-label feature."""
    out: list[str] = []
    prev = "<s>"
    for f in feats:
        fs = f + [f"prev={prev}"]
        best, best_s = "O", float("-inf")
        for lab in _LABELS:
            if lab == "I" and prev not in ("B", "I"):
                continue                      # BIO validity
            s = sum(w.get((x, lab), 0.0) for x in fs)
            if s > best_s:
                best, best_s = lab, s
        out.append(best)
        prev = best
    return out


def _train_epoch(sentences, w: dict) -> dict:
    """One local perceptron epoch; returns the AVERAGED weights of the
    pass (running-sum trick)."""
    w = dict(w)
    sums: dict = defaultdict(float)
    step = 0
    total = sum(len(s) for (s, _l) in sentences) or 1
    for feats, labels in sentences:
        pred = _decode(feats, w)
        prev_g, prev_p = "<s>", "<s>"
        for f, g, p in zip(feats, labels, pred):
            step += 1
            if g != p:
                for x in f + [f"prev={prev_g}"]:
                    k = (x, g)
                    w[k] = w.get(k, 0.0) + 1.0
                    sums[k] += total - step
                for x in f + [f"prev={prev_p}"]:
                    k = (x, p)
                    w[k] = w.get(k, 0.0) - 1.0
                    sums[k] -= total - step
            prev_g, prev_p = g, p
    return {k: v + sums.get(k, 0.0) / total for k, v in w.items()}


def train_opinion_tagger(frames_ds, rounds: int = 3, n_parts: int = 8) -> dict:
    """Iterative parameter mixing over hash partitions of the training
    sentences.  Each round: broadcast w, one local epoch per partition
    (bounded group map), average the partition weights on the driver.
    → {(feature, label): weight}."""
    import ray

    from pikes_ray.pipelines.shuffle import _with_part

    # one training SHARD per hash bucket of doc_id (NOT per doc — each
    # shard must run a whole local epoch over all its sentences)
    parted = frames_ds.map_batches(
        lambda df: _with_part(df, ["doc_id"], n_parts),
        batch_format="pandas").materialize()

    w: dict = {}
    for _ in range(rounds):
        ref = ray.put(w)

        def epoch(g: pd.DataFrame) -> pd.DataFrame:
            part_id = int(g["_part"].iloc[0])
            g = g.sort_values(["doc_id", "sent_id"])   # deterministic order
            sents = [(list(map(list, f)), list(l))
                     for f, l in zip(g["feats"], g["labels"])]
            lw = _train_epoch(sents, ray.get(ref))
            return pd.DataFrame({
                "feat": [x for (x, _lab) in lw],
                "label": [lab for (_x, lab) in lw],
                "weight": list(lw.values()),
                "part_id": part_id,
            })

        parts = parted.groupby("_part").map_groups(
            epoch, batch_format="pandas").to_pandas()
        if not len(parts):
            break
        # uniform mixing over the shards that actually held data
        n_contrib = max(parts["part_id"].nunique(), 1)
        agg = parts.groupby(["feat", "label"])["weight"].sum()
        w = {(f, l): v / n_contrib for (f, l), v in agg.items()}
    return w


def tag_opinion_spans(ann_ds, weights: dict):
    """Apply learned weights → Dataset[doc_id, start, end] predicted
    opinion-expression spans (token indices, doc-level)."""
    import ray

    ref = ray.put(weights)

    def stage(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(ref)
        out = {"doc_id": [], "start": [], "end": []}
        for row in df.to_dict("records"):
            if row.get("quarantined") or len(row["tokens"]) == 0:
                continue
            feats = _token_features(row)
            by_sent: dict[int, list[int]] = {}
            for i, t in enumerate(row["tokens"]):
                by_sent.setdefault(t["sent"], []).append(i)
            doc = f"{row['conv_id']}#turn={row['turn_idx']}"
            for _s, idxs in sorted(by_sent.items()):
                pred = _decode([feats[i] for i in idxs], w)
                b = None
                for j, lab in enumerate(pred + ["O"]):
                    if lab == "B":
                        if b is not None:
                            out["doc_id"].append(doc)
                            out["start"].append(idxs[b])
                            out["end"].append(idxs[j - 1] + 1)
                        b = j
                    elif lab == "O" and b is not None:
                        out["doc_id"].append(doc)
                        out["start"].append(idxs[b])
                        out["end"].append(idxs[j - 1] + 1)
                        b = None
        return pd.DataFrame(out)

    return ann_ds.map_batches(stage, batch_format="pandas")


def evaluate_opinion_spans(pred_df: pd.DataFrame,
                           gold_df: pd.DataFrame) -> dict:
    """Exact-span P/R/F1 (≙ Evaluation.java precision/recall)."""
    p = {tuple(r) for r in pred_df[["doc_id", "start", "end"]]
         .itertuples(index=False)}
    g = {tuple(r) for r in gold_df[["doc_id", "start", "end"]]
         .itertuples(index=False)}
    tp = len(p & g)
    prec = tp / len(p) if p else 1.0
    rec = tp / len(g) if g else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "n_pred": len(p), "n_gold": len(g),
            "precision": prec, "recall": rec, "f1": f1}
