"""E3 — corpus statistics (≙ naflib/CorpusStatistics.java) and
E4 — graph evaluation (≙ pikes-rdf eval/Aligner.java + Evaluation.java).

Our IRIs are deterministic, so evaluation needs no hill-climbing node
alignment: P/R is exact set comparison expressed as distributed
semi/anti joins (broadcast the smaller side's key hashes)."""

from __future__ import annotations

import pandas as pd

import ray
import ray.data as rd

from ray.data.aggregate import Max, Mean, Sum


def corpus_statistics(annotated) -> pd.DataFrame:
    """Per-corpus layer counts over an annotated Dataset:
    turns, sentences, tokens, entities, predicates, coref clusters."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "turns": [len(df)],
            "tokens": [int(df["tokens"].map(len).sum())],
            "sentences": [int(df["tokens"].map(
                lambda ts: (max((t["sent"] for t in ts), default=-1) + 1)).sum())],
            "entities": [int(df["entities"].map(len).sum())],
            "predicates": [int(df["predicates"].map(len).sum())],
            "corefs": [int(df["corefs"].map(len).sum())],
        })

    parts = annotated.map_batches(partial, batch_format="pandas")
    out = parts.aggregate(*[Sum(c, alias_name=c) for c in
                            ("turns", "tokens", "sentences", "entities",
                             "predicates", "corefs")])
    return pd.DataFrame([out])


def triple_pr(predicted, gold) -> dict:
    """Precision/recall of predicted vs gold triples over (subj,pred,obj).

    The gold key set is broadcast (``ray.put``); membership tests run
    inside ``map_batches`` — semi/anti join without a shuffle
    (SURVEY §2.7 E4: intersect = semi join, fp = anti join)."""

    def keys(ds):
        def k(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "k": (df["subj"] + "\x1f" + df["pred"] + "\x1f" + df["obj"]).unique()
            })
        return ds.map_batches(k, batch_format="pandas")

    gold_keys = set()
    for b in keys(gold).iter_batches(batch_size=65536, batch_format="pandas"):
        gold_keys.update(b["k"])
    ref = ray.put(gold_keys)

    # global key dedup: bounded-bucket partition + per-bucket drop_duplicates
    from pikes_ray.pipelines.shuffle import _with_part

    uniq = keys(predicted).map_batches(
        lambda df: _with_part(df, ["k"], 32), batch_format="pandas"
    ).groupby("_part").map_groups(
        lambda g: g.drop_duplicates("k").drop(columns=["_part"]),
        batch_format="pandas")

    agg = uniq.map_batches(
        lambda df: pd.DataFrame({"n": [len(df)],
                                 "hits": [sum(1 for x in df["k"] if x in ray.get(ref))]}),
        batch_format="pandas",
    ).aggregate(Sum("n", alias_name="n"), Sum("hits", alias_name="hits"))
    n_pred, hits = int(agg["n"]), int(agg["hits"])
    n_gold = len(gold_keys)
    return {
        "n_pred": n_pred,
        "n_gold": n_gold,
        "precision": hits / n_pred if n_pred else 1.0,
        "recall": hits / n_gold if n_gold else 1.0,
    }
