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


def triple_pr_by_namespace(predicted, gold,
                           namespaces: tuple[str, ...] = (
                               "pb:", "nb:", "vn:", "fn:", "sumo:",
                               "dbyago:", "fb:", "sem:", "owl:", "rdf:",
                           )) -> pd.DataFrame:
    """Namespace-split evaluation report (≙ eval/Evaluation.java's
    per-PB/NB/VN/FN precision tables): one triple_pr row per predicate
    namespace prefix (rdf: rows are type facts split by OBJECT
    namespace upstream of this helper — here they are reported as one
    'rdf:' row), plus the global roll-up."""
    import pyarrow.compute as pc

    def only(ds, ns):
        def pick(batch):
            return batch.filter(pc.starts_with(batch["pred"], ns))
        return ds.map_batches(pick, batch_format="pyarrow")

    rows = []
    for ns in namespaces:
        r = triple_pr(only(predicted, ns), only(gold, ns))
        rows.append({"namespace": ns, **r})
    rows.append({"namespace": "ALL", **triple_pr(predicted, gold)})
    return pd.DataFrame(rows)


def opinion_pr(predicted, gold) -> dict:
    """E6 — opinion-layer P/R (≙ pikes-raid Evaluation.java): the
    generic triple P/R restricted to opinion facts (ks:Opinion types
    and expression/target/holder links)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    op_types = pa.array(["ks:Opinion", "ks:PositiveOpinion",
                         "ks:NegativeOpinion", "ks:NeutralOpinion"])
    op_links = pa.array(["ks:expression", "ks:target", "ks:holder"])

    def opinions(ds):
        def pick(batch):
            m = pc.or_(
                pc.and_(pc.equal(batch["pred"], "rdf:type"),
                        pc.is_in(batch["obj"], value_set=op_types)),
                pc.is_in(batch["pred"], value_set=op_links))
            return batch.filter(m)
        return ds.map_batches(pick, batch_format="pyarrow")

    return triple_pr(opinions(predicted), opinions(gold))


# --------------------------------------------------------------------------
# distributed graph queries (VERDICT r1: the kg_* query surface must not
# to_pandas() the full triple set — at 100 TB these are exactly the
# queries a user runs on the whole graph, so they are combiner-first
# groupby-aggregates with per-block top-k, driver sees only the result)
# --------------------------------------------------------------------------


def entity_degree(triples, k: int = 100) -> pd.DataFrame:
    """Top-k fact-layer subjects by out-degree (degree = #fact triples).

    Shape: per-batch partial count → distributed groupby Sum → per-block
    top-k → driver merge of ≤ k×blocks rows (never the full graph)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        facts = df[df["graph"] != ""]
        return facts.groupby("subj", as_index=False).agg(degree=("pred", "size"))

    agg = triples.map_batches(partial, batch_format="pandas") \
        .groupby("subj").aggregate(Sum("degree", alias_name="degree"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["degree", "subj"], ascending=[False, True],
                              kind="mergesort").head(k)

    tops = agg.map_batches(block_topk, batch_format="pandas").to_pandas()
    tops["degree"] = tops["degree"].astype("int64")
    return tops.sort_values(["degree", "subj"], ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)


def type_counts(triples) -> pd.DataFrame:
    """Class histogram over rdf:type facts (vocabulary-bounded result)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["pred"] == "rdf:type"]
        return t.groupby("obj", as_index=False).agg(n=("subj", "size"))

    agg = triples.map_batches(partial, batch_format="pandas") \
        .groupby("obj").aggregate(Sum("n", alias_name="n"))
    df = agg.to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("obj").reset_index(drop=True)


def sameas_links(triples):
    """All owl:sameAs edges as a (subj, obj)-sorted Dataset — stays
    distributed; the caller decides whether to collect."""
    import pyarrow.compute as pc

    def pick(batch):
        return batch.filter(pc.equal(batch["pred"], "owl:sameAs")) \
            .select(["subj", "obj"])

    return triples.map_batches(pick, batch_format="pyarrow") \
        .sort(["subj", "obj"])


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
                                 "hits": [int(df["k"].isin(ray.get(ref)).sum())]}),
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
