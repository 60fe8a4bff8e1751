"""Golden end-to-end gate: live pipeline vs frozen reference triples
(FIXTURES.md §2, BASELINE.md quality target).

Precision/recall over the (subj, pred, obj) set must be ≥ 0.95 overall
AND per category (types / labels / participation / sameAs) — our
pipeline is deterministic, so in practice both are exactly 1.0; the
gate guards against semantic regressions.
"""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from pikes_ray.pipelines.kg import transcripts_to_graph
from pikes_ray.sources.transcripts import transcripts_dir

GOLD = os.path.join(os.path.dirname(__file__), "golden", "triples_gold.parquet")

CATEGORIES = {
    "types": lambda p: p == "rdf:type",
    "labels": lambda p: p in ("rdfs:label", "foaf:name"),
    "participation": lambda p: p.startswith(("sem:has", "pb:", "nb:")),
    "sameAs": lambda p: p == "owl:sameAs",
    "mentions": lambda p: p.startswith("nif:") or p in ("ks:expressedBy",),
    "attributes": lambda p: p in ("ks:quantity", "ks:rank", "ks:percentage",
                                  "gr:hasCurrencyValue", "gr:hasCurrency", "ks:mod"),
}


@pytest.fixture(scope="module")
def live(ray_session) -> pd.DataFrame:
    return transcripts_to_graph(transcripts_dir("unit"), concurrency=2).to_pandas()


@pytest.fixture(scope="module")
def gold() -> pd.DataFrame:
    return pq.read_table(GOLD).to_pandas()


def spo(df: pd.DataFrame) -> set:
    return set(zip(df["subj"], df["pred"], df["obj"]))


def pr(pred_set: set, gold_set: set) -> tuple[float, float]:
    if not pred_set or not gold_set:
        return (1.0 if pred_set == gold_set else 0.0,) * 2
    inter = len(pred_set & gold_set)
    return inter / len(pred_set), inter / len(gold_set)


def test_overall_pr(live, gold):
    p, r = pr(spo(live), spo(gold))
    assert p >= 0.95 and r >= 0.95, (p, r)


@pytest.mark.parametrize("cat", sorted(CATEGORIES))
def test_category_pr(live, gold, cat):
    f = CATEGORIES[cat]
    p, r = pr(spo(live[live["pred"].map(f)]), spo(gold[gold["pred"].map(f)]))
    assert p >= 0.95 and r >= 0.95, (cat, p, r)


def test_graph_column_matches(live, gold):
    # fact-graph hashes must be reproduced bit-for-bit
    lg = set(zip(live["subj"], live["pred"], live["obj"], live["graph"]))
    gg = set(zip(gold["subj"], gold["pred"], gold["obj"], gold["graph"]))
    assert lg == gg
