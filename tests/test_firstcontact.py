"""Freeze integrity of the round-5 first-contact corpus
(docs/eval-firstcontact): the sentences were committed before any
round-5 engine change and are scored exactly once, at round end.
These tests pin the frozen texts and check the gold files stay
loadable — they deliberately do NOT run the engine on the sentences
(that single run happens at round end; see the corpus README)."""

import hashlib
import os

import pytest

FC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "eval-firstcontact")

FROZEN_SHA256 = "a9f0ab21aa0fa81a1aef5b9da96b7f60cdeca6be3375f84fa3bf91f42419313d"


def test_sentences_frozen():
    raw = open(os.path.join(FC_DIR, "sentences.txt"), "rb").read()
    assert hashlib.sha256(raw).hexdigest() == FROZEN_SHA256, (
        "first-contact sentences changed after the freeze commit — "
        "the freeze-then-score protocol forbids editing them")


def test_gold_files_load_and_match_frozen_texts():
    from pikes_ray.pipelines.evalpm import load_gold

    sentences = [l.strip() for l in
                 open(os.path.join(FC_DIR, "sentences.txt"))
                 if l.strip()]
    assert len(sentences) == 8
    for n in range(1, 9):
        text, g = load_gold(os.path.join(
            FC_DIR, "gold", f"firstcontact.{n}.ttl"))
        assert text == sentences[n - 1]
        assert g.nodes, f"firstcontact.{n} has no eval:Node entities"
        # every node must denote a sentence term (term-mapping sanity)
        assert set(g.denoted) == g.nodes


def test_firstcontact_regression_floor():
    """The freeze-then-score window closed with the single round-5
    scoring run (F1 .760, recorded in BASELINE.md).  From then on this
    corpus is an ordinary regression gate — the floor guards future
    rounds against silently degrading the open-vocabulary machinery
    the first-contact number certified."""
    from pikes_ray.pipelines.evalpm import evaluate_ours_firstcontact

    r = evaluate_ours_firstcontact(profile="full")
    f1 = float(r[r["component"] == "triples"]["f1"].iloc[0])
    assert f1 >= 0.70
