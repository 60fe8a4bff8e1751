"""Conformance harness tests: turtle parser, term segmentation, the
scorer validated against the reference's own published numbers, and
the honest score of OUR pipeline (tests/test_golden.py is the
regression gate; THIS is the fidelity-to-Pikes gate — VERDICT r1 #1)."""

import pytest

from pikes_ray.functions.turtle import literal_value, parse_turtle
from pikes_ray.pipelines.evalpm import (
    Sentence,
    evaluate_ours,
    evaluate_reference,
    gold_graphs,
)


def test_turtle_parser_basics():
    ttl = '''
@prefix ex: <http://example.org/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
ex:a rdfs:label "hello \\"x\\"" ; a ex:T , ex:U .
ex:b ex:p "5"^^<http://www.w3.org/2001/XMLSchema#int> .
ex:c ex:q ex:stamp.01.
'''
    got = set(parse_turtle(ttl))
    assert ("http://example.org/a",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://example.org/T") in got
    assert ("http://example.org/c", "http://example.org/q",
            "http://example.org/stamp.01") in got
    lab = next(o for s, p, o in got if p.endswith("label"))
    assert literal_value(lab) == 'hello "x"'


def test_sentence_terms():
    s = Sentence("the group, the group posing a like-minded challenge")
    assert "group_1" in s.terms and "group_2" in s.terms
    assert "like-minded" in s.terms
    assert s.term_by_localname("group_1") == "group_1"
    # getTerm truncation: support_1 → support when unambiguous
    s2 = Sentence("they want to support the rebels")
    assert s2.term_by_localname("support_1") == "support"
    assert s2.terms_by_span(0, 9) == ["they", "want"]


def test_gold_graphs_load():
    texts, golds = gold_graphs()
    assert len(golds) == 8
    assert sum(len(g.nodes) for g in golds) == 153      # published gold count
    assert all(n in g.denoted for g in golds for n in g.nodes)


def test_scorer_matches_published_reference_numbers():
    """Score docs/eval-pm/pikes/*.ttl with OUR scorer and compare to the
    published November-2015 table (docs/eval-pm.html).  Seven categories
    reproduce exactly; the rest are within a few counts — the shipped
    HTML alignment views star ignore-markers that do not exist in the
    shipped gold files, i.e. the published run used a slightly different
    gold revision (see evalpm.py module docstring)."""
    df = evaluate_reference().set_index("component")

    exact = {
        "instances": (147, 13, 6),
        "roles (VN)": (47, 15, 47),
        "roles (FN)": (47, 32, 61),
        "owl:sameAs": (6, 1, 9),
        "types (PB)": (37, 7, 16),
        "types (VN)": (24, 10, 20),
        "linking": (14, 6, 4),
    }
    for cat, (tp, fp, fn) in exact.items():
        row = df.loc[cat]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn), cat

    # drift-tolerant bounds for the rest (published: edges 134/21,
    # roles PB 67/15, roles NB 31/18, types NB 24/7, types FN 38/25)
    approx = {"edges": (134, 3, 10), "roles (PB)": (67, 3, 8),
              "roles (NB)": (31, 3, 3), "types (NB)": (24, 3, 3),
              "types (FN)": (38, 3, 13)}
    for cat, (tp, tp_tol, fp_tol) in approx.items():
        row = df.loc[cat]
        assert abs(row["tp"] - tp) <= tp_tol, (cat, row["tp"])


def test_our_pipeline_honest_score():
    """The engine's own conformance numbers on the gold sentences.
    Floors ratchet UP as semantics land (VERDICT r1 items 2-4) —
    raise them when a round improves a category."""
    df = evaluate_ours().set_index("component")
    inst = df.loc["instances"]
    assert inst["precision"] >= 0.94 and inst["recall"] >= 0.97
    # every category beats the reference's own published numbers after
    # the r2 role-machinery rounds (control/ccomp/copular/nominal-PP)
    assert df.loc["types (PB)", "f1"] >= 0.98
    assert df.loc["types (NB)", "f1"] >= 0.96
    assert df.loc["types (VN)", "f1"] >= 0.96
    assert df.loc["types (FN)", "f1"] >= 0.96
    assert df.loc["linking", "f1"] >= 0.95
    assert df.loc["roles (PB)", "f1"] >= 0.97
    assert df.loc["roles (VN)", "f1"] >= 0.97
    assert df.loc["roles (FN)", "f1"] >= 0.95
    assert df.loc["roles (NB)", "f1"] >= 0.95
    # round 3 switched the scorer to the reference-exact DIRECTIONAL
    # owl:sameAs comparison (Evaluation.java has no symmetric
    # normalization — proven by the FRED comparative reproduction,
    # test_scorer_matches_published_fred_comparative).  Four of our
    # coref sameAs pairs now mismatch gold on direction alone; gold's
    # own direction convention is editorially inconsistent (gold.6
    # ":veteran owl:sameAs :who" is textual antecedent→anaphor order,
    # gold.7/8 ":it owl:sameAs :group" / ":group owl:sameAs :front"
    # are the reverse), so we do NOT overfit the engine's emission
    # order to it; under the round-2 symmetric convention this
    # category still scores 1.0 (test below).
    assert df.loc["owl:sameAs", "f1"] >= 0.72
    assert df.loc["edges", "f1"] >= 0.97
    # the headline: far above the reference's own published .628 and
    # above the north-rule conformance bar (P/R >= 0.95)
    assert df.loc["triples", "precision"] >= 0.95
    assert df.loc["triples", "recall"] >= 0.95
    assert df.loc["triples", "f1"] >= 0.985
    # every category must at least be reported
    assert {"edges", "roles (PB)", "types (PB)", "linking",
            "triples"} <= set(df.index)


def test_scorer_matches_published_sac_numbers():
    """HELD-OUT scorer validation (VERDICT r2 item 2): score the
    frozen SAC-2016 output (docs/eval-pm/pikes-sac/*.ttl — a different
    annotator configuration round 2 never consumed, linked via
    x:denotes/x:implies in x:schema namespaces) and compare to the
    published SAC table (docs/eval-pm.html #separate-sac).  Six
    categories reproduce exactly; the rest sit within the same small
    gold-revision drift as the November column."""
    df = evaluate_reference("pikes-sac").set_index("component")

    exact = {
        "instances": (148, 9, 5),
        "linking": (14, 6, 4),
        "types (VN)": (24, 10, 20),
        "types (PB)": (38, 7, 15),
        "roles (VN)": (46, 16, 48),
        "roles (FN)": (28, 28, 80),
    }
    for cat, (tp, fp, fn) in exact.items():
        row = df.loc[cat]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn), cat

    # drift-tolerant (published: types NB 29/13, roles PB 68/14,
    # roles NB 32/19, sameAs 5/2, edges 131/16, triples 303/122)
    approx = {"types (NB)": (29, 2), "roles (PB)": (68, 2),
              "roles (NB)": (32, 2), "owl:sameAs": (5, 2),
              "edges": (131, 3), "triples": (303, 6)}
    for cat, (tp, tol) in approx.items():
        assert abs(df.loc[cat, "tp"] - tp) <= tol, (cat, df.loc[cat, "tp"])


def test_scorer_matches_published_fred_comparative():
    """STRONGEST scorer validation (round 3): score FRED's frozen
    output (docs/eval-pm/fred/*.ttl + fred.patch.trig — a THIRD-PARTY
    system whose graphs share nothing with this repo or with Pikes'
    own output format) against the simplified comparative gold and
    compare to the published FRED column (docs/eval-pm.html
    #comparative-latest / comparative/*.html).  ALL EIGHT published
    categories reproduce with integer-exact tp/fp/fn — this pins down
    the whole chain: the FRED converter (mention queries, node
    filters over the union model, URI rewriting incl. VerbNet class
    codes, coreference splitting via the patch metadata, the
    denotes→sameAs expansion, the RDFS/OWL type closure), the
    nominal-frame replacement applied to gold, the simplified
    namespace restriction, the aligner, and the directional
    owl:sameAs comparison."""
    from pikes_ray.pipelines.evalpm import evaluate_comparative

    df = evaluate_comparative("fred").set_index("component")
    exact = {
        "instances": (119, 9, 18),
        "edges": (86, 13, 69),
        "roles (VN)": (29, 24, 47),
        "owl:sameAs": (5, 9, 10),
        "types (VN)": (16, 11, 15),
        "types (FN)": (11, 9, 15),
        "linking": (8, 5, 10),
        "triples": (69, 58, 97),
    }
    for cat, (tp, fp, fn) in exact.items():
        row = df.loc[cat]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn), \
            (cat, row["tp"], row["fp"], row["fn"])


def test_scorer_matches_published_pikes_comparative():
    """The PIKES column of the same published comparative table
    (nominal-frame replacement applied to the reference's own frozen
    output).  Six of eight categories integer-exact; edges and
    types (FN) carry the same ±1-element drift as the separate
    tables (our pikes loader takes single-term mentions, round-2
    simplification)."""
    from pikes_ray.pipelines.evalpm import evaluate_comparative

    df = evaluate_comparative("pikes").set_index("component")
    exact = {
        "instances": (133, 13, 4),
        "roles (VN)": (40, 14, 36),
        "owl:sameAs": (6, 1, 9),
        "types (VN)": (18, 9, 13),
        "linking": (14, 6, 4),
    }
    for cat, (tp, fp, fn) in exact.items():
        row = df.loc[cat]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn), cat
    # published: edges 122/12/33, types FN 19/12/7, triples 97/42/69
    assert abs(df.loc["edges", "tp"] - 122) <= 2
    assert abs(df.loc["edges", "fp"] - 12) <= 6
    assert abs(df.loc["types (FN)", "fp"] - 12) <= 2
    assert abs(df.loc["triples", "tp"] - 97) <= 2


def test_scorer_matches_published_sac_comparative():
    """The SAC-2016 PIKES column of the published comparative table
    (docs/eval-pm.html #comparative-sac) — seven of eight categories
    integer-exact (edges carries a +6 fp drift from the same loader
    simplification as the latest column)."""
    from pikes_ray.pipelines.evalpm import evaluate_comparative

    df = evaluate_comparative("pikes-sac").set_index("component")
    exact = {
        "instances": (134, 9, 3),
        "roles (VN)": (39, 15, 37),
        "owl:sameAs": (5, 2, 10),
        "types (VN)": (18, 9, 13),
        "types (FN)": (16, 5, 10),
        "linking": (14, 6, 4),
    }
    for cat, (tp, fp, fn) in exact.items():
        row = df.loc[cat]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn), cat
    assert (df.loc["edges", "tp"], df.loc["edges", "fn"]) == (119, 36)
    assert abs(df.loc["edges", "fp"] - 8) <= 6
    # triples ratios match published .713/.554 exactly
    assert df.loc["triples", "precision"] == pytest.approx(0.713, abs=0.001)
    assert df.loc["triples", "recall"] == pytest.approx(0.554, abs=0.001)


def test_sameas_direction_is_the_only_sameas_gap():
    """Under the round-2 symmetric-sameAs convention our pinned
    engine still scores sameAs 1.0 — the reference-exact directional
    scorer's 4 fp/fn pairs are pure direction mismatches against
    gold's editorially inconsistent ordering, not missing/extra
    coreference links."""
    import pikes_ray.pipelines.evalpm as E

    old = E.SAMEAS_SYMMETRIC
    E.SAMEAS_SYMMETRIC = True
    try:
        df = evaluate_ours("pinned").set_index("component")
    finally:
        E.SAMEAS_SYMMETRIC = old
    assert df.loc["owl:sameAs", "f1"] >= 0.99
    assert df.loc["triples", "f1"] >= 0.995


def test_scorer_matches_published_comparative_union():
    """The 'union of correct answers' block — the second results
    section of every published comparative report (each tool scored
    within the space of answers some tool got right).  13 of 14
    published rows reproduce integer-exact; FRED's union-edges FN
    carries the single-element pikes edge drift (the union includes
    whatever pikes matched)."""
    from pikes_ray.pipelines.evalpm import evaluate_comparative_union

    df = evaluate_comparative_union().set_index(["system", "component"])
    union_exact = {
        ("fred", "instances"): (119, 9, 16),
        ("fred", "roles (VN)"): (29, 24, 22),
        ("fred", "owl:sameAs"): (5, 9, 2),
        ("fred", "types (VN)"): (16, 11, 11),
        ("fred", "types (FN)"): (11, 9, 8),
        ("fred", "linking"): (8, 5, 6),
        ("pikes", "instances"): (133, 13, 2),
        ("pikes", "roles (VN)"): (40, 14, 11),
        ("pikes", "owl:sameAs"): (6, 1, 1),
        ("pikes", "types (VN)"): (18, 9, 9),
        ("pikes", "linking"): (14, 6, 0),
    }
    for key, (tp, fp, fn) in union_exact.items():
        row = df.loc[key]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn), key
    # published fred union edges 86/13/50 and pikes union edges
    # 122/12/14 — the single-element pikes edge drift (tp 123 vs 122,
    # same as the gold-standard comparative) shifts both by ≤1
    assert (df.loc[("fred", "edges"), "tp"],
            df.loc[("fred", "edges"), "fp"]) == (86, 13)
    assert abs(df.loc[("fred", "edges"), "fn"] - 50) <= 1
    assert abs(df.loc[("pikes", "edges"), "tp"] - 122) <= 1
    assert abs(df.loc[("pikes", "edges"), "fn"] - 14) <= 1
    # pikes types (FN) 19/12/0 — the +1 fp is the same drift the
    # gold-standard comparative carries
    assert (df.loc[("pikes", "types (FN)"), "tp"],
            df.loc[("pikes", "types (FN)"), "fn"]) == (19, 0)
    assert abs(df.loc[("pikes", "types (FN)"), "fp"] - 12) <= 1
