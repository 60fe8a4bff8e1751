"""eval-framebase conformance gate — scores the F15 FrameBase layer
against the reference's second published gold set
(docs/eval-framebase/gold) and validates the scorer on the reference's
own pikes-both output."""

import pytest


@pytest.fixture(scope="module")
def ours():
    from pikes_ray.pipelines.evalfb import evaluate_ours_fb

    df = evaluate_ours_fb()
    return {r["component"]: r for _, r in df.iterrows()}


def test_evalfb_gold_parses():
    from pikes_ray.pipelines.evalfb import gold_fb_graphs

    texts, golds, cls = gold_fb_graphs()
    assert len(texts) == 8
    assert sum(len(g.triples) for g in golds) >= 160
    # sentence 1 carries both a microframe type and a self-loop-free FE
    g1 = golds[0]
    assert any(o == "fb:frame-Becoming-get.v" for _, p, o in g1.triples
               if p == "rdf:type")


def test_evalfb_ours_floors(ours):
    # ratcheted floors (current: types 1.000, roles .987, triples .991;
    # remaining misses are gold-edge cases: an inferred implicit
    # Recipient in gold.5 and an Increment-Class FE gold.1 carries but
    # gold.3 does not)
    assert ours["types (FB)"]["f1"] >= 0.99, ours["types (FB)"]
    assert ours["roles (FB)"]["f1"] >= 0.97, ours["roles (FB)"]
    assert ours["triples"]["f1"] >= 0.98, ours["triples"]


def test_evalfb_reference_sanity():
    """The same scorer on the reference's own output lands near its
    published eval-framebase numbers (F1 well below ours — the scorer
    is not trivially generous)."""
    from pikes_ray.pipelines.evalfb import evaluate_reference_fb

    df = evaluate_reference_fb("both")
    trip = df[df.component == "triples"].iloc[0]
    assert 0.40 <= trip["f1"] <= 0.75, trip


def test_framebase_lu_clustering():
    from pikes_ray.functions.predicatematrix import microframe

    assert microframe("Becoming", "become", "v") == "fb:frame-Becoming-get.v"
    assert microframe("Giving", "donate", "v") == "fb:frame-Giving-gift.v"
    # singleton clusters keep their own LU
    assert microframe("Organization", "group", "n") == \
        "fb:frame-Organization-group.n"


def test_evalfb_heldout_configs_near_published():
    """Held-out scorer validation (VERDICT r2 item 2): score the
    Semafor-only and Mate-only frozen outputs — configurations this
    repo never consumed before round 3 — and land within a few points
    of the published eval-framebase.md table (Semafor all-triples
    .605/.466, Mate .704/.236, Both .599/.528)."""
    from pikes_ray.pipelines.evalfb import evaluate_reference_fb

    published = {
        "semafor": {"types (FB)": (0.617, 0.698), "roles (FB)": (0.594, 0.352),
                    "triples": (0.605, 0.466)},
        "mate": {"types (FB)": (0.792, 0.358), "roles (FB)": (0.633, 0.176),
                 "triples": (0.704, 0.236)},
    }
    for system, rows in published.items():
        df = evaluate_reference_fb(system).set_index("component")
        for cat, (p, r) in rows.items():
            got_p, got_r = df.loc[cat, "precision"], df.loc[cat, "recall"]
            assert abs(got_p - p) <= 0.09, (system, cat, got_p, p)
            assert abs(got_r - r) <= 0.05, (system, cat, got_r, r)
