"""Lexicon profiles + programmatic growth (VERDICT r2 top item):
quarantinable gold vocabulary, public-list growth, open-vocab NER."""

import pytest

from pikes_ray.functions import lexicon as lx
from pikes_ray.functions.lexicon_growth import (
    NOMINALIZATION_BLOCKLIST,
    classify_ne_span,
    grown_noun_frames,
    grown_verb_frames,
)


def test_profiles_rebuild_live_tables():
    assert lx.profile() == "full"
    full_v = len(lx.VERB_FRAMES)
    with lx.lexicon_profile("pinned"):
        assert lx.profile() == "pinned"
        assert "accept" not in lx.VERB_FRAMES        # growth quarantined
        assert lx.VERB_FRAMES["say"] == "say.01"     # eval-pm present
        assert not lx.open_vocab_ner()
    with lx.lexicon_profile("ablated"):
        # round-5 contract (VERDICT r4 item 1b / ADVICE): gold-corpus
        # vocabulary lives ONLY in the quarantined EVAL_PM_* tables, so
        # the ablated profile must not see it via any layer — "pose"
        # and "blacklist" are eval-pm verbs; the only off-lexicon path
        # to them is the open-vocabulary lemma.01 fallback
        assert "pose" not in lx.VERB_FRAMES
        assert "blacklist" not in lx.VERB_FRAMES
        assert "offshoot" not in lx.NOUN_FRAMES
        assert "Bashar al-Assad" not in lx.GAZETTEER  # gold-only link out
        assert "Syrian opposition" not in lx.GAZETTEER
        assert "Nusra Front" not in lx.GAZETTEER
        assert "Syria" not in lx.GAZETTEER or \
            lx.GAZETTEER["Syria"][1] == "Syria"      # grown country ok
        assert "accept" in lx.VERB_FRAMES            # growth present
        assert lx.open_vocab_ner() and lx.open_vocab_frames()
    with lx.lexicon_profile("core"):
        assert "accept" not in lx.VERB_FRAMES
        assert "pose" not in lx.VERB_FRAMES
        assert not lx.open_vocab_ner() and not lx.open_vocab_frames()
    assert lx.profile() == "full" and len(lx.VERB_FRAMES) == full_v
    with pytest.raises(ValueError):
        lx.set_profile("nope")


def test_growth_layer_is_gold_disjoint():
    """No growth table may share a key with a quarantined EVAL_PM_*
    table (the round-4 laundering vector, closed in round 5)."""
    import pikes_ray.functions.lexicon_growth as g

    assert not set(g.COMMON_VERBS) & set(lx.EVAL_PM_VERB_FRAMES)
    assert not set(g.VERB_SENSE_EXCEPTIONS) & set(lx.EVAL_PM_VERB_FRAMES)
    assert not set(g.COMMON_NOUNS) & set(lx.EVAL_PM_NOUN_FRAMES)
    gaz = {k.lower().removeprefix("the ") for k in lx.EVAL_PM_GAZETTEER}
    grown = {k.lower().removeprefix("the ") for k in g.WELL_KNOWN_ORGS}
    # "Al Qaeda" is the one deliberate exception: globally notable on
    # any neutral public list, so the growth layer may know it
    assert grown & gaz <= {"al qaeda", "al-qaeda"}


def test_ablated_strict_is_mechanically_gold_disjoint():
    """The strict profile drops every live entry whose surface (or an
    inflected form) occurs in the eval-pm sentence texts — enforced by
    re-deriving the overlap here, not by a curated list."""
    toks, texts = lx._eval_pm_texts()
    assert toks and len(texts) == 8
    with lx.lexicon_profile("ablated_strict"):
        for table in (lx.VERB_FRAMES, lx.NOUN_FRAMES, lx.GAZETTEER):
            bad = [k for k in table if lx._gold_overlaps(k, toks, texts)]
            assert not bad, f"gold-overlapping entries survived: {bad[:10]}"
        # spot checks: gold verbs/nouns reachable only via fallback
        for w in ("pose", "say", "want", "become", "capture", "flow"):
            assert w not in lx.VERB_FRAMES
        for w in ("offshoot", "government", "fighter", "stamp"):
            assert w not in lx.NOUN_FRAMES
        for s in ("Syria", "Iraq", "Al Qaeda", "the Nusra Front",
                  "Europe", "the United States"):
            assert s not in lx.GAZETTEER
        # non-overlapping public vocabulary survives
        assert "accept" in lx.VERB_FRAMES
        assert "Kenya" in lx.GAZETTEER
        assert lx.open_vocab_frames()


def test_grown_verbs_default_01_and_core_precedence():
    g = grown_verb_frames()
    assert g["accept"] == "accept.01" and g["negotiate"] == "negotiate.01"
    # core non-.01 senses always win over the grown default
    assert lx.VERB_FRAMES["sign"] == "sign.02"
    assert lx.VERB_FRAMES["have"] == "have.03"


def test_grown_noun_derivation():
    frames, self_args = grown_noun_frames()
    assert frames["statement"] == ("statement.01", "state.01")
    assert frames["arrival"] == ("arrival.01", "arrive.01")
    assert frames["decision"] == ("decision.01", "decide.01")  # irregular
    # agentive nominals incorporate their A0
    assert frames["winner"] == ("winner.01", "win.01")
    assert self_args["winner.01"] == ([0], [])
    assert self_args["statement.01"] == ([], [1])
    # junk analyses are blocked
    for w in ("letter", "better", "signal"):
        assert w in NOMINALIZATION_BLOCKLIST and w not in frames
    # core verbs feed generation via the live table
    assert lx.NOUN_FRAMES["leader"] == ("leader.01", "lead.01")


def test_shape_ner_classification():
    assert classify_ne_span(["Zenith", "Corp"]) == "ORGANIZATION"
    assert classify_ne_span(["Kofi", "Annan"]) == "PERSON"
    assert classify_ne_span(["Kenya"]) == "LOCATION"
    assert classify_ne_span(["Zorbex"]) == "ORGANIZATION"


def test_open_vocab_annotation_vs_pinned():
    from pikes_ray.stages.annotate import RuleAnnotator

    text = "Kofi Annan visited Zenith Corp in Kenya."
    with lx.lexicon_profile("pinned"):
        pinned = RuleAnnotator().annotate(text)
    full = RuleAnnotator().annotate(text)

    def named(a):
        return {(e["etype"], e["start"], e["end"], e["link"])
                for e in a["entities"] if e["named"]}

    assert not named(pinned)                       # r2 behavior: dropped
    got = named(full)
    assert ("PERSON", 0, 2, "") in got             # unlinked but typed
    assert ("ORGANIZATION", 3, 5, "") in got
    assert ("LOCATION", 6, 7, "dbr:Kenya") in got  # grown country gazetteer


def test_bare_plural_subject_guard():
    """'Profits rose …' must stay noun+verb even though 'profit' is a
    grown verb lemma (the s-ambiguous sentence-initial guard)."""
    from pikes_ray.stages.annotate import RuleAnnotator

    a = RuleAnnotator().annotate("Profits rose five percent.")
    assert a["tokens"][0]["morphofeat"] == "NNS"
    assert a["tokens"][1]["morphofeat"] == "VBD"
    senses = {p["sense"] for p in a["predicates"]}
    assert "rise.01" in senses
    # irregular forms stay exempt ("He leads it.")
    b = RuleAnnotator().annotate("He leads it.")
    assert b["tokens"][1]["morphofeat"] == "VBZ"


def test_grown_verbs_drive_extraction():
    """An off-core verb produces a full SRL frame + triples end-to-end
    (the open-vocabulary behavior a real corpus needs)."""
    import datetime as dt

    import pyarrow as pa

    from pikes_ray.schema import TRANSCRIPT_SCHEMA
    from pikes_ray.stages.fused import KGStage

    rows = [{"conv_id": "g", "turn_idx": 0, "role": "user",
             "text": "Novatek Industries negotiated the settlement with "
                     "Orbital Dynamics.",
             "tool": "", "ts": dt.datetime(2024, 1, 1)}]
    out = KGStage()(pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA)) \
        .to_pandas()
    objs = set(out["obj"])
    assert "pb:negotiate.01" in objs               # grown verb roleset
    preds = set(out["pred"])
    assert any(p.startswith("pb:negotiate.01-a") for p in preds)
    # both unknown orgs got typed instances
    assert (out["obj"] == "ks:Entity").any() or "foaf:name" in preds


def test_eval_pm_ablation_ordering():
    """pinned ≥ full ≥ ablated ≥ core on gold triples F1, with the
    pinned number at its reference-exact-scorer level (.988 — the
    round-2 .997 reproduces under symmetric sameAs, see
    test_evalpm.test_sameas_direction_is_the_only_sameas_gap) and
    growth buying a real lift over
    the bare core off-lexicon."""
    from pikes_ray.pipelines.evalpm import evaluate_ours

    def f1(profile):
        r = evaluate_ours(profile=profile)
        return float(r[r["component"] == "triples"]["f1"].iloc[0])

    pinned, full, ablated, core = (f1(p) for p in
                                   ("pinned", "full", "ablated", "core"))
    assert pinned >= 0.985
    assert full >= 0.95
    # round-5 honesty note: the round-4 "ablated ≥ .9" bar was an
    # artifact of gold vocabulary relabelled into the growth layer
    # (VERDICT r4 item 1); with the quarantine restored, ablated
    # measures what the growth lists + open-vocab fallback genuinely
    # do off-lexicon, and the mechanically-filtered ablated_strict
    # profile (own test below) is the headline generalization number.
    assert pinned >= full > ablated > core


def test_ablated_strict_f1_bar():
    """VERDICT r4 item 2 done-criterion: the mechanically gold-disjoint
    profile must reach ≥ .40 triples F1 through open-vocabulary
    machinery alone (lemma.01 default frames, dep-label roles,
    reverse-morphology nominals, context verb tagging).  Round-5
    result: .669 (was .039 before the fallback landed); asserted at
    .60 to leave a robustness margin."""
    from pikes_ray.pipelines.evalpm import evaluate_ours

    r = evaluate_ours(profile="ablated_strict")
    f1 = float(r[r["component"] == "triples"]["f1"].iloc[0])
    assert f1 >= 0.60
    # sanity on the decomposition: the lift is real machinery, not a
    # quarantine leak — linking must stay at zero (no gazetteer row
    # with gold vocabulary may survive the mechanical filter)
    linking = r[r["component"] == "linking"]
    assert int(linking["tp"].iloc[0]) == 0


def test_heldout_regression_gate():
    """Round-4 held-out corpus, rescoped per VERDICT r4 item 2 of
    "what's wrong": the sentences were iterated against during round-4
    development, so the number is a REGRESSION GATE on the full
    profile, not a generalization proof (that role passed to the
    frozen round-5 first-contact corpus and the ablated_strict
    profile).  The old `full == ablated` coincidence assertion was
    dropped: it was an artifact of eval-pm vocabulary (plan, push, …)
    living in the ablation-exempt growth layer; with the round-5
    quarantine restored the two profiles legitimately differ here."""
    from pikes_ray.pipelines.evalpm import evaluate_ours_heldout

    r = evaluate_ours_heldout(profile="full")
    full = float(r[r["component"] == "triples"]["f1"].iloc[0])
    assert full >= 0.9


def _annotate(text, profile="full"):
    from pikes_ray.stages.annotate import RuleAnnotator
    from pikes_ray.stages.filter import FilterConfig, filter_document

    with lx.lexicon_profile(profile):
        return filter_document(RuleAnnotator().annotate(text), FilterConfig())


def test_f10_nominal_vs_verb_homograph():
    """With the grown verb lexicon, nouns like "sanctions" have verb
    homographs; F10 must validate the NOMINAL pred against the
    NomBank→PB mapping (impose.01), not the verb roleset (sanction.01)
    — otherwise the pred is dropped and re-added bare, losing its PP
    argument (round-4 regression guard)."""
    doc = _annotate("The decision prompted sanctions from Europe.")
    toks = doc["tokens"]
    sanction = [p for p in doc["predicates"]
                if toks[p["head"]]["lemma"] == "sanction"]
    assert sanction and sanction[0]["sense"] == "impose.01"
    fillers = {(r["sem_role"], toks[r["head"]]["form"])
               for r in sanction[0]["roles"]}
    assert ("A0", "Europe") in fillers


def test_clause_coordination_not_np_coordination():
    """", and <NP> <finite verb>" opens a new clause: the right
    conjunct must NOT receive the left clause's roles ("…by Samsung,
    and many workers were hired")."""
    doc = _annotate(
        "A new factory was opened in Vietnam by Samsung, and many workers were hired.")
    toks = doc["tokens"]
    by_lemma = {}
    for p in doc["predicates"]:
        by_lemma[toks[p["head"]]["lemma"]] = {
            (r["sem_role"], toks[r["head"]]["form"]) for r in p["roles"]}
    assert ("A0", "Samsung") in by_lemma["open"]
    assert not any(f == "Samsung" for (_r, f) in by_lemma["hire"])
    assert ("A1", "workers") in by_lemma["hire"]
    assert not any(f == "workers" for (_r, f) in by_lemma["open"])


def test_bare_temporal_np_adjunct():
    """An ungoverned NP headed by a time noun is an AM-TMP of the
    nearest preceding verb ("expanded the project last year")."""
    doc = _annotate("Investors expanded the project last year.")
    toks = doc["tokens"]
    expand = [p for p in doc["predicates"]
              if toks[p["head"]]["lemma"] == "expand"]
    assert expand
    roles = {(r["sem_role"], toks[r["head"]]["form"])
             for r in expand[0]["roles"]}
    assert ("AM-TMP", "year") in roles
    assert ("A1", "project") in roles


def test_inflection_generator_covers_tagger_forms():
    """Quarantine-soundness guard (review r5 finding #9): every surface
    the tagger's verb-form generator can map to a lemma must be in the
    strict quarantine's inflection set for that lemma — otherwise a
    future edit to one copy of the morphology could let the annotator
    reach a gold-text surface the mechanical filter never considered."""
    from pikes_ray.stages.annotate import _build_verb_forms

    with lx.lexicon_profile("full"):
        forms = _build_verb_forms()
    bad = [(f, lem) for f, (lem, _tag) in forms.items()
           if f not in lx._inflections(lem)]
    assert not bad, f"tagger forms unknown to the quarantine: {bad[:10]}"
