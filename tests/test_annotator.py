"""Annotator + filter unit tests over the sentence bank (SURVEY §5)."""

import datetime as dt

import pyarrow as pa
import pytest

from pikes_ray.schema import TRANSCRIPT_SCHEMA
from pikes_ray.stages.annotate import AnnotatorStage, RuleAnnotator
from pikes_ray.stages.filter import FilterConfig, filter_document
from pikes_ray.stages.normalize import normalize_batch


@pytest.fixture(scope="module", autouse=True)
def _pinned_lexicon():
    """These tests pin the filter/extractor SEMANTICS against the
    round-2 reference behavior — run them on the pinned lexicon so the
    programmatic growth (functions/lexicon_growth, profile "full")
    can't shift the sentence bank's vocabulary under them.  Growth and
    the open-vocab fallbacks have their own tests
    (test_lexicon_growth.py)."""
    from pikes_ray.functions.lexicon import lexicon_profile

    with lexicon_profile("pinned"):
        yield


@pytest.fixture(scope="module")
def model(_pinned_lexicon):
    return RuleAnnotator()


def ents(ann):
    return [(e["etype"], e["start"], e["end"]) for e in ann["entities"]]


def test_ner_and_linking(model):
    a = model.annotate("Alice Johnson met Bob Smith in Paris on March 3, 2024.")
    assert ("PERSON", 0, 2) in ents(a)
    assert ("LOCATION", 6, 7) in ents(a)
    date = next(e for e in a["entities"] if e["etype"] == "DATE")
    assert date["norm"] == "2024-03-03"
    per = next(e for e in a["entities"] if e["etype"] == "PERSON")
    assert per["link"] == "dbr:Alice_Johnson" and per["link_conf"] > 0


def test_verbal_srl(model):
    a = model.annotate("Acme Corp acquired Beta LLC for five million dollars.")
    p = a["predicates"][0]
    assert p["sense"] == "acquire.01" and p["source"] == "verbal"
    roles = {r["sem_role"] for r in p["roles"]}
    assert {"A0", "A1"} <= roles
    money = next(e for e in a["entities"] if e["etype"] == "MONEY")
    assert money["norm"] == "USD:5000000"


def test_nominal_srl_nb_to_pb(model):
    a = model.annotate("The acquisition of Beta LLC surprised analysts.")
    nom = next(p for p in a["predicates"] if p["source"] == "nominal")
    assert nom["sense"] == "acquire.01"  # NB→PB id mapping (M5)
    assert any(r["sem_role"] == "A1" for r in nom["roles"])


def test_copular_flag(model):
    a = model.annotate("Carol White is the president of Acme Corp.")
    assert any(p["copular"] for p in a["predicates"])


def test_coref(model):
    a = model.annotate("Alice Johnson founded Acme Corp. He leads it.")
    assert len(a["corefs"]) == 2


def test_duration_and_percent(model):
    a = model.annotate("Profits rose five percent in the third quarter. The team worked for three weeks.")
    types = {e["etype"]: e["norm"] for e in a["entities"]}
    assert types.get("PERCENT") == "5"
    assert types.get("DURATION") == "P3W"
    assert types.get("ORDINAL") == "3"


def test_iso_partial_date(model):
    a = model.annotate("The deal closed in 2002-03.")
    d = next(e for e in a["entities"] if e["etype"] == "DATE")
    assert d["norm"] == "2002-03"


def test_filter_entity_addition_and_overlap(model):
    ann = model.annotate("Very strong supporters backed Acme Corp.")
    out = filter_document(ann, FilterConfig())
    # F7: "supporters" gets an unnamed entity
    unnamed = [e for e in out["entities"] if not e["named"] and e["etype"] == ""]
    assert unnamed, "entityAddition should cover bare nouns"


def test_filter_predicate_merge(model):
    ann = model.annotate("Acme Corp acquired Beta LLC.")
    # duplicate the predicate as a nominal on the same head → must merge (F9)
    dup = dict(ann["predicates"][0], source="nominal", roles=[])
    ann["predicates"].append(dup)
    out = filter_document(ann, FilterConfig())
    heads = [p["head"] for p in out["predicates"]]
    assert len(heads) == len(set(heads))


def test_normalize_unescape_and_quarantine():
    rows = [
        {"conv_id": "c", "turn_idx": 0, "role": "user",
         "text": "Fish &amp; Chips", "tool": "", "ts": dt.datetime(2024, 1, 1)},
        {"conv_id": "c", "turn_idx": 1, "role": "user",
         "text": "x" * 50, "tool": "", "ts": dt.datetime(2024, 1, 1)},
    ]
    batch = pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA)
    out = normalize_batch(batch, max_text_len=40)
    assert out["text"][0].as_py() == "Fish & Chips"
    assert out["quarantined"].to_pylist() == [False, True]


def test_annotator_stage_handles_adversarial_rows():
    rows = [
        {"conv_id": "c", "turn_idx": i, "role": "user", "text": t, "tool": "",
         "ts": dt.datetime(2024, 1, 1)}
        for i, t in enumerate(["", "   ", "\U0001f600", "José García met René Müller."])
    ]
    batch = pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA)
    out = AnnotatorStage()(batch)
    toks = out["tokens"].to_pylist()
    assert toks[0] == [] and toks[1] == []
    assert len(toks[3]) > 0


def test_annotation_determinism(model):
    text = "Acme Corp acquired Beta LLC for five million dollars."
    assert model.annotate(text) == RuleAnnotator().annotate(text)


def test_passive_voice(model):
    a = model.annotate("Beta LLC was acquired by Acme Corp.")
    p = next(p for p in a["predicates"] if p["sense"] == "acquire.01")
    roles = {r["sem_role"]: (r["start"], r["end"]) for r in p["roles"]}
    assert roles["A1"] == (0, 2)       # surface subject → A1
    assert roles["A0"] == (5, 7)       # by-phrase → A0
    assert not any(q["sense"] == "be.01" for q in a["predicates"])


def test_noun_context_beats_verb_lexicon(model):
    a = model.annotate("Acme Corp delivered the report on March 3, 2024.")
    toks = a["tokens"]
    assert toks[4]["morphofeat"] in ("NN", "NNS")   # "report" after "the"
    nom = [p for p in a["predicates"] if p["source"] == "nominal"]
    assert any(p["sense"] == "report.01" for p in nom)


def test_f5_linking_completion_flag(model):
    """F5 promotes a linked entity's (link, conf) onto same-head
    entities and predicates; the flag must actually change output
    (VERDICT r1: dead-flag finding)."""
    a = model.annotate("Alice Johnson invested in Acme Corp.")
    # craft: an unlinked entity and a predicate sharing the head of a
    # linked entity
    linked = next(e for e in a["entities"] if e["link"])
    head = linked["end"] - 1
    a["entities"].append({"etype": "", "start": linked["start"],
                          "end": linked["end"], "named": False,
                          "link": "", "link_conf": 0.0, "norm": ""})
    a["predicates"].append({"head": head, "sense": "invest.01",
                            "source": "verbal", "copular": False,
                            "link": "", "link_conf": 0.0, "roles": []})

    import copy

    on = filter_document(copy.deepcopy(a), FilterConfig(linking_completion=True))
    off = filter_document(copy.deepcopy(a), FilterConfig(linking_completion=False))

    on_pred = next(p for p in on["predicates"] if p["head"] == head)
    off_pred = next(p for p in off["predicates"] if p["head"] == head)
    assert on_pred["link"] == linked["link"] and on_pred["link_conf"] > 0
    assert off_pred["link"] == ""
    # same-head unlinked entity inherits the link too
    assert all(e["link"] == linked["link"]
               for e in on["entities"] if e["end"] - 1 == head)


def test_f13_self_arg_fixing_flag(model):
    """F13 adds missing mandatory NomBank self-args and drops invalid
    self-roles; the flag must change output."""
    a = model.annotate("The investment surprised analysts.")
    nom = next(p for p in a["predicates"] if p["source"] == "nominal")
    head = nom["head"]
    # craft an invalid self-role (A4 is neither mandatory nor optional
    # for investment.01)
    nom["roles"].append({"sem_role": "A4", "start": head, "end": head + 1,
                         "head": head})

    import copy

    on = filter_document(copy.deepcopy(a), FilterConfig(srl_self_arg_fixing=True))
    off = filter_document(copy.deepcopy(a), FilterConfig(srl_self_arg_fixing=False))

    on_nom = next(p for p in on["predicates"] if p["head"] == head)
    off_nom = next(p for p in off["predicates"] if p["head"] == head)
    on_self = [r for r in on_nom["roles"] if r["head"] == head]
    # invalid A4 dropped, mandatory A1 self-arg added
    assert {r["sem_role"] for r in on_self} == {"A1"}
    assert any(r["sem_role"] == "A4" for r in off_nom["roles"])
    assert not any(r["sem_role"] == "A1" and r["head"] == head
                   for r in off_nom["roles"])


def test_f2_term_sense_completion_types(model):
    """F2 WordNet/SUMO/YAGO typing: noun instances and named entities
    get sumo:/dbyago: rdf:type facts + mention synsets; flag-off
    removes them (VERDICT r1 item 2)."""
    import datetime as dt

    import pyarrow as pa

    from pikes_ray.schema import TRANSCRIPT_SCHEMA
    from pikes_ray.stages.fused import KGStage

    b = pa.Table.from_pylist([{
        "conv_id": "c", "turn_idx": 0, "role": "user",
        "text": "Alice Johnson met the president of Acme Corp.",
        "tool": "", "ts": dt.datetime(2024, 1, 1)}], schema=TRANSCRIPT_SCHEMA)
    on = KGStage(static_canon=False)(b).to_pandas()
    sumo = set(on[on.obj.str.startswith("sumo:")].obj)
    # closure: Human ⊂ CognitiveAgent ⊂ Agent ⊂ Object ⊂ Physical ⊂ Entity
    assert {"sumo:Human", "sumo:CognitiveAgent", "sumo:Agent",
            "sumo:Entity"} <= sumo
    assert (on.obj.str.startswith("dbyago:")).any()
    assert (on.pred == "ks:synset").any() and (on.pred == "ks:sst").any()

    off = KGStage(cfg=FilterConfig(term_sense_completion=False),
                  static_canon=False)(b).to_pandas()
    assert not (off.obj.str.startswith("sumo:")).any()
    assert not (off.pred == "ks:synset").any()


def test_sumo_closure_deterministic():
    from pikes_ray.functions.wordnet import sumo_closure

    c = sumo_closure("Group")
    assert c[0] == "Group" and "Entity" in c and len(c) == len(set(c))
    assert sumo_closure("Group") == c


def _run_kg(text):
    import datetime as dt

    import pyarrow as pa

    from pikes_ray.schema import TRANSCRIPT_SCHEMA
    from pikes_ray.stages.fused import KGStage

    b = pa.Table.from_pylist([{
        "conv_id": "c", "turn_idx": 0, "role": "user", "text": text,
        "tool": "", "ts": dt.datetime(2024, 1, 1)}], schema=TRANSCRIPT_SCHEMA)
    return KGStage(static_canon=False)(b).to_pandas()


def test_t4_factuality_values():
    df = _run_kg("Acme Corp acquired Beta LLC. Acme Corp did not acquire "
                 "Gamma Industries. Acme Corp may acquire Delta Systems.")
    f = df[df.pred == "ks:factuality"]
    vals = set(f.obj)
    assert '"CT+"' in vals      # plain assertion
    assert '"CT-"' in vals      # negated
    assert '"PS+"' in vals      # modal


def test_t8_opinions():
    df = _run_kg("Acme Corp announced strong growth. Beta LLC reported a "
                 "terrible loss.")
    ops = df[df.pred == "rdf:type"]
    assert (ops.obj == "ks:Opinion").any()
    assert (ops.obj == "ks:PositiveOpinion").any()
    assert (ops.obj == "ks:NegativeOpinion").any()
    assert (df.pred == "ks:target").any() or (df.pred == "ks:expression").any()


def test_t8_opinion_holder():
    """T8 holder link: the A0 of the nearest governing predicate of the
    opinion expression (syntactic analogue of the reference's NAF
    opinion-layer holder, RDFGenerator.java:1431-1439)."""
    df = _run_kg("Bob Smith reported a terrible loss.")
    holders = df[df.pred == "ks:holder"]
    assert list(holders.obj) == ["entity:bob_smith"]
    # the holder is never the expression or target instance itself
    df2 = _run_kg("Alice Johnson likes the excellent report.")
    h2 = df2[df2.pred == "ks:holder"]
    exprs = set(df2[df2.pred == "ks:expression"].obj)
    assert not (set(h2.obj) & exprs)


def test_f15_framebase_types_and_roles():
    df = _run_kg("Acme Corp acquired Beta LLC.")
    fb = df[df.obj.astype(str).str.startswith("fb:frame-") |
            df.pred.astype(str).str.startswith("fb:fe-")]
    assert (df.obj.astype(str).str.startswith("fb:frame-Getting-acquire.v")).any()
    assert (df.pred.astype(str).str.startswith("fb:fe-getting-")).any()


def test_f11_remove_unknown_predicates_flag(model):
    import copy

    a = model.annotate("Acme Corp acquired Beta LLC.")
    # craft a predicate with an unknown roleset
    a["predicates"].append({"head": 0, "sense": "frobnicate.99",
                            "source": "verbal", "copular": False,
                            "link": "", "link_conf": 0.0, "roles": []})
    on = filter_document(copy.deepcopy(a),
                         FilterConfig(srl_remove_unknown_predicates=True,
                                      srl_remove_wrong_refs=False))
    off = filter_document(copy.deepcopy(a),
                          FilterConfig(srl_remove_unknown_predicates=False,
                                       srl_remove_wrong_refs=False))
    assert not any(p["sense"] == "frobnicate.99" for p in on["predicates"])
    assert any(p["sense"] == "frobnicate.99" for p in off["predicates"])


def test_f19_coref_span_fixing_flag(model):
    import copy

    a = model.annotate("Alice Johnson founded Acme Corp. He leads it.")
    n_tok = len(a["tokens"])
    # craft an out-of-range span and a singleton cluster
    a["corefs"].append([{"start": 0, "end": 2}, {"start": n_tok, "end": n_tok + 3}])
    a["corefs"].append([{"start": 0, "end": 1}])
    on = filter_document(copy.deepcopy(a), FilterConfig(coref_span_fixing=True))
    off = filter_document(copy.deepcopy(a), FilterConfig(coref_span_fixing=False))
    assert all(len(c) >= 2 for c in on["corefs"])
    assert all(s["end"] <= n_tok for c in on["corefs"] for s in c)
    assert any(len(c) == 1 for c in off["corefs"])


def test_a4_ranked_sense_wsd(model):
    """A4 ranked-sense WSD: the same ambiguous noun resolves to
    different synsets (and SUMO types) under different document
    contexts; no context → most-frequent sense (E5 policy)."""
    import datetime as dt

    import pyarrow as pa

    from pikes_ray.functions.wordnet import (context_synsets,
                                             noun_types_ctx, rank_senses)
    from pikes_ray.schema import TRANSCRIPT_SCHEMA
    from pikes_ray.stages.fused import KGStage

    # function level: context flips, prior wins ties, determinism
    fin = context_synsets(["money", "investment"])
    riv = context_synsets(["land", "country"])
    assert noun_types_ctx("bank", fin)[0] == "08420278-n"
    assert noun_types_ctx("bank", riv)[0] == "09213565-n"
    assert noun_types_ctx("bank")[0] == "08420278-n"           # MFS
    assert rank_senses("bank", fin) == rank_senses("bank", fin)
    # one neighbor hit each way → frequency prior breaks the tie
    mixed = context_synsets(["money", "land"])
    assert noun_types_ctx("bank", mixed)[0] == "08420278-n"

    # end-to-end: the flip shows up in the emitted sumo: types
    def triples(text):
        b = pa.Table.from_pylist([{
            "conv_id": "c", "turn_idx": 0, "role": "user", "text": text,
            "tool": "", "ts": dt.datetime(2024, 1, 1)}],
            schema=TRANSCRIPT_SCHEMA)
        return KGStage(static_canon=False)(b).to_pandas()

    fin_t = triples("The bank approved the investment of the money.")
    riv_t = triples("The bank of the land in this country is wide.")
    assert "sumo:FinancialOrganization" in set(fin_t.obj)
    assert "sumo:LandArea" in set(riv_t.obj)
    assert "sumo:FinancialOrganization" not in set(riv_t.obj)


def test_m7_semafor_second_source_merge(model):
    """M7 two-source frame projection: same-head Semafor+SRL frames
    merge into ONE event under F9 (PB sense wins), FrameNet-only LUs
    survive as fn:-typed events; F9 off keeps both sources apart."""
    ann = model

    # merge case: "donated" carries donate.01 (verbal SRL) AND the
    # Giving FN trigger — one predicate after filtering
    row = ann.annotate("The donors donated the money.")
    srcs = [p["source"] for p in row["predicates"]]
    assert "semafor" in srcs  # projected before filtering
    from pikes_ray.stages.filter import FilterConfig, filter_document

    filt = filter_document(row, FilterConfig())
    donated = [p for p in filt["predicates"]
               if row["tokens"][p["head"]]["lemma"] == "donate"]
    assert len(donated) == 1 and donated[0]["sense"] == "donate.01"
    assert donated[0]["source"] == "verbal"

    # F9 off → the semafor frame stays separate
    nofilt = filter_document(ann.annotate("The donors donated the money."),
                             FilterConfig(srl_preprocess=False))
    donated2 = [p for p in nofilt["predicates"]
                if nofilt["tokens"][p["head"]]["lemma"] == "donate"]
    assert {p["source"] for p in donated2} == {"verbal", "semafor"}

    # FrameNet-only LU: "war" has no PB/NB roleset → fn:-typed event
    import datetime as dt

    import pyarrow as pa

    from pikes_ray.schema import TRANSCRIPT_SCHEMA
    from pikes_ray.stages.fused import KGStage

    b = pa.Table.from_pylist([{
        "conv_id": "c", "turn_idx": 0, "role": "user",
        "text": "The war started in March.",
        "tool": "", "ts": dt.datetime(2024, 1, 1)}], schema=TRANSCRIPT_SCHEMA)
    tr = KGStage(static_canon=False)(b).to_pandas()
    assert "fn:Hostile_encounter" in set(tr.obj)
    assert any(o.startswith("fb:frame-Hostile_encounter-war.n")
               for o in tr.obj)
    # and it is an event instance, not a pb: one
    war_subjs = set(tr[tr.obj == "fn:Hostile_encounter"].subj)
    assert not any(o.startswith("pb:")
                   for o in tr[tr.subj.isin(war_subjs)].obj)


def test_f18_coref_for_role_dependencies_flag(model):
    """F18 adds a coref cluster linking a proper name to the NMOD role
    noun it fills when the noun carries a NomBank roleset with declared
    args (applyCorefForRoleDependencies, NAFFilter.java:895-983; off by
    default like the reference)."""
    import copy

    a = model.annotate("The government official Karim announced the launch.")
    on = filter_document(copy.deepcopy(a),
                         FilterConfig(coref_for_role_dependencies=True))
    off = filter_document(copy.deepcopy(a), FilterConfig())
    # name span (Karim) clustered with the role-noun span (official)
    karim = next(i for i, t in enumerate(on["tokens"]) if t["form"] == "Karim")
    official = next(i for i, t in enumerate(on["tokens"])
                    if t["form"] == "official")
    assert any(
        any(s["start"] <= karim < s["end"] for s in cl)
        and any(s["start"] <= official < s["end"] for s in cl)
        for cl in on["corefs"])
    assert off["corefs"] == a["corefs"]  # default off: unchanged

    # plural role + single name aborts (:960-966 agreement check)
    b = model.annotate("The presidents Karim announced the launch.")
    on_b = filter_document(copy.deepcopy(b),
                           FilterConfig(coref_for_role_dependencies=True))
    presidents = next(i for i, t in enumerate(on_b["tokens"])
                      if t["form"] == "presidents")
    assert not any(
        any(s["start"] <= presidents < s["end"] for s in cl)
        for cl in on_b["corefs"])


def test_f20_opinion_linking_flag(model):
    """F20 opinionLinking (on by default, NAFFilter.java:1485-1519):
    links the opinion's expression/target/holder heads to instances.
    Off → bare typed opinion nodes, no links."""
    import copy

    from pikes_ray.stages.extract import _DocExtractor

    a = model.annotate("Alice praised the excellent report.")
    a = filter_document(a, FilterConfig())
    row = {"conv_id": "c", "turn_idx": 0, "role": "user",
           "text": "Alice praised the excellent report.", "tool": "",
           "ts": __import__("datetime").datetime(2024, 1, 1), "quarantined": False, **a}

    def triples(opinion_linking):
        ex = _DocExtractor("c", 0, copy.deepcopy(row),
                           opinion_linking=opinion_linking)
        return [(s, p, o) for (s, p, o, _g, _c) in ex.run()]

    on, off = triples(True), triples(False)
    on_preds = {p for (_s, p, _o) in on}
    off_preds = {p for (_s, p, _o) in off}
    assert "ks:expression" in on_preds
    assert "ks:expression" not in off_preds
    assert "ks:target" not in off_preds
    assert "ks:holder" not in off_preds
    # the typed opinion node itself survives either way
    assert any(o == "ks:Opinion" for (_s, p, o) in off if p == "rdf:type")
