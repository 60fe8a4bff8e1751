"""KEM/KEMT second-generation extractor (stages/kem.py ≙
NAFExtractor.java) — unit tests per step + plugin-surface round trip."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pytest

from pikes_ray.schema import TRANSCRIPT_SCHEMA
from pikes_ray.stages.annotate import RuleAnnotator
from pikes_ray.stages.filter import FilterConfig, filter_document
from pikes_ray.stages.kem import kem_extract_batch


def _row(text: str, turn: int = 0) -> dict:
    ann = filter_document(RuleAnnotator().annotate(text), FilterConfig())
    return {"conv_id": "kem", "turn_idx": turn, "role": "user", "text": text,
            "tool": "", "ts": dt.datetime(2024, 1, 1), "quarantined": False,
            **ann}


def _triples(text: str) -> pd.DataFrame:
    rows = [_row(text)]
    batch = pa.Table.from_pylist(rows)
    return kem_extract_batch(batch).to_pandas()


def spo(df):
    return set(zip(df["subj"], df["pred"], df["obj"]))


def test_kem_metadata():
    t = _triples("Alice Johnson met Bob Smith in Paris.")
    got = spo(t)
    doc = "conv:kem%23turn=0"
    assert (doc, "rdf:type", "kemt:TextResource") in got
    assert (doc, "rdf:type", "ks:Text") in got
    assert any(s == doc and p == "ks:textHash" for s, p, _ in got)
    assert (doc, "dct:language", "lexvo:eng") in got


def test_kem_entities_mentions_and_linking():
    t = _triples("Alice Johnson met Bob Smith in Paris.")
    got = spo(t)
    # mention typed kem:Mention with NIF offsets and an annotation chain
    mentions = {s for s, p, o in got if p == "rdf:type" and o == "kem:Mention"}
    assert any("#char=0,13" in m for m in mentions)
    anns = {o for s, p, o in got if p == "kem:hasAnnotation"}
    assert anns
    # NER class annotation + named-entity reification
    assert any(p == "itsrdf:taClassRef" and o == "ner:person"
               for _, p, o in got)
    assert any(p == "kemt:properName" and o == '"Alice Johnson"'
               for _, p, o in got)
    assert any(p == "rdf:type" and o == "kemt:NamedEntity" for _, p, o in got)
    # linking annotation with confidence
    assert any(p == "itsrdf:taIdentRef" and o == "dbr:Alice_Johnson"
               for _, p, o in got)
    assert any(p == "nif:confidence" for _, p, o in got)


def test_kem_timex_owltime():
    t = _triples("The deal closed on March 3, 2024.")
    got = spo(t)
    tmx = [(s, o) for s, p, o in got if p == "kemt:type"]
    assert ("kemt:tt-date" in {o for _, o in tmx})
    # the annotation points at a real OWL-Time interval node
    objs = {o for _, p, o in got if p == "kemt:objectValue"}
    assert objs and any(o.startswith("time:") for o in objs)
    assert any(p == "time:hasDateTimeDescription" for _, p, _ in got)


def test_kem_predicates_and_roles():
    t = _triples("Acme Corp acquired Beta LLC.")
    got = spo(t)
    # predicate mention carries lemma + olia POS link
    assert any(p == "nif:lemma" and o == '"acquire"' for _, p, o in got)
    assert any(p == "nif:oliaLink" and o.startswith("penn:VB")
               for _, p, o in got)
    # roleset class annotation
    assert any(p == "itsrdf:taClassRef" and o == "pb:acquire.01"
               for _, p, o in got)
    # reified participation: one annotation linking predicate to each arg
    parts = [s for s, p, o in got if p == "kemt:predicate"]
    assert parts
    args = {o for s, p, o in got if p == "kemt:argument"}
    assert args
    roles = {o for s, p, o in got if p == "itsrdf:taPropRef"}
    assert {"pb:a0", "pb:a1"} <= roles


def test_kem_coordination():
    t = _triples("Alice Johnson and Bob Smith signed the agreement.")
    got = spo(t)
    coords = [s for s, p, o in got
              if p == "rdf:type" and o == "kemt:Coordination"]
    assert len(coords) == 1
    conj = [o for s, p, o in got if s == coords[0] and p == "kemt:conjunct"]
    assert len(conj) == 2
    assert any(p == "kemt:group" for s, p, o in got if s == coords[0])


def test_kem_quarantined_rows_skipped():
    rows = [_row("Acme Corp acquired Beta LLC.")]
    rows[0]["quarantined"] = True
    out = kem_extract_batch(pa.Table.from_pylist(rows)).to_pandas()
    assert len(out) == 0


def test_kem_via_extension_registry(ray_session):
    """The plugin surface runs the second Extractor end-to-end over a
    Dataset (the reference's api/Extractor.java swap)."""
    import ray.data as rd

    from pikes_ray.extension import resolve

    kem = resolve("extract_kem")
    rows = [_row("Alice Johnson met Bob Smith in Paris.", turn=i)
            for i in range(3)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(kem, batch_format="pyarrow").to_pandas()
    assert len(out) > 30
    assert set(out["turn_idx"]) == {0, 1, 2}
    # deterministic per turn
    a = out[out["turn_idx"] == 0][["subj", "pred", "obj"]]
    b = out[out["turn_idx"] == 1][["subj", "pred", "obj"]]
    fix = lambda df, i: {(s.replace(f"turn={i}", "turn=X"), p,
                          o.replace(f"turn={i}", "turn=X"))
                         for s, p, o in df.itertuples(index=False)}
    assert fix(a, 0) == fix(b, 1)


def test_kem_coreference():
    t = _triples("Alice Johnson founded Acme Corp. She leads it.")
    got = spo(t)
    corefs = [s for s, p, o in got
              if p == "rdf:type" and o == "kemt:Coreference"]
    assert corefs
    links = [(s, o) for s, p, o in got if p == "kemt:coreferring"]
    assert len(links) >= 2
    # every coreferent is an annotation hanging off a mention
    ann_targets = {o for _, p, o in got if p == "kem:hasAnnotation"}
    assert all(o in ann_targets for _, o in links)


def test_kem_fragment_typing():
    # emitFragment :1044-1053: fragments link to the doc and are typed
    # RFC5147 strings
    t = _triples("Alice Johnson met Bob Smith in Paris.")
    got = spo(t)
    doc = "conv:kem%23turn=0"
    frags = {s for s, p, o in got if p == "kem:fragmentOf" and o == doc}
    assert frags
    for f in frags:
        assert (f, "rdf:type", "nif:RFC5147String") in got


def test_kem_entity_attributes_typed_values():
    # emitEntityAttributes :1121-1168: money gets a currency unit and a
    # double objectValue; cardinals parse as doubles
    t = _triples("Acme Corp paid $5 million for 3 factories.")
    got = spo(t)
    assert any(p == "kemt:unit" and o == '"USD"' for _, p, o in got)
    vals = {o for _, p, o in got if p == "kemt:objectValue"}
    assert any("xsd:double" in v for v in vals), vals


def test_kem_term_info_annotations():
    # emitCommonAttributesAnnotation :1170-1210: head terms CARRYING
    # WordNet/SST/BBN senses (the M11 columns, filled on the NAF
    # interop path) emit itsrdf:termInfoRef term annotations
    row = _row("The company acquired the factory.")
    for tok in row["tokens"]:
        if tok["form"] == "company":
            tok["synset"] = "08058098-n"
            tok["sst"] = "B-noun.group"
            tok["bbn"] = "ORGANIZATION"
    t = kem_extract_batch(pa.Table.from_pylist([row])).to_pandas()
    got = spo(t)
    refs = {o for _, p, o in got if p == "itsrdf:termInfoRef"}
    assert "wnsyn:08058098-n" in refs, refs
    assert "wnsst:noun.group" in refs, refs       # part after the last '-'
    assert any(o.startswith("bbn:") for o in refs), refs


def test_kem_ks_mention_consistency():
    # KS (RDFGenerator) and KEM (NAFExtractor) run over the SAME
    # annotated rows; every KS mention offset range must exist as a KEM
    # fragment (both mint <doc>#char=B,E via the same offsets) — the
    # cross-extractor consistency gate (VERDICT r3 item 7)
    from pikes_ray.stages.extract import extract_batch

    texts = ["Alice Johnson met Bob Smith in Paris.",
             "Acme Corp paid $5 million for 3 factories on 2014-02-17.",
             "The company acquired the factory. It grew."]
    rows = [_row(t, turn=i) for i, t in enumerate(texts)]
    batch = pa.Table.from_pylist(rows)
    kem = kem_extract_batch(batch).to_pandas()
    ks = extract_batch(batch).to_pandas()

    import re
    def char_spans(df, turn):
        sub = df[df["turn_idx"] == turn]
        out = set()
        for col in ("subj", "obj"):
            for v in sub[col]:
                m = re.search(r"#char=(\d+),(\d+)", str(v))
                if m:
                    out.add((int(m.group(1)), int(m.group(2))))
        return out

    for i in range(len(texts)):
        ks_spans = char_spans(ks, i)
        kem_spans = char_spans(kem, i)
        assert ks_spans, f"KS emitted no mentions for turn {i}"
        missing = ks_spans - kem_spans
        assert not missing, f"turn {i}: KS mentions absent in KEM: {missing}"
