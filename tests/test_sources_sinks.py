"""Sinks / ingest recipes / corpus stats / evaluation tests."""

import glob
import os

import pandas as pd
import pytest

import ray.data as rd

from pikes_ray.pipelines.kg import annotate_transcripts, transcripts_to_graph
from pikes_ray.pipelines.stats import corpus_statistics, triple_pr
from pikes_ray.sources.ingest import (
    read_documents_as_transcripts,
    read_jsonl_transcripts,
)
from pikes_ray.sources.sinks import expand_curie, write_ntriples
from pikes_ray.sources.transcripts import transcripts_dir


def test_expand_curie():
    assert expand_curie("rdf:type") == \
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    assert expand_curie('"x"') == '"x"'
    assert expand_curie('"5"^^xsd:int') == \
        '"5"^^<http://www.w3.org/2001/XMLSchema#int>'
    assert expand_curie("dbr:Paris") == "<http://dbpedia.org/resource/Paris>"


def test_write_ntriples(ray_session, tmp_path):
    tr = transcripts_to_graph(transcripts_dir("unit"), concurrency=2)
    out = str(tmp_path / "nt")
    write_ntriples(tr, out)
    files = glob.glob(os.path.join(out, "*"))
    assert files
    line = open(files[0]).readline().strip()
    assert line.endswith(" .") and line.startswith("<")


def test_ingest_jsonl(ray_session, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"conv_id": "c1", "turn_idx": 0, "role": "user", '
                 '"text": "Acme Corp acquired Beta LLC."}\n')
    ds = read_jsonl_transcripts(str(p))
    df = ds.to_pandas()
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["tool"].iloc[0] == ""


def test_documents_as_transcripts(ray_session):
    ds = read_documents_as_transcripts("/root/testdata/sf0.001")
    df = ds.to_pandas()
    assert len(df) == 500
    assert (df["turn_idx"] == 0).all()
    assert df["conv_id"].str.startswith("doc-").all()


def test_corpus_statistics(ray_session):
    ann = annotate_transcripts(rd.read_parquet(transcripts_dir("unit")),
                               concurrency=2)
    stats = corpus_statistics(ann)
    row = stats.iloc[0]
    assert row["turns"] == 66
    assert row["tokens"] > 500
    assert row["entities"] > 50
    assert row["sentences"] >= row["turns"] - 10


def test_triple_pr_exact_match(ray_session):
    tr = transcripts_to_graph(transcripts_dir("unit"), concurrency=2).materialize()
    res = triple_pr(tr, tr)
    assert res["precision"] == 1.0 and res["recall"] == 1.0


def test_triple_pr_partial(ray_session):
    tr = transcripts_to_graph(transcripts_dir("unit"), concurrency=2).materialize()
    half = tr.limit(tr.count() // 2).materialize()
    res = triple_pr(half, tr)
    assert res["precision"] == 1.0
    assert 0.3 < res["recall"] < 0.8


def test_split_corpus(ray_session):
    from pikes_ray.sources.transcripts import split_corpus

    ds = rd.read_parquet(transcripts_dir("unit"))
    a, b, rest = split_corpus(ds, [0.5, 0.25])
    na, nb, nr = a.count(), b.count(), rest.count()
    assert na + nb + nr == 66
    assert na == 33  # deterministic proportional split


def test_salted_group_agg(ray_session):
    import pandas as pd
    from pikes_ray.pipelines.canonicalize import salted_group_agg

    df = pd.DataFrame({"k": ["hot"] * 900 + ["cold"] * 100,
                       "v": list(range(900)) + list(range(100))})
    ds = rd.from_pandas(df)

    def combiner(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "v": [g["v"].max()]})

    out = salted_group_agg(ds, ["k"], combiner, salt_buckets=8).to_pandas()
    got = dict(zip(out["k"], out["v"]))
    assert got == {"hot": 899, "cold": 99}


def test_cli_eval_smoke():
    """CLI subcommand end-to-end in its own process/Ray session."""
    import json
    import subprocess
    import sys

    gold = os.path.join(os.path.dirname(__file__), "golden", "triples_gold.parquet")
    proc = subprocess.run(
        [sys.executable, "-m", "pikes_ray", "eval", "--pred", gold,
         "--gold", gold, "--num-cpus", "2"],
        capture_output=True, text=True, timeout=180,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-800:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["precision"] == 1.0 and res["recall"] == 1.0


def test_expand_curie_literal_with_caret_data():
    """'^^' inside the lexical form is data, not a datatype tag
    (ADVICE r1: tool-call transcript text can contain '^^')."""
    assert expand_curie('"a^^b"') == '"a^^b"'
    assert expand_curie('"x^^y"^^xsd:string') == \
        '"x^^y"^^<http://www.w3.org/2001/XMLSchema#string>'


def test_literal_escapes_cr_and_tab():
    from pikes_ray.stages.extract import _lit

    assert _lit("a\rb\tc") == '"a\\rb\\tc"'


def test_opinion_pr(ray_session):
    """E6: opinion-layer P/R is 1.0 against itself and detects a
    missing opinion."""
    import pandas as pd

    import ray.data as rd

    from pikes_ray.pipelines.stats import opinion_pr

    rows = [
        {"subj": "op1", "pred": "rdf:type", "obj": "ks:Opinion", "graph": "f", "conf": 0.0},
        {"subj": "op1", "pred": "rdf:type", "obj": "ks:PositiveOpinion", "graph": "f", "conf": 0.0},
        {"subj": "op1", "pred": "ks:target", "obj": "x", "graph": "f", "conf": 0.0},
        {"subj": "a", "pred": "rdfs:label", "obj": '"noise"', "graph": "", "conf": 0.0},
    ]
    full = rd.from_pandas(pd.DataFrame(rows))
    part = rd.from_pandas(pd.DataFrame(rows[:2]))
    r = opinion_pr(full, full)
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["n_gold"] == 3
    r2 = opinion_pr(part, full)
    assert r2["recall"] < 1.0 and r2["precision"] == 1.0


def test_read_csv_transcripts(ray_session, tmp_path):
    import pandas as pd

    from pikes_ray.sources.ingest import read_csv_transcripts

    p = str(tmp_path / "t.csv")
    pd.DataFrame({
        "conv_id": ["c1", "c1"], "turn_idx": [0, 1],
        "role": ["user", "assistant"],
        "text": ["Alice Johnson met Bob Smith.", "They met in Paris."],
    }).to_csv(p, index=False)
    ds = read_csv_transcripts(p)
    df = ds.to_pandas()
    assert len(df) == 2 and set(df.columns) >= {"conv_id", "turn_idx",
                                                "role", "text", "tool", "ts"}


def test_write_naf_xml(ray_session, tmp_path):
    import xml.dom.minidom as md

    from pikes_ray.pipelines.kg import annotate_transcripts
    from pikes_ray.sources.sinks import write_naf_xml

    ann = annotate_transcripts(
        rd.read_parquet(transcripts_dir("unit")).limit(6), concurrency=2)
    out = str(tmp_path / "naf")
    n = write_naf_xml(ann, out)
    assert n == 6
    files = glob.glob(os.path.join(out, "*.xml"))
    assert files
    first_doc = open(files[0]).read().splitlines()[0]
    dom = md.parseString(first_doc)       # well-formed XML per line
    assert dom.documentElement.tagName == "NAF"
    assert dom.getElementsByTagName("wf")
    # M8 head-marking analogue: the chunks layer carries head= attrs
    all_chunks = [c for f in files
                  for line in open(f).read().splitlines()
                  for c in md.parseString(line).getElementsByTagName("chunk")]
    assert all_chunks and all(c.getAttribute("head").startswith("t")
                              for c in all_chunks)


def test_triple_pr_by_namespace(ray_session):
    from pikes_ray.pipelines.kg import transcripts_to_graph
    from pikes_ray.pipelines.stats import triple_pr_by_namespace

    tr = transcripts_to_graph(transcripts_dir("unit"), concurrency=2).materialize()
    df = triple_pr_by_namespace(tr, tr, namespaces=("pb:", "sem:", "owl:"))
    assert list(df["namespace"]) == ["pb:", "sem:", "owl:", "ALL"]
    assert (df["precision"] == 1.0).all() and (df["recall"] == 1.0).all()
    assert df.set_index("namespace").loc["pb:", "n_gold"] > 0


def test_read_email_transcripts(ray_session, tmp_path):
    from pikes_ray.sources.ingest import read_email_transcripts

    p = str(tmp_path / "m1.eml")
    with open(p, "w") as f:
        f.write("Message-ID: <42@example>\n"
                "From: alice@example.com\n"
                "Subject: Quarterly report\n"
                "Date: Mon, 2 Feb 2015 10:00:00 +0000\n"
                "\n"
                "Acme Corp acquired Beta LLC.\n")
    df = read_email_transcripts(p).to_pandas()
    assert len(df) == 1
    assert df["conv_id"].iloc[0] == "<42@example>"
    assert df["role"].iloc[0] == "alice@example.com"
    assert "Quarterly report" in df["text"].iloc[0]
    assert "Acme Corp" in df["text"].iloc[0]
    assert str(df["ts"].iloc[0]).startswith("2015-02-02")


def test_read_sgml_documents(ray_session, tmp_path):
    from pikes_ray.sources.ingest import read_sgml_documents

    p = str(tmp_path / "fbis.sgml")
    with open(p, "w") as f:
        f.write("<DOC><DOCNO>FBIS-1</DOCNO>\n"
                "<TEXT>Alice Johnson met Bob Smith in <B>Paris</B>.</TEXT>"
                "</DOC>\n"
                "<DOC><DOCNO>FBIS-2</DOCNO><TEXT>Second doc.</TEXT></DOC>\n")
    df = read_sgml_documents(p).to_pandas().sort_values("conv_id")
    assert list(df["conv_id"]) == ["FBIS-1", "FBIS-2"]
    assert "Paris" in df["text"].iloc[0] and "<B>" not in df["text"].iloc[0]


def test_f17_premon_iris():
    """F17 srlPreMOnIRIs: class/role IRIs match the reference's
    NAFUtils.createPreMOnSemantic{Class,Role}IRIfor exactly
    (NAFUtils.java:995-1048; version prefixes :86-89)."""
    from pikes_ray.functions.iri import premon_class_iri, premon_role_iri

    ns = "http://premon.fbk.eu/resource/"
    assert premon_class_iri("PropBank", "Donate.01") == f"{ns}pb17-donate.01"
    assert premon_class_iri("NomBank", "donation.01") == f"{ns}nb10-donation.01"
    assert premon_class_iri("VerbNet", "Give-13.1") == f"{ns}vb32-give-13.1"
    assert premon_class_iri("FrameNet", "Giving") == f"{ns}fn15-giving"
    # PB/NB role normalization: A0→arg0, AM-TMP→argtmp, @ separator
    assert premon_role_iri("PropBank", "donate.01", "A0") == \
        f"{ns}pb17-donate.01@arg0"
    assert premon_role_iri("NomBank", "donation.01", "AM-TMP") == \
        f"{ns}nb10-donation.01@argtmp"
    # the reference's all-occurrence replace quirk: AA → argarg
    assert premon_role_iri("PropBank", "pay.01", "AA") == \
        f"{ns}pb17-pay.01@argarg"
    # VN/FN roles are lowercased only
    assert premon_role_iri("FrameNet", "Giving", "Donor") == \
        f"{ns}fn15-giving@donor"


def test_f17_role_curie_expansion():
    """The N-Triples sink expands internal pb:/nb: role-property CURIEs
    into reference-exact PreMOn role IRIs."""
    ns = "http://premon.fbk.eu/resource/"
    assert expand_curie("pb:donate.01-a0") == f"<{ns}pb17-donate.01@arg0>"
    assert expand_curie("nb:donation.01-amtmp") == \
        f"<{ns}nb10-donation.01@argtmp>"
    # class CURIEs (no role suffix) expand with the version prefix only
    assert expand_curie("pb:donate.01") == f"<{ns}pb17-donate.01>"
    assert expand_curie("vn:give-13.1") == f"<{ns}vb32-give-13.1>"
    # the -neg variant marker is NOT a role and stays hyphenated
    assert expand_curie("pb:support.01-neg") == f"<{ns}pb17-support.01-neg>"


def test_write_ntriples_gzip_and_compressed_ingest(ray_session, tmp_path):
    """S5/S1 compression parity: part-*.nt.gz output round-trips, and the
    text reader transparently decompresses .gz/.bz2/.xz per file."""
    import bz2
    import gzip
    import lzma

    from pikes_ray.sources.ingest import read_text_documents

    tr = transcripts_to_graph(transcripts_dir("unit"), concurrency=2)
    out = str(tmp_path / "ntgz")
    n = write_ntriples(tr, out, compression="gzip")
    files = glob.glob(os.path.join(out, "*.nt.gz"))
    assert files and n > 0
    lines = []
    for f in files:
        lines += gzip.open(f, "rt").read().splitlines()
    assert len(lines) == n
    assert all(ln.endswith(" .") for ln in lines)

    (tmp_path / "a.txt.gz").write_bytes(gzip.compress(b"Acme Corp grew."))
    (tmp_path / "b.txt.bz2").write_bytes(bz2.compress(b"Beta LLC shrank."))
    (tmp_path / "c.txt.xz").write_bytes(lzma.compress(b"Gamma Inc stalled."))
    ds = read_text_documents([str(tmp_path / x)
                              for x in ("a.txt.gz", "b.txt.bz2", "c.txt.xz")])
    df = ds.to_pandas().sort_values("conv_id")
    assert list(df["text"]) == ["Acme Corp grew.", "Beta LLC shrank.",
                                "Gamma Inc stalled."]


def test_naf_roundtrip_and_extract(ray_session, tmp_path):
    """S1 interop: write_naf_xml → read_naf_documents round-trips the
    annotation layers, and the extractor runs on the re-read corpus."""
    import ray.data as rd

    from pikes_ray.sources.ingest import read_naf_documents
    from pikes_ray.sources.sinks import write_naf_xml
    from pikes_ray.stages.annotate import AnnotatorStage
    from pikes_ray.stages.extract import extract_batch

    src = rd.read_parquet(transcripts_dir("unit")).limit(8)
    ann = src.map_batches(AnnotatorStage, batch_format="pyarrow",
                          concurrency=1)
    before = ann.to_pandas().sort_values(["conv_id", "turn_idx"])
    out = str(tmp_path / "naf")
    n = write_naf_xml(ann, out)
    assert n == len(before)

    back = read_naf_documents(out).to_pandas() \
        .sort_values(["conv_id", "turn_idx"])
    assert len(back) == len(before)
    for (_, a), (_, b) in zip(before.iterrows(), back.iterrows()):
        assert f"{a.conv_id}#turn={a.turn_idx}" == f"{b.conv_id}#turn={b.turn_idx}"
        assert [t["form"] for t in a.tokens] == [t["form"] for t in b.tokens]
        assert [t["lemma"] for t in a.tokens] == [t["lemma"] for t in b.tokens]
        assert [t["morphofeat"] for t in a.tokens] == \
            [t["morphofeat"] for t in b.tokens]
        assert [(e["etype"] or "MISC", e["start"], e["end"])
                for e in a.entities] == \
            [(e["etype"], e["start"], e["end"]) for e in b.entities]
        assert [(p["head"], p["sense"]) for p in a.predicates] == \
            [(p["head"], p["sense"]) for p in b.predicates]

    # the re-read corpus drives the native extractor
    tr = read_naf_documents(out).map_batches(
        extract_batch, batch_format="pyarrow").to_pandas()
    assert len(tr) > 0
    assert (tr["pred"] == "rdf:type").any()


def test_naf_reference_shaped_parse(ray_session, tmp_path):
    """A kaflib-convention NAF (1-based w1/t1 ids, head="yes" span
    targets, resource-tagged externalRefs, deps + coreferences layers)
    parses into the annotated schema (ReadWriteManager.java shape)."""
    from pikes_ray.sources.ingest import read_naf_documents

    naf = """<?xml version="1.0" encoding="UTF-8"?>
<NAF xml:lang="en" version="v3">
 <nafHeader><public publicId="d1"/></nafHeader>
 <raw>Acme acquired Beta. It grew.</raw>
 <text>
  <wf id="w1" offset="0" length="4" sent="1">Acme</wf>
  <wf id="w2" offset="5" length="8" sent="1">acquired</wf>
  <wf id="w3" offset="14" length="4" sent="1">Beta</wf>
  <wf id="w4" offset="20" length="2" sent="2">It</wf>
  <wf id="w5" offset="23" length="4" sent="2">grew</wf>
 </text>
 <terms>
  <term id="t1" lemma="Acme" pos="R" morphofeat="NNP"><span><target id="w1"/></span></term>
  <term id="t2" lemma="acquire" pos="V" morphofeat="VBD"><span><target id="w2"/></span></term>
  <term id="t3" lemma="Beta" pos="R" morphofeat="NNP"><span><target id="w3"/></span></term>
  <term id="t4" lemma="it" pos="Q" morphofeat="PRP"><span><target id="w4"/></span></term>
  <term id="t5" lemma="grow" pos="V" morphofeat="VBD"><span><target id="w5"/></span></term>
 </terms>
 <deps>
  <dep from="t2" to="t1" rfunc="SBJ"/>
  <dep from="t2" to="t3" rfunc="OBJ"/>
 </deps>
 <entities>
  <entity id="e1" type="ORGANIZATION">
   <references><span><target id="t1"/></span></references>
   <externalReferences>
    <externalRef resource="spotlight" reference="dbr:Acme" confidence="0.9"/>
   </externalReferences>
  </entity>
 </entities>
 <srl>
  <predicate id="pr1">
   <externalReferences>
    <externalRef resource="PropBank" reference="acquire.01"/>
   </externalReferences>
   <span><target id="t2" head="yes"/></span>
   <role id="r1" semRole="A0">
    <externalReferences>
     <externalRef resource="VerbNet" reference="rolemustnotleak"/>
    </externalReferences>
    <span><target id="t1" head="yes"/></span>
   </role>
   <role id="r2" semRole="A1"><span><target id="t3" head="yes"/></span></role>
  </predicate>
 </srl>
 <coreferences>
  <coref id="co1">
   <span><target id="t1"/></span>
   <span><target id="t4"/></span>
  </coref>
 </coreferences>
</NAF>"""
    p = tmp_path / "d1.naf"
    p.write_text(naf)
    df = read_naf_documents(str(p)).to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    assert [t["form"] for t in row.tokens] == \
        ["Acme", "acquired", "Beta", "It", "grew"]
    assert row.tokens[1]["lemma"] == "acquire"
    assert row.deps[0]["rfunc"] == "SBJ" and row.deps[0]["frm"] == 1
    e = row.entities[0]
    assert (e["etype"], e["start"], e["end"], e["link"]) == \
        ("ORGANIZATION", 0, 1, "dbr:Acme")
    pr = row.predicates[0]
    assert (pr["head"], pr["sense"], pr["source"]) == (1, "acquire.01", "verbal")
    assert [(r["sem_role"], r["head"]) for r in pr["roles"]] == \
        [("A0", 0), ("A1", 2)]
    assert [ (s["start"], s["end"]) for s in row.corefs[0] ] == [(0, 1), (3, 4)]


def test_m11_term_sense_normalization(ray_session, tmp_path):
    """M11 (NAFUtils.normalize, NAFUtils.java:116-151): legacy Term
    attributes (`wordnet`/`supersense`/`bbn`) and externalRefs with
    resources wn30-ukb/wn30-sst/BBN fold into one canonical token
    column each, refs winning over attributes; the extractor prefers
    the carried sense over lexicon WSD; F1 termSenseFiltering drops
    carried senses on proper-noun heads (NAFFilter.java:375-386);
    and the S6 writer round-trips the refs in canonical form."""
    from pikes_ray.sources.ingest import read_naf_documents
    from pikes_ray.sources.sinks import write_naf_xml
    from pikes_ray.stages.extract import extract_batch
    from pikes_ray.stages.filter import FilterStage

    naf = """<?xml version="1.0" encoding="UTF-8"?>
<NAF xml:lang="en" version="v3">
 <nafHeader><public publicId="m11"/></nafHeader>
 <raw>The company acquired the factory. Beta grew.</raw>
 <text>
  <wf id="w1" offset="0" length="3" sent="1">The</wf>
  <wf id="w2" offset="4" length="7" sent="1">company</wf>
  <wf id="w3" offset="12" length="8" sent="1">acquired</wf>
  <wf id="w4" offset="21" length="3" sent="1">the</wf>
  <wf id="w5" offset="25" length="7" sent="1">factory</wf>
  <wf id="w6" offset="32" length="1" sent="1">.</wf>
  <wf id="w7" offset="34" length="4" sent="2">Beta</wf>
  <wf id="w8" offset="39" length="4" sent="2">grew</wf>
  <wf id="w9" offset="43" length="1" sent="2">.</wf>
 </text>
 <terms>
  <term id="t1" lemma="the" pos="D" morphofeat="DT"><span><target id="w1"/></span></term>
  <term id="t2" lemma="company" pos="N" morphofeat="NN"><span><target id="w2"/></span>
   <externalReferences>
    <externalRef resource="wn30-ukb" reference="08058098-n"/>
    <externalRef resource="wn30-sst" reference="noun.group"/>
   </externalReferences></term>
  <term id="t3" lemma="acquire" pos="V" morphofeat="VBD"><span><target id="w3"/></span></term>
  <term id="t4" lemma="the" pos="D" morphofeat="DT"><span><target id="w4"/></span></term>
  <term id="t5" lemma="factory" pos="N" morphofeat="NN" wordnet="99999998-n"
        supersense="noun.artifact" bbn="FAC"><span><target id="w5"/></span>
   <externalReferences>
    <externalRef resource="wn30-ukb" reference="03316406-n"/>
   </externalReferences></term>
  <term id="t6" lemma="." pos="O" morphofeat="."><span><target id="w6"/></span></term>
  <term id="t7" lemma="Beta" pos="R" morphofeat="NNP" wordnet="99999999-n">
   <span><target id="w7"/></span></term>
  <term id="t8" lemma="grow" pos="V" morphofeat="VBD"><span><target id="w8"/></span></term>
  <term id="t9" lemma="." pos="O" morphofeat="."><span><target id="w9"/></span></term>
 </terms>
 <srl>
  <predicate id="pr1">
   <externalReferences><externalRef resource="PropBank" reference="acquire.01"/>
    <externalRef resource="PropBank" reference="acquire.01"/></externalReferences>
   <span><target id="t3" head="yes"/></span>
   <role id="r1" semRole="A0"><span><target id="t2" head="yes"/></span></role>
   <role id="r2" semRole="A1"><span><target id="t5" head="yes"/></span></role>
  </predicate>
  <predicate id="pr2">
   <externalReferences><externalRef resource="PropBank" reference="grow.01"/></externalReferences>
   <span><target id="t8" head="yes"/></span>
   <role id="r3" semRole="A1"><span><target id="t7" head="yes"/></span></role>
  </predicate>
 </srl>
</NAF>"""
    p = tmp_path / "m11.naf"
    p.write_text(naf)
    df = read_naf_documents(str(p)).to_pandas()
    toks = df.iloc[0].tokens
    # externalRef form
    assert (toks[1]["synset"], toks[1]["sst"], toks[1]["bbn"]) == \
        ("08058098-n", "noun.group", "")
    # ref wins over the legacy attribute; attribute fills the missing ones
    assert (toks[4]["synset"], toks[4]["sst"], toks[4]["bbn"]) == \
        ("03316406-n", "noun.artifact", "FAC")
    # legacy attribute alone (normalization keeps it; F1 filters at
    # extraction because the head is NNP)
    assert toks[6]["synset"] == "99999999-n"
    # duplicated (resource, reference) predicate refs dedupe (normalizeRefs)
    assert df.iloc[0].predicates[0]["sense"] == "acquire.01"

    # the CLI's `extract --naf` composition: filter (F7 entityAddition
    # mints role-filler entities) then extract
    tr = read_naf_documents(str(p)) \
        .map_batches(FilterStage(), batch_format="pyarrow") \
        .map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    objs = set(tr["obj"])
    assert "wnsyn:08058098-n" in objs          # carried ref preferred
    assert "sst:noun.group" in objs
    assert "wnsyn:03316406-n" in objs          # ref-over-attribute value
    assert "wnsyn:99999999-n" not in objs      # F1: NNP head filtered

    # S6 writer round-trips the senses in canonical (wrapped-ref) form
    out = str(tmp_path / "naf_out")
    write_naf_xml(read_naf_documents(str(p)), out)
    back = read_naf_documents(out).to_pandas().iloc[0].tokens
    assert (back[1]["synset"], back[1]["sst"]) == ("08058098-n", "noun.group")
    assert (back[4]["synset"], back[4]["bbn"]) == ("03316406-n", "FAC")


def test_naf_malformed_inputs_are_skipped(ray_session, tmp_path):
    """Malformed/non-NAF files yield zero rows, never an exception
    (log-and-continue posture, SURVEY §4 retries row)."""
    from pikes_ray.sources.ingest import read_naf_documents

    (tmp_path / "broken.xml").write_text("<NAF><raw>unclosed")
    (tmp_path / "other.xml").write_text("<notnaf/>")
    (tmp_path / "truncated.naf").write_bytes(b"\x1f\x8b\x08\x00garbage")
    df = read_naf_documents([str(tmp_path / f) for f in
                             ("broken.xml", "other.xml",
                              "truncated.naf")]).to_pandas()
    assert len(df) == 0


def test_read_ntriples_roundtrip(ray_session, tmp_path):
    """S5 round-trip: write_ntriples → read_ntriples(compact=True) →
    re-serialize reproduces the original line set; compact=False
    returns full IRIs; literals with datatypes / graphs survive."""
    import pandas as pd

    from pikes_ray.sources.sinks import (format_ntriples, read_ntriples,
                                         write_ntriples)

    tr = transcripts_to_graph(transcripts_dir("unit"), concurrency=2)
    out = str(tmp_path / "nt")
    n = write_ntriples(tr, out)
    back = read_ntriples(out)
    assert back.count() == n

    import pyarrow as pa

    orig_lines = set()
    for f in glob.glob(os.path.join(out, "*.nt")):
        orig_lines.update(ln for ln in open(f).read().splitlines() if ln)
    re_lines = set()
    for b in back.map_batches(format_ntriples, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        re_lines.update(b["text"].to_pylist())
    assert re_lines == orig_lines

    full = read_ntriples(out, compact=False).to_pandas()
    assert full["pred"].str.startswith("http").all()


def test_read_ntriples_malformed_and_skip(ray_session, tmp_path):
    p = tmp_path / "bad.nt"
    p.write_text('<http://a> <http://b> "ok" .\n'
                 '# comment line\n'
                 '\n'
                 '<http://a> <http://b> .\n')   # 2 terms: malformed
    import pytest as _pytest

    from pikes_ray.sources.sinks import read_ntriples

    with _pytest.raises(Exception):
        read_ntriples(str(p)).to_pandas()
    ok = read_ntriples(str(p), on_error="skip").to_pandas()
    assert len(ok) == 1 and ok["obj"].iloc[0] == '"ok"'


def test_compact_iri_inverse():
    from pikes_ray.sources.sinks import compact_iri, expand_curie

    for cur in ("rdf:type", "ks:Mention", "dbr:Berlin", "foaf:name",
                '"5"^^xsd:decimal', '"plain lit with <angle>"'):
        assert compact_iri(expand_curie(cur)) == cur
    # PreMOn role IRIs compact to the normalized @arg form
    assert compact_iri(expand_curie("pb:open.01-a0")) == "pb:open.01@arg0"


def test_naf_timex_linked_opinion_layers(ray_session, tmp_path):
    """VERDICT r3 item 4: the timeExpressions / linkedEntities /
    opinions layers of a reference-annotated NAF survive ingest
    (Timex3.java, LinkedEntity.java, Opinion.java;
    ReadWriteManager.java parse sections), the carried annotations WIN
    over lexicon re-derivation in extraction, and the S6 writer
    round-trips all three layers."""
    import ray.data as rd

    from pikes_ray.sources.ingest import read_naf_documents
    from pikes_ray.sources.sinks import write_naf_xml
    from pikes_ray.stages.extract import extract_batch

    naf = """<?xml version="1.0" encoding="UTF-8"?>
<NAF xml:lang="en" version="v3">
 <nafHeader><public publicId="layers"/></nafHeader>
 <raw>Zorblatt praised Quuxco yesterday.</raw>
 <text>
  <wf id="w1" offset="0" length="8" sent="1">Zorblatt</wf>
  <wf id="w2" offset="9" length="7" sent="1">praised</wf>
  <wf id="w3" offset="17" length="6" sent="1">Quuxco</wf>
  <wf id="w4" offset="24" length="9" sent="1">yesterday</wf>
 </text>
 <terms>
  <term id="t1" lemma="Zorblatt" pos="R" morphofeat="NNP"><span><target id="w1"/></span></term>
  <term id="t2" lemma="praise" pos="V" morphofeat="VBD"><span><target id="w2"/></span></term>
  <term id="t3" lemma="Quuxco" pos="R" morphofeat="NNP"><span><target id="w3"/></span></term>
  <term id="t4" lemma="yesterday" pos="N" morphofeat="NN"><span><target id="w4"/></span></term>
 </terms>
 <deps>
  <dep from="t2" to="t1" rfunc="SBJ"/>
  <dep from="t2" to="t3" rfunc="OBJ"/>
 </deps>
 <entities>
  <entity id="e1" type="ORGANIZATION">
   <references><span><target id="t1"/></span></references>
  </entity>
  <entity id="e2" type="ORGANIZATION">
   <references><span><target id="t3"/></span></references>
  </entity>
 </entities>
 <timeExpressions>
  <timex3 id="tmx1" type="DATE" value="2014-02-17">
   <span><target id="w4"/></span>
  </timex3>
 </timeExpressions>
 <linkedEntities>
  <linkedEntity id="le1" resource="dbpedia" reference="dbr:Zorblatt_Industries" confidence="0.93">
   <span><target id="w1"/></span>
  </linkedEntity>
 </linkedEntities>
 <opinions>
  <opinion id="o1">
   <opinion_holder><span><target id="t1"/></span></opinion_holder>
   <opinion_target><span><target id="t3"/></span></opinion_target>
   <opinion_expression polarity="negative"><span><target id="t2"/></span></opinion_expression>
  </opinion>
 </opinions>
</NAF>"""
    p = tmp_path / "layers.naf"
    p.write_text(naf)
    ds = read_naf_documents(str(p))
    df = ds.to_pandas()
    assert len(df) == 1
    row = df.iloc[0]

    # timex3 folded into a DATE entity with the TimeML value as norm
    dates = [e for e in row.entities if e["etype"] == "DATE"]
    assert [(e["start"], e["end"], e["norm"]) for e in dates] == \
        [(3, 4, "2014-02-17")]
    # linkedEntity folded onto the overlapping entity (carried link)
    zb = next(e for e in row.entities if e["start"] == 0)
    assert (zb["link"], round(zb["link_conf"], 2)) == \
        ("dbr:Zorblatt_Industries", 0.93)
    # opinions column carries expression/target/holder term spans
    assert [dict(o) for o in row.opinions] == [{
        "expr_start": 1, "expr_end": 2, "target_start": 2, "target_end": 3,
        "holder_start": 0, "holder_end": 1, "polarity": "negative"}]

    # carried annotations win in extraction: the sameAs goes to the
    # CARRIED link (no gazetteer entry for "Zorblatt" exists), the
    # date instance uses the carried TimeML value, and the opinion is
    # NEGATIVE (the lexicon scores "praise" positive — lexicon
    # derivation would emit ks:PositiveOpinion)
    tr = ds.map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    assert ((tr["pred"] == "owl:sameAs")
            & (tr["obj"] == "dbr:Zorblatt_Industries")).any()
    assert tr["obj"].str.contains("2014-02-17").any()
    assert (tr["obj"] == "ks:NegativeOpinion").any()
    assert not (tr["obj"] == "ks:PositiveOpinion").any()

    # S6 round trip: write → re-read keeps all three layers
    out = str(tmp_path / "naf_rt")
    n = write_naf_xml(ds, out)
    assert n == 1
    back = read_naf_documents(out).to_pandas().iloc[0]
    assert [(e["etype"], e["start"], e["end"], e["norm"], e["link"])
            for e in back.entities] == \
        [(e["etype"] or "MISC", e["start"], e["end"], e["norm"], e["link"])
         for e in row.entities]
    assert [dict(o) for o in back.opinions] == [dict(o) for o in row.opinions]


def test_naf_markables_and_factuality_layers(ray_session, tmp_path):
    """Round-5 interop (VERDICT r4 item 7): the markables and
    factualities layers of a reference-shaped NAF survive ingest
    (kaflib Mark / Factuality; ReadWriteManager parse sections), the
    carried fact_value WINS over the syntactic derivation at extract
    time, and the S6 writer round-trips both layers."""
    from pikes_ray.sources.ingest import read_naf_documents
    from pikes_ray.sources.sinks import write_naf_xml
    from pikes_ray.stages.extract import extract_batch

    naf = """<?xml version="1.0" encoding="UTF-8"?>
<NAF xml:lang="en" version="v3">
 <nafHeader><public publicId="marks"/></nafHeader>
 <raw>Vexatron acquired Blorpex.</raw>
 <text>
  <wf id="w1" offset="0" length="8" sent="1">Vexatron</wf>
  <wf id="w2" offset="9" length="8" sent="1">acquired</wf>
  <wf id="w3" offset="18" length="7" sent="1">Blorpex</wf>
 </text>
 <terms>
  <term id="t1" lemma="Vexatron" pos="R" morphofeat="NNP"><span><target id="w1"/></span></term>
  <term id="t2" lemma="acquire" pos="V" morphofeat="VBD"><span><target id="w2"/></span></term>
  <term id="t3" lemma="Blorpex" pos="R" morphofeat="NNP"><span><target id="w3"/></span></term>
 </terms>
 <deps>
  <dep from="t2" to="t1" rfunc="SBJ"/>
  <dep from="t2" to="t3" rfunc="OBJ"/>
 </deps>
 <entities>
  <entity id="e1" type="ORGANIZATION">
   <references><span><target id="t1"/></span></references>
  </entity>
 </entities>
 <markables>
  <mark id="m1"><span><target id="t3"/></span>
   <externalReferences>
    <externalRef resource="dbpedia" reference="dbr:Blorpex_Corp" confidence="0.88"/>
   </externalReferences>
  </mark>
 </markables>
 <srl>
  <predicate id="pr1"><externalRef resource="PropBank" reference="acquire.01"/>
   <span><target id="t2"/></span>
   <role id="r1" semRole="A0"><span><target id="t1"/></span></role>
   <role id="r2" semRole="A1"><span><target id="t3"/></span></role>
  </predicate>
 </srl>
 <factualities>
  <factuality id="f1"><span><target id="t2"/></span>
   <factVal value="PS-" resource="factbank" confidence="0.8"/>
   <factVal value="CT+" resource="other-model" confidence="0.9"/>
  </factuality>
 </factualities>
</NAF>"""
    p = tmp_path / "marks.naf"
    p.write_text(naf)
    ds = read_naf_documents(str(p))
    df = ds.to_pandas()
    assert len(df) == 1
    row = df.iloc[0]

    # markable with a dbpedia ref → a new linked (named) entity over
    # the term span no entity covered
    blx = next(e for e in row.entities if e["start"] == 2)
    assert (blx["link"], round(blx["link_conf"], 2), blx["named"]) == \
        ("dbr:Blorpex_Corp", 0.88, True)
    # factbank factVal (not the other-model row) carried onto the
    # predicate whose head the span covers
    assert [(pr["head"], pr["sense"], pr["factuality"])
            for pr in row.predicates] == [(1, "acquire.01", "PS-")]

    # the carried value WINS over the syntactic derivation, which
    # would say CT+ here (no negation, no modal)
    tr = ds.map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    fact = tr[tr["pred"] == "ks:factuality"]
    assert (fact["obj"].str.contains("PS-")).any()
    assert not (fact["obj"].str.contains("CT")).any()
    # the markable link is emitted as sameAs
    assert ((tr["pred"] == "owl:sameAs")
            & (tr["obj"] == "dbr:Blorpex_Corp")).any()

    # S6 round trip: write → re-read keeps both layers
    out = str(tmp_path / "naf_rt2")
    n = write_naf_xml(ds, out)
    assert n == 1
    back = read_naf_documents(out).to_pandas().iloc[0]
    assert [(pr["head"], pr["factuality"]) for pr in back.predicates] == \
        [(1, "PS-")]
    blx2 = next(e for e in back.entities if e["start"] == 2)
    assert blx2["link"] == "dbr:Blorpex_Corp"
