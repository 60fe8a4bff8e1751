"""eval-framebase conformance — the reference's SECOND published gold
set (docs/eval-framebase/, src/site/markdown/eval-framebase.md): 8
sentences annotated with FrameBase microframe types
(``frb:frame-<Frame>-<lu>.<pos>``) and frame-element role properties
(``frb:fe-<Frame>-<FE>``), alongside the reference's own output in
three SRL configurations (pikes-semafor / pikes-mate / pikes-both).

This scores OUR F15 FrameBase layer (and, for scorer validation, the
reference's pikes-both output) against that gold with the same
node-alignment machinery as evalpm (Converter/Aligner semantics).

Shape notes, mirrored from the reference:
- gold FE properties are capitalized (``frb:fe-Statement-Speaker``)
  while the system output lowercases them (``fe-statement-speaker``,
  FrameBase.propertyNameFor) — both sides are case-folded here;
- microframe types keep their case; the LU part comes from FrameBase's
  representative-LU clustering (Rouces et al., ESWC 2015 — e.g.
  ``become`` → ``frame-Becoming-get.v``), reproduced for our lexicon's
  vocabulary by ``predicatematrix.FRAMEBASE_LU``;
- gold's ``eval:classifiableAs`` marks type assignments that are
  correct-but-irrelevant: a test type/role on that node in the marked
  frame is not counted as a false positive (Evaluation.java:209-244
  excludes these triples from the comparison).

Driver-side by design: 8 sentences, a conformance harness.
"""

from __future__ import annotations

import os

from pikes_ray.functions.turtle import literal_value, parse_turtle
from pikes_ray.pipelines.evalpm import (
    EvalGraph,
    Sentence,
    _local,
    _PR,
    align,
    our_graph,
)

FB_DIR = "/root/reference/docs/eval-framebase"
_FB_NS = "http://framebase.org/ns/"
_RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_EVAL_CLASSIFIABLE = "eval:schema#classifiableAs"


def _fb_short(iri: str) -> str:
    return "fb:" + iri[len(_FB_NS):] if iri.startswith(_FB_NS) else iri


def _norm_fe(curie: str) -> str:
    """``fb:fe-…`` property → lowercase (gold capitalizes FE names, the
    system output lowercases them)."""
    return curie.lower()


def _frame_of(microframe: str) -> str:
    """``fb:frame-Becoming-get.v`` → ``Becoming``;
    ``fb:fe-statement-speaker`` → ``statement`` (lowercased caller)."""
    body = microframe.split("-", 1)
    if len(body) < 2:
        return microframe
    rest = body[1]
    i = rest.rfind("-")
    return rest[:i] if i > 0 else rest


def load_fb_gold(n: int) -> tuple[str, EvalGraph, dict[str, set[str]]]:
    """→ (sentence text, gold graph, classifiable frames per node).

    Gold nodes are implicit: every ``:local`` term appearing in a
    FrameBase triple; node localnames denote sentence terms exactly as
    in eval-pm (head token, ``_i``-suffixed on repeats)."""
    raw = open(os.path.join(FB_DIR, "gold", f"gold.{n}.ttl")).read()
    # one author glitch (gold.5: '.' for ';' orphans the Recipient
    # line); intent unambiguous, mirrored from the evalpm gold patches
    raw = raw.replace(":weapons .\n    frb:fe-Giving-Recipient",
                      ":weapons ;\n    frb:fe-Giving-Recipient")
    triples = parse_turtle(raw)

    text = base = None
    for s, p, o in triples:
        if p.endswith("label") and o.startswith('"'):
            text = literal_value(o).strip()
            base = s
    assert text is not None
    sent = Sentence(text)

    g = EvalGraph()
    classifiable: dict[str, set[str]] = {}
    fb_triples = []
    for s, p, o in triples:
        if s == base:
            continue
        if p == _EVAL_CLASSIFIABLE or p.endswith("#classifiableAs"):
            classifiable.setdefault(s, set()).add(_frame_of(_fb_short(o)))
            g.nodes.add(s)
            continue
        if p == _RDF_TYPE_IRI and o.startswith(_FB_NS):
            fb_triples.append((s, "rdf:type", _fb_short(o)))
            g.nodes.add(s)
        elif p.startswith(_FB_NS + "fe-"):
            fb_triples.append((s, _norm_fe(_fb_short(p)), o))
            g.nodes.add(s)
            g.nodes.add(o)
    for node in g.nodes:
        g.denoted[node] = sent.term_by_localname(_local(node))
    g.triples = set(fb_triples)
    return text, g, classifiable


def _filter_fb(g: EvalGraph) -> EvalGraph:
    """Keep only the FrameBase layer of a full eval graph (types with
    ``fb:frame-`` objects, ``fb:fe-`` role properties, case-folded),
    plus the ``owl:sameAs`` split links the aligner uses."""
    out = EvalGraph()
    out.nodes = set(g.nodes)
    out.denoted = dict(g.denoted)
    for s, p, o in g.triples:
        if p == "rdf:type" and o.startswith("fb:frame-"):
            out.triples.add((s, p, o))
        elif p.startswith("fb:fe-"):
            out.triples.add((s, _norm_fe(p), o))
        elif p == "owl:sameAs" and o in g.nodes:
            out.triples.add((s, p, o))
    return out


def load_reference_fb(n: int, system: str = "both") -> tuple[str, EvalGraph]:
    """Load the reference's own eval-framebase output (gaf:denotedBy
    offset mentions → sentence terms; FrameBase triples only)."""
    path = os.path.join(FB_DIR, f"pikes-{system}", f"pikes-{system}.{n}.ttl")
    triples = parse_turtle(open(path).read())

    text = None
    for s, p, o in triples:
        if p.endswith("label") and o.startswith('"') and s.endswith(".ttl/"):
            text = literal_value(o).strip()
    if text is None:
        # title-less variant: take the ks:Resource label
        for s, p, o in triples:
            if p.endswith("label") and o.startswith('"'):
                text = literal_value(o).strip()
                break
    # the output files carry no full-text label reliably — fall back to
    # the gold text (same 8 sentences by construction)
    gold_text, _, _ = load_fb_gold(n)
    if not text or len(text) < len(gold_text) * 0.8:
        text = gold_text
    sent = Sentence(text)

    import re as _re

    mentions: dict[str, list] = {}
    for s, p, o in triples:
        if p.endswith("beginIndex"):
            mentions.setdefault(s, [None, None])[0] = int(literal_value(o))
        elif p.endswith("endIndex"):
            mentions.setdefault(s, [None, None])[1] = int(literal_value(o))

    g = EvalGraph()
    for s, p, o in triples:
        if p.endswith("gaf#denotedBy"):
            be = mentions.get(o)
            if not be or be[0] is None or be[1] is None:
                continue
            m = _re.search(r"char=(\d+),(\d+)", o)
            if m:
                be = [int(m.group(1)), int(m.group(2))]
            ts = sent.terms_by_span(be[0], be[1])
            if not ts:
                continue
            g.nodes.add(s)
            g.denoted.setdefault(s, ts[-1])
    for s, p, o in triples:
        if s not in g.nodes:
            continue
        if p == _RDF_TYPE_IRI and o.startswith(_FB_NS + "frame-"):
            g.triples.add((s, "rdf:type", _fb_short(o)))
        elif p.startswith(_FB_NS + "fe-") and o in g.nodes:
            g.triples.add((s, _norm_fe(_fb_short(p)), o))
    return text, g


# --------------------------------------------------------------------------
# scoring
# --------------------------------------------------------------------------

def _eval_fb_sentence(gold: EvalGraph, test: EvalGraph,
                      classifiable: dict[str, set[str]],
                      mapping: dict[str, str], acc: dict[str, _PR]) -> None:
    # types --------------------------------------------------------------
    pr = acc["types (FB)"]
    gold_types = {(s, o) for s, p, o in gold.triples
                  if p == "rdf:type" and o.startswith("fb:frame-")}
    tkeys: dict[tuple, bool] = {}
    for s, p, o in test.triples:
        if p != "rdf:type" or not o.startswith("fb:frame-"):
            continue
        sm = mapping.get(s)
        tkeys[(sm if sm is not None else s, o)] = \
            tkeys.get((sm if sm is not None else s, o), True) and (sm is None)
    for gt in gold_types:
        if gt in tkeys:
            pr.tp += 1
        else:
            pr.fn += 1
    for (ks, ko), extra in tkeys.items():
        if (ks, ko) in gold_types or extra:
            continue
        if _frame_of(ko) in classifiable.get(ks, ()):  # irrelevant, not fp
            continue
        pr.fp += 1

    # roles --------------------------------------------------------------
    pr = acc["roles (FB)"]
    gold_roles = {(s, p, o) for s, p, o in gold.triples
                  if p.startswith("fb:fe-")}
    # NOTE: unlike eval-pm, this gold HAS self-loop FEs (incorporated
    # frame elements: ":forces fb:fe-military-force :forces"), so a
    # test role whose endpoints map to the SAME gold node is kept as a
    # self-loop key instead of being dropped — but only when the gold
    # actually carries a self-loop on that node (a collapsed pair that
    # gold models as two nodes stays excluded, as in eval-pm).
    gold_self = {s for s, p, o in gold_roles if s == o}
    rkeys: dict[tuple, bool] = {}
    for s, p, o in test.triples:
        if not p.startswith("fb:fe-") or o not in test.nodes:
            continue
        sm, om = mapping.get(s), mapping.get(o)
        if sm is not None and om is not None and sm == om \
                and sm not in gold_self:
            continue
        key = (sm if sm is not None else s, p, om if om is not None else o)
        extra = sm is None or om is None
        rkeys[key] = rkeys.get(key, True) and extra
    for gr in gold_roles:
        if gr in rkeys:
            pr.tp += 1
        else:
            pr.fn += 1
    for (ks, kp, ko), extra in rkeys.items():
        if (ks, kp, ko) in gold_roles or extra:
            continue
        if _frame_of(kp) in {f.lower() for f in classifiable.get(ks, ())}:
            continue
        pr.fp += 1


def evaluate_fb(golds, tests, classifiables):
    import pandas as pd

    acc = {"types (FB)": _PR(), "roles (FB)": _PR()}
    for gold, test, cl in zip(golds, tests, classifiables):
        mapping = align(gold, test)
        _eval_fb_sentence(gold, test, cl, mapping, acc)
    trip = _PR()
    for c in acc:
        trip.tp += acc[c].tp
        trip.fp += acc[c].fp
        trip.fn += acc[c].fn
    rows = [{"component": c, **acc[c].asdict()} for c in acc]
    rows.append({"component": "triples", **trip.asdict()})
    return pd.DataFrame(rows)


def gold_fb_graphs():
    texts, golds, cls = [], [], []
    for n in range(1, 9):
        t, g, c = load_fb_gold(n)
        texts.append(t)
        golds.append(g)
        cls.append(c)
    return texts, golds, cls


def evaluate_reference_fb(system: str = "both"):
    """Score the reference's own output — validates this scorer against
    the published eval-framebase tables."""
    _, golds, cls = gold_fb_graphs()
    tests = [load_reference_fb(n, system)[1] for n in range(1, 9)]
    return evaluate_fb(golds, tests, cls)


def evaluate_ours_fb():
    """Run OUR pipeline on the 8 sentences, score the F15 layer."""
    import datetime as dt

    import pyarrow as pa

    from pikes_ray.schema import TRANSCRIPT_SCHEMA
    from pikes_ray.stages.fused import KGStage

    texts, golds, cls = gold_fb_graphs()
    rows = [{"conv_id": "evalfb", "turn_idx": i, "role": "user", "text": t,
             "tool": "", "ts": dt.datetime(2015, 11, 6)}
            for i, t in enumerate(texts)]
    batch = pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA)
    # pinned lexicon: the conformance configuration (see
    # evalpm.evaluate_ours)
    from pikes_ray.functions.lexicon import lexicon_profile

    with lexicon_profile("pinned"):
        stage = KGStage(static_canon=False, local_smush=False,
                        per_mention=True)
        out = stage(batch).to_pandas()

    tests = []
    for i, text in enumerate(texts):
        sub = out[out["turn_idx"] == i]
        g = _filter_fb(our_graph(text, sub))
        # our_graph drops s==o statements (eval-pm gold has none), but
        # this gold models incorporated FEs as self-loops — re-add them
        for s, p, o in zip(sub["subj"], sub["pred"], sub["obj"]):
            if p.startswith("fb:fe-") and s == o and s in g.nodes:
                g.triples.add((s, _norm_fe(p), o))
        tests.append(g)
    return evaluate_fb(golds, tests, cls)
