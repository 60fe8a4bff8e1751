"""T0-T8 — deterministic triple extraction (≙ RDFGenerator.Extractor.run,
pikes-rdf/.../RDFGenerator.java:497-719).

Per-row rewrite of the annotation columns into exploded
``(conv_id, turn_idx, subj, pred, obj, graph, conf)`` triple rows.
All state is document-scoped (the mint table and the head→instance
``annotations`` map, RDFGenerator.java:1780-1786) ⇒ embarrassingly
parallel: one stateless ``map_batches`` task stage.

Step order mirrors the reference: T0 metadata (:721-798), T1 timexes
(:800-873), T2 entities (:875-973), T3 predicates incl. the copular
``be.01`` skip (:531-567, 975-1078), T5 modifiers (:1101-1149),
T6 coreference + coordination (:1151-1259), T7 roles (:1261-1391).
Instance-layer facts go into ``fact:<hash32(s,p,o)>`` named graphs
(vectorized batch hashing; intentional deviation from the reference's
murmur3, see functions/hashing.py::fact_graph_iri)
(:1993-2015); metadata/mention triples into the default graph ("").
Mentions are NIF offset IRIs ``<doc>#char=B,E`` (:1585-1670) linked via
``ks:expressedBy`` (:1834-1857).
"""

from __future__ import annotations

import pyarrow as pa

from pikes_ray.functions import lexicon as lx
from pikes_ray.functions.hashing import text_hash
from pikes_ray.functions.iri import MintTable, doc_iri, entity_iri, mention_iri
from pikes_ray.functions.owltime import timex_triples
from pikes_ray.functions.predicatematrix import enrich, microframe, role_props
from pikes_ray.functions.wordnet import context_synsets, ne_types, noun_types_ctx
from pikes_ray.schema import TRIPLES_SCHEMA

# NER type → class IRI (≙ DEFAULT_TYPE_MAP, RDFGenerator.java:112-126)
TYPE_MAP = {
    "PERSON": "foaf:Person",
    "ORGANIZATION": "foaf:Organization",
    "LOCATION": "sem:Place",
}
_VALUE_TYPES = {"MONEY", "PERCENT", "ORDINAL", "CARDINAL"}
# value-entity type → attribute property (≙ emitEntityAttributes,
# RDFGenerator.java:1520-1582: ks:quantity/rank/percentage, gr:hasCurrency)
_ATTR_PROPS = {
    "PERCENT": ("ks:percentage", "xsd:decimal"),
    "CARDINAL": ("ks:quantity", "xsd:decimal"),
    "ORDINAL": ("ks:rank", "xsd:int"),
}
_SEM_ROLE = {"AM-TMP": "sem:hasTime", "AM-LOC": "sem:hasPlace"}  # A* → sem:hasActor


import re as _re

_PLAIN_DATE_RE = _re.compile(r"^\d{4}(-\d{2}){0,2}$")


def _lit(lex: str, dtype: str | None = None) -> str:
    lex = (lex.replace("\\", "\\\\").replace('"', '\\"')
           .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
    return f'"{lex}"^^{dtype}' if dtype else f'"{lex}"'


def _date_literal(norm: str) -> str:
    if len(norm) == 4:
        return _lit(norm, "xsd:gYear")
    if len(norm) == 7:
        return _lit(norm, "xsd:gYearMonth")
    return _lit(norm, "xsd:date")


def factuality_value(tokens, head: int) -> str:
    """T4 — deterministic FactBank-style value per event
    (≙ processFactuality, RDFGenerator.java:1080-1099: the
    ks:factuality fact; the reference takes the fact_value layer's
    max prediction, we derive it from modality/negation syntax):
    CT+ asserted, CT- negated, PS+ modal-possible, PS- both.
    Module-level so the NAF writer emits the same values
    (sources/sinks.py factualities layer)."""
    neg = False
    modal = False
    sent = tokens[head]["sent"] if tokens else 0
    lo = max(0, head - 3)
    for j in range(lo, min(len(tokens), head + 2)):
        t = tokens[j]
        if t["sent"] != sent or j == head:
            continue
        if t["lemma"] in ("not", "never", "no") and abs(j - head) <= 2:
            neg = True
        if t["morphofeat"] == "MD" and j < head:
            modal = True
    pol = "-" if neg else "+"
    return ("PS" if modal else "CT") + pol


class _DocExtractor:
    """One document's extraction pass (all per-doc state local)."""

    def __init__(self, conv_id: str, turn_idx: int, row: dict,
                 sense_completion: bool = True, per_mention: bool = False,
                 opinion_linking: bool = True):
        self.sense_completion = sense_completion
        # F20 opinionLinking (NAFFilter.java:1485-1519, on by default):
        # when off, T8 emits bare opinion instances without the
        # expression/target/holder instance links
        self.opinion_linking = opinion_linking
        # per_mention: named-entity instances minted per MENTION with
        # owl:sameAs chains (the pre-smush shape of the eval gold:
        # gold.7 syria_1/syria_2 each dbpedia-linked) instead of one
        # label-keyed instance per document
        self.per_mention = per_mention
        self.doc = doc_iri(conv_id, turn_idx)
        self.row = row
        self.mint = MintTable(self.doc)
        self.triples: list[tuple[str, str, str, str, float]] = []
        self.seen: set[tuple[str, str, str]] = set()
        self.inst_of_ent: dict[int, str | None] = {}   # entity idx → instance IRI
        self.inst_of_head: dict[int, str] = {}          # head token → instance IRI
        self._self_insts: dict[int, str] = {}           # pred head → noun instance
        # two-instance nominals: only rolesets that INCORPORATE a
        # mandatory argument split into frame + noun referent (gold:
        # fighters_v/fighters but a single "efforts" node)
        def _mand(head: int) -> bool:
            lemma = row["tokens"][head]["lemma"]
            nb = (lx.noun_frame(lemma) or ("",))[0]
            mand, _opt = lx.NOUN_SELF_ARGS.get(nb, ([], []))
            return bool(mand)
        self.nominal_heads = {p["head"] for p in row["predicates"]
                              if p["source"] == "nominal" and not p["copular"]
                              and _mand(p["head"])}
        self.tokens = row["tokens"]
        # A4 ranked-sense WSD: one context seed per document (the turn
        # is the reference's document unit), reused by every noun lookup
        self.wn_ctx = (context_synsets(t["lemma"] for t in row["tokens"])
                       if sense_completion else frozenset())
        self.entities = row["entities"]
        self.predicates = row["predicates"]
        self.corefs = row["corefs"]
        self.deps = row["deps"]
        # NAF-carried opinions layer (interop path); empty for the
        # native annotator — T8 then falls back to lexicon derivation
        self.opinions = row.get("opinions") or []

    # -- emission helpers --------------------------------------------------

    def meta(self, s: str, p: str, o: str, conf: float = 0.0) -> None:
        if (s, p, o) not in self.seen:        # QuadModel set semantics (E1 within-doc)
            self.seen.add((s, p, o))
            self.triples.append((s, p, o, "", conf))

    def fact(self, s: str, p: str, o: str, conf: float = 0.0) -> None:
        # graph=None is a sentinel: the batch assembler fills all fact
        # graphs in one vectorized fact_graph_column pass (hashing here,
        # per call, measured ~18% of single-core per-turn cost)
        if (s, p, o) not in self.seen:
            self.seen.add((s, p, o))
            self.triples.append((s, p, o, None, conf))

    def surface(self, start: int, end: int) -> str:
        toks = self.tokens[start:end]
        if not toks:
            return ""
        b = toks[0]["offset"]
        e = toks[-1]["offset"] + toks[-1]["length"]
        return self.row["text"][b:e]

    def mention(self, inst: str, start: int, end: int) -> None:
        toks = self.tokens[start:end]
        if not toks:
            return
        b = toks[0]["offset"]
        e = toks[-1]["offset"] + toks[-1]["length"]
        men = mention_iri(self.doc, b, e)
        self.meta(men, "rdf:type", "ks:Mention")
        self.meta(men, "nif:beginIndex", _lit(str(b), "xsd:int"))
        self.meta(men, "nif:endIndex", _lit(str(e), "xsd:int"))
        self.meta(men, "nif:anchorOf", _lit(self.surface(start, end)))
        self.meta(inst, "ks:expressedBy", men)
        self.sense_mention(start, end)

    # -- steps -------------------------------------------------------------

    def t0_metadata(self) -> None:
        d = self.doc
        self.meta(d, "rdf:type", "ks:Resource")
        self.meta(d, "dct:created", _lit(self.row["ts"].isoformat(), "xsd:dateTime"))
        self.meta(d, "ks:textHash", _lit(text_hash(self.row["text"])))
        self.meta(d, "ks:role", _lit(self.row["role"]))
        if self.row["tool"]:
            self.meta(d, "ks:tool", _lit(self.row["tool"]))
        if self.row.get("quarantined"):
            # poison-row channel surfaces in the graph instead of a log
            # (log-and-continue, SURVEY §4): annotation layers are empty
            # but the document row is accounted for
            self.meta(d, "ks:quarantined", _lit("true", "xsd:boolean"))

    def _entity_instance(self, idx: int, ent: dict) -> str | None:
        """T1+T2: instance IRI for an entity; emits its own triples once."""
        if idx in self.inst_of_ent:
            return self.inst_of_ent[idx]
        etype = ent["etype"]
        inst: str | None
        if etype == "DATE":
            parsed = timex_triples(ent["norm"]) if ent["norm"] else None
            if parsed is not None:
                # M16 full OWL-Time shape: DateTimeInterval with
                # component description, or ProperInterval with
                # begin/end boundaries (OWLTime.toRDF, :258-283)
                inst, tts = parsed
                for (s, p, o) in tts:
                    self.fact(s, p, o)
                if _PLAIN_DATE_RE.match(ent["norm"]):
                    self.fact(inst, "rdf:value", _date_literal(ent["norm"]))
            else:
                inst = self.mint.mint(
                    f"e{idx}", self.surface(ent["start"], ent["end"]))
                self.fact(inst, "rdf:type", "time:DateTimeInterval")
        elif etype == "DURATION":
            inst = f"time:duration_{ent['norm'].lower()}" if ent["norm"] else None
            if inst:
                self.fact(inst, "rdf:type", "time:DurationDescription")
                self.fact(inst, "rdf:value", _lit(ent["norm"], "xsd:duration"))
        elif etype in _VALUE_TYPES:
            inst = None   # value entities become attributes (T7 / T5)
        elif ent["named"]:
            label = self.surface(ent["start"], ent["end"])
            if self.per_mention:
                inst = self.mint.mint(f"ne{idx}", label.split()[-1].lower())
            else:
                inst = entity_iri(label)
            self.fact(inst, "rdf:type", "ks:Entity")
            cls = TYPE_MAP.get(etype)
            if cls:
                self.fact(inst, "rdf:type", cls)
            self._sumo_yago_ne(inst, etype)
            self.fact(inst, "foaf:name", _lit(label))
            if ent["link"]:
                self.fact(inst, "owl:sameAs", ent["link"], conf=ent["link_conf"])
        else:
            head = ent["end"] - 1
            tok = self.tokens[head]
            inst = self.mint.mint(f"e{idx}", tok["lemma"])
            self.fact(inst, "rdf:type", "ks:Instance")
            # pronouns are placeholder instances destined to be smushed
            # onto their antecedent — no label transfer (E2)
            if tok["morphofeat"] not in ("PRP", "PRP$", "WP", "WDT"):
                self.fact(inst, "rdfs:label", _lit(tok["lemma"]))
                self._sumo_yago_noun(inst, tok["lemma"])
        if inst is not None:
            self.mention(inst, ent["start"], ent["end"])
            self.inst_of_head.setdefault(ent["end"] - 1, inst)
        self.inst_of_ent[idx] = inst
        return inst

    def t12_entities(self) -> None:
        for idx, ent in enumerate(self.entities):
            self._entity_instance(idx, ent)
        if self.per_mention:
            # per-mention instances of the same linked resource chain
            # via owl:sameAs in document order (gold.7 ":syria_1
            # owl:sameAs :syria_2", each with its own dbpedia link)
            by_res: dict[str, list[str]] = {}
            for idx, ent in enumerate(self.entities):
                inst = self.inst_of_ent.get(idx)
                if inst is not None and ent["named"] and ent["link"]:
                    by_res.setdefault(ent["link"], []).append(inst)
            for insts in by_res.values():
                for a, b in zip(insts, insts[1:]):
                    self.fact(a, "owl:sameAs", b)

    def t3_predicates(self) -> dict[int, str]:
        evt_of_head: dict[int, str] = {}
        self.variant_evts: dict[int, list[str]] = {}
        for p in self.predicates:
            if p["copular"] and not any(
                    r["sem_role"] == "A2" for r in p["roles"]):
                # be.01 suppression (RDFGenerator.java:531-567) — but a
                # copula WITH a predicate-nominal complement surfaces as
                # a be.01 frame in the reference eval gold (gold.5/6
                # ":is a pb:be.01")
                continue
            head = p["head"]
            variant = p.get("variant", 0)
            lemma = self.tokens[head]["lemma"]
            key = f"p{head}" if not variant else f"p{head}x{variant}"
            evt = self.mint.mint(key, lemma)
            if variant:
                self.variant_evts.setdefault(head, []).append(evt)
                self.fact(evt, "rdf:type", "sem:Event")
                if p["sense"]:
                    self.fact(evt, "rdf:type", f"pb:{p['sense']}")
                    vn, fn, eso = enrich(p["sense"])
                    if vn:
                        self.fact(evt, "rdf:type", f"vn:{vn}")
                    if fn:
                        self.fact(evt, "rdf:type", f"fn:{fn}")
                        self.fact(evt, "rdf:type", microframe(fn, lemma, "v"))
                    if eso:
                        self.fact(evt, "rdf:type", f"eso:{eso}")
                self.fact(evt, "rdfs:label", _lit(lemma))
                self.fact(evt, "ks:factuality", _lit("CT-"))
                self.mention(evt, head, head + 1)
                continue
            evt_of_head[head] = evt
            self.inst_of_head.setdefault(head, evt)
            self.fact(evt, "rdf:type", "sem:Event")
            nb_id = ""
            if p["source"] == "semafor":
                # M7 second-source frame that survived the F9 merge
                # (FrameNet-only LU): sense is the bare FN frame name —
                # type the event fn: + FrameBase microframe, no pb:/nb:
                fr = p["sense"]
                self.fact(evt, "rdf:type", f"fn:{fr}")
                pos = ("n" if self.tokens[head]["morphofeat"].startswith("N")
                       else "v")
                self.fact(evt, "rdf:type", microframe(fr, lemma, pos))
                self.fact(evt, "rdfs:label", _lit(lemma))
                self.fact(evt, "ks:factuality",
                          _lit(p.get("factuality") or self._factuality(head)))
                self.mention(evt, head, head + 1)
                continue
            if p["sense"]:
                self.fact(evt, "rdf:type", f"pb:{p['sense']}")
            if p["source"] == "nominal" and lx.noun_frame(lemma) is not None:
                nb_id = lx.noun_frame(lemma)[0]
                self.fact(evt, "rdf:type", f"nb:{nb_id}")
                self._sumo_yago_noun(evt, lemma)
            # M6 PredicateMatrix enrichment: VN class, FN frame, ESO
            # class types (AnnotationPipeline.java:564-725 external
            # refs → RDFGenerator.java:1323-1345 type facts); nominal
            # frames prefer the NomBank row's resources
            if p["source"] == "nominal":
                vn, fn, eso = enrich(nb_id, p["sense"])
            else:
                vn, fn, eso = enrich(p["sense"], nb_id)
            if vn:
                self.fact(evt, "rdf:type", f"vn:{vn}")
            if fn:
                self.fact(evt, "rdf:type", f"fn:{fn}")
                # F15 srlFrameBaseMapping (NAFFilter.java:1310-1460):
                # the FrameBase microframe for this LU —
                # fb:frame-<Frame>-<lemma>.<pos> (docs/eval-pm pikes
                # output shape, e.g. frame-Becoming-get.v)
                pos = "n" if p["source"] == "nominal" else "v"
                self.fact(evt, "rdf:type", microframe(fn, lemma, pos))
                if pos == "n" and head not in self.nominal_heads:
                    from pikes_ray.functions.predicatematrix import \
                        FN_INCORPORATED_FE
                    inc = FN_INCORPORATED_FE.get(fn)
                    if inc:
                        # incorporated FE: self-referential edge
                        self.fact(evt, f"fb:fe-{fn.lower()}-{inc}", evt)
            if eso:
                self.fact(evt, "rdf:type", f"eso:{eso}")
            self.fact(evt, "rdfs:label", _lit(lemma))
            # carried NAF fact_value layer wins over the syntactic
            # re-derivation (round-5 interop; RDFGenerator.java:1080-1099)
            self.fact(evt, "ks:factuality",
                      _lit(p.get("factuality") or self._factuality(head)))
            if p.get("link"):
                # F5-promoted predicate link (NAFFilter.java:739-749 →
                # RDFGenerator external-ref sameAs emission)
                self.fact(evt, "owl:sameAs", p["link"], conf=p["link_conf"])
            self.mention(evt, head, head + 1)
        return evt_of_head

    def _sumo_yago_ne(self, inst: str, etype: str) -> None:
        """F2 typing for named entities: SUMO closure + YAGO class
        (RDFGenerator.java:1323-1345 shape; Sumo.java/YagoTaxonomy.java
        resources pinned in functions/wordnet.py)."""
        if not self.sense_completion:
            return
        sumo, yago = ne_types(etype)
        for c in sumo:
            self.fact(inst, "rdf:type", f"sumo:{c}")
        if yago:
            self.fact(inst, "rdf:type", f"dbyago:{yago}")

    def _sumo_yago_noun(self, inst: str, lemma: str) -> None:
        """F2 typing for common nouns via the mini WordNet first-sense
        map (NAFFilter.java:388-496 termSenseCompletion analogue)."""
        if not self.sense_completion:
            return
        from pikes_ray.functions.predicatematrix import FN_NOUN_TYPES

        _syn, _sst, sumo, yago = noun_types_ctx(lemma, self.wn_ctx)
        for c in sumo:
            self.fact(inst, "rdf:type", f"sumo:{c}")
        if yago:
            self.fact(inst, "rdf:type", f"dbyago:{yago}")
        fnt = FN_NOUN_TYPES.get(lemma)
        if fnt:
            self.fact(inst, "rdf:type", f"fn:{fnt}")

    def sense_mention(self, start: int, end: int) -> None:
        """Attach ks:synset / ks:sst to a mention whose head is a
        mapped noun (the reference puts synsets on mentions —
        docs/eval-pm/pikes/pikes.1.ttl char=22,27)."""
        if not self.sense_completion:
            return
        toks = self.tokens[start:end]
        if not toks:
            return
        # M11: a term sense already normalized onto the token (NAF
        # ingest of an annotator-assigned wn30-ukb/wn30-sst ref or
        # legacy attribute) takes precedence over our lexicon WSD —
        # the reference's RDFGenerator reads exactly those term refs.
        # F1 termSenseFiltering applies to the ingested path (the only
        # path that can carry a sense on a proper noun): WN refs on
        # NNP* heads are dropped (NAFFilter.java:375-386).
        is_proper = toks[-1]["morphofeat"].startswith("NNP")
        syn = (toks[-1].get("synset") or None) if not is_proper else None
        sst = (toks[-1].get("sst") or "") if syn else ""
        if syn is None:
            syn, sst, _sumo, _yago = noun_types_ctx(toks[-1]["lemma"], self.wn_ctx)
        if syn is None:
            return
        b = toks[0]["offset"]
        e = toks[-1]["offset"] + toks[-1]["length"]
        men = mention_iri(self.doc, b, e)
        self.meta(men, "ks:synset", f"wnsyn:{syn}")
        if sst:
            self.meta(men, "ks:sst", f"sst:{sst}")

    def _factuality(self, head: int) -> str:
        return factuality_value(self.tokens, head)

    def t8_opinions(self) -> None:
        """T8 — opinion instances from the pinned polarity lexicon
        (≙ processOpinion, RDFGenerator.java:1393-1467: typed opinion
        node + expression/target/holder links).  The reference reads
        the holder span from the NAF opinion layer (pikes-raid); our
        deterministic analogue recovers it syntactically: the A0
        argument of the nearest governing predicate of the opinion
        expression ("Alice likes X" → holder :alice), matching the
        agentive-subject convention the raid extractor learns.

        When the document CARRIES a NAF opinions layer (interop path —
        ReadWriteManager.java parses expression/holder/target spans),
        the carried annotations win and the lexicon derivation is
        skipped entirely: the reference's own raid output must survive
        a NAF → extract round trip (VERDICT r3 item 4)."""
        if self.opinions:
            self._t8_carried()
            return
        from pikes_ray.ops.text import _SENTIMENT, stem

        parent = {d["to"]: d["frm"] for d in self.deps
                  if d["rfunc"] in ("NMOD", "AMOD")}
        dep_parent = {d["to"]: d["frm"] for d in self.deps}
        a0_of_head: dict[int, int] = {}
        for p in self.predicates:
            for r in p["roles"]:
                if r["sem_role"] == "A0":
                    a0_of_head.setdefault(p["head"], r["head"])
        for i, tok in enumerate(self.tokens):
            score = _SENTIMENT.get(stem(tok["lemma"]))
            if score is None:
                continue
            op = self.mint.mint(f"op{i}", "opinion")
            self.fact(op, "rdf:type", "sumo:Entity")
            self.fact(op, "rdf:type", "ks:Opinion")
            self.fact(op, "rdf:type",
                      "ks:PositiveOpinion" if score > 0 else "ks:NegativeOpinion")
            self.fact(op, "rdfs:label", _lit(tok["lemma"]))
            if not self.opinion_linking:
                continue   # F20 off: bare opinion node only
            expr = self.inst_of_head.get(i)
            if expr is not None:
                self.fact(op, "ks:expression", expr)
            gov = parent.get(i)
            target = self.inst_of_head.get(gov) if gov is not None else None
            if target is not None:
                self.fact(op, "ks:target", target)
            # holder: walk the dep chain up from the expression to the
            # first predicate head carrying an A0 role; the A0's
            # instance (never the opinion's own target) is the holder
            node, holder = i, None
            for _ in range(8):
                a0 = a0_of_head.get(node)
                if a0 is not None:
                    holder = self.inst_of_head.get(a0)
                    break
                nxt = dep_parent.get(node)
                if nxt is None or nxt == node:
                    break
                node = nxt
            if holder is not None and holder not in (target, expr):
                self.fact(op, "ks:holder", holder)

    def _span_instance(self, start: int, end: int) -> str | None:
        """Instance IRI for a carried opinion span: the last span token
        with a minted instance (mirrors the head-token convention of
        inst_of_head — entity/predicate instances register under their
        end-1 head)."""
        if start < 0 or end <= start:
            return None
        for j in range(end - 1, start - 1, -1):
            inst = self.inst_of_head.get(j)
            if inst is not None:
                return inst
        return None

    def _t8_carried(self) -> None:
        """T8 over a NAF-carried opinions layer (≙ processOpinion,
        RDFGenerator.java:1393-1467, fed by the parsed kaflib Opinion
        objects instead of the lexicon scan)."""
        for i, ann in enumerate(self.opinions):
            op = self.mint.mint(f"opc{i}", "opinion")
            self.fact(op, "rdf:type", "sumo:Entity")
            self.fact(op, "rdf:type", "ks:Opinion")
            pol = (ann.get("polarity") or "").lower()
            if pol:
                neg = pol.startswith(("neg", "-"))
                self.fact(op, "rdf:type",
                          "ks:NegativeOpinion" if neg else "ks:PositiveOpinion")
            es, ee = ann["expr_start"], ann["expr_end"]
            if 0 <= es < ee <= len(self.tokens):
                label = self.surface(es, ee)
                if label:
                    self.fact(op, "rdfs:label", _lit(label))
            if not self.opinion_linking:
                continue   # F20 off: bare opinion node only
            expr = self._span_instance(es, ee)
            if expr is not None:
                self.fact(op, "ks:expression", expr)
            target = self._span_instance(ann["target_start"],
                                         ann["target_end"])
            if target is not None:
                self.fact(op, "ks:target", target)
            holder = self._span_instance(ann["holder_start"],
                                         ann["holder_end"])
            if holder is not None and holder not in (target, expr):
                self.fact(op, "ks:holder", holder)

    def _self_arg_instance(self, head: int) -> str:
        key = f"selfarg{head}"
        inst = self._self_insts.get(head)
        if inst is None:
            lemma = self.tokens[head]["lemma"]
            inst = self.mint.mint(key, lemma)
            self._self_insts[head] = inst
            self.fact(inst, "rdf:type", "ks:Instance")
            self.fact(inst, "rdfs:label", _lit(lemma))
            self.mention(inst, head, head + 1)
        return inst

    def _resolve_span(self, start: int, end: int, head: int):
        """→ ("inst", iri) | ("value", ent) | (None, None).

        The entity containing the HEAD token wins; only if none exists
        does a span-contained entity qualify (a subtree span may cover
        several one-token entities — "a viable alternative government"
        must resolve to the head "government", not "alternative")."""
        for idx, ent in enumerate(self.entities):
            if ent["start"] <= head < ent["end"]:
                if ent["etype"] in _VALUE_TYPES:
                    return "value", ent
                inst = self._entity_instance(idx, ent)
                if inst is not None:
                    return "inst", inst
        # the span HEAD's own instance (predicate frames included) wins
        # over span-contained entities: "the lone Syrian rebel group"
        # resolves to the group frame, not the contained "rebel"
        inst = self.inst_of_head.get(head)
        if inst is not None:
            return "inst", inst
        for idx, ent in enumerate(self.entities):
            if ent["start"] >= start and ent["end"] <= end:
                if ent["etype"] in _VALUE_TYPES:
                    return "value", ent
                inst = self._entity_instance(idx, ent)
                if inst is not None:
                    return "inst", inst
        return None, None

    def t7_roles(self, evt_of_head: dict[int, str]) -> None:
        nominal_heads = self.nominal_heads
        # coordination partners: a role filled by one conjunct also
        # holds for the other ("to the United States and other
        # countries that want…" — gold distributes the role to both)
        conj_of_cc = {d["frm"]: d["to"] for d in self.deps if d["rfunc"] == "CONJ"}
        coord_partner: dict[int, int] = {}
        for d in self.deps:
            if d["rfunc"] == "COORD":
                right = conj_of_cc.get(d["to"])
                if right is not None:
                    coord_partner[d["frm"]] = right
                    coord_partner[right] = d["frm"]
        for p in self.predicates:
            variant = p.get("variant", 0)
            if variant:
                evts = self.variant_evts.get(p["head"], [])
                evt = evts[variant - 1] if len(evts) >= variant else None
            else:
                evt = evt_of_head.get(p["head"])
            if evt is None:
                continue
            sense = p["sense"]
            nb_id = ""
            if p["source"] == "nominal":
                lemma = self.tokens[p["head"]]["lemma"]
                nb_id = (lx.noun_frame(lemma) or ("",))[0]
            for r in p["roles"]:
                sem_role = r["sem_role"]
                models = r.get("models", "")
                fn_override = r.get("fn_role", "")
                if sem_role == "NEG":
                    # negation marker: pb:neg → a minted "not" instance
                    # (gold.1 ":support_1 pb:neg :not")
                    ni = r["head"]
                    inst = self.inst_of_head.get(ni)
                    if inst is None:
                        inst = self.mint.mint(f"neg{ni}",
                                              self.tokens[ni]["lemma"])
                        self.inst_of_head[ni] = inst
                        self.fact(inst, "rdf:type", "ks:Instance")
                        self.fact(inst, "rdfs:label",
                                  _lit(self.tokens[ni]["lemma"]))
                        self.mention(inst, ni, ni + 1)
                    if sense:
                        self.fact(evt, f"pb:{sense}-neg", inst)
                    continue
                kind, arg = self._resolve_span(r["start"], r["end"], r["head"])
                self_arg = False
                if kind == "inst" and arg == evt and r["head"] == p["head"]:
                    # incorporated self-arg (F13): the reference models a
                    # nominal frame as TWO instances — the frame and the
                    # noun referent it incorporates (gold eval graphs:
                    # :donors_v nb:a0 :donors, both on the same term) —
                    # so the role points at a separate noun instance
                    arg = self._self_arg_instance(p["head"])
                    self_arg = True
                elif kind == "inst" and r["head"] in nominal_heads \
                        and r["head"] != p["head"]:
                    # a role filled by a nominal-frame head denotes the
                    # noun referent, not the frame ("say A0 officials",
                    # not "say A0 officials_v")
                    arg = self._self_arg_instance(r["head"])
                if kind == "value":
                    ent = arg
                    if ent["etype"] == "MONEY" and ent["norm"]:
                        cur, _, amount = ent["norm"].partition(":")
                        self.fact(evt, "gr:hasCurrencyValue", _lit(amount, "xsd:decimal"))
                        self.fact(evt, "gr:hasCurrency", _lit(cur))
                    elif ent["etype"] in _ATTR_PROPS and ent["norm"]:
                        prop, dt = _ATTR_PROPS[ent["etype"]]
                        self.fact(evt, prop, _lit(ent["norm"], dt))
                    continue
                if kind != "inst":
                    h2 = r["head"]
                    if h2 < len(self.tokens) \
                            and self.tokens[h2]["morphofeat"] == "JJ":
                        # predicative adjective filler ("making it
                        # illegal") — mint the quality instance
                        arg = self.mint.mint(f"attr{h2}",
                                             self.tokens[h2]["lemma"])
                        self.inst_of_head[h2] = arg
                        self.fact(arg, "rdf:type", "ks:Attribute")
                        self.fact(arg, "rdfs:label",
                                  _lit(self.tokens[h2]["lemma"]))
                        self.mention(arg, h2, h2 + 1)
                        kind = "inst"
                    else:
                        continue
                args = [arg]
                partner = coord_partner.get(r["head"])
                if partner is not None:
                    # NP coordination only: a verb between the conjunct
                    # heads means VP coordination ("gather X and
                    # attract Y") where each object belongs to its own
                    # predicate
                    lo, hi = sorted((r["head"], partner))
                    if any(self.tokens[k]["morphofeat"].startswith("VB")
                           for k in range(lo + 1, hi)):
                        partner = None
                if partner is not None and not self_arg:
                    pk, parg = self._resolve_span(partner, partner + 1, partner)
                    if pk == "inst" and partner in nominal_heads:
                        parg = self._self_arg_instance(partner)
                    if pk == "inst" and parg not in (evt, arg):
                        args.append(parg)
                # clause roles pointing at a head with coordination-split
                # variant frames hold for every variant ("want to
                # support X but not Y" → want.A1 = both support frames)
                clause_variants = []
                if kind == "inst" and arg == self.inst_of_head.get(r["head"]) \
                        and r["head"] in self.variant_evts \
                        and r["head"] != p["head"]:
                    clause_variants = self.variant_evts[r["head"]]
                for arg in args:
                    emit_to = [arg] + [v for v in clause_variants if v != arg]
                    if arg != evt and sem_role not in ("AM-MNR", "MOD"):
                        # sem-layer participation is for distinct
                        # participants; a NomBank incorporated self-arg
                        # (F13) keeps only its roleset-specific edge
                        # below, and manner modifiers have no sem: prop
                        prop = _SEM_ROLE.get(sem_role)
                        if prop is None:
                            prop = "sem:hasTime" if str(arg).startswith("time:") else "sem:hasActor"
                        for a2 in emit_to:
                            self.fact(evt, prop, a2)
                    if not (sem_role.startswith("A") or sem_role == "MOD"):
                        continue
                    suffix = sem_role.lower().replace("-", "")
                    remap = lx.NB_PB_NUM_REMAP.get(nb_id, {})
                    pb_suffix = suffix
                    if nb_id and len(suffix) == 2 and suffix[1].isdigit():
                        # the two models may number the argument
                        # differently (lexicon.NB_PB_NUM_REMAP)
                        num = remap.get(int(suffix[1]))
                        if num is not None:
                            pb_suffix = f"a{num}"
                    for a2 in emit_to:
                        if sense and models == "" and sem_role != "MOD":
                            self.fact(evt, f"pb:{sense}-{pb_suffix}", a2)
                        if nb_id and models != "vnfn":
                            # nominal predicates carry the role in the
                            # NomBank model too (RDFGenerator role props
                            # per predicate model)
                            self.fact(evt, f"nb:{nb_id}-{suffix}", a2)
                        # M6: VN / FN role properties from the
                        # PredicateMatrix ``sense@arg`` rows; an "nb"
                        # models restriction keeps the role out of the
                        # PB/VN projections and only an explicit
                        # fn_role hint reaches FrameNet
                        if nb_id:
                            vn_r, fn_r = role_props(sem_role, nb_id, sense)
                        else:
                            vn_r, fn_r = role_props(sem_role, sense)
                        if models == "nb":
                            vn_r = None
                        if models == "vnfn":
                            pass          # vn/fn only (pb/nb suppressed above)
                        if fn_override == "-":
                            fn_r = None
                        elif fn_override:
                            fn_r = fn_override
                        if vn_r:
                            self.fact(evt, f"vn:{vn_r}", a2)
                        if fn_r:
                            self.fact(evt, f"fn:{fn_r}", a2)
                            # F15: FrameBase frame-element property
                            # fb:fe-<frame>-<role> (both lowercased in
                            # the reference's output)
                            _vn, fn_frame, _eso = enrich(sense, nb_id)
                            if fn_frame:
                                from pikes_ray.functions.predicatematrix \
                                    import FRAMEBASE_FE
                                r_ = fn_r.lower()
                                fe = (FRAMEBASE_FE.get((nb_id, r_))
                                      or FRAMEBASE_FE.get((sense, r_))
                                      or r_)
                                self.fact(
                                    evt,
                                    f"fb:fe-{fn_frame.lower()}-{fe}",
                                    a2)

    def t5_modifiers(self) -> None:
        """Adjective modifiers of instance heads → ``attr:`` quality
        instances linked via ks:mod — the MODIFIER_REGEX dep-descendant
        walk (RDFGenerator.java:1101-1149), with the reference's
        attribute-node shape (its output links ks:mod to minted
        ``attr:`` instances with their own mentions — cf.
        docs/eval-pm/pikes/pikes.1.ttl ``<attr:blunt-4a>``)."""
        from pikes_ray.functions.deppath import DepGraph

        dg = DepGraph(self.deps, len(self.tokens))
        adv_of_adj = {d["frm"]: d["to"] for d in self.deps if d["rfunc"] == "AMOD"}
        from pikes_ray.functions.predicatematrix import (
            FN_NOUN_MOD_ROLE, FN_NOUN_TYPES)

        # a compound premodifier that is itself a roleset noun is a
        # quality of the head noun's referent, not a role filler
        # ("contributed veteran fighters" → fighters hasQuality veteran)
        premod_q = {}
        for d in self.deps:
            if d["rfunc"] != "NMOD":
                continue
            g, m = d["frm"], d["to"]
            if g in self.nominal_heads and m == g - 1 \
                    and self.tokens[m]["morphofeat"] in ("NN", "NNS") \
                    and lx.noun_frame(self.tokens[m]["lemma"]) is not None:
                premod_q[g] = m
        for g, m in premod_q.items():
            gi = self._self_arg_instance(g)
            mi = self.inst_of_head.get(m)
            if mi is not None and m in self.nominal_heads:
                mi = self._self_arg_instance(m)
            if mi is not None:
                self.fact(gi, "ks:mod", mi)

        # a demonym absorbed into a LINKED name span stays a separate
        # quality of the entity referent (gold.8 ":opposition
        # dul:associatedWith :syrian" for dbpedia-linked "the Syrian
        # opposition"); a demonym premodifying an unlinked nominal
        # fills a role instead (gold.1/6 — the DEMONYM_ADJ machinery
        # in T7), so the link is the discriminator
        for d in self.deps:
            if d["rfunc"] != "NMOD":
                continue
            g, m = d["frm"], d["to"]
            if m != g - 1 or self.tokens[m]["lemma"] not in lx.DEMONYM_ADJ:
                continue
            if self.tokens[m]["morphofeat"] not in ("NNP", "NNPS"):
                continue
            if not any(e.get("named") and e.get("link")
                       and e["start"] <= m and g < e["end"]
                       for e in self.entities):
                continue
            inst = self.inst_of_head.get(g)
            if inst is None:
                continue
            if g in self.nominal_heads:
                inst = self._self_arg_instance(g)
            attr = self.inst_of_head.get(m)
            if attr is None:
                attr = self.mint.mint(f"attr{m}", self.tokens[m]["lemma"])
                self.inst_of_head.setdefault(m, attr)
                self.fact(attr, "rdf:type", "ks:Attribute")
                self.fact(attr, "rdfs:label", _lit(self.tokens[m]["lemma"]))
                self.mention(attr, m, m + 1)
            self.fact(inst, "ks:mod", attr)

        for head, inst in sorted(self.inst_of_head.items()):
            adjs = [
                t for t in dg.terms_by_dep_descendants({head}, "(NMOD|AMOD)")
                if self.tokens[t]["morphofeat"] == "JJ"
                and self.tokens[t]["lemma"] not in ("more", "most")
            ]
            # adverbial postmodifier quality ("donors abroad")
            if head + 1 < len(self.tokens) \
                    and self.tokens[head + 1]["lemma"] == "abroad":
                adjs.append(head + 1)
            if head in self.nominal_heads:
                # qualities sit on the noun referent of a two-instance
                # nominal (gold ":fighters dul:hasQuality :veteran")
                inst = self._self_arg_instance(head)
            for adj in sorted(adjs):
                attr = self.inst_of_head.get(adj)
                if attr is None or adj in self.nominal_heads:
                    attr = self.mint.mint(f"attr{adj}", self.tokens[adj]["lemma"])
                    self.inst_of_head.setdefault(adj, attr)
                    self.fact(attr, "rdf:type", "ks:Attribute")
                    fnt = FN_NOUN_TYPES.get(self.tokens[adj]["lemma"])
                    if fnt and self.sense_completion:
                        self.fact(attr, "rdf:type", f"fn:{fnt}")
                        # F15 on quality attributes too (gold ":other a
                        # frb:frame-Increment-other.a")
                        self.fact(attr, "rdf:type",
                                  microframe(fnt,
                                             self.tokens[adj]["lemma"], "a"))
                    if self.tokens[adj]["lemma"] == "other":
                        # the Increment frame's added-set FE points back
                        # at the modified NP (gold ":other fn:added_set
                        # :countries"); eval-framebase gold carries the
                        # FrameBase projections of the same FEs
                        # fn:class deliberately not emitted: the gold
                        # is inconsistent (gold.1 has it, gold.3 omits
                        # it for the same "other X" construction) —
                        # emitting it trades the gold.1 FN for a
                        # gold.3 FP at identical F1
                        self.fact(attr, "fn:added_set", inst)
                        self.fact(attr, "fb:fe-increment-added_set", inst)
                        self.fact(attr, "fb:fe-increment-class", inst)
                    value = self.tokens[adj]["lemma"]
                    adv = adv_of_adj.get(adj)
                    if adv is not None:
                        value = f"{self.tokens[adv]['lemma']} {value}"
                    self.fact(attr, "rdfs:label", _lit(value))
                    self.mention(attr, adj, adj + 1)
                self.fact(inst, "ks:mod", attr)
                fnr = FN_NOUN_MOD_ROLE.get(self.tokens[head]["lemma"])
                if fnr and self.sense_completion:
                    self.fact(inst, f"fn:{fnr}", attr)

    def t6_coref_and_coordination(self) -> None:
        # coref clusters → consecutive owl:sameAs, ordered by position
        # (RDFGenerator.java:1243-1258)
        for cluster in self.corefs:
            insts = []
            for span in sorted(cluster, key=lambda s: s["start"]):
                head = span["end"] - 1
                kind, inst = self._resolve_span(span["start"], span["end"], head)
                if kind == "inst" and head in self.nominal_heads:
                    # coreference targets the noun referent, not the
                    # nominal frame (two-instance model, cf. t7_roles)
                    inst = self._self_arg_instance(head)
                if kind == "inst" and inst not in insts:
                    insts.append(inst)
            for a, b in zip(insts, insts[1:]):
                self.fact(a, "owl:sameAs", b)
        # coordination → composite instance + ks:include (:1193-1240)
        conj_of_cc = {d["frm"]: d["to"] for d in self.deps if d["rfunc"] == "CONJ"}
        for d in self.deps:
            if d["rfunc"] != "COORD":
                continue
            left, cc = d["frm"], d["to"]
            right = conj_of_cc.get(cc)
            if right is None:
                continue
            li = self.inst_of_head.get(left)
            ri = self.inst_of_head.get(right)
            if li is None or ri is None:
                continue
            comp = self.mint.mint(f"coord{left}_{right}", "coordination")
            self.fact(comp, "rdf:type", "ks:Composition")
            self.fact(comp, "ks:include", li)
            self.fact(comp, "ks:include", ri)

    def run(self) -> list[tuple[str, str, str, str, float]]:
        self.t0_metadata()
        if self.tokens:
            self.t12_entities()
            evt = self.t3_predicates()
            # T5 before T7: modifier ``attr:`` instances register in
            # inst_of_head so AM-MNR roles can resolve to them
            self.t5_modifiers()
            self.t7_roles(evt)
            self.t6_coref_and_coordination()
            self.t8_opinions()
        return self.triples


def fill_fact_graphs(subjs: list, preds: list, objs: list,
                     graphs: list) -> list:
    """Replace ``None`` graph sentinels (fact rows) with vectorized
    ``fact:`` hash IRIs; meta rows ("" graph) pass through."""
    from operator import itemgetter

    from pikes_ray.functions.hashing import fact_graph_column

    need = [i for i, g in enumerate(graphs) if g is None]
    if not need:
        return graphs
    getter = itemgetter(*need)
    if len(need) == 1:
        sub_s, sub_p, sub_o = [getter(subjs)], [getter(preds)], [getter(objs)]
    else:
        sub_s, sub_p, sub_o = getter(subjs), getter(preds), getter(objs)
    hashes = fact_graph_column(list(sub_s), list(sub_p), list(sub_o))
    it = iter(hashes)
    return [g if g is not None else next(it) for g in graphs]


def extract_batch(batch: pa.Table, per_mention: bool = False,
                  opinion_linking: bool = True) -> pa.Table:
    """Stateless map_batches fn: annotated rows → exploded triple rows."""
    rows = batch.to_pylist()
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    subjs: list[str] = []
    preds: list[str] = []
    objs: list[str] = []
    graphs: list[str] = []
    confs: list[float] = []
    for row in rows:
        ex = _DocExtractor(row["conv_id"], row["turn_idx"], row,
                           per_mention=per_mention,
                           opinion_linking=opinion_linking)
        for (s, p, o, g, c) in ex.run():
            conv_ids.append(row["conv_id"])
            turn_idxs.append(row["turn_idx"])
            subjs.append(s)
            preds.append(p)
            objs.append(o)
            graphs.append(g)
            confs.append(c)
    graphs = fill_fact_graphs(subjs, preds, objs, graphs)
    return pa.Table.from_pydict(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idxs,
            "subj": subjs,
            "pred": preds,
            "obj": objs,
            "graph": graphs,
            "conf": confs,
        },
        schema=TRIPLES_SCHEMA,
    )
