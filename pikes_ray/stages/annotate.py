"""A1-A5 — the deterministic annotator actor stage.

One callable class = one Ray Data actor pool: the pinned lexical
resources (gazetteer trie, verb-form tables, compiled regexes — the
analogue of the reference's CoreNLP/Mate/Semafor/UKB model load in
AnnotationPipeline.loadModels, AnnotationPipeline.java:124-166) are
built ONCE per actor in ``__init__``; ``__call__`` annotates a pyarrow
batch and appends the nested annotation columns (SURVEY §1.4).

The linguistic pipeline is a deterministic rule system covering the
same layer outputs as the reference chain
(tokenize, ssplit, pos, lemma, ner, parse-lite, SRL, coref, linking —
Defaults.java:86):

- tokenize + ssplit + POS + lemma          (≙ A1, M2)
- gazetteer NER + value entities (BIO-merge semantics ≙ M3,
  AnnotationPipeline.java:407-520: DATE/DURATION → timex-like entities,
  MONEY/PERCENT/ORDINAL/CARDINAL → value entities)
- NP-chunk dependency approximation        (≙ M4)
- PropBank/NomBank SRL with positional roles (≙ M5/M7,
  AnnotationPipeline.java:522-899)
- pronoun coreference                      (≙ A5/M9, dcoref sieve)
- alias-dictionary entity linking          (≙ A3/M10, Spotlight-style)

Determinism: no learned weights, no randomness — required for the
reproducible per-turn outputs the conformance gate needs (SURVEY §2.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

from pikes_ray.functions import lexicon as lx
from pikes_ray.functions.numbers import (
    duration_iso,
    fmt_num,
    month_number,
    normalize_date,
    parse_number_words,
    parse_ordinal,
)
from pikes_ray.schema import (
    COREF_T,
    DEP_T,
    ENTITY_T,
    PRED_T,
    TOKEN_T,
)
from pikes_ray.stages.normalize import normalize_batch

_TOKEN_RE = re.compile(
    r"\d{4}-\d{2}(?:-\d{2})?"              # ISO (partial) dates stay one token
    r"|\d+(?:,\d{3})*(?:\.\d+)?"            # numbers (thousands groups)
    r"|[^\W\d_]+(?:[-'][^\W\d_]+)*"         # words incl. hyphen/apostrophe compounds
    r"|\S",                                  # any other symbol
    re.UNICODE,
)
_ISO_DATE_RE = re.compile(r"^(\d{4})-(\d{2})(?:-(\d{2}))?$")
_NUM_RE = re.compile(r"^\d+(?:,\d{3})*(?:\.\d+)?$")

_SENT_END = {".", "!", "?"}
_NOUNISH = {"NN", "NNS", "NNP", "NNPS", "PRP", "CD"}
_VALUE_TYPES = {"MONEY", "PERCENT", "ORDINAL", "CARDINAL"}


def _build_verb_forms() -> dict[str, tuple[str, str]]:
    """form → (lemma, Penn tag) for every lemma in the verb lexicon."""
    forms: dict[str, tuple[str, str]] = {}
    for lemma in lx.VERB_FRAMES:
        forms.setdefault(lemma, (lemma, "VB"))
        if lemma.endswith(("s", "x", "ch", "sh", "o")):
            forms.setdefault(lemma + "es", (lemma, "VBZ"))
        elif lemma.endswith("y") and lemma[-2] not in "aeiou":
            forms.setdefault(lemma[:-1] + "ies", (lemma, "VBZ"))
        else:
            forms.setdefault(lemma + "s", (lemma, "VBZ"))
        if lemma.endswith("e"):
            forms.setdefault(lemma + "d", (lemma, "VBD"))
            forms.setdefault(lemma[:-1] + "ing", (lemma, "VBG"))
        elif lemma.endswith("y") and lemma[-2] not in "aeiou":
            forms.setdefault(lemma[:-1] + "ied", (lemma, "VBD"))
            forms.setdefault(lemma + "ing", (lemma, "VBG"))
        else:
            forms.setdefault(lemma + "ed", (lemma, "VBD"))
            forms.setdefault(lemma + "ing", (lemma, "VBG"))
            # CVC consonant doubling: run→running, plan→planned
            if (len(lemma) >= 3 and lemma[-1] not in "aeiouwxy"
                    and lemma[-2] in "aeiou" and lemma[-3] not in "aeiou"):
                forms.setdefault(lemma + lemma[-1] + "ing", (lemma, "VBG"))
                forms.setdefault(lemma + lemma[-1] + "ed", (lemma, "VBD"))
    for form, lemma in lx.IRREGULAR_LEMMA.items():
        tag = "VBZ" if form.endswith("s") else "VBD"
        if form in ("is", "are"):
            tag = "VBZ"
        forms[form] = (lemma, tag)
    return forms


@dataclass(slots=True)
class Tok:
    form: str
    offset: int
    length: int
    sent: int
    pos: str = "O"          # coarse code (Term.java pos codes)
    morphofeat: str = ""    # Penn tag
    lemma: str = ""


@dataclass(slots=True)
class Ent:
    etype: str
    start: int
    end: int
    named: bool = False
    link: str = ""
    link_conf: float = 0.0
    norm: str = ""


@dataclass(slots=True)
class Pred:
    head: int
    sense: str
    source: str
    copular: bool = False
    roles: list = field(default_factory=list)   # (sem_role, start, end, head)


_COARSE = {  # Penn → Term.java coarse pos code
    "NN": "N", "NNS": "N", "NNP": "R", "NNPS": "R", "PRP": "Q", "PRP$": "Q",
    "VB": "V", "VBD": "V", "VBZ": "V", "VBG": "V", "VBN": "V",
    "JJ": "G", "RB": "A", "CD": "O", "DT": "D", "IN": "P", "CC": "C",
}


class RuleAnnotator:
    """The pinned deterministic model.  Build once, call per text."""

    def __init__(self) -> None:
        self.verb_forms = _build_verb_forms()
        # gazetteer keyed by first token form → [(form_tuple, type, res, conf)]
        self.gaz: dict[str, list[tuple[tuple[str, ...], str, str, float]]] = {}
        for surface, (etype, res, conf) in lx.GAZETTEER.items():
            parts = tuple(surface.split(" "))
            self.gaz.setdefault(parts[0], []).append((parts, etype, res, conf))
        for v in self.gaz.values():
            v.sort(key=lambda e: -len(e[0]))   # longest match first

    # --- tokenize + ssplit + POS + lemma (A1) ------------------------------

    def tokenize(self, text: str) -> list[Tok]:
        toks: list[Tok] = []
        sent = 0
        for m in _TOKEN_RE.finditer(text):
            toks.append(Tok(m.group(0), m.start(), len(m.group(0)), sent))
            if m.group(0) in _SENT_END:
                sent += 1
        return toks

    def tag(self, toks: list[Tok]) -> None:
        prev = ""
        for i, t in enumerate(toks):
            f, low = t.form, t.form.lower()
            # sentence-initial capitalization is not evidence of a
            # proper noun — decap unless the surface starts a known
            # gazetteer name ("Alice Johnson met…" stays NNP)
            sent_initial = i == 0 or toks[i - 1].sent != t.sent
            if sent_initial and f[0].isupper() and f not in self.gaz:
                f = low
            if _NUM_RE.match(f) or _ISO_DATE_RE.match(f):
                tag, lemma = "CD", f
            elif low in ("this", "that", "these", "those") and i + 1 < len(toks) \
                    and toks[i + 1].form.lower() in self.verb_forms:
                # demonstrative directly before a verb is pronominal
                # ("This is a simple way …")
                tag, lemma = "PRP", low
            elif low in lx.CLOSED_CLASS:
                tag, lemma = lx.CLOSED_CLASS[low], low
            elif low in self.verb_forms and not f[0].isupper() \
                    and prev not in ("DT", "JJ", "PRP$"):
                # verb reading loses after a determiner/adjective/poss
                # ("the report", "annual report") — noun context
                lemma, tag = self.verb_forms[low]
            elif low in lx.NUMBER_WORDS or low in lx.ORDINAL_WORDS:
                tag, lemma = "CD", low
            elif low in lx.MONTHS:
                tag, lemma = "NNP", f
            elif f[0].isupper() and low not in lx.ADJECTIVES:
                tag, lemma = "NNP", f
            elif low in lx.ADJECTIVES:
                tag, lemma = "JJ", low
            elif low in lx.NOUN_FRAMES:
                # known nominal roleset beats the -al suffix heuristic
                # ("approval", "arrival" are nouns, not adjectives)
                tag, lemma = "NN", low
            elif low.endswith("al") and len(low) > 4:
                tag, lemma = "JJ", low
            elif low.endswith("ly") and len(low) > 3:
                tag, lemma = "RB", low
            elif not f[0].isalnum():
                tag, lemma = f, f
            elif low in lx.IRREGULAR_PLURAL:
                tag, lemma = "NNS", lx.IRREGULAR_PLURAL[low]
            elif low.endswith("ies") and len(low) > 4:
                tag, lemma = "NNS", low[:-3] + "y"
            elif low.endswith("s") and not low.endswith("ss") and len(low) > 3:
                tag, lemma = "NNS", low[:-1]
            else:
                tag, lemma = "NN", low
            t.morphofeat, t.lemma = tag, lemma
            t.pos = _COARSE.get(tag, "O")
            prev = tag

    # --- NER: gazetteer + value entities (M3 BIO-merge analogue) ----------

    def ner(self, toks: list[Tok]) -> list[Ent]:
        ents: list[Ent] = []
        taken = [False] * len(toks)
        i = 0
        while i < len(toks):
            cands = self.gaz.get(toks[i].form)
            matched = False
            if cands:
                for parts, etype, res, conf in cands:
                    j = i + len(parts)
                    if j <= len(toks) and tuple(t.form for t in toks[i:j]) == parts \
                            and toks[j - 1].sent == toks[i].sent:
                        ents.append(Ent(etype, i, j, named=True,
                                        link=f"dbr:{res}", link_conf=conf))
                        for k in range(i, j):
                            taken[k] = True
                            toks[k].morphofeat, toks[k].pos = "NNP", "R"
                        i = j
                        matched = True
                        break
            if not matched:
                i += 1
        ents.extend(self._value_entities(toks, taken))
        ents.sort(key=lambda e: e.start)
        return ents

    def _value_entities(self, toks: list[Tok], taken: list[bool]) -> list[Ent]:
        out: list[Ent] = []
        n = len(toks)
        i = 0
        while i < n:
            if taken[i]:
                i += 1
                continue
            f, low = toks[i].form, toks[i].form.lower()
            # ISO date token
            m = _ISO_DATE_RE.match(f)
            if m:
                y, mo, d = int(m.group(1)), int(m.group(2)), m.group(3)
                out.append(Ent("DATE", i, i + 1,
                               norm=normalize_date(mo, int(d) if d else None, y)))
                i += 1
                continue
            # decade: "1990" + adjacent "s" ("the 1990s" → 199X)
            if _NUM_RE.match(f) and len(f) == 4 and i + 1 < n \
                    and toks[i + 1].form == "s" \
                    and toks[i + 1].offset == toks[i].offset + 4:
                out.append(Ent("DATE", i, i + 2, norm=f"{f[:3]}X"))
                i += 2
                continue
            # century: "19" + "th" + "century" → 18XX
            if _NUM_RE.match(f) and len(f) <= 2 and i + 2 < n \
                    and toks[i + 1].form in ("th", "st", "nd", "rd") \
                    and toks[i + 2].form.lower() == "century":
                c = int(f) - 1
                out.append(Ent("DATE", i, i + 3, norm=f"{c:02d}XX"))
                i += 3
                continue
            # season [of] YYYY: "summer of 1999" → 1999-SU
            if low in lx.SEASON_WORDS:
                j = i + 1
                if j < n and toks[j].form.lower() == "of":
                    j += 1
                if j < n and _NUM_RE.match(toks[j].form) and len(toks[j].form) == 4:
                    out.append(Ent("DATE", i, j + 1,
                                   norm=f"{toks[j].form}-{lx.SEASON_WORDS[low]}"))
                    i = j + 1
                    continue
            # clock time: "15" ":" "30" → T15:30
            if _NUM_RE.match(f) and len(f) <= 2 and i + 2 < n \
                    and toks[i + 1].form == ":" \
                    and _NUM_RE.match(toks[i + 2].form) and len(toks[i + 2].form) == 2 \
                    and int(f) < 24:
                h, mm = int(f), toks[i + 2].form
                j = i + 3
                if j < n and toks[j].form.lower() in ("pm", "am"):
                    if toks[j].form.lower() == "pm" and h < 12:
                        h += 12
                    j += 1
                out.append(Ent("DATE", i, j, norm=f"T{h:02d}:{mm}"))
                i = j
                continue
            # Month [D ,] [YYYY]
            mon = month_number(low)
            if mon and f[0].isupper():
                j, day, year = i + 1, None, None
                if j < n and _NUM_RE.match(toks[j].form) and len(toks[j].form) <= 2:
                    day = int(toks[j].form)
                    j += 1
                    if j < n and toks[j].form == ",":
                        j += 1
                if j < n and _NUM_RE.match(toks[j].form) and len(toks[j].form) == 4:
                    year = int(toks[j].form)
                    j += 1
                if year is not None:
                    out.append(Ent("DATE", i, j, norm=normalize_date(mon, day, year)))
                    i = j
                    continue
            # $N [million|billion]
            if f in lx.CURRENCY_SYMBOLS and i + 1 < n and _NUM_RE.match(toks[i + 1].form):
                val = float(toks[i + 1].form.replace(",", ""))
                j = i + 2
                if j < n and toks[j].form.lower() in ("million", "billion", "thousand"):
                    val *= lx.NUMBER_WORDS[toks[j].form.lower()]
                    j += 1
                out.append(Ent("MONEY", i, j,
                               norm=f"{lx.CURRENCY_SYMBOLS[f]}:{fmt_num(val)}"))
                i = j
                continue
            # number-word / digit sequences → MONEY / PERCENT / DURATION / CARDINAL
            if low in lx.NUMBER_WORDS or _NUM_RE.match(f):
                j = i + 1
                while j < n and toks[j].form.lower() in lx.NUMBER_WORDS:
                    j += 1
                val = parse_number_words([t.form for t in toks[i:j]])
                if val is not None and j < n:
                    nxt = toks[j].form.lower()
                    if nxt in ("percent", "%"):
                        out.append(Ent("PERCENT", i, j + 1, norm=fmt_num(val)))
                        i = j + 1
                        continue
                    if nxt.rstrip("s") in lx.CURRENCY_WORDS:
                        out.append(Ent("MONEY", i, j + 1,
                                       norm=f"{lx.CURRENCY_WORDS[nxt.rstrip('s')]}:{fmt_num(val)}"))
                        i = j + 1
                        continue
                    dur = duration_iso(val, nxt)
                    if dur and nxt.rstrip("s") in lx.DURATION_UNITS:
                        out.append(Ent("DURATION", i, j + 1, norm=dur))
                        i = j + 1
                        continue
                if val is not None:
                    out.append(Ent("CARDINAL", i, j, norm=fmt_num(val)))
                i = j
                continue
            if low in lx.ORDINAL_WORDS:
                out.append(Ent("ORDINAL", i, i + 1,
                               norm=str(parse_ordinal(low))))
            i += 1
        return out

    # --- chunks + dependency approximation (M4) ---------------------------

    def chunks_and_deps(self, toks: list[Tok], ents: list[Ent]):
        """NP chunks (entity spans atomic) + a flat dependency layer.

        Heads are rightmost nounish tokens; determiners/adjectives attach
        NMOD/AMOD to the head; prepositions attach PMOD down / ADV-NMOD
        up; the last verb of a sentence governs via ROOT.  This is the
        minimal structure the modifier / participation machinery
        (MODIFIER_REGEX, PARTICIPATION_REGEX — SURVEY §2.2 M14) needs.
        """
        n = len(toks)
        ent_at = {}
        for e in ents:
            if e.named or e.etype in ("DATE", "DURATION") or e.etype in _VALUE_TYPES:
                for k in range(e.start, e.end):
                    ent_at[k] = e
        chunks: list[tuple[int, int, int]] = []   # (start, end, head)
        i = 0
        while i < n:
            e = ent_at.get(i)
            if e is not None and e.start == i:
                chunks.append((e.start, e.end, e.end - 1))
                i = e.end
                continue
            if toks[i].morphofeat in ("DT", "JJ") or toks[i].morphofeat in _NOUNISH:
                j = i
                while j < n and toks[j].sent == toks[i].sent and j not in ent_at \
                        and (toks[j].morphofeat in ("DT", "JJ", "RB") or toks[j].morphofeat in _NOUNISH):
                    j += 1
                head = None
                for k in range(j - 1, i - 1, -1):
                    if toks[k].morphofeat in _NOUNISH:
                        head = k
                        break
                if head is not None:
                    chunks.append((i, j, head))
                    i = j
                    continue
            i += 1
        deps: list[tuple[int, int, str]] = []     # (governor, dependent, rfunc)
        for (s, e, h) in chunks:
            prev_adj = None
            for k in range(s, e):
                if k == h:
                    continue
                tag = toks[k].morphofeat
                if tag == "DT":
                    deps.append((h, k, "NMOD"))
                elif tag == "JJ":
                    deps.append((h, k, "NMOD"))
                    prev_adj = k
                elif tag == "RB" and prev_adj is None:
                    nxt = k + 1
                    if nxt < e and toks[nxt].morphofeat == "JJ":
                        deps.append((nxt, k, "AMOD"))
                    else:
                        deps.append((h, k, "NMOD"))
                else:
                    deps.append((h, k, "NMOD"))
        # verbs, prepositions, coordination
        chunk_of = {}
        for ci, (s, e, h) in enumerate(chunks):
            for k in range(s, e):
                chunk_of[k] = ci
        for i2 in range(n):
            tag = toks[i2].morphofeat
            if tag == "IN":
                # PMOD: next chunk head
                nxt = next((h for (s, e, h) in chunks if s > i2 and toks[h].sent == toks[i2].sent), None)
                if nxt is not None:
                    deps.append((i2, nxt, "PMOD"))
                # attach up: nearest verb to the left in sentence, else previous chunk head
                gov = None
                for k in range(i2 - 1, -1, -1):
                    if toks[k].sent != toks[i2].sent:
                        break
                    if toks[k].morphofeat.startswith("VB"):
                        gov = (k, "ADV")
                        break
                if gov is None:
                    for (s, e, h) in reversed(chunks):
                        if e <= i2 and toks[h].sent == toks[i2].sent:
                            gov = (h, "NMOD")
                            break
                if gov is not None:
                    deps.append((gov[0], i2, gov[1]))
            elif tag == "CC":
                left = next((h for (s, e, h) in reversed(chunks) if e <= i2), None)
                right = next((h for (s, e, h) in chunks if s > i2), None)
                if left is not None and right is not None \
                        and toks[left].sent == toks[i2].sent == toks[right].sent:
                    deps.append((left, i2, "COORD"))
                    deps.append((i2, right, "CONJ"))
        def punct_between(a: int, b: int) -> bool:
            # a comma/quote/paren between a chunk and its verb means a
            # clause boundary — never project SBJ/OBJ across it
            return any(not toks[k].form[0].isalnum() and toks[k].form not in ("'",)
                       for k in range(a, b))

        last_sbj: dict[int, int] = {}     # sentence → last assigned SBJ head
        for i2 in range(n):
            if toks[i2].morphofeat.startswith("VB"):
                sent = toks[i2].sent
                left = next((c for c in reversed(chunks) if c[1] <= i2 and toks[c[2]].sent == sent), None)
                right = next((c for c in chunks if c[0] > i2 and toks[c[2]].sent == sent), None)
                # VP coordination shares the subject: "they gather X
                # and attract Y" — the chunk left of "attract" is the
                # previous VP's object, not the subject
                j = i2 - 1
                while j >= 0 and (toks[j].morphofeat in ("RB", "MD")
                                  or (toks[j].morphofeat.startswith("VB")
                                      and toks[j].lemma in ("have", "be"))):
                    j -= 1
                if j >= 0 and toks[j].morphofeat in ("WP", "WDT"):
                    # relative clause: "…, who said" / "which has
                    # contributed" — the relative pronoun is the subject
                    deps.append((i2, j, "SBJ"))
                elif j >= 0 and toks[j].morphofeat == "CC" and sent in last_sbj:
                    deps.append((i2, last_sbj[sent], "SBJ"))
                elif left is not None and not punct_between(left[1], i2):
                    # PP-skip: a chunk whose head is a preposition's
                    # object is not the subject — "group with a stamp
                    # of approval from Al Qaeda has become" walks back
                    # over the PP chain to "group"
                    sbj = left
                    cands = [c for c in chunks
                             if c[1] <= i2 and toks[c[2]].sent == sent]
                    for c in reversed(cands):
                        s0 = c[0]
                        if s0 > 0 and toks[s0 - 1].morphofeat == "IN" \
                                and not punct_between(c[1], i2) \
                                and not any(toks[k].morphofeat.startswith("VB")
                                            for k in range(c[1], i2)):
                            continue          # PP object — keep walking left
                        if not punct_between(c[1], i2) \
                                and not any(toks[k].morphofeat.startswith("VB")
                                            for k in range(c[1], i2)):
                            sbj = c
                        break
                    deps.append((i2, sbj[2], "SBJ"))
                    last_sbj[sent] = sbj[2]
                elif left is not None:
                    # appositive skip: "[NP1], [NP2 …], VB" — the
                    # parenthetical between commas hides the true
                    # subject NP1 ("Its fighters, a small minority of
                    # the rebels, have …")
                    seg_has_verb = any(
                        toks[k].morphofeat.startswith("VB")
                        for k in range(left[1], i2))
                    if not seg_has_verb and i2 - 1 >= 0 and toks[i2 - 1].form == ",":
                        cands = [c for c in chunks
                                 if c[1] <= left[0] and toks[c[2]].sent == sent]
                        if cands:
                            prev = cands[-1]
                            between = [toks[k].form for k in range(prev[1], left[0])]
                            if between[:1] == [","]:
                                deps.append((i2, prev[2], "SBJ"))
                                last_sbj[sent] = prev[2]
                if right is not None and not punct_between(i2 + 1, right[0]) \
                        and (right[0] == i2 + 1
                             or all(toks[k].morphofeat not in ("IN",)
                                    for k in range(i2 + 1, right[0]))):
                    deps.append((i2, right[2], "OBJ"))
        return chunks, deps

    # --- SRL (M5/M7) -------------------------------------------------------

    def srl(self, toks: list[Tok], ents: list[Ent], chunks, deps) -> list[Pred]:
        preds: list[Pred] = []
        dep_by_gov: dict[int, list[tuple[int, str]]] = {}
        for g, d, r in deps:
            dep_by_gov.setdefault(g, []).append((d, r))
        chunk_by_head = {h: (s, e) for (s, e, h) in chunks}
        ent_by_head = {}
        for e in ents:
            ent_by_head.setdefault(e.end - 1, e)

        def span_of(head: int) -> tuple[int, int]:
            s, e = chunk_by_head.get(head, (head, head + 1))
            return s, e

        def is_passive(i: int) -> bool:
            # participle directly preceded by a form of "be" (skipping
            # adverbs): "was acquired (by …)" — M5 passive handling
            j = i - 1
            while j >= 0 and toks[j].morphofeat == "RB":
                j -= 1
            return j >= 0 and toks[j].lemma == "be" and toks[j].sent == toks[i].sent

        for i, t in enumerate(toks):
            if t.morphofeat.startswith("VB") and t.lemma in lx.VERB_FRAMES:
                if t.lemma in ("be", "have"):
                    # skip auxiliaries: passive "was acquired" and
                    # perfect "has become" — the participle carries
                    # the predicate
                    nxt = i + 1
                    while nxt < len(toks) and toks[nxt].morphofeat == "RB":
                        nxt += 1
                    if nxt < len(toks) and toks[nxt].morphofeat in ("VBD", "VBN") \
                            and toks[nxt].lemma in lx.VERB_FRAMES:
                        continue
                passive = t.lemma != "be" and is_passive(i)
                sense = lx.VERB_FRAMES[t.lemma]
                p = Pred(i, sense, "verbal", copular=(t.lemma == "be"))
                theme_subj = sense in lx.THEME_SUBJECT_SENSES
                subj_role = "A1" if (passive or theme_subj) else "A0"
                subj_gov = i
                if passive:
                    # surface subject hangs off the auxiliary "be"
                    j = i - 1
                    while j >= 0 and toks[j].morphofeat == "RB":
                        j -= 1
                    if j >= 0 and toks[j].lemma == "be":
                        subj_gov = j
                deps_here = sorted(set(dep_by_gov.get(i, []))
                                   | (set(dep_by_gov.get(subj_gov, []))
                                      if subj_gov != i else set()))
                for d, r in deps_here:
                    if r == "SBJ":
                        s, e = span_of(d)
                        p.roles.append((subj_role, s, e, d))
                    elif r == "OBJ" and not passive:
                        s, e = span_of(d)
                        p.roles.append(("A2" if theme_subj else "A1", s, e, d))
                    elif r == "ADV":   # preposition under verb
                        prep = toks[d].lemma
                        k = d + 1
                        while k < len(toks) and toks[k].morphofeat == "RB":
                            k += 1
                        if k < len(toks) and toks[k].morphofeat.startswith("VB") \
                                and toks[k].lemma in lx.VERB_FRAMES:
                            # "to VB" is an infinitive marker and
                            # "from VBG" a gerund clause — not a
                            # nominal PP; a gerund complement fills A1
                            if prep in ("from", "of", "in", "by"):
                                p.roles.append(("A1", k, k + 1, k))
                            continue
                        pm = next((dd for dd, rr in dep_by_gov.get(d, []) if rr == "PMOD"), None)
                        if pm is None:
                            continue
                        s, e = span_of(pm)
                        ent = ent_by_head.get(pm) or ent_by_head.get(e - 1)
                        if ent is not None and ent.etype in ("DATE", "DURATION"):
                            p.roles.append(("AM-TMP", s, e, pm))
                        elif ent is not None and ent.etype == "LOCATION" and prep in ("in", "at"):
                            p.roles.append(("AM-LOC", s, e, pm))
                        elif ent is not None and ent.etype in ("ORDINAL",):
                            p.roles.append(("AM-TMP", s, e, pm))
                        elif prep == "for" and ent is not None and ent.etype == "MONEY":
                            p.roles.append(("A3", s, e, pm))
                        elif prep in ("in", "at", "on"):
                            p.roles.append(("AM-LOC", s, e, pm))
                        elif prep in ("from", "to", "into") \
                                and sense in lx.DIR_PREP_SENSES:
                            p.roles.append(("AM-DIR", s, e, pm))
                        elif prep == "from":
                            p.roles.append(("A2", s, e, pm))
                        elif prep in ("to", "into"):
                            p.roles.append(("A2", s, e, pm))
                        elif prep == "with":
                            p.roles.append(("A2", s, e, pm))
                        elif prep == "by" and passive:
                            p.roles.append(("A0", s, e, pm))
                        elif prep == "for":
                            p.roles.append(("A3", s, e, pm))
                # control verbs: the infinitive complement fills a
                # clause argument ("want to support X" → want.A1 =
                # the support event; "pushes Y to organize" → A2)
                clause_role = lx.CONTROL_SENSES.get(sense)
                if clause_role:
                    v = None
                    j = i + 1
                    while j < len(toks) and toks[j].sent == t.sent and j - i <= 8:
                        f2 = toks[j].form.lower()
                        if f2 == "to" and j + 1 < len(toks):
                            k = j + 1
                            while k < len(toks) and toks[k].morphofeat == "RB":
                                k += 1
                            if k < len(toks) and toks[k].lemma in lx.VERB_FRAMES:
                                v = k
                            break
                        if sense == "help.01" and toks[j].morphofeat.startswith("VB") \
                                and toks[j].lemma in lx.VERB_FRAMES:
                            v = j          # bare infinitive: "helped lead"
                            break
                        j += 1
                    if v is not None:
                        # drop NP roles mis-captured from inside the
                        # infinitive clause
                        p.roles = [r for r in p.roles
                                   if r[0] not in (clause_role,) or r[3] < v]
                        p.roles = [r for r in p.roles
                                   if not (r[0] in ("A1", "A2") and r[3] > v)]
                        p.roles.append((clause_role, v, v + 1, v))
                preds.append(p)
            elif t.morphofeat in ("NN", "NNS") and t.lemma in lx.NOUN_FRAMES:
                nb_id, pb_id = lx.NOUN_FRAMES[t.lemma]
                p = Pred(i, pb_id, "nominal")
                for d, r in dep_by_gov.get(i, []):
                    # "acquisition of X" → A1 = PP-of complement (NomBank)
                    if r == "NMOD" and d < len(toks) and toks[d].morphofeat == "IN" \
                            and toks[d].lemma == "of":
                        pm = next((dd for dd, rr in dep_by_gov.get(d, []) if rr == "PMOD"), None)
                        if pm is not None:
                            s, e = span_of(pm)
                            p.roles.append(("A1", s, e, pm))
                    # possessive determiner → A0 ("their successes")
                    elif r == "NMOD" and d < len(toks) and toks[d].morphofeat == "PRP$":
                        p.roles.append(("A0", d, d + 1, d))
                    # noun/gerund premodifier → A1 ("fighting forces",
                    # "oil fields", "military bases" — NomBank compound
                    # annotation)
                    elif r == "NMOD" and d < i and toks[d].morphofeat in ("NN", "NNS", "VBG"):
                        p.roles.append(("A1", d, d + 1, d))
                    # "efforts in Syria" → AM-LOC locative PP on nominals
                    elif r == "NMOD" and d < len(toks) and toks[d].morphofeat == "IN" \
                            and toks[d].lemma in ("in", "on", "at"):
                        pm = next((dd for dd, rr in dep_by_gov.get(d, []) if rr == "PMOD"), None)
                        if pm is not None:
                            s, e = span_of(pm)
                            p.roles.append(("AM-LOC", s, e, pm))
                    # "approval from Al Qaeda" → A0 agentive source
                    elif r == "NMOD" and d < len(toks) and toks[d].morphofeat == "IN" \
                            and toks[d].lemma == "from":
                        pm = next((dd for dd, rr in dep_by_gov.get(d, []) if rr == "PMOD"), None)
                        if pm is not None:
                            s, e = span_of(pm)
                            p.roles.append(("A0", s, e, pm))
                    # direct JJ modifier → modifier argument: temporal
                    # adjectives AM-TMP, demonyms A1, roleset-specific
                    # override (NOUN_MOD_ARG), else AM-MNR
                    elif r == "NMOD" and d < len(toks) and toks[d].morphofeat == "JJ":
                        lem = toks[d].lemma
                        if lem in lx.TEMPORAL_ADJ:
                            role = "AM-TMP"
                        elif lem in lx.DEMONYM_ADJ:
                            role = "A1"
                        else:
                            role = lx.NOUN_MOD_ARG.get(nb_id, "AM-MNR")
                        p.roles.append((role, d, d + 1, d))
                preds.append(p)
        return preds

    # --- coref (A5/M9: deterministic pronoun sieve) ------------------------

    def coref(self, toks: list[Tok], ents: list[Ent], preds: list[Pred],
              chunks=None) -> list[list[tuple[int, int]]]:
        clusters: list[list[tuple[int, int]]] = []
        chunks = chunks or []
        pers = [e for e in ents if e.etype == "PERSON"]
        orgs = [e for e in ents if e.etype == "ORGANIZATION"]
        named = [e for e in ents if e.named]

        def nounish_before(i: int, skip_pp: bool = False):
            """Nearest chunk head strictly before token i, same sentence.
            ``skip_pp`` steps over preposition-governed chunks so a
            relative pronoun attaches to the matrix NP head ("a veteran
            of Al Qaeda in Iraq, who …" → veteran)."""
            cands = [(s, e, h) for (s, e, h) in chunks
                     if e <= i and toks[h].sent == toks[i].sent
                     and toks[h].morphofeat in _NOUNISH]
            for (s, e, h) in reversed(cands):
                if skip_pp and s > 0 and toks[s - 1].morphofeat == "IN":
                    continue
                return (s, e, h)
            return cands[-1] if cands else None

        for i, t in enumerate(toks):
            low = t.form.lower()
            if t.morphofeat == "PRP" and low in ("he", "she"):
                cand = [e for e in pers if e.end <= i]
                if cand:
                    a = cand[-1]
                    clusters.append([(a.start, a.end), (i, i + 1)])
                else:
                    # no named person — nearest person-denoting noun
                    best = None
                    for (s, e, h) in chunks:
                        if e <= i and toks[h].lemma in lx.PERSON_NOUNS:
                            best = (s, e, h)
                    if best is not None:
                        clusters.append([(best[0], best[1]), (i, i + 1)])
            elif t.morphofeat == "PRP" and low == "it":
                nxt = i + 1
                subject_pos = nxt < len(toks) and (
                    toks[nxt].morphofeat.startswith("VB")
                    or toks[nxt].morphofeat == "MD")
                if subject_pos:
                    # expletive-ish matrix "it VB…" → the sentence's
                    # first named entity (dcoref's salience sieve)
                    cand = [e for e in named
                            if e.end <= i and toks[e.start].sent == t.sent]
                    if cand:
                        a = cand[0]
                        clusters.append([(a.start, a.end), (i, i + 1)])
                    else:
                        cand = [e for e in orgs if e.end <= i]
                        if cand:
                            a = cand[-1]
                            clusters.append([(a.start, a.end), (i, i + 1)])
                else:
                    nb = nounish_before(i)
                    if nb is not None:
                        clusters.append([(nb[0], nb[1]), (i, i + 1)])
            elif t.morphofeat in ("WP", "WDT"):
                # relative pronoun → nearest preceding matrix NP head
                nb = nounish_before(i, skip_pp=True)
                if nb is not None:
                    clusters.append([(nb[0], nb[1]), (i, i + 1)])

        # plural pronoun chain per sentence: they/their/them/we/our/us
        by_sent: dict[tuple[int, str], list[int]] = {}
        for i, t in enumerate(toks):
            low = t.form.lower()
            if low in ("they", "their", "them"):
                by_sent.setdefault((t.sent, "3p"), []).append(i)
            elif low in ("we", "our", "us"):
                by_sent.setdefault((t.sent, "1p"), []).append(i)
        for idxs in by_sent.values():
            if len(idxs) > 1:
                clusters.append([(i, i + 1) for i in idxs])

        # appositive: [NP1] , [NP2] (,|of) — both nounish, no conjunction
        for (s1, e1, h1), (s2, e2, h2) in zip(chunks, chunks[1:]):
            if e1 < len(toks) and toks[e1].form == "," and s2 == e1 + 1 \
                    and toks[h1].sent == toks[h2].sent \
                    and toks[h1].morphofeat in _NOUNISH \
                    and toks[h2].morphofeat in _NOUNISH \
                    and (e2 >= len(toks)
                         or toks[e2].form == "," or toks[e2].lemma == "of"):
                clusters.append([(s1, e1), (s2, e2)])

        # title apposition: common-noun title directly before a named
        # person ("Syria president Bashar al-Assad")
        for e in pers:
            j = e.start - 1
            if j >= 0 and toks[j].morphofeat == "NN" \
                    and toks[j].sent == toks[e.start].sent:
                clusters.append([(j, j + 1), (e.start, e.end)])

        # copular identity: "X is Y" → X ≡ Y (RDFGenerator.java:531-567
        # routes the suppressed be.01 into an identity link)
        for p in preds:
            if p.copular:
                subj = next((r for r in p.roles if r[0] in ("A0", "A1")
                             and r[3] < p.head), None)
                comp = next((r for r in p.roles if r[3] > p.head), None)
                if subj and comp:
                    clusters.append([(subj[1], subj[2]), (comp[1], comp[2])])
        return clusters

    # --- full document -----------------------------------------------------

    def annotate(self, text: str) -> dict:
        toks = self.tokenize(text)
        self.tag(toks)
        ents = self.ner(toks)
        chunks, deps = self.chunks_and_deps(toks, ents)
        preds = self.srl(toks, ents, chunks, deps)
        corefs = self.coref(toks, ents, preds, chunks)
        return {
            "tokens": [
                {"form": t.form, "offset": t.offset, "length": t.length,
                 "sent": t.sent, "pos": t.pos, "morphofeat": t.morphofeat,
                 "lemma": t.lemma}
                for t in toks
            ],
            "deps": [{"frm": g, "to": d, "rfunc": r} for g, d, r in deps],
            "entities": [
                {"etype": e.etype, "start": e.start, "end": e.end,
                 "named": e.named, "link": e.link, "link_conf": e.link_conf,
                 "norm": e.norm}
                for e in ents
            ],
            "predicates": [
                {"head": p.head, "sense": p.sense, "source": p.source,
                 "copular": p.copular, "link": "", "link_conf": 0.0,
                 "roles": [{"sem_role": r, "start": s, "end": e, "head": h}
                           for (r, s, e, h) in p.roles]}
                for p in preds
            ],
            "corefs": [
                [{"start": s, "end": e} for (s, e) in cluster]
                for cluster in corefs
            ],
        }


_EMPTY = {"tokens": [], "deps": [], "entities": [], "predicates": [], "corefs": []}


class AnnotatorStage:
    """``ds.map_batches(AnnotatorStage, concurrency=N, batch_format="pyarrow")``.

    Actor-pool stage: resources built once per actor (__init__), batches
    annotated per call; appends the nested annotation columns.
    Quarantined / empty rows get empty layers (log-and-continue).
    """

    def __init__(self, max_text_len: int | None = None):
        self.model = RuleAnnotator()
        self.max_text_len = max_text_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "quarantined" not in batch.column_names:
            kwargs = {"max_text_len": self.max_text_len} if self.max_text_len else {}
            batch = normalize_batch(batch, **kwargs)
        texts = batch["text"].to_pylist()
        quarantined = batch["quarantined"].to_pylist()
        layers = {k: [] for k in _EMPTY}
        for text, q in zip(texts, quarantined):
            ann = _EMPTY if (q or not text or not text.strip()) else self.model.annotate(text)
            for k in layers:
                layers[k].append(ann[k])
        batch = batch.append_column("tokens", pa.array(layers["tokens"], type=pa.large_list(TOKEN_T)))
        batch = batch.append_column("deps", pa.array(layers["deps"], type=pa.large_list(DEP_T)))
        batch = batch.append_column("entities", pa.array(layers["entities"], type=pa.large_list(ENTITY_T)))
        batch = batch.append_column("predicates", pa.array(layers["predicates"], type=pa.large_list(PRED_T)))
        batch = batch.append_column("corefs", pa.array(layers["corefs"], type=pa.large_list(COREF_T)))
        return batch
