"""F1/F2/A4 — mini WordNet → supersense / SUMO / YAGO typing resource.

The reference loads WordNet 3.0, the WN→SUMO mapping and the YAGO
taxonomy once per JVM (pikes-resources WordNet.java, Sumo.java:99-180,
YagoTaxonomy.java:118-230) and uses them in termSenseCompletion
(NAFFilter.java:388-496) to attach synsets/supersenses to terms and in
RDFGenerator (:1323-1345) to emit ``sumo:``/``dbyago:`` rdf:type facts
for noun instances.  Those resources are 100k+ entries of distributed
data; this module pins a SYNTHESIZED MINI-MAP — the public WordNet 3.0
first-sense synset offsets, lexicographer supersenses, SUMO classes and
YAGO (WordNet-derived) class names for the engine's pinned noun
vocabulary, plus the SUMO superclass chains needed for the closure the
reference emits (a node typed sumo:Group also gets Collection, Object,
Physical, Entity, Agent — cf. the sumo:* type sets in
docs/eval-pm/pikes/pikes.1.ttl).

Disambiguation (A4/E5): ranked-sense.  ``WN`` pins the most-frequent
sense per lemma (the reference's fallback when UKB confidence is low —
the E5 most-frequent-sense policy); ``WN_EXTRA_SENSES`` adds the
lower-frequency senses for the ambiguous lemmas, and ``rank_senses``
re-ranks them against the document context the way UKB does at full
scale (UKB runs personalized PageRank over the whole WordNet graph;
the mini version scores each sense by topical-neighbor overlap with
the context's unambiguous sense set plus a frequency prior, which is
the same signal at one propagation step).  Deterministic: a context
flip needs strictly more neighbor hits than the frequency-prior gap,
ties keep the more frequent sense."""

from __future__ import annotations

# lemma → (WN30 synset offset+pos, supersense, SUMO class, YAGO class)
WN: dict[str, tuple[str, str, str | None, str | None]] = {
    "group":        ("00031264-n", "noun.Tops", "Group", "Group100031264"),
    "organization": ("08008335-n", "noun.group", "Organization", "Organization108008335"),
    "force":        ("08208016-n", "noun.group", "Organization", "Force108208016"),
    "battalion":    ("08212347-n", "noun.group", "MilitaryOrganization", "Battalion108212347"),
    "government":   ("08050678-n", "noun.group", "Government", "Government108050678"),
    "opposition":   ("08430203-n", "noun.group", "Organization", "Opposition108430203"),
    "minority":     ("07966927-n", "noun.group", "Group", "Minority107966927"),
    "country":      ("08544813-n", "noun.location", "Nation", "Country108544813"),
    "land":         ("08552138-n", "noun.location", "LandArea", "Land108552138"),
    "base":         ("08494231-n", "noun.location", "StationaryArtifact", "Base108494231"),
    "field":        ("08569998-n", "noun.location", "LandArea", "Field108569998"),
    "position":     ("08621598-n", "noun.location", "Region", "Position108621598"),
    "person":       ("00007846-n", "noun.Tops", "Human", "Person100007846"),
    "veteran":      ("10756433-n", "noun.person", "Human", "Veteran110756433"),
    "official":     ("10372373-n", "noun.person", "Human", "Official110372373"),
    "president":    ("10467179-n", "noun.person", "Human", "President110467179"),
    "brother":      ("09876951-n", "noun.person", "Human", "Brother109876951"),
    "fighter":      ("10087434-n", "noun.person", "Human", "Fighter110087434"),
    "donor":        ("10025730-n", "noun.person", "Human", "Donor110025730"),
    "insurgent":    ("10205457-n", "noun.person", "Human", "Insurgent110205457"),
    "rebel":        ("10518602-n", "noun.person", "Human", "Rebel110518602"),
    "extremist":    ("10071332-n", "noun.person", "Human", "Extremist110071332"),
    "analyst":      ("09791816-n", "noun.person", "Human", "Analyst109791816"),
    "leader":       ("09623038-n", "noun.person", "Human", "Leader109623038"),
    "weapon":       ("04565375-n", "noun.artifact", "Weapon", "Weapon104565375"),
    "stamp":        ("07272172-n", "noun.communication", "ContentBearingObject", None),
    "approval":     ("06686736-n", "noun.communication", "Stating", None),
    "challenge":    ("07238694-n", "noun.communication", "Stating", None),
    "way":          ("00415926-n", "noun.act", "Process", None),
    "effort":       ("00786195-n", "noun.act", "IntentionalProcess", None),
    "success":      ("07317519-n", "noun.event", "Process", None),
    "uprising":     ("00962129-n", "noun.act", "ViolentContest", None),
    "skill":        ("05616246-n", "noun.cognition", "Attribute", None),
    "boldness":     ("04857083-n", "noun.attribute", "TraitAttribute", None),
    "money":        ("13384557-n", "noun.possession", "Currency", None),
    "favor":        ("06695227-n", "noun.act", "IntentionalProcess", None),
    "sanction":     ("01144355-n", "noun.act", "IntentionalProcess", None),
    "dealing":      ("01106808-n", "noun.act", "FinancialTransaction", None),
    "acquisition":  ("00077419-n", "noun.act", "Getting", None),
    "investment":   ("13333237-n", "noun.possession", "FinancialTransaction", None),
    "announcement": ("07203126-n", "noun.communication", "Stating", None),
    "report":       ("06681551-n", "noun.communication", "Report", None),
    "agreement":    ("07175241-n", "noun.communication", "Agreement", None),
    "offshoot":     ("13084834-n", "noun.plant", "Organization", None),
    "bank":         ("08420278-n", "noun.group", "FinancialOrganization", "Bank108420278"),
    "market":       ("01097292-n", "noun.act", "FinancialTransaction", None),
}

# lower-frequency senses for ambiguous lemmas, in descending WN
# frequency order after the WN (most-frequent) row
WN_EXTRA_SENSES: dict[str, list[tuple[str, str, str | None, str | None]]] = {
    "bank":     [("09213565-n", "noun.object", "LandArea", "Bank109213565")],
    "market":   [("08424951-n", "noun.location", "Region", None)],
    "field":    [("05996646-n", "noun.cognition", "FieldOfStudy", None)],
    "position": [("00586262-n", "noun.act", "Position", None)],
}

# synset-level topical edges (mini UKB graph; symmetrized at load).
# A sense with no edges can never win a context flip — honest for
# senses whose topic anchors aren't in the mini inventory.
WN_RELATED: dict[str, tuple[str, ...]] = {
    "08420278-n": ("13384557-n", "13333237-n", "01106808-n", "00077419-n",
                   "01097292-n"),                      # bank(fin) ~ money/invest/dealing/acquisition/market
    "09213565-n": ("08552138-n", "08569998-n", "08544813-n"),  # bank(river) ~ land/field/country
    "01097292-n": ("13384557-n", "13333237-n", "01106808-n"),  # market(trade) ~ money/invest/dealing
    "08424951-n": ("08621598-n", "08552138-n", "08494231-n"),  # market(place) ~ position/land/base
    "05996646-n": ("05616246-n", "09791816-n"),                # field(study) ~ skill/analyst
    "00586262-n": ("10372373-n", "10467179-n"),                # position(post) ~ official/president
}
_SYM_RELATED: dict[str, set[str]] = {}
for _a, _bs in WN_RELATED.items():
    for _b in _bs:
        _SYM_RELATED.setdefault(_a, set()).add(_b)
        _SYM_RELATED.setdefault(_b, set()).add(_a)

# NE class → (SUMO class, YAGO class) — the DEFAULT_TYPE_MAP extension
NE_SUMO: dict[str, tuple[str, str]] = {
    "PERSON": ("Human", "Person100007846"),
    "ORGANIZATION": ("Organization", "Organization108008335"),
    "LOCATION": ("GeographicArea", "Location100027167"),
}

# SUMO superclass chains (public SUMO ontology edges) for the type
# closure the reference emits; multiple parents allowed
SUMO_PARENTS: dict[str, list[str]] = {
    "Group": ["Collection", "Agent"],
    "Collection": ["Object"],
    "Object": ["Physical"],
    "Physical": ["Entity"],
    "Agent": ["Object"],
    "Organization": ["Group"],
    "MilitaryOrganization": ["Organization"],
    "Government": ["Organization"],
    "Nation": ["GeopoliticalArea"],
    "GeopoliticalArea": ["GeographicArea", "Agent"],
    "GeographicArea": ["Region"],
    "Region": ["Object"],
    "LandArea": ["GeographicArea"],
    "StationaryArtifact": ["Artifact"],
    "Artifact": ["Object"],
    "Human": ["CognitiveAgent"],
    "CognitiveAgent": ["Agent"],
    "Weapon": ["Artifact"],
    "ContentBearingObject": ["Object"],
    "Currency": ["Object"],
    "Stating": ["Communication"],
    "Communication": ["IntentionalProcess"],
    "IntentionalProcess": ["Process"],
    "Process": ["Physical"],
    "ViolentContest": ["Contest"],
    "Contest": ["IntentionalProcess"],
    "FinancialTransaction": ["Transaction"],
    "Transaction": ["IntentionalProcess"],
    "Getting": ["Transaction"],
    "Report": ["Stating"],
    "Agreement": ["Communication"],
    "Attribute": ["Entity"],
    "TraitAttribute": ["Attribute"],
    "FinancialOrganization": ["Organization"],
    "FieldOfStudy": ["Proposition"],
    "Proposition": ["Entity"],
    "Position": ["Attribute"],
}


from functools import lru_cache


@lru_cache(maxsize=None)
def sumo_closure(cls: str) -> list[str]:
    """cls + all SUMO superclasses, deterministic order (Sumo.java
    getSuperClasses closure)."""
    seen: list[str] = []
    stack = [cls]
    while stack:
        c = stack.pop(0)
        if c in seen:
            continue
        seen.append(c)
        stack.extend(SUMO_PARENTS.get(c, []))
    return seen


@lru_cache(maxsize=None)
def noun_types(lemma: str) -> tuple[str | None, str | None, list[str], str | None]:
    """(synset, supersense, sumo closure, yago) for a noun lemma."""
    row = WN.get(lemma)
    if row is None:
        return None, None, [], None
    syn, sst, sumo, yago = row
    return syn, sst, sumo_closure(sumo) if sumo else [], yago


def senses(lemma: str) -> list[tuple[str, str, str | None, str | None]]:
    """All senses of a lemma, most-frequent first (empty if unmapped)."""
    mfs = WN.get(lemma)
    if mfs is None:
        return []
    return [mfs] + WN_EXTRA_SENSES.get(lemma, [])


def context_synsets(lemmas) -> frozenset[str]:
    """UKB-style context seed: the synsets of the UNAMBIGUOUS mapped
    lemmas in the document (ambiguous ones would beg the question)."""
    out = set()
    for l in lemmas:
        row = WN.get(l)
        if row is not None and l not in WN_EXTRA_SENSES:
            out.add(row[0])
    return frozenset(out)


def rank_senses(lemma: str, context: frozenset[str] = frozenset()
                ) -> list[tuple[str, str, str | None, str | None]]:
    """Senses re-ranked against the context (A4 ranked-sense WSD).

    score = |topical neighbors ∩ context| + 0.5 / (1 + frequency rank);
    a lower-frequency sense therefore needs strictly more context
    support than the more frequent one to win.  Stable, deterministic.
    """
    ss = senses(lemma)
    if len(ss) <= 1 or not context:
        return ss
    scored = []
    for rank, row in enumerate(ss):
        nbrs = _SYM_RELATED.get(row[0], ())
        score = sum(1 for n in nbrs if n in context) + 0.5 / (1 + rank)
        scored.append((-score, rank, row))
    scored.sort()
    return [row for _, _, row in scored]


def noun_types_ctx(lemma: str, context: frozenset[str] = frozenset()
                   ) -> tuple[str | None, str | None, list[str], str | None]:
    """Context-disambiguated (synset, supersense, sumo closure, yago)."""
    ss = rank_senses(lemma, context)
    if not ss:
        return None, None, [], None
    syn, sst, sumo, yago = ss[0]
    return syn, sst, sumo_closure(sumo) if sumo else [], yago


@lru_cache(maxsize=None)
def ne_types(ne_class: str) -> tuple[list[str], str | None]:
    """(sumo closure, yago) for a named-entity class."""
    row = NE_SUMO.get(ne_class)
    if row is None:
        return [], None
    sumo, yago = row
    return sumo_closure(sumo), yago
