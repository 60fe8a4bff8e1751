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

Disambiguation is static first-sense (the reference's fallback when UKB
confidence is low — the E5 most-frequent-sense policy)."""

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
}

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


@lru_cache(maxsize=None)
def ne_types(ne_class: str) -> tuple[list[str], str | None]:
    """(sumo closure, yago) for a named-entity class."""
    row = NE_SUMO.get(ne_class)
    if row is None:
        return [], None
    sumo, yago = row
    return sumo_closure(sumo), yago
