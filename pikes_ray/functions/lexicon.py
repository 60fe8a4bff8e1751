"""Pinned lexical resources for the deterministic annotator.

The reference loads static sidecar resources once per JVM (SURVEY §1.3:
PredicateMatrix, WordNet maps, NomBank/PropBank framesets, linking
stopwords — AnnotationPipeline.java:124-166).  Our equivalent is this
module: small frozen tables imported once per *actor* in the annotator
stage ``__init__``.  Everything here is deterministic and versioned with
the code — that is what makes per-turn outputs reproducible
(SURVEY §2.4 conformance note).
"""

from __future__ import annotations

# --- gazetteers (≙ DBpedia-Spotlight alias dictionary, A3) -----------------
# ~50 entries per class, incl. hot entities with Zipf skew in the generator
# (FIXTURES.md §3).  Alias → DBpedia-style resource name.

PERSONS = [
    "Alice Johnson", "Bob Smith", "Carol White", "David Brown", "Emma Davis",
    "Frank Miller", "Grace Wilson", "Henry Moore", "Irene Taylor", "Jack Anderson",
    "Karen Thomas", "Liam Jackson", "Mona Harris", "Nora Martin", "Oscar Thompson",
    "Paula Garcia", "Quinn Martinez", "Rosa Robinson", "Sam Clark", "Tina Rodriguez",
    "Uma Lewis", "Victor Lee", "Wendy Walker", "Xavier Hall", "Yara Allen",
    "Zoe Young", "Aaron King", "Bella Wright", "Carlos Lopez", "Diana Hill",
    "Ethan Scott", "Fiona Green", "George Adams", "Hanna Baker", "Ivan Nelson",
    "Julia Carter", "Kevin Mitchell", "Lena Perez", "Marco Roberts", "Nina Turner",
    "Omar Phillips", "Priya Campbell", "Rafael Parker", "Sofia Evans", "Tomas Edwards",
    "Ursula Collins", "Vikram Stewart", "Willa Sanchez", "Yusuf Morris", "Zara Rogers",
    "José García", "René Müller",
]

ORGS = [
    "Acme Corp", "Beta LLC", "Gamma Industries", "Delta Systems", "Epsilon Labs",
    "Zeta Holdings", "Eta Partners", "Theta Group", "Iota Ventures", "Kappa Media",
    "Lambda Software", "Mu Dynamics", "Nu Networks", "Xi Capital", "Omicron Energy",
    "Pi Analytics", "Rho Logistics", "Sigma Bank", "Tau Motors", "Upsilon Pharma",
    "Phi Robotics", "Chi Airlines", "Psi Foods", "Omega Retail", "Alpha Insurance",
    "Nova Mining", "Orion Telecom", "Pegasus Shipping", "Quasar Cloud", "Vega Studios",
    "Helios Solar", "Boreas Wind", "Cronos Steel", "Dione Water", "Eos Travel",
    "Fortuna Games", "Gaia Farms", "Hermes Courier", "Iris Optics", "Janus Security",
    "Kore Biotech", "Luna Fashion", "Midas Gold", "Nyx Hotels", "Oceanus Marine",
    "Pallas Consulting", "Rhea Realty", "Selene Cosmetics", "Titan Construction",
    "Vesta Kitchens", "the Nusra Front",
]

LOCATIONS = [
    "Paris", "London", "Berlin", "Madrid", "Rome", "Vienna", "Prague", "Lisbon",
    "Dublin", "Amsterdam", "Brussels", "Zurich", "Geneva", "Oslo", "Stockholm",
    "Helsinki", "Copenhagen", "Warsaw", "Budapest", "Athens", "Tokyo", "Osaka",
    "Seoul", "Beijing", "Shanghai", "Singapore", "Sydney", "Melbourne", "Toronto",
    "Vancouver", "Chicago", "Boston", "Seattle", "Austin", "Denver", "Miami",
    "Atlanta", "Dallas", "Phoenix", "Portland", "Cairo", "Nairobi", "Lagos",
    "Mumbai", "Delhi", "Bangkok", "Jakarta", "Manila", "Lima", "Bogotá",
    "São Paulo", "Mexico City",
]

def _iri_name(surface: str) -> str:
    s = surface[4:] if surface.lower().startswith("the ") else surface
    return s.replace(" ", "_")

# alias (exact surface) → (NE type, dbpedia resource name, link confidence)
GAZETTEER: dict[str, tuple[str, str, float]] = {}
for _p in PERSONS:
    GAZETTEER[_p] = ("PERSON", _iri_name(_p), 0.9)
for _o in ORGS:
    GAZETTEER[_o] = ("ORGANIZATION", _iri_name(_o), 0.85)
for _l in LOCATIONS:
    GAZETTEER[_l] = ("LOCATION", _iri_name(_l), 0.8)

# --- verb lexicon (≙ PropBank rolesets via PredicateMatrix, M5/M6) ---------
# surface lemma → roleset id.  `be` is copular (RDFGenerator.java:531-567
# suppression semantics).

VERB_FRAMES: dict[str, str] = {
    "meet": "meet.01", "acquire": "acquire.01", "found": "found.01",
    "lead": "lead.01", "sign": "sign.02", "surprise": "surprise.01",
    "rise": "rise.01", "fall": "fall.01", "work": "work.01",
    "announce": "announce.01", "visit": "visit.01", "hire": "hire.01",
    "launch": "launch.01", "sell": "sell.01", "buy": "buy.01",
    "open": "open.01", "close": "close.01", "report": "report.01",
    "invest": "invest.01", "flow": "flow.01", "return": "return.02",
    "approve": "approve.01", "reject": "reject.01", "deliver": "deliver.01",
    "be": "be.01",
}

# nominal predicates (≙ NomBank rolesets, NB→PB mapping —
# resources/NomBank.java:89-113): noun lemma → (NomBank id, PropBank id)
NOUN_FRAMES: dict[str, tuple[str, str]] = {
    "acquisition": ("acquisition.01", "acquire.01"),
    "investment": ("investment.01", "invest.01"),
    "announcement": ("announcement.01", "announce.01"),
    "launch": ("launch.01", "launch.01"),
    "report": ("report.01", "report.01"),
    "agreement": ("agreement.01", "agree.01"),
}

# NomBank incorporated-argument table (≙ NomBank.Roleset
# getPredMandatoryArgNums / getPredOptionalArgNums,
# resources/NomBank.java — used by F13 srlSelfArgFixing,
# NAFFilter.java:1246-1308).  NomBank id → (mandatory, optional) arg
# numbers the predicate NOUN ITSELF fills: deverbal result nominals
# incorporate the created/transferred thing (A1); "agreement" also
# allows its A0 co-agents reading.  Mini-resource synthesized from
# public NomBank annotation-guideline semantics for our pinned
# NOUN_FRAMES vocabulary.
NOUN_SELF_ARGS: dict[str, tuple[list[int], list[int]]] = {
    "acquisition.01": ([], [1]),
    "investment.01": ([1], []),
    "announcement.01": ([1], []),
    "launch.01": ([], [1]),
    "report.01": ([1], []),
    "agreement.01": ([1], [0]),
}

# irregular verb forms → lemma (rule-based lemmatizer backstop)
IRREGULAR_LEMMA: dict[str, str] = {
    "met": "meet", "is": "be", "was": "be", "are": "be", "were": "be",
    "been": "be", "rose": "rise", "fell": "fall", "led": "lead",
    "leads": "lead", "sold": "sell", "bought": "buy", "founded": "found",
    "flows": "flow", "flew": "fly", "ran": "run", "said": "say",
}

# closed-class words → Penn tag
CLOSED_CLASS: dict[str, str] = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT",
    "he": "PRP", "she": "PRP", "it": "PRP", "they": "PRP", "we": "PRP",
    "i": "PRP", "you": "PRP", "him": "PRP", "her": "PRP", "them": "PRP",
    "his": "PRP$", "its": "PRP$", "their": "PRP$",
    "in": "IN", "on": "IN", "at": "IN", "of": "IN", "for": "IN",
    "from": "IN", "to": "IN", "with": "IN", "by": "IN", "about": "IN",
    "abroad": "RB", "very": "RB", "quite": "RB", "not": "RB",
    "and": "CC", "or": "CC", "but": "CC",
    "like-minded": "JJ",
}

ADJECTIVES = {
    "strong", "weak", "new", "old", "large", "small", "fast", "slow",
    "major", "minor", "global", "local", "public", "private", "annual",
    "quarterly", "key", "former", "senior", "junior", "like-minded",
}

# spelled-out numbers (≙ NumberSpeller, resources/NumberSpeller.java:85-397)
NUMBER_WORDS: dict[str, float] = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
    "hundred": 100, "thousand": 1e3, "million": 1e6, "billion": 1e9,
    "trillion": 1e12,
}

ORDINAL_WORDS: dict[str, int] = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
}

MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
}

DURATION_UNITS = {
    "second": "S", "minute": "M", "hour": "H",
    "day": "D", "week": "W", "month": "M", "year": "Y",
}

CURRENCY_WORDS = {"dollar": "USD", "euro": "EUR", "yen": "JPY", "pound": "GBP"}
CURRENCY_SYMBOLS = {"$": "USD", "€": "EUR", "¥": "JPY", "£": "GBP"}

# linking stopwords (≙ NAFFilter.java:107-119 binary-searched array)
LINKING_STOPWORDS = frozenset(
    "the a an of in on at to for and or but it he she they this that".split()
)

STOPWORDS = LINKING_STOPWORDS | frozenset(
    "is are was were be been with by from as his her its their we you i".split()
)


def static_canon_map() -> dict[str, str]:
    """alias → canonical IRI derived from the pinned gazetteer.

    The only corpus-level sameAs edges the extractor can emit are
    (entity:<alias>, owl:sameAs, dbr:<resource>) links from this
    gazetteer, so the corpus smushing map is fully determined by the
    pinned model — the flagship pipeline broadcasts it inline (zero
    extra passes); the dynamic corpus_sameas_mapping path computes the
    same map from emitted triples for un-pinned linkers.
    """
    from pikes_ray.functions.iri import entity_iri

    return {entity_iri(alias): f"dbr:{res}"
            for alias, (_t, res, _c) in GAZETTEER.items()}
