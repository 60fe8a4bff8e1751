"""IRI minting (≙ RDFGenerator.java:1788-1822, 1585-1670).

The reference mints per-document IRIs with a collision counter over a
BiMap (``mintIRI``: X, X_2, X_3 …), namespace-prefixed reference IRIs
(``mintRefIRI``), NIF offset-based mention IRIs (``#char=B,E``) and
corpus-level ``entity:<label>`` IRIs for named-but-unlinked entities
(RDFGenerator.java:917-918).  All functions here are deterministic pure
string functions; the per-document mint table is a local dict
(doc-scoped ⇒ embarrassingly parallel, SURVEY §2.2 M17).
"""

from __future__ import annotations

import re
import unicodedata

# Compact namespace prefixes used in emitted triples (CURIE form keeps
# the triples table small; a writer can expand via this table —
# RDFGenerator.java:128-144 namespace map analogue).
NAMESPACES = {
    "ks": "http://dkm.fbk.eu/ontologies/knowledgestore#",
    "nif": "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#",
    "sem": "http://semanticweb.cs.vu.nl/2009/11/sem/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "dct": "http://purl.org/dc/terms/",
    "gr": "http://purl.org/goodrelations/v1#",
    "dbr": "http://dbpedia.org/resource/",
    "pb": "http://premon.fbk.eu/resource/pb17-",
    "nb": "http://premon.fbk.eu/resource/nb10-",
    # PreMOn version prefixes exactly as NAFUtils.java:86-89
    # (PREMON_FNPREFIX "fn15", PREMON_VNPREFIX "vb32",
    #  PREMON_PBPREFIX "pb17", PREMON_NBPREFIX "nb10")
    "vn": "http://premon.fbk.eu/resource/vb32-",
    "fn": "http://premon.fbk.eu/resource/fn15-",
    "eso": "https://github.com/newsreader/eso#",
    "fb": "http://framebase.org/ns/",
    "sumo": "http://www.ontologyportal.org/SUMO.owl#",
    "dbyago": "http://dbpedia.org/class/yago/",
    "wnsyn": "http://www.newsreader-project.eu/syn/",
    "sst": "http://www.newsreader-project.eu/sst/",
    "entity": "http://pikes-ray/entity/",
    "conv": "http://pikes-ray/conv/",
    "fact": "http://pikes-ray/fact/",
    "attr": "http://pikes-ray/attr/",
    "time": "http://www.w3.org/2006/time#",
}

_NON_IRI = re.compile(r"[^a-z0-9_]+")

from functools import lru_cache


def doc_iri(conv_id: str, turn_idx: int) -> str:
    """Document IRI for one turn (FIXTURES.md §2 doc-scoped mint base)."""
    return f"conv:{conv_id}%23turn={turn_idx}"


@lru_cache(maxsize=65536)
def clean_local(label: str) -> str:
    """Lowercase, strip diacritics/articles, non-alnum → '_'.

    ≙ the IRI-cleaning of ``mintRefIRI`` + the ``entity:<lowercased
    label>`` rule (RDFGenerator.java:917-918); exercised by the
    non-ASCII fixtures (FIXTURES.md §4).
    """
    s = label.strip().lower()
    if s.startswith("the "):
        s = s[4:]
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = _NON_IRI.sub("_", s).strip("_")
    return s or "x"


def entity_iri(label: str) -> str:
    return f"entity:{clean_local(label)}"


def mention_iri(doc: str, begin: int, end: int) -> str:
    """NIF offset mention IRI ``<doc>#char=B,E`` (RDFGenerator.java:1599-1635)."""
    return f"{doc}#char={begin},{end}"


# F17 srlPreMOnIRIs — PreMOn IRI construction exactly as
# NAFUtils.createPreMOnSemanticClassIRIfor / RoleIRIfor
# (NAFUtils.java:995-1048).  ``model`` ∈ {"PropBank","NomBank",
# "VerbNet","FrameNet"}; version prefixes per NAFUtils.java:86-89.
_PREMON_NS = "http://premon.fbk.eu/resource/"
_PREMON_PREFIX = {"FrameNet": "fn15", "VerbNet": "vb32",
                  "PropBank": "pb17", "NomBank": "nb10"}


def premon_class_iri(model: str, predicate: str) -> str:
    """Semantic-class IRI, e.g. ``("PropBank","donate.01")`` →
    ``http://premon.fbk.eu/resource/pb17-donate.01``."""
    p = _PREMON_PREFIX.get(model)
    if p is None:
        raise ValueError(f"unknown PreMOn model {model!r}")
    return f"{_PREMON_NS}{p}-{predicate.lower()}"


def premon_role_iri(model: str, predicate: str, role: str) -> str:
    """Semantic-role IRI; PB/NB roles are normalized A0→arg0 /
    AM-TMP→argtmp (the reference's ``replace`` chain at
    NAFUtils.java:1030-1037 — including its all-occurrence
    ``"a"→"arg"`` quirk, so AA → "argarg"); VN/FN roles are
    lowercased only.  Separator ``@`` (PREMON_ARGUMENT_SEPARATOR)."""
    p = _PREMON_PREFIX.get(model)
    if p is None:
        raise ValueError(f"unknown PreMOn model {model!r}")
    role = role.lower()
    if model in ("PropBank", "NomBank"):
        if "am-" in role:
            role = role.replace("am-", "arg")
        else:
            role = role.replace("a", "arg")
    return f"{_PREMON_NS}{p}-{predicate.lower()}@{role}"


class MintTable:
    """Per-document collision-counting minter (RDFGenerator.java:1788-1809).

    Same (key) → same IRI; different keys mapping to the same local name
    get ``_2``, ``_3`` … suffixes.  Determinism requires callers to mint
    in a deterministic order (SURVEY §7 hard part (c)) — the extractor
    iterates annotations sorted by offset.
    """

    def __init__(self, doc: str):
        self.doc = doc
        self._by_key: dict[str, str] = {}
        self._taken: set[str] = set()

    def mint(self, key: str, local: str) -> str:
        iri = self._by_key.get(key)
        if iri is not None:
            return iri
        local = clean_local(local)
        candidate, n = local, 1
        while candidate in self._taken:
            n += 1
            candidate = f"{local}_{n}"
        self._taken.add(candidate)
        iri = f"{self.doc}#{candidate}"
        self._by_key[key] = iri
        return iri
