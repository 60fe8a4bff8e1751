"""Fixed pyarrow schemas for every pipeline stage (SURVEY.md §1.4).

The reference keeps one row-oriented NAF document per text
(ixa/kaflib/KAFDocument.java); we keep one *row of an Arrow table* per
conversation turn and stack the stand-off annotation layers as nested
Arrow columns added by successive ``map_batches`` stages. Schemas are
declared up front — no inference.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: the transcripts table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------------------
# Annotation layers (NAF layers → nested Arrow columns; SURVEY §1.1 / §1.4)
# ---------------------------------------------------------------------------

# token ≙ WF+Term merged (ixa/kaflib/WF.java + Term.java:25-74): surface
# form, char offset/len, sentence index, POS (coarse + Penn), lemma, plus
# the M11-normalized term-sense refs (NAFUtils.normalize,
# pikes-resources/.../NAFUtils.java:116-151: legacy Term attributes
# `wordnet`/`supersense`/`bbn` and externalRefs with resources
# wn30-ukb/wn30-sst/BBN fold into one canonical column each; "" = absent).
TOKEN_T = pa.struct(
    [
        ("form", pa.string()),
        ("offset", pa.int32()),
        ("length", pa.int32()),
        ("sent", pa.int32()),
        ("pos", pa.string()),        # coarse: N V G A R Q P D O C (Term.java pos codes)
        ("morphofeat", pa.string()),  # Penn tag
        ("lemma", pa.string()),
        ("synset", pa.string()),     # wn30-ukb synset id ("" = none)
        ("sst", pa.string()),        # wn30-sst supersense tag ("" = none)
        ("bbn", pa.string()),        # BBN entity tag ("" = none)
    ]
)

# dependency edge ≙ Dep (ixa/kaflib/Dep.java): token indices + label.
DEP_T = pa.struct([("frm", pa.int32()), ("to", pa.int32()), ("rfunc", pa.string())])

# entity ≙ Entity (ixa/kaflib/Entity.java): token-index span + type +
# external refs folded to (link IRI, confidence) + normalized value.
ENTITY_T = pa.struct(
    [
        ("etype", pa.string()),      # PERSON ORG LOC DATE DURATION MONEY PERCENT ORDINAL CARDINAL
        ("start", pa.int32()),       # token index, inclusive
        ("end", pa.int32()),         # token index, exclusive
        ("named", pa.bool_()),
        ("link", pa.string()),       # dbpedia-style IRI or ""
        ("link_conf", pa.float64()),
        ("norm", pa.string()),       # normalized value (TimeML-ish / numeric) or ""
    ]
)

ROLE_T = pa.struct(
    [
        ("sem_role", pa.string()),   # A0 A1 A2 AM-TMP AM-LOC NEG MOD
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("head", pa.int32()),        # head token index
        # provenance/projection hints (≙ the reference's per-role
        # ExternalRef provenance on kaflib Role objects):
        ("prep", pa.string()),       # governing preposition ("" if none)
        ("models", pa.string()),     # "" = all models | "nb" = NomBank only
        ("fn_role", pa.string()),    # per-filler FrameNet role override
    ]
)

# predicate ≙ Predicate+Roles (ixa/kaflib/Predicate.java:274): head term,
# roleset sense (PropBank/NomBank id), source tool, roles, plus an
# external link promoted by F5 linkingCompletion (NAFFilter.java:739-749
# adds dbpedia ExternalRefs to same-head predicates).
PRED_T = pa.struct(
    [
        ("head", pa.int32()),
        ("sense", pa.string()),      # e.g. "acquire.01"
        ("source", pa.string()),     # "verbal" | "nominal"  (≙ mate/semafor provenance)
        ("copular", pa.bool_()),
        ("variant", pa.int32()),     # >0: coordination-split duplicate frame
                                     # over the same head term ("support the
                                     # rebels but not extremists" → two frames)
        ("link", pa.string()),       # dbpedia-style IRI or "" (F5 promotion)
        ("link_conf", pa.float64()),
        ("factuality", pa.string()),  # carried NAF fact_value ("" = derive
                                      # syntactically at extract time)
        ("roles", pa.list_(ROLE_T)),
    ]
)

# coref cluster ≙ Coref (ixa/kaflib/Coref.java): list of token spans.
COREF_SPAN_T = pa.struct([("start", pa.int32()), ("end", pa.int32())])
COREF_T = pa.list_(COREF_SPAN_T)

# opinion ≙ Opinion (ixa/kaflib/Opinion.java: expression/holder/target
# Span<Term> + polarity).  Carried through the NAF interop path
# (ReadWriteManager.java parses the opinions layer); the native
# annotator leaves the layer EMPTY and T8 derives opinions from the
# polarity lexicon instead — when the layer is present (a
# reference-annotated corpus) T8 reuses it verbatim.  -1/-1 = span
# absent.
OPINION_T = pa.struct(
    [
        ("expr_start", pa.int32()),
        ("expr_end", pa.int32()),
        ("target_start", pa.int32()),
        ("target_end", pa.int32()),
        ("holder_start", pa.int32()),
        ("holder_end", pa.int32()),
        ("polarity", pa.string()),   # "positive" | "negative" | raw NAF value
    ]
)

ANNOTATED_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + [
        pa.field("quarantined", pa.bool_()),
        pa.field("tokens", pa.large_list(TOKEN_T)),
        pa.field("deps", pa.large_list(DEP_T)),
        pa.field("entities", pa.large_list(ENTITY_T)),
        pa.field("predicates", pa.large_list(PRED_T)),
        pa.field("corefs", pa.large_list(COREF_T)),
        pa.field("opinions", pa.large_list(OPINION_T)),
    ]
)

# ---------------------------------------------------------------------------
# Output: the triples table (SURVEY §1.2 / FIXTURES.md §2)
# ---------------------------------------------------------------------------

TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("subj", pa.large_string()),
        pa.field("pred", pa.large_string()),
        pa.field("obj", pa.large_string()),
        pa.field("graph", pa.large_string()),
        pa.field("conf", pa.float64()),
    ]
)

TRIPLE_COLS = ["subj", "pred", "obj"]


def empty_triples_table() -> pa.Table:
    return TRIPLES_SCHEMA.empty_table()
