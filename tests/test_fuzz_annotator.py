"""Adversarial-text fuzz: a poison row must quarantine, never kill the
batch — hypothesis sweep over the annotator's trickiest surfaces
(quotes, possessives, coordination, relative clauses, CJK, control
chars)."""

import datetime as dt

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from pikes_ray.schema import TRANSCRIPT_SCHEMA
from pikes_ray.stages.fused import KGStage

_ALPHABET = st.sampled_from(
    ("ab .,'\"`that which and but not to of in s Alice Johnson "
     "is was have may one other said").split(" ")
    + ["``", "''", "'s", "一", "鿿", "…", "\t", "\n", "", ","])

_TEXTS = st.lists(
    st.lists(_ALPHABET, min_size=0, max_size=40).map(" ".join),
    min_size=1, max_size=6)

_STAGE = KGStage()


@settings(max_examples=50, deadline=None)
@given(_TEXTS)
def test_kg_stage_fuzz_never_crashes(batch_texts):
    rows = [{"conv_id": "fz", "turn_idx": i, "role": "user", "text": t,
             "tool": "", "ts": dt.datetime(2020, 1, 1)}
            for i, t in enumerate(batch_texts)]
    out = _STAGE(pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA))
    assert out.num_rows >= len(rows)      # at least t0 metadata per doc


# round-5 open-vocabulary surfaces: the fallback tagger/lemmatizer and
# reverse-morphology nominal analysis fire on UNKNOWN tokens, so fuzz
# with out-of-lexicon pseudo-words in the trigger contexts (modal/aux/
# to-infinitive/comma-gerund/SVO), plus hostile suffix shapes
_OOV_ALPHABET = st.sampled_from(
    ("the a to may will could has have been was and , . zorbed "
     "glorping snarfs quibbed flumment zorbation cromulizer blenteer "
     "vorpal grelted xylished s ed ing ee er or tion ment al "
     "Zorblatt Quuxco many that it they").split(" ")
    + ["-", "--", "'", "’", "ﬁ", "ß", "İ", "ʼn"])

_OOV_TEXTS = st.lists(
    st.lists(_OOV_ALPHABET, min_size=0, max_size=30).map(" ".join),
    min_size=1, max_size=4)


@settings(max_examples=50, deadline=None)
@given(_OOV_TEXTS)
def test_open_vocab_fallback_fuzz_never_crashes(batch_texts):
    rows = [{"conv_id": "ov", "turn_idx": i, "role": "user", "text": t,
             "tool": "", "ts": dt.datetime(2020, 1, 1)}
            for i, t in enumerate(batch_texts)]
    out = _STAGE(pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA))
    assert out.num_rows >= len(rows)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz-'", min_size=1,
               max_size=24))
def test_rule_morphology_total_functions(w):
    """The rule-only lemmatizers and the reverse deverbal analysis are
    TOTAL over word-shaped strings: no exceptions, sane outputs."""
    from pikes_ray.functions.lexicon_growth import (
        deverbal_analysis,
        ed_lemma,
        ing_lemma,
        restore_e,
        s_lemma,
    )

    for fn in (ed_lemma, ing_lemma, s_lemma):
        out = fn(w)
        assert isinstance(out, str)
    stem, conf = restore_e(w)
    assert isinstance(stem, str) and isinstance(conf, bool)
    da = deverbal_analysis(w)
    if da is not None:
        nb_id, pb_id, kind = da
        assert nb_id.endswith(".01")
        assert pb_id == "" or pb_id.endswith(".01")
        assert kind in ("agent", "patient", "result")


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz '-.,", min_size=0,
               max_size=120))
def test_strict_profile_annotator_fuzz(text):
    """The ablated_strict profile (mechanically emptied tables + full
    open-vocab fallback) must annotate arbitrary word salad without
    raising."""
    from pikes_ray.functions.lexicon import lexicon_profile
    from pikes_ray.stages.annotate import RuleAnnotator

    with lexicon_profile("ablated_strict"):
        RuleAnnotator().annotate(text)
