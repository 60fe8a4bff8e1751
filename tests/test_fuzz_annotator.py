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
