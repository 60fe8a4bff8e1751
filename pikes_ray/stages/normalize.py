"""M1 — text normalization + length guard (AnnotationPipeline.java:1053-1063).

The reference HTML-unescapes the raw text and *rejects* documents longer
than ``max_text_len``.  We never throw for data: oversize / empty rows
are routed to a ``quarantined`` flag column (log-and-continue semantics,
SURVEY §4 "poison rows") and skipped by downstream annotation while
still flowing to the output for per-turn text-equality accounting.

Stateless ``map_batches`` task, Arrow in / Arrow out.  The unescape
python-loops only the (rare) rows that contain ``&`` — everything else
is untouched zero-copy.
"""

from __future__ import annotations

import html

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_MAX_TEXT_LEN = 100_000   # reference default 1_000; prod 1_000_000
                                 # (Defaults.java:84, config-pikes.prop:11)


def normalize_batch(batch: pa.Table, max_text_len: int = DEFAULT_MAX_TEXT_LEN) -> pa.Table:
    text = batch["text"]
    # unescape only rows containing '&'
    has_amp = pc.match_substring(text, "&")
    if pc.any(has_amp).as_py():
        py = text.to_pylist()
        mask = has_amp.to_pylist()
        py = [html.unescape(t) if (m and t) else t for t, m in zip(py, mask)]
        text = pa.array(py, type=text.type)
        batch = batch.set_column(batch.schema.get_field_index("text"), "text", text)
    lens = pc.utf8_length(pc.coalesce(text, pa.scalar("", type=text.type)))
    quarantined = pc.greater(lens, max_text_len)
    if "quarantined" in batch.column_names:
        batch = batch.drop_columns(["quarantined"])
    return batch.append_column("quarantined", quarantined.combine_chunks() if isinstance(quarantined, pa.ChunkedArray) else quarantined)
