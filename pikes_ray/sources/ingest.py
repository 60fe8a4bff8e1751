"""Ingest recipes: alternative sources → the canonical transcript schema
(≙ the reference's per-dataset corpus converters, S4 — Email2NAF,
signalmedia JsonToNaf etc., pikes-resources/.../resources/*; we expose
*generic* recipes instead of per-dataset ports: the transcript table is
the engine's sole canonical input).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from pikes_ray.schema import TRANSCRIPT_SCHEMA

_EPOCH = pd.Timestamp("2024-01-01")


def _conform(df: pd.DataFrame) -> pa.Table:
    for col, default in (("conv_id", ""), ("turn_idx", 0), ("role", "user"),
                         ("text", ""), ("tool", "")):
        if col not in df.columns:
            df[col] = default
    if "ts" not in df.columns:
        df["ts"] = _EPOCH
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df = df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    return pa.Table.from_pandas(df, schema=TRANSCRIPT_SCHEMA, preserve_index=False)


def read_jsonl_transcripts(paths):
    """JSONL with (conv_id, turn_idx, role, text[, tool, ts]) fields →
    canonical transcript Dataset (≙ signalmedia/JsonToNaf.java shape)."""
    return rd.read_json(paths).map_batches(_conform, batch_format="pandas")


def _decompress(path: str, data: bytes) -> bytes:
    """Transparent per-file decompression (≙ the reference corpus
    reader's .naf.gz/.bz2/.xz handling, Corpus.java:67-68).

    Detection is by MAGIC BYTES, not suffix: Ray's ``read_binary_files``
    already auto-decompresses some extensions (``.gz``) via Arrow, so a
    suffix rule would double-decompress those and miss renamed files."""
    del path
    if data[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(data)
    if data[:3] == b"BZh":
        import bz2

        return bz2.decompress(data)
    if data[:6] == b"\xfd7zXZ\x00":
        import lzma

        return lzma.decompress(data)
    return data


def read_text_documents(paths):
    """Plain-text files → one single-turn conversation per file
    (≙ TxtToNaf.java).  conv_id = file path, turn_idx = 0.
    ``.gz/.bz2/.xz`` files are decompressed transparently.

    ``read_binary_files`` yields one row per FILE (``read_text`` would
    split a file's lines across blocks and need a reassembly shuffle)."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def conform(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "conv_id": df["path"],
            "text": [_decompress(p, b).decode("utf-8", "replace")
                     for p, b in zip(df["path"], df["bytes"])],
        })
        return _conform(out)

    return ds.map_batches(conform, batch_format="pandas")


def read_documents_as_transcripts(sf_dir: str):
    """The testdata ``documents`` table → transcript rows (doc_id becomes
    a single-turn conversation) — lets every KG query also run over the
    generic documents corpus."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")

    def conform(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "conv_id": "doc-" + df["doc_id"].astype(str).str.zfill(8),
            "turn_idx": 0,
            "role": "user",
            "text": df["text"].fillna(""),
            "tool": "",
        })
        return _conform(out)

    return ds.map_batches(conform, batch_format="pandas")


def read_csv_transcripts(paths):
    """CSV with (conv_id, turn_idx, role, text[, tool, ts]) columns →
    canonical transcript Dataset (generic tabular-corpus recipe, the
    S4 converter family's CSV member)."""
    return rd.read_csv(paths).map_batches(_conform, batch_format="pandas")


def read_email_transcripts(paths):
    """RFC-822-style email files → one conversation per message
    (≙ enronEmailDataset/Email2NAF.java:44-233): headers parsed with the
    stdlib ``email`` package, Subject + From land in the metadata
    columns, the body is the turn text, Date (when parseable) the ts.
    conv_id = Message-ID (file path fallback)."""
    import email
    import email.utils

    ds = rd.read_binary_files(paths, include_paths=True)

    def conform(df: pd.DataFrame) -> pa.Table:
        rows = []
        for path, data in zip(df["path"], df["bytes"]):
            msg = email.message_from_string(data.decode("utf-8", "replace"))
            body = msg.get_payload()
            if isinstance(body, list):      # multipart: first text part
                body = next((p.get_payload() for p in body
                             if p.get_content_type() == "text/plain"), "")
            ts = None
            if msg.get("Date"):
                try:
                    ts = email.utils.parsedate_to_datetime(msg["Date"]) \
                        .replace(tzinfo=None)
                except (TypeError, ValueError):
                    ts = None
            rows.append({
                "conv_id": msg.get("Message-ID") or path,
                "turn_idx": 0,
                "role": msg.get("From") or "user",
                "text": (f"{msg.get('Subject')}\n{body}"
                         if msg.get("Subject") else str(body)),
                "tool": "email",
                "ts": ts or _EPOCH,
            })
        if not rows:
            return TRANSCRIPT_SCHEMA.empty_table()
        return _conform(pd.DataFrame(rows))

    return ds.map_batches(conform, batch_format="pandas")


def read_sgml_documents(paths):
    """TREC-style SGML corpora — ``<DOC><DOCNO>…</DOCNO><TEXT>…</TEXT>
    </DOC>`` blocks (≙ trec/FBIS.java and siblings): one single-turn
    conversation per DOC, conv_id = DOCNO."""
    import re as _re

    _doc = _re.compile(r"<DOC>(.*?)</DOC>", _re.S | _re.I)
    _docno = _re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>", _re.S | _re.I)
    _text = _re.compile(r"<TEXT>(.*?)</TEXT>", _re.S | _re.I)
    _tag = _re.compile(r"<[^>]+>")

    ds = rd.read_binary_files(paths, include_paths=True)

    def conform(df: pd.DataFrame) -> pa.Table:
        rows = []
        for path, data in zip(df["path"], df["bytes"]):
            raw = data.decode("utf-8", "replace")
            for block in _doc.findall(raw):
                dn = _docno.search(block)
                tx = _text.search(block)
                body = _tag.sub(" ", tx.group(1)).strip() if tx else ""
                rows.append({
                    "conv_id": dn.group(1) if dn else path,
                    "turn_idx": 0, "role": "user", "text": body, "tool": "",
                })
        if not rows:
            return TRANSCRIPT_SCHEMA.empty_table()
        return _conform(pd.DataFrame(rows))

    return ds.map_batches(conform, batch_format="pandas")
