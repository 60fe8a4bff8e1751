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


def read_text_documents(paths):
    """Plain-text files → one single-turn conversation per file
    (≙ TxtToNaf.java).  conv_id = file path, turn_idx = 0."""
    ds = rd.read_text(paths, include_paths=True)

    def conform(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("path", as_index=False).agg(text=("text", "\n".join))
        g = g.rename(columns={"path": "conv_id"})
        return _conform(g)

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
