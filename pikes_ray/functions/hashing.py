"""Deterministic hashing for fact-graph IRIs and dedup keys.

The reference names each fact graph with a murmur3 hash of the tagged
(s, p, o) strings (pikes-rdf/.../RDFGenerator.java:1993-2015
``hashFactIRI``) and a whitespace-normalized murmur3 text hash
(``ks:textHash``, RDFGenerator.java:748-765).  We implement murmur3-32
from the public algorithm (Austin Appleby, public domain) so fact IRIs
are stable across runs/processes (Python's builtin ``hash`` is salted).
"""

from __future__ import annotations

import re
import zlib

_MASK = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Public-domain MurmurHash3 x86 32-bit."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK
    length = len(data)
    n_blocks = length // 4
    for i in range(n_blocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * c2) & _MASK
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK
        h = (h * 5 + 0xE6546B64) & _MASK
    tail = data[4 * n_blocks :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * c2) & _MASK
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h


def _tagged(subj: str, pred: str, obj: str) -> str:
    return f"s:{subj}|p:{pred}|o:{obj}"


def fact_graph_iri(subj: str, pred: str, obj: str) -> str:
    """``fact:<hash32(s,p,o)>`` named graph per fact.

    INTENTIONAL DEVIATION from the reference's murmur3 ``hashFactIRI``
    (RDFGenerator.java:1993-2015): this runs once per emitted triple in
    the hot path, so the batch path (``fact_graph_column``) hashes the
    whole column with polars' vectorized 64-bit hash (Rust) truncated
    to 32 bits, and this per-row API applies the identical formula so
    both paths name the same fact identically.  Graph names never
    participate in dedup or joins keyed on content — only determinism
    within one engine version matters (polars' hash is stable per
    version, not across major upgrades; a version bump regenerates the
    golden fixture).  ``murmur3_32`` is used where the reference's
    exact value shape matters (``ks:textHash``).
    """
    import polars as pl

    h = pl.Series([_tagged(subj, pred, obj)]).hash(seed=0)[0] % (1 << 32)
    return f"fact:{h}"


def fact_graph_column(subjs, preds, objs) -> list[str]:
    """Vectorized ``fact_graph_iri`` over aligned s/p/o lists."""
    import polars as pl

    if not subjs:
        return []
    g = (
        pl.DataFrame({"s": subjs, "p": preds, "o": objs})
        .select(
            ("fact:"
             + (pl.concat_str(
                    [pl.lit("s:"), pl.col("s"), pl.lit("|p:"), pl.col("p"),
                     pl.lit("|o:"), pl.col("o")], separator="")
                  .hash(seed=0) % (1 << 32)).cast(pl.String)).alias("g"))
        ["g"]
    )
    return g.to_list()


_WS = re.compile(r"\s+")


def text_hash(text: str) -> str:
    """Whitespace-normalized text hash (≙ ks:textHash semantics)."""
    norm = _WS.sub(" ", text.strip())
    return f"{murmur3_32(norm.encode('utf-8')):08x}"
