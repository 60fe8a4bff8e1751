"""Mergeable sketches for corpus statistics at scale: HyperLogLog
distinct counting and Count-Min heavy hitters.

The 100-TB shape for both is identical and shuffle-free: every block
reduces to a FIXED-SIZE summary inside ``map_batches`` (a few KB of
numpy registers), and the driver merges #blocks summaries — an
all-reduce over kilobytes instead of a ``groupby``/``unique``
all-to-all over the data.  Both sketches are order- and
partitioning-independent (register merges are commutative max / sum),
so results are identical at any parallelism.

References (public algorithms):
- Flajolet, Fusy, Gandouet, Meunier — "HyperLogLog: the analysis of a
  near-optimal cardinality estimation algorithm", AOFA 2007 (incl. the
  small-range linear-counting correction).
- Cormode, Muthukrishnan — "An improved data stream summary: the
  count-min sketch and its applications", J. Algorithms 55 (2005).

The reference engine computes corpus statistics exactly (our
pipelines/stats.py port); these are the approximate companions a
10^12-turn corpus needs when even the distinct-key set no longer fits
anywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["hll_sketch_batch", "hll_merge", "hll_estimate",
           "approx_distinct", "cms_sketch_batch", "cms_merge",
           "heavy_hitters"]


def _hash64(values: pd.Series) -> np.ndarray:
    """Stable 64-bit hashes of the column's string form (md5-low64 —
    deterministic across processes, unlike Python's salted hash)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values.astype(str)):
        out[i] = int.from_bytes(
            hashlib.md5(v.encode()).digest()[:8], "little")
    return out


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_sketch_batch(df: pd.DataFrame, col: str, p: int = 14) -> pd.DataFrame:
    """One block → one row holding the 2**p HLL registers (uint8).

    ``p=14`` → 16 KiB per block summary, ~0.8% standard error — the
    usual production operating point."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash64(df[col].dropna())
    if len(h):
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)             # remaining 64-p bits, top-aligned
        # rank = leading zeros of the remaining bits + 1 (capped)
        nz = rest != 0
        lz = np.full(len(h), 64 - p, dtype=np.int64)
        # count leading zeros via float64 exponent trick is lossy; do it
        # exactly with a log2 on the top 53 bits-safe path: use
        # bit_length via conversion — vectorized with np.log2 guarded
        lz[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return pd.DataFrame({"p": [p], "regs": [regs.tobytes()]})


def hll_merge(parts: pd.DataFrame) -> np.ndarray:
    regs = None
    for b in parts["regs"]:
        r = np.frombuffer(b, dtype=np.uint8)
        regs = r.copy() if regs is None else np.maximum(regs, r)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # linear-counting correction
    return float(est)


def approx_distinct(ds, col: str, p: int = 14) -> int:
    """Distributed distinct-count estimate: per-block registers →
    driver max-merge → estimate.  No shuffle; #blocks × 2**p bytes of
    driver traffic."""
    parts = ds.map_batches(
        lambda df: hll_sketch_batch(df, col, p), batch_format="pandas"
    ).to_pandas()
    return int(round(hll_estimate(hll_merge(parts))))


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------

_CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
              0x165667B19E3779F9, 0x27D4EB2F165667C5)


def cms_sketch_batch(df: pd.DataFrame, col: str, width: int = 2048,
                     track: int = 64) -> pd.DataFrame:
    """One block → (count-min counts, local top-``track`` candidates).

    The candidate list is what makes the merge exact-enough: a global
    heavy hitter is a local heavy hitter in at least one block, so the
    union of per-block candidates contains every true top-k; the merged
    CMS then upper-bounds each candidate's count."""
    vals = df[col].dropna().astype(str)
    counts = vals.value_counts()
    h = _hash64(pd.Series(counts.index))
    cms = np.zeros((len(_CMS_SEEDS), width), dtype=np.int64)
    for r, seed in enumerate(_CMS_SEEDS):
        idx = ((h * np.uint64(seed)) >> np.uint64(48)) % np.uint64(width)
        np.add.at(cms[r], idx.astype(np.int64), counts.values)
    top = counts.iloc[:track]
    return pd.DataFrame({
        "cms": [cms.tobytes()],
        "cand_keys": [list(top.index)],
        "cand_counts": [top.values.astype("int64")],
    })


def cms_merge(parts: pd.DataFrame, width: int = 2048):
    cms = np.zeros((len(_CMS_SEEDS), width), dtype=np.int64)
    cand: dict[str, int] = {}
    for _, row in parts.iterrows():
        cms += np.frombuffer(row["cms"], dtype=np.int64) \
            .reshape(len(_CMS_SEEDS), width)
        for k, c in zip(row["cand_keys"], row["cand_counts"]):
            cand[k] = cand.get(k, 0) + int(c)
    return cms, cand


def _cms_query(cms: np.ndarray, key: str, width: int) -> int:
    h = _hash64(pd.Series([key]))       # length-1 array: wrap-around mul
    best = None
    for r, seed in enumerate(_CMS_SEEDS):
        idx = int(((h * np.uint64(seed)) >> np.uint64(48))[0] % width)
        c = int(cms[r, idx])
        best = c if best is None else min(best, c)
    return best


def heavy_hitters(ds, col: str, k: int = 10, width: int = 2048,
                  track: int = 64) -> pd.DataFrame:
    """Distributed top-k frequent values: per-block CMS + local
    candidates → driver merge → top-k by CMS-estimated count.
    → DataFrame (value, est_count) sorted desc, ties by value.

    With ``track`` ≥ the per-block rank of every global top-k value
    (guaranteed when blocks are row-subsets: a global heavy hitter's
    local count in SOME block is at least avg-rate), the candidate
    union is exhaustive and only the COUNT is approximate (CMS
    overestimates by at most eps·N with prob 1-delta)."""
    parts = ds.map_batches(
        lambda df: cms_sketch_batch(df, col, width, track),
        batch_format="pandas").to_pandas()
    cms, cand = cms_merge(parts, width)
    rows = [(key, _cms_query(cms, key, width)) for key in cand]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(rows[:k], columns=["value", "est_count"])


# ---------------------------------------------------------------------------
# Bloom filter (membership scrub against a distributed key set)
# ---------------------------------------------------------------------------
# Bloom, "Space/time trade-offs in hash coding with allowable errors",
# CACM 1970; double hashing per Kirsch-Mitzenmacher 2006 (two md5-derived
# 64-bit hashes generate all k probe positions).

def _bloom_positions(values: pd.Series, m_bits: int, k: int) -> np.ndarray:
    """(len, k) probe positions via double hashing h1 + i*h2 mod m."""
    h = np.empty((len(values), 2), dtype=np.uint64)
    for i, v in enumerate(values.astype(str)):
        d = hashlib.md5(v.encode()).digest()
        h[i, 0] = int.from_bytes(d[:8], "little")
        h[i, 1] = int.from_bytes(d[8:], "little") | 1   # odd → full cycle
    ks = np.arange(k, dtype=np.uint64)
    return ((h[:, :1] + ks[None, :] * h[:, 1:2]) % np.uint64(m_bits))


def bloom_build(ds, col: str, m_bits: int = 1 << 20,
                k: int = 7) -> np.ndarray:
    """Distributed Bloom-filter build: every block sets its bits into a
    local bitmap (``m_bits/8`` bytes) and the driver ORs #blocks
    bitmaps — the shuffle-free all-reduce shape of the other sketches.
    → packed uint8 bitmap (length m_bits/8).

    Size rule of thumb: m_bits ≈ 10·n keys gives ~0.8% FPR at k=7;
    never false negatives."""
    if m_bits < 8 or m_bits & (m_bits - 1):
        # power-of-two m is what makes the odd-h2 double-hashing probe
        # sequence a full cycle (gcd(h2, m) == 1); a composite m sharing
        # a factor with h2 collapses probe positions and inflates FPR.
        raise ValueError("m_bits must be a power of two (>= 8)")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits, dtype=bool)
        pos = _bloom_positions(df[col], m_bits, k)
        bits[pos.ravel().astype(np.int64)] = True
        return pd.DataFrame({"bmp": [np.packbits(bits).tobytes()]})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in (ds.map_batches(part, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=64)):
        for raw in b["bmp"]:
            merged |= np.frombuffer(raw, dtype=np.uint8)
    return merged


def bloom_filter_ds(ds, col: str, bloom: np.ndarray, k: int = 7,
                    mode: str = "drop_members"):
    """Scrub a corpus against a Bloom filter (e.g. previously crawled
    URLs, an exclusion list too big to re-shuffle): the bitmap is
    ``ray.put`` once (zero-copy numpy) and every batch tests
    membership vectorized.  ``mode="drop_members"`` keeps definite
    non-members (members AND false positives are dropped — the safe
    direction for exclusion lists); ``mode="flag"`` appends a
    ``bloom_member`` column instead."""
    import ray

    m_bits = len(bloom) * 8
    bits = np.unpackbits(bloom).astype(bool)
    bref = ray.put(bits)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        bt = ray.get(bref)
        pos = _bloom_positions(df[col], m_bits, k).astype(np.int64)
        member = bt[pos].all(axis=1)
        if mode == "flag":
            out = df.copy()
            out["bloom_member"] = member
            return out
        return df[~member]

    return ds.map_batches(check, batch_format="pandas")
