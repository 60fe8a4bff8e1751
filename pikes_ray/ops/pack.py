"""Ordered prefix scan + token-budget packing.

A training-data pipeline shards a corpus into fixed-token-budget bins
("sequence packing" at the corpus level: every bin feeds one training
shard).  The primitive underneath is an ORDERED DISTRIBUTED PREFIX SUM
— a wide operator Ray Data does not ship:

1. sort by the order key (Ray's range-partitioned sort — the only
   all-to-all, and the order is required by the semantics);
2. one pass collecting per-block summaries (first key, value total) —
   tiny: two numbers per block to the driver;
3. an exclusive scan over the (sorted) block summaries on the driver —
   O(#blocks), bounded by cluster block count, broadcast back;
4. one pass computing each block's internal cumulative sum plus its
   block offset — embarrassingly parallel.

The input is consumed twice (summary + scan pass), so the sorted
dataset must be pinned.  Small inputs pin in the object store
(``materialize()``); when the estimated size crosses the same
40%-of-store threshold the kg pipeline uses (or ``spill_dir`` is
passed), the summary pass ALSO writes each sorted block to its own
parquet file — a sorted block is a contiguous key range, so the file
is too — and the scan pass re-reads those files instead of the pinned
dataset.  (A plain write_parquet→read_parquet round-trip would NOT be
safe: re-read blocks may concatenate non-adjacent files, breaking the
contiguity the per-block offsets rely on.)

ASSUMPTION (documented): ``order_col`` values are globally unique
(doc ids) — block boundaries then split the order unambiguously.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd


def _should_spill(ds) -> bool:
    try:
        import ray

        store = ray.cluster_resources().get("object_store_memory", 0)
        sz = ds.size_bytes() or 0
    except Exception:
        return False
    return bool(store) and sz > 0.4 * store


def ordered_prefix_sum(ds, order_col: str, value_col: str,
                       out_col: str = "cum", exclusive: bool = True,
                       spill_dir: str | None = None):
    """Global running total of ``value_col`` in ``order_col`` order.

    → Dataset[input columns + out_col], rows in global key order.
    ``exclusive=True`` gives the sum of all STRICTLY-preceding rows
    (first row 0) — the form packing needs.
    """
    import ray
    import ray.data as rd

    if spill_dir is None and _should_spill(ds):
        import tempfile

        spill_dir = tempfile.mkdtemp(prefix="pikes_ray_pack_spill_")

    s = ds.sort(order_col)
    if spill_dir is None:
        s = s.materialize()

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            # typed empty frame: an untyped one (object/float64) would
            # conflict with non-empty blocks' dtypes when Ray unifies
            # block schemas (float64 coercion loses int64 ids > 2^53)
            return pd.DataFrame({
                "first_key": pd.Series([], dtype=df[order_col].dtype),
                "total": pd.Series([], dtype="float64"),
                "path": pd.Series([], dtype="object"),
            })
        path = ""
        if spill_dir is not None:
            # one file per sorted block → each file is a contiguous,
            # internally-sorted key range (range-partitioned sort output)
            path = os.path.join(spill_dir, f"part-{uuid.uuid4().hex}.parquet")
            df.to_parquet(path, index=False)
        return pd.DataFrame({"first_key": [df[order_col].iloc[0]],
                             "total": [float(df[value_col].sum())],
                             "path": [path]})

    if spill_dir is not None:
        os.makedirs(spill_dir, exist_ok=True)
    blocks = s.map_batches(summarize, batch_format="pandas",
                           batch_size=None).to_pandas()
    blocks = blocks.sort_values("first_key").reset_index(drop=True)
    # exclusive scan over block totals → offset per block, keyed by the
    # block's first order key (unique by assumption)
    offset_by_key = dict(zip(blocks["first_key"],
                             blocks["total"].cumsum().shift(fill_value=0.0)))
    ref = ray.put(offset_by_key)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[out_col] = pd.Series([], dtype="float64")
            return df
        off = ray.get(ref)[df[order_col].iloc[0]]
        cum = df[value_col].astype("float64").cumsum()
        df = df.copy()
        df[out_col] = off + (cum - df[value_col] if exclusive else cum)
        return df

    if spill_dir is None:
        return s.map_batches(scan, batch_format="pandas", batch_size=None)

    # spilled path: drive the scan over the per-block files — each task
    # reads exactly one contiguous file, so per-block offsets stay valid
    paths = [p for p in blocks["path"].tolist() if p]

    def scan_file(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p in batch["path"]:
            out.append(scan(pd.read_parquet(p)))
        return pd.concat(out, ignore_index=True) if out else scan(
            pd.DataFrame())

    if not paths:
        return s.limit(0).map_batches(scan, batch_format="pandas")
    return rd.from_items([{"path": p} for p in paths]) \
        .repartition(len(paths)) \
        .map_batches(scan_file, batch_format="pandas", batch_size=None)


def pack_by_budget(ds, order_col: str, value_col: str, budget: float,
                   bin_col: str = "bin_id", spill_dir: str | None = None):
    """Assign each row a shard/bin id so consecutive rows (in
    ``order_col`` order) fill each bin to ~``budget`` units:
    ``bin = floor(exclusive_running_total / budget)``.

    The contiguous-fill rule (vs. greedy first-fit) is deterministic,
    one-pass, SQL-expressible (a window cumsum), and keeps each bin's
    overshoot below one row's value — the standard corpus-sharding
    trade-off.  → Dataset[input columns + bin_col: int64].
    """
    out = ordered_prefix_sum(ds, order_col, value_col, out_col="_cum",
                             spill_dir=spill_dir)

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[bin_col] = (df["_cum"] // float(budget)).astype("int64")
        return df.drop(columns=["_cum"])

    return out.map_batches(binify, batch_format="pandas")
