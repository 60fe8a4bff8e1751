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
dataset is pinned with ``materialize()``; at spill scale, write the
sorted dataset to parquet first and scan the files (same two-pass
shape, checkpoint-friendly).

ASSUMPTION (documented): ``order_col`` values are globally unique
(doc ids) — block boundaries then split the order unambiguously.
"""

from __future__ import annotations

import pandas as pd


def ordered_prefix_sum(ds, order_col: str, value_col: str,
                       out_col: str = "cum", exclusive: bool = True):
    """Global running total of ``value_col`` in ``order_col`` order.

    → Dataset[input columns + out_col], rows in global key order.
    ``exclusive=True`` gives the sum of all STRICTLY-preceding rows
    (first row 0) — the form packing needs.
    """
    s = ds.sort(order_col).materialize()

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"first_key": [], "total": []})
        return pd.DataFrame({"first_key": [df[order_col].iloc[0]],
                             "total": [float(df[value_col].sum())]})

    blocks = s.map_batches(summarize, batch_format="pandas",
                           batch_size=None).to_pandas()
    blocks = blocks.sort_values("first_key").reset_index(drop=True)
    # exclusive scan over block totals → offset per block, keyed by the
    # block's first order key (unique by assumption)
    offsets = dict(zip(blocks["first_key"],
                       blocks["total"].cumsum().shift(fill_value=0.0)))

    import ray

    ref = ray.put(offsets)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[out_col] = pd.Series([], dtype="float64")
            return df
        off = ray.get(ref)[df[order_col].iloc[0]]
        cum = df[value_col].astype("float64").cumsum()
        df = df.copy()
        df[out_col] = off + (cum - df[value_col] if exclusive else cum)
        return df

    return s.map_batches(scan, batch_format="pandas", batch_size=None)


def pack_by_budget(ds, order_col: str, value_col: str, budget: float,
                   bin_col: str = "bin_id"):
    """Assign each row a shard/bin id so consecutive rows (in
    ``order_col`` order) fill each bin to ~``budget`` units:
    ``bin = floor(exclusive_running_total / budget)``.

    The contiguous-fill rule (vs. greedy first-fit) is deterministic,
    one-pass, SQL-expressible (a window cumsum), and keeps each bin's
    overshoot below one row's value — the standard corpus-sharding
    trade-off.  → Dataset[input columns + bin_col: int64].
    """
    out = ordered_prefix_sum(ds, order_col, value_col, out_col="_cum")

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[bin_col] = (df["_cum"] // float(budget)).astype("int64")
        return df.drop(columns=["_cum"])

    return out.map_batches(binify, batch_format="pandas")
