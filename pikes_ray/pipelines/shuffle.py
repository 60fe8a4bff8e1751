"""Shuffle helpers: bounded-partition grouped processing.

``Dataset.groupby(keys).map_groups(fn)`` invokes the UDF once per
distinct key — fine for hundreds of groups, pathological for millions
(per-group pandas slicing dominates).  The scalable shape used across
this engine is **hash-partition the keys into a bounded number of
uniform buckets, then run one vectorized pandas pass per bucket**,
iterating sub-groups in-process:

    partitioned_group_map(ds, ["k1", "k2"], fn, n_parts=64)

The bucket key is a stable content hash (uniform ⇒ unskewed even when
the key distribution is Zipf-hot); within a bucket, pandas'
``groupby`` is C-level.  ``n_parts`` bounds reducer parallelism and
per-reducer memory — size it to cluster cores at real scale.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd


def _with_part(df: pd.DataFrame, key_cols: list[str], n_parts: int) -> pd.DataFrame:
    key = df[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        key = key + "\x1f" + df[c].astype(str)
    df = df.copy()
    df["_part"] = (pd.util.hash_pandas_object(key, index=False) % n_parts).astype("int64")
    return df


def partitioned_group_map(
    ds,
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_parts: int = 64,
):
    """Apply ``fn`` to every distinct-key group, with bounded task count.

    Equivalent to ``ds.groupby(key_cols).map_groups(fn)`` but shuffles
    into ``n_parts`` hash buckets and loops sub-groups inside one pandas
    pass per bucket.
    """

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        outs = []
        for _, sub in g.groupby(key_cols, sort=True):
            out = fn(sub)
            if out is not None and len(out):
                outs.append(out)
        if not outs:
            return fn(g.head(0)) if len(g) == 0 else g.head(0)
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(
        lambda df: _with_part(df, key_cols, n_parts), batch_format="pandas"
    ).groupby("_part").map_groups(per_part, batch_format="pandas")
