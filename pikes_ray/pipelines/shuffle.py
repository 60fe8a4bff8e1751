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

Composition caveat (observed at ~120M-row inputs): do not feed the
grouped output into a ``union`` with another live branch of the same
streaming graph — the Union+AllToAll composition can stall the
executor under object-store pressure.  Materialize the (small) grouped
side first; see canonicalize.dedup_exact.
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
            # empty result must still carry fn's OUTPUT schema — returning
            # g.head(0) (the input schema) makes Ray concatenate
            # mixed-schema frames across buckets (NaN-filled extra columns
            # that break strict consumers like write_parquet)
            try:
                out = fn(g.head(0))
                if out is not None:
                    return out.head(0)
            except Exception:
                pass
            return g.head(0)
        return pd.concat(outs, ignore_index=True)

    from pikes_ray.runtime import task_num_cpus

    return ds.map_batches(
        lambda df: _with_part(df, key_cols, n_parts), batch_format="pandas"
    ).groupby("_part").map_groups(per_part, batch_format="pandas",
                                  num_cpus=task_num_cpus())


def connected_components(edges, max_rounds: int = 25,
                         a_col: str = "a", b_col: str = "b",
                         n_parts: int = 64, strict: bool = True):
    """Distributed connected components by iterative min-label
    propagation — the scale path for sameAs smushing / near-dup
    clustering when the edge set exceeds driver memory (SURVEY §7 hard
    part (d): "iterate label propagation inside groupby rounds").

    Each round: for every node, take the min label over itself and its
    neighbors (two bounded-bucket groupbys, no join operator needed);
    stop when the label sum stops changing (components of diameter d
    converge in ≤ d rounds; star-shaped dup clusters converge in 2).

    If the fingerprint is still moving after ``max_rounds`` rounds the
    labels are only partially propagated (chain components of diameter
    > rounds would be silently split ⇒ under-dedup): ``strict=True``
    raises, else a warning is emitted and the partial labels returned.

    → Dataset[node, label] with label = min node id of the component.
    """
    import pyarrow as pa
    import ray.data as rd

    def to_rows(df: pd.DataFrame) -> pd.DataFrame:
        # symmetric edge rows (key, nbr) + self rows
        a, b = df[a_col], df[b_col]
        return pd.DataFrame({
            "key": pd.concat([a, b], ignore_index=True),
            "nbr": pd.concat([b, a], ignore_index=True),
        })

    sym = edges.map_batches(to_rows, batch_format="pandas")
    # initial labels: label(node) = node
    labels = sym.map_batches(
        lambda df: pd.DataFrame({"node": df["key"].unique()}).assign(
            label=lambda d: d["node"]),
        batch_format="pandas")

    import zlib

    from ray.data.aggregate import Sum

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # message generation: per key, l = min(own labels); emit to
        # self + neighbors
        def merge_msgs(g: pd.DataFrame) -> pd.DataFrame:
            l = g["label"].dropna().min()
            nbrs = g["nbr"].dropna().unique()
            nodes = list(nbrs) + [g["key"].iloc[0]]
            return pd.DataFrame({"node": nodes, "label": l})

        combined = sym.map_batches(
            lambda df: df.rename(columns={}).assign(label=pd.NA),
            batch_format="pandas",
        ).union(labels.map_batches(
            lambda df: pd.DataFrame({"key": df["node"], "nbr": pd.NA,
                                     "label": df["label"]}),
            batch_format="pandas"))
        msgs = partitioned_group_map(combined, ["key"], merge_msgs,
                                     n_parts=n_parts)

        # the per-node reduce also folds in the convergence fingerprint
        # (order-insensitive crc-sum over (node, label)) so detecting a
        # fixed point costs no extra pass over the labels
        def min_label(g: pd.DataFrame) -> pd.DataFrame:
            node, label = g["node"].iloc[0], g["label"].min()
            return pd.DataFrame({"node": [node], "label": [label],
                                 "h": [zlib.crc32(f"{node}\x1f{label}".encode())]})

        fingerprinted = partitioned_group_map(msgs, ["node"], min_label,
                                              n_parts=n_parts).materialize()
        s = fingerprinted.aggregate(Sum("h", alias_name="h"))["h"]
        labels = fingerprinted.drop_columns(["h"])

        # pointer-doubling flatten: node → label(label(node)).  One
        # extra bounded shuffle per round turns chain components into
        # stars, cutting convergence from O(diameter) to O(log
        # diameter) rounds (the large-star/small-star contraction idea
        # restricted to the label forest — VERDICT r1 item 3).
        def flat_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                # pointers INTO each label...
                "key": pd.concat([df["label"], df["node"]], ignore_index=True),
                "member": pd.concat([df["node"], pd.Series([pd.NA] * len(df))],
                                    ignore_index=True),
                # ...and each node's own label
                "own": pd.concat([pd.Series([pd.NA] * len(df)), df["label"]],
                                 ignore_index=True),
            })

        def flatten(g: pd.DataFrame) -> pd.DataFrame:
            own = g["own"].dropna()
            base = own.min() if len(own) else g["key"].iloc[0]
            members = g["member"].dropna().unique()
            if not len(members):
                return pd.DataFrame({"node": [], "label": []})
            return pd.DataFrame({"node": members, "label": base})

        labels = partitioned_group_map(
            labels.map_batches(flat_rows, batch_format="pandas"),
            ["key"], flatten, n_parts=n_parts)
        if prev_sum is not None and s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        msg = (f"connected_components did not converge within {max_rounds} "
               "rounds — a component of diameter > rounds exists and its "
               "labels are only partially propagated (raise max_rounds)")
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return labels
