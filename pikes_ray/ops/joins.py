"""Joins: generic hash equi-join, as-of join, range-join aggregation.

Ray Data has no join operator; the reference's engine likewise has no
generic join (its lookups are broadcast dictionaries).  This module
supplies the join family a training-data / event pipeline needs:

- ``hash_join(left, right, ...)`` — generic large-large equi-join
  (inner/left/semi/anti) via bounded hash-bucket co-partitioning;
  complements the broadcast-small-side lookups used elsewhere.

- ``asof_join(left, right, ...)``   — for every left row, the single
  right row with the greatest ``right_on <= left_on`` (backward) for
  the same key; ties on the timestamp resolve to the greatest
  ``right_id`` (deterministic, matches ``ROW_NUMBER() OVER (ORDER BY
  t DESC, id DESC) = 1``).
- ``range_join_agg(left, right, ...)`` — for every left row,
  count/sum aggregates over right rows with ``right_on`` in the
  half-open follow window ``(left_on + lo, left_on + hi]`` for the
  same key.

Shape (the scale story): both sides are hash-partitioned on the key
into ``n_parts`` bounded buckets (one shuffle each, no all-to-all
sort), then each bucket is processed in ONE vectorized pandas pass —
``pandas.merge_asof`` with ``by=`` for the as-of, sorted
``np.searchsorted`` + prefix sums for the window aggregate.

PARTITIONING ASSUMPTION (documented per the build brief): all rows of
one key land in one bucket, so a single key's rows must fit in a
worker's heap, and ``n_parts`` bounds reducer parallelism/memory —
size it to cluster cores at real scale.  Key-uniform hashing keeps
buckets balanced even when the key distribution is Zipf-hot; a single
pathological key (>> heap) would need time-sliced sub-partitioning,
which neither the reference nor this engine implements.

The two sides may have different schemas.  They are conformed to the
union of their columns before the bucket shuffle; the side that lacks
a column gets a dtype-faithful placeholder (never read — sides are
split again inside the bucket) so every block carries one stable
Arrow schema through ``union``.
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
import pyarrow as pa


def _arrow_type(t) -> pa.DataType:
    """Normalize a Dataset.schema() entry to an Arrow type — pandas-backed
    blocks report numpy dtypes / Python classes instead of pa.DataType."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def _placeholder_series(n: int, t: pa.DataType) -> pd.Series:
    """A length-n pandas column whose Arrow type round-trips to ``t``."""
    if pa.types.is_timestamp(t):
        unit = t.unit or "us"
        return pd.Series(np.zeros(n, dtype=f"datetime64[{unit}]"))
    if pa.types.is_floating(t):
        return pd.Series(np.zeros(n, dtype=t.to_pandas_dtype()))
    if pa.types.is_integer(t):
        return pd.Series(np.zeros(n, dtype=t.to_pandas_dtype()))
    if pa.types.is_boolean(t):
        return pd.Series(np.zeros(n, dtype=bool))
    # strings / binary / anything else → object
    return pd.Series([""] * n, dtype=object)


def _types_of(ds) -> dict[str, pa.DataType]:
    """Column name → Arrow type from ``ds.schema()``.

    Must be called on a dataset that still has a schema — Ray 2.49
    drops the schema of an EMPTY dataset as soon as a map/project
    transform runs over it (zero output blocks → nothing to infer
    from), so callers capture types from their raw inputs up front.
    """
    s = ds.schema()
    if s is None:
        raise ValueError(
            "dataset has no schema; pass typed empty inputs "
            "(e.g. from_pandas with dtyped columns)")
    return {n: _arrow_type(t) for n, t in zip(s.names, s.types)}


def _conform_and_union(left, right, key: str, n_parts: int,
                       ltypes: dict | None = None,
                       rtypes: dict | None = None):
    """Tag sides, pad each to the union schema, hash-bucket the key.

    Returns the unioned dataset with columns ``_side``, ``_part`` and
    the union of both sides' columns.  ``ltypes``/``rtypes`` are the
    name→Arrow-type maps of each side, captured by the caller BEFORE
    any transform (empty datasets lose their schema after one).
    """
    ltypes = ltypes if ltypes is not None else _types_of(left)
    rtypes = rtypes if rtypes is not None else _types_of(right)
    # columns missing from each side, with the OTHER side's type
    pad_l = {c: t for c, t in rtypes.items() if c not in ltypes}
    pad_r = {c: t for c, t in ltypes.items() if c not in rtypes}
    all_cols = list(ltypes) + [c for c in rtypes if c not in ltypes]

    all_types = {**rtypes, **ltypes}

    def conform(side: int, pad: dict):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df.columns):
                # Ray can emit zero-row batches with an empty schema;
                # return a typed empty frame so every block matches
                df = pd.DataFrame({c: _placeholder_series(0, t)
                                   for c, t in all_types.items()})
            df = df.copy()
            for c, t in pad.items():
                df[c] = _placeholder_series(len(df), t)
            df["_side"] = np.int8(side)
            df["_part"] = (
                pd.util.hash_pandas_object(df[key].astype(str), index=False)
                % n_parts
            ).astype("int64")
            return df[all_cols + ["_side", "_part"]]
        return fn

    l2 = left.map_batches(conform(0, pad_l), batch_format="pandas")
    r2 = right.map_batches(conform(1, pad_r), batch_format="pandas")
    return l2.union(r2)


def hash_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    right_cols: list[str] | None = None,
    how: Literal["inner", "left", "semi", "anti"] = "inner",
    n_parts: int = 64,
):
    """Distributed large-large equi-join (Ray Data has no native join).

    Both sides are hash-bucketed on the key (one bounded shuffle each,
    no all-to-all sort, no broadcast — use the engine's broadcast-dict
    lookups when one side is small); each bucket then runs ONE
    C-level ``pandas.merge``.  Same partitioning assumption as the
    temporal joins above: all rows of one key land in one bucket and
    must fit a worker's heap; ``n_parts`` bounds reducer parallelism —
    size it to cluster cores at real scale.  Composite keys: derive a
    single key column first (the bucket hash is key-uniform either
    way).

    ``how``:
      - ``inner`` / ``left`` — left columns + ``right_cols`` (renamed
        with an ``_r`` suffix on collision).  For ``left``, unmatched
        right int/bool columns become pandas nullable ``Int64`` /
        ``boolean`` (→ Arrow int64/bool with nulls, SQL NULL
        semantics) so every bucket emits one stable schema.
      - ``semi`` / ``anti`` — left rows with ≥1 / 0 key matches;
        left columns only (the distributed form of the broadcast
        semi/anti joins in pipelines/relational.py).

    → Dataset, one row per surviving (left row × match).
    """
    right_on = right_on or on
    ltypes = _types_of(left)
    rtypes = _types_of(right)  # before any transform: empty ds loses schema
    if right_on != on:
        # not Dataset.rename_columns: its Project op breaks on
        # pandas-backed blocks in Ray 2.49 (calls the pandas API)
        right = right.map_batches(
            lambda df, _old=right_on, _new=on: df.rename(columns={_old: _new}),
            batch_format="pandas")
        rtypes = {(on if c == right_on else c): t for c, t in rtypes.items()}
    rnames = [c for c in rtypes if c != on]
    if right_cols is None:
        right_cols = rnames
    if how in ("semi", "anti"):
        right = right.select_columns([on])
        carry: list[str] = []
    else:
        carry = list(dict.fromkeys(right_cols))
        right = right.select_columns([on] + carry)
    rtypes = {c: rtypes[c] for c in [on] + carry}
    u = _conform_and_union(left, right, on, n_parts,
                           ltypes=ltypes, rtypes=rtypes)
    lcols = list(ltypes)
    rename = {c: f"{c}_r" for c in carry if c in lcols}
    out_rcols = [rename.get(c, c) for c in carry]
    # right dtypes recorded up front so `left` can emit nullable
    # columns with a bucket-invariant schema
    rkinds = rtypes

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0][lcols]
        rf = g[g["_side"] == 1][[on] + carry].rename(columns=rename)
        if how == "semi":
            return lf[lf[on].isin(rf[on].unique())]
        if how == "anti":
            return lf[~lf[on].isin(rf[on].unique())]
        merged = lf.merge(rf, on=on, how=how)
        if how == "left":
            for c in carry:
                t = rkinds[c]
                oc = rename.get(c, c)
                if pa.types.is_integer(t):
                    merged[oc] = merged[oc].astype("Int64")
                elif pa.types.is_boolean(t):
                    merged[oc] = merged[oc].astype("boolean")
        return merged[lcols + out_rcols]

    from pikes_ray.runtime import task_num_cpus

    return u.groupby("_part").map_groups(per_part, batch_format="pandas",
                                         num_cpus=task_num_cpus())


def asof_join(
    left,
    right,
    *,
    key: str,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    right_id: str | None = None,
    how: Literal["inner", "left"] = "inner",
    allow_exact: bool = True,
    n_parts: int = 64,
):
    """For each left row, the latest right row at-or-before it (same key).

    ``right_cols`` are the right-side columns carried onto the output
    (renamed with an ``_r`` suffix when they collide with a left
    column).  ``right_id`` (default: first of ``right_cols``) breaks
    timestamp ties deterministically toward the greatest id and, for
    ``how="inner"``, marks matched rows.

    → Dataset[left columns + right_cols], one row per (matched) left row.
    """
    right_id = right_id or right_cols[0]
    carry = list(dict.fromkeys(right_cols + [right_id, right_on]))
    ltypes = _types_of(left)
    rtypes = _types_of(right)
    rsel = list(dict.fromkeys([key] + carry))
    u = _conform_and_union(
        left, right.select_columns(rsel), key, n_parts,
        ltypes=ltypes, rtypes={c: rtypes[c] for c in rsel})
    lcols = list(ltypes)
    rename = {c: f"{c}_r" for c in carry if c in lcols and c != key}

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1][[key] + carry].rename(columns=rename)
        r_on = rename.get(right_on, right_on)
        r_id = rename.get(right_id, right_id)
        out_rcols = [rename.get(c, c) for c in right_cols]
        lf = lf[lcols].sort_values(left_on, kind="mergesort")
        # ascending (t, id) sort: merge_asof takes the LAST match, so
        # timestamp ties resolve to the greatest right_id
        rf = rf.sort_values([r_on, r_id], kind="mergesort")
        merged = pd.merge_asof(
            lf, rf, left_on=left_on, right_on=r_on, by=key,
            direction="backward", allow_exact_matches=allow_exact)
        if how == "inner":
            merged = merged[merged[r_id].notna()]
            # unmatched rows forced int right cols to float — restore
            for c in out_rcols:
                if rf[c].dtype.kind in "iu":
                    merged[c] = merged[c].astype(rf[c].dtype)
        return merged[lcols + out_rcols]

    from pikes_ray.runtime import task_num_cpus

    return u.groupby("_part").map_groups(per_part, batch_format="pandas",
                                         num_cpus=task_num_cpus())


def range_join_agg(
    left,
    right,
    *,
    key: str,
    left_on: str,
    right_on: str,
    lo,
    hi,
    sum_col: str | None = None,
    count_as: str = "n_matches",
    sum_as: str = "sum_value",
    n_parts: int = 64,
):
    """Per left row: count (and optionally sum) of right rows in the
    follow window ``(left_on + lo, left_on + hi]`` for the same key.

    ``lo``/``hi`` are ``pd.Timedelta`` (or numeric, matching the ``on``
    columns).  Left rows with no matches are kept with count 0 — the
    LEFT JOIN ... GROUP BY shape.  Per key the right side is sorted
    once; every left row's window is then two ``np.searchsorted``
    probes + a prefix-sum difference (no per-row scanning).

    → Dataset[left columns + count_as (+ sum_as)].
    """
    rcols = list(dict.fromkeys([key, right_on] + ([sum_col] if sum_col else [])))
    ltypes = _types_of(left)
    rtypes = _types_of(right)
    u = _conform_and_union(left, right.select_columns(rcols), key, n_parts,
                           ltypes=ltypes, rtypes={c: rtypes[c] for c in rcols})
    lcols = list(ltypes)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0][lcols]
        rf = g[g["_side"] == 1]
        outs = []
        r_by_key = dict(iter(rf.groupby(key, sort=False))) if len(rf) else {}
        for k, lgrp in lf.groupby(key, sort=False):
            res = lgrp.copy()
            rgrp = r_by_key.get(k)
            if rgrp is None or not len(rgrp):
                res[count_as] = np.int64(0)
                if sum_col:
                    res[sum_as] = 0.0
            else:
                rgrp = rgrp.sort_values(right_on, kind="mergesort")
                rt = rgrp[right_on].to_numpy()
                lt = lgrp[left_on].to_numpy()
                i0 = np.searchsorted(rt, lt + lo, side="right")
                i1 = np.searchsorted(rt, lt + hi, side="right")
                res[count_as] = (i1 - i0).astype("int64")
                if sum_col:
                    cum = np.concatenate(
                        [[0.0], np.cumsum(rgrp[sum_col].to_numpy(dtype="float64"))])
                    res[sum_as] = cum[i1] - cum[i0]
            outs.append(res)
        if not outs:
            empty = lf.head(0).copy()
            empty[count_as] = pd.Series([], dtype="int64")
            if sum_col:
                empty[sum_as] = pd.Series([], dtype="float64")
            return empty
        return pd.concat(outs, ignore_index=True)

    from pikes_ray.runtime import task_num_cpus

    return u.groupby("_part").map_groups(per_part, batch_format="pandas",
                                         num_cpus=task_num_cpus())
