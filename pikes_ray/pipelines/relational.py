"""Relational operator compositions over the TPC-H-ish test tables.

These exercise the engine's generic operator surface (scan with column
pruning, vectorized filter/project, combiner-style aggregation,
broadcast hash join, sort/top-k, distinct, windowed/sessionized
group processing) — each with a DuckDB-oracle twin in __ray_entry__.

Scale notes baked into each shape:
- reads always pass ``columns=[...]`` (prune at the read);
- aggregations pre-combine inside ``map_batches`` (one partial row per
  key per batch) before the small groupby shuffle;
- dimension joins broadcast the small side via ``ray.put`` (no
  all-to-all);
- double aggregates are rounded to fixed decimals so results are
  reproducible across summation orders (fp-associativity).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# --------------------------------------------------------------------------
# Q1-style pricing summary: filter → partial agg (combiner) → groupby sum
# --------------------------------------------------------------------------

def pricing_summary(sf_dir: str) -> pd.DataFrame:
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate"]
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=cols)

    cutoff = pd.Timestamp("1998-09-02")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        df = df.assign(disc_price=df["l_extendedprice"] * (1 - df["l_discount"]))
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pandas").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(6)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        df[c] = df[c].round(2)
    df["count_order"] = df["count_order"].astype("int64")
    return df


# --------------------------------------------------------------------------
# broadcast hash join: orders ⋈ customer ⋈ nation → revenue per nation
# --------------------------------------------------------------------------

def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    lookup = dict(zip(dim["c_custkey"], dim["n_name"]))
    ref = ray.put(lookup)

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        df = df.assign(n_name=df["o_custkey"].map(m))
        df = df.dropna(subset=["n_name"])
        return df.groupby("n_name", as_index=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pandas").groupby("n_name").aggregate(
        Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
    df = out.to_pandas().sort_values("n_name").reset_index(drop=True)
    df["revenue"] = df["revenue"].round(2)
    df["n_orders"] = df["n_orders"].astype("int64")
    return df


# --------------------------------------------------------------------------
# top-k with deterministic tie-break
# --------------------------------------------------------------------------

def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            revenue=("o_totalprice", "sum"))

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pandas").groupby("o_custkey").aggregate(
        Sum("revenue", alias_name="revenue"))
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df = df.sort_values(["revenue", "o_custkey"], ascending=[False, True],
                        kind="mergesort").head(k).reset_index(drop=True)
    return df


# --------------------------------------------------------------------------
# filter + project + sort (pure scan-shaping)
# --------------------------------------------------------------------------

def large_parts(sf_dir: str) -> pd.DataFrame:
    import pyarrow.compute as pc

    ds = rd.read_parquet(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_name", "p_size", "p_retailprice"])
    ds = ds.map_batches(lambda t: t.filter(pc.greater(t["p_size"], 20)),
                        batch_format="pyarrow")
    df = ds.to_pandas().sort_values("p_partkey").reset_index(drop=True)
    return df


# --------------------------------------------------------------------------
# events: hourly rollup + sessionization (ordered group processing)
# --------------------------------------------------------------------------

def events_hourly(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=df["ts"].dt.floor("h"))
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum"))

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pandas").groupby(
        ["event_type", "hour"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    df = out.to_pandas().sort_values(["event_type", "hour"]).reset_index(drop=True)
    df["sum_value"] = df["sum_value"].round(2)
    df["n"] = df["n"].astype("int64")
    df["hour"] = df["hour"].astype("datetime64[us]")   # parquet/duckdb parity
    return df


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session count + event count per user: a partitioned, ordered
    window computation — groupby(user).map_groups over ts-sorted rows
    (the Ray Data shape for streaming-style windows; SURVEY §2.9)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        new_session = g["ts"].diff() > gap
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_events": [np.int64(len(g))],
            "n_sessions": [np.int64(int(new_session.sum()) + 1)],
        })

    from pikes_ray.pipelines.shuffle import partitioned_group_map

    out = partitioned_group_map(ds, ["user_id"], per_user, n_parts=32)
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# distinct (wide): market segments
# --------------------------------------------------------------------------

def distinct_segments(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


def event_gaps(sf_dir: str) -> pd.DataFrame:
    """Per event: seconds since the previous event of the same user —
    an ordered window (LAG) computed inside the bounded-bucket grouped
    map (first event of a user → -1)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        gap = g["ts"].diff().dt.total_seconds()
        return pd.DataFrame({"event_id": g["event_id"].values,
                             "gap_sec": gap.fillna(-1.0).round(6).values})

    from pikes_ray.pipelines.shuffle import partitioned_group_map

    out = partitioned_group_map(ds, ["user_id"], per_user, n_parts=32).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def customers_without_orders(sf_dir: str,
                             broadcast_key_limit: int = 50_000_000) -> pd.DataFrame:
    """Anti join: customers with no orders.

    Below ``broadcast_key_limit`` order ROWS (metadata-cheap count on
    the parquet read — an upper bound on distinct keys, so with heavy
    key duplication the guard flips to the shuffle join earlier than a
    true distinct count would: conservative by design), the keys are
    collected distributed, broadcast via ray.put, and filtered inside
    map_batches — no shuffle (SURVEY §2.6 semi/anti join pattern).
    Above it the driver-side key set might not fit, so the query
    switches to the co-partitioned ``hash_join(how="anti")`` shuffle."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    if orders.count() > broadcast_key_limit:
        from pikes_ray.ops.joins import hash_join

        out = hash_join(cust, orders, on="c_custkey", right_on="o_custkey",
                        how="anti").to_pandas()
    else:
        keys: set = set()
        for b in orders.map_batches(
                lambda df: pd.DataFrame({"k": df["o_custkey"].unique()}),
                batch_format="pandas").iter_batches(batch_size=65536,
                                                    batch_format="pandas"):
            keys.update(int(x) for x in b["k"])
        # broadcast an Arrow value set once; the Arrow-native filter keeps
        # empty result blocks typed (a pandas object column of length 0
        # trips Ray's block-size estimator warning)
        ref = ray.put(pa.array(sorted(keys), type=pa.int64()))

        def anti(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            vs = ray.get(ref)
            return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=vs)))

        out = cust.map_batches(anti, batch_format="pyarrow").to_pandas()
    if out.empty:     # every customer ordered at this scale
        return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                             "c_name": pd.Series(dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def lineitem_brand_summary(sf_dir: str) -> pd.DataFrame:
    """Fact ⋈ dimension with pre-aggregation: lineitem joined to part
    (p_partkey → p_brand broadcast via ``ray.put``), partial group-by
    inside ``map_batches``, small final ``groupby`` — the canonical
    star-join shape that avoids shuffling the fact table at 100 TB."""
    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    lookup = dict(zip(part["p_partkey"], part["p_brand"]))
    ref = ray.put(lookup)

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        df = df.assign(p_brand=df["l_partkey"].map(m))
        df = df.dropna(subset=["p_brand"])
        return df.groupby("p_brand", as_index=False).agg(
            n_items=("l_quantity", "size"), sum_qty=("l_quantity", "sum"),
            sum_price=("l_extendedprice", "sum"))

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pandas").groupby("p_brand").aggregate(
        Sum("n_items", alias_name="n_items"), Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_price"))
    df = out.to_pandas().sort_values("p_brand").reset_index(drop=True)
    df["n_items"] = df["n_items"].astype("int64")
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_price"] = df["sum_price"].round(2)
    return df


def customers_per_region(sf_dir: str) -> pd.DataFrame:
    """Three-table dimension chain (region ← nation ← customer): the
    two small dims join driver-side, broadcast once, and the customer
    table streams through a counting ``map_batches``."""
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    reg = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    dim = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    lookup = dict(zip(dim["n_nationkey"], dim["r_name"]))
    ref = ray.put(lookup)

    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        df = df.assign(r_name=df["c_nationkey"].map(m))
        df = df.dropna(subset=["r_name"])
        return df.groupby("r_name", as_index=False).agg(
            n_customers=("r_name", "size"), sum_acctbal=("c_acctbal", "sum"))

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pandas").groupby("r_name").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("sum_acctbal", alias_name="sum_acctbal"))
    df = out.to_pandas().sort_values("r_name").reset_index(drop=True)
    df["n_customers"] = df["n_customers"].astype("int64")
    df["sum_acctbal"] = df["sum_acctbal"].round(2)
    return df


# --------------------------------------------------------------------------
# temporal joins over the events table (ops/joins.py operators)
# --------------------------------------------------------------------------

def _events_side(sf_dir: str, event_type: str, cols: list[str]) -> rd.Dataset:
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=list(dict.fromkeys(cols + ["event_type"])))
    return ds.filter(expr=f"event_type == '{event_type}'").drop_columns(
        ["event_type"])


def purchase_view_attribution(sf_dir: str) -> pd.DataFrame:
    """As-of join: attribute each purchase event to the latest view
    event of the same user at-or-before it (timestamp ties → greatest
    view id), with the exact microsecond gap.  Purchases with no prior
    view are dropped (inner as-of)."""
    from pikes_ray.ops.joins import asof_join

    p = _events_side(sf_dir, "purchase", ["event_id", "user_id", "ts"])
    v = _events_side(sf_dir, "view", ["event_id", "user_id", "ts"])
    out = asof_join(p, v, key="user_id", left_on="ts", right_on="ts",
                    right_cols=["event_id", "ts"], n_parts=32).to_pandas()
    out = out.rename(columns={"event_id_r": "view_event_id"})
    out["gap_us"] = (out["ts"].values - out["ts_r"].values).astype(
        "timedelta64[us]").astype("int64")
    return (out[["event_id", "user_id", "view_event_id", "gap_us"]]
            .sort_values("event_id").reset_index(drop=True))


def error_click_window(sf_dir: str) -> pd.DataFrame:
    """Range-join aggregate: for every error event, the count and
    summed value of click events by the same user in the follow window
    (ts, ts + 10 min].  Errors with no follow-up clicks keep count 0
    (left-join semantics)."""
    from pikes_ray.ops.joins import range_join_agg

    e = _events_side(sf_dir, "error", ["event_id", "user_id", "ts"])
    c = _events_side(sf_dir, "click", ["user_id", "ts", "value"])
    out = range_join_agg(e, c, key="user_id", left_on="ts", right_on="ts",
                         lo=pd.Timedelta(0), hi=pd.Timedelta(minutes=10),
                         sum_col="value", count_as="n_clicks",
                         sum_as="sum_value", n_parts=32).to_pandas()
    out["sum_value"] = out["sum_value"].round(6)
    return (out[["event_id", "user_id", "n_clicks", "sum_value"]]
            .sort_values("event_id").reset_index(drop=True))


def priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Large-large distributed equi-join: lineitem ⋈ orders on the
    order key — BOTH sides are fact-sized at real scale, so no
    broadcast applies; ``ops.joins.hash_join`` co-partitions the two
    reads into bounded hash buckets (one shuffle each) and merges per
    bucket.  The joined stream then rolls up revenue per order
    priority combiner-first (partial group inside ``map_batches``,
    small final ``groupby``)."""
    from pikes_ray.ops.joins import hash_join

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                  right_cols=["o_orderpriority"], how="inner", n_parts=32)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1 - df["l_discount"]))
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_items=("rev", "size"), revenue=("rev", "sum"))

    from ray.data.aggregate import Sum

    out = j.map_batches(partial, batch_format="pandas") \
        .groupby("o_orderpriority").aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue", alias_name="revenue"))
    df = out.to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    df["n_items"] = df["n_items"].astype("int64")
    df["revenue"] = df["revenue"].round(2)
    return df[["o_orderpriority", "n_items", "revenue"]]
