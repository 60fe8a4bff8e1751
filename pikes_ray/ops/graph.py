"""Distributed graph analytics over the emitted knowledge graph.

The KG pipelines emit a triples table (subj, pred, obj[, graph]); a
downstream consumer ranking entities (entity salience, crawl
prioritization, dedup canon election) needs PageRank over the
entity-to-entity edge set.  This module implements power-iteration
PageRank with the engine's two standard small-side policies:

- **broadcast** (default while the node set fits the driver): the rank
  vector is a dict ``ray.put`` once per iteration; each edge batch
  emits combiner-first (dst, partial contribution) rows — the per-round
  exchange carries O(distinct dst per block), and the groupby-sum
  result (O(nodes)) returns to the driver to become the next vector.
- **join** (the 100-TB shape): ranks stay a Dataset; each round is one
  ``hash_join`` of edges against ranks on src plus the same
  combiner-first dst groupby — no driver materialization of the rank
  vector at any point (top-k extraction at the end is a bounded
  sort+limit).

Both paths run the identical update

    r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

with dangling mass redistributed uniformly.  Float groupby sums are
order-dependent across runs at the 1e-15 level; consumers ranking
entities should round (``round_to``) before a (rank desc, node asc)
tie-break, as ``pagerank_top_k`` does.

Reference anchor: the reference has no graph analytics (its KG is
consumed downstream, e.g. the KeyQuadIndex test utility,
pikes-rdf/src/test/.../kv/KeyQuadIndex.java) — this is one of the
beyond-the-reference training-data/KG operators the engine adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _edge_frame(df: pd.DataFrame, src: str, dst: str) -> pd.DataFrame:
    out = pd.DataFrame({"src": df[src].astype(str),
                        "dst": df[dst].astype(str)})
    return out[out["src"] != out["dst"]]


def _degrees(edges_ds):
    """Combiner-first out-degree per src → Dataset[src, outdeg]."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["src"].value_counts()
        return pd.DataFrame({"src": c.index, "outdeg": c.values.astype("int64")})

    agg = (edges_ds.map_batches(partial, batch_format="pandas")
           .groupby("src").sum("outdeg"))
    return agg.map_batches(
        lambda d: d.rename(columns={"sum(outdeg)": "outdeg"}),
        batch_format="pandas")


def pagerank(triples, src: str = "subj", dst: str = "obj",
             damping: float = 0.85, n_iter: int = 20,
             mode: str = "auto", broadcast_node_limit: int = 2_000_000,
             n_parts: int = 64):
    """PageRank over the (src, dst) edge projection of a triples table.

    Self-loops are dropped; multi-edges count with multiplicity (the
    reference KG emits one row per asserted fact).  Returns a
    ``pandas.DataFrame`` [node, rank] in broadcast mode and a
    ``Dataset`` [node, rank] in join mode (call ``.to_pandas()`` on
    small graphs); ``pagerank_top_k`` wraps either into a deterministic
    top-k.  ``mode="auto"`` picks broadcast below
    ``broadcast_node_limit`` nodes, join above.
    """
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto|broadcast|join, got {mode!r}")
    edges = triples.map_batches(
        lambda df, _s=src, _d=dst: _edge_frame(df, _s, _d),
        batch_format="pandas")
    edges = edges.materialize()   # reused every iteration

    if mode != "join":
        # broadcast mode needs the node universe + out-degrees on the
        # driver anyway (they are O(nodes)); a distributed string
        # groupby for an O(nodes) result is pure shuffle overhead —
        # merge the per-block partials driver-side instead (pandas
        # C-level groupby over O(blocks × distinct-per-block) rows).
        deg_nodes = _deg_nodes_driver(edges, broadcast_node_limit)
        if deg_nodes is not None:
            if len(deg_nodes) == 0:
                return pd.DataFrame(
                    {"node": pd.Series([], dtype=str),
                     "rank": pd.Series([], dtype="float64")})
            return _pagerank_broadcast(edges, deg_nodes, damping, n_iter)
        if mode == "broadcast":
            raise ValueError(
                "node set exceeds broadcast_node_limit; use mode='join'")

    deg = _degrees(edges)

    def nodes_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.unique(pd.concat([df["src"], df["dst"]]))})

    nodes = (edges.map_batches(nodes_partial, batch_format="pandas")
             .groupby("node").count()
             .map_batches(lambda d: d[["node"]], batch_format="pandas"))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=str),
                             "rank": pd.Series([], dtype="float64")})
    return _pagerank_join(edges, deg, nodes, n_nodes, damping, n_iter,
                          n_parts)


def _deg_nodes_driver(edges, limit: int):
    """Per-block (node, outdeg-partial) combiners merged on the driver.
    → DataFrame[node, outdeg] over the full node universe (dst-only
    nodes carry outdeg 0), or None when the accumulated universe
    exceeds ``limit`` (caller falls back to the join path)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["src"].value_counts()
        dst_only = pd.Index(pd.unique(df["dst"])).difference(c.index)
        return pd.DataFrame({
            "node": np.concatenate([c.index.to_numpy(dtype=object),
                                    dst_only.to_numpy(dtype=object)]),
            "outdeg": np.concatenate(
                [c.values.astype("int64"),
                 np.zeros(len(dst_only), dtype="int64")])})

    parts, total = [], 0
    for b in (edges.map_batches(partial, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=262144)):
        parts.append(b)
        total += len(b)
        if total > 8 * limit:
            return None
    if not parts:
        return pd.DataFrame({"node": pd.Series([], dtype=object),
                             "outdeg": pd.Series([], dtype="int64")})
    merged = (pd.concat(parts, ignore_index=True)
              .groupby("node", sort=True)["outdeg"].sum().reset_index())
    if len(merged) > limit:
        return None
    return merged


def _pagerank_broadcast(edges, deg_nodes: pd.DataFrame, damping, n_iter):
    """Broadcast-vector iteration: node ids are interned to int32 ONCE
    (one map pass; the string→index dict ships once), each round then
    broadcasts only the float64 rank VECTOR (zero-copy numpy in the
    object store) and runs one vectorized ``np.bincount`` pass per edge
    block; the O(distinct dst per block) partials stream back to the
    driver — no per-round Ray groupby, no per-task dict unpickling."""
    import ray

    deg_nodes = deg_nodes.sort_values("node").reset_index(drop=True)
    all_nodes = deg_nodes["node"].tolist()
    n_nodes = len(all_nodes)
    nid = {n: i for i, n in enumerate(all_nodes)}
    nid_ref = ray.put(nid)

    def intern(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nid_ref)
        return pd.DataFrame({
            "si": df["src"].map(m).to_numpy(dtype="int32"),
            "di": df["dst"].map(m).to_numpy(dtype="int32")})

    iedges = edges.map_batches(intern, batch_format="pandas").materialize()

    outdeg = deg_nodes["outdeg"].to_numpy(dtype="float64")
    dangling_mask = outdeg == 0.0
    inv_deg = np.where(dangling_mask, 0.0, 1.0 / np.maximum(outdeg, 1e-300))

    rank = np.full(n_nodes, 1.0 / n_nodes)
    inv_ref = ray.put(inv_deg)
    for _ in range(n_iter):
        rank_ref = ray.put(rank)

        def contrib(df: pd.DataFrame, _n=n_nodes) -> pd.DataFrame:
            r = ray.get(rank_ref)
            iv = ray.get(inv_ref)
            si = df["si"].to_numpy()
            di = df["di"].to_numpy()
            dense = np.bincount(di, weights=r[si] * iv[si], minlength=_n)
            nz = np.flatnonzero(dense)
            return pd.DataFrame({"di": nz.astype("int32"),
                                 "w": dense[nz]})

        inflow = np.zeros(n_nodes)
        for b in (iedges.map_batches(contrib, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=65536)):
            np.add.at(inflow, b["di"].to_numpy(dtype="int64"),
                      b["w"].to_numpy())
        dangling = float(rank[dangling_mask].sum())
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        rank = base + damping * inflow
    return pd.DataFrame({"node": all_nodes, "rank": rank})


def _pagerank_join(edges, deg, nodes, n_nodes, damping, n_iter, n_parts):
    from pikes_ray.ops.joins import hash_join

    # edges carry outdeg once (joined up front, reused every round)
    edges_w = hash_join(edges, deg, on="src", how="inner",
                        n_parts=n_parts).materialize()
    ranks = nodes.map_batches(
        lambda df, _n=n_nodes: df.assign(rank=1.0 / _n),
        batch_format="pandas")
    # nodes with no out-edges contribute dangling mass each round
    dangling_nodes = hash_join(nodes, deg.map_batches(
        lambda d: d.rename(columns={"src": "node"}),
        batch_format="pandas"), on="node", how="anti",
        n_parts=n_parts).materialize()

    for _ in range(n_iter):
        ranks = ranks.materialize()
        dangling = sum(
            b["rank"].sum() for b in hash_join(
                dangling_nodes, ranks, on="node", how="inner",
                right_cols=["rank"], n_parts=n_parts)
            .iter_batches(batch_format="pandas", batch_size=65536))
        joined = hash_join(
            edges_w,
            ranks.map_batches(lambda d: d.rename(columns={"node": "src"}),
                              batch_format="pandas"),
            on="src", how="inner", right_cols=["rank"], n_parts=n_parts)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            w = df["rank"].to_numpy() / df["outdeg"].to_numpy()
            g = pd.DataFrame({"dst": df["dst"], "w": w}) \
                .groupby("dst", sort=False)["w"].sum()
            return pd.DataFrame({"dst": g.index, "w": g.values})

        sums = (joined.map_batches(contrib, batch_format="pandas")
                .groupby("dst").sum("w")
                .map_batches(lambda d: d.rename(
                    columns={"dst": "node", "sum(w)": "w"}),
                    batch_format="pandas"))
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        joined_ranks = hash_join(nodes, sums, on="node", how="left",
                                 right_cols=["w"], n_parts=n_parts)
        ranks = joined_ranks.map_batches(
            lambda df, _b=base, _d=damping: pd.DataFrame({
                "node": df["node"],
                "rank": _b + _d * df["w"].fillna(0.0).to_numpy()}),
            batch_format="pandas")
    return ranks


def pagerank_top_k(triples, k: int = 100, src: str = "subj",
                   dst: str = "obj", round_to: int = 9, **kw) -> pd.DataFrame:
    """Deterministic top-k: ranks rounded to ``round_to`` decimals, tie
    broken by node asc (float groupby sums vary at the 1e-15 level with
    partition order — rounding makes the cut reproducible)."""
    r = pagerank(triples, src=src, dst=dst, **kw)
    if not isinstance(r, pd.DataFrame):
        r = r.to_pandas()
    r = r.assign(rank=r["rank"].round(round_to))
    r = r.sort_values(["rank", "node"], ascending=[False, True]).head(k)
    return r.reset_index(drop=True)


# --------------------------------------------------------------------------
# k-hop subgraph extraction (entity neighborhoods for KG consumers)
# --------------------------------------------------------------------------

def khop_subgraph(triples, seeds, k: int = 2, src: str = "subj",
                  dst: str = "obj", direction: str = "out",
                  broadcast_node_limit: int = 2_000_000,
                  n_parts: int = 64):
    """Edges reachable from ``seeds`` within ``k`` hops — the
    neighborhood-extraction primitive for GraphRAG-style consumers and
    per-entity graph exports.

    Each hop is ONE filtering map pass with the current frontier
    broadcast as a frozenset (``ray.put``); the newly reached nodes
    come back as per-block distinct partials (O(distinct per block)) and
    merge on the driver.  When the frontier (or the visited set)
    outgrows ``broadcast_node_limit``, the BFS switches MID-FLIGHT to
    the join shape: frontier and visited become Datasets, each hop is a
    semi ``hash_join`` of edges against the frontier, reached nodes
    come from a distributed distinct, and the next frontier is an anti
    join against visited — nothing node-set-sized ever returns to the
    driver again.  ``direction``: "out" follows src→dst, "in" dst→src,
    "both" either way.

    → Dataset[src, dst, hop] — every edge with its first hop index
    (1-based), exact-deduplicated across hops.
    """
    import ray
    import ray.data as rd

    from pikes_ray.ops.joins import hash_join

    if direction not in ("out", "in", "both"):
        raise ValueError(f"bad direction {direction!r}")
    edges = triples.map_batches(
        lambda df, _s=src, _d=dst: _edge_frame(df, _s, _d),
        batch_format="pandas")
    if k > 1:
        edges = edges.materialize()   # re-scanned every hop

    def _nodes_ds(node_set):
        return rd.from_pandas(pd.DataFrame({"node": sorted(node_set)}))

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.unique(
            pd.concat([df["src"], df["dst"]]))})

    mode = "broadcast"
    visited: set = set(str(s) for s in seeds)
    frontier = set(visited)                 # set OR Dataset by mode
    visited_ds = None
    hops = []
    for hop in range(1, k + 1):
        if mode == "broadcast" and len(frontier) > broadcast_node_limit:
            visited_ds = _nodes_ds(visited)
            frontier = _nodes_ds(frontier)
            mode = "join"
        if mode == "broadcast":
            if not frontier:
                break
            fref = ray.put(frozenset(frontier))

            def take(df: pd.DataFrame, _hop=hop,
                     _dir=direction) -> pd.DataFrame:
                f = ray.get(fref)
                m = df["src"].isin(f)
                if _dir == "in":
                    m = df["dst"].isin(f)
                elif _dir == "both":
                    m = m | df["dst"].isin(f)
                out = df[m].copy()
                out["hop"] = np.int64(_hop)
                return out

            hop_edges = edges.map_batches(
                take, batch_format="pandas").materialize()
            hops.append(hop_edges)

            reached: set = set()
            for b in (hop_edges.map_batches(ends, batch_format="pandas")
                      .iter_batches(batch_format="pandas",
                                    batch_size=65536)):
                reached.update(b["node"])
            frontier = reached - visited
            visited |= reached
        else:
            if frontier.count() == 0:
                break
            sides = ["src"] if direction == "out" else (
                ["dst"] if direction == "in" else ["src", "dst"])
            matched = [hash_join(edges, frontier, on=s, right_on="node",
                                 how="semi", n_parts=n_parts)
                       for s in sides]
            hop_edges = matched[0]
            for m in matched[1:]:
                hop_edges = hop_edges.union(m)
            hop_edges = hop_edges.map_batches(
                lambda df, _hop=hop: df.assign(hop=np.int64(_hop)),
                batch_format="pandas").materialize()
            hops.append(hop_edges)
            # distributed distinct of reached nodes, then anti vs visited
            reached_ds = (hop_edges.map_batches(ends,
                                                batch_format="pandas")
                          .groupby("node").count()
                          .map_batches(lambda d: d[["node"]],
                                       batch_format="pandas"))
            frontier = hash_join(reached_ds, visited_ds, on="node",
                                 how="anti", n_parts=n_parts).materialize()
            visited_ds = visited_ds.union(frontier).materialize()

    if not hops:
        return triples.map_batches(
            lambda df: pd.DataFrame({"src": pd.Series([], dtype=str),
                                     "dst": pd.Series([], dtype=str),
                                     "hop": pd.Series([], dtype="int64")}),
            batch_format="pandas").limit(0)
    out = hops[0]
    for h in hops[1:]:
        out = out.union(h)

    # exact dedup keeping the FIRST hop an edge was reached at
    from pikes_ray.pipelines.shuffle import partitioned_group_map

    def first_hop(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("hop").head(1)

    return partitioned_group_map(out, ["src", "dst"], first_hop,
                                 n_parts=n_parts)
