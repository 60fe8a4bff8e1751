"""Distributed clustering over embedding columns.

Spherical Lloyd's k-means at corpus scale: the centroid matrix (k × dim,
KBs-MBs) broadcasts via ``ray.put`` each round; every batch assigns its
vectors with ONE matmul and emits per-cluster partial sums (count,
vector-sum, loss) — the per-round exchange is O(k × dim × blocks) and
streams to the driver, which updates the centroids.  No shuffle at any
scale; corpus vectors are read once per iteration and never leave their
blocks.

Feeds the IVF ANN path (ops/knn.py trains its coarse quantizer on a
bounded sample — ``kmeans`` here is the full-corpus refinement when
sample bias matters) and domain-discovery / stratification pipelines
(cluster then ``stratified_sample`` per cluster).

Beyond-the-reference operator (the reference has no vector ops); the
training-data brief's "embedding" family alongside ops/knn and the
embedding near-dup ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-9, None)


def kmeans(ds, n_clusters: int = 8, vec_col: str = "embedding",
           id_col: str = "vec_id", n_iter: int = 10, seed: int = 42,
           init_sample: int = 2048):
    """Distributed spherical k-means (cosine metric, unit-norm
    centroids — the metric of ops/knn).

    Init: kmeans++-seeded Lloyd's on a bounded deterministic hash
    sample (the knn_ivf policy — representative on ordered corpora,
    cost independent of corpus size).  Then ``n_iter`` distributed
    rounds; empty clusters keep their previous centroid.  Deterministic
    given (seed, data): the only run-to-run variance is float partial-
    sum order at the 1e-15 level.

    → (centroids ndarray [k, dim], assignments Dataset[id_col, cluster,
    cos], stats dict with per-iteration inertia and final sizes).
    """
    import ray

    from pikes_ray.ops.knn import _kmeans
    from pikes_ray.ops.sample import hash_sample

    n = ds.count()
    if n == 0:
        raise ValueError("kmeans over an empty dataset")
    if n > init_sample:
        frac = min(1.0, 1.5 * init_sample / n)
        sample = hash_sample(ds, id_col, frac, seed=seed).to_pandas()
        sample = sample.sort_values(id_col).head(init_sample)
        if len(sample) < min(init_sample // 2, n):
            sample = ds.limit(init_sample).to_pandas()
    else:
        sample = ds.to_pandas()
    X0 = np.asarray(sample[vec_col].tolist(), dtype=np.float64)
    k = min(n_clusters, len(X0))
    C = _kmeans(X0, k, seed)

    inertia_by_iter: list[float] = []
    sizes = np.zeros(k, dtype="int64")
    for _ in range(n_iter):
        cref = ray.put(C)

        def partial(df: pd.DataFrame, _k=k) -> pd.DataFrame:
            if df.empty:  # filtered-upstream blocks can arrive 0-row
                return pd.DataFrame(
                    {"cluster": pd.Series([], dtype="int64"),
                     "cnt": pd.Series([], dtype="int64"),
                     "loss": pd.Series([], dtype="float64"),
                     "vsum": pd.Series([], dtype="object")})
            cents = ray.get(cref)
            V = np.asarray(df[vec_col].tolist(), dtype=np.float64)
            Vn = _normalize(V)
            sims = Vn @ cents.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(Vn)), assign]
            rows = []
            for j in np.unique(assign):
                m = assign == j
                rows.append({
                    "cluster": int(j),
                    "cnt": int(m.sum()),
                    "loss": float((1.0 - best[m]).sum()),
                    "vsum": Vn[m].sum(axis=0).tolist()})
            return pd.DataFrame(rows,
                                columns=["cluster", "cnt", "loss", "vsum"])

        counts = np.zeros(k, dtype="int64")
        loss = 0.0
        vsums = np.zeros_like(C)
        for b in (ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=4096)):
            for j, c, l, v in zip(b["cluster"], b["cnt"], b["loss"],
                                  b["vsum"]):
                counts[j] += c
                loss += l
                vsums[j] += np.asarray(v, dtype=np.float64)
        inertia_by_iter.append(loss)
        nonempty = counts > 0
        C = C.copy()
        C[nonempty] = _normalize(vsums[nonempty]
                                 / counts[nonempty, None])
        sizes = counts

    cref = ray.put(C)

    def assign_pass(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: df[id_col],
                                 "cluster": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        cents = ray.get(cref)
        V = np.asarray(df[vec_col].tolist(), dtype=np.float64)
        Vn = _normalize(V)
        sims = Vn @ cents.T
        a = np.argmax(sims, axis=1)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": a.astype("int64"),
            "cos": sims[np.arange(len(Vn)), a]})

    assignments = ds.map_batches(assign_pass, batch_format="pandas")
    stats = {"inertia_by_iter": inertia_by_iter,
             "sizes": sizes.tolist(), "n": int(n), "k": int(k)}
    return C, assignments, stats


def cluster_sizes(assignments, round_cos_to: int = 6) -> pd.DataFrame:
    """Deterministic per-cluster summary of a kmeans assignment
    Dataset: size and mean cosine-to-centroid (rounded — float sums are
    partition-order-dependent at the 1e-15 level).
    → DataFrame[cluster, n, mean_cos]."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster", sort=False)["cos"].agg(["count", "sum"])
        return pd.DataFrame({"cluster": g.index.to_numpy(dtype="int64"),
                             "n": g["count"].to_numpy(dtype="int64"),
                             "s": g["sum"].to_numpy()})

    acc: dict[int, list[float]] = {}
    for b in (assignments.map_batches(part, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=65536)):
        for cl, n_, s_ in zip(b["cluster"], b["n"], b["s"]):
            e = acc.setdefault(int(cl), [0, 0.0])
            e[0] += int(n_)
            e[1] += float(s_)
    rows = [{"cluster": cl, "n": e[0],
             "mean_cos": round(e[1] / e[0], round_cos_to)}
            for cl, e in sorted(acc.items())]
    return pd.DataFrame(rows, columns=["cluster", "n", "mean_cos"])
