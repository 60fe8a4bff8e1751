"""E1/E2 — the wide (shuffling) stages: owl:sameAs smushing and exact
triple dedup (≙ RDFGenerator.java:1859-1964 ``merge`` +
ProcessorASNorm fact-graph canonicalization + QuadModel set semantics).

Scale design (SURVEY §2.7, §7 "hard parts"):

* **Doc-local smushing first, no shuffle.**  sameAs components that
  involve doc-scoped IRIs (coref chains) can never span documents —
  they connect a doc-local instance to corpus-level ``entity:`` /
  ``dbr:`` IRIs or to other locals of the same doc.  So the transitive
  closure for those runs per-row (a tiny union-find per document)
  inside ``map_batches``: zero shuffle for the unbounded part of the
  problem.
* **Corpus-level smushing over a vocabulary-bounded map.**  After local
  smushing, the only remaining sameAs edges connect corpus-level IRIs
  (``entity:`` ↔ ``dbr:``), whose count is bounded by the entity
  vocabulary — ≪ data size even at 10^12 turns.  We distinct those
  edges with a distributed groupby, then union-find the (small) edge
  set and broadcast the alias→canonical dict via ``ray.put``; the
  rewrite is a stateless ``map_batches`` — a broadcast join, not an
  all-to-all shuffle.  Canonical preference: dbpedia IRIs first
  (RDFProcessors.smush(..., "http://dbpedia.org/resource/") —
  RDFGenerator.java:1865-1866), then lexicographic min.
* **Skew-aware dedup.**  Hot entities (one org in ~20% of turns) make
  ``(subj,pred,obj)`` keys like ``(entity:acme_corp, rdf:type, …)``
  massively hot.  Dedup therefore runs two-phase: a per-batch local
  dedup (combiner — collapses each hot key to ≤1 row per block before
  the exchange) and then a global groupby on a uniform 64-bit content
  hash (hash keys are unskewed by construction).  ``salted_group_agg``
  provides the generic salt-then-merge two-phase pattern for non-hash
  group keys.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from pikes_ray.functions.hashing import fact_graph_column

_SAMEAS = "owl:sameAs"


def _is_corpus_iri(x: str) -> bool:
    return x.startswith(("entity:", "dbr:", "time:"))


def _canon_rank(x: str) -> tuple[int, str]:
    """Lower = preferred canonical (dbpedia first, then entity:)."""
    if x.startswith("dbr:"):
        return (0, x)
    if x.startswith("entity:"):
        return (1, x)
    if x.startswith("time:"):
        return (2, x)
    return (3, x)


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb

    def mapping(self) -> dict[str, str]:
        groups: dict[str, list[str]] = {}
        for node in list(self.parent):
            groups.setdefault(self.find(node), []).append(node)
        out: dict[str, str] = {}
        for members in groups.values():
            canon = min(members, key=_canon_rank)
            for m in members:
                if m != canon:
                    out[m] = canon
        return out


def _rewrite_table(batch: pa.Table, mapping: dict[str, str],
                   rewrite_sameas_subj: bool = True) -> pa.Table:
    """Rewrite subj/obj via the alias→canonical mapping; drop
    now-self-referential sameAs rows.

    Pure Arrow kernels (``index_in``/``take``/``coalesce``) — zero-copy
    when nothing matches.  Fact-graph IRIs are NOT recomputed: like the
    reference's smushing (rdfpro rewrites terms, contexts stay), the
    ``fact:<hash>`` name is an emission-time identifier, which also
    keeps this stage allocation-free.

    ``rewrite_sameas_subj=False`` preserves (alias, owl:sameAs, canon)
    rows verbatim instead of collapsing them to self-loops — used by
    the inline/static canonicalization path, where the alias links ARE
    the rdfpro-style smush output.
    """
    if not mapping or len(batch) == 0:
        return batch

    def remap(col):
        aliases = pa.array(list(mapping.keys()), type=col.type)
        canons = pa.array(list(mapping.values()), type=col.type)
        idx = pc.index_in(col, value_set=aliases)
        if pc.count(idx, mode="only_valid").as_py() == 0:
            return col, False
        return pc.coalesce(pc.take(canons, idx), col), True

    subj, s_changed = remap(batch["subj"])
    obj, o_changed = remap(batch["obj"])
    if not (s_changed or o_changed):
        return batch
    if s_changed and not rewrite_sameas_subj:
        keep_orig = pc.equal(batch["pred"], _SAMEAS)
        subj = pc.if_else(keep_orig, batch["subj"], subj)
    batch = batch.set_column(batch.schema.get_field_index("subj"), "subj", subj)
    batch = batch.set_column(batch.schema.get_field_index("obj"), "obj", obj)
    drop = pc.and_(pc.equal(batch["pred"], _SAMEAS),
                   pc.equal(batch["subj"], batch["obj"]))
    if pc.any(drop).as_py():
        batch = batch.filter(pc.invert(drop))
    return batch


def smush_local_batch(batch: pa.Table) -> pa.Table:
    """Doc-local sameAs closure (per-document union-find, no shuffle).

    Assumes a document's triples are within one batch (true directly
    after extraction — the extractor emits them contiguously).
    """
    pred = batch["pred"]
    mask = pc.equal(pred, _SAMEAS)
    if not pc.any(mask).as_py():
        return batch
    # Arrow-filter the sameAs rows FIRST — the Python union-find loop
    # then touches only the (small) edge set, not every triple
    edges = batch.filter(pc.and_(
        mask,
        pc.or_(pc.starts_with(batch["subj"], "conv:"),
               pc.starts_with(batch["obj"], "conv:"))))
    if edges.num_rows == 0:
        return batch
    ufs: dict[tuple, _UnionFind] = {}
    for conv_i, turn_i, s_i, o_i in zip(
            edges["conv_id"].to_pylist(), edges["turn_idx"].to_pylist(),
            edges["subj"].to_pylist(), edges["obj"].to_pylist()):
        ufs.setdefault((conv_i, turn_i), _UnionFind()).union(s_i, o_i)
    # merged mapping is safe: every alias in a doc-local cluster is a
    # doc-scoped IRI (conv:…#…, globally unique); corpus-level IRIs can
    # only ever be the canonical representative here because
    # corpus↔corpus edges are excluded from the local union-find.
    mapping: dict[str, str] = {}
    for uf in ufs.values():
        mapping.update(uf.mapping())
    return _rewrite_table(batch, mapping)


def corpus_sameas_mapping(triples, distributed: bool = False) -> dict[str, str]:
    """Distinct corpus-level sameAs edges → alias→canonical dict.

    The distinct runs distributed (local combiner); only the
    vocabulary-bounded edge set reaches the driver.  With
    ``distributed=True`` the transitive closure itself runs as
    groupby-round label propagation (pipelines/shuffle.
    connected_components) — for graphs whose edge set exceeds driver
    memory; note min-label canon is then used (components there are
    keyed by lexicographic min, and ``dbr:`` sorts before ``entity:``
    so the dbpedia preference is preserved for the common 2-node
    components).
    """

    def edges_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], _SAMEAS))
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.large_string()),
                             "b": pa.array([], pa.large_string())})
        a, b = t["subj"].to_pylist(), t["obj"].to_pylist()
        pairs = sorted({(x, y) for x, y in zip(a, b)
                        if _is_corpus_iri(x) and _is_corpus_iri(y)})
        return pa.table({"a": pa.array([p[0] for p in pairs], pa.large_string()),
                         "b": pa.array([p[1] for p in pairs], pa.large_string())})

    edges = triples.map_batches(edges_only, batch_format="pyarrow", batch_size=None)
    if distributed:
        from pikes_ray.pipelines.shuffle import connected_components

        labels = connected_components(edges, a_col="a", b_col="b").to_pandas()
        return {str(n): str(l) for n, l in zip(labels["node"], labels["label"])
                if str(n) != str(l)}
    uf = _UnionFind()
    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            uf.union(a, b)
    return uf.mapping()


def smush_global(triples, mapping: dict[str, str] | None = None):
    """Corpus-level canonicalization: broadcast alias→canon map, rewrite.

    ``ray.put`` once; each task reads the shared object (zero-copy from
    the object store) — a broadcast join instead of an all-to-all
    shuffle (SURVEY §2.6).
    """
    if mapping is None:
        mapping = corpus_sameas_mapping(triples)
    if not mapping:
        return triples
    ref = ray.put(mapping)

    def rewrite(batch: pa.Table) -> pa.Table:
        return _rewrite_table(batch, ray.get(ref))

    out = triples.map_batches(rewrite, batch_format="pyarrow", batch_size=None)
    # rdfpro-smush semantics: keep alias→canonical owl:sameAs links
    import ray.data as rd

    _pairs = sorted(mapping.items())
    _graphs = fact_graph_column([a for a, _ in _pairs],
                                [_SAMEAS] * len(_pairs),
                                [c for _, c in _pairs])
    alias_rows = [
        {"conv_id": "", "turn_idx": -1, "subj": alias, "pred": _SAMEAS,
         "obj": canon, "graph": g, "conf": 0.0}
        for (alias, canon), g in zip(_pairs, _graphs)
    ]
    if alias_rows:
        links = rd.from_arrow(
            pa.Table.from_pylist(alias_rows, schema=triples.schema().base_schema))
        out = out.union(links)
    return out


# --------------------------------------------------------------------------
# E1 exact dedup — two-phase (combiner + uniform-hash groupby)
# --------------------------------------------------------------------------

_KEY_COLS = ["subj", "pred", "obj", "graph"]


def _local_dedup(df: pd.DataFrame) -> pd.DataFrame:
    # keep the min (conv_id, turn_idx) provenance, max conf — deterministic
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    agg = df.groupby(_KEY_COLS, sort=False, as_index=False).agg(
        conv_id=("conv_id", "first"), turn_idx=("turn_idx", "first"),
        conf=("conf", "max"))
    return agg[["conv_id", "turn_idx", "subj", "pred", "obj", "graph", "conf"]]


def _tail_cpus() -> int:
    """CPU claim for the memory-bound tail stages (whole-block scans /
    rewrites of the triple set).  Driver-side scheduling arg.

    At wide sessions (≥24 CPUs) concurrent page-fault churn from 30+
    processes mapping object-store blocks shows a 100× per-task CPU
    spread (BASELINE.md tail-fix forensics: claim 2 cut sf0.1 32-way
    62.6→31.9 s, and an A/B on a healthy boot still showed a 43 s
    claim-1 outlier vs a stable ~15 s at claim 2).  At narrower
    sessions the halved parallelism costs ~35% of the dedup phase, so
    follow the bandwidth-probe knob (1 on healthy boots)."""
    try:
        width = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        width = 8
    if width >= 24:
        return 2
    from pikes_ray.runtime import task_num_cpus

    return task_num_cpus()


def _add_partition(df: pd.DataFrame, n_parts: int) -> pd.DataFrame:
    key = df["subj"] + "\x1f" + df["pred"] + "\x1f" + df["obj"] + "\x1f" + df["graph"]
    df = df.copy()
    df["_part"] = (pd.util.hash_pandas_object(key, index=False) % n_parts).astype("int64")
    return df


def dedup_exact(triples, n_parts: int = 64):
    """Distributed exact dedup of (subj, pred, obj, graph).

    **Shuffle only what can actually collide.**  Default-graph triples
    (graph == "") are doc-scoped — mention IRIs and document metadata
    embed the document IRI, and the extractor already dedupes within a
    document — so they are globally unique by construction and bypass
    the exchange entirely.  Only instance-layer facts (graph != "",
    corpus-level subjects like ``entity:``/``dbr:``) go through:

    Phase 1 (combiner, no shuffle): per-batch dedup — collapses hot
    repeated facts to ≤1 row per block, so no partition group exceeds
    the block count × its key share regardless of key skew.
    Phase 2: hash-partition the keys into ``n_parts`` uniform buckets
    (content hash ⇒ unskewed) and run ONE vectorized pandas dedup per
    bucket — bounded group count, so the per-group UDF overhead of a
    per-key groupby never appears.
    """
    from pikes_ray.functions.worker import ensure_worker_tuned

    def doc_scoped(t: pa.Table):
        return pc.or_(pc.starts_with(t["subj"], "conv:"),
                      pc.starts_with(t["obj"], "conv:"))

    def bypass(t: pa.Table) -> pa.Table:
        ensure_worker_tuned()
        return t.filter(doc_scoped(t))

    def combiner(t: pa.Table) -> pd.DataFrame:
        ensure_worker_tuned()
        t = t.filter(pc.invert(doc_scoped(t)))
        return _add_partition(_local_dedup(t.to_pandas()), n_parts)

    meta = triples.map_batches(bypass, batch_format="pyarrow", batch_size=None,
                               num_cpus=_tail_cpus())
    local = triples.map_batches(combiner, batch_format="pyarrow", batch_size=None,
                                num_cpus=_tail_cpus())

    return _finish_fact_dedup(local, n_parts).union(meta)


# rows per coalescing-tree batch: ~200 MB of triple rows — small
# enough for one task's heap, big enough that moderate fact
# vocabularies converge to ONE batch and skip the keyed exchange
_TREE_BATCH_ROWS = 2_000_000


def _finish_fact_dedup(local, n_parts: int):
    """Phase 2+3 of the exact fact dedup, shared by ``dedup_exact`` and
    ``dedup_exact_streams``: ``local`` is the per-block-combined stream
    (deduped rows + ``_part`` hash-bucket column).

    **Coalescing tree pass first** (round-5 scaling fix): bundle the
    many small combiner blocks into ~``_TREE_BATCH_ROWS``-row batches
    and re-run the associative local merge inside each.  The per-block
    combiner output GROWS with parallelism (more, smaller annotation
    blocks collapse less), and Ray's sort-based ``groupby`` exchange
    was measured costing ~2 s of fixed overhead at 32 CPUs on a few
    hundred-K rows — the anti-scaling stage behind the flat 16→32
    wall-clock (BASELINE.md round-5 forensics).  When everything fits
    one batch (a single materialized block), that batch saw every row,
    so the result is already globally exact and the keyed exchange is
    SKIPPED.  Larger fact vocabularies still take the hash-bucket
    groupby, on tree-compacted input.

    The merge is associative (per-key min (conv_id, turn_idx) via
    sorted-first + max conf), so re-running it per tree level is
    exact."""
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return _add_partition(_local_dedup(df.drop(columns=["_part"])),
                              n_parts)

    tree = local.map_batches(fold, batch_format="pandas",
                             batch_size=_TREE_BATCH_ROWS,
                             num_cpus=_tail_cpus()).materialize()

    from pikes_ray.schema import TRIPLES_SCHEMA

    def to_schema(t: pa.Table) -> pa.Table:
        return t.select(TRIPLES_SCHEMA.names).cast(TRIPLES_SCHEMA)

    if tree.num_blocks() <= 1:
        # one output block ⇒ one batch saw every row ⇒ already exact
        return tree.map_batches(to_schema, batch_format="pyarrow",
                                batch_size=None)

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        return _local_dedup(g.drop(columns=["_part"]))

    deduped = tree.groupby("_part").map_groups(merge_part,
                                               batch_format="pandas")
    # back to the canonical Arrow schema (pandas round-trip narrows
    # large_string) so union sees one schema; materialize BEFORE the
    # union — composing Union with a live all-to-all Sort in one
    # streaming graph stalls the executor under object-store pressure
    # at ~100M-row inputs (observed at sf1.0: idle workers, spinning
    # scheduler).
    return deduped.map_batches(to_schema, batch_format="pyarrow",
                               batch_size=None).materialize()


def dedup_exact_streams(meta, facts, n_parts: int = 64):
    """Exact dedup when the doc-scoped / corpus-fact split already
    happened upstream (the scope-partitioned spill, kg._spill_split):
    neither branch re-filters rows — ``meta`` streams straight into the
    union and only ``facts`` (bounded by the corpus-fact vocabulary)
    goes through the combiner + hash-bucket exchange."""
    from pikes_ray.functions.worker import ensure_worker_tuned

    def combiner(t: pa.Table) -> pd.DataFrame:
        ensure_worker_tuned()
        return _add_partition(_local_dedup(t.to_pandas()), n_parts)

    local = facts.map_batches(combiner, batch_format="pyarrow",
                              batch_size=None, num_cpus=_tail_cpus())
    return _finish_fact_dedup(local, n_parts).union(meta)


def smush_dedup_streams(meta, facts, n_parts: int = 64):
    """Corpus smush + exact dedup over pre-split streams (the
    scope-partitioned shard/spill layout).

    Same semantics as ``smush_global`` + ``dedup_exact`` over the
    union, without ever reconstituting it: every corpus-level sameAs
    edge lives in ``facts`` (entity:/dbr:/time: on both sides), so the
    vocabulary-bounded mapping comes from one facts scan; both branches
    take the broadcast rewrite (scope is invariant under it — conv:
    IRIs are never aliases); only ``facts`` (+ the alias link rows)
    goes through the dedup exchange."""
    mapping = corpus_sameas_mapping(facts)
    if mapping:
        ref = ray.put(mapping)

        def rewrite(batch: pa.Table) -> pa.Table:
            return _rewrite_table(batch, ray.get(ref))

        meta = meta.map_batches(rewrite, batch_format="pyarrow",
                                batch_size=None, num_cpus=_tail_cpus())
        facts = facts.map_batches(rewrite, batch_format="pyarrow",
                                  batch_size=None, num_cpus=_tail_cpus())
    out = dedup_exact_streams(meta, facts, n_parts)
    if mapping:
        # rdfpro-smush semantics: keep alias→canonical links (unique by
        # construction — no need to pass through the dedup exchange)
        import ray.data as rd

        _pairs = sorted(mapping.items())
        _graphs = fact_graph_column([a for a, _ in _pairs],
                                    [_SAMEAS] * len(_pairs),
                                    [c for _, c in _pairs])
        alias_rows = [
            {"conv_id": "", "turn_idx": -1, "subj": alias, "pred": _SAMEAS,
             "obj": canon, "graph": g, "conf": 0.0}
            for (alias, canon), g in zip(_pairs, _graphs)
        ]
        from pikes_ray.schema import TRIPLES_SCHEMA

        links = rd.from_arrow(
            pa.Table.from_pylist(alias_rows, schema=TRIPLES_SCHEMA))
        out = out.union(links)
    return out


def canonicalize_and_dedup(tr, n_parts: int = 64):
    """Fused corpus canonicalization + exact dedup for the flagship path.

    One materialization of the extracted triples, then:
      - the sameAs vocabulary pass (small driver-side union-find),
      - a meta branch: broadcast rewrite of default-graph triples (no
        shuffle — they are doc-scoped-unique, see dedup_exact),
      - a facts branch: broadcast rewrite → local-dedup combiner →
        bounded hash-partition groupby → vectorized per-bucket dedup,
      - the alias→canonical sameAs links unioned in.

    Equivalent to ``dedup_exact(smush_global(tr))`` (asserted by tests)
    with one less materialization and rewrite fused into each branch.
    """
    import ray.data as rd

    tr = tr.materialize()
    mapping = corpus_sameas_mapping(tr)
    ref = ray.put(mapping)

    # Only triples whose subject AND object are corpus-level IRIs can
    # collide across documents (doc-scoped IRIs embed the doc identity
    # and are deduped within-document by the extractor).  Everything
    # touching a "conv:" IRI bypasses the exchange: at 10^12 turns this
    # keeps the shuffle bounded by the entity/time vocabulary, not the
    # corpus size.
    def _doc_scoped_mask(t: pa.Table):
        return pc.or_(pc.starts_with(t["subj"], "conv:"),
                      pc.starts_with(t["obj"], "conv:"))

    from pikes_ray.functions.worker import ensure_worker_tuned

    def bypass_branch(batch: pa.Table) -> pa.Table:
        ensure_worker_tuned()
        # rewrite only — the rewrite cannot create duplicates here: the
        # doc-scoped side of each row is untouched and unique, and the
        # extractor never emits a canonical (dbr:) term where an alias
        # also appears in the same document (asserted by the
        # fused-vs-staged equivalence test)
        t = batch.filter(_doc_scoped_mask(batch))
        return _rewrite_table(t, ray.get(ref))

    def facts_branch(batch: pa.Table) -> pd.DataFrame:
        ensure_worker_tuned()
        t = batch.filter(pc.invert(_doc_scoped_mask(batch)))
        t = _rewrite_table(t, ray.get(ref))
        return _add_partition(_local_dedup(t.to_pandas()), n_parts)

    meta = tr.map_batches(bypass_branch, batch_format="pyarrow", batch_size=None,
                          num_cpus=_tail_cpus())
    facts = tr.map_batches(facts_branch, batch_format="pyarrow", batch_size=None,
                           num_cpus=_tail_cpus())

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        return _local_dedup(g.drop(columns=["_part"]))

    from pikes_ray.schema import TRIPLES_SCHEMA

    deduped = facts.groupby("_part").map_groups(merge_part, batch_format="pandas")
    deduped = deduped.map_batches(
        lambda t: t.select(TRIPLES_SCHEMA.names).cast(TRIPLES_SCHEMA),
        batch_format="pyarrow", batch_size=None)
    # finish the sort before the union (same executor-stall avoidance
    # as dedup_exact: a live AllToAll composed with Union stalls under
    # object-store pressure at ~100M-row inputs)
    deduped = deduped.materialize()
    out = deduped.union(meta)
    _pairs = sorted(mapping.items())
    _graphs = fact_graph_column([a for a, _ in _pairs],
                                [_SAMEAS] * len(_pairs),
                                [c for _, c in _pairs])
    alias_rows = [
        {"conv_id": "", "turn_idx": -1, "subj": alias, "pred": _SAMEAS,
         "obj": canon, "graph": g, "conf": 0.0}
        for (alias, canon), g in zip(_pairs, _graphs)
    ]
    if alias_rows:
        out = out.union(rd.from_arrow(
            pa.Table.from_pylist(alias_rows, schema=TRIPLES_SCHEMA)))
    return out


# --------------------------------------------------------------------------
# Generic salted two-phase aggregation (SURVEY §2.7 E2 salting pattern)
# --------------------------------------------------------------------------

def salted_group_agg(
    ds,
    key_cols: list[str],
    agg_fn: Callable[[pd.DataFrame], pd.DataFrame],
    salt_buckets: int = 16,
):
    """Two-phase groupby for skewed keys: group on (key, salt) first,
    then merge the ≤``salt_buckets`` partials per key.  ``agg_fn`` must
    be an algebraic combiner (associative per-group reduce returning one
    row per group), e.g. first/min/max/sum — the classic salting recipe
    for hot keys (SURVEY §4 skew row).
    """

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_salt"] = pd.util.hash_pandas_object(df.reset_index(drop=True).index.to_series(),
                                                 index=False) % salt_buckets
        return df

    def phase1(g: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(g.drop(columns=["_salt"]))

    def phase2(g: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(g)

    salted = ds.map_batches(add_salt, batch_format="pandas")
    partial = salted.groupby(key_cols + ["_salt"]).map_groups(phase1, batch_format="pandas")
    return partial.groupby(key_cols).map_groups(phase2, batch_format="pandas")
