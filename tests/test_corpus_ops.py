"""Tests for the round-3 corpus ops: TF-IDF, C4 line cleaning,
corpus-frequency line dedup, and KG PageRank."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pikes_ray.ops import graph as G
from pikes_ray.ops import text as T


# --------------------------------------------------------------------------
# TF-IDF
# --------------------------------------------------------------------------

@pytest.fixture()
def tfidf_docs(ray_session):
    rows = [
        {"doc_id": 0, "text": "apple apple banana"},
        {"doc_id": 1, "text": "apple banana banana cherry"},
        {"doc_id": 2, "text": "cherry cherry cherry durian"},
        {"doc_id": 3, "text": ""},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_doc_frequencies(ray_session, tfidf_docs):
    df = T.doc_frequencies(tfidf_docs).to_pandas().set_index("term")["df"]
    assert df.to_dict() == {"apple": 2, "banana": 2, "cherry": 2, "durian": 1}
    df2 = T.doc_frequencies(tfidf_docs, min_df=2).to_pandas()
    assert set(df2["term"]) == {"apple", "banana", "cherry"}


def test_tfidf_top_terms_matches_manual(ray_session, tfidf_docs):
    out = (T.tfidf_top_terms(tfidf_docs, k=2).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    n = 4

    def unats(df):
        return math.floor(math.log((n + 1) / (df + 1)) * 1e6 + 0.5)

    # doc 0: apple tf=2 df=2, banana tf=1 df=2 → apple wins
    d0 = out[out["doc_id"] == 0]
    assert list(d0["term"]) == ["apple", "banana"]
    assert list(d0["score_unats"]) == [2 * unats(2), 1 * unats(2)]
    assert list(d0["rank"]) == [1, 2]
    # doc 2: cherry tf=3 dominates; durian (df=1) beats nothing else
    d2 = out[out["doc_id"] == 2]
    assert list(d2["term"]) == ["cherry", "durian"]
    # empty doc emits no rows
    assert not (out["doc_id"] == 3).any()
    # equal scores tie-break by term asc: doc 1 banana(tf2,df2) >
    # apple(tf1,df2)=cherry(tf1,df2) → apple before cherry at rank 2
    d1 = out[out["doc_id"] == 1]
    assert list(d1["term"]) == ["banana", "apple"]


def test_tfidf_min_df_and_max_vocab(ray_session, tfidf_docs):
    out = T.tfidf_top_terms(tfidf_docs, k=3, min_df=2).to_pandas()
    assert "durian" not in set(out["term"])
    # max_vocab keeps highest-df terms with (df desc, term asc) cutoff
    out2 = T.tfidf_top_terms(tfidf_docs, k=3, max_vocab=3).to_pandas()
    assert set(out2["term"]) == {"apple", "banana", "cherry"}


# --------------------------------------------------------------------------
# C4 line filter
# --------------------------------------------------------------------------

def test_c4_line_filter_rules(ray_session):
    doc0 = "\n".join([
        "This sentence is properly terminated.",   # kept
        "too short.",                               # < 3 words
        "No terminal punctuation here",             # no . ! ? "
        "Enable javascript to view this page.",     # blocklist word
        "  An indented quote ends well!  ",         # kept (stripped)
    ])
    doc1 = "Contains lorem ipsum filler text, so the doc is dropped."
    doc2 = "A code block { appears } in this doc."
    doc3 = ""
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [doc0, doc1, doc2, doc3]}))
    out = (ds.map_batches(T.c4_line_filter, batch_format="pandas")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "n_lines"] == 5 and out.loc[0, "n_kept"] == 2
    assert bool(out.loc[0, "keep_doc"])
    assert out.loc[0, "clean_text"] == (
        "This sentence is properly terminated.\n"
        "  An indented quote ends well!  ")
    # doc-level blocklist: lorem ipsum / '{' → dropped even with kept lines
    assert not bool(out.loc[1, "keep_doc"]) and out.loc[1, "n_kept"] == 1
    assert not bool(out.loc[2, "keep_doc"])
    assert not bool(out.loc[3, "keep_doc"]) and out.loc[3, "n_kept"] == 0


# --------------------------------------------------------------------------
# corpus line dedup
# --------------------------------------------------------------------------

@pytest.fixture()
def line_docs(ray_session):
    boiler = "Subscribe to our newsletter."
    footer = "All rights reserved."
    rows = []
    for i in range(12):
        lines = [boiler, f"Unique content line number {i}."]
        if i % 2 == 0:
            lines.append(footer)
        if i == 11:
            lines = [boiler, footer]        # all-boilerplate doc
        rows.append({"doc_id": i, "text": "\n".join(lines)})
    return rd.from_pandas(pd.DataFrame(rows))


def _canon(df):
    return df.sort_values("doc_id").reset_index(drop=True)


def test_line_dedup_broadcast(ray_session, line_docs):
    out = _canon(T.line_dedup(line_docs, threshold=3,
                              mode="broadcast").to_pandas())
    assert len(out) == 12
    # boilerplate (12×) and footer (7×) removed; unique lines kept
    assert out.loc[0, "clean_text"] == "Unique content line number 0."
    assert out.loc[0, "n_removed"] == 2 and out.loc[0, "n_lines"] == 3
    assert out.loc[1, "n_removed"] == 1
    # the all-boilerplate doc survives with empty text
    assert out.loc[11, "clean_text"] == "" and out.loc[11, "n_removed"] == 2


def test_line_dedup_join_equals_broadcast(ray_session, line_docs):
    a = _canon(T.line_dedup(line_docs, threshold=3,
                            mode="broadcast").to_pandas())
    b = _canon(T.line_dedup(line_docs, threshold=3, mode="join",
                            n_parts=5).to_pandas())
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_line_dedup_threshold_keeps_rare(ray_session, line_docs):
    out = _canon(T.line_dedup(line_docs, threshold=13,
                              mode="broadcast").to_pandas())
    assert (out["n_removed"] == 0).all()


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

def _edges(pairs):
    return rd.from_pandas(pd.DataFrame(
        {"subj": [a for a, _ in pairs], "obj": [b for _, b in pairs]}))


def test_pagerank_cycle_uniform(ray_session):
    r = G.pagerank(_edges([("a", "b"), ("b", "a")]), n_iter=10)
    assert np.allclose(r["rank"], [0.5, 0.5])
    assert abs(r["rank"].sum() - 1.0) < 1e-9


def test_pagerank_dangling_chain(ray_session):
    # a -> b, b dangling; one iteration from uniform has closed form
    r = G.pagerank(_edges([("a", "b")]), n_iter=1, damping=0.85)
    r = r.set_index("node")["rank"]
    base = 0.15 / 2 + 0.85 * 0.5 / 2
    assert abs(r["a"] - base) < 1e-12
    assert abs(r["b"] - (base + 0.85 * 0.5)) < 1e-12
    assert abs(r.sum() - 1.0) < 1e-12


def test_pagerank_star_hub_wins(ray_session):
    edges = [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")]
    top = G.pagerank_top_k(_edges(edges), k=1, n_iter=30)
    assert top.loc[0, "node"] == "hub"


def test_pagerank_join_equals_broadcast(ray_session):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "a"), ("e", "d"), ("e", "a")]
    rb = G.pagerank(_edges(edges), n_iter=8, mode="broadcast")
    rj = G.pagerank(_edges(edges), n_iter=8, mode="join",
                    n_parts=3).to_pandas()
    rb = rb.sort_values("node").reset_index(drop=True)
    rj = rj.sort_values("node").reset_index(drop=True)
    assert list(rb["node"]) == list(rj["node"])
    assert np.allclose(rb["rank"], rj["rank"], atol=1e-12)


def test_pagerank_self_loops_dropped_and_empty(ray_session):
    r = G.pagerank(_edges([("a", "a")]), n_iter=3)
    assert len(r) == 0
    r2 = G.pagerank(_edges([("a", "a"), ("a", "b")]), n_iter=5)
    assert set(r2["node"]) == {"a", "b"}
    assert abs(r2["rank"].sum() - 1.0) < 1e-9


# --------------------------------------------------------------------------
# distributed spherical k-means
# --------------------------------------------------------------------------

def _cluster_fixture(n_per=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = np.eye(dim)[:3] * 10          # 3 well-separated directions
    rows = []
    vid = 0
    truth = []
    for ci, c in enumerate(centers):
        for _ in range(n_per):
            v = c + rng.normal(0, 0.3, size=dim)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            truth.append(ci)
            vid += 1
    return pd.DataFrame(rows), np.asarray(truth)


def test_kmeans_recovers_separated_clusters(ray_session):
    from pikes_ray.ops.cluster import cluster_sizes, kmeans

    pdf, truth = _cluster_fixture()
    ds = rd.from_pandas(pdf)
    C, assignments, stats = kmeans(ds, n_clusters=3, n_iter=8, seed=1,
                                   init_sample=64)
    a = assignments.to_pandas().sort_values("vec_id")
    # label-permutation-invariant agreement: each truth cluster maps to
    # exactly one predicted cluster and vice versa
    m = pd.crosstab(truth, a["cluster"].to_numpy())
    assert (m.gt(0).sum(axis=1) == 1).all()
    assert (m.gt(0).sum(axis=0) == 1).all()
    assert sorted(stats["sizes"]) == [40, 40, 40]
    # inertia non-increasing across Lloyd's iterations (tolerating the
    # 1e-12 float-merge jitter)
    it = stats["inertia_by_iter"]
    assert all(b <= a_ + 1e-9 for a_, b in zip(it, it[1:]))
    cs = cluster_sizes(assignments)
    assert list(cs["n"]) == [40, 40, 40]
    assert (cs["mean_cos"] > 0.95).all()


def test_kmeans_input_order_invariant(ray_session):
    from pikes_ray.ops.cluster import kmeans

    pdf, _ = _cluster_fixture()
    ds1 = rd.from_pandas(pdf)
    ds2 = rd.from_pandas(pdf.sample(frac=1.0, random_state=9)
                         .reset_index(drop=True))
    C1, a1, _ = kmeans(ds1, n_clusters=3, n_iter=5, seed=1, init_sample=64)
    C2, a2, _ = kmeans(ds2, n_clusters=3, n_iter=5, seed=1, init_sample=64)
    assert np.allclose(C1, C2, atol=1e-9)
    p1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    p2 = a2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert (p1["cluster"] == p2["cluster"]).all()


def test_kmeans_k_exceeds_n(ray_session):
    from pikes_ray.ops.cluster import kmeans

    pdf = pd.DataFrame({"vec_id": [0, 1],
                        "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    C, assignments, stats = kmeans(rd.from_pandas(pdf), n_clusters=5,
                                   n_iter=3, seed=0)
    assert stats["k"] == 2 and len(assignments.to_pandas()) == 2


# --------------------------------------------------------------------------
# k-hop subgraph extraction
# --------------------------------------------------------------------------

def _khop_canon(ds):
    return (ds.to_pandas().sort_values(["src", "dst"])
            .reset_index(drop=True))


def test_khop_out_direction(ray_session):
    from pikes_ray.ops.graph import khop_subgraph

    tr = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    h1 = _khop_canon(khop_subgraph(tr, ["a"], k=1))
    assert list(zip(h1["src"], h1["dst"], h1["hop"])) == [("a", "b", 1)]
    h2 = _khop_canon(khop_subgraph(tr, ["a"], k=2))
    assert list(zip(h2["src"], h2["dst"], h2["hop"])) == [
        ("a", "b", 1), ("b", "c", 2)]
    # the disconnected x->y never appears even at large k
    h9 = _khop_canon(khop_subgraph(tr, ["a"], k=9))
    assert "x" not in set(h9["src"])


def test_khop_directions_and_first_hop_dedup(ray_session):
    from pikes_ray.ops.graph import khop_subgraph

    tr = _edges([("a", "b"), ("b", "a"), ("c", "b")])
    # "in": edges pointing AT the frontier
    hin = _khop_canon(khop_subgraph(tr, ["b"], k=1, direction="in"))
    assert list(zip(hin["src"], hin["dst"])) == [("a", "b"), ("c", "b")]
    # "both" from a, k=2: a->b and b->a are hop-1 (both touch a);
    # c->b reached at hop 2; first-hop dedup keeps hop 1 rows once
    hb = _khop_canon(khop_subgraph(tr, ["a"], k=2, direction="both"))
    assert list(zip(hb["src"], hb["dst"], hb["hop"])) == [
        ("a", "b", 1), ("b", "a", 1), ("c", "b", 2)]


def test_khop_empty_seed_and_no_match(ray_session):
    from pikes_ray.ops.graph import khop_subgraph

    tr = _edges([("a", "b")])
    out = khop_subgraph(tr, ["zzz"], k=3).to_pandas()
    assert len(out) == 0


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fpr(ray_session):
    from pikes_ray.ops.sketch import bloom_build, bloom_filter_ds

    keys = pd.DataFrame({"url": [f"https://site{i}.example/x" for i in
                                 range(2000)]})
    bloom = bloom_build(rd.from_pandas(keys), "url", m_bits=1 << 15, k=7)
    # every inserted key is a member (no false negatives)
    flagged = bloom_filter_ds(rd.from_pandas(keys), "url", bloom,
                              mode="flag").to_pandas()
    assert flagged["bloom_member"].all()
    # FPR on 2000 fresh keys stays near the design point (~2.5% at
    # n=2000, m=32768, k=7; assert a generous bound)
    fresh = pd.DataFrame({"url": [f"https://other{i}.example/y"
                                  for i in range(2000)]})
    fp = bloom_filter_ds(rd.from_pandas(fresh), "url", bloom,
                         mode="flag").to_pandas()["bloom_member"].sum()
    assert fp < 200
    # drop_members keeps only definite non-members
    kept = bloom_filter_ds(rd.from_pandas(fresh), "url", bloom).to_pandas()
    assert len(kept) == 2000 - fp


def test_bloom_merge_is_partition_invariant(ray_session):
    from pikes_ray.ops.sketch import bloom_build

    keys = pd.DataFrame({"u": [f"k{i}" for i in range(500)]})
    b1 = bloom_build(rd.from_pandas(keys), "u", m_bits=1 << 12, k=5)
    b2 = bloom_build(rd.from_pandas(keys).repartition(7), "u",
                     m_bits=1 << 12, k=5)
    assert (b1 == b2).all()


# --------------------------------------------------------------------------
# unigram-LM log-probability
# --------------------------------------------------------------------------

def test_unigram_logprob_manual(ray_session):
    import math

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a b", "b c", ""]}))
    out = (T.unigram_logprob(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # corpus: a=2 b=2 c=1, total=5, V=3, denom=8
    denom = 8.0

    def lp(c):
        return math.floor(math.log((c + 1) / denom) * 1e6 + 0.5)

    assert list(out["doc_id"]) == [0, 1]      # empty doc emits no row
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "sum_lp_unats"] == 2 * lp(2) + lp(2)
    assert out.loc[1, "sum_lp_unats"] == lp(2) + lp(1)
    # rarer tokens → lower (more negative) average log-prob
    avg0 = out.loc[0, "sum_lp_unats"] / out.loc[0, "n_tokens"]
    avg1 = out.loc[1, "sum_lp_unats"] / out.loc[1, "n_tokens"]
    assert avg1 < avg0


def test_unigram_logprob_max_vocab_unk(ray_session):
    import math

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0], "text": ["a a a b"]}))
    # max_vocab=1 keeps only 'a'; 'b' scores as unseen
    out = T.unigram_logprob(docs, max_vocab=1).to_pandas()
    denom = 6.0    # total=4, V=2 (V counted BEFORE the cap)
    lp_a = math.floor(math.log(4 / denom) * 1e6 + 0.5)
    unk = math.floor(math.log(1 / denom) * 1e6 + 0.5)
    assert out.loc[0, "sum_lp_unats"] == 3 * lp_a + unk


def test_khop_join_mode_equals_broadcast(ray_session):
    from pikes_ray.ops.graph import khop_subgraph

    tr = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                 ("b", "a"), ("x", "y")])
    for direction in ("out", "both"):
        bc = _khop_canon(khop_subgraph(tr, ["a", "b"], k=3,
                                       direction=direction))
        # broadcast_node_limit=1 < |seeds| → switches to join at hop 1
        jn = _khop_canon(khop_subgraph(tr, ["a", "b"], k=3,
                                       direction=direction,
                                       broadcast_node_limit=1, n_parts=3))
        pd.testing.assert_frame_equal(bc, jn[bc.columns.tolist()])


# --------------------------------------------------------------------------
# leakage-safe split
# --------------------------------------------------------------------------

def test_leakage_safe_split_keeps_clusters_together(ray_session):
    from pikes_ray.ops.dedup import minhash_lsh_clusters
    from pikes_ray.ops.sample import leakage_safe_split

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(40):
        if i % 4 == 0:
            text = base + f" tail{i % 8}"          # near-dup family
        else:
            text = f"completely unrelated document number {i} " \
                   f"with its own words {i * 7} {i * 13}"
        rows.append({"doc_id": i, "text": text})
    ds = rd.from_pandas(pd.DataFrame(rows))
    cmap = minhash_lsh_clusters(ds, threshold=0.6)
    assert len(cmap) >= 2                           # sanity: found dups
    train, test = leakage_safe_split(ds, "doc_id", cmap,
                                     test_fraction=0.5, seed=3)
    tr = set(train.to_pandas()["doc_id"])
    te = set(test.to_pandas()["doc_id"])
    assert tr.isdisjoint(te) and tr | te == set(range(40))
    # no near-dup cluster straddles the split
    for member, rep in cmap.items():
        same = {m for m, r in cmap.items() if r == rep}
        assert same <= tr or same <= te
    # determinism under repartition
    train2, _ = leakage_safe_split(ds.repartition(7), "doc_id", cmap,
                                   test_fraction=0.5, seed=3)
    assert set(train2.to_pandas()["doc_id"]) == tr

    # --- Dataset cluster assignment (as_dataset=True): identical
    # membership to the driver dict, and the join-based split variant
    # reproduces the broadcast split bit-for-bit with the map never on
    # the driver (VERDICT r3 item 3)
    from pikes_ray.ops.sample import leakage_safe_split_ds

    cds = minhash_lsh_clusters(ds, threshold=0.6, as_dataset=True)
    cdf = cds.to_pandas()
    assert {(int(a), int(b)) for a, b in zip(cdf["doc_id"], cdf["rep"])} \
        == {(m, r) for m, r in cmap.items()}
    train3, test3 = leakage_safe_split_ds(ds, "doc_id", cds,
                                          test_fraction=0.5, seed=3,
                                          n_parts=5)
    assert set(train3.to_pandas()["doc_id"]) == tr
    assert set(test3.to_pandas()["doc_id"]) == te
    assert train3.schema().names == ds.schema().names


def test_pagerank_join_mode_with_dangling(ray_session):
    # b and d have no out-edges → dangling mass flows through the join
    # path's inner-join + driver-sum; must equal the broadcast path
    edges = [("a", "b"), ("a", "d"), ("c", "a"), ("c", "d")]
    rb = G.pagerank(_edges(edges), n_iter=6, mode="broadcast")
    rj = G.pagerank(_edges(edges), n_iter=6, mode="join",
                    n_parts=3).to_pandas()
    rb = rb.sort_values("node").reset_index(drop=True)
    rj = rj.sort_values("node").reset_index(drop=True)
    assert list(rb["node"]) == list(rj["node"])
    assert np.allclose(rb["rank"], rj["rank"], atol=1e-12)
    assert abs(rj["rank"].sum() - 1.0) < 1e-9
