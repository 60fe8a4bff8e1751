"""End-to-end pipeline tests on the unit-scale transcripts (SURVEY §5).

Covers: golden determinism, the per-turn text-equality invariant under
stable (conv_id, turn_idx) ordering (BASELINE.json input_hint),
canonicalization/smushing, exact dedup, permutation invariance, and
checkpoint/resume identity.
"""

import glob
import os

import pyarrow.dataset as pads
import pytest

import ray.data as rd

from pikes_ray.pipelines.kg import (
    annotate_transcripts,
    build_graph_checkpointed,
    extract_graph,
    transcripts_to_graph,
)
from pikes_ray.sources.transcripts import read_transcripts, transcripts_dir


def triple_set(ds):
    t = ds.to_pandas()
    return set(zip(t["subj"], t["pred"], t["obj"], t["graph"]))


@pytest.fixture(scope="module")
def unit_graph(ray_session):
    return transcripts_to_graph(transcripts_dir("unit"), concurrency=2).to_pandas()


def test_graph_nonempty_and_schema(unit_graph):
    assert len(unit_graph) > 300
    assert list(sorted(unit_graph.columns)) == sorted(
        ["conv_id", "turn_idx", "subj", "pred", "obj", "graph", "conf"])
    preds = set(unit_graph["pred"])
    # every major extractor code path emits
    for expected in ("rdf:type", "foaf:name", "owl:sameAs", "sem:hasActor",
                     "sem:hasTime", "ks:expressedBy", "ks:textHash", "ks:mod"):
        assert expected in preds, expected


def test_exact_dedup(unit_graph):
    assert not unit_graph.duplicated(["subj", "pred", "obj", "graph"]).any()


def test_copular_identity_and_frame(unit_graph):
    # "X is the president of Y": the copula with a predicate-nominal
    # complement surfaces as a be.01 frame (gold.5/6 ":is a pb:be.01")
    # carrying A1/A2 — but never a bare be.01 event without the A2
    # complement (T3 suppression for auxiliary/verbless cases)
    be_events = set(unit_graph[unit_graph["obj"] == "pb:be.01"]["subj"])
    with_a2 = set(unit_graph[unit_graph["pred"].str.startswith("pb:be.01-a2")]["subj"])
    assert be_events == with_a2


def test_doc_local_smush_removes_pronoun_instances(unit_graph):
    # coref rewrote pronoun instances onto their antecedent entities;
    # pronoun placeholders must not leak labels onto canonical IRIs
    labels = set(unit_graph[unit_graph["pred"] == "rdfs:label"]["obj"])
    assert '"he"' not in labels and '"it"' not in labels and '"she"' not in labels


def test_smush_keeps_alias_links(unit_graph):
    # rdfpro-smush semantics: (alias, owl:sameAs, canon) links survive
    sameas = unit_graph[unit_graph["pred"] == "owl:sameAs"]
    assert len(sameas) > 0
    assert (sameas["subj"].str.startswith("entity:")).any()
    assert (sameas["obj"].str.startswith("dbr:")).any()


def test_fact_graphs_consistent(unit_graph):
    """Fact-graph IRIs are emission-time hashes; canonicalization
    rewrites terms but keeps the graph name (rdfpro-smush semantics).
    Rows that cannot have been rewritten (doc-scoped subject, literal
    object) must hash-match exactly."""
    from pikes_ray.functions.hashing import fact_graph_iri

    facts = unit_graph[(unit_graph["graph"] != "")
                       & unit_graph["subj"].str.startswith("conv:")
                       & unit_graph["obj"].str.startswith('"')]
    assert len(facts) > 50
    for _, r in facts.head(200).iterrows():
        assert r["graph"] == fact_graph_iri(r["subj"], r["pred"], r["obj"])


def test_determinism_two_runs(ray_session, unit_graph):
    again = transcripts_to_graph(transcripts_dir("unit"), concurrency=2).to_pandas()
    a = set(zip(unit_graph["subj"], unit_graph["pred"], unit_graph["obj"], unit_graph["graph"]))
    b = set(zip(again["subj"], again["pred"], again["obj"], again["graph"]))
    assert a == b


def test_per_turn_text_equality_invariant(ray_session):
    """Annotation stages must not disturb (conv_id, turn_idx, text)."""
    src = transcripts_dir("unit")
    raw = pads.dataset(src).to_table().to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    ann = annotate_transcripts(rd.read_parquet(src), concurrency=2) \
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (raw["conv_id"] == ann["conv_id"]).all()
    assert (raw["turn_idx"] == ann["turn_idx"]).all()
    # HTML-unescape is the only permitted text rewrite (M1)
    import html
    assert (raw["text"].map(html.unescape) == ann["text"]).all()


def test_permutation_invariance(ray_session):
    """Triple set is invariant under input row permutation (SURVEY §5.5)."""
    src = transcripts_dir("unit")
    base = triple_set(transcripts_to_graph(src, concurrency=2))
    shuffled = rd.read_parquet(src).random_shuffle(seed=7)
    perm = triple_set(transcripts_to_graph(shuffled, concurrency=2))
    assert base == perm


def test_checkpoint_resume(ray_session, tmp_path, unit_graph):
    """Kill-after-k-shards resume yields the identical final triple set
    with no duplicate partitions (SURVEY §5.3)."""
    src = transcripts_dir("unit")
    out = str(tmp_path / "g")
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))

    # simulate a partial run: only the first shard completes
    from pikes_ray.state import checkpoint as cp

    def per_shard(shard_files):
        ds = rd.read_parquet(shard_files)
        ds = annotate_transcripts(ds, concurrency=2)
        return extract_graph(ds, canonicalize=False, dedup=False)

    shards = cp.shard_inputs(files, 4)
    cp.run_checkpointed(shards[0], out, per_shard, n_shards=1)
    assert cp.completed_shards(out) == {0}

    # full (resumed) run over all shards into the same dir: shard-0 must
    # be skipped (its lineage manifest exists) and the final graph equal
    # a from-scratch build
    summary = build_graph_checkpointed(src, out, n_shards=4)
    assert summary["skipped"] >= 1
    final = pads.dataset(summary["graph_dir"]).to_table().to_pandas()
    got = set(zip(final["subj"], final["pred"], final["obj"], final["graph"]))
    want = set(zip(unit_graph["subj"], unit_graph["pred"], unit_graph["obj"], unit_graph["graph"]))
    assert got == want


def test_fused_equals_staged(ray_session):
    """The fused KGStage path and the composable staged path must emit
    the identical triple set (they call the same functions)."""
    src = transcripts_dir("unit")
    fused = triple_set(transcripts_to_graph(src, concurrency=2, fused=True))
    staged = triple_set(transcripts_to_graph(src, concurrency=2, fused=False))
    assert fused == staged


def test_spill_dir_pin_equals_materialize(ray_session, tmp_path):
    """transcripts_to_graph(spill_dir=...) pins the triple set to
    parquet instead of the object store — identical output."""
    from pikes_ray.pipelines.kg import transcripts_to_graph
    from pikes_ray.sources.transcripts import transcripts_dir

    src = transcripts_dir("unit")
    a = transcripts_to_graph(src, concurrency=2).to_pandas()
    b = transcripts_to_graph(src, concurrency=2,
                             spill_dir=str(tmp_path / "spill")).to_pandas()
    key = ["subj", "pred", "obj", "graph"]
    pa_ = a[key].sort_values(key).reset_index(drop=True)
    pb_ = b[key].sort_values(key).reset_index(drop=True)
    assert pa_.equals(pb_)


def test_incremental_append_hash_keying(ray_session, tmp_path, unit_graph):
    """keying="hash": appending fragments to a grown corpus re-runs only
    the basename-hash groups that received new files; the final graph
    equals a from-scratch build over the full corpus."""
    import shutil

    src = transcripts_dir("unit")
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    assert len(files) >= 6
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for f in files[:-2]:
        shutil.copy(f, corpus)
    out = str(tmp_path / "g")

    s1 = build_graph_checkpointed(str(corpus), out, n_shards=4, keying="hash")
    assert s1["ran"] >= 1 and s1["skipped"] == 0

    # idempotent re-run: every group skips
    s2 = build_graph_checkpointed(str(corpus), out, n_shards=4, keying="hash")
    assert s2["ran"] == 0 and s2["skipped"] == s2["shards"]

    # append the remaining fragments → only their groups re-run
    for f in files[-2:]:
        shutil.copy(f, corpus)
    s3 = build_graph_checkpointed(str(corpus), out, n_shards=4, keying="hash")
    assert s3["skipped"] >= 1           # untouched groups kept their manifests
    assert s3["ran"] <= 2               # ≤ one group per appended file

    final = pads.dataset(s3["graph_dir"]).to_table().to_pandas()
    got = set(zip(final["subj"], final["pred"], final["obj"], final["graph"]))
    want = set(zip(unit_graph["subj"], unit_graph["pred"],
                   unit_graph["obj"], unit_graph["graph"]))
    assert got == want


def test_spill_guard_estimates_dataset_sources(ray_session, monkeypatch):
    """The 40%-of-store parquet-pin guard engages for Dataset (non-path)
    sources too, via input-file sizes or the in-memory estimate
    (VERDICT r2 item 8)."""
    from pikes_ray.pipelines import kg

    ds = read_transcripts(transcripts_dir("unit"))

    # path source: below threshold with a huge mocked store → no spill
    big_store = {"object_store_memory": float(1 << 50)}
    monkeypatch.setattr("ray.cluster_resources", lambda: big_store)
    assert kg._auto_spill_dir(transcripts_dir("unit")) is None
    assert kg._auto_spill_dir(ds) is None

    # tiny mocked store → both source kinds trip the guard
    tiny_store = {"object_store_memory": 1024.0}
    monkeypatch.setattr("ray.cluster_resources", lambda: tiny_store)
    d1 = kg._auto_spill_dir(transcripts_dir("unit"))
    d2 = kg._auto_spill_dir(ds)
    assert d1 is not None and d2 is not None
    import shutil
    shutil.rmtree(d1, ignore_errors=True)
    shutil.rmtree(d2, ignore_errors=True)

    # a Dataset with no input files still yields a usable estimate
    import pandas as pd
    mem_ds = rd.from_pandas(pd.DataFrame({"text": ["x" * 100] * 50}))
    assert kg._estimate_parquet_bytes(mem_ds)


def test_spill_split_refuses_foreign_dirs(ray_session, tmp_path):
    """_spill_split never rmtree()s a directory it doesn't recognize
    (ADVICE r2: unrelated data must not be deleted silently)."""
    from pikes_ray.pipelines.kg import transcripts_to_graph

    foreign = tmp_path / "precious"
    foreign.mkdir()
    (foreign / "keep.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing"):
        transcripts_to_graph(transcripts_dir("unit"), concurrency=2,
                             spill_dir=str(foreign)).to_pandas()
    assert (foreign / "keep.txt").read_text() == "do not delete"

    # a previous spill layout (scope=* only) IS reclaimed
    prior = tmp_path / "spill"
    (prior / "scope=doc").mkdir(parents=True)
    (prior / "scope=doc" / "old.parquet").write_bytes(b"x")
    out = transcripts_to_graph(transcripts_dir("unit"), concurrency=2,
                               spill_dir=str(prior)).to_pandas()
    assert len(out) > 300
