"""Robustness: quarantine surfacing, canonicalize idempotence, fuzzing."""

import datetime as dt

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from pikes_ray.schema import TRANSCRIPT_SCHEMA
from pikes_ray.stages.fused import KGStage


def _batch(texts):
    rows = [{"conv_id": "c", "turn_idx": i, "role": "user", "text": t,
             "tool": "", "ts": dt.datetime(2024, 1, 1)}
            for i, t in enumerate(texts)]
    return pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA)


def test_quarantine_surfaces_in_graph():
    stage = KGStage(max_text_len=40)
    out = stage(_batch(["x" * 100, "Acme Corp acquired Beta LLC."])).to_pylist()
    quarantined = [r for r in out if r["pred"] == "ks:quarantined"]
    assert len(quarantined) == 1 and quarantined[0]["turn_idx"] == 0
    # the quarantined turn still gets its metadata, nothing else
    t0 = [r for r in out if r["turn_idx"] == 0]
    assert all(r["subj"].startswith("conv:") for r in t0)
    assert any(r["pred"] == "sem:hasActor" for r in out if r["turn_idx"] == 1)


def test_canonicalize_idempotent(ray_session):
    """smush_global + dedup applied twice == once (SURVEY §5.5)."""
    from pikes_ray.pipelines.canonicalize import dedup_exact, smush_global
    from pikes_ray.pipelines.kg import transcripts_to_graph
    from pikes_ray.sources.transcripts import transcripts_dir

    g1 = transcripts_to_graph(transcripts_dir("unit"), concurrency=2).materialize()
    g2 = dedup_exact(smush_global(g1.materialize()).materialize())
    a = set(map(tuple, g1.to_pandas()[["subj", "pred", "obj", "graph"]].values))
    b = set(map(tuple, g2.to_pandas()[["subj", "pred", "obj", "graph"]].values))
    assert a == b


_stage = KGStage()


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_fuzz_any_text_never_crashes(text):
    out = _stage(_batch([text]))
    # determinism on arbitrary input
    again = _stage(_batch([text]))
    assert out.to_pylist() == again.to_pylist()
    # metadata always present
    preds = set(out["pred"].to_pylist())
    assert "ks:textHash" in preds


def test_connected_components_distributed(ray_session):
    import pandas as pd
    import ray.data as rd

    from pikes_ray.pipelines.shuffle import connected_components

    # chain 0-1-2-3, pair 10-11, singleton via self-edge 20-20
    edges = rd.from_pandas(pd.DataFrame(
        {"a": [0, 1, 2, 10, 20], "b": [1, 2, 3, 11, 20]}))
    out = connected_components(edges, n_parts=4).to_pandas()
    got = dict(zip(out["node"].astype(int), out["label"].astype(int)))
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[10] == got[11] == 10
    assert got[20] == 20


def test_corpus_mapping_distributed_matches_unionfind(ray_session):
    from pikes_ray.pipelines.canonicalize import corpus_sameas_mapping
    from pikes_ray.pipelines.kg import transcripts_to_graph
    from pikes_ray.sources.transcripts import transcripts_dir

    tr = transcripts_to_graph(transcripts_dir("unit"), concurrency=2,
                              dedup=False).materialize()
    uf_map = corpus_sameas_mapping(tr, distributed=False)
    cc_map = corpus_sameas_mapping(tr, distributed=True)
    assert uf_map == cc_map


def test_connected_components_long_chain_converges(ray_session):
    """A chain of diameter > the old round cap must fully propagate
    (VERDICT r1 finding: silent split of deep components)."""
    import pandas as pd
    import ray.data as rd

    from pikes_ray.pipelines.shuffle import connected_components

    n = 60                      # diameter-60 chain: 0-1-...-60
    edges = rd.from_pandas(pd.DataFrame({"a": list(range(n)),
                                         "b": list(range(1, n + 1))}))
    # pointer-doubling flatten → O(log diameter) rounds, not O(diameter)
    out = connected_components(edges, max_rounds=12, n_parts=4).to_pandas()
    assert set(out["label"].astype(int)) == {0}


def test_connected_components_nonconvergence_raises(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from pikes_ray.pipelines.shuffle import connected_components

    n = 120                    # deep enough that 2 rounds cannot finish
    edges = rd.from_pandas(pd.DataFrame({"a": list(range(n)),
                                         "b": list(range(1, n + 1))}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2, n_parts=4)
    with pytest.warns(UserWarning, match="did not converge"):
        connected_components(edges, max_rounds=2, n_parts=4, strict=False)


def test_partitioned_group_map_empty_output_schema(ray_session):
    """All-empty sub-group outputs must still yield fn's OUTPUT schema,
    not the input schema (ADVICE r1: mixed-schema blocks break strict
    consumers)."""
    import pandas as pd
    import ray.data as rd

    from pikes_ray.pipelines.shuffle import partitioned_group_map

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # singleton groups → never any pair rows (the LSH-bucket shape)
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})

    out = partitioned_group_map(ds, ["k"], pairs, n_parts=2)
    assert out.schema().names == ["a", "b"] and out.count() == 0


def test_checkpoint_skip_requires_matching_inputs(ray_session, tmp_path):
    """A shard manifest from different inputs must NOT be skipped
    (ADVICE r1: positional sharding + stale manifests = stale output)."""
    import glob as g
    import os

    import ray.data as rd

    from pikes_ray.sources.transcripts import transcripts_dir
    from pikes_ray.state import checkpoint as cp

    src = transcripts_dir("unit")
    files = sorted(g.glob(os.path.join(src, "*.parquet")))
    out = str(tmp_path / "ckpt")

    def ident(shard_files):
        return rd.read_parquet(shard_files)

    cp.run_checkpointed(files[:1], out, ident, n_shards=1)
    assert cp.completed_shards(out) == {0}
    # same shard index, different inputs → must re-run, not skip
    import pytest

    with pytest.warns(UserWarning, match="re-running"):
        summary = cp.run_checkpointed(files[1:2], out, ident, n_shards=1)
    assert summary["skipped"] == 0 and summary["ran"] == 1
