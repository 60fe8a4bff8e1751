"""User-extension surface (SURVEY §2.10): registry, import-path
injection, config-driven pipeline composition."""

import pyarrow as pa
import pytest

import ray.data as rd

from pikes_ray.extension import (
    PipelineSpec, StageSpec, build_pipeline, register_stage, resolve)


def upper_text_stage(batch: pa.Table) -> pa.Table:
    """A user-supplied stateless stage (referenced by import path)."""
    import pyarrow.compute as pc

    idx = batch.schema.get_field_index("text")
    return batch.set_column(idx, "text", pc.utf8_upper(batch["text"]))


class SuffixStage:
    """A user-supplied stateful stage (constructor kwargs + actor pool)."""

    def __init__(self, suffix: str = "!"):
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = batch.schema.get_field_index("text")
        col = pc.binary_join_element_wise(batch["text"], self.suffix, "")
        return batch.set_column(idx, "text", col)


def test_resolve_registry_and_import_path():
    from pikes_ray.stages.extract import extract_batch

    assert resolve("extract") is extract_batch            # registry name
    assert resolve("pikes_ray.stages.extract:extract_batch") is extract_batch
    assert resolve("pikes_ray.stages.extract.extract_batch") is extract_batch
    with pytest.raises(ValueError):
        resolve("nodots")


def test_custom_pipeline_spec(ray_session):
    register_stage("upper", "tests.test_extension:upper_text_stage")
    spec = PipelineSpec.from_dict({
        "stages": [
            {"stage": "upper"},
            {"stage": "tests.test_extension:SuffixStage",
             "kwargs": {"suffix": "?"}, "concurrency": 1},
        ],
    })
    ds = rd.from_arrow(pa.table({"text": ["a b", "c"]}))
    out = build_pipeline(ds, spec).to_pandas()
    assert sorted(out["text"]) == ["A B?", "C?"]


def test_builtin_chain_equals_staged_pipeline(ray_session):
    """normalize → annotate → filter → extract → smush_local via the
    declarative spec must equal the hand-wired staged pipeline."""
    from pikes_ray.pipelines.kg import annotate_transcripts, extract_graph
    from pikes_ray.sources.transcripts import transcripts_dir

    src = transcripts_dir("unit")
    spec = PipelineSpec(stages=[
        StageSpec("annotate", concurrency=2),     # AnnotatorStage normalizes too
        StageSpec("filter", concurrency=1),
        StageSpec("extract"),
        StageSpec("smush_local", batch_size=None),
    ])
    got = build_pipeline(rd.read_parquet(src), spec).to_pandas()
    want = extract_graph(annotate_transcripts(rd.read_parquet(src),
                                              concurrency=2),
                         canonicalize=False, dedup=False).to_pandas()
    key = ["subj", "pred", "obj", "graph"]
    g = set(map(tuple, got[key].itertuples(index=False)))
    w = set(map(tuple, want[key].itertuples(index=False)))
    assert g == w and len(g)


def test_cli_pipeline_subcommand(tmp_path):
    """`python -m pikes_ray pipeline --config spec.json` — the
    properties-file surface end-to-end (own Ray session, subprocess)."""
    import json
    import subprocess
    import sys

    from pikes_ray.sources.transcripts import transcripts_dir

    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps(
        {"stages": [{"stage": "normalize"}]}))
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "pikes_ray", "pipeline",
         "--config", str(spec), "--input", transcripts_dir("unit"),
         "--out", str(out), "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo", env={**__import__("os").environ,
                               "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0 and res["stages"] == ["normalize"]
