"""CLI entry points (≙ the reference's rdfpro-style subcommand dispatch,
pikes-rdf/.../Main.java:94-99 and the tintop server/orchestrator mains).

    python -m pikes_ray ingest     --input DIR_OR_JSONL --out DIR
    python -m pikes_ray annotate   --input DIR --out DIR
    python -m pikes_ray extract    --input DIR --out DIR [--shards N]
                                   [--incremental] [--naf]
    python -m pikes_ray canonicalize --input TRIPLES_DIR --out DIR
    python -m pikes_ray materialize  --input DIR --out DIR [--ntriples]
    python -m pikes_ray eval       --pred DIR --gold DIR
    python -m pikes_ray stats      --input DIR
    python -m pikes_ray scrub      --input DOCS --out DIR
                                   [--benchmark DOCS --drop-contaminated]
    python -m pikes_ray bench      [--sf-dir DIR]
    python -m pikes_ray serve      [--port P]

Owns a Ray session (scripts only — library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"num_cpus": num_cpus} if num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None):
    p = argparse.ArgumentParser(prog="pikes_ray")
    p.add_argument("command", choices=["ingest", "annotate", "extract",
                                       "canonicalize", "materialize", "eval",
                                       "stats", "bench", "serve", "pipeline",
                                       "scrub"])
    p.add_argument("--benchmark",
                   help="scrub: parquet of benchmark docs (text column) to "
                        "decontaminate against")
    p.add_argument("--drop-contaminated", action="store_true",
                   help="scrub: drop flagged docs instead of keeping flags")
    p.add_argument("--config", help="pipeline: JSON PipelineSpec file")
    p.add_argument("--input")
    p.add_argument("--out")
    p.add_argument("--pred")
    p.add_argument("--gold")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--incremental", action="store_true",
                   help="extract: hash-keyed shards — appending input "
                        "fragments re-runs only the groups that changed")
    p.add_argument("--naf", action="store_true",
                   help="extract: --input is a NAF XML corpus (kaflib "
                        "shape) — skip the annotator, run filter+extract "
                        "over the pre-annotated layers")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--ntriples", action="store_true")
    p.add_argument("--port", type=int, default=8011)
    args = p.parse_args(argv)

    if args.command == "serve":
        # no Ray session needed: per-request annotation is single-doc
        import threading

        from pikes_ray.sources.server import PipelineServer

        with PipelineServer(port=args.port) as url:
            print(f"pikes_ray server on {url} (endpoints: /json /triples /naf)",
                  flush=True)
            threading.Event().wait()
        return 0

    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    try:
        if args.command == "ingest":
            from pikes_ray.sources.ingest import read_jsonl_transcripts

            ds = (read_jsonl_transcripts(args.input) if args.input.endswith(".jsonl")
                  else rd.read_parquet(args.input))
            ds.write_parquet(args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out}))
        elif args.command == "annotate":
            from pikes_ray.pipelines.kg import annotate_transcripts

            ds = annotate_transcripts(rd.read_parquet(args.input))
            ds.write_parquet(args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out}))
        elif args.command == "extract":
            if args.naf:
                from pikes_ray.pipelines.canonicalize import (
                    dedup_exact, smush_global)
                from pikes_ray.sources.ingest import read_naf_documents
                from pikes_ray.stages.extract import extract_batch
                from pikes_ray.stages.filter import FilterStage

                tr = read_naf_documents(args.input) \
                    .map_batches(FilterStage(), batch_format="pyarrow") \
                    .map_batches(extract_batch, batch_format="pyarrow")
                tr = dedup_exact(smush_global(tr.materialize()))
                tr.write_parquet(args.out)
                print(json.dumps({"rows_out": tr.count(), "out": args.out}))
            else:
                from pikes_ray.pipelines.kg import build_graph_checkpointed

                summary = build_graph_checkpointed(
                    args.input, args.out, n_shards=args.shards,
                    keying="hash" if args.incremental else "positional")
                print(json.dumps(summary))
        elif args.command == "canonicalize":
            from pikes_ray.pipelines.canonicalize import dedup_exact, smush_global

            tr = rd.read_parquet(args.input)
            tr = dedup_exact(smush_global(tr.materialize()))
            tr.write_parquet(args.out)
            print(json.dumps({"rows": tr.count(), "out": args.out}))
        elif args.command == "materialize":
            from pikes_ray.sources.sinks import write_ntriples

            tr = rd.read_parquet(args.input)
            if args.ntriples:
                write_ntriples(tr, args.out)
            else:
                tr.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.command == "eval":
            from pikes_ray.pipelines.stats import triple_pr

            res = triple_pr(rd.read_parquet(args.pred), rd.read_parquet(args.gold))
            print(json.dumps(res))
        elif args.command == "stats":
            from pikes_ray.pipelines.kg import annotate_transcripts
            from pikes_ray.pipelines.stats import corpus_statistics

            ds = annotate_transcripts(rd.read_parquet(args.input))
            print(corpus_statistics(ds).to_json(orient="records"))
        elif args.command == "pipeline":
            # config-driven composition (§2.10 properties-file surface):
            # the JSON file parses straight into a PipelineSpec
            from pikes_ray.extension import PipelineSpec, build_pipeline

            with open(args.config) as f:
                spec = PipelineSpec.from_dict(json.load(f))
            ds = build_pipeline(rd.read_parquet(args.input), spec)
            ds.write_parquet(args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out,
                              "stages": [s.stage for s in spec.stages]}))
        elif args.command == "scrub":
            # training-data hygiene pass: PII redaction (+ optional
            # benchmark decontamination) over a documents table
            import pyarrow.dataset as pads

            from pikes_ray.ops.text import decontaminate, pii_scrub

            ds = rd.read_parquet(args.input) \
                .map_batches(pii_scrub, batch_format="pandas")
            if args.benchmark:
                bench = pads.dataset(args.benchmark).to_table(
                    columns=["text"]).column("text").to_pylist()
                ds = decontaminate(
                    ds, bench, col="clean_text",
                    mode="drop" if args.drop_contaminated else "flag")
            ds.write_parquet(args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out}))
        elif args.command == "bench":
            import os

            os.environ.setdefault("GRAFT_SF_DIR", args.sf_dir)
            from bench import run_bench

            print(json.dumps(run_bench()))
            return 0
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
