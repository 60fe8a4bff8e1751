"""Regenerate the frozen golden triples for the unit-scale transcripts.

Run manually ONLY when extraction semantics intentionally change:
    PYTHONPATH=/root/repo python tests/golden/regen_golden.py
The frozen parquet is the pinned reference-semantics output
(FIXTURES.md §2); the P/R ≥ 0.95 gate in tests/test_golden.py compares
the live pipeline against it.
"""
import os, sys

import ray
import pyarrow as pa
import pyarrow.parquet as pq

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from pikes_ray.pipelines.kg import transcripts_to_graph
from pikes_ray.sources.transcripts import transcripts_dir

g = transcripts_to_graph(transcripts_dir("unit"), concurrency=2).to_pandas()
g = g.sort_values(["subj", "pred", "obj", "graph"]).reset_index(drop=True)
out = os.path.join(os.path.dirname(__file__), "triples_gold.parquet")
pq.write_table(pa.Table.from_pandas(g, preserve_index=False), out)
print("wrote", out, len(g), "triples")
ray.shutdown()
