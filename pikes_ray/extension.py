"""User-extension surface (SURVEY §2.10): stage registry + config-driven
pipeline composition.

The reference injects annotators by class name (CoreNLP
``customAnnotatorClass.*`` properties, Defaults.java:54-78) and
composes Annotator/Extractor/Mapper/Renderer implementations with
``concat`` (eu.fbk.dkm.pikes.rdf.api/*.java).  The Ray-Data analogue:

- ``resolve("pkg.mod:attr")`` — import-path-driven injection; any
  callable or class usable with ``Dataset.map_batches`` qualifies.
- ``STAGE_REGISTRY`` — short names for the built-in stages, so configs
  read ``"annotate"`` instead of an import path; user stages register
  with ``register_stage`` or use a raw import path directly.
- ``PipelineSpec`` / ``StageSpec`` — an ordered, declarative pipeline
  (the ``concat`` analogue).  ``build_pipeline(ds, spec)`` applies each
  stage as a ``map_batches``: classes become actor pools (constructor
  kwargs + concurrency from the spec — state builds once per actor),
  functions become stateless tasks (kwargs bound with ``partial``).
  ``PipelineSpec.from_dict`` accepts the parsed form of a JSON/YAML/TOML
  config file, mirroring the reference's properties-file surface.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

STAGE_REGISTRY: dict[str, str] = {
    # per-record maps (stateless tasks)
    "normalize": "pikes_ray.stages.normalize:normalize_batch",       # M1
    "extract": "pikes_ray.stages.extract:extract_batch",             # T0-T8
    # second registered Extractor (≙ NAFExtractor/KEM behind
    # api/Extractor.java — the plugin surface with two real impls)
    "extract_kem": "pikes_ray.stages.kem:kem_extract_batch",
    "smush_local": "pikes_ray.pipelines.canonicalize:smush_local_batch",  # E2a
    "kg": "pikes_ray.stages.fused:kg_stage_task",                    # fused flagship
    # stateful stages (actor pools — model built once per actor)
    "annotate": "pikes_ray.stages.annotate:AnnotatorStage",          # A1-A5
    "filter": "pikes_ray.stages.filter:FilterStage",                 # F1-F17
    "kg_actor": "pikes_ray.stages.fused:KGStage",
}


def register_stage(name: str, import_path: str) -> None:
    """Add/override a registry entry (the ``customAnnotatorClass.<name>``
    analogue)."""
    STAGE_REGISTRY[name] = import_path


def resolve(ref: str) -> Any:
    """Registry name or ``"pkg.mod:attr"`` / ``"pkg.mod.attr"`` → object."""
    path = STAGE_REGISTRY.get(ref, ref)
    if ":" in path:
        mod, _, attr = path.partition(":")
    else:
        mod, _, attr = path.rpartition(".")
    if not mod:
        raise ValueError(f"unresolvable stage reference: {ref!r}")
    return getattr(importlib.import_module(mod), attr)


@dataclass
class StageSpec:
    """One pipeline step.  ``kwargs`` bind to the constructor (class
    stages) or the function via ``partial`` (task stages)."""

    stage: str
    kwargs: dict = field(default_factory=dict)
    batch_size: int | None = 256
    concurrency: int | tuple[int, int] | None = None   # class stages only
    num_cpus: int | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "StageSpec":
        c = d.get("concurrency")
        if isinstance(c, list):
            c = tuple(c)
        return cls(stage=d["stage"], kwargs=dict(d.get("kwargs", {})),
                   batch_size=d.get("batch_size", 256), concurrency=c,
                   num_cpus=d.get("num_cpus"))


@dataclass
class PipelineSpec:
    """Ordered stage list + shared batch format (the ``concat``
    composition of SURVEY §2.10)."""

    stages: list[StageSpec]
    batch_format: str = "pyarrow"

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineSpec":
        return cls(stages=[StageSpec.from_dict(s) for s in d["stages"]],
                   batch_format=d.get("batch_format", "pyarrow"))


def build_pipeline(ds, spec: PipelineSpec):
    """Apply every stage of ``spec`` to ``ds`` and return the Dataset.

    Lazy — nothing executes until the caller consumes the result, so
    the streaming executor pipelines the whole chain."""
    from pikes_ray.runtime import task_num_cpus

    for st in spec.stages:
        target = resolve(st.stage)
        ncpus = st.num_cpus if st.num_cpus is not None else task_num_cpus()
        if isinstance(target, type):
            ds = ds.map_batches(
                target,
                fn_constructor_kwargs=st.kwargs,
                batch_format=spec.batch_format,
                batch_size=st.batch_size,
                concurrency=st.concurrency or (1, 4),
                num_cpus=ncpus,
            )
        else:
            fn: Callable = partial(target, **st.kwargs) if st.kwargs else target
            ds = ds.map_batches(
                fn,
                batch_format=spec.batch_format,
                batch_size=st.batch_size,
                num_cpus=ncpus,
            )
    return ds
