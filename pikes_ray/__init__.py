"""pikes_ray — a Ray-Data-native knowledge-graph-construction engine.

A from-scratch reimplementation of the *capabilities* of Pikes
(BenediktHeinrichs/pikes, reference at /root/reference): English text →
NLP annotations → deterministic (subj, pred, obj[, graph]) triple
extraction → canonicalized, deduplicated knowledge graph — re-expressed
as ``ray.data.Dataset`` pipelines over zero-copy Arrow batches with
actor pools for stateful stages, explicit shuffle/skew handling, and
resumable partitioned output.

Layout (mirrors SURVEY.md §2 / §7):

- ``schema``            fixed pyarrow schemas per stage (SURVEY §1.4)
- ``sources``           transcript generator + parquet readers (S1-S4)
- ``stages``            annotator / filter / extractor map_batches stages
                        (A1-A5, F1-F17, T0-T8)
- ``functions``         scalar helpers: IRI minting, hashing, number
                        speller, OWL-Time, dep-path regex (M13-M17)
- ``pipelines``         end-to-end composition + canonicalize/dedup wide
                        stages (E1, E2)
- ``state``             checkpoint / lineage manifest / resume (§4)
- ``ops``               large-scale training-data ops: dedup family,
                        ANN, text analysis, multimodal stubs
"""

__version__ = "0.1.0"
