"""S8 — key → quads index as a sharded Ray actor store.

The reference ships ``KeyQuadIndex`` (pikes-rdf/src/test/.../kv/
KeyQuadIndex.java:58-240): a LevelDB file keyed by an RDF value whose
``get(key, handler)`` streams the quads stored under that key, with a
namespace table interning IRI prefixes.  Downstream apps use it to pull
per-entity subgraphs without scanning the corpus.

The Ray-native equivalent is a SHARDED MUTABLE INDEX — one of the few
places where the Dataset API genuinely cannot express the semantics
(shared state, random-access point lookups) and raw actors are the
right tool:

- ``QuadIndexShard`` actors hold ``key → [(p, o, g), …]`` dicts with
  predicate/graph strings interned per shard (≙ the reference's
  namespace table).
- Keys hash-partition over shards by ``zlib.crc32(key)`` — the same
  subject-hash co-location the smush/dedup stages use, so a future
  "build index while deduping" pipeline reuses one partitioning.
- Bulk loading goes through ``map_batches``: each input block is split
  by shard ONCE and shipped as one actor call per (block, shard) —
  O(blocks × shards) messages, never O(rows).
- Point lookups (``get``) and batched lookups (``get_many``) return
  quads; ``stats`` aggregates per-shard sizes.

At 100 TB the per-shard dict becomes the per-node RAM budget: size
``n_shards`` ≥ corpus_keys × bytes_per_entry / node_heap, and spill
cold shards to parquet via ``dump``/``load`` (round-trippable layout:
one directory per shard).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import ray


def _shard_of(key: str, n: int) -> int:
    return zlib.crc32(key.encode("utf-8")) % n


@ray.remote(num_cpus=0)
class QuadIndexShard:
    # num_cpus=0: the index is memory-bound (lookups are dict hits) —
    # reserving CPU would starve compute stages sharing the node; a
    # production deployment sizes shards with ``memory=`` resources
    """One shard: key → interned quad list.  All state actor-local."""

    def __init__(self) -> None:
        self._data: dict[str, list[tuple[int, str, int]]] = {}
        self._intern: dict[str, int] = {}
        self._strings: list[str] = []

    def _id(self, s: str) -> int:
        i = self._intern.get(s)
        if i is None:
            i = len(self._strings)
            self._intern[s] = i
            self._strings.append(s)
        return i

    def put_batch(self, keys: list[str], preds: list[str],
                  objs: list[str], graphs: list[str]) -> int:
        data = self._data
        iid = self._id
        for k, p, o, g in zip(keys, preds, objs, graphs):
            data.setdefault(k, []).append((iid(p), o, iid(g)))
        return len(keys)

    def get(self, key: str) -> list[tuple[str, str, str]]:
        st = self._strings
        return [(st[p], o, st[g]) for (p, o, g) in self._data.get(key, [])]

    def get_many(self, keys: list[str]) -> dict[str, list[tuple[str, str, str]]]:
        st = self._strings
        return {k: [(st[p], o, st[g]) for (p, o, g) in self._data[k]]
                for k in keys if k in self._data}

    def stats(self) -> dict:
        return {"keys": len(self._data),
                "quads": sum(len(v) for v in self._data.values()),
                "interned": len(self._strings)}

    def dump(self) -> pa.Table:
        st = self._strings
        keys, preds, objs, graphs = [], [], [], []
        for k, quads in self._data.items():
            for (p, o, g) in quads:
                keys.append(k)
                preds.append(st[p])
                objs.append(o)
                graphs.append(st[g])
        return pa.table({"key": keys, "pred": preds,
                         "obj": objs, "graph": graphs})


class QuadIndex:
    """Facade over ``n_shards`` ``QuadIndexShard`` actors."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [QuadIndexShard.remote() for _ in range(n_shards)]

    def close(self) -> None:
        """Release the shard actors (their state is lost — ``dump_parquet``
        first to persist)."""
        for s in self.shards:
            ray.kill(s)
        self.shards = []

    # -- loading -----------------------------------------------------------

    def build_from_dataset(self, triples, key_col: str = "subj") -> int:
        """Bulk-load a triples Dataset (``subj pred obj graph`` columns).

        Each block is split by shard inside ``map_batches`` and shipped
        as ONE actor call per (block, shard); the transform returns
        per-shard row counts so the load is itself a streaming Dataset
        pass with backpressure (no driver-side row loop).
        """
        shards = self.shards
        n = self.n_shards

        def route(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].to_pylist()
            preds = batch["pred"].to_pylist()
            objs = batch["obj"].to_pylist()
            graphs = batch["graph"].to_pylist()
            buckets: dict[int, list[int]] = {}
            for i, k in enumerate(keys):
                buckets.setdefault(_shard_of(k, n), []).append(i)
            refs = []
            for sh, idxs in buckets.items():
                refs.append(shards[sh].put_batch.remote(
                    [keys[i] for i in idxs], [preds[i] for i in idxs],
                    [objs[i] for i in idxs], [graphs[i] for i in idxs]))
            return pa.table({"n": [sum(ray.get(refs))] if refs else [0]})

        out = triples.map_batches(route, batch_format="pyarrow",
                                  batch_size=8192, num_cpus=0.25)
        import pyarrow.compute as pc

        total = 0
        for b in out.iter_batches(batch_format="pyarrow"):
            total += pc.sum(b["n"]).as_py() or 0
        return total

    # -- lookups -----------------------------------------------------------

    def get(self, key: str) -> list[tuple[str, str, str]]:
        return ray.get(
            self.shards[_shard_of(key, self.n_shards)].get.remote(key))

    def get_many(self, keys: list[str]) -> dict[str, list[tuple[str, str, str]]]:
        by_shard: dict[int, list[str]] = {}
        for k in keys:
            by_shard.setdefault(_shard_of(k, self.n_shards), []).append(k)
        out: dict[str, list[tuple[str, str, str]]] = {}
        for res in ray.get([self.shards[sh].get_many.remote(ks)
                            for sh, ks in by_shard.items()]):
            out.update(res)
        return out

    def stats(self) -> dict:
        per = ray.get([s.stats.remote() for s in self.shards])
        return {"shards": self.n_shards,
                "keys": sum(p["keys"] for p in per),
                "quads": sum(p["quads"] for p in per),
                "per_shard": per}

    # -- spill / restore ---------------------------------------------------

    def dump_parquet(self, out_dir: str) -> None:
        """One parquet file per shard (resumable, shard-parallel)."""
        import os

        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        tables = ray.get([s.dump.remote() for s in self.shards])
        for i, t in enumerate(tables):
            pq.write_table(t, os.path.join(out_dir, f"shard-{i}.parquet"))

    @classmethod
    def load_parquet(cls, out_dir: str, n_shards: int = 8) -> "QuadIndex":
        import glob

        import ray.data as rd

        idx = cls(n_shards)
        ds = rd.read_parquet(sorted(glob.glob(f"{out_dir}/shard-*.parquet")))
        idx.build_from_dataset(ds, key_col="key")
        return idx
