"""S8 — sharded actor quad index (state/quadindex.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pikes_ray.state.quadindex import QuadIndex, _shard_of


@pytest.fixture(scope="module")
def triples(ray_session):
    rows = []
    for i in range(200):
        s = f"entity:e{i % 40}"
        rows.append({"conv_id": "c", "turn_idx": 0, "subj": s,
                     "pred": f"p:{i % 5}", "obj": f"o:{i}",
                     "graph": f"fact:{i}", "conf": 0.0})
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_build_and_point_lookup(ray_session, triples):
    idx = QuadIndex(n_shards=4)
    n = idx.build_from_dataset(triples)
    assert n == 200
    quads = idx.get("entity:e3")
    assert len(quads) == 5            # 200 rows / 40 subjects
    assert all(len(q) == 3 for q in quads)
    assert {q[1] for q in quads} == {f"o:{3 + 40 * j}" for j in range(5)}
    assert idx.get("entity:absent") == []
    idx.close()


def test_get_many_and_stats(ray_session, triples):
    idx = QuadIndex(n_shards=3)
    idx.build_from_dataset(triples)
    out = idx.get_many(["entity:e0", "entity:e39", "entity:absent"])
    assert set(out) == {"entity:e0", "entity:e39"}
    st = idx.stats()
    assert st["keys"] == 40 and st["quads"] == 200
    # keys spread across shards by crc32 — no shard owns everything
    owners = {_shard_of(f"entity:e{i}", 3) for i in range(40)}
    assert len(owners) > 1
    idx.close()


def test_dump_and_reload(ray_session, triples, tmp_path):
    idx = QuadIndex(n_shards=2)
    idx.build_from_dataset(triples)
    idx.dump_parquet(str(tmp_path / "qidx"))
    idx2 = QuadIndex.load_parquet(str(tmp_path / "qidx"), n_shards=4)
    assert idx2.stats()["quads"] == 200
    assert sorted(idx2.get("entity:e7")) == sorted(idx.get("entity:e7"))
    idx.close()
    idx2.close()
