"""Per-sentence diff of our eval-pm output vs gold — prints FN/FP triples
for a category so recall work can target actual misses.

Usage: python tools/evalpm_diff.py [edges|pb:|nb:|vn:|fn:|types|all] [sent_no]
"""
import sys
import datetime as dt

import pyarrow as pa

sys.path.insert(0, "/root/repo")

from pikes_ray.pipelines.evalpm import (  # noqa: E402
    gold_graphs, our_graph, align, _pair, _EVAL_MARKERS, _RDF_TYPE,
)
from pikes_ray.schema import TRANSCRIPT_SCHEMA  # noqa: E402
from pikes_ray.stages.fused import KGStage  # noqa: E402


def main():
    cat = sys.argv[1] if len(sys.argv) > 1 else "edges"
    only = int(sys.argv[2]) if len(sys.argv) > 2 else None

    texts, golds = gold_graphs()
    rows = [{"conv_id": "eval", "turn_idx": i, "role": "user", "text": t,
             "tool": "", "ts": dt.datetime(2015, 11, 6)}
            for i, t in enumerate(texts)]
    batch = pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA)
    out = KGStage(static_canon=False, local_smush=False,
              per_mention=True)(batch).to_pandas()

    for i, (text, gold) in enumerate(zip(texts, golds)):
        if only is not None and i + 1 != only:
            continue
        test = our_graph(text, out[out["turn_idx"] == i])
        mapping = align(gold, test)
        rev = {}
        for t_, g_ in mapping.items():
            rev.setdefault(g_, []).append(t_)
        print(f"\n=== sentence {i + 1}: {text[:90]}")

        if cat in ("edges", "all"):
            gold_rel = {_pair(s, o) for s, p, o in gold.triples
                        if s in gold.nodes and o in gold.nodes and s != o
                        and p not in _EVAL_MARKERS}
            test_keys = set()
            for s, p, o in test.triples:
                if s not in test.nodes or o not in test.nodes or s == o \
                        or p in _EVAL_MARKERS:
                    continue
                sm, om = mapping.get(s), mapping.get(o)
                if sm is not None and om is not None and sm == om:
                    continue
                test_keys.add(_pair(sm if sm is not None else s,
                                    om if om is not None else o))
            for gr in sorted(gold_rel - test_keys):
                print(f"  FN edge: {gr}")

        for ns in ("pb:", "nb:", "vn:", "fn:"):
            if cat not in (ns, "all"):
                continue
            gold_stmts = {(s, p, o) for s, p, o in gold.triples
                          if s in gold.nodes and o in gold.nodes and s != o
                          and p.startswith(ns)}
            tkeys = {}
            for s, p, o in test.triples:
                if s not in test.nodes or o not in test.nodes or s == o \
                        or not p.startswith(ns):
                    continue
                sm, om = mapping.get(s), mapping.get(o)
                if sm is not None and om is not None and sm == om:
                    continue
                key = (sm if sm is not None else s, p,
                       om if om is not None else o)
                extra = sm is None or om is None
                tkeys[key] = tkeys.get(key, True) and extra
            for gs in sorted(set(tkeys) - gold_stmts):
                pass
            for gs in sorted(gold_stmts - set(tkeys)):
                print(f"  FN {ns} {gs}")
            for tk, extra in sorted(tkeys.items()):
                if tk in gold_stmts:
                    continue
                if extra or frozenset((tk[0], tk[2])) in gold.ignorable:
                    continue
                print(f"  FP {ns} {tk}")

        if cat in ("types", "all"):
            for ns in ("pb:", "nb:", "vn:", "fn:"):
                gold_stmts = {(s, p, o) for s, p, o in gold.triples
                              if s in gold.nodes and p == _RDF_TYPE
                              and o not in gold.nodes and o.startswith(ns)}
                tkeys = set()
                for s, p, o in test.triples:
                    if s not in test.nodes or p != _RDF_TYPE \
                            or o in test.nodes or not o.startswith(ns):
                        continue
                    sm = mapping.get(s)
                    tkeys.add((sm if sm is not None else s, p, o))
                for gs in sorted(gold_stmts - tkeys):
                    print(f"  FN type {gs}")
                for tk in sorted(tkeys - gold_stmts):
                    if tk[0].startswith("gold:"):
                        print(f"  FP type {tk}")

        if cat == "nodes":
            print("  gold nodes unaligned:",
                  sorted(gold.nodes - set(mapping.values())))
            print("  test nodes unaligned:",
                  sorted(test.nodes - set(mapping.keys())))
            for g_, ts in sorted(rev.items()):
                print(f"  {g_} <- {ts}")


if __name__ == "__main__":
    main()
