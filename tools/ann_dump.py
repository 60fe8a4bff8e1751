"""Dump the annotator's tokens / chunks / deps / preds for one eval sentence."""
import sys

sys.path.insert(0, "/root/repo")

from pikes_ray.pipelines.evalpm import gold_graphs  # noqa: E402
from pikes_ray.stages.annotate import RuleAnnotator  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    texts, _ = gold_graphs()
    text = texts[n - 1]
    print(text)
    ann = RuleAnnotator()
    toks = ann.tokenize(text)
    ann.tag(toks)
    ents = ann.ner(toks)
    chunks, deps = ann.chunks_and_deps(toks, ents)
    print("\n-- tokens --")
    for i, t in enumerate(toks):
        print(f"{i:3d} {t.form:16s} {t.morphofeat:5s} {t.lemma}")
    print("\n-- entities --")
    for e in ents:
        print(f"  [{e.start},{e.end}) {e.etype} named={e.named} "
              f"{' '.join(toks[k].form for k in range(e.start, e.end))}")
    print("\n-- chunks --")
    for (s, e, h) in chunks:
        print(f"  [{s},{e}) head={h}({toks[h].form}) "
              f"{' '.join(toks[k].form for k in range(s, e))}")
    print("\n-- deps --")
    for (g, d, r) in sorted(deps):
        print(f"  {toks[g].form}({g}) -{r}-> {toks[d].form}({d})")
    print("\n-- preds --")
    preds = ann.srl(toks, ents, chunks, deps)
    for p in preds:
        print(f"  {toks[p.head].form}({p.head}) {p.sense} {p.source} "
              f"copular={p.copular}")
        for r in p.roles:
            lbl = " ".join(toks[k].form for k in range(r[1], r[2]))
            print(f"      {r[0]} -> [{r[1]},{r[2]}) head={r[3]} '{lbl}'")


if __name__ == "__main__":
    main()
