"""M8 — dep→constituency projection + Collins head finder
(AnnotationPipeline.java:104-121 addHeads/CollinsHeadFinder,
ixa/kaflib/Tree.java HEAD_MARK; rules: Collins 1999 Appendix A)."""

import xml.etree.ElementTree as ET

from pikes_ray.functions.constituency import (
    Node,
    constituency_layers,
    head_child_index,
    head_terminal,
    mark_heads,
    sentence_trees,
    to_penn,
)


def _tok(form, penn, sent=1, pos=None):
    return {"form": form, "lemma": form.lower(), "morphofeat": penn,
            "pos": pos or penn[:1], "sent": sent,
            "offset": 0, "length": len(form)}


def _dep(frm, to, rfunc):
    return {"frm": frm, "to": to, "rfunc": rfunc}


TOKS = [_tok("The", "DT"), _tok("company", "NN"), _tok("acquired", "VBD"),
        _tok("the", "DT"), _tok("factory", "NN"), _tok("in", "IN"),
        _tok("Berlin", "NNP")]
DEPS = [_dep(1, 0, "NMOD"), _dep(2, 1, "SBJ"), _dep(2, 4, "OBJ"),
        _dep(4, 3, "NMOD"), _dep(2, 5, "ADV"), _dep(5, 6, "PMOD")]


def test_projection_shape_and_s_split():
    trees = sentence_trees(TOKS, DEPS)
    assert len(trees) == 1
    sent, tree = trees[0]
    assert sent == 1 and tree.label == "S"
    # SBJ lifted out of the VP: (S (NP The company) (VP ...))
    assert [c.label for c in tree.children] == ["NP", "VP"]
    np, vp = tree.children
    assert [t.term for t in np.terminals()] == [0, 1]
    assert [t.term for t in vp.terminals()] == [2, 3, 4, 5, 6]
    # PP attaches inside the VP with its own NP
    labels = [c.label for c in vp.children]
    assert labels == ["VBD", "NP", "PP"]


def test_collins_heads_recover_dependency_heads():
    trees = sentence_trees(TOKS, DEPS)
    _, tree = trees[0]
    mark_heads(tree)
    # S → VP (Collins S rule), VP → VBD, NP → rightmost NN, PP → IN:
    # the lexical head of the whole sentence is the main verb
    assert head_terminal(tree).term == 2
    np, vp = tree.children
    assert vp.head and not np.head
    assert head_terminal(np).term == 1          # company, not The
    pp = vp.children[2]
    assert head_terminal(pp).term == 5          # in (preposition)
    assert head_terminal(pp.children[-1]).term == 6  # its NP → Berlin


def test_collins_np_special_rule():
    # possessive: last-word POS wins
    assert head_child_index("NP", ["NNP", "POS"]) == 1
    # rightmost nominal beats earlier JJ
    assert head_child_index("NP", ["DT", "JJ", "NN"]) == 2
    # no nominal: leftmost NP child
    assert head_child_index("NP", ["DT", "NP", "PP"]) == 1
    # CD fallback
    assert head_child_index("NP", ["DT", "CD"]) == 1


def test_collins_direction_and_punct_default():
    # PP searches right-to-left priority: IN found from the right
    assert head_child_index("PP", ["IN", "NP"]) == 0
    # VP: TO outranks VBD
    assert head_child_index("VP", ["TO", "VBD"]) == 0
    # unknown label defaults left, skipping punctuation
    assert head_child_index("FOO", [",", "NN"]) == 1


def test_penn_string_head_marks():
    trees = sentence_trees(TOKS, DEPS)
    _, tree = trees[0]
    mark_heads(tree)
    s = to_penn(tree)
    assert s.startswith("(S ")
    assert "(VP=H" in s and "(NN=H company)" in s
    # inside the PP the preposition carries the mark, not the noun
    assert "(PP (IN=H in)" in s and "Berlin" in s


def test_layers_xml_wellformed_and_single_head_edges():
    xml = f"<NAF>{constituency_layers(TOKS, DEPS)}</NAF>"
    root = ET.fromstring(xml)
    tree = root.find("constituency/tree")
    assert tree is not None and tree.get("sentence") == "1"
    nts = tree.findall("nt")
    edges = tree.findall("edge")
    terminals = tree.findall("t")
    assert len(terminals) == len(TOKS)
    # every non-terminal with children has exactly one head edge
    by_parent: dict[str, list] = {}
    for e in edges:
        by_parent.setdefault(e.get("to"), []).append(e)
    assert set(by_parent) == {nt.get("id") for nt in nts}
    for parent, es in by_parent.items():
        assert sum(1 for e in es if e.get("head") == "yes") == 1
    # the string layer is present too
    assert root.find("constituencyStrings/tree") is not None


def test_multi_root_and_cycle_guard():
    toks = [_tok("Yes", "UH"), _tok(".", "."),
            _tok("Go", "VB", sent=2), _tok("now", "RB", sent=2)]
    deps = [_dep(2, 3, "ADV")]
    trees = sentence_trees(toks, deps)
    assert [s for s, _ in trees] == [1, 2]
    assert trees[0][1].label == "FRAG"          # no verb in sentence 1
    # cyclic deps (malformed ingest) must not hang or crash
    bad = [_dep(0, 1, "NMOD"), _dep(1, 0, "NMOD")]
    ts = sentence_trees([_tok("a", "NN"), _tok("b", "NN")], bad)
    assert isinstance(ts, list)
