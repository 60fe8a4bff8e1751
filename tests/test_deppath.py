"""Micro-fixture tests for the dep-path machinery (FIXTURES.md §5)."""

from pikes_ray.functions.deppath import DepGraph


def g(deps):
    return DepGraph([{"frm": a, "to": b, "rfunc": r} for a, b, r in deps], 10)


def test_head_unique_root():
    # 2 ← 0, 2 ← 1  (2 governs both)
    dg = g([(2, 0, "NMOD"), (2, 1, "NMOD")])
    assert dg.terms_head({0, 1, 2}) == 2
    assert dg.terms_head({0}) == 0


def test_head_multi_root_is_none():
    # two disconnected roots → None (KAFDocument.java:2027-2044)
    dg = g([(2, 0, "NMOD"), (5, 4, "NMOD")])
    assert dg.terms_head({0, 2, 4, 5}) is None


def test_match_path():
    # 3 -SBJ-> 1, 1 -NMOD-> 0
    dg = g([(3, 1, "SBJ"), (1, 0, "NMOD")])
    assert dg.match_path(3, 0, "SBJ NMOD")
    assert dg.match_path(3, 0, "SBJ(NMOD)*")
    assert not dg.match_path(3, 0, "NMOD")
    assert dg.match_path(3, 1, "SBJ")


def test_descendants_regex():
    # verb 4: OBJ→2; 2: NMOD→0, NMOD→1; 2: COORD→5; 5: CONJ→6
    dg = g([(4, 2, "OBJ"), (2, 0, "NMOD"), (2, 1, "NMOD"),
            (2, 5, "COORD"), (5, 6, "CONJ")])
    mods = dg.terms_by_dep_descendants({2}, "(NMOD|AMOD|APPO)")
    assert mods == {0, 1}
    coords = dg.terms_by_dep_descendants({2}, "(COORD|CONJ)*")
    assert coords == {2, 5, 6}      # ε matches the head itself


def test_ancestors_regex():
    dg = g([(4, 2, "OBJ"), (2, 0, "NMOD")])
    up = dg.terms_by_dep_ancestors({0}, "NMOD")
    assert up == {2}
    up2 = dg.terms_by_dep_ancestors({0}, "OBJ NMOD")
    assert up2 == {4}


def test_label_interning_stable():
    dg = g([(1, 0, "SBJ"), (2, 1, "OBJ")])
    assert dg.label_char("SBJ") == dg.label_char("SBJ")
    assert dg.label_char("SBJ") != dg.label_char("OBJ")
