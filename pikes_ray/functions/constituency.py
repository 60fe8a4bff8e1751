"""M8 — constituency trees + Collins head-finding.

The reference parses each sentence with Stanford CoreNLP, then marks
heads in the tree with the Collins head finder and stores the result as
the NAF constituency layer (AnnotationPipeline.java:104-121 ``addHeads``
with ``CollinsHeadFinder``; :901-915 ``addConstituencyString`` /
``addConstituencyFromParentheses``; head mark ``=H`` per
ixa/kaflib/Tree.java:9).  No triple ever consumes the layer — it exists
for the NAF debug/interop output only — so this engine derives the tree
from the dependency layer it already has (the standard projective
dep→constituency projection: every head token projects one phrase over
its subtree, SBJ dependents of a verbal root lift into a classic
``(S (NP …) (VP …))`` split) and then runs a REAL Collins head finder
(the public rule tables from M. Collins, *Head-Driven Statistical Models
for Natural Language Parsing*, 1999, Appendix A) over the label
structure alone.  That the Collins pass re-discovers the dependency
heads from labels it never saw is the built-in cross-check the unit
tests assert.

Pure Python, no Ray: called per document inside the S6 NAF writer's
``map_batches`` task (sources/sinks.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

HEAD_MARK = "=H"   # ixa/kaflib/Tree.java:9

# ---------------------------------------------------------------------------
# Tree model
# ---------------------------------------------------------------------------


@dataclass
class Node:
    """Constituency node: non-terminal (children) or terminal (term)."""

    label: str
    children: list["Node"] = field(default_factory=list)
    term: int | None = None      # token index for terminals
    head: bool = False           # this node is its parent's head child

    @property
    def is_terminal(self) -> bool:
        return self.term is not None

    def terminals(self) -> list["Node"]:
        if self.is_terminal:
            return [self]
        out: list[Node] = []
        for c in self.children:
            out.extend(c.terminals())
        return out


# ---------------------------------------------------------------------------
# Dependency → constituency projection
# ---------------------------------------------------------------------------

_PHRASE_OF_POS: list[tuple[tuple[str, ...], str]] = [
    (("VB", "MD"), "VP"),
    (("NN", "PRP", "EX", "CD", "WP", "WDT"), "NP"),
    (("IN", "TO"), "PP"),
    (("JJ",), "ADJP"),
    (("RB", "WRB"), "ADVP"),
    (("UH",), "INTJ"),
    (("RP",), "PRT"),
]


def _phrase_label(penn: str) -> str:
    for prefixes, label in _PHRASE_OF_POS:
        if penn.startswith(prefixes):
            return label
    return "X"


def _project(i: int, kids: dict[int, list[int]], toks: list[dict],
             seen: set[int] | None = None) -> Node:
    """Phrase projection of token ``i`` over its dependency subtree.
    ``seen`` guards against cyclic dep layers in ingested NAF."""
    seen = seen if seen is not None else {i}
    penn = toks[i]["morphofeat"] or "X"
    pre = Node(penn, [Node(toks[i]["form"] or "_", term=i)])
    deps = [d for d in sorted(kids.get(i, ()))
            if d not in seen and not seen.add(d)]
    if not deps:
        return pre
    children = [_project(d, kids, toks, seen) for d in deps if d < i] \
        + [pre] + [_project(d, kids, toks, seen) for d in deps if d > i]
    return Node(_phrase_label(penn), children)


def sentence_trees(tokens: list[dict], deps: list[dict]) -> list[tuple[int, Node]]:
    """One ``(sent, tree)`` per sentence (kaflib trees are per sentence,
    ReadWriteManager sentence= attribute).  Multi-rooted sentences (and
    punctuation, which our dep layer leaves unattached) gather under the
    top node."""
    kids: dict[int, list[int]] = {}
    has_parent: set[int] = set()
    for d in deps:
        kids.setdefault(d["frm"], []).append(d["to"])
        has_parent.add(d["to"])
    out: list[tuple[int, Node]] = []
    n = len(tokens)
    i = 0
    while i < n:
        sent = tokens[i]["sent"]
        j = i
        while j < n and tokens[j]["sent"] == sent:
            j += 1
        roots = [k for k in range(i, j) if k not in has_parent]
        tops: list[Node] = []
        for r in roots:
            node = _project(r, kids, tokens)
            penn = tokens[r]["morphofeat"]
            if penn.startswith(("VB", "MD")) and node.children:
                # classic S split: SBJ dependents lift out of the VP
                # (the flat projection would bury the subject)
                sbj_heads = {d["to"] for d in deps
                             if d["frm"] == r and d["rfunc"] == "SBJ"}
                if sbj_heads:
                    is_subj = [bool({t.term for t in c.terminals()}
                                    & sbj_heads) for c in node.children]
                    subj = [c for c, s in zip(node.children, is_subj) if s]
                    rest = [c for c, s in zip(node.children, is_subj) if not s]
                    node = Node("S", subj + [Node("VP", rest)])
            tops.append(node)
        if not tops:
            i = j
            continue
        tree = tops[0] if len(tops) == 1 and tops[0].label == "S" \
            else Node("S" if any(
                t["morphofeat"].startswith(("VB", "MD"))
                for t in tokens[i:j]) else "FRAG", tops)
        out.append((sent, tree))
        i = j
    return out


# ---------------------------------------------------------------------------
# Collins head finder (Collins 1999, Appendix A — public rule tables)
# ---------------------------------------------------------------------------

# (direction, priority list); "left" = scan priorities, take leftmost
# child matching; "right" = scan priorities, take rightmost match.
_COLLINS_RULES: dict[str, tuple[str, tuple[str, ...]]] = {
    "ADJP": ("left", ("NNS", "QP", "NN", "$", "ADVP", "JJ", "VBN", "VBG",
                      "ADJP", "JJR", "NP", "JJS", "DT", "FW", "RBR", "RBS",
                      "SBAR", "RB")),
    "ADVP": ("right", ("RB", "RBR", "RBS", "FW", "ADVP", "TO", "CD", "JJR",
                       "JJ", "IN", "NP", "JJS", "NN")),
    "CONJP": ("right", ("CC", "RB", "IN")),
    "FRAG": ("right", ()),
    "INTJ": ("left", ()),
    "LST": ("right", ("LS", ":")),
    "NAC": ("left", ("NN", "NNS", "NNP", "NNPS", "NP", "NAC", "EX", "$",
                     "CD", "QP", "PRP", "VBG", "JJ", "JJS", "JJR", "ADJP",
                     "FW")),
    "NX": ("left", ()),
    "PP": ("right", ("IN", "TO", "VP", "S", "SINV", "SBAR", "FRAG")),
    "PRN": ("left", ()),
    "PRT": ("right", ("RP",)),
    "QP": ("left", ("$", "IN", "NNS", "NN", "JJ", "RB", "DT", "CD", "NCD",
                    "QP", "JJR", "JJS")),
    "RRC": ("right", ("VP", "NP", "ADVP", "ADJP", "PP")),
    "S": ("left", ("TO", "IN", "VP", "S", "SBAR", "ADJP", "UCP", "NP")),
    "SBAR": ("left", ("WHNP", "WHPP", "WHADVP", "WHADJP", "IN", "DT", "S",
                      "SQ", "SINV", "SBAR", "FRAG")),
    "SBARQ": ("left", ("SQ", "S", "SINV", "SBARQ", "FRAG")),
    "SINV": ("left", ("VBZ", "VBD", "VBP", "VB", "MD", "VP", "S", "SINV",
                      "ADJP", "NP")),
    "SQ": ("left", ("VBZ", "VBD", "VBP", "VB", "MD", "VP", "SQ")),
    "UCP": ("right", ()),
    "VP": ("left", ("TO", "VBD", "VBN", "MD", "VBZ", "VB", "VBG", "VBP",
                    "VP", "ADJP", "NN", "NNS", "NP")),
    "WHADJP": ("left", ("CC", "WRB", "JJ", "ADJP")),
    "WHADVP": ("right", ("CC", "WRB")),
    "WHNP": ("left", ("WDT", "WP", "WP$", "WHADJP", "WHPP", "WHNP")),
    "WHPP": ("right", ("IN", "TO", "FW")),
    "X": ("right", ()),
}

_PUNCT = {".", ",", ":", "``", "''", "-LRB-", "-RRB-", "$", "#"}
_NP_RIGHT1 = ("NN", "NNP", "NNPS", "NNS", "NX", "POS", "JJR")
_NP_RIGHT2 = ("$", "ADJP", "PRN")
_NP_RIGHT3 = ("JJ", "JJS", "RB", "QP")


def _np_head(labels: list[str]) -> int:
    """Collins' special NP rule (thesis Appendix A)."""
    if labels and labels[-1] == "POS":
        return len(labels) - 1
    for i in range(len(labels) - 1, -1, -1):
        if labels[i] in _NP_RIGHT1:
            return i
    for i, lab in enumerate(labels):
        if lab == "NP":
            return i
    for group in (_NP_RIGHT2, ("CD",), _NP_RIGHT3):
        for i in range(len(labels) - 1, -1, -1):
            if labels[i] in group:
                return i
    return len(labels) - 1


def head_child_index(label: str, child_labels: list[str]) -> int:
    """Index of the head child per the Collins tables; defaults skip
    punctuation preterminals when possible."""
    if not child_labels:
        raise ValueError("no children")
    if label == "NP":
        return _np_head(child_labels)
    direction, priority = _COLLINS_RULES.get(label, ("left", ()))
    order = range(len(child_labels)) if direction == "left" \
        else range(len(child_labels) - 1, -1, -1)
    for want in priority:
        for i in order:
            if child_labels[i] == want:
                return i
    for i in order:
        if child_labels[i] not in _PUNCT:
            return i
    return 0 if direction == "left" else len(child_labels) - 1


def mark_heads(node: Node) -> None:
    """Recursively flag each non-terminal's head child (≙ addHeads,
    AnnotationPipeline.java:104-121; like the reference, a terminal
    head gets no mark — preterminals do)."""
    if node.is_terminal or not node.children:
        return
    if len(node.children) == 1:
        node.children[0].head = True
    else:
        idx = head_child_index(node.label,
                               [c.label for c in node.children])
        node.children[idx].head = True
    for c in node.children:
        mark_heads(c)


def head_terminal(node: Node) -> Node:
    """Follow head marks down to the lexical head token."""
    while not node.is_terminal:
        nxt = next((c for c in node.children if c.head), None)
        if nxt is None:
            nxt = node.children[0]
        node = nxt
    return node


# ---------------------------------------------------------------------------
# Serialization
# ---------------------------------------------------------------------------


def to_penn(node: Node) -> str:
    """Head-marked parenthesized string (≙ tree.toString() after
    addHeads — the reference's constituencyStrings payload)."""
    if node.is_terminal:
        return node.label
    mark = HEAD_MARK if node.head and node.children else ""
    inner = " ".join(to_penn(c) for c in node.children)
    return f"({node.label}{mark} {inner})"


def tree_xml(node: Node, sent: int, prefix: str) -> str:
    """kaflib structured form (ReadWriteManager.java:2669-2745):
    ``<tree sentence=N>`` with ``<nt id label>``, ``<t id><span>…`` and
    ``<edge from to head="yes">`` rows; ids ``{prefix}nt{i}`` /
    ``{prefix}ter{i}`` / edges from child to parent."""
    from xml.sax.saxutils import quoteattr

    nts: list[str] = []
    ts: list[str] = []
    edges: list[str] = []
    counter = {"nt": 0, "t": 0, "e": 0}

    def walk(n: Node) -> str:
        if n.is_terminal:
            nid = f"{prefix}ter{counter['t']}"
            counter["t"] += 1
            ts.append(f'<t id="{nid}"><span>'
                      f'<target id="t{n.term}"/></span></t>')
            return nid
        nid = f"{prefix}nt{counter['nt']}"
        counter["nt"] += 1
        nts.append(f'<nt id="{nid}" label={quoteattr(n.label)}/>')
        for c in n.children:
            cid = walk(c)
            eid = f"{prefix}tre{counter['e']}"
            counter["e"] += 1
            head = ' head="yes"' if c.head else ""
            edges.append(f'<edge id="{eid}" from="{cid}" to="{nid}"{head}/>')
        return nid

    walk(node)
    return (f'<tree sentence="{sent}">' + "".join(nts) + "".join(ts)
            + "".join(edges) + "</tree>")


def constituency_layers(tokens: list[dict], deps: list[dict]) -> str:
    """Both kaflib layers for one document: ``<constituencyStrings>``
    (head-marked Penn strings) + structured ``<constituency>``."""
    from xml.sax.saxutils import escape

    trees = sentence_trees(tokens, deps)
    if not trees:
        return ""
    strings: list[str] = []
    structured: list[str] = []
    for k, (sent, tree) in enumerate(trees):
        mark_heads(tree)
        strings.append(f'<tree sentence="{sent}">'
                       f"{escape(to_penn(tree))}</tree>")
        structured.append(tree_xml(tree, sent, f"s{k}"))
    return ("<constituencyStrings>" + "".join(strings)
            + "</constituencyStrings><constituency>"
            + "".join(structured) + "</constituency>")
