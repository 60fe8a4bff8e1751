"""Dependency-path machinery (≙ KAFDocument.java:1886-2078).

The reference interns dependency labels to single chars and matches
label paths against compiled regexes; on top of that it builds
``getTermsHead`` (unique dep-root of a span, null on multi-root —
:2027-2044), ``getTermsByDepAncestors`` (:2046-2078) and
``getTermsByDepDescendants`` (:2080-2112), which power the modifier and
participation walks (MODIFIER_REGEX RDFGenerator.java:106;
PARTICIPATION_REGEX NAFFilter.java:92-93).

We reimplement the same semantics over the flat ``deps`` column
(list<struct<frm, to, rfunc>>): labels are interned to chars per
DepGraph instance, path regexes are compiled against the char alphabet,
and the null-on-multi-root head behavior is preserved bit-for-bit
(SURVEY §7 hard parts (a)/(b)).
"""

from __future__ import annotations

import re

# Process-global label interning + compiled-pattern cache: labels come
# from a small fixed set, so interning once per process (instead of per
# document) lets every document share the compiled path regexes — the
# per-doc recompilation dominated the modifier walk before.  The char
# assignment order never affects output (chars are only compared to
# each other within one process).
_GLOBAL_LABELS: dict[str, str] = {}
_COMPILED: dict[str, re.Pattern] = {}


def _intern_label(label: str) -> str:
    c = _GLOBAL_LABELS.get(label)
    if c is None:
        c = chr(0x41 + len(_GLOBAL_LABELS))
        _GLOBAL_LABELS[label] = c
    return c


class DepGraph:
    """Per-document dependency graph over globally interned labels."""

    def __init__(self, deps: list[dict], n_tokens: int):
        self.n = n_tokens
        self.children: dict[int, list[tuple[int, str]]] = {}
        self.parent: dict[int, tuple[int, str]] = {}
        for d in deps:
            g, t, r = d["frm"], d["to"], d["rfunc"]
            self.children.setdefault(g, []).append((t, r))
            # first governor wins (deterministic: deps are emitted in order)
            self.parent.setdefault(t, (g, r))

    def label_char(self, label: str) -> str:
        return _intern_label(label)

    def compile_path(self, pattern: str) -> re.Pattern:
        """Compile a label-path regex: label names in the pattern are
        replaced by their interned chars.  Labels are matched as whole
        tokens; regex operators pass through.
        (≙ KAFDocument.getDepPathRegex :1923-1971)"""
        cached = _COMPILED.get(pattern)
        if cached is not None:
            return cached
        out = []
        i = 0
        while i < len(pattern):
            ch = pattern[i]
            if ch.isspace():      # whitespace separates adjacent labels
                i += 1
            elif ch.isalpha():
                j = i
                while j < len(pattern) and (pattern[j].isalnum() or pattern[j] in "_-"):
                    j += 1
                out.append(re.escape(self.label_char(pattern[i:j])))
                i = j
            else:
                out.append(ch)
                i += 1
        rx = re.compile("".join(out))
        _COMPILED[pattern] = rx
        return rx

    # --- head extraction (null on multi-root, :2027-2044) ------------------

    def terms_head(self, span: set[int] | list[int]) -> int | None:
        span = set(span)
        roots = set()
        for t in span:
            cur, seen = t, {t}
            while True:
                p = self.parent.get(cur)
                if p is None or p[0] not in span:
                    roots.add(cur)
                    break
                cur = p[0]
                if cur in seen:       # cycle guard
                    roots.add(cur)
                    break
                seen.add(cur)
        return roots.pop() if len(roots) == 1 else None

    # --- path + regex selection -------------------------------------------

    def path_labels(self, ancestor: int, descendant: int) -> list[str] | None:
        """Labels on the parent-chain from descendant up to ancestor,
        in root→leaf order; None if ancestor isn't on the chain."""
        labels: list[str] = []
        cur = descendant
        while cur != ancestor:
            p = self.parent.get(cur)
            if p is None:
                return None
            labels.append(p[1])
            cur = p[0]
            if len(labels) > self.n:
                return None
        return list(reversed(labels))

    def match_path(self, ancestor: int, descendant: int, pattern: str) -> bool:
        labels = self.path_labels(ancestor, descendant)
        if labels is None:
            return False
        rx = self.compile_path(pattern)
        return rx.fullmatch("".join(self.label_char(l) for l in labels)) is not None

    def terms_by_dep_descendants(self, heads: set[int] | list[int],
                                 pattern: str) -> set[int]:
        """All descendants of ``heads`` whose label path from the head
        fullmatches ``pattern`` (heads themselves match with the empty
        path iff the regex accepts ε) — ≙ getTermsByDepDescendants."""
        rx = self.compile_path(pattern)
        out: set[int] = set()
        for h in heads:
            stack = [(h, "")]
            seen = {h}
            while stack:
                node, path = stack.pop()
                if rx.fullmatch(path):
                    out.add(node)
                for (child, label) in self.children.get(node, []):
                    if child not in seen:
                        seen.add(child)
                        stack.append((child, path + self.label_char(label)))
        return out

    def terms_by_dep_ancestors(self, descendants: set[int] | list[int],
                               pattern: str) -> set[int]:
        """All ancestors A of any d ∈ descendants such that the label
        path A→d fullmatches ``pattern`` — ≙ getTermsByDepAncestors."""
        rx = self.compile_path(pattern)
        out: set[int] = set()
        for d in descendants:
            chain: list[str] = []
            cur = d
            if rx.fullmatch(""):
                out.add(d)
            while True:
                p = self.parent.get(cur)
                if p is None or len(chain) > self.n:
                    break
                chain.append(self.label_char(p[1]))
                cur = p[0]
                if rx.fullmatch("".join(reversed(chain))):
                    out.add(cur)
        return out


# the reference's walk patterns, restated over our label set
MODIFIER_PATTERN = "(NMOD|AMOD|APPO)"          # RDFGenerator.java:106 analogue
PARTICIPATION_PATTERN = "(COORD|CONJ)*"        # NAFFilter.java:92-93 analogue
