"""Minimal Turtle/TriG reader for the conformance-evaluation graphs.

Covers exactly the syntax used by the reference's evaluation corpus
(/root/reference/docs/eval-pm/{gold,pikes}/*.ttl and
pikes/pikes.patch.trig — see pikes-rdf eval/Converter.java for the
consuming side): ``@prefix`` directives, IRIs, prefixed names with
dotted locals (``nb:stamp.01``), ``a``, ``;`` / ``,`` continuation,
plain / triple-quoted / datatyped literals, ``# comments`` and one
level of TriG graph blocks.  No blank nodes or collections (the corpus
has none).

Terms are returned as plain strings: IRIs fully expanded, literals as
their raw ``"..."`` / ``"..."^^<dt>`` source form.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<lit3>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<lit>"(?:[^"\\]|\\.)*")
    | (?P<dt>\^\^)
    | (?P<punct>[;,.{}])
    | (?P<kw>@prefix(?=\s))
    | (?P<lang>@[a-zA-Z][a-zA-Z\-]*)
    | (?P<pname>(?:[A-Za-z0-9_][A-Za-z0-9_.%\-]*)?:[A-Za-z0-9_%][A-Za-z0-9_.%\-]*|
                (?:[A-Za-z0-9_][A-Za-z0-9_.%\-]*)?:)
    | (?P<bool>true\b|false\b)
    | (?P<num>[+-]?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)
    | (?P<a>a(?=[\s<]))
    """,
    re.X,
)

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _tokenize(text: str):
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if m is None:
            raise ValueError(f"turtle: cannot tokenize at {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "pname":
            val = m.group(0)
            # a PN_LOCAL must not end with '.' — trailing dots are
            # statement terminators (``a nb:stamp.01.``)
            dots = 0
            while val.endswith("."):
                val = val[:-1]
                dots += 1
            yield ("pname", val)
            for _ in range(dots):
                yield ("punct", ".")
        elif kind == "kw":
            yield ("kw", m.group(0))
        elif kind == "a":
            yield ("kw", "a")
        elif kind == "iri":
            yield ("iri", m.group(0)[1:-1])
        elif kind in ("lit", "lit3"):
            yield ("literal", m.group(0))
        elif kind == "bool":
            yield ("literal", f'"{m.group(0)}"')
        elif kind == "num":
            yield ("literal", f'"{m.group(0)}"')
        elif kind == "dt":
            yield ("dt", "^^")
        elif kind == "lang":
            yield ("lang", m.group(0))
        else:
            yield ("punct", m.group(0))


def _unquote(raw: str) -> str:
    body = raw[3:-3] if raw.startswith('"""') else raw[1:-1]
    return (body.replace("\\n", "\n").replace("\\t", "\t").replace('\\"', '"')
            .replace("\\\\", "\\"))


def literal_value(term: str) -> str | None:
    """Lexical form of a literal term (None for IRIs)."""
    if term.startswith('"'):
        m = re.match(r'^("""(?:[^"\\]|\\.|"(?!""))*"""|"(?:[^"\\]|\\.)*")', term, re.S)
        if m:
            return _unquote(m.group(1))
    return None


class TurtleParser:
    def __init__(self, text: str, prefixes: dict[str, str] | None = None):
        self.tokens = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict[str, str] = dict(prefixes or {})
        self.triples: list[tuple[str, str, str]] = []
        # TriG graph context per triple: "" = default graph (top level or
        # an anonymous ``{ ... }`` block), else the expanded graph IRI
        self.quads: list[tuple[str, str, str, str]] = []
        self._graph = ""

    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expand(self, pname: str) -> str:
        prefix, _, local = pname.partition(":")
        base = self.prefixes.get(prefix)
        if base is None:
            raise ValueError(f"turtle: unknown prefix {prefix!r}")
        return base + local

    def _term(self) -> str:
        kind, val = self._next()
        if kind == "iri":
            return val
        if kind == "pname":
            return self._expand(val)
        if kind == "kw" and val == "a":
            return _RDF_TYPE
        if kind == "literal":
            out = val
            k2, v2 = self._peek()
            if k2 == "dt":
                self._next()
                dt_kind, dt_val = self._next()
                dt = dt_val if dt_kind == "iri" else self._expand(dt_val)
                out = f"{val}^^<{dt}>"
            elif k2 == "lang":
                self._next()
                out = f"{val}{v2}"
            return out
        raise ValueError(f"turtle: unexpected term token {kind} {val!r}")

    def parse(self) -> list[tuple[str, str, str]]:
        while True:
            kind, val = self._peek()
            if kind == "eof":
                break
            if kind == "kw" and val == "@prefix":
                self._next()
                k, pv = self._next()
                assert k == "pname" and pv.endswith(":") or ":" in pv
                prefix = pv[:-1] if pv.endswith(":") else pv.split(":")[0]
                ik, iv = self._next()
                assert ik == "iri", (ik, iv)
                self.prefixes[prefix] = iv
                pk, _ = self._next()          # '.'
                assert pk == "punct"
                continue
            if kind == "punct" and val == "{":
                self._next()                   # anonymous TriG block → default
                self._graph = ""
                continue
            if kind == "punct" and val == "}":
                self._next()                   # close TriG block
                self._graph = ""
                continue
            self._statement()
        return self.triples

    def _statement(self) -> None:
        subj = self._term()
        kind, val = self._peek()
        if kind == "punct" and val == "{":     # TriG: subj was a graph name
            self._next()
            self._graph = subj
            return                             # contents parse as statements
        while True:
            pred = self._term()
            while True:
                obj = self._term()
                self.triples.append((subj, pred, obj))
                self.quads.append((self._graph, subj, pred, obj))
                kind, val = self._peek()
                if kind == "punct" and val == ",":
                    self._next()
                    continue
                break
            kind, val = self._next()
            if kind == "punct" and val == ";":
                # allow trailing ';' before '.'
                k2, v2 = self._peek()
                if k2 == "punct" and v2 == ".":
                    self._next()
                    return
                continue
            if kind == "punct" and val == ".":
                return
            if kind == "punct" and val == "}":
                return
            raise ValueError(f"turtle: unexpected {kind} {val!r} after object")


def parse_turtle(text: str,
                 prefixes: dict[str, str] | None = None) -> list[tuple[str, str, str]]:
    return TurtleParser(text, prefixes).parse()


def parse_trig(text: str,
               prefixes: dict[str, str] | None = None
               ) -> list[tuple[str, str, str, str]]:
    """Parse TriG, keeping graph context: → [(graph, s, p, o)] where
    graph is "" for the default graph (top-level statements and
    anonymous ``{ ... }`` blocks) or the expanded graph-name IRI."""
    p = TurtleParser(text, prefixes)
    p.parse()
    return p.quads
