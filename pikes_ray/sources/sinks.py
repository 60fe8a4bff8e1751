"""Output sinks (≙ S5 RDF writer / S6 NAF writer, SURVEY §2.1).

- ``write_ntriples``: triples Dataset → N-Quads-ish text files, CURIEs
  expanded via the namespace table (≙ rdfpro TriG/TQL writer,
  RDFGenerator.java:323-446).  One file per block — a directory of
  parts, never one giant file.
- ``write_debug_json``: annotated Dataset → JSON lines of the nested
  annotation columns (the NAF-XML debug serialization analogue —
  intermediate state is columnar, XML is unnecessary; SURVEY §1.4).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import re

from pikes_ray.functions.iri import NAMESPACES

# a datatype tag is ONLY a trailing ^^prefix:local AFTER the closing quote
# — a '^^' inside the lexical form (possible in transcript text) is data
_DATATYPE_RE = re.compile(r'^("(?:[^"\\]|\\.)*")\^\^(\S+)$', re.S)

# F17 srlPreMOnIRIs: a PB/NB role property CURIE (internal shape
# ``pb:<sense>-a0`` / ``nb:<sense>-amtmp``) expands to the reference's
# PreMOn role IRI ``…/pb17-<sense>@arg0`` — `@` separator and the
# A0→arg0 / AM-TMP→argtmp localname normalization of
# NAFUtils.createPreMOnSemanticRoleIRIfor (NAFUtils.java:1015-1048).
# Non-role suffixes (e.g. the ``-neg`` variant marker) stay as-is.
_PM_ROLE_RE = re.compile(r"^(pb|nb):(.+\.\d\d?)-(a[0-9a]|am[a-z]+)$")


def _premon_role_local(suffix: str) -> str:
    if suffix.startswith("am"):
        return "arg" + suffix[2:]
    return suffix.replace("a", "arg")   # a0→arg0; aa→argarg (ref quirk)


def expand_curie(term: str) -> str:
    """CURIE → full IRI in N-Triples angle brackets; literals pass through."""
    if term.startswith('"'):
        m = _DATATYPE_RE.match(term)
        if m:
            return f"{m.group(1)}^^{expand_curie(m.group(2))}"
        return term
    m = _PM_ROLE_RE.match(term)
    if m:
        base = NAMESPACES[m.group(1)]
        return f"<{base}{m.group(2)}@{_premon_role_local(m.group(3))}>"
    prefix, _, local = term.partition(":")
    base = NAMESPACES.get(prefix)
    if base is not None:
        return f"<{base}{local}>"
    return f"<{term}>"


def format_ntriples(batch: pa.Table) -> pa.Table:
    subj = batch["subj"].to_pylist()
    pred = batch["pred"].to_pylist()
    obj = batch["obj"].to_pylist()
    graph = batch["graph"].to_pylist()
    lines = []
    for s, p, o, g in zip(subj, pred, obj, graph):
        quad = f"{expand_curie(s)} {expand_curie(p)} {expand_curie(o)}"
        if g:
            quad += f" {expand_curie(g)}"
        lines.append(quad + " .")
    return pa.table({"text": pa.array(lines, pa.string())})


def write_ntriples(triples, out_dir: str, compression: str | None = None) -> int:
    """Each block writes its own ``part-*.nt`` file (text sink — CSV/JSON
    writers would quote the N-Triples syntax).  Returns lines written.

    ``compression="gzip"`` emits ``part-*.nt.gz`` (≙ the reference's
    ``.tql.gz`` per-document intermediates, RDFGenerator.java:412-415)."""
    import os
    import uuid

    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        lines = format_ntriples(batch)["text"].to_pylist()
        if lines:
            data = ("\n".join(lines) + "\n").encode("utf-8")
            if compression == "gzip":
                import gzip

                path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt.gz")
                # mtime=0: deterministic bytes for identical content
                data = gzip.compress(data, mtime=0)
            else:
                path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
            with open(path + ".tmp", "wb") as f:
                f.write(data)
            os.replace(path + ".tmp", path)      # atomic publish
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    parts = triples.map_batches(write_block, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return int(parts.aggregate(Sum("n", alias_name="n"))["n"])


def write_debug_json(annotated, out_dir: str) -> None:
    """JSON-lines debug dump of the annotation layers, one dir of parts."""

    def to_json(df: pd.DataFrame) -> pd.DataFrame:
        return df

    annotated.map_batches(to_json, batch_format="pandas").write_json(out_dir)


def write_naf_xml(annotated, out_dir: str) -> int:
    """S6 — NAF-style XML debug sink (≙ kaflib XML serialization /
    TxtToNaf output): one ``<NAF>`` document per transcript turn with
    text, terms, entities and SRL layers.  Parts directory, one file
    per block; returns documents written.

    The engine's intermediate state is columnar by design (SURVEY
    §1.4) — this sink exists for interop/debugging parity with the
    reference's on-disk NAF corpus layout, not as a pipeline stage.
    """
    import os
    import uuid
    from xml.sax.saxutils import escape, quoteattr

    from pikes_ray.functions.constituency import constituency_layers

    os.makedirs(out_dir, exist_ok=True)

    def chunk_layer(toks, deps) -> str:
        """M8 constituency head-marking analogue: NAF ``chunks`` layer
        with ``head=`` attributes (kaflib Chunk.head; the reference's
        Collins head finder marks heads in the parse string —
        AnnotationPipeline.java:100-122, used only for this layer).
        Phrases are maximal NMOD/AMOD attachment groups under a
        nounish head, derived from the dependency layer."""
        parent = {d["to"]: (d["frm"], d["rfunc"]) for d in deps}
        groups: dict[int, list[int]] = {}
        for i, t in enumerate(toks):
            node, seen = i, 0
            while seen < 8:
                up = parent.get(node)
                if up is None or up[1] not in ("NMOD", "AMOD"):
                    break
                node = up[0]
                seen += 1
            if toks[node]["pos"].startswith("N"):
                groups.setdefault(node, []).append(i)
        out = ["<chunks>"]
        for k, (head, members) in enumerate(sorted(groups.items())):
            if len(members) < 2 and members == [head]:
                continue   # single-token chunks add nothing
            targets = "".join(f'<target id="t{j}"/>' for j in sorted(members))
            out.append(f'<chunk id="c{k}" head="t{head}" phrase="NP">'
                       f"<span>{targets}</span></chunk>")
        out.append("</chunks>")
        return "".join(out)

    def render_doc(row) -> str:
        toks = list(row.tokens) if row.tokens is not None else []
        ents = list(row.entities) if row.entities is not None else []
        prds = list(row.predicates) if row.predicates is not None else []
        dps = list(row.deps) if getattr(row, "deps", None) is not None else []
        buf = [f'<NAF xml:lang="en" version="v3">',
               f"<nafHeader><public publicId="
               f"{quoteattr(f'{row.conv_id}#turn={row.turn_idx}')}/></nafHeader>",
               f"<raw>{escape(row.text or '')}</raw>", "<text>"]
        for i, t in enumerate(toks):
            buf.append(
                f'<wf id="w{i}" offset="{t["offset"]}" length="{t["length"]}" '
                f'sent="{t["sent"]}">{escape(t["form"])}</wf>')
        buf.append("</text><terms>")
        for i, t in enumerate(toks):
            # M11 canonical form: term senses travel as externalRefs with
            # the kaflib resource names (NAFUtils.java:61-65 wn30-ukb /
            # wn30-sst / BBN), wrapped per ReadWriteManager (~2934).
            refs = "".join(
                f'<externalRef resource="{res}" reference={quoteattr(val)}/>'
                for res, val in (("wn30-ukb", t.get("synset") or ""),
                                 ("wn30-sst", t.get("sst") or ""),
                                 ("BBN", t.get("bbn") or ""))
                if val)
            refs = f"<externalReferences>{refs}</externalReferences>" if refs else ""
            buf.append(
                f'<term id="t{i}" lemma={quoteattr(t["lemma"])} '
                f'pos={quoteattr(t["pos"])} morphofeat={quoteattr(t["morphofeat"])}>'
                f'<span><target id="w{i}"/></span>{refs}</term>')
        buf.append("</terms><entities>")
        for k, e in enumerate(ents):
            targets = "".join(f'<target id="t{j}"/>'
                              for j in range(e["start"], e["end"]))
            val = f' value={quoteattr(e["norm"])}' if e.get("norm") else ""
            ref = (f'<externalReferences><externalRef resource="dbpedia" '
                   f'reference={quoteattr(e["link"])} '
                   f'confidence="{e["link_conf"]}"/></externalReferences>'
                   if e.get("link") else "")
            buf.append(f'<entity id="e{k}" type={quoteattr(e["etype"] or "MISC")}{val}>'
                       f"<references><span>{targets}</span></references>{ref}</entity>")
        buf.append("</entities>")
        # timeExpressions layer (kaflib Timex3: WF spans + TimeML value)
        tmx = [(k, e) for k, e in enumerate(ents)
               if e["etype"] in ("DATE", "DURATION") and e.get("norm")]
        if tmx:
            buf.append("<timeExpressions>")
            for k, e in tmx:
                targets = "".join(f'<target id="w{j}"/>'
                                  for j in range(e["start"], e["end"]))
                ttype = "DURATION" if e["etype"] == "DURATION" else "DATE"
                buf.append(f'<timex3 id="tmx{k}" type="{ttype}" '
                           f'value={quoteattr(e["norm"])}>'
                           f"<span>{targets}</span></timex3>")
            buf.append("</timeExpressions>")
        # linkedEntities layer (kaflib LinkedEntity: WF spans + EL ref)
        les = [(k, e) for k, e in enumerate(ents) if e.get("link")]
        if les:
            buf.append("<linkedEntities>")
            for k, e in les:
                targets = "".join(f'<target id="w{j}"/>'
                                  for j in range(e["start"], e["end"]))
                buf.append(f'<linkedEntity id="le{k}" resource="dbpedia" '
                           f'reference={quoteattr(e["link"])} '
                           f'confidence="{e["link_conf"]}">'
                           f"<span>{targets}</span></linkedEntity>")
            buf.append("</linkedEntities>")
        # opinions layer (kaflib Opinion: expression/holder/target term
        # spans + polarity) — only present on NAF-interop rows; the
        # native annotator leaves the column empty
        opins = list(getattr(row, "opinions", None) or [])
        if opins:
            buf.append("<opinions>")
            for k, o in enumerate(opins):
                def _sp(s, e):
                    return "<span>" + "".join(
                        f'<target id="t{j}"/>' for j in range(s, e)) + "</span>"
                parts = [f'<opinion id="o{k}">']
                if o["holder_start"] >= 0:
                    parts.append("<opinion_holder>"
                                 + _sp(o["holder_start"], o["holder_end"])
                                 + "</opinion_holder>")
                if o["target_start"] >= 0:
                    parts.append("<opinion_target>"
                                 + _sp(o["target_start"], o["target_end"])
                                 + "</opinion_target>")
                pol = f' polarity={quoteattr(o["polarity"])}' if o.get("polarity") else ""
                if o["expr_start"] >= 0:
                    parts.append(f"<opinion_expression{pol}>"
                                 + _sp(o["expr_start"], o["expr_end"])
                                 + "</opinion_expression>")
                elif pol:
                    parts.append(f"<opinion_expression{pol}/>")
                parts.append("</opinion>")
                buf.append("".join(parts))
            buf.append("</opinions>")
        # markables layer (kaflib Mark: term spans + externalRefs) —
        # the linked mentions again in the markable form the reference
        # serializes (ReadWriteManager markables; round-5 interop)
        if les:
            buf.append("<markables>")
            for k, e in les:
                targets = "".join(f'<target id="t{j}"/>'
                                  for j in range(e["start"], e["end"]))
                buf.append(f'<mark id="m{k}"><span>{targets}</span>'
                           f'<externalReferences><externalRef '
                           f'resource="dbpedia" '
                           f'reference={quoteattr(e["link"])} '
                           f'confidence="{e["link_conf"]}"/>'
                           f"</externalReferences></mark>")
            buf.append("</markables>")
        buf.append("<srl>")
        for k, p in enumerate(prds):
            roles = "".join(
                f'<role id="r{k}_{m}" semRole={quoteattr(r["sem_role"])}>'
                f'<span><target id="t{r["head"]}"/></span></role>'
                for m, r in enumerate(p["roles"]))
            buf.append(
                f'<predicate id="pr{k}"><externalRef reference='
                f'{quoteattr(p["sense"] or "")}/>'
                f'<span><target id="t{p["head"]}"/></span>{roles}</predicate>')
        buf.append("</srl>")
        # factualities layer (kaflib Factuality: term span + factVal
        # rows): carried value, else the same deterministic derivation
        # the extractor uses (stages/extract.factuality_value) — so a
        # write→read round trip preserves ks:factuality exactly
        if prds:
            from pikes_ray.stages.extract import factuality_value

            tok_dicts = [dict(form=t["form"], sent=t["sent"],
                              lemma=t["lemma"],
                              morphofeat=t["morphofeat"]) for t in toks]
            buf.append("<factualities>")
            for k, p in enumerate(prds):
                fv = p.get("factuality") or factuality_value(
                    tok_dicts, p["head"])
                buf.append(f'<factuality id="f{k}">'
                           f'<span><target id="t{p["head"]}"/></span>'
                           f'<factVal value={quoteattr(fv)} '
                           f'resource="factbank"/></factuality>')
            buf.append("</factualities>")
        buf.append(chunk_layer(toks, dps))
        # M8: real constituency trees (dep→constituency projection +
        # Collins head finder) in both kaflib forms — the head-marked
        # Penn string (constituencyStrings) and the structured
        # nt/t/edge layer (AnnotationPipeline.java:901-915).
        buf.append(constituency_layers(toks, dps))
        buf.append("</NAF>")
        return "".join(buf)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        docs = [render_doc(row) for row in df.itertuples()]
        if docs:
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.xml")
            with open(path + ".tmp", "w") as f:
                f.write("\n".join(docs) + "\n")
            os.replace(path + ".tmp", path)
        return pd.DataFrame({"n": [len(docs)]})

    parts = annotated.map_batches(write_block, batch_format="pandas")
    from ray.data.aggregate import Sum

    return int(parts.aggregate(Sum("n", alias_name="n"))["n"])


# --------------------------------------------------------------------------
# S5 counterpart: N-Quads READER (round-trips write_ntriples; also reads
# reference-style .tql/.nq corpora — one quad per line, full IRIs)
# --------------------------------------------------------------------------

# one RDF term: <iri> | "literal"(^^<dt> | @lang)?  (blank nodes _:b are
# matched by the bare-token fallback)
_NQ_TERM = re.compile(
    r'<[^>]*>'
    r'|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9\-]*)?'
    r'|\S+')

# longest namespace first so e.g. premon pb17-/nb10- win over any shorter
# shared base
_NS_BY_LEN = sorted(NAMESPACES.items(), key=lambda kv: -len(kv[1]))
_LIT_DT_RE = re.compile(r'^("(?:[^"\\]|\\.)*")\^\^<(.+)>$', re.S)


def compact_iri(term: str) -> str:
    """Full IRI / literal term → the engine's internal CURIE form
    (reverse of :func:`expand_curie` for the plain-prefix cases; PreMOn
    role IRIs keep their normalized ``sense@argN`` localname — the
    normalization in ``_premon_role_local`` is lossy by design)."""
    if term.startswith('"'):
        m = _LIT_DT_RE.match(term)
        if m:
            return f"{m.group(1)}^^{compact_iri('<' + m.group(2) + '>')}"
        return term
    iri = term[1:-1] if term.startswith("<") and term.endswith(">") else term
    for prefix, base in _NS_BY_LEN:
        if iri.startswith(base):
            return f"{prefix}:{iri[len(base):]}"
    return iri


def parse_ntriples_lines(lines, compact: bool = True,
                         on_error: str = "raise"):
    """Yield (subj, pred, obj, graph) tuples from N-Triples/N-Quads
    lines.  ``on_error="skip"`` drops malformed lines (log-and-continue,
    the reference's per-file policy); default raises."""
    for ln_no, line in enumerate(lines, start=1):
        s = line.strip()
        if not s or s.startswith("#"):
            continue
        terms = _NQ_TERM.findall(s)
        if terms and terms[-1] == ".":
            terms = terms[:-1]
        if len(terms) not in (3, 4):
            if on_error == "skip":
                continue
            raise ValueError(f"malformed N-Quads line {ln_no}: {line!r}")
        if compact:
            terms = [compact_iri(t) for t in terms]
        else:
            terms = [t[1:-1] if t.startswith("<") and t.endswith(">")
                     else t for t in terms]
        yield (terms[0], terms[1], terms[2],
               terms[3] if len(terms) == 4 else "")


def read_ntriples(paths, compact: bool = True, on_error: str = "raise"):
    """N-Triples/N-Quads corpus → triples Dataset[subj, pred, obj,
    graph] (file-per-task parallelism, ``.gz/.bz2/.xz`` transparent).

    ``compact=True`` (default) folds full IRIs back into the engine's
    CURIE namespace so ``read_ntriples(write_ntriples(tr))`` feeds the
    same downstream stages as the in-memory triples; re-serializing the
    result reproduces the original file content line-for-line
    (tests/test_sources_sinks.py round-trip)."""
    import ray.data as rd

    from pikes_ray.sources.ingest import _decompress

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(df: pd.DataFrame) -> pa.Table:
        subj, pred, obj, graph = [], [], [], []
        for p, b in zip(df["path"], df["bytes"]):
            text = _decompress(p, b).decode("utf-8", "replace")
            for s_, p_, o_, g_ in parse_ntriples_lines(
                    text.splitlines(), compact=compact, on_error=on_error):
                subj.append(s_); pred.append(p_)
                obj.append(o_); graph.append(g_)
        return pa.table({
            "subj": pa.array(subj, pa.large_string()),
            "pred": pa.array(pred, pa.large_string()),
            "obj": pa.array(obj, pa.large_string()),
            "graph": pa.array(graph, pa.large_string())})

    return ds.map_batches(parse, batch_format="pandas")
