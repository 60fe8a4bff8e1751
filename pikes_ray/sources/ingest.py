"""Ingest recipes: alternative sources → the canonical transcript schema
(≙ the reference's per-dataset corpus converters, S4 — Email2NAF,
signalmedia JsonToNaf etc., pikes-resources/.../resources/*; we expose
*generic* recipes instead of per-dataset ports: the transcript table is
the engine's sole canonical input).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from pikes_ray.schema import TRANSCRIPT_SCHEMA

_EPOCH = pd.Timestamp("2024-01-01")


def _conform(df: pd.DataFrame) -> pa.Table:
    for col, default in (("conv_id", ""), ("turn_idx", 0), ("role", "user"),
                         ("text", ""), ("tool", "")):
        if col not in df.columns:
            df[col] = default
    if "ts" not in df.columns:
        df["ts"] = _EPOCH
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df = df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    return pa.Table.from_pandas(df, schema=TRANSCRIPT_SCHEMA, preserve_index=False)


def read_jsonl_transcripts(paths):
    """JSONL with (conv_id, turn_idx, role, text[, tool, ts]) fields →
    canonical transcript Dataset (≙ signalmedia/JsonToNaf.java shape)."""
    return rd.read_json(paths).map_batches(_conform, batch_format="pandas")


def _decompress(path: str, data: bytes) -> bytes:
    """Transparent per-file decompression (≙ the reference corpus
    reader's .naf.gz/.bz2/.xz handling, Corpus.java:67-68).

    Detection is by MAGIC BYTES, not suffix: Ray's ``read_binary_files``
    already auto-decompresses some extensions (``.gz``) via Arrow, so a
    suffix rule would double-decompress those and miss renamed files."""
    try:
        if data[:2] == b"\x1f\x8b":
            import gzip

            return gzip.decompress(data)
        if data[:3] == b"BZh":
            import bz2

            return bz2.decompress(data)
        if data[:6] == b"\xfd7zXZ\x00":
            import lzma

            return lzma.decompress(data)
    except Exception:
        # truncated/corrupt archive: log-and-continue (SURVEY §4 —
        # a poison FILE must not kill the task/shard); the empty
        # payload yields zero documents / a quarantined empty turn
        import logging

        logging.getLogger(__name__).warning(
            "corrupt compressed input skipped: %s", path)
        return b""
    return data


def read_text_documents(paths):
    """Plain-text files → one single-turn conversation per file
    (≙ TxtToNaf.java).  conv_id = file path, turn_idx = 0.
    ``.gz/.bz2/.xz`` files are decompressed transparently.

    ``read_binary_files`` yields one row per FILE (``read_text`` would
    split a file's lines across blocks and need a reassembly shuffle)."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def conform(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "conv_id": df["path"],
            "text": [_decompress(p, b).decode("utf-8", "replace")
                     for p, b in zip(df["path"], df["bytes"])],
        })
        return _conform(out)

    return ds.map_batches(conform, batch_format="pandas")


def read_documents_as_transcripts(sf_dir: str):
    """The testdata ``documents`` table → transcript rows (doc_id becomes
    a single-turn conversation) — lets every KG query also run over the
    generic documents corpus."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")

    def conform(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "conv_id": "doc-" + df["doc_id"].astype(str).str.zfill(8),
            "turn_idx": 0,
            "role": "user",
            "text": df["text"].fillna(""),
            "tool": "",
        })
        return _conform(out)

    return ds.map_batches(conform, batch_format="pandas")


def read_csv_transcripts(paths):
    """CSV with (conv_id, turn_idx, role, text[, tool, ts]) columns →
    canonical transcript Dataset (generic tabular-corpus recipe, the
    S4 converter family's CSV member)."""
    return rd.read_csv(paths).map_batches(_conform, batch_format="pandas")


def read_email_transcripts(paths):
    """RFC-822-style email files → one conversation per message
    (≙ enronEmailDataset/Email2NAF.java:44-233): headers parsed with the
    stdlib ``email`` package, Subject + From land in the metadata
    columns, the body is the turn text, Date (when parseable) the ts.
    conv_id = Message-ID (file path fallback)."""
    import email
    import email.utils

    ds = rd.read_binary_files(paths, include_paths=True)

    def conform(df: pd.DataFrame) -> pa.Table:
        rows = []
        for path, data in zip(df["path"], df["bytes"]):
            msg = email.message_from_string(data.decode("utf-8", "replace"))
            body = msg.get_payload()
            if isinstance(body, list):      # multipart: first text part
                body = next((p.get_payload() for p in body
                             if p.get_content_type() == "text/plain"), "")
            ts = None
            if msg.get("Date"):
                try:
                    ts = email.utils.parsedate_to_datetime(msg["Date"]) \
                        .replace(tzinfo=None)
                except (TypeError, ValueError):
                    ts = None
            rows.append({
                "conv_id": msg.get("Message-ID") or path,
                "turn_idx": 0,
                "role": msg.get("From") or "user",
                "text": (f"{msg.get('Subject')}\n{body}"
                         if msg.get("Subject") else str(body)),
                "tool": "email",
                "ts": ts or _EPOCH,
            })
        if not rows:
            return TRANSCRIPT_SCHEMA.empty_table()
        return _conform(pd.DataFrame(rows))

    return ds.map_batches(conform, batch_format="pandas")


def read_sgml_documents(paths):
    """TREC-style SGML corpora — ``<DOC><DOCNO>…</DOCNO><TEXT>…</TEXT>
    </DOC>`` blocks (≙ trec/FBIS.java and siblings): one single-turn
    conversation per DOC, conv_id = DOCNO."""
    import re as _re

    _doc = _re.compile(r"<DOC>(.*?)</DOC>", _re.S | _re.I)
    _docno = _re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>", _re.S | _re.I)
    _text = _re.compile(r"<TEXT>(.*?)</TEXT>", _re.S | _re.I)
    _tag = _re.compile(r"<[^>]+>")

    ds = rd.read_binary_files(paths, include_paths=True)

    def conform(df: pd.DataFrame) -> pa.Table:
        rows = []
        for path, data in zip(df["path"], df["bytes"]):
            raw = data.decode("utf-8", "replace")
            for block in _doc.findall(raw):
                dn = _docno.search(block)
                tx = _text.search(block)
                body = _tag.sub(" ", tx.group(1)).strip() if tx else ""
                rows.append({
                    "conv_id": dn.group(1) if dn else path,
                    "turn_idx": 0, "role": "user", "text": body, "tool": "",
                })
        if not rows:
            return TRANSCRIPT_SCHEMA.empty_table()
        return _conform(pd.DataFrame(rows))

    return ds.map_batches(conform, batch_format="pandas")


# ---------------------------------------------------------------------------
# S1 interop: NAF XML corpora → annotated Dataset
# ---------------------------------------------------------------------------

def _parse_naf_doc(xml_text: str) -> dict | None:
    """One ``<NAF>`` document → an ANNOTATED_SCHEMA row dict.

    Accepts both this engine's S6 output and reference-shaped kaflib
    NAF (ReadWriteManager.java serialization): 0/1-based ``w``/``t``
    ids are resolved through an id→index map built from layer order,
    spans take the ``head="yes"`` target when marked, entity external
    references become (link, link_conf), and PropBank/NomBank
    externalRefs on predicates become the ``sense``.
    """
    import re as _re
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return None
    if root.tag != "NAF":
        # Elements are falsy when childless — never chain with `or`.
        found = root.find(".//NAF")
        if found is not None:
            root = found
    raw = root.findtext("raw") or ""
    pub = root.find(".//nafHeader/public")
    public_id = (pub.get("publicId") or pub.get("uri") or "") if pub is not None else ""
    m = _re.search(r"#turn=(\d+)$", public_id)
    turn_idx = int(m.group(1)) if m else 0
    conv_id = public_id.split("#")[0] if public_id else "naf-doc"

    wf_idx: dict[str, int] = {}
    wfs = []
    for i, wf in enumerate(root.iter("wf")):
        wf_idx[wf.get("id") or f"w{i}"] = i
        wfs.append(wf)

    term_idx: dict[str, int] = {}
    term_of_wf: dict[int, int] = {}   # wf index → term index (1:1 here)
    tokens = []
    for i, term in enumerate(root.iter("term")):
        term_idx[term.get("id") or f"t{i}"] = i
        tgt = term.find(".//span/target")
        wi = wf_idx.get(tgt.get("id"), i) if tgt is not None else i
        term_of_wf.setdefault(wi, i)
        wf = wfs[wi] if wi < len(wfs) else None
        form = (wf.text or "") if wf is not None else ""
        penn = term.get("morphofeat") or ""
        pos = term.get("pos") or (penn[:1] if penn else "O")
        # M11 term-sense normalization (NAFUtils.normalize,
        # pikes-resources/.../NAFUtils.java:116-141): an externalRef with
        # resource wn30-ukb / wn30-sst / BBN wins; the legacy Term
        # attributes (`wordnet` / `supersense` / `bbn`,
        # ReadWriteManager.java:1031-1042) fill in ONLY when no ref with
        # that resource exists.  Term-level refs sit either as direct
        # children or inside an <externalReferences> wrapper.
        synset = sst = bbn = ""
        t_refs = list(term.findall("externalRef"))
        t_wrapper = term.find("externalReferences")
        if t_wrapper is not None:
            t_refs.extend(t_wrapper.iter("externalRef"))
        for ref in t_refs:
            res = (ref.get("resource") or "").lower()
            val = ref.get("reference") or ""
            if res == "wn30-ukb" and not synset:
                synset = val
            elif res == "wn30-sst" and not sst:
                sst = val
            elif res == "bbn" and not bbn:
                bbn = val
        synset = synset or term.get("wordnet") or ""
        sst = sst or term.get("supersense") or ""
        bbn = bbn or term.get("bbn") or ""
        tokens.append({
            "form": form,
            "offset": int(wf.get("offset", 0)) if wf is not None else 0,
            "length": int(wf.get("length", len(form))) if wf is not None else len(form),
            "sent": int(wf.get("sent", 0)) if wf is not None else 0,
            "pos": pos,
            "morphofeat": penn,
            "lemma": term.get("lemma") or form.lower(),
            "synset": synset,
            "sst": sst,
            "bbn": bbn,
        })

    def span_bounds(span_el):
        """(start, end, head) token indices from a <span> element."""
        ids = []
        head = None
        for t in span_el.findall("target"):
            ti = term_idx.get(t.get("id"))
            if ti is None:
                continue
            ids.append(ti)
            if (t.get("head") or "").lower() in ("yes", "true", "1"):
                head = ti
        if not ids:
            return None
        return min(ids), max(ids) + 1, head if head is not None else max(ids)

    deps = []
    for dep in root.iter("dep"):
        f, t = term_idx.get(dep.get("from")), term_idx.get(dep.get("to"))
        if f is not None and t is not None:
            deps.append({"frm": f, "to": t, "rfunc": dep.get("rfunc") or ""})

    _VALUE = {"MONEY", "PERCENT", "ORDINAL", "CARDINAL", "DATE", "DURATION"}
    entities = []
    for ent in root.iter("entity"):
        span = ent.find(".//references/span")
        if span is None:
            span = ent.find(".//span")
        if span is None:
            continue
        b = span_bounds(span)
        if b is None:
            continue
        link, conf = "", 0.0
        for ref in ent.iter("externalRef"):
            r = ref.get("reference") or ""
            c = float(ref.get("confidence") or 0.0)
            if r and (not link or c > conf):
                link, conf = r, c
        etype = ent.get("type") or ""
        entities.append({"etype": etype, "start": b[0], "end": b[1],
                         "named": etype not in _VALUE and etype != "",
                         "link": link, "link_conf": conf,
                         "norm": ent.get("value") or ""})

    predicates = []
    for pr in root.iter("predicate"):
        span = pr.find("span")
        if span is None:
            continue
        b = span_bounds(span)
        if b is None:
            continue
        head = b[2]
        sense, source = "", ""
        # kaflib serializes predicate refs inside an <externalReferences>
        # wrapper (ReadWriteManager.java ~2609); this engine's S6 sink and
        # some hand-built NAF place them as direct children.  Scan both —
        # but NOT pr.iter(), which would pick up role-level refs.
        pred_refs = list(pr.findall("externalRef"))
        wrapper = pr.find("externalReferences")
        if wrapper is not None:
            pred_refs.extend(wrapper.iter("externalRef"))
        # M11 normalizeRefs (NAFUtils.java:527-537): drop duplicate
        # (resource, reference) pairs before folding.
        _seen_refs: set[tuple[str, str]] = set()
        pred_refs = [r for r in pred_refs
                     if (k := (r.get("resource") or "", r.get("reference") or ""))
                     not in _seen_refs and not _seen_refs.add(k)]
        for ref in pred_refs:
            res = (ref.get("resource") or "").lower()
            if not sense or res.startswith(("propbank", "nombank")):
                sense = ref.get("reference") or sense
            if res.startswith("nombank"):
                source = "nominal"
        if not source:
            source = "verbal" if tokens[head]["morphofeat"].startswith("V") \
                else "nominal"
        roles = []
        for ro in pr.findall("role"):
            rspan = ro.find("span")
            rb = span_bounds(rspan) if rspan is not None else None
            if rb is None:
                continue
            roles.append({"sem_role": ro.get("semRole") or "",
                          "start": rb[0], "end": rb[1], "head": rb[2],
                          "prep": "", "models": "", "fn_role": ""})
        predicates.append({"head": head, "sense": sense, "source": source,
                           "copular": tokens[head]["lemma"] == "be",
                           "variant": 0, "link": "", "link_conf": 0.0,
                           "factuality": "", "roles": roles})

    corefs = []
    for co in root.iter("coref"):
        spans = []
        for span in co.findall("span"):
            b = span_bounds(span)
            if b is not None:
                spans.append({"start": b[0], "end": b[1]})
        if len(spans) >= 2:
            corefs.append(spans)

    def wf_span_bounds(span_el):
        """(start, end) TERM indices from a span targeting WF ids —
        timex3 and linkedEntity spans reference tokens, not terms
        (Timex3.java / LinkedEntity.java hold Span<WF>)."""
        ids = []
        for t in span_el.findall("target"):
            wi = wf_idx.get(t.get("id"))
            if wi is None:
                continue
            ids.append(term_of_wf.get(wi, wi))
        if not ids:
            return None
        return min(ids), max(ids) + 1

    # timeExpressions layer (ReadWriteManager.java timex3 parse;
    # Timex3.java:1-308): fold into the engine's entity model — a
    # DATE/DURATION entity with norm = the TimeML value.  When an
    # entities-layer DATE/DURATION already covers the span, the timex
    # VALUE fills its empty norm (carried value wins; T1 then builds
    # OWL-Time from it instead of re-deriving from the lexicon).
    for tmx in root.iter("timex3"):
        span = tmx.find("span")
        b = wf_span_bounds(span) if span is not None else None
        if b is None:
            continue
        val = tmx.get("value") or ""
        ttype = (tmx.get("type") or "").upper()
        etype = "DURATION" if ttype == "DURATION" else "DATE"
        hit = next((e for e in entities
                    if e["etype"] in ("DATE", "DURATION")
                    and e["start"] < b[1] and b[0] < e["end"]), None)
        if hit is not None:
            if not hit["norm"]:
                hit["norm"] = val
        else:
            entities.append({"etype": etype, "start": b[0], "end": b[1],
                             "named": False, "link": "", "link_conf": 0.0,
                             "norm": val})

    # linkedEntities layer (LinkedEntity.java:1-136): a DBpedia-style
    # reference + confidence over a WF span.  Carried links WIN over
    # gazetteer re-derivation: they land on the overlapping entity
    # (highest confidence kept) or mint a new named entity row, so T2
    # emits owl:sameAs from the reference's own EL annotations.
    for le in root.iter("linkedEntity"):
        span = le.find("span")
        b = wf_span_bounds(span) if span is not None else None
        ref = le.get("reference") or ""
        if b is None or not ref:
            continue
        conf = float(le.get("confidence") or 0.0)
        hit = next((e for e in entities
                    if e["start"] < b[1] and b[0] < e["end"]), None)
        if hit is not None:
            if not hit["link"] or conf > hit["link_conf"]:
                hit["link"], hit["link_conf"] = ref, conf
        else:
            entities.append({"etype": "", "start": b[0], "end": b[1],
                             "named": True, "link": ref, "link_conf": conf,
                             "norm": ""})

    # markables layer (ixa/kaflib Mark: Span<Term> + externalRefs —
    # ReadWriteManager markables parse; round-5 interop item): a mark
    # carrying a dbpedia-style reference behaves like a linked-entity
    # annotation over TERM ids — fold it with the same carried-wins
    # merge as linkedEntities above.
    for mk in root.iter("mark"):
        span = mk.find("span")
        b = span_bounds(span) if span is not None else None
        if b is None:
            continue
        ref = conf = None
        m_refs = list(mk.findall("externalRef"))
        m_wrap = mk.find("externalReferences")
        if m_wrap is not None:
            m_refs.extend(m_wrap.iter("externalRef"))
        for r in m_refs:
            res = (r.get("resource") or "").lower()
            if "dbpedia" in res or "spotlight" in res or not res:
                c = float(r.get("confidence") or 0.0)
                if ref is None or c > conf:
                    ref, conf = r.get("reference") or "", c
        if not ref:
            continue
        hit = next((e for e in entities
                    if e["start"] < b[1] and b[0] < e["end"]), None)
        if hit is not None:
            if not hit["link"] or conf > hit["link_conf"]:
                hit["link"], hit["link_conf"] = ref, conf
        else:
            entities.append({"etype": "", "start": b[0], "end": b[1],
                             "named": True, "link": ref, "link_conf": conf,
                             "norm": ""})

    # factualities layer (kaflib Factuality: Span<Term> + factVal
    # rows; round-5 interop item): the max-confidence factbank value
    # lands on the predicate whose head the span covers — the carried
    # value WINS over the syntactic re-derivation at extract time
    # (RDFGenerator.java:1080-1099 takes the layer's max prediction).
    for fc in root.iter("factuality"):
        span = fc.find("span")
        b = span_bounds(span) if span is not None else None
        if b is None:
            continue
        best_val, best_conf = "", -1.0
        for fv in fc.findall("factVal"):
            res = (fv.get("resource") or "").lower()
            if res and "factbank" not in res and "fact" not in res:
                continue
            c = float(fv.get("confidence") or 0.0)
            if c > best_conf:
                best_val, best_conf = fv.get("value") or "", c
        if not best_val:
            continue
        tgt = next((p for p in predicates if p["head"] == b[2]), None) \
            or next((p for p in predicates
                     if b[0] <= p["head"] < b[1]), None)
        if tgt is not None and not tgt["factuality"]:
            tgt["factuality"] = best_val

    # opinions layer (Opinion.java: expression/holder/target
    # Span<Term> + polarity) → the carried opinions column; T8 reuses
    # it verbatim instead of the lexicon scan.
    opinions = []
    for op in root.iter("opinion"):
        def _spn(tag: str) -> tuple[int, int]:
            el = op.find(f"{tag}/span")
            bb = span_bounds(el) if el is not None else None
            return (bb[0], bb[1]) if bb else (-1, -1)

        expr_el = op.find("opinion_expression")
        pol = (expr_el.get("polarity") or "") if expr_el is not None else ""
        es, ee = _spn("opinion_expression")
        ts_, te = _spn("opinion_target")
        hs, he = _spn("opinion_holder")
        if es < 0 and ts_ < 0 and hs < 0:
            continue
        opinions.append({"expr_start": es, "expr_end": ee,
                         "target_start": ts_, "target_end": te,
                         "holder_start": hs, "holder_end": he,
                         "polarity": pol})

    return {"conv_id": conv_id, "turn_idx": turn_idx, "role": "user",
            "text": raw, "tool": "", "ts": _EPOCH.to_pydatetime(),
            "quarantined": False, "tokens": tokens, "deps": deps,
            "entities": entities, "predicates": predicates,
            "corefs": corefs, "opinions": opinions}


def read_naf_documents(paths):
    """NAF XML corpora → ANNOTATED Dataset (S1 interop: the reference's
    primary on-disk format — Corpus.java enumerates .naf(.gz/.bz2/.xz)/
    .xml files and lazy-parses each into a KAFDocument).

    One row per ``<NAF>`` document; a file may hold one document
    (reference corpus layout) or many (this engine's S6 part files).
    Compressed files are decompressed transparently.  The result feeds
    the same downstream stages as the native annotator — e.g.
    ``read_naf_documents(dir).map_batches(FilterStage(cfg)).
    map_batches(extract_batch)`` runs THIS engine's extraction over a
    reference-annotated corpus.
    """
    import re as _re

    from pikes_ray.schema import ANNOTATED_SCHEMA

    ds = rd.read_binary_files(paths, include_paths=True)
    doc_re = _re.compile(rb"<NAF[ >].*?</NAF>", _re.DOTALL)

    def parse(df: pd.DataFrame) -> pa.Table:
        rows = []
        for p, b in zip(df["path"], df["bytes"]):
            data = _decompress(p, b)
            for mdoc in doc_re.finditer(data):
                row = _parse_naf_doc(mdoc.group(0).decode("utf-8", "replace"))
                if row is not None:
                    if not row["conv_id"] or row["conv_id"] == "naf-doc":
                        row["conv_id"] = p
                    rows.append(row)
        if not rows:
            return ANNOTATED_SCHEMA.empty_table()
        cols = {f.name: [r[f.name] for r in rows] for f in ANNOTATED_SCHEMA}
        return pa.Table.from_pydict(cols, schema=ANNOTATED_SCHEMA)

    return ds.map_batches(parse, batch_format="pandas")
