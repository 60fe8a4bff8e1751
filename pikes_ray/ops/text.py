"""Text-analysis operators for large-scale training-data pipelines.

All operate over a documents-like table (``doc_id``, ``text``) as
vectorized ``map_batches`` stages: language-ID (stopword n-gram
heuristic), quality scoring (length/punct/stopword ratios), token
counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting.  Deterministic — no models, no randomness.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pikes_ray.functions.lexicon import STOPWORDS

_WS_TOKEN = re.compile(r"\S+")
# BPE-ish: words, numbers, punctuation runs — approximates subword count
_BPE_TOKEN = re.compile(r"[A-Za-z]{1,8}|\d{1,3}|[^\sA-Za-z\d]")
_PUNCT = re.compile(r"[^\w\s]")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the and of to a in is that it for on with as".split()),
    "de": frozenset("der die das und ist nicht mit für von zu ein".split()),
    "es": frozenset("el la los las de que y en un una es por".split()),
    "fr": frozenset("le la les de et un une est pour que dans".split()),
    "zh": frozenset(),   # han-script detection, not stopwords
}
_HAN = re.compile(r"[一-鿿]")


def token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ws_tokens (whitespace) and bpe_tokens (regex-BPE-ish)."""
    text = pc.coalesce(batch[col], pa.scalar("", type=batch[col].type))
    ws = pc.count_substring_regex(text, r"\S+")
    bpe = pc.count_substring_regex(text, _BPE_TOKEN.pattern)
    batch = batch.append_column("ws_tokens", pc.cast(ws, pa.int64()))
    return batch.append_column("bpe_tokens", pc.cast(bpe, pa.int64()))


def _stopword_counts(toks: pd.Series) -> pd.Series:
    """Per-row count of lowercased tokens in STOPWORDS, vectorized via
    explode + isin (identical to a per-row membership loop)."""
    t = toks.reset_index(drop=True)
    ex = t.explode().str.lower()
    cnt = (ex.isin(STOPWORDS).groupby(level=0).sum()
           .reindex(range(len(t)), fill_value=0))
    return pd.Series(cnt.to_numpy(dtype="int64"), index=toks.index)


def quality_features(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Append n_chars_q, n_tokens, punct_ratio, stop_ratio, mean_tok_len,
    quality (a [0,1] composite).  pandas batch kernel (string-heavy)."""
    text = df[col].fillna("")
    toks = text.str.findall(_WS_TOKEN)
    n_tok = toks.str.len().astype("int64")
    n_chars = text.str.len().astype("int64")
    punct = text.str.count(_PUNCT).astype("int64")
    stop = _stopword_counts(toks)
    out = df.copy()
    out["n_chars_q"] = n_chars
    out["n_tokens"] = n_tok
    safe = n_tok.clip(lower=1)
    out["punct_ratio"] = (punct / n_chars.clip(lower=1)).round(6)
    out["stop_ratio"] = (stop / safe).round(6)
    out["mean_tok_len"] = ((n_chars - (n_tok - 1).clip(lower=0)) / safe).round(6)
    # composite: long enough, not punctuation soup, some (but not all) stopwords
    length_score = (n_tok.clip(upper=200) / 200.0)
    punct_score = (1 - out["punct_ratio"].clip(upper=0.5) * 2)
    out["quality"] = (0.5 * length_score + 0.3 * punct_score
                      + 0.2 * (1 - (out["stop_ratio"] - 0.3).abs())).round(6)
    return out


def lang_id(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Append pred_lang via stopword-profile / script heuristic.

    Vectorized: one findall per row, then explode + ``isin`` per
    profile — semantics identical to the per-row loop it replaced
    (first-200-word window, strict-``>`` tie-break in profile order,
    0.02 threshold)."""
    out = df.copy()
    if df.empty:
        out["pred_lang"] = pd.Series([], dtype="object")
        return out
    text = df[col].fillna("").reset_index(drop=True)
    words = text.str.findall(_WS_TOKEN).str[:200]
    n = words.str.len().to_numpy()
    ex = words.explode().str.lower()
    langs = [l for l, p in _LANG_PROFILES.items() if p]
    scores = np.zeros((len(text), len(langs)))
    for j, lang in enumerate(langs):
        cnt = (ex.isin(_LANG_PROFILES[lang]).groupby(level=0).sum()
               .reindex(range(len(text)), fill_value=0).to_numpy())
        scores[:, j] = cnt / np.clip(n, 1, None)
    best_j = np.argmax(scores, axis=1)        # first max == loop tie-break
    best_score = scores[np.arange(len(text)), best_j]
    pred = np.array(langs, dtype=object)[best_j]
    pred[best_score <= 0.02] = "und"
    pred[n == 0] = "und"
    pred[text.str.contains(_HAN, regex=True).to_numpy()] = "zh"
    pred[(text == "").to_numpy()] = "und"
    out["pred_lang"] = pd.Series(pred, index=df.index)
    return out


def fingerprint(df: pd.DataFrame, col: str = "text", shingle: int = 3) -> pd.DataFrame:
    """Append fp: a 32-bit rolling-hash document fingerprint — the min
    crc32 over word ``shingle``-grams (winnowing-style).  Identical
    word sequences ⇒ identical fingerprints, robust to whitespace."""
    def _fp(t: str) -> int:
        ws = _WS_TOKEN.findall(t.lower()) if t else []
        if not ws:
            return 0
        if len(ws) < shingle:
            return zlib.crc32(" ".join(ws).encode())
        m = 0xFFFFFFFF
        best = m
        for i in range(len(ws) - shingle + 1):
            h = zlib.crc32(" ".join(ws[i : i + shingle]).encode()) & m
            if h < best:
                best = h
        return best

    out = df.copy()
    out["fp"] = df[col].fillna("").map(_fp).astype("int64")
    return out


def analyze(ds, col: str = "text"):
    """Full text-analysis pipeline: counts + quality + lang + fingerprint."""
    ds = ds.map_batches(lambda b: token_counts(b, col), batch_format="pyarrow")
    ds = ds.map_batches(lambda d: quality_features(d, col), batch_format="pandas")
    ds = ds.map_batches(lambda d: lang_id(d, col), batch_format="pandas")
    return ds.map_batches(lambda d: fingerprint(d, col), batch_format="pandas")


def repetition_stats(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, Table A1),
    integer-exact (parts-per-million) so a DuckDB list-lambda oracle
    reproduces every number bit-for-bit: per document, the fraction of
    duplicate word {2,3}-grams and the fraction of n-gram occurrences
    claimed by the single most frequent {2,3}-gram.  Pure map stage —
    no shuffle at any scale; filter on the ppm columns downstream."""
    from collections import Counter

    def _stats(t: str) -> tuple[int, int, int, int, int]:
        toks = _WS_TOKEN.findall(t.lower()) if t else []
        out = [len(toks)]
        for n in (2, 3):
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            total = len(grams)
            if total == 0:
                out += [0, 0]
                continue
            c = Counter(grams)
            out.append((total - len(c)) * 1_000_000 // total)
            out.append(max(c.values()) * 1_000_000 // total)
        return tuple(out)

    vals = [_stats(t) for t in df[col].fillna("")]
    out = df[["doc_id"]].copy()
    for i, name in enumerate(("n_ws", "dup2_ppm", "top2_ppm",
                              "dup3_ppm", "top3_ppm")):
        out[name] = pd.Series([v[i] for v in vals], index=df.index,
                              dtype="int64")
    return out


def top_ngrams(ds, col: str = "text", n: int = 2, k: int = 20):
    """Corpus-level top-k token n-grams — the word-count shuffle done
    combiner-first: each batch collapses to its local (ngram, count)
    partials inside ``map_batches`` (the exchange then carries
    O(distinct n-grams per block), not O(corpus tokens)); a
    ``groupby.sum`` merges partials; a distributed sort + limit takes
    the top k with a deterministic (count desc, ngram asc) tie-break.
    → Dataset[ngram, cnt]."""
    from collections import Counter

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df[col].fillna(""):
            toks = _WS_TOKEN.findall(t.lower())
            for i in range(len(toks) - n + 1):
                c[" ".join(toks[i:i + n])] += 1
        return pd.DataFrame({
            "ngram": list(c.keys()),
            "cnt": np.fromiter(c.values(), dtype="int64", count=len(c))})

    agg = (ds.map_batches(partial, batch_format="pandas")
             .groupby("ngram").sum("cnt"))
    agg = agg.map_batches(lambda d: d.rename(columns={"sum(cnt)": "cnt"}),
                          batch_format="pandas")
    return agg.sort(["cnt", "ngram"], descending=[True, False]).limit(k)


# --- M18 analogues: stemming + sentiment lexicon scoring -------------------
# (≙ resources/Stemming.java 75 LoC; SentiWordNet/SenticNet/
# SubjectivityLexicon loaders — pikes-resources/.../resources/*.java)

_STEM_SUFFIXES = (
    ("ational", "ate"), ("tional", "tion"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("ization", "ize"),
    ("ations", "ate"), ("ement", ""), ("ments", "ment"), ("ness", ""),
    ("ions", "ion"), ("ing", ""), ("edly", ""), ("eed", "ee"),
    ("ied", "y"), ("ies", "y"), ("ed", ""), ("s", ""),
)


from functools import lru_cache


@lru_cache(maxsize=65536)
def stem(word: str) -> str:
    """Porter-like suffix stripping (deterministic, lexicon-free)."""
    w = word.lower()
    if len(w) <= 3:
        return w
    for suf, repl in _STEM_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) + len(repl) >= 3:
            return w[: len(w) - len(suf)] + repl
    return w


# tiny pinned polarity lexicon (SentiWordNet-style scores in [-1, 1])
_SENTIMENT = {
    "good": 0.7, "great": 0.9, "excellent": 1.0, "strong": 0.5,
    "positive": 0.6, "fast": 0.4, "win": 0.6, "growth": 0.5, "rise": 0.3,
    "bad": -0.7, "poor": -0.6, "terrible": -1.0, "weak": -0.5,
    "negative": -0.6, "slow": -0.4, "loss": -0.6, "fall": -0.3,
    "error": -0.5, "fail": -0.8,
}


def _token_scores(text: pd.Series) -> tuple[pd.Series, pd.Series]:
    """(exploded lowercased tokens, their deci-lexicon scores or NaN).
    Stemming runs once per UNIQUE token in the batch, not per
    occurrence; the explode index groups back to rows."""
    t = text.reset_index(drop=True)
    ex = t.str.lower().str.findall(_WS_TOKEN).explode()
    uniq = ex.dropna().unique()
    smap = {w: _SENTIMENT.get(stem(w)) for w in uniq}
    return ex, ex.map(smap)


def sentiment(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Append ``polarity`` ∈ [-1, 1]: mean lexicon score over stemmed
    tokens (≙ the opinion-lexicon scoring the reference's RAID module
    applies per expression).  Vectorized via explode + unique-token
    stem map."""
    text = df[col].fillna("")
    out = df.copy()
    if df.empty:
        out["polarity"] = pd.Series([], dtype="float64")
        return out
    ex, sc = _token_scores(text)
    n_ws = (ex.notna().groupby(level=0).sum()
            .reindex(range(len(df)), fill_value=0).to_numpy())
    ssum = (sc.fillna(0.0).groupby(level=0).sum()
            .reindex(range(len(df)), fill_value=0.0).to_numpy())
    any_hit = (sc.notna().groupby(level=0).any()
               .reindex(range(len(df)), fill_value=False).to_numpy())
    pol = np.where(any_hit, np.round(ssum / np.clip(n_ws, 1, None), 6), 0.0)
    out["polarity"] = pd.Series(pol, index=df.index)
    return out


_ASCII_PUNCT = re.compile(r"[!-/:-@\[-`{-~]")


def quality_ppm(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Integer-exact quality features (parts-per-million ratios) so the
    result is bit-identical to a SQL oracle: floats never cross the
    comparison boundary.  Tokens are whitespace-split (same convention
    as ``token_counts``), punctuation the explicit ASCII class."""
    text = df[col].fillna("")
    toks = text.str.findall(_WS_TOKEN)
    n_tok = toks.str.len().astype("int64")
    n_chars = text.str.len().astype("int64")
    punct = text.str.count(_ASCII_PUNCT).astype("int64")
    stop = _stopword_counts(toks)
    out = df[["doc_id"]].copy()
    out["n_tokens"] = n_tok
    out["n_chars"] = n_chars
    out["n_punct"] = punct
    out["n_stop"] = stop
    out["punct_ppm"] = (punct * 1_000_000) // n_chars.clip(lower=1)
    out["stop_ppm"] = (stop * 1_000_000) // n_tok.clip(lower=1)
    return out


def sentiment_counts(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Integer-exact opinion-lexicon counts per document (SQL-oracle
    companion of ``sentiment``): positive/negative token counts and the
    deci-score sum over stemmed tokens — no float division crosses the
    comparison boundary."""
    out = df[["doc_id"]].copy()
    if df.empty:
        for c in ("n_pos", "n_neg", "sum_deci"):
            out[c] = pd.Series([], dtype="int64")
        return out
    _, sc = _token_scores(df[col].fillna(""))
    deci = np.round(sc.to_numpy(dtype="float64") * 10)  # NaN stays NaN
    hit = ~np.isnan(deci)
    idx = sc.index.to_numpy()[hit]
    d = deci[hit].astype("int64")
    n = len(df)
    out["n_pos"] = np.bincount(idx[d > 0], minlength=n).astype("int64")
    out["n_neg"] = np.bincount(idx[d <= 0], minlength=n).astype("int64")
    out["sum_deci"] = np.bincount(idx, weights=d, minlength=n).astype("int64")
    return out


# --------------------------------------------------------------------------
# PII redaction (the scrub stage every public training-data pipeline
# carries — cf. Dolma/CCNet-style pipelines).  Pattern syntax restricted
# to the RE2 ∩ Python-re subset so a DuckDB regexp_replace oracle
# reproduces the output bit-for-bit.
# --------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # (kind, regex, replacement) — applied IN ORDER; order matters when
    # a later pattern could match inside an earlier replacement's span
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
)

_PII_COMPILED = [(kind, re.compile(pat), repl) for kind, pat, repl in PII_PATTERNS]


def pii_scrub(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Redact emails / phone numbers / IPv4 addresses, appending one
    match-count column per kind plus the scrubbed text.  Vectorized
    pandas str ops per batch; at 100 TB this is a pure map stage
    (no shuffle, no state)."""
    text = df[col].fillna("")
    out = df[["doc_id"]].copy()
    for kind, rx, repl in _PII_COMPILED:
        out[f"n_{kind}"] = text.str.count(rx).astype("int64")
        text = text.str.replace(rx, repl, regex=True)
    out["clean_text"] = text
    return out


# --------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap against a broadcast set)
# --------------------------------------------------------------------------

def ngram_hashes(text: str, n: int = 8) -> set[int]:
    """Hashes of the whitespace-token n-grams of one document
    (crc32 over the lowercased space-joined n-gram)."""
    toks = [t.lower() for t in _WS_TOKEN.findall(text or "")]
    return {zlib.crc32(" ".join(toks[i:i + n]).encode())
            for i in range(len(toks) - n + 1)}


def decontaminate(ds, benchmark_texts: list[str], n: int = 8,
                  col: str = "text", mode: str = "flag"):
    """Flag (or drop) documents sharing any token n-gram with a
    benchmark set — the eval-leakage scrub run before training.

    Scale shape: the benchmark n-gram hash set is built once on the
    driver (benchmarks are small — MMLU-sized sets are ~10^6 n-grams)
    and BROADCAST via ray.put; each batch then does set lookups per
    document.  No shuffle; the corpus streams through one map stage.
    ``mode="flag"`` appends n_contaminated (matching n-gram count) and
    contaminated; ``mode="drop"`` filters the corpus instead.
    """
    import ray

    bench: set[int] = set()
    for t in benchmark_texts:
        bench |= ngram_hashes(t, n)
    bench_ref = ray.put(bench)

    def _check(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bench_ref)
        counts = [len(ngram_hashes(t, n) & b) for t in df[col].fillna("")]
        out = df.copy()
        out["n_contaminated"] = pd.Series(counts, index=df.index, dtype="int64")
        out["contaminated"] = out["n_contaminated"] > 0
        return out

    flagged = ds.map_batches(_check, batch_format="pandas")
    if mode == "drop":
        return flagged.filter(lambda r: not r["contaminated"])
    return flagged


# --------------------------------------------------------------------------
# corpus TF-IDF: document frequencies -> broadcast IDF -> top terms per doc
# --------------------------------------------------------------------------

def doc_frequencies(ds, col: str = "text", min_df: int = 1):
    """Corpus document frequencies, combiner-first: each batch collapses
    to its local (term, partial-df) counts over the per-document
    DISTINCT terms (the exchange carries O(distinct terms per block),
    not O(corpus tokens)); a ``groupby.sum`` merges partials.
    → Dataset[term, df]."""
    from collections import Counter

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df[col].fillna(""):
            for w in {w.lower() for w in _WS_TOKEN.findall(t)}:
                c[w] += 1
        return pd.DataFrame({
            "term": list(c.keys()),
            "df": np.fromiter(c.values(), dtype="int64", count=len(c))})

    agg = (ds.map_batches(partial, batch_format="pandas")
             .groupby("term").sum("df"))
    agg = agg.map_batches(lambda d: d.rename(columns={"sum(df)": "df"}),
                          batch_format="pandas")
    if min_df > 1:
        agg = agg.map_batches(lambda d, _m=min_df: d[d["df"] >= _m],
                              batch_format="pandas")
    return agg


def tfidf_top_terms(ds, col: str = "text", id_col: str = "doc_id",
                    k: int = 3, min_df: int = 1,
                    max_vocab: int | None = None):
    """Top-k TF-IDF terms per document.

    Two passes.  Pass 1 is the only shuffle: the combiner-first
    document-frequency groupby (:func:`doc_frequencies`).  The scored
    vocabulary is bounded — ``min_df`` plus an optional ``max_vocab``
    cap keeping the highest-df terms (deterministic ``(df desc, term
    asc)`` cutoff) — and broadcast ONCE via ``ray.put`` (a min_df>=5
    web-corpus vocabulary is ~10^7 terms ≈ low-GB; beyond that swap the
    broadcast for a ``hash_join`` of exploded (doc, term, tf) rows
    against the df table).  Pass 2 is a pure map: per-document term
    frequencies over the same tokenization and

        score_unats = tf * floor(ln((N+1)/(df+1)) * 1e6 + 0.5)

    i.e. the idf is quantized to integer micro-nats ONCE per term on
    the driver, so ranking and the emitted scores are pure int64
    arithmetic — reproducible bit-for-bit by the SQL oracle (ln feeds
    from identical integers on both sides; same libm).  Top-k rows per
    doc with a (score desc, term asc) tie-break.
    → Dataset[doc_id, term, tf, df, score_unats, rank]."""
    import math

    import ray

    n_docs = ds.count()
    df_tbl = doc_frequencies(ds, col, min_df=min_df).to_pandas()
    if max_vocab is not None and len(df_tbl) > max_vocab:
        df_tbl = df_tbl.sort_values(["df", "term"],
                                    ascending=[False, True]).head(max_vocab)
    idf = {t: (int(d),
               int(math.floor(math.log((n_docs + 1) / (d + 1)) * 1e6 + 0.5)))
           for t, d in zip(df_tbl["term"], df_tbl["df"])}
    idf_ref = ray.put(idf)

    from collections import Counter

    def score(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(idf_ref)
        ids, terms, tfs, dfs, scores, ranks = [], [], [], [], [], []
        for did, t in zip(df[id_col], df[col].fillna("")):
            tf = Counter(w.lower() for w in _WS_TOKEN.findall(t))
            cand = []
            for w, f in tf.items():
                hit = table.get(w)
                if hit is not None:
                    cand.append((-f * hit[1], w, f, hit[0]))
            cand.sort()
            for r, (neg, w, f, d) in enumerate(cand[:k], start=1):
                ids.append(did); terms.append(w); tfs.append(f)
                dfs.append(d); scores.append(-neg); ranks.append(r)
        return pd.DataFrame({
            # preserve the input id dtype (string/UUID ids work too)
            id_col: pd.Series(ids, dtype=df[id_col].dtype),
            "term": terms,
            "tf": pd.Series(tfs, dtype="int64"),
            "df": pd.Series(dfs, dtype="int64"),
            "score_unats": pd.Series(scores, dtype="int64"),
            "rank": pd.Series(ranks, dtype="int64")})

    return ds.map_batches(score, batch_format="pandas")


# --------------------------------------------------------------------------
# C4-style line cleaning (Raffel et al. 2020 "C4" §2.2 heuristics)
# --------------------------------------------------------------------------

_TERMINAL_PUNCT = ('.', '!', '?', '"')
_LINE_BLOCKLIST = ("javascript",)
_DOC_BLOCKLIST = ("lorem ipsum", "{")


def _keep_line(line: str, min_words: int) -> bool:
    s = line.strip()
    if not s or s[-1] not in _TERMINAL_PUNCT:
        return False
    if len(s.split()) < min_words:
        return False
    low = s.lower()
    return not any(b in low for b in _LINE_BLOCKLIST)


def c4_line_filter(df: pd.DataFrame, col: str = "text",
                   min_words: int = 3,
                   min_kept_lines: int = 1) -> pd.DataFrame:
    """C4 cleaning as a pure map stage: keep lines with >= ``min_words``
    whitespace words that end in terminal punctuation (. ! ? ") and do
    not mention javascript; flag documents that keep fewer than
    ``min_kept_lines`` lines or contain a doc-level blocklist hit
    (lorem ipsum / '{').  Emits per-doc counts, the keep flag and the
    cleaned text — no shuffle at any scale.
    → columns: doc_id, n_lines, n_kept, keep_doc, clean_text."""
    out = df[["doc_id"]].copy()
    n_lines, n_kept, keep_doc, cleaned = [], [], [], []
    for t in df[col].fillna(""):
        lines = t.split("\n")
        kept = [ln for ln in lines if _keep_line(ln, min_words)]
        low = t.lower()
        ok = (len(kept) >= min_kept_lines
              and not any(b in low for b in _DOC_BLOCKLIST))
        n_lines.append(len(lines)); n_kept.append(len(kept))
        keep_doc.append(ok); cleaned.append("\n".join(kept))
    out["n_lines"] = pd.Series(n_lines, index=df.index, dtype="int64")
    out["n_kept"] = pd.Series(n_kept, index=df.index, dtype="int64")
    out["keep_doc"] = pd.Series(keep_doc, index=df.index, dtype="bool")
    out["clean_text"] = pd.Series(cleaned, index=df.index)
    return out


# --------------------------------------------------------------------------
# corpus-frequency line removal (CCNet / RefinedWeb boilerplate scrub)
# --------------------------------------------------------------------------

def line_dedup(ds, col: str = "text", id_col: str = "doc_id",
               threshold: int = 2,
               mode: str = "auto", broadcast_line_limit: int = 2_000_000,
               n_parts: int = 64):
    """Remove every line that occurs >= ``threshold`` times across the
    CORPUS (the CCNet/RefinedWeb boilerplate scrub: nav bars, cookie
    banners, footers repeat across pages; prose does not).

    Wide shape: pass 1 is a combiner-first (line, count) groupby (each
    batch ships its local Counter partials — O(distinct lines per
    block)); the frequent head (count >= threshold) is by construction
    <= corpus_lines/threshold.  Pass 2 filters each document's lines:

    - ``mode="broadcast"`` — frequent lines collected to one frozenset,
      ``ray.put`` once, O(1) lookups per line; right while the head
      fits the driver (``broadcast_line_limit``).
    - ``mode="join"`` — the 100-TB shape: documents explode to
      (doc_id, idx, line) rows, an anti ``hash_join`` against the
      frequent-line Dataset drops matches, a bounded per-doc groupby
      reassembles kept lines in idx order, and docs whose every line
      was boilerplate are restored empty via a second anti join.
    - ``mode="auto"`` — broadcast below the limit, join above
      (the minhash drop-set policy, ops/dedup._apply_drop_filter).

    → Dataset[doc_id, n_lines, n_removed, clean_text] (every input doc
    appears exactly once)."""
    from collections import Counter

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df[col].fillna(""):
            c.update(t.split("\n"))
        return pd.DataFrame({
            "line": list(c.keys()),
            "cnt": np.fromiter(c.values(), dtype="int64", count=len(c))})

    freq = (ds.map_batches(partial, batch_format="pandas")
              .groupby("line").sum("cnt")
              .map_batches(
                  lambda d, _t=threshold: d[d["sum(cnt)"] >= _t]
                  .rename(columns={"sum(cnt)": "cnt"}),
                  batch_format="pandas"))

    freq = freq.materialize()   # small by construction; reused below
    n_freq = freq.count()
    if n_freq == 0:
        # nothing frequent: pass-through map (an empty Dataset has no
        # schema in Ray — the join/broadcast paths can't consume it)
        def noop(df: pd.DataFrame) -> pd.DataFrame:
            nl = [len(t.split("\n")) for t in df[col].fillna("")]
            return pd.DataFrame({
                id_col: df[id_col].reset_index(drop=True),
                "n_lines": pd.Series(nl, dtype="int64"),
                "n_removed": pd.Series([0] * len(df), dtype="int64"),
                "clean_text": df[col].fillna("").reset_index(drop=True)})

        return ds.map_batches(noop, batch_format="pandas")
    if mode == "auto":
        mode = "broadcast" if n_freq <= broadcast_line_limit else "join"

    if mode == "broadcast":
        import ray

        drop = frozenset(freq.to_pandas()["line"])
        drop_ref = ray.put(drop)

        def scrub(df: pd.DataFrame) -> pd.DataFrame:
            d = ray.get(drop_ref)
            ids, nl, nr, out = [], [], [], []
            for did, t in zip(df[id_col], df[col].fillna("")):
                lines = t.split("\n")
                kept = [ln for ln in lines if ln not in d]
                ids.append(did); nl.append(len(lines))
                nr.append(len(lines) - len(kept)); out.append("\n".join(kept))
            return pd.DataFrame({
                id_col: pd.Series(ids, dtype=df[id_col].dtype),
                "n_lines": pd.Series(nl, dtype="int64"),
                "n_removed": pd.Series(nr, dtype="int64"),
                "clean_text": out})

        return ds.map_batches(scrub, batch_format="pandas")

    # mode == "join": never materializes the frequent set on the driver
    from pikes_ray.ops.joins import hash_join

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, lines, nls = [], [], [], []
        for did, t in zip(df[id_col], df[col].fillna("")):
            ls = t.split("\n")
            for i, ln in enumerate(ls):
                ids.append(did); idxs.append(i); lines.append(ln)
                nls.append(len(ls))
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype=df[id_col].dtype),
            "idx": pd.Series(idxs, dtype="int64"),
            "line": lines,
            "n_lines": pd.Series(nls, dtype="int64")})

    exploded = ds.map_batches(explode, batch_format="pandas")
    kept = hash_join(exploded, freq.select_columns(["line"]),
                     on="line", how="anti", n_parts=n_parts)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("idx")
        first = g.iloc[0]
        return pd.DataFrame({
            id_col: pd.Series([first[id_col]], dtype=g[id_col].dtype),
            "n_lines": pd.Series([first["n_lines"]], dtype="int64"),
            "n_removed": pd.Series([int(first["n_lines"]) - len(g)],
                                   dtype="int64"),
            "clean_text": ["\n".join(g["line"])]})

    from pikes_ray.pipelines.shuffle import partitioned_group_map

    rebuilt = partitioned_group_map(kept, [id_col], reassemble,
                                    n_parts=n_parts)
    # docs whose every line was boilerplate: restore them empty
    all_docs = ds.map_batches(
        lambda df: pd.DataFrame({
            id_col: df[id_col].reset_index(drop=True),
            "n_lines": pd.Series(
                [len(t.split("\n")) for t in df[col].fillna("")],
                dtype="int64")}),
        batch_format="pandas")
    emptied = hash_join(all_docs, rebuilt.select_columns([id_col]),
                        on=id_col, how="anti", n_parts=n_parts)
    emptied = emptied.map_batches(
        lambda df: df.assign(
            n_removed=pd.Series(df["n_lines"], index=df.index,
                                dtype="int64"),
            clean_text=pd.Series([""] * len(df), index=df.index)),
        batch_format="pandas")
    return rebuilt.union(emptied)


# --------------------------------------------------------------------------
# unigram-LM document log-probability (CCNet-style perplexity filter)
# --------------------------------------------------------------------------

def word_counts(ds, col: str = "text"):
    """Corpus token counts with multiplicity, combiner-first (the
    ``top_ngrams`` exchange shape at n=1, without the limit).
    → Dataset[term, cnt]."""
    from collections import Counter

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df[col].fillna(""):
            c.update(w.lower() for w in _WS_TOKEN.findall(t))
        return pd.DataFrame({
            "term": list(c.keys()),
            "cnt": np.fromiter(c.values(), dtype="int64", count=len(c))})

    agg = (ds.map_batches(partial, batch_format="pandas")
             .groupby("term").sum("cnt"))
    return agg.map_batches(lambda d: d.rename(columns={"sum(cnt)": "cnt"}),
                           batch_format="pandas")


def unigram_logprob(ds, col: str = "text", id_col: str = "doc_id",
                    max_vocab: int | None = None):
    """Per-document log-probability under an in-corpus unigram LM — the
    shape of the CCNet/KenLM perplexity quality filter (Wenzek et al.
    2020) with the LM trained on the corpus itself.

    Pass 1: corpus word counts (combiner-first groupby).  The driver
    builds the add-1-smoothed table

        lp_unats(w) = floor(ln((cnt+1) / (total+V)) * 1e6 + 0.5)

    quantized to integer micro-nats (same trick as tfidf_top_terms: the
    per-doc sums are then pure int64 and the SQL oracle reproduces them
    bit-for-bit) and broadcasts it once (``max_vocab`` caps it with a
    deterministic (cnt desc, term asc) cutoff; capped-out words score
    as unseen).  Pass 2 is a pure map emitting per-doc token count and
    summed log-prob; consumers threshold on sum/n (avg nats/token —
    unusually improbable docs are gibberish, unusually probable ones
    are boilerplate; CCNet keeps the middle).  Empty docs emit no row.
    → Dataset[doc_id, n_tokens, sum_lp_unats]."""
    import math

    import ray

    cnt_tbl = word_counts(ds, col).to_pandas()
    total = int(cnt_tbl["cnt"].sum())
    v = len(cnt_tbl)
    if max_vocab is not None and v > max_vocab:
        cnt_tbl = cnt_tbl.sort_values(["cnt", "term"],
                                      ascending=[False, True]).head(max_vocab)
    denom = float(total + v)
    lp = {t: int(math.floor(math.log((c + 1) / denom) * 1e6 + 0.5))
          for t, c in zip(cnt_tbl["term"], cnt_tbl["cnt"])}
    unk = int(math.floor(math.log(1.0 / denom) * 1e6 + 0.5))
    lp_ref = ray.put((lp, unk))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        table, u = ray.get(lp_ref)
        ids, ns, sums = [], [], []
        for did, t in zip(df[id_col], df[col].fillna("")):
            toks = [w.lower() for w in _WS_TOKEN.findall(t)]
            if not toks:
                continue
            ids.append(did)
            ns.append(len(toks))
            sums.append(sum(table.get(w, u) for w in toks))
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype=df[id_col].dtype),
            "n_tokens": pd.Series(ns, dtype="int64"),
            "sum_lp_unats": pd.Series(sums, dtype="int64")})

    return ds.map_batches(score, batch_format="pandas")
