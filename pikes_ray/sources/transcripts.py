"""Deterministic synthetic transcripts source (FIXTURES.md §1, §3, §4).

The engine's canonical input is a Parquet table of multi-turn
conversation / agent transcripts with columns
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json
input_hint).  No such table ships with the test data, so this module
synthesises it **deterministically** (seed=42, fixed epoch, no
wall-clock) at any scale, writes it as ≥8 sorted Parquet fragments
(so block-level parallelism and resume-by-partition are exercised —
FIXTURES.md §1), and caches it under ``/tmp``.

Generator rules (FIXTURES.md §1):
- ``conv_id``  = f"conv-{i:06d}"
- ``turns(i)`` = 3 + (i % 6)
- ``role``     cycles user/assistant; every 5th turn is "tool"
- ``ts``       = 2024-01-01T00:00:00Z + i*1h + turn_idx*30s
- ``text``     templated sentences from the sentence bank with slot
  fills from the pinned gazetteers; one hot entity (Acme Corp) appears
  in ~20% of turns (Zipf skew → exercises canonicalization salting);
  a fixed quota of adversarial rows (§4).
"""

from __future__ import annotations

import datetime as _dt
import os
import random
import re

import pyarrow as pa
import pyarrow.parquet as pq

from pikes_ray.functions import lexicon as lx
from pikes_ray.schema import TRANSCRIPT_SCHEMA

SEED = 42
EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)
CACHE_ROOT = os.environ.get("PIKES_RAY_CACHE", "/tmp/pikes_ray_data")
GENERATOR_VERSION = "v2"   # bump whenever templates/rules change: the
                           # on-disk cache must never go stale vs the code
HOT_ENTITY = "Acme Corp"          # ~20% of turns (FIXTURES §3 skew)

# Sentence templates: (template, slots). Each covers an extractor code
# path (FIXTURES.md §3 items 1-10).
_TEMPLATES: list[str] = [
    "{PER} met {PER2} in {LOC} on {DATE}.",                    # NER+link+timex+SRL
    "{ORG} acquired {ORG2} for {MONEY}.",                      # verbal SRL + currency
    "The acquisition of {ORG} surprised analysts.",            # nominal SRL
    "{PER} founded {ORG}. He leads it.",                       # coref he/it
    "{PER} is the president of {ORG}.",                        # copular skip
    "Very strong supporters backed {ORG}.",                    # modifiers
    "Profits rose {PERCENT} in the {ORDINAL} quarter.",        # percent+ordinal
    "The team worked for {DURATION}.",                         # OWL-Time duration
    "{PER} and {PER2} signed the agreement.",                  # coordination
    "{ORG} announced a new investment in {LOC}.",              # nominal+loc
    "{PER} visited {LOC} on {DATE}.",
    "{ORG} hired {PER} in {DATE2}.",
    "Money flows to {ORG} from like-minded donors abroad.",    # gold.2.ttl flavour
    "{ORG} sold {CARDINALW} units in {LOC}.",                  # number words
    "{PER} reported {MONEY} in revenue.",
    "{ORG} launched a product in {LOC} on {DATE}.",
    "Revenue fell {PERCENT} in the {ORDINAL} quarter.",
    "{PER} leads {ORG}. She founded it in {LOC}.",             # coref she/it
    "{ORG} invested {MONEY} in {ORG2}.",
    "The announcement of {ORG} surprised {PER}.",
    "{PER} opened an office in {LOC}.",
    "{ORG} delivered the report on {DATE}.",
    "{PER} approved the agreement with {ORG}.",
    "{ORG} closed the deal for {MONEY}.",
    "{ORG} was acquired by {ORG2} for {MONEY}.",               # passive SRL
    "The report was delivered by {PER} on {DATE}.",            # passive + timex
]

_TOOL_TEMPLATES = [
    'search(query="{Q}") returned {N} results.',
    'calc(expression="{N} * {N2}") returned {N3}.',
    'browse(url="https://example.org/{Q}") returned {N} links.',
]

_ADVERSARIAL = [
    "",                                  # empty
    "   ",                               # whitespace-only
    "\U0001f600",                        # single emoji
    "Fish &amp; Chips &lt;b&gt;Ltd&lt;/b&gt; expanded.",   # HTML entities
    "José García met René Müller in São Paulo.",           # diacritics
    "Profits rose five billion dollars.",                  # number-speller path
    "The deal closed in March 2002.",                      # partial date
    "The deal closed in 2002-03.",                         # ISO partial date
]

_WS = re.compile(r"\s+")


def _month_name(m: int) -> str:
    for name, num in lx.MONTHS.items():
        if num == m:
            return name.capitalize()
    raise ValueError(m)


class _Filler:
    def __init__(self, rng: random.Random):
        self.rng = rng

    def fill(self, template: str) -> str:
        r = self.rng
        per = r.choice(lx.PERSONS)
        per2 = r.choice([p for p in lx.PERSONS if p != per])
        # Zipf hot entity: Acme Corp in ~20% of org slots
        org = HOT_ENTITY if r.random() < 0.35 else r.choice(lx.ORGS)
        org2 = r.choice([o for o in lx.ORGS if o != org])
        loc = r.choice(lx.LOCATIONS)
        month, day, year = r.randint(1, 12), r.randint(1, 28), r.randint(2019, 2025)
        n, n2 = r.randint(2, 9), r.randint(2, 9)
        subs = {
            "PER": per, "PER2": per2, "ORG": org, "ORG2": org2, "LOC": loc,
            "DATE": f"{_month_name(month)} {day}, {year}",
            "DATE2": f"{_month_name(month)} {year}",
            "MONEY": r.choice(
                [f"${r.randint(1, 900)} million",
                 f"{r.choice(['two', 'three', 'five', 'ten'])} million dollars"]
            ),
            "PERCENT": r.choice(
                [f"{r.randint(1, 99)} percent",
                 f"{r.choice(['three', 'five', 'seven'])} percent"]
            ),
            "ORDINAL": r.choice(list(lx.ORDINAL_WORDS)[:4]),
            "DURATION": f"{r.choice(['two', 'three', 'six'])} {r.choice(['weeks', 'months', 'days'])}",
            "CARDINALW": r.choice(["five hundred", "two thousand", "nine million"]),
            "Q": r.choice(["quarterly results", "merger news", "market data"]),
            "N": str(n), "N2": str(n2), "N3": str(n * n2),
        }
        out = template
        for k, v in subs.items():
            out = out.replace("{" + k + "}", v)
        return out


def n_conversations(sf: float) -> int:
    """~10k turns per unit of 0.01 sf (avg 5.5 turns/conv)."""
    return max(12, round(sf * 181_820))


def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1).rstrip(".")) if m else 0.001


def generate_turns(n_conv: int, seed: int = SEED):
    """Yield transcript rows, sorted by (conv_id, turn_idx)."""
    adversarial_quota = max(len(_ADVERSARIAL), n_conv // 50)
    adv_stride = max(1, (sum(3 + i % 6 for i in range(n_conv))) // max(1, adversarial_quota))
    turn_counter = 0
    for i in range(n_conv):
        rng = random.Random((seed << 20) ^ i)   # per-conv stream → order-independent
        filler = _Filler(rng)
        conv_id = f"conv-{i:06d}"
        for t in range(3 + i % 6):
            role = "tool" if (turn_counter % 5 == 4) else ("user" if t % 2 == 0 else "assistant")
            tool = ""
            if role == "tool":
                tool = rng.choice(["search", "calc", "browse"])
                text = filler.fill(rng.choice(_TOOL_TEMPLATES))
            elif turn_counter % adv_stride == adv_stride - 1:
                text = _ADVERSARIAL[turn_counter // adv_stride % len(_ADVERSARIAL)]
            else:
                k = rng.randint(1, 3)
                text = " ".join(filler.fill(rng.choice(_TEMPLATES)) for _ in range(k))
            yield {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": EPOCH + _dt.timedelta(hours=i, seconds=30 * t),
            }
            turn_counter += 1


def transcripts_dir(sf_dir_or_tag: str, n_fragments: int = 8) -> str:
    """Materialize (once, atomically) the transcript table for a scale.

    ``sf_dir_or_tag`` is either a testdata dir ("/root/testdata/sf0.01"),
    an "sfX" tag, or "unit" (12 conversations — the golden-fixture
    scale).  Returns the directory containing the Parquet fragments.
    """
    if sf_dir_or_tag == "unit":
        tag, n_conv = "unit", 12
    else:
        sf = sf_of_dir(sf_dir_or_tag)
        tag, n_conv = f"sf{sf}", n_conversations(sf)
    out = os.path.join(CACHE_ROOT, "transcripts", GENERATOR_VERSION, tag)
    if os.path.isdir(out) and os.listdir(out):
        return out
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    # conv-range sharding: fragments are internally sorted AND file-name
    # order preserves the global (conv_id, turn_idx) order.  One
    # streaming pass over the generator, cutting at conv boundaries
    # (the old collect-then-refilter was O(fragments × rows) and
    # dominated synthesis above ~1M turns).
    n_fragments = min(n_fragments, max(1, n_conv))
    per = (n_conv + n_fragments - 1) // n_fragments
    frag = 0
    chunk: list[dict] = []
    cut = f"conv-{min(per, n_conv):06d}"

    def flush():
        nonlocal frag, chunk, cut
        tbl = pa.Table.from_pylist(chunk, schema=TRANSCRIPT_SCHEMA)
        pq.write_table(tbl, os.path.join(tmp, f"part-{frag:05d}.parquet"))
        frag += 1
        chunk = []
        cut = f"conv-{min((frag + 1) * per, n_conv):06d}"

    for r in generate_turns(n_conv):
        if r["conv_id"] >= cut:
            flush()
        chunk.append(r)
    if chunk or frag == 0:
        flush()
    try:
        os.rename(tmp, out)           # atomic publish
    except OSError:                   # lost the race — someone else published
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def read_transcripts(sf_dir_or_tag: str, **kwargs):
    """ray.data.Dataset over the transcript fragments (S1 analogue).

    File-per-task parallelism ≡ the reference corpus reader's
    file-level spliterator (pikes-naflib/.../Corpus.java:49-234).
    """
    import ray.data as rd

    path = transcripts_dir(sf_dir_or_tag)
    return rd.read_parquet(path, **kwargs)


def split_corpus(ds, fractions: list[float], seed: int = SEED):
    """Seeded shuffle + proportional split (≙ Corpus.split,
    pikes-naflib/.../Corpus.java:285-315 — train/test tooling, O4).

    Returns len(fractions)+1 Datasets; the last takes the remainder.
    """
    return ds.random_shuffle(seed=seed).split_proportionately(fractions)
