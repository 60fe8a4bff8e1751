"""Number spelling and temporal-value normalization.

- ``parse_number_words``   ≙ NumberSpeller.parse (pikes-resources/
  .../NumberSpeller.java:85-397): spelled-out cardinals/ordinals →
  float ("five billion" → 5e9).
- ``normalize_date`` / ``duration_iso``  ≙ the TimeML value parsing of
  OWLTime.Interval.parseTimex / Duration.parseTimex (pikes-rdf/
  .../util/OWLTime.java:82-226, 562): partial dates keep partial
  precision ("March 2002" → "2002-03").
"""

from __future__ import annotations

from pikes_ray.functions.lexicon import (
    DURATION_UNITS,
    MONTHS,
    NUMBER_WORDS,
    ORDINAL_WORDS,
)


def parse_number_words(words: list[str]) -> float | None:
    """["five", "hundred"] → 500.0; ["nine", "million"] → 9e6.

    Additive within a scale group, multiplicative across scale words —
    the standard spelled-number grammar NumberSpeller implements.
    """
    total, current = 0.0, 0.0
    seen = False
    for w in words:
        w = w.lower()
        v = NUMBER_WORDS.get(w)
        if v is None:
            try:
                v = float(w.replace(",", ""))
            except ValueError:
                return None
        seen = True
        if v == 100:
            current = (current or 1) * 100
        elif v >= 1000:
            total += (current or 1) * v
            current = 0.0
        else:
            current += v
    if not seen:
        return None
    return total + current


def parse_ordinal(word: str) -> int | None:
    return ORDINAL_WORDS.get(word.lower())


def fmt_num(v: float) -> str:
    """Canonical numeric lexical form: integral values print as ints."""
    return str(int(v)) if float(v).is_integer() else repr(v)


def normalize_date(month: int | None, day: int | None, year: int) -> str:
    """TimeML-ish partial-precision date value."""
    if month is None:
        return f"{year:04d}"
    if day is None:
        return f"{year:04d}-{month:02d}"
    return f"{year:04d}-{month:02d}-{day:02d}"


def month_number(word: str) -> int | None:
    return MONTHS.get(word.lower())


def duration_iso(count: float, unit_word: str) -> str | None:
    """("3", "weeks") → "P3W"; time units get the ISO-8601 "T" prefix."""
    unit = unit_word.lower().rstrip("s")
    code = DURATION_UNITS.get(unit)
    if code is None:
        return None
    n = fmt_num(count)
    if unit in ("second", "minute", "hour"):
        return f"PT{n}{code}"
    return f"P{n}{code}"
