"""M16 — TimeML TIMEX3 value → OWL-Time RDF (≙ OWLTime.java:82-283
``Interval.parseTimex`` + ``toRDF`` :258-283).

Handles the reference's full value grammar: dates (YYYY[-MM[-DD]]),
decades (199X), centuries (19XX), seasons (YYYY-{SP,SU,FA,WI}), weeks
(YYYY-Wnn [-WE weekend]), and clock times (…THH[:MM[:SS]]).  A fully
specified value is a ``time:DateTimeInterval`` with a
``time:hasDateTimeDescription`` component description; an underspecified
one is a ``time:ProperInterval`` bounded by ``time:intervalStartedBy``
/ ``time:intervalFinishedBy`` sub-intervals, exactly the reference's
emission shape.
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

_TIMEX_RE = re.compile(
    r"^(?:(?P<cent>\d{2})XX|(?P<dec>\d{3})X"
    r"|(?P<y>\d{4})"
    r"(?:-(?:(?P<season>SP|SU|FA|WI)|W(?P<week>\d{1,2})(?:-(?P<we>WE))?"
    r"|(?P<m>\d{2})(?:-(?P<d>\d{2}))?))?)?"
    r"(?:T(?P<h>\d{2})(?::(?P<mi>\d{2})(?::(?P<s>\d{2}))?)?)?$"
)

# season boundaries used by the reference (OWLTime.java:184-201)
_SEASONS = {
    "SP": ((-1, 12, 21), (0, 3, 19)),
    "SU": ((0, 3, 20), (0, 6, 20)),
    "FA": ((0, 6, 21), (0, 9, 21)),
    "WI": ((0, 9, 22), (0, 12, 29)),
}


@dataclass(frozen=True)
class DateTimeC:
    """Partial date-time (−1 = unspecified), ≙ OWLTime.DateTime."""

    year: int = -1
    month: int = -1
    day: int = -1
    hour: int = -1
    minute: int = -1
    second: int = -1

    def label(self) -> str:
        parts = []
        if self.year != -1:
            parts.append(f"{self.year:04d}")
        if self.month != -1:
            parts.append(f"{self.month:02d}")
        if self.day != -1:
            parts.append(f"{self.day:02d}")
        out = "-".join(parts)
        if self.hour != -1:
            out += f"T{self.hour:02d}"
            if self.minute != -1:
                out += f".{self.minute:02d}"
                if self.second != -1:
                    out += f".{self.second:02d}"
        return out

    def components(self) -> list[tuple[str, str, str]]:
        """(property, lexical, datatype) rows for the
        time:DateTimeDescription node."""
        out = []
        unit = "unitYear"
        if self.year != -1:
            out.append(("time:year", str(self.year), "xsd:gYear"))
        if self.month != -1:
            out.append(("time:month", f"--{self.month:02d}", "xsd:gMonth"))
            unit = "unitMonth"
        if self.day != -1:
            out.append(("time:day", f"---{self.day:02d}", "xsd:gDay"))
            unit = "unitDay"
        if self.hour != -1:
            out.append(("time:hour", str(self.hour), "xsd:nonNegativeInteger"))
            unit = "unitHour"
        if self.minute != -1:
            out.append(("time:minute", str(self.minute), "xsd:nonNegativeInteger"))
            unit = "unitMinute"
        if self.second != -1:
            out.append(("time:second", str(self.second), "xsd:decimal"))
            unit = "unitSecond"
        out.append(("time:unitType", f"time:{unit}", ""))
        return out


@dataclass(frozen=True)
class Interval:
    begin: DateTimeC | None
    end: DateTimeC | None

    def is_datetime_interval(self) -> bool:
        return self.begin is not None and self.begin == self.end

    def label(self) -> str:
        if self.is_datetime_interval():
            return self.begin.label()
        b = self.begin.label() if self.begin else "null"
        e = self.end.label() if self.end else "null"
        return f"{b}_{e}"


def parse_timex(value: str) -> Interval | None:
    m = _TIMEX_RE.match(value.strip().upper())
    if m is None or not value.strip():
        return None
    g = m.groupdict()
    if g["cent"]:
        c = int(g["cent"]) * 100
        return Interval(DateTimeC(c, 1, 1), DateTimeC(c + 99, 12, 31))
    if g["dec"]:
        d = int(g["dec"]) * 10
        return Interval(DateTimeC(d, 1, 1), DateTimeC(d + 9, 12, 31))
    if not g["y"]:
        return None
    year = int(g["y"])
    if g["season"]:
        (by, bm, bd), (ey, em, ed) = _SEASONS[g["season"]]
        return Interval(DateTimeC(year + by, bm, bd), DateTimeC(year + ey, em, ed))
    if g["week"]:
        week = int(g["week"])
        # ISO week → Saturday/Sunday of that week for the -WE variant,
        # else Monday..Sunday (reference uses GregorianCalendar with
        # Monday first, minimal days 1 — ISO-adjacent)
        try:
            monday = _dt.date.fromisocalendar(year, week, 1)
        except ValueError:
            return None
        if g["we"]:
            sat = monday + _dt.timedelta(days=5)
            sun = monday + _dt.timedelta(days=6)
            return Interval(DateTimeC(sat.year, sat.month, sat.day),
                            DateTimeC(sun.year, sun.month, sun.day))
        sun = monday + _dt.timedelta(days=6)
        return Interval(DateTimeC(monday.year, monday.month, monday.day),
                        DateTimeC(sun.year, sun.month, sun.day))
    month = int(g["m"]) if g["m"] else -1
    day = int(g["d"]) if g["d"] else -1
    hour = int(g["h"]) if g["h"] else -1
    minute = int(g["mi"]) if g["mi"] else -1
    second = int(g["s"]) if g["s"] else -1
    dt = DateTimeC(year, month, day, hour, minute, second)
    return Interval(dt, dt)


def timex_triples(value: str) -> tuple[str, list[tuple[str, str, str]]] | None:
    """→ (interval IRI, [(s, p, o) CURIE triples]) or None.

    DateTimeInterval: iri a time:DateTimeInterval ;
    time:hasDateTimeDescription desc(a time:DateTimeDescription + parts).
    Underspecified: iri a time:ProperInterval ;
    time:intervalStartedBy/FinishedBy boundary DateTimeIntervals.
    (≙ Interval.toRDF, OWLTime.java:258-283)."""
    iv = parse_timex(value)
    if iv is None:
        return None
    triples: list[tuple[str, str, str]] = []

    def lit(lex: str, dt: str) -> str:
        return f'"{lex}"^^{dt}' if dt else lex

    def emit_point(dt: DateTimeC) -> str:
        iri = f"time:{dt.label()}"
        desc = f"time:{dt.label()}_desc"
        triples.append((iri, "rdf:type", "time:DateTimeInterval"))
        triples.append((iri, "time:hasDateTimeDescription", desc))
        triples.append((desc, "rdf:type", "time:DateTimeDescription"))
        for prop, lex, dtype in dt.components():
            triples.append((desc, prop, lit(lex, dtype)))
        return iri

    if iv.is_datetime_interval():
        iri = emit_point(iv.begin)
    else:
        iri = f"time:{iv.label()}"
        triples.append((iri, "rdf:type", "time:ProperInterval"))
        if iv.begin is not None:
            triples.append((iri, "time:intervalStartedBy", emit_point(iv.begin)))
        if iv.end is not None:
            triples.append((iri, "time:intervalFinishedBy", emit_point(iv.end)))
    triples.append((iri, "rdfs:label", f'"{iv.label()}"'))
    return iri, triples
