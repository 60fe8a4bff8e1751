"""Unit tests for the scalar helper functions (SURVEY §5 plan item 1)."""

from pikes_ray.functions.hashing import fact_graph_iri, murmur3_32, text_hash
from pikes_ray.functions.iri import MintTable, clean_local, doc_iri, entity_iri, mention_iri
from pikes_ray.functions.numbers import (
    duration_iso,
    fmt_num,
    normalize_date,
    parse_number_words,
    parse_ordinal,
)


def test_murmur3_known_vectors():
    # public MurmurHash3 x86_32 reference vectors
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"a") == 0x3C2569B2
    assert murmur3_32(b"abc") == 0xB3DD93FA
    assert murmur3_32(b"hello") == 0x248BFA47


def test_fact_graph_iri_stable():
    g1 = fact_graph_iri("s", "p", "o")
    assert g1 == fact_graph_iri("s", "p", "o")
    assert g1 != fact_graph_iri("s", "p", "o2")
    assert g1.startswith("fact:")


def test_text_hash_whitespace_normalized():
    assert text_hash("a  b\n c") == text_hash("a b c")
    assert text_hash("a b") != text_hash("a c")


def test_number_speller():
    assert parse_number_words(["five"]) == 5
    assert parse_number_words(["five", "hundred"]) == 500
    assert parse_number_words(["five", "billion"]) == 5e9
    assert parse_number_words(["two", "hundred", "thirty", "thousand"]) == 230_000
    assert parse_number_words(["nine", "million"]) == 9e6
    assert parse_number_words(["3"]) == 3
    assert parse_number_words(["banana"]) is None
    assert parse_ordinal("third") == 3
    assert fmt_num(5e6) == "5000000"


def test_dates_and_durations():
    assert normalize_date(3, 5, 2024) == "2024-03-05"
    assert normalize_date(3, None, 2002) == "2002-03"
    assert normalize_date(None, None, 2002) == "2002"
    assert duration_iso(3, "weeks") == "P3W"
    assert duration_iso(2, "hours") == "PT2H"
    assert duration_iso(1, "bananas") is None


def test_iri_minting_collisions():
    # mint-collision counters: X, X_2 (RDFGenerator.java:1788-1809 semantics)
    m = MintTable("conv:c%23turn=0")
    a = m.mint("k1", "acquire")
    b = m.mint("k2", "acquire")
    assert a == "conv:c%23turn=0#acquire"
    assert b == "conv:c%23turn=0#acquire_2"
    assert m.mint("k1", "acquire") == a  # idempotent per key


def test_iri_cleaning():
    assert clean_local("the Nusra Front") == "nusra_front"
    assert clean_local("José García") == "jose_garcia"
    assert entity_iri("Acme Corp") == "entity:acme_corp"
    assert doc_iri("conv-1", 2) == "conv:conv-1%23turn=2"
    assert mention_iri("d", 3, 9) == "d#char=3,9"


def test_owltime_parse_cases():
    """M16 parse cases mirroring OWLTime.java:82-283."""
    from pikes_ray.functions.owltime import parse_timex

    # full date → DateTimeInterval
    iv = parse_timex("2024-03-03")
    assert iv.is_datetime_interval() and iv.begin.day == 3
    # month-only / year-only → still a point description (partial)
    assert parse_timex("2024-03").begin.month == 3
    assert parse_timex("2024").begin.year == 2024
    # decade → 1990..1999 bounds
    iv = parse_timex("199X")
    assert not iv.is_datetime_interval()
    assert iv.begin.year == 1990 and iv.end.year == 1999
    # century → 1900..1999
    iv = parse_timex("19XX")
    assert iv.begin.year == 1900 and iv.end.year == 1999
    # season boundaries (reference's fixed dates)
    iv = parse_timex("1999-SU")
    assert (iv.begin.month, iv.begin.day) == (3, 20)
    assert (iv.end.month, iv.end.day) == (6, 20)
    # week + weekend
    iv = parse_timex("2024-W10-WE")
    assert iv.begin is not None and (iv.end.day - iv.begin.day) == 1
    # clock time
    iv = parse_timex("2024-03-03T15:30")
    assert iv.is_datetime_interval() and iv.begin.hour == 15
    assert parse_timex("not a timex") is None


def test_owltime_triples_shape():
    from pikes_ray.functions.owltime import timex_triples

    iri, tts = timex_triples("2024-03-03")
    preds = {p for _, p, _ in tts}
    assert "time:hasDateTimeDescription" in preds
    assert any(p == "time:day" for _, p, _ in tts)
    iri2, tts2 = timex_triples("199X")
    preds2 = {p for _, p, _ in tts2}
    assert {"time:intervalStartedBy", "time:intervalFinishedBy"} <= preds2


def test_annotator_rich_timex():
    from pikes_ray.stages.annotate import RuleAnnotator

    m = RuleAnnotator()
    a = m.annotate("Acme Corp was founded in the 1990s.")
    dates = [e for e in a["entities"] if e["etype"] == "DATE"]
    assert any(e["norm"] == "199X" for e in dates)
    a = m.annotate("They met in the summer of 1999 at 15:30.")
    norms = {e["norm"] for e in a["entities"] if e["etype"] == "DATE"}
    assert "1999-SU" in norms and "T15:30" in norms
    a = m.annotate("It was built in the 19th century.")
    norms = {e["norm"] for e in a["entities"] if e["etype"] == "DATE"}
    assert "18XX" in norms
