"""Query parser tests (Tantivy-compatible subset)."""

import pytest

from fugu_tpu.engine import queryparser as qp
from fugu_tpu.query import Occur

FIELDS = ("text", "name")
KNOWN = ("id", "text", "namespace", "name")


def parse(q):
    return qp.parse_query(q, FIELDS, KNOWN)


def test_bare_words_should_over_default_fields():
    plan = parse("hello world")
    assert len(plan.groups) == 2
    for g in plan.groups:
        assert g.occur is Occur.SHOULD
        assert [c.field for c in g.clauses] == ["text", "name"]
    assert plan.groups[0].clauses[0].term == "hello"
    assert plan.require_should


def test_must_and_mustnot_prefixes():
    plan = parse("+alpha -beta gamma")
    assert [g.occur for g in plan.groups] == [
        Occur.MUST,
        Occur.MUST_NOT,
        Occur.SHOULD,
    ]
    assert not plan.require_should


def test_field_restriction():
    plan = parse("name:alice")
    assert len(plan.groups) == 1
    assert [c.field for c in plan.groups[0].clauses] == ["name"]


def test_unknown_field_raises():
    with pytest.raises(qp.ParseError):
        parse("bogus:thing")


def test_phrase():
    plan = parse('"big red fox"')
    g = plan.groups[0]
    assert not g.clauses
    assert [p.field for p in g.phrases] == ["text", "name"]
    assert g.phrases[0].terms == ("big", "red", "fox")


def test_phrase_slop():
    plan = parse('"a b"~2')
    assert plan.groups[0].phrases[0].slop == 2


def test_boost():
    plan = parse("word^2.5")
    assert plan.groups[0].clauses[0].boost == 2.5


def test_multi_token_word_becomes_phrase():
    plan = parse("hello-world")
    assert plan.groups[0].phrases[0].terms == ("hello", "world")


def test_and_keyword_upgrades_to_must():
    plan = parse("cat AND dog")
    assert [g.occur for g in plan.groups] == [Occur.MUST, Occur.MUST]


def test_not_keyword():
    plan = parse("cat NOT dog")
    assert [g.occur for g in plan.groups] == [Occur.SHOULD, Occur.MUST_NOT]


def test_unbalanced_quote_raises():
    with pytest.raises(qp.ParseError):
        parse('"unclosed')


def test_escape_and_retry():
    plan = qp.parse_with_fallback('"unclosed', FIELDS, KNOWN)
    assert plan.groups[0].clauses[0].term == "unclosed"


def test_escape_query_string():
    assert qp.escape_query_string('a(b)c":+d-e') == "abcde"


def test_punctuation_only_token_dropped():
    plan = parse("hello !!!")
    assert len(plan.groups) == 1


def test_terms_lowercased_by_analyzer():
    plan = parse("HeLLo")
    assert plan.groups[0].clauses[0].term == "hello"


def test_fuzz_never_crashes_after_escape_retry():
    """The serving path parses untrusted strings with escape-and-retry
    (search.rs's parse_query_lenient); arbitrary garbage must yield a
    plan or a clean empty plan, never an unhandled exception."""
    import random
    import string

    rng = random.Random(1234)
    alphabet = string.printable + "é中文\U0001f600"
    for _ in range(500):
        q = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        plan = qp.parse_with_fallback(q, FIELDS, KNOWN)
        assert plan is not None


def test_fuzz_structured_operators():
    """Random compositions of the grammar's operators parse, fall back
    cleanly, or raise ParseError (which the HTTP layer maps to an error
    envelope, search.rs's double-parse failure) — never anything else."""
    import random

    rng = random.Random(99)
    pieces = ['"', "(", ")", "+", "-", "AND", "OR", "NOT", "text:", "name:",
              "id:", "^2", "~1", "[a TO b]", "{a TO b}", "*", "word", "w2"]
    parse_errors = 0
    for _ in range(500):
        q = " ".join(rng.choice(pieces) for _ in range(rng.randint(1, 12)))
        try:
            plan = qp.parse_with_fallback(q, FIELDS, KNOWN)
            assert plan is not None
        except qp.ParseError:
            # keyword operators (trailing NOT/AND) survive character
            # escaping; Tantivy fails the same way on the retry
            parse_errors += 1
    assert parse_errors < 250  # most garbage still yields a plan


def test_parens_cnf_flattens_to_device_shape():
    # a AND (b OR c) -> MUST a, MUST {b,c}: still device-runnable
    plan = parse("alpha AND (beta OR gamma)")
    assert not plan.host_only
    assert [g.occur for g in plan.groups] == [Occur.MUST, Occur.MUST]
    merged = plan.groups[1]
    assert sorted({c.term for c in merged.clauses}) == ["beta", "gamma"]


def test_parens_nested_conjunction_splices():
    plan = parse("+x +(a AND b)")
    assert not plan.host_only
    assert [g.occur for g in plan.groups] == [Occur.MUST] * 3
    assert {g.clauses[0].term for g in plan.groups} == {"x", "a", "b"}


def test_parens_dnf_becomes_subplan():
    # (a AND b) OR c cannot flatten -> host-evaluated subplan group
    plan = parse("(alpha AND beta) OR gamma")
    assert plan.host_only
    subs = [g for g in plan.groups if g.subplan is not None]
    assert len(subs) == 1 and subs[0].occur is Occur.SHOULD
    inner = subs[0].subplan
    assert [g.occur for g in inner.groups] == [Occur.MUST, Occur.MUST]


def test_parens_negated_group():
    plan = parse("alpha -(beta OR gamma)")
    assert [g.occur for g in plan.groups] == [Occur.SHOULD, Occur.MUST_NOT]
    assert sorted({c.term for c in plan.groups[1].clauses}) == ["beta", "gamma"]


def test_unbalanced_parens_raise_and_fallback_recovers():
    with pytest.raises(qp.ParseError):
        parse("(alpha beta")
    plan = qp.parse_with_fallback("(alpha beta", FIELDS, KNOWN)
    assert len(plan.groups) == 2


def test_too_deep_nesting_raises():
    q = "(" * 20 + "x" + ")" * 20
    with pytest.raises(qp.ParseError):
        parse(q)


def test_dnf_subplan_oracle_semantics(tmp_path):
    """(a AND b) OR c end-to-end: matches docs with both a,b or with c."""
    from fugu_tpu.engine.dataset import Dataset
    from fugu_tpu.records import ObjectRecord

    ds = Dataset("nest", tmp_path, use_device=False)
    ds.ingest(
        [
            ObjectRecord(id="ab", text="apple banana", namespace="nest"),
            ObjectRecord(id="a", text="apple only here", namespace="nest"),
            ObjectRecord(id="c", text="cherry only here", namespace="nest"),
            ObjectRecord(id="none", text="nothing relevant", namespace="nest"),
        ]
    )
    res = ds.search("(apple AND banana) OR cherry", [], 0, 10)
    assert {r.id for r in res} == {"ab", "c"}


class TestFieldPhrases:
    """[+-]field:"..."~N^B must parse as ONE phrase token — the old
    tokenizer split it into two bare words (adjacency lost, wrong
    fields searched, silently)."""

    def test_field_phrase(self):
        plan = parse('name:"hello world"')
        g = plan.groups[0]
        assert g.phrases and g.phrases[0].field == "name"
        assert g.phrases[0].terms == ("hello", "world")

    def test_negated_phrase(self):
        plan = parse('-"a b" c')
        assert plan.groups[0].occur is Occur.MUST_NOT
        assert plan.groups[0].phrases

    def test_field_phrase_slop_boost(self):
        plan = parse('name:"a b"~2^1.5')
        p = plan.groups[0].phrases[0]
        assert (p.field, p.slop, p.boost) == ("name", 2, 1.5)

    def test_unknown_field_phrase_raises(self):
        with pytest.raises(qp.ParseError):
            parse('nofield:"x y"')


class TestRangeEdges:
    DATE = ("date_created",)

    def test_not_prefixed_range(self):
        plan = qp.parse_query(
            "NOT date_created:[2020-01-01T00:00:00Z TO *] scroll",
            FIELDS,
            KNOWN,
            date_fields=self.DATE,
        )
        assert any(
            g.ranges and g.occur is Occur.MUST_NOT for g in plan.groups
        )

    def test_range_inside_phrase_is_literal(self):
        plan = qp.parse_query(
            '"time date_created:[2020-01-01T00:00:00Z TO *] quoted"',
            FIELDS,
            KNOWN,
            date_fields=self.DATE,
        )
        assert not any(g.ranges for g in plan.groups)
        assert plan.groups[0].phrases


def test_bad_phrase_boost_is_parse_error():
    """'\"a b\"^1.2.3' matched [0-9.]+ and raised a bare ValueError that
    escaped the escape-retry fallback into a 500."""
    plan = qp.parse_with_fallback('"a b"^1.2.3', FIELDS, KNOWN)
    assert plan is not None  # escape-retry handled it


def test_glued_quote_starts_phrase():
    """'milk\"whole foods\"' must parse as milk + phrase(whole foods),
    not word('milk\"whole') + word('foods\"')."""
    plan = qp.parse_query('milk"whole foods"', FIELDS, KNOWN)
    phrases = [p for g in plan.groups for p in g.phrases]
    assert phrases and all(
        list(p.terms) == ["whole", "foods"] for p in phrases
    )
    words = [
        c.term for g in plan.groups for c in g.clauses if not c.is_facet
    ]
    assert "milk" in words
