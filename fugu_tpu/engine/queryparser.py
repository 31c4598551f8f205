"""Query parser: a Tantivy-QueryParser-compatible subset.

The reference parses user queries with
``QueryParser::for_index(index, [text, name])`` (search.rs:112) and, on a
parse error, strips special characters and retries (search.rs:118-127,
escape set at search.rs:603-610).  Supported syntax here:

- bare words            -> SHOULD groups over the default fields
- ``+word`` / ``-word`` -> MUST / MUST_NOT
- ``field:word``        -> restrict to one (known) field
- ``"a phrase"``        -> phrase query (positions), ``"..."~N`` slop
- ``word^2.5``          -> boost
- ``AND`` / ``OR`` / ``NOT`` keywords (uppercase): AND upgrades the
  surrounding terms to MUST, NOT negates the next term.  (Tantivy's full
  precedence grammar is wider; this covers the practical surface — a
  documented deviation.)
- a query word whose analysis yields multiple tokens (e.g. ``hello-world``)
  becomes a phrase group, matching Tantivy's behavior for positioned fields

Unknown ``field:`` prefixes and unbalanced quotes raise ``ParseError`` —
triggering the reference's escape-and-retry fallback upstream.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from fugu_tpu import analysis
from fugu_tpu.query import (
    Occur,
    PhraseClause,
    QueryGroup,
    QueryPlan,
    TermClause,
)

#: characters removed by the escape-and-retry fallback (search.rs:603-610)
ESCAPE_CHARS = set('()[]{}":+-!~*?\\^')


class ParseError(ValueError):
    pass


def escape_query_string(query: str) -> str:
    return "".join(c for c in query if c not in ESCAPE_CHARS)


_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<pboost>[0-9.]+))?
      | (?P<word>[^\s]+)
    )
    """,
    re.VERBOSE,
)


def _split_tokens(query: str) -> List[Tuple[str, Optional[str], int, float]]:
    """-> list of (kind, text, slop, boost); kind in {'phrase','word'}."""
    out = []
    pos = 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if not m or m.end() == pos:
            break
        if m.group("phrase") is not None:
            slop = int(m.group("slop") or 0)
            boost = float(m.group("pboost") or 1.0)
            out.append(("phrase", m.group("phrase"), slop, boost))
        else:
            out.append(("word", m.group("word"), 0, 1.0))
        pos = m.end()
    if query.count('"') % 2 == 1:
        raise ParseError("unbalanced quotes")
    return out


_RANGE_RE = re.compile(
    r"(?P<neg>-?)(?P<field>[A-Za-z_][A-Za-z0-9_]*):"
    r"(?P<lb>[\[{])(?P<lo>[^\]}\s]+)\s+TO\s+(?P<hi>[^\]}\s]+)(?P<rb>[\]}])"
)


def _extract_ranges(query: str, date_fields: Sequence[str]):
    """Pull `field:[A TO B]` / `{A TO B}` date ranges out of the query
    string (Tantivy range syntax; `*` = unbounded)."""
    from fugu_tpu.engine.documents import parse_rfc3339
    from fugu_tpu.query import RangeClause

    groups = []

    def repl(m):
        field = m.group("field")
        if field not in date_fields:
            raise ParseError(f"range query on non-date field {field!r}")

        def bound(raw):
            if raw == "*":
                return None
            micros = parse_rfc3339(raw)
            if micros is None:
                raise ParseError(f"invalid date bound {raw!r}")
            return micros

        occur = Occur.MUST_NOT if m.group("neg") else Occur.MUST
        groups.append(
            QueryGroup(
                occur=occur,
                ranges=(
                    RangeClause(
                        field=field,
                        lo=bound(m.group("lo")),
                        hi=bound(m.group("hi")),
                        lo_inclusive=m.group("lb") == "[",
                        hi_inclusive=m.group("rb") == "]",
                    ),
                ),
            )
        )
        return ""

    stripped = _RANGE_RE.sub(repl, query)
    return stripped, tuple(groups)


def parse_query(
    query: str,
    default_fields: Sequence[str],
    known_fields: Sequence[str],
    date_fields: Sequence[str] = (),
) -> QueryPlan:
    """Parse into a QueryPlan; raises ParseError on invalid syntax."""
    query, range_groups = _extract_ranges(query, date_fields)
    tokens = _split_tokens(query)

    # keyword pre-pass: AND upgrades default occur; NOT negates next token
    has_and = any(k == "word" and t == "AND" for k, t, _, _ in tokens)
    default_occur = Occur.MUST if has_and else Occur.SHOULD

    groups: List[QueryGroup] = []
    negate_next = False
    for kind, text, slop, boost in tokens:
        if kind == "word" and text in ("AND", "OR"):
            continue
        if kind == "word" and text == "NOT":
            negate_next = True
            continue

        occur = default_occur
        fields = list(default_fields)

        if kind == "word":
            if text.startswith("+"):
                occur = Occur.MUST
                text = text[1:]
            elif text.startswith("-"):
                occur = Occur.MUST_NOT
                text = text[1:]
            if not text:
                raise ParseError("dangling +/- operator")

            # field:term
            m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$", text)
            if m:
                fname, rest = m.group(1), m.group(2)
                if fname not in known_fields:
                    raise ParseError(f"unknown field {fname!r}")
                if not rest:
                    raise ParseError("empty field query")
                fields = [fname]
                text = rest
                if text.startswith('"') and text.endswith('"') and len(text) >= 2:
                    kind, text = "phrase", text[1:-1]

            # boost
            if kind == "word":
                bm = re.match(r"^(.*)\^([0-9]+(?:\.[0-9]+)?)$", text)
                if bm:
                    text = bm.group(1)
                    boost = float(bm.group(2))
                    if not text:
                        raise ParseError("dangling boost")

        if negate_next:
            occur = Occur.MUST_NOT
            negate_next = False

        terms = analysis.tokenize_terms(text)
        if not terms:
            continue  # token was pure punctuation; Tantivy drops it
        if kind == "phrase" or len(terms) > 1:
            groups.append(
                QueryGroup(
                    occur=occur,
                    phrases=tuple(
                        PhraseClause(f, tuple(terms), boost, slop) for f in fields
                    ),
                )
            )
        else:
            groups.append(
                QueryGroup(
                    occur=occur,
                    clauses=tuple(TermClause(f, terms[0], boost) for f in fields),
                )
            )

    if negate_next:
        raise ParseError("dangling NOT")

    all_groups = tuple(groups) + range_groups
    has_must = any(
        g.occur is Occur.MUST for g in groups
    )  # ranges are constraints, not the should-satisfaction signal
    return QueryPlan(groups=all_groups, require_should=not has_must and bool(groups))


def parse_with_fallback(
    query: str,
    default_fields: Sequence[str],
    known_fields: Sequence[str],
    date_fields: Sequence[str] = (),
) -> QueryPlan:
    """Parse; on failure strip specials and retry (search.rs:118-127)."""
    try:
        return parse_query(query, default_fields, known_fields, date_fields)
    except ParseError:
        return parse_query(
            escape_query_string(query), default_fields, known_fields, date_fields
        )
