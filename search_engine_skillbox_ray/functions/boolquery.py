"""Boolean query language for the serving engine: a recursive-descent
parser for ``term``, ``AND``, ``OR``, ``NOT`` and parentheses, plus AST
helpers. The reference's query language is flat OR/AND
(SearchServiceImpl.java:84-117); nested boolean algebra is this
rebuild's extension, with Lucene BooleanQuery semantics:

- the match set is pure set algebra over posting doc-id sets;
- ONLY positive leaves score (a doc's score is the disjunctive tf·idf
  sum over the positive terms it contains); NOT clauses never score;
- a pure negation has no corpus-complement semantics (Lucene requires
  at least one positive clause) — ``OR`` over a negative operand or a
  top-level ``NOT`` raises ValueError.

Operators are UPPERCASE keywords; everything else is a term token that
the engine runs through its query-lemma pipeline (a leaf expanding to
several lemmas behaves as an OR over them; digits-only leaves match
nothing)."""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN = re.compile(r"\(|\)|[^\s()]+")


@dataclass(frozen=True)
class Term:
    text: str


@dataclass(frozen=True)
class And:
    parts: tuple


@dataclass(frozen=True)
class Or:
    parts: tuple


@dataclass(frozen=True)
class Not:
    child: object


def parse(query: str):
    """→ AST (Term/And/Or/Not). Precedence NOT > AND > OR; AND binds a
    run of operands, OR the loosest — standard boolean precedence."""
    toks = _TOKEN.findall(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expect: str | None = None) -> str:
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"unexpected end of query: {query!r}")
        t = toks[pos]
        if expect is not None and t != expect:
            raise ValueError(f"expected {expect!r}, got {t!r} in {query!r}")
        pos += 1
        return t

    def parse_or():
        parts = [parse_and()]
        while peek() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def parse_and():
        parts = [parse_unary()]
        while peek() is not None and peek() not in (")", "OR"):
            if peek() == "AND":
                take()
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_unary():
        if peek() == "NOT":
            take()
            return Not(parse_unary())
        if peek() == "(":
            take()
            node = parse_or()
            take(")")
            return node
        t = take()
        if t in ("AND", "OR", ")"):
            raise ValueError(f"misplaced {t!r} in {query!r}")
        return Term(t)

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens after {toks[pos - 1]!r} in {query!r}")
    return node


def positive_terms(node) -> list[str]:
    """Leaf texts outside any NOT, in appearance order — the scoring
    clauses of the query."""
    out: list[str] = []

    def walk(n):
        if isinstance(n, Term):
            out.append(n.text)
        elif isinstance(n, (And, Or)):
            for p in n.parts:
                walk(p)
        # Not subtrees never score

    walk(node)
    return list(dict.fromkeys(out))
