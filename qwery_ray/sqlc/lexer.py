"""Tokenizer for the qwery SQL dialect.

Token classes mirror the reference's char scanner (core/TokenIterator.scala:7):
numbers, alphanumeric identifiers, backtick-quoted identifiers, single/double
quoted strings, operators, @variables. Implemented as a single compiled regex
(compiled once at import — no per-call cost).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    kind: str  # NUM STR IDENT QIDENT VAR OP EOF
    text: str
    pos: int

    @property
    def upper(self) -> str:
        return self.text.upper()


_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|--[^\n]*|//[^\n]*|/\*.*?\*/)
  | (?P<NUM>\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+|\d+(?:[eE][+-]?\d+)?)
  | (?P<STR>'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.)*")
  | (?P<QIDENT>`[^`]*`)
  | (?P<VAR>@@?[A-Za-z_][A-Za-z_0-9]*)
  | (?P<IDENT>[A-Za-z_][A-Za-z_0-9.]*)
  | (?P<OP>\*\*|\|\||::|->>|->|<>|!=|>=|<=|=>|[-+*/%^(),=<>.;:\[\]])
    """,
    re.VERBOSE | re.DOTALL,
)


class LexError(ValueError):
    pass


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            raise LexError(f"unexpected character {sql[pos]!r} at {pos}")
        kind = m.lastgroup
        text = m.group()
        if kind != "WS":
            tokens.append(Token(kind, text, pos))
        pos = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens


def unquote_string(text: str) -> str:
    """Strip quotes and process escapes of a STR token ('' → ' inside '...')."""
    q = text[0]
    body = text[1:-1]
    if q == "'":
        body = body.replace("''", "'")
    body = re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)), body)
    return body


def unquote_ident(text: str) -> str:
    return text[1:-1] if text.startswith("`") else text
