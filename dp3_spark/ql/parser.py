"""Tokenizer + recursive-descent parser for the dp3 query language.

Token rules and productions mirror the reference participle grammar
(server/ql/grammar.go:23-37 lexer rules, :39-188 productions) without
copying its implementation — this is a hand-written Python parser.

Precedence: `and` binds tighter than `or`; parentheses group
(grammar.go:77-93).  Keywords are contextual (they lex as Words).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Optional

from dp3_spark.ql import ast

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<word>[a-zA-Z_/.][a-zA-Z0-9_/.\-\[\]]*)
  | (?P<string>'(?:\\.|[^'])*')
  | (?P<punct>,|[()]|;)
  | (?P<binop>!=|<=|>=|=|<|>|~\*|~)
  | (?P<float>[-+]?\d*\.\d+(?:[eE][-+]?\d+)?)
  | (?P<integer>[-+]?[0-9]+)
  | (?P<star>\*)
    """,
    re.VERBOSE,
)

# note: the reference Word pattern excludes []; we additionally allow [i]
# so fixed-array element paths (`f.position_covariance[3]`,
# util/schema/parser.go:566-576) tokenize as one word.  We also accept
# signed integer literals — the reference lexer only signs floats
# (grammar.go:30-31), so `= -1` is inexpressible there; documented superset.


class QLParseError(ValueError):
    pass


@dataclass(frozen=True)
class _Tok:
    kind: str  # word | string | punct | binop | float | integer | star
    text: str
    pos: int


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise QLParseError(f"unexpected character {src[i]!r} at offset {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(_Tok(kind, m.group(), m.start()))
    return toks


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def parse_iso8601_ns(s: str) -> int:
    """ISO8601 string -> nanoseconds since epoch (reference uses
    iso8601.Parse(...).UnixNano(), grammar.go:121-133).  Handles 'Z',
    offsets, and fractional seconds up to 9 digits."""
    txt = s.strip()
    frac_ns = 0
    m = re.search(r"\.(\d+)", txt)
    if m:
        digits = m.group(1)[:9].ljust(9, "0")
        frac_ns = int(digits)
        txt = txt[: m.start()] + txt[m.end() :]
    if txt.endswith("Z"):
        txt = txt[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(txt)
    except ValueError as e:
        raise QLParseError(f"failed to parse timestamp {s!r}: {e}") from e
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000 + frac_ns


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    # ------------------------------------------------------------- helpers
    def peek(self) -> Optional[_Tok]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        tok = self.peek()
        if tok is None:
            raise QLParseError("unexpected end of query")
        self.i += 1
        return tok

    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "word" and t.text in words

    def eat_word(self, *words: str) -> bool:
        if self.at_word(*words):
            self.i += 1
            return True
        return False

    def expect_word(self, word: str) -> None:
        if not self.eat_word(word):
            t = self.peek()
            raise QLParseError(f"expected {word!r}, got {t.text if t else 'EOF'}")

    def expect_punct(self, p: str) -> None:
        t = self.peek()
        if t is None or t.kind != "punct" or t.text != p:
            raise QLParseError(f"expected {p!r}, got {t.text if t else 'EOF'}")
        self.i += 1

    def eat_punct(self, p: str) -> bool:
        t = self.peek()
        if t is not None and t.kind == "punct" and t.text == p:
            self.i += 1
            return True
        return False

    # ------------------------------------------------------------ grammar
    def statement(self) -> ast.Statement:
        if self.at_word("truncate"):
            stmt = ast.Statement(truncate=self.truncate())
        else:
            stmt = ast.Statement(query=self.query())
        self.expect_punct(";")
        if self.peek() is not None:
            raise QLParseError(f"trailing input after ';': {self.peek().text!r}")
        return stmt

    def truncate(self) -> ast.Truncate:
        self.expect_word("truncate")
        producer = self._word("producer")
        topic = self._word("topic")
        if self.eat_word("now"):
            return ast.Truncate(producer=producer, topic=topic, timestamp_ns=None)
        return ast.Truncate(producer=producer, topic=topic, timestamp_ns=self.timestamp())

    def query(self) -> ast.Query:
        explain = self.eat_word("explain")
        self.expect_word("from")
        producers: tuple[str, ...] = ()
        t = self.peek()
        if t is not None and t.kind == "star":
            self.i += 1
        else:
            names = [self._word("producer")]
            while self.eat_punct(","):
                names.append(self._word("producer"))
            producers = tuple(names)

        between = None
        if self.eat_word("between"):
            start = self.timestamp()
            self.expect_word("and")
            end = self.timestamp()
            between = ast.Between(start_ns=start, end_ns=end)

        select = self.select()

        where: Optional[ast.Expr] = None
        while self.eat_word("where"):
            e = self.expression()
            where = e if where is None else ast.BoolExpr("and", (where, e))

        descending = self.eat_word("desc")

        limit = offset = None
        while self.at_word("limit", "offset"):
            kw = self.next().text
            tok = self.next()
            if tok.kind != "integer":
                raise QLParseError(f"{kw} expects an integer, got {tok.text!r}")
            if kw == "limit":
                limit = int(tok.text)
            else:
                offset = int(tok.text)

        return ast.Query(
            producers=producers,
            select=select,
            between=between,
            where=where,
            descending=descending,
            limit=limit,
            offset=offset,
            explain=explain,
        )

    def select(self) -> ast.SelectNode:
        """select := topic [as alias] ( ',' select | AJKW [immediate] select
        [by less than N unit] )?   — recursive, as in grammar.go:101-112."""
        scan = self._scan()
        if self.eat_punct(","):
            rest = self.select()
            children: tuple[ast.SelectNode, ...]
            if isinstance(rest, ast.MergeJoin):
                children = (scan, *rest.children)
            else:
                children = (scan, rest)
            return ast.MergeJoin(children=children)
        if self.at_word("precedes", "succeeds", "neighbors"):
            keyword = self.next().text
            immediate = self.eat_word("immediate")
            right = self.select()
            threshold_ns = 0
            while self.at_word("by"):
                self.expect_word("by")
                self.expect_word("less")
                self.expect_word("than")
                qty_tok = self.next()
                if qty_tok.kind != "integer":
                    raise QLParseError(f"expected integer quantity, got {qty_tok.text!r}")
                unit_tok = self.next()
                if unit_tok.text not in ast.UNIT_NS:
                    raise QLParseError(
                        f"unknown unit {unit_tok.text!r}; expected one of {sorted(ast.UNIT_NS)}"
                    )
                threshold_ns = int(qty_tok.text) * ast.UNIT_NS[unit_tok.text]
            return ast.AsofJoin(
                keyword=keyword,  # type: ignore[arg-type]
                left=scan,
                right=right,
                immediate=immediate,
                threshold_ns=threshold_ns,
            )
        return scan

    def _scan(self) -> ast.Scan:
        topic = self._word("topic")
        alias = None
        if self.eat_word("as"):
            alias = self._word("alias")
        return ast.Scan(topic=topic, alias=alias)

    def _word(self, what: str) -> str:
        tok = self.next()
        if tok.kind != "word":
            raise QLParseError(f"expected {what}, got {tok.text!r}")
        return tok.text

    def timestamp(self) -> int:
        tok = self.next()
        if tok.kind == "integer":
            return int(tok.text)
        if tok.kind == "string":
            return parse_iso8601_ns(_unquote(tok.text))
        raise QLParseError(f"expected timestamp (integer nanos or ISO8601 string), got {tok.text!r}")

    # expression := or_condition ('or' or_condition)*
    def expression(self) -> ast.Expr:
        terms = [self.or_condition()]
        while self.eat_word("or"):
            terms.append(self.or_condition())
        if len(terms) == 1:
            return terms[0]
        return ast.BoolExpr("or", tuple(terms))

    # or_condition := condition ('and' condition)*
    def or_condition(self) -> ast.Expr:
        terms = [self.condition()]
        while self.eat_word("and"):
            terms.append(self.condition())
        if len(terms) == 1:
            return terms[0]
        return ast.BoolExpr("and", tuple(terms))

    # condition := '(' expression ')' | field [binop value]
    def condition(self) -> ast.Expr:
        if self.eat_punct("("):
            e = self.expression()
            self.expect_punct(")")
            if isinstance(e, ast.BoolExpr):
                e = ast.BoolExpr(e.op, e.children, grouped=True)
            return e
        field = self._word("field reference")
        t = self.peek()
        if t is None or t.kind != "binop":
            raise QLParseError(f"field {field!r} needs a comparison (e.g. {field} = value)")
        op = self.next().text
        value = self.value()
        return ast.BinaryExpr(field=field, op=op, value=value)

    def value(self) -> ast.Literal:
        tok = self.next()
        if tok.kind == "string":
            return ast.Literal("string", _unquote(tok.text))
        if tok.kind == "integer":
            return ast.Literal("int", int(tok.text))
        if tok.kind == "float":
            return ast.Literal("float", float(tok.text))
        if tok.kind == "word" and tok.text in ("true", "false"):
            return ast.Literal("bool", tok.text == "true")
        raise QLParseError(f"expected literal value, got {tok.text!r}")


def parse(src: str) -> ast.Statement:
    """Parse one QL statement (must end with ';')."""
    return _Parser(src).statement()
