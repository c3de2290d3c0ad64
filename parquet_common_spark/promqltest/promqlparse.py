"""PromQL expression parser -> AST.

A recursive-descent / precedence-climbing parser for the public PromQL
grammar (prometheus/prometheus promql/parser).  Covers the surface the
Spark engine evaluates: literals, vector selectors with label matchers,
matrix selectors, ``offset`` / ``@`` modifiers, unary +/-, the full
binary-operator table with ``bool`` and on()/ignoring()/group_left()/
group_right() vector matching, aggregation operators with by()/without()
(prefix or postfix), and function calls.  Subqueries are parsed
(``expr[range:step]``) so scripts exercising them fail with a clear
"unsupported" error from the engine rather than a parse error.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field


# ------------------------------------------------------------------ AST


@dataclass
class NumberLiteral:
    value: float


@dataclass
class StringLiteral:
    value: str


@dataclass
class LabelMatcher:
    name: str
    op: str  # = != =~ !~
    value: str


@dataclass
class VectorSelector:
    name: str | None
    matchers: list[LabelMatcher]
    offset_ms: int = 0
    at_ms: int | None = None  # @ modifier (absolute eval ts)


@dataclass
class MatrixSelector:
    selector: VectorSelector
    range_ms: int


@dataclass
class Subquery:
    expr: object
    range_ms: int
    step_ms: int | None
    offset_ms: int = 0
    at_ms: int | None = None


@dataclass
class Call:
    func: str
    args: list


@dataclass
class Aggregate:
    op: str
    expr: object
    param: object | None = None
    by: list[str] | None = None
    without: list[str] | None = None


@dataclass
class Unary:
    op: str  # + -
    expr: object


@dataclass
class Binary:
    op: str
    lhs: object
    rhs: object
    bool_modifier: bool = False
    on: list[str] | None = None
    ignoring: list[str] | None = None
    group: str = "one"  # one | left | right
    carry: list[str] = field(default_factory=list)


AGG_OPS = {
    "sum", "avg", "min", "max", "count", "group", "stddev", "stdvar",
    "topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio",
}

# precedence, low to high; ^ is right-associative
_BINOPS = {
    "or": 1,
    "and": 2, "unless": 2,
    "==": 3, "!=": 3, "<=": 3, "<": 3, ">=": 3, ">": 3,
    "+": 4, "-": 4,
    "*": 5, "/": 5, "%": 5, "atan2": 5,
    "^": 6,
}

_DUR_RE = re.compile(r"^(\d+(?:\.\d+)?)(ms|s|m|h|d|w|y)$")
_DUR_PART = re.compile(r"(\d+(?:\.\d+)?)(ms|s|m|h|d|w|y)")
_UNITS_MS = {
    "ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
    "d": 86_400_000, "w": 604_800_000, "y": 31_536_000_000,
}


class PromQLSyntaxError(ValueError):
    pass


def parse_duration_ms(text: str) -> int:
    """``5m``, ``1h30m``, ``90s``, ``1.5h``; a bare number is seconds
    (the promqltest convention for times)."""
    text = text.strip()
    neg = text.startswith("-")
    if neg:
        text = text[1:]
    if re.fullmatch(r"\d+(?:\.\d+)?", text):
        ms = float(text) * 1000.0
    else:
        pos, ms = 0, 0.0
        for m in _DUR_PART.finditer(text):
            if m.start() != pos:
                raise PromQLSyntaxError(f"bad duration {text!r}")
            ms += float(m.group(1)) * _UNITS_MS[m.group(2)]
            pos = m.end()
        if pos != len(text) or pos == 0:
            raise PromQLSyntaxError(f"bad duration {text!r}")
    return -int(ms) if neg else int(ms)


# ------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<duration>\d+(?:\.\d+)?(?:ms|s|m|h|d|w|y)(?:\d+(?:\.\d+)?(?:ms|s|m|h|d|w|y))*)
  | (?P<number>
        0[xX][0-9a-fA-F]+
      | (?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?
      | [iI][nN][fF](?![a-zA-Z0-9_:])
      | [nN][aA][nN](?![a-zA-Z0-9_:])
    )
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*'|`[^`]*`)
  | (?P<op>=~|!~|==|!=|<=|>=|<|>|=|\+|-|\*|/|%|\^|\(|\)|\{|\}|\[|\]|,|:|@)
  | (?P<ident>[a-zA-Z_:][a-zA-Z0-9_:.]*)
    """,
    re.VERBOSE,
)


@dataclass
class Token:
    kind: str
    text: str


def _tokenize(src: str) -> list[Token]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise PromQLSyntaxError(f"unexpected character {src[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Token(kind, m.group(0)))
    out.append(Token("eof", ""))
    return out


def _unquote(text: str) -> str:
    if text.startswith("`"):
        return text[1:-1]
    body = text[1:-1]
    return body.encode("utf-8").decode("unicode_escape")


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- token helpers
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text and self.peek().kind != "string":
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise PromQLSyntaxError(f"expected {text!r}, got {t.text!r}")
        return t

    # -- grammar
    def parse(self):
        e = self.expr(0)
        if self.peek().kind != "eof":
            raise PromQLSyntaxError(f"trailing input at {self.peek().text!r}")
        return e

    def expr(self, min_prec: int):
        lhs = self.unary()
        while True:
            t = self.peek()
            op = t.text if t.kind in ("op", "ident") else None
            if op not in _BINOPS or _BINOPS[op] < min_prec:
                return lhs
            prec = _BINOPS[op]
            self.next()
            bool_mod = False
            if self.peek().text == "bool":
                self.next()
                bool_mod = True
            on = ignoring = None
            group, carry = "one", []
            if self.peek().text in ("on", "ignoring"):
                kw = self.next().text
                names = self.label_list()
                if kw == "on":
                    on = names
                else:
                    ignoring = names
                if self.peek().text in ("group_left", "group_right"):
                    g = self.next().text
                    group = "left" if g == "group_left" else "right"
                    if self.peek().text == "(":
                        carry = self.label_list()
            # left-assoc: min child prec = prec+1; ^ right-assoc: prec
            nxt = prec if op == "^" else prec + 1
            rhs = self.expr(nxt)
            if bool_mod and op not in ("==", "!=", "<=", "<", ">=", ">"):
                raise PromQLSyntaxError("bool modifier only on comparisons")
            lhs = Binary(op, lhs, rhs, bool_mod, on, ignoring, group, carry)

    def unary(self):
        t = self.peek()
        if t.text in ("+", "-") and t.kind == "op":
            # upstream precedence: ^ binds TIGHTER than unary (-2^2 == -4),
            # everything else looser — so the operand absorbs ^ chains only
            self.next()
            inner = self.expr(_BINOPS["^"])
            if t.text == "-":
                return Unary("-", inner)
            return inner
        return self.postfix(self.primary())

    # ------------------------------------------- duration expressions
    # Upstream's experimental promql-duration-expr feature: inside
    # [range], [range:step] and after a parenthesized offset, durations
    # and bare numbers (seconds) combine with + - * / % ^ and parens.
    # Evaluated to milliseconds at parse time; precedence mirrors the
    # expression grammar (^ right-assoc > * / % > + -).

    def _dur_operand(self) -> float:
        t = self.next()
        if t.text == "(":
            v = self._dur_addsub()
            self.expect(")")
            return v
        if t.text == "-":
            return -self._dur_operand()
        if t.text == "+":
            return self._dur_operand()
        if t.kind == "duration":
            return float(parse_duration_ms(t.text))
        if t.kind == "number":
            try:
                return float(t.text) * 1000.0  # numbers are seconds
            except ValueError as exc:
                raise PromQLSyntaxError(f"bad duration operand {t.text!r}") from exc
        raise PromQLSyntaxError(f"bad duration operand {t.text!r}")

    def _dur_pow(self) -> float:
        base = self._dur_operand()
        if self.peek().text == "^":
            self.next()
            # right-associative; exponent is a plain number of "seconds"
            # in upstream's evaluation, but ^ composes on the ms scale —
            # follow upstream and exponentiate the SECOND values
            exp = self._dur_pow() / 1000.0
            return (base / 1000.0) ** exp * 1000.0
        return base

    def _dur_muldiv(self) -> float:
        v = self._dur_pow()
        while self.peek().text in ("*", "/", "%"):
            op = self.next().text
            rhs = self._dur_pow()
            if op == "*":
                # a duration*duration product stays on the seconds scale
                v = v * rhs / 1000.0
            elif op == "/":
                if rhs == 0:
                    raise PromQLSyntaxError("division by zero in duration")
                v = v / rhs * 1000.0
            else:
                if rhs == 0:
                    raise PromQLSyntaxError("modulo by zero in duration")
                v = math.fmod(v, rhs)
        return v

    def _dur_addsub(self) -> float:
        v = self._dur_muldiv()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            rhs = self._dur_muldiv()
            v = v + rhs if op == "+" else v - rhs
        return v

    def _dur_expr_ms(self) -> int:
        return int(self._dur_addsub())

    def postfix(self, e):
        """[range], [range:step] subquery, offset, @ — in any order after
        a primary, matching upstream's modifier grammar."""
        while True:
            t = self.peek()
            if t.text == "[":
                self.next()
                rng = self._dur_expr_ms()
                if self.accept(":"):
                    step = None
                    if self.peek().text != "]":
                        step = self._dur_expr_ms()
                        if step <= 0:
                            raise PromQLSyntaxError(
                                "zero or negative subquery step"
                            )
                    self.expect("]")
                    if rng <= 0:
                        raise PromQLSyntaxError("zero or negative range")
                    e = Subquery(e, rng, step)
                else:
                    self.expect("]")
                    if rng <= 0:
                        raise PromQLSyntaxError("zero or negative range")
                    if not isinstance(e, VectorSelector):
                        raise PromQLSyntaxError("range on non-selector")
                    e = MatrixSelector(e, rng)
            elif t.text == "offset":
                self.next()
                if self.peek().text == "(":
                    # parenthesized duration expression (experimental);
                    # parens bound the expression, so `offset (1h) + 5`
                    # stays a binary op on the selector as upstream
                    off = int(self._dur_operand())
                else:
                    neg = self.accept("-")
                    off = parse_duration_ms(self.next().text)
                    if neg:
                        off = -off
                target = e.selector if isinstance(e, MatrixSelector) else e
                if not isinstance(target, (VectorSelector, Subquery)):
                    raise PromQLSyntaxError("offset on non-selector")
                target.offset_ms = off
            elif t.text == "@":
                self.next()
                if self.peek().text in ("start", "end"):
                    # @ start() / @ end(): resolved to the query range
                    # bounds at evaluation time
                    kw = self.next().text
                    self.expect("(")
                    self.expect(")")
                    at_ms = kw  # sentinel string
                    neg = False
                else:
                    neg = self.accept("-")
                    at = self.next().text
                    if _DUR_RE.match(at):
                        at_ms = parse_duration_ms(at)
                    else:
                        at_ms = int(float(at) * 1000)
                if neg:
                    at_ms = -at_ms
                target = e.selector if isinstance(e, MatrixSelector) else e
                if not isinstance(target, (VectorSelector, Subquery)):
                    raise PromQLSyntaxError("@ on non-selector")
                target.at_ms = at_ms
            else:
                return e

    def label_list(self) -> list[str]:
        self.expect("(")
        names = []
        if self.peek().text != ")":
            while True:
                t = self.next()
                if t.kind not in ("ident", "duration"):
                    raise PromQLSyntaxError(f"bad label name {t.text!r}")
                names.append(t.text)
                if not self.accept(","):
                    break
        self.expect(")")
        return names

    def matchers(self) -> list[LabelMatcher]:
        self.expect("{")
        out = []
        if self.peek().text != "}":
            while True:
                name_t = self.next()
                if name_t.kind == "string":
                    # quoted label name (UTF-8 label syntax); bare quoted
                    # string is an __name__ matcher
                    name = _unquote(name_t.text)
                    if self.peek().text in ("=", "!=", "=~", "!~"):
                        op = self.next().text
                        val = _unquote(self.next().text)
                        out.append(LabelMatcher(name, op, val))
                    else:
                        out.append(LabelMatcher("__name__", "=", name))
                else:
                    if name_t.kind not in ("ident", "duration"):
                        raise PromQLSyntaxError(f"bad matcher name {name_t.text!r}")
                    op = self.next().text
                    if op not in ("=", "!=", "=~", "!~"):
                        raise PromQLSyntaxError(f"bad matcher op {op!r}")
                    val_t = self.next()
                    if val_t.kind != "string":
                        raise PromQLSyntaxError("matcher value must be a string")
                    out.append(LabelMatcher(name_t.text, op, _unquote(val_t.text)))
                if not self.accept(","):
                    break
        self.expect("}")
        return out

    def primary(self):
        t = self.peek()
        if t.text == "(" and t.kind == "op":
            self.next()
            e = self.expr(0)
            self.expect(")")
            return e
        if t.kind == "number":
            self.next()
            txt = t.text.lower()
            if txt.startswith("0x"):
                return NumberLiteral(float(int(txt, 16)))
            if txt == "inf":
                return NumberLiteral(float("inf"))
            if txt == "nan":
                return NumberLiteral(float("nan"))
            return NumberLiteral(float(t.text))
        if t.kind == "string":
            self.next()
            return StringLiteral(_unquote(t.text))
        if t.text == "{":
            return VectorSelector(None, self.matchers())
        if t.kind in ("ident", "duration"):
            self.next()
            name = t.text
            if name in AGG_OPS and self.peek().text in ("(", "by", "without"):
                return self.aggregate(name)
            if self.peek().text == "(":
                # function call
                self.next()
                args = []
                if self.peek().text != ")":
                    while True:
                        args.append(self.expr(0))
                        if not self.accept(","):
                            break
                self.expect(")")
                return Call(name, args)
            if self.peek().text == "{":
                ms = self.matchers()
                return VectorSelector(name, ms)
            return VectorSelector(name, [])
        raise PromQLSyntaxError(f"unexpected token {t.text!r}")

    def aggregate(self, op: str):
        by = without = None
        if self.peek().text in ("by", "without"):
            kw = self.next().text
            names = self.label_list()
            if kw == "by":
                by = names
            else:
                without = names
        self.expect("(")
        first = self.expr(0)
        param = None
        if self.accept(","):
            param = self.expr(0)
            param, first = first, param
        self.expect(")")
        if self.peek().text in ("by", "without") and by is None and without is None:
            kw = self.next().text
            names = self.label_list()
            if kw == "by":
                by = names
            else:
                without = names
        needs_param = op in ("topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio")
        if needs_param and param is None:
            raise PromQLSyntaxError(f"{op} needs a parameter")
        if not needs_param and param is not None:
            raise PromQLSyntaxError(f"{op} takes one argument")
        return Aggregate(op, first, param, by, without)


def parse_promql(src: str):
    return _Parser(_tokenize(src)).parse()
