"""SQL WHERE-clause compiler: an ANSI-SQL predicate string -> the pruning
IR (filterspec Specs) — the engine's analog of the reference's expression
compiler (/root/reference/src/compile.rs compile_pruning_ir/compile_expr,
which walks a DataFusion AST; here the AST is parsed from SQL text, the
form users actually type and the form ``Spec.to_sql()`` emits).

Guarantees, tested in tests/test_sqlcompile.py:

* round-trip — ``parse_where(spec.to_sql()) == spec`` for every Spec the
  randomized soundness sweep generates (Cmp/Between/InList/IsNull/
  StartsWith/Like/ArrayAny/ArrayLen/MapKeyCmp/And/Or/Not/AlwaysTrue);
* lit-op-col flip — ``5 < x`` compiles like ``x > 5`` (the reference
  normalizes operand order the same way, src/compile.rs);
* precedence — NOT > AND > OR, parentheses free.

Accepted predicate grammar (a strict subset of Spark SQL / DuckDB SQL):

    expr     := or ;  or := and (OR and)* ;  and := not (AND not)*
    not      := NOT not | '(' expr ')' | pred | TRUE | FALSE
    pred     := operand cmp operand
              | operand [NOT] BETWEEN lit AND lit
              | operand [NOT] IN '(' lit (',' lit)* ')'
              | operand [NOT] LIKE string [ESCAPE string]
              | operand IS [NOT] NULL
    operand  := dotted-identifier | identifier '[' string ']'
              | len|size '(' ident ')'                          -> ArrayLen
              | array_contains '(' ident ',' lit ')'            -> ArrayAny eq
              | exists '(' ident ',' x '->' x cmp lit ')'       -> ArrayAny
              | len '(' list_filter '(' ident ',' x '->' x cmp lit ')' ')' '>' 0
              | element_at|try_element_at '(' ident ',' string ')'  -> map key
              | map_extract '(' ident ',' string ')' '[' 1 ']'      -> map key
              | lit
    lit      := number | string | TRUE|FALSE | DATE '...' | TIMESTAMP '...'
              | INTERVAL n MICROSECONDS|SECONDS|MINUTES|... | string '::BLOB'
"""

from __future__ import annotations

import datetime as _dt
import re

from aisle_spark.filterspec import (
    AlwaysTrue,
    And,
    ArrayAny,
    ArrayLen,
    Between,
    Cmp,
    InList,
    IsNull,
    Like,
    MapKeyCmp,
    Not,
    Or,
    Regexp,
    Spec,
    StartsWith,
)

_TOKEN_RE = re.compile(
    r"""
    \s*(
        '(?:[^']|'')*'              # string literal ('' escape)
      | "(?:[^"]|"")*"              # quoted identifier
      | `[^`]*`                     # backtick identifier
      | ->                          # lambda arrow
      | ::[A-Za-z]+                 # cast suffix
      | <=|>=|<>|!=|=|<|>
      | \(|\)|\[|\]|,
      | [A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)*   # dotted ident
      | -?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?                       # number
    )""",
    re.VERBOSE,
)

_CMP = {"=": "eq", "<>": "ne", "!=": "ne", "<": "lt", "<=": "le", ">": "gt", ">=": "ge"}
_FLIP = {"eq": "eq", "ne": "ne", "lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}


class SqlCompileError(ValueError):
    pass


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise SqlCompileError(f"cannot tokenize at: {s[pos:pos + 30]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _is_string(tok: str) -> bool:
    return tok.startswith("'")


def _unquote_str(tok: str) -> str:
    return tok[1:-1].replace("''", "'")


def _is_ident(tok: str) -> bool:
    return bool(
        tok
        and (tok[0].isalpha() or tok[0] in '_"`')
        and tok.upper()
        not in ("AND", "OR", "NOT", "IN", "IS", "NULL", "BETWEEN", "LIKE",
                "TRUE", "FALSE", "ESCAPE", "DATE", "TIMESTAMP", "INTERVAL",
                "RLIKE")
    )


def _ident_name(tok: str) -> str:
    if tok.startswith('"'):
        return tok[1:-1].replace('""', '"')
    if tok.startswith("`"):
        return tok[1:-1]
    return tok


_BLOB_ESC = re.compile(r"\\x([0-9A-Fa-f]{2})")


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self, ahead: int = 0) -> str | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SqlCompileError("unexpected end of predicate")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, *want: str) -> str:
        t = self.next()
        if t.upper() not in want:
            raise SqlCompileError(f"expected {'/'.join(want)}, got {t!r}")
        return t

    def kw(self, word: str) -> bool:
        t = self.peek()
        if t is not None and t.upper() == word:
            self.i += 1
            return True
        return False

    # -- grammar --

    def expr(self) -> Spec:
        parts = [self.and_()]
        while self.kw("OR"):
            parts.append(self.and_())
        return parts[0] if len(parts) == 1 else Or(parts)

    def and_(self) -> Spec:
        parts = [self.not_()]
        while self.kw("AND"):
            parts.append(self.not_())
        return parts[0] if len(parts) == 1 else And(parts)

    def not_(self) -> Spec:
        if self.kw("NOT"):
            return Not(self.not_())
        if self.peek() == "(":
            # could be a parenthesized EXPR or a predicate starting with a
            # parenthesized operand — predicates never start with '(' in
            # this grammar, so it is always an expr
            self.next()
            e = self.expr()
            self.expect(")")
            return e
        if self.kw("TRUE"):
            return AlwaysTrue()
        if self.kw("FALSE"):
            return Not(AlwaysTrue())
        return self.pred()

    # -- operands --

    def _lambda_cmp(self) -> tuple[str, object]:
        """x -> x OP lit"""
        var = _ident_name(self.next())
        self.expect("->")
        got = _ident_name(self.next())
        if got != var:
            raise SqlCompileError(f"lambda var mismatch: {var} vs {got}")
        op = _CMP.get(self.next())
        if op is None:
            raise SqlCompileError("expected comparison inside lambda")
        return op, self.lit()

    def operand(self):
        """Returns ('col', name) | ('len', name) | ('map', name, key) |
        ('any', name, op, value) | ('lit', value)."""
        t = self.peek()
        if t is None:
            raise SqlCompileError("unexpected end of predicate")
        up = t.upper()
        if _is_ident(t) and self.peek(1) == "(":
            fn = up
            self.next()
            self.next()  # '('
            if fn in ("LEN", "SIZE", "CARDINALITY"):
                if self.peek() is not None and _is_ident(self.peek()) and self.peek(1) == "(":
                    inner = self.next().upper()
                    if inner != "LIST_FILTER":
                        raise SqlCompileError(f"unsupported nested fn {inner}")
                    self.next()  # '('
                    name = _ident_name(self.next())
                    self.expect(",")
                    op, v = self._lambda_cmp()
                    self.expect(")")
                    self.expect(")")
                    return ("any_len", name, op, v)
                name = _ident_name(self.next())
                self.expect(")")
                return ("len", name)
            if fn == "REGEXP_MATCHES":
                name = _ident_name(self.next())
                self.expect(",")
                pat = _unquote_str(self.next())
                self.expect(")")
                return ("any_done", Regexp(name, pat))
            if fn == "ARRAY_CONTAINS":
                name = _ident_name(self.next())
                self.expect(",")
                v = self.lit()
                self.expect(")")
                return ("any_done", ArrayAny(name, "eq", v))
            if fn == "EXISTS":
                name = _ident_name(self.next())
                self.expect(",")
                op, v = self._lambda_cmp()
                self.expect(")")
                return ("any_done", ArrayAny(name, op, v))
            if fn in ("ELEMENT_AT", "TRY_ELEMENT_AT", "MAP_EXTRACT"):
                name = _ident_name(self.next())
                self.expect(",")
                key = _unquote_str(self.next())
                self.expect(")")
                if fn == "MAP_EXTRACT":  # map_extract(m,'k')[1]
                    self.expect("[")
                    if self.next() != "1":
                        raise SqlCompileError("map_extract index must be [1]")
                    self.expect("]")
                return ("map", name, key)
            raise SqlCompileError(f"unsupported function {fn}")
        if _is_ident(t):
            self.next()
            name = _ident_name(t)
            if self.peek() == "[":  # m['key']
                self.next()
                key = _unquote_str(self.next())
                self.expect("]")
                return ("map", name, key)
            return ("col", name)
        return ("lit", self.lit())

    def lit(self):
        t = self.next()
        up = t.upper()
        if _is_string(t):
            s = _unquote_str(t)
            if self.peek() is not None and self.peek().upper() == "::BLOB":
                self.next()
                return _BLOB_ESC.sub(lambda m: chr(int(m.group(1), 16)), s).encode(
                    "latin-1"
                )
            return s
        if up == "TRUE":
            return True
        if up == "FALSE":
            return False
        if up == "NULL":
            return None
        if up == "DATE":
            return _dt.date.fromisoformat(_unquote_str(self.next()))
        if up == "TIMESTAMP":
            return _dt.datetime.fromisoformat(_unquote_str(self.next()))
        if up == "INTERVAL" or (t == "(" and (self.peek() or "").upper() == "INTERVAL"):
            if t == "(":
                self.next()
            n = int(self.next())
            unit = self.next().upper().rstrip("S") + "S"
            us_per = {
                "MICROSECONDS": 1,
                "MILLISECONDS": 1_000,
                "SECONDS": 1_000_000,
                "MINUTES": 60_000_000,
                "HOURS": 3_600_000_000,
                "DAYS": 86_400_000_000,
            }.get(unit)
            if us_per is None:
                raise SqlCompileError(
                    f"unsupported interval unit {unit} (day-time units only)"
                )
            if t == "(":
                self.expect(")")
            return _dt.timedelta(microseconds=n * us_per)
        try:
            return int(t)
        except ValueError:
            try:
                return float(t)
            except ValueError:
                raise SqlCompileError(f"expected literal, got {t!r}") from None

    # -- predicates --

    def pred(self) -> Spec:
        lhs = self.operand()
        if lhs[0] == "any_done":
            # EXISTS/array_contains alone is already boolean; optionally
            # compare the to_sql form `... > 0`
            return lhs[1]
        if lhs[0] == "any_len":
            _, name, op, v = lhs
            self.expect(">")
            if self.next() != "0":
                raise SqlCompileError("list_filter length predicate must be > 0")
            return ArrayAny(name, op, v)

        t = self.peek()
        if t is None:
            raise SqlCompileError("dangling operand")
        up = t.upper()
        negated = False
        if up == "IS":
            self.next()
            negated = self.kw("NOT")
            self.expect("NULL")
            if lhs[0] != "col":
                raise SqlCompileError("IS NULL applies to plain columns")
            return IsNull(lhs[1], negated=negated)
        if up == "NOT":
            self.next()
            negated = True
            up = (self.peek() or "").upper()
            if up not in ("BETWEEN", "IN", "LIKE", "RLIKE"):
                raise SqlCompileError(f"expected BETWEEN/IN/LIKE after NOT, got {up}")
        if up == "BETWEEN":
            self.next()
            lo = self.lit()
            self.expect("AND")
            hi = self.lit()
            out = self._wrap(lhs, "between", (lo, hi))
            return Not(out) if negated else out
        if up == "IN":
            self.next()
            self.expect("(")
            vals = [self.lit()]
            while self.kw(","):
                vals.append(self.lit())
            self.expect(")")
            if lhs[0] != "col":
                raise SqlCompileError("IN applies to plain columns")
            out = InList(lhs[1], tuple(vals))
            return Not(out) if negated else out
        if up == "RLIKE":
            self.next()
            pat = _unquote_str(self.next())
            if lhs[0] != "col":
                raise SqlCompileError("RLIKE applies to plain columns")
            out = Regexp(lhs[1], pat)
            return Not(out) if negated else out
        if up == "LIKE":
            self.next()
            pattern = _unquote_str(self.next())
            esc = None
            if self.kw("ESCAPE"):
                esc = _unquote_str(self.next())
                if len(esc) != 1:
                    raise SqlCompileError("ESCAPE must be a single character")
            if lhs[0] != "col":
                raise SqlCompileError("LIKE applies to plain columns")
            out = _classify_like(lhs[1], pattern, esc)
            return Not(out) if negated else out

        op = _CMP.get(self.next())
        if op is None:
            raise SqlCompileError(f"expected predicate operator, got {t!r}")
        rhs = self.operand()
        if lhs[0] == "lit" and rhs[0] != "lit":
            lhs, rhs, op = rhs, lhs, _FLIP[op]  # lit-op-col flip
        if rhs[0] != "lit":
            raise SqlCompileError("one side of a comparison must be a literal")
        return self._wrap(lhs, op, rhs[1])

    def _wrap(self, lhs, op, value) -> Spec:
        kind = lhs[0]
        if op == "between":
            lo, hi = value
            if kind == "col":
                return Between(lhs[1], lo, hi)
            if kind == "len":
                return And([ArrayLen(lhs[1], "ge", lo), ArrayLen(lhs[1], "le", hi)])
            if kind == "map":
                return And(
                    [
                        MapKeyCmp(lhs[1], lhs[2], "ge", lo),
                        MapKeyCmp(lhs[1], lhs[2], "le", hi),
                    ]
                )
            raise SqlCompileError(f"BETWEEN not supported on {kind}")
        if kind == "col":
            return Cmp(lhs[1], op, value)
        if kind == "len":
            return ArrayLen(lhs[1], op, int(value))
        if kind == "map":
            return MapKeyCmp(lhs[1], lhs[2], op, value)
        raise SqlCompileError(f"cannot compare {kind}")


def _classify_like(colname: str, pattern: str, esc: str | None) -> Spec:
    """like_pattern_to_rule with escape handling: literal -> Eq, prefix% ->
    StartsWith; other shapes -> residual-only Like when no escapes are
    involved (our Like residual has no ESCAPE support)."""
    literal: list[str] = []
    wilds: list[tuple[int, str]] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if esc is not None and ch == esc and i + 1 < len(pattern):
            literal.append(pattern[i + 1])
            i += 2
            continue
        if ch in ("%", "_"):
            wilds.append((len(literal), ch))
            i += 1
            continue
        literal.append(ch)
        i += 1
    lit = "".join(literal)
    if not wilds:
        return Cmp(colname, "eq", lit)
    if wilds == [(len(lit), "%")]:
        return StartsWith(colname, lit)
    if esc is not None and any(c in ("%", "_", esc) for c in lit):
        raise SqlCompileError(
            f"LIKE pattern {pattern!r} mixes ESCAPE with extra wildcards — "
            "not expressible without escape support in the residual"
        )
    return Like(colname, pattern)


def parse_where(sql: str) -> Spec:
    """Compile a SQL WHERE predicate string into the pruning IR."""
    p = _Parser(_tokenize(sql))
    out = p.expr()
    if p.i != len(p.toks):
        raise SqlCompileError(f"trailing tokens: {' '.join(p.toks[p.i:])!r}")
    return out
