"""Sandboxed JavaScript-subset evaluator for HTTP gizmo query strings.

The reference executes gizmo programs inside a sandboxed goja JS VM
with no host access (query/gizmo/gizmo.go:107-122). This module is
the Python analogue: a hand-written tokenizer + recursive-descent
parser for the JS subset the gizmo corpus actually uses, executed by
a tree-walking interpreter. There is **no** ``eval``/``exec`` anywhere
— every attribute access routes through a single gate that only
exposes the public gizmo surface (GizmoPath / graph methods) plus
plain-dict key reads, so a query cannot wander from a returned object
into engine internals.

Supported grammar (enough for the reference's integration corpus,
query/gizmo/finals.go:122-163 and graph/graphtest/integration.go):

- statements: ``var/let/const`` declarations, assignments (names and
  ``obj[key]`` subscripts; attribute assignment is rejected),
  expression statements, ``function name(params) { ... }``
  declarations, ``return``, ``if``/``else``, blocks, comments;
- expressions: string/number/bool/null literals, array and object
  literals, names, ``.member`` access, ``[index]``, calls, function
  literals (callbacks), ``in``, comparisons, ``&&``/``||``, ``!``,
  ``+ - * / %``, ternary ``?:``;
- automatic semicolon insertion in the common statement-per-line
  style (newlines inside ``(``/``[`` never terminate; a leading ``.``
  continues the previous expression; a statement directly after a
  closing ``}`` needs no separator, as in real JS);
- ``for (x in coll)`` — the only loop form; iteration is bounded by
  the collection's size.

Resource guard: the reference VM kills runaway programs with a goja
interrupt (query/gizmo/gizmo.go:107-122). The equivalent here is an
interpreter-wide OP COUNTER (every evaluated node/statement counts;
``_MAX_OPS`` aborts the program) plus a STRING-SIZE CAP on ``+``
concatenation (``_MAX_STR``) — without the cap, ``s = s + s`` inside
capped-depth recursion could still build a 2^64-char string and OOM
the driver. Function recursion is separately capped.
"""

from __future__ import annotations

from . import gizmo as _gizmo

#: every public method/attr a gizmo query may touch, on any object
_SURFACE = frozenset(
    n
    for cls in (_gizmo.GizmoPath, _gizmo.graph)
    for n in vars(cls)
    if not n.startswith("_")
)

_KEYWORDS = frozenset(
    "var let const function return if else true false null undefined in for".split()
)

#: JS member names that are Python keywords → the trailing-underscore
#: aliases GizmoPath defines for them (gizmo.py camelCase alias block)
_JS_ALIASES = {
    "in": "in_",
    "is": "is_",
    "as": "As",
    "and": "and_",
    "or": "or_",
    "except": "except_",
}

_PUNCT3 = ("===", "!==")
_PUNCT2 = ("==", "!=", "<=", ">=", "&&", "||")
_PUNCT1 = ".,;()[]{}<>+-*/%!=?:"

_MAX_CALL_DEPTH = 64
#: interpreter-wide evaluation-step budget per program (the goja
#: interrupt analog); generous for real queries, fatal for runaway ones
_MAX_OPS = 1_000_000
#: largest string '+' may produce (bounds exponential concatenation)
_MAX_STR = 8 * 1024 * 1024


class GizmoSyntaxError(ValueError):
    pass


class GizmoResourceError(GizmoSyntaxError):
    """Program exceeded the sandbox's op or memory budget."""


# ---------------------------------------------------------------- tokens


class _Tok:
    __slots__ = ("kind", "val", "pos")

    def __init__(self, kind, val, pos):
        self.kind = kind  # 'str' 'num' 'name' 'kw' 'punct' 'nl' 'eof'
        self.val = val
        self.pos = pos

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.kind}:{self.val!r}"


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v", "0": "\0"}


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(src)
    depth = 0  # () / [] nesting: newlines inside never end a statement
    while i < n:
        c = src[i]
        if c in " \t\r":
            i += 1
            continue
        if c == "\n":
            if depth == 0 and toks and toks[-1].kind != "nl":
                toks.append(_Tok("nl", "\n", i))
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j < 0:
                raise GizmoSyntaxError("unterminated comment")
            i = j + 2
            continue
        if c in "'\"":
            q, j, buf = c, i + 1, []
            while j < n and src[j] != q:
                if src[j] == "\\":
                    if j + 1 >= n:
                        raise GizmoSyntaxError("bad escape")
                    e = src[j + 1]
                    if e == "u" and j + 5 < n:
                        buf.append(chr(int(src[j + 2 : j + 6], 16)))
                        j += 6
                        continue
                    buf.append(_ESCAPES.get(e, e))
                    j += 2
                    continue
                if src[j] == "\n":
                    raise GizmoSyntaxError("unterminated string")
                buf.append(src[j])
                j += 1
            if j >= n:
                raise GizmoSyntaxError("unterminated string")
            toks.append(_Tok("str", "".join(buf), i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            while j < n and (src[j].isdigit() or src[j] in ".eE" or
                             (src[j] in "+-" and src[j - 1] in "eE")):
                j += 1
            text = src[i:j]
            try:
                val = int(text)
            except ValueError:
                try:
                    val = float(text)
                except ValueError:
                    raise GizmoSyntaxError(f"bad number {text!r}") from None
            toks.append(_Tok("num", val, i))
            i = j
            continue
        if c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            name = src[i:j]
            if name.startswith(("_", "$")):
                raise GizmoSyntaxError(f"name {name!r} not allowed")
            kind = "kw" if name in _KEYWORDS else "name"
            toks.append(_Tok(kind, name, i))
            i = j
            continue
        three, two = src[i : i + 3], src[i : i + 2]
        if three in _PUNCT3:
            toks.append(_Tok("punct", three, i))
            i += 3
            continue
        if two in _PUNCT2:
            toks.append(_Tok("punct", two, i))
            i += 2
            continue
        if c in _PUNCT1:
            if c in "([":
                depth += 1
            elif c in ")]":
                depth = max(0, depth - 1)
            toks.append(_Tok("punct", c, i))
            i += 1
            continue
        raise GizmoSyntaxError(f"unexpected character {c!r}")
    toks.append(_Tok("eof", None, n))
    return toks


# ---------------------------------------------------------------- parser
#
# Nodes are plain tuples: (kind, ...). Expression kinds:
#   ('const', v) ('name', id) ('array', elts) ('object', [(k, v)...])
#   ('member', obj, name) ('index', obj, key) ('call', callee, args)
#   ('func', name|None, params, body) ('unary', op, e)
#   ('binop', op, l, r) ('logic', op, l, r) ('cond', c, a, b)
# Statement kinds:
#   ('expr', e) ('decl', [(name, e|None)...]) ('assign', target, e)
#   ('iset', obj, key, e) ('fundecl', name, params, body)
#   ('return', e|None) ('if', cond, then, orelse)


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers
    def peek(self, k=0) -> _Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at(self, kind, val=None) -> bool:
        t = self.peek()
        return t.kind == kind and (val is None or t.val == val)

    def expect(self, kind, val=None) -> _Tok:
        if not self.at(kind, val):
            t = self.peek()
            raise GizmoSyntaxError(
                f"expected {val or kind}, got {t.val!r}"
            )
        return self.next()

    def skip_nl(self):
        while self.at("nl"):
            self.next()

    def peek_past_nl(self) -> _Tok:
        j = self.i
        while self.toks[j].kind == "nl":
            j += 1
        return self.toks[j]

    # -- program / statements
    def parse_program(self) -> list:
        body = []
        while True:
            self.skip_nl()
            while self.at("punct", ";"):
                self.next()
                self.skip_nl()
            if self.at("eof"):
                return body
            body.append(self.statement())
            self.end_statement()

    def end_statement(self):
        if self.at("punct", ";"):
            self.next()
            return
        if self.at("nl"):
            self.next()
            return
        if self.at("eof") or self.at("punct", "}"):
            return
        # JS needs no separator after a block-closing '}' — single-line
        # programs like 'function f(n){ ... } return 0' are valid
        prev = self.toks[self.i - 1] if self.i > 0 else None
        if prev is not None and prev.kind == "punct" and prev.val == "}":
            return
        t = self.peek()
        raise GizmoSyntaxError(f"unexpected {t.val!r} after statement")

    def block(self) -> list:
        self.expect("punct", "{")
        body = []
        while True:
            self.skip_nl()
            while self.at("punct", ";"):
                self.next()
                self.skip_nl()
            if self.at("punct", "}"):
                self.next()
                return body
            if self.at("eof"):
                raise GizmoSyntaxError("unterminated block")
            body.append(self.statement())
            self.end_statement()

    def statement(self):
        t = self.peek()
        if t.kind == "kw":
            if t.val in ("var", "let", "const"):
                return self.var_decl()
            if t.val == "function":
                return self.function(require_name=True)
            if t.val == "return":
                self.next()
                if self.at("nl") or self.at("punct", ";") or self.at("punct", "}") or self.at("eof"):
                    return ("return", None)
                return ("return", self.expression())
            if t.val == "if":
                return self.if_statement()
            if t.val == "for":
                return self.for_in_statement()
            raise GizmoSyntaxError(f"unexpected keyword {t.val!r}")
        if t.kind == "punct" and t.val == "{":
            # statement-position brace = block (not object literal), as in JS
            return ("if", ("const", True), self.block(), [])
        expr = self.expression()
        if self.at("punct", "="):
            self.next()
            self.skip_nl()
            value = self.expression()
            return self.make_assign(expr, value)
        return ("expr", expr)

    def make_assign(self, target, value):
        if target[0] == "name":
            if target[1] == "g":
                raise GizmoSyntaxError("cannot assign to 'g'")
            return ("assign", target[1], value)
        if target[0] == "index":
            return ("iset", target[1], target[2], value)
        if target[0] == "member":
            raise GizmoSyntaxError("attribute assignment not allowed")
        raise GizmoSyntaxError("invalid assignment target")

    def var_decl(self):
        self.next()  # var/let/const
        decls = []
        while True:
            name = self.expect("name").val
            if name == "g":
                raise GizmoSyntaxError("cannot assign to 'g'")
            init = None
            if self.at("punct", "="):
                self.next()
                self.skip_nl()
                init = self.expression()
            decls.append((name, init))
            if self.at("punct", ","):
                self.next()
                self.skip_nl()
                continue
            return ("decl", decls)

    def if_statement(self):
        self.expect("kw", "if")
        self.expect("punct", "(")
        cond = self.expression()
        self.expect("punct", ")")
        self.skip_nl()
        then = self.block() if self.at("punct", "{") else [self.statement()]
        save = self.i
        self.skip_nl()
        if self.at("kw", "else"):
            self.next()
            self.skip_nl()
            if self.at("kw", "if"):
                orelse = [self.if_statement()]
            else:
                orelse = self.block() if self.at("punct", "{") else [self.statement()]
            return ("if", cond, then, orelse)
        self.i = save
        return ("if", cond, then, [])

    def for_in_statement(self):
        """``for (x in expr) body`` — the only loop form in the
        grammar. Iteration is bounded by the collection's size, so no
        unbounded loops become expressible."""
        self.expect("kw", "for")
        self.expect("punct", "(")
        if self.at("kw") and self.peek().val in ("var", "let", "const"):
            self.next()
        name = self.expect("name").val
        if name == "g":
            raise GizmoSyntaxError("cannot assign to 'g'")
        self.expect("kw", "in")
        coll = self.expression()
        self.expect("punct", ")")
        self.skip_nl()
        body = self.block() if self.at("punct", "{") else [self.statement()]
        return ("forin", name, coll, body)

    def function(self, require_name: bool):
        self.expect("kw", "function")
        name = None
        if self.at("name"):
            name = self.next().val
            if name == "g":
                raise GizmoSyntaxError("cannot assign to 'g'")
        elif require_name:
            raise GizmoSyntaxError("function declaration needs a name")
        self.expect("punct", "(")
        params = []
        while not self.at("punct", ")"):
            params.append(self.expect("name").val)
            if self.at("punct", ","):
                self.next()
        self.expect("punct", ")")
        self.skip_nl()
        body = self.block()
        if require_name:
            return ("fundecl", name, params, body)
        return ("func", name, params, body)

    # -- expressions (precedence climbing)
    def expression(self):
        return self.ternary()

    def ternary(self):
        cond = self.logic_or()
        if self.at("punct", "?"):
            self.next()
            self.skip_nl()
            a = self.ternary()
            self.expect("punct", ":")
            self.skip_nl()
            b = self.ternary()
            return ("cond", cond, a, b)
        return cond

    def logic_or(self):
        l = self.logic_and()
        while self.at("punct", "||"):
            self.next()
            self.skip_nl()
            l = ("logic", "||", l, self.logic_and())
        return l

    def logic_and(self):
        l = self.equality()
        while self.at("punct", "&&"):
            self.next()
            self.skip_nl()
            l = ("logic", "&&", l, self.equality())
        return l

    def equality(self):
        l = self.relational()
        while self.at("punct") and self.peek().val in ("==", "===", "!=", "!=="):
            op = self.next().val
            self.skip_nl()
            l = ("binop", op, l, self.relational())
        return l

    def relational(self):
        l = self.additive()
        while (self.at("punct") and self.peek().val in ("<", ">", "<=", ">=")) or self.at("kw", "in"):
            op = self.next().val
            self.skip_nl()
            l = ("binop", op, l, self.additive())
        return l

    def additive(self):
        l = self.multiplicative()
        while self.at("punct") and self.peek().val in ("+", "-"):
            op = self.next().val
            self.skip_nl()
            l = ("binop", op, l, self.multiplicative())
        return l

    def multiplicative(self):
        l = self.unary()
        while self.at("punct") and self.peek().val in ("*", "/", "%"):
            op = self.next().val
            self.skip_nl()
            l = ("binop", op, l, self.unary())
        return l

    def unary(self):
        if self.at("punct", "!"):
            self.next()
            return ("unary", "!", self.unary())
        if self.at("punct", "-"):
            self.next()
            return ("unary", "-", self.unary())
        if self.at("punct", "+"):
            self.next()
            return ("unary", "+", self.unary())
        return self.postfix()

    def postfix(self):
        e = self.primary()
        while True:
            # real-JS ASI: a newline before '.' continues the chain
            if self.at("nl") and self.peek_past_nl().kind == "punct" and self.peek_past_nl().val == ".":
                self.skip_nl()
            if self.at("punct", "."):
                self.next()
                self.skip_nl()
                t = self.peek()
                if t.kind not in ("name", "kw"):
                    raise GizmoSyntaxError("expected member name after '.'")
                self.next()
                e = ("member", e, t.val)
                continue
            if self.at("punct", "("):
                self.next()
                args = []
                self.skip_nl()
                while not self.at("punct", ")"):
                    args.append(self.expression())
                    self.skip_nl()
                    if self.at("punct", ","):
                        self.next()
                        self.skip_nl()
                self.next()  # ')'
                e = ("call", e, args)
                continue
            if self.at("punct", "["):
                self.next()
                self.skip_nl()
                k = self.expression()
                self.skip_nl()
                self.expect("punct", "]")
                e = ("index", e, k)
                continue
            return e

    def primary(self):
        t = self.peek()
        if t.kind == "str" or t.kind == "num":
            self.next()
            return ("const", t.val)
        if t.kind == "kw":
            if t.val == "true":
                self.next()
                return ("const", True)
            if t.val == "false":
                self.next()
                return ("const", False)
            if t.val in ("null", "undefined"):
                self.next()
                return ("const", None)
            if t.val == "function":
                return self.function(require_name=False)
            raise GizmoSyntaxError(f"unexpected keyword {t.val!r}")
        if t.kind == "name":
            self.next()
            return ("name", t.val)
        if t.kind == "punct" and t.val == "(":
            self.next()
            self.skip_nl()
            e = self.expression()
            self.skip_nl()
            self.expect("punct", ")")
            return e
        if t.kind == "punct" and t.val == "[":
            self.next()
            elts = []
            self.skip_nl()
            while not self.at("punct", "]"):
                elts.append(self.expression())
                self.skip_nl()
                if self.at("punct", ","):
                    self.next()
                    self.skip_nl()
            self.next()
            return ("array", elts)
        if t.kind == "punct" and t.val == "{":
            self.next()
            pairs = []
            self.skip_nl()
            while not self.at("punct", "}"):
                kt = self.peek()
                if kt.kind in ("name", "str", "kw"):
                    key = self.next().val
                elif kt.kind == "num":
                    key = str(self.next().val)
                else:
                    raise GizmoSyntaxError("bad object key")
                self.skip_nl()
                self.expect("punct", ":")
                self.skip_nl()
                pairs.append((key, self.expression()))
                self.skip_nl()
                if self.at("punct", ","):
                    self.next()
                    self.skip_nl()
            self.next()
            return ("object", pairs)
        raise GizmoSyntaxError(f"unexpected {t.val!r}")


# ------------------------------------------------------------ interpreter


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None, vars=None):
        self.vars = vars or {}
        self.parent = parent

    def lookup(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s.vars[name]
            s = s.parent
        raise GizmoSyntaxError(f"unknown name {name!r}")

    def declare(self, name, value):
        self.vars[name] = value

    def assign(self, name, value):
        s = self
        while s is not None:
            if name in s.vars:
                s.vars[name] = value
                return
            s = s.parent
        # JS: assignment without declaration targets the global scope
        s = self
        while s.parent is not None:
            s = s.parent
        s.vars[name] = value


class JSFunction:
    """A parsed gizmo callback — callable from Python finals
    (ForEach/Map receive these directly)."""

    __slots__ = ("name", "params", "body", "scope", "interp")

    def __init__(self, name, params, body, scope, interp):
        self.name = name or "<anonymous>"
        self.params = params
        self.body = body
        self.scope = scope
        self.interp = interp

    def __call__(self, *args):
        interp = self.interp
        interp.depth += 1
        if interp.depth > _MAX_CALL_DEPTH:
            interp.depth -= 1
            raise GizmoSyntaxError("call depth exceeded")
        try:
            local = _Scope(parent=self.scope)
            for i, p in enumerate(self.params):
                local.declare(p, args[i] if i < len(args) else None)
            try:
                for stmt in self.body:
                    interp.exec_stmt(stmt, local)
            except _Return as r:
                return r.value
            return None
        finally:
            interp.depth -= 1


def _truthy(v) -> bool:
    # JS: any object/array/function is truthy, even when empty
    if isinstance(v, (dict, list, JSFunction)):
        return True
    return bool(v)


def _default_env() -> dict:
    """The reference VM's global helper functions
    (query/gizmo/environ.go:244-263 defaultEnv): value constructors
    and filter builders available to every gizmo program."""
    from .. import shapes as S
    from .. import values as V

    def _s(x) -> str:
        if isinstance(x, V.Value):
            return getattr(x, "s", x.term())
        if not isinstance(x, str):
            raise GizmoSyntaxError("expected a string argument")
        return x

    def regex(pattern, refs=False):
        # cmpRegexp (environ.go:186-230): a String pattern matches
        # strings, or refs too when allowRefs; an IRI/BNode pattern is
        # an ERROR without allowRefs and implies refs with it
        if not isinstance(refs, bool):
            raise GizmoSyntaxError("expected bool as second argument")
        if isinstance(pattern, (V.IRI, V.BNode)):
            if not refs:
                raise GizmoSyntaxError(
                    "regexp: can not match IRIs/BNodes without refs"
                )
            return S.Regexp(pattern.s, True)
        return S.Regexp(_s(pattern), refs)

    return {
        "iri": lambda s: V.IRI(_s(s)),
        "bnode": lambda s: V.BNode(_s(s)),
        "raw": lambda s: V.Raw(_s(s)),
        "str": lambda s: V.String(_s(s)),
        "lang": lambda s, lang: V.LangString(_s(s), _s(lang)),
        "typed": lambda s, typ: V.TypedString(_s(s), _s(typ)),
        "lt": lambda v: S.Comparison("lt", V.coerce(v)),
        "lte": lambda v: S.Comparison("lte", V.coerce(v)),
        "gt": lambda v: S.Comparison("gt", V.coerce(v)),
        "gte": lambda v: S.Comparison("gte", V.coerce(v)),
        "regex": regex,
        "like": lambda pattern: S.Wildcard(_s(pattern)),
    }


class _Interp:
    def __init__(self, g):
        self.globals = _Scope(vars={**_default_env(), "g": g})
        self.depth = 0
        self.ops = 0

    def tick(self):
        """One evaluation step — the goja-interrupt analog."""
        self.ops += 1
        if self.ops > _MAX_OPS:
            raise GizmoResourceError("operation limit exceeded")

    # -- gates: the entire sandbox boundary is these three functions
    @staticmethod
    def member_get(obj, name):
        if name.startswith("_"):
            raise GizmoSyntaxError(f"member {name!r} not allowed")
        if isinstance(obj, dict):
            return obj.get(name)
        name = _JS_ALIASES.get(name, name)
        if name in _SURFACE:
            try:
                return getattr(obj, name)
            except AttributeError:
                # a gizmo method name on a non-gizmo value (e.g. an
                # array) is a query error, not a server error
                raise GizmoSyntaxError(
                    f"member {name!r} not available on this value"
                ) from None
        raise GizmoSyntaxError(f"unknown gizmo method {name!r}")

    @staticmethod
    def index_get(obj, key):
        if isinstance(obj, dict):
            return obj.get(key)
        if isinstance(obj, (list, str)) and isinstance(key, int):
            try:
                return obj[key]
            except IndexError:
                return None
        raise GizmoSyntaxError("indexing not allowed here")

    @staticmethod
    def index_set(obj, key, value):
        if isinstance(obj, dict):
            obj[key] = value
            return
        if isinstance(obj, list) and isinstance(key, int) and 0 <= key < len(obj):
            obj[key] = value
            return
        raise GizmoSyntaxError("index assignment not allowed here")

    # -- statements
    def exec_stmt(self, stmt, scope):
        self.tick()
        kind = stmt[0]
        if kind == "expr":
            return self.eval(stmt[1], scope)
        if kind == "decl":
            for name, init in stmt[1]:
                scope.declare(name, self.eval(init, scope) if init else None)
            return None
        if kind == "assign":
            scope.assign(stmt[1], self.eval(stmt[2], scope))
            return None
        if kind == "iset":
            obj = self.eval(stmt[1], scope)
            key = self.eval(stmt[2], scope)
            self.index_set(obj, key, self.eval(stmt[3], scope))
            return None
        if kind == "fundecl":
            scope.declare(stmt[1], JSFunction(stmt[1], stmt[2], stmt[3], scope, self))
            return None
        if kind == "return":
            raise _Return(self.eval(stmt[1], scope) if stmt[1] else None)
        if kind == "if":
            if _truthy(self.eval(stmt[1], scope)):
                for s in stmt[2]:
                    self.exec_stmt(s, scope)
            else:
                for s in stmt[3]:
                    self.exec_stmt(s, scope)
            return None
        if kind == "forin":
            coll = self.eval(stmt[2], scope)
            if isinstance(coll, dict):
                keys = list(coll)
            elif isinstance(coll, (list, str)):
                # JS yields string indices; ints keep coll[i] working
                # through the index gate, which is the only use here
                keys = list(range(len(coll)))
            elif coll is None:
                keys = []
            else:
                raise GizmoSyntaxError("for-in needs an object or array")
            for k in keys:
                scope.assign(stmt[1], k)
                for s in stmt[3]:
                    self.exec_stmt(s, scope)
            return None
        raise GizmoSyntaxError(f"bad statement {kind!r}")  # pragma: no cover

    # -- expressions
    def eval(self, node, scope):
        self.tick()
        kind = node[0]
        if kind == "const":
            return node[1]
        if kind == "name":
            return scope.lookup(node[1])
        if kind == "member":
            return self.member_get(self.eval(node[1], scope), node[2])
        if kind == "index":
            return self.index_get(self.eval(node[1], scope), self.eval(node[2], scope))
        if kind == "call":
            fn = self.eval(node[1], scope)
            args = [self.eval(a, scope) for a in node[2]]
            if not callable(fn):
                raise GizmoSyntaxError("not callable")
            return fn(*args)
        if kind == "func":
            return JSFunction(node[1], node[2], node[3], scope, self)
        if kind == "array":
            return [self.eval(e, scope) for e in node[1]]
        if kind == "object":
            return {k: self.eval(v, scope) for k, v in node[1]}
        if kind == "unary":
            v = self.eval(node[2], scope)
            if node[1] == "!":
                return not _truthy(v)
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise GizmoSyntaxError("unary arithmetic needs a number")
            return -v if node[1] == "-" else +v
        if kind == "logic":
            l = self.eval(node[2], scope)
            if node[1] == "&&":
                return self.eval(node[3], scope) if _truthy(l) else l
            return l if _truthy(l) else self.eval(node[3], scope)
        if kind == "cond":
            branch = node[2] if _truthy(self.eval(node[1], scope)) else node[3]
            return self.eval(branch, scope)
        if kind == "binop":
            return self.binop(node[1], self.eval(node[2], scope), self.eval(node[3], scope))
        raise GizmoSyntaxError(f"bad expression {kind!r}")  # pragma: no cover

    @staticmethod
    def binop(op, l, r):
        if op == "in":
            if isinstance(r, dict):
                return l in r
            if isinstance(r, str) and isinstance(l, str):
                return l in r
            raise GizmoSyntaxError("'in' needs an object")
        if op in ("==", "==="):
            return l == r
        if op in ("!=", "!=="):
            return l != r
        if op == "+":
            if isinstance(l, str) or isinstance(r, str):
                def s(x):
                    if isinstance(x, bool):
                        return "true" if x else "false"
                    if x is None:
                        return "null"
                    return str(x)
                a, b = s(l), s(r)
                if len(a) + len(b) > _MAX_STR:
                    raise GizmoResourceError("string size limit exceeded")
                return a + b
            if isinstance(l, (int, float)) and isinstance(r, (int, float)):
                return l + r
            raise GizmoSyntaxError("bad operands for +")
        num = (int, float)
        if not (isinstance(l, num) and isinstance(r, num)) or isinstance(l, bool) or isinstance(r, bool):
            if op in ("<", ">", "<=", ">="):
                if isinstance(l, str) and isinstance(r, str):
                    return {"<": l < r, ">": l > r, "<=": l <= r, ">=": l >= r}[op]
            raise GizmoSyntaxError(f"bad operands for {op}")
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            if r == 0:
                raise GizmoSyntaxError("division by zero")
            return l / r
        if op == "%":
            if r == 0:
                raise GizmoSyntaxError("modulo by zero")
            return l % r
        return {"<": l < r, ">": l > r, "<=": l <= r, ">=": l >= r}[op]


def safe_gizmo_eval(query: str, g) -> object:
    """Parse and interpret a gizmo program against graph object ``g``.
    Returns the value of the last expression statement (JS-style: the
    program's completion value)."""
    program = _Parser(_tokenize(query)).parse_program()
    interp = _Interp(g)
    result = None
    for stmt in program:
        v = interp.exec_stmt(stmt, interp.globals)
        if stmt[0] == "expr":
            result = v
    return result
