"""Restricted evaluator for HTTP gizmo query strings.

The reference executes gizmo programs inside a sandboxed goja JS VM
with no host access (query/gizmo/gizmo.go:107-122). The Python
equivalent of "no host access" is an AST allowlist: a query may only
chain non-underscore method calls on the graph object ``g`` (or on
variables previously assigned from such chains) with literal
arguments — no subscripts, no dunder attributes, no unknown names, no
comprehensions, no operators beyond unary minus on numeric literals.
Attribute names are further restricted to the public gizmo surface
collected from the GizmoPath/graph classes, so a query cannot wander
from a returned object into engine internals (e.g.
``...df().sparkSession.read``) even through public attributes.

Programs may be a single expression or a sequence of statements (one
per line / semicolon); the last expression's value is the result.
Simple assignments to plain variables are allowed (held in the
sandbox env), and JavaScript's ``var``/``let``/``const`` declaration
keywords are stripped at statement starts — so the common JS-style
gizmo program shape

    var friends = g.V("<bob>").In("<follows>");
    friends.All()

runs unchanged (function literals / callbacks still need the Python
surface).
"""

from __future__ import annotations

import ast
import re

from . import gizmo as _gizmo

_DECL = re.compile(r"(?m)^(\s*)(?:var|let|const)\s+")

#: every public method/attr a gizmo query may touch, on any object
_SURFACE = frozenset(
    n
    for cls in (_gizmo.GizmoPath, _gizmo.graph)
    for n in vars(cls)
    if not n.startswith("_")
)


class GizmoSyntaxError(ValueError):
    pass


def _validate(node: ast.AST, names: set[str]) -> None:
    if isinstance(node, ast.Call):
        _validate(node.func, names)
        for a in node.args:
            _validate(a, names)
        for kw in node.keywords:
            if kw.arg is None or kw.arg.startswith("_"):
                raise GizmoSyntaxError("keyword not allowed")
            _validate(kw.value, names)
    elif isinstance(node, ast.Attribute):
        if node.attr not in _SURFACE:
            raise GizmoSyntaxError(f"unknown gizmo method {node.attr!r}")
        _validate(node.value, names)
    elif isinstance(node, ast.Name):
        if node.id not in names:
            raise GizmoSyntaxError(f"unknown name {node.id!r}")
    elif isinstance(node, ast.Constant):
        if not isinstance(node.value, (str, int, float, bool, type(None))):
            raise GizmoSyntaxError("literal type not allowed")
    elif isinstance(node, (ast.List, ast.Tuple)):
        for e in node.elts:
            _validate(e, names)
    elif isinstance(node, ast.Dict):
        for k in node.keys:
            if k is None:
                raise GizmoSyntaxError("dict expansion not allowed")
            _validate(k, names)
        for v in node.values:
            _validate(v, names)
    elif isinstance(node, ast.UnaryOp):
        if not isinstance(node.op, ast.USub) or not isinstance(
            node.operand, ast.Constant
        ):
            raise GizmoSyntaxError("operator not allowed")
        _validate(node.operand, names)
    else:
        raise GizmoSyntaxError(
            f"syntax not allowed in gizmo query: {type(node).__name__}"
        )


def safe_gizmo_eval(query: str, g) -> object:
    """Validate and evaluate a gizmo program against graph object
    ``g``. Returns the value of the last expression statement."""
    query = _DECL.sub(r"\1", query)
    try:
        tree = ast.parse(query, "<gizmo>", mode="exec")
    except SyntaxError as e:
        raise GizmoSyntaxError(str(e)) from None
    env: dict[str, object] = {"g": g}
    result = None
    for stmt in tree.body:
        if isinstance(stmt, ast.Assign):
            if len(stmt.targets) != 1 or not isinstance(
                stmt.targets[0], ast.Name
            ):
                raise GizmoSyntaxError("only simple assignments allowed")
            target = stmt.targets[0].id
            if target == "g" or target.startswith("_"):
                raise GizmoSyntaxError(f"cannot assign to {target!r}")
            _validate(stmt.value, set(env))
            code = compile(
                ast.Expression(stmt.value, type_ignores=[]), "<gizmo>", "eval"
            )
            env[target] = eval(code, {"__builtins__": {}}, dict(env))  # noqa: S307
            continue
        if not isinstance(stmt, ast.Expr):
            raise GizmoSyntaxError(
                f"only expressions allowed, got {type(stmt).__name__}"
            )
        _validate(stmt.value, set(env))
        code = compile(
            ast.Expression(stmt.value, type_ignores=[]), "<gizmo>", "eval"
        )
        result = eval(code, {"__builtins__": {}}, dict(env))  # noqa: S307 - AST-validated above
    return result
