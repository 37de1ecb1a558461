"""Restricted evaluator for HTTP gizmo query strings.

The reference executes gizmo programs inside a sandboxed goja JS VM
with no host access (query/gizmo/gizmo.go:107-122). The Python
equivalent of "no host access" is an AST allowlist: a query may only
chain non-underscore method calls on the graph object ``g`` with
literal arguments — no subscripts, no dunder attributes, no names
other than ``g``, no comprehensions, no operators beyond unary minus
on numeric literals. Attribute names are further restricted to the
public gizmo surface collected from the GizmoPath/graph classes, so a
query cannot wander from a returned object into engine internals
(e.g. ``...df().sparkSession.read``) even through public attributes.

Programs may be a single expression or a sequence of expression
statements (one per line / semicolon), matching how the reference's
sessions feed multi-statement gizmo programs; the last expression's
value is the result.
"""

from __future__ import annotations

import ast

from . import gizmo as _gizmo

#: every public method/attr a gizmo query may touch, on any object
_SURFACE = frozenset(
    n
    for cls in (_gizmo.GizmoPath, _gizmo.graph)
    for n in vars(cls)
    if not n.startswith("_")
)


class GizmoSyntaxError(ValueError):
    pass


def _validate(node: ast.AST) -> None:
    if isinstance(node, ast.Call):
        _validate(node.func)
        for a in node.args:
            _validate(a)
        for kw in node.keywords:
            if kw.arg is None or kw.arg.startswith("_"):
                raise GizmoSyntaxError("keyword not allowed")
            _validate(kw.value)
    elif isinstance(node, ast.Attribute):
        if node.attr not in _SURFACE:
            raise GizmoSyntaxError(f"unknown gizmo method {node.attr!r}")
        _validate(node.value)
    elif isinstance(node, ast.Name):
        if node.id != "g":
            raise GizmoSyntaxError(f"unknown name {node.id!r}")
    elif isinstance(node, ast.Constant):
        if not isinstance(node.value, (str, int, float, bool, type(None))):
            raise GizmoSyntaxError("literal type not allowed")
    elif isinstance(node, (ast.List, ast.Tuple)):
        for e in node.elts:
            _validate(e)
    elif isinstance(node, ast.Dict):
        for k in node.keys:
            if k is None:
                raise GizmoSyntaxError("dict expansion not allowed")
            _validate(k)
        for v in node.values:
            _validate(v)
    elif isinstance(node, ast.UnaryOp):
        if not isinstance(node.op, ast.USub) or not isinstance(
            node.operand, ast.Constant
        ):
            raise GizmoSyntaxError("operator not allowed")
        _validate(node.operand)
    else:
        raise GizmoSyntaxError(
            f"syntax not allowed in gizmo query: {type(node).__name__}"
        )


def safe_gizmo_eval(query: str, g) -> object:
    """Validate and evaluate a gizmo query against graph object ``g``.
    Returns the value of the last expression statement."""
    try:
        tree = ast.parse(query, "<gizmo>", mode="exec")
    except SyntaxError as e:
        raise GizmoSyntaxError(str(e)) from None
    result = None
    for stmt in tree.body:
        if not isinstance(stmt, ast.Expr):
            raise GizmoSyntaxError(
                f"only expressions allowed, got {type(stmt).__name__}"
            )
        _validate(stmt.value)
        code = compile(ast.Expression(stmt.value, type_ignores=[]), "<gizmo>", "eval")
        result = eval(code, {"__builtins__": {}}, {"g": g})  # noqa: S307 - AST-validated above
    return result
