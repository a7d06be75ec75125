"""CREATE_LIKE transform compiler.

The reference ``eval``'s a user-supplied lambda string and applies it per
row in Python (reference utils.py:82-83,107-108). That is both unsafe and
the slow path at scale: a Python call per row per column.

Here the lambda *source* is parsed with :mod:`ast` (never executed) and
translated into a native Spark Column expression whenever it stays inside a
whitelisted grammar — arithmetic, ``round``/``abs``, string ``split``/
``upper``/``lower``/``strip``/``replace``, subscripting a split. Native
expressions run inside whole-stage codegen on the JVM: zero Python cost,
Catalyst can constant-fold and push them around.

Lambdas outside the grammar fall back to an Arrow-batched pandas UDF — but
only when the caller passes ``allow_python_transforms=True``, because that
path really does ``eval`` layout-provided code (documented opt-in; the
reference does this unconditionally).

Python/Spark semantics notes:
- Python ``round`` is banker's rounding (HALF_EVEN) → ``F.bround``, not
  ``F.round`` (HALF_UP).
- ``x ** 2`` → ``F.pow`` (returns double; re-cast to the declared dtype by
  the layout compiler, mirroring SQLite column affinity).
"""

from __future__ import annotations

import ast
import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


class TransformTranslationError(ValueError):
    """Lambda source is outside the whitelisted expression grammar."""


_BINOPS: dict[type, Callable[[Column | float, Column | float], Column]] = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Mod: lambda a, b: a % b,
    ast.Pow: lambda a, b: F.pow(a, b),
    ast.FloorDiv: lambda a, b: F.floor(a / b),
}

_STR_METHODS = {"split", "upper", "lower", "strip", "lstrip", "rstrip", "replace"}


def parse_lambda(source: str) -> tuple[str, ast.expr]:
    """Parse ``"lambda __x: <expr>"`` → (param_name, body AST). Never evals."""
    try:
        tree = ast.parse(source.strip(), mode="eval")
    except SyntaxError as err:
        raise TransformTranslationError(
            f"CREATE_LIKE is not valid Python: {source!r} ({err})"
        ) from err
    node = tree.body
    if not isinstance(node, ast.Lambda) or len(node.args.args) != 1:
        raise TransformTranslationError(
            f"CREATE_LIKE must be a single-argument lambda, got: {source!r}"
        )
    return node.args.args[0].arg, node.body


def translate_create_like(source: str) -> Callable[[Column], Column]:
    """Compile a CREATE_LIKE lambda string to a Column→Column function.

    Raises TransformTranslationError when the expression uses anything
    outside the whitelist (caller may then fall back to a pandas UDF).
    """
    param, body = parse_lambda(source)

    def build(node: ast.expr, col: Column) -> Column | int | float | str:
        if isinstance(node, ast.Name):
            if node.id != param:
                raise TransformTranslationError(f"unknown name {node.id!r}")
            return col
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float, str)):
                return node.value
            raise TransformTranslationError(f"unsupported constant {node.value!r}")
        if isinstance(node, ast.BinOp):
            op = _BINOPS.get(type(node.op))
            if op is None:
                raise TransformTranslationError(f"unsupported operator {node.op}")
            left = build(node.left, col)
            right = build(node.right, col)
            if not isinstance(left, Column) and not isinstance(right, Column):
                raise TransformTranslationError("constant-only expression")
            if not isinstance(left, Column):
                left = F.lit(left)
            return op(left, right)
        if isinstance(node, ast.UnaryOp):
            inner = build(node.operand, col)
            if isinstance(node.op, ast.USub):
                return -inner if isinstance(inner, Column) else -inner
            if isinstance(node.op, ast.UAdd):
                return inner
            raise TransformTranslationError(f"unsupported unary op {node.op}")
        if isinstance(node, ast.Call):
            return build_call(node, col)
        if isinstance(node, ast.Subscript):
            return build_subscript(node, col)
        raise TransformTranslationError(f"unsupported syntax {ast.dump(node)[:80]}")

    def build_call(node: ast.Call, col: Column) -> Column:
        if node.keywords:
            raise TransformTranslationError("keyword arguments not supported")
        # Builtin calls: round(x[, n]), abs(x)
        if isinstance(node.func, ast.Name):
            fname = node.func.id
            args = [build(a, col) for a in node.args]
            if fname == "round" and 1 <= len(args) <= 2:
                ndigits = args[1] if len(args) == 2 else 0
                if isinstance(ndigits, Column):
                    raise TransformTranslationError("round ndigits must be constant")
                # Python round == HALF_EVEN == Spark bround (not F.round).
                return F.bround(args[0], int(ndigits))
            if fname == "abs" and len(args) == 1:
                return F.abs(args[0])
            if fname in ("int", "float", "str") and len(args) == 1:
                target = {"int": "long", "float": "double", "str": "string"}[fname]
                return args[0].cast(target)
            raise TransformTranslationError(f"unsupported function {fname!r}")
        # String method calls: __x.split(sep), .upper(), .replace(a, b), ...
        if isinstance(node.func, ast.Attribute):
            method = node.func.attr
            if method not in _STR_METHODS:
                raise TransformTranslationError(f"unsupported method {method!r}")
            target = build(node.func.value, col)
            if not isinstance(target, Column):
                raise TransformTranslationError("method call on non-column")
            args = [build(a, col) for a in node.args]
            if any(isinstance(a, Column) for a in args):
                raise TransformTranslationError("method args must be constants")
            if method == "split":
                if len(args) != 1 or not isinstance(args[0], str):
                    raise TransformTranslationError("split needs one string arg")
                return F.split(target, re.escape(args[0]))
            if method == "upper":
                return F.upper(target)
            if method == "lower":
                return F.lower(target)
            if method in ("strip", "lstrip", "rstrip"):
                fn = {"strip": F.trim, "lstrip": F.ltrim, "rstrip": F.rtrim}[method]
                if args:
                    raise TransformTranslationError("strip with chars not supported")
                return fn(target)
            if method == "replace":
                if len(args) != 2 or not all(isinstance(a, str) for a in args):
                    raise TransformTranslationError("replace needs two string args")
                return F.regexp_replace(target, re.escape(args[0]), args[1])
        raise TransformTranslationError("unsupported call form")

    def build_subscript(node: ast.Subscript, col: Column) -> Column:
        index = node.slice
        # `x[-1]` parses as UnaryOp(USub, Constant(1)) — fold it here.
        if (
            isinstance(index, ast.UnaryOp)
            and isinstance(index.op, ast.USub)
            and isinstance(index.operand, ast.Constant)
            and isinstance(index.operand.value, int)
        ):
            index = ast.Constant(value=-index.operand.value)
        if not isinstance(index, ast.Constant) or not isinstance(index.value, int):
            raise TransformTranslationError("only constant integer subscripts")
        target = build(node.value, col)
        if not isinstance(target, Column):
            raise TransformTranslationError("subscript of non-column")
        i = index.value
        if i >= 0:
            return F.get(target, i)
        # Negative index → from the end, like Python.
        return F.get(target, F.size(target) + i)

    def apply(col: Column) -> Column:
        result = build(body, col)
        if not isinstance(result, Column):
            raise TransformTranslationError("expression does not use the argument")
        return result

    # Force translation errors at compile time, not first use.
    apply(F.lit(None))
    return apply
