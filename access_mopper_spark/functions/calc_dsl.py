"""Safe compiler for the mapping-catalog calculation DSL.

The reference's entire extension mechanism is a Python expression string in
the mapping table's ``calculation`` column, ``eval``'d with ``var[i]`` bound
to xarray arrays (``mopper/mop_utils.py:897-906``; legacy
``original/subroutines/app_functions.py:53-99``).  Examples from the shipped
catalogs (``data/access.db``, ``data/mappings/master_map.csv``)::

    var[0] + var[1]
    var[0] * 1e-6
    ((var[0]**2 + var[1]**2)**(0.5))
    var[0].isel(depth=0)
    var[0].sum(dim='depth')
    var[0].where(var[1] != 0)
    plevinterp(var[0], var[1], 24)
    var[0].isel(time=0).astype(int)

We never eval.  The string is parsed with :mod:`ast`, validated against a
node whitelist, and compiled into Spark Column expressions over a *tall*
DataFrame that carries one column per input variable (``var0``, ``var1``,
…) plus dimension columns.  Dimension-changing constructs compile to frame
operations:

- ``.isel(dim=k)``      → ``WHERE dim = k`` (dims are integer-indexed in
  the tall layout, matching xarray positional selection)
- ``.sum/mean/min/max(dim=d)`` → ``GROUP BY <other dims>`` aggregate
- registered macro functions (``plevinterp`` …) → DataFrame transformers
  from the function registry

Everything scalar stays a Column (whole-stage codegen; pushdown-friendly);
the output is a plan, so Catalyst still sees through it.
"""

from __future__ import annotations

import ast
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- registry

#: elementwise functions allowed in calc strings → Column builders
ELEMENTWISE: dict[str, Callable[..., Column]] = {
    "exp": F.exp,
    "log": F.log,
    "sqrt": F.sqrt,
    "abs": F.abs,
    "pow": F.pow,
    "least": F.least,
    "greatest": F.greatest,
}


@dataclass
class CalcContext:
    """Compilation context: the tall frame and its dimension columns."""

    dim_cols: list[str] = field(default_factory=lambda: ["time", "lev", "lat", "lon"])
    var_cols: list[str] | None = None      # column name per var[i]; default var{i}
    macros: dict[str, Callable] = field(default_factory=dict)

    def var_col(self, i: int) -> str:
        if self.var_cols is not None:
            return self.var_cols[i]
        return f"var{i}"


@dataclass
class CalcPlan:
    """Compiled calculation: filters → scalar value → optional reduction →
    post-scalar.  ``apply`` turns it into a DataFrame transformation."""

    filters: list[Column] = field(default_factory=list)
    value: Column | None = None            # full expression; references
    #                                        __agg__ when a reduction exists
    reduce_dims: list[str] = field(default_factory=list)
    reducer: str | None = None             # sum|mean|min|max
    pre_agg: Column | None = None          # expression inside the reduction
    macro: Callable[[DataFrame], DataFrame] | None = None
    ctx: CalcContext | None = None

    def apply(self, df: DataFrame, out_col: str = "value") -> DataFrame:
        if self.macro is not None:
            return self.macro(df)
        out = df
        for f in self.filters:
            out = out.where(f)
        if self.reducer:
            keep = [d for d in self.ctx.dim_cols if d not in self.reduce_dims and d in out.columns]
            red = getattr(F, self.reducer)(self.pre_agg).alias("__agg__")
            out = out.groupBy(*keep).agg(red)
            return out.select(*keep, self.value.alias(out_col))
        keep = [d for d in self.ctx.dim_cols if d in out.columns]
        return out.select(*keep, self.value.alias(out_col))


_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Call, ast.Attribute, ast.Subscript,
    ast.Name, ast.Constant, ast.Compare, ast.BoolOp, ast.keyword, ast.Tuple, ast.List,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow, ast.Mod, ast.USub, ast.UAdd,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.And, ast.Or, ast.Index,
    ast.Load,   # expression contexts (never Store/Del — assignments can't parse in eval mode)
)

_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Pow: lambda a, b: F.pow(a, b),
    ast.Mod: lambda a, b: a % b,
}

_CMPOPS = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}

_REDUCERS = ("sum", "mean", "min", "max")

_CASTS = {"int": "bigint", "float": "double", "float32": "float", "float64": "double",
          "int32": "int", "int64": "bigint", "bool": "boolean"}


class CalcCompileError(ValueError):
    pass


class _Compiler(ast.NodeVisitor):
    def __init__(self, ctx: CalcContext):
        self.ctx = ctx
        self.plan = CalcPlan(ctx=ctx)

    # -- entry ------------------------------------------------------------
    def compile(self, calc: str) -> CalcPlan:
        tree = ast.parse(calc.strip(), mode="eval")
        for node in ast.walk(tree):
            if not isinstance(node, _ALLOWED_NODES):
                raise CalcCompileError(
                    f"disallowed syntax {type(node).__name__!r} in calc: {calc!r}")
        self.plan.value = self._expr(tree.body)
        return self.plan

    # -- expression evaluation -------------------------------------------
    def _expr(self, node) -> Column:
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float, bool, str)):
                return F.lit(node.value)
            raise CalcCompileError(f"bad literal {node.value!r}")
        if isinstance(node, ast.Name):
            # bare dimension/column reference (e.g. lat in predicates)
            return F.col(node.id)
        if isinstance(node, ast.Subscript):
            return self._var_ref(node)
        if isinstance(node, ast.BinOp):
            op = _BINOPS.get(type(node.op))
            if op is None:
                raise CalcCompileError(f"operator {type(node.op).__name__} not allowed")
            return op(self._expr(node.left), self._expr(node.right))
        if isinstance(node, ast.UnaryOp):
            v = self._expr(node.operand)
            return -v if isinstance(node.op, ast.USub) else v
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise CalcCompileError("chained comparisons not supported")
            return _CMPOPS[type(node.ops[0])](self._expr(node.left), self._expr(node.comparators[0]))
        if isinstance(node, ast.BoolOp):
            parts = [self._expr(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if isinstance(node.op, ast.And) else (out | p)
            return out
        if isinstance(node, ast.Call):
            return self._call(node)
        raise CalcCompileError(f"unsupported node {type(node).__name__}")

    def _var_ref(self, node: ast.Subscript) -> Column:
        if not (isinstance(node.value, ast.Name) and node.value.id == "var"):
            raise CalcCompileError("only var[i] subscripts are allowed")
        idx = node.slice
        if isinstance(idx, ast.Index):           # py<3.9 compat shape
            idx = idx.value
        if not (isinstance(idx, ast.Constant) and isinstance(idx.value, int)):
            raise CalcCompileError("var index must be an int literal")
        return F.col(self.ctx.var_col(idx.value))

    def _call(self, node: ast.Call) -> Column:
        # method call: <expr>.method(...)
        if isinstance(node.func, ast.Attribute):
            return self._method(node)
        if not isinstance(node.func, ast.Name):
            raise CalcCompileError("bad call target")
        name = node.func.id
        if name in ELEMENTWISE:
            args = [self._expr(a) for a in node.args]
            return ELEMENTWISE[name](*args)
        if name in self.ctx.macros:
            # macro takes over the whole plan; only valid as outermost call
            raw_args = [self._macro_arg(a) for a in node.args]
            self.plan.macro = self.ctx.macros[name](self.ctx, *raw_args)
            return F.lit(None)
        raise CalcCompileError(f"unknown function {name!r}")

    def _macro_arg(self, node):
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Subscript):
            return self._var_ref(node)
        if isinstance(node, (ast.UnaryOp, ast.BinOp)):
            return self._expr(node)
        raise CalcCompileError("macro args must be literals or var refs")

    def _method(self, node: ast.Call) -> Column:
        meth = node.func.attr
        target = self._expr(node.func.value)
        if meth == "isel":
            # positional selection on a dimension → frame filter
            for kw in node.keywords:
                if kw.arg is None:
                    raise CalcCompileError("isel needs dim=index kwargs")
                idx = self._expr(kw.value)
                self.plan.filters.append(F.col(kw.arg) == idx)
            return target
        if meth == "sel":
            for kw in node.keywords:
                self.plan.filters.append(F.col(kw.arg) == self._expr(kw.value))
            return target
        if meth == "where":
            cond = self._expr(node.args[0])
            # drop=True (sithick, calculations.py:720-737): remove the
            # rows entirely instead of nulling the value
            for kw in node.keywords:
                if kw.arg == "drop" and isinstance(kw.value, ast.Constant) \
                        and kw.value.value is True:
                    self.plan.filters.append(cond)
                    return target
            other = self._expr(node.args[1]) if len(node.args) > 1 else F.lit(None)
            return F.when(cond, target).otherwise(other)
        if meth == "fillna":
            return F.coalesce(target, self._expr(node.args[0]))
        if meth == "astype":
            t = node.args[0]
            tname = t.id if isinstance(t, ast.Name) else t.value
            return target.cast(_CASTS.get(str(tname), str(tname)))
        if meth in _REDUCERS:
            if self.plan.reducer is not None:
                raise CalcCompileError("only one reduction per calc supported")
            dims = []
            for kw in node.keywords:
                if kw.arg == "dim":
                    v = kw.value
                    if isinstance(v, ast.Constant):
                        dims = [v.value]
                    elif isinstance(v, (ast.List, ast.Tuple)):
                        dims = [e.value for e in v.elts]
            if not dims:
                dims = list(self.ctx.dim_cols)      # total reduction
            self.plan.reduce_dims = dims
            self.plan.reducer = meth
            self.plan.pre_agg = target
            return self._agg_placeholder()
        raise CalcCompileError(f"unsupported method .{meth}()")

    def _agg_placeholder(self) -> Column:
        return F.col("__agg__")


def compile_calc(calc: str, ctx: CalcContext | None = None) -> CalcPlan:
    """Compile a calc string into a :class:`CalcPlan`.

    Reductions compile in two parts: the reduction target becomes the
    pre-aggregation value; the full expression with the reduction node
    replaced by ``__agg__`` becomes the post-aggregation scalar (so
    ``var[0].sum(dim='lev') * 2 + 1`` works).
    """
    ctx = ctx or CalcContext()
    comp = _Compiler(ctx)
    return comp.compile(calc)
