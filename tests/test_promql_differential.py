"""Differential testing: the Spark PromQL engine vs an independent
pure-Python evaluation model on randomized series and expressions.

The model implements the instant-vector core (selector lookback,
binary-op vector matching, aggregation grouping, scalar arithmetic)
directly from the upstream semantics — dict-based, no Spark — so a bug
in the DataFrame formulation (join shape, NULL handling, NaN ordering,
name dropping) surfaces as a divergence.  The temporal family is
covered by the existing Python-port tests (test_promql_functions.py)
and the promqltest corpus; this file hammers the matching/grouping
layer where the combinatorics live.
"""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from parquet_common_spark.promqltest import parse_promql
from parquet_common_spark.promqltest.promqlparse import (
    Aggregate,
    Binary,
    Call,
    NumberLiteral,
    Unary,
    VectorSelector,
)

LOOKBACK_MS = 5 * 60 * 1000


# ------------------------------------------------------------- the model


def _sel_matches(sel: VectorSelector, labels: dict) -> bool:
    import re

    if sel.name is not None and labels.get("__name__") != sel.name:
        return False
    for m in sel.matchers:
        v = labels.get(m.name, "")
        if m.op == "=" and v != m.value:
            return False
        if m.op == "!=" and v == m.value:
            return False
        if m.op == "=~" and not re.fullmatch(m.value, v):
            return False
        if m.op == "!~" and re.fullmatch(m.value, v):
            return False
    return True


_CMPS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
}


def _apply(op, a, b):
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        if b == 0:
            if math.isnan(a) or a == 0:
                return math.nan
            return math.inf if (a > 0) else -math.inf
        return a / b
    # %, ^, atan2 follow Go math.Mod / math.Pow / math.Atan2 — all three
    # are the platform IEEE-754 semantics numpy exposes without raising
    import numpy as np

    with np.errstate(all="ignore"):
        if op == "%":
            return float(np.fmod(np.float64(a), np.float64(b)))
        if op == "^":
            return float(np.float64(a) ** np.float64(b))
        if op == "atan2":
            return float(np.arctan2(np.float64(a), np.float64(b)))
    raise AssertionError(op)


def _cmp(op, a, b):
    """IEEE comparisons: NaN compares false except !=."""
    if math.isnan(a) or math.isnan(b):
        return op == "!="
    return _CMPS[op](a, b)


def _go_min(a, b):
    """Go math.Min: NaN propagates (Python's min picks by order)."""
    if math.isnan(a) or math.isnan(b):
        return math.nan
    return min(a, b)


def _go_max(a, b):
    if math.isnan(a) or math.isnan(b):
        return math.nan
    return max(a, b)


def _dropname(vec: dict) -> dict:
    """Drop __name__ from every key; a resulting labelset collision is
    an error, mirroring the engine's 'vector cannot contain metrics
    with the same labelset' materialization check."""
    out = {}
    for k, v in vec.items():
        nk = frozenset(kv for kv in k if kv[0] != "__name__")
        if nk in out:
            raise ValueError("duplicate output labelset after name drop")
        out[nk] = v
    return out


def _lit(node) -> float:
    if isinstance(node, NumberLiteral):
        return float(node.value)
    if isinstance(node, Unary) and isinstance(node.expr, NumberLiteral):
        v = float(node.expr.value)
        return -v if node.op == "-" else v
    raise ValueError("expected a number literal parameter")


def _model_call(node, series, t_ms):
    import numpy as np

    # element-wise math wrappers: numpy forms follow Go's math package
    # (NaN flows through, log(0) = -Inf, domain errors = NaN, no raise)
    def npf(f):
        def g(v):
            with np.errstate(all="ignore"):
                return float(f(np.float64(v)))
        return g

    fns = {
        "abs": abs,
        "ceil": npf(np.ceil),
        "floor": npf(np.floor),
        "sgn": lambda v: math.nan if math.isnan(v) else float((v > 0) - (v < 0)),
        "exp": npf(np.exp),
        "sqrt": npf(np.sqrt),
        "ln": npf(np.log),
        "log2": npf(np.log2),
        "log10": npf(np.log10),
        "sin": npf(np.sin),
        "cos": npf(np.cos),
        "tan": npf(np.tan),
        "asin": npf(np.arcsin),
        "acos": npf(np.arccos),
        "atan": npf(np.arctan),
        "sinh": npf(np.sinh),
        "cosh": npf(np.cosh),
        "tanh": npf(np.tanh),
        "asinh": npf(np.arcsinh),
        "acosh": npf(np.arccosh),
        "atanh": npf(np.arctanh),
        "deg": lambda v: v * (180.0 / math.pi),
        "rad": lambda v: v * (math.pi / 180.0),
    }
    if node.func in fns:
        f = fns[node.func]
        kind, vec = model_eval(node.args[0], series, t_ms)
        if kind != "vector":
            # upstream type-checks: these take an instant vector, a
            # scalar argument is an error
            raise ValueError(f"{node.func} over a scalar")
        return ("vector", _dropname({k: float(f(v)) for k, v in vec.items()}))
    if node.func == "absent":
        kind, vec = model_eval(node.args[0], series, t_ms)
        if kind != "vector":
            raise ValueError("absent() takes an instant vector")
        if vec:
            return ("vector", {})
        labels = {}
        arg = node.args[0]
        if isinstance(arg, VectorSelector):
            # createLabelsForAbsentFunction: = matchers with non-empty
            # values, excluding __name__; a label matched twice with
            # different values contributes nothing
            seen = {}
            for m in arg.matchers:
                if m.name == "__name__" or m.op != "=" or m.value == "":
                    continue
                seen[m.name] = m.value if m.name not in seen else None
            labels = {n: v for n, v in seen.items() if v is not None}
        return ("vector", {frozenset(labels.items()): 1.0})
    if node.func == "vector":
        kind, v = model_eval(node.args[0], series, t_ms)
        if kind != "scalar":
            raise ValueError("vector() takes a scalar")
        return ("vector", {frozenset(): v})
    if node.func == "scalar":
        kind, vec = model_eval(node.args[0], series, t_ms)
        if kind != "vector":
            raise ValueError("scalar() takes an instant vector")
        vals = list(vec.values())
        return ("scalar", vals[0] if len(vals) == 1 else math.nan)
    if node.func == "timestamp":
        # grammar only generates timestamp(<selector>): the value is the
        # RAW sample timestamp in seconds (not the eval time) — the
        # upstream special case worth probing
        sel = node.args[0]
        assert isinstance(sel, VectorSelector)
        base = sel.at_ms if sel.at_ms is not None else t_ms
        eff = base - (sel.offset_ms or 0)
        out = {}
        for labels, samples in series:
            if not _sel_matches(sel, labels):
                continue
            best = None
            for ts, val in samples:
                if eff - LOOKBACK_MS < ts <= eff:
                    if best is None or ts > best[0]:
                        best = (ts, val)
            if best is not None:
                out[frozenset(labels.items())] = best[0] / 1000.0
        return ("vector", _dropname(out))
    if node.func in ("clamp", "clamp_min", "clamp_max"):
        kind, vec = model_eval(node.args[0], series, t_ms)
        if kind != "vector":
            raise ValueError(f"{node.func} over a scalar")
        if node.func == "clamp":
            lo, hi = _lit(node.args[1]), _lit(node.args[2])
            # Go: NaN bounds never trigger the min>max empty rule but
            # propagate NaN into every element (math.Max/Min semantics)
            if not (math.isnan(lo) or math.isnan(hi)) and lo > hi:
                return ("vector", {})
            return ("vector", _dropname(
                {k: _go_max(lo, _go_min(hi, v)) for k, v in vec.items()}
            ))
        b = _lit(node.args[1])
        f = _go_max if node.func == "clamp_min" else _go_min
        return ("vector", _dropname({k: f(b, v) for k, v in vec.items()}))
    if node.func == "round":
        kind, vec = model_eval(node.args[0], series, t_ms)
        if kind != "vector":
            raise ValueError("round over a scalar")
        to = _lit(node.args[1]) if len(node.args) > 1 else 1.0
        import numpy as np

        def r(v):
            # Go funcRound: floor(v/to + 0.5) * to; to == 0 -> v/0 = ±Inf,
            # floor(±Inf) * 0 = NaN
            if to == 0 or math.isnan(to):
                return math.nan
            with np.errstate(all="ignore"):
                return float(np.floor(np.float64(v) / to + 0.5) * to)
        return ("vector", _dropname({k: r(v) for k, v in vec.items()}))
    raise AssertionError(node.func)


def model_eval(node, series, t_ms):
    """-> dict[frozenset(labels.items()) -> value] or ('scalar', v)."""
    if isinstance(node, NumberLiteral):
        return ("scalar", node.value)
    if isinstance(node, Unary):
        r = model_eval(node.expr, series, t_ms)
        if r[0] == "scalar":
            return ("scalar", -r[1])
        return ("vector", _dropname({k: -v for k, v in r[1].items()}))
    if isinstance(node, Call):
        return _model_call(node, series, t_ms)
    if isinstance(node, VectorSelector):
        out = {}
        base = node.at_ms if node.at_ms is not None else t_ms
        eff = base - (node.offset_ms or 0)
        for labels, samples in series:
            if not _sel_matches(node, labels):
                continue
            best = None
            for ts, val in samples:
                if eff - LOOKBACK_MS < ts <= eff:
                    if best is None or ts > best[0]:
                        best = (ts, val)
            if best is not None:
                out[frozenset(labels.items())] = best[1]
        return ("vector", out)
    if isinstance(node, Aggregate):
        kind, vec = model_eval(node.expr, series, t_ms)
        if kind != "vector":
            raise ValueError("aggregation over a scalar")
        groups: dict = {}
        for key, val in vec.items():
            labels = dict(key)
            if node.by is not None:
                gl = {n: labels[n] for n in node.by if n in labels}
            elif node.without is not None:
                drop = set(node.without) | {"__name__"}
                gl = {n: v for n, v in labels.items() if n not in drop}
            else:
                gl = {}
            groups.setdefault(frozenset(gl.items()), []).append(val)
        if node.op in ("topk", "bottomk"):
            # generated only with k >= series count, so the result is
            # the full input vector (order-free set comparison)
            return ("vector", dict(vec))
        if node.op == "count_values":
            # grammar wraps the argument in floor(), so every value is
            # integral or NaN — the two cases where Go strconv, Java
            # Double.toString (the engine's cast) and this model agree
            dst = node.param.value
            out = {}
            for gk, vals in groups.items():
                for v in vals:
                    fmt = "NaN" if math.isnan(v) else str(int(v))
                    nk = frozenset({**dict(gk), dst: fmt}.items())
                    out[nk] = out.get(nk, 0.0) + 1.0
            return ("vector", out)
        agg = {}
        for gk, vals in groups.items():
            if node.op == "sum":
                agg[gk] = math.fsum(vals)
            elif node.op == "min":
                finite = [v for v in vals if not math.isnan(v)]
                agg[gk] = min(finite) if finite else math.nan
            elif node.op == "max":
                finite = [v for v in vals if not math.isnan(v)]
                agg[gk] = max(finite) if finite else math.nan
            elif node.op == "count":
                agg[gk] = float(len(vals))
            elif node.op == "avg":
                agg[gk] = math.fsum(vals) / len(vals)
            elif node.op == "group":
                agg[gk] = 1.0
            elif node.op in ("stddev", "stdvar"):
                # population variance; NaN inputs propagate (upstream
                # computes the running mean over every sample)
                mean = math.fsum(vals) / len(vals)
                var = math.fsum((v - mean) ** 2 for v in vals) / len(vals)
                agg[gk] = var if node.op == "stdvar" else math.sqrt(var)
            elif node.op == "quantile":
                p = node.param
                phi = -p.expr.value if isinstance(p, Unary) else p.value
                if math.isnan(phi):
                    agg[gk] = math.nan
                elif phi < 0:
                    agg[gk] = -math.inf
                elif phi > 1:
                    agg[gk] = math.inf
                else:
                    # Go slices.Sort: NaN sorts before every number
                    svals = sorted(
                        vals, key=lambda v: (not math.isnan(v), v)
                    )
                    n = len(svals)
                    rank = phi * (n - 1)
                    lo = int(math.floor(rank))
                    hi = min(lo + 1, n - 1)
                    w = rank - lo
                    agg[gk] = svals[lo] * (1 - w) + svals[hi] * w
            else:
                raise AssertionError(node.op)
        return ("vector", agg)
    if isinstance(node, Binary):
        lk, lv = model_eval(node.lhs, series, t_ms)
        rk, rv = model_eval(node.rhs, series, t_ms)
        is_cmp = node.op in _CMPS
        is_set = node.op in ("and", "or", "unless")
        if is_set:
            if lk != "vector" or rk != "vector":
                raise ValueError("set operator on scalar")

            def setsig(key):
                labels = dict(key)
                if node.on is not None:
                    return frozenset((n, labels.get(n, "")) for n in node.on)
                drop = set(node.ignoring or []) | {"__name__"}
                names = (
                    {n for k in lv for n, _ in k} | {n for k in rv for n, _ in k}
                ) - drop
                return frozenset((n, labels.get(n, "")) for n in names)

            rsigs = {setsig(k) for k in rv}
            lsigs_set = {setsig(k) for k in lv}
            if node.op == "and":
                return ("vector", {k: v for k, v in lv.items() if setsig(k) in rsigs})
            if node.op == "unless":
                return (
                    "vector",
                    {k: v for k, v in lv.items() if setsig(k) not in rsigs},
                )
            out = dict(lv)
            for k, v in rv.items():
                if setsig(k) not in lsigs_set:
                    out[k] = v
            return ("vector", out)
        if getattr(node, "group", "one") != "one":
            if lk != "vector" or rk != "vector":
                raise ValueError("vector matching with a scalar operand")

            def m1sig(key):
                labels = dict(key)
                if node.on is not None:
                    return frozenset((n, labels.get(n, "")) for n in node.on)
                drop = set(node.ignoring or []) | {"__name__"}
                names = (
                    {n for k in lv for n, _ in k} | {n for k in rv for n, _ in k}
                ) - drop
                return frozenset((n, labels.get(n, "")) for n in names)

            many, one = (lv, rv) if node.group == "left" else (rv, lv)
            one_index = {}
            for k, v in one.items():
                s = m1sig(k)
                if s in one_index:
                    raise ValueError("duplicate series on the one side")
                one_index[s] = (k, v)
            out = {}
            for k, v in many.items():
                s = m1sig(k)
                if s not in one_index:
                    continue
                ok, ov = one_index[s]
                vl, vr = (v, ov) if node.group == "left" else (ov, v)
                if is_cmp and not node.bool_modifier:
                    if not _cmp(node.op, vl, vr):
                        continue
                    # filtering keeps the MANY side's sample (value and
                    # labels incl. __name__) — the engine's documented
                    # stance (promql_vec.vector_binop); upstream source
                    # is not inspectable offline for the group_right
                    # corner, so the model pins the engine contract
                    val = v
                    labels = dict(k)
                elif is_cmp:
                    val = 1.0 if _cmp(node.op, vl, vr) else 0.0
                    labels = {n: x for n, x in dict(k).items() if n != "__name__"}
                else:
                    val = _apply(node.op, vl, vr)
                    labels = {n: x for n, x in dict(k).items() if n != "__name__"}
                one_labels = dict(ok)
                for c in node.carry or []:
                    cv = one_labels.get(c, "")
                    if cv != "":
                        labels[c] = cv
                    else:
                        # carried label absent on the one side DELETES a
                        # same-named many-side label (resultMetric)
                        labels.pop(c, None)
                nk = frozenset(labels.items())
                if nk in out:
                    raise ValueError("duplicate output labelset in many-to-one")
                out[nk] = val
            return ("vector", out)
        if lk == "scalar" and rk == "scalar":
            if is_cmp:
                if not node.bool_modifier:
                    raise ValueError("scalar comparison without bool")
                return ("scalar", 1.0 if _cmp(node.op, lv, rv) else 0.0)
            return ("scalar", _apply(node.op, lv, rv))
        if lk == "scalar" or rk == "scalar":
            vec, sc, left = (rv, lv, False) if lk == "scalar" else (lv, rv, True)
            out = {}
            for key, val in vec.items():
                a, b = (val, sc) if left else (sc, val)
                if is_cmp:
                    if node.bool_modifier:
                        nk = frozenset(kv for kv in key if kv[0] != "__name__")
                        if nk in out:
                            raise ValueError("duplicate output labelset")
                        out[nk] = 1.0 if _cmp(node.op, a, b) else 0.0
                    elif _cmp(node.op, a, b):
                        out[key] = val  # filtering keeps the vector element
                else:
                    nk = frozenset(kv for kv in key if kv[0] != "__name__")
                    if nk in out:
                        raise ValueError("duplicate output labelset")
                    out[nk] = _apply(node.op, a, b)
            return ("vector", out)
        # vector/vector: upstream signature = all labels except __name__,
        # minus ignoring / restricted to on
        def sig(key):
            labels = dict(key)
            if node.on is not None:
                return frozenset(
                    (n, labels.get(n, "")) for n in node.on
                )
            drop = set(node.ignoring or []) | {"__name__"}
            names = {n for n, _ in key} | {
                n for rkey in rv for n, _ in rkey
            } | {n for lkey in lv for n, _ in lkey}
            return frozenset(
                (n, labels.get(n, "")) for n in names if n not in drop
            )

        rindex = {}
        for key, val in rv.items():
            s = sig(key)
            if s in rindex:
                raise ValueError("duplicate series on the one side")
            rindex[s] = val
        # upstream errors on duplicate LEFT signatures only when two
        # same-signature samples are matched AND emitted (engine.go
        # inserts into matchedSigs after the keep check)
        emitted: set = set()
        out = {}
        for key, val in lv.items():
            s = sig(key)
            if s not in rindex:
                continue
            if is_cmp and not node.bool_modifier:
                # filtering comparison keeps the left element untouched
                if _cmp(node.op, val, rindex[s]):
                    if s in emitted:
                        raise ValueError("duplicate matched series on the left")
                    emitted.add(s)
                    out[key] = val
                continue
            if s in emitted:
                raise ValueError("duplicate matched series on the left")
            emitted.add(s)
            if node.on is not None:
                # output keeps only the on() labels PRESENT on the left
                # sample (resultMetric does not materialize absents)
                labels = dict(key)
                nk = frozenset(
                    (n, labels[n]) for n in node.on if n in labels
                )
            else:
                drop = set(node.ignoring or []) | {"__name__"}
                nk = frozenset(kv for kv in key if kv[0] not in drop)
            if is_cmp:
                out[nk] = 1.0 if _cmp(node.op, val, rindex[s]) else 0.0
            else:
                out[nk] = _apply(node.op, val, rindex[s])
        return ("vector", out)
    raise AssertionError(type(node))


# -------------------------------------------------------- the strategies

LABELS = st.fixed_dictionaries(
    {},
    optional={
        "job": st.sampled_from(["api", "web"]),
        "instance": st.sampled_from(["0", "1"]),
    },
)
NAMES = ["m_one", "m_two"]


@st.composite
def series_sets(draw):
    n = draw(st.integers(1, 4))
    out, seen = [], set()
    for _ in range(n):
        labels = {"__name__": draw(st.sampled_from(NAMES)), **draw(LABELS)}
        key = frozenset(labels.items())
        if key in seen:
            continue
        seen.add(key)
        vals = draw(
            st.lists(
                st.one_of(
                    st.floats(
                        min_value=-100, max_value=100, allow_nan=False, width=32
                    ),
                    st.just(math.nan),
                ),
                min_size=1,
                max_size=4,
            )
        )
        out.append((labels, [(i * 300_000, v) for i, v in enumerate(vals)]))
    return out


@st.composite
def exprs(draw, depth=2):
    choice = draw(
        st.sampled_from(
            ["sel", "num"]
            if depth == 0
            else ["sel", "sel", "agg", "bin", "bin_group", "neg", "num",
                  "fn", "fn2", "convert"]
        )
    )
    if choice == "num":
        return str(draw(st.integers(-5, 5)))
    if choice == "sel":
        name = draw(st.sampled_from(NAMES))
        ms = []
        if draw(st.booleans()):
            op = draw(st.sampled_from(["=", "!=", "=~", "!~"]))
            if op in ("=~", "!~"):
                val = draw(st.sampled_from(["api|web", "a.*", "web", ".+", ".*"]))
            else:
                val = draw(st.sampled_from(["api", "web", ""]))
            ms.append(f'job{op}"{val}"')
        sel = name + ("{" + ",".join(ms) + "}" if ms else "")
        off = draw(st.sampled_from(["", "", "", " offset 5m", " offset 10m"]))
        at = draw(st.sampled_from(["", "", "", " @ 600", " @ 300", " @ 0"]))
        return sel + off + at
    if choice == "neg":
        return f"-({draw(exprs(depth=depth - 1))})"
    if choice == "fn":
        f = draw(st.sampled_from(
            ["abs", "ceil", "floor", "sgn", "exp", "sqrt",
             "ln", "log2", "log10", "sin", "cos", "tan", "asin", "acos",
             "atan", "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
             "deg", "rad"]
        ))
        return f"{f}({draw(exprs(depth=depth - 1))})"
    if choice == "fn2":
        f = draw(st.sampled_from(["clamp", "clamp_min", "clamp_max", "round"]))
        arg = draw(exprs(depth=depth - 1))
        bounds = st.sampled_from(["0", "1", "-2", "2.5", "-0.5", "NaN"])
        if f == "clamp":
            return f"clamp({arg}, {draw(bounds)}, {draw(bounds)})"
        if f == "round":
            to = draw(st.sampled_from(["", ", 1", ", 0.5", ", 3", ", 0", ", -2"]))
            return f"round({arg}{to})"
        return f"{f}({arg}, {draw(bounds)})"
    if choice == "convert":
        k = draw(st.sampled_from(["scalar", "vector", "timestamp", "absent"]))
        if k == "absent":
            name = draw(st.sampled_from([*NAMES, "m_gone"]))
            ms = draw(st.sampled_from(
                ["", '{job="api"}', '{job="nope"}', '{job=""}', '{job!="api"}']
            ))
            return f"absent({name}{ms})"
        if k == "scalar":
            return f"scalar({draw(exprs(depth=depth - 1))})"
        if k == "vector":
            return f"vector({draw(st.sampled_from(['0', '3', '-1.5']))})"
        # timestamp over a raw selector: raw sample ts, not eval time
        name = draw(st.sampled_from(NAMES))
        off = draw(st.sampled_from(["", " offset 5m"]))
        return f"timestamp({name}{off})"
    if choice == "agg":
        op = draw(
            st.sampled_from(
                ["sum", "min", "max", "count", "avg", "topk", "bottomk",
                 "group", "stddev", "stdvar", "quantile", "count_values"]
            )
        )
        if op in ("topk", "bottomk"):
            # k=9 always exceeds the 4-series universe: result == input,
            # sidestepping upstream's unspecified tie order
            return f"{op}(9, {draw(exprs(depth=depth - 1))})"
        grouping = draw(st.sampled_from(["", " by (job)", " without (instance)"]))
        if op == "count_values":
            # floor() keeps every value integral-or-NaN so the label
            # formatting agrees across Go/Java/Python (see model)
            return f'count_values{grouping} ("vl", floor({draw(exprs(depth=depth - 1))}))'
        if op == "quantile":
            phi = draw(st.sampled_from(["0", "0.25", "0.5", "1", "-0.5", "1.5"]))
            return f"{op}{grouping} ({phi}, {draw(exprs(depth=depth - 1))})"
        return f"{op}{grouping} ({draw(exprs(depth=depth - 1))})"
    if choice == "bin_group":
        # many-to-one / one-to-many vector matching: both operands are
        # raw selectors (guaranteed vectors — upstream type-checks group
        # modifiers against scalar operands at parse time)
        bop = draw(st.sampled_from(["+", "-", "*", "/", ">", "<=", "=="]))
        bool_mod = (
            draw(st.sampled_from(["", " bool"]))
            if bop in (">", "<=", "==")
            else ""
        )
        matching = draw(st.sampled_from(["on(job)", "ignoring(instance)"]))
        side = draw(st.sampled_from(["group_left", "group_right"]))
        carry = draw(st.sampled_from(["", "", "(instance)", "(job2)"]))
        if matching == "on(job)" and carry == "(job)":
            carry = ""  # upstream forbids carrying an on() label

        def m1sel(draw):
            name = draw(st.sampled_from(NAMES))
            ms = []
            if draw(st.booleans()):
                op = draw(st.sampled_from(["=", "!="]))
                val = draw(st.sampled_from(["api", "web", ""]))
                ms.append(f'job{op}"{val}"')
            return name + ("{" + ",".join(ms) + "}" if ms else "")

        lhs = m1sel(draw)
        rhs = m1sel(draw)
        # NB: the rhs stays unparenthesized — upstream parses
        # `group_left (x)` as the modifier's label list (same gotcha)
        return f"({lhs}) {bop}{bool_mod} {matching} {side}{carry} {rhs}"
    # bin
    bop = draw(
        st.sampled_from(
            ["+", "-", "*", "/", "%", "^", "atan2", ">", "<", ">=", "<=",
             "==", "!=", "and", "or", "unless"]
        )
    )
    if bop in ("and", "or", "unless"):
        matching = draw(st.sampled_from(["", " on(job) ", " ignoring(instance) "]))
        bool_mod = ""
    elif bop in ("+", "-", "*", "/", "%", "^", "atan2"):
        matching = draw(st.sampled_from(["", " on(job) ", " ignoring(instance) "]))
        bool_mod = ""
    else:
        matching = draw(st.sampled_from(["", " on(job) ", " ignoring(instance) "]))
        bool_mod = draw(st.sampled_from(["", " bool"]))
    lhs = draw(exprs(depth=depth - 1))
    rhs = draw(exprs(depth=depth - 1))
    return f"({lhs}) {bop}{bool_mod}{matching}({rhs})"


def _close(a, b):
    if a is None or b is None:
        return a is b
    if math.isnan(a) and math.isnan(b):
        return True
    if a == b:
        return True
    if math.isinf(a) or math.isinf(b):
        return False
    return abs(a - b) <= 1e-9 * max(abs(a), abs(b), 1.0)


_EXAMPLES = int(os.environ.get("PROMQL_DIFF_EXAMPLES", "40"))
_STORAGE_EXAMPLES = int(os.environ.get("PROMQL_DIFF_STORAGE_EXAMPLES", "10"))

@pytest.mark.parametrize("t_ms", [15 * 60 * 1000])
@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_engine_matches_model(spark, t_ms, data):
    from parquet_common_spark.promqltest import PromQLEngine
    from parquet_common_spark.promqltest.scriptparse import LoadCmd, Sample

    series = data.draw(series_sets())
    expr_text = data.draw(exprs())
    ast_node = parse_promql(expr_text)

    try:
        want = model_eval(
            ast_node, [(l, s) for l, s in series], t_ms
        )
    except ValueError:
        want = ("error", None)

    engine = PromQLEngine(spark)
    engine.clear()
    engine.load(
        LoadCmd(
            300_000,
            [
                (labels, [Sample(ts, v) for ts, v in samples])
                for labels, samples in series
            ],
        )
    )
    try:
        kind, got = engine.eval_instant(ast_node, t_ms)
    except Exception:
        assert want[0] == "error", (
            f"engine raised but model succeeded for {expr_text!r}\n"
            f"series={series}\nmodel={want}"
        )
        return
    assert want[0] != "error", (
        f"model raised (duplicate one-side series) but engine succeeded "
        f"for {expr_text!r}\nseries={series}\nengine={got}"
    )

    if kind == "scalar":
        assert want[0] == "scalar"
        assert _close(got[t_ms], want[1]), (expr_text, got, want)
        return
    assert want[0] == "vector", (expr_text, want, got)
    got_map = {
        frozenset(labels.items()): vals.get(t_ms) for labels, vals in got
    }
    got_map = {k: v for k, v in got_map.items() if v is not None}
    assert set(got_map) == set(want[1]), (
        f"label sets diverge for {expr_text!r}\nseries={series}\n"
        f"engine={got_map}\nmodel={want[1]}"
    )
    for k, v in want[1].items():
        assert _close(got_map[k], v), (
            f"value diverges for {expr_text!r} at {dict(k)}: "
            f"engine={got_map[k]} model={v}\nseries={series}"
        )


# ----------------------- range-function differential (extrapolation)


def _model_range(fn, samples, t_ms, range_ms):
    """samples: [(ts_ms, v)] for ONE series; -> value or None (dropped).
    Mirrors promql/functions.go for the eval-at-instant window
    (T-r, T]."""
    from tests.test_promql_functions import py_extrapolated

    win = [(ts, v) for ts, v in samples if t_ms - range_ms < ts <= t_ms]
    if not win:
        return None
    vals = [v for _, v in win]
    if fn in ("rate", "increase", "delta"):
        sec = [(ts / 1000.0, v) for ts, v in win]
        return py_extrapolated(
            sec,
            (t_ms - range_ms) / 1000.0,
            t_ms / 1000.0,
            is_counter=fn != "delta",
            is_rate=fn == "rate",
        )
    if fn == "avg_over_time":
        return math.fsum(vals) / len(vals)
    if fn == "sum_over_time":
        return math.fsum(vals)
    if fn == "min_over_time":
        finite = [v for v in vals if not math.isnan(v)]
        return min(finite) if finite else math.nan
    if fn == "max_over_time":
        finite = [v for v in vals if not math.isnan(v)]
        return max(finite) if finite else math.nan
    if fn == "count_over_time":
        return float(len(vals))
    if fn == "last_over_time":
        return win[-1][1]
    if fn == "changes":
        # upstream funcChanges: NaN -> NaN is explicitly NOT a change
        return float(
            sum(
                1
                for a, b in zip(vals, vals[1:])
                if a != b and not (math.isnan(a) and math.isnan(b))
            )
        )
    if fn == "resets":
        return float(sum(1 for a, b in zip(vals, vals[1:]) if b < a))
    if fn == "idelta":
        if len(win) < 2:
            return None
        return win[-1][1] - win[-2][1]
    if fn == "irate":
        if len(win) < 2 or win[-1][0] <= win[-2][0]:
            return None
        num = win[-1][1] if win[-1][1] < win[-2][1] else win[-1][1] - win[-2][1]
        return num / ((win[-1][0] - win[-2][0]) / 1000.0)
    if fn == "ts_of_last_over_time":
        return win[-1][0] / 1000.0
    if fn in ("ts_of_min_over_time", "ts_of_max_over_time"):
        # upstream loop: `<=`/`>=` (last occurrence wins), a NaN current
        # best is always replaced — NaN never wins unless every sample
        # is NaN (then the last sample's timestamp)
        best_v, best_t = win[0][1], win[0][0]
        for ts, v in win[1:]:
            if fn == "ts_of_min_over_time":
                take = v <= best_v
            else:
                take = v >= best_v
            if take or math.isnan(best_v):
                best_v, best_t = v, ts
        return best_t / 1000.0
    if fn == "deriv":
        if len(win) < 2 or win[-1][0] == win[0][0]:
            return None
        xs = [(ts - t_ms) / 1000.0 for ts, _ in win]
        n = len(win)
        sx, sy = math.fsum(xs), math.fsum(vals)
        sxy = math.fsum(x * y for x, y in zip(xs, vals))
        sx2 = math.fsum(x * x for x in xs)
        return (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    if fn == "first_over_time":
        return win[0][1]
    if fn == "present_over_time":
        return 1.0
    if fn in ("stddev_over_time", "stdvar_over_time"):
        # upstream aggregates with Welford (funcStddevOverTime); the
        # running form matters for Inf/NaN propagation, so mirror it
        mean = aux = 0.0
        for i, v in enumerate(vals, start=1):
            delta = v - mean
            mean += delta / i
            aux += delta * (v - mean)
        var = aux / len(vals)
        return var if fn == "stdvar_over_time" else math.sqrt(var)
    if fn == "mad_over_time":
        med = _go_quantile(0.5, vals)
        return _go_quantile(0.5, [abs(v - med) for v in vals])
    if fn.startswith("quantile_over_time"):
        phi = float(fn.split(":")[1])
        return _go_quantile(phi, vals)
    raise AssertionError(fn)


def _go_quantile(phi: float, vals: list[float]) -> float:
    """promql/quantile.go quantile(): NaN phi -> NaN, out-of-range ->
    +-Inf, else linear interpolation over Go's slices.Sort order (NaN
    sorts before every number)."""
    if math.isnan(phi):
        return math.nan
    if phi < 0:
        return -math.inf
    if phi > 1:
        return math.inf
    s = sorted(vals, key=lambda v: (not math.isnan(v), v))
    n = len(s)
    rank = phi * (n - 1)
    lo = int(math.floor(rank))
    hi = min(lo + 1, n - 1)
    w = rank - lo
    return s[lo] * (1 - w) + s[hi] * w


_RANGE_FNS = [
    "rate", "increase", "delta", "avg_over_time", "sum_over_time",
    "min_over_time", "max_over_time", "count_over_time",
    "last_over_time", "changes", "resets", "idelta", "irate", "deriv",
    "ts_of_last_over_time", "ts_of_min_over_time", "ts_of_max_over_time",
    "first_over_time", "present_over_time",
    "stddev_over_time", "stdvar_over_time", "mad_over_time",
    # ":phi" suffix is stripped to quantile_over_time(phi, ...) below
    "quantile_over_time:0", "quantile_over_time:0.5",
    "quantile_over_time:0.9", "quantile_over_time:1.5",
]


@st.composite
def range_series(draw):
    """One series with irregular timestamps — gaps and boundary offsets
    are exactly where extrapolation branches live."""
    n = draw(st.integers(1, 8))
    ts = sorted(
        draw(
            st.lists(
                st.integers(0, 40).map(lambda k: k * 30_000),
                min_size=n,
                max_size=n,
                unique=True,
            )
        )
    )
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(min_value=0, max_value=1000, allow_nan=False, width=32),
                st.just(math.nan),
                st.just(math.inf),  # Inf-vs-NaN ordering edges (ts_of_*)
            ),
            min_size=n,
            max_size=n,
        )
    )
    return list(zip(ts, vals))


@settings(
    max_examples=max(60, _EXAMPLES),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_range_functions_match_model(spark, data):
    _range_case(spark, data, backed=False)


@settings(
    max_examples=_STORAGE_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_range_functions_match_model_parquet_backed(spark, data):
    """The same extrapolation/window differential with every load block
    written through convert() and read back — irregular timestamps and
    window-boundary samples exercise the storage layer's time pruning
    and sort exactly where the extrapolation branches live."""
    _range_case(spark, data, backed=True)


def _range_case(spark, data, backed):
    from parquet_common_spark.promqltest import PromQLEngine
    from parquet_common_spark.promqltest.scriptparse import LoadCmd, Sample

    samples = data.draw(range_series())
    fn = data.draw(st.sampled_from(_RANGE_FNS))
    range_ms = data.draw(st.sampled_from([300_000, 600_000, 900_000]))
    t_ms = data.draw(st.sampled_from([600_000, 900_000, 1_200_000]))

    want = _model_range(fn, samples, t_ms, range_ms)

    engine = PromQLEngine(spark, parquet_backed=backed)
    engine.clear()
    engine.load(
        LoadCmd(60_000, [({"__name__": "rsvc"}, [Sample(ts, v) for ts, v in samples])])
    )
    rng = f"{range_ms // 1000}s"
    if fn.startswith("quantile_over_time:"):
        phi = fn.split(":")[1]
        expr = f"quantile_over_time({phi}, rsvc[{rng}])"
    else:
        expr = f"{fn}(rsvc[{rng}])"
    kind, got = engine.eval_instant(expr, t_ms)
    assert kind == "vector"
    got_val = None
    for labels, vals in got:
        got_val = vals.get(t_ms)
    if want is None:
        assert got_val is None, (fn, samples, t_ms, range_ms, got_val)
    else:
        assert got_val is not None and _close(got_val, want), (
            f"{fn}[{rng}] at {t_ms}: engine={got_val} model={want}\n"
            f"samples={samples}"
        )


# ----------------------- subquery differential (aligned step grids)

_SUBQ_FNS = [
    "avg_over_time", "sum_over_time", "min_over_time", "max_over_time",
    "count_over_time", "last_over_time", "changes", "resets",
]


@settings(
    max_examples=max(40, _EXAMPLES // 2),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_subquery_matches_model(spark, data):
    """fn(m[R:res]) — the subquery's inner evals land on the absolute
    grid (t % res == 0, upstream: aligned to Unix time 0), each with
    its own lookback; the outer fn folds those per-step values."""
    from parquet_common_spark.promqltest import PromQLEngine
    from parquet_common_spark.promqltest.scriptparse import LoadCmd, Sample

    samples = data.draw(range_series())
    fn = data.draw(st.sampled_from(_SUBQ_FNS))
    range_ms = data.draw(st.sampled_from([300_000, 600_000]))
    res_ms = data.draw(st.sampled_from([60_000, 90_000, 150_000]))
    t_ms = data.draw(st.sampled_from([600_000, 750_000]))

    # model: instant-eval at aligned grid points inside (t-R, t]
    pts = [
        p
        for p in range(0, t_ms + 1, res_ms)
        if t_ms - range_ms < p <= t_ms
    ]
    win = []
    for p in pts:
        best = None
        for ts, v in samples:
            if p - LOOKBACK_MS < ts <= p:
                if best is None or ts > best[0]:
                    best = (ts, v)
        if best is not None:
            win.append((p, best[1]))
    want = _model_range(fn, win, t_ms, range_ms) if win else None
    # _model_range re-filters by (t-R, t] — pts already inside; it also
    # handles the fn fold identically to a plain range vector

    engine = PromQLEngine(spark)
    engine.clear()
    engine.load(
        LoadCmd(60_000, [({"__name__": "sq"}, [Sample(ts, v) for ts, v in samples])])
    )
    expr = f"{fn}(sq[{range_ms // 1000}s:{res_ms // 1000}s])"
    kind, got = engine.eval_instant(expr, t_ms)
    assert kind == "vector"
    got_val = None
    for labels, vals in got:
        got_val = vals.get(t_ms)
    if want is None:
        assert got_val is None, (expr, samples, got_val)
    else:
        assert got_val is not None and _close(got_val, want), (
            f"{expr} at {t_ms}: engine={got_val} model={want}\n"
            f"samples={samples}\ngrid={win}"
        )


# ------------------ storage-path differential (parquet-backed engine)


@pytest.mark.parametrize("t_ms", [15 * 60 * 1000])
@settings(
    max_examples=_STORAGE_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_engine_matches_model_parquet_backed(spark, t_ms, data):
    """The same engine-vs-model differential with the STORAGE layer in
    the loop: every load block is written through convert() to parquet
    shards and served back through the queryable (the reference's
    promqltest-over-storage acceptance shape).  Small example count —
    each draw costs a real shard write — randomized over the same
    series/expression grammars, so convert/read round-trip defects
    (label NULLs, timestamp precision, sort order) surface as
    divergences the in-memory probe cannot see."""
    from parquet_common_spark.promqltest import PromQLEngine
    from parquet_common_spark.promqltest.scriptparse import LoadCmd, Sample

    series = data.draw(series_sets())
    expr_text = data.draw(exprs())
    ast_node = parse_promql(expr_text)

    try:
        want = model_eval(ast_node, [(l, s) for l, s in series], t_ms)
    except ValueError:
        want = ("error", None)

    engine = PromQLEngine(spark, parquet_backed=True)
    engine.clear()
    engine.load(
        LoadCmd(
            300_000,
            [
                (labels, [Sample(ts, v) for ts, v in samples])
                for labels, samples in series
            ],
        )
    )
    try:
        kind, got = engine.eval_instant(ast_node, t_ms)
    except Exception:
        assert want[0] == "error", (
            f"storage-backed engine raised but model succeeded for "
            f"{expr_text!r}\nseries={series}\nmodel={want}"
        )
        return
    assert want[0] != "error", (expr_text, series, got)
    if kind == "scalar":
        assert want[0] == "scalar"
        assert _close(got[t_ms], want[1]), (expr_text, got, want)
        return
    assert want[0] == "vector", (expr_text, want, got)
    got_map = {
        frozenset(labels.items()): vals.get(t_ms) for labels, vals in got
    }
    got_map = {k: v for k, v in got_map.items() if v is not None}
    assert set(got_map) == set(want[1]), (expr_text, series, got_map, want[1])
    for k, v in want[1].items():
        assert _close(got_map[k], v), (expr_text, dict(k), got_map[k], v, series)
