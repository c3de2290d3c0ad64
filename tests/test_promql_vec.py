"""PromQL instant-vector layer vs an independent pure-Python model.

promqltest-style golden corpus: each scenario loads a small instant
vector, evaluates an expression through the Spark combinators
(functions/promql_vec.py) AND through a from-scratch Python model of the
upstream semantics (promql/engine.go aggregation + VectorBinop,
promql/functions.go label/math functions), and compares full result
sets (labels + values)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from parquet_common_spark.functions import promql_vec as V

# ------------------------------------------------------------- harness

VEC = [
    ({"job": "api", "instance": "a", "code": "200"}, 10.0),
    ({"job": "api", "instance": "a", "code": "500"}, 2.0),
    ({"job": "api", "instance": "b", "code": "200"}, 30.0),
    ({"job": "api", "instance": "b", "code": "500"}, 6.0),
    ({"job": "db", "instance": "a", "code": "200"}, 7.0),
    ({"job": "db", "instance": "c"}, 5.0),  # absent 'code' label
]


def to_df(spark, vec):
    names = sorted({k for labels, _ in vec for k in labels})
    rows = [tuple(labels.get(n) for n in names) + (v,) for labels, v in vec]
    schema = ", ".join([f"{n} string" for n in names] + ["value double"])
    return spark.createDataFrame(rows, schema)


def from_df(df):
    labels = [c for c in df.columns if c != "value"]
    out = []
    for r in df.collect():
        d = {c: r[c] for c in labels if r[c] is not None}
        out.append((d, r["value"]))
    return out


def canon(vec):
    def key(item):
        labels, v = item
        return (sorted(labels.items()), repr(v))

    return sorted(
        ((tuple(sorted(l.items())), v) for l, v in vec), key=lambda x: (x[0], repr(x[1]))
    )


def assert_same(spark_vec, model_vec):
    a, b = canon(spark_vec), canon(model_vec)
    assert len(a) == len(b), f"{a}\n!=\n{b}"
    for (la, va), (lb, vb) in zip(a, b):
        assert la == lb, f"{la} != {lb}"
        if isinstance(va, float) and isinstance(vb, float) and math.isnan(va):
            assert math.isnan(vb)
        else:
            assert va == pytest.approx(vb, rel=1e-12, abs=1e-12), f"{la}: {va} != {vb}"


# ------------------------------------------------------ python model


def m_group_keys(vec, by=None, without=None):
    def keys(labels):
        if by is not None:
            return tuple((k, labels[k]) for k in by if k in labels)
        drop = set(without or ())
        return tuple((k, v) for k, v in sorted(labels.items()) if k not in drop)

    return keys


def m_agg(vec, op, by=None, without=None, q=None):
    keys = m_group_keys(vec, by, without)
    groups: dict = {}
    for labels, v in vec:
        groups.setdefault(keys(labels), []).append(v)
    out = []
    for k, vals in groups.items():
        if op == "sum":
            r = sum(vals)
        elif op == "min":
            r = min(vals)
        elif op == "max":
            r = max(vals)
        elif op == "avg":
            r = sum(vals) / len(vals)
        elif op == "count":
            r = float(len(vals))
        elif op == "group":
            r = 1.0
        elif op == "stdvar":
            mean = sum(vals) / len(vals)
            r = sum((x - mean) ** 2 for x in vals) / len(vals)
        elif op == "stddev":
            mean = sum(vals) / len(vals)
            r = math.sqrt(sum((x - mean) ** 2 for x in vals) / len(vals))
        elif op == "quantile":
            s = sorted(vals)
            rank = q * (len(s) - 1)
            lo, hi = int(math.floor(rank)), int(math.ceil(rank))
            r = s[lo] + (s[hi] - s[lo]) * (rank - lo)
        else:
            raise AssertionError(op)
        out.append((dict(k), r))
    return out


def m_topk(vec, k, by=None, without=None, bottom=False):
    keys = m_group_keys(vec, by, without)
    groups: dict = {}
    for labels, v in vec:
        groups.setdefault(keys(labels), []).append((labels, v))
    out = []
    for _, items in groups.items():
        items.sort(
            key=lambda it: (
                (it[1] if bottom else -it[1]),
                sorted(it[0].items()),
            )
        )
        out.extend(items[:k])
    return out


def m_binop(left, right, op, on=None, ignoring=None, group="one", carry=None, bool_modifier=False):
    # upstream signature: on() labels if given, else ALL non-ignored
    # labels across BOTH sides (absent == None) — a one-side-only label
    # with a value makes the signatures differ, refusing the pair
    l_names = {k for l, _ in left for k in l}
    r_names = {k for l, _ in right for k in l}
    union_names = l_names | r_names

    def match_key(labels, _other_names=None):
        if on is not None:
            return tuple((k, labels.get(k)) for k in on)
        drop = set(ignoring or ())
        return tuple(
            (k, labels.get(k)) for k in sorted(union_names) if k not in drop
        )

    ops = {
        "+": lambda a, b: a + b, "-": lambda a, b: a - b, "*": lambda a, b: a * b,
        "/": lambda a, b: a / b, "%": lambda a, b: math.fmod(a, b),
        "^": lambda a, b: a ** b,
        "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
        ">": lambda a, b: a > b, "<": lambda a, b: a < b,
        ">=": lambda a, b: a >= b, "<=": lambda a, b: a <= b,
    }
    is_cmp = op in ("==", "!=", ">", "<", ">=", "<=")
    if group == "right":
        one_side, many_side = left, right
    else:
        one_side, many_side = right, left
    one_idx = {}
    for labels, v in one_side:
        one_idx[match_key(labels, l_names & r_names)] = (labels, v)
    out = []
    for labels, v in many_side:
        k = match_key(labels, l_names & r_names)
        if k not in one_idx:
            continue
        olabels, ov = one_idx[k]
        lv, rv = (ov, v) if group == "right" else (v, ov)
        r = ops[op](lv, rv)
        if group == "one":
            if is_cmp and not bool_modifier:
                keep = dict(labels)
            elif on is not None:
                keep = {kk: vv for kk, vv in dict(k).items() if vv is not None}
            else:
                drop = set(ignoring or ())
                keep = {kk: vv for kk, vv in labels.items() if kk not in drop}
        else:
            keep = dict(labels)
            for c in carry or []:
                if c in olabels:
                    keep[c] = olabels[c]
        if is_cmp:
            if bool_modifier:
                out.append((keep, 1.0 if r else 0.0))
            elif r:
                out.append((keep, v))
        else:
            out.append((keep, float(r)))
    return out


def m_go_expand(template, m):
    """Go regexp.Expand semantics: $$ literal, $name/${name} with name =
    longest \\w+ run ($1x == ${1x}), all-digit name is an index ref,
    nonexistent refs expand to ""."""
    out, i, n = [], 0, len(template)
    while i < n:
        ch = template[i]
        if ch != "$":
            out.append(ch)
            i += 1
            continue
        if i + 1 < n and template[i + 1] == "$":
            out.append("$")
            i += 2
            continue
        if i + 1 < n and template[i + 1] == "{":
            j = template.find("}", i + 2)
            if j == -1:
                out.append("$")
                i += 1
                continue
            name, i = template[i + 2 : j], j + 1
        else:
            mm = re.match(r"\w+", template[i + 1 :])
            if not mm:
                out.append("$")
                i += 1
                continue
            name, i = mm.group(0), i + 1 + mm.end()
        if name.isdigit():
            if int(name) <= m.re.groups:
                out.append(m.group(int(name)) or "")
        elif name in m.re.groupindex:
            out.append(m.group(name) or "")
    return "".join(out)


def m_label_replace(vec, dst, repl, src, regex):
    pat = re.compile(f"(?:{regex})")
    out = []
    for labels, v in vec:
        s = labels.get(src, "")
        m = pat.fullmatch(s)
        labels = dict(labels)
        if m:
            val = m_go_expand(repl, m)
            if val == "":
                labels.pop(dst, None)
            else:
                labels[dst] = val
        out.append((labels, v))
    return out


# ------------------------------------------------------------ scenarios


def test_math_functions(spark):
    df = spark.createDataFrame(
        [(x,) for x in (-2.5, -1.0, 0.0, 0.4, 1.0, 2.5, 9.0)], "value double"
    )
    got = df.select(
        F.col("value"),
        V.vabs(F.col("value")).alias("abs"),
        V.vceil(F.col("value")).alias("ceil"),
        V.vfloor(F.col("value")).alias("floor"),
        V.vsgn(F.col("value")).alias("sgn"),
        V.vln(F.col("value")).alias("ln"),
        V.vsqrt(F.col("value")).alias("sqrt"),
        V.vround(F.col("value"), 0.5).alias("round_half"),
    ).collect()
    for r in got:
        x = r["value"]
        assert r["abs"] == abs(x)
        assert r["ceil"] == math.ceil(x)
        assert r["floor"] == math.floor(x)
        assert r["sgn"] == (0.0 if x == 0 else math.copysign(1.0, x))
        if x > 0:
            assert r["ln"] == pytest.approx(math.log(x))
        elif x == 0:
            assert r["ln"] == float("-inf")
        else:
            assert math.isnan(r["ln"])
        # PromQL round(v, 0.5): floor(v/0.5 + 0.5) * 0.5  (half UP)
        assert r["round_half"] == math.floor(x / 0.5 + 0.5) * 0.5


def test_clamp_family(spark):
    df = spark.createDataFrame([(x,) for x in (-5.0, 0.0, 5.0, 50.0)], "value double")
    rows = df.select(
        V.clamp(F.col("value"), 0.0, 10.0).alias("c"),
        V.clamp_min(F.col("value"), 1.0).alias("cmin"),
        V.clamp_max(F.col("value"), 1.0).alias("cmax"),
    ).collect()
    assert [r["c"] for r in rows] == [0.0, 0.0, 5.0, 10.0]
    assert [r["cmin"] for r in rows] == [1.0, 1.0, 5.0, 50.0]
    assert [r["cmax"] for r in rows] == [-5.0, 0.0, 1.0, 1.0]


@pytest.mark.parametrize("op", ["sum", "min", "max", "avg", "count", "stddev", "stdvar", "group"])
@pytest.mark.parametrize("grouping", [{"by": ["job"]}, {"by": ["job", "code"]}, {"without": ["instance"]}, {"by": []}])
def test_aggregation_operators(spark, op, grouping):
    df = to_df(spark, VEC)
    got = from_df(V.agg_vector(df, op, **grouping))
    assert_same(got, m_agg(VEC, op, **grouping))


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_quantile_aggregation(spark, q):
    df = to_df(spark, VEC)
    got = from_df(V.agg_vector(df, "quantile", by=["job"], q=q))
    assert_same(got, m_agg(VEC, "quantile", by=["job"], q=q))


def test_count_values(spark):
    vec = [({"a": "x"}, 2.0), ({"a": "y"}, 2.0), ({"a": "z"}, 2.5)]
    df = to_df(spark, vec)
    got = from_df(V.count_values(df, "v", by=[]))
    # integral floats print Go-style without a trailing .0
    assert_same(got, [({"v": "2"}, 2.0), ({"v": "2.5"}, 1.0)])


@pytest.mark.parametrize("bottom", [False, True])
def test_topk_bottomk(spark, bottom):
    df = to_df(spark, VEC)
    got = from_df(V.topk(df, 2, by=["job"], bottom=bottom))
    assert_same(got, m_topk(VEC, 2, by=["job"], bottom=bottom))


def test_label_replace_semantics(spark):
    df = to_df(spark, VEC)
    # full-match required; ${1} expansion ("$1xx" would be the named
    # group "1xx" in Go's Expand — the classic label_replace gotcha)
    got = from_df(V.label_replace(df, "status_class", "${1}xx", "code", "([0-9])[0-9]+"))
    assert_same(got, m_label_replace(VEC, "status_class", "${1}xx", "code", "([0-9])[0-9]+"))
    assert got[0][0]["status_class"].endswith("xx")
    # and the gotcha itself: $1xx == ${1xx} == nonexistent -> dst dropped
    got = from_df(V.label_replace(df, "status_class", "$1xx", "code", "([0-9])[0-9]+"))
    assert_same(got, m_label_replace(VEC, "status_class", "$1xx", "code", "([0-9])[0-9]+"))
    assert all("status_class" not in l for l, _ in got)
    # non-matching regex leaves rows unchanged (partial match must NOT fire)
    got = from_df(V.label_replace(df, "x", "hit", "code", "0"))
    assert_same(got, m_label_replace(VEC, "x", "hit", "code", "0"))
    # empty replacement drops the destination label
    got = from_df(V.label_replace(df, "code", "", "code", "200"))
    assert_same(got, m_label_replace(VEC, "code", "", "code", "200"))


def test_label_replace_template_translation(spark):
    """Go Expand template -> Java replacement: $$ literal dollar, dead
    group refs expand to "", literal backslash survives, ${N} braces."""
    vec = [({"code": "200"}, 1.0)]
    df = to_df(spark, vec)

    def dst(df_out):
        return from_df(df_out)[0][0].get("x")

    assert dst(V.label_replace(df, "x", "$$1-${1}", "code", "(2)..")) == "$1-2"
    # ${9} refers to a nonexistent group -> Go expands to empty
    assert dst(V.label_replace(df, "x", "a${9}b", "code", "(2)..")) == "ab"
    # $9b is the nonexistent NAMED group "9b" (longest-run rule)
    assert dst(V.label_replace(df, "x", "a$9b", "code", "(2)..")) == "a"
    # literal backslash passes through (Java would treat bare \ as escape)
    assert dst(V.label_replace(df, "x", "a\\b", "code", "2..")) == "a\\b"
    # $1x is ${1x} (a nonexistent named group) in Go, NOT ${1} + "x"
    assert dst(V.label_replace(df, "x", "q$1x", "code", "(2)..")) == "q"
    # trailing bare $ is literal
    assert dst(V.label_replace(df, "x", "v$", "code", "2..")) == "v$"


def test_clamp_min_gt_max(spark):
    """clamp with min > max: upstream returns an empty vector; the
    column form yields NULL (never phantom numbers), the DataFrame form
    is empty."""
    df = to_df(spark, VEC)
    rows = df.select(V.clamp(F.col("value"), 5.0, 1.0).alias("c")).collect()
    assert all(r["c"] is None for r in rows)
    assert V.clamp_df(df, 5.0, 1.0).count() == 0
    assert V.clamp_df(df, 0.0, 10.0).count() == len(VEC)


def test_label_join(spark):
    df = to_df(spark, VEC)
    got = from_df(V.label_join(df, "joined", "-", "job", "instance", "code"))
    expected = []
    for labels, v in VEC:
        labels = dict(labels)
        labels["joined"] = "-".join(
            [labels.get("job", ""), labels.get("instance", ""), labels.get("code", "")]
        )
        expected.append((labels, v))
    assert_same(got, expected)


RIGHT_ONE = [
    ({"job": "api", "instance": "a"}, 4.0),
    ({"job": "api", "instance": "b"}, 9.0),
    ({"job": "db", "instance": "a"}, 7.0),
]


@pytest.mark.parametrize("op", ["+", "-", "*", "/", "^"])
def test_binop_one_to_one_on(spark, op):
    left = to_df(spark, RIGHT_ONE)
    right_vec = [({"job": "api", "instance": "a"}, 2.0), ({"job": "db", "instance": "a"}, 3.0)]
    right = to_df(spark, right_vec)
    got = from_df(V.vector_binop(left, right, op, on=["job", "instance"]))
    assert_same(got, m_binop(RIGHT_ONE, right_vec, op, on=["job", "instance"]))


def test_binop_ignoring(spark):
    left = to_df(spark, VEC)
    right = to_df(spark, RIGHT_ONE)
    got = from_df(V.vector_binop(left, right, "/", ignoring=["code"]))
    assert_same(got, m_binop(VEC, RIGHT_ONE, "/", ignoring=["code"]))


def test_binop_ignoring_one_side_only_label(spark):
    """Upstream signatures under ignoring() span ALL non-ignored labels:
    a label present on only one side with a non-empty value must refuse
    to pair, and the paired output keeps left labels minus ignored."""
    left = to_df(spark, [({"job": "api", "extra": "x"}, 10.0), ({"job": "db"}, 7.0)])
    right = to_df(spark, [({"job": "api"}, 2.0), ({"job": "db"}, 1.0)])
    # no modifier: full-label-set match -> only the db pair (extra=x blocks api)
    got = from_df(V.vector_binop(left, right, "+"))
    assert_same(got, [({"job": "db"}, 8.0)])
    # ignoring(extra): both pair; output = left labels minus ignored
    got = from_df(V.vector_binop(left, right, "+", ignoring=["extra"]))
    assert_same(got, [({"job": "api"}, 12.0), ({"job": "db"}, 8.0)])


def test_binop_duplicate_one_side_raises(spark):
    """Duplicate match keys on the one side must raise (upstream:
    many-to-one matching must be explicit), not silently fan out."""
    left = to_df(spark, [({"job": "api", "instance": "a"}, 1.0)])
    dup = to_df(
        spark,
        [({"job": "api", "instance": "a"}, 2.0), ({"job": "api", "instance": "b"}, 3.0)],
    )
    with pytest.raises(Exception, match="duplicate series|many-to-one"):
        V.vector_binop(left, dup, "+", on=["job"]).collect()
    # strict=False restores the documented relaxation
    got = V.vector_binop(left, dup, "+", on=["job"], strict=False).collect()
    assert len(got) == 2


def test_binop_group_left_with_carry(spark):
    many = to_df(spark, VEC)
    one_vec = [({"job": "api", "region": "eu"}, 100.0), ({"job": "db", "region": "us"}, 10.0)]
    one = to_df(spark, one_vec)
    got = from_df(
        V.vector_binop(many, one, "/", on=["job"], group="left", carry=["region"])
    )
    assert_same(got, m_binop(VEC, one_vec, "/", on=["job"], group="left", carry=["region"]))


def test_binop_group_right(spark):
    one_vec = [({"job": "api"}, 100.0), ({"job": "db"}, 10.0)]
    one = to_df(spark, one_vec)
    many = to_df(spark, VEC)
    got = from_df(V.vector_binop(one, many, "+", on=["job"], group="right"))
    assert_same(got, m_binop(one_vec, VEC, "+", on=["job"], group="right"))


def test_binop_comparison_filter_keeps_full_labels(spark):
    left = to_df(spark, VEC)
    right_vec = [({"job": "api"}, 5.0), ({"job": "db"}, 6.0)]
    right = to_df(spark, right_vec)
    got = from_df(V.vector_binop(left, right, ">", on=["job"]))
    assert_same(got, m_binop(VEC, right_vec, ">", on=["job"]))
    # and the bool modifier returns 0/1 on match labels
    got = from_df(V.vector_binop(left, right, ">", on=["job"], bool_modifier=True))
    # one-to-one requires unique match keys; VEC has many per job -> use
    # a model with the same relaxation (our impl joins, model indexes one side)
    # so compare against filtered manual expectation instead:
    expected = []
    ridx = {l["job"]: v for l, v in right_vec}
    for labels, v in VEC:
        expected.append(({"job": labels["job"]}, 1.0 if v > ridx[labels["job"]] else 0.0))
    assert_same(got, expected)


def test_absent(spark):
    df = to_df(spark, VEC)
    assert V.absent(df).count() == 0
    empty = df.where(F.lit(False))
    got = from_df(V.absent(empty))
    assert got == [({}, 1.0)]


# ------------------------------------------- property-based corpus widening


def test_agg_and_binop_property(spark):
    """Randomized instant vectors through agg_vector and vector_binop vs
    the Python model — property-based widening of the golden corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label_vals = st.sampled_from(["a", "b", "c", None])
    values = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )

    @st.composite
    def vectors(draw, min_size=1, max_size=8):
        n = draw(st.integers(min_value=min_size, max_value=max_size))
        out, seen = [], set()
        for _ in range(n):
            labels = {}
            for name in ("j", "i"):
                v = draw(label_vals)
                if v is not None:
                    labels[name] = v
            key = tuple(sorted(labels.items()))
            if key in seen:
                continue  # unique label sets (instant-vector invariant)
            seen.add(key)
            out.append((labels, draw(values)))
        return out

    @settings(max_examples=12, deadline=None)
    @given(
        vec=vectors(),
        op=st.sampled_from(["sum", "avg", "min", "max", "count"]),
        agg_by=st.sampled_from([["j"], ["i"], ["j", "i"], []]),
    )
    def run_agg(vec, op, agg_by):
        df = to_df(spark, vec)
        assert_same(from_df(V.agg_vector(df, op, by=agg_by)), m_agg(vec, op, by=agg_by))

    run_agg()

    @settings(max_examples=12, deadline=None)
    @given(
        left=vectors(),
        binop=st.sampled_from(["+", "*", "-"]),
    )
    def run_binop(left, binop):
        # right = sum by j of left: a valid "one" side for on(j) group_left
        right = m_agg(left, "sum", by=["j"])
        ldf, rdf = to_df(spark, left), to_df(spark, right)
        got = V.vector_binop(ldf, rdf, binop, on=["j"], group="left")
        # model indexes the one side by match key incl. absent j -> None
        expected = m_binop(left, right, binop, on=["j"], group="left")
        assert_same(from_df(got), expected)

    run_binop()


# ----------------------------------------------- logical/set operators


def m_setop(left, right, op, on=None, ignoring=None):
    l_names = {k for l, _ in left for k in l}
    r_names = {k for l, _ in right for k in l}
    union_names = l_names | r_names

    def match_key(labels, _shared=None):
        if on is not None:
            return tuple((k, labels.get(k)) for k in on)
        drop = set(ignoring or ())
        return tuple(
            (k, labels.get(k)) for k in sorted(union_names) if k not in drop
        )

    shared = union_names
    r_sigs = {match_key(l, shared) for l, _ in right}
    l_sigs = {match_key(l, shared) for l, _ in left}
    if op == "and":
        return [(l, v) for l, v in left if match_key(l, shared) in r_sigs]
    if op == "unless":
        return [(l, v) for l, v in left if match_key(l, shared) not in r_sigs]
    if op == "or":
        return list(left) + [(l, v) for l, v in right if match_key(l, shared) not in l_sigs]
    raise AssertionError(op)


@pytest.mark.parametrize("op", ["and", "or", "unless"])
@pytest.mark.parametrize("matchspec", [{"on": ["job"]}, {"on": ["job", "instance"]}, {"ignoring": ["code"]}, {}])
def test_vector_setops(spark, op, matchspec):
    right_vec = [
        ({"job": "api", "instance": "a", "code": "200"}, 1.0),
        ({"job": "db", "instance": "c"}, 2.0),
        ({"job": "web", "instance": "z"}, 3.0),
    ]
    ldf, rdf = to_df(spark, VEC), to_df(spark, right_vec)
    got = from_df(V.vector_setop(ldf, rdf, op, **matchspec))
    assert_same(got, m_setop(VEC, right_vec, op, **matchspec))


def test_sort_scalar_vector(spark):
    df = to_df(spark, VEC)
    vals = [r["value"] for r in V.vsort(df).collect()]
    assert vals == sorted(vals)
    vals = [r["value"] for r in V.vsort_desc(df).collect()]
    assert vals == sorted(vals, reverse=True)
    # scalar: NaN unless exactly one element
    import math

    assert math.isnan(V.scalar(df).collect()[0]["value"])
    one = df.where((F.col("job") == "db") & (F.col("instance") == "c"))
    assert V.scalar(one).collect()[0]["value"] == 5.0
    empty = df.where(F.lit(False))
    assert math.isnan(V.scalar(empty).collect()[0]["value"])
    assert from_df(V.vector(spark, 42.0)) == [({}, 42.0)]
