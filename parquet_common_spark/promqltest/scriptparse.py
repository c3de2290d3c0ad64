"""Parser for the promqltest script format.

The format is public (prometheus/prometheus promql/promqltest/README.md
and test.go):

    load 5m
        http_requests{job="api", instance="0"}  0+10x10
        other_metric{}                          1 2 _ stale 4

    eval instant at 50m sum by (job) (http_requests)
        {job="api"} 100

    eval range from 0 to 10m step 5m http_requests
        http_requests{job="api"} 0 10 20

    eval_fail instant at 1m some + invalid +
    clear

Value sequences expand ``a+bxN`` / ``a-bxN`` (N+1 points stepping by
±b), ``axN`` (a repeated N+1 times), ``_`` (no sample at that slot) and
``stale`` (an explicit staleness marker).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from parquet_common_spark.promqltest.promqlparse import parse_duration_ms


@dataclass
class Sample:
    ts_ms: int
    value: float
    stale: bool = False
    hist: dict | None = None  # native-histogram literal fields


@dataclass
class LoadCmd:
    step_ms: int
    series: list[tuple[dict[str, str], list[Sample]]]


@dataclass
class ExpectedSeries:
    labels: dict[str, str]
    values: list[float | None]  # one per eval step (len 1 for instant)
    stale: list[bool] = field(default_factory=list)
    # expected native-histogram literals, one per step (None = float /
    # no-value slot) — upstream writes them as {{...}} in eval output
    hists: list[dict | None] = field(default_factory=list)


@dataclass
class EvalCmd:
    kind: str  # instant | range
    expr: str
    at_ms: int = 0
    start_ms: int = 0
    end_ms: int = 0
    step_ms: int = 0
    expected: list[ExpectedSeries] = field(default_factory=list)
    ordered: bool = False
    fail: bool = False
    expect_no_info: bool = False  # parsed, ignored (we emit no annotations)
    line: int = 0


@dataclass
class ClearCmd:
    pass


@dataclass
class Script:
    name: str
    commands: list


_SERIES_RE = re.compile(
    r"^(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)?(?P<labels>\{[^}]*\})?\s*(?P<values>.*)$"
)
_LABEL_RE = re.compile(r'([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"((?:\\.|[^"\\])*)"')


def _parse_labels(name: str | None, labels_text: str | None) -> dict[str, str]:
    out: dict[str, str] = {}
    if name:
        out["__name__"] = name
    if labels_text:
        for m in _LABEL_RE.finditer(labels_text):
            out[m.group(1)] = m.group(2).encode("utf-8").decode("unicode_escape")
    return out


def _parse_number(tok: str) -> float:
    t = tok.lower()
    if t in ("inf", "+inf"):
        return math.inf
    if t == "-inf":
        return -math.inf
    if t == "nan":
        return math.nan
    return float(tok)


_EXPAND_RE = re.compile(
    r"^(?P<start>-?(?:\d+\.?\d*(?:[eE][+-]?\d+)?|[Ii]nf|[Nn]a[Nn]))"
    r"(?:(?P<sign>[+-])(?P<step>(?:\d+\.?\d*(?:[eE][+-]?\d+)?|[Ii]nf|[Nn]a[Nn])))?"
    r"x(?P<count>\d+)$"
)


def parse_values(tokens: list[str]) -> list[tuple[float | None, bool]]:
    """-> [(value | None, is_stale)] one entry per time slot."""
    out: list[tuple[float | None, bool]] = []
    for tok in tokens:
        if tok == "_":
            out.append((None, False))
            continue
        if tok == "stale":
            out.append((math.nan, True))
            continue
        m = _EXPAND_RE.match(tok)
        if m:
            start = _parse_number(m.group("start"))
            count = int(m.group("count"))
            if m.group("step") is not None:
                step = _parse_number(m.group("step"))
                if m.group("sign") == "-":
                    step = -step
            else:
                step = 0.0
            for i in range(count + 1):
                out.append((start + step * i, False))
            continue
        out.append((_parse_number(tok), False))
    return out


def _split_values(text: str) -> list[str]:
    return [t for t in text.split() if t]


# --------------------------------------------- native-histogram literals

_SERIES_TOKEN_RE = re.compile(
    r"\{\{[^}]*\}\}(?:[+-]\{\{[^}]*\}\})?(?:x\d+)?|\S+"
)
_HIST_TOKEN_RE = re.compile(
    r"^\{\{(?P<a>[^}]*)\}\}(?:(?P<sign>[+-])\{\{(?P<b>[^}]*)\}\})?"
    r"(?:x(?P<reps>\d+))?$"
)
_HIST_FIELD_RE = re.compile(r"(\w+):(\[[^\]]*\]|\S+)")


def _parse_hist_literal(body: str) -> dict:
    """``{{schema:0 sum:5 count:4 buckets:[1 2 1] offset:0 ...}}`` ->
    field dict (upstream promqltest histogram notation; span offset o
    means the first bucket has absolute index o, covering
    (γ^(o-1), γ^o])."""
    out: dict = {
        "schema": 0, "sum": 0.0, "count": 0.0,
        "z_bucket": 0.0, "z_bucket_w": 0.0,
        "buckets": [], "offset": 0, "n_buckets": [], "n_offset": 0,
        "custom_values": None,
    }
    for m in _HIST_FIELD_RE.finditer(body):
        key, val = m.group(1), m.group(2)
        if key in ("buckets", "n_buckets"):
            out[key] = [float(x) for x in val.strip("[]").split()]
        elif key == "custom_values":
            out[key] = [float(x) for x in val.strip("[]").split()]
        elif key in ("schema", "offset", "n_offset"):
            out[key] = int(val)
        elif key in ("sum", "count", "z_bucket", "z_bucket_w"):
            out[key] = _parse_number(val)
        elif key == "counter_reset_hint":
            pass  # accepted, unused by the engine slice
        else:
            raise ScriptParseError(f"unknown histogram field {key!r}")
    # custom-bucket histograms (NHCB, upstream histogram.CustomBucketsSchema
    # = -53): custom_values are the bucket upper bounds; only the positive
    # bucket range is used and the zero/negative ranges must stay empty
    if (out["custom_values"] is not None) != (out["schema"] == -53):
        raise ScriptParseError(
            "custom_values requires schema:-53 and vice versa"
        )
    if out["custom_values"] is not None:
        if sorted(out["custom_values"]) != out["custom_values"]:
            raise ScriptParseError("custom_values must be sorted ascending")
        if out["n_buckets"] or out["z_bucket"] or out["z_bucket_w"]:
            raise ScriptParseError(
                "custom-bucket histograms cannot have negative or zero buckets"
            )
        if out["offset"] + len(out["buckets"]) > len(out["custom_values"]) + 1:
            raise ScriptParseError(
                "custom-bucket histogram buckets overflow custom_values"
            )
    return out


def _hist_add(a: dict, b: dict, k: int) -> dict:
    """``a + k*b`` component-wise — the incremental histogram series
    notation ``{{A}}+{{B}}xN`` (upstream promqltest); schemas must
    match, bucket arrays align by absolute index."""
    if a["schema"] != b["schema"]:
        raise ScriptParseError(
            "incremental histogram series: schema mismatch "
            f"({a['schema']} vs {b['schema']})"
        )
    if a.get("custom_values") != b.get("custom_values"):
        raise ScriptParseError(
            "incremental histogram series: custom_values mismatch"
        )

    def merge(ba, oa, bb, ob):
        m: dict[int, float] = {}
        for i, c in enumerate(ba):
            m[oa + i] = m.get(oa + i, 0.0) + c
        for i, c in enumerate(bb):
            m[ob + i] = m.get(ob + i, 0.0) + k * c
        if not m:
            return [], 0
        lo, hi = min(m), max(m)
        return [m.get(j, 0.0) for j in range(lo, hi + 1)], lo

    pb, po = merge(a["buckets"], a["offset"], b["buckets"], b["offset"])
    nb, no = merge(a["n_buckets"], a["n_offset"], b["n_buckets"], b["n_offset"])
    return {
        "schema": a["schema"],
        "sum": a["sum"] + k * b["sum"],
        "count": a["count"] + k * b["count"],
        "z_bucket": a["z_bucket"] + k * b["z_bucket"],
        "z_bucket_w": max(a["z_bucket_w"], b["z_bucket_w"]),
        "buckets": pb, "offset": po, "n_buckets": nb, "n_offset": no,
        "custom_values": a.get("custom_values"),
    }


def parse_series_values(text: str) -> list[tuple[float | None, bool, dict | None]]:
    """Load-line values: scalar tokens (with expansion) plus
    ``{{...}}``/``{{...}}xN``/``{{A}}+{{B}}xN`` native-histogram
    literals -> [(value|None, is_stale, hist|None)] per time slot."""
    out: list[tuple[float | None, bool, dict | None]] = []
    for tok in _SERIES_TOKEN_RE.findall(text):
        if tok.startswith("{{"):
            hm = _HIST_TOKEN_RE.match(tok)
            if not hm:
                raise ScriptParseError(f"bad histogram literal {tok!r}")
            hist = _parse_hist_literal(hm.group("a"))
            reps = int(hm.group("reps") or 0)
            if hm.group("b") is not None:
                inc = _parse_hist_literal(hm.group("b"))
                sgn = -1 if hm.group("sign") == "-" else 1
                for i in range(reps + 1):
                    out.append((None, False, _hist_add(hist, inc, sgn * i)))
            else:
                for _ in range(reps + 1):
                    out.append((None, False, hist))
            continue
        out.extend((v, s, None) for v, s in parse_values([tok]))
    return out


class ScriptParseError(ValueError):
    pass


def parse_script(text: str, name: str = "<script>") -> Script:
    lines = text.splitlines()
    cmds: list = []
    i, n = 0, len(lines)

    def strip_comment(line: str) -> str:
        # only WHOLE-LINE comments exist in the format — a '#' inside a
        # quoted label value (path="/metrics#frag") is data, so mid-line
        # stripping would corrupt series lines
        return "" if line.lstrip().startswith("#") else line

    while i < n:
        raw = lines[i]
        line = strip_comment(raw).strip()
        if not line:
            i += 1
            continue
        lineno = i + 1

        if line.startswith("load"):
            m = re.match(r"^load\s+(\S+)$", line)
            if not m:
                raise ScriptParseError(f"{name}:{lineno}: bad load line {line!r}")
            step_ms = parse_duration_ms(m.group(1))
            series: list[tuple[dict[str, str], list[Sample]]] = []
            i += 1
            while i < n:
                if lines[i].strip().startswith("#"):
                    i += 1  # comment lines are invisible to block structure
                    continue
                body = strip_comment(lines[i])
                if not body.strip():
                    break
                if not body[0].isspace():
                    break
                sm = _SERIES_RE.match(body.strip())
                if not sm or (not sm.group("name") and not sm.group("labels")):
                    raise ScriptParseError(f"{name}:{i + 1}: bad series line {body!r}")
                labels = _parse_labels(sm.group("name"), sm.group("labels"))
                vals = parse_series_values(sm.group("values"))
                samples = [
                    Sample(slot * step_ms, math.nan if v is None else v, stale, hist)
                    for slot, (v, stale, hist) in enumerate(vals)
                    if v is not None or hist is not None
                ]
                series.append((labels, samples))
                i += 1
            cmds.append(LoadCmd(step_ms, series))
            continue

        if line.startswith("clear"):
            cmds.append(ClearCmd())
            i += 1
            continue

        em = re.match(
            r"^(?P<kw>eval|eval_fail|eval_ordered|eval_info|eval_warn)\s+"
            r"(?:(?P<instant>instant\s+at\s+(?P<at>\S+))|"
            r"(?P<range>range\s+from\s+(?P<from>\S+)\s+to\s+(?P<to>\S+)\s+step\s+(?P<step>\S+)))\s+"
            r"(?P<expr>.*)$",
            line,
        )
        if em:
            kw = em.group("kw")
            cmd = EvalCmd(
                kind="instant" if em.group("instant") else "range",
                expr=em.group("expr").strip(),
                ordered=kw == "eval_ordered",
                fail=kw == "eval_fail",
                line=lineno,
            )
            if cmd.kind == "instant":
                cmd.at_ms = parse_duration_ms(em.group("at"))
            else:
                cmd.start_ms = parse_duration_ms(em.group("from"))
                cmd.end_ms = parse_duration_ms(em.group("to"))
                cmd.step_ms = parse_duration_ms(em.group("step"))
            i += 1
            # expected result lines: indented
            while i < n:
                if lines[i].strip().startswith("#"):
                    i += 1
                    continue
                body = strip_comment(lines[i])
                if not body.strip():
                    break
                if not body[0].isspace():
                    break
                text_line = body.strip()
                if text_line.startswith("expect "):
                    i += 1  # expect fail/info/warn/no_info annotations: skip
                    continue
                # scalar expectation: a line that is purely a value
                # sequence (this must run before the series regex —
                # "NaN"/"Inf" would otherwise parse as metric names)
                try:
                    vals = parse_series_values(text_line)
                except Exception:
                    vals = None
                if vals is not None:
                    cmd.expected.append(
                        ExpectedSeries(
                            {},
                            [v for v, _, _ in vals],
                            [s for _, s, _ in vals],
                            [h for _, _, h in vals],
                        )
                    )
                    i += 1
                    continue
                sm = _SERIES_RE.match(text_line)
                if not sm or (not sm.group("name") and not sm.group("labels")):
                    raise ScriptParseError(f"{name}:{i + 1}: bad expected line {body!r}")
                labels = _parse_labels(sm.group("name"), sm.group("labels"))
                vals = parse_series_values(sm.group("values"))
                cmd.expected.append(
                    ExpectedSeries(
                        labels,
                        [v for v, _, _ in vals],
                        [s for _, s, _ in vals],
                        [h for _, _, h in vals],
                    )
                )
                i += 1
            cmds.append(cmd)
            continue

        raise ScriptParseError(f"{name}:{lineno}: unrecognized line {line!r}")

    return Script(name, cmds)
