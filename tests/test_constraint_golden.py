"""Golden parity corpus mirrored from the reference's own constraint
tests (/root/reference/search/constraint_test.go:242-560 TestFilter).

Each scenario re-creates the reference's row table as label columns and
asserts our matcher-compiled predicate selects EXACTLY the row ids the
reference's RowRange expectations encode (From..From+Count-1).  This is
behavioral parity only — the rows/constraints/expected sets come from
reading the reference's test table, the implementation under test is our
Catalyst predicate compiler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_common_spark.matchers import Matcher, matchers_to_predicate


def _df(spark, rows):
    """rows: list of dicts with keys among A/B/C/D (absent == NULL)."""
    cols = ["A", "B", "C", "D"]
    data = [tuple([i] + [r.get(c) for c in cols]) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        data, "rid int, l_A string, l_B string, l_C string, l_D string"
    )


def _select(df, matchers):
    pred = matchers_to_predicate(matchers, [c for c in df.columns if c != "rid"])
    return sorted(r["rid"] for r in df.where(pred).select("rid").collect())


def _ranges(*ranges):
    out = []
    for frm, cnt in ranges:
        out.extend(range(frm, frm + cnt))
    return out


T1 = [  # constraint_test.go:260-268
    {"A": "1", "B": "2", "C": "a"},
    {"A": "3", "B": "4", "C": "b"},
    {"A": "7", "B": "12", "C": "c"},
    {"A": "9", "B": "22", "C": "d"},
    {"A": "0", "B": "1", "C": "e"},
    {"A": "7", "B": "1", "C": "f"},
    {"A": "7", "B": "1", "C": "g"},
    {"A": "0", "B": "1", "C": "h"},
]
T2 = [  # constraint_test.go:340-353
    {"A": "1", "B": "2"}, {"A": "1", "B": "3"}, {"A": "1", "B": "4"},
    {"A": "1", "B": "4"}, {"A": "1", "B": "5"}, {"A": "1", "B": "5"},
    {"A": "2", "B": "5"}, {"A": "2", "B": "5"}, {"A": "2", "B": "5"},
    {"A": "3", "B": "5"}, {"A": "3", "B": "6"}, {"A": "3", "B": "2"},
]
T3 = [  # :406-415
    {"A": "1", "B": "1"}, {"A": "1", "B": "2"}, {"A": "2", "B": "1"},
    {"A": "2", "B": "2"}, {"A": "1", "B": "1"}, {"A": "1", "B": "2"},
    {"A": "2", "B": "1"}, {"A": "2", "B": "2"},
]
T4 = [{"C": "foo"}, {"C": "bar"}, {"C": "foo"}, {"C": "buz"}]  # :431-436
T5 = [  # :467-473
    {"A": "1", "B": "1"}, {"A": "1", "B": "2"}, {"A": "2", "B": "1"},
    {"A": "2", "B": "2"}, {"A": "1", "B": "1"},
]
T6 = [{"A": "1", "B": "1"}, {"A": "1", "B": "2"}]  # :488-491
T7 = [  # :528-535
    {"A": "1", "C": "a"}, {"A": "2", "C": "b"}, {"A": "2"},
    {"A": "3", "C": "b"}, {"A": "4"}, {"A": "5"},
]

CASES = [
    # (table, matchers, expected RowRanges) — in constraint_test.go order
    (T1, [("A", "=", "7"), ("C", "=", "g")], [(6, 1)]),
    (T1, [("A", "=", "7"), ("D", "!=", "")], []),
    (T1, [("A", "=", "7")], [(2, 1), (5, 2)]),
    (T1, [("A", "=", "7"), ("B", "!=", "1")], [(2, 1)]),
    (T1, [("A", "=", "7"), ("C", "!=", "c")], [(5, 2)]),
    (T1, [("A", "!=", "227")], [(0, 8)]),
    (T1, [("C", "=~", "a|c|d")], [(0, 1), (2, 2)]),
    (T1, [("C", "=~", ".*")], [(0, 8)]),
    (T2, [("A", "!=", "3")], [(0, 9)]),
    (T2, [("A", "!=", "3"), ("B", "=", "5")], [(4, 5)]),
    (T2, [("A", "!=", "3"), ("A", "!=", "1")], [(6, 3)]),
    (T2, [("A", "=", "2"), ("B", "!=", "5")], []),
    (T2, [("A", "=", "3"), ("B", "!=", "2")], [(9, 2)]),
    (T3, [("A", "!=", "1"), ("B", "!=", "2")], [(2, 1), (6, 1)]),
    (T4, [("C", "=~", "f.*")], [(0, 1), (2, 1)]),
    (T4, [("C", "=~", "b.*")], [(1, 1), (3, 1)]),
    (T4, [("C", "=~", "f.*|b.*")], [(0, 4)]),
    (T5, [("A", "=", "1"), ("B", "=", "1")], [(0, 1), (4, 1)]),
    # "None" is a column absent from the schema entirely
    (T6, [("A", "=", "1"), ("None", "=", "?")], []),
    (T6, [("A", "=", "1"), ("None", "=", "")], [(0, 2)]),
    (T6, [("A", "=", "1"), ("None", "=~", "f.*|b.*")], []),
    (T6, [("A", "=", "1"), ("None", "=~", "f.*|b.*|")], [(0, 2)]),
    (T7, [("C", "=", "")], [(2, 1), (4, 2)]),
    (T7, [("A", "=", "2"), ("C", "=", "")], [(2, 1)]),
]


@pytest.mark.parametrize("table,specs,expected", CASES)
def test_reference_constraint_scenarios(spark, table, specs, expected):
    df = _df(spark, table)
    matchers = [Matcher(n, op, v) for n, op, v in specs]
    assert _select(df, matchers) == _ranges(*expected)
