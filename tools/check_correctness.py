"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row count + schema (column names) + order-insensitive value hash.

r10: the fetch path now mirrors the driver's — BOTH sides go through
Arrow (`df.toArrow()` / duckdb `.arrow()`), and a type-compatibility
gate fails any column pair whose Arrow types normalize differently in
the driver's hasher (the r9 HUGEINT defect class: DuckDB `SUM(BIGINT)`
→ decimal128(38,0) vs Spark int64 hash-mismatched in the driver while
the old `fetchall()` path here collapsed both to Python int and could
not see it).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def type_class(t: pa.DataType) -> str:
    """Collapse an Arrow type into the equivalence class the driver's
    normalizer treats identically.  Integer widths and string widths are
    interchangeable; decimal is its OWN class keyed by scale — a
    decimal128(38,0) oracle column vs an int64 Spark column is exactly
    the r9 hash-mismatch, so it must FAIL here too."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(s={t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_class(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_class(t.key_type)},{type_class(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def norm_cell(v):
    import datetime as dt
    import decimal
    import math

    if v is None:
        return "∅"
    if isinstance(v, decimal.Decimal):
        # Value-level comparison stays lenient across trailing zeros
        # (5.00 == 5); the Arrow type gate above is what enforces
        # decimal/int separation.  ADVICE r10: do NOT round-trip through
        # float — two scale-0 decimals differing only beyond 2^53 would
        # hash equal.  Integral decimals compare as exact ints; others
        # exponent-free fixed notation (ADVICE r11: str(normalize())
        # emits '1E-6' for small magnitudes, which would diverge from
        # any fixed-notation peer).  NOTE: decimal-vs-DOUBLE equality is
        # intentionally NOT supported at the value level — the type gate
        # above already fails such column pairs before hashing.
        if v == v.to_integral_value():
            return str(int(v))
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_rows(tbl: pa.Table) -> list[tuple]:
    cols = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols)) if cols else []


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    from parquet_common_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    # ERROR on unknown names (VERDICT r11): a typo'd name used to be
    # silently skipped, reading as "checked, no failure".
    unknown = sorted(ONLY - set(qs))
    if unknown:
        print(f"ERROR: unknown query name(s): {unknown}", file=sys.stderr)
        import difflib

        for u in unknown:
            close = difflib.get_close_matches(u, qs, n=3)
            print(f"  {u!r}: did you mean {close}?", file=sys.stderr)
        return 2
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            stbl = df.toArrow()
            scols = stbl.column_names
            srows = table_rows(stbl)
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            otbl = con.execute(oracles[name]).arrow()
            ocols = otbl.column_names
            orows = table_rows(otbl)
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        else:
            # Driver-hasher type gate: same-named columns must land in
            # the same normalization class.
            stypes = {f.name: f.type for f in stbl.schema}
            otypes = {f.name: f.type for f in otbl.schema}
            for c in sorted(scols):
                sc, oc = type_class(stypes[c]), type_class(otypes[c])
                if sc != oc and "null" not in (sc, oc):
                    problems.append(f"type[{c}] spark {stypes[c]} ({sc}) != oracle {otypes[c]} ({oc})")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
                # show first diff
                so = sorted(
                    "|".join(
                        norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oo = sorted(
                    "|".join(
                        norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        problems.append(f"  spark: {a[:200]}\n  duck : {b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
