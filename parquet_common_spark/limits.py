"""Per-query admission quotas (reference: search/limits.go:30-83).

The reference enforces three budgets while materializing — matched rows
(series), chunk bytes, and data bytes — failing the query with a
resource-exhausted error when exceeded (checks at
search/materialize.go:939-965, wired queryable/parquet_queryable.go:74-94).

Spark has no Catalyst hook for mid-scan budgets, so per SURVEY.md §2.6 we
implement quotas as pre-flight guards on the *pruned* plan:

  - row quota: ``df.limit(n+1).count() > n``  — bounded work, the scan
    stops after n+1 rows thanks to the limit;
  - byte quota: approximated from the file sizes of the pruned scan —
    honest at 100 TB because partition/predicate pruning has already
    happened when we inspect the plan's input files.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


class ResourceExhausted(Exception):
    """Equivalent of the reference's quota error (search/limits.go:30-42)."""


@dataclass
class Quota:
    """Per-Select budgets; None == unlimited (reference: search/limits.go:44-74)."""

    max_rows: int | None = None
    max_bytes: int | None = None

    def check_rows(self, df: DataFrame, what: str = "series") -> None:
        if self.max_rows is None:
            return
        n = df.limit(self.max_rows + 1).count()
        if n > self.max_rows:
            raise ResourceExhausted(
                f"resource exhausted (query processed too many {what}: quota {self.max_rows})"
            )

    def check_bytes(self, df: DataFrame) -> None:
        if self.max_bytes is None:
            return
        try:
            files = df.inputFiles()
        except Exception:
            return
        import os

        total = 0
        for f in files:
            p = f.removeprefix("file:")
            try:
                total += os.path.getsize(p)
            except OSError:
                continue
        if total > self.max_bytes:
            raise ResourceExhausted(
                f"resource exhausted (query would scan ~{total} bytes: quota {self.max_bytes})"
            )
