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
    """Per-Select budgets; None == unlimited (reference: search/limits.go:44-74).

    The reference wires THREE independent quotas per query
    (queryable/parquet_queryable.go:74-94): matched rows, CHUNK bytes
    (chunks-file page reads) and DATA bytes (labels-file page reads).
    Mirrored here: the labels/series scan draws on ``max_data_bytes``,
    the samples scan on ``max_chunk_bytes``; ``max_bytes`` remains as a
    combined budget drawn by BOTH scan kinds (back-compat, and the right
    knob when callers only care about total I/O).

    Byte consumption ACCUMULATES across checks within one query — the
    reference creates fresh Quota objects per Select
    (queryable/parquet_queryable.go:348-378) and decrements them as each
    table/row-group is touched; create one Quota per query here too."""

    max_rows: int | None = None
    max_bytes: int | None = None
    max_chunk_bytes: int | None = None
    max_data_bytes: int | None = None
    _consumed_rows: int = 0
    _consumed_bytes: int = 0
    _consumed_chunk_bytes: int = 0
    _consumed_data_bytes: int = 0

    def check_rows(self, df: DataFrame, what: str = "series") -> None:
        """Meter MATCHED series rows (the labels-file rows the reference's
        rowCountQuota decrements, search/materialize.go:939-965 — NOT
        result sample rows), accumulating across shards within one query
        like the reference's shared per-Select quota.  Bounded work: the
        scan stops after remaining+1 rows thanks to the limit."""
        if self.max_rows is None:
            return
        remaining = max(self.max_rows - self._consumed_rows, 0)
        n = df.limit(remaining + 1).count()
        self._consumed_rows += n
        if self._consumed_rows > self.max_rows:
            raise ResourceExhausted(
                f"resource exhausted (query would fetch too many {what}: "
                f"quota {self.max_rows})"
            )

    def check_bytes(
        self,
        df: DataFrame,
        partition_ranges: dict[str, tuple[int, int]] | None = None,
        kind: str = "data",
    ) -> None:
        """Budget the bytes the pruned scan would read.

        ``kind`` is ``"data"`` (labels/series file) or ``"chunk"``
        (samples/chunks file) — the reference's dataBytesQuota vs
        chunkBytesQuota split.  Both kinds also draw on the combined
        ``max_bytes`` budget.

        ``df.inputFiles()`` lists from the ANALYZED plan — the full file
        listing, before partition pruning.  ``partition_ranges`` applies
        the pruning the optimizer will perform: files under a
        ``col=value`` partition directory with value outside [lo, hi] are
        excluded, so a well-pruned query is metered on what it actually
        scans (the reference meters during materialization,
        search/materialize.go:939-965 — post-pruning by construction)."""
        per_kind_max = self.max_chunk_bytes if kind == "chunk" else self.max_data_bytes
        if self.max_bytes is None and per_kind_max is None:
            return
        try:
            files = df.inputFiles()
        except Exception:
            return
        import os

        total = 0
        for f in files:
            p = f.removeprefix("file:")
            if partition_ranges and not _within_partition_ranges(p, partition_ranges):
                continue
            try:
                total += os.path.getsize(p)
            except OSError:
                continue
        if kind == "chunk":
            self._consumed_chunk_bytes += total
            used = self._consumed_chunk_bytes
        else:
            self._consumed_data_bytes += total
            used = self._consumed_data_bytes
        if per_kind_max is not None and used > per_kind_max:
            raise ResourceExhausted(
                f"resource exhausted (query would scan ~{used} {kind} bytes: "
                f"quota {per_kind_max})"
            )
        self._consumed_bytes += total
        if self.max_bytes is not None and self._consumed_bytes > self.max_bytes:
            raise ResourceExhausted(
                f"resource exhausted (query would scan ~{self._consumed_bytes} bytes: "
                f"quota {self.max_bytes})"
            )


def _within_partition_ranges(path: str, ranges: dict[str, tuple[int, int]]) -> bool:
    """True unless a ``col=value`` path segment falls outside its range."""
    for seg in path.split("/"):
        if "=" not in seg:
            continue
        col, _, raw = seg.partition("=")
        rng = ranges.get(col)
        if rng is None:
            continue
        try:
            v = int(raw)
        except ValueError:
            continue
        if not (rng[0] <= v <= rng[1]):
            return False
    return True
