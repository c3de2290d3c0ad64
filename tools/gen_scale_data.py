"""Generate a 10x scale-up dataset (sf1) from the driver's sf0.1 tables
for the SCALE-UP measurement (VERDICT r7 ask #3) — wall-clock at 10x the
data with plan-shape equality is the evidence that turns SCALE.md's
arguments into numbers.

NOT a correctness fixture: the driver's generator is not public, so sf1
is built by key-offset replication of sf0.1 — the standard scale-test
construction that preserves exactly the properties a scale measurement
needs:

* join selectivity: every foreign key is offset by ``rep * (max+1)`` on
  both sides, so each replica joins only within itself — fan-outs,
  match rates, and group sizes scale linearly, never quadratically;
* dimension tables (region/nation) stay fixed, like real dims;
* events keep the SAME time range (10x denser traffic, the realistic
  scaling), with user_id offset so per-user volume is constant;
* documents get a per-replica deterministic WORD PERMUTATION (seeded by
  rep), so replicas are not near-duplicates of each other — shingle/
  MinHash dedup rates stay constant instead of exploding 100x in
  candidate pairs, and vocab/length distributions are preserved;
* embeddings get a per-replica fixed DIMENSION PERMUTATION — norms and
  within-replica geometry preserved, cross-replica similarity broken.

Output: $OUT_DIR (default /tmp/pcs_scale/sf1), one parquet per table.
Deterministic: same input -> same bytes (seeds are the replica index).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pcs_scale/sf1"
REPS = int(os.environ.get("PCS_SCALE_REPS", "10"))
# Optional table subset (comma list) for targeted decades: the sf100
# fixture only needs the documents/events/embeddings queries, and a
# full-replication lineitem at that size would hold ~10 in-memory
# replicas of a 60M-row table (OOM class).  Dims are always copied.
ONLY = {
    t for t in os.environ.get("PCS_SCALE_TABLES", "").split(",") if t
} or None

# (table, {col: offset_base_col}) — offset_base is max(col)+1 of the col
KEY_OFFSETS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]  # copied once, not replicated


def _bases(tables: dict[str, pa.Table]) -> dict[str, int]:
    bases: dict[str, int] = {}
    for t, cols in KEY_OFFSETS.items():
        if t not in tables:
            continue
        for c in cols:
            key = c.split("_", 1)[1] if "_" in c else c
            arr = tables[t].column(c).to_numpy(zero_copy_only=False)
            bases[key] = max(bases.get(key, 0), int(arr.max()) + 1)
    return bases


def _permute_words(texts: np.ndarray, rep: int) -> np.ndarray:
    """Deterministic per-replica word shuffle: same vocab, same lengths,
    different shingles (vectorized per doc batch; rep 0 is identity).

    The seed mixes the INPUT SIZE so chained generations (sf0.1 -> sf1
    -> sf10) use distinct permutation families per stage: with
    rep-only seeds, stage-2 rep i applied to stage-1 rep 0 reproduced
    stage-1 rep i BYTE-IDENTICALLY (same seeds, same input), planting
    45,000 fake cross-replica exact-dup pairs in sf10 and inflating
    d2's scale ratio with dup volume the real corpus doesn't have."""
    if rep == 0:
        return texts
    rng = np.random.default_rng(1_000_003 * rep + 7 * len(texts))
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        words = t.split()
        rng2 = np.random.default_rng(rng.integers(1 << 62) ^ i)
        out[i] = " ".join(np.array(words, dtype=object)[rng2.permutation(len(words))])
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    wanted = [t for t in KEY_OFFSETS if ONLY is None or t in ONLY]
    tables = {
        t: pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        for t in wanted + DIMS
    }
    bases = _bases(tables)
    print("key offset bases:", bases)

    for t in DIMS:
        pq.write_table(tables[t], os.path.join(OUT, f"{t}.parquet"))
        print(t, "copied", tables[t].num_rows)

    for t, cols in KEY_OFFSETS.items():
        if t not in tables:
            continue
        src = tables[t]
        reps = []
        for rep in range(REPS):
            cols_out = {}
            for name in src.column_names:
                col = src.column(name)
                if name in cols:
                    key = name.split("_", 1)[1]
                    arr = col.to_numpy(zero_copy_only=False)
                    cols_out[name] = pa.array(
                        arr + rep * bases[key], type=col.type
                    )
                elif t == "documents" and name == "text":
                    cols_out[name] = pa.array(
                        _permute_words(
                            col.to_numpy(zero_copy_only=False), rep
                        ),
                        type=col.type,
                    )
                elif t == "embeddings" and name == "embedding":
                    mat = np.stack(col.to_numpy(zero_copy_only=False))
                    # stage-distinct seed for the same reason as
                    # _permute_words (chained generations must not
                    # reuse a stage's permutation family)
                    perm = np.random.default_rng(
                        777 + rep + 7 * mat.shape[0]
                    ).permutation(mat.shape[1])
                    cols_out[name] = pa.array(
                        list(mat[:, perm]), type=col.type
                    )
                else:
                    cols_out[name] = col.combine_chunks()
            reps.append(pa.table(cols_out, schema=src.schema))
        out = pa.concat_tables(reps)
        # Row groups are Spark's scan-split granularity: a fixed 1Mi-row
        # group left sf10 documents (500k rows, 54 MiB) as ONE group ->
        # the whole Arrow stage ran as a single task on 32 cores and t2
        # measured a fake superlinear 13.8x.  Real corpora arrive in
        # many files/row groups; size groups so every table splits at
        # least ~64 ways (floor 10k rows keeps tiny tables sane).
        rg = max(min(out.num_rows // 64, 1 << 20), 10_000)
        pq.write_table(
            out,
            os.path.join(OUT, f"{t}.parquet"),
            row_group_size=rg,
        )
        print(t, "->", out.num_rows, f"(row_group_size={rg})")


if __name__ == "__main__":
    main()
