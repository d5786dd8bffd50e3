"""Regenerate the 10x benchmark upsample (``localdata_sf1/``).

The scale-ratio gate (``tools/scale_gate.py``) measures every catalog
query at sf0.1 and at a 10x volume; this script builds that volume
deterministically from ``/root/testdata/sf0.1`` as 10 DISTINCT
replicas per table (SCALING.md "Measured scaling"):

  * key columns get a per-replica offset (+1e8 * r) applied to every
    primary AND foreign key in lockstep, so joins resolve within a
    replica and never across replicas — row counts and join
    cardinalities scale exactly 10x;
  * text/name columns are vowel-rotated by the replica index, so
    text-dedup queries see distinct-but-same-shaped corpora (same
    lengths, token counts, and n-gram profile class);
  * embeddings: replica 1 is a near-identical copy (+0.1% scale on
    every component — cosine ≈ 1), replicas 2+ are component-rotated
    (np.roll by a replica-dependent lag) and therefore decorrelated;
    the coarse-cell ``label`` is offset per replica (+1000·r) so cell
    COUNT grows with the corpus while per-cell population stays
    constant — the way a real IVF deployment scales its cell count
    with data. The first r8 cut copied labels verbatim: fixed cell
    count × 10× rows = 100× within-cell pair scoring, which blew
    d_embedding_neardup to 147 s / d_semantic_dedup to 112 s at sf1.
    That quadratic regime is a mis-sized-index fixture property, not
    an engine path worth benching — cell-blocked pair joins are
    documented (SCALING.md) to require cell sizing/salting at scale;
  * the tiny dims (region, nation) are NOT replicated: customer's and
    supplier's nationkeys are copied unchanged, so replicating nation
    would dangle nothing but would change dim-join fan-in — a single
    copy keeps every FK valid.

The output is bench-only data (no DuckDB oracle runs at sf1), so the
generator optimizes for determinism and shape-fidelity, not value
semantics.

Usage:
    python tools/make_upsample.py [--out localdata_sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROOT = Path(__file__).resolve().parent.parent
SRC = Path("/root/testdata/sf0.1")

#: per-replica key offset — far above any sf0.1 key, so replica key
#: ranges can never collide
OFFSET = 100_000_000

#: table -> (int64 key columns to offset, string columns to rotate)
PLAN: dict[str, tuple[list[str], list[str]]] = {
    "customer": (["c_custkey"], ["c_name"]),
    "orders": (["o_orderkey", "o_custkey"], []),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "part": (["p_partkey"], ["p_name"]),
    "supplier": (["s_suppkey"], ["s_name"]),
    "events": (["event_id", "user_id"], []),
    "documents": (["doc_id"], ["text"]),
    "embeddings": (["vec_id"], []),
}

#: copied through as a single replica (see module docstring)
SINGLE_COPY = ("region", "nation")

_V = "aeiou"
_VU = _V.upper()


def _rotate_table() -> list[tuple[str, str]]:
    """Vowel-rotation translation tables, one per shift 0..4."""
    out = []
    for s in range(5):
        src = _V + _VU
        dst = _V[s:] + _V[:s] + _VU[s:] + _VU[:s]
        out.append((src, dst))
    return out


_ROT = _rotate_table()


def _perturb_embeddings(col: pa.ChunkedArray, r: int) -> pa.ChunkedArray:
    """Replica 1: near-identical twin (cosine ≈ 1). Replicas 2+:
    component-rotated, decorrelated (see module docstring)."""
    import numpy as np

    out = []
    for chunk in col.chunks:
        flat = chunk.flatten().to_numpy(zero_copy_only=False)
        offsets = chunk.offsets.to_numpy(zero_copy_only=False)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
        mat = flat.reshape(-1, dim)
        if r == 1:
            mat = mat * np.float32(1.001)
        else:
            mat = np.roll(mat, (r * 7) % max(dim, 1), axis=1)
        out.append(
            pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(mat.ravel(), type=pa.float32()),
            )
        )
    return pa.chunked_array(out)


def _replicate(tbl: pa.Table, keys: list[str], texts: list[str], r: int) -> pa.Table:
    if r == 0:
        return tbl
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if name == "embedding":
            col = _perturb_embeddings(col, r)
        elif name == "label":
            # replica-local coarse cells: cell count scales with the
            # corpus, per-cell population stays constant (see module
            # docstring)
            col = pc.add(col, pa.scalar(1000 * r, type=col.type))
        elif name in keys:
            col = pc.add(col, pa.scalar(OFFSET * r, type=col.type))
        elif name in texts and r % 5:
            src, dst = _ROT[r % 5]
            trans = str.maketrans(src, dst)
            col = pa.chunked_array(
                [
                    pa.array(
                        chunk.to_pandas().str.translate(trans),
                        type=pa.string(),
                    )
                    for chunk in col.chunks
                ]
            )
        cols[name] = col
    return pa.table(cols)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "localdata_sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for t in SINGLE_COPY:
        tbl = pq.read_table(SRC / f"{t}.parquet")
        pq.write_table(tbl, out / f"{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows (single copy)")

    for t, (keys, texts) in PLAN.items():
        tbl = pq.read_table(SRC / f"{t}.parquet")
        parts = [_replicate(tbl, keys, texts, r) for r in range(args.replicas)]
        big = pa.concat_tables(parts)
        pq.write_table(big, out / f"{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {big.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
