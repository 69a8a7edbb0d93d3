#!/usr/bin/env python
"""Generate sf1.0-scale inputs (10x the bench SF) for the dedup/ANN scale
evidence run (round-8 verdict item #2).

Design — controlled 10x, not a new distribution:

- ``documents`` (50,000 rows) = 10 VOCABULARY-DISJOINT replicas of the
  sf0.1 corpus: replica r keeps every document but rewrites word ``w`` to
  ``w || r`` (replica 0 keeps the original text, so sf0.1 is a strict
  subset).  Every replica therefore reproduces the sf0.1 shingle-frequency
  profile, duplicate rate, and length distribution EXACTLY, and replicas
  share no shingles, so the ideal workload is precisely 10x the sf0.1
  workload: candidate volume, verify volume and output rows all scale by
  10.  Measured wall-time ratio vs sf0.1 then isolates ENGINE scaling
  (scheduling, shuffle, memory) from workload-mix drift — the growing
  vocabulary is also the realistic direction (Heaps' law: shingle
  diversity grows with corpus size, which is why per-shingle doc
  frequency does NOT grow 10x on a real 10x corpus).

- ``embeddings`` (20,000 rows) = fresh unit-normal 64-d vectors
  (seed 1042), matching the sf0.1 generative process (random unit
  vectors; labels uncorrelated with geometry — verified on the real
  table: within-label mean cosine 0.003 vs cross-label -0.000).

Output: $OUT_DIR (default /root/repo/.scale/sf1.0)/{documents,embeddings}
.parquet.  Deterministic; ~20 MB total; gitignored (artifact, not
source).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
N_REPLICAS = 10
N_VECTORS = 20_000
DIM = 64
SEED = 1042


def gen_documents(con: duckdb.DuckDBPyConnection) -> None:
    n_base = con.sql(f"SELECT count(*) FROM '{SF01}/documents.parquet'").fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT d.doc_id + r.r * {n_base} AS doc_id,
                 CASE WHEN r.r = 0 THEN d.text
                      ELSE array_to_string(
                             list_transform(string_split(d.text, ' '),
                                            w -> w || CAST(r.r AS VARCHAR)),
                             ' ')
                 END AS text,
                 d.lang, d.source,
                 CAST(length(CASE WHEN r.r = 0 THEN d.text
                      ELSE array_to_string(
                             list_transform(string_split(d.text, ' '),
                                            w -> w || CAST(r.r AS VARCHAR)),
                             ' ')
                 END) AS BIGINT) AS n_chars
          FROM '{SF01}/documents.parquet' d,
               (SELECT unnest(range(0, {N_REPLICAS})) AS r) r
          ORDER BY doc_id
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )


def gen_embeddings() -> None:
    rng = np.random.default_rng(SEED)
    x = rng.standard_normal((N_VECTORS, DIM)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    labels = (np.arange(N_VECTORS) * 2654435761 % 10).astype(np.int32)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECTORS), type=pa.int64()),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(table, f"{OUT}/embeddings.parquet")


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con)
    gen_embeddings()
    n = con.sql(f"SELECT count(*), count(DISTINCT text) FROM '{OUT}/documents.parquet'").fetchone()
    print(f"documents: {n[0]} rows ({n[1]} distinct texts) -> {OUT}")
    print(f"embeddings: {N_VECTORS} x {DIM} -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
