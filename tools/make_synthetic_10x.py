"""Build the synthetic Nx documents + embeddings corpus used for beyond-sf0.1 scaling
probes (SCALE.md round-4 notes): each copy is caesar-rotated per copy index,
which preserves text length, gram structure, and the within-copy similarity
profile while making copies mutually disjoint — so a 10x corpus scales the
work without changing the near-dup density (a naive copy, or copy with
word-prefix salting, makes char-shingle copies MORE self-similar and turns
the probe output-bound).

Per-copy shift is ``(7*g) % 26`` (7 coprime to 26, so all shifts are
distinct for g < 26); ``copies`` is capped at 26 because a caesar alphabet
only has 26 distinct rotations — beyond that copies would collide. Each
copy's full 26-char mapping is materialized Python-side (the previous
``substr(rot||rot, g, 26)`` ran out of characters past g=27 and silently
made translate() DELETE characters). Only lowercase rotates — the
synthetic corpus is lowercase prose, and rotating digits/punct would
change the tokenizer's word boundaries. The doc_id stride is derived from
``max(doc_id)+1`` of the source, not hardcoded to the sf0.1 corpus size.

Usage: python tools/make_synthetic_10x.py [src_dir] [out_dir] [copies]
       (defaults: /root/testdata/sf0.1 /tmp/sfbig 10; copies <= 26)

Probe pattern (isolated, post-warmup, clearCache between runs):
    q.fn(spark, '/root/testdata/sf0.1').count()   # 1x
    q.fn(spark, '/tmp/sfbig').count()             # 10x
"""

from __future__ import annotations

import os
import sys

import duckdb

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rot(shift: int) -> str:
    return "".join(chr((ord(c) - 97 + shift) % 26 + 97) for c in _ALPHA)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    if not 1 <= copies <= 26:
        raise SystemExit("copies must be in 1..26 (distinct caesar shifts)")
    stride = duckdb.sql(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    rot_rows = ", ".join(
        f"({g}, '{_rot((7 * g) % 26)}')" for g in range(copies)
    )
    os.makedirs(out, exist_ok=True)
    duckdb.sql(f"""
    COPY (
      SELECT d.doc_id + {stride} * CAST(g.g AS BIGINT) AS doc_id,
             CASE WHEN g.g = 0 THEN d.text
                  ELSE translate(d.text, '{_ALPHA}', g.rotstr)
             END AS text,
             d.lang, d.source, d.n_chars
      FROM read_parquet('{src}/documents.parquet') d,
           (VALUES {rot_rows}) AS g(g, rotstr)
    ) TO '{out}/documents.parquet' (FORMAT parquet)
    """)
    n, chars = duckdb.sql(
        f"SELECT count(*), sum(n_chars) FROM '{out}/documents.parquet'"
    ).fetchall()[0]
    print(f"{out}/documents.parquet: {n} docs, {chars} chars "
          f"(stride {stride}, {copies} copies)")

    # embeddings Nx: per-copy deterministic per-dimension SIGN FLIPS —
    # norms and within-copy distances are exactly preserved (so the
    # density/recall profile of each copy matches the source) while
    # copies land in different octants, spreading over ANN buckets like
    # genuinely new content instead of piling into the same ones.
    vstride = duckdb.sql(
        f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]
    duckdb.sql(f"""
    COPY (
      SELECT e.vec_id + {vstride} * CAST(g.g AS BIGINT) AS vec_id,
             CASE WHEN g.g = 0 THEN e.embedding
                  ELSE list_transform(
                         e.embedding,
                         (x, i) -> x * CAST(CASE WHEN
                             hash(g.g * 131 + i) % 2 = 0
                             THEN 1 ELSE -1 END AS FLOAT))
             END AS embedding,
             e.label
      FROM '{src}/embeddings.parquet' e,
           range({copies}) AS g(g)
    ) TO '{out}/embeddings.parquet' (FORMAT parquet)
    """)
    nv = duckdb.sql(
        f"SELECT count(*) FROM '{out}/embeddings.parquet'"
    ).fetchone()[0]
    print(f"{out}/embeddings.parquet: {nv} vectors "
          f"(stride {vstride}, {copies} copies)")


if __name__ == "__main__":
    main()
