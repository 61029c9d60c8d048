"""Build the synthetic 10x documents corpus used for beyond-sf0.1 scaling
probes (SCALE.md round-4 notes): each copy is caesar-rotated per copy index,
which preserves text length, gram structure, and the within-copy similarity
profile while making copies mutually disjoint — so a 10x corpus scales the
work without changing the near-dup density (a naive copy, or copy with
word-prefix salting, makes char-shingle copies MORE self-similar and turns
the probe output-bound).

Usage: python tools/make_synthetic_10x.py [src_dir] [out_dir] [copies]
       (defaults: /root/testdata/sf0.1 /tmp/sfbig 10)

Probe pattern (isolated, post-warmup, clearCache between runs):
    q.fn(spark, '/root/testdata/sf0.1').count()   # 1x
    q.fn(spark, '/tmp/sfbig').count()             # 10x
"""

from __future__ import annotations

import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    rot = "".join(
        chr((ord(c) - 97 + 7) % 26 + 97) for c in "abcdefghijklmnopqrstuvwxyz"
    )
    import os

    os.makedirs(out, exist_ok=True)
    duckdb.sql(f"""
    COPY (
      SELECT doc_id + 5000 * CAST(g.g AS BIGINT) AS doc_id,
             CASE WHEN g.g = 0 THEN text
                  ELSE translate(text, 'abcdefghijklmnopqrstuvwxyz',
                       substr('{rot}' || '{rot}', CAST(g.g AS INTEGER), 26))
             END AS text,
             lang, source, n_chars
      FROM read_parquet('{src}/documents.parquet'),
           (SELECT unnest(range(0, {copies})) AS g) g
    ) TO '{out}/documents.parquet' (FORMAT parquet)
    """)
    n, chars = duckdb.sql(
        f"SELECT count(*), sum(n_chars) FROM '{out}/documents.parquet'"
    ).fetchall()[0]
    print(f"{out}/documents.parquet: {n} docs, {chars} chars")


if __name__ == "__main__":
    main()
