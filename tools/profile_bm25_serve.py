"""Component breakdown for stream_bm25_serve_filtered (VERDICT r15 item 8):
replicates the entry's work outside the streaming harness and times each
piece — index build, per-batch upsert/maintain, per-batch filtered probe,
final full probe — so the entry wall decomposes into serve vs maintain vs
lifecycle. Run AFTER the streaming entry itself to compare.

Usage: python tools/profile_bm25_serve.py [--sf DIR] [--stream]
  --stream additionally runs the real entry (lifecycle included) for the
  same-session delta.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.3f}s")
    return out


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]

    from pyspark.sql import functions as F

    from naru_spark.session import get_spark

    spark = get_spark("profile_bm25_serve")
    from naru_spark.entry_pipeline import _BM25_QUERIES, _docs
    from naru_spark.pipeline.retrieval import (
        bm25_maintain_index,
        bm25_topk_from_index,
        bm25_write_index,
    )
    from naru_spark.tmp import tmpdir

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    docs.count()  # warm footers
    allowed = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    base = tmpdir(prefix="prof_bm25_serve_")
    path = base + "/idx"

    parts = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    t("batch0 write_index", lambda: bm25_write_index(parts[0], path))
    t("probe1 (1q filtered)", lambda: bm25_topk_from_index(
        spark, path, _BM25_QUERIES[:1], k=10, doc_filter=allowed).collect())
    t("batch1 maintain", lambda: bm25_maintain_index(parts[1], path, merge_factor=2))
    t("probe2 (1q filtered)", lambda: bm25_topk_from_index(
        spark, path, _BM25_QUERIES[:1], k=10, doc_filter=allowed).collect())
    t("batch2 maintain", lambda: bm25_maintain_index(parts[2], path, merge_factor=2))
    t("probe3 (1q filtered)", lambda: bm25_topk_from_index(
        spark, path, _BM25_QUERIES[:1], k=10, doc_filter=allowed).collect())
    t("final probe (all q, filtered)", lambda: bm25_topk_from_index(
        spark, path, _BM25_QUERIES, k=10, doc_filter=allowed).count())

    if "--stream" in sys.argv:
        import __spark_entry__ as entry_mod

        fn = entry_mod.queries()["stream_bm25_serve_filtered"]
        for r in range(2):
            t(f"ENTRY stream_bm25_serve_filtered rep{r}",
              lambda: fn(spark, sf_dir).count())


if __name__ == "__main__":
    main()
