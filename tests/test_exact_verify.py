"""verify_mode='exact': pipeline verification by true shingle-set Jaccard."""

import numpy as np

from datasketch_spark.config import DedupConfig
from datasketch_spark.functions.shingles import shingle_hashes_fast
from datasketch_spark.operators.dedup import dedup_pipeline
from datasketch_spark.sources.pages import synth_pages, synth_pages_pdf


def test_exact_verify_pipeline(spark):
    cfg = DedupConfig(threshold=0.5, verify_mode="exact")
    pages = synth_pages(spark, 300, seed=42)
    stages = dedup_pipeline(pages, cfg)
    verified = stages["verified"].collect()
    assert len(verified) > 50
    # Every reported jaccard IS the exact value — recompute independently
    # for a sample of pairs.
    pdf = synth_pages_pdf(300, seed=42)
    url_by_id = {r["doc_id"]: r["url"] for r in stages["docs"].collect()}
    text_by_url = dict(zip(pdf["url"], pdf["text"]))
    for r in verified[:40]:
        sa = set(shingle_hashes_fast(text_by_url[url_by_id[r["a"]]], cfg.shingle_k).tolist())
        sb = set(shingle_hashes_fast(text_by_url[url_by_id[r["b"]]], cfg.shingle_k).tolist())
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(r["est_jaccard"] - true_j) < 1e-12
        assert true_j >= cfg.threshold


def test_exact_vs_est_mode_precision(spark):
    # Exact mode must be a subset-or-equal refinement: every exact-verified
    # pair is >= threshold by definition; est mode may keep borderline
    # pairs whose true J is slightly below.
    pages = synth_pages(spark, 300, seed=42)
    est = {
        (r["a"], r["b"])
        for r in dedup_pipeline(pages, DedupConfig(threshold=0.5))["verified"].collect()
    }
    exact = {
        (r["a"], r["b"])
        for r in dedup_pipeline(
            pages, DedupConfig(threshold=0.5, verify_mode="exact")
        )["verified"].collect()
    }
    # Same candidate generation; both filter at 0.5 — overlap dominates.
    assert len(exact & est) / max(1, len(exact | est)) > 0.8
