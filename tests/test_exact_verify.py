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


def test_winnow_guarantee_property():
    # The correctness foundation of the substring_edges oracle: ANY common
    # substring of length >= k + w - 1 must yield a shared fingerprint at
    # aligned positions in both docs (so extend-verify recovers the match).
    # Pure-numpy property check over random plants.
    import numpy as np

    from datasketch_spark.operators.suffix import _gram_hashes, winnow

    rng = np.random.RandomState(17)
    k, w = 11, 7
    min_len = k + w - 1
    for trial in range(25):
        block_len = int(rng.randint(min_len, min_len + 30))
        block = rng.randint(0, 256, block_len).astype(np.uint8)
        pad_a = rng.randint(0, 256, int(rng.randint(0, 40))).astype(np.uint8)
        pad_b = rng.randint(0, 256, int(rng.randint(0, 40))).astype(np.uint8)
        doc_a = np.concatenate([pad_a, block, rng.randint(0, 256, 25).astype(np.uint8)])
        doc_b = np.concatenate([rng.randint(0, 256, 33).astype(np.uint8), block, pad_b])
        ha, hb = _gram_hashes(doc_a, k), _gram_hashes(doc_b, k)
        sa, sb = winnow(ha, w), winnow(hb, w)
        start_a, start_b = len(pad_a), 33
        # aligned shared fingerprint inside the planted block?
        found = False
        for pa in sa:
            off = pa - start_a
            if 0 <= off <= block_len - k:
                pb = start_b + off
                if pb in set(sb.tolist()) and ha[pa] == hb[pb]:
                    found = True
                    break
        assert found, f"trial {trial}: no aligned shared fingerprint"
