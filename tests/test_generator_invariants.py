"""Input-hint invariants: byte-identical text per url across runs and
partitionings (the north rule's per-row invariant)."""

import numpy as np

from datasketch_spark.sources.pages import synth_pages, synth_pages_pdf


def test_generator_deterministic_across_runs():
    a = synth_pages_pdf(200, seed=42)
    b = synth_pages_pdf(200, seed=42)
    assert list(a["url"]) == list(b["url"])
    for ta, tb in zip(a["text"], b["text"]):
        assert ta.encode() == tb.encode()  # byte-identical text
    for ha, hb in zip(a["html"], b["html"]):
        assert ha == hb


def test_generator_partitioning_invariant(spark):
    # Same (seed, index) -> same row regardless of partition layout.
    p3 = {r["url"]: r["text"] for r in synth_pages(spark, 150, seed=42, partitions=3).collect()}
    p11 = {r["url"]: r["text"] for r in synth_pages(spark, 150, seed=42, partitions=11).collect()}
    assert p3 == p11
    driver = dict(zip(*(synth_pages_pdf(150, seed=42)[c] for c in ("url", "text"))))
    assert p3 == driver


def test_generator_different_seeds_differ():
    a = synth_pages_pdf(50, seed=42)
    b = synth_pages_pdf(50, seed=43)
    assert list(a["text"]) != list(b["text"])
