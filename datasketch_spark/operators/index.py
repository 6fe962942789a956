"""MinHashLSH index lifecycle as functional table operations.

The reference's ``MinHashLSH`` is a mutable KV-backed object; here the
index IS two tables (signatures, bands) and every lifecycle method is a
pure DataFrame->DataFrame transform (append/anti-join/union), matching:

  - ``insert`` / ``insertion_session``  (lsh.py:213-231,253-289) -> union
    of band rows (writes are batched by construction)
  - ``remove`` / ``deletion_session``   (lsh.py:497-528,592-668) -> anti-join
  - ``merge``                           (lsh.py:233-251,349-368) -> unionByName
    (+ optional duplicate-key check, the reference's check_overlap)
  - ``__contains__``                    (lsh.py:530-535)         -> semi-join
  - ``is_empty``                        (lsh.py:485-495)         -> isEmpty
  - ``get_counts``                      (lsh.py:560-589)         -> histogram

On a lakehouse the functional update is an Iceberg MERGE/append; the class
carries DataFrames so tests run in-memory.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.operators import lsh


@dataclass(frozen=True)
class MinHashLSHIndex:
    """Immutable snapshot of an LSH index; mutators return new snapshots."""

    cfg: DedupConfig
    signatures: DataFrame  # (key, sig)
    bands: DataFrame  # (key, band_idx, band_hash)
    key_col: str = "doc_id"

    @classmethod
    def build(
        cls, sig_df: DataFrame, cfg: DedupConfig, key_col: str = "doc_id"
    ) -> "MinHashLSHIndex":
        return cls(
            cfg=cfg,
            signatures=sig_df.select(key_col, "sig"),
            bands=lsh.bands_table(sig_df, cfg, key_col=key_col),
            key_col=key_col,
        )

    def insert(self, new_sigs: DataFrame) -> "MinHashLSHIndex":
        """Upsert new keys: LATER WRITES WIN, deterministically — existing
        rows for incoming keys are anti-joined away from BOTH tables before
        the union, so a key's signature row and its band rows always come
        from the same insert (the r1 dropDuplicates kept an arbitrary row,
        which could mix band rows across inserts). The reference instead
        errors on duplicate keys (lsh.py:342-343); on a lakehouse this
        transform is exactly an Iceberg MERGE ... WHEN MATCHED REPLACE.

        Precondition: ``new_sigs`` has unique keys within the batch (the
        same contract as the reference's insertion_session)."""
        incoming = new_sigs.select(self.key_col, "sig")
        keys = incoming.select(self.key_col)
        sigs = self.signatures.join(keys, self.key_col, "left_anti").unionByName(
            incoming
        )
        new_bands = lsh.bands_table(new_sigs, self.cfg, key_col=self.key_col)
        bands = self.bands.join(keys, self.key_col, "left_anti").unionByName(
            new_bands
        )
        return MinHashLSHIndex(self.cfg, sigs, bands, self.key_col)

    def remove(self, keys: DataFrame) -> "MinHashLSHIndex":
        """Delete keys from signatures + all band buckets
        (reference ``lsh.py:497-528``)."""
        k = keys.select(self.key_col)
        return MinHashLSHIndex(
            self.cfg,
            self.signatures.join(k, self.key_col, "left_anti"),
            self.bands.join(k, self.key_col, "left_anti"),
            self.key_col,
        )

    def merge(self, other: "MinHashLSHIndex", check_overlap: bool = False) -> "MinHashLSHIndex":
        """Union two indexes built with equivalent configs
        (reference ``lsh.py:233-251``)."""
        if (self.cfg.num_perm, self.cfg.b, self.cfg.r) != (
            other.cfg.num_perm,
            other.cfg.b,
            other.cfg.r,
        ):
            raise ValueError("Cannot merge: incompatible (num_perm, b, r)")
        if check_overlap:
            overlap = self.signatures.join(
                other.signatures, self.key_col, "inner"
            ).count()
            if overlap:
                raise ValueError(f"Cannot merge: {overlap} overlapping keys")
        # Without check_overlap, overlapping keys COEXIST — exactly the
        # reference's merged-hashtable behavior (lsh.py:349-368): both
        # sides' band rows stay queryable; query-side collect_set dedups
        # candidates. (The r1 dropDuplicates picked an arbitrary winner,
        # which could pair one side's signature with the other's bands.)
        return MinHashLSHIndex(
            self.cfg,
            self.signatures.unionByName(other.signatures),
            self.bands.unionByName(other.bands),
            self.key_col,
        )

    def contains(self, keys: DataFrame) -> DataFrame:
        """(key, present: bool) for the given keys."""
        present = self.signatures.select(self.key_col).withColumn(
            "present", F.lit(True)
        )
        return (
            keys.select(self.key_col)
            .join(present, self.key_col, "left")
            .withColumn("present", F.coalesce("present", F.lit(False)))
        )

    def is_empty(self) -> bool:
        return self.signatures.isEmpty()

    def counts(self) -> DataFrame:
        return lsh.bucket_histogram(self.bands)

    def query(self, query_sigs: DataFrame, query_key: str = "query_id") -> DataFrame:
        q_bands = lsh.bands_table(query_sigs, self.cfg, key_col=query_key)
        return lsh.lsh_query(self.bands, q_bands, query_key, self.key_col)

    def all_pairs(self) -> DataFrame:
        return lsh.candidate_pairs(self.bands, self.cfg, key_col=self.key_col)
