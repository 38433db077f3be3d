"""Deduplication operators — SURVEY §2D: exact, n-gram Jaccard,
MinHash+LSH banding, SimHash. The core of a training-data pipeline.

Scale design (the part that must survive 100 TB):
- Exact dedup shuffles 16-byte md5 digests, never document bodies.
- Candidate generation only ever joins on bounded-width keys (shingle,
  band hash, simhash half) and drops high-frequency shingles (stopword
  shingles would otherwise create quadratic bucket blowup — the
  classic LSH "hot bucket" guard).
- Verification (exact Jaccard) runs only on candidate pairs, which LSH
  keeps near-linear in corpus size.
- All hashes are md5-derived hex strings: deterministic, identical in
  DuckDB (oracle parity), and uniformly distributed — minhash as the
  lexicographic min of hex strings is the same estimator as numeric
  minhash. xxhash64 would be ~2× faster JVM-side; traded for
  cross-engine checkability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texts import shingles_col, tokens_col
from ..sources.tables import table

SHINGLE_K = 3          # tokens per shingle
RARE_SHINGLE_MAX = 50  # drop shingles seen in more docs than this
JACCARD_THRESHOLD = 0.8
MINHASH_K = 8          # signature length
MINHASH_BANDS = 4      # bands of 2 rows each
MINHASH_VERIFY_MIN = 0.5
SIMHASH_BITS = 32      # one bit per md5 hex digit
SIMHASH_BANDS = 4      # 8-bit bands for candidate bucketing
# hamming <= 1 with 4 bands gives pigeonhole-exact recall (a pair
# within distance 1 differs in at most one band). The corpus has a
# tiny shared vocabulary, so looser thresholds degenerate into dense
# near-quadratic pair sets.
SIMHASH_MAX_HAMMING = 1


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s): distinct k-token shingles per document."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(
            "doc_id", F.explode(shingles_col(tokens_col(), SHINGLE_K)).alias("s")
        )
        .distinct()
    )


def _verified_pairs(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (da, db) pairs via shingle joins."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("da"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("_db2"), F.col("s").alias("sb"))
    inter = (
        cand.join(a, "da")
        .join(b, (F.col("db") == F.col("_db2")) & (F.col("sa") == F.col("sb")))
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "da", "n": "na"}), "da")
        .join(sizes.withColumnsRenamed({"doc_id": "db", "n": "nb"}), "db")
        .select(
            "da",
            "db",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text, with the
    surviving (minimum) doc_id and the copy count."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("keeper_id"),
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= 0.8.

    Candidates = pairs sharing at least one *rare* shingle (frequency
    cap bounds bucket fan-out); then exact verification.
    """
    sh = _doc_shingles(spark, sf_dir)
    rare = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= RARE_SHINGLE_MAX)
        .select("s")
    )
    sh_rare = sh.join(rare, "s")
    cand = (
        sh_rare.select(F.col("doc_id").alias("da"), "s")
        .join(sh_rare.select(F.col("doc_id").alias("db"), "s"), "s")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    return _verified_pairs(sh, cand).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures + LSH banding → candidate pairs → verify.

    sig_k(doc) = min over shingles of md5(k || ':' || shingle) as a hex
    string; bands hash consecutive signature pairs. Docs sharing any
    band bucket become candidates; exact Jaccard >= 0.5 verifies.
    """
    sh = _doc_shingles(spark, sf_dir)
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(F.md5(F.concat(F.lit(f"{k}:"), F.col("s"))), 1, 16)
            ).alias(f"sig{k}")
            for k in range(MINHASH_K)
        ]
    )
    bands = F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.md5(F.concat(F.col(f"sig{2 * b}"), F.col(f"sig{2 * b + 1}"))),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    buckets = sigs.select("doc_id", F.explode(bands).alias("band"))
    cand = (
        buckets.select(F.col("doc_id").alias("da"), "band")
        .join(buckets.select(F.col("doc_id").alias("db"), "band"), "band")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    return _verified_pairs(sh, cand).filter(F.col("jaccard") >= MINHASH_VERIFY_MIN)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash near-dup pairs (hamming <= 3).

    Bit j of a doc = sign of Σ over token OCCURRENCES of ±1, where a
    token votes +1 iff hex digit j of md5(token) is odd (md5 gives one
    independent digit per bit). Multiplicity-weighted votes keep the
    hash discriminative even when documents share a small vocabulary
    (set-based simhash degenerates there). Candidate pairs share at
    least one of four 8-bit bands (exploded band join — one shuffle on
    the band key, the standard simhash blocking scheme); verification
    is exact hamming on the bit vectors.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("t"))
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.ascii(F.substring(F.md5(F.col("t")), j, 1)) % 2 == 1, 1
                ).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(1, SIMHASH_BITS + 1)
        ]
    )
    bits = F.array(
        *[
            (F.col(f"b{j}") > 0).cast("int")
            for j in range(1, SIMHASH_BITS + 1)
        ]
    )
    width = SIMHASH_BITS // SIMHASH_BANDS
    bands = F.array(
        *[
            F.concat(
                F.lit(f"{band}:"),
                *[
                    (F.col(f"b{j}") > 0).cast("int").cast("string")
                    for j in range(band * width + 1, (band + 1) * width + 1)
                ],
            )
            for band in range(SIMHASH_BANDS)
        ]
    )
    hashed = bit_sums.select("doc_id", bits.alias("bits"), bands.alias("bands"))
    buckets = hashed.select(
        "doc_id", "bits", F.explode("bands").alias("band")
    )
    cand = (
        buckets.select(
            F.col("doc_id").alias("da"), F.col("bits").alias("ba"), "band"
        )
        .join(
            buckets.select(
                F.col("doc_id").alias("db"), F.col("bits").alias("bb"), "band"
            ),
            "band",
        )
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", "ba", "bb")
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with("ba", "bb", lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.select("da", "db", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )
