"""End-to-end corpus curation — the composed training-data pipeline:
featurize → filter → exact-dedup, the canonical pre-training data prep
pass (quality/language gates per Gopher/CCNet-style pipelines, exact
dedup before the expensive near-dup stages).

Scale shape:
- ALL per-document features (quality ratios, language scores) come out
  of ONE projection over one scan — no join between featurizers. The
  quality/token filters apply before the dedup join, so the join input
  is the already-curated subset.
- The exact-dedup side shuffles only (md5, min(doc_id)) digests; the
  final keeper join is doc_id-equi (bucketing-friendly at 100 TB —
  sources/bucketed.py layout applies directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texts import LANG_STOPWORDS, count_matches, lang_pattern
from ..sources.tables import documents
from .dedup import dedup_exact
from .textops import lang_pred_case, quality_cols

QUALITY_MIN = 0.5
TOKENS_MIN = 15
TOKENS_MAX = 1000


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept corpus: exact-dedup keepers passing quality and length
    gates, tagged with predicted language and duplicate multiplicity.
    """
    docs = documents(spark, sf_dir).select("doc_id", "text")
    langs = list(LANG_STOPWORDS)
    qc = quality_cols()
    # one pass: quality features + language scores from a single scan;
    # the second select is a stacked projection (same stage), not a
    # second pass.
    feats = docs.select(
        "doc_id",
        *[c.alias(name) for name, c in qc.items()],
        *[count_matches(lang_pattern(lg)).alias(f"s_{lg}") for lg in langs],
    ).select(
        "doc_id",
        "len_chars",
        "n_tokens",
        "quality",
        lang_pred_case().alias("pred_lang"),
    )
    kept = feats.filter(
        (F.col("quality") >= QUALITY_MIN)
        & F.col("n_tokens").between(TOKENS_MIN, TOKENS_MAX)
    )
    keepers = dedup_exact(spark, sf_dir).select(
        F.col("keeper_id").alias("doc_id"), "n_copies"
    )
    return kept.join(keepers, "doc_id").select(
        "doc_id", "pred_lang", "n_tokens", "len_chars", "quality", "n_copies"
    )
