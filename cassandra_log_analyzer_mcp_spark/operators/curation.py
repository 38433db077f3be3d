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
from pyspark.sql.window import Window

from ..functions.texts import LANG_STOPWORDS, count_matches, lang_pattern
from ..sources.tables import documents
from .dedup import dedup_exact
from .textops import lang_pred_case, quality_cols
from ..functions.frames import local_frame

QUALITY_MIN = 0.5
TOKENS_MIN = 15
TOKENS_MAX = 1000

# Deterministic hash-based sampling/splitting: the keep/assign decision
# is a pure function of doc_id, so it reproduces across runs, engines,
# and cluster sizes — no RNG state, no per-partition seeds, and a doc's
# split never changes when the corpus grows (the property that keeps
# eval sets uncontaminated across dataset versions). Thresholds are
# 4-hex-digit prefixes of md5 compared as strings: hex chars order
# lexicographically == numerically, so `substr(md5,1,4) < '8000'`
# keeps exactly 32768/65536 of hash space.
SAMPLE_SALT = "sample:"
SPLIT_SALT = "split:"
#: per-language keep rate (n/65536) — downsample dominant English,
#: keep the rest at 3/4: the usual rebalancing shape.
SAMPLE_RATES = {"en": "8000"}
SAMPLE_DEFAULT_RATE = "c000"
#: cumulative split bounds: train 3/4, valid 1/8, test rest.
SPLIT_BOUNDS = [("train", "c000"), ("valid", "e000")]
SPLIT_LAST = "test"


#: second quality gate for the per-source report (distribution shape)
QUALITY_HI = 0.6


def source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus triage: how many docs each source contributes
    and what share clears the quality gates — the "which crawl is
    junk" report that decides source weights in a data mixture.

    Aggregates only integer-derived stats (counts, boolean pass
    rates, token means): per-doc quality doubles are bit-identical
    across engines, but SUMMING doubles is order-sensitive, so the
    report never adds them — the gate booleans carry the signal.
    """
    docs = documents(spark, sf_dir).select("doc_id", "source", "text")
    qc = quality_cols()
    feats = docs.select(
        "source",
        qc["n_tokens"].alias("n_tokens"),
        (qc["quality"] >= QUALITY_MIN).cast("long").alias("pass_lo"),
        (qc["quality"] >= QUALITY_HI).cast("long").alias("pass_hi"),
    )
    n = F.count("*")
    return feats.groupBy("source").agg(
        n.alias("n_docs"),
        F.round(F.avg("n_tokens"), 2).alias("mean_tokens"),
        F.round(F.sum("pass_lo") / n, 4).alias("pass_rate"),
        F.round(F.sum("pass_hi") / n, 4).alias("hi_rate"),
    )


#: decontamination: n-gram width and the deterministic pseudo-benchmark
#: membership rule (doc_id % EVAL_MOD == 0 plays the held-out set).
DECONTAM_K = 5
EVAL_MOD = 97


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any
    DECONTAM_K-gram with the held-out eval set, with overlap counts —
    the n-gram collision check run before pretraining so eval data
    never leaks into the corpus.

    The eval side is tiny by construction (1/EVAL_MOD of docs), so its
    exploded shingles BROADCAST to the training side: no shuffle of
    the training corpus at all, just a map-side hash-join over each
    scan partition — the shape that keeps this linear at 100 TB.
    """
    from ..functions.texts import shingles_col, tokens_col

    docs = documents(spark, sf_dir).select("doc_id", "text")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_col(tokens_col(), DECONTAM_K))
        ).alias("s"),
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train = grams.filter(~is_eval)
    ev = grams.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"), "s"
    )
    return (
        train.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


#: gram widths for the decontamination sensitivity sweep: 13 is the
#: published pretraining standard (GPT-3 appendix C; Gopher uses
#: 8-gram Jaccard variants), 5 is this repo's default gate, 3 the
#: recall-heavy extreme — the sweep is the evidence for CHOOSING n
DECONTAM_SWEEP_KS = (3, 5, 8, 13)


def decontaminate_ngram_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination SENSITIVITY SWEEP over the n-gram width — the
    precision/recall dial behind the published 13-gram standard: at
    small n the check flags broadly (shared phrases, false
    positives); at n = 13 only real verbatim leakage collides. One
    row per width: training docs flagged, eval docs hit, distinct
    shared grams — all integers; widths with ZERO collisions emit
    explicit zero rows (the "corpus is clean at the published
    standard" finding, not a missing row).

    Scale shape: the same broadcast-eval-side join as decontaminate,
    once per width over a width-tagged gram stream — still zero
    shuffle of the training corpus; the eval side stays
    1/EVAL_MOD-sized per width.
    """
    from ..functions.texts import shingles_col, tokens_col

    docs = documents(spark, sf_dir).select("doc_id", "text")
    grams = None
    for k in DECONTAM_SWEEP_KS:
        g = docs.select(
            F.lit(k).cast("int").alias("gram_k"),
            "doc_id",
            F.explode(
                F.array_distinct(shingles_col(tokens_col(), k))
            ).alias("s"),
        )
        grams = g if grams is None else grams.unionByName(g)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train = grams.filter(~is_eval)
    ev = grams.filter(is_eval).select(
        "gram_k", F.col("doc_id").alias("eval_id"), "s"
    )
    agg = (
        train.join(F.broadcast(ev), ["gram_k", "s"])
        .groupBy("gram_k")
        .agg(
            F.countDistinct("doc_id").alias("flagged"),
            F.countDistinct("eval_id").alias("hit"),
            F.countDistinct("s").alias("shared"),
        )
    )
    anchor = local_frame(spark, 
        [(k,) for k in DECONTAM_SWEEP_KS], "gram_k int"
    )
    return anchor.join(F.broadcast(agg), "gram_k", "left").select(
        "gram_k",
        F.coalesce("flagged", F.lit(0)).cast("long").alias(
            "n_train_flagged"
        ),
        F.coalesce("hit", F.lit(0)).cast("long").alias("n_eval_docs_hit"),
        F.coalesce("shared", F.lit(0)).cast("long").alias(
            "n_shared_grams"
        ),
    )


#: prefix width for the boilerplate census
PREFIX_TOKENS = 8


def doc_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-PREFIX boilerplate census: documents grouped by their
    first PREFIX_TOKENS tokens, keeping prefixes shared by ≥ 2 docs —
    the cheap detector for header/URL/license boilerplate that
    whole-doc dedup misses (the bodies differ) and span detectors
    find only pairwise. Emits the prefix, the copy count, and the
    smallest doc id carrying it (the canonical exemplar).

    Scale shape: one map-side prefix projection, one hash agg keyed
    on the prefix string (≤ PREFIX_TOKENS tokens — bounded key
    width), the ≥2 filter prunes the long singleton tail before any
    further use.
    """
    from ..functions.texts import tokens_col

    docs = documents(spark, sf_dir).select("doc_id", "text")
    prefix = F.array_join(
        F.slice(tokens_col(), 1, PREFIX_TOKENS), " "
    ).alias("prefix")
    return (
        docs.select("doc_id", prefix)
        .filter(F.col("prefix") != "")
        .groupBy("prefix")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("exemplar_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


#: the fuzzy pass holds out 1/31 of docs (vs the exact check's 1/97)
#: so near-dup clusters actually straddle the split at gate scale
FUZZY_EVAL_MOD = 31


def decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY decontamination — near-duplicate contamination the exact
    n-gram check misses: a training doc is flagged when its shingle
    Jaccard against ANY held-out eval doc clears the near-dup bar,
    catching paraphrased/lightly-edited eval leakage (the reason
    modern data recipes run a fuzzy pass alongside exact overlap).
    Emits per flagged training doc the count of near eval docs and
    the best-match Jaccard.

    Pure composition of graded machinery: the shared MinHash band
    index supplies train×eval candidates (band equi-join at collision
    cardinality — never train×eval all-pairs), the shared
    exact-Jaccard array verify scores them, and the eval membership
    rule is decontaminate's modulus split with its own dial
    (FUZZY_EVAL_MOD — wider than the exact check's 1/97 so the
    near-dup×split intersection is non-vacuous at gate scale; the
    mechanism is modulus-independent). Scale shape: the
    eval side is 1/FUZZY_EVAL_MOD of the corpus, candidates are
    band-bounded, and the verify joins per-doc arrays — the same
    discipline as dedup_minhash_lsh, pointed across the split.
    """
    from .dedup import (
        MINHASH_VERIFY_MIN,
        _band_buckets,
        _doc_shingle_arrays,
        _verified_pairs,
    )

    arrs = _doc_shingle_arrays(spark, sf_dir)
    buckets = _band_buckets(arrs)
    is_eval = F.col("doc_id") % FUZZY_EVAL_MOD == 0
    cand = (
        buckets.filter(~is_eval)
        .select(F.col("doc_id").alias("da"), "band")
        .join(
            buckets.filter(is_eval)
            .select(F.col("doc_id").alias("db"), "band"),
            "band",
        )
        .select("da", "db")
        .distinct()
    )
    return (
        _verified_pairs(arrs, cand)
        .filter(F.col("jaccard") >= MINHASH_VERIFY_MIN)
        .groupBy(F.col("da").alias("doc_id"))
        .agg(
            F.countDistinct("db").cast("long").alias("n_eval_near"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def _hash4(salt: str):
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 4
    )


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: per-language keep rates applied
    via salted-hash thresholds. One scan, no shuffle at all — the
    filter is a per-row predicate, so at 100 TB this is a pure map
    stage with full predicate/column pushdown around it.
    """
    docs = documents(spark, sf_dir).select("doc_id", "lang")
    thr = F.lit(SAMPLE_DEFAULT_RATE)
    for lg, rate in SAMPLE_RATES.items():
        thr = F.when(F.col("lang") == lg, F.lit(rate)).otherwise(thr)
    return docs.filter(_hash4(SAMPLE_SALT) < thr)


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment per document.

    Same salted-hash trick with cumulative bounds; returns every doc
    with its split label (a writer would partitionBy('split')).
    """
    docs = documents(spark, sf_dir).select("doc_id", "lang")
    h = _hash4(SPLIT_SALT)
    expr = F.lit(SPLIT_LAST)
    for name, bound in reversed(SPLIT_BOUNDS):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    return docs.select("doc_id", "lang", expr.alias("split"))


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


#: per-source epoch weights for importance resampling (×65536):
#: upsample the rare high-quality source ~2.5×, downsample src0 to
#: half, keep the rest at 1× — the "data mixing" step of a training
#: run. Integer hex thresholds so the fractional-acceptance test is
#: exact on both engines.
RESAMPLE_SALT = "resample:"
RESAMPLE_WEIGHTS = {"src3": (2, "8000"), "src0": (0, "8000")}
RESAMPLE_DEFAULT = (1, "0000")


def importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance resampling: each doc repeats
    floor(w) + (salted-hash < frac(w)) times for its source's weight
    w — the mixture-reweighting pass that turns curation scores into
    an actual training epoch mix (upsampled docs appear with distinct
    copy ids for downstream shuffling).

    Pure map stage: the per-row copy count is a literal CASE + one
    hash compare, the fan-out is posexplode over a repeat array —
    zero shuffle, reproducible across runs/engines/cluster sizes, and
    a doc's copy count never changes as the corpus grows.
    """
    docs = documents(spark, sf_dir).select("doc_id", "source")
    whole = F.lit(RESAMPLE_DEFAULT[0])
    frac_thr = F.lit(RESAMPLE_DEFAULT[1])
    for src, (wh, fr) in RESAMPLE_WEIGHTS.items():
        whole = F.when(F.col("source") == src, wh).otherwise(whole)
        frac_thr = F.when(F.col("source") == src, fr).otherwise(frac_thr)
    h = F.substring(
        F.md5(F.concat(F.lit(RESAMPLE_SALT), F.col("doc_id").cast("string"))),
        1, 4,
    )
    n_copies = (whole + (h < frac_thr).cast("int")).alias("n_copies")
    counted = docs.select("doc_id", "source", n_copies)
    return (
        counted.filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.posexplode(F.array_repeat(F.lit(1), F.col("n_copies")))
            .alias("copy_id", "_one"),
        )
        .select("doc_id", "source", "n_copies", "copy_id")
    )


#: sequence packing: context length (whitespace tokens) and the
#: shard width packing is local to. Packing is inherently sequential,
#: so production pipelines pack WITHIN shards and parallelize across
#: them — block_id is that shard axis here (real runs use the input
#: file/split id); CTX is sized so a few corpus docs share a pack.
PACK_CTX_TOKENS = 256
PACK_BLOCK_DOCS = 64


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for LLM pre-training batches: docs in
    doc_id order within each block pack into PACK_CTX_TOKENS-token
    context windows — a doc joins the current pack while it fits,
    else opens the next; an oversized doc sits alone (truncated).

    The packing loop is genuinely sequential state per shard — not
    expressible with windows (a running sum that RESETS on overflow
    is not a prefix aggregate) — so it runs as an Arrow
    ``applyInPandas`` over block groups: ≤ PACK_BLOCK_DOCS rows of
    (doc_id, n_tokens) per group, never the text. This is the
    engine's second VALUE-HASHED Python stage (after
    multimodal_decode_check): the DuckDB oracle replays the same
    greedy recurrence as a recursive CTE, so the Arrow path's
    arithmetic is checked bit-for-bit, not just its row count.

    Scale: one shuffle of (doc_id, n_tokens) rollup rows keyed by
    block — token counting stays map-side; blocks are independent so
    the stage parallelizes to the shard count.
    """
    import pandas as pd

    from .textops import tokens_col

    docs = documents(spark, sf_dir).select(
        "doc_id",
        F.expr(f"doc_id div {PACK_BLOCK_DOCS}").alias("block_id"),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_id, pack_pos, acc = 0, 0, PACK_CTX_TOKENS + 1
        ids, poss = [], []
        for n in pdf["n_tokens"]:
            if acc + n <= PACK_CTX_TOKENS:
                pack_pos += 1
                acc += n
            else:
                pack_id += 1
                pack_pos = 1
                acc = n
            ids.append(pack_id)
            poss.append(pack_pos)
        pdf["pack_id"] = ids
        pdf["pack_pos"] = poss
        pdf["truncated"] = pdf["n_tokens"] > PACK_CTX_TOKENS
        return pdf

    return docs.groupBy("block_id").applyInPandas(
        pack,
        "doc_id long, block_id long, n_tokens long,"
        " pack_id long, pack_pos long, truncated boolean",
    )


def sequence_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACKING EFFICIENCY report — the table that decides whether the
    greedy packer is good enough or a smarter (offline) packer is
    worth building: per block, the pack count next to the
    information-theoretic floor ceil(used_tokens / CTX), context
    utilization, and the overhead over the floor in permille. A
    block whose overhead stays near zero makes fancier bin-packing
    pointless; one that doesn't names exactly where tokens are being
    burned as padding.

    Computed ENTIRELY from sequence_packing's graded output (the
    Arrow recurrence that is already value-hashed), so this adds no
    new kernel — one block-keyed rollup of integers; the oracle
    nests the packing oracle and re-aggregates.
    """
    seq = sequence_packing(spark, sf_dir)
    used = F.sum(
        F.least(F.col("n_tokens"), F.lit(PACK_CTX_TOKENS))
    ).cast("long")
    agg = seq.groupBy("block_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        used.alias("used_tokens"),
        F.countDistinct("pack_id").cast("long").alias("n_packs"),
    )
    return agg.selectExpr(
        "block_id",
        "n_docs",
        "used_tokens",
        "n_packs",
        f"CAST((used_tokens + {PACK_CTX_TOKENS - 1})"
        f" div {PACK_CTX_TOKENS} AS BIGINT) AS lb_packs",
        f"CAST(1000 * used_tokens div (n_packs * {PACK_CTX_TOKENS})"
        " AS BIGINT) AS utilization_permille",
        f"CAST(CASE WHEN (used_tokens + {PACK_CTX_TOKENS - 1})"
        f" div {PACK_CTX_TOKENS} = 0 THEN 0"
        f" ELSE 1000 * (n_packs - (used_tokens + {PACK_CTX_TOKENS - 1})"
        f" div {PACK_CTX_TOKENS})"
        f" div ((used_tokens + {PACK_CTX_TOKENS - 1})"
        f" div {PACK_CTX_TOKENS}) END AS BIGINT) AS overhead_permille",
    )


#: Deterministic global corpus shuffle: seeded hash key + shard count.
#: 256 prefix blocks (the first two hex chars of the key) make the
#: two-stage global rank exact: block ordering IS key ordering because
#: every key in block '0a' sorts before every key in block '0b'.
SHUFFLE_SALT = "shuffle:seed42:"
SHUFFLE_N_SHARDS = 16
SHUFFLE_BLOCK_HEX = 2


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global corpus shuffle + sharding — the "randomize the
    corpus before training" pass every pre-training run does once per
    epoch seed: order documents by md5(seed || doc_id), assign each a
    global position and a balanced shard id.

    A naive ``row_number() OVER (ORDER BY key)`` funnels the WHOLE
    corpus through one task. Instead the proven two-stage numbering
    shape (operators/analysis._numbered_lines): block = the key's
    2-hex-char prefix (256 blocks, prefix order == key order), number
    within blocks massively parallel, add each block's cumulative
    offset from a broadcast 256-row rollup. ``pos = offset + rank``
    is exactly the global shuffle position; ``shard = (pos-1)·N div
    total`` slices it into SHUFFLE_N_SHARDS near-equal shards (a
    writer would partitionBy('shard')). Everything is a pure function
    of (seed, doc_id): re-runs, engine swaps, and cluster resizes
    reproduce the identical permutation.
    """
    docs = documents(spark, sf_dir).select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat(F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    ).withColumn(
        "block", F.substring("shuffle_key", 1, SHUFFLE_BLOCK_HEX)
    )
    per_block = keyed.groupBy("block").agg(F.count("*").alias("cnt"))
    # 256-row rollup: the global window runs over block COUNTS only,
    # never over corpus rows.
    wb = Window.orderBy("block")
    offsets = per_block.select(
        "block",
        F.coalesce(
            F.sum("cnt").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("offset"),
    )
    total = per_block.agg(F.sum("cnt").alias("total"))
    win = Window.partitionBy("block").orderBy("shuffle_key", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), "block")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "pos",
            (F.col("offset") + F.row_number().over(win)).cast("long"),
        )
        .select(
            "doc_id",
            "shuffle_key",
            "pos",
            F.expr(
                f"cast(((pos - 1) * {SHUFFLE_N_SHARDS}) div total as int)"
            ).alias("shard"),
        )
    )


#: Bloom decontamination: k hash functions into a 16-bit position
#: space (positions ARE 4-hex-char md5 prefixes — no integer
#: conversion, string equality is the membership test). At 100 TB the
#: eval set's Bloom bit-set is a few KB broadcast to every executor,
#: vs broadcasting the full eval shingle set (exact decontaminate) —
#: constant memory regardless of eval-set size, at the price of a
#: deterministic, measurable false-positive rate.
BLOOM_K = 3
BLOOM_POS_HEX = 4


def _bloom_positions(s_col: F.Column) -> F.Column:
    return F.array(
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"b{j}:"), s_col)), 1, BLOOM_POS_HEX
            )
            for j in range(BLOOM_K)
        ]
    )


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the constant-memory variant of
    ``decontaminate``: the eval set compresses to its Bloom position
    set (≤ 2^16 short strings) and a training gram is flagged when ALL
    its BLOOM_K positions are present. Bloom membership is a strict
    superset of exact membership, so no contaminated doc is ever
    missed; the output reports the bloom-hit and exact gram counts per
    doc side by side, making the false-positive behavior itself a
    graded, deterministic quantity (same md5 positions both engines).
    """
    from ..functions.texts import shingles_col, tokens_col

    docs = documents(spark, sf_dir).select("doc_id", "text")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_col(tokens_col(), DECONTAM_K))
        ).alias("s"),
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train = grams.filter(~is_eval)
    ev = grams.filter(is_eval)
    bits = (
        ev.select(F.explode(_bloom_positions(F.col("s"))).alias("p"))
        .distinct()
    )
    tpos = train.select(
        "doc_id", "s", F.explode(_bloom_positions(F.col("s"))).alias("p")
    )
    bloom_hits = (
        tpos.join(F.broadcast(bits), "p")
        .groupBy("doc_id", "s")
        .agg(F.count("*").alias("k_hit"))
        .filter(F.col("k_hit") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bloom_grams"))
    )
    exact = (
        train.join(F.broadcast(ev.select("s").distinct()), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_exact_grams"))
    )
    return bloom_hits.join(exact, "doc_id", "left").select(
        "doc_id",
        "n_bloom_grams",
        F.coalesce("n_exact_grams", F.lit(0)).alias("n_exact_grams"),
        (F.coalesce("n_exact_grams", F.lit(0)) > 0).alias("contaminated"),
    )


def jsonl_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXPORT sink of the curation pipeline: docs + metadata land
    as gzip JSONL sharded by the seeded corpus shuffle — the format
    every training loader actually ingests — then the written shards
    read BACK with an explicit schema into a per-shard rollup that an
    oracle recomputes straight from the source tables. Escaping
    fidelity is the real failure mode JSONL export has (embedded
    quotes/newlines/unicode silently corrupt rows); sum-of-chars and
    doc counts over the ROUND-TRIPPED text catch any mangling, and
    per-shard distinct sources pin the shard assignment itself.

    Scale shape: the shard map is corpus_shuffle's output joined back
    doc_id-equi (bucketing-friendly; broadcast at gate scale), the
    write is partitionBy(shard) with the partition-aligned repartition
    (one writer task per shard — the silver layer's small-file
    lesson), and the rollup reads only shard/text/source columns.
    """
    import os
    import tempfile

    docs = documents(spark, sf_dir).select("doc_id", "text", "source")
    shards = corpus_shuffle(spark, sf_dir).select("doc_id", "shard")
    path = os.path.join(
        tempfile.mkdtemp(prefix=f"jsonl_export_{os.getpid()}_"), "shards"
    )
    (
        docs.join(shards, "doc_id")
        .repartition("shard")
        .write.partitionBy("shard")
        .option("compression", "gzip")
        .json(path)
    )
    back = spark.read.schema(
        "doc_id long, text string, source string, shard int"
    ).option("recursiveFileLookup", "false").json(path)
    return back.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


def domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix weighting per source domain — the data-mixing
    table (cf. The Pile / DoReMi setups): each source's observed token
    share vs the uniform target share, and the per-doc sampling weight
    that rebalances the mix to target.

    weight = target_share / observed_share = total_tokens /
    (n_sources · source_tokens) — exact integer counts divided once at
    the end, so both engines produce bit-identical doubles. One
    source-keyed rollup (20 rows) + a 1-row total broadcast back; the
    token counting itself is a pure map stage at any scale.
    """
    from ..functions.texts import tokens_col

    docs = documents(spark, sf_dir).select(
        "source", F.size(tokens_col()).cast("long").alias("n_tok")
    )
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    totals = per.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("total_tokens")).alias("observed_share"),
        (
            F.col("total_tokens")
            / (F.col("n_sources") * F.col("n_tokens"))
        ).alias("mix_weight"),
    )


#: k_anonymity_audit thresholds: groups smaller than ANON_K violate
#: k-anonymity; groups whose rows all belong to ONE user violate
#: l-diversity (l = 2) — both on the quasi-identifier key below.
ANON_K = 5


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIVACY AUDIT — the release-gate complement to pii_scrub
    (remove identifiers) and silver_delete_rewrite (erase subjects):
    before a dataset ships, measure how re-identifiable it still is.
    Quasi-identifier = (event_type, event date, value band of 50):
    k-anonymity counts cohorts smaller than ANON_K (a row in a
    5-person cohort is 1-in-5 identifiable; a singleton cohort is
    unique), l-diversity counts cohorts where every row belongs to
    ONE user (the cohort key itself leaks that user's activity even
    when k passes).

    One QI-keyed hash aggregate (map-side combinable: count +
    count-distinct-user per cohort), then an event_type rollup of the
    cohort table — cohort-cardinality data after the first shuffle.
    All counts exact integers.
    """
    from ..sources.tables import table
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        (F.floor(F.col("value") / 50) * 50).cast("long").alias("band"),
        "user_id",
    )
    cohorts = ev.groupBy("event_type", "d", "band").agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("n_users"),
    )
    return cohorts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_cohorts"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("n").cast("long").alias("min_cohort"),
        F.sum((F.col("n") < ANON_K).cast("long")).alias(
            "k_violating_cohorts"
        ),
        F.sum(F.when(F.col("n") < ANON_K, F.col("n")).otherwise(0))
        .cast("long")
        .alias("k_violating_rows"),
        F.sum((F.col("n_users") == 1).cast("long")).alias(
            "l_homogeneous_cohorts"
        ),
    )


def _leading_ones(bits_col: F.Column) -> F.Column:
    """Count of leading 1-bits of a positive 63-bit integer column —
    via bin(): position of the first '0' in the zero-padded binary
    string. Pure string/int ops, exact on both engines (the log-free
    route to geometric variates)."""
    padded = F.lpad(F.bin(bits_col), 63, "0")
    return F.coalesce(
        F.nullif(F.instr(padded, "0"), F.lit(0)) - 1, F.lit(63)
    )


def dp_noised_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE-LAPLACE (two-sided geometric, p = 1/2) noised release
    counts — the differential-privacy mechanism SHAPE, fully log-free:
    a geometric(1/2) magnitude is "how many leading 1-bits" in a
    uniform bit string (P[≥ k] = 2^-k exactly), the sign is one more
    bit, and the noise adds to the true per-type count. Everything
    derives from md5(seed ‖ key), so the oracle replays the identical
    draw — which is also the honest caveat, stated loudly: a FIXED
    seed makes this a mechanism demonstration (plumbing, calibration,
    exact sampling without ln()), not a privacy guarantee; production
    swaps the seed column for a secret per-release nonce and the
    guarantee is ε = ln 2 per count.

    Scale: one map-combinable count, then O(groups) noise arithmetic.
    """
    from ..sources.tables import table

    ev = table(spark, sf_dir, "events").select("event_type")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    h = F.md5(F.concat(F.lit("dp-v1:"), F.col("event_type")))
    # 60 bits of the hash → magnitude source; 1 more hex digit → sign
    bits = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    mag = _leading_ones(bits)
    sign = F.when(
        F.conv(F.substring(h, 16, 1), 16, 10).cast("long") % 2 == 0, 1
    ).otherwise(-1)
    return counts.select(
        "event_type",
        F.col("n").cast("long").alias("true_n"),
        (F.col("n") + sign * mag).cast("long").alias("released_n"),
        (sign * mag).cast("long").alias("noise"),
    )


def shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance QA over the training export — the operational
    check the data-loader team runs before an epoch: a skewed shard
    serializes the whole training job to its slowest reader. Per
    shard of the seeded shuffle: doc count and total text bytes,
    plus each shard's exact per-mille share of both (share_pm =
    1000·x/total — one integer numerator over one integer
    denominator, single division, 4dp). Perfect balance reads as
    count_share_pm ≈ 1000/SHUFFLE_N_SHARDS per row; a hot shard
    stands out immediately.

    Composes the graded corpus_shuffle (shard ids are a pure
    function of seed and doc_id) + one shard-keyed rollup + a 1-row
    total broadcast.
    """
    sharded = corpus_shuffle(spark, sf_dir).select("doc_id", "shard")
    sizes = documents(spark, sf_dir).select(
        "doc_id", F.length("text").cast("long").alias("n_bytes")
    )
    per = (
        sharded.join(sizes, "doc_id")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("n_bytes"),
        )
    )
    tot = per.agg(
        F.sum("n_docs").alias("td"), F.sum("n_bytes").alias("tb")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("shard").cast("int"),
        F.col("n_docs").cast("long"),
        F.col("n_bytes").cast("long"),
        F.round(1000 * F.col("n_docs") / F.col("td"), 4).alias(
            "count_share_pm"
        ),
        F.round(1000 * F.col("n_bytes") / F.col("tb"), 4).alias(
            "bytes_share_pm"
        ),
    )


#: greedy token-budget fill: per-source budget = total_tokens div
#: (MIXTURE_BUDGET_DEN · n_sources) — the uniform target share at
#: half-corpus scale, so over-represented sources truncate hard and
#: under-represented ones are taken whole (fill < 1000 permille).
MIXTURE_SALT = "mixture:"
MIXTURE_BUDGET_DEN = 2


def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE a training mixture (domain_mixture only computes the
    weights): each source's documents fill a fixed token budget in
    salted-hash order — the deterministic "draw one epoch of the mix"
    step (Pile/DoReMi-style samplers do exactly this greedy fill).
    A doc is kept iff the tokens BEFORE it in its source's hash order
    fit the budget, so the last kept doc may overshoot by < 1 doc.

    The greedy fill is sequential per source, which is where naive
    implementations put a per-source global window — a scale-killer
    when one source owns half the corpus. Here the running sum is
    TWO-STAGE (the search_logs blocks pattern): docs bucket by their
    2-hex hash prefix, per-(source, block) sums roll up small and
    broadcast back as block offsets, and the within-block window
    partitions by (source, block) — 256 bounded partitions per
    source, never one task per source. The block prefix is a
    monotone prefix of the full hash order, so two-stage cum sums
    equal the naive single-window ones exactly — which is what the
    oracle's plain windowed formulation grades.

    Selection identity is hash-visible (sel_doc_id_sum), not just
    the token census.
    """
    from ..functions.texts import tokens_col

    docs = documents(spark, sf_dir).select(
        "source",
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tok"),
        F.substring(
            F.md5(
                F.concat(F.lit(MIXTURE_SALT), F.col("doc_id").cast("string"))
            ),
            1,
            8,
        ).alias("hh"),
    ).withColumn("blk", F.substring("hh", 1, 2))
    tot = docs.agg(
        F.sum("n_tok").alias("total"),
        F.countDistinct("source").alias("ns"),
    ).select(
        F.expr(
            f"CAST(total div ({MIXTURE_BUDGET_DEN} * ns) AS BIGINT)"
        ).alias("budget_tokens")
    )
    blk_sums = docs.groupBy("source", "blk").agg(
        F.sum("n_tok").alias("blk_tok")
    )
    w_blk = (
        Window.partitionBy("source")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = blk_sums.withColumn(
        "blk_offset", F.sum("blk_tok").over(w_blk) - F.col("blk_tok")
    ).select("source", "blk", "blk_offset")
    w_in = (
        Window.partitionBy("source", "blk")
        .orderBy("hh", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        docs.join(F.broadcast(offsets), ["source", "blk"])
        .withColumn("cum_in", F.sum("n_tok").over(w_in))
        .withColumn(
            "cum_before",
            F.col("blk_offset") + F.col("cum_in") - F.col("n_tok"),
        )
    )
    sel = cum.crossJoin(F.broadcast(tot)).filter(
        F.col("cum_before") < F.col("budget_tokens")
    )
    return sel.groupBy("source", "budget_tokens").agg(
        F.count("*").cast("long").alias("n_docs_sel"),
        F.sum("n_tok").cast("long").alias("tokens_sel"),
        F.sum("doc_id").cast("long").alias("sel_doc_id_sum"),
        F.expr(
            "CAST(1000 * sum(n_tok) div budget_tokens AS BIGINT)"
        ).alias("fill_permille"),
    )


PRIORITY_SALT = "priority:"
PRIORITY_SAMPLE_K = 100


def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED BOTTOM-K sampling (priority / sequential-Poisson
    sampling, Ohlsson 1998; Duffield et al.'s priority sampling) —
    THE distributed weighted-sample primitive: each doc draws a
    deterministic pseudo-uniform u (salted md5 prefix) and competes
    with priority u/weight; the K smallest priorities win. Inclusion
    probability grows with weight (here w = n_tokens + 1, a
    token-proportional corpus draw), heavier docs win ~proportionally
    — and the bottom-K set is MERGEABLE: each partition keeps its
    own bottom-K, TakeOrdered merges them on the driver, no global
    sort, no RNG coordination, repeatable across cluster sizes. The
    ln-free priority (plain u/w, not the A-ES exp-key) keeps both
    engines' doubles bit-identical under the repo's libm ban.

    The rank column is attached AFTER the top-K cut, so its window
    sorts K rows, not the corpus.
    """
    from ..functions.texts import tokens_col

    d = documents(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(PRIORITY_SALT), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("u"),
    )
    pri = d.withColumn(
        "priority", F.col("u") / (F.col("n_tokens") + F.lit(1))
    )
    top = pri.orderBy("priority", "doc_id").limit(PRIORITY_SAMPLE_K)
    w = Window.orderBy("priority", "doc_id")
    return top.withColumn(
        "rn", F.row_number().over(w).cast("int")
    ).select("doc_id", "source", "n_tokens", "priority", "rn")


def corpus_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RELEASE MANIFEST — the one-table answer to "what survived
    each stage of the curation pipeline and how many tokens ship":
    raw → quality/length gate → exact-dedup keepers → decontaminated
    (eval members AND eval-overlapping docs dropped) → sampled
    (per-language rates). Every stage rule is the SAME rule its
    standalone graded operator applies (quality_score's gates,
    dedup_exact's keepers, decontaminate's gram overlap,
    corpus_sample's hash thresholds) — the manifest grades that the
    stages COMPOSE, the integration property no single-operator
    oracle checks.

    One doc-level flag frame (per-doc booleans from one scan + two
    digest-sized joins), five conditional aggregates, stacked to the
    long (stage, n_docs, n_tokens) form a release ledger records.
    Eval-set docs drop at the decontamination stage by definition
    (they ARE the held-out set).
    """
    from ..functions.texts import tokens_col

    qc = quality_cols()
    docs = documents(spark, sf_dir).select("doc_id", "lang", "text")
    feats = docs.select(
        "doc_id",
        "lang",
        qc["n_tokens"].cast("long").alias("n_tokens"),
        (
            (qc["quality"] >= QUALITY_MIN)
            & qc["n_tokens"].between(TOKENS_MIN, TOKENS_MAX)
        )
        .cast("long")
        .alias("g"),
    )
    keepers = dedup_exact(spark, sf_dir).select(
        F.col("keeper_id").alias("doc_id"), F.lit(1).alias("kp")
    )
    contam = (
        decontaminate(spark, sf_dir)
        .select("doc_id", F.lit(1).alias("ct"))
        .distinct()
    )
    thr = F.lit(SAMPLE_DEFAULT_RATE)
    for lg, rate in SAMPLE_RATES.items():
        thr = F.when(F.col("lang") == lg, F.lit(rate)).otherwise(thr)
    f = (
        feats.join(keepers, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "n_tokens",
            "g",
            F.coalesce("kp", F.lit(0)).alias("kp"),
            (
                (F.col("doc_id") % EVAL_MOD != 0)
                & F.col("ct").isNull()
            )
            .cast("long")
            .alias("cl"),
            (_hash4(SAMPLE_SALT) < thr).cast("long").alias("sm"),
        )
    )
    agg = f.agg(
        F.count("*").alias("d0"),
        F.sum("n_tokens").alias("t0"),
        F.sum("g").alias("d1"),
        F.sum(F.col("g") * F.col("n_tokens")).alias("t1"),
        F.sum(F.col("g") * F.col("kp")).alias("d2"),
        F.sum(F.col("g") * F.col("kp") * F.col("n_tokens")).alias("t2"),
        F.sum(F.col("g") * F.col("kp") * F.col("cl")).alias("d3"),
        F.sum(
            F.col("g") * F.col("kp") * F.col("cl") * F.col("n_tokens")
        ).alias("t3"),
        F.sum(F.col("g") * F.col("kp") * F.col("cl") * F.col("sm")).alias(
            "d4"
        ),
        F.sum(
            F.col("g")
            * F.col("kp")
            * F.col("cl")
            * F.col("sm")
            * F.col("n_tokens")
        ).alias("t4"),
    )
    return agg.select(
        F.expr(
            "stack(5,"
            " '0_raw', d0, t0,"
            " '1_gated', d1, t1,"
            " '2_deduped', d2, t2,"
            " '3_decontaminated', d3, t3,"
            " '4_sampled', d4, t4)"
        ).alias("stage", "n_docs", "n_tokens")
    ).select(
        "stage",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


#: Rebalance eval: cluster grows REBAL_N -> REBAL_N + 1 shards.
REBAL_N = 8


def shard_rebalance_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of the corpus MOVES when the shard count grows
    N → N+1, under two placement schemes: naive ``mod`` (doc_id % N —
    nearly EVERYTHING moves: only keys whose two residues coincide
    stay) and ``hrw`` rendezvous hashing (Thaler & Ravishankar 1998:
    place each doc on argmax_s md5(doc:s) — only docs whose argmax IS
    the new shard move, ≈ 1/(N+1) of the corpus). This is the
    consistent-placement arithmetic behind shard splits, cache rings,
    and bucket-count evolution (partition_evolution_read's logical
    cousin): at 100 TB the difference is re-shuffling ~11% of the
    data versus ~89% of it.

    Exactness: scores are 48-bit md5 integers with the shard id as a
    ×16 tiebreak (unique argmax by construction), winners picked with
    max_by + FILTER — every moved/stayed decision is integer-exact
    on both engines. One scan, one doc-keyed aggregate, a 2-row
    result.
    """
    n = REBAL_N
    d = documents(spark, sf_dir).select("doc_id")
    scored = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n))).alias("s"),
    ).select(
        "doc_id",
        "s",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("doc_id").cast("string"),
                            F.col("s").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            * 16
            + F.col("s")
        ).alias("score"),
    )
    hrw = scored.groupBy("doc_id").agg(
        F.expr(f"max_by(s, score) FILTER (WHERE s < {n})").alias("old_s"),
        F.expr("max_by(s, score)").alias("new_s"),
    )
    hrw_row = hrw.agg(
        F.lit("hrw").alias("scheme"),
        F.count("*").alias("n_docs"),
        F.sum((F.col("old_s") != F.col("new_s")).cast("long")).alias(
            "n_moved"
        ),
    )
    mod_row = d.agg(
        F.lit("mod").alias("scheme"),
        F.count("*").alias("n_docs"),
        F.sum(
            (F.pmod("doc_id", F.lit(n)) != F.pmod("doc_id", F.lit(n + 1)))
            .cast("long")
        ).alias("n_moved"),
    )
    return (
        hrw_row.unionByName(mod_row)
        .select(
            "scheme",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_moved").cast("long").alias("n_moved"),
            F.expr("CAST(1000 * n_moved div n_docs AS BIGINT)").alias(
                "moved_permille"
            ),
        )
    )


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED mixture weights (τ = 0.5) per language —
    the standard multilingual rebalancing (sample language i with
    probability ∝ p_i^τ instead of p_i, so tail languages are
    up-sampled without letting any single head language dominate —
    the mBERT/XLM-R exponential-smoothing recipe). The report a
    mixture planner reads next to domain_mixture's caps.

    Exact-integer protocol: p^0.5 is realized as floor(sqrt(n_docs))
    — sqrt is a CORRECTLY-ROUNDED IEEE op (unlike ln/pow, which are
    libm-divergent and banned), so both engines floor the identical
    double, and every share is a floor-div permille of exact integer
    sums. boost_permille = temperature share − raw share (positive =
    up-sampled tail, negative = down-sampled head).

    Scale: one (lang)-keyed partial agg over documents + a broadcast
    1-row total — nothing else.
    """
    from ..functions.texts import tokens_col

    per = (
        documents(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size(tokens_col()).cast("long"))
            .cast("long")
            .alias("n_tokens"),
        )
        .withColumn(
            "w", F.floor(F.sqrt(F.col("n_docs"))).cast("long")
        )
    )
    tot = per.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("w").alias("tot_w")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr("CAST(1000 * n_docs div tot_docs AS BIGINT)").alias(
            "share_permille"
        ),
        F.expr("CAST(1000 * w div tot_w AS BIGINT)").alias(
            "temp_share_permille"
        ),
        F.expr(
            "CAST(1000 * w div tot_w - 1000 * n_docs div tot_docs"
            " AS BIGINT)"
        ).alias("boost_permille"),
    )
