"""Multimodal column plumbing — SURVEY §2D.

Treats media as opaque ``binary`` payloads with a typed metadata
struct, and runs "decode / feature-extract" as an Arrow-batched
``mapInPandas`` stage — the one place in the engine where Python
touches rows, by design: real decoders (PIL/ffmpeg/torchaudio) are
C-library calls that belong in a vectorized Python worker, not in JVM
expressions.

The decode itself is STUBBED (the container ships no media libraries):
``_decode_stub`` derives deterministic features from the payload bytes
so the full pipeline — schema, batching, partitioning, downstream
aggregation — is real and testable. Swap ``_decode_stub`` for a real
decoder to productionize; nothing else changes.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
payloads never hit the driver; the downstream aggregate is a normal
hash agg. At 100 TB the payload column stays columnar parquet and the
decode stage is the natural GPU/accelerator boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import documents

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    For the testdata the payload is the UTF-8 text bytes; in a real
    corpus this column is the raw image/audio bytes read from parquet.
    """
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 24).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake/raw").alias("mime"),
        ).alias("meta"),
    )


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode: per-payload byte statistics.

    A real implementation would decode ``payload`` with an image/audio
    library and emit embeddings / resized frames. NotImplementedError
    is deliberately NOT raised — the stub produces stable values so
    the pipeline is end-to-end testable without media libs.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_bytes": payloads.map(len).astype("int64"),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
                "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
            }
        )


def decode_features(media: DataFrame) -> DataFrame:
    return media.mapInPandas(_decode_stub, FEATURE_SCHEMA)


def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: attach media columns → Arrow decode → per-source agg.

    Rows-only driver check (the decode stage is not SQL-expressible by
    design); unit tests assert the deterministic feature values.
    """
    feats = decode_features(with_media_columns(documents(spark, sf_dir)))
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("mean_byte"), 2).alias("avg_mean_byte"),
        F.round(F.avg("width"), 2).alias("avg_width"),
    )


def multimodal_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow decode stage ITSELF, hash-checked: per-doc features
    out of the real ``mapInPandas`` path (payload byte count, mean
    byte value, metadata dims) — every one SQL-recomputable because
    the stub's features are deterministic functions of the payload
    bytes. This is the strongest multimodal evidence the gate can
    give: the Python-worker Arrow round trip (schema mapping, batch
    iteration, struct field access) must be byte-equivalent to
    independent SQL, not just row-count-stable.

    mean_byte is an exact-integer byte sum divided by an exact count —
    bit-identical IEEE division on both engines, no rounding needed.
    (The oracle recomputes byte sums via per-char codepoints, exact
    for the ASCII corpus; a future non-ASCII drop would flag here
    loudly rather than silently.)
    """
    feats = decode_features(with_media_columns(documents(spark, sf_dir)))
    return feats.select(
        "doc_id", "source", "n_bytes", "mean_byte", "width", "height"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_hash", StringType()),
    ]
)

#: frame-sampling policy: up to MAX_FRAMES evenly-spaced frames per
#: payload, each "resized" to half resolution with a floor.
MAX_FRAMES = 4
MIN_DIM = 16
FAKE_FPS_MS = 40  # 25 fps


def _frame_sample_stub(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake frame sampler: a 1→N Arrow fan-out (each
    input row yields up to MAX_FRAMES output rows) — the batch shape
    real video sampling has, which the 1→1 decode stub does not
    exercise. Frames are evenly-spaced byte slices; "resize" halves
    the metadata dimensions with a floor; the hash is md5 of the
    slice. Swap the slicing for ffmpeg keyframe extraction to
    productionize — schema and fan-out shape are already right.
    """
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
        for _, row in pdf.iterrows():
            payload = row["payload"]
            n = len(payload)
            n_frames = min(MAX_FRAMES, max(1, n // 64))
            step = n // n_frames if n_frames else 0
            for k in range(n_frames):
                chunk = payload[k * step : (k + 1) * step] if step else b""
                out["doc_id"].append(row["doc_id"])
                out["frame_idx"].append(k)
                out["ts_ms"].append(k * FAKE_FPS_MS)
                out["out_width"].append(
                    max(MIN_DIM, int(row["meta"]["width"]) // 2)
                )
                out["out_height"].append(
                    max(MIN_DIM, int(row["meta"]["height"]) // 2)
                )
                out["frame_bytes"].append(len(chunk))
                out["frame_hash"].append(hashlib.md5(bytes(chunk)).hexdigest())
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64", "frame_idx": "int32", "ts_ms": "int64",
                "out_width": "int32", "out_height": "int32",
                "frame_bytes": "int64",
            }
        )


def sample_frames(media: DataFrame) -> DataFrame:
    return media.mapInPandas(_frame_sample_stub, FRAME_SCHEMA)


def multimodal_frames_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow FRAME-SAMPLING stage itself, hash-checked per frame —
    the 1→N fan-out analogue of multimodal_decode_check: every emitted
    frame row (index, timestamp, resized dims, slice length, slice
    md5) is SQL-recomputable because the stub slices payload bytes
    deterministically and the corpus is ASCII (byte slices == char
    slices). Proves the fan-out batch shape, not just its row count:
    an off-by-one in the slicing or a mis-mapped struct field
    hash-mismatches. The per-doc rollup stays rows-only
    (multimodal_frames); this is its value-level twin.
    """
    return sample_frames(with_media_columns(documents(spark, sf_dir)))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample + resize over the media columns, rolled up per
    document: frame count, bytes sampled, distinct frame hashes (the
    dedup handle for near-identical frames), output resolution.

    Rows-only driver check like multimodal_pipeline; the fan-out
    counts and hash determinism are unit-tested exactly.
    """
    frames = sample_frames(with_media_columns(documents(spark, sf_dir)))
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("frame_bytes").alias("sampled_bytes"),
        F.countDistinct("frame_hash").alias("n_distinct_frames"),
        F.max("out_width").alias("out_width"),
        F.max("out_height").alias("out_height"),
    )


#: synthetic PCM: AUDIO_CHUNKS md5 blocks → 16·AUDIO_CHUNKS bytes →
#: big-endian int16 samples, AUDIO_WIN samples per analysis window
#: (one md5 block per window, so win_id == chunk index).
AUDIO_CHUNKS = 4
AUDIO_WIN = 8

_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_id", IntegerType()),
        StructField("energy", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def with_audio_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic raw-PCM binary payload (md5-chained
    bytes) — the decode-free modality: raw PCM needs no codec
    library, so unlike the image stub the WHOLE audio path (binary
    column → Arrow batch → numpy window math) computes real values
    end to end."""
    parts = [
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":a{c}")))
        for c in range(AUDIO_CHUNKS)
    ]
    return docs.select("doc_id", F.unhex(F.concat(*parts)).alias("pcm"))


def _audio_energy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Vectorized per-window energy over int16 PCM: ONE frombuffer of
    the whole Arrow batch (equal-length payloads), reshape to
    (docs, windows, samples), integer square-sum — no per-row Python,
    no floats (int64 energy is exact and engine-portable)."""
    import numpy as np

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        arr = (
            np.frombuffer(b"".join(pdf["pcm"]), dtype=">i2")
            .astype(np.int64)
            .reshape(n, -1)
        )
        nw = arr.shape[1] // AUDIO_WIN
        w = arr.reshape(n, nw, AUDIO_WIN)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), nw),
                "win_id": np.tile(np.arange(nw, dtype=np.int32), n),
                "energy": (w * w).sum(axis=2).ravel(),
                "peak": np.abs(w).max(axis=2).ravel().astype(np.int32),
            }
        )


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio-energy extraction with VALUE-LEVEL grading of
    the binary path: the payload is genuine raw PCM in a binary
    column, the feature stage is a genuine Arrow ``mapInPandas``
    numpy kernel, and because raw PCM needs no decoder the oracle can
    recompute every sample from the same md5 hex arithmetic in SQL —
    extending multimodal_decode_check's evidence from byte statistics
    to a real signal-processing kernel (per-window energy + peak).

    Scale shape: map-only (zero shuffles before the gate's collect);
    payload bytes stream executor-side through Arrow batches and
    never hit the driver; the kernel is one vectorized reshape over
    the whole batch, not per-row Python.
    """
    docs = documents(spark, sf_dir).select("doc_id")
    return with_audio_payload(docs).mapInPandas(
        _audio_energy_batches, _AUDIO_SCHEMA
    )


#: perceptual-hash dedup constants: 8×8 grayscale thumbnail (the
#: classic aHash grid), doc_id//PHASH_GROUP docs share a base image
#: with PHASH_PERTURB pixels replaced per doc (planted near-dups the
#: oracle can re-derive); 4 bands × 16 bits is pigeonhole-lossless
#: for Hamming ≤ 3.
PHASH_PIXELS = 64
PHASH_GROUP = 5
PHASH_PERTURB = (7, 23, 42)
PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_MAX_HAMMING = 3


def with_image_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic 64-byte 8×8 grayscale thumbnail as a
    binary column: docs in the same PHASH_GROUP share an md5-derived
    base image, and each doc's PHASH_PERTURB pixels are replaced with
    doc-specific bytes — the "same photo, small edit" population a
    perceptual hash exists to catch. Pure hex-string surgery on JVM
    expressions (codegen'd), so the SQL oracle can rebuild every
    pixel with the same md5 arithmetic."""
    g = (F.col("doc_id") / PHASH_GROUP).cast("long").cast("string")
    base = F.concat(
        *[F.md5(F.concat(g, F.lit(f":i{c}"))) for c in range(4)]
    )
    dmd = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":px")))
    segs = []
    prev = 0
    for j, p in enumerate(PHASH_PERTURB):
        if 2 * p > prev:
            segs.append(F.substring(base, prev + 1, 2 * p - prev))
        segs.append(F.substring(dmd, 2 * j + 1, 2))
        prev = 2 * p + 2
    segs.append(F.substring(base, prev + 1, 2 * PHASH_PIXELS - prev))
    return docs.select("doc_id", F.unhex(F.concat(*segs)).alias("img"))


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized aHash over the whole Arrow batch: one frombuffer,
    reshape (docs, 64), integer mean threshold (64·v > Σv — no
    float), packbits big-endian so grid pixel 0 lands in hash bit 63,
    viewed as signed int64 (two's complement, mirrored in SQL)."""
    import numpy as np

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        px = (
            np.frombuffer(b"".join(pdf["img"]), dtype=np.uint8)
            .astype(np.int64)
            .reshape(n, PHASH_PIXELS)
        )
        bits = (px * PHASH_PIXELS) > px.sum(axis=1, keepdims=True)
        ph = np.packbits(bits, axis=1).view(">i8").ravel().astype(np.int64)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].to_numpy(), "phash": ph}
        )


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUPLICATE IMAGES by perceptual hash — the multimodal ×
    dedup cross: binary thumbnails → Arrow ``mapInPandas`` aHash
    kernel (real bit-level signal math, value-graded because the
    oracle rebuilds every pixel from the md5 hex arithmetic) → the
    SAME banded LSH discipline as dedup_simhash, now over a 64-bit
    image hash: 4×16-bit bands bucket the corpus, candidates join
    per band (O(collisions), never O(n²)), and true Hamming ≤ 3
    confirms — pigeonhole makes the banding LOSSLESS at this
    threshold, so recall is exactly "all pairs within 3 bits".

    Recall note (property of aHash, not of the plan): a replaced
    pixel flips its hash bit only when it crosses the image mean, so
    planted neighbors land at Hamming 0–3(+jitter) and distinct
    images at ~32 — pairs the threshold drops are dropped identically
    by both engines. At 100 TB the band width is the knob: collision
    load per 2^16 bucket grows linearly with corpus size, so widen
    bands (or add a second-level band on the bucket) as n grows —
    same playbook as dedup_simhash.

    Scale shape: kernel is map-only executor-side Arrow; the only
    shuffles are the band-key join and the final DISTINCT at
    candidate cardinality.
    """
    docs = documents(spark, sf_dir).select("doc_id")
    hashed = with_image_payload(docs).mapInPandas(
        _phash_batches, "doc_id long, phash long"
    )
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    (
                        F.shiftrightunsigned("phash", b * PHASH_BAND_BITS)
                        .bitwiseAND(mask)
                        + (b << PHASH_BAND_BITS)
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("band"),
    )
    # band-bucket fold instead of the bucket self-join (round 10, the
    # dedup._bucket_pairs treatment, payload-carrying): the self-join
    # evaluated the mapInPandas aHash kernel subtree once PER SIDE —
    # the single most expensive stage here — and paid two exchanges +
    # a join; one groupBy(band) computes the kernel once and expands
    # the identical pair multiset map-side from doc_id-sorted
    # (doc_id, phash) arrays.
    pairs = (
        bands.groupBy("band")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "phash"))
            ).alias("ids")
        )
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> transform("
                    "slice(ids, i + 2, size(ids)),"
                    " y -> struct(x.doc_id AS da, y.doc_id AS db,"
                    " x.phash AS pa, y.phash AS pb))))"
                )
            ).alias("p")
        )
        .select("p.da", "p.db", "p.pa", "p.pb")
    )
    return (
        pairs.select(
            "da",
            "db",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .distinct()
        .select("da", "db", F.col("hamming").cast("int").alias("hamming"))
    )


#: scene-cut detection geometry: SC_FRAMES frames of SC_BYTES each
#: (one md5 block per frame); frames share a per-shot base image
#: (shot = frame // SC_SHOT) with SC_PERTURB fixed bytes replaced per
#: frame, so intra-shot deltas are small and the shot boundary is a
#: real jump; a cut fires where the inter-frame L1 delta exceeds
#: SC_THRESH.
SC_FRAMES = 8
SC_BYTES = 16
SC_SHOT = 4
SC_PERTURB = (3, 11)
SC_THRESH = 600


def _video_frame_hex(f: int) -> F.Column:
    """Hex of video frame ``f``: the shot's md5 base with two
    frame-specific bytes replaced (shared by the video payload and
    the AV-sync audio track, which re-times these same frames)."""
    base = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(f":s{f // SC_SHOT}")
        )
    )
    dmd = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(f":f{f}"))
    )
    segs = []
    prev = 0
    for j, p in enumerate(SC_PERTURB):
        if 2 * p > prev:
            segs.append(F.substring(base, prev + 1, 2 * p - prev))
        segs.append(F.substring(dmd, 2 * j + 1, 2))
        prev = 2 * p + 2
    segs.append(F.substring(base, prev + 1, 2 * SC_BYTES - prev))
    return F.concat(*segs)


def with_video_payload(docs: DataFrame) -> DataFrame:
    """Deterministic 8-frame binary 'video': per frame, the shot's
    md5 base with two frame-specific bytes replaced — the same
    hex-surgery construction as the image payload, extended along a
    time axis so inter-frame differencing has real structure."""
    return docs.select(
        "doc_id",
        F.unhex(
            F.concat(*[_video_frame_hex(f) for f in range(SC_FRAMES)])
        ).alias("video"),
    )


def _scene_cut_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Vectorized inter-frame L1 differencing over the whole Arrow
    batch: one frombuffer, reshape (docs, frames, bytes), abs-diff
    along the time axis — integer deltas, no per-row Python."""
    import numpy as np

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        arr = (
            np.frombuffer(b"".join(pdf["video"]), dtype=np.uint8)
            .astype(np.int64)
            .reshape(n, SC_FRAMES, SC_BYTES)
        )
        deltas = np.abs(np.diff(arr, axis=1)).sum(axis=2)  # (n, F-1)
        cuts = deltas > SC_THRESH
        first = np.where(
            cuts.any(axis=1), cuts.argmax(axis=1) + 1, -1
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_cuts": cuts.sum(axis=1).astype(np.int64),
                "first_cut_frame": first.astype(np.int64),
                "max_delta": deltas.max(axis=1),
            }
        )


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO modality VALUE-GRADED — scene-cut (shot-boundary)
    detection by inter-frame differencing, the classic first pass of
    any video curation pipeline (sample-per-shot, dedup-per-shot):
    binary 8-frame payloads stream through an Arrow ``mapInPandas``
    numpy kernel computing integer L1 frame deltas; the planted shot
    structure (two 4-frame shots per doc) means the boundary at
    frame 4 is a genuine jump against small intra-shot perturbation
    deltas. The oracle rebuilds every byte of every frame from the
    md5 hex arithmetic and re-derives deltas, cut count, first cut,
    and max delta in SQL — upgrading the video family from
    rows-only (multimodal_frames) to value-level evidence, the same
    jump multimodal_audio_energy made for audio and
    multimodal_phash_dedup for images.

    Scale shape: map-only — payloads never leave executors, the
    kernel is one reshape + diff over the Arrow batch, output is
    4 integers per doc.
    """
    docs = documents(spark, sf_dir).select("doc_id")
    return with_video_payload(docs).mapInPandas(
        _scene_cut_batches,
        "doc_id long, n_cuts long, first_cut_frame long, max_delta long",
    )


#: AV-sync: the audio track re-times the video frames by a planted
#: per-doc lag in AV_LAGS; out-of-range frames fall back to filler
AV_LAGS = 5  # lags in [-2..2] via doc_id % 5 - 2


def with_av_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, video, audio): the graded 8-frame video plus an
    'audio' binary whose frame g carries video frame g − lag (lag
    planted per doc as doc_id % 5 − 2), with md5 filler where the
    shift runs off either end — a deterministic badly-muxed file."""
    lag = (F.col("doc_id") % AV_LAGS - F.lit(AV_LAGS // 2)).cast("int")
    aud_frames = []
    for g in range(SC_FRAMES):
        expr = F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":pad{g}"))
        )
        for l in range(-(AV_LAGS // 2), AV_LAGS // 2 + 1):
            src = g - l
            if 0 <= src < SC_FRAMES:
                expr = F.when(lag == l, _video_frame_hex(src)).otherwise(
                    expr
                )
        aud_frames.append(expr)
    return docs.select(
        "doc_id",
        F.unhex(
            F.concat(*[_video_frame_hex(f) for f in range(SC_FRAMES)])
        ).alias("video"),
        F.unhex(F.concat(*aud_frames)).alias("audio"),
    )


def _av_sync_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Integer cross-modal lag estimation over the Arrow batch: both
    payloads frombuffer to (docs, frames, bytes); per candidate lag,
    the CENTERED cross-correlation in raw-moment integer form
    n·Σab − Σa·Σb over the overlap window (byte-level, ~100 terms —
    the per-frame-sum variant is statistically too weak); argmax
    with ties toward the smallest |lag| then lag."""
    import numpy as np

    half = AV_LAGS // 2
    lags = list(range(-half, half + 1))
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        v = (
            np.frombuffer(b"".join(pdf["video"]), dtype=np.uint8)
            .astype(np.int64)
            .reshape(n, SC_FRAMES, SC_BYTES)
        )
        a = (
            np.frombuffer(b"".join(pdf["audio"]), dtype=np.uint8)
            .astype(np.int64)
            .reshape(n, SC_FRAMES, SC_BYTES)
        )
        scores = np.empty((n, len(lags)), dtype=np.int64)
        for k, l in enumerate(lags):
            lo_a, hi_a = max(0, l), SC_FRAMES + min(0, l)
            av = a[:, lo_a:hi_a, :]
            vv = v[:, lo_a - l : hi_a - l, :]
            nn = av.shape[1] * av.shape[2]
            sab = (av * vv).sum(axis=(1, 2))
            sa = av.sum(axis=(1, 2))
            sb = vv.sum(axis=(1, 2))
            scores[:, k] = nn * sab - sa * sb
        # per doc: best (score desc, |lag| asc, lag asc) — visit lags
        # in preference order and update only on STRICTLY greater
        # score, so the earlier-preferred lag keeps ties
        est = np.zeros(n, dtype=np.int64)
        best = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        for l in sorted(lags, key=lambda x: (abs(x), x)):
            col = scores[:, lags.index(l)]
            better = col > best
            est[better] = l
            best[better] = col[better]
        doc_ids = pdf["doc_id"].to_numpy()
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "true_lag": (doc_ids % AV_LAGS - half).astype(np.int64),
                "est_lag": est.astype(np.int64),
                "best_score": best,
            }
        )


def multimodal_av_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AV-SYNC OFFSET estimation VALUE-GRADED — the cross-modal
    alignment check a video curation pipeline runs to catch badly
    muxed files before they poison paired training data: the audio
    track is the video's frame signal re-timed by a planted per-doc
    lag, and the Arrow kernel recovers the lag by integer centered
    cross-correlation (raw-moment form n·Σab − Σa·Σb — exact int64,
    no floats) over the candidate window, ties toward zero. Emits
    the planted and estimated lag side by side with the winning
    score, so the estimator's accuracy is itself part of the graded
    surface; the oracle rebuilds BOTH payloads byte-for-byte from
    the md5 hex arithmetic and replays the correlation sweep in SQL.

    Scale shape: map-only — payloads never leave executors, one
    reshape + five slice-multiplies per Arrow batch, 4 integers out
    per doc.
    """
    docs = documents(spark, sf_dir).select("doc_id")
    return with_av_payload(docs).mapInPandas(
        _av_sync_batches,
        "doc_id long, true_lag long, est_lag long, best_score long",
    )


def _hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized intensity histogram over the whole Arrow batch: one
    frombuffer, reshape (docs, 64), bin = pixel >> 6 (four 64-wide
    intensity bands), per-row one-hot sums — no Python loop over
    docs, no float anywhere."""
    import numpy as np

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        px = (
            np.frombuffer(b"".join(pdf["img"]), dtype=np.uint8)
            .astype(np.int64)
            .reshape(n, PHASH_PIXELS)
        )
        bins = px >> 6
        out = {"doc_id": pdf["doc_id"].to_numpy()}
        for k in range(4):
            out[f"b{k}"] = (bins == k).sum(axis=1)
        out["px_sum"] = px.sum(axis=1)
        out["px_min"] = px.min(axis=1)
        out["px_max"] = px.max(axis=1)
        yield pd.DataFrame(out)


def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image exposure/QA statistics — the feature-extraction stage a
    multimodal training pipeline runs to drop blank, clipped, or
    dead-pixel images before captioning: per-image 4-bin intensity
    histogram (64-wide bands), pixel sum, min, max over the same
    deterministic 8×8 thumbnails as multimodal_phash_dedup
    (with_image_payload — every pixel md5-derived, so the SQL oracle
    rebuilds the exact bytes and the Arrow kernel itself is
    value-graded, the multimodal_decode_check discipline).

    Scale shape: map-only mapInPandas — payload bytes never leave the
    executor, output is 7 integers per image; at 100 TB this is the
    scan-speed featurizer shape (decode CPU dominates, zero shuffle).
    """
    docs = documents(spark, sf_dir).select("doc_id")
    return with_image_payload(docs).mapInPandas(
        _hist_batches,
        "doc_id long, b0 long, b1 long, b2 long, b3 long,"
        " px_sum long, px_min long, px_max long",
    )


#: energy-gate VAD threshold: ~the expected window energy of uniform
#: int16 noise (8 samples × E[s²] ≈ 2.86e9), so the md5-noise corpus
#: splits into genuinely active AND silent windows.
VAD_ENERGY_MIN = 2_900_000_000


def _vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-doc voice-activity summary over the window-energy grid:
    boolean gate, then vectorized run stats across the (docs,
    windows) matrix — starts = active & ~previous, longest run via a
    cumulative run-length carry, no per-row Python."""
    import numpy as np

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        arr = (
            np.frombuffer(b"".join(pdf["pcm"]), dtype=">i2")
            .astype(np.int64)
            .reshape(n, -1)
        )
        nw = arr.shape[1] // AUDIO_WIN
        w = arr.reshape(n, nw, AUDIO_WIN)
        active = (w * w).sum(axis=2) > VAD_ENERGY_MIN
        prev = np.zeros_like(active)
        prev[:, 1:] = active[:, :-1]
        starts = active & ~prev
        run = np.zeros(n, dtype=np.int64)
        longest = np.zeros(n, dtype=np.int64)
        for j in range(nw):
            run = np.where(active[:, j], run + 1, 0)
            longest = np.maximum(longest, run)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_windows": np.full(n, nw, dtype=np.int64),
                "n_active": active.sum(axis=1),
                "n_segments": starts.sum(axis=1),
                "longest_run": longest,
            }
        )


def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-gate voice-activity detection — the segmentation step an
    ASR-data pipeline runs before transcription (keep speechy spans,
    drop silence): windows whose energy clears VAD_ENERGY_MIN are
    active, adjacent active windows merge into segments, and the
    per-clip summary (active windows, segment count, longest run) is
    what a curation filter consumes. Same real-PCM payload and Arrow
    kernel discipline as multimodal_audio_energy; the oracle
    recomputes every sample from the md5 hex arithmetic and rebuilds
    the segments with gaps-and-islands SQL — the run-merge logic
    itself is value-graded.

    Scale shape: map-only mapInPandas, 4 integers per clip out.
    """
    docs = documents(spark, sf_dir).select("doc_id")
    return with_audio_payload(docs).mapInPandas(
        _vad_batches,
        "doc_id long, n_windows long, n_active long,"
        " n_segments long, longest_run long",
    )
