"""Multimodal plumbing: binary payloads, Arrow decode stage, agg."""

from pyspark.sql import functions as F

from cassandra_log_analyzer_mcp_spark.operators import multimodal
from cassandra_log_analyzer_mcp_spark.sources.tables import documents


def test_media_columns_schema(spark, sf_dir):
    media = multimodal.with_media_columns(documents(spark, sf_dir))
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<width:int,height:int")


def test_decode_features_deterministic(spark, sf_dir):
    media = multimodal.with_media_columns(documents(spark, sf_dir))
    feats = multimodal.decode_features(media)
    row = feats.filter(F.col("doc_id") == 0).collect()[0]
    text = (
        documents(spark, sf_dir).filter(F.col("doc_id") == 0).collect()[0].text
    )
    b = text.encode("utf-8")
    assert row.n_bytes == len(b)
    assert abs(row.mean_byte - sum(b) / len(b)) < 1e-9
    assert row.width == 0 % 640 + 32


def test_pipeline_aggregates_by_source(spark, sf_dir):
    out = multimodal.multimodal_pipeline(spark, sf_dir)
    rows = out.collect()
    n_sources = documents(spark, sf_dir).select("source").distinct().count()
    assert len(rows) == n_sources
    assert all(r.n_items > 0 and r.total_bytes > 0 for r in rows)


def test_frame_sampling_fanout_and_hashes(spark, sf_dir):
    """The 1→N fan-out matches the policy exactly, and frame hashes
    equal md5 of the evenly-spaced byte slices."""
    import hashlib

    media = multimodal.with_media_columns(documents(spark, sf_dir))
    frames = multimodal.sample_frames(media)
    doc = documents(spark, sf_dir).filter(F.col("doc_id") == 0).collect()[0]
    b = doc.text.encode("utf-8")
    n_frames = min(multimodal.MAX_FRAMES, max(1, len(b) // 64))
    step = len(b) // n_frames
    got = sorted(
        frames.filter(F.col("doc_id") == 0).collect(),
        key=lambda r: r.frame_idx,
    )
    assert len(got) == n_frames
    for k, r in enumerate(got):
        chunk = b[k * step : (k + 1) * step]
        assert r.frame_hash == hashlib.md5(chunk).hexdigest()
        assert r.ts_ms == k * multimodal.FAKE_FPS_MS
        assert r.out_width == max(multimodal.MIN_DIM, (0 % 640 + 32) // 2)


def test_multimodal_frames_rollup(spark, sf_dir):
    out = multimodal.multimodal_frames(spark, sf_dir).collect()
    n_docs = documents(spark, sf_dir).count()
    assert len(out) == n_docs
    for r in out:
        assert 1 <= r.n_frames <= multimodal.MAX_FRAMES
        assert r.n_distinct_frames <= r.n_frames


def test_audio_energy_matches_hashlib_reference(spark, sf_dir):
    """Independent Python recomputation (hashlib + struct, no numpy,
    no Spark) of one document's window energies must equal the Arrow
    kernel's output — pins endianness, two's complement, and window
    alignment without involving either engine's SQL."""
    import hashlib
    import struct

    from cassandra_log_analyzer_mcp_spark.operators.multimodal import (
        AUDIO_CHUNKS,
        AUDIO_WIN,
        multimodal_audio_energy,
    )

    doc_id = 3
    expect = []
    for c in range(AUDIO_CHUNKS):
        raw = bytes.fromhex(
            hashlib.md5(f"{doc_id}:a{c}".encode()).hexdigest()
        )
        samples = struct.unpack(f">{AUDIO_WIN}h", raw)
        expect.append(
            (c, sum(s * s for s in samples), max(abs(s) for s in samples))
        )

    out = (
        multimodal_audio_energy(spark, sf_dir)
        .filter(f"doc_id = {doc_id}")
        .orderBy("win_id")
        .collect()
    )
    assert [(r.win_id, r.energy, r.peak) for r in out] == expect


def test_phash_kernel_matches_reference_and_is_robust():
    """The numpy aHash equals a per-pixel pure-Python reference, a
    byte-identical image hashes identically, and flipping ONE pixel
    moves the hash by at most a few bits (the perceptual-hash
    robustness property the dedup relies on)."""
    import numpy as np
    import pandas as pd

    from cassandra_log_analyzer_mcp_spark.operators.multimodal import (
        PHASH_PIXELS,
        _phash_batches,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, PHASH_PIXELS, dtype=np.uint8).tobytes()
    edited = bytearray(img)
    edited[5] = (edited[5] + 200) % 256
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "img": [img, img, bytes(edited)]}
    )
    out = pd.concat(list(_phash_batches(iter([pdf]))))
    h = dict(zip(out["doc_id"], out["phash"]))
    # pure-python reference
    px = list(img)
    total = sum(px)
    ref = 0
    for i, v in enumerate(px):
        if v * PHASH_PIXELS > total:
            ref |= 1 << (63 - i)
    if ref >= 1 << 63:
        ref -= 1 << 64
    assert h[1] == ref
    assert h[1] == h[2]
    assert bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1") <= 4


def test_scene_cut_kernel_matches_reference():
    """The numpy differencing kernel vs a pure-Python reference on
    handcrafted payloads: a constant video has no cuts (first_cut
    −1), alternating black/white frames cut at every boundary, and
    delta labeling uses the LATER frame's index."""
    import numpy as np
    import pandas as pd

    from cassandra_log_analyzer_mcp_spark.operators.multimodal import (
        SC_BYTES,
        SC_FRAMES,
        SC_THRESH,
        _scene_cut_batches,
    )

    flat = bytes([7] * (SC_FRAMES * SC_BYTES))
    strobe = b"".join(
        bytes([0 if f % 2 == 0 else 255] * SC_BYTES)
        for f in range(SC_FRAMES)
    )
    one_jump = bytes([0] * (SC_BYTES * 3)) + bytes(
        [200] * (SC_BYTES * (SC_FRAMES - 3))
    )
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "video": [flat, strobe, one_jump]}
    )
    out = pd.concat(list(_scene_cut_batches(iter([pdf])))).set_index(
        "doc_id"
    )
    assert out.loc[1].n_cuts == 0 and out.loc[1].first_cut_frame == -1
    assert out.loc[2].n_cuts == SC_FRAMES - 1  # every boundary cuts
    assert out.loc[2].first_cut_frame == 1
    assert out.loc[2].max_delta == 255 * SC_BYTES
    assert out.loc[3].n_cuts == 1 and out.loc[3].first_cut_frame == 3
    assert out.loc[3].max_delta == 200 * SC_BYTES
    assert 255 * SC_BYTES > SC_THRESH  # the strobe regime is real


def test_image_histogram_matches_python_recount(spark, sf_dir):
    """The Arrow kernel's bins/sum/min/max equal a per-doc Python
    recount of the actual payload bytes, and bins partition the 64
    pixels."""
    from cassandra_log_analyzer_mcp_spark.operators.multimodal import (
        multimodal_image_histogram,
        with_image_payload,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    ).limit(20)
    truth = {
        r.doc_id: bytes(r.img)
        for r in with_image_payload(docs).collect()
    }
    out = {
        r.doc_id: r
        for r in multimodal_image_histogram(spark, sf_dir).collect()
        if r.doc_id in truth
    }
    assert len(out) == len(truth)
    for did, img in truth.items():
        r = out[did]
        assert r.b0 + r.b1 + r.b2 + r.b3 == 64
        assert (r.b0, r.b1, r.b2, r.b3) == tuple(
            sum(1 for v in img if v >> 6 == k) for k in range(4)
        )
        assert r.px_sum == sum(img)
        assert r.px_min == min(img) and r.px_max == max(img)


def test_vad_run_stats_match_python_recount(spark, sf_dir):
    """Per-clip VAD stats equal a Python recount of the actual PCM
    bytes, and both active and silent windows exist in the corpus
    (the threshold genuinely gates)."""
    import numpy as np

    from cassandra_log_analyzer_mcp_spark.operators.multimodal import (
        AUDIO_WIN,
        VAD_ENERGY_MIN,
        multimodal_audio_vad,
        with_audio_payload,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    ).limit(25)
    pcm = {r.doc_id: bytes(r.pcm) for r in with_audio_payload(docs).collect()}
    out = {
        r.doc_id: r
        for r in multimodal_audio_vad(spark, sf_dir).collect()
        if r.doc_id in pcm
    }
    assert len(out) == len(pcm)
    saw_active = saw_silent = False
    for did, raw in pcm.items():
        s = np.frombuffer(raw, dtype=">i2").astype(np.int64)
        w = s.reshape(-1, AUDIO_WIN)
        act = [(wi * wi).sum() > VAD_ENERGY_MIN for wi in w]
        segs = sum(
            1 for j, a in enumerate(act) if a and (j == 0 or not act[j - 1])
        )
        longest = run = 0
        for a in act:
            run = run + 1 if a else 0
            longest = max(longest, run)
        r = out[did]
        assert (r.n_active, r.n_segments, r.longest_run) == (
            sum(act), segs, longest,
        )
        saw_active |= any(act)
        saw_silent |= not all(act)
    assert saw_active and saw_silent


def test_av_sync_recovers_planted_lag(spark, sf_dir):
    """The estimator recovers the planted per-doc mux offset for the
    overwhelming majority of docs (byte-level centered correlation,
    ~7 sigma at the true lag), covers every candidate lag, and emits
    exactly one row per doc."""
    from cassandra_log_analyzer_mcp_spark.operators import multimodal as mm

    rows = mm.multimodal_av_sync(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    half = mm.AV_LAGS // 2
    assert {r.true_lag for r in rows} == set(range(-half, half + 1))
    acc = sum(1 for r in rows if r.est_lag == r.true_lag) / len(rows)
    assert acc >= 0.9, acc
    for r in rows:
        assert -half <= r.est_lag <= half
