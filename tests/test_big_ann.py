"""BIG embeddings regime (round 7 — VERDICT r6 ask #4): 50k generated
vectors where the IVF/PQ index families are graded at a scale the
shipped 2000-vector table cannot reach.

The drop is fully deterministic (md5 recipe), so these tests pin the
EXACT recall/cost tables — a stronger check than a floor: any drift in
the generator, the quantizer, the sweep collapse, or the PQ encode
shows up as a value diff, not a missed threshold.
"""

from __future__ import annotations

import hashlib

import pytest

from cassandra_log_analyzer_mcp_spark.operators import similarity as S

#: the exact tables below are derived at scale 1; a scaled regime
#: (SPARK_GRAFT_BIG_SCALE > 1) is graded by tools/scaling_big.py
#: against its own censuses instead
pytestmark = pytest.mark.skipif(
    S.BIG_SCALE != 1,
    reason="pinned tables are scale-1 (SPARK_GRAFT_BIG_SCALE set)",
)


def _h6_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def _expected_component(vec_id: int, j: int) -> float:
    lab = vec_id % S.BIG_EMB_CLUSTERS
    center = _h6_py(f"bigc:{lab}:{j}") % 65 - 32
    noise = _h6_py(f"bign:{vec_id}:{j}") % 511 - 255
    return float(
        __import__("numpy").float32((center + noise) / 512.0)
    )


def test_big_drop_recipe_replayable(spark):
    """The engine-side md5 recipe must match an independent python
    re-derivation bit-exactly (the property that would let ANY engine
    regenerate the drop — the reason it needs no shipped fixture)."""
    big_dir = S._big_embeddings_dir(spark)
    rows = (
        spark.read.parquet(f"{big_dir}/embeddings.parquet")
        .filter("vec_id IN (0, 1, 31337)")
        .collect()
    )
    assert len(rows) == 3
    for r in rows:
        assert len(r.embedding) == S.EMBED_DIM
        assert r.label == r.vec_id % S.BIG_EMB_CLUSTERS
        for j in (0, 1, 17, 63):
            assert r.embedding[j] == pytest.approx(
                _expected_component(r.vec_id, j), abs=0.0
            )


def test_big_drop_shape(spark):
    big_dir = S._big_embeddings_dir(spark)
    df = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    assert df.count() == S.BIG_EMB_N
    assert dict(df.dtypes) == {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    }


def test_probe_sweep_big_exact_table(spark, sf_dir):
    """The deterministic recall-vs-cost table, pinned EXACTLY.

    The curve must live in the informative regime: a query held out
    of the centroid set, neighbors at cell-granularity distances —
    probe-1 recall far from saturation, recall strictly rising with
    probe width, candidate volume ~linear in nprobe.
    """
    rows = {
        r.nprobe: r
        for r in S.ann_ivf_probe_sweep_big(spark, sf_dir).collect()
    }
    assert sorted(rows) == S.BIG_SWEEP_PROBES
    expected = {
        1: (53, 23036),
        2: (96, 45650),
        4: (169, 90194),
        8: (278, 178665),
        16: (420, 357950),
        32: (602, 714474),
    }
    for p, (recall, n_cand) in expected.items():
        assert rows[p].n_truth == 1000
        assert rows[p].recall_permille == recall
        assert rows[p].n_candidates == n_cand
    # structural floor restated (what the pins encode): a real curve
    recalls = [rows[p].recall_permille for p in S.BIG_SWEEP_PROBES]
    assert recalls == sorted(recalls) and recalls[0] < 500 < recalls[-1]
    # cost axis: probing 32/224 cells reads ~14% of the brute pairs
    # (and probe-1 ~0.5%) — the sweep spans >1 order of magnitude
    assert rows[32].n_candidates < 0.16 * S.BIG_EMB_N * S.BIG_IVF_QUERIES
    assert rows[1].n_candidates < 0.01 * S.BIG_EMB_N * S.BIG_IVF_QUERIES


def test_big_cell_stats_exact(spark, sf_dir):
    r = S.ann_ivf_big_cell_stats(spark, sf_dir).collect()[0]
    assert r.n_vecs == S.BIG_EMB_N
    assert r.n_cells == S.BIG_IVF_CELLS == 224
    assert r.n_cells_used == 224 and r.empty_cells == 0
    assert (r.min_cell_size, r.median_cell_size, r.max_cell_size) == (
        154, 220, 303,
    )
    # no degenerate mega-cell: max within ~1.5x of the ideal N/cells
    assert r.max_cell_size < 1.5 * S.BIG_EMB_N / S.BIG_IVF_CELLS


def test_ivf_pq_recall_big_exact(spark, sf_dir):
    r = S.ann_ivf_pq_recall_big(spark, sf_dir).collect()[0]
    assert (r.n_queries, r.n_truth) == (100, 1000)
    assert r.recall_permille == 331
    assert r.n_candidates == 357950  # = the probe-16 sweep point
    # the 8-bit code floor: compression keeps >= 30% of exact top-10
    # while scoring ~0.7% of the brute pairs
    assert r.recall_permille >= 300
