"""Count-min sketch (operators/cms.py, round 17).

Claims pinned: (1) the grid is DETERMINISTIC — cells match an
independent Python recompute of the md5 positions, so the DuckDB
oracle in queries/text_quality.py can rebuild it; (2) estimates
NEVER undercount, and equal exact counts when the grid is wide
enough to be collision-free; (3) sketches merge cell-wise into the
sketch of the concatenated corpus (the incremental append).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from exporter_spark.operators import cms

D, W = 3, 64


def _pos(item: str, i: int, w: int = W) -> int:
    return int(hashlib.md5(f"{item}:{i}".encode()).hexdigest()[:8], 16) % w


def _items(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "tok string")


TOKENS = (
    ["alpha"] * 9 + ["beta"] * 5 + ["gamma"] * 3 + ["delta", "epsilon"] * 2
    + ["zeta"]
)


def test_cells_match_independent_python_recompute(spark):
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms.cms_build(
            _items(spark, TOKENS), "tok", depth=D, width=W
        ).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for t, n in Counter(TOKENS).items():
        for i in range(D):
            k = (i, _pos(t, i))
            want[k] = want.get(k, 0) + n
    assert got == want


def test_estimates_never_undercount_and_match_when_wide(spark):
    exact = Counter(TOKENS)
    cand = _items(spark, sorted(exact))
    for width in (8, 1 << 16):
        sk = cms.cms_build(_items(spark, TOKENS), "tok", depth=D, width=width)
        est = {
            r["tok"]: r["est_count"]
            for r in cms.cms_estimate(
                cand, sk, "tok", depth=D, width=width
            ).collect()
        }
        assert all(est[t] >= n for t, n in exact.items()), (width, est)
        if width == 1 << 16:  # collision-free at this vocabulary size
            assert est == dict(exact)
        else:  # 7 distinct tokens x 3 rows into 8 columns MUST collide
            assert any(est[t] > n for t, n in exact.items())


def test_absent_candidate_estimates_zero_on_wide_grid(spark):
    sk = cms.cms_build(_items(spark, TOKENS), "tok", depth=D, width=1 << 16)
    est = {
        r["tok"]: r["est_count"]
        for r in cms.cms_estimate(
            _items(spark, ["never-seen"]), sk, "tok", depth=D, width=1 << 16
        ).collect()
    }
    assert est == {"never-seen": 0}


def test_merge_equals_sketch_of_concatenation(spark):
    a, b = TOKENS[:10], TOKENS[10:]
    sa = cms.cms_build(_items(spark, a), "tok", depth=D, width=W)
    sb = cms.cms_build(_items(spark, b), "tok", depth=D, width=W)
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms.cms_merge(sa, sb).collect()
    }
    direct = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms.cms_build(_items(spark, a + b), "tok", depth=D, width=W)
        .collect()
    }
    assert merged == direct


def test_weighted_build_equals_expanded_build(spark):
    pairs = list(Counter(TOKENS).items())
    wdf = spark.createDataFrame(pairs, "tok string, w long")
    weighted = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms.cms_build(
            wdf, "tok", "w", depth=D, width=W
        ).collect()
    }
    expanded = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms.cms_build(_items(spark, TOKENS), "tok", depth=D, width=W)
        .collect()
    }
    assert weighted == expanded


def test_xxhash64_production_family_same_guarantees(spark):
    """The two-family discipline (md5 oracle / xxhash64 production,
    like minhash): different grids, same contract — never an
    undercount, exact on a collision-free width, mergeable."""
    exact = Counter(TOKENS)
    cand = _items(spark, sorted(exact))
    sk = cms.cms_build(
        _items(spark, TOKENS), "tok", depth=D, width=1 << 16,
        family="xxhash64",
    )
    est = {
        r["tok"]: r["est_count"]
        for r in cms.cms_estimate(
            cand, sk, "tok", depth=D, width=1 << 16, family="xxhash64"
        ).collect()
    }
    assert est == dict(exact)
    narrow = cms.cms_build(
        _items(spark, TOKENS), "tok", depth=D, width=8, family="xxhash64"
    )
    est8 = {
        r["tok"]: r["est_count"]
        for r in cms.cms_estimate(
            cand, narrow, "tok", depth=D, width=8, family="xxhash64"
        ).collect()
    }
    assert all(est8[t] >= n for t, n in exact.items())
    with pytest.raises(ValueError, match="family"):
        cms.cms_build(None, "tok", depth=1, width=8, family="sha9")


def test_params_guards_and_textbook_sizing():
    w, d = cms.cms_params(0.001, 0.01)
    assert w == 2719 and d == 5  # ceil(e/eps), ceil(ln 100)
    with pytest.raises(ValueError, match="eps"):
        cms.cms_params(0.0)
    with pytest.raises(ValueError, match="delta"):
        cms.cms_params(0.1, 1.5)
    with pytest.raises(ValueError, match="depth"):
        cms.cms_build(None, "tok", depth=0, width=8)
    with pytest.raises(ValueError, match="width"):
        cms.cms_build(None, "tok", depth=2, width=0)


def test_sketch_is_grid_bounded(spark):
    """The whole point at 100 TB: cells <= depth x width no matter
    how many occurrences or distinct items go in."""
    many = _items(spark, [f"t{i % 97}" for i in range(5000)])
    sk = cms.cms_build(many, "tok", depth=2, width=16)
    assert sk.count() <= 2 * 16
    total = sk.agg(F.sum("cnt")).collect()[0][0]
    assert total == 2 * 5000  # every occurrence lands in every row
