"""Semantic properties of the round-8 continuation batch
(plans/round8c.py); oracle parity is covered by preflight.py /
test_oracle_parity.py."""

from __future__ import annotations

import math

import numpy as np

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# quantile_normalize_scores
# ---------------------------------------------------------------------------


def test_quantile_normalization_is_monotone_and_onto_global_grid(spark):
    rows = CATALOG["quantile_normalize_scores"].build(spark, SF_DIR).collect()
    assert rows
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # cells partition the corpus
    global_grid = {r["quality_score"] for r in rows}
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0.0 < r["pct"] <= 1.0
        # the normalized value is always an observed global score
        assert r["normalized_score"] in global_grid
        by_source.setdefault(r["source"], []).append(r)
    for cells in by_source.values():
        cells.sort(key=lambda r: r["quality_score"])
        # within a source, normalization preserves score order (both the
        # mid-CDF and the global inverse CDF are non-decreasing)
        for a, b in zip(cells, cells[1:]):
            assert a["pct"] < b["pct"]
            assert a["normalized_score"] <= b["normalized_score"]


def test_quantile_normalization_median_maps_near_global_median(spark):
    rows = CATALOG["quantile_normalize_scores"].build(spark, SF_DIR).collect()
    # expand cells back to docs to find each source's median cell
    scores = sorted(
        s for r in rows for s in [r["quality_score"]] * r["n_docs"]
    )
    global_median = scores[len(scores) // 2]
    for r in rows:
        if abs(r["pct"] - 0.5) < 0.02:  # cells straddling the median rank
            assert abs(r["normalized_score"] - global_median) <= 0.05


# ---------------------------------------------------------------------------
# kneser_ney_bigram_probs
# ---------------------------------------------------------------------------


def test_kneser_ney_probability_identities(spark):
    rows = CATALOG["kneser_ney_bigram_probs"].build(spark, SF_DIR).collect()
    assert len(rows) == 25
    counts = [r["bigram_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # ranked by raw count
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0 + 1e-9
        # discount mass: lambda(w1) = D * N1+(w1,*) / c(w1), in (0, 1]
        lam = 0.75 * r["continuations_fwd"] / r["context_count"]
        assert 0.0 < r["backoff_weight"] <= 1.0
        assert abs(r["backoff_weight"] - lam) < 1e-5
        # the interpolated form strictly exceeds the discounted MLE term
        mle_discounted = (r["bigram_count"] - 0.75) / r["context_count"]
        assert r["p_kn"] > mle_discounted
        # and never exceeds the undiscounted MLE plus the full backoff mass
        assert r["p_kn"] <= r["bigram_count"] / r["context_count"] + lam


# ---------------------------------------------------------------------------
# mmr_diversified_topk — exact numpy replication of the greedy loop
# ---------------------------------------------------------------------------


def _mmr_numpy(vecs: dict[int, np.ndarray], rounds: int = 5):
    qid = min(vecs)
    q = vecs[qid]
    cand = {i: v for i, v in vecs.items() if i != qid}
    relq = {i: round(float(np.sum((v - q) ** 2)) * 1e6) for i, v in cand.items()}
    first = min(cand, key=lambda i: (relq[i], i))
    picks = [(1, first, -relq[first] / 1e6)]
    chosen = [first]
    for r in range(2, rounds + 1):
        best = None
        for i, v in cand.items():
            if i in chosen:
                continue
            ds = min(
                round(float(np.sum((v - vecs[s]) ** 2)) * 1e6) for s in chosen
            )
            mmr = ds - relq[i]
            key = (mmr, -i)
            if best is None or key > best[0]:
                best = (key, i, mmr)
        picks.append((r, best[1], best[2] / 1e6))
        chosen.append(best[1])
    return picks


def test_mmr_matches_numpy_greedy_exactly(spark):
    rows = (
        CATALOG["mmr_diversified_topk"].build(spark, SF_DIR)
        .orderBy("rank")
        .collect()
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    expected = _mmr_numpy(vecs)
    assert [(r["rank"], r["vec_id"]) for r in rows] == [
        (rank, vid) for rank, vid, _ in expected
    ]
    for got, (_, _, score) in zip(rows, expected):
        assert abs(got["mmr_score"] - round(score, 6)) < 1e-9
    # diversification: the selected set is duplicate-free
    assert len({r["vec_id"] for r in rows}) == 5


# ---------------------------------------------------------------------------
# negative_sampling_table
# ---------------------------------------------------------------------------


def test_negative_sampling_draws_track_expectation(spark):
    rows = CATALOG["negative_sampling_table"].build(spark, SF_DIR).collect()
    assert len(rows) == 30
    assert sum(r["n_drawn"] for r in rows) <= 2048
    for r in rows:
        assert 0.0 < r["p_smoothed"] < 1.0
        assert abs(r["expected_draws"] - round(2048 * r["p_smoothed"], 2)) < 0.02
        # c^0.75 smoothing: p grows sublinearly in count
    counts = [r["unigram_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # for well-expected tokens the empirical draw count is the right scale
    big = [r for r in rows if r["expected_draws"] >= 20]
    assert big, "top-30 tokens should include well-sampled ones"
    for r in big:
        assert 0.4 * r["expected_draws"] <= r["n_drawn"] <= 2.0 * r["expected_draws"]


def test_negative_sampling_smooths_toward_rare_tokens(spark):
    rows = CATALOG["negative_sampling_table"].build(spark, SF_DIR).collect()
    hi = max(rows, key=lambda r: r["unigram_count"])
    lo = min(rows, key=lambda r: r["unigram_count"])
    if hi["unigram_count"] > lo["unigram_count"]:
        count_ratio = hi["unigram_count"] / lo["unigram_count"]
        p_ratio = hi["p_smoothed"] / lo["p_smoothed"]
        # the 3/4 power compresses probability ratios below count ratios
        assert p_ratio < count_ratio
        assert abs(p_ratio - count_ratio**0.75) / count_ratio**0.75 < 0.02


# ---------------------------------------------------------------------------
# heaps_law_loglog_fit — exact anchor recompute + consumer-side OLS sanity
# ---------------------------------------------------------------------------


def _py_heaps_anchors(docs):
    """Exact Python recompute of the doubling-grid anchors: bit_length
    gives floor(log2) with no libm at all — the ground truth the ±1
    shift correction in heaps_anchor_frames must land on."""
    seen: set[str] = set()
    cum_t = 0
    anchors: dict[int, tuple[int, int]] = {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        ws = d["text"].lower().split(" ")
        cum_t += len(ws)
        seen.update(ws)
        if cum_t >= 1:
            k = cum_t.bit_length() - 1
            anchors[k] = (cum_t, len(seen))  # last point in bucket wins
    return anchors, cum_t, len(seen)


def test_heaps_anchors_match_exact_python_recompute(spark):
    rows = CATALOG["heaps_law_loglog_fit"].build(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    anchors, total_t, total_v = _py_heaps_anchors(docs)
    assert len(rows) == len(anchors)
    for r in rows:
        assert (r["anchor_tokens"], r["anchor_vocab"]) == anchors[r["bucket"]]
        assert r["total_tokens"] == total_t
        assert r["total_vocab"] == total_v
        # the anchor really sits inside its doubling bucket
        assert (1 << r["bucket"]) <= r["anchor_tokens"] < (1 << (r["bucket"] + 1))


def test_heaps_consumer_side_ols_recovers_sublinear_beta(spark):
    # the log-log fit the query used to emit now runs consumer-side over
    # the anchors; assert it still lands in Heaps' sublinear band
    rows = CATALOG["heaps_law_loglog_fit"].build(spark, SF_DIR).collect()
    # fit over ALL anchors: the synthetic corpus's vocabulary saturates,
    # so the tail alone is flat (beta ~ 0) — the growth phase carries
    # the Heaps signal at tiny SF
    pts = sorted((r["anchor_tokens"], r["anchor_vocab"]) for r in rows)
    x = np.log(np.array([t for t, _ in pts], dtype=np.float64))
    y = np.log(np.array([v for _, v in pts], dtype=np.float64))
    n = len(x)
    assert n >= 3
    beta = (n * np.sum(x * y) - np.sum(x) * np.sum(y)) / (
        n * np.sum(x * x) - np.sum(x) ** 2
    )
    assert 0.0 < beta < 1.0  # sublinear vocabulary growth
    k = math.exp((np.sum(y) - beta * np.sum(x)) / n)
    assert k > 0.0
