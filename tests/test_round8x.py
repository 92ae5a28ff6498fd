"""Semantic properties of the round-8 continuation batch 22
(plans/round8x.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import defaultdict

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_lof_python_recompute(spark):
    rows = CATALOG["lof_embedding_outliers"].build(spark, SF_DIR).collect()
    assert len(rows) == 20
    ranked = sorted(rows, key=lambda r: r["rank"])
    lofs = [r["lof"] for r in ranked]
    assert lofs == sorted(lofs, reverse=True)

    # replicate the whole chain in python: deterministic kmeans cells
    # (via the shared operator), 4dp cosine distances, k=5 LOF
    from citibike_deep_dive_spark.operators.similarity import kmeans

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    cents = {
        r["cluster_id"]: r["centroid"]
        for r in kmeans(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), k=8, iters=3,
            fan=False,
        ).collect()
    }

    def assign(v):
        best = None
        for cid in sorted(cents):
            d2 = round(sum((a - b) ** 2 for a, b in zip(v, cents[cid])), 6)
            if best is None or (d2, cid) < best:
                best = (d2, cid)
        return best[1]

    by_cell = defaultdict(list)
    for e in emb:
        v = [float(x) for x in e["embedding"]]
        by_cell[assign(v)].append((e["vec_id"], v, e["label"]))

    def cosd(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(1.0 - d / (na * nb), 4)

    knn = {}
    for cell, members in by_cell.items():
        for vid, v, lab in members:
            ds = sorted(
                (cosd(v, w), wid)
                for wid, w, _ in members
                if wid != vid
            )[:5]
            knn[vid] = (cell, lab, ds)
    kd = {vid: max(int(round(d * 10000)) for d, _ in ds)
          for vid, (_, _, ds) in knn.items()}
    lrd = {}
    for vid, (_, _, ds) in knn.items():
        s = sum(max(int(round(d * 10000)), kd[w]) for d, w in ds)
        lrd[vid] = round(len(ds) * 10000.0 / s, 6)
    lof = {}
    for vid, (cell, lab, ds) in knn.items():
        lof[vid] = (
            round(sum(lrd[w] for _, w in ds) / len(ds) / lrd[vid], 4),
            cell,
            lab,
        )
    top = sorted(lof.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    for (vid, (score, cell, lab)), r in zip(top, ranked):
        assert r["vec_id"] == vid
        assert r["lof"] == score
        assert r["cell"] == cell
        assert r["label"] == lab
        assert abs(r["lrd"] - lrd[vid]) < 1e-9
