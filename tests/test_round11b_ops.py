"""Round-11 batch 2 (plans/round11b.py): triangle counting,
repeated-substring spans, HLL registers — Python recomputes of each
chain; oracle parity is covered by preflight.py."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _intdiv_round(a: int, b: int) -> int:
    return (2 * a + b) // (2 * b)


def test_triangles_python_recompute(spark):
    from citibike_deep_dive_spark.plans.round6 import mutual_knn_pairs

    pairs = {
        (r["id_a"], r["id_b"])
        for r in mutual_knn_pairs(spark, SF_DIR).collect()
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    tri_per_node = defaultdict(int)
    for a, b in pairs:
        for c in adj[a] & adj[b]:
            tri_per_node[c] += 0  # counted via ordered enum below
    # ordered enumeration a<b<c, each triangle once
    n_total = 0
    for a, b in pairs:
        for c in sorted(adj[b]):
            if c > b and (a, c) in pairs:
                n_total += 1
                for v in (a, b, c):
                    tri_per_node[v] += 1
    rows = CATALOG["graph_triangle_count"].build(spark, SF_DIR).collect()
    assert len(rows) == 20
    expected = sorted(
        ((tri_per_node.get(v, 0), v) for v in adj),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [(r["n_triangles"], r["node_id"]) for r in rows]
    assert got == expected
    assert sum(t for t, _ in expected) > 0  # the graph has triangles
    for r in rows:
        d, t = r["degree"], r["n_triangles"]
        assert d == len(adj[r["node_id"]])
        if d >= 2:
            assert r["clustering_micro"] == _intdiv_round(
                2_000_000 * t, d * (d - 1)
            )
            assert 0 <= r["clustering_micro"] <= 1_000_000
        else:
            assert r["clustering_micro"] == 0


def test_spans_python_recompute(spark):
    L = 16
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    gram_count = defaultdict(int)
    positions = {}
    for d in docs:
        t = d["text"]
        positions[d["doc_id"]] = t
        for i in range(len(t) - L + 1):
            gram_count[t[i : i + L]] += 1
    perdoc = {}
    for d in docs:
        t = d["text"]
        marked = [
            i + 1
            for i in range(len(t) - L + 1)
            if gram_count[t[i : i + L]] > 1
        ]
        if not marked:
            continue
        spans = []
        start = prev = marked[0]
        for p in marked[1:]:
            if p > prev + L:
                spans.append((start, prev + L - 1))
                start = p
            prev = p
        spans.append((start, prev + L - 1))
        covered = sum(e - s + 1 for s, e in spans)
        perdoc[d["doc_id"]] = (
            len(t),
            len(spans),
            covered,
            _intdiv_round(1_000_000 * covered, len(t)),
        )
    expected = sorted(
        ((v[3], k, v) for k, v in perdoc.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    rows = CATALOG["repeated_substring_spans"].build(spark, SF_DIR).collect()
    got = [(r["coverage_micro"], r["doc_id"]) for r in rows]
    assert got == [(c, k) for c, k, _ in expected]
    for r, (_, k, v) in zip(rows, expected):
        assert (r["n_chars"], r["n_spans"], r["covered_chars"]) == v[:3]
        assert 0 < r["coverage_micro"] <= 1_000_000


def test_hll_python_recompute_and_accuracy(spark):
    M, RMAX = 64, 55
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    toks = defaultdict(list)
    for d in docs:
        toks[d["source"]].extend(d["text"].lower().split(" "))
    rows = {
        r["source"]: r
        for r in CATALOG["hll_source_cardinality"].build(spark, SF_DIR).collect()
    }
    assert set(rows) == set(toks)
    for src, ts in toks.items():
        regs = defaultdict(int)
        for t in ts:
            h = _h60(t)
            bucket, rem = h % M, h // M
            rho = RMAX if rem == 0 else RMAX - rem.bit_length()
            regs[bucket] = max(regs[bucket], rho)
        s_full = sum(1 << (RMAX - regs.get(j, 0)) for j in range(M))
        est = _intdiv_round(709390 * M * M * (1 << RMAX), 1_000_000 * s_full)
        r = rows[src]
        assert r["n_tokens"] == len(ts)
        assert r["n_distinct_exact"] == len(set(ts))
        assert r["n_zero_registers"] == M - len(regs)
        assert r["hll_estimate"] == est
        # accuracy, in the right estimator regime: below 2.5*m the raw
        # estimator is biased by design and the sketch's usable signal
        # is linear counting from the emitted n_zero_registers
        # (m * ln(m / V)); above, the raw estimate applies with the
        # 1.04/sqrt(64) relative error
        import math

        exact = len(set(ts))
        if exact <= 2.5 * M:
            zeros = M - len(regs)
            assert zeros > 0  # small-range: zeros must remain
            lc = M * math.log(M / zeros)
            assert abs(lc - exact) <= max(0.35 * exact, 6)
        else:
            assert abs(est - exact) <= 0.55 * exact


def _py_soundex(tok: str) -> str:
    m = dict(zip("abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202"))
    mapped = "".join(m[c] for c in tok)
    collapsed = []
    for c in mapped:
        if not collapsed or collapsed[-1] != c:
            collapsed.append(c)
    rest = "".join(collapsed)[1:].replace("0", "")
    return tok[0].upper() + (rest + "000")[:3]


def test_soundex_blocks_python_recompute(spark):
    import re
    from collections import defaultdict

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    )
    vocab = set()
    for d in docs:
        vocab.update(
            t for t in d["text"].lower().split(" ") if re.fullmatch("[a-z]+", t)
        )
    blocks = defaultdict(list)
    for t in vocab:
        blocks[_py_soundex(t)].append(t)
    expected = sorted(
        (
            (len(ts), code, min(ts), len(ts) * (len(ts) - 1) // 2)
            for code, ts in blocks.items()
        ),
        key=lambda r: (-r[0], r[1]),
    )[:20]
    rows = CATALOG["soundex_token_blocks"].build(spark, SF_DIR).collect()
    got = [
        (r["n_tokens"], r["code"], r["sample_token"], r["pairs_bound"])
        for r in rows
    ]
    assert got == expected
    # classic sanity vector (simplified H/W-as-vowel variant): Robert
    assert _py_soundex("robert") == "R163"
