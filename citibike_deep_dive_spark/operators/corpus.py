"""Corpus-level training-data operators: benchmark decontamination,
incremental (new-batch vs existing-corpus) dedup, temperature-based
source mixing, and vocabulary coverage.

These extend the dedup/similarity family (BASELINE.json north star) with
the cross-set operations a production LM-data pipeline runs on every
ingest: "does this new shard overlap my eval benchmarks?", "which new
docs are already in the corpus?", "how do I weight sources for the next
training mix?".

Scale notes (100 TB corpus):
- decontamination broadcasts the BENCHMARK shingle set (eval suites are
  tiny by construction — MBs, not TBs), so the corpus-side scan never
  shuffles its text: a map-side hash semi-join per gram.
- incremental dedup joins on digest / (band, band_hash) — uniform keys,
  bounded buckets; the new-batch side is the small side of every join.
- temperature mixing aggregates to one row per source (dozens), then
  broadcasts the scalar total — no global sort, no driver collect.
- vocabulary coverage's only ordered step is a distributed top-k
  (``orderBy().limit(k)`` = TakeOrdered on executors) and a window over
  the k surviving rows — state bounded by k, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import lsh_bands, minhash_signatures, shingle_frame
from .fanout import fan_out


def benchmark_decontaminate(
    docs: DataFrame, bench_mod: int = 29, width_tag: str = "3-gram"
) -> DataFrame:
    """Flag training docs sharing any word shingle with the benchmark set.

    The benchmark membership rule (``doc_id % bench_mod == 0``) stands in
    for a real eval-suite table; the plan shape is the point: shingle both
    sides with the SAME shingler as near-dup (dedup.shingles), broadcast
    the benchmark grams, count distinct contaminated grams per train doc.
    """
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_grams = (
        shingle_frame(docs.filter(is_bench))
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    train_grams = shingle_frame(docs.filter(~is_bench)).select(
        "doc_id", F.explode("sh").alias("g")
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        # count(*), not count_distinct: shingles() is array_distinct per
        # doc and the broadcast side is distinct grams, so (doc_id, g)
        # pairs are already unique — the distinct aggregate's Expand
        # phase would be pure overhead.
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )


def _is_new(new_mod: int, new_rem: int) -> Column:
    return F.col("doc_id") % new_mod == new_rem


def incremental_exact_survivors(
    docs: DataFrame, new_mod: int = 10, new_rem: int = 7
) -> DataFrame:
    """New-batch docs whose exact text digest is NOT already in the corpus.

    The per-ingest form of exact dedup: digest both sides, distinct the
    corpus digests (map-side combined), anti-join the new batch. At scale
    the anti-join shuffles by digest — uniform and skew-free.
    """
    is_new = _is_new(new_mod, new_rem)
    corpus_digests = (
        docs.filter(~is_new).select(F.md5("text").alias("digest")).distinct()
    )
    return (
        docs.filter(is_new)
        .select("doc_id", F.md5("text").alias("digest"))
        .join(corpus_digests, "digest", "left_anti")
        .select("doc_id", "digest")
    )


def incremental_neardup_survivors(
    docs: DataFrame,
    new_mod: int = 10,
    new_rem: int = 7,
    k: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """New-batch docs that share NO LSH band bucket with the corpus.

    Same minhash family + banding as lsh_candidate_pairs, but cross-set:
    corpus bands collapse to distinct (band, band_hash) buckets, the new
    batch semi-joins against them, survivors are the anti-join remainder.
    Per-band bucket keys are bounded-width hashes — the join never sees
    raw text, so the corpus side shuffles O(corpus × n_bands) small rows.
    """
    is_new = _is_new(new_mod, new_rem)

    def bands(side: DataFrame) -> DataFrame:
        return lsh_bands(minhash_signatures(fan_out(side), k=k), rows_per_band)

    corpus_buckets = bands(docs.filter(~is_new)).select("band", "band_hash").distinct()
    new_bands = bands(docs.filter(is_new))
    hits = (
        new_bands.join(corpus_buckets, ["band", "band_hash"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        docs.filter(is_new).select("doc_id").join(hits, "doc_id", "left_anti")
    )


def temperature_mix(
    docs: DataFrame, alpha: float = 0.7, token_budget: int = 1_000_000
) -> DataFrame:
    """Temperature-based source weights: w_s ∝ n_s^alpha, normalized, plus
    each source's share of a global token budget (the multilingual-LM
    rebalancing recipe — alpha < 1 upsamples small sources).

    One aggregation to source grain, then a broadcast of the 1-row total;
    no collect, no global sort.
    """
    per_src = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("w_raw", F.pow("n_docs", F.lit(alpha)))
    )
    total = per_src.agg(F.sum("w_raw").alias("w_tot"))
    return per_src.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        F.round(F.col("w_raw") / F.col("w_tot"), 6).alias("weight"),
        F.round(F.lit(float(token_budget)) * F.col("w_raw") / F.col("w_tot"))
        .cast("long")
        .alias("token_budget"),
    )


def vocab_coverage(docs: DataFrame, top_k: int = 100) -> DataFrame:
    """Top-k vocabulary with cumulative corpus coverage.

    Token counts shuffle once (by token, map-side combined); the top-k is
    ``orderBy().limit(k)`` — Spark plans TakeOrdered, a per-partition
    heap + driver merge, NOT a global sort. The cumulative-coverage
    window then runs over exactly k rows.
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(top_k)
    order = [F.col("cnt").desc(), F.col("token")]
    cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return top.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.row_number().over(Window.orderBy(*order)).alias("rank"),
        F.round(
            F.sum("cnt").over(cum) / F.col("total").cast("double"), 6
        ).alias("coverage"),
    )


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, top_k: int = 30
) -> DataFrame:
    """Top-k word-bigram collocations ranked by pointwise mutual
    information — the classic phrase-mining pass (word2vec phrase
    joining, tokenizer-merge candidates) over a training corpus.

    PMI = log2( P(w1,w2) / (P(w1) P(w2)) ) from exact corpus counts.

    Scale shape (100 TB): bigrams materialize per-row via an array
    transform (no shuffle), then ONE shuffle each for bigram and unigram
    counts (both map-side combined). The ``min_count`` gate prunes the
    bigram table *before* the two unigram joins, so the join input is
    the collocation candidates, not the raw bigram stream. Corpus
    totals ride along as broadcast scalars (the tfidf pattern). Final
    ranking is TakeOrdered on the rounded score with (w1, w2) tiebreak.
    """
    toks = fan_out(docs).select(F.split(F.lower(F.col("text")), " ").alias("ws"))
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"
    )
    bigrams = (
        toks.filter(F.size("ws") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
    )
    from ..functions.lineage import truncate_lineage

    # big_counts feeds the n2 scalar and the candidate join (2 consumers);
    # uni_counts feeds n1 and BOTH unigram join sides (3 consumers) —
    # without the lazy checkpoints the bigram explode+agg runs twice and
    # the unigram explode+agg three times (aliased subplans don't dedupe).
    big_counts = truncate_lineage(
        bigrams.groupBy("w1", "w2").agg(F.count("*").alias("pair_count")),
        eager=False,
    )
    uni_counts = truncate_lineage(
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c")),
        eager=False,
    )
    n1 = uni_counts.agg(F.sum("c").cast("double").alias("n1"))
    n2 = big_counts.agg(F.sum("pair_count").cast("double").alias("n2"))
    u1 = uni_counts.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni_counts.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log2(
        F.col("pair_count")
        * F.col("n1")
        * F.col("n1")
        / (F.col("n2") * F.col("c1") * F.col("c2"))
    )
    return (
        big_counts.filter(F.col("pair_count") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.round(pmi, 4).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )


def word_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy of the word distribution — a
    repetitiveness/quality signal orthogonal to the dup-n-gram gate
    (doc_repetition_stats): low entropy = spammy keyword stuffing,
    near-log2(n) entropy = natural text.

    Uses H = log2(n) - (Σ c·log2(c))/n so the aggregate is a pure
    map-side-combinable sum. Two keyed shuffles (doc_id, word) →
    (doc_id), both uniform — no global state, scales with the corpus.
    """
    counts = (
        docs
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").cast("double")
    clogc = F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double")))
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("distinct_words"),
        F.round(F.log2(n) - clogc / n, 5).alias("entropy_bits"),
    )


def repeated_segment_stats(docs: DataFrame, seg_len: int = 16) -> DataFrame:
    """Cross-document repeated-segment detection (MassiveText-style):
    chop each doc into non-overlapping ``seg_len``-word segments, hash
    them, and report per-doc how many of its segments also occur in at
    least one OTHER document — the boilerplate/template signal that
    whole-doc dedup misses.

    Scale shape: segments materialize narrowly (array transform + one
    explode keyed by doc_id); the frequency pass shuffles on the segment
    md5 (uniform by construction); the verdict join is segment-hash
    equi-join back to the per-doc segments. No driver state, no
    all-pairs anything.
    """
    ws = F.split(F.lower(F.col("text")), " ")
    segs_expr = F.expr(
        f"transform(sequence(0, size(ws) div {seg_len} - 1), "
        f"i -> md5(concat_ws(' ', slice(ws, i * {seg_len} + 1, {seg_len}))))"
    )
    from ..functions.lineage import truncate_lineage

    # segs feeds the frequency pass and the verdict join; the checkpoint
    # keeps the segment explode + per-segment md5 from running twice.
    segs = truncate_lineage(
        docs
        .select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= seg_len)
        .select("doc_id", F.explode(segs_expr).alias("seg_hash")),
        eager=False,
    )
    freq = segs.groupBy("seg_hash").agg(
        F.count_distinct("doc_id").alias("n_docs_with_seg")
    )
    flagged = segs.join(freq, "seg_hash").select(
        "doc_id", (F.col("n_docs_with_seg") >= 2).alias("shared")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.col("shared").cast("long")).cast("long").alias("shared_segments"),
        F.round(
            F.sum(F.col("shared").cast("double")) / F.count("*"), 6
        ).alias("shared_frac"),
    )


def vocab_growth_by_source(docs: DataFrame) -> DataFrame:
    """Heaps-law vocabulary growth per source: for each source, how many
    NEW words each document contributes (at its first occurrence) and
    the cumulative vocabulary size in doc_id ingest order — the
    diminishing-returns curve that sizes tokenizer vocab and dedup
    budgets per source.

    Scale shape: first-occurrence is min(doc_id) per (source, word) —
    one uniform shuffle; the cumulative window partitions BY SOURCE
    (keyed, never global — this is the equi_depth lesson applied), and
    runs over one row per (source, contributing doc), not per word.
    """
    first_seen = (
        docs
        .select(
            "source",
            "doc_id",
            F.explode(F.array_distinct(F.split(F.lower(F.col("text")), " "))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_doc = first_seen.groupBy("source", "first_doc").agg(
        F.count("*").cast("long").alias("new_words")
    )
    cum = (
        Window.partitionBy("source")
        .orderBy("first_doc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_doc.select(
        "source",
        F.col("first_doc").alias("doc_id"),
        "new_words",
        F.sum("new_words").over(cum).cast("long").alias("cum_vocab"),
    )


def countmin_heavy_hitters(
    docs: DataFrame, depth: int = 4, width: int = 1024, top_k: int = 20
) -> DataFrame:
    """Count-min sketch built as PURE relational ops, validated against
    exact counts for the top-k tokens.

    The sketch is a (depth × width) counter grid: token t increments
    cell (i, h_i(t)) for each of ``depth`` portable Carter–Wegman rows
    (md5-hex → BIGINT, the engine-portable hash). Built here FROM the
    exact per-token counts — same cells, one less explode — the sketch
    table is ≤ depth·width rows regardless of corpus size, and because
    it's a sum-grid it MERGES across shards/streams by cell-wise
    addition: the one-pass 100 TB path. The top-k exact side
    (TakeOrdered) exists to expose the estimate quality (CMS never
    undercounts; overcount = collision mass).
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    tok_counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    from ..functions import portable_hash64

    hashed = tok_counts.select(
        "w",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).withColumn(
        "bucket",
        portable_hash64(F.concat_ws(":", F.col("i"), F.col("w"))) % width,
    )
    sketch = hashed.groupBy("i", "bucket").agg(F.sum("c").alias("cell"))
    top = tok_counts.orderBy(F.col("c").desc(), "w").limit(top_k)
    top_cells = top.select(
        "w", "c", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i")
    ).withColumn(
        "bucket",
        portable_hash64(F.concat_ws(":", F.col("i"), F.col("w"))) % width,
    )
    return (
        top_cells.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("w", "c")
        .agg(F.min("cell").alias("cms_estimate"))
        .select(
            F.col("w").alias("word"),
            F.col("c").cast("long").alias("exact_count"),
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("c")).cast("long").alias("overcount"),
        )
    )


def bigram_cross_entropy(docs: DataFrame, k_smooth: float = 0.5) -> DataFrame:
    """Per-document cross-entropy under an add-k-smoothed corpus bigram
    LM — the classic perplexity-style quality filter (ccnet/KenLM
    pattern): documents whose bigram stream is improbable under the
    corpus model are gibberish or boilerplate outliers.

    CE(doc) = -Σ c_doc(w1,w2)·log2 P(w2|w1) / Σ c_doc(w1,w2),
    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V).

    Distributed shape: corpus bigram/unigram counts are the PMI
    shuffles (map-side combined); V rides as a broadcast scalar; the
    per-doc bigram table joins corpus probabilities on (w1,w2) — a
    uniform equi-join — then one keyed agg by doc_id. No model state
    anywhere: the "LM" is a DataFrame.
    """
    toks = fan_out(docs).select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"
    )
    # doc_bigrams feeds BOTH the corpus-count aggregation and the scored
    # join side; Catalyst does not dedupe aliased subplans, so without
    # the lazy checkpoint the bigram explode+agg runs twice
    from ..functions.lineage import truncate_lineage

    doc_bigrams = truncate_lineage(
        toks.filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .groupBy("doc_id", "p.w1", "p.w2")
        .agg(F.count("*").alias("dc")),
        eager=False,
    )
    corpus_bigrams = doc_bigrams.groupBy("w1", "w2").agg(F.sum("dc").alias("cb"))
    # unigrams feeds the probability join AND the vocab-size scalar; the
    # lazy checkpoint keeps the word explode+agg from running twice.
    unigrams = truncate_lineage(
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu")),
        eager=False,
    )
    vocab = unigrams.agg(F.count("*").cast("double").alias("V"))
    probs = (
        corpus_bigrams.join(unigrams.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (
                (F.col("cb") + F.lit(k_smooth))
                / (F.col("cu") + F.lit(k_smooth) * F.col("V"))
            ).alias("p"),
        )
    )
    scored = doc_bigrams.join(probs, ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.sum("dc").cast("long").alias("n_bigrams"),
        F.round(
            -F.sum(F.col("dc") * F.log2("p")) / F.sum("dc"), 5
        ).alias("cross_entropy_bits"),
    )
