"""Round-10 batch 2: unigram-LM tokenizer segmentation (Kudo 2018).

``unigram_lm_viterbi_segments`` is the SentencePiece-family counterpart
to the BPE pair (``bpe_merge_candidates`` / ``bpe_apply_merges``): a
unigram language-model tokenizer scores every substring "piece" by its
corpus frequency and segments each word by VITERBI — the minimum total
negative-log-probability split — rather than by greedy merge rules.
This is the other of the two tokenizer-training algorithms in
production use (SentencePiece's default), so it completes the
tokenizer-training family.

Cross-engine determinism is the whole design:

- Piece scores are micro-unit BIGINTs, ``round(ln(total/cnt) * 1e6)``,
  quantized straight off one float divide + one ``ln`` (the
  ``heaps_law_loglog_fit`` pattern). RESIDUAL RISK, not proof: that
  pattern is CONJECTURED version-stable and still pending a driver
  verdict — heaps hashed red under the driver's DuckDB 1.2.0 in
  r9/r10 with the divergence not yet bisected between the downstream
  float division (removed in r11) and the ``round(ln(·)·1e6)``
  quantization itself; a 1-ulp libm difference at a .5e-6 boundary
  would flip a micro digit here too. heaps_moments_probe
  (plans/round11.py) decides which surface is guilty; if ``ln`` is
  convicted, this family coarsens its quantum the same way.
- The Viterbi DP runs over a CARRY-FREE PACKED integer,
  ``cost_micro * 100 + n_pieces``: minimizing the packed value
  minimizes cost first and piece count on exact-cost ties, and because
  a word has at most 9 pieces the two fields never interact — the DP is
  pure int64 ``least()`` arithmetic, identical in Spark and DuckDB
  (both engines' least() skips NULLs, which encodes the j>len(w)
  boundary for free).
- The DP is UNROLLED to scalar columns (positions 1..9, piece length
  <= 3 -> 24 span-score columns), so both engines run the exact same
  expression tree inside whole-stage codegen — no recursion, no HOF
  lambda, no float accumulation order anywhere.

Distributed shape (100 TB read): the word explode is a map-side
combinable groupBy; the piece vocabulary is bounded by the alphabet
(sum |A|^k for k<=3), hence broadcast; spans live at DISTINCT-WORD
grain (<= 24 rows each), orders of magnitude below corpus grain; the
DP itself is per-row scalar codegen with zero shuffle; the final
top-50 is TakeOrderedAndProject (per-partition top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

_MAX_WLEN = 9
_MAX_PIECE = 3

# (start, piece_len) spans of a <=9-char word under <=3-char pieces
_SPANS = [
    (i, k)
    for i in range(_MAX_WLEN)
    for k in range(1, _MAX_PIECE + 1)
    if i + k <= _MAX_WLEN
]


def _dp_candidates(j: int, b: dict[int, str]) -> list[str]:
    """SQL candidate expressions feeding least() at DP position j."""
    cands = []
    for k in range(1, _MAX_PIECE + 1):
        if j - k >= 0:
            base = "" if j - k == 0 else f"{b[j - k]} + "
            cands.append(f"{base}s_{j - k}_{k} * 100 + 1")
    return cands


def _oracle() -> str:
    piv_cols = ",\n               ".join(
        f"max(CASE WHEN i = {i} AND k = {k} THEN score_micro END) AS s_{i}_{k}"
        for i, k in _SPANS
    )
    b = {}
    dp_ctes = []
    for j in range(1, _MAX_WLEN + 1):
        b[j] = f"b_{j}"
        cands = _dp_candidates(j, b)
        expr = cands[0] if len(cands) == 1 else f"least({', '.join(cands)})"
        src = "piv" if j == 1 else f"d{j - 1}"
        dp_ctes.append(f"d{j} AS (SELECT *, {expr} AS b_{j} FROM {src})")
    packed = " ".join(
        f"WHEN {j} THEN b_{j}" for j in range(1, _MAX_WLEN + 1)
    )
    ivals = ", ".join(f"({i})" for i in range(_MAX_WLEN))
    return f"""
    WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wcount
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
        WHERE w <> '' AND length(w) <= {_MAX_WLEN}
        GROUP BY w
    ),
    spans AS (
        SELECT w, wcount, i, k, substr(w, i + 1, k) AS p
        FROM words
        CROSS JOIN (VALUES {ivals}) gi(i)
        CROSS JOIN (VALUES (1), (2), (3)) gk(k)
        WHERE i + k <= length(w)
    ),
    pieces AS (
        SELECT p, CAST(sum(wcount) AS BIGINT) AS cnt FROM spans GROUP BY p
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM pieces),
    scored AS (
        SELECT p,
               CAST(round(ln(CAST(tot.tot AS DOUBLE) / cnt) * 1000000)
                    AS BIGINT) AS score_micro
        FROM pieces, tot
    ),
    piv AS (
        SELECT w, wcount,
               {piv_cols}
        FROM spans JOIN scored USING (p)
        GROUP BY w, wcount
    ),
    {", ".join(dp_ctes)},
    fin AS (
        SELECT w, wcount,
               CASE length(w) {packed} END AS packed
        FROM d{_MAX_WLEN}
    )
    SELECT w AS word,
           wcount,
           CAST(length(w) AS INT) AS word_len,
           CAST(packed % 100 AS BIGINT) AS n_pieces,
           CAST((packed - packed % 100) / 100 AS BIGINT) AS cost_micro,
           CAST(round((packed % 100) * 1000000.0 / length(w)) AS BIGINT)
               AS fertility_micro
    FROM fin
    ORDER BY wcount DESC, word
    LIMIT 50
    """


@register("unigram_lm_viterbi_segments", _oracle(), tags=("X-unigram-lm",))
def unigram_lm_viterbi_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer Viterbi segmentation (Kudo 2018, the
    SentencePiece algorithm): piece scores = -ln(corpus substring
    frequency / total), each word segmented by the minimum-cost split
    under <=3-char pieces; reports pieces-per-word (tokenizer
    FERTILITY, the metric that decides tokenizer quality per language)
    and the Viterbi cost for the 50 most frequent words. Completes the
    tokenizer-training family next to the BPE pair (greedy merges vs
    global-optimum segmentation).

    Determinism: piece scores micro-quantized off one divide + one ln
    (heaps_law_loglog_fit pattern); the DP minimizes the carry-free
    packed integer cost_micro*100 + n_pieces in pure int64 least()
    arithmetic, unrolled to the same scalar expression tree the oracle
    runs — no recursion, no lambda, no float accumulation order.

    Scale: token explode -> map-side-combined word counts; piece vocab
    bounded by the alphabet (broadcast); spans at distinct-word grain
    (<=24 rows/word); DP is per-row whole-stage codegen, zero shuffle;
    top-50 is TakeOrderedAndProject, not a global sort."""
    from ..operators.fanout import fan_out

    # fan_out: the token explode must not inherit a single-file scan's
    # one-task parallelism (no-op on well-split inputs)
    docs = fan_out(table(spark, sf_dir, "documents"))
    # The word-count frame feeds three branches (spans -> piv, piece
    # counts, total); without a lineage cut the corpus scan + explode
    # would run once per branch. Checkpoint at DISTINCT-WORD grain —
    # bounded far below corpus grain — so the 100 TB scan happens once.
    words = truncate_lineage(
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") <= _MAX_WLEN))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wcount")),
        eager=False,
    )
    spans = (
        words.select(
            "w",
            "wcount",
            F.explode(
                F.expr(
                    "filter(flatten(transform(sequence(0, length(w) - 1), "
                    "i -> transform(array(1, 2, 3), k -> struct(i, k)))), "
                    "s -> s.i + s.k <= length(w))"
                )
            ).alias("s"),
        )
        .select("w", "wcount", F.col("s.i").alias("i"), F.col("s.k").alias("k"))
        .withColumn("p", F.expr("substring(w, i + 1, k)"))
    )
    pieces = spans.groupBy("p").agg(F.sum("wcount").alias("cnt"))
    tot = pieces.agg(F.sum("cnt").alias("tot"))
    scored = pieces.crossJoin(F.broadcast(tot)).select(
        "p",
        F.round(F.log(F.col("tot").cast("double") / F.col("cnt")) * 1000000.0, 0)
        .cast("long")
        .alias("score_micro"),
    )
    piv = (
        spans.join(F.broadcast(scored), "p")
        .groupBy("w", "wcount")
        .agg(
            *[
                F.max(
                    F.when(
                        (F.col("i") == i) & (F.col("k") == k),
                        F.col("score_micro"),
                    )
                ).alias(f"s_{i}_{k}")
                for i, k in _SPANS
            ]
        )
    )
    df = piv
    for j in range(1, _MAX_WLEN + 1):
        cands = []
        for k in range(1, _MAX_PIECE + 1):
            if j - k >= 0:
                step = F.col(f"s_{j - k}_{k}") * 100 + 1
                cands.append(step if j - k == 0 else F.col(f"b_{j - k}") + step)
        df = df.withColumn(
            f"b_{j}", cands[0] if len(cands) == 1 else F.least(*cands)
        )
    df = df.withColumn(
        "packed",
        F.element_at(
            F.array(*[F.col(f"b_{j}") for j in range(1, _MAX_WLEN + 1)]),
            F.length("w").cast("int"),
        ),
    )
    return (
        df.withColumn("n_pieces", (F.col("packed") % 100).cast("long"))
        .select(
            F.col("w").alias("word"),
            "wcount",
            F.length("w").cast("int").alias("word_len"),
            "n_pieces",
            ((F.col("packed") - F.col("n_pieces")) / 100)
            .cast("long")
            .alias("cost_micro"),
            F.round(F.col("n_pieces") * 1000000.0 / F.length("w"), 0)
            .cast("long")
            .alias("fertility_micro"),
        )
        .orderBy(F.col("wcount").desc(), "word")
        .limit(50)
    )
