"""Text analysis for LLM-data pipelines: token counting, quality
scoring, language ID, fingerprinting — all JVM-side expressions
(whole-stage codegen; no Python UDFs), each with an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for")

# marker words per language for the n-gram/stopword language-ID
# heuristic; deterministic argmax with fixed precedence en > de > es
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "es": ("el", "los", "que", "es"),
}

PUNCT_CLASS = r"[^.,;:!?]"
WORDISH = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, n_wordish) — whitespace tokens plus a
    BPE-ish regex segmentation (letters | digits | single symbol)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text).alias("n_chars"),
        F.size(F.split(F.trim(text), r"\s+")).alias("n_tokens"),
        # idx=0 = whole match (the pattern has no capture groups)
        F.size(F.regexp_extract_all(TXT.normalize(text), F.lit(WORDISH), 0)).alias("n_wordish"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality metrics: token count, mean token length,
    punctuation ratio, stopword ratio, and a keep flag.

    All ratios are exact-BIGINT counts + one IEEE double division
    (deterministic). The thresholds follow common web-corpus filters
    (Gopher/C4-style): 10..100k tokens, stopword ratio >= 0.01.
    """
    toks = TXT.tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    total_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    out = df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        (total_tok_len.cast("double") / n_tokens.cast("double")).alias("mean_token_len"),
        (n_punct.cast("double") / F.length(F.col(text_col)).cast("double")).alias("punct_ratio"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 100000)
        & (F.col("stopword_ratio") >= 0.01),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition filters: distinct-token ratio and
    top-token fraction, plus a keep flag.

    Highly repetitive documents (boilerplate, keyword stuffing, broken
    scrapes) are the classic web-corpus failure mode; the Gopher rules
    drop docs whose most frequent word dominates or whose vocabulary
    collapses. Both metrics are in-row array expressions — tokenization
    bound once per row (see ``dedup._tokenized``), O(distinct x tokens)
    per doc, zero shuffles, whole-stage codegen end to end.

    Ratios are exact-int counts + one IEEE double division, so the
    DuckDB twin is bit-identical.
    """
    bound = df.select(F.col(id_col).alias("id"), TXT.tokens(F.col(text_col)).alias("__tok"))
    toks = F.col("__tok")
    distinct = F.array_distinct(toks)
    n_tokens = F.size(toks)
    top_count = F.array_max(
        F.transform(distinct, lambda d: F.size(F.filter(toks, lambda t: t == d)))
    )
    out = bound.select(
        "id",
        n_tokens.alias("n_tokens"),
        F.size(distinct).alias("n_distinct"),
        (F.size(distinct).cast("double") / n_tokens.cast("double")).alias("distinct_ratio"),
        top_count.alias("top_token_count"),
        (top_count.cast("double") / n_tokens.cast("double")).alias("top_token_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("distinct_ratio") >= 0.2) & (F.col("top_token_frac") <= 0.3),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: count marker hits per language, argmax
    with fixed precedence (en >= de >= es, then 'und' = undetermined
    when no marker hits at all)."""
    toks = TXT.tokens(F.col(text_col))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["es"]) & (scores["en"] > 0),
            F.lit("en"),
        )
        .when((scores["de"] >= scores["es"]) & (scores["de"] > 0), F.lit("de"))
        .when(scores["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (plus the char-fold rolling hash for a cheap 60-bit-ish partition
    key). Identical fingerprints = exact dups after normalization."""
    norm = TXT.normalize(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(norm).alias("fp_md5"),
        TXT.char_fold_hash(norm).alias("fp_fold"),
    )


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Score = tf * N / df — the IDF log is deliberately replaced by the
    raw inverse ratio: ranking-equivalent per document whenever tf ties
    break the same way (and exactly reproducible: integer counts + one
    IEEE double division, whereas ``ln`` is libm-dependent and not
    bit-stable across engines). Stopwords are dampened by df in the
    denominator exactly as with log-IDF.

    Plan: token explode -> (doc, term) count -> term df + corpus size N
    (both stay in-plan; N is a broadcast 1-row aggregate, never a
    driver-side collect) -> per-doc top-k window. Shuffles: one on
    (doc, term), one on term, one on doc for the window — each carries
    counts, not text.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(TXT.tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "rank", "term", "tf", "df", "tfidf")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k terms per document by BM25 — TF saturation (k1) + document
    length normalization (b), the relevance scoring layer above
    tfidf_topk's raw ratio.

    Determinism: the log-IDF is replaced by the raw inverse ratio
    N/df (rank-equivalent per fixed term, and exact: ln is
    libm-dependent). tf/df/dl are exact BIGINTs; the score is a fixed
    chain of IEEE double ops, written identically in the SQL oracle, so
    results are bit-exact. avgdl and N stay in-plan (broadcast 1-row
    aggregates — no driver collect).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(TXT.tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.select(
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl")
    )
    idf = F.col("n_docs").cast("double") / F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
    score = idf * ((tf_d * F.lit(k1 + 1.0)) / (tf_d + F.lit(k1) * norm))
    scored = (
        tf.join(dfreq, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .withColumn("bm25", score)
    )
    w = Window.partitionBy("id").orderBy(F.col("bm25").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "rank", "term", "tf", "df", "dl", "bm25")
    )


def salted_topn_per_key(
    df: DataFrame,
    key_col: str,
    score_col: str,
    id_col: str,
    n: int = 20,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe per-key top-n (the "per-domain quality cap" of web-corpus
    curation): keep the n highest-``score_col`` rows per ``key_col``,
    deterministic tie-break on ``id_col``.

    A single ``row_number() over (partition by key)`` ships EVERY row of
    a hot key to one task — the classic window-skew failure at 100 TB
    (one web domain can be 1% of the corpus). Two-stage instead:

    1. local pass: window over ``(key, salt)`` with ``salt =
       pmod(xxhash64(id), S)`` — a hot key fans out over S tasks; keep
       each salt's local top-n (any row outside its salt-local top-n
       cannot be in the key's global top-n: the n rows above it in the
       same salt already beat it).
    2. final pass: ordinary per-key window over the survivors — at most
       ``S*n`` rows per key, so the hot-key task is bounded by
       construction, not by data.

    Exactly equivalent to the single-window form (returned ``rank`` is
    the global per-key rank), so the oracle is a plain PARTITION BY
    window.
    """
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    local_w = Window.partitionBy(F.col(key_col), salt).orderBy(*order)
    pruned = (
        df.withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= n)
        .drop("__lr")
    )
    final_w = Window.partitionBy(key_col).orderBy(*order)
    return pruned.withColumn("rank", F.row_number().over(final_w)).filter(
        F.col("rank") <= n
    )


def vocab_topk(df: DataFrame, id_col: str, text_col: str, k: int = 50) -> DataFrame:
    """Corpus vocabulary construction: global token frequency table,
    top-k by occurrence count -> (token, n_occurrences, n_docs, rank).

    The scale-critical choice is HOW the top-k is taken: ``orderBy +
    limit`` compiles to TakeOrderedAndProject (per-partition top-k,
    then a k-row merge) — never a global sort, never a single-partition
    window over the full vocabulary. The rank window runs AFTER the
    limit, over k rows, so its single partition is k-sized by
    construction. Ties break (count desc, token asc) — deterministic.

    Shuffles: one on token for the count (map-side partial combine
    collapses the heavy hitters), then the k-row merge. Vocabulary
    cardinality never hits the driver.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(TXT.tokens(F.col(text_col))).alias("token"),
    )
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("id").alias("n_docs"),
    )
    top = agg.orderBy(F.col("n_occurrences").desc(), F.col("token").asc()).limit(k)
    # global window is safe here: it ranks the k surviving rows only
    # (TakeOrderedAndProject upstream), never the full vocabulary
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "n_occurrences", "n_docs", "rank"
    )


def bigram_assoc_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 50, min_count: int = 5
) -> DataFrame:
    """Collocation mining: top-k token bigrams by a PMI-style
    association ratio lift = p(xy) / (p(x) p(y)) = (c_xy * N^2) /
    (M * c_x * c_y), where N = total tokens, M = total bigrams.

    The log of the standard PMI is dropped (libm ``ln`` is not
    bit-stable across engines; log is monotone, so ranking is
    identical) and the ratio is one IEEE division of two exact BIGINT
    products — bit-exact in any engine. ``min_count`` suppresses the
    degenerate rare-bigram lift spike, as in standard collocation
    practice. BIGINT products stay exact below ~9e18: at 1e12 corpus
    tokens swap the numerator to DOUBLE before multiplying (ranking
    is unchanged — documented, not silently done here).

    Plan: bigrams come from an in-row zip of the token array with its
    own tail (arrays_zip over slice — no self-join, no shuffle to form
    pairs); one shuffle counts bigrams, one counts unigrams, two
    broadcast-friendly joins attach c_x / c_y, TakeOrderedAndProject
    takes the k rows.
    """
    toks = df.select(
        F.col(id_col).alias("id"), TXT.tokens(F.col(text_col)).alias("ts")
    )
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = (
        df.select(F.explode(TXT.tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    n_tok = uni.agg(F.sum("c").alias("n_tokens"))
    m_bi = bi.agg(F.sum("c_xy").alias("m_bigrams"))
    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        bi.filter(F.col("c_xy") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(m_bi))
        .withColumn(
            "lift",
            (F.col("c_xy") * F.col("n_tokens") * F.col("n_tokens")).cast("double")
            / (F.col("m_bigrams") * F.col("c_x") * F.col("c_y")).cast("double"),
        )
    )
    return (
        scored.orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
        .select("w1", "w2", "c_xy", "c_x", "c_y", "lift")
    )


def bpe_merge_steps(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 5
) -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016), the
    first ``n_merges`` steps, as ONE declarative lazy plan — the
    subword-tokenizer training pass of an LLM data pipeline.

    Classic formulation: words (with corpus frequencies) start as
    character sequences; each step merges the globally most frequent
    adjacent symbol pair (ties: lexicographic) in every word. The
    novel part here is staying declarative end to end:

    - symbol sequences are SPACE-JOINED STRINGS with sentinel boundary
      spaces; "apply merge (l, r)" is a greedy-left positional fold
      over the symbol array (``aggregate`` with a string accumulator:
      merge when the accumulator's last symbol is ``l`` and the
      incoming symbol is ``r``). A plain ``replace(seq,' l r ',' lr ')``
      would consume the shared boundary space and merge consecutive
      occurrences only once per step (' a b a b ' -> ' ab a b '); the
      fold gives classic Sennrich greedy-left (' ab ab '). The fold is
      exactly greedy-left because a merged symbol ``l || r`` can never
      equal ``l`` (``r`` is non-empty), so a just-merged symbol can't
      chain into a second merge. The DuckDB oracle runs the identical
      fold via ``list_reduce``;
    - each step's argmax pair stays IN-PLAN: a 1-row
      (count desc, pair asc) TakeOrdered crossJoined back broadcast —
      no driver-side collect, so the n-step loop is one chained lazy
      plan (same pattern as kmeans_lloyd's iterations);
    - pair counts are exact BIGINT sums of word frequencies.

    Scale: the per-step shuffle carries (symbol-pair, count) rows —
    vocabulary-bounded, not corpus-bounded — and the word table itself
    never reshuffles (the merge application is a narrow map). Returns
    (step, left, right, merged, pair_count).
    """
    cur, steps = _bpe_chain(df, text_col, n_merges)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.select(
        "step", "l", "r", F.concat(F.col("l"), F.col("r")).alias("merged"), "pair_count"
    )


def _bpe_chain(
    df: DataFrame, text_col: str, n_merges: int
) -> tuple[DataFrame, list[DataFrame]]:
    """Shared BPE merge chain: returns (final vocab state with columns
    (w, freq, seq) — ``seq`` is the space-sentinel symbol string after
    all merges — and the per-step 1-row argmax DataFrames). ``w`` rides
    along untouched so ``bpe_encode`` can join documents back to their
    post-merge symbol counts; the pair-count aggregates never see it."""
    toks = df.select(F.explode(TXT.tokens(F.col(text_col))).alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    cur = vocab.withColumn(
        "seq",
        F.concat(
            F.lit(" "),
            F.expr("array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), ' ')"),
            F.lit(" "),
        ),
    ).select("w", "freq", "seq")

    steps = []
    for step in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("seq")), " ")
        n = F.size(syms)
        pairs = cur.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(syms, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        ).select("freq", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
        )
        steps.append(best.withColumn("step", F.lit(step)))
        b = best.select(F.col("l").alias("__l"), F.col("r").alias("__r"))
        # Greedy-left positional merge: fold the symbol array with a
        # string accumulator, merging when (last symbol, incoming) ==
        # (l, r). Equivalent to Sennrich's non-overlapping left-to-right
        # scan (a merged 'lr' can't re-match as 'l' since r != '').
        cur = (
            cur.crossJoin(F.broadcast(b))
            .withColumn(
                "seq",
                F.expr(
                    "' ' || aggregate("
                    "  slice(split(trim(seq), ' '), 2,"
                    "        greatest(size(split(trim(seq), ' ')) - 1, 0)),"
                    "  element_at(split(trim(seq), ' '), 1),"
                    "  (acc, t) -> CASE"
                    "    WHEN t = __r AND (acc = __l OR endswith(acc, ' ' || __l))"
                    "    THEN substring(acc, 1, length(acc) - length(__l)) || __l || __r"
                    "    ELSE acc || ' ' || t END"
                    ") || ' '"
                ),
            )
            .drop("__l", "__r")
        )
    return cur, steps


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 5
) -> DataFrame:
    """BPE tokenization: apply the merge table trained by
    ``bpe_merge_steps`` (the same in-plan chain — training and encoding
    are ONE lazy plan, no driver round-trip for the merge list) to
    every document and report per-document token statistics.

    Encoding is per unique WORD, not per occurrence: the merge chain's
    final vocab state already holds each word's post-merge symbol
    sequence, so encoding a corpus is a join of exploded document words
    against a vocabulary-sized (word -> symbol-count) table — the
    standard trick that makes BPE encoding linear in corpus tokens with
    a vocabulary-bounded shuffle, exactly how production tokenizer
    pipelines batch-encode at 100 TB (hot words are the skew risk;
    the vocab side is one row per word, so AQE skew-split applies to
    the fact side).

    Returns (id, n_words, n_chars, n_tokens): normalized word count,
    character count, and post-merge BPE token count per document
    (n_tokens <= n_chars; equality iff no merge applies).
    """
    cur, _ = _bpe_chain(df, text_col, n_merges)
    wordlen = cur.select(
        "w", F.size(F.split(F.trim(F.col("seq")), " ")).alias("__n_sym")
    )
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(TXT.tokens(F.col(text_col))).alias("w")
    )
    return (
        toks.join(wordlen, "w")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("__n_sym").cast("long").alias("n_tokens"),
        )
    )


def bigram_lm_score(
    df: DataFrame, id_col: str, text_col: str, scale: int = 1_000_000_000
) -> DataFrame:
    """Per-document likelihood under a corpus-trained bigram language
    model — the perplexity-style quality filter of an LLM data pipeline
    (docs whose word sequences are improbable under the corpus LM are
    boilerplate/garbled candidates), expressed fully declaratively.

    Train + score in one plan: bigram counts c_xy and left-context
    counts c_x (occurrences of x as a bigram head) come from two
    aggregations; each document's score is the average conditional
    probability of its bigram instances, avg p(y|x) = avg(c_xy / c_x).

    Determinism: probabilities are scaled-BIGINT, not floats —
    ``(c_xy * scale) div c_x`` is exact integer floor-division in both
    engines (the sketches' exact-arithmetic convention), so the
    per-doc SUM is order-independent; one IEEE double division at the
    end converts to the [0, 1] score. Log-perplexity is deliberately
    replaced by the average-probability ratio: libm ``ln`` is not
    bit-stable across engines, and the filter ranking is preserved for
    the low-likelihood tail this operator exists to catch. Documents
    with fewer than two tokens carry NULL (nullif guard — no 0/0).

    Plan shape at 100 TB: bigrams form IN-ROW (zip with tail — no
    shuffle); per-doc bigram counts shuffle on (doc, w1, w2); the LM
    joins attach by (w1, w2) and (w1) hash joins (the LM relation is
    corpus-sized state that never hits the driver); final agg shuffles
    on doc. No collect, no UDF, no window.
    """
    toks = df.select(
        F.col(id_col).alias("id"), TXT.tokens(F.col(text_col)).alias("ts")
    )
    inst = toks.select(
        "id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    doc_bg = inst.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    lm_bi = doc_bg.groupBy("w1", "w2").agg(F.sum("k").alias("c_xy"))
    lm_ctx = lm_bi.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    scored = (
        doc_bg.join(lm_bi, ["w1", "w2"])
        .join(lm_ctx, ["w1"])
        .withColumn(
            "p_scaled", F.expr(f"(c_xy * CAST({scale} AS BIGINT)) div c_x")
        )
        .groupBy("id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("p_scaled")).alias("sum_p_scaled"),
        )
    )
    # left join: <2-token docs have no bigrams -> NULL score, 0 count
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            (
                F.col("sum_p_scaled").cast("double")
                / (F.nullif(F.col("n_bigrams"), F.lit(0)) * F.lit(scale)).cast(
                    "double"
                )
            ).alias("lm_score"),
        )
    )
    return out


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    q: int = 3,
    max_dist: int = 3,
    len_tol: int = 2,
) -> DataFrame:
    """Fuzzy entity-matching join: distinct-name pairs within
    ``max_dist`` edit distance, found by q-gram blocking — the
    canonicalization primitive of entity resolution (vendor/product
    name cleanup before a dimension MERGE).

    The naive form is an O(V²) cross join with levenshtein on every
    pair. Blocking makes it linear-ish in practice: two names within
    edit distance d share at least one q-gram whenever
    ``min_len >= q*(d+1) - ... `` (the standard q-gram count filter;
    for short names the shared-gram requirement is a high-recall
    heuristic, exact for the distances used here) — so candidates come
    from an equi-self-join on grams, a cheap length filter prunes
    further, and the expensive edit distance runs only on survivors.
    At 100 TB scale the gram join IS the operator: grams hash-shuffle
    like any key, hot grams cap like d7's stop-shingles.

    Determinism: levenshtein is exact integer DP in both engines;
    pairs are canonical (n1 < n2); everything else is set algebra.
    """
    names = df.select(F.lower(F.col(name_col)).alias("nm")).distinct()
    grams = names.select(
        "nm",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(nm) - {q - 1}, 1)),"
                f" i -> substring(nm, i, {q}))"
            )
        ).alias("g"),
    ).distinct()
    a = grams.select(F.col("nm").alias("n1"), "g")
    b = grams.select(F.col("nm").alias("n2"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("n1") < F.col("n2"))
        .filter(
            F.abs(F.length("n1") - F.length("n2")) <= F.lit(len_tol)
        )
        .select("n1", "n2")
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("n1"), F.col("n2")).cast("bigint")
        )
        .filter(F.col("dist") <= F.lit(max_dist))
        .select("n1", "n2", "dist")
    )


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler similarity (matching window
    max(l1,l2)//2 - 1; transpositions = out-of-order matches / 2;
    Winkler boost 0.1 per common-prefix char up to 4, applied only
    when jaro > 0.7) — the exact definition DuckDB's
    jaro_winkler_similarity implements, pinned value-for-value in the
    unit battery so the oracle is a genuine cross-check."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def jaro_winkler_pairs(
    df: DataFrame,
    name_col: str,
    q: int = 3,
    len_tol: int = 4,
    threshold: float = 0.9,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """JAROWINKLER_SIMILARITY as a scale operator (r12 — closing the
    dialect refusal with the real thing): distinct-name pairs scoring
    >= ``threshold``, found by the same q-gram blocking as
    :func:`fuzzy_name_pairs` (the equi-self-join on grams IS the
    operator at 100 TB; the all-pairs form is quadratic), then scored
    by an Arrow-batched pandas UDF running the standard Jaro-Winkler
    DP — a documented slow-path use of Python: per CANDIDATE pair
    (already blocked+length-filtered), never per corpus row. Scores
    round to 6 dp so both engines' IEEE orderings agree bit-exactly
    in the comparison domain.

    Two guards keep the Python DP candidate-bounded at scale, both
    MEASURED on a 20k-name adversarial corpus (names built from a
    400-word vocab, so every word's grams are hot and the naive
    blocking paid a Python DP on ~4.5M candidates = 474 s):

    - a JVM ``levenshtein(n1, n2) <= floor(0.5 * greatest(len))``
      prefilter ahead of the UDF — ALWAYS ON and recall-free for the
      thresholds this operator targets (a pair at JW >= 0.9 has most
      characters matched near-in-place, bounding edit distance well
      under half the longer length), so the cheap codegen DP
      disqualifies random-pair candidates and the Python DP prices
      only plausible ones: 474 s -> 92 s at FULL planted recall.
    - ``max_gram_freq`` (OPT-IN, default None): grams appearing in
      more than this many names drop BEFORE the self-join (d7's
      stop-shingle defense) — 92 s -> 12 s on the same corpus, but
      pairs whose shared grams are ALL hot stop meeting (measured
      36% planted-recall loss there, because the corpus's every word
      is hot). The cap is the right tool when the candidate set is
      quadratic-hot and approximate recall is acceptable; it is NOT
      the default precisely because that trade must be chosen, not
      inherited. Both guards replicate exactly in the oracle.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jw_batch(a, b):
        return pd.Series(
            [_jaro_winkler_py(x, y) for x, y in zip(a, b)]
        )

    # this module uses `from __future__ import annotations`, which
    # stringifies inline hints before pandas_udf can inspect them —
    # set the evaluated annotations explicitly instead
    _jw_batch.__annotations__ = {
        "a": pd.Series, "b": pd.Series, "return": pd.Series,
    }
    jw = pandas_udf(_jw_batch, "double")

    names = df.select(F.lower(F.col(name_col)).alias("nm")).distinct()
    grams = names.select(
        "nm",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(nm) - {q - 1}, 1)),"
                f" i -> substring(nm, i, {q}))"
            )
        ).alias("g"),
    ).distinct()
    if max_gram_freq is not None:
        rare = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= F.lit(max_gram_freq))
            .select("g")
        )
        grams = grams.join(rare, "g")
    a = grams.select(F.col("nm").alias("n1"), "g")
    b = grams.select(F.col("nm").alias("n2"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("n1") < F.col("n2"))
        .filter(F.abs(F.length("n1") - F.length("n2")) <= F.lit(len_tol))
        .select("n1", "n2")
        .distinct()
        .filter(
            F.levenshtein("n1", "n2")
            <= F.floor(0.5 * F.greatest(F.length("n1"), F.length("n2")))
        )
    )
    return (
        cand.withColumn("jw", F.round(jw(F.col("n1"), F.col("n2")), 6))
        .filter(F.col("jw") >= F.lit(threshold))
        .select("n1", "n2", "jw")
    )


def linear_quality_classifier(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 4096,
    weight_scale: int = 1000,
) -> DataFrame:
    """fastText-style linear quality classifier scoring — the learned
    quality filter step of CCNet/LLaMA-class data pipelines (a linear
    model over hashed bag-of-words features), expressed as the
    inference pattern that scales: the MODEL IS A BROADCAST TABLE.

    Features: normalized unigrams hashed into ``n_features`` buckets
    (the fastText hashing trick). Weights: one (feature_id, weight)
    row per bucket, broadcast-joined to the exploded token stream —
    at 100 TB the corpus side streams through one broadcast hash join
    and one per-doc aggregate; swapping in REAL trained weights is a
    table swap, not a plan change. This stand-in weight table is a
    deterministic md5 function of the feature id (integer weights in
    [-weight_scale, weight_scale]), so scores are bit-reproducible and
    oracle-checkable end to end; ``logit`` is one final IEEE division
    of exact integers.

    Returns (id, n_tokens, score_sum, logit, keep).
    """
    from .sketches import md5_hash64

    spark = docs.sparkSession
    weights = spark.range(n_features).select(
        F.col("id").alias("fid"),
        (md5_hash64(F.col("id"), salt="w") % (2 * weight_scale + 1) - weight_scale)
        .cast("long")
        .alias("wt"),
    )
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(TXT.tokens(F.col(text_col))).alias("tok"),
    ).filter(F.length("tok") >= 1)
    feats = toks.select(
        "id", (TXT.char_fold_hash(F.col("tok")) % n_features).alias("fid")
    )
    scored = (
        feats.join(F.broadcast(weights), "fid")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("wt").cast("long").alias("score_sum"),
        )
    )
    return scored.select(
        "id",
        "n_tokens",
        "score_sum",
        (
            F.col("score_sum").cast("double")
            / (F.lit(float(weight_scale)) * F.col("n_tokens").cast("double"))
        ).alias("logit"),
        (F.col("score_sum") > 0).alias("keep"),
    )
