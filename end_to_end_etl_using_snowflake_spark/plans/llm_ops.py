"""LLM-training-data pipeline operators registered as driver queries
over the ``documents`` / ``embeddings`` tables, each with an exact
DuckDB oracle (several generated programmatically — simhash bit sums,
LSH hyperplane literals).

Thresholds are data-informed: the synthetic corpus has a clean gap
(near-dup text pairs all have 3-gram Jaccard >= 0.90, everything else
< 0.1; embedding cosines top out ~0.55), so Jaccard >= 0.6 and cosine
>= 0.5 sit far from any decision boundary — approximate methods with
~1e-16 miss probability compare exactly against exhaustive oracles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import analysis as A
from ..operators import dedup as D
from ..operators import multimodal as MM
from ..operators import similarity as S
from .registry import REGISTRY, register
from .tables import load, parquet_row_count, rebalance_scan

# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments (twins of functions.text / functions.vectors)
# ---------------------------------------------------------------------------

SQL_NORM = r"trim(regexp_replace(lower({x}), '\s+', ' ', 'g'))"
SQL_TOKENS = "string_split(" + SQL_NORM + ", ' ')"
SQL_CHARFOLD = (
    "list_reduce(list_concat([0::BIGINT], "
    "list_transform(string_split({x}, ''), c -> ascii(c)::BIGINT)), "
    "(a,b) -> (a*31+b) % 1000000007)"
)
SQL_SHINGLES3 = (
    "list_transform(generate_series(1, greatest(len({w})-2, 0)), "
    "i -> {w}[i]||' '||{w}[i+1]||' '||{w}[i+2])"
)


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_concat([0.0::DOUBLE], "
        f"list_transform(generate_series(1, len({a})), i -> {a}[i]*{b}[i])), "
        f"(x,y) -> x+y)"
    )


SQL_SHINGLE_SETS = f"""
    toks AS (SELECT doc_id AS id, {SQL_TOKENS.format(x='text')} AS w FROM documents),
    sh AS (SELECT DISTINCT id, unnest({SQL_SHINGLES3.format(w='w')}) AS shingle FROM toks),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id)
"""

SQL_EXHAUSTIVE_JACCARD = f"""
    WITH {SQL_SHINGLE_SETS},
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE >= 0.6
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "d1_dedup_exact",
    oracle=f"""
    SELECT md5({SQL_NORM.format(x='text')}) AS fingerprint,
           min(doc_id) AS rep_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized-text md5; one row per "
    "cluster with representative id and multiplicity.",
    tags=("dedup",),
)
def d1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_clusters(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "d2_dedup_ngram_jaccard",
    oracle=SQL_EXHAUSTIVE_JACCARD,
    doc="Exact word-3-gram Jaccard near-dup pairs (threshold 0.6) via "
    "shingle inverted index — the verification primitive.",
    tags=("dedup",),
)
def d2_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.6
    )


@register(
    "d3_dedup_minhash_lsh",
    oracle=SQL_EXHAUSTIVE_JACCARD,
    doc="""MinHash+LSH near-dup discovery (K=32 seeded xxhash64
    minhashes, 16 bands of r=2) with exact Jaccard verification of
    candidates. The oracle is the EXHAUSTIVE pairwise Jaccard — the LSH
    path must recover exactly the same pairs (miss probability
    (1-J^2)^16 <= 8e-4 at J=0.6, 3e-12 at the J >= 0.9 pairs present in
    the data). This is the 100 TB dedup path: one linear band-bucket
    shuffle, verification only on candidate pairs.""",
    tags=("dedup", "lsh"),
)
def d3_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_hashes=32, threshold=0.6
    )


SQL_CAPPED_JACCARD = f"""
    WITH toks AS (SELECT doc_id AS id, {SQL_TOKENS.format(x='text')} AS w FROM documents),
    sh0 AS (SELECT DISTINCT id, unnest({SQL_SHINGLES3.format(w='w')}) AS shingle FROM toks),
    dfc AS (SELECT shingle, count(*) AS dfreq FROM sh0 GROUP BY 1),
    sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN dfc USING (shingle) WHERE dfreq <= 5),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE >= 0.6
"""


@register(
    "d7_dedup_stop_shingle",
    oracle=SQL_CAPPED_JACCARD,
    doc="""MinHash+LSH dedup with the stop-shingle cap (document
    frequency <= 5): THE skew defense at 100 TB, where boilerplate
    n-grams occurring in millions of docs would make posting lists and
    LSH buckets quadratic in the hot key. Similarity is *defined* over
    the capped shingle space (deterministic, not lossy), so the oracle
    is the capped exhaustive Jaccard; signatures and verification both
    operate post-cap.""",
    tags=("dedup", "lsh", "skew"),
)
def d7_dedup_stop_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, num_hashes=32, threshold=0.6, max_doc_freq=5,
    )


def _simhash_oracle(bits: int = 30, max_hamming: int = 3) -> str:
    charfold = SQL_CHARFOLD.format(x="tok")
    bit_sums = ",\n           ".join(
        f"SUM((((h >> {i}) & 1)*2 - 1)) AS s{i}" for i in range(bits)
    )
    sig = " + ".join(
        f"CASE WHEN s{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END" for i in range(bits)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({SQL_TOKENS.format(x='text')}) AS tok FROM documents
    ),
    hashed AS (SELECT id, {charfold} AS h FROM toks),
    bitsums AS (SELECT id, {bit_sums} FROM hashed GROUP BY id),
    sigs AS (SELECT id, {sig} AS simhash FROM bitsums)
    SELECT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sigs a JOIN sigs b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@register(
    "d4_dedup_simhash",
    oracle=_simhash_oracle(),
    doc="""SimHash near-dup pairs: 30-bit bit-majority signature over
    char-fold token hashes, hamming <= 3. Spark side uses pigeonhole
    banding (4 chunks -> equi-joins, exact); oracle brute-forces the
    cross join — identical result by construction.""",
    tags=("dedup",),
)
def d4_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", bits=30, max_hamming=3
    )


@register(
    "d5_dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e)
    SELECT a.id AS id_a, b.id AS id_b,
           {sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos_sim
    FROM n a JOIN n b ON a.id < b.id
    WHERE {sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.5
    """,
    doc="Embedding-cosine near-dup pairs (>= 0.5) — brute-force baseline; "
    "sequential-fold double arithmetic, bit-identical across engines.",
    tags=("dedup", "vectors"),
)
def d5_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_cosine_pairs(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.5
    )


def _lsh_adaptive_pairs_oracle(
    threshold: float = 0.5,
    bands: int = 4,
    dims: int = 64,
    target_occupancy: int = 64,
    r_min: int = 4,
    r_cap: int = 16,
    cap_factor: int | None = None,
) -> str:
    """Static-SQL twin of ``embedding_cosine_pairs_lsh_adaptive``: the
    bits-per-band r is DATA-DERIVED on both engines (smallest r in
    [r_min, r_cap] with 2**r * target_occupancy >= count — the same
    integer comparison ``adaptive_band_bits`` runs, so no float-log2
    divergence). The SQL computes each band's FULL r_cap-bit block
    signature as literals and masks the low r bits at runtime —
    bit-for-bit the keys Spark gets by evaluating only the first r
    hyperplanes of the block (both pack little-endian by LOCAL plane
    index). Capped mode replicates the data-derived hot-bucket cap
    ``greatest(32, cap_factor * n >> r)`` and the DISTINCT pair dedup.
    """
    weights = S.hyperplane_weights(bands * r_cap, dims)

    def block_sig(b: int) -> str:
        terms = []
        for p in range(r_cap):
            row = weights[b * r_cap + p]
            lits = "[" + ", ".join(f"{float(x)}" for x in row) + "]"
            terms.append(
                f"CASE WHEN list_reduce(list_concat([0.0::DOUBLE], "
                f"list_transform(generate_series(1, len(v)), i -> v[i]*({lits}[i]))), "
                f"(x,y) -> x+y) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
            )
        return " + ".join(terms)

    sig_cols = ", ".join(f"{block_sig(b)} AS s{b}" for b in range(bands))
    key_case = (
        "CASE band "
        + " ".join(f"WHEN {b} THEN s{b}" for b in range(bands))
        + " END"
    )
    if cap_factor is not None:
        cap_ctes = f""",
    cap AS (SELECT greatest(32, ({cap_factor} * cnt.n) >> geo.r) AS mb
            FROM cnt, geo),
    xs AS (SELECT x.* FROM x
           JOIN (SELECT band, key FROM x GROUP BY band, key
                 HAVING count(*) <= (SELECT mb FROM cap)) bs
           USING (band, key))"""
        cand_src = "xs"
    else:
        cap_ctes = ""
        cand_src = "x"
    return f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    cnt AS (SELECT count(*) AS n FROM e),
    geo AS (SELECT coalesce(min(rr), {r_cap}) AS r
            FROM (SELECT unnest(range({r_min}, {r_cap} + 1)) AS rr) t, cnt
            WHERE (1::BIGINT << rr) * {target_occupancy} >= cnt.n),
    n AS (SELECT id, v, sqrt({sql_dot('v', 'v')}) AS nrm, {sig_cols} FROM e),
    x AS (SELECT id, band,
                 ({key_case}) & ((1::BIGINT << geo.r) - 1) AS key
          FROM n, geo, (SELECT unnest(range({bands})) AS band)){cap_ctes},
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM {cand_src} a JOIN {cand_src} b
             ON a.band = b.band AND a.key = b.key AND a.id < b.id)
    SELECT c.id_a, c.id_b,
           {sql_dot('na.v', 'nb.v')} / (na.nrm * nb.nrm) AS cos_sim
    FROM cand c JOIN n na ON na.id = c.id_a JOIN n nb ON nb.id = c.id_b
    WHERE {sql_dot('na.v', 'nb.v')} / (na.nrm * nb.nrm) >= {threshold}
    """


@register(
    "d5l_dedup_embedding_lsh",
    oracle=_lsh_adaptive_pairs_oracle(),
    doc="""Banded hyperplane-LSH threshold-pairs dedup — the 100 TB
    default path for d5 (brute force kept as the oracle cross-check,
    mirroring the v1/v2 ANN split), with the banding GEOMETRY DERIVED
    FROM CORPUS SIZE (VERDICT r10 #1): r = adaptive_band_bits(n) bits
    per band so expected bucket occupancy stays ~constant and the
    aggregate candidate count is ~n * occupancy * bands / 2 — LINEAR
    in n, where any fixed r is Omega(n^2 / 2^r). Per-band independent
    r-bit signatures -> ONE narrow equi-self-join on (band, key) over
    (id, keys[bands]) rows -> vectors joined back -> exact cosine on
    survivors only. No cartesian/BNLJ node and no vector ever rides
    the banding shuffle (asserted in tests/test_plan_shapes.py); the
    derivation is integer-exact on both engines, so the oracle replays
    the identical banding (operators/dedup.py adaptive_band_bits).""",
    tags=("dedup", "vectors", "lsh"),
)
def d5l_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rescue scan parallelism on an undersplit corpus file (no-op at
    # 100 TB): every join downstream is broadcast, so the signature
    # HOFs, the banding fan-out AND the exact-cosine folds all inherit
    # the scan's partitioning — measured 1.75x bench-faithful at sf0.1
    # (2.73 -> 1.55 s min-of-3 alternated; the scoring job ran as ONE
    # task before). Same pattern/justification as the flagship's
    # rebalance_scan (r17).
    return D.embedding_cosine_pairs_lsh_adaptive(
        rebalance_scan(load(spark, sf_dir, "embeddings"), spark),
        "vec_id", "embedding",
        threshold=0.5, bands=4, dims=64,
        n_rows=parquet_row_count(sf_dir, "embeddings"),
    )


@register(
    "d14_dedup_lsh_bucket_cap",
    oracle=_lsh_adaptive_pairs_oracle(cap_factor=4),
    doc="""d5l's adaptive banded hyperplane-LSH dedup WITH THE
    HOT-BUCKET CAP engaged — the defense the sf10 adversarial sweep
    proved necessary (r9 session 2): a 100x-replicated corpus turns
    LSH buckets into >=100-member near-dup cliques and uncapped pair
    enumeration is Omega(sum bucket^2). Two data-derived parameters,
    identical on both engines (VERDICT r10 #1): (1) the banding
    GEOMETRY — r = adaptive_band_bits(n) bits per band, so the key
    space grows with the corpus, expected occupancy stays ~constant,
    and ORGANIC growth keeps the aggregate candidate count linear in n
    (fixing the fixed-r quadratic the r10 verdict flagged); (2) the
    CAP — greatest(32, 4n >> r) = 4x the expected occupancy, dropped
    BEFORE the self-join (the size aggregation shuffles (band,key)
    rows only), bounding per-bucket fan-out at cap^2 against
    DEGENERATE corpora (replicated boilerplate cliques) that beat any
    uniform-growth analysis. Dropped hot buckets are near-identical
    content by construction — a production run routes their members
    through the exact/minhash path (d1/d3), the same division of labor
    as d7's stop-shingle cap. The one driver-side scalar is the corpus
    count (table-stats at 100 TB). Oracle replicates geometry + cap +
    DISTINCT pair dedup exactly (operators/dedup.py:
    embedding_cosine_pairs_lsh_adaptive).""",
    tags=("dedup", "vectors", "lsh", "skew"),
)
def d14_dedup_lsh_bucket_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_cosine_pairs_lsh_adaptive(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=0.5, bands=4, dims=64, cap_factor=4,
        n_rows=parquet_row_count(sf_dir, "embeddings"),
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@register(
    "v1_ann_bruteforce_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e),
    q AS (SELECT * FROM n WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_dot('q.v', 'c.v')} / (q.nrm * c.nrm) AS cos_sim
        FROM n c JOIN q ON q.vec_id != c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, rn AS "rank", neighbor_id, cos_sim FROM ranked WHERE rn <= 5
    """,
    doc="Exact cosine top-5 for query vectors vec_id<10: broadcast query "
    "block x corpus scan, per-query window rank (ties broken by id).",
    tags=("similarity",),
)
def v1_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


def _lsh_oracle(planes: int = 8, dims: int = 64, k: int = 5) -> str:
    weights = S.hyperplane_weights(planes, dims)
    dot_cols = []
    for p, row in enumerate(weights):
        lits = "[" + ", ".join(f"{float(x)}" for x in row) + "]"
        dot_cols.append(
            f"CASE WHEN list_reduce(list_concat([0.0::DOUBLE], "
            f"list_transform(generate_series(1, len(v)), i -> v[i]*({lits}[i]))), "
            f"(x,y) -> x+y) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    sig = " + ".join(dot_cols)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm, {sig} AS bucket FROM e),
    q AS (SELECT * FROM n WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_dot('q.v', 'c.v')} / (q.nrm * c.nrm) AS cos_sim
        FROM n c JOIN q ON q.bucket = c.bucket AND q.vec_id != c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, rn AS "rank", neighbor_id, cos_sim FROM ranked WHERE rn <= {k}
    """


@register(
    "v2_ann_lsh_topk",
    oracle=_lsh_oracle(),
    doc="""Hyperplane-LSH top-5: deterministic pseudo-random +-1
    hyperplanes (char-fold seeded, no RNG) -> 8-bit signature bucket ->
    score only within the query's bucket. Approximate vs brute force but
    fully deterministic, so the oracle replicates it exactly. The scale
    path: corpus hashed once, each query probes one bucket.""",
    tags=("similarity", "lsh"),
)
def v2_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.hyperplane_lsh_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5, planes=8, dims=64
    )


def _ivf_oracle(k: int = 5, n_cells: int = 16, nprobe: int = 4) -> str:
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
             ORDER BY vec_id LIMIT {n_cells}),
    assign AS (
        SELECT vec_id, v, nrm, cell FROM (
            SELECT c.vec_id, c.v, c.nrm, cent.cid AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY {sql_dot('c.v', 'cent.cv')} / (c.nrm * cent.cnrm) DESC,
                                cent.cid ASC) AS rn
            FROM n c CROSS JOIN cent
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id, v, nrm, cell FROM (
            SELECT q.vec_id, q.v, q.nrm, cent.cid AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {sql_dot('q.v', 'cent.cv')} / (q.nrm * cent.cnrm) DESC,
                                cent.cid ASC) AS rn
            FROM (SELECT * FROM n WHERE vec_id < 10) q CROSS JOIN cent
        ) WHERE rn <= {nprobe}
    ),
    scored AS (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_dot('p.v', 'c.v')} / (p.nrm * c.nrm) AS cos_sim
        FROM assign c JOIN probes p ON p.cell = c.cell AND p.vec_id != c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, rn AS "rank", neighbor_id, cos_sim FROM ranked WHERE rn <= {k}
    """


@register(
    "v3_ann_ivf_topk",
    oracle=_ivf_oracle(),
    doc="""IVF (inverted-file) top-5: corpus partitioned into 16 Voronoi
    cells around deterministic seed centroids (smallest-id vectors;
    production swaps in k-means — identical query dataflow), each query
    probes its 4 nearest cells. Approximate vs brute force but fully
    deterministic, so the oracle replicates it exactly. Complements
    v2's hyperplane-LSH as the second ANN scale path.""",
    tags=("similarity", "ivf"),
)
def v3_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        k=5, n_cells=16, nprobe=4,
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "t1_token_stats",
    oracle=rf"""
    SELECT doc_id AS id,
           length(text) AS n_chars,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           len(regexp_extract_all({SQL_NORM.format(x='text')},
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_wordish
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex segmentation "
    "(letters | digits | single symbol).",
    tags=("text",),
)
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.token_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in A.STOPWORDS) + "]"


@register(
    "t2_quality_score",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id AS id, text, {SQL_TOKENS.format(x='text')} AS toks
        FROM documents
    ),
    m AS (
        SELECT id,
               len(toks) AS n_tokens,
               list_reduce(list_concat([0::BIGINT],
                   list_transform(toks, x -> length(x)::BIGINT)),
                   (a,b) -> a+b) AS total_tok_len,
               length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
               length(text) AS n_chars,
               len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop
        FROM t
    )
    SELECT id, n_tokens,
           total_tok_len::DOUBLE / n_tokens::DOUBLE AS mean_token_len,
           n_punct::DOUBLE / n_chars::DOUBLE AS punct_ratio,
           n_stop::DOUBLE / n_tokens::DOUBLE AS stopword_ratio,
           (n_tokens >= 10 AND n_tokens <= 100000
            AND n_stop::DOUBLE / n_tokens::DOUBLE >= 0.01) AS keep
    FROM m
    """,
    doc="Gopher/C4-style quality heuristics: token count, mean token "
    "length, punctuation ratio, stopword ratio, keep flag.",
    tags=("text",),
)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # heavy row-local text metrics on an undersplit scan: rebalance is
    # a no-op at 100 TB and buys 32-way evaluation here (measured
    # 1.91x bench-faithful at sf0.1, 0.41 -> 0.21 s)
    return A.quality_score(
        rebalance_scan(load(spark, sf_dir, "documents"), spark), "doc_id", "text"
    )


def _lang_oracle() -> str:
    score = {
        lang: f"len(list_filter(toks, x -> list_contains([{', '.join(repr(m) for m in markers)}], x)))"
        for lang, markers in A.LANG_MARKERS.items()
    }
    return f"""
    WITH t AS (SELECT doc_id AS id, {SQL_TOKENS.format(x='text')} AS toks FROM documents),
    s AS (SELECT id, {score['en']} AS score_en, {score['de']} AS score_de,
                 {score['es']} AS score_es FROM t)
    SELECT id, score_en, score_de, score_es,
           CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en > 0 THEN 'en'
                WHEN score_de >= score_es AND score_de > 0 THEN 'de'
                WHEN score_es > 0 THEN 'es'
                ELSE 'und' END AS lang_pred
    FROM s
    """


@register(
    "t3_lang_id",
    oracle=_lang_oracle(),
    doc="Marker-word language ID with deterministic argmax precedence "
    "(en >= de >= es, 'und' when no markers hit).",
    tags=("text",),
)
def t3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.lang_id(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "t4_fingerprint",
    oracle=f"""
    SELECT doc_id AS id,
           md5({SQL_NORM.format(x='text')}) AS fp_md5,
           {SQL_CHARFOLD.format(x=SQL_NORM.format(x='text'))} AS fp_fold
    FROM documents
    """,
    doc="Document fingerprinting: md5 + char-fold rolling hash of "
    "normalized text.",
    tags=("text",),
)
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.fingerprint(load(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "mm1_multimodal_decode",
    oracle="""
    SELECT doc_id AS id,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS digest,
           (octet_length(text::BLOB) % 64 + 1)::INTEGER AS width,
           (octet_length(text::BLOB) % 48 + 1)::INTEGER AS height,
           (octet_length(text::BLOB) % 16 + 1)::INTEGER AS n_frames
    FROM documents
    """,
    doc="""Multimodal column plumbing: pack text as an opaque binary
    payload, then mapInPandas (Arrow-batched) "decode" to typed
    metadata. The decoder is a deterministic stub (no media libs in
    this env — real path raises NotImplementedError); the schema,
    batching, and partitioning are the real thing.""",
    tags=("multimodal", "pandas-udf"),
)
def mm1_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return MM.decode_metadata(MM.to_binary_payload(docs, "doc_id", "text"))


@register(
    "mm2_frame_sample",
    oracle="""
    WITH meta AS (
        SELECT doc_id AS id, (octet_length(text::BLOB) % 16 + 1)::INTEGER AS n_frames
        FROM documents
    )
    SELECT id, n_frames, i AS frame_idx
    FROM meta, LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS i)
    WHERE i % 4 = 0
    """,
    doc="Video frame-sampling plumbing: explode decoded frame indices, "
    "keep every 4th (decode itself stubbed).",
    tags=("multimodal",),
)
def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    meta = MM.decode_metadata(MM.to_binary_payload(docs, "doc_id", "text"))
    return MM.frame_sample(meta, every_n=4)


# ---------------------------------------------------------------------------
# composite: the end-to-end training-data cleaning pipeline in one plan
# ---------------------------------------------------------------------------


def _corpus_clean_oracle() -> str:
    stop = "[" + ", ".join(f"'{w}'" for w in A.STOPWORDS) + "]"
    lang = {
        lng: f"len(list_filter(toks, x -> list_contains([{', '.join(repr(m) for m in markers)}], x)))"
        for lng, markers in A.LANG_MARKERS.items()
    }
    return f"""
    WITH t AS (
        SELECT doc_id AS id, text, {SQL_TOKENS.format(x='text')} AS toks FROM documents
    ),
    m AS (
        SELECT id, text, len(toks) AS n_tokens,
               len(list_filter(toks, x -> list_contains({stop}, x))) AS n_stop,
               {lang['en']} AS score_en, {lang['de']} AS score_de,
               {lang['es']} AS score_es
        FROM t
    ),
    kept AS (
        SELECT id, text, n_tokens,
               n_stop::DOUBLE / n_tokens::DOUBLE AS stopword_ratio
        FROM m
        WHERE n_tokens >= 10 AND n_tokens <= 100000
          AND n_stop::DOUBLE / n_tokens::DOUBLE >= 0.01
          AND score_en >= score_de AND score_en >= score_es AND score_en > 0
    ),
    cl AS (
        SELECT md5({SQL_NORM.format(x='text')}) AS fingerprint,
               min(id) AS rep_id, count(*) AS n_dups
        FROM kept GROUP BY 1
    )
    SELECT k.id, k.n_tokens, k.stopword_ratio, cl.n_dups
    FROM kept k JOIN cl ON cl.rep_id = k.id
    """


@register(
    "llm_corpus_clean",
    oracle=_corpus_clean_oracle(),
    doc="""The LLM-data flagship: one declarative plan chaining the
    cleaning stages a training-data pipeline runs at 100 TB —
    quality filter (Gopher/C4-style thresholds) -> language filter
    (keep 'en') -> exact dedup among survivors (keep cluster
    representative, carry multiplicity). ONE scan of documents: the
    tokens array binds once, every per-doc flag is a column of the
    same projection, and the cluster stats (min id, multiplicity)
    come from a window over the fingerprint — no join anywhere, one
    shuffle total.""",
    tags=("text", "dedup", "pipeline"),
)
def llm_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TXT

    docs = load(spark, sf_dir, "documents")
    bound = docs.select(
        F.col("doc_id").alias("id"),
        TXT.tokens(F.col("text")).alias("__tok"),
        F.md5(TXT.normalize(F.col("text"))).alias("fingerprint"),
    )
    toks = F.col("__tok")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*A.STOPWORDS)))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in A.LANG_MARKERS.items()
    }
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    keep = (n_tokens >= 10) & (n_tokens <= 100000) & (stop_ratio >= 0.01)
    is_en = (
        (scores["en"] >= scores["de"])
        & (scores["en"] >= scores["es"])
        & (scores["en"] > 0)
    )
    kept = bound.select(
        "id",
        "fingerprint",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
    ).where(keep & is_en)
    w = Window.partitionBy("fingerprint")
    return (
        kept.withColumn("n_dups", F.count(F.lit(1)).over(w))
        .withColumn("rep_id", F.min("id").over(w))
        .filter(F.col("id") == F.col("rep_id"))
        .select("id", "n_tokens", "stopword_ratio", "n_dups")
    )


@register(
    "mm3_feature_extract",
    oracle="""
    -- payload bytes == ascii codes here (documents.text is pure ASCII,
    -- verified <= 121), so the byte histogram equals the char histogram.
    -- Features leave the engine as 8 scalar columns, never a raw ARRAY
    -- cell: the driver's pandas canonicalizer cannot hash list cells.
    WITH b AS (
        SELECT doc_id AS id,
               list_transform(string_split(text, ''), c -> ascii(c)) AS bytes,
               greatest(length(text), 1) AS n
        FROM documents
    )
    SELECT id,
           (len(list_filter(bytes, x -> x % 8 = 0))::DOUBLE / n::DOUBLE) AS f0,
           (len(list_filter(bytes, x -> x % 8 = 1))::DOUBLE / n::DOUBLE) AS f1,
           (len(list_filter(bytes, x -> x % 8 = 2))::DOUBLE / n::DOUBLE) AS f2,
           (len(list_filter(bytes, x -> x % 8 = 3))::DOUBLE / n::DOUBLE) AS f3,
           (len(list_filter(bytes, x -> x % 8 = 4))::DOUBLE / n::DOUBLE) AS f4,
           (len(list_filter(bytes, x -> x % 8 = 5))::DOUBLE / n::DOUBLE) AS f5,
           (len(list_filter(bytes, x -> x % 8 = 6))::DOUBLE / n::DOUBLE) AS f6,
           (len(list_filter(bytes, x -> x % 8 = 7))::DOUBLE / n::DOUBLE) AS f7
    FROM b
    """,
    doc="""Multimodal feature extraction plumbing: Arrow mapInPandas,
    payload in -> float vector out (the ONNX/torch slot); stubbed with a
    deterministic byte-histogram projection so the oracle is exact. The
    driver surface projects the vector to scalar columns f0..f7 (raw
    array cells break the driver's pandas value hash).""",
    tags=("multimodal", "pandas-udf"),
)
def mm3_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    feats = MM.extract_features(MM.to_binary_payload(docs, "doc_id", "text"), dim=8)
    return feats.select(
        "id", *[F.col("features")[i].alias(f"f{i}") for i in range(8)]
    )


@register(
    "mm4_resize_plan",
    oracle="""
    WITH meta AS (
        SELECT doc_id AS id,
               (octet_length(text::BLOB) % 64 + 1)::INTEGER AS width,
               (octet_length(text::BLOB) % 48 + 1)::INTEGER AS height
        FROM documents
    )
    SELECT id, width, height,
           greatest(1, floor(width * scale))::INTEGER  AS out_width,
           greatest(1, floor(height * scale))::INTEGER AS out_height,
           scale
    FROM (SELECT *, least(1.0, 32.0 / width, 24.0 / height) AS scale FROM meta)
    """,
    doc="""Image resize stage, geometry path: aspect-preserving fit into
    32x24, never upscaling, computed JVM-side from decoded dims (decode
    stubbed; pixel resize happens in the same mapInPandas pass in a real
    deployment). IEEE double geometry — bit-identical across engines.""",
    tags=("multimodal",),
)
def mm4_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    meta = MM.decode_metadata(MM.to_binary_payload(docs, "doc_id", "text"))
    return MM.resize_plan(meta, max_w=32, max_h=24)


@register(
    "d6_dedup_cluster_labels",
    oracle=f"""
    WITH RECURSIVE
    {SQL_SHINGLE_SETS},
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT id_a, id_b FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE >= 0.6
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM jpairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM jpairs
    ),
    reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    )
    SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a
    """,
    doc="""Near-dup CLUSTER labeling: connected components over the
    LSH near-dup pair graph via iterative min-label propagation — the
    iterative-algorithm pattern (loop of joins with a scalar
    convergence check, lineage cut per round). Singletons label
    themselves; the oracle computes the same components with a
    recursive-CTE transitive closure over the exhaustive-Jaccard edge
    set (LSH recovers it exactly on this corpus).""",
    tags=("dedup", "iterative"),
)
def d6_dedup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=32, threshold=0.6)
    ids = docs.select(F.col("doc_id").alias("id"))
    return D.connected_components(ids, pairs.select("id_a", "id_b"))


@register(
    "d13_dedup_representative",
    oracle=f"""
    WITH RECURSIVE
    {SQL_SHINGLE_SETS},
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT id_a, id_b FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE >= 0.6
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM jpairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM jpairs
    ),
    reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    labels AS (SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a),
    ranked AS (
        SELECT l.cluster, d.doc_id, length(d.text) AS n_len,
               ROW_NUMBER() OVER (PARTITION BY l.cluster
                                  ORDER BY length(d.text) DESC, d.doc_id) AS rn
        FROM labels l JOIN documents d ON d.doc_id = l.id
    )
    SELECT cluster,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN rn > 1 THEN n_len ELSE 0 END) AS BIGINT)
               AS chars_removed
    FROM ranked GROUP BY cluster
    """,
    doc="""Near-dup cluster REPRESENTATIVE selection (d13) — the step
    that makes pairwise dedup actionable for a training corpus: for
    every connected component of the MinHash-LSH near-dup graph (d6's
    labels), keep exactly ONE document — the longest member, doc_id
    ascending as the deterministic tiebreak ("keep the most complete
    copy", the common crawl-dedup policy) — and account for what was
    dropped (member count + characters removed). One window over the
    labeled docs: rank members per cluster, rn=1 is the keeper, the
    rest aggregate into the removal ledger. Scale shape: d6's banded
    LSH + min-label propagation (no cartesian), then ONE keyed join
    + one cluster-keyed window + one aggregate — every stage keyed by
    cluster, nothing global. The oracle recomputes the identical
    components via recursive-CTE transitive closure and the identical
    window rule.""",
    tags=("dedup", "llm-pipeline", "representative"),
)
def d13_dedup_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=32, threshold=0.6)
    ids = docs.select(F.col("doc_id").alias("id"))
    labels = D.connected_components(ids, pairs.select("id_a", "id_b"))
    member = labels.join(docs, labels["id"] == docs["doc_id"]).select(
        "cluster", "doc_id", F.length("text").alias("n_len")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_len").desc(), F.col("doc_id").asc()
    )
    ranked = member.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(F.when(F.col("rn") > 1, F.col("n_len")).otherwise(F.lit(0)))
        .cast("long")
        .alias("chars_removed"),
    )


@register(
    "x2_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE
    {SQL_SHINGLE_SETS},
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT id_a, id_b FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE >= 0.6
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM jpairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM jpairs
    ),
    reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    labels AS (SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a),
    hashed AS (
        SELECT id, cluster,
               {SQL_CHARFOLD.format(x="cluster::VARCHAR")} % 10 AS bucket
        FROM labels
    )
    SELECT id, cluster,
           CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM hashed
    """,
    doc="""Leakage-safe train/val/test split: the split is assigned per
    near-dup CLUSTER (connected components over the LSH pair graph),
    not per document — near-duplicates can never straddle train and
    test, the contamination a naive per-doc split causes. Assignment is
    a deterministic char-fold hash of the cluster representative
    (80/10/10), so the oracle reproduces it exactly.""",
    tags=("dedup", "pipeline", "iterative"),
)
def x2_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TXT

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=32, threshold=0.6)
    labels = D.connected_components(
        docs.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    )
    bucket = TXT.char_fold_hash(F.col("cluster").cast("string")) % 10
    return labels.select(
        "id",
        "cluster",
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def _lsh_multiprobe_oracle(planes: int = 8, dims: int = 64, k: int = 5) -> str:
    weights = S.hyperplane_weights(planes, dims)
    dot_cols = []
    for p, row in enumerate(weights):
        lits = "[" + ", ".join(f"{float(x)}" for x in row) + "]"
        dot_cols.append(
            f"CASE WHEN list_reduce(list_concat([0.0::DOUBLE], "
            f"list_transform(generate_series(1, len(v)), i -> v[i]*({lits}[i]))), "
            f"(x,y) -> x+y) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    sig = " + ".join(dot_cols)
    probes = ", ".join(["q.bucket"] + [f"xor(q.bucket, {1 << p})" for p in range(planes)])
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm, {sig} AS bucket FROM e),
    q AS (SELECT * FROM n WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_dot('q.v', 'c.v')} / (q.nrm * c.nrm) AS cos_sim
        FROM n c JOIN q ON c.bucket IN ({probes}) AND q.vec_id != c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, rn AS "rank", neighbor_id, cos_sim FROM ranked WHERE rn <= {k}
    """


@register(
    "v4_ann_lsh_multiprobe",
    oracle=_lsh_multiprobe_oracle(),
    doc="""Multi-probe hyperplane LSH top-5: each query additionally
    probes the 8 buckets one bit-flip from its signature — the standard
    recall lever (near misses sit one plane away), at probes-per-query
    cost instead of more hash tables. Deterministic probe set, so the
    oracle enumerates it exactly.""",
    tags=("similarity", "lsh", "multiprobe"),
)
def v4_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.hyperplane_lsh_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        k=5, planes=8, dims=64, multiprobe=True,
    )


def _lsh_adaptive_topk_oracle(
    k: int = 5,
    dims: int = 64,
    target_occupancy: int = 64,
    r_min: int = 4,
    r_cap: int = 16,
) -> str:
    """v16's twin: hyperplane-LSH top-k with the signature WIDTH
    data-derived on both engines (the ANN port of the d5l/d14 adaptive
    geometry): the SQL computes the full r_cap-bit signature as
    literals and masks the low r bits, where r is the same integer
    derivation adaptive_band_bits runs; multiprobe enumerates probe 0
    (exact) plus one bit-flip per ACTIVE plane (pp <= r), deduped with
    DISTINCT before ranking."""
    weights = S.hyperplane_weights(r_cap, dims)
    dot_cols = []
    for p, row in enumerate(weights):
        lits = "[" + ", ".join(f"{float(x)}" for x in row) + "]"
        dot_cols.append(
            f"CASE WHEN list_reduce(list_concat([0.0::DOUBLE], "
            f"list_transform(generate_series(1, len(v)), i -> v[i]*({lits}[i]))), "
            f"(x,y) -> x+y) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    sig = " + ".join(dot_cols)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cnt AS (SELECT count(*) AS n FROM e),
    geo AS (SELECT coalesce(min(rr), {r_cap}) AS r
            FROM (SELECT unnest(range({r_min}, {r_cap} + 1)) AS rr) t, cnt
            WHERE (1::BIGINT << rr) * {target_occupancy} >= cnt.n),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm, {sig} AS sig
          FROM e),
    nb AS (SELECT vec_id, v, nrm,
                  sig & ((1::BIGINT << geo.r) - 1) AS bucket
           FROM n, geo),
    q AS (SELECT * FROM nb WHERE vec_id < 10),
    probes AS (SELECT q.vec_id, q.v, q.nrm,
                      CASE WHEN pp = 0 THEN q.bucket
                           ELSE xor(q.bucket, (1::BIGINT << (pp - 1))) END
                        AS probe
               FROM q, geo, (SELECT unnest(range({r_cap} + 1)) AS pp) t
               WHERE pp <= geo.r),
    scored AS (
        SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_dot('p.v', 'c.v')} / (p.nrm * c.nrm) AS cos_sim
        FROM nb c JOIN probes p
        ON c.bucket = p.probe AND p.vec_id != c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, rn AS "rank", neighbor_id, cos_sim
    FROM ranked WHERE rn <= {k}
    """


@register(
    "v16_ann_lsh_adaptive",
    oracle=_lsh_adaptive_topk_oracle(),
    doc="""Multi-probe hyperplane-LSH top-5 with the signature width
    DERIVED FROM CORPUS SIZE — closing the fixed-key-space caveat the
    r10 verdict noted v2/v4 inherit from d14: planes = the smallest r
    with 2^r * 64 >= n (the same integer derivation as
    dedup.adaptive_band_bits), so expected bucket occupancy — and the
    per-probe candidate scan — stays ~constant as the corpus grows,
    where v2's fixed 8-bit signature scans n/256 rows per probe
    (linear in n). Probe count tracks r = O(log n); v2/v4 stay as the
    preset-pinned baselines (the v1/v2 split's discipline). Oracle
    computes the full 16-bit signature and masks the low r bits with
    the data-derived r — bit-exact replay of the geometry on both
    engines (operators/similarity.py:hyperplane_lsh_topk_adaptive).""",
    tags=("similarity", "lsh", "multiprobe", "adaptive"),
)
def v16_ann_lsh_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.hyperplane_lsh_topk_adaptive(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        k=5, dims=64, multiprobe=True,
        n_rows=parquet_row_count(sf_dir, "embeddings"),
    )


@register(
    "t5_tfidf_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({SQL_TOKENS.format(x='text')}) AS term
        FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT id, term, tf, df,
               CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                     ORDER BY tfidf DESC, term ASC) AS "rank"
        FROM scored
    )
    SELECT id, "rank", term, tf, df, tfidf FROM ranked WHERE "rank" <= 3
    """,
    doc="""Top-3 characteristic terms per document by TF-IDF (ratio
    IDF — exact integer counts + one IEEE division, so bit-stable
    across engines where ln is not). The document-frequency table and
    corpus size stay in-plan (broadcast 1-row aggregate, no
    driver-side collect).""",
    tags=("text", "tfidf"),
)
def t5_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.tfidf_topk(load(spark, sf_dir, "documents"), "doc_id", "text", k=3)


@register(
    "x5_range_join",
    oracle="""
    WITH intervals AS (
        SELECT event_id AS interval_id, ts AS start_ts,
               ts + INTERVAL 1 HOUR * ((event_id % 7) + 1) AS end_ts
        FROM events WHERE event_id % 500 = 0
    )
    SELECT i.interval_id, e.event_id, e.ts
    FROM events e JOIN intervals i
      ON i.start_ts <= e.ts AND e.ts < i.end_ts
    """,
    doc="""Point-in-interval range join (no equi key) via bin
    bucketing (operators.range_join): points keyed by their time
    bucket, intervals exploded to every overlapping bucket, equi-join
    + residual. Each match found in exactly one bucket, so no dedup.
    The naive plan Spark would pick for the bare inequality is
    BroadcastNestedLoop — O(|P| x |I|); bucketing makes it one
    shuffled equi-join, the 100 TB path.""",
    tags=("join", "range"),
)
def x5_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import range_join

    events = load(spark, sf_dir, "events")
    points = events.select("event_id", "ts")
    intervals = events.filter(F.col("event_id") % 500 == 0).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        # interval arithmetic keeps the type NTZ-safe and tz-free (a
        # double round-trip is illegal on TIMESTAMP_NTZ inputs) and
        # mirrors the oracle's `ts + INTERVAL 1 HOUR * ((id % 7) + 1)`
        F.expr(
            "ts + make_dt_interval(0, CAST((event_id % 7) + 1 AS INT), 0, 0)"
        ).alias("end_ts"),
    )
    return range_join(
        points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=3600
    ).select("interval_id", "event_id", "ts")


def _kmeans_ctes(n_cells: int = 8, dims: int = 64, iterations: int = 1):
    """The unrolled-Lloyd CTE chain, reusable: returns (cte_list,
    final_centroid_cte_name) where the final CTE has (cid, cv, cn).
    Shared by the kmeans oracles (v6/v9) and the trained-IVF oracle
    (v15)."""
    dot_vc2 = sql_dot("n.v", "c.cv")
    dot_cc = sql_dot("cv", "cv")

    def assign_cte(out: str, cent: str) -> str:
        return f"""{out} AS (
        SELECT id, v, nrm, cid AS cell FROM (
            SELECT n.id, n.v, n.nrm, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY n.id
                       ORDER BY {dot_vc2} / (n.nrm * c.cn) DESC, c.cid) AS rn
            FROM n CROSS JOIN {cent} c
        ) WHERE rn = 1
    )"""

    def update_cte(dims_name: str, cent_name: str, centn: str, assigned: str) -> str:
        return f"""{dims_name} AS (
        SELECT cell, i,
               list_reduce(list_concat([0.0::DOUBLE], list(v[i] ORDER BY id)),
                           (x,y) -> x+y) / count(*) AS mean
        FROM {assigned}, generate_series(1, {dims}) t(i)
        GROUP BY cell, i
    ),
    {cent_name} AS (
        SELECT cell AS cid, list(mean ORDER BY i) AS cv FROM {dims_name} GROUP BY cell
    ),
    {centn} AS (SELECT cid, cv, sqrt({dot_cc}) AS cn FROM {cent_name})"""

    ctes = [
        f"e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"n AS (SELECT id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e)",
        f"""cn0 AS (
        SELECT row_number() OVER (ORDER BY id) AS cid, v AS cv, nrm AS cn
        FROM (SELECT * FROM n ORDER BY id LIMIT {n_cells})
    )""",
    ]
    for it in range(1, iterations + 1):
        ctes.append(assign_cte(f"a{it}", f"cn{it - 1}"))
        ctes.append(update_cte(f"d{it}", f"c{it}", f"cn{it}", f"a{it}"))
    return ctes, f"cn{iterations}"


def _kmeans_oracle(n_cells: int = 8, dims: int = 64, iterations: int = 1) -> str:
    """Unrolled Lloyd iterations as chained CTEs — the oracle mirror of
    kmeans_lloyd's driver loop (assign -> sequential-fold mean update,
    x``iterations``, then a final assignment)."""
    dot_vc2 = sql_dot("n.v", "c.cv")
    ctes, final_cent = _kmeans_ctes(n_cells, dims, iterations)
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT id AS vec_id, cell FROM (
        SELECT n.id, c.cid AS cell,
               ROW_NUMBER() OVER (PARTITION BY n.id
                   ORDER BY {dot_vc2} / (n.nrm * c.cn) DESC, c.cid) AS rn
        FROM n CROSS JOIN {final_cent} c
    ) WHERE rn = 1
    """


@register(
    "v6_kmeans_assign",
    oracle=_kmeans_oracle(),
    doc="""One Lloyd iteration of k-means (k=8, cosine assignment,
    deterministic smallest-id init) -> final cell per vector: the
    centroid builder behind a real IVF index, and the similarity
    family's iterative-algorithm representative. Centroid means use an
    id-ordered sequential fold so Spark and the oracle agree
    bit-exactly; at 100 TB the fold swaps for plain SUM (order-free,
    map-side combinable) at the cost of last-ulp drift.""",
    tags=("similarity", "kmeans", "iterative"),
)
def v6_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    out = S.kmeans_lloyd(
        emb, "vec_id", "embedding", n_cells=8, iterations=1, exact_means=True
    )
    return out.select(F.col("id").alias("vec_id"), "cell")


@register(
    "v9_kmeans_iter3",
    oracle=_kmeans_oracle(iterations=3),
    doc="""Three Lloyd iterations to (near-)convergence — the loop the
    IVF centroid build actually runs. Same deterministic conventions as
    v6 (smallest-id init, lower-cell tie-break, id-ordered fold means),
    oracle unrolled to three chained assign/update CTE rounds. The
    iteration count is a driver-side loop over lazy plans: each round
    is one broadcast-assignment map + one (cell, dim) shuffle, so depth
    costs linearly and nothing accumulates on the driver.""",
    tags=("similarity", "kmeans", "iterative"),
)
def v9_kmeans_iter3(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    out = S.kmeans_lloyd(
        emb, "vec_id", "embedding", n_cells=8, iterations=3, exact_means=True
    )
    return out.select(F.col("id").alias("vec_id"), "cell")


@register(
    "x6_corpus_mixture_sample",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id, source,
               CAST(substring(source, 4) AS BIGINT) AS src_num,
               CASE WHEN CAST(substring(source, 4) AS BIGINT) < 5  THEN 1.0
                    WHEN CAST(substring(source, 4) AS BIGINT) < 10 THEN 0.5
                    ELSE 0.25 END AS rate
        FROM documents
    )
    SELECT doc_id, source, rate
    FROM rated
    WHERE {SQL_CHARFOLD.format(x="'mix1|' || CAST(doc_id AS VARCHAR)")} % 1000
          < CAST(rate * 1000 AS BIGINT)
    """,
    doc="""Deterministic corpus-mixture sampling: per-source keep rates
    (the training-mix reweighting step — upsample curated sources,
    downsample bulk ones) decided by a salted hash of the doc id, NOT
    rand(): reproducible across runs/retries/engines, no RNG state per
    partition, and changing one source's rate never reshuffles another
    source's sample. Pure projection + filter — no shuffle at any
    scale.""",
    tags=("sampling", "mixture"),
)
def x6_corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TXT

    docs = load(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("long")
    rate = (
        F.when(src_num < 5, F.lit(1.0)).when(src_num < 10, F.lit(0.5)).otherwise(F.lit(0.25))
    )
    keep_hash = TXT.char_fold_hash(
        F.concat(F.lit("mix1|"), F.col("doc_id").cast("string"))
    )
    return (
        docs.withColumn("rate", rate)
        .filter(keep_hash % 1000 < (F.col("rate") * 1000).cast("long"))
        .select("doc_id", "source", "rate")
    )


@register(
    "x7_sequence_packing",
    oracle=f"""
    WITH counted AS (
        SELECT doc_id, len({SQL_TOKENS.format(x='text')}) AS n_tokens
        FROM documents
    ),
    prefixed AS (
        SELECT doc_id, n_tokens,
               -- BIGINT: DuckDB SUM over ints is HUGEINT -> pandas float64
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tokens_before
        FROM counted
    )
    SELECT doc_id, n_tokens, tokens_before,
           CAST(floor(tokens_before / 2048) AS BIGINT) AS bin
    FROM prefixed
    """,
    doc="""Token-budget sequence packing: assign docs (in stable id
    order) to 2048-token bins by exclusive running token count — the
    chunk-assignment step before packing documents into training
    context windows. Exact-integer window cumsum; the single global
    ordering is the oracle-parity formulation — at 100 TB pack within
    partition-local id ranges instead (one window per partition, no
    global sort), which changes bin numbering but not bin quality.""",
    tags=("packing", "window"),
)
def x7_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TXT

    from ..operators.merge import global_prefix_sum

    docs = load(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", F.size(TXT.tokens(F.col("text"))).alias("n_tokens")
    )
    # distributed two-stage prefix sum — a bare Window.orderBy would
    # drag the whole corpus into ONE partition (fatal at 100 TB)
    prefixed = global_prefix_sum(
        counted, ["doc_id"], "n_tokens", "tokens_before", exclusive=True
    )
    return prefixed.select(
        "doc_id",
        "n_tokens",
        "tokens_before",
        F.floor(F.col("tokens_before") / 2048).alias("bin"),
    )


@register(
    "t6_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({SQL_TOKENS.format(x='text')}) AS term
        FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY 1),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    ad AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
    scored AS (
        SELECT id, term, tf, df, dl,
               (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
               * ((CAST(tf AS DOUBLE) * 2.2)
                  / (CAST(tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
                   AS bm25
        FROM tf JOIN dfreq USING (term) JOIN dl USING (id)
        CROSS JOIN n CROSS JOIN ad
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                     ORDER BY bm25 DESC, term ASC) AS "rank"
        FROM scored
    )
    SELECT id, "rank", term, tf, df, dl, bm25 FROM ranked WHERE "rank" <= 3
    """,
    doc="""Top-3 terms per doc by BM25 (k1=1.2, b=0.75): TF saturation
    + document-length normalization above t5's raw TF-IDF. Ratio IDF
    keeps it bit-exact (ln is libm-varying); corpus size and average
    doc length stay in-plan as broadcast 1-row aggregates.""",
    tags=("text", "bm25"),
)
def t6_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.bm25_topk(load(spark, sf_dir, "documents"), "doc_id", "text", k=3)


@register(
    "v7_ann_matmul_topk",
    # RANK-only surface: NumPy's pairwise/SIMD summation differs from
    # the sequential fold in the last ulp, so the SCORES aren't
    # bit-comparable — but the neighbor RANKING is (the synthetic
    # corpus has no cosine ties within 1e-12; tests/test_scale_paths.py
    # additionally pins v7's ranking to the oracle-exact v1). The
    # oracle is therefore the brute-force ranking with the score
    # projected away.
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e),
    q AS (SELECT * FROM n WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_dot('q.v', 'c.v')} / (q.nrm * c.nrm) AS cos_sim
        FROM n c JOIN q ON q.vec_id != c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, rn AS "rank", neighbor_id FROM ranked WHERE rn <= 5
    """,
    doc="""Exact brute-force top-5 by blocked matmul (mapInPandas +
    broadcast query block): the 100 TB brute-force path — no per-pair
    rows, shuffle carries only partition-local top-k candidates, BLAS
    throughput per partition. Driver surface drops the float score
    (NumPy SIMD summation vs sequential fold: last-ulp drift) and
    hash-matches the neighbor ranking itself.""",
    tags=("similarity", "matmul"),
)
def v7_ann_matmul_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.brute_force_topk_matmul(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    ).select("query_id", "rank", "neighbor_id")


@register(
    "d8_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id AS id, source, {SQL_TOKENS.format(x='text')} AS w FROM documents),
    sh AS (SELECT DISTINCT id, source, unnest({SQL_SHINGLES3.format(w='w')}) AS shingle FROM toks),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')
    SELECT s.id, count(*) AS n_overlap
    FROM sh s JOIN ev USING (shingle)
    WHERE s.source <> 'src0'
    GROUP BY s.id
    HAVING count(*) >= 1
    """,
    doc="""Benchmark decontamination: docs from source 'src0' play the
    held-out eval set; every other doc sharing >= 1 word-3-gram with it
    is flagged with its overlap count. Eval shingles broadcast (tiny vs
    the corpus), so the 100 TB side is one scan + one agg shuffle.""",
    tags=("dedup", "decontamination"),
)
def d8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=3,
        min_overlap=1,
    )


@register(
    "t7_repetition_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id AS id, {SQL_TOKENS.format(x='text')} AS w FROM documents),
    m AS (
        SELECT id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
               list_max(list_transform(list_distinct(w),
                                       d -> len(list_filter(w, t -> t = d)))) AS top_token_count
        FROM toks
    )
    SELECT id, n_tokens, n_distinct,
           n_distinct::DOUBLE / n_tokens::DOUBLE AS distinct_ratio,
           top_token_count,
           top_token_count::DOUBLE / n_tokens::DOUBLE AS top_token_frac,
           (n_distinct::DOUBLE / n_tokens::DOUBLE >= 0.2
            AND top_token_count::DOUBLE / n_tokens::DOUBLE <= 0.3) AS keep
    FROM m
    """,
    doc="""Gopher-style repetition filter: distinct-token ratio and
    top-token fraction per doc with a keep flag — in-row array exprs,
    zero shuffles.""",
    tags=("text", "quality"),
)
def t7_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.repetition_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "x8_pii_pseudonymize",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_token,
           regexp_replace(substr(c_name, 1, length(c_name)-4), '[0-9]', '*', 'g')
             || substr(c_name, length(c_name)-3, 4) AS name_masked,
           floor(c_acctbal / 100)::BIGINT AS acctbal_band,
           c_mktsegment
    FROM customer
    """,
    doc="""PII pseudonymization / generalization (governance op for a
    training-data pipeline): deterministic md5 token for joins, digit
    masking that keeps the last 4 characters, and numeric banding
    (k-anonymity-style generalization). Pure row-local expressions —
    whole-stage codegen, no shuffle.""",
    tags=("governance",),
)
def x8_pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = F.col("c_name")
    prefix = F.expr("substring(c_name, 1, length(c_name)-4)")
    suffix = F.expr("substring(c_name, length(c_name)-3, 4)")
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.md5(name).alias("name_token"),
        F.concat(F.regexp_replace(prefix, "[0-9]", "*"), suffix).alias("name_masked"),
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("acctbal_band"),
        "c_mktsegment",
    )


# deterministic PII injection — the synthetic corpus carries no real
# PII, so the probe plants emails/phones/IPs derived from doc_id with
# the SAME expression on both engines (the f26 printf convention)
_PII_TEXT = (
    "text || ' Contact user' || doc_id || '@mail' || (doc_id % 7)"
    " || '.com, call '"
    " || printf('%03d-%03d-%04d', doc_id % 900 + 100,"
    " (doc_id * 3) % 900 + 100, (doc_id * 7) % 9000 + 1000)"
    " || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' || (doc_id % 256)"
    " || '.0.' || (doc_id % 100) ELSE '' END"
)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


@register(
    "t14_pii_redact",
    oracle=f"""
    WITH src AS (SELECT doc_id, {_PII_TEXT} AS t FROM documents),
    red AS (
        SELECT doc_id, t,
               regexp_replace(regexp_replace(regexp_replace(t,
                   '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g'),
                   '{_PII_IP}', '<IP>', 'g') AS redacted,
               len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
               len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones,
               len(regexp_extract_all(t, '{_PII_IP}')) AS n_ips
        FROM src
    )
    SELECT doc_id, redacted, n_emails, n_phones, n_ips,
           (n_emails + n_phones + n_ips) > 0 AS has_pii
    FROM red
    """,
    doc="""PII DETECTION + REDACTION — the scrub pass every public
    training-data pipeline runs before release (emails, phone numbers,
    IPv4 addresses -> typed placeholder tokens, plus per-doc detection
    counts for the removal ledger). Redaction is a CHAIN in a fixed
    documented order (email -> phone -> IP, each over the previous
    output) because the categories' character classes overlap —
    unordered passes could double-hit; counts are measured on the
    ORIGINAL text. Patterns live in the Java∩RE2 common subset so both
    engines match identically; all row-local regexp expressions —
    whole-stage codegen, zero shuffles, linear in corpus bytes at any
    scale. The probe plants deterministic PII (the corpus has none) via
    one shared constructor expression.""",
    tags=("text", "governance", "pii"),
)
def t14_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.expr(_PII_TEXT)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    n_emails = F.regexp_count(t, F.lit(_PII_EMAIL))
    n_phones = F.regexp_count(t, F.lit(_PII_PHONE))
    n_ips = F.regexp_count(t, F.lit(_PII_IP))
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("has_pii"),
    )


@register(
    "v8_quantize_int8",
    oracle=f"""
    WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    s AS (SELECT id, v,
                 127.0 / nullif(list_max(list_transform(v, x -> abs(x))), 0.0) AS scale
          FROM e),
    q AS (SELECT id, v, scale,
                 list_transform(v, x -> round(x * scale)::INTEGER) AS qv
          FROM s)
    SELECT id, scale, len(qv) AS n_dims,
           list_reduce(list_concat([0::BIGINT],
                                   list_transform(qv, x -> abs(x)::BIGINT)),
                       (a, b) -> a + b) AS q_l1,
           list_max(list_transform(generate_series(1, len(qv)),
                                   i -> abs(qv[i]::DOUBLE / scale - v[i]))) AS max_abs_err
    FROM q
    """,
    doc="""Symmetric int8 scalar quantization of embeddings (the 4x
    storage/bandwidth lever for 100 TB ANN) with per-vector audit
    columns: scale, code L1 mass, max reconstruction error. Element-
    wise doubles + order-free max — bit-exact vs the oracle.""",
    tags=("similarity", "quantization"),
)
def v8_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.quantize_int8(load(spark, sf_dir, "embeddings"), "vec_id", "embedding")


@register(
    "x9_chunk_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, tokens, n,
               unnest(generate_series(0, n - 1, 40)) AS start
        FROM toks
    )
    SELECT doc_id, start,
           len(list_slice(tokens, start + 1, least(start + 50, n))) AS chunk_len,
           array_to_string(list_slice(tokens, start + 1, least(start + 50, n)), ' ')
               AS chunk_text
    FROM starts
    """,
    doc="""Training-window chunking: split each document into 50-token
    chunks on a 40-token stride (10-token overlap), the standard
    long-document -> context-window preparation. In-row array ops
    (split / sequence / slice) + one explode — no shuffle at all; chunk
    count scales with corpus size, never with driver memory. Chunk
    text, length, and start offset are all deterministic.""",
    tags=("llm", "chunking", "text"),
)
def x9_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split("text", " ").alias("tokens"),
        F.size(F.split("text", " ")).alias("n"),
    )
    return toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(40))).alias("start"),
        "tokens",
        "n",
    ).select(
        "doc_id",
        "start",
        F.size(F.slice("tokens", F.col("start") + 1, F.lit(50))).alias("chunk_len"),
        F.array_join(F.slice("tokens", F.col("start") + 1, F.lit(50)), " ").alias(
            "chunk_text"
        ),
    )


@register(
    "d9_incremental_dedup",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, md5({SQL_NORM.format(x='text')}) AS fingerprint
        FROM documents
    ),
    hist AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 <> 0),
    batch AS (SELECT * FROM fp WHERE doc_id % 10 = 0)
    SELECT fingerprint, MIN(doc_id) AS rep_id, COUNT(1) AS n_batch_dups
    FROM batch
    WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fingerprint = batch.fingerprint)
    GROUP BY fingerprint
    """,
    doc="""Incremental (continuous-ingest) dedup: an arriving batch
    (doc_id % 10 = 0 here) anti-joined on normalized-text fingerprint
    against the historical corpus, then deduped within the batch. The
    per-cycle operator of a pipeline whose bootstrap is d1; history
    contributes only its distinct 16-byte fingerprints to the shuffle,
    never document text.""",
    tags=("dedup", "incremental", "pipeline"),
)
def d9_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.incremental_dedup(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
    )


@register(
    "x10_source_quality_cap",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id AS id, source,
               len(list_filter({SQL_TOKENS.format(x='text')},
                   t -> list_contains(['the','a','and','of','to','in','is','for'], t)))::DOUBLE
               / len({SQL_TOKENS.format(x='text')})::DOUBLE AS quality
        FROM documents
    ),
    ranked AS (
        SELECT source, id, quality,
               row_number() OVER (PARTITION BY source
                                  ORDER BY quality DESC, id ASC) AS "rank"
        FROM scored
    )
    SELECT source, id, quality, "rank" FROM ranked WHERE "rank" <= 20
    """,
    doc="""Per-source quality cap (web-corpus curation: bound any one
    domain's contribution): top-20 docs per source by stopword-ratio
    quality. Runs the skew-safe two-stage salted top-n — a hot source
    fans out over 8 salt buckets locally, the final per-key window sees
    at most 8*20 rows per key. The oracle is the plain single-window
    form; results are identical by construction.""",
    tags=("text", "curation", "skew"),
)
def x10_source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    from ..functions import text as TXT

    toks = TXT.tokens(F.col("text"))
    scored = docs.select(
        F.col("doc_id").alias("id"),
        F.col("source"),
        (
            F.size(F.filter(toks, lambda t: t.isin(*A.STOPWORDS))).cast("double")
            / F.size(toks).cast("double")
        ).alias("quality"),
    )
    return A.salted_topn_per_key(scored, "source", "quality", "id", n=20).select(
        "source", "id", "quality", "rank"
    )


@register(
    "t8_vocab_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({SQL_TOKENS.format(x='text')}) AS token
        FROM documents
    ),
    agg AS (
        SELECT token, count(*) AS n_occurrences, count(DISTINCT id) AS n_docs
        FROM toks GROUP BY token
    ),
    top AS (
        SELECT * FROM agg ORDER BY n_occurrences DESC, token ASC LIMIT 50
    )
    SELECT token, n_occurrences, n_docs,
           row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS "rank"
    FROM top
    """,
    doc="""Corpus vocabulary: global token-frequency table, top-50 by
    occurrence count. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k + k-row merge, never a global sort); the rank
    window runs after the limit, over k rows only.""",
    tags=("text", "vocab"),
)
def t8_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.vocab_topk(load(spark, sf_dir, "documents"), "doc_id", "text", k=50)


@register(
    "t9_bigram_assoc",
    oracle=f"""
    WITH toks AS (SELECT {SQL_TOKENS.format(x='text')} AS w FROM documents),
    uni AS (SELECT unnest(w) AS token FROM toks),
    uc AS (SELECT token, count(*) AS c FROM uni GROUP BY token),
    -- parallel unnests zip positionally in DuckDB: bigram (w[i], w[i+1])
    bg AS (
        SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        FROM toks
    ),
    bc AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
    n AS (SELECT sum(c)::BIGINT AS n_tokens FROM uc),
    m AS (SELECT sum(c_xy)::BIGINT AS m_bigrams FROM bc)
    SELECT bc.w1, bc.w2, bc.c_xy, cx.c AS c_x, cy.c AS c_y,
           (bc.c_xy * n.n_tokens * n.n_tokens)::DOUBLE
           / (m.m_bigrams * cx.c * cy.c)::DOUBLE AS lift
    FROM bc
    JOIN uc cx ON cx.token = bc.w1
    JOIN uc cy ON cy.token = bc.w2
    CROSS JOIN n CROSS JOIN m
    WHERE bc.c_xy >= 5
    ORDER BY lift DESC, bc.w1 ASC, bc.w2 ASC
    LIMIT 50
    """,
    doc="""Collocation mining: top-50 bigrams by PMI-style lift
    p(xy)/(p(x)p(y)) as one exact-BIGINT-product IEEE division (log
    dropped — monotone, so ranking is unchanged and parity is
    bit-exact). Bigrams form in-row (zip of the token array with its
    tail — no self-join); two count shuffles + broadcastable unigram
    joins + TakeOrderedAndProject.""",
    tags=("text", "collocation"),
)
def t9_bigram_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.bigram_assoc_topk(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=50, min_count=5
    )


@register(
    "x12_similar_doc_retrieval",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e),
    q AS (SELECT * FROM n WHERE vec_id < 50),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_dot('q.v', 'c.v')} / (q.nrm * c.nrm) AS cos_sim
        FROM n c JOIN q ON q.vec_id != c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT r.query_id, r.rn AS "rank", r.neighbor_id, r.cos_sim,
           dq.source AS query_source,
           dn.source AS neighbor_source,
           dn.lang   AS neighbor_lang,
           dq.source = dn.source AS same_source
    FROM ranked r
    JOIN documents dq ON dq.doc_id = r.query_id
    JOIN documents dn ON dn.doc_id = r.neighbor_id
    WHERE r.rn <= 3
    """,
    doc="""Cross-modal retrieval: for each query document, its top-3
    nearest documents by embedding cosine (exact, self excluded), with
    text-side metadata joined back for BOTH endpoints and a
    same-source flag — the join shape of retrieval-augmented data
    curation (find near-neighbor training docs, then reason about
    their provenance). The doc_id = vec_id identity join broadcasts
    the small metadata projection; at 100 TB the ANN stage swaps to
    ivf_topk/hyperplane_lsh_topk with the same downstream join.""",
    tags=("similarity", "multimodal", "join"),
)
def x12_similar_doc_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    topk = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 50), "vec_id", "embedding", k=3
    )
    dq = docs.select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("query_source")
    )
    dn = docs.select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("source").alias("neighbor_source"),
        F.col("lang").alias("neighbor_lang"),
    )
    return (
        topk.join(F.broadcast(dq), "query_id")
        .join(F.broadcast(dn), "neighbor_id")
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            "cos_sim",
            "query_source",
            "neighbor_source",
            "neighbor_lang",
            (F.col("query_source") == F.col("neighbor_source")).alias("same_source"),
        )
    )


@register(
    "udf1_pandas_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS.format(x='text')} AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> length(x) >= 6)) AS BIGINT)
               AS n_long_tokens,
           CAST(list_reduce(list_concat([0::BIGINT],
                list_transform(toks, x -> length(x)::BIGINT)), (a, b) -> a + b)
               AS BIGINT) AS n_chars
    FROM t
    """,
    doc="""Arrow-batched pandas UDF in the ORACLE-CHECKED surface: a
    vectorized Python function (pandas str ops over Arrow batches, no
    per-row Python) computes token counts that must equal the oracle's
    SQL tokenization bit-for-bit. Integer outputs make a Python UDF
    oracle-comparable — no float reassociation — so this pins the whole
    Arrow transfer path (batching, nulls, schema) under the driver's
    hash, where the pure-JVM t1 battery cannot see a UDF bug. The UDF
    is the SLOW PATH by policy (functions docstring): use it only where
    built-ins genuinely cannot express the logic; here it exists to
    prove the plumbing.""",
    tags=("pandas-udf", "arrow", "text"),
)
def udf1_pandas_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_tokens bigint, n_long_tokens bigint, n_chars bigint")
    def token_stats(text: pd.Series) -> pd.DataFrame:
        # mirror functions.text.normalize/tokens exactly: lower,
        # collapse whitespace, trim, split on single spaces. The
        # whitespace class is pinned to ASCII ([ \t\n\r\f\v], not \s):
        # Python re's \s is Unicode-aware while the oracle's RE2 \s is
        # ASCII — identical here only while the corpus is ASCII, so the
        # UDF enforces the narrower semantics explicitly. NULL text
        # batches arrive as NaN: fillna('') keeps the row (0 tokens of
        # '' -> [''], matching the JVM/SQL split of an empty string).
        norm = (
            text.fillna("")
            .str.lower()
            .str.replace(r"[ \t\n\r\f\v]+", " ", regex=True)
            .str.strip()
        )
        toks = norm.str.split(" ")
        return pd.DataFrame(
            {
                "n_tokens": toks.map(len),
                "n_long_tokens": toks.map(
                    lambda ts: sum(1 for t in ts if len(t) >= 6)
                ),
                "n_chars": toks.map(lambda ts: sum(len(t) for t in ts)),
            }
        )

    docs = load(spark, sf_dir, "documents")
    out = docs.select("doc_id", token_stats(F.col("text")).alias("s"))
    return out.select(
        "doc_id",
        F.col("s.n_tokens").alias("n_tokens"),
        F.col("s.n_long_tokens").alias("n_long_tokens"),
        F.col("s.n_chars").alias("n_chars"),
    )


@register(
    "v10_ann_quantized_rerank",
    oracle=f"""
    WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    s AS (SELECT id, v, 127.0 / list_max(list_transform(v, x -> abs(x))) AS scale,
                 sqrt({sql_dot('v', 'v')}) AS nrm
          FROM e
          WHERE list_max(list_transform(v, x -> abs(x))) > 0),
    c AS (SELECT id, v, scale, nrm,
                 list_transform(v, x -> round(x * scale)::INTEGER) AS qv
          FROM s),
    q AS (SELECT * FROM c WHERE id < 10),
    scored AS (
        SELECT q.id AS query_id, c.id AS neighbor_id,
               q.v AS qv_f, c.v AS cv_f, q.nrm AS qn, c.nrm AS cn,
               CAST(list_reduce(list_concat([0::BIGINT],
                        list_transform(generate_series(1, len(q.qv)),
                                       i -> (q.qv[i] * c.qv[i])::BIGINT)),
                    (a, b) -> a + b) AS DOUBLE)
                   / (q.scale * c.scale * q.nrm * c.nrm) AS approx_cos
        FROM c JOIN q ON q.id != c.id
    ),
    short AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY approx_cos DESC, neighbor_id) AS sr
        FROM scored
    ),
    exact AS (
        SELECT query_id, neighbor_id, approx_cos,
               {sql_dot('qv_f', 'cv_f')} / (qn * cn) AS cos_sim
        FROM short WHERE sr <= 20
    )
    SELECT query_id, rnk AS "rank", neighbor_id, cos_sim, approx_cos
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM exact)
    WHERE rnk <= 5
    """,
    doc="""Two-stage quantize-then-rerank ANN: int8 codes (v8's
    quantization) score a 20-deep shortlist with EXACT BIGINT dot
    products, then full-precision cosine reranks to top-5 — the
    retrieval pattern that cuts scan bandwidth 4-8x at 100 TB while
    the exact path touches only shortlist-many full vectors per query.
    Every stage (HALF_UP quantization, integer dot, fixed double
    chain, id tiebreaks) is bit-reproducible, so even the intermediate
    shortlist hash-matches the oracle.""",
    tags=("similarity", "quantization", "rerank"),
)
def v10_ann_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.quantized_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        k=5, shortlist=20,
    )


def _bpe_chain_parts(n_merges: int) -> list[str]:
    """Unrolled DuckDB twin of operators.analysis._bpe_chain: the same
    space-sentinel string representation, the same greedy-left
    positional merge fold (list_reduce with a string accumulator —
    bit-identical to the Spark-side aggregate()), the same (count
    desc, pair asc) argmax per step. ``w`` rides through every seq CTE
    (unused by the pair counts) so the encode oracle can join back."""
    parts = [
        f"v0 AS (SELECT w, count(*) AS freq FROM "
        f"(SELECT unnest({SQL_TOKENS.format(x='text')}) AS w FROM documents) GROUP BY w)",
        "seq0 AS (SELECT w, freq, ' ' || array_to_string("
        "list_transform(generate_series(1, length(w)), i -> w[i]), ' ') || ' ' AS seq "
        "FROM v0)",
    ]
    for s in range(1, n_merges + 1):
        prev = f"seq{s - 1}"
        parts.append(
            f"p{s} AS (SELECT t.freq, toks[g.i] AS l, toks[g.i + 1] AS r "
            f"FROM (SELECT freq, string_split(trim(seq), ' ') AS toks FROM {prev}) t, "
            f"UNNEST(generate_series(1, len(t.toks) - 1)) AS g(i))"
        )
        parts.append(
            f"b{s} AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS pair_count "
            f"FROM p{s} GROUP BY l, r ORDER BY pair_count DESC, l, r LIMIT 1)"
        )
        parts.append(
            f"seq{s} AS (SELECT t.w, t.freq, "
            f"' ' || list_reduce(string_split(trim(t.seq), ' '), "
            f"(acc, tok) -> CASE "
            f"WHEN tok = b.r AND (acc = b.l OR ends_with(acc, ' ' || b.l)) "
            f"THEN substring(acc, 1, length(acc) - length(b.l)) || b.l || b.r "
            f"ELSE acc || ' ' || tok END) || ' ' AS seq "
            f"FROM {prev} t, b{s} b)"
        )
    return parts


def _bpe_oracle(n_merges: int = 5) -> str:
    finals = " UNION ALL ".join(
        f"SELECT {s} AS step, l, r, l || r AS merged, pair_count FROM b{s}"
        for s in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(_bpe_chain_parts(n_merges)) + "\n" + finals


def _bpe_encode_oracle(n_merges: int = 5) -> str:
    parts = _bpe_chain_parts(n_merges)
    parts.append(
        f"wordlen AS (SELECT w, len(string_split(trim(seq), ' ')) AS n_sym "
        f"FROM seq{n_merges})"
    )
    parts.append(
        f"doc_toks AS (SELECT doc_id AS id, unnest({SQL_TOKENS.format(x='text')}) AS w "
        f"FROM documents)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(length(t.w)) AS BIGINT) AS n_chars, "
        "CAST(sum(n_sym) AS BIGINT) AS n_tokens "
        "FROM doc_toks t JOIN wordlen v ON t.w = v.w GROUP BY id"
    )


@register(
    "t10_bpe_merges",
    oracle=_bpe_oracle(5),
    doc="""BPE subword-tokenizer training, first 5 merge steps, as one
    chained declarative plan (operators/analysis.py:bpe_merge_steps):
    word-frequency-weighted adjacent-pair counts, in-plan 1-row argmax
    per step (no driver collect), merge application as a greedy-left
    positional fold (Sennrich semantics: consecutive occurrences all
    merge — aggregate() in Spark, the identical list_reduce fold in
    DuckDB) — so the learned merge table is bit-exact against the
    oracle. Per-step shuffle is vocabulary-bounded, never
    corpus-bounded.""",
    tags=("text", "bpe", "iterative"),
)
def t10_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.bpe_merge_steps(load(spark, sf_dir, "documents"), "doc_id", "text", n_merges=5)


@register(
    "x14_content_defined_chunks",
    oracle="""
    WITH base AS (
        SELECT doc_id AS id, text AS t FROM documents WHERE length(text) >= 1
    ),
    pos AS (
        SELECT id, t, length(t) AS n,
               list_filter(
                   generate_series(4, greatest(length(t), 4)),
                   i -> i <= length(t) AND i < length(t)
                        AND ((((ascii(t[i-3]) * 31 + ascii(t[i-2])) * 31
                              + ascii(t[i-1])) * 31 + ascii(t[i])) % 32 = 0)
               ) AS bounds
        FROM base
    ),
    spans AS (
        SELECT id, t, n,
               list_concat([1], list_transform(bounds, x -> x + 1)) AS starts,
               list_concat(bounds, [n]) AS ends
        FROM pos
    )
    SELECT id, g.i - 1 AS chunk_idx, starts[g.i] AS start_pos,
           ends[g.i] - starts[g.i] + 1 AS chunk_len,
           md5(substring(t, starts[g.i]::INTEGER,
                         (ends[g.i] - starts[g.i] + 1)::INTEGER)) AS chunk_md5
    FROM spans, UNNEST(generate_series(1, len(starts))) AS g(i)
    """,
    doc="""Content-defined chunking (Rabin-style rolling-hash cuts,
    ~32-char average chunks): boundaries move WITH the content, so a
    single-character insertion re-synchronizes immediately and chunk-
    level exact dedup still matches everything past the edit — the
    insertion-robust primitive fixed-stride chunking (x9) lacks, per
    the rsync/LBFS lineage. One scan, in-row array expressions only,
    4-term polynomial hash bit-identical in the oracle.""",
    tags=("dedup", "chunking", "pipeline"),
)
def x14_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.content_defined_chunks(
        load(spark, sf_dir, "documents"), "doc_id", "text", window=4, mask=31
    )


@register(
    "t11_bigram_lm_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id AS id, {SQL_TOKENS.format(x='text')} AS w
                  FROM documents),
    inst AS (SELECT id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
             FROM toks),
    doc_bg AS (SELECT id, w1, w2, CAST(count(*) AS BIGINT) AS k
               FROM inst GROUP BY 1, 2, 3),
    lm_bi AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c_xy
              FROM doc_bg GROUP BY 1, 2),
    lm_ctx AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x
               FROM lm_bi GROUP BY 1),
    scored AS (
        SELECT d.id, CAST(sum(d.k) AS BIGINT) AS n_bigrams,
               CAST(sum(d.k * ((b.c_xy * CAST(1000000000 AS BIGINT)) // x.c_x))
                    AS BIGINT) AS sum_p
        FROM doc_bg d
        JOIN lm_bi b ON b.w1 = d.w1 AND b.w2 = d.w2
        JOIN lm_ctx x ON x.w1 = d.w1
        GROUP BY d.id
    )
    SELECT doc.doc_id AS id,
           COALESCE(s.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
           CAST(s.sum_p AS DOUBLE)
             / CAST(nullif(s.n_bigrams, 0) * CAST(1000000000 AS BIGINT) AS DOUBLE)
               AS lm_score
    FROM documents doc LEFT JOIN scored s ON s.id = doc.doc_id
    """,
    doc="""Corpus-LM likelihood scoring (t11): train a bigram LM over
    the corpus and score every document by its average conditional
    bigram probability — the perplexity-style quality filter of a
    pretraining pipeline, with log-perplexity replaced by the
    average-probability ratio (libm ln is not bit-stable; the
    low-likelihood tail ranking is preserved). Probabilities are
    scaled-BIGINT floor divisions (exact in both engines) so the
    per-doc sum is order-independent; one IEEE double division at the
    end. Bigrams form in-row; LM state attaches via (w1,w2)/(w1) hash
    joins — never the driver.""",
    tags=("text", "lm", "quality"),
)
def t11_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.bigram_lm_score(load(spark, sf_dir, "documents"), "doc_id", "text")


def _x16_edges_sql() -> str:
    return (
        "SELECT DISTINCT 'C' || CAST(o.o_custkey AS VARCHAR) AS src, "
        "'S' || CAST(l.l_suppkey AS VARCHAR) AS dst "
        "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
    )


def _x16_oracle() -> str:
    from ..operators.graph import sql_pagerank_oracle

    inner = sql_pagerank_oracle(_x16_edges_sql(), iterations=3)
    return f"""
    WITH ranked AS ({inner})
    SELECT node, pr,
           CAST(pr AS DOUBLE) / 1000000000000.0 AS pr_score
    FROM ranked
    ORDER BY pr DESC, node ASC
    LIMIT 20
    """


@register(
    "x16_pagerank_iter3",
    oracle=_x16_oracle(),
    doc="""Iterative PageRank (3 damped iterations) over the
    customer->supplier purchase graph, top-20 nodes — the
    link-analysis member of the iterative-algorithm family (d6
    connected components, v9 k-means). Ranks are scaled BIGINTs and
    every division is integer floor division, so each iteration is
    order-independent and the DuckDB oracle replays the EXACT loop as
    unrolled CTEs (the v9 pattern) — an iterative float algorithm made
    bit-reproducible. Per iteration: one shuffle of the edge list on
    dst; rank and degree relations are node-sized; N is an in-plan
    broadcast aggregate (no driver scalars). The loop unrolls into a
    single lazy plan; at tens of iterations, localCheckpoint every ~5
    (the d6 discipline).""",
    tags=("graph", "iterative", "pagerank"),
)
def x16_pagerank_iter3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import SCALE, pagerank

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.concat(F.lit("C"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
    )
    pr = pagerank(edges, iterations=3)
    return (
        pr.select(
            "node",
            "pr",
            (F.col("pr").cast("double") / F.lit(float(SCALE))).alias("pr_score"),
        )
        .orderBy(F.col("pr").desc(), F.col("node").asc())
        .limit(20)
    )


@register(
    "x18_fuzzy_name_join",
    oracle="""
    WITH names AS (SELECT DISTINCT lower(p_name) AS nm FROM part),
    grams AS (
        SELECT DISTINCT nm,
               unnest(list_transform(
                   generate_series(1, greatest(length(nm) - 2, 1)),
                   i -> substring(nm, i, 3))) AS g
        FROM names
    ),
    cand AS (
        SELECT DISTINCT a.nm AS n1, b.nm AS n2
        FROM grams a JOIN grams b ON a.g = b.g AND a.nm < b.nm
        WHERE abs(length(a.nm) - length(b.nm)) <= 2
    )
    SELECT n1, n2, CAST(levenshtein(n1, n2) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(n1, n2) <= 3
    """,
    doc="""Fuzzy entity-matching join over part names: distinct-name
    pairs within edit distance 3, candidates blocked by shared
    3-grams + length tolerance so the exact levenshtein DP runs only
    on survivors, never on the O(V²) cross product — the
    entity-resolution canonicalization primitive (vendor/product name
    cleanup before a dimension MERGE). Gram blocking shuffles like
    any key join and caps hot grams like d7's stop-shingles at
    scale.""",
    tags=("fuzzy", "entity-resolution", "join"),
)
def x18_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.fuzzy_name_pairs(
        load(spark, sf_dir, "part"), "p_name", q=3, max_dist=3, len_tol=2
    )


def _x17_oracle() -> str:
    from ..operators.sketches import sql_md5_hash64

    h = sql_md5_hash64("doc_id", salt="x17")
    return f"""
    WITH pri AS (
        SELECT doc_id, source, n_chars,
               ({h}) // greatest(n_chars, 1) AS priority
        FROM documents
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY priority ASC, doc_id ASC
        ) AS rk FROM pri
    )
    SELECT doc_id, source, n_chars, priority
    FROM ranked WHERE rk <= 5
    """


@register(
    "x17_weighted_sample",
    oracle=_x17_oracle(),
    doc="""Deterministic weighted sampling per source (5 docs each),
    size-biased toward longer documents: priority = hash(id) // weight
    — the A-ES exponential-key scheme with the float power replaced by
    integer floor division (same size-biased ordering property for the
    selection it drives, and bit-reproducible: no RNG state, no libm).
    Reproducible sampling is what makes a training-mix ablation
    meaningful — rerunning the pipeline anywhere reselects the exact
    same documents. One md5 per row + a per-source top-k window; at a
    hot source, swap in the salted two-stage window
    (analysis.salted_topn_per_key, the x10 discipline).""",
    tags=("sampling", "llm-pipeline", "deterministic"),
)
def x17_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import md5_hash64

    docs = load(spark, sf_dir, "documents")
    pri = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            "CAST(conv(substring(md5(concat('x17:', CAST(doc_id AS STRING))), 1, 15),"
            " 16, 10) AS BIGINT) div greatest(n_chars, CAST(1 AS BIGINT))"
        ).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").asc(), F.col("doc_id").asc()
    )
    return (
        pri.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "source", "n_chars", "priority")
    )


@register(
    "d10_segment_boilerplate",
    oracle=f"""
    WITH toks AS (SELECT doc_id AS id, {SQL_TOKENS.format(x='text')} AS w FROM documents),
    base AS (SELECT id, w FROM toks WHERE len(w) >= 1),
    segs AS (
        SELECT id, g.i AS pos,
               array_to_string(list_slice(w, g.i * 8 + 1, g.i * 8 + 8), ' ') AS seg
        FROM base,
             UNNEST(generate_series(0, CAST((len(w) + 7) // 8 AS BIGINT) - 1)) AS g(i)
    ),
    dfreq AS (SELECT seg, count(DISTINCT id) AS dfr FROM segs GROUP BY seg),
    marked AS (SELECT s.id, s.pos, s.seg, d.dfr FROM segs s JOIN dfreq d ON s.seg = d.seg)
    SELECT id, CAST(count(*) AS BIGINT) AS n_seg,
           CAST(sum(CASE WHEN dfr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           md5(coalesce(
               string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE dfr <= 1), ''
           )) AS clean_md5
    FROM marked GROUP BY id
    """,
    doc="""Cross-document segment-level boilerplate removal (the
    line-dedup pass of CCNet/RefinedWeb-style web pipelines): chunk
    each document into 8-word segments in-row, count corpus-wide
    segment doc-frequency in ONE vocabulary-bounded aggregate, strip
    every segment shared by >1 documents, and reassemble survivors in
    original order (order-restoring array_sort(collect_list) /
    string_agg ORDER BY twin). Exact-duplicate documents lose ALL
    their segments (clean_md5 of ''), partial overlaps lose only the
    shared spans — per-doc (n_seg, n_dropped, clean_md5) is
    bit-compared. operators/dedup.py:segment_boilerplate_filter.""",
    tags=("dedup", "boilerplate", "pipeline"),
)
def d10_segment_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.segment_boilerplate_filter(
        load(spark, sf_dir, "documents"), "doc_id", "text", seg_words=8, max_doc_freq=1
    )


@register(
    "t12_bpe_encode",
    oracle=_bpe_encode_oracle(5),
    doc="""BPE tokenization with the merge table t10 trains — training
    chain and corpus encoding in ONE lazy plan (no driver round-trip
    for the merges). Encoding is per unique WORD: the chain's final
    vocab state maps each word to its post-merge symbol count, and the
    corpus joins exploded words against that vocabulary-sized table —
    linear in corpus tokens, vocabulary-bounded shuffle (the batch-
    encode shape production tokenizer pipelines use at 100 TB).
    Per-document (n_words, n_chars, n_tokens) is bit-compared.
    operators/analysis.py:bpe_encode.""",
    tags=("text", "bpe", "tokenize"),
)
def t12_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.bpe_encode(load(spark, sf_dir, "documents"), "doc_id", "text", n_merges=5)


@register(
    "d11_semantic_dedup",
    oracle=f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e),
    cent AS (
        SELECT row_number() OVER (ORDER BY id) AS cid, v AS cv, nrm AS cn
        FROM (SELECT * FROM n ORDER BY id LIMIT 8)
    ),
    scored AS (
        SELECT n.id, n.v, n.nrm, c.cid,
               {sql_dot('n.v', 'c.cv')} / (n.nrm * c.cn) AS cos
        FROM n, cent c
    ),
    asg AS (
        SELECT id, v, nrm, cid AS cell
        FROM (SELECT *, row_number() OVER (PARTITION BY id
                                           ORDER BY cos DESC, cid) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    dups AS (
        SELECT DISTINCT b.id
        FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
        WHERE {sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.45
    )
    SELECT a.id AS vec_id, a.cell,
           CAST(CASE WHEN d.id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
    FROM asg a LEFT JOIN dups d ON a.id = d.id
    """,
    doc="""SemDeDup-style cluster-then-prune semantic dedup: one
    broadcast argmax-cosine assignment to 8 seed clusters, then exact
    cosine pruning ONLY within clusters (pair cost = sum of
    cluster-size^2, never corpus^2 — the clustering IS the scale
    mechanism; n_cells grows with the corpus). Greedy-by-id keep
    policy; full (vec_id, cell, is_dup) row set bit-compared.
    operators/similarity.py:semantic_dedup_labels.""",
    tags=("dedup", "vectors", "clustering"),
)
def d11_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.semantic_dedup_labels(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        n_cells=8, threshold=0.45,
    )


def _pq_oracle(m_subs: int = 8, d: int = 8, k_codes: int = 16,
               shortlist: int = 20, k: int = 5) -> str:
    l2sq = (
        "list_reduce(list_concat([0.0::DOUBLE], "
        f"list_transform(generate_series(1, {d}), "
        "i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))), (x,y) -> x+y)"
    )
    return f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e),
    subs AS (SELECT id, g.m, list_slice(v, g.m*{d}+1, g.m*{d}+{d}) AS sv
             FROM n, UNNEST(generate_series(0, {m_subs - 1})) AS g(m)),
    seeds AS (SELECT row_number() OVER (ORDER BY id) - 1 AS code, v
              FROM (SELECT * FROM n ORDER BY id LIMIT {k_codes})),
    cb AS (SELECT code, g.m, list_slice(v, g.m*{d}+1, g.m*{d}+{d}) AS cv
           FROM seeds, UNNEST(generate_series(0, {m_subs - 1})) AS g(m)),
    enc AS (SELECT id, m, code FROM (
              SELECT s.id, s.m, c.code,
                     row_number() OVER (PARTITION BY s.id, s.m
                                        ORDER BY {l2sq}, c.code) AS rn
              FROM subs s JOIN cb c ON s.m = c.m) WHERE rn = 1),
    q AS (SELECT id, v, nrm FROM n WHERE id < 10),
    qsubs AS (SELECT id AS qid, g.m, list_slice(v, g.m*{d}+1, g.m*{d}+{d}) AS qsv
              FROM q, UNNEST(generate_series(0, {m_subs - 1})) AS g(m)),
    lut AS (SELECT qs.qid, c.m, c.code, {sql_dot('qs.qsv', 'c.cv')} AS part
            FROM qsubs qs JOIN cb c ON qs.m = c.m),
    approx AS (SELECT l.qid, x.id,
                 list_reduce(list_concat([0.0::DOUBLE], list(l.part ORDER BY l.m)),
                             (a,b) -> a+b) AS approx_dot
               FROM enc x JOIN lut l ON l.m = x.m AND l.code = x.code
               GROUP BY l.qid, x.id),
    short AS (SELECT *, row_number() OVER (PARTITION BY qid
                                           ORDER BY approx_dot DESC, id) AS sr
              FROM approx WHERE qid <> id),
    ex AS (SELECT s.qid, s.id, s.approx_dot,
                  {sql_dot('qv.v', 'cv.v')} / (qv.nrm * cv.nrm) AS cos_sim
           FROM short s JOIN n cv ON cv.id = s.id JOIN q qv ON qv.id = s.qid
           WHERE s.sr <= {shortlist})
    SELECT qid AS query_id, rnk AS "rank", id AS neighbor_id, cos_sim, approx_dot
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY cos_sim DESC, id) AS rnk FROM ex)
    WHERE rnk <= {k}
    """


@register(
    "v11_pq_adc_topk",
    oracle=_pq_oracle(),
    doc="""Product-quantization ANN with asymmetric distance
    computation (IVF-PQ lineage): 64-dim vectors compress to 8 code
    bytes (32x), each query scores the whole corpus through a tiny
    per-query (subspace x code) lookup table joined against the codes
    — floats are touched only for the 20-deep shortlist's exact
    cosine rerank. ADC sums fold in SUBSPACE ORDER (8-element ordered
    fold, never a partition-order double SUM) so every stage —
    encoding argmin, approx scores, final ranks — is bit-exact vs the
    oracle. operators/similarity.py:pq_adc_topk.""",
    tags=("similarity", "quantization", "pq"),
)
def v11_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        dims=64, m_subs=8, k_codes=16, shortlist=20, k=5,
    )


@register(
    "x19_stratified_exact_sample",
    oracle="""
    WITH strata AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n, CAST(sum(n_s // 5) AS BIGINT) AS base_sum FROM strata),
    alloc AS (
        SELECT source, n_s,
               n_s // 5
               + CASE WHEN row_number() OVER (ORDER BY n_s % 5 DESC, source)
                           <= (SELECT n // 5 - base_sum FROM tot)
                      THEN 1 ELSE 0 END AS k_s
        FROM strata
    ),
    ranked AS (
        SELECT d.doc_id, d.source, a.k_s,
               row_number() OVER (PARTITION BY d.source
                                  ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
        FROM documents d JOIN alloc a ON d.source = a.source
    )
    SELECT doc_id, source FROM ranked WHERE rn <= k_s
    """,
    doc="""Exact stratified sampling (largest-remainder / Hamilton
    allocation): a 20% sample whose GLOBAL size is exactly floor(N/5)
    and whose per-source allocation is floor(n_s/5) plus one extra for
    the strata with the largest integer remainders — the
    every-run-identical eval-split sampler (x6/x17 are rate-based:
    their per-source counts drift binomially; an eval harness needs
    exact counts). Selection within a stratum takes the smallest
    md5-key documents (deterministic, uniform in the hash). All
    allocation arithmetic is integer (n_s // 5, n_s % 5, one ranked
    window over the STRATA table — source-cardinality-bounded, never
    corpus-bounded); the per-doc rank window partitions by source.""",
    tags=("pipeline", "sampling", "stratified"),
)
def x19_stratified_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    tot = strata.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.sum(F.expr("n_s div 5")).cast("long").alias("base_sum"),
    )
    w_rem = Window.orderBy(F.expr("n_s % 5").desc(), F.col("source").asc())
    alloc = (
        strata.crossJoin(F.broadcast(tot))
        .withColumn("__rr", F.row_number().over(w_rem))
        .select(
            "source",
            (
                F.expr("n_s div 5")
                + F.when(F.col("__rr") <= F.expr("n div 5 - base_sum"), 1).otherwise(0)
            ).alias("k_s"),
        )
    )
    w_doc = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(alloc), "source")
        .withColumn("__rn", F.row_number().over(w_doc))
        .filter(F.col("__rn") <= F.col("k_s"))
        .select("doc_id", "source")
    )


@register(
    "udf3_arrow_udtf_chunker",
    oracle="""
    SELECT d.doc_id, CAST(g.i AS INT) AS chunk_idx,
           substr(d.text, CAST(g.i * 150 + 1 AS BIGINT), 200) AS chunk
    FROM documents d,
         UNNEST(generate_series(0,
             CAST(floor((length(d.text) - 1) / 150.0) AS BIGINT))) AS g(i)
    WHERE length(d.text) > 0
    """,
    doc="""Spark 4 Python UDTF surface (r8 — the table-function member
    of the Python-extension family udf1 scalar / udf2 grouped-map /
    e3 stateful / mm mapInPandas): a text chunker emitting overlapping
    200-char windows at stride 150 per document, registered with
    ``useArrow=True`` so rows move in Arrow batches
    (ArrowEvalPythonUDTF in the plan — pinned), invoked through the
    SQL LATERAL form exactly as a user would. DEMONSTRATION of the
    extension point, not the recommended plan: x9_chunk_documents is
    the declarative JVM-side chunker and the 100 TB path; the UDTF
    costs a Python worker round-trip per batch regardless of Arrow.
    The oracle replays the same windows with generate_series +
    substr — empty documents emit no chunks on both engines.""",
    tags=("udf", "udtf", "arrow", "llm-pipeline"),
)
def udf3_arrow_udtf_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string", useArrow=True)
    class Chunker:
        def eval(self, text):  # noqa: ANN001
            t = text or ""
            for i in range(0, len(t), 150):
                yield i // 150, t[i : i + 200]

    spark.udtf.register("udf3_chunker", Chunker)
    load(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk"
        " FROM __udtf_docs d, LATERAL udf3_chunker(d.text) c"
    )


@register(
    "udf2_grouped_map_zscore",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sx,
               CAST(sum(cents * cents) AS BIGINT) AS sxx
        FROM c GROUP BY user_id
    )
    SELECT c.user_id, c.event_id,
           CASE WHEN m.n * m.sxx - m.sx * m.sx = 0 THEN 0.0
                ELSE CAST(m.n * c.cents - m.sx AS DOUBLE)
                     / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE))
           END AS z
    FROM c JOIN m ON c.user_id = m.user_id
    """,
    doc="""Grouped-map `applyInPandas` surface check (the one Pandas
    API mode udf1/mm1/e3 don't cover: pandas_udf scalar, mapInPandas,
    applyInPandasWithState): per-user z-score normalization of event
    values where each group arrives as ONE pandas frame. Exists to
    pin the Arrow group-transfer path — like udf1, deliberately an
    API-surface test; the declarative twin of this computation is a
    join against grouped moments (the oracle shows it). Deterministic
    despite Python: values scale to cents, moments accumulate as
    exact int64 (n*sxx bounded far under 2^63 here; DECIMAL at
    100 TB), and each row's z is (exact int -> double) / sqrt(exact
    int -> double) — two correctly-rounded IEEE ops, bit-identical to
    the SQL twin. Constant groups z=0 guard. Scale: one shuffle on
    user_id; per-group memory is that user's rows (bounded by
    per-entity activity, not corpus size).""",
    tags=("udf", "applyInPandas", "statistics"),
)
def udf2_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        sx = int(pdf["cents"].sum())
        sxx = int((pdf["cents"] * pdf["cents"]).sum())
        nvar = n * sxx - sx * sx
        if nvar == 0:
            z = pdf["cents"] * 0.0
        else:
            num = (n * pdf["cents"] - sx).astype("float64")
            z = num / math.sqrt(float(nvar))
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "z": z}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="user_id bigint, event_id bigint, z double"
    )


@register(
    "d12_duplicate_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id AS id, {SQL_TOKENS.format(x='text')} AS w FROM documents),
    sh AS (
        SELECT id, g.i - 1 AS pos,
               w[g.i]||' '||w[g.i+1]||' '||w[g.i+2]||' '||w[g.i+3]||' '||w[g.i+4] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS g(i)
    ),
    dfreq AS (SELECT shingle, count(DISTINCT id) AS dfr FROM sh GROUP BY shingle),
    marked AS (SELECT s.id, s.pos, d.dfr FROM sh s JOIN dfreq d ON s.shingle = d.shingle),
    stats AS (
        SELECT id, CAST(count(*) AS BIGINT) AS n_sh,
               CAST(sum(CASE WHEN dfr >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM marked GROUP BY id
    ),
    isl AS (
        SELECT id, pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS grp
        FROM marked WHERE dfr >= 2
    ),
    runs AS (SELECT id, grp, count(*) AS run FROM isl GROUP BY id, grp),
    mx AS (SELECT id, max(run) AS max_run FROM runs GROUP BY id)
    SELECT s.id, s.n_sh, s.n_dup,
           CAST(COALESCE(m.max_run + 4, 0) AS BIGINT) AS max_dup_span_words
    FROM stats s LEFT JOIN mx m ON s.id = m.id
    """,
    doc="""Exact duplicated-span detection (substring-dedup signal,
    Lee et al. 2022 lineage): per-document count of word 5-gram
    shingles shared with other documents and the LONGEST contiguous
    duplicated span in words — the signal that catches partially-
    copied text document-level dedup misses. Run lengths come from a
    declarative gaps-and-islands pass (pos - row_number constant
    within a run), identical in both engines; doc-freq is one
    vocabulary-bounded aggregate. operators/dedup.py:duplicate_spans.""",
    tags=("dedup", "spans", "pipeline"),
)
def d12_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.duplicate_spans(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=5, min_doc_freq=2
    )


def _recall_eval_oracle() -> str:
    # compose the EXISTING v1 (exact) / v2 (single-bucket LSH) / v4
    # (multiprobe LSH) oracle texts as subqueries — the evaluation must
    # measure the same indexes the driver checks, so the texts are
    # shared, not re-derived
    v1 = REGISTRY["v1_ann_bruteforce_topk"].oracle
    v2 = REGISTRY["v2_ann_lsh_topk"].oracle
    v4 = REGISTRY["v4_ann_lsh_multiprobe"].oracle
    return f"""
    SELECT ex.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(b.neighbor_id) AS BIGINT) AS hits_bucket,
           CAST(count(m.neighbor_id) AS BIGINT) AS hits_multiprobe,
           CAST(count(b.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_bucket,
           CAST(count(m.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_multiprobe
    FROM ({v1}) ex
    LEFT JOIN ({v2}) b
      ON ex.query_id = b.query_id AND ex.neighbor_id = b.neighbor_id
    LEFT JOIN ({v4}) m
      ON ex.query_id = m.query_id AND ex.neighbor_id = m.neighbor_id
    GROUP BY ex.query_id
    """


@register(
    "v13_ann_recall_eval",
    oracle=None,  # attached below (composes v1/v2/v4 oracles, which must exist first)
    doc="""ANN index-quality evaluation as an operator: per-query
    recall@5 of the v2 single-bucket LSH AND the v4 multiprobe LSH
    against the v1 exact top-k, computed IN ONE PLAN (left joins of
    the top-k outputs on (query, neighbor)) — 'measure, don\'t guess'
    applied to the index itself, and the probe lever made visible
    (multiprobe recovers neighbors the single bucket misses; on this
    isotropic random corpus absolute recall is inherently low, which
    is exactly what the measurement is for — production-recall paths
    are IVF nprobe (v3) and banded d5l). This is the job a 100 TB
    pipeline schedules after (re)building an index: cost is
    queries x k rows regardless of corpus size. The oracle composes
    the very same v1/v2/v4 oracle texts as subqueries. recall is an
    exact small-integer division (IEEE-identical).""",
    tags=("similarity", "evaluation", "lsh"),
)
def v13_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )

    def hits(df: DataFrame, tag: str) -> DataFrame:
        return df.select("query_id", "neighbor_id").withColumn(tag, F.lit(1))

    bucket = hits(
        S.hyperplane_lsh_topk(
            emb, queries, "vec_id", "embedding", k=5, planes=8, dims=64
        ),
        "__b",
    )
    multi = hits(
        S.hyperplane_lsh_topk(
            emb, queries, "vec_id", "embedding", k=5, planes=8, dims=64,
            multiprobe=True,
        ),
        "__m",
    )
    n = F.count(F.lit(1))
    return (
        exact.join(bucket, ["query_id", "neighbor_id"], "left")
        .join(multi, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            n.cast("long").alias("n_exact"),
            F.count("__b").cast("long").alias("hits_bucket"),
            F.count("__m").cast("long").alias("hits_multiprobe"),
            (F.count("__b").cast("double") / n.cast("double")).alias("recall_bucket"),
            (F.count("__m").cast("double") / n.cast("double")).alias("recall_multiprobe"),
        )
    )


REGISTRY["v13_ann_recall_eval"].oracle = _recall_eval_oracle()


@register(
    "x20_temperature_mixture",
    oracle=f"""
    WITH strata AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source
    ),
    w AS (SELECT source, n_s,
                 CAST(floor(sqrt(n_s) * 1024) AS BIGINT) AS s_s FROM strata),
    tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
                   CAST(sum(s_s) AS BIGINT) AS s_sum FROM w)
    SELECT d.doc_id, d.source,
           least(((t.n // 4) * w.s_s * 1000000) // (t.s_sum * w.n_s),
                 1000000) AS keep_threshold
    FROM documents d JOIN w ON d.source = w.source, tot t
    WHERE {SQL_CHARFOLD.format(x="'temp1|' || CAST(d.doc_id AS VARCHAR)")} % 1000000
          < least(((t.n // 4) * w.s_s * 1000000) // (t.s_sum * w.n_s), 1000000)
    """,
    doc="""Temperature-scaled mixture sampling (the n^alpha source
    reweighting of multilingual/multi-source LM training, alpha=0.5):
    per-source keep probability proportional to sqrt(n_s)/n_s, so
    small curated sources are upsampled relative to bulk ones, with a
    global target of ~N/4 documents. Unlike x6 (configured rates),
    the rates DERIVE from the corpus in-plan. Deterministic end to
    end: sqrt is a correctly-rounded IEEE op, weights scale to
    integers (floor(sqrt*1024)), thresholds are pure BIGINT
    floor-division, and selection is the salted-hash idiom — no RNG,
    bit-identical across engines. Keep probability caps at 1
    (upsampling beyond 1x needs replication — out of scope, noted).
    Uniform driver strata make all thresholds equal; the skewed-
    strata unit test exercises the actual temperature effect.""",
    tags=("sampling", "mixture", "temperature"),
)
def x20_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TXT

    docs = load(spark, sf_dir, "documents")
    strata = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_s"))
        .withColumn("s_s", F.floor(F.sqrt(F.col("n_s")) * 1024).cast("long"))
    )
    tot = strata.agg(
        F.sum("n_s").cast("long").alias("n"), F.sum("s_s").cast("long").alias("s_sum")
    )
    thr = F.least(
        F.expr("((n div 4) * s_s * 1000000) div (s_sum * n_s)"), F.lit(1000000)
    )
    keep_hash = TXT.char_fold_hash(
        F.concat(F.lit("temp1|"), F.col("doc_id").cast("string"))
    )
    return (
        docs.join(F.broadcast(strata), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn("keep_threshold", thr)
        .filter(keep_hash % 1000000 < F.col("keep_threshold"))
        .select("doc_id", "source", "keep_threshold")
    )


def _x21_oracle() -> str:
    from ..operators.sketches import sql_md5_hash64

    h = sql_md5_hash64("doc_id", salt="x21")
    return f"""
    WITH keyed AS (
        SELECT doc_id, ({h}) AS k, ({h}) % 16 AS shard FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (
               PARTITION BY shard ORDER BY k ASC, doc_id ASC
           ) AS BIGINT) AS position
    FROM keyed
    """


@register(
    "x21_global_shuffle",
    oracle=_x21_oracle(),
    doc="""Deterministic global shuffle + sharding — the
    shuffle-before-training stage every LM data pipeline ends with
    (sequential readers must not see the corpus in crawl/source
    order). Permutation key = salted md5 of doc_id (no RNG state, so
    any rerun anywhere reproduces the identical order — the property
    that makes training runs comparable); shard = key % 16; position =
    rank within shard by key. ONE hash-partition exchange on shard +
    a per-shard sort — there is deliberately NO global sort: readers
    consume shards independently, so only within-shard order matters,
    and a global order-by would serialize into a single range-sorted
    write for nothing. At 100 TB: shard count scales to the writer
    parallelism (16 here mirrors the fixture scale), each shard sorts
    locally (spillable), and the (shard, position) pair is a total
    order if one is ever needed.""",
    tags=("llm-pipeline", "shuffle", "training"),
)
def x21_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import md5_hash64

    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        md5_hash64(F.col("doc_id"), salt="x21").alias("k"),
    ).withColumn("shard", F.col("k") % 16)
    w = Window.partitionBy("shard").orderBy(F.col("k").asc(), F.col("doc_id").asc())
    return (
        keyed.withColumn("position", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "position")
    )


def _x26_sql(md5_expr: str) -> str:
    """x26's one query text, shared across engines up to the md5-int
    idiom: disc thresholds are EXISTING n_chars values (exact at any
    magnitude — Spark's DOUBLE return is integer-valued and compares
    exactly against BIGINT n_chars), the 1-row threshold relation
    cross-joins in (the allowed BNLJ-vs-scalar-aggregate shape), and
    position is a per-(band, shard) local rank — no global sort."""
    return f"""
    WITH th AS (
        SELECT PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY n_chars) AS t1,
               PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY n_chars) AS t2,
               PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY n_chars) AS t3
        FROM x26_src
    ),
    banded AS (
        SELECT doc_id, n_chars,
               CASE WHEN n_chars <= t1 THEN 0
                    WHEN n_chars <= t2 THEN 1
                    WHEN n_chars <= t3 THEN 2
                    ELSE 3 END AS band,
               {md5_expr} AS k
        FROM x26_src, th
    )
    SELECT doc_id, band, k % 8 AS shard,
           CAST(row_number() OVER (
               PARTITION BY band, k % 8 ORDER BY k ASC, doc_id ASC
           ) AS BIGINT) AS position
    FROM banded
    """


def _x26_oracle() -> str:
    from ..operators.sketches import sql_md5_hash64

    body = _x26_sql(sql_md5_hash64("doc_id", salt="x26"))
    return (
        "WITH x26_src AS (SELECT doc_id, n_chars FROM documents)"
        + body.replace("WITH th AS", ", th AS", 1)
    )


@register(
    "x26_quality_curriculum",
    oracle=_x26_oracle(),
    doc="""CURRICULUM SHARDING — order a training corpus easy-to-hard
    without a global sort: docs band into quartiles of an exact
    integer difficulty key (n_chars here; any scored column slots in),
    then shuffle WITHIN each band into salted-md5 shards with a local
    rank (x21's deterministic-shuffle idiom), so a trainer consumes
    band 0 shards first and each (band, shard) file is independently
    readable. Thresholds are PERCENTILE_DISC values — existing data
    values, exact on both engines at any magnitude (the 1-row
    threshold relation broadcast-cross-joins in: the allowed
    BNLJ-vs-scalar-aggregate shape). At 100 TB: one pass for
    thresholds, one hash exchange on (band, shard), per-shard local
    sorts (spillable) — a global ORDER BY difficulty would serialize
    the write for nothing, the same argument as x21. Deterministic:
    any rerun reproduces the identical curriculum.""",
    tags=("llm-pipeline", "training", "curriculum", "shuffle"),
)
def x26_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    docs.select("doc_id", "n_chars").createOrReplaceTempView("x26_src")
    spark_md5 = (
        "CAST(conv(substring(md5(concat('x26:', CAST(doc_id AS STRING))),"
        " 1, 15), 16, 10) AS BIGINT)"
    )
    return spark.sql(_x26_sql(spark_md5))


def _v14_oracle(n_candidates: int = 10, k: int = 5) -> str:
    # unrolled greedy MMR: one (red, pick, sel) CTE triple per step —
    # the same loop the Spark builder unrolls lazily
    steps = []
    prev = "sel1"
    for s in range(2, k + 1):
        steps.append(f"""
    red{s} AS (
        SELECT r.query_id, r.neighbor_id,
               max({sql_dot('r.uc', 's.uc')}) AS red,
               max(r.sim_q) AS sim_q
        FROM cand r JOIN {prev} s ON s.query_id = r.query_id
        WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                          WHERE x.query_id = r.query_id
                            AND x.neighbor_id = r.neighbor_id)
        GROUP BY r.query_id, r.neighbor_id
    ),
    pick{s} AS (
        SELECT p.query_id, {s}::BIGINT AS step, p.neighbor_id, p.mmr_score, c.uc
        FROM (
            SELECT query_id, neighbor_id,
                   0.5 * sim_q - 0.5 * red AS mmr_score,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY 0.5 * sim_q - 0.5 * red DESC, neighbor_id
                   ) AS rn
            FROM red{s}
        ) p JOIN cand c ON c.query_id = p.query_id
                       AND c.neighbor_id = p.neighbor_id
        WHERE p.rn = 1
    ),
    sel{s} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{s})""")
        prev = f"sel{s}"
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({sql_dot('v', 'v')}) AS nrm FROM e),
    u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv FROM n),
    q AS (SELECT vec_id AS query_id, uv AS uq FROM u WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, c.uv AS uc,
               {sql_dot('q.uq', 'c.uv')} AS sim_q
        FROM u c JOIN q ON q.query_id != c.vec_id
    ),
    cand AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim_q DESC, neighbor_id
            ) AS rn FROM scored
        ) WHERE rn <= {n_candidates}
    ),
    sel1 AS (
        SELECT query_id, 1::BIGINT AS step, neighbor_id,
               0.5 * sim_q AS mmr_score, uc
        FROM cand WHERE rn = 1
    ),{",".join(steps)}
    SELECT query_id, step, neighbor_id, mmr_score FROM {prev}
    """


@register(
    "v14_mmr_rerank",
    oracle=_v14_oracle(),
    doc="""Maximal Marginal Relevance diversified re-ranking (Carbonell
    & Goldstein 1998) — the RAG step between the ANN shortlist and
    prompt assembly: greedily select k=5 of the top-10 candidates
    maximizing lam*sim(q,d) - (1-lam)*max_{s in S} sim(d,s), so the
    retrieved set is relevant AND mutually diverse (near-duplicate
    chunks waste context tokens). The k-step greedy loop unrolls into
    ONE lazy plan (no driver round-trips); every join is keyed by
    query_id over the bounded candidate set, so MMR state is
    O(queries x n_candidates) regardless of corpus size — the corpus
    only appears in the shortlist stage (v1 shape; at 100 TB swap in
    the v3/v7 shortlist paths unchanged). Unit-normalize-once +
    sequential-fold dots + id tiebreaks keep every score
    bit-reproducible; the oracle replays the exact greedy loop as
    unrolled CTE triples. operators/similarity.py:mmr_rerank.""",
    tags=("similarity", "rag", "rerank", "diversity"),
)
def v14_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.mmr_rerank(
        emb,
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        n_candidates=10,
        k=5,
        lam=0.5,
    )


def _t13_oracle(n_features: int = 4096, weight_scale: int = 1000) -> str:
    from ..operators.sketches import sql_md5_hash64

    h = sql_md5_hash64("i", salt="w")
    fold = SQL_CHARFOLD.format(x="tok")
    return f"""
    WITH w AS (
        SELECT i AS fid,
               ({h}) % {2 * weight_scale + 1} - {weight_scale} AS wt
        FROM (SELECT unnest(range({n_features})) AS i)
    ),
    toks AS (
        SELECT doc_id AS id, unnest({SQL_TOKENS.format(x='text')}) AS tok
        FROM documents
    ),
    f AS (
        SELECT id, ({fold}) % {n_features} AS fid
        FROM toks WHERE length(tok) >= 1
    ),
    s AS (
        SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(wt) AS BIGINT) AS score_sum
        FROM f JOIN w USING (fid) GROUP BY id
    )
    SELECT id, n_tokens, score_sum,
           CAST(score_sum AS DOUBLE) / ({weight_scale}.0 * CAST(n_tokens AS DOUBLE))
               AS logit,
           score_sum > 0 AS keep
    FROM s
    """


@register(
    "t13_quality_classifier",
    oracle=_t13_oracle(),
    doc="""fastText-style LINEAR quality classifier scoring — the
    learned quality-filter step of CCNet/LLaMA-class pipelines (t2 is
    the heuristic filter; this is the model-based one). The model is
    a BROADCAST (feature_id, weight) table over hashed unigram
    features (the fastText hashing trick, 4096 buckets): the corpus
    streams through one broadcast hash join + one per-doc aggregate,
    so swapping in really-trained weights is a table swap, not a plan
    change — the inference pattern that scales to 100 TB. The
    stand-in weights are a deterministic md5 function of the feature
    id (exact integers), making every score bit-reproducible; logit
    is one final IEEE division.
    operators/analysis.py:linear_quality_classifier.""",
    tags=("text", "quality", "classifier", "llm-pipeline"),
)
def t13_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.linear_quality_classifier(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _dq4_oracle(num_hashes: int = 32, band_rows: int = 2, threshold: float = 0.6) -> str:
    from ..operators.sketches import sql_md5_hash64

    h = sql_md5_hash64("CAST(k AS VARCHAR) || '|' || shingle")
    return f"""
    WITH {SQL_SHINGLE_SETS},
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT id_a, id_b,
               common::DOUBLE / (sa.n_sh + sb.n_sh - common)::DOUBLE AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
    ),
    truth AS (SELECT id_a, id_b FROM exact WHERE jaccard >= {threshold}),
    hashed AS (
        SELECT sh.id, g.k, ({h}) AS hv
        FROM sh, (SELECT unnest(range({num_hashes})) AS k) g
    ),
    sig AS (SELECT id, k, min(hv) AS mh FROM hashed GROUP BY id, k),
    banded AS (
        SELECT id, CAST(k // {band_rows} AS BIGINT) AS band,
               string_agg(CAST(k AS VARCHAR) || ':' || CAST(mh AS VARCHAR), '|'
                          ORDER BY CAST(k AS VARCHAR) || ':' || CAST(mh AS VARCHAR))
                   AS band_key
        FROM sig GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.band_key = y.band_key AND x.id < y.id
    ),
    hit AS (SELECT c.* FROM cand c
            WHERE EXISTS (SELECT 1 FROM truth t
                          WHERE t.id_a = c.id_a AND t.id_b = c.id_b))
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit,
           (SELECT count(*) FROM hit)::DOUBLE
               / (SELECT count(*) FROM truth)::DOUBLE AS recall,
           (SELECT count(*) FROM cand)::DOUBLE
               / (SELECT count(*) FROM truth)::DOUBLE AS cand_per_true
    """


_DQ6_K = 128
_DQ6_NUMER = float((_DQ6_K - 1) * (1 << 60))


@register(
    "dq6_source_overlap_matrix",
    oracle=f"""
    WITH toks AS (SELECT source AS id, {{tokens}} AS w FROM documents),
    sh AS (SELECT DISTINCT id, unnest({{shingles}}) AS shingle FROM toks),
    hashed AS (SELECT DISTINCT id AS source,
                      {{h}} AS h
               FROM sh),
    sk AS (SELECT source, h FROM (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
        FROM hashed) WHERE r <= {_DQ6_K}),
    srcs AS (SELECT DISTINCT source FROM hashed),
    pairs AS (SELECT a.source AS sa, b.source AS sb
              FROM srcs a JOIN srcs b ON a.source < b.source),
    uh AS (SELECT DISTINCT p.sa, p.sb, s.h
           FROM pairs p JOIN sk s ON s.source = p.sa OR s.source = p.sb),
    usk AS (SELECT sa, sb, h FROM (
        SELECT sa, sb, h,
               ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS r
        FROM uh) WHERE r <= {_DQ6_K}),
    stats AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_k,
                     CAST(max(h) AS BIGINT) AS kth
              FROM usk GROUP BY 1, 2),
    nboth AS (SELECT u.sa, u.sb, CAST(count(*) AS BIGINT) AS n_both
              FROM usk u
              WHERE EXISTS (SELECT 1 FROM sk WHERE source = u.sa AND h = u.h)
                AND EXISTS (SELECT 1 FROM sk WHERE source = u.sb AND h = u.h)
              GROUP BY 1, 2)
    SELECT st.sa AS source_a, st.sb AS source_b, st.n_k,
           COALESCE(nb.n_both, 0) AS n_both,
           CASE WHEN st.n_k < {_DQ6_K} THEN CAST(st.n_k AS DOUBLE)
                ELSE {_DQ6_NUMER!r} / CAST(st.kth AS DOUBLE) END AS union_est,
           CAST(COALESCE(nb.n_both, 0) AS DOUBLE) / CAST(st.n_k AS DOUBLE)
               AS jaccard_est,
           (CAST(COALESCE(nb.n_both, 0) AS DOUBLE) / CAST(st.n_k AS DOUBLE))
             * (CASE WHEN st.n_k < {_DQ6_K} THEN CAST(st.n_k AS DOUBLE)
                     ELSE {_DQ6_NUMER!r} / CAST(st.kth AS DOUBLE) END)
               AS intersection_est
    FROM stats st LEFT JOIN nboth nb ON nb.sa = st.sa AND nb.sb = st.sb
    """,
    doc="""Cross-SOURCE shingle-overlap matrix via KMV sketches (dq6)
    — the corpus-level contamination/duplication audit a training-data
    pipeline runs before mixing sources: for every source pair, an
    unbiased Jaccard / intersection / union estimate of their 3-gram
    shingle sets (Beyer et al. 2007 — k8's estimator, generalized
    from one pair to the full S x S matrix). ONE pass builds distinct
    (source, shingle-hash) pairs, ONE source-keyed window takes each
    source's k=128 smallest hashes, and the S*k-row sketch relation —
    bounded by parameters, not data, the t-digest/k10 materialization
    class — is collected and compared pairwise driver-side (exact
    integer order statistics, two final double divisions per pair,
    replicating the SQL twin token-for-token). At 100 TB the raw
    shingle scan is the only data-sized stage; the matrix math never
    touches an executor again. The DuckDB oracle computes the
    identical sketches and estimates in SQL (pair UNION sketches via
    per-pair ROW_NUMBER, membership probes via EXISTS).""",
    tags=("data-quality", "llm-pipeline", "sketch", "dedup"),
)
def dq6_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import md5_hash64

    docs = load(spark, sf_dir, "documents")
    sh = D._shingle_sets(docs, "source", "text", 3)
    hashed = sh.select(
        F.col("id").alias("source"), md5_hash64(F.col("shingle")).alias("h")
    ).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hashed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _DQ6_K)
        .select("source", "h")
    )
    per: dict[str, list[int]] = {}
    for row in sorted((r["source"], r["h"]) for r in sk.collect()):
        per.setdefault(row[0], []).append(row[1])
    out = []
    srcs = sorted(per)
    for i, sa in enumerate(srcs):
        a = set(per[sa])
        for sb in srcs[i + 1 :]:
            b = set(per[sb])
            union = sorted(a | b)[: _DQ6_K]
            n_k = len(union)
            n_both = sum(1 for h in union if h in a and h in b)
            union_est = (
                float(n_k) if n_k < _DQ6_K else _DQ6_NUMER / float(union[-1])
            )
            jacc = n_both / n_k
            out.append((sa, sb, n_k, n_both, union_est, jacc, jacc * union_est))
    return spark.createDataFrame(
        out,
        "source_a string, source_b string, n_k long, n_both long,"
        " union_est double, jaccard_est double, intersection_est double",
    )


def _attach_dq6_oracle() -> None:
    from ..operators.sketches import sql_md5_hash64

    REGISTRY["dq6_source_overlap_matrix"].oracle = REGISTRY[
        "dq6_source_overlap_matrix"
    ].oracle.format(
        tokens=SQL_TOKENS.format(x="text"),
        shingles=SQL_SHINGLES3.format(w="w"),
        h=sql_md5_hash64("shingle"),
    )


_attach_dq6_oracle()


@register(
    "dq4_minhash_recall_eval",
    oracle=_dq4_oracle(),
    doc="""MinHash-banding index-quality evaluation — the dedup twin
    of v13's ANN recall eval: ONE plan measures the banding scheme's
    candidate RECALL at the production threshold (pairs the bands
    miss can never be verified back — the (1-J^r)^b miss probability
    as a measured number, not a claim) and its candidate EFFICIENCY
    (candidate pairs per true pair = the verifier's workload factor).
    Signatures are md5-derived (portable) rather than d3's xxhash64
    (engine-local) precisely so the oracle replays the banding ITSELF
    — an index evaluation is only trustworthy if the index under test
    is reproducible. The exhaustive ground truth is the deliberately
    quadratic verify primitive; at 100 TB the eval runs on a sample,
    exactly as v13 prescribes for ANN.
    operators/dedup.py:minhash_recall_eval.""",
    tags=("dedup", "evaluation", "lsh", "quality"),
)
def dq4_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_recall_eval(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3,
        num_hashes=32, band_rows=2, threshold=0.6,
    )


@register(
    "x23_length_bucketing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len({SQL_TOKENS.format(x='text')}) AS n_tokens
        FROM documents
    ),
    b AS (
        SELECT doc_id, n_tokens,
               greatest(16, power(2, ceil(log2(greatest(n_tokens, 1))))::BIGINT)
                   AS bucket
        FROM toks
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(bucket * count(*) AS BIGINT) AS capacity,
           1.0 - CAST(sum(n_tokens) AS DOUBLE)
               / CAST(bucket * count(*) AS DOUBLE) AS padding_frac
    FROM b GROUP BY bucket
    """,
    doc="""Sequence-length bucketing analysis — the batching-efficiency
    planner for training/inference: assign each document to the next
    power-of-two length bucket (floor 16) and report per-bucket doc
    count, real token mass, padded capacity, and padding fraction —
    the number that decides between naive batching (pad everything to
    max, waste = this table's worst row) and x7's token-budget packing
    (waste ~0 at the cost of a packing pass). Integer arithmetic to
    one final division; power-of-two bucket edges are exact in both
    engines (log2/ceil/power on small ints are correctly-rounded).
    One aggregate pass, bucket cardinality ~log(max_len) — trivially
    100 TB-safe.""",
    tags=("llm-pipeline", "batching", "analysis"),
)
def x23_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TXT

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.size(TXT.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    b = toks.withColumn(
        "bucket",
        F.greatest(
            F.lit(16).cast("long"),
            F.pow(
                F.lit(2.0),
                F.ceil(F.log2(F.greatest(F.col("n_tokens"), F.lit(1)))),
            ).cast("long"),
        ),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        (F.col("bucket") * F.count(F.lit(1))).cast("long").alias("capacity"),
        (
            F.lit(1.0)
            - F.sum("n_tokens").cast("double")
            / (F.col("bucket") * F.count(F.lit(1))).cast("double")
        ).alias("padding_frac"),
    )


def _v15_oracle(k: int = 5, n_cells: int = 16, nprobe: int = 4, iterations: int = 1) -> str:
    # trained coarse quantizer (unrolled Lloyd) feeding the IVF
    # probe/score dataflow — the composition the v3 docstring promises
    ctes, final_cent = _kmeans_ctes(n_cells=n_cells, dims=64, iterations=iterations)
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    assign AS (
        SELECT id, v, nrm, cell FROM (
            SELECT n.id, n.v, n.nrm, c.cid AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.id
                       ORDER BY {sql_dot('n.v', 'c.cv')} / (n.nrm * c.cn) DESC,
                                c.cid ASC) AS rn
            FROM n CROSS JOIN {final_cent} c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT id, v, nrm, cell FROM (
            SELECT q.id, q.v, q.nrm, c.cid AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.id
                       ORDER BY {sql_dot('q.v', 'c.cv')} / (q.nrm * c.cn) DESC,
                                c.cid ASC) AS rn
            FROM (SELECT * FROM n WHERE id < 10) q CROSS JOIN {final_cent} c
        ) WHERE rn <= {nprobe}
    ),
    scored AS (
        SELECT p.id AS query_id, c.id AS neighbor_id,
               {sql_dot('p.v', 'c.v')} / (p.nrm * c.nrm) AS cos_sim
        FROM assign c JOIN probes p ON p.cell = c.cell AND p.id != c.id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, rn AS "rank", neighbor_id, cos_sim FROM ranked WHERE rn <= {k}
    """


@register(
    "v15_ann_ivf_trained",
    oracle=_v15_oracle(),
    doc="""IVF with a TRAINED coarse quantizer — the composition v3's
    docstring promises made real: lloyd_centroids (one Lloyd round,
    k=16, exact sequential-fold means — the v6/v9 parity path) trains
    the centroids, and the ivf_topk probe/score dataflow consumes them
    unchanged (train -> index -> query as ONE lazy plan, no driver
    round-trip between stages). Trained cells follow the data
    distribution, so cell populations balance where v3's smallest-id
    seeds can skew — at 100 TB that balance IS the query cost model
    (each query scores ~nprobe/n_cells of the corpus only if cells are
    even). The oracle unrolls training AND querying.
    operators/similarity.py:lloyd_centroids + ivf_topk(centroids=).""",
    tags=("similarity", "ivf", "kmeans"),
)
def v15_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    cent = S.lloyd_centroids(
        emb, "vec_id", "embedding", n_cells=16, iterations=1, exact_means=True
    )
    return S.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        k=5,
        n_cells=16,
        nprobe=4,
        centroids=cent,
    )


@register(
    "x28_jaro_winkler_join",
    oracle="""
    WITH names AS (SELECT DISTINCT lower(p_name) AS nm FROM part),
    grams AS (
        SELECT DISTINCT nm,
               unnest(list_transform(
                   generate_series(1, greatest(length(nm) - 2, 1)),
                   i -> substring(nm, i, 3))) AS g
        FROM names
    ),
    cand AS (
        SELECT DISTINCT a.nm AS n1, b.nm AS n2
        FROM grams a JOIN grams b ON a.g = b.g AND a.nm < b.nm
        WHERE abs(length(a.nm) - length(b.nm)) <= 4
    ),
    pre AS (
        SELECT n1, n2 FROM cand
        WHERE levenshtein(n1, n2)
              <= floor(0.5 * greatest(length(n1), length(n2)))
    )
    SELECT n1, n2, ROUND(jaro_winkler_similarity(n1, n2), 6) AS jw
    FROM pre WHERE ROUND(jaro_winkler_similarity(n1, n2), 6) >= 0.9
    """,
    doc="""JAROWINKLER_SIMILARITY as a scale operator (r12 — the
    dialect refusal closed with the real thing): distinct part-name
    pairs scoring >= 0.9 under standard Jaro-Winkler (window
    max(l)/2-1, half-transpositions, 0.1-per-char prefix boost up to
    4 applied above jaro 0.7 — pinned value-for-value against
    DuckDB's native jaro_winkler_similarity in the unit battery, 14
    exact cases). Candidates come from the same 3-gram blocking as
    x18 (the equi-self-join on grams IS the operator at 100 TB; the
    all-pairs form is quadratic), HARDENED for the Python-DP cost
    class: a JVM levenshtein prefilter (dist <= half the longer
    length, implied by JW >= 0.9 — recall-free) disqualifies random
    pairs in codegen before the Arrow-batched pandas UDF prices the
    plausible ones (measured on a 20k hot-gram corpus: 474 s -> 92 s
    at full planted recall), and an OPT-IN ``max_gram_freq`` cap
    (d7's stop-shingle defense, 92 s -> 12 s there) trades recall for
    cost where the candidate set is quadratic-hot — opt-in precisely
    because that trade must be chosen (36% planted-recall loss on
    that all-hot corpus). The documented slow-path Python class,
    bounded by the blocker, never per corpus row.
    Scores round to 6 dp so both engines' IEEE orderings agree in the
    comparison domain (operators/analysis.py:jaro_winkler_pairs).""",
    tags=("fuzzy", "entity-resolution", "join", "udf"),
)
def x28_jaro_winkler_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.jaro_winkler_pairs(
        load(spark, sf_dir, "part"), "p_name", q=3, len_tol=4,
        threshold=0.9,
    )
