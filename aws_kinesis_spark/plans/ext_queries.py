"""[EXT] LLM-data-pipeline queries (SURVEY.md §2.G) over the documents and
embeddings fixtures. The DuckDB oracles verify end RESULTS (e.g. exact
all-pairs Jaccard), while the Spark side runs the scalable algorithm
(MinHash+LSH, inverted index, bucketed ANN) — result parity is the proof
that the approximation achieves full recall at the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_kinesis_spark.functions import text as TX
from aws_kinesis_spark.operators.dedup import (
    containment_join,
    neardup_clusters,
    setsim_prefix_join,
    embedding_neardup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
    span_dup_stats,
)
from aws_kinesis_spark.operators.multimodal import (
    extract_features,
    resize_media,
    sample_frames,
    to_media_envelope,
)
from aws_kinesis_spark.operators.ivf_index import (
    build_ivf_index,
    knn_ivf_indexed,
    update_ivf_index,
)
from aws_kinesis_spark.operators.similarity import (
    hard_negative_mining,
    semdedup,
    knn_bruteforce,
    knn_ivf,
    knn_join,
    knn_lsh,
    max_sim_vs_reference,
)
from aws_kinesis_spark.registry import register
from aws_kinesis_spark.tables import load

# DuckDB shingle + jaccard fragments shared by the dedup oracles
_DUCK_SHINGLES = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
             WHERE len(string_split(text, ' ')) >= 3),
    sh AS (SELECT doc_id,
                  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                 for i in range(1, len(w) - 1)]) AS s
           FROM toks)
"""

def _duck_cos(lhs: str, rhs: str) -> str:
    """Sequential double-precision cosine between two aliased embedding
    columns (Spark's zip_with/aggregate and DuckDB's list comprehension
    produce bit-identical doubles). ONE definition parameterized over the
    aliases — a second verbatim copy used to live near g38 and would have
    drifted from any precision/NULL fix applied here (round-12 review)."""
    return f"""
    list_sum([CAST({lhs}.embedding[i] AS DOUBLE) * CAST({rhs}.embedding[i] AS DOUBLE)
              for i in range(1, len({lhs}.embedding) + 1)])
    / nullif(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in {lhs}.embedding]))
             * sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in {rhs}.embedding])), 0)
"""


_DUCK_COSINE = _duck_cos("a", "b")


@register(
    "g01_dedup_exact",
    oracle="""
        SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM documents WHERE text IS NOT NULL GROUP BY sha256(text)
    """,
)
def g01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: exact dedup by content hash — hash groupBy, smallest id kept."""
    return exact_dedup(load(spark, sf_dir, "documents"))


@register(
    "g02_dedup_minhash_lsh",
    oracle=f"""
        WITH {_DUCK_SHINGLES}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    """,
)
def g02_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: shingle -> minhash -> band -> bucket-join -> exact-verify. The
    oracle is the exact all-pairs answer: parity demonstrates the LSH
    banding (r=4, b=16) reaches full recall at jaccard>=0.7."""
    return minhash_lsh_dedup(load(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "g02b_dedup_ngram_jaccard",
    oracle=f"""
        WITH {_DUCK_SHINGLES}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    """,
)
def g02b_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 exact variant: inverted shingle index for candidates, exact
    Jaccard verify — guaranteed identical to all-pairs."""
    return ngram_jaccard_dedup(load(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "g02c_dedup_simhash",
    oracle=f"""
        WITH {_DUCK_SHINGLES},
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
        )
        SELECT count(*) AS n_truth_pairs, TRUE AS recall_ok FROM pairs
    """,
)
def g02c_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 SimHash variant: 64-bit signatures, hamming<=6 via pigeonhole
    chunk join.

    Driver-checkable oracle form: DuckDB cannot reproduce xxhash64-based
    signatures, so the check is hamming-threshold candidates vs the EXACT
    Jaccard ground truth (the VERDICT-prescribed twin): ``n_truth_pairs``
    (all jaccard>=0.7 pairs — hash-anchored against the SQL twin) plus
    ``recall_ok`` = simhash found >=70% of them. Both the exact truth and
    the simhash candidates are deterministic, so the booleans are stable;
    0.8 recall measured on the fixture. The per-pair recall property test
    stays in tests/test_ext.py."""
    docs = load(spark, sf_dir, "documents")
    sim = simhash_dedup(docs, max_hamming=6)
    truth = ngram_jaccard_dedup(docs, threshold=0.7)
    n_truth = truth.agg(F.count("*").alias("n_truth_pairs"))
    n_hits = (
        truth.join(sim, ["id_a", "id_b"], "left_semi")
        .agg(F.count("*").alias("__n_hits"))
    )
    return n_truth.crossJoin(n_hits).select(
        "n_truth_pairs",
        (F.col("__n_hits") >= F.ceil(0.7 * F.col("n_truth_pairs"))).alias("recall_ok"),
    )


@register(
    "g03_knn_bruteforce",
    oracle=f"""
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_DUCK_COSINE}, 4) + 0.0 AS cos_sim
        FROM (SELECT * FROM embeddings WHERE vec_id < 5) a
        JOIN embeddings b ON b.vec_id <> a.vec_id
        QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_DUCK_COSINE} DESC, b.vec_id) <= 10
    """,
)
def g03_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: exact cosine top-10 for 5 query vectors — broadcast queries, one
    corpus pass, deterministic (cos desc, id) ranking."""
    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_bruteforce(em, queries, k=10)


def _ann_recall_check(ann: DataFrame, exact: DataFrame, min_recall: float) -> DataFrame:
    """One-row self-check shared by the ANN oracle forms: hash-anchor the
    exact top-k pair count and assert aggregate recall@k in-plan. The ANN
    result itself is not SQL-expressible (bucket hashes / trained
    centroids), but its recall against the in-Spark brute-force twin is a
    deterministic boolean DuckDB can co-sign.

    ONE pass over the twin (r15): the old two-aggregate shape (count of
    exact, then ann semi-join exact, then a crossJoin) referenced `exact`
    twice, so callers that pass the lazy brute-force frame computed the
    whole blocked-matmul twin TWICE (g62's plan showed the embeddings
    scan 14x / 2 extra Python stages). A left join from exact marks the
    hit pairs and one aggregate counts both — |ann ∩ exact| is unchanged
    because a top-k frame has unique (query_id, neighbor_id) keys."""
    hits = ann.select("query_id", "neighbor_id").withColumn("__hit", F.lit(True))
    return (
        exact.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .agg(
            F.count("*").alias("n_exact"),
            F.count("__hit").alias("__n_hits"),
        )
        .select(
            "n_exact",
            (F.col("__n_hits") >= min_recall * F.col("n_exact")).alias("recall_ok"),
        )
    )


@register(
    "g03b_knn_lsh_ann",
    oracle="""
        SELECT 10 * count(*) AS n_exact, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 5
    """,
)
def g03b_knn_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 scale path: sign-bucket LSH ANN with hamming<=1 multi-probe.

    Driver-checkable oracle form (VERDICT-prescribed): recall@10 vs the
    g03 brute-force twin as a one-row (n_exact, recall_ok) check —
    aggregate recall >= 0.5 asserted in-plan (0.68 measured on the
    fixture; sign buckets are a pure function of the vectors, so the
    number is stable). Pair-level recall stays in tests/test_ext.py."""
    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _ann_recall_check(
        knn_lsh(em, queries, k=10), knn_bruteforce(em, queries, k=10), min_recall=0.5
    )


@register(
    "g03c_knn_ivf_ann",
    oracle="""
        SELECT 10 * count(*) AS n_exact, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 5
    """,
)
def g03c_knn_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 scale path #2: IVF index — spherical-kmeans cells trained on a
    sorted, seeded sample (reproducible across partition layouts), corpus
    assigned in one Arrow matmul pass, queries probe their 8 nearest of 32
    cells.

    Driver-checkable oracle form: same (n_exact, recall_ok) shape as g03b,
    aggregate recall@10 >= 0.5 vs brute force asserted in-plan (0.6
    measured on the fixture with nprobe=8)."""
    from concurrent.futures import ThreadPoolExecutor

    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # The brute-force twin shares nothing with the IVF build/probe, but
    # knn_ivf materializes eagerly (temp-store lifecycle), so left inline
    # the twin only started computing at action time — AFTER the build's
    # serial store jobs finished. Materialize it on a pool thread instead
    # (guide §2.6, the a19 overlapped-commits pattern): its stages fill
    # the build/probe jobs' scheduling tail. Values unchanged — the twin
    # was always fully computed, just later.
    with ThreadPoolExecutor(max_workers=1) as pool:
        exact_f = pool.submit(
            lambda: knn_bruteforce(em, queries, k=10).localCheckpoint(eager=True)
        )
        ann = knn_ivf(em, queries, k=10, nlist=32, nprobe=8)
        exact = exact_f.result()
    return _ann_recall_check(ann, exact, min_recall=0.5)


@register(
    "g03e_knn_join",
    oracle=f"""
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_DUCK_COSINE}, 4) + 0.0 AS cos_sim
        FROM embeddings a
        JOIN embeddings b ON b.vec_id <> a.vec_id
        QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_DUCK_COSINE} DESC, b.vec_id) <= 10
    """,
)
def g03e_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 full form: exact top-10 neighbors for EVERY vector via the blocked
    matmul kNN self-join (operators/similarity.py:knn_join) — two-level
    top-k, O(n*B*k) shuffle, no cross join. The oracle is the all-pairs
    window ranking."""
    return knn_join(load(spark, sf_dir, "embeddings"), k=10)


@register(
    "g05_embedding_neardup",
    oracle=f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_DUCK_COSINE}, 4) + 0.0 AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_DUCK_COSINE} >= 0.4
    """,
)
def g05_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/G3: embedding-cosine near-dup pairs (exact reference impl)."""
    return embedding_neardup(load(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "g04_text_stats",
    oracle="""
        WITH t AS (
            SELECT doc_id, text, string_split(text, ' ') AS w,
                   len(list_filter(string_split(text, ' '),
                       x -> x IN ('the','a','of','and','to','in','is','it'))) AS en_hits,
                   len(list_filter(string_split(text, ' '),
                       x -> x IN ('el','la','de','y','en','que','los','un'))) AS es_hits,
                   len(list_filter(string_split(text, ' '),
                       x -> x IN ('le','la','de','et','un','les','des','en'))) AS fr_hits,
                   len(list_filter(string_split(text, ' '),
                       x -> x IN ('der','die','das','und','ein','zu','den','von'))) AS de_hits,
                   len(list_filter(string_split(text, ' '),
                       x -> x IN ('的','了','是','在','我','有','和','就'))) AS zh_hits
            FROM documents
        )
        SELECT doc_id,
               len(w) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
               CASE
                 WHEN zh_hits > 0 AND zh_hits >= fr_hits AND zh_hits >= es_hits
                      AND zh_hits >= en_hits AND zh_hits >= de_hits THEN 'zh'
                 WHEN fr_hits > 0 AND fr_hits >= es_hits AND fr_hits >= en_hits
                      AND fr_hits >= de_hits THEN 'fr'
                 WHEN es_hits > 0 AND es_hits >= en_hits AND es_hits >= de_hits THEN 'es'
                 WHEN en_hits > 0 AND en_hits >= de_hits THEN 'en'
                 WHEN de_hits > 0 THEN 'de'
                 ELSE 'und'
               END AS pred_lang,
               round(0.3 * least(1.0, len(w) / 100.0)
                     + 0.3 * (len(list_distinct(w))::DOUBLE / len(w))
                     + 0.2 * least(1.0, (en_hits::DOUBLE / len(w)) * 5.0)
                     -- empty-text guard mirrors the Spark twin's: its
                     -- punct_ratio scores '' as 0.0 while a bare division
                     -- here yields NULL (round-12 review)
                     + 0.2 * (1.0 - CASE WHEN length(text) > 0
                                    THEN length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                                         / length(text)
                                    ELSE 0.0 END), 4) AS quality
        FROM t
    """,
)
def g04_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: token counting (whitespace + BPE-ish regex), stopword language
    ID, composite quality score — all JVM-side expressions."""
    d = load(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    # Token-array filter(isin) form, NOT the regexp_count rewrite: measured at
    # sf0.1 the five lookaround-alternation regex passes over full text cost
    # 3.5 s vs ~0.9 s for split-once-then-filter (round-3 regression bdf09a4,
    # reverted here after re-benchmarking both forms).
    hits = {lang: TX.stopword_hits("text", lang, toks) for lang in sorted(TX.STOPWORDS)}
    # Tie-break priority mirrors the oracle CASE: zh > fr > es > en > de.
    pred = (
        F.when(
            (hits["zh"] > 0)
            & (hits["zh"] >= hits["fr"]) & (hits["zh"] >= hits["es"])
            & (hits["zh"] >= hits["en"]) & (hits["zh"] >= hits["de"]),
            "zh",
        )
        .when(
            (hits["fr"] > 0)
            & (hits["fr"] >= hits["es"]) & (hits["fr"] >= hits["en"])
            & (hits["fr"] >= hits["de"]),
            "fr",
        )
        .when(
            (hits["es"] > 0) & (hits["es"] >= hits["en"]) & (hits["es"] >= hits["de"]),
            "es",
        )
        .when((hits["en"] > 0) & (hits["en"] >= hits["de"]), "en")
        .when(hits["de"] > 0, "de")
        .otherwise("und")
    )
    n = F.size(toks).cast("double")
    quality = F.round(
        F.lit(0.3) * F.least(F.lit(1.0), n / 100.0)
        + F.lit(0.3) * (F.size(F.array_distinct(toks)).cast("double") / n)
        + F.lit(0.2) * F.least(F.lit(1.0), (hits["en"].cast("double") / n) * 5.0)
        + F.lit(0.2) * (F.lit(1.0) - TX.punct_ratio("text")),
        4,
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
        pred.alias("pred_lang"),
        quality.alias("quality"),
    )


@register(
    "g04b_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS fingerprint
        FROM documents
    """,
)
def g04b_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: order-insensitive document fingerprint (sorted distinct tokens)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fingerprint"))


@register(
    "g06_quality_filter",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE n_chars BETWEEN 100 AND 2000
          AND lang IN ('en', 'es', 'de')
          AND len(string_split(text, ' ')) >= 20
          AND len(list_distinct(string_split(text, ' ')))::DOUBLE
              / len(string_split(text, ' ')) >= 0.2
    """,
)
def g06_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: the pre-training quality-filter predicate stack — plain filters,
    fully pushdown-friendly."""
    d = load(spark, sf_dir, "documents")
    return d.filter(
        F.col("n_chars").between(100, 2000)
        & F.col("lang").isin("en", "es", "de")
        & (TX.token_count("text") >= 20)
        & (TX.distinct_ratio("text") >= 0.2)
    ).select("doc_id", "lang", "n_chars")


@register(
    "g07_multimodal_meta",
    oracle="""
        SELECT doc_id,
               'text/plain' AS mime,
               -- encode(), not ::BLOB: the string->blob CAST throws on any
               -- non-ASCII character; encode() is DuckDB's UTF-8 encoder
               octet_length(encode(text)) AS n_bytes,
               source,
               -- BYTE slice, not char slice: the operator slices the UTF-8
               -- payload, and a multibyte char desyncs the two (round-12
               -- review; 2 hex chars per byte, so 4 bytes = 8 hex chars)
               upper(substr(hex(encode(text)), 1, 8)) AS head_hex
        FROM documents
    """,
)
def g07_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: multimodal envelope — opaque binary payload + typed metadata
    struct (the README.md:224 Data-column pattern applied to media)."""
    env = to_media_envelope(load(spark, sf_dir, "documents"))
    return env.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
        F.upper(F.hex(F.substring("payload", 1, 4))).alias("head_hex"),
    )


@register(
    "g07b_multimodal_features",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text))::BIGINT AS n_bytes,
               -- BYTE values, not codepoints: the operator reads raw UTF-8
               -- bytes of the payload; ord()/length() were char semantics
               -- that only matched on an all-ASCII fixture (round-12
               -- review). Byte i = 2 hex chars at (i-1)*2+1. NULL text
               -- yields NULL features like the NULL-safe operator kernel
               -- (the CASE's ELSE 0 would otherwise zero-fill it).
               CASE WHEN text IS NULL THEN NULL ELSE
               array_to_string(
                   [CASE WHEN i <= octet_length(encode(text))
                         THEN ('0x' || substr(hex(encode(text)), (i-1)*2+1, 2))::INT
                         ELSE 0 END FOR i IN range(1, 9)], ',')
               END AS features_csv
        FROM documents
    """,
)
def g07b_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: Arrow-batched feature extraction over binary payloads via
    mapInPandas (deterministic fake — leading byte values — standing in
    for the stubbed media decoder; schema/batching identical to a real
    model UDF). The fake body is byte arithmetic the oracle replicates
    (g07c's convention), proving the Arrow round-trip is byte-exact; the
    feature vector surfaces as CSV at the comparison boundary."""
    env = to_media_envelope(load(spark, sf_dir, "documents"))
    out = extract_features(env)
    return out.select(
        "doc_id", "n_bytes", F.array_join("features", ",").alias("features_csv")
    )


@register(
    "g07c_multimodal_resize",
    oracle="""
        SELECT doc_id, 16 AS width, 16 AS height,
               -- first 32 BYTES of the payload (64 hex chars), not 32 chars
               upper(substr(hex(encode(text)), 1, 64)) AS thumb_hex
        FROM documents
    """,
)
def g07c_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: resize/thumbnail plumbing (mapInPandas 1->1 over binary payloads).
    The fake body is byte slicing, which the oracle replicates — proving the
    Arrow round-trip is byte-exact; a real decoder swaps in with no schema
    change. Binary surfaces as hex at the comparison boundary."""
    env = to_media_envelope(load(spark, sf_dir, "documents"))
    out = resize_media(env, width=16, height=16)
    return out.select(
        "doc_id", "width", "height", F.upper(F.hex("thumb")).alias("thumb_hex")
    )


@register(
    "g07d_multimodal_frame_sample",
    oracle="""
        SELECT doc_id, k AS frame_idx,
               -- frame k = payload BYTES k*64+1 .. k*64+16 (hex offsets x2),
               -- gated on the BYTE length — the char-based gate could even
               -- emit a different frame COUNT per doc (round-12 review)
               upper(substr(hex(encode(text)), k * 128 + 1, 32)) AS frame_hex
        FROM documents
        CROSS JOIN (SELECT unnest(range(4)) AS k)
        WHERE k * 64 < octet_length(encode(text))
    """,
)
def g07d_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: frame sampling plumbing (mapInPandas 1->N, the UDTF fan-out
    shape): every 4th 16-byte "frame", up to 4 per document."""
    env = to_media_envelope(load(spark, sf_dir, "documents"))
    out = sample_frames(env, stride=4, max_frames=4)
    return out.select("doc_id", "frame_idx", F.upper(F.hex("frame")).alias("frame_hex"))


@register(
    "g04d_tfidf_top_terms",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4)
                       AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) <= 5
    """,
)
def g04d_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: TF-IDF with smoothed idf (ln((N+1)/(df+1))+1, the scikit-style
    smoothing), top-5 terms per document. Pure relational formulation —
    explode -> two aggregations -> df-table join (strategy chosen by AQE)
    -> window top-k — rather than MLlib HashingTF, so it composes with the
    rest of the SQL surface and the df table stays reusable at scale."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    # n_docs folds IN-PLAN as a broadcast one-row aggregate (the g26/g30
    # scalar-stats convention) — an eager d.count() here ran a full extra
    # documents scan at plan-construction time, even for callers that only
    # wanted the plan (round-12 review)
    n = d.agg(F.count("*").alias("__n_docs"))
    # join strategy for the df table is LEFT TO AQE (same posture as g26's
    # unigram frequency join): at sf scale it picks broadcast from runtime
    # stats; a web-scale vocabulary (1e8+ terms) exceeds any driver and AQE
    # falls back to a shuffled hash join — forcing F.broadcast here would
    # OOM the driver on exactly that input (VERDICT r5 #2).
    scored = tf.join(df, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        F.round(
            F.col("tf")
            * (F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
            4,
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "g04c_rolling_fingerprint",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(0::BIGINT,
                       list_transform(string_split(text, ' '),
                           t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))),
                   (a, b) -> (a * 131 + b) % 2147483647) AS fingerprint
        FROM documents
    """,
)
def g04c_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: order-SENSITIVE rolling-hash document fingerprint (polynomial
    fold over token hashes mod 2^31-1), complementing g04b's
    order-insensitive set fingerprint. All-JVM expression fold; modulus
    keeps every step overflow-free under ANSI arithmetic."""
    d = load(spark, sf_dir, "documents")
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    fp = F.aggregate(
        F.transform(F.split(F.col("text"), " "), tok_hash),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 131 + h) % 2147483647,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "g08_label_centroids",
    oracle="""
        WITH flat AS (
            SELECT label, generate_subscripts(embedding, 1) AS pos,
                   unnest(embedding)::DOUBLE AS v
            FROM embeddings)
        SELECT label, pos, round(avg(v), 4) + 0.0 AS centroid
        FROM flat GROUP BY label, pos
    """,
)
def g08_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 support: per-label mean embedding (the IVF/кmeans building block)
    as (label, pos, value) rows — posexplode keeps the whole computation a
    single partial+final hash aggregate on (label, pos); no vector is ever
    assembled on the driver, so the same plan holds at any corpus size."""
    em = load(spark, sf_dir, "embeddings")
    flat = em.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("v"))
    # + 0.0 canonicalizes IEEE signed zero: a tiny negative mean rounds to
    # -0.0 on one engine and 0.0 on the other — numerically equal, but a
    # stringified value-hash comparison sees two different rows
    return flat.groupBy("label", "pos").agg(
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("centroid")
    )


@register(
    "g03d_knn_classify",
    oracle=f"""
        WITH nn AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label
            FROM (SELECT * FROM embeddings WHERE vec_id < 5) a
            JOIN embeddings b ON b.vec_id <> a.vec_id
            QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                       ORDER BY {_DUCK_COSINE} DESC, b.vec_id) <= 10
        ),
        votes AS (
            SELECT query_id, label, count(*) AS n_votes
            FROM nn GROUP BY 1, 2
        )
        SELECT query_id, label AS pred_label, n_votes
        FROM votes
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) = 1
    """,
)
def g03d_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 composition: kNN majority-vote classification — exact top-10
    neighbors (broadcast queries, one corpus pass), labels joined on, then a
    deterministic argmax (votes desc, label asc). The vote aggregation and
    argmax are tiny relative to the kNN pass, so the scale profile is
    exactly knn_bruteforce's."""
    from pyspark.sql import Window

    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nn = knn_bruteforce(em, queries, k=10)
    labeled = nn.join(
        em.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    )
    votes = labeled.groupBy("query_id", "label").agg(F.count("*").alias("n_votes"))
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )


@register(
    "g09_train_split",
    oracle="""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def g09_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by content-free key
    hash — the split a training pipeline must reproduce identically on every
    run and every engine. Bucket = first md5 hex byte of the id; comparing
    two lowercase hex chars lexicographically IS the numeric bucket compare,
    so Spark and the SQL oracle agree bit-for-bit with no seed plumbing.

    Scale: a pure projection (no shuffle, no sampling state); the split
    survives re-partitioning, backfills, and incremental appends because it
    depends only on the row's own key."""
    d = load(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test").alias("split"),
    )


@register(
    "g10_dedup_clusters",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES},
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
        ),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        )
        SELECT u AS doc_id, least(u, min(v)) AS cluster_id
        FROM reach GROUP BY u
    """,
)
def g10_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 completion: connected components over the near-dup pair graph —
    each document in any pair mapped to its component's min id (the
    canonical keeper). Spark side is iterative min-label propagation
    (operators/dedup.py:neardup_clusters); the oracle is the recursive-CTE
    transitive closure, proving the distributed loop computes the exact
    graph answer."""
    return neardup_clusters(load(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "g11_sequence_packing",
    oracle="""
        SELECT doc_id,
               doc_id % 8 AS shard,
               CAST(FLOOR((sum(len(string_split(text, ' ')))
                               OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING)
                           - len(string_split(text, ' '))) / 512.0) AS BIGINT)
                   AS bin_id,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    """,
)
def g11_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining (concat docs in id order per shard,
    chunk into 512-token budgets; each doc's bin = the chunk holding its
    first token). One shuffle on the shard key, one in-shard sort — the
    oracle is the identical running-sum window in SQL."""
    from aws_kinesis_spark.operators.training import pack_sequences

    return pack_sequences(load(spark, sf_dir, "documents"), budget=512, n_shards=8)


@register(
    "g12_stratified_sample",
    oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE lang NOT IN ('en', 'zh')
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < (CASE lang WHEN 'en' THEN '40' ELSE '80' END)
    """,
)
def g12_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsample (training-mixture rebalancing):
    cap 'en' at 25% and 'zh' at 50% by key-hash threshold, keep the tail in
    full. Seedless and engine-reproducible — the oracle is the same
    predicate in SQL."""
    from aws_kinesis_spark.operators.training import stratified_sample

    d = load(spark, sf_dir, "documents")
    return stratified_sample(d, "lang", {"en": 0.25, "zh": 0.5}, "doc_id").select(
        "doc_id", "lang"
    )


@register(
    "g13_decontaminate",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in range(1, len(w) - 1)]) AS s
               FROM toks),
        eg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 17 = 0),
        ex AS (SELECT doc_id, len(s) AS n_grams, unnest(s) AS g
               FROM sh WHERE doc_id % 17 <> 0 AND len(s) >= 1)
        SELECT ex.doc_id,
               max(ex.n_grams) AS n_grams,
               count(eg.g) AS n_shared,
               round(count(eg.g)::DOUBLE / max(ex.n_grams), 4) AS contamination,
               count(eg.g)::DOUBLE / max(ex.n_grams) >= 0.2 AS contaminated
        FROM ex LEFT JOIN eg ON ex.g = eg.g
        GROUP BY ex.doc_id
    """,
)
def g13_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (pre-training hygiene): every 17th doc
    plays the held-out benchmark; each remaining training doc is scored by
    the exact fraction of its distinct 3-gram shingles that appear anywhere
    in the benchmark set. Spark side is a broadcast inverted-index probe
    (operators/training.py:decontaminate) — the eval gram set is the small
    side at any corpus scale; the oracle recomputes the same exact overlap
    in SQL."""
    from aws_kinesis_spark.operators.training import decontaminate

    d = load(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("doc_id") % 17 != 0),
        d.filter(F.col("doc_id") % 17 == 0),
        n=3,
        threshold=0.2,
    )


@register(
    "g14_quantize_embeddings",
    oracle="""
        WITH q AS (
            SELECT vec_id,
                   list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) / 127.0
                       AS scale
            FROM embeddings
        )
        SELECT e.vec_id,
               round(q.scale, 6) AS scale,
               array_to_string(
                   [CAST(floor(CAST(x AS DOUBLE)
                               / (CASE WHEN q.scale = 0 THEN 1.0 ELSE q.scale END)
                               + 0.5) AS BIGINT)
                    for x in e.embedding], ',') AS codes
        FROM embeddings e JOIN q USING (vec_id)
    """,
)
def g14_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization of the embedding store (4x smaller ANN
    candidates). Codes are serialized to a comma string in BOTH engines so
    the differential compares exact integer codes without array-vs-list
    canonicalization hazards; the stored operator output keeps typed
    array<byte> codes (operators/embedding.py)."""
    from aws_kinesis_spark.operators.embedding import quantize_embeddings

    q = quantize_embeddings(load(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.concat_ws(",", F.col("codes").cast("array<string>")).alias("codes"),
    )


@register(
    "g14b_quantization_error",
    oracle="""
        WITH v AS (SELECT vec_id,
                          [CAST(x AS DOUBLE) for x in embedding] AS xs
                   FROM embeddings),
        s AS (SELECT vec_id, xs,
                     list_max([abs(x) for x in xs]) / 127.0 AS scale
              FROM v),
        e AS (SELECT vec_id, xs, scale,
                     [floor(x / (CASE WHEN scale = 0 THEN 1.0 ELSE scale END)
                            + 0.5) * scale - x
                      for x in xs] AS err
              FROM s)
        SELECT vec_id,
               len(xs) AS n_dims,
               round(scale, 8) AS scale,
               round(list_max([abs(x) for x in err]), 8) AS max_abs_err,
               round(list_sum([x * x for x in err]) / len(xs), 10) AS mse
        FROM e
    """,
)
def g14b_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction-error report for the int8 quantizer: measured
    max|err| and MSE per vector (the bound is scale/2 per element; this is
    the actual). Lets a pipeline gate quantization on a measured error
    budget."""
    from aws_kinesis_spark.operators.embedding import quantization_error

    return quantization_error(load(spark, sf_dir, "embeddings"))


def _duck_cos_prefix(lhs: str, rhs: str, dims: int) -> str:
    """_duck_cos over the first ``dims`` elements only (Matryoshka
    truncation): each side's norm runs over ITS OWN clamped prefix,
    mirroring Spark's per-array slice-then-norm."""
    def _rng(side: str) -> str:
        return f"range(1, least(len({side}.embedding), {dims}) + 1)"

    return f"""
    list_sum([CAST({lhs}.embedding[i] AS DOUBLE) * CAST({rhs}.embedding[i] AS DOUBLE)
              for i in {_rng(lhs)}])
    / nullif(sqrt(list_sum([CAST({lhs}.embedding[i] AS DOUBLE)
                            * CAST({lhs}.embedding[i] AS DOUBLE) for i in {_rng(lhs)}]))
             * sqrt(list_sum([CAST({rhs}.embedding[i] AS DOUBLE)
                              * CAST({rhs}.embedding[i] AS DOUBLE) for i in {_rng(rhs)}])), 0)
"""


@register(
    "g56_truncation_recall",
    oracle=f"""
        WITH pairs AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   {_DUCK_COSINE} AS cf,
                   {_duck_cos_prefix("a", "b", 16)} AS ct
            FROM (SELECT * FROM embeddings WHERE vec_id < 5) a
            JOIN embeddings b ON b.vec_id <> a.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cf, ct,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cf DESC NULLS LAST, neighbor_id) AS rf,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY ct DESC NULLS LAST, neighbor_id) AS rt
            FROM pairs
        )
        SELECT query_id,
               count(*) AS n_true,
               CAST(sum(CASE WHEN rt <= 10 AND ct IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               round(CAST(sum(CASE WHEN rt <= 10 AND ct IS NOT NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 4) AS recall_at_k
        FROM ranked
        WHERE rf <= 10 AND cf IS NOT NULL
        GROUP BY query_id
    """,
)
def g56_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation gate: recall@10 of the 16-dim prefix-cosine
    ranking vs the exact 64-dim top-10, per query (Kusupati et al. 2022) —
    the other embedding-compression axis next to g14/g14b's int8 codes,
    measured against the exact ranking rather than assumed. One corpus
    scan scores both cosines per candidate row; the two rank windows share
    one (query_id) exchange; no corpus shuffle
    (operators/embedding.py:truncation_recall). Reference pipeline
    context: README.md:137-158 (derived analytics tables gated on measured
    quality before serving)."""
    from aws_kinesis_spark.operators.embedding import truncation_recall

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return truncation_recall(emb, queries, dims=16, k=10)


@register(
    "g15_repetition_filter",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        b AS (SELECT doc_id, len(w) - 1 AS n,
                     unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
              FROM t WHERE len(w) >= 2),
        bc AS (SELECT doc_id, g, any_value(n) AS n, count(*) AS c
               FROM b GROUP BY doc_id, g),
        b2 AS (SELECT doc_id, round(max(c)::DOUBLE / any_value(n), 4) AS top2
               FROM bc GROUP BY doc_id),
        r AS (SELECT doc_id, len(w) - 2 AS n,
                     unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in range(1, len(w) - 1)]) AS g
              FROM t WHERE len(w) >= 3),
        rc AS (SELECT doc_id, g, any_value(n) AS n, count(*) AS c
               FROM r GROUP BY doc_id, g),
        r3 AS (SELECT doc_id, round(max(c)::DOUBLE / any_value(n), 4) AS top3
               FROM rc GROUP BY doc_id)
        SELECT t.doc_id,
               round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 4)
                   AS dup_token_fraction,
               coalesce(b2.top2, 0.0) AS top_bigram_share,
               coalesce(r3.top3, 0.0) AS top_trigram_share,
               (coalesce(b2.top2, 0.0) >= 0.2
                OR 1.0 - len(list_distinct(w))::DOUBLE / len(w) >= 0.9)
                   AS repetitive
        FROM t LEFT JOIN b2 USING (doc_id) LEFT JOIN r3 USING (doc_id)
    """,
)
def g15_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-token fraction and
    the share of the single most frequent 2-/3-gram, with the standard
    top-2-gram >= 0.2 repetition flag. Spark computes the shares as in-row
    sorted-array folds (functions/text.py:top_ngram_share) — a pure
    projection, zero shuffles at any corpus size — while the oracle derives
    the same numbers via unnest + GROUP BY."""
    d = load(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    # flag on the UNROUNDED fraction (matching the oracle); round only the
    # reported column — comparing the rounded value against the threshold
    # would flip the flag for docs landing within 5e-5 of it
    dup_raw = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    # both gram sizes in one Arrow pass (~3x the interpreted fold form when
    # scoring several sizes; see functions/text.py:ngram_shares_udf)
    shares = TX.ngram_shares_udf((2, 3))(toks)
    top2 = F.element_at(shares, 1)
    top3 = F.element_at(shares, 2)
    return d.select(
        "doc_id",
        F.round(dup_raw, 4).alias("dup_token_fraction"),
        top2.alias("top_bigram_share"),
        top3.alias("top_trigram_share"),
        ((top2 >= 0.2) | (dup_raw >= 0.9)).alias("repetitive"),
    )


# Identical ERE subset in Java regex and RE2 (no lookaround, no backrefs),
# so the Spark expressions and the DuckDB oracle scrub identically.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_LONGNUM_RE = "[0-9]{6,}"


@register(
    "g16_pii_scrub",
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS n_long_numbers,
               md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{_LONGNUM_RE}', '<NUM>', 'g')) AS scrubbed_md5
        FROM documents
    """,
)
def g16_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (pre-training hygiene): count and redact email
    addresses and long digit runs (account/phone-number shaped). Pure JVM
    regexp expressions — one codegen'd scan pass at any corpus size. The
    scrubbed text is compared by md5 so the differential proves the exact
    redacted bytes, not just the counts; the edge cases (emails present)
    are pinned by a synthetic unit test since the fixture corpus is
    PII-free."""
    d = load(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _LONGNUM_RE, "<NUM>"
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_LONGNUM_RE)).alias("n_long_numbers"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "g17_training_order",
    oracle="""
        SELECT doc_id,
               substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
               row_number() OVER (
                   PARTITION BY substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 2)
                   ORDER BY md5('1:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rank_in_bucket
        FROM documents
    """,
)
def g17_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-1 training order: global order = (bucket, rank)
    where bucket is the first md5 hex byte of (epoch:id) — 256 bounded
    per-bucket sorts instead of one global sort
    (operators/training.py:training_order). Seedless: any engine
    reproduces the identical order."""
    from aws_kinesis_spark.operators.training import training_order

    return training_order(load(spark, sf_dir, "documents"), epoch=1)


@register(
    "g18_token_topk",
    oracle="""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 100
    """,
)
def g18_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: exact global top-100 tokens. One shuffle with
    map-side partial aggregation; the top-k is a TakeOrderedAndProject, no
    global sort (operators/sketch.py)."""
    from aws_kinesis_spark.operators.sketch import token_topk_exact

    return token_topk_exact(load(spark, sf_dir, "documents"), k=100)


@register(
    "g18b_token_topk_sketch",
    oracle="""
        SELECT token, count(*) AS n_est, CAST(0 AS BIGINT) AS err
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n_est DESC, token
        LIMIT 100
    """,
)
def g18b_token_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via per-partition SpaceSaving summaries — the
    bounded-memory scale path: O(partitions x capacity) rows shuffle
    regardless of vocabulary size.

    Driver-checkable oracle: SpaceSaving is provably EXACT (zero
    overestimation, err=0) whenever each partition's distinct-token count
    fits ``capacity`` — the fixture vocabulary (31) is far under 4096, so
    the sketch result must equal the exact SQL top-k verbatim; the err
    column hash-anchors the zero-error claim. The eviction-bound property
    test (vocab >> capacity) stays in tests/test_ext.py."""
    from aws_kinesis_spark.operators.sketch import token_topk_spacesaving

    return token_topk_spacesaving(load(spark, sf_dir, "documents"), k=100)


@register(
    "g19_dedup_keepers",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES},
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
        ),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        clusters AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
                     FROM reach GROUP BY u),
        q AS (
            SELECT doc_id,
                   round(0.3 * least(1.0, len(w) / 100.0)
                         + 0.3 * (len(list_distinct(w))::DOUBLE / len(w))
                         + 0.2 * least(1.0,
                               (len(list_filter(w, x -> x IN
                                    ('the','a','of','and','to','in','is','it')))::DOUBLE
                                / len(w)) * 5.0)
                         + 0.2 * (1.0 - CASE WHEN length(text) > 0
                                   THEN length(regexp_replace(lower(text),
                                     '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text)
                                   ELSE 0.0 END),
                         4) AS quality
            FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        )
        SELECT q.doc_id,
               coalesce(c.cluster_id, q.doc_id) AS cluster_id,
               q.quality,
               row_number() OVER (
                   PARTITION BY coalesce(c.cluster_id, q.doc_id)
                   ORDER BY q.quality DESC, q.doc_id
               ) = 1 AS keep
        FROM q LEFT JOIN clusters c USING (doc_id)
    """,
)
def g19_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END DECISION (G2/G10/G4 composed): every document mapped
    to its near-dup cluster with the highest-quality copy flagged as
    keeper, singletons keeping themselves — the row-level verdict a
    pipeline actually applies to the corpus. Spark side is
    operators/dedup.py:dedup_keepers (LSH clusters + one left join + one
    window); the oracle recomputes clusters by recursive CTE and quality
    by the g04 formula."""
    from aws_kinesis_spark.operators.dedup import dedup_keepers

    return dedup_keepers(load(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "g20_incremental_dedup",
    oracle=f"""
        WITH {_DUCK_SHINGLES}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4)
                   AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)
          AND len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    """,
)
def g20_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: every 10th doc plays the new crawl batch;
    pairs with at least one new side are found by banding the NEW batch
    against the full banded index — per-increment cost proportional to the
    increment, never a corpus self-re-pairing
    (operators/dedup.py:incremental_minhash_dedup). Oracle: exact all-pairs
    Jaccard restricted to pairs touching the new batch."""
    from aws_kinesis_spark.operators.dedup import incremental_minhash_dedup

    return incremental_minhash_dedup(
        load(spark, sf_dir, "documents"), F.col("doc_id") % 10 == 0, threshold=0.7
    )


@register(
    "g21_doc_chunking",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
            FROM documents
        ), starts AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t), 24)) AS s
            FROM toks WHERE len(t) > 0
        )
        SELECT doc_id,
               CAST((s - 1) / 24 AS BIGINT) AS chunk_id,
               array_to_string(t[s : least(s + 31, len(t))], ' ') AS chunk_text,
               CAST(least(s + 31, len(t)) - s + 1 AS BIGINT) AS n_tokens
        FROM starts
        WHERE s = 1 OR s <= len(t) - 8
    """,
)
def g21_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking: 32-token windows stepping by 24 (8-token overlap),
    no fully-redundant tail chunk (operators/training.py:chunk_documents).
    The step between a cleaned corpus and an embed/index stage; map-only,
    zero shuffle, zero Python."""
    from aws_kinesis_spark.operators.training import chunk_documents

    return chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@register(
    "g22_corpus_stats",
    oracle="""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
               round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
               count(DISTINCT text) AS n_unique_texts
        FROM documents
        GROUP BY lang, source
    """,
)
def g22_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet / data card: per (lang, source) document counts,
    token volume, length distribution, and exact-duplicate rate — the
    summary a training-mixture decision starts from. One partial-agg
    shuffle on the (tiny) group key; the percentile is the exact form
    (low-cardinality groups — the 100 TB path swaps in approx_percentile's
    mergeable t-digest, see d10b)."""
    d = load(spark, sf_dir, "documents")
    toks = TX.token_count(F.col("text"))
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("total_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        F.countDistinct("text").alias("n_unique_texts"),
    )


@register(
    "g23_leakage_safe_split",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES},
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
        ),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        clusters AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
                     FROM reach GROUP BY u),
        keyed AS (
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN clusters c USING (doc_id)
        )
        SELECT doc_id, cluster_id,
               CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'cc'
                         THEN 'train'
                    WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6'
                         THEN 'val'
                    ELSE 'test' END AS split
        FROM keyed
    """,
)
def g23_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the g09 content-free hash split
    keyed on the NEAR-DUP CLUSTER id instead of the document id, so two
    near-duplicate documents can never straddle a split boundary (the
    classic eval-contamination leak a per-doc split permits). Composition:
    alternating-star clusters (g10) + the deterministic md5-bucket split
    (g09); singletons key on their own id. Scale: the cluster table is the
    only extra cost over g09 — the split itself stays a pure projection."""
    docs = load(spark, sf_dir, "documents")
    clusters = neardup_clusters(docs, threshold=0.7)
    keyed = docs.select("doc_id").join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
    )
    h2 = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 2)
    return keyed.select(
        "doc_id",
        "cluster_id",
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test").alias("split"),
    )


@register(
    "g24_temperature_mixture",
    oracle="""
        WITH counts AS (
            SELECT lang, count(*) AS n_l,
                   min(count(*)) OVER () AS n_min
            FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang, n_l,
                   least(1.0, sqrt(CAST(n_min AS DOUBLE) / CAST(n_l AS DOUBLE)))
                       AS keep_f
            FROM counts
        )
        SELECT d.doc_id, d.lang, round(r.keep_f, 6) AS keep_f
        FROM documents d JOIN rates r USING (lang)
        WHERE CAST((d.doc_id * 2654435761) % 1000000 AS DOUBLE) / 1000000.0
              < r.keep_f
    """,
)
def g24_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training mixture (T=2 ~ alpha=0.5, the standard
    multilingual rebalance): per-language keep rate sqrt(n_min/n_l) —
    the rarest language keeps 100%, head languages downsample toward their
    square root — with the rates derived FROM THE DATA in the same plan
    (one tiny agg + broadcast join back; no collect, no seed). Sampling is
    a deterministic integer-hash variate (Knuth multiplicative), so every
    engine and every rerun keeps the identical row set. Complements g12,
    where the fractions are caller-specified."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.least(
            F.lit(1.0),
            F.sqrt(F.col("n_min").cast("double") / F.col("n_l").cast("double")),
        ).alias("keep_f"),
    )
    variate = ((F.col("doc_id") * F.lit(2654435761)) % 1000000).cast("double") / 1000000.0
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(variate < F.col("keep_f"))
        .select("doc_id", "lang", F.round("keep_f", 6).alias("keep_f"))
    )


@register(
    "g25_span_dedup",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                       t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))
                       AS hs
            FROM documents
            WHERE len(string_split(text, ' ')) >= 8
        ),
        spans AS (
            -- double rolling hash packed as h1*P2 + h2 (~62-bit span key,
            -- matching span_dup_stats exactly): a single 31-bit hash
            -- false-flags unique spans at corpus scale
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(hs) - 8 + 2),
                       i -> list_reduce(
                                list_prepend(0::BIGINT, list_slice(hs, i, i + 7)),
                                (a, b) -> (a * 131 + b) % 2147483647)
                            * 2147483629
                            + list_reduce(
                                list_prepend(0::BIGINT, list_slice(hs, i, i + 7)),
                                (a, b) -> (a * 137 + b) % 2147483629))) AS sp
            FROM toks
        ),
        ex AS (SELECT doc_id, unnest(sp) AS h FROM spans),
        counts AS (SELECT h, count(*) AS nd FROM ex GROUP BY h)
        SELECT e.doc_id,
               count(*) AS n_spans,
               CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_spans,
               CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS dup_fraction
        FROM ex e JOIN counts c ON e.h = c.h
        GROUP BY e.doc_id
    """,
)
def g25_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2+: exact duplicated-SPAN statistics — verbatim 8-token runs shared
    across documents (substring-level dedup after Lee et al. 2022, the
    memorization-risk measure whole-doc dedup misses). Pure-JVM rolling
    k-gram fingerprints; shuffles carry 8-byte span hashes only, never
    text (operators/dedup.py:span_dup_stats). NOTE: dup_fraction is the
    raw IEEE double quotient on both engines — rounding it would create
    half-even/half-up ties at small integer denominators (1/32 = .03125)."""
    d = load(spark, sf_dir, "documents")
    return span_dup_stats(d, "text", "doc_id", k=8).withColumn(
        "dup_fraction", F.col("n_dup_spans") / F.col("n_spans")
    )


@register(
    "g26_unigram_logprob",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq)
        SELECT doc_id,
               count(*) AS n_tokens,
               round(avg(ln(c / (SELECT n FROM tot))), 4) AS avg_logprob
        FROM tok JOIN freq USING (t)
        GROUP BY doc_id
    """,
)
def g26_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4/G6+: corpus-derived unigram language-model scoring — each
    document's mean token log-probability under the corpus's OWN unigram
    distribution (the degenerate-but-standard KenLM-style quality signal:
    gibberish and rare-token spam score low, fluent text scores near the
    corpus mode). The model is built IN-PLAN: one token-frequency
    aggregate, its total folded in as a broadcast scalar, then a
    frequency join back onto the token stream.

    Scale shape: two shuffles total (token groupBy with map-side partials;
    per-doc re-aggregation), and the freq table broadcasts whenever the
    vocabulary fits (~MBs for real corpora) — the corpus token stream is
    never shuffled for the join. No collect, no driver-side model."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("n"))
    # freq broadcast is left to AQE: a real corpus vocabulary is MBs and
    # broadcasts, but forcing it would OOM the driver on a pathological
    # vocab (every token unique); the scalar total is always broadcast.
    scored = tok.join(freq, "t").crossJoin(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.log(F.col("c") / F.col("n"))), 4).alias("avg_logprob"),
    )


@register(
    "g27_embedding_decontaminate",
    oracle=f"""
        WITH b AS (SELECT * FROM embeddings WHERE vec_id % 100 = 0),
             a AS (SELECT * FROM embeddings WHERE vec_id % 100 <> 0)
        SELECT a.vec_id,
               round(max({_DUCK_COSINE}), 4) + 0.0 AS max_ref_sim,
               -- flag on the ROUNDED value: the operator emits (and the
               -- Spark flag compares) the 4-dp max_ref_sim, so a true max
               -- in [0.39995, 0.4) flags on one engine and not the other
               -- if the oracle compares unrounded (round-12 review)
               round(max({_DUCK_COSINE}), 4) >= 0.4 AS contaminated
        FROM a CROSS JOIN b
        GROUP BY a.vec_id
    """,
)
def g27_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G13 in embedding space: flag training vectors whose max cosine
    similarity against a held-out eval/benchmark set crosses a threshold —
    the semantic-decontamination pass that catches paraphrased benchmark
    leakage g13's exact n-gram probe cannot (reference README.md's
    dedup/quality pipeline generalized to vectors). The eval set (every
    100th vector here) is bounded by construction; the corpus streams
    through one Arrow BLAS pass with NO join and NO shuffle
    (operators/similarity.py:max_sim_vs_reference, plan-locked to zero
    Exchange in tests/test_plans.py)."""
    em = load(spark, sf_dir, "embeddings")
    ref = em.filter(F.col("vec_id") % 100 == 0)
    corpus = em.filter(F.col("vec_id") % 100 != 0)
    sims = max_sim_vs_reference(corpus, ref)
    return sims.select(
        "vec_id",
        "max_ref_sim",
        (F.col("max_ref_sim") >= 0.4).alias("contaminated"),
    )


@register(
    "g28_source_overlap",
    oracle=f"""
        WITH {_DUCK_SHINGLES.replace("SELECT doc_id,", "SELECT doc_id, source,")}
        , pairs AS (
            SELECT a.source AS sa, b.source AS sb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
        )
        SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
               count(*) AS n_neardup_pairs
        FROM pairs GROUP BY 1, 2
    """,
)
def g28_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G22+: cross-source contamination matrix — which ingest sources
    near-duplicate each other (the data-card question behind source
    weighting and crawl-overlap audits). Near-dup pairs come from the
    banded MinHash path (operators/dedup.py, full recall at the 0.7
    threshold per the g02 differential), then two joins back onto the
    (doc_id, source) projection and one aggregate over canonicalized
    source pairs. Scale: the pair list is the small side post-dedup; the
    doc->source map joins on doc_id (broadcast when the pair list is
    small, AQE decides), text never shuffles."""
    d = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(d, threshold=0.7).select("id_a", "id_b")
    src = d.select("doc_id", "source")
    joined = (
        pairs.join(src.withColumnRenamed("doc_id", "id_a")
                      .withColumnRenamed("source", "sa"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("source", "sb"), "id_b")
    )
    return joined.groupBy(
        F.least("sa", "sb").alias("src_a"), F.greatest("sa", "sb").alias("src_b")
    ).agg(F.count("*").alias("n_neardup_pairs"))


@register(
    "g29_importance_sample",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) / 4294967296.0
              < n_chars / 2000.0
    """,
)
def g29_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12+: importance (weight-proportional Bernoulli) sampling — each doc
    kept with probability proportional to its own weight (n_chars / 2000
    here; quality score in production), the standard length/quality-aware
    downsample between the uniform g12 and the per-stratum g24. Seedless
    and ENGINE-REPRODUCIBLE by construction: the uniform draw is an
    md5-derived 32-bit integer divided by 2^32, and the keep predicate uses
    only IEEE-exact ops (integer hash, two divisions, one compare — no
    ln/pow, whose last-ulp rounding differs across libms and would
    de-synchronize the kept set at the threshold boundary). Map-only:
    filter in the scan stage, zero shuffle."""
    d = load(spark, sf_dir, "documents")
    u = TX.md5_uniform(F.col("doc_id"))
    return d.filter(u < F.col("n_chars") / F.lit(2000.0)).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "g30_bm25_score",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        stats AS (SELECT CAST(avg(dl) AS DOUBLE) AS avgdl,
                         count(*) AS n_docs FROM dl),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS t),
        df AS (SELECT t, count(DISTINCT doc_id) AS df
               FROM tok JOIN q USING (t) GROUP BY t),
        tf AS (SELECT doc_id, t, count(*) AS tf
               FROM tok JOIN q USING (t) GROUP BY doc_id, t)
        SELECT doc_id,
               count(*) AS n_terms_matched,
               round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                         * tf * 2.2
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4)
                   AS bm25
        FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY doc_id
    """,
)
def g30_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4+: BM25 relevance scoring of every document against a query term
    set (Robertson/Sparck-Jones BM25 with the Lucene idf form,
    k1=1.2 b=0.75) — the retrieval-quality signal behind RAG corpus
    curation and query-driven subset selection. Everything is IN-PLAN:
    doc length is an in-row size(split()) (no token shuffle for lengths),
    the corpus stats (N, avgdl) fold in as one broadcast scalar row, the
    per-term document frequencies are a |Q|-row broadcast, and only the
    query-term postings (tokens filtered to Q in the scan stage) ever
    shuffle — on a 100 TB corpus that is the inverted-index slice for
    three terms, not the token stream."""
    return _bm25_scores(load(spark, sf_dir, "documents"), ["window", "merge", "scan"])


def _bm25_scores(d: DataFrame, terms: list[str]) -> DataFrame:
    """The g30 BM25 kernel (Lucene idf, k1=1.2 b=0.75), extracted verbatim
    so g57's keyword arm scores with the SAME certified machinery rather
    than a drifting copy. Returns (doc_id, n_terms_matched, bm25) with
    bm25 rounded to 4 decimals (the decimal-exact precision the g30 oracle
    hash-matches at — downstream rankings order by the rounded value so
    every engine ranks identically)."""
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t").isin(terms))
    dl = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("dl")
    )
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs")
    )
    df_t = toks.distinct().groupBy("t").agg(F.count("*").alias("df"))
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    # df is |Q| rows and stats is one row — always broadcastable
    scored = (
        tf.join(F.broadcast(df_t), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    contrib = (
        idf
        * F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        F.round(F.sum(contrib), 4).alias("bm25"),
    )


@register(
    "g57_hybrid_rrf",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        stats AS (SELECT CAST(avg(dl) AS DOUBLE) AS avgdl,
                         count(*) AS n_docs FROM dl),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS t),
        df AS (SELECT t, count(DISTINCT doc_id) AS df
               FROM tok JOIN q USING (t) GROUP BY t),
        tf AS (SELECT doc_id, t, count(*) AS tf
               FROM tok JOIN q USING (t) GROUP BY doc_id, t),
        bm AS (
            SELECT doc_id,
                   round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * tf * 2.2
                             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4)
                       AS bm25
            FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats
            GROUP BY doc_id
        ),
        bm_rank AS (
            SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rb
            FROM bm QUALIFY rb <= 50
        ),
        cs AS (
            SELECT b.vec_id AS doc_id, round({_DUCK_COSINE}, 4) AS cos_sim
            FROM (SELECT * FROM embeddings WHERE vec_id = 0) a
            CROSS JOIN embeddings b
        ),
        cos_rank AS (
            SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rc
            FROM cs WHERE cos_sim IS NOT NULL QUALIFY rc <= 50
        )
        SELECT doc_id,
               CAST(coalesce(rb, 0) AS BIGINT) AS r_bm25,
               CAST(coalesce(rc, 0) AS BIGINT) AS r_cos,
               round(coalesce(CAST(1.0 AS DOUBLE) / (60 + rb), 0)
                     + coalesce(CAST(1.0 AS DOUBLE) / (60 + rc), 0), 6) AS rrf_score
        FROM bm_rank FULL OUTER JOIN cos_rank USING (doc_id)
        QUALIFY row_number() OVER (ORDER BY rrf_score DESC, doc_id) <= 10
    """,
)
def g57_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    k=60) of a BM25 keyword ranking and an embedding-cosine ranking — the
    standard hybrid-search stage of RAG corpus curation, fusing g30's
    lexical arm with g03's vector arm. Each arm keeps its global top-50 as
    a distributed TakeOrderedAndProject (no global sort shuffles the
    corpus); ranks are then assigned on the <=50-row survivor frames
    (single-partition windows over metadata-scale data, the bounded
    exception to the no-global-window posture); the fusion join and final
    top-10 run on <=100 rows. Both arms rank on 4-decimal-rounded scores
    (the precision their oracles hash-match at) with id tie-breaks, so
    every engine reproduces the fused list exactly. r_bm25/r_cos = 0 means
    "absent from that arm's top-50"."""
    from pyspark.sql import Window

    from aws_kinesis_spark.functions.vectors import cosine

    d = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    terms = ["window", "merge", "scan"]
    k_rrf, top_n, top_out = 60, 50, 10

    bm_top = (
        _bm25_scores(d, terms)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(top_n)
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    cos_top = (
        emb.crossJoin(F.broadcast(qv))  # 1-row broadcast scalar join
        .select(
            F.col("vec_id").alias("doc_id"),
            (F.round(cosine("__qvec", "embedding"), 4) + F.lit(0.0)).alias("cos_sim"),
        )
        .filter(F.col("cos_sim").isNotNull())
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(top_n)
    )
    # the survivor frames are <= top_n rows: a lit-partitioned window here
    # is a 50-row single-task sort, not a corpus-wide one
    wb = Window.partitionBy(F.lit(0)).orderBy(F.desc("bm25"), F.asc("doc_id"))
    wc = Window.partitionBy(F.lit(0)).orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    bm_rank = bm_top.select("doc_id", F.row_number().over(wb).alias("rb"))
    cos_rank = cos_top.select("doc_id", F.row_number().over(wc).alias("rc"))
    fused = bm_rank.join(cos_rank, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rb", F.lit(0)).cast("bigint").alias("r_bm25"),
        F.coalesce("rc", F.lit(0)).cast("bigint").alias("r_cos"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("rb")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("rc")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(top_out)


@register(
    "g31_bigram_logprob",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        bg AS (SELECT doc_id,
                      unnest([w[i] for i in range(1, len(w))]) AS w1,
                      unnest([w[i+1] for i in range(1, len(w))]) AS w2
               FROM t),
        c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1)
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(avg(ln(c2 / c1)), 4) AS avg_logprob
        FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        GROUP BY doc_id
    """,
)
def g31_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g26 upgraded to a CONDITIONAL bigram LM: each document's mean
    log p(w_i | w_{i-1}) under the corpus's own MLE bigram model — the
    next-token-predictability fluency signal (word-salad spam scores far
    below fluent text even when its unigram mix looks normal). Model
    built in-plan: bigrams come from an IN-ROW zip of the token array
    with its shift (transform over slice — the token stream is never
    shuffled to form pairs), bigram counts c2 and their prefix marginals
    c1 are two cheap aggregates over the (much smaller) distinct-bigram
    table, and the scoring joins are left to AQE (a real corpus's bigram
    table is GBs — forcing broadcast would OOM the driver, same posture
    as g26's vocabulary join)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 2
    )
    pairs = F.expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, w[i + 1] AS w2))"
    )
    big = toks.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = big.join(c2, ["w1", "w2"]).join(c1, ["w1"])
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(F.log(F.col("c2") / F.col("c1"))), 4).alias("avg_logprob"),
    )


@register(
    "g32_setsim_prefix_join",
    oracle=f"""
        WITH {_DUCK_SHINGLES}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    """,
)
def g32_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 completed as a THIRD candidate-generation strategy: exact
    prefix-filtering set-similarity join (AllPairs/PPJoin). Same all-pairs
    oracle as g02/g02b; the difference is the guarantee ladder — g02's LSH
    banding is probabilistic recall, g02b's full inverted index is exact
    but quadratic on its hottest shingle, prefix filtering is exact AND
    candidate-bounded (only each set's rarest |s|-ceil(0.7|s|)+1 shingles
    are inverted; frequency ordering keeps the join's biggest bucket
    small). The 100 TB posture: LSH for first-pass scale, prefix join
    where recall must be provable (compliance-grade dedup)."""
    return setsim_prefix_join(load(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "g49_leakage_safe_split",
    oracle=f"""
        WITH {_DUCK_SHINGLES},
        split AS (
            SELECT doc_id,
                   CASE WHEN md5(CAST(doc_id AS VARCHAR)) LIKE '0%'
                        THEN 'test' ELSE 'train' END AS split
            FROM documents
        ),
        leaked AS (
            SELECT DISTINCT a.doc_id
            FROM sh a
            JOIN split x ON x.doc_id = a.doc_id AND x.split = 'train'
            JOIN sh b ON b.doc_id <> a.doc_id
            JOIN split y ON y.doc_id = b.doc_id AND y.split = 'test'
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
        )
        SELECT s.doc_id, s.split FROM split s
        WHERE s.split = 'test'
           OR s.doc_id NOT IN (SELECT doc_id FROM leaked)
    """,
)
def g49_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-split+decontamination COMPOSED: LEAKAGE-SAFE train/test split —
    hold out a deterministic hash slice (md5-hex prefix, the g09/g12
    split mechanism: replayable on any partitioning, no rand()) and then
    DROP from train every document with a near-duplicate in test
    (jaccard >= 0.7 on 3-gram shingles), the held-out-split
    decontamination every serious pretrain/eval pipeline runs so the
    model is never graded on paraphrases of its own training data
    (the GPT-3 appendix-A / C4 dedup practice).

    Cross-split near-dup pairs come from the EXACT prefix-filtering
    set-similarity join (operators/dedup.py:setsim_prefix_join — provable
    recall, the compliance-grade guarantee a leakage audit needs; LSH's
    probabilistic recall would silently leave leaks). Scale shape: the
    pair join is the g32 bounded-prefix plan; the leak set is test-rate
    sized and anti-joins train in one pass. Test docs always survive;
    only the contaminated TRAIN side is dropped."""
    d = load(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        F.when(
            F.md5(F.col("doc_id").cast("string")).startswith("0"), "test"
        ).otherwise("train").alias("split"),
    )
    pairs = setsim_prefix_join(d, threshold=0.7)
    # pairs are id_a < id_b; a leak is EITHER orientation of (train, test).
    # MEASURED NON-CHANGE (r15, VERDICT r14 #4): rewriting this union as
    # one pass (explode of a 2-element struct array per pair) halves the
    # PLAN (787 -> 451 lines) but is 1.5x SLOWER end to end (interleaved
    # one-process A/B at sf0.1, min-of-4: union 2.00 s vs explode 3.00 s):
    # the two union legs are independent subtrees whose stages run
    # CONCURRENTLY across the cores, so the plan duplication is mostly
    # cosmetic, while the explode serializes the whole pair chain behind
    # one Generate. The union form stays.
    edges = pairs.select("id_a", "id_b").unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    test_ids = tagged.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("id_b")
    )
    leaked = (
        edges.join(test_ids, "id_b", "left_semi")
        .select(F.col("id_a").alias("doc_id"))
        .distinct()
    )
    train_kept = tagged.filter(F.col("split") == "train").join(
        leaked, "doc_id", "left_anti"
    )
    return train_kept.unionByName(tagged.filter(F.col("split") == "test"))


@register(
    "g33_hard_negatives",
    oracle=f"""
        WITH pos AS (
            SELECT DISTINCT a.vec_id
            FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
            WHERE {_DUCK_COSINE} >= 0.4
        )
        SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
               round({_DUCK_COSINE}, 4) + 0.0 AS neg_sim
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id IN (SELECT vec_id FROM pos)
          AND {_DUCK_COSINE} < 0.4
        QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_DUCK_COSINE} DESC, b.vec_id) = 1
    """,
)
def g33_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3+: contrastive-training hard-negative mining — for every anchor
    vector that has a positive (cosine >= 0.4 near-dup/paraphrase), the
    single most similar vector strictly BELOW the threshold (SimCSE/DPR
    training triples: the near-misses carry the gradient signal; random
    negatives are trivially separable). Blocked-matmul shape shared with
    g03e: O(n*B) candidate rows, one window, one semi join — never an
    n^2 shuffle (operators/similarity.py:hard_negative_mining)."""
    return hard_negative_mining(load(spark, sf_dir, "embeddings"), pos_threshold=0.4)


@register(
    "g34_source_datacard",
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               round(avg(n_chars), 2) AS avg_chars,
               round(avg(CASE WHEN n_chars < 200 THEN 1.0 ELSE 0.0 END), 4)
                   AS short_frac,
               round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
                     / count(*), 4) AS dup_rate
        FROM documents GROUP BY source
    """,
)
def g34_source_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G22+: per-source dataset-card statistics — the summary block a
    data card / crawl audit publishes per ingest source (volume, language
    spread, length profile, exact-duplicate rate). One aggregate pass;
    the duplicate rate counts DISTINCT text via md5 fingerprints so the
    distinct-aggregation state and shuffle carry 16-byte hashes, never
    document bodies — the same text-never-shuffles discipline as the
    dedup family (collision odds ~n^2/2^128, irrelevant at any corpus
    size)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(
            F.avg(F.when(F.col("n_chars") < 200, F.lit(1.0)).otherwise(F.lit(0.0))),
            4,
        ).alias("short_frac"),
        F.round(
            F.lit(1.0)
            - F.count_distinct(F.md5("text")).cast("double") / F.count("*"),
            4,
        ).alias("dup_rate"),
    )


@register(
    "g58_source_drift",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS t
            FROM documents WHERE text IS NOT NULL
        ),
        sc AS (SELECT source, t, count(*) AS c_st FROM toks GROUP BY source, t),
        gc AS (SELECT t, CAST(sum(c_st) AS BIGINT) AS c_t FROM sc GROUP BY t),
        stats AS (SELECT count(*) AS v, CAST(sum(c_t) AS BIGINT) AS n FROM gc),
        totals AS (
            SELECT v, n, sum(ln(CAST(c_t AS DOUBLE) / n)) AS s_lnq
            FROM gc CROSS JOIN stats GROUP BY v, n
        ),
        ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s
               FROM sc GROUP BY source),
        contrib AS (
            SELECT source,
                   ((c_st + CAST(0.5 AS DOUBLE))
                    / (n_s + CAST(0.5 AS DOUBLE) * v)) AS pst,
                   CAST(c_t AS DOUBLE) / n AS q
            FROM sc JOIN gc USING (t) JOIN ns USING (source) CROSS JOIN totals
        ),
        agg AS (
            SELECT source, sum(pst * ln(pst / q)) AS c_present,
                   count(*) AS kp, sum(ln(q)) AS s_present
            FROM contrib GROUP BY source
        )
        SELECT source, n_s AS n_tokens, kp AS n_distinct,
               round(c_present
                     + (CAST(0.5 AS DOUBLE) / (n_s + CAST(0.5 AS DOUBLE) * v))
                       * ((v - kp)
                          * ln(CAST(0.5 AS DOUBLE) / (n_s + CAST(0.5 AS DOUBLE) * v))
                          - (s_lnq - s_present)), 6) AS kl_vs_corpus
        FROM agg JOIN ns USING (source) CROSS JOIN totals
    """,
)
def g58_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G22+: per-source distribution drift — KL(P_source || Q_corpus)
    between each source's add-0.5-smoothed unigram distribution and the
    corpus-wide one, the data-card metric that flags a crawl slice or
    vendor feed whose token mix has drifted from the corpus it joins.
    The absent-token mass folds in closed form so the plan never builds
    the sources x vocab cross product; the token stream shuffles once
    (operators/sketch.py:source_kl_drift)."""
    from aws_kinesis_spark.operators.sketch import source_kl_drift

    return source_kl_drift(load(spark, sf_dir, "documents"))


@register(
    "g36_token_budget_sample",
    oracle="""
        WITH tok AS (
            SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        per_src AS (
            SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS toks,
                   CAST(sum(sum(n_tokens)) OVER () AS DOUBLE) * 0.5
                       / count(*) OVER () AS share
            FROM tok GROUP BY source
        ),
        rates AS (
            SELECT source, least(toks, share) / toks AS keep_f FROM per_src
        )
        SELECT t.doc_id, t.source, t.n_tokens, round(r.keep_f, 6) AS keep_f
        FROM tok t JOIN rates r USING (source)
        WHERE CAST((t.doc_id * 2654435761) % 1000000 AS DOUBLE) / 1000000.0
              < r.keep_f
    """,
)
def g36_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampling family completed for TOKEN BUDGETS: given a corpus
    budget (half the corpus here) split fairly across sources, each
    source keeps min(its tokens, fair share) — sources under their share
    keep everything, head sources downsample to the share (single-round
    water-filling; unspent small-source budget intentionally not
    redistributed — deterministic and one aggregate pass). Rates derive
    IN-PLAN (per-source token sums + two window functions on the |sources|-
    row aggregate), the keep decision is the same Knuth-hash variate as
    g24 — engine-reproducible, seedless, map-only after one broadcast
    join. This is the knob a pretraining run actually sets: tokens, not
    document counts (g12/g24/g29 sample by row, weight, and temperature)."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tok = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    per_src = tok.groupBy("source").agg(
        F.sum("n_tokens").cast("double").alias("toks")
    )
    w = Window.partitionBy()
    per_src = per_src.select(
        "source",
        "toks",
        (F.sum("toks").over(w) * 0.5 / F.count("*").over(w)).alias("share"),
    )
    rates = per_src.select(
        "source", (F.least("toks", "share") / F.col("toks")).alias("keep_f")
    )
    variate = ((F.col("doc_id") * F.lit(2654435761)) % 1000000).cast(
        "double"
    ) / 1000000.0
    return (
        tok.join(F.broadcast(rates), "source")
        .filter(variate < F.col("keep_f"))
        .select("doc_id", "source", "n_tokens", F.round("keep_f", 6).alias("keep_f"))
    )


@register(
    "g37_containment_dedup",
    oracle=f"""
        WITH {_DUCK_SHINGLES},
        ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        sz AS (SELECT doc_id, len(s) AS n FROM sh),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
            FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.da AS doc_id, i.db AS contained_in,
               round(i.i * 1.0 / sz.n, 4) + 0.0 AS containment
        FROM inter i JOIN sz ON sz.doc_id = i.da
        WHERE i.i * 1.0 / sz.n >= 0.5
    """,
)
def g37_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 asymmetric: shingle-set CONTAINMENT join (|A∩B|/|A| >= 0.5) —
    finds quote/superset/wrapper duplication that symmetric Jaccard
    misses. Inverted-index candidates + exact string verify
    (operators/dedup.py:containment_join); directional, so both orders
    of a pair are scored independently."""
    return containment_join(load(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "g38_semdedup",
    oracle=f"""
        WITH cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                   embedding
            FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
        ),
        scored AS (
            SELECT e.vec_id, c.cid, {_duck_cos('e', 'c')} AS cs
            FROM embeddings e CROSS JOIN cent c
        ),
        assign AS (
            SELECT vec_id, cid AS cluster_id FROM scored
            QUALIFY row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cs DESC NULLS LAST, cid) = 1
        ),
        av AS (
            SELECT e.vec_id, e.embedding, a.cluster_id
            FROM embeddings e JOIN assign a USING (vec_id)
        ),
        dropped AS (
            SELECT DISTINCT hi.vec_id
            FROM av lo JOIN av hi
              ON lo.cluster_id = hi.cluster_id AND lo.vec_id < hi.vec_id
            WHERE {_duck_cos('lo', 'hi')} >= 0.55
        )
        SELECT vec_id, cluster_id,
               vec_id NOT IN (SELECT vec_id FROM dropped) AS is_kept
        FROM av
    """,
)
def g38_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/G3 semantic dedup, SemDeDup (Abbas et al. 2023): cluster-bounded
    embedding near-dup pruning — literal-centroid map-only assignment,
    then within-cluster-only pair verification, so pair work is
    sum(c_i^2) with cluster size held constant by the n_clusters ∝ n
    contract (operators/similarity.py:semdedup)."""
    return semdedup(load(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.55)


@register(
    "g40_stratified_sample",
    oracle="""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        ) WHERE rn <= 5
    """,
)
def g40_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-mixture: EXACT-N-per-stratum sample (5 docs per source) — the
    fixed-quota complement to g12/g24/g29's keep-rate threshold sampling
    (those deliver expected fractions; dataset cards and eval slices need
    exact counts). Deterministic reservoir: rank by md5(doc_id) within
    the stratum and keep the first N — replayable on any partitioning,
    no rand(). One key shuffle; the per-stratum sort is bounded by the
    stratum, never global."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select("doc_id", "source")
    )


@register(
    "g41_filtered_knn",
    oracle=f"""
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_DUCK_COSINE}, 4) + 0.0 AS cos_sim
        FROM (SELECT * FROM embeddings WHERE vec_id % 50 = 0) a
        JOIN (SELECT e.* FROM embeddings e
              JOIN documents d ON d.doc_id = e.vec_id
              WHERE d.lang = 'en') b ON b.vec_id <> a.vec_id
        QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_DUCK_COSINE} DESC, b.vec_id) <= 3
    """,
)
def g41_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3+: FILTERED vector search — exact cosine top-3 restricted to the
    corpus subset matching a metadata predicate (documents.lang = 'en'),
    the hybrid retrieval shape every RAG/vector store serves (Qdrant/
    Milvus/pgvector filtered queries). The filter is applied as a
    PRE-filter: a doc_id semi-join prunes the corpus BEFORE any distance
    work, so top-k is exact over the qualifying set — post-filtering an
    unfiltered top-k (the naive composition of g03 + a filter) silently
    returns FEWER than k when neighbors fail the predicate, an
    unbounded recall loss at selective filters.

    Scale: the semi-join prunes at the scan (broadcast of the qualifying
    ids when the predicate is selective, AQE decides); the scoring pass
    is the g03 blocked brute-force kernel over the REDUCED corpus. For
    ANN at 100 TB the same pre-filter composes with the IVF path:
    knn_ivf_indexed(filter_ids=...) semi-joins the qualifying ids against
    the probed cell partitions BEFORE any distance work (exactness over
    the qualifying-within-probed set is pinned in
    tests/test_ivf_index.py), keeping recall exact w.r.t. the filtered
    set rather than hoping the unfiltered candidates survive the
    predicate."""
    em = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    qualifying = docs.filter(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = em.join(qualifying, "vec_id", "left_semi")
    queries = em.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_bruteforce(corpus, queries, k=3)


@register(
    "g48_persistent_ivf",
    oracle="""
        SELECT 10 * count(*) AS n_exact, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 5
    """,
)
def g48_persistent_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 serving path: the PERSISTENT IVF index (VERDICT r9 #1) certified
    end-to-end — build the standing store on 3/4 of the corpus, append the
    remaining quarter through incremental maintenance (stored centroids,
    no retrain, new batch dir only — the FAISS ``add`` / zone-map-update
    posture), then answer kNN from the store alone: knn_ivf_indexed runs
    NO training and NO corpus assignment, it opens only the nprobe probed
    ``cell=C`` partitions — the serving default runs the probe matmul
    driver-side against the in-hand centroids, so the probe plan carries
    ZERO Python evaluations (partition pruning and the no-UDF plan locked
    in tests/test_ivf_index.py).

    Driver-checkable oracle form: same (n_exact, recall_ok) shape as
    g03b/g03c — aggregate recall@10 >= 0.5 vs the brute-force twin over
    the FULL corpus asserted in-plan, so the check also proves the
    appended quarter is searchable (a probe that missed the incremental
    batch would lose every neighbor living there)."""
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    em = load(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="kinesis_g48_")
    try:
        queries = em.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # the brute-force twin is independent of the store build/append —
        # materialize it on a pool thread so its stages fill the build
        # jobs' tails (guide §2.6; same values, computed concurrently
        # instead of serially at action time)
        with ThreadPoolExecutor(max_workers=1) as pool:
            exact_f = pool.submit(
                lambda: knn_bruteforce(em, queries, k=10).localCheckpoint(
                    eager=True
                )
            )
            build_ivf_index(em.filter(F.col("vec_id") % 4 != 3), idx, nlist=32)
            update_ivf_index(em.filter(F.col("vec_id") % 4 == 3), idx)
            ann = knn_ivf_indexed(spark, idx, queries, k=10, nprobe=8)
            exact = exact_f.result()
        # materialize the one-row verdict (eager localCheckpoint) so the
        # corpus-sized temp store is reclaimed NOW, not leaked to /tmp on
        # every harness run (ADVICE r10) — the returned frame no longer
        # reads the index files
        return _ann_recall_check(ann, exact, min_recall=0.5).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


@register(
    "g45_vocab_coverage",
    oracle="""
        WITH tk AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT tok FROM (
                SELECT tok, count(*) AS c FROM tk GROUP BY tok
            ) QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 500
        )
        SELECT tk.doc_id,
               count(*) AS n_tok,
               CAST(sum(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               round(sum(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) + 0.0 AS oov_rate
        FROM tk LEFT JOIN vocab ON tk.tok = vocab.tok
        GROUP BY tk.doc_id
    """,
)
def g45_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-tokenizer-prep: VOCABULARY COVERAGE — build the top-V (500)
    corpus vocabulary by token frequency (ties broken by token string, so
    the V boundary is deterministic in both engines) and score every
    document's out-of-vocabulary rate over token OCCURRENCES. The report
    a tokenizer-training run reads before fixing its vocab size, and a
    quality signal (high OOV = noise/code/foreign text).

    Scale: one partial-agg shuffle for the frequency table; the top-V cut
    is orderBy+limit (TakeOrdered per partition + driver merge of V-row
    heaps, never a global sort); the V-row vocab broadcasts back onto the
    token stream (explicit F.broadcast), so the per-doc pass adds no
    second shuffle of the corpus beyond the doc_id agg."""
    d = load(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = (
        tk.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(500)
        .select("tok", F.lit(True).alias("__in"))
    )
    cov = tk.join(F.broadcast(vocab), "tok", "left")
    return cov.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"),
        (
            F.round(
                F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
                / F.count("*"),
                4,
            )
            + F.lit(0.0)
        ).alias("oov_rate"),
    )


@register(
    "g46_bpe_pair_stats",
    oracle="""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        wf AS (
            SELECT w, count(*) AS f
            FROM words
            WHERE w <> '' AND length(w) >= 2
            GROUP BY w
        ),
        pr AS (
            SELECT substring(w, i, 2) AS pair, f
            FROM (SELECT w, f, unnest(range(1, length(w))) AS i FROM wf)
        )
        SELECT pair, freq FROM (
            SELECT pair, CAST(sum(f) AS BIGINT) AS freq FROM pr GROUP BY pair
        ) QUALIFY row_number() OVER (ORDER BY freq DESC, pair) <= 50
    """,
)
def g46_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-tokenizer-prep: BPE MERGE-PAIR COUNTING — the inner loop of BPE
    tokenizer training (Sennrich et al. 2016): count adjacent symbol pairs
    across the corpus and surface the top-50 merge candidates (ties broken
    by pair string, so the cut boundary is deterministic in both engines).
    The first merge a BPE trainer would take is row 1.

    Scale: the classic fast-BPE factoring — pairs are enumerated over the
    DISTINCT-WORD table weighted by word frequency, never over raw tokens
    (at 100 TB the vocabulary is millions of rows while the token stream
    is trillions). One corpus-wide partial-agg shuffle builds the word
    frequencies; the pair explode + agg then runs over vocab-sized input
    (per-word pair fan-out is length-1, JVM `transform`+`substr`, no
    Python); the top-50 cut is orderBy+limit = TakeOrdered, never a
    global sort. Successive merge rounds would re-run only the vocab-sized
    stage with merged symbols — the corpus is touched once."""
    d = load(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    # sequence(1, len-1) is safe: len >= 2 is filtered above, so the
    # sequence is never descending (Spark steps -1 when start > stop).
    pairs = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(50)
    )


@register(
    "g47_length_bucketing",
    oracle="""
        WITH lens AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tok
            FROM documents
        ),
        b AS (
            SELECT quantile_cont(n_tok, 0.25) AS q1,
                   quantile_cont(n_tok, 0.50) AS q2,
                   quantile_cont(n_tok, 0.75) AS q3
            FROM lens
        )
        SELECT CAST((CASE WHEN n_tok > q1 THEN 1 ELSE 0 END)
                  + (CASE WHEN n_tok > q2 THEN 1 ELSE 0 END)
                  + (CASE WHEN n_tok > q3 THEN 1 ELSE 0 END) AS INT) AS bucket,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(max(n_tok) AS BIGINT) AS max_len
        FROM lens, b
        GROUP BY 1
    """,
)
def g47_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-training-prep: LENGTH BUCKETING — split the corpus at its token-
    length quartiles and report per-bucket size stats. The shape dynamic
    batching runs on: batches drawn within a length bucket pad to the
    bucket's max, not the corpus max, so padding waste is bounded by the
    bucket width (and the stats here are exactly what sizes that
    schedule). Quantile bounds (not fixed thresholds) keep the buckets
    balanced whatever the corpus length distribution looks like.

    Scale: one aggregate computes the three exact quartiles (single
    group — at 100 TB this is the documented approx_percentile swap from
    d35/d36, rank error bounded, no value buffer); the 1-row bounds
    BROADCAST back over the length table, so bucket assignment is
    map-only arithmetic; the per-bucket stats carry map-side partials
    into a 4-group shuffle. The corpus is scanned once, shuffled never
    (lengths partial-aggregate in place)."""
    d = load(spark, sf_dir, "documents")
    lens = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    bounds = lens.agg(
        F.percentile("n_tok", F.lit(0.25)).alias("q1"),
        F.percentile("n_tok", F.lit(0.50)).alias("q2"),
        F.percentile("n_tok", F.lit(0.75)).alias("q3"),
    )
    bucket = (
        (F.col("n_tok") > F.col("q1")).cast("int")
        + (F.col("n_tok") > F.col("q2")).cast("int")
        + (F.col("n_tok") > F.col("q3")).cast("int")
    ).alias("bucket")
    return (
        lens.join(F.broadcast(bounds))
        .select(bucket, "n_tok")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.max("n_tok").cast("bigint").alias("max_len"),
        )
    )


@register(
    "g50_source_cap",
    oracle="""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        ) WHERE rn <= 10
    """,
)
def g50_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-mixture: per-source FREQUENCY CAP — keep at most 10 documents per
    source in deterministic hash order, the CCNet/RefinedWeb "at most K
    pages per domain" over-representation guard. Same selection semantics
    as g40's exact-N quota, but computed by the SKEW-SAFE two-phase
    hash-bucket cutoff (operators/training.py:cap_per_key): per-(key,
    bucket) counts + a cumulative cutoff locate each key's boundary
    bucket, rows in dropped buckets die at a map-side broadcast join
    before any shuffle, and ranking happens per (key, bucket) slice — so
    a hot domain with 100M pages never serializes a full per-key sort
    onto one task, the failure mode the plain window (g40) hits at
    100 TB. The oracle is the plain-window form: both must agree row for
    row."""
    from aws_kinesis_spark.operators.training import cap_per_key

    d = load(spark, sf_dir, "documents")
    return cap_per_key(d, key_col="source", id_col="doc_id", k=10).select(
        "doc_id", "source"
    )


@register(
    "g51_per_source_quality_gate",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), med AS (
            SELECT source, quantile_cont(n_tokens, 0.5) AS src_median
            FROM scored GROUP BY source
        )
        SELECT s.doc_id, s.source, CAST(s.n_tokens AS BIGINT) AS n_tokens,
               round(m.src_median, 4) + 0.0 AS src_median
        FROM scored s JOIN med m USING (source)
        WHERE s.n_tokens > m.src_median
    """,
)
def g51_per_source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6+: RELATIVE quality gate — keep documents scoring strictly above
    their OWN source's median (token count here; any quality score in
    production), the per-source calibrated threshold FineWeb/CCNet apply
    instead of one global cutoff (g06): a boilerplate-heavy source and a
    clean one get different bars, so no source is wholesale deleted or
    wholesale kept by a global constant.

    Scale: pass 1 partial-aggregates the per-source median (exact here;
    the 100 TB swap is approx_percentile's mergeable t-digest, accuracy
    certified in d36); the per-source thresholds are a sources-sized
    frame BROADCAST back onto the scan, so the gate itself is map-only —
    the corpus never shuffles. Median interpolation is IEEE-exact on
    integer token counts in both engines ((a+b)/2 on exactly-representable
    doubles), so the strict > boundary cannot de-synchronize."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", TX.token_count(F.col("text")).alias("n_tokens")
    )
    med = scored.groupBy("source").agg(
        F.expr("percentile(n_tokens, 0.5)").alias("src_median")
    )
    return (
        scored.join(F.broadcast(med), "source")
        .filter(F.col("n_tokens") > F.col("src_median"))
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round("src_median", 4).alias("src_median"),
        )
    )


@register(
    "g52_ivf_delete",
    oracle=f"""
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_DUCK_COSINE}, 4) + 0.0 AS cos_sim
        FROM (SELECT * FROM embeddings WHERE vec_id < 5) a
        JOIN (SELECT * FROM embeddings WHERE vec_id % 7 <> 3) b
             ON b.vec_id <> a.vec_id
        QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_DUCK_COSINE} DESC, b.vec_id) <= 10
    """,
)
def g52_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 lifecycle: DELETES against the standing IVF store — the op a
    served vector index needs the day a source revokes documents (GDPR
    erasure, licensing takedown, dedup-after-the-fact). Merge-on-read
    tombstones, the vector analogue of the lake's deletion vectors (a19,
    reference README.md:441-449's committed-state posture): no cell file
    is rewritten on the delete path; a probe drops a stored row only when
    a tombstone covers its id AND the row's source batch is at or below
    the tombstone's append horizon, so later re-appends of the same id
    are served again. Physical removal happens at the next compaction,
    which also clears fully-applied tombstones
    (operators/ivf_index.py:delete_from_ivf_index).

    Hard-oracle form: build on the full corpus, delete vec_id % 7 == 3,
    then probe with nprobe = nlist — the probed set is the whole live
    store, so the result must EXACTLY equal brute-force cosine top-10
    over the remaining corpus (same pairs, same rounded scores, cos desc /
    id asc ranking). Any resurrection, over-delete, or scoring drift
    breaks the value hash.

    Scale: the delete writes one id-partitioned tombstone batch
    (O(deleted ids), one atomic rename); the probe's anti-join runs after
    partition pruning over probed-cell rows only, tombstone side sized
    O(deletes since last compaction) — AQE broadcasts it; stores that
    never saw a delete keep a byte-identical plan (one driver listdir)."""
    import shutil
    import tempfile

    from aws_kinesis_spark.operators.ivf_index import delete_from_ivf_index

    em = load(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="kinesis_g52_")
    try:
        nlist = 16
        build_ivf_index(em, idx, nlist=nlist)
        delete_from_ivf_index(em.filter(F.col("vec_id") % 7 == 3), idx)
        queries = em.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # eager localCheckpoint so the temp store is reclaimed now (the
        # g48 convention): the returned frame no longer reads the index
        return knn_ivf_indexed(
            spark, idx, queries, k=10, nprobe=nlist
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


@register(
    "g53_quality_classifier",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
                   CAST(sum((CAST(concat('0x', substr(md5(t), 1, 4)) AS INT)
                             % 64 % 9) - 4) AS BIGINT) AS score_sum,
                   count(*) AS n_tokens
            FROM tok GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               round(CAST(score_sum AS DOUBLE) / n_tokens, 4) + 0.0 AS clf_logit,
               CAST(score_sum > 0 AS INT) AS kept
        FROM scored
    """,
)
def g53_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6++: MODEL-BASED quality scoring — linear classifier inference over
    hashed bag-of-tokens features, the fastText/CCNet/FineWeb-edu pattern
    (Joulin et al. 2016; CCNet's LM-filter stage) that g06 (global
    heuristic gate) and g51 (per-source calibrated gate) deliberately are
    not: here the signal is a LEARNED weight per hashed token bucket, not
    a hand-set ratio. The model is a 64-bucket weight table embedded in
    the plan as an array literal (weights derived deterministically from
    the bucket id so both engines hold the identical model without a
    training artifact); per-doc logit = sum(w[h(tok)]) / n_tokens, and
    the keep decision compares the INTEGER weight sum against 0 — exact
    on both engines, so the kept set cannot de-synchronize at the
    boundary (the g29 no-ln/pow discipline; the sigmoid is monotone in
    the logit, so thresholding the logit IS thresholding the
    probability).

    Scale: inference is MAP-ONLY — tokenize, hash, look up, accumulate,
    all in-row inside whole-stage codegen; the corpus never shuffles and
    there is no Python in the plan. A real model (fastText's 2M-bucket
    bigram table, a distilled regressor) swaps the array literal for a
    broadcast variable read inside an Arrow pandas_udf — that serving
    path is IMPLEMENTED at functions/text.py:linear_model_scorer and
    pinned bit-for-bit against this form on the same model
    (tests/test_ext.py::test_linear_model_scorer_matches_in_plan_form);
    the plan shape (broadcast model, embarrassingly parallel scan) is
    unchanged at 100 TB."""
    d = load(spark, sf_dir, "documents")
    n_buckets = 64
    # the "trained model": weight per hash bucket, embedded in the plan
    wt_arr = F.array(*[F.lit((b % 9) - 4) for b in range(n_buckets)])
    toks = F.split(F.col("text"), " ")
    contrib = F.transform(
        toks,
        lambda t: F.element_at(
            wt_arr,
            (F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int") % n_buckets)
            + 1,
        ),
    )
    score_sum = F.aggregate(
        contrib, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        score_sum.alias("__s"),
    ).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("__s").cast("double") / F.col("n_tokens"), 4).alias(
            "clf_logit"
        ),
        (F.col("__s") > 0).cast("int").alias("kept"),
    )


@register(
    "g54_mixture_oversample",
    oracle="""
        WITH w AS (
            SELECT doc_id, source,
                   CAST(0.5 AS DOUBLE)
                   + (CAST(concat('0x', substr(md5(source), 1, 4)) AS INT) % 4)
                     * CAST(0.75 AS DOUBLE) AS wt,
                   CAST(concat('0x', substr(md5('os:' || CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT)
                   / 4294967296.0 AS u
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, wt,
                   CAST(floor(wt) AS INT)
                   + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END AS copies
            FROM w
        )
        SELECT doc_id, source,
               CAST(unnest(generate_series(0, copies - 1)) AS INT) AS epoch,
               round(wt, 4) + 0.0 AS mix_weight
        FROM c WHERE copies > 0
    """,
)
def g54_mixture_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G24++: mixture materialization with FRACTIONAL EPOCHS — the
    Dolma/LLaMA data-recipe step where a curated source trains for 2.75
    epochs while bulk crawl trains for 0.5 of one. Every existing mixture
    knob here (g24 temperature, g29 importance, g36 token budget) can
    only DOWN-sample (keep rate <= 1); real pretraining mixes UP-sample
    their best sources, which needs row REPLICATION with a repeat index
    (epoch) so downstream packing/shuffling treats each copy as a
    distinct training row. Per-source weights {0.5, 1.25, 2.0, 2.75}
    are derived in-plan from an md5 bucket of the source name (a stand-in
    for the recipe's config table); each row emits floor(w) copies plus
    one more iff its g29-style md5-uniform draw falls below frac(w) —
    frac values here are exactly representable doubles and the compare
    is the only boundary op, so both engines emit the identical multiset
    (operators/training.py:oversample_mixture, which also pins the NULL
    id/weight semantics and carries an in-plan max_copies tripwire).

    Scale: map-only — copies is an in-row expression, replication is
    explode(sequence()) in the scan stage; zero shuffle, no sampling
    state, output sized sum(w_i). The weight table in production is a
    sources-sized broadcast join, exactly the g51 shape."""
    from aws_kinesis_spark.operators.training import oversample_mixture

    d = load(spark, sf_dir, "documents")
    wt = F.lit(0.5) + (
        F.conv(F.substring(F.md5(F.col("source")), 1, 4), 16, 10).cast("int") % 4
    ) * F.lit(0.75)
    base = d.select("doc_id", "source", wt.alias("mix_weight"))
    return oversample_mixture(
        base, F.col("mix_weight"), id_col="doc_id", epoch_col="epoch"
    ).select(
        "doc_id",
        "source",
        F.col("epoch").cast("int").alias("epoch"),
        F.round("mix_weight", 4).alias("mix_weight"),
    )


@register(
    "g55_pipeline_end_to_end",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
                   CAST(sum((CAST(concat('0x', substr(md5(t), 1, 4)) AS INT)
                             % 64 % 9) - 4) AS BIGINT) AS s,
                   count(*) AS n_tokens
            FROM tok GROUP BY doc_id
        ),
        gated AS (
            SELECT d.doc_id, d.source, d.text, sc.n_tokens
            FROM documents d JOIN scored sc USING (doc_id)
            WHERE sc.s + sc.n_tokens > 0
        ),
        deduped AS (
            SELECT doc_id, source, n_tokens FROM (
                SELECT doc_id, source, n_tokens,
                       row_number() OVER (PARTITION BY sha256(text)
                                          ORDER BY doc_id) AS rn
                FROM gated
            ) WHERE rn = 1
        )
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens FROM (
            SELECT doc_id, source, n_tokens,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS crn
            FROM deduped
        ) WHERE crn <= 10
    """,
)
def g55_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline COMPOSED: classifier gate (g53's
    model at threshold logit > -1, kept integer-exact as
    s + n_tokens > 0 so the boundary cannot de-synchronize) ->
    exact dedup keep-min (g01 semantics, sha-256 content hash) ->
    skew-safe per-source cap (g50's cap_per_key kernel, K=10) — one
    declarative plan proving the §2.G stages stack without
    rematerialization, the way a real corpus build runs them (CCNet /
    RefinedWeb order: quality model first, then dedup, then
    over-representation guard). The oracle recomputes all three stages
    in plain window SQL, so any composition bug (column collision,
    NULL leakage between stages, cap desync against the window form)
    breaks the value hash.

    Scale: the gate is a scan-stage expression (no shuffle); dedup is
    ONE hash shuffle on the 64-hex content digest (exact-dup groups are
    tiny, skew-free by construction); the cap is the g50 two-phase
    cutoff, so the composed plan's only other exchanges are the cap's
    counts pass + the ~sources*K-row ranking slice. Catalyst pipelines
    the gate into the parquet scan of BOTH cap passes — the corpus is
    read twice (cap_per_key's documented deterministic-input
    precondition; a parquet scan qualifies) but never fully shuffled."""
    from pyspark.sql import Window

    from aws_kinesis_spark.operators.training import cap_per_key

    d = load(spark, sf_dir, "documents")
    n_buckets = 64
    wt_arr = F.array(*[F.lit((b % 9) - 4) for b in range(n_buckets)])
    toks = F.split(F.col("text"), " ")
    score_sum = F.aggregate(
        F.transform(
            toks,
            lambda t: F.element_at(
                wt_arr,
                (F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
                 % n_buckets) + 1,
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    gated = d.select(
        "doc_id",
        "source",
        "text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        score_sum.alias("__s"),
    ).filter(F.col("__s") + F.col("n_tokens") > 0)
    wdup = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    deduped = (
        gated.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source", "n_tokens")
    )
    return cap_per_key(deduped, key_col="source", id_col="doc_id", k=10)


@register(
    "g59_url_dedup",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 3 AS INT)
                     WHEN 0 THEN 'https://www.' || source || '.example.com/'
                          || lang || '/item' || CAST(doc_id % 50 AS VARCHAR)
                          || '?utm_source=crawl&utm_medium=rss'
                     WHEN 1 THEN 'http://' || source || '.example.com/'
                          || lang || '/item' || CAST(doc_id % 50 AS VARCHAR) || '/'
                     ELSE 'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM/'
                          || lang || '/item' || CAST(doc_id % 50 AS VARCHAR)
                          || '?ref=feed'
                   END AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(lower(url), '^https?://', ''),
                       '^www\\.', ''),
                     '\\?.*$', ''),
                   '/$', '') AS canonical_url
            FROM raw
        )
        SELECT canonical_url,
               regexp_extract(canonical_url, '^[^/]+') AS domain,
               min(doc_id) AS keeper_id,
               count(*)    AS n_dups
        FROM canon
        GROUP BY canonical_url
    """,
)
def g59_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup — the crawl-curation step that runs BEFORE any
    content dedup (CCNet/RefinedWeb: canonicalize the record's URL, keep
    one fetch per canonical URL, count the collapse): scheme + leading
    "www." stripped, query string (tracking params) dropped, trailing
    slash removed, everything lowercased; the registered domain falls out
    as the prefix up to the first "/". The fixture synthesizes three
    messy variants of each logical URL from (source, lang, doc_id % 50) —
    mixed case, http vs https, tracking suffixes — so canonical collisions
    are real and the keeper (min doc_id) is deterministic.

    Scale: canonicalization is four anchored regexp_replaces IN the scan
    stage (whole-stage codegen, no Python); the only exchange is one
    partial-agg hash shuffle on canonical_url with two scalars of state —
    a hot URL (the crawl's most-refetched page) collapses map-side, no
    per-group buffering anywhere. Reference: per-record key extraction +
    dedup-on-key ingest (README.md:75-76, 141-143)."""
    d = load(spark, sf_dir, "documents")
    item = F.concat(
        F.col("lang"), F.lit("/item"), (F.col("doc_id") % 50).cast("string")
    )
    url = (
        F.when(
            (F.col("doc_id") % 3) == 0,
            F.concat(
                F.lit("https://www."), F.col("source"), F.lit(".example.com/"),
                item, F.lit("?utm_source=crawl&utm_medium=rss"),
            ),
        )
        .when(
            (F.col("doc_id") % 3) == 1,
            F.concat(
                F.lit("http://"), F.col("source"), F.lit(".example.com/"),
                item, F.lit("/"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://WWW."), F.upper("source"), F.lit(".EXAMPLE.COM/"),
                item, F.lit("?ref=feed"),
            )
        )
    )
    canon = F.lower(url)
    for pat in (r"^https?://", r"^www\.", r"\?.*$", r"/$"):
        canon = F.regexp_replace(canon, pat, "")
    c = d.select("doc_id", canon.alias("canonical_url"))
    return c.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count("*").alias("n_dups"),
    ).select(
        "canonical_url",
        F.regexp_extract("canonical_url", r"^[^/]+", 0).alias("domain"),
        "keeper_id",
        "n_dups",
    )


@register(
    "g60_line_dedup",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                                ' ') AS ts
            FROM documents
        ),
        ids AS (
            SELECT doc_id, ts,
                   unnest(range(0, CAST(ceil(len(ts) / 8.0) AS BIGINT)))
                       AS line_id
            FROM tok
        ),
        lt AS (
            SELECT doc_id, line_id,
                   array_to_string(ts[line_id * 8 + 1 : line_id * 8 + 8], ' ')
                       AS line_text
            FROM ids
        ),
        k AS (
            SELECT doc_id, line_id, line_text,
                   row_number() OVER (PARTITION BY line_text
                                      ORDER BY doc_id, line_id) AS rn
            FROM lt
        ),
        per AS (
            SELECT doc_id,
                   count(*) AS n_lines,
                   CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept
            FROM k GROUP BY doc_id
        ),
        kept AS (
            SELECT doc_id, string_agg(line_text, ' ' ORDER BY line_id) AS ct
            FROM k WHERE rn = 1 GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_lines, p.n_kept,
               coalesce(kt.ct, '') AS cleaned_text
        FROM per p LEFT JOIN kept kt USING (doc_id)
    """,
)
def g60_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LINE-level dedup across the whole corpus (Wenzek et al.
    2020, public): split every document into lines (whitespace-normalized
    fixed 8-token segments here — the fixture text has no newlines; real
    newline-delimited text would swap the segmenter for the raw '\\n'
    split and keep everything downstream), keep each distinct line's
    GLOBAL first occurrence (ordered by doc_id, then position), drop every
    later copy, and reassemble each document from its surviving lines in
    original order. This is the boilerplate-stripping pass that removes
    headers/footers/nav chrome repeated across a crawl — finer than g01's
    whole-doc hash, coarser than g25's rolling k-gram spans — and the
    reassembly reuses d40's ordered-collect pattern, so a fully-deduped
    document survives as an EMPTY row (n_kept = 0), not a dropped one.

    Scale: line construction is ONE linear regexp pass per document —
    a global regexp_replace turns every 8th token separator into a
    newline, then one split + posexplode emits the line rows (the
    obvious slice-per-line form re-evaluates split(text) in the Project
    under the Generate — O(tokens) per LINE, quadratic per document; the
    delimiter rewrite is O(tokens) per DOC and the generator expression
    evaluates once per input row). The oracle keeps the naive
    slice-per-line definition, so hash parity PROVES the regexp form
    computes the same segmentation. After that: ONE hash exchange on
    line_text for the first-occurrence window (a boilerplate line
    repeated millions of times lands in one partition but its state is a
    row_number counter — the sort is per-line-text over (doc_id,
    line_id) pairs, not text), then one doc_id shuffle to reassemble
    only KEPT lines (the d40 hot-key bound applies to pathological
    single docs, not dup volume). At 100 TB swap the window's partition
    key for the line's hash and carry text beside it — same plan shape.
    Reference: record-content dedup before delivery (README.md:141-143)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    # whitespace-normalize FIRST (runs of spaces/tabs/newlines -> one
    # space, trimmed) — without it the 8-token regex cannot match across
    # a double space and would silently emit a different segmentation
    # than the oracle's token-split definition (round-14 review)
    norm = F.trim(F.regexp_replace("text", r"\s+", " "))
    # every 8 tokens, swap the following separator space for \n: 7 of
    # (token + space) then a token, then the space to consume — a final
    # partial group (or a trailing full group at end-of-string) has no
    # trailing space, so it stays put and becomes the last line
    delim = F.regexp_replace(norm, r"((?:\S+ ){7}\S+) ", "$1\n")
    lt = d.select(
        "doc_id",
        F.posexplode(F.split(delim, "\n")).alias("line_id", "line_text"),
    ).select(
        "doc_id",
        F.col("line_id").cast("bigint").alias("line_id"),
        "line_text",
    )
    w = Window.partitionBy("line_text").orderBy("doc_id", "line_id")
    k = lt.withColumn("__rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("__rn") == 1, F.struct("line_id", "line_text")
    )
    return k.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.count(kept_struct).alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(kept_struct)),
                lambda x: x["line_text"],
            ),
            " ",
        ).alias("cleaned_text"),
    )


@register(
    "g61_dsir_selection",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(md5(t), 1, 4)) AS INT) % 256 AS b
            FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
                  FROM documents)
        ),
        ct AS (SELECT b, count(*) AS c FROM tok WHERE lang = 'en' GROUP BY b),
        cr AS (SELECT b, count(*) AS c FROM tok GROUP BY b),
        tt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM ct),
        tr AS (SELECT CAST(sum(c) AS DOUBLE) AS r FROM cr),
        w AS (
            SELECT s.b,
                   CAST(round(ln(
                       ((coalesce(ct.c, 0) + 1.0) / (tt.t + 256.0))
                       / ((coalesce(cr.c, 0) + 1.0) / (tr.r + 256.0))
                   ) * 1000000.0) AS BIGINT) AS w
            FROM (SELECT unnest(range(0, 256)) AS b) s
            LEFT JOIN ct USING (b) LEFT JOIN cr USING (b), tt, tr
        ),
        sc AS (
            SELECT tok.doc_id, tok.lang,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(w.w) AS BIGINT) AS score_micro_nats
            FROM tok JOIN w USING (b)
            GROUP BY tok.doc_id, tok.lang
        )
        SELECT doc_id, lang, n_tokens, score_micro_nats
        FROM sc WHERE score_micro_nats > 0
    """,
)
def g61_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, public): score every
    document by the log-likelihood ratio between a hashed-unigram LM of
    the TARGET distribution (here the lang='en' slice plays the
    high-quality target) and one of the RAW pool, and keep documents the
    target model prefers. Both 256-bucket LMs use add-1 smoothing; each
    bucket's log-ratio is quantized to INTEGER micro-nats
    (round(ln(p_t/p_r) * 1e6)) so a document's score is an exact integer
    sum — order-independent and engine-exact (the g53 integer-boundary
    discipline; the only float op is one ln per BUCKET on identical
    doubles, never per token, and a last-ulp libm difference would need
    to land within 5e-7 of a rounding boundary to flip a weight). True
    DSIR resamples with probability min(1, exp(score)); the registered
    form gates at ratio > 1 (score > 0), which is the same decision
    boundary without ln/exp in the per-doc path (the g29 discipline).

    Scale: the corpus is scanned exactly TWICE — one pass feeds a single
    combined bucket-count aggregate (target count as a conditional count
    in the same 256-key partial-agg shuffle, map-side combined to
    nothing; totals come from a window over the 256-row counts frame
    itself, so no lineage re-derivation triggers extra scans — the naive
    ct/cr/total-as-separate-frames form re-scans the corpus five times,
    visible in its physical plan), and one pass scores, where the
    256-row weight table BROADCASTS into the token stream and partial
    sums shuffle one integer per (doc, lang). A bucket with zero corpus
    tokens needs no weight row (no token can join to it), so there is no
    bucket spine. No all-token materialization, no Python, no driver
    collect; the weight table is metadata-scale by construction (B
    buckets, not |vocab|). Reference: the quality-gated delivery path
    (README.md:141-143, 155-158)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    B = 256
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("__t"),
    ).select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5("__t"), 1, 4), 16, 10).cast("int") % B).alias("__b"),
    )
    counts = tok.groupBy("__b").agg(
        F.count("*").alias("__cr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("__ct"),
    )
    # totals via a window over the 256-row counts frame (single partition
    # is fine at B rows) — an agg-on-a-separate-frame would re-derive the
    # whole counts lineage and re-scan the corpus
    wall = Window.partitionBy(F.lit(1))
    w = counts.select(
        "__b",
        F.round(
            F.log(
                ((F.col("__ct") + 1.0)
                 / (F.sum("__ct").over(wall).cast("double") + 256.0))
                / ((F.col("__cr") + 1.0)
                   / (F.sum("__cr").over(wall).cast("double") + 256.0))
            )
            * 1_000_000.0
        )
        .cast("bigint")
        .alias("__w"),
    )
    sc = (
        tok.join(F.broadcast(w), "__b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("__w").alias("score_micro_nats"),
        )
    )
    return sc.filter(F.col("score_micro_nats") > 0).select(
        "doc_id", "lang", "n_tokens", "score_micro_nats"
    )


@register(
    "g62_pq_ann",
    oracle="""
        SELECT 10 * count(*) AS n_exact, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 5
    """,
)
def g62_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3/G14++: PRODUCT-QUANTIZED ANN (Jegou et al. 2011, public) — the
    third embedding-compression axis (fewer codes per vector, next to
    g14's fewer bits per dim and g56's fewer dims), in its PRODUCTION
    shape: 16x16 per-subspace codebooks (4-bit codes, 8 bytes/vector vs
    256 for float32 — 32x), ADC candidate generation from CODES only,
    then exact-cosine rerank of the shortlist — ADC as a direct top-10
    ranker recalls only ~40% on this near-random fixture, which is
    exactly why FAISS-style serving uses it for the shortlist and scores
    the survivors exact. Certified the g03b way: rerank top-10 must
    recover >= 60% of the exact cosine top-10 pairs (measured 84-98% at
    shortlist=200 across fixtures; the margin absorbs codebook drift),
    asserted IN-PLAN against the brute-force twin with the exact pair
    count as the hash anchor. Deterministic end to end (xxhash sample
    order, first-K-distinct init, fixed Lloyd iterations, first-wins
    argmins, tie-broken rankings), so the boolean cannot flap.

    Scale: training collects ONE bounded sample (the train_ivf_centroids
    discipline); encoding is one Arrow mapInPandas scan with the
    metadata-scale codebooks in the closure (no shuffle); ADC streams
    the CODES table — 32x smaller than the vectors — emitting per-batch
    top-shortlist only; the rerank broadcasts the queries x shortlist
    candidate frame into one corpus join and scores cosine in-row. The
    full-precision corpus never shuffles; size shortlist proportionally
    to the corpus (FAISS practice). Reference: the compact-index
    candidate-generation role of the delivery path (README.md:141-143).
    """
    from aws_kinesis_spark.operators.embedding import (
        pq_ann_rerank,
        pq_encode,
        train_pq_codebooks,
    )

    em = load(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = train_pq_codebooks(em, m=16, k=16)
    codes = pq_encode(em, books)
    ann = pq_ann_rerank(em, codes, queries, books, k=10, shortlist=200)
    exact = knn_bruteforce(em, queries, k=10)
    return _ann_recall_check(ann, exact, min_recall=0.6)
