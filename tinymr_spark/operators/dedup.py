"""Deduplication operators over `documents` / `embeddings` — exact,
shingle-Jaccard, MinHash, SimHash, embedding-cosine.  Beyond-reference
scope (SURVEY.md §2.5): the reference can only express these as
hand-written mapper/reducer code; here each is a declarative DataFrame
pipeline designed for the 100 TB layout:

* candidate generation is always inverted-index / banding (shuffle on a
  small key), never an all-pairs cross join;
* hashes are md5 (identical in Spark and DuckDB) so the oracle can verify
  signatures bit-for-bit;
* per-pair verification joins happen only on the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymr_spark.operators.text import ngrams, with_tokens
from tinymr_spark.sources import load_table

N_MINHASH = 8  # minhash signature length (b=8 bands of r=1)


def _shingles(spark, sf_dir, n=3):
    """Distinct (doc_id, shingle) pairs — the inverted-index input."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", F.explode(F.array_distinct(ngrams(F.col("toks"), n))).alias("sh")
    )


_SQL_SHINGLES = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok,
               unnest(range(1, len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) + 1)) AS pos
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
        FROM toks a
        JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    )
"""


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on a content fingerprint.  At 100 TB this is one
# shuffle on a 32-byte key; the representative (min doc_id) makes the result
# deterministic.
# ---------------------------------------------------------------------------
def q40_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


ORACLE_Q40 = """
SELECT md5(text) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup: inverted index on 3-word shingles -> candidate
# pairs sharing >= 2 shingles -> exact Jaccard on candidates only.
# ---------------------------------------------------------------------------
def q41_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= 2)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )


ORACLE_Q41 = (
    _SQL_SHINGLES
    + """
    , sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    )
SELECT doc_a, doc_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
"""
)


# ---------------------------------------------------------------------------
# MinHash + LSH: signature = min(md5(seed || shingle)) per seed; banding
# with r=1, b=8 (a pair is a candidate if ANY signature position matches).
# md5 makes signatures engine-portable; the shuffle key for candidate
# generation is (seed, minhash) — tiny.
# ---------------------------------------------------------------------------
def q42_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    seeds = F.sequence(F.lit(0), F.lit(N_MINHASH - 1))
    sigs = (
        sh.select("doc_id", "sh", F.explode(seeds).alias("seed"))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("sh"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed"))
            & (F.col("a.mh") == F.col("b.mh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("n_bands"),
            F.round(F.count("*") / N_MINHASH, 4).alias("est_jaccard"),
        )
    )


ORACLE_Q42 = (
    _SQL_SHINGLES
    + f"""
    , sigs AS (
        SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || sh)) AS mh
        FROM shingles, generate_series(0, {N_MINHASH - 1}) AS g(seed)
        GROUP BY doc_id, seed
    )
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*) AS n_bands,
       ROUND(CAST(COUNT(*) AS DOUBLE) / {N_MINHASH}, 4) AS est_jaccard
FROM sigs a JOIN sigs b
  ON a.seed = b.seed AND a.mh = b.mh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""
)


# ---------------------------------------------------------------------------
# SimHash: 16-bit signature from md5 nibbles of each token, weighted by
# term frequency.  Bit math is done with div/mod so the identical
# computation runs on both engines.
# ---------------------------------------------------------------------------
def q43_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tinymr_spark.operators.text import _tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("w"))
        .withColumn("h", F.md5(F.col("tok")))
    )
    bits = tf.select(
        "doc_id",
        "w",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"),
    )
    # nibble value of hex char j/4, bit j%4 of it
    nib = F.conv(F.substring(F.col("h"), (F.col("j") / 4).cast("int") + 1, 1), 16, 10).cast(
        "int"
    )
    bit = F.floor(nib / F.pow(F.lit(2), F.col("j") % 4)).cast("int") % 2
    contrib = F.col("w") * (bit * 2 - 1)
    sums = bits.select("doc_id", "j", contrib.alias("c")).groupBy("doc_id", "j").agg(
        F.sum("c").alias("s")
    )
    return (
        sums.select(
            "doc_id",
            F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("j")).cast("long"))
            .otherwise(F.lit(0))
            .alias("bitval"),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


ORACLE_Q43 = r"""
WITH tf AS (
    SELECT doc_id, tok, COUNT(*) AS w, md5(tok) AS h
    FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY doc_id, tok
),
bits AS (
    SELECT doc_id, j,
           w * (((CAST(strpos('0123456789abcdef', substr(h, (j // 4) + 1, 1)) - 1 AS INT)
                 // CAST(POW(2, j % 4) AS INT)) % 2) * 2 - 1) AS c
    FROM tf, generate_series(0, 15) AS g(j)
),
sums AS (SELECT doc_id, j, SUM(c) AS s FROM bits GROUP BY doc_id, j)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM sums
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: candidate restriction by label (the cheap
# blocking key), exact cosine in double precision on candidates.
# ---------------------------------------------------------------------------
def _cosine(a, b):
    """Cosine similarity of two float-array columns, computed in double
    with a fixed left-to-right accumulation order (portable across
    engines)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def _dot(a, b):
    """Left-to-right double dot product of two float-array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def q44_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Precompute each vector's norm ONCE before the join — computing it per
    # candidate pair would redo O(dim) work candidate-count times (the norm
    # value is bit-identical either way, so the oracle is unaffected).
    with_norm = emb.select(
        "vec_id", "label", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    a = with_norm.alias("a")
    b = with_norm.alias("b")
    sim = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(sim, 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.9)
    )


ORACLE_Q44 = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
             4) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
            / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
            4) >= 0.9
"""



# ---------------------------------------------------------------------------
# Banded MinHash (the canonical shingle -> minhash -> band -> bucket-join
# pipeline): r=2 rows per band, b=4 bands.  A pair is a candidate iff ALL
# rows of some band match — tunable precision/recall vs q42's r=1.  Band
# keys are md5 of the concatenated row signatures, so the bucket join key
# is a fixed 32-byte string regardless of r.
# ---------------------------------------------------------------------------
BAND_R = 2
BAND_B = 4


def q45_dedup_minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    seeds = F.sequence(F.lit(0), F.lit(BAND_R * BAND_B - 1))
    sigs = (
        sh.select("doc_id", "sh", F.explode(seeds).alias("seed"))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("sh"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    bands = (
        sigs.withColumn("band", (F.col("seed") / BAND_R).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda x: x["mh"],
                    ),
                    "|",
                )
            ).alias("bandkey")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bandkey") == F.col("b.bandkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


ORACLE_Q45 = (
    _SQL_SHINGLES
    + f"""
    , sigs AS (
        SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || sh)) AS mh
        FROM shingles, generate_series(0, {BAND_R * BAND_B - 1}) AS g(seed)
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // {BAND_R} AS band,
               md5(string_agg(mh, '|' ORDER BY seed)) AS bandkey
        FROM sigs
        GROUP BY doc_id, band
    )
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""
)

QUERIES = {
    "q40_dedup_exact": q40_dedup_exact,
    "q41_dedup_jaccard": q41_dedup_jaccard,
    "q42_dedup_minhash": q42_dedup_minhash,
    "q43_dedup_simhash": q43_dedup_simhash,
    "q44_dedup_embedding": q44_dedup_embedding,
    "q45_dedup_minhash_banded": q45_dedup_minhash_banded,
}

ORACLE = {
    "q40_dedup_exact": ORACLE_Q40,
    "q41_dedup_jaccard": ORACLE_Q41,
    "q42_dedup_minhash": ORACLE_Q42,
    "q43_dedup_simhash": ORACLE_Q43,
    "q44_dedup_embedding": ORACLE_Q44,
    "q45_dedup_minhash_banded": ORACLE_Q45,
}
