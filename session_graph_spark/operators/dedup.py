"""Document deduplication operators (training-data-pipeline extensions).

Five strategies over a (doc_id, text) table, each returning an assignment
(doc_id, dup_group, canonical_doc) or candidate-pair DataFrame:

- exact_dedup:        hash-groupBy on normalized full text
- minhash_lsh_dedup:  word-shingle MinHash -> banded LSH -> bucket pairs ->
                      verified Jaccard -> connected components
- simhash_dedup:      64-bit SimHash over token hashes; Hamming-ball
                      candidates via 4x16-bit band blocking
- ngram_jaccard_pairs: character n-gram Jaccard verification kernel
- embedding_dedup:    cosine near-duplicates over an embedding column

All heavy per-text work runs in Arrow-batched pandas UDFs; pair generation
and grouping are DataFrame joins (same blocking/scoring/clustering shape as
the mention-ER pipeline — this is record linkage over documents).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from session_graph_spark.operators.cc import connected_components

# Per-bucket cap before the banded self-joins (same treatment as the
# mention-ER blocker, blocking.py MAX_BLOCK_SIZE): a corpus with millions
# of near-empty or boilerplate documents otherwise lands them all in one
# band bucket -> O(n^2) pairs in a single skewed join key. Over-cap
# buckets are salted into deterministic sub-buckets (see _cap_buckets),
# bounding pairs per join key while keeping partial recall; identical
# docs are already collapsed by exact_dedup upstream in any real pipeline.
MAX_BUCKET_DOCS = 64


def _cap_buckets(banded: DataFrame, bucket_cols: list[str],
                 max_docs: int = MAX_BUCKET_DOCS) -> DataFrame:
    """Adds a `__salt` sub-bucket column: over-cap buckets are SPLIT into
    deterministic sub-buckets of <= max_docs (rank by doc_id), not
    truncated. Joins that include `__salt` in the key stay bounded at
    C(max_docs, 2) pairs per join key, while docs past the cap keep
    their intra-sub-bucket pairs — recall degrades gracefully instead of
    docs 65+ silently losing every candidate."""
    w = Window.partitionBy(*bucket_cols).orderBy("doc_id")
    return (
        banded.withColumn("__rn", F.row_number().over(w))
        .withColumn("__salt", ((F.col("__rn") - 1) / F.lit(max_docs)).cast("int"))
        .drop("__rn")
    )

# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------
def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text_hash, canonical_doc): normalized-text hash groups."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    h = docs.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("text_hash"))
    canon = h.groupBy("text_hash").agg(F.min("doc_id").alias("canonical_doc"))
    return h.join(canon, "text_hash").select("doc_id", "text_hash", "canonical_doc")


# --------------------------------------------------------------------------
# MinHash + LSH over word shingles
# --------------------------------------------------------------------------
_P = (1 << 61) - 1


def _hash_params(n: int) -> tuple[np.ndarray, np.ndarray]:
    a = np.array([(2 * i + 1) * 0x9E3779B97F4A7C15 % _P for i in range(1, n + 1)], dtype=np.uint64)
    b = np.array([(i * 0xC2B2AE3D27D4EB4F + 31) % _P for i in range(1, n + 1)], dtype=np.uint64)
    return a, b


def _word_shingles(text: str, k: int) -> np.ndarray:
    words = text.lower().split()
    if len(words) < k:
        grams = {" ".join(words)} if words else set()
    else:
        grams = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
    return np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_hashes: int = 128, shingle_k: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures over word shingles."""
    a, b = _hash_params(n_hashes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col].fillna("")):
                h = _word_shingles(text, shingle_k)
                if len(h) == 0:
                    sig = np.zeros(n_hashes, dtype=np.int64)
                else:
                    sig = ((h[None, :] * a[:, None] + b[:, None]) % _P).min(axis=1).astype(np.int64)
                ids.append(doc_id)
                sigs.append(sig.tolist())
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(run, schema="doc_id long, sig array<long>")


def minhash_lsh_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_hashes: int = 128, bands: int = 32, shingle_k: int = 3,
                      threshold: float = 0.8) -> DataFrame:
    """Near-dup assignment (doc_id, dup_group): LSH candidates verified by
    estimated Jaccard (signature agreement) >= threshold, then CC."""
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_k).cache()
    r = n_hashes // bands
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.concat_ws("-", F.slice("sig", i * r + 1, r)),
            )
        ).alias("band_idx", "band_key"),
    )
    banded = _cap_buckets(banded, ["band_idx", "band_key"])
    pairs = (
        banded.alias("x").join(banded.alias("y"),
                               (F.col("x.band_idx") == F.col("y.band_idx"))
                               & (F.col("x.band_key") == F.col("y.band_key"))
                               & (F.col("x.__salt") == F.col("y.__salt"))
                               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    # verify: fraction of agreeing minhashes estimates Jaccard
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    verified = (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                            lambda v: v)) / F.lit(float(n_hashes)),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(
        verified.select(F.col("id_a").cast("string").alias("u"),
                        F.col("id_b").cast("string").alias("v"))
    )
    # CC materialized its input (localCheckpoint + count), so the cached
    # signatures are no longer reachable from any downstream plan
    sigs.unpersist()
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(comp, base.doc_id.cast("string") == comp.label, "left")
        .select("doc_id",
                F.coalesce(F.col("cluster_id").cast("long"), F.col("doc_id")).alias("dup_group"))
    )


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n_hashes: int = 128,
                            bands: int = 32, shingle_k: int = 3,
                            max_bucket_docs: int | None = None) -> DataFrame:
    """LSH candidate (id_a, id_b) pairs from banded MinHash signatures.

    max_bucket_docs=None (default) keeps EVERY candidate — full recall,
    the contract of the exact-verified variants below (a cap would
    silently drop docs 65+ of any band bucket, so a skewed corpus of
    near-identical boilerplate would lose all their pairs while the
    verification step still claims exactness). Pass a cap only when the
    caller owns the recall tradeoff; the estimated-Jaccard scale path
    (`minhash_lsh_dedup`) stays capped at MAX_BUCKET_DOCS."""
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_k)
    r = n_hashes // bands
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.concat_ws("-", F.slice("sig", i * r + 1, r)),
            )
        ).alias("band_idx", "band_key"),
    )
    cond = (
        (F.col("x.band_idx") == F.col("y.band_idx"))
        & (F.col("x.band_key") == F.col("y.band_key"))
        & (F.col("x.doc_id") < F.col("y.doc_id"))
    )
    if max_bucket_docs is not None:
        banded = _cap_buckets(banded, ["band_idx", "band_key"], max_bucket_docs)
        cond = cond & (F.col("x.__salt") == F.col("y.__salt"))
    else:
        # full recall means unbounded O(bucket^2) pairs in one join key:
        # surface the risk instead of silently eating it ('no silent
        # caps' in reverse). Costs one extra pass over the signatures —
        # acceptable for the oracle-exact variant; the capped scale path
        # (minhash_lsh_dedup) never takes this branch
        biggest = (
            banded.groupBy("band_idx", "band_key").count()
            .agg(F.max("count").alias("m")).first()["m"]
        ) or 0
        if biggest > MAX_BUCKET_DOCS:
            import warnings

            warnings.warn(
                f"minhash_candidate_pairs: largest band bucket holds "
                f"{biggest} docs (> {MAX_BUCKET_DOCS}); uncapped full-"
                f"recall mode will emit O(n^2) pairs for it — pass "
                f"max_bucket_docs or use minhash_lsh_dedup for skewed "
                f"near-identical corpora",
                stacklevel=2,
            )
    return (
        banded.alias("x").join(banded.alias("y"), cond)
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )


def word_shingle_jaccard(pairs_with_text: DataFrame, shingle_k: int = 3,
                         text_a: str = "text_a", text_b: str = "text_b") -> DataFrame:
    """Adds the exact word-k-shingle Jaccard column (Arrow kernel) — the
    verification step run only on LSH candidates, never all pairs."""

    @F.pandas_udf("double")
    def _j(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
        def sh(s: str) -> set[str]:
            words = str(s).lower().split()
            if len(words) < shingle_k:
                return {" ".join(words)} if words else set()
            return {" ".join(words[i:i + shingle_k])
                    for i in range(len(words) - shingle_k + 1)}
        out = np.empty(len(a))
        av, bv = a.fillna(""), b.fillna("")
        for i in range(len(a)):
            ga, gb = sh(av.iat[i]), sh(bv.iat[i])
            out[i] = len(ga & gb) / max(len(ga | gb), 1)
        return pd.Series(out, index=a.index)

    return pairs_with_text.withColumn("jaccard", _j(F.col(text_a), F.col(text_b)))


def minhash_dedup_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n_hashes: int = 128,
                        bands: int = 32, shingle_k: int = 3,
                        threshold: float = 0.8,
                        max_bucket_docs: int | None = None) -> DataFrame:
    """Near-dup PAIRS with exact Jaccard: LSH candidate generation
    (uncapped by default — full recall is this variant's contract), then
    true word-shingle Jaccard verification >= threshold. This is the
    oracle-checkable form (exact-Jaccard semantics, approximation only in
    band collision probability); `minhash_lsh_dedup` keeps the cheaper
    capped estimated-Jaccard verify + CC grouping as the scale path."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    cand = minhash_candidate_pairs(d, "text", "doc_id", n_hashes, bands,
                                   shingle_k, max_bucket_docs)
    ta = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    tb = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    with_text = cand.join(ta, "id_a").join(tb, "id_b")
    return (
        word_shingle_jaccard(with_text, shingle_k)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_dedup_groups_exact(docs: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", n_hashes: int = 128,
                               bands: int = 32, shingle_k: int = 3,
                               threshold: float = 0.8) -> DataFrame:
    """Near-dup group assignment (doc_id, dup_group) built from the
    EXACT-Jaccard-verified pair set + connected components: the
    oracle-checkable grouping form (an all-pairs exact Jaccard + recursive
    transitive closure reproduces it in SQL). dup_group = the component's
    lexicographic-min doc id (the CC min-label convention), docs with no
    near-dup map to themselves. `minhash_lsh_dedup` stays the cheaper
    estimated-Jaccard-verify variant."""
    pairs = minhash_dedup_pairs(docs, text_col, id_col, n_hashes, bands,
                                shingle_k, threshold)
    comp = connected_components(
        pairs.select(F.col("id_a").cast("string").alias("u"),
                     F.col("id_b").cast("string").alias("v"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(comp, base.doc_id.cast("string") == comp.label, "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id").cast("long"), F.col("doc_id")).alias("dup_group"),
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def _word_hash64(w: str) -> int:
    """Lower 64 bits of md5, little-endian — the exact value DuckDB's
    md5_number_lower() returns, so SimHash is oracle-mirrorable in SQL."""
    return struct.unpack("<Q", hashlib.md5(w.encode()).digest()[8:])[0]


def simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over md5-lower-64 word hashes (vectorized inner
    loop). Word hashes are memoized per batch: natural-language word
    frequencies are Zipfian, so most md5 calls hit the cache — md5 costs
    ~5x crc32 per call but amortizes well below it on real corpora."""
    memo: dict[str, int] = {}
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts.fillna("")):
        words = text.lower().split()
        if not words:
            continue
        hs = np.fromiter(
            (memo.get(w) or memo.setdefault(w, _word_hash64(w)) for w in words),
            dtype=np.uint64, count=len(words),
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        vote = bits.sum(axis=0) * 2 - len(hs)
        out[i] = np.packbits((vote > 0).astype(np.uint8)[::-1]).view(">u8")[0]
    return pd.Series(out.astype(np.int64), index=texts.index)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    @F.pandas_udf("long")
    def _sh(t: pd.Series) -> pd.Series:  # pragma: no cover
        return simhash_batch(t)

    return docs.select(F.col(id_col).alias("doc_id"), _sh(F.col(text_col)).alias("simhash"))


def simhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Candidate pairs whose 64-bit SimHashes differ by <= max_hamming bits.
    Blocking: 4 x 16-bit bands — any pair within Hamming distance 3 shares
    at least one exact band (pigeonhole)."""
    sh = simhash(docs, text_col, id_col)
    banded = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("band_idx", "band_val"),
    )
    banded = _cap_buckets(banded, ["band_idx", "band_val"])
    cand = (
        banded.alias("x").join(banded.alias("y"),
                               (F.col("x.band_idx") == F.col("y.band_idx"))
                               & (F.col("x.band_val") == F.col("y.band_val"))
                               & (F.col("x.__salt") == F.col("y.__salt"))
                               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"),
                F.col("x.simhash").alias("sh_a"), F.col("y.simhash").alias("sh_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard verification kernel
# --------------------------------------------------------------------------
def ngram_jaccard_pairs(pairs_with_text: DataFrame, n: int = 3,
                        text_a: str = "text_a", text_b: str = "text_b") -> DataFrame:
    """Adds char-n-gram jaccard column to a pair DataFrame (Arrow kernel)."""

    @F.pandas_udf("double")
    def _jacc(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
        def grams(s: str) -> set[str]:
            s = " ".join(str(s).lower().split())
            return {s[i : i + n] for i in range(max(len(s) - n + 1, 1))}
        out = np.empty(len(a))
        av, bv = a.fillna(""), b.fillna("")
        for i in range(len(a)):
            ga, gb = grams(av.iat[i]), grams(bv.iat[i])
            out[i] = len(ga & gb) / max(len(ga | gb), 1)
        return pd.Series(out, index=a.index)

    return pairs_with_text.withColumn("ngram_jaccard", _jacc(F.col(text_a), F.col(text_b)))


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------
def embedding_dedup(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                    threshold: float = 0.95, n_planes: int = 16) -> DataFrame:
    """Near-dup pairs by cosine >= threshold. Blocking: random-hyperplane
    LSH (sign sketch) so only same-bucket pairs are scored; brute force
    within bucket, JVM-side zip_with/aggregate arithmetic."""
    from session_graph_spark.operators.ann import hyperplane_bucket, cosine_expr

    e = emb.select(F.col(id_col).alias("doc_id"),
                   F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    e = e.withColumn("bucket", hyperplane_bucket(F.col("v"), n_planes))
    e = _cap_buckets(e, ["bucket"])
    pairs = (
        e.alias("x").join(e.alias("y"),
                          (F.col("x.bucket") == F.col("y.bucket"))
                          & (F.col("x.__salt") == F.col("y.__salt"))
                          & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"),
                F.col("x.v").alias("va"), F.col("y.v").alias("vb"))
    )
    return (
        pairs.withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
