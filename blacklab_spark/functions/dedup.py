"""Deduplication operators for large-scale training-data pipelines.

All variants are declarative DataFrame plans (shuffle-conscious,
oracle-checkable); SimHash uses one Arrow-batched kernel where 60
bit-columns would otherwise explode the plan.

Scale notes (10^9+ docs):
* exact: one hash-groupBy shuffle on a 60-bit digest key (uniform, no
  skew).
* MinHash/LSH: signatures are per-doc (map-side, JVM-only); the only
  shuffle is the band-bucket self-join, whose key (band, bucket-hash)
  is uniform by construction. Candidate verification is a pair-wise
  token-set intersection — per pair, not per corpus.
* brute-force Jaccard (the oracle path) is O(n²) and exists for
  small-scale verification only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from blacklab_spark.functions.hashing import md5_long
from blacklab_spark.functions.textstats import rational_round4
from blacklab_spark.tokenizer import tokens_insensitive


def _token_set(text_col: str = "text") -> F.Column:
    return F.array_distinct(tokens_insensitive(text_col))


def _shingle_set(text_col: str, n: int) -> F.Column:
    """n=1 → distinct tokens; n>1 → distinct word n-gram shingles.
    Shingles are the meaningful unit on corpora with a shared hot
    vocabulary: token *sets* converge, word order does not."""
    return _token_set(text_col) if n == 1 else shingles(text_col, n)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content digest: one row per distinct
    text with the kept (min) id and the duplicate count."""
    return (df.select(F.col(id_col), md5_long(F.col(text_col)).alias("digest"))
            .groupBy("digest")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("dup_count")))


def shingles(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles (JVM HOF: transform over start
    positions + slice + concat)."""
    toks = tokens_insensitive(text_col)
    idxs = F.sequence(F.lit(1), F.greatest(F.lit(0), F.size(toks) - (n - 1)))
    return F.array_distinct(
        F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(toks, i, n))))


def jaccard_pairs_bruteforce(df: DataFrame, threshold: float,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             shingle_n: int = 3) -> DataFrame:
    """O(n²) shingle-set Jaccard pairs ≥ threshold (verification scale
    only). Output: (id_a, id_b, jaccard) with id_a < id_b."""
    t = df.select(F.col(id_col).alias("id"),
                  _shingle_set(text_col, shingle_n).alias("s"))
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    jac = rational_round4(inter, union)   # integer round: engine-portable
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_signature(text_col: str = "text",
                      num_hashes: int = 16, shingle_n: int = 3) -> F.Column:
    """MinHash signature of a text column: one md5 base hash per
    shingle, then per hash i the min of (a_i·h + b_i) mod 2^31−1 over
    the shingle set (see the family note above MH_PRIME). Pure JVM
    column expression — arrays of longs, no UDF; exactly re-derivable
    in DuckDB/Python from MH_SALT + the _mh_coeff series."""
    return minhash_signature_over(_shingle_set(text_col, shingle_n),
                                  num_hashes)


#: Universal-hash family for MinHash: ONE md5 per shingle (the base
#: hash), then hash i = (a_i·h + b_i) mod p with p = 2^31 − 1
#: (Mersenne). All arithmetic fits int64 (a_i, h < 2^31 ⇒ a_i·h + b_i
#: < 2^62 + 2^31), so Spark, DuckDB and Python agree bit-for-bit. The
#: original family (16 salted md5s per shingle) hashed every shingle
#: num_hashes times — 16× the md5 work for no extra independence than
#: a pairwise-independent affine family provides; at corpus scale the
#: signature pass dominates the whole near-dup pipeline, so this
#: constant matters.
MH_PRIME = (1 << 31) - 1
MH_SALT = "mh|"


def _mh_coeff(i: int) -> tuple[int, int]:
    from blacklab_spark.functions.hashing import py_md5_long
    a = py_md5_long(f"mhA{i}") % (MH_PRIME - 1) + 1   # a ∈ [1, p−1]
    b = py_md5_long(f"mhB{i}") % MH_PRIME
    return a, b


MH_COEFFS: tuple[tuple[int, int], ...] = tuple(
    _mh_coeff(i) for i in range(64))


def minhash_base_hashes(shingles_col) -> F.Column:
    """Base-hash array: md5_long(salt‖shingle) mod p per shingle —
    the ONE expensive (md5) pass of the signature."""
    return F.transform(
        shingles_col,
        lambda x: F.pmod(md5_long(x, salt=MH_SALT), F.lit(MH_PRIME)))


def minhash_affine_sig(base_col, num_hashes: int = 16) -> F.Column:
    """Signature from a pre-projected base-hash array column: per
    hash i, min over the array of (a_i·h + b_i) mod p. Pure integer
    arithmetic — no further hashing.

    The coefficients MUST be closed over via a helper function, never
    the ``lambda x, i=i`` default-argument idiom: PySpark derives the
    lambda's arity from its *signature*, so a defaulted extra arg
    becomes transform's second (index) parameter (a historical
    silent-salt-corruption bug caught by the streaming batch ≡ stream
    identity test)."""
    def one(i: int) -> F.Column:
        # beyond the precomputed table, derive coefficients on demand
        # (any num_hashes works; the table just avoids re-hashing the
        # common range on every plan construction)
        a, b = MH_COEFFS[i] if i < len(MH_COEFFS) else _mh_coeff(i)
        return F.array_min(F.transform(
            base_col,
            lambda h: F.pmod(h * F.lit(a) + F.lit(b),
                             F.lit(MH_PRIME))))
    return F.array(*[one(i) for i in range(num_hashes)])


def minhash_signature_over(shingles_col, num_hashes: int = 16) -> F.Column:
    """Signature over a shingle array column (single-expression form;
    prefer projecting `minhash_base_hashes` to its own column first —
    `minhash_banded` does — so codegen evaluates the md5 pass once
    rather than relying on subexpression elimination inside
    higher-order functions)."""
    return minhash_affine_sig(minhash_base_hashes(shingles_col),
                              num_hashes)


def minhash_banded(df: DataFrame, num_hashes: int = 16, bands: int = 8,
                   id_col: str = "doc_id", text_col: str = "text",
                   shingle_n: int = 3) -> DataFrame:
    """Banded MinHash signature frame ``(id, s, band, key)`` — the
    LSH bucket rows one doc contributes (``s`` = exact shingle set for
    the verify step). Shared by the batch all-pairs path
    (`minhash_lsh_pairs`) and the streaming incremental path
    (`streaming/dedup.py`)."""
    rows = num_hashes // bands
    sig = (df.select(F.col(id_col).alias("id"),
                     _shingle_set(text_col, shingle_n).alias("s"))
           .withColumn("_h", minhash_base_hashes(F.col("s")))
           .select("id", "s",
                   minhash_affine_sig(F.col("_h"),
                                      num_hashes).alias("sig")))
    banded = sig.select(
        "id", "s",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws(",", *[
                         F.element_at("sig", b * rows + r + 1).cast("string")
                         for r in range(rows)]).alias("key"))
            for b in range(bands)])).alias("bk"))
    return banded.select("id", "s", "bk.band", "bk.key")


def verify_jaccard_pairs(cand: DataFrame,
                         threshold: float) -> DataFrame:
    """Exact token-shingle Jaccard over candidate pairs
    ``(id_a, id_b, sa, sb)`` → ``(id_a, id_b, jaccard ≥ threshold)``
    (the LSH verify step, shared batch/streaming)."""
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    jac = rational_round4(inter, union)
    return (cand.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_lsh_pairs(df: DataFrame, threshold: float = 0.5,
                      num_hashes: int = 16, bands: int = 8,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      shingle_n: int = 3) -> DataFrame:
    """MinHash + LSH banding → candidate pairs → exact Jaccard verify.

    bands × rows = num_hashes; a pair collides if any band's signature
    slice matches exactly. Candidates are then verified with the exact
    token-set Jaccard, so output = true pairs ≥ threshold *among LSH
    candidates* (recall < 1 in theory; the gate fixture is verified to
    have 100% recall vs brute force — see tests)."""
    banded = minhash_banded(df, num_hashes, bands, id_col, text_col,
                            shingle_n)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
            .dropDuplicates(["id_a", "id_b"]))
    return verify_jaccard_pairs(cand, threshold)


SIMHASH_BITS = 60  # md5 15-hex prefix


def simhash_kernel(batches):
    """mapInPandas kernel: (id, tokens, hashes) → (id, simhash).

    Vectorized: unpack each token hash into 60 bits, weight ±1 by tf
    (duplicate tokens appear once per occurrence), sum per doc, sign →
    bit. The per-token hash comes pre-computed from the JVM (md5
    prefix) so the oracle can re-derive bits identically.
    """
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        out = np.zeros(len(ids), dtype=np.int64)
        hl = pdf["hashes"]
        lens = np.fromiter((len(h) for h in hl), dtype=np.int64,
                           count=len(ids))
        if lens.sum() > 0:
            flat = np.concatenate([np.asarray(h, dtype=np.int64)
                                   for h in hl if len(h)]).astype(np.uint64)
            doc_idx = np.repeat(np.arange(len(ids)), lens)
            shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
            bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            contrib = bits * 2 - 1          # ±1 per bit per token
            sums = np.zeros((len(ids), SIMHASH_BITS), dtype=np.int64)
            np.add.at(sums, doc_idx, contrib)
            bitvals = (sums > 0).astype(np.uint64)
            out = (bitvals << shifts).sum(axis=1).astype(np.int64)
        yield pd.DataFrame({"id": ids, "simhash": out})


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """60-bit SimHash per doc (tf-weighted, md5-based bit source)."""
    toks = tokens_insensitive(text_col)
    hashes = F.transform(toks, lambda x: F.conv(
        F.substring(F.md5(x), 1, 15), 16, 10).cast("long"))
    base = df.select(F.col(id_col).alias("id"), hashes.alias("hashes"))
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("simhash", T.LongType())])
    return base.mapInPandas(simhash_kernel, schema)


def simhash_near_pairs_bruteforce(df: DataFrame, max_hamming: int = 8,
                                  id_col: str = "doc_id",
                                  text_col: str = "text") -> DataFrame:
    """All-pairs SimHash Hamming ≤ max_hamming — O(n²) nested-loop
    join, ORACLE/verification scale only (like
    jaccard_pairs_bruteforce). The production path is
    :func:`simhash_near_pairs`."""
    sh = simhash(df, id_col, text_col)
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 8,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_chunks: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash Hamming ≤ max_hamming — BLOCKED
    (pigeonhole banding, the 10^9-doc path).

    Split the 60-bit simhash into ``n_chunks`` equal bit-chunks with
    ``n_chunks > max_hamming``: a pair within Hamming distance h can
    differ in at most h chunks, so with h < n_chunks at least one
    chunk matches EXACTLY (pigeonhole) — candidate generation is an
    equi-join on (chunk_index, chunk_value), a uniform shuffle key.
    Candidates are then verified with the exact 60-bit distance, so
    the output is identical to the brute-force all-pairs join
    (proved, not sampled — tested blocked ≡ brute).

    Default n_chunks = smallest divisor of 60 that exceeds
    max_hamming (e.g. max_hamming=4 → 5 chunks × 12 bits)."""
    if n_chunks is None:
        n_chunks = next(c for c in (2, 3, 4, 5, 6, 10, 12, 15, 20, 30, 60)
                        if c > max_hamming)
    if not (n_chunks > max_hamming and SIMHASH_BITS % n_chunks == 0):
        raise ValueError("n_chunks must divide 60 and exceed max_hamming")
    chunk_bits = SIMHASH_BITS // n_chunks
    mask = (1 << chunk_bits) - 1
    sh = simhash(df, id_col, text_col)
    entries = [F.struct(
        F.lit(i).alias("chunk"),
        F.shiftrightunsigned("simhash", i * chunk_bits)
         .bitwiseAND(F.lit(mask)).alias("key"))
        for i in range(n_chunks)]
    banded = (sh.select("id", "simhash",
                        F.explode(F.array(*entries)).alias("c"))
              .select("id", "simhash", "c.chunk", "c.key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.simhash").alias("ha"),
                    F.col("b.simhash").alias("hb"))
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold —
    all-pairs ORACLE path (O(n²), verification scale only). The
    production path is :func:`embedding_near_pairs_lsh`."""
    d = emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    a, b = d.alias("a"), d.alias("b")
    dot = F.aggregate(F.zip_with("a.v", "b.v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("a.v", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("b.v", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    # zero-vector guard: no direction => similarity 0.0, not an
    # ANSI DIVIDE_BY_ZERO (same convention as similarity._cos)
    cos = F.when((na * nb) == 0, F.lit(0.0)) \
           .otherwise(F.round(dot / (na * nb), 4))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def rademacher_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — exactly re-derivable in
    SQL (``md5('ep{p}|{d}')`` low bit), so the LSH path is
    algorithm-checkable cross-engine like the IVF ANN gate."""
    import hashlib
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(1, dim + 1):
            h = int(hashlib.md5(f"ep{p}|{d}".encode()).hexdigest()[:15], 16)
            row.append(1.0 if (h & 1) == 1 else -1.0)
        planes.append(row)
    return planes


def _hyperplane_bits_udf(planes: list[list[float]]):
    """Arrow-batched kernel computing the sign-bit signature —
    bit-identical to the previous JVM higher-order-function form
    (whose 32 interpreted aggregate(zip_with(...)) lambdas dominated
    the op's runtime). Exactness argument: plane entries are ±1.0, so
    the elementwise products are exact sign flips (no rounding), and
    ``np.add.accumulate`` is a left-to-right sequential float64 fold —
    the same addition order and rounding as ``F.aggregate``'s fold.
    A null/short vector yields bit 0 per plane, matching
    ``when(NULL >= 0)``'s otherwise-branch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)          # (n_planes, dim)
    n_planes, dim = P.shape

    @pandas_udf("array<int>")
    def bits(vs: pd.Series) -> pd.Series:
        out = []
        ok_rows, ok_idx = [], []
        for i, v in enumerate(vs):
            out.append([0] * n_planes)
            if v is not None and len(v) == dim:
                ok_rows.append(np.asarray(v, dtype=np.float64))
                ok_idx.append(i)
        if ok_rows:
            V = np.vstack(ok_rows)                    # (m, dim)
            B = np.empty((V.shape[0], n_planes), dtype=np.int64)
            for p in range(n_planes):
                prod = V * P[p]                       # exact (±1 planes)
                s = np.add.accumulate(prod, axis=1)[:, -1]
                B[:, p] = (s >= 0).astype(np.int64)
            for j, i in enumerate(ok_idx):
                out[i] = B[j].tolist()
        return pd.Series(out)

    return bits


def embedding_near_pairs_lsh(emb: DataFrame, threshold: float = 0.95,
                             dim: int = 64, n_planes: int = 32,
                             bands: int = 8, id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold — LSH-BUCKETED
    (random-hyperplane signatures, the 10^9-vector path).

    Sign of ⟨v, r_p⟩ for ``n_planes`` deterministic ±1 hyperplanes →
    bit signature; signatures band into ``bands`` groups of
    ``n_planes/bands`` bits; pairs sharing any band bucket become
    candidates (equi-join on (band, key) — uniform shuffle key, no
    all-pairs join); candidates verify with the exact cosine.
    Precision is exact; recall is the standard hyperplane-LSH
    tradeoff, high for the near-dup regime (cos ≥ 0.9 → bit-match
    p≈0.86, miss ≈ (1-p^4)^8 < 1%% at the defaults, vanishing with
    more bands). All arithmetic is sequential-fold double — the
    DuckDB oracle re-runs the identical algorithm and must hash-match
    (precision AND the candidate set are deterministic)."""
    rows = n_planes // bands
    assert rows * bands == n_planes
    d = emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    planes = rademacher_planes(n_planes, dim)
    sig = d.select("id", "v",
                   _hyperplane_bits_udf(planes)(F.col("v")).alias("bits"))
    banded = sig.select(
        "id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("", *[
                         F.element_at("bits", b * rows + r + 1).cast("string")
                         for r in range(rows)]).alias("key"))
            for b in range(bands)])).alias("bk"))
    banded = banded.select("id", "v", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
            .dropDuplicates(["id_a", "id_b"]))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    # zero-vector guard: no direction => similarity 0.0, not an
    # ANSI DIVIDE_BY_ZERO (same convention as similarity._cos)
    cos = F.when((na * nb) == 0, F.lit(0.0)) \
           .otherwise(F.round(dot / (na * nb), 4))
    return (cand.select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))
