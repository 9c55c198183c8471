"""Driver gate, part 2: training-data pipeline ops + DuckDB oracles.

Same discipline as driver_gate.py: every Spark query has an
independent SQL re-derivation (cross-engine md5-prefix hashing, see
functions/hashing.py), integer/rounded arithmetic, rounded-order
cuts. The IVF ANN query is oracle-checked by re-running the *same
deterministic algorithm* in SQL — not a weaker rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.functions import chunking as K
from blacklab_spark.functions.hashing import duckdb_md5_long
from blacklab_spark.functions import curation as C
from blacklab_spark.functions import dedup as D
from blacklab_spark.functions import multimodal as M
from blacklab_spark.functions import similarity as S
from blacklab_spark.functions import textstats as X

H15 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def R4(num: str, den: str) -> str:
    """Integer round-half-up of num/den to 4dp — mirrors
    functions.textstats.rational_round4 (see its docstring)."""
    return (f"(((20000 * ({num}) + ({den})) // (2 * ({den})))::DOUBLE"
            f" / 10000.0)")

from blacklab_spark.tokenizer import duckdb_tokens_i

_SHINGLES = (
    f"stoks AS (SELECT doc_id, {duckdb_tokens_i('text')} "
    "AS ts FROM documents),\n"
    "tsets AS (SELECT doc_id, list_distinct(list_transform("
    "generate_series(1, greatest(0, len(ts) - 2)), "
    "i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM stoks)")
_TOKS = (f"toks AS (SELECT doc_id, {duckdb_tokens_i('text')} AS ts "
         "FROM documents)")

JACCARD_T = 0.5   # planted near-dup pairs sit at 0.9-0.99; next-highest < 0.1
SIMHASH_T = 4
EMB_QUERY_ID = 7
NEAR_COS_T = 0.45
DECON_N = 8       # decontamination n-gram width
DECON_MOD = 97    # benchmark set = docs with doc_id % DECON_MOD == 0
SAMPLE_RATES = {"en": 300, "de": 500}   # permille per stratum
CHUNK_MAX, CHUNK_OVERLAP = 64, 16       # chunk window / overlap
PACK_CAP, PACK_GROUPS = 256, 8          # packing bin capacity / groups
N_SHARDS = 8                            # dataloader shards
MIX_WEIGHTS = {"en": 400, "de": 150, "es": 200, "fr": 150, "zh": 100}
MIX_BUDGET = 15_000                     # token budget (binds at sf0.01)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def pipeline_queries() -> dict:
    def dedup_exact(spark, sf_dir):
        return D.exact_dedup(_docs(spark, sf_dir))

    def jaccard_pairs(spark, sf_dir):
        return D.jaccard_pairs_bruteforce(_docs(spark, sf_dir), JACCARD_T)

    def minhash_lsh(spark, sf_dir):
        return D.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=JACCARD_T)

    def streaming_dedup(spark, sf_dir):
        """Incremental streaming MinHash-LSH dedup
        (streaming/dedup.py): the documents table arrives in three
        micro-batches; each batch joins the LSH bucket state of the
        prior batches. The union of emitted pairs must equal the
        offline all-pairs result — so the brute-force Jaccard SQL is
        the oracle (LSH ≡ brute on this corpus, test_pipeline.py)."""
        import os
        import tempfile

        from blacklab_spark.streaming.dedup import (dedup_pairs,
                                                    stream_dedup)
        work = tempfile.mkdtemp(prefix="stream_dedup_gate_")
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        src = os.path.join(work, "src")
        os.makedirs(src)
        n = docs.agg(F.max("doc_id")).collect()[0][0]
        cuts = [(0, n // 3), (n // 3 + 1, 2 * n // 3),
                (2 * n // 3 + 1, n)]
        for i, (lo, hi) in enumerate(cuts):
            (docs.filter((F.col("doc_id") >= lo)
                         & (F.col("doc_id") <= hi))
             .coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(src, f"f{i}.parquet")))
            q = stream_dedup(spark, src + "/*",
                             os.path.join(work, "state"),
                             os.path.join(work, "out"),
                             os.path.join(work, "ckpt"),
                             schema="doc_id long, text string",
                             threshold=JACCARD_T)
            q.awaitTermination()
        return dedup_pairs(spark, os.path.join(work, "out")) \
            .select("id_a", "id_b", "jaccard")

    def simhash_pairs(spark, sf_dir):
        return D.simhash_near_pairs(_docs(spark, sf_dir),
                                    max_hamming=SIMHASH_T)

    def dedup_clusters(spark, sf_dir):
        """LSH pairs → duplicate clusters (min-label connected
        components, functions/clustering.py); the recursive-CTE
        oracle re-derives reachability over the same pair graph."""
        from blacklab_spark.functions.clustering import \
            duplicate_clusters
        docs = _docs(spark, sf_dir)
        pairs = D.minhash_lsh_pairs(docs, threshold=JACCARD_T)
        return duplicate_clusters(docs, pairs)

    def dedup_keep_canonical(spark, sf_dir):
        """The deduplicated corpus: one canonical doc per cluster."""
        from blacklab_spark.functions.clustering import (
            duplicate_clusters, keep_canonical)
        from blacklab_spark.functions.hashing import md5_long
        docs = _docs(spark, sf_dir)
        clusters = duplicate_clusters(
            docs, D.minhash_lsh_pairs(docs, threshold=JACCARD_T))
        return (keep_canonical(docs, clusters)
                .select("doc_id", md5_long(F.col("text"))
                        .alias("digest")))

    def embedding_topk(spark, sf_dir):
        return S.cosine_topk(_emb(spark, sf_dir), EMB_QUERY_ID, k=10)

    def embedding_topk_ivf(spark, sf_dir):
        return S.ivf_topk(_emb(spark, sf_dir), EMB_QUERY_ID, k=10,
                          k_centroids=16, nprobe=2)

    def embedding_near_pairs(spark, sf_dir):
        return D.embedding_near_pairs(_emb(spark, sf_dir), NEAR_COS_T)

    def embedding_near_pairs_lsh(spark, sf_dir):
        return D.embedding_near_pairs_lsh(_emb(spark, sf_dir), NEAR_COS_T,
                                          dim=64, n_planes=32, bands=8)

    def langid(spark, sf_dir):
        return X.language_id(_docs(spark, sf_dir))

    def quality(spark, sf_dir):
        return X.quality_score(_docs(spark, sf_dir))

    def tokstats(spark, sf_dir):
        return X.token_stats(_docs(spark, sf_dir))

    def fp(spark, sf_dir):
        return X.fingerprint(_docs(spark, sf_dir))

    def mm_features(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return M.byte_features(M.media_from_documents(docs))

    def mm_decode_image(spark, sf_dir):
        """REAL image decode (round 5): deterministic P6 PPM payloads
        synthesized from (doc_id, len(text)) are parsed by the pure-
        numpy decoder; the oracle states width/height/mean from the
        synthesis formula without any decoder — matching proves the
        format bytes round-trip."""
        docs = _docs(spark, sf_dir)
        media = M.synth_media_from_documents(docs, "image")
        return M.decode_images(media)

    def mm_decode_audio(spark, sf_dir):
        """REAL WAV decode (round 5): RIFF/PCM payloads synthesized
        from (doc_id, len(text)); the numpy chunk-walker recovers
        sample_rate / n_samples / duration / peak."""
        docs = _docs(spark, sf_dir)
        media = M.synth_media_from_documents(docs, "audio")
        return M.decode_audio(media)

    def mm_audio_frames(spark, sf_dir):
        """Frame-level features over decoded samples (20 ms windows):
        fan-out + per-frame peak; oracle derives frame count and
        tail-frame length from the synthesis formulas."""
        docs = _docs(spark, sf_dir)
        media = M.synth_media_from_documents(docs, "audio")
        return M.audio_frame_features(media, frame_ms=20)

    def decontaminate(spark, sf_dir):
        """Benchmark = every DECON_MOD-th doc (stands in for an eval
        set; the corpus's planted near-dups of those docs surface as
        contaminated rows, which is exactly the production failure
        mode the op exists to catch)."""
        docs = _docs(spark, sf_dir)
        bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
        return C.decontaminate(docs, bench, n=DECON_N)

    def redact_pii(spark, sf_dir):
        """The corpus carries no PII, so the gate plants a
        deterministic email/IP/card suffix on every 7th doc (the SQL
        oracle builds the identical text expression) and checks
        counts + the md5 of the redacted text."""
        docs = _docs(spark, sf_dir)
        planted = docs.withColumn("text", F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.concat(
                F.lit(" contact admin"), F.col("doc_id").cast("string"),
                F.lit("@example.org from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1 card 4111111111111111")))
             .otherwise(F.lit(""))))
        return C.redact_pii(planted)

    def stratified_sample(spark, sf_dir):
        return C.stratified_sample(_docs(spark, sf_dir), SAMPLE_RATES)

    def repetition_ratio(spark, sf_dir):
        return C.repetition_ratio(_docs(spark, sf_dir), n=3)

    def chunk_docs(spark, sf_dir):
        return K.chunk_documents(_docs(spark, sf_dir),
                                 max_tokens=CHUNK_MAX,
                                 overlap=CHUNK_OVERLAP)

    def pack_seqs(spark, sf_dir):
        return K.pack_sequences(_docs(spark, sf_dir), cap=PACK_CAP,
                                n_groups=PACK_GROUPS)

    def shard_docs(spark, sf_dir):
        return K.shard_corpus(_docs(spark, sf_dir), n_shards=N_SHARDS)

    def mixture(spark, sf_dir):
        return C.mixture_sample(_docs(spark, sf_dir), MIX_WEIGHTS,
                                budget_tokens=MIX_BUDGET)

    def events_sessionize(spark, sf_dir):
        """Native Catalyst session windows over the events table —
        the batch dual of streaming/sessions.py's stateful operator
        (the stream side is pinned row-identical to this mechanism in
        test_streaming; this gate pins the mechanism itself against
        an independent lag/cumsum SQL sessionization). Timestamps
        exported as epoch micros, value as integer cents — exact
        cross-engine values."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        cents = F.round(F.col("value") * 100).cast("long")
        return (ev.groupBy("user_id",
                           F.session_window("ts", "2 hours"))
                .agg(F.count("*").alias("n_events"),
                     F.sum(cents).alias("value_cents"),
                     F.min("ts").alias("first_ts"),
                     F.max("ts").alias("last_ts"))
                .select("user_id", "n_events", "value_cents",
                        # ts is TIMESTAMP_NTZ; session tz is pinned
                        # UTC (session.py), so the cast is the
                        # identity DuckDB's epoch_us applies to the
                        # same naive value
                        F.unix_micros(F.col("first_ts")
                                      .cast("timestamp"))
                        .alias("first_us"),
                        F.unix_micros(F.col("last_ts")
                                      .cast("timestamp"))
                        .alias("last_us")))

    return {
        "dedup_exact": dedup_exact,
        "dedup_jaccard_pairs": jaccard_pairs,
        "dedup_minhash_lsh": minhash_lsh,
        "dedup_streaming_lsh": streaming_dedup,
        "dedup_simhash_pairs": simhash_pairs,
        "dedup_clusters": dedup_clusters,
        "dedup_keep_canonical": dedup_keep_canonical,
        "embedding_cosine_topk": embedding_topk,
        "embedding_cosine_topk_ivf": embedding_topk_ivf,
        "embedding_near_pairs": embedding_near_pairs,
        "embedding_near_pairs_lsh": embedding_near_pairs_lsh,
        "text_language_id": langid,
        "text_quality_score": quality,
        "text_token_stats": tokstats,
        "text_fingerprint": fp,
        "text_repetition_ratio": repetition_ratio,
        "multimodal_byte_features": mm_features,
        "multimodal_decode_image": mm_decode_image,
        "multimodal_decode_audio": mm_decode_audio,
        "multimodal_audio_frames": mm_audio_frames,
        "curation_decontaminate": decontaminate,
        "curation_redact_pii": redact_pii,
        "curation_stratified_sample": stratified_sample,
        "sequence_chunk_documents": chunk_docs,
        "sequence_pack_greedy": pack_seqs,
        "sequence_shard_corpus": shard_docs,
        "curation_mixture_sample": mixture,
        "events_sessionize": events_sessionize,
    }


def _jaccard_sql(threshold: float) -> str:
    return f"""
WITH {_SHINGLES}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {R4("len(list_intersect(a.s, b.s))",
           "len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
FROM tsets a JOIN tsets b ON a.doc_id < b.doc_id
WHERE {R4("len(list_intersect(a.s, b.s))",
          "len(list_distinct(list_concat(a.s, b.s)))")} >= {threshold}
"""


def _cos_expr(a: str, b: str) -> str:
    return (f"list_inner_product({a}, {b}) / "
            f"(sqrt(list_inner_product({a}, {a})) * "
            f"sqrt(list_inner_product({b}, {b})))")


def _emb_topk_sql(query_id: int, k: int) -> str:
    cos = _cos_expr("e.v", "q.v")
    return f"""
WITH ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v FROM ed WHERE vec_id = {query_id}),
scored AS (SELECT e.vec_id, round({cos}, 4) AS cosine
           FROM ed e CROSS JOIN q WHERE e.vec_id != {query_id}),
topk AS (SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT {k})
SELECT CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank,
       vec_id, cosine FROM topk
"""


def _emb_ivf_sql(query_id: int, k: int, k_centroids: int,
                 nprobe: int) -> str:
    return f"""
WITH ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv FROM ed
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {k_centroids}),
assign_all AS (
  SELECT e.vec_id AS id, e.v, c.cid,
         round({_cos_expr('e.v', 'c.cv')}, 6) AS sim,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({_cos_expr('e.v', 'c.cv')}, 6) DESC,
                                     c.cid) AS rn
  FROM ed e CROSS JOIN cents c),
assigned AS (SELECT id, v, cid FROM assign_all WHERE rn = 1),
q AS (SELECT v FROM ed WHERE vec_id = {query_id}),
probe AS (SELECT c.cid FROM cents c CROSS JOIN q
          ORDER BY round({_cos_expr('c.cv', 'q.v')}, 6) DESC, c.cid
          LIMIT {nprobe}),
cand AS (SELECT a.id, a.v FROM assigned a JOIN probe USING (cid)
         WHERE a.id != {query_id}),
scored AS (SELECT c.id AS vec_id, round({_cos_expr('c.v', 'q.v')}, 4) AS cosine
           FROM cand c CROSS JOIN q),
topk AS (SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT {k})
SELECT CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank,
       vec_id, cosine FROM topk
"""


def _emb_lsh_pairs_sql(threshold: float, dim: int, n_planes: int,
                       bands: int) -> str:
    """Re-runs the identical hyperplane-LSH algorithm (md5-derived
    ±1 planes, banding, exact verify) — the candidate set itself is
    deterministic and value-checked, like the IVF oracle."""
    rows = n_planes // bands
    cos = _cos_expr("ea.v", "eb.v")
    return f"""
WITH ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (
  SELECT pp.p,
         list_transform(generate_series(1, {dim}), d ->
           CASE WHEN (('0x' || substr(md5('ep' || pp.p || '|' || d), 1, 15))::BIGINT
                      & 1) = 1 THEN 1.0 ELSE -1.0 END) AS r
  FROM (SELECT unnest(generate_series(0, {n_planes - 1})) AS p) pp),
sigs AS (SELECT e.vec_id, p.p,
                CASE WHEN list_inner_product(e.v, p.r) >= 0
                     THEN 1 ELSE 0 END AS bit
         FROM ed e CROSS JOIN planes p),
bandkeys AS (SELECT vec_id, p // {rows} AS band,
                    string_agg(bit::VARCHAR, '' ORDER BY p) AS key
             FROM sigs GROUP BY vec_id, p // {rows}),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM bandkeys a JOIN bandkeys b
           ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b, round({cos}, 4) AS cosine
FROM cand c JOIN ed ea ON ea.vec_id = c.id_a
            JOIN ed eb ON eb.vec_id = c.id_b
WHERE round({cos}, 4) >= {threshold}
"""


def _cluster_ctes() -> str:
    """Shared CTE chain for the clustering oracles: Jaccard pairs at
    the gate threshold → symmetric edges → recursive reachability
    (``reach(id, r)``: label r reaches doc id). min(r) per id is the
    component's minimum doc id — exactly duplicate_clusters' output."""
    jac = R4("len(list_intersect(a.s, b.s))",
             "len(list_distinct(list_concat(a.s, b.s)))")
    return f"""{_SHINGLES},
jp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       FROM tsets a JOIN tsets b ON a.doc_id < b.doc_id
       WHERE {jac} >= {JACCARD_T}),
edges AS (SELECT id_a AS u, id_b AS v FROM jp
          UNION ALL SELECT id_b, id_a FROM jp),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id)"""


def pipeline_oracles() -> dict[str, str]:
    sw = ", ".join(f"'{w}'" for w in X.EN_STOPWORDS)
    tok_h = H15.format(x="t")
    oracles = {
        "dedup_exact": f"""
SELECT {H15.format(x='text')} AS digest, min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM documents GROUP BY 1
""",
        "dedup_jaccard_pairs": _jaccard_sql(JACCARD_T),
        # LSH + exact-verify equals brute force on this corpus (100%
        # recall verified in tests) → same oracle as brute force.
        "dedup_minhash_lsh": _jaccard_sql(JACCARD_T),
        "dedup_streaming_lsh": _jaccard_sql(JACCARD_T),
        "dedup_clusters": f"""
WITH RECURSIVE {_cluster_ctes()}
SELECT id AS doc_id, min(r) AS cluster_id,
       CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS INT)
         AS is_canonical
FROM reach GROUP BY id
""",
        "dedup_keep_canonical": f"""
WITH RECURSIVE {_cluster_ctes()},
cl AS (SELECT id, min(r) AS cid FROM reach GROUP BY id)
SELECT d.doc_id, {H15.format(x='d.text')} AS digest
FROM documents d JOIN cl ON cl.id = d.doc_id AND cl.cid = d.doc_id
""",
        "dedup_simhash_pairs": f"""
WITH {_TOKS},
occ AS (SELECT doc_id, unnest(ts) AS t FROM toks),
occ_h AS (SELECT doc_id, {tok_h} AS h FROM occ),
bits AS (SELECT doc_id, g.bit,
                sum(CASE WHEN (h >> g.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
         FROM occ_h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) g
         GROUP BY doc_id, g.bit),
sh AS (SELECT doc_id,
              sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
              AS simhash
       FROM bits GROUP BY doc_id),
base AS (SELECT d.doc_id, coalesce(sh.simhash, 0) AS simhash
         FROM documents d LEFT JOIN sh USING (doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM base a JOIN base b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_T}
""",
        "embedding_cosine_topk": _emb_topk_sql(EMB_QUERY_ID, 10),
        "embedding_cosine_topk_ivf": _emb_ivf_sql(EMB_QUERY_ID, 10, 16, 2),
        "embedding_near_pairs_lsh": _emb_lsh_pairs_sql(NEAR_COS_T, 64, 32, 8),
        "embedding_near_pairs": f"""
WITH ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos_expr('a.v', 'b.v')}, 4) AS cosine
FROM ed a JOIN ed b ON a.vec_id < b.vec_id
WHERE round({_cos_expr('a.v', 'b.v')}, 4) >= {NEAR_COS_T}
""",
        "text_language_id": f"""
WITH {_TOKS},
r AS (SELECT doc_id, len(ts) AS n,
             len(list_filter(ts, t -> t IN ({sw}))) AS swc
      FROM toks)
SELECT doc_id,
       CASE WHEN n > 0 THEN {R4("swc", "n")} ELSE 0.0 END AS sw_ratio,
       CASE WHEN swc * 100 >= n * 8 THEN 'en' ELSE 'other' END AS pred_lang
FROM r
""",
        "text_quality_score": f"""
WITH {_TOKS},
m AS (SELECT doc_id, len(ts) AS n,
             coalesce(list_sum(list_transform(ts, t -> strlen(t))), 0)
               AS sum_len,
             len(list_filter(ts, t -> t IN ({sw}))) AS swc
      FROM toks)
SELECT doc_id, CAST(n AS INT) AS n_tokens,
       CASE WHEN n > 0 THEN {R4("sum_len", "n")} ELSE 0.0 END
         AS mean_token_len,
       CASE WHEN n > 0 THEN {R4("swc", "n")} ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n > 0 THEN
         {R4("least(n, 200) * n + 200 * least(5 * swc, n)", "400 * n")}
       ELSE 0.0 END AS quality
FROM m
""",
        "text_token_stats": """
SELECT doc_id,
       CAST(CASE WHEN strlen(trim(text)) > 0
                 THEN len(string_split_regex(trim(text), '\\s+'))
                 ELSE 0 END AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))
            AS INT) AS bpe_tokens
FROM documents
""",
        "text_fingerprint": f"""
WITH {_TOKS},
h AS (SELECT doc_id,
             list_transform(ts, t -> {tok_h} % {X.FP_MOD}) AS hs
      FROM toks)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, hs),
                   (a, b) -> (a * {X.FP_MULT} + b) % {X.FP_MOD}) AS fingerprint
FROM h
""",
        "multimodal_byte_features": """
SELECT doc_id AS media_id, CAST(strlen(text) AS INT) AS n_bytes,
       md5(text) AS digest,
       CAST(CASE WHEN strlen(text) > 0 THEN ascii(substr(text, 1, 1))
                 ELSE NULL END AS INT) AS head_byte
FROM documents
""",
        # decode gates: the oracle re-derives the decoded metadata
        # straight from the synthesis formulas (multimodal.synth_*) —
        # no decoder on the oracle side, so a hash match proves the
        # engine's byte-level parse recovers exactly the planted
        # values. NOTE: length(text) (characters) on both sides.
        "multimodal_decode_image": """
SELECT doc_id AS media_id,
       CAST((length(text) % 13) + 2 AS INT) AS width,
       CAST((doc_id % 5) + 2 AS INT) AS height,
       'RGB' AS mode,
       CAST(doc_id % 251 AS INT) AS mean_byte
FROM documents
""",
        "multimodal_decode_audio": """
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
       CAST(160 + (length(text) % 40) * 4 AS INT) AS n_samples,
       CAST((160 + (length(text) % 40) * 4) * 1000
            // (8000 + (doc_id % 3) * 4000) AS INT) AS duration_ms,
       CAST((doc_id % 1000) + 1 AS INT) AS peak
FROM documents
""",
        # 20ms frames: flen = rate // 50 samples; nf = ceil(n/flen);
        # constant-amp synth → every frame's peak = amp
        "multimodal_audio_frames": """
WITH p AS (SELECT doc_id AS media_id,
                  (8000 + (doc_id % 3) * 4000) // 50 AS flen,
                  160 + (length(text) % 40) * 4 AS n,
                  (doc_id % 1000) + 1 AS amp
           FROM documents),
f AS (SELECT media_id, flen, n, amp,
             unnest(generate_series(0, (n + flen - 1) // flen - 1))
                 AS i
      FROM p)
SELECT media_id, CAST(i AS INT) AS frame_idx,
       CAST(least(flen, n - i * flen) AS INT) AS n_in_frame,
       CAST(amp AS INT) AS peak
FROM f
""",
        "text_repetition_ratio": f"""
WITH {_TOKS},
g AS (SELECT doc_id,
             list_transform(generate_series(1, greatest(0, len(ts) - 2)),
                            i -> array_to_string(list_slice(ts, i, i + 2),
                                                 ' ')) AS sh
      FROM toks)
SELECT doc_id, CAST(len(sh) AS INT) AS n_ngrams,
       CAST(len(list_distinct(sh)) AS INT) AS n_distinct,
       CASE WHEN len(sh) > 0
            THEN {R4("len(sh) - len(list_distinct(sh))", "len(sh)")}
            ELSE 0.0 END AS dup_ratio
FROM g
""",
        "curation_decontaminate": f"""
WITH {_TOKS},
sh AS (SELECT doc_id,
              list_distinct(list_transform(
                generate_series(1, greatest(0, len(ts) - {DECON_N - 1})),
                i -> array_to_string(list_slice(ts, i, i + {DECON_N - 1}),
                                     ' '))) AS s
       FROM toks),
bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh
          WHERE doc_id % {DECON_MOD} = 0),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
hits AS (SELECT ex.doc_id, count(*) AS n
         FROM ex JOIN bench USING (shingle) GROUP BY ex.doc_id)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS INT) AS n_contaminated_ngrams,
       CAST(CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END AS INT)
         AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
        "curation_redact_pii": f"""
WITH p AS (SELECT doc_id,
  text || CASE WHEN doc_id % 7 = 0
               THEN ' contact admin' || doc_id || '@example.org from 10.0.'
                    || (doc_id % 256) || '.1 card 4111111111111111'
               ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{C.PII_PATTERNS[0][1]}')) AS INT)
    AS n_email,
  CAST(len(regexp_extract_all(text, '{C.PII_PATTERNS[1][1]}')) AS INT)
    AS n_ipv4,
  CAST(len(regexp_extract_all(text, '{C.PII_PATTERNS[2][1]}')) AS INT)
    AS n_card,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
        '{C.PII_PATTERNS[0][1]}', '{C.PII_PATTERNS[0][2]}', 'g'),
        '{C.PII_PATTERNS[1][1]}', '{C.PII_PATTERNS[1][2]}', 'g'),
        '{C.PII_PATTERNS[2][1]}', '{C.PII_PATTERNS[2][2]}', 'g'))
    AS redacted_digest
FROM p
""",
        "curation_stratified_sample": f"""
WITH b AS (SELECT doc_id, lang,
                  CAST((('0x' || substr(md5('{C.SAMPLE_SALT}' || doc_id),
                                        1, 15))::BIGINT
                        % {C.SAMPLE_DENOM}) AS INT) AS bucket
           FROM documents)
SELECT doc_id, lang AS stratum, bucket FROM b
WHERE (lang = 'en' AND bucket < {SAMPLE_RATES['en']})
   OR (lang = 'de' AND bucket < {SAMPLE_RATES['de']})
""",
        # lag/cumsum sessionization — an independent mechanism from
        # Spark's session_window (gap >= 2h starts a new session,
        # matching session_window's half-open [start, start+gap))
        "events_sessionize": """
WITH o AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL '2 hours' THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents,
       epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
FROM s GROUP BY user_id, sid
""",
        "sequence_chunk_documents": K.chunk_documents_sql(
            CHUNK_MAX, CHUNK_MAX - CHUNK_OVERLAP,
            duckdb_tokens_i("text")),
        "sequence_pack_greedy": K.pack_sequences_sql(
            PACK_CAP, PACK_GROUPS, duckdb_tokens_i("text"),
            duckdb_md5_long),
        "sequence_shard_corpus": K.shard_corpus_sql(
            N_SHARDS, duckdb_md5_long),
        "curation_mixture_sample": C.mixture_sample_sql(
            MIX_WEIGHTS, MIX_BUDGET, duckdb_tokens_i("text"),
            duckdb_md5_long),
    }
    return oracles
