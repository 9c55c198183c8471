"""Frozen engine constants + build configuration.

BM25 parameters mirror Lucene's defaults (BM25Similarity k1=1.2,
b=0.75), which is what the reference effectively uses through its
IndexSearcher (see SURVEY.md preamble;
/root/reference/engine/src/main/java/nl/inl/blacklab/search/BlackLabIndexAbstract.java:521).
They are frozen at *build* time because per-block max-score metadata
bakes them in; ``index_meta.json`` records them.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

# Okapi BM25 parameters (Lucene defaults) — frozen.
K1: float = 1.2
B: float = 0.75

# Frozen tokenizer v1: lowercase + ascii alnum runs. Chosen so the
# exact same tokenization is expressible in Spark SQL
# (regexp_extract_all), DuckDB (oracle SQL) and pure Python (re) —
# the rank-identity gate depends on all three agreeing.
TOKEN_RE_INSENSITIVE: str = "[a-z0-9]+"
TOKEN_RE_SENSITIVE: str = "[A-Za-z0-9]+"
TOKENIZER_VERSION: str = "v1-ascii-alnum-lower"

# Storage schema version for the index artifacts.
INDEX_FORMAT_VERSION: int = 2


@dataclass(frozen=True)
class BuildConfig:
    """Configuration for one index build.

    doc-range bucketing: postings are grouped into buckets of
    ``bucket_size`` consecutive doc ids. A block never spans buckets.
    At query time all query terms' blocks for one bucket land in the
    same task (groupBy bucket), enabling document-at-a-time scoring
    without a per-doc shuffle — the bucket IS the salting unit, so a
    hot term ("the") spreads evenly over buckets instead of hitting
    one reducer (SURVEY.md §7 P3 skew handling).
    """

    k1: float = K1
    b: float = B
    # Max docs per posting block (per term within a bucket).
    block_size: int = 128
    # Docs per range bucket. 8192 ⇒ ~122M buckets at 10^12 turns;
    # each task reads a handful of buckets. Tunable per corpus.
    bucket_size: int = 8192
    # Store token positions in blocks (needed for phrase queries).
    store_positions: bool = True
    # Number of partitions for doc-id assignment / posting shuffle.
    # None → spark.sql.shuffle.partitions.
    num_partitions: int | None = None
    tokenizer_version: str = TOKENIZER_VERSION
    format_version: int = INDEX_FORMAT_VERSION

    def to_dict(self) -> dict:
        return asdict(self)
