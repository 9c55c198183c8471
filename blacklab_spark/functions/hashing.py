"""Cross-engine deterministic hashing primitives.

Everything that must be verifiable by the DuckDB oracle uses
md5-hex-prefix hashes: ``md5(s)`` produces identical hex in Spark
(JVM, ``F.md5``), DuckDB (``md5()``) and Python (``hashlib``), and a
15-hex-digit prefix (60 bits) fits a signed int64 in all three — so
MinHash signatures, SimHash bits and rolling fingerprints computed by
the engine can be re-derived independently by the oracle SQL.

All Spark-side hashing is JVM expressions (no Python in the hot
path); xxhash64 would be faster but is not available in DuckDB, and
the correctness gate outranks a constant factor here. Engine-internal
hashing that needs no oracle (e.g. IVF bucket salts) uses
``F.xxhash64``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

HEX_PREFIX = 15  # 60 bits < 2^63


def md5_long(col: Column, salt: str = "") -> Column:
    """First 15 hex digits of md5(salt || value) as signed int64 (JVM).

    DuckDB equivalent: ``('0x' || substr(md5(<salt> || x), 1, 15))::BIGINT``.
    """
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, HEX_PREFIX), 16, 10) \
            .cast("long")


def py_md5_long(value: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + value).encode()).hexdigest()[:HEX_PREFIX], 16)


def duckdb_md5_long(expr: str, salt: str = "") -> str:
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"('0x' || substr(md5({inner}), 1, {HEX_PREFIX}))::BIGINT"
