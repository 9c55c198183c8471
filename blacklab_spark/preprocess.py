"""Convert-and-tag preprocessing plugin registry.

The reference exposes pluggable pre-index hooks that convert an input
document and run a tagger over it before indexing (reference:
engine/src/main/java/nl/inl/blacklab/indexers/preprocess/ConvertPlugin.java,
TagPlugin.java, DocIndexerConvertAndTag.java:40-120; the
/root/reference/convert-and-tag module wires OpenConvert + a tagger
webservice).  The Spark-first analog is a registry of named
DataFrame → DataFrame transforms run over the *transcripts input*
before stage 1 of the build (``BuildConfig.preprocess=("name", ...)``).

A preprocessor typically populates the pre-annotated token layers
(``tokens_s`` plus ``tokens_pos``/``tokens_lemma``) — the build's
pre-annotated input mode then stores them as given, exactly as if the
corpus had arrived tagged (the functional contract of the reference's
TagPlugin).  Transforms must be pure column expressions / DataFrame
ops; they run inside the build's lineage, so Catalyst fuses them into
the stage-1 scan — a registered tagger costs one projection, not a
separate pass.

Names (not callables) go in BuildConfig so the manifest stays
JSON-serializable and a resumed build re-resolves the same transform.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REGISTRY: dict[str, Callable[[DataFrame], DataFrame]] = {}


def register_preprocessor(
        name: str,
        fn: Callable[[DataFrame], DataFrame] | None = None):
    """Register ``fn`` under ``name`` (also usable as a decorator).
    Re-registering a name overwrites it — latest wins, mirroring the
    reference's plugin-id resolution."""
    if fn is None:
        def deco(f: Callable[[DataFrame], DataFrame]):
            _REGISTRY[name] = f
            return f
        return deco
    _REGISTRY[name] = fn
    return fn


def get_preprocessor(name: str) -> Callable[[DataFrame], DataFrame]:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown preprocessor {name!r}; registered: "
            f"{sorted(_REGISTRY)} (register_preprocessor to add)"
        ) from None


def apply_preprocessors(df: DataFrame, names) -> DataFrame:
    """Apply the named transforms in order (the reference chains
    convert → tag the same way)."""
    for name in names:
        df = get_preprocessor(name)(df)
    return df


# -- built-in toy tagger ---------------------------------------------
# A deterministic, SQL-expressible tagger used by tests and the driver
# gate: pos = 'long' when the token's @i folding exceeds 4 chars,
# else 'short'.  Real deployments register their own transform (e.g.
# a broadcast-dictionary POS lookup or a pandas-UDF model tagger).

@register_preprocessor("length_tagger")
def length_tagger(df: DataFrame) -> DataFrame:
    from blacklab_spark.tokenizer import fold_insensitive, tokens_sensitive
    toks = tokens_sensitive("text")
    return (df.withColumn("tokens_s", toks)
              .withColumn(
                  "tokens_pos",
                  F.transform(
                      F.col("tokens_s"),
                      lambda t: F.when(
                          F.length(fold_insensitive(t)) > 4,
                          F.lit("long")).otherwise(F.lit("short")))))
