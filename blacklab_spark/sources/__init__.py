from blacklab_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    gen_transcripts_pandas,
    gen_transcripts_spark,
    FIXTURES,
)
from blacklab_spark.sources.documents import documents_as_transcripts

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "gen_transcripts_pandas",
    "gen_transcripts_spark",
    "FIXTURES",
    "documents_as_transcripts",
]
