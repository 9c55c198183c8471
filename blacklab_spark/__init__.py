"""blacklab_spark — a PySpark-native full-text index + BM25 engine.

A from-scratch re-expression of the capabilities of INL/BlackLab
(reference at /root/reference, Lucene-backed concordancer) as an
idiomatic PySpark engine over tables of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)``:

* SPIMI-style per-partition posting construction (``build.py``)
* shuffle merge into term-partitioned, delta-gap + varint posting
  blocks with per-block max-score metadata (``codec.py``, ``build.py``)
* block-max WAND top-k with Okapi BM25 k1=1.2 b=0.75 (``operators/wand.py``)
* role/tool indexed as filterable annotations (BlackLab's
  annotated-corpus model, see SURVEY.md §1.1)
* positional (phrase / sequence / within) queries over stored
  positions (``operators/phrase.py``)
* result-set ops: group/sort/sample/window/KWIC/collocations
  (``operators/hits.py``)

Everything is DataFrame-first; Python kernels are Arrow-batched
(``applyInPandas`` / ``mapInPandas``), never per-row Python UDFs.
"""

from blacklab_spark.config import BuildConfig, K1, B
from blacklab_spark.session import get_spark

__all__ = ["BuildConfig", "K1", "B", "get_spark"]
__version__ = "0.3.0"
