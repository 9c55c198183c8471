"""Deterministic synthetic multi-turn transcript generator.

Mirrors the reference's integration-test corpus shape — 3 VOICE TEI
spoken-dialogue files of ``<u who=...>`` utterances
(reference: test/data/input/PBsve430.xml, 41/30/41 utterances; see
FIXTURES.md) — as the transcript table from ``BASELINE.json.input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``.

Determinism contract: each conversation is generated from
``np.random.default_rng(seed * 1_000_003 + conv_index)``, so the table
is reproducible row-for-row regardless of partitioning or cluster
size. The Spark path generates conversations *distributed* via
``mapInPandas`` over ``spark.range(n_convs)`` — no driver-side
materialization, scales to any corpus size.

Vocabulary is Zipfian with planted hot terms ("the", "a") and planted
phrases ("visa application", "very good") so phrase/sequence queries
have non-trivial answers — mirroring reference queries like
``"very" "good"`` (reference: test/test/hits.js:53,69-70).
"""

from __future__ import annotations

import datetime as _dt
import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

# Planted terms (head of the Zipf distribution / phrase material).
_SPECIAL = ["the", "a", "and", "you", "visa", "application", "very",
            "good", "search", "python", "please", "browser"]

_CONS = "bcdfghklmnprstvz"
_VOW = "aeiou"

FIXTURES = {
    # name: (n_convs, turns_spec, vocab_size)
    # micro: small enough to embed as a VALUES CTE in driver oracle SQL
    "micro": (3, [8, 8, 8], 50),
    "tiny": (3, [41, 30, 41], 300),
    "small": (200, (10, 80), 5000),
    "bench": (20000, (10, 100), 50000),
}

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)


def make_vocab(size: int) -> list[str]:
    """Deterministic synthetic vocabulary: special head + CV syllable
    words, unique by construction (base-80 digit encoding of the index)."""
    words = list(_SPECIAL)
    syll = ["".join(p) for p in itertools.product(_CONS, _VOW)]
    base = len(syll)
    special = set(_SPECIAL)
    i = 0
    while len(words) < size:
        n, parts = i, []
        while True:
            parts.append(syll[n % base])
            n //= base
            if n == 0:
                break
        w = "".join(parts)
        if w not in special:
            words.append(w)
        i += 1
    return words[:size]


def _zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** -1.07
    return p / p.sum()


def gen_conv(conv_index: int, seed: int, vocab: list[str], probs: np.ndarray,
             turns_spec) -> list[dict]:
    """Generate one conversation's turns (pure function of inputs)."""
    rng = np.random.default_rng(seed * 1_000_003 + conv_index)
    if isinstance(turns_spec, (list, tuple)) and not isinstance(turns_spec[0], int):
        raise ValueError("bad turns_spec")
    if isinstance(turns_spec, list):
        n_turns = turns_spec[conv_index % len(turns_spec)]
    else:
        lo, hi = turns_spec
        n_turns = int(rng.integers(lo, hi + 1))
    conv_id = f"conv{conv_index:05d}"
    base_ts = _EPOCH + _dt.timedelta(days=conv_index % 3650)
    rows = []
    varr = np.asarray(vocab, dtype=object)
    for t in range(n_turns):
        is_tool = t > 0 and rng.random() < 0.12
        if is_tool:
            role = "tool"
            tool = ["search", "python", "browser"][int(rng.integers(0, 3))]
        else:
            role = "user" if t % 2 == 0 else "assistant"
            tool = None
        n_words = int(rng.integers(5, 41))
        words = list(varr[rng.choice(len(varr), size=n_words, p=probs)])
        r = rng.random()
        if r < 0.08:
            at = int(rng.integers(0, n_words))
            words[at:at] = ["visa", "application"]
        elif r < 0.16:
            at = int(rng.integers(0, n_words))
            words[at:at] = ["very", "good"]
        rows.append({
            "conv_id": conv_id,
            "turn_idx": t,
            "role": role,
            "text": " ".join(words),
            "tool": tool,
            "ts": base_ts + _dt.timedelta(minutes=t),
        })
    return rows


# Multilingual vocabulary for the tokenizer-v2 gate fixture: Latin
# accents (folded by @i), Cyrillic, Greek, CJK — all single-quote-free
# so the table embeds in a VALUES CTE (driver_gate.multi_cte).
MULTI_VOCAB = [
    "Café", "café", "cafe", "Über", "über", "uber", "naïve", "naive",
    "ÉLAN", "élan", "très", "bon", "łódź", "Łódź", "São", "Paulo",
    "Ästhetik", "asthetik", "привет", "мир", "Привет", "спасибо",
    "ελληνικά", "καλά", "Ελληνικά", "日本語", "東京", "visa",
    "application", "very", "good", "the", "and", "data", "Visum",
]


def gen_multilingual_pandas(seed: int = 42) -> pd.DataFrame:
    """Deterministic multilingual transcript fixture (3 convs × 6
    turns) over MULTI_VOCAB — exercises tokenizer v2: case folding
    across scripts, Latin accent folding, CJK runs. Same row contract
    as the other fixtures."""
    probs = np.full(len(MULTI_VOCAB), 1.0 / len(MULTI_VOCAB))
    rows = []
    for c in range(3):
        rows.extend(gen_conv(c, seed, MULTI_VOCAB, probs, [6, 6, 6]))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def gen_transcripts_pandas(fixture: str = "tiny", seed: int = 42) -> pd.DataFrame:
    """Driver-side generation (tests / oracle). Deterministic."""
    n_convs, turns_spec, vocab_size = FIXTURES[fixture]
    vocab = make_vocab(vocab_size)
    probs = _zipf_probs(len(vocab))
    rows = []
    for c in range(n_convs):
        rows.extend(gen_conv(c, seed, vocab, probs, turns_spec))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def tag_markup(text: str) -> str:
    """Deterministic inline markup over one text: sentence tags every
    5 words, named-entity tags on visa/application, a self-closing
    ``<br/>`` after the first sentence — the tagged-corpus fixture
    transform (pure string function, shared verbatim by the oracle
    CTE so both sides see identical markup)."""
    words = text.split()
    sents = []
    for i in range(0, len(words), 5):
        chunk = [f'<ne type="doc">{w}</ne>' if w == "visa"
                 else f'<ne type="act">{w}</ne>' if w == "application"
                 else w for w in words[i:i + 5]]
        sents.append("<s>" + " ".join(chunk) + "</s>")
        if i == 0:
            sents.append("<br/>")
    return " ".join(sents)


def gen_tagged_pandas(seed: int = 42) -> pd.DataFrame:
    """The micro fixture with deterministic well-nested inline markup
    (tag_markup) — the tags-layer gate corpus. Tag-stripping recovers
    exactly the micro token stream."""
    df = gen_transcripts_pandas("micro", seed=seed)
    df = df.copy()
    df["text"] = df["text"].map(tag_markup)
    return df


def gen_transcripts_spark(spark: SparkSession, fixture: str = "tiny",
                          seed: int = 42, n_convs: int | None = None,
                          partitions: int | None = None) -> DataFrame:
    """Distributed generation: one task generates a slice of conversations.

    Identical rows to :func:`gen_transcripts_pandas` (same per-conv RNG),
    but never materializes the corpus on the driver — this is how the
    bench corpus is produced at scale.
    """
    f_convs, turns_spec, vocab_size = FIXTURES[fixture]
    n = n_convs or f_convs
    parts = partitions or max(1, min(n, int(spark.conf.get("spark.sql.shuffle.partitions"))))
    conv_ids = spark.range(0, n, 1, parts)

    def gen(batches):
        vocab = make_vocab(vocab_size)
        probs = _zipf_probs(len(vocab))
        for pdf in batches:
            out = []
            for c in pdf["id"].tolist():
                out.extend(gen_conv(int(c), seed, vocab, probs, turns_spec))
            if out:
                o = pd.DataFrame(out)
                o["turn_idx"] = o["turn_idx"].astype("int32")
                yield o

    return conv_ids.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
