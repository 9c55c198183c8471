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


#: (FORM, LEMMA, UPOS) bank for the CoNLL-U fixture. Lemmas genuinely
#: differ from surface forms (is/was→be, better→good) so the given-
#: lemma layer is distinguishable from any derived stem; '_' lemma
#: exercises the surface-form fallback; mixed case exercises the @i
#: fold of given forms.
CONLLU_BANK = [
    ("The", "the", "DET"), ("Visa", "visa", "NOUN"),
    ("application", "application", "NOUN"), ("is", "be", "AUX"),
    ("was", "be", "AUX"), ("approved", "approve", "VERB"),
    ("rejected", "reject", "VERB"), ("better", "good", "ADJ"),
    ("quickly", "_", "ADV"), ("café", "café", "NOUN"),
    ("it", "it", "PRON"), ("today", "_", "NOUN"),
]


def gen_conllu_texts(seed: int = 42) -> dict[str, str]:
    """Deterministic CoNLL-U fixture: file name → file content.
    4 files × 3 sentence blocks; tokens drawn from CONLLU_BANK by
    index arithmetic (no RNG — the oracle re-parses the same strings
    in pure Python). Covers: ``# newdoc id`` and the filename
    fallback, speaker/ts comments, SpaceAfter=No, a multiword-token
    range line and an empty-node line (both must be skipped), and
    trailing-period punctuation tokens."""
    files = {}
    for f in range(4):
        lines = []
        if f != 2:  # file 2 exercises the filename-fallback conv id
            lines.append(f"# newdoc id = cdoc{seed}{f}")
        for s in range(3):
            lines.append(f"# sent_id = {f}-{s}")
            lines.append("# speaker = %s" % ("user" if s % 2 == 0
                                             else "assistant"))
            lines.append(f"# ts = 2024-05-0{f + 1} 10:0{s}:00")
            n = 4 + (f + s) % 3
            toks = [CONLLU_BANK[(f * 7 + s * 3 + j) % len(CONLLU_BANK)]
                    for j in range(n)]
            if s == 1:  # skipped lines: multiword range + empty node
                lines.append("1-2\tcannot\t_\t_\t_\t_\t_\t_\t_\t_")
            for j, (form, lemma, upos) in enumerate(toks):
                misc = "SpaceAfter=No" if j == n - 1 else "_"
                lines.append(f"{j + 1}\t{form}\t{lemma}\t{upos}\t_\t_"
                             f"\t0\tdep\t_\t{misc}")
                if s == 1 and j == 0:
                    lines.append(f"{j + 1}.1\televen\televen\tNUM"
                                 "\t_\t_\t_\t_\t_\t_")
            lines.append(f"{n + 1}\t.\t.\tPUNCT\t_\t_\t0\tpunct\t_\t_")
            lines.append("")
        files[f"file{f}.conllu"] = "\n".join(lines) + "\n"
    return files


def parse_conllu_texts(files: dict[str, str]) -> list[dict]:
    """Pure-Python reference parse of gen_conllu_texts output — the
    oracle's independent second implementation of read_conllu's JVM
    higher-order-function parse. Returns one dict per token position:
    conv_id, turn_idx, p, form, lemma (``_`` → form), upos."""
    import re as _re
    out = []
    for fname, content in sorted(files.items()):
        m = _re.search(r"(?m)^# *newdoc id *= *(\S+)", content)
        conv = m.group(1) if m else _re.sub(r"\.conllu$", "", fname)
        turn = 0
        for blk in _re.split(r"\n[ \t]*\n", content):
            rows = [l.split("\t") for l in blk.split("\n")
                    if _re.match(r"^\d+\t", l)]
            if not rows:
                continue
            for p, r in enumerate(rows):
                lemma = r[2] if len(r) > 2 and r[2] != "_" else r[1]
                upos = r[3] if len(r) > 3 else "_"
                out.append({"conv_id": conv, "turn_idx": turn, "p": p,
                            "form": r[1], "lemma": lemma, "upos": upos})
            turn += 1
    return out


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
