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


#: deterministic DEPREL cycle for the fixture's dependency tree
CONLLU_DEPRELS = ("nsubj", "obj", "det", "amod", "nmod")


def _conllu_head_deprel(f: int, s: int, j: int, n: int
                        ) -> tuple[str, str]:
    """Deterministic HEAD/DEPREL for content token ``j`` of the
    (f, s) fixture sentence with ``n`` content tokens: one root at
    r = (f+s) % n, every other token headed by the root with a
    cycled deprel; file 3 sentence 2 token 1 has HEAD '_'
    (unspecified — must be skipped by edge derivation)."""
    r = (f + s) % n
    if f == 3 and s == 2 and j == 1 and r != 1:
        return "_", "_"
    if j == r:
        return "0", "root"
    return str(r + 1), CONLLU_DEPRELS[(f + s + j) % len(CONLLU_DEPRELS)]


def gen_conllu_texts(seed: int = 42) -> dict[str, str]:
    """Deterministic CoNLL-U fixture: file name → file content.
    4 files × 3 sentence blocks; tokens drawn from CONLLU_BANK by
    index arithmetic (no RNG — the oracle re-parses the same strings
    in pure Python). Covers: ``# newdoc id`` and the filename
    fallback, speaker/ts comments, SpaceAfter=No, a multiword-token
    range line and an empty-node line (both must be skipped),
    trailing-period punctuation tokens, and a deterministic HEAD/
    DEPREL dependency tree (one root per sentence, flat edges to it,
    one '_' HEAD exercising the unspecified-skip path)."""
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
                head, deprel = _conllu_head_deprel(f, s, j, n)
                lines.append(f"{j + 1}\t{form}\t{lemma}\t{upos}\t_\t_"
                             f"\t{head}\t{deprel}\t_\t{misc}")
                if s == 1 and j == 0:
                    lines.append(f"{j + 1}.1\televen\televen\tNUM"
                                 "\t_\t_\t_\t_\t_\t_")
            lines.append(f"{n + 1}\t.\t.\tPUNCT\t_\t_"
                         f"\t{(f + s) % n + 1}\tpunct\t_\t_")
            lines.append("")
        files[f"file{f}.conllu"] = "\n".join(lines) + "\n"
    return files


def parse_conllu_texts(files: dict[str, str]) -> list[dict]:
    """Pure-Python reference parse of gen_conllu_texts output — the
    oracle's independent second implementation of read_conllu's JVM
    higher-order-function parse. Returns one dict per token position:
    conv_id, turn_idx, p, form, lemma (``_`` → form), upos,
    head (1-based int, 0 = root, None = unspecified), deprel."""
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
                head = (int(r[6]) if len(r) > 6 and r[6].isdigit()
                        else None)
                deprel = (r[7] if len(r) > 7 and r[7] != "_" else None)
                out.append({"conv_id": conv, "turn_idx": turn, "p": p,
                            "form": r[1], "lemma": lemma, "upos": upos,
                            "head": head, "deprel": deprel})
            turn += 1
    return out


#: token bank for the explicit-alignment parallel fixture
ALIGNED_BANK = ["the", "visa", "application", "was", "approved",
                "quickly", "today", "it", "is", "better"]


def gen_aligned_rows(seed: int = 42) -> list[dict]:
    """Deterministic parallel-corpus fixture with an EXPLICIT
    alignment-edge layer (the stored-artifact path of
    operators/parallel.py): 3 conversations × 4 turns; field b is the
    REVERSED source sentence with a ``b_`` marker, aligned by the
    reversal pairs (j ↔ n-1-j). The reversal is deliberately NOT the
    derived 2:1 fusion fallback — a gate passing over this fixture
    proves the stored edges (not the fallback) drove the projection.
    Pre-tokenized (tokens_s defines the token stream) so the oracle
    knows exact positions without re-tokenizing. One dict per turn:
    transcript columns + tokens_s, tokens_b, align_pairs
    [(src, tgt), ...]."""
    rows = []
    for c in range(3):
        for t in range(4):
            n = 4 + (c + t) % 3
            toks = [ALIGNED_BANK[(c * 5 + t * 3 + j + seed)
                                 % len(ALIGNED_BANK)]
                    for j in range(n)]
            tb = [f"b_{toks[n - 1 - j]}" for j in range(n)]
            rows.append({
                "conv_id": f"pconv{c:03d}", "turn_idx": t,
                "role": "user" if t % 2 == 0 else "assistant",
                "text": " ".join(toks), "tool": None,
                "ts_off": t,
                "tokens_s": toks, "tokens_b": tb,
                "align_pairs": [(j, n - 1 - j) for j in range(n)],
            })
    return rows


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


# -- CHAT (.cha) fixture + independent parse --------------------------
CHAT_BANK = ["are you okay", "yes I am very happy today",
             "look at the visa form", "we go to the bank now",
             "good job little one", "what did you say",
             "tell me more about it", "no more juice please"]
CHAT_SPEAKERS = ["MOT", "CHI", "INV"]


def gen_chat_texts(seed: int = 42) -> dict[str, str]:
    """Deterministic CHAT fixture: file name -> .cha content.
    3 files x 4 main-tier utterances by index arithmetic (no RNG).
    Covers: @PID and the filename-fallback conv id, @headers,
    %-dependent tiers (skipped), tab-indented continuation lines
    (re-joined), media bullets (stripped from text, start ms -> ts),
    and utterance terminators."""
    files = {}
    for f in range(3):
        lines = ["@UTF8"]
        if f != 1:  # file 1 exercises the filename-fallback conv id
            lines.append(f"@PID:\t{seed}-chat-{f}")
        lines.append("@Begin")
        lines.append("@Participants:\tCHI Target_Child, MOT Mother")
        for u in range(4):
            spk = CHAT_SPEAKERS[(f + u) % len(CHAT_SPEAKERS)]
            words = CHAT_BANK[(f * 5 + u * 3) % len(CHAT_BANK)]
            if u == 1:  # continuation line mid-utterance
                head, tail = words.rsplit(" ", 1)
                lines.append(f"*{spk}:\t{head}")
                lines.append(f"\t{tail} .")
            elif u == 2:  # media bullet
                ms = 1000 * (f * 10 + u)
                lines.append(f"*{spk}:\t{words} . "
                             f"\x15{ms}_{ms + 900}\x15")
            else:
                lines.append(f"*{spk}:\t{words} .")
            if u == 0:
                lines.append(f"%mor:\tskip|this tier|{f}")
        lines.append("@End")
        files[f"chat{f}.cha"] = "\n".join(lines) + "\n"
    return files


def parse_chat_texts(files: dict[str, str]) -> list[dict]:
    """Pure-Python reference parse of gen_chat_texts output — the
    oracle's independent second implementation of read_chat's JVM
    regexp parse. One dict per turn: conv_id, turn_idx, role, text,
    ts_ms (bullet start ms or None)."""
    import re as _re
    out = []
    for fname, content in sorted(files.items()):
        m = _re.search(r"(?m)^@PID:\s*(\S+)", content)
        conv = m.group(1) if m else _re.sub(r"\.cha$", "", fname)
        flat = _re.sub(r"\n[ \t]+", " ", content)
        turn = 0
        for line in flat.split("\n"):
            lm = _re.match(r"^\*([A-Za-z0-9]+):[ \t]*(\S.*)$", line)
            if not lm:
                continue
            utt = lm.group(2)
            bm = _re.search("\x15(\\d+)_\\d+\x15", utt)
            text = _re.sub(r"\s+", " ",
                           _re.sub("\x15[^\x15]*\x15", "", utt)).strip()
            out.append({"conv_id": conv, "turn_idx": turn,
                        "role": lm.group(1), "text": text,
                        "ts_ms": int(bm.group(1)) if bm else None})
            turn += 1
    return out


# -- FoLiA fixture + independent (ElementTree) parse ------------------
FOLIA_BANK = [("Cafés", "café", "NOUN"), ("are", "be", "VERB"),
              ("very", None, "ADV"), ("nice", "nice", "ADJ"),
              ("a &amp; b", "ab", None), ("visa", "visa", "NOUN"),
              ("granted", "grant", "VERB"), ("!", None, "PUNCT")]


def gen_folia_texts(seed: int = 42) -> dict[str, str]:
    """Deterministic FoLiA-ish fixture: file name -> XML content.
    2 files x 2 sentences; covers: root xml:id and the filename
    fallback, per-sentence speaker attr (and its absence),
    space="no", missing pos/lemma elements, and the &amp; entity.
    Generated without a namespace declaration so the ElementTree
    oracle parse stays prefix-free (read_folia ignores namespaces
    either way)."""
    files = {}
    for f in range(2):
        sents = []
        for s in range(2):
            n = 3 + (f + s) % 2
            ws = []
            for j in range(n):
                form, lemma, pos = FOLIA_BANK[(f * 5 + s * 3 + j)
                                              % len(FOLIA_BANK)]
                space = ' space="no"' if j == n - 2 else ""
                parts = [f"<t>{form}</t>"]
                if pos:
                    parts.append(f'<pos class="{pos}"/>')
                if lemma:
                    parts.append(f'<lemma class="{lemma}"/>')
                ws.append(f'<w xml:id="w.{f}.{s}.{j}"{space}>'
                          + "".join(parts) + "</w>")
            spk = ' speaker="spk0"' if s == 0 else ""
            sents.append(f'<s xml:id="s.{f}.{s}"{spk}>'
                         + "".join(ws) + "</s>")
        root_id = f' xml:id="fdoc{seed}{f}"' if f == 0 else ""
        body = "".join(sents)
        files[f"folia{f}.xml"] = (
            f'<?xml version="1.0"?>\n<FoLiA{root_id} version="2.0">'
            f"<text>{body}</text></FoLiA>\n")
    return files


def parse_folia_texts(files: dict[str, str]) -> list[dict]:
    """Independent reference parse of gen_folia_texts output via
    xml.etree (a genuinely different engine from read_folia's JVM
    regexes). One dict per token position: conv_id, turn_idx, p,
    form, pos ('_' when absent), lemma (surface form when absent),
    plus the reconstructed turn text (space="no" honored)."""
    import re as _re
    import xml.etree.ElementTree as ET
    out = []
    for fname, content in sorted(files.items()):
        root = ET.fromstring(content)
        conv = root.get("{http://www.w3.org/XML/1998/namespace}id") \
            or _re.sub(r"\.xml$", "", fname)
        for turn, s in enumerate(root.iter("s")):
            text = ""
            toks = []
            for p, w in enumerate(s.iter("w")):
                form = (w.find("t").text or "").strip()
                pos_el = w.find("pos")
                lem_el = w.find("lemma")
                toks.append({
                    "conv_id": conv, "turn_idx": turn, "p": p,
                    "form": form,
                    "pos": pos_el.get("class") if pos_el is not None
                    else "_",
                    "lemma": lem_el.get("class") if lem_el is not None
                    else form})
                text += form
                if w.get("space") != "no":
                    text += " "
            text = text.rstrip()
            for t in toks:
                t["text"] = text
            out.extend(toks)
    return out


# -- WPL / Frog / EAF / TCF / NAF fixtures + independent parses -------
# Each gen_*_texts is a deterministic file fixture; each parse_*_texts
# is the oracle's SECOND implementation (pure Python string handling
# for the tabular formats, xml.etree for the XML standoff formats —
# genuinely different engines from the readers' JVM regexp plans).
# All return one dict per token position: conv_id, turn_idx, p, form,
# pos ('_' when absent), lemma (surface form when absent), text (the
# reconstructed turn text).

def gen_wpl_texts(seed: int = 42) -> dict[str, str]:
    """Sketch-WPL fixture: 2 docs in one file (id attr + fallback),
    glue tags, inline structural tags, multi-sentence docs."""
    return {f"wpl{seed}.wpl": (
        f'<doc id="wd{seed}" src="news">\n'
        "<s>\nThe\tDET\tthe\nvisa\tNOUN\tvisa\n<g/>\n.\tPUNCT\t.\n</s>\n"
        "<s>\nGranted\tVERB\tgrant\nnow\tADV\tnow\n</s>\n"
        "</doc>\n"
        "<doc>\n<s>\nok\tINTJ\tok\n<g/>\n!\tPUNCT\t!\n</s>\n</doc>\n")}


def parse_wpl_texts(files: dict[str, str]) -> list[dict]:
    import re as _re
    out = []
    for fname, content in sorted(files.items()):
        base = _re.sub(r"\.(wpl|vert|tsv)$", "", fname)
        for didx, dm in enumerate(_re.finditer(
                r"(?s)<doc\b[^>]*>.*?</doc>", content)):
            doc = dm.group(0)
            idm = _re.search(r'^<doc\b[^>]*\bid\s*=\s*"([^"]*)"', doc)
            conv = idm.group(1) if idm else f"{base}-{didx}"
            for turn, sm in enumerate(_re.finditer(
                    r"(?s)<s\b[^>]*>.*?</s>", doc)):
                lines = [l.strip() for l in sm.group(0).split("\n")
                         if l.strip()]
                text, glue, toks = "", False, []
                for l in lines:
                    if l == "<g/>":
                        glue = True
                    elif l.startswith("<"):
                        continue
                    else:
                        cols = l.split("\t")
                        word = cols[0]
                        toks.append(
                            (word,
                             cols[1] if len(cols) > 1 else "_",
                             cols[2] if len(cols) > 2 else word))
                        text += ("" if glue or text == "" else " ") + word
                        glue = False
                for p, (form, pos, lemma) in enumerate(toks):
                    out.append({"conv_id": conv, "turn_idx": turn, "p": p,
                                "form": form, "pos": pos, "lemma": lemma,
                                "text": text})
    return out


def gen_frog_texts(seed: int = 42) -> dict[str, str]:
    """Frog TSV fixture: 2 files, blank-line sentence blocks, the
    reference's 10-column layout (word=2, lemma=3, pos=5)."""
    return {
        f"frog{seed}a.tsv": (
            "1\tDit\tdit\t[dit]\tVNW\t0.9\tO\tB-NP\t0\tROOT\n"
            "2\twerkt\twerken\t[werk]\tWW\t0.8\tO\tB-VP\t1\tsu\n\n"
            "1\tKlaar\tklaar\t[klaar]\tADJ\t0.7\tO\tB-AP\t0\tROOT\n"),
        f"frog{seed}b.tsv": (
            "1\tVisa\tvisa\t[visa]\tN\t0.9\tO\tB-NP\t0\tROOT\n"),
    }


def parse_frog_texts(files: dict[str, str]) -> list[dict]:
    import re as _re
    out = []
    for fname, content in sorted(files.items()):
        conv = _re.sub(r"\.(tsv|frog\.out)$", "", fname)
        turn = 0
        for blk in _re.split(r"\n[ \t]*\n", content):
            rows = [l.split("\t") for l in blk.split("\n")
                    if _re.match(r"^\d+\t", l)]
            if not rows:
                continue
            text = " ".join(r[1] for r in rows)
            for p, r in enumerate(rows):
                out.append({"conv_id": conv, "turn_idx": turn, "p": p,
                            "form": r[1],
                            "pos": r[4] if len(r) > 4 else "_",
                            "lemma": r[2] if len(r) > 2 else r[1],
                            "text": text})
            turn += 1
    return out


def _eaf_ann(aid, ref1, value):
    return ('<ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="%s" '
            'TIME_SLOT_REF1="%s" TIME_SLOT_REF2="tsX">'
            "<ANNOTATION_VALUE>%s</ANNOTATION_VALUE>"
            "</ALIGNABLE_ANNOTATION></ANNOTATION>" % (aid, ref1, value))


def _eaf_ref(aid, ref, value):
    return ('<ANNOTATION><REF_ANNOTATION ANNOTATION_ID="%s" '
            'ANNOTATION_REF="%s"><ANNOTATION_VALUE>%s'
            "</ANNOTATION_VALUE></REF_ANNOTATION></ANNOTATION>"
            % (aid, ref, value))


def gen_eaf_texts(seed: int = 42) -> dict[str, str]:
    """EAF fixture: two Words tiers (participants), TIME_ORDER slots,
    partial standoff Lemma/PoS coverage."""
    return {f"eaf{seed}.eaf": (
        '<?xml version="1.0"?>\n<ANNOTATION_DOCUMENT FORMAT="3.0">\n'
        "<TIME_ORDER>"
        '<TIME_SLOT TIME_SLOT_ID="ts1" TIME_VALUE="1500"/>'
        '<TIME_SLOT TIME_SLOT_ID="ts2" TIME_VALUE="2000"/>'
        '<TIME_SLOT TIME_SLOT_ID="ts3" TIME_VALUE="4200"/>'
        '<TIME_SLOT TIME_SLOT_ID="tsX" TIME_VALUE="9000"/>'
        "</TIME_ORDER>\n"
        '<TIER LINGUISTIC_TYPE_REF="Words" PARTICIPANT="spkA">'
        + _eaf_ann("a1", "ts1", "hello") + _eaf_ann("a2", "ts2", "world")
        + "</TIER>\n"
        '<TIER LINGUISTIC_TYPE_REF="Words" PARTICIPANT="spkB">'
        + _eaf_ann("a3", "ts3", "bye") + "</TIER>\n"
        '<TIER LINGUISTIC_TYPE_REF="Lemma">'
        + _eaf_ref("l1", "a1", "hello") + _eaf_ref("l2", "a2", "world")
        + "</TIER>\n"
        '<TIER LINGUISTIC_TYPE_REF="PoS">'
        + _eaf_ref("p1", "a1", "INTJ") + _eaf_ref("p3", "a3", "INTJ")
        + "</TIER>\n</ANNOTATION_DOCUMENT>\n")}


def parse_eaf_texts(files: dict[str, str]) -> list[dict]:
    import re as _re
    import xml.etree.ElementTree as ET
    out = []
    for fname, content in sorted(files.items()):
        conv = _re.sub(r"\.eaf$", "", fname)
        root = ET.fromstring(content)
        lem, pos = {}, {}
        for tier in root.iter("TIER"):
            kind = tier.get("LINGUISTIC_TYPE_REF")
            if kind in ("Lemma", "PoS"):
                tgt = lem if kind == "Lemma" else pos
                for ra in tier.iter("REF_ANNOTATION"):
                    tgt[ra.get("ANNOTATION_REF")] = \
                        ra.find("ANNOTATION_VALUE").text.strip()
        turn = 0
        for tier in root.iter("TIER"):
            if tier.get("LINGUISTIC_TYPE_REF") != "Words":
                continue
            anns = list(tier.iter("ALIGNABLE_ANNOTATION"))
            if not anns:
                continue
            text = " ".join(a.find("ANNOTATION_VALUE").text.strip()
                            for a in anns)
            for p, a in enumerate(anns):
                aid = a.get("ANNOTATION_ID")
                form = a.find("ANNOTATION_VALUE").text.strip()
                out.append({"conv_id": conv, "turn_idx": turn, "p": p,
                            "form": form, "pos": pos.get(aid, "_"),
                            "lemma": lem.get(aid, form), "text": text})
            turn += 1
    return out


def gen_tcf_texts(seed: int = 42) -> dict[str, str]:
    """TCF fixture: tokens/sentences/lemmas/POStags layers with a
    multi-token lemma reference and partial pos coverage."""
    return {f"tcf{seed}.tcf": (
        '<?xml version="1.0"?>\n<D-Spin><TextCorpus lang="en">\n'
        "<tokens>"
        '<token ID="t1">The</token><token ID="t2">visa</token>'
        '<token ID="t3">works</token><token ID="t4">Done</token>'
        "</tokens>\n"
        "<sentences>"
        '<sentence ID="s1" tokenIDs="t1 t2 t3"/>'
        '<sentence ID="s2" tokenIDs="t4"/>'
        "</sentences>\n"
        "<lemmas>"
        '<lemma ID="l1" tokenIDs="t1">the</lemma>'
        '<lemma ID="l2" tokenIDs="t2 t4">visa</lemma>'
        "</lemmas>\n"
        '<POStags tagset="upos">'
        '<tag ID="p1" tokenIDs="t2">NOUN</tag>'
        '<tag ID="p2" tokenIDs="t3">VERB</tag>'
        "</POStags>\n</TextCorpus></D-Spin>\n")}


def parse_tcf_texts(files: dict[str, str]) -> list[dict]:
    import re as _re
    import xml.etree.ElementTree as ET
    out = []
    for fname, content in sorted(files.items()):
        conv = _re.sub(r"\.(tcf|xml)$", "", fname)
        root = ET.fromstring(content)
        words = {t.get("ID"): t.text.strip() for t in root.iter("token")}
        lem, pos = {}, {}
        for el, tgt in (("lemma", lem), ("tag", pos)):
            for e in root.iter(el):
                for tid in e.get("tokenIDs", "").split():
                    tgt.setdefault(tid, e.text.strip())
        for turn, s in enumerate(root.iter("sentence")):
            ids = s.get("tokenIDs", "").split()
            if not ids:
                continue
            text = " ".join(words[i] for i in ids)
            for p, tid in enumerate(ids):
                out.append({"conv_id": conv, "turn_idx": turn, "p": p,
                            "form": words[tid],
                            "pos": pos.get(tid, "_"),
                            "lemma": lem.get(tid, words[tid]),
                            "text": text})
    return out


def gen_naf_texts(seed: int = 42) -> dict[str, str]:
    """NAF fixture: wf word forms with sent grouping, term layer with
    span targets, one untagged token."""
    return {f"naf{seed}.naf": (
        '<?xml version="1.0"?>\n<NAF version="3.0">\n<text>\n'
        '<wf id="w1" sent="1" offset="0" length="3">The</wf>\n'
        '<wf id="w2" sent="1" offset="4" length="4">visa</wf>\n'
        '<wf id="w3" sent="2" offset="9" length="4">Done</wf>\n'
        "</text>\n<terms>\n"
        '<term id="term1" lemma="the" pos="DET">'
        '<span><target id="w1"/></span></term>\n'
        '<term id="term2" lemma="visa" pos="NOUN">'
        '<span><target id="w2"/></span></term>\n'
        "</terms>\n</NAF>\n")}


def parse_naf_texts(files: dict[str, str]) -> list[dict]:
    import re as _re
    import xml.etree.ElementTree as ET
    out = []
    for fname, content in sorted(files.items()):
        conv = _re.sub(r"\.(naf|xml)$", "", fname)
        root = ET.fromstring(content)
        lem, pos = {}, {}
        for term in root.iter("term"):
            for tgt in term.iter("target"):
                lem.setdefault(tgt.get("id"), term.get("lemma"))
                pos.setdefault(tgt.get("id"), term.get("pos"))
        wfs = list(root.iter("wf"))
        sents = []
        for w in wfs:
            if w.get("sent") not in sents:
                sents.append(w.get("sent"))
        for turn, sent in enumerate(sents):
            ws = [w for w in wfs if w.get("sent") == sent]
            text = " ".join(w.text.strip() for w in ws)
            for p, w in enumerate(ws):
                wid = w.get("id")
                form = w.text.strip()
                out.append({"conv_id": conv, "turn_idx": turn, "p": p,
                            "form": form,
                            "pos": pos.get(wid) or "_",
                            "lemma": lem.get(wid) or form,
                            "text": text})
    return out
