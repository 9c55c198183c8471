"""File-format sources for the transcript table — the engine's
input-format surface (reference: 16 ``DocIndexer`` input formats,
engine/src/main/resources/formats/*.blf.yaml, SURVEY.md §2.C "Source
scan"). Columnar world needs only a handful: parquet (native),
JSON-lines and CSV with the DECLARED transcript schema (schema is
declared, not inferred — the reference freezes its input-format
config the same way, ConfigInputFormat.java).

Every reader returns the canonical ``TRANSCRIPT_SCHEMA`` frame (extra
columns dropped, required columns verified) so ``build_index`` accepts
any of them interchangeably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.sources.transcripts import TRANSCRIPT_SCHEMA

_REQUIRED = [f.name for f in TRANSCRIPT_SCHEMA.fields]


def _canonicalize(df: DataFrame) -> DataFrame:
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"transcript source is missing columns: {missing}")
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return _canonicalize(spark.read.parquet(path))


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines with the declared schema — no schema inference pass
    (an extra full read at 100 TB)."""
    return _canonicalize(spark.read.schema(TRANSCRIPT_SCHEMA).json(path))


def read_csv(spark: SparkSession, path: str, header: bool = True,
             sep: str = ",") -> DataFrame:
    return _canonicalize(
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("header", str(header).lower()).option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path))


def read_tsv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Tab-separated variant (reference ships a dedicated ``tsv``
    input format, formats/tsv.blf.yaml)."""
    return read_csv(spark, path, header=header, sep="\t")


# One <turn ...>...</turn> element, non-greedy across newlines. Turn
# elements must not nest (the per-format element path contract of the
# reference's configurable DocIndexers); inline markup INSIDE a turn
# is preserved and indexed by a tags=True build.
_TURN_RE = r"(?s)<turn\b[^>]*>.*?</turn>"
_CONV_ID_RE = r'(?s)<conversation\b[^>]*\bid\s*=\s*"([^"]*)"'


def _xml_attr(col, name: str):
    """Value of attribute ``name`` on the element's opening tag, NULL
    when absent (empty string never occurs in our contract)."""
    return F.nullif(
        F.regexp_extract(col, r'(?s)^<turn\b[^>]*\b%s\s*=\s*"([^"]*)"'
                         % name, 1),
        F.lit(""))


def read_xml(spark: SparkSession, path: str) -> DataFrame:
    """TEI-ish XML transcripts: one file per conversation
    (``<conversation id="...">`` root), one ``<turn role=".."
    ts=".." [tool=".."]>`` element per turn, inline markup allowed
    inside turns (indexed as the ``_spans`` tag layer when built with
    ``BuildConfig(tags=True)``). The reference's closest analogs are
    its TEI/FoLiA DocIndexers (formats/tei.blf.yaml); like them the
    input must be well-formed and the element path is fixed by the
    format config. Extraction is wholetext read + JVM ``regexp``
    projections — no Python, no XML library, no shuffle; one file =
    one task unit, so 100 TB of files parallelizes by file count."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    conv_id = F.coalesce(
        F.nullif(F.regexp_extract("value", _CONV_ID_RE, 1), F.lit("")),
        F.regexp_extract("_file", r"([^/]+?)(?:\.xml)?$", 1))
    turns = files.select(
        conv_id.alias("conv_id"),
        F.posexplode(F.regexp_extract_all(
            "value", F.lit(_TURN_RE), 0)).alias("turn_idx", "_turn"))
    body = F.trim(F.regexp_replace(
        "_turn", r"(?s)^<turn\b[^>]*>|</turn>$", ""))
    return _canonicalize(turns.select(
        "conv_id", "turn_idx",
        _xml_attr(F.col("_turn"), "role").alias("role"),
        body.alias("text"),
        _xml_attr(F.col("_turn"), "tool").alias("tool"),
        F.to_timestamp(_xml_attr(F.col("_turn"), "ts")).alias("ts")))


def read_plaintext(spark: SparkSession, path: str) -> DataFrame:
    """Plain-text transcripts — the reference's most basic input
    format (``text/plain`` DocIndexer, formats/txt.blf.yaml: one file
    = one document, no metadata). One ``.txt`` file = one
    conversation (conv id from the file name); blank-line-separated
    paragraphs = turns, roles alternating user/assistant (plain text
    carries no speaker axis — deterministic so rebuilds are
    identical); ``ts`` is a synthetic per-turn timestamp for the same
    reason as read_conllu. Wholetext read + JVM split — one file per
    task, parallel by file count."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    return (files.select(
        F.regexp_extract("_file", r"([^/]+?)(?:\.txt)?$", 1)
        .alias("conv_id"),
        F.posexplode(F.filter(
            F.transform(F.split("value", r"\n[ \t]*\n"),
                        lambda b: F.trim(b)),
            lambda b: b != "")).alias("turn_idx", "text"))
        .select(
            "conv_id", "turn_idx",
            F.when(F.col("turn_idx") % 2 == 0, "user")
            .otherwise("assistant").alias("role"),
            # NB Spark trim() strips spaces only, so collapse all
            # whitespace first, then trim the space remnants
            F.trim(F.regexp_replace("text", r"\s+", " ")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(946684800)
                                + F.col("turn_idx")).alias("ts")))


# -- CoNLL-U: pre-tokenized + pre-annotated input ---------------------
# Columns a source may provide to make the build PRE-ANNOTATED: the
# input then DEFINES the token stream (never re-tokenized from text)
# and its pos/lemma layers are stored as given instead of derived.
# This is the reference's primary real-world mode — indexing corpora
# that arrive tagged (formats/conll-u.blf.yaml: word=col2, lemma=col3,
# pos=col4; voice-tei.blf.yaml indexes word/lemma/pos the same way).
PRETOKENIZED_COLUMNS = ("tokens_s", "tokens_pos", "tokens_lemma")


def read_conllu(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL-U transcripts: one file per conversation, one sentence
    block per turn (reference: formats/conll-u.blf.yaml — the same
    column mapping: FORM=2 → word, LEMMA=3 → lemma, UPOS=4 → pos).

    Parsing is wholetext read + JVM higher-order functions (split /
    filter / transform / aggregate) — no Python, no XML/CoNLL library,
    no shuffle; one file = one task, so a 100 TB corpus parallelizes
    by file count. Multiword-token ranges (``1-2``) and empty nodes
    (``1.1``) are skipped like the reference does (plain-integer ID
    lines only). ``text`` is reconstructed honoring ``SpaceAfter=No``;
    per-turn metadata comes from sentence-level comments
    (``# speaker =``, ``# tool =``, ``# ts =``); ``ts`` falls back to
    a deterministic per-turn timestamp when absent (CoNLL-U carries no
    time axis, but the transcript schema requires one)."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    conv_id = F.coalesce(
        F.nullif(F.regexp_extract(
            "value", r"(?m)^# *newdoc id *= *(\S+)", 1), F.lit("")),
        F.regexp_extract("_file", r"([^/]+?)(?:\.conllu)?$", 1))
    blocks = files.select(
        conv_id.alias("conv_id"),
        F.posexplode(F.filter(
            F.split("value", r"\n[ \t]*\n"),
            # a turn is a block with ≥1 plain-integer-ID token line
            lambda b: b.rlike(r"(?m)^\d+\t"))).alias("turn_idx", "_blk"))

    fields = F.filter(
        F.transform(F.split("_blk", "\n"), lambda l: F.split(l, "\t")),
        lambda a: F.element_at(a, 1).rlike(r"^\d+$"))
    form = lambda a: F.element_at(a, 2)            # noqa: E731
    lemma = lambda a: F.try_element_at(a, F.lit(3))  # noqa: E731
    upos = lambda a: F.try_element_at(a, F.lit(4))   # noqa: E731
    head = lambda a: F.try_element_at(a, F.lit(7))   # noqa: E731
    deprel = lambda a: F.try_element_at(a, F.lit(8))  # noqa: E731
    misc = lambda a: F.try_element_at(a, F.lit(10))  # noqa: E731

    def comment(key: str):
        return F.nullif(F.regexp_extract(
            "_blk", r"(?m)^# *%s *= *(.*\S)" % key, 1), F.lit(""))

    text = F.rtrim(F.aggregate(
        F.col("_t"), F.lit(""),
        lambda acc, a: F.concat(
            acc, form(a),
            F.when(F.coalesce(misc(a), F.lit(""))
                   .contains("SpaceAfter=No"), F.lit(""))
            .otherwise(F.lit(" ")))))
    # LEMMA '_' (unspecified) falls back to the surface form; the
    # layer is single-valued here (array per position = the engine's
    # multi-value layout with one stacked value)
    lemma_vals = F.transform(
        F.col("_t"),
        lambda a: F.array(F.coalesce(F.nullif(lemma(a), F.lit("_")),
                                     form(a))))
    out = (blocks.withColumn("_t", fields)
           .select(
               "conv_id", "turn_idx",
               comment("speaker").alias("role"),
               text.alias("text"),
               comment("tool").alias("tool"),
               F.coalesce(
                   F.to_timestamp(comment("ts")),
                   F.timestamp_seconds(F.lit(946684800)
                                       + F.col("turn_idx"))).alias("ts"),
               F.transform(F.col("_t"), form).alias("tokens_s"),
               F.transform(
                   F.col("_t"),
                   lambda a: F.coalesce(upos(a), F.lit("_")))
               .alias("tokens_pos"),
               lemma_vals.alias("tokens_lemma"),
               # HEAD (col 7, 1-based token id, 0 = root) + DEPREL
               # (col 8) — the real dependency layer (reference
               # formats/conll-u.blf.yaml relation columns; build
               # stage 'relations' turns these into the stored
               # _relations edge artifact). '_' / non-numeric HEAD →
               # null (unspecified, skipped by edge derivation).
               F.transform(
                   F.col("_t"),
                   lambda a: F.nullif(head(a), F.lit("_"))
                   .try_cast("int")).alias("tokens_head"),
               F.transform(
                   F.col("_t"),
                   lambda a: F.nullif(F.coalesce(deprel(a), F.lit("_")),
                                      F.lit("_"))).alias("tokens_deprel")))
    return out


_CHAT_BULLET = "\x15"   # NAK delimits CHAT media bullets: •start_end•


def read_chat(spark: SparkSession, path: str) -> DataFrame:
    """CHAT (CHILDES) transcripts — the reference's dedicated
    conversation format (formats/chat.blf.yaml, DocIndexerChat): one
    ``.cha`` file = one conversation; each main tier line
    ``*SPK:<tab>utterance`` = one turn with the speaker code as the
    role. ``@``-headers and ``%``-dependent tiers are skipped (the
    reference indexes only the main tier's words); continuation lines
    (leading whitespace) re-join their utterance. Media bullets
    ``\\x15start_end\\x15`` are stripped from the text but their start
    millisecond becomes the turn timestamp when present (CHAT's only
    time axis); otherwise ts falls back to a deterministic per-turn
    value. Wholetext read + JVM regexp projections — one file per
    task, parallel by file count."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    conv_id = F.coalesce(
        F.nullif(F.regexp_extract(
            "value", r"(?m)^@PID:\s*(\S+)", 1), F.lit("")),
        F.regexp_extract("_file", r"([^/]+?)(?:\.cha)?$", 1))
    # continuation lines (tab/space-indented) re-join their tier line
    flat = F.regexp_replace("value", r"\n[ \t]+", " ")
    utts = files.select(
        conv_id.alias("conv_id"),
        F.posexplode(F.regexp_extract_all(
            flat, F.lit(r"(?m)^\*[A-Za-z0-9]+:[ \t]*\S.*$"), 0))
        .alias("turn_idx", "_utt"))
    speaker = F.regexp_extract("_utt", r"^\*([A-Za-z0-9]+):", 1)
    bullet_ms = F.nullif(F.regexp_extract(
        "_utt", _CHAT_BULLET + r"(\d+)_\d+" + _CHAT_BULLET, 1),
        F.lit("")).cast("long")
    body = F.trim(F.regexp_replace(F.regexp_replace(
        F.regexp_replace("_utt", r"^\*[A-Za-z0-9]+:[ \t]*", ""),
        _CHAT_BULLET + "[^" + _CHAT_BULLET + "]*" + _CHAT_BULLET, ""),
        r"\s+", " "))
    return _canonicalize(utts.select(
        "conv_id", "turn_idx", speaker.alias("role"), body.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.coalesce(
            F.timestamp_millis(F.lit(946684800000) + bullet_ms),
            F.timestamp_seconds(F.lit(946684800) + F.col("turn_idx")))
        .alias("ts")))


def _xml_unescape(col):
    """The five predefined XML entities (the only ones our wellformed-
    input contract allows in token text)."""
    pairs = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&")]   # &amp; last
    for ent, ch in pairs:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def read_folia(spark: SparkSession, path: str) -> DataFrame:
    """FoLiA transcripts — the reference's pre-annotated linguistic
    XML format (formats/folia.blf.yaml: wordPath ``//w``, word =
    ``t`` text, lemma = ``lemma/@class``, pos = ``pos/@class``). One
    file = one conversation (id from the ``FoLiA`` root's ``xml:id``,
    else the file name); one ``<s>`` element = one turn (an optional
    ``speaker`` attribute on ``<s>`` becomes the role). Returns the
    PRE-ANNOTATED columns (tokens_s/tokens_pos/tokens_lemma) so
    build_index takes the pre-tokenized path — the token stream and
    its layers are the input's, exactly like read_conllu. ``text``
    honors FoLiA's ``space="no"`` word attribute. Wholetext read +
    JVM regexp/array projections — one file per task."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    conv_id = F.coalesce(
        F.nullif(F.regexp_extract(
            "value", r'(?s)<FoLiA\b[^>]*\bxml:id\s*=\s*"([^"]*)"', 1),
            F.lit("")),
        F.regexp_extract("_file", r"([^/]+?)(?:\.xml)?$", 1))
    sents = files.select(
        conv_id.alias("conv_id"),
        F.posexplode(F.regexp_extract_all(
            "value", F.lit(r"(?s)<s\b[^>]*>.*?</s>"), 0))
        .alias("turn_idx", "_s"))
    words = F.regexp_extract_all("_s", F.lit(r"(?s)<w\b[^>]*>.*?</w>"), 0)

    def _form(w):
        return _xml_unescape(F.regexp_extract(
            w, r"(?s)<t(?:\s[^>]*)?>\s*(.*?)\s*</t>", 1))

    def _cls(w, tag: str):
        return F.nullif(F.regexp_extract(
            w, r'(?s)<%s\b[^>]*\bclass\s*=\s*"([^"]*)"' % tag, 1),
            F.lit(""))

    text = F.rtrim(F.aggregate(
        F.col("_w"), F.lit(""),
        lambda acc, w: F.concat(
            acc, _form(w),
            F.when(w.rlike(r'<w\b[^>]*\bspace\s*=\s*"no"'), F.lit(""))
            .otherwise(F.lit(" ")))))
    out = (sents.withColumn("_w", words)
           .filter(F.size("_w") > 0)
           .select(
               "conv_id", "turn_idx",
               F.nullif(F.regexp_extract(
                   "_s", r'(?s)^<s\b[^>]*\bspeaker\s*=\s*"([^"]*)"', 1),
                   F.lit("")).alias("role"),
               text.alias("text"),
               F.lit(None).cast("string").alias("tool"),
               F.timestamp_seconds(F.lit(946684800)
                                   + F.col("turn_idx")).alias("ts"),
               F.transform(F.col("_w"), _form).alias("tokens_s"),
               F.transform(F.col("_w"),
                           lambda w: F.coalesce(_cls(w, "pos"), F.lit("_")))
               .alias("tokens_pos"),
               F.transform(F.col("_w"),
                           lambda w: F.array(F.coalesce(
                               _xml_unescape(_cls(w, "lemma")), _form(w))))
               .alias("tokens_lemma")))
    return out


def read_wpl(spark: SparkSession, path: str) -> DataFrame:
    """Sketch Engine WPL (word-per-line) input — the reference's
    tabular format with inline tags (formats/sketch-wpl.blf.yaml:
    word=col1, pos=col2, lemma=col3, ``documentPath: doc``,
    glueTags). ``<doc ...>`` elements (attrs ``id`` → conv id, else
    file name + element index) contain ``<s>`` sentence elements =
    turns; non-tag lines are token rows; the glue tag ``<g/>``
    suppresses the space before the next token in the reconstructed
    text (inline tags other than g are structural and skipped here).
    Pre-annotated columns returned → pre-tokenized build. Wholetext +
    JVM regexp/aggregate projections; one file per task."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    fname = F.regexp_extract("_file", r"([^/]+?)(?:\.(?:wpl|vert|tsv))?$", 1)
    docs = files.select(
        fname.alias("_fname"),
        F.posexplode(F.regexp_extract_all(
            "value", F.lit(r"(?s)<doc\b[^>]*>.*?</doc>"), 0))
        .alias("_didx", "_doc"))
    conv_id = F.coalesce(
        F.nullif(F.regexp_extract(
            "_doc", r'(?s)^<doc\b[^>]*\bid\s*=\s*"([^"]*)"', 1), F.lit("")),
        F.concat("_fname", F.lit("-"), F.col("_didx").cast("string")))
    sents = docs.select(
        conv_id.alias("conv_id"),
        F.posexplode(F.regexp_extract_all(
            "_doc", F.lit(r"(?s)<s\b[^>]*>.*?</s>"), 0))
        .alias("turn_idx", "_s"))
    # token rows: lines not starting with '<'; columns word/pos/lemma
    rows = F.filter(
        F.transform(F.split("_s", "\n"), lambda l: F.trim(l)),
        lambda l: (l != "") & ~l.startswith("<"))
    col = lambda a, i: F.try_element_at(F.split(a, "\t"), F.lit(i))  # noqa: E731
    # glue-aware text: fold over ALL lines, '<g/>' arms no-space
    lines = F.filter(F.transform(F.split("_s", "\n"),
                                 lambda l: F.trim(l)),
                     lambda l: l != "")
    acc0 = F.struct(F.lit("").alias("txt"), F.lit(False).alias("glue"))
    step = lambda acc, l: F.when(  # noqa: E731
        l == "<g/>",
        F.struct(acc["txt"].alias("txt"), F.lit(True).alias("glue"))) \
        .when(l.startswith("<"), acc) \
        .otherwise(F.struct(
            F.concat(acc["txt"],
                     F.when(acc["glue"] | (acc["txt"] == ""), F.lit(""))
                      .otherwise(F.lit(" ")),
                     col(l, 1)).alias("txt"),
            F.lit(False).alias("glue")))
    text = F.aggregate(lines, acc0, step)["txt"]
    out = (sents.withColumn("_t", rows)
           .filter(F.size("_t") > 0)
           .select(
               "conv_id", "turn_idx",
               F.lit(None).cast("string").alias("role"),
               text.alias("text"),
               F.lit(None).cast("string").alias("tool"),
               F.timestamp_seconds(F.lit(946684800)
                                   + F.col("turn_idx")).alias("ts"),
               F.transform(F.col("_t"), lambda a: col(a, 1))
               .alias("tokens_s"),
               F.transform(F.col("_t"),
                           lambda a: F.coalesce(col(a, 2), F.lit("_")))
               .alias("tokens_pos"),
               F.transform(F.col("_t"),
                           lambda a: F.array(F.coalesce(col(a, 3),
                                                        col(a, 1))))
               .alias("tokens_lemma")))
    return out


def read_frog(spark: SparkSession, path: str) -> DataFrame:
    """Frog tagger TSV — the reference's tsv-frog.blf.yaml mapping
    (word=col2, lemma=col3, pos=col5; no header). One file = one
    conversation (file name → conv id); blank-line-separated token
    blocks = turns. Pre-annotated columns returned. Wholetext + JVM
    higher-order functions; one file per task."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    blocks = files.select(
        F.regexp_extract("_file", r"([^/]+?)(?:\.(?:tsv|frog\.out))?$", 1)
        .alias("conv_id"),
        F.posexplode(F.filter(
            F.split("value", r"\n[ \t]*\n"),
            lambda b: b.rlike(r"(?m)^\d+\t"))).alias("turn_idx", "_blk"))
    fields = F.filter(
        F.transform(F.split("_blk", "\n"), lambda l: F.split(l, "\t")),
        lambda a: F.element_at(a, 1).rlike(r"^\d+$"))
    word = lambda a: F.element_at(a, 2)                 # noqa: E731
    lemma = lambda a: F.try_element_at(a, F.lit(3))     # noqa: E731
    pos = lambda a: F.try_element_at(a, F.lit(5))       # noqa: E731
    out = (blocks.withColumn("_t", fields)
           .filter(F.size("_t") > 0)
           .select(
               "conv_id", "turn_idx",
               F.lit(None).cast("string").alias("role"),
               F.concat_ws(" ", F.transform(F.col("_t"), word))
               .alias("text"),
               F.lit(None).cast("string").alias("tool"),
               F.timestamp_seconds(F.lit(946684800)
                                   + F.col("turn_idx")).alias("ts"),
               F.transform(F.col("_t"), word).alias("tokens_s"),
               F.transform(F.col("_t"),
                           lambda a: F.coalesce(pos(a), F.lit("_")))
               .alias("tokens_pos"),
               F.transform(F.col("_t"),
                           lambda a: F.array(F.coalesce(lemma(a),
                                                        word(a))))
               .alias("tokens_lemma")))
    return out


def read_eaf(spark: SparkSession, path: str) -> DataFrame:
    """EAF (ELAN Annotation Format) — the reference's time-aligned
    standoff format (formats/eaf.blf.yaml: word tier
    ``LINGUISTIC_TYPE_REF='Words'`` of ALIGNABLE_ANNOTATIONs; Lemma /
    PoS tiers of REF_ANNOTATIONs joined on ``@ANNOTATION_REF`` —
    standoffAnnotations). One ``.eaf`` file = one conversation; one
    Words TIER = one turn (its ``PARTICIPANT`` attr → role), tokens
    in tier order. The TIME_ORDER slot table resolves each tier's
    first TIME_SLOT_REF1 to milliseconds → the turn ``ts`` (EAF is
    the one reference format with a real time axis). Standoff lemma /
    pos lookups are JVM map_from_entries maps keyed by annotation id.
    Pre-annotated columns returned. Wholetext + regexp/map
    projections; one file per task."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())

    def _attr_map(tier_type: str):
        """ANNOTATION_REF → ANNOTATION_VALUE map for a standoff
        REF_ANNOTATION tier of the given LINGUISTIC_TYPE_REF."""
        tier = F.regexp_extract(
            "value",
            r"(?s)<TIER\b[^>]*LINGUISTIC_TYPE_REF=\"%s\"[^>]*>.*?</TIER>"
            % tier_type, 0)
        refs = F.regexp_extract_all(
            tier, F.lit(r"(?s)<REF_ANNOTATION\b[^>]*>.*?</REF_ANNOTATION>"),
            0)
        ent = lambda r: F.struct(  # noqa: E731
            F.regexp_extract(r, r'ANNOTATION_REF="([^"]*)"', 1).alias("k"),
            _xml_unescape(F.regexp_extract(
                r, r"(?s)<ANNOTATION_VALUE>\s*(.*?)\s*</ANNOTATION_VALUE>",
                1)).alias("v"))
        return F.map_from_entries(F.transform(refs, ent))

    slots = F.map_from_entries(F.transform(
        F.regexp_extract_all("value", F.lit(r"<TIME_SLOT\b[^>]*/?>"), 0),
        lambda s: F.struct(
            F.regexp_extract(s, r'TIME_SLOT_ID="([^"]*)"', 1).alias("k"),
            F.regexp_extract(s, r'TIME_VALUE="(\d+)"', 1).cast("long")
            .alias("v"))))
    doc = files.select(
        F.regexp_extract("_file", r"([^/]+?)(?:\.eaf)?$", 1)
        .alias("conv_id"),
        slots.alias("_slots"),
        _attr_map("Lemma").alias("_lem"),
        _attr_map("PoS").alias("_pos"),
        F.posexplode(F.regexp_extract_all(
            "value",
            F.lit(r"(?s)<TIER\b[^>]*LINGUISTIC_TYPE_REF=\"Words\""
                  r"[^>]*>.*?</TIER>"), 0)).alias("turn_idx", "_tier"))
    anns = F.regexp_extract_all(
        "_tier",
        F.lit(r"(?s)<ALIGNABLE_ANNOTATION\b[^>]*>.*?"
              r"</ALIGNABLE_ANNOTATION>"), 0)
    aid = lambda a: F.regexp_extract(  # noqa: E731
        a, r'ANNOTATION_ID="([^"]*)"', 1)
    form = lambda a: _xml_unescape(F.regexp_extract(  # noqa: E731
        a, r"(?s)<ANNOTATION_VALUE>\s*(.*?)\s*</ANNOTATION_VALUE>", 1))
    first_slot = F.regexp_extract(
        F.element_at(F.col("_a"), 1), r'TIME_SLOT_REF1="([^"]*)"', 1)
    out = (doc.withColumn("_a", anns)
           .filter(F.size("_a") > 0)
           .select(
               "conv_id", "turn_idx",
               F.nullif(F.regexp_extract(
                   "_tier", r'(?s)^<TIER\b[^>]*PARTICIPANT="([^"]*)"', 1),
                   F.lit("")).alias("role"),
               F.concat_ws(" ", F.transform(F.col("_a"), form))
               .alias("text"),
               F.lit(None).cast("string").alias("tool"),
               F.timestamp_millis(
                   F.lit(946684800000)
                   + F.coalesce(F.element_at("_slots", first_slot),
                                F.lit(0))).alias("ts"),
               F.transform(F.col("_a"), form).alias("tokens_s"),
               F.transform(
                   F.col("_a"),
                   lambda a: F.coalesce(F.element_at("_pos", aid(a)),
                                        F.lit("_"))).alias("tokens_pos"),
               F.transform(
                   F.col("_a"),
                   lambda a: F.array(F.coalesce(
                       F.element_at("_lem", aid(a)), form(a))))
               .alias("tokens_lemma")))
    return out


def read_tcf(spark: SparkSession, path: str) -> DataFrame:
    """TCF (WebLicht Text Corpus Format) — reference
    formats/tcf.blf.yaml: tokens = ``<token ID="..">word</token>``,
    lemma / pos layers standoff via ``tokenIDs`` references, and the
    ``<sentence tokenIDs="..">`` layer defining turn boundaries. One
    file = one conversation. The yaml's XPath contains()-joins become
    JVM maps: token-ID → word / lemma / pos, sentence token-ID lists
    resolved through them. Pre-annotated columns returned. Wholetext
    + regexp/map projections; one file per task."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())

    tok_ent = lambda t: F.struct(  # noqa: E731
        F.regexp_extract(t, r'ID="([^"]*)"', 1).alias("k"),
        _xml_unescape(F.regexp_extract(
            t, r"(?s)>\s*(.*?)\s*</token>", 1)).alias("v"))
    toks = F.map_from_entries(F.transform(
        F.regexp_extract_all(
            "value", F.lit(r"(?s)<token\b[^>]*>.*?</token>"), 0),
        tok_ent))

    def _ref_map(elem: str):
        """tokenID → value map for <elem tokenIDs="a b ...">v</elem>
        standoff layers (first value per token wins, as the yaml's
        [1] predicate does)."""
        els = F.regexp_extract_all(
            "value", F.lit(r"(?s)<%s\b[^>]*tokenIDs=\"[^\"]*\"[^>]*>"
                           r".*?</%s>" % (elem, elem)), 0)
        ents = F.flatten(F.transform(
            els,
            lambda e: F.transform(
                F.split(F.regexp_extract(e, r'tokenIDs="([^"]*)"', 1),
                        r"\s+"),
                lambda tid: F.named_struct(
                    F.lit("k"), tid,
                    F.lit("v"), _xml_unescape(F.regexp_extract(
                        e, r"(?s)>\s*(.*?)\s*</%s>" % elem, 1))))))
        # duplicate keys: keep the FIRST occurrence (yaml [1])
        return F.map_from_entries(F.filter(
            ents, lambda s, i: ~F.exists(
                F.slice(ents, 1, i),
                lambda p: p["k"] == s["k"])))

    doc = files.select(
        F.regexp_extract("_file", r"([^/]+?)(?:\.(?:tcf|xml))?$", 1)
        .alias("conv_id"),
        toks.alias("_tok"),
        _ref_map("lemma").alias("_lem"),
        _ref_map("tag").alias("_pos"),
        F.posexplode(F.regexp_extract_all(
            "value", F.lit(r"<sentence\b[^>]*tokenIDs=\"[^\"]*\"[^>]*/?>"),
            0)).alias("turn_idx", "_sent"))
    ids = F.split(F.regexp_extract("_sent", r'tokenIDs="([^"]*)"', 1),
                  r"\s+")
    word = lambda tid: F.element_at("_tok", tid)  # noqa: E731
    out = (doc.withColumn("_ids", ids)
           .filter(F.size("_ids") > 0)
           .select(
               "conv_id", "turn_idx",
               F.lit(None).cast("string").alias("role"),
               F.concat_ws(" ", F.transform(F.col("_ids"), word))
               .alias("text"),
               F.lit(None).cast("string").alias("tool"),
               F.timestamp_seconds(F.lit(946684800)
                                   + F.col("turn_idx")).alias("ts"),
               F.transform(F.col("_ids"), word).alias("tokens_s"),
               F.transform(F.col("_ids"),
                           lambda t: F.coalesce(F.element_at("_pos", t),
                                                F.lit("_")))
               .alias("tokens_pos"),
               F.transform(F.col("_ids"),
                           lambda t: F.array(F.coalesce(
                               F.element_at("_lem", t), word(t))))
               .alias("tokens_lemma")))
    return out


def read_naf(spark: SparkSession, path: str) -> DataFrame:
    """NAF (NLP Annotation Format) — reference formats/naf.blf.yaml:
    word forms ``<wf id=".." sent="..">word</wf>`` in the text layer,
    standoff ``<term lemma=".." pos=".."><span><target id=".."/>``
    joins per token. One file = one conversation; the ``sent``
    attribute groups word forms into turns (document order). Term
    lemma/pos lookups are JVM maps keyed by the span target id.
    Pre-annotated columns returned; wholetext + regexp/map
    projections, one file per task."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    wfs = F.regexp_extract_all(
        "value", F.lit(r"(?s)<wf\b[^>]*>.*?</wf>"), 0)
    terms = F.regexp_extract_all(
        "value", F.lit(r"(?s)<term\b[^>]*>.*?</term>"), 0)

    def _term_map(attr: str):
        ents = F.flatten(F.transform(
            terms,
            lambda t: F.transform(
                F.regexp_extract_all(t, F.lit(r'<target\b[^>]*id="([^"]*)"'),
                                     1),
                lambda tid: F.named_struct(
                    F.lit("k"), tid,
                    F.lit("v"), F.nullif(F.regexp_extract(
                        t, r'(?s)^<term\b[^>]*\b%s="([^"]*)"' % attr, 1),
                        F.lit(""))))))
        return F.map_from_entries(F.filter(
            ents, lambda s, i: ~F.exists(
                F.slice(ents, 1, i), lambda p: p["k"] == s["k"])))

    doc = files.select(
        F.regexp_extract("_file", r"([^/]+?)(?:\.(?:naf|xml))?$", 1)
        .alias("conv_id"),
        wfs.alias("_wfs"),
        _term_map("lemma").alias("_lem"),
        _term_map("pos").alias("_pos"))
    sent = lambda w: F.regexp_extract(w, r'sent="([^"]*)"', 1)  # noqa: E731
    wid = lambda w: F.regexp_extract(w, r'id="([^"]*)"', 1)     # noqa: E731
    form = lambda w: _xml_unescape(F.regexp_extract(            # noqa: E731
        w, r"(?s)>\s*(.*?)\s*</wf>", 1))
    sents = F.array_distinct(F.transform(F.col("_wfs"), sent))
    doc = (doc.withColumn("_sents", sents)
           .select("conv_id", "_wfs", "_lem", "_pos",
                   F.posexplode("_sents").alias("turn_idx", "_sent")))
    tws = F.filter(F.col("_wfs"), lambda w: sent(w) == F.col("_sent"))
    out = (doc.withColumn("_t", tws)
           .filter(F.size("_t") > 0)
           .select(
               "conv_id", "turn_idx",
               F.lit(None).cast("string").alias("role"),
               F.concat_ws(" ", F.transform(F.col("_t"), form))
               .alias("text"),
               F.lit(None).cast("string").alias("tool"),
               F.timestamp_seconds(F.lit(946684800)
                                   + F.col("turn_idx")).alias("ts"),
               F.transform(F.col("_t"), form).alias("tokens_s"),
               F.transform(F.col("_t"),
                           lambda w: F.coalesce(
                               F.element_at("_pos", wid(w)), F.lit("_")))
               .alias("tokens_pos"),
               F.transform(F.col("_t"),
                           lambda w: F.array(F.coalesce(
                               F.element_at("_lem", wid(w)), form(w))))
               .alias("tokens_lemma")))
    return out


def read_cmdi(spark: SparkSession, path: str) -> DataFrame:
    """CMDI (CLARIN Component MetaData) — the reference's linked
    METADATA format (formats/cmdi.blf.yaml: ``type: metadata``,
    ``store: false``; every leaf element with text becomes a metadata
    field named by its local name). One ``.cmdi``/``.xml`` file
    describes one conversation: conv id from ``<MdSelfLink>`` when
    present, else the file name. Returns the long frame
    ``(conv_id, field, value)`` — join it onto ``doc_meta`` by
    conv_id (the reference's linkedDocument mechanism) or pivot with
    ``cmdi_metadata_map``. Leaf extraction is one JVM regexp with a
    backreference (open/close tag names must match); elements with
    child elements never match because ``[^<>]`` excludes nested
    tags."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("_file", F.input_file_name())
    conv_id = F.coalesce(
        F.nullif(F.regexp_extract(
            "value", r"(?s)<MdSelfLink[^>]*>\s*([^<]*?)\s*</MdSelfLink>",
            1), F.lit("")),
        F.regexp_extract("_file", r"([^/]+?)(?:\.(?:cmdi|xml))?$", 1))
    leaves = F.regexp_extract_all(
        "value",
        F.lit(r"<([A-Za-z_][\w.-]*)(?:\s[^>]*)?>([^<>]+)</\1>"), 0)
    out = (files.select(
        conv_id.alias("conv_id"),
        F.explode(leaves).alias("_leaf"))
        .select(
            "conv_id",
            F.regexp_extract("_leaf", r"^<([A-Za-z_][\w.-]*)", 1)
            .alias("field"),
            F.trim(_xml_unescape(F.regexp_extract(
                "_leaf", r">([^<>]+)<", 1))).alias("value"))
        .filter(F.col("value") != ""))
    return out


def cmdi_metadata_map(cmdi: DataFrame) -> DataFrame:
    """Pivot the long CMDI frame to one row per conversation with a
    field→value map (first value per field wins, deterministic by
    value order) — the shape that joins straight onto doc_meta."""
    return (cmdi.groupBy("conv_id", "field")
            .agg(F.min("value").alias("value"))
            .groupBy("conv_id")
            .agg(F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("field", "value"))))
                .alias("metadata")))


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg catalog table (the production input per
    BASELINE.json.input_hint): ``spark.read.table`` against a
    configured Iceberg catalog — filter/partition pruning and
    snapshot pinning come from the Iceberg source. The sandbox has no
    Iceberg runtime jar, so this path is exercised on a real cluster
    (`--packages org.apache.iceberg:iceberg-spark-runtime-...`); the
    engine is source-agnostic past this point (build_index takes any
    DataFrame with the declared schema)."""
    return _canonicalize(spark.read.table(table))


READERS = {"parquet": read_parquet, "jsonl": read_jsonl, "csv": read_csv,
           "tsv": read_tsv, "xml": read_xml, "conllu": read_conllu,
           "txt": read_plaintext, "iceberg": read_iceberg,
           "chat": read_chat, "folia": read_folia,
           "wpl": read_wpl, "frog": read_frog, "eaf": read_eaf,
           "tcf": read_tcf, "naf": read_naf}


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet", **kw) -> DataFrame:
    if fmt not in READERS:
        raise ValueError(f"unknown source format {fmt!r} "
                         f"(have: {sorted(READERS)})")
    return READERS[fmt](spark, path, **kw)
