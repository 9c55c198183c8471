"""Declarative input-format configs — the analog of the reference's
user-supplied ``.blf.yaml`` input formats (ConfigInputFormat.java,
engine/src/main/resources/formats/*.blf.yaml; uploaded through BLS
``POST /input-formats``, RequestHandlerAddFormat.java).

The reference lets a user describe how THEIR files map onto the
engine's annotated-document model (element paths, annotation value
paths) without writing code. Our tabular equivalent: a small JSON
document that maps the user's column names onto the declared
transcript schema and supplies constant defaults for absent columns,
layered over one of the registered base readers (sources/files.py).
Schema stays declared, never inferred — the config IS the declaration,
frozen server-side exactly like the reference freezes format configs.

Config shape (all but ``name``/``baseFormat`` optional)::

    {"name": "chatcsv", "baseFormat": "csv",
     "displayName": "Chat CSV", "description": "...",
     "columns":  {"conv_id": "conversation", "text": "utterance"},
     "defaults": {"tool": null, "role": "user",
                  "ts": "2026-01-01 00:00:00"},
     "options":  {"sep": ";"}}

``columns`` maps *target field → source column name* (unmapped fields
read a source column of the same name); ``defaults`` supplies a
constant for fields absent from the data. Column mapping applies to
the row-shaped bases (jsonl/csv/tsv); the structured bases
(xml/txt/conllu) have fixed document structure, so configs over them
carry only display metadata — same split as the reference's
tabular-vs-XML ``fileType`` config axis.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType

from blacklab_spark.sources.transcripts import TRANSCRIPT_SCHEMA

#: bases a column mapping can apply to (row-shaped: one row = one turn)
MAPPABLE_BASES = ("jsonl", "csv", "tsv")
#: bases a user config may sit on at all (the uploadable set)
CONFIG_BASES = MAPPABLE_BASES + ("xml", "txt", "conllu")

_NAME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9_-]{0,63}$")
_FIELDS = {f.name: f.dataType for f in TRANSCRIPT_SCHEMA.fields}


@dataclass(frozen=True)
class FormatConfig:
    """A validated input-format declaration (ConfigInputFormat analog)."""
    name: str
    base_format: str
    display_name: str = ""
    description: str = ""
    columns: dict = field(default_factory=dict)
    defaults: dict = field(default_factory=dict)
    options: dict = field(default_factory=dict)

    @staticmethod
    def from_json(text: str | bytes) -> "FormatConfig":
        try:
            raw = json.loads(text)
        except (ValueError, UnicodeDecodeError) as e:
            raise ValueError(f"format config is not valid JSON: {e}") from None
        if not isinstance(raw, dict):
            raise ValueError("format config must be a JSON object")
        unknown = set(raw) - {"name", "baseFormat", "displayName",
                              "description", "columns", "defaults",
                              "options"}
        if unknown:
            raise ValueError(f"unknown format config keys: {sorted(unknown)}")
        cfg = FormatConfig(
            name=raw.get("name", ""),
            base_format=raw.get("baseFormat", ""),
            display_name=raw.get("displayName", ""),
            description=raw.get("description", ""),
            columns=raw.get("columns") or {},
            defaults=raw.get("defaults") or {},
            options=raw.get("options") or {},
        )
        cfg.validate()
        return cfg

    def to_json(self) -> str:
        return json.dumps({
            "name": self.name, "baseFormat": self.base_format,
            "displayName": self.display_name,
            "description": self.description,
            "columns": self.columns, "defaults": self.defaults,
            "options": self.options,
        }, indent=2, sort_keys=True)

    def validate(self) -> None:
        if not isinstance(self.name, str) or not _NAME_RE.match(self.name):
            raise ValueError(
                f"illegal format name {self.name!r} (want "
                "[A-Za-z][A-Za-z0-9_-]*, max 64 chars)")
        if self.base_format not in CONFIG_BASES:
            raise ValueError(
                f"unknown baseFormat {self.base_format!r} "
                f"(have: {list(CONFIG_BASES)})")
        for label, m in (("columns", self.columns),
                         ("defaults", self.defaults),
                         ("options", self.options)):
            if not isinstance(m, dict):
                raise ValueError(f"{label} must be an object")
        if ((self.columns or self.defaults)
                and self.base_format not in MAPPABLE_BASES):
            raise ValueError(
                f"baseFormat {self.base_format!r} has fixed document "
                "structure; columns/defaults apply only to "
                f"{list(MAPPABLE_BASES)}")
        bad = set(self.columns) | set(self.defaults)
        bad -= set(_FIELDS)
        if bad:
            raise ValueError(
                f"unknown target fields: {sorted(bad)} "
                f"(schema fields: {list(_FIELDS)})")
        overlap = set(self.columns) & set(self.defaults)
        if overlap:
            raise ValueError(
                f"fields both mapped and defaulted: {sorted(overlap)}")
        if "text" in self.defaults:
            raise ValueError("'text' cannot be defaulted — it must "
                             "come from the data")
        srcs = list(self.columns.values())
        if any(not isinstance(s, str) or not s for s in srcs):
            raise ValueError("column mapping values must be non-empty "
                             "source column names")
        if len(set(srcs)) != len(srcs):
            raise ValueError("two fields map to the same source column")
        for k, v in self.defaults.items():
            if v is not None and not isinstance(v, (str, int, float, bool)):
                raise ValueError(
                    f"default for {k!r} must be a JSON scalar")
        bad_opts = set(self.options) - {"sep", "header"}
        if bad_opts:
            raise ValueError(f"unknown options: {sorted(bad_opts)}")
        if "sep" in self.options and self.base_format != "csv":
            raise ValueError("option 'sep' applies to baseFormat csv only")

    # -- reading -------------------------------------------------------
    def source_schema(self) -> StructType:
        """The DECLARED schema of the user's file: one field per
        transcript field that is not defaulted, named by the source
        column, typed by the target field (no inference pass)."""
        fields = []
        for f in TRANSCRIPT_SCHEMA.fields:
            if f.name in self.defaults:
                continue
            fields.append(StructField(
                self.columns.get(f.name, f.name), f.dataType, True))
        return StructType(fields)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        """Read ``path`` through this config → canonical transcript
        frame (the DocIndexerConfig.index() analog)."""
        from blacklab_spark.sources.files import (_canonicalize,
                                                  read_transcripts)
        if not self.columns and not self.defaults:
            # pure alias of the base reader (metadata-only config)
            return read_transcripts(spark, path, self.base_format)
        schema = self.source_schema()
        if self.base_format == "jsonl":
            raw = spark.read.schema(schema).json(path)
        else:
            sep = self.options.get(
                "sep", "\t" if self.base_format == "tsv" else ",")
            header = str(self.options.get("header", True)).lower()
            raw = (spark.read.schema(schema)
                   .option("header", header).option("sep", sep)
                   .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
                   .csv(path))
        cols = []
        for f in TRANSCRIPT_SCHEMA.fields:
            if f.name in self.defaults:
                cols.append(F.lit(self.defaults[f.name])
                            .cast(f.dataType).alias(f.name))
            else:
                src = self.columns.get(f.name, f.name)
                cols.append(F.col(src).cast(f.dataType).alias(f.name))
        return _canonicalize(raw.select(cols))

    # -- display -------------------------------------------------------
    def xslt(self) -> str:
        """Generate the basic-HTML display stylesheet for an XML-based
        format (XslGenerator.generateXsltFromConfig — swallow unmatched
        text, highlight ``hl`` spans, render each turn). Raises
        ValueError for non-XML bases, exactly where the reference
        answers NOT_FOUND."""
        if self.base_format != "xml":
            raise ValueError(
                f"The format '{self.name}' does not apply to XML-type "
                "documents, and cannot be converted to XSLT.")
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<xsl:stylesheet version="2.0" '
            'xmlns:xsl="http://www.w3.org/1999/XSL/Transform">'
            '<xsl:output encoding="utf-8" method="html" '
            'omit-xml-declaration="yes" />'
            "<xsl:template match='text()' priority='-10'>"
            "</xsl:template>"
            '<xsl:template match="*[local-name(.)=\'hl\']">'
            '<span class="hl"><xsl:apply-templates select="node()"/>'
            "</span></xsl:template>"
            '<xsl:template match="*[local-name(.)=\'turn\']">'
            '<div class="turn"><span class="role">'
            '<xsl:value-of select="@role"/></span>'
            "<xsl:text> </xsl:text>"
            '<xsl:value-of select="."/>'
            "</div></xsl:template>"
            "</xsl:stylesheet>")
