"""Code-corpus curation: license detection + programming-language
identification.

The reference has no code operators (SURVEY.md §2.3); these are the
two filters every code training-data build runs first (The Stack /
CodeParrot-style pipelines keep only permissively-licensed files and
route by language before any dedup or quality pass):

- :class:`LicenseDetector`: SPDX tag parse (exact, takes precedence)
  + first-match heuristic over the distinctive phrases of the common
  OSS licenses. Pure JVM expressions — one ``regexp_extract`` + one
  CASE chain of ``rlike`` over the lowered text, no Python in the hot
  path, trivially SQL-twinnable (the patterns avoid lookaround so they
  run identically under Java regex and RE2).
- :class:`CodeLanguageIdentifier`: file-extension map over a path
  column with a shebang fallback (``#!/usr/bin/env python`` etc.) —
  the routing key for per-language dedup/quality stages. Expression
  only.

Scale shape: both are stateless narrow column appends — no shuffle, no
fit, filter-pushdown friendly. At 100 TB they run inside the first
scan alongside the other per-row features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pipeline import Transformer
from ..validation import ensure, validate_columns, validate_string_columns

# distinctive license phrases over LOWERCASED text, first match wins.
# Order matters: BSD-3's "neither the name" clause must be probed
# before BSD-2's shared preamble; the GPL family strings are mutually
# exclusive as written (AGPL/LGPL insert their qualifier inside the
# phrase). [\s\S]{0,N} spans line breaks without DOTALL (portable to
# RE2). Sources: the canonical license texts as published by their
# stewards (spdx.org/licenses).
LICENSE_PATTERNS: tuple[tuple[str, str], ...] = (
    ("MIT", r"permission is hereby granted, free of charge"),
    ("Apache-2.0", r"apache license,?[\s\S]{0,10}version 2\.0"),
    ("AGPL-3.0", r"gnu affero general public license"),
    ("LGPL-2.1", r"gnu lesser general public license"),
    ("GPL-3.0", r"gnu general public license[\s\S]{0,60}version 3"),
    ("GPL-2.0", r"gnu general public license[\s\S]{0,60}version 2"),
    ("BSD-3-Clause",
     r"redistribution and use in source and binary forms"
     r"[\s\S]{0,600}neither the name"),
    ("BSD-2-Clause", r"redistribution and use in source and binary forms"),
    ("MPL-2.0", r"mozilla public license[,\s]+(version |v\.?\s*)?2\.0"),
    ("Unlicense", r"this is free and unencumbered software"),
    ("CC0-1.0",
     r"cc0 1\.0 universal|creativecommons\.org/publicdomain/zero"),
    ("ISC",
     r"permission to use, copy, modify, and(/or)? distribute this "
     r"software"),
)

_SPDX_RE = r"SPDX-License-Identifier:[ \t]*([A-Za-z0-9.+-]+)"

# extension -> language, the routing map code pipelines key stages on
EXT_LANGS: dict[str, str] = {
    "py": "python", "pyi": "python",
    "js": "javascript", "mjs": "javascript", "cjs": "javascript",
    "ts": "typescript", "tsx": "typescript", "jsx": "javascript",
    "java": "java", "kt": "kotlin", "kts": "kotlin", "scala": "scala",
    "c": "c", "h": "c", "cpp": "cpp", "cc": "cpp", "cxx": "cpp",
    "hpp": "cpp", "hh": "cpp",
    "cs": "csharp", "go": "go", "rs": "rust", "rb": "ruby",
    "php": "php", "swift": "swift", "m": "objective-c",
    "pl": "perl", "pm": "perl", "r": "r", "jl": "julia", "lua": "lua",
    "sh": "shell", "bash": "shell", "zsh": "shell",
    "sql": "sql", "html": "html", "htm": "html", "css": "css",
    "json": "json", "yaml": "yaml", "yml": "yaml", "toml": "toml",
    "xml": "xml", "md": "markdown", "rst": "restructuredtext",
    "tex": "latex", "hs": "haskell", "ex": "elixir", "exs": "elixir",
    "erl": "erlang", "clj": "clojure", "fs": "fsharp", "dart": "dart",
    "zig": "zig", "nim": "nim", "vb": "visualbasic", "groovy": "groovy",
}

# shebang interpreter -> language (the extensionless-script fallback)
SHEBANG_LANGS: tuple[tuple[str, str], ...] = (
    ("python", "python"),
    ("node", "javascript"),
    ("ruby", "ruby"),
    ("perl", "perl"),
    ("php", "php"),
    ("bash", "shell"),
    ("zsh", "shell"),
    ("sh", "shell"),
)


def license_expr(text: Column) -> Column:
    """(license, source) struct: the SPDX tag when present (source
    'spdx'), else the first matching license phrase (source
    'heuristic'), else NULLs."""
    spdx = F.regexp_extract(text, _SPDX_RE, 1)
    low = F.lower(text)
    heur = F.lit(None).cast("string")
    # build the CASE chain back-to-front so the FIRST pattern wins
    for name, pat in reversed(LICENSE_PATTERNS):
        heur = F.when(low.rlike(pat), F.lit(name)).otherwise(heur)
    return F.when(
        spdx != "", F.struct(spdx.alias("license"), F.lit("spdx").alias("source"))
    ).when(
        heur.isNotNull(),
        F.struct(heur.alias("license"), F.lit("heuristic").alias("source")),
    ).otherwise(
        F.struct(
            F.lit(None).cast("string").alias("license"),
            F.lit(None).cast("string").alias("source"),
        )
    )


def code_lang_expr(path: Column, text: Column | None = None) -> Column:
    """Language from the path's extension, falling back to the first
    line's shebang interpreter when ``text`` is given; NULL when
    neither resolves."""
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    out = F.lit(None).cast("string")
    for e, lang in reversed(list(EXT_LANGS.items())):
        out = F.when(ext == e, F.lit(lang)).otherwise(out)
    if text is not None:
        # first line only ("^" anchors the string start; the class
        # stops at the newline), then probe the interpreter token —
        # "#!/usr/bin/env python3" and "#!/bin/sh -e" both resolve
        line = F.regexp_extract(text, r"^#!([^\n]*)", 1)
        sb = F.lit(None).cast("string")
        for probe, lang in reversed(SHEBANG_LANGS):
            sb = F.when(
                line.rlike(r"(^|[/ \t])" + probe + r"[0-9.]*([ \t]|$)"),
                F.lit(lang),
            ).otherwise(sb)
        out = F.coalesce(out, sb)
    return out


class LicenseDetector(Transformer):
    """Append ``{prefix}license`` / ``{prefix}license_source`` from a
    text column: the SPDX-License-Identifier tag when present (exact,
    source 'spdx'), else the first distinctive-phrase match over the
    common OSS licenses (source 'heuristic'), else NULL — the keep/drop
    key of a permissive-license code-corpus filter."""

    def __init__(self, text_col: str, prefix: str | None = None):
        self.text_col = text_col
        self.prefix = prefix if prefix is not None else f"{text_col}_"

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.text_col])
        validate_string_columns(df, [self.text_col])
        clash = [
            c
            for c in (f"{self.prefix}license", f"{self.prefix}license_source")
            if c in df.columns
        ]
        ensure(not clash, f"output column(s) {clash} already exist; pass a "
                          "different prefix")

    def _transform(self, df: DataFrame) -> DataFrame:
        s = license_expr(F.col(self.text_col))
        return df.withColumn(
            f"{self.prefix}license", s["license"]
        ).withColumn(f"{self.prefix}license_source", s["source"])


class CodeLanguageIdentifier(Transformer):
    """Append ``{output_col}`` (default ``code_lang``): the programming
    language from ``path_col``'s file extension, with a shebang
    fallback from ``text_col`` when given — the routing key for
    per-language pipeline stages."""

    def __init__(
        self,
        path_col: str,
        text_col: str | None = None,
        output_col: str = "code_lang",
    ):
        self.path_col = path_col
        self.text_col = text_col
        self.output_col = output_col

    def _check_input(self, df: DataFrame) -> None:
        cols = [self.path_col] + ([self.text_col] if self.text_col else [])
        validate_columns(df, cols)
        ensure(
            self.output_col not in df.columns,
            f"output column '{self.output_col}' already exists",
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.output_col,
            code_lang_expr(
                F.col(self.path_col),
                F.col(self.text_col) if self.text_col else None,
            ),
        )
