"""Named-query registry.

Reimplements the semantics of the reference's Athena named-query
deployer (``lib/nbi-open-data-analytics-stack.ts:450-506``):

- strip ``/* ... */`` block comments;
- split the file on ``-- label:`` lines;
- slug each label (strip non-alphanumerics, lowercase,
  whitespace → ``_``);
- keep an optional ``-- description:`` line;
- strip remaining ``--`` line comments from the statement body;
- substitute ``${placeholder}`` (tolerating spaces: ``$ { glue_db }``)
  from a mapping, then collapse ``_ +`` → ``_`` (the reference's
  cleanup for ``${prefix} _parquet``-style concatenations).

Execution is plain ``spark.sql`` (EP3: the reference delegates
parse→plan→execute to Athena/Presto; here Catalyst is that stack).
Double-quoted identifiers like ``"in.state"`` are ANSI SQL — Spark
accepts them with ``spark.sql.ansi.doubleQuotedIdentifiers=true``,
set for the duration of each run so saved-query text runs unmodified
on both Spark and the DuckDB oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_BLOCK_COMMENT = re.compile(r"/\*[\s\S]*?\*/")
_LABEL_SPLIT = re.compile(r"(?:^|\n)(?=--\s*label)")
_LINE_COMMENT = re.compile(r"--.*(?:\n|$)")
_PLACEHOLDER = re.compile(r"\$\s*\{\s*([A-Za-z0-9_]+)\s*\}")
_UNDERSCORE_SPACE = re.compile(r"_ +")


def slug(label: str) -> str:
    """stack.ts:471-477 — label → snake_case query name."""
    cleaned = re.sub(r"[^a-zA-Z0-9\s]", "", label).strip().lower()
    return "_".join(cleaned.split())


@dataclass
class NamedQuery:
    name: str
    label: str
    description: str
    template: str  # statement with ${placeholders} intact

    def render(self, substitutions: dict[str, str]) -> str:
        def sub(m: re.Match) -> str:
            key = m.group(1)
            if key not in substitutions:
                raise KeyError(f"no substitution for ${{{key}}} in query {self.name!r}")
            return substitutions[key]

        rendered = _PLACEHOLDER.sub(sub, self.template)
        return _UNDERSCORE_SPACE.sub("_", rendered).strip().rstrip(";")

    def run(
        self, spark: SparkSession, substitutions: dict[str, str]
    ) -> DataFrame:
        prev = spark.conf.get("spark.sql.ansi.doubleQuotedIdentifiers", "false")
        spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
        try:
            return spark.sql(self.render(substitutions))
        finally:
            spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", prev)


def parse_named_queries(sql_text: str) -> list[NamedQuery]:
    text = _BLOCK_COMMENT.sub("", sql_text)
    queries: list[NamedQuery] = []
    for section in _LABEL_SPLIT.split(text):
        section = section.strip()
        if not section.startswith("--"):
            continue
        lines = section.split("\n")
        label = lines[0].split(":", 1)[1].strip() if ":" in lines[0] else lines[0]
        description = ""
        body_lines = lines[1:]
        if body_lines and body_lines[0].strip().startswith("-- description"):
            description = body_lines[0].split(":", 1)[1].strip()
            body_lines = body_lines[1:]
        body = _LINE_COMMENT.sub("", "\n".join(body_lines)).strip()
        if not body:
            continue
        queries.append(
            NamedQuery(name=slug(label), label=label, description=description, template=body)
        )
    return queries


def load_registry(sql_path: str) -> dict[str, NamedQuery]:
    with open(sql_path, encoding="utf-8") as fh:
        return {q.name: q for q in parse_named_queries(fh.read())}
