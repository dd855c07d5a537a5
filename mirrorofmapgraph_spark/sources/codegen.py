"""Deterministic synthetic source-code repository table (FIXTURES.md §F1).

Schema matches BASELINE.json input_hint — the Iceberg source-code table
(repo:string, path:string, commit:string, lang:string, content:string).
Content embeds import/include statements that encode an intended edge
list, so extraction(source_table) == expected edge table is itself a test.
Every row carries a unique salt line so each sha256 is distinct.

Generation is distributed: we create the row *specs* as a DataFrame and
render content with a vectorized pandas UDF — no driver-side content
materialization, so the same code scales the synthetic table to any size.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LANGS = ("python", "c", "java")


def module_key(repo_i: int, file_j: int) -> str:
    return f"repo{repo_i:04d}/mod{file_j:03d}"


def _render_content(repo: str, path: str, lang: str, links: list[str]) -> str:
    """links are 'repoNNNN/modMMM' keys; rendered per-language import syntax
    (the convention extract.py parses)."""
    lines = [f"# id: {repo}/{path}" if lang != "c" else f"// id: {repo}/{path}"]
    for link in links:
        r, m = link.split("/")
        if lang == "python":
            lines.append(f"import {r}.{m}")
        elif lang == "c":
            lines.append(f'#include "{r}/{m}.h"')
        else:
            lines.append(f"import {r}.{m};")
    lines.append(f"def main_{hashlib.sha1((repo + path).encode()).hexdigest()[:8]}(): pass")
    return "\n".join(lines) + "\n"


def synthesize_repo_table(
    spark: SparkSession,
    edges: list[tuple[int, int]] | None = None,
    *,
    n_repos: int = 16,
    files_per_repo: int = 1,
    extra_ring_links: int = 2,
    num_partitions: int = 8,
) -> DataFrame:
    """Build the source table. Vertices are module keys 'repoNNNN/modMMM'
    (files_per_repo=1 -> vertex == repo, matching the micro fixtures).

    If ``edges`` is given (pairs of vertex ordinals, ordinal = i*F + j),
    the content encodes exactly those links. Otherwise a deterministic
    ring+chord link structure with ``extra_ring_links`` out-links per file.
    """
    n = n_repos * files_per_repo
    if edges is None:
        edges = []
        for v in range(n):
            for k in range(1, extra_ring_links + 1):
                edges.append((v, (v + k * k) % n))
        edges = [(s, d) for s, d in edges if s != d]

    out_links: dict[int, list[int]] = {}
    for s, d in edges:
        out_links.setdefault(s, []).append(d)

    rows = []
    for i in range(n_repos):
        for j in range(files_per_repo):
            v = i * files_per_repo + j
            lang = LANGS[(i + j) % 3]
            repo = f"repo{i:04d}"
            ext = {"python": "py", "c": "c", "java": "java"}[lang]
            path = f"src/mod{j:03d}.{ext}"
            links = ",".join(
                module_key(d // files_per_repo, d % files_per_repo)
                for d in sorted(set(out_links.get(v, [])))
            )
            commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]
            rows.append((repo, path, commit, lang, links))

    spec = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, _links string"
    ).repartition(num_partitions, "repo")

    @pandas_udf("string")
    def render(repo: pd.Series, path: pd.Series, lang: pd.Series, links: pd.Series) -> pd.Series:
        out = []
        for r, p, lg, lk in zip(repo, path, lang, links):
            out.append(_render_content(r, p, lg, lk.split(",") if lk else []))
        return pd.Series(out)

    return spec.withColumn(
        "content", render("repo", "path", "lang", "_links")
    ).drop("_links")
