"""Deterministic synthetic source-code repository table (FIXTURES.md §F1).

Schema matches BASELINE.json input_hint — the Iceberg source-code table
(repo:string, path:string, commit:string, lang:string, content:string).
Content embeds import/include statements that encode an intended edge
list, so extraction(source_table) == expected edge table is itself a test.
Every row carries a unique salt line so each sha256 is distinct.

Generation is distributed when the link structure is procedural (the
default ring+chord graph): row specs are derived from ``spark.range`` with
pure Column arithmetic and content is rendered by a vectorized pandas UDF,
so the same code scales the synthetic table to any size — no driver-side
row materialization. Passing an explicit ``edges`` list builds the specs
on the driver (bounded by the edge list the caller already materialized;
that path exists for micro fixtures only).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LANGS = ("python", "c", "java")
_EXT = {"python": "py", "c": "c", "java": "java"}


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
    the content encodes exactly those links (driver-built specs — fixture
    path). Otherwise a deterministic ring+chord link structure with
    ``extra_ring_links`` out-links per file, built entirely from
    ``spark.range`` so spec generation is distributed and the table
    scales to any n without driver memory.
    """
    n = n_repos * files_per_repo
    fpr = files_per_repo

    if edges is None:
        # ---- fully distributed spec generation (the scale path) ----------
        v = F.col("id")
        i = (v / fpr).cast("long")
        j = v % fpr
        lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                            ((i + j) % 3 + 1).cast("int"))
        ext = F.element_at(F.array(*[F.lit(_EXT[x]) for x in LANGS]),
                           ((i + j) % 3 + 1).cast("int"))
        repo = F.format_string("repo%04d", i)
        path = F.format_string("src/mod%03d.", j)
        # ring+chord out-links: dst_k = (v + k^2) mod n, k = 1..K, self-loops
        # dropped, dedup + sort. Zero-padded module keys sort identically to
        # their integer ordinals, matching the driver-path sorted(set(...)).
        dsts = F.array_sort(
            F.array_distinct(
                F.filter(
                    F.array(*[(v + k * k) % n for k in range(1, extra_ring_links + 1)]),
                    lambda d: d != v,
                )
            )
        )
        links = F.array_join(
            F.transform(
                dsts,
                lambda d: F.format_string(
                    "repo%04d/mod%03d", (d / fpr).cast("long"), d % fpr
                ),
            ),
            ",",
        )
        spec = (
            spark.range(n)
            .select(
                repo.alias("repo"),
                F.concat(path, ext).alias("path"),
                lang.alias("lang"),
                links.alias("_links"),
            )
            .withColumn(
                "commit",
                F.substring(F.sha1(F.concat_ws("/", "repo", "path").cast("binary")), 1, 12),
            )
            .select("repo", "path", "commit", "lang", "_links")
            .repartition(num_partitions, "repo")
        )
    else:
        # ---- explicit fixture edges: driver-built specs ------------------
        out_links: dict[int, list[int]] = {}
        for s, d in edges:
            out_links.setdefault(s, []).append(d)
        rows = []
        for ri in range(n_repos):
            for fj in range(fpr):
                vtx = ri * fpr + fj
                lang_s = LANGS[(ri + fj) % 3]
                repo_s = f"repo{ri:04d}"
                path_s = f"src/mod{fj:03d}.{_EXT[lang_s]}"
                links_s = ",".join(
                    module_key(d // fpr, d % fpr)
                    for d in sorted(set(out_links.get(vtx, [])))
                    if d != vtx
                )
                commit_s = hashlib.sha1(f"{repo_s}/{path_s}".encode()).hexdigest()[:12]
                rows.append((repo_s, path_s, commit_s, lang_s, links_s))
        spec = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, _links string"
        ).repartition(num_partitions, "repo")

    # defined here, not at module scope: @pandas_udf parses its return type
    # eagerly and needs an active SparkSession
    @pandas_udf("string")
    def render(repo: pd.Series, path: pd.Series, lang: pd.Series,
               links: pd.Series) -> pd.Series:
        out = []
        for r, p, lg, lk in zip(repo, path, lang, links):
            out.append(_render_content(r, p, lg, lk.split(",") if lk else []))
        return pd.Series(out)

    return spec.withColumn(
        "content", render("repo", "path", "lang", "_links")
    ).drop("_links")
