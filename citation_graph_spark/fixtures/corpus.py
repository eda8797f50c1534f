"""Deterministic synthetic source-code corpus.

Generates the engine's mandated input shape (BASELINE.json input_hint):
``documents(repo:string, path:string, commit:string, lang:string,
content:string)`` where ``content`` embeds import/include references to
*other rows' paths*, so the vectorized extraction stage has real work to
do. Mirrors how the reference derives its edge table from raw article
payloads (reference: scripts/gather_articles.py:193-240 fetches
citations per article; src/citations/data_sources/europmc.py:47-64
turns them into ArticleCitesArticle rows) — here the "citations" are
code references embedded in the text itself.

Design properties (FIXTURES.md §1):
- seed-deterministic (numpy PCG64, fully vectorized generation)
- out-degree ~ Zipf(s=1.2) capped, so some rows reference many files
- in-degree power-law: targets drawn Zipf-skewed toward low vertex
  indices → a few "hub" files collect most references (exercises the
  salted skew path)
- ~2% of references dangle (point at paths that exist in no row)
- every 17th row has zero out-degree (dangling PageRank mass)
- no row references itself (no self-loops in the extracted edge table,
  analog of reference data_checks/test_article_cites_article.py:19-24)
- (repo, path) unique; path globally unique
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["py", "c", "cpp", "java", "js"]
EXT = {"py": "py", "c": "h", "cpp": "hpp", "java": "java", "js": "js"}

# one reference line per language, %s = the target *module key*
# (path minus extension, '/' kept — extraction normalizes to this key)
_REF_TEMPLATE = {
    "py": 'import graft_mod  # graft-ref: "%s"\n',
    "c": '#include "%s.h"\n',
    "cpp": '#include "%s.hpp"\n',
    "java": 'import graft.%s; // graft-ref: "%s"\n',
    "js": 'const m = require("%s");\n',
}

_FILLER = (
    "scan filter join group sort merge window hash shuffle partition "
    "broadcast salt checkpoint lineage vector column batch stream spark"
).split()


def _module_key(i: int) -> str:
    return f"src/m{i // 16}/f{i % 16}_{i}"


def _path(i: int, lang: str) -> str:
    return f"{_module_key(i)}.{EXT[lang]}"


def generate_documents(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Pure-pandas deterministic corpus; returns the documents table."""
    if n_docs < 8:
        raise ValueError("n_docs must be >= 8")
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = np.arange(n_docs)

    n_repos = max(4, n_docs // 64)
    repos = np.array([f"repo{i % n_repos}" for i in idx])
    langs = np.array([LANGS[i % len(LANGS)] for i in idx])
    paths = np.array([_path(i, LANGS[i % len(LANGS)]) for i in idx])

    # out-degree: Zipf(1.2) capped; every 17th row emits nothing
    out_deg = np.minimum(rng.zipf(1.2, size=n_docs), 40)
    out_deg[idx % 17 == 0] = 0

    total_refs = int(out_deg.sum())
    # targets: Zipf-skewed toward low indices → power-law in-degree hubs
    raw_targets = (rng.zipf(1.1, size=total_refs) - 1) % n_docs
    src_of_ref = np.repeat(idx, out_deg)
    # no self-references: shift colliding targets by one (deterministic)
    self_mask = raw_targets == src_of_ref
    raw_targets[self_mask] = (raw_targets[self_mask] + 1) % n_docs
    # ~2% dangling references → module key that matches no row
    dangling = rng.random(total_refs) < 0.02

    # build content vectorized: group ref-lines by source doc
    ref_keys = np.array([_module_key(t) for t in raw_targets], dtype=object)
    ref_keys[dangling] = np.array(
        [f"src/missing/f{t}" for t in raw_targets[dangling]], dtype=object
    )

    ref_series = pd.Series(ref_keys, index=src_of_ref)
    contents = []
    grouped = ref_series.groupby(level=0).agg(list)
    filler = np.array(_FILLER)
    for i in idx:
        lang = langs[i]
        tmpl = _REF_TEMPLATE[lang]
        lines = [f"// graft module {_module_key(i)} lang={lang}\n"]
        if i in grouped.index:
            for key in grouped.loc[i]:
                if lang == "java":
                    lines.append(tmpl % (key.replace("/", "."), key))
                else:
                    lines.append(tmpl % key)
        words = filler[(i * 7 + np.arange(6 + i % 9)) % len(filler)]
        lines.append(" ".join(words) + "\n")
        contents.append("".join(lines))

    commits = [
        hashlib.sha256(f"{r}/{p}".encode()).hexdigest()[:12]
        for r, p in zip(repos, paths)
    ]
    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def expected_references(docs: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas oracle for the extraction stage.

    Returns (src_path, dst_key, n_refs) for every *resolvable* reference
    (dangling ones excluded), independent of the Spark implementation.
    """
    import re

    pat = re.compile(r'"([^"]+)"')
    rows = []
    known = {p.rsplit(".", 1)[0] for p in docs["path"]}
    for _, r in docs.iterrows():
        for m in pat.findall(r["content"]):
            key = m.rsplit(".", 1)[0] if m.endswith((".h", ".hpp")) else m
            if key in known:
                rows.append((r["path"], key))
    if not rows:
        return pd.DataFrame(columns=["src_path", "dst_key", "n_refs"])
    out = pd.DataFrame(rows, columns=["src_path", "dst_key"])
    return (
        out.groupby(["src_path", "dst_key"], as_index=False)
        .size()
        .rename(columns={"size": "n_refs"})
    )


def documents_spark_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Corpus as a Spark DataFrame (Arrow-accelerated createDataFrame).

    At real scale this is replaced by ``spark.read.format("iceberg")``
    over the repository table; generation here stands in for the scan.
    """
    pdf = generate_documents(n_docs, seed)
    df = spark.createDataFrame(pdf)
    if partitions:
        df = df.repartition(partitions, "repo", "path")
    return df


def write_corpus_parquet(spark, n_docs: int, out_dir: str, seed: int = 42) -> str:
    path = f"{out_dir.rstrip('/')}/documents_src"
    documents_spark_df(spark, n_docs, seed).write.mode("overwrite").parquet(path)
    return path


def corpus_parquet_path(n_docs: int, seed: int = 42) -> str:
    """Stable on-disk path of the materialized corpus parquet (see
    :func:`ensure_corpus_parquet`). Pure — safe to embed in oracle SQL
    strings at registration time, before the file exists."""
    return f"/tmp/cgs_corpus_{n_docs}_s{seed}_v1.parquet"


def ensure_corpus_parquet(n_docs: int, seed: int = 42) -> str:
    """Materialize ``generate_documents(n_docs, seed)`` at its stable
    parquet path (idempotent; atomic rename so concurrent callers never
    see a partial file).

    The DuckDB oracles of the ``corpus_*`` registry queries read this
    file by absolute path: the generator is seed-deterministic, so the
    SQL oracle sees input identical to what the engine builds in-memory
    without the two ever sharing a process — the same independence
    contract as the sf-dir parquet views (reference test model:
    data_checks/conftest.py:10-72 loads produced tables read-only)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = corpus_parquet_path(n_docs, seed)
    if not os.path.exists(path):
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path) or ".", suffix=".parquet"
        )
        os.close(fd)
        pq.write_table(
            pa.Table.from_pandas(
                generate_documents(n_docs, seed=seed), preserve_index=False
            ),
            tmp,
        )
        os.replace(tmp, path)
    return path
