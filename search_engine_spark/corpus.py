"""Deterministic synthetic source-code corpus in the input contract shape.

Contract (BASELINE.json input_hint / FIXTURES.md §1): an Iceberg/Parquet
table ``(repo string, path string, commit string, lang string, content
string)``. At production scale this arrives as an Iceberg table of real
repositories; here we synthesize it deterministically (pure function of the
row index — no RNG state, so any row can be generated independently on any
executor and regeneration is reproducible).

Content mixes ASCII identifiers, digits, CJK comment runs (exercises the
U+4E00-U+9FA5 tokenizer range), punctuation (run breakers) and mixed case
(tokens are case-sensitive). ``lang='html'`` rows carry full HTML documents
so the title-extraction path (parser.go:22-37) is exercised.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LANGS = ["go", "py", "java", "js", "md", "html"]
_EXT = {"go": "go", "py": "py", "java": "java", "js": "js", "md": "md", "html": "html"}

_IDENTS = [
    "handler", "Parse", "index", "токen", "buffer", "Merge", "postings",
    "score", "query", "доc", "Flush", "encode", "varint", "cursor",
    "hello", "world", "HelloWorld", "abcdef", "ABCdef", "in", "re", "se",
    "func", "return", "import", "package", "class", "def", "const", "var",
]
_CJK = ["倒排索引", "搜索引擎", "你好世界", "分词器", "压缩编码", "布隆过滤器"]
_PUNCT = [" ", "(", ")", "{", "}", ".", ",", ";", " = ", " := ", "\n", "//", "#"]


def _row_content(i: int) -> str:
    """Deterministic pseudo-source-code for row i (pure function, no RNG)."""
    h = hashlib.sha256(f"content:{i}".encode()).digest()
    n_lines = 3 + h[0] % 14
    parts: list[str] = []
    state = int.from_bytes(h[1:9], "big")
    for ln in range(n_lines):
        n_tok = 2 + (state >> (ln % 32)) % 7
        for t in range(n_tok):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            pick = state % 100
            if pick < 70:
                parts.append(_IDENTS[state % len(_IDENTS)])
            elif pick < 80:
                parts.append(str(state % 10000))
            elif pick < 90:
                parts.append(_CJK[state % len(_CJK)])
            else:
                parts.append(_IDENTS[state % len(_IDENTS)].upper())
            parts.append(_PUNCT[(state >> 8) % len(_PUNCT)])
        parts.append("\n")
    return "".join(parts)


def _row(i: int) -> tuple[str, str, str, str, str]:
    repo = f"org{i % 7}/repo{i % 23}"
    lang = _LANGS[i % len(_LANGS)]
    path = f"src/pkg{i % 11}/file{i}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}:{path}:{i}".encode()).hexdigest()
    body = _row_content(i)
    if lang == "html":
        content = (
            f"<html><head><title>Doc {i} 文档 {_IDENTS[i % len(_IDENTS)]}</title>"
            f"<style>p {{color: red}}</style></head>"
            f"<body><script>var x = {i};</script><p>{body}</p></body></html>"
        )
    else:
        content = body
    return repo, path, commit, lang, content


def generate_corpus(spark: SparkSession, n_docs: int, n_partitions: int = 8) -> DataFrame:
    """Synthesize the corpus table distributed: each executor materializes its
    own row range (pure function of i), so generation itself scales."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            rows = [_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    base = spark.range(0, n_docs, numPartitions=n_partitions)
    df = base.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string"
    )
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


# FIXTURES.md §4 reference query set (rank-identity corpus). q09/q12 are
# empty-result probes; kept — latency includes the early-exit path, as the
# reference's API would measure it. Shared by tools/scale_bench.py and
# bench.py so the published p50/p95 always describe the same workload.
REFERENCE_QUERY_SET = [
    ("q01", "hello"),
    ("q02", "world"),
    ("q03", "你好世界"),
    ("q04", "hello world"),
    ("q05", "hello -world"),
    ("q06", "hello site:org1"),
    ("q07", "abcdef"),
    ("q08", "ABCdef"),
    ("q09", "z"),
    ("q10", "qqqq"),
    ("q11", "in"),
    ("q12", ""),
]
