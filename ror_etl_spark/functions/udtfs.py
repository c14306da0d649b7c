"""Python user-defined table functions (Spark 3.5+ ``@udtf``).

UDTFs are the lateral-view escape hatch: one input row → many typed
output rows, usable directly in SQL FROM clauses. They execute
row-at-a-time in Python workers — the SLOW path — so the rule from the
package docs applies doubly: use a UDTF only when the row expansion
needs imperative logic (stateful parsers, external tokenizers);
anything expressible as explode(split/sequence/transform) belongs in
codegen (see ``queries/misc3.py::text_chunk_documents`` for the fast
twin). This module exists to cover the API surface with a correctness
oracle, not to recommend the pattern at scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word: string, wlen: int")
class WordExplode:
    """text → one (word, length) row per whitespace token, skipping
    empty tokens (multi-space runs)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        for w in (text or "").split():
            yield (w, len(w))


def register_udtfs(spark: SparkSession) -> None:
    """Register all package UDTFs on the session (idempotent)."""
    spark.udtf.register("word_explode", WordExplode)
