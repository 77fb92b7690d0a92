"""Document chunking: split text into fixed-size overlapping token windows —
the context-window preparation step of an LLM training/RAG pipeline
(each chunk becomes one training sequence / retrieval unit).

Shape at scale: the whole operator is scan-side expressions — tokenize once,
compute the chunk grid arithmetically, `explode` the grid, `slice` the token
array per chunk. No shuffle, no Python, and the fan-out is bounded by
ceil(n_tokens/stride) per document, so output size is a fixed multiple of
input tokens regardless of cluster size. Catalyst keeps the tokenize
expression shared across the exploded rows (it is evaluated in the generate's
child projection, once per document, not once per chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.text import whitespace_tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """One row per (document, chunk): overlapping windows of `chunk_tokens`
    whitespace tokens advancing by `stride` (stride < chunk_tokens gives
    overlap). Every document yields at least one chunk (short docs -> one
    partial chunk); the final chunk may be shorter than `chunk_tokens`.

    Columns: `{id_col}`, `chunk_id` (0-based), `n_chunk_tokens`,
    `chunk_text`. Chunk count = max(ceil((n - chunk)/stride), 0) + 1 — the
    smallest set of windows covering every token with the given stride.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError(f"need 0 < stride <= chunk_tokens, got {stride}/{chunk_tokens}")
    toks = whitespace_tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.greatest(
            F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(stride)).cast("int"),
            F.lit(0),
        )
        + 1
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return (
        df.select(F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc"))
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
