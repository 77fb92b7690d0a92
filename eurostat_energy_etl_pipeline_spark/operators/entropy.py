"""Character-entropy quality screening — the gibberish/boilerplate filter
of CCNet/Gopher-style corpus pipelines (low-entropy text is repeated
characters or markup; high-entropy text is encrypted/binary junk).

Scale shape: per-document Shannon entropy is dense byte-level counting —
exactly the workload class where the Arrow-batched numpy kernel beats
both Catalyst paths (SCALE.md §kNN lesson): per-char `explode` +
`groupBy(doc, char)` shuffles an instance stream orders of magnitude
larger than the corpus rows, and a higher-order-function histogram costs
O(len x distinct) interpreted lambda calls per row. The kernel below is
O(batch) memory, fully vectorized (one `np.unique` over the
batch-concatenated code-point array — no per-row Python loop beyond the
C-speed UTF-32 encode), and runs scan-side inside `mapInPandas`: zero
shuffle, composable onto any filter/projection, embarrassingly parallel
across partitions.

Determinism: both engines sum -p*log2(p) over a per-doc char histogram
in different orders; the 1e-4 floor-grid round (`portable_round`) is the
same accepted tolerance class as q82's log-ratio scores, verified
mismatch-free across sf0.01 and sf0.1 corpora.

Character model (the operator contract): a "character" is one UNICODE
CODE POINT — the UTF-32 unit the kernel encodes to. No grapheme
clustering (a combining sequence counts one unit per combining mark)
and no UTF-16 surrogate splitting (an astral-plane char counts once).
Any differential oracle must split the same way; DuckDB's
string_split(text, '') is code-point-splitting and agrees, but
UTF-16-unit engines would not on astral-plane text.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from eurostat_energy_etl_pipeline_spark.functions import widen_if_narrow

ENTROPY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", IntegerType()),
        StructField("entropy", DoubleType()),
    ]
)


def _batch_entropy(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-doc character entropy for one Arrow batch.

    Returns (n_chars, entropy_bits) arrays aligned with ``texts``. The
    whole batch becomes ONE uint64 key array (doc_index << 32 | code
    point, valid because Unicode code points < 2^21) reduced by a single
    ``np.unique`` — no per-document histogram loop.
    """
    enc = [t.encode("utf-32-le") for t in texts.fillna("")]
    lens = np.fromiter((len(b) >> 2 for b in enc), np.int64, count=len(enc))
    ent = np.zeros(len(enc), dtype=np.float64)
    if lens.sum() == 0:
        return lens, ent
    cps = np.frombuffer(b"".join(enc), dtype=np.uint32)
    doc = np.repeat(np.arange(len(enc), dtype=np.uint64), lens)
    key = (doc << np.uint64(32)) | cps.astype(np.uint64)
    uniq, cnt = np.unique(key, return_counts=True)
    udoc = (uniq >> np.uint64(32)).astype(np.int64)
    p = cnt / lens[udoc]
    np.add.at(ent, udoc, -p * np.log2(p))
    return lens, ent


def char_entropy_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document (doc_id, lang, n_chars, entropy) via the scan-side
    Arrow kernel. Empty/null text scores entropy 0 over 0 chars."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens, ent = _batch_entropy(pdf[text_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "lang": pdf["lang"].to_numpy(),
                    "n_chars": lens.astype(np.int32),
                    "entropy": ent,
                }
            )

    pruned = widen_if_narrow(docs).select("doc_id", "lang", text_col)
    return pruned.mapInPandas(run, ENTROPY_SCHEMA)
