"""Sequence packing: assign documents to fixed-token-budget training bins.

LLM pretraining concatenates documents into fixed-length sequences; the
batch-side primitive is "which documents land in which bin". True first-fit
bin packing is inherently sequential, so the distributed formulation packs
WITHIN a shard (training data is sharded across loader workers anyway): an
order-preserving greedy fill where a document's bin is the number of whole
budgets consumed before it, computed as a running-sum window partitioned by
the shard key — one shuffle on the shard, no global sort, no state.

Semantics: documents are taken in stable (shard, order-key) order; bin k of
a shard holds the documents whose preceding-token cumsum lies in
[k*budget, (k+1)*budget). A document may overflow its bin's budget (it is
not split); callers that require hard caps filter oversized documents first
— the standard drop-or-truncate preprocessing step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_col: Column,
    budget: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Adds `bin_id` (0-based per shard) to ``df``.

    `bin_id = (tokens before this doc in shard order) div budget` — exact
    integer arithmetic, deterministic on any cluster/partitioning because
    the order inside a shard is total (``order_col`` must be unique per
    shard)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = Window.partitionBy(shard_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    # token cumsums sit far below 2^53, so double division is exact here;
    # floor(x/b) == x div b for the non-negative cumsum.
    return df.withColumn("bin_id", F.floor(prev / F.lit(budget)).cast("long"))
