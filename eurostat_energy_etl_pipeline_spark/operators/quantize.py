"""Embedding quantization: symmetric per-vector int8 with reconstruction
audit.

At 100 TB the embedding store, not the text, dominates ANN serving cost:
float32 x 1024-dim is 4 KB/vector, and both the IVF cells
(`operators/similarity.write_ivf_index`) and any broadcast probe side
shrink 4x when stored int8. This module implements the standard
symmetric scheme (FAISS `ScalarQuantizer` QT_8bit_direct semantics /
ONNX-style per-tensor scaling, applied per vector):

    scale = 127 / max_i |x_i|          (vector of zeros keeps scale NULL)
    q_i   = round(x_i * scale)  in [-127, 127]
    x'_i  = q_i / scale

Everything is Catalyst higher-order functions (`transform`, `aggregate`)
— JVM codegen end-to-end, no UDFs, so quantizing a 100 TB corpus is one
narrow map stage with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(vec: Column) -> Column:
    """max_i |x_i| as a double (0.0 for an all-zero or empty vector)."""
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, scale, qvec): per-vector symmetric int8 quantization. `qvec`
    is array<tinyint> (the 4x storage win); `scale` is the per-vector
    dequantization constant. All-zero vectors get scale NULL and a NULL
    qvec — they cannot be represented and downstream consumers must
    decide (exact zero distance vs drop)."""
    emax = _max_abs(F.col(vec_col))
    scale = F.when(emax > 0, F.lit(127.0) / emax)
    qvec = F.when(
        emax > 0,
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(127.0) / emax).cast(
                "tinyint"
            ),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), scale.alias("scale"), qvec.alias("qvec")
    )


def reconstruction_error(vec: Column, scale: Column) -> Column:
    """max_i |x_i - round(x_i * scale)/scale| — the per-vector worst-case
    dequantization error, computed against the original floats without
    materializing the int8 vector (the audit runs pre-write)."""
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(
            acc,
            F.abs(
                x.cast("double")
                - F.round(x.cast("double") * scale) / scale
            ),
        ),
    )
