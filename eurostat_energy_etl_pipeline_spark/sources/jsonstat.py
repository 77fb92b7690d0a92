"""Eurostat JSON-stat dense-cube source adapter (S1-S5).

The reference decodes the cube with a per-cell Python loop on the driver
(/root/reference/etl/main.py:84-125). Here the *header* (dimension labels,
sizes — a few KB) is parsed driver-side, while the O(cells) work — flat-index
unraveling, label resolution, allow-list filtering — is a Spark plan over the
(flat_index, value) pairs:

- unravel: integer div/mod per dimension (pure arithmetic, codegen);
- label resolution (S4): `create_map` literals for the tiny per-dim label
  dicts — constant-folded broadcast lookup, no join needed;
- indicator allow-list (P8/J2): `isin` semi-join semantics.

The HTTP fetch itself (S1) stays driver-side by design: the payload is tiny
and the decode is where the data-parallel work is. `fetch_jsonstat` is the
(requests-based) integration point; `decode_jsonstat` is pure and testable
against the frozen fixture (FIXTURES.md §3.1).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

REQUIRED_KEYS = ("dimension", "value", "size")

# Reference indicator allow-list (/root/reference/etl/main.py:53-64,111-113)
DEFAULT_INDICATORS = ("GEP", "FC_E", "FC_IND_E", "FC_TRA_E", "FC_OTH_CP_E", "FC_OTH_HH_E")

OBSERVATION_COLUMNS = (
    "dataset_code",
    "country_code",
    "country_name",
    "indicator_code",
    "indicator_label",
    "unit_code",
    "unit_label",
    "time",
    "value",
)


def validate(payload: dict[str, Any]) -> bool:
    """S2: response-shape guard (/root/reference/etl/main.py:79-81)."""
    return all(k in payload for k in REQUIRED_KEYS)


def find_indicator_dim(
    payload: dict[str, Any], indicators=DEFAULT_INDICATORS
) -> str | None:
    """S5: detect which dimension carries the indicator codes
    (/root/reference/etl/main.py:67-72)."""
    for dim in payload["id"]:
        index = payload["dimension"][dim]["category"]["index"]
        if any(code in index for code in indicators):
            return dim
    return None


def fetch_jsonstat(url: str) -> dict[str, Any]:
    """S1: driver-side HTTP GET (payload is KB-scale; the decode is the
    distributed part)."""
    import requests  # local import: optional dependency

    return requests.get(url, timeout=60).json()


def _codes_by_position(payload: dict[str, Any], dim: str) -> dict[int, str]:
    index = payload["dimension"][dim]["category"]["index"]
    if isinstance(index, list):  # JSON-stat also allows list form
        return dict(enumerate(index))
    return {pos: code for code, pos in index.items()}


def decode_jsonstat(
    spark: SparkSession,
    payload: dict[str, Any],
    dataset_code: str,
    indicators=DEFAULT_INDICATORS,
) -> DataFrame:
    """Decode a JSON-stat dense cube into observation rows.

    Returns an empty DataFrame with the declared schema when the payload
    fails validation (S2's empty-result contract)."""
    schema = StructType(
        [StructField("flat_idx", LongType()), StructField("value", DoubleType())]
    )
    empty_out = spark.createDataFrame([], _out_schema())
    if not validate(payload):
        return empty_out

    dims: list[str] = payload["id"]
    sizes: list[int] = payload["size"]
    data = [(int(k), float(v)) for k, v in payload["value"].items()]
    # Size the Python-side slice count to the data, not defaultParallelism:
    # a plain createDataFrame pickles the rows into one RDD partition PER
    # CORE, and every partition costs a Python-worker round-trip at each
    # execution — a 8-row cube sliced 32 ways costs 32 round-trips (~5 s
    # when a downstream coalesce serializes them into one task). ~50k rows
    # per slice keeps big cubes parallel and small ones single-slice.
    n_slices = max(1, min(len(data) // 50_000 + 1, 32))
    cells = spark.createDataFrame(
        spark.sparkContext.parallelize(data, n_slices), schema
    )

    # Row-major unravel, last dim fastest (/root/reference/etl/main.py:97-102):
    # coord_d = (flat_idx // prod(sizes[d+1:])) % sizes[d]
    out = cells
    for d, dim in enumerate(dims):
        stride = math.prod(sizes[d + 1 :])
        # Integer `div`, matching the pure-Python kernel's `//` exactly —
        # double division loses exactness for flat_idx above 2^53.
        coord = F.expr(f"flat_idx div {stride}") % sizes[d]
        codes = _codes_by_position(payload, dim)
        labels = payload["dimension"][dim]["category"].get("label", {})
        code_map = F.create_map(
            *[x for pos, code in codes.items() for x in (F.lit(pos), F.lit(code))]
        )
        code_col = code_map.getItem(coord)
        out = out.withColumn(f"__code_{dim}", code_col)
        if labels:
            label_map = F.create_map(
                *[x for code, lab in labels.items() for x in (F.lit(code), F.lit(lab))]
            )
            # Fallback to the code when no label exists (etl/main.py:118)
            out = out.withColumn(
                f"__label_{dim}", F.coalesce(label_map.getItem(code_col), code_col)
            )
        else:
            out = out.withColumn(f"__label_{dim}", code_col)

    ind_dim = find_indicator_dim(payload, indicators)
    geo_dim = "geo" if "geo" in dims else None
    time_dim = "time" if "time" in dims else None
    unit_dim = "unit" if "unit" in dims else None
    if ind_dim is None or geo_dim is None or time_dim is None:
        return empty_out

    def code(d):
        return F.col(f"__code_{d}")

    def label(d):
        return F.col(f"__label_{d}")

    null_s = F.lit(None).cast("string")
    return (
        out.where(code(ind_dim).isin(list(indicators)))  # P8 allow-list
        .select(
            F.lit(dataset_code).alias("dataset_code"),
            code(geo_dim).alias("country_code"),
            label(geo_dim).alias("country_name"),
            code(ind_dim).alias("indicator_code"),
            label(ind_dim).alias("indicator_label"),
            (code(unit_dim) if unit_dim else null_s).alias("unit_code"),
            (label(unit_dim) if unit_dim else null_s).alias("unit_label"),
            F.to_date(code(time_dim), "yyyy").alias("time"),  # P3
            F.col("value").cast("double").alias("value"),  # P2
        )
    )


def _out_schema() -> StructType:
    from pyspark.sql.types import DateType, StringType

    fields = [
        StructField(c, DateType() if c == "time" else (DoubleType() if c == "value" else StringType()))
        for c in OBSERVATION_COLUMNS
    ]
    return StructType(fields)


# Frozen §3.1 golden payload (FIXTURES.md) — a 2x3x2 dense cube with a sparse
# value map, an out-of-allowlist indicator ('XXX'), and a geo ('ZZ') whose
# label is absent (exercising the label->code fallback). This is the payload
# the declared query q71 decodes under the driver's oracle gate; tests pin
# the same rows independently (tests/test_jsonstat.py).
GOLDEN_FIXTURE: dict = {
    "id": ["nrg_bal", "geo", "time"],
    "size": [2, 3, 2],
    "dimension": {
        "nrg_bal": {
            "category": {
                "index": {"GEP": 0, "XXX": 1},
                "label": {"GEP": "Gross electricity production", "XXX": "Other"},
            }
        },
        "geo": {
            "category": {
                "index": {"DE": 0, "FR": 1, "ZZ": 2},
                "label": {"DE": "Germany", "FR": "France"},
            }
        },
        "time": {
            "category": {
                "index": {"2022": 0, "2023": 1},
                "label": {"2022": "2022", "2023": "2023"},
            }
        },
    },
    "value": {
        "0": 100.5,
        "1": 101.0,
        "2": 200.0,
        "3": 201.5,
        "4": 300.0,
        "6": 999.0,
        "7": 998.0,
        "10": 42.0,
    },
}
