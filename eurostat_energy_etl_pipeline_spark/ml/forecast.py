"""Per-series forecasting as an `applyInPandas` grouped map.

Reference semantics (/root/reference/ml/forecast_utils.py): per
(geo, indicator) series -> lag/rolling feature matrix (:30-51) -> two
candidate models trained with a time-ordered holdout (:64-65,:125-126) ->
min-RMSE selection (:192-204) -> recursive 5-step forecast (:83-110) ->
historical + forecast rows with a discriminator column (:206-213) and the
insufficient-data guard (:180-185).

Spark shape: parallelism is ACROSS series (one shuffle on the group key);
within a series the recursion is inherently sequential, so it lives inside
the group function on a ≤~60-row pandas frame. xgboost/statsmodels are not
in this container, so the two model slots degrade deterministically:

- feature-AR slot: XGBRegressor (n_estimators=300, max_depth=3, lr=0.05,
  subsample=0.8, colsample=0.8, seed=42 — the reference config :67-75) when
  xgboost is importable, else a numpy least-squares AR on the same features;
- smoothing slot: statsmodels ExponentialSmoothing (additive trend :117-148)
  when importable, else a direct Holt's-linear implementation with a
  deterministic grid search over (alpha, beta).

The `model` column reports which implementation won, so results are
self-describing across environments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - env-dependent
    from xgboost import XGBRegressor

    HAVE_XGB = True
except ImportError:
    HAVE_XGB = False

try:  # pragma: no cover - env-dependent
    from statsmodels.tsa.holtwinters import ExponentialSmoothing

    HAVE_STATSMODELS = True
except ImportError:
    HAVE_STATSMODELS = False

HORIZON = 5
N_LAGS = 3
ROLL = 3
MIN_POINTS = 5

FORECAST_SCHEMA = StructType(
    [
        StructField("geo", StringType()),
        StructField("indicator", StringType()),
        StructField("year", IntegerType()),
        StructField("value", DoubleType()),
        StructField("type", StringType()),
        StructField("model", StringType()),
    ]
)


def _features(y: np.ndarray, years: np.ndarray) -> pd.DataFrame:
    """M2 feature matrix: year + lag1..3 + rolling mean/std(3, min_periods=3)
    (/root/reference/ml/forecast_utils.py:30-51)."""
    s = pd.Series(y)
    df = pd.DataFrame({"year": years, "y": y})
    for k in range(1, N_LAGS + 1):
        df[f"lag{k}"] = s.shift(k)
    df["roll_mean_3"] = s.shift(1).rolling(ROLL, min_periods=ROLL).mean()
    df["roll_std_3"] = s.shift(1).rolling(ROLL, min_periods=ROLL).std()
    return df.dropna()


_FEATURE_COLS = ["year", "lag1", "lag2", "lag3", "roll_mean_3", "roll_std_3"]


class _ARModel:
    """Feature-based regressor: xgboost when available, else least squares."""

    name = "XGBoost" if HAVE_XGB else "LeastSquaresAR"

    def fit(self, X: np.ndarray, y: np.ndarray) -> "_ARModel":
        if HAVE_XGB:
            self.m = XGBRegressor(
                n_estimators=300,
                max_depth=3,
                learning_rate=0.05,
                subsample=0.8,
                colsample_bytree=0.8,
                random_state=42,
            )
            self.m.fit(X, y)
        else:
            A = np.column_stack([np.ones(len(X)), X])
            self.w, *_ = np.linalg.lstsq(A, y, rcond=None)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        if HAVE_XGB:
            return np.asarray(self.m.predict(X), dtype=float)
        return np.column_stack([np.ones(len(X)), X]) @ self.w


def _holt(y: np.ndarray, alpha: float, beta: float):
    """Holt's linear (additive trend) recursion; returns (level, trend,
    one-step-ahead fitted values)."""
    level, trend = y[0], (y[1] - y[0]) if len(y) > 1 else 0.0
    fitted = np.empty(len(y) - 1)
    for t in range(1, len(y)):
        f = level + trend
        fitted[t - 1] = f
        new_level = alpha * y[t] + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
    return level, trend, fitted


class _SmoothingModel:
    """Additive-trend exponential smoothing; statsmodels when available,
    else Holt recursion with a deterministic (alpha, beta) grid."""

    name = "ExponentialSmoothing" if HAVE_STATSMODELS else "HoltLinear"
    GRID = [0.2, 0.5, 0.8]

    def fit(self, y: np.ndarray) -> "_SmoothingModel":
        self.y = y
        if HAVE_STATSMODELS:
            self.m = ExponentialSmoothing(y, trend="add", seasonal=None).fit()
        else:
            best = (np.inf, 0.5, 0.5)
            for a in self.GRID:
                for b in self.GRID:
                    _, _, fitted = _holt(y, a, b)
                    sse = float(np.sum((y[1:] - fitted) ** 2))
                    if sse < best[0]:
                        best = (sse, a, b)
            _, self.alpha, self.beta = best
            self.level, self.trend, _ = _holt(y, self.alpha, self.beta)
        return self

    def forecast(self, h: int) -> np.ndarray:
        if HAVE_STATSMODELS:
            return np.asarray(self.m.forecast(h), dtype=float)
        return self.level + self.trend * np.arange(1, h + 1)


def _recursive_forecast(model: _ARModel, y: list[float], years: list[int], h: int):
    """M5: feed predictions back into the lag features, h steps
    (/root/reference/ml/forecast_utils.py:83-110)."""
    y, years = list(y), list(years)
    out = []
    for _ in range(h):
        next_year = years[-1] + 1
        s = pd.Series(y)
        row = [
            float(next_year),
            y[-1],
            y[-2],
            y[-3],
            float(s.iloc[-ROLL:].mean()),
            float(s.iloc[-ROLL:].std(ddof=1)),
        ]
        pred = float(model.predict(np.array([row]))[0])
        out.append((next_year, pred))
        y.append(pred)
        years.append(next_year)
    return out


def _rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((a - b) ** 2)))


def _forecast_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """The grouped-map kernel: one (geo, indicator) series in, historical +
    forecast rows out."""
    pdf = pdf.sort_values("yr")
    geo, indicator = pdf["geo"].iloc[0], pdf["indicator"].iloc[0]
    years = pdf["yr"].to_numpy(dtype=int)
    y = pdf["val"].to_numpy(dtype=float)
    n = len(y)
    if n < MIN_POINTS:  # M8 guard (:180-185)
        return pd.DataFrame(columns=[f.name for f in FORECAST_SCHEMA.fields])

    test_size = min(5, max(2, n // 3))
    candidates = []

    feats = _features(y, years)
    if len(feats) > test_size:
        train, test = feats.iloc[:-test_size], feats.iloc[-test_size:]
        ar = _ARModel().fit(train[_FEATURE_COLS].to_numpy(), train["y"].to_numpy())
        rmse = _rmse(ar.predict(test[_FEATURE_COLS].to_numpy()), test["y"].to_numpy())
        full = _ARModel().fit(feats[_FEATURE_COLS].to_numpy(), feats["y"].to_numpy())
        candidates.append(
            (rmse, _ARModel.name, lambda m=full: _recursive_forecast(
                m, list(y), list(years), HORIZON))
        )

    if n - test_size >= 2:
        sm = _SmoothingModel().fit(y[:-test_size])
        rmse = _rmse(sm.forecast(test_size), y[-test_size:])
        sm_full = _SmoothingModel().fit(y)
        candidates.append(
            (rmse, _SmoothingModel.name, lambda m=sm_full: [
                (int(years[-1] + i + 1), float(v))
                for i, v in enumerate(m.forecast(HORIZON))
            ])
        )

    if not candidates:
        return pd.DataFrame(columns=[f.name for f in FORECAST_SCHEMA.fields])

    rmse, name, run = min(candidates, key=lambda c: c[0])
    future = run()
    hist = pd.DataFrame(
        {"year": years, "value": y, "type": "historical", "model": name}
    )
    fut = pd.DataFrame(
        {
            "year": [yr for yr, _ in future],
            "value": [v for _, v in future],
            "type": "forecast",
            "model": name,
        }
    )
    out = pd.concat([hist, fut], ignore_index=True)
    out.insert(0, "indicator", indicator)
    out.insert(0, "geo", geo)
    out["year"] = out["year"].astype("int32")
    return out


def forecast_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast every (geo, indicator) series from the warehouse view —
    U2's historical+forecast union built per group."""
    from eurostat_energy_etl_pipeline_spark.plans.insights import yearly_series_view

    series = yearly_series_view(spark, sf_dir)
    # Explicit repartition by the group key: the data is tiny in BYTES but
    # expensive in PYTHON (a model fit per group), and AQE's size-based
    # coalescing would pack every group into one task — serializing all the
    # fits. A user-specified partition count is exempt from AQE coalescing,
    # and hash-partitioning on the exact group key means groupBy adds no
    # second shuffle. Same reasoning holds on a 1000-executor cluster:
    # grouped-map ML stages are CPU-bound, not size-bound.
    n_parts = spark.sparkContext.defaultParallelism
    return (
        series.repartition(n_parts, "geo", "indicator")
        .groupBy("geo", "indicator")
        .applyInPandas(_forecast_group, FORECAST_SCHEMA)
    )


def forecast_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry (rows-only check; invariants in tests/test_forecast).

    r15: total ordering via ``ordered_output`` — a bare ``orderBy``
    plans a range exchange whose boundary sampler EXECUTES the child,
    i.e. every per-series model fit ran twice per action in the AQE-off
    interactive regime (guide §7.2, the q87 lesson). Same rows, same
    total order on both regimes."""
    from eurostat_energy_etl_pipeline_spark.functions import ordered_output

    return ordered_output(
        forecast_all(spark, sf_dir), "geo", "indicator", "type", "year"
    )
