"""PySpark-native analytics engine with the query surface of
nitishkpandey/Eurostat-Energy-ETL-Pipeline (reference at /root/reference,
read-only), re-expressed Spark-first.

Layout:
    session      -- tuned SparkSession factory (AQE, shuffle partitions, UTC)
    catalog      -- parquet table loader + derived reference-shaped views
    functions    -- deterministic column helpers (decimal-exact aggregates,
                    trend classification, rolling with pandas min_periods)
    plans        -- the declared query library (SURVEY.md §2.12 Q1-Q22 + extras)
    sources      -- JSON-stat dense-cube decoder (custom source adapter)
    etl          -- warehouse load job with append/truncate/full-refresh modes
    ml           -- per-series forecasting via applyInPandas grouped map
    rag          -- TF-IDF index + cosine top-k + intent router
    operators    -- LLM-data-pipeline operators: dedup (exact/minhash/simhash/
                    jaccard), similarity search, text analysis, multimodal
    streaming    -- Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"
