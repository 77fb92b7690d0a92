"""Forecasting operators (reference ml/forecast_utils.py) as grouped-map
pipelines."""
