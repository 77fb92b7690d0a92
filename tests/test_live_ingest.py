"""Live-API ingest path (S1 -> K1), exercised with a mocked HTTP layer.

Covers the previously-untested `--dataset code=url` CLI route of
`etl.job.main`: fetch_jsonstat (requests.get, /root/reference/etl/main.py:76-77
parity) -> decode_jsonstat -> run_etl -> warehouse write -> read-back.
"""

import sys

import pytest

from eurostat_energy_etl_pipeline_spark.etl.job import main, read_warehouse
from eurostat_energy_etl_pipeline_spark.sources.jsonstat import fetch_jsonstat
from tests.test_jsonstat import FIXTURE

URL = "https://example.invalid/eurostat/api/nrg_cb_e?format=JSON"


class _FakeResponse:
    def __init__(self, payload):
        self._payload = payload

    def json(self):
        return self._payload


def test_fetch_jsonstat_parses_response(monkeypatch):
    import requests

    seen = {}

    def fake_get(url, timeout=None):
        seen["url"], seen["timeout"] = url, timeout
        return _FakeResponse(FIXTURE)

    monkeypatch.setattr(requests, "get", fake_get)
    payload = fetch_jsonstat(URL)
    assert payload is FIXTURE
    assert seen["url"] == URL
    assert seen["timeout"] == 60  # unlike the reference, never hangs forever


def test_cli_dataset_route_end_to_end(spark, monkeypatch, tmp_path, capsys):
    """`etl.job.main --dataset nrg_cb_e=<url>` with a mocked HTTP layer:
    the frozen §3.1 fixture flows S1 -> decode -> clean -> stamp -> K1
    warehouse write; the reference's 'Loaded N rows' telemetry is printed."""
    import requests

    monkeypatch.setattr(requests, "get", lambda url, timeout=None: _FakeResponse(FIXTURE))
    wh = str(tmp_path / "obs")
    monkeypatch.setattr(
        sys, "argv", ["job", "--dataset", f"nrg_cb_e={URL}", "--warehouse", wh]
    )
    main()
    assert "Loaded 5 rows" in capsys.readouterr().out
    out = read_warehouse(spark, wh)
    assert out.count() == 5  # §3.1 fixture: 5 rows incl. ZZ label-fallback
    got = {r["country_code"] for r in out.collect()}
    assert "ZZ" in got
    assert "load_timestamp" in out.columns


def test_cli_from_dir_route_end_to_end(spark, monkeypatch, tmp_path, capsys):
    """`etl.job.main --from-dir <dir>` on a frozen response directory: every
    saved JSON-stat document becomes one datasource partition, decodes
    executor-side, and lands in the partitioned warehouse — the full
    recorded-extract round trip (S1 -> S3 -> K1) with no HTTP at all. A
    second append run over the same directory doubles the row count,
    proving the CLI's mode flag reaches the writer."""
    import json

    resp_dir = tmp_path / "responses"
    resp_dir.mkdir()
    # file stem = dataset_code (the datasource default): two datasets, the
    # same frozen payload
    for code in ("nrg_cb_e", "ten00124"):
        (resp_dir / f"{code}.json").write_text(json.dumps(FIXTURE))
    wh = str(tmp_path / "obs")
    monkeypatch.setattr(
        sys, "argv", ["job", "--from-dir", str(resp_dir), "--warehouse", wh]
    )
    main()
    assert "Loaded 10 rows" in capsys.readouterr().out

    out = read_warehouse(spark, wh)
    assert out.count() == 10
    assert {r["dataset_code"] for r in out.collect()} == {"nrg_cb_e", "ten00124"}
    # K1 layout: physically partitioned by dataset_code + year
    part_dirs = {p.name for p in (tmp_path / "obs").iterdir() if p.is_dir()}
    assert part_dirs == {"dataset_code=nrg_cb_e", "dataset_code=ten00124"}
    year_dirs = [
        p.name
        for p in (tmp_path / "obs" / "dataset_code=nrg_cb_e").iterdir()
        if p.is_dir()
    ]
    assert year_dirs and all(d.startswith("year=") for d in year_dirs)

    monkeypatch.setattr(
        sys,
        "argv",
        ["job", "--from-dir", str(resp_dir), "--warehouse", wh, "--mode", "append"],
    )
    main()
    assert "Loaded 10 rows" in capsys.readouterr().out
    assert read_warehouse(spark, wh).count() == 20


def test_cli_requires_a_source(monkeypatch):
    monkeypatch.setattr(sys, "argv", ["job"])
    with pytest.raises(SystemExit, match="no --dataset"):
        main()
