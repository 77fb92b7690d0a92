"""Golden-fixture tests for the JSON-stat source adapter (FIXTURES.md §3.1,
SURVEY.md §5.2.2) — every decode path: sparse value map, label fallback,
allow-list filter, invalid payload."""

import pytest

from eurostat_energy_etl_pipeline_spark.sources.jsonstat import (
    decode_jsonstat,
    find_indicator_dim,
    validate,
)

FIXTURE = {
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

EXPECTED = [
    ("GEP", "DE", "Germany", "2022-01-01", 100.5),
    ("GEP", "DE", "Germany", "2023-01-01", 101.0),
    ("GEP", "FR", "France", "2022-01-01", 200.0),
    ("GEP", "FR", "France", "2023-01-01", 201.5),
    ("GEP", "ZZ", "ZZ", "2022-01-01", 300.0),  # label fallback to code
]


@pytest.fixture(scope="module")
def decoded(spark):
    return decode_jsonstat(spark, FIXTURE, "nrg_cb_e", indicators=["GEP"])


def test_validate():
    assert validate(FIXTURE)
    assert not validate({"dimension": {}, "size": []})  # missing 'value'


def test_indicator_dim_detection():
    assert find_indicator_dim(FIXTURE, ["GEP"]) == "nrg_bal"
    assert find_indicator_dim(FIXTURE, ["NOPE"]) is None


def test_decode_rows(decoded):
    rows = sorted(
        (r["indicator_code"], r["country_code"], r["country_name"], str(r["time"]), r["value"])
        for r in decoded.collect()
    )
    assert rows == EXPECTED


def test_decode_filters_outside_allowlist(decoded):
    # flat indexes 6,7,10 decode to nrg_bal='XXX' and must be filtered (P8)
    assert decoded.count() == 5


def test_unit_columns_null_when_absent(decoded):
    row = decoded.first()
    assert row["unit_code"] is None and row["unit_label"] is None


def test_invalid_payload_yields_empty_with_schema(spark):
    df = decode_jsonstat(spark, {"id": [], "size": []}, "x")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields][:3] == [
        "dataset_code",
        "country_code",
        "country_name",
    ]


def test_dataset_code_stamped(decoded):
    assert {r["dataset_code"] for r in decoded.collect()} == {"nrg_cb_e"}


def test_datasource_format_matches_decode(spark, tmp_path):
    """spark.read.format('jsonstat') over a directory of documents produces
    the same rows as the Catalyst decode path, one partition per file."""
    from eurostat_energy_etl_pipeline_spark.sources.jsonstat import decode_jsonstat
    from eurostat_energy_etl_pipeline_spark.sources.jsonstat_datasource import (
        register_jsonstat_source,
    )
    import json

    d = tmp_path / "responses"
    d.mkdir()
    (d / "nrg_cb_e.json").write_text(json.dumps(FIXTURE))
    (d / "ten00124.json").write_text(json.dumps(FIXTURE))
    register_jsonstat_source(spark)

    got = spark.read.format("jsonstat").load(str(d))
    assert got.rdd.getNumPartitions() == 2  # one per document
    got_rows = sorted(
        got.collect(), key=lambda r: (r.dataset_code, r.country_code, r.time)
    )
    exp_one = decode_jsonstat(spark, FIXTURE, dataset_code="nrg_cb_e").collect()
    assert len(got_rows) == 2 * len(exp_one)
    exp_sorted = sorted(exp_one, key=lambda r: (r.country_code, r.time))
    nrg = [r for r in got_rows if r.dataset_code == "nrg_cb_e"]
    for g, e in zip(nrg, exp_sorted):
        assert g.country_code == e.country_code
        assert g.indicator_code == e.indicator_code
        assert g.time == e.time
        assert g.value == e.value
        assert g.country_name == e.country_name


def test_datasource_invalid_payload_yields_empty(spark, tmp_path):
    from eurostat_energy_etl_pipeline_spark.sources.jsonstat_datasource import (
        register_jsonstat_source,
    )
    import json

    d = tmp_path / "bad"
    d.mkdir()
    (d / "broken.json").write_text(json.dumps({"not": "jsonstat"}))
    register_jsonstat_source(spark)
    df = spark.read.format("jsonstat").load(str(d))
    assert df.count() == 0
    assert len(df.schema.fields) == 9
