"""K4 PNG chart sink: codec validity, raster semantics, end-to-end files.

The chart *data* is oracle-checked elsewhere (q_dash_* differentials);
these tests pin the sink itself: valid deterministic PNGs whose pixels
encode the data (bar length ordering, heatmap color scale, trend extent),
mirroring /root/reference/viz/viz_utils.py:37-88.
"""

from __future__ import annotations

import numpy as np
import pytest

from eurostat_energy_etl_pipeline_spark.viz import (
    barh_chart,
    decode_png,
    encode_png,
    generate_all,
    heatmap_chart,
    line_chart,
)
from eurostat_energy_etl_pipeline_spark.viz.charts import SERIES, _viridis


# ---------------------------------------------------------------------- codec
def test_png_roundtrip_exact():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(23, 41, 3), dtype=np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(data)
    assert out.shape == (23, 41, 3)
    assert (out == img).all()


def test_png_deterministic_bytes():
    img = np.zeros((5, 5, 3), dtype=np.uint8)
    img[2, 2] = (255, 0, 0)
    assert encode_png(img) == encode_png(img)


def test_png_rejects_bad_shape():
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.uint8))


# -------------------------------------------------------------------- rasters
def test_barh_lengths_proportional():
    img = barh_chart(["A", "B", "C"], [100.0, 50.0, 25.0], title="T")
    series = (img == np.array(SERIES, np.uint8)).all(axis=2)
    # Bar row extents: count series pixels per row, group into 3 bars.
    row_counts = series.sum(axis=1)
    bar_rows = np.where(row_counts > 5)[0]
    groups = np.split(bar_rows, np.where(np.diff(bar_rows) > 1)[0] + 1)
    lens = [row_counts[g].max() for g in groups if len(g) > 2]
    assert len(lens) == 3
    assert lens[0] > lens[1] > lens[2]
    # 100 vs 50 vs 25: lengths within 5% of 2x / 4x ratios.
    assert abs(lens[0] / lens[1] - 2.0) < 0.1
    assert abs(lens[0] / lens[2] - 4.0) < 0.2


def test_line_chart_marks_every_point():
    img = line_chart([2000, 2001, 2002], [1.0, 3.0, 2.0], title="T")
    series = (img == np.array(SERIES, np.uint8)).all(axis=2)
    # Markers are 5x5 squares at three distinct x positions.
    cols = np.where(series.any(axis=0))[0]
    assert cols.size > 0 and cols.max() - cols.min() > 500  # spans plot width
    # Peak y (value 3.0) sits above the endpoints' y pixels.
    mid_rows = np.where(series[:, (cols.min() + cols.max()) // 2 - 5 :].any(axis=1))[0]
    assert mid_rows.size > 0


def test_heatmap_colors_follow_scale():
    mat = np.array([[0.0, 50.0], [100.0, np.nan]])
    img = heatmap_chart(["R1", "R2"], [2000, 2001], mat, title="T")
    lo_color = _viridis(np.array(0.0))
    hi_color = _viridis(np.array(1.0))
    flat = img.reshape(-1, 3)
    assert (flat == lo_color).all(axis=1).any(), "min cell color present"
    assert (flat == hi_color).all(axis=1).any(), "max cell color present"
    assert (flat == np.array([235, 235, 235])).all(axis=1).any(), "NaN gray present"


def test_viridis_endpoints_and_monotone_green():
    assert tuple(_viridis(np.array(0.0))) == (68, 1, 84)
    assert tuple(_viridis(np.array(1.0))) == (253, 231, 37)
    greens = [_viridis(np.array(t))[1] for t in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert greens == sorted(greens)


# --------------------------------------------------------------- end-to-end
def test_generate_all_writes_three_valid_pngs(spark, sf_dir, tmp_path):
    paths = generate_all(spark, sf_dir, str(tmp_path))
    assert len(paths) == 3
    names = sorted(p.rsplit("/", 1)[1] for p in paths)
    assert names[0].startswith("NATION_7_GEP_trend")
    assert names[1].startswith("heatmap_GEP")
    assert names[2].startswith("top_10_GEP_")
    for p in paths:
        with open(p, "rb") as f:
            img = decode_png(f.read())
        assert img.shape[0] >= 480 and img.shape[1] >= 800
        # Not a blank canvas: some non-white, non-grid ink.
        assert (img != 255).any()


def test_generate_all_deterministic(spark, sf_dir, tmp_path):
    a = generate_all(spark, sf_dir, str(tmp_path / "a"))
    b = generate_all(spark, sf_dir, str(tmp_path / "b"))
    for pa, pb in zip(sorted(a), sorted(b)):
        assert open(pa, "rb").read() == open(pb, "rb").read()


def test_trend_skips_missing_country(spark, sf_dir, tmp_path):
    from eurostat_energy_etl_pipeline_spark.viz import plot_country_trend

    assert plot_country_trend(spark, sf_dir, str(tmp_path), "NO_SUCH", "GEP") is None
    assert list(tmp_path.iterdir()) == []
