"""Peak CSV tests — port of `topo-renderer/src/data/peak.rs:67-109` plus the
error-aggregation behavior (`peak.rs:46-64`)."""

import numpy as np
import pytest

from topo_renderer_tpu.data.peak import Peak, PeakCsvError, read_peaks, sort_by_elevation_desc

CSV_SAMPLE = """latitude,longitude,name,elevation
49.542824,20.111383,Turbacz,1310.0
50.054916,19.893354,Kopiec Kościuszki,326.5
"""


def test_read_from_csv():
    peaks = read_peaks(CSV_SAMPLE)
    expected = [
        Peak(49.542824, 20.111383, "Turbacz", 1310.0),
        Peak(50.054916, 19.893354, "Kopiec Kościuszki", 326.5),
    ]
    assert len(peaks) == len(expected)
    for got, want in zip(peaks, expected):
        assert got.name == want.name
        np.testing.assert_allclose(got.latitude, np.float32(want.latitude), rtol=1e-6)
        np.testing.assert_allclose(got.longitude, np.float32(want.longitude), rtol=1e-6)
        np.testing.assert_allclose(got.elevation, np.float32(want.elevation), rtol=1e-6)


def test_read_from_bytes():
    peaks = read_peaks(CSV_SAMPLE.encode("utf-8"))
    assert peaks[1].name == "Kopiec Kościuszki"


def test_error_aggregation():
    bad = """latitude,longitude,name,elevation
49.5,20.1,Good,1310.0
oops,20.1,Bad1,100.0
49.5,nope,Bad2,abc
"""
    with pytest.raises(PeakCsvError) as exc_info:
        read_peaks(bad)
    # Both bad rows must be reported (`peak.rs:55-63`).
    assert len(exc_info.value.errors) == 2


def test_sort_by_elevation_desc():
    peaks = read_peaks(CSV_SAMPLE)
    ordered = sort_by_elevation_desc(peaks)
    assert [p.name for p in ordered] == ["Turbacz", "Kopiec Kościuszki"]
