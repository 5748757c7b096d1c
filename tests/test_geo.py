"""Geo primitive tests, including the reference's serde round-trip case
(`topo-common/src/lib.rs:175-198`)."""

import pytest

from topo_renderer_tpu.geo import (
    GeoCoord,
    GeoLocation,
    Latitude,
    LatitudeDirection,
    Longitude,
    LongitudeDirection,
    parse_latitude,
    parse_longitude,
    sort_locations,
)


def test_deserialize_geo_location_query():
    # Direct port of `topo-common/src/lib.rs:179-198`.
    query = GeoLocation.from_json('{"latitude": "49N", "longitude": "20E"}')
    assert query == GeoLocation(
        Latitude(49, LatitudeDirection.N), Longitude(20, LongitudeDirection.E)
    )


def test_parse_directions():
    assert parse_latitude("12S") == Latitude(12, LatitudeDirection.S)
    assert parse_longitude("3W") == Longitude(3, LongitudeDirection.W)
    with pytest.raises(ValueError):
        parse_latitude("")
    with pytest.raises(ValueError):
        parse_latitude("12X")


def test_from_coord_signs():
    # `lib.rs:100-119`: signum() > 0 is N/E; zero and negatives are S/W.
    assert GeoLocation.from_coord(49, 20) == GeoLocation(
        Latitude(49, LatitudeDirection.N), Longitude(20, LongitudeDirection.E)
    )
    assert GeoLocation.from_coord(-12, -3) == GeoLocation(
        Latitude(12, LatitudeDirection.S), Longitude(3, LongitudeDirection.W)
    )
    loc0 = GeoLocation.from_coord(0, 0)
    assert loc0.latitude.direction == LatitudeDirection.S
    assert loc0.longitude.direction == LongitudeDirection.W


def test_request_params():
    # `lib.rs:121-123`
    loc = GeoLocation.from_coord(49, 20)
    assert loc.to_request_params() == "latitude=49N&longitude=20E"
    loc = GeoLocation.from_coord(-12, -3)
    assert loc.to_request_params() == "latitude=12S&longitude=3W"


def test_numerical_roundtrip():
    loc = GeoLocation.from_coord(-45, 170)
    assert loc.to_numerical() == (-45.0, 170.0)
    assert GeoLocation.from_geo_coord(GeoCoord(-44.2, 170.9)) == GeoLocation.from_coord(
        -45, 170
    )
    # floor() semantics for negative fractions (`lib.rs:82-89`).
    assert GeoLocation.from_geo_coord(GeoCoord(-0.5, -0.5)) == GeoLocation.from_coord(
        -1, -1
    )


def test_btreemap_ordering():
    # Rust derives Ord field-by-field: degree before direction, S < N
    # (`lib.rs:7-37`). 49N < 50S because 49 < 50.
    a = GeoLocation(Latitude(49, LatitudeDirection.N), Longitude(20, LongitudeDirection.E))
    b = GeoLocation(Latitude(50, LatitudeDirection.S), Longitude(20, LongitudeDirection.E))
    c = GeoLocation(Latitude(49, LatitudeDirection.S), Longitude(20, LongitudeDirection.E))
    assert sort_locations([b, a, c]) == [c, a, b]
