"""Per-point candidate-operation selection (the vectorized analog of
pj_get_suggested_operation + the proj_trans retry loop,
reference src/4D_api.cpp:217-346, 436-530)."""

import numpy as np
import pytest


def test_bbox_routes_points_to_candidates():
    from proj_ray.factory import create_with_alternatives

    # western hemisphere: +100m east geogoffset; eastern: +200m; global
    # fallback: identity (helmert all-zero)
    sec = 1.0 / 3600.0
    op = create_with_alternatives([
        {"defn": f"+proj=geogoffset +dlon={3600 * 1.0}",
         "bbox": (-180, -90, 0, 90), "accuracy": 0.01},
        {"defn": f"+proj=geogoffset +dlon={3600 * 2.0}",
         "bbox": (0, -90, 180, 90), "accuracy": 0.01},
        {"defn": "+proj=noop", "bbox": None, "accuracy": 5.0},
    ])
    _ = sec
    lon = np.radians([-50.0, 50.0])
    lat = np.radians([10.0, 10.0])
    x, y, _, _ = op.fwd((lon, lat, np.zeros(2), np.full(2, np.inf)))
    out = np.degrees(x)
    assert out[0] == pytest.approx(-49.0, abs=1e-9)   # +1 deg candidate
    assert out[1] == pytest.approx(52.0, abs=1e-9)    # +2 deg candidate


def test_smaller_bbox_wins_and_accuracy_orders():
    from proj_ray.factory import create_with_alternatives

    op = create_with_alternatives([
        {"defn": "+proj=geogoffset +dlon=3600",
         "bbox": (-180, -90, 180, 90), "accuracy": 1.0},
        {"defn": "+proj=geogoffset +dlon=7200",
         "bbox": (-10, -10, 10, 10), "accuracy": 1.0},
    ])
    lon = np.radians([0.0, 100.0])
    lat = np.radians([0.0, 0.0])
    x, _, _, _ = op.fwd((lon, lat, np.zeros(2), np.full(2, np.inf)))
    # point inside the small bbox uses the more specific op (+2 deg)
    assert np.degrees(x[0]) == pytest.approx(2.0, abs=1e-9)
    assert np.degrees(x[1]) == pytest.approx(101.0, abs=1e-9)


def test_retry_on_failed_candidate(tmp_path):
    """A candidate whose grid doesn't cover the point yields inf; the
    point must retry the next candidate (masked re-execution)."""
    import struct

    from proj_ray.factory import create_with_alternatives
    from proj_ray.ops import gridshift as GS

    hdr = bytearray(192)
    struct.pack_into(">i", hdr, 8, 12)
    struct.pack_into(">d", hdr, 24, 49.0)
    struct.pack_into(">d", hdr, 40, 51.0)
    struct.pack_into(">d", hdr, 56, 98.0)
    struct.pack_into(">d", hdr, 72, 100.0)
    struct.pack_into(">d", hdr, 88, 1.0)
    struct.pack_into(">d", hdr, 104, 1.0)
    vals = [struct.pack(">2d", 3600.0, 0.0)] * 9  # +1 deg lat everywhere
    path = tmp_path / "ret_ntv1.dat"
    path.write_bytes(bytes(hdr) + b"".join(vals))
    GS.GRID_SEARCH_PATH.insert(0, str(tmp_path))
    try:
        op = create_with_alternatives([
            {"defn": "+proj=hgridshift +grids=ret_ntv1.dat",
             "bbox": None, "accuracy": 0.01},
            {"defn": "+proj=geogoffset +dlat=-3600",
             "bbox": None, "accuracy": 2.0},
        ])
        lon = np.radians([-99.0, 30.0])   # second point outside the grid
        lat = np.radians([50.0, 50.0])
        _, y, _, _ = op.fwd((lon, lat, np.zeros(2), np.full(2, np.inf)))
        assert np.degrees(y[0]) == pytest.approx(51.0, abs=1e-9)
        assert np.degrees(y[1]) == pytest.approx(49.0, abs=1e-9)
    finally:
        GS.GRID_SEARCH_PATH.remove(str(tmp_path))
        GS._GRID_CACHE.pop("ret_ntv1.dat", None)
