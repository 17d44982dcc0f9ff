import math

import numpy as np
import pytest

from proj_ray import create_operation, transform

D = math.pi / 180


def test_utm_known_value():
    x, y, _, _ = transform("+proj=utm +zone=32 +ellps=WGS84", "fwd",
                           [12 * D], [55 * D])
    assert abs(x[0] - 691875.632137542) < 1e-6
    assert abs(y[0] - 6098907.825129169) < 1e-6


@pytest.mark.parametrize("defn", [
    "+proj=merc +ellps=GRS80",
    "+proj=merc +R=6400000",
    "+proj=tmerc +ellps=GRS80 +lon_0=9",
    "+proj=etmerc +ellps=GRS80 +lon_0=9",
    "+proj=utm +zone=33 +ellps=WGS84",
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=40 +lon_0=-96 +ellps=GRS80",
    "+proj=webmerc +ellps=WGS84",
    "+proj=cart +ellps=GRS80",
])
def test_roundtrip(defn):
    rng = np.random.default_rng(1)
    lon = rng.uniform(-8, 8, 200) * D
    lat = rng.uniform(-80, 80, 200) * D
    op = create_operation(defn)
    out = op.fwd((lon, lat, np.zeros_like(lon), np.full_like(lon, np.inf)))
    back = op.inv(out)
    # compare with local-curvature metric: < 0.5 mm
    dlam = np.abs(back[0] - lon)
    dphi = np.abs(back[1] - lat)
    assert np.all(dlam * 6.4e6 < 5e-4)
    assert np.all(dphi * 6.4e6 < 5e-4)


def test_inband_errors_dont_break_batch():
    x, y, _, _ = transform("+proj=webmerc +ellps=WGS84", "fwd",
                           np.array([0.0, 10 * D, 20.0]),
                           np.array([91 * D, 45 * D, 0.5]))
    assert not np.isfinite(x[0])          # invalid latitude
    assert np.isfinite(x[1])              # neighbor unaffected
    assert not np.isfinite(x[2])          # lon > 10 rad -> invalid


def test_pipeline_push_pop_preserves_z():
    op = create_operation(
        "+proj=pipeline "
        "+step +proj=push +v_3 "
        "+step +proj=cart +ellps=WGS84 "
        "+step +proj=cart +inv +ellps=WGS84 "
        "+step +proj=pop +v_3")
    z = np.array([123.456])
    out = op.fwd((np.array([0.2]), np.array([0.9]), z,
                  np.array([np.inf])))
    assert abs(out[2][0] - 123.456) < 1e-9


def test_helmert_7param_roundtrip():
    op = create_operation(
        "+proj=helmert +x=100 +y=-50 +z=20 +rx=1 +ry=-2 +rz=3 +s=5 "
        "+exact +convention=position_vector")
    X = np.array([3586525.76])
    Y = np.array([762339.58])
    Z = np.array([5201465.44])
    out = op.fwd((X, Y, Z, np.full(1, np.inf)))
    back = op.inv(out)
    assert abs(back[0][0] - X[0]) < 1e-6


def test_unitconvert_units_and_time():
    x, y, z, t = transform("+proj=unitconvert +xy_in=km +xy_out=m", "fwd",
                           [1.0], [2.0])
    assert x[0] == 1000.0 and y[0] == 2000.0
    op = create_operation(
        "+proj=unitconvert +t_in=decimalyear +t_out=yyyymmdd")
    out = op.fwd((np.zeros(1), np.zeros(1), np.zeros(1),
                  np.array([2000.0])))
    assert out[3][0] == 20000101.0


def test_axisswap_neu():
    op = create_operation("+proj=axisswap +order=2,1")
    out = op.fwd((np.array([1.0]), np.array([2.0]), np.zeros(1),
                  np.zeros(1)))
    assert out[0][0] == 2.0 and out[1][0] == 1.0


def test_ntv1_reader_and_hgridshift(tmp_path):
    """Synthesize a tiny NTv1 file (header layout grids.cpp:1792-1896)
    and check the hgridshift bilinear against hand values."""
    import struct

    import numpy as np

    from proj_ray.factory import transform
    from proj_ray.ops import gridshift as GS

    # 3x3 grid covering lon [-100,-98] (stored as west-positive 98..100)
    # lat [49,51], 1 deg resolution
    hdr = bytearray(192)
    struct.pack_into(">i", hdr, 8, 12)        # record count
    struct.pack_into(">d", hdr, 24, 49.0)     # south (deg)
    struct.pack_into(">d", hdr, 40, 51.0)     # north
    struct.pack_into(">d", hdr, 56, 98.0)     # east, west-positive
    struct.pack_into(">d", hdr, 72, 100.0)    # west, west-positive
    struct.pack_into(">d", hdr, 88, 1.0)      # resY deg
    struct.pack_into(">d", hdr, 104, 1.0)     # resX deg
    # rows south->north; columns EAST->WEST; (lat_sec, lon_sec_west+)
    vals = []
    for iy in range(3):
        for ix_e2w in range(3):
            lon_w_to_e = 2 - ix_e2w
            lat_sec = 1.0 + iy + 0.1 * lon_w_to_e
            lon_sec_westpos = -(0.5 + 0.2 * iy)  # = +0.5.. east shift
            vals.append(struct.pack(">2d", lat_sec, lon_sec_westpos))
    path = tmp_path / "tiny_ntv1.dat"
    path.write_bytes(bytes(hdr) + b"".join(vals))
    GS.GRID_SEARCH_PATH.insert(0, str(tmp_path))
    try:
        lam = np.radians([-99.0])
        phi = np.radians([50.0])
        x, y, _, _ = transform(
            "+proj=hgridshift +grids=tiny_ntv1.dat", "fwd", lam, phi)
        sec = np.pi / 180.0 / 3600.0
        # grid node at (ix=1, iy=1): lat 2.1", lon +0.7" east
        assert y[0] - phi[0] == pytest.approx(2.1 * sec, rel=1e-9)
        assert x[0] - lam[0] == pytest.approx(0.7 * sec, rel=1e-9)
        # midpoint between nodes: bilinear average
        x2, y2, _, _ = transform(
            "+proj=hgridshift +grids=tiny_ntv1.dat", "fwd",
            np.radians([-98.5]), np.radians([49.5]))
        lat_exp = np.mean([1.1 + 0.1, 1.2 + 0.1 * 2,
                           2.1 - 0.1 + 0.1, 2.0 + 0.2])
        # nodes (ix,iy) in (1,0),(2,0),(1,1),(2,1): lat = 1+iy+0.1*ix
        lat_exp = np.mean([1.1, 1.2, 2.1, 2.2])
        lon_exp = np.mean([0.5, 0.5, 0.7, 0.7])
        assert (y2[0] - np.radians(49.5)) == pytest.approx(
            lat_exp * sec, rel=1e-9)
        assert (x2[0] - np.radians(-98.5)) == pytest.approx(
            lon_exp * sec, rel=1e-9)
    finally:
        GS.GRID_SEARCH_PATH.remove(str(tmp_path))
        GS._GRID_CACHE.pop("tiny_ntv1.dat", None)


def test_deg_to_dms_roundtrip():
    from proj_ray.params import deg_to_dms, dms_to_deg

    assert deg_to_dms(12.582441666666, "N", "S") == "12d34'56.790\"N"
    assert deg_to_dms(-12.5824416666666, "N", "S").endswith('"S')
    assert deg_to_dms(-7.5) == "-7d30'0.000\""
    # seconds carry: 59.9996" rounds into the next minute at fract=3
    assert deg_to_dms(0.9999999, fract=3) == "1d0'0.000\""
    for d in (0.0, 12.5824416666, -179.99999, 89.999999, 45.0):
        s = deg_to_dms(d, "E", "W", fract=6)
        assert abs(dms_to_deg(s) - d) < 1e-9, (d, s)


def test_dms_arrays():
    import numpy as np

    from proj_ray.params import format_dms_array, parse_dms_array

    vals = parse_dms_array(["57d30'12.3\"", "-7.5", "12d30'S", "0.25r"])
    assert vals[0] == pytest.approx(57.50341666666, abs=1e-9)
    assert vals[1] == -7.5
    assert vals[2] == -12.5
    assert vals[3] == pytest.approx(np.degrees(0.25), abs=1e-12)
    back = format_dms_array(vals[:2], "N", "S")
    assert back[0].endswith('"N') and back[1].endswith('"S')


def test_hgridshift_full_world_seam_wrap():
    """A point in the last (seam) cell of a full-world horizontal grid
    must interpolate periodically against column 0, not come out inf
    (reference grids.cpp periodic-longitude handling)."""
    import numpy as np

    from proj_ray.ops import gridshift as GS

    sec = np.pi / 180.0 / 3600.0
    w, h = 36, 5  # 10-deg cols covering the full world, lat [-20,20]
    lon_shift = np.full((h, w), 1.0 * sec)
    lat_shift = np.full((h, w), 2.0 * sec)
    # make the wrap observable: column 0 differs from the last column
    lon_shift[:, 0] = 3.0 * sec
    g = GS.ShiftGrid(
        west=np.radians(-180.0), south=np.radians(-20.0),
        east=np.radians(170.0), north=np.radians(20.0),
        resX=np.radians(10.0), resY=np.radians(10.0),
        width=w, height=h, lon_shift=lon_shift, lat_shift=lat_shift)
    assert g.full_world
    op = object.__new__(GS.Hgridshift)
    op.grids = [g]
    op.t_epoch = 0.0
    op.t_final = 0.0
    lam = np.radians([175.0, -180.0, 170.0])  # seam midpoint + edges
    phi = np.radians([0.0, 0.0, 0.0])
    z = np.zeros(3)
    t = np.full(3, np.inf)
    ol, op_, _, _ = op._fwd(lam, phi, z, t)
    assert np.all(np.isfinite(ol)) and np.all(np.isfinite(op_))
    # seam midpoint: mean of last-column (1") and column-0 (3") shifts
    assert (ol[0] - lam[0]) == pytest.approx(2.0 * sec, rel=1e-9)
    assert (op_[0] - phi[0]) == pytest.approx(2.0 * sec, rel=1e-9)
    # -180 is column 0 exactly; +170 is the last column exactly
    assert (ol[1] - lam[1]) == pytest.approx(3.0 * sec, rel=1e-9)
    assert (ol[2] - lam[2]) == pytest.approx(1.0 * sec, rel=1e-9)


def test_pipeline_global_inv_toggles_and_reverses_steps():
    """A global +inv toggles every step's inversion and reverses step
    order (PROJStringParser semantics, reference
    src/iso19111/io.cpp:10022-10027). `pipeline inv step proj=urm5 inv`
    must therefore run urm5 FORWARD even though urm5 has no inverse
    (reference test/gie/more_builtins.gie:215-218)."""
    op = create_operation(
        "proj=pipeline inv step proj=urm5 n=0.5 ellps=WGS84 inv")
    x, y, *_ = op.fwd((math.radians(12), math.radians(56), 0.0, 0.0))
    assert abs(x - 1215663.2814182492) < 1e-6
    assert abs(y - 5452209.5424045017) < 1e-6
    # global inv WITHOUT a local inv leaves the step inverted: the
    # pipeline must be rejected at construction (no forward path,
    # pipeline.cpp:533-554)
    with pytest.raises(ValueError):
        create_operation("proj=pipeline inv step proj=urm5 n=0.5")
    with pytest.raises(ValueError):
        create_operation("proj=pipeline step proj=urm5 n=0.5 inv")
    # two steps: global inv must also reverse execution order
    op3 = create_operation(
        "proj=pipeline inv step proj=utm zone=32 step proj=axisswap order=2,1")
    ref = create_operation("proj=utm zone=32")
    e, n, *_ = ref.fwd((math.radians(9.5), math.radians(55.0), 0.0, 0.0))
    lam, phi, *_ = op3.fwd((n, e, 0.0, 0.0))  # swapped-in, inverse utm
    assert abs(math.degrees(lam) - 9.5) < 1e-9
    assert abs(math.degrees(phi) - 55.0) < 1e-9
