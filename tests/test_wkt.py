"""WKT1/WKT2/PROJJSON subset parsing (reference grammar machinery is
src/wkt1_grammar.y / src/wkt2_grammar.y / src/iso19111/io.cpp; this is
the supported-method subset)."""

import numpy as np
import pytest

WKT1_UTM31 = (
    'PROJCS["WGS 84 / UTM zone 31N",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",3],'
    'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",0],UNIT["metre",1]]')

WKT2_UTM31 = """
PROJCRS["WGS 84 / UTM zone 31N",
  BASEGEOGCRS["WGS 84",
    DATUM["World Geodetic System 1984",
      ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
  CONVERSION["UTM zone 31N",
    METHOD["Transverse Mercator",ID["EPSG",9807]],
    PARAMETER["Latitude of natural origin",0,
      ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],
    PARAMETER["Longitude of natural origin",3,
      ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],
    PARAMETER["Scale factor at natural origin",0.9996,
      SCALEUNIT["unity",1],ID["EPSG",8805]],
    PARAMETER["False easting",500000,LENGTHUNIT["metre",1],
      ID["EPSG",8806]],
    PARAMETER["False northing",0,LENGTHUNIT["metre",1],ID["EPSG",8807]]],
  CS[Cartesian,2],
  AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
  AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]
"""

PROJJSON_UTM31 = {
    "type": "ProjectedCRS",
    "name": "WGS 84 / UTM zone 31N",
    "base_crs": {
        "type": "GeographicCRS",
        "datum": {"type": "GeodeticReferenceFrame",
                  "name": "World Geodetic System 1984",
                  "ellipsoid": {"name": "WGS 84",
                                "semi_major_axis": 6378137,
                                "inverse_flattening": 298.257223563}},
    },
    "conversion": {
        "name": "UTM zone 31N",
        "method": {"name": "Transverse Mercator",
                   "id": {"authority": "EPSG", "code": 9807}},
        "parameters": [
            {"name": "Latitude of natural origin", "value": 0,
             "unit": "degree", "id": {"authority": "EPSG", "code": 8801}},
            {"name": "Longitude of natural origin", "value": 3,
             "unit": "degree", "id": {"authority": "EPSG", "code": 8802}},
            {"name": "Scale factor at natural origin", "value": 0.9996,
             "unit": "unity", "id": {"authority": "EPSG", "code": 8805}},
            {"name": "False easting", "value": 500000, "unit": "metre",
             "id": {"authority": "EPSG", "code": 8806}},
            {"name": "False northing", "value": 0, "unit": "metre",
             "id": {"authority": "EPSG", "code": 8807}},
        ],
    },
}


def _utm31(lon, lat):
    from proj_ray.factory import transform

    x, y, _, _ = transform("+proj=utm +zone=31 +ellps=WGS84", "fwd",
                           np.radians([lon]), np.radians([lat]))
    return x[0], y[0]


def _check(defn):
    from proj_ray.factory import transform

    x, y, _, _ = transform(defn, "fwd", np.radians([7.5]),
                           np.radians([48.0]))
    ex, ey = _utm31(7.5, 48.0)
    assert x[0] == pytest.approx(ex, abs=1e-6)
    assert y[0] == pytest.approx(ey, abs=1e-6)


def test_wkt1_projcs():
    from proj_ray.wkt import wkt_to_proj

    _check(wkt_to_proj(WKT1_UTM31))


def test_wkt2_projcrs():
    from proj_ray.wkt import wkt_to_proj

    _check(wkt_to_proj(WKT2_UTM31))


def test_projjson():
    from proj_ray.wkt import projjson_to_proj

    _check(projjson_to_proj(PROJJSON_UTM31))


def test_wkt_authority_shortcut():
    from proj_ray.wkt import wkt_to_proj

    wkt = WKT1_UTM31[:-1] + ',AUTHORITY["EPSG","32631"]]'
    out = wkt_to_proj(wkt)
    assert "utm" in out or "tmerc" in out  # registry shortcut used
    _check(out)


def test_wkt_geogcs():
    from proj_ray.wkt import wkt_to_proj

    out = wkt_to_proj(
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]]')
    assert out.startswith("+proj=longlat")
    assert "+a=6378137" in out


def test_wkt_towgs84_carried():
    from proj_ray.wkt import wkt_to_proj

    out = wkt_to_proj(
        'GEOGCS["x",DATUM["d",SPHEROID["s",6377397.155,299.1528128],'
        'TOWGS84[598.1,73.7,418.2,0.202,0.045,-2.455,6.7]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')
    assert "+towgs84=598.1,73.7,418.2" in out


def test_wkt_unknown_method_raises():
    from proj_ray.wkt import wkt_to_proj

    bad = WKT1_UTM31.replace("Transverse_Mercator", "Craig_Retroazimuthal")
    with pytest.raises(NotImplementedError):
        wkt_to_proj(bad)


def test_crs_to_crs_accepts_wkt():
    from proj_ray.factory import create_crs_to_crs

    op = create_crs_to_crs(WKT1_UTM31, "EPSG:32631")
    x0, y0 = np.array([450000.0]), np.array([5300000.0])
    x, y, _, _ = op.fwd((x0, y0, np.zeros(1), np.full(1, np.inf)))
    # same CRS on both sides: identity to numerical noise
    assert x[0] == pytest.approx(x0[0], abs=1e-6)
    assert y[0] == pytest.approx(y0[0], abs=1e-6)


def test_wkt1_grad_parameters_inherit_base_unit():
    """WKT1 PARAMETER angles carry no unit node: they inherit the base
    GEOGCS angular UNIT (NTF Lambert zones are expressed in grads)."""
    from proj_ray.wkt import wkt_to_proj

    w = ('PROJCS["NTF / Lambert zone II",'
         'GEOGCS["NTF",'
         'DATUM["NTF",SPHEROID["Clarke 1880 (IGN)",6378249.2,'
         '293.466021293627]],'
         'PRIMEM["Greenwich",0],'
         'UNIT["grad",0.0157079632679489]],'
         'PROJECTION["Lambert_Conformal_Conic_1SP"],'
         'PARAMETER["latitude_of_origin",52],'
         'PARAMETER["central_meridian",0],'
         'PARAMETER["scale_factor",0.99987742],'
         'PARAMETER["false_easting",600000],'
         'PARAMETER["false_northing",2200000],'
         'UNIT["metre",1]]')
    s = wkt_to_proj(w)
    import re

    lat0 = float(re.search(r"\+lat_0=([-0-9.e]+)", s).group(1))
    assert lat0 == pytest.approx(46.8, abs=1e-9)  # 52 grads
