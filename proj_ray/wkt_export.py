"""proj-string -> WKT2:2019 / PROJJSON export (subset).

The reverse of proj_ray.wkt's import parser, for the conversion
methods the engine's registry resolves (reference writers:
src/iso19111/io.cpp WKTFormatter, src/proj_json_streaming_writer.cpp;
surface mirrored from projinfo, src/apps/projinfo.cpp:452-540).
Guarantee: `wkt_to_proj(proj_to_wkt2(x))` / `projjson_to_proj(
proj_to_projjson(x))` reproduce the source definition's parameters
exactly (round-trip pytest over every supported method). Unknown
projections raise NotImplementedError — never a silent wrong answer.

Notes vs the full reference writers:
- +towgs84 exports as a BOUNDCRS wrapper (WKT2) / BoundCRS (PROJJSON)
  with the reference's abridged-transformation conventions
  (Geocentric translations 9603 for 3-param, Position Vector 9606
  for 7-param with Scale difference carried as 1 + ppm*1e-6).
- +axis (2-of-{e,w,n,s} + u, the registry's full inventory) drives
  the emitted CS AXIS directions/order; the default is easting/
  northing (lat/lon for geographic).
"""

from __future__ import annotations

import math

DEG_UNIT = 'ANGLEUNIT["degree",0.0174532925199433]'
M_UNIT = 'LENGTHUNIT["metre",1]'

# proj name -> (EPSG method name, code,
#               [(param name, epsg code | None, proj key, default)])
# Parameter codes must invert through wkt._PARAM_BY_CODE; code None
# emits a name-only PARAMETER (resolved via _PARAM_BY_NAME).
_ANG = "ang"
_SCL = "scl"
_LEN = "len"

_P_NAT = [("Latitude of natural origin", 8801, "lat_0", 0.0, _ANG),
          ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
          ("Scale factor at natural origin", 8805, "k", 1.0, _SCL),
          ("False easting", 8806, "x_0", 0.0, _LEN),
          ("False northing", 8807, "y_0", 0.0, _LEN)]
_P_NOK = [p for p in _P_NAT if p[2] != "k"]
_P_FALSE_ORIGIN = [
    ("Latitude of false origin", 8821, "lat_0", 0.0, _ANG),
    ("Longitude of false origin", 8822, "lon_0", 0.0, _ANG),
    ("Latitude of 1st standard parallel", 8823, "lat_1", 0.0, _ANG),
    ("Latitude of 2nd standard parallel", 8824, "lat_2", 0.0, _ANG),
    ("Easting at false origin", 8826, "x_0", 0.0, _LEN),
    ("Northing at false origin", 8827, "y_0", 0.0, _LEN)]
_P_CENTRE = [
    ("Latitude of projection centre", 8811, "lat_0", 0.0, _ANG),
    ("Longitude of projection centre", 8812, "lonc", 0.0, _ANG),
    ("Azimuth at projection centre", 8813, "alpha", 0.0, _ANG),
    ("Angle from Rectified to Skew Grid", 8814, "gamma", None, _ANG),
    ("Scale factor at projection centre", 8815, "k", 1.0, _SCL),
    ("Easting at projection centre", 8816, "x_0", 0.0, _LEN),
    ("Northing at projection centre", 8817, "y_0", 0.0, _LEN)]

_EXPORT: dict[str, tuple[str, int, list]] = {
    "tmerc": ("Transverse Mercator", 9807, _P_NAT),
    "cass": ("Cassini-Soldner", 9806, _P_NOK),
    "sterea": ("Oblique Stereographic", 9809, _P_NAT),
    "poly": ("American Polyconic", 9818, _P_NOK),
    "laea": ("Lambert Azimuthal Equal Area", 9820, _P_NOK),
    "aeqd": ("Modified Azimuthal Equidistant", 9832, _P_NOK),
    "nzmg": ("New Zealand Map Grid", 9811, _P_NOK),
    "webmerc": ("Popular Visualisation Pseudo Mercator", 1024, _P_NOK),
    "aea": ("Albers Equal Area", 9822, _P_FALSE_ORIGIN),
    "omerc": ("Hotine Oblique Mercator (variant B)", 9815, _P_CENTRE),
    "cea": ("Lambert Cylindrical Equal Area", 9835, [
        ("Latitude of 1st standard parallel", 8823, "lat_ts", 0.0, _ANG),
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
    "eqc": ("Equidistant Cylindrical", 1028, [
        ("Latitude of 1st standard parallel", 8823, "lat_ts", 0.0, _ANG),
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
    # EPSG-codeless methods (WKT2 names per the reference's
    # esriMappings/otherMethods tables) carry synthetic negative codes
    # internally: no ID[] node is emitted and the importer resolves
    # them by name.
    "sinu": ("Sinusoidal", -1, [
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
    "moll": ("Mollweide", -2, [
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
    "robin": ("Robinson", -3, [
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
    "mill": ("Miller Cylindrical", -4, [
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
    "gstmerc": ("Gauss Schreiber Transverse Mercator", -5, _P_NAT),
    "ortho": ("Orthographic", 9840, _P_NOK),
    "bonne": ("Bonne", 9827, [
        ("Latitude of natural origin", 8801, "lat_1", 0.0, _ANG),
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
    "col_urban": ("Colombia Urban", 1052, [
        ("Latitude of natural origin", 8801, "lat_0", 0.0, _ANG),
        ("Longitude of natural origin", 8802, "lon_0", 0.0, _ANG),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN),
        ("Projection plane origin height", 1039, "h_0", 0.0, _LEN)]),
    "krovak": ("Krovak", 9819, [
        ("Latitude of projection centre", 8811, "lat_0", 49.5, _ANG),
        ("Longitude of origin", None, "lon_0", 24.833333333333332, _ANG),
        ("Co-latitude of cone axis", 1036, "alpha", 30.288139722222223,
         _ANG),
        ("Latitude of pseudo standard parallel", None, "lat_1", 78.5,
         _ANG),
        ("Scale factor on pseudo standard parallel", None, "k", 0.9999,
         _SCL),
        ("False easting", 8806, "x_0", 0.0, _LEN),
        ("False northing", 8807, "y_0", 0.0, _LEN)]),
}
# Modified Krovak (EPSG 1042) shares Krovak's parameter set
_EXPORT["mod_krovak"] = ("Modified Krovak", 1042, _EXPORT["krovak"][2])


def _select_method(proj: str, kv: dict):
    """(method name, code, params) for a proj name — lcc/merc pick
    their EPSG variant from the parameters present."""
    if proj == "lcc":
        if "lat_2" in kv:
            if "k" in kv and float(kv["k"]) != 1.0:
                return ("Lambert Conic Conformal (2SP Michigan)", 1051,
                        _P_FALSE_ORIGIN + [
                            ("Ellipsoid scaling factor", 1038, "k",
                             1.0, _SCL)])
            return ("Lambert Conic Conformal (2SP)", 9802,
                    _P_FALSE_ORIGIN)
        if "lat_1" in kv and float(kv["lat_1"]) != \
                float(kv.get("lat_0", 0.0)):
            raise NotImplementedError(
                "WKT export: lcc with lat_1 != lat_0 and no lat_2")
        return ("Lambert Conic Conformal (1SP)", 9801, _P_NAT)
    if proj == "stere":
        lat0 = float(kv.get("lat_0", 0.0) if kv.get("lat_0") is not True
                     else 0.0)
        if abs(lat0) == 90.0:
            if "lat_ts" in kv:
                return ("Polar Stereographic (variant B)", 9829, [
                    ("Latitude of standard parallel", 8832, "lat_ts",
                     0.0, _ANG),
                    ("Longitude of origin", 8833, "lon_0", 0.0, _ANG),
                    ("False easting", 8806, "x_0", 0.0, _LEN),
                    ("False northing", 8807, "y_0", 0.0, _LEN)])
            return ("Polar Stereographic (variant A)", 9810, _P_NAT)
        raise NotImplementedError(
            "WKT export: oblique stere has no EPSG method (use sterea)")
    if proj == "cass" and "hyperbolic" in kv:
        return ("Hyperbolic Cassini-Soldner", 9833, _P_NOK)
    if proj == "omerc" and "no_uoff" in kv:
        return ("Hotine Oblique Mercator (variant A)", 9812, _P_CENTRE)
    if proj == "aeqd" and "guam" in kv:
        return ("Guam Projection", 9831, _P_NOK)
    if proj == "merc":
        if "lat_ts" in kv:
            return ("Mercator (variant B)", 9805, [
                ("Latitude of 1st standard parallel", 8823, "lat_ts",
                 0.0, _ANG),
                ("Longitude of natural origin", 8802, "lon_0", 0.0,
                 _ANG),
                ("False easting", 8806, "x_0", 0.0, _LEN),
                ("False northing", 8807, "y_0", 0.0, _LEN)])
        return ("Mercator (variant A)", 9804, _P_NAT)
    if proj not in _EXPORT:
        raise NotImplementedError(
            f"WKT/PROJJSON export of +proj={proj} not supported")
    return _EXPORT[proj]


def _tok(defn: str) -> dict:
    from proj_ray.params import tokenize

    kv = dict(tokenize(defn))
    if "k_0" in kv and "k" not in kv:
        kv["k"] = kv.pop("k_0")
    if "datum" in kv and "ellps" not in kv and "a" not in kv:
        from proj_ray.factory import DATUMS

        ds = DATUMS.get(str(kv["datum"]))
        if ds:
            kv["ellps"] = ds[1]
    return kv


def _f(kv, key, default=0.0):
    v = kv.get(key, default)
    if v is True or v is None:
        return default
    return float(v)


def _num(v: float) -> str:
    return f"{float(v):.17g}"


def _ellipsoid_parts(kv) -> tuple[float, float, str]:
    """(a, rf, name) from a proj kv dict (rf == 0 -> sphere)."""
    from proj_ray.ellipsoid import ELLPS_TABLE, Ellipsoid

    name = "unknown"
    if "ellps" in kv:
        ename = str(kv["ellps"])
        if ename not in ELLPS_TABLE:
            raise NotImplementedError(f"unknown ellipsoid {ename}")
        ea, ekind, ev = ELLPS_TABLE[ename]
        ell = Ellipsoid.from_a_and(ea, ekind, ev)
        name = ename
    elif "R" in kv:
        return float(kv["R"]), 0.0, "unknown"
    elif "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            return a, float(kv["rf"]), name
        if "b" in kv:
            b = float(kv["b"])
            return a, (a / (a - b) if a != b else 0.0), name
        if "es" in kv:
            es = float(kv["es"])
            f = 1 - math.sqrt(1 - es)
            return a, (1 / f if f else 0.0), name
        if "f" in kv:
            f = float(kv["f"])
            return a, (1 / f if f else 0.0), name
        return a, 0.0, name
    else:
        raise NotImplementedError("no ellipsoid in definition")
    f = 1 - ell.b / ell.a
    return ell.a, (1 / f if f else 0.0), name


def _geog_wkt(kv, name="unknown") -> str:
    a, rf, ename = _ellipsoid_parts(kv)
    pm = ""
    from proj_ray.params import PRIME_MERIDIANS, dms_to_deg

    if "pm" in kv:
        raw = str(kv["pm"])
        val = PRIME_MERIDIANS.get(raw)
        pmv = dms_to_deg(val) if val is not None else float(raw)
        pmname = raw if val is not None else "unknown"
        pm = f',PRIMEM["{pmname}",{_num(pmv)},{DEG_UNIT}]'
    else:
        pm = f',PRIMEM["Greenwich",0,{DEG_UNIT}]'
    return (f'DATUM["unknown",ELLIPSOID["{ename}",{_num(a)},{_num(rf)},'
            f'{M_UNIT}]]{pm}')


def _unit_wkt(kv) -> str:
    from proj_ray.params import UNITS_TO_METER

    if "to_meter" in kv:
        f = float(kv["to_meter"])
        return f'LENGTHUNIT["unknown",{_num(f)}]'
    u = str(kv.get("units", "m"))
    fv = UNITS_TO_METER.get(u)
    if fv is None:
        raise NotImplementedError(f"unknown unit {u}")
    if fv == 1.0:
        return M_UNIT
    return f'LENGTHUNIT["{u}",{_num(fv)}]'


_AXIS_DIR = {"e": ("(E)", "east"), "w": ("(W)", "west"),
             "n": ("(N)", "north"), "s": ("(S)", "south")}


def _geo_cs_wkt(kv) -> str:
    """Ellipsoidal (or spherical-planetocentric, +geoc) CS for a
    geographic CRS, honoring +axis tuple order and directions (the
    IAU registry's nwu planetographic convention). The standard
    lat-north / lon-east declaration maps back to the engine's
    CRS-normalized default on import."""
    geoc = "geoc" in kv
    latn = "planetocentric latitude" if geoc else "geodetic latitude (Lat)"
    lonn = "planetocentric longitude" if geoc else \
        "geodetic longitude (Lon)"
    cs = "CS[spherical,2]" if geoc else "CS[ellipsoidal,2]"
    ax = str(kv.get("axis", "enu"))
    if len(ax) != 3 or ax[2] not in "ud" or any(
            c not in "ewns" for c in ax[:2]):
        raise NotImplementedError(f"WKT export: axis {ax!r} unsupported")
    pair = ax[:2]
    if pair == "ne":
        # WKT's standard lat-first declaration is indistinguishable
        # from the engine-normalized default on re-import, so the
        # lat-lon TUPLE order of +axis=neu cannot round-trip — refuse
        # rather than silently drop it
        raise NotImplementedError(
            "WKT export: geographic +axis=neu (lat,lon tuple order) "
            "is not distinguishable from the normalized default")
    if pair == "en":
        entries = [(latn, "north"), (lonn, "east")]
    else:
        dirs = {"e": "east", "w": "west", "n": "north", "s": "south"}
        entries = [((latn if c in "ns" else lonn), dirs[c])
                   for c in pair]
    return cs + "," + ",".join(
        f'AXIS["{n}",{d},ORDER[{i + 1}],{DEG_UNIT}]'
        for i, (n, d) in enumerate(entries))


def _cs_wkt(kv, unit: str) -> str:
    """Cartesian CS with AXIS entries honoring +axis (default enu)."""
    ax = str(kv.get("axis", "enu"))
    if len(ax) != 3 or ax[0] not in _AXIS_DIR or ax[1] not in _AXIS_DIR \
            or ax[2] not in "ud":
        raise NotImplementedError(f"WKT export: axis {ax!r} unsupported")
    parts = [f'AXIS["{_AXIS_DIR[c][0]}",{_AXIS_DIR[c][1]},'
             f'ORDER[{i + 1}],{unit}]' for i, c in enumerate(ax[:2])]
    return "CS[Cartesian,2]," + ",".join(parts)


_WGS84_GEOG_WKT = (
    'GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
    'ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],'
    'PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],'
    'CS[ellipsoidal,2],'
    'AXIS["geodetic latitude (Lat)",north,ORDER[1],'
    'ANGLEUNIT["degree",0.0174532925199433]],'
    'AXIS["geodetic longitude (Lon)",east,ORDER[2],'
    'ANGLEUNIT["degree",0.0174532925199433]],ID["EPSG",4326]]')

_TOW_NAMES = ("X-axis translation", "Y-axis translation",
              "Z-axis translation", "X-axis rotation", "Y-axis rotation",
              "Z-axis rotation", "Scale difference")
_TOW_CODES = (8605, 8606, 8607, 8608, 8609, 8610, 8611)


def _towgs84_vals(kv) -> list | None:
    if "towgs84" not in kv:
        return None
    vals = [float(v) for v in str(kv["towgs84"]).split(",")]
    vals += [0.0] * (7 - len(vals))
    return vals[:7]


def _bound_wrap_wkt(vals: list, inner: str) -> str:
    """BOUNDCRS wrapper carrying +towgs84 as the reference's abridged
    transformation (io.cpp BoundCRS export: 3-param -> Geocentric
    translations 9603; 7-param -> Position Vector 9606 with Scale
    difference expressed as 1 + ppm*1e-6)."""
    seven = any(v != 0.0 for v in vals[3:])
    if seven:
        mname, mcode, n = ("Position Vector transformation "
                           "(geog2D domain)", 9606, 7)
    else:
        mname, mcode, n = ("Geocentric translations (geog2D domain)",
                           9603, 3)
    ps = []
    for i in range(n):
        v = vals[i]
        if i == 6:
            v = 1.0 + v * 1e-6
        ps.append(f'PARAMETER["{_TOW_NAMES[i]}",{_num(v)},'
                  f'ID["EPSG",{_TOW_CODES[i]}]]')
    return (f'BOUNDCRS[SOURCECRS[{inner}],'
            f'TARGETCRS[{_WGS84_GEOG_WKT}],'
            f'ABRIDGEDTRANSFORMATION['
            f'"Transformation from unknown to WGS84",'
            f'METHOD["{mname}",ID["EPSG",{mcode}]],{",".join(ps)}]]')


def proj_to_wkt2(defn: str, name: str = "unknown") -> str:
    """proj string -> WKT2:2019 (subset; see module docstring)."""
    kv = _tok(defn)
    tow = _towgs84_vals(kv)
    if tow is not None:
        import re

        inner = proj_to_wkt2(
            re.sub(r"\+towgs84=\S+", "", defn).strip(), name)
        return _bound_wrap_wkt(tow, inner)
    proj = str(kv.get("proj", ""))
    if proj in ("longlat", "latlong", "lonlat", "latlon"):
        return (f'GEOGCRS["{name}",{_geog_wkt(kv)},'
                f'{_geo_cs_wkt(kv)}]')
    if proj == "geocent":
        unit = _unit_wkt(kv)
        return (f'GEODCRS["{name}",{_geog_wkt(kv)},'
                f'CS[Cartesian,3],'
                f'AXIS["(X)",geocentricX,ORDER[1],{unit}],'
                f'AXIS["(Y)",geocentricY,ORDER[2],{unit}],'
                f'AXIS["(Z)",geocentricZ,ORDER[3],{unit}]]')
    if proj == "utm":
        zone = int(_f(kv, "zone"))
        south = "south" in kv
        kv = dict(kv)
        kv["lat_0"] = 0.0
        kv["lon_0"] = zone * 6 - 183
        kv["k"] = 0.9996
        kv["x_0"] = 500000.0
        kv["y_0"] = 10000000.0 if south else 0.0
        proj = "tmerc"
    mname, mcode, params = _select_method(proj, kv)
    mid = f',ID["EPSG",{mcode}]' if mcode > 0 else ""
    lines = [f'METHOD["{mname}"{mid}]']
    for pname, pcode, key, default, kind in params:
        if default is None and key not in kv:
            continue
        val = _f(kv, key, default if default is not None else 0.0)
        unit = (DEG_UNIT if kind == _ANG
                else 'SCALEUNIT["unity",1]' if kind == _SCL
                else M_UNIT)
        idtail = f',ID["EPSG",{pcode}]' if pcode is not None else ""
        lines.append(f'PARAMETER["{pname}",{_num(val)},{unit}{idtail}]')
    unit = _unit_wkt(kv)
    return (f'PROJCRS["{name}",BASEGEOGCRS["unknown",{_geog_wkt(kv)}],'
            f'CONVERSION["unknown",{",".join(lines)}],'
            f'{_cs_wkt(kv, unit)}]')


_AXIS_JSON = {"e": ("Easting", "E", "east"),
              "w": ("Westing", "W", "west"),
              "n": ("Northing", "N", "north"),
              "s": ("Southing", "S", "south")}


def _bound_wrap_json(vals: list, inner: dict) -> dict:
    seven = any(v != 0.0 for v in vals[3:])
    if seven:
        mname, mcode, n = ("Position Vector transformation "
                           "(geog2D domain)", 9606, 7)
    else:
        mname, mcode, n = ("Geocentric translations (geog2D domain)",
                           9603, 3)
    units = ("metre", "metre", "metre", "arc-second", "arc-second",
             "arc-second", "parts per million")
    params = [{"name": _TOW_NAMES[i], "value": vals[i],
               "unit": units[i],
               "id": {"authority": "EPSG", "code": _TOW_CODES[i]}}
              for i in range(n)]
    schema = inner.pop("$schema", None)
    target = {
        "type": "GeographicCRS", "name": "WGS 84",
        "datum": {"type": "GeodeticReferenceFrame",
                  "name": "World Geodetic System 1984",
                  "ellipsoid": {"name": "WGS 84",
                                "semi_major_axis": 6378137,
                                "inverse_flattening": 298.257223563}},
        "coordinate_system": {
            "subtype": "ellipsoidal",
            "axis": [
                {"name": "Geodetic latitude", "abbreviation": "Lat",
                 "direction": "north", "unit": "degree"},
                {"name": "Geodetic longitude", "abbreviation": "Lon",
                 "direction": "east", "unit": "degree"}]},
        "id": {"authority": "EPSG", "code": 4326}}
    out = {
        "type": "BoundCRS",
        "name": inner.get("name", "unknown"),
        "source_crs": inner,
        "target_crs": target,
        "transformation": {
            "name": "Transformation from unknown to WGS84",
            "method": {"name": mname,
                       "id": {"authority": "EPSG", "code": mcode}},
            "parameters": params}}
    if schema:
        out["$schema"] = schema
    return out


def proj_to_projjson(defn: str, name: str = "unknown") -> dict:
    """proj string -> PROJJSON dict (subset; metre projected CS)."""
    kv = _tok(defn)
    tow = _towgs84_vals(kv)
    if tow is not None:
        import re

        inner = proj_to_projjson(
            re.sub(r"\+towgs84=\S+", "", defn).strip(), name)
        return _bound_wrap_json(tow, inner)
    proj = str(kv.get("proj", ""))

    def geog_json(with_axis: bool = True):
        a, rf, ename = _ellipsoid_parts(kv)
        ell = {"name": ename, "semi_major_axis": a}
        if rf:
            ell["inverse_flattening"] = rf
        else:
            ell["semi_minor_axis"] = a
        datum = {"type": "GeodeticReferenceFrame",
                 "name": "unknown", "ellipsoid": ell}
        if "pm" in kv:
            from proj_ray.params import PRIME_MERIDIANS, dms_to_deg

            raw = str(kv["pm"])
            val = PRIME_MERIDIANS.get(raw)
            datum["prime_meridian"] = {
                "name": raw if val is not None else "unknown",
                "longitude": dms_to_deg(val) if val is not None
                else float(raw)}
        geoc = "geoc" in kv
        latn = ("Planetocentric latitude" if geoc
                else "Geodetic latitude")
        lonn = ("Planetocentric longitude" if geoc
                else "Geodetic longitude")
        ax = str(kv.get("axis", "enu")) if with_axis else "enu"
        if len(ax) != 3 or ax[2] not in "ud" or any(
                c not in "ewns" for c in ax[:2]):
            raise NotImplementedError(
                f"PROJJSON export: axis {ax!r} unsupported")
        if ax[:2] == "ne":
            raise NotImplementedError(
                "PROJJSON export: geographic +axis=neu (lat,lon tuple "
                "order) is not distinguishable from the normalized "
                "default")
        if ax[:2] == "en":
            entries = [(latn, "Lat", "north"), (lonn, "Lon", "east")]
        else:
            dirs = {"e": "east", "w": "west", "n": "north", "s": "south"}
            entries = [((latn, "Lat", dirs[c]) if c in "ns"
                        else (lonn, "Lon", dirs[c])) for c in ax[:2]]
        return {
            "type": "GeographicCRS",
            "name": "unknown",
            "datum": datum,
            "coordinate_system": {
                "subtype": "spherical" if geoc else "ellipsoidal",
                "axis": [
                    {"name": n, "abbreviation": ab, "direction": d,
                     "unit": "degree"} for n, ab, d in entries]},
        }

    if proj in ("longlat", "latlong", "lonlat", "latlon"):
        out = geog_json()
        out["name"] = name
        out["$schema"] = ("https://proj.org/schemas/v0.7/projjson."
                          "schema.json")
        return out
    if proj == "geocent":
        out = geog_json()
        out["type"] = "GeodeticCRS"
        out["name"] = name
        out["coordinate_system"] = {
            "subtype": "Cartesian",
            "axis": [
                {"name": "Geocentric X", "abbreviation": "X",
                 "direction": "geocentricX", "unit": "metre"},
                {"name": "Geocentric Y", "abbreviation": "Y",
                 "direction": "geocentricY", "unit": "metre"},
                {"name": "Geocentric Z", "abbreviation": "Z",
                 "direction": "geocentricZ", "unit": "metre"}]}
        out["$schema"] = ("https://proj.org/schemas/v0.7/projjson."
                          "schema.json")
        return out
    if proj == "utm":
        zone = int(_f(kv, "zone"))
        south = "south" in kv
        kv = dict(kv)
        kv.update(lat_0=0.0, lon_0=zone * 6 - 183, k=0.9996,
                  x_0=500000.0, y_0=10000000.0 if south else 0.0)
        proj = "tmerc"
    mname, mcode, params = _select_method(proj, kv)
    plist = []
    for pname, pcode, key, default, kind in params:
        if default is None and key not in kv:
            continue
        val = _f(kv, key, default if default is not None else 0.0)
        p = {"name": pname, "value": val,
             "unit": ("degree" if kind == _ANG else
                      "unity" if kind == _SCL else "metre")}
        if pcode is not None:
            p["id"] = {"authority": "EPSG", "code": pcode}
        plist.append(p)
    return {
        "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
        "type": "ProjectedCRS",
        "name": name,
        "base_crs": geog_json(with_axis=False),
        "conversion": {
            "name": "unknown",
            "method": ({"name": mname,
                        "id": {"authority": "EPSG", "code": mcode}}
                       if mcode > 0 else {"name": mname}),
            "parameters": plist},
        "coordinate_system": {
            "subtype": "Cartesian",
            "axis": _json_axes(kv)},
    }


def _json_axes(kv) -> list:
    ax = str(kv.get("axis", "enu"))
    if len(ax) != 3 or ax[0] not in _AXIS_JSON or ax[1] not in _AXIS_JSON \
            or ax[2] not in "ud":
        raise NotImplementedError(
            f"PROJJSON export: axis {ax!r} unsupported")
    from proj_ray.params import UNITS_TO_METER

    if "to_meter" in kv:
        unit = {"type": "LinearUnit", "name": "unknown",
                "conversion_factor": float(kv["to_meter"])}
    else:
        u = str(kv.get("units", "m"))
        f = UNITS_TO_METER.get(u)
        if f is None:
            raise NotImplementedError(f"PROJJSON export: unit {u!r}")
        unit = "metre" if f == 1.0 else \
            {"type": "LinearUnit", "name": u, "conversion_factor": f}
    return [{"name": _AXIS_JSON[c][0], "abbreviation": _AXIS_JSON[c][1],
             "direction": _AXIS_JSON[c][2], "unit": unit}
            for c in ax[:2]]


# WKT1-GDAL projection names per EPSG method code (the names
# wkt._METHOD_BY_NAME already imports — parse(emit(x)) is exact)
_WKT1_PROJECTION = {
    9807: "Transverse_Mercator",
    9804: "Mercator_1SP",
    9805: "Mercator_2SP",
    9801: "Lambert_Conformal_Conic_1SP",
    9802: "Lambert_Conformal_Conic_2SP",
    9822: "Albers_Conic_Equal_Area",
    9806: "Cassini_Soldner",
    9809: "Oblique_Stereographic",
    9810: "Polar_Stereographic",
    9815: "Hotine_Oblique_Mercator_Azimuth_Center",
    9818: "Polyconic",
    9820: "Lambert_Azimuthal_Equal_Area",
    9832: "Azimuthal_Equidistant",
    9835: "Cylindrical_Equal_Area",
    1028: "Equirectangular",
    9811: "New_Zealand_Map_Grid",
    1024: "Mercator_Auxiliary_Sphere",
    9819: "Krovak",
    -1: "Sinusoidal", -2: "Mollweide", -3: "Robinson",
    -4: "Miller_Cylindrical", -5: "Gauss_Schreiber_Transverse_Mercator",
    9840: "Orthographic", 9827: "Bonne",
}
# proj key -> WKT1-GDAL parameter name; lat_ts maps to
# standard_parallel_1 (EPSG 8823), which the importer's method post-fix
# turns back into +lat_ts for Mercator-B / eqc / cea
_WKT1_PARAM = {
    "lat_0": "latitude_of_origin", "lon_0": "central_meridian",
    "lonc": "longitude_of_center", "alpha": "azimuth",
    "gamma": "rectified_grid_angle", "k": "scale_factor",
    "x_0": "false_easting", "y_0": "false_northing",
    "lat_1": "standard_parallel_1", "lat_2": "standard_parallel_2",
    "lat_ts": "standard_parallel_1",
    "h_0": "projection_plane_origin_height",
}


def _geog_wkt1(kv, name="unknown") -> str:
    a, rf, ename = _ellipsoid_parts(kv)
    from proj_ray.params import PRIME_MERIDIANS, dms_to_deg

    if "pm" in kv:
        raw = str(kv["pm"])
        val = PRIME_MERIDIANS.get(raw)
        pmv = dms_to_deg(val) if val is not None else float(raw)
        pmname = raw if val is not None else "unknown"
        pm = f'PRIMEM["{pmname}",{_num(pmv)}]'
    else:
        pm = 'PRIMEM["Greenwich",0]'
    tow = _towgs84_vals(kv)
    towtxt = ""
    if tow is not None:
        n = 7 if any(v != 0.0 for v in tow[3:]) else 3
        towtxt = (',TOWGS84[' +
                  ",".join(_num(v) for v in tow[:n]) + ']')
    return (f'GEOGCS["{name}",DATUM["unknown",'
            f'SPHEROID["{ename}",{_num(a)},{_num(rf)}]{towtxt}],{pm},'
            f'UNIT["degree",0.0174532925199433]]')


def proj_to_wkt1(defn: str, name: str = "unknown") -> str:
    """proj string -> WKT1 (GDAL flavor, subset; same method coverage
    and round-trip guarantee as proj_to_wkt2 — reference writer
    src/iso19111/io.cpp WKTFormatter::Convention::WKT1_GDAL)."""
    kv = _tok(defn)
    proj = str(kv.get("proj", ""))
    if proj in ("longlat", "latlong", "lonlat", "latlon"):
        if "geoc" in kv:
            raise NotImplementedError(
                "WKT1 cannot express a planetocentric (+geoc) CRS")
        g = _geog_wkt1(kv, name)
        ax = str(kv.get("axis", "enu"))
        if ax[:2] == "ne":
            raise NotImplementedError(
                "WKT1 export: geographic +axis=neu (lat,lon tuple "
                "order) is not distinguishable from the normalized "
                "default")
        if ax[:2] != "en":
            if len(ax) != 3 or ax[2] not in "ud" or any(
                    c not in "ewns" for c in ax[:2]):
                raise NotImplementedError(
                    f"WKT1 export: axis {ax!r} unsupported")
            names = {"e": ("Long", "EAST"), "w": ("Long", "WEST"),
                     "n": ("Lat", "NORTH"), "s": ("Lat", "SOUTH")}
            axtxt = ",".join(f'AXIS["{names[c][0]}",{names[c][1]}]'
                             for c in ax[:2])
            g = g[:-1] + "," + axtxt + "]"
        return g
    if proj == "geocent":
        a, rf, ename = _ellipsoid_parts(kv)
        tow = _towgs84_vals(kv)
        towtxt = ""
        if tow is not None:
            nt = 7 if any(v != 0.0 for v in tow[3:]) else 3
            towtxt = (',TOWGS84[' +
                      ",".join(_num(v) for v in tow[:nt]) + ']')
        from proj_ray.params import PRIME_MERIDIANS, dms_to_deg

        if "pm" in kv:
            raw = str(kv["pm"])
            val = PRIME_MERIDIANS.get(raw)
            pmv = dms_to_deg(val) if val is not None else float(raw)
            pmname = raw if val is not None else "unknown"
            pmtxt = f'PRIMEM["{pmname}",{_num(pmv)}]'
        else:
            pmtxt = 'PRIMEM["Greenwich",0]'
        return (f'GEOCCS["{name}",DATUM["unknown",'
                f'SPHEROID["{ename}",{_num(a)},{_num(rf)}]{towtxt}],'
                f'{pmtxt},UNIT["metre",1],'
                f'AXIS["Geocentric X",OTHER],'
                f'AXIS["Geocentric Y",OTHER],'
                f'AXIS["Geocentric Z",NORTH]]')
    if proj == "utm":
        zone = int(_f(kv, "zone"))
        south = "south" in kv
        kv = dict(kv)
        kv["lat_0"] = 0.0
        kv["lon_0"] = zone * 6 - 183
        kv["k"] = 0.9996
        kv["x_0"] = 500000.0
        kv["y_0"] = 10000000.0 if south else 0.0
        proj = "tmerc"
    _mname, mcode, params = _select_method(proj, kv)
    # GDAL WKT1 name when one exists, else the EPSG method name (the
    # reference's WKT1 writer does the same for GDAL-nameless methods;
    # the importer resolves both via _METHOD_BY_NAME)
    wname = _WKT1_PROJECTION.get(mcode, _mname)
    lines = [f'PROJECTION["{wname}"]']
    for _pname, _pcode, key, default, _kind in params:
        if default is None and key not in kv:
            continue
        val = _f(kv, key, default if default is not None else 0.0)
        lines.append(f'PARAMETER["{_WKT1_PARAM[key]}",{_num(val)}]')
    from proj_ray.params import UNITS_TO_METER

    if "to_meter" in kv:
        unit = f'UNIT["unknown",{_num(float(kv["to_meter"]))}]'
    else:
        u = str(kv.get("units", "m"))
        fv = UNITS_TO_METER.get(u)
        if fv is None:
            raise NotImplementedError(f"unknown unit {u}")
        unit = ('UNIT["metre",1]' if fv == 1.0
                else f'UNIT["{u}",{_num(fv)}]')
    ax = str(kv.get("axis", "enu"))
    axtxt = ""
    if ax != "enu":
        if len(ax) != 3 or ax[0] not in _AXIS_DIR \
                or ax[1] not in _AXIS_DIR or ax[2] not in "ud":
            raise NotImplementedError(
                f"WKT1 export: axis {ax!r} unsupported")
        names = {"e": ("Easting", "EAST"), "w": ("Westing", "WEST"),
                 "n": ("Northing", "NORTH"), "s": ("Southing", "SOUTH")}
        axtxt = "," + ",".join(
            f'AXIS["{names[c][0]}",{names[c][1]}]' for c in ax[:2])
    return (f'PROJCS["{name}",{_geog_wkt1(kv)},'
            f'{",".join(lines)},{unit}{axtxt}]')
