"""WKT1 / WKT2 / PROJJSON -> proj-string subset parser.

The reference's full grammar machinery (src/wkt1_grammar.y,
src/wkt2_grammar.y, src/iso19111/io.cpp — 13k LoC) is out of scope;
this module covers the shapes CRS text actually arrives in for the
engine's supported conversion methods: PROJCS/GEOGCS (WKT1),
PROJCRS/GEOGCRS (WKT2), and PROJJSON ProjectedCRS/GeographicCRS.
An embedded authority ID (ID["EPSG", n] / "id": {...}) short-circuits
to the static EPSG registry; otherwise the tree is translated
structurally. Unknown methods raise NotImplementedError (never a
silent wrong answer).
"""

from __future__ import annotations

import json
import re

# EPSG method code -> proj name + extras (subset shared with
# tools/gen_epsg.py)
_METHOD_BY_CODE = {
    9807: ("tmerc", []), 9808: ("tmerc", ["axis=wsu"]),
    9802: ("lcc", []), 9801: ("lcc", []), 1051: ("lcc", []),
    9804: ("merc", []), 9805: ("merc", []), 1024: ("webmerc", []),
    9806: ("cass", []), 9833: ("cass", ["hyperbolic"]),
    9809: ("sterea", []), 9810: ("stere", []),
    9829: ("stere", []), 9812: ("omerc", ["no_uoff"]), 9815: ("omerc", []),
    9818: ("poly", []), 9820: ("laea", []), 9822: ("aea", []),
    9832: ("aeqd", []), 9831: ("aeqd", ["guam"]), 9835: ("cea", []),
    1028: ("eqc", []), 1029: ("eqc", []), 9823: ("eqc", []),
    9811: ("nzmg", []), 9819: ("krovak", []), 1041: ("krovak", []),
    1042: ("mod_krovak", []), 1043: ("mod_krovak", []),
    1052: ("col_urban", []),
    9840: ("ortho", []), 9827: ("bonne", []),
    # synthetic negative codes: EPSG-codeless methods resolved by name
    -1: ("sinu", []), -2: ("moll", []), -3: ("robin", []),
    -4: ("mill", []), -5: ("gstmerc", []),
}

_METHOD_BY_NAME = {
    "transverse mercator": 9807,
    "transverse_mercator": 9807,
    "transverse mercator (south orientated)": 9808,
    "mercator_1sp": 9804, "mercator (variant a)": 9804,
    "mercator_2sp": 9805, "mercator (variant b)": 9805,
    "mercator_auxiliary_sphere": 1024,
    "popular visualisation pseudo mercator": 1024,
    "lambert conic conformal (1sp)": 9801,
    "lambert_conformal_conic_1sp": 9801,
    "lambert conic conformal (2sp)": 9802,
    "lambert_conformal_conic_2sp": 9802,
    "lambert_conformal_conic": 9802,
    "albers conic equal area": 9822, "albers_conic_equal_area": 9822,
    "albers equal area": 9822,
    "cassini_soldner": 9806, "cassini-soldner": 9806,
    "hyperbolic cassini-soldner": 9833,
    "oblique stereographic": 9809, "oblique_stereographic": 9809,
    "double_stereographic": 9809,
    "polar stereographic (variant a)": 9810, "polar_stereographic": 9810,
    "polar stereographic (variant b)": 9829,
    "hotine oblique mercator (variant a)": 9812,
    "hotine_oblique_mercator": 9812,
    "hotine oblique mercator (variant b)": 9815,
    "hotine_oblique_mercator_azimuth_center": 9815,
    "american polyconic": 9818, "polyconic": 9818,
    "lambert azimuthal equal area": 9820,
    "lambert_azimuthal_equal_area": 9820,
    "modified azimuthal equidistant": 9832, "azimuthal_equidistant": 9832,
    "lambert cylindrical equal area": 9835,
    "cylindrical_equal_area": 9835,
    "equidistant cylindrical": 1028, "equirectangular": 1028,
    "new zealand map grid": 9811, "new_zealand_map_grid": 9811,
    "krovak": 9819, "modified krovak": 1042,
    "lambert conic conformal (2sp michigan)": 1051,
    "colombia urban": 1052, "guam projection": 9831,
    "sinusoidal": -1, "mollweide": -2, "robinson": -3,
    "miller cylindrical": -4, "miller_cylindrical": -4,
    "orthographic": 9840, "bonne": 9827,
    "gauss schreiber transverse mercator": -5,
    "gauss_schreiber_transverse_mercator": -5,
}

# EPSG parameter code / WKT name -> proj key
_PARAM_BY_CODE = {
    8801: "lat_0", 8802: "lon_0", 8805: "k", 8806: "x_0", 8807: "y_0",
    8811: "lat_0", 8812: "lonc", 8813: "alpha", 8814: "gamma",
    8815: "k", 8816: "x_0", 8817: "y_0",
    8821: "lat_0", 8822: "lon_0", 8823: "lat_1", 8824: "lat_2",
    8826: "x_0", 8827: "y_0", 8832: "lat_ts", 8833: "lon_0",
    1036: "alpha", 8818: "lat_1", 8819: "k", 1038: "k", 1039: "h_0",
}
_PARAM_BY_NAME = {
    "latitude_of_origin": "lat_0", "latitude of natural origin": "lat_0",
    "latitude of false origin": "lat_0",
    "latitude of projection centre": "lat_0",
    "latitude_of_center": "lat_0",
    "central_meridian": "lon_0", "longitude of natural origin": "lon_0",
    "longitude of false origin": "lon_0", "longitude of origin": "lon_0",
    "longitude_of_center": "lonc",
    "longitude of projection centre": "lonc",
    "scale_factor": "k", "scale factor at natural origin": "k",
    "scale factor on initial line": "k",
    "scale factor on pseudo standard parallel": "k",
    "false_easting": "x_0", "false easting": "x_0",
    "easting at false origin": "x_0",
    "easting at projection centre": "x_0",
    "false_northing": "y_0", "false northing": "y_0",
    "northing at false origin": "y_0",
    "northing at projection centre": "y_0",
    "standard_parallel_1": "lat_1",
    "latitude of 1st standard parallel": "lat_1",
    "latitude of pseudo standard parallel": "lat_1",
    "standard_parallel_2": "lat_2",
    "latitude of 2nd standard parallel": "lat_2",
    "latitude of standard parallel": "lat_ts",
    "azimuth": "alpha", "azimuth at projection centre": "alpha",
    "azimuth of initial line": "alpha",
    "co-latitude of cone axis": "alpha",
    "angle from rectified to skew grid": "gamma",
    "rectified_grid_angle": "gamma",
    "pseudo_standard_parallel_1": "lat_1",
    "projection plane origin height": "h_0",
    "projection_plane_origin_height": "h_0",
}
_ANGLE_KEYS = {"lat_0", "lon_0", "lonc", "alpha", "gamma", "lat_1",
               "lat_2", "lat_ts"}


def _method_post_fix(mcode: int, kv: dict) -> None:
    """Method-specific parameter normalization shared by the WKT and
    PROJJSON importers."""
    if mcode == 9801 and "lat_1" not in kv and "lat_0" in kv:
        kv["lat_1"] = kv["lat_0"]  # LCC 1SP
    if mcode == 9829 and "lat_1" in kv and "lat_ts" not in kv:
        # WKT1 writes the standard parallel as standard_parallel_1
        kv["lat_ts"] = kv.pop("lat_1")
    if mcode == 9829 and "lat_0" not in kv:
        kv["lat_0"] = 90.0 if kv.get("lat_ts", 90.0) >= 0 else -90.0
    if mcode == 9827 and "lat_0" in kv:
        # Bonne's EPSG "Latitude of natural origin" is proj's +lat_1
        kv["lat_1"] = kv.pop("lat_0")
    if mcode in (9805, 1028, 9835) and "lat_1" in kv:
        # EPSG 8823 ("1st standard parallel") is proj's +lat_ts for
        # Mercator variant B / eqc / cea
        kv["lat_ts"] = kv.pop("lat_1")


class _Node:
    __slots__ = ("name", "args")

    def __init__(self, name, args):
        self.name = name
        self.args = args

    def find(self, *names):
        for a in self.args:
            if isinstance(a, _Node) and a.name.upper() in names:
                return a
        return None

    def find_all(self, *names):
        return [a for a in self.args
                if isinstance(a, _Node) and a.name.upper() in names]


def _parse_wkt(text: str) -> _Node:
    pos = 0
    n = len(text)

    def skip_ws():
        nonlocal pos
        while pos < n and text[pos] in " \t\r\n,":
            pos += 1

    def parse_value():
        nonlocal pos
        skip_ws()
        if pos >= n:
            raise ValueError("unexpected end of WKT")
        ch = text[pos]
        if ch == '"':
            end = pos + 1
            while end < n and text[end] != '"':
                end += 1
            s = text[pos + 1:end]
            pos = end + 1
            return s
        m = re.match(r"[-+0-9.eE]+", text[pos:])
        if m and re.match(r"[-+0-9.]", ch):
            pos += m.end()
            try:
                return float(m.group(0))
            except ValueError:
                return m.group(0)
        m = re.match(r"[A-Za-z_0-9]+", text[pos:])
        if not m:
            raise ValueError(f"bad WKT at {pos}: {text[pos:pos+20]!r}")
        name = m.group(0)
        pos += m.end()
        skip_ws_only()
        if pos < n and text[pos] in "[(":
            close = "]" if text[pos] == "[" else ")"
            pos += 1
            args = []
            while True:
                skip_ws()
                if pos < n and text[pos] == close:
                    pos += 1
                    break
                args.append(parse_value())
            return _Node(name, args)
        return name

    def skip_ws_only():
        nonlocal pos
        while pos < n and text[pos] in " \t\r\n":
            pos += 1

    v = parse_value()
    if not isinstance(v, _Node):
        raise ValueError("WKT did not parse to a node")
    return v


def _epsg_id_of(node: _Node):
    idn = node.find("ID", "AUTHORITY")
    if idn and len(idn.args) >= 2 and str(idn.args[0]).upper() == "EPSG":
        try:
            return int(float(idn.args[1]))
        except (TypeError, ValueError):
            return None
    return None


def _angle_unit_to_deg(node: _Node | None) -> float:
    """Factor converting the WKT angle unit to degrees."""
    import math

    if node is None:
        return 1.0
    try:
        f = float(node.args[1])
    except (IndexError, TypeError, ValueError):
        return 1.0
    return f / (math.pi / 180.0)


def _ellps_from(node: _Node) -> str:
    """SPHEROID/ELLIPSOID[name, a, rf] -> '+a=... +rf=...' (+unit)."""
    a = float(node.args[1])
    rf = float(node.args[2])
    u = node.find("LENGTHUNIT", "UNIT")
    if u is not None:
        try:
            a *= float(u.args[1])
        except (IndexError, TypeError, ValueError):
            pass
    if rf == 0:
        return f"+a={a:.15g} +b={a:.15g}"
    return f"+a={a:.15g} +rf={rf:.15g}"


def _geog_base(node: _Node) -> str:
    """GEOGCS/GEOGCRS/BASEGEOGCRS -> ellipsoid (+pm) fragment."""
    datum = node.find("DATUM", "TRF", "ENSEMBLE")
    if datum is None:
        raise NotImplementedError("WKT: no DATUM in geographic CRS")
    ell = datum.find("SPHEROID", "ELLIPSOID")
    if ell is None:
        raise NotImplementedError("WKT: no ELLIPSOID")
    parts = [_ellps_from(ell)]
    tow = datum.find("TOWGS84")
    if tow is not None and len(tow.args) >= 3:
        vals = ",".join(f"{float(v):.15g}" for v in tow.args[:7])
        parts.append(f"+towgs84={vals}")
    pm = node.find("PRIMEM")
    if pm is not None and len(pm.args) >= 2 and float(pm.args[1]) != 0.0:
        u = _angle_unit_to_deg(pm.find("ANGLEUNIT", "UNIT"))
        parts.append(f"+pm={float(pm.args[1]) * u:.15g}")
    return " ".join(parts)


def wkt_to_proj(text: str) -> str:
    """Translate a WKT1/WKT2 CRS string to a proj string (subset)."""
    return _node_to_proj(_parse_wkt(text))


def _bound_to_proj(root: _Node) -> str:
    """BOUNDCRS[SOURCECRS[...], TARGETCRS[...], ABRIDGEDTRANSFORMATION
    [...]] -> source proj string + +towgs84 (inverting wkt_export's
    abridged conventions: Scale difference carried as 1 + ppm*1e-6)."""
    src = root.find("SOURCECRS")
    if src is None:
        raise NotImplementedError("BOUNDCRS without SOURCECRS")
    inner = next((a for a in src.args if isinstance(a, _Node)), None)
    if inner is None:
        raise NotImplementedError("BOUNDCRS: empty SOURCECRS")
    base = _node_to_proj(inner)
    tr = root.find("ABRIDGEDTRANSFORMATION")
    if tr is None:
        return base
    names = {"x-axis translation": 0, "y-axis translation": 1,
             "z-axis translation": 2, "x-axis rotation": 3,
             "y-axis rotation": 4, "z-axis rotation": 5,
             "scale difference": 6}
    vals = [0.0] * 7
    seven = False
    for p in tr.find_all("PARAMETER"):
        i = names.get(str(p.args[0]).strip().lower())
        if i is None:
            continue
        v = float(p.args[1])
        if i == 6:
            v = (v - 1.0) * 1e6
        vals[i] = v
        if i >= 3:
            seven = True
    n = 7 if seven else 3
    tow = ",".join(f"{v:.15g}" for v in vals[:n])
    return f"{base} +towgs84={tow}"


_AXIS_CHAR = {"east": "e", "west": "w", "north": "n", "south": "s"}


def _geographic_to_proj(root: _Node) -> str:
    """GEOGCS/GEOGCRS -> +proj=longlat, reconstructing +geoc from a
    spherical (planetocentric) CS and +axis from non-standard AXIS
    directions/order. The standard lat-north/lon-east declaration is
    the engine's CRS-normalized default (no +axis emitted)."""
    out = f"+proj=longlat {_geog_base(root)}"
    cs = root.find("CS")
    geoc = (cs is not None and str(cs.args[0]).lower() == "spherical") \
        or any("planetocentric" in str(ax.args[0]).lower()
               for ax in root.find_all("AXIS"))
    if geoc:
        out += " +geoc"
    axes = root.find_all("AXIS")
    if len(axes) >= 2:
        chars = []
        for ax in axes[:2]:
            d = next((str(a).lower() for a in ax.args[1:]
                      if isinstance(a, str)), None)
            chars.append(_AXIS_CHAR.get(d))
        if None not in chars and "".join(chars) not in ("ne", "en"):
            out += f" +axis={''.join(chars)}u"
    return out


def _axis_string(root: _Node) -> str | None:
    """Derive a +axis= value from a projected CRS's AXIS nodes; None
    when default easting/northing (or not derivable)."""
    axes = root.find_all("AXIS")
    if len(axes) < 2:
        return None
    ordered = []
    for i, ax in enumerate(axes[:2]):
        d = next((str(a).lower() for a in ax.args[1:]
                  if isinstance(a, str)), None)
        o = ax.find("ORDER")
        try:
            pos = int(float(o.args[0])) if o is not None else i + 1
        except (TypeError, ValueError, IndexError):
            pos = i + 1
        ordered.append((pos, d))
    ordered.sort()
    chars = [_AXIS_CHAR.get(d) for _, d in ordered]
    if None in chars or chars == ["e", "n"]:
        return None
    return "".join(chars) + "u"


def _node_to_proj(root: _Node) -> str:
    name = root.name.upper()
    # authority shortcut: trust an explicit EPSG id when resolvable
    code = _epsg_id_of(root)
    if code is not None:
        try:
            from proj_ray.epsg import resolve_init

            return resolve_init(f"epsg:{code}")
        except NotImplementedError:
            pass
    if name == "BOUNDCRS":
        return _bound_to_proj(root)
    if name in ("GEOCCS", "GEODCRS", "GEODETICCRS"):
        # geocentric when the CS is 3-axis Cartesian (GEODCRS can also
        # express geographic; those carry an ellipsoidal CS)
        cs = root.find("CS")
        geocentric = name == "GEOCCS" or (
            cs is not None and str(cs.args[0]).lower() == "cartesian")
        if geocentric:
            return f"+proj=geocent {_geog_base(root)} +units=m"
        return _geographic_to_proj(root)
    if name in ("GEOGCS", "GEOGCRS", "GEOGRAPHICCRS"):
        return _geographic_to_proj(root)
    if name not in ("PROJCS", "PROJCRS", "PROJECTEDCRS"):
        raise NotImplementedError(f"WKT node {root.name} not supported")
    base = root.find("GEOGCS", "BASEGEOGCRS", "GEOGCRS")
    if base is None:
        raise NotImplementedError("WKT: projected CRS without base")
    geog = _geog_base(base)
    conv = root.find("CONVERSION")
    holder = conv if conv is not None else root
    meth = holder.find("PROJECTION", "METHOD")
    if meth is None:
        raise NotImplementedError("WKT: no PROJECTION/METHOD")
    mcode = _epsg_id_of(meth)
    if mcode is None:
        mname = str(meth.args[0]).strip().lower()
        mcode = _METHOD_BY_NAME.get(mname)
    if mcode is None or mcode not in _METHOD_BY_CODE:
        raise NotImplementedError(
            f"WKT: method {meth.args[0]!r} not supported")
    proj, extras = _METHOD_BY_CODE[mcode]
    # WKT1 PARAMETERs carry no unit node: angle values inherit the base
    # GEOGCS angular UNIT (e.g. NTF zones expressed in grads), matching
    # the reference's io.cpp WKT1 import semantics.
    base_angle = _angle_unit_to_deg(base.find("ANGLEUNIT", "UNIT"))
    kv: dict[str, float] = {}
    for p in holder.find_all("PARAMETER"):
        pcode = _epsg_id_of(p)
        key = _PARAM_BY_CODE.get(pcode) if pcode is not None else None
        if key is None:
            key = _PARAM_BY_NAME.get(str(p.args[0]).strip().lower())
        if key is None:
            raise NotImplementedError(
                f"WKT: parameter {p.args[0]!r} not supported")
        val = float(p.args[1])
        if key in _ANGLE_KEYS:
            own = p.find("ANGLEUNIT", "UNIT")
            val *= _angle_unit_to_deg(own) if own is not None else base_angle
        kv[key] = val
    _method_post_fix(mcode, kv)
    parts = [f"+proj={proj}"]
    for k in ("lat_0", "lon_0", "lonc", "lat_1", "lat_2", "lat_ts",
              "alpha", "gamma", "k", "x_0", "y_0", "h_0"):
        if k in kv:
            parts.append(f"+{k}={kv[k]:.15g}")
    parts += [f"+{e}" for e in extras]
    parts.append(geog)
    # projected CS unit: WKT1 top-level UNIT / WKT2 CS axis LENGTHUNIT
    unit = 1.0
    u = root.find("UNIT", "LENGTHUNIT")
    if u is None:
        cs = root.find("CS")
        ax = root.find("AXIS")
        un = (cs.find("LENGTHUNIT") if cs is not None else None) or \
            (ax.find("LENGTHUNIT") if ax is not None else None)
        u = un
    if u is not None:
        try:
            unit = float(u.args[1])
        except (IndexError, TypeError, ValueError):
            unit = 1.0
    if abs(unit - 1.0) < 1e-15:
        parts.append("+units=m")
    else:
        parts.append(f"+to_meter={unit:.15g}")
    ax = _axis_string(root)
    if ax is not None and f"+axis={ax}" not in parts:
        parts.append(f"+axis={ax}")
    return " ".join(parts)


def projjson_to_proj(obj) -> str:
    """Translate a PROJJSON CRS (dict or JSON text) to a proj string
    (subset: ProjectedCRS / GeographicCRS with EPSG method ids)."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    ident = obj.get("id") or {}
    if str(ident.get("authority", "")).upper() == "EPSG":
        try:
            from proj_ray.epsg import resolve_init

            return resolve_init(f"epsg:{ident['code']}")
        except NotImplementedError:
            pass
    t = obj.get("type", "")
    if t in ("GeodeticCRS", "GeographicCRS"):
        cs = obj.get("coordinate_system") or {}
        sub = str(cs.get("subtype", "")).lower()
        if sub == "cartesian":
            return f"+proj=geocent {_json_geog(obj)} +units=m"
        out = f"+proj=longlat {_json_geog(obj)}"
        axes = cs.get("axis", [])
        if sub == "spherical" or any(
                "planetocentric" in str(a.get("name", "")).lower()
                for a in axes):
            out += " +geoc"
        if len(axes) >= 2:
            chars = [_AXIS_CHAR.get(str(a.get("direction", "")).lower())
                     for a in axes[:2]]
            if None not in chars and "".join(chars) not in ("ne", "en"):
                out += f" +axis={''.join(chars)}u"
        return out
    if t == "BoundCRS":
        base = projjson_to_proj(obj.get("source_crs", {}))
        names = {"x-axis translation": 0, "y-axis translation": 1,
                 "z-axis translation": 2, "x-axis rotation": 3,
                 "y-axis rotation": 4, "z-axis rotation": 5,
                 "scale difference": 6}
        vals = [0.0] * 7
        seven = False
        for p in (obj.get("transformation") or {}).get("parameters", []):
            i = names.get(str(p.get("name", "")).strip().lower())
            if i is None:
                continue
            vals[i] = float(p.get("value", 0.0))
            if i >= 3:
                seven = True
        tow = ",".join(f"{v:.15g}" for v in
                       vals[:7 if seven else 3])
        return f"{base} +towgs84={tow}"
    if t == "GeographicCRS":
        return f"+proj=longlat {_json_geog(obj)}"
    if t != "ProjectedCRS":
        raise NotImplementedError(f"PROJJSON type {t!r} not supported")
    geog = _json_geog(obj.get("base_crs", {}))
    conv = obj.get("conversion", {})
    mid = (conv.get("method", {}).get("id") or {})
    mcode = int(mid["code"]) if str(mid.get("authority", "")).upper() == \
        "EPSG" and "code" in mid else _METHOD_BY_NAME.get(
        str(conv.get("method", {}).get("name", "")).strip().lower())
    if mcode is None or mcode not in _METHOD_BY_CODE:
        raise NotImplementedError("PROJJSON: method not supported")
    proj, extras = _METHOD_BY_CODE[mcode]
    kv: dict[str, float] = {}
    for p in conv.get("parameters", []):
        pid = p.get("id") or {}
        key = _PARAM_BY_CODE.get(int(pid["code"])) \
            if str(pid.get("authority", "")).upper() == "EPSG" and \
            "code" in pid else None
        if key is None:
            key = _PARAM_BY_NAME.get(str(p.get("name", "")).strip().lower())
        if key is None:
            raise NotImplementedError(
                f"PROJJSON: parameter {p.get('name')!r} not supported")
        val = float(p.get("value", 0.0))
        unit = p.get("unit", "metre")
        if key in _ANGLE_KEYS and isinstance(unit, dict):
            import math

            val *= float(unit.get("conversion_factor", math.pi / 180)) \
                / (math.pi / 180)
        kv[key] = val
    _method_post_fix(mcode, kv)
    parts = [f"+proj={proj}"]
    for k in ("lat_0", "lon_0", "lonc", "lat_1", "lat_2", "lat_ts",
              "alpha", "gamma", "k", "x_0", "y_0", "h_0"):
        if k in kv:
            parts.append(f"+{k}={kv[k]:.15g}")
    parts += [f"+{e}" for e in extras]
    parts.append(geog)
    axes = (obj.get("coordinate_system") or {}).get("axis", [])
    unit = axes[0].get("unit", "metre") if axes else "metre"
    if isinstance(unit, dict):
        f = float(unit.get("conversion_factor", 1.0))
        parts.append("+units=m" if f == 1.0 else f"+to_meter={f:.15g}")
    elif str(unit) in ("metre", "meter", "m"):
        parts.append("+units=m")
    else:
        raise NotImplementedError(f"PROJJSON unit {unit!r}")
    if len(axes) >= 2:
        chars = [_AXIS_CHAR.get(str(a.get("direction", "")).lower())
                 for a in axes[:2]]
        if None not in chars and chars != ["e", "n"]:
            ax = "".join(chars) + "u"
            if f"+axis={ax}" not in parts:
                parts.append(f"+axis={ax}")
    return " ".join(parts)


def _json_geog(obj) -> str:
    datum = obj.get("datum") or obj.get("datum_ensemble") or {}
    ell = datum.get("ellipsoid", {})
    a = float(ell.get("semi_major_axis", 6378137.0))
    rf = ell.get("inverse_flattening")
    if rf:
        out = f"+a={a:.15g} +rf={float(rf):.15g}"
    else:
        b = float(ell.get("semi_minor_axis", a))
        out = f"+a={a:.15g} +b={b:.15g}"
    pmv = (datum.get("prime_meridian") or {}).get("longitude", 0.0)
    if isinstance(pmv, dict):
        import math

        pmv = float(pmv.get("value", 0.0)) * float(
            pmv.get("unit", {}).get("conversion_factor",
                                    math.pi / 180)) / (math.pi / 180)
    if float(pmv) != 0.0:
        out += f" +pm={float(pmv):.15g}"
    return out


def looks_like_wkt(text: str) -> bool:
    head = text.lstrip()[:16].upper()
    return any(head.startswith(k) for k in (
        "PROJCS", "GEOGCS", "PROJCRS", "GEOGCRS", "PROJECTEDCRS",
        "GEOGRAPHICCRS", "COMPD_CS", "COMPOUNDCRS", "BOUNDCRS"))


def looks_like_projjson(text: str) -> bool:
    t = text.lstrip()
    return t.startswith("{") and '"type"' in t[:200]


_ARCSEC_PER_RAD = 206264.80624709636
_SEC_PER_YEAR = 31556925.445  # EPSG uom 1029 'year'
# WKT2 COORDINATEOPERATION parameter EPSG ids -> helmert keyword
_OP_PARAM = {
    8605: ("x", "len"), 8606: ("y", "len"), 8607: ("z", "len"),
    8608: ("rx", "ang"), 8609: ("ry", "ang"), 8610: ("rz", "ang"),
    8611: ("s", "scale"),
    1040: ("dx", "len_r"), 1041: ("dy", "len_r"), 1042: ("dz", "len_r"),
    1043: ("drx", "ang_r"), 1044: ("dry", "ang_r"),
    1045: ("drz", "ang_r"),
    1046: ("ds", "scale_r"), 1047: ("t_epoch", "time"),
}
# geocentric-domain helmert method codes -> convention
_OP_METHOD = {
    1031: None, 1033: "position_vector", 1032: "coordinate_frame",
    1053: "position_vector", 1056: "coordinate_frame",
}


def coordinate_operation_to_proj(text: str) -> str:
    """WKT2 COORDINATEOPERATION (geocentric-domain helmert methods,
    incl. time-dependent: EPSG methods 1031/1032/1033/1053/1056) ->
    +proj=helmert definition. Parameter units are converted via the
    unit node's SI factor; per-year rate units carry per-second SI
    factors and are rescaled by the EPSG year (uom 1029). Other
    methods raise — never a silent wrong answer."""
    root = _parse_wkt(text)
    if root.name.upper() != "COORDINATEOPERATION":
        raise ValueError(f"not a COORDINATEOPERATION: {root.name}")
    meth = root.find("METHOD")
    if meth is None:
        raise NotImplementedError("COORDINATEOPERATION without METHOD")
    mcode = _epsg_id_of(meth)
    if mcode not in _OP_METHOD:
        raise NotImplementedError(
            f"operator not implemented: operation method "
            f"{meth.args[0] if meth.args else '?'} (EPSG:{mcode})")
    conv = _OP_METHOD[mcode]
    vals: dict[str, float] = {}
    for p in root.find_all("PARAMETER"):
        pid = _epsg_id_of(p)
        spec = _OP_PARAM.get(pid)
        if spec is None:
            continue
        key, kind = spec
        v = float(p.args[1])
        unit = p.find("LENGTHUNIT", "ANGLEUNIT", "SCALEUNIT",
                      "TIMEUNIT", "UNIT")
        f = 1.0
        if unit is not None and len(unit.args) >= 2:
            try:
                f = float(unit.args[1])
            except (TypeError, ValueError):
                f = 1.0
        if kind == "len":
            v *= f
        elif kind == "ang":
            v *= f * _ARCSEC_PER_RAD
        elif kind == "scale":
            v *= f * 1e6
        elif kind == "len_r":
            v *= f * _SEC_PER_YEAR
        elif kind == "ang_r":
            v *= f * _SEC_PER_YEAR * _ARCSEC_PER_RAD
        elif kind == "scale_r":
            v *= f * _SEC_PER_YEAR * 1e6
        elif kind == "time":
            v *= f / _SEC_PER_YEAR if f != 1.0 else 1.0
        vals[key] = v
    parts = ["+proj=helmert"]
    for k in ("x", "y", "z", "rx", "ry", "rz", "s",
              "dx", "dy", "dz", "drx", "dry", "drz", "ds", "t_epoch"):
        if k in vals:
            parts.append(f"+{k}={vals[k]:.15g}")
    if conv:
        parts.append(f"+convention={conv}")
    return " ".join(parts)
