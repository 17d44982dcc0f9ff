"""Exact projinfo-style text output (WKT2:2019 / WKT2:2015 /
WKT1:GDAL / WKT1:ESRI / PROJJSON / PROJ.4) for EPSG-registered CRSs,
driven by the generated naming metadata (proj_ray/epsg_meta.py).

Parity target: the reference's projinfo app (src/apps/projinfo.cpp)
and WKT formatter (src/iso19111/io.cpp) — re-derived from the
observable output format, not copied. The scoreboard is
tools/replay_projinfo_yaml.py over the reference's own
test/cli/test_projinfo.yaml.
"""

from __future__ import annotations

from proj_ray import epsg_meta as M

# ------------------------------------------------------------ numbers ----


def wnum(v) -> str:
    """WKT number: up to 15 significant digits, no trailing zeros
    (PROJ io.cpp add())."""
    if v is None:
        return "0"
    if isinstance(v, int) or (isinstance(v, float) and v == int(v)
                              and abs(v) < 1e15):
        return str(int(v))
    s = format(float(v), ".15g")
    return s


def esri_num(v) -> str:
    """ESRI WKT keeps at least one decimal (6378137.0, 0.0)."""
    s = wnum(v)
    return s + ".0" if "." not in s and "e" not in s else s


def jnum(v):
    """PROJJSON number: int when integral."""
    f = float(v)
    return int(f) if f == int(f) and abs(f) < 1e15 else f


_DMS_UOMS = {9110}


def param_deg(value: float, uom: int) -> float:
    """Convert a stored angular parameter to degrees when its unit is
    sexagesimal DMS (WKT has no DMS unit); other units stay as-is."""
    if uom in _DMS_UOMS:
        sign = -1.0 if value < 0 else 1.0
        v = abs(value)
        d = int(v)
        m = int(round((v - d) * 100, 9))
        sec = (v - d - m / 100.0) * 10000.0
        if sec < 0:
            sec = 0.0
        return sign * (d + m / 60.0 + sec / 3600.0)
    return value


DEG_RAD = "0.0174532925199433"


# ---------------------------------------------------------- WKT nodes ----


class N:
    """A WKT node: keyword, scalar args (pre-rendered strings), child
    nodes. `bump` children indent one extra level (PROJ prints AXIS
    nodes one level deeper than their CS sibling)."""

    def __init__(self, kw: str, *args, bump: bool = False):
        self.kw = kw
        self.args = [a for a in args if a is not None]
        self.bump = bump

    def render(self, indent: int = 0, pretty: bool = True) -> str:
        parts = []
        for a in self.args:
            if isinstance(a, N):
                parts.append(a)
            else:
                parts.append(str(a))
        if not pretty:
            inner = ",".join(p.render(0, False) if isinstance(p, N)
                             else p for p in parts)
            return f"{self.kw}[{inner}]"
        out = self.kw + "["
        first = True
        pad = " " * (indent + 4)
        for p in parts:
            if isinstance(p, N):
                extra = "    " if p.bump else ""
                out += ("" if first else ",") + "\n" + pad + extra + \
                    p.render(indent + 4 + (4 if p.bump else 0), True)
            else:
                out += ("" if first else ",") + p
            first = False
        return out + "]"


def q(s: str) -> str:
    return '"' + str(s).replace('"', '""') + '"'


# ------------------------------------------------------- usage lookup ----


def crs_usage(table: str, code: int):
    """(scope_text, area_description, (south, north, west, east)) or
    None. Replicates the reference's 4326 hot patch (factory.cpp:4081:
    EPSG moved 4326 to the verbose 'World (by country)' extent; PROJ
    pins extent 1262 / scope 1183) and its best-usage pick (lowest
    score: non-'large scale' scopes win, then first)."""
    if table == "geodetic_crs" and code == 4326:
        ext = M.EXTENT[1262]
        return (M.SCOPE[1183], ext[0], (ext[1], ext[2], ext[3], ext[4]))
    uses = M.USAGE.get((table, code))
    if not uses:
        return None
    ranked = sorted(
        (1 if "large scale" in M.SCOPE.get(sc, "") else 0, i)
        for i, (_, sc) in enumerate(uses))
    ext_code, sc_code = uses[ranked[0][1]]
    ext = M.EXTENT.get(ext_code)
    if ext is None:
        return None
    return (M.SCOPE.get(sc_code, "unknown"), ext[0],
            (ext[1], ext[2], ext[3], ext[4]))


def usage_nodes(table: str, code: int, v2019: bool) -> list:
    u = crs_usage(table, code)
    if u is None:
        return []
    scope, area, (s, n, w, e) = u
    inner = [N("SCOPE", q(scope)), N("AREA", q(area)),
             N("BBOX", wnum(s), wnum(w), wnum(n), wnum(e))]
    if v2019:
        return [N("USAGE", *inner)]
    return inner


# ----------------------------------------------------------- datums ------


def ellipsoid_node(code: int, wkt1: str | None = None,
                   with_id: bool = False) -> N:
    name, a, inv_f, b = M.ELLIPSOID[code]
    if inv_f is None:
        inv_f = 0.0 if b == a else (a / (a - b))
    if wkt1 == "gdal":
        return N("SPHEROID", q(name), wnum(a), wnum(inv_f),
                 N("AUTHORITY", q("EPSG"), q(str(code))))
    if wkt1 == "esri":
        ename = M.ESRI_ALIAS.get(("ellipsoid", code),
                                 name.replace(" ", "_"))
        return N("SPHEROID", q(ename), esri_num(a), esri_num(inv_f))
    kids = [N("LENGTHUNIT", q("metre"), "1")]
    if with_id:
        kids.append(N("ID", q("EPSG"), str(code)))
    return N("ELLIPSOID", q(name), wnum(a), wnum(inv_f), *kids)


def primem_node(code: int, wkt1: str | None = None) -> N:
    name, val, uom = M.PM[code]
    deg = param_deg(val, uom)
    if wkt1 == "gdal":
        return N("PRIMEM", q(name), wnum(deg),
                 N("AUTHORITY", q("EPSG"), q(str(code))))
    if wkt1 == "esri":
        return N("PRIMEM", q(name), esri_num(deg))
    return N("PRIMEM", q(name), wnum(deg),
             N("ANGLEUNIT", q("degree"), DEG_RAD))


def is_ensemble(datum_code: int) -> bool:
    return datum_code in M.ENSEMBLE_MEMBERS


def datum_node(code: int, version: str, with_id: bool = False,
               standalone: bool = False, force_datum: bool = False) -> N:
    """DATUM / ENSEMBLE node for WKT2. version: '2019' | '2015'.
    `standalone` objects print member/ellipsoid IDs too (the -k
    lookups); `force_datum` degrades an ensemble to its DATUM form."""
    name, ell, pm, acc = M.DATUM[code]
    if version == "2019" and is_ensemble(code) and not force_datum:
        kids = []
        for m in M.ENSEMBLE_MEMBERS[code]:
            mk = [q(M.DATUM[m][0])]
            if standalone:
                mk.append(N("ID", q("EPSG"), str(m)))
            kids.append(N("MEMBER", *mk))
        kids.append(ellipsoid_node(ell, with_id=standalone))
        kids.append(N("ENSEMBLEACCURACY", acc))
        if with_id:
            kids.append(N("ID", q("EPSG"), str(code)))
        return N("ENSEMBLE", q(name), *kids)
    dname = name
    if is_ensemble(code) and dname.endswith(" ensemble"):
        dname = dname[: -len(" ensemble")]
    kids = [ellipsoid_node(ell)]
    if with_id:
        kids.append(N("ID", q("EPSG"), str(code)))
    return N("DATUM", q(dname), *kids)


# ------------------------------------------------------------ CS/axes ----


_UNIT_KW = {"angle": "ANGLEUNIT", "length": "LENGTHUNIT",
            "scale": "SCALEUNIT", "time": "TIMEUNIT"}


def unit_name_factor(uom: int) -> tuple[str, float | None]:
    name, typ, factor = M.UOM[uom]
    if typ == "angle" and name.startswith("degree"):
        # 9122 "degree (supplier to define representation)" and kin all
        # normalize to plain "degree" (io.cpp)
        return "degree", 0.017453292519943295
    return name, factor


def unit_node(uom: int) -> N:
    name, typ, factor = M.UOM[uom]
    uname, ufactor = unit_name_factor(uom)
    if uname == "degree":
        return N("ANGLEUNIT", q("degree"), DEG_RAD)
    return N(_UNIT_KW.get(typ, "UNIT"), q(uname), wnum(ufactor))


def axis_nodes(cs_code: int) -> list:
    """AXIS nodes (bumped one indent level, after the CS node). A
    single-axis CS (vertical) omits ORDER, per WKT2 output rules."""
    typ, axes = M.CS[cs_code]
    out = []
    for order, (name, abbrev, orient, uom) in enumerate(axes, 1):
        label = name[0].lower() + name[1:]
        disp = f"{label} ({abbrev})" if abbrev else label
        kids = [] if len(axes) == 1 else [N("ORDER", str(order))]
        out.append(N("AXIS", q(disp), orient,
                     *kids, unit_node(uom), bump=True))
    return out


def cs_nodes(cs_code: int) -> list:
    typ, axes = M.CS[cs_code]
    return [N("CS", typ, str(len(axes))), *axis_nodes(cs_code)]


# ---------------------------------------------------- vertical CRS WKT ----


def vert_wkt2(code: int, with_usage: bool = True) -> N:
    """VERTCRS node (reference io.cpp VerticalCRS exporter): DYNAMIC
    frame epoch from the vertical datum, VDATUM, single-axis CS."""
    name, cs_code, datum_code, _dep = M.VERT[code]
    dname, epoch = M.VDATUM[datum_code]
    kids = []
    if epoch is not None:
        kids.append(N("DYNAMIC", N("FRAMEEPOCH", wnum(epoch))))
    kids.append(N("VDATUM", q(dname)))
    kids += cs_nodes(cs_code)
    if with_usage:
        kids += usage_nodes("vertical_crs", code, True)
    kids.append(N("ID", q("EPSG"), str(code)))
    return N("VERTCRS", q(name), *kids)


# -------------------------------------------------- geographic CRS WKT ----


def geog_wkt2(code: int, version: str = "2019",
              with_usage: bool = True) -> N:
    name, kind, cs_code, datum_code, _dep = M.GEOG[code]
    kw = "GEOGCRS" if version == "2019" else (
        "GEODCRS" if kind.startswith("geographic") else "GEODCRS")
    if kind == "geocentric":
        kw = "GEODCRS"
    kids = [datum_node(datum_code, version),
            primem_node(M.DATUM[datum_code][2])]
    kids += cs_nodes(cs_code)
    if with_usage:
        kids += usage_nodes("geodetic_crs", code, version == "2019")
    kids.append(N("ID", q("EPSG"), str(code)))
    return N(kw, q(name), *kids)


def geog_wkt1_gdal(code: int) -> N:
    name, kind, cs_code, datum_code, _dep = M.GEOG[code]
    dname, ell, pm, _acc = M.DATUM[datum_code]
    wkt1_dname = _wkt1_datum_name(datum_code, dname)
    return N("GEOGCS", q(name),
             N("DATUM", q(wkt1_dname),
               ellipsoid_node(ell, wkt1="gdal"),
               N("AUTHORITY", q("EPSG"), q(str(datum_code)))),
             primem_node(pm, wkt1="gdal"),
             N("UNIT", q("degree"), DEG_RAD,
               N("AUTHORITY", q("EPSG"), q("9122"))),
             N("AUTHORITY", q("EPSG"), q(str(code))))


def _wkt1_datum_name(code: int, name: str) -> str:
    """GDAL WKT1 datum name: the ESRI 'D_' alias without the prefix
    (io.cpp uses a curated substitution list; the ESRI aliases encode
    the same legacy names)."""
    alias = M.ESRI_ALIAS.get(("geodetic_datum", code))
    if alias and alias.startswith("D_"):
        return alias[2:]
    return name.replace(" ", "_")


def geog_wkt1_esri(code: int) -> N:
    name, kind, cs_code, datum_code, _dep = M.GEOG[code]
    gname = M.ESRI_ALIAS.get(("geodetic_crs", code),
                             "GCS_" + name.replace(" ", "_"))
    dname = M.ESRI_ALIAS.get(("geodetic_datum", datum_code),
                             "D_" + name.replace(" ", "_"))
    _, ell, pm, _acc = M.DATUM[datum_code]
    return N("GEOGCS", q(gname),
             N("DATUM", q(dname), ellipsoid_node(ell, wkt1="esri")),
             primem_node(pm, wkt1="esri"),
             N("UNIT", q("Degree"), DEG_RAD))


# ---------------------------------------------------------- PROJJSON -----

_SCHEMA = "https://proj.org/schemas/v0.7/projjson.schema.json"


def _json_ellipsoid(code: int) -> dict:
    name, a, inv_f, b = M.ELLIPSOID[code]
    out = {"name": name, "semi_major_axis": jnum(a)}
    if inv_f is not None:
        out["inverse_flattening"] = jnum(inv_f)
    else:
        out["semi_minor_axis"] = jnum(b)
    return out


def _json_axes(cs_code: int) -> dict:
    typ, axes = M.CS[cs_code]
    ax = []
    for name, abbrev, orient, uom in axes:
        uname, _ = unit_name_factor(uom)
        ax.append({"name": name, "abbreviation": abbrev,
                   "direction": orient, "unit": uname})
    return {"subtype": typ.lower(), "axis": ax}


def geog_projjson(code: int) -> dict:
    name, kind, cs_code, datum_code, _dep = M.GEOG[code]
    out: dict = {"$schema": _SCHEMA,
                 "type": "GeographicCRS" if kind.startswith("geographic")
                 else "GeodeticCRS",
                 "name": name}
    dname, ell, pm, acc = M.DATUM[datum_code]
    if is_ensemble(datum_code):
        out["datum_ensemble"] = {
            "name": dname,
            "members": [{"name": M.DATUM[m][0],
                         "id": {"authority": "EPSG", "code": m}}
                        for m in M.ENSEMBLE_MEMBERS[datum_code]],
            "ellipsoid": _json_ellipsoid(ell),
            "accuracy": acc,
            "id": {"authority": "EPSG", "code": datum_code},
        }
    else:
        out["datum"] = {
            "type": "GeodeticReferenceFrame",
            "name": dname,
            "ellipsoid": _json_ellipsoid(ell),
        }
        if pm != 8901:
            pname, pval, puom = M.PM[pm]
            out["datum"]["prime_meridian"] = {
                "name": pname, "longitude": jnum(param_deg(pval, puom))}
    out["coordinate_system"] = _json_axes(cs_code)
    u = crs_usage("geodetic_crs", code)
    if u:
        scope, area, (s, n, w, e) = u
        if scope != "?":
            out["scope"] = scope
        out["area"] = area
        out["bbox"] = {"south_latitude": jnum(s), "west_longitude":
                       jnum(w), "north_latitude": jnum(n),
                       "east_longitude": jnum(e)}
    out["id"] = {"authority": "EPSG", "code": code}
    return out


# ------------------------------------------------- projected CRS WKT2 ----


def conversion_node(conv_code: int, with_id: bool) -> N:
    name, method_code, method_name, params = M.CONV[conv_code]
    kids = [N("METHOD", q(method_name),
              N("ID", q("EPSG"), str(method_code)))]
    for pcode, pname, pval, puom in params:
        uname, _ = unit_name_factor(puom)
        typ = M.UOM[puom][1]
        val = param_deg(pval, puom) if typ == "angle" else pval
        kids.append(N("PARAMETER", q(pname), wnum(val),
                      unit_node(puom if puom not in _DMS_UOMS
                                else 9102),
                      N("ID", q("EPSG"), str(pcode))))
    if with_id:
        kids.append(N("ID", q("EPSG"), str(conv_code)))
    return N("CONVERSION", q(name), *kids)


def base_geog_node(code: int, version: str, promote_3d: bool) -> N:
    name, kind, cs_code, datum_code, _dep = M.GEOG[code]
    bcode = code
    if promote_3d:
        # the EPSG 3D sibling of well-known 2D geographic CRSs
        bcode = {4326: 4979, 4258: 4937, 4269: 4955}.get(code, code)
    kw = "BASEGEOGCRS" if version == "2019" else "BASEGEODCRS"
    return N(kw, q(name),
             datum_node(datum_code, version),
             primem_node(M.DATUM[datum_code][2]),
             N("ID", q("EPSG"), str(bcode)))


def _axis_nodes_3d_promoted() -> list:
    """Promoted-to-3D Cartesian axes: synthetic (E)/(N) names and
    per-axis unit IDs, as the reference emits for --3d."""
    def unit():
        return N("LENGTHUNIT", q("metre"), "1",
                 N("ID", q("EPSG"), "9001"))

    return [N("AXIS", q("(E)"), "east", N("ORDER", "1"), unit(),
              bump=True),
            N("AXIS", q("(N)"), "north", N("ORDER", "2"), unit(),
              bump=True),
            N("AXIS", q("ellipsoidal height (h)"), "up",
              N("ORDER", "3"), unit(), bump=True)]


def proj_wkt2(code: int, version: str = "2019",
              three_d: bool = False) -> N:
    name, cs_code, base_code, conv_code, _dep = M.PROJCRS[code]
    kids = [base_geog_node(base_code, version, three_d),
            conversion_node(conv_code, with_id=three_d)]
    if three_d:
        kids.append(N("CS", "Cartesian", "3"))
        kids += _axis_nodes_3d_promoted()
    else:
        kids += cs_nodes(cs_code)
    if three_d:
        u = crs_usage("projected_crs", code)
        if u:
            _scope, area, (s, n, w, e) = u
            kids.append(N("USAGE", N("SCOPE", q("unknown")),
                          N("AREA", q(area)),
                          N("BBOX", wnum(s), wnum(w), wnum(n),
                            wnum(e))))
        kids.append(N("REMARK", q(f"Promoted to 3D from EPSG:{code}")))
    else:
        kids += usage_nodes("projected_crs", code, version == "2019")
        kids.append(N("ID", q("EPSG"), str(code)))
    return N("PROJCRS" if version == "2019" else "PROJCRS", q(name),
             *kids)


# --------------------------------------------------------- PROJ.4 text ----

_P4_DATUM = {6326: "WGS84", 6267: "NAD27", 6269: "NAD83",
             6121: "GGRS87", 6223: "carthage", 6312: "hermannskogel",
             6299: "ire65", 6272: "nzgd49", 6277: "OSGB36"}
_P4_ELLPS = {7030: "WGS84", 7019: "GRS80", 7022: "intl",
             7004: "bessel", 7008: "clrk66", 7012: "clrk80",
             7043: "WGS72", 7024: "krass", 7003: "aust_SA",
             7015: "evrst30", 7044: "clrk80ign", 7046: "bess_nam",
             7047: "sphere", 7021: "helmert", 7020: "clrk80",
             7002: "airy", 7001: "airy"}


def _p4_datum_parts(datum_code: int) -> list[str]:
    if datum_code in _P4_DATUM:
        return [f"+datum={_P4_DATUM[datum_code]}"]
    _, ell, pm, _acc = M.DATUM[datum_code]
    out = []
    if ell in _P4_ELLPS and _P4_ELLPS[ell] != "clrk80" or ell == 7012:
        out.append(f"+ellps={_P4_ELLPS[ell]}" if ell in _P4_ELLPS
                   else "")
    if not out or not out[0]:
        name, a, inv_f, b = M.ELLIPSOID[ell]
        out = [f"+a={wnum(a)}"]
        if inv_f:
            out.append(f"+rf={wnum(inv_f)}")
        else:
            out.append(f"+b={wnum(b)}")
    if pm != 8901:
        pname, pval, puom = M.PM[pm]
        out.append(f"+pm={pname.lower()}")
    return out


def _towgs84_of(geog_code: int, crs_table: str = "geodetic_crs",
                crs_code: int | None = None) -> str | None:
    """PROJ.4-compat +towgs84: the best Helmert to WGS84 for the CRS's
    own area of use (the reference's createBoundCRSToWGS84IfPossible
    ranks candidate transformations by extent containment then
    accuracy — same policy as the planner's tables)."""
    from proj_ray.epsg_ops import HELMERT

    cands = HELMERT.get((geog_code, 4326), ())
    if not cands:
        defn_tw = None
        from proj_ray.epsg_generated import EPSG_GENERATED

        for tok in EPSG_GENERATED.get(geog_code, "").split():
            if tok.startswith("+towgs84="):
                defn_tw = tok[len("+towgs84="):]
        return defn_tw
    ext = crs_usage(crs_table, crs_code if crs_code is not None
                    else geog_code)
    box = None
    if ext:
        s, n, w, e = ext[2]
        box = (w, s, e, n)

    def contains(c) -> bool:
        b = c.get("bbox")
        if b is None or box is None:
            return False
        return (b[0] <= box[0] and b[1] <= box[1]
                and b[2] >= box[2] and b[3] >= box[3])

    pool = [c for c in cands if contains(c)] or list(cands)
    pool.sort(key=lambda c: (c.get("acc") if c.get("acc") is not None
                             else 999.0, c.get("code", 0)))
    c = pool[0]
    t = c["t"]
    r = c.get("r", (0.0, 0.0, 0.0))
    s = c.get("s", 0.0)
    if c.get("conv") == "coordinate_frame":
        r = (-r[0], -r[1], -r[2])
    vals = (*t, *r, s)
    return ",".join(wnum(v) for v in vals)


def geog_proj4(code: int) -> str:
    _name, _kind, _cs, datum_code, _dep = M.GEOG[code]
    parts = ["+proj=longlat"] + _p4_datum_parts(datum_code)
    if datum_code not in _P4_DATUM:
        tw = _towgs84_of(code)
        if tw:
            parts.append(f"+towgs84={tw}")
    return " ".join(parts + ["+no_defs", "+type=crs"])


def _pd(params: tuple, code: int, default=0.0) -> float:
    for pcode, _n, pval, puom in params:
        if pcode == code:
            typ = M.UOM[puom][1]
            return param_deg(pval, puom) if typ == "angle" else \
                pval * (M.UOM[puom][2] or 1.0) if typ == "length" \
                else pval
    return default


def conversion_proj4(conv_code: int) -> list[str]:
    """+proj parts for a conversion (the subset of methods the tests
    exercise; extend as needed). Mirrors the reference's proj4 export
    spellings (io.cpp exportToPROJString)."""
    name, method, _mname, params = M.CONV[conv_code]
    if method == 9807:  # Transverse Mercator
        lat0 = _pd(params, 8801)
        lon0 = _pd(params, 8802)
        k = _pd(params, 8805, 1.0)
        x0 = _pd(params, 8806)
        y0 = _pd(params, 8807)
        zone = (lon0 + 183.0) / 6.0
        if (lat0 == 0 and k == 0.9996 and x0 == 500000
                and zone == int(zone) and 1 <= zone <= 60
                and y0 in (0.0, 10000000.0)):
            out = [f"+proj=utm +zone={int(zone)}"]
            if y0 == 10000000.0:
                out.append("+south")
            return out
        return [f"+proj=tmerc +lat_0={wnum(lat0)} +lon_0={wnum(lon0)} "
                f"+k={wnum(k)} +x_0={wnum(x0)} +y_0={wnum(y0)}"]
    if method in (9810, 9829):  # Polar Stereographic (variant A/B)
        lat0 = _pd(params, 8801, _pd(params, 8832, 90.0))
        lon0 = _pd(params, 8802, _pd(params, 8833))
        out = [f"+proj=stere +lat_0={wnum(lat0)} +lon_0={wnum(lon0)}"]
        k = _pd(params, 8805, 1.0)
        if method == 9810:
            out.append(f"+k={wnum(k)}")
        else:
            out.append(f"+lat_ts={wnum(_pd(params, 8832, lat0))}")
        out.append(f"+x_0={wnum(_pd(params, 8806))}")
        out.append(f"+y_0={wnum(_pd(params, 8807))}")
        return [" ".join(out)]
    if method == 9801:  # Lambert Conic Conformal (1SP)
        return [f"+proj=lcc +lat_1={wnum(_pd(params, 8801))} "
                f"+lat_0={wnum(_pd(params, 8801))} "
                f"+lon_0={wnum(_pd(params, 8802))} "
                f"+k_0={wnum(_pd(params, 8805, 1.0))} "
                f"+x_0={wnum(_pd(params, 8806))} "
                f"+y_0={wnum(_pd(params, 8807))}"]
    if method == 9802:  # Lambert Conic Conformal (2SP)
        return [f"+proj=lcc +lat_0={wnum(_pd(params, 8821))} "
                f"+lon_0={wnum(_pd(params, 8822))} "
                f"+lat_1={wnum(_pd(params, 8823))} "
                f"+lat_2={wnum(_pd(params, 8824))} "
                f"+x_0={wnum(_pd(params, 8826))} "
                f"+y_0={wnum(_pd(params, 8827))}"]
    if method == 9820:  # Lambert Azimuthal Equal Area
        return [f"+proj=laea +lat_0={wnum(_pd(params, 8801))} "
                f"+lon_0={wnum(_pd(params, 8802))} "
                f"+x_0={wnum(_pd(params, 8806))} "
                f"+y_0={wnum(_pd(params, 8807))}"]
    if method == 1024:  # Popular Visualisation Pseudo Mercator
        return [f"+proj=webmerc +lat_0={wnum(_pd(params, 8801))} "
                f"+lon_0={wnum(_pd(params, 8802))} "
                f"+x_0={wnum(_pd(params, 8806))} "
                f"+y_0={wnum(_pd(params, 8807))}"]
    raise NotImplementedError(f"proj4 export of method {method}")


def proj_proj4(code: int) -> str:
    _name, cs_code, base_code, conv_code, _dep = M.PROJCRS[code]
    _gname, _kind, _gcs, datum_code, _gdep = M.GEOG[base_code]
    parts = conversion_proj4(conv_code)
    ell = M.DATUM[datum_code][1]
    if datum_code in _P4_DATUM:
        parts.append(f"+datum={_P4_DATUM[datum_code]}")
    else:
        if ell in _P4_ELLPS:
            parts.append(f"+ellps={_P4_ELLPS[ell]}")
        else:
            name, a, inv_f, b = M.ELLIPSOID[ell]
            parts.append(f"+a={wnum(a)}")
            parts.append(f"+rf={wnum(inv_f)}" if inv_f
                         else f"+b={wnum(b)}")
        pm = M.DATUM[datum_code][2]
        if pm != 8901:
            parts.append(f"+pm={M.PM[pm][0].lower()}")
        tw = _towgs84_of(base_code, "projected_crs", code)
        if tw:
            parts.append(f"+towgs84={tw}")
    # CS unit
    _typ, axes = M.CS[cs_code]
    uom = axes[0][3]
    uname, ufac = unit_name_factor(uom)
    if uom == 9001:
        parts.append("+units=m")
    elif uom == 9002:
        parts.append("+units=ft")
    elif uom == 9003:
        parts.append("+units=us-ft")
    else:
        parts.append(f"+to_meter={wnum(ufac)}")
    return " ".join(parts + ["+no_defs", "+type=crs"])


# ------------------------------------------------ PROJ pipeline text -----


def format_proj_multiline(single_line: str) -> str:
    """projinfo's multiline PROJ pipeline formatting: '+proj=pipeline'
    alone, each '+step ...' at 2-space indent, continuation lines
    wrapped at 80 columns with an 8-space indent (2 + len('+step '))."""
    toks = single_line.split()
    if not toks or toks[0] != "+proj=pipeline":
        return single_line
    steps: list[list[str]] = []
    cur: list[str] = []
    for t in toks[1:]:
        if t == "+step":
            if cur:
                steps.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        steps.append(cur)
    out = ["+proj=pipeline"]
    for st in steps:
        line = "  +step"
        for t in st:
            # reference wrap rule (io.cpp PROJStringFormatter): break
            # when line length + token length (sans joining space)
            # exceeds 80
            if len(line) + len(t) > 80:
                out.append(line)
                line = "        " + t
            else:
                line += " " + t
        out.append(line)
    return "\n".join(out)


def _geog_is_latlon(code: int) -> bool:
    typ, axes = M.CS[M.GEOG[code][2]]
    return axes and axes[0][2] == "north"


def _ellps_token(datum_code: int) -> str:
    ell = M.DATUM[datum_code][1]
    if ell in _P4_ELLPS:
        return f"+ellps={_P4_ELLPS[ell]}"
    name, a, inv_f, b = M.ELLIPSOID[ell]
    return f"+a={wnum(a)} " + (f"+rf={wnum(inv_f)}" if inv_f
                               else f"+b={wnum(b)}")


def helmert_pipeline(src_geog: int, dst_geog: int, entry: dict) -> str:
    """Single-line cs2cs-style pipeline for a Helmert entry from the
    planner tables (degree I/O, authority axis order, push/pop v_3 for
    2D geographic CRSs)."""
    t = entry["t"]
    r = entry.get("r")
    s = entry.get("s")
    h = f"+proj=helmert +x={wnum(t[0])} +y={wnum(t[1])} +z={wnum(t[2])}"
    if r is not None:
        conv = entry.get("conv", "position_vector")
        h += (f" +rx={wnum(r[0])} +ry={wnum(r[1])} +rz={wnum(r[2])}"
              f" +s={wnum(s or 0.0)} +convention={conv}")
    parts = ["+proj=pipeline"]
    if _geog_is_latlon(src_geog):
        parts.append("+step +proj=axisswap +order=2,1")
    parts.append("+step +proj=unitconvert +xy_in=deg +xy_out=rad")
    both_2d = (M.GEOG[src_geog][1] == "geographic 2D"
               and M.GEOG[dst_geog][1] == "geographic 2D")
    if both_2d:
        parts.append("+step +proj=push +v_3")
    parts.append(f"+step +proj=cart {_ellps_token(M.GEOG[src_geog][3])}")
    parts.append("+step " + h)
    parts.append(f"+step +inv +proj=cart "
                 f"{_ellps_token(M.GEOG[dst_geog][3])}")
    if both_2d:
        parts.append("+step +proj=pop +v_3")
    parts.append("+step +proj=unitconvert +xy_in=rad +xy_out=deg")
    if _geog_is_latlon(dst_geog):
        parts.append("+step +proj=axisswap +order=2,1")
    return " ".join(parts)


def _helmert_step(entry: dict) -> str:
    t = entry["t"]
    r = entry.get("r")
    s = entry.get("s")
    h = f"+proj=helmert +x={wnum(t[0])} +y={wnum(t[1])} +z={wnum(t[2])}"
    if r is not None:
        conv = entry.get("conv", "position_vector")
        h += (f" +rx={wnum(r[0])} +ry={wnum(r[1])} +rz={wnum(r[2])}"
              f" +s={wnum(s or 0.0)} +convention={conv}")
    return h


def helmert_chain_pipeline(src_geog: int, dst_geog: int,
                           entries: list) -> str:
    """Pipeline for a chain of geocentric Helmert steps (concatenated
    operation) — one cart sandwich, helmerts composed in XYZ."""
    parts = ["+proj=pipeline"]
    if _geog_is_latlon(src_geog):
        parts.append("+step +proj=axisswap +order=2,1")
    parts.append("+step +proj=unitconvert +xy_in=deg +xy_out=rad")
    both_2d = (M.GEOG[src_geog][1] == "geographic 2D"
               and M.GEOG[dst_geog][1] == "geographic 2D")
    if both_2d:
        parts.append("+step +proj=push +v_3")
    parts.append(f"+step +proj=cart {_ellps_token(M.GEOG[src_geog][3])}")
    for e in entries:
        parts.append("+step " + _helmert_step(e))
    parts.append(f"+step +inv +proj=cart "
                 f"{_ellps_token(M.GEOG[dst_geog][3])}")
    if both_2d:
        parts.append("+step +proj=pop +v_3")
    parts.append("+step +proj=unitconvert +xy_in=rad +xy_out=deg")
    if _geog_is_latlon(dst_geog):
        parts.append("+step +proj=axisswap +order=2,1")
    return " ".join(parts)


def _find_helmert_by_code(code: int):
    from proj_ray.epsg_ops import HELMERT

    for (src, dst), entries in HELMERT.items():
        for e in entries:
            if e.get("code") == code:
                return src, dst, e
    return None


# ------------------------------------------------------ object lookup ----


def _normname(s: str) -> str:
    import re

    return re.sub(r"[ _]", "", s).casefold()


def _lookup_named(table: str, spec: str, pool: dict) -> int | None:
    import re

    m = re.match(r"(?i)^epsg:(\d+)$", spec.strip())
    if m:
        code = int(m.group(1))
        return code if code in pool else None
    want = _normname(spec)
    for (tbl, alias), code in M.ALIAS.items():
        if tbl == table and _normname(alias) == want and code in pool:
            return code
    for (tbl, code), alias in M.ESRI_ALIAS.items():
        if tbl == table and _normname(alias) == want and code in pool:
            return code
    for code, row in pool.items():
        if _normname(row[0]) == want:
            return code
    return None


# ----------------------------------------------------------- list-crs ----


_LIST_KINDS = {
    "geodetic": {"geographic 2D", "geographic 3D", "geocentric"},
    "geocentric": {"geocentric"},
    "geographic": {"geographic 2D", "geographic 3D"},
    "geographic_2d": {"geographic 2D"},
    "geographic_3d": {"geographic 3D"},
    "vertical": {"vertical"},
    "projected": {"projected"},
    "compound": {"compound"},
}


def _listcrs_area_filter(area: str):
    """--area resolution for --list-crs (reference makeBboxFilter with
    errorIfSeveralAreaMatches=false): AUTH:CODE, else unique exact
    extent-name match, else unique approximate match, else fall back
    to substring filtering on the CRS area description."""
    from proj_ray.crs_list_generated import AREA_NAMES

    if " " not in area and ":" in area:
        auth, _, code = area.partition(":")
        for a, c, _n, _d, bbox in AREA_NAMES:
            if a == auth and c == code:
                return ("bbox", bbox)
        return ("error", "Area of use retrieval failed: extent not "
                         "found")
    exact = [r for r in AREA_NAMES if r[2] == area]
    if len(exact) == 1:
        return ("bbox", exact[0][4])
    want = area.casefold()
    approx = [r for r in AREA_NAMES if want in r[2].casefold()]
    if len(approx) == 1:
        return ("bbox", approx[0][4])
    if not approx:
        return ("error", "No area of use matching provided name")
    return ("substr", want)


def list_crs(filter_str: str | None, authorities: list[str] | None,
             opts: dict) -> tuple[str, int]:
    """projinfo --list-crs (reference projinfo.cpp:1467 over
    AuthorityFactory::getCRSInfoList)."""
    from proj_ray.crs_list_generated import CRS_LIST
    from proj_ray.projinfo_ops import box_contains, box_intersects

    allow_dep = False
    kinds: set[str] = set()
    for tok in (filter_str.split(",") if filter_str else []):
        if tok == "allow_deprecated":
            allow_dep = True
        elif tok in _LIST_KINDS:
            kinds |= _LIST_KINDS[tok]
        else:
            return (f"Unrecognized value for option --list-crs: "
                    f"{tok}\n", 1)
    mode, payload = None, None
    if opts.get("aoi") is not None:
        mode, payload = "bbox", opts["aoi"]
    elif opts.get("area"):
        mode, payload = _listcrs_area_filter(opts["area"])
        if mode == "error":
            return (payload + "\n", 1)
    contains = opts.get("spatial_test", "contains") == "contains"
    out = []
    for auth in (authorities or [None]):
        for a, code, name, kind, dep, bbox, desc in CRS_LIST:
            if auth is not None and a != auth:
                continue
            if dep and not allow_dep:
                continue
            if kinds and kind not in kinds:
                continue
            if mode == "bbox":
                if bbox is None:
                    continue
                ok = box_contains(payload, bbox) if contains \
                    else box_intersects(payload, bbox)
                if not ok:
                    continue
            elif mode == "substr" and payload not in desc.casefold():
                continue
            out.append(f'{a}:{code} "{name}"'
                       + (" [deprecated]" if dep else ""))
    return ("\n".join(out) + "\n" if out else ""), 0


# --------------------------------------------------------- projinfo UI ----


def _resolve_code(spec: str) -> tuple[str, int] | None:
    import re

    m = re.match(r"(?i)^epsg:(\d+)$", spec.strip())
    if not m:
        # bare CRS name from the registry
        from proj_ray.epsg_names import CRS_NAMES

        hit = CRS_NAMES.get(spec.strip().casefold())
        if hit and hit.upper().startswith("EPSG:"):
            m2 = re.match(r"(?i)^epsg:(\d+)$", hit)
            if m2:
                code = int(m2.group(1))
                return (("geog" if code in M.GEOG else
                         "proj" if code in M.PROJCRS else
                         "vert" if code in M.VERT else "?"), code)
        return None
    code = int(m.group(1))
    if code in M.GEOG:
        return ("geog", code)
    if code in M.PROJCRS:
        return ("proj", code)
    if code in M.VERT:
        return ("vert", code)
    return None


def crs_text(kind: str, code: int, fmt: str,
              single_line: bool = False, three_d: bool = False) -> str:
    """One representation of a CRS, by projinfo -o format name."""
    import json

    f = fmt.upper().replace(":", "_")
    if kind == "proj":
        if f in ("WKT2_2019", "WKT2"):
            return proj_wkt2(code, "2019",
                             three_d).render(0, not single_line)
        if f == "WKT2_2015":
            return proj_wkt2(code, "2015",
                             three_d).render(0, not single_line)
        if f == "PROJ":
            return proj_proj4(code)
        raise NotImplementedError(f"projected CRS {fmt} output")
    if kind != "geog":
        raise NotImplementedError(f"{kind} CRS text output")
    if f in ("WKT2_2019", "WKT2"):
        return geog_wkt2(code, "2019").render(0, not single_line)
    if f == "WKT2_2015":
        return geog_wkt2(code, "2015").render(0, not single_line)
    if f == "WKT1_GDAL":
        return geog_wkt1_gdal(code).render(0, not single_line)
    if f == "WKT1_ESRI":
        return geog_wkt1_esri(code).render(0, False)
    if f == "PROJJSON":
        return json.dumps(geog_projjson(code), indent=2,
                          ensure_ascii=False)
    if f == "PROJ":
        return geog_proj4(code)
    raise NotImplementedError(f"output format {fmt}")


def _wkt1_geogcs_output(text: str) -> tuple[str, int]:
    """A WKT1 GEOGCS given as the object: tolerant parse (the
    reference recovers from a missing PRIMEM with a warning and a
    bison-style grammar error showing an ±40-char context window),
    then PROJ.4 + WKT2:2019 output."""
    from proj_ray.wkt import _parse_wkt

    node = _parse_wkt(text)
    if node.name.upper() != "GEOGCS":
        raise NotImplementedError("non-registry CRS input")
    datum_in = node.find("DATUM")
    primem = node.find("PRIMEM")
    unit = node.find("UNIT")
    if datum_in is None:
        raise NotImplementedError("non-registry CRS input")
    head = ""
    if primem is None and unit is not None:
        head += "Warning: GEOGCS should have a PRIMEM node\n"
        pos = text.index("UNIT[", text.index("DATUM"))
        start = max(0, pos - 40)
        window = text[start:min(len(text), pos + 40)]
        head += ("Grammar error: Parsing error : syntax error, "
                 "unexpected UNIT, expecting PRIMEM. Error occurred "
                 "around:\n" + window + "\n"
                 + " " * (pos - start) + "^\n")
    name = str(node.args[0])
    dname = str(datum_in.args[0])
    sph = datum_in.find("SPHEROID", "ELLIPSOID")
    ename, a, rf = str(sph.args[0]), sph.args[1], sph.args[2]
    def _dnorm(s: str) -> str:
        s = s[2:] if s.startswith("D_") else s
        return s.replace("_", " ").casefold()

    want = _dnorm(dname)
    dcode = M.ALIAS.get(("geodetic_datum", want))
    if dcode is None:
        dcode = next((c for (tbl, c), alias in M.ESRI_ALIAS.items()
                      if tbl == "geodetic_datum"
                      and _dnorm(alias) == want), None)
    if dcode is None:
        dcode = next((c for c, d in M.DATUM.items()
                      if _dnorm(d[0]) == want), None)
    if dcode is not None:
        dname = M.DATUM[dcode][0]
        if dname.endswith(" ensemble"):
            dname = dname[: -len(" ensemble")]
    uname = str(unit.args[0]) if unit else "degree"
    uval = unit.args[1] if unit else 0.0174532925199433

    def au():
        return N("ANGLEUNIT", q(uname), wnum(uval))

    geog = N(
        "GEOGCRS", q(name),
        N("DATUM", q(dname),
          N("ELLIPSOID", q(ename), wnum(a), wnum(rf),
            N("LENGTHUNIT", q("metre"), "1",
              N("ID", q("EPSG"), "9001")))),
        N("PRIMEM", q("Greenwich"), "0",
          N("ANGLEUNIT", q("degree"), DEG_RAD),
          N("ID", q("EPSG"), "8901")),
        N("CS", "ellipsoidal", "2"),
        N("AXIS", q("longitude"), "east", N("ORDER", "1"), au(),
          bump=True),
        N("AXIS", q("latitude"), "north", N("ORDER", "2"), au(),
          bump=True))
    if dcode is not None:
        p4 = "+proj=longlat " + " ".join(_p4_datum_parts(dcode)) \
            + " +no_defs +type=crs"
    else:
        p4 = (f"+proj=longlat +a={wnum(a)} +rf={wnum(rf)} "
              f"+no_defs +type=crs")
    return (head + "PROJ.4 string:\n" + p4 + "\n\n"
            + "WKT2:2019 string:\n" + geog.render(0, True) + "\n"), 0


def _object_sql(spec: str, oauth: str, ocode: str,
                authority: str | None) -> list[str]:
    """SQL INSERT statements for a CRS object under --output-id."""
    import re

    from proj_ray import projinfo_sql as PS

    s = spec.strip()
    if s.startswith("+proj=") and "+type=crs" in s:
        return PS.projstring_projected_sql(
            s, oauth, ocode, materialize=authority is not None)
    m = re.match(r"(?i)^epsg:(\d+)$", s)
    if m and int(m.group(1)) in M.GEOG:
        return PS.registry_geog_sql(int(m.group(1)), oauth, ocode)
    raise NotImplementedError(f"SQL output for {spec!r}")


def run_projinfo(args: list[str]) -> tuple[str, int]:
    """Replicate projinfo's stdout for the supported argument shapes.
    Returns (stdout_text, exit_code); raises NotImplementedError for
    unsupported feature classes (itemized by the replay tool)."""
    fmt = None
    quiet = False
    single_line = False
    three_d = False
    obj_kind = None
    search_opts: dict = {}
    positional: list[str] = []
    i = 0
    unsupported = []
    while i < len(args):
        a = args[i]
        if a == "-o":
            fmt = args[i + 1]
            i += 2
            continue
        if a == "-q":
            quiet = True
            i += 1
            continue
        if a == "--single-line":
            single_line = True
            i += 1
            continue
        if a == "--3d":
            three_d = True
            i += 1
            continue
        if a == "--normalize-axis-order":
            search_opts["normalize"] = True
            i += 1
            continue
        if a == "-k":
            obj_kind = args[i + 1]
            i += 2
            continue
        if a in ("-s", "--source-crs"):
            search_opts["src"] = args[i + 1]
            i += 2
            continue
        if a in ("-t", "--target-crs"):
            search_opts["dst"] = args[i + 1]
            i += 2
            continue
        if a == "--summary":
            search_opts["summary"] = True
            i += 1
            continue
        if a == "--hide-ballpark":
            search_opts["hide_ballpark"] = True
            i += 1
            continue
        if a == "--spatial-test":
            search_opts["spatial_test"] = args[i + 1]
            i += 2
            continue
        if a == "--grid-check":
            search_opts["grid_check"] = args[i + 1]
            i += 2
            continue
        if a == "--crs-extent-use":
            search_opts["crs_extent_use"] = args[i + 1]
            i += 2
            continue
        if a == "--bbox":
            w, s, e, n = (float(v) for v in args[i + 1].split(","))
            search_opts["aoi"] = (w, s, e, n)
            i += 2
            continue
        if a == "--area":
            search_opts["area"] = args[i + 1]
            i += 2
            continue
        if a == "--accuracy":
            search_opts["accuracy"] = float(args[i + 1])
            i += 2
            continue
        if a == "--searchpaths":
            from proj_ray.ops.gridshift import GRID_SEARCH_PATH

            return "".join(str(p) + "\n"
                           for p in GRID_SEARCH_PATH), 0
        if a == "--remote-data":
            import os

            if os.environ.get("PROJ_NETWORK", "").upper() == "ON":
                return ("Status: enabled\n"
                        "URL: https://cdn.proj.org\n"), 0
            return ("Status: disabled\n"
                    "Reason: not enabled in proj.ini or PROJ_NETWORK=ON "
                    "not specified\n"), 0
        if a == "--list-crs":
            list_crs_filter = ""
            if i + 1 < len(args) and not args[i + 1].startswith("-"):
                list_crs_filter = args[i + 1]
                i += 1
            search_opts["list_crs"] = list_crs_filter
            i += 1
            continue
        if a == "--authority":
            search_opts["authority"] = args[i + 1]
            i += 2
            continue
        if a in ("--s_epoch", "--t_epoch"):
            search_opts[a.lstrip("-")] = float(args[i + 1])
            i += 2
            continue
        if a == "--output-id":
            search_opts["output_id"] = args[i + 1]
            i += 2
            continue
        if a == "--dump-db-structure":
            search_opts["dump_db"] = True
            i += 1
            continue
        if a.startswith("--"):
            unsupported.append(a)
            i += 1
            continue
        positional.append(a)
        i += 1
    if unsupported:
        raise NotImplementedError("flag " + unsupported[0])
    sql_out = fmt is not None and fmt.upper() == "SQL"
    if search_opts.get("dump_db") or \
            (sql_out and "output_id" in search_opts):
        out = []
        if search_opts.get("dump_db"):
            # Prefer the live bundled proj.db (full sqlite_master text,
            # exactly factory.cpp getDatabaseStructure); fall back to
            # the generated static schema dump when the db is absent.
            from proj_ray import projdb

            if projdb.available():
                out.extend(projdb.database_structure())
            else:
                from proj_ray.db_structure_generated import DB_STRUCTURE

                out.extend(DB_STRUCTURE)
        if len(positional) == 1:
            oid = search_opts.get("output_id")
            if oid is None:
                raise NotImplementedError(
                    "SQL output without --output-id")
            oauth, _, ocode = oid.partition(":")
            out.extend(_object_sql(positional[0], oauth, ocode,
                                   search_opts.get("authority")))
        return "\n".join(out) + "\n", 0
    if "list_crs" in search_opts:
        auths = search_opts.get("authority")
        return list_crs(search_opts["list_crs"],
                        auths.split(",") if auths else None,
                        search_opts)
    if "authority" in search_opts:
        raise NotImplementedError("flag --authority")
    if obj_kind is not None and len(positional) == 1:
        return _object_output(obj_kind, positional[0], fmt, quiet)
    if len(positional) == 2 and "src" not in search_opts:
        search_opts["src"], search_opts["dst"] = positional
        positional = []
    if "src" in search_opts and "dst" in search_opts:
        from proj_ray import projinfo_ops as PO

        try:
            src = PO.resolve_crs(search_opts["src"])
            dst = PO.resolve_crs(search_opts["dst"])
            if "area" in search_opts:
                search_opts["aoi"] = PO.resolve_area(
                    search_opts["area"])
                search_opts["area_mode"] = True
            search_opts.update(fmt=fmt, quiet=quiet,
                               single_line=single_line,
                               three_d=three_d)
            cands, note = PO.search(src, dst, search_opts)
            return PO.render(cands, note, src, dst, search_opts), 0
        except PO.SearchError as e:
            return (str(e) + "\n", 1)
    if len(positional) == 1 and _resolve_code(positional[0]) is None:
        # bare datum/ensemble name (e.g. D_WGS_1984): ensemble form
        code = _lookup_named("geodetic_datum", positional[0], M.DATUM)
        if code is not None:
            body = datum_node(code, "2019", with_id=True,
                              standalone=True).render(0, True)
            return ("WKT2:2019 string:\n" + body + "\n", 0)
    if len(positional) == 1:
        r = _resolve_code(positional[0])
        if r is None and positional[0].lstrip().upper().startswith(
                "GEOGCS["):
            return _wkt1_geogcs_output(positional[0])
        if r is None:
            raise NotImplementedError("non-registry CRS input")
        kind, code = r
        head = ""
        table = {"geog": "geodetic_crs", "proj": "projected_crs",
                 "vert": "vertical_crs"}[kind]
        dep = (M.GEOG.get(code, M.PROJCRS.get(code, (None,) * 5))[-1]
               if kind in ("geog", "proj") else 0)
        if dep:
            repl = M.DEPRECATION.get((table, code), [])
            head = "Warning: object is deprecated\n"
            if repl:
                head += ("Alternative non-deprecated CRS:\n"
                         + "".join(f"  EPSG:{c}\n" for c in repl)
                         + "\n")
        return head + _crs_output(kind, code, fmt, quiet, single_line,
                                  three_d), 0
    if len(positional) == 2:
        raise NotImplementedError("operation search")
    if len(positional) > 2:
        return (f"Too many parameters: {positional[1]}\n", 1)
    raise NotImplementedError("no positional arguments")


def _object_output(obj_kind: str, spec: str, fmt: str | None,
                   quiet: bool) -> tuple[str, int]:
    """-k {ellipsoid|datum|ensemble|operation} lookups."""
    if obj_kind == "ellipsoid":
        code = _lookup_named("ellipsoid", spec, M.ELLIPSOID)
        if code is None:
            raise NotImplementedError(f"ellipsoid lookup {spec!r}")
        p4 = (f"+ellps={_P4_ELLPS[code]}" if code in _P4_ELLPS else
              _ellps_token_from_ell(code))
        wkt = ellipsoid_node(code, with_id=True).render(0, True)
        if quiet:
            return (wkt + "\n", 0)
        return (f"PROJ string:\n{p4}\n\nWKT2:2019 string:\n{wkt}\n", 0)
    if obj_kind in ("datum", "ensemble"):
        code = _lookup_named("geodetic_datum", spec, M.DATUM)
        if code is None:
            raise NotImplementedError(f"datum lookup {spec!r}")
        node = datum_node(code, "2019", with_id=True,
                          standalone=obj_kind == "ensemble",
                          force_datum=obj_kind == "datum")
        return ("WKT2:2019 string:\n" + node.render(0, True) + "\n", 0)
    if obj_kind == "operation":
        import re

        m = re.match(r"(?i)^epsg:(\d+)$", spec.strip())
        if not m:
            raise NotImplementedError("operation lookup by name")
        code = int(m.group(1))
        hit = _find_helmert_by_code(code)
        if hit is not None:
            src, dst, entry = hit
            line = helmert_pipeline(src, dst, entry)
        elif code in M.CONCAT_OPS:
            _name, src, dst, step_codes = M.CONCAT_OPS[code]
            entries = []
            for sc in step_codes:
                h = _find_helmert_by_code(sc)
                if h is None:
                    raise NotImplementedError(
                        f"concat step EPSG:{sc} not in Helmert tables")
                entries.append(h[2])
            # helmerts compose in geocentric XYZ: one cart sandwich,
            # identity steps (0,0,0 and no rotation) optimized away
            live = [e for e in entries
                    if e["t"] != (0.0, 0.0, 0.0) or e.get("r")]
            line = helmert_chain_pipeline(src, dst, live)
        else:
            raise NotImplementedError(
                f"operation EPSG:{code} not in Helmert tables")
        body = format_proj_multiline(line)
        if quiet:
            return (body + "\n", 0)
        return ("PROJ string:\n" + body + "\n", 0)
    raise NotImplementedError(f"-k {obj_kind}")


def _ellps_token_from_ell(ell_code: int) -> str:
    name, a, inv_f, b = M.ELLIPSOID[ell_code]
    return f"+a={wnum(a)} " + (f"+rf={wnum(inv_f)}" if inv_f
                               else f"+b={wnum(b)}")


def _crs_output(kind: str, code: int, fmt: str | None, quiet: bool,
                single_line: bool, three_d: bool = False) -> str:
    blocks = []

    def add(title: str, body: str, extra_nl: bool = False):
        if quiet:
            blocks.append(body)
        else:
            blocks.append(f"{title}:\n{body}" + ("\n" if extra_nl
                                                 else ""))

    f = (fmt or "default").upper().replace(":", "_")
    if f == "DEFAULT":
        add("PROJ.4 string", crs_text(kind, code, "PROJ"))
        add("WKT2:2019 string",
            crs_text(kind, code, "WKT2_2019", single_line, three_d))
    elif f == "ALL":
        add("PROJ.4 string", crs_text(kind, code, "PROJ"))
        add("WKT2:2015 string",
            crs_text(kind, code, "WKT2_2015", single_line))
        add("WKT2:2019 string",
            crs_text(kind, code, "WKT2_2019", single_line))
        add("WKT1:GDAL string",
            crs_text(kind, code, "WKT1_GDAL", single_line), True)
        add("WKT1:ESRI string",
            crs_text(kind, code, "WKT1_ESRI"), True)
        add("PROJJSON", crs_text(kind, code, "PROJJSON"))
    else:
        label = {"WKT2_2019": "WKT2:2019 string",
                 "WKT2_2015": "WKT2:2015 string",
                 "WKT1_GDAL": "WKT1:GDAL string",
                 "WKT1_ESRI": "WKT1:ESRI string",
                 "PROJJSON": "PROJJSON",
                 "PROJ": "PROJ.4 string"}.get(f)
        if label is None:
            raise NotImplementedError(f"output format {fmt}")
        add(label, crs_text(kind, code, f))
    return "\n\n".join(blocks) + "\n"
