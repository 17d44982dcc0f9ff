"""projinfo -o SQL / --output-id: render CRS objects as proj.db INSERT
statements.

Parity target: the reference's DatabaseContext::getInsertStatementsFor
(src/iso19111/factory.cpp) as driven by projinfo --output-id
(src/apps/projinfo.cpp:712). Scoreboard: tools/replay_projinfo_yaml.py
cases 6/7/67.
"""

from __future__ import annotations

from proj_ray import epsg_meta as M
from proj_ray.projinfo_text import wnum


def _n(v) -> str:
    """SQL literal for a numeric value (plain, no quotes)."""
    return wnum(float(v))


def _usage(auth: str, ucode: str, table: str, ocode: str,
           ext: tuple[str, str], scope: tuple[str, str]) -> str:
    return (f"INSERT INTO usage VALUES('{auth}','{ucode}','{table}',"
            f"'{auth}','{ocode}','{ext[0]}','{ext[1]}',"
            f"'{scope[0]}','{scope[1]}');")


UNKNOWN_EXT = ("PROJ", "EXTENT_UNKNOWN")
UNKNOWN_SCOPE = ("PROJ", "SCOPE_UNKNOWN")


def _crs_usage_codes(table: str, code: int) -> tuple[tuple, tuple]:
    """(extent, scope) auth/code pairs of a registry CRS's best usage
    (incl. the reference's 4326 hot patch)."""
    if table == "geodetic_crs" and code == 4326:
        return (("EPSG", "1262"), ("EPSG", "1183"))
    uses = M.USAGE.get((table, code))
    if not uses:
        return (UNKNOWN_EXT, UNKNOWN_SCOPE)
    ranked = sorted(
        (1 if "large scale" in M.SCOPE.get(sc, "") else 0, i)
        for i, (_, sc) in enumerate(uses))
    ext_code, sc_code = uses[ranked[0][1]]
    return (("EPSG", str(ext_code)), ("EPSG", str(sc_code)))


def registry_geog_sql(code: int, auth: str, ocode: str) -> list[str]:
    """Registry geographic CRS re-emitted under a new id, referencing
    the EPSG CS and datum (reference corpus case 67)."""
    name, kind, cs, datum, _dep = M.GEOG[code]
    ext, scope = _crs_usage_codes("geodetic_crs", code)
    return [
        f"INSERT INTO geodetic_crs VALUES('{auth}','{ocode}',"
        f"'{name}','','{kind}','EPSG','{cs}','EPSG','{datum}',NULL,0);",
        _usage(auth, f"USAGE_GEODETIC_CRS_{ocode}", "geodetic_crs",
               ocode, ext, scope),
    ]


# projection-method mapping for PROJ-string-defined projected CRSs:
# +proj token -> (variant chooser). Scoped to the corpus's needs; the
# general mapping lives in the reference's io.cpp.
def _merc_conversion(tokens: dict) -> tuple[int, str, list]:
    def tok(k, default=0.0):
        return float(tokens.get(k, default))

    if "lat_ts" in tokens:
        return (9805, "Mercator (variant B)", [
            (8823, "Latitude of 1st standard parallel",
             tok("lat_ts"), 9122),
            (8802, "Longitude of natural origin", tok("lon_0"), 9122),
            (8806, "False easting", tok("x_0"), 9001),
            (8807, "False northing", tok("y_0"), 9001),
        ])
    return (9804, "Mercator (variant A)", [
        (8801, "Latitude of natural origin", tok("lat_0"), 9122),
        (8802, "Longitude of natural origin", tok("lon_0"), 9122),
        (8805, "Scale factor at natural origin",
         tok("k", tok("k_0", 1.0)), 9201),
        (8806, "False easting", tok("x_0"), 9001),
        (8807, "False northing", tok("y_0"), 9001),
    ])


_METHODS = {"merc": _merc_conversion}

_DATUM_CODES = {"WGS84": 6326, "GRS80": 6269, "NAD83": 6269,
                "NAD27": 6267, "potsdam": 6314, "carthage": 6223,
                "hermannskogel": 6312, "ire65": 6299, "nzgd49": 6272,
                "OSGB36": 6277}


def projstring_projected_sql(projstring: str, auth: str, ocode: str,
                             materialize: bool) -> list[str]:
    """PROJ-string projected CRS as SQL INSERTs (corpus cases 6/7).
    materialize=True (--authority AUTH) re-emits the datum, ellipsoid
    and prime meridian under AUTH instead of referencing EPSG."""
    tokens: dict = {}
    for part in projstring.split():
        if part.startswith("+"):
            k, _, v = part[1:].partition("=")
            tokens[k] = v
    proj = tokens.get("proj")
    if proj not in _METHODS:
        raise NotImplementedError(f"SQL output for +proj={proj}")
    datum_code = _DATUM_CODES.get(tokens.get("datum", "WGS84"))
    if datum_code is None:
        raise NotImplementedError(
            f"SQL output for +datum={tokens.get('datum')}")
    method, method_name, params = _METHODS[proj](tokens)

    geod_code = f"GEODETIC_CRS_{ocode}"
    conv_code = f"CONVERSION_{ocode}"
    out: list[str] = []
    if materialize:
        datum_key = f"GEODETIC_DATUM_{geod_code}"
        ell_key = f"ELLPS_{datum_key}"
        pm_key = f"PM_{datum_key}"
        dname, ell, pm, _acc = M.DATUM[datum_code]
        if dname.endswith(" ensemble"):
            dname = dname[: -len(" ensemble")]
        ename, a, inv_f, b = M.ELLIPSOID[ell]
        out.append(
            f"INSERT INTO ellipsoid VALUES('{auth}','{ell_key}',"
            f"'{ename}','','IAU_2015','399',{_n(a)},'EPSG','9001',"
            f"{_n(inv_f) if inv_f is not None else 'NULL'},"
            f"{_n(b) if inv_f is None and b is not None else 'NULL'},"
            f"0);")
        pname, pval, puom = M.PM[pm]
        if M.UOM[puom][0].startswith("degree"):
            # the reference's SQL exporter re-identifies degree units
            # as 9122 (supplier-defined representation)
            puom = 9122
        out.append(
            f"INSERT INTO prime_meridian VALUES('{auth}','{pm_key}',"
            f"'{pname}',{_n(pval)},'EPSG','{puom}',0);")
        out.append(
            f"INSERT INTO geodetic_datum VALUES('{auth}','{datum_key}',"
            f"'{dname}','','{auth}','{ell_key}','{auth}','{pm_key}',"
            f"NULL,NULL,NULL,NULL,NULL,0);")
        out.append(_usage(auth, f"USAGE_{datum_key}", "geodetic_datum",
                          datum_key, UNKNOWN_EXT, UNKNOWN_SCOPE))
        datum_ref = f"'{auth}','{datum_key}'"
    else:
        datum_ref = f"'EPSG','{datum_code}'"
    # the base geographic CRS of a PROJ-string projected CRS uses the
    # lon-lat ellipsoidal CS (6424)
    out.append(
        f"INSERT INTO geodetic_crs VALUES('{auth}','{geod_code}',"
        f"'unknown','','geographic 2D','EPSG','6424',{datum_ref},"
        f"NULL,0);")
    out.append(_usage(auth, f"USAGE_{geod_code}", "geodetic_crs",
                      geod_code, UNKNOWN_EXT, UNKNOWN_SCOPE))
    ptxt = ""
    for pcode, pname, pval, puom in params:
        ptxt += (f"'EPSG','{pcode}','{pname}',{_n(pval)},"
                 f"'EPSG','{puom}',")
    ptxt += "NULL," * (6 * (7 - len(params)))
    out.append(
        f"INSERT INTO conversion VALUES('{auth}','{conv_code}',"
        f"'unknown','','EPSG','{method}','{method_name}',"
        f"{ptxt}0);")
    out.append(_usage(auth, f"USAGE_{conv_code}", "conversion",
                      conv_code, UNKNOWN_EXT, UNKNOWN_SCOPE))
    out.append(
        f"INSERT INTO projected_crs VALUES('{auth}','{ocode}',"
        f"'unknown','','EPSG','4400','{auth}','{geod_code}',"
        f"'{auth}','{conv_code}',NULL,0);")
    out.append(_usage(auth, f"USAGE_PROJECTED_CRS_{ocode}",
                      "projected_crs", ocode, UNKNOWN_EXT,
                      UNKNOWN_SCOPE))
    return out
