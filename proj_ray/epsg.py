"""Curated static EPSG registry (legacy proj4-style definitions).

The reference resolves `+init=epsg:xxxx` through its SQLite proj.db
(src/iso19111/factory.cpp); this engine's compute path only needs the
small set of codes exercised by the conformance corpus and common
pipelines, so we keep a static dict of their public proj4 definitions
(as published in the legacy `epsg` init file / spatialreference.org).
Unknown codes raise NotImplementedError (reported as unsupported, never
silently wrong).
"""

EPSG_INIT: dict[int, str] = {
    # geographic
    4326: "+proj=longlat +datum=WGS84",
    4148: "+proj=longlat +ellps=WGS84 +towgs84=0,0,0",
    4152: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",
    4190: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",
    4211: "+proj=longlat +ellps=bessel +towgs84=-377,681,-50,0,0,0,0",
    4230: "+proj=longlat +ellps=intl +towgs84=-87,-98,-121,0,0,0,0",
    4237: "+proj=longlat +ellps=GRS67 +towgs84=52.17,-71.82,-14.9,0,0,0,0",
    4275: "+proj=longlat +a=6378249.2 +b=6356515 "
          "+towgs84=-168,-60,320,0,0,0,0",
    4283: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",
    4289: "+proj=longlat +ellps=bessel "
          "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,"
          "4.0725",
    4313: "+proj=longlat +ellps=intl "
          "+towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,-1.2747",
    4674: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",
    4742: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",
    4807: "+proj=longlat +a=6378249.2 +b=6356515 "
          "+towgs84=-168,-60,320,0,0,0,0 +pm=paris",
    # geocentric
    4978: "+proj=geocent +datum=WGS84",
    # projected
    2049: "+proj=tmerc +lat_0=0 +lon_0=21 +k=1 +x_0=0 +y_0=0 +axis=wsu "
          "+ellps=WGS84 +towgs84=0,0,0 +units=m",
    2192: "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=2.337229166666667 "
          "+k_0=0.99987742 +x_0=600000 +y_0=2200000 +ellps=intl "
          "+towgs84=-87,-98,-121,0,0,0,0 +units=m",
    3001: "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 "
          "+ellps=bessel +towgs84=-377,681,-50,0,0,0,0 +units=m",
    3577: "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 +x_0=0 "
          "+y_0=0 +ellps=GRS80 +towgs84=0,0,0 +units=m",
    3857: "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 "
          "+y_0=0 +k=1 +units=m +nadgrids=@null",
    23700: "+proj=somerc +lat_0=47.14439372222222 "
           "+lon_0=19.04857177777778 +k_0=0.99993 +x_0=650000 "
           "+y_0=200000 +ellps=GRS67 +towgs84=52.17,-71.82,-14.9,0,0,0,0 "
           "+units=m",
    25832: "+proj=utm +zone=32 +ellps=GRS80 +towgs84=0,0,0 +units=m",
    25833: "+proj=utm +zone=33 +ellps=GRS80 +towgs84=0,0,0 +units=m",
    26915: "+proj=utm +zone=15 +datum=NAD83",
    27572: "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742 "
           "+x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515 "
           "+towgs84=-168,-60,320,0,0,0,0 +pm=paris +units=m",
    28354: "+proj=utm +zone=54 +south +ellps=GRS80 +towgs84=0,0,0 "
           "+units=m",
    28992: "+proj=sterea +lat_0=52.15616055555555 "
           "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 "
           "+ellps=bessel "
           "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,"
           "4.0725 +units=m",
    31370: "+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 "
           "+lat_0=90 +lon_0=4.367486666666666 +x_0=150000.013 "
           "+y_0=5400088.438 +ellps=intl "
           "+towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,"
           "-1.2747 +units=m",
    32631: "+proj=utm +zone=31 +datum=WGS84",
    # Pulkovo 1942 (EPSG conversion data, data/sql/geodetic_crs.sql)
    4284: "+proj=longlat +ellps=krass "
          "+towgs84=23.92,-141.27,-80.9,0,0.35,0.82,-0.12",
    # NAD83(HARN) / Utah North, international feet (conversion 15362)
    2921: "+proj=lcc +lat_1=41.78333333333333 +lat_2=40.71666666666667 "
          "+lat_0=40.33333333333334 +lon_0=-111.5 +x_0=500000.0001504 "
          "+y_0=999999.999996 +ellps=GRS80 +towgs84=0,0,0 +units=ft",
    # NAD83(HARN) / Utah North, US survey feet (conversion 15297)
    3568: "+proj=lcc +lat_1=41.78333333333333 +lat_2=40.71666666666667 "
          "+lat_0=40.33333333333334 +lon_0=-111.5 +x_0=500000.00001016 "
          "+y_0=999999.99998984 +ellps=GRS80 +towgs84=0,0,0 +units=us-ft",
    # GDM2000 / East Malaysia BRSO, Hotine oblique Mercator variant A
    # (conversion 19894)
    3376: "+proj=omerc +no_uoff +lat_0=4 +lonc=115 +alpha=53.31580995 "
          "+gamma=53.13010236111111 +k=0.99984 +x_0=0 +y_0=0 +ellps=GRS80 "
          "+towgs84=0,0,0 +units=m",
    # GDM2000 / Johor Grid, Cassini-Soldner (conversion 19893)
    3377: "+proj=cass +lat_0=2.121679744444445 +lon_0=103.42793623611111 "
          "+x_0=-14810.562 +y_0=8758.32 +ellps=GRS80 +towgs84=0,0,0 "
          "+units=m",
    # NZGD2000 / New Zealand Transverse Mercator 2000
    2193: "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
          "+y_0=10000000 +ellps=GRS80 +towgs84=0,0,0 +units=m",
    # MGI / Austria M28/M31/M34 + Austria Lambert (legacy proj4 defs,
    # datum hermannskogel = BEV 7-param)
    31284: "+proj=tmerc +lat_0=0 +lon_0=10.33333333333333 +k=1 "
           "+x_0=150000 +y_0=0 +datum=hermannskogel +units=m",
    31285: "+proj=tmerc +lat_0=0 +lon_0=13.33333333333333 +k=1 "
           "+x_0=450000 +y_0=0 +datum=hermannskogel +units=m",
    31286: "+proj=tmerc +lat_0=0 +lon_0=16.33333333333333 +k=1 "
           "+x_0=750000 +y_0=0 +datum=hermannskogel +units=m",
    31287: "+proj=lcc +lat_1=49 +lat_2=46 +lat_0=47.5 "
           "+lon_0=13.33333333333333 +x_0=400000 +y_0=400000 "
           "+datum=hermannskogel +units=m",
    # Pulkovo 1942 / Caspian Sea Mercator, variant B (conversion 19884)
    3388: "+proj=merc +lat_ts=42 +lon_0=51 +x_0=0 +y_0=0 +ellps=krass "
          "+towgs84=23.92,-141.27,-80.9,0,0.35,0.82,-0.12 +units=m",
}


def resolve_init(spec: str) -> str:
    """Resolve 'epsg:NNNN' to a proj definition or raise.

    Resolution order: the curated table above (legacy proj4 semantics,
    incl. +towgs84) wins; otherwise the table generated from the
    reference's EPSG SQL distribution (tools/gen_epsg.py — 6,000+
    codes, modern no-towgs84 semantics)."""
    try:
        authority, code = spec.split(":", 1)
    except ValueError as exc:
        raise NotImplementedError(
            f"operator not implemented: init file {spec}") from exc
    if authority.lower() == "ignf":
        from proj_ray.ignf_generated import IGNF_GENERATED

        defn = IGNF_GENERATED.get(code.upper())
        if defn is not None:
            return defn
        # fall through to a shipped IGNF init FILE if one exists
        defn = _init_file_lookup(authority, code)
        if defn is not None:
            return defn
        raise NotImplementedError(
            f"operator not implemented: init IGNF:{code} (not in "
            "static registry)")
    if authority.lower() != "epsg":
        defn = _init_file_lookup(authority, code)
        if defn is not None:
            return defn
        raise NotImplementedError(
            f"operator not implemented: init file {authority}")
    try:
        icode = int(code)
    except ValueError as exc:
        raise NotImplementedError(
            f"operator not implemented: init epsg:{code}") from exc
    if icode in EPSG_INIT:
        return EPSG_INIT[icode]
    from proj_ray.epsg_generated import EPSG_GENERATED

    if icode in EPSG_GENERATED:
        defn = EPSG_GENERATED[icode]
        # legacy proj4 init rules: pure (n,e) permutations are dropped
        # (easting,northing output), mirrored axes (wsu/swu...) kept —
        # matching the historical proj4 'epsg' init file convention
        if "+axis=neu" in defn:
            defn = defn.replace(" +axis=neu", "")
        return defn
    raise NotImplementedError(
        f"operator not implemented: init epsg:{icode} (not in static "
        "registry)")


def _default_init_path() -> list[str]:
    """Init-file search path: $PROJ_RAY_DATA / $PROJ_LIB first, then the
    package-relative data dir, then the reference checkout (test-only
    fallback for replaying its init-file corpora)."""
    import os

    path: list[str] = []
    for env in ("PROJ_RAY_DATA", "PROJ_LIB", "PROJ_DATA"):
        v = os.environ.get(env)
        if v:
            path.extend(v.split(os.pathsep))
    pkg = os.path.dirname(os.path.abspath(__file__))
    path.append(os.path.join(os.path.dirname(pkg), "data", "init"))
    ref = "/root/reference/data"
    if os.path.isdir(ref):
        path.append(ref)
    return path


INIT_FILE_PATH = _default_init_path()
_INIT_FILE_CACHE: dict[str, dict[str, str] | None] = {}


def _parse_init_file(path: str) -> dict[str, str]:
    """Legacy proj init file: `<key> params ... <>` entries, '#'
    comments, DMS values allowed (data/nad27, nad83, world...)."""
    table: dict[str, str] = {}
    key = None
    buf: list[str] = []
    for raw in open(path, encoding="utf-8", errors="replace"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if key is None:
            if line.startswith("<"):
                end = line.index(">")
                key = line[1:end]
                line = line[end + 1:]
            else:
                continue
        if "<>" in line:
            buf.append(line.split("<>", 1)[0])
            if key not in ("metadata",):
                toks = " ".join(buf).split()
                table[key] = " ".join(
                    t if t.startswith("+") else f"+{t}" for t in toks)
            key = None
            buf = []
        else:
            buf.append(line)
    return table


def _init_file_lookup(authority: str, code: str) -> str | None:
    auth = authority.lower()
    if auth not in _INIT_FILE_CACHE:
        import os

        table = None
        for d in INIT_FILE_PATH:
            p = os.path.join(d, auth)
            if os.path.isfile(p):
                table = _parse_init_file(p)
                break
        _INIT_FILE_CACHE[auth] = table
    table = _INIT_FILE_CACHE[auth]
    if table is None:
        return None
    defn = table.get(code)
    if defn is None:
        raise NotImplementedError(
            f"operator not implemented: init {authority}:{code} "
            "(no such key)")
    return defn


def resolve_code_authority(icode: int) -> str:
    """Resolve an `EPSG:NNNN` reference with AUTHORITY axis order (the
    modern createFromUserInput semantics): projected CRSs keep their
    +axis from the generated table; geographic CRSs with (lat,lon)
    authority order get +axis=neu appended."""
    defn = None
    if icode in EPSG_INIT:
        defn = EPSG_INIT[icode]
    else:
        from proj_ray.epsg_generated import EPSG_COMPOUND, EPSG_GENERATED

        if icode in EPSG_GENERATED:
            defn = EPSG_GENERATED[icode]
        elif icode in EPSG_COMPOUND:
            # compound code: the horizontal member carries the
            # projection surface (the proj app extracts it the same
            # way; cs2cs resolves the vertical member separately via
            # _split_compound)
            return resolve_code_authority(EPSG_COMPOUND[icode][0])
    if defn is None:
        raise NotImplementedError(
            f"operator not implemented: EPSG:{icode} (not in static "
            "registry)")
    from proj_ray.epsg_generated import EPSG_GEO_LATLON

    if icode in EPSG_GEO_LATLON and "+axis" not in defn \
            and "longlat" in defn:
        defn = defn + " +axis=neu"
    return defn


def resolve_iau(icode: int) -> str:
    """Resolve an `IAU_2015:NNNN` planetary CRS (generated from the
    reference's iau.sql) with authority axis order."""
    from proj_ray.iau_generated import IAU_GENERATED, IAU_GEO_LATLON

    defn = IAU_GENERATED.get(icode)
    if defn is None:
        raise NotImplementedError(
            f"operator not implemented: IAU_2015:{icode} (not in "
            "static registry)")
    if icode in IAU_GEO_LATLON and "+axis" not in defn \
            and "longlat" in defn:
        defn = defn + " +axis=neu"
    return defn


def _helmert_defn(e: dict) -> str:
    """OPERATIONS entry (metre / arc-second / ppm, per-year rates,
    epoch in years) -> +proj=helmert definition string."""
    s = (f"+proj=helmert +x={e['t'][0]:.15g} +y={e['t'][1]:.15g} "
         f"+z={e['t'][2]:.15g}")
    if "conv" in e:
        s += (f" +rx={e['r'][0]:.15g} +ry={e['r'][1]:.15g} "
              f"+rz={e['r'][2]:.15g} +s={e['s']:.15g}")
    if "epoch" in e:
        s += (f" +dx={e['dt'][0]:.15g} +dy={e['dt'][1]:.15g} "
              f"+dz={e['dt'][2]:.15g} +drx={e['dr'][0]:.15g} "
              f"+dry={e['dr'][1]:.15g} +drz={e['dr'][2]:.15g} "
              f"+ds={e['ds']:.15g} +t_epoch={e['epoch']:.15g}")
    if "conv" in e:
        s += f" +convention={e['conv']}"
    return s


def resolve_operation(ref: str) -> str:
    """Resolve a coordinate-OPERATION reference (as opposed to a CRS):
    'EPSG:NNNN' operation code, a bare code, or the operation's EPSG
    name ('ITRF2014 to ETRF2014 (1)') -> proj definition string. Covers
    the geocentric-domain helmert subset (incl. time-dependent) — the
    cct CLI initialization surface (reference src/apps/cct.cpp)."""
    from proj_ray.epsg_ops import OPERATIONS

    s = ref.strip()
    code = None
    up = s.upper()
    if up.startswith(("NKG:", "URN:OGC:DEF:COORDINATEOPERATION:NKG::")):
        from proj_ray.nkg import resolve_nkg

        return resolve_nkg(s.split(":")[-1])
    if up.startswith(("EPSG:", "URN:OGC:DEF:COORDINATEOPERATION:EPSG::")):
        tail = s.split(":")[-1]
        try:
            code = int(tail)
        except ValueError:
            code = None
    elif s.isdigit():
        code = int(s)
    if code is not None:
        e = OPERATIONS.get(code)
        if e is None:
            raise NotImplementedError(
                f"operator not implemented: operation EPSG:{code} "
                "(not in static geocentric-operation registry)")
        return _helmert_defn(e)
    for e in OPERATIONS.values():
        if e["name"] == s:
            return _helmert_defn(e)
    raise NotImplementedError(
        f"operator not implemented: operation {ref!r} (no such name)")
