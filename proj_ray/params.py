"""+proj string parsing: paralist and DMS angles.

Mirrors the reference's parameter handling (``src/init.cpp:434-533`` builds
a paralist from "+key=value" tokens; ``src/dmstor.cpp`` parses sexagesimal
angles; ``src/pipeline.cpp:362-455`` splits "+step" groups and appends
pipeline-global arguments to every step).
"""

from __future__ import annotations

import re

# linear units table (src/units.cpp): name -> meters per unit
UNITS_TO_METER: dict[str, float] = {
    "km": 1000.0,
    "m": 1.0,
    "dm": 0.1,
    "cm": 0.01,
    "mm": 0.001,
    "kmi": 1852.0,
    "in": 0.0254,
    "ft": 0.3048,
    "yd": 0.9144,
    "mi": 1609.344,
    "fath": 1.8288,
    "ch": 20.1168,
    "link": 0.201168,
    "us-in": 1.0 / 39.37,
    "us-ft": 0.304800609601219,
    "us-yd": 0.914401828803658,
    "us-ch": 20.11684023368047,
    "us-mi": 1609.347218694437,
    "ind-yd": 0.91439523,
    "ind-ft": 0.30479841,
    "ind-ch": 20.11669506,
}

# prime meridians (src/prime_meridians.cpp): name -> offset from Greenwich
# in degrees (positive east)
PRIME_MERIDIANS: dict[str, str] = {
    "greenwich": "0dE",
    "lisbon": "9d07'54.862\"W",
    "paris": "2d20'14.025\"E",
    "bogota": "74d04'51.3\"W",
    "madrid": "3d41'16.58\"W",
    "rome": "12d27'8.4\"E",
    "bern": "7d26'22.5\"E",
    "jakarta": "106d48'27.79\"E",
    "ferro": "17d40'W",
    "brussels": "4d22'4.71\"E",
    "stockholm": "18d3'29.8\"E",
    "athens": "23d42'58.815\"E",
    "oslo": "10d43'22.5\"E",
}

_DMS_RE = re.compile(
    r"""^\s*
    (?P<sign>[+-])?
    (?P<deg>\d+(?:\.\d*)?|\.\d+)
    (?:[d°D]
      (?:(?P<min>\d+(?:\.\d*)?|\.\d+)
        (?:['′]
          (?:(?P<sec>\d+(?:\.\d*)?|\.\d+)["″]?)?
        )?
      )?
    )?
    (?P<hemi>[NSEWnsew])?
    \s*$""",
    re.VERBOSE,
)


def dms_to_deg(s: str) -> float:
    """Parse a (possibly sexagesimal) angle string to decimal degrees.

    Accepts plain decimals, `57d30'12.3"`, hemisphere suffixes NSEW, and a
    trailing `r` meaning the value is in radians (converted to degrees),
    following the reference's dmstor (src/dmstor.cpp).
    """
    s = s.strip()
    if s.endswith(("r", "R")) and not s[-2:-1].isalpha():
        import math

        return float(s[:-1]) * 180.0 / math.pi
    m = _DMS_RE.match(s)
    if not m:
        return float(s)  # raises ValueError with a clear message
    val = float(m.group("deg"))
    if m.group("min"):
        val += float(m.group("min")) / 60.0
    if m.group("sec"):
        val += float(m.group("sec")) / 3600.0
    if m.group("sign") == "-":
        val = -val
    hemi = m.group("hemi")
    if hemi and hemi.upper() in ("S", "W"):
        val = -val
    return val


def dms_to_rad(s: str) -> float:
    import math

    return dms_to_deg(s) * math.pi / 180.0


def deg_to_dms(deg: float, pos: str = "", neg: str = "-",
               fract: int = 3) -> str:
    """Format decimal degrees as DDdMM'SS.fff" with hemisphere letter —
    the rtodms counterpart (src/rtodms.cpp:41-88): seconds rounded to
    `fract` digits with carry into minutes/degrees; `pos`/`neg` are the
    hemisphere suffixes (e.g. "N"/"S"), '-' prefix when `neg` empty."""
    import math

    r = float(deg)
    if r < 0:
        r = -r
        prefix, suffix = ("", neg) if pos else ("-", "")
    else:
        prefix, suffix = "", pos
    res = 10.0 ** fract
    total = math.floor(r * 3600.0 * res + 0.5)
    sec = (total / res) % 60.0
    rest = math.floor(total / (res * 60.0))
    minute = int(rest % 60)
    d = int(rest // 60)
    sec_s = f"{sec:.{fract}f}" if fract else f"{int(sec)}"
    return f"{prefix}{d}d{minute}'{sec_s}\"{suffix}"


def parse_dms_array(strings) -> "np.ndarray":
    """Vectorized DMS parse of a string column (degrees out)."""
    import numpy as np

    out = np.empty(len(strings), dtype=np.float64)
    for i, s in enumerate(strings):
        out[i] = dms_to_deg(str(s))
    return out


def format_dms_array(degs, pos: str = "", neg: str = "-",
                     fract: int = 3) -> "np.ndarray":
    """Vectorized DMS format of a degree column."""
    import numpy as np

    return np.array([deg_to_dms(float(d), pos, neg, fract) for d in degs],
                    dtype=object)


class ParamSet:
    """A step's key->value mapping with typed accessors (cf. pj_param)."""

    def __init__(self, kv: dict[str, str | bool]):
        self.kv = kv
        self.used: set[str] = set()

    def has(self, key: str) -> bool:
        return key in self.kv

    def flag(self, key: str) -> bool:
        """'t'/'b' style: present (and not explicitly false)."""
        if key not in self.kv:
            return False
        self.used.add(key)
        v = self.kv[key]
        if v is True:
            return True
        return str(v).lower() not in ("false", "0", "no", "off")

    def f(self, key: str, default: float = 0.0) -> float:
        if key not in self.kv:
            return default
        self.used.add(key)
        return float(self.kv[key])

    def i(self, key: str, default: int = 0) -> int:
        if key not in self.kv:
            return default
        self.used.add(key)
        return int(float(self.kv[key]))

    def s(self, key: str, default: str = "") -> str:
        if key not in self.kv:
            return default
        self.used.add(key)
        v = self.kv[key]
        return "" if v is True else str(v)

    def r(self, key: str, default: float = 0.0) -> float:
        """Angle param in radians (input interpreted as degrees/DMS)."""
        if key not in self.kv:
            return default
        self.used.add(key)
        return dms_to_rad(str(self.kv[key]))


def tokenize(defn: str) -> list[tuple[str, str | bool]]:
    """Split a proj definition string into (key, value) tokens in order.

    Tolerates `key = v1, v2, v3` spacing (seen in gie operation strings)
    by collapsing whitespace around '=' and after ','. Double-quoted
    values may embed spaces (`+nadgrids="dir with space/f"`), matching
    the reference's argv splitter (src/4D_api.cpp pj_create argv
    handling; exercised by test_cs2cs_datumfile.yaml case 1)."""
    defn = re.sub(r"\s*=\s*", "=", defn)
    defn = re.sub(r",\s+", ",", defn)
    out: list[tuple[str, str | bool]] = []
    if '"' in defn:
        toks = re.findall(r'(?:[^\s"]+|"[^"]*")+', defn)
    else:
        toks = defn.split()
    for tok in toks:
        tok = tok.lstrip("+").replace('"', "")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            out.append((k, v))
        else:
            out.append((tok, True))
    return out


def split_pipeline(defn: str) -> tuple[dict, list[dict]] | None:
    """If `defn` is a pipeline, return (globals, [step dicts]); else None.

    Step argument resolution follows the reference (pipeline.cpp:362-455):
    pipeline-global arguments are appended to each step's own, and the
    first occurrence of a key wins — i.e. step args override globals.
    """
    toks = tokenize(defn)
    if not any(k == "proj" and v == "pipeline" for k, v in toks):
        return None
    globals_kv: dict[str, str | bool] = {}
    steps: list[dict] = []
    cur: dict[str, str | bool] | None = None
    for k, v in toks:
        if k == "step":
            cur = {}
            steps.append(cur)
            continue
        if cur is None:
            if k == "proj" and v == "pipeline":
                continue
            globals_kv.setdefault(k, v)
        else:
            cur.setdefault(k, v)
    merged = []
    for st in steps:
        m = dict(st)
        for k, v in globals_kv.items():
            # `inv` keeps occurrence (XOR) semantics — a global inv
            # toggles each step rather than filling a default; the
            # Pipeline constructor applies the toggle + step reversal
            # (PROJStringParser, src/iso19111/io.cpp:10022-10027).
            if k == "inv":
                continue
            m.setdefault(k, v)
        merged.append(m)
    return globals_kv, merged


def parse_single(defn: str) -> dict[str, str | bool]:
    kv: dict[str, str | bool] = {}
    for k, v in tokenize(defn):
        kv.setdefault(k, v)
    return kv
