"""Ellipsoid definitions and derived constants.

Mirrors the reference's ellipsoid table (``src/ellps.cpp:9-55``) and the
derived-parameter computation ``pj_calc_ellipsoid_params``
(``src/ell_set.cpp:549-640``): everything an operator kernel needs (e, es,
third flattening n, one_es, ...) is computed once up front and reused for
every batch.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

# name -> (a, ("rf"|"b", value)) — public geodetic constants, same set the
# reference ships in src/ellps.cpp.
ELLPS_TABLE: dict[str, tuple[float, str, float]] = {
    "MERIT": (6378137.0, "rf", 298.257),
    "SGS85": (6378136.0, "rf", 298.257),
    "GRS80": (6378137.0, "rf", 298.257222101),
    "IAU76": (6378140.0, "rf", 298.257),
    "airy": (6377563.396, "rf", 299.3249646),
    "APL4.9": (6378137.0, "rf", 298.25),
    "NWL9D": (6378145.0, "rf", 298.25),
    "mod_airy": (6377340.189, "b", 6356034.446),
    "andrae": (6377104.43, "rf", 300.0),
    "danish": (6377019.2563, "rf", 300.0),
    "aust_SA": (6378160.0, "rf", 298.25),
    "GRS67": (6378160.0, "rf", 298.2471674270),
    "GSK2011": (6378136.5, "rf", 298.2564151),
    "bessel": (6377397.155, "rf", 299.1528128),
    "bess_nam": (6377483.865, "rf", 299.1528128),
    "clrk66": (6378206.4, "b", 6356583.8),
    "clrk80": (6378249.145, "rf", 293.4663),
    "clrk80ign": (6378249.2, "rf", 293.4660212936269),
    "CPM": (6375738.7, "rf", 334.29),
    "delmbr": (6376428.0, "rf", 311.5),
    "engelis": (6378136.05, "rf", 298.2566),
    "evrst30": (6377276.345, "rf", 300.8017),
    "evrst48": (6377304.063, "rf", 300.8017),
    "evrst56": (6377301.243, "rf", 300.8017),
    "evrst69": (6377295.664, "rf", 300.8017),
    "evrstSS": (6377298.556, "rf", 300.8017),
    "fschr60": (6378166.0, "rf", 298.3),
    "fschr60m": (6378155.0, "rf", 298.3),
    "fschr68": (6378150.0, "rf", 298.3),
    "helmert": (6378200.0, "rf", 298.3),
    "hough": (6378270.0, "rf", 297.0),
    "intl": (6378388.0, "rf", 297.0),
    "krass": (6378245.0, "rf", 298.3),
    "kaula": (6378163.0, "rf", 298.24),
    "lerch": (6378139.0, "rf", 298.257),
    "mprts": (6397300.0, "rf", 191.0),
    "new_intl": (6378157.5, "b", 6356772.2),
    "plessis": (6376523.0, "b", 6355863.0),
    "PZ90": (6378136.0, "rf", 298.25784),
    "SEasia": (6378155.0, "b", 6356773.3205),
    "walbeck": (6376896.0, "b", 6355834.8467),
    "WGS60": (6378165.0, "rf", 298.3),
    "WGS66": (6378145.0, "rf", 298.25),
    "WGS72": (6378135.0, "rf", 298.26),
    "WGS84": (6378137.0, "rf", 298.257223563),
    "sphere": (6370997.0, "b", 6370997.0),
}


@dataclass
class Ellipsoid:
    """Semimajor axis + eccentricity² and every derived constant.

    Derivations follow ``pj_calc_ellipsoid_params``
    (``src/ell_set.cpp:549-640``, via the angular eccentricity alpha).
    """

    a: float = 6378137.0
    es: float = 0.0

    e: float = field(init=False)
    alpha: float = field(init=False)
    e2: float = field(init=False)  # second eccentricity
    e2s: float = field(init=False)
    e3: float = field(init=False)  # third eccentricity
    e3s: float = field(init=False)
    f: float = field(init=False)  # flattening
    n: float = field(init=False)  # third flattening
    b: float = field(init=False)
    ra: float = field(init=False)
    rb: float = field(init=False)
    one_es: float = field(init=False)
    rone_es: float = field(init=False)

    def __post_init__(self) -> None:
        if not (self.es >= 0.0 and self.es < 1.0):
            raise ValueError(f"invalid eccentricity squared: {self.es}")
        self.e = math.sqrt(self.es)
        self.alpha = math.asin(self.e)
        self.e2 = math.tan(self.alpha)
        self.e2s = self.e2 * self.e2
        sa = math.sin(self.alpha)
        self.e3 = sa / math.sqrt(2 - sa * sa) if self.alpha != 0 else 0.0
        self.e3s = self.e3 * self.e3
        self.f = 1 - math.cos(self.alpha)
        self.n = math.tan(self.alpha / 2) ** 2
        self.b = (1 - self.f) * self.a
        self.ra = 1.0 / self.a
        self.rb = 1.0 / self.b
        self.one_es = 1.0 - self.es
        if self.one_es == 0.0:
            raise ValueError("effectively zero minor axis")
        self.rone_es = 1.0 / self.one_es

    @property
    def is_sphere(self) -> bool:
        return self.es == 0.0

    @classmethod
    def named(cls, name: str) -> "Ellipsoid":
        a, kind, v = ELLPS_TABLE[name]
        return cls.from_a_and(a, kind, v)

    @classmethod
    def from_a_and(cls, a: float, kind: str, v: float) -> "Ellipsoid":
        if not (a > 0 and math.isfinite(a)):
            raise ValueError(f"invalid semimajor axis {a}")
        if kind == "rf":
            if v == 0:
                raise ValueError("rf must be non-zero")
            f = 1.0 / v
            if not (0 <= f < 1):
                raise ValueError(f"invalid reverse flattening {v}")
            es = f * (2 - f)
        elif kind == "b":
            if not (0 < v):
                raise ValueError(f"invalid semiminor axis {v}")
            es = 1.0 - (v / a) ** 2
        elif kind == "f":
            if not (0 <= v < 1):
                raise ValueError(f"invalid flattening {v}")
            es = v * (2 - v)
        elif kind == "es":
            es = v
        elif kind == "e":
            if not (0 <= v < 1):
                raise ValueError(f"invalid eccentricity {v}")
            es = v * v
        else:
            raise ValueError(f"unknown ellipsoid spec {kind}")
        return cls(a=a, es=es)

    def M(self, phi: float) -> float:
        """Meridional radius of curvature at latitude phi."""
        sp = math.sin(phi)
        return self.a * (1 - self.es) / (1 - self.es * sp * sp) ** 1.5

    def N(self, phi: float) -> float:
        """Normal (prime-vertical) radius of curvature at latitude phi."""
        sp = math.sin(phi)
        return self.a / math.sqrt(1 - self.es * sp * sp)


WGS84 = Ellipsoid.named("WGS84")
GRS80 = Ellipsoid.named("GRS80")
