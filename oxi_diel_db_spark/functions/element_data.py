"""Literal elemental-property tables for the reference-parity
descriptor tier (ml6/ml7) — the three PymatgenData properties the
engine did not yet carry: Pettifor Mendeleev number, thermal
conductivity, and melting point.

Sources are public standard references (Pettifor's chemical scale,
CRC handbook values as carried by pymatgen's periodic table) entered
as literals, covering the same 79-element corpus set as
formula.PAULING_EN. Consumed by ml6_reference_descriptors
(reference ml_prediction.py:82-117 slots 12-18).
"""

from __future__ import annotations

# Pettifor chemical scale ("Mendeleev number"), Pettifor 1984 —
# the ordering pymatgen exposes as Element.mendeleev_no.
MENDELEEV_NO: dict[str, float] = {
    "Ag": 71, "Al": 80, "As": 89, "Au": 70, "B": 86, "Ba": 14,
    "Be": 77, "Bi": 87, "Br": 98, "C": 95, "Ca": 16, "Cd": 75,
    "Ce": 32, "Cl": 99, "Co": 64, "Cr": 57, "Cs": 8, "Cu": 72,
    "Dy": 24, "Er": 22, "Eu": 18, "F": 102, "Fe": 61, "Ga": 81,
    "Gd": 27, "Ge": 84, "H": 103, "Hf": 50, "Hg": 74, "Ho": 23,
    "I": 97, "In": 79, "Ir": 66, "K": 10, "La": 33, "Li": 12,
    "Lu": 20, "Mg": 73, "Mn": 60, "Mo": 56, "N": 100, "Na": 11,
    "Nb": 53, "Nd": 30, "Ni": 67, "O": 101, "Os": 63, "P": 90,
    "Pb": 82, "Pd": 69, "Pr": 31, "Pt": 68, "Rb": 9, "Re": 58,
    "Rh": 65, "Ru": 62, "S": 94, "Sb": 88, "Sc": 19, "Se": 93,
    "Si": 85, "Sm": 28, "Sn": 83, "Sr": 15, "Ta": 52, "Tb": 26,
    "Tc": 59, "Te": 92, "Th": 47, "Ti": 51, "Tl": 78, "Tm": 21,
    "U": 45, "V": 54, "W": 55, "Y": 25, "Yb": 17, "Zn": 76,
    "Zr": 49,
}

# Thermal conductivity at ~300 K, W/(m·K) (CRC standard values).
THERMAL_CONDUCTIVITY: dict[str, float] = {
    "Ag": 429.0, "Al": 237.0, "As": 50.0, "Au": 318.0, "B": 27.0,
    "Ba": 18.0, "Be": 200.0, "Bi": 8.0, "Br": 0.12, "C": 140.0,
    "Ca": 200.0, "Cd": 97.0, "Ce": 11.0, "Cl": 0.0089, "Co": 100.0,
    "Cr": 94.0, "Cs": 36.0, "Cu": 401.0, "Dy": 11.0, "Er": 14.5,
    "Eu": 14.0, "F": 0.0277, "Fe": 80.0, "Ga": 41.0, "Gd": 10.6,
    "Ge": 60.0, "H": 0.1805, "Hf": 23.0, "Hg": 8.3, "Ho": 16.0,
    "I": 0.449, "In": 82.0, "Ir": 147.0, "K": 102.5, "La": 13.0,
    "Li": 85.0, "Lu": 16.0, "Mg": 156.0, "Mn": 7.8, "Mo": 138.0,
    "N": 0.02583, "Na": 142.0, "Nb": 53.7, "Nd": 16.5, "Ni": 91.0,
    "O": 0.02658, "Os": 87.6, "P": 0.236, "Pb": 35.0, "Pd": 71.8,
    "Pr": 12.5, "Pt": 71.6, "Rb": 58.0, "Re": 48.0, "Rh": 150.0,
    "Ru": 117.0, "S": 0.205, "Sb": 24.0, "Sc": 15.8, "Se": 0.52,
    "Si": 149.0, "Sm": 13.0, "Sn": 66.8, "Sr": 35.0, "Ta": 57.0,
    "Tb": 11.0, "Tc": 51.0, "Te": 3.0, "Th": 54.0, "Ti": 21.9,
    "Tl": 46.0, "Tm": 16.9, "U": 27.0, "V": 30.7, "W": 173.0,
    "Y": 17.0, "Yb": 38.5, "Zn": 116.0, "Zr": 23.0,
}

# Melting point, K (CRC standard values; white P, graphite C).
MELTING_POINT: dict[str, float] = {
    "Ag": 1234.9, "Al": 933.5, "As": 1090.0, "Au": 1337.3, "B": 2349.0,
    "Ba": 1000.0, "Be": 1560.0, "Bi": 544.5, "Br": 265.9, "C": 3800.0,
    "Ca": 1115.0, "Cd": 594.2, "Ce": 1071.0, "Cl": 171.7, "Co": 1768.0,
    "Cr": 2180.0, "Cs": 301.6, "Cu": 1357.8, "Dy": 1680.0, "Er": 1802.0,
    "Eu": 1099.0, "F": 53.5, "Fe": 1811.0, "Ga": 302.9, "Gd": 1585.0,
    "Ge": 1211.4, "H": 14.0, "Hf": 2506.0, "Hg": 234.3, "Ho": 1734.0,
    "I": 386.9, "In": 429.8, "Ir": 2739.0, "K": 336.5, "La": 1193.0,
    "Li": 453.7, "Lu": 1925.0, "Mg": 923.0, "Mn": 1519.0, "Mo": 2896.0,
    "N": 63.1, "Na": 371.0, "Nb": 2750.0, "Nd": 1294.0, "Ni": 1728.0,
    "O": 54.8, "Os": 3306.0, "P": 317.3, "Pb": 600.6, "Pd": 1828.0,
    "Pr": 1204.0, "Pt": 2041.4, "Rb": 312.5, "Re": 3459.0, "Rh": 2237.0,
    "Ru": 2607.0, "S": 388.4, "Sb": 903.8, "Sc": 1814.0, "Se": 494.0,
    "Si": 1687.0, "Sm": 1345.0, "Sn": 505.1, "Sr": 1050.0, "Ta": 3290.0,
    "Tb": 1629.0, "Tc": 2430.0, "Te": 722.7, "Th": 2023.0, "Ti": 1941.0,
    "Tl": 577.0, "Tm": 1818.0, "U": 1405.3, "V": 2183.0, "W": 3695.0,
    "Y": 1799.0, "Yb": 1097.0, "Zn": 692.7, "Zr": 2128.0,
}
