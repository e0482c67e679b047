"""Minimal PLY point-cloud IO (ref ``vgtk/vgtk/pc/io.py:6-92``).

Supports ASCII and binary-little-endian vertex-only PLY, with optional color.
"""
from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_DTYPES = {
    "float": ("f", 4), "float32": ("f", 4), "double": ("d", 8),
    "float64": ("d", 8), "uchar": ("B", 1), "uint8": ("B", 1),
    "char": ("b", 1), "int8": ("b", 1), "short": ("h", 2), "ushort": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4), "uint": ("I", 4), "uint32": ("I", 4),
}


def load_ply(path: str) -> np.ndarray:
    """Returns [N, 3] float32 xyz."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n = int(next(l.split()[-1] for l in header if l.startswith("element vertex")))
        props = [
            (l.split()[1], l.split()[2])
            for l in header
            if l.startswith("property") and not l.startswith("property list")
        ]
        names = [p[1] for p in props]
        if fmt == "ascii":
            rows = []
            for _ in range(n):
                rows.append([float(v) for v in f.readline().split()])
            arr = np.asarray(rows)
        else:
            little = "little" in fmt
            codes = "".join(_DTYPES[t][0] for t, _ in props)
            sz = sum(_DTYPES[t][1] for t, _ in props)
            raw = f.read(n * sz)
            pref = "<" if little else ">"
            arr = np.asarray(
                [struct.unpack(pref + codes, raw[i * sz : (i + 1) * sz]) for i in range(n)]
            )
        ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
        return arr[:, [ix, iy, iz]].astype(np.float32)


def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None):
    """points [N, 3]; colors [N, 3] uint8 optional.  ASCII output."""
    pts = np.asarray(points, dtype=np.float32)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        if colors is None:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        else:
            for p, c in zip(pts, np.asarray(colors, dtype=np.uint8)):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
