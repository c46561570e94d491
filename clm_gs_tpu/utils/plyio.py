"""Minimal PLY vertex reader/writer (binary-little-endian + ascii).

Replaces the reference's `plyfile` dependency for point-cloud IO (Gaussian
model PLYs use the dedicated schema code in models/gaussians.py).
"""

from __future__ import annotations

import numpy as np

_TYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "uint": "<u4",
    "int32": "<i4", "uint32": "<u4",
}


def read_ply_vertices(path):
    """Returns {property_name: (N,) array} for the `vertex` element."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii", errors="replace").splitlines()
    fmt = None
    n = None
    props = []
    in_vertex = False
    for line in header:
        t = line.split()
        if not t:
            continue
        if t[0] == "format":
            fmt = t[1]
        elif t[0] == "element":
            in_vertex = t[1] == "vertex"
            if in_vertex:
                n = int(t[2])
        elif t[0] == "property" and in_vertex:
            assert t[1] != "list", "list properties unsupported in vertex element"
            props.append((t[2], _TYPES[t[1]]))
    assert fmt is not None and n is not None
    dtype = np.dtype(props)
    if fmt == "binary_little_endian":
        arr = np.frombuffer(data[end : end + n * dtype.itemsize], dtype=dtype)
    elif fmt == "ascii":
        rows = data[end:].decode("ascii").split("\n")[:n]
        arr = np.array(
            [tuple(float(v) for v in r.split()) for r in rows], dtype=dtype
        )
    else:
        raise ValueError(f"unsupported PLY format {fmt}")
    return {name: np.ascontiguousarray(arr[name]) for name, _ in props}


def write_ply_points(path, points, colors=None):
    """Write an xyz(+rgb) point cloud."""
    n = len(points)
    props = ["property float x", "property float y", "property float z"]
    if colors is not None:
        props += [
            "property uchar red", "property uchar green", "property uchar blue",
        ]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n" + "\n".join(props) + "\nend_header\n"
    )
    dtype = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if colors is not None:
        dtype += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    arr = np.empty(n, dtype=dtype)
    arr["x"], arr["y"], arr["z"] = points[:, 0], points[:, 1], points[:, 2]
    if colors is not None:
        rgb = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
        arr["red"], arr["green"], arr["blue"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(arr.tobytes())
