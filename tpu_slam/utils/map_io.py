"""Occupancy-map file I/O — the `map_server` companion of the reference's
rviz/`nav_msgs::OccupancyGrid` publishing path.

The reference never saves maps itself (rviz renders the live topic;
`lesson6/src/karto_slam.cc:507-581` republishes the grid every 5 s), but
every ROS user of it persists maps with `map_saver`, which writes the
standard PGM + YAML pair. This module writes/reads that exact format so
maps produced here drop into the existing ecosystem:

  * PGM (P5, maxval 255): 254 = free, 0 = occupied, 205 = unknown —
    map_saver's trinary palette;
  * YAML: image / resolution / origin / negate / occupied_thresh /
    free_thresh.

Input maps are int8 in nav_msgs convention (-1 unknown, 0 free, 100
occupied) as produced by `ops.gridmap.logodds_to_ros`,
`models.karto.occupancy.karto_map`, and `models.gmapping`. Row 0 of the
array is the map's SOUTH edge (grid y=0), which PGM stores last — the same
vertical flip map_saver applies.
"""

from __future__ import annotations

import os

import numpy as np

from tpu_slam.config import GridConfig

FREE_PGM = 254
OCC_PGM = 0
UNKNOWN_PGM = 205


def to_trinary_pgm(ros_map: np.ndarray) -> np.ndarray:
    """int8 nav_msgs map (-1/0..100) → uint8 PGM pixel values."""
    m = np.asarray(ros_map)
    out = np.full(m.shape, UNKNOWN_PGM, np.uint8)
    out[m == 0] = FREE_PGM
    out[m >= 65] = OCC_PGM  # map_saver occupied_thresh 0.65
    return out


def from_trinary_pgm(pix: np.ndarray) -> np.ndarray:
    """uint8 PGM pixels → int8 nav_msgs map."""
    out = np.full(pix.shape, -1, np.int8)
    out[pix >= 250] = 0
    out[pix <= 50] = 100
    return out


def save_map(
    path_base: str, ros_map: np.ndarray, grid: GridConfig
) -> tuple[str, str]:
    """Write `<base>.pgm` + `<base>.yaml` (map_saver format). Returns the
    two paths. ``ros_map`` is (H, W) int8 with row 0 at the map's south
    edge (origin corner)."""
    pgm_path = path_base + ".pgm"
    yaml_path = path_base + ".yaml"
    pix = to_trinary_pgm(ros_map)[::-1]  # PGM row 0 = north edge
    h, w = pix.shape
    with open(pgm_path, "wb") as f:
        f.write(b"P5\n# tpu_slam map\n%d %d\n255\n" % (w, h))
        f.write(pix.tobytes())
    with open(yaml_path, "w") as f:
        f.write(
            "image: {img}\n"
            "resolution: {res}\n"
            "origin: [{ox}, {oy}, 0.0]\n"
            "negate: 0\n"
            "occupied_thresh: 0.65\n"
            "free_thresh: 0.196\n".format(
                img=os.path.basename(pgm_path),
                res=grid.resolution,
                ox=grid.origin_x,
                oy=grid.origin_y,
            )
        )
    return pgm_path, yaml_path


def load_map(yaml_path: str) -> tuple[np.ndarray, GridConfig]:
    """Read a map_server YAML + PGM pair → (int8 nav_msgs map, GridConfig)."""
    import yaml

    with open(yaml_path) as f:
        meta = yaml.safe_load(f)
    img = meta["image"]
    if not os.path.isabs(img):
        img = os.path.join(os.path.dirname(os.path.abspath(yaml_path)), img)
    pix = _read_pgm(img)
    ros_map = from_trinary_pgm(pix[::-1])  # back to south-edge-first rows
    h, w = ros_map.shape
    ox, oy = float(meta["origin"][0]), float(meta["origin"][1])
    grid = GridConfig(
        resolution=float(meta["resolution"]),
        size_x=w, size_y=h, origin_x=ox, origin_y=oy,
    )
    return ros_map, grid


def _read_pgm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    # parse P5 header: magic, width, height, maxval with #-comments
    tokens = []
    i = 0
    while len(tokens) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    if tokens[0] != b"P5":
        raise ValueError(f"not a binary PGM: {path}")
    w, h = int(tokens[1]), int(tokens[2])
    i += 1  # single whitespace after maxval
    return np.frombuffer(data[i : i + w * h], np.uint8).reshape(h, w)
