"""PPM image IO (reference: src/color.h:14-35 writes P3 text to stdout;
the committed golden `image.ppm` is UTF-16-encoded P3).
"""

from __future__ import annotations

import io
from pathlib import Path

import numpy as np


def write_ppm(image_u8: np.ndarray, path_or_file) -> None:
    """Write a [H, W, 3] uint8 image as ASCII P3, one pixel per line —
    the exact stream format `camera::render` emits (src/camera.h:35,
    src/color.h:30-33)."""
    img = np.asarray(image_u8)
    h, w, _ = img.shape
    buf = io.StringIO()
    buf.write(f"P3\n{w} {h}\n255\n")
    flat = img.reshape(-1, 3)
    for r, g, b in flat:
        buf.write(f"{r} {g} {b}\n")
    data = buf.getvalue()
    if hasattr(path_or_file, "write"):
        path_or_file.write(data)
    else:
        Path(path_or_file).write_text(data)


def read_ppm(path) -> np.ndarray:
    """Read an ASCII P3 PPM into [H, W, 3] uint8.

    Handles both plain ASCII and the UTF-16 (BOM-prefixed) encoding of the
    reference's committed golden image (/root/reference/image.ppm)."""
    raw = Path(path).read_bytes()
    if raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
        text = raw.decode("utf-16")
    else:
        text = raw.decode("ascii")
    tokens = text.split()
    if tokens[0] != "P3":
        raise ValueError(f"not a P3 PPM: magic={tokens[0]!r}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    vals = np.array(tokens[4 : 4 + w * h * 3], dtype=np.int64)
    if maxval != 255:
        vals = vals * 255 // maxval
    return vals.reshape(h, w, 3).astype(np.uint8)
