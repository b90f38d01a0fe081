"""Film: tonemapping and image output.

Replaces the reference's PBO + ``SavePPM`` path (``smallpt_cpu.c:239-262``).
Images are float32 ``[H, W, 3]`` with row 0 at the BOTTOM (the reference's
GL convention; its PPM writer iterates rows top-down from ``height-1``,
``smallpt_cpu.c:254``).
"""

from __future__ import annotations

import os

import numpy as np

from gpu_bidirectional_raytracer_tpu.core import vecmath as vm


def to_bytes(colors) -> np.ndarray:
    """Gamma-2.2 quantize to uint8 (``toInt``, vec.h:34)."""
    return np.asarray(vm.gamma_to_byte(colors))


def write_ppm(colors, path: str | os.PathLike,
              prefer_native: bool = True) -> None:
    """P3 PPM, rows written top-of-image first (bottom-up buffer order),
    matching ``SavePPM`` byte layout. Uses the C++ encoder when available."""
    img = to_bytes(colors)
    if prefer_native:
        try:
            from gpu_bidirectional_raytracer_tpu import native

            if native.ppm_write(path, img):
                return
        except ImportError:
            pass
    h, w, _ = img.shape
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        for y in range(h - 1, -1, -1):
            row = img[y]
            f.write(" ".join(f"{r} {g} {b}" for r, g, b in row))
            f.write(" \n")


def read_ppm(path: str | os.PathLike) -> np.ndarray:
    """Read a P3 PPM back into bottom-up uint8 ``[H, W, 3]``."""
    with open(path) as f:
        toks = f.read().split()
    assert toks[0] == "P3", "only P3 supported"
    w, h, maxv = int(toks[1]), int(toks[2]), int(toks[3])
    data = np.asarray(toks[4:4 + w * h * 3], dtype=np.int64)
    img = data.reshape(h, w, 3).astype(np.uint8)
    return img[::-1]  # back to bottom-up buffer order


def write_png(colors, path: str | os.PathLike) -> bool:
    """PNG output (top-down, as viewers expect). Returns False when PIL is
    unavailable — PPM is the always-available format."""
    try:
        from PIL import Image
    except ImportError:
        return False
    img = to_bytes(colors)[::-1]  # bottom-up buffer -> top-down file
    Image.fromarray(img).save(os.fspath(path))
    return True


def write_image(colors, path: str | os.PathLike) -> str:
    """Write by extension: .png via PIL when available, else P3 PPM.
    Returns the path actually written (PPM fallback when PIL is absent)."""
    if str(path).lower().endswith(".png"):
        if write_png(colors, path):
            return str(path)
        path = str(path)[:-4] + ".ppm"
    write_ppm(colors, path)
    return str(path)


def snapshot_name(max_vlp: int, total_time: float, sample: int) -> str:
    """The reference encodes config + wall time + pass count in the file
    name (``smallpt_cpu.c:245``)."""
    return f"max{max_vlp}_secondi{total_time:.3f}_exe{sample}.ppm"
