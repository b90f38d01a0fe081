"""``.scn`` scene file parser/writer.

Grammar-compatible with the reference parser (``display_func.c:112-175``):

    camera ox oy oz tx ty tz
    size N
    sphere rad px py pz er eg eb cr cg cb mat      (N times)

with mat in {0: DIFF, 1: SPEC, 2: REFR, 3: LITE}. The reference hard-exits
on malformed input; we raise :class:`SceneParseError` with a line number
instead. Unlike fscanf we also tolerate blank lines and ``#`` comments.

A tiny pure-Python parser is plenty here (the largest shipped scene,
complex.scn, has 783 spheres); an optional C++ fast path lives in
``native/`` for bulk workloads.
"""

from __future__ import annotations

import io
import os
from typing import Union

import numpy as np

from gpu_bidirectional_raytracer_tpu.core.types import Scene

_MATERIALS = frozenset((0, 1, 2, 3))


class SceneParseError(ValueError):
    pass


def _tokens(text: str):
    for lineno, raw in enumerate(text.splitlines(), start=1):
        line = raw.split("#", 1)[0].strip()
        if line:
            yield lineno, line.split()


def parse_scene(text: str) -> tuple[np.ndarray, np.ndarray, Scene]:
    """Parse scene text -> (camera_orig[3], camera_target[3], Scene)."""
    it = _tokens(text)

    def next_line(expect: str, nfields: int):
        try:
            lineno, toks = next(it)
        except StopIteration:
            raise SceneParseError(f"unexpected end of scene (expected '{expect}')")
        if toks[0] != expect:
            raise SceneParseError(f"line {lineno}: expected '{expect}', got '{toks[0]}'")
        if len(toks) - 1 != nfields:
            raise SceneParseError(
                f"line {lineno}: '{expect}' needs {nfields} fields, got {len(toks) - 1}")
        return lineno, toks[1:]

    def _floats(lineno, toks, what):
        try:
            return [float(v) for v in toks]
        except ValueError:
            raise SceneParseError(
                f"line {lineno}: non-numeric {what} field") from None

    lineno, cam = next_line("camera", 6)
    cam = np.asarray(_floats(lineno, cam, "camera"), dtype=np.float32)
    orig, target = cam[:3], cam[3:]

    lineno, (count,) = next_line("size", 1)
    try:
        count = int(count)
    except ValueError:
        raise SceneParseError(
            f"line {lineno}: sphere count must be an integer") from None
    if count <= 0:
        raise SceneParseError(f"line {lineno}: sphere count must be positive")

    rad = np.empty((count,), dtype=np.float32)
    p = np.empty((count, 3), dtype=np.float32)
    e = np.empty((count, 3), dtype=np.float32)
    c = np.empty((count, 3), dtype=np.float32)
    refl = np.empty((count,), dtype=np.int32)
    for i in range(count):
        lineno, f = next_line("sphere", 11)
        vals = _floats(lineno, f[:10], f"sphere #{i}")
        try:
            mat = int(f[10])
        except ValueError:
            raise SceneParseError(
                f"line {lineno}: material must be an integer") from None
        if mat not in _MATERIALS:
            raise SceneParseError(f"line {lineno}: bad material {mat} for sphere #{i}")
        rad[i] = vals[0]
        p[i] = vals[1:4]
        e[i] = vals[4:7]
        c[i] = vals[7:10]
        refl[i] = mat

    return orig, target, _scene_from_np(rad, p, e, c, refl)


def _scene_from_np(rad, p, e, c, refl) -> Scene:
    import jax.numpy as jnp

    return Scene(rad=jnp.asarray(rad), p=jnp.asarray(p), e=jnp.asarray(e),
                 c=jnp.asarray(c), refl=jnp.asarray(refl))


def load_scene(path: Union[str, os.PathLike],
               prefer_native: bool = True) -> tuple[np.ndarray, np.ndarray, Scene]:
    with open(path, "r") as f:
        text = f.read()
    if prefer_native:
        try:
            from gpu_bidirectional_raytracer_tpu import native

            parsed = native.scn_parse(text)
        except ValueError as e:
            raise SceneParseError(str(e)) from e
        except Exception:
            parsed = None
        if parsed is not None:
            cam, flat = parsed
            return cam[:3], cam[3:], _scene_from_np(
                flat[:, 0], flat[:, 1:4], flat[:, 4:7], flat[:, 7:10],
                flat[:, 10].astype(np.int32))
    return parse_scene(text)


def scale_world(orig, target, scene: Scene, factor: float):
    """Uniformly scale world geometry: camera orig/target, sphere
    positions, and radii (emission/albedo are per-area quantities the
    direct-light estimator keeps scale-invariant via its r^2/len^2
    ratio, ``device.cu:500``).

    The opt-in escape hatch for normalized-coordinate scenes
    (``assets/scenes/hall_of_mirrors.scn``, ~0.1-unit world): the
    reference's projective camera displaces each ray origin by the
    UNNORMALIZED film direction (~10 units, ``device.cu:596-597``),
    which starts every ray beyond such a scene — black frames are that
    camera's spec-correct output. Scaling the world up (e.g. 100x)
    renders the scene without touching the camera model, so spec stays
    preserved when the flag is off.
    """
    import jax.numpy as jnp

    f = float(factor)
    o = np.asarray(orig, dtype=np.float32) * f
    t = np.asarray(target, dtype=np.float32) * f
    return o, t, scene.replace(rad=scene.rad * jnp.float32(f),
                               p=scene.p * jnp.float32(f))


def write_scene(orig, target, scene: Scene, path_or_file) -> None:
    """Serialize back to ``.scn`` (round-trips through :func:`parse_scene`)."""
    own = isinstance(path_or_file, (str, os.PathLike))
    f = open(path_or_file, "w") if own else path_or_file
    try:
        o = np.asarray(orig, dtype=np.float32)
        t = np.asarray(target, dtype=np.float32)
        f.write("camera %.9g %.9g %.9g  %.9g %.9g %.9g\n" % (*o, *t))
        n = int(np.asarray(scene.rad).shape[0])
        f.write("size %d\n" % n)
        rad = np.asarray(scene.rad)
        p = np.asarray(scene.p)
        e = np.asarray(scene.e)
        c = np.asarray(scene.c)
        refl = np.asarray(scene.refl)
        for i in range(n):
            f.write("sphere %.9g  %.9g %.9g %.9g  %.9g %.9g %.9g  %.9g %.9g %.9g  %d\n" % (
                rad[i], p[i, 0], p[i, 1], p[i, 2],
                e[i, 0], e[i, 1], e[i, 2],
                c[i, 0], c[i, 1], c[i, 2], refl[i]))
    finally:
        if own:
            f.close()


def dumps_scene(orig, target, scene: Scene) -> str:
    buf = io.StringIO()
    write_scene(orig, target, scene, buf)
    return buf.getvalue()
