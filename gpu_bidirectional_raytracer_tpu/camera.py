"""Primary ray generation and camera motion.

Reproduces the reference's projective camera-ray construction
(``device.cu:560-600``) exactly — it is nonstandard (homogeneous divide by
``w = dot(temp, kappa) + 1``) and pinning it down is required for image
parity — plus the interactive camera/scene motions of the GLUT UI
(``display_func.c:278-437``) as pure functions for the optimizer/CLI.

Film-coordinate constants follow the reference host setup
(``smallpt_cpu.c:409-412``): the user-facing width/height are incremented by
one and ``inv_width = 14/width``, ``inv_height = 10.5/height``. Use
:func:`reference_dims` to apply the +1 when pixel-parity with the reference
binary is wanted.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from gpu_bidirectional_raytracer_tpu.core import vecmath as vm
from gpu_bidirectional_raytracer_tpu.core.types import Camera, Rays

FILM_W = 14.0    # smallpt_cpu.c:411
FILM_H = 10.5    # smallpt_cpu.c:412
FILM_KZ = 10.0   # device.cu:567


def reference_dims(width: int, height: int) -> tuple[int, int]:
    """The reference adds one to each axis after arg parsing (smallpt_cpu.c:409-410)."""
    return width + 1, height + 1


def primary_rays(cam: Camera, width: int, height: int,
                 jitter_u: Array, jitter_v: Array,
                 x: Array, y: Array) -> Rays:
    """Build camera rays for pixel coordinates ``(x, y)`` (flat arrays [N]).

    ``y = 0`` is the bottom row (the reference writes PPM rows bottom-up,
    ``smallpt_cpu.c:254``). ``jitter_u/v`` are per-ray uniforms in [0,1).

    Mirrors device.cu:560-600: film coords (kx, ky, kz=10); direction
    ``(kx*x_hat + ky*y_hat + kz*d_hat) / w`` with homogeneous
    ``w = dot(temp, kappa) + 1`` where ``temp = -(x_hat, y_hat, d_hat) . orig``;
    origin is camera.orig displaced by the *unnormalized* direction.
    """
    inv_w = FILM_W / width
    inv_h = FILM_H / height

    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    kx = xf * inv_w - inv_w * width / 2.0 + jitter_u * inv_w
    ky = yf * inv_h - inv_h * height / 2.0 + jitter_v * inv_h
    kz = jnp.full_like(kx, FILM_KZ)

    x_hat = vm.norm(cam.x)
    y_hat = vm.norm(cam.y)
    d_hat = vm.norm(cam.dir)

    rdir = (kx[:, None] * x_hat + ky[:, None] * y_hat + kz[:, None] * d_hat)

    temp = jnp.stack([
        jnp.dot(-x_hat, cam.orig),
        jnp.dot(-y_hat, cam.orig),
        jnp.dot(-d_hat, cam.orig),
    ])
    kappa = jnp.stack([kx, ky, kz], axis=-1)
    w = kappa @ temp + 1.0

    rdir = rdir / w[:, None]
    rorig = cam.orig + rdir
    return Rays(o=rorig, d=vm.norm(rdir))


def pixel_grid(width: int, height: int) -> tuple[Array, Array]:
    """Flat pixel coordinate arrays (x varies fastest, row-major over y)."""
    y, x = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    return x.reshape(-1), y.reshape(-1)


def stratify_jitter(u: Array, v: Array, sample, k: int) -> tuple[Array, Array]:
    """Map uniform jitter into the sample's subpixel stratum.

    Quality upgrade over the reference's independent jitter
    (``device.cu:565-566``): successive samples cycle a k x k stratum grid,
    so each pixel's first k^2 samples cover the pixel area evenly
    (O(1/n) error decay on smooth regions instead of O(1/sqrt n)).
    """
    s = jnp.asarray(sample)
    sx = (s % k).astype(jnp.float32)
    sy = ((s // k) % k).astype(jnp.float32)
    inv = 1.0 / k
    return (sx + u) * inv, (sy + v) * inv


# -- Interactive-UI-equivalent camera motions (display_func.c:278-437) -------

MOVE_STEP = 10.0
ROTATE_STEP = 2.0 * jnp.pi / 180.0


def translate(cam: Camera, axis: str, amount: float,
              width: int, height: int) -> Camera:
    """Translate orig+target along a camera axis: 'x' (a/d), 'dir' (w/s),
    'y_world' (r/f)."""
    if axis == "x":
        d = vm.norm(cam.x) * amount
    elif axis == "dir":
        d = cam.dir * amount
    elif axis == "y_world":
        d = jnp.array([0.0, 1.0, 0.0]) * amount
    else:
        raise ValueError(f"unknown axis {axis!r}")
    return Camera.update(cam.orig + d, cam.target + d, width, height)


def rotate(cam: Camera, axis: str, angle: float,
           width: int, height: int) -> Camera:
    """Rotate target about orig: 'pitch' (up/down arrows), 'yaw' (left/right).

    Matches the component-wise rotation in ``display_func.c:386-424``
    (including its use of the already-updated component — intent preserved,
    formula exact).
    """
    t = cam.target - cam.orig
    c, s = jnp.cos(angle), jnp.sin(angle)
    if axis == "pitch":
        ty = t[1] * c + t[2] * s
        tz = -ty * s + t[2] * c
        t = jnp.array([t[0], ty, tz])
    elif axis == "yaw":
        tx = t[0] * c - t[2] * s
        tz = tx * s + t[2] * c
        t = jnp.array([tx, t[1], tz])
    else:
        raise ValueError(f"unknown axis {axis!r}")
    return Camera.update(cam.orig, cam.orig + t, width, height)
