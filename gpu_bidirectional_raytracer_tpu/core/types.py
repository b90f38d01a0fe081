"""Core pytree types: scene, camera, rays, VPLs, render state, config.

TPU-native re-design of the reference's C structs:

- ``Sphere {rad, p, e, c, refl}`` (``geom.h:25-29``)  ->  :class:`Scene`, a
  structure-of-arrays pytree so intersection/shading vectorize over all
  spheres at once instead of a per-thread linear scan.
- ``Camera {orig, target; dir, x, y}`` (``camera.h:7-12``)  ->  :class:`Camera`.
- ``Ray {o, d}`` (``geom.h:9-11``)  ->  :class:`Rays`, batched SoA.
- ``LightPath {hp, rad, nl}`` (``geom.h:31-35``)  ->  :class:`VplBuffer`.
- The device-resident progressive buffers ``dev_colors``/``dev_counter``
  (``smallpt_cpu.c:187-208``)  ->  :class:`RenderState`, an explicit,
  checkpointable pytree.
- The three config tiers (compile-time macros ``geom.h:15-18``/``cons.h:1-9``,
  argv, runtime keys)  ->  one :class:`IntegratorConfig` dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

from gpu_bidirectional_raytracer_tpu.core import vecmath as vm

# Material codes — match the .scn integer encoding (display_func.c:150-167).
DIFF, SPEC, REFR, LITE = 0, 1, 2, 3

# Reference constants (geom.h:6, geom.h:15-18, cons.h:9, device.cu:621).
EPSILON = 0.01
LIGHT_POINTS = 4096
VPL_DEPTH = 1
MAX_VLP = 1
MAX_ITER = 3
MAX_EYE_DEPTH = 7  # bounce loop runs depths 0..6; "depth > 6" cutoff
TOL = 1e-4


def _pytree(cls):
    """Register a dataclass as a JAX pytree (array fields are leaves)."""
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_pytree
class Scene:
    """Sphere scene as a structure of arrays.

    Fields mirror ``Sphere`` (``geom.h:25-29``) but batched over the sphere
    axis ``S``: ``rad [S]``, ``p [S,3]``, ``e [S,3]``, ``c [S,3]``,
    ``refl [S] int32``. Differentiable parameters are rad/p/e/c; refl is
    discrete and never differentiated.
    """

    rad: Array
    p: Array
    e: Array
    c: Array
    refl: Array

    @property
    def num_spheres(self) -> int:
        return self.rad.shape[0]

    def is_light(self) -> Array:
        """Emitter mask: any nonzero emission channel (``viszero`` test)."""
        return jnp.any(self.e != 0.0, axis=-1)

    @staticmethod
    def from_lists(spheres: list[tuple]) -> "Scene":
        """Build from [(rad, p, e, c, refl), ...] python tuples."""
        rad = jnp.asarray([s[0] for s in spheres], dtype=jnp.float32)
        p = jnp.asarray([s[1] for s in spheres], dtype=jnp.float32)
        e = jnp.asarray([s[2] for s in spheres], dtype=jnp.float32)
        c = jnp.asarray([s[3] for s in spheres], dtype=jnp.float32)
        refl = jnp.asarray([s[4] for s in spheres], dtype=jnp.int32)
        return Scene(rad=rad, p=p, e=e, c=c, refl=refl)

    def replace(self, **kw: Any) -> "Scene":
        return dataclasses.replace(self, **kw)


@_pytree
class Camera:
    """Pinhole-ish camera with derived basis (``camera.h`` + ``display_func.c:177-190``).

    ``orig``/``target`` are the user-level parameters; ``dir``/``x``/``y``
    are derived by :func:`update`: dir = norm(target-orig);
    x = norm(dir x up) * (width*fov/height); y = norm(x x dir) * fov,
    with fov = 45 degrees in radians and up = +Y.
    """

    orig: Array
    target: Array
    dir: Array
    x: Array
    y: Array

    @staticmethod
    def make(orig, target, width: int, height: int, fov_deg: float = 45.0) -> "Camera":
        orig = jnp.asarray(orig, dtype=jnp.float32)
        target = jnp.asarray(target, dtype=jnp.float32)
        return Camera.update(orig, target, width, height, fov_deg)

    @staticmethod
    def update(orig: Array, target: Array, width: int, height: int,
               fov_deg: float = 45.0) -> "Camera":
        """Recompute the derived basis (``UpdateCamera``, display_func.c:177-190)."""
        fov = jnp.float32(jnp.pi / 180.0) * jnp.float32(fov_deg)
        d = vm.norm(target - orig)
        up = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)
        x = vm.norm(jnp.cross(d, up)) * (width * fov / height)
        y = vm.norm(jnp.cross(x, d)) * fov
        return Camera(orig=orig, target=target, dir=d, x=x, y=y)

    def replace(self, **kw: Any) -> "Camera":
        return dataclasses.replace(self, **kw)


@_pytree
class Rays:
    """Batched rays: origin ``o [...,3]``, unit direction ``d [...,3]``."""

    o: Array
    d: Array


@_pytree
class VplBuffer:
    """Virtual point lights deposited by the light pass.

    Mirrors ``LightPath {hp, rad, nl}`` (``geom.h:31-35``) as arrays shaped
    ``[VPL_DEPTH, LIGHT_POINTS, 3]``, plus a validity mask (the reference
    leaves stale/garbage slots in ``dev_lp``; we track them explicitly).
    """

    hp: Array
    rad: Array
    nl: Array
    valid: Array  # [VPL_DEPTH, LIGHT_POINTS] bool
    # Host sphere of each deposit (env VPLs: the emitting light) — the
    # sphere the visibility-gradient endpoint relaxation must EXCLUDE
    # from a gather's soft-occlusion product (its chord entry IS the
    # gather target; see intersect.soft_visibility ``exclude_id``).
    # Optional (None): handmade buffers without ids fall back to the
    # un-excluded product.
    sid: Array | None = None  # [VPL_DEPTH, LIGHT_POINTS] int32

    @staticmethod
    def zeros(depth: int = VPL_DEPTH, n: int = LIGHT_POINTS) -> "VplBuffer":
        z = jnp.zeros((depth, n, 3), dtype=jnp.float32)
        return VplBuffer(hp=z, rad=z, nl=z,
                         valid=jnp.zeros((depth, n), dtype=bool),
                         sid=jnp.zeros((depth, n), dtype=jnp.int32))


@_pytree
class RenderState:
    """Progressive accumulation state — an explicit checkpointable pytree.

    The reference keeps this implicit in device memory across kernel launches
    (``dev_colors``, ``dev_counter``, the ``flag`` machine and ``vlp_index``,
    ``smallpt_cpu.c:36-54, 292-293``). Making it a pytree gives resume,
    replay, and sharding for free.
    """

    colors: Array       # [H, W, 3] running mean radiance
    counter: Array      # [H, W] int32 samples accumulated per pixel
    vpls: VplBuffer
    vlp_index: Array    # scalar int32 — VPL gather window start
    sample: Array       # scalar int32 — progressive pass index
    key: Array          # jax PRNG key


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    """Static integrator configuration (hashable; safe as a jit static arg).

    Pins down the reference's CPU-vs-GPU "spec" divergences explicitly
    (SURVEY.md section "Hard parts"):

    - ``emission_scale``: emitter-hit scale on specular chains. CPU golden
      uses 10 (``geomfunc.h:526``), GPU eye kernel uses 1 (``device.cu:654``),
      CPU direct-lighting uses 1 (``geomfunc.h:699``).
    - ``light_gain``: direct-light sample scale. CPU ``SampleLights``
      multiplies emission by 10 (``geomfunc.h:199``); GPU uses 1
      (``device.cu:498-500``).
    - ``use_vpl`` + ``combine_half``: the GPU gathers VPLs and averages
      (direct + vpl)/2 (``device.cu:507-541``); the CPU path has no VPLs.
    """

    max_depth: int = MAX_EYE_DEPTH
    emission_scale: float = 1.0
    light_gain: float = 1.0
    use_vpl: bool = True
    combine_half: bool = True
    vpl_depth: int = VPL_DEPTH
    max_vlp: int = MAX_VLP
    light_points: int = LIGHT_POINTS
    max_iter: int = MAX_ITER
    throughput_tol: float = TOL
    fov_deg: float = 45.0
    # Per-pixel sample cap: the eye kernel stops accumulating once a pixel
    # has 30000 samples (hardcoded literal, device.cu:607; the kernel arg
    # carrying it is dead).
    max_samples: int = 30000
    # Subpixel jitter stratification (0 = reference-faithful independent
    # jitter; k > 0 cycles a k x k stratum grid across samples).
    stratify: int = 0
    # Visibility-gradient relaxation width (scene units), 0 = off. When
    # > 0, NEE/VPL shadow terms add a zero-primal straight-through
    # visibility carrier: the PRIMAL stays the reference's hard occlusion
    # test (images unchanged up to XLA re-fusion of shared subexpressions,
    # <= 1 ulp observed), but the BACKWARD pass sees a sigmoid of
    # each blocker's discriminant (intersect.soft_visibility), so cast-
    # shadow motion w.r.t. light/occluder position and radius carries
    # gradient — the estimator upgrade over the detached-path gradients
    # documented in diff/gradients.py. ~1-2 scene units works for the
    # 100-unit Cornell-scale scenes.
    vis_grad_tau: float = 0.0
    # Primary-silhouette-gradient relaxation width (scene units), 0 = off.
    # When > 0, the differentiable renderer (diff/gradients.py) adds a
    # zero-primal straight-through coverage carrier at bounce 0: images
    # are unchanged, but the backward pass sees the PRIMARY hit ids'
    # silhouettes move — d pixel = stop(L_fg - L_bg) * d sigmoid(det/width)
    # — closing the argmin-hit-id gradient hole that vis_grad_tau (cast
    # shadows) does not cover. Same units as vis_grad_tau; applied outside
    # the tracer, so it composes with every backend including the pallas
    # adjoint. See diff/gradients.py::_silhouette_carrier.
    sil_grad_tau: float = 0.0
    # How many PERFECT-MIRROR (SPEC) bounces the silhouette carrier
    # follows past the primary hit when ``sil_grad_tau > 0``: at depth k
    # the carrier relaxes the coverage of the k-th reflected ray's argmin
    # hit, tinted by the (stopped) product of mirror albedos, so spheres
    # seen through a CHAIN of mirrors carry coverage gradient too. 1 =
    # the single mirror leg of round 2; the walk stops early on lanes
    # whose hit is not SPEC. Diffuse-bounce (truly indirect) silhouettes
    # remain detached — relaxing them would smear the carrier over the
    # hemisphere integral. Cost: one extra O(S) intersect + carrier leg
    # per added depth, only when sil_grad_tau > 0.
    sil_spec_depth: int = 2
    # Emulate the reference's scheduler defect for parity studies: its VPL
    # gather window slides off the end of ``dev_lp`` into stale memory
    # instead of wrapping (smallpt_cpu.c:292 + device.cu:510-514). With
    # this flag the window index grows without modulo and out-of-range
    # slots are treated as invalid (gather contributes nothing while the
    # (direct+vpl)/2 halving still applies) — the hypothesis for the ~9%
    # brightness offset vs assets/images/path.png (BASELINE.md).
    stale_vpl_window: bool = False

    @staticmethod
    def cpu_golden() -> "IntegratorConfig":
        """Matches the CPU reference path (``geomfunc.h:473-644``)."""
        return IntegratorConfig(emission_scale=10.0, light_gain=10.0,
                                use_vpl=False, combine_half=False)

    @staticmethod
    def gpu() -> "IntegratorConfig":
        """Matches the GPU eye kernel intent (``device.cu:544-791``)."""
        return IntegratorConfig()
