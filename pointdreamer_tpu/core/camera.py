"""Pinhole camera rig as a JAX pytree, batched over views.

TPU-first re-design of the reference camera stack
(utils/camera_utils.py:86-245: fibonacci_sphere eye layout, per-view kaolin
Camera objects iterated in Python loops).  Here all views live in ONE
`CameraRig` of stacked arrays, so projection of V views x N points is a
single batched matmul — no per-camera Python loop anywhere.

Conventions (self-consistent; differ from kaolin/nvdiffrast only in
image-row direction, which we fix to row 0 = top so no vertical flips are
needed anywhere in the pipeline — the reference instead flips sparse
images before inpainting at ours_utils.py:1040 and flips back at
unproject.py:385):

  - camera space: x = screen-right, y = screen-down, z = view depth
  - NDC: x,y in [-1, 1]; pixel col = (x+1)/2 * res, row = (y+1)/2 * res
  - depth = linear z (distance along the optical axis, world units);
    the reference uses kaolin's nonlinear NDC z (ours_utils.py:137)
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


def fibonacci_sphere(samples: int, radius: float) -> np.ndarray:
    """Golden-angle spiral eye positions (reference camera_utils.py:86-102,
    identical formula so view layouts match the reference)."""
    pts = np.zeros((samples, 3))
    phi = math.pi * (3.0 - math.sqrt(5.0))
    for i in range(samples):
        y = 1.0 - (i / float(samples - 1)) * 2.0
        r_y = math.sqrt(max(0.0, 1.0 - y * y))
        theta = phi * i
        pts[i] = (math.cos(theta) * r_y * radius, y * radius,
                  math.sin(theta) * r_y * radius)
    return pts


def dodecahedron_eyes() -> np.ndarray:
    """20 dodecahedron-vertex eye positions used by the reference 'blender'
    rig (camera_utils.py:131-163), incl. its axis-permutation M."""
    phi = (1 + math.sqrt(5)) / 2.0
    d = [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
         [0, -phi, -1 / phi], [0, -phi, 1 / phi],
         [0, phi, -1 / phi], [0, phi, 1 / phi],
         [-1 / phi, 0, -phi], [-1 / phi, 0, phi],
         [1 / phi, 0, -phi], [1 / phi, 0, phi],
         [-phi, -1 / phi, 0], [-phi, 1 / phi, 0],
         [phi, -1 / phi, 0], [phi, 1 / phi, 0]]
    eyes = np.array(d, dtype=float) * 1.2
    M = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0.0]])
    return eyes @ M.T


def calculate_up_vector(eye: np.ndarray, at: np.ndarray) -> np.ndarray:
    """World-up [0,1,0] unless gaze is parallel to it, then [0,0,1]
    (reference camera_utils.py:104-114)."""
    gaze = at - eye
    world_up = np.array([0.0, 1.0, 0.0])
    if np.allclose(np.cross(gaze, world_up), 0):
        return np.array([0.0, 0.0, 1.0])
    side = np.cross(gaze, world_up)
    up = np.cross(side, gaze)
    return up / np.linalg.norm(up)


class CameraRig(NamedTuple):
    """Batched pinhole cameras. All arrays stacked over the view axis."""

    eyes: jnp.ndarray       # [V, 3] camera centers
    rot: jnp.ndarray        # [V, 3, 3] world->camera rows: right, down, fwd
    base_dirs: jnp.ndarray  # [V, 3] eye - at (object->camera), used for the
                            # normal/view priority (unproject.py:305)
    up_dirs: jnp.ndarray    # [V, 3]
    tan_half_fov: float
    res: int

    @property
    def num_views(self) -> int:
        return self.eyes.shape[0]

    def transform(self, points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project [N,3] world points into all views.

        Returns (ndc [V,N,2] in [-1,1], depth [V,N] linear view-space z).
        Equivalent role to the per-view `cam.transform` loop at
        ours_utils.py:99-110 but one einsum for all views.
        """
        rel = points[None, :, :] - self.eyes[:, None, :]       # [V,N,3]
        cam = jnp.einsum("vij,vnj->vni", self.rot, rel)        # [V,N,3]
        z = cam[..., 2]
        xy = cam[..., :2] / (jnp.maximum(z[..., None], 1e-9) * self.tan_half_fov)
        return xy, z


def make_camera_rig(
    num_views: int = 8,
    distance: float = 1.6,
    res: int = 512,
    fov_deg: float = 45.0,
    distribution: str = "fibonacci_sphere",
) -> CameraRig:
    """Build the camera rig (reference create_cameras, camera_utils.py:116-245)."""
    if distribution == "fibonacci_sphere":
        eyes = fibonacci_sphere(num_views, distance)
    elif distribution in ("blender", "exact_blender"):
        eyes = dodecahedron_eyes()
        num_views = len(eyes)
    elif distribution == "self_defined" and num_views == 6:
        eyes = distance * np.array(
            [[0, 0, -1.0], [0, 0, 1.0], [0, -1.0, 0],
             [0, 1.0, 0], [-1.0, 0, 0], [1.0, 0, 0]]
        )
    else:
        raise ValueError(f"unknown camera distribution {distribution}")

    at = np.zeros(3)
    rots = np.zeros((num_views, 3, 3))
    ups = np.zeros((num_views, 3))
    for i, eye in enumerate(eyes):
        up = calculate_up_vector(eye, at)
        fwd = at - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / np.linalg.norm(right)
        down = np.cross(fwd, right)  # = -up_orthogonal: row 0 of image = top
        rots[i] = np.stack([right, down, fwd], axis=0)
        ups[i] = up

    fov = math.pi * fov_deg / 180.0
    if distribution == "exact_blender":
        fov = 0.8575560450553894  # reference camera_utils.py:222
    return CameraRig(
        eyes=jnp.asarray(eyes, dtype=jnp.float32),
        rot=jnp.asarray(rots, dtype=jnp.float32),
        base_dirs=jnp.asarray(eyes - at[None], dtype=jnp.float32),
        up_dirs=jnp.asarray(ups, dtype=jnp.float32),
        tan_half_fov=float(math.tan(fov / 2.0)),
        res=res,
    )


def ndc_to_pixels(ndc_xy: jnp.ndarray, res: int) -> jnp.ndarray:
    """NDC [-1,1]^2 -> integer pixel (row, col), clipped to the image.

    Matches the reference's pixel convention of (row, col) = swapped (x, y)
    (ours_utils.py:118-121) but with row 0 at the image top.
    """
    pix = (ndc_xy * 0.5 + 0.5) * res
    pix = jnp.clip(pix, 0, res - 1).astype(jnp.int32)
    return jnp.stack([pix[..., 1], pix[..., 0]], axis=-1)
