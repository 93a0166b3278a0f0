"""Metric 3D geometry consumers for depth predictions (beyond-parity).

The reference stops at *printing* intrinsics (``example/inference.rs:275-297``);
the natural consumer of ``DepthPrediction.focallength_px`` (Depth Pro,
``depth_pro/mod.rs:330-346``) and DA3's extrinsics / intrinsics / 6-channel
ray aux (``depth_anything3/dpt.rs:227-513``) is unprojection to 3D points.
This module closes that loop: pinhole unprojection, world-space transforms
under the w2c extrinsics convention the camera codec uses
(``camera.rs:235-279`` — extrinsics are ``[.., 3, 4]`` world→camera), generic
ray-based point recovery, and a binary PLY writer for the results.

Conventions
-----------
* Integer pixel ``(u, v)`` samples at its center ``(u + 0.5, v + 0.5)``.
* The principal point defaults to the image center ``(W/2, H/2)``.
* Depth is Z-depth (distance along the camera's +Z axis), matching both
  models' outputs.
* Extrinsics ``E = [R | t]`` map world → camera: ``X_cam = R @ X_world + t``
  (the convention of ``extri_intri_to_pose_encoding``).

The array functions are pure jnp and jit-fusable; the point-cloud extraction
and PLY writer are host-side numpy (they produce ragged, filtered outputs).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# intrinsics
# --------------------------------------------------------------------------


def intrinsics_from_focal(
    focal_px: jnp.ndarray | float,
    height: int,
    width: int,
    focal_y_px: Optional[jnp.ndarray | float] = None,
) -> jnp.ndarray:
    """``[B]`` (or scalar) focal length in pixels → ``[B, 3, 3]`` K.

    Square pixels by default (``fy = fx``), principal point at the image
    center — the assumptions under Depth Pro's single-scalar
    ``focallength_px`` output (``depth_pro/mod.rs:330-346`` derives it from
    one FOV angle).
    """
    fx = jnp.atleast_1d(jnp.asarray(focal_px, dtype=jnp.float32))
    fy = fx if focal_y_px is None else jnp.atleast_1d(jnp.asarray(focal_y_px, jnp.float32))
    fy = jnp.broadcast_to(fy, fx.shape)
    b = fx.shape[0]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    cx = jnp.full_like(fx, width / 2.0)
    cy = jnp.full_like(fx, height / 2.0)
    rows = jnp.stack(
        [
            jnp.stack([fx, zeros, cx], axis=-1),
            jnp.stack([zeros, fy, cy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return rows.reshape(b, 3, 3)


# --------------------------------------------------------------------------
# unprojection / projection
# --------------------------------------------------------------------------


def unproject_depth(depth: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Z-depth map → camera-space points.

    ``depth [B, H, W]`` + ``K [B, 3, 3]`` → ``[B, H, W, 3]`` with
    ``X = (u + 0.5 - cx) / fx * Z``, ``Y = (v + 0.5 - cy) / fy * Z``,
    ``Z = depth``.
    """
    b, h, w = depth.shape
    k = jnp.asarray(intrinsics, jnp.float32).reshape(b, 3, 3)
    u = jnp.arange(w, dtype=jnp.float32) + 0.5
    v = jnp.arange(h, dtype=jnp.float32) + 0.5
    fx = k[:, 0, 0][:, None, None]
    fy = k[:, 1, 1][:, None, None]
    cx = k[:, 0, 2][:, None, None]
    cy = k[:, 1, 2][:, None, None]
    z = depth.astype(jnp.float32)
    x = (u[None, None, :] - cx) / fx * z
    y = (v[None, :, None] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


def project_points(points: jnp.ndarray, intrinsics: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space points ``[B, ..., 3]`` → (pixel coords ``[B, ..., 2]``,
    Z-depth ``[B, ...]``).  Inverse of :func:`unproject_depth` (pixel-center
    convention included, so a roundtrip lands on ``u + 0.5``)."""
    b = points.shape[0]
    k = jnp.asarray(intrinsics, jnp.float32).reshape(b, 3, 3)
    shape_tail = points.shape[1:-1]
    flat = points.reshape(b, -1, 3)
    z = flat[..., 2]
    kexp = k.reshape(b, 1, 3, 3)
    u = kexp[..., 0, 0] * flat[..., 0] / z + kexp[..., 0, 2]
    v = kexp[..., 1, 1] * flat[..., 1] / z + kexp[..., 1, 2]
    uv = jnp.stack([u, v], axis=-1)
    return uv.reshape(b, *shape_tail, 2), z.reshape(b, *shape_tail)


# --------------------------------------------------------------------------
# extrinsics (w2c [..., 3, 4]) transforms
# --------------------------------------------------------------------------


def camera_to_world(points: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Camera-space points ``[B, ..., 3]`` + w2c ``[B, 3, 4]`` → world-space.

    ``X_w = R^T @ (X_c - t)`` — inverts the ``X_c = R @ X_w + t`` convention
    of the DA3 camera codec (``camera.rs:235-279``).
    """
    b = points.shape[0]
    e = jnp.asarray(extrinsics, jnp.float32).reshape(b, 3, 4)
    rot, t = e[:, :, :3], e[:, :, 3]
    shape_tail = points.shape[1:-1]
    flat = points.reshape(b, -1, 3) - t[:, None, :]
    world = jnp.einsum("bij,bni->bnj", rot, flat)  # R^T @ x == x @ R
    return world.reshape(b, *shape_tail, 3)


def world_to_camera(points: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """World-space points ``[B, ..., 3]`` + w2c ``[B, 3, 4]`` → camera-space
    (``X_c = R @ X_w + t``)."""
    b = points.shape[0]
    e = jnp.asarray(extrinsics, jnp.float32).reshape(b, 3, 4)
    rot, t = e[:, :, :3], e[:, :, 3]
    shape_tail = points.shape[1:-1]
    flat = points.reshape(b, -1, 3)
    cam = jnp.einsum("bij,bnj->bni", rot, flat) + t[:, None, :]
    return cam.reshape(b, *shape_tail, 3)


def canonicalize_poses(
    extrinsics: jnp.ndarray, views: int, *, normalize_scale: bool = True, eps: float = 1e-8
) -> jnp.ndarray:
    """Gauge-fix w2c poses per scene: re-express every view in the FIRST
    view's camera frame and (optionally) normalize the scene scale.

    ``extrinsics [N, 3, 4]`` flat (scenes × views contiguous) → same shape
    with, per scene, ``R_i' = R_i R_0ᵀ`` and ``t_i' = t_i − R_i' t_0`` — so
    view 0 becomes the identity pose — then translations divided by the mean
    camera-center norm of the scene (skipped below ``eps``: a static rig
    must not blow up).

    Why: SfM/COLMAP targets carry an arbitrary per-scene world origin,
    orientation, and scale that no network can infer from pixels.  Comparing
    or supervising poses without fixing the gauge measures the dataset's
    coordinate convention, not the model — canonicalize BOTH sides first
    (``train/objectives.da3_multiview_objective``, ``train/metrics
    .pose_metrics(views=...)``).  Pure jnp and differentiable (flows inside
    the pose loss).
    """
    e = jnp.asarray(extrinsics, jnp.float32).reshape(-1, views, 3, 4)
    r0, t0 = e[:, :1, :, :3], e[:, :1, :, 3]  # [B,1,3,3], [B,1,3]
    rot = jnp.einsum("bvij,bwkj->bvik", e[:, :, :, :3], r0)  # R_i R_0^T
    t = e[:, :, :, 3] - jnp.einsum("bvij,bwj->bvi", rot, t0)
    if normalize_scale:
        centers = -jnp.einsum("bvij,bvi->bvj", rot, t)  # -R'^T t'
        # eps-padded sqrt, NOT jnp.linalg.norm: view 0's center is exactly
        # zero by construction and d‖x‖/dx at 0 is NaN — this function sits
        # inside the differentiable pose loss.
        norms = jnp.sqrt(jnp.sum(centers * centers, axis=-1) + eps * eps)
        s = jnp.mean(norms, axis=1, keepdims=True)
        scale = jnp.where(s > eps, s, 1.0)  # static rig: leave unscaled
        t = t / scale[..., None]
    out = jnp.concatenate([rot, t[..., None]], axis=-1)
    return out.reshape(-1, 3, 4)


def points_from_rays(
    origins: jnp.ndarray, directions: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """``origin + t * direction`` with broadcasting over leading dims.

    The generic consumer for ray-parameterized depth.  DA3-small's 6-channel
    aux output (``dpt.rs:441-513`` channel selects 0..6) is a per-pixel ray
    map; split it into two 3-vectors and feed here with the per-pixel range
    ``t``.  The exact upstream channel convention (origin+direction vs
    Plücker) is not pinned by the reference tree — it only re-emits the
    channels — so this utility takes explicit origins/directions rather than
    guessing the split.
    """
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(directions, jnp.float32)
    return o + jnp.asarray(t, jnp.float32)[..., None] * d


def normals_from_depth(depth: jnp.ndarray, intrinsics: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Camera-space surface normals from a Z-depth map.

    ``depth [B, H, W]`` + ``K [B, 3, 3]`` → unit normals ``[B, H, W, 3]``,
    oriented toward the camera (``n · ray <= 0``).  Central differences of
    the unprojected point map; jit-fusable.
    """
    pts = unproject_depth(depth, intrinsics)
    du = jnp.gradient(pts, axis=2)  # along x (columns)
    dv = jnp.gradient(pts, axis=1)  # along y (rows)
    n = jnp.cross(du, dv)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)
    # orient toward the camera: the viewing ray at each pixel is `pts` itself
    flip = jnp.sum(n * pts, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


# --------------------------------------------------------------------------
# host-side point-cloud extraction + PLY
# --------------------------------------------------------------------------


def pointcloud_from_depth(
    depth: np.ndarray,
    focal_px: float,
    rgb: Optional[np.ndarray] = None,
    stride: int = 1,
    max_depth: Optional[float] = None,
    min_depth: float = 0.0,
    focal_y_px: Optional[float] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """``[H, W]`` Z-depth + focal (pixels) → filtered ``[N, 3]`` points
    (+ ``[N, 3]`` u8 colors when ``rgb [H, W, 3]`` is given).

    Host-side: subsamples by ``stride``, drops non-finite depths and depths
    outside ``(min_depth, max_depth]``.  ``focal_y_px`` overrides the
    vertical focal for anisotropic rasters (e.g. a square model raster
    stretched back to the source aspect ratio).
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    depth = np.asarray(depth, np.float32)
    h, w = depth.shape
    if rgb is not None and rgb.shape[:2] != (h, w):
        raise ValueError(f"rgb {rgb.shape[:2]} does not match depth {(h, w)}")
    fy = float(focal_px if focal_y_px is None else focal_y_px)
    d = depth[::stride, ::stride]
    u = (np.arange(0, w, stride, dtype=np.float32) + 0.5 - w / 2.0) / float(focal_px)
    v = (np.arange(0, h, stride, dtype=np.float32) + 0.5 - h / 2.0) / fy
    x = u[None, :] * d
    y = v[:, None] * d
    pts = np.stack([x, y, d], axis=-1).reshape(-1, 3)
    keep = np.isfinite(d).ravel() & (d.ravel() > min_depth)
    if max_depth is not None:
        keep &= d.ravel() <= max_depth
    pts = pts[keep]
    colors = None
    if rgb is not None:
        colors = np.asarray(rgb, np.uint8)[::stride, ::stride].reshape(-1, 3)[keep]
    return pts, colors


def write_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None) -> None:
    """Binary little-endian PLY point cloud (positions f32, colors u8)."""
    points = np.ascontiguousarray(points, np.float32)
    if points.ndim != 2 or points.shape[1] != 3:
        raise ValueError(f"points must be [N, 3], got {points.shape}")
    n = points.shape[0]
    if colors is not None:
        colors = np.ascontiguousarray(colors, np.uint8)
        if colors.shape != (n, 3):
            raise ValueError(f"colors must be [{n}, 3], got {colors.shape}")
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {ax}" for ax in "xyz"]
    if colors is not None:
        header += [f"property uchar {c}" for c in ("red", "green", "blue")]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if colors is None:
            f.write(points.tobytes())
        else:
            row = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            buf = np.empty(n, dtype=row)
            buf["xyz"] = points
            buf["rgb"] = colors
            f.write(buf.tobytes())


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read back a point cloud written by :func:`write_ply` (used by tests
    and downstream tooling; handles exactly that layout)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(h.split()[-1]) for h in header if h.startswith("element vertex"))
        has_color = any("uchar red" in h for h in header)
        if has_color:
            row = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            buf = np.frombuffer(f.read(row.itemsize * n), dtype=row)
            return buf["xyz"].copy(), buf["rgb"].copy()
        pts = np.frombuffer(f.read(12 * n), dtype=np.float32).reshape(n, 3)
        return pts.copy(), None
