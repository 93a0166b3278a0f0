"""Tests for the 3D geometry consumers (``api/geometry.py``): pinhole
unproject/project roundtrips, w2c extrinsics transforms matching the DA3
camera codec convention (``camera.rs:235-279``), ray-based points, host-side
point-cloud extraction, and the PLY writer."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_depth_tpu.api.geometry import (
    camera_to_world,
    intrinsics_from_focal,
    pointcloud_from_depth,
    points_from_rays,
    project_points,
    read_ply,
    unproject_depth,
    world_to_camera,
    write_ply,
)


def test_intrinsics_from_focal_layout():
    k = np.asarray(intrinsics_from_focal(jnp.asarray([100.0, 50.0]), height=48, width=64))
    assert k.shape == (2, 3, 3)
    np.testing.assert_allclose(k[0], [[100, 0, 32], [0, 100, 24], [0, 0, 1]])
    np.testing.assert_allclose(k[1, 0, 0], 50.0)
    k_aniso = np.asarray(intrinsics_from_focal(10.0, 4, 4, focal_y_px=20.0))
    assert k_aniso[0, 0, 0] == 10.0 and k_aniso[0, 1, 1] == 20.0


def test_unproject_project_roundtrip():
    rng = np.random.default_rng(0)
    b, h, w = 2, 5, 7
    depth = jnp.asarray(rng.uniform(0.5, 5.0, (b, h, w)).astype(np.float32))
    k = intrinsics_from_focal(jnp.asarray([11.0, 23.0]), h, w)
    pts = unproject_depth(depth, k)
    assert pts.shape == (b, h, w, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(depth))
    uv, z = project_points(pts, k)
    exp_u = np.arange(w) + 0.5
    exp_v = np.arange(h) + 0.5
    np.testing.assert_allclose(np.asarray(uv[..., 0]), np.broadcast_to(exp_u, (b, h, w)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), np.broadcast_to(exp_v[:, None], (b, h, w)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth))
    # the center pixel's ray passes through the principal point: X == Y == 0
    # only when (u+0.5) == cx, i.e. fractional for odd dims; check sign flip
    # across the center column instead.
    assert np.all(np.asarray(pts[:, :, 0, 0]) < 0) and np.all(np.asarray(pts[:, :, -1, 0]) > 0)


def _random_w2c(rng, b):
    """Random valid w2c extrinsics via the DA3 quaternion codec."""
    from burn_depth_tpu.models.da3.camera import quaternion_to_matrix

    quat = rng.normal(size=(b, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(quat)))
    t = rng.normal(size=(b, 3, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([rot, t], axis=-1))


def test_world_camera_roundtrip_and_convention():
    rng = np.random.default_rng(1)
    b = 3
    extr = _random_w2c(rng, b)
    pts_w = jnp.asarray(rng.normal(size=(b, 4, 5, 3)).astype(np.float32))
    cam = world_to_camera(pts_w, extr)
    # explicit convention check: X_c = R @ X_w + t
    e = np.asarray(extr)
    manual = np.einsum("bij,bnj->bni", e[:, :, :3], np.asarray(pts_w).reshape(b, -1, 3)) + e[:, :, 3][:, None]
    np.testing.assert_allclose(np.asarray(cam).reshape(b, -1, 3), manual, rtol=1e-5, atol=1e-5)
    back = camera_to_world(cam, extr)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts_w), rtol=1e-4, atol=1e-5)


def test_points_from_rays_broadcasts():
    rng = np.random.default_rng(2)
    o = rng.normal(size=(2, 3, 3)).astype(np.float32)
    d = rng.normal(size=(2, 3, 3)).astype(np.float32)
    t = rng.uniform(0.1, 2.0, size=(2, 3)).astype(np.float32)
    got = np.asarray(points_from_rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(t)))
    np.testing.assert_allclose(got, o + t[..., None] * d, rtol=1e-6)


def test_pointcloud_matches_unproject_and_filters():
    rng = np.random.default_rng(3)
    h, w, f = 6, 8, 9.5
    depth = rng.uniform(1.0, 4.0, (h, w)).astype(np.float32)
    pts, colors = pointcloud_from_depth(depth, f, stride=1)
    assert colors is None
    ref = np.asarray(unproject_depth(jnp.asarray(depth[None]), intrinsics_from_focal(f, h, w)))
    np.testing.assert_allclose(pts, ref.reshape(-1, 3), rtol=1e-5, atol=1e-6)

    # filtering: one inf, one beyond max_depth, one zero
    depth2 = depth.copy()
    depth2[0, 0] = np.inf
    depth2[1, 1] = 100.0
    depth2[2, 2] = 0.0
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    pts2, colors2 = pointcloud_from_depth(depth2, f, rgb=rgb, max_depth=10.0)
    assert pts2.shape[0] == h * w - 3
    assert colors2.shape == (h * w - 3, 3)
    # colors stay aligned: the first surviving pixel is (0, 1)
    np.testing.assert_array_equal(colors2[0], rgb[0, 1])

    # stride subsampling
    pts3, _ = pointcloud_from_depth(depth, f, stride=2)
    assert pts3.shape[0] == ((h + 1) // 2) * ((w + 1) // 2)

    # anisotropic focal: Y uses focal_y_px, X keeps focal_px
    pts4, _ = pointcloud_from_depth(depth, f, focal_y_px=2 * f)
    np.testing.assert_allclose(pts4[:, 0], pts[:, 0], rtol=1e-6)
    np.testing.assert_allclose(pts4[:, 1], pts[:, 1] / 2.0, rtol=1e-6)

    with pytest.raises(ValueError):
        pointcloud_from_depth(depth, f, stride=0)
    with pytest.raises(ValueError):
        pointcloud_from_depth(depth, f, rgb=rgb[:-1])


def test_normals_from_depth_flat_and_tilted_plane():
    from burn_depth_tpu.api.geometry import normals_from_depth

    h, w, f = 10, 12, 20.0
    k = intrinsics_from_focal(f, h, w)

    flat = jnp.full((1, h, w), 3.0)
    n = np.asarray(normals_from_depth(flat, k))
    np.testing.assert_allclose(n, np.broadcast_to([0.0, 0.0, -1.0], n.shape), atol=1e-6)

    # plane n·P = d: depth Z(u,v) = d / (nx·(u+0.5-cx)/f + ny·(v+0.5-cy)/f + nz)
    plane_n = np.array([0.3, -0.2, 0.933], np.float32)
    plane_n /= np.linalg.norm(plane_n)
    d = 5.0
    u = (np.arange(w) + 0.5 - w / 2.0) / f
    v = (np.arange(h) + 0.5 - h / 2.0) / f
    denom = plane_n[0] * u[None, :] + plane_n[1] * v[:, None] + plane_n[2]
    depth = (d / denom).astype(np.float32)[None]
    got = np.asarray(normals_from_depth(jnp.asarray(depth), k))
    # oriented toward the camera: n·ray <= 0, so the recovered normal is -plane_n
    np.testing.assert_allclose(got, np.broadcast_to(-plane_n, got.shape), atol=1e-4)


def test_colormaps():
    from burn_depth_tpu.utils.colormap import apply_colormap, grayscale, turbo

    x = np.linspace(0, 1, 7)
    g = grayscale(x)
    assert g.shape == (7, 3) and g[0, 0] == 0 and g[-1, 0] == 255
    assert np.all(g[:, 0] == g[:, 1]) and np.all(g[:, 1] == g[:, 2])

    t = turbo(x)
    assert t.shape == (7, 3) and t.dtype == np.uint8
    # turbo ramps blue-dominant → red-dominant (the polynomial approximation
    # is loose at the exact endpoints, so probe at 0.1 / 0.9)
    lo, hi = turbo(np.array([0.1]))[0], turbo(np.array([0.9]))[0]
    assert lo[2] > lo[0] and hi[0] > hi[2]
    # out-of-range inputs clamp rather than wrap
    np.testing.assert_array_equal(turbo(np.array([-1.0])), turbo(np.array([0.0])))

    with pytest.raises(KeyError):
        apply_colormap(x, "nope")
    np.testing.assert_array_equal(apply_colormap(x, "turbo"), t)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    colors = rng.integers(0, 256, (17, 3), dtype=np.uint8)

    p1 = str(tmp_path / "plain.ply")
    write_ply(p1, pts)
    got, c = read_ply(p1)
    np.testing.assert_array_equal(got, pts)
    assert c is None

    p2 = str(tmp_path / "colored.ply")
    write_ply(p2, pts, colors)
    got2, c2 = read_ply(p2)
    np.testing.assert_array_equal(got2, pts)
    np.testing.assert_array_equal(c2, colors)

    with pytest.raises(ValueError):
        write_ply(p1, pts[:, :2])
    with pytest.raises(ValueError):
        write_ply(p1, pts, colors[:-1])


def test_infer_cli_pointcloud(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    from PIL import Image

    from burn_depth_tpu.cli.infer import main as infer_main
    from burn_depth_tpu.io import save_checkpoint
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    tiny_small = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    tiny_large = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), tiny_small)
    ckpt = str(tmp_path / "da3_small.safetensors")
    save_checkpoint(ckpt, model.params)
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: tiny_large))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: tiny_small))

    img_path = str(tmp_path / "in.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)).save(img_path)

    ply_path = str(tmp_path / "cloud.ply")
    npy_path = str(tmp_path / "d.npy")
    normals_path = str(tmp_path / "n.png")
    rc = infer_main(
        [
            "--model", "depth-anything-3", "--checkpoint", ckpt, "--image", img_path,
            "--output", str(tmp_path / "d.png"), "--colormap", "turbo",
            "--save-npy", npy_path, "--normals", normals_path,
            "--pointcloud", ply_path, "--focal-px", "55.0", "--pc-stride", "2",
        ]
    )
    assert rc == 0 and os.path.exists(ply_path)
    pts, colors = read_ply(ply_path)
    assert pts.shape[1] == 3 and colors is not None and colors.shape == pts.shape
    assert pts.shape[0] > 0
    raw = np.load(npy_path)
    assert raw.shape == (40, 64) and raw.dtype == np.float32 and np.isfinite(raw).all()
    depth_png = np.asarray(Image.open(tmp_path / "d.png"))
    assert depth_png.shape == (40, 64, 3)  # turbo colormap writes RGB
    normals_png = np.asarray(Image.open(normals_path))
    assert normals_png.shape == (40, 64, 3)

    # DA3-small predicts intrinsics: --pointcloud works without --focal-px
    rc2 = infer_main(
        [
            "--model", "depth-anything-3", "--checkpoint", ckpt, "--image", img_path,
            "--output", str(tmp_path / "d2.png"), "--pointcloud", str(tmp_path / "c2.ply"),
        ]
    )
    assert rc2 == 0 and os.path.exists(tmp_path / "c2.ply")

    # DA3 metric-large (mono head, no camera decoder) predicts no focal:
    # without --focal-px the CLI must fail loudly
    model_l = DepthAnything3.init(jax.random.PRNGKey(1), tiny_large)
    ckpt_l = str(tmp_path / "da3_metric_large.safetensors")
    save_checkpoint(ckpt_l, model_l.params)
    rc3 = infer_main(
        [
            "--model", "depth-anything-3", "--checkpoint", ckpt_l, "--image", img_path,
            "--output", str(tmp_path / "d3.png"), "--pointcloud", str(tmp_path / "c3.ply"),
        ]
    )
    assert rc3 == 1
