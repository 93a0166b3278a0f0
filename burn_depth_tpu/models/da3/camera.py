"""DA3 camera pose encoder/decoder and pose-encoding geometry.

Reference: ``src/model/depth_anything3/camera.rs``.  The 9-D pose encoding is
``[t(3), quat(4), fov_h, fov_w]``.

Divergence from the reference, by design (SURVEY.md §7 step 3): the reference
approximates ``atan`` with a 0.2447/0.0663 polynomial
(``approx_atan_positive``, ``camera.rs:515-536``) only because Burn lacked a
native atan — XLA has an exact ``atan``; we use it.  The polynomial is ~1e-3
rad accurate, so exact atan stays inside every reported tolerance.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from burn_depth_tpu.ops.activations import gelu, relu
from burn_depth_tpu.ops.linear import linear
from burn_depth_tpu.ops.norm import layer_norm


@dataclasses.dataclass(frozen=True)
class CameraEncoderConfig:
    """Reference ``CameraEncoderConfig`` (``camera.rs:13-37``)."""

    dim_out: int = 1024
    dim_in: int = 9
    trunk_depth: int = 4
    target_dim: int = 9
    num_heads: int = 16
    mlp_ratio: int = 4
    init_values: float = 0.01


@dataclasses.dataclass(frozen=True)
class CameraDecoderConfig:
    """Reference ``CameraDecoderConfig`` (``camera.rs:39-48``)."""

    dim_in: int = 1536


@dataclasses.dataclass
class CameraPrediction:
    pose_encoding: jnp.ndarray  # [B, V, 9]
    extrinsics: jnp.ndarray  # [B, V, 3, 4]
    intrinsics: jnp.ndarray  # [B, V, 3, 3]


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def _linear_init(key, out_d, in_d, dtype):
    bound = (1.0 / in_d) ** 0.5
    k1, k2 = jax.random.split(key)
    return {
        "weight": jax.random.uniform(k1, (out_d, in_d), minval=-bound, maxval=bound).astype(dtype),
        "bias": jax.random.uniform(k2, (out_d,), minval=-bound, maxval=bound).astype(dtype),
    }


def init_camera_encoder(rng: jax.Array, cfg: CameraEncoderConfig, dtype=jnp.float32) -> dict:
    from burn_depth_tpu.vit.dinov2 import DinoViTConfig, init_dinov2

    keys = jax.random.split(rng, 4)
    d = cfg.dim_out
    trunk_cfg = _trunk_cfg(cfg)
    trunk = init_dinov2(keys[2], dataclasses.replace(trunk_cfg, depth=cfg.trunk_depth), dtype)["blocks"]
    return {
        "pose_branch": {
            "fc1": _linear_init(keys[0], d // 2, cfg.dim_in, dtype),
            "fc2": _linear_init(keys[1], d, d // 2, dtype),
        },
        "trunk": trunk,
        "token_norm": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "trunk_norm": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def _trunk_cfg(cfg: CameraEncoderConfig):
    from burn_depth_tpu.vit.dinov2 import DinoViTConfig

    # The trunk reuses DINO blocks (camera.rs:62-78); img/patch are unused.
    return DinoViTConfig(
        img_size=14,
        patch_size=14,
        embed_dim=cfg.dim_out,
        depth=cfg.trunk_depth,
        num_heads=cfg.num_heads,
        mlp_ratio=float(cfg.mlp_ratio),
    )


def init_camera_decoder(rng: jax.Array, cfg: CameraDecoderConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 5)
    d = cfg.dim_in
    return {
        "backbone_1": _linear_init(keys[0], d, d, dtype),
        "backbone_2": _linear_init(keys[1], d, d, dtype),
        "fc_t": _linear_init(keys[2], 3, d, dtype),
        "fc_qvec": _linear_init(keys[3], 4, d, dtype),
        "fc_fov": _linear_init(keys[4], 2, d, dtype),
    }


# --------------------------------------------------------------------------
# geometry (camera.rs:235-513)
# --------------------------------------------------------------------------


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """``[..., 4] (x,y,z,w) → [..., 3, 3]`` (``camera.rs:362-416``)."""
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quaternion(rot: jnp.ndarray) -> jnp.ndarray:
    """``[..., 3, 3] → [..., 4]`` via the branchless 4-case mask blend the
    reference uses (``camera.rs:418-513``), including its eps placement."""
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    eps = 1e-6
    trace = m00 + m11 + m22

    s_t = jnp.sqrt(jnp.maximum(trace + 1.0, 1e-6)) * 2.0
    quat_t = jnp.stack([(m21 - m12) / s_t, (m02 - m20) / s_t, (m10 - m01) / s_t, 0.25 * s_t], axis=-1)

    s_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-6)) * 2.0
    quat_x = jnp.stack(
        [0.25 * s_x, (m01 + m10) / (s_x + eps), (m02 + m20) / (s_x + eps), (m21 - m12) / (s_x + eps)],
        axis=-1,
    )

    s_y = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-6)) * 2.0
    quat_y = jnp.stack(
        [(m01 + m10) / (s_y + eps), 0.25 * s_y, (m12 + m21) / (s_y + eps), (m02 - m20) / (s_y + eps)],
        axis=-1,
    )

    s_z = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-6)) * 2.0
    quat_z = jnp.stack(
        [(m02 + m20) / (s_z + eps), (m12 + m21) / (s_z + eps), 0.25 * s_z, (m10 - m01) / (s_z + eps)],
        axis=-1,
    )

    mask_t = (trace > 0.0).astype(rot.dtype)
    cond_x = ((m00 > m11) & (m00 > m22)).astype(rot.dtype)
    mask_x = (1.0 - mask_t) * cond_x
    cond_y = (m11 > m22).astype(rot.dtype)
    mask_y = (1.0 - mask_t - mask_x) * cond_y
    mask_z = 1.0 - mask_t - mask_x - mask_y
    return (
        quat_t * mask_t[..., None]
        + quat_x * mask_x[..., None]
        + quat_y * mask_y[..., None]
        + quat_z * mask_z[..., None]
    )


def extri_intri_to_pose_encoding(
    extrinsics: jnp.ndarray, intrinsics: jnp.ndarray, image_height: int, image_width: int
) -> jnp.ndarray:
    """``[B,V,3,4] w2c + [B,V,3,3] K → [B,V,9]`` (``camera.rs:235-279``)."""
    b, v = extrinsics.shape[:2]
    w2c = extrinsics.reshape(b * v, 3, 4)
    rot = w2c[:, :, :3]
    trans = w2c[:, :, 3:4]
    c2w_rot = rot.swapaxes(-1, -2)
    c2w_t = (-(c2w_rot @ trans))[..., 0]
    quat = matrix_to_quaternion(c2w_rot)
    k = intrinsics.reshape(b * v, 3, 3)
    fx, fy = k[:, 0, 0], k[:, 1, 1]
    fov_w = jnp.arctan((image_width / 2.0) / fx) * 2.0
    fov_h = jnp.arctan((image_height / 2.0) / fy) * 2.0
    enc = jnp.concatenate([c2w_t, quat, fov_h[:, None], fov_w[:, None]], axis=-1)
    return enc.reshape(b, v, 9)


def pose_encoding_to_extri_intri(
    pose: jnp.ndarray, image_height: int, image_width: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``[B,V,9] → ([B,V,3,4] w2c, [B,V,3,3] K)`` (``camera.rs:281-356``)."""
    b, v = pose.shape[:2]
    flat = pose.reshape(b * v, 9)
    t = flat[:, :3][..., None]  # [BV,3,1] camera-to-world translation
    quat = flat[:, 3:7]
    fov_h, fov_w = flat[:, 7], flat[:, 8]
    rot = quaternion_to_matrix(quat)
    rot_t = rot.swapaxes(-1, -2)
    t_w2c = -(rot_t @ t)
    extr = jnp.concatenate([rot_t, t_w2c], axis=-1).reshape(b, v, 3, 4)

    # tan via sin/cos like the reference (camera.rs:311-312)
    tan_h = jnp.sin(fov_h * 0.5) / jnp.cos(fov_h * 0.5)
    tan_w = jnp.sin(fov_w * 0.5) / jnp.cos(fov_w * 0.5)
    fy = (image_height / 2.0) / tan_h
    fx = (image_width / 2.0) / tan_w
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    half_w = jnp.full_like(fx, image_width / 2.0)
    half_h = jnp.full_like(fx, image_height / 2.0)
    k = jnp.stack(
        [
            jnp.stack([fx, zeros, half_w], axis=-1),
            jnp.stack([zeros, fy, half_h], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    ).reshape(b, v, 3, 3)
    return extr, k


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def camera_encoder_forward(
    params: dict,
    cfg: CameraEncoderConfig,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_height: int,
    image_width: int,
) -> jnp.ndarray:
    """``CameraEncoder::forward`` (``camera.rs:89-110``) → ``[B, dim_out]``."""
    from burn_depth_tpu.vit.dinov2 import _block_forward

    pose = extri_intri_to_pose_encoding(extrinsics, intrinsics, image_height, image_width)
    pb = params["pose_branch"]
    tokens = linear(gelu(linear(pose, pb["fc1"]["weight"], pb["fc1"]["bias"])), pb["fc2"]["weight"], pb["fc2"]["bias"])
    tokens = layer_norm(tokens, params["token_norm"]["weight"], params["token_norm"]["bias"])
    trunk_cfg = _trunk_cfg(cfg)
    for i, bp in enumerate(params["trunk"]):
        tokens = _block_forward(bp, tokens, trunk_cfg, i, None, 0, "jnp")
    tokens = layer_norm(tokens, params["trunk_norm"]["weight"], params["trunk_norm"]["bias"])
    return jnp.mean(tokens, axis=1)


def camera_decoder_forward(
    params: dict,
    features: jnp.ndarray,  # [B, V, dim_in]
    image_height: int,
    image_width: int,
) -> CameraPrediction:
    """``CameraDecoder::forward`` (``camera.rs:143-198``), no camera-encoding
    override path (the reference always calls it with ``None``)."""
    b, v, c = features.shape
    h = features.reshape(b * v, c)
    h = relu(linear(h, params["backbone_1"]["weight"], params["backbone_1"]["bias"]))
    h = relu(linear(h, params["backbone_2"]["weight"], params["backbone_2"]["bias"]))
    t = linear(h, params["fc_t"]["weight"], params["fc_t"]["bias"])
    quat = linear(h, params["fc_qvec"]["weight"], params["fc_qvec"]["bias"])
    fov = relu(linear(h, params["fc_fov"]["weight"], params["fc_fov"]["bias"]))
    pose = jnp.concatenate([t, quat, fov], axis=-1).reshape(b, v, 9)
    extr, intr = pose_encoding_to_extri_intri(pose, image_height, image_width)
    return CameraPrediction(pose_encoding=pose, extrinsics=extr, intrinsics=intr)
