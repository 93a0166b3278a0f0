"""DINOv2 ViT parity vs a PyTorch oracle built in-test.

Mirrors the reference's golden-dump bisection idiom (SURVEY.md §3.4): the
torch model is the upstream-DINOv2 block structure written independently here;
random weights are shared between frameworks and outputs diffed hard.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from burn_depth_tpu.vit import DinoViTConfig, dinov2_forward, init_dinov2

CFG = DinoViTConfig.vits(img_size=28, patch_size=14, depth=2, ln_eps=1e-6)


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# torch oracle (upstream DINOv2 semantics, written from the paper/impl spec)
# ---------------------------------------------------------------------------


class TorchDinoBlock(torch.nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, ls_init=1e-5, eps=1e-6, qk_norm=False):
        super().__init__()
        self.heads = heads
        self.norm1 = torch.nn.LayerNorm(dim, eps=eps)
        self.qkv = torch.nn.Linear(dim, 3 * dim)
        self.proj = torch.nn.Linear(dim, dim)
        self.ls1 = torch.nn.Parameter(torch.full((dim,), ls_init))
        self.norm2 = torch.nn.LayerNorm(dim, eps=eps)
        hidden = int(dim * mlp_ratio)
        self.fc1 = torch.nn.Linear(dim, hidden)
        self.fc2 = torch.nn.Linear(hidden, dim)
        self.ls2 = torch.nn.Parameter(torch.full((dim,), ls_init))
        hd = dim // heads
        self.q_norm = torch.nn.LayerNorm(hd, eps=eps) if qk_norm else None
        self.k_norm = torch.nn.LayerNorm(hd, eps=eps) if qk_norm else None

    def forward(self, x):
        b, t, d = x.shape
        h = self.heads
        hd = d // h
        y = self.norm1(x)
        qkv = self.qkv(y).reshape(b, t, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.q_norm is not None:
            q = self.q_norm(q)
            k = self.k_norm(k)
        attn = (q @ k.transpose(-2, -1)) * (hd**-0.5)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, d)
        x = x + self.ls1 * self.proj(out)
        y = self.norm2(x)
        y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x + self.ls2 * y


def _copy_block_params(tblock: TorchDinoBlock, jblock: dict):
    sd = {
        "norm1.weight": jblock["norm1"]["weight"],
        "norm1.bias": jblock["norm1"]["bias"],
        "qkv.weight": jblock["attn"]["qkv"]["weight"],
        "qkv.bias": jblock["attn"]["qkv"]["bias"],
        "proj.weight": jblock["attn"]["proj"]["weight"],
        "proj.bias": jblock["attn"]["proj"]["bias"],
        "ls1": jblock["ls1"]["gamma"],
        "norm2.weight": jblock["norm2"]["weight"],
        "norm2.bias": jblock["norm2"]["bias"],
        "fc1.weight": jblock["mlp"]["fc1"]["weight"],
        "fc1.bias": jblock["mlp"]["fc1"]["bias"],
        "fc2.weight": jblock["mlp"]["fc2"]["weight"],
        "fc2.bias": jblock["mlp"]["fc2"]["bias"],
        "ls2": jblock["ls2"]["gamma"],
    }
    if "q_norm" in jblock["attn"]:
        sd["q_norm.weight"] = jblock["attn"]["q_norm"]["weight"]
        sd["q_norm.bias"] = jblock["attn"]["q_norm"]["bias"]
        sd["k_norm.weight"] = jblock["attn"]["k_norm"]["weight"]
        sd["k_norm.bias"] = jblock["attn"]["k_norm"]["bias"]
    tblock.load_state_dict({k: torch.from_numpy(_np(v)).clone() for k, v in sd.items()})


class TorchDinoViT(torch.nn.Module):
    """Minimal DINOv2: patch embed + cls + pos + pre-norm blocks + final norm."""

    def __init__(self, cfg: DinoViTConfig):
        super().__init__()
        self.cfg = cfg
        self.patch = torch.nn.Conv2d(3, cfg.embed_dim, cfg.patch_size, cfg.patch_size)
        self.cls_token = torch.nn.Parameter(torch.zeros(1, 1, cfg.embed_dim))
        self.pos_embed = torch.nn.Parameter(torch.zeros(1, 1 + cfg.num_patches, cfg.embed_dim))
        self.blocks = torch.nn.ModuleList(
            [
                TorchDinoBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, cfg.layerscale_init, cfg.ln_eps)
                for _ in range(cfg.depth)
            ]
        )
        self.norm = torch.nn.LayerNorm(cfg.embed_dim, eps=cfg.ln_eps)

    def forward(self, x, hook_ids=()):
        b = x.shape[0]
        t = self.patch(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        t = t + self.pos_embed
        hooks = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in hook_ids:
                hooks.append(t)
        n = self.norm(t)
        return n[:, 0], n[:, 1:], hooks


def test_vit_matches_torch_oracle():
    params = init_dinov2(jax.random.PRNGKey(0), CFG)
    tmodel = TorchDinoViT(CFG)
    with torch.no_grad():
        tmodel.patch.weight.copy_(torch.from_numpy(_np(params["patch_embed"]["proj"]["weight"])))
        tmodel.patch.bias.copy_(torch.from_numpy(_np(params["patch_embed"]["proj"]["bias"])))
        tmodel.cls_token.copy_(torch.from_numpy(_np(params["cls_token"])))
        tmodel.pos_embed.copy_(torch.from_numpy(_np(params["pos_embed"])))
    for i in range(CFG.depth):
        _copy_block_params(tmodel.blocks[i], params["blocks"][i])
    with torch.no_grad():
        tmodel.norm.weight.copy_(torch.from_numpy(_np(params["norm"]["weight"])))
        tmodel.norm.bias.copy_(torch.from_numpy(_np(params["norm"]["bias"])))

    x = np.random.default_rng(3).standard_normal((2, 3, 28, 28)).astype(np.float32)
    ours = dinov2_forward(params, x, CFG, hook_ids=[0, 1])
    with torch.no_grad():
        cls_t, patches_t, hooks_t = tmodel(torch.from_numpy(x), hook_ids=[0, 1])

    np.testing.assert_allclose(_np(ours.x_norm_clstoken), cls_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(_np(ours.x_norm_patchtokens), patches_t.numpy(), atol=2e-5, rtol=1e-4)
    for ih, th in zip(ours.hooks, hooks_t):
        np.testing.assert_allclose(_np(ih.tokens), th.numpy(), atol=2e-5, rtol=1e-4)
        # patches view drops the cls token
        np.testing.assert_allclose(_np(ih.patches), th.numpy()[:, 1:], atol=2e-5, rtol=1e-4)


def test_vit_token_count_invariant():
    # Reference vit.rs:76-96: patch token count == grid².
    params = init_dinov2(jax.random.PRNGKey(1), CFG)
    x = np.ones((1, 3, 28, 28), np.float32)
    out = dinov2_forward(params, x, CFG)
    assert out.x_norm_patchtokens.shape == (1, 4, CFG.embed_dim)


def test_vit_da3_small_variant_shapes():
    cfg = DinoViTConfig.vits(img_size=28, patch_size=14, depth=6).da3_small_variant()
    params = init_dinov2(jax.random.PRNGKey(2), cfg)
    x = np.ones((1, 3, 28, 28), np.float32)
    out = dinov2_forward(params, x, cfg, hook_ids=[1, 5])
    # cat_token doubles the hook feature dim; camera token is carried per hook.
    assert out.hooks[0].patches.shape == (1, 4, 2 * cfg.embed_dim)
    assert out.hooks[1].patches.shape == (1, 4, 2 * cfg.embed_dim)
    assert out.hooks[1].camera.shape == (1, 2 * cfg.embed_dim)
    assert out.x_norm_patchtokens.shape == (1, 4, cfg.embed_dim)
    # block 5 has qk-norm params, block 1 does not
    assert "q_norm" in params["blocks"][5]["attn"]
    assert "q_norm" not in params["blocks"][1]["attn"]


def test_pos_embed_interpolation_changes_grid():
    cfg = DinoViTConfig.vits(img_size=28, patch_size=14, depth=1)
    params = init_dinov2(jax.random.PRNGKey(4), cfg)
    x = np.ones((1, 3, 56, 42), np.float32)  # 4x3 grid vs 2x2 checkpoint grid
    out = dinov2_forward(params, x, cfg)
    assert out.x_norm_patchtokens.shape == (1, 12, cfg.embed_dim)


def test_rope_convention_matches_dinov3_oracle():
    """VERDICT weak-#4: pin the RoPE rotation convention and frequency
    schedule against a public torch oracle (transformers' DINOv3 ViT, the
    published rotate-half axial-2D formulation).  Our ``_apply_rope`` on
    ``[B,H,T,hd]`` with prefix passthrough must equal
    ``dinov3_vit.apply_rotary_pos_emb`` given the same angles; and our
    per-axis frequency schedule must equal DINOv3's
    ``base**(-arange(0,1,4/hd))`` up to the coordinate parameterization
    (we use integer patch indices; upstream DA3's exact coordinate scale
    remains unverifiable offline — documented in PARITY.md)."""
    from transformers.models.dinov3_vit.modeling_dinov3_vit import apply_rotary_pos_emb

    from burn_depth_tpu.vit.dinov2 import _apply_rope, _rope_angles

    cfg = DinoViTConfig.vits(img_size=56, patch_size=14, depth=1).da3_small_variant()
    gh = gw = 56 // 14
    hd = cfg.head_dim
    angles = _rope_angles(cfg, gh, gw)  # [N, hd//2]
    assert angles.shape == (gh * gw, hd // 2)

    # frequency schedule == DINOv3's inv_freq (theirs: base**-arange(0,1,4/hd))
    inv_freq_dinov3 = cfg.rope_base ** -np.arange(0, 1, 4 / hd)
    # row 1 = (y=0, x=1): x-angles live in the SECOND half-block and equal inv_freq
    np.testing.assert_allclose(angles[1, hd // 4 :], inv_freq_dinov3, rtol=1e-6)
    np.testing.assert_allclose(angles[1, : hd // 4], 0.0, atol=0)  # y=0
    # row gw = (y=1, x=0): y-angles in the first half-block
    np.testing.assert_allclose(angles[gw, : hd // 4], inv_freq_dinov3, rtol=1e-6)

    rng = np.random.default_rng(0)
    b, h, n_prefix = 2, cfg.num_heads, 2
    t = n_prefix + gh * gw
    q = rng.standard_normal((b, h, t, hd)).astype(np.float32)
    k = rng.standard_normal((b, h, t, hd)).astype(np.float32)

    cos = np.cos(angles).astype(np.float32)
    sin = np.sin(angles).astype(np.float32)
    ours_q = np.asarray(_apply_rope(jax.numpy.asarray(q), cos, sin, n_prefix))
    ours_k = np.asarray(_apply_rope(jax.numpy.asarray(k), cos, sin, n_prefix))

    # DINOv3 applies tiled [N, hd] angles with rotate_half
    cos_t = torch.from_numpy(np.tile(cos, (1, 2)))
    sin_t = torch.from_numpy(np.tile(sin, (1, 2)))
    with torch.no_grad():
        q_t, k_t = apply_rotary_pos_emb(torch.from_numpy(q), torch.from_numpy(k), cos_t, sin_t)
    np.testing.assert_allclose(ours_q, q_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours_k, k_t.numpy(), atol=1e-6)


def test_rope_coords_both_parameterizations():
    """VERDICT r2 #4: the RoPE coordinate parameterization is a config knob
    with both conventions implemented — ``index`` (raw patch indices) and
    ``norm_pm1`` (DINOv3-style per-axis centered [-1, 1]).  Pin each against
    an independently-written formula so a real-weights-day mismatch is a
    config flip, not a code bisect (PARITY.md sweep)."""
    import dataclasses as dc

    from burn_depth_tpu.vit.dinov2 import _rope_angles

    base_cfg = DinoViTConfig.vits(img_size=56, patch_size=14, depth=1).da3_small_variant()
    gh, gw = 4, 3
    hd = base_cfg.head_dim
    inv_freq = base_cfg.rope_base ** -np.arange(0, 1, 4 / hd)

    idx = _rope_angles(dc.replace(base_cfg, rope_coords="index"), gh, gw)
    norm = _rope_angles(dc.replace(base_cfg, rope_coords="norm_pm1"), gh, gw)
    assert idx.shape == norm.shape == (gh * gw, hd // 2)

    for n in (0, 1, gw, gh * gw - 1):
        y, x = divmod(n, gw)
        np.testing.assert_allclose(idx[n, : hd // 4], y * inv_freq, rtol=1e-6)
        np.testing.assert_allclose(idx[n, hd // 4 :], x * inv_freq, rtol=1e-6)
        yn = (y + 0.5) / gh * 2.0 - 1.0
        xn = (x + 0.5) / gw * 2.0 - 1.0
        np.testing.assert_allclose(norm[n, : hd // 4], yn * inv_freq, rtol=1e-6)
        np.testing.assert_allclose(norm[n, hd // 4 :], xn * inv_freq, rtol=1e-6)

    with pytest.raises(ValueError):
        _rope_angles(dc.replace(base_cfg, rope_coords="bogus"), gh, gw)


def test_cat_order_flip_swaps_hook_halves():
    """VERDICT r2 #4: the cat_token pair order is a config knob.  With
    identical params/input, ``cur_first`` hooks must be exactly the
    half-swap of ``prev_first`` hooks (and the final tokens identical)."""
    import dataclasses as dc

    from burn_depth_tpu.vit.dinov2 import dinov2_forward, init_dinov2

    cfg = DinoViTConfig.vits(img_size=28, patch_size=14, depth=6).da3_small_variant()
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28)) * 0.3
    hook_ids = (3, 5)

    out_a = dinov2_forward(params, x, cfg, hook_ids=hook_ids, attn_impl="jnp")
    out_b = dinov2_forward(
        params, x, dc.replace(cfg, cat_order="cur_first"), hook_ids=hook_ids, attn_impl="jnp"
    )
    d = cfg.embed_dim
    for ha, hb in zip(out_a.hooks, out_b.hooks):
        pa = np.asarray(ha.patches)
        pb = np.asarray(hb.patches)
        assert pa.shape[-1] == 2 * d
        np.testing.assert_array_equal(pb[..., :d], pa[..., d:])
        np.testing.assert_array_equal(pb[..., d:], pa[..., :d])
    np.testing.assert_array_equal(
        np.asarray(out_a.x_norm_patchtokens), np.asarray(out_b.x_norm_patchtokens)
    )
