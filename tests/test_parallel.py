"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed layer to mirror (SURVEY.md §2); these tests
validate the TPU-native serving additions: mesh construction, DP batch
sharding, Megatron TP param placement, numerical equivalence of sharded vs
single-device execution, and the double-buffered stream.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.parallel import (
    make_mesh,
    shard_params,
    vit_tp_rules,
)
from burn_depth_tpu.serve import DepthStream, compile_serving_step
from burn_depth_tpu.vit.dinov2 import DinoViTConfig, dinov2_forward, init_dinov2


def test_mesh_shapes():
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(model=3)


def test_multihost_mesh_groups_model_axis_within_slice():
    """make_multihost_mesh on 2 fake DCN groups of 4: the model axis must
    never straddle a group (its psums are latency-critical and must stay on
    ICI), the data axis must be group-major (DCN traffic only across outer
    blocks), and a DP+TP serving step over the mesh must still match the
    single-device result."""
    from burn_depth_tpu.parallel import make_multihost_mesh

    devices = jax.devices()[:8]
    fake_group = {d: i // 4 for i, d in enumerate(devices)}  # 2 "slices" of 4
    mesh = make_multihost_mesh(devices, model=2, group_fn=fake_group.get)
    assert mesh.shape == {"data": 4, "model": 2}
    arr = mesh.devices
    # every model-pair lies within one group
    for row in arr:
        assert len({fake_group[d] for d in row}) == 1
    # data axis is group-major: first two rows group 0, last two group 1
    row_groups = [fake_group[row[0]] for row in arr]
    assert row_groups == sorted(row_groups) == [0, 0, 1, 1]

    # single-group fallback == make_mesh
    mesh1 = make_multihost_mesh(devices, model=2, group_fn=lambda d: 0)
    assert [list(r) for r in mesh1.devices] == [list(r) for r in make_mesh(devices, model=2).devices]

    # uneven groups rejected
    with pytest.raises(ValueError, match="uneven"):
        make_multihost_mesh(devices[:6], model=1, group_fn=fake_group.get)

    # a sharded forward over the hybrid mesh still matches single-device
    cfg = DinoViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2)
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 28, 28), jnp.float32)
    want = dinov2_forward(params, x, cfg).x_norm_patchtokens
    step = compile_serving_step(
        lambda p, v: dinov2_forward(p, v, cfg).x_norm_patchtokens, params, mesh, tp_rules=vit_tp_rules()
    )
    np.testing.assert_allclose(np.asarray(step(x)), np.asarray(want), atol=2e-5)


def test_tp_rules_place_block_weights():
    mesh = make_mesh(model=2)
    cfg = DinoViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2)
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    placed = shard_params(params, mesh, vit_tp_rules())

    qkv = placed["blocks"][0]["attn"]["qkv"]["weight"]
    assert qkv.sharding.spec == P("model", None)
    proj = placed["blocks"][0]["attn"]["proj"]["weight"]
    assert proj.sharding.spec == P(None, "model")
    fc1 = placed["blocks"][0]["mlp"]["fc1"]["weight"]
    assert fc1.sharding.spec == P("model", None)
    # non-matching leaves replicate
    assert placed["cls_token"].sharding.spec == P()
    assert placed["blocks"][0]["norm1"]["weight"].sharding.spec == P()


def test_sharded_vit_matches_single_device():
    """DP+TP execution must be numerically identical (f32, highest precision)
    to the unsharded forward."""
    mesh = make_mesh(model=2)
    cfg = DinoViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=3, num_heads=2)
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 28, 28))

    ref = dinov2_forward(params, x, cfg, attn_impl="jnp").x_norm_patchtokens

    def fn(p, xb):
        return dinov2_forward(p, xb, cfg, attn_impl="jnp").x_norm_patchtokens

    step = compile_serving_step(fn, params, mesh, tp_rules=vit_tp_rules())
    out = step(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_dp_da3_matches_single_device():
    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 28, 28))
    ref = model.infer(x).depth

    mesh = make_mesh()  # pure DP
    step = compile_serving_step(
        lambda p, xb: model._finalize(*model._forward_internal(p, xb, None, None)[:2]).depth,
        model.params,
        mesh,
    )
    out = step(x)
    assert out.sharding.spec == P("data")  # batch stays sharded on the way out
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_depth_stream_double_buffered():
    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()
    step = compile_serving_step(
        lambda p, xb: model._finalize(*model._forward_internal(p, xb, None, None)[:2]).depth,
        model.params,
        mesh,
    )
    batches = [np.random.default_rng(i).normal(size=(8, 3, 28, 28)).astype(np.float32) for i in range(3)]
    outs = list(DepthStream(step, batches, prefetch=2))
    assert len(outs) == 3
    for b, o in zip(batches, outs):
        ref = step(jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), rtol=1e-6)


def test_stream_image_dir_pipelines_decode_upload_compute(tmp_path):
    """Directory → native decode → u8-ingest sharded step, in file order,
    final partial batch padded; per-frame values match the unbatched path."""
    from PIL import Image

    from burn_depth_tpu.serve import stream_image_dir
    from burn_depth_tpu.serve.step import with_u8_ingest

    rng = np.random.default_rng(0)
    frames = []
    for i in range(5):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"f{i:02d}.png")
        frames.append(arr)

    mesh = make_mesh()  # pure DP over the 8 virtual devices

    def fwd(p, x):  # normalized [B,3,S,S] -> per-frame channel means [B,3]
        return x.mean(axis=(2, 3)) + p["b"]

    step = compile_serving_step(with_u8_ingest(fwd), {"b": jnp.zeros(())}, mesh)

    got = {}
    for start, n, out in stream_image_dir(step, str(tmp_path), 16, 8, crop=False):
        out_np = np.asarray(out)
        for i in range(n):
            got[start + i] = out_np[i]
    assert sorted(got) == list(range(5))  # 5 frames, one padded 8-batch

    from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD

    for i, arr in enumerate(frames):
        x01 = arr.astype(np.float32).transpose(2, 0, 1) / 255.0
        ref = ((x01 - np.asarray(IMAGENET_MEAN).reshape(3, 1, 1))
               / np.asarray(IMAGENET_STD).reshape(3, 1, 1)).mean(axis=(1, 2))
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-6)


def test_stream_image_dir_skips_corrupt_file(tmp_path):
    """on_error='skip' (default): a truncated image warns and the stream
    continues; on_error='raise' propagates the decode failure."""
    import warnings

    from PIL import Image

    from burn_depth_tpu.serve import stream_image_dir
    from burn_depth_tpu.serve.step import with_u8_ingest

    rng = np.random.default_rng(1)
    for i in range(3):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"f{i:02d}.png")
    (tmp_path / "f01.png").write_bytes(b"\x89PNG truncated garbage")

    mesh = make_mesh()

    def fwd(p, x):
        return x.mean(axis=(2, 3)) + p["b"]

    step = compile_serving_step(with_u8_ingest(fwd), {"b": jnp.zeros(())}, mesh)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        total = sum(
            n for _, n, _ in stream_image_dir(step, str(tmp_path), 16, 8, crop=False)
        )
    assert total == 2  # the corrupt middle file was dropped, stream finished
    assert any("f01.png" in str(w.message) for w in caught)

    with pytest.raises(RuntimeError, match="decode failed"):
        list(stream_image_dir(step, str(tmp_path), 16, 8, crop=False, on_error="raise"))


def test_graft_dryrun_multichip():
    """The driver's multi-chip gate, run in-process on the 8-device CPU mesh."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_da3_small_variant_matches_single_device():
    """TP+DP over the DA3-small backbone (qk-norm, RoPE, cat-token, camera
    token): sharded == unsharded.  The q/k-norm params are sub-head-dim and
    stay replicated; the rules must not break their use."""
    cfg = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 28, 28)) * 0.5
    ref = model.infer(x)

    mesh = make_mesh(model=2)
    step = compile_serving_step(
        lambda p, xb: model._finalize(*model._forward_internal(p, xb, None, None)[:2]).depth,
        model.params,
        mesh,
        tp_rules=vit_tp_rules("backbone/pretrained/"),
    )
    out = step(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref.depth), rtol=2e-5, atol=2e-6)


def test_tp_head_major_collective_audit():
    """VERDICT weak-#5: sharding the torch-layout packed qkv ``[3D, D]``
    contiguously over ``model`` misaligns with heads and forces one qkv
    activation all-gather per block.  The head-major layout
    (``parallel/tp_layout.py``) eliminates it: compiled HLO must show zero
    all-gathers and exactly the two Megatron all-reduces per block
    (after attn.proj and mlp.fc2)."""
    import re

    from burn_depth_tpu.parallel import vit_to_head_major

    mesh = make_mesh(model=2)
    cfg = DinoViTConfig(img_size=56, patch_size=14, embed_dim=64, depth=2, num_heads=4)
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 56, 56))

    def fn(p, xb):
        return dinov2_forward(p, xb, cfg, attn_impl="jnp").x_norm_patchtokens

    ref = fn(params, x)
    hm = vit_to_head_major(params, cfg.num_heads)
    # the layout permutation alone must be numerics-preserving
    np.testing.assert_allclose(np.asarray(fn(hm, x)), np.asarray(ref), rtol=2e-5, atol=2e-6)

    counts = {}
    for label, p in (("legacy", params), ("head_major", hm)):
        step = compile_serving_step(fn, p, mesh, tp_rules=vit_tp_rules())
        np.testing.assert_allclose(np.asarray(step(x)), np.asarray(ref), rtol=2e-5, atol=2e-6)
        txt = step.fn.lower(step.params, x).compile().as_text()
        counts[label] = (
            len(re.findall(r"all-gather(?:-start)?\(", txt)),
            len(re.findall(r"all-reduce(?:-start)?\(", txt)),
        )
    assert counts["legacy"][0] == cfg.depth, counts  # 1 activation gather / block
    assert counts["head_major"] == (0, 2 * cfg.depth), counts  # Megatron-only


def test_multiview_sp_matches_single_device():
    """Gather-KV sequence parallelism (parallel/sp.py): views sharded over
    the mesh with scenes SPANNING devices (1 view/device, 4-device scenes),
    both the SP island and plain GSPMD must match single-device
    ``infer_multiview``; the SP program's collective budget must be exactly
    the 2 K/V all-gathers per global block."""
    import re

    from burn_depth_tpu.serve.step import compile_multiview_step
    from burn_depth_tpu.vit.dinov2 import _is_global_block

    cfg = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    views = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (2, views, 3, 28, 28)) * 0.4
    ref = model.infer_multiview(x)

    bb = cfg.backbone_config()
    n_global = sum(_is_global_block(bb, i) for i in range(bb.depth))
    assert n_global == 4  # ViT-S/12, alt_block_start=4 -> blocks 4,6,8,10

    mesh = make_mesh()  # 8-way data: 8 flat rows -> 1 view/device
    flat = x.reshape(2 * views, 3, 28, 28)
    gathers = {}
    for sp_flag in (True, False):
        step = compile_multiview_step(model, mesh, views, sp=sp_flag)
        out = step(flat)
        np.testing.assert_allclose(
            np.asarray(out.depth).reshape(2, views, 28, 28),
            np.asarray(ref.depth), rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out.extrinsics).reshape(2, views, 1, 3, 4),
            np.asarray(ref.extrinsics), rtol=2e-5, atol=2e-6,
        )
        txt = step.fn.lower(step.params, flat).compile().as_text()
        gathers[sp_flag] = len(re.findall(r"all-gather(?:-start)?\(", txt))
    assert gathers[True] == 2 * n_global, gathers  # K + V per global block
    # GSPMD's heuristic schedule must not beat the contractual minimum
    assert gathers[False] >= gathers[True], gathers


def test_multiview_sp_whole_scenes_device_local():
    """When each device holds whole scenes (chunk % views == 0) the SP island
    needs NO collective: views merge in-core, numerics still match."""
    import re

    from burn_depth_tpu.serve.step import compile_multiview_step

    cfg = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    views = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (8, views, 3, 28, 28)) * 0.4
    ref = model.infer_multiview(x)

    mesh = make_mesh()  # 16 flat rows / 8 devices = 2 rows = 1 whole scene each
    step = compile_multiview_step(model, mesh, views, sp=True)
    out = step(x.reshape(8 * views, 3, 28, 28))
    np.testing.assert_allclose(
        np.asarray(out.depth).reshape(8, views, 28, 28),
        np.asarray(ref.depth), rtol=2e-5, atol=2e-6,
    )
    txt = step.fn.lower(step.params, x.reshape(16, 3, 28, 28)).compile().as_text()
    assert len(re.findall(r"all-gather(?:-start)?\(", txt)) == 0


def test_multiview_sp_ring_matches_gather():
    """Ring mode (ppermute K/V around each scene's device ring + online
    softmax) must match single-device numerics up to fp reordering, use
    exactly 2·(R-1) collective-permutes per global block (R = devices per
    scene), and contain NO all-gathers."""
    import re

    from burn_depth_tpu.serve.step import compile_multiview_step
    from burn_depth_tpu.vit.dinov2 import _is_global_block

    cfg = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    views = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (2, views, 3, 28, 28)) * 0.4
    ref = model.infer_multiview(x)

    bb = cfg.backbone_config()
    n_global = sum(_is_global_block(bb, i) for i in range(bb.depth))

    mesh = make_mesh()  # 8-way data: 1 view/device -> ring of R=4 per scene
    flat = x.reshape(2 * views, 3, 28, 28)
    step = compile_multiview_step(model, mesh, views, sp="ring")
    out = step(flat)
    np.testing.assert_allclose(
        np.asarray(out.depth).reshape(2, views, 28, 28),
        np.asarray(ref.depth), rtol=5e-5, atol=1e-5,
    )
    txt = step.fn.lower(step.params, flat).compile().as_text()
    n_perm = len(re.findall(r"collective-permute(?:-start)?\(", txt))
    assert n_perm == 2 * 3 * n_global, n_perm  # (R-1)=3 hops for K and V
    assert len(re.findall(r"all-gather(?:-start)?\(", txt)) == 0


def test_cross_view_attention_sp_rejects_straddling_chunks():
    from burn_depth_tpu.parallel.sp import ViewSP, cross_view_attention_sp

    mesh = make_mesh()
    q = jnp.zeros((24, 2, 4, 8))  # 24 rows / 8 devices = 3-row chunks
    with pytest.raises(ValueError, match="straddles scenes"):
        # views=4: a 3-row chunk is neither whole scenes nor a whole-scene
        # divisor -> rows 3..5 mix scene 0 and scene 1 on one device.
        cross_view_attention_sp(
            ViewSP(mesh), q, q, q, views=4, scale=1.0, quiet_softmax=False
        )


def test_u8_ingest_matches_f32_pipeline():
    """with_u8_ingest == host-side normalize + f32 upload, numerically."""
    from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD
    from burn_depth_tpu.serve import with_u8_ingest

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)

    def f(p, xb):
        return model._finalize(*model._forward_internal(p, xb, None, None)[:2]).depth

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 3, 28, 28), dtype=np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]

    got = with_u8_ingest(f)(model.params, jnp.asarray(u8))
    want = f(model.params, jnp.asarray(f32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_serving_step_composes_with_tiers():
    """The full serving configuration — int8 ViT + NHWC tail + DP mesh —
    compiles and matches the plain single-device model within the int8
    tier's tolerance (the tiers are param-tree transforms, so the serving
    step needs no special handling)."""
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, cfg.img_size, cfg.img_size)) * 0.3
    ref = np.asarray(model._infer_fn(model.params, x).depth)

    serving = model.quantize_vit(calibration_input=x[:1]).to_nhwc_tail()
    mesh = make_mesh()  # pure DP
    step = compile_serving_step(
        lambda p, xb: serving._infer_fn(p, xb).depth, serving.params, mesh
    )
    out = np.asarray(step(x))
    assert out.shape == ref.shape
    scale = np.abs(ref).mean() + 1e-6
    assert np.abs(out - ref).mean() / scale < 0.2  # int8 tier tolerance


def test_tp_int8_composition():
    """Round-3 backlog #9: the int8 serving tier composes with tensor
    parallelism.  Head-major layout first (needs float weights), then
    quantize, then shard with ``vit_tp_rules_int8``: sharded output must
    match the single-device int8 forward, with zero all-gathers (the
    quantized qkv pack's N-axis slices stay head-aligned)."""
    import re

    from burn_depth_tpu.ops.quant import quantize_vit_blocks
    from burn_depth_tpu.parallel import vit_to_head_major, vit_tp_rules_int8

    mesh = make_mesh(model=2)
    cfg = DinoViTConfig(img_size=56, patch_size=14, embed_dim=64, depth=2, num_heads=4)
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 56, 56))

    q8 = quantize_vit_blocks(vit_to_head_major(params, cfg.num_heads))
    assert "weight_hm_i8" in q8["blocks"][0]["attn"]["qkv"]

    def fn(p, xb):
        return dinov2_forward(p, xb, cfg, attn_impl="jnp").x_norm_patchtokens

    ref = fn(q8, x)  # single-device int8 forward

    step = compile_serving_step(fn, q8, mesh, tp_rules=vit_tp_rules_int8())
    out = step(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    q8_qkv = step.params["blocks"][0]["attn"]["qkv"]
    assert q8_qkv["weight_hm_i8"].sharding.spec == P(None, "model")
    assert q8_qkv["scale"].sharding.spec == P("model")
    assert step.params["blocks"][0]["mlp"]["fc2"]["weight_i8"].sharding.spec == P("model", None)

    txt = step.fn.lower(step.params, x).compile().as_text()
    gathers = len(re.findall(r"all-gather(?:-start)?\(", txt))
    reduces = len(re.findall(r"all-reduce(?:-start)?\(", txt))
    # Megatron psums (proj/fc2) + dynamic-amax max-reduces on the two
    # row-parallel inputs: at most 4 per block, and no activation gathers.
    assert gathers == 0, txt[:2000]
    assert reduces <= 4 * cfg.depth, reduces
