"""Training subsystem tests (CPU / virtual 8-device mesh).

Covers: analytic loss properties, optimizer/step mechanics, convergence of
the real tiny DepthPro under the packaged objective, DP+TP sharded-step
equivalence with the single-device step, grad accumulation equivalence, and
train-state checkpoint/resume equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from burn_depth_tpu.train import (
    adamw,
    affine_alignment,
    compile_train_step,
    da3_objective,
    depth_pro_objective,
    gradient_matching_loss,
    laplace_nll_loss,
    prefetch_to_device,
    silog_loss,
    ssi_mae_loss,
    synthetic_depth_batches,
)

# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_silog_zero_for_exact_prediction():
    d = jnp.ones((2, 8, 8)) * 3.0
    assert float(silog_loss(d, d)) <= 0.011  # alpha*sqrt(eps) floor = 0.01


def test_silog_scale_invariant_at_lam_1():
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(1.0, 5.0, (2, 16, 16)), jnp.float32)
    pred = jnp.asarray(rng.uniform(1.0, 5.0, (2, 16, 16)), jnp.float32)
    a = silog_loss(pred, tgt, lam=1.0)
    b = silog_loss(pred * 7.5, tgt, lam=1.0)  # global scale drops out
    np.testing.assert_allclose(float(a), float(b), rtol=1e-4)


def test_silog_ignores_masked_pixels():
    tgt = jnp.ones((1, 8, 8)) * 2.0
    pred = jnp.ones((1, 8, 8)) * 2.0
    # corrupt one pixel, mask it out -> loss stays ~0
    pred = pred.at[0, 3, 3].set(50.0)
    mask = jnp.ones((1, 8, 8)).at[0, 3, 3].set(0.0)
    assert float(silog_loss(pred, tgt, mask)) <= 0.011


def test_affine_alignment_recovers_exact_fit():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(size=(3, 12, 12)), jnp.float32)
    g = 2.5 * p - 1.25
    s, t = affine_alignment(p, g)
    np.testing.assert_allclose(np.asarray(s), 2.5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t), -1.25, atol=1e-4)


def test_ssi_mae_invariant_to_affine_pred_transform():
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 16, 16)), jnp.float32)
    a = ssi_mae_loss(p, g)
    b = ssi_mae_loss(3.0 * p + 4.0, g)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-3)
    # exact affine relation -> zero loss
    assert float(ssi_mae_loss(p, 0.5 * p + 2.0)) < 1e-5


def test_gradient_matching_zero_for_constant_offset():
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=(1, 32, 32)), jnp.float32)
    # pred = target + constant: all spatial gradients of R cancel
    assert float(gradient_matching_loss(g + 5.0, g)) < 1e-5
    assert float(gradient_matching_loss(g * 2.0, g)) > 1e-3


def test_laplace_nll_prefers_calibrated_scale():
    rng = np.random.default_rng(4)
    tgt = jnp.zeros((1, 64, 64))
    pred = jnp.asarray(rng.laplace(scale=1.0, size=(1, 64, 64)), jnp.float32)
    well = laplace_nll_loss(pred, tgt, jnp.zeros_like(pred))  # b = log1 = 0
    over = laplace_nll_loss(pred, tgt, jnp.full_like(pred, 4.0))  # too unsure
    under = laplace_nll_loss(pred, tgt, jnp.full_like(pred, -4.0))  # too sure
    assert float(well) < float(over)
    assert float(well) < float(under)


# ---------------------------------------------------------------------------
# step mechanics
# ---------------------------------------------------------------------------


def _quadratic_loss(params, batch):
    # simple convex problem: fit w to minimize ||x @ w - y||^2
    pred = batch["x"] @ params["w"]
    return jnp.mean((pred - batch["y"]) ** 2)


def _quadratic_setup(seed=0, n=64, d=8):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(size=(d, 1)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = x @ w_true
    params = {"w": jnp.zeros((d, 1), jnp.float32)}
    return params, {"x": jnp.asarray(x), "y": jnp.asarray(y)}


def test_train_step_descends_quadratic():
    params, batch = _quadratic_setup()
    step = compile_train_step(
        _quadratic_loss, params, optimizer=adamw(1e-1, weight_decay=0.0)
    )
    losses = [float(step(batch)["loss"]) for _ in range(50)]
    assert losses[-1] < losses[0] * 0.05
    assert int(step.state["step"]) == 50


def test_grad_accumulation_matches_full_batch():
    params, batch = _quadratic_setup(n=64)
    import optax

    sgd = optax.sgd(0.1)
    full = compile_train_step(_quadratic_loss, params, optimizer=sgd)
    acc = compile_train_step(_quadratic_loss, params, optimizer=sgd, accum_steps=4)
    m_full = full(batch)
    micro = {k: v.reshape(4, 16, *v.shape[1:]) for k, v in batch.items()}
    m_acc = acc(micro)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(full.state["params"]["w"]),
        np.asarray(acc.state["params"]["w"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_compute_dtype_cast_keeps_f32_masters():
    params, batch = _quadratic_setup()
    step = compile_train_step(
        _quadratic_loss, params, optimizer=adamw(1e-2), compute_dtype=jnp.bfloat16
    )
    step(batch)
    assert step.state["params"]["w"].dtype == jnp.float32


def test_remat_policies_match_baseline():
    params, batch = _quadratic_setup()
    import optax

    results = {}
    for remat in ("none", "full", "dots"):
        s = compile_train_step(_quadratic_loss, params, optimizer=optax.sgd(0.1), remat=remat)
        s(batch)
        results[remat] = np.asarray(s.state["params"]["w"])
    np.testing.assert_allclose(results["none"], results["full"], rtol=1e-6)
    np.testing.assert_allclose(results["none"], results["dots"], rtol=1e-6)


# ---------------------------------------------------------------------------
# real models
# ---------------------------------------------------------------------------


def test_depth_pro_finetune_descends():
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    step = compile_train_step(
        depth_pro_objective(model, fov_weight=0.0),
        model.params,
        optimizer=adamw(3e-4, weight_decay=0.0, warmup_steps=0),
        remat="dots",
    )
    gen = synthetic_depth_batches(0, batch=2, size=cfg.img_size, steps=1)
    batch = next(iter(gen))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = [float(step(batch)["loss"]) for _ in range(8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_da3_objective_grads_finite():
    import dataclasses

    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    cfg = dataclasses.replace(
        DepthAnything3Config.small(), image_size=28, attn_impl="jnp"
    )
    model = DepthAnything3.init(jax.random.PRNGKey(1), cfg)
    loss_fn = da3_objective(model)
    batch_np = next(iter(synthetic_depth_batches(1, batch=2, size=28, steps=1)))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        model.params, batch
    )
    assert np.isfinite(float(loss))
    assert "ssi_mae" in metrics
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


# ---------------------------------------------------------------------------
# sharded step (virtual mesh)
# ---------------------------------------------------------------------------


def test_sharded_train_step_matches_single_device():
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
    from burn_depth_tpu.parallel import make_mesh, vit_tp_rules

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    loss_fn = depth_pro_objective(model, fov_weight=0.0)
    import optax

    batch_np = next(iter(synthetic_depth_batches(2, batch=4, size=cfg.img_size, steps=1)))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    single = compile_train_step(loss_fn, model.params, optimizer=optax.sgd(1e-3))
    m_single = single(batch)

    mesh = make_mesh(jax.devices()[:8], model=2)
    rules = (
        vit_tp_rules("encoder/patch_encoder/")
        + vit_tp_rules("encoder/image_encoder/")
        + vit_tp_rules("fov/encoder/")
    )
    sharded = compile_train_step(
        loss_fn, model.params, mesh, tp_rules=rules, optimizer=optax.sgd(1e-3)
    )
    m_sharded = sharded(batch)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=2e-4
    )
    # spot-check a TP-sharded weight and a replicated weight after the update
    flat_s = jax.tree_util.tree_leaves_with_path(single.state["params"])
    flat_m = {
        "/".join(str(k) for k in p): v
        for p, v in jax.tree_util.tree_leaves_with_path(sharded.state["params"])
    }
    checked = 0
    for path, leaf in flat_s:
        key = "/".join(str(k) for k in path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_m[key]), rtol=2e-3, atol=2e-5
        )
        checked += 1
        if checked >= 12:
            break


# ---------------------------------------------------------------------------
# checkpoint / resume + data pipeline
# ---------------------------------------------------------------------------


def test_train_state_checkpoint_resume(tmp_path):
    from burn_depth_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    params, batch = _quadratic_setup()
    import optax

    opt = optax.adamw(1e-2)
    a = compile_train_step(_quadratic_loss, params, optimizer=opt)
    for _ in range(3):
        a(batch)

    path = str(tmp_path / "state.safetensors")
    save_checkpoint(path, a.state)

    b = compile_train_step(_quadratic_loss, params, optimizer=opt)
    b.state = load_checkpoint(path, b.state)
    assert int(b.state["step"]) == 3

    ma = a(batch)
    mb = b(batch)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.state["params"]["w"]), np.asarray(b.state["params"]["w"]), rtol=1e-6
    )


def test_prefetch_preserves_order_and_content():
    batches = [{"i": np.full((2, 2), k, np.float32)} for k in range(5)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 5
    for k, b in enumerate(out):
        assert float(b["i"][0, 0]) == k


# ---------------------------------------------------------------------------
# evaluation metrics
# ---------------------------------------------------------------------------


def test_depth_metrics_perfect_prediction():
    from burn_depth_tpu.train import depth_metrics

    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.uniform(0.5, 10.0, (2, 16, 16)), jnp.float32)
    m = depth_metrics(d, d)
    assert float(m["abs_rel"]) < 1e-6
    assert float(m["rmse"]) < 1e-5
    assert float(m["delta1"]) == 1.0
    assert float(m["silog"]) < 1e-2


def test_depth_metrics_known_ratio():
    from burn_depth_tpu.train import depth_metrics

    tgt = jnp.full((1, 8, 8), 2.0)
    m = depth_metrics(tgt * 1.3, tgt)  # ratio 1.3: fails delta1, passes delta2
    np.testing.assert_allclose(float(m["abs_rel"]), 0.3, rtol=1e-5)
    assert float(m["delta1"]) == 0.0
    assert float(m["delta2"]) == 1.0
    # scale error only -> silog is ~0 (scale-invariant)
    assert float(m["silog"]) < 1e-2


def test_depth_metrics_masking_excludes_invalid():
    from burn_depth_tpu.train import depth_metrics

    tgt = jnp.full((1, 8, 8), 2.0)
    pred = tgt.at[0, 0, 0].set(100.0)
    mask = jnp.ones((1, 8, 8)).at[0, 0, 0].set(0.0)
    m = depth_metrics(pred, tgt, mask)
    assert float(m["abs_rel"]) < 1e-6
    # zero-depth targets are auto-excluded even without a mask
    tgt0 = tgt.at[0, 1, 1].set(0.0)
    m2 = depth_metrics(tgt, tgt0)
    assert float(m2["abs_rel"]) < 1e-6


def test_aligned_metrics_affine_invariant():
    from burn_depth_tpu.train import aligned_depth_metrics

    rng = np.random.default_rng(8)
    tgt = jnp.asarray(rng.uniform(1.0, 5.0, (2, 16, 16)), jnp.float32)
    pred = 0.25 * tgt - 3.0  # affine transform of the truth (even negative)
    m = aligned_depth_metrics(pred, tgt)
    assert float(m["abs_rel"]) < 1e-4
    assert float(m["delta1"]) > 0.999


def test_evaluate_model_loop():
    from burn_depth_tpu.train import evaluate_model

    def predict(img):
        # oracle: recover depth from the synthetic shade channel inverse
        return jnp.asarray(img)[:, 0] * 0.0 + 3.0

    gen = list(synthetic_depth_batches(9, batch=2, size=32, steps=3))
    out = evaluate_model(predict, gen)
    assert set(out) >= {"abs_rel", "rmse", "delta1", "silog"}
    assert np.isfinite(list(out.values())).all()


# ---------------------------------------------------------------------------
# EMA + schedules
# ---------------------------------------------------------------------------


def test_ema_tracks_params():
    params, batch = _quadratic_setup()
    step = compile_train_step(
        _quadratic_loss, params, optimizer=adamw(1e-1, weight_decay=0.0), ema_decay=0.5
    )
    for _ in range(20):
        step(batch)
    w = np.asarray(step.state["params"]["w"])
    e = np.asarray(step.state["ema"]["w"])
    w0 = np.zeros_like(w)
    # EMA lags behind the raw params but has clearly left the start point
    assert 0 < np.linalg.norm(e - w0)
    assert np.linalg.norm(e - w) < np.linalg.norm(w - w0)
    # fast decay 0.5: the EMA lags the raw params by about one Adam step
    # (~lr per coordinate), so it stays within a couple of steps' movement
    np.testing.assert_allclose(e, w, atol=0.25)


def test_cosine_schedule_decays_to_zero():
    params, batch = _quadratic_setup()
    step = compile_train_step(
        _quadratic_loss,
        params,
        optimizer=adamw(1e-1, weight_decay=0.0, warmup_steps=2, total_steps=10),
    )
    for _ in range(10):
        step(batch)
    w10 = np.asarray(step.state["params"]["w"])
    step(batch)  # lr has decayed to ~0: the update is ~nothing
    w11 = np.asarray(step.state["params"]["w"])
    np.testing.assert_allclose(w10, w11, atol=1e-4)


# ---------------------------------------------------------------------------
# multi-view objective (+ sequence-parallel training)
# ---------------------------------------------------------------------------


def _multiview_batch(key, n_flat: int, size: int):
    """Flat-view batch with plausible camera targets (w2c R=I + small t)."""
    rng = np.random.default_rng(key)
    extr = np.tile(np.eye(3, 4, dtype=np.float32), (n_flat, 1, 1))
    extr[:, :, 3] = rng.normal(scale=0.1, size=(n_flat, 3)).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (n_flat, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = float(size)
    intr[:, 0, 2] = intr[:, 1, 2] = size / 2.0
    return {
        "image": jnp.asarray(rng.normal(scale=0.4, size=(n_flat, 3, size, size)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, size=(n_flat, size, size)), jnp.float32),
        "mask": jnp.ones((n_flat, size, size), jnp.float32),
        "extrinsics": jnp.asarray(extr),
        "intrinsics": jnp.asarray(intr),
    }


def test_da3_multiview_objective_grads_finite():
    import dataclasses

    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
    from burn_depth_tpu.train import da3_multiview_objective

    cfg = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(1), cfg)
    batch = _multiview_batch(0, n_flat=4, size=28)
    loss_fn = da3_multiview_objective(model, views=2, pose_weight=1.0)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(model.params, batch)
    assert np.isfinite(float(loss))
    for k in ("ssi_mae", "pose_trans_l1", "pose_rot_l1", "pose_fov_l1"):
        assert k in metrics and np.isfinite(float(metrics[k]))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))

    # target encoding shape sanity (the objective reshapes [B,1,9] -> [B,9])
    from burn_depth_tpu.models.da3.camera import extri_intri_to_pose_encoding

    enc = extri_intri_to_pose_encoding(
        batch["extrinsics"][:, None], batch["intrinsics"][:, None], 28, 28
    )
    assert enc.shape == (4, 1, 9)


def test_multiview_sp_training_matches_single_device():
    """Grads FLOW THROUGH the sequence-parallel island: one optimizer step of
    the multi-view objective with ViewSP over the 8-device mesh equals the
    single-device step (the all-gather transposes to reduce-scatter inside
    the shard_map vjp)."""
    import dataclasses

    import optax

    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
    from burn_depth_tpu.parallel import make_mesh
    from burn_depth_tpu.parallel.sp import ViewSP
    from burn_depth_tpu.train import da3_multiview_objective

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    cfg = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    batch = _multiview_batch(1, n_flat=8, size=28)  # 2 scenes x 4 views

    single = compile_train_step(
        da3_multiview_objective(model, views=4, pose_weight=0.5),
        model.params, None, optimizer=optax.sgd(1e-3),
    )
    m_single = single(batch)

    mesh = make_mesh()  # 8-way data: 1 view/device, scenes span devices
    sharded = compile_train_step(
        da3_multiview_objective(model, views=4, pose_weight=0.5, sp=ViewSP(mesh)),
        model.params, mesh, optimizer=optax.sgd(1e-3),
    )
    m_sharded = sharded(batch)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_sharded["loss"]), rtol=2e-4)
    flat_m = {
        "/".join(str(k) for k in p): v
        for p, v in jax.tree_util.tree_leaves_with_path(sharded.state["params"])
    }
    checked = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(single.state["params"]):
        key = "/".join(str(k) for k in path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_m[key]), rtol=2e-3, atol=2e-5
        )
        checked += 1
        if checked >= 12:
            break


def test_pose_metrics_identity_and_known_rotation():
    from burn_depth_tpu.train import pose_metrics

    e = np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1))
    m = pose_metrics(jnp.asarray(e), jnp.asarray(e))
    assert float(m["rot_deg"]) < 1e-3
    assert float(m["trans_l2"]) == 0.0 and float(m["center_l2"]) == 0.0

    # 90-degree yaw, translation [1,0,0]: rot err 90 deg, trans err 1;
    # center error differs from trans error because rotations disagree.
    p = e.copy()
    c, s = 0.0, 1.0
    p[:, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    p[:, :, 3] = np.array([1.0, 0.0, 0.0], np.float32)
    m = pose_metrics(jnp.asarray(p), jnp.asarray(e))
    np.testing.assert_allclose(float(m["rot_deg"]), 90.0, atol=1e-4)
    np.testing.assert_allclose(float(m["trans_l2"]), 1.0, atol=1e-6)
    # center_p = -R^T t = -[0,-1,0]... compute directly:
    cp = -(p[0, :3, :3].T @ p[0, :, 3])
    np.testing.assert_allclose(float(m["center_l2"]), np.linalg.norm(cp), atol=1e-5)


def test_canonicalize_poses_gauge_and_scale_invariant():
    """A per-scene rigid+scale gauge change of the world (the SfM ambiguity:
    X -> s·QX + c, so R -> RQ^T, t -> s·t - RQ^T c) must not change the
    canonical form — and pose_metrics(views=) must score it as zero error."""
    from burn_depth_tpu.api.geometry import canonicalize_poses
    from burn_depth_tpu.models.da3.camera import quaternion_to_matrix
    from burn_depth_tpu.train import pose_metrics

    rng = np.random.default_rng(11)
    views, scenes = 3, 2

    def rand_rot(n):
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return np.asarray(quaternion_to_matrix(jnp.asarray(q)))

    r = rand_rot(scenes * views)
    t = rng.normal(scale=1.5, size=(scenes * views, 3)).astype(np.float32)
    e = np.concatenate([r, t[..., None]], axis=-1)  # [N, 3, 4] w2c

    # one gauge per scene, applied to all its views
    qs = rand_rot(scenes)
    cs = rng.normal(scale=3.0, size=(scenes, 3)).astype(np.float32)
    ss = rng.uniform(0.3, 4.0, size=scenes).astype(np.float32)
    e_new = e.copy().reshape(scenes, views, 3, 4)
    for b in range(scenes):
        for v in range(views):
            rq = e_new[b, v, :, :3] @ qs[b].T
            e_new[b, v, :, 3] = ss[b] * e_new[b, v, :, 3] - rq @ cs[b]
            e_new[b, v, :, :3] = rq
    e_new = e_new.reshape(-1, 3, 4)

    canon_a = np.asarray(canonicalize_poses(jnp.asarray(e), views))
    canon_b = np.asarray(canonicalize_poses(jnp.asarray(e_new), views))
    np.testing.assert_allclose(canon_a, canon_b, rtol=1e-4, atol=1e-5)
    # first view is the identity pose after canonicalization
    np.testing.assert_allclose(
        canon_a.reshape(scenes, views, 3, 4)[:, 0, :, :3],
        np.tile(np.eye(3, dtype=np.float32), (scenes, 1, 1)), atol=1e-5,
    )
    np.testing.assert_allclose(
        canon_a.reshape(scenes, views, 3, 4)[:, 0, :, 3], 0.0, atol=1e-5
    )

    m = pose_metrics(jnp.asarray(e_new), jnp.asarray(e), views=views)
    # arccos amplifies f32 rounding near zero angle: ~0.02 deg residual
    assert float(m["rot_deg"]) < 0.05
    assert float(m["trans_l2"]) < 1e-4 and float(m["center_l2"]) < 1e-4

    # WITHOUT gauge fixing the same pair scores huge errors — the raw
    # comparison measures the coordinate convention, not the model
    raw = pose_metrics(jnp.asarray(e_new), jnp.asarray(e))
    assert float(raw["rot_deg"]) > 1.0



# ---- occlusion-boundary battery (Depth Pro paper's sharpness metrics) ----


def _step_depth(h=16, w=16, near=1.0, far=3.0):
    """Left half near, right half far — one vertical occluding contour."""
    d = np.full((1, h, w), far, np.float32)
    d[:, :, : w // 2] = near
    return d


def test_boundary_f1_perfect_and_flat():
    from burn_depth_tpu.train.metrics import boundary_f1

    gt = _step_depth()
    assert float(boundary_f1(jnp.asarray(gt), jnp.asarray(gt))) == pytest.approx(1.0)
    # flat prediction marks no contour at all -> F1 0
    flat = np.full_like(gt, 2.0)
    assert float(boundary_f1(jnp.asarray(flat), jnp.asarray(gt))) == pytest.approx(0.0)
    # flat GT + edgy prediction: no true boundary, zero precision -> 0
    assert float(boundary_f1(jnp.asarray(gt), jnp.asarray(flat))) == pytest.approx(0.0)


def test_boundary_f1_scale_invariant_shift_not():
    from burn_depth_tpu.train.metrics import boundary_f1

    gt = _step_depth()
    rng = np.random.default_rng(0)
    pred = gt * np.exp(rng.normal(0, 0.01, gt.shape)).astype(np.float32)
    a = float(boundary_f1(jnp.asarray(pred), jnp.asarray(gt)))
    b = float(boundary_f1(jnp.asarray(7.5 * pred), jnp.asarray(gt)))
    assert a == pytest.approx(b, abs=1e-6)  # pure scale cancels in the ratio test
    # a large +shift compresses ratios below threshold -> F1 collapses
    c = float(boundary_f1(jnp.asarray(pred + 50.0), jnp.asarray(gt)))
    assert c < a


def test_boundary_f1_mask_excludes_pairs():
    from burn_depth_tpu.train.metrics import boundary_f1

    gt = _step_depth()
    pred = gt.copy()
    # corrupt the prediction with a bogus contour inside a masked-out band
    pred[:, 2, :] = np.linspace(1, 10, gt.shape[2], dtype=np.float32)
    mask = np.ones_like(gt)
    mask[:, 1:4, :] = 0.0  # both pixels of every pair touching rows 1-3 invalid
    with_mask = float(boundary_f1(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    without = float(boundary_f1(jnp.asarray(pred), jnp.asarray(gt)))
    assert with_mask == pytest.approx(1.0)
    assert without < 1.0


def test_boundary_recall_from_mask_orientation():
    from burn_depth_tpu.train.metrics import boundary_recall_from_mask

    h = w = 12
    fg = np.zeros((1, h, w), np.float32)
    fg[:, 4:8, 4:8] = 1.0  # foreground square
    near = np.full((1, h, w), 5.0, np.float32)
    near[:, 4:8, 4:8] = 1.0  # fg closer — correct occluding contour
    assert float(boundary_recall_from_mask(jnp.asarray(near), jnp.asarray(fg))) == pytest.approx(1.0)
    # inverted depth: fg marked FARTHER -> orientation-aware recall is 0
    assert float(boundary_recall_from_mask(jnp.asarray(6.0 - near), jnp.asarray(fg))) == pytest.approx(0.0)


def test_evaluate_model_boundary_flag():
    from burn_depth_tpu.train.metrics import evaluate_model

    gt = _step_depth()
    batches = [{"image": gt[:, None], "depth": gt[0][None]}]
    scores = evaluate_model(lambda img: jnp.asarray(gt), iter(batches), boundary=True)
    assert scores["boundary_f1"] == pytest.approx(1.0)
    assert "abs_rel" in scores
    # per-image benchmark averaging path carries it too
    scores_pi = evaluate_model(
        lambda img: jnp.asarray(gt), iter(batches), boundary=True, per_image=True
    )
    assert scores_pi["boundary_f1"] == pytest.approx(1.0)
