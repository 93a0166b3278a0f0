"""Orbax checkpoint backend (io/orbax_io.py): roundtrip fidelity, format
dispatch, strict structure checks, async save, and sharded direct-to-device
restore on the virtual 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_depth_tpu.io.checkpoint import (
    flatten_tree,
    load_checkpoint,
    load_flat_auto,
    save_auto,
)
from burn_depth_tpu.io.orbax_io import (
    is_orbax_path,
    load_flat_orbax,
    load_orbax,
    save_orbax,
)


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "encoder": {"w": jax.random.normal(k, (8, 16), jnp.float32), "b": jnp.zeros((16,), jnp.bfloat16)},
        "head": [jnp.arange(6, dtype=jnp.int32).reshape(2, 3)],
        "step": jnp.asarray(7, jnp.int32),
    }


def test_orbax_roundtrip_exact(tmp_path):
    tree = _tree()
    path = str(tmp_path / "ckpt.orbax")
    save_orbax(path, tree)
    got = load_orbax(path, template=tree)
    for (ka, a), (kb, b) in zip(
        sorted(flatten_tree(tree).items()), sorted(flatten_tree(got).items())
    ):
        assert ka == kb
        assert a.dtype == b.dtype, ka
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_flat_view_agrees_across_formats_for_optimizer_state(tmp_path):
    """Train-state trees hold optax NamedTuples; a template-less Orbax restore
    returns them as plain dicts.  The flat '/'-joined view must be identical
    either way (bare field names, no '.'-prefixed attr keys), so resume logic
    is format-agnostic (cli/train.py --resume)."""
    import optax

    params = {"w": jnp.ones((2, 3), jnp.float32)}
    opt = optax.adamw(1e-3)
    state = {"params": params, "opt_state": opt.init(params), "step": jnp.asarray(2)}

    st_path = str(tmp_path / "state.safetensors")
    orbax_path = str(tmp_path / "state.orbax")
    save_auto(st_path, state)
    save_auto(orbax_path, state)
    a, b = load_flat_auto(st_path), load_flat_auto(orbax_path)
    assert sorted(a) == sorted(b)
    assert all("." not in k for k in a), sorted(a)[:5]
    # and the flat view round-trips into the NamedTuple-typed template
    from burn_depth_tpu.io.checkpoint import unflatten_into

    restored = unflatten_into(state, b)
    assert int(restored["opt_state"][0].count) == int(state["opt_state"][0].count)


def test_format_dispatch(tmp_path):
    tree = _tree(1)
    orbax_path = str(tmp_path / "state.orbax")
    st_path = str(tmp_path / "state.safetensors")
    assert is_orbax_path(orbax_path) and not is_orbax_path(st_path)
    save_auto(orbax_path, tree)
    save_auto(st_path, tree)
    a = load_flat_auto(orbax_path)
    b = load_flat_auto(st_path)
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32)
        )


def test_load_checkpoint_strict_on_orbax_dir(tmp_path):
    """The registry's load path keeps the strict missing/unexpected report
    for Orbax directories too."""
    tree = _tree(2)
    path = str(tmp_path / "ckpt.orbax")
    save_orbax(path, tree)
    got = load_checkpoint(path, tree)
    np.testing.assert_array_equal(
        np.asarray(got["encoder"]["w"]), np.asarray(tree["encoder"]["w"])
    )
    bad_template = {**tree, "extra": jnp.zeros((2,))}
    with pytest.raises(KeyError, match="missing"):
        load_checkpoint(path, bad_template)


def test_async_save_then_load(tmp_path):
    tree = _tree(3)
    path = str(tmp_path / "async.orbax")
    ckptr = save_orbax(path, tree, async_save=True)
    ckptr.wait_until_finished()
    ckptr.close()
    got = load_orbax(path)
    np.testing.assert_array_equal(
        np.asarray(got["encoder"]["w"]), np.asarray(tree["encoder"]["w"])
    )


def test_sharded_restore_lands_on_mesh(tmp_path):
    """Restore with a sharded template: leaves come back carrying the
    template's NamedSharding (direct-to-device, no host unflatten)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs).reshape(8), ("data",))
    tree = {"w": jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)}
    path = str(tmp_path / "sharded.orbax")
    save_orbax(path, tree)

    sharding = NamedSharding(mesh, P("data", None))
    template = {"w": jax.ShapeDtypeStruct((8, 4), jnp.float32, sharding=sharding)}
    got = load_orbax(path, template=template)
    assert got["w"].sharding == sharding
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(tree["w"]))


def test_checkpoint_manager_retention_and_latest(tmp_path):
    """TrainCheckpointManager: async saves, max_to_keep retention window,
    latest-step discovery, restore of the newest state."""
    from burn_depth_tpu.io.orbax_io import TrainCheckpointManager

    root = str(tmp_path / "run")
    with TrainCheckpointManager(root, keep=2) as mgr:
        for s in (1, 2, 3):
            tree = {"w": jnp.full((2, 2), float(s)), "step": jnp.asarray(s)}
            assert mgr.save(s, tree)
        mgr.wait()
        assert mgr.latest_step() == 3
        assert mgr.all_steps() == [2, 3]  # keep=2 evicted step 1
        got = mgr.restore(template=tree)
        assert int(got["step"]) == 3
        np.testing.assert_array_equal(np.asarray(got["w"]), np.full((2, 2), 3.0))

    # a fresh manager over the same directory (new process after a crash)
    with TrainCheckpointManager(root, keep=2) as mgr2:
        assert mgr2.latest_step() == 3
        flat = mgr2.restore_flat()
        assert int(flat["step"]) == 3 and "." not in "".join(flat)


def test_train_cli_ckpt_dir_auto_resume(tmp_path):
    """End-to-end: --ckpt-dir saves during training and a rerun auto-resumes
    from the latest step (the crash-recovery contract)."""
    from burn_depth_tpu.cli.train import main

    root = str(tmp_path / "ckpts")
    common = [
        "--model", "depth-anything-3", "--preset", "tiny", "--platform", "cpu",
        "--steps", "2", "--batch", "1", "--log-every", "1",
        "--ckpt-dir", root, "--ckpt-every", "1", "--ckpt-keep", "2",
    ]
    assert main(common) == 0
    from burn_depth_tpu.io.orbax_io import TrainCheckpointManager

    with TrainCheckpointManager(root) as mgr:
        assert mgr.latest_step() == 2
    assert main(common) == 0  # second run must resume at step 2 -> reaches 4
    with TrainCheckpointManager(root) as mgr:
        assert mgr.latest_step() == 4
        assert mgr.all_steps() == [3, 4]


def test_registry_loads_orbax_model_dir(tmp_path):
    """An Orbax directory of native params loads through the model registry
    (DepthAnything3 config fallback-retry included)."""
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    cfg = dataclasses.replace(
        DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp"
    )
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "da3.orbax")
    save_orbax(path, model.params)

    # registry retry must detect structure mismatch for the default configs
    # (flagship-geometry template vs 28px tree) and raise with context
    from burn_depth_tpu.api.registry import _is_native_checkpoint

    assert _is_native_checkpoint(path)
    got = load_checkpoint(path, model.params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(got)[0]),
        np.asarray(jax.tree_util.tree_leaves(model.params)[0]),
    )


def test_checkpoint_keys_orbax_metadata_only(tmp_path):
    """checkpoint_keys on an Orbax directory must come from metadata (no
    tensor reads) and match the flat key set of the saved tree."""
    from burn_depth_tpu.io.checkpoint import checkpoint_keys, flatten_tree
    from burn_depth_tpu.io.orbax_io import save_orbax

    tree = {"a": {"b": np.ones((2, 2), np.float32)}, "w_i8": np.zeros((3,), np.int8)}
    path = str(tmp_path / "ck.orbax")
    save_orbax(path, tree)
    keys = checkpoint_keys(path)
    assert keys == sorted(flatten_tree(tree).keys())
