"""Remap tables vs the vendored upstream key manifests.

The round-1 round-trip test validated the remap rules against keys
synthesized by the same rules (circular).  These tests instead check the
rules against static manifests derived from the reference's import tables and
Burn module trees (see ``tests/fixtures/README.md`` for the derivation /
audit), at the full flagship configs via ``jax.eval_shape`` (zero-cost trees):

* every upstream key must land on exactly one template parameter
  (``import_depth_pro.rs``'s strict-apply contract — a key mapping nowhere is
  the failure mode that motivated these fixtures);
* every template parameter must be filled (missing keys are errors unless on
  the reference's ``allowed_missing`` list, which only covers mask tokens the
  upstream dicts genuinely lack).
"""

import os

import jax
import pytest

from burn_depth_tpu.io.checkpoint import _path_str
from burn_depth_tpu.io.remap import KeyRemapper, da3_remap_rules, depth_pro_remap_rules

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _manifest(name):
    with open(os.path.join(FIXTURES, name)) as f:
        keys = [line.strip() for line in f if line.strip()]
    assert len(keys) == len(set(keys))
    return keys


def _template_paths(tree):
    return {
        _path_str(p).replace("/", ".")
        for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _check_bijection(manifest, rules, template_paths):
    remapper = KeyRemapper(rules)
    mapped = {k: remapper.remap(k) for k in manifest}
    nowhere = sorted(k for k, v in mapped.items() if v not in template_paths)
    assert not nowhere, f"{len(nowhere)} upstream keys map to no parameter: {nowhere[:10]}"
    hit = set(mapped.values())
    assert len(hit) == len(mapped), "remap rules collide (two upstream keys -> one param)"
    unfilled = sorted(template_paths - hit)
    assert not unfilled, f"{len(unfilled)} parameters never filled: {unfilled[:10]}"


def test_depth_pro_manifest_bijection():
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    cfg = DepthProConfig.dinov2_l16_384()
    tmpl = jax.eval_shape(lambda: DepthPro.init(jax.random.PRNGKey(0), cfg).params)
    _check_bijection(_manifest("depth_pro_upstream_keys.txt"), depth_pro_remap_rules(), _template_paths(tmpl))


@pytest.mark.parametrize(
    "fixture,variant,head_prefix",
    [
        ("da3_metric_large_upstream_keys.txt", "metric_large", "head_mono"),
        ("da3_small_upstream_keys.txt", "small", "head_dual"),
    ],
)
def test_da3_manifest_bijection(fixture, variant, head_prefix):
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    cfg = getattr(DepthAnything3Config, variant)()
    tmpl = jax.eval_shape(lambda: DepthAnything3.init(jax.random.PRNGKey(0), cfg).params)
    _check_bijection(_manifest(fixture), da3_remap_rules(head_prefix), _template_paths(tmpl))


def test_previously_guessed_rules_are_pinned():
    """The two rules round 1 flagged as interpretation are now pinned by the
    reference module definitions (see fixtures/README.md):

    * ``fov.downsample.N`` — the Burn FOVNetwork builds exactly ONE
      ConvActivation (``fov.rs:79-87``), so index pass-through is exact;
    * ``output_conv1_aux.N.M`` — ``AuxPreHead`` is a dense Vec of 5 convs
      with NO interleaved activation modules (its forward is a bare conv
      chain, ``dpt.rs:1105-1110``), so upstream indices 0..4 pass through.
    """
    dp = KeyRemapper(depth_pro_remap_rules())
    assert dp.remap("fov.downsample.0.weight") == "fov.downsample_blocks.0.weight"

    da = KeyRemapper(da3_remap_rules("head_dual"))
    for m in range(5):
        assert (
            da.remap(f"model.head.scratch.output_conv1_aux.2.{m}.weight")
            == f"head_dual.scratch.output_conv1_aux.2.layers.{m}.weight"
        )


def test_config_mismatch_not_masked_by_ignore_list():
    """If the template HAS a parameter matching an ignorable pattern, the
    importer must apply it, not drop it (round-1 weakness: silent
    ``register_tokens`` drop could mask a config mismatch)."""
    import numpy as np

    from burn_depth_tpu.io.importers import _apply

    template = {"register_tokens": np.zeros((1, 4, 8), np.float32), "w": np.zeros((2,), np.float32)}
    state = {"register_tokens": np.ones((1, 4, 8), np.float32), "w": np.ones((2,), np.float32)}
    params, report = _apply(template, state, rules=[])
    assert not report.ignored
    assert float(np.asarray(params["register_tokens"]).sum()) == 32.0

    # and when the template genuinely lacks it, the drop is reported
    template2 = {"w": np.zeros((2,), np.float32)}
    params2, report2 = _apply(template2, state={"mask_token": np.ones((8,), np.float32), "w": np.ones((2,), np.float32)}, rules=[])
    assert report2.ignored == ["mask_token"]
