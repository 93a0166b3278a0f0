"""Config JSON round-trips (core/configio.py) — the sidecar format used by
``cli.correctness --config`` and the dump tools."""

from burn_depth_tpu.core.configio import config_from_json, config_to_json


def test_depth_pro_config_roundtrip():
    from burn_depth_tpu.models.depth_pro import DepthProConfig

    cfg = DepthProConfig.tiny_test()
    out = config_from_json(config_to_json(cfg))
    assert out == cfg
    assert isinstance(out.encoder_feature_dims, tuple)
    assert out.patch_encoder == cfg.patch_encoder


def test_da3_config_roundtrip_both_variants():
    from burn_depth_tpu.models.da3 import DepthAnything3Config

    for cfg in (DepthAnything3Config.metric_large(), DepthAnything3Config.small()):
        out = config_from_json(config_to_json(cfg))
        assert out == cfg
        assert isinstance(out.hook_block_ids, tuple)
        assert isinstance(out.head.out_channels, tuple)


def test_da3_sweep_knobs_roundtrip_and_reach_backbone():
    """PARITY.md real-weights-day sweep: the DA3-small reconstruction knobs
    ride the config sidecar and reach the derived backbone config."""
    import dataclasses

    from burn_depth_tpu.models.da3 import DepthAnything3Config

    cfg = dataclasses.replace(
        DepthAnything3Config.small(), rope_coords="norm_pm1", cat_order="cur_first"
    )
    out = config_from_json(config_to_json(cfg))
    assert out == cfg
    bb = out.backbone_config()
    assert bb.rope_coords == "norm_pm1" and bb.cat_order == "cur_first"
    # defaults stay the pinned reconstruction
    bb0 = DepthAnything3Config.small().backbone_config()
    assert bb0.rope_coords == "index" and bb0.cat_order == "prev_first"


def test_unknown_class_and_field_are_errors():
    import pytest

    with pytest.raises(ValueError):
        config_from_json('{"__config__": "NopeConfig"}')
    with pytest.raises(ValueError):
        config_from_json('{"__config__": "DinoViTConfig", "bogus_field": 3}')
