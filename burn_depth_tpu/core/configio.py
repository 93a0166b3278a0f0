"""Config JSON serialization for the frozen-dataclass config tree.

Role of the reference's ``#[derive(Config)]`` save/load (Burn configs persist
as JSON next to checkpoints): a dump tool or training run can pin the exact
model geometry in a sidecar file and any CLI can reconstruct it with
``--config`` — required for replaying golden dumps produced at non-preset
geometries (``cli/correctness.py``) and for resuming experiments.

Format: plain JSON; every dataclass node carries a ``"__config__"`` class-name
tag; tuples round-trip via the dataclass field annotations (JSON has only
lists).
"""

from __future__ import annotations

import dataclasses
import json
import typing
from typing import Any


def _registry() -> dict[str, type]:
    from burn_depth_tpu.models.da3.camera import CameraDecoderConfig, CameraEncoderConfig
    from burn_depth_tpu.models.da3.dpt import DepthAnything3HeadConfig
    from burn_depth_tpu.models.da3.model import DepthAnything3Config
    from burn_depth_tpu.models.depth_pro.model import DepthProConfig
    from burn_depth_tpu.vit.dinov2 import DinoViTConfig

    return {
        c.__name__: c
        for c in (
            DinoViTConfig,
            DepthProConfig,
            DepthAnything3Config,
            DepthAnything3HeadConfig,
            CameraEncoderConfig,
            CameraDecoderConfig,
        )
    }


def _encode(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {"__config__": type(obj).__name__}
        for f in dataclasses.fields(obj):
            out[f.name] = _encode(getattr(obj, f.name))
        return out
    if isinstance(obj, (list, tuple)):
        return [_encode(v) for v in obj]
    return obj


def _is_tuple_annotation(ann: Any) -> bool:
    origin = typing.get_origin(ann)
    if origin is tuple:
        return True
    # Optional[tuple[...]] / Union[..., tuple[...]]
    if origin is typing.Union:
        return any(_is_tuple_annotation(a) for a in typing.get_args(ann))
    return isinstance(ann, str) and "tuple" in ann.lower()


def _decode(obj: Any, registry: dict[str, type]) -> Any:
    if isinstance(obj, dict) and "__config__" in obj:
        name = obj["__config__"]
        if name not in registry:
            raise ValueError(f"unknown config class {name!r} in config JSON")
        cls = registry[name]
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in obj.items():
            if k == "__config__":
                continue
            if k not in fields:
                raise ValueError(f"{name} has no field {k!r}")
            val = _decode(v, registry)
            if isinstance(val, list) and _is_tuple_annotation(fields[k].type):
                val = tuple(val)
            kwargs[k] = val
        return cls(**kwargs)
    if isinstance(obj, list):
        return [_decode(v, registry) for v in obj]
    return obj


def config_to_json(cfg: Any) -> str:
    """Serialize a config dataclass (nested) to a JSON string."""
    return json.dumps(_encode(cfg), indent=2)


def config_from_json(text: str) -> Any:
    """Reconstruct a config dataclass tree from ``config_to_json`` output."""
    return _decode(json.loads(text), _registry())


def save_config(path: str, cfg: Any) -> None:
    with open(path, "w") as f:
        f.write(config_to_json(cfg))


def load_config(path: str) -> Any:
    with open(path) as f:
        return config_from_json(f.read())
