"""AOT serving artifacts: serialize the compiled inference program to disk.

The reference ships a deployable demo artifact (a wasm build pushed to GitHub
Pages, ``deploy-pages.yml:40-60``).  The TPU-native counterpart of "a
self-contained runnable artifact" is a **serialized StableHLO export** of the
jitted serving function with the weights baked in as constants
(``jax.export``): one file that any process with a compatible jax/libtpu can
load and call — no model code, no checkpoint plumbing, no re-trace, and the
compile cache warms from the artifact's exact program.

Two functions:

* ``export_serving(model, path)`` — trace the model's full ``infer`` (params
  closed over as constants) for a static ``[batch, 3, S, S]`` input and write
  the serialized export.
* ``load_exported(path)`` — deserialize and return a callable; the output
  pytree (``DepthProInference`` / ``DepthAnything3Inference``) round-trips
  because those classes are registered pytree nodes in this package.

Platform notes: the export records the lowering platform(s).  Export on the
deployment platform (TPU for serving, CPU for tests), or pass
``platforms=("tpu", "cpu")`` to lower for both when every op supports
cross-platform lowering (Pallas kernels do not — use ``attn_impl='jnp'``
configs for portable artifacts).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["export_serving", "export_tflite", "load_exported", "load_tflite"]


def _register_output_pytrees() -> None:
    """Make the inference dataclasses serializable inside an export's
    output PyTreeDef (their auxdata is empty — all fields are arrays)."""
    from burn_depth_tpu.models.da3.model import DepthAnything3Inference
    from burn_depth_tpu.models.depth_pro.model import DepthProInference

    for cls, name in (
        (DepthProInference, "burn_depth_tpu.DepthProInference"),
        (DepthAnything3Inference, "burn_depth_tpu.DepthAnything3Inference"),
    ):
        try:
            jax.export.register_pytree_node_serialization(
                cls,
                serialized_name=name,
                serialize_auxdata=lambda aux: b"",
                deserialize_auxdata=lambda b: (),
            )
        except ValueError:
            pass  # already registered (re-import)


_register_output_pytrees()


def _serving_fn_and_size(model) -> tuple[Callable, int]:
    """The model's full-semantics ``image -> inference`` function with params
    closed over (baked into the export as constants), and its square input
    size."""
    # DepthPro and DepthAnything3 both expose `infer(x)` with params read
    # from `self`; closing over the bound method is exactly the serving path.
    if hasattr(model, "img_size"):  # DepthPro
        return model.infer, int(model.img_size)
    if hasattr(model, "image_size"):  # DepthAnything3
        return model.infer, int(model.image_size)
    raise TypeError(f"cannot export {type(model).__name__}: no infer surface")


def export_serving(
    model,
    path: str,
    *,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    input_size: Optional[int] = None,
) -> int:
    """Serialize ``model.infer`` for a ``[batch, 3, S, S]`` f32 input to
    ``path``.  Returns the artifact size in bytes.

    The weights ship inside the artifact (StableHLO constants) — treat the
    file like a checkpoint.  ``input_size`` overrides the model's native
    square size (the in-graph resize then runs inside the artifact).
    """
    fn, size = _serving_fn_and_size(model)
    size = input_size or size
    spec = jax.ShapeDtypeStruct((batch, 3, size, size), jnp.float32)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exp = jax.export.export(jax.jit(fn), **kwargs)(spec)
    blob = exp.serialize()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)


def export_tflite(model, path: str, *, batch: int = 1, input_size: Optional[int] = None) -> int:
    """Client-side deployment artifact: convert ``model.infer`` to a TFLite
    (LiteRT) flatbuffer with the weights baked in.  Returns artifact bytes.

    This is the framework's counterpart of the reference's in-browser wasm
    inference (``crates/bevy_burn_depth/www/index.html:42-98`` runs the model
    client-side): a LiteRT flatbuffer runs on-device on Android/iOS/desktop
    (XNNPACK) and in the browser via LiteRT's wasm runtime — no JAX, no
    Python, no server round-trip.  Route: jax2tf native (StableHLO inside an
    ``XlaCallModule``) -> TFLite converter legalization.  Validated
    bit-exact against the jit path on the committed test configs
    (``tests/test_export.py``).

    Outputs are the flattened inference pytree's array leaves (depth first);
    TFLite has no pytree notion, so consumers address outputs by shape/name.
    Use ``attn_impl='jnp'`` configs (CPU-lowerable; Pallas kernels do not
    legalize) and f32 params — the converter owns any further on-device
    quantization story.
    """
    fn, size = _serving_fn_and_size(model)
    size = input_size or size

    from jax.experimental import jax2tf  # noqa: PLC0415 — TF import is heavy, keep it lazy
    import tensorflow as tf  # noqa: PLC0415

    def flat(x):
        leaves = jax.tree_util.tree_leaves(fn(x))
        return {f"out_{i}": leaf for i, leaf in enumerate(leaves)}

    tf_fn = tf.function(
        jax2tf.convert(flat),
        input_signature=[tf.TensorSpec([batch, 3, size, size], tf.float32, name="image")],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions([tf_fn.get_concrete_function()])
    blob = converter.convert()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)


def load_tflite(path: str) -> Callable:
    """Run a :func:`export_tflite` artifact through the TFLite interpreter —
    the validation/demo counterpart of ``load_exported``.  Returns
    ``call(image) -> list[np.ndarray]`` (the flattened inference leaves, in
    export order)."""
    import numpy as np
    import tensorflow as tf  # noqa: PLC0415

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    # output order: restore export order from the `out_<i>` names the
    # converter preserves (falls back to registration order)
    outs = interp.get_output_details()

    def key(d):
        name = d.get("name", "")
        digits = "".join(c for c in name.split("out_")[-1] if c.isdigit())
        return int(digits) if digits else d["index"]

    outs = sorted(outs, key=key)

    def call(x):
        interp.set_tensor(inp["index"], np.asarray(x, np.float32))
        interp.invoke()
        return [interp.get_tensor(d["index"]) for d in outs]

    call.input_shape = tuple(inp["shape"])  # type: ignore[attr-defined]
    return call


def load_exported(path: str) -> Callable:
    """Load a serialized serving artifact; returns ``call(image)`` producing
    the original inference pytree.  Raises with the recorded platform list if
    the artifact was lowered for a different backend."""
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())

    def call(x):
        return exp.call(jnp.asarray(x, jnp.float32))

    call.platforms = tuple(exp.platforms)  # type: ignore[attr-defined]
    call.in_avals = exp.in_avals  # type: ignore[attr-defined]
    return call
