"""Command-line entry points (reference ``example/inference.rs``,
``tool/import_depth_pro.rs``, ``tool/import_da3.rs``).

Run as modules:

* ``python -m burn_depth_tpu.cli.infer --model depth-pro --image in.jpg``
* ``python -m burn_depth_tpu.cli.import_depth_pro depth_pro.pt -o depth_pro.safetensors``
* ``python -m burn_depth_tpu.cli.import_da3 da3.safetensors --variant small -o out.safetensors``
"""
