"""Checkpoint IO: PyTorch importers + native pytree checkpoints.

Counterpart of the reference's offline import tools
(``tool/import_depth_pro.rs``, ``tool/import_da3.rs``) and its NamedMpk-f16
checkpoint format.  TPU-native choices:

* native format = safetensors with ``/``-joined pytree paths and optional
  bf16/f16 storage (loaded back as f32/bf16 compute dtype on device),
* importers go PyTorch ``.pt`` (pickle, via torch-cpu) or ``.safetensors``
  → our param pytree through ordered regex remap tables ported from the
  reference's ground-truth rules (``import_depth_pro.rs:344-437``,
  ``import_da3.rs:67-195``), minus the Burn-isms (norm weight→gamma renames,
  ConvTranspose2d dim swaps) that do not exist here because the param tree
  deliberately keeps PyTorch naming and layouts.
"""

from burn_depth_tpu.io.checkpoint import (  # noqa: F401
    load_checkpoint,
    load_flat_auto,
    save_auto,
    save_checkpoint,
)
from burn_depth_tpu.io.orbax_io import (  # noqa: F401
    TrainCheckpointManager,
    load_orbax,
    save_orbax,
)
from burn_depth_tpu.io.importers import (  # noqa: F401
    ImportReport,
    import_da3,
    import_depth_pro,
)
from burn_depth_tpu.io.remap import KeyRemapper, da3_remap_rules, depth_pro_remap_rules  # noqa: F401
