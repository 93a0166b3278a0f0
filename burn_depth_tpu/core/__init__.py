"""Core utilities: dtype policy, param-pytree helpers, RNG plumbing."""

from burn_depth_tpu.core.dtypes import Policy  # noqa: F401
from burn_depth_tpu.core.pytree import (  # noqa: F401
    flatten_params,
    param_count,
    tree_cast,
)
