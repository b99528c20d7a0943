from .helpers import (
    cartesian_grid,
    enable_compilation_cache,
    hstack,
    is_empty,
    is_none,
    pair_mats,
    rel_l2_error,
    vstack,
)
