from .validation import (  # noqa: F401
    check_matvec_dimensions,
    check_matvec_out_shape,
    check_sandwich_compatible,
    check_transpose_matvec_out_shape,
    is_full_length,
    is_identity_index,
    set_up_rows_or_cols,
    setup_restrictions,
    _check_indexer,
)
from .arrays import (  # noqa: F401
    to_device,
    to_numpy,
    is_jax_array,
    result_like,
    add_into_out,
    rows_to_mask,
    cols_to_mask,
)
