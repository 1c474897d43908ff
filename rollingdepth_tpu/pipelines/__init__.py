from .snippets import (  # noqa: F401
    cap_max_dilation,
    current_gap,
    snippet_indices,
    snippet_index_matrix,
)
