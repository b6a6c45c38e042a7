"""Single-process, deterministic reference kernels.

These pure functions define the engine's extraction / linking /
canonicalization semantics. The Ray operators in ``k_gap_ray.ops``
call the *same* kernels per Arrow batch, and the tests run them
sequentially over the whole fixture to produce the golden triple set
the distributed pipeline is scored against (P/R >= 0.95, north rule —
see SURVEY.md section 7.1 step 3).
"""

from k_gap_ray.oracle.kernel import (  # noqa: F401
    ALIASES,
    GAZETTEER,
    VERB_MAP,
    extract_text,
    extract_from_text,
    norm_surface,
)
from k_gap_ray.oracle.canon import (  # noqa: F401
    char_shingles,
    jaccard,
    cluster_surfaces,
    entity_iri,
)
