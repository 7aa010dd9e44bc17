from hammlet_tpu.ops.wavelet import maxlet_transform, breakpoint_weights  # noqa: F401
from hammlet_tpu.ops.blocks import (  # noqa: F401
    BlockStructure,
    PrefixStats,
    build_prefix_stats,
    make_blocks,
    block_sufficient_stats,
)
