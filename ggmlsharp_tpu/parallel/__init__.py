"""Multi-chip/multi-host scale-out (SURVEY §2.11: entirely absent from the
reference — this is the framework's native distribution layer).

Approach: GSPMD. Build a Mesh over {data, model} axes, annotate parameter /
cache / activation shardings with NamedSharding + PartitionSpec, and let XLA
insert + overlap the all-gather/reduce-scatter/psum collectives over ICI.
`shard_map` + Pallas ring kernels are layered on top for the manually
scheduled paths (see kernels/).
"""

from .mesh import make_mesh
from .pipeline import pipeline_forward
from .ring_attention import (ring_attention, sequence_mesh,
                             set_sequence_mesh)
from .sharding import (
    gpt2_param_specs,
    kv_cache_spec,
    llama_param_specs,
    shard_params,
    shard_qtensor_spec,
)

__all__ = [
    "gpt2_param_specs",
    "kv_cache_spec",
    "llama_param_specs",
    "make_mesh",
    "pipeline_forward",
    "ring_attention",
    "sequence_mesh",
    "set_sequence_mesh",
    "shard_params",
    "shard_qtensor_spec",
]
