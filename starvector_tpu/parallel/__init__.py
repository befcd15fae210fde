from starvector_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    batch_spec,
    local_mesh_summary,
)
from starvector_tpu.parallel.sharding import (
    make_param_shardings,
    apply_partition_rules,
    shard_pytree,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "batch_spec",
    "local_mesh_summary",
    "make_param_shardings",
    "apply_partition_rules",
    "shard_pytree",
]
