from .halo import HaloShardedOperator
from .sharding import (DATA_AXIS, ELEM_AXIS, ShardedStiffnessOperator,
                       build_device_mesh)
from .sweep import (SweepKernel, shard_sweep_inputs, simp_scales,
                    sweep_compliance)

__all__ = ["DATA_AXIS", "ELEM_AXIS", "HaloShardedOperator",
           "ShardedStiffnessOperator", "build_device_mesh", "SweepKernel",
           "shard_sweep_inputs", "simp_scales", "sweep_compliance"]
