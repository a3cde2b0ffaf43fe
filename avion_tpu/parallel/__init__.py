from avion_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    PP_AXIS,
    SP_AXIS,
    TENSOR_AXIS,
    BATCH_AXES,
    make_mesh,
    group_devices_by_slice,
    local_batch_slice,
)
from avion_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    infer_param_sharding,
    shard_params,
)
