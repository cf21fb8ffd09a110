from probtalk_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_spec,
)
from probtalk_tpu.parallel.tp import (  # noqa: F401
    TP_RULES,
    tp_shard,
    tp_shard_state,
)
