from probtalk_tpu.quant.pq import (  # noqa: F401
    PQState,
    kmeans,
    pq_init,
    pq_init_kmeans,
    pq_forward_train,
    pq_forward_eval,
    pq_lookup_codes,
)
from probtalk_tpu.quant.rq import rq_forward_train, rq_forward_eval, rq_lookup_codes  # noqa: F401
