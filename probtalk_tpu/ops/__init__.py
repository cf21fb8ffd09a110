from probtalk_tpu.ops.pq_lookup import pq_nearest_codes  # noqa: F401
