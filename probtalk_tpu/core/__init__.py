from probtalk_tpu.core import rotation  # noqa: F401
from probtalk_tpu.core import body_parts  # noqa: F401
from probtalk_tpu.core import normalize  # noqa: F401
