from probtalk_tpu.smplx.lbs import (  # noqa: F401
    BODY_JOINT_IND, FACE_JOINT_IND, FULL_JOINT_IND,
    SmplxModel, load_smplx, smplx_forward, smplx_joints,
)
from probtalk_tpu.smplx.synthetic import (  # noqa: F401
    make_synthetic_smplx, write_synthetic_smplx_npz,
)
