from probtalk_tpu.smplx.lbs import SmplxModel, load_smplx, smplx_forward, smplx_joints  # noqa: F401
