from sivo_tpu.optim import pose_lm as pose_lm  # noqa: F401
