from sivo_tpu.viz import replay as replay  # noqa: F401
