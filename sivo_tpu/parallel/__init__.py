from sivo_tpu.parallel import sharded_ba as sharded_ba  # noqa: F401
