from sivo_tpu.runtime import frame as frame  # noqa: F401
