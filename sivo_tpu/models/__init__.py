from sivo_tpu.models import segnet as segnet  # noqa: F401
