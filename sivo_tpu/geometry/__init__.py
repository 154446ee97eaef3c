from sivo_tpu.geometry import se3 as se3  # noqa: F401
from sivo_tpu.geometry import projection as projection  # noqa: F401
