from sivo_tpu.io import synthetic as synthetic  # noqa: F401
from sivo_tpu.io import trajectory as trajectory  # noqa: F401
