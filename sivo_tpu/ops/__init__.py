from sivo_tpu.ops import image as image  # noqa: F401
from sivo_tpu.ops import fast as fast  # noqa: F401
from sivo_tpu.ops import orb as orb  # noqa: F401
from sivo_tpu.ops import stereo as stereo  # noqa: F401
