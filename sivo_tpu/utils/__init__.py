from sivo_tpu.utils.precision import hmat as hmat  # noqa: F401
from sivo_tpu.utils.precision import hdot as hdot  # noqa: F401
