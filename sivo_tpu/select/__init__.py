from sivo_tpu.select import info as info  # noqa: F401
from sivo_tpu.select import semantic as semantic  # noqa: F401
