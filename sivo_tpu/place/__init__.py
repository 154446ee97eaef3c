from sivo_tpu.place import vocabulary as vocabulary  # noqa: F401
from sivo_tpu.place import database as database  # noqa: F401
