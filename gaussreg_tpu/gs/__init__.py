from gaussreg_tpu.gs import sh  # noqa: F401
from gaussreg_tpu.gs import ply  # noqa: F401
