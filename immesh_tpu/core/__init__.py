from immesh_tpu.core import so3  # noqa: F401
from immesh_tpu.core.state import EsikfState, STATE_DIM  # noqa: F401
