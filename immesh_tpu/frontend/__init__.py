from immesh_tpu.frontend.types import ScanBundle  # noqa: F401
