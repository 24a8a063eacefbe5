from .log import setup_logger  # noqa: F401
from .profiling import time_fn, trace, flops_estimate  # noqa: F401
