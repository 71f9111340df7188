from .profiling import Timer, trace_context, timed
from .logging import set_logger
