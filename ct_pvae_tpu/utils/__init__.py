from .metrics import MetricsLogger
from .batching import IndexStream

__all__ = ["MetricsLogger", "IndexStream"]
