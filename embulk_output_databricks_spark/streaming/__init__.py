from .checkpoint import CheckpointStore  # noqa: F401
from .multi import MultiTableReplayDriver  # noqa: F401
from .replay import ReplayDriver  # noqa: F401
