from .apply import apply_batch  # noqa: F401
from .merge import merge_apply  # noqa: F401
