from .type_inference import infer_type, infer_type_col  # noqa: F401
from .sentinels import SENTINELS, non_sentinel, sentinel_filter  # noqa: F401
