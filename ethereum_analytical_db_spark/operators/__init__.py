from .joins import any_join  # noqa: F401
from .predicates import in_list, make_range_filter  # noqa: F401
