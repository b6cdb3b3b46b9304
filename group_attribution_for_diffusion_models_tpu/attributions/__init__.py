from . import methods  # noqa: F401
from .lds import bootstrap_lds_ci, collect_data, evaluate_lds  # noqa: F401
