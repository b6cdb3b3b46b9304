from .databanzhaf import data_banzhaf  # noqa: F401
from .datamodel import compute_datamodel_scores, datamodel, ridge_cv  # noqa: F401
from .datashapley import brute_force_shapley, data_shapley, kernel_shap  # noqa: F401
