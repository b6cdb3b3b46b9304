from .woodfisher import (  # noqa: F401
    apply_perturbation,
    average_gradient,
    influence_unlearn,
    woodfisher_inv_hvp,
)
