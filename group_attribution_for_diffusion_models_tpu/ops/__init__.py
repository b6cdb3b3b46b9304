from .attention import dot_product_attention  # noqa: F401
from .attention import flash_attention  # noqa: F401
