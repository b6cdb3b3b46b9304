from .layers import (  # noqa: F401
    CrossAttention,
    Downsample,
    ResnetBlock,
    SelfAttention2D,
    SpatialTransformer,
    TimestepEmbedding,
    TransformerBlock,
    Upsample,
    sinusoidal_embedding,
)
from .unet2d import UNet2D  # noqa: F401
