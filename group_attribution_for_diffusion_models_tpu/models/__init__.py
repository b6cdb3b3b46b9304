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
from .resnet import (  # noqa: F401
    ResNet18Features,
    convert_resnet18_state_dict,
    resnet18_embed,
)
