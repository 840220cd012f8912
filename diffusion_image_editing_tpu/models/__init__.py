from .unet2d import UNet2D, UNet2DConfig, TINY_UNET2D, DDPM_CELEBAHQ_256, LDM_CELEBAHQ_256_UNET  # noqa: F401
from .unet2d_cond import UNet2DCondition, UNet2DConditionConfig, SD15_UNET, TINY_SD_UNET  # noqa: F401
from .vae import (  # noqa: F401
    AutoencoderConfig,
    AutoencoderKL,
    Decoder,
    Encoder,
    LDM_CELEBAHQ_VQVAE,
    SD_VAE,
    TINY_VAE,
    VQModel,
    VectorQuantizer,
)
from .clip_text import CLIPTextConfig, CLIPTextEncoder, CLIP_VIT_L_14_TEXT, TINY_CLIP_TEXT  # noqa: F401
from .bisenet import BiSeNet, SegmentationModel, resize_bilinear_align_corners  # noqa: F401
from .resnet import ResNet50, Resnet18Features  # noqa: F401
from .extra_blocks import DeeplabV3Head, DenseModule, GlobalAvgPool2d, IdentityResidualBlock  # noqa: F401
