from .vae import VAEConfig, AutoencoderKL  # noqa: F401
from .unet import UNetConfig, UNet2DCondition  # noqa: F401
