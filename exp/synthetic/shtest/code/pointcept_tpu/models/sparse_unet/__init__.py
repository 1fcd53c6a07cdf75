from .spconv_unet import SpUNetBase
