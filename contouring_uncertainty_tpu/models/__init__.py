"""Model zoo: nnU-Net-style UNet (primary), ENet, confidence heads."""

from contouring_uncertainty_tpu.models.unet import ConfidenceNet, UNet
