"""Model zoo: nnU-Net-style UNet (primary), ENet, confidence heads."""

from contouring_uncertainty_tpu.models.unet import ConfidenceNet, UNet


def build_backbone(name: str, input_shape, output_shape, **kwargs):
    """Model-zoo dispatch (the counterpart of Hydra's task/model group).

    Each backbone receives only the config keys it understands, so the shared
    model-config surface (dropout, ssn_rank, ...) never crashes a backbone
    that doesn't take a given knob."""
    if name in ("unet2", "unet"):
        allowed = {"kernels", "strides", "negative_slope", "deep_supervision",
                   "attention", "drop_block", "residual", "out_seg_bias",
                   "ssn_rank", "bottleneck_out", "dtype"}
        kwargs = {k: v for k, v in kwargs.items() if k in allowed}
        return UNet(input_shape=input_shape, output_shape=output_shape, **kwargs)
    if name == "deeplabv3":
        from contouring_uncertainty_tpu.models.deeplabv3 import DeepLabV3

        allowed = {"layers", "base", "dropout", "n_heads", "ssn_rank",
                   "bottleneck_out", "dtype"}
        kwargs = {k: v for k, v in kwargs.items() if k in allowed}
        return DeepLabV3(input_shape=input_shape, output_shape=output_shape, **kwargs)
    if name == "resnet":
        from contouring_uncertainty_tpu.models.resnet import Resnet

        allowed = {"layers", "dropout", "sigma_out", "dtype"}
        kwargs = {k: v for k, v in kwargs.items() if k in allowed}
        if "layers" in kwargs:
            kwargs["layers"] = tuple(kwargs["layers"])
        return Resnet(input_shape=input_shape, output_shape=output_shape, **kwargs)
    if name == "enet":
        from contouring_uncertainty_tpu.models.enet import Enet

        allowed = {"init_channels", "dropout", "encoder_relu", "decoder_relu",
                   "bottleneck_out", "n_heads", "ssn_rank", "dtype"}
        kwargs = {k: v for k, v in kwargs.items() if k in allowed}
        return Enet(input_shape=input_shape, output_shape=output_shape, **kwargs)
    raise ValueError(f"Unknown model '{name}'")
